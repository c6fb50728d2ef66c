"""End-to-end training-data preparation pipeline — the capstone
composition of the repo's LLM-data operators into the hygiene chain a
100-TB pretraining corpus actually runs:

    quality gate -> exact dedup -> benchmark decontamination
        -> per-language corpus summary

Every stage is one of the repo's verified distributed operators
(``stages.textstats.TextStatsStage``, ``stages.dedup.exact_dup_losers``,
``stages.dedup.contamination_counts``); this module only wires them, so
the whole chain stays a streaming Ray Data plan: one actor-pool stats
pass, one bounded-bucket dedup shuffle, one broadcast-membership
decontamination scan, and one vocabulary-bounded groupby for the
summary. Nothing materializes the corpus.

The drop set (duplicate losers + contaminated ids) is collected and
broadcast (``ray.put`` once) because both are SMALL by construction —
duplicates are the minority side of keep-first and contamination at
``min_hits`` is rare relative to the corpus. At a scale where the drop
set itself stops fitting the broadcast convention (~10^8 ids, see
``build_index.DRIVER_DEDUP_LIMIT``), swap the final filter for the
distributed ``stages.ops.anti_join_keys`` on doc_id — same semantics,
one extra bounded-bucket shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..stages.dedup import contamination_counts, exact_dup_losers
from ..stages.textstats import TextStatsStage


def training_data_prep(
    docs: rd.Dataset,
    benchmark_shingles: pa.Array,
    *,
    min_hits: int = 10,
    ngram: int = 3,
    stats_concurrency: tuple[int, int] = (1, 4),
    near_dup_cap: int | None = None,
    jaccard_threshold: float = 0.5,
    cluster_rounds: int = 10,
) -> rd.Dataset:
    """Run the prep chain over a (doc_id, text) dataset and return the
    per-predicted-language summary: (lang_pred, n_docs, total_tokens).

    Quality rule = ``TextStatsStage.is_quality`` (>= 20 tokens, >= 5%
    English-stopword ratio, mean token length <= 12); language is the
    stage's own ``lang_pred`` (the pipeline trusts its lang-ID, as a
    real corpus pipeline does). Exact-duplicate LOSERS (non-canonical
    copies) and documents sharing >= ``min_hits`` distinct word
    ``ngram``-grams with the benchmark set are dropped.

    ``near_dup_cap`` (v2 chain) additionally drops NEAR-duplicates:
    word-``ngram``-Jaccard pairs at ``jaccard_threshold`` -> connected
    components (``cluster_rounds`` min-label rounds) -> keep only the
    ``near_dup_cap`` lowest-doc_id representatives per cluster
    (``stages.dedup.cluster_cap_marks``); the capped-out ids ride the
    same broadcast drop set. ``None`` keeps the v1 exact-only chain.
    """
    drop_ids = build_drop_ids(
        docs,
        benchmark_shingles,
        min_hits=min_hits,
        ngram=ngram,
        near_dup_cap=near_dup_cap,
        jaccard_threshold=jaccard_threshold,
        cluster_rounds=cluster_rounds,
    )
    drop_ref = ray.put(drop_ids)

    # RANGED pool (min 1): a strict pool size pins min x num_cpus CPUs
    # for the plan's whole lifetime, and on a fully-subscribed node the
    # downstream groupby's shuffle tasks then starve — a measured
    # deadlock at num_cpus=4. The range lets the executor scale the
    # pool down once extraction drains and hand its CPUs to the shuffle.
    stats = docs.map_batches(
        TextStatsStage, batch_format="pyarrow", concurrency=stats_concurrency
    )

    def keep_clean(batch: pa.Table) -> pa.Table:
        keep = batch["is_quality"]
        dropped = ray.get(drop_ref)
        if len(dropped):
            keep = pc.and_(keep, pc.invert(pc.is_in(batch["doc_id"], value_set=dropped)))
        return batch.filter(keep).select(["doc_id", "lang_pred", "n_tokens"])

    clean = stats.map_batches(keep_clean, batch_format="pyarrow")
    agg = clean.groupby("lang_pred").aggregate(
        Count(alias_name="n_docs"), Sum("n_tokens", alias_name="total_tokens")
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "lang_pred": t["lang_pred"],
                "n_docs": t["n_docs"],
                "total_tokens": t["total_tokens"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def build_drop_ids(
    docs: rd.Dataset,
    benchmark_shingles: pa.Array,
    *,
    min_hits: int = 10,
    ngram: int = 3,
    near_dup_cap: int | None = None,
    jaccard_threshold: float = 0.5,
    cluster_rounds: int = 10,
) -> pa.Array:
    """The prep chain's drop set (exact-dup losers + contaminated ids
    + optionally near-dup cluster-cap rejects) as one deduped int64
    array — shared by the summary pipeline and the curated-docs writer
    (small by construction; see the module docstring for the cutover
    once it stops fitting the broadcast convention)."""
    drop_parts = [
        t["doc_id"]
        for t in (
            pa.Table.from_pylist(
                exact_dup_losers(docs).select_columns(["doc_id"]).take_all(),
                schema=pa.schema([("doc_id", pa.int64())]),
            ),
            pa.Table.from_pylist(
                contamination_counts(
                    docs, benchmark_shingles, n=ngram, min_hits=min_hits
                )
                .select_columns(["doc_id"])
                .take_all(),
                schema=pa.schema([("doc_id", pa.int64())]),
            ),
        )
    ]
    if near_dup_cap is not None:
        from ..stages.dedup import (
            cluster_cap_marks,
            dup_clusters,
            ngram_jaccard_pairs,
        )

        marks = cluster_cap_marks(
            dup_clusters(
                ngram_jaccard_pairs(docs, n=ngram, threshold=jaccard_threshold),
                rounds=cluster_rounds,
            ),
            cap=near_dup_cap,
        )
        capped_out = marks.filter(
            pc.invert(marks["kept"].combine_chunks())
        )["doc_id"]
        drop_parts.append(capped_out)
    return pc.unique(pa.concat_arrays([p.combine_chunks() for p in drop_parts]))


class _StatsWithText(TextStatsStage):
    """TextStatsStage that carries the text column through — the
    curated-docs writer needs the surviving documents themselves, not
    just their metrics."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = super().__call__(batch)
        return out.append_column("text", batch[self.text_col])


def curated_docs(
    docs: rd.Dataset,
    benchmark_shingles: pa.Array,
    *,
    min_hits: int = 10,
    ngram: int = 3,
    stats_concurrency: tuple[int, int] = (1, 4),
    near_dup_cap: int | None = None,
    jaccard_threshold: float = 0.5,
    cluster_rounds: int = 10,
) -> rd.Dataset:
    """The same prep chain as ``training_data_prep`` but returning the
    SURVIVING DOCUMENTS (doc_id, text, lang_pred, n_tokens) as a
    streaming Dataset — the writer path of ``jobs/data_prep.py``
    (``write_parquet`` on the result gives the resumable partitioned
    curated corpus)."""
    drop_ids = build_drop_ids(
        docs,
        benchmark_shingles,
        min_hits=min_hits,
        ngram=ngram,
        near_dup_cap=near_dup_cap,
        jaccard_threshold=jaccard_threshold,
        cluster_rounds=cluster_rounds,
    )
    drop_ref = ray.put(drop_ids)

    stats = docs.map_batches(
        _StatsWithText, batch_format="pyarrow", concurrency=stats_concurrency
    )

    def keep_clean(batch: pa.Table) -> pa.Table:
        keep = batch["is_quality"]
        dropped = ray.get(drop_ref)
        if len(dropped):
            keep = pc.and_(
                keep, pc.invert(pc.is_in(batch["doc_id"], value_set=dropped))
            )
        return batch.filter(keep).select(
            ["doc_id", "text", "lang_pred", "n_tokens"]
        )

    return stats.map_batches(keep_clean, batch_format="pyarrow")
