"""Deduplication operators: exact, MinHash+LSH, SimHash, exact n-gram
Jaccard.

The reference has only exact content dedup via a shared probe table
(``crawler/Crawler.java:178-190``, the ``contentSeen`` KVS table); this
module re-expresses that as a shuffle (no shared mutable state) and adds
the near-dup family a training-data pipeline needs.

Shuffle discipline (the 100 TB design):
- ``exact_dedup_summary``: hash locally per batch, then groupby(md5) of
  NARROW columns only (hash + id) — text never enters the shuffle.
- MinHash/SimHash: signatures are computed in an actor-pool map_batches
  (permutation tables built once per actor), then only
  (bucket_key, doc_id, signature) rows shuffle — one groupby per
  pipeline. Candidate groups are capped (``max_bucket``) so a degenerate
  bucket (all-identical boilerplate) cannot emit O(n^2) pairs; drops are
  logged in the output's ``truncated`` accounting column.
- Exact n-gram Jaccard: shingle-explode -> groupby(shingle) pair
  emission -> groupby(pair) count. Hot-shingle groups are capped the
  same way (a shingle shared by k docs emits k(k-1)/2 pairs — the skew
  analog of hot terms in the postings shuffle; same defusal strategy).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from ..functions.sketches import (
    hamming64,
    lsh_band_keys,
    minhash_est_jaccard,
    minhash_params,
    minhash_signature,
    shingle_hashes,
    simhash64,
    simhash_chunk_keys,
)
from ..functions.tokenize import tokenize
from .shuffle import hash_map_groups


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dedup_summary(ds: rd.Dataset, *, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Exact content dedup: one row per distinct content with the
    canonical (min) id and the copy count.

    Output: text_md5, canonical_doc_id, n_copies.
    """

    def hash_batch(batch: pa.Table) -> pa.Table:
        md5s = [hashlib.md5(t.encode()).hexdigest() for t in batch[text_col].to_pylist()]
        return pa.table({"text_md5": pa.array(md5s, pa.string()), id_col: batch[id_col]})

    return (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(Min(id_col, alias_name="canonical_doc_id"), Count(alias_name="n_copies"))
    )


def exact_dup_losers(ds: rd.Dataset, *, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Rows for the non-canonical copies only: (doc_id, canonical_doc_id).
    The Ray analog of the reference's ``canonicalURL`` pointer column."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        md5s = [hashlib.md5(t.encode()).hexdigest() for t in batch[text_col].to_pylist()]
        return pa.table({"text_md5": pa.array(md5s, pa.string()), id_col: batch[id_col]})

    def losers(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        canon = int(ids.min())
        keep = ids != canon
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "canonical_doc_id": pa.array(np.full(int(keep.sum()), canon, np.int64)),
            }
        )

    return hash_map_groups(
        ds.map_batches(hash_batch, batch_format="pyarrow"), "text_md5", losers
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------


class MinHashStage:
    """Actor-pool stage: text -> MinHash signature (list<int64>).

    Permutation coefficients are deterministic in ``seed`` and built
    ONCE per actor in ``__init__`` — the stateful-stage pattern."""

    def __init__(
        self,
        *,
        num_perm: int = 128,
        shingle_n: int = 3,
        seed: int = 1,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.a, self.b = minhash_params(num_perm, seed)
        self.shingle_n = shingle_n
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = []
        for text in batch[self.text_col].to_pylist():
            sh = shingle_hashes(tokenize(text), self.shingle_n)
            sigs.append(minhash_signature(sh, self.a, self.b).astype(np.int64).tolist())
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "sig": pa.array(sigs, pa.list_(pa.int64())),
            }
        )


def _pairs_from_bucket(group: pa.Table, est_threshold: float, max_bucket: int) -> pa.Table:
    """All (a<b) pairs of one LSH bucket whose signature-estimated
    Jaccard reaches the threshold. Groups beyond ``max_bucket`` are
    truncated (flagged) — skew protection."""
    nrows = group.num_rows
    out_a, out_b, out_j = [], [], []
    truncated = nrows > max_bucket
    if nrows > 1:
        order = pc.array_sort_indices(group["doc_id"].combine_chunks())
        group = group.take(order.slice(0, min(nrows, max_bucket)))
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        sigs = [np.asarray(s, dtype=np.int64) for s in group["sig"].to_pylist()]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                est = minhash_est_jaccard(sigs[i], sigs[j])
                if est >= est_threshold:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_j.append(est)
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "est_jaccard": pa.array(out_j, pa.float64()),
            "truncated": pa.array([truncated] * len(out_a), pa.bool_()),
        }
    )


def minhash_lsh_pairs(
    ds: rd.Dataset,
    *,
    num_perm: int = 128,
    num_bands: int = 32,
    shingle_n: int = 3,
    est_threshold: float = 0.5,
    max_bucket: int = 64,
    seed: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | None = None,
) -> rd.Dataset:
    """Near-dup candidate pairs via MinHash banding.

    Output: doc_a, doc_b, est_jaccard (signature estimate), truncated.
    One pair may surface from several bands — deduped by a final narrow
    groupby on the pair key.
    """
    sigs = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "shingle_n": shingle_n,
            "seed": seed,
            "text_col": text_col,
            "id_col": id_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency or 4,
    )

    def explode_bands(batch: pa.Table) -> pa.Table:
        keys, ids, sig_out = [], [], []
        sig_lists = batch["sig"].to_pylist()
        id_list = batch["doc_id"].to_pylist()
        for did, sig in zip(id_list, sig_lists):
            s = np.asarray(sig, dtype=np.uint64)
            for bkey in lsh_band_keys(s, num_bands):
                keys.append(bkey)
                ids.append(did)
                sig_out.append(sig)
        return pa.table(
            {
                "bucket": pa.array(keys, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "sig": pa.array(sig_out, pa.list_(pa.int64())),
            }
        )

    # At 100 TB the sig payload re-shipped per band is the cost driver;
    # the alternative (narrow bucket shuffle + join sigs back by doc_id)
    # trades one shuffle for two — banding payload here is
    # num_bands * num_perm * 8B per doc, acceptable vs text size.
    pairs = hash_map_groups(
        sigs.map_batches(explode_bands, batch_format="pyarrow"),
        "bucket",
        lambda g: _pairs_from_bucket(g, est_threshold, max_bucket),
    )

    def add_pair_key(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(batch["doc_a"], pa.string()), pc.cast(batch["doc_b"], pa.string()), ":"
        )
        return batch.append_column("pair", key)

    return hash_map_groups(
        pairs.map_batches(add_pair_key, batch_format="pyarrow"),
        "pair",
        lambda g: g.slice(0, 1),
    ).drop_columns(["pair"])


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------


class SimHashStage:
    """Actor-pool stage: text -> 64-bit SimHash (tf-weighted)."""

    def __init__(self, *, text_col: str = "text", id_col: str = "doc_id"):
        from collections import Counter

        self._counter = Counter
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.empty(batch.num_rows, dtype=np.uint64)
        for i, text in enumerate(batch[self.text_col].to_pylist()):
            counts = self._counter(tokenize(text))
            out[i] = np.uint64(
                simhash64(list(counts.keys()), np.fromiter(counts.values(), np.int64, len(counts)))
            )
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "simhash": pa.array(out.astype(np.int64)),
            }
        )


def simhash_pairs(
    ds: rd.Dataset,
    *,
    max_hamming: int = 3,
    num_chunks: int = 4,
    max_bucket: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | None = None,
) -> rd.Dataset:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole banding: with ``num_chunks`` chunks, any pair within
    hamming distance < num_chunks shares a chunk; bucket by
    (chunk_idx, chunk_value), verify exact hamming inside the bucket.
    Requires max_hamming < num_chunks for completeness (asserted).
    Output: doc_a, doc_b, hamming.
    """
    assert max_hamming < num_chunks, "pigeonhole completeness needs max_hamming < num_chunks"
    hashes = ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=concurrency or 4,
    )

    def explode_chunks(batch: pa.Table) -> pa.Table:
        keys, ids, sims = [], [], []
        for did, sim in zip(batch["doc_id"].to_pylist(), batch["simhash"].to_pylist()):
            for cidx, cval in simhash_chunk_keys(int(sim) & 0xFFFFFFFFFFFFFFFF, num_chunks):
                keys.append((cidx << 48) | cval)
                ids.append(did)
                sims.append(sim)
        return pa.table(
            {
                "bucket": pa.array(keys, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "simhash": pa.array(sims, pa.int64()),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        n = group.num_rows
        out_a, out_b, out_h = [], [], []
        if n > 1:
            order = pc.array_sort_indices(group["doc_id"].combine_chunks())
            group = group.take(order.slice(0, min(n, max_bucket)))
            ids = group["doc_id"].to_pylist()
            sims = [s & 0xFFFFFFFFFFFFFFFF for s in group["simhash"].to_pylist()]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    hd = hamming64(sims[i], sims[j])
                    if hd <= max_hamming:
                        out_a.append(ids[i])
                        out_b.append(ids[j])
                        out_h.append(hd)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "hamming": pa.array(out_h, pa.int64()),
            }
        )

    pairs = hash_map_groups(
        hashes.map_batches(explode_chunks, batch_format="pyarrow"), "bucket", verify
    )

    def add_pair_key(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(batch["doc_a"], pa.string()), pc.cast(batch["doc_b"], pa.string()), ":"
        )
        return batch.append_column("pair", key)

    return hash_map_groups(
        pairs.map_batches(add_pair_key, batch_format="pyarrow"),
        "pair",
        lambda g: g.slice(0, 1),
    ).drop_columns(["pair"])


# --------------------------------------------------------------------------
# exact n-gram Jaccard (SQL-oracle-checkable)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_docs: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """EXACT n-gram (word) Jaccard similarity for all pairs sharing at
    least one shingle, filtered to jaccard >= threshold.

    Plan: distinct (doc_id, shingle-string, set-size) explode ->
    groupby(shingle) emits co-occurrence pairs CARRYING both docs' set
    sizes (one int each — computed locally per doc at explode time, no
    driver pass) -> multi-key groupby(doc_a, doc_b) counts the
    intersection and closes the formula |A∩B| / (|A| + |B| - |A∩B|)
    vectorized. Nothing materializes on the driver; every shuffled row
    is 4 ints + the shingle string.

    Shingles are STRINGS (n tokens joined by a space) so the DuckDB
    oracle can reproduce the exact same sets. Output: doc_a, doc_b,
    jaccard (float64).
    """

    def explode_shingles(batch: pa.Table) -> pa.Table:
        ids_out, sh_out, sz_out = [], [], []
        for did, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            toks = tokenize(text)
            if len(toks) < n:
                continue
            shset = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            for sh in shset:
                ids_out.append(did)
                sh_out.append(sh)
                sz_out.append(len(shset))
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "shingle": pa.array(sh_out, pa.string()),
                "sz": pa.array(sz_out, pa.int64()),
            }
        )

    shingled = ds.map_batches(explode_shingles, batch_format="pyarrow")

    def cooccur(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m < 2:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "sz_a": pa.array([], pa.int64()),
                    "sz_b": pa.array([], pa.int64()),
                    "one": pa.array([], pa.int64()),
                }
            )
        order = pc.array_sort_indices(group["doc_id"].combine_chunks())
        group = group.take(order.slice(0, min(m, max_shingle_docs)))
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        szs = group["sz"].to_numpy(zero_copy_only=False)
        iu, ju = np.triu_indices(ids.size, 1)  # vectorized pair emission
        return pa.table(
            {
                "doc_a": pa.array(ids[iu]),
                "doc_b": pa.array(ids[ju]),
                "sz_a": pa.array(szs[iu]),
                "sz_b": pa.array(szs[ju]),
                "one": pa.array(np.ones(iu.size, np.int64)),
            }
        )

    pairs = hash_map_groups(shingled, "shingle", cooccur)

    inter = pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Sum("one", alias_name="inter"),
        Min("sz_a", alias_name="sz_a"),
        Min("sz_b", alias_name="sz_b"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        inter_n = batch["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        sz_a = batch["sz_a"].to_numpy(zero_copy_only=False)
        sz_b = batch["sz_b"].to_numpy(zero_copy_only=False)
        jac = inter_n / (sz_a + sz_b - inter_n)
        keep = jac >= threshold
        return pa.table(
            {
                "doc_a": batch["doc_a"].filter(pa.array(keep)),
                "doc_b": batch["doc_b"].filter(pa.array(keep)),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    return inter.map_batches(finish, batch_format="pyarrow")
