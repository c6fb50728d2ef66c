"""Incremental index update — add a new crawl batch to an existing
index WITHOUT rebuilding the corpus.

The reference re-runs its whole crawl -> index chain to pick up new
pages (there is no delta path in ``crawler/Crawler.java`` / the
inferred indexer contract — the KVS ``index`` table is simply
regenerated); this module adds the natural extension:

    update_index(new_pages, base_dir, out_dir)
      1. DELTA BUILD: ``build_index`` over the new batch only, with the
         base index's (doc_id, content_sha1) seen set broadcast into the
         extraction actors (``ExtractDocs(content_seen_ref=...)``) —
         the reference's ``contentSeen`` table (``Crawler.java:178-190``)
         generalized across index generations, FIRST-INDEXED WINS. Urls
         already indexed are excluded too (doc_id = hash64(url)), so a
         re-crawled url can never land duplicate doc_ids in one index.
         Note: a full rebuild over the union keeps the min-doc_id copy
         of duplicated content, so cross-batch duplicate TIES can differ
         between the two paths — documented here, exercised by test.
      2. SHARD MERGE: per shard (one Ray task each, all shards in
         parallel) terms present on only one side PASS THROUGH untouched
         (delta << base at scale, so almost all base rows move zero
         bytes through the codec); terms present in both are decoded,
         merged and re-encoded with the SAME vectorized kernel the
         build's bucket merge uses (``_encode_bucket``) — per-term
         output is canonical (doc_id-sorted, delta+varint), so a merged
         term's blob is BIT-IDENTICAL to a full rebuild's (asserted by
         tests/test_update_index.py). No per-term Python.
      3. METADATA: N/total_len/avgdl add up exactly; the docstore is
         hard-linked from both inputs (``DocStore`` lookups handle
         overlapping row-group id ranges); the union seen set is written
         to ``seen.parquet`` so the NEXT update needs one narrow column
         read, not the docs checkpoint.

    The output dir is a complete SERVING index (shards + term_stats +
    docstore + meta + seen) — it does not carry the docs checkpoint, so
    it resumes updates (via seen.parquet) but not fresh phase-A builds.

    Scale knobs: one merge task holds ~vocabulary/num_shards posting
    rows plus the decoded postings of the overlapping terms only; raise
    ``num_shards`` (fixed at base-build time) or sub-bucket a shard's
    overlap merge by term hash when a shard outgrows a worker. The seen
    set broadcast is O(corpus) ids+hashes; above ~10^9 docs swap the
    frozensets for a bloom filter (false positives only ever drop a
    page, never corrupt the index).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from ..state.manifest import write_json_atomic
from .build_index import (
    IndexPaths,
    POSTING_SCHEMA,
    _docs_parquet_files,
    _encode_bucket,
    _fresh_dir,
    _posting_cols,
    build_index,
)


def _parquet_files_under(root: str) -> list[str]:
    out = []
    for r, _d, names in os.walk(root):
        out.extend(
            os.path.join(r, n)
            for n in names
            if n.endswith(".parquet") and not n.startswith(("_", "."))
        )
    return sorted(out)


def _seen_table(index_dir: str) -> pa.Table:
    """(doc_id, content_sha1) of every page an index has already
    admitted — including exact-dup losers (their urls/content were
    crawled; first-indexed wins)."""
    p = os.path.join(index_dir, "seen.parquet")
    if os.path.exists(p):
        return pq.read_table(p)
    files = _docs_parquet_files(IndexPaths(index_dir))
    if not files:  # empty index (e.g. a fully-gated delta build)
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "content_sha1": pa.array([], pa.string()),
            }
        )
    return pa.concat_tables(
        [pq.read_table(f, columns=["doc_id", "content_sha1"]) for f in files]
    ).combine_chunks()


def _link_tree(src_dir: str, dst_dir: str, prefix: str) -> None:
    """Hard-link (copy-on-fail) every parquet file of ``src_dir`` into
    flat ``dst_dir`` under collision-free names."""
    os.makedirs(dst_dir, exist_ok=True)
    for i, f in enumerate(_parquet_files_under(src_dir)):
        dst = os.path.join(dst_dir, f"{prefix}_{i:05d}.parquet")
        try:
            os.link(f, dst)
        except OSError:
            shutil.copy2(f, dst)


def _merge_posting_tables(parts: list[pa.Table], cols: list[str] | None = None) -> pa.Table:
    """Concatenate posting tables; re-encode ONLY terms occurring more
    than once (one vectorized ``_encode_bucket`` call over the overlap),
    pass the rest through zero-copy. ``cols`` is the shard-row column
    set (``_posting_cols`` — includes ``pos_blob`` for a format-3
    positional index; ``_encode_bucket`` carries positions through the
    overlap merge automatically)."""
    cols = cols or POSTING_SCHEMA.names
    both = pa.concat_tables(
        [t.select(cols) for t in parts], promote_options="default"
    ).combine_chunks()
    if len(parts) == 1:
        return both
    d = both["term"].combine_chunks().dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False)
    dup = np.bincount(codes, minlength=len(d.dictionary))[codes] > 1
    if not dup.any():
        return both
    merged = _encode_bucket(both.filter(pa.array(dup)))
    return pa.concat_tables(
        [both.filter(pa.array(~dup)), merged.select(cols)],
        promote_options="default",
    )


def update_index(
    new_pages_path: str,
    base_dir: str,
    out_dir: str,
    *,
    num_partitions: int = 4,
    delta_dir: str | None = None,
) -> IndexPaths:
    """Merge ``new_pages_path`` into the index at ``base_dir``, writing
    the updated index to ``out_dir`` (base is never mutated — crash-safe
    by construction). Returns the new ``IndexPaths``."""
    t0 = time.time()
    with open(os.path.join(base_dir, "meta.json")) as f:
        base_meta = json.load(f)
    num_shards = int(base_meta["num_shards"])
    with_positions = bool(base_meta.get("positions"))
    posting_cols = _posting_cols(with_positions)

    seen = _seen_table(base_dir)
    delta_dir = delta_dir or out_dir + ".delta"
    shutil.rmtree(delta_dir, ignore_errors=True)
    delta_paths = build_index(
        new_pages_path,
        delta_dir,
        num_shards=num_shards,
        num_salts=int(base_meta["num_salts"]),
        num_partitions=num_partitions,
        content_seen_ref=ray.put(
            (seen["doc_id"].to_pylist(), seen["content_sha1"].to_pylist())
        ),
        store_positions=with_positions,  # delta matches the base format
    )
    with open(delta_paths.meta) as f:
        delta_meta = json.load(f)

    out = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    _fresh_dir(out.shards)
    _fresh_dir(out.term_stats)
    _fresh_dir(out.docstore)

    base_shards = os.path.join(base_dir, "shards")
    delta_shards = delta_paths.shards

    @ray.remote
    def merge_shard(s: int) -> int:
        parts = [
            pq.read_table(d, columns=posting_cols)
            for d in (
                os.path.join(base_shards, f"shard={s}"),
                os.path.join(delta_shards, f"shard={s}"),
            )
            if os.path.isdir(d)
        ]
        parts = [t for t in parts if t.num_rows]
        if not parts:
            return 0
        merged = _merge_posting_tables(parts, posting_cols)
        sd = os.path.join(out.shards, f"shard={s}")
        os.makedirs(sd, exist_ok=True)
        pq.write_table(merged, os.path.join(sd, "merged.parquet"))
        pq.write_table(
            merged.select(["term", "df", "cf"]),
            os.path.join(out.term_stats, f"stats_{s:04d}.parquet"),
        )
        return merged.num_rows

    ray.get([merge_shard.remote(s) for s in range(num_shards)])

    _link_tree(os.path.join(base_dir, "docstore"), out.docstore, "base")
    _link_tree(delta_paths.docstore, out.docstore, "delta")

    delta_seen = _seen_table(delta_dir)
    union = pa.concat_tables([seen, delta_seen], promote_options="default")
    union = union.group_by(["doc_id", "content_sha1"]).aggregate([])
    pq.write_table(union, os.path.join(out_dir, "seen.parquet"))

    n = int(base_meta["N"]) + int(delta_meta["N"])
    total_len = int(base_meta["total_len"]) + int(delta_meta["total_len"])
    write_json_atomic(
        out.meta,
        {
            **{
                k: base_meta[k]
                for k in (
                    "index_format",
                    "positions",
                    "k1",
                    "b",
                    "num_shards",
                    "num_salts",
                    "hot_df_threshold",
                )
                if k in base_meta
            },
            "N": n,
            "avgdl": (total_len / n) if n else 0.0,
            "total_len": total_len,
            "num_salted_terms": 0,  # merged blobs are canonical (salt-free)
            "num_duplicate_docs": int(base_meta["num_duplicate_docs"])
            + int(delta_meta["num_duplicate_docs"]),
            "updated_from": {
                "base": base_dir,
                "delta_docs": int(delta_meta["N"]),
                "wall_sec": round(time.time() - t0, 3),
            },
        },
    )
    return out
