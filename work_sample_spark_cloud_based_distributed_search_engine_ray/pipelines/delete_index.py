"""Document deletion from an existing index — the tombstone path
(recrawl removals, takedown/GDPR deletes) the reference lacks entirely
(its KVS ``index`` table can only be regenerated wholesale; there is no
delete anywhere in ``kvs/Worker.java``'s row lifecycle).

    delete_from_index(base_dir, urls, out_dir)

Contract (exercised by tests/test_delete_index.py and the
``index_delete_stats`` driver oracle):

- ``urls`` name documents by identity (doc_id = hash64(url), the
  system-wide invariant). Urls not in the index are no-ops.
- Postings: every deleted doc_id disappears from every term; terms
  whose postings empty out disappear entirely. UNAFFECTED terms pass
  through zero-copy — only terms that actually contained a deleted doc
  are decoded and re-encoded (with the same vectorized whole-shard
  kernels as the build), so a small delete set touches a small byte
  fraction of the index. Re-encoded blobs are canonical, bit-identical
  to a from-scratch encode of the surviving postings.
- Doc store: rewritten per file (one Ray task each); files with no
  deleted rows are hard-linked, not copied.
- Stats: N / total_len / avgdl shrink by exactly the removed winner
  docs (doc_len read from the filtered doc-store rows); per-term df/cf
  fall out of the re-encode.
- ``seen.parquet``: deleted doc_ids' rows are removed, so a later
  ``update_index`` can re-admit the same url or content.
- Dedup interaction (documented, pinned by the oracle): deletion does
  NOT re-run content dedup. A full rebuild over the surviving pages
  would promote an exact-dup LOSER to winner where the winner was
  deleted; this path keeps the original winner set minus the deleted
  docs — the behaviour of every tombstone-based engine.

Scale: the delete id set broadcasts via ``ray.put`` (O(deletes), not
corpus); each shard task decodes only its own doc_id streams (one
vectorized pass) to find affected terms. The doc-store rewrite is one
task per file — resumable output layout, no shuffle anywhere.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..functions.codec import (
    binary_values_view,
    decode_position_stream,
    decode_runs_concat,
    encode_postings_multi,
    gather_segments,
)
from ..functions.hashing import hash64
from ..state.manifest import write_json_atomic
from .build_index import IndexPaths, _encoded_table, _fresh_dir, _posting_cols


def delete_postings_from_table(t: pa.Table, del_ids: np.ndarray) -> pa.Table:
    """Remove ``del_ids`` postings from one shard's posting table.

    One vectorized decode of the doc_id streams finds the affected
    terms; unaffected rows pass through zero-copy; affected terms are
    re-encoded from their surviving postings in one
    ``encode_postings_multi`` call (positions carried through for a
    format-3 table). Terms with no surviving posting are dropped."""
    if t.num_rows == 0 or del_ids.size == 0:
        return t
    with_pos = "pos_blob" in t.column_names
    g = t.combine_chunks()
    ns = g["df"].to_numpy(zero_copy_only=False)
    ids, tfs, dls = decode_runs_concat(
        binary_values_view(g["doc_blob"]),
        binary_values_view(g["tf_blob"]),
        binary_values_view(g["dl_blob"]),
        ns,
    )
    hit = np.isin(ids, del_ids)
    if not hit.any():
        return t
    row_term = np.repeat(np.arange(len(ns), dtype=np.int64), ns)
    affected = np.zeros(len(ns), dtype=bool)
    affected[row_term[hit]] = True
    keep_rows = pa.array(~affected)
    untouched = g.filter(keep_rows)

    sel = affected[row_term] & ~hit  # surviving postings of affected terms
    pos_sel = None
    if with_pos:
        pos_flat = decode_position_stream(binary_values_view(g["pos_blob"]), tfs)
        pos_sel = gather_segments(pos_flat, tfs, np.flatnonzero(sel))
    enc = encode_postings_multi(
        row_term[sel], ids[sel], tfs[sel], dls[sel], pos_flat=pos_sel
    )
    terms = g["term"].combine_chunks().take(pa.array(enc["codes_out"]))
    reenc = _encoded_table(terms, enc)
    cols = _posting_cols(with_pos)
    return pa.concat_tables(
        [untouched.select(cols), reenc.select(cols)], promote_options="default"
    )


def delete_from_index(
    base_dir: str,
    urls: list[str],
    out_dir: str,
) -> IndexPaths:
    """Write a complete serving index to ``out_dir`` equal to the index
    at ``base_dir`` minus the documents named by ``urls`` (base is
    never mutated — crash-safe by construction)."""
    t0 = time.time()
    with open(os.path.join(base_dir, "meta.json")) as f:
        base_meta = json.load(f)
    num_shards = int(base_meta["num_shards"])
    with_positions = bool(base_meta.get("positions"))
    posting_cols = _posting_cols(with_positions)
    del_ids = np.unique(np.array([hash64(u) for u in urls], dtype=np.int64))
    del_ref = ray.put(del_ids)

    # the doc store also carries exact-dup LOSER rows (served for their
    # canonical url); losers are not counted in N/total_len, so a
    # deleted loser must not decrement them
    loser_ids: set[int] = set()
    dup_dir = os.path.join(base_dir, "dup_map")
    if os.path.isdir(dup_dir):
        loser_ids = set(
            pq.read_table(dup_dir, columns=["doc_id"])["doc_id"].to_pylist()
        )
    loser_ref = ray.put(loser_ids)

    out = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    _fresh_dir(out.shards)
    _fresh_dir(out.term_stats)
    _fresh_dir(out.docstore)
    base_shards = os.path.join(base_dir, "shards")

    @ray.remote
    def rewrite_shard(s: int) -> int:
        d = os.path.join(base_shards, f"shard={s}")
        if not os.path.isdir(d):
            return 0
        t = pq.read_table(d, columns=posting_cols)
        kept = delete_postings_from_table(t, ray.get(del_ref))
        sd = os.path.join(out.shards, f"shard={s}")
        os.makedirs(sd, exist_ok=True)
        pq.write_table(kept, os.path.join(sd, "merged.parquet"))
        pq.write_table(
            kept.select(["term", "df", "cf"]),
            os.path.join(out.term_stats, f"stats_{s:04d}.parquet"),
        )
        return kept.num_rows

    @ray.remote
    def rewrite_docstore_file(i: int, f: str) -> tuple[int, int, int]:
        """Returns (winner docs removed, winner doc_len removed, loser
        rows removed); hard-links untouched files instead of rewriting."""
        import pyarrow.compute as pc

        t = pq.read_table(f)
        mask = pc.is_in(t["doc_id"], value_set=pa.array(ray.get(del_ref), pa.int64()))
        n_hit = int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)
        dst = os.path.join(out.docstore, f"docs_{i:05d}.parquet")
        if n_hit == 0:
            try:
                os.link(f, dst)
            except OSError:
                shutil.copy2(f, dst)
            return 0, 0, 0
        removed = t.filter(mask)
        losers = ray.get(loser_ref)
        is_loser = np.array(
            [d in losers for d in removed["doc_id"].to_pylist()], dtype=bool
        )
        dls = removed["doc_len"].to_numpy(zero_copy_only=False)
        pq.write_table(t.filter(pc.invert(mask)), dst)
        n_losers = int(is_loser.sum())
        return n_hit - n_losers, int(dls[~is_loser].sum()), n_losers

    store_files = sorted(
        os.path.join(r, n)
        for r, _d, names in os.walk(os.path.join(base_dir, "docstore"))
        for n in names
        if n.endswith(".parquet") and not n.startswith(("_", "."))
    )
    shard_refs = [rewrite_shard.remote(s) for s in range(num_shards)]
    store_refs = [
        rewrite_docstore_file.remote(i, f) for i, f in enumerate(store_files)
    ]
    ray.get(shard_refs)
    removed = ray.get(store_refs)
    n_removed = sum(r for r, _l, _lo in removed)
    len_removed = sum(l for _r, l, _lo in removed)
    losers_removed = sum(lo for _r, _l, lo in removed)

    # seen: forget the deleted docs so a later update can re-admit them
    seen_path = os.path.join(base_dir, "seen.parquet")
    if not os.path.exists(seen_path):
        from .update_index import _seen_table

        seen = _seen_table(base_dir)
    else:
        seen = pq.read_table(seen_path)
    import pyarrow.compute as pc

    drop = pc.is_in(seen["doc_id"], value_set=pa.array(del_ids, pa.int64()))
    pq.write_table(seen.filter(pc.invert(drop)), os.path.join(out_dir, "seen.parquet"))

    n = int(base_meta["N"]) - n_removed
    total_len = int(base_meta["total_len"]) - len_removed
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
            "num_duplicate_docs": int(base_meta["num_duplicate_docs"])
            - losers_removed,
            "N": n,
            "avgdl": (total_len / n) if n else 0.0,
            "total_len": total_len,
            "num_salted_terms": 0,  # rewritten blobs are canonical
            "deleted_from": {
                "base": base_dir,
                "requested": len(urls),
                "removed_docs": n_removed,
                "wall_sec": round(time.time() - t0, 3),
            },
        },
    )
    return out
