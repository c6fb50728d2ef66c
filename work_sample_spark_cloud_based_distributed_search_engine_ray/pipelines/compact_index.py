"""Index compaction — merge each shard's file set into one file.

Builds, incremental updates (``update_index``) and deletes
(``delete_index``) each land one-or-more parquet files per shard
directory; after enough generations a serving shard is many small
files (more open/seek cost per query load, more object-store blocks
per scan). Compaction rewrites each ``shard=K`` directory into a
single term-sorted file — posting blobs byte-identical, scoring
bit-identical — and hard-links every non-shard artifact (docstore,
docs checkpoints, dup_map, term_stats, meta, seen) so the compacted
copy is a complete, independently-servable index. The reference has
no analog: its KVS store rewrites whole tables and its ``index``
table never merges at all (SURVEY §7.3 'segment merge').

One Ray task per shard (the shard is the natural parallel unit and
its merged table is bounded by 1/num_shards of the index); base is
never mutated — crash-safe by construction.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

import ray

from .build_index import IndexPaths


def _link_or_copy(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def compact_index(base_dir: str, out_dir: str) -> IndexPaths:
    """Compacted complete index at ``out_dir``: one file per shard,
    rows term-sorted; everything else hard-linked from ``base_dir``."""
    out = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    base_shards = os.path.join(base_dir, "shards")
    shard_ids = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(base_shards)
        if d.startswith("shard=")
    )

    @ray.remote
    def compact_shard(s: int) -> tuple[int, int]:
        d = os.path.join(base_shards, f"shard={s}")
        files = sorted(
            os.path.join(d, n)
            for n in os.listdir(d)
            if n.endswith(".parquet") and not n.startswith(("_", "."))
        )
        t = pa.concat_tables(pq.read_table(f) for f in files).combine_chunks()
        t = t.take(pa.compute.sort_indices(t["term"]))
        sd = os.path.join(out.shards, f"shard={s}")
        os.makedirs(sd, exist_ok=True)
        pq.write_table(t, os.path.join(sd, "compacted.parquet"))
        return len(files), t.num_rows

    os.makedirs(out.shards, exist_ok=True)
    refs = [compact_shard.remote(s) for s in shard_ids]

    # hard-link every non-shard artifact file, preserving layout
    for root, _dirs, names in os.walk(base_dir):
        rel = os.path.relpath(root, base_dir)
        if rel.split(os.sep)[0] == "shards":
            continue
        dst_root = os.path.join(out_dir, rel) if rel != "." else out_dir
        os.makedirs(dst_root, exist_ok=True)
        for n in names:
            if n.startswith(("_", ".")):
                continue
            _link_or_copy(os.path.join(root, n), os.path.join(dst_root, n))

    ray.get(refs)
    return out
