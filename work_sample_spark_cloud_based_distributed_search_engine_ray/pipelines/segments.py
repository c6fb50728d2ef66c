"""Segment-based incremental index update — O(delta) I/O per update.

Round-4's ``update_index`` merged every delta into the base by
re-reading and re-writing EVERY base shard (``update_index.py:187-203``)
— correct, but per-update I/O was O(base): at the 100-TB steady state a
+0.1% hourly delta would rewrite the full posting store every hour.
This module replaces that asymptote with the Lucene commit model:

  an index directory holds immutable SEGMENTS (each a complete plain
  index: shards/term_stats/docstore/meta.json + sorted seen sidecars);
  ``segments.json`` is the single atomic commit point (list of live
  segments + aggregated global stats). An update

    1. builds the delta as a NEW segment (``build_index`` over the new
       pages only, gated by the bounded-memory bloom+exact
       ``state.seenset.SeenGate`` — no O(corpus) broadcast),
    2. writes the segment's seen sidecars and ORs its keys into the
       persistent bloom (O(delta + bloom bytes)),
    3. atomically rewrites ``segments.json``.

  Base segments are NEVER touched: bytes written per update = delta
  segment + bloom + manifest (asserted <10% of base for a +1% delta by
  tests/test_segments.py and measured in BENCH). Crash-safety falls out
  of the commit model: a crash before step 3 leaves an orphan build
  directory and a perfectly intact index.

Serving the union (``SegmentedIndex``): segments hold DISJOINT doc sets
(the gate guarantees first-indexed-wins across generations), so each
doc's full BM25 score lives in exactly one segment. Query = per-segment
``SearchIndex.bm25_topk_global`` with GLOBAL (N, avgdl, df) — the same
doc-range scatter-gather invariant the multi-shard serving tier already
relies on (``pipelines/query.py:288``) — then an exact top-k merge.
Scores are bit-identical to a single fresh union build (same float
kernels, same query-term accumulation order; asserted by tests).

Segment counts are bounded by TIERED COMPACTION (``maybe_compact``,
Lucene's merge policy shape): segments bucket by doc-count decade and a
tier merges when it holds ``merge_factor`` members, so total merge I/O
per doc is O(log(N)/log(merge_factor)) over the index's lifetime — the
amortized cost that replaces update_index's O(base) per update. The
merge itself reuses the canonical per-shard run merge
(``update_index._merge_posting_tables``): merged blobs are
bit-identical to a fresh build's.

The reference has no delta path at all (its KVS ``index`` table is
regenerated wholesale — SURVEY §2.2 crawl-record write, §7.3); this is
the extension a steady-state corpus needs.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..functions.bloom import SeenBloom
from ..state.manifest import write_json_atomic
from ..state.seenset import SeenGate, build_seen_bloom, write_seen_sidecars
from .build_index import IndexPaths, _posting_cols, build_index
from .update_index import _link_tree, _merge_posting_tables, _seen_table

SEGMENTS_FILE = "segments.json"
BLOOM_FILE = "seen_bloom.npz"


def is_segmented(index_dir: str) -> bool:
    return os.path.exists(os.path.join(index_dir, SEGMENTS_FILE))


def _read_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, SEGMENTS_FILE)) as f:
        return json.load(f)


def _seg_meta(index_dir: str, name: str) -> dict:
    with open(os.path.join(index_dir, name, "meta.json")) as f:
        return json.load(f)


def _du(path: str) -> int:
    total = 0
    for r, _d, names in os.walk(path):
        for n in names:
            try:
                total += os.path.getsize(os.path.join(r, n))
            except OSError:
                pass
    return total


def _commit(index_dir: str, names: list[str], next_id: int) -> dict:
    """Atomically commit the segment list: aggregate global stats from
    the member metas INTO segments.json (the one commit file), then
    mirror them to a top-level meta.json for path-based tools (serving
    generation tags, ``SearchIndex.load`` dispatch). segments.json is
    authoritative; the mirror is advisory."""
    metas = [_seg_meta(index_dir, n) for n in names]
    n_total = sum(int(m["N"]) for m in metas)
    total_len = sum(int(m["total_len"]) for m in metas)
    base = metas[0]
    manifest = {
        "segments": names,
        "next_id": next_id,
        "N": n_total,
        "total_len": total_len,
        "avgdl": (total_len / n_total) if n_total else 0.0,
        "per_segment_docs": {n: int(m["N"]) for n, m in zip(names, metas)},
        **{
            k: base[k]
            for k in (
                "index_format", "positions", "k1", "b",
                "num_shards", "num_salts", "hot_df_threshold",
            )
            if k in base
        },
        "num_duplicate_docs": sum(int(m.get("num_duplicate_docs", 0)) for m in metas),
        "committed_at": time.time(),
    }
    write_json_atomic(os.path.join(index_dir, SEGMENTS_FILE), manifest)
    write_json_atomic(
        os.path.join(index_dir, "meta.json"),
        {k: v for k, v in manifest.items() if k not in ("segments", "next_id")}
        | {"segmented": True},
    )
    return manifest


def create_segmented(base_dir: str, out_dir: str) -> dict:
    """Convert a plain index into a segmented one: the base becomes
    ``seg_00000000`` (hard-linked — zero data bytes copied), gains its
    sorted seen sidecars, and the persistent bloom is seeded. The base
    is never mutated."""
    os.makedirs(out_dir, exist_ok=True)
    seg = os.path.join(out_dir, "seg_00000000")
    if os.path.exists(seg):
        shutil.rmtree(seg)
    _link_dir_tree(base_dir, seg)
    seen = _seen_table(base_dir)
    write_seen_sidecars(seg, seen)
    bloom = build_seen_bloom([seen])
    bloom.save(os.path.join(out_dir, BLOOM_FILE))
    return _commit(out_dir, ["seg_00000000"], 1)


def _link_dir_tree(src: str, dst: str) -> None:
    """Hard-link (copy on cross-device) a directory tree, preserving
    layout — metadata-only O(#files), zero data bytes."""
    for root, _dirs, names in os.walk(src):
        rel = os.path.relpath(root, src)
        droot = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(droot, exist_ok=True)
        for n in names:
            if n.startswith(("_", ".")):
                continue
            s, d = os.path.join(root, n), os.path.join(droot, n)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


def _segment_gate(index_dir: str, names: list[str], exact: bool = True) -> SeenGate:
    """The bounded-memory contentSeen gate over the live segments:
    persistent bloom (rebuilt from sidecars only if missing or
    over capacity) + per-segment sorted key sidecars for exact
    confirmation of bloom positives."""
    bpath = os.path.join(index_dir, BLOOM_FILE)
    bloom = SeenBloom.load(bpath) if os.path.exists(bpath) else None
    if bloom is None or bloom.n_added > bloom.capacity:
        seen = [_seen_table(os.path.join(index_dir, n)) for n in names]
        bloom = build_seen_bloom(seen)
        bloom.save(bpath)
    return SeenGate(
        bloom,
        id_dirs=[os.path.join(index_dir, n, "seen_by_id") for n in names],
        sha1_dirs=[os.path.join(index_dir, n, "seen_by_sha1") for n in names],
        exact=exact,
    )


def add_segment(
    index_dir: str,
    new_pages_path: str,
    *,
    num_partitions: int = 4,
    exact_confirm: bool = True,
) -> dict:
    """Index ``new_pages_path`` as a NEW immutable segment of the
    segmented index at ``index_dir``. Returns the update's metrics —
    including the O(delta) evidence: bytes written vs resident base
    bytes. First-indexed wins across generations (the reference's
    ``contentSeen`` semantics, ``crawler/Crawler.java:178-190``)."""
    t0 = time.time()
    man = _read_manifest(index_dir)
    names = list(man["segments"])
    base_bytes = sum(_du(os.path.join(index_dir, n)) for n in names)

    gate = _segment_gate(index_dir, names, exact=exact_confirm)
    bloom_bytes = gate.bloom.nbytes
    seg_name = f"seg_{man['next_id']:08d}"
    building = os.path.join(index_dir, seg_name + ".building")
    shutil.rmtree(building, ignore_errors=True)
    build_index(
        new_pages_path,
        building,
        num_shards=int(man["num_shards"]),
        num_salts=int(man["num_salts"]),
        num_partitions=num_partitions,
        content_seen_ref=ray.put(gate),
        store_positions=bool(man.get("positions")),
    )
    delta_seen = _seen_table(building)
    write_seen_sidecars(building, delta_seen)
    os.replace(building, os.path.join(index_dir, seg_name))

    # persistent bloom: OR in the delta's keys (O(delta)); a capacity
    # overflow triggers a full rebuild on the NEXT update (amortized)
    if delta_seen.num_rows:
        gate.bloom.add_ids(delta_seen["doc_id"].to_numpy(zero_copy_only=False))
        gate.bloom.add_sha1s(delta_seen["content_sha1"].to_pylist())
    gate.bloom.save(os.path.join(index_dir, BLOOM_FILE))

    man = _commit(index_dir, names + [seg_name], man["next_id"] + 1)
    written = _du(os.path.join(index_dir, seg_name)) + gate.bloom.nbytes
    return {
        "segment": seg_name,
        "delta_docs": int(delta_seen.num_rows),
        "wall_sec": round(time.time() - t0, 3),
        "bytes_written": int(written),
        "base_bytes": int(base_bytes),
        "write_ratio_vs_base": round(written / base_bytes, 6) if base_bytes else None,
        "bloom_bytes": int(bloom_bytes),
        "n_segments": len(man["segments"]),
    }


# --------------------------------------------------------------------------
# compaction (tiered merge policy)
# --------------------------------------------------------------------------


def compact_segments(index_dir: str, names: list[str] | None = None) -> str:
    """Fold the given segments (default: all) into ONE new segment.
    Per-shard Ray tasks decode+merge only OVERLAPPING terms' runs
    (``update_index._merge_posting_tables`` — single-side rows pass
    through zero-copy); docstores and docs checkpoints are hard-linked;
    merged blobs are canonical, so a fully-compacted index is
    bit-identical in scoring to a fresh union build (asserted by
    tests/test_segments.py). Old segments are removed AFTER the atomic
    manifest commit."""
    man = _read_manifest(index_dir)
    live = list(man["segments"])
    names = list(names or live)
    if len(names) < 2:
        return names[0] if names else ""
    assert all(n in live for n in names), "can only compact live segments"
    merged_name = f"seg_{man['next_id']:08d}"
    building = os.path.join(index_dir, merged_name + ".building")
    shutil.rmtree(building, ignore_errors=True)
    out = IndexPaths(building)
    os.makedirs(out.shards)
    os.makedirs(out.term_stats)
    os.makedirs(out.docstore)

    with_positions = bool(man.get("positions"))
    posting_cols = _posting_cols(with_positions)
    num_shards = int(man["num_shards"])
    member_dirs = [os.path.join(index_dir, n) for n in names]

    @ray.remote
    def merge_shard(s: int) -> int:
        parts = [
            pq.read_table(d, columns=posting_cols)
            for d in (os.path.join(m, "shards", f"shard={s}") for m in member_dirs)
            if os.path.isdir(d)
        ]
        parts = [t for t in parts if t.num_rows]
        if not parts:
            return 0
        merged = _merge_posting_tables(parts, posting_cols)
        merged = merged.take(pa.compute.sort_indices(merged["term"]))
        sd = os.path.join(out.shards, f"shard={s}")
        os.makedirs(sd, exist_ok=True)
        pq.write_table(merged, os.path.join(sd, "merged.parquet"))
        pq.write_table(
            merged.select(["term", "df", "cf"]),
            os.path.join(out.term_stats, f"stats_{s:04d}.parquet"),
        )
        return merged.num_rows

    refs = [merge_shard.remote(s) for s in range(num_shards)]
    for i, m in enumerate(member_dirs):
        _link_tree(os.path.join(m, "docstore"), out.docstore, f"m{i}")
    seen = pa.concat_tables(
        [_seen_table(m) for m in member_dirs], promote_options="default"
    )
    pq.write_table(
        seen.group_by(["doc_id", "content_sha1"]).aggregate([]),
        os.path.join(building, "seen.parquet"),
    )
    write_seen_sidecars(building, seen)
    metas = [_seg_meta(index_dir, n) for n in names]
    n_total = sum(int(m["N"]) for m in metas)
    total_len = sum(int(m["total_len"]) for m in metas)
    ray.get(refs)
    write_json_atomic(
        out.meta,
        {
            **{
                k: metas[0][k]
                for k in (
                    "index_format", "positions", "k1", "b",
                    "num_shards", "num_salts", "hot_df_threshold",
                )
                if k in metas[0]
            },
            "N": n_total,
            "total_len": total_len,
            "avgdl": (total_len / n_total) if n_total else 0.0,
            "num_salted_terms": 0,  # merged blobs are canonical
            "num_duplicate_docs": sum(int(m.get("num_duplicate_docs", 0)) for m in metas),
            "compacted_from": names,
        },
    )
    os.replace(building, os.path.join(index_dir, merged_name))
    # commit: merged segment takes the position of its oldest member
    # (doc order is irrelevant — segments are doc-disjoint)
    survivors = [n for n in live if n not in names]
    pos = live.index(names[0])
    new_list = survivors[:]
    new_list.insert(min(pos, len(survivors)), merged_name)
    _commit(index_dir, new_list, man["next_id"] + 1)
    for n in names:  # post-commit GC; a crash here only leaks disk
        shutil.rmtree(os.path.join(index_dir, n), ignore_errors=True)
    return merged_name


def maybe_compact(index_dir: str, *, merge_factor: int = 4) -> list[str]:
    """Tiered merge policy (the Lucene shape): segments bucket by
    doc-count decade (tier = floor(log10(N))); when a tier accumulates
    ``merge_factor`` members they fold into one (usually promoting it
    a tier), repeating until quiescent. Amortized merge I/O per doc is
    O(log N / log merge_factor) over the index lifetime — this is what
    keeps update cost ∝ delta while bounding segment fan-in at serve
    time. Returns the names of segments created."""
    import math

    created = []
    while True:
        man = _read_manifest(index_dir)
        tiers: dict[int, list[str]] = {}
        for n in man["segments"]:
            docs = int(man["per_segment_docs"].get(n, 0))
            tiers.setdefault(int(math.log10(max(docs, 1))), []).append(n)
        todo = [ns for ns in tiers.values() if len(ns) >= merge_factor]
        if not todo:
            return created
        created.append(compact_segments(index_dir, todo[0][:merge_factor]))


# --------------------------------------------------------------------------
# serving the segment union
# --------------------------------------------------------------------------


class SegmentedIndex:
    """Query tier over a segmented index: exact BM25 top-k over the
    union, bit-identical to a fresh single-index build.

    Works because segments hold DISJOINT docs (the update gate), so a
    doc's whole score comes from one segment: per-segment exhaustive
    scoring with GLOBAL stats (``SearchIndex.bm25_topk_global`` — the
    verdict-cited scatter-gather building block) then an exact k-merge
    on (score desc, doc_id asc). At cluster scale each segment's
    scorer is itself shard-partitioned, so the fan-out composes:
    (segment x shard) actors, one exact merge."""

    def __init__(self, root: str):
        from .query import SearchIndex

        self.root = root
        man = _read_manifest(root)
        self.manifest = man
        self.segments = [
            SearchIndex.load(os.path.join(root, n)) for n in man["segments"]
        ]
        self.N = int(man["N"])
        self.avgdl = float(man["avgdl"]) or 1.0
        self.total_len = int(man["total_len"])
        self.k1 = float(man["k1"])
        self.b = float(man["b"])
        self.meta = {**man, "segmented": True}
        self._docstores: list | None = None

    # ---------------- stats ----------------

    def has_term(self, term: str) -> bool:
        return any(s.has_term(term) for s in self.segments)

    def df_global(self, terms: list[str]) -> dict[str, int]:
        return {
            t: sum(s.postings(t).df for s in self.segments if s.has_term(t))
            for t in terms
        }

    # ---------------- BM25 ----------------

    def bm25_topk(self, query: str, k: int = 10, method: str = "auto") -> list[tuple[int, float]]:
        from ..functions.tokenize import tokenize_query

        q_terms = [t for t in tokenize_query(query) if self.has_term(t)]
        if not q_terms:
            return []
        dfg = self.df_global(list(dict.fromkeys(q_terms)))
        cands: list[tuple[int, float]] = []
        for s in self.segments:
            cands.extend(
                s.bm25_topk_global(
                    query, k, n_global=self.N, avgdl_global=self.avgdl, df_global=dfg
                )
            )
        cands.sort(key=lambda t: (-t[1], t[0]))
        return cands[:k]

    bm25_topk_exhaustive = bm25_topk

    # ---------------- result assembly ----------------

    def fetch_docs(self, doc_ids: list[int]) -> dict[int, dict]:
        from .query import DocStore

        if self._docstores is None:
            self._docstores = [
                DocStore(os.path.join(self.root, n, "docstore"))
                for n in self.manifest["segments"]
            ]
        out: dict[int, dict] = {}
        want = list(doc_ids)
        for ds in self._docstores:
            if not want:
                break
            got = ds.lookup(want)
            out.update(got)
            want = [d for d in want if d not in out]
        return out

    def search(self, query: str, k: int = 10) -> list[dict]:
        ranked = self.bm25_topk(query, k)
        rows = self.fetch_docs([d for d, _ in ranked])
        return [
            {
                "url": rows[d]["url"],
                "rank_score": s,
                "title": rows[d]["title"],
                "body": rows[d]["body"],
            }
            for d, s in ranked
        ]

    def term_stats(self) -> pa.Table:
        """Global (term, df, cf) across segments — df/cf sum exactly
        because segments are doc-disjoint."""
        parts = [
            pq.read_table(os.path.join(self.root, n, "term_stats"))
            for n in self.manifest["segments"]
        ]
        t = pa.concat_tables(parts, promote_options="default")
        return (
            t.group_by("term")
            .aggregate([("df", "sum"), ("cf", "sum")])
            .rename_columns(["term", "df", "cf"])
            .sort_by("term")
        )
