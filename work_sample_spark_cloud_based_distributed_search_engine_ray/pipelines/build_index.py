"""Inverted-index build — the flagship Ray Data pipeline.

Replaces the reference's (absent) ``cis5550.jobs.Indexer`` whose output
contract is recovered from its consumer (``search/Searcher.java:52-57,
78-101``): per-term posting lists + a per-doc store. Architecture is
Ray-Data-first, NOT a translation of the reference's Flame/KVS engine:

  phase A  read_parquet(pages, pruned columns)
             -> map_batches(ExtractDocs actor pool)     [stateful stage]
             -> write parquet docs checkpoint (per input partition,
                atomic manifest with lineage+metrics -> RESUMABLE)
  phase B  (all inputs are the phase-A checkpoint, column-pruned reads)
    B1 dedup decisions: narrow groupby(content_sha1) keep-first ->
       losers map (doc_id -> canonical url)             [shuffle, narrow]
    B2 doc store: docs meta + canonical flags, sorted by doc_id
    B3 term stats: explode postings -> per-batch partial (df, cf) ->
       groupby(term).aggregate(Sum)                     [combiner first!]
       global N/avgdl from doc lens; hot terms = df >= threshold
    B4 postings shuffle: explode -> salt hot terms into doc_id-RANGE
       sub-keys -> groupby(group_key).map_groups(sort+delta+varint
       encode) -> groupby(term).map_groups(merge salted runs) ->
       shard-partitioned parquet                        [THE shuffle]

Scale notes (explicitly designed for 256-node / 100 TB):
- The only wide shuffles are B1 (narrow columns) and B4. B4's raw rows
  are (term, doc_id, tf) — html/text/title never enter a shuffle.
- Hot-term skew (Zipf head, df ~ N) is defused by salting into
  ``num_salts`` doc_id-range sub-keys; the per-salt groups encode in
  parallel and the final per-term merge touches only compressed runs
  (vectorized decode/concat/re-encode), not raw rows.
- Term stats shuffle only per-batch partial aggregates (vocabulary-
  sized), never raw postings — the combiner pattern.
- Every global stat (N, avgdl, df, cf) is computed exactly, so builds
  at different parallelism levels produce identical shards and
  identical BM25 scores (asserted by tests) — the N-vs-4N parity
  requirement.
- doc_id = hash64(url): deterministic, partition-independent.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Sum

# Ray's write path lazily does `from fsspec.implementations.http import
# HTTPFileSystem` and catches only ModuleNotFoundError. In this
# environment aiohttp is absent, so that import always fails — and when
# two driver threads race on the first import, the failure surfaces as a
# bare ImportError (partially-imported module) that Ray does NOT catch.
# Seed a deterministic stub so the lazy import always succeeds and the
# isinstance check is simply False.
try:  # pragma: no cover
    import fsspec.implementations.http  # noqa: F401
except ModuleNotFoundError:
    import sys
    import types

    _m = types.ModuleType("fsspec.implementations.http")

    class _NoHTTPFileSystem:  # sentinel: isinstance(..., this) is never True
        pass

    _m.HTTPFileSystem = _NoHTTPFileSystem
    sys.modules["fsspec.implementations.http"] = _m

from ..functions.codec import encode_postings, merge_encoded_runs
from ..functions.hashing import hash64
from ..state.manifest import (
    InputFragment,
    PartitionManifest,
    partition_is_done,
    write_json_atomic,
)
from ..stages.extract import ExtractDocs, explode_postings, partial_term_stats

K1 = 1.2
B = 0.75
SALT_SEP = "\x00"  # cannot appear in a token (tokenizer strips controls via \s+/punct)

POSTING_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("doc_blob", pa.binary()),
        ("tf_blob", pa.binary()),
        ("block_last_id", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int64())),
    ]
)


@dataclass
class IndexPaths:
    out_dir: str

    @property
    def docs_ckpt(self) -> str:
        return os.path.join(self.out_dir, "docs")

    @property
    def dup_map(self) -> str:
        return os.path.join(self.out_dir, "dup_map")

    @property
    def docstore(self) -> str:
        return os.path.join(self.out_dir, "docstore")

    @property
    def term_stats(self) -> str:
        return os.path.join(self.out_dir, "term_stats")

    @property
    def shards(self) -> str:
        return os.path.join(self.out_dir, "shards")

    @property
    def meta(self) -> str:
        return os.path.join(self.out_dir, "meta.json")


# --------------------------------------------------------------------------
# phase A: extract to checkpointed docs
# --------------------------------------------------------------------------


def _plan_partitions(pages_path: str, num_partitions: int) -> list[list[InputFragment]]:
    """Split the input parquet's row groups into ``num_partitions``
    contiguous fragments — the checkpoint/lineage unit."""
    paths = [pages_path]
    if os.path.isdir(pages_path):
        paths = sorted(
            os.path.join(pages_path, f)
            for f in os.listdir(pages_path)
            if f.endswith(".parquet")
        )
    frags: list[InputFragment] = []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        for rg in range(md.num_row_groups):
            frags.append(InputFragment(p, rg, rg + 1, md.row_group(rg).num_rows))
    num_partitions = max(1, min(num_partitions, len(frags)))
    out: list[list[InputFragment]] = [[] for _ in range(num_partitions)]
    for i, f in enumerate(frags):
        out[i * num_partitions // len(frags)].append(f)
    return out


@ray.remote
def _read_fragments(frags: list[InputFragment], columns: list[str]) -> pa.Table:
    tables = []
    for f in frags:
        pf = pq.ParquetFile(f.path)
        tables.append(pf.read_row_groups(list(range(f.row_group_start, f.row_group_end)), columns=columns))
    return pa.concat_tables(tables)


def run_phase_a(
    pages_path: str,
    paths: IndexPaths,
    *,
    num_partitions: int = 8,
    batch_size: int = 64,
    concurrency: int | None = None,
    verify_extraction: bool = False,
) -> dict:
    """Extraction checkpoint: one sub-pipeline per input partition, each
    writing ``docs/part=<i>/`` + an atomic lineage manifest. A rerun
    skips partitions whose manifest exists (tests/test_resume.py).

    Partitions run CONCURRENTLY (driver threads, one Ray Data pipeline
    each); Ray schedules all of them onto the shared CPU pool, so the
    checkpoint granularity costs no wall-clock serialization. Per-
    partition doc/token metrics come from a cheap column read of the
    freshly written parquet — no extra pipeline passes."""
    from concurrent.futures import ThreadPoolExecutor

    parts = _plan_partitions(pages_path, num_partitions)
    cols = ["url", "warc_ts", "html", "lang"] + (["text"] if verify_extraction else [])
    pending = [
        (pid, frags)
        for pid, frags in enumerate(parts)
        if not partition_is_done(os.path.join(paths.docs_ckpt, f"part={pid}"))
    ]
    metrics = {
        "partitions": len(parts),
        "skipped": len(parts) - len(pending),
        "docs": 0,
        "tokens": 0,
    }
    if not pending:
        return metrics
    workers = min(4, len(pending))
    total_cpus = int(ray.cluster_resources().get("CPU", 8))
    # Actors reserve their CPU for their lifetime; cap the pools at half
    # the cluster so read/write TASKS of the concurrent pipelines always
    # have headroom (otherwise: resource deadlock).
    pool_size = concurrency or max(1, (total_cpus // 2) // workers)

    def run_one(pid: int, frags: list[InputFragment]) -> tuple[int, int]:
        t0 = time.time()
        part_dir = os.path.join(paths.docs_ckpt, f"part={pid}")
        os.makedirs(part_dir, exist_ok=True)
        # Read exactly this partition's row-group fragments (lineage is
        # precise), pre-sliced into blocks for pool parallelism (a
        # blocking repartition() inside concurrent pipelines can
        # deadlock the shared CPU pool; slicing up front is free).
        tbl = ray.get(_read_fragments.remote(frags, cols))
        nblocks = max(1, min(64, tbl.num_rows // max(batch_size, 1)))
        step = -(-tbl.num_rows // nblocks)
        slices = [tbl.slice(o, step) for o in range(0, tbl.num_rows, step)]
        ds = rd.from_arrow(slices)
        ds = ds.map_batches(
            ExtractDocs,
            fn_constructor_kwargs={"verify_extraction": verify_extraction},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=pool_size,
            num_cpus=1,
        )
        ds.write_parquet(part_dir)
        written = pq.read_table(part_dir, columns=["doc_len"])
        ndocs = written.num_rows
        ntok = int(pc.sum(written["doc_len"]).as_py() or 0)
        PartitionManifest(
            partition_id=pid,
            inputs=frags,
            num_docs=ndocs,
            num_tokens=ntok,
            input_bytes=sum(os.path.getsize(p) for p in {f.path for f in frags}),
            wall_seconds=time.time() - t0,
        ).write(part_dir)
        return ndocs, ntok

    with ThreadPoolExecutor(max_workers=workers) as ex:
        for ndocs, ntok in ex.map(lambda a: run_one(*a), pending):
            metrics["docs"] += ndocs
            metrics["tokens"] += ntok
    return metrics


def _docs_parquet_files(paths: IndexPaths) -> list[str]:
    files = []
    for root, _dirs, names in os.walk(paths.docs_ckpt):
        for n in names:
            if n.endswith(".parquet"):
                files.append(os.path.join(root, n))
    return sorted(files)


# --------------------------------------------------------------------------
# phase B: dedup, doc store, stats, the term shuffle
# --------------------------------------------------------------------------


def _fresh_dir(path: str) -> None:
    """Phase-B outputs are idempotent full overwrites — clear stale
    files first so a resumed build never appends onto a previous run's
    output (doubling rows)."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)


def _losers_of_group(group: pa.Table) -> pa.Table:
    """Per content-hash group -> rows for the NON-canonical docs only
    (doc_id + canonical_url). Winner rule: min (warc_ts, url)."""
    if group.num_rows == 1:
        return group.select(["doc_id", "url"]).slice(0, 0).rename_columns(
            ["doc_id", "canonical_url"]
        )
    ts = group["warc_ts"].to_numpy(zero_copy_only=False)
    urls = np.asarray(group["url"].to_pylist(), dtype=object)
    order = np.lexsort((urls, ts))
    win = int(order[0])
    keep = np.ones(group.num_rows, dtype=bool)
    keep[win] = False
    losers = group.filter(pa.array(keep))
    return pa.table(
        {
            "doc_id": losers["doc_id"],
            "canonical_url": pa.array([urls[win]] * losers.num_rows, pa.string()),
        }
    )


def compute_dup_losers(paths: IndexPaths) -> None:
    """B1: narrow shuffle on content_sha1 -> losers map parquet."""
    ds = rd.read_parquet(_docs_parquet_files(paths), columns=["doc_id", "url", "warc_ts", "content_sha1"])
    losers = ds.groupby("content_sha1").map_groups(_losers_of_group, batch_format="pyarrow")
    _fresh_dir(paths.dup_map)
    losers.write_parquet(paths.dup_map)


def _load_loser_map(paths: IndexPaths) -> dict[int, str]:
    """Losers map is ~dup_rate x N rows; at sandbox scale a broadcast
    dict. (At 10^12 docs this becomes a hash-bucket anti-join with
    ``stages.ops.join_datasets``; the broadcast-vs-shuffle switch is the
    documented small-side pattern.)"""
    files = [
        os.path.join(paths.dup_map, f) for f in os.listdir(paths.dup_map) if f.endswith(".parquet")
    ]
    if not files:
        return {}
    t = pa.concat_tables([pq.read_table(f) for f in files])
    return dict(zip(t["doc_id"].to_pylist(), t["canonical_url"].to_pylist()))


def write_docstore(paths: IndexPaths, loser_ref) -> dict:
    """B2: doc store sorted by doc_id (binary-searchable row groups —
    the scale path for by-id result assembly; replaces the reference's
    full ``urls``-table scan per query, ``Searcher.java:44-57``)."""

    def annotate(batch: pa.Table) -> pa.Table:
        lm: dict[int, str] = ray.get(loser_ref) if loser_ref is not None else {}
        ids = batch["doc_id"].to_pylist()
        can = [lm.get(i) for i in ids]
        is_can = pa.array([c is None for c in can])
        can_url = pa.array(
            [u if c is None else c for c, u in zip(can, batch["url"].to_pylist())], pa.string()
        )
        return batch.append_column("is_canonical", is_can).append_column("canonical_url", can_url)

    cols = ["doc_id", "url", "warc_ts", "lang", "content_sha1", "title", "body_prefix", "doc_len"]
    ds = rd.read_parquet(_docs_parquet_files(paths), columns=cols)
    ds = ds.map_batches(annotate, batch_format="pyarrow")
    ds = ds.sort("doc_id")
    _fresh_dir(paths.docstore)
    ds.write_parquet(paths.docstore)
    # global stats over canonical docs (exact; pinned into meta)
    store = rd.read_parquet(paths.docstore, columns=["doc_id", "doc_len", "is_canonical"])
    canon = store.map_batches(
        lambda t: t.filter(t["is_canonical"]), batch_format="pyarrow"
    )
    n_docs = canon.count()
    total_len = canon.sum("doc_len") if n_docs else 0
    return {"N": int(n_docs), "total_len": int(total_len), "avgdl": (total_len / n_docs) if n_docs else 0.0}


def _postings_ds(paths: IndexPaths, loser_ref) -> rd.Dataset:
    """Exploded canonical postings (term, doc_id, tf) from the docs
    checkpoint — column-pruned read, loser filter via broadcast set."""

    def drop_losers(batch: pa.Table) -> pa.Table:
        lm = ray.get(loser_ref) if loser_ref is not None else {}
        if not lm:
            return batch
        mask = pc.invert(pc.is_in(batch["doc_id"], value_set=pa.array(list(lm), pa.int64())))
        return batch.filter(mask)

    ds = rd.read_parquet(_docs_parquet_files(paths), columns=["doc_id", "terms", "tfs"])
    ds = ds.map_batches(drop_losers, batch_format="pyarrow")
    return ds.map_batches(explode_postings, batch_format="pyarrow")


def compute_term_stats(paths: IndexPaths, loser_ref) -> None:
    """B3: exact df/cf per term via partial-aggregate + tiny shuffle."""
    ds = _postings_ds(paths, loser_ref)
    partials = ds.map_batches(partial_term_stats, batch_format="pyarrow")
    stats = partials.groupby("term").aggregate(
        Sum("partial_df", alias_name="df"), Sum("partial_cf", alias_name="cf")
    )
    _fresh_dir(paths.term_stats)
    stats.write_parquet(paths.term_stats)


def _hot_terms(paths: IndexPaths, threshold: int) -> list[str]:
    """Only the (tiny) hot head ever reaches the driver — never the
    full vocabulary."""
    ds = rd.read_parquet(paths.term_stats, columns=["term", "df"])
    hot = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["df"], threshold)), batch_format="pyarrow"
    )
    return [r["term"] for r in hot.take_all()]


def _encode_group(group: pa.Table) -> pa.Table:
    """One (possibly salted) term group -> one encoded postings run."""
    term = group["group_key"][0].as_py().split(SALT_SEP, 1)[0]
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    tfs = group["tf"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    enc = encode_postings(ids[order], tfs[order])
    return pa.table(
        {
            "term": pa.array([term], pa.string()),
            "df": pa.array([enc["n"]], pa.int64()),
            "cf": pa.array([int(tfs.sum())], pa.int64()),
            "doc_blob": pa.array([enc["doc_blob"]], pa.binary()),
            "tf_blob": pa.array([enc["tf_blob"]], pa.binary()),
            "block_last_id": pa.array([enc["block_last_id"].tolist()], pa.list_(pa.int64())),
            "block_max_tf": pa.array([enc["block_max_tf"].tolist()], pa.list_(pa.int64())),
        }
    )


def _merge_term_runs(group: pa.Table) -> pa.Table:
    """Final per-term merge of salted runs (1-row groups pass through)."""
    if group.num_rows == 1:
        return group.select(POSTING_SCHEMA.names)
    runs = [
        (group["doc_blob"][i].as_py(), group["tf_blob"][i].as_py(), group["df"][i].as_py())
        for i in range(group.num_rows)
    ]
    enc = merge_encoded_runs(runs)
    return pa.table(
        {
            "term": group.slice(0, 1)["term"],
            "df": pa.array([enc["n"]], pa.int64()),
            "cf": pa.array([int(pc.sum(group["cf"]).as_py())], pa.int64()),
            "doc_blob": pa.array([enc["doc_blob"]], pa.binary()),
            "tf_blob": pa.array([enc["tf_blob"]], pa.binary()),
            "block_last_id": pa.array([enc["block_last_id"].tolist()], pa.list_(pa.int64())),
            "block_max_tf": pa.array([enc["block_max_tf"].tolist()], pa.list_(pa.int64())),
        }
    )


def build_shards(
    paths: IndexPaths,
    loser_ref,
    hot_terms: list[str],
    *,
    num_shards: int = 16,
    num_salts: int = 8,
) -> None:
    """B4: THE term shuffle -> compressed, shard-partitioned postings."""
    hot_ref = ray.put(set(hot_terms))
    salt_div = ((1 << 63) + num_salts - 1) // num_salts  # doc_id-range salt

    def add_group_key(batch: pa.Table) -> pa.Table:
        hot: set[str] = ray.get(hot_ref)
        terms = batch["term"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        salts = ids // salt_div
        keys = [
            t if t not in hot else f"{t}{SALT_SEP}{s}" for t, s in zip(terms, salts)
        ]
        return batch.append_column("group_key", pa.array(keys, pa.string()))

    ds = _postings_ds(paths, loser_ref)
    ds = ds.map_batches(add_group_key, batch_format="pyarrow")
    runs = ds.groupby("group_key").map_groups(_encode_group, batch_format="pyarrow")
    final = runs.groupby("term").map_groups(_merge_term_runs, batch_format="pyarrow")

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = pa.array([hash64(t) % num_shards for t in batch["term"].to_pylist()], pa.int64())
        return batch.append_column("shard", shard)

    final = final.map_batches(add_shard, batch_format="pyarrow")
    _fresh_dir(paths.shards)
    final.write_parquet(paths.shards, partition_cols=["shard"])


def build_index(
    pages_path: str,
    out_dir: str,
    *,
    num_shards: int = 16,
    num_salts: int = 8,
    hot_df_threshold: int | None = None,
    num_partitions: int = 8,
    batch_size: int = 64,
    concurrency: int | None = None,
    verify_extraction: bool = False,
) -> IndexPaths:
    """Full build. Resumable: phase A skips partitions with manifests;
    phase B is idempotent (full overwrite of derived dirs)."""
    t0 = time.time()
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    a_metrics = run_phase_a(
        pages_path,
        paths,
        num_partitions=num_partitions,
        batch_size=batch_size,
        concurrency=concurrency,
        verify_extraction=verify_extraction,
    )
    t_a = time.time()
    compute_dup_losers(paths)
    loser_map = _load_loser_map(paths)
    loser_ref = ray.put(loser_map)
    g = write_docstore(paths, loser_ref)
    t_b2 = time.time()
    compute_term_stats(paths, loser_ref)
    if hot_df_threshold is None:
        hot_df_threshold = max(1000, int(0.02 * max(g["N"], 1)))
    hot = _hot_terms(paths, hot_df_threshold)
    t_b3 = time.time()
    build_shards(paths, loser_ref, hot, num_shards=num_shards, num_salts=num_salts)
    t_b4 = time.time()
    write_json_atomic(
        paths.meta,
        {
            "N": g["N"],
            "avgdl": g["avgdl"],
            "total_len": g["total_len"],
            "k1": K1,
            "b": B,
            "num_shards": num_shards,
            "num_salts": num_salts,
            "hot_df_threshold": hot_df_threshold,
            "num_hot_terms": len(hot),
            "num_duplicate_docs": len(loser_map),
            "phase_a": a_metrics,
            "timings_sec": {
                "phase_a_extract": round(t_a - t0, 3),
                "dedup_docstore": round(t_b2 - t_a, 3),
                "term_stats": round(t_b3 - t_b2, 3),
                "shard_build": round(t_b4 - t_b3, 3),
                "total": round(t_b4 - t0, 3),
            },
        },
    )
    return paths
