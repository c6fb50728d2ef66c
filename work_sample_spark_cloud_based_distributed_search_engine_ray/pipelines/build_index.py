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
    B1 dedup decisions: 256-way bucket shuffle of content_sha1 ->
       vectorized keep-first per bucket -> losers map   [shuffle, narrow]
    B2 doc store: docs meta + canonical flags, sorted by doc_id;
       global N/avgdl (exact)
    B3 hot-term detection: deterministic 1/8 doc sample, fused
       explode+partial-df combiner -> tiny groupby      [sample pass]
    B4 postings shuffle: explode -> bucket by H(term, doc_id-range salt
       for hot terms) -> ONE groupby(bucket) with vectorized multi-term
       delta+varint encode -> merge ONLY hot terms' salted runs ->
       shard-partitioned parquet; exact df/cf fall out of the encode
       and become the term_stats table                  [THE shuffle]

Scale notes (explicitly designed for 256-node / 100 TB):
- The only wide shuffles are B1 (narrow columns) and B4. B4's raw rows
  are (term, doc_id, tf) — html/text/title never enter a shuffle.
- Hot-term skew (Zipf head, df ~ N) is defused by salting into
  ``num_salts`` doc_id-range sub-keys; the per-salt groups encode in
  parallel and the final per-term merge touches only compressed runs
  (vectorized decode/concat/re-encode), not raw rows.
- Hot-term detection shuffles only per-block partial aggregates over a
  deterministic sample (vocabulary-sized), never raw postings; exact
  df/cf are by-products of the encode, costing no extra pass.
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

from ..functions.codec import (
    binary_values_view,
    decode_position_stream,
    decode_runs_concat,
    encode_postings_multi,
    merge_encoded_runs,
)
from ..functions.hashing import hash64
from ..state.manifest import (
    InputFragment,
    PartitionManifest,
    partition_is_done,
    read_manifest,
    write_json_atomic,
)
from ..stages.extract import (
    HOT_SAMPLE_MOD,
    ExtractDocs,
    explode_postings,
    explode_postings_with_positions,
)
from ..stages.shuffle import hash_map_groups, packed_task_groups

K1 = 1.2
B = 0.75

POSTING_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("doc_blob", pa.binary()),
        ("tf_blob", pa.binary()),
        ("dl_blob", pa.binary()),
        ("block_last_id", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int64())),
        ("block_min_dl", pa.list_(pa.int64())),
        # format 4: per-block byte offsets into each blob (block k's
        # first varint starts at byte off[k] of the term's blob) — the
        # serving WAND path decodes ONLY admitted blocks' byte slices
        ("block_doc_off", pa.list_(pa.int64())),
        ("block_tf_off", pa.list_(pa.int64())),
        ("block_dl_off", pa.list_(pa.int64())),
    ]
)


def _posting_cols(with_positions: bool) -> list[str]:
    """Shard-row column set; format 3 appends the per-term position
    stream ``pos_blob`` (delta-varint, restart at each posting)."""
    return POSTING_SCHEMA.names + (["pos_blob"] if with_positions else [])


# Narrow commit-pass schema for partitions whose pages were ALL gated
# out (incremental update contentSeen); types mirror ExtractDocs output.
_EMPTY_COMMIT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("content_sha1", pa.string()),
        ("doc_len", pa.int64()),
        ("sampled_terms", pa.list_(pa.string())),
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


def run_phase_a(
    pages_path: str,
    paths: IndexPaths,
    *,
    num_partitions: int = 8,
    batch_size: int = 64,
    concurrency: int | None = None,
    verify_extraction: bool = False,
    content_seen_ref=None,
    store_positions: bool = False,
) -> dict:
    """Extraction checkpoint: ONE streaming pipeline over all pending
    partitions — fragment-read tasks feed a single shared ExtractDocs
    actor pool, and ``partition_cols=["part"]`` routes every row to its
    ``docs/part=<i>/`` directory. A commit pass then writes each
    partition's atomic lineage manifest (+ sampled hot-term partial).

    Resume contract (tests/test_resume.py): a partition is done iff its
    manifest exists; a rerun processes only pending partitions, after
    clearing their (manifest-less = incomplete) directories. One
    pipeline = one actor-pool spin-up per BUILD, not per partition —
    actor cold-start was the dominant fixed cost of the previous
    pipeline-per-partition design."""
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
    part_walls = {pid: time.time() for pid, _ in pending}
    for pid, _frags in pending:  # incomplete leftovers from a crashed run
        _fresh_dir(os.path.join(paths.docs_ckpt, f"part={pid}"))

    total_cpus = int(ray.cluster_resources().get("CPU", 8))
    pool_size = concurrency or max(1, total_cpus // 2)

    frag_items = [
        {
            "part": pid,
            "path": f.path,
            "rg_start": f.row_group_start,
            "rg_end": f.row_group_end,
        }
        for pid, frags in pending
        for f in frags
    ]

    # The read yields bounded chunks and the extract stage runs with
    # batch_size=None (per yielded block). This matters: Ray FUSES the
    # two map_batches into one actor-pool operator, and a downstream
    # batch_size would be applied to the fused op's INPUT (the tiny
    # fragment-descriptor rows) — bundling ALL fragments into one task
    # and serializing the whole stage onto one actor. Chunked yields
    # keep per-call extraction memory bounded instead (wide html rows).
    chunk = max(batch_size, 2048)

    def read_fragment(batch: pa.Table):
        for row in batch.to_pylist():
            pf = pq.ParquetFile(row["path"])
            t = pf.read_row_groups(list(range(row["rg_start"], row["rg_end"])), columns=cols)
            t = t.append_column("part", pa.array([row["part"]] * t.num_rows, pa.int64()))
            for off in range(0, t.num_rows, chunk):
                yield t.slice(off, chunk)

    # one block per fragment => one parallel read task per fragment
    ds = rd.from_items(frag_items, override_num_blocks=len(frag_items))
    ds = ds.map_batches(read_fragment, batch_format="pyarrow", batch_size=1)
    ds = ds.map_batches(
        ExtractDocs,
        fn_constructor_kwargs={
            "verify_extraction": verify_extraction,
            "content_seen_ref": content_seen_ref,
            "store_positions": store_positions,
        },
        batch_format="pyarrow",
        batch_size=None,
        concurrency=pool_size,
        num_cpus=1,
    )
    # coalesce output files: phase-B re-reads this checkpoint 4x, and
    # hundreds of tiny files dominate those reads' wall time (each
    # streamed block lands as one row group, so reads still split)
    # zstd: the checkpoint is written once and re-read 3-4x; smaller
    # bytes beat codec cpu when the build is storage-bandwidth-bound
    ds.write_parquet(
        paths.docs_ckpt,
        partition_cols=["part"],
        min_rows_per_file=50_000,
        compression="zstd",
    )

    # commit pass (one RAY TASK per partition — distributed, off the
    # driver): per-partition metrics + hot partial + atomic manifest.
    # The same read also yields the NARROW dedup columns as OBJECT REFS
    # (``ray.put`` inside the task): the driver resolves them only when
    # the broadcast-dedup path will actually use them (fresh complete
    # build within the driver budget); otherwise the refs are dropped
    # unread, so driver memory never scales with the corpus.
    dedup_cols = ["doc_id", "url", "warc_ts", "content_sha1", "doc_len"]
    docs_ckpt = paths.docs_ckpt

    @ray.remote
    def commit_one(pid: int, frags: list[InputFragment], wall_start: float):
        part_dir = os.path.join(docs_ckpt, f"part={pid}")
        has_files = os.path.isdir(part_dir) and any(
            n.endswith(".parquet") and not n.startswith(("_", "."))
            for n in os.listdir(part_dir)
        )
        if has_files:
            written = pq.read_table(part_dir, columns=dedup_cols + ["sampled_terms"])
        else:
            # every page of the partition was gated out (e.g. the
            # incremental-update contentSeen filter): commit an empty
            # checkpoint so resume/metrics semantics hold
            os.makedirs(part_dir, exist_ok=True)
            written = _EMPTY_COMMIT_SCHEMA.empty_table()
        ndocs = written.num_rows
        ntok = int(pc.sum(written["doc_len"]).as_py() or 0)
        _write_hot_partial(part_dir, written)
        PartitionManifest(
            partition_id=pid,
            inputs=frags,
            num_docs=ndocs,
            num_tokens=ntok,
            input_bytes=sum(os.path.getsize(p) for p in {f.path for f in frags}),
            wall_seconds=time.time() - wall_start,
        ).write(part_dir)
        return ndocs, ntok, ray.put(written.select(dedup_cols))

    narrow_refs = []
    futs = [commit_one.remote(pid, frags, part_walls[pid]) for pid, frags in pending]
    for ndocs, ntok, tbl_ref in ray.get(futs):
        metrics["docs"] += ndocs
        metrics["tokens"] += ntok
        narrow_refs.append(tbl_ref)
    if metrics["skipped"] == 0 and metrics["docs"] <= DRIVER_DEDUP_LIMIT:
        # fresh complete build within the driver-dedup budget: hand the
        # narrow columns over in memory (resumed/huge builds read disk)
        metrics["dedup_narrow"] = [ray.get(r) for r in narrow_refs]
    return metrics


def _write_hot_partial(part_dir: str, written: pa.Table) -> None:
    """Part of the phase-A checkpoint: per-partition partial document
    frequencies over the deterministic ``doc_id % HOT_SAMPLE_MOD == 0``
    sample (doc_id = hash64(url): the sample is a pure function of
    content, identical at any parallelism). The sample's term sets are
    pre-split into the checkpoint's ``sampled_terms`` column at extract
    time (non-sampled docs hold empty lists), so this reads ~1/8 of the
    terms bytes rather than the full column. The underscore prefix keeps
    the file out of every dataset read of ``docs/`` (pyarrow's default
    ``ignore_prefixes``); hot-term detection later reads ONLY these tiny
    tables — no extra pass over the postings."""
    flat = pc.list_flatten(written["sampled_terms"].combine_chunks())
    agg = pa.table({"term": flat}).group_by("term").aggregate([([], "count_all")])
    out = pa.table(
        {"term": agg["term"], "partial_df": agg["count_all"].cast(pa.int64())}
    )
    tmp = os.path.join(part_dir, "_hot_partial.parquet.tmp")
    pq.write_table(out, tmp)
    os.replace(tmp, os.path.join(part_dir, "_hot_partial.parquet"))


def _docs_parquet_files(paths: IndexPaths) -> list[str]:
    files = []
    for root, _dirs, names in os.walk(paths.docs_ckpt):
        for n in names:
            if n.endswith(".parquet") and not n.startswith(("_", ".")):
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


def _losers_of_bucket(group: pa.Table) -> pa.Table:
    """One hash BUCKET of content-sha1 groups -> loser rows (doc_id +
    canonical_url), fully vectorized: one Arrow multi-key sort, run
    detection via an Arrow string not-equal on shifted slices (no
    Python-object string conversion — this also runs as the whole-corpus
    driver pass below DRIVER_DEDUP_LIMIT, where ``to_pylist`` on
    millions of urls was a fixed serial cost). Winner rule per sha1:
    min (warc_ts, url)."""
    idx = pc.sort_indices(
        group,
        sort_keys=[
            ("content_sha1", "ascending"),
            ("warc_ts", "ascending"),
            ("url", "ascending"),
        ],
    )
    g = group.take(idx).combine_chunks()
    n = g.num_rows
    if n == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "canonical_url": pa.array([], pa.string()),
                "doc_len": pa.array([], pa.int64()),
            }
        )
    sha = g["content_sha1"].combine_chunks()
    first = np.ones(n, dtype=bool)
    if n > 1:
        first[1:] = pc.not_equal(sha.slice(1), sha.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    run_id = np.cumsum(first) - 1
    first_idx = np.flatnonzero(first)
    losers = ~first
    canonical = pc.take(
        g["url"].combine_chunks(), pa.array(first_idx[run_id[losers]], pa.int64())
    )
    mask = pa.array(losers)
    return pa.table(
        {
            "doc_id": g["doc_id"].filter(mask),
            "canonical_url": canonical,
            # loser doc lengths travel with the map so global N/avgdl
            # are pure arithmetic over manifests + this table (no extra
            # pass over the doc store)
            "doc_len": g["doc_len"].filter(mask),
        }
    )


DRIVER_DEDUP_LIMIT = 2_000_000  # docs; above this the bucket shuffle runs


def compute_dup_losers(
    paths: IndexPaths,
    total_docs: int | None = None,
    narrow_tables: list[pa.Table] | None = None,
) -> None:
    """B1: exact content dedup -> losers map parquet.

    Two physical plans behind one semantic (the small-side switch, same
    pattern as broadcast-vs-shuffle join):
    - corpus <= DRIVER_DEDUP_LIMIT docs: ONE vectorized
      ``_losers_of_bucket`` over the whole narrow column set — no
      shuffle, no pipeline fixed cost. On a fresh build the phase-A
      commit pass already read exactly these columns and passes them in
      (``narrow_tables``), so this path touches no disk at all.
    - larger: narrow shuffle on a 256-way bucket of content_sha1.
      Bucket key = first 2 hex chars of the sha1 (uniform); group count
      is fixed at 256 regardless of corpus size, so the shuffle fan-in
      and per-group Python overhead are both bounded.
    """
    cols = ["doc_id", "url", "warc_ts", "content_sha1", "doc_len"]
    files = _docs_parquet_files(paths)
    _fresh_dir(paths.dup_map)
    if total_docs is not None and total_docs <= DRIVER_DEDUP_LIMIT:
        if narrow_tables is not None:
            t = pa.concat_tables(narrow_tables)
        else:
            t = pa.concat_tables([pq.read_table(f, columns=cols) for f in files])
        losers = _losers_of_bucket(t)
        pq.write_table(losers, os.path.join(paths.dup_map, "losers.parquet"))
        return
    ds = rd.read_parquet(files, columns=cols)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "sha_bucket", pc.utf8_slice_codeunits(batch["content_sha1"], 0, 2)
        )

    ds = ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
    losers = hash_map_groups(ds, "sha_bucket", _losers_of_bucket)
    losers.write_parquet(paths.dup_map)


def _load_loser_table(paths: IndexPaths) -> pa.Table:
    """Losers table is ~dup_rate x N rows; at sandbox scale a broadcast
    table. (At 10^12 docs this becomes a hash-bucket anti-join with
    ``stages.ops.shuffle_join``; the broadcast-vs-shuffle switch is the
    documented small-side pattern.)"""
    files = [
        os.path.join(paths.dup_map, f) for f in os.listdir(paths.dup_map) if f.endswith(".parquet")
    ]
    if not files:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "canonical_url": pa.array([], pa.string()),
                "doc_len": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables([pq.read_table(f) for f in files]).combine_chunks()


def write_docstore(paths: IndexPaths, loser_ref) -> dict:
    """B2: doc store sorted by doc_id (binary-searchable row groups —
    the scale path for by-id result assembly; replaces the reference's
    full ``urls``-table scan per query, ``Searcher.java:44-57``)."""

    def annotate(batch: pa.Table) -> pa.Table:
        lt: pa.Table = ray.get(loser_ref)
        idx = pc.index_in(batch["doc_id"], value_set=lt["doc_id"].combine_chunks())
        is_can = pc.is_null(idx)
        can_url = pc.if_else(
            is_can,
            batch["url"].combine_chunks(),
            pc.take(lt["canonical_url"].combine_chunks(), idx),
        )
        return batch.append_column("is_canonical", is_can).append_column("canonical_url", can_url)

    cols = ["doc_id", "url", "warc_ts", "lang", "content_sha1", "title", "body", "doc_len"]
    ds = rd.read_parquet(_docs_parquet_files(paths), columns=cols)
    ds = ds.map_batches(annotate, batch_format="pyarrow")
    # sort() samples its input for range boundaries (re-executing the
    # annotate+read otherwise) — materialize the narrow annotated set
    ds = ds.materialize().sort("doc_id")
    _fresh_dir(paths.docstore)
    # row_group_size: the doc store is a POINT-LOOKUP structure at serve
    # time (DocStore.lookup decompresses whole row groups per top-k
    # hit); 2048-row groups bound a lookup to ~row_group_size bodies
    # instead of a whole 100k-row file (measured: 330 ms -> ~5 ms per
    # /search doc fetch at sf0.1), while staying large enough that
    # build-time sequential scans keep their throughput
    ds.write_parquet(
        paths.docstore,
        min_rows_per_file=100_000,
        compression="zstd",
        row_group_size=2048,
    )


def global_stats(paths: IndexPaths, loser_table: pa.Table) -> dict:
    """Exact canonical-corpus stats (N, total token count, avgdl) as
    arithmetic over the phase-A manifests (total docs/tokens) minus the
    loser table (dup docs/tokens) — no pipeline pass. Exactness is what
    pins BM25 parity across parallelism levels."""
    from ..state.manifest import read_manifest

    docs = tokens = 0
    for name in sorted(os.listdir(paths.docs_ckpt)):
        m = read_manifest(os.path.join(paths.docs_ckpt, name))
        if m is not None:
            docs += m.num_docs
            tokens += m.num_tokens
    n = docs - loser_table.num_rows
    total_len = tokens - (
        int(pc.sum(loser_table["doc_len"]).as_py() or 0) if loser_table.num_rows else 0
    )
    return {"N": n, "total_len": total_len, "avgdl": (total_len / n) if n else 0.0}


def _docs_ds(paths: IndexPaths, loser_ids_ref, with_positions: bool = False) -> rd.Dataset:
    """Canonical docs (losers filtered) from the checkpoint —
    column-pruned read, loser filter via a broadcast id array."""

    def drop_losers(batch: pa.Table) -> pa.Table:
        ids: pa.Array = ray.get(loser_ids_ref) if loser_ids_ref is not None else None
        if ids is None or len(ids) == 0:
            return batch
        return batch.filter(pc.invert(pc.is_in(batch["doc_id"], value_set=ids)))

    cols = ["doc_id", "doc_len", "terms", "tfs"] + (
        ["positions"] if with_positions else []
    )
    ds = rd.read_parquet(_docs_parquet_files(paths), columns=cols)
    return ds.map_batches(drop_losers, batch_format="pyarrow", batch_size=None)


def detect_term_salts(
    paths: IndexPaths,
    *,
    num_salts_max: int,
    num_buckets: int,
    hot_df_threshold: int,
) -> pa.Table:
    """B3a: the SIZE-AWARE salt plan — (term, n_salts) for every term
    whose postings need spreading over more than one shuffle bucket.

    Combines the per-partition ``_hot_partial`` tables written as part
    of the phase-A checkpoint (a few vocabulary-sized files, never the
    postings) into estimated per-term df (sampled df x HOT_SAMPLE_MOD),
    then sizes each term's salt count against a per-(term,salt) posting
    BUDGET of half the average bucket's postings: a term estimated at
    k x budget postings splits into ~k doc_id-range salts (capped at
    ``num_salts_max``). The legacy stopword tier (df >= hot_df_threshold)
    always gets the full ``num_salts_max``. Round 2's binary hot/cold
    split left the largest COLD terms (df just under the threshold)
    whole — a handful of them hashing into one bucket made that bucket
    the straggler that capped shard-build scaling at ~0.55-0.8; the
    budget rule bounds every bucket's largest member instead.

    The plan only steers load balance: exact df/cf come from the encode
    itself, and final merged blobs are salting-invariant (canonical
    decode-sort-re-encode on merge), so sampling noise is harmless —
    and the deterministic doc_id sample makes the plan
    parallelism-invariant anyway (N-vs-4N parity).

    Combine is driver-side (#partitions x sampled-vocab rows). At an
    extreme vocabulary (10^8+ terms) swap the concat for a Ray
    ``groupby(term).aggregate(Sum)`` over the same partial files."""
    partials = []
    for root, _dirs, names in os.walk(paths.docs_ckpt):
        for n in names:
            if n == "_hot_partial.parquet":
                partials.append(pq.read_table(os.path.join(root, n)))
    empty = pa.table({"term": pa.array([], pa.string()), "n_salts": pa.array([], pa.int64())})
    if not partials:
        return empty
    t = pa.concat_tables(partials)
    agg = t.group_by("term").aggregate([("partial_df", "sum")])
    est_df = agg["partial_df_sum"].to_numpy(zero_copy_only=False) * HOT_SAMPLE_MOD
    total_est = int(est_df.sum())
    # budget = 1/8 of the average bucket's postings: the largest
    # single-salt run is then <= 12.5% of a bucket, so a bucket's size
    # (and the partition straggler) is set by the law of large numbers,
    # not by one or two mid-df terms. At /2 the budget sat ABOVE the
    # 20%-of-N stopword threshold for Zipfian webtext, making the plan
    # degenerate to the old binary hot/cold split.
    budget = max(4 * HOT_SAMPLE_MOD, total_est // (8 * num_buckets))
    n_salts = np.minimum(-(-est_df // budget), num_salts_max)
    n_salts = np.where(est_df >= hot_df_threshold, num_salts_max, n_salts)
    keep = n_salts > 1
    if not keep.any():
        return empty
    out = pa.table(
        {"term": agg["term"].filter(pa.array(keep)), "n_salts": pa.array(n_salts[keep])}
    )
    return out.sort_by("term")


def audit_doc_ids(paths: IndexPaths) -> dict:
    """Collision audit for ``doc_id = hash64(url)`` (63-bit): distinct
    doc_id count must equal distinct url count over the docs checkpoint.
    At 10^12 docs the birthday bound makes collisions plausible, so a
    production build runs this before serving; a collision would silently
    merge two documents' postings. Distributed: per-block distinct
    (combiner) then one narrow global distinct per column."""
    ds = rd.read_parquet(_docs_parquet_files(paths), columns=["doc_id", "url"])

    def local(batch: pa.Table) -> pa.Table:
        return batch.group_by(["doc_id", "url"]).aggregate([])

    pairs = ds.map_batches(local, batch_format="pyarrow", batch_size=None)
    n_pairs = int(pairs.count())
    n_ids = int(pairs.groupby("doc_id").count().count())
    return {
        "distinct_pairs": n_pairs,
        "distinct_doc_ids": n_ids,
        "collisions": n_pairs - n_ids,
    }


def _bin_from_offsets(buf, offsets64: "np.ndarray") -> pa.Array:
    """ZERO-COPY ``pa.binary()`` column over one concatenated blob
    buffer: the values buffer is VIEWED (pyarrow holds a reference),
    only the int64->int32 offset downcast allocates (#terms x 4 bytes).
    Replaces a per-term Python memoryview list + a full copy of every
    blob byte into fresh Arrow buffers — the bucket-merge's dominant
    allocation. Falls back to the slicing path if one bucket's blobs
    ever exceed int32 offsets (>2 GiB — far past the bucket budget)."""
    n = offsets64.size - 1
    if n == 0:
        return pa.array([], pa.binary())
    if int(offsets64[-1]) <= np.iinfo(np.int32).max:
        off32 = offsets64.astype(np.int32)
        return pa.Array.from_buffers(
            pa.binary(), n, [None, pa.py_buffer(off32), pa.py_buffer(buf)]
        )
    mv = memoryview(buf)
    return pa.array(
        [mv[offsets64[i] : offsets64[i + 1]] for i in range(n)], pa.binary()
    )


def _encoded_table(terms: pa.Array, enc: dict) -> pa.Table:
    """Assemble POSTING_SCHEMA columns from an ``encode_postings_multi``
    result (blob columns are zero-copy views of the codec buffers);
    a positional encode (format 3) contributes the ``pos_blob`` column."""
    tbl = pa.table(
        {
            "term": terms,
            "df": pa.array(enc["df"], pa.int64()),
            "cf": pa.array(enc["cf"], pa.int64()),
            "doc_blob": _bin_from_offsets(enc["doc_blob_buf"], enc["doc_blob_offsets"]),
            "tf_blob": _bin_from_offsets(enc["tf_blob_buf"], enc["tf_blob_offsets"]),
            "dl_blob": _bin_from_offsets(enc["dl_blob_buf"], enc["dl_blob_offsets"]),
            "block_last_id": pa.ListArray.from_arrays(
                pa.array(enc["block_last_offsets"], pa.int32()),
                pa.array(enc["block_last_id"], pa.int64()),
            ),
            "block_max_tf": pa.ListArray.from_arrays(
                pa.array(enc["block_last_offsets"], pa.int32()),
                pa.array(enc["block_max_tf"], pa.int64()),
            ),
            "block_min_dl": pa.ListArray.from_arrays(
                pa.array(enc["block_last_offsets"], pa.int32()),
                pa.array(enc["block_min_dl"], pa.int64()),
            ),
            "block_doc_off": pa.ListArray.from_arrays(
                pa.array(enc["block_last_offsets"], pa.int32()),
                pa.array(enc["block_doc_off"], pa.int64()),
            ),
            "block_tf_off": pa.ListArray.from_arrays(
                pa.array(enc["block_last_offsets"], pa.int32()),
                pa.array(enc["block_tf_off"], pa.int64()),
            ),
            "block_dl_off": pa.ListArray.from_arrays(
                pa.array(enc["block_last_offsets"], pa.int32()),
                pa.array(enc["block_dl_off"], pa.int64()),
            ),
        }
    )
    if "pos_blob_buf" in enc:  # appended LAST: _posting_cols order
        tbl = tbl.append_column(
            "pos_blob", _bin_from_offsets(enc["pos_blob_buf"], enc["pos_blob_offsets"])
        )
    return tbl


def _encode_bucket(group: pa.Table) -> pa.Table:
    """One BUCKET group of partition-local RUNS -> one canonical encoded
    posting row per (term, salt-range) in the bucket.

    The group's runs are decoded with one vectorized
    ``decode_runs_concat`` pass, re-keyed per posting, and re-encoded
    with one ``encode_postings_multi`` pass — no per-term Python work.
    This is what makes the term shuffle scale: ``groupby`` runs over
    O(num_buckets) groups, not O(vocabulary) groups, and the shuffle
    payload entering this stage is already compressed runs."""
    g = group.combine_chunks()
    ns = g["df"].to_numpy(zero_copy_only=False)
    ids, tfs, dls = decode_runs_concat(
        binary_values_view(g["doc_blob"]),
        binary_values_view(g["tf_blob"]),
        binary_values_view(g["dl_blob"]),
        ns,
    )
    pos_flat = (
        decode_position_stream(binary_values_view(g["pos_blob"]), tfs)
        if "pos_blob" in g.column_names
        else None
    )
    d = g["term"].combine_chunks().dictionary_encode()
    run_codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    codes = np.repeat(run_codes, ns)
    enc = encode_postings_multi(codes, ids, tfs, dls, pos_flat=pos_flat)
    return _encoded_table(pc.take(d.dictionary, pa.array(enc["codes_out"])), enc)


def _merge_term_runs(group: pa.Table) -> pa.Table:
    """Final per-term merge of salted runs (1-row groups pass through).
    Positional runs (format 3, ``pos_blob`` present) carry each
    posting's position segment through the merge sort."""
    with_pos = "pos_blob" in group.column_names
    if group.num_rows == 1:
        return group.select(_posting_cols(with_pos))
    runs = [
        (
            group["doc_blob"][i].as_py(),
            group["tf_blob"][i].as_py(),
            group["dl_blob"][i].as_py(),
            group["df"][i].as_py(),
        )
        for i in range(group.num_rows)
    ]
    pos_blobs = (
        [group["pos_blob"][i].as_py() for i in range(group.num_rows)] if with_pos else None
    )
    enc = merge_encoded_runs(runs, pos_blobs=pos_blobs)
    out = pa.table(
        {
            "term": group.slice(0, 1)["term"],
            "df": pa.array([enc["n"]], pa.int64()),
            "cf": pa.array([int(pc.sum(group["cf"]).as_py())], pa.int64()),
            "doc_blob": pa.array([enc["doc_blob"]], pa.binary()),
            "tf_blob": pa.array([enc["tf_blob"]], pa.binary()),
            "dl_blob": pa.array([enc["dl_blob"]], pa.binary()),
            "block_last_id": pa.array([enc["block_last_id"].tolist()], pa.list_(pa.int64())),
            "block_max_tf": pa.array([enc["block_max_tf"].tolist()], pa.list_(pa.int64())),
            "block_min_dl": pa.array([enc["block_min_dl"].tolist()], pa.list_(pa.int64())),
            "block_doc_off": pa.array([enc["block_doc_off"].tolist()], pa.list_(pa.int64())),
            "block_tf_off": pa.array([enc["block_tf_off"].tolist()], pa.list_(pa.int64())),
            "block_dl_off": pa.array([enc["block_dl_off"].tolist()], pa.list_(pa.int64())),
        }
    )
    if with_pos:
        out = out.append_column("pos_blob", pa.array([enc["pos_blob"]], pa.binary()))
    return out


def _finalize_shard(group: pa.Table) -> pa.Table:
    """One finalize group of encoded runs -> final shard rows.

    The group key is a TERM-hash bucket (finer than the shard count so
    the merge parallelizes past num_shards and no single group holds
    several of the hottest terms; the ``shard`` COLUMN routes rows to
    their output directory at write time). Cold terms have exactly one
    run and pass through untouched (vectorized). A hot term's
    ``num_salts`` runs are contiguous after the sort; each is merged
    canonically (decode -> sort -> re-encode), so final blobs are
    bit-identical regardless of salting/parallelism — the N-vs-4N
    parity invariant. Per-group Python work is O(#hot)."""
    idx = pc.sort_indices(group, sort_keys=[("term", "ascending")])
    g = group.take(idx).combine_chunks()
    out_names = _posting_cols("pos_blob" in g.column_names) + ["shard"]
    terms = np.asarray(g["term"].to_pylist(), dtype=object)
    first = np.ones(terms.size, dtype=bool)
    first[1:] = terms[1:] != terms[:-1]
    run_counts = np.diff(np.append(np.flatnonzero(first), terms.size))
    single = np.repeat(run_counts, run_counts) == 1
    out = [g.filter(pa.array(single)).select(out_names)]
    starts = np.flatnonzero(first)[run_counts > 1]
    counts = run_counts[run_counts > 1]
    for s, c in zip(starts, counts):
        merged = _merge_term_runs(g.slice(s, c))
        out.append(merged.append_column("shard", g.slice(s, 1)["shard"]))
    return pa.concat_tables(out, promote_options="default")


def _resolve_num_buckets(
    num_shards: int, num_buckets: int | None = None
) -> tuple[int, int]:
    """(num_buckets, sub_b) with buckets shard-aligned. 16 buckets per
    CPU: the largest single-salt term-run must stay a small fraction of
    one bucket's postings, and the straggler bucket bounds the stage's
    critical path — measured at 4 buckets/CPU the max bucket task ran
    ~7x the mean and capped shard-build scaling at ~2x for 4x CPUs;
    round-5 re-measured 8 vs 16/CPU at 16 cpus on the 1M corpus:
    bucket_merge 13.7 -> 11.7 s (finer waves absorb the stragglers),
    identical outputs (bucket count never affects the canonical rows)."""
    if num_buckets is None:
        num_buckets = max(128, int(ray.cluster_resources().get("CPU", 8)) * 16)
    sub_b = max(1, num_buckets // num_shards)
    return num_shards * sub_b, sub_b


def build_shards(
    paths: IndexPaths,
    loser_ids_ref,
    salt_plan: pa.Table,
    *,
    num_shards: int = 16,
    num_salts: int = 8,
    num_buckets: int | None = None,
    store_positions: bool = False,
) -> None:
    """B4: THE term shuffle -> compressed, shard-partitioned postings.

    Physical plan (explicit partitioning — the north-rule shuffle):
    1. map-side combine: each docs block explodes to (term, doc_id, tf)
       IN MEMORY and immediately pre-encodes one compressed run per
       (term, salt-range) (``encode_block_runs``), keyed by ``bucket =
       H(term, salt) % num_buckets`` where ``salt`` is a doc_id-RANGE
       sub-key with a PER-TERM salt count from ``salt_plan`` (sized so
       no (term, salt) run group exceeds ~half a bucket's average
       postings — see ``detect_term_salts``) and 0 for unplanned terms.
       Salted terms therefore spread over up to ``num_salts`` buckets —
       the skew defusal; cold terms land in exactly one bucket.
    2. ONE wide ``groupby(bucket)`` shuffle of the PACKED RUNS (~1-2% of
       the raw postings' bytes — the external-merge-of-partition-local-
       segments design); each bucket group decodes+merges+re-encodes ALL
       its terms in two vectorized passes (``_encode_bucket``).
    3. A cold term's runs ALL meet in its one bucket, so after step 2 a
       cold term is one finished row — only HOT terms (num_salts rows
       each) need the finalize shuffle. The hot slice alone goes through
       a second ``groupby`` on a fine term-hash key and merges its
       salted runs canonically (``_finalize_shard``); cold rows pass
       straight to the writer. Buckets and finalize groups are
       SHARD-ALIGNED (key = shard * sub + local), so output blocks map
       to O(1) shard directories each and the partitioned write yields
       ~num_buckets files, not blocks x shards.

    Scale knobs: ``num_buckets`` bounds the raw postings held by one
    encode task (bucket ~ total_postings/num_buckets rows);
    ``num_shards`` bounds the encoded runs held by one finalize task.
    Raise both with cluster size / corpus so a group fits in a worker's
    heap.
    """
    # the salted-term broadcast: sorted term array + per-term doc_id
    # divisor (ceil(2^63 / n_salts); unplanned terms use 2^63 -> salt 0,
    # one uniform formula for every posting)
    hot_arr = salt_plan["term"].combine_chunks()
    k_arr = salt_plan["n_salts"].to_numpy(zero_copy_only=False).astype(np.uint64)
    divisors = ((np.uint64(1) << np.uint64(63)) + k_arr - np.uint64(1)) // np.maximum(
        k_arr, np.uint64(1)
    )
    hot_ref = ray.put(hot_arr)
    div_ref = ray.put(divisors)
    num_buckets, sub_b = _resolve_num_buckets(num_shards, num_buckets)
    mix = np.uint64(0x9E3779B97F4A7C15)

    def encode_block_runs(batch: pa.Table) -> pa.Table:
        """Partition-local pre-encode (the map-side combine): one docs
        block -> one compressed run per (term, salt-range). The wide
        shuffle then moves varint-packed runs — ~1-2% of the raw
        exploded (term, doc_id, tf) rows' bytes, with no per-posting
        term strings."""
        if store_positions:
            exploded, pos_flat = explode_postings_with_positions(batch)
        else:
            exploded, pos_flat = explode_postings(batch), None
        tcol = exploded["term"].combine_chunks()
        d = tcol.dictionary_encode()
        uniq = d.dictionary
        # per-UNIQUE-term work only (vocab-bounded, not postings-bounded)
        uh = np.fromiter((hash64(t) for t in uniq.to_pylist()), dtype=np.uint64, count=len(uniq))
        pos = (
            pc.index_in(uniq, value_set=ray.get(hot_ref))
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        div_u = np.full(len(uniq), np.uint64(1) << np.uint64(63), np.uint64)
        found = pos >= 0
        div_u[found] = ray.get(div_ref)[pos[found]]
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = exploded["doc_id"].to_numpy(zero_copy_only=False)
        salts = (ids.astype(np.uint64) // div_u[codes]).astype(np.int64)
        gkey = codes * num_salts + salts
        enc = encode_postings_multi(
            gkey,
            ids,
            exploded["tf"].to_numpy(zero_copy_only=False),
            exploded["dl"].to_numpy(zero_copy_only=False),
            pos_flat=pos_flat,
        )
        t_codes = enc["codes_out"] // num_salts
        s_out = (enc["codes_out"] % num_salts).astype(np.uint64)
        shard_of = uh[t_codes] % np.uint64(num_shards)
        local = (uh[t_codes] // np.uint64(num_shards) + (s_out + np.uint64(1)) * mix) % np.uint64(sub_b)
        bucket = (shard_of * np.uint64(sub_b) + local).astype(np.int64)
        tbl = _encoded_table(pc.take(uniq, pa.array(t_codes)), enc)
        return tbl.append_column("bucket", pa.array(bucket))

    def add_shard(batch: pa.Table) -> pa.Table:
        hs = [hash64(t) for t in batch["term"].to_pylist()]
        shard = pa.array([h % num_shards for h in hs], pa.int64())
        # shard-aligned finalize-group key: all of a term's salted runs
        # share it; ~sub_b groups per shard keep the hot merge parallel
        # past num_shards while every group maps to ONE shard directory
        fg = pa.array(
            [(h % num_shards) * sub_b + (h // num_shards) % sub_b for h in hs],
            pa.int64(),
        )
        return batch.append_column("shard", shard).append_column("__fg", fg)

    # Pre-encode over LARGE doc batches: runs per batch ~ vocabulary, so
    # doubling the batch halves the total run count (and the shuffle).
    # 4096 docs x ~130 uniq terms ~ 0.5M postings per encode task — a
    # sub-second vectorized kernel that still gives full pool
    # parallelism at sandbox scale.
    sub: dict[str, float] = {}
    t0 = time.time()
    ds = _docs_ds(paths, loser_ids_ref, with_positions=store_positions)
    ds = ds.map_batches(encode_block_runs, batch_format="pyarrow", batch_size=4096)
    # Materialize at both shuffle inputs: Ray's sort-based groupby
    # samples its input to pick range boundaries, re-executing the
    # upstream plan; without a boundary here the second shuffle would
    # re-run the first (and the whole extract read) several times. The
    # materialized sets are packed runs — a small multiple of the final
    # index size — so the object-store cost is negligible next to the
    # re-execution it prevents.
    pre = ds.materialize()
    sub["pre_encode"] = round(time.time() - t0, 3)
    t0 = time.time()
    # packed + task-based: the input is already-materialized compressed
    # runs, so the exchange runs as plain Ray tasks over range-owned
    # buckets (no aggregator-actor spin-up, no per-row routing — see
    # stages/shuffle.py:packed_task_groups; falls back to the streamed
    # packed_map_groups hash shuffle past a fan-out threshold).
    runs = packed_task_groups(pre, "bucket", _encode_bucket, num_buckets=num_buckets)
    runs = runs.map_batches(add_shard, batch_format="pyarrow").materialize()
    sub["bucket_merge"] = round(time.time() - t0, 3)
    t0 = time.time()
    # a cold term's runs all met in its single bucket, so its one row is
    # FINAL already — only the hot slice (num_salts rows per hot term)
    # re-shuffles for the salted-run merge
    out_cols = _posting_cols(store_positions) + ["shard"]

    def cold_rows(batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.is_in(batch["term"], value_set=ray.get(hot_ref)))
        return batch.filter(keep).select(out_cols)

    def hot_rows(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["term"], value_set=ray.get(hot_ref)))

    cold = runs.map_batches(cold_rows, batch_format="pyarrow")
    if salt_plan.num_rows:
        # the hot slice is tiny and already materialized upstream —
        # same task-based exchange as the bucket merge (no actor pool)
        merged_hot = packed_task_groups(
            runs.map_batches(hot_rows, batch_format="pyarrow").materialize(),
            "__fg",
            _finalize_shard,
            num_buckets=num_shards * sub_b,
        ).map_batches(lambda t: t.select(out_cols), batch_format="pyarrow")
        final = cold.union(merged_hot).materialize()
    else:
        final = cold.materialize()
    sub["finalize"] = round(time.time() - t0, 3)
    t0 = time.time()
    _fresh_dir(paths.shards)
    # NO min_rows_per_file here: shard rows average ~10-100 KB (packed
    # posting blobs), so a row-count floor funnels the whole multi-GB
    # write into ONE task (measured: a serial 22-59s write). Default =
    # one file per (block, shard value); blocks are shard-aligned, so
    # file count stays ~#blocks and the write parallelizes.
    final.write_parquet(paths.shards, partition_cols=["shard"])
    # exact per-term (df, cf) straight off the finalized rows — no
    # extra read of the shards
    stats = final.select_columns(["term", "df", "cf"])
    _fresh_dir(paths.term_stats)
    stats.write_parquet(paths.term_stats)
    sub["write"] = round(time.time() - t0, 3)
    return sub


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
    content_seen_ref=None,
    store_positions: bool = False,
) -> IndexPaths:
    """Full build. Resumable: phase A skips partitions with manifests;
    phase B is idempotent (full overwrite of derived dirs).
    ``content_seen_ref`` (object ref to a (doc_id list, content-sha1
    list) pair) drops already-indexed pages at extraction — the
    incremental-update contentSeen gate (``pipelines.update_index``).
    ``store_positions=True`` builds a POSITIONAL index (format 3): the
    checkpoint carries per-doc token positions and every shard row gains
    a ``pos_blob`` stream — exact phrase evaluation then needs no doc
    fetch (``SearchIndex.phrase_topk(method='positions')``). Costs
    roughly the token stream again in checkpoint/shard bytes; default
    off, matching the reference's position-less ``index`` table."""
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
        content_seen_ref=content_seen_ref,
        store_positions=store_positions,
    )
    t_a = time.time()
    total_docs = 0
    for name in sorted(os.listdir(paths.docs_ckpt)):
        m = read_manifest(os.path.join(paths.docs_ckpt, name))
        if m is not None:
            total_docs += m.num_docs
    if total_docs == 0:
        # legitimate at the edges (empty corpus; incremental update whose
        # whole batch was already indexed): emit a complete empty index
        a_metrics.pop("dedup_narrow", None)
        for d in (paths.dup_map, paths.docstore, paths.term_stats, paths.shards):
            _fresh_dir(d)
        write_json_atomic(
            paths.meta,
            {
                "index_format": 3 if store_positions else 2,
                "positions": store_positions,
                "N": 0,
                "avgdl": 0.0,
                "total_len": 0,
                "k1": K1,
                "b": B,
                "num_shards": num_shards,
                "num_salts": num_salts,
                "hot_df_threshold": hot_df_threshold or 1000,
                "num_salted_terms": 0,
                "num_duplicate_docs": 0,
                "phase_a": a_metrics,
                "timings_sec": {"total": round(time.time() - t0, 3)},
            },
        )
        return paths
    compute_dup_losers(
        paths,
        total_docs=total_docs,
        narrow_tables=a_metrics.pop("dedup_narrow", None),
    )
    loser_table = _load_loser_table(paths)
    loser_ref = ray.put(loser_table)
    loser_ids_ref = ray.put(loser_table["doc_id"].combine_chunks())
    g = global_stats(paths, loser_table)
    if hot_df_threshold is None:
        # The stopword tier (full num_salts fan-out): df >= 20% of the
        # corpus. Below it, detect_term_salts sizes each term's salt
        # count against the per-(term,salt) posting budget — the
        # criterion is group size, not relative frequency.
        hot_df_threshold = max(1000, int(0.2 * max(g["N"], 1)))
    salt_plan = detect_term_salts(
        paths,
        num_salts_max=num_salts,
        num_buckets=_resolve_num_buckets(num_shards)[0],
        hot_df_threshold=hot_df_threshold,
    )
    t_b1 = time.time()

    # B2 (doc store) and B4 (term shuffle) have disjoint inputs/outputs
    # once the loser map + hot set exist — run them CONCURRENTLY on the
    # shared CPU pool (two Ray Data pipelines; the streaming executor
    # interleaves their tasks). This roughly halves the non-extraction
    # critical path.
    from concurrent.futures import ThreadPoolExecutor

    timings: dict[str, float] = {}

    def _timed(name, fn, *args, **kw):
        s = time.time()
        ret = fn(*args, **kw)
        timings[name] = round(time.time() - s, 3)
        if isinstance(ret, dict):  # sub-phase timings (build_shards)
            timings[f"{name}_sub"] = ret

    with ThreadPoolExecutor(max_workers=2) as ex:
        f2 = ex.submit(_timed, "docstore", write_docstore, paths, loser_ref)
        f4 = ex.submit(
            _timed, "shard_build", build_shards, paths, loser_ids_ref, salt_plan,
            num_shards=num_shards, num_salts=num_salts,
            store_positions=store_positions,
        )
        f2.result()
        f4.result()
    t_b4 = time.time()
    write_json_atomic(
        paths.meta,
        {
            # 2 = postings carry dl_blob/block_min_dl; 3 = + pos_blob
            "index_format": 3 if store_positions else 2,
            "positions": store_positions,
            "N": g["N"],
            "avgdl": g["avgdl"],
            "total_len": g["total_len"],
            "k1": K1,
            "b": B,
            "num_shards": num_shards,
            "num_salts": num_salts,
            "hot_df_threshold": hot_df_threshold,
            "num_salted_terms": salt_plan.num_rows,
            "num_duplicate_docs": loser_table.num_rows,
            "phase_a": a_metrics,
            "timings_sec": {
                "phase_a_extract": round(t_a - t0, 3),
                "dedup_hot": round(t_b1 - t_a, 3),
                "docstore_concurrent": timings.get("docstore", 0.0),
                "shard_build_concurrent": timings.get("shard_build", 0.0),
                "shard_build_sub": timings.get("shard_build_sub", {}),
                "b2_b4_wall": round(t_b4 - t_b1, 3),
                "total": round(t_b4 - t0, 3),
            },
        },
    )
    return paths
