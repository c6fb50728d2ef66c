"""Group-integrity-safe ``map_groups``.

Ray Data's default (sort-based) ``groupby(key).map_groups(fn)`` sorts by
range boundaries sampled from the data and then applies ``fn`` per group
WITHIN each block. A group whose rows straddle a block boundary is
silently SPLIT — ``fn`` runs once per fragment. Observed concretely in
this repo: a hot term's salted runs intermittently landed in two sorted
blocks, skipped their merge, and produced duplicate term rows in the
final index (one build in ~3 differed by one row).

``hash_map_groups`` routes the groupby through Ray's HASH shuffle
instead: a key hash-maps to exactly one partition, so a group can never
split. Two operational constraints of the hash path (Ray 2.49):

- ``num_partitions`` must be bounded by available CPUs — each partition
  is backed by an aggregator actor, and oversubscribing actors
  deadlocks the pipeline (observed: 64 partitions on 4 CPUs hangs).
- ``shuffle_strategy`` is consulted at EXECUTION time from the
  dataset's context, so it is set on the input dataset's context (which
  the result inherits) rather than globally; the same context also gets
  ``default_hash_shuffle_parallelism`` pinned so any DOWNSTREAM
  groupby/aggregate on the result stays within the CPU budget instead
  of falling back to the (much larger) library default.
"""

from __future__ import annotations

from typing import Callable, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def hash_partitions(num_partitions: int | None = None) -> int:
    if num_partitions:
        return num_partitions
    return max(2, int(ray.cluster_resources().get("CPU", 8)))


def balanced_bucket_keys(num_buckets: int, num_partitions: int | None = None) -> np.ndarray:
    """int64 key VALUES that Ray's hash shuffle assigns EXACTLY evenly
    across ``num_partitions`` aggregators.

    Ray 2.49's hash shuffle partitions each row by
    ``hash((scalar,)) % num_partitions`` (ray.data._internal.arrow_ops.
    transform_pyarrow.hash_partition). Random int keys therefore land
    multinomially: with B buckets over P partitions the heaviest
    partition holds ~B/P + O(sqrt(B/P)) buckets — measured as the
    bucket_merge straggler that capped shard-build scaling. pyarrow
    scalar hashes are value-determined and process-stable, so the
    driver can PRE-IMAGE the assignment: probe k = 0, 1, 2, ... and keep
    exactly B/P keys per partition. Callers remap their logical bucket
    ids (0..B-1) through the returned array.

    Robustness: if a future Ray changes the partition hash, the keys
    simply land arbitrarily again — load balance degrades, correctness
    is untouched (any bijective remap of group keys is semantics-free).
    """
    p = hash_partitions(num_partitions)
    per = (num_buckets + p - 1) // p
    filled = [0] * p
    out = np.empty(num_buckets, dtype=np.int64)
    got = 0
    k = 0
    while got < num_buckets:
        part = hash((pa.scalar(k, pa.int64()),)) % p
        if filled[part] < per:
            filled[part] += 1
            out[got] = k
            got += 1
        k += 1
    return out


def _ipc_bytes(tbl: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return sink.getvalue().to_pybytes()


def _ipc_table(buf) -> pa.Table:
    return pa.ipc.open_stream(buf).read_all()


def packed_map_groups(
    ds: rd.Dataset,
    key: str,
    fn: Callable,
    *,
    num_partitions: int | None = None,
    balance_keys: bool = True,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """``hash_map_groups`` for BOUNDED-cardinality int64 bucket keys,
    with the shuffle payload packed one row per (input block, bucket).

    Why: Ray 2.49's hash shuffle computes a PYTHON ``hash(tuple)`` per
    input ROW to route it (see ``balanced_bucket_keys``); a shuffle of
    millions of small rows pays ~10us/row of driver-grade Python before
    any data moves. Packing each block's rows for one bucket into a
    single Arrow-IPC payload row cuts the routed row count to
    #blocks x #buckets (orders of magnitude), after which the per-row
    loop is free and the shuffle moves a few large binary cells instead
    of many small rows. ``fn`` receives the unpacked, concatenated group
    (key column re-attached) — identical semantics to
    ``hash_map_groups(ds, key, fn)``.

    Requirements: ``key`` is int64 in ``[0, num_buckets)`` (a bucket
    id, not a data key; default bound 65536, asserted at pack time).
    When ``balance_keys`` is set the caller's bucket ids are remapped
    through ``balanced_bucket_keys`` so every aggregator receives the
    same bucket COUNT — note ``fn`` then sees the REMAPPED key value in
    the re-attached key column (bucket ids are arbitrary labels; no
    caller derives meaning from them).
    """
    n = hash_partitions(num_partitions)
    nb = num_buckets or (1 << 16)
    keymap_ref = None
    if balance_keys:
        keymap_ref = ray.put(balanced_bucket_keys(nb, n))

    def pack(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {key: pa.array([], pa.int64()), "__payload": pa.array([], pa.large_binary())}
            )
        idx = pc.sort_indices(batch[key])
        g = batch.take(idx).combine_chunks()
        kv = g[key].to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(np.diff(kv)) + 1))
        lens = np.diff(np.concatenate((starts, [kv.size])))
        body = g.drop_columns([key])
        payloads = [
            _ipc_bytes(body.slice(int(s), int(l))) for s, l in zip(starts, lens)
        ]
        keys_out = kv[starts]
        if keymap_ref is not None:
            if keys_out[-1] >= nb or keys_out[0] < 0:
                raise ValueError(f"bucket id outside [0, {nb}): {keys_out[[0, -1]]}")
            keys_out = ray.get(keymap_ref)[keys_out]
        return pa.table(
            {key: pa.array(keys_out), "__payload": pa.array(payloads, pa.large_binary())}
        )

    def unpack_apply(group: pa.Table) -> pa.Table:
        tables = [_ipc_table(b) for b in group["__payload"].to_pylist()]
        body = pa.concat_tables(tables, promote_options="default")
        kval = group[key][0].as_py()
        body = body.append_column(key, pa.array(np.full(body.num_rows, kval, np.int64)))
        return fn(body)

    return hash_map_groups(
        ds.map_batches(pack, batch_format="pyarrow"), key, unpack_apply, num_partitions=n
    )


def packed_task_groups(
    ds: rd.Dataset,
    key: str,
    fn: Callable,
    *,
    num_buckets: int,
    num_partitions: int | None = None,
    max_fanout: int = 200_000,
) -> rd.Dataset:
    """``packed_map_groups`` semantics executed as PLAIN RAY TASKS over
    the input's materialized blocks — no aggregator-actor pool to spin
    up and no per-row routing at all (the Dataset hash shuffle costs a
    measured ~2-3 s of fixed setup per execution, which dominates any
    small-to-medium packed-runs exchange).

    Partition p OWNS the contiguous bucket range [p*B/P, (p+1)*B/P): one
    map task per block packs rows per bucket (one Arrow-IPC payload row)
    and range-slices the packed rows into P pieces (``num_returns=P``,
    so each piece is its own object); one reduce task per non-empty
    partition concats its pieces and applies ``fn`` per bucket in
    sorted-bucket order. Group integrity is structural: a bucket id maps
    to exactly one owner partition.

    Trade-off vs the streamed hash shuffle: the #blocks x P piece
    objects are materialized eagerly, without backpressure — right for
    inputs that are ALREADY materialized and compact (packed runs, a
    small multiple of the final index size), wrong for huge streaming
    inputs. When #blocks x P exceeds ``max_fanout`` (cluster-scale
    fan-out where tiny-object count would swamp the object store) this
    falls back to ``packed_map_groups`` automatically.
    """
    P = hash_partitions(num_partitions)
    blocks = ds.to_arrow_refs()
    if len(blocks) * P > max_fanout:
        return packed_map_groups(
            ds, key, fn, num_partitions=num_partitions, num_buckets=num_buckets
        )
    bounds = np.array([(p * num_buckets) // P for p in range(P + 1)], np.int64)

    @ray.remote(num_returns=P + 1)
    def split_block(block: pa.Table):
        from ..functions.runtime import cap_worker_threads

        cap_worker_threads()
        empty = pa.table(
            {key: pa.array([], pa.int64()), "__payload": pa.array([], pa.large_binary())}
        )
        if block.num_rows == 0:
            return (*([empty] * P), np.zeros(P, np.int64))
        g = block.take(pc.sort_indices(block[key])).combine_chunks()
        kv = g[key].to_numpy(zero_copy_only=False)
        if kv[0] < 0 or kv[-1] >= num_buckets:
            raise ValueError(f"bucket id outside [0, {num_buckets}): {kv[[0, -1]]}")
        starts = np.concatenate(([0], np.flatnonzero(np.diff(kv)) + 1))
        lens = np.diff(np.concatenate((starts, [kv.size])))
        body = g.drop_columns([key])
        packed = pa.table(
            {
                key: pa.array(kv[starts]),
                "__payload": pa.array(
                    [_ipc_bytes(body.slice(int(s), int(l))) for s, l in zip(starts, lens)],
                    pa.large_binary(),
                ),
            }
        )
        pk = kv[starts]
        cuts = np.searchsorted(pk, bounds)
        pieces = [packed.slice(int(cuts[p]), int(cuts[p + 1] - cuts[p])) for p in range(P)]
        return (*pieces, (cuts[1:] - cuts[:-1]).astype(np.int64))

    @ray.remote
    def reduce_part(*pieces: pa.Table) -> pa.Table:
        from ..functions.runtime import cap_worker_threads

        cap_worker_threads()
        t = pa.concat_tables(
            [p for p in pieces if p.num_rows], promote_options="default"
        ).combine_chunks()
        t = t.take(pc.sort_indices(t[key]))
        kv = t[key].to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(np.diff(kv)) + 1))
        ends = np.concatenate((starts[1:], [kv.size]))
        outs = []
        for s, e in zip(starts, ends):
            body = pa.concat_tables(
                [_ipc_table(b) for b in t["__payload"].slice(int(s), int(e - s)).to_pylist()],
                promote_options="default",
            )
            body = body.append_column(
                key, pa.array(np.full(body.num_rows, kv[s], np.int64))
            )
            outs.append(fn(body))
        return pa.concat_tables(outs, promote_options="default")

    piece_refs: list[list] = [[] for _ in range(P)]
    count_refs = []
    for b in blocks:
        *pieces, counts = split_block.remote(b)
        for p in range(P):
            piece_refs[p].append(pieces[p])
        count_refs.append(counts)
    counts = np.sum(ray.get(count_refs), axis=0)
    out_refs = [
        reduce_part.remote(*piece_refs[p]) for p in range(P) if counts[p] > 0
    ]
    if not out_refs:  # no populated bucket anywhere (degenerate input)
        return rd.from_items([])
    return rd.from_arrow_refs(out_refs)


def hash_map_groups(
    ds: rd.Dataset,
    key: Union[str, list],
    fn: Callable,
    *,
    num_partitions: int | None = None,
    batch_format: str = "pyarrow",
) -> rd.Dataset:
    """``ds.groupby(key).map_groups(fn)`` with hash partitioning —
    groups are never split across blocks. See module docstring."""
    from ray.data.context import ShuffleStrategy

    n = hash_partitions(num_partitions)
    ctx = ds.context
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.default_hash_shuffle_parallelism = n
    return ds.groupby(key, num_partitions=n).map_groups(fn, batch_format=batch_format)
