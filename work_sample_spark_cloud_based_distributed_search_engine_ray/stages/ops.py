"""Relational / set operators re-expressed Ray-Data-first.

The reference exposes these through its Flame RDD API (SURVEY §2.1);
each function here names the Flame operator it replaces and fixes its
scale anti-pattern:

- ``broadcast_join`` replaces ``FlamePairRDD.join``
  (``flame/FlameWorker.java:491-544``) for the small-side case: the
  build side is ``ray.put`` ONCE into the object store and read
  zero-copy by every map task — no shuffle at all, vs the reference
  caching the whole build side per worker per range.
- ``cogroup`` / ``shuffle_join`` replace ``FlamePairRDD.cogroup``
  (``flame/FlameWorker.java:676-763``) and the co-partitioned hash join:
  tag + union + one hash shuffle (``groupby(key).map_groups``) instead
  of the reference's KVS-put implicit shuffle with comma-joined string
  accumulators.
- ``distinct_on`` replaces ``FlameRDD.distinct``
  (``flame/FlameWorker.java:458-489``): hash-shuffle keep-first instead
  of idempotent KVS puts.
- ``intersection`` replaces the DRIVER-SIDE ``FlameContextImpl
  .intersection`` (``flame/FlameContextImpl.java:224-275``) — the
  reference collects both tables to the master; here it is a
  distributed inner cogroup.

All group lambdas are vectorized over Arrow tables; nothing iterates
Python rows in a hot path.
"""

from __future__ import annotations

import math
from fractions import Fraction
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .shuffle import hash_map_groups


def _key_expr(batch: pa.Table, keys: list[str]) -> pa.Array:
    """Composite key as a struct array (works for is_in via dictionary
    encoding of single keys; multi-key uses string concat)."""
    if len(keys) == 1:
        return batch[keys[0]].combine_chunks()
    parts = [pc.cast(batch[k], pa.string()) for k in keys]
    out = parts[0]
    for p in parts[1:]:
        out = pc.binary_join_element_wise(out, p, "\x1f")
    return out.combine_chunks()


def broadcast_join(
    ds: rd.Dataset,
    small: pa.Table,
    on: str,
    *,
    how: str = "inner",
    small_prefix: str = "",
) -> rd.Dataset:
    """Map-side equi-join against a broadcast build side.

    ``small`` is put into the object store ONCE; each map task gets the
    same zero-copy reference (never re-shipped per batch). Use when one
    side fits comfortably in a worker's heap (dimension tables, dup
    maps, query matrices); for two big sides use ``shuffle_join``.
    """
    if small_prefix:
        small = small.rename_columns(
            [c if c == on else f"{small_prefix}{c}" for c in small.column_names]
        )
    small_ref = ray.put(small)

    def probe(batch: pa.Table) -> pa.Table:
        build: pa.Table = ray.get(small_ref)
        # vectorized hash probe: index_in maps each probe key to the
        # build row (first match); dimension keys are unique by schema
        idx = pc.index_in(batch[on], value_set=build[on].combine_chunks())
        if how == "inner":
            mask = pc.is_valid(idx)
            batch = batch.filter(mask)
            idx = idx.filter(mask)
        cols = dict(zip(batch.column_names, batch.columns))
        for name in build.column_names:
            if name == on:
                continue
            cols[name] = pc.take(build[name].combine_chunks(), idx)
        return pa.table(cols)

    return ds.map_batches(probe, batch_format="pyarrow")


def tag_union(ds_left: rd.Dataset, ds_right: rd.Dataset, key: str) -> rd.Dataset:
    """Union the two inputs with a ``__side`` tag (0=left, 1=right),
    aligning schemas by null-padding the other side's columns — the
    single-shuffle cogroup prelude."""

    def pad(side: int, other_schema: pa.Schema) -> Callable[[pa.Table], pa.Table]:
        def fn(batch: pa.Table) -> pa.Table:
            cols = dict(zip(batch.column_names, batch.columns))
            for f in other_schema:
                if f.name not in cols and f.name != key:
                    cols[f.name] = pa.nulls(batch.num_rows, f.type)
            cols["__side"] = pa.array([side] * batch.num_rows, pa.int8())
            return pa.table(cols)

        return fn

    ls = ds_left.schema().base_schema
    rs = ds_right.schema().base_schema
    left = ds_left.map_batches(pad(0, rs), batch_format="pyarrow")
    right = ds_right.map_batches(pad(1, ls), batch_format="pyarrow")
    # column order must match for union
    names = sorted(set(ls.names) | set(rs.names) | {"__side"})
    return left.select_columns(names).union(right.select_columns(names))


def cogroup(
    ds_left: rd.Dataset,
    ds_right: rd.Dataset,
    key: str,
    fn: Callable[[pa.Table, pa.Table], pa.Table],
) -> rd.Dataset:
    """Full-outer cogroup: ONE hash shuffle on ``key``; ``fn`` receives
    the left-rows and right-rows sub-tables of each key group.

    The per-key callback contract makes this a Python call per key —
    use it only for genuinely per-key logic at bounded key cardinality;
    for vectorizable reductions prefer ``cogroup_counts`` (counts) or
    ``shuffle_join`` (join), which shuffle a bounded ``__bucket`` and
    run Arrow kernels inside each bucket."""

    def per_group(group: pa.Table) -> pa.Table:
        side = group["__side"]
        left = group.filter(pc.equal(side, 0)).drop_columns(["__side"])
        right = group.filter(pc.equal(side, 1)).drop_columns(["__side"])
        return fn(left, right)

    return hash_map_groups(tag_union(ds_left, ds_right, key), key, per_group)


def bucket_mix(v: "np.ndarray", num_buckets: int) -> "np.ndarray":
    """Golden-ratio multiplicative mix of an int64/uint64 array into
    ``num_buckets`` bounded buckets (int64). THE canonical int bucket
    hash — every bounded-bucket stage must route through it so bucket
    assignment never drifts between operators."""
    mixed = (v.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
    return (mixed % np.uint64(num_buckets)).astype(np.int64)


def _bucket_of(column: pa.ChunkedArray | pa.Array, num_buckets: int) -> pa.Array:
    """Vectorized hash bucket of a key column (int: masked bits of a
    mixed value; string: md5-based hash64 per DISTINCT value)."""
    import numpy as np

    from ..functions.hashing import hash64

    col = column.combine_chunks() if isinstance(column, pa.ChunkedArray) else column
    if pa.types.is_integer(col.type):
        v = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.array(bucket_mix(v, num_buckets))
    d = col.dictionary_encode()
    uh = np.fromiter(
        (hash64(t) % num_buckets for t in d.dictionary.to_pylist()),
        dtype=np.int64,
        count=len(d.dictionary),
    )
    return pa.array(uh[d.indices.to_numpy(zero_copy_only=False)])


def shuffle_join(
    ds_left: rd.Dataset,
    ds_right: rd.Dataset,
    key: str,
    *,
    left_cols: list[str],
    right_cols: list[str],
    num_buckets: int = 64,
    how: str = "inner",
) -> rd.Dataset:
    """Equi-join of two LARGE sides: ONE hash shuffle on a bounded
    bucket of the key, then an Arrow C++ hash join per bucket group —
    per-group work is vectorized, never per-key Python (the reference
    instead caches the whole build side per worker range and emits a
    string-concat cross product, ``flame/FlameWorker.java:512-541``;
    duplicate keys here produce the same cross-product rows, typed).

    ``num_buckets`` bounds the rows one join task holds (~(|L|+|R|) /
    num_buckets); raise it with data volume so a bucket fits in a
    worker's heap.
    """

    def per_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"]
        left = group.filter(pc.equal(side, 0)).select([key] + left_cols)
        right = group.filter(pc.equal(side, 1)).select([key] + right_cols)
        return left.join(right, keys=key, join_type=how)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__bucket", _bucket_of(batch[key], num_buckets))

    lk = ds_left.select_columns([key] + left_cols)
    rk = ds_right.select_columns([key] + right_cols)
    tagged = tag_union(lk, rk, key).map_batches(add_bucket, batch_format="pyarrow")
    return hash_map_groups(tagged, "__bucket", per_bucket)


def packed_join(
    ds_left: rd.Dataset,
    ds_right: rd.Dataset,
    key: str,
    *,
    left_cols: list[str],
    right_cols: list[str],
    num_buckets: int = 64,
    how: str = "inner",
) -> rd.Dataset:
    """``shuffle_join`` executed on the task-based packed exchange
    (``shuffle.packed_task_groups``) instead of the Dataset hash
    shuffle. Two reasons to prefer it when an input comes OUT of a
    ``map_groups``-style stage:

    - a map_groups partition that received zero rows emits a
      SCHEMA-LESS empty block; downstream ``map_batches`` skip it (so
      the ``__bucket`` column never appears) and the Dataset hash
      shuffle then dies sorting on the missing key —
      ``packed_task_groups.split_block`` guards ``num_rows == 0``
      before touching any column;
    - the hash shuffle pays ~2-3 s of fixed aggregator-actor setup per
      execution, which dominates joins of compact intermediates.

    Inputs are materialized by the packed exchange — use for narrow
    mid-pipeline tables (degree maps, pair counts), not huge streaming
    inputs (those keep ``shuffle_join``'s backpressure)."""
    from .shuffle import packed_task_groups

    def per_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"]
        left = group.filter(pc.equal(side, 0)).select([key] + left_cols)
        right = group.filter(pc.equal(side, 1)).select([key] + right_cols)
        return left.join(right, keys=key, join_type=how)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__jbucket",
            pc.cast(_bucket_of(batch[key], num_buckets), pa.int64()),
        )

    lk = ds_left.select_columns([key] + left_cols)
    rk = ds_right.select_columns([key] + right_cols)
    tagged = tag_union(lk, rk, key).map_batches(add_bucket, batch_format="pyarrow")
    return packed_task_groups(tagged, "__jbucket", per_bucket, num_buckets=num_buckets)


def distinct_on(ds: rd.Dataset, cols: list[str], *, num_buckets: int = 64) -> rd.Dataset:
    """Global exact distinct over ``cols``: per-batch local dedup
    (combiner — shrinks the shuffle), then ONE hash shuffle on a
    BOUNDED bucket of the key and one vectorized Arrow dedup per
    bucket — no per-key Python call (the shuffle group count is
    ``num_buckets``, not the key cardinality)."""

    def local(batch: pa.Table) -> pa.Table:
        return batch.select(cols).group_by(cols).aggregate([])

    def add_bucket(batch: pa.Table) -> pa.Table:
        key = batch[cols[0]] if len(cols) == 1 else _key_expr(batch, cols)
        return batch.append_column("__bucket", _bucket_of(key, num_buckets))

    def per_bucket(group: pa.Table) -> pa.Table:
        return group.drop_columns(["__bucket"]).group_by(cols).aggregate([])

    return hash_map_groups(
        ds.map_batches(local, batch_format="pyarrow").map_batches(
            add_bucket, batch_format="pyarrow"
        ),
        "__bucket",
        per_bucket,
    )


def grouped_count_distinct(
    ds: rd.Dataset, group: str, value: str, *, num_buckets: int = 64
) -> rd.Dataset:
    """Exact ``count(DISTINCT value)`` per group — the COUNT DISTINCT
    aggregate the reference's string-concat ``foldByKey``
    (``FlameWorker.java:223-270``) cannot express without materializing
    every group's value list.

    Physical plan: per-batch local (group, value) dedup (combiner —
    shrinks the exchange to unique pairs per block), ONE hash shuffle
    on a BOUNDED bucket of the composite key with a vectorized dedup +
    per-group partial count per bucket, then an associative ``Sum``
    groupby over the <= num_buckets x groups partial rows. A (group,
    value) pair lands in exactly one bucket, so bucket partials are
    disjoint and the final Sum is exact. No stage groups per
    data-cardinality key. Output: (group, n_distinct)."""
    from ray.data.aggregate import Sum

    cols = [group, value]

    def local(batch: pa.Table) -> pa.Table:
        return batch.select(cols).group_by(cols).aggregate([])

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", _bucket_of(_key_expr(batch, cols), num_buckets)
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__bucket"]).group_by(cols).aggregate([])
        c = t.group_by([group]).aggregate([(value, "count")])
        return pa.table(
            {group: c[group], "n_partial": c[f"{value}_count"].cast(pa.int64())}
        )

    partials = hash_map_groups(
        ds.map_batches(local, batch_format="pyarrow").map_batches(
            add_bucket, batch_format="pyarrow"
        ),
        "__bucket",
        per_bucket,
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {group: batch[group], "n_distinct": batch["n_distinct"].cast(pa.int64())}
        )

    return (
        partials.groupby(group)
        .aggregate(Sum("n_partial", alias_name="n_distinct"))
        .map_batches(finish, batch_format="pyarrow")
    )


def funnel_counts(
    ds: rd.Dataset,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Ordered-funnel reach counts: for each prefix of ``steps``, how
    many users performed those event types IN ORDER, each step strictly
    after the previous step's earliest qualifying time (the greedy
    minimal chain — the standard funnel decision procedure: a valid
    chain exists iff the greedy one does).

    Physical plan: project to (user, type, ts) filtered to the step
    types (map-side — the exchange carries only funnel-relevant
    events), ONE hash shuffle on a bounded user bucket (a user's events
    land in exactly one bucket), then per bucket one vectorized
    segmented-min pass per step (``np.minimum.at`` over
    dictionary-encoded user indices — never a per-user Python loop);
    per-bucket partial reach counts sum associatively. Output:
    (step_idx, step, n_users), non-increasing in step_idx."""
    from ray.data.aggregate import Sum

    step_set = pa.array(list(steps), pa.string())

    def local(batch: pa.Table) -> pa.Table:
        t = batch.select([user_col, type_col, ts_col])
        t = t.filter(pc.is_in(t[type_col], value_set=step_set))
        return t.append_column("__bucket", _bucket_of(t[user_col], num_buckets))

    def per_bucket(g: pa.Table) -> pa.Table:
        uidx = (
            g[user_col]
            .combine_chunks()
            .dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n_users = int(uidx.max()) + 1 if len(uidx) else 0
        ts = (
            g[ts_col]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        typ = g[type_col].to_numpy(zero_copy_only=False)
        lo, hi = np.iinfo(np.int64).min, np.iinfo(np.int64).max
        t_prev = np.full(n_users, lo, dtype=np.int64)
        reach = np.zeros(len(steps), dtype=np.int64)
        for k, s in enumerate(steps):
            cur = np.full(n_users, hi, dtype=np.int64)
            sel = (typ == s) & (ts > t_prev[uidx])
            np.minimum.at(cur, uidx[sel], ts[sel])
            t_prev = cur
            reach[k] = int(np.count_nonzero(cur != hi))
        return pa.table(
            {
                "step_idx": pa.array(np.arange(len(steps), dtype=np.int64)),
                "step": pa.array(list(steps), pa.string()),
                "n_users": pa.array(reach),
            }
        )

    partials = hash_map_groups(
        ds.map_batches(local, batch_format="pyarrow"), "__bucket", per_bucket
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "step_idx": batch["step_idx"],
                "step": batch["step"],
                "n_users": batch["n_users"].cast(pa.int64()),
            }
        )

    return (
        partials.groupby(["step_idx", "step"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .map_batches(finish, batch_format="pyarrow")
    )


def retention_cohorts(
    ds: rd.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_k: int | None = None,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Cohort retention: users are cohorted by their FIRST active epoch
    day; for each (cohort_day, k >= 1) the count of cohort users active
    again exactly k days after their first day. Days are UTC epoch days
    (``CAST(ts AS DATE)`` on naive-UTC timestamps), emitted as int64 so
    the SQL twin compares exactly.

    Physical plan: per-batch distinct (user, day) projection (map-side
    combine — the exchange carries at most one row per user-day per
    block), ONE bounded user-bucket hash shuffle (a user's rows land in
    one bucket), per bucket a vectorized first-day ``np.minimum.at`` +
    unique-pair pass, then associative Sum of the per-bucket
    (cohort_day, k) partial counts. Output: (cohort_day, k, n_users)."""
    from ray.data.aggregate import Sum

    us_per_day = 86_400_000_000

    def local(batch: pa.Table) -> pa.Table:
        # normalize any timestamp precision to us, then int64 // int64
        # (truncating == floor for the positive post-1970 timestamps of
        # the events schema)
        micros = pc.cast(pc.cast(batch[ts_col], pa.timestamp("us")), pa.int64())
        day = pc.divide(micros, us_per_day)
        t = pa.table({user_col: batch[user_col], "__day": day})
        t = t.group_by([user_col, "__day"]).aggregate([])
        return t.append_column("__bucket", _bucket_of(t[user_col], num_buckets))

    def per_bucket(g: pa.Table) -> pa.Table:
        # the local combine dedups per BATCH only — the same (user, day)
        # pair can arrive from many blocks, so dedup again per bucket
        g = g.select([user_col, "__day"]).group_by([user_col, "__day"]).aggregate([])
        uidx = (
            g[user_col]
            .combine_chunks()
            .dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        day = g["__day"].to_numpy(zero_copy_only=False)
        n_users = int(uidx.max()) + 1 if len(uidx) else 0
        d0 = np.full(n_users, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(d0, uidx, day)
        k = day - d0[uidx]
        keep = k >= 1
        if max_k is not None:
            keep &= k <= max_k
        t = pa.table(
            {
                "cohort_day": pa.array(d0[uidx][keep]),
                "k": pa.array(k[keep]),
            }
        )
        c = t.group_by(["cohort_day", "k"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "cohort_day": c["cohort_day"],
                "k": c["k"],
                "n_users": c["count_all"].cast(pa.int64()),
            }
        )

    partials = hash_map_groups(
        ds.map_batches(local, batch_format="pyarrow"), "__bucket", per_bucket
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_day": batch["cohort_day"],
                "k": batch["k"],
                "n_users": batch["n_users"].cast(pa.int64()),
            }
        )

    return (
        partials.groupby(["cohort_day", "k"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .map_batches(finish, batch_format="pyarrow")
    )


def grouped_value_counts(
    ds: rd.Dataset, group: str, value: str, *, num_buckets: int = 64
) -> rd.Dataset:
    """Exact occurrence count per (group, value) pair: per-batch Arrow
    ``group_by().count`` partials (map-side combine), ONE bounded-bucket
    hash shuffle summing them — a pair lands in exactly one bucket, so
    bucket sums are final. Output: (group, value, n_occ)."""
    cols = [group, value]

    def local(batch: pa.Table) -> pa.Table:
        c = batch.select(cols).group_by(cols).aggregate([([], "count_all")])
        return pa.table(
            {
                group: c[group],
                value: c[value],
                "n_occ": c["count_all"].cast(pa.int64()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", _bucket_of(_key_expr(batch, cols), num_buckets)
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        a = g.drop_columns(["__bucket"]).group_by(cols).aggregate([("n_occ", "sum")])
        return pa.table(
            {group: a[group], value: a[value], "n_occ": a["n_occ_sum"].cast(pa.int64())}
        )

    return hash_map_groups(
        ds.map_batches(local, batch_format="pyarrow").map_batches(
            add_bucket, batch_format="pyarrow"
        ),
        "__bucket",
        per_bucket,
    )


def grouped_mode(
    ds: rd.Dataset, group: str, value: str, *, num_buckets: int = 64
) -> rd.Dataset:
    """Most frequent value per group (the MODE aggregate), deterministic
    tie-break: higher count wins, then the smaller value. Composition
    of two bounded-bucket primitives — exact (group, value) occurrence
    counts (``grouped_value_counts``) then ``topn_per_group(n=1)`` over
    the counts by (n_occ desc, value asc); no stage groups per
    data-cardinality key. Output: (group, value, n_occ)."""
    counts = grouped_value_counts(ds, group, value, num_buckets=num_buckets)
    return topn_per_group(
        counts,
        group,
        1,
        [("n_occ", "descending"), (value, "ascending")],
        num_buckets=num_buckets,
    )


def intersection(
    ds_left: rd.Dataset, ds_right: rd.Dataset, col: str, *, num_buckets: int = 64
) -> rd.Dataset:
    """Distributed distinct-intersection on one column (vs the
    reference's collect-to-master, ``FlameContextImpl.java:224-275``).

    Per-batch local dedup on both sides, tag + union, ONE bucketed
    hash shuffle, then a vectorized set-intersection per bucket
    (``unique`` + ``is_in`` Arrow kernels) — never a per-key group."""

    def local(batch: pa.Table) -> pa.Table:
        return batch.select([col]).group_by([col]).aggregate([])

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__bucket", _bucket_of(batch[col], num_buckets))

    def per_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"]
        left = pc.unique(group.filter(pc.equal(side, 0))[col].combine_chunks())
        right = pc.unique(group.filter(pc.equal(side, 1))[col].combine_chunks())
        return pa.table({col: left.filter(pc.is_in(left, value_set=right))})

    lk = ds_left.map_batches(local, batch_format="pyarrow")
    rk = ds_right.map_batches(local, batch_format="pyarrow")
    return hash_map_groups(
        tag_union(lk, rk, col).map_batches(add_bucket, batch_format="pyarrow"),
        "__bucket",
        per_bucket,
    )


def except_distinct(
    ds_left: rd.Dataset, ds_right: rd.Dataset, col: str, *, num_buckets: int = 64
) -> rd.Dataset:
    """Distributed distinct set-difference (SQL ``EXCEPT``) on one
    column: values present in the left side and absent from the right.
    Same physical plan as ``intersection`` (per-batch local dedup, ONE
    bucketed shuffle, vectorized per-bucket kernel) with the membership
    test inverted — a value lives in exactly one bucket, so per-bucket
    difference == global difference. Never a per-key group."""

    def local(batch: pa.Table) -> pa.Table:
        return batch.select([col]).group_by([col]).aggregate([])

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__bucket", _bucket_of(batch[col], num_buckets))

    def per_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"]
        left = pc.unique(group.filter(pc.equal(side, 0))[col].combine_chunks())
        right = pc.unique(group.filter(pc.equal(side, 1))[col].combine_chunks())
        return pa.table(
            {col: left.filter(pc.invert(pc.is_in(left, value_set=right)))}
        )

    lk = ds_left.map_batches(local, batch_format="pyarrow")
    rk = ds_right.map_batches(local, batch_format="pyarrow")
    return hash_map_groups(
        tag_union(lk, rk, col).map_batches(add_bucket, batch_format="pyarrow"),
        "__bucket",
        per_bucket,
    )


def poisson_breakpoints(fraction: float, kmax: int = 16) -> list[float]:
    """Cumulative Poisson(fraction) probabilities P(X <= k), k = 0..kmax
    (float64). Shared between the Ray sampler and its DuckDB oracle so
    the multiplicity of every row is the identical double comparison in
    both engines."""
    import math

    p = math.exp(-fraction)
    cum = [p]
    for k in range(1, kmax + 1):
        p = p * fraction / k
        cum.append(cum[-1] + p)
    return cum


def sample_with_replacement(
    ds: rd.Dataset,
    fraction: float,
    key_col: str,
    *,
    seed: int = 7,
    kmax: int = 16,
) -> rd.Dataset:
    """Distributed with-replacement sample — expected ``fraction`` copies
    of each row (Flame ``invokeSampling(withReplacement=true)`` parity,
    ``flame/FlameContextImpl.java:277-339``; the reference collects the
    WHOLE table to the master and draws with ``new Random()``).

    Documented deviations, both required at scale: (1) distributed — a
    per-row Poisson(fraction) multiplicity replaces the exact-size
    global draw (standard Bernoulli/Poisson bootstrap equivalence);
    (2) deterministic — the uniform is the top 52 bits of
    ``md5(key || ':' || seed)``, so the sample is a pure function of
    the data (reproducible, oracle-checkable), not of an unseeded RNG.
    """
    import hashlib

    cum = np.array(poisson_breakpoints(fraction, kmax), dtype=np.float64)

    def multiply(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        u = np.fromiter(
            (
                int(hashlib.md5(f"{k}:{seed}".encode()).hexdigest()[:13], 16)
                for k in keys
            ),
            dtype=np.uint64,
            count=len(keys),
        ).astype(np.float64) / float(1 << 52)
        mult = np.searchsorted(cum, u, side="right")
        take = np.repeat(np.arange(len(keys), dtype=np.int64), mult)
        return batch.take(pa.array(take))

    return ds.map_batches(multiply, batch_format="pyarrow")


def cogroup_counts(
    ds_left: rd.Dataset,
    ds_right: rd.Dataset,
    key: str,
    *,
    left_name: str = "n_left",
    right_name: str = "n_right",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Full-outer per-key row counts of both sides — the common cogroup
    reduction, fully vectorized: tag + union + ONE bucketed hash
    shuffle, then one Arrow ``group_by(key).sum`` per bucket (contrast
    the generic ``cogroup``, whose per-key callback contract forces a
    Python call per key). Output: key, ``left_name``, ``right_name``."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        side = batch["__side"]
        return pa.table(
            {
                key: batch[key],
                "__l": pc.cast(pc.equal(side, 0), pa.int64()),
                "__r": pc.cast(pc.equal(side, 1), pa.int64()),
                "__bucket": _bucket_of(batch[key], num_buckets),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        agg = group.group_by(key).aggregate([("__l", "sum"), ("__r", "sum")])
        return pa.table(
            {
                key: agg[key],
                left_name: agg["__l_sum"],
                right_name: agg["__r_sum"],
            }
        )

    lk = ds_left.select_columns([key])
    rk = ds_right.select_columns([key])
    return hash_map_groups(
        tag_union(lk, rk, key).map_batches(add_bucket, batch_format="pyarrow"),
        "__bucket",
        per_bucket,
    )


def grouped_quantiles(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    *,
    scale: int = 100,
) -> rd.Dataset:
    """EXACT per-group discrete quantiles of a fixed-point value column,
    computed as a distributed histogram — no global sort.

    The value is first quantized to ``round(value * scale)`` (e.g.
    cents), so the full distribution per group is a bounded histogram:
    every batch pre-aggregates (group, value_q) counts in one Arrow
    ``group_by`` (the map-side combine), the ONE narrow shuffle moves
    those partial counts, and each group's kernel sums duplicates,
    cumulative-sums, and picks each quantile with DuckDB's
    ``quantile_disc`` index rule ``max(0, ceil(q*n) - 1)`` (verified
    against DuckDB directly) via one ``np.searchsorted``. Exact, scale-
    honest (the shuffle is histogram rows, not data rows), and
    partitioning-invariant.

    Output: one row per group with ``p{q*100:g}_e{len(str(scale))-1}``
    int64 columns, e.g. ``p50_e2`` for q=0.5, scale=100.
    """
    exp = len(str(scale)) - 1

    def _pname(q: float) -> str:
        return f"p{q * 100:g}_e{exp}".replace(".", "_")

    def partial_hist(t: pa.Table) -> pa.Table:
        # half-away-from-zero, matching SQL round(); Arrow's default
        # round mode is half-to-even, which bins exact .5 differently
        v = pc.round(
            pc.multiply(t[value_col], float(scale)),
            round_mode="half_towards_infinity",
        )
        qt = pa.table({group_col: t[group_col], "__vq": v.cast(pa.int64())})
        agg = qt.group_by([group_col, "__vq"]).aggregate([([], "count_all")])
        return agg.rename_columns([group_col, "__vq", "__n"])

    def pick(group: pa.Table) -> pa.Table:
        g = group.combine_chunks()
        idx = pc.sort_indices(g["__vq"])
        vq = g["__vq"].to_numpy(zero_copy_only=False)[idx]
        nn = g["__n"].to_numpy(zero_copy_only=False)[idx]
        # merge duplicate value rows contributed by different batches
        first = np.ones(vq.size, dtype=bool)
        first[1:] = vq[1:] != vq[:-1]
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(nn, starts)
        vals = vq[starts]
        cum = np.cumsum(sums)
        n = int(cum[-1])
        cols = {group_col: g.slice(0, 1)[group_col]}
        for q in qs:
            # ceil(q*n) under EXACT decimal arithmetic: the binary
            # float product floats above the true integer for many
            # (q, n) pairs (0.07*100 == 7.000000000000001 -> ceil 8,
            # one rank too high vs DuckDB quantile_disc)
            target = max(1, math.ceil(Fraction(str(q)) * n))
            j = int(np.searchsorted(cum, target, side="left"))
            cols[_pname(q)] = pa.array([int(vals[min(j, vals.size - 1)])], pa.int64())
        return pa.table(cols)

    hist = ds.map_batches(partial_hist, batch_format="pyarrow")
    return hash_map_groups(hist, group_col, pick)


def grouped_quantiles_cont(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    *,
    scale: int = 100,
) -> rd.Dataset:
    """Per-group CONTINUOUS (linearly interpolated) quantiles — the
    ``quantile_cont`` twin of ``grouped_quantiles``. Same distributed
    bounded histogram (map-side (group, value_q) combine, ONE narrow
    shuffle of histogram rows, no data sort); the per-group kernel
    applies the standard interpolation rule h = q*(n-1),
    v[floor(h)] + frac*(v[floor(h)+1] - v[floor(h)]), evaluated in
    EXACT rational arithmetic (``Fraction``) over the cumulative
    counts — the binary-float h drifts below integer ranks for many
    (q, n) pairs, which would pick the wrong bracket.

    Output: one row per group with ``p{q*100:g}_e6`` int64 columns
    (the interpolated value at the original unit, e6-quantized)."""

    def _pname(q: float) -> str:
        return f"p{q * 100:g}_e6".replace(".", "_")

    def partial_hist(t: pa.Table) -> pa.Table:
        v = pc.round(
            pc.multiply(t[value_col], float(scale)),
            round_mode="half_towards_infinity",
        )
        qt = pa.table({group_col: t[group_col], "__vq": v.cast(pa.int64())})
        agg = qt.group_by([group_col, "__vq"]).aggregate([([], "count_all")])
        return agg.rename_columns([group_col, "__vq", "__n"])

    out_mult = 1_000_000 // scale  # vq (e.g. cents) -> e6 of the unit

    def pick(group: pa.Table) -> pa.Table:
        g = group.combine_chunks()
        idx = pc.sort_indices(g["__vq"])
        vq = g["__vq"].to_numpy(zero_copy_only=False)[idx]
        nn = g["__n"].to_numpy(zero_copy_only=False)[idx]
        first = np.ones(vq.size, dtype=bool)
        first[1:] = vq[1:] != vq[:-1]
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(nn, starts)
        vals = vq[starts]
        cum = np.cumsum(sums)
        n = int(cum[-1])
        cols = {group_col: g.slice(0, 1)[group_col]}
        for q in qs:
            h = Fraction(str(q)) * (n - 1)
            lo = int(h)  # floor for the non-negative h
            frac = h - lo
            j = int(np.searchsorted(cum, lo + 1, side="left"))
            v_lo = int(vals[min(j, vals.size - 1)])
            if frac == 0:
                res = Fraction(v_lo)
            else:
                j2 = int(np.searchsorted(cum, lo + 2, side="left"))
                v_hi = int(vals[min(j2, vals.size - 1)])
                res = v_lo + frac * (v_hi - v_lo)
            cols[_pname(q)] = pa.array([round(res * out_mult)], pa.int64())
        return pa.table(cols)

    hist = ds.map_batches(partial_hist, batch_format="pyarrow")
    return hash_map_groups(hist, group_col, pick)


def grouped_skyline_2d(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    ts_col: str,
    id_col: str,
    *,
    scale: int = 100,
) -> rd.Dataset:
    """Per-group 2-D SKYLINE (Pareto-optimal set, Borzsony et al.
    2001): rows not strictly dominated under (value MAX, ts MIN) —
    "the earliest events of each unbeaten value level". Exact-tie rows
    (equal value AND equal ts) are all kept, matching the SQL
    NOT-EXISTS dominance twin.

    Dominance is transitive, so the LOCAL skyline is a valid combiner:
    every block reduces to its own skyline first (vectorized — one
    lexsort, per-group running-min scan over value classes), and only
    those few survivors enter the per-group merge, where the same
    kernel runs once more. The exchange carries skyline-sized data
    (O(log n) expected for independent dims), never the table."""
    exp = len(str(scale)) - 1
    vq_name = f"vq_e{exp}"

    def _skyline(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty blocks must keep the output schema
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    group_col: pa.array([], pa.string()),
                    vq_name: pa.array([], pa.int64()),
                    ts_col: pa.array([], pa.timestamp("us")),
                }
            )
        _g, v, _tsu, take = _skyline_core(
            t, group_col, vq_name if vq_name in t.column_names else value_col,
            ts_col, scale, quantize=vq_name not in t.column_names,
        )
        out = t.take(pa.array(take))
        cols = {
            id_col: out[id_col],
            group_col: out[group_col],
            vq_name: pa.array(v, pa.int64()),
            ts_col: out[ts_col],
        }
        return pa.table(cols)

    local = ds.map_batches(_skyline, batch_format="pyarrow")
    return hash_map_groups(local, group_col, _skyline)


def _skyline_core(
    t: pa.Table,
    group_col: str,
    value_col: str,
    ts_col: str,
    scale: int,
    *,
    quantize: bool,
):
    """Shared skyline kernel: returns (group codes, surviving quantized
    values, surviving ts, take indices) for the (value MAX, ts MIN)
    skyline of ``t`` — used both per block and per merge group."""
    tt = t.combine_chunks()
    if quantize:
        v = (
            pc.round(
                pc.multiply(tt[value_col], float(scale)),
                round_mode="half_towards_infinity",
            )
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
    else:
        v = tt[value_col].to_numpy(zero_copy_only=False)
    tsu = tt[ts_col].to_numpy(zero_copy_only=False).view(np.int64)
    if pa.types.is_integer(tt[group_col].type):
        gcode = tt[group_col].to_numpy(zero_copy_only=False)
    else:
        _, gcode = np.unique(
            np.asarray(tt[group_col].to_pylist(), dtype=object), return_inverse=True
        )
    order = np.lexsort((tsu, -v, gcode))
    gs, vs, ts_s = gcode[order], v[order], tsu[order]
    keep_sorted = np.zeros(vs.size, dtype=bool)
    run_starts = np.concatenate(([0], np.flatnonzero(np.diff(gs) != 0) + 1))
    run_ends = np.concatenate((run_starts[1:], [gs.size]))
    for rs, re in zip(run_starts, run_ends):
        vv, tv = vs[rs:re], ts_s[rs:re]
        cls_start = np.concatenate(([0], np.flatnonzero(np.diff(vv) != 0) + 1))
        cmin = tv[cls_start]  # ts asc within a value class
        prev = np.empty(cmin.size, np.int64)
        prev[0] = np.iinfo(np.int64).max
        if cmin.size > 1:
            prev[1:] = np.minimum.accumulate(cmin)[:-1]
        alive = cmin < prev
        # survivors: rows of living classes whose ts equals the class min
        cls_of_row = np.cumsum(
            np.concatenate(([0], (np.diff(vv) != 0).astype(np.int64)))
        )
        keep_sorted[rs:re] = alive[cls_of_row] & (tv == cmin[cls_of_row])
    take = order[keep_sorted]
    return gcode[take], v[take], tsu[take], take


def grouped_percentile_rank(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    id_col: str,
    *,
    scale: int = 100,
) -> rd.Dataset:
    """EXACT per-row percentile rank within its group — SQL
    ``percent_rank()`` (= (rank-1)/(n-1), ties share the minimum rank)
    as integer micros: ``pr_e6 = 1_000_000 * n_strictly_smaller
    // (n - 1)``.

    A window function with NO per-group sort of the data: pass 1
    builds the bounded per-group value HISTOGRAM (map-side (group,
    value) count combine — the domain is fixed-point-quantized, so the
    histogram is value-range-bounded, never row-bounded), merges it on
    the driver and broadcasts (vals, exclusive-cumsum) arrays via
    ``ray.put``; pass 2 assigns every row its rank with one
    ``np.searchsorted`` per batch. Rows stream; only histogram rows
    ever cross the wire."""
    exp = len(str(scale)) - 1

    def partial_hist(t: pa.Table) -> pa.Table:
        v = pc.round(
            pc.multiply(t[value_col], float(scale)),
            round_mode="half_towards_infinity",
        )
        qt = pa.table({group_col: t[group_col], "__vq": v.cast(pa.int64())})
        agg = qt.group_by([group_col, "__vq"]).aggregate([([], "count_all")])
        return agg.rename_columns([group_col, "__vq", "__n"])

    hist_rows = ds.map_batches(partial_hist, batch_format="pyarrow").take_all()
    by_group: dict = {}
    for r in hist_rows:
        by_group.setdefault(r[group_col], {})
        by_group[r[group_col]][r["__vq"]] = (
            by_group[r[group_col]].get(r["__vq"], 0) + r["__n"]
        )
    lookup = {}
    for g, hv in by_group.items():
        vals = np.array(sorted(hv), np.int64)
        counts = np.array([hv[v] for v in vals], np.int64)
        cum_excl = np.concatenate(([0], np.cumsum(counts)[:-1]))
        lookup[g] = (vals, cum_excl, int(counts.sum()))
    lookup_ref = ray.put(lookup)

    def assign(t: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        v = (
            pc.round(
                pc.multiply(t[value_col], float(scale)),
                round_mode="half_towards_infinity",
            )
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        groups = t[group_col].to_pylist()
        pr = np.zeros(v.size, np.int64)
        garr = np.asarray(groups, dtype=object)
        for g in set(groups):
            vals, cum_excl, n = lk[g]
            m = garr == g
            if n <= 1:
                continue
            idx = np.searchsorted(vals, v[m], side="left")
            pr[m] = 1_000_000 * cum_excl[idx] // (n - 1)
        return pa.table(
            {
                id_col: t[id_col],
                group_col: t[group_col],
                f"vq_e{exp}": pa.array(v),
                "pr_e6": pa.array(pr),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def grouped_cume_dist(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    id_col: str,
    *,
    scale: int = 100,
) -> rd.Dataset:
    """EXACT per-row cumulative distribution within its group — SQL
    ``cume_dist()`` (= (#rows with value <= this)/n, peers share) as
    integer micros: ``cd_e6 = 1_000_000 * n_le // n``.

    Same two-pass plan as ``grouped_percentile_rank`` (value-bounded
    histogram broadcast, one searchsorted per batch, rows stream);
    the only differences are the INCLUSIVE cumulative count and the
    ``n`` divisor (a single-row group gets 1.0)."""
    exp = len(str(scale)) - 1

    def partial_hist(t: pa.Table) -> pa.Table:
        v = pc.round(
            pc.multiply(t[value_col], float(scale)),
            round_mode="half_towards_infinity",
        )
        qt = pa.table({group_col: t[group_col], "__vq": v.cast(pa.int64())})
        agg = qt.group_by([group_col, "__vq"]).aggregate([([], "count_all")])
        return agg.rename_columns([group_col, "__vq", "__n"])

    hist_rows = ds.map_batches(partial_hist, batch_format="pyarrow").take_all()
    by_group: dict = {}
    for r in hist_rows:
        by_group.setdefault(r[group_col], {})
        by_group[r[group_col]][r["__vq"]] = (
            by_group[r[group_col]].get(r["__vq"], 0) + r["__n"]
        )
    lookup = {}
    for g, hv in by_group.items():
        vals = np.array(sorted(hv), np.int64)
        counts = np.array([hv[v] for v in vals], np.int64)
        lookup[g] = (vals, np.cumsum(counts), int(counts.sum()))
    lookup_ref = ray.put(lookup)

    def assign(t: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        v = (
            pc.round(
                pc.multiply(t[value_col], float(scale)),
                round_mode="half_towards_infinity",
            )
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        groups = t[group_col].to_pylist()
        cd = np.zeros(v.size, np.int64)
        garr = np.asarray(groups, dtype=object)
        for g in set(groups):
            vals, cum_incl, n = lk[g]
            m = garr == g
            idx = np.searchsorted(vals, v[m], side="left")
            cd[m] = 1_000_000 * cum_incl[idx] // n
        return pa.table(
            {
                id_col: t[id_col],
                group_col: t[group_col],
                f"vq_e{exp}": pa.array(v),
                "cd_e6": pa.array(cd),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def grouped_mad_outliers(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    *,
    scale: int = 100,
    k: int = 3,
) -> rd.Dataset:
    """EXACT per-group robust outlier screen: median, median absolute
    deviation (MAD), and the count of values with ``|v - med| > k*MAD``
    — the classic robust-statistics alternative to mean/stddev z-scores
    (immune to the very outliers it hunts).

    Same distributed-histogram plan as ``grouped_quantiles`` (quantize
    to fixed point, map-side (group, value) count combine, ONE narrow
    histogram shuffle, no global sort) — but the MAD needs no second
    pass over the data: the |v - med| distribution per group is a pure
    transform of the value histogram already in hand, so the group
    kernel folds the histogram around the median, re-sorts the bounded
    deviation values, and picks the MAD with the same ``quantile_disc``
    index rule. Both medians are the DISCRETE (lower) median, matching
    DuckDB ``quantile_disc(x, 0.5)``.

    Output per group: ``med_e{D}``, ``mad_e{D}``, ``n``,
    ``n_outliers`` (int64, D digits of fixed-point scale)."""
    exp = len(str(scale)) - 1

    def partial_hist(t: pa.Table) -> pa.Table:
        v = pc.round(
            pc.multiply(t[value_col], float(scale)),
            round_mode="half_towards_infinity",
        )
        qt = pa.table({group_col: t[group_col], "__vq": v.cast(pa.int64())})
        agg = qt.group_by([group_col, "__vq"]).aggregate([([], "count_all")])
        return agg.rename_columns([group_col, "__vq", "__n"])

    def _disc_quantile(vals: np.ndarray, counts: np.ndarray, n: int) -> int:
        # DuckDB quantile_disc(x, 0.5) index rule: element at rank
        # max(1, ceil(0.5*n)) in sorted order (exact integer ceil)
        target = max(1, (n + 1) // 2)
        cum = np.cumsum(counts)
        j = int(np.searchsorted(cum, target, side="left"))
        return int(vals[min(j, vals.size - 1)])

    def screen(group: pa.Table) -> pa.Table:
        g = group.combine_chunks()
        idx = pc.sort_indices(g["__vq"])
        vq = g["__vq"].to_numpy(zero_copy_only=False)[idx]
        nn = g["__n"].to_numpy(zero_copy_only=False)[idx]
        first = np.ones(vq.size, dtype=bool)
        first[1:] = vq[1:] != vq[:-1]
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(nn, starts)
        vals = vq[starts]
        n = int(sums.sum())
        med = _disc_quantile(vals, sums, n)
        # fold the histogram around the median -> |v-med| histogram
        dev = np.abs(vals - med)
        order = np.argsort(dev, kind="stable")
        dev_s, w_s = dev[order], sums[order]
        dfirst = np.ones(dev_s.size, dtype=bool)
        dfirst[1:] = dev_s[1:] != dev_s[:-1]
        dstarts = np.flatnonzero(dfirst)
        dsums = np.add.reduceat(w_s, dstarts)
        dvals = dev_s[dstarts]
        mad = _disc_quantile(dvals, dsums, n)
        n_out = int(dsums[dvals > k * mad].sum())
        return pa.table(
            {
                group_col: group.slice(0, 1)[group_col],
                f"med_e{exp}": pa.array([med], pa.int64()),
                f"mad_e{exp}": pa.array([mad], pa.int64()),
                "n": pa.array([n], pa.int64()),
                "n_outliers": pa.array([n_out], pa.int64()),
            }
        )

    hist = ds.map_batches(partial_hist, batch_format="pyarrow")
    return hash_map_groups(hist, group_col, screen)


def _membership_join_keys(
    ds_left: rd.Dataset,
    ds_right: rd.Dataset,
    key: str,
    *,
    keep_matches: bool,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Shared kernel for SEMI/ANTI join on ``key``: the DISTINCT left
    keys WITH (semi) or WITHOUT (anti) a matching right row.

    Same single bounded-bucket shuffle as ``cogroup_counts`` — both
    sides project to (key, side), each bucket group resolves
    membership with one vectorized ``pc.is_in`` — so per-group work is
    Arrow kernels, never per-key Python, and the shuffle carries only
    key columns."""

    def tag(side: int) -> Callable[[pa.Table], pa.Table]:
        # both sides are projected to exactly (key,) so the generic
        # null-padding tag_union is unnecessary — and it needs a
        # schema, which an empty filtered side doesn't have
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key: t[key],
                    "__side": pa.array([side] * t.num_rows, pa.int8()),
                    "__bucket": _bucket_of(t[key], num_buckets),
                }
            )

        return fn

    def per_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"]
        left = group.filter(pc.equal(side, 0))[key]
        right = group.filter(pc.equal(side, 1))[key]
        keep = pc.is_in(left, value_set=right.combine_chunks())
        if not keep_matches:
            keep = pc.invert(keep)
        return pa.table({key: left.filter(keep).combine_chunks().unique()})

    lk = ds_left.select_columns([key]).map_batches(tag(0), batch_format="pyarrow")
    rk = ds_right.select_columns([key]).map_batches(tag(1), batch_format="pyarrow")
    return hash_map_groups(lk.union(rk), "__bucket", per_bucket)


def anti_join_keys(
    ds_left: rd.Dataset, ds_right: rd.Dataset, key: str, *, num_buckets: int = 64
) -> rd.Dataset:
    """``SELECT DISTINCT k FROM left WHERE k NOT IN (SELECT k FROM right)``."""
    return _membership_join_keys(
        ds_left, ds_right, key, keep_matches=False, num_buckets=num_buckets
    )


def semi_join_keys(
    ds_left: rd.Dataset, ds_right: rd.Dataset, key: str, *, num_buckets: int = 64
) -> rd.Dataset:
    """``SELECT DISTINCT k FROM left WHERE k IN (SELECT k FROM right)``."""
    return _membership_join_keys(
        ds_left, ds_right, key, keep_matches=True, num_buckets=num_buckets
    )


def topn_per_group(
    ds: rd.Dataset,
    group_col: str,
    n: int,
    sort_keys: list[tuple[str, str]],
    *,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Top-N rows per group (``row_number() OVER (PARTITION BY g ORDER
    BY ...) <= n``), deterministic when ``sort_keys`` totally orders
    rows within a group.

    Map-side combine (each batch keeps at most n rows per group it
    sees — the shuffle carries <= n * groups-per-batch rows), then ONE
    hash shuffle on a BOUNDED bucket of the group key and the same
    vectorized top-n per bucket: one multi-key Arrow sort + run
    detection over the group column — never a per-group Python call."""

    keys = [(group_col, "ascending")] + list(sort_keys)

    def topn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        taken = t.take(pc.sort_indices(t, sort_keys=keys))
        g = taken[group_col].combine_chunks().dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        )
        first = np.ones(len(g), dtype=bool)
        first[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(first)
        run_id = np.cumsum(first) - 1
        pos = np.arange(len(g)) - starts[run_id]
        return taken.filter(pa.array(pos < n))

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket", pc.cast(_bucket_of(t[group_col], num_buckets), pa.int64())
        )

    def per_bucket(t: pa.Table) -> pa.Table:
        return topn(t.drop_columns(["__bucket"]))

    # task-based packed exchange, not the Dataset hash shuffle: the
    # input is post-combine compact (<= n rows per group per batch),
    # and upstream groupby().aggregate() stages can emit SCHEMA-LESS
    # empty blocks that the hash shuffle dies sorting on (the
    # packed_task_groups split_block guards num_rows == 0 first)
    from .shuffle import packed_task_groups

    return packed_task_groups(
        ds.map_batches(topn, batch_format="pyarrow").map_batches(
            add_bucket, batch_format="pyarrow"
        ),
        "__bucket",
        per_bucket,
        num_buckets=num_buckets,
    )


def skew_join(
    ds_fact: rd.Dataset,
    ds_dim: rd.Dataset,
    key: str,
    *,
    fact_cols: list[str],
    dim_cols: list[str],
    salt_col: str,
    num_salts: int = 8,
    hot_count_threshold: int = 100_000,
    num_buckets: int = 64,
    how: str = "inner",
) -> rd.Dataset:
    """``shuffle_join`` with HOT-KEY SALTING — the skew-defusing join
    (same defusal the index build applies to hot terms,
    ``pipelines.build_index.detect_term_salts``; the reference's join
    has no skew handling at all and serializes a hot key onto one
    worker, ``flame/FlameWorker.java:491-544``).

    Plan: (1) exact per-key fact counts via per-batch partial counts +
    one vocabulary-bounded ``groupby(key).sum`` — keys with count >=
    ``hot_count_threshold`` form the HOT set (small by the definition
    of skew; broadcast via ``ray.put`` once). (2) A hot fact row takes
    salt = ``salt_col`` % num_salts, a cold row salt 0; hot DIM rows
    are REPLICATED once per salt (dim duplication is num_salts x
    |hot keys| rows — the small side of the trade). (3) ONE bounded-
    bucket shuffle routes on (key, salt) so a hot key's postings spread
    over ``num_salts`` buckets, then an Arrow C++ join per bucket on
    [key, salt]. Result rows identical to ``shuffle_join``.
    """
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        agg = batch.select([key]).group_by(key).aggregate([([], "count_all")])
        return pa.table({key: agg[key], "__c": agg["count_all"].cast(pa.int64())})

    hot_t = (
        ds_fact.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("__c", alias_name="n"))
        .filter(expr=f"n >= {int(hot_count_threshold)}")
        .take_all()
    )
    hot_keys = pa.array([r[key] for r in hot_t])
    hot_ref = ray.put(hot_keys)

    def salt_fact(batch: pa.Table) -> pa.Table:
        base = batch.select([key] + fact_cols)
        hot = pc.is_in(batch[key], value_set=ray.get(hot_ref)).to_numpy(
            zero_copy_only=False
        )
        s = (
            batch[salt_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
            % num_salts
        )
        return base.append_column("__salt", pa.array(np.where(hot, s, 0)))

    def explode_dim(batch: pa.Table) -> pa.Table:
        base = batch.select([key] + dim_cols)
        hot = pc.is_in(batch[key], value_set=ray.get(hot_ref))
        cold = base.filter(pc.invert(hot))
        cold = cold.append_column(
            "__salt", pa.array(np.zeros(cold.num_rows, np.int64))
        )
        hot_rows = base.filter(hot)
        reps = [
            hot_rows.append_column(
                "__salt", pa.array(np.full(hot_rows.num_rows, s, np.int64))
            )
            for s in range(num_salts)
        ]
        return pa.concat_tables([cold] + reps)

    def per_bucket(group: pa.Table) -> pa.Table:
        side = group["__side"]
        left = group.filter(pc.equal(side, 0)).select([key, "__salt"] + fact_cols)
        right = group.filter(pc.equal(side, 1)).select([key, "__salt"] + dim_cols)
        return left.join(right, keys=[key, "__salt"], join_type=how).drop_columns(
            ["__salt"]
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        kv = batch[key].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        sv = batch["__salt"].combine_chunks().to_numpy(zero_copy_only=False)
        # salt perturbs the mix input so a hot key's salts hit distinct
        # buckets; the canonical bucket_mix keeps cold routing aligned
        comb = kv.view(np.uint64) + sv.view(np.uint64) * np.uint64(0xD6E8FEB86659FD93)
        return batch.append_column(
            "__bucket", pa.array(bucket_mix(comb, num_buckets))
        )

    lf = ds_fact.map_batches(salt_fact, batch_format="pyarrow")
    rf = ds_dim.map_batches(explode_dim, batch_format="pyarrow")
    tagged = tag_union(lf, rf, key).map_batches(add_bucket, batch_format="pyarrow")
    return hash_map_groups(tagged, "__bucket", per_bucket)


def kmv_distinct(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    *,
    k: int = 64,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Approximate COUNT(DISTINCT value) per group via a KMV (k minimum
    hash values) sketch — the classic mergeable distinct-count sketch
    (Bar-Yossef et al. 2002). Deterministic (md5-based ``hash64``), so
    the estimate is SQL-replayable exactly.

    Map-side combine: each batch keeps the <= k smallest DISTINCT
    (group, hash) pairs per group it sees, so the shuffle carries
    <= k * groups-per-batch rows regardless of input size. One bounded-
    bucket shuffle, then per bucket: a global dedup + k-smallest merge
    (union of per-batch bottom-k sets contains the true global bottom-k)
    and the estimator — if the merged sketch holds < k distinct hashes
    every batch kept ALL its values, so the count is EXACT; otherwise
    est = floor((k-1) * 2^63 / h_k + 0.5) with h_k the k-th smallest.
    """
    from ..functions.hashing import hash64

    m_range = float(1 << 63)
    sort_keys = [(group_col, "ascending"), ("__hv", "ascending")]

    def dedup_runs(t: pa.Table):
        """Sorted table -> (taken, g codes, hv, keep-first mask applied)."""
        taken = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        g = (
            taken[group_col]
            .combine_chunks()
            .dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
        )
        hv = taken["__hv"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(g), dtype=bool)
        keep[1:] = (g[1:] != g[:-1]) | (hv[1:] != hv[:-1])
        return taken.filter(pa.array(keep)), g[keep], hv[keep]

    def local(batch: pa.Table) -> pa.Table:
        # distinct (group, value) first: hash only distinct values
        tb = batch.select([group_col, value_col]).group_by(
            [group_col, value_col]
        ).aggregate([])
        hv = np.fromiter(
            (hash64(str(v)) for v in tb[value_col].to_pylist()),
            dtype=np.int64,
            count=tb.num_rows,
        )
        t = pa.table({group_col: tb[group_col], "__hv": pa.array(hv)})
        taken, g, _hv = dedup_runs(t)
        first = np.ones(len(g), dtype=bool)
        first[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(first)
        pos = np.arange(len(g)) - starts[(np.cumsum(first) - 1)]
        return taken.filter(pa.array(pos < k))

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__bucket", _bucket_of(t[group_col], num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        taken, g, hv = dedup_runs(t.drop_columns(["__bucket"]))
        first = np.ones(len(g), dtype=bool)
        first[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(g)))
        est = counts.astype(np.float64)
        full = counts >= k
        kth = hv[starts[full] + (k - 1)].astype(np.float64)
        est[full] = np.floor((k - 1) * m_range / kth + 0.5)
        return pa.table(
            {
                group_col: pc.take(taken[group_col], pa.array(starts)),
                "est_distinct": pa.array(est.astype(np.int64)),
            }
        )

    return hash_map_groups(
        ds.map_batches(local, batch_format="pyarrow").map_batches(
            add_bucket, batch_format="pyarrow"
        ),
        "__bucket",
        per_bucket,
    )


def zip_with_index(
    ds: rd.Dataset,
    sort_keys: list[str],
    *,
    out_cols: list[str] | None = None,
    idx_col: str = "row_idx",
) -> rd.Dataset:
    """Global row numbering over a totally-ordered dataset (Spark's
    ``zipWithIndex``; the reference numbers rows only driver-side in
    ``collect`` order). ONE range-partitioning sort, then a
    metadata-only distributed prefix-sum: per-block counts come back to
    the driver (one int + one first-key tuple per block — never rows),
    offsets are cumulative sums, and one task per block appends
    ``offset + local_position``. No second shuffle.

    ``sort_keys`` must totally order the rows (ties across block
    boundaries would make the numbering partition-dependent).
    """
    sorted_ds = ds.sort(sort_keys)
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def block_meta(t):
        if isinstance(t, pa.RecordBatch):
            t = pa.Table.from_batches([t])
        if t.num_rows == 0:
            return 0, None
        return t.num_rows, tuple(t[c][0].as_py() for c in sort_keys)

    metas = ray.get([block_meta.remote(r) for r in refs])
    blocks = sorted(
        (
            (first, count, ref)
            for (count, first), ref in zip(metas, refs)
            if count > 0
        ),
        key=lambda b: b[0],  # ranges are disjoint: first key orders blocks
    )
    offsets = np.concatenate(([0], np.cumsum([c for _f, c, _r in blocks])))[:-1]

    @ray.remote
    def assign(t, off: int):
        if isinstance(t, pa.RecordBatch):
            t = pa.Table.from_batches([t])
        out = t.select(out_cols) if out_cols else t
        return out.append_column(
            idx_col, pa.array(np.arange(off, off + t.num_rows, dtype=np.int64))
        )

    new_refs = [
        assign.remote(ref, int(off)) for (_f, _c, ref), off in zip(blocks, offsets)
    ]
    return rd.from_arrow_refs(new_refs)


def watermark_window_counts(
    ds: rd.Dataset,
    *,
    order_col: str | list[str] = "event_id",
    ts_col: str = "ts",
    window_s: int = 3600,
    delay_s: int = 600,
) -> rd.Dataset:
    """STREAMING WATERMARK semantics replayed over a batch table — the
    late-data rule of an event-time stream processor, deterministic and
    SQL-replayable: events arrive in ``order_col`` order; the watermark
    after each arrival is the running max event time minus nothing (the
    raw high-water mark); an event is LATE — excluded from its window's
    on-time count — iff it arrives more than ``delay_s`` behind the
    high-water mark (``running_max(ts) - ts > delay_s``). Tumbling
    ``window_s`` windows report (window_start_s, n_on_time, n_late).

    The running max over arrival order is inherently sequential, but
    distributes exactly like ``zip_with_index``'s prefix sum: ONE
    range-partitioning sort on the arrival column, per-block max event
    times back to the driver (one int per block — never rows), an
    exclusive prefix-max as each block's carry-in, then one task per
    block computes its local cummax + flags + per-window partial
    counts; partials sum associatively."""
    from ray.data.aggregate import Sum

    us = 1_000_000
    win_us = int(window_s) * us
    delay_us = int(delay_s) * us
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)

    sorted_ds = ds.select_columns(order_cols + [ts_col]).sort(order_cols)
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def block_meta(t):
        if isinstance(t, pa.RecordBatch):
            t = pa.Table.from_batches([t])
        if t.num_rows == 0:
            return 0, None, None
        micros = (
            t[ts_col]
            .combine_chunks()
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        first = tuple(t[c][0].as_py() for c in order_cols)
        return t.num_rows, first, int(micros.max())

    metas = ray.get([block_meta.remote(r) for r in refs])
    blocks = sorted(
        (
            (first, mx, ref)
            for (count, first, mx), ref in zip(metas, refs)
            if count > 0
        ),
        key=lambda b: b[0],  # sort ranges are disjoint on order_col
    )
    # exclusive prefix max: carry-in watermark basis for each block
    carries = []
    cur = np.iinfo(np.int64).min
    for _f, mx, _r in blocks:
        carries.append(cur)
        cur = max(cur, mx)

    @ray.remote
    def count_block(t, carry: int) -> pa.Table:
        if isinstance(t, pa.RecordBatch):
            t = pa.Table.from_batches([t])
        micros = (
            t[ts_col]
            .combine_chunks()
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        run_max = np.maximum(np.maximum.accumulate(micros), carry)
        late = (run_max - micros) > delay_us
        win = (micros // win_us) * int(window_s)
        part = pa.table(
            {
                "window_start_s": pa.array(win),
                "n_on_time": pa.array((~late).astype(np.int64)),
                "n_late": pa.array(late.astype(np.int64)),
            }
        )
        agg = part.group_by(["window_start_s"]).aggregate(
            [("n_on_time", "sum"), ("n_late", "sum")]
        )
        return pa.table(
            {
                "window_start_s": agg["window_start_s"],
                "n_on_time": agg["n_on_time_sum"].cast(pa.int64()),
                "n_late": agg["n_late_sum"].cast(pa.int64()),
            }
        )

    parts = [
        count_block.remote(ref, int(c)) for (_f, _m, ref), c in zip(blocks, carries)
    ]

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start_s": batch["window_start_s"],
                "n_on_time": batch["n_on_time"].cast(pa.int64()),
                "n_late": batch["n_late"].cast(pa.int64()),
            }
        )

    return (
        rd.from_arrow_refs(parts)
        .groupby("window_start_s")
        .aggregate(
            Sum("n_on_time", alias_name="n_on_time"),
            Sum("n_late", alias_name="n_late"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def hash_split(
    ds: rd.Dataset,
    key_col: str,
    fractions: dict[str, float],
    *,
    out_col: str = "split",
) -> rd.Dataset:
    """Deterministic dataset split (train/val/test) by key hash — the
    standard leakage-safe split of a training corpus: the SAME key
    always lands in the same split, on any cluster size or partitioning
    (``hash64`` of the stringified key against cumulative fraction
    thresholds over [0, 2^63)). A pure ``map_batches`` — no shuffle, no
    RNG, no driver state; the md5-prefix hash is replayed exactly in
    SQL (the ``rel_group_sample`` oracle pattern).

    ``fractions`` maps split name -> fraction; must sum to 1. Split
    boundaries are ``floor(cum_frac * 2^63)`` in ITERATION order.
    """
    from ..functions.hashing import hash64

    names = list(fractions)
    fr = np.array([fractions[k] for k in names], dtype=np.float64)
    if abs(fr.sum() - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {fr.sum()}")
    bounds = np.floor(np.cumsum(fr) * float(1 << 63)).astype(np.uint64)
    bounds[-1] = np.uint64(1 << 63)  # guard: top split closed under fp error
    names_arr = pa.array(names, pa.string())

    def assign(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # hash only DISTINCT keys (dictionary encode), then gather
        d = col.cast(pa.string()).dictionary_encode()
        hv = np.fromiter(
            (hash64(v) for v in d.dictionary.to_pylist()),
            dtype=np.uint64,
            count=len(d.dictionary),
        )
        idx = np.searchsorted(bounds, hv, side="right")
        codes = d.indices.to_numpy(zero_copy_only=False)
        return batch.append_column(
            out_col, names_arr.take(pa.array(idx[codes].astype(np.int64)))
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def budget_sample_per_group(
    ds: rd.Dataset,
    group_col: str,
    weight_col: str,
    id_col: str,
    budget: int,
    *,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Token/char-budget sampling per group — the domain-MIXING step of
    training-data prep (pick documents per source until each source hits
    its budget, deterministically): order each group by (hash64(id), id)
    and keep the prefix whose running weight sum stays <= budget
    (inclusive rule, same as the SQL twin's windowed ``sum ... ROWS
    UNBOUNDED PRECEDING <= budget``).

    Deterministic and partitioning-invariant: the priority is the
    md5-prefix hash64 of the id (replayable in SQL — the
    ``rel_group_sample`` discipline), not arrival order. One hash
    shuffle on the group key; the per-group callback is one lexsort +
    cumsum (group cardinality = #domains, bounded by construction in a
    mixing config — this is NOT a data-cardinality key)."""
    from ..functions.hashing import hash64_array

    def add_h(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = hash64_array(str(v) for v in ids.to_pylist())
        return t.append_column("_h", pa.array(h))

    def pick(g: pa.Table) -> pa.Table:
        h = g["_h"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        w = g[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, h))
        keep = order[np.cumsum(w[order]) <= budget]
        return g.take(pa.array(np.sort(keep))).drop_columns(["_h"])

    from .shuffle import hash_map_groups

    return hash_map_groups(
        ds.map_batches(add_h, batch_format="pyarrow"),
        group_col,
        pick,
        num_partitions=num_partitions,
    )


# --------------------------------------------------------------------------
# Bloom-pruned join
# --------------------------------------------------------------------------

_BLOOM_M1 = np.uint64(0xFF51AFD7ED558CCD)
_BLOOM_M2 = np.uint64(0xC4CEB9FE1A85EC53)


def _bloom_positions(v: np.ndarray, nbits: int, k: int) -> np.ndarray:
    """(n, k) bit positions for int64 keys — double hashing over two
    independent 64-bit mixes (Kirsch-Mitzenmacher), all vectorized."""
    u = v.astype(np.int64).view(np.uint64)
    h1 = u * _BLOOM_M1
    h1 ^= h1 >> np.uint64(33)
    h2 = u * _BLOOM_M2
    h2 ^= h2 >> np.uint64(29)
    h2 |= np.uint64(1)  # odd => all k probes distinct mod a power of two
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(nbits)


def bloom_filter_build(ds: rd.Dataset, key: str, *, nbits: int, k: int):
    """Distributed Bloom-filter build over an int64 key column.

    Each input block folds its keys into ONE fixed-size bitset row
    (nbits/8 bytes); the driver ORs the per-block bitsets — driver
    memory is O(nbits x blocks) worst case but each row is tiny and
    independent of row count. Returns the ``ray.put`` ref of the
    packed uint64 bitset."""
    nwords = (nbits + 63) // 64

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[key].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        pos = _bloom_positions(v, nbits, k).ravel()
        bits = np.zeros(nwords, np.uint64)
        np.bitwise_or.at(bits, pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    merged = np.zeros(nwords, np.uint64)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged |= np.frombuffer(row["bits"], np.uint64)
    return ray.put(merged)


def bloom_join(
    ds_fact: rd.Dataset,
    ds_dim: rd.Dataset,
    key: str,
    *,
    fact_cols: list[str],
    dim_cols: list[str],
    nbits: int = 1 << 22,
    k: int = 4,
    num_buckets: int = 64,
    how: str = "inner",
) -> rd.Dataset:
    """``shuffle_join`` with BLOOM-FILTER semi-join pruning — the
    classic exchange-volume reducer the reference lacks entirely (its
    join ships every fact row through the KVS shuffle regardless of
    whether the key exists on the build side,
    ``flame/FlameWorker.java:491-544``).

    Plan: (1) fold the dim side's keys into one nbits-wide Bloom
    bitset (one tiny row per block, OR-merged on the driver — O(nbits),
    never O(rows)); (2) broadcast it via ``ray.put`` ONCE; (3) each
    fact batch tests its keys vectorized against the bitset and drops
    definite non-matches BEFORE the all-to-all exchange; (4) the
    surviving rows run the ordinary bucketed Arrow join. False
    positives only ship extra rows into the join, which drops them —
    the result is row-identical to ``shuffle_join`` for any nbits/k.
    Inner/semi pruning only (an outer fact side must keep every row).
    """
    if how not in ("inner",):
        raise ValueError("bloom pruning is sound for inner joins only")
    bloom_ref = bloom_filter_build(ds_dim, key, nbits=nbits, k=k)

    def prune(batch: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        v = batch[key].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        pos = _bloom_positions(v, nbits, k)
        hit = (bits[(pos >> np.uint64(6))] >> (pos & np.uint64(63))) & np.uint64(1)
        return batch.filter(pa.array(hit.all(axis=1)))

    pruned = ds_fact.map_batches(prune, batch_format="pyarrow")
    return shuffle_join(
        pruned,
        ds_dim,
        key,
        left_cols=fact_cols,
        right_cols=dim_cols,
        num_buckets=num_buckets,
        how=how,
    )


# --------------------------------------------------------------------------
# Weighted sampling + heavy hitters
# --------------------------------------------------------------------------


def weighted_sample(
    ds: rd.Dataset,
    *,
    id_col: str,
    weight_col: str,
    n: int,
    cols: list[str] | None = None,
) -> rd.Dataset:
    """Deterministic weighted sample of ``n`` rows WITHOUT replacement
    — sequential Poisson / order sampling (Ohlsson 1998): each row gets
    priority ``hash64(id) // weight`` (uniform 63-bit hash divided by
    its positive integer weight, EXACT integer arithmetic so the draw
    replays bit-for-bit in SQL) and the global ``n`` smallest
    priorities win; heavier rows draw systematically smaller priorities
    (inclusion probability ~ proportional to weight).

    Distributed as a top-n combiner: each block keeps its local ``n``
    best rows (vectorized argpartition-equivalent via one sort+slice),
    survivors collapse to one partition for the exact final cut — the
    exchange carries at most ``n x blocks`` rows, never the input.

    The reference's only sampler is the crawler's uniform URL sample;
    weighted selection (quality- or length-weighted corpus subsetting)
    is a training-data-prep staple the reference has no analog for.
    """
    from ..functions.hashing import hash64_array

    keep = cols if cols is not None else [c for c in ds.schema().names]

    def local_topn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        h = hash64_array(str(v) for v in ids.to_pylist())
        w = batch[weight_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        if (w <= 0).any():
            raise ValueError("weights must be positive integers")
        prio = h // w
        t = batch.select(keep).append_column("__prio", pa.array(prio))
        idv = ids.cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((idv, prio))[:n]
        return t.take(pa.array(np.sort(order)))

    def final_topn(batch: pa.Table) -> pa.Table:
        prio = batch["__prio"].combine_chunks().to_numpy(zero_copy_only=False)
        idv = batch[id_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((idv, prio))[:n]
        return batch.take(pa.array(np.sort(order))).drop_columns(["__prio"])

    local = ds.map_batches(local_topn, batch_format="pyarrow")
    return local.repartition(1).map_batches(
        final_topn, batch_format="pyarrow", batch_size=None
    )


_HH_TOTAL_KEY = "\x00__total__"


def heavy_hitters(
    make_partials: Callable[[], rd.Dataset],
    key: str,
    count: str,
    *,
    threshold_fraction: float,
    capacity: int | None = None,
) -> rd.Dataset:
    """EXACT frequent-item detection in two passes — Misra-Gries
    candidate generation then an exact recount — without ever shuffling
    the full key space (the reference computes term frequencies only
    via its full index shuffle; there is no cheap frequent-term path).

    ``make_partials`` builds a Dataset of per-batch pre-aggregated
    ``(key, count)`` rows (called twice — once per pass; cache upstream
    if the flattening is expensive). Returns rows ``(key, cf)`` for
    every key with total count >= ceil(threshold_fraction * N).

    Pass 1 trims each batch's counts to ``capacity`` counters by the
    Misra-Gries decrement (subtract the (c+1)-th largest count, drop
    non-positive — vectorized via one np.partition): per-batch error
    <= n_b/(c+1), summed error < N/(c+1) <= threshold once
    ``capacity >= 1/threshold_fraction``, so NO true heavy hitter can
    be trimmed to zero everywhere — the surviving key set is a
    guaranteed superset. A sentinel row per batch carries the batch
    total so N needs no extra pass. Pass 2 broadcasts the candidate
    set and recounts it exactly (vocabulary bounded by the candidates,
    not the data).
    """
    from ray.data.aggregate import Sum

    if not (0 < threshold_fraction < 1):
        raise ValueError("threshold_fraction must be in (0, 1)")
    c = capacity or 2 * math.ceil(1.0 / threshold_fraction)

    def mg_trim(batch: pa.Table) -> pa.Table:
        v = batch[count].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        total = int(v.sum())
        kcol = batch[key].combine_chunks()
        if len(v) > c:
            kth = np.partition(v, len(v) - (c + 1))[len(v) - (c + 1)]
            keepmask = v > kth
            v = v[keepmask] - kth
            kcol = kcol.filter(pa.array(keepmask))
        return pa.table(
            {
                key: pa.concat_arrays([kcol, pa.array([_HH_TOTAL_KEY], kcol.type)]),
                "__c": pa.array(np.concatenate([v, [total]])),
            }
        )

    summed = (
        make_partials()
        .map_batches(mg_trim, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("__c", alias_name="mg"))
        .take_all()
    )
    n_total = 0
    cand: list = []
    for row in summed:
        if row[key] == _HH_TOTAL_KEY:
            n_total = int(row["mg"])
        else:
            cand.append(row[key])
    threshold = math.ceil(threshold_fraction * n_total)
    cand_ref = ray.put(pa.array(cand))

    def keep_candidates(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[key], value_set=ray.get(cand_ref))
        t = batch.filter(mask)
        return pa.table({key: t[key], "__c": t[count].cast(pa.int64())})

    return (
        make_partials()
        .map_batches(keep_candidates, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("__c", alias_name="cf"))
        .filter(expr=f"cf >= {int(threshold)}")
    )


def winsorized_sum(
    ds_factory: Callable[[], rd.Dataset],
    group_col: str,
    value_col: str,
    *,
    lo: float = 0.05,
    hi: float = 0.95,
    scale: int = 100,
) -> rd.Dataset:
    """Per-group WINSORIZED aggregate — the robust-statistics clip that
    keeps a corrupted tail (scraper glitches, bot bursts) from owning a
    mean: exact per-group [lo, hi] discrete quantiles via the
    distributed-histogram kernel (``grouped_quantiles`` — histogram
    rows shuffle, never data rows), the tiny per-group clip bounds
    broadcast ONCE via ``ray.put``, then one streaming clip + partial
    sum pass. All arithmetic on quantized int64 (sum_clipped is exact;
    divide client-side for the mean). Output: group, p-lo, p-hi,
    n_rows, sum_clipped_e<k>.

    ``ds_factory`` builds the input Dataset (called twice: once for the
    quantile pass, once for the clip pass — the standard two-pass
    robust aggregate; cache upstream if the scan is expensive)."""
    exp = len(str(scale)) - 1
    pnames = [f"p{q * 100:g}_e{exp}".replace(".", "_") for q in (lo, hi)]
    bounds = grouped_quantiles(
        ds_factory(), group_col, value_col, qs=(lo, hi), scale=scale
    ).take_all()
    btab = pa.table(
        {
            group_col: pa.array([r[group_col] for r in bounds]),
            "__lo": pa.array([r[pnames[0]] for r in bounds], pa.int64()),
            "__hi": pa.array([r[pnames[1]] for r in bounds], pa.int64()),
        }
    )
    bref = ray.put(btab)

    def clip_partial(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        v = pc.round(
            pc.multiply(t[value_col], float(scale)),
            round_mode="half_towards_infinity",
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        idx = pc.index_in(t[group_col], value_set=b[group_col].combine_chunks())
        iv = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        lo_v = b["__lo"].to_numpy(zero_copy_only=False)[iv]
        hi_v = b["__hi"].to_numpy(zero_copy_only=False)[iv]
        clipped = np.clip(v, lo_v, hi_v)
        pt = pa.table(
            {
                group_col: t[group_col],
                "__c": pa.array(clipped),
                "__lo": pa.array(lo_v),
                "__hi": pa.array(hi_v),
            }
        )
        return (
            pt.group_by([group_col, "__lo", "__hi"])
            .aggregate([("__c", "sum"), ([], "count_all")])
            .rename_columns([group_col, "__lo", "__hi", "__s", "__n"])
        )

    from ray.data.aggregate import Max, Sum

    agg = (
        ds_factory()
        .map_batches(clip_partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(
            Max("__lo", alias_name=pnames[0]),
            Max("__hi", alias_name=pnames[1]),
            Sum("__n", alias_name="n_rows"),
            Sum("__s", alias_name=f"sum_clipped_e{exp}"),
        )
    )
    return agg


def pack_sequence_spans(
    ds: rd.Dataset,
    *,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    eos_tokens: int = 1,
) -> rd.Dataset:
    """Sequence packing for LLM training-data prep: tokenize every
    document with the canonical tokenizer, append ``eos_tokens``
    separator tokens per document, concatenate the streams in ascending
    ``id_col`` order, and split the concatenation into fixed
    ``seq_len``-token training chunks. Returns the doc->chunk span map,
    one row per (document, chunk) intersection:

      ``doc_id``    document key
      ``chunk_id``  global 0-based chunk index
      ``chunk_pos`` this span's start offset INSIDE the chunk
      ``n_tok``     tokens of this doc (incl. its EOS) in this chunk

    A writer holding the span map can assemble every training chunk
    with one doc-store range fetch per span — the map itself is the
    shuffle-free scale artifact (what Megatron/GPT-style loaders call
    the sample index).

    Scale shape: the tokenize-count stage is the vectorized
    ``tokenize_count_batch`` kernel over ``map_batches`` emitting a
    narrow (id, n) table (~16 B/doc); the global token offset is the
    ``zip_with_index`` metadata-only prefix-sum (ONE range sort of the
    narrow table, per-block token SUMS to the driver — one int64 per
    block, never rows); span expansion is one vectorized task per
    block. Nothing materializes the corpus, and the text column never
    moves through the sort.
    """
    from ..functions.tokenize import tokenize_count_batch

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    def count_batch(t: pa.Table) -> pa.Table:
        _terms, _tfs, doc_lens = tokenize_count_batch(t[text_col])
        return pa.table(
            {
                id_col: t[id_col],
                "__n": pa.array(doc_lens + eos_tokens, pa.int64()),
            }
        )

    narrow = ds.map_batches(count_batch, batch_format="pyarrow")
    sorted_ds = narrow.sort(id_col)
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def block_meta(t):
        if isinstance(t, pa.RecordBatch):
            t = pa.Table.from_batches([t])
        if t.num_rows == 0:
            return 0, None
        return int(pc.sum(t["__n"]).as_py()), t[id_col][0].as_py()

    metas = ray.get([block_meta.remote(r) for r in refs])
    blocks = sorted(
        ((first, tok, ref) for (tok, first), ref in zip(metas, refs) if tok > 0),
        key=lambda b: b[0],  # sort ranges are disjoint: first key orders blocks
    )
    tok_offsets = np.concatenate(([0], np.cumsum([c for _f, c, _r in blocks])))[:-1]

    @ray.remote
    def expand(t, off: int):
        if isinstance(t, pa.RecordBatch):
            t = pa.Table.from_batches([t])
        n = t["__n"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = off + np.concatenate(([0], np.cumsum(n)))[:-1]
        e = s + n
        c0 = s // seq_len
        spans = (e - 1) // seq_len - c0 + 1
        rep = np.repeat(np.arange(len(n)), spans)
        span_starts = np.concatenate(([0], np.cumsum(spans)))[:-1]
        seq = np.arange(int(spans.sum())) - np.repeat(span_starts, spans)
        cid = c0[rep] + seq
        lo = np.maximum(cid * seq_len, s[rep])
        hi = np.minimum((cid + 1) * seq_len, e[rep])
        return pa.table(
            {
                id_col: pa.array(ids[rep]),
                "chunk_id": pa.array(cid),
                "chunk_pos": pa.array(lo - cid * seq_len),
                "n_tok": pa.array(hi - lo),
            }
        )

    new_refs = [
        expand.remote(ref, int(off)) for (_f, _c, ref), off in zip(blocks, tok_offsets)
    ]
    return rd.from_arrow_refs(new_refs)


def running_totals(
    ds: rd.Dataset,
    key: str,
    order_keys: list[str],
    value_col: str,
    *,
    id_cols: list[str],
    num_buckets: int = 64,
) -> rd.Dataset:
    """Per-key running window functions — SQL's ``SUM() OVER
    (PARTITION BY key ORDER BY ...)`` + ``LAG()`` delta, the per-entity
    cumulative-state operator the reference cannot express (Flame has
    no ordered window surface at all; the closest it gets is the
    driver-side sort in ``search/Searcher.java:164-166``).

    Exact-integer contract: ``value_col`` (double) is e2-quantized per
    ROW first, so running sums are int64 and hash-reproducible in SQL
    regardless of accumulation order. Physical plan: one bounded
    key-bucket hash shuffle (never per-key groups), then ONE vectorized
    multi-key sort per bucket with segmented cumsum / shifted diff
    across ALL keys of the bucket. A key's rows never span buckets, so
    per-bucket results are final — no second pass.
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__bucket", _bucket_of(t[key], num_buckets))

    def per_bucket(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g,
            sort_keys=[(key, "ascending")] + [(c, "ascending") for c in order_keys],
        )
        t = g.take(idx)
        k = t[key].to_numpy(zero_copy_only=False)
        v = np.rint(t[value_col].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        new_seg = np.ones(v.size, dtype=bool)
        new_seg[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new_seg)
        counts = np.diff(np.append(starts, v.size))
        cs = np.cumsum(v)
        base = np.where(starts > 0, cs[starts - 1], 0)
        run = cs - np.repeat(base, counts)
        prev = np.empty_like(v)
        prev[1:] = v[:-1]
        delta = v - prev
        cols = {c: t[c] for c in id_cols}
        cols["val_e2"] = pa.array(v)
        cols["run_e2"] = pa.array(run)
        cols["delta_e2"] = pa.array(np.where(new_seg, 0, delta), mask=new_seg)
        return pa.table(cols)

    narrow = ds.select_columns(
        list(dict.fromkeys(id_cols + [key] + order_keys + [value_col]))
    ).map_batches(add_bucket, batch_format="pyarrow")
    return hash_map_groups(narrow, "__bucket", per_bucket)


def hopping_window_counts(
    ds: rd.Dataset,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    window_s: int = 7200,
    hop_s: int = 3600,
) -> rd.Dataset:
    """HOPPING (sliding) event-time windows — the overlapping-window
    aggregate the reference has no streaming surface for at all
    (SURVEY §2.6: no windows/watermarks). Each event lands in
    ``window_s / hop_s`` overlapping windows; per window report
    (n_events, exact e2-quantized value sum).

    Physical plan: one vectorized per-batch expansion (np.repeat — a
    row fans out to its k windows BEFORE the exchange, so the shuffle
    key is the bounded window start, never the event), then Ray's
    partial+final combine ``groupby().aggregate`` — the map-side
    expansion is the only extra cost over a tumbling window and the
    exchange carries one partial per (block, window)."""
    from ray.data.aggregate import Count, Sum

    assert window_s % hop_s == 0, "window must be a multiple of the hop"
    k = window_s // hop_s

    def expand(t: pa.Table) -> pa.Table:
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = np.rint(t[value_col].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        hop = (ts // 1_000_000) // hop_s  # event's hop slot
        rep_hop = np.repeat(hop, k)
        off = np.tile(np.arange(k, dtype=np.int64), ts.size)
        return pa.table(
            {
                "window_start_s": pa.array((rep_hop - off) * hop_s),
                "val_e2": pa.array(np.repeat(v, k)),
            }
        )

    agg = (
        ds.select_columns([ts_col, value_col])
        .map_batches(expand, batch_format="pyarrow")
        .groupby("window_start_s")
        .aggregate(Count(alias_name="n_events"), Sum("val_e2", alias_name="sum_val_e2"))
    )
    return agg


def profile_columns(
    ds_factory: Callable[[], rd.Dataset], cols: list[str], *, num_buckets: int = 64
) -> pa.Table:
    """Data profiling (the ANALYZE primitive): per column, exact
    (n_rows, n_nulls, ndv, min, max) — table statistics a planner or a
    data-quality gate reads; nothing in the reference surfaces any
    table metadata beyond ``count`` (``KVSClient.java:292-308``).

    ONE streaming pass computes per-batch (col, n, nulls, min, max)
    partial rows for ALL columns at once, combined by an associative
    groupby(col) (the exchange carries len(cols) rows per block, never
    data); exact NDV runs one ``distinct_on`` bounded-bucket dedup +
    count action per column (unique values only cross the wire, after
    a per-batch combiner). Doubles are e2-quantized before min/max/ndv
    so every statistic is integer-exact and SQL-replayable. The result
    is one row per column — driver-side assembly of len(cols) rows,
    not data."""
    from ray.data.aggregate import Max, Min, Sum

    def canon(arr: pa.ChunkedArray):
        """column -> (int64-or-string array, is_str)."""
        if pa.types.is_floating(arr.type):
            v = pa.array(
                np.rint(arr.to_numpy(zero_copy_only=False) * 100).astype(np.int64),
                mask=np.asarray(
                    pc.is_null(arr).combine_chunks().to_numpy(zero_copy_only=False)
                ),
            )
            return v, False
        if pa.types.is_integer(arr.type):
            return arr.cast(pa.int64()).combine_chunks(), False
        return arr.cast(pa.string()).combine_chunks(), True

    def partials(batch: pa.Table) -> pa.Table:
        out = {
            "col": [], "n": [], "nulls": [],
            "min_int": [], "max_int": [], "min_str": [], "max_str": [],
        }
        for c in cols:
            v, is_str = canon(batch[c])
            mm = pc.min_max(v)
            out["col"].append(c)
            out["n"].append(batch.num_rows)
            out["nulls"].append(batch[c].null_count)
            out["min_int"].append(None if is_str else mm["min"].as_py())
            out["max_int"].append(None if is_str else mm["max"].as_py())
            out["min_str"].append(mm["min"].as_py() if is_str else None)
            out["max_str"].append(mm["max"].as_py() if is_str else None)
        return pa.table(
            {
                "col": pa.array(out["col"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                "nulls": pa.array(out["nulls"], pa.int64()),
                "min_int": pa.array(out["min_int"], pa.int64()),
                "max_int": pa.array(out["max_int"], pa.int64()),
                "min_str": pa.array(out["min_str"], pa.string()),
                "max_str": pa.array(out["max_str"], pa.string()),
            }
        )

    agg_rows = {
        r["col"]: r
        for r in (
            ds_factory()
            .map_batches(partials, batch_format="pyarrow")
            .groupby("col")
            .aggregate(
                Sum("n", alias_name="n_rows"),
                Sum("nulls", alias_name="n_nulls"),
                Min("min_int", alias_name="min_int"),
                Max("max_int", alias_name="max_int"),
                Min("min_str", alias_name="min_str"),
                Max("max_str", alias_name="max_str"),
            )
            .take_all()
        )
    }

    # ONE exchange for every column's exact NDV: per-batch local dedup
    # of (col, canonical-value-string) pairs, then the bounded-bucket
    # count-distinct kernel (string casts touch block-unique values
    # only, after the combiner)
    def tag_values(t: pa.Table) -> pa.Table:
        outs = []
        for c in cols:
            v, is_str = canon(t[c])
            vs = v if is_str else pc.cast(v, pa.string())
            one = pa.table(
                {"col": pa.array([c] * len(vs), pa.string()), "v": vs}
            )
            one = one.filter(pc.is_valid(one["v"]))
            outs.append(one.group_by(["col", "v"]).aggregate([]))
        return pa.concat_tables(outs)

    ndv_rows = {
        r["col"]: int(r["n_distinct"])
        for r in grouped_count_distinct(
            ds_factory().map_batches(tag_values, batch_format="pyarrow"),
            "col",
            "v",
            num_buckets=num_buckets,
        ).take_all()
    }

    rows = []
    for c in cols:
        ndv = ndv_rows.get(c, 0)
        s = agg_rows[c]
        rows.append(
            {
                "col": c,
                "n_rows": int(s["n_rows"]),
                "n_nulls": int(s["n_nulls"]),
                "ndv": int(ndv),
                "min_int": s["min_int"],
                "max_int": s["max_int"],
                "min_str": s["min_str"],
                "max_str": s["max_str"],
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("col", pa.string()),
                ("n_rows", pa.int64()),
                ("n_nulls", pa.int64()),
                ("ndv", pa.int64()),
                ("min_int", pa.int64()),
                ("max_int", pa.int64()),
                ("min_str", pa.string()),
                ("max_str", pa.string()),
            ]
        ),
    )


def hll_registers(
    ds: rd.Dataset,
    col: str,
    *,
    b: int = 8,
) -> rd.Dataset:
    """HyperLogLog registers (Flajolet et al. 2007) for COUNT DISTINCT
    of ``col`` — the constant-memory cardinality sketch next to the KMV
    one (``approx_distinct_kmv``): 2^b integer registers regardless of
    cardinality, merged by per-bucket MAX (fully associative — the
    union of two sketches is their elementwise max, which is what makes
    this THE distributed distinct sketch).

    The register table (bucket, max_rho) IS the output — integers, so
    the SQL twin replays it bit-for-bit from the same md5-based
    ``hash64``; the float estimator (alpha_m * m^2 / sum 2^-M with
    linear-counting small-range correction) is ``hll_estimate`` below,
    tested against exact distinct counts in pytest rather than
    hash-compared (float association differs across engines).

    Per batch: one vectorized unique, then per-DISTINCT-value C-speed
    md5 + bit_length (bounded by the batch's distinct count); the only
    shuffle is the 2^b-group register max."""
    from ray.data.aggregate import Max

    from ..functions.hashing import hash64

    m = 1 << b
    wbits = 63 - b

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_numpy(zero_copy_only=False)
        uniq = np.unique(vals)
        regs = np.zeros(m, np.int64)
        for v in uniq.tolist():
            h = hash64(str(v))
            bucket = h % m
            w = h >> b
            rho = (wbits + 1) if w == 0 else (wbits + 1 - w.bit_length())
            if rho > regs[bucket]:
                regs[bucket] = rho
        nz = np.flatnonzero(regs)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64)),
                "max_rho": pa.array(regs[nz]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Max("max_rho", alias_name="max_rho"))
    )


def hll_estimate(buckets: np.ndarray, max_rho: np.ndarray, *, b: int = 8) -> float:
    """The HLL cardinality estimate from a register table (empty
    registers implied zero): alpha_m * m^2 / sum(2^-M_j), with the
    standard linear-counting correction when the estimate is small and
    registers remain empty."""
    m = 1 << b
    regs = np.zeros(m, np.float64)
    regs[buckets] = max_rho
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def grouped_corr(
    ds: rd.Dataset, keys: list[str], x: str, y: str
) -> pa.Table:
    """Exact Pearson correlation of two integer columns per group —
    the two-moment aggregate the reference's string-concat ``foldByKey``
    (``FlameWorker.java:223-270``) cannot express.

    ``x`` and ``y`` MUST already be integer-quantized by the caller
    (the repo's exactness discipline: quantize FIRST, then every
    moment sum is an exact int64). One streaming pass computes per-
    batch partial (n, sx, sy, sxx, syy, sxy) per group — a vectorized
    Arrow group_by per batch, so the exchange carries groups x blocks
    tiny rows, never data rows; the final combine runs on the driver in
    arbitrary-precision Python ints (group cardinality is bounded).
    The only float op is the LAST one — corr_e6 = floor(1e6 * cov /
    (sqrt(d1) * sqrt(d2))) — evaluated identically (same IEEE ops,
    same order) by the DuckDB twin, so results are hash-exact.

    int64 safety: a block's partial sum of x*y must fit int64 —
    caller's quantization contract (e.g. dollars not cents for
    TPC-H prices: 10M rows x 5e3 x 1e5 ~ 5e12 per block).

    Zero-variance groups (d1 == 0 or d2 == 0) are dropped, mirroring
    the SQL twin's WHERE guard. Returns a driver-side pa.Table
    (group keys, n_rows, corr_e6)."""
    acc = _moment_partials(ds, keys, x, y)
    out_keys: list[list] = [[] for _ in keys]
    out_n, out_c = [], []
    for k in sorted(acc):
        n, sx, sy, sxx, syy, sxy = acc[k]
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        if d1 <= 0 or d2 <= 0:
            continue
        num = n * sxy - sx * sy
        corr_e6 = math.floor(1_000_000.0 * num / (math.sqrt(d1) * math.sqrt(d2)))
        for i, kv in enumerate(k):
            out_keys[i].append(kv)
        out_n.append(n)
        out_c.append(corr_e6)
    cols = {kc: pa.array(out_keys[i]) for i, kc in enumerate(keys)}
    cols["n_rows"] = pa.array(out_n, pa.int64())
    cols["corr_e6"] = pa.array(out_c, pa.int64())
    return pa.table(cols)


def grouped_linfit(
    ds: rd.Dataset, keys: list[str], x: str, y: str
) -> pa.Table:
    """Exact per-group OLS fit ``y ~ slope * x + intercept`` — the
    regression companion of :func:`grouped_corr`, sharing its one
    streaming moment pass (the exchange carries groups x blocks tiny
    partial rows). Unlike corr there is NO float op at all: with
    integer-quantized inputs the closed forms are rationals —
    ``slope = (n*sxy - sx*sy) / (n*sxx - sx^2)`` and
    ``intercept = (sy*d1 - num*sx) / (n*d1)`` — so both are emitted as
    exact FLOOR-division micros computed in arbitrary-precision Python
    ints; the DuckDB twin replays them in HUGEINT with the
    ``(a - ((a%b)+b)%b) // b`` floor emulation (SQL ``//`` truncates).
    Zero-variance-x groups are dropped (d1 <= 0 guard on both sides)."""
    acc = _moment_partials(ds, keys, x, y)
    out_keys: list[list] = [[] for _ in keys]
    out_n, out_s, out_i = [], [], []
    for k in sorted(acc):
        n, sx, sy, sxx, _syy, sxy = acc[k]
        d1 = n * sxx - sx * sx
        if d1 <= 0:
            continue
        num = n * sxy - sx * sy
        slope_e6 = (1_000_000 * num) // d1
        intercept_e6 = (1_000_000 * (sy * d1 - num * sx)) // (n * d1)
        for i, kv in enumerate(k):
            out_keys[i].append(kv)
        out_n.append(n)
        out_s.append(slope_e6)
        out_i.append(intercept_e6)
    cols = {kc: pa.array(out_keys[i]) for i, kc in enumerate(keys)}
    cols["n_rows"] = pa.array(out_n, pa.int64())
    cols["slope_e6"] = pa.array(out_s, pa.int64())
    cols["intercept_e6"] = pa.array(out_i, pa.int64())
    return pa.table(cols)


def grouped_spearman(
    ds: rd.Dataset, key: str, x: str, y: str
) -> pa.Table:
    """Exact Spearman rank correlation per group — Pearson on DOUBLED
    average ranks (``rank2(v) = 2*cum_less(v) + ties(v) + 1``, an
    integer even under ties; Pearson is exactly invariant under the
    x2 scaling, including the final IEEE expression, because sqrt(4d)
    = 2*sqrt(d) is exact in binary floating point).

    ``x`` and ``y`` MUST be integer-quantized by the caller. NO
    per-group sort anywhere (the ``rel_percentile_rank`` discipline):

    1. one streaming pass builds per-(group, value) count histograms
       for both columns — the exchange is bounded by the VALUE DOMAIN
       x groups, never by rows; the driver folds them and derives
       rank2 per distinct value from the cumulative counts;
    2. the (sorted values, rank2) arrays broadcast via ``ray.put``;
       a second pass maps each row to its ranks with one searchsorted
       per (group, column) and emits the exact int64 moment partials;
    3. the driver combine and the corr_e6 final are
       :func:`grouped_corr`'s, bit-for-bit (same IEEE op order as the
       SQL twin's ``2*rank() + count(*) OVER (...) - 1`` replay).

    Returns (key, n_rows, spearman_e6); zero-variance groups drop.
    """

    def hist_partial(batch: pa.Table) -> pa.Table:
        outs = []
        for col, tag in ((x, 0), (y, 1)):
            t = pa.table({key: batch[key], "v": batch[col]})
            a = t.group_by([key, "v"]).aggregate([([], "count_all")])
            a = a.append_column(
                "c", pa.array(np.full(a.num_rows, tag, np.int64))
            )
            outs.append(a)
        return pa.concat_tables(outs)

    hist: dict = {}
    for r in ds.map_batches(hist_partial, batch_format="pyarrow").take_all():
        k = (r[key], r["c"])
        d = hist.setdefault(k, {})
        d[r["v"]] = d.get(r["v"], 0) + r["count_all"]

    # rank2 per distinct value: 2*cum_less + ties + 1
    rank_maps: dict = {}
    for k, d in hist.items():
        vals = np.array(sorted(d), dtype=np.int64)
        cnts = np.array([d[v] for v in vals], dtype=np.int64)
        cum_less = np.concatenate(([0], np.cumsum(cnts)[:-1]))
        rank_maps[k] = (vals, 2 * cum_less + cnts + 1)
    maps_ref = ray.put(rank_maps)

    def rank_moments(batch: pa.Table) -> pa.Table:
        maps = ray.get(maps_ref)
        gv = batch[key].to_pylist()
        xv = batch[x].to_numpy(zero_copy_only=False).astype(np.int64)
        yv = batch[y].to_numpy(zero_copy_only=False).astype(np.int64)
        codes, inv = np.unique(np.array(gv, dtype=object), return_inverse=True)
        rx = np.empty(len(gv), np.int64)
        ry = np.empty(len(gv), np.int64)
        for gi, g in enumerate(codes):
            m = inv == gi
            vx, kx = maps[(g, 0)]
            vy, ky = maps[(g, 1)]
            rx[m] = kx[np.searchsorted(vx, xv[m])]
            ry[m] = ky[np.searchsorted(vy, yv[m])]
        t = pa.table({key: batch[key]})
        t = t.append_column("__x", pa.array(rx))
        t = t.append_column("__y", pa.array(ry))
        t = t.append_column("__xx", pa.array(rx * rx))
        t = t.append_column("__yy", pa.array(ry * ry))
        t = t.append_column("__xy", pa.array(rx * ry))
        return t.group_by([key]).aggregate(
            [
                ([], "count_all"),
                ("__x", "sum"),
                ("__y", "sum"),
                ("__xx", "sum"),
                ("__yy", "sum"),
                ("__xy", "sum"),
            ]
        )

    acc: dict = {}
    for r in ds.map_batches(rank_moments, batch_format="pyarrow").take_all():
        a = acc.setdefault(r[key], [0, 0, 0, 0, 0, 0])
        a[0] += r["count_all"]
        a[1] += r["__x_sum"]
        a[2] += r["__y_sum"]
        a[3] += r["__xx_sum"]
        a[4] += r["__yy_sum"]
        a[5] += r["__xy_sum"]
    out_g, out_n, out_c = [], [], []
    for g in sorted(acc):
        n, sx, sy, sxx, syy, sxy = acc[g]
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        if d1 <= 0 or d2 <= 0:
            continue
        num = n * sxy - sx * sy
        out_g.append(g)
        out_n.append(n)
        out_c.append(
            math.floor(1_000_000.0 * num / (math.sqrt(d1) * math.sqrt(d2)))
        )
    return pa.table(
        {
            key: pa.array(out_g),
            "n_rows": pa.array(out_n, pa.int64()),
            "spearman_e6": pa.array(out_c, pa.int64()),
        }
    )


def grouped_welch_t(
    ds: rd.Dataset, key: str, variant: str, x: str
) -> pa.Table:
    """Welch two-sample t statistic per group between variants 0 and 1
    — the A/B experiment readout. ``x`` integer-quantized by the
    caller, ``variant`` in {0, 1}. One streaming pass emits exact
    (n, sum, sumsq) partials per (group, variant) — the exchange is
    groups x 2 x blocks tiny rows; the driver combines in Python
    bigints, and the ONLY float arithmetic is the final t expression

        t = (s1/n1 - s0/n0) / sqrt(d1/(n1^2 (n1-1)) + d0/(n0^2 (n0-1)))

    with d = n*sumsq - sum^2 exact ints — evaluated in the identical
    IEEE op order by the SQL twin, then floored to micros (floor is
    toward -inf on both sides, so negative t values agree too). Groups
    missing a variant or with n < 2 / zero variance in either arm are
    dropped (the twin's WHERE guard)."""

    def partial(batch: pa.Table) -> pa.Table:
        xv = batch[x].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({key: batch[key], variant: batch[variant]})
        t = t.append_column("__x", pa.array(xv))
        t = t.append_column("__xx", pa.array(xv * xv))
        return t.group_by([key, variant]).aggregate(
            [([], "count_all"), ("__x", "sum"), ("__xx", "sum")]
        )

    acc: dict = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        a = acc.setdefault((r[key], r[variant]), [0, 0, 0])
        a[0] += r["count_all"]
        a[1] += r["__x_sum"]
        a[2] += r["__xx_sum"]
    out_g, out_n0, out_n1, out_t = [], [], [], []
    for g in sorted({k for k, _v in acc}):
        if (g, 0) not in acc or (g, 1) not in acc:
            continue
        n0, s0, ss0 = acc[(g, 0)]
        n1, s1, ss1 = acc[(g, 1)]
        d0 = n0 * ss0 - s0 * s0
        d1 = n1 * ss1 - s1 * s1
        if n0 < 2 or n1 < 2 or d0 <= 0 or d1 <= 0:
            continue
        t_val = (float(s1) / float(n1) - float(s0) / float(n0)) / math.sqrt(
            float(d1) / float(n1 * n1 * (n1 - 1))
            + float(d0) / float(n0 * n0 * (n0 - 1))
        )
        out_g.append(g)
        out_n0.append(n0)
        out_n1.append(n1)
        out_t.append(math.floor(1_000_000.0 * t_val))
    return pa.table(
        {
            key: pa.array(out_g),
            "n_a": pa.array(out_n0, pa.int64()),
            "n_b": pa.array(out_n1, pa.int64()),
            "t_e6": pa.array(out_t, pa.int64()),
        }
    )


def kmv_union_estimates(
    ds: rd.Dataset, group_col: str, value_col: str, *, k: int = 64
) -> pa.Table:
    """KMV sketch ALGEBRA: approximate ``COUNT(DISTINCT value)`` of the
    UNION of every group pair from the groups' bottom-k sketches alone
    — the mergeability property that makes KMV a distributed sketch
    (Bar-Yossef et al. 2002): union sketch = k smallest of the two
    sketch sets; if BOTH sides are unsaturated (< k hashes) the merged
    set is the exact distinct union, else
    ``est = floor((k-1) * 2^63 / h_k + 0.5)``.

    One streaming pass emits each block's per-group bottom-k DISTINCT
    hashes (map-side combine: <= k x groups rows per block — the union
    of block bottom-k sets contains the true global bottom-k); the
    driver dedups, truncates to k per group, and evaluates every pair.
    Deterministic md5 hash64, so the DuckDB twin re-derives identical
    sketches and estimates from the raw rows."""
    from ..functions.hashing import hash64

    def local(batch: pa.Table) -> pa.Table:
        tb = (
            batch.select([group_col, value_col])
            .group_by([group_col, value_col])
            .aggregate([])
        )
        hv = np.fromiter(
            (hash64(str(v)) for v in tb[value_col].to_pylist()),
            dtype=np.int64,
            count=tb.num_rows,
        )
        t = pa.table({group_col: tb[group_col], "__hv": pa.array(hv)})
        taken = t.take(
            pc.sort_indices(
                t, sort_keys=[(group_col, "ascending"), ("__hv", "ascending")]
            )
        )
        g = (
            taken[group_col]
            .combine_chunks()
            .dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
        )
        pos = np.arange(len(g))
        first = np.ones(len(g), dtype=bool)
        first[1:] = g[1:] != g[:-1]
        run_start = np.maximum.accumulate(np.where(first, pos, 0))
        return taken.filter(pa.array(pos - run_start < k))

    sketches: dict = {}
    for r in ds.map_batches(local, batch_format="pyarrow").take_all():
        sketches.setdefault(r[group_col], set()).add(r["__hv"])
    for g in sketches:
        sketches[g] = sorted(sketches[g])[:k]
    out_a, out_b, out_e = [], [], []
    m_range = float(1 << 63)
    for a in sorted(sketches):
        for b in sorted(sketches):
            if not a < b:
                continue
            merged = sorted(set(sketches[a]) | set(sketches[b]))
            if len(sketches[a]) < k and len(sketches[b]) < k:
                est = len(merged)
            else:
                est = math.floor((k - 1) * m_range / merged[k - 1] + 0.5)
            out_a.append(a)
            out_b.append(b)
            out_e.append(est)
    return pa.table(
        {
            "type_a": pa.array(out_a),
            "type_b": pa.array(out_b),
            "est_union": pa.array(out_e, pa.int64()),
        }
    )


def grouped_gini(ds: rd.Dataset, key: str, x: str) -> pa.Table:
    """Exact Gini inequality coefficient per group over a NON-NEGATIVE
    integer-quantized column — G = (2*S - (n+1)*T) / (n*T) with
    S = sum_i i*x_(i) (ranked ascending) and T = sum x, emitted as a
    floor-division micro.

    NO per-group sort: one streaming pass builds the bounded
    per-(group, value) count histogram (the ``grouped_spearman``
    discipline); on the driver each tie block of value v with count c
    after m earlier items contributes v*(2*c*m + c*(c+1)) to 2S
    exactly — Python bigints, zero float ops. The SQL twin computes S
    with ``row_number()`` (arbitrary order within ties is harmless:
    x is constant inside a tie block, so sum i*x depends only on the
    rank SET). Groups with T == 0 are dropped."""

    def hist_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch[key], "v": batch[x]})
        return t.group_by([key, "v"]).aggregate([([], "count_all")])

    hist: dict = {}
    for r in ds.map_batches(hist_partial, batch_format="pyarrow").take_all():
        d = hist.setdefault(r[key], {})
        d[r["v"]] = d.get(r["v"], 0) + r["count_all"]
    out_g, out_n, out_gini = [], [], []
    for g in sorted(hist):
        d = hist[g]
        n = sum(d.values())
        T = sum(v * c for v, c in d.items())
        if T <= 0:
            continue
        two_s = 0
        m = 0
        for v in sorted(d):
            c = d[v]
            two_s += v * (2 * c * m + c * (c + 1))
            m += c
        g_e6 = (1_000_000 * (two_s - (n + 1) * T)) // (n * T)
        out_g.append(g)
        out_n.append(n)
        out_gini.append(g_e6)
    return pa.table(
        {
            key: pa.array(out_g),
            "n_rows": pa.array(out_n, pa.int64()),
            "gini_e6": pa.array(out_gini, pa.int64()),
        }
    )


def _moment_partials(
    ds: rd.Dataset, keys: list[str], x: str, y: str
) -> dict:
    """Shared streaming (n, sx, sy, sxx, syy, sxy) per-group moment
    pass of :func:`grouped_corr` / :func:`grouped_linfit`: vectorized
    Arrow group_by per batch, driver combine in Python bigints."""

    def partial(batch: pa.Table) -> pa.Table:
        xv = batch[x].to_numpy(zero_copy_only=False).astype(np.int64)
        yv = batch[y].to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch.select(keys)
        t = t.append_column("__x", pa.array(xv))
        t = t.append_column("__y", pa.array(yv))
        t = t.append_column("__xx", pa.array(xv * xv))
        t = t.append_column("__yy", pa.array(yv * yv))
        t = t.append_column("__xy", pa.array(xv * yv))
        return t.group_by(keys).aggregate(
            [
                ([], "count_all"),
                ("__x", "sum"),
                ("__y", "sum"),
                ("__xx", "sum"),
                ("__yy", "sum"),
                ("__xy", "sum"),
            ]
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc: dict[tuple, list[int]] = {}
    for r in parts:
        k = tuple(r[c] for c in keys)
        a = acc.setdefault(k, [0, 0, 0, 0, 0, 0])
        a[0] += r["count_all"]
        a[1] += r["__x_sum"]
        a[2] += r["__y_sum"]
        a[3] += r["__xx_sum"]
        a[4] += r["__yy_sum"]
        a[5] += r["__xy_sum"]
    return acc


def grouped_string_agg(
    ds: rd.Dataset,
    key: str,
    value: str,
    *,
    sep: str = ",",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Deterministic ordered ``string_agg(value, sep ORDER BY value)``
    per group — the aggregate the reference's comma-concat ``foldByKey``
    accumulator (``FlameWorker.java:223-270``) actually implements,
    minus its nondeterministic arrival order.

    ONE bounded key-bucket exchange; each bucket kernel is fully
    vectorized: one (key, value) sort, run detection, then a single
    ``pc.binary_join`` over a ListArray rebuilt from the run offsets —
    never a per-group Python join. Output: (key, agg, n_values)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.select([key, value]).append_column(
            "__gbucket", pc.cast(_bucket_of(batch[key], num_buckets), pa.int64())
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        g = group.select([key, value]).sort_by(
            [(key, "ascending"), (value, "ascending")]
        )
        k = g[key].combine_chunks()
        codes = k.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(np.diff(codes)) + 1))
        offsets = np.concatenate((starts, [len(codes)])).astype(np.int64)
        vals = pc.cast(g[value].combine_chunks(), pa.large_string())
        lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), vals)
        return pa.table(
            {
                key: k.take(pa.array(starts.astype(np.int64))),
                "agg": pc.binary_join(lists, pa.scalar(sep, pa.large_string())),
                "n_values": pa.array(np.diff(offsets).astype(np.int64)),
            }
        )

    from .shuffle import packed_task_groups

    return packed_task_groups(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        "__gbucket",
        per_bucket,
        num_buckets=num_buckets,
    )


def _two_sample_hists(
    ds: rd.Dataset, key: str, variant: str, x: str
) -> dict:
    """Shared streaming pass of :func:`grouped_ks_test` /
    :func:`grouped_mannwhitney`: the bounded per-(group, value) count
    histogram split by variant (the ``grouped_gini`` discipline — the
    exchange is distinct (group, value) pairs x blocks, never rows).
    Returns {group: {value: [count_variant0, count_variant1]}}."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {key: batch[key], "v": batch[x], "__var": batch[variant]}
        )
        return t.group_by([key, "v", "__var"]).aggregate([([], "count_all")])

    hist: dict = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        d = hist.setdefault(r[key], {})
        c = d.setdefault(r["v"], [0, 0])
        c[int(r["__var"])] += r["count_all"]
    return hist


def grouped_ks_test(
    ds: rd.Dataset, key: str, variant: str, x: str
) -> pa.Table:
    """Two-sample Kolmogorov-Smirnov D per group between variants 0
    and 1 — the distribution-shift readout that catches what a mean
    test (Welch t) cannot: same-mean different-shape drift.

    EXACT integers end-to-end: over the ascending distinct values of
    the bounded (group, value, variant) histogram,
    ``D_num = max |n_b*cumA - n_a*cumB|`` and
    ``ks_e6 = (1e6 * D_num) // (n_a * n_b)`` (D = D_num/(n_a*n_b) is
    the classic sup-distance between the two empirical CDFs). Groups
    missing a variant are dropped (the twin's WHERE guard). The SQL
    twin replays the same cumsums with one window function."""
    hist = _two_sample_hists(ds, key, variant, x)
    out_g, out_na, out_nb, out_ks = [], [], [], []
    for g in sorted(hist):
        d = hist[g]
        na = sum(c[0] for c in d.values())
        nb = sum(c[1] for c in d.values())
        if na == 0 or nb == 0:
            continue
        ca = cb = 0
        dnum = 0
        for v in sorted(d):
            ca += d[v][0]
            cb += d[v][1]
            dnum = max(dnum, abs(nb * ca - na * cb))
        out_g.append(g)
        out_na.append(na)
        out_nb.append(nb)
        out_ks.append((1_000_000 * dnum) // (na * nb))
    return pa.table(
        {
            key: pa.array(out_g),
            "n_a": pa.array(out_na, pa.int64()),
            "n_b": pa.array(out_nb, pa.int64()),
            "ks_e6": pa.array(out_ks, pa.int64()),
        }
    )


def grouped_mannwhitney(
    ds: rd.Dataset, key: str, variant: str, x: str
) -> pa.Table:
    """Mann-Whitney U rank-sum test per group between variants 0 and 1
    — the nonparametric A/B readout robust to the heavy-tailed value
    distributions where Welch t misleads.

    From the same bounded histogram as :func:`grouped_ks_test`:
    ``u2 = 2*U_1 = sum_v c1(v) * (2*cumA(<v) + c0(v))`` (doubled so
    half-ties stay integer — the ``grouped_spearman`` doubling trick),
    and the tie-corrected normal approximation

        z = (u2 - n_a*n_b) / (2 * sqrt(sa / sb))
        sa = n_a*n_b*((N+1)*N*(N-1) - sum_t(t^3 - t)),  sb = 12*N*(N-1)

    with sa/sb exact bigints and the ONE float expression mirrored
    operand-for-operand by the SQL twin (the ``grouped_welch_t``
    contract). Groups missing a variant or with sa <= 0 (all values
    tied) are dropped."""
    hist = _two_sample_hists(ds, key, variant, x)
    out_g, out_na, out_nb, out_u2, out_z = [], [], [], [], []
    for g in sorted(hist):
        d = hist[g]
        na = sum(c[0] for c in d.values())
        nb = sum(c[1] for c in d.values())
        if na == 0 or nb == 0:
            continue
        ca_lt = 0
        u2 = 0
        t3 = 0
        for v in sorted(d):
            c0, c1 = d[v]
            u2 += c1 * (2 * ca_lt + c0)
            ca_lt += c0
            t = c0 + c1
            t3 += t * t * t - t
        nn = na + nb
        sa = na * nb * ((nn + 1) * nn * (nn - 1) - t3)
        sb = 12 * nn * (nn - 1)
        if sa <= 0:
            continue
        num = u2 - na * nb
        z = float(num) / (2.0 * math.sqrt(float(sa) / float(sb)))
        out_g.append(g)
        out_na.append(na)
        out_nb.append(nb)
        out_u2.append(u2)
        out_z.append(math.floor(1_000_000.0 * z))
    return pa.table(
        {
            key: pa.array(out_g),
            "n_a": pa.array(out_na, pa.int64()),
            "n_b": pa.array(out_nb, pa.int64()),
            "u2": pa.array(out_u2, pa.int64()),
            "z_e6": pa.array(out_z, pa.int64()),
        }
    )


def grouped_cooccur_topk(
    ds: rd.Dataset,
    group_col: str,
    item_col: str,
    *,
    k: int = 20,
    max_group_items: int = 1024,
    num_buckets: int = 256,
    truncate_oversize: bool = False,
) -> rd.Dataset:
    """Market-basket co-occurrence: the top-``k`` unordered item pairs
    by the number of distinct groups containing both (support count) —
    "frequently bought together" over (order, part)-shaped tables.

    Plan (the ``ngram_jaccard_pairs`` bucket treatment, never a
    per-group Python callback at group cardinality): local distinct
    (group, item) per batch -> ONE hash shuffle on a BOUNDED bucket of
    the group key (``num_buckets`` Python callbacks total) -> per
    bucket: lexsort, cross-batch distinct by run detection, one
    ``np.triu_indices`` per DISTINCT run length (items ascend within a
    run, so pairs come out (a < b)) -> groupby(item_a, item_b) count ->
    distributed multi-key sort + limit. ``max_group_items`` bounds a
    pathological group's O(n^2) pair blowup; by default hitting the cap
    RAISES (loud, so the SQL-oracle twin — which enumerates pairs
    uncapped — can never silently diverge); pass
    ``truncate_oversize=True`` to instead keep the lowest-item prefix
    (documented approximation for genuinely adversarial corpora). The
    cap never binds on basket-sized groups."""
    from .shuffle import hash_partitions, packed_map_groups

    def partial(t: pa.Table) -> pa.Table:
        g = t[group_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        it = t[item_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((it, g))
        gs, is_ = g[order], it[order]
        keep = np.ones(gs.size, dtype=bool)
        keep[1:] = (np.diff(gs) != 0) | (np.diff(is_) != 0)
        gs, is_ = gs[keep], is_[keep]
        return pa.table(
            {
                "g": pa.array(gs),
                "item": pa.array(is_),
                "__bucket": _bucket_of(pa.array(gs), num_buckets),
            }
        )

    empty_pairs = pa.table(
        {
            "item_a": pa.array([], pa.int64()),
            "item_b": pa.array([], pa.int64()),
            "one": pa.array([], pa.int64()),
        }
    )

    def pairs_bucket(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m < 2:
            return empty_pairs
        g = group["g"].to_numpy(zero_copy_only=False)
        it = group["item"].to_numpy(zero_copy_only=False)
        order = np.lexsort((it, g))
        gs, is_ = g[order], it[order]
        keep = np.ones(m, dtype=bool)
        keep[1:] = (np.diff(gs) != 0) | (np.diff(is_) != 0)
        gs, is_ = gs[keep], is_[keep]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(gs)) + 1))
        lens = np.diff(np.concatenate((starts, [gs.size])))
        if not truncate_oversize and lens.max(initial=0) > max_group_items:
            raise ValueError(
                f"grouped_cooccur_topk: a group has {int(lens.max())} distinct "
                f"items > max_group_items={max_group_items}; pairs would be "
                "silently truncated vs an uncapped oracle. Raise the cap or "
                "pass truncate_oversize=True to accept the documented prefix "
                "approximation."
            )
        capped = np.minimum(lens, max_group_items)
        out_a, out_b = [], []
        for run_len in np.unique(capped):
            if run_len < 2:
                continue
            run_starts = starts[capped == run_len]
            iu, ju = np.triu_indices(int(run_len), 1)
            out_a.append((run_starts[:, None] + iu[None, :]).ravel())
            out_b.append((run_starts[:, None] + ju[None, :]).ravel())
        if not out_a:
            return empty_pairs
        a_idx = np.concatenate(out_a)
        b_idx = np.concatenate(out_b)
        return pa.table(
            {
                "item_a": pa.array(is_[a_idx]),
                "item_b": pa.array(is_[b_idx]),
                "one": pa.array(np.ones(a_idx.size, np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    pairs = packed_map_groups(
        ds.map_batches(partial, batch_format="pyarrow"),
        "__bucket",
        pairs_bucket,
        num_partitions=min(hash_partitions(), num_buckets),
        num_buckets=num_buckets,
    )
    cnt = pairs.groupby(["item_a", "item_b"]).aggregate(Sum("one", alias_name="n_groups"))
    return cnt.sort(
        ["n_groups", "item_a", "item_b"], descending=[True, False, False]
    ).limit(k)
