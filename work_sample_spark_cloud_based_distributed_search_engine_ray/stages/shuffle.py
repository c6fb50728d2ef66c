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

import ray
import ray.data as rd


def hash_partitions(num_partitions: int | None = None) -> int:
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return num_partitions or max(2, cpus)


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
