"""Checkpoint/resume: kill half the phase-A partitions, rerun, shards
byte-identical to the uninterrupted build (FIXTURES.md §4 'Resume')."""

import os
import shutil

import pyarrow.parquet as pq

from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
    IndexPaths,
    build_index,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
    pages_parquet,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.state.manifest import (
    read_manifest,
)


def _shard_table(paths: IndexPaths):
    t = pq.read_table(paths.shards)
    return t.sort_by("term")


def test_resume_produces_identical_shards(tmp_path):
    # small row groups => >=4 checkpoint partitions on a 200-doc corpus
    pages = pages_parquet(200, row_group_size=32)
    out_a = str(tmp_path / "full")
    out_b = str(tmp_path / "resumed")
    kw = dict(num_partitions=4, hot_df_threshold=50, num_salts=2)
    pa_full = build_index(pages, out_a, **kw)

    build_index(pages, out_b, **kw)
    pb = IndexPaths(out_b)
    # simulate a crash: destroy two partitions' outputs + all derived dirs
    for pid in (1, 3):
        shutil.rmtree(os.path.join(pb.docs_ckpt, f"part={pid}"))
    for d in (pb.dup_map, pb.docstore, pb.term_stats, pb.shards):
        shutil.rmtree(d)
    os.remove(pb.meta)

    pb2 = build_index(pages, out_b, **kw)
    # lineage manifests exist for every partition and record inputs
    for pid in range(4):
        m = read_manifest(os.path.join(pb2.docs_ckpt, f"part={pid}"))
        assert m is not None and m.num_docs > 0 and m.inputs

    ta = _shard_table(pa_full).select(["term", "df", "cf", "doc_blob", "tf_blob"])
    tb = _shard_table(pb2).select(["term", "df", "cf", "doc_blob", "tf_blob"])
    assert ta.equals(tb)


def test_rerun_over_complete_build_is_idempotent(tmp_path):
    pages = pages_parquet(200)
    out = str(tmp_path / "idx")
    kw = dict(num_partitions=2, hot_df_threshold=50, num_salts=2)
    p1 = build_index(pages, out, **kw)
    t1 = _shard_table(p1)
    store1 = pq.read_table(p1.docstore).num_rows
    p2 = build_index(pages, out, **kw)
    t2 = _shard_table(p2)
    assert pq.read_table(p2.docstore).num_rows == store1  # no doubling
    assert t1.select(["term", "doc_blob", "tf_blob"]).equals(
        t2.select(["term", "doc_blob", "tf_blob"])
    )


def test_audit_doc_ids_no_collisions(tmp_path):
    """hash64(url) audit: distinct (doc_id, url) pairs == distinct
    doc_ids on a clean corpus."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
        IndexPaths,
        audit_doc_ids,
        build_index,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_parquet,
    )

    out = str(tmp_path / "audit_idx")
    build_index(pages_parquet(200), out, num_partitions=2)
    audit = audit_doc_ids(IndexPaths(out))
    assert audit["collisions"] == 0
    assert audit["distinct_doc_ids"] == audit["distinct_pairs"] == 200
