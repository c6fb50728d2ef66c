"""Distributed (shard-actor scatter-gather) serving == in-process
scoring, bit-identically, over the reference query set."""

import shutil

import pytest

from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
    build_index,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
    SearchIndex,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.serve import (
    DistributedSearch,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
    pages_parquet,
    reference_queries,
)


@pytest.fixture(scope="module")
def served(tmp_path_factory, ray_session):
    pages = pages_parquet(500)
    out = str(tmp_path_factory.mktemp("idx_serve"))
    shutil.rmtree(out, ignore_errors=True)
    build_index(pages, out, num_partitions=2, num_shards=4, hot_df_threshold=100)
    ds = DistributedSearch(out)
    idx = SearchIndex.load(out)
    yield ds, idx
    ds.shutdown()


def test_distributed_equals_inprocess(served):
    ds, idx = served
    for _qid, q in reference_queries():
        assert ds.bm25_topk(q, 10) == idx.bm25_topk_exhaustive(q, 10), q


def test_distributed_zero_hit(served):
    ds, _ = served
    assert ds.bm25_topk("zzqx42nohit", 10) == []
    assert ds.bm25_topk("", 10) == []
