"""Full index LIFECYCLE chain — the operational story a 100-TB
deployment runs continuously: base build -> incremental update ->
document deletion -> compaction, then the final index must score
bit-identically to a FROM-SCRATCH build over the surviving pages.

Each step is covered in isolation elsewhere (tests/test_update_index.py,
test_delete_index.py, test_build_query.py's compaction test); this
module proves the steps COMPOSE — manifests, seen-sets, dup maps and
posting blobs survive being threaded through all four stages.

Deleted urls are restricted to UNIQUE-content winner pages: the delete
tombstone contract does not promote dup losers (pinned by the delete
oracle), so from-scratch parity is only defined when no deleted doc had
a loser to promote. Cross-batch duplicate handling requires the same
clean split as tests/test_update_index.py (full rebuild resolves
cross-batch content ties by min doc_id, update by first-indexed)."""

import json
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
    sha1_hex,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
    build_index,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.compact_index import (
    compact_index,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.delete_index import (
    delete_from_index,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
    SearchIndex,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.update_index import (
    update_index,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
    reference_queries,
    synth_pages,
)

N = 400
KW = dict(num_shards=8, num_salts=4, hot_df_threshold=60, num_partitions=3)


@pytest.fixture(scope="module")
def lifecycle(tmp_path_factory):
    d = tmp_path_factory.mktemp("lifecycle")
    tbl = synth_pages(N)
    half1, half2 = tbl.slice(0, N // 2), tbl.slice(N // 2)
    seen1 = {sha1_hex(h) for h in half1["html"].to_pylist()}
    half2_clean = half2.filter(
        pa.array([sha1_hex(h) not in seen1 for h in half2["html"].to_pylist()])
    )
    assert half2_clean.num_rows < half2.num_rows  # split exercises dups

    # urls safe to delete: content unique in the WHOLE corpus (no loser
    # to promote), drawn from both halves; 8 smallest for determinism
    content_n = Counter(
        sha1_hex(h)
        for t in (half1, half2_clean)
        for h in t["html"].to_pylist()
    )
    unique_urls = sorted(
        u
        for t in (half1, half2_clean)
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist())
        if content_n[sha1_hex(h)] == 1
    )
    del_urls = unique_urls[:8]
    assert len(del_urls) == 8

    p_half1 = str(d / "half1.parquet")
    p_half2 = str(d / "half2.parquet")
    pq.write_table(half1, p_half1, row_group_size=64)
    pq.write_table(half2_clean, p_half2, row_group_size=64)

    base = build_index(p_half1, str(d / "base"), **KW)
    upd = update_index(p_half2, base.out_dir, str(d / "upd"), num_partitions=2)
    dele = delete_from_index(upd.out_dir, del_urls, str(d / "del"))
    comp = compact_index(dele.out_dir, str(d / "comp"))

    # from-scratch reference over the surviving pages
    dset = set(del_urls)
    surviving = pa.concat_tables([half1, half2_clean]).filter(
        pa.array(
            [
                u not in dset
                for t in (half1, half2_clean)
                for u in t["url"].to_pylist()
            ]
        )
    )
    p_surv = str(d / "surviving.parquet")
    pq.write_table(surviving, p_surv, row_group_size=64)
    scratch = build_index(p_surv, str(d / "scratch"), **KW)
    return comp, scratch, del_urls


def _shards(paths):
    return (
        pq.read_table(paths.shards)
        .sort_by("term")
        .combine_chunks()
    )


def test_chain_equals_scratch_shards(lifecycle):
    comp, scratch, _del_urls = lifecycle
    tc, ts = _shards(comp), _shards(scratch)
    assert tc.num_rows == ts.num_rows
    assert ts.select(tc.column_names).equals(tc)


def test_chain_equals_scratch_meta(lifecycle):
    comp, scratch, _del_urls = lifecycle
    with open(comp.meta) as f:
        mc = json.load(f)
    with open(scratch.meta) as f:
        ms = json.load(f)
    assert (mc["N"], mc["total_len"], mc["avgdl"]) == (
        ms["N"],
        ms["total_len"],
        ms["avgdl"],
    )


def test_chain_scoring_parity_and_deletion_visible(lifecycle):
    comp, scratch, del_urls = lifecycle
    idx_c = SearchIndex.load(comp.out_dir)
    idx_s = SearchIndex.load(scratch.out_dir)
    for _qid, q in reference_queries():
        assert idx_c.bm25_topk(q, 10) == idx_s.bm25_topk(q, 10), q
    # the deleted docs are really gone from serving
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
        hash64,
    )

    gone = {hash64(u) for u in del_urls}
    for _qid, q in reference_queries():
        assert not gone.intersection(d for d, _s in idx_c.bm25_topk(q, 10**9))
