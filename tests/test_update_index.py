"""Incremental index update (pipelines/update_index.py): delta build +
canonical shard merge is bit-identical to a full rebuild on a
cross-batch-duplicate-free split; the contentSeen gate drops pages whose
content OR url the base index already admitted (first-indexed wins,
reference ``contentSeen`` semantics, ``crawler/Crawler.java:178-190``)."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
    sha1_hex,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
    build_index,
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
def corpus(tmp_path_factory):
    """The seed-42 corpus split in half, with half2's cross-half content
    duplicates removed in the *_clean variants (full rebuild vs update
    resolve cross-batch duplicate ties differently — min doc_id vs
    first indexed — so bit-identity is only defined on a clean split)."""
    tbl = synth_pages(N)
    half1, half2 = tbl.slice(0, N // 2), tbl.slice(N // 2)
    seen1 = {sha1_hex(h) for h in half1["html"].to_pylist()}
    mask = pa.array([sha1_hex(h) not in seen1 for h in half2["html"].to_pylist()])
    half2_clean = half2.filter(mask)
    # the deterministic fixture must actually exercise cross-batch dups
    assert half2_clean.num_rows < half2.num_rows
    d = tmp_path_factory.mktemp("upd_corpus")
    paths = {}
    for name, t in (
        ("half1", half1),
        ("half2_clean", half2_clean),
        ("half2_raw", half2),
        ("full_clean", pa.concat_tables([half1, half2_clean])),
    ):
        p = str(d / f"{name}.parquet")
        pq.write_table(t, p, row_group_size=64)
        paths[name] = p
    return paths


@pytest.fixture(scope="module")
def built(corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("upd_idx")
    full = build_index(corpus["full_clean"], str(d / "full"), **KW)
    base = build_index(corpus["half1"], str(d / "base"), **KW)
    upd = update_index(
        corpus["half2_clean"], base.out_dir, str(d / "updated"), num_partitions=2
    )
    return full, base, upd


def _shards(paths):
    return pq.read_table(paths.shards).sort_by("term").combine_chunks()


def _meta(paths):
    with open(paths.meta) as f:
        return json.load(f)


def test_update_equals_full_rebuild(built):
    full, _base, upd = built
    tf, tu = _shards(full), _shards(upd)
    assert tf.num_rows == tu.num_rows
    assert tf.select(tu.column_names).equals(tu)


def test_update_meta_adds_up(built):
    full, _base, upd = built
    mf, mu = _meta(full), _meta(upd)
    assert (mf["N"], mf["total_len"], mf["avgdl"]) == (
        mu["N"],
        mu["total_len"],
        mu["avgdl"],
    )
    assert mu["updated_from"]["delta_docs"] > 0


def test_update_query_parity(built):
    full, _base, upd = built
    idx_f, idx_u = SearchIndex.load(full.out_dir), SearchIndex.load(upd.out_dir)
    for _qid, q in reference_queries():
        assert idx_u.bm25_topk(q, 10) == idx_f.bm25_topk(q, 10), q


def test_content_seen_gate_drops_cross_dups(corpus, built, tmp_path_factory):
    """Feeding the RAW second half (cross-half dups included) yields the
    same index as the clean one: the broadcast gate drops them."""
    _full, base, upd_clean = built
    out = str(tmp_path_factory.mktemp("upd_raw") / "updated")
    upd_raw = update_index(corpus["half2_raw"], base.out_dir, out, num_partitions=2)
    assert _meta(upd_raw)["N"] == _meta(upd_clean)["N"]
    assert _shards(upd_clean).equals(_shards(upd_raw))


def test_url_seen_gate(corpus, built, tmp_path_factory):
    """Re-feeding already-indexed pages (same urls) adds nothing."""
    _full, base, _upd = built
    out = str(tmp_path_factory.mktemp("upd_noop") / "updated")
    upd = update_index(corpus["half1"], base.out_dir, out, num_partitions=2)
    assert _meta(upd)["N"] == _meta(base)["N"]
    assert _meta(upd)["updated_from"]["delta_docs"] == 0
    assert _shards(upd).equals(_shards(base))


def test_chained_update_reads_seen_parquet(corpus, built, tmp_path_factory):
    """A second update on top of an updated index (which has seen.parquet
    but no docs checkpoint) still gates correctly."""
    _full, _base, upd = built
    out = str(tmp_path_factory.mktemp("upd_chain") / "updated")
    upd2 = update_index(corpus["half2_raw"], upd.out_dir, out, num_partitions=2)
    assert _meta(upd2)["N"] == _meta(upd)["N"]
    assert _meta(upd2)["updated_from"]["delta_docs"] == 0
