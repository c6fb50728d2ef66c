"""Document deletion (tombstone path): postings, doc store, stats and
seen set all shrink by exactly the deleted docs; unaffected terms pass
through; re-encoded blobs are canonical; deletes compose with
incremental updates (re-adding a deleted url works)."""

import json
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
    hash64,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
    build_index,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.delete_index import (
    delete_from_index,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
    SearchIndex,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
    pages_parquet,
    reference_queries,
)

N_DOCS = 300


@pytest.fixture(scope="module", params=[False, True], ids=["fmt2", "fmt3-positional"])
def deleted(tmp_path_factory, ray_session, request):
    pages = pages_parquet(N_DOCS)
    base = str(tmp_path_factory.mktemp("idx_base"))
    shutil.rmtree(base, ignore_errors=True)
    build_index(
        pages, base, num_partitions=2, num_shards=4, hot_df_threshold=80,
        store_positions=request.param,
    )
    idx0 = SearchIndex.load(base)
    # delete ~1/8 of the indexed WINNERS by doc_id predicate (the doc
    # store also holds exact-dup loser rows — excluded here; loser
    # deletion is covered separately below)
    losers = set(
        pq.read_table(f"{base}/dup_map", columns=["doc_id"])["doc_id"].to_pylist()
    )
    store = pq.read_table(f"{base}/docstore", columns=["doc_id", "url", "doc_len"])
    mask = [d % 8 == 3 and d not in losers for d in store["doc_id"].to_pylist()]
    del_urls = [u for u, m in zip(store["url"].to_pylist(), mask) if m]
    del_len = sum(l for l, m in zip(store["doc_len"].to_pylist(), mask) if m)
    assert del_urls, "predicate selected nothing — fixture too small"
    out = str(tmp_path_factory.mktemp("idx_del"))
    shutil.rmtree(out, ignore_errors=True)
    delete_from_index(base, del_urls, out)
    return base, out, idx0, del_urls, del_len


def test_postings_shrink_exactly(deleted):
    base, out, idx0, del_urls, _dl = deleted
    idx1 = SearchIndex.load(out)
    del_ids = {hash64(u) for u in del_urls}
    checked_changed = checked_same = 0
    for term, p0 in idx0.terms.items():
        keep = ~np.isin(p0.ids, np.array(sorted(del_ids), dtype=np.int64))
        if keep.all():
            p1 = idx1.terms[term]
            assert np.array_equal(p1.ids, p0.ids) and np.array_equal(p1.tfs, p0.tfs)
            checked_same += 1
        elif keep.any():
            p1 = idx1.terms[term]
            assert np.array_equal(p1.ids, p0.ids[keep]), term
            assert np.array_equal(p1.tfs, p0.tfs[keep]), term
            assert p1.df == int(keep.sum())
            checked_changed += 1
        else:
            assert term not in idx1.terms
    assert checked_changed >= 5 and checked_same >= 5
    # no new terms appeared
    assert set(idx1.terms) <= set(idx0.terms)


def test_stats_and_docstore_shrink(deleted):
    base, out, idx0, del_urls, del_len = deleted
    idx1 = SearchIndex.load(out)
    assert idx1.N == idx0.N - len(del_urls)
    with open(f"{base}/meta.json") as f:
        meta0 = json.load(f)
    with open(f"{out}/meta.json") as f:
        meta = json.load(f)
    assert meta["total_len"] == meta0["total_len"] - del_len
    assert meta["avgdl"] == pytest.approx(meta["total_len"] / idx1.N)
    store = pq.read_table(f"{out}/docstore", columns=["doc_id"])
    base_rows = pq.read_table(f"{base}/docstore", columns=["doc_id"]).num_rows
    ids = set(store["doc_id"].to_pylist())
    assert not ids & {hash64(u) for u in del_urls}
    assert store.num_rows == base_rows - len(del_urls)
    # deleted docs never appear in results
    del_ids = {hash64(u) for u in del_urls}
    hit = 0
    for _qid, q in reference_queries():
        got = idx1.bm25_topk(q, k=20)
        assert not ({d for d, _s in got} & del_ids)
        hit += bool(got)
    assert hit >= 10


def test_delete_then_readd(deleted, tmp_path):
    """A deleted url can be re-admitted by update_index (the seen set
    forgot it)."""
    import pyarrow as pa

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.update_index import (
        update_index,
    )

    base, out, _idx0, del_urls, _dl = deleted
    pages = pq.read_table(pages_parquet(N_DOCS))
    readd = pages.filter(
        pa.array([u == del_urls[0] for u in pages["url"].to_pylist()])
    )
    p = str(tmp_path / "readd.parquet")
    pq.write_table(readd, p)
    upd = str(tmp_path / "idx_upd")
    update_index(p, out, upd, num_partitions=1)
    idx2 = SearchIndex.load(upd)
    assert hash64(del_urls[0]) in {
        d for d in pq.read_table(f"{upd}/docstore", columns=["doc_id"])["doc_id"].to_pylist()
    }
    assert idx2.N == SearchIndex.load(out).N + 1
