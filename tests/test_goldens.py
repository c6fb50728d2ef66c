"""Committed golden artifacts (FIXTURES.md §3): the oracle's output on
the canonical 1000-doc fixture corpus is pinned in tests/goldens/ —
any unintended drift in tokenizer/extraction/scorers/generator breaks
these. (The engine is separately rank-identical to the oracle, so
golden == oracle == engine transitively.)"""

import json
import os

import pyarrow.parquet as pq

from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.oracle import (
    OracleIndex,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
    pages_parquet,
    reference_queries,
)

GOLD = os.path.join(os.path.dirname(__file__), "goldens")


def _oracle():
    return OracleIndex(pq.read_table(pages_parquet(1000)))


def test_golden_scalars_and_stats():
    oracle = _oracle()
    scalars = json.load(open(os.path.join(GOLD, "golden_scalars.json")))
    assert oracle.N == scalars["N"]
    assert oracle.total_len == scalars["total_len"]
    assert abs(oracle.avgdl - scalars["avgdl"]) < 1e-12
    g = pq.read_table(os.path.join(GOLD, "golden_stats.parquet"))
    st = oracle.term_stats()
    assert g.num_rows == len(st)
    for term, df, cf in zip(g["term"].to_pylist(), g["df"].to_pylist(), g["cf"].to_pylist()):
        assert st[term] == (df, cf), term


def test_golden_topk():
    oracle = _oracle()
    g = pq.read_table(os.path.join(GOLD, "golden_topk.parquet")).to_pylist()
    by_q: dict = {}
    for row in g:
        by_q.setdefault((row["qid"], row["scorer"]), []).append(row)
    queries = dict(reference_queries())
    for (qid, scorer), rows in by_q.items():
        q = queries[qid]
        got = oracle.bm25_topk(q, 10) if scorer == "bm25" else oracle.reference_topk(q)
        rows.sort(key=lambda r: r["rank"])
        assert [(r["doc_id"], r["score"]) for r in rows] == got, (qid, scorer)
    # zero-hit queries contribute no golden rows but must still be empty
    for qid, q in reference_queries():
        if (qid, "bm25") not in by_q:
            assert oracle.bm25_topk(q, 10) == [], q
