"""Batch-scoring pipelines over the documents table vs DuckDB (the
same SQL the driver oracle runs)."""

import duckdb
import ray.data as rd

from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.doc_search import (
    doc_bm25_topk,
    doc_term_stats,
    doc_tfidf_topk,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"
TOKS = (
    "list_filter(string_split_regex(lower(regexp_replace(regexp_replace(text,"
    " '<[^>]*>', '', 'g'), '[!-/:-@\\[-`{-~]', ' ', 'g')), '\\s+'), x -> x <> '')"
)


def _con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    return c


def test_doc_term_stats_match():
    got = (
        doc_term_stats(rd.read_parquet(DOCS))
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    con = _con()  # keep alive: duckdb relations are lazy
    want = (
        con
        .sql(
            f"WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents) "
            "SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf "
            "FROM toks GROUP BY term ORDER BY term"
        )
        .df()
        .reset_index(drop=True)
    )
    assert got["term"].tolist() == want["term"].tolist()
    assert got["df"].tolist() == want["df"].tolist()
    assert got["cf"].tolist() == want["cf"].tolist()


def test_doc_bm25_topk_matches_sql():
    q = "join hash batch scan"
    got = doc_bm25_topk(rd.read_parquet(DOCS), q, k=20).to_pandas()
    con = _con()  # keep alive: duckdb relations are lazy
    want = (
        con
        .sql(
            f"""
            WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
            dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
            stats AS (
              SELECT (SELECT count(*) FROM documents) AS n,
                     CAST((SELECT count(*) FROM toks) AS DOUBLE)
                       / (SELECT count(*) FROM documents) AS avgdl
            ),
            q AS (SELECT unnest({q.split()!r}) AS term),
            df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
                   WHERE term IN (SELECT term FROM q) GROUP BY term)
            SELECT tf.doc_id AS doc_id,
                   CAST(round(sum(
                     ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                     * (tf.tf * (1.2 + 1))
                       / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl))
                   ) * 1000000) AS BIGINT) AS score_e6
            FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id, stats
            GROUP BY tf.doc_id ORDER BY score_e6 DESC, doc_id LIMIT 20
            """
        )
        .df()
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score_e6"].tolist() == want["score_e6"].tolist()


def test_doc_tfidf_threshold_and_order():
    q = "vector merge stream"
    got = doc_tfidf_topk(rd.read_parquet(DOCS), q, k=300, threshold=0.3).to_pandas()
    assert (got["score_e6"] > 0.3e6 - 1).all()
    assert got["score_e6"].is_monotonic_decreasing or len(got) <= 1

