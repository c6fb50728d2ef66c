"""The chained training-data-prep pipeline vs an independent DuckDB
replay at sf0.001 (the per-stage operators have their own tests; this
asserts the WIRING — gate, drop set, summary — end to end)."""

import duckdb
import ray.data as rd

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_training_data_prep_matches_duckdb():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.data_prep import (
        training_data_prep,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
        benchmark_shingle_set,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    bench = benchmark_shingle_set(docs, n=3, n_docs=5)
    got = training_data_prep(docs, bench, min_hits=10).to_pandas()

    sql = entrymod.oracle_sql()["pipeline_data_prep"].replace("LIMIT 20", "LIMIT 5")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.sql(sql).df()
    g = {r.lang_pred: (r.n_docs, r.total_tokens) for r in got.itertuples()}
    w = {r.lang_pred: (r.n_docs, r.total_tokens) for r in want.itertuples()}
    assert g == w and len(g) >= 1


def test_training_data_prep_v2_near_dup_cap():
    """The v2 chain (near_dup_cap=1) matches its DuckDB replay and
    keeps strictly fewer docs than v1 on this corpus (the near-dup
    stage is non-vacuous: the fixture documents table contains planted
    n-gram-Jaccard near-duplicates)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.data_prep import (
        training_data_prep,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
        benchmark_shingle_set,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    bench = benchmark_shingle_set(docs, n=3, n_docs=5)
    v1 = training_data_prep(docs, bench, min_hits=10).to_pandas()
    v2 = training_data_prep(
        docs,
        bench,
        min_hits=10,
        near_dup_cap=1,
        jaccard_threshold=entrymod.JACCARD_THR,
    ).to_pandas()

    sql = entrymod.oracle_sql()["pipeline_data_prep_v2"].replace("LIMIT 20", "LIMIT 5")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.sql(sql).df()
    g = {r.lang_pred: (r.n_docs, r.total_tokens) for r in v2.itertuples()}
    w = {r.lang_pred: (r.n_docs, r.total_tokens) for r in want.itertuples()}
    assert g == w and len(g) >= 1
    assert v2["n_docs"].sum() < v1["n_docs"].sum(), "cap dropped nothing"


def test_curated_docs_summary_matches_training_data_prep():
    """The writer path (curated_docs) keeps exactly the docs whose
    aggregate the summary pipeline reports — same drop set, same
    quality gate."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.data_prep import (
        curated_docs,
        training_data_prep,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
        benchmark_shingle_set,
    )

    src = "/root/testdata/sf0.001/documents.parquet"
    docs = rd.read_parquet(src, columns=["doc_id", "text"])
    bench = benchmark_shingle_set(docs, n=3, n_docs=20)
    summary = {
        r["lang_pred"]: (r["n_docs"], r["total_tokens"])
        for r in training_data_prep(docs, bench, near_dup_cap=1).take_all()
    }
    kept = curated_docs(docs, bench, near_dup_cap=1).take_all()
    agg: dict[str, list[int]] = {}
    for r in kept:
        a = agg.setdefault(r["lang_pred"], [0, 0])
        a[0] += 1
        a[1] += r["n_tokens"]
        assert r["text"]  # the writer path carries the document itself
    assert {k: tuple(v) for k, v in agg.items()} == summary
