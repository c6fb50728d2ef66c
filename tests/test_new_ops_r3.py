"""Bloom-pruned join, weighted (sequential Poisson) sampling, exact
two-pass heavy hitters, and char n-gram substring dedup vs DuckDB."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
    flat_tokens_batch,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
    char_gram_partial,
    substring_dedup_stats,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
    _bloom_positions,
    bloom_join,
    heavy_hitters,
    weighted_sample,
)

SF = "/root/testdata/sf0.001"


def _sorted(obj, by):
    df = obj.to_pandas() if hasattr(obj, "to_pandas") else obj
    return df.sort_values(by).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "lineitem", "documents"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_bloom_positions_deterministic_and_distinct():
    v = np.arange(1000, dtype=np.int64)
    p1 = _bloom_positions(v, 1 << 16, 4)
    p2 = _bloom_positions(v, 1 << 16, 4)
    assert (p1 == p2).all()
    assert (p1 < (1 << 16)).all()
    # odd step => the k probes of one key are pairwise distinct
    assert all(len(set(row)) == 4 for row in p1[:50])


def test_bloom_join_equals_plain_join(con):
    li = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    od = (
        rd.read_parquet(
            f"{SF}/orders.parquet",
            columns=["o_orderkey", "o_orderstatus", "o_orderpriority"],
        )
        .filter(expr="o_orderstatus == 'F'")
        .map_batches(
            lambda t: pa.table(
                {"l_orderkey": t["o_orderkey"], "o_orderpriority": t["o_orderpriority"]}
            ),
            batch_format="pyarrow",
        )
    )
    # tiny bitset => high false-positive rate; result must be identical
    got = _sorted(
        bloom_join(
            li,
            od,
            "l_orderkey",
            fact_cols=["l_quantity"],
            dim_cols=["o_orderpriority"],
            nbits=1 << 10,
        ),
        ["l_orderkey", "l_quantity", "o_orderpriority"],
    )
    exp = _sorted(
        con.sql(
            "SELECT l_orderkey, l_quantity, o_orderpriority FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey WHERE o_orderstatus = 'F'"
        ).df(),
        ["l_orderkey", "l_quantity", "o_orderpriority"],
    )
    assert got["l_orderkey"].tolist() == exp["l_orderkey"].tolist()
    assert got["o_orderpriority"].tolist() == exp["o_orderpriority"].tolist()


def test_bloom_join_rejects_outer():
    li = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    with pytest.raises(ValueError):
        bloom_join(
            li, li, "l_orderkey", fact_cols=["l_quantity"], dim_cols=[], how="left"
        )


def test_weighted_sample_matches_sql_and_prefers_heavy(con):
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "source", "n_chars"])
    got = _sorted(
        weighted_sample(docs, id_col="doc_id", weight_col="n_chars", n=25), ["doc_id"]
    )
    exp = _sorted(
        con.sql(
            "SELECT doc_id, source, n_chars FROM documents ORDER BY "
            "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT "
            "& 9223372036854775807::UBIGINT AS BIGINT) // n_chars, doc_id LIMIT 25"
        ).df(),
        ["doc_id"],
    )
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    # weight bias: sampled docs skew longer than the corpus mean
    corpus_mean = con.sql("SELECT avg(n_chars) FROM documents").fetchone()[0]
    assert got["n_chars"].mean() > corpus_mean


def test_heavy_hitters_exact(con):
    def partials(t: pa.Table) -> pa.Table:
        flat, _p, _n = flat_tokens_batch(t["text"])
        tt = pa.table({"term": flat}).group_by("term").aggregate([([], "count_all")])
        return pa.table({"term": tt["term"], "c": tt["count_all"].cast(pa.int64())})

    def mk():
        return rd.read_parquet(f"{SF}/documents.parquet", columns=["text"]).map_batches(
            partials, batch_format="pyarrow"
        )

    got = _sorted(heavy_hitters(mk, "term", "c", threshold_fraction=0.01), ["term"])
    from __ray_entry__ import TOKS

    exp = _sorted(
        con.sql(
            f"WITH t AS (SELECT {TOKS} AS l FROM documents), "
            "toks AS (SELECT unnest(l) AS term FROM t) "
            "SELECT term, count(*) AS cf FROM toks GROUP BY term "
            "HAVING count(*) >= ceil(0.01 * (SELECT count(*) FROM toks))"
        ).df(),
        ["term"],
    )
    assert got["term"].tolist() == exp["term"].tolist()
    assert got["cf"].tolist() == exp["cf"].astype(int).tolist()


def test_char_gram_partial_windows():
    t = pa.table({"doc_id": [1, 2, 3], "text": ["abcd" * 10, "xy", "abcd" * 10]})
    out = char_gram_partial(t, gram_len=32)
    # doc 2 is shorter than one gram; docs 1 and 3 share all grams
    assert set(out["doc_id"].to_pylist()) == {1, 3}
    d1 = out.filter(pa.compute.equal(out["doc_id"], 1))
    d3 = out.filter(pa.compute.equal(out["doc_id"], 3))
    assert sorted(d1["gram_h"].to_pylist()) == sorted(d3["gram_h"].to_pylist())
    # 40 chars -> 9 windows, 4 distinct (rotations of abcd), 9 occurrences
    assert sum(d1["n_occ"].to_pylist()) == 9
    assert d1.num_rows == 4


def test_substring_dedup_stats_vs_sql(con):
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = _sorted(substring_dedup_stats(docs), ["doc_id"])
    exp = _sorted(
        con.sql(
            """
        WITH pos AS (SELECT doc_id, text,
                            unnest(range(1, greatest(len(text) - 31, 0) + 1)) AS i
                     FROM documents),
        g AS (SELECT doc_id, substring(text, CAST(i AS INT), 32) AS gram FROM pos),
        gd AS (SELECT doc_id, gram, count(*) AS n_occ FROM g GROUP BY doc_id, gram),
        nd AS (SELECT gram, count(*) AS n_docs FROM gd GROUP BY gram)
        SELECT doc_id, CAST(sum(n_occ) AS BIGINT) AS n_grams,
               CAST(count(*) AS BIGINT) AS n_distinct_grams,
               CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams
        FROM gd JOIN nd USING (gram) GROUP BY doc_id
        """
        ).df(),
        ["doc_id"],
    )
    for col in ("doc_id", "n_grams", "n_distinct_grams", "n_dup_grams"):
        assert got[col].tolist() == exp[col].tolist(), col


def test_kmeans_exact_and_partitioning_invariant():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
        hash64,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
        kmeans_assign,
    )

    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = _sorted(kmeans_assign(ds, k=4, iters=2), ["vec_id"])
    got8 = _sorted(
        kmeans_assign(ds.repartition(8), k=4, iters=2), ["vec_id"]
    )
    assert got["cluster"].tolist() == got8["cluster"].tolist()
    assert got["dist"].tolist() == got8["dist"].tolist()

    # pure-numpy reference Lloyd with the same integer rules
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    x = np.floor(
        np.asarray(t["embedding"].to_pylist(), np.float64) * 1e6 + 0.5
    ).astype(np.int64)
    h = np.array([hash64(str(v)) for v in ids])
    seed = np.lexsort((ids, h))[:4]
    cents = x[seed]
    for _ in range(2):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        new = cents.copy()
        for c in range(4):
            m = a == c
            if m.any():
                new[c] = np.floor_divide(x[m].sum(axis=0), m.sum())
        cents = new
    d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    ref = dict(zip(ids.tolist(), d.argmin(axis=1).tolist()))
    assert got.set_index("doc_id" if "doc_id" in got else "vec_id")["cluster"].to_dict() == ref
    # clusters are non-trivial: more than one cluster in use
    assert got["cluster"].nunique() > 1


def test_bm25_weighted_topk_reduces_to_exhaustive(tmp_path):
    # weight 1.0 on every query term == the plain exhaustive scorer
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
        build_index,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
        SearchIndex,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_parquet,
        reference_queries,
    )

    pp = pages_parquet(300)
    out = str(tmp_path / "idx")
    build_index(pp, out, num_partitions=2)
    idx = SearchIndex.load(out)
    for _, q in list(reference_queries())[:8]:
        terms = [(t, 1.0) for t in tokenize_query(q)]
        assert idx.bm25_weighted_topk(terms, k=10) == idx.bm25_topk_exhaustive(q, k=10)
        # halving one term's weight can only lower that term's share
        if terms and idx.has_term(terms[0][0]):
            damped = [(terms[0][0], 0.5)] + terms[1:]
            got = idx.bm25_weighted_topk(damped, k=10)
            assert all(s > 0 for _, s in got)


def test_bigram_loglik_hand_check_and_invariance():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        bigram_loglik,
    )

    # corpus: "a b" x2 and "a b a c" -> c(a,b)=3, c(b,a)=1, c(a,c)=1,
    # left(a)=4, left(b)=1 -> weights log10(3/4), log10(1/1), log10(1/4)
    docs = pa.table({"doc_id": [1, 2, 3], "text": ["a b", "a b", "a b a c"]})
    got = _sorted(bigram_loglik(rd.from_arrow(docs)), ["doc_id"])
    w_ab = int(np.rint(np.log10(3 / 4) * 1e6))
    w_ba = int(np.rint(np.log10(1 / 1) * 1e6))
    w_ac = int(np.rint(np.log10(1 / 4) * 1e6))
    assert got["n_bigrams"].tolist() == [1, 1, 3]
    assert got["sum_logprob_e6"].tolist() == [w_ab, w_ab, w_ab + w_ba + w_ac]

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    a = _sorted(bigram_loglik(ds), ["doc_id"])
    b = _sorted(bigram_loglik(ds.repartition(7)), ["doc_id"])
    assert a["sum_logprob_e6"].tolist() == b["sum_logprob_e6"].tolist()


def test_scatter_gather_bit_identical_to_monolithic(tmp_path):
    import os
    import pyarrow.parquet as pq_
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
        hash64,
        sha1_hex,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
        build_index,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
        SearchIndex,
        scatter_gather_topk,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_parquet,
        reference_queries,
    )

    pp = pages_parquet(400)
    tbl = pq_.read_table(pp)
    # global dedup winners (keep first (warc_ts, url) per html)
    seen, keep = {}, []
    rows = sorted(
        range(tbl.num_rows),
        key=lambda i: (tbl["warc_ts"][i].as_py(), tbl["url"][i].as_py()),
    )
    for i in rows:
        h = sha1_hex(tbl["html"][i].as_py())
        if h not in seen:
            seen[h] = i
            keep.append(i)
    win = tbl.take(pa.array(sorted(keep)))
    # monolithic index over the winners
    mono_dir = str(tmp_path / "mono")
    wp = str(tmp_path / "win.parquet")
    pq_.write_table(win, wp)
    build_index(wp, mono_dir, num_partitions=2)
    mono = SearchIndex.load(mono_dir)
    # 3-way doc-range split of the same winners
    n_ranges = 3
    width = ((1 << 63) + n_ranges - 1) // n_ranges
    shards = []
    for r in range(n_ranges):
        mask = pa.array(
            [hash64(u) // width == r for u in win["url"].to_pylist()]
        )
        part = win.filter(mask)
        p = str(tmp_path / f"part{r}.parquet")
        pq_.write_table(part, p)
        d = str(tmp_path / f"idx{r}")
        build_index(p, d, num_partitions=2)
        shards.append(SearchIndex.load(d))
    assert sum(s.N for s in shards) == mono.N
    for _, q in list(reference_queries())[:12]:
        assert scatter_gather_topk(shards, q, k=10) == mono.bm25_topk_exhaustive(q, k=10)


def test_phash_near_dups_captures_planted_variants():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.media_codecs import (
        decode_bmp,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        phash64,
        phash_near_dups,
        synth_images_neardup,
    )

    t = synth_images_neardup(120)
    base = t["base_id"].to_numpy(zero_copy_only=False)
    truth = {(int(min(b, i)), int(max(b, i))) for i, b in enumerate(base) if b >= 0}
    assert truth, "corpus must contain planted near-dups"
    got = phash_near_dups(
        rd.from_arrow(t.select(["media_id", "payload"])), max_hamming=3
    ).to_pandas()
    gset = {(int(r.doc_a), int(r.doc_b)) for r in got.itertuples()}
    # every planted +-2-noise variant lands within 3 bits of its base
    assert truth <= gset
    # brute-force popcount parity
    ph = np.array(
        [phash64(decode_bmp(p)) for p in t["payload"].to_pylist()], np.int64
    ).view(np.uint64)
    x = ph[:, None] ^ ph[None, :]
    ham = np.unpackbits(x.view(np.uint8).reshape(len(ph), len(ph), 8), axis=2).sum(axis=2)
    iu, ju = np.triu_indices(len(ph), 1)
    exp = {(int(a), int(b)) for a, b in zip(iu, ju) if ham[a, b] <= 3}
    assert gset == exp


def test_winsorized_sum_vs_duckdb(con):
    import duckdb as _dd
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        winsorized_sum,
    )

    c = _dd.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    got = _sorted(
        winsorized_sum(
            lambda: rd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"]),
            "event_type",
            "value",
        ),
        ["event_type"],
    )
    exp = _sorted(
        c.sql(
            """
        WITH b AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS v FROM events),
        q AS (SELECT event_type, quantile_disc(v, 0.05) AS lo, quantile_disc(v, 0.95) AS hi
              FROM b GROUP BY event_type)
        SELECT event_type, CAST(lo AS BIGINT) AS p5_e2, CAST(hi AS BIGINT) AS p95_e2,
               count(*) AS n_rows, CAST(sum(least(greatest(v, lo), hi)) AS BIGINT) AS sum_clipped_e2
        FROM b JOIN q USING (event_type) GROUP BY event_type, lo, hi
        """
        ).df(),
        ["event_type"],
    )
    for col in ("event_type", "p5_e2", "p95_e2", "n_rows", "sum_clipped_e2"):
        assert got[col].tolist() == exp[col].astype(got[col].dtype if col != "event_type" else object).tolist(), col


def test_pack_sequence_spans_properties_and_invariance():
    """Sequence packing: per-doc span totals equal n_tokens + EOS, every
    chunk except the last is exactly full, spans tile each chunk without
    gaps, and the map is partitioning-invariant."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        pack_sequence_spans,
    )

    rng = np.random.default_rng(7)
    docs = [
        {"doc_id": int(i), "text": " ".join(f"w{rng.integers(0, 50)}" for _ in range(int(rng.integers(0, 40))))}
        for i in range(60)
    ]
    L = 16
    out = _sorted(
        pack_sequence_spans(rd.from_items(docs, override_num_blocks=5), seq_len=L),
        ["doc_id", "chunk_id"],
    )

    per_doc = out.groupby("doc_id")["n_tok"].sum()
    for d in docs:
        assert per_doc[d["doc_id"]] == len(tokenize(d["text"])) + 1

    per_chunk = out.groupby("chunk_id")["n_tok"].sum()
    total = int(per_doc.sum())
    assert sorted(per_chunk.index) == list(range((total + L - 1) // L))
    assert (per_chunk.iloc[:-1] == L).all()
    assert per_chunk.iloc[-1] == total - L * (len(per_chunk) - 1)

    # spans tile each chunk contiguously in doc_id order
    by_chunk = out.sort_values(["chunk_id", "chunk_pos"])
    for cid, g in by_chunk.groupby("chunk_id"):
        pos = 0
        for _, r in g.iterrows():
            assert r["chunk_pos"] == pos
            pos += r["n_tok"]

    out2 = _sorted(
        pack_sequence_spans(rd.from_items(docs, override_num_blocks=13), seq_len=L),
        ["doc_id", "chunk_id"],
    )
    assert out.equals(out2)


def test_pivot_conditional_agg_vs_duckdb(con):
    """rel_pivot: the two-pass conditional-aggregation pivot equals
    DuckDB's FILTER pivot on the same events table."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location("_entry_piv", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    got = _sorted(m.queries()["rel_pivot"](SF), ["user_id"])
    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = _sorted(c.sql(m.oracle_sql()["rel_pivot"]).df(), ["user_id"])
    assert list(got.columns).sort() == list(want.columns).sort()
    for col in want.columns:
        assert (got[col].to_numpy() == want[col].to_numpy()).all(), col


def test_cube_grouping_sets_vs_duckdb(con):
    """rel_cube: finest-level distributed agg + local re-agg equals
    GROUP BY CUBE."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("_entry_cube", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    got = m.queries()["rel_cube"](SF).to_pandas()
    want = con.sql(m.oracle_sql()["rel_cube"]).df()
    key = ["l_returnflag", "l_linestatus"]
    got = got.fillna({"l_returnflag": "~", "l_linestatus": "~"})
    want = want.fillna({"l_returnflag": "~", "l_linestatus": "~"})
    got, want = _sorted(got, key), _sorted(want, key)
    assert len(got) == len(want)
    for col in want.columns:
        assert (got[col].to_numpy() == want[col].to_numpy()).all(), col


def test_triangle_stats_known_graphs_and_partitioning_invariance():
    """K4 (4 triangles, 12 wedges) + a pendant path (1 wedge) + an
    isolated edge; census is exact and invariant to input block
    layout and bucket count."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        triangle_stats,
    )

    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges += [(5, 6), (6, 7), (8, 9)]
    t_expect = {
        "n_nodes": [9],
        "n_edges": [9],
        "n_wedges": [13],
        "n_triangles": [4],
        "transitivity_e6": [(3_000_000 * 4) // 13],
    }
    tbl = pa.table(
        {
            "doc_a": pa.array([e[0] for e in edges], pa.int64()),
            "doc_b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    for nparts, nbuck in ((1, 8), (4, 3)):
        ds = rd.from_arrow(tbl).repartition(nparts)
        got = triangle_stats(ds, num_buckets=nbuck)
        assert got.to_pydict() == t_expect


def test_triangle_stats_vs_duckdb_random_graph():
    """Erdos-Renyi-ish random graph: census matches the plain SQL
    triangle join (orientation-free ground truth)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        triangle_stats,
    )

    rng = np.random.default_rng(7)
    n = 60
    a = rng.integers(0, n, 400)
    b = rng.integers(0, n, 400)
    keep = a != b
    lo, hi = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    pairs = np.unique(np.stack([lo, hi], axis=1), axis=0)
    tbl = pa.table(
        {
            "doc_a": pa.array(pairs[:, 0], pa.int64()),
            "doc_b": pa.array(pairs[:, 1], pa.int64()),
        }
    )
    got = triangle_stats(rd.from_arrow(tbl).repartition(3), num_buckets=8).to_pydict()
    con = duckdb.connect()
    con.register("pairs", tbl)
    tri = con.sql(
        """SELECT count(*) FROM pairs e1
           JOIN pairs e2 ON e2.doc_a = e1.doc_b
           JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b"""
    ).fetchone()[0]
    wedges = con.sql(
        """SELECT CAST(sum((deg*(deg-1))//2) AS BIGINT) FROM (
             SELECT count(*) AS deg FROM (
               SELECT doc_a AS x FROM pairs UNION ALL SELECT doc_b FROM pairs)
             GROUP BY x)"""
    ).fetchone()[0]
    assert got["n_triangles"] == [int(tri)]
    assert got["n_wedges"] == [int(wedges)]
    assert got["n_edges"] == [len(pairs)]


def test_grouped_corr_exact_vs_duckdb(con):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        grouped_corr,
    )

    def quantize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "x": pa.array(
                    np.floor(t["l_quantity"].to_numpy(zero_copy_only=False)).astype(
                        np.int64
                    )
                ),
                "y": pa.array(
                    np.floor(
                        t["l_extendedprice"].to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                ),
            }
        )

    ds = (
        rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_quantity", "l_extendedprice"])
        .map_batches(quantize, batch_format="pyarrow")
        .repartition(5)
    )
    got = _sorted(grouped_corr(ds, ["l_returnflag"], "x", "y"), ["l_returnflag"])
    want = _sorted(
        con.sql(
            """
        WITH q AS (SELECT l_returnflag,
                          CAST(floor(l_quantity) AS HUGEINT) x,
                          CAST(floor(l_extendedprice) AS HUGEINT) y FROM lineitem),
        s AS (SELECT l_returnflag, CAST(count(*) AS HUGEINT) n, sum(x) sx, sum(y) sy,
                     sum(x*x) sxx, sum(y*y) syy, sum(x*y) sxy
              FROM q GROUP BY 1)
        SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
               CAST(floor(1000000.0 * CAST(n*sxy - sx*sy AS DOUBLE)
                    / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                       * sqrt(CAST(n*syy - sy*sy AS DOUBLE)))) AS BIGINT) AS corr_e6
        FROM s WHERE n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
        """
        ).df(),
        ["l_returnflag"],
    )
    assert got["n_rows"].tolist() == want["n_rows"].tolist()
    assert got["corr_e6"].tolist() == want["corr_e6"].tolist()


def test_grouped_string_agg_ordered_and_partitioning_invariant():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        grouped_string_agg,
    )

    t = pa.table(
        {
            "k": ["b", "a", "b", "a", "c", "b"],
            "v": ["z", "m", "a", "n", "q", "k"],
        }
    )
    want = {"a": "m,n", "b": "a,k,z", "c": "q"}
    for nparts in (1, 3):
        got = (
            grouped_string_agg(rd.from_arrow(t).repartition(nparts), "k", "v")
            .to_pandas()
            .set_index("k")
        )
        assert dict(got["agg"]) == want
        assert dict(got["n_values"]) == {"a": 2, "b": 3, "c": 1}


def test_kcore_known_graph_and_unconverged_rounds():
    """K5 (4-core) + a chain: 3-core keeps exactly the K5; rounds cap
    semantics — with rounds=1 only one peel is applied (matching the
    unrolled oracle), with enough rounds the fixpoint is reached."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        kcore_flags,
    )

    k5 = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    chain = [(6, 7), (7, 8), (8, 9)] + [(5, 6)]
    tbl = pa.table(
        {
            "doc_a": pa.array([e[0] for e in k5 + chain], pa.int64()),
            "doc_b": pa.array([e[1] for e in k5 + chain], pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(3)
    got = kcore_flags(ds, k=3, rounds=10).to_pydict()
    flags = dict(zip(got["doc_id"], got["in_core"]))
    assert all(flags[n] for n in range(1, 6))
    assert not any(flags[n] for n in range(6, 10))
    # one peel only: chain ends 9 (deg 1 < 2) drop, interior survives
    one = kcore_flags(ds, k=2, rounds=1).to_pydict()
    f1 = dict(zip(one["doc_id"], one["in_core"]))
    assert f1[9] is False and f1[8] is True and f1[7] is True
    # fixpoint of k=2: the chain unravels completely, K5+node6 stay
    fx = kcore_flags(ds, k=2, rounds=10).to_pydict()
    f2 = dict(zip(fx["doc_id"], fx["in_core"]))
    assert not f2[9] and not f2[8] and not f2[7] and not f2[6]
    assert all(f2[n] for n in range(1, 6))


def test_cocitation_pairs_matches_bruteforce():
    """cocitation_pairs on a synthetic (src_url, dst_url) edge set
    equals the brute-force per-src pair count, at two bucket counts
    (partitioning invariance)."""
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
        hash64,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        cocitation_pairs,
    )

    rng = np.random.default_rng(5)
    srcs, dsts = [], []
    pages = [f"http://h{i}.test:80/p{i}" for i in range(40)]
    for s in range(120):
        outs = rng.choice(40, size=rng.integers(2, 8), replace=False)
        for d in outs:
            srcs.append(f"http://src{s}.test:80/")
            dsts.append(pages[d])
            if rng.random() < 0.3:  # duplicate anchor — must count once
                srcs.append(f"http://src{s}.test:80/")
                dsts.append(pages[d])

    # brute force
    from collections import defaultdict

    by_src = defaultdict(set)
    for s, d in zip(srcs, dsts):
        by_src[s].add(hash64(d))
    counts = defaultdict(int)
    for s, ds_ in by_src.items():
        for a, b in itertools.combinations(sorted(ds_), 2):
            counts[(a, b)] += 1
    min_common = 2
    want = sorted((a, b, n) for (a, b), n in counts.items() if n >= min_common)
    assert want, "fixture produced no co-cited pairs"

    t = pa.table({"src_url": pa.array(srcs), "dst_url": pa.array(dsts)})
    for nbuck in (8, 64):
        got = (
            cocitation_pairs(
                rd.from_arrow(t), min_common=min_common, num_buckets=nbuck
            )
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
        )
        assert [tuple(r) for r in got.itertuples(index=False)] == want, nbuck


def test_grouped_linfit_exact_vs_numpy_rational():
    import math
    from fractions import Fraction

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        grouped_linfit,
    )

    rng = np.random.default_rng(5)
    g = rng.integers(0, 3, 400)
    x = rng.integers(0, 50, 400).astype(np.int64)
    y = (3 * x + 7 + rng.integers(-5, 6, 400)).astype(np.int64)
    tbl = pa.table({"g": pa.array(g.astype(np.int64)), "x": pa.array(x), "y": pa.array(y)})
    got = _sorted(
        grouped_linfit(rd.from_arrow(tbl).repartition(6), ["g"], "x", "y"), ["g"]
    )
    for i, gv in enumerate(got["g"]):
        m = g == gv
        n, sx, sy = int(m.sum()), int(x[m].sum()), int(y[m].sum())
        sxx, sxy = int((x[m] * x[m]).sum()), int((x[m] * y[m]).sum())
        d1, num = n * sxx - sx * sx, n * sxy - sx * sy
        slope = Fraction(num, d1)
        intercept = Fraction(sy, n) - slope * Fraction(sx, n)
        assert got["slope_e6"][i] == (1_000_000 * num) // d1
        assert got["intercept_e6"][i] == math.floor(1_000_000 * intercept)
        # sanity: the planted line y = 3x + 7 is recovered closely
        assert abs(got["slope_e6"][i] - 3_000_000) < 60_000
        assert abs(got["intercept_e6"][i] - 7_000_000) < 1_600_000


def test_grouped_spearman_matches_naive():
    import math

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        grouped_spearman,
    )

    rng = np.random.default_rng(9)
    g = rng.integers(0, 2, 300).astype(np.int64)
    x = rng.integers(0, 20, 300).astype(np.int64)  # heavy ties
    y = (x * 2 + rng.integers(0, 15, 300)).astype(np.int64)
    tbl = pa.table({"g": pa.array(g), "x": pa.array(x), "y": pa.array(y)})
    got = _sorted(grouped_spearman(rd.from_arrow(tbl).repartition(7), "g", "x", "y"), ["g"])

    def rank2(vals):
        # 2 * average rank (integer under ties)
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        r = [0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            # ranks i+1..j averaged, doubled: (i+1 + j) exactly
            for k in range(i, j):
                r[order[k]] = (i + 1) + j
            i = j
        return r

    for gi, gv in enumerate(got["g"]):
        m = g == gv
        rx = rank2(list(x[m]))
        ry = rank2(list(y[m]))
        n = len(rx)
        sx, sy = sum(rx), sum(ry)
        sxx = sum(v * v for v in rx)
        syy = sum(v * v for v in ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        num = n * sxy - sx * sy
        d1, d2 = n * sxx - sx * sx, n * syy - sy * sy
        want = math.floor(1_000_000.0 * num / (math.sqrt(d1) * math.sqrt(d2)))
        assert got["spearman_e6"][gi] == want
        assert got["spearman_e6"][gi] > 500_000  # planted monotone signal


def test_grouped_welch_t_matches_naive():
    import math

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        grouped_welch_t,
    )

    rng = np.random.default_rng(13)
    g = rng.integers(0, 2, 400).astype(np.int64)
    v = rng.integers(0, 2, 400).astype(np.int64)
    # variant 1 shifted up in group 0 only
    x = (rng.integers(0, 50, 400) + np.where((g == 0) & (v == 1), 30, 0)).astype(
        np.int64
    )
    tbl = pa.table({"g": pa.array(g), "variant": pa.array(v), "x": pa.array(x)})
    got = _sorted(
        grouped_welch_t(rd.from_arrow(tbl).repartition(5), "g", "variant", "x"), ["g"]
    )
    for gi, gv in enumerate(got["g"]):
        stats = []
        for vv in (0, 1):
            m = (g == gv) & (v == vv)
            n, s = int(m.sum()), int(x[m].sum())
            ss = int((x[m].astype(object) ** 2).sum())
            stats.append((n, s, n * ss - s * s))
        (n0, s0, d0), (n1, s1, d1) = stats
        t = (s1 / n1 - s0 / n0) / math.sqrt(
            d1 / (n1 * n1 * (n1 - 1)) + d0 / (n0 * n0 * (n0 - 1))
        )
        assert got["t_e6"][gi] == math.floor(1_000_000.0 * t)
    # planted lift shows up, null group doesn't
    td = dict(zip(got["g"], got["t_e6"]))
    assert td[0] > 5_000_000 and abs(td[1]) < 3_000_000


def test_chi2_formula_manual():
    # exact per-cell-floor chi-squared on a planted dependent table
    obs = {("a", 0): 30, ("a", 1): 10, ("b", 0): 10, ("b", 1): 30}
    rows, cols = ("a", "b"), (0, 1)
    R = {r: sum(obs[(r, c)] for c in cols) for r in rows}
    C = {c: sum(obs[(r, c)] for r in rows) for c in cols}
    N = sum(R.values())
    chi2q = sum(
        (1_000_000 * (obs[(r, c)] * N - R[r] * C[c]) ** 2) // (N * R[r] * C[c])
        for r in rows
        for c in cols
    )
    # classic chi2 for this table is 20.0; per-cell floors lose < 4 ulp-micros
    assert abs(chi2q - 20_000_000) <= 4
    # and the engine's driver fold is the same expression — assert on
    # the real sf0.001 events via the registered query
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    t = entry.queries()["rel_chi2"]("/root/testdata/sf0.001")
    assert t["dof"][0].as_py() >= 1 and t["chi2q_e6"][0].as_py() > 0


def test_grouped_gini_matches_naive():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        grouped_gini,
    )

    rng = np.random.default_rng(17)
    g = rng.integers(0, 2, 250).astype(np.int64)
    # group 0 ~ uniform (moderate gini), group 1 nearly constant (low)
    x = np.where(g == 0, rng.integers(0, 100, 250), 50 + rng.integers(0, 2, 250)).astype(
        np.int64
    )
    tbl = pa.table({"g": pa.array(g), "x": pa.array(x)})
    got = _sorted(grouped_gini(rd.from_arrow(tbl).repartition(6), "g", "x"), ["g"])
    for gi, gv in enumerate(got["g"]):
        vals = sorted(x[g == gv].tolist())
        n = len(vals)
        T = sum(vals)
        S = sum((i + 1) * v for i, v in enumerate(vals))
        want = (1_000_000 * (2 * S - (n + 1) * T)) // (n * T)
        assert got["gini_e6"][gi] == want
    gd = dict(zip(got["g"], got["gini_e6"]))
    assert gd[0] > 200_000 and gd[1] < 50_000  # planted shapes


def test_kmv_union_accuracy_and_exactness():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        kmv_union_estimates,
    )

    rng = np.random.default_rng(23)
    # type A: users 0..999, type B: 500..1499 (union = 1500); type C: 10 users
    rows_g, rows_v = [], []
    for _ in range(3000):
        rows_g.append("A"); rows_v.append(int(rng.integers(0, 1000)))
        rows_g.append("B"); rows_v.append(int(rng.integers(500, 1500)))
    for u in range(10):
        rows_g.append("C"); rows_v.append(u)
    tbl = pa.table({"g": pa.array(rows_g), "v": pa.array(rows_v, pa.int64())})
    got = kmv_union_estimates(
        rd.from_arrow(tbl).repartition(6), "g", "v", k=64
    ).to_pandas()
    est = {(r.type_a, r.type_b): r.est_union for r in got.itertuples()}
    # A∪B true 1500: KMV k=64 has ~12% relative error
    assert abs(est[("A", "B")] - 1500) < 450
    # C is unsaturated but A saturated -> estimator branch; magnitude sane
    assert 600 < est[("A", "C")] < 1600


def test_changepoint_planted_shift():
    # planted rate shift on day 50 must be the argmax deviation
    import sys

    sys.path.insert(0, "/root/repo")
    days = list(range(100))
    counts = {d: (10 if d < 50 else 30) for d in days}
    m, n = len(days), sum(counts.values())
    s, best, best_day = 0, -1, None
    for i, d in enumerate(days, start=1):
        s += counts[d]
        dev = abs(m * s - i * n)
        if dev > best:
            best, best_day = dev, d
    assert best_day == 49  # last low day — the boundary
    import __ray_entry__ as entry

    t = entry.queries()["rel_changepoint"]("/root/testdata/sf0.001")
    assert t.num_rows >= 1 and all(v >= 0 for v in t["cusum_max"].to_pylist())


def test_grouped_ks_test_matches_naive():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        grouped_ks_test,
    )

    rng = np.random.default_rng(23)
    g = rng.integers(0, 2, 500).astype(np.int64)
    v = rng.integers(0, 2, 500).astype(np.int64)
    # group 0: variant 1 drawn wider (same mean) — a pure shape shift
    x = np.where(
        (g == 0) & (v == 1),
        rng.integers(0, 100, 500),
        40 + rng.integers(0, 20, 500),
    ).astype(np.int64)
    tbl = pa.table({"g": pa.array(g), "variant": pa.array(v), "x": pa.array(x)})
    got = _sorted(
        grouped_ks_test(rd.from_arrow(tbl).repartition(5), "g", "variant", "x"), ["g"]
    )
    for gi, gv in enumerate(got["g"]):
        xa = np.sort(x[(g == gv) & (v == 0)])
        xb = np.sort(x[(g == gv) & (v == 1)])
        na, nb = len(xa), len(xb)
        dnum = 0
        for t in np.unique(np.concatenate([xa, xb])):
            dnum = max(
                dnum, abs(int(nb) * int((xa <= t).sum()) - int(na) * int((xb <= t).sum()))
            )
        assert got["n_a"][gi] == na and got["n_b"][gi] == nb
        assert got["ks_e6"][gi] == (1_000_000 * dnum) // (na * nb)
    kd = dict(zip(got["g"], got["ks_e6"]))
    assert kd[0] > 200_000 and kd[1] < 150_000  # planted shape shift


def test_grouped_mannwhitney_matches_naive():
    import math

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        grouped_mannwhitney,
    )

    rng = np.random.default_rng(29)
    g = rng.integers(0, 2, 300).astype(np.int64)
    v = rng.integers(0, 2, 300).astype(np.int64)
    x = (rng.integers(0, 30, 300) + np.where((g == 0) & (v == 1), 10, 0)).astype(
        np.int64
    )
    tbl = pa.table({"g": pa.array(g), "variant": pa.array(v), "x": pa.array(x)})
    got = _sorted(
        grouped_mannwhitney(rd.from_arrow(tbl).repartition(5), "g", "variant", "x"),
        ["g"],
    )
    for gi, gv in enumerate(got["g"]):
        xa = x[(g == gv) & (v == 0)].astype(object)
        xb = x[(g == gv) & (v == 1)].astype(object)
        na, nb = len(xa), len(xb)
        # brute-force doubled U: 2*#(x1 > x0) + #(x1 == x0) over pairs
        u2 = int(sum(2 * int((xa < b).sum()) + int((xa == b).sum()) for b in xb))
        assert got["u2"][gi] == u2
        nn = na + nb
        t3 = sum(
            int(c) ** 3 - int(c)
            for c in np.unique(np.concatenate([xa, xb]), return_counts=True)[1]
        )
        sa = na * nb * ((nn + 1) * nn * (nn - 1) - t3)
        sb = 12 * nn * (nn - 1)
        z = float(u2 - na * nb) / (2.0 * math.sqrt(float(sa) / float(sb)))
        assert got["z_e6"][gi] == math.floor(1_000_000.0 * z)
    zd = dict(zip(got["g"], got["z_e6"]))
    assert zd[0] > 3_000_000 and abs(zd[1]) < 3_000_000  # planted lift


def test_degree_assortativity_known_graphs():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        degree_assortativity,
    )

    # star K1,5: every edge joins deg 5 to deg 1 -> r = -1 exactly
    star = pa.table(
        {
            "doc_a": pa.array([0, 0, 0, 0, 0], pa.int64()),
            "doc_b": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }
    )
    t = degree_assortativity(rd.from_arrow(star))
    assert t["n_nodes"][0].as_py() == 6 and t["n_edges"][0].as_py() == 5
    assert t["assort_e6"][0].as_py() == -1_000_000

    # path 0-1-2-3: exact r from the numpy moments on both orientations
    path = pa.table(
        {
            "doc_a": pa.array([0, 1, 2], pa.int64()),
            "doc_b": pa.array([1, 2, 3], pa.int64()),
        }
    )
    deg = {0: 1, 1: 2, 2: 2, 3: 1}
    xs = []
    for a, b in [(0, 1), (1, 2), (2, 3)]:
        xs += [(deg[a], deg[b]), (deg[b], deg[a])]
    m = len(xs)
    sx = sum(a for a, _ in xs)
    sxx = sum(a * a for a, _ in xs)
    sxy = sum(a * b for a, b in xs)
    want = (1_000_000 * (m * sxy - sx * sx)) // (m * sxx - sx * sx)
    t = degree_assortativity(rd.from_arrow(path))
    assert t["assort_e6"][0].as_py() == want


def test_harmonic_closeness_on_fixture_graph():
    # directed 0->1->2->3 plus 0->2: from 0, depths are {1:1, 2:1, 3:2}
    # -> harmonic = 1e6 + 1e6 + 500000; horizon cuts deeper nodes off
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        frontier_bfs,
    )

    edges = pa.table(
        {
            "src_url": pa.array(["u0", "u1", "u2", "u0"]),
            "dst_url": pa.array(["u1", "u2", "u3", "u2"]),
        }
    )
    reach = frontier_bfs(rd.from_arrow(edges), ["u0"], max_depth=6)
    d = dict(zip(reach["url"].to_pylist(), reach["depth"].to_pylist()))
    assert d == {"u0": 0, "u1": 1, "u2": 1, "u3": 2}
    harmonic = sum(1_000_000 // v for v in d.values() if v > 0)
    assert harmonic == 2_500_000
    # horizon 1: node u3 unreached
    reach1 = frontier_bfs(rd.from_arrow(edges), ["u0"], max_depth=1)
    assert set(reach1["url"].to_pylist()) == {"u0", "u1", "u2"}


def test_seasonality_share_is_exact_and_zero_filled():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    t = entry.queries()["rel_seasonality"]("/root/testdata/sf0.001")
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    # all 7 dows per type, shares sum to ~1e6 per type (floor slack < 7)
    for et, g in df.groupby("event_type"):
        assert sorted(g["dow"].tolist()) == list(range(7))
        assert g["n"].sum() > 0
        s = g["share_e6"].sum()
        assert 1_000_000 - 6 <= s <= 1_000_000
        for _i, row in g.iterrows():
            assert row["share_e6"] == (1_000_000 * row["n"]) // g["n"].sum()


def test_bowtie_on_fixture_graph():
    # core cycle a<->b, in-node i->a, out-node b->o, disconnected x->y
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        frontier_bfs,
    )

    edges = pa.table(
        {
            "src_url": pa.array(["a", "b", "i", "b", "x"]),
            "dst_url": pa.array(["b", "a", "a", "o", "y"]),
        }
    )
    ds = rd.from_arrow(edges)
    # pivot by (out_deg desc, url): b has out-degree 2
    fwd = set(frontier_bfs(ds, ["b"], max_depth=8)["url"].to_pylist())
    rev = rd.from_arrow(
        pa.table({"src_url": edges["dst_url"], "dst_url": edges["src_url"]})
    )
    bwd = set(frontier_bfs(rev, ["b"], max_depth=8)["url"].to_pylist())
    core = fwd & bwd
    assert core == {"a", "b"}
    assert bwd - core == {"i"} and fwd - core == {"o"}
    nodes = {"a", "b", "i", "o", "x", "y"}
    assert len(nodes) - len(fwd | bwd) == 2  # the x->y tendril pair


def test_lift_and_rate_test_self_consistent():
    import duckdb as _dd
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    lift = entry.queries()["rel_lift"](sf).to_pandas()
    n_users = _dd.sql(
        f"SELECT count(DISTINCT user_id) FROM '{sf}/events.parquet'"
    ).fetchone()[0]
    for _i, r in lift.iterrows():
        assert r["n_ab"] <= min(r["n_a"], r["n_b"])
        assert r["lift_e6"] == (1_000_000 * n_users * r["n_ab"]) // (
            r["n_a"] * r["n_b"]
        )
    rate = entry.queries()["rel_rate_test"](sf).to_pandas()
    import math

    for _i, r in rate.iterrows():
        z = float(r["n_b"] - r["n_a"]) / math.sqrt(float(r["n_b"] + r["n_a"]))
        assert r["z_e6"] == math.floor(1_000_000.0 * z)
