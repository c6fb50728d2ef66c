"""Relational operator semantics (stages/ops.py) vs DuckDB on the
driver testdata tables — the Flame operator inventory (SURVEY §2.1)
re-expressed Ray-Data-first."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
    broadcast_join,
    cogroup,
    distinct_on,
    intersection,
    shuffle_join,
)

SF = "/root/testdata/sf0.001"


def _sorted_pandas(obj, by):
    df = obj.to_pandas() if hasattr(obj, "to_pandas") else obj
    return df.sort_values(by).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "customer", "nation", "lineitem", "part"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def test_broadcast_join_inner(con):
    ds = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    cust = cust.rename_columns(["o_custkey", "c_nationkey"])
    got = broadcast_join(ds, cust, on="o_custkey").to_pandas()
    want = con.sql(
        "SELECT o_orderkey, o_custkey, c_nationkey FROM orders "
        "JOIN customer ON o_custkey = c_custkey"
    ).df()
    got = _sorted_pandas(got, ["o_orderkey"])
    want = _sorted_pandas(want, ["o_orderkey"])
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    assert got["c_nationkey"].tolist() == want["c_nationkey"].tolist()


def test_distinct_on_single_and_multi(con):
    ds = rd.read_parquet(f"{SF}/lineitem.parquet")
    single = distinct_on(ds, ["l_returnflag"]).to_pandas()
    want1 = con.sql("SELECT DISTINCT l_returnflag FROM lineitem").df()
    assert sorted(single["l_returnflag"]) == sorted(want1["l_returnflag"])

    multi = distinct_on(ds, ["l_returnflag", "l_linestatus"]).to_pandas()
    want2 = con.sql("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem").df()
    got_pairs = sorted(map(tuple, multi[["l_returnflag", "l_linestatus"]].values))
    want_pairs = sorted(map(tuple, want2[["l_returnflag", "l_linestatus"]].values))
    assert got_pairs == want_pairs


def test_grouped_count_distinct(con):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        grouped_count_distinct,
    )

    ds = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_suppkey"])
    got = _sorted_pandas(
        grouped_count_distinct(ds, "l_returnflag", "l_suppkey"), ["l_returnflag"]
    )
    want = _sorted_pandas(
        con.sql(
            "SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_distinct "
            "FROM lineitem GROUP BY l_returnflag"
        ).df(),
        ["l_returnflag"],
    )
    assert got["l_returnflag"].tolist() == want["l_returnflag"].tolist()
    assert got["n_distinct"].tolist() == want["n_distinct"].tolist()
    # partitioning invariance: a different bucket count is a pure
    # physical knob — identical result
    got2 = _sorted_pandas(
        grouped_count_distinct(ds, "l_returnflag", "l_suppkey", num_buckets=7),
        ["l_returnflag"],
    )
    assert got2["n_distinct"].tolist() == want["n_distinct"].tolist()


def test_funnel_counts():
    """Greedy ordered-funnel semantics pinned on a hand-built case
    (out-of-order steps don't count; equal timestamps don't count —
    strictly after), plus partitioning invariance."""
    import datetime as dt

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        funnel_counts,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(u, typ, sec):
        return {"user_id": u, "event_type": typ, "ts": t0 + dt.timedelta(seconds=sec)}

    rows = [
        # u1: full funnel in order
        ev(1, "a", 0), ev(1, "b", 1), ev(1, "c", 2),
        # u2: b before a -> reaches only step a (the later b is gone)
        ev(2, "b", 0), ev(2, "a", 1),
        # u3: a and b simultaneous -> b not strictly after a
        ev(3, "a", 5), ev(3, "b", 5),
        # u4: a, b in order; c before b -> stops at b
        ev(4, "c", 0), ev(4, "a", 1), ev(4, "b", 2),
        # u5: noise only
        ev(5, "x", 0),
        # u6: greedy chain must use the SECOND b (first b precedes a)
        ev(6, "b", 0), ev(6, "a", 1), ev(6, "b", 2), ev(6, "c", 3),
    ]
    for parts in (1, 4):
        ds = rd.from_items(rows).repartition(parts)
        got = (
            funnel_counts(ds, ["a", "b", "c"], num_buckets=5)
            .to_pandas()
            .sort_values("step_idx")
            .reset_index(drop=True)
        )
        assert got["step"].tolist() == ["a", "b", "c"]
        # a: u1,u2,u3,u4,u6; b: u1,u4,u6; c: u1,u6
        assert got["n_users"].tolist() == [5, 3, 2]


def test_watermark_window_counts():
    """Watermark semantics pinned by hand: an event arriving more than
    delay_s behind the running event-time high-water mark is late;
    the running max carries ACROSS blocks (partitioning invariance)."""
    import datetime as dt

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        watermark_window_counts,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(arr, ts_min):
        return {"event_id": arr, "ts": t0 + dt.timedelta(minutes=ts_min)}

    rows = [
        ev(1, 0),     # hwm 0
        ev(2, 120),   # hwm 120 (window 2, on time)
        ev(3, 100),   # 20 min behind hwm -> late at delay 10 min
        ev(4, 125),   # 0-behind? hwm 125 now, on time
        ev(5, 118),   # 7 min behind -> on time at delay 10
        ev(6, 30),    # 95 behind -> late
    ]
    # windows (1h): w0: ev1(on), ev6(late); w1: ev3(late), ev5(on); w2: ev2, ev4 (on)
    base_s = int((t0 - dt.datetime(1970, 1, 1)).total_seconds())
    expect = {
        base_s: (1, 1),
        base_s + 3600: (1, 1),
        base_s + 7200: (2, 0),
    }
    for parts in (1, 3):
        ds = rd.from_items(rows).repartition(parts)
        got = watermark_window_counts(ds, delay_s=600).to_pandas()
        m = {
            int(r.window_start_s): (int(r.n_on_time), int(r.n_late))
            for r in got.itertuples()
        }
        assert m == expect, (parts, m)


def test_retention_cohorts():
    """Retention semantics pinned by hand: cohort = first active day,
    duplicate same-day activity counts once, k=0 excluded; plus
    partitioning invariance."""
    import datetime as dt

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        retention_cohorts,
    )

    def ev(u, day, sec=0):
        return {
            "user_id": u,
            "ts": dt.datetime(2024, 1, 1) + dt.timedelta(days=day, seconds=sec),
        }

    rows = [
        # u1: first day 0, returns day 1 (twice -> counts once) and day 3
        ev(1, 0), ev(1, 1), ev(1, 1, 5), ev(1, 3),
        # u2: first day 1, returns day 2
        ev(2, 1), ev(2, 2),
        # u3: single day only -> no retention rows
        ev(3, 0), ev(3, 0, 7),
    ]
    d0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    want = sorted([(d0, 1, 1), (d0, 3, 1), (d0 + 1, 1, 1)])
    for parts in (1, 3):
        ds = rd.from_items(rows).repartition(parts)
        got = retention_cohorts(ds, num_buckets=4).to_pandas()
        got_rows = sorted(map(tuple, got[["cohort_day", "k", "n_users"]].values))
        assert got_rows == want


def test_grouped_mode(con):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        grouped_mode,
    )

    ds = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_suppkey", "l_returnflag"])
    got = _sorted_pandas(
        grouped_mode(ds, "l_suppkey", "l_returnflag", num_buckets=9), ["l_suppkey"]
    )
    want = _sorted_pandas(
        con.sql(
            "SELECT l_suppkey, l_returnflag, n_occ FROM ("
            "  SELECT l_suppkey, l_returnflag, count(*) AS n_occ,"
            "         row_number() OVER (PARTITION BY l_suppkey"
            "                            ORDER BY count(*) DESC, l_returnflag) AS rn"
            "  FROM lineitem GROUP BY l_suppkey, l_returnflag) WHERE rn = 1"
        ).df(),
        ["l_suppkey"],
    )
    assert got["l_suppkey"].tolist() == want["l_suppkey"].tolist()
    assert got["l_returnflag"].tolist() == want["l_returnflag"].tolist()
    assert got["n_occ"].tolist() == want["n_occ"].tolist()


def test_intersection(con):
    early = rd.read_parquet(f"{SF}/orders.parquet").filter(
        lambda r: r["o_orderpriority"] == "1-URGENT"
    )
    late = rd.read_parquet(f"{SF}/orders.parquet").filter(
        lambda r: r["o_orderpriority"] == "2-HIGH"
    )
    got = intersection(early, late, "o_custkey").to_pandas()
    want = con.sql(
        "SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority='1-URGENT' "
        "INTERSECT SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority='2-HIGH'"
    ).df()
    assert sorted(got["o_custkey"]) == sorted(want["o_custkey"])


def test_shuffle_join_matches_sql(con):
    left = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey", "o_orderkey"])
    right = rd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    right = right.map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_nationkey"]), batch_format="pyarrow"
    )
    got = shuffle_join(
        left, right, "o_custkey", left_cols=["o_orderkey"], right_cols=["c_nationkey"]
    ).to_pandas()
    want = con.sql(
        "SELECT o_custkey, o_orderkey, c_nationkey FROM orders "
        "JOIN customer ON o_custkey = c_custkey"
    ).df()
    got = _sorted_pandas(got, ["o_orderkey"])
    want = _sorted_pandas(want, ["o_orderkey"])
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    assert got["c_nationkey"].tolist() == want["c_nationkey"].tolist()


def test_cogroup_counts():
    left = rd.from_items([{"k": "a", "v": 1}, {"k": "a", "v": 2}, {"k": "b", "v": 3}])
    right = rd.from_items([{"k": "a", "w": 10}, {"k": "c", "w": 30}])

    def counts(l: pa.Table, r: pa.Table) -> pa.Table:
        key = l["k"][0] if l.num_rows else r["k"][0]
        return pa.table(
            {
                "k": pa.array([key.as_py()], pa.string()),
                "nl": pa.array([l.num_rows], pa.int64()),
                "nr": pa.array([r.num_rows], pa.int64()),
            }
        )

    got = cogroup(left, right, "k", counts).to_pandas().sort_values("k")
    assert got["k"].tolist() == ["a", "b", "c"]
    assert got["nl"].tolist() == [2, 1, 0]
    assert got["nr"].tolist() == [1, 0, 1]


def test_sample_with_replacement(ray_session):
    """Deterministic Poisson multiplicities: expected size ~ fraction*N,
    duplicates present at fraction>1, and bit-stable across runs."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        poisson_breakpoints,
        sample_with_replacement,
    )

    tbl = pa.table({"k": pa.array(list(range(2000)), pa.int64())})
    out1 = sample_with_replacement(rd.from_arrow(tbl), 1.5, "k", seed=7).to_pandas()
    out2 = sample_with_replacement(rd.from_arrow(tbl), 1.5, "k", seed=7).to_pandas()
    assert sorted(out1["k"]) == sorted(out2["k"])  # deterministic
    assert 0.8 * 1.5 * 2000 < len(out1) < 1.2 * 1.5 * 2000  # expected size
    counts = out1["k"].value_counts()
    assert counts.max() >= 2  # replacement: some key drawn twice+
    # a different seed gives a different multiset
    out3 = sample_with_replacement(rd.from_arrow(tbl), 1.5, "k", seed=8).to_pandas()
    assert sorted(out3["k"]) != sorted(out1["k"])
    # breakpoints are a proper CDF
    bps = poisson_breakpoints(1.5)
    assert all(b2 > b1 for b1, b2 in zip(bps, bps[1:])) and bps[-1] < 1.0 + 1e-12


def test_grouped_quantiles_matches_duckdb_rule():
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        grouped_quantiles,
    )

    rng = np.random.default_rng(11)
    n = 5000
    t = pa.table(
        {
            "g": pa.array(rng.choice(["a", "b", "c"], n).tolist()),
            "v": pa.array(np.round(rng.uniform(0, 50, n), 2)),
        }
    )
    out = {
        r["g"]: r
        for r in grouped_quantiles(rd.from_arrow(t), "g", "v", (0.5, 0.9, 0.99)).take_all()
    }
    con = duckdb.connect()
    want = con.sql(
        "SELECT g, quantile_disc(CAST(round(v*100) AS BIGINT), 0.5) p50,"
        " quantile_disc(CAST(round(v*100) AS BIGINT), 0.9) p90,"
        " quantile_disc(CAST(round(v*100) AS BIGINT), 0.99) p99 FROM t GROUP BY g"
    ).fetchall()
    assert len(out) == 3
    for g, p50, p90, p99 in want:
        assert (out[g]["p50_e2"], out[g]["p90_e2"], out[g]["p99_e2"]) == (p50, p90, p99)

    # adversarial (q, n): binary-float q*n floats just above the true
    # integer (0.07*100 == 7.000000000000001), which used to pick one
    # rank too high; n=100 distinct values make any off-by-one visible
    t100 = pa.table(
        {"g": pa.array(["x"] * 100), "v": pa.array(np.arange(100, dtype=float))}
    )
    qs = (0.07, 0.14, 0.28, 0.55, 0.56)
    out100 = grouped_quantiles(rd.from_arrow(t100), "g", "v", qs).take_all()[0]
    exprs = ", ".join(
        f"quantile_disc(CAST(round(v*100) AS BIGINT), {q}) q{i}"
        for i, q in enumerate(qs)
    )
    want100 = con.sql(f"SELECT {exprs} FROM t100").fetchone()
    got100 = tuple(
        out100[f"p{q * 100:g}_e2".replace(".", "_")] for q in qs
    )
    assert got100 == want100


def test_anti_join_keys(con):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        anti_join_keys,
    )

    cust = rd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    urgent = (
        rd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey", "o_orderpriority"])
        .filter(lambda r: r["o_orderpriority"] == "1-URGENT")
        .select_columns(["o_custkey"])
        .rename_columns({"o_custkey": "c_custkey"})
    )
    got = anti_join_keys(cust, urgent, "c_custkey").to_pandas()
    want = con.sql(
        "SELECT DISTINCT c_custkey FROM customer WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders WHERE o_orderpriority='1-URGENT')"
    ).df()
    assert sorted(got["c_custkey"]) == sorted(want["c_custkey"])
    # empty-right degenerate: every left key survives
    none = (
        rd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"])
        .filter(lambda r: r["o_totalprice"] < 0)
        .select_columns(["o_custkey"])
        .rename_columns({"o_custkey": "c_custkey"})
    )
    all_kept = anti_join_keys(cust, none, "c_custkey").to_pandas()
    n_cust = con.sql("SELECT count(DISTINCT c_custkey) FROM customer").fetchone()[0]
    assert len(all_kept) == n_cust


def test_semi_join_keys(con):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        semi_join_keys,
    )

    cust = rd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    urgent = (
        rd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey", "o_orderpriority"])
        .filter(lambda r: r["o_orderpriority"] == "1-URGENT")
        .select_columns(["o_custkey"])
        .rename_columns({"o_custkey": "c_custkey"})
    )
    got = semi_join_keys(cust, urgent, "c_custkey").to_pandas()
    want = con.sql(
        "SELECT DISTINCT c_custkey FROM customer WHERE c_custkey IN "
        "(SELECT o_custkey FROM orders WHERE o_orderpriority='1-URGENT')"
    ).df()
    assert sorted(got["c_custkey"]) == sorted(want["c_custkey"])


def test_topn_per_group(con):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        topn_per_group,
    )

    li = rd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_returnflag", "l_quantity"]
    )
    got = topn_per_group(
        li,
        "l_returnflag",
        5,
        [("l_quantity", "descending"), ("l_orderkey", "ascending")],
    ).to_pandas()
    want = con.sql(
        "SELECT l_returnflag, l_orderkey, l_quantity FROM ("
        "  SELECT *, row_number() OVER ("
        "    PARTITION BY l_returnflag ORDER BY l_quantity DESC, l_orderkey) rn"
        "  FROM lineitem) WHERE rn <= 5"
    ).df()
    key = ["l_returnflag", "l_orderkey", "l_quantity"]
    got_rows = sorted(map(tuple, got[key].values))
    want_rows = sorted(map(tuple, want[key].values))
    assert got_rows == want_rows


def test_skew_join_matches_plain_join(con):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        skew_join,
    )

    li = rd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_linenumber", "l_quantity"]
    ).map_batches(
        lambda t: t.rename_columns(["orderkey", "l_linenumber", "l_quantity"]),
        batch_format="pyarrow",
    )
    od = rd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
    ).map_batches(
        lambda t: t.rename_columns(["orderkey", "o_orderstatus"]),
        batch_format="pyarrow",
    )
    # threshold 2 at this scale: a large share of orders is HOT, so the
    # salting path (fact salts + dim replication) is genuinely exercised
    got = skew_join(
        li,
        od,
        "orderkey",
        fact_cols=["l_linenumber", "l_quantity"],
        dim_cols=["o_orderstatus"],
        salt_col="l_linenumber",
        num_salts=4,
        hot_count_threshold=2,
    ).to_pandas()
    want = con.sql(
        "SELECT l_orderkey AS orderkey, l_linenumber, l_quantity, o_orderstatus "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).df()
    # the hot path must actually fire: >= 1 order has >= 2 lineitems
    n_hot = con.sql(
        "SELECT count(*) FROM (SELECT l_orderkey FROM lineitem "
        "GROUP BY l_orderkey HAVING count(*) >= 2)"
    ).fetchone()[0]
    assert n_hot > 0
    key = ["orderkey", "l_linenumber", "l_quantity", "o_orderstatus"]
    assert sorted(map(tuple, got[key].values)) == sorted(map(tuple, want[key].values))


def test_kmv_distinct_exact_below_k_and_estimate_above(con):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        kmv_distinct,
    )

    ds = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderpriority", "o_custkey"])
    # k larger than any group's distinct count -> EXACT counts
    got = kmv_distinct(ds, "o_orderpriority", "o_custkey", k=100_000).to_pandas()
    want = con.sql(
        "SELECT o_orderpriority, count(DISTINCT o_custkey) AS n FROM orders "
        "GROUP BY o_orderpriority"
    ).df()
    g = dict(zip(got["o_orderpriority"], got["est_distinct"]))
    for p, n in zip(want["o_orderpriority"], want["n"]):
        assert g[p] == n, (p, g[p], n)

    # small k -> estimator mode; must be within 3 sigma (~3/sqrt(k)) of
    # the true count for every group (k=64 -> 37.5%)
    est = kmv_distinct(ds, "o_orderpriority", "o_custkey", k=64).to_pandas()
    e = dict(zip(est["o_orderpriority"], est["est_distinct"]))
    for p, n in zip(want["o_orderpriority"], want["n"]):
        assert abs(e[p] - n) <= max(8, 0.375 * n), (p, e[p], n)


def test_zip_with_index_is_dense_and_order_correct(con):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        zip_with_index,
    )

    ds = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    got = zip_with_index(
        ds, ["o_orderdate", "o_orderkey"], out_cols=["o_orderkey"]
    ).to_pandas()
    want = con.sql(
        "SELECT o_orderkey, row_number() OVER (ORDER BY o_orderdate, o_orderkey) - 1 "
        "AS row_idx FROM orders"
    ).df()
    gm = dict(zip(got["o_orderkey"], got["row_idx"]))
    assert len(gm) == len(want)
    for k, idx in zip(want["o_orderkey"], want["row_idx"]):
        assert gm[k] == idx


def test_hash_split_deterministic_and_partition_invariant():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        hash_split,
    )

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    ds = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
    a = hash_split(ds, "o_orderkey", fr).to_pandas()
    b = hash_split(ds.repartition(7), "o_orderkey", fr).to_pandas()
    ma = dict(zip(a["o_orderkey"], a["split"]))
    mb = dict(zip(b["o_orderkey"], b["split"]))
    assert ma == mb  # same key -> same split regardless of partitioning
    n = len(ma)
    counts = a["split"].value_counts()
    # fractions hold within sampling noise (4 sigma of binomial)
    for name, f in fr.items():
        got = counts.get(name, 0)
        assert abs(got - f * n) <= 4 * (f * (1 - f) * n) ** 0.5 + 1, (name, got, n)


def test_hash_split_rejects_bad_fractions():
    import pytest as _pytest

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        hash_split,
    )

    ds = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
    with _pytest.raises(ValueError):
        hash_split(ds, "o_orderkey", {"a": 0.5, "b": 0.3})


def test_budget_sample_per_group_matches_reference():
    """Deterministic per-group budget prefix (domain mixing) vs a
    single-process reference; partitioning-invariant by construction."""
    import numpy as np

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
        hash64,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        budget_sample_per_group,
    )

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source", "n_chars"])
    budget = 3000
    out = (
        budget_sample_per_group(rd.from_arrow(docs), "source", "n_chars", "doc_id", budget)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    expect = set()
    df = docs.to_pandas()
    for src, g in df.groupby("source"):
        g = g.assign(h=[hash64(str(i)) for i in g.doc_id])
        g = g.sort_values(["h", "doc_id"])
        cum = np.cumsum(g.n_chars.to_numpy())
        expect |= set(g.doc_id.to_numpy()[cum <= budget])

    assert set(out.doc_id) == expect
    got_sums = out.groupby("source").n_chars.sum()
    assert (got_sums <= budget).all()
    assert len(out) > 0


def test_hll_estimate_accuracy_and_merge():
    """HLL registers: partitioning-invariant (merge = elementwise max),
    and the estimator lands within the ~3*1.04/sqrt(m) relative-error
    envelope of the exact distinct count."""
    import numpy as np
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        hll_estimate,
        hll_registers,
    )

    path = "/root/testdata/sf0.01/events.parquet"
    import pyarrow.parquet as pq

    exact = len(set(pq.read_table(path, columns=["user_id"])["user_id"].to_pylist()))
    outs = []
    for parts in (2, 7):
        t = (
            hll_registers(
                rd.read_parquet(path, columns=["user_id"]).repartition(parts),
                "user_id",
                b=8,
            )
            .to_pandas()
            .sort_values("bucket")
        )
        outs.append(list(zip(t.bucket, t.max_rho)))
    assert outs[0] == outs[1]
    buckets = np.array([b for b, _ in outs[0]])
    rhos = np.array([r for _, r in outs[0]])
    est = hll_estimate(buckets, rhos, b=8)
    rel_err = abs(est - exact) / exact
    assert rel_err < 3 * 1.04 / np.sqrt(256), (est, exact, rel_err)


def test_grouped_mad_outliers_matches_duckdb():
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        grouped_mad_outliers,
    )

    rng = np.random.default_rng(7)
    n = 4000
    # mixture with planted far-out tail so n_outliers is non-vacuous
    base = rng.normal(10, 1, n)
    base[rng.random(n) < 0.02] += 40
    t = pa.table(
        {
            "g": pa.array(rng.choice(["a", "b", "c"], n).tolist()),
            "v": pa.array(np.round(base, 2)),
        }
    )
    out = {
        r["g"]: r for r in grouped_mad_outliers(rd.from_arrow(t), "g", "v").take_all()
    }
    con = duckdb.connect()
    want = con.sql(
        """
        WITH v AS (SELECT g, CAST(round(v*100) AS BIGINT) AS vq FROM t),
        med AS (SELECT g, quantile_disc(vq, 0.5) AS med FROM v GROUP BY g),
        d AS (SELECT v.g, med.med, abs(v.vq - med.med) AS ad
              FROM v JOIN med USING (g)),
        mad AS (SELECT g, quantile_disc(ad, 0.5) AS mad FROM d GROUP BY g)
        SELECT d.g, any_value(d.med), any_value(mad.mad), count(*),
               CAST(sum(CASE WHEN d.ad > 3*mad.mad THEN 1 ELSE 0 END) AS BIGINT)
        FROM d JOIN mad USING (g) GROUP BY d.g
        """
    ).fetchall()
    assert len(out) == 3
    total_out = 0
    for g, med, mad, cnt, n_out in want:
        r = out[g]
        assert (r["med_e2"], r["mad_e2"], r["n"], r["n_outliers"]) == (
            med,
            mad,
            cnt,
            n_out,
        ), g
        total_out += n_out
    assert total_out > 0, "no outliers flagged — planted tail missed"


def test_grouped_percentile_rank_matches_duckdb():
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        grouped_percentile_rank,
    )

    rng = np.random.default_rng(3)
    n = 3000
    t = pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "g": pa.array(rng.choice(["a", "b"], n).tolist()),
            # coarse values force TIES so the min-rank rule is exercised
            "v": pa.array(np.round(rng.uniform(0, 3, n), 1)),
        }
    )
    got = (
        grouped_percentile_rank(rd.from_arrow(t), "g", "v", "id")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.sql(
        """
        WITH v AS (SELECT id, g, CAST(round(v*100) AS BIGINT) AS vq FROM t),
        n AS (SELECT g, count(*) AS n FROM v GROUP BY g)
        SELECT v.id, CAST(1000000 * (rank() OVER (PARTITION BY v.g ORDER BY v.vq) - 1)
                          // (n.n - 1) AS BIGINT) AS pr
        FROM v JOIN n USING (g) ORDER BY v.id
        """
    ).fetchall()
    assert got["pr_e6"].tolist() == [w[1] for w in want]
    # ties share the MIN rank, so a tied maximum never reaches 1.0 —
    # but the top must be close and the bottom exactly 0
    assert got["pr_e6"].max() > 900_000
    assert got["pr_e6"].min() == 0


def test_grouped_skyline_2d_matches_bruteforce():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        grouped_skyline_2d,
    )

    rng = np.random.default_rng(13)
    n = 2000
    base = pd.Timestamp("2024-01-01").value // 1000
    ts = base + rng.integers(0, 10**6, n) * 1000
    v = np.round(rng.uniform(0, 20, n), 2)
    # plant an exact (value, ts) tie pair that must BOTH survive
    v[10] = v[11] = 99.99
    ts[10] = ts[11] = base
    t = pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "g": pa.array(rng.choice(["a", "b"], n).tolist()),
            "v": pa.array(v),
            "ts": pa.array(ts.astype("datetime64[us]")),
        }
    )
    got = (
        grouped_skyline_2d(rd.from_arrow(t), "g", "v", "ts", "id")
        .to_pandas()
        .sort_values("id")
    )

    vq = np.rint(v * 100).astype(np.int64)
    garr = np.asarray(t["g"].to_pylist(), dtype=object)
    keep = []
    for i in range(n):
        m = garr == garr[i]
        dom = (
            (vq[m] >= vq[i])
            & (ts[m] <= ts[i])
            & ((vq[m] > vq[i]) | (ts[m] < ts[i]))
        )
        if not dom.any():
            keep.append(i)
    assert got["id"].tolist() == keep
    assert 10 in keep and 11 in keep  # the planted tie pair survives
