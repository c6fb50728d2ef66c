"""Per-key running totals, FULL OUTER shuffle join, and the seeded
deterministic epoch shuffle vs DuckDB, plus partitioning invariance."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd
import pytest

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
    hash64,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
    running_totals,
    shuffle_join,
    zip_with_index,
)

SF = "/root/testdata/sf0.001"


def _sorted(obj, by):
    df = obj.to_pandas() if hasattr(obj, "to_pandas") else obj
    return df.sort_values(by).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "customer", "orders", "documents"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _run_totals(n_blocks: int):
    ds = rd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    if n_blocks:
        ds = ds.repartition(n_blocks)
    return running_totals(
        ds, "user_id", ["ts", "event_id"], "value", id_cols=["event_id", "user_id"]
    )


def test_running_totals_vs_sql(con):
    got = _sorted(_run_totals(0).to_pandas(), ["event_id"])
    want = _sorted(
        con.sql(
            """
            WITH q AS (SELECT event_id, user_id, ts,
                              CAST(round(value * 100) AS BIGINT) AS val_e2
                       FROM events)
            SELECT event_id, user_id, val_e2,
                   SUM(val_e2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS run_e2,
                   val_e2 - LAG(val_e2) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS delta_e2
            FROM q
            """
        ).df(),
        ["event_id"],
    )
    assert len(got) == len(want)
    for c in ("user_id", "val_e2", "run_e2"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all()
    gd, wd = got["delta_e2"], want["delta_e2"]
    assert (gd.isna().to_numpy() == wd.isna().to_numpy()).all()
    m = ~gd.isna().to_numpy()
    assert (gd.to_numpy()[m] == wd.to_numpy()[m]).all()
    # every user's first event carries a null delta
    assert gd.isna().sum() == got["user_id"].nunique()


def test_running_totals_partitioning_invariant():
    a = _sorted(_run_totals(0).to_pandas(), ["event_id"])
    b = _sorted(_run_totals(7).to_pandas(), ["event_id"])
    assert a.equals(b)


def test_full_outer_join_vs_sql(con):
    import pyarrow.dataset as pads

    cust = rd.read_parquet(
        f"{SF}/customer.parquet",
        columns=["c_custkey", "c_acctbal"],
        filter=pads.field("c_acctbal") >= 5000.0,
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t["c_custkey"],
                "acctbal_e2": pa.array(
                    np.rint(t["c_acctbal"].to_numpy(zero_copy_only=False) * 100).astype(
                        np.int64
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    )
    urgent = rd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderkey"],
        filter=pads.field("o_orderpriority") == "1-URGENT",
    ).rename_columns({"o_custkey": "c_custkey"})
    got = _sorted(
        shuffle_join(
            cust,
            urgent,
            "c_custkey",
            left_cols=["acctbal_e2"],
            right_cols=["o_orderkey"],
            how="full outer",
        ).to_pandas(),
        ["c_custkey", "o_orderkey"],
    )
    want = _sorted(
        con.sql(
            """
            SELECT COALESCE(c.c_custkey, o.o_custkey) AS c_custkey,
                   c.acctbal_e2, o.o_orderkey
            FROM (SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_e2
                  FROM customer WHERE c_acctbal >= 5000) c
            FULL OUTER JOIN (SELECT o_custkey, o_orderkey FROM orders
                             WHERE o_orderpriority = '1-URGENT') o
            ON c.c_custkey = o.o_custkey
            """
        ).df(),
        ["c_custkey", "o_orderkey"],
    )
    assert len(got) == len(want)
    for c in ("c_custkey", "acctbal_e2", "o_orderkey"):
        ga, wa = got[c], want[c]
        assert (ga.isna().to_numpy() == wa.isna().to_numpy()).all(), c
        m = ~ga.isna().to_numpy()
        assert (ga.to_numpy()[m] == wa.to_numpy()[m]).all(), c
    # both null-padded sides must actually occur
    assert got["acctbal_e2"].isna().any() and got["o_orderkey"].isna().any()


def _epoch_shuffle(n_blocks: int):
    def add_prio(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        prio = np.fromiter(
            (hash64(f"epoch7:{i}") for i in ids), dtype=np.int64, count=ids.size
        )
        return t.append_column("prio", pa.array(prio))

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    if n_blocks:
        ds = ds.repartition(n_blocks)
    return zip_with_index(
        ds.map_batches(add_prio, batch_format="pyarrow"),
        ["prio", "doc_id"],
        out_cols=["doc_id"],
        idx_col="pos",
    )


def test_epoch_shuffle_is_permutation_and_deterministic():
    a = _sorted(_epoch_shuffle(0).to_pandas(), ["doc_id"])
    b = _sorted(_epoch_shuffle(5).to_pandas(), ["doc_id"])
    n = len(a)
    assert sorted(a["pos"]) == list(range(n))  # bijection onto 0..n-1
    assert a.equals(b)  # partitioning-invariant permutation
    # seeded: the permutation is not the identity order
    assert (a["pos"].to_numpy() != np.arange(n)).any()


def test_hopping_window_vs_sql(con):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        hopping_window_counts,
    )

    got = _sorted(
        hopping_window_counts(
            rd.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"]),
            window_s=7200,
            hop_s=3600,
        ).to_pandas(),
        ["window_start_s"],
    )
    want = _sorted(
        con.sql(
            """
            WITH e AS (SELECT CAST(floor(epoch(ts)/3600) AS BIGINT) AS hr,
                              CAST(round(value*100) AS BIGINT) AS v FROM events),
            w AS (SELECT (hr - k) * 3600 AS window_start_s, v
                  FROM e CROSS JOIN (SELECT unnest([0,1]) AS k))
            SELECT window_start_s, count(*) AS n_events,
                   CAST(sum(v) AS BIGINT) AS sum_val_e2
            FROM w GROUP BY window_start_s
            """
        ).df(),
        ["window_start_s"],
    )
    assert len(got) == len(want)
    for c in ("window_start_s", "n_events", "sum_val_e2"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # every tumbling bucket count is <= its covering hopping count
    assert int(got["n_events"].sum()) == 2 * con.sql("SELECT count(*) FROM events").fetchone()[0]


def test_import_reference_acc_parse_fallback():
    # malformed freq -> the reference's freq=1 fallback
    # (Searcher.java:96-100); multi-':' entries take the LAST part
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.export_index import (
        import_reference_index,
    )

    t = pa.table(
        {
            "term": ["a", "b", "c"],
            "acc": ["1:2,5:1,9:3", "7:xx,8:4", "k:1:5"],
        }
    )
    out = (
        import_reference_index(rd.from_arrow(t))
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    assert out["df"].tolist() == [3, 2, 1]
    assert out["cf"].tolist() == [6, 5, 5]
    assert out["max_tf"].tolist() == [3, 4, 5]


def test_profile_columns_exact_with_nulls():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        profile_columns,
    )

    t = pa.table(
        {
            "i": pa.array([3, None, 1, 3, 7], pa.int64()),
            "f": pa.array([1.234, 2.5, None, 2.5, -0.004], pa.float64()),
            "s": pa.array(["b", "a", None, "a", "c"], pa.string()),
        }
    )
    out = profile_columns(lambda: rd.from_arrow(t), ["i", "f", "s"]).to_pandas()
    out = out.set_index("col")
    assert out.loc["i", "n_rows"] == 5 and out.loc["i", "n_nulls"] == 1
    assert out.loc["i", "ndv"] == 3
    assert out.loc["i", "min_int"] == 1 and out.loc["i", "max_int"] == 7
    # doubles e2-quantized: 1.234 -> 123, -0.004 -> 0 (round-half-even)
    assert out.loc["f", "ndv"] == 3
    assert out.loc["f", "min_int"] == 0 and out.loc["f", "max_int"] == 250
    assert out.loc["s", "ndv"] == 3
    assert out.loc["s", "min_str"] == "a" and out.loc["s", "max_str"] == "c"
