"""As-of join and banded range join: tie rules, cross-user isolation,
window bounds (stages/temporal.py). Oracles for the registered queries
are the DuckDB SQL twins in __ray_entry__; these tests pin the exact
edge semantics on a hand-built table."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.temporal import (
    asof_join_events,
    range_count_after,
)

US = 1_000_000


def _events(rows):
    eid, uid, ts, et = zip(*rows)
    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "ts": pa.array(list(ts), pa.timestamp("us")),
                "event_type": pa.array(et),
            }
        )
    )


def test_asof_basic_tie_and_cross_user():
    rows = [
        # user 1: view@10, view@20, click@20 (tie: view 2 has smaller id -> matches),
        # click@15 (matches view@10), click@5 (no prior view -> NULL)
        (1, 1, 10 * US, "view"),
        (2, 1, 20 * US, "view"),
        (3, 1, 20 * US, "click"),
        (4, 1, 15 * US, "click"),
        (5, 1, 5 * US, "click"),
        # user 2 has no views; its click must NOT steal user 1's views
        (6, 2, 30 * US, "click"),
        # tie with LARGER view id: view@40 id=8 > click@40 id=7 -> not prior
        (7, 3, 40 * US, "click"),
        (8, 3, 40 * US, "view"),
        (9, 3, 35 * US, "view"),
    ]
    out = asof_join_events(_events(rows)).take_all()
    by_id = {r["event_id"]: r for r in out}
    assert len(out) == 5
    assert by_id[3]["view_event_id"] == 2 and by_id[3]["gap_us"] == 0
    assert by_id[4]["view_event_id"] == 1 and by_id[4]["gap_us"] == 5 * US
    assert by_id[5]["view_event_id"] is None and by_id[5]["gap_us"] is None
    assert by_id[6]["view_event_id"] is None
    assert by_id[7]["view_event_id"] == 9 and by_id[7]["gap_us"] == 5 * US


def test_range_count_window_bounds():
    rows = [
        # anchor error@100; same user events at 100 (excluded: not > ts),
        # 130, 160 (included: <= +60s), 161 (excluded), other-user at 110
        (1, 1, 100 * US, "error"),
        (2, 1, 100 * US, "view"),
        (3, 1, 130 * US, "view"),
        (4, 1, 160 * US, "click"),
        (5, 1, 161 * US, "view"),
        (6, 2, 110 * US, "view"),
        # second anchor, user 2: only its own event at 111
        (7, 2, 110 * US, "error"),
        (8, 2, 111 * US, "click"),
    ]
    out = range_count_after(_events(rows), window_sec=60).take_all()
    got = {r["event_id"]: r["n_follow"] for r in out}
    assert got == {1: 2, 7: 1}


def test_asof_matches_bruteforce_random():
    rng = np.random.default_rng(3)
    n = 400
    rows = [
        (
            i,
            int(rng.integers(0, 12)),
            int(rng.integers(0, 5000)) * US,
            ["view", "click", "error"][int(rng.integers(0, 3))],
        )
        for i in range(n)
    ]
    out = asof_join_events(_events(rows)).take_all()
    assert len(out) == sum(1 for r in rows if r[3] == "click")
    views = [r for r in rows if r[3] == "view"]
    for r in out:
        cand = [
            v
            for v in views
            if v[1] == r["user_id"] and (v[2], v[0]) < (r["ts"].timestamp() * US, r["event_id"])
        ]
        want = max(cand, key=lambda v: (v[2], v[0]))[0] if cand else None
        assert r["view_event_id"] == want, r


def test_range_count_matches_bruteforce_random():
    rng = np.random.default_rng(4)
    n = 400
    rows = [
        (
            i,
            int(rng.integers(0, 12)),
            int(rng.integers(0, 5000)) * US,
            ["view", "click", "error"][int(rng.integers(0, 3))],
        )
        for i in range(n)
    ]
    out = range_count_after(_events(rows), window_sec=60).take_all()
    assert len(out) == sum(1 for r in rows if r[3] == "error")
    for r in out:
        t = r["ts"].timestamp() * US
        want = sum(
            1 for e in rows if e[1] == r["user_id"] and t < e[2] <= t + 60 * US
        )
        assert r["n_follow"] == want, r


def test_moving_avg_matches_bruteforce_random():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.temporal import (
        moving_avg_per_user,
    )

    rng = np.random.default_rng(9)
    n = 400
    eid = np.arange(n)
    uid = rng.integers(0, 10, n)
    ts = rng.integers(0, 2000, n) * US
    val = np.round(rng.uniform(-5, 5, n), 3)
    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "ts": pa.array(ts.tolist(), pa.timestamp("us")),
                "value": pa.array(val),
            }
        )
    )
    out = {r["event_id"]: r["ma3_e6"] for r in moving_avg_per_user(ds, window=3).take_all()}
    assert len(out) == n
    order = np.lexsort((eid, ts, uid))
    for pos, i in enumerate(order):
        window = [val[i]]
        for back in (1, 2):
            j = pos - back
            if j >= 0 and uid[order[j]] == uid[i]:
                window.append(val[order[j]])
        # oldest-first addition, like the kernel and the SQL frame
        want = int(np.rint(sum(reversed(window)) / len(window) * 1e6))
        assert out[eid[i]] == want, (i, window)


def test_interarrival_quantiles_matches_duckdb():
    import datetime as dt

    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.temporal import (
        interarrival_quantiles,
    )

    rng = np.random.default_rng(17)
    n = 3000
    base = dt.datetime(2024, 1, 1)
    rows = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
            "event_type": pa.array(rng.choice(["a", "b", "c"], n).tolist()),
            "ts": pa.array(
                [base + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 86400, n)],
                pa.timestamp("us"),
            ),
        }
    )
    con = duckdb.connect()
    con.register("t", rows)
    want = {
        r[0]: r[1:]
        for r in con.sql(
            """
        WITH g AS (SELECT event_type,
                          CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id, event_type ORDER BY ts, event_id)
                           AS BIGINT) AS d_us
                   FROM t)
        SELECT event_type, count(*), quantile_disc(d_us // 1000000, 0.5),
               quantile_disc(d_us // 1000000, 0.9)
        FROM g WHERE d_us IS NOT NULL GROUP BY event_type
        """
        ).fetchall()
    }
    for nbuck in (4, 64):
        got = {
            r["event_type"]: (r["n_gaps"], r["p50_s"], r["p90_s"])
            for r in interarrival_quantiles(
                rd.from_arrow(rows), num_buckets=nbuck
            ).take_all()
        }
        assert got == want, nbuck


def test_late_event_counts_single_block_truth():
    """Late counts must be partitioning-invariant: the operator over a
    multi-block dataset equals the single-pass numpy replay."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.temporal import (
        late_event_counts,
    )

    sf = "/root/testdata/sf0.001/events.parquet"
    t = pq.read_table(sf, columns=["event_id", "event_type", "ts"])
    ids = t["event_id"].to_numpy()
    ts = t["ts"].cast("int64").to_numpy()
    types = np.asarray(t["event_type"].to_pylist(), dtype=object)
    prio = np.fromiter(
        (
            int.from_bytes(hashlib.md5(f"arrival:{i}".encode()).digest()[:8], "big")
            & ((1 << 63) - 1)
            for i in ids
        ),
        dtype=np.int64,
    )
    o = np.lexsort((ids, prio))
    ts_o, ty_o = ts[o], types[o]
    run = np.maximum.accumulate(
        np.concatenate(([np.iinfo(np.int64).min], ts_o))
    )[:-1]
    late = (run != np.iinfo(np.int64).min) & (ts_o < run - 14 * 86400 * 1_000_000)

    ds = rd.read_parquet(sf).repartition(7)
    got = (
        late_event_counts(ds)
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    for ty in sorted(set(types.tolist())):
        m = ty_o == ty
        assert got.loc[ty, "n_events"] == int(m.sum())
        assert got.loc[ty, "n_late"] == int(late[m].sum())


def test_range_window_sum_peers_and_bounds():
    """RANGE frame includes ALL equal-ts peers (even later event_ids)
    and exactly the [ts-W, ts] interval."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.temporal import (
        range_window_sum,
    )

    us = 1_000_000
    day = 86400 * us
    rows = [
        # user 1: two equal-ts peers + one just inside + one just outside
        (0, 1, 0 * day, 1.00),
        (1, 1, 2 * day, 2.00),          # exactly W before row 3 -> inside
        (2, 1, 3 * day, 4.00),          # peer of row 3 (equal ts)
        (3, 1, 3 * day, 8.00),
        (4, 1, 3 * day + 1, 16.00),     # 1us after -> its own window
        # user 2 isolated
        (5, 2, 3 * day, 100.00),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    out = (
        range_window_sum(rd.from_arrow(t), window_sec=86400)
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert out.loc[0, "wsum_e2"] == 100
    assert out.loc[1, "wsum_e2"] == 200  # window [1d, 2d]: day-0 row excluded
    # rows 2 and 3 are peers: both see 2.0 + 4.0 + 8.0 (row1 is exactly W back)
    assert out.loc[2, "wsum_e2"] == 1400
    assert out.loc[3, "wsum_e2"] == 1400
    # row 4 is 1us later: row1 falls out, peers remain
    assert out.loc[4, "wsum_e2"] == 2800
    assert out.loc[5, "wsum_e2"] == 10000  # other user unaffected
