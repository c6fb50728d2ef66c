"""Continuous (interpolated) grouped quantiles, GROUPING SETS, and RFM
ntile scoring — round-3 session-5 additions."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
    grouped_quantiles_cont,
)


def _events(groups, values):
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(groups, pa.string()),
                "value": pa.array(values, pa.float64()),
            }
        )
    )


def test_quantiles_cont_matches_numpy_linear():
    rng = np.random.default_rng(7)
    vals = np.round(rng.uniform(0, 100, size=503), 2)
    groups = ["a"] * 251 + ["b"] * 252
    out = (
        grouped_quantiles_cont(_events(groups, vals.tolist()), "event_type", "value")
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    for g, lo, hi in [("a", 0, 251), ("b", 251, 503)]:
        cents = np.rint(vals[lo:hi] * 100).astype(np.int64)
        for q, col in [(0.25, "p25_e6"), (0.5, "p50_e6"), (0.75, "p75_e6")]:
            # numpy 'linear' is the same h = q*(n-1) rule; cents -> e6
            want = int(round(np.quantile(cents, q, method="linear") * 10000))
            assert out.loc[g, col] == want, (g, col)


def test_quantiles_cont_exact_midpoint_even_n():
    # n=4: p50 interpolates halfway between ranks 1 and 2
    out = grouped_quantiles_cont(
        _events(["x"] * 4, [1.0, 2.0, 3.0, 10.0]), "event_type", "value"
    ).to_pandas()
    assert out.loc[0, "p50_e6"] == 2_500_000  # (200+300)/2 cents * 1e4
    assert out.loc[0, "p25_e6"] == 1_750_000  # 100 + .75*(200-100) cents
    assert out.loc[0, "p75_e6"] == 4_750_000  # 300 + .25*(1000-300)


def test_quantiles_cont_single_row_group():
    out = grouped_quantiles_cont(
        _events(["solo"], [5.25]), "event_type", "value"
    ).to_pandas()
    assert (
        out.loc[0, "p25_e6"] == out.loc[0, "p50_e6"] == out.loc[0, "p75_e6"] == 5_250_000
    )


def test_rfm_ntile_rule_matches_duckdb():
    # the registered query's ntile fill: first n%4 buckets get the
    # extra row — check the bucket-size invariant on the sf0.001 table
    import __ray_entry__ as entry

    t = entry.queries()["rel_rfm"]("/root/testdata/sf0.001").to_pandas()
    n = len(t)
    base, rem = divmod(n, 4)
    for col in ["r_score", "f_score", "m_score"]:
        sizes = t[col].value_counts().sort_index().to_numpy()
        assert sizes.sum() == n
        assert (np.sort(sizes)[::-1][:rem] == base + 1).all() if rem else True
        assert set(t[col]) <= {1, 2, 3, 4}
    # recency score 1 = the most recent quartile
    top = t[t.r_score == 1]["last_ts_us"].min()
    rest = t[t.r_score > 1]["last_ts_us"].max()
    assert top >= rest


def test_cume_dist_known_values():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        grouped_cume_dist,
    )

    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(range(6), pa.int64()),
                "event_type": pa.array(["a"] * 4 + ["b"] * 2),
                "value": pa.array([1.0, 2.0, 2.0, 3.0, 5.0, 5.0]),
            }
        )
    )
    out = (
        grouped_cume_dist(ds, "event_type", "value", "event_id")
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    # group a: 1.0 -> 1/4, the two 2.0 peers -> 3/4, 3.0 -> 4/4
    assert out.loc[0, "cd_e6"] == 250_000
    assert out.loc[1, "cd_e6"] == 750_000 and out.loc[2, "cd_e6"] == 750_000
    assert out.loc[3, "cd_e6"] == 1_000_000
    # group b: both are peers of the max -> 1.0
    assert out.loc[4, "cd_e6"] == 1_000_000 and out.loc[5, "cd_e6"] == 1_000_000


def test_cooccur_topk_known_baskets():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        grouped_cooccur_topk,
    )

    # baskets: {1,2,3}, {1,2}, {2,3}, {1,2} (dup row inside), {9}
    g = [10, 10, 10, 11, 11, 12, 12, 13, 13, 13, 14]
    it = [1, 2, 3, 1, 2, 2, 3, 1, 2, 2, 9]
    ds = rd.from_arrow(
        pa.table({"g": pa.array(g, pa.int64()), "item": pa.array(it, pa.int64())})
    )
    out = grouped_cooccur_topk(ds, "g", "item", k=10).to_pandas()
    got = {
        (a, b): n
        for a, b, n in zip(out["item_a"], out["item_b"], out["n_groups"])
    }
    # (1,2) in baskets 10,11,13; (2,3) in 10,12; (1,3) in 10 only
    assert got == {(1, 2): 3, (2, 3): 2, (1, 3): 1}
    # ordering: support desc, then (a, b)
    assert out["n_groups"].tolist() == sorted(out["n_groups"].tolist(), reverse=True)
