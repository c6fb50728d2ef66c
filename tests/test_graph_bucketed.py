"""A/B parity of the bucketed vertex-state graph plans vs the broadcast
plans (stages/graph.py vs the driver-vector originals) — the round-3
verdict's "done" bar: identical results on both sides of the cutover.

Integer-state kernels (components, label-prop, BFS) must be
BIT-IDENTICAL; pagerank must match at the registered rank_e9 contract
and to float64 roundoff (different-but-deterministic summation order).
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
    frontier_bfs,
    label_prop_communities,
    pagerank,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
    dup_clusters,
)


def _pairs_ds(edges):
    return rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([a for a, _ in edges], pa.int64()),
                "doc_b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )


def _rand_graph(n_nodes=400, n_edges=900, seed=7):
    rng = np.random.default_rng(seed)
    ids = np.unique(rng.integers(1, 10**12, size=n_nodes * 2, dtype=np.int64))[:n_nodes]
    a = ids[rng.integers(0, n_nodes, n_edges)]
    b = ids[rng.integers(0, n_nodes, n_edges)]
    keep = a != b
    return list(zip(a[keep].tolist(), b[keep].tolist()))


# ---------------------------------------------------------------------------


def test_components_ab_bit_identity(ray_session):
    edges = _rand_graph()
    a = dup_clusters(_pairs_ds(edges), rounds=10, plan="broadcast")
    b = dup_clusters(_pairs_ds(edges), rounds=10, plan="bucketed", num_buckets=8)
    assert a.equals(b)  # bit-identical tables, schema included


def test_components_ab_chain_diameter(ray_session):
    # a 12-node chain: exercises multi-round propagation + early exit
    ids = [(i + 1) * 1_000_003 for i in range(12)]
    edges = list(zip(ids[:-1], ids[1:]))
    a = dup_clusters(_pairs_ds(edges), rounds=20, plan="broadcast")
    b = dup_clusters(_pairs_ds(edges), rounds=20, plan="bucketed", num_buckets=4)
    assert a.equals(b)
    assert set(b["cluster_id"].to_pylist()) == {min(ids)}


def test_components_truncated_rounds_still_identical(ray_session):
    # BEFORE the fixpoint both plans must agree round-by-round
    ids = [(i + 1) * 7_777_777 for i in range(16)]
    edges = list(zip(ids[:-1], ids[1:]))
    a = dup_clusters(_pairs_ds(edges), rounds=3, plan="broadcast")
    b = dup_clusters(_pairs_ds(edges), rounds=3, plan="bucketed", num_buckets=8)
    assert a.equals(b)


def test_label_prop_ab_bit_identity(ray_session):
    edges = _rand_graph(n_nodes=300, n_edges=700, seed=11)
    a = label_prop_communities(_pairs_ds(edges), rounds=5, plan="broadcast")
    b = label_prop_communities(
        _pairs_ds(edges), rounds=5, plan="bucketed", num_buckets=8
    )
    assert a.equals(b)


def test_label_prop_two_cliques(ray_session):
    # two 6-cliques + one bridge: communities must separate identically
    left = [(i + 1) * 11 for i in range(6)]
    right = [(i + 1) * 1_000_019 for i in range(6)]
    edges = [(x, y) for i, x in enumerate(left) for y in left[i + 1 :]]
    edges += [(x, y) for i, x in enumerate(right) for y in right[i + 1 :]]
    edges.append((left[0], right[0]))
    a = label_prop_communities(_pairs_ds(edges), rounds=5, plan="broadcast")
    b = label_prop_communities(_pairs_ds(edges), rounds=5, plan="bucketed", num_buckets=4)
    assert a.equals(b)


def test_empty_and_tiny_graphs(ray_session):
    empty = _pairs_ds([])
    assert dup_clusters(empty, plan="bucketed").num_rows == 0
    one = _pairs_ds([(5, 9)])
    a = dup_clusters(one, plan="broadcast")
    b = dup_clusters(_pairs_ds([(5, 9)]), plan="bucketed", num_buckets=8)
    assert a.equals(b)
    assert b["cluster_id"].to_pylist() == [5, 5]


# ---------------------------------------------------------------------------

URLS = [f"http://site{i}.test:80/" for i in range(40)]


def _edges_ds(seed=3, n=160):
    rng = np.random.default_rng(seed)
    src = [URLS[i] for i in rng.integers(0, len(URLS), n)]
    dst = [URLS[i] for i in rng.integers(0, len(URLS), n)]
    # some external dsts (dropped by node restriction) + a dangling node
    dst[0] = "http://external.test:80/"
    return rd.from_arrow(
        pa.table({"src_url": pa.array(src), "dst_url": pa.array(dst)})
    )


def test_pagerank_ab(ray_session):
    a = pagerank(_edges_ds(), URLS, iters=10, plan="broadcast")
    b = pagerank(_edges_ds(), URLS, iters=10, plan="bucketed", num_buckets=8)
    assert a["url"].to_pylist() == b["url"].to_pylist()
    ra = np.asarray(a["rank"].to_pylist())
    rb = np.asarray(b["rank"].to_pylist())
    # registered-query contract: identical at rank_e9
    assert (np.round(ra * 1e9) == np.round(rb * 1e9)).all()
    np.testing.assert_allclose(ra, rb, rtol=1e-12)
    assert rb.sum() == pytest.approx(1.0, rel=1e-9)


def test_pagerank_personalized_ab(ray_session):
    seeds = URLS[:4]
    a = pagerank(_edges_ds(), URLS, iters=8, teleport_urls=seeds, plan="broadcast")
    b = pagerank(
        _edges_ds(), URLS, iters=8, teleport_urls=seeds, plan="bucketed", num_buckets=4
    )
    assert a["url"].to_pylist() == b["url"].to_pylist()
    ra = np.asarray(a["rank"].to_pylist())
    rb = np.asarray(b["rank"].to_pylist())
    assert (np.round(ra * 1e9) == np.round(rb * 1e9)).all()
    np.testing.assert_allclose(ra, rb, rtol=1e-12)


def test_pagerank_env_forced_cutover(ray_session, monkeypatch):
    monkeypatch.setenv("WSE_GRAPH_PLAN", "bucketed")
    b = pagerank(_edges_ds(), URLS, iters=10, plan="auto")
    monkeypatch.setenv("WSE_GRAPH_PLAN", "broadcast")
    a = pagerank(_edges_ds(), URLS, iters=10, plan="auto")
    ra = np.asarray(a["rank"].to_pylist())
    rb = np.asarray(b["rank"].to_pylist())
    assert (np.round(ra * 1e9) == np.round(rb * 1e9)).all()


def test_modularity_ab_bit_identity(ray_session):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        label_prop_modularity,
    )

    edges = _rand_graph(n_nodes=200, n_edges=500, seed=23)
    # two cliques + bridge gives real community structure (Q > 0)
    left = [(i + 1) * 13 for i in range(6)]
    right = [(i + 1) * 2_000_003 for i in range(6)]
    edges += [(x, y) for i, x in enumerate(left) for y in left[i + 1 :]]
    edges += [(x, y) for i, x in enumerate(right) for y in right[i + 1 :]]
    a = label_prop_modularity(_pairs_ds(edges), rounds=5, plan="broadcast")
    b = label_prop_modularity(
        _pairs_ds(edges), rounds=5, plan="bucketed", num_buckets=8
    )
    assert a.equals(b)  # exact integers: n_nodes/n_edges/n_comms/Q_e6


def test_kcore_ab_bit_identity(ray_session):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        kcore_flags,
    )

    # a 7-clique (6-core) + a chain hanging off it: peeling removes the
    # chain over multiple rounds, exercising the fixpoint loop
    clique = [(i + 1) * 101 for i in range(7)]
    edges = [(a, b) for i, a in enumerate(clique) for b in clique[i + 1 :]]
    chain = [clique[0]] + [(i + 1) * 90007 for i in range(5)]
    edges += list(zip(chain[:-1], chain[1:]))
    ds = _pairs_ds(edges)
    a = kcore_flags(_pairs_ds(edges), k=6, plan="broadcast")
    b = kcore_flags(ds, k=6, plan="bucketed", num_buckets=4)
    assert a.equals(b)
    got = dict(zip(b["doc_id"].to_pylist(), b["in_core"].to_pylist()))
    assert all(got[c] for c in clique)
    assert not any(got[c] for c in chain[1:])


def test_hits_ab(ray_session):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        hits,
    )

    a = hits(_edges_ds(), URLS, iters=5, plan="broadcast")
    b = hits(_edges_ds(), URLS, iters=5, plan="bucketed", num_buckets=8)
    assert a["url"].to_pylist() == b["url"].to_pylist()
    for col in ("auth", "hub"):
        ra = np.asarray(a[col].to_pylist())
        rb = np.asarray(b[col].to_pylist())
        assert (np.round(ra * 1e9) == np.round(rb * 1e9)).all(), col
        np.testing.assert_allclose(ra, rb, rtol=1e-12, atol=1e-15)


def test_salsa_ab(ray_session):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        salsa,
    )

    a = salsa(_edges_ds(seed=9), URLS, iters=5, plan="broadcast")
    b = salsa(_edges_ds(seed=9), URLS, iters=5, plan="bucketed", num_buckets=4)
    assert a["url"].to_pylist() == b["url"].to_pylist()
    for col in ("auth", "hub"):
        ra = np.asarray(a[col].to_pylist())
        rb = np.asarray(b[col].to_pylist())
        assert (np.round(ra * 1e9) == np.round(rb * 1e9)).all(), col
        np.testing.assert_allclose(ra, rb, rtol=1e-12, atol=1e-15)


# ---------------------------------------------------------------------------


def _bfs_edges():
    e = [
        ("s", "a"),
        ("a", "b"),
        ("b", "c"),
        ("c", "d"),
        ("a", "c"),
        ("x", "y"),  # unreachable component
        ("d", "s"),  # cycle back
    ]
    return rd.from_arrow(
        pa.table(
            {
                "src_url": pa.array([a for a, _ in e]),
                "dst_url": pa.array([b for _, b in e]),
            }
        )
    )


def test_frontier_bfs_ab(ray_session):
    a = frontier_bfs(_bfs_edges(), ["s"], max_depth=4, plan="broadcast")
    b = frontier_bfs(_bfs_edges(), ["s"], max_depth=4, plan="bucketed", num_buckets=4)
    assert a.equals(b)
    got = dict(zip(b["url"].to_pylist(), b["depth"].to_pylist()))
    assert got == {"s": 0, "a": 1, "b": 2, "c": 2, "d": 3}


def test_frontier_bfs_ab_multi_seed(ray_session):
    a = frontier_bfs(_bfs_edges(), ["s", "x"], max_depth=3, plan="broadcast")
    b = frontier_bfs(
        _bfs_edges(), ["s", "x"], max_depth=3, plan="bucketed", num_buckets=8
    )
    assert a.equals(b)
    got = dict(zip(b["url"].to_pylist(), b["depth"].to_pylist()))
    assert got["y"] == 1 and got["x"] == 0
