"""PageRank over the link graph: numpy golden (dense power iteration)
on a fixture graph with dangling nodes, plus edges from the real link
extractor over synthetic pages."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
    LinkExtractStage,
    pagerank,
)


def _numpy_pagerank(urls, edges, d=0.85, iters=10):
    """Dense reference: standard damped PageRank, dangling mass spread
    uniformly — the exact semantics pagerank() documents."""
    n = len(urls)
    idx = {u: i for i, u in enumerate(urls)}
    deg = np.zeros(n)
    for s, t in edges:
        if s in idx and t in idx:
            deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t in edges:
            if s in idx and t in idx:
                contrib[idx[t]] += r[idx[s]] / deg[idx[s]]
        dang = r[deg == 0].sum()
        r = (1 - d) / n + d * (contrib + dang / n)
    return {u: r[idx[u]] for u in urls}


FIXTURE_URLS = ["http://a:80/", "http://b:80/", "http://c:80/", "http://d:80/", "http://e:80/"]
FIXTURE_EDGES = [
    ("http://a:80/", "http://b:80/"),
    ("http://a:80/", "http://c:80/"),
    ("http://b:80/", "http://c:80/"),
    ("http://c:80/", "http://a:80/"),
    # d is dangling (no out-links); e links out of the node set only
    ("http://e:80/", "http://zz-external:80/"),
]


def test_pagerank_matches_numpy_golden(ray_session):
    edges_ds = rd.from_arrow(
        pa.table(
            {
                "src_url": pa.array([e[0] for e in FIXTURE_EDGES]),
                "dst_url": pa.array([e[1] for e in FIXTURE_EDGES]),
            }
        )
    )
    got = pagerank(edges_ds, FIXTURE_URLS, damping=0.85, iters=10)
    # external-dst edge is dropped, so e is dangling too
    kept = [(s, t) for s, t in FIXTURE_EDGES if t in FIXTURE_URLS]
    want = _numpy_pagerank(FIXTURE_URLS, kept)
    assert got.num_rows == len(FIXTURE_URLS)
    ranks = dict(zip(got["url"].to_pylist(), got["rank"].to_pylist()))
    for u in FIXTURE_URLS:
        assert ranks[u] == pytest.approx(want[u], rel=1e-12), u
    assert sum(ranks.values()) == pytest.approx(1.0, rel=1e-9)  # mass conserved
    # the 2-in-degree hub outranks the dangling leaf
    assert ranks["http://c:80/"] > ranks["http://d:80/"]


def test_pagerank_on_extracted_links(ray_session):
    """End-to-end: pages -> LinkExtractStage -> pagerank, checked
    against the dense numpy reference over the same extracted edges."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        synth_pages,
    )

    import re

    def canon(u: str) -> str:
        return re.sub(r"^http://([^/]*)", r"http://\1:80", u)

    pages = synth_pages(300)
    edges_tbl = LinkExtractStage()(pages.select(["url", "html"]))
    # canonicalize src like the normalizer canonicalizes dst (:80) so
    # the graph connects — same convention as the registered query
    edges = [
        (canon(s), t)
        for s, t in zip(edges_tbl["src_url"].to_pylist(), edges_tbl["dst_url"].to_pylist())
    ]
    edges_c = rd.from_arrow(
        pa.table(
            {
                "src_url": pa.array([e[0] for e in edges]),
                "dst_url": pa.array([e[1] for e in edges]),
            }
        )
    )
    urls = [canon(u) for u in pages["url"].to_pylist()]
    kept = [e for e in edges if e[1] in set(urls)]
    assert kept, "generator must produce page->page edges"
    got = pagerank(edges_c, urls, iters=5)
    want = _numpy_pagerank(sorted(set(urls)), kept, iters=5)
    ranks = dict(zip(got["url"].to_pylist(), got["rank"].to_pylist()))
    assert len(ranks) == len(set(urls))
    worst = max(abs(ranks[u] - want[u]) for u in want)
    assert worst < 1e-12
    # real links -> non-uniform ranks
    assert max(ranks.values()) > 1.5 * min(ranks.values())


def _numpy_hits(urls, edges, iters=5):
    """Dense HITS reference: L1-normalized half-iterations, the exact
    semantics hits() documents."""
    n = len(urls)
    idx = {u: i for i, u in enumerate(urls)}
    es = [(idx[s], idx[t]) for s, t in edges if s in idx and t in idx]
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(iters):
        a = np.zeros(n)
        for s, t in es:
            a[t] += h[s]
        if a.sum() > 0:
            a = a / a.sum()
        h = np.zeros(n)
        for s, t in es:
            h[s] += a[t]
        if h.sum() > 0:
            h = h / h.sum()
    return {u: (a[idx[u]], h[idx[u]]) for u in urls}


def test_hits_matches_numpy_golden(ray_session):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        hits,
    )

    edges_ds = rd.from_arrow(
        pa.table(
            {
                "src_url": pa.array([s for s, _ in FIXTURE_EDGES]),
                "dst_url": pa.array([t for _, t in FIXTURE_EDGES]),
            }
        )
    )
    out = hits(edges_ds, FIXTURE_URLS, iters=5)
    got = {
        r["url"]: (r["auth"], r["hub"]) for r in out.to_pylist()
    }
    ref = _numpy_hits(sorted(FIXTURE_URLS), FIXTURE_EDGES, iters=5)
    assert set(got) == set(ref)
    for u in ref:
        assert got[u][0] == pytest.approx(ref[u][0], abs=1e-12), u
        assert got[u][1] == pytest.approx(ref[u][1], abs=1e-12), u
    # c has two in-links from the strongly linked pair: top authority
    assert max(got, key=lambda u: got[u][0]) == "http://c:80/"
    # a links to the two strongest authorities: top hub
    assert max(got, key=lambda u: got[u][1]) == "http://a:80/"


def test_label_prop_two_cliques(ray_session):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        label_prop_communities,
    )

    # two 5-cliques (ids 0-4 and 10-14) joined by one bridge edge (4,10)
    pairs = []
    for base in (0, 10):
        for i in range(5):
            for j in range(i + 1, 5):
                pairs.append((base + i, base + j))
    pairs.append((4, 10))
    # duplicate a few pairs — the operator must dedup them
    pairs += pairs[:5]
    tbl = pa.table(
        {
            "doc_a": pa.array([a for a, _ in pairs], pa.int64()),
            "doc_b": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    got = label_prop_communities(rd.from_arrow(tbl), rounds=5)
    lab = dict(zip(got["doc_id"].to_pylist(), got["community_id"].to_pylist()))
    c1 = {lab[i] for i in range(5)}
    c2 = {lab[i] for i in range(10, 15)}
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2

    # partitioning invariance
    got8 = label_prop_communities(rd.from_arrow(tbl).repartition(8), rounds=5)
    lab8 = dict(zip(got8["doc_id"].to_pylist(), got8["community_id"].to_pylist()))
    assert lab == lab8

    # synchronous numpy replay (distinct pairs, mode with min tie-break)
    import numpy as np

    dp = sorted(set(pairs))
    nodes = sorted({x for p in dp for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    labels = np.array(nodes, dtype=np.int64)
    for _ in range(5):
        cnt = {}
        for a, b in dp:
            cnt.setdefault(idx[a], {}).setdefault(labels[idx[b]], 0)
            cnt[idx[a]][labels[idx[b]]] += 1
            cnt.setdefault(idx[b], {}).setdefault(labels[idx[a]], 0)
            cnt[idx[b]][labels[idx[a]]] += 1
        new = labels.copy()
        for i, d in cnt.items():
            best = sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[i] = best
        if np.array_equal(new, labels):
            break
        labels = new
    assert [lab[v] for v in nodes] == labels.tolist()


def test_link_jaccard_manual(ray_session):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
        hash64,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        link_jaccard_pairs,
    )

    # sources s1..s4 all cite both A and B; s5 cites only B (and C)
    edges = []
    for s in ("s1", "s2", "s3", "s4"):
        edges += [(s, "A"), (s, "B")]
    edges += [("s5", "B"), ("s5", "C"), ("s5", "C")]  # dup edge must not count
    tbl = pa.table(
        {
            "src_url": pa.array([a for a, _ in edges], pa.string()),
            "dst_url": pa.array([b for _, b in edges], pa.string()),
        }
    )
    got = (
        link_jaccard_pairs(rd.from_arrow(tbl).repartition(3), min_common=4)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    # only (A,B) passes min_common=4: common=4, indeg A=4, B=5
    assert len(got) == 1
    ha, hb = sorted((hash64("A"), hash64("B")))
    assert (got.doc_a[0], got.doc_b[0]) == (ha, hb)
    assert got.n_common_src[0] == 4
    assert got.jaccard_e6[0] == (1_000_000 * 4) // (4 + 5 - 4)


def test_personalized_pagerank_numpy_golden(ray_session):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        pagerank,
    )

    # chain a -> b -> c -> a plus dangling d; seed = {a}
    urls = ["http://a/", "http://b/", "http://c/", "http://d/"]
    edges = pa.table(
        {
            "src_url": pa.array(
                ["http://a/", "http://b/", "http://c/", "http://a/"], pa.string()
            ),
            "dst_url": pa.array(
                ["http://b/", "http://c/", "http://a/", "http://d/"], pa.string()
            ),
        }
    )
    t = pagerank(
        rd.from_arrow(edges), urls, damping=0.85, iters=20, teleport_urls=["http://a/"]
    )
    got = dict(zip(t["url"].to_pylist(), t["rank"].to_pylist()))
    # numpy replay
    order = sorted(urls)
    idx = {u: i for i, u in enumerate(order)}
    deg = np.zeros(4)
    for s in edges["src_url"].to_pylist():
        deg[idx[s]] += 1
    tele = np.zeros(4)
    tele[idx["http://a/"]] = 1.0
    r = tele.copy()
    E = [(idx[s], idx[d]) for s, d in zip(edges["src_url"].to_pylist(), edges["dst_url"].to_pylist())]
    for _ in range(20):
        c = np.zeros(4)
        for s, d in E:
            c[d] += r[s] / deg[s]
        dang = r[deg == 0].sum()
        r = 0.15 * tele + 0.85 * (c + dang * tele)
    for u in order:
        assert abs(got[u] - r[idx[u]]) < 1e-12, u
    # mass conserved, concentrated at/near the seed
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got["http://a/"] == max(got.values())


def test_modularity_two_cliques(ray_session):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        label_prop_modularity,
    )

    # two 5-cliques + one bridge: strong community structure, Q ~ 0.4
    pairs = []
    for base in (0, 10):
        for i in range(5):
            for j in range(i + 1, 5):
                pairs.append((base + i, base + j))
    pairs.append((4, 10))
    tbl = pa.table(
        {
            "doc_a": pa.array([a for a, _ in pairs], pa.int64()),
            "doc_b": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    got = label_prop_modularity(rd.from_arrow(tbl).repartition(4), rounds=5)
    assert got["n_nodes"][0].as_py() == 10
    assert got["n_edges"][0].as_py() == 21
    assert got["n_communities"][0].as_py() == 2
    # exact replay: both cliques fully intra (intra=20), d_c = 21 each
    m, intra, sum_dc2 = 21, 20, 21 * 21 * 2
    assert got["modularity_e6"][0].as_py() == (
        1_000_000 * (4 * m * intra - sum_dc2)
    ) // (4 * m * m)


def test_edge_support_topk_known_graphs():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        edge_support_topk,
    )

    def _ds(pairs):
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([a for a, _ in pairs], pa.int64()),
                    "doc_b": pa.array([b for _, b in pairs], pa.int64()),
                }
            )
        )

    # K4 + a pendant edge: every K4 edge has support 2; pendant has 0
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5)]
    out = edge_support_topk(_ds(k4), k=10).to_pandas()
    assert len(out) == 6
    assert (out["support"] == 2).all()
    assert (5 != out["doc_b"]).all()

    # wheel: hub 10 + 5-cycle: spokes support 2, rim edges support 1
    rim = [(11, 12), (12, 13), (13, 14), (14, 15), (11, 15)]
    spokes = [(10, i) for i in range(11, 16)]
    out = edge_support_topk(_ds(rim + spokes), k=20).to_pandas()
    sup = {(a, b): s for a, b, s in zip(out["doc_a"], out["doc_b"], out["support"])}
    for a, b in spokes:
        assert sup[(a, b)] == 2, (a, b)
    for a, b in rim:
        assert sup[(min(a, b), max(a, b))] == 1, (a, b)
    # ordering: support desc then (doc_a, doc_b)
    assert out["support"].tolist() == sorted(out["support"].tolist(), reverse=True)


def test_ktruss_known_graphs():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        ktruss_edges,
    )

    def _ds(pairs):
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([a for a, _ in pairs], pa.int64()),
                    "doc_b": pa.array([b for _, b in pairs], pa.int64()),
                }
            )
        )

    # triangle + a tail: 3-truss = the triangle, supports all 1
    tri_tail = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    out = ktruss_edges(_ds(tri_tail), k=3).to_pandas()
    assert set(zip(out["doc_a"], out["doc_b"])) == {(1, 2), (1, 3), (2, 3)}
    assert (out["support"] == 1).all()

    # two triangles sharing ONE VERTEX joined by a bridge: both survive
    # at k=3; the bridge dies
    two = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    out = ktruss_edges(_ds(two), k=3).to_pandas()
    assert len(out) == 6 and (3, 4) not in set(zip(out["doc_a"], out["doc_b"]))

    # k=4 on K4-plus-pendant-triangle: K4 survives (support 2), the
    # pendant triangle peels (its edges only ever reach support 1)
    g = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (4, 6), (5, 6)]
    out = ktruss_edges(_ds(g), k=4).to_pandas()
    assert set(zip(out["doc_a"], out["doc_b"])) == {
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)
    }
    assert (out["support"] == 2).all()

    # cascade: a triangle chain where removing the weak edge re-peels
    # everything (k=4 on a "diamond" = 2 triangles sharing an edge)
    diamond = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    out = ktruss_edges(_ds(diamond), k=4).to_pandas()
    assert len(out) == 0
