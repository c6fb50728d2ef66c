"""Distributed (shard-actor scatter-gather) serving == in-process
scoring, bit-identically, over the reference query set."""

import shutil

import pytest

from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
    build_index,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
    SearchIndex,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.serve import (
    DistributedSearch,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
    pages_parquet,
    reference_queries,
)


@pytest.fixture(scope="module")
def served(tmp_path_factory, ray_session):
    pages = pages_parquet(500)
    out = str(tmp_path_factory.mktemp("idx_serve"))
    shutil.rmtree(out, ignore_errors=True)
    build_index(pages, out, num_partitions=2, num_shards=4, hot_df_threshold=100)
    ds = DistributedSearch(out)
    idx = SearchIndex.load(out)
    yield ds, idx
    ds.shutdown()


def test_distributed_equals_inprocess(served):
    ds, idx = served
    for _qid, q in reference_queries():
        assert ds.bm25_topk(q, 10) == idx.bm25_topk_exhaustive(q, 10), q


def test_distributed_zero_hit(served):
    ds, _ = served
    assert ds.bm25_topk("zzqx42nohit", 10) == []
    assert ds.bm25_topk("", 10) == []


def test_shard_memory_scales_down(served):
    """Each shard actor's resident Arrow bytes are ~1/num_shards of the
    whole index — no per-actor O(N) side table (doc lengths live in
    dl_blob)."""
    import ray

    ds, idx = served
    sizes = ray.get([a.loaded_bytes.remote() for a in ds.actors])
    total = idx._shards.nbytes
    assert sum(sizes) <= total * 1.05  # shards partition the index
    # no single actor holds the whole index (tolerate hash imbalance on
    # a small vocabulary)
    assert max(sizes) < total * 0.6


def test_http_endpoint(served):
    """GET /search?query= serves the reference JSON shape with CORS,
    rank- and score-identical to the in-process index."""
    import json
    import urllib.request

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.serve import (
        SearchHTTPServer,
    )

    ds, idx = served
    srv = SearchHTTPServer(ds, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        full_bodies_seen = False
        for _qid, q in reference_queries()[:12]:
            from urllib.parse import quote

            with urllib.request.urlopen(f"{base}/search?query={quote(q)}") as r:
                assert r.headers["Access-Control-Allow-Origin"] == "*"
                assert r.headers["Content-Type"] == "application/json"
                got = json.loads(r.read())
            want = idx.bm25_topk(q, 10)
            want_rows = idx.search(q, 10)
            assert [g["rank_score"] for g in got] == [s for _d, s in want], q
            assert [g["url"] for g in got] == [w["url"] for w in want_rows], q
            assert all(set(g) == {"url", "rank_score", "title", "body"} for g in got)
            # the reference returns the FULL extracted body per result
            # (Searcher.java:52-57,186-191) — not a truncated prefix
            assert [g["body"] for g in got] == [w["body"] for w in want_rows], q
            full_bodies_seen |= any(len(g["body"]) > 200 for g in got)
        assert full_bodies_seen  # corpus has >200-char docs; no silent truncation
        # error paths: bad route, missing query
        import urllib.error

        for path, code in [("/nope", 404), ("/search", 400), ("/search?query=", 400)]:
            try:
                urllib.request.urlopen(base + path)
                raise AssertionError("expected HTTPError")
            except urllib.error.HTTPError as e:
                assert e.code == code
    finally:
        srv.shutdown()


def test_http_snippet_param(served):
    """&snippet=1 appends a query-biased snippet per result (opt-in —
    the bare contract is unchanged); the window is <= 12 tokens and
    contains a query term whenever the body does."""
    import json
    import urllib.request
    from urllib.parse import quote

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize,
        tokenize_query,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.serve import (
        SearchHTTPServer,
        render_snippet,
    )

    ds, idx = served
    srv = SearchHTTPServer(ds, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        checked = 0
        for _qid, q in reference_queries()[:8]:
            with urllib.request.urlopen(
                f"{base}/search?query={quote(q)}&snippet=1"
            ) as r:
                got = json.loads(r.read())
            q_terms = set(tokenize_query(q))
            for g in got:
                assert set(g) == {"url", "rank_score", "title", "body", "snippet"}
                assert g["snippet"] == render_snippet(g["body"], q)
                toks = tokenize(g["snippet"])
                assert len(toks) <= 12
                if q_terms & set(tokenize(g["body"])):
                    assert q_terms & set(toks), (q, g["snippet"])
                checked += 1
        assert checked >= 10
    finally:
        srv.shutdown()


def test_http_facets_endpoint(served):
    """GET /facets?query= returns the SearchIndex.bm25_facets rows as
    JSON; a backend without a facet method answers 501."""
    import json
    import urllib.error
    import urllib.request
    from urllib.parse import quote

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.serve import (
        SearchHTTPServer,
    )

    ds, idx = served
    srv = SearchHTTPServer(idx, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        checked = 0
        for _qid, q in reference_queries()[:6]:
            with urllib.request.urlopen(f"{base}/facets?query={quote(q)}") as r:
                got = json.loads(r.read())
            want = [
                {"facet": f, "value": v, "n_docs": n} for f, v, n in idx.bm25_facets(q)
            ]
            assert got == want
            checked += len(got)
        assert checked > 0
    finally:
        srv.shutdown()

    # DistributedSearch has no facet method -> 501
    srv2 = SearchHTTPServer(ds, port=0).start()
    try:
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv2.port}/facets?query=the"
            )
            raise AssertionError("expected HTTP 501")
        except urllib.error.HTTPError as e:
            assert e.code == 501
    finally:
        srv2.shutdown()


def test_http_response_cache_and_stats(served):
    # repeated identical queries hit the LRU cache and return the
    # byte-identical payload; /stats reports index + cache counters
    import json as _json
    from urllib.request import urlopen

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.serve import (
        SearchHTTPServer,
    )

    _ds, idx = served
    srv = SearchHTTPServer(idx, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        u = f"{base}/search?query=the+tanel&k=5"
        a = urlopen(u).read()
        b = urlopen(u).read()
        assert a == b
        assert srv.cache_hits == 1 and srv.cache_misses == 1
        # a different k is a different cache entry
        urlopen(f"{base}/search?query=the+tanel&k=3").read()
        assert srv.cache_misses == 2
        stats = _json.loads(urlopen(f"{base}/stats").read())
        assert stats["cache_hits"] == 1 and stats["cache_misses"] == 2
        assert stats["cache_entries"] == 2
        assert stats["n_docs"] == idx.N and stats["avgdl"] == idx.avgdl
    finally:
        srv.shutdown()


def test_http_pagination(served):
    # &start=N pages server-side: page0 + page1 == one k=10 fetch; an
    # offset past the result set returns []
    import json as _json
    from urllib.request import urlopen

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.serve import (
        SearchHTTPServer,
    )

    _ds, idx = served
    srv = SearchHTTPServer(idx, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        full = _json.loads(urlopen(f"{base}/search?query=the&k=10").read())
        p0 = _json.loads(urlopen(f"{base}/search?query=the&k=5").read())
        p1 = _json.loads(urlopen(f"{base}/search?query=the&k=5&start=5").read())
        assert p0 + p1 == full and len(full) == 10
        far = _json.loads(
            urlopen(f"{base}/search?query=the&k=5&start=1000000").read()
        )
        assert far == []
    finally:
        srv.shutdown()


def test_http_fuzzy_param_corrects_oov(served):
    # &fuzzy=1 rewrites OOV terms by min edit distance before scoring;
    # the corrected query's results equal a direct search for it
    import json as _json
    from urllib.request import urlopen

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.serve import (
        SearchHTTPServer,
    )

    _ds, idx = served
    # derive a misspelling of a real vocab term (drop its 2nd char)
    term = next(t for t in idx._term_row if len(t) >= 6)
    typo = term[0] + term[2:]
    srv = SearchHTTPServer(idx, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        fuzzy = _json.loads(
            urlopen(f"{base}/search?query={typo}&k=5&fuzzy=1").read()
        )
        corrected = idx.correct_query(typo)
        direct = _json.loads(
            urlopen(f"{base}/search?query={corrected}&k=5").read()
        )
        assert fuzzy == direct and len(fuzzy) > 0
        # in-vocab queries pass through unchanged
        assert idx.correct_query(term) == term
    finally:
        srv.shutdown()


def test_query_language_parse_and_dispatch(served):
    """The operator-query parser: pure parse results, and dispatch
    identity — query_language() returns exactly what the verified
    primitive it routes to returns."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.queryparse import (
        parse_query,
    )

    _ds, idx = served

    p = parse_query('"exact phrase" -bad site:site3.example the tanel')
    assert p.phrases == ["exact phrase"]
    assert p.excluded == ["bad"]
    assert p.site == "site3.example"
    assert p.terms == ["the", "tanel"]
    # unterminated quote is literal; bare dash ignored; first site: wins
    p2 = parse_query('a "b c - site:x.y site:z.w')
    assert p2.phrases == [] and p2.site == "x.y"
    assert "-" not in p2.terms and '"b' in p2.terms

    q = "the tanel"
    # phrase wins
    assert idx.query_language(f'"{q}"', 10) == idx.phrase_topk(q, k=10)
    # exclusion next
    assert idx.query_language("the tanel -ekamin", 10) == idx.bm25_not(
        "the tanel", "ekamin", k=10
    )
    # site restriction
    host = idx.search(q, 1)[0]["url"].split("/")[2]
    assert idx.query_language(f"the tanel site:{host}", 10) == [
        (d, s) for d, s, _h in idx.bm25_site_topk(q, host=host, k=10)
    ]
    # intitle restriction routes to the filtered kernel
    p3 = parse_query("intitle:tanel the tanel")
    assert p3.intitle == "tanel" and p3.terms == ["the", "tanel"]
    assert idx.query_language("intitle:tanel the tanel", 10) == idx._intitle_filtered(
        "the tanel", "tanel", 10
    )
    # and bm25_intitle_topk == the kernel with the first query token
    assert idx.bm25_intitle_topk(q, k=10) == idx._intitle_filtered(q, "the", 10)
    # every intitle hit actually has the term in its title
    hits = idx.bm25_intitle_topk(q, k=10)
    rows = idx.fetch_docs([d for d, _ in hits])
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize,
    )

    assert hits and all("the" in tokenize(rows[d]["title"]) for d, _ in hits)
    # plain terms: e6-quantized bm25
    got = idx.query_language(q, 10)
    want = sorted(
        ((int(round(s * 1e6)), d) for d, s in idx.bm25_topk(q, 50)),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    assert got == [(d, s) for s, d in want]


def test_http_ql_param(served):
    """GET /search?ql=1 serves operator queries through the parser with
    doc-store-assembled bodies."""
    import json
    import urllib.request
    from urllib.parse import quote

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.serve import (
        SearchHTTPServer,
    )

    _ds, idx = served
    srv = SearchHTTPServer(idx, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        q = "the tanel -ekamin"
        with urllib.request.urlopen(f"{base}/search?query={quote(q)}&ql=1") as r:
            got = json.loads(r.read())
        want = idx.query_language(q, 10)
        assert [g["rank_score"] for g in got] == [s for _d, s in want]
        fetched = idx.fetch_docs([d for d, _ in want])
        assert [g["url"] for g in got] == [fetched[d]["url"] for d, _ in want]
        assert all(set(g) == {"url", "rank_score", "title", "body"} for g in got)
    finally:
        srv.shutdown()


def test_http_ql_guards_and_pagination(served):
    """fuzzy=1&ql=1 is rejected (the rewriter would strip operators),
    and ql plain-term pagination is not capped at the 50-candidate
    default."""
    import urllib.error
    import urllib.request
    from urllib.parse import quote

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.serve import (
        SearchHTTPServer,
    )

    _ds, idx = served
    srv = SearchHTTPServer(idx, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        try:
            urllib.request.urlopen(f"{base}/search?query=the&ql=1&fuzzy=1")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # deep page: start+k > 50 must still return k rows ('the' is hot)
        import json

        with urllib.request.urlopen(
            f"{base}/search?query={quote('the')}&ql=1&start=55&k=10"
        ) as r:
            got = json.loads(r.read())
        assert len(got) == 10
        want = idx.query_language("the", 65)[55:]
        assert [g["rank_score"] for g in got] == [s for _d, s in want]
    finally:
        srv.shutdown()


def test_http_explain_endpoint(served):
    """GET /explain?query= returns the per-(doc, term) BM25 contribution
    rows as JSON; a backend without explain_topk answers 501."""
    import json
    import urllib.error
    import urllib.request
    from urllib.parse import quote

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.serve import (
        SearchHTTPServer,
    )

    ds, idx = served
    srv = SearchHTTPServer(idx, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        checked = 0
        for _qid, q in reference_queries()[:6]:
            with urllib.request.urlopen(f"{base}/explain?query={quote(q)}") as r:
                got = json.loads(r.read())
            assert got == idx.explain_topk(q, k=3)
            checked += len(got)
        assert checked > 0
    finally:
        srv.shutdown()

    srv2 = SearchHTTPServer(ds, port=0).start()
    try:
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{srv2.port}/explain?query=the")
            raise AssertionError("expected HTTP 501")
        except urllib.error.HTTPError as e:
            assert e.code == 501
    finally:
        srv2.shutdown()


def test_shard_actor_crash_recovers(served):
    """Kill a shard actor mid-service (node-loss simulation): Ray must
    reconstruct it from the index dir and transparently retry the
    in-flight scoring calls — the same query returns the same result
    across the crash."""
    import ray

    ds, idx = served
    q = next(q for _qid, q in reference_queries() if idx.bm25_topk_exhaustive(q, 10))
    want = ds.bm25_topk(q, 10)
    assert want == idx.bm25_topk_exhaustive(q, 10)
    # kill every actor WITH restart allowed (no_restart=False) — a full
    # scatter-gather query must heal regardless of which shard owned
    # the query's terms
    for a in ds.actors:
        ray.kill(a, no_restart=False)
    assert ds.bm25_topk(q, 10) == want
    # and the whole reference set still matches post-recovery
    for _qid, qq in reference_queries():
        assert ds.bm25_topk(qq, 10) == idx.bm25_topk_exhaustive(qq, 10), qq


def test_shared_actor_pool_across_routers(served, tmp_path_factory):
    """Two router replicas with shared=True resolve the SAME named
    shard actors (one index copy in memory, N stateless fronts); both
    serve identical results, and one router's shutdown leaves the pool
    alive for the other."""
    import ray

    ds, idx = served
    out = ds.out_dir
    r1 = DistributedSearch(out, shared=True)
    r2 = DistributedSearch(out, shared=True)
    try:
        # same named actor behind both routers
        assert r1.actors[0]._actor_id == r2.actors[0]._actor_id
        q = next(q for _qid, q in reference_queries() if idx.bm25_topk_exhaustive(q, 5))
        want = idx.bm25_topk_exhaustive(q, 5)
        assert r1.bm25_topk(q, 5) == want
        assert r2.bm25_topk(q, 5) == want
        r1.shutdown()  # must NOT kill the shared pool
        assert r2.bm25_topk(q, 5) == want
    finally:
        # explicit teardown of the named pool
        for a in r2.actors:
            ray.kill(a)
        r2.actors = []


def test_reuseport_single_endpoint(served):
    """Two SearchHTTPServer instances bind the SAME port via
    SO_REUSEPORT (the single-endpoint router scale-out, round-5): both
    accept on one endpoint, results identical to in-process; an
    ephemeral port (0) is rejected in reuse mode."""
    import socket
    import urllib.request

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.serve import (
        SearchHTTPServer,
    )

    _ds, idx = served
    with pytest.raises(ValueError):
        SearchHTTPServer(idx, port=0, reuse_port=True)
    # pick a free port, then bind it twice in reuse mode
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    srv1 = SearchHTTPServer(idx, port=port, reuse_port=True).start()
    srv2 = SearchHTTPServer(idx, port=port, reuse_port=True).start()
    try:
        q = next(q for _qid, q in reference_queries() if idx.bm25_topk_exhaustive(q, 3))
        want = idx.search(q, 3)
        import json as _json
        from urllib.parse import quote

        got = _json.loads(
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/search?query={quote(q)}&k=3", timeout=10
            ).read()
        )
        assert [r["url"] for r in got] == [r["url"] for r in want]
        # both listeners are alive on the same port (kernel balances
        # connections; shutting one down must leave the endpoint up)
        srv1.shutdown()
        got2 = _json.loads(
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/search?query={quote(q)}&k=3", timeout=10
            ).read()
        )
        assert [r["url"] for r in got2] == [r["url"] for r in want]
    finally:
        for s_ in (srv1, srv2):
            try:
                s_.shutdown()
            except Exception:
                pass


def test_distributed_segmented_equals_inprocess(served, tmp_path_factory):
    """Shard-actor serving over a SEGMENTED index (the O(delta) update
    layout): per-(segment, shard) actors + global-stats scatter-gather
    == the in-process SegmentedIndex union, bit-identical; /search rows
    assemble from the per-segment doc stores."""
    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.segments import (
        add_segment,
        create_segmented,
    )

    ds, _idx = served
    base = ds.out_dir
    root = str(tmp_path_factory.mktemp("seg_serve"))
    import os
    root = os.path.join(root, "seg")
    create_segmented(base, root)
    # a +20% disjoint delta as a second segment
    big = pages_parquet(600)
    delta = str(tmp_path_factory.mktemp("delta") / "delta.parquet")
    pq.write_table(pq.read_table(big).slice(500), delta)
    add_segment(root, delta, num_partitions=2)

    seg_idx = SearchIndex.load(root)  # -> SegmentedIndex
    dist = DistributedSearch(root)
    try:
        assert dist.segmented and len(dist.seg_actors) == 2
        for _qid, q in reference_queries():
            assert dist.bm25_topk(q, 10) == seg_idx.bm25_topk(q, 10), q
        assert dist.bm25_topk("zzqx42nohit", 10) == []
        q = next(q for _qid, q in reference_queries() if seg_idx.bm25_topk(q, 3))
        want = seg_idx.search(q, 3)
        got = dist.search(q, 3)
        assert [r["url"] for r in got] == [r["url"] for r in want]
        assert [r["rank_score"] for r in got] == [r["rank_score"] for r in want]
    finally:
        dist.shutdown()
