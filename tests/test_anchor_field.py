"""Anchor-text as a REAL index field (round-4 verdict #4): postings
built through the packed term shuffle, doc-length sidecar, BM25F over
body+anchor. Checks: engine postings == an independent per-page Python
recomputation; partitioning invariance (bucket/shard counts do not
change the encoded rows); anchor-only matches enter the candidate set;
BM25F agrees with a brute-force Python scorer."""

import math
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
    hash64,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
    tokenize,
    tokenize_query,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.urls import (
    extract_anchor_texts,
    is_crawlable,
    normalize_seed,
    normalize_url,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.anchor_field import (
    AnchorField,
    bm25f_anchor_topk,
    build_anchor_field,
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

N_DOCS = 300


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    pages = pages_parquet(N_DOCS)
    out = str(tmp_path_factory.mktemp("anchor_idx"))
    shutil.rmtree(out, ignore_errors=True)
    build_index(pages, out, num_partitions=3)
    build_anchor_field(pages, out, num_shards=4)
    return pages, out, SearchIndex.load(out), AnchorField(out)


def _python_anchor_field(pages: str):
    """Independent recomputation: (doc_id -> {term: tf}), alen, C."""
    t = pq.read_table(pages)
    rows = list(
        zip(t["url"].to_pylist(), t["warc_ts"].to_pylist(), t["html"].to_pylist())
    )
    # winner rule: keep first (warc_ts, url) per identical html
    seen: dict[bytes, tuple] = {}
    for u, ts, h in rows:
        key = h if isinstance(h, bytes) else h.encode()
        if key not in seen or (ts, u) < seen[key][:2]:
            seen[key] = (ts, u)
    winner_urls = {u for _ts, u in seen.values()}
    norm_to_doc = {normalize_seed(u): hash64(u) for u in winner_urls}
    atf: dict[int, dict[str, int]] = {}
    for u, _ts, h in rows:  # ALL pages endorse (losers too)
        doc = h.decode("utf-8", "replace") if isinstance(h, (bytes, bytearray)) else h
        for href, text in extract_anchor_texts(doc):
            n = normalize_url(u, href)
            if n is None or not is_crawlable(n) or n not in norm_to_doc:
                continue
            d = norm_to_doc[n]
            cnt = atf.setdefault(d, {})
            for term in tokenize(text):
                cnt[term] = cnt.get(term, 0) + 1
    alen = {d: sum(c.values()) for d, c in atf.items()}
    c_anchor = sum(alen.values())
    return atf, alen, c_anchor


def test_anchor_postings_match_python(built):
    pages, _out, _idx, af = built
    atf, alen, c_anchor = _python_anchor_field(pages)
    assert af.c_anchor == c_anchor
    assert c_anchor > 0, "fixture corpus must have resolvable anchors"
    # every (doc, term) count matches; every doc's field length matches
    vocab = sorted({t for c in atf.values() for t in c})
    got: dict[tuple, int] = {}
    for t in vocab:
        if not af.has_term(t):
            continue
        ids, tfs = af.postings(t)
        for d, f in zip(ids.tolist(), tfs.tolist()):
            got[(d, t)] = f
    want = {(d, t): f for d, c in atf.items() for t, f in c.items()}
    assert got == want
    docs = np.array(sorted(alen), dtype=np.int64)
    assert np.array_equal(af.alen(docs), np.array([alen[d] for d in docs.tolist()]))
    # docs without anchors -> 0
    assert af.alen(np.array([123456789], dtype=np.int64)).tolist() == [0]


def test_anchor_build_partitioning_invariance(built, tmp_path):
    pages, out, _idx, _af = built
    out2 = str(tmp_path / "alt")
    shutil.rmtree(out2, ignore_errors=True)
    import os
    os.makedirs(out2)
    # the alt build borrows the same docstore (url->doc_id table)
    shutil.copytree(os.path.join(out, "docstore"), os.path.join(out2, "docstore"))
    build_anchor_field(pages, out2, num_shards=2, num_buckets=8)

    def rows(d):
        t = pq.read_table(
            os.path.join(d, "anchor_shards"),
            columns=["term", "df", "cf", "doc_blob", "tf_blob", "dl_blob"],
        )
        return sorted(t.to_pylist(), key=lambda r: r["term"])

    assert rows(out) == rows(out2)


def test_bm25f_anchor_matches_python_scorer(built):
    pages, _out, idx, af = built
    atf, alen, c_anchor = _python_anchor_field(pages)
    w = 2.0
    avgdlf = (float(idx.meta["total_len"]) + w * c_anchor) / idx.N
    k1, b = idx.k1, idx.b

    def py_topk(query, k=10):
        q_terms = sorted({t for t in tokenize_query(query) if idx.has_term(t)})
        if not q_terms:
            return []
        cand = set()
        body = {}
        for t in q_terms:
            p = idx.postings(t)
            body[t] = dict(zip(p.ids.tolist(), zip(p.tfs.tolist(), p.dls.tolist())))
            cand.update(p.ids.tolist())
            cand.update(d for d, c in atf.items() if t in c)
        scores = {}
        for d in cand:
            s = 0.0
            dlb = next((body[t][d][1] for t in q_terms if d in body[t]), None)
            if dlb is None:
                rows = idx._store().lookup([d])
                dlb = int(rows[d]["doc_len"]) if d in rows else 0
            dlf = dlb + w * alen.get(d, 0)
            for t in q_terms:
                tfb = body[t][d][0] if d in body[t] else 0
                tfa = atf.get(d, {}).get(t, 0)
                tfp = tfb + w * tfa
                if tfp <= 0:
                    continue
                idf = math.log(1.0 + (idx.N - idx.postings(t).df + 0.5) / (idx.postings(t).df + 0.5))
                s += idf * (tfp * (k1 + 1.0)) / (tfp + k1 * ((1.0 - b) + b * dlf / avgdlf))
            e6 = int(round(s * 1e6))
            if e6 > 0:
                scores[d] = e6
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    for _qid, q in reference_queries():
        assert bm25f_anchor_topk(idx, af, q, 10, w=w) == py_topk(q, 10), q


def test_anchor_only_match_enters(built):
    """A doc endorsed by inbound anchors for a query term but with no
    BODY occurrence of any query term must appear in the candidates —
    the behavior the flat boost could not give."""
    pages, _out, idx, af = built
    atf, _alen, _c = _python_anchor_field(pages)
    # find a (doc, term) where the doc is NOT in the term's body postings
    found = None
    for d, c in atf.items():
        for t in c:
            if idx.has_term(t):
                p = idx.postings(t)
                pos = int(np.searchsorted(p.ids, d))
                in_body = pos < p.ids.size and p.ids[pos] == d
                if not in_body:
                    found = (d, t)
                    break
        if found:
            break
    if found is None:
        pytest.skip("corpus has no anchor-only (doc, term) pair")
    d, t = found
    res = bm25f_anchor_topk(idx, af, t, k=10**6)
    assert d in [x for x, _ in res]


@pytest.fixture(scope="module")
def titled(built):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.anchor_field import (
        TitleField,
        build_title_field,
    )

    pages, out, idx, af = built
    build_title_field(out, num_shards=4)
    return pages, out, idx, af, TitleField(out)


def test_title_field_postings_match_docstore(titled):
    """Title postings == per-doc Counter(tokenize(title)) over the
    canonical doc store; lengths and C_title exact."""
    from collections import Counter

    _pages, out, idx, _af, tf = titled
    store = pq.read_table(out + "/docstore", columns=["doc_id", "title", "is_canonical"])
    store = store.filter(store["is_canonical"])
    want: dict[tuple, int] = {}
    tlen: dict[int, int] = {}
    for d, title in zip(store["doc_id"].to_pylist(), store["title"].to_pylist()):
        c = Counter(tokenize(title))
        for t, n in c.items():
            want[(d, t)] = n
        if c:
            tlen[d] = sum(c.values())
    got: dict[tuple, int] = {}
    for t in {t for _d, t in want}:
        assert tf.has_term(t), t
        ids, tfs = tf.postings(t)
        for d, f in zip(ids.tolist(), tfs.tolist()):
            got[(d, t)] = f
    assert got == want
    assert tf.c_total == sum(tlen.values())
    docs = np.array(sorted(tlen), dtype=np.int64)
    assert np.array_equal(tf.alen(docs), np.array([tlen[d] for d in docs.tolist()]))


def test_bm25f_all_fields_matches_python(titled):
    """Three-source BM25F (body + title w=3 + anchor w=2) vs a
    brute-force Python scorer; title-only and anchor-only matches
    enter."""
    import math as _math

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.anchor_field import (
        bm25f_fields_topk,
    )

    pages, out, idx, af, tfld = titled
    atf, alen, c_anchor = _python_anchor_field(pages)
    from collections import Counter

    store = pq.read_table(out + "/docstore", columns=["doc_id", "title", "is_canonical", "doc_len"])
    store = store.filter(store["is_canonical"])
    ttf: dict[int, Counter] = {
        d: Counter(tokenize(title))
        for d, title in zip(store["doc_id"].to_pylist(), store["title"].to_pylist())
    }
    dlen = dict(zip(store["doc_id"].to_pylist(), store["doc_len"].to_pylist()))
    w_t, w_a = 3.0, 2.0
    c_title = sum(sum(c.values()) for c in ttf.values())
    avgdlf = (float(idx.meta["total_len"]) + w_t * c_title + w_a * c_anchor) / idx.N
    k1, b = idx.k1, idx.b

    def py_topk(query, k=10):
        q_terms = sorted({t for t in tokenize_query(query) if idx.has_term(t)})
        if not q_terms:
            return []
        cand = set()
        body = {}
        for t in q_terms:
            p = idx.postings(t)
            body[t] = dict(zip(p.ids.tolist(), zip(p.tfs.tolist(), p.dls.tolist())))
            cand.update(p.ids.tolist())
            cand.update(d for d, c in atf.items() if t in c)
            cand.update(d for d, c in ttf.items() if t in c)
        out_scores = {}
        for d in cand:
            dlb = next((body[t][d][1] for t in q_terms if d in body[t]), None)
            if dlb is None:
                dlb = dlen.get(d, 0)
            dlf = dlb + w_t * sum(ttf.get(d, {}).values()) + w_a * alen.get(d, 0)
            s = 0.0
            for t in q_terms:
                tfp = (
                    (body[t][d][0] if d in body[t] else 0)
                    + w_t * ttf.get(d, Counter()).get(t, 0)
                    + w_a * atf.get(d, {}).get(t, 0)
                )
                if tfp <= 0:
                    continue
                df = idx.postings(t).df
                idf = _math.log(1.0 + (idx.N - df + 0.5) / (df + 0.5))
                s += idf * (tfp * (k1 + 1.0)) / (tfp + k1 * ((1.0 - b) + b * dlf / avgdlf))
            e6 = int(round(s * 1e6))
            if e6 > 0:
                out_scores[d] = e6
        return sorted(out_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    for _qid, q in reference_queries():
        got = bm25f_fields_topk(idx, [(tfld, w_t), (af, w_a)], q, 10)
        assert got == py_topk(q, 10), q


def test_title_field_build_invariance(titled, tmp_path):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.anchor_field import (
        build_title_field,
    )

    _pages, out, _idx, _af, _tf = titled
    import os
    out2 = str(tmp_path / "alt_title")
    os.makedirs(out2)
    shutil.copytree(os.path.join(out, "docstore"), os.path.join(out2, "docstore"))
    build_title_field(out2, num_shards=2, num_buckets=8)

    def rows(d):
        t = pq.read_table(
            os.path.join(d, "title_shards"),
            columns=["term", "df", "cf", "doc_blob", "tf_blob", "dl_blob"],
        )
        return sorted(t.to_pylist(), key=lambda r: r["term"])

    assert rows(out) == rows(out2)


def test_search_fields_http_route(titled):
    """/search?rank=fields serves multi-field BM25F end-to-end; the
    rows match bm25f_fields_topk + doc-store assembly; default rank
    unchanged; bad rank rejected."""
    import json as _json
    import urllib.request
    from urllib.parse import quote

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.anchor_field import (
        bm25f_fields_topk,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.serve import (
        SearchHTTPServer,
    )

    _pages, out, _idx, _af, _tf = titled
    idx = SearchIndex.load(out)  # fresh instance discovers field dirs
    fields = idx.field_readers()
    assert [f.prefix for f, _w in fields] == ["title", "anchor"]
    srv = SearchHTTPServer(idx, port=0).start()
    try:
        q = next(q for _qid, q in reference_queries() if idx.bm25_topk_exhaustive(q, 3))
        want = bm25f_fields_topk(idx, fields, q, 5)
        got = _json.loads(
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/search?query={quote(q)}&k=5&rank=fields",
                timeout=10,
            ).read()
        )
        assert [r["rank_score"] for r in got] == [s for _d, s in want]
        # default rank still plain BM25 (different scores, same shape)
        got_plain = _json.loads(
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/search?query={quote(q)}&k=5", timeout=10
            ).read()
        )
        assert set(got_plain[0]) == {"url", "rank_score", "title", "body"}
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/search?query=x&rank=bogus", timeout=10
            )
    finally:
        srv.shutdown()
