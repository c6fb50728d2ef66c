"""End-to-end build + query vs brute-force oracle (FIXTURES.md §3/§4):
stats parity, postings parity, dedup keep-first, WAND ≡ exhaustive,
rank-identical top-k, parallelism invariance."""

import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
    build_index,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.oracle import (
    OracleIndex,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
    SearchIndex,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
    pages_parquet,
    reference_queries,
)

N_DOCS = 400


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    pages = pages_parquet(N_DOCS)
    out = str(tmp_path_factory.mktemp("idx"))
    shutil.rmtree(out, ignore_errors=True)
    paths = build_index(
        pages, out, num_partitions=3, hot_df_threshold=60, num_salts=4, verify_extraction=True
    )
    idx = SearchIndex.load(out)
    oracle = OracleIndex(pq.read_table(pages))
    return pages, paths, idx, oracle


def test_global_stats_match(built):
    _pages, _paths, idx, oracle = built
    assert idx.N == oracle.N
    assert idx.avgdl == oracle.avgdl


def test_term_stats_and_postings_match(built):
    _pages, _paths, idx, oracle = built
    ost = oracle.term_stats()
    assert set(idx.terms) == set(ost)
    for term, (df, cf) in ost.items():
        p = idx.terms[term]
        assert (p.df, p.cf) == (df, cf), term
        ids, tfs = oracle.sorted_postings(term)
        assert np.array_equal(p.ids, ids), term
        assert np.array_equal(p.tfs, tfs), term


def test_dedup_keep_first(built):
    _pages, paths, idx, oracle = built
    store = pq.read_table(paths.docstore)
    canon = store.filter(store["is_canonical"])
    assert canon.num_rows == oracle.N
    losers = store.filter(np.logical_not(store["is_canonical"].to_numpy(zero_copy_only=False)))
    assert losers.num_rows == len(oracle.loser_canonical)
    for row in losers.to_pylist():
        assert oracle.loser_canonical[row["doc_id"]] == row["canonical_url"]


def test_bm25_rank_identical_to_oracle(built):
    _pages, _paths, idx, oracle = built
    for _qid, q in reference_queries():
        assert idx.bm25_topk_exhaustive(q, 10) == oracle.bm25_topk(q, 10), q


def test_wand_equals_exhaustive(built):
    _pages, _paths, idx, oracle = built
    for k in (1, 3, 10, 50):
        for _qid, q in reference_queries():
            assert idx.bm25_topk(q, k, method="wand") == idx.bm25_topk_exhaustive(q, k), (q, k)


def test_maxscore_equals_exhaustive(built):
    """MaxScore (the second dynamic-pruning algorithm) is bit-identical
    to the exhaustive scorer — scores AND tie-broken order — at every k,
    like WAND."""
    _pages, _paths, idx, _oracle = built
    for k in (1, 3, 10, 50):
        for _qid, q in reference_queries():
            assert idx.bm25_topk(q, k, method="maxscore") == idx.bm25_topk_exhaustive(
                q, k
            ), (q, k)


def test_scalar_daat_equals_vectorized(built):
    """The retained scalar document-at-a-time reference loops agree
    bit-for-bit with the vectorized block-max paths (and hence with the
    exhaustive scorer) — the four-way A/B across every k."""
    _pages, _paths, idx, _oracle = built
    for k in (1, 3, 10, 50):
        for _qid, q in reference_queries():
            want = idx.bm25_topk_exhaustive(q, k)
            assert idx.bm25_topk(q, k, method="wand_scalar") == want, (q, k)
            assert idx.bm25_topk(q, k, method="maxscore_scalar") == want, (q, k)


def test_reference_scorer_matches_oracle(built):
    _pages, _paths, idx, oracle = built
    for _qid, q in reference_queries():
        got = idx.reference_topk(q)
        want = oracle.reference_topk(q)
        assert [d for d, _ in got] == [d for d, _ in want], q
        assert all(abs(a - b) < 1e-9 for (_, a), (_, b) in zip(got, want)), q


def test_zero_hit_and_empty_queries(built):
    _pages, _paths, idx, _oracle = built
    assert idx.bm25_topk("zzqxnothing", 10) == []
    assert idx.bm25_topk("", 10) == []
    assert idx.reference_topk("!?!?") == []


def test_search_assembles_results(built):
    _pages, _paths, idx, oracle = built
    res = idx.search("the", 5)
    assert len(res) == 5
    for r in res:
        assert r["url"].startswith("http://")
        assert r["doc_id"] in oracle.docs
        assert r["title"] == oracle.docs[r["doc_id"]]["title"]


def test_parallelism_invariance(built, tmp_path):
    """Same corpus, different partitioning -> byte-identical postings
    (the sandbox stand-in for N-node vs 4N-node build parity)."""
    pages, paths, idx, _oracle = built
    out2 = str(tmp_path / "idx2")
    build_index(pages, out2, num_partitions=1, hot_df_threshold=60, num_salts=2)
    idx2 = SearchIndex.load(out2)
    assert set(idx.terms) == set(idx2.terms)
    for t, p in idx.terms.items():
        p2 = idx2.terms[t]
        assert np.array_equal(p.ids, p2.ids) and np.array_equal(p.tfs, p2.tfs), t


def test_docstore_lookup_indexed(tmp_path):
    """DocStore.lookup routes each id to its row group via searchsorted
    on the (min,max) stats index — both the disjoint-sorted fast path
    and the overlapping-range fallback return exact rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
        DocStore,
    )

    def write_store(root, ranges):
        root.mkdir()
        for i, ids in enumerate(ranges):
            t = pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "url": pa.array([f"u{d}" for d in ids]),
                }
            )
            pq.write_table(t, root / f"part-{i}.parquet", row_group_size=4)

    sorted_root = tmp_path / "sorted"
    write_store(sorted_root, [list(range(0, 20)), list(range(20, 40))])
    ds = DocStore(str(sorted_root))
    assert ds._disjoint
    got = ds.lookup([3, 19, 20, 39, 999])
    assert sorted(got) == [3, 19, 20, 39]
    assert got[20]["url"] == "u20"

    overlap_root = tmp_path / "overlap"
    write_store(overlap_root, [[0, 5, 30], [2, 6, 31]])
    ds2 = DocStore(str(overlap_root))
    assert not ds2._disjoint
    got2 = ds2.lookup([5, 6, 31, 7])
    assert sorted(got2) == [5, 6, 31]


def test_reference_topk_rank_multiplier(built):
    """The vestigial Searcher.java:48,155 rank hook: admission set is
    unchanged (threshold applies pre-boost), scores scale by
    (1 + w * rank), order follows the boosted score."""
    _pages, _paths, idx, _oracle = built
    q = base = None
    for _qid, cand in reference_queries():
        got = idx.reference_topk(cand, k=50)
        if len(got) >= 2:
            q, base = cand, got
            break
    assert base, "no reference query admits >=2 docs at this corpus size"
    # zero weight / empty map are no-ops
    assert idx.reference_topk(q, k=50, page_ranks={}) == base
    assert idx.reference_topk(q, k=50, page_ranks={base[0][0]: 9.0}, rank_weight=0.0) == base
    # boosting the last doc reorders it to the front, same admission set
    last_doc = base[-1][0]
    boosted = idx.reference_topk(q, k=50, page_ranks={last_doc: 100.0})
    assert {d for d, _ in boosted} == {d for d, _ in base}
    assert boosted[0][0] == last_doc
    want = dict(base)[last_doc] * (1.0 + 100.0)
    assert abs(boosted[0][1] - want) < 1e-12


def test_boolean_and_matches_oracle(built):
    _pages, _paths, idx, oracle = built
    for _qid, q in reference_queries():
        assert idx.boolean_and(q, 10) == oracle.boolean_and_topk(q, 10), q
    # corpus-absent term empties a strict AND even when others match
    assert idx.boolean_and("the zzqxnothing", 10) == []
    assert idx.boolean_and("", 10) == []


def test_phrase_topk_matches_oracle(built):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        phrase_queries,
    )

    _pages, _paths, idx, oracle = built
    any_hits = 0
    for _qid, q in phrase_queries():
        got = idx.phrase_topk(q, 10)
        assert got == oracle.phrase_topk(q, 10), q
        any_hits += bool(got)
    assert any_hits >= 3, "phrase set matched almost nothing at fixture scale"
    # overlap counting: repeated-term phrase
    assert idx.phrase_topk("the the", 10) == oracle.phrase_topk("the the", 10)
    assert idx.phrase_topk("", 10) == []
    assert idx.phrase_topk("zzq nohit", 10) == []


def test_title_boost_matches_bruteforce(built):
    """bm25_title_boost vs a brute-force recomputation from the pages
    table: full-corpus base scores + title-token boost, verifying both
    the ranking and that the boost-bound candidate pruning is lossless."""
    from collections import defaultdict

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        extract_html,
        tokenize,
        tokenize_query,
    )

    pages, _paths, idx, oracle = built
    tbl = pq.read_table(pages)
    # map doc_id = hash64(url) -> title via the same extraction
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
        hash64,
    )

    title_by_doc = {}
    for r in tbl.to_pylist():
        t, _body = extract_html(r["html"])
        title_by_doc[hash64(r["url"])] = t

    checked_hits = 0
    for _qid, q in reference_queries():
        got = idx.bm25_title_boost(q, k=10)
        q_terms = [t for t in tokenize_query(q) if idx.has_term(t)]
        base = {d: int(round(s * 1e6)) for d, s in oracle.bm25_topk(q, k=10**9)}
        expect = []
        for d, b in base.items():
            hits = len(set(q_terms) & set(tokenize(title_by_doc[d])))
            expect.append((d, b + 500_000 * hits, b, hits))
        expect.sort(key=lambda t: (-t[1], t[0]))
        assert got == expect[:10], q
        checked_hits += sum(h for _d, _t, _b, h in got)
    assert checked_hits > 0, "no title hits anywhere — boost never exercised"


def test_anchor_boost_matches_bruteforce(built):
    """bm25_anchor_boost vs a brute-force recomputation: the anchor map
    built by the distributed stage must equal a per-page Python rebuild
    (extract_anchor_texts + normalize_url + canonical tokenize, distinct
    per (target, term)), and the ranking must equal full-corpus base
    scores + 300000 * |query terms in the doc's inbound anchor set|."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
        hash64,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize,
        tokenize_query,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.urls import (
        is_crawlable,
        normalize_seed,
        normalize_url,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.urls import (
        extract_anchor_texts,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        inbound_anchor_query_terms,
    )

    import ray

    pages, _paths, idx, oracle = built
    tbl = pq.read_table(pages)

    vocab = {
        t for _qid, q in reference_queries() for t in tokenize_query(q) if idx.has_term(t)
    }
    # brute-force inbound anchor map: normalized target -> distinct terms
    by_target: dict[str, set] = {}
    for r in tbl.to_pylist():
        html = r["html"].decode("utf-8", "replace")
        for href, text in extract_anchor_texts(html):
            n = normalize_url(r["url"], href)
            if n is None or not is_crawlable(n):
                continue
            for term in tokenize(text):
                if term in vocab:
                    by_target.setdefault(n, set()).add(term)
    expect_map: dict[int, set] = {}
    for r in tbl.to_pylist():
        n = normalize_seed(r["url"])
        if n in by_target:
            expect_map[hash64(r["url"])] = set(by_target[n])

    got_map: dict[int, set] = {}
    pairs = inbound_anchor_query_terms(pages, vocab)
    for blk in ray.get(pairs.to_arrow_refs()):
        for d, t in zip(blk["doc_id"].to_pylist(), blk["term"].to_pylist()):
            got_map.setdefault(d, set()).add(t)
    assert got_map == expect_map
    assert expect_map, "no anchor endorsements at fixture scale — boost vacuous"

    checked_hits = 0
    for _qid, q in reference_queries():
        got = idx.bm25_anchor_boost(q, got_map, k=10)
        q_terms = list(
            dict.fromkeys(t for t in tokenize_query(q) if idx.has_term(t))
        )
        base = {d: int(round(s * 1e6)) for d, s in oracle.bm25_topk(q, k=10**9)}
        expect = []
        for d, b in base.items():
            hits = len(set(q_terms) & expect_map.get(d, set()))
            expect.append((d, b + 300_000 * hits, b, hits))
        expect.sort(key=lambda t: (-t[1], t[0]))
        assert got == expect[:10], q
        checked_hits += sum(h for _d, _t, _b, h in got)
    assert checked_hits > 0, "no anchor hits anywhere — boost never exercised"


def test_boolean_not_matches_bruteforce(built):
    """bm25_not vs full-corpus recomputation: base BM25 candidates with
    every doc containing any exclusion term removed (exclusions =
    the next reference query's terms, the registered pairing)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )

    _pages, _paths, idx, oracle = built
    qs = list(reference_queries())
    excluded_any = 0
    for i, (_qid, q) in enumerate(qs):
        exclude = qs[(i + 1) % len(qs)][1]
        got = idx.bm25_not(q, exclude, k=10)
        x_terms = set(tokenize_query(exclude))
        base = [(d, int(round(s * 1e6))) for d, s in oracle.bm25_topk(q, k=10**9)]
        expect = [
            (d, s6) for d, s6 in base if not (x_terms & set(oracle.doc_tokens[d]))
        ]
        expect.sort(key=lambda t: (-t[1], t[0]))
        assert got == expect[:10], q
        excluded_any += len(base) - len(expect)
    assert excluded_any > 0, "exclusion never removed a candidate — vacuous"


def test_site_filter_more_from_top_host(built):
    """bm25_site_topk keeps exactly the prefix docs sharing the top
    result's URL host, in prefix order."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.urls import (
        host_of,
    )

    _pages, _paths, idx, oracle = built
    multi = 0
    for _qid, q in reference_queries():
        got = idx.bm25_site_topk(q, k=10)
        e6 = idx._e6_prefix(q, 50)
        if not e6:
            assert got == []
            continue
        want = host_of(oracle.docs[e6[0][1]]["url"])
        expect = [
            (d, s6, want)
            for s6, d in e6
            if host_of(oracle.docs[d]["url"]) == want
        ][:10]
        assert got == expect, q
        if len(got) > 1:
            multi += 1
    assert multi > 0, "no query kept >1 same-host result — filter vacuous"


def test_facets_and_recency(built):
    """bm25_facets counts exactly the e6 top-50 prefix's (host, lang)
    values; bm25_topk_recency is the prefix re-ranked by score_e6 +
    1000 * epoch_day(warc_ts) — both pure functions of the prefix."""
    import calendar
    from collections import Counter

    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.urls import (
        host_of,
    )

    pages, _paths, idx, oracle = built
    pt = pq.read_table(pages, columns=["url", "lang", "warc_ts"])
    by_url = {
        u: (l, ts)
        for u, l, ts in zip(
            pt["url"].to_pylist(), pt["lang"].to_pylist(), pt["warc_ts"].to_pylist()
        )
    }
    hit = 0
    for _qid, q in reference_queries():
        wide = idx.bm25_topk(q, k=80)
        e6 = sorted(
            ((int(round(s * 1_000_000)), d) for d, s in wide),
            key=lambda t: (-t[0], t[1]),
        )[:50]
        if not e6:
            continue
        hit += 1
        host_c, lang_c = Counter(), Counter()
        boosted = []
        for s6, d in e6:
            url = oracle.docs[d]["url"]
            lang, ts = by_url[url]
            host_c[host_of(url)] += 1
            lang_c[lang] += 1
            boosted.append((s6 + 1000 * (calendar.timegm(ts.timetuple()) // 86400), d))
        want_facets = sorted(
            [("host", v, n) for v, n in host_c.items()]
            + [("lang", v, n) for v, n in lang_c.items()]
        )
        assert idx.bm25_facets(q, candidates=50) == want_facets
        assert sum(n for f, _v, n in want_facets if f == "host") == len(e6)
        boosted.sort(key=lambda t: (-t[0], t[1]))
        want_rec = [(d, b) for b, d in boosted[:10]]
        assert idx.bm25_topk_recency(q, k=10) == want_rec
    assert hit >= 10


def test_host_collapsed_topk(built):
    """Site collapse: at most per_host results per URL host, results and
    order consistent with the uncollapsed e6 ranking, collapse is a
    pure filter (every winner appears in the wide ranking at an equal
    or better uncollapsed rank)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.urls import (
        host_of,
    )

    _pages, _paths, idx, oracle = built
    hit = 0
    for _qid, q in reference_queries():
        out = idx.bm25_topk_collapsed(q, k=10, per_host=1)
        if not out:
            continue
        hit += 1
        hosts = [h for _d, _s, h in out]
        assert len(hosts) == len(set(hosts)), "per_host=1 violated"
        # scores non-increasing, (score desc, doc_id) order
        key = [(-s, d) for d, s, _h in out]
        assert key == sorted(key)
        # pure filter of the e6 candidate prefix
        wide = idx.bm25_topk(q, k=80)
        e6 = sorted(
            ((int(round(s * 1_000_000)), d) for d, s in wide),
            key=lambda t: (-t[0], t[1]),
        )[:50]
        prefix = [d for _s, d in e6]
        seen = set()
        want = []
        for s6, d in e6:
            h = host_of(oracle.docs[d]["url"])
            if h not in seen:
                seen.add(h)
                want.append((d, s6, h))
            if len(want) == 10:
                break
        assert out == want
        assert all(d in prefix for d, _s, _h in out)
        # per_host=2 is a superset-or-equal head of the per-host quota
        out2 = idx.bm25_topk_collapsed(q, k=10, per_host=2)
        from collections import Counter

        assert all(c <= 2 for c in Counter(h for _d, _s, h in out2).values())
    assert hit >= 10


def test_didyoumean_correction_recovers_vocab_term(built):
    # the spell-correction rule behind search_didyoumean: dropping the
    # 2nd char of a frequent length>=5 vocab term must correct back to
    # a real vocabulary term at distance <= 1 (usually the original)
    import numpy as np

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        _levenshtein_to_all,
    )

    _pages, paths, idx, _oracle = built
    import glob

    import pyarrow.parquet as pq_mod

    import pyarrow as pa_mod

    ts = pa_mod.concat_tables(
        pq_mod.read_table(f, columns=["term", "cf"])
        for f in glob.glob(paths.term_stats + "/*.parquet")
    )
    terms = np.array(ts["term"].to_pylist(), dtype=object)
    cf = ts["cf"].to_numpy(zero_copy_only=False)
    lens = np.array([len(t) for t in terms], dtype=np.int64)
    elig = lens >= 5
    order = np.lexsort((terms[elig], -cf[elig]))[:5]
    vocab = set(terms)
    L = int(lens.max())
    mat = np.zeros((len(terms), L), dtype=np.uint32)
    for i, t in enumerate(terms):
        mat[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), np.uint32)
    for orig in terms[elig][order]:
        q = orig[0] + orig[2:]
        dist = _levenshtein_to_all(q, mat, lens)
        best = int(np.lexsort((terms, dist))[0])
        assert terms[best] in vocab
        assert dist[best] <= 1
        # the corrected query retrieves something
        assert len(idx.bm25_topk(terms[best], k=5)) > 0


def test_index_export_reference_acc_format(built):
    # the exported acc strings reproduce the reference index-table
    # contract exactly: split on ',', entries 'doc:tf', df = entry
    # count (Searcher.java:78-113), postings doc_id-ascending
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.export_index import (
        export_reference_index,
    )

    _pages, paths, idx, oracle = built
    out = export_reference_index(paths.out_dir).to_pandas()
    acc = dict(zip(out["term"], out["acc"]))
    assert set(acc) == set(oracle.postings)
    for t in list(oracle.postings)[:200]:
        entries = [e.split(":") for e in acc[t].split(",")]
        got_pairs = [(int(d), int(f)) for d, f in entries]
        assert got_pairs == sorted(oracle.postings[t].items())


def test_compact_index_single_file_and_score_identical(built, tmp_path):
    import glob

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.compact_index import (
        compact_index,
    )

    _pages, paths, idx, _oracle = built
    out = str(tmp_path / "compacted")
    compact_index(paths.out_dir, out)
    # one file per shard directory
    for d in glob.glob(out + "/shards/shard=*"):
        assert len(glob.glob(d + "/*.parquet")) == 1
    idx2 = SearchIndex.load(out)
    assert idx2.N == idx.N and idx2.avgdl == idx.avgdl
    for _qid, q in reference_queries():
        assert idx2.bm25_topk(q, 10) == idx.bm25_topk(q, 10)
        assert idx2.reference_topk(q) == idx.reference_topk(q)


def test_tiered_champion_retrieval(built):
    """Tier-1 scores are bit-identical to exhaustive for the same docs;
    tier-2 fallback IS the exhaustive ranking; with champions covering
    whole posting lists tier 1 reproduces the flagship top-k exactly."""
    _pages, _paths, idx, _oracle = built
    saw_t1 = saw_t2 = False
    for _qid, q in reference_queries():
        ranked, tier = idx.bm25_topk_tiered(q, k=10, champions=8)
        exh = idx.bm25_topk_exhaustive(q, 10)
        if tier == 2:
            saw_t2 = True
            assert ranked == exh
        else:
            saw_t1 = bool(ranked) or saw_t1
            exact = dict(idx.bm25_topk_exhaustive(q, 10_000))
            for d, s in ranked:
                assert s == exact[d]  # bit-identical restricted scoring
        # champion lists >= every posting list -> tier 1 == flagship
        full, tier_full = idx.bm25_topk_tiered(q, k=10, champions=10_000)
        if tier_full == 1:
            assert full == exh
    assert saw_t1 and saw_t2, "both tiers must be exercised at fixture scale"


def test_mmr_diversification_properties(built):
    """MMR rank-0 is the e6-top-1; selection never repeats a doc;
    lambda=1.0 (no diversity penalty) reproduces the e6 prefix order;
    diversification actually reorders at least one query at fixture
    scale (non-vacuous)."""
    _pages, _paths, idx, _oracle = built
    reordered = 0
    for _qid, q in reference_queries():
        sel = idx.bm25_topk_mmr(q, k=10, candidates=30)
        if not sel:
            continue
        pref = idx._e6_prefix(q, 30)
        assert sel[0][0] == pref[0][1]
        assert len({d for d, _s, _r in sel}) == len(sel)
        assert [r for _d, _s, r in sel] == list(range(len(sel)))
        pure = idx.bm25_topk_mmr(q, k=10, candidates=30, lam_e6=1_000_000)
        assert [d for d, _s, _r in pure] == [d for _s, d in pref[: len(pure)]]
        if [d for d, _s, _r in sel] != [d for d, _s, _r in pure]:
            reordered += 1
    assert reordered >= 1, "MMR never reordered anything — vacuous at fixture scale"


def test_ltr_features_consistency(built):
    """Feature rows agree with first-principles postings probes: dl is
    the doc's length, sum_tf sums exactly the matched terms' tfs, and
    score_e6 matches the e6 prefix."""
    _pages, _paths, idx, oracle = built
    checked = 0
    for _qid, q in reference_queries():
        rows = idx.ltr_features(q, k=10, candidates=30)
        pref = dict((d, s) for s, d in idx._e6_prefix(q, 30))
        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
            tokenize_query,
        )

        terms = sorted({t for t in tokenize_query(q) if idx.has_term(t)})
        for row in rows:
            assert row["score_e6"] == pref[row["doc_id"]]
            n, st = 0, 0
            dls = set()
            for t in terms:
                p = idx.postings(t)
                import numpy as np

                i = int(np.searchsorted(p.ids, row["doc_id"]))
                if i < p.ids.size and p.ids[i] == row["doc_id"]:
                    n += 1
                    st += int(p.tfs[i])
                    dls.add(int(p.dls[i]))
            assert row["n_terms"] == n and row["sum_tf"] == st
            assert dls == {row["dl"]}
            checked += 1
    assert checked > 50


def test_lm_dirichlet_matches_oracle(built):
    """Query-likelihood / Dirichlet ranking matches the brute-force
    oracle at the e6 contract (numpy's SIMD log differs from libm by
    <=1 ULP, so raw-float equality is too strict), is non-vacuous, and
    is NOT the same ordering as BM25 everywhere (a genuinely different
    ranking family)."""
    _pages, _paths, idx, oracle = built
    any_hits = 0
    differs = 0
    for _qid, q in reference_queries():
        got = idx.lm_dirichlet_topk(q, 10)
        want = oracle.lm_dirichlet_topk(q, 10)
        assert [(d, round(s * 1e6)) for d, s in got] == [
            (d, round(s * 1e6)) for d, s in want
        ], q
        for (_d, s_got), (_d2, s_want) in zip(got, want):
            assert abs(s_got - s_want) <= 1e-9 * max(1.0, abs(s_want)), q
        if got:
            any_hits += 1
            bm = [d for d, _s in idx.bm25_topk_exhaustive(q, 10)]
            if [d for d, _s in got] != bm:
                differs += 1
    assert any_hits >= 10
    assert differs >= 1, "LM ranking never diverged from BM25 — vacuous"


def test_search_after_cursor_pagination(built):
    """Paging through bm25_topk_after reconstructs the e6 top-20
    exactly (no gaps, no dupes at the page boundary), and a cursor
    deep enough to force iterative deepening still works."""
    _pages, _paths, idx, _oracle = built
    checked = 0
    for _qid, q in reference_queries():
        full = idx._e6_prefix(q, candidates=20)
        p1 = idx.bm25_topk_after(q, k=10)
        assert p1 == full[:10], q
        if len(p1) < 10:
            continue
        p2 = idx.bm25_topk_after(q, k=10, after=p1[-1])
        assert p2 == full[10:20], q
        if p2:
            # deepening: page 3 via page 2's last cursor
            p3 = idx.bm25_topk_after(q, k=10, after=p2[-1])
            deep = idx._e6_prefix(q, candidates=30)
            assert p3 == deep[len(p1) + len(p2) : len(p1) + len(p2) + 10], q
        checked += 1
    assert checked >= 10


def test_bm25_conjunctive_and_explain(built):
    _pages, _paths, idx, _oracle = built
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )

    nonempty = 0
    for _qid, q in reference_queries():
        got = idx.bm25_conjunctive_topk(q, 10)
        terms = sorted({t for t in tokenize_query(q) if idx.has_term(t)})
        # strict-AND: every result contains ALL terms, with flagship score
        exh = dict(idx.bm25_topk_exhaustive(q, 10**6))
        for d, s in got:
            assert s == exh[d], q
            for t in terms:
                p = idx.postings(t)
                i = int(np.searchsorted(p.ids, d))
                assert i < p.ids.size and p.ids[i] == d, (q, t)
        if got:
            nonempty += 1
        # explain: per-term contribs of a duplicate-free query sum to
        # the doc's score within per-term e6 rounding slack
        toks = tokenize_query(q)
        if len(toks) == len(set(toks)):
            rows = idx.explain_topk(q, k=3)
            by_doc = {}
            for r in rows:
                by_doc.setdefault(r["doc_id"], 0)
                by_doc[r["doc_id"]] += r["contrib_e6"]
            for s6, d in idx._e6_prefix(q, candidates=3):
                assert abs(by_doc[d] - s6) <= len(toks) + 1, (q, d)
    assert nonempty >= 5
    # absent term empties a strict AND even when other terms match
    assert idx.bm25_conjunctive_topk("the zzqxnothing", 10) == []


def test_bm25f_matches_bruteforce(built):
    """Simple BM25F re-rank equals a from-scratch brute force over the
    oracle corpus (title tf/length folded into saturation, exact global
    title stats), at the e6 contract; and the title field actually
    moves at least one ranking vs plain BM25."""
    import math

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize,
        tokenize_query,
    )

    _pages, _paths, idx, oracle = built
    w = 3.0
    title_toks = {d: tokenize(v["title"]) for d, v in oracle.docs.items()}
    c_title = sum(len(t) for t in title_toks.values())
    assert idx._title_len_total() == c_title
    avgf = (oracle.total_len + w * c_title) / oracle.N
    k1, b = 1.2, 0.75

    moved = 0
    for _qid, q in reference_queries():
        got = idx.bm25f_topk(q, k=10)
        terms = sorted({t for t in tokenize_query(q) if t in oracle.postings})
        pref = sorted(
            (
                (int(round(s * 1e6)), d)
                for d, s in oracle.bm25_topk(q, k=80)
            ),
            key=lambda t: (-t[0], t[1]),
        )[:50]
        want = []
        for _s6, d in pref:
            tc = {}
            for t in title_toks[d]:
                tc[t] = tc.get(t, 0) + 1
            dlf = oracle.docs[d]["doc_len"] + w * len(title_toks[d])
            s = 0.0
            for t in terms:
                p = oracle.postings[t]
                tfp = p.get(d, 0) + w * tc.get(t, 0)
                if tfp > 0:
                    idf = math.log(1.0 + (oracle.N - len(p) + 0.5) / (len(p) + 0.5))
                    s += idf * ((tfp * (k1 + 1.0)) / (tfp + k1 * ((1.0 - b) + b * dlf / avgf)))
            want.append((d, int(round(s * 1e6))))
        want.sort(key=lambda t: (-t[1], t[0]))
        assert got == want[:10], q
        if got and [d for d, _ in got] != [
            d for d, _ in idx.bm25_topk_exhaustive(q, 10)
        ]:
            moved += 1
    assert moved >= 1, "title field never changed a ranking — vacuous"


def test_fuzzy_expansion_retrieves_typos(built):
    # the search_fuzzy contract: a unit-edit typo of an indexed term
    # expands back to (at least) that term, so the weighted-OR scores
    # equal plain BM25 when the expansion is exactly the original term
    import glob

    import numpy as np
    import pyarrow as pa_mod
    import pyarrow.parquet as pq_mod

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        _levenshtein_to_all,
    )

    _pages, paths, idx, _oracle = built
    ts = pa_mod.concat_tables(
        pq_mod.read_table(f, columns=["term", "cf"])
        for f in glob.glob(paths.term_stats + "/*.parquet")
    )
    terms = np.array(ts["term"].to_pylist(), dtype=object)
    cf = ts["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.array([len(t) for t in terms], dtype=np.int64)
    L = int(lens.max())
    mat = np.zeros((len(terms), L), dtype=np.uint32)
    for i, t in enumerate(terms):
        mat[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), np.uint32)

    # pick a long, rare-ish term: its unit-distance neighbourhood is
    # usually just itself, making the parity assertion exact
    elig = lens >= 8
    orig = terms[elig][np.lexsort((terms[elig], cf[elig]))[0]]
    typo = orig[0] + orig[2:]  # drop 2nd char: distance 1 from orig
    dist = _levenshtein_to_all(typo, mat, lens)
    cand = np.flatnonzero(dist <= 1)
    assert any(terms[c] == orig for c in cand)
    expansion = sorted((str(terms[c]), 1.0) for c in cand[np.lexsort((terms[cand], -cf[cand]))[:8]])
    got = idx.bm25_weighted_topk(expansion, k=5)
    assert len(got) > 0
    if len(expansion) == 1:  # neighbourhood is only the original term
        assert got == idx.bm25_topk(orig, k=5)


def test_eval_map_formula_manual():
    # AP@10 with the lcm(1..10)=2520 integer denominator: a ranking
    # with relevant results at 0-based ranks 0 and 2 and n_rel=2 has
    # AP = (1/1 + 2/3)/2 = 5/6 -> 833333 micros after the floor
    ap_num = 1 * (2520 // 1) + 2 * (2520 // 3)
    assert (1_000_000 * ap_num) // (2520 * 2) == 833_333
    # and a perfect prefix ranking (all rel in the first n_rel slots)
    # scores exactly 1.0
    ap_num = sum(i * (2520 // i) for i in range(1, 4))
    assert (1_000_000 * ap_num) // (2520 * 3) == 1_000_000


def test_bm25_mm_topk(built):
    _pages, _paths, idx, _oracle = built
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )

    nonempty = 0
    for _qid, q in reference_queries():
        got = idx.bm25_mm_topk(q, 10, mm=2)
        exh = dict(idx.bm25_topk_exhaustive(q, 10**6))
        terms = sorted({t for t in tokenize_query(q) if idx.has_term(t)})
        required = min(2, len(set(tokenize_query(q))))
        for d, s in got:
            # mm results carry the flagship OR score ...
            assert s == exh[d], q
            # ... and match >= required distinct terms
            nm = 0
            for t in terms:
                p = idx.postings(t)
                i = int(np.searchsorted(p.ids, d))
                nm += i < p.ids.size and p.ids[i] == d
            assert nm >= required, (q, d)
        if got:
            nonempty += 1
        # mm=1 degenerates to the flagship OR ranking
        assert idx.bm25_mm_topk(q, 10, mm=1) == idx.bm25_topk_exhaustive(q, 10)
        # mm = #terms degenerates to strict AND (same doc set)
        if terms and len(terms) == len(set(tokenize_query(q))):
            a = {d for d, _ in idx.bm25_mm_topk(q, 10**6, mm=len(terms))}
            b = {d for d, _ in idx.bm25_conjunctive_topk(q, 10**6)}
            assert a == b, q
    assert nonempty >= 5
    # one indexed term + mm=2 -> empty (absent term is an unmatched clause)
    assert idx.bm25_mm_topk("the zzqxnothing", 10, mm=2) == []


def test_dismax_topk(built):
    _pages, _paths, idx, _oracle = built
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )

    checked = 0
    for _qid, q in reference_queries():
        got = idx.dismax_topk(q, 10, tie=0.3)
        terms = sorted({t for t in tokenize_query(q) if idx.has_term(t)})
        if not terms:
            assert got == []
            continue
        # brute-force re-derivation: per-doc clause scores
        clause = {}
        for t in terms:
            p = idx.postings(t)
            contrib = idx.bm25_idf(p.df) * idx._bm25_tf_part(
                p.tfs.astype(np.float64), p.dls.astype(np.float64)
            )
            for d, c in zip(p.ids.tolist(), contrib.tolist()):
                clause.setdefault(d, []).append(c)
        want = {d: max(cs) + 0.3 * (sum(cs) - max(cs)) for d, cs in clause.items()}
        for d, s in got:
            assert abs(s - want[d]) < 1e-12, (q, d)
        # tie=1.0 degenerates to the distinct-term additive OR score
        for d, s in idx.dismax_topk(q, 5, tie=1.0):
            assert abs(s - sum(clause[d])) < 1e-12, (q, d)
        checked += 1
    assert checked >= 10


def test_qpp_stats(built):
    _pages, _paths, idx, _oracle = built
    import math

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )

    checked = 0
    for _qid, q in reference_queries():
        st = idx.qpp_stats(q)
        terms = sorted({t for t in tokenize_query(q) if idx.has_term(t)})
        if not terms:
            assert st is None
            continue
        assert st["n_terms"] == len(terms)
        idfs = [idx.bm25_idf(idx.postings(t).df) for t in terms]
        assert st["max_idf_e6"] == int(round(max(idfs) * 1e6))
        scq = sum(
            (1.0 + math.log(float(idx.postings(t).tfs.sum()))) * i
            for t, i in zip(terms, idfs)
        )
        assert st["scq_e6"] == int(round(scq * 1e6))
        checked += 1
    assert checked >= 10
    assert idx.qpp_stats("zzqx999nohit") is None


def test_docstore_concurrent_lookups_thread_safe(built):
    """The serving front is thread-per-connection; DocStore's LRU +
    cached file handles must survive concurrent lookups and keep
    returning exactly the same rows as sequential access."""
    import threading

    _pages, paths, idx, _oracle = built
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import DocStore
    import os
    store = DocStore(os.path.join(str(paths.out_dir), "docstore"))
    all_ids = []
    for q in ("the", "of", "and"):
        all_ids.extend(d for d, _ in idx.bm25_topk_exhaustive(q, 30))
    all_ids = sorted(set(all_ids))
    want = store.lookup(all_ids)
    assert len(want) == len(all_ids)

    errors: list = []

    def hammer(off: int) -> None:
        try:
            for i in range(30):
                ids = all_ids[(off + i) % len(all_ids) :][:7]
                got = store.lookup(ids)
                for d in ids:
                    if got[d]["url"] != want[d]["url"] or got[d]["body"] != want[d]["body"]:
                        raise AssertionError(f"row drift for {d}")
        except Exception as e:  # surface across the thread boundary
            errors.append(e)

    threads = [threading.Thread(target=hammer, args=(k * 3,)) for k in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
