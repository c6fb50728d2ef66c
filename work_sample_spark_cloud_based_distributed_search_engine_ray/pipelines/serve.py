"""Distributed query serving: one Ray actor per index shard,
scatter-gather BM25 top-k.

The reference serves queries from a single process that re-scans the
whole ``urls`` table per request and fetches each term's postings row
from the range-partitioned KVS (``search/Searcher.java:44-101``,
``kvs/KVSClient.java:188-198``). Here the serving tier mirrors the
index layout instead: shard ``s`` holds exactly the terms with
``hash64(term) % num_shards == s``, so

- each ``ShardActor`` loads ONLY its shard's parquet (memory scales
  down with the shard count — on a real cluster, one actor per node);
- a query routes each term to its one owning shard (same hash), so
  per-query fan-out is <= #distinct query terms, not #shards;
- every shard returns per-doc partial BM25 sums for its terms; the
  router merges partials (scores are additive over terms) and takes the
  global top-k. Merged scores are summed in deterministic term order,
  bit-identical to the in-process exhaustive scorer (asserted by
  tests/test_serve.py).

Global stats (N, avgdl, k1, b) are pinned in ``meta.json`` at build
time, so every shard scores with identical constants — the same
invariant that makes N-node and 4N-node builds rank-identically.
"""

from __future__ import annotations

import json
import os

import numpy as np

import ray

from ..functions.hashing import hash64
from ..functions.tokenize import tokenize, tokenize_query


@ray.remote(max_restarts=4, max_task_retries=2)
class ShardActor:
    """Holds one shard's postings; scores its own terms only.

    Self-healing: on a fixed-size multi-node cluster a node loss kills
    its shard actors; ``max_restarts`` lets Ray reconstruct the actor
    (``__init__`` reloads the shard from the cluster-visible index dir)
    and ``max_task_retries`` transparently retries the in-flight
    ``partial_scores`` call against the reborn actor — a query spanning
    a crash returns the SAME result, just slower (asserted by
    tests/test_serve.py::test_shard_actor_crash_recovers). Scoring is
    read-only/idempotent, so retries are always safe."""

    def __init__(self, out_dir: str, shard_id: int):
        import pyarrow.parquet as pq

        from .query import SearchIndex, _parquet_files

        with open(os.path.join(out_dir, "meta.json")) as f:
            self.meta = json.load(f)
        shard_dir = os.path.join(out_dir, "shards", f"shard={shard_id}")
        files = _parquet_files(shard_dir)
        # reuse the lazy-decode reader over just this shard's rows.
        # Doc lengths live IN the postings (dl_blob), so the actor
        # loads nothing but its own shard — peak memory is exactly
        # 1/num_shards of the index (asserted by tests/test_serve.py).
        import pyarrow as pa

        table = (
            pa.concat_tables([pq.read_table(f) for f in files]).combine_chunks()
            if files
            else None
        )
        self.idx = SearchIndex(self.meta, table, os.path.join(out_dir, "docstore"))

    def loaded_bytes(self) -> int:
        """Arrow bytes resident for this shard (memory-scaling probe)."""
        return int(self.idx._shards.nbytes) if self.idx._shards is not None else 0

    def partial_scores(self, terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Per-doc partial BM25 sums over OWNED terms, in the given term
        order (the router relies on this order for bit-identical float
        association). Returns (doc_ids, partial_scores)."""
        all_ids, all_scores = [], []
        for t in terms:
            if not self.idx.has_term(t):
                continue
            p = self.idx.postings(t)
            all_ids.append(p.ids)
            all_scores.append(
                self.idx.bm25_idf(p.df)
                * self.idx._bm25_tf_part(p.tfs.astype(np.float64), p.dls.astype(np.float64))
            )
        if not all_ids:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        return np.concatenate(all_ids), np.concatenate(all_scores)

    def term_dfs(self, terms: list[str]) -> dict:
        """df for the OWNED terms among ``terms`` — shard-row metadata
        only, no posting decode (format 4). The segmented router's
        first round-trip (global df = sum over segments)."""
        return {t: self.idx.term_df(t) for t in terms if self.idx.has_term(t)}

    def partial_scores_global(
        self,
        terms: list[str],
        n_global: int,
        avgdl_global: float,
        dfs: dict,
    ) -> list:
        """PER-TERM (doc_ids, scores) pairs with GLOBAL statistics —
        the segmented serving kernel, ONE RPC per (segment, shard) for
        however many query terms the shard owns. Returning per-term
        arrays (None for unowned terms) lets the router reassemble the
        concatenation in QUERY-TERM order across shards — the float
        association that makes results bit-identical to
        ``SegmentedIndex`` / ``SearchIndex.bm25_topk_global``."""
        import math

        k1, b = self.idx.k1, self.idx.b
        out = []
        for t in terms:
            if not self.idx.has_term(t):
                out.append(None)
                continue
            p = self.idx.postings(t)
            df = dfs.get(t, p.df)
            idf = math.log(1.0 + (n_global - df + 0.5) / (df + 0.5))
            tfs = p.tfs.astype(np.float64)
            dls = p.dls.astype(np.float64)
            part = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl_global))
            out.append((p.ids, idf * part))
        return out


class DistributedSearch:
    """Scatter-gather router over the shard actor pool.

    ``shared=True`` resolves the pool as NAMED actors
    (``get_if_exists``): N stateless router replicas — the measured
    horizontal serving scale-out, BASELINE.md serving section — attach
    to ONE actor pool instead of each loading its own copy of the
    index (memory x replicas otherwise). The first router creates the
    actors; later ones reuse them; ``shutdown()`` then leaves the
    shared pool running for the other replicas (kill the named actors
    explicitly to tear down)."""

    def __init__(self, out_dir: str, *, shared: bool = False):
        self.out_dir = out_dir
        self.shared = shared
        self.segmented = os.path.exists(os.path.join(out_dir, "segments.json"))
        if self.segmented:
            self._init_segmented(out_dir, shared)
            return
        with open(os.path.join(out_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.num_shards = self.meta["num_shards"]
        if shared:
            import hashlib as _hl

            # the pool name carries an INDEX-GENERATION token (meta.json
            # mtime+size) alongside the path: shard actors load postings
            # in __init__, so a router attaching by path alone after a
            # rebuild/compaction at the same path would silently serve
            # the OLD index from the still-alive detached actors. A new
            # generation therefore resolves to a fresh actor name (the
            # stale pool stays up until explicitly killed — teardown
            # remains an explicit operation, as documented).
            st = os.stat(os.path.join(out_dir, "meta.json"))
            gen = f"{st.st_mtime_ns}_{st.st_size}"
            tag = _hl.md5(
                f"{os.path.abspath(out_dir)}|{gen}".encode()
            ).hexdigest()[:10]
            self.actors = [
                ShardActor.options(
                    name=f"wse_shard_{tag}_{s}",
                    get_if_exists=True,
                    # detached: the pool's lifetime is independent of any
                    # one router's handles (name-resolved handles don't
                    # hold lineage refs); teardown is an explicit kill
                    lifetime="detached",
                ).remote(out_dir, s)
                for s in range(self.num_shards)
            ]
        else:
            self.actors = [
                ShardActor.remote(out_dir, s) for s in range(self.num_shards)
            ]
        self._docstore = None

    @property
    def N(self) -> int | None:
        """Corpus N (plain meta or segmented manifest) — also feeds the
        /stats endpoint's ``n_docs``."""
        return self.meta.get("N")

    @property
    def avgdl(self) -> float:
        return float(self.meta.get("avgdl") or 1.0)

    def _init_segmented(self, out_dir: str, shared: bool) -> None:
        """Shard-actor tier over a SEGMENTED index (the steady-state
        O(delta)-update layout, `pipelines/segments.py`): one actor per
        (segment, shard) — exactly the '(segment x shard) actors, one
        exact merge' composition the SegmentedIndex docstring names.
        Per query: one metadata round-trip sums global df across
        segments, then per-(segment, term) scoring futures with GLOBAL
        stats; the router accumulates per segment in query-term order
        and merges exactly — bit-identical to the in-process
        `SegmentedIndex` (asserted by tests)."""
        with open(os.path.join(out_dir, "segments.json")) as f:
            man = json.load(f)
        self.manifest = man
        self.meta = {**man, "segmented": True}
        self.seg_names = list(man["segments"])
        self.seg_actors: list[list] = []
        self.seg_num_shards: list[int] = []
        tag = None
        if shared:
            import hashlib as _hl

            st = os.stat(os.path.join(out_dir, "segments.json"))
            gen = f"{st.st_mtime_ns}_{st.st_size}"
            tag = _hl.md5(f"{os.path.abspath(out_dir)}|{gen}".encode()).hexdigest()[:10]
        for name in self.seg_names:
            seg_dir = os.path.join(out_dir, name)
            with open(os.path.join(seg_dir, "meta.json")) as f:
                ns = json.load(f)["num_shards"]
            self.seg_num_shards.append(ns)
            if shared:
                actors = [
                    ShardActor.options(
                        name=f"wse_seg_{tag}_{name}_{s}",
                        get_if_exists=True,
                        lifetime="detached",
                    ).remote(seg_dir, s)
                    for s in range(ns)
                ]
            else:
                actors = [ShardActor.remote(seg_dir, s) for s in range(ns)]
            self.seg_actors.append(actors)
        self.actors = [a for seg in self.seg_actors for a in seg]  # for shutdown
        self._docstores = None

    def _bm25_topk_segmented(self, query: str, k: int) -> list[tuple[int, float]]:
        from .query import _topk

        uniq_terms = list(dict.fromkeys(tokenize_query(query)))
        if not uniq_terms:
            return []
        # RT1: global df — router-side cache (df is immutable for a
        # pool's index generation), misses grouped into one metadata
        # future per touched (segment, shard)
        cache = getattr(self, "_df_cache", None)
        if cache is None:
            cache = self._df_cache = {}
        missing = [t for t in uniq_terms if t not in cache]
        if missing:
            df_futs = []
            for gi, actors in enumerate(self.seg_actors):
                by_shard: dict[int, list[str]] = {}
                for t in missing:
                    by_shard.setdefault(hash64(t) % self.seg_num_shards[gi], []).append(t)
                for s, ts in by_shard.items():
                    df_futs.append(actors[s].term_dfs.remote(ts))
            fresh: dict[str, int] = {t: 0 for t in missing}
            for d in ray.get(df_futs):
                for t, df in d.items():
                    fresh[t] += df
            cache.update(fresh)
        dfg = {t: cache[t] for t in uniq_terms if cache[t] > 0}
        q_terms = [t for t in tokenize_query(query) if dfg.get(t, 0) > 0]
        if not q_terms:
            return []
        # RT2: ONE scoring future per touched (segment, shard) carrying
        # that shard's term sublist; shards return PER-TERM arrays, so
        # the router reassembles each segment's concatenation in
        # query-term order — SegmentedIndex's float association exactly
        cands: list[tuple[int, float]] = []
        seg_futs = []
        for gi, actors in enumerate(self.seg_actors):
            by_shard: dict[int, list[str]] = {}
            for t in q_terms:
                by_shard.setdefault(hash64(t) % self.seg_num_shards[gi], []).append(t)
            futs = {
                s: actors[s].partial_scores_global.remote(ts, self.N, self.avgdl, dfg)
                for s, ts in by_shard.items()
            }
            seg_futs.append((by_shard, futs))
        for by_shard, futs in seg_futs:
            got = {s: r for s, r in zip(futs, ray.get(list(futs.values())))}
            per_term: dict[str, tuple] = {}
            for s, ts in by_shard.items():
                for t, pair in zip(ts, got[s]):
                    if pair is not None:
                        per_term[t] = pair
            ids = [per_term[t][0] for t in q_terms if t in per_term]
            scores = [per_term[t][1] for t in q_terms if t in per_term]
            if not ids:
                continue
            all_ids = np.concatenate(ids)
            all_scores = np.concatenate(scores)
            uniq, inv = np.unique(all_ids, return_inverse=True)
            acc = np.zeros(uniq.size, dtype=np.float64)
            np.add.at(acc, inv, all_scores)
            cands.extend(_topk(uniq, acc, k))
        cands.sort(key=lambda t: (-t[1], t[0]))
        return cands[:k]

    def bm25_topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        from .query import _topk

        if self.segmented:
            return self._bm25_topk_segmented(query, k)
        q_terms = tokenize_query(query)
        if not q_terms:
            return []
        # route each term to its one owning shard (hash-partitioned,
        # replacing the reference's per-term KVS getRow round-trip);
        # one future PER TERM so contributions concatenate in query-term
        # order — the same float association as the in-process scorer
        futs = [
            self.actors[hash64(t) % self.num_shards].partial_scores.remote([t])
            for t in q_terms
        ]
        parts = ray.get(futs)
        ids = [p[0] for p in parts if p[0].size]
        scores = [p[1] for p in parts if p[0].size]
        if not ids:
            return []
        # identical accumulation to the exhaustive scorer: per-posting
        # contributions summed per doc via one np.add.at
        all_ids = np.concatenate(ids)
        all_scores = np.concatenate(scores)
        uniq, inv = np.unique(all_ids, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(acc, inv, all_scores)
        return _topk(uniq, acc, k)

    def _fetch_docs(self, doc_ids: list[int]) -> dict[int, dict]:
        from .query import DocStore

        if not self.segmented:
            if self._docstore is None:
                self._docstore = DocStore(os.path.join(self.out_dir, "docstore"))
            return self._docstore.lookup(doc_ids)
        # segments hold disjoint docs: probe stores in order, each id
        # resolves in exactly one (same rule as SegmentedIndex)
        if self._docstores is None:
            self._docstores = [
                DocStore(os.path.join(self.out_dir, n, "docstore"))
                for n in self.seg_names
            ]
        out: dict[int, dict] = {}
        want = list(doc_ids)
        for ds in self._docstores:
            if not want:
                break
            out.update(ds.lookup(want))
            want = [d for d in want if d not in out]
        return out

    def search(self, query: str, k: int = 10) -> list[dict]:
        """Top-k with url/title/body assembled from the doc store —
        the reference's JSON result shape (``Searcher.java:186-195``)."""
        ranked = self.bm25_topk(query, k)
        rows = self._fetch_docs([d for d, _ in ranked])
        return [
            {
                "url": rows[d]["url"],
                "rank_score": s,
                "title": rows[d]["title"],
                "body": rows[d]["body"],
            }
            for d, s in ranked
        ]

    def shutdown(self) -> None:
        if not self.shared:  # a shared pool outlives any one router
            for a in self.actors:
                ray.kill(a)
        self.actors = []


def render_snippet(body: str, query: str, width: int = 12) -> str:
    """Query-biased snippet text for one RESULT row: the ``width``-token
    window of the body covering the most DISTINCT query terms (tie ->
    leftmost, windows start at a query-term hit — the same rule as
    ``SearchIndex.snippet_window``); falls back to the leading window
    when no query term occurs. O(doc_len) on the already-fetched body —
    no extra index or store access."""
    toks = tokenize(body)
    if not toks:
        return ""
    q_terms = set(tokenize_query(query))
    starts = [i for i, w in enumerate(toks) if w in q_terms]
    if not starts:
        return " ".join(toks[:width])
    best_s, best_n = starts[0], -1
    for s in starts:
        n = len({w for w in toks[s : s + width] if w in q_terms})
        if n > best_n:
            best_s, best_n = s, n
    return " ".join(toks[best_s : best_s + width])


class SearchHTTPServer:
    """The reference's user-facing API: ``GET /search?query=...`` ->
    JSON ``[{url, rank_score, title, body}]`` with a CORS header
    (``search/Searcher.java:30-37`` route registration, ``:186-207``
    JSON assembly + ``Access-Control-Allow-Origin: *`` — consumed by
    ``frontEnd/search_engine/src/router/fetcher.js:3-9``).

    Backed by any object with ``search(query, k) -> list[dict]``
    (``DistributedSearch`` for the shard-actor tier, ``SearchIndex``
    for single-process serving — the reference's deployment shape).
    Binds an ephemeral port when ``port=0``; ``start()`` serves on a
    daemon thread, ``shutdown()`` stops it.

    Extensions over the reference contract: a bounded LRU response
    cache keyed by (query, k, snippet) — the reference re-scans its
    whole ``urls`` table on EVERY request with no reuse at all
    (``Searcher.java:44-57``, the dominant per-query cost) — and a
    ``GET /stats`` ops endpoint (index N/avgdl + cache counters).
    """

    def __init__(
        self,
        backend,
        *,
        host: str = "127.0.0.1",
        port: int = 8080,
        cache_size: int = 256,
        reuse_port: bool = False,
    ):
        import threading
        from collections import OrderedDict
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
        from urllib.parse import parse_qs, urlsplit

        outer = self
        self.cache_size = cache_size
        self._cache: OrderedDict = OrderedDict()
        self._cache_lock = threading.Lock()
        self.cache_hits = 0
        self.cache_misses = 0

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test runs
                pass

            def _reply(self, code: int, payload) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                # the reference sets CORS wide open for its React front
                # end (Searcher.java:204-205)
                self.send_header("Access-Control-Allow-Origin", "*")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:
                u = urlsplit(self.path)
                if u.path == "/stats":
                    with outer._cache_lock:
                        self._reply(
                            200,
                            {
                                "n_docs": getattr(backend, "N", None),
                                "avgdl": getattr(backend, "avgdl", None),
                                "cache_hits": outer.cache_hits,
                                "cache_misses": outer.cache_misses,
                                "cache_entries": len(outer._cache),
                            },
                        )
                    return
                if u.path not in ("/search", "/facets", "/explain"):
                    self._reply(404, {"error": "not found"})
                    return
                q = parse_qs(u.query)
                query = (q.get("query") or [""])[0]
                if not query:
                    # Searcher.java:38 null-query guard
                    self._reply(400, {"error": "missing query"})
                    return
                if u.path == "/explain":
                    # per-(doc, matched term) BM25 contribution rows for
                    # the top results (SearchIndex.explain_topk); 501
                    # for backends without the method
                    if not hasattr(backend, "explain_topk"):
                        self._reply(501, {"error": "backend has no explain"})
                        return
                    self._reply(200, backend.explain_topk(query, k=3))
                    return
                if u.path == "/facets":
                    # result-refinement sidebar counts over the top-50
                    # candidate prefix (SearchIndex.bm25_facets); 501
                    # for backends without a facet method
                    if not hasattr(backend, "bm25_facets"):
                        self._reply(501, {"error": "backend has no facets"})
                        return
                    self._reply(
                        200,
                        [
                            {"facet": f, "value": v, "n_docs": n}
                            for f, v, n in backend.bm25_facets(query)
                        ],
                    )
                    return
                try:
                    k = int((q.get("k") or ["10"])[0])
                    # &start=N: result-page offset (the reference serves
                    # its full top-300 in one response and pages client-
                    # side, Searcher.java:196-198 / Results.jsx:43-47;
                    # this tier pages server-side: fetch start+k, slice)
                    start = int((q.get("start") or ["0"])[0])
                except ValueError:
                    self._reply(400, {"error": "bad k"})
                    return
                if k < 0 or start < 0:
                    self._reply(400, {"error": "bad k"})
                    return
                want_snippet = (q.get("snippet") or ["0"])[0] == "1"
                # &fuzzy=1: did-you-mean OOV rewrite before scoring
                # (501 for backends without correct_query)
                if (q.get("fuzzy") or ["0"])[0] == "1":
                    if not hasattr(backend, "correct_query"):
                        self._reply(501, {"error": "backend has no fuzzy"})
                        return
                    query = backend.correct_query(query)
                # &ql=1: operator-query mode ("phrase" -minus site:host)
                # dispatched by SearchIndex.query_language; results are
                # doc-store-assembled like the plain route (501 for
                # backends without the parser). fuzzy=1 composes with
                # neither the operator syntax (the rewriter would strip
                # '-'/quotes/site: and score excluded terms) — reject
                # the combination explicitly rather than corrupt it
                want_ql = (q.get("ql") or ["0"])[0] == "1"
                if want_ql and (q.get("fuzzy") or ["0"])[0] == "1":
                    self._reply(400, {"error": "fuzzy and ql are exclusive"})
                    return
                if want_ql and not hasattr(backend, "query_language"):
                    self._reply(501, {"error": "backend has no query language"})
                    return
                # &rank=fields: multi-field BM25F over the built title/
                # anchor field indexes (round-5; 501 for backends
                # without them); default rank is plain body BM25
                rank = (q.get("rank") or ["bm25"])[0]
                if rank not in ("bm25", "fields"):
                    self._reply(400, {"error": "bad rank"})
                    return
                if rank == "fields":
                    if want_ql:
                        self._reply(400, {"error": "rank=fields and ql are exclusive"})
                        return
                    if not hasattr(backend, "search_fields"):
                        self._reply(501, {"error": "backend has no field ranking"})
                        return
                key = (query, k, start, want_snippet, want_ql, rank)
                with outer._cache_lock:
                    cached = outer._cache.get(key)
                    if cached is not None:
                        outer._cache.move_to_end(key)
                        outer.cache_hits += 1
                if cached is not None:
                    self._reply(200, cached)
                    return
                if want_ql:
                    ranked = backend.query_language(query, start + k)[start:]
                    fetched = backend.fetch_docs([d for d, _ in ranked])
                    rows = [
                        {
                            "url": fetched[d]["url"],
                            "rank_score": s,
                            "title": fetched[d]["title"],
                            "body": fetched[d]["body"],
                        }
                        for d, s in ranked
                    ]
                elif rank == "fields":
                    rows = backend.search_fields(query, start + k)[start:]
                else:
                    rows = backend.search(query, start + k)[start:]
                # exact reference JSON shape (Searcher.java:186-195);
                # &snippet=1 appends a query-biased snippet field (an
                # opt-in extension — the bare contract is unchanged)
                out = [
                    {f: r[f] for f in ("url", "rank_score", "title", "body")}
                    for r in rows
                ]
                if want_snippet:
                    # in ql mode, bias snippets by the PARSED positive
                    # terms only — never by excluded terms or operator
                    # tokens like site:host
                    if want_ql:
                        from ..functions.queryparse import parse_query

                        p = parse_query(query)
                        snip_q = " ".join(p.terms + p.phrases)
                    else:
                        snip_q = query
                    for o in out:
                        o["snippet"] = render_snippet(o["body"], snip_q)
                with outer._cache_lock:
                    outer.cache_misses += 1
                    outer._cache[key] = out
                    while len(outer._cache) > outer.cache_size:
                        outer._cache.popitem(last=False)
                self._reply(200, out)

        if reuse_port:
            # SO_REUSEPORT single-endpoint scale-out: N router PROCESSES
            # (each its own GIL) bind the SAME port and the kernel
            # load-balances accepted connections across them — one
            # endpoint, no user-space proxy hop. Routers share the
            # named shard-actor pool (DistributedSearch shared=True), so
            # index memory stays 1x. Requires an explicit port.
            if port == 0:
                raise ValueError("reuse_port requires an explicit port")

            class ReusePortServer(ThreadingHTTPServer):
                allow_reuse_port = True

            self.httpd = ReusePortServer((host, port), Handler)
        else:
            self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_port
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)

    def start(self) -> "SearchHTTPServer":
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
