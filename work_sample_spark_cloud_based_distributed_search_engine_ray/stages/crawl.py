"""Crawl-side batch stages: link extraction, URL filtering, content
gating — the reference crawler's per-page transforms re-expressed as
Ray Data ``map_batches`` stages over the pages corpus.

The reference fetches live (``crawler/Crawler.java:99-166``); this tier
ingests pre-crawled Parquet (BASELINE.json input_hint), so what remains
of the crawler is its pure per-page logic:

- link extraction (``Crawler.java:405-436``) -> ``extract_links``
  emitting one (src_url, dst_url) edge per normalized crawlable link —
  the link-graph builder a PageRank job would consume;
- URL frontier filter (``Crawler.java:440-449``) -> ``is_crawlable``;
- content-type/lang gate (``Crawler.java:174``) -> ``lang_gate``.

``LinkExtractStage`` is a callable CLASS for actor-pool ``map_batches``
(regexes compile once per actor in ``__init__`` — the stateful-stage
pattern; reference analog: the per-JVM robots cache,
``Crawler.java:27``).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.urls import extract_hrefs, is_crawlable, normalize_url


class LinkExtractStage:
    """pages batch -> link edges (src_url, dst_url), normalized +
    frontier-filtered + per-page deduped."""

    def __init__(self, drop_self_links: bool = True):
        self.drop_self_links = drop_self_links

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        src: list[str] = []
        dst: list[str] = []
        for u, h in zip(urls, htmls):
            doc = h.decode("utf-8", "replace") if isinstance(h, (bytes, bytearray)) else h
            seen: set[str] = set()
            for href in extract_hrefs(doc):
                n = normalize_url(u, href)
                if n is None or not is_crawlable(n) or n in seen:
                    continue
                if self.drop_self_links and n == u:
                    continue
                seen.add(n)
                src.append(u)
                dst.append(n)
        return pa.table(
            {"src_url": pa.array(src, pa.string()), "dst_url": pa.array(dst, pa.string())}
        )


class AnchorTermsStage:
    """pages batch -> partially aggregated (dst_url, term, n) inbound
    anchor-text term counts.

    Every ``<a href>`` element contributes its inner text's canonical
    tokens to the TARGET page (no per-page dedup — a page linking twice
    endorses twice). Tokenization is the one batch kernel
    (``tokenize_count_batch``) and each output batch is pre-combined by
    (dst, term), so the downstream groupby shuffles counts, not tokens
    (map-side combine — the 100-TB discipline)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import tokenize_count_batch
        from ..functions.urls import extract_anchor_texts

        empty = pa.table(
            {
                "dst_url": pa.array([], pa.string()),
                "term": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        dsts: list[str] = []
        texts: list[str] = []
        for u, h in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            doc = h.decode("utf-8", "replace") if isinstance(h, (bytes, bytearray)) else h
            for href, text in extract_anchor_texts(doc):
                n = normalize_url(u, href)
                if n is None or not is_crawlable(n):
                    continue
                dsts.append(n)
                texts.append(text)
        if not texts:
            return empty
        terms_list, tfs_list, _lens = tokenize_count_batch(texts)
        parents = pc.list_parent_indices(terms_list)
        flat = pa.table(
            {
                "dst_url": pc.take(pa.array(dsts, pa.string()), parents),
                "term": terms_list.flatten(),
                "n": tfs_list.flatten().cast(pa.int64()),
            }
        )
        if flat.num_rows == 0:
            return empty
        agg = flat.group_by(["dst_url", "term"]).aggregate([("n", "sum")])
        return pa.table(
            {"dst_url": agg["dst_url"], "term": agg["term"], "n": agg["n_sum"]}
        )


def _top_anchor_of_bucket(t: pa.Table) -> pa.Table:
    """One dst-url BUCKET of partial (dst, term, n) counts -> top-1 term
    per dst: one group_by sum + one multi-key sort + run detection —
    never a per-dst Python call."""
    import numpy as np

    t = t.drop_columns(["__bucket"])
    agg = t.group_by(["dst_url", "term"]).aggregate([("n", "sum")])
    taken = agg.take(
        pc.sort_indices(
            agg,
            sort_keys=[
                ("dst_url", "ascending"),
                ("n_sum", "descending"),
                ("term", "ascending"),
            ],
        )
    )
    g = (
        taken["dst_url"]
        .combine_chunks()
        .dictionary_encode()
        .indices.to_numpy(zero_copy_only=False)
    )
    first = np.ones(len(g), dtype=bool)
    first[1:] = g[1:] != g[:-1]
    out = taken.filter(pa.array(first))
    return pa.table(
        {
            "dst_url": out["dst_url"],
            "top_term": out["term"],
            "top_n": out["n_sum"].cast(pa.int64()),
        }
    )


def anchor_top_terms(pages_ds: "rd.Dataset", num_buckets: int = 64) -> "rd.Dataset":
    """Per target page: the dominant inbound anchor-text term —
    (dst_url, top_term, top_n), ties broken by lexicographic term.

    Physical plan: actor-pool extraction with map-side (dst, term)
    combine, then ONE hash shuffle on a BOUNDED dst-url bucket whose
    per-bucket kernel finishes the sum and the top-1 vectorized. No
    stage holds more than a bucket of the (dst, term) space, and the
    shuffle carries pre-combined counts, not tokens."""
    from .ops import _bucket_of
    from .shuffle import hash_map_groups

    rows = pages_ds.map_batches(
        AnchorTermsStage, batch_format="pyarrow", concurrency=(1, 8)
    )
    rows = rows.map_batches(
        lambda t: t.append_column("__bucket", _bucket_of(t["dst_url"], num_buckets)),
        batch_format="pyarrow",
    )
    return hash_map_groups(rows, "__bucket", _top_anchor_of_bucket)


def inbound_anchor_query_terms(
    pages_path: str, vocab: set[str], num_buckets: int = 64
) -> "rd.Dataset":
    """DISTINCT ``(doc_id, term)`` inbound anchor-text endorsements,
    restricted to the bounded term set ``vocab`` (in practice the query
    vocabulary), for the anchor-field ranking boost
    (``SearchIndex.bm25_anchor_boost``).

    Two streaming passes over the pages parquet:

    1. anchor extraction (the ``AnchorTermsStage`` actor pool) -> a
       vectorized ``is_in`` vocab gate -> a bucketed ``distinct_on``
       over (dst_url, term). The gate means the distinct set is
       ~|anchors naming a vocab term|, never the full (dst, term)
       space.
    2. the collected pair map (bounded by the vocab restriction) is
       broadcast once via ``ray.put`` against a pruned url-only read of
       the same parquet, resolving each normalized target back to its
       page's ``doc_id = hash64(raw url)`` — the engine's url->doc_id
       rule. Membership is one ``is_in`` per batch; only matching urls
       pay a Python expansion.

    Contract notes (mirrored by the SQL twin): endorsements aimed at
    urls that are not corpus pages resolve to no doc and drop out;
    targets that are dedup LOSERS resolve to doc_ids absent from every
    posting list and are harmless downstream — anchor endorsement is
    per-URL, not per-content. At full corpus scale the same semantics
    come from promoting anchors to an index FIELD (anchor postings
    built by the term shuffle alongside format 2/3); this is the
    bounded serving-tier form.
    """
    import ray
    import ray.data as rd

    from ..functions.hashing import hash64
    from ..functions.urls import normalize_seed
    from .ops import distinct_on

    vocab_arr = pa.array(sorted(vocab), pa.string())

    def vocab_gate(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["term"], value_set=vocab_arr)).select(
            ["dst_url", "term"]
        )

    pages = rd.read_parquet(pages_path, columns=["url", "html"])
    rows = pages.map_batches(
        AnchorTermsStage, batch_format="pyarrow", concurrency=(1, 8)
    )
    pairs = distinct_on(
        rows.map_batches(vocab_gate, batch_format="pyarrow"),
        ["dst_url", "term"],
        num_buckets=num_buckets,
    )
    amap: dict[str, list[str]] = {}
    for blk in ray.get(pairs.to_arrow_refs()):
        for u, t in zip(blk["dst_url"].to_pylist(), blk["term"].to_pylist()):
            amap.setdefault(u, []).append(t)
    key_arr = pa.array(sorted(amap), pa.string())
    map_ref = ray.put(amap)

    def resolve(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        urls = batch["url"].to_pylist()
        norm = [normalize_seed(u) or "" for u in urls]
        hit = pc.is_in(pa.array(norm, pa.string()), value_set=key_arr).to_pylist()
        out_ids: list[int] = []
        out_terms: list[str] = []
        for u, n, h in zip(urls, norm, hit):
            if not h:
                continue
            did = hash64(u)
            for term in m[n]:
                out_ids.append(did)
                out_terms.append(term)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "term": pa.array(out_terms, pa.string()),
            }
        )

    urls_ds = rd.read_parquet(pages_path, columns=["url"])
    return urls_ds.map_batches(resolve, batch_format="pyarrow")


def lang_gate(langs: list[str]):
    """Content gate: keep pages whose ``lang`` is in the allow list
    (replaces the crawler's content-type gate, ``Crawler.java:174``)."""
    allow = pa.array(langs, pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["lang"], value_set=allow))

    return fn


def frontier_bfs(
    edges: "rd.Dataset",
    seeds: list[str],
    *,
    max_depth: int = 3,
    plan: str = "auto",
    num_buckets: "int | None" = None,
    dump_dir: "str | None" = None,
) -> pa.Table:
    """Frontier-wave BFS over a link-edge table — the Ray-native analog
    of the reference crawler's loop (``urlQueue = parallelize([seed]);
    while (count != 0) urlQueue = urlQueue.flatMap(crawlOne)``,
    ``crawler/Crawler.java:47-213``): each wave expands the current
    frontier through the edges and drops already-visited urls (the
    ``contentSeen``/frontier-dedup role).

    The frontier is BROADCAST per wave (``ray.put`` once, read by every
    map task) and the expansion is a vectorized ``is_in`` filter + local
    dedup — a frontier is tiny relative to the edge set, so this is
    the broadcast side of the join, not a shuffle. Returns (url, depth) for
    every reached url, depth = first-reach wave (seeds get depth 0);
    deterministic regardless of partitioning.

    Cumulative ``visited`` state: a driver dict below
    ``graph.graph_bucketed_limit()`` estimated reach; above it (or with
    ``plan="bucketed"`` / env ``WSE_GRAPH_PLAN``) ``visited`` lives in
    ``num_buckets`` hash-bucket ``graph.VisitedShard`` ACTORS — the
    driver holds only the current wave's frontier (wave-bounded by
    construction), and the (url, depth) output is DUMPED as per-shard
    parquet files (each actor writes its own bucket to ``dump_dir``,
    atomic tmp+rename; the API table is read back from the dump — a
    corpus-scale consumer reads the directory as a Dataset instead).
    Identical output to the driver-dict plan (asserted by
    tests/test_graph_bucketed.py).
    """
    import ray

    from .graph import resolve_plan

    # pin the edge blocks in the object store ONCE: the wave loop
    # re-reads them every iteration, and without this each wave would
    # re-execute the whole upstream plan (e.g. link extraction)
    edges = edges.materialize()
    # reach is bounded by the node count, estimated by the edge count
    if resolve_plan(plan, edges.count()) == "bucketed":
        import tempfile

        import pyarrow.parquet as pq

        shards = _bfs_bucketed_shards(
            edges, seeds, max_depth=max_depth, num_buckets=num_buckets
        )
        # per-shard parquet dump: EACH VisitedShard actor writes its own
        # bucket file (round-4 verdict #5) — the reach set never
        # assembles on the driver; the returned API table is read back
        # from the dump (at corpus scale a consumer reads the directory
        # as a Dataset instead and this bounded assembly never happens)
        out = dump_dir or tempfile.mkdtemp(prefix="wse_bfs_dump_")
        os.makedirs(out, exist_ok=True)
        n_rows = ray.get(
            [
                s.dump_parquet.remote(os.path.join(out, f"part-{i:05d}.parquet"))
                for i, s in enumerate(shards)
            ]
        )
        assert len(n_rows) == len(shards)
        return pq.read_table(out, columns=["url", "depth"]).sort_by("url")
    visited: dict[str, int] = {u: 0 for u in seeds}
    frontier = sorted(set(seeds))
    for depth in range(1, max_depth + 1):
        if not frontier:
            break
        f_ref = ray.put(pa.array(frontier, pa.string()))

        def expand(batch: pa.Table) -> pa.Table:
            fr = ray.get(f_ref)
            hit = batch.filter(pc.is_in(batch["src_url"], value_set=fr))
            return hit.select(["dst_url"]).group_by("dst_url").aggregate([])

        reached = set()
        for b in (
            edges.map_batches(expand, batch_format="pyarrow", batch_size=None)
            .to_arrow_refs()
        ):
            reached.update(ray.get(b)["dst_url"].to_pylist())
        frontier = sorted(u for u in reached if u not in visited)
        for u in frontier:
            visited[u] = depth
    urls = sorted(visited)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "depth": pa.array([visited[u] for u in urls], pa.int64()),
        }
    )


def _bfs_bucketed_shards(
    edges_mat, seeds: list[str], *, max_depth: int, num_buckets: "int | None" = None
):
    """The bucketed BFS wave loop, returning the ``VisitedShard`` actor
    handles (bucket-sharded (url, first-reach depth) state). Shared by
    ``frontier_bfs`` (which dumps the shards into the API table) and
    reach-COUNT consumers like the bow-tie decomposition, which do
    per-bucket set algebra on the shards and never assemble a global
    reach set anywhere. ``edges_mat`` must already be materialized."""
    import ray

    from ..functions.hashing import hash64_array
    from .graph import VisitedShard, default_buckets

    num_buckets = default_buckets(num_buckets)
    shards = [VisitedShard.remote() for _ in range(num_buckets)]

    @ray.remote
    def route_block(block, depth: int, *shard_handles):
        """Bucket one expansion block's candidate urls and probe the
        visited shards — the pre-dedup reached set never crosses the
        driver; only the (wave-bounded, deduped) new frontier does."""
        t = pa.Table.from_batches([block]) if isinstance(block, pa.RecordBatch) else block
        urls = t["dst_url"].to_pylist()
        if not urls:
            return []
        buck = hash64_array(urls) % len(shard_handles)
        per = [[] for _ in shard_handles]
        for u, b in zip(urls, buck):
            per[int(b)].append(u)
        outs = ray.get(
            [
                shard_handles[b].add_new.remote(per[b], depth)
                for b in range(len(shard_handles))
                if per[b]
            ]
        )
        return [u for o in outs for u in o]

    def route_new(urls: list, depth: int) -> list:
        if not urls:
            return []
        buck = hash64_array(urls) % num_buckets
        per = [[] for _ in range(num_buckets)]
        for u, b in zip(urls, buck):
            per[int(b)].append(u)
        outs = ray.get(
            [
                shards[b].add_new.remote(per[b], depth)
                for b in range(num_buckets)
                if per[b]
            ]
        )
        return sorted(u for o in outs for u in o)

    frontier = route_new(sorted(set(seeds)), 0)
    for depth in range(1, max_depth + 1):
        if not frontier:
            break
        f_ref = ray.put(pa.array(frontier, pa.string()))

        def expand(batch: pa.Table) -> pa.Table:
            fr = ray.get(f_ref)
            hit = batch.filter(pc.is_in(batch["src_url"], value_set=fr))
            return hit.select(["dst_url"]).group_by("dst_url").aggregate([])

        block_refs = edges_mat.map_batches(
            expand, batch_format="pyarrow", batch_size=None
        ).to_arrow_refs()
        # per-block routing tasks call the shard actors directly; within
        # a wave all new urls get the same depth, so cross-block arrival
        # order cannot change the result
        outs = ray.get([route_block.remote(b, depth, *shards) for b in block_refs])
        frontier = sorted({u for o in outs for u in o})
    return shards


def frontier_reach_shards(
    edges: "rd.Dataset", seeds: list[str], *, max_depth: int = 3, num_buckets: "int | None" = None
):
    """Public shard-returning BFS (always the bucketed plan): the
    reach set stays bucket-sharded in actors for set-algebra consumers
    (bow-tie CORE/IN/OUT counts)."""
    return _bfs_bucketed_shards(
        edges.materialize(), seeds, max_depth=max_depth, num_buckets=num_buckets
    )


def pagerank(
    edges: "rd.Dataset",
    node_urls: list[str],
    *,
    damping: float = 0.85,
    iters: int = 10,
    teleport_urls: "list[str] | None" = None,
    plan: str = "auto",
    num_buckets: "int | None" = None,
) -> pa.Table:
    """Iterative PageRank over a link-edge table — the consumer of the
    link graph the reference left vestigial (``search/Searcher.java:
    48,155`` keeps a commented-out rank multiplier with no job that
    ever computes it; this fills that hole with standard damped
    PageRank, dangling mass redistributed uniformly).

    Semantics (matched exactly by the SQL oracle and the numpy golden):
    nodes = the crawled page urls; edges restricted to endpoints in the
    node set; ``deg`` = restricted out-degree; r_0 = 1/n;
    r_{k+1}(v) = (1-d)/n + d * (sum_{u->v} r_k(u)/deg(u) + dangling_k/n)
    where dangling_k = sum of r_k over zero-out-degree nodes.

    Physical plan (the broadcast-join variant the verdict prescribed):
    the edge set is integer-encoded and PREPPED ONCE per block (src
    node positions + dst ``np.unique`` inverse, held in the object
    store); per iteration the rank/out-degree vector is BROADCAST
    (``ray.put`` once, read per task) and one Ray task per edge block
    returns its node-bounded per-dst partial sums, which the driver
    adds into the dense rank vector. Partial sums move at most
    #distinct-dst-per-block rows, never raw edges — the same map-side
    combine a groupby(dst).aggregate(Sum) would do, without paying a
    Dataset hash-shuffle spin-up per iteration (measured 10x the
    useful work at small scale). The rank vector and the per-block
    partials are node-count-bounded driver/worker state: fine up to
    ~10^8 nodes per the repo's broadcast-vs-shuffle convention
    (``build_index.DRIVER_DEDUP_LIMIT``). Above
    ``graph.graph_bucketed_limit()`` nodes (or with ``plan="bucketed"``
    / env ``WSE_GRAPH_PLAN``) the job cuts over to
    ``stages.graph.pagerank_bucketed``: vertex state hash-bucketed into
    ``num_buckets`` object-store shards, edges co-partitioned by src
    bucket once, each iteration one bucket-to-bucket partial-sum
    exchange — no O(V) driver or broadcast state anywhere (ranks agree
    to float64 roundoff; the registered rank_e9 contract is identical,
    see tests/test_graph_bucketed.py).

    Returns (url, rank) sorted by url; ranks sum to 1 (mass conserved).

    ``teleport_urls`` generalizes to PERSONALIZED PageRank (the
    related-pages / TrustRank primitive): teleport and dangling mass
    go to the seed set uniformly instead of all nodes —
    r_{k+1}(v) = (1-d)*t(v) + d*(sum_{u->v} r_k(u)/deg(u) +
    dangling_k * t(v)) with t uniform over the seeds, r_0 = t.
    ``None`` keeps the classic uniform teleport (identical result to
    before the parameter existed).
    """
    import ray

    from ..functions.hashing import hash64_array

    import numpy as np

    urls = sorted(set(node_urls))
    ids = hash64_array(urls)
    order = np.argsort(ids)
    ids, urls = ids[order], [urls[i] for i in order]
    n = len(urls)
    if n == 0:
        return pa.table({"url": pa.array([], pa.string()), "rank": pa.array([], pa.float64())})

    from .graph import pagerank_bucketed, resolve_plan

    if resolve_plan(plan, n) == "bucketed":
        # integer-encode WITHOUT the broadcast node-membership filter —
        # membership is enforced per bucket shard inside the bucketed
        # prep, so no O(V) array ships to every map task
        def to_int_raw(batch: pa.Table) -> pa.Table:
            out = {}
            for col, name in (("src_url", "src_id"), ("dst_url", "dst_id")):
                d = batch[col].combine_chunks().dictionary_encode()
                h = hash64_array(d.dictionary)
                out[name] = pa.array(
                    h[d.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
                )
            return pa.table(out)

        edges_raw = edges.map_batches(to_int_raw, batch_format="pyarrow").materialize()
        tel_ids = None
        if teleport_urls is not None:
            seed_ids = np.asarray(sorted(set(hash64_array(sorted(set(teleport_urls))))))
            pos = np.searchsorted(ids, seed_ids)
            np.clip(pos, 0, n - 1, out=pos)
            tel_ids = seed_ids[ids[pos] == seed_ids]
            if tel_ids.size == 0:
                raise ValueError("no teleport url is in the node set")
        return pagerank_bucketed(
            edges_raw,
            ids,
            urls,
            damping=damping,
            iters=iters,
            teleport_ids=tel_ids,
            num_buckets=num_buckets,
        )

    ids_ref = ray.put(ids)

    def to_int(batch: pa.Table) -> pa.Table:
        node_ids = ray.get(ids_ref)
        # hash only DISTINCT urls per batch (dictionary encode), then
        # gather — the per-edge cost is one int index
        out = {}
        for col, name in (("src_url", "src_id"), ("dst_url", "dst_id")):
            d = batch[col].combine_chunks().dictionary_encode()
            h = hash64_array(d.dictionary.to_pylist())
            out[name] = h[d.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
        pos_s = np.searchsorted(node_ids, out["src_id"])
        pos_d = np.searchsorted(node_ids, out["dst_id"])
        np.clip(pos_s, 0, n - 1, out=pos_s)
        np.clip(pos_d, 0, n - 1, out=pos_d)
        keep = (node_ids[pos_s] == out["src_id"]) & (node_ids[pos_d] == out["dst_id"])
        return pa.table(
            {"src_id": pa.array(out["src_id"][keep]), "dst_id": pa.array(out["dst_id"][keep])}
        )

    edges_i = edges.map_batches(to_int, batch_format="pyarrow").materialize()

    # Prep each edge block ONCE: src node positions + the dst unique/
    # inverse decomposition. Iterations are then pure numpy per block
    # (gather + segmented add), with only the node-bounded (dst_pos,
    # partial_sum) pair crossing the object store per task.
    @ray.remote(num_returns=2)
    def prep_block(block, node_ids_r):
        if isinstance(block, pa.RecordBatch):
            block = pa.Table.from_batches([block])
        si = np.searchsorted(node_ids_r, block["src_id"].to_numpy(zero_copy_only=False))
        u, inv = np.unique(
            block["dst_id"].to_numpy(zero_copy_only=False), return_inverse=True
        )
        u_pos = np.searchsorted(node_ids_r, u)
        deg_local = np.bincount(si, minlength=len(node_ids_r)).astype(np.int64)
        return (si.astype(np.int64), u_pos.astype(np.int64), inv.astype(np.int64)), deg_local

    block_refs = edges_i.to_arrow_refs()
    pairs = [prep_block.remote(r, ids_ref) for r in block_refs]
    prep_refs = [p for p, _d in pairs]  # edge-sized: stay in the object store
    deg = np.zeros(n, dtype=np.float64)
    for dl in ray.get([d for _p, d in pairs]):  # node-bounded: driver sums
        deg += dl
    dangling_mask = deg == 0
    inv_deg = np.where(dangling_mask, 0.0, 1.0 / np.maximum(deg, 1.0))

    @ray.remote
    def block_contrib(prep, w):
        si, u_pos, inv = prep
        s = np.zeros(u_pos.size, dtype=np.float64)
        np.add.at(s, inv, w[si])
        return u_pos, s

    if teleport_urls is not None:
        seed_ids = np.asarray(sorted(set(hash64_array(sorted(set(teleport_urls))))))
        pos = np.searchsorted(ids, seed_ids)
        np.clip(pos, 0, n - 1, out=pos)
        pos = pos[ids[pos] == seed_ids]
        if pos.size == 0:
            raise ValueError("no teleport url is in the node set")
        teleport = np.zeros(n, dtype=np.float64)
        teleport[pos] = 1.0 / pos.size
        ranks = teleport.copy()
    else:
        teleport = None
        ranks = np.full(n, 1.0 / n, dtype=np.float64)
    for _it in range(iters):
        w_ref = ray.put(ranks * inv_deg)
        parts = ray.get([block_contrib.remote(p, w_ref) for p in prep_refs])
        contrib = np.zeros(n, dtype=np.float64)
        for u_pos, s in parts:
            np.add.at(contrib, u_pos, s)
        dang = float(ranks[dangling_mask].sum())
        if teleport is None:
            # the classic uniform form, kept EXPRESSION-IDENTICAL to
            # the hash-matched oracle ((1-d)/n, dang/n — not *(1/n))
            ranks = (1.0 - damping) / n + damping * (contrib + dang / n)
        else:
            ranks = (1.0 - damping) * teleport + damping * (
                contrib + dang * teleport
            )

    by_url = sorted(range(n), key=lambda i: urls[i])
    return pa.table(
        {
            "url": pa.array([urls[i] for i in by_url], pa.string()),
            "rank": pa.array(ranks[np.array(by_url)], pa.float64()),
        }
    )


def hits(
    edges: "rd.Dataset",
    node_urls: list[str],
    *,
    iters: int = 5,
    plan: str = "auto",
    num_buckets: "int | None" = None,
) -> pa.Table:
    """HITS hubs/authorities over the link-edge table (Kleinberg 1999,
    "Authoritative Sources in a Hyperlinked Environment") — the second
    classic consumer of the link graph next to ``pagerank`` (the
    reference computes neither; its rank hook is vestigial,
    ``search/Searcher.java:48,155``).

    Semantics (mirrored exactly by the unrolled-CTE SQL oracle):
    nodes = crawled page urls; edges restricted to endpoints in the node
    set; h_0 = 1/n; per iteration a(v) = sum_{u->v} h(u) then L1
    normalize, h(u) = sum_{u->v} a(v) then L1 normalize.

    Physical plan: identical to ``pagerank`` — each edge block is
    integer-encoded and decomposed ONCE (both the src and dst
    unique/inverse, object-store resident); each half-iteration is one
    plain Ray task per block returning node-bounded partial sums against
    the broadcast score vector. Same node-count bound / bucketed-join
    scale path as pagerank's docstring.

    Returns (url, auth, hub) sorted by url; each column L1-normalized.
    """
    import ray

    import numpy as np

    from ..functions.hashing import hash64_array

    urls = sorted(set(node_urls))
    ids = hash64_array(urls)
    order = np.argsort(ids)
    ids, urls = ids[order], [urls[i] for i in order]
    n = len(urls)
    if n == 0:
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "auth": pa.array([], pa.float64()),
                "hub": pa.array([], pa.float64()),
            }
        )

    from .graph import hits_salsa_bucketed, resolve_plan

    if resolve_plan(plan, n) == "bucketed":
        def to_int_raw(batch: pa.Table) -> pa.Table:
            out = {}
            for col, name in (("src_url", "src_id"), ("dst_url", "dst_id")):
                d = batch[col].combine_chunks().dictionary_encode()
                h = hash64_array(d.dictionary)
                out[name] = pa.array(
                    h[d.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
                )
            return pa.table(out)

        edges_raw = edges.map_batches(to_int_raw, batch_format="pyarrow").materialize()
        return hits_salsa_bucketed(
            edges_raw, ids, urls, iters=iters, stochastic=False, num_buckets=num_buckets
        )
    ids_ref = ray.put(ids)

    def to_int(batch: pa.Table) -> pa.Table:
        node_ids = ray.get(ids_ref)
        out = {}
        for col, name in (("src_url", "src_id"), ("dst_url", "dst_id")):
            d = batch[col].combine_chunks().dictionary_encode()
            h = hash64_array(d.dictionary.to_pylist())
            out[name] = h[d.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
        pos_s = np.searchsorted(node_ids, out["src_id"])
        pos_d = np.searchsorted(node_ids, out["dst_id"])
        np.clip(pos_s, 0, n - 1, out=pos_s)
        np.clip(pos_d, 0, n - 1, out=pos_d)
        keep = (node_ids[pos_s] == out["src_id"]) & (node_ids[pos_d] == out["dst_id"])
        return pa.table(
            {"src_id": pa.array(out["src_id"][keep]), "dst_id": pa.array(out["dst_id"][keep])}
        )

    edges_i = edges.map_batches(to_int, batch_format="pyarrow").materialize()

    @ray.remote
    def prep_block(block, node_ids_r):
        if isinstance(block, pa.RecordBatch):
            block = pa.Table.from_batches([block])
        si = np.searchsorted(node_ids_r, block["src_id"].to_numpy(zero_copy_only=False))
        di = np.searchsorted(node_ids_r, block["dst_id"].to_numpy(zero_copy_only=False))
        su, sinv = np.unique(si, return_inverse=True)
        du, dinv = np.unique(di, return_inverse=True)
        return (
            si.astype(np.int64),
            di.astype(np.int64),
            su.astype(np.int64),
            sinv.astype(np.int64),
            du.astype(np.int64),
            dinv.astype(np.int64),
        )

    prep_refs = [prep_block.remote(r, ids_ref) for r in edges_i.to_arrow_refs()]

    @ray.remote
    def fwd(prep, h):  # authority partials: gather h at src, sum per dst
        si, _di, _su, _sinv, du, dinv = prep
        s = np.zeros(du.size, dtype=np.float64)
        np.add.at(s, dinv, h[si])
        return du, s

    @ray.remote
    def bwd(prep, a):  # hub partials: gather a at dst, sum per src
        _si, di, su, sinv, _du, _dinv = prep
        s = np.zeros(su.size, dtype=np.float64)
        np.add.at(s, sinv, a[di])
        return su, s

    def gather(task, vec):
        ref = ray.put(vec)
        out = np.zeros(n, dtype=np.float64)
        for pos, s in ray.get([task.remote(p, ref) for p in prep_refs]):
            np.add.at(out, pos, s)
        tot = out.sum()
        return out / tot if tot > 0 else out

    hub = np.full(n, 1.0 / n, dtype=np.float64)
    auth = np.zeros(n, dtype=np.float64)
    for _it in range(iters):
        auth = gather(fwd, hub)
        hub = gather(bwd, auth)

    by_url = sorted(range(n), key=lambda i: urls[i])
    idx = np.array(by_url)
    return pa.table(
        {
            "url": pa.array([urls[i] for i in by_url], pa.string()),
            "auth": pa.array(auth[idx], pa.float64()),
            "hub": pa.array(hub[idx], pa.float64()),
        }
    )


def salsa(
    edges: "rd.Dataset",
    node_urls: list[str],
    *,
    iters: int = 5,
    plan: str = "auto",
    num_buckets: "int | None" = None,
) -> pa.Table:
    """SALSA hubs/authorities over the link-edge table (Lempel & Moran
    2000, "The Stochastic Approach for Link-Structure Analysis") — the
    third classic link-graph scorer next to ``pagerank`` and ``hits``.
    Where HITS sums raw neighbor scores, SALSA walks the bipartite
    hub/authority graph stochastically: each half-step divides the
    propagated score by the PROPAGATING node's degree, so one massive
    hub cannot dominate every authority it touches (the tight-knit-
    community effect HITS suffers).

    Semantics (mirrored exactly by the unrolled-CTE SQL oracle):
    nodes = crawled page urls; edges restricted to endpoints in the
    node set (DISTINCT, as extracted); out/in degree = restricted edge
    counts. h_0 = 1/n; per iteration
      a(v) = sum_{u->v} h(u) / outdeg(u), then a /= sum(a)
      h(u) = sum_{u->v} a(v) / indeg(v),  then h /= sum(h).
    The explicit L1 re-normalization makes the recurrence well-defined
    on disconnected / dangling graphs (mass parked on zero-out-degree
    nodes leaves the walk; re-normalizing keeps the scores a
    distribution — the standard practical fix, and exactly what the
    oracle replays).

    Physical plan: identical to ``hits`` — each edge block integer-
    encoded and unique/inverse-decomposed ONCE (object-store resident);
    per half-iteration one plain Ray task per block returns node-
    bounded partial sums against the broadcast degree-normalized score
    vector. Same node-count bound / bucketed-join scale path as the
    pagerank docstring.

    Returns (url, auth, hub) sorted by url; each column L1-normalized.
    """
    import ray

    import numpy as np

    from ..functions.hashing import hash64_array

    urls = sorted(set(node_urls))
    ids = hash64_array(urls)
    order = np.argsort(ids)
    ids, urls = ids[order], [urls[i] for i in order]
    n = len(urls)
    if n == 0:
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "auth": pa.array([], pa.float64()),
                "hub": pa.array([], pa.float64()),
            }
        )

    from .graph import hits_salsa_bucketed, resolve_plan

    if resolve_plan(plan, n) == "bucketed":
        def to_int_raw(batch: pa.Table) -> pa.Table:
            out = {}
            for col, name in (("src_url", "src_id"), ("dst_url", "dst_id")):
                d = batch[col].combine_chunks().dictionary_encode()
                h = hash64_array(d.dictionary)
                out[name] = pa.array(
                    h[d.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
                )
            return pa.table(out)

        edges_raw = edges.map_batches(to_int_raw, batch_format="pyarrow").materialize()
        return hits_salsa_bucketed(
            edges_raw, ids, urls, iters=iters, stochastic=True, num_buckets=num_buckets
        )
    ids_ref = ray.put(ids)

    def to_int(batch: pa.Table) -> pa.Table:
        node_ids = ray.get(ids_ref)
        out = {}
        for col, name in (("src_url", "src_id"), ("dst_url", "dst_id")):
            d = batch[col].combine_chunks().dictionary_encode()
            h = hash64_array(d.dictionary.to_pylist())
            out[name] = h[d.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
        pos_s = np.searchsorted(node_ids, out["src_id"])
        pos_d = np.searchsorted(node_ids, out["dst_id"])
        np.clip(pos_s, 0, n - 1, out=pos_s)
        np.clip(pos_d, 0, n - 1, out=pos_d)
        keep = (node_ids[pos_s] == out["src_id"]) & (node_ids[pos_d] == out["dst_id"])
        return pa.table(
            {"src_id": pa.array(out["src_id"][keep]), "dst_id": pa.array(out["dst_id"][keep])}
        )

    edges_i = edges.map_batches(to_int, batch_format="pyarrow").materialize()

    @ray.remote(num_returns=2)
    def prep_block(block, node_ids_r):
        if isinstance(block, pa.RecordBatch):
            block = pa.Table.from_batches([block])
        si = np.searchsorted(node_ids_r, block["src_id"].to_numpy(zero_copy_only=False))
        di = np.searchsorted(node_ids_r, block["dst_id"].to_numpy(zero_copy_only=False))
        su, sinv = np.unique(si, return_inverse=True)
        du, dinv = np.unique(di, return_inverse=True)
        deg_out = np.bincount(si, minlength=len(node_ids_r)).astype(np.int64)
        deg_in = np.bincount(di, minlength=len(node_ids_r)).astype(np.int64)
        prep = (
            si.astype(np.int64),
            di.astype(np.int64),
            su.astype(np.int64),
            sinv.astype(np.int64),
            du.astype(np.int64),
            dinv.astype(np.int64),
        )
        return prep, np.stack([deg_out, deg_in])

    pairs = [prep_block.remote(r, ids_ref) for r in edges_i.to_arrow_refs()]
    prep_refs = [p for p, _d in pairs]  # edge-sized: stay in the object store
    deg_out = np.zeros(n, dtype=np.float64)
    deg_in = np.zeros(n, dtype=np.float64)
    for dl in ray.get([d for _p, d in pairs]):  # node-bounded: driver sums
        deg_out += dl[0]
        deg_in += dl[1]
    inv_out = np.where(deg_out > 0, 1.0 / np.maximum(deg_out, 1.0), 0.0)
    inv_in = np.where(deg_in > 0, 1.0 / np.maximum(deg_in, 1.0), 0.0)

    @ray.remote
    def fwd(prep, w):  # authority partials: gather w at src, sum per dst
        si, _di, _su, _sinv, du, dinv = prep
        s = np.zeros(du.size, dtype=np.float64)
        np.add.at(s, dinv, w[si])
        return du, s

    @ray.remote
    def bwd(prep, w):  # hub partials: gather w at dst, sum per src
        _si, di, su, sinv, _du, _dinv = prep
        s = np.zeros(su.size, dtype=np.float64)
        np.add.at(s, sinv, w[di])
        return su, s

    def gather(task, weighted):
        ref = ray.put(weighted)
        out = np.zeros(n, dtype=np.float64)
        for pos, s in ray.get([task.remote(p, ref) for p in prep_refs]):
            np.add.at(out, pos, s)
        tot = out.sum()
        return out / tot if tot > 0 else out

    hub = np.full(n, 1.0 / n, dtype=np.float64)
    auth = np.zeros(n, dtype=np.float64)
    for _it in range(iters):
        auth = gather(fwd, hub * inv_out)
        hub = gather(bwd, auth * inv_in)

    by_url = sorted(range(n), key=lambda i: urls[i])
    idx = np.array(by_url)
    return pa.table(
        {
            "url": pa.array([urls[i] for i in by_url], pa.string()),
            "auth": pa.array(auth[idx], pa.float64()),
            "hub": pa.array(hub[idx], pa.float64()),
        }
    )


def out_degree(links: "pa.Table") -> pa.Table:
    """Per-page out-degree from a link-edge table (vectorized)."""
    agg = links.group_by("src_url").aggregate([([], "count_all")])
    return pa.table(
        {"src_url": agg["src_url"], "out_degree": agg["count_all"].cast(pa.int64())}
    )


HOST_RE = r"^[a-z]+://([^/:]+).*$"


def host_stats_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial of the per-HOST crawl summary (the map-side
    combine: the shuffle that follows carries host-cardinality partials,
    never page rows). Host = url authority, extracted with one RE2
    kernel over the batch. Byte totals use binary length (exact bytes,
    not codepoints — matched by ``strlen``/``octet_length`` in the SQL
    twin)."""
    import numpy as np

    host = pc.replace_substring_regex(
        batch["url"], pattern=HOST_RE, replacement=r"\1"
    )
    t = pa.table(
        {
            "host": host,
            "n_pages": pa.array(np.ones(batch.num_rows, np.int64)),
            "sum_html_bytes": pc.binary_length(batch["html"]).cast(pa.int64()),
            "sum_text_bytes": pc.binary_length(batch["text"]).cast(pa.int64()),
        }
    )
    agg = t.group_by("host").aggregate(
        [("n_pages", "sum"), ("sum_html_bytes", "sum"), ("sum_text_bytes", "sum")]
    )
    return agg.rename_columns(["host", "n_pages", "sum_html_bytes", "sum_text_bytes"])


# ---------------------------------------------------------------------------
# Robots gate — the reference's per-JVM robots cache + decision loop
# (``Crawler.java:27,229-308``) as an actor-pool stage over pre-crawled
# pages. No fetching (Parquet tier): each host's robots.txt body is a
# deterministic pure function of the host, so the SQL twin can re-derive
# every decision from embedded rule literals.

ROBOTS_AGENT = "cis5550-crawler"


def synth_robots(host: str) -> str:
    """Deterministic synthetic robots.txt for a host (pure function of
    the host string): three first-digit path rules in the ``*`` section
    and, for a third of hosts, an exact-agent section that overrides —
    exercising the reference's exact-then-star two-pass scan."""
    from ..functions.hashing import hash64

    h = hash64("robots:" + host)
    lines = ["User-agent: *"]
    # two prefix depths over the zero-padded /p/NNNNNNNN paths: a
    # hundreds-digit rule first, then a thousands-digit rule — the
    # shallower rule can shadow the deeper one, so first-match-wins
    # ordering is actually load-bearing
    for j, pad in enumerate(("00000", "0000")):
        d = (h >> (4 * j)) % 10
        flag = "Allow" if (h >> (12 + j)) & 1 else "Disallow"
        lines.append(f"{flag}: /p/{pad}{d}")
    if h % 3 == 0:
        lines.append(f"User-agent: {ROBOTS_AGENT}")
        lines.append(("Disallow" if h & 1 else "Allow") + ": /p/")
    return "\n".join(lines)


def robots_rule_rows(hosts: "list[str]") -> "list[tuple]":
    """(host, section, ord, flag, prefix) literals for the SQL twin —
    section already classified ('agent' = the exact-agent section)."""
    from ..functions.robots import parse_robots

    rows = []
    for host in hosts:
        parsed = parse_robots(synth_robots(host))
        for section_key, name in ((ROBOTS_AGENT, "agent"), ("*", "*")):
            for i, (flag, prefix) in enumerate(parsed.get(section_key, [])):
                rows.append((host, name, i, flag, prefix))
    return rows


class RobotsGateStage:
    """Actor-pool stage: url -> (host, allowed). The per-HOST parsed
    rule cache lives in the actor (``__init__`` state — the reference
    keeps the same cache per worker JVM, ``Crawler.java:27``); the
    decision itself is the pure ``is_ok_to_crawl`` scan. Inherently a
    per-url scalar decision (like media decode) — the host parse
    happens once per host per actor, not per row."""

    def __init__(self, *, user_agent: str = ROBOTS_AGENT):
        self.user_agent = user_agent
        self._cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions.robots import is_ok_to_crawl, parse_robots
        from ..functions.urls import host_of

        urls = batch["url"].to_pylist()
        hosts = []
        allowed = np.zeros(len(urls), dtype=bool)
        for i, u in enumerate(urls):
            host = host_of(u)
            rules = self._cache.get(host)
            if rules is None:
                rules = parse_robots(synth_robots(host))
                self._cache[host] = rules
            hosts.append(host)
            allowed[i] = is_ok_to_crawl(rules, self.user_agent, u)
        al = allowed.astype(np.int64)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "n_allowed": pa.array(al),
                "n_denied": pa.array(1 - al),
            }
        )


def robots_gate_counts(pages: "rd.Dataset", *, concurrency: int = 4) -> "rd.Dataset":
    """Per-host allow/deny counts of the robots gate over a pages
    Dataset — map-side actor pool then one host-cardinality groupby
    (hosts are bounded: sites, not pages)."""
    from ray.data.aggregate import Sum

    per_url = pages.map_batches(
        RobotsGateStage, batch_format="pyarrow", batch_size=1024, concurrency=concurrency
    )
    return per_url.groupby("host").aggregate(
        Sum("n_allowed", alias_name="n_allowed"), Sum("n_denied", alias_name="n_denied")
    )


def politeness_schedule(pages: "rd.Dataset", *, per_host_interval_s: int = 1) -> "rd.Dataset":
    """The reference's politeness throttle (skip a host fetched less
    than 1 s ago and re-emit the url to the next wave,
    ``Crawler.java:84-91,452-477``) recast as a DETERMINISTIC batch
    schedule: with at most one fetch per host per
    ``per_host_interval_s``, url #k of a host (ordered by url) fetches
    at slot k — the earliest-feasible plan the live throttle converges
    to, computable ahead of time instead of by retry. Output: (url,
    host, slot, fetch_at_s).

    Physical plan: one bounded host-bucket hash shuffle, then ONE
    vectorized (host, url) lexsort + segmented rank per bucket — a
    host's urls never span buckets, so per-bucket ranks are final."""
    import numpy as np

    from ..functions.hashing import hash64
    from ..functions.urls import host_of
    from .shuffle import hash_map_groups

    def add_host(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        hosts = [host_of(u) for u in urls]
        # hash64, NOT python hash(): the builtin is per-process seeded,
        # which would route one host to different buckets in different
        # worker processes and split its rank sequence
        hb = np.fromiter(
            (hash64(h) & 63 for h in hosts), dtype=np.int64, count=len(hosts)
        )
        return pa.table(
            {
                "url": t["url"],
                "host": pa.array(hosts, pa.string()),
                "hbucket": pa.array(hb),
            }
        )

    def ranks(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("host", "ascending"), ("url", "ascending")]
        )
        g = group.take(idx)
        import numpy as np

        h = g["host"].to_numpy(zero_copy_only=False)
        new_host = np.ones(len(h), dtype=bool)
        new_host[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(new_host)
        counts = np.diff(np.append(starts, len(h)))
        slot = np.arange(len(h), dtype=np.int64) - np.repeat(starts, counts)
        return pa.table(
            {
                "url": g["url"],
                "host": g["host"],
                "slot": pa.array(slot),
                "fetch_at_s": pa.array(slot * per_host_interval_s),
            }
        )

    return hash_map_groups(
        pages.map_batches(add_host, batch_format="pyarrow"), "hbucket", ranks
    )


def triangle_stats(edges: "rd.Dataset", *, num_buckets: int = 64) -> pa.Table:
    """Exact triangle census of an undirected graph — the clustering /
    spam-farm-density signal over the crawl's link graph (the reference
    extracts the edges, ``Crawler.java:405-436``, but consumes them
    only for the frontier; this is the classic analysis its PageRank
    hook never got).

    Input: Dataset of DISTINCT undirected edges ``(doc_a < doc_b)``
    (int64 node ids). Output: ONE row ``(n_nodes, n_edges, n_wedges,
    n_triangles, transitivity_e6)`` where transitivity = 3 x triangles
    / wedges, floor-quantized at 1e6 so the row is hash-exact.

    Physical plan (the degree-oriented MapReduce triangle plan of
    Suri & Vassilvitskii 2011, Ray-Data-native):

    1. degrees — per-batch partial ``(node, n)`` counts, then ONE
       bounded node-bucket exchange summing partials (a node's partials
       all land in one bucket; never a per-node Python group).
    2. two bucketed Arrow joins attach ``deg`` to each endpoint
       (``shuffle_join`` — narrow int columns only).
    3. orientation — each edge points from the endpoint with the lower
       ``(deg, id)`` to the higher. This is the skew defusal: a hub of
       degree D receives almost all its edges INBOUND, so the wedge
       fan-out at any node is bounded by its oriented out-degree
       (O(sqrt(m)) on graphs of bounded degeneracy) instead of D^2.
    4. wedges — bucket oriented edges by source; per bucket one
       lexsort + per-run-length ``np.triu_indices`` expansion (the
       ``_band_runs`` pattern — no per-node Python call), then a local
       vectorized (v, w) wedge-count combine before the exchange.
    5. closing — tagged union of wedge counts (side 0) and oriented
       edges (side 1), ONE bounded pair-bucket exchange, per-bucket
       Arrow join on (v, w), per-bucket partial triangle sums; the
       driver sums <= num_buckets scalars.

    Wedge totals come from the degree table (sum deg*(deg-1)/2), so
    transitivity needs no extra pass. Orientation makes each triangle
    a wedge at exactly its min-(deg, id) vertex closed by exactly one
    oriented edge — counted once, no /3 correction.
    """
    import numpy as np
    import ray.data as rd  # noqa: F401  (annotation)

    from .ops import bucket_mix, packed_join
    from .shuffle import packed_task_groups

    # pin the edge blocks ONCE: degrees, the edge count and the first
    # degree-attach join all consume them — unmaterialized, the whole
    # upstream plan (extraction + distinct) would re-run three times
    edges = edges.materialize()

    # --- 1. degrees ------------------------------------------------
    def deg_partial(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                batch["doc_a"].to_numpy(zero_copy_only=False),
                batch["doc_b"].to_numpy(zero_copy_only=False),
            ]
        )
        uniq, counts = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "node": pa.array(uniq),
                "n": pa.array(counts.astype(np.int64)),
                "nbucket": pa.array(bucket_mix(uniq, num_buckets).astype(np.int64)),
            }
        )

    def deg_of_bucket(group: pa.Table) -> pa.Table:
        agg = (
            group.select(["node", "n"])
            .group_by("node")
            .aggregate([("n", "sum")])
            .rename_columns(["node", "deg"])
        )
        return agg

    degrees = packed_task_groups(
        edges.map_batches(deg_partial, batch_format="pyarrow"),
        "nbucket",
        deg_of_bucket,
        num_buckets=num_buckets,
    ).materialize()

    # wedge total + node count: tiny per-block partials, summed once
    def wedge_partial(batch: pa.Table) -> pa.Table:
        d = batch["deg"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "w": pa.array([int((d * (d - 1) // 2).sum())], pa.int64()),
                "nn": pa.array([len(d)], pa.int64()),
            }
        )

    parts = degrees.map_batches(wedge_partial, batch_format="pyarrow").take_all()
    n_wedges = int(sum(r["w"] for r in parts))
    n_nodes = int(sum(r["nn"] for r in parts))
    n_edges = int(edges.count())

    # --- 2. attach degrees, 3. orient ------------------------------
    dega = degrees.map_batches(
        lambda t: t.rename_columns(["doc_a", "deg_a"]), batch_format="pyarrow"
    )
    degb = degrees.map_batches(
        lambda t: t.rename_columns(["doc_b", "deg_b"]), batch_format="pyarrow"
    )
    with_a = packed_join(
        edges, dega, "doc_a", left_cols=["doc_b"], right_cols=["deg_a"],
        num_buckets=num_buckets,
    )
    with_ab = packed_join(
        with_a, degb, "doc_b", left_cols=["doc_a", "deg_a"], right_cols=["deg_b"],
        num_buckets=num_buckets,
    )

    def orient(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        da = batch["deg_a"].to_numpy(zero_copy_only=False)
        db = batch["deg_b"].to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        dv = np.where(a_first, db, da)
        return pa.table(
            {
                "u": pa.array(u),
                "v": pa.array(v),
                "dv": pa.array(dv.astype(np.int64)),
                "ubucket": pa.array(bucket_mix(u, num_buckets).astype(np.int64)),
            }
        )

    oriented = with_ab.map_batches(orient, batch_format="pyarrow").materialize()

    # --- 4. wedges ---------------------------------------------------
    empty_wedges = pa.table(
        {
            "v": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64()),
            "n_wedge": pa.array([], pa.int64()),
            "pbucket": pa.array([], pa.int64()),
        }
    )

    def wedges_of_bucket(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m < 2:
            return empty_wedges
        u = group["u"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        dv = group["dv"].to_numpy(zero_copy_only=False)
        # runs keyed by u; within a run neighbours sorted by (deg, id)
        # so pair (i < j) is already closing-edge oriented
        order = np.lexsort((v, dv, u))
        u_s, v_s = u[order], v[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(u_s)) + 1))
        lens = np.diff(np.concatenate((starts, [m])))
        multi = lens > 1
        starts, lens = starts[multi], lens[multi]
        if starts.size == 0:
            return empty_wedges
        out_x, out_w = [], []
        for run_len in np.unique(lens):
            rs = starts[lens == run_len]
            iu, ju = np.triu_indices(int(run_len), 1)
            out_x.append(v_s[(rs[:, None] + iu[None, :]).ravel()])
            out_w.append(v_s[(rs[:, None] + ju[None, :]).ravel()])
        pairs = pa.table(
            {
                "v": pa.array(np.concatenate(out_x)),
                "w": pa.array(np.concatenate(out_w)),
            }
        )
        agg = pairs.group_by(["v", "w"]).aggregate([([], "count_all")])
        vv = agg["v"].to_numpy(zero_copy_only=False)
        ww = agg["w"].to_numpy(zero_copy_only=False)
        pb = bucket_mix(
            (vv.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)).view(np.int64) ^ ww,
            num_buckets,
        )
        return pa.table(
            {
                "v": agg["v"],
                "w": agg["w"],
                "n_wedge": agg["count_all"],
                "pbucket": pa.array(pb.astype(np.int64)),
            }
        )

    wedge_counts = packed_task_groups(
        oriented, "ubucket", wedges_of_bucket, num_buckets=num_buckets
    )

    # --- 5. closing --------------------------------------------------
    def edge_side(batch: pa.Table) -> pa.Table:
        vv = batch["u"].to_numpy(zero_copy_only=False)
        ww = batch["v"].to_numpy(zero_copy_only=False)
        pb = bucket_mix(
            (vv.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)).view(np.int64) ^ ww,
            num_buckets,
        )
        return pa.table(
            {
                "v": batch["u"],
                "w": batch["v"],
                "n_wedge": pa.array(np.full(len(vv), -1, np.int64)),
                "pbucket": pa.array(pb.astype(np.int64)),
            }
        )

    tagged = wedge_counts.union(oriented.map_batches(edge_side, batch_format="pyarrow"))

    def close_of_bucket(group: pa.Table) -> pa.Table:
        wedge_rows = group.filter(pc.field("n_wedge") >= 0).select(["v", "w", "n_wedge"])
        edge_rows = group.filter(pc.field("n_wedge") < 0).select(["v", "w"])
        if wedge_rows.num_rows == 0 or edge_rows.num_rows == 0:
            return pa.table({"tri": pa.array([0], pa.int64())})
        joined = wedge_rows.join(edge_rows, keys=["v", "w"], join_type="inner")
        tri = int(pc.sum(joined["n_wedge"]).as_py() or 0)
        return pa.table({"tri": pa.array([tri], pa.int64())})

    tri_parts = packed_task_groups(
        tagged, "pbucket", close_of_bucket, num_buckets=num_buckets
    ).take_all()
    n_triangles = int(sum(r["tri"] for r in tri_parts))

    trans_e6 = (3_000_000 * n_triangles) // n_wedges if n_wedges else 0
    return pa.table(
        {
            "n_nodes": pa.array([n_nodes], pa.int64()),
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_wedges": pa.array([n_wedges], pa.int64()),
            "n_triangles": pa.array([n_triangles], pa.int64()),
            "transitivity_e6": pa.array([trans_e6], pa.int64()),
        }
    )


def cocitation_pairs(
    edges: "rd.Dataset", *, min_common: int = 4, num_buckets: int = 64
) -> "rd.Dataset":
    """Co-citation pairs (Small 1973): pages cited TOGETHER by the same
    source — the classic link-based relatedness signal (two docs many
    pages link to jointly are about the same thing). The reference has
    the raw material (its crawler extracts anchors,
    ``crawler/Crawler.java:405-436``) but no graph analysis.

    Input: (src_url, dst_url) edge batches. Pages become int64 doc ids
    (hash64(url) — C-speed md5), then two BOUNDED bucket exchanges:
    (1) group by src bucket — per-src sorted dst runs emit their
    ``triu`` index pairs batched by run-length class (out-degree is
    page-bounded, so per-src pair fan-out is too) with a local
    per-bucket (a,b) count combine; (2) group by pair bucket — one
    vectorized reduceat sums counts, keeping pairs co-cited by
    >= ``min_common`` distinct sources. No per-key Python, no edge
    self-join."""
    from ..functions.hashing import hash64_array
    from .ops import bucket_mix

    def to_ids(t: pa.Table) -> pa.Table:
        s = hash64_array(t["src_url"].to_pylist())
        d = hash64_array(t["dst_url"].to_pylist())
        return pa.table(
            {
                "s": pa.array(s),
                "d": pa.array(d),
                "sbucket": pa.array(bucket_mix(s, num_buckets)),
            }
        )

    return int_cooccurrence_pairs(
        edges.map_batches(to_ids, batch_format="pyarrow"),
        min_common=min_common,
        num_buckets=num_buckets,
    )


def int_cooccurrence_pairs(
    ids: "rd.Dataset", *, min_common: int = 4, num_buckets: int = 64
) -> "rd.Dataset":
    """The co-citation pair kernels on raw int columns: input batches
    carry ``(s, d, sbucket)`` (key, value, bucket_mix(key)); output is
    every value pair ``(doc_a < doc_b, n_common_src)`` sharing >=
    ``min_common`` distinct keys. Two bounded bucket exchanges, triu
    pair explosion by run-length class, vectorized count combines — no
    per-key Python. Shared by :func:`cocitation_pairs` (keys = citing
    pages), :func:`bib_coupling_pairs` (reversed) and
    ``stages/dedup.winnowing_pairs`` (keys = fingerprints)."""
    import numpy as np

    from .ops import bucket_mix
    from .shuffle import packed_task_groups

    empty_pairs = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "pbucket": pa.array([], pa.int64()),
        }
    )

    def pairs_of_bucket(group: pa.Table) -> pa.Table:
        s = group["s"].to_numpy(zero_copy_only=False)
        d = group["d"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        keep = np.ones(s.size, dtype=bool)  # distinct (s,d): an edge
        keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])  # counts once
        s, d = s[keep], d[keep]
        if s.size < 2:
            return empty_pairs
        starts = np.concatenate(([0], np.flatnonzero(np.diff(s) != 0) + 1))
        lens = np.diff(np.concatenate((starts, [s.size])))
        multi = lens > 1
        starts, lens = starts[multi], lens[multi]
        if starts.size == 0:
            return empty_pairs
        oa, ob = [], []
        for run_len in np.unique(lens):
            rs = starts[lens == run_len]
            iu, ju = np.triu_indices(int(run_len), 1)
            oa.append(d[(rs[:, None] + iu[None, :]).ravel()])
            ob.append(d[(rs[:, None] + ju[None, :]).ravel()])
        a, b = np.concatenate(oa), np.concatenate(ob)
        # dsts are sorted within each src run, so a < b already holds;
        # local combiner: per-(a,b) counts within this bucket
        o2 = np.lexsort((b, a))
        a, b = a[o2], b[o2]
        first = np.ones(a.size, dtype=bool)
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        st = np.flatnonzero(first)
        cnt = np.diff(np.concatenate((st, [a.size]))).astype(np.int64)
        a, b = a[st], b[st]
        pb = bucket_mix(
            (a.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)).view(np.int64) ^ b,
            num_buckets,
        )
        return pa.table(
            {
                "doc_a": pa.array(a),
                "doc_b": pa.array(b),
                "n": pa.array(cnt),
                "pbucket": pa.array(pb),
            }
        )

    partials = packed_task_groups(
        ids,
        "sbucket",
        pairs_of_bucket,
        num_buckets=num_buckets,
    )

    empty_out = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "n_common_src": pa.array([], pa.int64()),
        }
    )

    def count_of_bucket(group: pa.Table) -> pa.Table:
        a = group["doc_a"].to_numpy(zero_copy_only=False)
        b = group["doc_b"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        if a.size == 0:
            return empty_out
        order = np.lexsort((b, a))
        a, b, n = a[order], b[order], n[order]
        first = np.ones(a.size, dtype=bool)
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        st = np.flatnonzero(first)
        sums = np.add.reduceat(n, st)
        keep = sums >= min_common
        return pa.table(
            {
                "doc_a": pa.array(a[st][keep]),
                "doc_b": pa.array(b[st][keep]),
                "n_common_src": pa.array(sums[keep].astype(np.int64)),
            }
        )

    return packed_task_groups(
        partials, "pbucket", count_of_bucket, num_buckets=num_buckets
    )


def bib_coupling_pairs(
    edges: "rd.Dataset", *, min_common: int = 3, num_buckets: int = 64
) -> "rd.Dataset":
    """Bibliographic coupling (Kessler 1963) — the dual of co-citation:
    pairs of SOURCES sharing >= ``min_common`` common link targets
    (two pages citing the same things are related). Exactly
    ``cocitation_pairs`` over the reversed edge set, so the same
    bounded-bucket kernels carry it; only the count column is renamed
    to say what was shared."""

    def swap(t: pa.Table) -> pa.Table:
        return pa.table({"src_url": t["dst_url"], "dst_url": t["src_url"]})

    out = cocitation_pairs(
        edges.map_batches(swap, batch_format="pyarrow"),
        min_common=min_common,
        num_buckets=num_buckets,
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["doc_a", "doc_b", "n_common_dst"])

    return out.map_batches(rename, batch_format="pyarrow")


def kcore_flags(
    edges: "rd.Dataset",
    *,
    k: int,
    rounds: int = 10,
    plan: str = "auto",
    num_buckets: "int | None" = None,
) -> pa.Table:
    """k-core decomposition of an undirected graph by iterative peeling
    (Seidman 1983) — the "dense nucleus" signal link-spam and
    community analyses run over a web graph: repeatedly drop nodes
    whose degree among SURVIVORS is < k; after enough rounds the
    remainder is the k-core.

    Input: DISTINCT (doc_a < doc_b) edges. Output: one row per graph
    node, ``(doc_id, in_core)`` — membership after exactly ``rounds``
    peels (early-exit on fixpoint is invariant: a fixpoint survives
    any further rounds, so the unrolled-SQL twin computes the same
    set).

    Physical plan (the ``pagerank``/``dup_clusters`` task-per-block
    pattern): edge blocks are integer-encoded against the sorted node
    array ONCE and stay in the object store; per round the alive
    bitmap (1 bit-bool per node) is broadcast via ``ray.put`` and one
    task per block returns its node-bounded surviving-degree partials,
    which the driver folds with ``np.add.at``. Nothing corpus-sized
    ever lands on the driver — state is O(nodes-in-edges); above
    ``graph.graph_bucketed_limit()`` estimated nodes (or
    ``plan="bucketed"`` / env ``WSE_GRAPH_PLAN``) the job cuts over to
    ``stages.graph.kcore_bucketed`` — bucketed alive shards,
    bucket-to-bucket surviving-degree partials, BIT-IDENTICAL
    membership (boolean/integer ops, same fixpoint round)."""
    import numpy as np

    import ray

    from .graph import kcore_bucketed, resolve_plan

    edges = edges.select_columns(["doc_a", "doc_b"]).materialize()
    if resolve_plan(plan, 2 * edges.count()) == "bucketed":
        return kcore_bucketed(edges, k=k, rounds=rounds, num_buckets=num_buckets)
    refs = edges.to_arrow_refs()

    def _tbl_of(b):
        return pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b

    @ray.remote
    def block_nodes(b):
        t = _tbl_of(b)
        return np.unique(
            np.concatenate(
                [
                    t["doc_a"].to_numpy(zero_copy_only=False),
                    t["doc_b"].to_numpy(zero_copy_only=False),
                ]
            )
        )

    parts = ray.get([block_nodes.remote(r) for r in refs])
    parts = [p for p in parts if p.size]
    if not parts:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "in_core": pa.array([], pa.bool_())}
        )
    nodes = np.unique(np.concatenate(parts))
    ids_ref = ray.put(nodes)

    @ray.remote
    def prep_block(b, ids):
        t = _tbl_of(b)
        a = np.searchsorted(ids, t["doc_a"].to_numpy(zero_copy_only=False))
        bb = np.searchsorted(ids, t["doc_b"].to_numpy(zero_copy_only=False))
        return a.astype(np.int64), bb.astype(np.int64)

    prep_refs = [prep_block.remote(r, ids_ref) for r in refs]

    @ray.remote
    def surviving_degree(prep, alive):
        a, b = prep
        live = alive[a] & alive[b]
        idx = np.concatenate([a[live], b[live]])
        u, c = np.unique(idx, return_counts=True)
        return u, c.astype(np.int64)

    alive = np.ones(nodes.size, dtype=bool)
    for _ in range(rounds):
        alive_ref = ray.put(alive)
        deg = np.zeros(nodes.size, np.int64)
        for u, c in ray.get([surviving_degree.remote(p, alive_ref) for p in prep_refs]):
            np.add.at(deg, u, c)
        new_alive = alive & (deg >= k)
        if np.array_equal(new_alive, alive):
            break
        alive = new_alive

    return pa.table(
        {"doc_id": pa.array(nodes), "in_core": pa.array(alive)}
    )


def label_prop_communities(
    pairs: "rd.Dataset",
    *,
    rounds: int = 5,
    plan: str = "auto",
    num_buckets: "int | None" = None,
) -> pa.Table:
    """Synchronous label-propagation COMMUNITY detection (Raghavan et
    al. 2007) over an undirected (doc_a, doc_b) pair graph — the
    community counterpart of ``stages/dedup.dup_clusters``'s
    connected-component min-label: each round every node adopts the
    MOST FREQUENT label among its neighbours (tie -> smallest label),
    starting from label(v) = v. Synchronous updates + the deterministic
    tie-break make the result partitioning-invariant and exactly
    replayable by the unrolled-CTE SQL twin (fixed ``rounds``; early
    exit only on a fixpoint, which further rounds preserve).

    Physical plan is ``dup_clusters``'s task-per-block pattern: pair
    blocks integer-encode against the sorted node array ONCE (object
    store resident); per round the label vector broadcasts and one task
    per block returns its node-bounded per-(node, neighbour-label)
    partial counts; the driver folds counts and takes the per-node
    (count desc, label asc) argmax. Node/label state bounded by the
    nodes appearing in pairs (the repo's broadcast convention); above
    ``graph.graph_bucketed_limit()`` estimated nodes (or
    ``plan="bucketed"`` / env ``WSE_GRAPH_PLAN``) the job cuts over to
    ``stages.graph.label_prop_bucketed`` — bucketed label shards,
    bucket-to-bucket (node, label, count) partials, no O(V) driver
    state, BIT-IDENTICAL labels (integer counts, same winner rule).
    """
    import numpy as np

    import ray
    import ray.data as rd  # noqa: F401

    from .graph import label_prop_bucketed, resolve_plan
    from .ops import distinct_on

    # mode-of-neighbours weights by multiplicity, so the pair set must
    # be globally DISTINCT (reciprocal a->b / b->a links collapse to
    # one undirected pair) — one bounded-bucket dedup exchange
    edges = distinct_on(
        pairs.select_columns(["doc_a", "doc_b"]), ["doc_a", "doc_b"]
    ).materialize()
    if resolve_plan(plan, 2 * edges.count()) == "bucketed":
        return label_prop_bucketed(
            edges, rounds=rounds, num_buckets=num_buckets, label_name="community_id"
        )
    refs = edges.to_arrow_refs()

    def _tbl_of(b):
        return pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b

    @ray.remote
    def block_nodes(b):
        t = _tbl_of(b)
        return np.unique(
            np.concatenate(
                [
                    t["doc_a"].to_numpy(zero_copy_only=False),
                    t["doc_b"].to_numpy(zero_copy_only=False),
                ]
            )
        )

    parts = ray.get([block_nodes.remote(r) for r in refs])
    if not parts or all(p.size == 0 for p in parts):
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "community_id": pa.array([], pa.int64()),
            }
        )
    nodes = np.unique(np.concatenate(parts))
    ids_ref = ray.put(nodes)

    @ray.remote
    def prep_block(b, ids):
        t = _tbl_of(b)
        a = np.searchsorted(ids, t["doc_a"].to_numpy(zero_copy_only=False))
        bb = np.searchsorted(ids, t["doc_b"].to_numpy(zero_copy_only=False))
        return a.astype(np.int64), bb.astype(np.int64)

    prep_refs = [prep_block.remote(r, ids_ref) for r in refs]

    @ray.remote
    def count_prop(prep, lab):
        a, b = prep
        # each undirected pair contributes both directions
        node = np.concatenate([a, b])
        nlab = np.concatenate([lab[b], lab[a]])
        order = np.lexsort((nlab, node))
        on, ol = node[order], nlab[order]
        first = np.ones(on.size, dtype=bool)
        first[1:] = (on[1:] != on[:-1]) | (ol[1:] != ol[:-1])
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, on.size))
        return on[starts], ol[starts], cnt.astype(np.int64)

    labels = nodes.copy()
    for _ in range(rounds):
        lab_ref = ray.put(labels)
        outs = ray.get([count_prop.remote(p, lab_ref) for p in prep_refs])
        node = np.concatenate([o[0] for o in outs])
        nlab = np.concatenate([o[1] for o in outs])
        cnt = np.concatenate([o[2] for o in outs])
        # combine same (node, label) counts across blocks
        order = np.lexsort((nlab, node))
        node, nlab, cnt = node[order], nlab[order], cnt[order]
        first = np.ones(node.size, dtype=bool)
        first[1:] = (node[1:] != node[:-1]) | (nlab[1:] != nlab[:-1])
        starts = np.flatnonzero(first)
        cnt = np.add.reduceat(cnt, starts)
        node, nlab = node[starts], nlab[starts]
        # per-node winner: count desc, label asc
        order = np.lexsort((nlab, -cnt, node))
        node, nlab = node[order], nlab[order]
        first = np.ones(node.size, dtype=bool)
        first[1:] = node[1:] != node[:-1]
        new = labels.copy()
        new[node[first]] = nlab[first]
        if np.array_equal(new, labels):
            break
        labels = new
    return pa.table({"doc_id": pa.array(nodes), "community_id": pa.array(labels)})


def link_jaccard_pairs(
    edges: "rd.Dataset", *, min_common: int = 4, num_buckets: int = 64
) -> "rd.Dataset":
    """Neighbourhood-Jaccard link relatedness: for every co-citation
    pair (>= ``min_common`` shared citing sources), the Jaccard
    similarity of the two pages' IN-neighbour sets —
    ``jaccard_e6 = (1e6 * common) // (indeg_a + indeg_b - common)``
    (exact integer floor, replayed verbatim in SQL). Co-citation
    counts INTERSECTIONS only; normalizing by the union separates
    "popular pages cited everywhere" from "pages with genuinely
    similar citation neighbourhoods" (the SimRank-lite signal).

    Plan: :func:`cocitation_pairs` unchanged (two bounded bucket
    exchanges); in-degrees over globally-DISTINCT edges as a
    DISTRIBUTED (node, indeg) table (per-batch count partials ->
    bounded node-bucket sum — ``triangle_stats``' degree discipline),
    attached to the pair table with two ``packed_join`` exchanges (the
    ``degree_assortativity`` pattern). Nothing node-sized on the
    driver or in a broadcast — the round-3 deg-dict convention removed
    in round 4.
    """
    import numpy as np

    from ..functions.hashing import hash64_array
    from .ops import bucket_mix, distinct_on, packed_join
    from .shuffle import packed_task_groups

    def to_ids(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s": pa.array(hash64_array(t["src_url"].to_pylist())),
                "d": pa.array(hash64_array(t["dst_url"].to_pylist())),
            }
        )

    ids = edges.map_batches(to_ids, batch_format="pyarrow")
    dd = distinct_on(ids, ["s", "d"], num_buckets=num_buckets)

    def deg_partial(t: pa.Table) -> pa.Table:
        uniq, counts = np.unique(t["d"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {
                "node": pa.array(uniq),
                "n": pa.array(counts.astype(np.int64)),
                "nbucket": pa.array(bucket_mix(uniq, num_buckets).astype(np.int64)),
            }
        )

    def deg_of_bucket(group: pa.Table) -> pa.Table:
        return (
            group.select(["node", "n"])
            .group_by("node")
            .aggregate([("n", "sum")])
            .rename_columns(["node", "deg"])
        )

    indeg = packed_task_groups(
        dd.map_batches(deg_partial, batch_format="pyarrow"),
        "nbucket",
        deg_of_bucket,
        num_buckets=num_buckets,
    ).materialize()

    cc = cocitation_pairs(edges, min_common=min_common, num_buckets=num_buckets)
    dega = indeg.map_batches(
        lambda t: t.rename_columns(["doc_a", "indeg_a"]), batch_format="pyarrow"
    )
    degb = indeg.map_batches(
        lambda t: t.rename_columns(["doc_b", "indeg_b"]), batch_format="pyarrow"
    )
    # inner joins never drop a pair: every co-cited page has indeg >= 1
    with_a = packed_join(
        cc, dega, "doc_a",
        left_cols=["doc_b", "n_common_src"], right_cols=["indeg_a"],
        num_buckets=num_buckets,
    )
    with_ab = packed_join(
        with_a, degb, "doc_b",
        left_cols=["doc_a", "n_common_src", "indeg_a"], right_cols=["indeg_b"],
        num_buckets=num_buckets,
    )

    def add_jaccard(t: pa.Table) -> pa.Table:
        n = t["n_common_src"].to_numpy(zero_copy_only=False)
        da = t["indeg_a"].to_numpy(zero_copy_only=False)
        db = t["indeg_b"].to_numpy(zero_copy_only=False)
        j = np.floor_divide(1_000_000 * n, np.maximum(da + db - n, 1))
        return pa.table(
            {
                "doc_a": t["doc_a"],
                "doc_b": t["doc_b"],
                "n_common_src": t["n_common_src"],
                "jaccard_e6": pa.array(j.astype(np.int64)),
            }
        )

    return with_ab.map_batches(add_jaccard, batch_format="pyarrow")


def label_prop_modularity(
    pairs: "rd.Dataset",
    *,
    rounds: int = 5,
    plan: str = "auto",
    num_buckets: "int | None" = None,
) -> pa.Table:
    """Newman modularity of the :func:`label_prop_communities`
    partition — the quality score that says whether the communities
    are real structure or noise. EXACT integer arithmetic end-to-end:

        Q = (4m * intra - sum_c d_c^2) / (4 m^2)

    (m = distinct undirected edges, intra = edges inside a community,
    d_c = total degree of community c), emitted as a floor-division
    micro — replayed in HUGEINT by the SQL twin with the signed floor
    emulation (Q can be negative).

    Plan: the community labels are the node-bounded output of
    label_prop_communities (broadcast once); ONE pass over the
    globally-deduped edge set emits per-block (intra-count, per-node
    degree partials); the driver folds degrees into per-community
    sums. Returns one row (n_nodes, n_edges, n_communities,
    modularity_e6). Above ``graph.graph_bucketed_limit()`` estimated
    nodes (or ``plan="bucketed"`` / env ``WSE_GRAPH_PLAN``) the job
    runs ``stages.graph.modularity_bucketed``: labels stay SHARDED in
    the object store, intra counts via one O(E) label exchange,
    per-community degree sums via a community-keyed second exchange —
    same exact integer result, no driver O(V) anywhere."""
    import numpy as np

    import ray

    from .graph import modularity_bucketed, resolve_plan
    from .ops import distinct_on

    # dedup ONCE up front (both plans need the distinct edge set; the
    # upstream plan — e.g. link extraction — must not re-execute per
    # consumer)
    ded = distinct_on(
        pairs.select_columns(["doc_a", "doc_b"]), ["doc_a", "doc_b"]
    ).materialize()
    if resolve_plan(plan, 2 * ded.count()) == "bucketed":
        return modularity_bucketed(ded, rounds=rounds, num_buckets=num_buckets)

    lab_tbl = label_prop_communities(ded, rounds=rounds)
    nodes = lab_tbl["doc_id"].to_numpy(zero_copy_only=False)
    labs = lab_tbl["community_id"].to_numpy(zero_copy_only=False)
    if nodes.size == 0:
        return pa.table(
            {
                "n_nodes": pa.array([0], pa.int64()),
                "n_edges": pa.array([0], pa.int64()),
                "n_communities": pa.array([0], pa.int64()),
                "modularity_e6": pa.array([0], pa.int64()),
            }
        )
    order = np.argsort(nodes)
    nodes, labs = nodes[order], labs[order]
    nodes_ref = ray.put(nodes)
    labs_ref = ray.put(labs)

    edges = ded

    def block_stats(t: pa.Table) -> pa.Table:
        nd = ray.get(nodes_ref)
        lb = ray.get(labs_ref)
        a = np.searchsorted(nd, t["doc_a"].to_numpy(zero_copy_only=False))
        b = np.searchsorted(nd, t["doc_b"].to_numpy(zero_copy_only=False))
        intra = int((lb[a] == lb[b]).sum())
        deg = np.zeros(nd.size, np.int64)
        np.add.at(deg, a, 1)
        np.add.at(deg, b, 1)
        nz = np.flatnonzero(deg)
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate(([0], np.ones(nz.size, np.int64)))
                ),
                "pos": pa.array(np.concatenate(([intra], nz)).astype(np.int64)),
                "val": pa.array(
                    np.concatenate(([t.num_rows], deg[nz])).astype(np.int64)
                ),
            }
        )

    intra = 0
    m = 0
    deg = np.zeros(nodes.size, np.int64)
    for r in edges.map_batches(block_stats, batch_format="pyarrow").take_all():
        if r["kind"] == 0:
            intra += r["pos"]
            m += r["val"]
        else:
            deg[r["pos"]] += r["val"]
    dc: dict = {}
    for li, d in zip(labs, deg):
        dc[li] = dc.get(li, 0) + int(d)
    sum_dc2 = sum(v * v for v in dc.values())
    q_e6 = (
        (1_000_000 * (4 * m * intra - sum_dc2)) // (4 * m * m) if m else 0
    )
    return pa.table(
        {
            "n_nodes": pa.array([int(nodes.size)], pa.int64()),
            "n_edges": pa.array([int(m)], pa.int64()),
            "n_communities": pa.array([len(set(labs.tolist()))], pa.int64()),
            "modularity_e6": pa.array([int(q_e6)], pa.int64()),
        }
    )


def degree_assortativity(edges: "rd.Dataset", *, num_buckets: int = 64) -> pa.Table:
    """Degree assortativity coefficient of an undirected graph — the
    Pearson correlation of the endpoint degrees over every edge, both
    orientations (Newman 2002, "Assortative mixing in networks").
    Positive r: hubs link to hubs (social graphs); negative r: hubs
    link to leaves (the classic web/crawl signature, so this is the
    one-row structural fingerprint of the link graph the reference
    extracts edges for but never analyzes, ``Crawler.java:405-436``).

    Input: Dataset of DISTINCT undirected edges ``(doc_a < doc_b)``.
    Output: ONE row ``(n_nodes, n_edges, assort_e6)``.

    With both orientations in the sample the x- and y-marginals are
    identical, so r = (M*sxy - sx^2) / (M*sxx - sx^2) with M = 2m,
    sx = sum(deg_a + deg_b), sxx = sum(deg_a^2 + deg_b^2),
    sxy = 2*sum(deg_a*deg_b) — ALL integers, so ``assort_e6`` is one
    exact signed floor division (no float anywhere; the SQL twin uses
    the HUGEINT floor emulation).

    Physical plan: the ``triangle_stats`` degree discipline — per-batch
    partial (node, n) counts, ONE bounded node-bucket exchange, two
    ``packed_join`` degree attaches, then tiny per-batch moment
    partials the driver sums (Python bigints). Nothing driver-side
    grows with nodes or edges.
    """
    import numpy as np
    import ray.data as rd  # noqa: F401  (annotation)

    from .ops import bucket_mix, packed_join
    from .shuffle import packed_task_groups

    edges = edges.materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                batch["doc_a"].to_numpy(zero_copy_only=False),
                batch["doc_b"].to_numpy(zero_copy_only=False),
            ]
        )
        uniq, counts = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "node": pa.array(uniq),
                "n": pa.array(counts.astype(np.int64)),
                "nbucket": pa.array(bucket_mix(uniq, num_buckets).astype(np.int64)),
            }
        )

    def deg_of_bucket(group: pa.Table) -> pa.Table:
        return (
            group.select(["node", "n"])
            .group_by("node")
            .aggregate([("n", "sum")])
            .rename_columns(["node", "deg"])
        )

    degrees = packed_task_groups(
        edges.map_batches(deg_partial, batch_format="pyarrow"),
        "nbucket",
        deg_of_bucket,
        num_buckets=num_buckets,
    ).materialize()

    n_nodes = int(degrees.count())
    n_edges = int(edges.count())

    dega = degrees.map_batches(
        lambda t: t.rename_columns(["doc_a", "deg_a"]), batch_format="pyarrow"
    )
    degb = degrees.map_batches(
        lambda t: t.rename_columns(["doc_b", "deg_b"]), batch_format="pyarrow"
    )
    with_a = packed_join(
        edges, dega, "doc_a", left_cols=["doc_b"], right_cols=["deg_a"],
        num_buckets=num_buckets,
    )
    with_ab = packed_join(
        with_a, degb, "doc_b", left_cols=["doc_a", "deg_a"], right_cols=["deg_b"],
        num_buckets=num_buckets,
    )

    def moment_partial(batch: pa.Table) -> pa.Table:
        da = batch["deg_a"].to_numpy(zero_copy_only=False).astype(object)
        db = batch["deg_b"].to_numpy(zero_copy_only=False).astype(object)
        return pa.table(
            {
                "sx": pa.array([int((da + db).sum())], pa.int64()),
                "sxx": pa.array([int((da * da + db * db).sum())], pa.int64()),
                "sxy": pa.array([int(2 * (da * db).sum())], pa.int64()),
            }
        )

    sx = sxx = sxy = 0
    for r in with_ab.map_batches(moment_partial, batch_format="pyarrow").take_all():
        sx += r["sx"]
        sxx += r["sxx"]
        sxy += r["sxy"]
    mm = 2 * n_edges
    num = 1_000_000 * (mm * sxy - sx * sx)
    den = mm * sxx - sx * sx
    assort_e6 = num // den if den else 0  # Python // == SQL signed floor
    return pa.table(
        {
            "n_nodes": pa.array([n_nodes], pa.int64()),
            "n_edges": pa.array([n_edges], pa.int64()),
            "assort_e6": pa.array([int(assort_e6)], pa.int64()),
        }
    )


def edge_support(
    edges: "rd.Dataset", *, num_buckets: int = 64
) -> "rd.Dataset":
    """Edge EMBEDDEDNESS: for every undirected edge the number of
    triangles through it (= common neighbours of its endpoints) — the
    tie-strength / spam-clique signal (Granovetter: embedded edges are
    strong ties; a link farm's edges are maximally embedded). The
    per-edge refinement of ``triangle_stats``'s census; also the inner
    loop of k-truss peeling (``ktruss_edges``).

    Same degree-oriented plan (Suri & Vassilvitskii): degrees → orient
    low-(deg,id) → high → per-source wedge runs (keeping the wedge
    CENTRE u, which the census combines away) → ONE (v,w)-bucket
    exchange closing wedges against oriented edges — each triangle
    matches exactly once and emits its THREE canonical edges → a
    narrow groupby sums support. Only edges in at least one triangle
    appear."""
    import numpy as np
    import ray.data as rd  # noqa: F401

    from ray.data.aggregate import Sum

    from .ops import bucket_mix, packed_join
    from .shuffle import packed_task_groups

    edges = edges.materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                batch["doc_a"].to_numpy(zero_copy_only=False),
                batch["doc_b"].to_numpy(zero_copy_only=False),
            ]
        )
        uniq, counts = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "node": pa.array(uniq),
                "n": pa.array(counts.astype(np.int64)),
                "nbucket": pa.array(bucket_mix(uniq, num_buckets).astype(np.int64)),
            }
        )

    def deg_of_bucket(group: pa.Table) -> pa.Table:
        return (
            group.select(["node", "n"])
            .group_by("node")
            .aggregate([("n", "sum")])
            .rename_columns(["node", "deg"])
        )

    degrees = packed_task_groups(
        edges.map_batches(deg_partial, batch_format="pyarrow"),
        "nbucket",
        deg_of_bucket,
        num_buckets=num_buckets,
    ).materialize()

    dega = degrees.map_batches(
        lambda t: t.rename_columns(["doc_a", "deg_a"]), batch_format="pyarrow"
    )
    degb = degrees.map_batches(
        lambda t: t.rename_columns(["doc_b", "deg_b"]), batch_format="pyarrow"
    )
    with_a = packed_join(
        edges, dega, "doc_a", left_cols=["doc_b"], right_cols=["deg_a"],
        num_buckets=num_buckets,
    )
    with_ab = packed_join(
        with_a, degb, "doc_b", left_cols=["doc_a", "deg_a"], right_cols=["deg_b"],
        num_buckets=num_buckets,
    )

    def orient(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        da = batch["deg_a"].to_numpy(zero_copy_only=False)
        db = batch["deg_b"].to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        dv = np.where(a_first, db, da)
        return pa.table(
            {
                "u": pa.array(u),
                "v": pa.array(v),
                "dv": pa.array(dv.astype(np.int64)),
                "ubucket": pa.array(bucket_mix(u, num_buckets).astype(np.int64)),
            }
        )

    oriented = with_ab.map_batches(orient, batch_format="pyarrow").materialize()

    def _pb(vv: "np.ndarray", ww: "np.ndarray") -> "np.ndarray":
        return bucket_mix(
            (vv.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)).view(np.int64) ^ ww,
            num_buckets,
        ).astype(np.int64)

    empty_wedges = pa.table(
        {
            "u": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64()),
            "pbucket": pa.array([], pa.int64()),
        }
    )

    def wedge_rows_of_bucket(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m < 2:
            return empty_wedges
        u = group["u"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        dv = group["dv"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, dv, u))
        u_s, v_s = u[order], v[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(u_s)) + 1))
        lens = np.diff(np.concatenate((starts, [m])))
        multi = lens > 1
        starts, lens = starts[multi], lens[multi]
        if starts.size == 0:
            return empty_wedges
        out_u, out_x, out_w = [], [], []
        for run_len in np.unique(lens):
            rs = starts[lens == run_len]
            iu, ju = np.triu_indices(int(run_len), 1)
            src_i = (rs[:, None] + iu[None, :]).ravel()
            src_j = (rs[:, None] + ju[None, :]).ravel()
            out_u.append(u_s[src_i])
            out_x.append(v_s[src_i])
            out_w.append(v_s[src_j])
        vv = np.concatenate(out_x)
        ww = np.concatenate(out_w)
        return pa.table(
            {
                "u": pa.array(np.concatenate(out_u)),
                "v": pa.array(vv),
                "w": pa.array(ww),
                "pbucket": pa.array(_pb(vv, ww)),
            }
        )

    wedge_rows = packed_task_groups(
        oriented, "ubucket", wedge_rows_of_bucket, num_buckets=num_buckets
    )

    def edge_side(batch: pa.Table) -> pa.Table:
        vv = batch["u"].to_numpy(zero_copy_only=False)
        ww = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.full(len(vv), -1, np.int64)),  # edge marker
                "v": batch["u"],
                "w": batch["v"],
                "pbucket": pa.array(_pb(vv, ww)),
            }
        )

    tagged = wedge_rows.union(oriented.map_batches(edge_side, batch_format="pyarrow"))

    empty_attr = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "one": pa.array([], pa.int64()),
        }
    )

    def attribute_of_bucket(group: pa.Table) -> pa.Table:
        # node ids are 63-bit non-negative (functions/hashing.hash64),
        # so u == -1 is an unambiguous edge marker
        wr = group.filter(pc.field("u") >= 0).select(["u", "v", "w"])
        er = group.filter(pc.field("u") < 0).select(["v", "w"])
        if wr.num_rows == 0 or er.num_rows == 0:
            return empty_attr
        closed = wr.join(er, keys=["v", "w"], join_type="inner")
        if closed.num_rows == 0:
            return empty_attr
        u = closed["u"].to_numpy(zero_copy_only=False)
        v = closed["v"].to_numpy(zero_copy_only=False)
        w = closed["w"].to_numpy(zero_copy_only=False)
        # each closed wedge = one triangle {u, v, w}: all three edges
        # ((v, w) is (deg, id)-oriented, not id-ordered — min/max all)
        a = np.concatenate([np.minimum(u, v), np.minimum(u, w), np.minimum(v, w)])
        b = np.concatenate([np.maximum(u, v), np.maximum(u, w), np.maximum(v, w)])
        # local combine before the groupby shuffle
        t = pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b)})
        agg = t.group_by(["doc_a", "doc_b"]).aggregate([([], "count_all")])
        return agg.rename_columns(["doc_a", "doc_b", "one"])

    attrs = packed_task_groups(
        tagged, "pbucket", attribute_of_bucket, num_buckets=num_buckets
    )
    return attrs.groupby(["doc_a", "doc_b"]).aggregate(
        Sum("one", alias_name="support")
    )


def edge_support_topk(
    edges: "rd.Dataset", *, k: int = 20, num_buckets: int = 64
) -> "rd.Dataset":
    """Top-``k`` most embedded edges (``edge_support`` + distributed
    multi-key sort; ties broken (doc_a, doc_b))."""
    return (
        edge_support(edges, num_buckets=num_buckets)
        .sort(["support", "doc_a", "doc_b"], descending=[True, False, False])
        .limit(k)
    )


def ktruss_edges(
    edges: "rd.Dataset", *, k: int = 3, max_rounds: int = 8, num_buckets: int = 64
) -> "rd.Dataset":
    """The k-TRUSS of the undirected graph (Cohen 2008): the maximal
    subgraph in which EVERY edge lies in at least ``k - 2`` triangles
    of the subgraph itself — the standard dense-community / spam-core
    extraction (stricter than k-core: degree can be faked with leaves,
    triangles cannot).

    Iterative peeling, driver-coordinated: each round runs ONE
    distributed ``edge_support`` pass over the surviving edges and
    drops those below ``k - 2``; peeling is monotone, so the loop stops
    at the first round that removes nothing (the driver compares one
    COUNT per round — never edge rows). Output: the truss's edges with
    their within-truss support. ``max_rounds`` bounds the worst case
    (a chain of length-R peels); the registered query's unrolled SQL
    twin replays the same fixed bound, identical results because
    converged rounds are idempotent."""
    import ray.data as rd

    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "support": pa.array([], pa.int64()),
        }
    )
    threshold = k - 2
    cur = edges
    prev_n = cur.count()
    if prev_n == 0:
        return rd.from_arrow(empty)
    for _ in range(max_rounds):
        sup = edge_support(cur, num_buckets=num_buckets).materialize()
        surv = sup.map_batches(
            lambda t: t.filter(pc.greater_equal(t["support"], threshold)),
            batch_format="pyarrow",
        ).materialize()
        n = surv.count()
        if n == 0:
            # a fully-peeled graph: return a SCHEMA-carrying empty set
            # (an empty materialized Dataset drops its schema, which
            # would break the next round's joins)
            return rd.from_arrow(empty)
        cur = surv.map_batches(
            lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow"
        )
        if n == prev_n:
            return surv
        prev_n = n
    return surv
