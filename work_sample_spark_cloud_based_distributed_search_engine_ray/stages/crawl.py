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
) -> pa.Table:
    """Frontier-wave BFS over a link-edge table — the Ray-native analog
    of the reference crawler's loop (``urlQueue = parallelize([seed]);
    while (count != 0) urlQueue = urlQueue.flatMap(crawlOne)``,
    ``crawler/Crawler.java:47-213``): each wave expands the current
    frontier through the edges and drops already-visited urls (the
    ``contentSeen``/frontier-dedup role).

    The frontier is BROADCAST per wave (``ray.put`` once, read by every
    map task) and the expansion is a vectorized ``is_in`` filter + local
    dedup — a frontier is tiny relative to the edge set, so this is the
    broadcast-side of the join, not a shuffle. Returns (url, depth) for
    every reached url, depth = first-reach wave (seeds get depth 0);
    deterministic regardless of partitioning.
    """
    import ray

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


def out_degree(links: "pa.Table") -> pa.Table:
    """Per-page out-degree from a link-edge table (vectorized)."""
    agg = links.group_by("src_url").aggregate([([], "count_all")])
    return pa.table(
        {"src_url": agg["src_url"], "out_degree": agg["count_all"].cast(pa.int64())}
    )
