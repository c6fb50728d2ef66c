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


def out_degree(links: "pa.Table") -> pa.Table:
    """Per-page out-degree from a link-edge table (vectorized)."""
    agg = links.group_by("src_url").aggregate([([], "count_all")])
    return pa.table(
        {"src_url": agg["src_url"], "out_degree": agg["count_all"].cast(pa.int64())}
    )
