"""Inbound anchor-text aggregation (stages/crawl.py:anchor_top_terms):
per target page the dominant anchor term, counts over every anchor
occurrence, canonical tokenization, (n desc, term) tie-break."""

import pyarrow as pa
import ray.data as rd

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.urls import (
    extract_anchor_texts,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
    anchor_top_terms,
)


def _pages(rows):
    return rd.from_arrow(
        pa.table(
            {
                "url": pa.array([u for u, _ in rows], pa.string()),
                "html": pa.array([h.encode() for _, h in rows], pa.binary()),
            }
        )
    )


def test_extract_anchor_texts():
    html = '<p><a href="http://b.example/x">Alpha, beta!</a> and <a href="http://c.example/">gamma</a></p>'
    assert extract_anchor_texts(html) == [
        ("http://b.example/x", "Alpha, beta!"),
        ("http://c.example/", "gamma"),
    ]


def test_anchor_top_terms():
    pages = _pages(
        [
            (
                "http://a.example/",
                '<a href="http://b.example/x">alpha beta</a>'
                '<a href="http://c.example/">alpha</a>',
            ),
            (
                "http://b.example/x",
                '<a href="http://c.example/">beta beta gamma</a>'
                '<a href="mailto:x@y">beta</a>'  # not crawlable: dropped
                '<a href="http://c.example/pic.jpg">beta</a>',  # filtered ext
            ),
        ]
    )
    got = {r["dst_url"]: (r["top_term"], r["top_n"]) for r in anchor_top_terms(pages).take_all()}
    assert got == {
        # tie alpha=1/beta=1 -> lexicographically smallest
        "http://b.example:80/x": ("alpha", 1),
        # alpha 1 (from a) vs beta 2 (from b)
        "http://c.example:80/": ("beta", 2),
    }


def test_anchor_terms_count_every_occurrence():
    # the SAME page linking twice endorses twice (no per-page dedup)
    pages = _pages(
        [
            (
                "http://a.example/",
                '<a href="http://b.example/">zed</a><a href="http://b.example/">zed</a>',
            )
        ]
    )
    rows = anchor_top_terms(pages).take_all()
    assert rows == [{"dst_url": "http://b.example:80/", "top_term": "zed", "top_n": 2}]
