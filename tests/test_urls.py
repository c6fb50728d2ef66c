"""URL normalization / link extraction goldens (reference semantics:
``tools/URLUtil.java:11-167``, ``crawler/Crawler.java:405-449``; sample
cases mirror the reference's embedded harness, ``URLUtil.java:171-198``)."""

import pyarrow as pa

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.urls import (
    extract_hrefs,
    is_crawlable,
    normalize_seed,
    normalize_url,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
    LinkExtractStage,
    out_degree,
)

BASE = "https://foo.com:443/bar/xyz.html"


def test_normalize_seed():
    assert normalize_seed("Example.COM") == "http://example.com:80/"
    assert normalize_seed("https://Example.com/A/B") == "https://example.com:443/A/B"
    assert normalize_seed("http://example.com:8080/x") == "http://example.com:8080/x"
    assert normalize_seed("ftp://example.com/") is None


def test_normalize_url_fragment_and_relative():
    # fragment-only -> None (link to same page)
    assert normalize_url(BASE, "#abc") is None
    # fragment stripped
    assert normalize_url(BASE, "blah.html#test") == "https://foo.com:443/bar/blah.html"
    # parent traversal via stack
    assert normalize_url(BASE, "../blubb/123.html") == "https://foo.com:443/blubb/123.html"
    assert normalize_url(BASE, "../../../one.html") == "https://foo.com:443/one.html"
    # absolute path
    assert normalize_url(BASE, "/one/two.html") == "https://foo.com:443/one/two.html"
    # absolute url, default port added
    assert normalize_url(BASE, "http://elsewhere.com/path") == "http://elsewhere.com:80/path"
    # scheme-relative
    assert normalize_url(BASE, "//cdn.com/x") == "https://cdn.com:443/x"
    # non-http scheme dropped
    assert normalize_url(BASE, "mailto:x@y.com") is None
    # a relative href whose QUERY embeds a url resolves against the
    # base (regression: "://" substring misclassified it as absolute)
    assert (
        normalize_url(BASE, "/redirect?u=http://x.com")
        == "https://foo.com:443/redirect?u=http://x.com"
    )
    assert (
        normalize_url(BASE, "go?u=https://y.com/z")
        == "https://foo.com:443/bar/go?u=https://y.com/z"
    )


def test_is_crawlable():
    assert is_crawlable("http://a.com:80/x.html")
    assert not is_crawlable("http://a.com/pic.JPG")
    assert not is_crawlable("http://a.com/pic.jpeg")
    assert not is_crawlable("http://a.com/notes.txt")
    assert not is_crawlable("gopher://a.com/x")
    assert is_crawlable("http://a.com/pic.jpg?page=1")  # extension check is on the path


def test_extract_hrefs():
    html = (
        '<p><a href="one.html">one</a> text '
        "<A HREF='two.html'>two</A> "
        '<a name="anchor-no-href">x</a> '
        '<a class="c" href="/three">three</a></p>'
    )
    assert extract_hrefs(html) == ["one.html", "two.html", "/three"]


def test_link_extract_stage_and_out_degree():
    base = "http://site0.example:80/p/a"
    html = (
        '<body><a href="b.html">b</a> <a href="b.html">dup</a> '
        '<a href="img.png">img</a> <a href="../q/c.html">c</a></body>'
    ).encode()
    batch = pa.table(
        {"url": pa.array([base], pa.string()), "html": pa.array([html], pa.binary())}
    )
    edges = LinkExtractStage()(batch)
    assert edges["dst_url"].to_pylist() == [
        "http://site0.example:80/p/b.html",
        "http://site0.example:80/q/c.html",
    ]
    deg = out_degree(edges)
    assert deg.to_pylist() == [{"src_url": base, "out_degree": 2}]


def test_link_extract_on_generated_corpus(ray_session):
    """The synthetic corpus embeds <a href> tags; the stage must produce
    a non-empty, well-formed edge table via the actor-pool path."""
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_parquet,
    )

    pages = rd.read_parquet(pages_parquet(200), columns=["url", "html"])
    edges = pages.map_batches(
        LinkExtractStage, batch_format="pyarrow", batch_size=64, concurrency=2
    )
    t = pa.Table.from_pylist(edges.take(50))
    assert t.num_rows > 0
    for row in t.to_pylist():
        assert row["src_url"].startswith("http://")
        assert is_crawlable(row["dst_url"])


def test_frontier_bfs_depths(ray_session):
    """BFS waves == reference crawler frontier loop: first-reach depth,
    visited dedup, termination on empty frontier."""
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        frontier_bfs,
    )

    edges = pa.table(
        {
            "src_url": pa.array(["a", "a", "b", "c", "d", "x"], pa.string()),
            "dst_url": pa.array(["b", "c", "d", "d", "a", "y"], pa.string()),
        }
    )
    got = frontier_bfs(rd.from_arrow(edges), ["a"], max_depth=5).to_pylist()
    depths = {r["url"]: r["depth"] for r in got}
    # a -> {b,c} -> d -> (a already seen, stop); x/y unreachable
    assert depths == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_lang_gate():
    """Content gate (replaces the crawler's content-type gate,
    Crawler.java:174): keeps only allow-listed lang rows."""
    import pyarrow as pa

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        lang_gate,
    )

    batch = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(5)]),
            "lang": pa.array(["en", "de", "fr", "en", "xx"]),
        }
    )
    out = lang_gate(["en", "de"])(batch)
    assert out["url"].to_pylist() == ["u0", "u1", "u3"]
    assert lang_gate([])(batch).num_rows == 0
    assert lang_gate(["en", "de", "fr", "xx"])(batch).num_rows == 5
