"""Golden tests for the robots.txt parser/decider
(``crawler/Crawler.java:229-359`` semantics; the two rule fixtures are
the reference's own embedded test strings, ``Crawler.java:234-235``)."""

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.robots import (
    is_ok_to_crawl,
    parse_robots,
    robots_allows,
)

UA = "cis5550-crawler"

# the reference's own (commented-in) fixtures
ALLOW_FIRST = "User-agent: cis5550-crawler\nAllow: /abc\nDisallow: /a\n"
DISALLOW_FIRST = "User-agent: cis5550-crawler\nDisallow: /a\nallow: /abc\n"


def test_parse_sections_and_order():
    m = parse_robots(ALLOW_FIRST)
    assert m == {UA: [("allow", "/abc"), ("disallow", "/a")]}
    m2 = parse_robots(
        "User-Agent: *\r\nDisallow: /private\nCrawl-delay: 10\nSitemap: /s.xml\n"
        "User-agent: other\nDisallow: /\n"
    )
    assert m2 == {"*": [("disallow", "/private")], "other": [("disallow", "/")]}


def test_first_match_wins():
    # allow-first: /abc... allowed even though /a would disallow it
    assert robots_allows(ALLOW_FIRST, UA, "http://h:80/abcdef")
    assert not robots_allows(ALLOW_FIRST, UA, "http://h:80/ab")
    assert robots_allows(ALLOW_FIRST, UA, "http://h:80/b")
    # disallow-first: the /a rule shadows allow /abc
    assert not robots_allows(DISALLOW_FIRST, UA, "http://h:80/abcdef")


def test_agent_section_precedence_over_star():
    rules = (
        "User-agent: *\nDisallow: /\n"
        "User-agent: cis5550-crawler\nAllow: /public\nDisallow: /\n"
    )
    assert robots_allows(rules, UA, "http://h:80/public/page")
    assert not robots_allows(rules, UA, "http://h:80/secret")
    # unknown agent falls through to *
    assert not robots_allows(rules, "otherbot", "http://h:80/public/page")


def test_defaults_and_edges():
    assert robots_allows("", UA, "http://h:80/x")  # no rules -> allowed
    assert robots_allows("   \n  ", UA, "http://h:80/x")
    # no matching rule in any section -> allowed
    assert robots_allows("User-agent: *\nDisallow: /adm\n", UA, "http://h:80/pub")
    # query string participates in the prefix match
    assert not robots_allows(
        "User-agent: *\nDisallow: /p?page=\n", UA, "http://h:80/p?page=2"
    )
    # rules before any user-agent line are dropped, not fatal
    assert robots_allows("Disallow: /\nUser-agent: *\nAllow: /\n", UA, "http://h:80/a")
    # non-path rule values are ignored (Crawler.java:259)
    assert robots_allows("User-agent: *\nDisallow: http://h/x\n", UA, "http://h:80/x")


def test_decider_is_case_insensitive_on_agent():
    m = parse_robots("USER-AGENT: MyBot\nDISALLOW: /x\n")
    assert not is_ok_to_crawl(m, "MyBot", "http://h:80/x/y")
    assert is_ok_to_crawl(m, "MyBot", "http://h:80/y")


def test_robots_gate_stage_matches_pure_decision():
    # the actor-pool stage's per-host cached decisions == the one-shot
    # pure parse+decide for every url
    import numpy as np
    import pyarrow as pa

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.robots import (
        robots_allows,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        ROBOTS_AGENT,
        RobotsGateStage,
        synth_robots,
    )

    urls = [
        f"http://site{s}.example/p/{n:08d}"
        for s in range(12)
        for n in (5, 72, 272, 901, 1234, 4321, 7777)
    ]
    batch = pa.table({"url": pa.array(urls, pa.string())})
    out = RobotsGateStage()(batch)
    got = out["n_allowed"].to_numpy(zero_copy_only=False).astype(bool)
    want = np.array(
        [
            robots_allows(
                synth_robots(f"site{s}.example"), ROBOTS_AGENT, u
            )
            for s, u in zip([s for s in range(12) for _ in range(7)], urls)
        ]
    )
    assert (got == want).all()
    assert got.any() and (~got).any()  # both outcomes occur


def test_synth_robots_exercises_sections_and_order():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        synth_robots,
    )

    bodies = [synth_robots(f"site{s}.example") for s in range(30)]
    # a third of hosts get an exact-agent override section
    assert any("cis5550-crawler" in b for b in bodies)
    assert any("cis5550-crawler" not in b for b in bodies)
    # two rule depths -> first-match-wins ordering is load-bearing
    assert all(b.count(": /p/0000") == 2 for b in bodies)


def test_politeness_schedule_partitioning_invariant(ray_session):
    # one fetch per host per second; ranks dense per host; invariant
    # under input partitioning (host buckets keyed by stable hash64)
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_parquet,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        politeness_schedule,
    )

    pp = pages_parquet(300)
    a = (
        politeness_schedule(rd.read_parquet(pp, columns=["url"]))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        politeness_schedule(rd.read_parquet(pp, columns=["url"]).repartition(7))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    for _host, grp in a.groupby("host"):
        slots = sorted(grp["slot"])
        assert slots == list(range(len(slots)))  # dense 0..n-1 per host
    assert (a["fetch_at_s"] == a["slot"]).all()
