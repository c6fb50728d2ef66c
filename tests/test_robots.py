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
