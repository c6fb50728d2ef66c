"""robots.txt parsing + crawl-permission decision — pure functions.

Behavior-level reimplementation of the reference crawler's robots
handling (``crawler/Crawler.java:229-359``), WITHOUT any fetching (this
tier ingests pre-crawled Parquet; the fetch/politeness loop is out of
scope per SURVEY §2.2, but the parser/decider are pure scalar functions
and get the same golden-test treatment as the URL suite):

- rules text is lowercased before parsing (the reference lowercases the
  fetched body, ``Crawler.java:369``);
- lines split on ``[\\r\\n]+``; ``user-agent:`` opens a section,
  ``allow:`` / ``disallow:`` lines append to the CURRENT section in
  file order; everything else (crawl-delay, sitemap, comments) is
  ignored (``Crawler.java:313-359``);
- decision for (user_agent, url): scan the exact user-agent section
  first, then the ``*`` section; the FIRST rule whose path-prefix
  matches wins (allow -> True, disallow -> False); no match -> allowed
  (``Crawler.java:250-307``); empty rules -> allowed.

Documented deviation: the reference matches rule values against
``url.substring(host.length())`` — an off-by-scheme slice of the full
URL string. We match against the url's actual path+query (what the
robots.txt spec prescribes and what the reference's own test fixtures
assume).
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

_LINE_SPLIT = re.compile(r"[\r\n]+")

Rule = tuple[str, str]  # ("allow" | "disallow", path_prefix)


def parse_robots(rules_text: str) -> dict[str, list[Rule]]:
    """robots.txt body -> {user_agent: ordered [(flag, path), ...]}.

    Case-insensitive (the whole body is lowercased, matching the
    reference). Rules appearing before any ``user-agent:`` line are
    dropped (the reference raises there and treats the page as
    disallowed; we keep the parser total and let the decider default).
    """
    out: dict[str, list[Rule]] = {}
    current: str | None = None
    for line in _LINE_SPLIT.split(rules_text.lower()):
        line = line.strip()
        if line.startswith("user-agent"):
            parts = line.split(":", 1)
            if len(parts) < 2:
                continue
            current = parts[1].strip()
            out.setdefault(current, [])
        elif line.startswith(("allow", "disallow")):
            parts = line.split(":", 1)
            if len(parts) < 2 or current is None:
                continue
            flag = parts[0].strip()
            value = parts[1].strip()
            if flag in ("allow", "disallow"):
                out[current].append((flag, value))
    return out


def _url_path(url: str) -> str:
    try:
        p = urlsplit(url)
    except ValueError:
        return "/"
    path = p.path or "/"
    if p.query:
        path += "?" + p.query
    return path


def _decide_section(rules: list[Rule], path: str) -> bool | None:
    """First path-prefix match wins; None = no rule matched."""
    for flag, value in rules:
        if not value.startswith("/"):
            continue  # reference ignores non-path values (Crawler.java:259)
        if path.startswith(value):
            return flag == "allow"
    return None


def is_ok_to_crawl(
    rules_map: dict[str, list[Rule]], user_agent: str, url: str
) -> bool:
    """Crawl-permission decision per the reference's two-pass scan:
    exact user-agent section, then ``*``, default allow."""
    path = _url_path(url)
    ua = user_agent.lower()
    for section in (ua, "*"):
        rules = rules_map.get(section)
        if rules is None:
            continue
        verdict = _decide_section(rules, path)
        if verdict is not None:
            return verdict
    return True


def robots_allows(rules_text: str, user_agent: str, url: str) -> bool:
    """One-shot convenience: parse + decide (empty rules -> allowed,
    matching ``Crawler.java:242-245``)."""
    if not rules_text.strip():
        return True
    return is_ok_to_crawl(parse_robots(rules_text), user_agent, url)
