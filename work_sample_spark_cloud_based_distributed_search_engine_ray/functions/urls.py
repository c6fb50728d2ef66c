"""URL normalization / filtering — the crawler's scalar function suite.

Reimplements (fresh, behavior-level) the reference crawler's URL
handling, whose semantics are documented at
``searchEngine/src/cis5550/tools/URLUtil.java:11-167`` and
``crawler/Crawler.java:440-449``:

- seed normalization: lowercase scheme/host, explicit default port
  (80 http / 443 https), ensure a path (``URLUtil.java:11-49``);
- link normalization against a base url: strip ``#fragment``, resolve
  relative paths (including ``..`` segments via a stack), absolutize,
  add the default port (``URLUtil.java:71-145``);
- crawl filter: keep only http(s) urls and drop common binary/static
  extensions ``.jpg .jpeg .gif .png .txt`` (``Crawler.java:440-449``).

Used by ``stages.crawl`` inside ``map_batches``; these are pure scalar
functions so the oracle/pytest goldens exercise them directly
(mirroring the reference's embedded sample cases, ``URLUtil.java:171-198``).
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

_DROP_EXT = (".jpg", ".jpeg", ".gif", ".png", ".txt")
_HREF_RE = re.compile(r"""<a\s[^>]*?href\s*=\s*["']([^"']*)["']""", re.I)
_ANCHOR_RE = re.compile(r"<a[^>]+>.+?</a>", re.S | re.I)

_DEFAULT_PORT = {"http": 80, "https": 443}


def _split(url: str) -> tuple[str, str, int | None, str] | None:
    """(scheme, host, port, path+query) or None if unparseable."""
    try:
        p = urlsplit(url)
    except ValueError:
        return None
    if not p.scheme or not p.hostname:
        return None
    path = p.path or "/"
    if p.query:
        path += "?" + p.query
    try:
        port = p.port
    except ValueError:
        return None
    return p.scheme.lower(), p.hostname.lower(), port, path


def normalize_seed(url: str) -> str | None:
    """Seed URL -> canonical form: lowercase scheme+host, explicit
    default port, guaranteed path (``URLUtil.java:11-49`` semantics)."""
    if "://" not in url:
        url = "http://" + url
    parts = _split(url)
    if parts is None:
        return None
    scheme, host, port, path = parts
    if scheme not in _DEFAULT_PORT:
        return None
    port = port if port is not None else _DEFAULT_PORT[scheme]
    return f"{scheme}://{host}:{port}{path}"


def _remove_dots(path: str) -> str:
    """Resolve ``.`` / ``..`` path segments with a stack
    (``URLUtil.java:108-145`` semantics; never climbs above root)."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == "." or seg == "":
            continue
        if seg == "..":
            if out:
                out.pop()
        else:
            out.append(seg)
    norm = "/" + "/".join(out)
    if path.endswith("/") and not norm.endswith("/"):
        norm += "/" if norm != "/" else ""
    return norm


def normalize_url(base: str, href: str) -> str | None:
    """Resolve ``href`` against ``base`` -> canonical absolute URL, or
    None if not crawlable. Strips fragments, resolves relative paths,
    lowercases scheme/host, adds the default port
    (``URLUtil.java:71-145`` semantics)."""
    href = href.split("#", 1)[0].strip()
    if not href:
        return None  # pure-fragment link points back at the base page
    # absolute iff the href STARTS with "scheme://" — a relative href
    # whose query merely embeds a URL (e.g. "/redirect?u=http://x")
    # must resolve against the base, not be parsed as absolute
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*):", href)
    if m and not href[m.end() :].startswith("//"):
        return None  # non-hierarchical scheme (mailto:, javascript:, data:)
    if m:
        parts = _split(href)
        if parts is None:
            return None
        scheme, host, port, path = parts
    else:
        b = _split(base)
        if b is None:
            return None
        scheme, host, port, bpath = b
        if href.startswith("//"):
            return normalize_url(base, f"{scheme}:{href}")
        if href.startswith("/"):
            path = href
        else:
            bdir = bpath.split("?", 1)[0]
            bdir = bdir[: bdir.rfind("/") + 1] if "/" in bdir else "/"
            path = bdir + href
    if scheme not in _DEFAULT_PORT:
        return None
    q = ""
    if "?" in path:
        path, q = path.split("?", 1)
        q = "?" + q
    path = _remove_dots(path)
    port = port if port is not None else _DEFAULT_PORT[scheme]
    return f"{scheme}://{host}:{port}{path}{q}"


def is_crawlable(url: str) -> bool:
    """Crawl frontier filter (``Crawler.java:440-449`` semantics):
    http(s) only; drop static/binary extensions. The reference tests the
    suffix of the WHOLE url (not the path), so a ``.jpg?page=1`` url
    passes — preserved as-is."""
    low = url.lower()
    if not (low.startswith("http://") or low.startswith("https://")):
        return False
    return not low.endswith(_DROP_EXT)


def extract_hrefs(html: str) -> list[str]:
    """Anchor-tag href extraction (``Crawler.java:405-436`` +
    ``URLUtil.java:147-167`` semantics: anchors with content, href
    attribute value)."""
    out = []
    for m in _ANCHOR_RE.finditer(html):
        h = _HREF_RE.search(m.group(0))
        if h:
            out.append(h.group(1))
    return out


def extract_anchor_texts(html: str) -> list[tuple[str, str]]:
    """(href, anchor text) pairs — the same anchor elements
    ``extract_hrefs`` matches, plus the element's inner content (the
    bytes between the opening tag and ``</a>``). Anchor text is the
    classic inbound ranking signal the reference's link extractor makes
    available but never consumes (``Crawler.java:405-436``)."""
    out = []
    for m in _ANCHOR_RE.finditer(html):
        el = m.group(0)
        h = _HREF_RE.search(el)
        if h:
            out.append((h.group(1), el[el.find(">") + 1 : -4]))
    return out


# Site-collapse key. The pattern is replayed LITERALLY in the DuckDB
# oracle (__ray_entry__: regexp_extract(url, ..., 1)) — keep in sync.
HOST_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/:?#]+)")


def host_of(url: str) -> str:
    """URL host, lowercased ('' if unparseable) — the result-
    diversification partition key for host-collapsed top-k."""
    m = HOST_RE.match(url)
    return m.group(1).lower() if m else ""
