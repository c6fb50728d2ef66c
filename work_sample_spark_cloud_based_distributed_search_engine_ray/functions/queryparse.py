"""Mini query language for the serving tier.

The reference's Searcher accepts only a flat term bag
(``Searcher.java:39-42``); every deployed engine grows the standard
operator surface on top. This parser recognizes, deterministically:

- ``"a quoted phrase"``  -> exact-phrase constraint
- ``-term``              -> exclusion (boolean minus)
- ``site:host``          -> URL-host restriction
- ``intitle:term``       -> title-field restriction
- everything else        -> positive body terms

Parsing is PURE string work (no index access), so it unit-tests
exhaustively; dispatch onto the already-verified retrieval primitives
(``phrase_topk`` / ``bm25_not`` / ``bm25_site_topk`` / ``bm25_topk``)
happens in ``SearchIndex.query_language`` with a documented precedence
and is pytest-asserted score-identical to the primitive it picks.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_PHRASE_RE = re.compile(r'"([^"]*)"')


@dataclass
class ParsedQuery:
    terms: list[str] = field(default_factory=list)
    excluded: list[str] = field(default_factory=list)
    phrases: list[str] = field(default_factory=list)
    site: str | None = None
    intitle: str | None = None


def parse_query(q: str) -> ParsedQuery:
    """Split a raw query string into (terms, excluded, phrases, site).

    Rules (first-wins where ambiguous, all case-preserved — downstream
    tokenization owns normalization):
    - quoted spans become phrases and are removed before token scan;
      an unterminated quote is treated as literal text
    - ``site:`` / ``intitle:`` take the FIRST occurrence; later ones
      are dropped
    - ``-`` marks exclusion only as a token prefix (mid-token dashes
      pass through); a bare ``-`` is ignored
    """
    out = ParsedQuery()
    rest = []
    last = 0
    for m in _PHRASE_RE.finditer(q):
        rest.append(q[last : m.start()])
        if m.group(1).strip():
            out.phrases.append(m.group(1).strip())
        last = m.end()
    rest.append(q[last:])
    for tok in "".join(rest).split():
        low = tok.lower()
        if low.startswith("site:"):
            host = tok[5:].strip().lower()
            if host and out.site is None:
                out.site = host
            continue
        if low.startswith("intitle:"):
            term = tok[8:].strip()
            if term and out.intitle is None:
                out.intitle = term
            continue
        if tok.startswith("-"):
            if len(tok) > 1:
                out.excluded.append(tok[1:])
            continue
        out.terms.append(tok)
    return out
