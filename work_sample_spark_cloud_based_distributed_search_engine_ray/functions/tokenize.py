"""Canonical tokenizer + HTML->text extraction.

The single source of truth for text normalization in the engine. The
SAME functions are used by the index-build pipeline, the query parser,
the brute-force oracle, and the fixture generator — this is what makes
the "byte-identical extracted text per url" invariant and rank-identical
top-k checks possible.

Semantics pinned to the reference engine's only executable definition
(reference ``searchEngine/src/cis5550/search/Searcher.java:39-40``):

    text.replaceAll("\\<[^>]*>", "")      # strip tags
        .replaceAll("\\p{Punct}", " ")    # ASCII punctuation -> space
        .toLowerCase()
        .split("\\s+")                    # whitespace split

Deviation (documented): Java's ``split`` can emit one leading empty
token when the string starts with whitespace; we drop empty tokens
(Python ``str.split()``), since an empty term is meaningless.
"""

from __future__ import annotations

import re

# Java \p{Punct} == ASCII 33-47, 58-64, 91-96, 123-126 exactly.
PUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")
TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.S | re.I)
_BODY_RE = re.compile(r"<body[^>]*>(.*?)</body>", re.S | re.I)

# Minimal entity set the generator may escape; order matters (&amp; last).
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def tokenize(text: str) -> list[str]:
    """Canonical tokenizer (reference ``Searcher.java:39-40`` semantics)."""
    return PUNCT_RE.sub(" ", TAG_RE.sub("", text)).lower().split()


def tokenize_query(query: str) -> list[str]:
    """Query normalization: tokenize then de-duplicate terms.

    The reference de-dups via ``HashSet`` (``Searcher.java:42``) — order
    is irrelevant to the additive scorers; we keep first-seen order for
    determinism.
    """
    seen: set[str] = set()
    out: list[str] = []
    for t in tokenize(query):
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def flat_tokens_batch(texts: "list[str] | object"):
    """Vectorized whole-batch tokenization preserving per-doc token
    ORDER (the counting variant below destroys it).

    Semantically identical to ``tokenize(t)`` per text — the same Arrow
    kernel chain (tag strip, punct->space, lower, whitespace split,
    defensive trim, empty filter) — but one kernel invocation per batch.
    Returns ``(flat: pa.StringArray, parents: np.ndarray[int64],
    n_docs: int)`` where ``flat[parents == i]`` is exactly
    ``tokenize(texts[i])`` in order. Shared by the sketch stages
    (MinHash shingling, SimHash votes, n-gram Jaccard), which need
    ordered tokens, not counts.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(texts, pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_docs = len(arr)
    no_tags = pc.replace_substring_regex(arr, pattern=TAG_RE.pattern, replacement="")
    no_punct = pc.replace_substring_regex(no_tags, pattern=PUNCT_RE.pattern, replacement=" ")
    lowered = pc.utf8_lower(no_punct)
    toks = pc.utf8_split_whitespace(lowered)
    flat_all = pc.list_flatten(toks)
    parents_all = pc.list_parent_indices(toks)
    # defensive trim pass — see tokenize_count_batch for the rationale
    flat_trimmed = pc.utf8_trim_whitespace(flat_all)
    nonempty = pc.not_equal(flat_trimmed, "")
    flat = flat_trimmed.filter(nonempty)
    parents = parents_all.filter(nonempty).to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, parents, n_docs


def tokenize_count_batch(texts: "list[str] | object", return_positions: bool = False):
    """Vectorized per-doc term counting for a whole batch.

    Semantically identical to ``Counter(tokenize(t))`` per text (asserted
    by tests/test_tokenize.py) but runs entirely in Arrow/numpy kernels:
    RE2 tag-strip + punct->space + lower + whitespace split, then one
    ``np.unique`` over (doc, term-code) pairs. This is the hot kernel of
    the extraction actor pool (``stages.extract.ExtractDocs``).

    Returns ``(terms: pa.ListArray[string], tfs: pa.ListArray[int32],
    doc_lens: np.ndarray[int64])``, with each doc's terms in sorted
    term-code order (deterministic; downstream order-insensitive).

    With ``return_positions=True`` (the positional-index build, format
    3) a fourth value is appended: ``positions: pa.ListArray[int32]``,
    one list per DOC holding every term occurrence's token position,
    laid out per-term in the same segment order as (terms, tfs) —
    ``positions[doc][sum(tfs[:j]) : sum(tfs[:j+1])]`` are term ``j``'s
    ascending positions.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(texts, pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_docs = len(arr)
    no_tags = pc.replace_substring_regex(arr, pattern=TAG_RE.pattern, replacement="")
    no_punct = pc.replace_substring_regex(no_tags, pattern=PUNCT_RE.pattern, replacement=" ")
    lowered = pc.utf8_lower(no_punct)
    toks = pc.utf8_split_whitespace(lowered)
    flat_all = pc.list_flatten(toks)
    parents_all = pc.list_parent_indices(toks)
    # Defensive repair pass: intermittent (~1% of calls, allocation-
    # dependent) one-byte token-boundary corruption was observed on this
    # pyarrow (a token carrying its trailing whitespace delimiter, e.g.
    # 'of '). Root cause was never pinned to a minimal repro; since every
    # inter-token byte is whitespace, a trim is the identity on correct
    # tokens and restores a +-1-byte overrun, so the trim stays as a
    # cheap invariant-enforcing pass (regression-tested 200x in
    # tests/test_tokenize.py). The empty-filter runs on trimmed values.
    flat_trimmed = pc.utf8_trim_whitespace(flat_all)
    nonempty = pc.not_equal(flat_trimmed, "")
    flat = flat_trimmed.filter(nonempty)
    parents = parents_all.filter(nonempty).to_numpy(zero_copy_only=False).astype(np.int64)

    d = flat.dictionary_encode()
    vocab = d.dictionary
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nd = max(len(vocab), 1)
    key = parents * nd + codes
    uniq, counts = np.unique(key, return_counts=True)
    parent_of = uniq // nd
    code_of = uniq % nd
    offsets = np.searchsorted(parent_of, np.arange(n_docs + 1)).astype(np.int32)
    terms_list = pa.ListArray.from_arrays(
        pa.array(offsets), vocab.take(pa.array(code_of)) if len(vocab) else pa.array([], pa.string())
    )
    tfs_list = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(counts.astype(np.int32))
    )
    doc_lens = np.bincount(parents, minlength=n_docs).astype(np.int64)
    if not return_positions:
        return terms_list, tfs_list, doc_lens
    # token position within its doc, regrouped (parent, code) with a
    # STABLE sort so each (doc, term) segment stays position-ascending —
    # exactly the (terms, tfs) segment layout
    doc_starts = np.concatenate(([0], np.cumsum(doc_lens)[:-1]))
    pos_in_doc = np.arange(parents.size, dtype=np.int64) - doc_starts[parents]
    order = np.argsort(key, kind="stable")
    pos_offsets = np.concatenate(([0], np.cumsum(doc_lens))).astype(np.int32)
    positions_list = pa.ListArray.from_arrays(
        pa.array(pos_offsets), pa.array(pos_in_doc[order].astype(np.int32))
    )
    return terms_list, tfs_list, doc_lens, positions_list


def _unescape(s: str) -> str:
    for ent, ch in _ENTITIES:
        if ent in s:
            s = s.replace(ent, ch)
    return s


def _clean_fragment(fragment: str) -> str:
    """Strip tags, unescape entities, collapse whitespace runs."""
    return _WS_RE.sub(" ", _unescape(TAG_RE.sub(" ", fragment))).strip()


def extract_html(html: bytes | str) -> tuple[str, str]:
    """Canonical HTML -> (title, body_text) extraction.

    The reference's (absent) Indexer used jsoup (``README.md:16``); its
    output contract — ``urls`` rows with ``title`` and ``body`` columns —
    is recovered from the consumer ``Searcher.java:52-57,186-191``. This
    function IS the engine's pinned extraction: deterministic, pure, and
    shared with the oracle so extraction is byte-identical per url.
    """
    doc = html.decode("utf-8", "replace") if isinstance(html, (bytes, bytearray)) else html
    m = _TITLE_RE.search(doc)
    title = _clean_fragment(m.group(1)) if m else ""
    b = _BODY_RE.search(doc)
    body = b.group(1) if b else _TITLE_RE.sub(" ", doc)
    return title, _clean_fragment(body)
