"""Single-process brute-force oracle of the pinned reference semantics.

The reference ships no tests and no Indexer source (SURVEY §5); the
only executable ranking definition is ``search/Searcher.java``. This
oracle re-implements, in plain Python dicts + numpy (no Ray, no shared
code paths with the distributed pipeline except the canonical
tokenizer/extraction functions — which is the point of the invariant):

- exact content dedup keep-first (``crawler/Crawler.java:178-190``)
- postings accumulation (inferred Indexer contract, SURVEY §2.3)
- the reference tf-idf scorer: ``log10(N/df) * (1 + log10(tf))``,
  threshold > 0.3, top 300 (``Searcher.java:108-198``)
- BM25 with exact df/cf/N/avgdl (primary scorer per north_rule)

pytest asserts the Ray pipeline's shards, stats and top-k are
rank-identical (ids AND scores) to this oracle on the fixture corpus +
reference query set.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash64, sha1_hex
from ..functions.tokenize import extract_html, tokenize, tokenize_query

K1 = 1.2
B = 0.75


class OracleIndex:
    def __init__(self, pages: pa.Table):
        # dedup: winner per content hash = min (warc_ts, url)
        urls = pages["url"].to_pylist()
        htmls = pages["html"].to_pylist()
        ts = pages["warc_ts"].to_numpy(zero_copy_only=False)
        best: dict[str, tuple] = {}
        for i in range(len(urls)):
            h = sha1_hex(htmls[i])
            key = (ts[i], urls[i])
            if h not in best or key < best[h][0]:
                best[h] = (key, i)
        self.canonical_rows = sorted(i for _k, i in best.values())
        self.loser_canonical: dict[int, str] = {}
        for i in range(len(urls)):
            h = sha1_hex(htmls[i])
            if best[h][1] != i:
                self.loser_canonical[hash64(urls[i])] = urls[best[h][1]]

        self.docs: dict[int, dict] = {}
        self.postings: dict[str, dict[int, int]] = {}
        self.doc_tokens: dict[int, list[str]] = {}  # ordered, for phrase oracle
        for i in self.canonical_rows:
            title, text = extract_html(htmls[i])
            toks = tokenize(text)
            counts = Counter(toks)
            did = hash64(urls[i])
            self.doc_tokens[did] = toks
            self.docs[did] = {
                "url": urls[i],
                "title": title,
                "doc_len": sum(counts.values()),
            }
            for term, tf in counts.items():
                self.postings.setdefault(term, {})[did] = tf

        self.N = len(self.docs)
        self.total_len = sum(d["doc_len"] for d in self.docs.values())
        self.avgdl = self.total_len / self.N if self.N else 1.0

    # ---- stats ----

    def term_stats(self) -> dict[str, tuple[int, int]]:
        return {t: (len(p), sum(p.values())) for t, p in self.postings.items()}

    def sorted_postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        p = self.postings.get(term, {})
        ids = np.array(sorted(p), dtype=np.int64)
        tfs = np.array([p[i] for i in ids], dtype=np.int64)
        return ids, tfs

    # ---- scorers ----

    def bm25_topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        scores: dict[int, float] = {}
        for t in tokenize_query(query):
            p = self.postings.get(t)
            if not p:
                continue
            idf = math.log(1.0 + (self.N - len(p) + 0.5) / (len(p) + 0.5))
            for did, tf in p.items():
                dl = self.docs[did]["doc_len"]
                part = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
                scores[did] = scores.get(did, 0.0) + idf * part
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def lm_dirichlet_topk(
        self, query: str, k: int = 10, mu: float = 2000.0
    ) -> list[tuple[int, float]]:
        """Brute-force query-likelihood / Dirichlet-smoothing scorer
        (Zhai & Lafferty 2001), the float-identical twin of
        ``SearchIndex.lm_dirichlet_topk``: per-doc contributions are
        added in the same sorted-distinct-term order, constant term
        last, so scores match bit-for-bit."""
        q_terms = sorted({t for t in tokenize_query(query) if t in self.postings})
        if not q_terms:
            return []
        scores: dict[int, float] = {}
        for t in q_terms:
            p = self.postings[t]
            cf = float(sum(p.values()))
            for did, tf in p.items():
                scores[did] = scores.get(did, 0.0) + math.log(
                    1.0 + (tf * float(self.total_len)) / (mu * cf)
                )
        for did in scores:
            scores[did] += len(q_terms) * math.log(
                mu / (self.docs[did]["doc_len"] + mu)
            )
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def reference_topk(
        self, query: str, k: int = 300, threshold: float = 0.3
    ) -> list[tuple[int, float]]:
        scores: dict[int, float] = {}
        for t in tokenize_query(query):
            p = self.postings.get(t)
            if not p:
                continue  # Searcher.java:79 null-row path
            idf = math.log10(self.N / len(p))
            for did, tf in p.items():
                scores[did] = scores.get(did, 0.0) + idf * (1.0 + math.log10(tf))
        kept = [(d, s) for d, s in scores.items() if s > threshold]
        return sorted(kept, key=lambda kv: (-kv[1], kv[0]))[:k]

    # ---- boolean / phrase (quadratic definitions) ----

    def boolean_and_topk(self, query: str, k: int = 10) -> list[tuple[int, int]]:
        """Docs containing ALL unique query terms, ranked by summed tf
        desc then doc_id asc. Empty if any term is corpus-absent."""
        q_terms = tokenize_query(query)
        if not q_terms or any(t not in self.postings for t in q_terms):
            return []
        doc_sets = [set(self.postings[t]) for t in q_terms]
        cand = set.intersection(*doc_sets)
        scored = [(d, sum(self.postings[t][d] for t in q_terms)) for d in cand]
        return sorted(scored, key=lambda kv: (-kv[1], kv[0]))[:k]

    def phrase_topk(self, phrase: str, k: int = 10) -> list[tuple[int, int]]:
        """Scan EVERY canonical doc's token sequence for the phrase;
        count all (overlapping) start positions."""
        terms = tokenize(phrase)
        if not terms:
            return []
        L = len(terms)
        hits = []
        for did, toks in self.doc_tokens.items():
            c = sum(
                1
                for s in range(len(toks) - L + 1)
                if toks[s : s + L] == terms
            )
            if c:
                hits.append((did, c))
        return sorted(hits, key=lambda kv: (-kv[1], kv[0]))[:k]
