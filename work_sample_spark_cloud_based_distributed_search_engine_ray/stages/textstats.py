"""Text analysis stages: token stats, language ID, quality scoring,
document fingerprinting.

These are the training-data-pipeline operators layered on the engine's
canonical tokenizer (``functions/tokenize.py``, pinned to the reference
``search/Searcher.java:39-40`` normalization). Each stage is a callable
class for ``map_batches`` actor pools — stopword tables / compiled
regexes built once per actor in ``__init__``, per-batch work in
``__call__``; output schemas are flat Arrow tables.

Semantics are deliberately SQL-expressible (single divisions of integer
counts, md5 over the canonical token join) so the driver's DuckDB oracle
can value-hash-match them exactly — see ``__ray_entry__.oracle_sql``.

Scale: tokenization and all counting run as Arrow kernels over the
whole batch (RE2 + dictionary-encode + bincount); distinct-token work
(stopword membership, blake2b hashing) is VOCAB-bounded, not
token-bounded. The only per-doc Python is the C-speed md5/rolling
digest calls and the BPE-ish regex (lookahead not in RE2). No shuffle
in any of these stages — they are embarrassingly parallel map_batches
over column-pruned reads.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.tokenize import tokenize
from ..sources.pages import DE_STOP, EN_STOP, FR_STOP

# BPE-ish token counting: GPT-2-style pretokenizer regex (public,
# openai/gpt-2 encoder.py) simplified to what this container's `re`
# supports — contractions, letter runs, digit runs, punct runs, spaces.
import re

BPEISH_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)


class TextStatsStage:
    """pages/documents batches -> per-doc token statistics.

    Output: doc_id, n_tokens, n_unique_tokens, mean_token_len,
    en_hits/de_hits/fr_hits (stopword votes), lang_pred, n_chars,
    punct_chars, stopword_ratio, is_quality, fp_md5, fp_rolling,
    n_bpe_tokens.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        from ..functions.sketches import hash_tokens_u64, rolling_fingerprint_from_hashes

        self.text_col = text_col
        self.id_col = id_col
        self.stop_arrays = {
            "en": pa.array(EN_STOP, pa.string()),
            "de": pa.array(DE_STOP, pa.string()),
            "fr": pa.array(FR_STOP, pa.string()),
        }
        self.punct_pattern = r"[!-/:-@\[-`{-~]"
        self._hash_tokens = hash_tokens_u64
        self._rolling = rolling_fingerprint_from_hashes

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.tokenize import PUNCT_RE, TAG_RE

        texts_arr = batch[self.text_col].combine_chunks() if isinstance(
            batch[self.text_col], pa.ChunkedArray
        ) else batch[self.text_col]
        n = len(texts_arr)

        # canonical tokenization as one Arrow kernel chain (identical to
        # functions.tokenize.tokenize per doc — asserted by tests),
        # including the defensive trim-repair pass (see
        # functions/tokenize.py:tokenize_count_batch for the rationale)
        no_tags = pc.replace_substring_regex(texts_arr, pattern=TAG_RE.pattern, replacement="")
        no_punct = pc.replace_substring_regex(no_tags, pattern=PUNCT_RE.pattern, replacement=" ")
        lowered = pc.utf8_lower(no_punct)
        tok_lists = pc.utf8_split_whitespace(lowered)
        flat_all = pc.list_flatten(tok_lists)
        parents_all = pc.list_parent_indices(tok_lists)
        flat_trimmed = pc.utf8_trim_whitespace(flat_all)
        nonempty = pc.not_equal(flat_trimmed, "")
        flat = flat_trimmed.filter(nonempty)
        parents = parents_all.filter(nonempty).to_numpy(zero_copy_only=False).astype(np.int64)

        n_tokens = np.bincount(parents, minlength=n).astype(np.int64)
        tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        sum_tok_len = np.bincount(parents, weights=tok_lens, minlength=n).astype(np.int64)

        # distinct-token work is VOCAB-bounded: dictionary-encode once,
        # then per-distinct stopword membership / blake2b hashing map
        # back through the code array
        d = flat.dictionary_encode()
        vocab = d.dictionary
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nd = max(len(vocab), 1)
        uniq_keys = np.unique(parents * nd + codes)
        n_unique = np.bincount(uniq_keys // nd, minlength=n).astype(np.int64)

        hits = {}
        for lang, stop in self.stop_arrays.items():
            vocab_hit = (
                pc.is_in(vocab, value_set=stop).to_numpy(zero_copy_only=False)
                if len(vocab)
                else np.zeros(0, bool)
            )
            hits[lang] = np.bincount(
                parents, weights=vocab_hit[codes].astype(np.float64), minlength=n
            ).astype(np.int64)

        n_chars = pc.utf8_length(texts_arr).to_numpy(zero_copy_only=False).astype(np.int64)
        punct_chars = (
            pc.count_substring_regex(texts_arr, self.punct_pattern)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )

        # per-doc canonical-token join for the md5 fingerprint (the
        # md5/rolling loops below are per-DOC C-speed digests; the
        # per-TOKEN work above is all kernels)
        offsets = np.searchsorted(parents, np.arange(n + 1)).astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), flat), " "
        ).to_pylist()
        fp_md5 = [hashlib.md5(j.encode()).hexdigest() for j in joined]

        vocab_hash = self._hash_tokens(vocab.to_pylist()) if len(vocab) else np.empty(0, np.uint64)
        th_flat = vocab_hash[codes]
        fp_roll = np.zeros(n, np.uint64)
        for i in range(n):
            seg = th_flat[offsets[i] : offsets[i + 1]]
            if seg.size:
                fp_roll[i] = np.uint64(self._rolling(seg))

        texts = texts_arr.to_pylist()
        n_bpe = np.fromiter(
            (len(BPEISH_RE.findall(t)) for t in texts), dtype=np.int64, count=n
        )

        en, de, fr = hits["en"], hits["de"], hits["fr"]
        # argmax vote with fixed tie-break order en > de > fr — matches
        # the CASE ladder in the SQL oracle exactly
        lang_pred = np.where(
            (en >= de) & (en >= fr), "en", np.where(de >= fr, "de", "fr")
        )
        safe_n = np.maximum(n_tokens, 1)
        mean_len = sum_tok_len.astype(np.float64) / safe_n.astype(np.float64)
        stop_ratio = en.astype(np.float64) / safe_n.astype(np.float64)
        is_quality = (n_tokens >= 20) & (stop_ratio >= 0.05) & (mean_len <= 12.0)

        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "n_tokens": pa.array(n_tokens),
                "n_unique_tokens": pa.array(n_unique),
                "mean_token_len": pa.array(mean_len),
                "en_hits": pa.array(en),
                "de_hits": pa.array(de),
                "fr_hits": pa.array(fr),
                "lang_pred": pa.array(lang_pred.tolist(), pa.string()),
                "n_chars": pa.array(n_chars),
                "punct_chars": pa.array(punct_chars),
                "stopword_ratio": pa.array(stop_ratio),
                "is_quality": pa.array(is_quality.tolist(), pa.bool_()),
                "fp_md5": pa.array(fp_md5, pa.string()),
                "fp_rolling": pa.array(fp_roll.astype(np.int64)),
                "n_bpe_tokens": pa.array(n_bpe),
            }
        )


def repetition_stats(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", App. A quality heuristics), word-level —
    the corpus text is single-line so line-based variants are vacuous:

    - ``top_bigram_count`` / ``n_bigrams``: occurrences of the MOST
      frequent adjacent token pair vs total adjacent pairs (high ratio =
      boilerplate/SEO spinner text).
    - ``dup_trigram_occurrences`` / ``n_trigrams``: occurrences beyond
      the first of each distinct trigram (the "duplicate n-gram
      fraction" numerator).

    All integers (ratios left to the consumer), so the SQL twin
    hash-matches exactly. Fully vectorized: one batch tokenize, one
    lexsort per n-gram order, run-length counts, per-doc segment
    reductions — no per-doc Python. Shuffle-free map_batches stage."""
    import pyarrow.compute as pc

    from ..functions.tokenize import flat_tokens_batch

    flat, parents, n_docs = flat_tokens_batch(batch[text_col])
    codes = flat.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
    doc_lens = np.bincount(parents, minlength=n_docs).astype(np.int64)

    def ngram_group_counts(n: int):
        """(doc_of_distinct_ngram, count) arrays + per-doc totals for
        order-n adjacent grams, via one stable multi-key sort."""
        if codes.size < n:
            e = np.empty(0, np.int64)
            return e, e, np.zeros(n_docs, np.int64)
        same_doc = np.ones(codes.size - n + 1, dtype=bool)
        for k in range(1, n):
            same_doc &= parents[k : codes.size - n + 1 + k] == parents[: codes.size - n + 1]
        keys = [codes[k : codes.size - n + 1 + k][same_doc] for k in range(n)]
        p = parents[: codes.size - n + 1][same_doc]
        if p.size == 0:
            e = np.empty(0, np.int64)
            return e, e, np.zeros(n_docs, np.int64)
        order = np.lexsort(tuple(reversed(keys)) + (p,))
        cols = [p[order]] + [k[order] for k in keys]
        new = np.zeros(p.size, dtype=bool)
        new[0] = True
        for c in cols:
            new[1:] |= c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, p.size))
        totals = np.bincount(p, minlength=n_docs).astype(np.int64)
        return cols[0][starts], counts, totals

    bi_doc, bi_counts, bi_tot = ngram_group_counts(2)
    tri_doc, tri_counts, tri_tot = ngram_group_counts(3)

    top_bi = np.zeros(n_docs, np.int64)
    if bi_doc.size:
        np.maximum.at(top_bi, bi_doc, bi_counts)
    dup_tri = tri_tot - np.bincount(tri_doc, minlength=n_docs).astype(np.int64)

    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(doc_lens),
            "n_bigrams": pa.array(bi_tot),
            "top_bigram_count": pa.array(top_bi),
            "n_trigrams": pa.array(tri_tot),
            "dup_trigram_occurrences": pa.array(dup_tri),
        }
    )


def token_counts_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial UNIGRAM counts — the map-side combine of the
    corpus language-model pass: the shuffle that follows carries one row
    per distinct term per batch, not per occurrence (the same combine
    discipline as ``bigram_counts_partial``)."""
    from ..functions.tokenize import flat_tokens_batch

    flat, _parents, _n = flat_tokens_batch(batch[text_col])
    d = flat.dictionary_encode()
    counts = np.bincount(
        d.indices.to_numpy(zero_copy_only=False), minlength=len(d.dictionary)
    )
    return pa.table(
        {
            "term": d.dictionary,
            "n_occ": pa.array(counts.astype(np.int64)),
        }
    )


def unigram_loglik(docs, text_col: str = "text", id_col: str = "doc_id"):
    """CCNet-style unigram LM document scoring (Wenzek et al. 2019,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data" — their quality filter is a KenLM perplexity; the unigram LM
    is the shuffle-light corpus-side analog): train token->log10 prob on
    the corpus itself, then score every doc's total surprisal.

    Output: doc_id, n_tokens, sum_logprob_e6 (sum over the doc's tokens
    of round(log10(cf_t / total_tokens) * 1e6) — the per-TOKEN weight is
    integer-quantized BEFORE the per-doc sum, so the sum is exact int64
    arithmetic and the DuckDB twin hash-matches regardless of float
    summation order). Zero-token docs are dropped (no LM score exists).

    Physical plan: map-side unigram combine -> vocab-bounded
    ``groupby(term).sum`` -> the (term, weight) table broadcast ONCE via
    ``ray.put`` -> shuffle-free scoring pass (``index_in`` against the
    broadcast vocab + one ``add.reduceat`` per batch). At 100-TB scale
    the vocab table gets a min-count floor / top-K cap with an OOV
    fallback weight (the standard LM smoothing move); here the corpus
    vocab is Zipf-bounded and ships whole.
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    counts = (
        docs.map_batches(
            lambda t: token_counts_partial(t, text_col=text_col),
            batch_format="pyarrow",
        )
        .groupby("term")
        .aggregate(Sum("n_occ", alias_name="n_occ"))
    )
    vocab_tbl = pa.concat_tables(ray.get(counts.to_arrow_refs())).combine_chunks()
    c = vocab_tbl["n_occ"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(c.sum())
    # per-term weight quantized to integer micros: round-half-even vs
    # SQL round-half-away only differ AT an exact .5 boundary, which a
    # log10 of a rational hits with probability ~0 (see oracle note)
    w6 = np.rint(np.log10(c.astype(np.float64) / float(total)) * 1e6).astype(np.int64)
    vocab_ref = ray.put((vocab_tbl["term"].combine_chunks(), w6))

    def score(batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import flat_tokens_batch

        vocab, weights = ray.get(vocab_ref)
        flat, parents, n_docs = flat_tokens_batch(batch[text_col])
        doc_lens = np.bincount(parents, minlength=n_docs).astype(np.int64)
        idx = pc.fill_null(pc.index_in(flat, value_set=vocab), -1).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        # corpus-trained vocab covers every corpus token; guard anyway
        # (OOV scores as the rarest class: count 1)
        oov = np.int64(np.rint(np.log10(1.0 / float(total)) * 1e6))
        w_tok = np.where(idx < 0, oov, weights[np.clip(idx, 0, None)])
        sums = np.zeros(n_docs, np.int64)
        if parents.size:
            starts = np.flatnonzero(np.diff(parents, prepend=-1))
            present = parents[starts]
            sums[present] = np.add.reduceat(w_tok, starts)
        keep = doc_lens > 0
        return pa.table(
            {
                id_col: pc.array_filter(batch[id_col], pa.array(keep)),
                "n_tokens": pa.array(doc_lens[keep]),
                "sum_logprob_e6": pa.array(sums[keep]),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")



def bigram_counts_partial(
    batch: pa.Table, text_col: str = "text"
) -> pa.Table:
    """Per-batch within-doc adjacent-bigram counts (map-side combine of
    ``bigram_loglik``): one flat tokenize, one boundary mask, one Arrow
    two-column group_by — no Python loop."""
    from ..functions.tokenize import flat_tokens_batch

    flat, parents, _n = flat_tokens_batch(batch[text_col])
    if len(flat) < 2:
        return pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "n_occ": pa.array([], pa.int64()),
            }
        )
    same = parents[1:] == parents[:-1]
    m = pa.array(same)
    pairs = pa.table(
        {
            "w1": flat.slice(0, len(flat) - 1).filter(m),
            "w2": flat.slice(1).filter(m),
        }
    )
    agg = pairs.group_by(["w1", "w2"]).aggregate([([], "count_all")])
    return pa.table(
        {
            "w1": agg["w1"],
            "w2": agg["w2"],
            "n_occ": agg["count_all"].cast(pa.int64()),
        }
    )


def bigram_loglik(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Bigram-LM document scoring — the KenLM-flavored upgrade of
    ``unigram_loglik`` (same CCNet framing, one order higher): train
    p(w2|w1) = c(w1,w2) / c_left(w1) on the corpus's within-doc
    adjacent pairs, then score every doc's transition surprisal.

    Output: doc_id, n_bigrams, sum_logprob_e6 (sum over the doc's
    transitions of round(log10(c(w1,w2)/c_left(w1)) * 1e6)); per-
    transition weights are integer-quantized BEFORE the per-doc sum so
    the sum is exact int64 and the DuckDB twin hash-matches regardless
    of summation order. Docs with < 2 tokens drop (no transition).

    Physical plan mirrors the unigram stage: map-side bigram combine ->
    bigram-vocab-bounded ``groupby(w1,w2).sum`` (left totals derive
    from the same table — no second aggregation) -> ONE broadcast of
    (term vocab, int64 bigram key id1*V+id2, weight) -> shuffle-free
    scoring pass (two ``index_in`` + one add.reduceat per batch). At
    100-TB scale the bigram table needs a count floor / top-K cap with
    a backoff weight (standard LM pruning); here it is corpus-bounded.
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    counts = (
        docs.map_batches(
            lambda t: bigram_counts_partial(t, text_col=text_col),
            batch_format="pyarrow",
        )
        .groupby(["w1", "w2"])
        .aggregate(Sum("n_occ", alias_name="n_occ"))
    )
    bi = pa.concat_tables(ray.get(counts.to_arrow_refs())).combine_chunks()
    c = bi["n_occ"].to_numpy(zero_copy_only=False).astype(np.int64)
    # term vocabulary = every word participating in any bigram
    vocab = pc.unique(
        pa.chunked_array([bi["w1"].combine_chunks(), bi["w2"].combine_chunks()])
    )
    V = np.int64(len(vocab))
    i1 = pc.index_in(bi["w1"], value_set=vocab).to_numpy(zero_copy_only=False).astype(np.int64)
    i2 = pc.index_in(bi["w2"], value_set=vocab).to_numpy(zero_copy_only=False).astype(np.int64)
    left = np.zeros(int(V), np.int64)
    np.add.at(left, i1, c)
    w6 = np.rint(
        np.log10(c.astype(np.float64) / left[i1].astype(np.float64)) * 1e6
    ).astype(np.int64)
    keys = i1 * V + i2
    order = np.argsort(keys, kind="stable")
    model_ref = ray.put((vocab, keys[order], w6[order], int(V)))

    def score(batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import flat_tokens_batch

        vocab, keys, w6, V = ray.get(model_ref)
        flat, parents, n_docs = flat_tokens_batch(batch[text_col])
        out_n = np.zeros(n_docs, np.int64)
        out_s = np.zeros(n_docs, np.int64)
        if len(flat) >= 2:
            idx = pc.fill_null(pc.index_in(flat, value_set=vocab), -1).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            same = parents[1:] == parents[:-1]
            a, b = idx[:-1][same], idx[1:][same]
            par = parents[:-1][same]
            k = a * np.int64(V) + b
            pos = np.searchsorted(keys, k)
            pos = np.clip(pos, 0, len(keys) - 1)
            hit = (keys[pos] == k) & (a >= 0) & (b >= 0)
            # trained on this corpus: every transition is in the model;
            # an OOV transition (foreign scoring input) scores as the
            # rarest class c=1 against its left count, approximated by
            # log10(1/total transitions)
            oov = np.int64(np.rint(np.log10(1.0 / float(max(1, c.sum()))) * 1e6))
            w_tr = np.where(hit, w6[pos], oov)
            out_n = np.bincount(par, minlength=n_docs).astype(np.int64)
            if par.size:
                starts = np.flatnonzero(np.diff(par, prepend=-1))
                present = par[starts]
                out_s[present] = np.add.reduceat(w_tr, starts)
        keep = out_n > 0
        return pa.table(
            {
                id_col: pc.array_filter(batch[id_col], pa.array(keep)),
                "n_bigrams": pa.array(out_n[keep]),
                "sum_logprob_e6": pa.array(out_s[keep]),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PII detection / redaction — the standard pre-training scrub pass
# (emails, phone numbers, IPv4 addresses), RE2-only patterns so the
# pyarrow kernels and the DuckDB oracle compile the IDENTICAL regex.
# The reference has no PII handling (its corpus is course test hosts);
# this is one of the training-data extensions the brief asks for.
# ---------------------------------------------------------------------------

PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IP_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


def inject_pii(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Deterministically append synthetic PII to a corpus slice (the
    synthetic word-salad corpus contains none) so the scrub stage has
    ground truth: email on doc_id % 2 == 0, phone on % 3 == 0, IPv4 on
    % 5 == 0 — all derived from doc_id alone, replayed verbatim by the
    SQL oracle's CASE/lpad expressions. Fully vectorized (casts, lpad,
    element-wise joins, if_else)."""
    import pyarrow.compute as pc

    ids = batch[id_col]
    s = pc.cast(ids, pa.string())

    def mod_str(m: int) -> pa.Array:
        return pc.cast(
            pc.subtract(ids, pc.multiply(pc.divide(ids, m), m)), pa.string()
        )

    empty = pa.array([""] * len(batch), pa.string())
    email = pc.binary_join_element_wise(
        " contact user", s, "@mail", mod_str(7), ".example.com", ""
    )
    phone = pc.binary_join_element_wise(
        " call 555-",
        pc.utf8_lpad(mod_str(1000), 3, "0"),
        "-",
        pc.utf8_lpad(mod_str(10000), 4, "0"),
        "",
    )
    ip = pc.binary_join_element_wise(
        " host 10.", mod_str(256), ".0.", mod_str(100), ""
    )

    def gate(m: int, suffix) -> pa.Array:
        want = pc.equal(pc.subtract(ids, pc.multiply(pc.divide(ids, m), m)), 0)
        return pc.if_else(want, suffix, empty)

    aug = pc.binary_join_element_wise(
        batch[text_col], gate(2, email), gate(3, phone), gate(5, ip), ""
    )
    return batch.set_column(batch.schema.get_field_index(text_col), text_col, aug)


def pii_scrub(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Per-doc PII counts + redacted-text digest. Counts run each
    pattern over the ORIGINAL text (independent, non-overlapping RE2
    matches, same rule as DuckDB ``regexp_extract_all``); redaction
    applies email -> phone -> IPv4 in that fixed order (nested
    ``regexp_replace(..., 'g')`` in the oracle). Shuffle-free
    map_batches stage; the only per-doc Python is the C-speed md5 of
    the redacted text (the fp_md5 discipline)."""
    import pyarrow.compute as pc

    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()

    def count(pat: str) -> pa.Array:
        return pc.cast(pc.count_substring_regex(text, pattern=pat), pa.int64())

    clean = pc.replace_substring_regex(text, pattern=PII_EMAIL_RE, replacement="<EMAIL>")
    clean = pc.replace_substring_regex(clean, pattern=PII_PHONE_RE, replacement="<PHONE>")
    clean = pc.replace_substring_regex(clean, pattern=PII_IP_RE, replacement="<IP>")
    clean_md5 = [hashlib.md5(s.encode()).hexdigest() for s in clean.to_pylist()]

    return pa.table(
        {
            id_col: batch[id_col],
            "n_emails": count(PII_EMAIL_RE),
            "n_phones": count(PII_PHONE_RE),
            "n_ips": count(PII_IP_RE),
            "clean_md5": pa.array(clean_md5, pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# Spell correction against the corpus vocabulary — the classic
# did-you-mean query assist (the reference has no query rewriting; a
# misspelled term simply contributes nothing, Searcher.java:77-79).
# ---------------------------------------------------------------------------


def _levenshtein_to_all(q: str, mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Unit-cost edit distance from ``q`` to EVERY padded row of the
    (n_terms, max_len) codepoint matrix at once — the DP advances all
    vocabulary terms in lockstep (numpy rows), O(max_len * len(q))
    vectorized steps instead of one Python DP per term."""
    n, L = mat.shape
    qa = np.frombuffer(q.encode("utf-32-le"), np.uint32)
    m = qa.size
    prev = np.tile(np.arange(m + 1, dtype=np.int32), (n, 1))
    result = np.full(n, m, dtype=np.int32)  # rows with len 0
    for i in range(1, L + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ci = mat[:, i - 1]
        for j in range(1, m + 1):
            sub = prev[:, j - 1] + (ci != qa[j - 1])
            cur[:, j] = np.minimum(np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1), sub)
        done = lens == i
        if done.any():
            result[done] = cur[done, m]
        prev = cur
    return result


def spell_correct(docs, *, n_queries: int = 5, text_col: str = "text"):
    """Did-you-mean over the corpus vocabulary: derive ``n_queries``
    deterministic misspellings (drop the 2nd character of the top-cf
    terms of length >= 4, ties by term), then correct each against the
    FULL vocabulary by minimum edit distance (ties by term) — the exact
    rule the DuckDB twin replays with ``levenshtein`` + window rank.

    Physical plan: the vocabulary is the distributed part (map-side
    unigram combine -> groupby sum — vocab-bounded, same as the LM
    pass); the DP is one vectorized all-terms pass per query over the
    materialized vocab. At web scale the candidate set is pruned by
    length band and first character before the DP (standard trick);
    the corpus vocab here ships whole.

    Returns (q, corrected, dist) — one row per misspelling.
    """
    import ray
    from ray.data.aggregate import Sum

    counts = (
        docs.map_batches(
            lambda t: token_counts_partial(t, text_col=text_col),
            batch_format="pyarrow",
        )
        .groupby("term")
        .aggregate(Sum("n_occ", alias_name="n_occ"))
    )
    vocab_tbl = pa.concat_tables(ray.get(counts.to_arrow_refs())).combine_chunks()
    terms = np.array(vocab_tbl["term"].to_pylist(), dtype=object)
    cf = vocab_tbl["n_occ"].to_numpy(zero_copy_only=False).astype(np.int64)

    lens = np.array([len(t) for t in terms], dtype=np.int64)
    elig = lens >= 4
    order = np.lexsort((terms[elig], -cf[elig]))[:n_queries]
    queries = [t[0] + t[2:] for t in terms[elig][order]]

    L = int(lens.max()) if lens.size else 0
    mat = np.zeros((len(terms), L), dtype=np.uint32)
    for i, t in enumerate(terms):
        mat[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), np.uint32)

    out_q, out_c, out_d = [], [], []
    for q in queries:
        dist = _levenshtein_to_all(q, mat, lens)
        best = np.lexsort((terms, dist))[0]
        out_q.append(q)
        out_c.append(terms[best])
        out_d.append(int(dist[best]))
    return pa.table(
        {
            "q": pa.array(out_q, pa.string()),
            "corrected": pa.array(out_c, pa.string()),
            "dist": pa.array(out_d, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Keyword extraction — top-k tf-idf terms per document (document tagging;
# idf formula log10(N/df) pinned to the reference scorer,
# search/Searcher.java:113).
# ---------------------------------------------------------------------------


def doc_df_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial document frequencies: (term, df) counting each
    doc at most once — docs never split across batches, so summing the
    partials downstream is exact. Map-side combine of the idf pass."""
    from ..functions.tokenize import flat_tokens_batch

    flat, parents, _n = flat_tokens_batch(batch[text_col])
    if len(flat) == 0:
        return pa.table(
            {
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
            }
        )
    d = flat.dictionary_encode()
    nd = max(len(d.dictionary), 1)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    pairs = np.unique(parents * nd + codes)
    df = np.bincount(pairs % nd, minlength=nd).astype(np.int64)
    n_docs_with_tokens = np.int64(np.unique(parents).size)
    # n_docs rides the first row (summed downstream like df)
    marker = np.zeros(nd, np.int64)
    marker[0] = n_docs_with_tokens
    return pa.table(
        {"term": d.dictionary, "df": pa.array(df), "n_docs": pa.array(marker)}
    )


def keyword_extract(docs, *, k: int = 3, text_col: str = "text", id_col: str = "doc_id"):
    """Top-k tf-idf keywords per document: score(term, doc) =
    tf * idf_e6 where idf_e6 = round(log10(N / df) * 1e6) is quantized
    PER TERM before the multiply — every per-doc score is exact int64,
    so the DuckDB twin hash-matches with no float-order caveat at all.
    Ties break (score desc, term asc); N = docs with >= 1 token.

    Physical plan: map-side df combine -> vocab-bounded groupby sum ->
    (term, idf_e6) broadcast via ``ray.put`` -> shuffle-free per-doc
    scoring pass (one unique over (doc, code) pairs + one lexsort per
    batch — no per-doc Python). Output (doc_id, term, rank, tfidf_e6).
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    agg = (
        docs.map_batches(
            lambda t: doc_df_partial(t, text_col=text_col), batch_format="pyarrow"
        )
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("n_docs", alias_name="n_docs"))
    )
    vocab_tbl = pa.concat_tables(ray.get(agg.to_arrow_refs())).combine_chunks()
    df = vocab_tbl["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_total = int(vocab_tbl["n_docs"].to_numpy(zero_copy_only=False).sum())
    idf_e6 = np.rint(
        np.log10(float(n_total) / df.astype(np.float64)) * 1e6
    ).astype(np.int64)
    weights_ref = ray.put((vocab_tbl["term"].combine_chunks(), idf_e6))

    def score(batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import flat_tokens_batch

        vocab, idf6 = ray.get(weights_ref)
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "rank": pa.array([], pa.int64()),
                "tfidf_e6": pa.array([], pa.int64()),
            }
        )
        flat, parents, _n = flat_tokens_batch(batch[text_col])
        if len(flat) == 0:
            return empty
        codes = pc.fill_null(pc.index_in(flat, value_set=vocab), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        nd = max(len(vocab), 1)
        pairs, tf = np.unique(parents * nd + codes, return_counts=True)
        p_doc = pairs // nd
        p_code = pairs % nd
        sc = tf.astype(np.int64) * idf6[p_code]
        # lexicographic term tie-break via the SORTED vocab's rank
        term_rank = np.empty(nd, np.int64)
        vs = pc.array_sort_indices(vocab).to_numpy(zero_copy_only=False)
        term_rank[vs] = np.arange(nd)
        order = np.lexsort((term_rank[p_code], -sc, p_doc))
        pos = np.arange(order.size) - np.searchsorted(
            p_doc[order], p_doc[order], side="left"
        )
        keep = order[pos < k]
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(doc_ids[p_doc[keep]].astype(np.int64)),
                "term": vocab.take(pa.array(p_code[keep])),
                "rank": pa.array(pos[pos < k] + 1),
                "tfidf_e6": pa.array(sc[keep]),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def more_like_this(
    docs,
    *,
    n_seeds: int = 8,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Related-document retrieval ("more like this"): for each of the
    ``n_seeds`` lowest-``id_col`` documents, the top-``k`` most similar
    other documents by tf-idf cosine. The classic search-engine
    "similar pages" feature the reference's raw ranked serving lacks.

    Arithmetic contract (what makes the DuckDB twin hash-match): term
    weight w = tf * idf_e3 with idf_e3 = round(log10(N/df) * 1e3)
    quantized PER TERM — every dot product and squared norm is an exact
    int64 sum (overflow envelope: |w| <= tf_max * 12e3, safe while
    sum(tf^2) * 1.5e8 < 2^63, i.e. any realistic document), and
    cosine_e6 = round(dot / sqrt(n2_seed * n2_doc) * 1e6) is one
    deterministic double op on exact ints. Ties (cosine_e6 desc,
    doc_id asc).

    Physical plan: map-side df combine -> vocab-bounded groupby (the
    idf table) -> ONE bounded filtered pass collecting the seed rows ->
    seed vectors broadcast via ``ray.put`` -> shuffle-free scoring pass
    (each doc's dot against every seed in one np.add.at, its norm in
    the same kernel — docs never split across batches so per-batch
    results are exact and final) -> bounded ``topn_per_group`` merge.
    Nothing shuffles rows proportional to corpus * vocab; the only
    all-to-all is the (seed, candidate) top-k at <= n_seeds * k rows
    per block.
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from ..functions.tokenize import flat_tokens_batch
    from .ops import topn_per_group

    # idf over the whole corpus (same pass keyword_extract uses)
    agg = (
        docs.map_batches(
            lambda t: doc_df_partial(t, text_col=text_col), batch_format="pyarrow"
        )
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("n_docs", alias_name="n_docs"))
    )
    vocab_tbl = pa.concat_tables(ray.get(agg.to_arrow_refs())).combine_chunks()
    df = vocab_tbl["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_total = int(vocab_tbl["n_docs"].to_numpy(zero_copy_only=False).sum())
    idf_e3 = np.rint(
        np.log10(float(n_total) / df.astype(np.float64)) * 1e3
    ).astype(np.int64)
    vocab = vocab_tbl["term"].combine_chunks()

    # seed selection: n_seeds lowest doc_ids WITH at least one token
    seed_rows = (
        docs.map_batches(
            lambda t: _nonempty_prefix(t, text_col, id_col, n_seeds),
            batch_format="pyarrow",
        )
        .sort(id_col)
        .limit(n_seeds)
        .take_all()
    )
    seed_ids = np.array([r[id_col] for r in seed_rows], np.int64)
    n_s = len(seed_ids)

    # seed vectors over the seed-term sub-vocabulary
    sflat, sparents, _ = flat_tokens_batch(pa.array([r[text_col] for r in seed_rows]))
    scodes = pc.index_in(sflat, value_set=vocab).to_numpy(zero_copy_only=False).astype(np.int64)
    sub_codes = np.unique(scodes)
    code_to_sub = {int(c): i for i, c in enumerate(sub_codes)}
    seed_w = np.zeros((n_s, len(sub_codes)), np.int64)
    pairs, tfs = np.unique(sparents * len(vocab) + scodes, return_counts=True)
    seed_w[pairs // len(vocab), [code_to_sub[int(c)] for c in pairs % len(vocab)]] = (
        tfs.astype(np.int64) * idf_e3[pairs % len(vocab)]
    )
    seed_n2 = (seed_w.astype(np.float64) ** 2).sum(axis=1)  # exact: < 2^53 envelope

    bcast = ray.put((vocab, idf_e3, seed_ids, sub_codes, seed_w))

    def score(batch: pa.Table) -> pa.Table:
        vocab_b, idf3, sids, subc, sw = ray.get(bcast)
        empty = pa.table(
            {
                "seed_id": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "cosine_e6": pa.array([], pa.int64()),
            }
        )
        flat, parents, n_rows = flat_tokens_batch(batch[text_col])
        if len(flat) == 0:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = pc.fill_null(pc.index_in(flat, value_set=vocab_b), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        nd = max(len(vocab_b), 1)
        pairs_b, tf = np.unique(parents * nd + codes, return_counts=True)
        p_doc = (pairs_b // nd).astype(np.int64)
        p_code = (pairs_b % nd).astype(np.int64)
        w = tf.astype(np.int64) * idf3[p_code]
        n2 = np.zeros(n_rows, np.int64)
        np.add.at(n2, p_doc, w * w)
        sub_pos = np.searchsorted(subc, p_code)
        sub_pos = np.clip(sub_pos, 0, len(subc) - 1)
        in_sub = subc[sub_pos] == p_code
        dots = np.zeros((n_rows, sw.shape[0]), np.int64)
        np.add.at(dots, p_doc[in_sub], w[in_sub, None] * sw[:, sub_pos[in_sub]].T)
        # candidates: every (doc, seed) with a nonzero dot, minus self
        di, si = np.nonzero(dots)
        if di.size == 0:
            return empty
        keep = ids[di] != sids[si]
        di, si = di[keep], si[keep]
        cos = np.rint(
            dots[di, si].astype(np.float64)
            / np.sqrt(n2[di].astype(np.float64) * seed_n2[si])
            * 1e6
        ).astype(np.int64)
        return pa.table(
            {
                "seed_id": pa.array(sids[si]),
                id_col: pa.array(ids[di]),
                "cosine_e6": pa.array(cos),
            }
        )

    scored = docs.map_batches(score, batch_format="pyarrow")
    return topn_per_group(
        scored,
        "seed_id",
        k,
        [("cosine_e6", "descending"), (id_col, "ascending")],
        num_buckets=max(1, min(16, n_seeds)),
    )


def _nonempty_prefix(t: pa.Table, text_col: str, id_col: str, n: int) -> pa.Table:
    """Map-side combine of the seed scan: each block contributes only
    its n lowest-id rows that tokenize to >= 1 token."""
    import pyarrow.compute as pc

    from ..functions.tokenize import flat_tokens_batch

    _flat, parents, _n = flat_tokens_batch(t[text_col])
    nonempty = np.zeros(t.num_rows, bool)
    nonempty[np.unique(parents)] = True
    sub = t.select([id_col, text_col]).filter(pa.array(nonempty))
    idx = pc.sort_indices(sub, sort_keys=[(id_col, "ascending")])[:n]
    return sub.take(idx)


class _QualityScoreStage(TextStatsStage):
    """TextStatsStage narrowed to the per-language quality-score
    projection: (doc_id, lang, score_e6) with score_e6 =
    (1_000_000 * en_stopword_hits) // n_tokens — exact integer, so the
    downstream decile assignment replays bit-for-bit in SQL. Rows with
    zero tokens are dropped (no defined score). ``lang`` is the
    ground-truth column of the input table, passed through aligned
    (the stats stage emits one row per input row in order)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 lang_col: str = "lang"):
        super().__init__(text_col=text_col, id_col=id_col)
        self.lang_col = lang_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        stats = super().__call__(batch)
        n_tok = stats["n_tokens"].to_numpy(zero_copy_only=False)
        en = stats["en_hits"].to_numpy(zero_copy_only=False)
        score = (1_000_000 * en.astype(np.int64)) // np.maximum(n_tok, 1)
        t = pa.table(
            {
                self.id_col: stats[self.id_col],
                self.lang_col: batch[self.lang_col],
                "score_e6": pa.array(score),
            }
        )
        return t.filter(pa.array(n_tok > 0))


def quality_percentile(
    docs, *, concurrency: int = 4, text_col: str = "text", id_col: str = "doc_id"
):
    """Per-language quality-score DECILE assignment — the "filter the
    bottom X% within each language" primitive of training-data
    curation (per-language quality buckets, CCNet-style).

    Contract (exact integers end-to-end): score_e6 =
    (1_000_000 * en_stopword_hits) // n_tokens per doc with >= 1
    token; within each language, n_smaller = #same-language docs with
    STRICTLY smaller score (= SQL ``rank() - 1``) and decile =
    (10 * n_smaller) // n_lang in 0..9.

    Physical plan: the stats actor pool emits a NARROW (doc_id, lang,
    score_e6) projection, materialized once (~24 B/doc) so the
    histogram and scoring passes don't recompute the stats stage; the
    per-(lang, score) histogram combines map-side per batch, one
    associative groupby sums the partials, and only the CUMULATIVE
    per-language histogram lives on the driver — bounded by the e6
    score domain (<= 1e6 + 1 distinct scores per language), NOT by
    corpus size — broadcast via ``ray.put`` into a final shuffle-free
    decile pass."""
    import ray
    from ray.data.aggregate import Sum

    narrow = docs.map_batches(
        _QualityScoreStage,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    ).materialize()

    def partial_counts(t: pa.Table) -> pa.Table:
        c = t.group_by(["lang", "score_e6"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": c["lang"],
                "score_e6": c["score_e6"],
                "n": c["count_all"].cast(pa.int64()),
            }
        )

    hist_rows = (
        narrow.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["lang", "score_e6"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    cum: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
    by_lang: dict[str, list[tuple[int, int]]] = {}
    for r in hist_rows:
        by_lang.setdefault(r["lang"], []).append((r["score_e6"], r["n"]))
    for lang, pairs in by_lang.items():
        pairs.sort()
        scores = np.array([p[0] for p in pairs], dtype=np.int64)
        counts = np.array([p[1] for p in pairs], dtype=np.int64)
        # n_smaller of a doc with score s = total count of scores < s
        smaller = np.concatenate(([0], np.cumsum(counts)[:-1]))
        cum[lang] = (scores, smaller, int(counts.sum()))
    cum_ref = ray.put(cum)

    def assign(t: pa.Table) -> pa.Table:
        table = ray.get(cum_ref)
        langs = t["lang"].to_pylist()
        scores = t["score_e6"].to_numpy(zero_copy_only=False)
        n_smaller = np.empty(t.num_rows, dtype=np.int64)
        n_lang = np.empty(t.num_rows, dtype=np.int64)
        idx = np.arange(t.num_rows)
        import itertools

        for lang, grp in itertools.groupby(
            sorted(idx, key=lambda i: langs[i]), key=lambda i: langs[i]
        ):
            rows = np.fromiter(grp, dtype=np.int64)
            sc, smaller, total = table[lang]
            pos = np.searchsorted(sc, scores[rows])
            n_smaller[rows] = smaller[pos]
            n_lang[rows] = total
        decile = (10 * n_smaller) // np.maximum(n_lang, 1)
        return pa.table(
            {
                id_col: t[id_col],
                "lang": t["lang"],
                "score_e6": t["score_e6"],
                "decile": pa.array(decile),
            }
        )

    return narrow.map_batches(assign, batch_format="pyarrow")


def cms_term_counts(
    docs,
    *,
    depth: int = 4,
    width: int = 512,
    text_col: str = "text",
):
    """Count-min sketch corpus term frequencies + the exact/estimate
    comparison table — the mergeable frequency sketch (Cormode &
    Muthukrishnan 2005) that answers "how often does term X occur?"
    in O(depth) ints per query at ANY corpus size.

    Physical plan (all counts are associative partials, so this is one
    combiner tree): each batch tokenizes once, combines to (term, tf)
    locally, hashes each DISTINCT term into its ``depth`` cells
    (``hash64(f"{j}:{term}")`` — md5-based, so the SQL twin recomputes
    the very same cells natively), and emits non-empty (cell_id,
    count) partials; ONE vocab-independent groupby of at most
    depth x width groups sums the sketch; exact per-term totals ride
    the same tokenize pass through a vocab-bounded term groupby. The
    estimate for every distinct corpus term is the min over its cells
    — computed from the (tiny, bounded) final sketch on the driver.
    Output: (term, exact_tf, est_tf) with est_tf >= exact_tf always
    (one-sided error), est - exact <= eps * total with prob 1-delta
    for width = e/eps, depth = ln(1/delta).

    100-TB shape: the sketch is depth x width ints REGARDLESS of
    corpus size (here 4x512); partials merge by addition inside the
    groupby, and the only vocab-dependent shuffle is the exact-count
    side (which a pure-sketch deployment drops)."""
    import ray.data as rd  # noqa: F401
    from ray.data.aggregate import Sum

    from ..functions.hashing import hash64
    from ..functions.tokenize import tokenize_count_batch

    def _term_tf(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        terms, tfs, _ = tokenize_count_batch(batch[text_col])
        tnp = terms.flatten().to_numpy(zero_copy_only=False)
        fnp = tfs.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(tnp, return_inverse=True)
        sums = np.zeros(uniq.size, np.int64)
        np.add.at(sums, inv, fnp)
        return uniq, sums

    # two passes over the same column-pruned read, each computing ONLY
    # its own partial: the sketch pass pays the cell hashing, the exact
    # pass just the (term, tf) combine
    def sketch_part(batch: pa.Table) -> pa.Table:
        uniq, sums = _term_tf(batch)
        cell_ids: list[int] = []
        counts: list[int] = []
        for j in range(depth):
            cells = np.fromiter(
                (hash64(f"{j}:{t}") % width for t in uniq), np.int64, uniq.size
            )
            agg = np.zeros(width, np.int64)
            np.add.at(agg, cells, sums)
            nz = np.flatnonzero(agg)
            cell_ids.extend((j * width + nz).tolist())
            counts.extend(agg[nz].tolist())
        return pa.table(
            {
                "cell": pa.array(cell_ids, pa.int64()),
                "cnt": pa.array(counts, pa.int64()),
            }
        )

    def term_part(batch: pa.Table) -> pa.Table:
        uniq, sums = _term_tf(batch)
        return pa.table(
            {"term": pa.array(uniq.tolist(), pa.string()), "tf": pa.array(sums)}
        )

    sketch_rows = (
        docs.map_batches(sketch_part, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    sketch = np.zeros(depth * width, np.int64)
    for r in sketch_rows:
        sketch[r["cell"]] = r["cnt"]

    exact = (
        docs.map_batches(term_part, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("tf", alias_name="exact_tf"))
        .take_all()
    )
    terms = sorted(r["term"] for r in exact)
    exact_by = {r["term"]: r["exact_tf"] for r in exact}
    est = [
        min(int(sketch[j * width + hash64(f"{j}:{t}") % width]) for j in range(depth))
        for t in terms
    ]
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "exact_tf": pa.array([exact_by[t] for t in terms], pa.int64()),
            "est_tf": pa.array(est, pa.int64()),
        }
    )


def _top_vocab(docs, vocab_size: int) -> list:
    """The shared bounded-vocab rule: top-``vocab_size`` corpus terms
    by (occurrence count desc, term asc), returned SORTED — one
    map-side token-count combine + one vocab-cardinality groupby."""
    from ray.data.aggregate import Sum

    from .ops import topn_per_group

    cf = (
        docs.map_batches(token_counts_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n_occ", alias_name="cf"))
    )
    tagged = cf.map_batches(
        lambda t: t.append_column("g", pa.array(np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow",
    )
    top = topn_per_group(
        tagged, "g", vocab_size, [("cf", "descending"), ("term", "ascending")]
    ).take_all()
    return sorted(r["term"] for r in top)


def windowed_cooccurrence(
    docs, *, vocab_size: int = 50, window: int = 2, text_col: str = "text"
):
    """Windowed term co-occurrence counts over a BOUNDED vocabulary —
    the GloVe/word2vec-style embedding-training input: for the corpus's
    top-``vocab_size`` terms by occurrence count, how often does each
    unordered pair appear within ``window`` token positions (original
    positions — intervening out-of-vocabulary tokens still consume
    distance)?

    Physical plan, two streaming passes over a materialized input:

    1. vocab — ``token_counts_partial`` map-side combine, one
       vocab-cardinality groupby, top-``vocab_size`` by (cf desc,
       term asc).
    2. counting — per batch ONE flat tokenize; terms map to vocab codes
       with a single ``index_in`` (codes are lexicographic because the
       vocab array is sorted, so unordered pairs are min/max on codes);
       for each offset d in 1..window one vectorized mask + one
       ``np.add.at`` into a dense (V x V) per-batch matrix — the
       map-side combine, so the final exchange carries <= V^2 rows per
       block into a bounded groupby.

    Output Dataset: (term_a, term_b, n_cooc), term_a <= term_b.
    """
    from ray.data.aggregate import Sum

    docs = docs.materialize()
    vocab = _top_vocab(docs, vocab_size)
    vocab_arr = pa.array(vocab, pa.string())
    V = len(vocab)

    empty = pa.table(
        {
            "term_a": pa.array([], pa.string()),
            "term_b": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def pairs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.tokenize import flat_tokens_batch

        if V == 0:
            return empty
        flat, parents, _n = flat_tokens_batch(batch[text_col])
        codes = (
            pc.fill_null(pc.index_in(flat, value_set=vocab_arr), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if codes.size < 2:
            return empty
        m = np.zeros(V * V, np.int64)
        for d in range(1, window + 1):
            if codes.size <= d:
                break
            a0, b0 = codes[:-d], codes[d:]
            ok = (parents[:-d] == parents[d:]) & (a0 >= 0) & (b0 >= 0)
            lo = np.minimum(a0[ok], b0[ok])
            hi = np.maximum(a0[ok], b0[ok])
            np.add.at(m, lo * V + hi, 1)
        nz = np.flatnonzero(m)
        if nz.size == 0:
            return empty
        return pa.table(
            {
                "term_a": vocab_arr.take(pa.array(nz // V)),
                "term_b": vocab_arr.take(pa.array(nz % V)),
                "n": pa.array(m[nz]),
            }
        )

    return (
        docs.map_batches(pairs, batch_format="pyarrow")
        .groupby(["term_a", "term_b"])
        .aggregate(Sum("n", alias_name="n_cooc"))
    )


def naive_bayes_lang(
    docs, *, vocab_size: int = 200, text_col: str = "text", label_col: str = "lang"
):
    """Multinomial naive-Bayes language classification — the
    train-then-infer pipeline shape (fastText-style lang-ID, one order
    simpler): train per-language term likelihoods over the corpus's
    top-``vocab_size`` terms with Laplace smoothing, then score every
    doc and emit the argmax language.

    Exactness discipline (the ``unigram_loglik`` rule): every
    log-likelihood and log-prior is e6-quantized BEFORE the per-doc
    sum, so scores are exact int64 and the SQL twin replays the
    identical floats one weight at a time. Tie-break: higher score,
    then lexicographic language.

    Physical plan: vocab pass (map-side unigram combine -> bounded
    groupby -> top-V), training pass (per-batch (label, code) count
    partials via one index_in + np.add.at -> <= langs x V rows per
    block folded on the driver), inference pass (broadcast weight
    matrix, one index_in + per-language segmented np.add.at per batch
    — shuffle-free). Output: (doc_id, lang_nb, nb_score_e6).
    """
    import math

    from ray.data.aggregate import Count, Sum

    from .ops import topn_per_group

    docs = docs.materialize()
    cf = (
        docs.map_batches(
            lambda b: token_counts_partial(b, text_col), batch_format="pyarrow"
        )
        .groupby("term")
        .aggregate(Sum("n_occ", alias_name="cf"))
    )
    tagged = cf.map_batches(
        lambda t: t.append_column("g", pa.array(np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow",
    )
    top = topn_per_group(
        tagged, "g", vocab_size, [("cf", "descending"), ("term", "ascending")]
    ).take_all()
    vocab = sorted(r["term"] for r in top)
    vocab_arr = pa.array(vocab, pa.string())
    V = len(vocab)

    pri_rows = docs.groupby(label_col).aggregate(Count(alias_name="nd")).take_all()
    langs = sorted(r[label_col] for r in pri_rows)
    nd = {r[label_col]: r["nd"] for r in pri_rows}
    n_total = sum(nd.values())
    L = len(langs)

    def train_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.tokenize import flat_tokens_batch

        flat, parents, _n = flat_tokens_batch(batch[text_col])
        codes = (
            pc.fill_null(pc.index_in(flat, value_set=vocab_arr), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        lab = batch[label_col].to_pylist()
        lcode = np.array([langs.index(x) for x in lab], np.int64)[parents]
        ok = codes >= 0
        m = np.zeros(L * V, np.int64)
        np.add.at(m, lcode[ok] * V + codes[ok], 1)
        nz = np.flatnonzero(m)
        return pa.table(
            {
                "lc": pa.array(nz // V),
                "tc": pa.array(nz % V),
                "n": pa.array(m[nz]),
            }
        )

    counts = np.zeros((L, V), np.int64)
    for r in docs.map_batches(train_partial, batch_format="pyarrow").take_all():
        counts[r["lc"], r["tc"]] += r["n"]

    tot = counts.sum(axis=1)
    w = np.zeros((L, V), np.int64)
    for li in range(L):
        for vi in range(V):
            w[li, vi] = int(
                round(1_000_000 * math.log((counts[li, vi] + 1.0) / (int(tot[li]) + V)))
            )
    prior = np.array(
        [
            int(round(1_000_000 * math.log(float(nd[lg]) / n_total)))
            for lg in langs
        ],
        np.int64,
    )
    langs_arr = pa.array(langs, pa.string())

    def infer(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.tokenize import flat_tokens_batch

        n = batch.num_rows
        flat, parents, _nd = flat_tokens_batch(batch[text_col])
        codes = (
            pc.fill_null(pc.index_in(flat, value_set=vocab_arr), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ok = codes >= 0
        p_ok, c_ok = parents[ok], codes[ok]
        scores = np.tile(prior, (n, 1))
        for li in range(L):
            np.add.at(scores[:, li], p_ok, w[li, c_ok])
        best = np.argmax(scores, axis=1)  # ties -> lowest index == lex lang
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_nb": langs_arr.take(pa.array(best.astype(np.int64))),
                "nb_score_e6": pa.array(scores[np.arange(n), best]),
            }
        )

    return docs.map_batches(infer, batch_format="pyarrow")


def textrank_keywords(
    docs,
    *,
    vocab_size: int = 50,
    window: int = 2,
    iters: int = 10,
    text_col: str = "text",
) -> pa.Table:
    """TextRank keyword scoring (Mihalcea & Tarau 2004): damped power
    iteration over the :func:`windowed_cooccurrence` graph of the
    corpus's top-``vocab_size`` terms — the unsupervised keyword
    extractor (corpus-level variant: one graph for the whole corpus,
    the bounded-vocab exception).

    EXACT integer arithmetic so every iteration replays bit-for-bit in
    SQL (the kmeans/pagerank oracle discipline): transition weights
    quantize ONCE as wq(u->v) = (1e6 * n_cooc) // W(u); ranks start at
    1e6 micros and update as

        r'(v) = 150000 + (85 * sum_u (wq(u,v) * r(u)) // 1e6) // 100

    — every floor division explicit, all intermediates < 2^63 for
    vocab_size <= ~1e3 (per-edge product <= 1e6 * V * 1e6). Self-loop
    co-occurrences are dropped (a term cannot endorse itself); isolated
    vocab terms settle at the 150000 teleport floor.

    Distribution: the expensive part — the corpus scan into windowed
    pair counts — is the existing two-pass streaming plan; the graph
    itself is vocab-bounded (V^2 rows max) so the iteration is exact
    driver numpy. Returns (term, rank_e6) for the whole vocab.
    """
    docs = docs.materialize()
    cooc = windowed_cooccurrence(
        docs, vocab_size=vocab_size, window=window, text_col=text_col
    ).take_all()
    # vocab terms that never co-occur still belong to the node set
    vocab = _top_vocab(docs, vocab_size)
    idx = {t: i for i, t in enumerate(vocab)}
    V = len(vocab)
    if V == 0:
        return pa.table(
            {"term": pa.array([], pa.string()), "rank_e6": pa.array([], pa.int64())}
        )

    us, vs, nw = [], [], []
    for r in cooc:
        if r["term_a"] == r["term_b"]:
            continue
        a, b = idx[r["term_a"]], idx[r["term_b"]]
        us += [a, b]
        vs += [b, a]
        nw += [r["n_cooc"], r["n_cooc"]]
    u = np.asarray(us, np.int64)
    v = np.asarray(vs, np.int64)
    w = np.asarray(nw, np.int64)
    wsum = np.zeros(V, np.int64)
    np.add.at(wsum, u, w)
    wq = np.floor_divide(1_000_000 * w, np.maximum(wsum[u], 1))
    rank = np.full(V, 1_000_000, np.int64)
    for _ in range(iters):
        contrib = np.zeros(V, np.int64)
        np.add.at(contrib, v, np.floor_divide(wq * rank[u], 1_000_000))
        rank = 150_000 + np.floor_divide(85 * contrib, 100)
    return pa.table(
        {"term": pa.array(vocab, pa.string()), "rank_e6": pa.array(rank)}
    )


class LangEvalStage(TextStatsStage):
    """Language-ID quality evaluation: per input row, the stopword-vote
    prediction (the :class:`TextStatsStage` rule, computed by the
    parent kernel) paired with the corpus's ``lang`` label — the
    confusion-matrix input (the classifier-eval analog of
    ``knn_lsh_recall``). Row-aligned: the parent emits one output row
    per input row in order."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = super().__call__(batch)
        return pa.table(
            {"lang": batch["lang"], "lang_pred": out["lang_pred"]}
        )


def doc_hash_features(docs, *, dim: int = 8, text_col: str = "text"):
    """Hashed token-count document features (the hashing trick,
    Weinberger et al. 2009): feature d = number of token OCCURRENCES
    whose hash64 lands in bin d — the cheap text vectorization that
    feeds :func:`..ann.kmeans_assign` for TOPIC CLUSTERING (mixture
    balancing) without an embedding model.

    Vectorized per batch: one flat tokenize, one hash per DISTINCT
    token (dictionary encode), one ``np.add.at`` into the (rows, dim)
    count matrix. Output (doc_id, embedding: list<float> of exact
    integer counts) — counts survive the kmeans micro-quantization
    exactly (floor(c*1e6+0.5) == c*1e6)."""
    from ..functions.hashing import hash64_array
    from ..functions.tokenize import flat_tokens_batch

    def feats(batch: pa.Table) -> pa.Table:
        flat, parents, n_rows = flat_tokens_batch(batch[text_col])
        m = np.zeros((n_rows, dim), np.float64)
        if len(flat):
            d = flat.dictionary_encode()
            hd = hash64_array(d.dictionary.to_pylist()) % dim
            bins = hd[d.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
            np.add.at(m, (parents, bins), 1.0)
        return pa.table(
            {
                "vec_id": batch["doc_id"],
                "embedding": pa.array(
                    [row.tolist() for row in m.astype(np.float32)],
                    pa.list_(pa.float32()),
                ),
            }
        )

    return docs.map_batches(feats, batch_format="pyarrow")


def source_vocab_overlap(ds, *, text_col: str = "text", group_col: str = "source"):
    """Source-level VOCABULARY overlap: for every pair of corpus
    sources, the distinct-token intersection and exact Jaccard — the
    corpus-mix diagnostic ("are these two feeds the same distribution,
    or do they add coverage?") that drives domain-mix weighting.

    Plan: one vectorized tokenize + LOCAL distinct (source, token) per
    batch (dictionary-encode + np.unique — the shingle-explode trick),
    global distinct via the bounded-bucket `distinct_on`, then ONE
    token-bucket exchange whose per-bucket kernel emits source pairs
    per token run (runs are <= |sources| long — bounded by
    construction) with a local pair-count combine; per-source set
    sizes are a |sources|-bounded aggregate, broadcast for the final
    jaccard. Output: src_a < src_b, n_common, jaccard_e6 (floor)."""
    import pyarrow.compute as pc

    import ray
    import ray.data as rd  # noqa: F401
    from ray.data.aggregate import Count, Sum

    from ..functions.tokenize import flat_tokens_batch
    from .ops import _bucket_of, distinct_on
    from .shuffle import hash_map_groups, hash_partitions

    num_buckets = 256

    def explode(batch: pa.Table) -> pa.Table:
        flat, parents, n_docs = flat_tokens_batch(batch[text_col])
        if len(flat) == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "token": pa.array([], pa.string()),
                }
            )
        srcs = batch[group_col].combine_chunks() if isinstance(
            batch[group_col], pa.ChunkedArray
        ) else batch[group_col]
        s_d = pc.take(srcs, pa.array(parents)).dictionary_encode()
        t_d = flat.dictionary_encode()
        sc = s_d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tc = t_d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nt = max(len(t_d.dictionary), 1)
        uniq = np.unique(sc * nt + tc)
        return pa.table(
            {
                group_col: s_d.dictionary.take(pa.array(uniq // nt)),
                "token": t_d.dictionary.take(pa.array(uniq % nt)),
            }
        )

    pairs_distinct = distinct_on(
        ds.map_batches(explode, batch_format="pyarrow"), [group_col, "token"]
    ).materialize()

    sizes = {
        r[group_col]: r["sz"]
        for r in pairs_distinct.groupby(group_col)
        .aggregate(Count(alias_name="sz"))
        .take_all()
    }
    sizes_ref = ray.put(sizes)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__bucket", _bucket_of(batch["token"], num_buckets))

    empty_pairs = pa.table(
        {
            "src_a": pa.array([], pa.string()),
            "src_b": pa.array([], pa.string()),
            "one": pa.array([], pa.int64()),
        }
    )

    def cooccur(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m < 2:
            return empty_pairs
        t_d = group["token"].combine_chunks().dictionary_encode()
        codes = t_d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        srcs = np.asarray(group[group_col].to_pylist(), dtype=object)
        order = np.lexsort((srcs, codes))
        codes_s, srcs_s = codes[order], srcs[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(codes_s)) + 1))
        lens = np.diff(np.concatenate((starts, [m])))
        out_a, out_b = [], []
        for run_len in np.unique(lens):
            if run_len < 2:
                continue
            rs = starts[lens == run_len]
            iu, ju = np.triu_indices(int(run_len), 1)
            out_a.append(srcs_s[(rs[:, None] + iu[None, :]).ravel()])
            out_b.append(srcs_s[(rs[:, None] + ju[None, :]).ravel()])
        if not out_a:
            return empty_pairs
        t = pa.table(
            {
                "src_a": pa.array(np.concatenate(out_a), pa.string()),
                "src_b": pa.array(np.concatenate(out_b), pa.string()),
            }
        )
        agg = t.group_by(["src_a", "src_b"]).aggregate([([], "count_all")])
        return agg.rename_columns(["src_a", "src_b", "one"])

    inter = hash_map_groups(
        pairs_distinct.map_batches(add_bucket, batch_format="pyarrow"),
        "__bucket",
        cooccur,
        num_partitions=min(hash_partitions(), num_buckets),
    ).groupby(["src_a", "src_b"]).aggregate(Sum("one", alias_name="n_common"))

    def finish(t: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        a = t["src_a"].to_pylist()
        b = t["src_b"].to_pylist()
        i = t["n_common"].to_numpy(zero_copy_only=False)
        sa = np.array([sz[x] for x in a], np.int64)
        sb = np.array([sz[x] for x in b], np.int64)
        return t.append_column(
            "jaccard_e6", pa.array(1_000_000 * i // (sa + sb - i))
        )

    return inter.map_batches(finish, batch_format="pyarrow")
