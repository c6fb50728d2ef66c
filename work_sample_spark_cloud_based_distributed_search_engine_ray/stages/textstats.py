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

Scale: per-doc string work is the only non-vectorizable part (same as
extraction); everything downstream of tokenization is integer numpy.
No shuffle in any of these stages — they are embarrassingly parallel
map_batches over column-pruned reads.
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
        from ..functions.sketches import rolling_fingerprint

        self.text_col = text_col
        self.id_col = id_col
        self.stops = {
            "en": frozenset(EN_STOP),
            "de": frozenset(DE_STOP),
            "fr": frozenset(FR_STOP),
        }
        self.punct_re = re.compile(r"[!-/:-@\[-`{-~]")
        self._rolling = rolling_fingerprint

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        n_tokens = np.zeros(n, np.int64)
        n_unique = np.zeros(n, np.int64)
        sum_tok_len = np.zeros(n, np.int64)
        hits = {k: np.zeros(n, np.int64) for k in ("en", "de", "fr")}
        n_chars = np.zeros(n, np.int64)
        punct_chars = np.zeros(n, np.int64)
        fp_md5: list[str] = []
        fp_roll = np.zeros(n, np.uint64)
        n_bpe = np.zeros(n, np.int64)

        for i, text in enumerate(texts):
            toks = tokenize(text)
            n_tokens[i] = len(toks)
            n_unique[i] = len(set(toks))
            sum_tok_len[i] = sum(len(t) for t in toks)
            for lang, stop in self.stops.items():
                hits[lang][i] = sum(1 for t in toks if t in stop)
            n_chars[i] = len(text)
            punct_chars[i] = len(self.punct_re.findall(text))
            fp_md5.append(hashlib.md5(" ".join(toks).encode()).hexdigest())
            fp_roll[i] = np.uint64(self._rolling(toks))
            n_bpe[i] = len(BPEISH_RE.findall(text))

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
