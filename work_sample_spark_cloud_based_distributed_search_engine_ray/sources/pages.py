"""Deterministic synthetic Common-Crawl-style pages corpus + query set.

Authoritative input shape (BASELINE.json ``input_hint``):
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``.

Everything is seeded (default seed=42) and pure-numpy, so the same
``(n_docs, seed)`` always yields byte-identical parquet — tests,
oracle, bench and both scaling runs all see the same corpus, with no
external data.

Properties exercised on purpose (FIXTURES.md §1):
- Zipf-distributed vocabulary (~5k terms): a few hot terms with
  df ≈ corpus size force the hot-term salting path of the shuffle; a
  long tail has df=1.
- Doc lengths 20..2000 tokens: BM25 length normalization / avgdl matter.
- ~3% of rows duplicate another row's ``html`` byte-for-byte under a
  different url — exercises exact content dedup (reference
  ``contentSeen`` table, ``crawler/Crawler.java:178-190``).
- ``html`` is a full document (title/head/body, ``<p>``/``<b>``/
  ``<a href>`` tags, punctuation, mixed case) whose canonical
  extraction (``functions.tokenize.extract_html``) reproduces the
  ``text`` column byte-identically — the per-url invariant.
- ``lang`` mostly ``en`` with seeded ``de``/``fr`` minorities.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

EN_STOP = (
    "the and of to a in is it you that was for on are with as his they be at "
    "one have this from or had by but not what all were when your can said"
).split()
DE_STOP = "der die das und ist nicht ein eine zu mit auf von den im wird".split()
FR_STOP = "le la les et est pas un une dans pour que qui sur avec par".split()

_SYLLABLES = (
    "ka to ri na lu mo se vi ta pel dor min zan qua fel tur bos gri "
    "lam ched nov pir sol wex yun har kel"
).split()

_PUNCT_DECOR = [",", ".", ";", ":", "!", "?"]

VOCAB_SIZE = 5000
ZIPF_EXPONENT = 1.05


def make_vocab(lang: str = "en", size: int = VOCAB_SIZE) -> list[str]:
    """Deterministic vocabulary: language stopwords first (hot Zipf head),
    then generated syllable words. Pure function of (lang, size)."""
    stop = {"en": EN_STOP, "de": DE_STOP, "fr": FR_STOP}[lang]
    rng = np.random.default_rng(abs(hash_seed(lang)) % (2**32))
    words: list[str] = list(stop)
    seen = set(words)
    while len(words) < size:
        k = int(rng.integers(2, 5))
        w = lang[0] + "".join(rng.choice(_SYLLABLES) for _ in range(k))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def hash_seed(s: str) -> int:
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")


def _zipf_probs(n: int, a: float = ZIPF_EXPONENT) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), a)
    return p / p.sum()


def synth_pages(n_docs: int, seed: int = 42) -> pa.Table:
    """Generate the pages table. Deterministic in (n_docs, seed)."""
    from ..functions.tokenize import extract_html

    rng = np.random.default_rng(seed)
    vocabs = {lang: make_vocab(lang) for lang in ("en", "de", "fr")}
    probs = _zipf_probs(VOCAB_SIZE)

    langs = rng.choice(np.array(["en", "de", "fr"]), size=n_docs, p=[0.9, 0.05, 0.05])
    # Log-normal doc lengths clipped to [20, 2000].
    lengths = np.clip(
        np.exp(rng.normal(np.log(150.0), 1.0, size=n_docs)).astype(np.int64), 20, 2000
    )
    title_lens = rng.integers(3, 9, size=n_docs)
    total = int(lengths.sum() + title_lens.sum())
    token_idx = rng.choice(VOCAB_SIZE, size=total, p=probs)
    punct_mask = rng.random(total) < 0.08
    punct_pick = rng.integers(0, len(_PUNCT_DECOR), size=total)
    cap_mask = rng.random(total) < 0.05
    dup_mask = rng.random(n_docs) < 0.03
    dup_mask[0] = False
    dup_src = rng.integers(0, np.maximum(1, np.arange(n_docs)), size=n_docs)

    n_hosts = max(10, n_docs // 50)
    base_ts = np.int64(1_640_995_200_000_000)  # 2022-01-01 in microseconds

    urls: list[str] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    ts = np.empty(n_docs, dtype=np.int64)

    pos = 0
    for i in range(n_docs):
        url = f"http://site{i % n_hosts}.example/p/{i:08d}"
        urls.append(url)
        ts[i] = base_ts + np.int64(i) * 1_000_000 + np.int64(rng.integers(0, 999_999))
        if dup_mask[i]:
            j = int(dup_src[i])
            htmls.append(htmls[j])
            texts.append(texts[j])
            # still consume this doc's token budget for determinism
            pos += int(title_lens[i]) + int(lengths[i])
            continue
        vocab = vocabs[langs[i]]
        ttl_n, body_n = int(title_lens[i]), int(lengths[i])
        idxs = token_idx[pos : pos + ttl_n + body_n]
        pm = punct_mask[pos : pos + ttl_n + body_n]
        pp = punct_pick[pos : pos + ttl_n + body_n]
        cm = cap_mask[pos : pos + ttl_n + body_n]
        pos += ttl_n + body_n

        toks = []
        for k in range(ttl_n + body_n):
            w = vocab[idxs[k]]
            if cm[k]:
                w = w.capitalize()
            if pm[k]:
                w = w + _PUNCT_DECOR[pp[k]]
            toks.append(w)
        title = " ".join(toks[:ttl_n])
        body_toks = toks[ttl_n:]
        text = " ".join(body_toks)
        texts.append(text)

        # Assemble HTML: tags only *between/around* whole tokens, so that
        # canonical extraction inverts to `text` exactly.
        parts: list[str] = []
        for k, w in enumerate(body_toks):
            if k % 12 == 0:
                parts.append("</p>\n<p>" if k else "<p>")
            if k % 29 == 7:
                # link to a REAL page of this corpus (never self): the
                # frontier/BFS/PageRank family needs a connected
                # page->page graph, like any actual web crawl
                t = (i + 1 + (k * 9973) % (n_docs - 1)) % n_docs if n_docs > 1 else i
                w = (
                    f'<a href="http://site{t % n_hosts}.example/p/{t:08d}">{w}</a>'
                )
            elif k % 17 == 3:
                w = f"<b>{w}</b>"
            parts.append(w)
        parts.append("</p>")
        html = (
            f"<html><head><title>{title}</title>"
            f'<meta charset="utf-8"></head>\n<body class="page">\n'
            + " ".join(parts)
            + "\n</body></html>"
        )
        htmls.append(html.encode("utf-8"))
        if __debug__ and i < 32:
            got_title, got_text = extract_html(htmls[-1])
            assert got_title == title and got_text == text, f"extraction not inverse @doc {i}"

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def pages_parquet(
    n_docs: int,
    seed: int = 42,
    cache_dir: str = "/tmp/wse_pages",
    row_group_size: int | None = None,
) -> str:
    """Materialize (once) the synthetic corpus as parquet; returns path.

    Written with small row groups so Ray Data gets read parallelism from
    a single file (row-group splits = input partitions at real scale).
    ``row_group_size`` override lets tests force many row groups on tiny
    corpora (row groups are the checkpoint-partition granularity).
    """
    os.makedirs(cache_dir, exist_ok=True)
    rgs = row_group_size or max(256, n_docs // 64)
    # _g2: bump on generator changes that alter payload bytes, or stale
    # caches from an older generator poison cross-process comparisons
    path = os.path.join(cache_dir, f"pages_n{n_docs}_s{seed}_rg{rgs}_g2.parquet")
    if not os.path.exists(path):
        tbl = synth_pages(n_docs, seed)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=rgs)
        os.replace(tmp, path)
    return path


def sf_to_n_docs(sf: float) -> int:
    """Driver sf convention -> corpus size (FIXTURES.md §1 scales)."""
    return max(100, int(round(sf * 1_000_000)))


def pages_for_sf_dir(sf_dir: str, seed: int = 42) -> str:
    """Map a driver sf dir (e.g. /root/testdata/sf0.01) to a cached
    synthetic pages parquet of the matching scale."""
    name = os.path.basename(os.path.normpath(sf_dir))
    sf = float(name.replace("sf", "")) if name.startswith("sf") else 0.01
    return pages_parquet(sf_to_n_docs(sf), seed)


def reference_queries(seed: int = 42, n_queries: int = 50) -> list[tuple[int, str]]:
    """The reference query set (FIXTURES.md §2): seeded mix of hot /
    rare single terms, 2-4-term conjunctions, queries with punctuation,
    uppercase and HTML junk (exercises ``Searcher.java:39-40``
    normalization), duplicated terms (``Searcher.java:42`` set-dedup)
    and zero-hit terms (``Searcher.java:79`` null-row path)."""
    rng = np.random.default_rng(seed + 1)
    vocab = make_vocab("en")
    out: list[tuple[int, str]] = []
    for qid in range(n_queries):
        kind = qid % 7
        if kind == 0:  # hot single term
            q = vocab[int(rng.integers(0, 20))]
        elif kind == 1:  # rare single term
            q = vocab[int(rng.integers(VOCAB_SIZE - 500, VOCAB_SIZE))]
        elif kind == 2:  # 2-4 term conjunction
            k = int(rng.integers(2, 5))
            q = " ".join(vocab[int(rng.integers(0, 2000))] for _ in range(k))
        elif kind == 3:  # punctuation + uppercase junk
            a, b = vocab[int(rng.integers(0, 500))], vocab[int(rng.integers(0, 500))]
            q = f"  {a.upper()}, {b}!? "
        elif kind == 4:  # HTML junk
            a = vocab[int(rng.integers(0, 1000))]
            q = f"<b>{a}</b> <i>{vocab[int(rng.integers(0, 100))]}</i>"
        elif kind == 5:  # duplicate terms
            a = vocab[int(rng.integers(0, 300))]
            q = f"{a} {a} {vocab[int(rng.integers(0, 300))]} {a}"
        else:  # zero-hit (never in any vocab: uppercase-only nonsense stem)
            q = f"zzqx{qid}nohit"
        out.append((qid, q))
    return out


def phrase_queries(seed: int = 42, n_queries: int = 24) -> list[tuple[int, str]]:
    """Deterministic phrase query set for exact-phrase search.

    Mix (FIXTURES.md §2 style): hot-head bigrams/trigrams that are
    guaranteed to occur at any corpus scale (Zipf head terms co-occur
    adjacently thousands of times per million tokens), mid-frequency
    bigrams wrapped in punctuation/case junk (normalization path), and
    tail-term bigrams that usually match nothing (empty-result path).
    Repeated-term phrases (e.g. "the the") arise naturally when the two
    head draws collide — the overlap-counting edge case."""
    rng = np.random.default_rng(seed + 7)
    vocab = make_vocab("en")
    out: list[tuple[int, str]] = []
    for qid in range(n_queries):
        kind = qid % 4
        if kind == 0:  # hot bigram
            a, b = rng.integers(0, 12, size=2)
            q = f"{vocab[int(a)]} {vocab[int(b)]}"
        elif kind == 1:  # hot trigram
            i, j, k = rng.integers(0, 8, size=3)
            q = f"{vocab[int(i)]} {vocab[int(j)]} {vocab[int(k)]}"
        elif kind == 2:  # mid-frequency bigram + junk around it
            a = vocab[int(rng.integers(0, 200))]
            b = vocab[int(rng.integers(0, 200))]
            q = f"  {a.upper()}, {b}! "
        else:  # tail bigram (usually zero hits)
            a = vocab[int(rng.integers(2000, VOCAB_SIZE))]
            b = vocab[int(rng.integers(0, 50))]
            q = f"{a} {b}"
        out.append((qid, q))
    return out
