"""Text-analysis stage vs DuckDB SQL on the driver `documents` table —
the same SQL shapes used by __ray_entry__.oracle_sql."""

import duckdb
import ray.data as rd

from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
    TextStatsStage,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"

# canonical tokenizer as a DuckDB expression (tags stripped, ASCII punct
# -> space, lower, whitespace split, empties dropped) — must match
# functions/tokenize.py exactly
TOKS = (
    "list_filter(string_split_regex(lower(regexp_replace(regexp_replace(text,"
    " '<[^>]*>', '', 'g'), '[!-/:-@\\[-`{-~]', ' ', 'g')), '\\s+'), x -> x <> '')"
)


def _stats_df():
    ds = rd.read_parquet(DOCS)
    return (
        ds.map_batches(TextStatsStage, batch_format="pyarrow", concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_token_stats_match_duckdb():
    got = _stats_df()
    want = (
        duckdb.sql(
            f"""
            WITH toks AS (
              SELECT doc_id, unnest({TOKS}) AS term
              FROM read_parquet('{DOCS}')
            )
            SELECT doc_id, count(*) AS n_tokens,
                   count(DISTINCT term) AS n_unique_tokens,
                   CAST(sum(length(term)) AS DOUBLE) / count(*) AS mean_token_len
            FROM toks GROUP BY doc_id ORDER BY doc_id
            """
        )
        .df()
        .reset_index(drop=True)
    )
    sub = got[got["n_tokens"] > 0].reset_index(drop=True)
    assert sub["doc_id"].tolist() == want["doc_id"].tolist()
    assert sub["n_tokens"].tolist() == want["n_tokens"].tolist()
    assert sub["n_unique_tokens"].tolist() == want["n_unique_tokens"].tolist()
    assert sub["mean_token_len"].tolist() == want["mean_token_len"].tolist()


def test_fingerprint_md5_matches_duckdb():
    got = _stats_df()
    want = (
        duckdb.sql(
            f"SELECT doc_id, md5(array_to_string({TOKS}, ' ')) AS fp_md5 "
            f"FROM read_parquet('{DOCS}') ORDER BY doc_id"
        )
        .df()
        .reset_index(drop=True)
    )
    assert got["fp_md5"].tolist() == want["fp_md5"].tolist()


def test_lang_pred_mostly_matches_label():
    got = _stats_df()
    docs = duckdb.sql(
        f"SELECT doc_id, lang FROM read_parquet('{DOCS}') ORDER BY doc_id"
    ).df()
    merged = got.merge(docs, on="doc_id")
    en = merged[merged["lang"] == "en"]
    acc = (en["lang_pred"] == "en").mean()
    assert acc > 0.9, f"en accuracy {acc}"


def test_bpe_token_count_positive_and_deterministic():
    a = _stats_df()
    b = _stats_df()
    assert a["n_bpe_tokens"].tolist() == b["n_bpe_tokens"].tolist()
    assert (a[a["n_tokens"] > 0]["n_bpe_tokens"] > 0).all()
    assert a["fp_rolling"].tolist() == b["fp_rolling"].tolist()


def test_bpe_count_re2_formula_exact():
    """The lookahead-free RE2 pattern + correction term used by the
    text_bpe_count SQL oracle equals the Python BPEISH_RE match count —
    fuzzed over every RE2-compatible whitespace char and checked over
    the full driver corpus."""
    import random

    import duckdb
    import pyarrow.parquet as pq

    from __ray_entry__ import BPE_CORR_SQL, BPE_RE2_SQL
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        BPEISH_RE,
    )

    pat_re2 = BPE_RE2_SQL.replace("''", "'")
    con = duckdb.connect()

    def sql_count(t: str) -> int:
        return con.execute(
            "SELECT len(regexp_extract_all(?, ?)) + len(regexp_extract_all(?, ?))",
            [t, pat_re2, t, BPE_CORR_SQL],
        ).fetchone()[0]

    random.seed(1)
    alphabet = list("ab1!' \t\n\r\x0c")  # chars where Python \s == RE2 \s
    for _ in range(1500):
        t = "".join(random.choice(alphabet) for _ in range(random.randint(0, 40)))
        assert len(BPEISH_RE.findall(t)) == sql_count(t), repr(t)

    texts = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    for t in texts:
        assert len(BPEISH_RE.findall(t)) == sql_count(t)


def test_repetition_stats_matches_reference():
    """Vectorized n-gram repetition counts == per-doc Python Counter."""
    from collections import Counter

    import pyarrow as pa

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        repetition_stats,
    )

    texts = [
        "a b a b a b",
        "x",
        "",
        "one two three one two three one two",
        "the the the the",
        "Hello, World; Hello World again",
        "spam spam spam spam spam eggs spam",
    ]
    b = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    for row, t in zip(repetition_stats(b).to_pylist(), texts):
        toks = tokenize(t)
        bis = Counter(zip(toks, toks[1:]))
        tris = Counter(zip(toks, toks[1:], toks[2:]))
        assert row["n_tokens"] == len(toks)
        assert row["n_bigrams"] == sum(bis.values())
        assert row["top_bigram_count"] == (max(bis.values()) if bis else 0)
        assert row["n_trigrams"] == sum(tris.values())
        assert row["dup_trigram_occurrences"] == sum(tris.values()) - len(tris)


def test_pii_scrub_matches_python_reference():
    """Vectorized RE2 count/redact kernels vs a per-doc `re` reference on
    real corpus docs with deterministic injected PII (plus clean docs)."""
    import hashlib
    import re

    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        PII_EMAIL_RE,
        PII_IP_RE,
        PII_PHONE_RE,
        inject_pii,
        pii_scrub,
    )

    docs = pq.read_table(DOCS, columns=["doc_id", "text"]).slice(0, 64)
    aug = inject_pii(docs)
    out = pii_scrub(aug).sort_by("doc_id").to_pylist()
    texts = {r["doc_id"]: r["text"] for r in aug.to_pylist()}

    assert any(r["n_emails"] for r in out)
    assert any(r["n_phones"] for r in out)
    assert any(r["n_ips"] for r in out)
    assert any(r["n_emails"] == r["n_phones"] == r["n_ips"] == 0 for r in out)
    for r in out:
        s = texts[r["doc_id"]]
        assert r["n_emails"] == len(re.findall(PII_EMAIL_RE, s))
        assert r["n_phones"] == len(re.findall(PII_PHONE_RE, s))
        assert r["n_ips"] == len(re.findall(PII_IP_RE, s))
        clean = re.sub(PII_EMAIL_RE, "<EMAIL>", s)
        clean = re.sub(PII_PHONE_RE, "<PHONE>", clean)
        clean = re.sub(PII_IP_RE, "<IP>", clean)
        assert "@" not in clean
        assert r["clean_md5"] == hashlib.md5(clean.encode()).hexdigest()


def test_unigram_loglik_matches_python_reference():
    """Distributed LM pass (partial counts -> groupby -> broadcast ->
    reduceat scoring) vs a single-process dict-based reference."""
    import math
    from collections import Counter

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        unigram_loglik,
    )

    ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    out = unigram_loglik(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)

    docs = rd.read_parquet(DOCS, columns=["doc_id", "text"]).to_pandas()
    toks = {r.doc_id: tokenize(r.text) for r in docs.itertuples()}
    cf = Counter(t for ts in toks.values() for t in ts)
    total = sum(cf.values())
    w6 = {t: round(math.log10(c / total) * 1e6) for t, c in cf.items()}

    expect = {
        d: (len(ts), sum(w6[t] for t in ts)) for d, ts in toks.items() if ts
    }
    assert len(out) == len(expect)
    for r in out.itertuples():
        n, s = expect[r.doc_id]
        assert (r.n_tokens, r.sum_logprob_e6) == (n, s), r.doc_id


def test_spell_correct_lockstep_dp_matches_scalar():
    """The all-terms lockstep Levenshtein DP vs a scalar reference DP,
    plus end-to-end correction sanity on the corpus vocabulary."""
    import numpy as np

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        _levenshtein_to_all,
        spell_correct,
    )

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    terms = ["join", "hash", "scan", "a", "windowing", "batch", "", "joins"]
    lens = np.array([len(t) for t in terms])
    L = lens.max()
    mat = np.zeros((len(terms), L), np.uint32)
    for i, t in enumerate(terms):
        mat[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), np.uint32)
    for q in ["jin", "hsh", "windowing", "z", "scans", ""]:
        got = _levenshtein_to_all(q, mat, lens)
        assert got.tolist() == [lev(q, t) for t in terms], q

    out = spell_correct(rd.read_parquet(DOCS, columns=["doc_id", "text"])).to_pylist()
    assert len(out) == 5
    for r in out:
        # dropping one char is always recoverable at distance <= 1
        assert r["dist"] <= 1
        assert len(r["corrected"]) >= 4


def test_keyword_extract_matches_reference():
    """Distributed tf-idf keyword extraction vs a Counter reference with
    the same integer-quantized idf and (score desc, term asc) tie-break."""
    import math
    from collections import Counter

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        keyword_extract,
    )

    docs = rd.read_parquet(DOCS, columns=["doc_id", "text"]).to_pandas()
    toks = {r.doc_id: tokenize(r.text) for r in docs.itertuples()}
    tf = {d: Counter(ts) for d, ts in toks.items() if ts}
    df = Counter(t for c in tf.values() for t in c)
    n = len(tf)
    idf6 = {t: round(math.log10(n / d) * 1e6) for t, d in df.items()}

    expect = {}
    for d, c in tf.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1] * idf6[kv[0]], kv[0]))[:3]
        expect[d] = [(i + 1, t, cnt * idf6[t]) for i, (t, cnt) in enumerate(ranked)]

    out = (
        keyword_extract(rd.read_parquet(DOCS, columns=["doc_id", "text"]))
        .to_pandas()
        .sort_values(["doc_id", "rank"])
    )
    got = {}
    for r in out.itertuples():
        got.setdefault(r.doc_id, []).append((r.rank, r.term, r.tfidf_e6))
    assert got == expect


def test_more_like_this_matches_duckdb_and_invariant():
    """Related-doc retrieval: exact-int64 tf*idf_e3 cosine vs the DuckDB
    twin, and partitioning invariance of the full result."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        more_like_this,
    )

    sql = f"""
    WITH t AS (SELECT doc_id, {TOKS} AS l FROM read_parquet('{DOCS}')),
    toks AS (SELECT doc_id, unnest(l) AS term FROM t),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM toks),
    dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    w AS (SELECT doc_id, term,
             tf * CAST(round(log10(CAST((SELECT n FROM nd) AS DOUBLE) / df) * 1000) AS BIGINT) AS w
          FROM tf JOIN dfx USING (term)),
    norm AS (SELECT doc_id, CAST(sum(w*w) AS BIGINT) AS n2 FROM w GROUP BY doc_id),
    seeds AS (SELECT doc_id AS seed_id FROM norm ORDER BY doc_id LIMIT 4),
    sw AS (SELECT seeds.seed_id, w.term, w.w AS ws FROM w JOIN seeds ON w.doc_id = seeds.seed_id),
    dot AS (SELECT sw.seed_id, w.doc_id, CAST(sum(w.w * sw.ws) AS BIGINT) AS dot
            FROM w JOIN sw USING (term)
            WHERE w.doc_id <> sw.seed_id
            GROUP BY sw.seed_id, w.doc_id HAVING sum(w.w * sw.ws) <> 0),
    cos AS (SELECT seed_id, dot.doc_id,
            CAST(round(CAST(dot AS DOUBLE)
                 / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) * 1000000) AS BIGINT) AS cosine_e6
            FROM dot JOIN norm na ON na.doc_id = dot.seed_id
                     JOIN norm nb ON nb.doc_id = dot.doc_id)
    SELECT seed_id, doc_id, cosine_e6 FROM cos
    QUALIFY row_number() OVER (PARTITION BY seed_id ORDER BY cosine_e6 DESC, doc_id) <= 3
    ORDER BY seed_id, cosine_e6 DESC, doc_id
    """
    want = duckdb.sql(sql).df()

    def run(blocks):
        ds = rd.read_parquet(DOCS, columns=["doc_id", "text"], override_num_blocks=blocks)
        return (
            more_like_this(ds, n_seeds=4, k=3)
            .to_pandas()
            .sort_values(["seed_id", "cosine_e6", "doc_id"], ascending=[True, False, True])
            .reset_index(drop=True)
        )

    got = run(3)
    assert len(got) == len(want) > 0
    assert (got["seed_id"].to_numpy() == want["seed_id"].to_numpy()).all()
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (got["cosine_e6"].to_numpy() == want["cosine_e6"].to_numpy()).all()
    assert got.equals(run(7))


def test_quality_percentile_matches_duckdb_and_invariant():
    """Decile contract: score_e6 = (1e6 * en_hits) // n_tokens, decile =
    (10 * (rank-1)) // n_lang per language — vs DuckDB window
    functions; repartitioning must not change any row."""
    from __ray_entry__ import EN_SQL as en_sql
    from __ray_entry__ import TOKS as toks

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        quality_percentile,
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    want = con.sql(
        f"""
        WITH t AS (SELECT doc_id, lang, {toks} AS toks FROM documents),
        m AS (SELECT doc_id, lang, len(toks) AS n_tokens,
                     len(list_filter(toks, x -> list_contains({en_sql}, x))) AS en_hits
              FROM t),
        s AS (SELECT doc_id, lang, (1000000 * en_hits) // n_tokens AS score_e6
              FROM m WHERE n_tokens > 0)
        SELECT doc_id, lang, score_e6,
               (10 * (rank() OVER (PARTITION BY lang ORDER BY score_e6) - 1))
                 // count(*) OVER (PARTITION BY lang) AS decile
        FROM s ORDER BY doc_id
        """
    ).df()

    ds = rd.read_parquet(DOCS, columns=["doc_id", "text", "lang"])
    got = quality_percentile(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score_e6"].tolist() == want["score_e6"].tolist()
    assert got["decile"].tolist() == want["decile"].tolist()
    assert got["decile"].between(0, 9).all()

    got2 = (
        quality_percentile(ds.repartition(7))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got2["decile"].tolist() == got["decile"].tolist()
    assert got2["score_e6"].tolist() == got["score_e6"].tolist()


def test_cms_one_sided_and_partition_invariant():
    """Count-min estimates are one-sided (est >= exact, equality when a
    term's min cell is collision-free) and identical at two
    partitionings."""
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        cms_term_counts,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    outs = []
    for parts in (2, 5):
        ds = rd.read_parquet(path, columns=["text"]).repartition(parts)
        t = cms_term_counts(ds, depth=4, width=64)
        outs.append(sorted(zip(t["term"].to_pylist(),
                               t["exact_tf"].to_pylist(),
                               t["est_tf"].to_pylist())))
    assert outs[0] == outs[1]
    assert all(est >= ex for _t, ex, est in outs[0])
    assert sum(ex for _t, ex, _e in outs[0]) > 0


def test_windowed_cooccurrence_tiny_known():
    """Hand-checkable corpus: window-2 unordered pairs over the full
    vocab; intervening out-of-vocab tokens consume distance when the
    vocab is restricted."""
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        windowed_cooccurrence,
    )

    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "a b a"},
            {"doc_id": 2, "text": "b z a"},
        ]
    ).repartition(2)
    got = {
        (r["term_a"], r["term_b"]): r["n_cooc"]
        for r in windowed_cooccurrence(docs, vocab_size=10, window=2).take_all()
    }
    # doc1: (a,b)d1 (b,a)d1 (a,a)d2 ; doc2: (b,z)d1 (z,a)d1 (b,a)d2
    assert got == {("a", "b"): 3, ("a", "a"): 1, ("b", "z"): 1, ("a", "z"): 1}
    # vocab restricted to {a, b}: z vanishes but still consumes distance
    got2 = {
        (r["term_a"], r["term_b"]): r["n_cooc"]
        for r in windowed_cooccurrence(docs, vocab_size=2, window=2).take_all()
    }
    assert got2 == {("a", "b"): 3, ("a", "a"): 1}


def test_naive_bayes_lang_recovers_labels():
    """On cleanly separable synthetic docs the NB classifier recovers
    the training labels; ties break to the lexicographically first
    language; partitioning-invariant."""
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        naive_bayes_lang,
    )

    rows = []
    for i in range(12):
        rows.append({"doc_id": i, "text": "the cat and the dog", "lang": "en"})
        rows.append({"doc_id": 100 + i, "text": "der hund und die katze", "lang": "de"})
    rows.append({"doc_id": 999, "text": "zzz qqq", "lang": "en"})  # OOV-ish doc
    for nparts in (1, 4):
        got = (
            naive_bayes_lang(rd.from_items(rows).repartition(nparts), vocab_size=50)
            .to_pandas()
            .set_index("doc_id")["lang_nb"]
            .to_dict()
        )
        for i in range(12):
            assert got[i] == "en"
            assert got[100 + i] == "de"
        # OOV doc: decided by priors (en has 13 docs vs de 12) -> en
        assert got[999] == "en"


def test_textrank_integer_replay_and_hub():
    import numpy as np
    import pyarrow as pa

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        textrank_keywords,
    )

    # 'hub' co-occurs with everything; spokes only with hub
    texts = ["hub aaa", "hub bbb", "hub ccc", "hub ddd", "aaa bbb"] * 4
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = textrank_keywords(
        rd.from_arrow(tbl).repartition(4), vocab_size=10, window=2, iters=10
    )
    ranks = dict(zip(got["term"].to_pylist(), got["rank_e6"].to_pylist()))
    assert max(ranks, key=ranks.get) == "hub"

    # pure-python integer replay of the iteration contract
    vocab = sorted(ranks)
    idx = {t: i for i, t in enumerate(vocab)}
    V = len(vocab)
    cooc = {}
    for txt in texts:
        toks = txt.split()
        for d in (1, 2):
            for i in range(len(toks) - d):
                a, b = sorted((toks[i], toks[i + d]))
                if a != b:
                    cooc[(a, b)] = cooc.get((a, b), 0) + 1
    w = np.zeros((V, V), np.int64)
    for (a, b), n in cooc.items():
        w[idx[a], idx[b]] += n
        w[idx[b], idx[a]] += n
    wsum = w.sum(axis=1)
    wq = (1_000_000 * w) // np.maximum(wsum, 1)[:, None]
    r = np.full(V, 1_000_000, np.int64)
    for _ in range(10):
        contrib = ((wq * r[:, None]) // 1_000_000).sum(axis=0)
        r = 150_000 + (85 * contrib) // 100
    assert [ranks[t] for t in vocab] == r.tolist()


def test_doc_hash_features_manual():
    import numpy as np
    import pyarrow as pa

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
        hash64,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        doc_hash_features,
    )

    texts = ["The quick brown fox", "the the THE", ""]
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = (
        doc_hash_features(rd.from_arrow(tbl), dim=4)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    for i, txt in enumerate(texts):
        want = np.zeros(4)
        for tok in tokenize(txt):
            want[hash64(tok) % 4] += 1
        assert list(got.embedding[i]) == want.tolist(), txt
