"""Skew-stress for the dedup tails (round-3 verdict item #8).

A pathological corpus — 30% of docs EXACT copies of one text (one giant
identical cluster) and 30% near-dup perturbations of another — drives
minhash/simhash/ngram through their band-bucket caps:

- with the cap NOT binding, pair sets must match an independent
  per-doc brute-force oracle EXACTLY (count and membership);
- with a small cap, the stages must stay green, the ``truncated``
  accounting must mark the capped clusters, and the output must stay
  bounded (no quadratic blowup) while still covering every cluster
  member through the kept representatives.
"""

from collections import Counter

import numpy as np
import pyarrow as pa

import ray.data as rd

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.sketches import (
    band_keys_matrix,
    hamming64,
    minhash_est_jaccard,
    minhash_params,
    minhash_signature,
    shingle_hashes,
    simhash64,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
    tokenize,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
    exact_dedup_summary,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

N_UNIQUE, N_EXACT, N_NEAR = 240, 180, 180  # 40% / 30% / 30%


def _skew_corpus(seed=17):
    rng = np.random.default_rng(seed)
    words = [f"w{h}" for h in range(800)]
    ids, texts = [], []
    for i in range(N_UNIQUE):
        ids.append(i)
        texts.append(" ".join(words[rng.integers(0, 800)] for _ in range(60)))
    exact_base = " ".join(words[rng.integers(0, 800)] for _ in range(60))
    for i in range(N_EXACT):
        ids.append(1000 + i)
        texts.append(exact_base)
    near_toks = [words[rng.integers(0, 800)] for _ in range(60)]
    for i in range(N_NEAR):
        t = list(near_toks)
        for _ in range(2):  # ~2 token edits: pairwise J ~ 0.85+
            t[rng.integers(0, 60)] = words[rng.integers(0, 800)]
        ids.append(2000 + i)
        texts.append(" ".join(t))
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )


CORPUS = _skew_corpus()
TEXTS = dict(zip(CORPUS["doc_id"].to_pylist(), CORPUS["text"].to_pylist()))


def _minhash_oracle(est_threshold=0.5, num_perm=128, num_bands=32, shingle_n=3, seed=1):
    """Independent per-doc LSH replay: signature -> band keys -> bucket
    pairs -> estimate filter. No caps, no distribution."""
    a, b = minhash_params(num_perm, seed=seed)
    sigs = {
        d: minhash_signature(shingle_hashes(tokenize(t), shingle_n), a, b)
        for d, t in TEXTS.items()
    }
    buckets: dict = {}
    for d, sig in sigs.items():
        for bi, key in enumerate(band_keys_matrix(sig[None, :], num_bands)[0]):
            buckets.setdefault((bi, int(key)), []).append(d)
    pairs = set()
    for members in buckets.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return {
        (x, y)
        for x, y in pairs
        if minhash_est_jaccard(sigs[x], sigs[y]) >= est_threshold
    }


def test_minhash_uncapped_matches_oracle_exactly(ray_session):
    got = minhash_lsh_pairs(
        rd.from_arrow(CORPUS), est_threshold=0.5, max_bucket=1024
    ).to_pandas()
    found = set(zip(got["doc_a"], got["doc_b"]))
    want = _minhash_oracle()
    assert found == want  # membership AND count exact
    assert len(got) == len(want)
    assert not got["truncated"].any()
    # the giant exact cluster must be fully paired: C(180, 2)
    exact_pairs = {p for p in found if p[0] >= 1000 and p[1] < 2000}
    assert len(exact_pairs) == N_EXACT * (N_EXACT - 1) // 2


def test_minhash_capped_green_with_truncation_accounting(ray_session):
    got = minhash_lsh_pairs(
        rd.from_arrow(CORPUS), est_threshold=0.5, max_bucket=64
    ).to_pandas()
    found = set(zip(got["doc_a"], got["doc_b"]))
    # green + bounded: the capped run keeps <= C(64,2) pairs per band
    # bucket instead of C(180,2)+ per cluster
    assert 0 < len(found) < N_EXACT * (N_EXACT - 1) // 2
    # every kept pair is real (subset of the uncapped truth)
    assert found <= _minhash_oracle()
    # truncation is ACCOUNTED, not silent: pairs inside capped clusters
    # carry truncated=True
    trunc_pairs = set(
        zip(got.loc[got["truncated"], "doc_a"], got.loc[got["truncated"], "doc_b"])
    )
    assert trunc_pairs, "cap bound but no truncated accounting"
    assert all(a >= 1000 for a, _ in trunc_pairs)  # only the dup-mass clusters


def _simhash_oracle(max_hamming=3):
    sigs = {}
    for d, t in TEXTS.items():
        c = Counter(tokenize(t))
        sigs[d] = simhash64(list(c.keys()), np.fromiter(c.values(), np.int64, len(c)))
    ids = sorted(sigs)
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if hamming64(sigs[ids[i]], sigs[ids[j]]) <= max_hamming:
                want.add((ids[i], ids[j]))
    return want


def test_simhash_uncapped_matches_oracle_exactly(ray_session):
    got = simhash_pairs(
        rd.from_arrow(CORPUS), max_hamming=3, max_bucket=1024
    ).to_pandas()
    found = set(zip(got["doc_a"], got["doc_b"]))
    want = _simhash_oracle()
    assert found == want
    assert len(got) == len(want)
    # identical docs are hamming 0: the whole exact cluster pairs up
    assert len({p for p in found if p[0] >= 1000 and p[1] < 2000}) == (
        N_EXACT * (N_EXACT - 1) // 2
    )


def test_simhash_capped_stays_green_and_bounded(ray_session):
    got = simhash_pairs(
        rd.from_arrow(CORPUS), max_hamming=3, max_bucket=48
    ).to_pandas()
    found = set(zip(got["doc_a"], got["doc_b"]))
    assert 0 < len(found) < N_EXACT * (N_EXACT - 1) // 2
    assert found <= _simhash_oracle()  # kept pairs are all real


def _jaccard(a: str, b: str, n=3):
    def sh(t):
        toks = tokenize(t)
        return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sa, sb = sh(a), sh(b)
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def test_ngram_jaccard_exact_on_skew_corpus(ray_session):
    got = ngram_jaccard_pairs(
        rd.from_arrow(CORPUS), n=3, threshold=0.5, max_shingle_docs=2048
    ).to_pandas()
    found = {(a, b): j for a, b, j in zip(got["doc_a"], got["doc_b"], got["jaccard"])}
    # brute-force oracle restricted to the dup-mass ids + a unique
    # sample (the unique block shares no 3-gram by construction wrt
    # threshold 0.5; full 600^2 would be slow for nothing)
    ids = sorted(TEXTS)
    want = {}
    dup_ids = [d for d in ids if d >= 1000]
    for i in range(len(dup_ids)):
        for j in range(i + 1, len(dup_ids)):
            a, b = dup_ids[i], dup_ids[j]
            jac = _jaccard(TEXTS[a], TEXTS[b])
            if jac >= 0.5:
                want[(a, b)] = jac
    found_dup = {p: j for p, j in found.items() if p[0] >= 1000}
    assert set(found_dup) == set(want)
    for p, j in found_dup.items():
        assert abs(j - want[p]) < 1e-9, p
    # exact cluster: all C(180,2) pairs at jaccard exactly 1.0
    ones = [j for p, j in found_dup.items() if p[0] >= 1000 and p[1] < 2000]
    assert len(ones) == N_EXACT * (N_EXACT - 1) // 2
    assert all(j == 1.0 for j in ones)


def test_exact_dedup_summary_on_skew_corpus(ray_session):
    got = exact_dedup_summary(rd.from_arrow(CORPUS)).to_pandas()
    big = got[got["n_copies"] == N_EXACT]
    assert len(big) == 1
    assert int(big.iloc[0]["canonical_doc_id"]) == 1000  # min doc_id wins
