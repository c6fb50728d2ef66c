"""Similarity sketches: shingles, MinHash, SimHash, rolling fingerprints.

Pure, deterministic, vectorized (numpy) functions — no Ray here. The Ray
Data stages in ``stages/dedup.py`` call these inside ``map_batches``
actor pools (permutation tables built once per actor in ``__init__``).

The reference engine has only EXACT content dedup (a shared probe table,
``crawler/Crawler.java:178-190``); near-dup sketches are part of the
training-data-pipeline extension this engine adds (MinHash/LSH per
Broder 1997; SimHash per Charikar 2002 — public algorithms).
"""

from __future__ import annotations

import numpy as np

# Mersenne prime 2^61 - 1: universal-hash modulus that fits products of
# two 61-bit values in uint128-free numpy via Python ints avoided — we
# use uint64 arithmetic with a smaller prime to stay vectorized.
_MERSENNE = np.uint64((1 << 61) - 1)
_MAX_HASH = np.uint64((1 << 61) - 1)


def hash_tokens_u64(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit hashes of tokens (stable across processes —
    NOT Python ``hash``, which is salted)."""
    import hashlib

    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        out[i] = np.uint64(
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
        )
    return out


def shingle_hashes(tokens: list[str], n: int = 3) -> np.ndarray:
    """Distinct hashed n-gram (word) shingles of a token sequence.

    Hashing shingles (instead of materializing strings) keeps the
    per-doc working set to 8 bytes/shingle — the representation that
    survives 100 TB corpora.
    """
    if len(tokens) < n:
        # short doc: treat the whole doc as one shingle
        joined = " ".join(tokens)
        return hash_tokens_u64([joined]) if joined else np.empty(0, np.uint64)
    th = hash_tokens_u64(tokens)
    # polynomial combination of the n token hashes per window (vectorized)
    acc = np.zeros(len(tokens) - n + 1, dtype=np.uint64)
    mult = np.uint64(0x9E3779B97F4A7C15)
    for j in range(n):
        acc = acc * mult + th[j : j + len(acc)]
    return np.unique(acc)


def minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) coefficient vectors for ``num_perm`` universal hash
    permutations h_i(x) = (a_i * x + b_i) mod p. Deterministic in seed."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a shingle-hash set.

    Vectorized outer product: (num_perm, n_shingles) in one shot; uint64
    overflow wraps, which is fine for universal hashing as long as both
    sides compute identically (they do: same dtype, same op order).
    """
    if shingles.size == 0:
        return np.full(a.shape[0], _MAX_HASH, dtype=np.uint64)
    # (P,1)*(1,S) + (P,1) -> min over S
    vals = (a[:, None] * shingles[None, :] + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


def lsh_band_keys(sig: np.ndarray, num_bands: int) -> list[int]:
    """Band bucket keys: hash each band's rows to one int. Two docs land
    in the same (band_idx, key) bucket iff the band's rows all match —
    the classic b-band/r-row LSH collision schedule."""
    rows = sig.shape[0] // num_bands
    keys = []
    mult = np.uint64(0xC2B2AE3D27D4EB4F)
    for bidx in range(num_bands):
        band = sig[bidx * rows : (bidx + 1) * rows]
        acc = np.uint64(bidx + 1)
        for v in band:
            acc = acc * mult + v
        keys.append(int(acc.view(np.int64)))  # signed wrap: fits Arrow int64
    return keys


def minhash_est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Unbiased Jaccard estimate = fraction of agreeing signature slots."""
    return float(np.count_nonzero(sig_a == sig_b)) / sig_a.shape[0]


def simhash64(tokens: list[str], tfs: np.ndarray | None = None) -> int:
    """64-bit SimHash of a token multiset (tf-weighted bit votes)."""
    if not tokens:
        return 0
    th = hash_tokens_u64(tokens)
    if tfs is None:
        tfs = np.ones(len(tokens), dtype=np.int64)
    bits = (th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    votes = ((bits.astype(np.int64) * 2) - 1) * tfs[:, None].astype(np.int64)
    col = votes.sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if col[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_chunk_keys(sim: int, num_chunks: int = 4) -> list[tuple[int, int]]:
    """Split the 64-bit simhash into ``num_chunks`` equal chunks.
    Pigeonhole: two hashes within hamming distance < num_chunks share at
    least one identical chunk — bucket by (chunk_idx, chunk_value)."""
    width = 64 // num_chunks
    mask = (1 << width) - 1
    return [(i, (sim >> (i * width)) & mask) for i in range(num_chunks)]


def rolling_fingerprint(tokens: list[str], window: int = 8) -> int:
    """Document fingerprint: min-sampled polynomial rolling hash over
    token windows (winnowing-style single fingerprint; Schleimer et al.
    2003). Deterministic content id robust to doc-order of metadata."""
    if not tokens:
        return 0
    return rolling_fingerprint_from_hashes(hash_tokens_u64(tokens), window)


def rolling_fingerprint_from_hashes(th: np.ndarray, window: int = 8) -> int:
    """Same fingerprint from PRE-HASHED tokens — lets a batch stage hash
    each distinct token once (dictionary-encoded) instead of re-hashing
    per document."""
    if th.size == 0:
        return 0
    mult = np.uint64(0x100000001B3)
    if th.size <= window:
        acc = np.uint64(0)
        for v in th:
            acc = acc * mult + v
        return int(acc)
    acc = np.zeros(th.size - window + 1, dtype=np.uint64)
    for j in range(window):
        acc = acc * mult + th[j : j + acc.size]
    return int(acc.min())
