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


# --------------------------------------------------------------------------
# batch (multi-doc) sketch kernels — bit-identical to the per-doc
# functions above (asserted by tests/test_dedup.py), but one numpy pass
# per batch instead of a Python loop per document.
# --------------------------------------------------------------------------

_SHINGLE_MULT = np.uint64(0x9E3779B97F4A7C15)


def window_hashes_flat(th: np.ndarray, n: int) -> np.ndarray:
    """Polynomial n-window hashes over a FLAT token-hash array: one
    value per window start (size - n + 1 of them). Identical arithmetic
    to ``shingle_hashes``'s long-doc branch; the caller masks out
    windows that straddle a document boundary."""
    w = th.size - n + 1
    if w <= 0:
        return np.empty(0, np.uint64)
    acc = np.zeros(w, dtype=np.uint64)
    for j in range(n):
        acc = acc * _SHINGLE_MULT + th[j : j + w]
    return acc


def minhash_from_segments(
    sh_flat: np.ndarray,
    seg_offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    *,
    chunk: int = 1 << 16,
) -> np.ndarray:
    """MinHash signatures for many shingle-hash segments at once.

    ``sh_flat`` concatenates every segment's shingle hashes;
    ``seg_offsets`` (len S+1, strictly increasing — every segment
    non-empty) delimits them. Returns (S, num_perm) uint64, each row
    bit-identical to ``minhash_signature(sh_flat[o_i:o_{i+1}], a, b)``
    (duplicates in a segment cannot change a min, so de-duplication of
    shingles is unnecessary). Work proceeds in ~``chunk``-shingle slabs
    aligned to segment boundaries so peak memory is
    num_perm * chunk * 8 B regardless of corpus size; a single segment
    longer than ``chunk`` is folded with a running minimum.
    """
    num_seg = len(seg_offsets) - 1
    num_perm = a.shape[0]
    out = np.empty((num_seg, num_perm), dtype=np.uint64)
    s0 = 0
    while s0 < num_seg:
        # largest s1 with seg_offsets[s1] <= f0 + chunk: a segment that
        # CROSSES the chunk boundary must be excluded from the slab
        # (else a small segment before a huge one drags the huge one
        # into a single (num_perm, huge) allocation, bypassing the
        # oversized-segment fold below and its memory bound)
        s1 = int(np.searchsorted(seg_offsets, seg_offsets[s0] + chunk, side="right")) - 1
        s1 = min(max(s1, s0 + 1), num_seg)
        f0, f1 = int(seg_offsets[s0]), int(seg_offsets[s1])
        if s1 == s0 + 1 and f1 - f0 > chunk:
            # one oversized segment: running min over pieces
            acc = np.full(num_perm, _MAX_HASH, dtype=np.uint64)
            for p0 in range(f0, f1, chunk):
                sh = sh_flat[p0 : min(p0 + chunk, f1)]
                vals = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE
                np.minimum(acc, vals.min(axis=1), out=acc)
            out[s0] = acc
        else:
            sh = sh_flat[f0:f1]
            vals = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE  # (P, F)
            starts = (seg_offsets[s0:s1] - f0).astype(np.intp)
            out[s0:s1] = np.minimum.reduceat(vals, starts, axis=1).T
        s0 = s1
    return out


def band_keys_matrix(sigs: np.ndarray, num_bands: int) -> np.ndarray:
    """``lsh_band_keys`` for a whole (n_docs, num_perm) signature
    matrix at once: returns (n_docs, num_bands) int64, row-identical to
    the per-doc function."""
    n, num_perm = sigs.shape
    rows = num_perm // num_bands
    mult = np.uint64(0xC2B2AE3D27D4EB4F)
    sig3 = sigs.reshape(n, num_bands, rows)
    acc = np.broadcast_to(
        np.arange(1, num_bands + 1, dtype=np.uint64), (n, num_bands)
    ).copy()
    for r in range(rows):
        acc = acc * mult + sig3[:, :, r]
    return acc.view(np.int64)


def simhash_batch(th: np.ndarray, parents: np.ndarray, n_docs: int) -> np.ndarray:
    """``simhash64`` for every doc of a batch from the FLAT token-hash
    array (one entry per token OCCURRENCE — tf-weighting is implicit).
    Returns uint64[n_docs]; empty docs hash to 0. Processes docs in
    ~64k-token slabs so the 64-wide bit-vote matrix stays bounded."""
    out = np.zeros(n_docs, dtype=np.uint64)
    if th.size == 0:
        return out
    counts = np.bincount(parents, minlength=n_docs)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    shifts = np.arange(64, dtype=np.uint64)
    d0 = 0
    slab = 1 << 16
    while d0 < n_docs:
        # same boundary rule as minhash_from_segments: exclude the doc
        # that crosses the slab boundary so the 64-wide vote matrix
        # stays ~slab rows (a single oversized doc still processes
        # whole — there is no smaller correct unit for it)
        d1 = int(np.searchsorted(offsets, offsets[d0] + slab, side="right")) - 1
        d1 = min(max(d1, d0 + 1), n_docs)
        f0, f1 = int(offsets[d0]), int(offsets[d1])
        if f1 == f0:
            d0 = d1
            continue
        t = th[f0:f1]
        votes = (((t[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32) * 2) - 1
        nonempty = np.flatnonzero(counts[d0:d1] > 0)
        starts = (offsets[d0 + nonempty] - f0).astype(np.intp)
        col = np.add.reduceat(votes, starts, axis=0)  # (n_nonempty, 64)
        vals = ((col > 0).astype(np.uint64) << shifts[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        out[d0 + nonempty] = vals
        d0 = d1
    return out


def pairwise_hamming_matrix(h: np.ndarray) -> np.ndarray:
    """(k, k) hamming distances of uint64 hashes (numpy<2 has no
    bitwise_count; popcount via unpackbits on the byte view)."""
    k = h.shape[0]
    x = np.bitwise_xor(h[:, None], h[None, :])
    return np.unpackbits(x.view(np.uint8).reshape(k, k, 8), axis=2).sum(
        axis=2, dtype=np.int64
    )


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
