"""Posting-list compression: docID delta + varint, block-max metadata.

Replaces the reference's comma-joined string postings
(``index`` table ``acc = "docKey1:freq1,docKey2:freq2,..."`` — producer
inferred from consumer ``search/Searcher.java:80-101``) with the
standard compressed layout used by real engines:

- doc_ids sorted ascending, delta-encoded, LEB128-varint packed
- term frequencies varint packed, parallel to doc_ids
- fixed-size blocks (``BLOCK`` postings) with per-block
  (last_doc_id, max_tf) metadata — the skip pointers and block-max
  bounds that drive Block-Max WAND (`pipelines.query`).

Both encode and decode are numpy-vectorized (no per-posting Python
loop) — this code runs inside the hot ``groupby(term).map_groups``
stage of the index build.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128  # postings per skip block

_U64 = np.uint64
_SEVEN = _U64(7)
_MASK7 = _U64(0x7F)
_CONT = np.uint8(0x80)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int array (vectorized)."""
    v = values.astype(np.uint64, copy=False)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length/7), min 1
    bit_length = 64 - _clz64(np.maximum(v, _U64(1)))
    nbytes = np.maximum((bit_length + 6) // 7, 1).astype(np.int64)
    ends = np.cumsum(nbytes)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    starts = ends - nbytes
    rem = v.copy()
    alive = np.ones(v.size, dtype=bool)
    for k in range(10):
        if not alive.any():
            break
        idx = starts[alive] + k
        byte = (rem[alive] & _MASK7).astype(np.uint8)
        more = k + 1 < nbytes[alive]
        out[idx] = byte | np.where(more, _CONT, np.uint8(0))
        rem[alive] = rem[alive] >> _SEVEN
        # advance: values with more bytes remain alive
        nxt = alive.copy()
        nxt[alive] = more
        alive = nxt
    return out.tobytes()


def _clz64(v: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64s via float64 exponent (exact for
    values < 2^53; larger values corrected by a check)."""
    # bit_length via np.log2 is unsafe near powers of two; use a loop on
    # 8 shifted comparisons instead: bit_length = position of highest set bit.
    bl = np.zeros(v.shape, dtype=np.int64)
    x = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = x >= (_U64(1) << _U64(shift))
        bl[m] += shift
        x[m] = x[m] >> _U64(shift)
    bl[v > 0] += 1
    return 64 - bl


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 buffer -> uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(b < 0x80)  # terminator byte of each varint
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    n = ends.size
    vals = np.zeros(n, dtype=np.uint64)
    maxlen = int(lengths.max())
    for k in range(maxlen):
        m = lengths > k
        vals[m] |= (b[starts[m] + k] & 0x7F).astype(np.uint64) << _U64(7 * k)
    if count is not None and n != count:
        raise ValueError(f"varint_decode: expected {count} values, got {n}")
    return vals


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> dict:
    """Encode one term's postings (doc_ids MUST be sorted ascending,
    unique). Returns the shard-row payload columns."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    n = doc_ids.size
    if n:
        deltas = np.empty_like(doc_ids)
        deltas[0] = doc_ids[0]
        np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
        if deltas[1:].size and (deltas[1:] <= 0).any():
            raise ValueError("doc_ids not strictly ascending")
        # delta restarts at every block boundary (absolute doc_id there),
        # so any block is independently decodable — real skip semantics.
        starts = np.arange(0, n, BLOCK)
        deltas[starts] = doc_ids[starts]
    else:
        deltas = doc_ids
    # block-max metadata
    nblocks = (n + BLOCK - 1) // BLOCK
    last_ids = doc_ids[np.minimum(np.arange(1, nblocks + 1) * BLOCK - 1, n - 1)] if n else doc_ids
    max_tf = (
        np.array([tfs[i * BLOCK : (i + 1) * BLOCK].max() for i in range(nblocks)], dtype=np.int64)
        if n
        else tfs
    )
    return {
        "n": n,
        "doc_blob": varint_encode(deltas),
        "tf_blob": varint_encode(tfs),
        "block_last_id": last_ids,
        "block_max_tf": max_tf,
    }


def decode_postings(doc_blob: bytes, tf_blob: bytes, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode a term's postings -> (doc_ids ascending int64, tfs int64).

    Inverts the per-block delta restarts: cumsum within each block.
    """
    deltas = varint_decode(doc_blob, n).astype(np.int64)
    doc_ids = np.cumsum(deltas)
    # undo the cross-block carry introduced by the global cumsum: at each
    # block start the stored value is absolute, so subtract the running
    # total accumulated before that block. Intermediate int64 wraparound
    # is intentional (mod-2^64 arithmetic; final values are in range).
    starts = np.arange(BLOCK, n, BLOCK)
    if starts.size:
        carry = doc_ids[starts] - deltas[starts]
        for j, s in enumerate(starts):
            doc_ids[s : s + BLOCK] -= carry[j]
    tfs = varint_decode(tf_blob, n).astype(np.int64)
    return doc_ids, tfs


def merge_encoded_runs(runs: list[tuple[bytes, bytes, int]]) -> dict:
    """Merge several encoded postings runs of ONE term (disjoint doc_id
    sets, e.g. salted sub-groups or per-checkpoint-partition runs) into
    a single encoded posting list. Decode -> merge-sort -> re-encode;
    associative and order-insensitive (FIXTURES.md §4 'Merge')."""
    ids_parts, tf_parts = [], []
    for doc_blob, tf_blob, n in runs:
        i, t = decode_postings(doc_blob, tf_blob, n)
        ids_parts.append(i)
        tf_parts.append(t)
    ids = np.concatenate(ids_parts) if ids_parts else np.empty(0, np.int64)
    tfs = np.concatenate(tf_parts) if tf_parts else np.empty(0, np.int64)
    order = np.argsort(ids, kind="stable")
    ids, tfs = ids[order], tfs[order]
    if ids.size > 1 and (np.diff(ids) == 0).any():
        # same doc contributed by two runs — sum tfs (cannot happen for
        # range-salted runs; defensive for resumed partial runs)
        uniq, inv = np.unique(ids, return_inverse=True)
        summed = np.zeros(uniq.size, dtype=np.int64)
        np.add.at(summed, inv, tfs)
        ids, tfs = uniq, summed
    return encode_postings(ids, tfs)
