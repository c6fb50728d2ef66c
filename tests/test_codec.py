"""Posting codec: varint/delta round-trip, block boundaries, merge
associativity (FIXTURES.md §4)."""

import numpy as np
import pytest

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.codec import (
    BLOCK,
    decode_postings,
    encode_postings,
    merge_encoded_runs,
    varint_decode,
    varint_encode,
)


@pytest.mark.parametrize(
    "vals",
    [
        [0],
        [1, 127, 128, 129, 16383, 16384],
        [2**35, 2**62, 0, 5],
        [],
    ],
)
def test_varint_roundtrip_edges(vals):
    a = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(a)), a)


def test_varint_roundtrip_random():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 2**45, size=20000).astype(np.uint64)
    assert np.array_equal(varint_decode(varint_encode(a), 20000), a)


@pytest.mark.parametrize("n", [0, 1, BLOCK - 1, BLOCK, BLOCK + 1, 5 * BLOCK + 17])
def test_postings_roundtrip_block_boundaries(n):
    rng = np.random.default_rng(n)
    ids = np.unique(rng.integers(0, 2**62, size=max(n, 1)).astype(np.int64))[:n]
    tfs = rng.integers(1, 99, size=ids.size).astype(np.int64)
    enc = encode_postings(ids, tfs)
    di, dt = decode_postings(enc["doc_blob"], enc["tf_blob"], enc["n"])
    assert np.array_equal(di, ids) and np.array_equal(dt, tfs)
    assert len(enc["block_last_id"]) == (ids.size + BLOCK - 1) // BLOCK
    for b in range(len(enc["block_last_id"])):
        blk = tfs[b * BLOCK : (b + 1) * BLOCK]
        assert enc["block_max_tf"][b] == blk.max()
        assert enc["block_last_id"][b] == ids[min((b + 1) * BLOCK - 1, ids.size - 1)]


def test_encode_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_postings(np.array([5, 3], dtype=np.int64), np.array([1, 1], dtype=np.int64))


def test_merge_runs_order_insensitive():
    rng = np.random.default_rng(11)
    ids = np.unique(rng.integers(0, 2**60, size=4000).astype(np.int64))
    tfs = rng.integers(1, 9, size=ids.size).astype(np.int64)
    full = encode_postings(ids, tfs)
    cuts = [0, 500, 1500, 2500, ids.size]
    runs = []
    for a, b in zip(cuts[:-1], cuts[1:]):
        e = encode_postings(ids[a:b], tfs[a:b])
        runs.append((e["doc_blob"], e["tf_blob"], e["n"]))
    for perm in ([2, 0, 3, 1], [3, 2, 1, 0], [0, 1, 2, 3]):
        m = merge_encoded_runs([runs[i] for i in perm])
        assert m["doc_blob"] == full["doc_blob"]
        assert m["tf_blob"] == full["tf_blob"]
        assert np.array_equal(m["block_last_id"], full["block_last_id"])


def test_merge_sums_tf_on_same_doc():
    e1 = encode_postings(np.array([10, 20], dtype=np.int64), np.array([1, 2], dtype=np.int64))
    e2 = encode_postings(np.array([20, 30], dtype=np.int64), np.array([3, 4], dtype=np.int64))
    m = merge_encoded_runs(
        [(e1["doc_blob"], e1["tf_blob"], 2), (e2["doc_blob"], e2["tf_blob"], 2)]
    )
    ids, tfs = decode_postings(m["doc_blob"], m["tf_blob"], m["n"])
    assert ids.tolist() == [10, 20, 30]
    assert tfs.tolist() == [1, 5, 4]
