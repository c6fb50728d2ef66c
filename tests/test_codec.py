"""Posting codec: varint/delta round-trip, block boundaries, merge
associativity (FIXTURES.md §4). Postings carry (doc_id, tf, dl) — the
per-posting document length travels in its own varint blob so scoring
needs no doc-length side table."""

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


def test_varint_roundtrip_single_byte_fastpath():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 128, size=5000).astype(np.uint64)
    buf = varint_encode(a)
    assert len(buf) == a.size  # one byte per value
    assert np.array_equal(varint_decode(buf, a.size), a)


def _rand_postings(n, seed):
    rng = np.random.default_rng(seed)
    ids = np.unique(rng.integers(0, 2**62, size=max(n, 1)).astype(np.int64))[:n]
    tfs = rng.integers(1, 99, size=ids.size).astype(np.int64)
    dls = rng.integers(20, 2000, size=ids.size).astype(np.int64)
    return ids, tfs, dls


@pytest.mark.parametrize("n", [0, 1, BLOCK - 1, BLOCK, BLOCK + 1, 5 * BLOCK + 17])
def test_postings_roundtrip_block_boundaries(n):
    ids, tfs, dls = _rand_postings(n, n)
    enc = encode_postings(ids, tfs, dls)
    di, dt, dd = decode_postings(enc["doc_blob"], enc["tf_blob"], enc["dl_blob"], enc["n"])
    assert np.array_equal(di, ids) and np.array_equal(dt, tfs) and np.array_equal(dd, dls)
    assert len(enc["block_last_id"]) == (ids.size + BLOCK - 1) // BLOCK
    for b in range(len(enc["block_last_id"])):
        blk_tf = tfs[b * BLOCK : (b + 1) * BLOCK]
        blk_dl = dls[b * BLOCK : (b + 1) * BLOCK]
        assert enc["block_max_tf"][b] == blk_tf.max()
        assert enc["block_min_dl"][b] == blk_dl.min()
        assert enc["block_last_id"][b] == ids[min((b + 1) * BLOCK - 1, ids.size - 1)]


def test_encode_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_postings(
            np.array([5, 3], dtype=np.int64),
            np.array([1, 1], dtype=np.int64),
            np.array([9, 9], dtype=np.int64),
        )


def test_merge_runs_order_insensitive():
    ids, tfs, dls = _rand_postings(4000, 11)
    full = encode_postings(ids, tfs, dls)
    cuts = [0, 500, 1500, 2500, ids.size]
    runs = []
    for a, b in zip(cuts[:-1], cuts[1:]):
        e = encode_postings(ids[a:b], tfs[a:b], dls[a:b])
        runs.append((e["doc_blob"], e["tf_blob"], e["dl_blob"], e["n"]))
    for perm in ([2, 0, 3, 1], [3, 2, 1, 0], [0, 1, 2, 3]):
        m = merge_encoded_runs([runs[i] for i in perm])
        assert m["doc_blob"] == full["doc_blob"]
        assert m["tf_blob"] == full["tf_blob"]
        assert m["dl_blob"] == full["dl_blob"]
        assert np.array_equal(m["block_last_id"], full["block_last_id"])
        assert np.array_equal(m["block_min_dl"], full["block_min_dl"])


def test_merge_sums_tf_on_same_doc():
    e1 = encode_postings(
        np.array([10, 20], dtype=np.int64),
        np.array([1, 2], dtype=np.int64),
        np.array([50, 60], dtype=np.int64),
    )
    e2 = encode_postings(
        np.array([20, 30], dtype=np.int64),
        np.array([3, 4], dtype=np.int64),
        np.array([60, 70], dtype=np.int64),
    )
    m = merge_encoded_runs(
        [
            (e1["doc_blob"], e1["tf_blob"], e1["dl_blob"], 2),
            (e2["doc_blob"], e2["tf_blob"], e2["dl_blob"], 2),
        ]
    )
    ids, tfs, dls = decode_postings(m["doc_blob"], m["tf_blob"], m["dl_blob"], m["n"])
    assert ids.tolist() == [10, 20, 30]
    assert tfs.tolist() == [1, 5, 4]
    assert dls.tolist() == [50, 60, 70]
