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


def test_binary_values_view_matches_join():
    import pyarrow as pa

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.codec import (
        binary_values_view,
    )

    vals = [b"abc", b"", b"\x80\xffxyz", b"q"]
    for typ in (pa.binary(), pa.large_binary()):
        arr = pa.array(vals, typ)
        assert bytes(binary_values_view(arr)) == b"".join(vals)
        # sliced window (non-zero array offset)
        assert bytes(binary_values_view(arr.slice(1, 2))) == b"" + b"\x80\xffxyz"
        # chunked
        ch = pa.chunked_array([pa.array(vals[:2], typ), pa.array(vals[2:], typ)])
        assert bytes(binary_values_view(ch)) == b"".join(vals)
    # empty array and all-empty elements
    assert bytes(binary_values_view(pa.array([], pa.binary()))) == b""
    assert bytes(binary_values_view(pa.array([b"", b""], pa.binary()))) == b""


def test_decode_runs_concat_accepts_concatenated_view():
    import pyarrow as pa

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.codec import (
        binary_values_view,
        decode_runs_concat,
        encode_postings,
    )

    rng = np.random.default_rng(7)
    runs = []
    for _ in range(5):
        n = int(rng.integers(1, 300))
        ids = np.sort(rng.choice(10_000, size=n, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 9, n).astype(np.int64)
        dls = rng.integers(10, 500, n).astype(np.int64)
        runs.append((encode_postings(ids, tfs, dls), ids, tfs, dls))
    ns = np.array([r[1].size for r in runs], dtype=np.int64)
    lists = (
        [r[0]["doc_blob"] for r in runs],
        [r[0]["tf_blob"] for r in runs],
        [r[0]["dl_blob"] for r in runs],
    )
    a = decode_runs_concat(*lists, ns)
    views = tuple(binary_values_view(pa.array(col, pa.binary())) for col in lists)
    b = decode_runs_concat(*views, ns)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)
