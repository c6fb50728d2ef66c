"""Bit-identity of the vectorized hash64_array vs the per-value md5.

Doc ids (hash64(url)) are the engine's stable identity: they must be
identical no matter which code path computes them, or shards stop being
byte-identical across builds. The DuckDB md5_number_upper fast path is
therefore asserted equal to ``int.from_bytes(md5(v).digest()[:8],'big')``
per value, over strings, large_strings, bytes, unicode, and empties.
"""

import numpy as np
import pyarrow as pa

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
    _hash64_array_py,
    hash64,
    hash64_array,
)

URLS = [
    "https://example.com/",
    "https://example.com/a?b=1&c=2",
    "",
    "über/straße/☃",
    "x" * 10_000,
] + [f"https://host{i % 13}.test/p/{i}" for i in range(2_000)]


def test_hash64_array_matches_per_value_strings():
    fast = hash64_array(URLS)
    slow = _hash64_array_py(URLS)
    assert fast.dtype == np.int64
    assert (fast == slow).all()
    assert fast[0] == hash64(URLS[0])


def test_hash64_array_arrow_inputs():
    arr = pa.array(URLS, pa.string())
    assert (hash64_array(arr) == _hash64_array_py(URLS)).all()
    large = pa.array(URLS, pa.large_string())
    assert (hash64_array(large) == _hash64_array_py(URLS)).all()
    chunked = pa.chunked_array([URLS[:100], URLS[100:]], pa.string())
    assert (hash64_array(chunked) == _hash64_array_py(URLS)).all()


def test_hash64_array_bytes_and_empty():
    bs = [u.encode() for u in URLS[:50]]
    assert (hash64_array(pa.array(bs, pa.binary())) == _hash64_array_py(bs)).all()
    assert hash64_array([]).size == 0
    assert hash64_array(pa.array([], pa.string())).size == 0


def test_hash64_nonnegative_int63():
    vals = hash64_array(URLS)
    assert (vals >= 0).all()


def test_hash64_array_rejects_nulls():
    import pytest

    for n in (10, 5000):  # both the loop and the engine path
        arr = pa.array((["x"] * n) + [None], pa.string())
        with pytest.raises(TypeError):
            hash64_array(arr)
