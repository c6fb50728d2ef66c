"""Stable hashing: doc ids, content hashes, term->shard routing.

The reference keys every row by ``SHA-1(Base64, '/'->'@')`` of the
url/content (reference ``tools/Hasher.java:7-16``) into a
range-partitioned key space. Here doc identity is a deterministic
64-bit integer derived from the url — stable across processes, cluster
sizes and partitionings (required for exact BM25 parity between N and
4N parallelism builds), unlike Python's seeded ``hash()``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import numpy as np

_MASK63 = (1 << 63) - 1


def hash64(s: str | bytes) -> int:
    """Deterministic non-negative int64 from a string (md5 prefix).

    63-bit so the value is valid in Arrow int64 / SQL BIGINT. At
    10^12 docs the birthday bound makes collisions possible (~2^31.5
    expected-collision scale is fine; full 10^12 needs the collision
    audit in ``pipelines.build_index.audit_doc_ids``).
    """
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.md5(s).digest()[:8], "big") & _MASK63


def _hash64_array_py(values: Iterable[str | bytes]) -> np.ndarray:
    """Fallback: md5 per value in a Python loop (C-speed digest only)."""
    return np.fromiter((hash64(v) for v in values), dtype=np.int64)


def hash64_array(values) -> np.ndarray:
    """Vectorized hash64 over a column — ONE C-speed pass, no per-value
    Python.

    DuckDB's ``md5_number_upper`` computes the first 8 digest bytes of
    md5 per row as a little-endian UBIGINT; a numpy ``byteswap`` turns
    that into exactly ``int.from_bytes(digest[:8], 'big')``, so the
    result is bit-identical to :func:`hash64` per value (asserted by
    ``tests/test_hashing.py``) — doc ids and shard bytes are unchanged
    vs the per-value path. Accepts a pyarrow (Chunked)Array, numpy
    array, or any iterable of str/bytes.
    """
    import pyarrow as pa

    if isinstance(values, pa.ChunkedArray):
        arr = values.combine_chunks()
    elif isinstance(values, pa.Array):
        arr = values
    else:
        vals = values if isinstance(values, (list, tuple, np.ndarray)) else list(values)
        if len(vals) == 0:
            return np.empty(0, dtype=np.int64)
        arr = pa.array(vals)
    if len(arr) == 0:
        return np.empty(0, dtype=np.int64)
    if arr.null_count:
        # the per-value path raises on None; the engine path would
        # silently emit garbage for NULL rows — refuse identically
        raise TypeError("hash64_array: input contains nulls")
    if len(arr) < 2048:
        # the vectorized path has ~1-3 ms of fixed per-call engine
        # overhead; below ~2k values the C-digest loop is cheaper
        # (measured: a 256-url batch costs 0.25 ms looped vs ~2 ms
        # engined — at 1M docs / 256-row batches that fixed cost alone
        # re-inflated phase A by ~15 s at 4 CPUs). Same bits either way.
        return _hash64_array_py(arr.to_pylist())
    try:
        import duckdb
    except ImportError:  # pragma: no cover - duckdb is baked into the env
        return _hash64_array_py(arr.to_pylist())
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        # DuckDB's md5_number_* is VARCHAR-only; arbitrary bytes may not
        # be valid UTF-8, so the bytes path keeps the per-value digest
        # (rare: urls — the hot path — are always strings)
        return _hash64_array_py(arr.to_pylist())
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    tbl = pa.table({"v": arr})  # noqa: F841 - referenced by duckdb SQL scope
    global _DUCK
    if _DUCK is None or _DUCK[0] != __import__("os").getpid():
        conn = duckdb.connect()
        # honest CPU accounting inside Ray workers: DuckDB defaults its
        # pool to ALL physical cores, so a 1-CPU-booked task would
        # silently fan the md5 pass across the node (overstating
        # low-parallelism runs and thrashing high-parallelism ones —
        # N workers x 32 threads). One thread per booked CPU.
        try:
            conn.execute("SET threads TO 1")
        except Exception:
            pass
        _DUCK = (__import__("os").getpid(), conn)
    out = _DUCK[1].execute("select md5_number_upper(v) as h from tbl").fetch_arrow_table()
    h = out["h"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
    return (h.byteswap() & np.uint64(_MASK63)).astype(np.int64)


# per-process cached (pid, connection) — a forked Ray worker must not
# reuse the parent's native connection handle
_DUCK = None


def sha1_hex(data: bytes | str) -> str:
    """Exact-content hash used for content dedup (reference
    ``contentSeen`` table, ``crawler/Crawler.java:178-190``)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return hashlib.sha1(data).hexdigest()


def term_shard(term: str, num_shards: int) -> int:
    """Route a term to its index shard (hash partitioning replaces the
    reference's range-partitioned KVS routing, ``kvs/KVSClient.java:188-198``)."""
    return hash64(term) % num_shards
