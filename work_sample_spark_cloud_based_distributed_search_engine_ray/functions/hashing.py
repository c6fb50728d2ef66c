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


def hash64_array(values: Iterable[str | bytes]) -> np.ndarray:
    """Vectorized-ish hash64 over a column (md5 per value; C-speed digest)."""
    return np.fromiter((hash64(v) for v in values), dtype=np.int64)


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
