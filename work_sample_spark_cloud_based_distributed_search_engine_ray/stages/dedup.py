"""Deduplication operators: exact, MinHash+LSH, SimHash, exact n-gram
Jaccard.

The reference has only exact content dedup via a shared probe table
(``crawler/Crawler.java:178-190``, the ``contentSeen`` KVS table); this
module re-expresses that as a shuffle (no shared mutable state) and adds
the near-dup family a training-data pipeline needs.

Shuffle discipline (the 100 TB design):
- ``exact_dedup_summary``: hash locally per batch, then groupby(md5) of
  NARROW columns only (hash + id) — text never enters the shuffle.
- MinHash/SimHash: signatures are computed in an actor-pool map_batches
  (permutation tables built once per actor), then only
  (bucket_key, doc_id, signature) rows shuffle — one groupby per
  pipeline. Candidate groups are capped (``max_bucket``) so a degenerate
  bucket (all-identical boilerplate) cannot emit O(n^2) pairs; drops are
  logged in the output's ``truncated`` accounting column.
- Exact n-gram Jaccard: shingle-explode -> groupby(shingle) pair
  emission -> groupby(pair) count. Hot-shingle groups are capped the
  same way (a shingle shared by k docs emits k(k-1)/2 pairs — the skew
  analog of hot terms in the postings shuffle; same defusal strategy).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from ..functions.sketches import (
    band_keys_matrix,
    hash_tokens_u64,
    minhash_from_segments,
    minhash_params,
    minhash_signature,
    simhash_batch,
    window_hashes_flat,
)
from ..functions.tokenize import flat_tokens_batch
from .ops import bucket_mix
from .shuffle import hash_map_groups, hash_partitions, packed_map_groups


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dedup_summary(ds: rd.Dataset, *, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Exact content dedup: one row per distinct content with the
    canonical (min) id and the copy count.

    Output: text_md5, canonical_doc_id, n_copies.
    """

    def hash_batch(batch: pa.Table) -> pa.Table:
        md5s = [hashlib.md5(t.encode()).hexdigest() for t in batch[text_col].to_pylist()]
        return pa.table({"text_md5": pa.array(md5s, pa.string()), id_col: batch[id_col]})

    return (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(Min(id_col, alias_name="canonical_doc_id"), Count(alias_name="n_copies"))
    )


def exact_dup_losers(ds: rd.Dataset, *, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Rows for the non-canonical copies only: (doc_id, canonical_doc_id).
    The Ray analog of the reference's ``canonicalURL`` pointer column."""

    num_buckets = 256

    def hash_batch(batch: pa.Table) -> pa.Table:
        md5s = [hashlib.md5(t.encode()).hexdigest() for t in batch[text_col].to_pylist()]
        bucket = np.fromiter(
            (int(m[:8], 16) % num_buckets for m in md5s), dtype=np.int64, count=len(md5s)
        )
        return pa.table(
            {
                "text_md5": pa.array(md5s, pa.string()),
                id_col: batch[id_col],
                "__bucket": pa.array(bucket),
            }
        )

    def losers_of_bucket(group: pa.Table) -> pa.Table:
        # BOUNDED bucket of the content hash, one vectorized pass for
        # every md5 run in it — never a per-distinct-hash Python call
        idx = pc.sort_indices(
            group, sort_keys=[("text_md5", "ascending"), (id_col, "ascending")]
        )
        g = group.take(idx)
        m = g["text_md5"].combine_chunks().dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        )
        ids = g[id_col].to_numpy(zero_copy_only=False)
        first = np.ones(len(m), dtype=bool)
        first[1:] = m[1:] != m[:-1]
        run_id = np.cumsum(first) - 1
        canon = ids[np.flatnonzero(first)][run_id]
        keep = ~first
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "canonical_doc_id": pa.array(canon[keep]),
            }
        )

    return hash_map_groups(
        ds.map_batches(hash_batch, batch_format="pyarrow"), "__bucket", losers_of_bucket
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------


class _TokenHasher:
    """Per-actor token-hash cache: each DISTINCT token's blake2b hash is
    computed once across all batches the actor sees (webtext vocab is
    Zipfian, so the hit rate approaches 1 after the first batches); the
    per-occurrence lookup is a vectorized gather."""

    def __init__(self, max_entries: int = 1 << 22):
        self._cache: dict[str, int] = {}
        self._max = max_entries

    def hashes_for_vocab(self, vocab: list[str]) -> np.ndarray:
        import hashlib as _hl

        cache = self._cache
        out = np.empty(len(vocab), dtype=np.uint64)
        admit = len(cache) < self._max
        for i, t in enumerate(vocab):
            h = cache.get(t)
            if h is None:
                h = int.from_bytes(_hl.blake2b(t.encode(), digest_size=8).digest(), "big")
                if admit:
                    cache[t] = h
            out[i] = h
        return out


def _hashed_flat_tokens(texts_col, hasher: _TokenHasher):
    """Batch tokenization + per-occurrence token hashes.

    Returns (flat: pa.StringArray, parents, th: uint64[n_occurrences],
    counts, offsets, n_docs) — ``th[parents == i]`` is exactly
    ``hash_tokens_u64(tokenize(texts[i]))`` in order."""
    flat, parents, n_docs = flat_tokens_batch(texts_col)
    counts = np.bincount(parents, minlength=n_docs).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    if len(flat) == 0:
        return flat, parents, np.empty(0, np.uint64), counts, offsets, n_docs
    d = flat.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    th = hasher.hashes_for_vocab(d.dictionary.to_pylist())[codes]
    return flat, parents, th, counts, offsets, n_docs


class MinHashStage:
    """Actor-pool stage: text -> MinHash signature (list<int64>).

    Permutation coefficients are deterministic in ``seed`` and built
    ONCE per actor in ``__init__`` — the stateful-stage pattern. The
    whole batch is tokenized with one Arrow kernel chain, shingle-hashed
    with one rolling-window pass over the flat token-hash array, and
    signed with a chunked segment-min — no per-doc Python loop
    (bit-identical to ``minhash_signature(shingle_hashes(tokenize(t)))``
    per doc; asserted by tests/test_dedup.py)."""

    def __init__(
        self,
        *,
        num_perm: int = 128,
        shingle_n: int = 3,
        seed: int = 1,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.a, self.b = minhash_params(num_perm, seed)
        self.shingle_n = shingle_n
        self.text_col = text_col
        self.id_col = id_col
        self._hasher = _TokenHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_sh = self.shingle_n
        num_perm = self.a.shape[0]
        flat, parents, th, counts, offsets, n_docs = _hashed_flat_tokens(
            batch[self.text_col], self._hasher
        )
        from ..functions.sketches import _MAX_HASH

        sigs = np.full((n_docs, num_perm), _MAX_HASH, dtype=np.uint64)

        # long docs (>= n tokens): rolling n-window hashes over the flat
        # array; windows straddling a doc boundary are masked out
        long_ids = np.flatnonzero(counts >= n_sh)
        if long_ids.size:
            wh_all = window_hashes_flat(th, n_sh)
            w = wh_all.size
            pos_in_doc = np.arange(w) - offsets[parents[:w]]
            valid = pos_in_doc <= counts[parents[:w]] - n_sh
            wh = wh_all[valid]  # grouped by doc, doc order preserved
            seg_off = np.concatenate(([0], np.cumsum(counts[long_ids] - n_sh + 1)))
            sigs[long_ids] = minhash_from_segments(wh, seg_off, self.a, self.b)

        # short docs (0 < len < n): single whole-doc shingle (rare)
        for d in np.flatnonzero((counts > 0) & (counts < n_sh)):
            toks = flat.slice(offsets[d], counts[d]).to_pylist()
            sh = hash_tokens_u64([" ".join(toks)])
            sigs[d] = minhash_signature(sh, self.a, self.b)

        sig_list = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n_docs + 1) * num_perm, num_perm, dtype=np.int32)),
            pa.array(sigs.view(np.int64).ravel()),
        )
        return pa.table({"doc_id": batch[self.id_col], "sig": sig_list})


_EMPTY_EST_PAIRS = pa.table(
    {
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "est_jaccard": pa.array([], pa.float64()),
        "truncated": pa.array([], pa.bool_()),
    }
)


def _band_runs(group: pa.Table, key_col: str, max_bucket: int):
    """Common prep for a BOUNDED band-bucket group holding many exact
    band-key runs: sort by (band key, doc_id), detect runs, cap each run
    at ``max_bucket`` members (lowest doc_ids kept — skew protection,
    identical semantics to the old per-key group cap). Returns
    (ids_sorted, sorted_row_indices, run_starts, capped_lens,
    truncated_flags) with runs of length < 2 already dropped."""
    m = group.num_rows
    bk = group[key_col].to_numpy(zero_copy_only=False)
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, bk))
    bk_s, ids_s = bk[order], ids[order]
    starts = np.concatenate(([0], np.flatnonzero(np.diff(bk_s)) + 1))
    lens = np.diff(np.concatenate((starts, [m])))
    multi = lens > 1
    starts, lens = starts[multi], lens[multi]
    capped = np.minimum(lens, max_bucket)
    return ids_s, order, starts, capped, lens > max_bucket


def _pairs_from_band_bucket(
    group: pa.Table, est_threshold: float, max_bucket: int, num_perm: int
) -> pa.Table:
    """All (a<b) candidate pairs of every exact band-key run inside one
    BOUNDED band bucket, est-Jaccard-filtered. One Python call handles
    the whole bucket: runs are batched by capped length class and each
    class is compared as a single (n_runs x n_pairs, P) slot tensor —
    no per-band-key Python call (the old plan made one ``map_groups``
    call per DISTINCT band key: ~docs x bands calls corpus-wide)."""
    if group.num_rows < 2:
        return _EMPTY_EST_PAIRS
    ids_s, order, starts, capped, trunc = _band_runs(group, "band_key", max_bucket)
    if starts.size == 0:
        return _EMPTY_EST_PAIRS
    sigs = (
        pc.list_flatten(group["sig"].combine_chunks())
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
        .reshape(group.num_rows, num_perm)[order]
    )
    out_a, out_b, out_e, out_t = [], [], [], []
    for run_len in np.unique(capped):
        if run_len < 2:
            continue
        sel = capped == run_len
        rs, tr = starts[sel], trunc[sel]
        iu, ju = np.triu_indices(int(run_len), 1)
        # slab-chunk the (runs x pairs, P) compare tensor to ~32 MB
        slab = max(1, (1 << 25) // max(1, iu.size * num_perm))
        for s0 in range(0, rs.size, slab):
            r = rs[s0 : s0 + slab]
            src_a = (r[:, None] + iu[None, :]).ravel()
            src_b = (r[:, None] + ju[None, :]).ravel()
            est = (sigs[src_a] == sigs[src_b]).sum(axis=1) / num_perm
            keep = est >= est_threshold
            out_a.append(ids_s[src_a[keep]])
            out_b.append(ids_s[src_b[keep]])
            out_e.append(est[keep])
            out_t.append(np.repeat(tr[s0 : s0 + slab], iu.size)[keep])
    if not out_a:
        return _EMPTY_EST_PAIRS
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate(out_a)),
            "doc_b": pa.array(np.concatenate(out_b)),
            "est_jaccard": pa.array(np.concatenate(out_e), pa.float64()),
            "truncated": pa.array(np.concatenate(out_t), pa.bool_()),
        }
    )


def _dedup_pairs(
    pairs: rd.Dataset,
    value_aggs: list[tuple[str, str]],
    *,
    num_buckets: int = 256,
    key_cols: tuple[str, str] = ("doc_a", "doc_b"),
) -> rd.Dataset:
    """Global (doc_a, doc_b) dedup of candidate pairs (one pair can
    surface from several bands/chunks): per-batch local dedup
    (combiner), then ONE hash shuffle on a BOUNDED bucket of the mixed
    pair hash and one vectorized Arrow group_by per bucket — no per-pair
    Python call (the shuffle group count is ``num_buckets``, not the
    pair cardinality). ``value_aggs`` are Arrow (col, fn) aggregates for
    the carried value columns; every duplicate row carries the same
    sketch-derived values, so min/max are arbitrary-row-identical."""

    ka, kb = key_cols

    def local(batch: pa.Table) -> pa.Table:
        agg = batch.group_by([ka, kb]).aggregate(value_aggs)
        return agg.rename_columns([ka, kb] + [c for c, _ in value_aggs])

    def add_bucket(batch: pa.Table) -> pa.Table:
        ua = batch[ka].to_numpy(zero_copy_only=False).astype(np.uint64)
        ub = batch[kb].to_numpy(zero_copy_only=False).astype(np.uint64)
        mixed = (ua * np.uint64(0x9E3779B97F4A7C15)) ^ (
            ub * np.uint64(0xC2B2AE3D27D4EB4F)
        )
        bucket = ((mixed >> np.uint64(33)) % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column("__bucket", pa.array(bucket))

    def per_bucket(group: pa.Table) -> pa.Table:
        agg = (
            group.drop_columns(["__bucket"])
            .group_by([ka, kb])
            .aggregate(value_aggs)
        )
        return agg.rename_columns([ka, kb] + [c for c, _ in value_aggs])

    return packed_map_groups(
        pairs.map_batches(local, batch_format="pyarrow").map_batches(
            add_bucket, batch_format="pyarrow"
        ),
        "__bucket",
        per_bucket,
        num_partitions=min(hash_partitions(), num_buckets),
        num_buckets=num_buckets,
    )


def minhash_lsh_pairs(
    ds: rd.Dataset,
    *,
    num_perm: int = 128,
    num_bands: int = 32,
    shingle_n: int = 3,
    est_threshold: float = 0.5,
    max_bucket: int = 64,
    seed: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | None = None,
) -> rd.Dataset:
    """Near-dup candidate pairs via MinHash banding.

    Output: doc_a, doc_b, est_jaccard (signature estimate), truncated.
    One pair may surface from several bands — deduped by a final narrow
    groupby on the pair key.
    """
    sigs = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "shingle_n": shingle_n,
            "seed": seed,
            "text_col": text_col,
            "id_col": id_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency or 4,
    )

    # bucket count trades per-(block,bucket) IPC payload size against
    # per-group memory: 8/CPU keeps payloads ~hundreds of rows while a
    # group (bucket) holds ~bands*docs/buckets narrow rows + sigs
    num_band_buckets = max(256, 8 * hash_partitions())

    def explode_bands(batch: pa.Table) -> pa.Table:
        nb = batch.num_rows
        if nb == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "band_key": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "sig": pa.array([], pa.list_(pa.int64())),
                }
            )
        sig_col = batch["sig"].combine_chunks()
        sig_mat = (
            pc.list_flatten(sig_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .view(np.uint64)
            .reshape(nb, num_perm)
        )
        keys = band_keys_matrix(sig_mat, num_bands)  # (nb, num_bands) int64
        # route by a BOUNDED bucket of the band key; exact band-key runs
        # are re-separated inside the group (collisions are harmless)
        bucket = bucket_mix(keys.ravel(), num_band_buckets)
        rep = pa.array(np.repeat(np.arange(nb, dtype=np.int64), num_bands))
        return pa.table(
            {
                "bucket": pa.array(bucket.astype(np.int64)),
                "band_key": pa.array(keys.ravel()),
                "doc_id": batch["doc_id"].take(rep),
                "sig": sig_col.take(rep),
            }
        )

    # At 100 TB the sig payload re-shipped per band is the cost driver;
    # the alternative (narrow bucket shuffle + join sigs back by doc_id)
    # trades one shuffle for two — banding payload here is
    # num_bands * num_perm * 8B per doc, acceptable vs text size. The
    # shuffle key is a BOUNDED bucket (packed IPC payloads, one Python
    # group call per bucket) rather than the raw band key, which made
    # one map_groups call per distinct band key — ~docs x bands calls.
    pairs = packed_map_groups(
        sigs.map_batches(explode_bands, batch_format="pyarrow"),
        "bucket",
        lambda g: _pairs_from_band_bucket(g, est_threshold, max_bucket, num_perm),
        num_buckets=num_band_buckets,
    )

    # a pair surfacing from several bands carries the identical estimate
    # in every copy; 'truncated' ORs across bands (deterministic, vs the
    # old arbitrary-row pick)
    return _dedup_pairs(pairs, [("est_jaccard", "min"), ("truncated", "max")])


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------


class SimHashStage:
    """Actor-pool stage: text -> 64-bit SimHash (tf-weighted).

    One Arrow tokenize chain + one slab-chunked bit-vote pass per batch
    (bit-identical to ``simhash64(Counter(tokenize(t)))`` per doc —
    tf-weighted distinct-token votes equal one vote per occurrence)."""

    def __init__(self, *, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self._hasher = _TokenHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        _flat, parents, th, _counts, _offsets, n_docs = _hashed_flat_tokens(
            batch[self.text_col], self._hasher
        )
        out = simhash_batch(th, parents, n_docs)
        return pa.table(
            {
                "doc_id": batch[self.id_col],
                "simhash": pa.array(out.astype(np.int64)),
            }
        )


def simhash_pairs(
    ds: rd.Dataset,
    *,
    max_hamming: int = 3,
    num_chunks: int = 4,
    max_bucket: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | None = None,
) -> rd.Dataset:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole banding: with ``num_chunks`` chunks, any pair within
    hamming distance < num_chunks shares a chunk; bucket by
    (chunk_idx, chunk_value), verify exact hamming inside the bucket.
    Requires max_hamming < num_chunks for completeness (asserted).
    Output: doc_a, doc_b, hamming.
    """
    hashes = ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=concurrency or 4,
    )
    return hamming_band_pairs(
        hashes,
        hash_col="simhash",
        id_col=id_col,
        max_hamming=max_hamming,
        num_chunks=num_chunks,
        max_bucket=max_bucket,
    )


def hamming_band_pairs(
    hashes: rd.Dataset,
    *,
    hash_col: str,
    id_col: str,
    max_hamming: int = 3,
    num_chunks: int = 4,
    max_bucket: int = 256,
) -> rd.Dataset:
    """Generic 64-bit-sketch near-dup pair generation by pigeonhole
    banding (the SimHash candidate machinery, factored out so OTHER
    64-bit perceptual sketches — e.g. image pHash — reuse it): with
    ``num_chunks`` chunks any pair within hamming < num_chunks shares a
    chunk; bucket by (chunk_idx, chunk_value), popcount-verify exact
    hamming inside bounded buckets. Output: doc_a, doc_b, hamming."""
    assert max_hamming < num_chunks, "pigeonhole completeness needs max_hamming < num_chunks"

    width = 64 // num_chunks
    cmask = np.uint64((1 << width) - 1)
    num_band_buckets = max(256, 8 * hash_partitions())

    def explode_chunks(batch: pa.Table) -> pa.Table:
        nb = batch.num_rows
        sims = (
            batch[hash_col].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        )
        keys = np.empty((nb, num_chunks), dtype=np.int64)
        for c in range(num_chunks):
            keys[:, c] = (
                (np.uint64(c) << np.uint64(48)) | ((sims >> np.uint64(c * width)) & cmask)
            ).view(np.int64)
        bucket = bucket_mix(keys.ravel(), num_band_buckets)
        rep = pa.array(np.repeat(np.arange(nb, dtype=np.int64), num_chunks))
        return pa.table(
            {
                "bucket": pa.array(bucket.astype(np.int64)),
                "band_key": pa.array(keys.ravel()),
                "doc_id": batch[id_col].take(rep),
                "sketch": batch[hash_col].take(rep),
            }
        )

    empty_ham = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64()),
        }
    )

    def verify(group: pa.Table) -> pa.Table:
        """Exact hamming verify of every exact chunk-key run inside one
        bounded bucket — runs batched by capped length class, popcount
        on the pair xor vector (no per-chunk-key Python call)."""
        if group.num_rows < 2:
            return empty_ham
        ids_s, order, starts, capped, _tr = _band_runs(group, "band_key", max_bucket)
        if starts.size == 0:
            return empty_ham
        sims = (
            group["sketch"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        )[order]
        out_a, out_b, out_h = [], [], []
        for run_len in np.unique(capped):
            if run_len < 2:
                continue
            rs = starts[capped == run_len]
            iu, ju = np.triu_indices(int(run_len), 1)
            src_a = (rs[:, None] + iu[None, :]).ravel()
            src_b = (rs[:, None] + ju[None, :]).ravel()
            x = np.bitwise_xor(sims[src_a], sims[src_b])
            hv = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(
                axis=1, dtype=np.int64
            )
            keep = hv <= max_hamming
            out_a.append(ids_s[src_a[keep]])
            out_b.append(ids_s[src_b[keep]])
            out_h.append(hv[keep])
        if not out_a:
            return empty_ham
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a)),
                "doc_b": pa.array(np.concatenate(out_b)),
                "hamming": pa.array(np.concatenate(out_h)),
            }
        )

    pairs = packed_map_groups(
        hashes.map_batches(explode_chunks, batch_format="pyarrow"),
        "bucket",
        verify,
        num_buckets=num_band_buckets,
    )

    return _dedup_pairs(pairs, [("hamming", "min")])


# --------------------------------------------------------------------------
# exact n-gram Jaccard (SQL-oracle-checkable)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_docs: int = 1024,
    num_shingle_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """EXACT n-gram (word) Jaccard similarity for all pairs sharing at
    least one shingle, filtered to jaccard >= threshold.

    Plan: distinct (doc_id, shingle-string, set-size) explode (one
    Arrow kernel chain + one np.unique per batch, no per-doc loop) ->
    ONE hash shuffle on a BOUNDED bucket of the shingle (the per-group
    Python callback count is ``num_shingle_buckets``, never the shingle
    cardinality) -> per bucket: sort by (shingle, doc_id), vectorized
    run detection, and pair emission batched by run-length class (one
    ``np.triu_indices`` per DISTINCT capped run length — bounded by
    ``max_shingle_docs``) -> multi-key groupby(doc_a, doc_b) counts the
    intersection and closes |A∩B| / (|A| + |B| - |A∩B|) vectorized.
    Pairs carry both docs' set sizes (computed locally at explode time,
    no driver pass). A shingle shared by more than ``max_shingle_docs``
    docs keeps only the lowest-doc_id cap (skew protection, same
    semantics as before).

    Shingles are STRINGS (n tokens joined by a space) so the DuckDB
    oracle can reproduce the exact same sets. Output: doc_a, doc_b,
    jaccard (float64).
    """
    empty_shingled = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "shingle": pa.array([], pa.string()),
            "sz": pa.array([], pa.int64()),
        }
    )

    def explode_shingles(batch: pa.Table) -> pa.Table:
        flat, parents, n_docs = flat_tokens_batch(batch[text_col])
        counts = np.bincount(parents, minlength=n_docs).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(counts)))
        total = len(flat)
        w = total - n + 1
        if w <= 0:
            return empty_shingled
        # n shifted views joined with spaces == " ".join(toks[i:i+n])
        joined = flat.slice(0, w)
        for j in range(1, n):
            joined = pc.binary_join_element_wise(joined, flat.slice(j, w), " ")
        # windows must not straddle a doc boundary (docs shorter than n
        # emit nothing — same as the per-doc version's `continue`)
        pos_in_doc = np.arange(w) - offsets[parents[:w]]
        valid = pos_in_doc <= counts[parents[:w]] - n
        sh_arr = joined.filter(pa.array(valid))
        p_w = parents[:w][valid]
        if len(sh_arr) == 0:
            return empty_shingled
        # distinct (doc, shingle) + per-doc set size via one np.unique
        d = sh_arr.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nd = max(len(d.dictionary), 1)
        uniq = np.unique(p_w * nd + codes)
        up, uc = uniq // nd, uniq % nd
        sz_per_doc = np.bincount(up, minlength=n_docs)
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[up]),
                "shingle": d.dictionary.take(pa.array(uc)),
                "sz": pa.array(sz_per_doc[up]),
            }
        )

    shingled = ds.map_batches(explode_shingles, batch_format="pyarrow")

    from .ops import _bucket_of

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", _bucket_of(batch["shingle"], num_shingle_buckets)
        )

    empty_pairs = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "sz_a": pa.array([], pa.int64()),
            "sz_b": pa.array([], pa.int64()),
            "one": pa.array([], pa.int64()),
        }
    )

    def cooccur_bucket(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m < 2:
            return empty_pairs
        d = group["shingle"].combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        szs = group["sz"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, codes))  # shingle runs, doc_id-sorted within
        codes_s, ids_s, szs_s = codes[order], ids[order], szs[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(codes_s)) + 1))
        lens = np.diff(np.concatenate((starts, [m])))
        capped = np.minimum(lens, max_shingle_docs)
        out_a, out_b, out_sza, out_szb = [], [], [], []
        # one triu per DISTINCT capped run length, applied to every run
        # of that length at once
        for run_len in np.unique(capped):
            if run_len < 2:
                continue
            run_starts = starts[capped == run_len]
            iu, ju = np.triu_indices(int(run_len), 1)
            src_a = (run_starts[:, None] + iu[None, :]).ravel()
            src_b = (run_starts[:, None] + ju[None, :]).ravel()
            out_a.append(ids_s[src_a])
            out_b.append(ids_s[src_b])
            out_sza.append(szs_s[src_a])
            out_szb.append(szs_s[src_b])
        if not out_a:
            return empty_pairs
        a = np.concatenate(out_a)
        return pa.table(
            {
                "doc_a": pa.array(a),
                "doc_b": pa.array(np.concatenate(out_b)),
                "sz_a": pa.array(np.concatenate(out_sza)),
                "sz_b": pa.array(np.concatenate(out_szb)),
                "one": pa.array(np.ones(a.size, np.int64)),
            }
        )

    pairs = packed_map_groups(
        shingled.map_batches(add_bucket, batch_format="pyarrow"),
        "__bucket",
        cooccur_bucket,
        num_partitions=min(hash_partitions(), num_shingle_buckets),
        num_buckets=num_shingle_buckets,
    )

    inter = pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Sum("one", alias_name="inter"),
        Min("sz_a", alias_name="sz_a"),
        Min("sz_b", alias_name="sz_b"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        inter_n = batch["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        sz_a = batch["sz_a"].to_numpy(zero_copy_only=False)
        sz_b = batch["sz_b"].to_numpy(zero_copy_only=False)
        jac = inter_n / (sz_a + sz_b - inter_n)
        keep = jac >= threshold
        return pa.table(
            {
                "doc_a": batch["doc_a"].filter(pa.array(keep)),
                "doc_b": batch["doc_b"].filter(pa.array(keep)),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    return inter.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------------------
# benchmark decontamination (broadcast shingle-set membership)
# --------------------------------------------------------------------------


def doc_shingles(texts_col, doc_parents_offset: int = 0, *, n: int = 3):
    """Distinct word n-gram shingles per doc for one batch — the shared
    kernel of ``ngram_jaccard_pairs`` and ``contamination_counts``.
    Returns (doc_index: np.int64[], shingle: pa.StringArray) with one
    row per DISTINCT (doc, shingle)."""
    flat, parents, n_docs = flat_tokens_batch(texts_col)
    counts = np.bincount(parents, minlength=n_docs).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    w = len(flat) - n + 1
    if w <= 0:
        return np.empty(0, np.int64), pa.array([], pa.string())
    joined = flat.slice(0, w)
    for j in range(1, n):
        joined = pc.binary_join_element_wise(joined, flat.slice(j, w), " ")
    pos_in_doc = np.arange(w) - offsets[parents[:w]]
    valid = pos_in_doc <= counts[parents[:w]] - n
    sh_arr = joined.filter(pa.array(valid))
    p_w = parents[:w][valid]
    if len(sh_arr) == 0:
        return np.empty(0, np.int64), pa.array([], pa.string())
    d = sh_arr.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nd = max(len(d.dictionary), 1)
    uniq = np.unique(p_w * nd + codes)
    return uniq // nd, d.dictionary.take(pa.array(uniq % nd))


def contamination_counts(
    ds: rd.Dataset,
    benchmark_shingles: pa.Array,
    *,
    n: int = 3,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Benchmark DECONTAMINATION scan — the training-data hygiene pass
    that flags corpus documents overlapping an evaluation set (the
    n-gram-overlap rule used by large-corpus dedup pipelines; see e.g.
    the C4/GPT-3 appendix decontamination procedures).

    Per doc: the number of DISTINCT word ``n``-gram shingles it shares
    with the benchmark set. The benchmark shingles are ``ray.put`` ONCE
    and read zero-copy by every task (the broadcast-small-side rule) —
    the scan is a pure ``map_batches`` + filter, NO shuffle, so it
    streams at read bandwidth over any corpus size. Emits (doc_id,
    n_hits) for docs with ``n_hits >= min_hits``; dropping flagged ids
    is then an anti-join (``stages.ops.anti_join_keys``) or a broadcast
    ``is_in`` filter.
    """
    bench_ref = ray.put(benchmark_shingles)

    def scan(batch: pa.Table) -> pa.Table:
        up, sh = doc_shingles(batch[text_col], n=n)
        if len(sh) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n_hits": pa.array([], pa.int64())}
            )
        hit = pc.is_in(sh, value_set=ray.get(bench_ref)).to_numpy(zero_copy_only=False)
        n_docs = batch.num_rows
        hits_per_doc = np.bincount(up[hit], minlength=n_docs).astype(np.int64)
        keep = hits_per_doc >= min_hits
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[keep]),
                "n_hits": pa.array(hits_per_doc[keep]),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow")


def benchmark_shingle_set(
    ds: rd.Dataset,
    *,
    n: int = 3,
    n_docs: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Array:
    """Deterministic benchmark set for tests/oracles: the distinct
    ``n``-gram shingles of the ``n_docs`` lowest-``id_col`` documents
    (a stand-in for a real eval set; the sort+limit touches only
    ``n_docs`` rows past the sort). Returns a distinct string array —
    small by construction, safe to broadcast."""
    rows = ds.select_columns([id_col, text_col]).sort(id_col).limit(n_docs)
    t = pa.Table.from_pylist(rows.take_all())
    _up, sh = doc_shingles(t[text_col], n=n)
    return pc.unique(sh)


# --------------------------------------------------------------------------
# duplicate clustering (connected components of the near-dup pair graph)
# --------------------------------------------------------------------------


def dup_clusters(
    pairs: rd.Dataset,
    *,
    rounds: int = 10,
    plan: str = "auto",
    num_buckets: "int | None" = None,
) -> pa.Table:
    """Connected-component clustering of near-dup PAIRS — the step that
    turns pairwise dedup output into keep-one-per-CLUSTER semantics (a
    pair list alone over-deletes when A~B and B~C but a pipeline drops
    both B and C).

    ``rounds`` iterations of min-label propagation over the undirected
    pair graph: label(v) <- min(label(v), min over neighbors' labels),
    starting from label(v) = v. At ``rounds`` >= the largest component's
    diameter this is the exact component minimum (the canonical keeper
    id); the SQL oracle unrolls the SAME fixed round count, so both
    engines compute the identical fixed-point-or-K-round labels.

    Physical plan (the ``pagerank`` task-per-block pattern): edge blocks
    are integer-encoded against the sorted node-id array ONCE and stay
    in the object store; per round the label vector is broadcast
    (``ray.put``) and one task per block returns its node-bounded
    per-endpoint minima, which the driver folds with ``np.minimum.at``.
    Early-exits on fixpoint (a fixpoint is invariant under further
    rounds, so early exit cannot diverge from the unrolled oracle).
    Node/label state is bounded by the number of docs APPEARING IN
    PAIRS — a small fraction of the corpus by construction; above
    ``graph.graph_bucketed_limit()`` estimated nodes (or with
    ``plan="bucketed"`` / env ``WSE_GRAPH_PLAN``) the job cuts over to
    ``stages.graph.components_bucketed`` — hash-bucketed label shards,
    bucket-to-bucket min-message exchange, no O(V) driver state, and
    BIT-IDENTICAL labels (integer minima are order-independent;
    asserted by tests/test_graph_bucketed.py).

    Returns (doc_id, cluster_id) for every doc in >= 1 pair.
    """
    from .graph import components_bucketed, resolve_plan

    edges = pairs.select_columns(["doc_a", "doc_b"]).materialize()
    # estimated vertex count (<= 2x pair count) picks the plan without
    # materializing the node set anywhere
    if resolve_plan(plan, 2 * edges.count()) == "bucketed":
        return components_bucketed(edges, rounds=rounds, num_buckets=num_buckets)
    refs = edges.to_arrow_refs()

    def _tbl_of(b):
        return pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b

    @ray.remote
    def block_nodes(b):
        t = _tbl_of(b)
        return np.unique(
            np.concatenate(
                [
                    t["doc_a"].to_numpy(zero_copy_only=False),
                    t["doc_b"].to_numpy(zero_copy_only=False),
                ]
            )
        )

    parts = ray.get([block_nodes.remote(r) for r in refs])
    if not parts or all(p.size == 0 for p in parts):
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
        )
    nodes = np.unique(np.concatenate(parts))
    ids_ref = ray.put(nodes)

    @ray.remote
    def prep_block(b, ids):
        t = _tbl_of(b)
        a = np.searchsorted(ids, t["doc_a"].to_numpy(zero_copy_only=False))
        bb = np.searchsorted(ids, t["doc_b"].to_numpy(zero_copy_only=False))
        return a.astype(np.int64), bb.astype(np.int64)

    prep_refs = [prep_block.remote(r, ids_ref) for r in refs]

    @ray.remote
    def min_prop(prep, lab):
        a, b = prep
        m = np.minimum(lab[a], lab[b])
        idx = np.concatenate([a, b])
        val = np.concatenate([m, m])
        order = np.argsort(idx)
        oi, ov = idx[order], val[order]
        first = np.ones(oi.size, dtype=bool)
        first[1:] = oi[1:] != oi[:-1]
        starts = np.flatnonzero(first)
        return oi[starts], np.minimum.reduceat(ov, starts)

    labels = nodes.copy()
    for _ in range(rounds):
        lab_ref = ray.put(labels)
        new = labels.copy()
        for oi, mn in ray.get([min_prop.remote(p, lab_ref) for p in prep_refs]):
            np.minimum.at(new, oi, mn)
        if np.array_equal(new, labels):
            break
        labels = new
    return pa.table({"doc_id": pa.array(nodes), "cluster_id": pa.array(labels)})


def cluster_cap_marks(clusters: pa.Table, cap: int = 2) -> pa.Table:
    """Cluster-capped curation marks: keep at most ``cap`` docs per
    near-dup cluster (the ``cap`` LOWEST doc_ids win — deterministic,
    partitioning-independent), mark the rest for drop. The standard
    "keep one/two representatives per duplicate cluster" corpus-curation
    rule, applied to ``dup_clusters`` output (bounded: docs appearing in
    >= 1 pair, a small fraction of the corpus by construction — the
    per-cluster rank is one vectorized lexsort + segmented-rank pass,
    never per-cluster Python).

    Returns (doc_id, cluster_id, kept) for every clustered doc.
    """
    cl = clusters["cluster_id"].to_numpy(zero_copy_only=False)
    ids = clusters["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, cl))
    cl_s, ids_s = cl[order], ids[order]
    first = np.ones(cl_s.size, dtype=bool)
    first[1:] = cl_s[1:] != cl_s[:-1]
    # rank within cluster = position - position of the cluster's first row
    starts = np.flatnonzero(first)
    rank = np.arange(cl_s.size) - np.repeat(
        starts, np.diff(np.concatenate([starts, [cl_s.size]]))
    )
    return pa.table(
        {
            "doc_id": pa.array(ids_s),
            "cluster_id": pa.array(cl_s),
            "kept": pa.array(rank < cap),
        }
    )


# ---------------------------------------------------------------------------
# Chunk-level duplicate detection — the paragraph/line-dedup analog
# (CCNet dedupes at the paragraph level, RefinedWeb/FineWeb at the
# line/span level; this corpus is single-line, so the unit is a fixed
# window of CHUNK_TOKENS canonical tokens).
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 8


def chunk_hashes_partial(
    batch: pa.Table,
    *,
    chunk_tokens: int = CHUNK_TOKENS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """(doc_id, chunk_h) rows: one 64-bit hash per FULL chunk_tokens-token
    window of each doc (the trailing partial window is dropped, same rule
    as the oracle's HAVING count(*) = w). Fully vectorized: one batch
    tokenize, vocab-bounded blake2b token hashing (dictionary-encode,
    hash the DICTIONARY, gather), then one (n_chunks x w) uint64
    polynomial combine — no per-chunk Python. 64-bit chunk hashes are
    collision-safe at test scale; a 1e12-chunk corpus upgrades to the
    128-bit digest per chunk (same plan, costlier map side)."""
    from ..functions.sketches import hash_tokens_u64
    from ..functions.tokenize import flat_tokens_batch

    flat, parents, _n = flat_tokens_batch(batch[text_col])
    empty = pa.table(
        {id_col: pa.array([], pa.int64()), "chunk_h": pa.array([], pa.int64())}
    )
    if len(flat) == 0:
        return empty
    d = flat.dictionary_encode()
    dict_h = hash_tokens_u64(d.dictionary.to_pylist())
    tok_h = dict_h[d.indices.to_numpy(zero_copy_only=False)]

    counts = np.bincount(parents)
    doc_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(parents.size) - np.repeat(doc_start, counts)
    chunk = pos // chunk_tokens
    combo = parents.astype(np.int64) * (1 << 40) + chunk
    starts = np.flatnonzero(np.diff(combo, prepend=-1))
    sizes = np.diff(np.append(starts, parents.size))
    full = starts[sizes == chunk_tokens]
    if full.size == 0:
        return empty

    idx = full[:, None] + np.arange(chunk_tokens)
    mult = np.uint64(1099511628211) ** np.arange(
        chunk_tokens - 1, -1, -1, dtype=np.uint64
    )
    with np.errstate(over="ignore"):
        chunk_h = (tok_h[idx] * mult).sum(axis=1, dtype=np.uint64)
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False)[parents[full]]
    return pa.table(
        {
            id_col: pa.array(doc_ids.astype(np.int64)),
            "chunk_h": pa.array(chunk_h.view(np.int64)),
        }
    )


def chunk_dedup_stats(
    docs, *, chunk_tokens: int = CHUNK_TOKENS, id_col: str = "doc_id"
):
    """Per-doc duplicated-chunk statistics: (doc_id, n_chunks,
    n_dup_chunks) where a chunk occurrence is duplicated iff its content
    occurs >= 2 times corpus-wide (all occurrences of a duplicated chunk
    count, the CCNet accounting). Docs with no full chunk drop out.

    Physical plan: map-side chunk hashing (above) -> ONE
    ``groupby(chunk_h).count()`` (Ray-native vectorized aggregate — no
    per-key Python) -> bucketed Arrow-C++ ``shuffle_join`` of the
    occurrence rows with the counts -> per-doc Count/Sum aggregate.
    Both shuffles move only (int64 hash, int64 id) pairs — text never
    enters an exchange."""
    from ray.data.aggregate import Count, Sum

    from .ops import shuffle_join

    occ = docs.map_batches(
        lambda t: chunk_hashes_partial(t, chunk_tokens=chunk_tokens, id_col=id_col),
        batch_format="pyarrow",
    )
    cnt = occ.groupby("chunk_h").aggregate(Count(alias_name="n_occ"))
    joined = shuffle_join(
        occ, cnt, "chunk_h", left_cols=[id_col], right_cols=["n_occ"]
    )

    def flag(t: pa.Table) -> pa.Table:
        dup = pc.cast(pc.greater(t["n_occ"], 1), pa.int64())
        return pa.table({id_col: t[id_col], "is_dup": dup})

    return (
        joined.map_batches(flag, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Count(alias_name="n_chunks"), Sum("is_dup", alias_name="n_dup_chunks"))
    )


# --------------------------------------------------------------------------
# character n-gram substring dedup (the suffix-array approximation)
# --------------------------------------------------------------------------

GRAM_CHARS = 32
_GRAM_B = np.uint64(0x100000001B3)  # FNV-prime odd multiplier (mod 2^64)


def char_gram_partial(
    batch: pa.Table,
    *,
    gram_len: int = GRAM_CHARS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Per-doc DISTINCT character n-grams with occurrence counts —
    one row ``(gram_h, doc_id, n_occ)`` per distinct ``gram_len``-char
    window of each doc, fully vectorized: all texts decode to ONE flat
    UTF-32 codepoint array, every window hashes in ``gram_len``
    vectorized fused multiply-adds (mod-2^64 polynomial), and the
    per-doc distinct collapses through one lexsort run-detection.
    Codepoint windows == DuckDB ``substring`` character windows, so the
    SQL twin replays the same gram set. Docs shorter than ``gram_len``
    emit nothing."""
    texts = batch[text_col].combine_chunks().to_pylist()
    ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    bufs = [t.encode("utf-32-le") for t in texts]
    lens = np.array([len(b) >> 2 for b in bufs], np.int64)
    flat = (
        np.frombuffer(b"".join(bufs), "<u4").astype(np.uint64)
        if bufs
        else np.zeros(0, np.uint64)
    )
    npos = np.maximum(lens - gram_len + 1, 0)
    total = int(npos.sum())
    empty = pa.table(
        {
            "gram_h": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "n_occ": pa.array([], pa.int64()),
        }
    )
    if total == 0:
        return empty
    starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
    doc_pos = np.repeat(np.arange(len(lens)), npos)
    first = np.repeat(np.cumsum(npos) - npos, npos)
    w0 = np.repeat(starts, npos) + (np.arange(total) - first)
    h = np.zeros(total, np.uint64)
    for j in range(gram_len):
        h = h * _GRAM_B + flat[w0 + j]
    hs = h.view(np.int64)
    order = np.lexsort((hs, doc_pos))
    ds_, hs_ = doc_pos[order], hs[order]
    newrun = np.empty(total, bool)
    newrun[0] = True
    newrun[1:] = (ds_[1:] != ds_[:-1]) | (hs_[1:] != hs_[:-1])
    run_id = np.cumsum(newrun) - 1
    n_occ = np.bincount(run_id)
    return pa.table(
        {
            "gram_h": pa.array(hs_[newrun]),
            id_col: pa.array(ids[ds_[newrun]]),
            "n_occ": pa.array(n_occ.astype(np.int64)),
        }
    )


def substring_dedup_stats(
    docs, *, gram_len: int = GRAM_CHARS, id_col: str = "doc_id"
) -> "rd.Dataset":
    """Per-doc duplicated-substring statistics: ``(doc_id, n_grams,
    n_distinct_grams, n_dup_grams)`` where a doc's distinct gram is
    duplicated iff it occurs in >= 2 DISTINCT docs (cross-doc overlap;
    within-doc repetition is ``textstats.repetition_stats``' job).

    This is the n-gram approximation of suffix-array substring dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"): two substrings sharing any ``gram_len``-char span
    collide on that window's gram. Physical plan: map-side windowed
    hashing + per-doc distinct (the combiner — shuffle volume is
    distinct (hash, doc) pairs, never positions), then ONE bounded-
    bucket exchange that both counts docs-per-gram and flags each
    occurrence row vectorized (a gram's rows all land in its hash
    bucket, so the count is complete there — no second join exchange),
    then one per-doc aggregate. Text never enters an exchange; 64-bit
    gram identity (documented collision bound ~n_grams^2 / 2^65).
    """
    from ray.data.aggregate import Count, Sum

    from .ops import _bucket_of
    from .shuffle import hash_map_groups

    occ = docs.map_batches(
        lambda t: char_gram_partial(t, gram_len=gram_len, id_col=id_col),
        batch_format="pyarrow",
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__bucket", _bucket_of(t["gram_h"], 64))

    def flag_bucket(t: pa.Table) -> pa.Table:
        # all rows of a gram are in this bucket: count distinct docs per
        # gram locally, flag each row — one vectorized pass
        cnt = t.select(["gram_h"]).group_by("gram_h").aggregate([([], "count_all")])
        ndocs = pc.take(
            cnt["count_all"].combine_chunks(),
            pc.index_in(t["gram_h"], value_set=cnt["gram_h"].combine_chunks()),
        )
        return pa.table(
            {
                id_col: t[id_col],
                "n_occ": t["n_occ"],
                "is_dup": pc.cast(pc.greater(ndocs, 1), pa.int64()),
            }
        )

    flagged = hash_map_groups(
        occ.map_batches(add_bucket, batch_format="pyarrow"), "__bucket", flag_bucket
    )
    return flagged.groupby(id_col).aggregate(
        Sum("n_occ", alias_name="n_grams"),
        Count(alias_name="n_distinct_grams"),
        Sum("is_dup", alias_name="n_dup_grams"),
    )


def winnowing_pairs(
    docs,
    *,
    gram_len: int = 16,
    window: int = 8,
    min_shared: int = 2,
    num_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """Winnowing fingerprint pairs (Schleimer, Wilkerson & Aiken 2003 —
    the MOSS plagiarism detector): each doc's fingerprint set is the
    DISTINCT minima of ``window``-sized sliding windows over its
    ``gram_len``-char-gram hash sequence (full windows only); output is
    every doc pair sharing >= ``min_shared`` fingerprints. The
    winnowing guarantee: any shared substring of length >= gram_len +
    window - 1 yields a shared fingerprint — local, position-robust
    (unlike MinHash, which sketches GLOBAL similarity, winnowing
    detects localized copied passages).

    Gram hashes are md5-prefix ``hash64`` of the raw gram STRING (so
    the DuckDB twin replays them exactly via substring+md5; at 100-TB
    scale swap in ``char_gram_partial``'s polynomial kernel — identity
    only, the plan is unchanged). Per batch: one hash64 pass over all
    grams, one vectorized sliding-window min + distinct per doc; the
    pair counting is the co-citation kernel pair
    (``stages/crawl.int_cooccurrence_pairs`` with keys =
    fingerprints). Output: (doc_a, doc_b, n_shared_fps).
    """
    from ..functions.hashing import hash64_array
    from .crawl import int_cooccurrence_pairs
    from .ops import bucket_mix

    def fingerprints(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].combine_chunks().to_pylist()
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        all_grams: list = []
        spans: list = []
        for txt in texts:
            npos = max(len(txt) - gram_len + 1, 0)
            spans.append(npos)
            for i in range(npos):
                all_grams.append(txt[i : i + gram_len])
        empty = pa.table(
            {
                "s": pa.array([], pa.int64()),
                "d": pa.array([], pa.int64()),
                "sbucket": pa.array([], pa.int64()),
            }
        )
        if not all_grams:
            return empty
        h = hash64_array(all_grams)
        out_fp: list = []
        out_doc: list = []
        pos = 0
        for did, npos in zip(ids, spans):
            hd = h[pos : pos + npos]
            pos += npos
            if npos < window:
                continue
            mins = np.unique(
                np.lib.stride_tricks.sliding_window_view(hd, window).min(axis=1)
            )
            out_fp.append(mins)
            out_doc.append(np.full(mins.size, did, np.int64))
        if not out_fp:
            return empty
        fp = np.concatenate(out_fp)
        doc = np.concatenate(out_doc)
        return pa.table(
            {
                "s": pa.array(fp),
                "d": pa.array(doc),
                "sbucket": pa.array(bucket_mix(fp, num_buckets)),
            }
        )

    pairs = int_cooccurrence_pairs(
        docs.map_batches(fingerprints, batch_format="pyarrow"),
        min_common=min_shared,
        num_buckets=num_buckets,
    )
    return pairs.map_batches(
        lambda t: t.rename_columns(["doc_a", "doc_b", "n_shared_fps"]),
        batch_format="pyarrow",
    )


def dedup_source_report(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> rd.Dataset:
    """Curation report: per corpus source, the document count and the
    exact-duplicate count (keep-first by ``id_col`` within identical
    text md5 — the ``contentSeen`` rule) — the "which feed is feeding
    me copies" dashboard row a 100-TB ingest pipeline watches.

    ONE bounded md5-bucket exchange (the ``exact_dup_losers`` plan with
    the source column riding along): per bucket a single sort + run
    detection marks losers, then per-source PARTIAL counts leave the
    bucket (<= |sources| rows each); a tiny groupby sums them."""
    num_buckets = 256

    def hash_batch(batch: pa.Table) -> pa.Table:
        md5s = [hashlib.md5(t.encode()).hexdigest() for t in batch[text_col].to_pylist()]
        bucket = np.fromiter(
            (int(m[:8], 16) % num_buckets for m in md5s), dtype=np.int64, count=len(md5s)
        )
        return pa.table(
            {
                "text_md5": pa.array(md5s, pa.string()),
                id_col: batch[id_col],
                group_col: batch[group_col],
                "__bucket": pa.array(bucket),
            }
        )

    def report_of_bucket(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("text_md5", "ascending"), (id_col, "ascending")]
        )
        g = group.take(idx).combine_chunks()
        md5s = np.asarray(g["text_md5"].to_pylist(), dtype=object)
        n = len(g)
        is_dup = np.zeros(n, dtype=bool)
        if n > 1:
            is_dup[1:] = md5s[1:] == md5s[:-1]
        src = np.asarray(g[group_col].to_pylist(), dtype=object)
        out_s, out_n, out_d = [], [], []
        for s in np.unique(src):
            m = src == s
            out_s.append(str(s))
            out_n.append(int(m.sum()))
            out_d.append(int(is_dup[m].sum()))
        return pa.table(
            {
                group_col: pa.array(out_s, pa.string()),
                "n_docs": pa.array(out_n, pa.int64()),
                "n_dups": pa.array(out_d, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    parts = hash_map_groups(
        ds.map_batches(hash_batch, batch_format="pyarrow"), "__bucket", report_of_bucket
    )
    return parts.groupby(group_col).aggregate(
        Sum("n_docs", alias_name="n_docs"), Sum("n_dups", alias_name="n_dups")
    )


def shingle_dup_coverage(
    ds: rd.Dataset,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 256,
) -> rd.Dataset:
    """Per-doc DUPLICATE-SHINGLE COVERAGE: the share of a document's
    distinct word n-grams that occur in at least one OTHER document —
    the "near-dup mass" curation metric (a doc at 0.9 is mostly
    boilerplate/copies even if no single pair crosses a Jaccard
    threshold; the corpus-level analysis behind suffix-array dedup).

    Plan: distinct (doc, shingle) explode (the shared ``doc_shingles``
    kernel) -> ONE bounded shingle-bucket exchange; per bucket, one
    sort + run detection marks each row shared iff its shingle run
    spans more than one doc, then per-DOC partial counts leave the
    bucket -> a narrow groupby(doc) sum closes coverage as an exact
    integer-micros floor share. Docs shorter than ``n`` tokens emit no
    shingles and are absent (the SQL twin states the same rule)."""
    from .ops import _bucket_of

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "n_shingles": pa.array([], pa.int64()),
            "n_shared": pa.array([], pa.int64()),
        }
    )

    def explode(batch: pa.Table) -> pa.Table:
        up, sh = doc_shingles(batch[text_col], n=n)
        if up.size == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "shingle": pa.array([], pa.string()),
                    "__bucket": pa.array([], pa.int64()),
                }
            )
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(doc_ids[up]),
                "shingle": sh,
                "__bucket": _bucket_of(sh, num_buckets),
            }
        )

    def coverage_of_bucket(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m == 0:
            return empty
        d = group["shingle"].combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, codes))
        codes_s, ids_s = codes[order], ids[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(codes_s)) + 1))
        lens = np.diff(np.concatenate((starts, [m])))
        shared_run = lens > 1  # (doc, shingle) rows are distinct, so
        # a >1 run means >1 distinct docs share the shingle
        shared = np.repeat(shared_run, lens).astype(np.int64)
        uniq_d, inv = np.unique(ids_s, return_inverse=True)
        n_sh = np.bincount(inv)
        n_shared = np.bincount(inv, weights=shared).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(uniq_d),
                "n_shingles": pa.array(n_sh.astype(np.int64)),
                "n_shared": pa.array(n_shared),
            }
        )

    from ray.data.aggregate import Sum

    parts = hash_map_groups(
        ds.map_batches(explode, batch_format="pyarrow"),
        "__bucket",
        coverage_of_bucket,
    )
    agg = parts.groupby(id_col).aggregate(
        Sum("n_shingles", alias_name="n_shingles"),
        Sum("n_shared", alias_name="n_shared"),
    )
    return agg.map_batches(
        lambda t: t.append_column(
            "shared_e6",
            pa.array(
                1_000_000
                * t["n_shared"].to_numpy(zero_copy_only=False)
                // t["n_shingles"].to_numpy(zero_copy_only=False)
            ),
        ),
        batch_format="pyarrow",
    )
