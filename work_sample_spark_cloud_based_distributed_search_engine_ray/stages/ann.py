"""Similarity search over an embedding column (``list<float>``).

Operators:
- ``knn_brute_force`` — exact cosine top-k: the query matrix is
  ``ray.put`` ONCE (broadcast, never re-shipped per batch); each batch
  does one float64 matmul and a LOCAL top-k (partial/combiner), so the
  final per-query groupby shuffles only ``k * num_blocks`` candidate
  rows, never the full score matrix.
- ``embedding_near_dup_pairs`` — all-pairs cosine >= threshold. Exact
  (block x broadcast-matrix matmul) at sandbox scale; the scale path is
  ``lsh_embedding_buckets`` (random-hyperplane signatures) which turns
  all-pairs into a bucket groupby exactly like MinHash banding.
- ``lsh_knn`` — approximate top-k: hyperplane-bucket candidates, exact
  re-rank inside buckets; recall measured against brute force in tests.

The reference engine has no vector operations at all — this is part of
the training-data extension (axes A). Everything is numpy over zero-copy
Arrow; no Python loop touches a vector element.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .shuffle import hash_map_groups, hash_partitions


def _merge_partitions(n_queries: int) -> int:
    """Partition count for the per-query top-k merge shuffle: there are
    exactly ``n_queries`` groups, so partitions beyond that are idle
    aggregator actors (measured: 24 of 32 idle on an 8-query set)."""
    return max(2, min(hash_partitions(), n_queries))


def _mat(batch_col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column, zero-copy where
    the layout allows (fixed-width lists of equal length)."""
    arr = batch_col.combine_chunks() if isinstance(batch_col, pa.ChunkedArray) else batch_col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.sqrt((m * m).sum(axis=1, keepdims=True))
    norms[norms == 0.0] = 1.0
    return m / norms


def knn_brute_force(
    ds: rd.Dataset,
    queries: np.ndarray,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: int | None = None,
) -> rd.Dataset:
    """Exact cosine top-k of every query vector against the dataset.

    Output: query_id, vec_id, cosine_e6 (fixed-point micros, int64) —
    exactly k rows per query (fewer if the corpus is smaller),
    deterministic tie-break (cosine desc, vec_id asc). Fixed-point
    integers pin cross-engine float parity (a float round() can differ
    by 1 ulp between engines; an integer cannot).

    ``dims``: Matryoshka truncation — score on the first ``dims``
    components only (MRL-style embeddings front-load information, so a
    prefix is a cheap coarse index: 4x fewer FLOPs/bytes at dims=d/4).
    Truncation happens inside the batch kernel on the zero-copy matrix
    view; the stored column is never rewritten.
    """
    qn = _normalize(np.asarray(queries, dtype=np.float64)[:, :dims])
    q_ref = ray.put(qn)

    def local_topk(batch: pa.Table) -> pa.Table:
        q: np.ndarray = ray.get(q_ref)
        m = _normalize(_mat(batch[vec_col])[:, :dims])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sims = np.rint((q @ m.T) * 1e6).astype(np.int64)  # (Q, n) micros
        kk = min(k, sims.shape[1])
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            # deterministic local top-k: sim desc, id asc
            order = np.lexsort((ids, -row))[:kk]
            out_q.append(np.full(kk, qi, np.int64))
            out_id.append(ids[order])
            out_s.append(row[order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_id).astype(np.int64)),
                "cosine_e6": pa.array(np.concatenate(out_s)),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        sims = group["cosine_e6"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {
                "query_id": group["query_id"].take(pa.array(order)),
                "vec_id": pa.array(ids[order]),
                "cosine_e6": pa.array(sims[order]),
            }
        )

    return hash_map_groups(
        ds.map_batches(local_topk, batch_format="pyarrow"),
        "query_id",
        merge_topk,
        num_partitions=_merge_partitions(qn.shape[0]),
    )


def knn_range_search(
    ds: rd.Dataset,
    queries: np.ndarray,
    *,
    threshold_e6: int = 800_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Cosine RANGE query: every (query, vector) pair with
    ``cosine_e6 >= threshold_e6`` — the radius-based counterpart of
    ``knn_brute_force``'s top-k (unbounded result size, bounded by the
    similarity radius instead of a count).

    Shuffle-free: the query matrix is ``ray.put`` once (broadcast);
    each block does one matmul + one integer threshold filter and emits
    its hits — the result is a plain union of per-block outputs with NO
    exchange at all (top-k needs a per-query merge; a radius filter
    does not). At 100 TB this streams: output volume is governed by the
    radius, worker memory by (Q x block) score tiles."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)

    def local_range(batch: pa.Table) -> pa.Table:
        q: np.ndarray = ray.get(q_ref)
        m = _normalize(_mat(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sims = np.rint((q @ m.T) * 1e6).astype(np.int64)  # (Q, n) micros
        qi, vi = np.nonzero(sims >= threshold_e6)
        return pa.table(
            {
                "query_id": pa.array(qi.astype(np.int64)),
                "vec_id": pa.array(ids[vi].astype(np.int64)),
                "cosine_e6": pa.array(sims[qi, vi]),
            }
        )

    return ds.map_batches(local_range, batch_format="pyarrow")


def embedding_near_dup_pairs(
    ds: rd.Dataset,
    *,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """All (a<b) pairs with cosine >= threshold — exact variant.

    Blocked all-pairs: the corpus blocks stay IN THE OBJECT STORE
    (``to_arrow_refs`` — the driver holds only refs); the work list is
    the O(B^2/2) unordered block pairs, and each task ``ray.get``s just
    its two blocks and emits one block x block matmul's hits. Exact
    all-pairs is inherently O(N^2) flops — this distributes the flops
    and bounds every worker's memory to two blocks; the sub-quadratic
    scale path is ``lsh_embedding_buckets`` + per-bucket exact verify.
    Output: vec_a, vec_b, cosine_e6 (fixed-point micros; the threshold
    compares on the integer, deterministically in every engine).
    """
    thr_e6 = int(round(threshold * 1e6))
    blocks = ds.select_columns([id_col, vec_col]).to_arrow_refs()
    blocks_ref = ray.put(blocks)  # tiny: a list of refs
    nb = len(blocks)
    descs = [{"i": i, "j": j} for i in range(nb) for j in range(i, nb)]

    def block_pairs(batch: pa.Table) -> pa.Table:
        blks = ray.get(blocks_ref)
        out_a, out_b, out_s = [], [], []
        for bi, bj_ in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ti = ray.get(blks[bi])
            tj = ti if bj_ == bi else ray.get(blks[bj_])
            ids_i = ti[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            ids_j = tj[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            mi = _normalize(_mat(ti[vec_col]))
            mj = mi if bj_ == bi else _normalize(_mat(tj[vec_col]))
            sims = np.rint((mi @ mj.T) * 1e6).astype(np.int64)
            ai, bj = np.nonzero(sims >= thr_e6)
            a, b = ids_i[ai], ids_j[bj]
            if bj_ == bi:
                # within a block each unordered pair appears twice
                # (+ self-pairs on the diagonal): keep the a<b half
                keep = a < b
                a, b, s = a[keep], b[keep], sims[ai[keep], bj[keep]]
            else:
                # across two distinct blocks each unordered pair
                # appears exactly once — orient it, drop nothing
                s = sims[ai, bj]
                a, b = np.minimum(a, b), np.maximum(a, b)
            out_a.append(a)
            out_b.append(b)
            out_s.append(s)
        if not out_a:
            return pa.table(
                {
                    "vec_a": pa.array([], pa.int64()),
                    "vec_b": pa.array([], pa.int64()),
                    "cosine_e6": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "vec_a": pa.array(np.concatenate(out_a)),
                "vec_b": pa.array(np.concatenate(out_b)),
                "cosine_e6": pa.array(np.concatenate(out_s)),
            }
        )

    return rd.from_items(descs).map_batches(
        block_pairs, batch_format="pyarrow", batch_size=1
    )


def near_dup_planes_per_band(
    n_rows: int, *, target_bucket: int = 4096, min_planes: int = 4, max_planes: int = 24
) -> int:
    """Deterministic band width for banded near-dup LSH: enough planes
    that the EXPECTED bucket size (n / 2^planes under a balanced split)
    stays near ``target_bucket``, so the per-bucket exact-verify matmul
    is bounded as the corpus grows — the knob that keeps the plan
    sub-quadratic at 100 TB."""
    import math

    if n_rows <= target_bucket:
        return min_planes
    return int(min(max_planes, max(min_planes, math.ceil(math.log2(n_rows / target_bucket)))))


def banded_lsh_near_dup_pairs(
    ds: rd.Dataset,
    *,
    threshold: float = 0.95,
    num_bands: int = 8,
    planes_per_band: int = 4,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> rd.Dataset:
    """Near-dup pairs via BANDED random-hyperplane LSH + per-bucket
    exact verify — the sub-quadratic scale path of
    ``embedding_near_dup_pairs`` (same output contract: vec_a < vec_b,
    cosine_e6 >= threshold, but only pairs that collide in >= 1 band;
    per-band collision prob. = (1 - theta/pi)^planes_per_band).

    Plan: one plane matmul per batch -> explode (band, bucket) keys ->
    hash-bucket groupby -> one (k, k) exact cosine matmul per bucket ->
    global pair dedup on a bounded bucket of the pair hash (a pair can
    collide in several bands). No stage is driver-side; the all-to-all
    moves only (bucket, id, vec) rows, num_bands x the corpus."""
    thr_e6 = int(round(threshold * 1e6))
    if dim is None:
        dim = len(ds.take(1)[0][vec_col])
    planes = hyperplanes(dim, num_bands * planes_per_band, seed)
    p_ref = ray.put(planes)
    weights = (1 << np.arange(planes_per_band, dtype=np.int64)).astype(np.int64)

    empty_pairs = pa.table(
        {
            "vec_a": pa.array([], pa.int64()),
            "vec_b": pa.array([], pa.int64()),
            "cosine_e6": pa.array([], pa.int64()),
        }
    )

    def bucketize(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    vec_col: batch[vec_col],
                }
            )
        p: np.ndarray = ray.get(p_ref)
        signs = (_mat(batch[vec_col]) @ p.T) > 0.0  # (n, bands*ppb)
        keys = np.empty((n, num_bands), dtype=np.int64)
        for bnd in range(num_bands):
            sl = signs[:, bnd * planes_per_band : (bnd + 1) * planes_per_band]
            keys[:, bnd] = (np.int64(bnd) << np.int64(56)) | (sl.astype(np.int64) @ weights)
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), num_bands))
        return pa.table(
            {
                "bucket": pa.array(keys.ravel()),
                id_col: batch[id_col].take(rep),
                vec_col: batch[vec_col].take(rep),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        k = group.num_rows
        if k < 2:
            return empty_pairs
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_mat(group[vec_col]))
        sims = np.rint((m @ m.T) * 1e6).astype(np.int64)
        iu, ju = np.triu_indices(k, 1)
        sv = sims[iu, ju]
        keep = sv >= thr_e6
        a, b = ids[iu[keep]], ids[ju[keep]]
        return pa.table(
            {
                "vec_a": pa.array(np.minimum(a, b)),
                "vec_b": pa.array(np.maximum(a, b)),
                "cosine_e6": pa.array(sv[keep]),
            }
        )

    from .dedup import _dedup_pairs

    pairs = hash_map_groups(
        ds.map_batches(bucketize, batch_format="pyarrow"), "bucket", verify
    )
    return _dedup_pairs(pairs, [("cosine_e6", "min")], key_cols=("vec_a", "vec_b"))


def embedding_near_dup_pairs_auto(
    ds: rd.Dataset,
    *,
    threshold: float = 0.95,
    exact_max_rows: int = 100_000,
    num_bands: int = 8,
    planes_per_band: int | None = None,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Size-aware cutover for embedding near-dup detection: EXACT
    blocked all-pairs below ``exact_max_rows`` (O(N^2) flops are cheap
    and recall is 1.0), banded-LSH + per-bucket exact verify above it
    (sub-quadratic; the default at corpus scale). Both sides share the
    output contract (vec_a < vec_b, cosine_e6 >= threshold)."""
    n = ds.count()
    if n <= exact_max_rows:
        return embedding_near_dup_pairs(
            ds, threshold=threshold, vec_col=vec_col, id_col=id_col
        )
    ppb = planes_per_band or near_dup_planes_per_band(n)
    return banded_lsh_near_dup_pairs(
        ds,
        threshold=threshold,
        num_bands=num_bands,
        planes_per_band=ppb,
        seed=seed,
        vec_col=vec_col,
        id_col=id_col,
    )


def hyperplanes(dim: int, num_planes: int = 16, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim))


def lsh_embedding_buckets(
    ds: rd.Dataset,
    planes: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Random-hyperplane (SimHash-for-vectors) bucketing: sign pattern
    of ``planes @ v`` packed into one int64 bucket key. Cosine-similar
    vectors collide with probability (1 - theta/pi)^num_planes."""
    p_ref = ray.put(planes.astype(np.float64))
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64)).astype(np.int64)

    def bucketize(batch: pa.Table) -> pa.Table:
        p: np.ndarray = ray.get(p_ref)
        m = _mat(batch[vec_col])
        signs = (m @ p.T) > 0.0
        keys = signs.astype(np.int64) @ weights
        return pa.table(
            {
                id_col: batch[id_col],
                vec_col: batch[vec_col],
                "bucket": pa.array(keys),
            }
        )

    return ds.map_batches(bucketize, batch_format="pyarrow")


def kmeans_centroids(
    sample: np.ndarray, nlist: int, *, iters: int = 10, seed: int = 11
) -> np.ndarray:
    """Lloyd's k-means on a (normalized) sample — the IVF codebook.
    Deterministic in (sample, nlist, iters, seed); spherical variant
    (centroids re-normalized each round) since similarity is cosine."""
    rng = np.random.default_rng(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    n = sample.shape[0]
    nlist = min(nlist, n)
    centroids = sample[rng.choice(n, size=nlist, replace=False)]
    for _ in range(iters):
        assign = (sample @ centroids.T).argmax(axis=1)
        for c in range(nlist):
            members = sample[assign == c]
            if members.size:
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def ivf_assign(
    ds: rd.Dataset,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Assign each vector to its nearest (cosine) centroid — the IVF
    inverted-list key. Centroids broadcast once via ``ray.put``."""
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        c: np.ndarray = ray.get(c_ref)
        m = _normalize(_mat(batch[vec_col]))
        lists = (m @ c.T).argmax(axis=1).astype(np.int64) if m.size else np.empty(0, np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                vec_col: batch[vec_col],
                "ivf_list": pa.array(lists),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def ivf_knn(
    ds: rd.Dataset,
    queries: np.ndarray,
    *,
    k: int = 10,
    nlist: int = 32,
    nprobe: int = 4,
    sample_mod: int = 7,
    seed: int = 11,
    max_train: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """IVF approximate top-k — the third ANN scale path (exact
    brute-force -> hyperplane LSH -> IVF): train a centroid codebook on
    a DETERMINISTIC sample (``vec_id % sample_mod == 0`` — a pure
    function of the ids, parallelism-invariant), assign every vector to
    its nearest centroid, then search each query only in its ``nprobe``
    closest lists. Output schema matches ``knn_brute_force``; recall vs
    brute force is the tested metric, ``nlist``/``nprobe`` the dial.

    The training sample is CAPPED at ``max_train`` rows (default
    256*nlist) via a streaming ``limit`` — driver memory is bounded at
    any corpus size. If the id predicate selects fewer than ``nlist``
    vectors (tiny or adversarial id sets), falls back to training on
    the first ``max_train`` corpus vectors instead of crashing.
    """
    q = _normalize(np.asarray(queries, dtype=np.float64))
    cap = max_train if max_train is not None else 256 * nlist

    def pick_sample(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % sample_mod == 0)).select([vec_col])

    sample_tbl = pa.concat_tables(
        ray.get(
            ds.map_batches(pick_sample, batch_format="pyarrow").limit(cap).to_arrow_refs()
        )
    )
    if sample_tbl.num_rows < nlist:
        sample_tbl = pa.concat_tables(
            ray.get(ds.select_columns([vec_col]).limit(cap).to_arrow_refs())
        )
    centroids = kmeans_centroids(_mat(sample_tbl[vec_col]), nlist, seed=seed)
    probe = (q @ centroids.T).argsort(axis=1)[:, ::-1][:, : min(nprobe, centroids.shape[0])]
    payload_ref = ray.put((q, probe))

    assigned = ivf_assign(ds, centroids, vec_col=vec_col, id_col=id_col)

    def local_topk(batch: pa.Table) -> pa.Table:
        qn_, probe_ = ray.get(payload_ref)
        m = _normalize(_mat(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lists = batch["ivf_list"].to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for qi in range(qn_.shape[0]):
            mask = np.isin(lists, probe_[qi])
            if not mask.any():
                continue
            sims = np.rint((m[mask] @ qn_[qi]) * 1e6).astype(np.int64)
            cand_ids = ids[mask]
            order = np.lexsort((cand_ids, -sims))[: min(k, sims.size)]
            out_q.append(np.full(order.size, qi, np.int64))
            out_id.append(cand_ids[order])
            out_s.append(sims[order])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine_e6": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_id)),
                "cosine_e6": pa.array(np.concatenate(out_s)),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        sims = group["cosine_e6"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {
                "query_id": group["query_id"].take(pa.array(order)),
                "vec_id": pa.array(ids[order]),
                "cosine_e6": pa.array(sims[order]),
            }
        )

    return hash_map_groups(
        assigned.map_batches(local_topk, batch_format="pyarrow"),
        "query_id",
        merge_topk,
        num_partitions=_merge_partitions(q.shape[0]),
    )


def lsh_knn(
    ds: rd.Dataset,
    queries: np.ndarray,
    *,
    k: int = 10,
    num_planes: int = 8,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Approximate top-k: search only the corpus vectors whose
    hyperplane bucket matches the query's. Output schema matches
    ``knn_brute_force``; recall vs brute force is a test metric
    (tests/test_ann.py), the classic speed/recall dial is
    ``num_planes``.
    """
    q = np.asarray(queries, dtype=np.float64)
    planes = hyperplanes(q.shape[1], num_planes, seed)
    qn = _normalize(q)
    q_signs = (qn @ planes.T) > 0.0
    weights = (1 << np.arange(num_planes, dtype=np.int64)).astype(np.int64)
    q_buckets = q_signs.astype(np.int64) @ weights
    payload_ref = ray.put((qn, q_buckets))

    bucketed = lsh_embedding_buckets(ds, planes, vec_col=vec_col, id_col=id_col)

    def local_topk(batch: pa.Table) -> pa.Table:
        qn_, qb_ = ray.get(payload_ref)
        m = _normalize(_mat(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        buckets = batch["bucket"].to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for qi in range(qn_.shape[0]):
            mask = buckets == qb_[qi]
            if not mask.any():
                continue
            sims = np.rint((m[mask] @ qn_[qi]) * 1e6).astype(np.int64)
            cand_ids = ids[mask]
            order = np.lexsort((cand_ids, -sims))[: min(k, sims.size)]
            out_q.append(np.full(order.size, qi, np.int64))
            out_id.append(cand_ids[order])
            out_s.append(sims[order])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine_e6": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_id)),
                "cosine_e6": pa.array(np.concatenate(out_s)),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        sims = group["cosine_e6"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {
                "query_id": group["query_id"].take(pa.array(order)),
                "vec_id": pa.array(ids[order]),
                "cosine_e6": pa.array(sims[order]),
            }
        )

    return hash_map_groups(
        bucketed.map_batches(local_topk, batch_format="pyarrow"),
        "query_id",
        merge_topk,
        num_partitions=_merge_partitions(qn.shape[0]),
    )


# --------------------------------------------------------------------------
# k-means clustering (exact-integer Lloyd iterations)
# --------------------------------------------------------------------------


def _micros(batch_col) -> np.ndarray:
    """(n, d) int64 micro-quantized matrix: floor(x * 1e6 + 0.5) per
    coordinate — the KMV oracle's floor(x + 0.5) rule, replayable
    bit-for-bit in SQL (numpy rint would round half-to-even; DuckDB
    round() rounds half away from zero — floor(+0.5) sidesteps both)."""
    return np.floor(_mat(batch_col) * 1e6 + 0.5).astype(np.int64)


def _assign_exact(x: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact-int64 squared distances + first-min argmin (ties go to the
    lowest cluster id, the SQL twin's (dist, c) order). Chunked so the
    (n, k, d) intermediate stays bounded."""
    n = x.shape[0]
    out_c = np.empty(n, np.int64)
    out_d = np.empty(n, np.int64)
    step = max(1, (1 << 22) // max(1, cents.shape[0] * cents.shape[1]))
    for i in range(0, n, step):
        diff = x[i : i + step, None, :] - cents[None, :, :]
        d = (diff * diff).sum(axis=2)
        out_c[i : i + step] = d.argmin(axis=1)
        out_d[i : i + step] = d.min(axis=1)
    return out_c, out_d


def train_pq_codebooks(
    x: np.ndarray, *, m: int, k_codes: int, iters: int
) -> np.ndarray:
    """(m, k_codes, sub_dim) int64 product-quantization codebooks via
    exact-integer Lloyd k-means per subvector — a pure, deterministic
    function of the (already micro-quantized) training matrix so the
    SQL twin can embed the identical codebooks as literals. Init = the
    sample's first ``k_codes`` rows in row order (callers pass rows in
    id-ascending order); assignment = first-min argmin
    (``_assign_exact``); update = floor division; empty codes keep
    their previous centroid. Runs driver-side on the BOUNDED sample."""
    n, d = x.shape
    sub = d // m
    assert sub * m == d, "embedding dim must split evenly into m subvectors"
    cbs = np.empty((m, k_codes, sub), np.int64)
    for j in range(m):
        xj = np.ascontiguousarray(x[:, j * sub : (j + 1) * sub])
        c = xj[:k_codes].copy()
        if c.shape[0] < k_codes:  # tiny sample: repeat rows to fill
            reps = -(-k_codes // max(1, c.shape[0]))
            c = np.tile(c, (reps, 1))[:k_codes]
        for _ in range(iters):
            assign, _ = _assign_exact(xj, c)
            sums = np.zeros((k_codes, sub), np.int64)
            np.add.at(sums, assign, xj)
            counts = np.bincount(assign, minlength=k_codes).astype(np.int64)
            nz = counts > 0
            c = c.copy()
            c[nz] = np.floor_divide(sums[nz], counts[nz, None])
        cbs[j] = c
    return cbs


def pq_topk(
    ds: rd.Dataset,
    *,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    n_queries: int = 8,
    k: int = 10,
    rerank: int = 4,
    train_max_id: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Product-quantization ANN with asymmetric distance computation
    (ADC) + exact re-rank — the classic memory-bound scale path beyond
    IVF/LSH: each vector compresses to ``m`` one-byte codes, per query
    the scan cost is a TABLE LOOKUP per code (independent of the
    embedding dimension), and only the ADC shortlist pays an exact
    distance. Contract (replayed bit-for-bit by the SQL twin from
    embedded codebook literals): shortlist = the GLOBAL top
    ``k * rerank`` by (adc asc, vec_id asc); result = the shortlist's
    top ``k`` by (exact int64 L2^2 asc, vec_id asc). Output
    (query_id, vec_id, adc, dist).

    Physical plan: training reads only the id-gated bounded sample
    (``id_col < train_max_id`` — deterministic, partitioning-invariant,
    streaming; rows sorted by id before init so codebooks are a pure
    function of the data); codebooks, per-query distance tables
    (m x k_codes ints per query) and the query matrix broadcast once
    via ``ray.put``; encode + ADC + local shortlist + exact distances
    for shortlisted rows are ONE shuffle-free ``map_batches`` pass (the
    per-block ADC top-s is a superset argument: global top-s is
    contained in the union of per-block top-s); the merge shuffles
    <= s x blocks rows into n_queries groups, re-selects the global
    ADC top-s, then re-ranks it by the exact distances already riding
    the rows.
    """
    import pyarrow.compute as pc

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch[id_col], pa.scalar(train_max_id)))

    def _tbl_of(b):
        return pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b

    sample = pa.concat_tables(
        _tbl_of(b)
        for b in ray.get(
            ds.map_batches(pick, batch_format="pyarrow").to_arrow_refs()
        )
    )
    ids_s = sample[id_col].to_numpy(zero_copy_only=False)
    order = np.argsort(ids_s, kind="stable")
    x = _micros(sample[vec_col])[order]
    ids_sorted = ids_s[order]
    cbs = train_pq_codebooks(x, m=m, k_codes=k_codes, iters=iters)
    d = x.shape[1]
    sub = d // m

    q_mask = ids_sorted < n_queries
    qx = x[q_mask]
    q_ids = ids_sorted[q_mask]
    nq = qx.shape[0]
    # per-query ADC distance tables: dt[qi, j, c] = ||q_sub - cb[j, c]||^2
    dt = np.empty((nq, m, k_codes), np.int64)
    for j in range(m):
        diff = qx[:, None, j * sub : (j + 1) * sub] - cbs[j][None, :, :]
        dt[:, j, :] = (diff * diff).sum(axis=2)

    s_size = k * rerank
    cb_ref = ray.put(cbs)
    dt_ref = ray.put(dt)
    qid_ref = ray.put(q_ids)
    qx_ref = ray.put(qx)

    def local_topk(batch: pa.Table) -> pa.Table:
        cbs_: np.ndarray = ray.get(cb_ref)
        dt_: np.ndarray = ray.get(dt_ref)
        qids: np.ndarray = ray.get(qid_ref)
        qx_: np.ndarray = ray.get(qx_ref)
        xb = _micros(batch[vec_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = xb.shape[0]
        adc = np.zeros((qids.size, n), np.int64)
        for j in range(m):
            codes_j, _ = _assign_exact(
                np.ascontiguousarray(xb[:, j * sub : (j + 1) * sub]), cbs_[j]
            )
            adc += dt_[:, j, :][:, codes_j]
        ss = min(s_size, n)
        out_q, out_id, out_a, out_d = [], [], [], []
        for qi in range(qids.size):
            row = adc[qi]
            sel = np.lexsort((ids, row))[:ss]  # adc asc, id asc
            diff = xb[sel] - qx_[qi]
            out_q.append(np.full(ss, qids[qi], np.int64))
            out_id.append(ids[sel])
            out_a.append(row[sel])
            out_d.append((diff * diff).sum(axis=1))
        empty = np.empty(0, np.int64)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q) if out_q else empty),
                "vec_id": pa.array(np.concatenate(out_id) if out_id else empty),
                "adc": pa.array(np.concatenate(out_a) if out_a else empty),
                "dist": pa.array(np.concatenate(out_d) if out_d else empty),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        adc = group["adc"].to_numpy(zero_copy_only=False)
        dist = group["dist"].to_numpy(zero_copy_only=False)
        short = np.lexsort((ids, adc))[:s_size]  # global ADC top-s
        sel = short[np.lexsort((ids[short], dist[short]))[:k]]  # exact re-rank
        return pa.table(
            {
                "query_id": group["query_id"].take(pa.array(sel)),
                "vec_id": pa.array(ids[sel]),
                "adc": pa.array(adc[sel]),
                "dist": pa.array(dist[sel]),
            }
        )

    return hash_map_groups(
        ds.map_batches(local_topk, batch_format="pyarrow"),
        "query_id",
        merge_topk,
        num_partitions=_merge_partitions(nq),
    )


def train_ivfpq(
    x: np.ndarray, *, nlist: int, m: int, k_codes: int, iters: int
) -> tuple[np.ndarray, np.ndarray]:
    """(coarse, codebooks) for IVF-PQ, both exact-int64 and pure
    functions of the training matrix: the coarse quantizer IS integer
    k-means — ``train_pq_codebooks`` with one subvector spanning the
    full dim — and the PQ codebooks train on the coarse RESIDUALS
    (x - coarse[assign(x)]), the composition FAISS calls IVFPQ."""
    coarse = train_pq_codebooks(x, m=1, k_codes=nlist, iters=iters)[0]
    assign, _ = _assign_exact(x, coarse)
    resid = x - coarse[assign]
    return coarse, train_pq_codebooks(resid, m=m, k_codes=k_codes, iters=iters)


def ivfpq_topk(
    ds: rd.Dataset,
    *,
    nlist: int = 8,
    nprobe: int = 3,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    n_queries: int = 8,
    k: int = 10,
    rerank: int = 4,
    train_max_id: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """IVF-PQ ANN — the composition that serves at 100 TB: a coarse
    integer-k-means quantizer prunes the corpus to ``nprobe`` of
    ``nlist`` inverted lists per query, PQ codes on the coarse
    RESIDUALS compress each kept vector to ``m`` bytes, ADC scores the
    probed lists with per-(query, list) distance tables, and the exact
    re-rank pays full distances only for the global ADC shortlist.
    Contract (SQL-replayable from embedded coarse + codebook literals):
    candidates(q) = vectors whose coarse list is among q's ``nprobe``
    nearest coarse centroids by (int L2^2 asc, cidx asc); shortlist =
    candidates' global top ``k * rerank`` by (adc asc, vec_id asc);
    result = shortlist's top ``k`` by (exact int64 L2^2 asc, vec_id
    asc). Output (query_id, vec_id, adc, dist).

    Physical plan mirrors ``pq_topk``: bounded id-gated training sample,
    coarse+codebooks+distance-tables+probe-sets+query-matrix broadcast
    once via ``ray.put``; coarse assign + residual encode + ADC + local
    shortlist + exact shortlist distances are ONE shuffle-free
    ``map_batches`` pass; the merge moves <= (k*rerank) x blocks rows.
    Unlike flat PQ the per-batch ADC touches only the probed fraction
    (~nprobe/nlist) of rows — the scan-cost dial."""
    import pyarrow.compute as pc

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch[id_col], pa.scalar(train_max_id)))

    def _tbl_of(b):
        return pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b

    sample = pa.concat_tables(
        _tbl_of(b)
        for b in ray.get(
            ds.map_batches(pick, batch_format="pyarrow").to_arrow_refs()
        )
    )
    ids_s = sample[id_col].to_numpy(zero_copy_only=False)
    order = np.argsort(ids_s, kind="stable")
    x = _micros(sample[vec_col])[order]
    ids_sorted = ids_s[order]
    coarse, cbs = train_ivfpq(x, nlist=nlist, m=m, k_codes=k_codes, iters=iters)
    d = x.shape[1]
    sub = d // m
    nlist = coarse.shape[0]

    q_mask = ids_sorted < n_queries
    qx = x[q_mask]
    q_ids = ids_sorted[q_mask]
    nq = qx.shape[0]
    # probe sets: per query the nprobe nearest coarse centroids
    qc = ((qx[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)  # (nq, nlist)
    cidx = np.arange(nlist, dtype=np.int64)
    probe = np.stack(
        [np.lexsort((cidx, qc[qi]))[: min(nprobe, nlist)] for qi in range(nq)]
    ) if nq else np.empty((0, min(nprobe, nlist)), np.int64)
    # dt[qi, p, j, c] = ||(q - coarse[p])_sub_j - cb[j, c]||^2 — computed
    # for all lists (nq*nlist*m*k_codes ints, tiny), used only on probed
    dt = np.empty((nq, nlist, m, k_codes), np.int64)
    for p in range(nlist):
        qr = qx - coarse[p]
        for j in range(m):
            diff = qr[:, None, j * sub : (j + 1) * sub] - cbs[j][None, :, :]
            dt[:, p, j, :] = (diff * diff).sum(axis=2)

    s_size = k * rerank
    payload_ref = ray.put((coarse, cbs, dt, probe, q_ids, qx))

    def local_topk(batch: pa.Table) -> pa.Table:
        coarse_, cbs_, dt_, probe_, qids, qx_ = ray.get(payload_ref)
        xb = _micros(batch[vec_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = xb.shape[0]
        out_q, out_id, out_a, out_d = [], [], [], []
        if n:
            ca, _ = _assign_exact(xb, coarse_)
            rb = xb - coarse_[ca]
            codes = np.empty((n, m), np.int64)
            for j in range(m):
                codes[:, j], _ = _assign_exact(
                    np.ascontiguousarray(rb[:, j * sub : (j + 1) * sub]), cbs_[j]
                )
            rows = np.arange(n)
            for qi in range(qids.size):
                mask = np.isin(ca, probe_[qi])
                if not mask.any():
                    continue
                sel_rows = rows[mask]
                adc = np.zeros(sel_rows.size, np.int64)
                for j in range(m):
                    adc += dt_[qi, ca[sel_rows], j, codes[sel_rows, j]]
                ss = min(s_size, sel_rows.size)
                top = np.lexsort((ids[sel_rows], adc))[:ss]  # adc asc, id asc
                pick_rows = sel_rows[top]
                diff = xb[pick_rows] - qx_[qi]
                out_q.append(np.full(ss, qids[qi], np.int64))
                out_id.append(ids[pick_rows])
                out_a.append(adc[top])
                out_d.append((diff * diff).sum(axis=1))
        empty = np.empty(0, np.int64)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q) if out_q else empty),
                "vec_id": pa.array(np.concatenate(out_id) if out_id else empty),
                "adc": pa.array(np.concatenate(out_a) if out_a else empty),
                "dist": pa.array(np.concatenate(out_d) if out_d else empty),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        adc = group["adc"].to_numpy(zero_copy_only=False)
        dist = group["dist"].to_numpy(zero_copy_only=False)
        short = np.lexsort((ids, adc))[:s_size]  # global ADC top-s
        sel = short[np.lexsort((ids[short], dist[short]))[:k]]  # exact re-rank
        return pa.table(
            {
                "query_id": group["query_id"].take(pa.array(sel)),
                "vec_id": pa.array(ids[sel]),
                "adc": pa.array(adc[sel]),
                "dist": pa.array(dist[sel]),
            }
        )

    return hash_map_groups(
        ds.map_batches(local_topk, batch_format="pyarrow"),
        "query_id",
        merge_topk,
        num_partitions=_merge_partitions(nq),
    )


def kmeans_assign(
    ds: rd.Dataset,
    *,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Distributed Lloyd k-means over an embedding column with EXACT
    integer arithmetic end-to-end, so every iteration replays
    bit-for-bit in SQL (the pagerank-style unrolled-CTE oracle):
    coordinates quantize to int64 micros once, squared distances and
    partial sums are int64 (exact for |x| <= ~1e3 and <= ~1e12 rows per
    cluster), and the centroid update is FLOOR integer division.

    Physical plan per iteration (classic map-side-combine k-means):
    centroids broadcast via ``ray.put``; each batch computes one
    vectorized exact assignment and emits k partial rows
    ``(cluster, n, coordinate-sum list)``; the driver folds the
    k x blocks partials (bounded by k, never by rows) and re-derives
    centroids. Empty clusters keep their previous centroid.
    Initialization: the k vectors with the smallest
    ``(hash64(vec_id), vec_id)`` — deterministic across any
    partitioning, replayable in SQL via the md5-prefix expression.
    Returns ``(id_col, cluster, dist)`` with dist the exact int64
    squared micro-distance.

    The reference has no clustering; this extends the ANN family
    (IVF's codebook trainer is the approximate cousin — this one is
    the exact, oracle-checkable clustering operator).
    """
    cents = kmeans_train_micros(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    final_ref = ray.put(cents)

    def assign_out(batch: pa.Table) -> pa.Table:
        c = ray.get(final_ref)
        x = _micros(batch[vec_col])
        assign, dist = _assign_exact(x, c)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(assign),
                "dist": pa.array(dist),
            }
        )

    return ds.map_batches(assign_out, batch_format="pyarrow")


def kmeans_train_micros(
    ds: rd.Dataset,
    *,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """The training half of :func:`kmeans_assign` — returns the final
    (k, d) int64 micro-quantized centroids. Shared by
    :func:`semantic_dedup`, which needs the centroids for its own
    assignment pass."""
    from ..functions.hashing import hash64_array

    def local_init(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        h = hash64_array(str(v) for v in ids.to_pylist())
        idv = ids.cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((idv, h))[:k]
        t = pa.table(
            {
                id_col: batch[id_col],
                vec_col: batch[vec_col],
                "__h": pa.array(h),
            }
        )
        return t.take(pa.array(np.sort(order)))

    seed_rows = ds.map_batches(local_init, batch_format="pyarrow").take_all()
    seed_rows.sort(key=lambda r: (r["__h"], r[id_col]))
    seed_rows = seed_rows[:k]
    cents = np.floor(
        np.asarray([r[vec_col] for r in seed_rows], np.float64) * 1e6 + 0.5
    ).astype(np.int64)

    d = cents.shape[1]
    for _ in range(iters):
        cents_ref = ray.put(cents)

        def partial(batch: pa.Table, _ref=cents_ref) -> pa.Table:
            c = ray.get(_ref)
            x = _micros(batch[vec_col])
            assign, _dist = _assign_exact(x, c)
            sums = np.zeros((k, d), np.int64)
            np.add.at(sums, assign, x)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "c": pa.array(np.arange(k, dtype=np.int64)),
                    "n": pa.array(counts),
                    "s": pa.array(list(sums), pa.list_(pa.int64())),
                }
            )

        sums = np.zeros((k, d), np.int64)
        counts = np.zeros(k, np.int64)
        for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
            sums[row["c"]] += np.asarray(row["s"], np.int64)
            counts[row["c"]] += row["n"]
        nz = counts > 0
        cents = cents.copy()
        # floor division, exact in int64 (matches the SQL twin's
        # (sx - ((sx % n) + n) % n) // n)
        cents[nz] = np.floor_divide(sums[nz], counts[nz, None])

    return cents


def semantic_dedup(
    ds: rd.Dataset,
    *,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding column with the exact
    integer k-means trainer, then within each cluster mark every vector
    that has an EARLIER (lower-id) cluster-mate with cosine_e6 >=
    threshold as a duplicate — the keep-first contract every other
    dedup operator in this repo pins.

    Physical plan: centroids train via :func:`kmeans_train_micros`
    (k x blocks partials, never rows); ONE assignment pass carries the
    vector along; one bounded exchange on the cluster id (clusters are
    the partitioning unit — at corpus scale k grows ~n/target so each
    cluster's pairwise matmul stays bounded, exactly the paper's
    strategy); per cluster: one id-sort, one normalized (c, c) matmul,
    one vectorized first-earlier-neighbour argmax. No per-pair Python.

    Output: (id_col, cluster, is_dup, dup_of) — dup_of is the smallest
    earlier id with cosine_e6 >= threshold (null for keepers). The
    SQL twin chains the unrolled-CTE k-means replay with a within-
    cluster EXISTS self-join on ``list_cosine_similarity``.

    The reference has only exact content dedup (``Crawler.java:
    178-190``); this is the embedding-space analog for training-data
    curation.
    """
    thr_e6 = int(round(threshold * 1e6))
    cents = kmeans_train_micros(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    cents_ref = ray.put(cents)

    def assign_carry(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        x = _micros(batch[vec_col])
        assign, _ = _assign_exact(x, c)
        return pa.table(
            {
                id_col: batch[id_col],
                vec_col: batch[vec_col],
                "cluster": pa.array(assign),
            }
        )

    assigned = ds.map_batches(assign_carry, batch_format="pyarrow")

    def dedup_cluster(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = _normalize(_mat(group[vec_col].combine_chunks().take(pa.array(order))))
        sims = np.rint((m @ m.T) * 1e6).astype(np.int64)
        hit = sims >= thr_e6
        # only earlier (i < j) neighbours count: zero the lower triangle
        # and diagonal, then column j's first True row is its dup_of
        hit &= np.tri(len(ids), k=-1, dtype=bool).T
        is_dup = hit.any(axis=0)
        first = hit.argmax(axis=0)
        dup_of = np.where(is_dup, ids[first], 0)
        return pa.table(
            {
                id_col: pa.array(ids),
                "cluster": group["cluster"].take(pa.array(order)),
                "is_dup": pa.array(is_dup.astype(np.int64)),
                "dup_of": pa.array(
                    np.ma.masked_array(dup_of, mask=~is_dup), pa.int64()
                ),
            }
        )

    return hash_map_groups(
        assigned,
        "cluster",
        dedup_cluster,
        num_partitions=_merge_partitions(k),
    )


def grouped_centroids(
    ds: rd.Dataset,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Per-group embedding centroid as EXACT integers: one row per
    (group, dim) with the e6-quantized component sum and the vector
    count (mean = sum_e6 / n_vecs, derivable without float drift — the
    clustering-prep primitive: class prototypes, topic centroids,
    nearest-centroid routing).

    Plan: each batch quantizes its matrix once (round-half-away, the
    SQL round() rule) and reduces per local group via one lexsort +
    ``np.add.reduceat`` — the map-side combine — emitting at most
    |batch groups| x d narrow rows; ONE distributed groupby over the
    (group, dim)-bounded partials finishes. The corpus never shuffles.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        m = _mat(batch[vec_col])
        if m.size == 0:
            empty_g = batch[group_col].combine_chunks().slice(0, 0)
            return pa.table(
                {
                    group_col: empty_g,
                    "dim": pa.array([], pa.int64()),
                    "sum_e6": pa.array([], pa.int64()),
                    "n_vecs": pa.array([], pa.int64()),
                }
            )
        q = np.copysign(np.floor(np.abs(m * 1e6) + 0.5), m).astype(np.int64)
        labs = batch[group_col].to_numpy(zero_copy_only=False)
        order = np.argsort(labs, kind="stable")
        labs_s, q_s = labs[order], q[order]
        first = np.ones(labs_s.size, dtype=bool)
        first[1:] = labs_s[1:] != labs_s[:-1]
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(q_s, starts, axis=0)  # (G, d)
        counts = np.diff(np.append(starts, labs_s.size))
        g, d = sums.shape
        return pa.table(
            {
                group_col: pa.array(np.repeat(labs_s[starts], d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), g)),
                "sum_e6": pa.array(sums.ravel()),
                "n_vecs": pa.array(np.repeat(counts.astype(np.int64), d)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "dim"])
        .aggregate(Sum("sum_e6", alias_name="sum_e6"), Sum("n_vecs", alias_name="n_vecs"))
    )


def knn_filtered(
    ds: rd.Dataset,
    queries: np.ndarray,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    filter_col: str = "label",
    filter_value=None,
) -> rd.Dataset:
    """FILTERED vector search: exact cosine top-k restricted to vectors
    whose ``filter_col`` equals ``filter_value`` — the metadata-filtered
    ANN pattern (per-tenant / per-language / per-license retrieval).
    Pre-filtering is the exact strategy: the predicate runs as a
    vectorized Arrow kernel INSIDE the scan pipeline (fused with the
    read, so non-matching vectors never reach a matmul), then the
    standard broadcast-queries + local-top-k + tiny merge plan. Recall
    is 1.0 by construction — unlike post-filtering a top-k, which
    starves when the filter is selective."""
    import pyarrow.compute as pc

    filt = ds.map_batches(
        lambda t: t.filter(pc.equal(t[filter_col], filter_value)),
        batch_format="pyarrow",
    )
    return knn_brute_force(filt, queries, k=k, vec_col=vec_col, id_col=id_col)


def embedding_dim_stats(
    ds: rd.Dataset,
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Per-dimension EXACT first and second moments of the embedding
    column — n, sum_e6, sumsq_e12 (both int64 over the e6-quantized
    components) — the inputs of feature standardization (whitening,
    per-dim z-scores) and of drift monitoring between corpus snapshots.

    One streaming pass: each batch quantizes its matrix (round-half-
    away, the SQL rule) and emits d partial rows (dim, n, sum, sumsq);
    a d-bounded groupby closes. Overflow headroom: sumsq_e12 grows as
    ~1e12 * n per dim, so int64 holds to ~9e6 rows per dim-partition at
    |v| ~ 1; beyond that shard the pass by vector-id range and merge
    the (also exactly additive) partials."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        m = _mat(batch[vec_col])
        if m.size == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sum_e6": pa.array([], pa.int64()),
                    "sumsq_e12": pa.array([], pa.int64()),
                }
            )
        q = np.copysign(np.floor(np.abs(m * 1e6) + 0.5), m).astype(np.int64)
        d = q.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "n": pa.array(np.full(d, q.shape[0], np.int64)),
                "sum_e6": pa.array(q.sum(axis=0)),
                "sumsq_e12": pa.array((q * q).sum(axis=0)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_e6", alias_name="sum_e6"),
            Sum("sumsq_e12", alias_name="sumsq_e12"),
        )
    )


def mutual_knn_pairs(
    ds: rd.Dataset,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Reciprocal nearest neighbours: pairs (a < b) where b is in a's
    cosine top-``k`` AND a is in b's — the high-precision near-dup /
    curation signal (a one-way neighbour in a dense region is weak
    evidence; a mutual one is strong).

    Plan: the corpus NEVER materializes on the driver — blocks stay in
    the object store (``to_arrow_refs``) and the work list is the
    unordered block pairs, as in ``embedding_near_dup_pairs``; each
    task emits BOTH directions' per-(row, opposite-block) top-k
    candidates from one matmul (its transpose serves the reverse
    direction). A per-query merge then closes the global top-k — a
    per-block top-k under the total order (cosine desc, id asc) is a
    superset of the global one — and one groupby on the oriented pair
    keeps pairs seen from both directions. Exact all-pairs at sandbox
    scale; the 100-TB path replaces the block-pair list with
    IVF/LSH-bucketed candidate generation, the merge and mutual stages
    unchanged."""
    blocks = ds.select_columns([id_col, vec_col]).to_arrow_refs()
    blocks_ref = ray.put(blocks)
    nb = len(blocks)
    descs = [{"i": i, "j": j} for i in range(nb) for j in range(i, nb)]
    neg = np.iinfo(np.int64).min

    def pair_candidates(batch: pa.Table) -> pa.Table:
        blks = ray.get(blocks_ref)
        out_q, out_v, out_c = [], [], []

        def emit(ids_q, ids_c, sims):
            for r in range(sims.shape[0]):
                row = sims[r]
                # drop the self sentinel BEFORE the cut (negating
                # int64-min overflows AND it must not consume a slot)
                valid = row != neg
                idc, rv = ids_c[valid], row[valid]
                order = np.lexsort((idc, -rv))[: min(k, rv.size)]
                out_q.append(np.full(order.size, ids_q[r], np.int64))
                out_v.append(idc[order])
                out_c.append(rv[order])

        for bi, bj_ in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ti = ray.get(blks[bi])
            tj = ti if bj_ == bi else ray.get(blks[bj_])
            ids_i = ti[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            ids_j = tj[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            mi = _normalize(_mat(ti[vec_col]))
            mj = mi if bj_ == bi else _normalize(_mat(tj[vec_col]))
            sims = np.rint((mi @ mj.T) * 1e6).astype(np.int64)
            if bj_ == bi:
                np.fill_diagonal(sims, neg)  # a vector is not its own neighbour
                emit(ids_i, ids_j, sims)  # one pass covers every row as query
            else:
                emit(ids_i, ids_j, sims)
                emit(ids_j, ids_i, sims.T.copy())
        if not out_q:
            return pa.table(
                {
                    "q": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "cosine_e6": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "q": pa.array(np.concatenate(out_q)),
                "v": pa.array(np.concatenate(out_v)),
                "cosine_e6": pa.array(np.concatenate(out_c)),
            }
        )

    cands = rd.from_items(descs).map_batches(
        pair_candidates, batch_format="pyarrow", batch_size=1
    )

    def merge_topk(group: pa.Table) -> pa.Table:
        v = group["v"].to_numpy(zero_copy_only=False)
        c = group["cosine_e6"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -c))[:k]
        q = group["q"].to_numpy(zero_copy_only=False)[order]
        a, b = np.minimum(q, v[order]), np.maximum(q, v[order])
        return pa.table(
            {
                "vec_a": pa.array(a),
                "vec_b": pa.array(b),
                "cosine_e6": pa.array(c[order]),
                "one": pa.array(np.ones(a.size, np.int64)),
            }
        )

    oriented = hash_map_groups(cands, "q", merge_topk)

    from ray.data.aggregate import Min, Sum

    agreed = oriented.groupby(["vec_a", "vec_b"]).aggregate(
        Sum("one", alias_name="n_dirs"), Min("cosine_e6", alias_name="cosine_e6")
    )
    return agreed.map_batches(
        lambda t: t.filter(pc.equal(t["n_dirs"], 2)).select(
            ["vec_a", "vec_b", "cosine_e6"]
        ),
        batch_format="pyarrow",
    )
