"""Similarity-search operators vs brute-force numpy ground truth on the
driver `embeddings` table."""

import numpy as np
import pyarrow.parquet as pq
import ray.data as rd

from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
    embedding_near_dup_pairs,
    knn_brute_force,
    lsh_knn,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _load():
    t = pq.read_table(EMB)
    ids = t["vec_id"].to_numpy()
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, m


def _norm(m):
    n = np.sqrt((m * m).sum(axis=1, keepdims=True))
    n[n == 0] = 1
    return m / n


def test_knn_brute_force_matches_numpy():
    ids, m = _load()
    qn = _norm(m[:5])
    mn = _norm(m)
    sims = np.rint((qn @ mn.T) * 1e6).astype(np.int64)
    ds = rd.read_parquet(EMB)
    got = knn_brute_force(ds, m[:5], k=10).to_pandas()
    for qi in range(5):
        row = sims[qi]
        order = np.lexsort((ids, -row))[:10]
        want_ids = ids[order].tolist()
        sub = got[got["query_id"] == qi].sort_values(
            ["cosine_e6", "vec_id"], ascending=[False, True]
        )
        assert sub["vec_id"].tolist() == want_ids
        assert sub["cosine_e6"].tolist() == row[order].tolist()


def _planted_corpus(n_base=60, dim=32, seed=11):
    """Clustered corpus: each base vector gets one tiny-noise near
    neighbor (cosine ~0.99). Returns (table, planted_pairs)."""
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    noisy = base + 0.05 * rng.standard_normal((n_base, dim))
    vecs = np.empty((2 * n_base, dim))
    vecs[0::2] = base
    vecs[1::2] = noisy
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(2 * n_base, dtype=np.int64)),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    return tbl, {(2 * i, 2 * i + 1) for i in range(n_base)}


def test_lsh_knn_finds_planted_neighbors():
    tbl, planted = _planted_corpus()
    vecs = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    queries = vecs[0::2][:30]  # the base vectors
    got = lsh_knn(rd.from_arrow(tbl), queries, k=5, num_planes=4).to_pandas()
    hits = 0
    for qi in range(30):
        sub = set(got[got["query_id"] == qi]["vec_id"])
        assert 2 * qi in sub  # own vector always shares its own bucket
        if 2 * qi + 1 in sub:
            hits += 1
    # single-table LSH with 4 planes: planted-neighbor collision
    # probability ~(1 - theta/pi)^4 ≈ 0.8 at cosine ~0.99
    assert hits / 30 >= 0.6, f"planted recall {hits/30}"


def test_near_dup_pairs_exact():
    ids, m = _load()
    mn = _norm(m)
    sims = np.rint((mn @ mn.T) * 1e6).astype(np.int64)
    thr = 0.4  # driver embeddings are near-random; max off-diag ~0.48
    ai, bj = np.nonzero(sims >= int(thr * 1e6))
    want = {(int(ids[i]), int(ids[j])) for i, j in zip(ai, bj) if ids[i] < ids[j]}
    assert want, "threshold too high for this corpus"
    got = embedding_near_dup_pairs(rd.read_parquet(EMB), threshold=thr).to_pandas()
    got_pairs = set(zip(got["vec_a"], got["vec_b"]))
    assert got_pairs == want


def test_near_dup_pairs_planted():
    tbl, planted = _planted_corpus()
    got = embedding_near_dup_pairs(
        rd.from_arrow(tbl), threshold=0.95, id_col="vec_id"
    ).to_pandas()
    got_pairs = set(zip(got["vec_a"], got["vec_b"]))
    assert len(got_pairs & planted) / len(planted) > 0.9


def test_ivf_knn_recall_vs_bruteforce():
    """IVF with nprobe covering a good share of nlist must recover most
    exact neighbors; with nprobe == nlist it IS exact search."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
        ivf_knn,
        knn_brute_force,
    )

    tbl, _ = _planted_corpus(n_base=100)
    vecs = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    queries = vecs[0::2][:20]
    exact = knn_brute_force(rd.from_arrow(tbl), queries, k=5).to_pandas()
    # full probe == exact
    full = ivf_knn(rd.from_arrow(tbl), queries, k=5, nlist=8, nprobe=8).to_pandas()
    for qi in range(20):
        e = exact[exact["query_id"] == qi].sort_values(["cosine_e6", "vec_id"], ascending=[False, True])
        f = full[full["query_id"] == qi].sort_values(["cosine_e6", "vec_id"], ascending=[False, True])
        assert e["vec_id"].tolist() == f["vec_id"].tolist(), qi
    # partial probe: recall over exact top-5
    approx = ivf_knn(rd.from_arrow(tbl), queries, k=5, nlist=8, nprobe=3).to_pandas()
    hit = tot = 0
    for qi in range(20):
        want = set(exact[exact["query_id"] == qi]["vec_id"])
        got_ids = set(approx[approx["query_id"] == qi]["vec_id"])
        hit += len(want & got_ids)
        tot += len(want)
    assert hit / tot >= 0.5, f"ivf recall {hit/tot}"


def test_near_dup_auto_cutover_both_sides():
    """The auto wrapper must take the exact plan below the cutoff and
    the banded-LSH plan above it; the LSH side must equal the numpy
    replay of bucketing + exact verify (deterministic, not just recall)."""
    import pytest

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
        banded_lsh_near_dup_pairs,
        embedding_near_dup_pairs_auto,
        hyperplanes,
    )

    ids, m = _load()
    mn = _norm(m)
    thr = 0.4
    sims = np.rint((mn @ mn.T) * 1e6).astype(np.int64)
    ai, bj = np.nonzero(sims >= int(thr * 1e6))
    exact = {(int(ids[i]), int(ids[j])) for i, j in zip(ai, bj) if ids[i] < ids[j]}

    # exact side of the cutover
    got = embedding_near_dup_pairs_auto(
        rd.read_parquet(EMB), threshold=thr, exact_max_rows=10_000
    ).to_pandas()
    assert set(zip(got["vec_a"], got["vec_b"])) == exact

    # LSH side: replay banding in numpy for the expected candidate set
    num_bands, ppb = 8, 4
    planes = hyperplanes(m.shape[1], num_bands * ppb, 7)
    signs = (m @ planes.T) > 0.0
    weights = 1 << np.arange(ppb)
    want = set()
    for bnd in range(num_bands):
        keys = signs[:, bnd * ppb : (bnd + 1) * ppb].astype(np.int64) @ weights
        for key in np.unique(keys):
            members = np.flatnonzero(keys == key)
            for x in range(members.size):
                for y in range(x + 1, members.size):
                    i, j = members[x], members[y]
                    if sims[i, j] >= int(thr * 1e6):
                        a, b = sorted((int(ids[i]), int(ids[j])))
                        want.add((a, b))
    got2 = embedding_near_dup_pairs_auto(
        rd.read_parquet(EMB),
        threshold=thr,
        exact_max_rows=0,
        num_bands=num_bands,
        planes_per_band=ppb,
    ).to_pandas()
    got2_pairs = set(zip(got2["vec_a"], got2["vec_b"]))
    assert got2_pairs == want
    assert want <= exact  # LSH finds only true pairs
    # direct call agrees with the auto dispatch
    got3 = banded_lsh_near_dup_pairs(
        rd.read_parquet(EMB), threshold=thr, num_bands=num_bands, planes_per_band=ppb
    ).to_pandas()
    assert set(zip(got3["vec_a"], got3["vec_b"])) == want
    # each surviving pair carries the exact cosine
    for a, b, c in zip(got2["vec_a"], got2["vec_b"], got2["cosine_e6"]):
        ia, ib = int(np.flatnonzero(ids == a)[0]), int(np.flatnonzero(ids == b)[0])
        assert c == sims[ia, ib]


def test_pq_topk_contract_and_recall():
    """pq_topk (ADC shortlist + exact re-rank) vs a numpy replay of the
    SAME contract: identical rows at two partitionings, and recall@10
    vs exact L2 clears a floor the shortlist alone does not."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
        pq_topk,
        train_pq_codebooks,
    )

    ids, mat = _load()
    x = np.floor(mat * 1e6 + 0.5).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids_s, x_s = ids[order], x[order]

    m, k_codes, iters, k, rerank, nq = 8, 16, 2, 10, 4, 8
    cbs = train_pq_codebooks(x_s, m=m, k_codes=k_codes, iters=iters)
    sub = x.shape[1] // m

    # numpy replay of the contract
    codes = np.empty((ids.size, m), np.int64)
    for j in range(m):
        d = (
            (x[:, None, j * sub : (j + 1) * sub] - cbs[j][None, :, :]) ** 2
        ).sum(axis=2)
        codes[:, j] = d.argmin(axis=1)
    want = {}
    for q in range(nq):
        qi = int(np.flatnonzero(ids == q)[0])
        adc = np.zeros(ids.size, np.int64)
        for j in range(m):
            dt = ((x[qi, j * sub : (j + 1) * sub] - cbs[j]) ** 2).sum(axis=1)
            adc += dt[codes[:, j]]
        short = np.lexsort((ids, adc))[: k * rerank]
        dist = ((x[short] - x[qi]) ** 2).sum(axis=1)
        sel = short[np.lexsort((ids[short], dist))[:k]]
        want[q] = [
            (int(ids[i]), int(adc[i]), int(((x[i] - x[qi]) ** 2).sum()))
            for i in sel
        ]

    for parts in (2, 7):
        got = pq_topk(
            rd.read_parquet(EMB).repartition(parts),
            m=m,
            k_codes=k_codes,
            iters=iters,
            k=k,
            rerank=rerank,
            n_queries=nq,
        ).to_pandas()
        for q in range(nq):
            rows = got[got.query_id == q].sort_values(["dist", "vec_id"])
            assert [
                (int(r.vec_id), int(r.adc), int(r.dist)) for r in rows.itertuples()
            ] == want[q], (parts, q)

    # recall floor vs exact L2 (re-rank is exact on the shortlist, so
    # recall == |exact top-k ∩ ADC shortlist| / k)
    rec = []
    for q in range(nq):
        qi = int(np.flatnonzero(ids == q)[0])
        d = ((x - x[qi]) ** 2).sum(axis=1)
        exact = set(ids[np.lexsort((ids, d))[:k]].tolist())
        approx = {v for v, _a, _d in want[q]}
        rec.append(len(exact & approx) / k)
    assert sum(rec) / len(rec) >= 0.5, rec


def test_ivfpq_topk_contract_and_recall():
    """ivfpq_topk (probed ADC shortlist + exact re-rank) vs a numpy
    replay of the SAME contract at two partitionings, plus a recall
    floor vs exact L2."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
        ivfpq_topk,
        train_ivfpq,
        _assign_exact,
    )

    ids, mat = _load()
    x = np.floor(mat * 1e6 + 0.5).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    x_s = x[order]

    nlist, nprobe, m, k_codes, iters, k, rerank, nq = 8, 3, 8, 16, 2, 10, 4, 8
    coarse, cbs = train_ivfpq(x_s, nlist=nlist, m=m, k_codes=k_codes, iters=iters)
    sub = x.shape[1] // m

    ca, _ = _assign_exact(x, coarse)
    rb = x - coarse[ca]
    codes = np.empty((ids.size, m), np.int64)
    for j in range(m):
        codes[:, j], _ = _assign_exact(
            np.ascontiguousarray(rb[:, j * sub : (j + 1) * sub]), cbs[j]
        )
    cidx = np.arange(nlist, dtype=np.int64)
    want = {}
    for q in range(nq):
        qi = int(np.flatnonzero(ids == q)[0])
        dc = ((coarse - x[qi]) ** 2).sum(axis=1)
        probe = np.lexsort((cidx, dc))[:nprobe]
        cand = np.flatnonzero(np.isin(ca, probe))
        adc = np.zeros(cand.size, np.int64)
        for j in range(m):
            for p in probe:
                rows = cand[ca[cand] == p]
                if not rows.size:
                    continue
                qr = x[qi] - coarse[p]
                dt = ((qr[j * sub : (j + 1) * sub] - cbs[j]) ** 2).sum(axis=1)
                adc[np.isin(cand, rows)] += dt[codes[rows, j]]
        short = cand[np.lexsort((ids[cand], adc))[: k * rerank]]
        adc_of = dict(zip(cand.tolist(), adc.tolist()))
        dist = ((x[short] - x[qi]) ** 2).sum(axis=1)
        sel = short[np.lexsort((ids[short], dist))[:k]]
        want[q] = [
            (int(ids[i]), int(adc_of[int(i)]), int(((x[i] - x[qi]) ** 2).sum()))
            for i in sel
        ]

    for parts in (2, 7):
        got = ivfpq_topk(
            rd.read_parquet(EMB).repartition(parts),
            nlist=nlist,
            nprobe=nprobe,
            m=m,
            k_codes=k_codes,
            iters=iters,
            k=k,
            rerank=rerank,
            n_queries=nq,
        ).to_pandas()
        for q in range(nq):
            rows = got[got.query_id == q].sort_values(["dist", "vec_id"])
            assert [
                (int(r.vec_id), int(r.adc), int(r.dist)) for r in rows.itertuples()
            ] == want[q], (parts, q)

    rec = []
    for q in range(nq):
        qi = int(np.flatnonzero(ids == q)[0])
        d = ((x - x[qi]) ** 2).sum(axis=1)
        exact = set(ids[np.lexsort((ids, d))[:k]].tolist())
        approx = {v for v, _a, _d in want[q]}
        rec.append(len(exact & approx) / k)
    assert sum(rec) / len(rec) >= 0.4, rec


def test_knn_range_search_matches_numpy():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
        knn_range_search,
    )

    ids, m = _load()
    qn = _norm(m[:5])
    mn = _norm(m)
    sims = np.rint((qn @ mn.T) * 1e6).astype(np.int64)
    thr = 300_000
    ds = rd.read_parquet(EMB)
    got = (
        knn_range_search(ds, m[:5], threshold_e6=thr)
        .to_pandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    qi, vi = np.nonzero(sims >= thr)
    want = sorted(zip(qi.tolist(), ids[vi].tolist(), sims[qi, vi].tolist()))
    assert list(map(tuple, got.itertuples(index=False))) == want
    assert len(want) >= 5  # self-matches at minimum — non-vacuous


def test_semantic_dedup_matches_numpy_and_partitioning():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
        _assign_exact,
        _micros,
        kmeans_train_micros,
        semantic_dedup,
    )

    tbl, planted = _planted_corpus(n_base=40, dim=16, seed=3)
    ds = rd.from_arrow(tbl)
    k, iters, thr = 4, 2, 0.9
    got = (
        semantic_dedup(ds, k=k, iters=iters, threshold=thr)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    got8 = (
        semantic_dedup(ds.repartition(8), k=k, iters=iters, threshold=thr)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # partitioning-invariant
    for col in ("cluster", "is_dup"):
        assert got[col].tolist() == got8[col].tolist(), col

    # single-process replay of the contract: assign with the trained
    # centroids, then within-cluster keep-first at cosine_e6 >= thr
    cents = kmeans_train_micros(ds, k=k, iters=iters)
    x = _micros(tbl["embedding"])
    assign, _ = _assign_exact(x, cents)
    ids = tbl["vec_id"].to_numpy()
    m = _norm(np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64))
    sims = np.rint((m @ m.T) * 1e6).astype(np.int64)
    thr_e6 = int(round(thr * 1e6))
    want_dup = {}
    for j in range(len(ids)):
        earlier = np.nonzero(
            (assign == assign[j]) & (ids < ids[j]) & (sims[:, j] >= thr_e6)
        )[0]
        if earlier.size:
            want_dup[int(ids[j])] = int(ids[earlier].min())
    assert got["cluster"].tolist() == assign[np.argsort(ids)].tolist()
    dup_rows = got[got["is_dup"] == 1]
    assert {int(r.vec_id): int(r.dup_of) for r in dup_rows.itertuples()} == want_dup

    # planted near-neighbours (cos ~0.99) that share a cluster must be
    # caught — and a healthy majority should share one (non-vacuous)
    caught = sum(1 for a, b in planted if want_dup.get(b) is not None)
    assert caught >= len(planted) * 0.5, caught


def test_knn_matryoshka_truncates_correctly():
    ids, m = _load()
    d = 16
    qn = _norm(m[:5, :d])
    mn = _norm(m[:, :d])
    sims = np.rint((qn @ mn.T) * 1e6).astype(np.int64)
    ds = rd.read_parquet(EMB)
    got = knn_brute_force(ds, m[:5], k=10, dims=d).to_pandas()
    for qi in range(5):
        row = sims[qi]
        order = np.lexsort((ids, -row))[:10]
        sub = got[got["query_id"] == qi].sort_values(
            ["cosine_e6", "vec_id"], ascending=[False, True]
        )
        assert sub["vec_id"].tolist() == ids[order].tolist()
        assert sub["cosine_e6"].tolist() == row[order].tolist()
    # dims=None is exactly the full-width ranking
    full = knn_brute_force(ds, m[:5], k=10).to_pandas()
    trunc_none = knn_brute_force(ds, m[:5], k=10, dims=None).to_pandas()
    assert full.equals(trunc_none)


def test_grouped_centroids_exact_integers():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
        grouped_centroids,
    )

    t = pq.read_table(EMB)
    labs = t["label"].to_numpy()
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    q = np.copysign(np.floor(np.abs(m * 1e6) + 0.5), m).astype(np.int64)
    got = (
        grouped_centroids(rd.read_parquet(EMB), "label", "embedding")
        .to_pandas()
        .set_index(["label", "dim"])
        .sort_index()
    )
    assert len(got) == len(set(labs.tolist())) * m.shape[1]
    for lab in sorted(set(labs.tolist()))[:4]:
        rows = q[labs == lab]
        for dim in (0, 1, 63):
            assert got.loc[(lab, dim), "sum_e6"] == rows[:, dim].sum()
            assert got.loc[(lab, dim), "n_vecs"] == rows.shape[0]


def test_embedding_dim_stats_exact():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
        embedding_dim_stats,
    )

    _ids, m = _load()
    q = np.copysign(np.floor(np.abs(m * 1e6) + 0.5), m).astype(np.int64)
    got = embedding_dim_stats(rd.read_parquet(EMB)).to_pandas().set_index("dim").sort_index()
    assert len(got) == m.shape[1]
    assert (got["n"] == m.shape[0]).all()
    assert got["sum_e6"].to_numpy().tolist() == q.sum(axis=0).tolist()
    assert got["sumsq_e12"].to_numpy().tolist() == (q * q).sum(axis=0).tolist()


def test_mutual_knn_pairs_matches_numpy_and_partitioning():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
        mutual_knn_pairs,
    )

    ids, m = _load()
    mn = _norm(m)
    sims = np.rint((mn @ mn.T) * 1e6).astype(np.int64)
    k = 5
    topk = {}
    for r in range(len(ids)):
        valid = np.arange(len(ids)) != r  # exclude self, no sentinel
        idc, rv = ids[valid], sims[r][valid]
        order = np.lexsort((idc, -rv))[:k]
        topk[int(ids[r])] = set(idc[order].tolist())
    want = {
        (int(a), int(b))
        for a in topk
        for b in topk[a]
        if a < b and a in topk[b]
    }
    for nparts in (1, 6):
        ds = rd.read_parquet(EMB).repartition(nparts)
        got = mutual_knn_pairs(ds, k=k).to_pandas()
        pairs = set(zip(got["vec_a"].tolist(), got["vec_b"].tolist()))
        assert pairs == want, nparts
        for a, b, c in zip(got["vec_a"], got["vec_b"], got["cosine_e6"]):
            ia, ib = int(np.where(ids == a)[0][0]), int(np.where(ids == b)[0][0])
            assert c == sims[ia, ib]
