"""Dedup operator suite vs brute-force / DuckDB ground truth on the
driver `documents` table and synthetic mutated corpora."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.sketches import (
    hamming64,
    minhash_est_jaccard,
    minhash_params,
    minhash_signature,
    shingle_hashes,
    simhash64,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import tokenize
from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
    exact_dedup_summary,
    exact_dup_losers,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _mutated_corpus(n_base=40, seed=3):
    """Docs where i and i+1 are near-dups (a few token edits), far from
    everything else. Returns (table, near_pairs)."""
    rng = np.random.default_rng(seed)
    words = [f"w{h}" for h in range(500)]
    rows, pairs = [], []
    did = 0
    for b in range(n_base):
        toks = [words[rng.integers(0, 500)] for _ in range(80)]
        rows.append((did, " ".join(toks)))
        mutated = list(toks)
        for _ in range(3):  # ~96% shingle overlap
            mutated[rng.integers(0, 80)] = words[rng.integers(0, 500)]
        rows.append((did + 1, " ".join(mutated)))
        pairs.append((did, did + 1))
        did += 2
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    return t, set(pairs)


def test_exact_dedup_matches_duckdb():
    ds = rd.read_parquet(DOCS)
    got = exact_dedup_summary(ds).to_pandas().sort_values("text_md5").reset_index(drop=True)
    want = (
        duckdb.sql(
            f"SELECT md5(text) AS text_md5, min(doc_id) AS canonical_doc_id, "
            f"count(*) AS n_copies FROM read_parquet('{DOCS}') GROUP BY md5(text)"
        )
        .df()
        .sort_values("text_md5")
        .reset_index(drop=True)
    )
    assert got["text_md5"].tolist() == want["text_md5"].tolist()
    assert got["canonical_doc_id"].tolist() == want["canonical_doc_id"].tolist()
    assert got["n_copies"].tolist() == want["n_copies"].tolist()


def test_exact_losers_complement():
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(["x", "y", "x", "z", "x"], pa.string()),
        }
    )
    losers = exact_dup_losers(rd.from_arrow(tbl)).to_pandas().sort_values("doc_id")
    assert losers["doc_id"].tolist() == [3, 5]
    assert losers["canonical_doc_id"].tolist() == [1, 1]


def test_minhash_estimate_tracks_true_jaccard():
    a, b = minhash_params(256, seed=5)
    t1 = tokenize("the quick brown fox jumps over the lazy dog again and again today")
    t2 = tokenize("the quick brown fox jumps over the lazy cat again and again today")
    s1, s2 = shingle_hashes(t1), shingle_hashes(t2)
    true_j = len(np.intersect1d(s1, s2)) / len(np.union1d(s1, s2))
    est = minhash_est_jaccard(minhash_signature(s1, a, b), minhash_signature(s2, a, b))
    assert abs(est - true_j) < 0.15


def test_minhash_lsh_finds_near_dups():
    tbl, near = _mutated_corpus()
    ds = rd.from_arrow(tbl)
    got = minhash_lsh_pairs(ds, est_threshold=0.5).to_pandas()
    found = set(zip(got["doc_a"], got["doc_b"]))
    recall = len(found & near) / len(near)
    assert recall >= 0.95, f"recall {recall}"
    # precision: nothing random should collide at J>=0.5
    assert not (found - near), f"false positives: {found - near}"


def test_simhash_pairs_on_near_dups():
    tbl, near = _mutated_corpus()
    ds = rd.from_arrow(tbl)
    got = simhash_pairs(ds, max_hamming=3).to_pandas()
    found = set(zip(got["doc_a"], got["doc_b"]))
    # simhash hd<=3 is a stricter near-dup notion; found pairs must be
    # real near-dups and hamming must verify against direct computation
    assert found <= near
    from collections import Counter

    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    for a, b, hd in zip(got["doc_a"], got["doc_b"], got["hamming"]):
        ca, cb = Counter(tokenize(texts[a])), Counter(tokenize(texts[b]))
        sa = simhash64(list(ca.keys()), np.fromiter(ca.values(), np.int64, len(ca)))
        sb = simhash64(list(cb.keys()), np.fromiter(cb.values(), np.int64, len(cb)))
        assert hamming64(sa, sb) == hd <= 3


def _weird_texts():
    """Texts hitting every batch-kernel branch: empty, all-punct (0
    tokens), shorter than the shingle width, exactly the width, long,
    and HTML-tagged."""
    return [
        "",
        "...!!!",
        "one",
        "two words",
        "three token doc",
        "<p>Hello, World &amp; <b>friends</b></p> again and again",
        " ".join(f"tok{i % 37}" for i in range(400)),
        "The quick brown fox jumps over the lazy dog",
    ]


def test_minhash_stage_bit_identical_to_per_doc():
    """The batch MinHash kernel path must produce EXACTLY the signature
    of minhash_signature(shingle_hashes(tokenize(t))) per doc."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
        MinHashStage,
    )

    texts = _weird_texts()
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    stage = MinHashStage(num_perm=64, seed=7, shingle_n=3)
    out = stage(batch)
    sigs = np.array(out["sig"].to_pylist(), dtype=np.int64).view(np.uint64)
    for i, t in enumerate(texts):
        want = minhash_signature(shingle_hashes(tokenize(t), 3), stage.a, stage.b)
        assert (sigs[i] == want).all(), f"doc {i!r} signature drifted"


def test_minhash_from_segments_chunked_paths():
    """Slab chunking and the oversized-single-segment fold must match
    the naive per-segment signature."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.sketches import (
        minhash_from_segments,
    )

    rng = np.random.default_rng(11)
    a, b = minhash_params(32, seed=2)
    seg_lens = [5, 1, 300, 17, 2, 90]  # chunk=64 forces multi-slab + fold
    sh = rng.integers(0, 1 << 61, size=sum(seg_lens), dtype=np.uint64)
    offs = np.concatenate(([0], np.cumsum(seg_lens)))
    got = minhash_from_segments(sh, offs, a, b, chunk=64)
    for i in range(len(seg_lens)):
        want = minhash_signature(sh[offs[i] : offs[i + 1]], a, b)
        assert (got[i] == want).all(), f"segment {i}"

    # small segment immediately before an oversized one: the oversized
    # segment must NOT be dragged into the small segment's slab (it
    # would bypass the fold and allocate (num_perm, huge) at once) —
    # the boundary-crossing segment is excluded, then folded alone
    seg_lens2 = [3, 500]
    sh2 = rng.integers(0, 1 << 61, size=sum(seg_lens2), dtype=np.uint64)
    offs2 = np.concatenate(([0], np.cumsum(seg_lens2)))
    got2 = minhash_from_segments(sh2, offs2, a, b, chunk=64)
    for i in range(len(seg_lens2)):
        want2 = minhash_signature(sh2[offs2[i] : offs2[i + 1]], a, b)
        assert (got2[i] == want2).all(), f"segment {i}"


def test_band_keys_matrix_identical_to_per_doc():
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.sketches import (
        band_keys_matrix,
        lsh_band_keys,
    )

    rng = np.random.default_rng(4)
    sigs = rng.integers(0, 1 << 61, size=(10, 128), dtype=np.uint64)
    got = band_keys_matrix(sigs, 16)
    for i in range(10):
        assert got[i].tolist() == lsh_band_keys(sigs[i], 16)


def test_simhash_stage_bit_identical_to_per_doc():
    from collections import Counter

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
        SimHashStage,
    )

    texts = _weird_texts()
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = SimHashStage()(batch)
    got = out["simhash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    for i, t in enumerate(texts):
        c = Counter(tokenize(t))
        want = simhash64(list(c.keys()), np.fromiter(c.values(), np.int64, len(c)))
        assert int(got[i]) == want, f"doc {i!r} simhash drifted"


def test_ngram_jaccard_exact_vs_bruteforce():
    tbl, _near = _mutated_corpus(n_base=15)
    ds = rd.from_arrow(tbl)
    got = ngram_jaccard_pairs(ds, n=3, threshold=0.3).to_pandas()
    got_map = {(a, b): j for a, b, j in zip(got["doc_a"], got["doc_b"], got["jaccard"])}

    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    sets = {
        d: {" ".join(tokenize(t)[i : i + 3]) for i in range(len(tokenize(t)) - 2)}
        for d, t in texts.items()
    }
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter:
                j = inter / len(sets[a] | sets[b])
                if j >= 0.3:
                    want[(a, b)] = j
    assert set(got_map) == set(want)
    for k in want:
        assert got_map[k] == pytest.approx(want[k], abs=1e-12)


def test_contamination_counts_vs_pure_python():
    import pyarrow.parquet as pq
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
        benchmark_shingle_set,
        contamination_counts,
    )

    tbl = pq.read_table(DOCS, columns=["doc_id", "text"])
    ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    bench = benchmark_shingle_set(ds, n=3, n_docs=5)
    got = contamination_counts(ds, bench, n=3, min_hits=1).to_pandas()
    got_map = dict(zip(got["doc_id"], got["n_hits"]))

    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    shingles = {
        d: {" ".join(tokenize(t)[i : i + 3]) for i in range(len(tokenize(t)) - 2)}
        for d, t in texts.items()
    }
    bench_set = set().union(*(shingles[d] for d in sorted(shingles)[:5]))
    want = {d: len(s & bench_set) for d, s in shingles.items() if s & bench_set}
    assert got_map == want
    # the benchmark docs themselves are fully contaminated by definition
    for d in sorted(shingles)[:5]:
        if shingles[d]:
            assert got_map[d] == len(shingles[d])


def test_dup_clusters_transitive_closure():
    import pyarrow as pa
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
        dup_clusters,
    )

    # chain 1-2-3-4 (pairwise only adjacent), separate pair (10, 11),
    # and a star 20-(21,22) — min-label must close the transitive hull
    pairs = pa.table(
        {
            "doc_a": pa.array([1, 2, 3, 10, 20, 20], pa.int64()),
            "doc_b": pa.array([2, 3, 4, 11, 21, 22], pa.int64()),
        }
    )
    got = dup_clusters(
        rd.from_arrow(pairs).repartition(3), rounds=10
    ).to_pandas()
    labels = dict(zip(got["doc_id"], got["cluster_id"]))
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    # rounds smaller than the diameter: node 4 has only seen 3 hops of
    # the chain after 1 round -> label 3, not 1 (documents the K-round
    # semantics the SQL oracle unrolls)
    one = dup_clusters(rd.from_arrow(pairs), rounds=1).to_pandas()
    l1 = dict(zip(one["doc_id"], one["cluster_id"]))
    assert l1[4] == 3 and l1[2] == 1


def test_cluster_cap_marks():
    """cluster_cap_marks keeps the cap lowest doc_ids per cluster and
    marks the rest dropped — exact expected flags on known clusters."""
    import pyarrow as pa
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
        cluster_cap_marks,
        dup_clusters,
    )

    pairs = pa.table(
        {
            "doc_a": pa.array([1, 2, 3, 10, 20, 20], pa.int64()),
            "doc_b": pa.array([2, 3, 4, 11, 21, 22], pa.int64()),
        }
    )
    clusters = dup_clusters(rd.from_arrow(pairs).repartition(3), rounds=10)
    got = cluster_cap_marks(clusters, cap=2).to_pandas()
    flags = {int(r.doc_id): bool(r.kept) for r in got.itertuples()}
    # chain {1,2,3,4}: keep 1,2; pair {10,11}: both; star {20,21,22}: 20,21
    assert flags == {
        1: True, 2: True, 3: False, 4: False,
        10: True, 11: True,
        20: True, 21: True, 22: False,
    }
    # cap=1 degenerates to keep-one-per-cluster
    one = cluster_cap_marks(clusters, cap=1).to_pandas()
    kept = sorted(int(r.doc_id) for r in one.itertuples() if r.kept)
    assert kept == [1, 10, 20]


def test_chunk_dedup_stats_matches_python_reference():
    """Distributed chunk-dup accounting (vectorized polynomial chunk
    hashes + count shuffle + bucketed join) vs a Counter reference."""
    from collections import Counter

    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
        chunk_dedup_stats,
    )

    w = 8
    docs = pq.read_table(DOCS, columns=["doc_id", "text"])
    chunks = {}  # doc_id -> list of chunk strings
    c = Counter()
    for r in docs.to_pylist():
        toks = tokenize(r["text"])
        ch = [" ".join(toks[i : i + w]) for i in range(0, len(toks) // w * w, w)]
        if ch:
            chunks[r["doc_id"]] = ch
            c.update(ch)

    ds = rd.from_arrow(docs)
    out = chunk_dedup_stats(ds, chunk_tokens=w).to_pandas()
    got = {r.doc_id: (r.n_chunks, r.n_dup_chunks) for r in out.itertuples()}
    expect = {
        d: (len(ch), sum(1 for s in ch if c[s] > 1)) for d, ch in chunks.items()
    }
    assert got == expect
    assert sum(v[1] for v in expect.values()) > 0  # corpus has real dups


def test_winnowing_guarantee_and_partitioning():
    import pyarrow as pa
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
        winnowing_pairs,
    )

    # docs 1 and 2 share a 40-char passage (>= gram+window-1 = 23), so
    # the winnowing guarantee forces >= 1 shared fingerprint; doc 3 is
    # unrelated filler of the same length
    shared = "the quick brown fox jumps over the lazy dog"
    t1 = "aaaa bbbb cccc " + shared + " dddd eeee ffff gggg hhhh"
    t2 = "zzzz yyyy xxxx " + shared + " wwww vvvv uuuu tttt ssss"
    t3 = "k" * len(t1)
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([t1, t2, t3], pa.string()),
        }
    )
    got = (
        winnowing_pairs(rd.from_arrow(tbl), gram_len=16, window=8, min_shared=1)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pairs = {(r.doc_a, r.doc_b): r.n_shared_fps for r in got.itertuples()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert (1, 3) not in pairs and (2, 3) not in pairs

    # partitioning invariance
    got4 = (
        winnowing_pairs(
            rd.from_arrow(tbl).repartition(3), gram_len=16, window=8, min_shared=1
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert got.equals(got4)
