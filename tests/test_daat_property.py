"""Property-based A/B of the vectorized DAAT paths vs the exhaustive
scorer on randomized synthetic posting lists — beyond the fixed
reference query set: random Zipf-ish corpora, random k, random block
alignments, degenerate single-doc/single-term shapes, score ties.

Builds a minimal in-memory SearchIndex (no build pipeline) with real
``_Postings`` + block metadata produced by the same rule the codec
uses (BLOCK-sized skip blocks, per-block max tf / min dl), so the
upper-bound machinery is exercised exactly as on disk.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.codec import (
    BLOCK,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
    SearchIndex,
    _Postings,
)


def _mk_index(seed: int, n_docs: int, n_terms: int, k1=1.2, b=0.75):
    rng = np.random.default_rng(seed)
    doc_ids = np.sort(
        rng.choice(np.arange(1, n_docs * 7, dtype=np.int64), size=n_docs, replace=False)
    )
    dls = rng.integers(5, 400, size=n_docs).astype(np.int64)
    idx = SearchIndex.__new__(SearchIndex)
    idx.N = n_docs
    idx.avgdl = float(dls.mean())
    idx.k1, idx.b = k1, b
    cache = {}
    for t in range(n_terms):
        df = int(rng.integers(1, n_docs + 1))
        sel = np.sort(rng.choice(n_docs, size=df, replace=False))
        ids = doc_ids[sel]
        tfs = rng.integers(1, 15, size=df).astype(np.int64)
        tdls = dls[sel]
        nblocks = (df + BLOCK - 1) // BLOCK
        last = ids[np.minimum(np.arange(1, nblocks + 1) * BLOCK - 1, df - 1)]
        bmax = np.array([tfs[i * BLOCK : (i + 1) * BLOCK].max() for i in range(nblocks)], np.int64)
        bmin = np.array([tdls[i * BLOCK : (i + 1) * BLOCK].min() for i in range(nblocks)], np.int64)
        cache[f"t{t}"] = _Postings(df, int(tfs.sum()), ids, tfs, tdls, last, bmax, bmin)
    idx._cache = cache
    idx._term_row = {t: 0 for t in cache}  # has_term truth; postings served from _cache
    idx.postings = lambda term: cache[term]
    idx.has_term = lambda term: term in cache
    return idx


@given(
    seed=st.integers(0, 2**31 - 1),
    n_docs=st.integers(1, 900),
    n_terms=st.integers(1, 6),
    k=st.integers(1, 60),
)
@settings(max_examples=60, deadline=None)
def test_vectorized_daat_equals_exhaustive_random(seed, n_docs, n_terms, k):
    idx = _mk_index(seed, n_docs, n_terms)
    q = " ".join(f"t{t}" for t in range(n_terms))
    want = idx.bm25_topk_exhaustive(q, k)
    assert idx._wand_vec([f"t{t}" for t in range(n_terms)], k) == want
    assert idx._maxscore_vec([f"t{t}" for t in range(n_terms)], k) == want


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=20, deadline=None)
def test_vectorized_daat_tie_scores(seed):
    # all tfs and dls equal => every doc containing the same term set
    # ties exactly; top-k must break by doc_id ascending identically
    rng = np.random.default_rng(seed)
    n_docs = int(rng.integers(50, 400))
    idx = _mk_index(seed, n_docs, 2)
    for t in idx._cache.values():
        t.tfs[:] = 3
        t.dls[:] = 100
        t.block_max_tf[:] = 3
        t.block_min_dl[:] = 100
    idx.avgdl = 100.0
    terms = list(idx._cache)
    q = " ".join(terms)
    for k in (1, 7, 10**6):
        want = idx.bm25_topk_exhaustive(q, k)
        assert idx._wand_vec(terms, k) == want
        assert idx._maxscore_vec(terms, k) == want


def test_vectorized_daat_small_batches_cover_stop_logic():
    # tiny admission batches force many theta re-checks + the early
    # stop; results must still be exact
    idx = _mk_index(1234, 800, 4)
    terms = list(idx._cache)
    q = " ".join(terms)
    for k in (1, 10, 50):
        want = idx.bm25_topk_exhaustive(q, k)
        assert idx._wand_vec(terms, k, batch_intervals=1) == want
        assert idx._maxscore_vec(terms, k, batch_docs=16) == want
