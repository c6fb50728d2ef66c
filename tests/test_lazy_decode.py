"""Format-4 lazy postings decode (round-4 verdict #3): shard rows carry
per-block byte offsets, the delta chain restarts at block starts, and
the vectorized WAND path decodes ONLY admitted blocks on a cold term.

Checks: (1) per-block slices decode bit-identical to the full decode,
(2) cold WAND == exhaustive on skewed lists while decoding strictly
fewer blocks than the index holds, (3) an index WITHOUT the offset
columns (pre-format-4) still answers identically via the eager
fallback.
"""

import numpy as np
import pyarrow as pa
import pytest

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.codec import (
    BLOCK,
    encode_postings_multi,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
    _encoded_table,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
    SearchIndex,
    _LazyPostings,
    _elem_view,
)


def _skewed_shard(seed: int, dfs: dict[str, int], n_docs: int = 400_000):
    """One shard table of terms with the given dfs over a shared doc
    space; tf/dl skew concentrates high scores in few blocks so WAND
    admits a small fraction."""
    rng = np.random.default_rng(seed)
    codes_l, ids_l, tfs_l, dls_l = [], [], [], []
    terms = sorted(dfs)
    for c, t in enumerate(terms):
        df = dfs[t]
        ids = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        # spiky tf (mostly 1, rare 200) + constant dl: block upper
        # bounds separate cleanly, so WAND's theta prunes the flat
        # blocks — the shape block-max indexes are built for
        tfs = np.where(rng.random(df) < 0.002, 200, 1).astype(np.int64)
        dls = np.full(df, 500, dtype=np.int64)
        codes_l.append(np.full(df, c, dtype=np.int64))
        ids_l.append(ids)
        tfs_l.append(tfs)
        dls_l.append(dls)
    enc = encode_postings_multi(
        np.concatenate(codes_l), np.concatenate(ids_l),
        np.concatenate(tfs_l), np.concatenate(dls_l),
    )
    tbl = _encoded_table(pa.array(terms), enc)
    return tbl


def _mk_index(tbl: pa.Table, n_docs: int = 400_000):
    meta = {"N": n_docs, "avgdl": 900.0, "k1": 1.2, "b": 0.75}
    return SearchIndex(meta, tbl.combine_chunks(), docstore_path="/nonexistent")


DFS = {"alpha": 60_000, "beta": 45_000, "gamma": 700}


def test_lazy_blocks_bit_identical_to_full_decode():
    tbl = _skewed_shard(11, DFS)
    idx = _mk_index(tbl)
    full = idx.postings("alpha")  # eager decode (also warms the cache)
    cold = _mk_index(tbl)  # fresh instance: cold cache
    lp = cold.lazy_postings("alpha")
    assert lp._full is None  # really the lazy path
    nblocks = lp.block_last.size
    some = np.array([0, 1, nblocks // 2, nblocks - 1])
    lp.ensure(some)
    for bi in some:
        b_ids, b_tfs, b_dls = lp.block(int(bi))
        s, e = bi * BLOCK, min((bi + 1) * BLOCK, lp.df)
        assert np.array_equal(b_ids, full.ids[s:e])
        assert np.array_equal(b_tfs, full.tfs[s:e])
        assert np.array_equal(b_dls, full.dls[s:e])
    assert lp.decoded_blocks == some.size


def test_cold_wand_decodes_only_admitted_blocks_and_matches():
    tbl = _skewed_shard(23, DFS)
    warm = _mk_index(tbl)
    # single common term: theta (exact spike scores) prunes every
    # flat block — decode must touch a small fraction of the list
    for k in (1, 10):
        cold = _mk_index(tbl)
        got = cold.bm25_topk("alpha", k, method="wand")
        want = warm.bm25_topk_exhaustive("alpha", k)
        assert got == want, k
        decoded, total = cold.last_wand_blocks
        assert 0 < decoded < total // 2, (decoded, total, k)
        # nothing leaked into the eager cache: the cold run never
        # full-decoded a term
        assert not cold._cache
    # multi-term: still exact, still never decodes more than the index
    for k in (1, 10, 50):
        cold = _mk_index(tbl)
        got = cold.bm25_topk("alpha beta gamma", k, method="wand")
        want = warm.bm25_topk_exhaustive("alpha beta gamma", k)
        assert got == want, k
        decoded, total = cold.last_wand_blocks
        assert 0 < decoded <= total
        assert not cold._cache


def test_pre_format4_index_falls_back_to_eager_and_matches():
    tbl = _skewed_shard(37, DFS)
    legacy = tbl.drop_columns(["block_doc_off", "block_tf_off", "block_dl_off"])
    idx_new = _mk_index(tbl)
    idx_old = _mk_index(legacy)
    assert idx_old.lazy_postings("beta")._full is not None  # eager wrap
    for k in (1, 10, 50):
        assert idx_old.bm25_topk("alpha beta gamma", k, method="wand") == idx_new.bm25_topk(
            "alpha beta gamma", k, method="wand"
        )


def test_elem_view_zero_copy_matches_as_py():
    tbl = _skewed_shard(5, {"x": 1000, "y": 5})
    col = tbl["doc_blob"].combine_chunks()
    for i in range(tbl.num_rows):
        assert bytes(_elem_view(col, i)) == col[i].as_py()


def test_lazy_wrap_of_warm_term_serves_block_slices():
    tbl = _skewed_shard(41, {"z": 10_000})
    idx = _mk_index(tbl)
    full = idx.postings("z")
    lp = idx.lazy_postings("z")
    assert isinstance(lp, _LazyPostings) and lp._full is full
    ids, tfs, dls = lp.block(3)
    assert np.array_equal(ids, full.ids[3 * BLOCK : 4 * BLOCK])
    lp.ensure(np.array([0, 1]))  # no-op on warm wrap
    assert lp.decoded_blocks == 0
