"""Positional index (format 3): codec round-trips, positional phrase
evaluation ≡ docstore-verify ≡ brute-force oracle, salting/parallelism
invariance of the position stream, and non-regression of the
position-less columns."""

import shutil

import numpy as np
import pytest

from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.codec import (
    decode_position_stream,
    encode_position_stream,
    encode_postings,
    encode_postings_multi,
    gather_segments,
    merge_encoded_runs,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
    build_index,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.oracle import (
    OracleIndex,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
    SearchIndex,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
    pages_parquet,
    phrase_queries,
    reference_queries,
)

N_DOCS = 300


# ---------------------------------------------------------------- codec


def _rand_postings(seed: int, n_terms: int = 6):
    rng = np.random.default_rng(seed)
    rows = []
    for code in range(n_terms):
        docs = np.sort(rng.choice(2000, size=int(rng.integers(1, 50)), replace=False))
        for d in docs:
            tf = int(rng.integers(1, 7))
            pos = np.sort(rng.choice(800, size=tf, replace=False))
            rows.append((code, int(d), tf, pos))
    rng.shuffle(rows)
    return rows


def test_position_stream_roundtrip():
    rng = np.random.default_rng(3)
    tfs = rng.integers(1, 9, size=200)
    pos = np.concatenate([np.sort(rng.choice(500, size=t, replace=False)) for t in tfs])
    buf, lens = encode_position_stream(pos, tfs)
    assert lens.sum() == len(buf)
    got = decode_position_stream(buf, tfs)
    assert np.array_equal(got, pos)
    # empty
    b, l = encode_position_stream(np.empty(0, np.int64), np.empty(0, np.int64))
    assert b == b"" and decode_position_stream(b, np.empty(0, np.int64)).size == 0


def test_gather_segments():
    flat = np.arange(10)
    counts = np.array([3, 0, 2, 5])
    order = np.array([2, 0, 3, 1])
    got = gather_segments(flat, counts, order)
    assert got.tolist() == [3, 4, 0, 1, 2, 5, 6, 7, 8, 9]


def test_multi_encode_positions_match_single():
    rows = _rand_postings(7)
    codes = np.array([r[0] for r in rows])
    ids = np.array([r[1] for r in rows])
    tfs = np.array([r[2] for r in rows])
    dls = ids % 53 + 21
    pos_flat = np.concatenate([r[3] for r in rows])
    enc = encode_postings_multi(codes, ids, tfs, dls, pos_flat=pos_flat)
    for i, code in enumerate(enc["codes_out"]):
        sel = sorted((r for r in rows if r[0] == code), key=lambda r: r[1])
        e_ids = np.array([r[1] for r in sel])
        e_tfs = np.array([r[2] for r in sel])
        single = encode_postings(
            e_ids, e_tfs, e_ids % 53 + 21, pos_flat=np.concatenate([r[3] for r in sel])
        )
        blob = enc["pos_blob_buf"][
            enc["pos_blob_offsets"][i] : enc["pos_blob_offsets"][i + 1]
        ]
        assert blob == single["pos_blob"]
        assert np.array_equal(
            decode_position_stream(blob, e_tfs), np.concatenate([r[3] for r in sel])
        )


def test_merge_runs_positions_invariant():
    rows = sorted((r for r in _rand_postings(11, n_terms=1)), key=lambda r: r[1])
    full = encode_postings(
        np.array([r[1] for r in rows]),
        np.array([r[2] for r in rows]),
        np.array([r[1] for r in rows]) % 53 + 21,
        pos_flat=np.concatenate([r[3] for r in rows]),
    )
    for cut in (1, len(rows) // 3, len(rows) - 1):
        runs, pbs = [], []
        for part in (rows[:cut], rows[cut:]):
            e = encode_postings(
                np.array([r[1] for r in part]),
                np.array([r[2] for r in part]),
                np.array([r[1] for r in part]) % 53 + 21,
                pos_flat=np.concatenate([r[3] for r in part]),
            )
            runs.append((e["doc_blob"], e["tf_blob"], e["dl_blob"], e["n"]))
            pbs.append(e["pos_blob"])
        m = merge_encoded_runs(runs, pos_blobs=pbs)
        assert m["pos_blob"] == full["pos_blob"]
        assert m["doc_blob"] == full["doc_blob"]


# ------------------------------------------------------- end-to-end


@pytest.fixture(scope="module")
def pos_built(tmp_path_factory):
    pages = pages_parquet(N_DOCS)
    out = str(tmp_path_factory.mktemp("posidx"))
    shutil.rmtree(out, ignore_errors=True)
    build_index(
        pages, out, num_partitions=3, hot_df_threshold=50, num_salts=4,
        store_positions=True,
    )
    import pyarrow.parquet as pq

    idx = SearchIndex.load(out)
    oracle = OracleIndex(pq.read_table(pages))
    return pages, idx, oracle


def test_positional_index_loads(pos_built):
    _pages, idx, oracle = pos_built
    assert idx.has_positions
    assert idx.meta["index_format"] == 3
    assert idx.N == oracle.N


def test_positions_reconstruct_token_stream(pos_built):
    """Every posting's decoded positions must be exactly the token
    indices where the term occurs in the oracle's token stream."""
    _pages, idx, oracle = pos_built
    for term in list(idx.terms)[:200]:
        p = idx.postings(term)
        for j, d in enumerate(p.ids[: min(5, p.ids.size)]):
            toks = oracle.doc_tokens[int(d)]
            want = [i for i, w in enumerate(toks) if w == term]
            assert p.positions_at(j).tolist() == want, (term, d)


def test_phrase_positions_equals_verify_and_oracle(pos_built):
    _pages, idx, oracle = pos_built
    hits = 0
    for _qid, q in phrase_queries():
        want = oracle.phrase_topk(q, 10)
        assert idx.phrase_topk(q, 10, method="positions") == want, q
        assert idx.phrase_topk(q, 10, method="verify") == want, q
        hits += bool(want)
    assert hits >= 3
    # overlap-heavy repeated-term phrases
    for q in ("the the", "the and the", "of of of"):
        assert idx.phrase_topk(q, 10, method="positions") == oracle.phrase_topk(q, 10), q


def test_positional_build_preserves_scoring(pos_built):
    _pages, idx, oracle = pos_built
    for _qid, q in reference_queries():
        assert idx.bm25_topk_exhaustive(q, 10) == oracle.bm25_topk(q, 10), q


def test_positions_parallelism_invariant(pos_built, tmp_path):
    """Different partitioning/salting -> byte-identical pos blobs (the
    N-vs-4N parity invariant extended to format 3)."""
    pages, idx, _oracle = pos_built
    out2 = str(tmp_path / "posidx2")
    build_index(
        pages, out2, num_partitions=1, hot_df_threshold=50, num_salts=2,
        store_positions=True,
    )
    idx2 = SearchIndex.load(out2)
    assert set(idx.terms) == set(idx2.terms)
    row1 = {t: i for t, i in idx._term_row.items()}
    for t, i2 in idx2._term_row.items():
        i1 = row1[t]
        assert (
            idx._shards["pos_blob"][i1].as_py() == idx2._shards["pos_blob"][i2].as_py()
        ), t
        assert (
            idx._shards["doc_blob"][i1].as_py() == idx2._shards["doc_blob"][i2].as_py()
        ), t


def test_update_index_preserves_positions(pos_built, tmp_path):
    """Incremental update of a positional base: merged shards keep
    pos_blob and overlapping terms' merged positions are bit-identical
    to a full positional rebuild."""
    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
        hash64,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.update_index import (
        update_index,
    )

    pages, full_idx, oracle = pos_built
    tbl = pq.read_table(pages)
    import pyarrow as pa

    # split a PRE-DEDUPED corpus: cross-generation duplicate TIES pick a
    # different winner in the update path than a full rebuild (documented
    # in update_index) — removing losers first makes the admitted doc
    # set identical on both paths, so blobs must be bit-identical
    canon = tbl.take(pa.array(oracle.canonical_rows))
    odd = [bool(hash64(u) & 1) for u in canon["url"].to_pylist()]
    even_p = str(tmp_path / "even.parquet")
    odd_p = str(tmp_path / "odd.parquet")
    pq.write_table(canon.filter(pa.array([not o for o in odd])), even_p, row_group_size=64)
    pq.write_table(canon.filter(pa.array(odd)), odd_p, row_group_size=64)
    base = str(tmp_path / "base")
    build_index(even_p, base, num_partitions=2, hot_df_threshold=50, num_salts=4,
                store_positions=True)
    out = update_index(odd_p, base, str(tmp_path / "updated"))
    upd = SearchIndex.load(str(out.out_dir))
    assert upd.has_positions and upd.N == full_idx.N
    # dup ties across generations can pick a different winner than the
    # full rebuild (documented in update_index); the fixture at this
    # scale has no cross-half duplicate, so blobs must match exactly
    for t, i in upd._term_row.items():
        j = full_idx._term_row[t]
        assert upd._shards["pos_blob"][i].as_py() == full_idx._shards["pos_blob"][j].as_py(), t
        assert upd._shards["doc_blob"][i].as_py() == full_idx._shards["doc_blob"][j].as_py(), t


def test_snippet_window_matches_bruteforce(pos_built):
    """Positional snippet selection == brute-force window scan over the
    oracle's token streams (same boolean top-1 doc, same tie rule)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )

    _pages, idx, oracle = pos_built
    W = 12
    n_some = 0
    for _qid, q in reference_queries():
        got = idx.snippet_window(q, width=W)
        top = oracle.boolean_and_topk(q, 1)
        if not top:
            assert got is None, q
            continue
        n_some += 1
        doc = top[0][0]
        toks = oracle.doc_tokens[doc]
        q_terms = tokenize_query(q)
        starts = sorted({i for i, w in enumerate(toks) if w in q_terms})
        best = max(
            ((s, len({w for w in toks[s : s + W] if w in q_terms})) for s in starts),
            key=lambda t: (t[1], -t[0]),
        )
        assert got == (doc, best[0], best[1]), q
    assert n_some >= 10


def test_proximity_topk_matches_bruteforce(pos_built):
    """Positional min-cover spans == brute-force window scan."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )

    _pages, idx, oracle = pos_built
    n_some = 0
    for _qid, q in reference_queries():
        got = idx.proximity_topk(q, 10)
        q_terms = tokenize_query(q)
        want = []
        for d, _tf in oracle.boolean_and_topk(q, 10**9):
            toks = oracle.doc_tokens[d]
            best = None
            need = set(q_terms)
            for i, w in enumerate(toks):
                if w not in need:
                    continue
                seen = set()
                for j in range(i, len(toks)):
                    if toks[j] in need:
                        seen.add(toks[j])
                        if seen == need:
                            span = j - i + 1
                            best = span if best is None else min(best, span)
                            break
            if best is not None:
                want.append((d, best))
        want.sort(key=lambda t: (t[1], t[0]))
        assert got == want[:10], q
        n_some += bool(got)
    assert n_some >= 10
