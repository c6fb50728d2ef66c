"""Search-engine scoring expressed directly over a generic documents
table (``doc_id:int64, text:string``) as pure Ray Data pipelines.

These are the SQL-parity twins of the shard-based engine in
``pipelines/query.py``: same canonical tokenizer, same BM25 /
reference-tf-idf formulas (``search/Searcher.java:108-198`` semantics
for tf-idf), but computed end-to-end as Dataset transforms so the
driver's DuckDB oracle can verify every value. The shard engine is the
serving path; these are the batch-scoring path (e.g. offline relevance
labeling over a whole corpus).

Float parity discipline: every arithmetic expression here is written in
the exact same association as its SQL twin in ``__ray_entry__``
(single divisions, left-assoc products), and final scores are rounded
to 6 decimals AFTER aggregation on both sides.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow.compute as pc
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..functions.tokenize import tokenize, tokenize_query

K1 = 1.2
B = 0.75


def explode_doc_terms(ds: rd.Dataset, *, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """documents -> one (doc_id, term, tf, dl) row per distinct term per
    doc. ``dl`` (doc token count) rides along so scoring never needs a
    second pass or a dl join."""

    def explode(batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids, terms, tfs, dls = [], [], [], []
        for did, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            counts = Counter(tokenize(text))
            dl = sum(counts.values())
            for t, c in counts.items():
                ids.append(did)
                terms.append(t)
                tfs.append(c)
                dls.append(dl)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "term": pa.array(terms, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "dl": pa.array(dls, pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def doc_term_stats(ds: rd.Dataset, **kw) -> rd.Dataset:
    """term -> (df, cf), via per-batch partial aggregation so the
    shuffle moves vocabulary-sized partials, not raw postings."""
    exploded = explode_doc_terms(ds, **kw)

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by("term").aggregate([("tf", "sum"), ("doc_id", "count")])
        return pa.table(
            {
                "term": agg["term"],
                "pdf": agg["doc_id_count"].cast(pa.int64()),
                "pcf": agg["tf_sum"],
            }
        )

    return (
        exploded.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("pdf", alias_name="df"), Sum("pcf", alias_name="cf"))
    )


def _corpus_stats(ds: rd.Dataset, exploded: rd.Dataset) -> tuple[int, float]:
    """(N, avgdl): N = ALL docs (zero-token docs included),
    avgdl = total tokens / N — matches the SQL twin exactly."""
    n_docs = ds.count()
    total_tokens = exploded.sum("tf") or 0
    return n_docs, float(total_tokens) / float(n_docs)


def _filter_terms(exploded: rd.Dataset, q_terms: list[str]) -> rd.Dataset:
    vs = sorted(set(q_terms))

    def mask(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch["term"], value_set=pa.array(vs, pa.string())))

    return exploded.map_batches(mask, batch_format="pyarrow")


def _query_dfs(exploded: rd.Dataset, q_terms: list[str]) -> dict[str, int]:
    small = _filter_terms(exploded, q_terms).groupby("term").aggregate(Count(alias_name="df"))
    return {r["term"]: r["df"] for r in small.take_all()}


def doc_bm25_topk(
    ds: rd.Dataset, query: str, *, k: int = 20, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """BM25 top-k over the documents table, fully distributed:
    filter postings to query terms -> per-row partial score ->
    groupby(doc_id).sum -> round(6) -> top-k (score desc, doc_id asc).
    Output: doc_id, score."""
    q_terms = tokenize_query(query)
    if not q_terms:
        return pa.table({"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())})
    exploded = explode_doc_terms(ds, text_col=text_col, id_col=id_col)
    n_docs, avgdl = _corpus_stats(ds, exploded)
    dfs = _query_dfs(exploded, q_terms)
    idf = {t: math.log(1.0 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5)) for t in dfs}
    idf_ref = ray.put(idf)

    def score_rows(batch: pa.Table) -> pa.Table:
        idfs: dict[str, float] = ray.get(idf_ref)
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.array([idfs[t] for t in batch["term"].to_pylist()], dtype=np.float64)
        part = tf * (K1 + 1) / (tf + K1 * ((1 - B) + B * dl / avgdl))
        return pa.table({"doc_id": batch["doc_id"], "partial": pa.array(w * part)})

    scored = (
        _filter_terms(exploded, q_terms)
        .map_batches(score_rows, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("partial", alias_name="score_raw"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        # fixed-point micros: np.rint(x*1e6) as int64 — cross-engine
        # float-rounding (1-ulp round() divergence) cannot bite integers
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "score_e6": pa.array(
                    np.rint(batch["score_raw"].to_numpy(zero_copy_only=False) * 1e6).astype(
                        np.int64
                    )
                ),
            }
        )

    out = scored.map_batches(finish, batch_format="pyarrow").sort(
        ["score_e6", "doc_id"], descending=[True, False]
    )
    return pa.Table.from_pandas(out.limit(k).to_pandas(), preserve_index=False)


def doc_tfidf_topk(
    ds: rd.Dataset,
    query: str,
    *,
    k: int = 300,
    threshold: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """The reference's shipped scorer over a documents table:
    score = sum over matched query terms of log10(N/df)*(1+log10(tf)),
    keep score > threshold, top-k (``Searcher.java:108-198``).
    Output: doc_id, score."""
    q_terms = tokenize_query(query)
    if not q_terms:
        return pa.table({"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())})
    exploded = explode_doc_terms(ds, text_col=text_col, id_col=id_col)
    n_docs = ds.count()
    dfs = _query_dfs(exploded, q_terms)
    idf = {t: math.log10(n_docs / dfs[t]) for t in dfs}
    idf_ref = ray.put(idf)

    def score_rows(batch: pa.Table) -> pa.Table:
        idfs: dict[str, float] = ray.get(idf_ref)
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.array([idfs[t] for t in batch["term"].to_pylist()], dtype=np.float64)
        return pa.table({"doc_id": batch["doc_id"], "partial": pa.array(w * (1 + np.log10(tf)))})

    scored = (
        _filter_terms(exploded, q_terms)
        .map_batches(score_rows, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("partial", alias_name="score_raw"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        raw = batch["score_raw"].to_numpy(zero_copy_only=False)
        keep = raw > threshold
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(pa.array(keep)),
                "score_e6": pa.array(np.rint(raw[keep] * 1e6).astype(np.int64)),
            }
        )

    out = scored.map_batches(finish, batch_format="pyarrow").sort(
        ["score_e6", "doc_id"], descending=[True, False]
    )
    return pa.Table.from_pandas(out.limit(k).to_pandas(), preserve_index=False)


def hybrid_rerank(
    docs: rd.Dataset,
    embeddings: rd.Dataset,
    query: str,
    query_vec_id: int,
    *,
    n_candidates: int = 50,
    k: int = 10,
) -> pa.Table:
    """Two-stage hybrid retrieval cascade (the standard lexical->vector
    serving plan: a cheap sparse scorer nominates, a dense similarity
    re-orders): BM25 top-``n_candidates`` over the documents table,
    then the candidate set ONLY is re-ranked by cosine similarity
    between each candidate's embedding and the query vector (the
    embedding row at ``query_vec_id``), keeping the top ``k``.

    Distribution: stage 1 is ``doc_bm25_topk`` (distributed partial
    scores -> groupby sum -> bounded top-N). Stage 2 broadcasts the
    N candidate ids + the one query vector and streams the embeddings
    table through ONE vectorized filter+matmul ``map_batches`` — the
    corpus-sized side never leaves its blocks; only candidate rows
    (<= N per batch) come back. Cosines are e6-quantized int64 so the
    rerank order is float-parity-proof against the SQL twin.

    Output: (doc_id, bm25_e6, cosine_e6), top-k by (cosine_e6 desc,
    doc_id asc).
    """
    cands = doc_bm25_topk(docs, query, k=n_candidates)
    if cands.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "bm25_e6": pa.array([], pa.int64()),
                "cosine_e6": pa.array([], pa.int64()),
            }
        )
    qvec_tbl = embeddings.filter(expr=f"vec_id == {query_vec_id}").take_all()
    q = np.asarray(qvec_tbl[0]["embedding"], dtype=np.float64)
    q = q / np.linalg.norm(q)
    cand_ids = cands["doc_id"].to_numpy(zero_copy_only=False)
    bm25_by_id = dict(
        zip(cand_ids.tolist(), cands["score_e6"].to_numpy(zero_copy_only=False).tolist())
    )
    state = ray.put((np.sort(cand_ids), q))

    def cosines(batch: pa.Table) -> pa.Table:
        ids_sorted, qv = ray.get(state)
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ids_sorted, vid)
        np.clip(pos, 0, ids_sorted.size - 1, out=pos)
        keep = ids_sorted[pos] == vid
        if not keep.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "cosine_e6": pa.array([], pa.int64())}
            )
        sub = batch.filter(pa.array(keep))
        m = np.stack(
            [np.asarray(v, dtype=np.float64) for v in sub["embedding"].to_pylist()]
        )
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        cos = m @ qv
        return pa.table(
            {
                "doc_id": sub["vec_id"].cast(pa.int64()),
                "cosine_e6": pa.array(np.rint(cos * 1e6).astype(np.int64)),
            }
        )

    # candidate-bounded result (<= n_candidates rows): collect is fine
    got = pa.Table.from_pandas(
        embeddings.map_batches(cosines, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    ).cast(pa.schema([("doc_id", pa.int64()), ("cosine_e6", pa.int64())]))
    order = pc.sort_indices(
        got, sort_keys=[("cosine_e6", "descending"), ("doc_id", "ascending")]
    )[:k]
    got = got.take(order)
    return pa.table(
        {
            "doc_id": got["doc_id"],
            "bm25_e6": pa.array(
                [bm25_by_id[i] for i in got["doc_id"].to_pylist()], pa.int64()
            ),
            "cosine_e6": got["cosine_e6"],
        }
    )
