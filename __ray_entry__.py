"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship index-build + BM25 pipeline at sf0.001.
``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md §2 + the training-data extensions); ``oracle_sql()`` gives
the DuckDB twin for every SQL-expressible one. Ray is initialised by
the driver BEFORE this module is imported — nothing here calls
``ray.init``/``ray.shutdown``.

Float parity discipline (driver value-hash): every aggregate /
similarity score is rounded AFTER aggregation, with the Ray expression
written in the same association as the SQL; integer counts are exact.
"""

from __future__ import annotations

import math
import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# canonical tokenizer as a DuckDB expression — MUST match
# work_sample_..._ray.functions.tokenize.tokenize exactly:
# strip tags, ASCII punct -> space, lower, \s+ split, drop empties
TOKS = (
    "list_filter(string_split_regex(lower(regexp_replace(regexp_replace(text,"
    " '<[^>]*>', '', 'g'), '[!-/:-@\\[-`{-~]', ' ', 'g')), '\\s+'), x -> x <> '')"
)

EN_SQL = (
    "['the','and','of','to','a','in','is','it','you','that','was','for','on','are',"
    "'with','as','his','they','be','at','one','have','this','from','or','had','by',"
    "'but','not','what','all','were','when','your','can','said']"
)
DE_SQL = "['der','die','das','und','ist','nicht','ein','eine','zu','mit','auf','von','den','im','wird']"
FR_SQL = "['le','la','les','et','est','pas','un','une','dans','pour','que','qui','sur','avec','par']"

BM25_QUERY = "join hash batch scan"
TFIDF_QUERY = "vector merge stream"
KNN_QUERIES = 8
KNN_K = 10
NEAR_DUP_THR = 0.4
# embedding_near_dups cutover: exact all-pairs at/below this row count,
# banded hyperplane LSH + per-bucket exact verify above it. 256 puts the
# driver's sf0.01 corpus (500 vectors) on the LSH side, so the SCALE
# path is the one the oracle hash-verifies; production default in
# stages/ann.py is 100k.
NEAR_DUP_EXACT_MAX = 256
MEDIA_N = 200
NEAR_DUP_BANDS = 8
JACCARD_THR = 0.2
CLUSTER_ROUNDS = 10  # min-label propagation rounds (engine == unrolled SQL)
LP_ROUNDS = 5  # label-propagation community rounds (engine == unrolled SQL)
CLOSENESS_H = 6  # harmonic-closeness BFS horizon (engine == SQL depth cap)
CLOSENESS_SEEDS = 4  # top-out-degree hubs scored by crawl_closeness
BOWTIE_H = 8  # bow-tie reachability horizon (engine == SQL depth cap)
KCORE_K = 12  # k-core peel threshold: non-trivial core at the gate (733/10k nodes)
SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
PAGERANK_D = 0.85
PAGERANK_ITERS = 10
HITS_ITERS = 5


_CANON80_RE = __import__("re").compile(r"^http://([^/]*)")


def _canon80(u: str) -> str:
    """Canonical url form for graph joins: explicit :80 default port,
    matching what the link normalizer emits for dst urls. ONE rule —
    the PageRank/BFS node-edge matching silently breaks if the src and
    dst conventions ever diverge. Pattern compiled once at module load
    (round-3 verdict minor #4)."""
    return _CANON80_RE.sub(r"http://\1:80", u)


def _canon80_src(t: pa.Table) -> pa.Table:
    """Batch form of ``_canon80`` over an edge table's src column."""
    return pa.table(
        {
            "src_url": pc.replace_substring_regex(
                t["src_url"], r"^http://([^/]*)", r"http://\1:80"
            ),
            "dst_url": t["dst_url"],
        }
    )


def _undirected_edge_ids(t: pa.Table) -> pa.Table:
    """(src_url, dst_url) batch -> undirected (doc_a < doc_b) int64
    edge ids: C-speed md5 hash per url via hash64_array, vectorized
    min/max orientation, self-loops dropped. Shared by the
    components / triangles / k-core edge replays."""
    import numpy as np

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
        hash64_array,
    )

    ha = hash64_array(t["src_url"].to_pylist())
    hb = hash64_array(t["dst_url"].to_pylist())
    keep = ha != hb
    ha, hb = ha[keep], hb[keep]
    return pa.table(
        {
            "doc_a": pa.array(np.minimum(ha, hb)),
            "doc_b": pa.array(np.maximum(ha, hb)),
        }
    )


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _tbl(sf_dir: str, name: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


# --------------------------------------------------------------------------
# flagship: index build + search over the synthetic pages corpus
# --------------------------------------------------------------------------


def _cached_index_dir(sf_dir: str) -> str:
    """Build (once per corpus size) the full inverted index over the
    synthetic Common-Crawl-style pages corpus matching this sf; returns
    the index dir. Cached on disk: the search queries and entry() share
    one build."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
        build_index,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    import json
    import shutil

    pages = pages_for_sf_dir(sf_dir)
    out_dir = f"/tmp/wse_entry_index_{os.path.basename(pages).replace('.parquet', '')}"
    meta_path = os.path.join(out_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f).get("index_format") != 2:  # stale on-disk format
                shutil.rmtree(out_dir, ignore_errors=True)
    if not os.path.exists(meta_path):
        build_index(pages, out_dir, num_partitions=8, batch_size=128)
    return out_dir


def _cached_index(sf_dir: str):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
        SearchIndex,
    )

    return SearchIndex.load(_cached_index_dir(sf_dir))


# autocomplete prefixes: stopword stems, each language's generated-word
# initial (en/de/fr vocab words start with 'e'/'d'/'f'), and a zero-hit
TERM_COMPLETE_PREFIXES = ("th", "e", "eka", "de", "fr", "zzz")

# wildcard retrieval prefixes: a hot stem, a rarer stem, and a no-match
WILDCARD_PREFIXES = ("eka", "epirv", "zzz")


def _cached_pos_index(sf_dir: str):
    """Positional (format 3) index over the same corpus, cached
    separately from the flagship format-2 build — the scale path for
    exact-phrase evaluation (no doc fetch)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
        build_index,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
        SearchIndex,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages = pages_for_sf_dir(sf_dir)
    out_dir = f"/tmp/wse_entry_posindex_{os.path.basename(pages).replace('.parquet', '')}"
    if not os.path.exists(os.path.join(out_dir, "meta.json")):
        build_index(pages, out_dir, num_partitions=8, batch_size=128, store_positions=True)
    return SearchIndex.load(out_dir)


def _cached_scatter_dirs(sf_dir: str, n_ranges: int = 2) -> list[str]:
    """Doc-range-sharded index fixture (cached per corpus size): ONE
    global exact-dedup pass over the pages corpus (the flagship winner
    rule — keep first (warc_ts, url) per identical html, the
    reference's contentSeen SHA-1 semantics), split the winners by
    doc_id range, and build one full index per range. Pre-deduping
    globally is what makes per-range builds sum to the monolithic
    index (each range build's internal dedup is then a no-op), so
    scatter-gather scoring with global stats is bit-identical."""
    import shutil

    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
        hash64_array,
        sha1_hex,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
        build_index,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        bucket_mix,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.shuffle import (
        hash_map_groups,
    )

    pages = pages_for_sf_dir(sf_dir)
    root = "/tmp/wse_scatter_" + os.path.basename(pages).replace(".parquet", "")
    dirs = [os.path.join(root, f"idx_r{r}") for r in range(n_ranges)]
    if all(os.path.exists(os.path.join(d, "meta.json")) for d in dirs):
        return dirs
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    range_width = ((1 << 63) + n_ranges - 1) // n_ranges

    def add_keys(t: pa.Table) -> pa.Table:
        sha = pa.array([sha1_hex(h) for h in t["html"].to_pylist()], pa.string())
        sha_h = hash64_array(s for s in sha.to_pylist())
        doc = hash64_array(u for u in t["url"].to_pylist())
        return (
            t.append_column("__sha", sha)
            .append_column("__bucket", pa.array(bucket_mix(sha_h, 64)))
            .append_column("__range", pa.array((doc // range_width).astype(np.int64)))
        )

    def winners(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g,
            sort_keys=[
                ("__sha", "ascending"),
                ("warc_ts", "ascending"),
                ("url", "ascending"),
            ],
        )
        s = g.take(idx)
        codes = (
            s["__sha"].combine_chunks().dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
        )
        first = np.ones(len(codes), bool)
        first[1:] = codes[1:] != codes[:-1]
        return s.filter(pa.array(first)).drop_columns(["__sha", "__bucket"])

    ds = rd.read_parquet(pages)
    win = hash_map_groups(
        ds.map_batches(add_keys, batch_format="pyarrow"), "__bucket", winners
    )
    win_dir = os.path.join(root, "winners")
    win.write_parquet(win_dir, partition_cols=["__range"])
    for r, d in enumerate(dirs):
        build_index(os.path.join(win_dir, f"__range={r}"), d, num_partitions=4)
    return dirs


# NDCG@10 integer DCG weights: w_r = round(1e6 / log2(r+2)). Computed
# ONCE here and embedded as literals in the SQL twin, so both sides do
# exact-integer DCG arithmetic (no float-sum association hazards).
_NDCG_W = [round(1_000_000 / math.log2(r + 2)) for r in range(10)]


def _search_table(sf_dir: str, scorer: str, method: str = "auto") -> pa.Table:
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        reference_queries,
    )

    idx = _cached_index(sf_dir)
    qids, ranks, doc_ids, scores = [], [], [], []
    for qid, q in reference_queries():
        # Rank + cut on INTEGER e6 scores, not raw doubles: the engine's
        # sums are deterministic (np.add.at) but the oracle's (DuckDB
        # parallel SUM) are not associative-stable, so exact-float
        # ordering at the top-10 boundary is not reproducible across
        # engines. Both sides therefore order by (score_e6 desc, doc_id)
        # — candidates fetched wide (50/300) so the e6-top-10 is inside
        # the float-ranked prefix.
        if scorer == "bm25":
            ranked = idx.bm25_topk(q, k=50, method=method)
        elif scorer == "lm":
            ranked = idx.lm_dirichlet_topk(q, k=50)
        else:
            ranked = idx.reference_topk(q, k=300)
        e6 = sorted(((int(round(s * 1_000_000)), d) for d, s in ranked), key=lambda t: (-t[0], t[1]))[:10]
        for r, (s6, d) in enumerate(e6):
            qids.append(qid)
            ranks.append(r)
            doc_ids.append(d)
            scores.append(s6)
    return pa.table(
        {
            "qid": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "score_e6": pa.array(scores, pa.int64()),
        }
    )


def _cached_updated_index(sf_dir: str) -> str:
    """Incremental-update fixture (cached per corpus size): split the
    synthetic pages corpus by doc_id parity (doc_id = hash64(url), a
    pure function of the row — SQL-replayable), build the BASE index
    over the even half, then ``update_index`` the odd half into it.
    First-indexed-wins across generations maps to the oracle's
    ``ORDER BY (doc_id % 2), warc_ts, url`` dedup winner rule."""
    import json
    import shutil

    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
        hash64,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
        build_index,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.update_index import (
        update_index,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages = pages_for_sf_dir(sf_dir)
    root = "/tmp/wse_update_" + os.path.basename(pages).replace(".parquet", "")
    out = os.path.join(root, "updated")
    if not os.path.exists(os.path.join(out, "meta.json")):
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root)
        tbl = pq.read_table(pages)
        odd = pa.array([bool(hash64(u) & 1) for u in tbl["url"].to_pylist()])
        even_p = os.path.join(root, "even.parquet")
        odd_p = os.path.join(root, "odd.parquet")
        pq.write_table(tbl.filter(pc.invert(odd)), even_p, row_group_size=2048)
        pq.write_table(tbl.filter(odd), odd_p, row_group_size=2048)
        build_index(even_p, os.path.join(root, "base"), num_partitions=4)
        update_index(odd_p, os.path.join(root, "base"), out)
    return out


def _cached_segmented_index(sf_dir: str) -> str:
    """Segment-based incremental-update fixture (cached per corpus
    size): the SAME parity split as ``_cached_updated_index`` — base
    index over the even doc_id half, then the odd half lands as a NEW
    immutable segment (``pipelines.segments.add_segment``: O(delta)
    I/O, bloom+exact contentSeen gate) instead of the in-place shard
    merge. First-indexed-wins across generations, so the oracle winner
    rule is the same ``ORDER BY (doc_id % 2), warc_ts, url``."""
    import json
    import shutil

    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
        hash64,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
        build_index,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.segments import (
        add_segment,
        create_segmented,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages = pages_for_sf_dir(sf_dir)
    root = "/tmp/wse_segidx_" + os.path.basename(pages).replace(".parquet", "")
    out = os.path.join(root, "segmented")
    if not os.path.exists(os.path.join(out, "segments.json")):
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root)
        tbl = pq.read_table(pages)
        odd = pa.array([bool(hash64(u) & 1) for u in tbl["url"].to_pylist()])
        even_p = os.path.join(root, "even.parquet")
        odd_p = os.path.join(root, "odd.parquet")
        pq.write_table(tbl.filter(pc.invert(odd)), even_p, row_group_size=2048)
        pq.write_table(tbl.filter(odd), odd_p, row_group_size=2048)
        build_index(even_p, os.path.join(root, "base"), num_partitions=4)
        create_segmented(os.path.join(root, "base"), out)
        add_segment(out, odd_p, num_partitions=4)
    return out


# winner rule of the parity-split update fixtures, inline (pages has no
# doc_id column): even doc_id half was indexed first, so it wins dup ties
_PARITY_WINNER_ORDER = (
    "(CAST(('0x' || substr(md5(url), 1, 16))::UBIGINT"
    " & 9223372036854775807::UBIGINT AS BIGINT) % 2), warc_ts, url"
)


def _cached_deleted_index(sf_dir: str) -> str:
    """Deletion fixture (cached per corpus size): build the base index
    over the whole pages corpus, then ``delete_from_index`` every doc
    whose doc_id satisfies ``doc_id % 8 == 3`` (doc_id = hash64(url), a
    pure row function — the oracle drops the same winners in SQL)."""
    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
        build_index,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.delete_index import (
        delete_from_index,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages = pages_for_sf_dir(sf_dir)
    root = "/tmp/wse_delete_" + os.path.basename(pages).replace(".parquet", "")
    out = os.path.join(root, "deleted")
    if not os.path.exists(os.path.join(out, "meta.json")):
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root)
        base = os.path.join(root, "base")
        build_index(pages, base, num_partitions=4)
        store = pq.read_table(
            os.path.join(base, "docstore"), columns=["doc_id", "url"]
        )
        del_urls = [
            u
            for d, u in zip(store["doc_id"].to_pylist(), store["url"].to_pylist())
            if d % 8 == 3
        ]
        delete_from_index(base, del_urls, out)
    return out


def entry() -> Any:
    """Flagship pipeline at sf0.001: full Ray Data index build (extract
    actor pool -> checkpointed docs -> dedup -> exact stats -> salted
    term shuffle -> compressed shards) + Block-Max WAND BM25 over the
    reference query set."""
    return _search_table("/root/testdata/sf0.001", "bm25")


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def queries() -> dict[str, Callable[[str], Any]]:
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.doc_search import (
        doc_bm25_topk,
        doc_term_stats,
        doc_tfidf_topk,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
        embedding_near_dup_pairs_auto,
        ivf_knn,
        knn_brute_force,
        lsh_knn,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
        benchmark_shingle_set,
        contamination_counts,
        exact_dedup_summary,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        MediaFeatureStage,
        synth_media,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        LinkExtractStage,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        broadcast_join,
        cogroup_counts,
        distinct_on,
        intersection,
        kmv_distinct,
        running_totals,
        sample_with_replacement,
        shuffle_join,
        skew_join,
        zip_with_index,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        TextStatsStage,
    )
    from ray.data.aggregate import Count, Max, Min, Sum

    # ---------------- search engine ----------------

    def q_search_bm25(sf_dir: str) -> pa.Table:
        return _search_table(sf_dir, "bm25")

    def q_search_tfidf(sf_dir: str) -> pa.Table:
        return _search_table(sf_dir, "reference")

    def q_search_tiered(sf_dir: str) -> pa.Table:
        """Two-tier champion-list retrieval (static index pruning):
        tier 1 = BM25 over the union of per-term top-32-by-tf champion
        postings when that union holds >= 50 docs; tier 2 = exhaustive
        fallback. Candidate scores are bit-identical to the flagship
        scorer, so the e6 re-rank convention carries over unchanged."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        qids, ranks, doc_ids, scores, tiers = [], [], [], [], []
        for qid, q in reference_queries():
            ranked, tier = idx.bm25_topk_tiered(q, k=50, champions=32)
            e6 = sorted(
                ((int(round(s * 1_000_000)), d) for d, s in ranked),
                key=lambda t: (-t[0], t[1]),
            )[:10]
            for r, (s6, d) in enumerate(e6):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                scores.append(s6)
                tiers.append(tier)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score_e6": pa.array(scores, pa.int64()),
                "tier": pa.array(tiers, pa.int64()),
            }
        )

    def q_search_mmr_div(sf_dir: str) -> pa.Table:
        """MMR-diversified BM25 top-10 (lambda = 0.5): greedy integer
        re-ranking of the e6 candidate prefix penalizing Jaccard
        similarity to already-selected results — the result-
        diversification feature (Carbonell & Goldstein 1998)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        qids, ranks, doc_ids, scores = [], [], [], []
        for qid, q in reference_queries():
            for d, s6, r in idx.bm25_topk_mmr(q, k=10, candidates=50):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                scores.append(s6)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "mmr_rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score_e6": pa.array(scores, pa.int64()),
            }
        )

    def q_search_ltr(sf_dir: str) -> pa.Table:
        """LTR feature-vector export for every reference query's e6
        top-10 (the ranker-training table): exact-integer BM25 score,
        doc length, matched-term count, summed tf, epoch-day recency."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        cols = {c: [] for c in
                ("qid", "rank", "doc_id", "score_e6", "dl", "n_terms", "sum_tf", "warc_day")}
        for qid, q in reference_queries():
            for row in idx.ltr_features(q, k=10, candidates=50):
                cols["qid"].append(qid)
                for c in ("rank", "doc_id", "score_e6", "dl", "n_terms", "sum_tf", "warc_day"):
                    cols[c].append(row[c])
        return pa.table({c: pa.array(v, pa.int64()) for c, v in cols.items()})

    def q_search_rrf(sf_dir: str) -> pa.Table:
        """Reciprocal-rank fusion (Cormack et al. 2009, k=60) of the
        BM25 and reference-tfidf top-10 rankings: rrf_e6 = sum over
        systems of 1e6 // (60 + rank) — exact integers, so fusion order
        is hash-exact. A doc in only one system fuses that term alone;
        the fused list re-ranks by (rrf_e6 desc, doc_id), top 10."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        qids, ranks, doc_ids, rrfs = [], [], [], []
        for qid, q in reference_queries():
            fused: dict[int, int] = {}
            for ranked in (
                idx.bm25_topk(q, k=50),
                idx.reference_topk(q, k=300),
            ):
                e6 = sorted(
                    ((int(round(s * 1_000_000)), d) for d, s in ranked),
                    key=lambda t: (-t[0], t[1]),
                )[:10]
                for r, (_s6, d) in enumerate(e6):
                    fused[d] = fused.get(d, 0) + 1_000_000 // (60 + r)
            top = sorted(fused.items(), key=lambda t: (-t[1], t[0]))[:10]
            for r, (d, v) in enumerate(top):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                rrfs.append(v)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "rrf_e6": pa.array(rrfs, pa.int64()),
            }
        )

    def q_search_mrr(sf_dir: str) -> pa.Table:
        """Reciprocal rank of the first FULLY-relevant result in the
        BM25 top-10 — relevant = contains ALL distinct query terms, so
        a query with any out-of-vocabulary term has no relevant doc
        (rr 0), mirroring the strict-AND contract. Exact-integer
        (1e6 // (rank+1)); queries with no indexed term emit no row."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
            tokenize_query,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        qids, frs, rrs = [], [], []
        for qid, q in reference_queries():
            all_terms = sorted(set(tokenize_query(q)))
            if not any(idx.has_term(t) for t in all_terms):
                continue
            rel: set[int] = set()
            if all(idx.has_term(t) for t in all_terms):
                rel = set(idx.postings(all_terms[0]).ids.tolist())
                for t in all_terms[1:]:
                    rel &= set(idx.postings(t).ids.tolist())
            ranked = idx.bm25_topk(q, k=50)
            e6 = sorted(
                ((int(round(s * 1_000_000)), d) for d, s in ranked),
                key=lambda t: (-t[0], t[1]),
            )[:10]
            fr = -1
            for r, (_s6, d) in enumerate(e6):
                if d in rel:
                    fr = r
                    break
            qids.append(qid)
            frs.append(fr)
            rrs.append(1_000_000 // (fr + 1) if fr >= 0 else 0)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "first_rnk": pa.array(frs, pa.int64()),
                "rr_e6": pa.array(rrs, pa.int64()),
            }
        )

    def q_search_ndcg(sf_dir: str) -> pa.Table:
        """Ranking-quality evaluation: NDCG@10 of the BM25 ranking
        against a deterministic graded-relevance oracle — rel(doc) =
        number of DISTINCT query terms whose postings contain the doc.
        All arithmetic is exact-integer (``_NDCG_W`` weights, integer
        division), so the SQL twin replays it bit-for-bit. A query with
        no indexed term contributes no row (both sides)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
            tokenize_query,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        qids, dcgs, idcgs, ndcgs = [], [], [], []
        for qid, q in reference_queries():
            terms = sorted({t for t in tokenize_query(q) if idx.has_term(t)})
            if not terms:
                continue
            rel: dict[int, int] = {}
            for t in terms:
                for d in idx.postings(t).ids.tolist():
                    rel[d] = rel.get(d, 0) + 1
            ranked = idx.bm25_topk(q, k=50)
            e6 = sorted(
                ((int(round(s * 1_000_000)), d) for d, s in ranked),
                key=lambda t: (-t[0], t[1]),
            )[:10]
            dcg = sum(rel.get(d, 0) * _NDCG_W[r] for r, (_s6, d) in enumerate(e6))
            ideal = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
            idcg = sum(rv * _NDCG_W[r] for r, (_d, rv) in enumerate(ideal))
            qids.append(qid)
            dcgs.append(dcg)
            idcgs.append(idcg)
            ndcgs.append(dcg * 1_000_000 // idcg if idcg else 0)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "dcg": pa.array(dcgs, pa.int64()),
                "idcg": pa.array(idcgs, pa.int64()),
                "ndcg_e6": pa.array(ndcgs, pa.int64()),
            }
        )

    def q_search_map(sf_dir: str) -> pa.Table:
        """Average precision @10 of the BM25 ranking against the MRR
        relevance oracle (relevant = contains ALL distinct query terms
        — any unindexed term empties the relevance set). EXACT
        integers: lcm(1..10) = 2520 as the common rank denominator, so
        the i-th relevant result at 0-based rank r contributes
        i * (2520 // (r+1)) and ap_e6 = 1e6*ap_num //
        (2520*min(n_rel,10)) — completing the NDCG/MRR/MAP eval triad
        (Manning, Raghavan & Schuetze 2008 ch. 8)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
            tokenize_query,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        qids, nrels, aps = [], [], []
        for qid, q in reference_queries():
            all_terms = sorted(set(tokenize_query(q)))
            if not any(idx.has_term(t) for t in all_terms):
                continue
            rel: set[int] = set()
            if all(idx.has_term(t) for t in all_terms):
                rel = set(idx.postings(all_terms[0]).ids.tolist())
                for t in all_terms[1:]:
                    rel &= set(idx.postings(t).ids.tolist())
            ranked = idx.bm25_topk(q, k=50)
            e6 = sorted(
                ((int(round(s * 1_000_000)), d) for d, s in ranked),
                key=lambda t: (-t[0], t[1]),
            )[:10]
            hits = ap_num = 0
            for r, (_s6, d) in enumerate(e6):
                if d in rel:
                    hits += 1
                    ap_num += hits * (2520 // (r + 1))
            n_rel = len(rel)
            qids.append(qid)
            nrels.append(n_rel)
            aps.append(
                (1_000_000 * ap_num) // (2520 * min(n_rel, 10)) if n_rel else 0
            )
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "n_rel": pa.array(nrels, pa.int64()),
                "ap_e6": pa.array(aps, pa.int64()),
            }
        )

    def q_index_export(sf_dir: str) -> pa.Table:
        """Export the built index to the reference's KVS ``index``
        acc-string format (term -> "doc:tf,doc:tf,..." —
        ``search/Searcher.java:78-101`` consumption contract): the
        interop path for feeding a reference Searcher from a Ray-built
        index, and a full codec round-trip vs the SQL re-derivation."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.export_index import (
            export_reference_index,
        )

        return export_reference_index(_cached_index_dir(sf_dir))

    def q_index_import(sf_dir: str) -> pa.Table:
        """Round-trip interop: export the built index to the reference
        acc-string format, then parse it BACK with the vectorized
        import kernel (split/flatten/segment-sum — the migration path
        for an existing KVS index dump). The oracle re-derives
        df/cf/max_tf from the canonical tokenization, so the round
        trip is checked end to end through both string codecs."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.export_index import (
            export_reference_index,
            import_reference_index,
        )

        return import_reference_index(
            export_reference_index(_cached_index_dir(sf_dir))
        )

    def q_wildcard(sf_dir: str) -> pa.Table:
        """Prefix/wildcard retrieval ("eka*"): expand each query prefix
        to its top-8 vocabulary terms (cf desc, term — the autocomplete
        rule), then score the expansion as a weight-1.0 BM25 OR via
        the PRF machinery (``bm25_weighted_topk``) — the wildcard-query
        feature the reference's exact-term Searcher cannot answer.
        Expansion is bounded (8 terms/prefix) so query cost stays
        independent of vocabulary size."""
        import ray
        import ray.data as rd

        out_dir = _cached_index_dir(sf_dir)
        idx = _cached_index(sf_dir)
        vt = pa.concat_tables(
            ray.get(
                rd.read_parquet(
                    os.path.join(out_dir, "term_stats"), columns=["term", "cf"]
                ).to_arrow_refs()
            )
        ).combine_chunks()
        terms = np.array(vt["term"].to_pylist(), dtype=object)
        cf = vt["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
        qids, pres, ranks, doc_ids, scores = [], [], [], [], []
        for qid, prefix in enumerate(WILDCARD_PREFIXES):
            m = np.array([t.startswith(prefix) for t in terms], dtype=bool)
            order = np.lexsort((terms[m], -cf[m]))[:8]
            expanded = [(t, 1.0) for t in terms[m][order]]
            top = sorted(
                (
                    (int(round(s * 1_000_000)), d)
                    for d, s in idx.bm25_weighted_topk(expanded, k=50)
                ),
                key=lambda t: (-t[0], t[1]),
            )[:10]
            for r, (s6, d) in enumerate(top):
                qids.append(qid)
                pres.append(prefix)
                ranks.append(r)
                doc_ids.append(d)
                scores.append(s6)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "prefix": pa.array(pres, pa.string()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score_e6": pa.array(scores, pa.int64()),
            }
        )

    def q_search_stemmed(sf_dir: str) -> pa.Table:
        """Stemmed retrieval WITHOUT rebuilding the index: each query
        term expands to the vocabulary terms sharing its Porter stem
        (top-8 by cf desc, term — bounded like wildcard), scored as a
        weight-1.0 BM25 OR via the PRF machinery. The oracle embeds the
        (term, stem) map for the index vocabulary AND the per-query-term
        stems (both from the same pure function) and replays expansion +
        scoring in SQL."""
        import ray
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.stem import (
            porter_stem,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
            tokenize_query,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        out_dir = _cached_index_dir(sf_dir)
        idx = _cached_index(sf_dir)
        vt = pa.concat_tables(
            ray.get(
                rd.read_parquet(
                    os.path.join(out_dir, "term_stats"), columns=["term", "cf"]
                ).to_arrow_refs()
            )
        ).combine_chunks()
        terms = vt["term"].to_pylist()
        cf = vt["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
        stem_to_terms: dict[str, list[tuple[int, str]]] = {}
        for t, c in zip(terms, cf):
            stem_to_terms.setdefault(porter_stem(t), []).append((-int(c), t))
        for v in stem_to_terms.values():
            v.sort()
        qids, ranks, doc_ids, scores = [], [], [], []
        for qid, q in reference_queries():
            expanded: dict[str, float] = {}
            for t in sorted(set(tokenize_query(q))):
                for _negcf, vterm in stem_to_terms.get(porter_stem(t), [])[:8]:
                    expanded[vterm] = 1.0
            if not expanded:
                continue
            top = sorted(
                (
                    (int(round(s * 1_000_000)), d)
                    for d, s in idx.bm25_weighted_topk(
                        sorted(expanded.items()), k=50
                    )
                ),
                key=lambda t: (-t[0], t[1]),
            )[:10]
            for r, (s6, d) in enumerate(top):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                scores.append(s6)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score_e6": pa.array(scores, pa.int64()),
            }
        )

    def q_index_compact(sf_dir: str):
        """Compact the built index (one term-sorted file per shard,
        blobs byte-identical) and read the full per-term df/cf back
        from the COMPACTED shards — the segment-merge maintenance step
        the reference's never-merging KVS index lacks."""
        import shutil as _sh
        import tempfile

        from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.compact_index import (
            compact_index,
        )

        import ray.data as rd

        base = _cached_index_dir(sf_dir)
        out = os.path.join(tempfile.gettempdir(), "wse_compacted_" + str(abs(hash(base)) % 10**8))
        _sh.rmtree(out, ignore_errors=True)
        compact_index(base, out)
        return rd.read_parquet(
            os.path.join(out, "shards"), columns=["term", "df", "cf"]
        )

    def q_didyoumean(sf_dir: str) -> pa.Table:
        """End-to-end did-you-mean retrieval: deterministic
        misspellings (drop the 2nd char of the top-5 cf terms of
        length >= 5 in the INDEX vocabulary), correct each against the
        full vocabulary by minimum edit distance (ties by term), then
        BM25 top-10 on the corrected query — text_spell_correct's
        correction rule composed with the flagship scorer, the "did
        you mean / search instead for" flow the reference's Searcher
        lacks. The vocabulary is the distributed part (the build's
        term_stats table, read pruned); the DP is one vectorized
        all-terms pass per query over the bounded vocab."""
        import ray
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            _levenshtein_to_all,
        )

        out_dir = _cached_index_dir(sf_dir)
        idx = _cached_index(sf_dir)
        vt = pa.concat_tables(
            ray.get(
                rd.read_parquet(
                    os.path.join(out_dir, "term_stats"), columns=["term", "cf"]
                ).to_arrow_refs()
            )
        ).combine_chunks()
        terms = np.array(vt["term"].to_pylist(), dtype=object)
        cf = vt["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.array([len(t) for t in terms], dtype=np.int64)
        elig = lens >= 5
        order = np.lexsort((terms[elig], -cf[elig]))[:5]
        misspelled = [t[0] + t[2:] for t in terms[elig][order]]

        L = int(lens.max()) if lens.size else 0
        mat = np.zeros((len(terms), L), dtype=np.uint32)
        for i, t in enumerate(terms):
            mat[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), np.uint32)

        qids, qs, cors, ranks, doc_ids, scores = [], [], [], [], [], []
        for qid, q in enumerate(misspelled):
            dist = _levenshtein_to_all(q, mat, lens)
            corrected = terms[np.lexsort((terms, dist))[0]]
            # k=50 then slice: e6 quantization can reorder float-score
            # ties at the cut — same guard as the PRF query
            top = sorted(
                ((int(round(s * 1_000_000)), d) for d, s in idx.bm25_topk(corrected, k=50)),
                key=lambda t: (-t[0], t[1]),
            )[:10]
            for r, (s6, d) in enumerate(top):
                qids.append(qid)
                qs.append(q)
                cors.append(corrected)
                ranks.append(r)
                doc_ids.append(d)
                scores.append(s6)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "q": pa.array(qs, pa.string()),
                "corrected": pa.array(cors, pa.string()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score_e6": pa.array(scores, pa.int64()),
            }
        )

    def q_search_fuzzy(sf_dir: str) -> pa.Table:
        """Fuzzy retrieval (the Lucene FuzzyQuery contract, max edits
        1): every distinct query term expands to the <= 8 index-
        vocabulary terms within UNIT edit distance, ranked by (cf desc,
        term) — so typos still retrieve, and the cost stays bounded per
        term — then the deduped expansion scores as a weight-1.0 BM25
        OR via the PRF machinery (``bm25_weighted_topk``), top-10 e6.
        The vocabulary is the build's term_stats table (read pruned);
        the edit-distance DP is the vectorized all-terms lockstep pass
        of ``search_didyoumean``, one call per distinct query term."""
        import ray
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
            tokenize_query,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            _levenshtein_to_all,
        )

        out_dir = _cached_index_dir(sf_dir)
        idx = _cached_index(sf_dir)
        vt = pa.concat_tables(
            ray.get(
                rd.read_parquet(
                    os.path.join(out_dir, "term_stats"), columns=["term", "cf"]
                ).to_arrow_refs()
            )
        ).combine_chunks()
        terms = np.array(vt["term"].to_pylist(), dtype=object)
        cf = vt["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.array([len(t) for t in terms], dtype=np.int64)
        L = int(lens.max()) if lens.size else 0
        mat = np.zeros((len(terms), L), dtype=np.uint32)
        for i, t in enumerate(terms):
            mat[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), np.uint32)

        qids, ranks, doc_ids, scores = [], [], [], []
        for qid, q in reference_queries():
            expanded: dict[str, float] = {}
            for t in sorted(set(tokenize_query(q))):
                dist = _levenshtein_to_all(t, mat, lens)
                cand = np.flatnonzero(dist <= 1)
                if cand.size == 0:
                    continue
                order = np.lexsort((terms[cand], -cf[cand]))[:8]
                for vterm in terms[cand][order]:
                    expanded[str(vterm)] = 1.0
            if not expanded:
                continue
            top = sorted(
                (
                    (int(round(s * 1_000_000)), d)
                    for d, s in idx.bm25_weighted_topk(
                        sorted(expanded.items()), k=50
                    )
                ),
                key=lambda t: (-t[0], t[1]),
            )[:10]
            for r, (s6, d) in enumerate(top):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                scores.append(s6)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score_e6": pa.array(scores, pa.int64()),
            }
        )

    def q_search_collapsed(sf_dir: str) -> pa.Table:
        """Host-collapsed (site-collapse) BM25 top-10 per reference
        query: at most ONE result per URL host within the e6 top-50
        candidate prefix — result diversification the reference's raw
        ranked list lacks (pipelines/query.py:bm25_topk_collapsed)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        qids, ranks, doc_ids, scores, hosts = [], [], [], [], []
        for qid, q in reference_queries():
            for r, (d, s6, h) in enumerate(idx.bm25_topk_collapsed(q, k=10, per_host=1)):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                scores.append(s6)
                hosts.append(h)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score_e6": pa.array(scores, pa.int64()),
                "host": pa.array(hosts, pa.string()),
            }
        )

    def q_search_facets(sf_dir: str) -> pa.Table:
        """Facet counts (URL host + doc language) over the e6 top-50
        candidate prefix per reference query — the result-refinement
        sidebar the reference's raw ranked list lacks
        (``SearchIndex.bm25_facets``)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        qids, facets, values, counts = [], [], [], []
        for qid, q in reference_queries():
            for facet, value, n in idx.bm25_facets(q, candidates=50):
                qids.append(qid)
                facets.append(facet)
                values.append(value)
                counts.append(n)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "facet": pa.array(facets, pa.string()),
                "facet_value": pa.array(values, pa.string()),
                "n_docs": pa.array(counts, pa.int64()),
            }
        )

    def q_search_recency(sf_dir: str) -> pa.Table:
        """Recency-boosted top-10 per reference query: the e6 top-50
        prefix re-ranked by ``score_e6 + 1000 * epoch_day(warc_ts)`` —
        integer arithmetic end-to-end
        (``SearchIndex.bm25_topk_recency``)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        qids, ranks, doc_ids, boosted = [], [], [], []
        for qid, q in reference_queries():
            for r, (d, b) in enumerate(idx.bm25_topk_recency(q, k=10)):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                boosted.append(b)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "boosted_e6": pa.array(boosted, pa.int64()),
            }
        )

    def q_search_phrase(sf_dir: str) -> pa.Table:
        """Exact phrase top-10 per phrase query: conjunctive candidate
        generation over the inverted index + adjacency verification
        against the doc store (``SearchIndex.phrase_topk``). Occurrence
        counts are integers, so ranking is bit-reproducible in SQL."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            phrase_queries,
        )

        idx = _cached_index(sf_dir)
        qids, ranks, doc_ids, occs = [], [], [], []
        for qid, q in phrase_queries():
            for r, (d, c) in enumerate(idx.phrase_topk(q, k=10)):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                occs.append(c)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_occ": pa.array(occs, pa.int64()),
            }
        )

    def q_search_phrase_positional(sf_dir: str) -> pa.Table:
        """Exact phrase top-10 evaluated ON THE POSITIONAL POSTINGS
        (format-3 index, ``method='positions'`` — no doc-store fetch);
        same output contract and SQL twin as ``search_phrase``, so the
        driver cross-checks the two physical plans against one oracle."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            phrase_queries,
        )

        idx = _cached_pos_index(sf_dir)
        qids, ranks, doc_ids, occs = [], [], [], []
        for qid, q in phrase_queries():
            for r, (d, c) in enumerate(idx.phrase_topk(q, k=10, method="positions")):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                occs.append(c)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_occ": pa.array(occs, pa.int64()),
            }
        )

    def q_search_proximity(sf_dir: str) -> pa.Table:
        """Proximity (min-cover) top-10 per reference query on the
        positional index (``SearchIndex.proximity_topk``): minimal
        window containing all distinct query terms, span asc."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_pos_index(sf_dir)
        qids, ranks, doc_ids, spans = [], [], [], []
        for qid, q in reference_queries():
            for r, (d, s) in enumerate(idx.proximity_topk(q, k=10)):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                spans.append(s)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "min_span": pa.array(spans, pa.int64()),
            }
        )

    def q_search_snippet(sf_dir: str) -> pa.Table:
        """Query-biased snippet windows on the positional index: for
        each reference query's strict-AND top-1 doc, the 12-token window
        (starting at a query-term hit) covering the most distinct query
        terms (``SearchIndex.snippet_window``)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_pos_index(sf_dir)
        qids, doc_ids, starts, nterms = [], [], [], []
        for qid, q in reference_queries():
            got = idx.snippet_window(q, width=12)
            if got is None:
                continue
            d, s, n = got
            qids.append(qid)
            doc_ids.append(d)
            starts.append(s)
            nterms.append(n)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "window_start": pa.array(starts, pa.int64()),
                "n_terms_in_window": pa.array(nterms, pa.int64()),
            }
        )

    def q_search_bm25f(sf_dir: str) -> pa.Table:
        """Simple BM25F re-ranking of the e6 top-50 body prefix
        (``SearchIndex.bm25f_topk``, w_title=3): title tf and length
        fold INTO the BM25 saturation instead of a flat boost."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        qids, ranks, doc_ids, scores = [], [], [], []
        for qid, q in reference_queries():
            for r, (d, s6) in enumerate(idx.bm25f_topk(q, k=10)):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                scores.append(s6)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "bm25f_e6": pa.array(scores, pa.int64()),
            }
        )

    def q_search_page2(sf_dir: str) -> pa.Table:
        """Page 2 of each reference query via the stateless search-after
        cursor (``SearchIndex.bm25_topk_after``): page 1's last
        (score_e6, doc_id) is the cursor; ranks continue at 10."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        qids, ranks, doc_ids, scores = [], [], [], []
        for qid, q in reference_queries():
            page1 = idx.bm25_topk_after(q, k=10)
            if len(page1) < 10:
                continue  # no second page
            page2 = idx.bm25_topk_after(q, k=10, after=page1[-1])
            for r, (s6, d) in enumerate(page2):
                qids.append(qid)
                ranks.append(10 + r)
                doc_ids.append(d)
                scores.append(s6)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score_e6": pa.array(scores, pa.int64()),
            }
        )

    def q_search_conj(sf_dir: str) -> pa.Table:
        """Strict-AND BM25 retrieval (every query term must match,
        ranked by the flagship score — ``SearchIndex.
        bm25_conjunctive_topk``); e6 contract like the OR rows."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        qids, ranks, doc_ids, scores = [], [], [], []
        for qid, q in reference_queries():
            ranked = idx.bm25_conjunctive_topk(q, k=50)
            e6 = sorted(
                ((int(round(s * 1_000_000)), d) for d, s in ranked),
                key=lambda t: (-t[0], t[1]),
            )[:10]
            for r, (s6, d) in enumerate(e6):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                scores.append(s6)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score_e6": pa.array(scores, pa.int64()),
            }
        )

    def q_search_mm(sf_dir: str) -> pa.Table:
        """minimum_should_match retrieval (mm=2): docs matching >= 2
        distinct query terms, flagship-BM25-ranked
        (``SearchIndex.bm25_mm_topk``); e6 contract like the OR rows."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        qids, ranks, doc_ids, scores = [], [], [], []
        for qid, q in reference_queries():
            ranked = idx.bm25_mm_topk(q, k=50, mm=2)
            e6 = sorted(
                ((int(round(s * 1_000_000)), d) for d, s in ranked),
                key=lambda t: (-t[0], t[1]),
            )[:10]
            for r, (s6, d) in enumerate(e6):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                scores.append(s6)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score_e6": pa.array(scores, pa.int64()),
            }
        )

    def q_search_dismax(sf_dir: str) -> pa.Table:
        """DisMax retrieval (tie=0.3): per distinct term the flagship
        BM25 clause score, doc score = max + tie*(sum-max)
        (``SearchIndex.dismax_topk``)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        qids, ranks, doc_ids, scores = [], [], [], []
        for qid, q in reference_queries():
            ranked = idx.dismax_topk(q, k=50, tie=0.3)
            e6 = sorted(
                ((int(round(s * 1_000_000)), d) for d, s in ranked),
                key=lambda t: (-t[0], t[1]),
            )[:10]
            for r, (s6, d) in enumerate(e6):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                scores.append(s6)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score_e6": pa.array(scores, pa.int64()),
            }
        )

    def q_search_qpp(sf_dir: str) -> pa.Table:
        """Pre-retrieval query-performance prediction: per reference
        query the distinct-term count, sum/max BM25 idf, and SCQ
        (``SearchIndex.qpp_stats``) — router features computed from
        term stats alone."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        cols = {k: [] for k in ("qid", "n_terms", "sum_idf_e6", "max_idf_e6", "scq_e6")}
        for qid, q in reference_queries():
            st = idx.qpp_stats(q)
            if st is None:
                continue
            cols["qid"].append(qid)
            for c in ("n_terms", "sum_idf_e6", "max_idf_e6", "scq_e6"):
                cols[c].append(st[c])
        return pa.table({c: pa.array(v, pa.int64()) for c, v in cols.items()})

    def q_search_explain(sf_dir: str) -> pa.Table:
        """Score EXPLAIN rows — per (top-3 doc, matched term): tf, df
        and the single-occurrence BM25 contribution in micros
        (``SearchIndex.explain_topk``)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        cols = {k: [] for k in ("qid", "doc_id", "term", "tf", "df", "contrib_e6")}
        for qid, q in reference_queries():
            for row in idx.explain_topk(q, k=3):
                cols["qid"].append(qid)
                for c in ("doc_id", "term", "tf", "df", "contrib_e6"):
                    cols[c].append(row[c])
        return pa.table(
            {
                "qid": pa.array(cols["qid"], pa.int64()),
                "doc_id": pa.array(cols["doc_id"], pa.int64()),
                "term": pa.array(cols["term"], pa.string()),
                "tf": pa.array(cols["tf"], pa.int64()),
                "df": pa.array(cols["df"], pa.int64()),
                "contrib_e6": pa.array(cols["contrib_e6"], pa.int64()),
            }
        )

    def q_index_shard_stats(sf_dir: str) -> pa.Table:
        """Index LAYOUT audit: per serving shard (shard =
        hash64(term) % num_shards — the hash routing that replaces the
        reference's range-partitioned KVS, ``kvs/KVSClient.java:
        188-198``), the vocabulary size and total df/cf it holds. The
        SQL twin re-derives the whole vocabulary from the corpus AND
        replays the md5 shard routing — so a routing or df/cf drift in
        ANY term fails the hash match."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
            hash64_array,
        )

        idx = _cached_index(sf_dir)
        t = idx._shards
        ns = int(idx.meta["num_shards"])
        shard = hash64_array(t["term"].to_pylist()) % ns
        df = t["df"].to_numpy(zero_copy_only=False)
        cf = t["cf"].to_numpy(zero_copy_only=False)
        n_terms = np.bincount(shard, minlength=ns).astype(np.int64)
        sum_df = np.zeros(ns, np.int64)
        np.add.at(sum_df, shard, df)
        sum_cf = np.zeros(ns, np.int64)
        np.add.at(sum_cf, shard, cf)
        return pa.table(
            {
                "shard": pa.array(np.arange(ns, dtype=np.int64)),
                "n_terms": pa.array(n_terms),
                "sum_df": pa.array(sum_df),
                "sum_cf": pa.array(sum_cf),
            }
        )

    def q_search_title(sf_dir: str) -> pa.Table:
        """BM25F-lite title boost: body BM25 e6 score plus a flat
        500000-micro boost per distinct body-present query term in the
        doc's title (`SearchIndex.bm25_title_boost` — boost-bound-pruned
        doc-store title fetches). All-integer ranking."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        cols = {k: [] for k in ("qid", "rank", "doc_id", "total_e6", "base_e6", "n_title_hits")}
        for qid, q in reference_queries():
            for r, (d, tot, base, h) in enumerate(idx.bm25_title_boost(q, k=10)):
                cols["qid"].append(qid)
                cols["rank"].append(r)
                cols["doc_id"].append(d)
                cols["total_e6"].append(tot)
                cols["base_e6"].append(base)
                cols["n_title_hits"].append(h)
        return pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})

    def q_search_anchor(sf_dir: str) -> pa.Table:
        """Anchor-field boost: body BM25 e6 score plus a flat
        300000-micro boost per distinct body-present query term among
        the doc's INBOUND anchor-text terms
        (`SearchIndex.bm25_anchor_boost`; anchor map from
        `stages/crawl.inbound_anchor_query_terms`, bounded by the query
        vocabulary). All-integer ranking."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
            tokenize_query,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
            reference_queries,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            inbound_anchor_query_terms,
        )

        idx = _cached_index(sf_dir)
        vocab = {
            t
            for _qid, q in reference_queries()
            for t in tokenize_query(q)
            if idx.has_term(t)
        }
        import ray

        amap: dict[int, set[str]] = {}
        pairs = inbound_anchor_query_terms(pages_for_sf_dir(sf_dir), vocab)
        for blk in ray.get(pairs.to_arrow_refs()):
            for d, t in zip(blk["doc_id"].to_pylist(), blk["term"].to_pylist()):
                amap.setdefault(d, set()).add(t)

        cols = {
            k: []
            for k in ("qid", "rank", "doc_id", "total_e6", "base_e6", "n_anchor_hits")
        }
        for qid, q in reference_queries():
            for r, (d, tot, base, h) in enumerate(idx.bm25_anchor_boost(q, amap, k=10)):
                cols["qid"].append(qid)
                cols["rank"].append(r)
                cols["doc_id"].append(d)
                cols["total_e6"].append(tot)
                cols["base_e6"].append(base)
                cols["n_anchor_hits"].append(h)
        return pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})

    def q_search_anchor_field(sf_dir: str) -> pa.Table:
        """Anchor text as a REAL index field (round-5): anchor postings
        built through the packed term shuffle
        (`pipelines/anchor_field.build_anchor_field` — actor-pool
        extraction with map-side combine, bucketed target-url join
        against the canonical doc store, doc-bucketed tf/length finish,
        canonical bucket merge), then BM25F over body+anchor
        (`bm25f_anchor_topk`, w=2.0): tf' = tf_body + w*tf_anchor,
        dl' = dl_body + w*anchor_len, avgdl' = (C_body + w*C_anchor)/N,
        body idf. Unlike `search_bm25_anchor`'s flat boost, an
        anchor-only match ENTERS the candidate set. All-integer e6
        output, (score desc, doc_id) ties."""
        import os as _os

        from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.anchor_field import (
            AnchorField,
            bm25f_anchor_topk,
            build_anchor_field,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
            reference_queries,
        )

        idx_dir = _cached_index_dir(sf_dir)
        if not _os.path.exists(_os.path.join(idx_dir, "anchor_meta.json")):
            build_anchor_field(pages_for_sf_dir(sf_dir), idx_dir, num_shards=4)
        idx = _cached_index(sf_dir)
        af = AnchorField(idx_dir)
        cols = {k: [] for k in ("qid", "rank", "doc_id", "bm25f_e6")}
        for qid, q in reference_queries():
            for r, (d, e6) in enumerate(bm25f_anchor_topk(idx, af, q, 10, w=2.0)):
                cols["qid"].append(qid)
                cols["rank"].append(r)
                cols["doc_id"].append(d)
                cols["bm25f_e6"].append(e6)
        return pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})

    def q_search_bm25f_all_fields(sf_dir: str) -> pa.Table:
        """Three-source BM25F over REAL indexed fields (round-5): body
        + title field (w=3, `build_title_field` — title postings
        through the term shuffle, no doc-store fetch at scoring time)
        + anchor field (w=2). tf' = tf_b + 3*tf_t + 2*tf_a, dl' =
        dl_b + 3*title_len + 2*anchor_len, avgdl' =
        (C_body + 3*C_title + 2*C_anchor)/N, body idf; title-only and
        anchor-only matches ENTER the candidate set
        (`bm25f_fields_topk`). All-integer e6 output."""
        import os as _os

        from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.anchor_field import (
            AnchorField,
            TitleField,
            bm25f_fields_topk,
            build_anchor_field,
            build_title_field,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
            reference_queries,
        )

        idx_dir = _cached_index_dir(sf_dir)
        if not _os.path.exists(_os.path.join(idx_dir, "anchor_meta.json")):
            build_anchor_field(pages_for_sf_dir(sf_dir), idx_dir, num_shards=4)
        if not _os.path.exists(_os.path.join(idx_dir, "title_meta.json")):
            build_title_field(idx_dir, num_shards=4)
        idx = _cached_index(sf_dir)
        fields = [(TitleField(idx_dir), 3.0), (AnchorField(idx_dir), 2.0)]
        cols = {k: [] for k in ("qid", "rank", "doc_id", "bm25f_e6")}
        for qid, q in reference_queries():
            for r, (d, e6) in enumerate(bm25f_fields_topk(idx, fields, q, 10)):
                cols["qid"].append(qid)
                cols["rank"].append(r)
                cols["doc_id"].append(d)
                cols["bm25f_e6"].append(e6)
        return pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})

    def q_search_not(sf_dir: str) -> pa.Table:
        """Exclusion (NOT) retrieval: BM25 top-10 per reference query
        among docs containing NONE of the NEXT reference query's terms
        (cyclic pairing — deterministic, replayed in SQL).
        `SearchIndex.bm25_not`: merged banned-id postings union +
        sorted membership test, no doc fetch."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        qs = list(reference_queries())
        qids, ranks, doc_ids, scores = [], [], [], []
        for i, (qid, q) in enumerate(qs):
            exclude = qs[(i + 1) % len(qs)][1]
            for r, (d, s6) in enumerate(idx.bm25_not(q, exclude, k=10)):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                scores.append(s6)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score_e6": pa.array(scores, pa.int64()),
            }
        )

    def q_search_site(sf_dir: str) -> pa.Table:
        """site:-restricted retrieval ("more from this site"): within
        the e6 top-50 prefix per reference query, docs whose URL host
        equals the host of the prefix's TOP result, prefix order, top
        10 (`SearchIndex.bm25_site_topk`)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        qids, ranks, doc_ids, scores, hosts = [], [], [], [], []
        for qid, q in reference_queries():
            for r, (d, s6, h) in enumerate(idx.bm25_site_topk(q, k=10)):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                scores.append(s6)
                hosts.append(h)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score_e6": pa.array(scores, pa.int64()),
                "host": pa.array(hosts, pa.string()),
            }
        )

    def q_search_intitle(sf_dir: str) -> pa.Table:
        """intitle:-restricted retrieval: within the e6 top-50 prefix
        per reference query, docs whose TITLE tokens contain the
        query's first token, prefix order, top 10
        (`SearchIndex.bm25_intitle_topk`)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        qids, ranks, doc_ids, scores = [], [], [], []
        for qid, q in reference_queries():
            for r, (d, s6) in enumerate(idx.bm25_intitle_topk(q, k=10)):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                scores.append(s6)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score_e6": pa.array(scores, pa.int64()),
            }
        )

    def q_search_boolean(sf_dir: str) -> pa.Table:
        """Strict conjunctive (AND) retrieval top-10 per reference
        query, ranked by summed term frequency
        (``SearchIndex.boolean_and``)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        qids, ranks, doc_ids, tfs = [], [], [], []
        for qid, q in reference_queries():
            for r, (d, s) in enumerate(idx.boolean_and(q, k=10)):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                tfs.append(s)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "sum_tf": pa.array(tfs, pa.int64()),
            }
        )

    def q_ingest_jsonl(sf_dir: str) -> pa.Table:
        """JSONL ingestion parity: the corpus round-tripped through the
        JSONL reader (``sources/ingest.read_pages``) aggregates to the
        same per-lang byte totals as the canonical parquet (SQL side)."""
        import pyarrow.parquet as pq

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.ingest import (
            read_pages,
            write_pages_jsonl,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from ray.data.aggregate import Count, Sum

        pages = pages_for_sf_dir(sf_dir)
        jp = "/tmp/wse_ingest_" + os.path.basename(pages).replace(".parquet", ".jsonl")
        if not os.path.exists(jp):
            write_pages_jsonl(pq.read_table(pages), jp + ".tmp")
            os.replace(jp + ".tmp", jp)

        def lens(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "lang": t["lang"],
                    "text_bytes": pc.binary_length(t["text"]).cast(pa.int64()),
                    "html_bytes": pc.binary_length(t["html"]).cast(pa.int64()),
                }
            )

        got = (
            read_pages(jp, format="jsonl")
            .map_batches(lens, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Count(), Sum("text_bytes"), Sum("html_bytes"))
            .take_all()
        )
        return pa.table(
            {
                "lang": pa.array([r["lang"] for r in got]),
                "n_pages": pa.array([r["count()"] for r in got], pa.int64()),
                "sum_text_bytes": pa.array(
                    [r["sum(text_bytes)"] for r in got], pa.int64()
                ),
                "sum_html_bytes": pa.array(
                    [r["sum(html_bytes)"] for r in got], pa.int64()
                ),
            }
        ).sort_by("lang")

    def q_ingest_csv(sf_dir: str) -> pa.Table:
        """CSV ingestion parity: the corpus round-tripped through
        sharded CSV files (quoted newlines force per-file sequential
        parsing, so parallelism is file-sharding —
        ``sources/ingest.write_pages_csv`` / ``read_pages
        format='csv'``) aggregates to the same per-lang byte totals as
        the canonical parquet (SQL side)."""
        import pyarrow.parquet as pq

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.ingest import (
            read_pages,
            write_pages_csv,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from ray.data.aggregate import Count, Sum

        pages = pages_for_sf_dir(sf_dir)
        out = "/tmp/wse_ingest_csv_" + os.path.basename(pages).replace(".parquet", "")
        if not os.path.isdir(out) or not os.listdir(out):
            write_pages_csv(pq.read_table(pages), out, shards=4)

        def lens(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "lang": t["lang"],
                    "text_bytes": pc.binary_length(t["text"]).cast(pa.int64()),
                    "html_bytes": pc.binary_length(t["html"]).cast(pa.int64()),
                }
            )

        got = (
            read_pages(out, format="csv")
            .map_batches(lens, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Count(), Sum("text_bytes"), Sum("html_bytes"))
            .take_all()
        )
        return pa.table(
            {
                "lang": pa.array([r["lang"] for r in got]),
                "n_pages": pa.array([r["count()"] for r in got], pa.int64()),
                "sum_text_bytes": pa.array(
                    [r["sum(text_bytes)"] for r in got], pa.int64()
                ),
                "sum_html_bytes": pa.array(
                    [r["sum(html_bytes)"] for r in got], pa.int64()
                ),
            }
        ).sort_by("lang")

    def q_ingest_ipc(sf_dir: str) -> pa.Table:
        """Arrow IPC (Feather-v2) ingestion parity: the corpus
        round-tripped through sharded IPC files (file-parallel
        read_binary_files + zero-copy pa.ipc decode — the WARC plan)
        aggregates to the same per-lang byte totals as the canonical
        parquet (sources/ingest.read_pages format='ipc')."""
        import pyarrow.parquet as pq

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.ingest import (
            read_pages,
            write_pages_ipc,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from ray.data.aggregate import Count, Sum

        pages = pages_for_sf_dir(sf_dir)
        out = "/tmp/wse_ingest_ipc_" + os.path.basename(pages).replace(".parquet", "")
        if not os.path.isdir(out) or not os.listdir(out):
            write_pages_ipc(pq.read_table(pages), out, shards=4)

        def lens(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "lang": t["lang"],
                    "text_bytes": pc.binary_length(t["text"]).cast(pa.int64()),
                    "html_bytes": pc.binary_length(t["html"]).cast(pa.int64()),
                }
            )

        got = (
            read_pages(out, format="ipc")
            .map_batches(lens, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Count(), Sum("text_bytes"), Sum("html_bytes"))
            .take_all()
        )
        return pa.table(
            {
                "lang": pa.array([r["lang"] for r in got]),
                "n_pages": pa.array([r["count()"] for r in got], pa.int64()),
                "sum_text_bytes": pa.array(
                    [r["sum(text_bytes)"] for r in got], pa.int64()
                ),
                "sum_html_bytes": pa.array(
                    [r["sum(html_bytes)"] for r in got], pa.int64()
                ),
            }
        ).sort_by("lang")

    def q_ingest_warc(sf_dir: str) -> pa.Table:
        """WARC ingestion parity: the corpus serialized into sharded
        per-record-gzipped WARC files (the Common Crawl layout) and
        read back file-parallel (``sources/warc.read_warc_pages``)
        aggregates to the same per-host page counts / html byte totals
        / second-floored min capture time as the canonical parquet.
        WARC carries only the wire capture (url, ts, html), so the
        parity dimensions are exactly those three."""
        import pyarrow.parquet as pq

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.warc import (
            read_warc_pages,
            write_pages_warc,
        )
        from ray.data.aggregate import Count, Min, Sum

        pages = pages_for_sf_dir(sf_dir)
        wd = "/tmp/wse_warc_" + os.path.basename(pages).replace(".parquet", "")
        if not os.path.isdir(wd):
            write_pages_warc(pq.read_table(pages), wd + ".tmp", num_shards=4)
            os.replace(wd + ".tmp", wd)

        def hostify(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "host": pc.list_element(
                        pc.split_pattern(t["url"], "/"), 2
                    ),
                    "html_bytes": pc.binary_length(t["html"]).cast(pa.int64()),
                    "ts_us": t["warc_ts"].cast(pa.int64()),
                }
            )

        got = (
            read_warc_pages(wd)
            .map_batches(hostify, batch_format="pyarrow")
            .groupby("host")
            .aggregate(Count(), Sum("html_bytes"), Min("ts_us"))
            .take_all()
        )
        return pa.table(
            {
                "host": pa.array([r["host"] for r in got]),
                "n_pages": pa.array([r["count()"] for r in got], pa.int64()),
                "sum_html_bytes": pa.array(
                    [r["sum(html_bytes)"] for r in got], pa.int64()
                ),
                "min_ts_us": pa.array([r["min(ts_us)"] for r in got], pa.int64()),
            }
        ).sort_by("host")

    def q_index_update_stats(sf_dir: str) -> pa.Table:
        """Full-vocabulary (term, df, cf) of an index built incrementally
        (base over the even half, ``update_index`` with the odd half) —
        must equal a from-scratch SQL replay over the whole corpus."""
        import pyarrow.parquet as pq

        out = _cached_updated_index(sf_dir)
        t = pq.read_table(os.path.join(out, "term_stats"))
        return t.select(["term", "df", "cf"]).sort_by("term")

    def q_index_update_segment_stats(sf_dir: str) -> pa.Table:
        """Full-vocabulary (term, df, cf) of a SEGMENT-updated index —
        base over the even half, odd half landed as a NEW immutable
        segment with O(delta) I/O (``pipelines/segments.add_segment``,
        bloom+exact contentSeen gate) — must equal the same
        from-scratch SQL replay as the in-place update path (segments
        are doc-disjoint, so per-term df/cf sum exactly)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
            SearchIndex,
        )

        return SearchIndex.load(_cached_segmented_index(sf_dir)).term_stats()

    def q_search_segment_bm25(sf_dir: str) -> pa.Table:
        """e6 top-10 BM25 per reference query served from the SEGMENT
        UNION (``SegmentedIndex``: per-segment exhaustive scoring with
        GLOBAL N/avgdl/df + exact top-k merge — each doc's whole score
        lives in its one segment) — must hash-equal the from-scratch
        SQL replay over the whole corpus with the parity winner rule."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
            SearchIndex,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = SearchIndex.load(_cached_segmented_index(sf_dir))
        qids, ranks, doc_ids, scores = [], [], [], []
        for qid, q in reference_queries():
            ranked = idx.bm25_topk(q, k=50)
            e6 = sorted(
                ((int(round(s * 1_000_000)), d) for d, s in ranked),
                key=lambda t: (-t[0], t[1]),
            )[:10]
            for r, (s6, d) in enumerate(e6):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                scores.append(s6)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score_e6": pa.array(scores, pa.int64()),
            }
        )

    def q_index_delete_stats(sf_dir: str) -> pa.Table:
        """Full-vocabulary (term, df, cf) of an index after deleting
        every doc with doc_id % 8 == 3 (``delete_from_index`` — the
        tombstone path) — must equal a from-scratch SQL replay over the
        surviving winners."""
        import pyarrow.parquet as pq

        out = _cached_deleted_index(sf_dir)
        t = pq.read_table(os.path.join(out, "term_stats"))
        return t.select(["term", "df", "cf"]).sort_by("term")

    def q_doc_term_stats(sf_dir: str):
        return doc_term_stats(_docs(sf_dir))

    def q_doc_bm25(sf_dir: str) -> pa.Table:
        return doc_bm25_topk(_docs(sf_dir), BM25_QUERY, k=20)

    def q_doc_tfidf(sf_dir: str) -> pa.Table:
        return doc_tfidf_topk(_docs(sf_dir), TFIDF_QUERY, k=300, threshold=0.3)

    def q_search_hybrid(sf_dir: str) -> pa.Table:
        """Two-stage hybrid retrieval cascade (lexical nominate, dense
        re-order — the standard RAG serving plan): BM25 top-50 over the
        documents table, candidates re-ranked by embedding cosine vs
        the query vector (embeddings row vec_id=0), top-10 kept. The
        corpus-sized embeddings table streams through one vectorized
        filter+matmul map_batches against the broadcast candidate set;
        only candidate rows come back."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.doc_search import (
            hybrid_rerank,
        )

        return hybrid_rerank(
            _docs(sf_dir),
            _tbl(sf_dir, "embeddings"),
            BM25_QUERY,
            query_vec_id=0,
            n_candidates=50,
            k=10,
        )

    # ---------------- text analysis ----------------

    def _stats(sf_dir: str):
        return _docs(sf_dir).map_batches(
            TextStatsStage, batch_format="pyarrow", concurrency=4
        )

    def q_token_stats(sf_dir: str):
        def project(t: pa.Table) -> pa.Table:
            keep = pc.greater(t["n_tokens"], 0)
            t = t.filter(keep)
            return t.select(["doc_id", "n_tokens", "n_unique_tokens", "mean_token_len"])

        return _stats(sf_dir).map_batches(project, batch_format="pyarrow")

    def q_stem_vocab(sf_dir: str):
        """Stemmed vocabulary rollup (the analysis-chain normalizer the
        raw-term reference lacks): corpus terms -> Porter stems ->
        (stem, n_terms, total_tf). Map-side combine inside each batch
        (unique term -> summed tf), a vocab-bounded term groupby, ONE
        Python stem call per DISTINCT corpus term (the bounded-vocab
        exception), then the stem groupby. The oracle embeds the
        (term, stem) map from the same pure function and re-derives
        both aggregations in SQL."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.stem import (
            porter_stem,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
            tokenize_count_batch,
        )

        def term_tf(batch: pa.Table) -> pa.Table:
            terms, tfs, _ = tokenize_count_batch(batch["text"])
            tnp = terms.flatten().to_numpy(zero_copy_only=False)
            fnp = tfs.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            uniq, inv = np.unique(tnp, return_inverse=True)
            sums = np.zeros(uniq.size, np.int64)
            np.add.at(sums, inv, fnp)
            return pa.table(
                {"term": pa.array(uniq.tolist(), pa.string()), "tf": pa.array(sums)}
            )

        totals = (
            _tbl(sf_dir, "documents", ["text"])
            .map_batches(term_tf, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("tf", alias_name="tf"))
        )

        def add_stem(t: pa.Table) -> pa.Table:
            stems = [porter_stem(x) for x in t["term"].to_pylist()]
            return t.append_column("stem", pa.array(stems, pa.string()))

        return (
            totals.map_batches(add_stem, batch_format="pyarrow")
            .groupby("stem")
            .aggregate(Count(alias_name="n_terms"), Sum("tf", alias_name="total_tf"))
        )

    def q_compress_ratio(sf_dir: str):
        """zlib compression ratio per document — the classic duplicate/
        boilerplate quality signal (highly repetitive text compresses
        far below normal prose): ratio_e4 = compressed_bytes * 10000 //
        raw_bytes, exact integers (zlib level 6 is deterministic in
        CPython). Embarrassingly parallel; the oracle embeds the pure
        replay's compressed sizes and re-derives the ratio arithmetic."""
        import zlib

        def ratios(t: pa.Table) -> pa.Table:
            raw = [s.encode() for s in t["text"].to_pylist()]
            comp = np.fromiter(
                (len(zlib.compress(b, 6)) for b in raw), np.int64, len(raw)
            )
            rawlen = np.fromiter((len(b) for b in raw), np.int64, len(raw))
            ratio = np.where(rawlen > 0, comp * 10_000 // np.maximum(rawlen, 1), 0)
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "raw_bytes": pa.array(rawlen),
                    "compressed_bytes": pa.array(comp),
                    "ratio_e4": pa.array(ratio),
                }
            )

        return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            ratios, batch_format="pyarrow"
        )

    def q_embed_hash(sf_dir: str):
        """Hashed-feature document embeddings (the deterministic stand-
        in for batched model inference — same actor-pool plumbing:
        setup once per actor, one vectorized pass per batch): each doc
        maps to a 64-dim hashed bag-of-tokens, emitted LONG-FORM
        (doc_id, dim, weight) so the SQL twin replays the md5 dim
        assignment and the per-dim sums exactly."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
            hash64,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
            tokenize_count_batch,
        )

        DIMS = 64

        class HashEmbedStage:
            def __init__(self):
                self._dim_cache: dict[str, int] = {}

            def _dim(self, term: str) -> int:
                d = self._dim_cache.get(term)
                if d is None:
                    d = hash64(term) % DIMS
                    self._dim_cache[term] = d
                return d

            def __call__(self, batch: pa.Table) -> pa.Table:
                terms, tfs, _ = tokenize_count_batch(batch["text"])
                parents = pc.list_parent_indices(terms).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                flat_t = terms.flatten().to_pylist()
                flat_f = tfs.flatten().to_numpy(zero_copy_only=False).astype(
                    np.int64
                )
                dims = np.fromiter(
                    (self._dim(t) for t in flat_t), np.int64, len(flat_t)
                )
                n = batch.num_rows
                acc = np.zeros((n, DIMS), np.int64)
                np.add.at(acc, (parents, dims), flat_f)
                rows, cols = np.nonzero(acc)
                ids = batch["doc_id"].to_numpy(zero_copy_only=False)
                return pa.table(
                    {
                        "doc_id": pa.array(ids[rows]),
                        "dim": pa.array(cols.astype(np.int64)),
                        "weight": pa.array(acc[rows, cols]),
                    }
                )

        return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            HashEmbedStage, batch_format="pyarrow", concurrency=(1, 4)
        )

    def q_sentence_stats(sf_dir: str):
        """Per-doc sentence statistics (the quality-filter signal family
        the token stats miss): sentences = non-empty [.!?]-separated
        spans after whitespace trim; emits count, total and max span
        length in CHARACTERS. One Arrow kernel chain per batch (regex
        split, flatten, trim, utf8_length) + numpy segment reductions —
        no per-row Python."""

        def stats(t: pa.Table) -> pa.Table:
            spans = pc.split_pattern_regex(t["text"], "[.!?]")
            flat = pc.list_flatten(spans)
            parents = pc.list_parent_indices(spans).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            trimmed = pc.utf8_trim(flat, " \t\r\n")
            lens = pc.utf8_length(trimmed).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            keep = lens > 0
            parents, lens = parents[keep], lens[keep]
            n = t.num_rows
            n_sent = np.zeros(n, np.int64)
            tot = np.zeros(n, np.int64)
            mx = np.zeros(n, np.int64)
            np.add.at(n_sent, parents, 1)
            np.add.at(tot, parents, lens)
            np.maximum.at(mx, parents, lens)
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_sentences": pa.array(n_sent),
                    "sum_sentence_chars": pa.array(tot),
                    "max_sentence_chars": pa.array(mx),
                }
            )

        return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            stats, batch_format="pyarrow"
        )

    def q_entropy(sf_dir: str):
        """Token-distribution Shannon entropy per doc (the repetition /
        boilerplate quality signal: low entropy = few distinct tokens
        dominate): H = -sum_t (tf/dl) ln(tf/dl). Each term's
        contribution is e6-quantized BEFORE the per-doc sum (the
        unigram_loglik discipline), so entropy_e6 is an exact int64 sum
        replayed term-by-term in SQL. One tokenize-count kernel per
        batch, shuffle-free; empty docs drop out (both sides)."""
        import math

        def entropy(t: pa.Table) -> pa.Table:
            from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
                tokenize_count_batch,
            )

            terms, tfs, _lens = tokenize_count_batch(t["text"])
            parents = pc.list_parent_indices(terms).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            tf = tfs.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            n = t.num_rows
            dl = np.zeros(n, np.int64)
            np.add.at(dl, parents, tf)
            # per-(tf, dl) quantized contribution: w = round(1e6 *
            # (tf/dl) * ln(tf/dl)) — python-float ops in SQL's order
            dlf = dl[parents].astype(np.float64)
            ratio = tf.astype(np.float64) / dlf
            w = np.rint(1_000_000.0 * ratio * np.log(ratio)).astype(np.int64)
            h = np.zeros(n, np.int64)
            np.add.at(h, parents, w)
            keep = dl > 0
            return pa.table(
                {
                    "doc_id": t["doc_id"].filter(pa.array(keep)),
                    "dl": pa.array(dl[keep]),
                    "entropy_e6": pa.array(-h[keep]),
                }
            )

        return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            entropy, batch_format="pyarrow"
        )

    def q_path_depth(sf_dir: str):
        """URL path-depth histogram per host (crawl frontier shape
        diagnostics: how deep does each site go?): depth = number of
        path segments after the authority. One vectorized regex +
        count_substring per batch, then a bounded (host, depth)
        groupby."""

        def depths(t: pa.Table) -> pa.Table:
            host = pc.extract_regex(
                t["url"], r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?P<h>[^/:?#]+)"
            )
            hosts = pc.struct_field(host, "h")
            # path = everything after scheme://authority
            path = pc.replace_substring_regex(
                t["url"], r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*", ""
            )
            depth = pc.count_substring(path, "/")
            return pa.table(
                {
                    "host": pc.utf8_lower(hosts),
                    "depth": pc.cast(depth, pa.int64()),
                }
            )

        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )

        return (
            rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url"])
            .map_batches(depths, batch_format="pyarrow")
            .groupby(["host", "depth"])
            .aggregate(Count(alias_name="n_urls"))
        )

    def q_readability(sf_dir: str):
        """Automated Readability Index per doc (Senter & Smith 1967:
        4.71*chars/words + 0.5*words/sentences - 21.43) — the grade-
        level quality-filter signal. Chars/words come from the
        CANONICAL tokens (punctuation already stripped), sentences from
        the [.!?] non-empty-span rule of ``text_sentence_stats``; the
        score is the exact integer rational floor((4710*C*S + 500*W^2 +
        (K-21430)*W*S) / (W*S)) - K at e3 quantization (K=30000 keeps
        the numerator positive so floor == truncation and the SQL twin
        replays it with BIGINT division). Shuffle-free; docs with zero
        words or zero sentences drop out (mirrored in SQL)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
            flat_tokens_batch,
        )

        K = 30_000

        def ari(t: pa.Table) -> pa.Table:
            n = t.num_rows
            flat, parents, _nd = flat_tokens_batch(t["text"])
            tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            n_words = np.zeros(n, np.int64)
            n_chars = np.zeros(n, np.int64)
            if tok_lens.size:
                np.add.at(n_words, parents, 1)
                np.add.at(n_chars, parents, tok_lens)
            spans = pc.split_pattern_regex(t["text"], "[.!?]")
            sflat = pc.utf8_trim(pc.list_flatten(spans), " \t\r\n")
            sparents = pc.list_parent_indices(spans).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            nonempty = pc.utf8_length(sflat).to_numpy(zero_copy_only=False) > 0
            n_sent = np.zeros(n, np.int64)
            np.add.at(n_sent, sparents[nonempty], 1)
            keep = (n_words > 0) & (n_sent > 0)
            W, C, S = n_words[keep], n_chars[keep], n_sent[keep]
            ari_e3 = (4710 * C * S + 500 * W * W + (K - 21430) * W * S) // (W * S) - K
            return pa.table(
                {
                    "doc_id": t["doc_id"].filter(pa.array(keep)),
                    "n_chars": pa.array(C),
                    "n_words": pa.array(W),
                    "n_sentences": pa.array(S),
                    "ari_e3": pa.array(ari_e3),
                }
            )

        return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            ari, batch_format="pyarrow"
        )

    def q_chunk_overlap(sf_dir: str):
        """Overlapping-window chunking (RAG prep: window 32 tokens,
        stride 16 — each chunk shares half its tokens with the next so
        retrieval never loses a boundary-straddling span): one ordered
        vectorized tokenize per batch, per-doc window slicing, chunk
        fingerprint = md5 of the space-joined tokens (SQL-native, so
        the twin replays slicing + hashing exactly). Shuffle-free."""
        import hashlib

        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
            flat_tokens_batch,
        )

        W, S = 32, 16

        def chunks(t: pa.Table) -> pa.Table:
            flat, parents, n_docs = flat_tokens_batch(t["text"])
            toks = flat.to_pylist()
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            starts = np.concatenate(
                ([0], np.flatnonzero(np.diff(parents)) + 1, [len(toks)])
            ) if len(toks) else np.array([0])
            # parents may skip docs with zero tokens: map run -> doc
            run_docs = parents[starts[:-1]] if len(toks) else np.array([], np.int64)
            out_id, out_ci, out_len, out_md5 = [], [], [], []
            for r in range(run_docs.size):
                d = int(ids[run_docs[r]])
                seg = toks[starts[r] : starts[r + 1]]
                n = len(seg)
                for ci, s in enumerate(range(0, n, S)):
                    c = seg[s : s + W]
                    out_id.append(d)
                    out_ci.append(ci)
                    out_len.append(len(c))
                    out_md5.append(hashlib.md5(" ".join(c).encode()).hexdigest())
            return pa.table(
                {
                    "doc_id": pa.array(out_id, pa.int64()),
                    "chunk_idx": pa.array(out_ci, pa.int64()),
                    "chunk_len": pa.array(out_len, pa.int64()),
                    "chunk_md5": pa.array(out_md5, pa.string()),
                }
            )

        return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            chunks, batch_format="pyarrow"
        )

    def q_vocab_neighbors(sf_dir: str):
        """Edit-distance-1 term pairs over the corpus vocabulary — the
        fuzzy self-join behind spell correction, done SUB-QUADRATICALLY
        (SymSpell's deletion-neighborhood hashing): each distinct term
        emits itself + its 1-deletion variants, candidates collide in a
        key groupby (never all-pairs), pair dedup rides the bucketed
        distinct kernel, and each candidate pair pays ONE exact DP
        verify. The oracle is DuckDB's native levenshtein over the
        O(V^2) cross join — the same answer from the opposite plan."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
            tokenize_count_batch,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            distinct_on,
        )

        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )

        def terms_of(batch: pa.Table) -> pa.Table:
            terms, _tfs, _ = tokenize_count_batch(batch["text"])
            uniq = np.unique(terms.flatten().to_numpy(zero_copy_only=False))
            return pa.table({"term": pa.array(uniq.tolist(), pa.string())})

        vocab = distinct_on(
            rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["text"]).map_batches(
                terms_of, batch_format="pyarrow"
            ),
            ["term"],
        )

        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
            hash64,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.shuffle import (
            packed_task_groups,
        )

        key_buckets, pair_buckets = 256, 64

        def explode_deletions(t: pa.Table) -> pa.Table:
            keys, terms_out = [], []
            for w in t["term"].to_pylist():
                keys.append(w)
                terms_out.append(w)
                for i in range(len(w)):
                    keys.append(w[:i] + w[i + 1 :])
                    terms_out.append(w)
            return pa.table(
                {
                    "kbucket": pa.array(
                        [hash64(k) % key_buckets for k in keys], pa.int64()
                    ),
                    "key": pa.array(keys, pa.string()),
                    "term": pa.array(terms_out, pa.string()),
                }
            )

        def candidate_pairs(group: pa.Table) -> pa.Table:
            # all same-key pairs within the bucket: sort by key, run
            # detection, per-run pair expansion (runs are tiny —
            # deletion neighborhoods, not data keys)
            g = group.take(
                pc.sort_indices(
                    group, sort_keys=[("key", "ascending"), ("term", "ascending")]
                )
            )
            ks = g["key"].to_pylist()
            ts = g["term"].to_pylist()
            a_out, b_out = [], []
            i = 0
            while i < len(ks):
                j = i + 1
                while j < len(ks) and ks[j] == ks[i]:
                    j += 1
                ws = sorted(set(ts[i:j]))
                for x in range(len(ws)):
                    for y in range(x + 1, len(ws)):
                        a_out.append(ws[x])
                        b_out.append(ws[y])
                i = j
            return pa.table(
                {
                    "term_a": pa.array(a_out, pa.string()),
                    "term_b": pa.array(b_out, pa.string()),
                }
            )

        raw_pairs = packed_task_groups(
            vocab.map_batches(explode_deletions, batch_format="pyarrow"),
            "kbucket",
            candidate_pairs,
            num_buckets=key_buckets,
        )

        # global pair dedup on the same task exchange (bounded pair-hash
        # buckets; the Dataset hash shuffle chokes on the schema-less
        # empty blocks a map_groups stage can emit for empty partitions)
        def pair_local(batch: pa.Table) -> pa.Table:
            dd = batch.group_by(["term_a", "term_b"]).aggregate([])
            bucket = [
                hash64(a + "\0" + b) % pair_buckets
                for a, b in zip(dd["term_a"].to_pylist(), dd["term_b"].to_pylist())
            ]
            return dd.append_column("__bucket", pa.array(bucket, pa.int64()))

        def pair_bucket(group: pa.Table) -> pa.Table:
            return (
                group.drop_columns(["__bucket"])
                .group_by(["term_a", "term_b"])
                .aggregate([])
            )

        cands = packed_task_groups(
            raw_pairs.map_batches(pair_local, batch_format="pyarrow"),
            "__bucket",
            pair_bucket,
            num_buckets=pair_buckets,
        )

        def _lev1(a: str, b: str) -> bool:
            # exact "edit distance == 1" check, O(len) two-pointer
            if a == b:
                return False
            la, lb = len(a), len(b)
            if abs(la - lb) > 1:
                return False
            if la == lb:
                return sum(x != y for x, y in zip(a, b)) == 1
            if la > lb:
                a, b, la, lb = b, a, lb, la
            i = j = 0
            skipped = False
            while i < la and j < lb:
                if a[i] == b[j]:
                    i += 1
                    j += 1
                elif not skipped:
                    skipped = True
                    j += 1
                else:
                    return False
            return True

        def verify(t: pa.Table) -> pa.Table:
            keep = pa.array(
                [
                    _lev1(a, b)
                    for a, b in zip(t["term_a"].to_pylist(), t["term_b"].to_pylist())
                ]
            )
            return t.filter(keep)

        # output is vocab-bounded: materialize to a TYPED table so an
        # empty result still carries its schema (Ray drops schemas on
        # empty datasets)
        rows = cands.map_batches(verify, batch_format="pyarrow").take_all()
        return pa.table(
            {
                "term_a": pa.array([r["term_a"] for r in rows], pa.string()),
                "term_b": pa.array([r["term_b"] for r in rows], pa.string()),
            }
        )

    def q_cms_counts(sf_dir: str):
        """Count-min sketch frequency estimation (depth 4 x width 64 —
        width chosen small enough that the corpus vocabulary actually
        collides, so the min-over-cells estimate path is exercised):
        (term, exact_tf, est_tf) for every distinct corpus term. The
        md5-based cell hash is SQL-native, so the oracle re-derives the
        ENTIRE sketch — no embedded literals."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            cms_term_counts,
        )

        return cms_term_counts(
            _tbl(sf_dir, "documents", ["text"]), depth=4, width=64
        )

    def q_repetition(sf_dir: str):
        """Gopher-style within-doc repetition signals (top-bigram mass,
        duplicate-trigram occurrences) — integer counts, one vectorized
        shuffle-free map_batches stage (`stages/textstats.repetition_stats`)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            repetition_stats,
        )

        return _docs(sf_dir).map_batches(repetition_stats, batch_format="pyarrow")

    def q_collocations(sf_dir: str):
        """Corpus-level collocations: top-100 adjacent token pairs by
        occurrence count. Map-side pair-count combine per batch
        (`bigram_counts_partial`), one bounded groupby, then the
        bounded-bucket top-N kernel with a constant group."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            topn_per_group,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            bigram_counts_partial,
        )

        agg = (
            _docs(sf_dir)
            .map_batches(bigram_counts_partial, batch_format="pyarrow")
            .groupby(["w1", "w2"])
            .aggregate(Sum("n_occ", alias_name="n_occ"))
        )
        tagged = agg.map_batches(
            lambda t: t.append_column("g", pa.array(np.zeros(t.num_rows, np.int64))),
            batch_format="pyarrow",
        )
        top = topn_per_group(
            tagged, "g", 100,
            [("n_occ", "descending"), ("w1", "ascending"), ("w2", "ascending")],
        )
        return top.map_batches(
            lambda t: t.select(["w1", "w2", "n_occ"]), batch_format="pyarrow"
        )

    def q_cooccurrence(sf_dir: str):
        """Windowed co-occurrence counts over the top-50 corpus terms
        (the GloVe-style embedding-training input): unordered pairs
        within 2 ORIGINAL token positions (out-of-vocab tokens still
        consume distance). Map-side (V x V) dense combine per batch ->
        bounded groupby (``stages/textstats.windowed_cooccurrence``)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            windowed_cooccurrence,
        )

        return windowed_cooccurrence(_docs(sf_dir), vocab_size=50, window=2)

    def q_textrank(sf_dir: str):
        """TextRank keyword scoring (Mihalcea & Tarau 2004): exact-
        integer damped power iteration over the windowed co-occurrence
        graph of the top-50 terms — transition weights quantized once
        as (1e6*n)//W(u), every floor division explicit, so the
        unrolled-CTE SQL twin replays all 10 iterations bit-for-bit
        (stages/textstats.py:textrank_keywords)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            textrank_keywords,
        )

        return textrank_keywords(_docs(sf_dir), vocab_size=50, window=2, iters=10)

    def q_nb_lang(sf_dir: str):
        """Naive-Bayes language ID: train per-language Laplace-smoothed
        term likelihoods over the top-200 vocab (labels = the documents
        table's lang column), then classify every doc. All weights
        e6-quantized before the exact int64 per-doc sum
        (``stages/textstats.naive_bayes_lang``)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            naive_bayes_lang,
        )

        return naive_bayes_lang(
            _tbl(sf_dir, "documents", ["doc_id", "text", "lang"]), vocab_size=200
        )

    def q_pmi(sf_dir: str):
        """Pointwise mutual information of the top-100 adjacent
        collocations: pmi = ln(p(w1,w2) / (p(w1) p(w2))) with p from
        exact corpus counts (bigram transitions / unigram occurrences).
        Counts stay exact ints end-to-end; the ONE float expression is
        evaluated in the same IEEE order as the SQL twin and e6-rounded
        (the BM25-oracle convention)."""
        import math

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            topn_per_group,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            bigram_counts_partial,
            token_counts_partial,
        )

        docs = _docs(sf_dir).materialize()
        bi = (
            docs.map_batches(bigram_counts_partial, batch_format="pyarrow")
            .groupby(["w1", "w2"])
            .aggregate(Sum("n_occ", alias_name="n_occ"))
            .materialize()
        )
        uni = (
            docs.map_batches(token_counts_partial, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("n_occ", alias_name="cf"))
            .materialize()
        )
        tbi = int(bi.sum("n_occ"))
        tuni = int(uni.sum("cf"))
        tagged = bi.map_batches(
            lambda t: t.append_column("g", pa.array(np.zeros(t.num_rows, np.int64))),
            batch_format="pyarrow",
        )
        top = topn_per_group(
            tagged, "g", 100,
            [("n_occ", "descending"), ("w1", "ascending"), ("w2", "ascending")],
        ).take_all()
        involved = sorted({w for r in top for w in (r["w1"], r["w2"])})
        inv_arr = pa.array(involved, pa.string())
        cf_rows = uni.map_batches(
            lambda t: t.filter(pc.is_in(t["term"], value_set=inv_arr)),
            batch_format="pyarrow",
        ).take_all()
        cf = {r["term"]: r["cf"] for r in cf_rows}
        w1s, w2s, ns, pmis = [], [], [], []
        for r in sorted(top, key=lambda r: (-r["n_occ"], r["w1"], r["w2"])):
            c1, c2, n = cf[r["w1"]], cf[r["w2"]], r["n_occ"]
            ratio = float(n) * float(tuni) * float(tuni) / (
                float(tbi) * float(c1) * float(c2)
            )
            w1s.append(r["w1"])
            w2s.append(r["w2"])
            ns.append(n)
            pmis.append(int(round(1000000.0 * math.log(ratio))))
        return pa.table(
            {
                "w1": pa.array(w1s, pa.string()),
                "w2": pa.array(w2s, pa.string()),
                "n_occ": pa.array(ns, pa.int64()),
                "pmi_e6": pa.array(pmis, pa.int64()),
            }
        )

    def q_source_overlap(sf_dir: str):
        # source-pair vocabulary Jaccard (corpus-mix diagnostic):
        # distinct (source, token) -> bounded token-bucket pair kernel
        # (stages/textstats.py:source_vocab_overlap)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            source_vocab_overlap,
        )

        return source_vocab_overlap(_tbl(sf_dir, "documents", ["text", "source"]))

    def q_lang_id(sf_dir: str):
        return _stats(sf_dir).map_batches(
            lambda t: t.select(["doc_id", "en_hits", "de_hits", "fr_hits", "lang_pred"]),
            batch_format="pyarrow",
        )

    def q_lang_eval(sf_dir: str):
        """Language-ID evaluation: the (label, prediction) confusion
        matrix of the stopword-vote classifier against the corpus lang
        column — the classifier-eval analog of knn_lsh_recall
        (stages/textstats.LangEvalStage); one actor-pool pass + a
        (langs^2)-bounded groupby count."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            LangEvalStage,
        )

        return (
            _docs(sf_dir)
            .map_batches(LangEvalStage, batch_format="pyarrow", concurrency=4)
            .groupby(["lang", "lang_pred"])
            .aggregate(Count(alias_name="n_docs"))
        )

    def q_quality(sf_dir: str):
        return _stats(sf_dir).map_batches(
            lambda t: t.select(
                ["doc_id", "n_chars", "punct_chars", "stopword_ratio", "is_quality"]
            ),
            batch_format="pyarrow",
        )

    def q_fingerprint(sf_dir: str):
        # fp_md5 re-derived in SQL; fp_rolling (blake2b winnowing, not
        # SQL-expressible) checked via embedded per-doc VALUES computed
        # with the pure function — the sketch-oracle pattern
        return _stats(sf_dir).map_batches(
            lambda t: t.select(["doc_id", "fp_md5", "fp_rolling"]), batch_format="pyarrow"
        )

    def q_domain_mix(sf_dir: str):
        """Domain-mixing budget sample: per source, keep the
        deterministic hash-priority prefix of docs whose running n_chars
        stays <= 4000 (`stages/ops.budget_sample_per_group`). One hash
        shuffle on the bounded source key."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            budget_sample_per_group,
        )

        docs = _tbl(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
        return budget_sample_per_group(docs, "source", "n_chars", "doc_id", 4000)

    def q_dedup_chunks(sf_dir: str):
        """Chunk-level duplicate accounting (the paragraph/line-dedup
        analog over this single-line corpus): per-doc count of full
        8-token windows and of windows whose content recurs corpus-wide.
        Two narrow int64 shuffles (chunk-hash count + bucketed join);
        text never enters an exchange."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
            chunk_dedup_stats,
        )

        return chunk_dedup_stats(
            _docs(sf_dir).map_batches(
                lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
            )
        )

    def q_unigram_loglik(sf_dir: str):
        """Corpus-trained unigram LM surprisal per doc (the CCNet-style
        quality filter's shuffle-light analog): map-side unigram combine
        -> vocab-bounded groupby sum -> broadcast weight table ->
        shuffle-free scoring pass. Per-token weights are integer-
        quantized micros, so the per-doc sums are exact int64."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            unigram_loglik,
        )

        return unigram_loglik(
            _docs(sf_dir).map_batches(
                lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
            )
        )

    def q_keywords(sf_dir: str):
        """Top-3 tf-idf keywords per doc (document tagging; idf
        log10(N/df) pinned to Searcher.java:113). Integer-exact: idf is
        e6-quantized per TERM before the tf multiply, so scores are
        int64 arithmetic end to end. Map-side df combine + broadcast
        idf table + shuffle-free per-doc top-k."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            keyword_extract,
        )

        return keyword_extract(
            _docs(sf_dir).map_batches(
                lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
            )
        )

    def q_spell_correct(sf_dir: str):
        """Did-you-mean over the corpus vocabulary: deterministic
        misspellings of the top-cf terms, corrected by minimum edit
        distance against the full vocab (`stages/textstats.spell_correct`
        — all-terms lockstep DP; SQL twin uses levenshtein + window
        rank with the identical (dist, term) tie-break)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            spell_correct,
        )

        return spell_correct(
            _docs(sf_dir).map_batches(
                lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
            )
        )

    def q_pii_scrub(sf_dir: str):
        """PII detect + redact (emails / phones / IPv4): deterministic
        doc_id-derived PII injection (the word-salad corpus has none),
        then vectorized RE2 count + redact kernels
        (`stages/textstats.pii_scrub`). Shuffle-free; the oracle replays
        injection with CASE/lpad and redaction with nested
        regexp_replace(..., 'g') on the identical patterns."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            inject_pii,
            pii_scrub,
        )

        return (
            _docs(sf_dir)
            .map_batches(lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow")
            .map_batches(inject_pii, batch_format="pyarrow")
            .map_batches(pii_scrub, batch_format="pyarrow")
        )

    def q_bpe_count(sf_dir: str):
        # full SQL oracle: the lookahead in BPEISH_RE is equivalent, for
        # RE2-compatible whitespace, to the lookahead-free pattern plus
        # a correction term counted by a second regex (see oracle_sql;
        # proven by 5k-case fuzz + full-corpus check in tests)
        return _stats(sf_dir).map_batches(
            lambda t: t.select(["doc_id", "n_bpe_tokens"]),
            batch_format="pyarrow",
        )

    # ---------------- dedup ----------------

    def q_dedup_exact(sf_dir: str):
        return exact_dedup_summary(_docs(sf_dir))

    def q_shingle_coverage(sf_dir: str):
        # per-doc duplicate-shingle coverage (near-dup mass): bounded
        # shingle-bucket exchange, per-doc partials
        # (stages/dedup.py:shingle_dup_coverage)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
            shingle_dup_coverage,
        )

        return shingle_dup_coverage(_tbl(sf_dir, "documents", ["doc_id", "text"]))

    def q_dedup_source_report(sf_dir: str):
        # per-source exact-dup curation report (stages/dedup.
        # dedup_source_report — one md5-bucket exchange, per-source
        # partial counts)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
            dedup_source_report,
        )

        return dedup_source_report(
            _tbl(sf_dir, "documents", ["doc_id", "text", "source"])
        )

    def q_dedup_losers(sf_dir: str):
        # the reference's canonicalURL pointer column
        # (Crawler.java:183-185): (loser doc, canonical doc) pairs,
        # bucket-vectorized (bounded content-hash buckets, one sorted
        # run-detect pass per bucket); over the synthetic pages corpus
        # (~3% exact duplicates — the driver documents table has none)
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
            hash64_array,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
            exact_dup_losers,
        )

        def add_id(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": pa.array(hash64_array(t["url"].to_pylist())),
                    "text": t["text"],
                }
            )

        pages = rd.read_parquet(
            pages_for_sf_dir(sf_dir), columns=["url", "text"]
        ).map_batches(add_id, batch_format="pyarrow")
        return exact_dup_losers(pages)

    def q_dedup_jaccard(sf_dir: str):
        # jaccard is a SINGLE int/int division — bit-identical in any
        # IEEE engine, no rounding needed (or wanted)
        return ngram_jaccard_pairs(_docs(sf_dir), n=3, threshold=JACCARD_THR)

    def q_dedup_clusters(sf_dir: str):
        # connected components of the n-gram-Jaccard pair graph — the
        # keep-one-per-CLUSTER closure over pairwise dedup output
        # (min-label propagation, task-per-block; oracle unrolls the
        # same CLUSTER_ROUNDS rounds in SQL)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
            dup_clusters,
        )

        pairs = ngram_jaccard_pairs(_docs(sf_dir), n=3, threshold=JACCARD_THR)
        return dup_clusters(pairs, rounds=CLUSTER_ROUNDS)

    def q_dedup_cluster_cap(sf_dir: str):
        # cluster-capped curation: at most 2 docs kept per near-dup
        # cluster (lowest doc_ids win) — the keep-N-representatives
        # rule over the connected components
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
            cluster_cap_marks,
            dup_clusters,
        )

        pairs = ngram_jaccard_pairs(_docs(sf_dir), n=3, threshold=JACCARD_THR)
        return cluster_cap_marks(dup_clusters(pairs, rounds=CLUSTER_ROUNDS), cap=2)

    def q_dedup_minhash(sf_dir: str):
        return minhash_lsh_pairs(_docs(sf_dir), est_threshold=0.2)

    def q_dedup_simhash(sf_dir: str):
        return simhash_pairs(_docs(sf_dir), max_hamming=3)

    def q_dedup_eval(sf_dir: str) -> pa.Table:
        """Sketch quality evaluation (the dedup analog of
        ``knn_lsh_recall``): for every EXACT n-gram-Jaccard duplicate
        pair, did the MinHash-LSH path surface it? Both inputs are the
        distributed ops; the join runs on their bounded pair outputs.
        A `found=false` row is a sketch miss, measurable per pair;
        the sketch runs a TIGHT estimator cut (est >= 0.97) so the
        miss branch is non-vacuous at fixture scale — the
        band-collision recall itself is ~1 here."""
        exact = ngram_jaccard_pairs(
            _docs(sf_dir), n=3, threshold=JACCARD_THR
        ).take_all()
        sketch = minhash_lsh_pairs(_docs(sf_dir), est_threshold=0.97).take_all()
        sk = {(int(r["doc_a"]), int(r["doc_b"])) for r in sketch}
        rows = sorted(
            (int(r["doc_a"]), int(r["doc_b"]), float(r["jaccard"])) for r in exact
        )
        return pa.table(
            {
                "doc_a": pa.array([a for a, _b, _j in rows], pa.int64()),
                "doc_b": pa.array([b for _a, b, _j in rows], pa.int64()),
                "jaccard": pa.array([j for _a, _b, j in rows], pa.float64()),
                "found": pa.array([(a, b) in sk for a, b, _j in rows], pa.bool_()),
            }
        )

    # ---------------- similarity search ----------------

    def _query_matrix(sf_dir: str):
        import pyarrow.parquet as pq

        t = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
        )
        t = t.filter(pc.less(t["vec_id"], KNN_QUERIES))
        ids = t["vec_id"].to_numpy()
        order = np.argsort(ids)
        m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)[order]
        return ids[order], m

    def q_knn(sf_dir: str):
        qids, qm = _query_matrix(sf_dir)
        out = knn_brute_force(_tbl(sf_dir, "embeddings"), qm, k=KNN_K)

        def remap(t: pa.Table) -> pa.Table:
            mapped = pc.take(pa.array(qids, pa.int64()), t["query_id"])
            return t.set_column(t.schema.get_field_index("query_id"), "query_id", mapped)

        return out.map_batches(remap, batch_format="pyarrow")

    def q_knn_matryoshka(sf_dir: str):
        # Matryoshka retrieval: exact cosine top-k on the FIRST 16 of
        # 64 components (stages/ann.py:knn_brute_force dims=16) — the
        # MRL coarse-search pattern: 4x fewer FLOPs and bytes per probe
        qids, qm = _query_matrix(sf_dir)
        out = knn_brute_force(_tbl(sf_dir, "embeddings"), qm, k=KNN_K, dims=16)

        def remap(t: pa.Table) -> pa.Table:
            mapped = pc.take(pa.array(qids, pa.int64()), t["query_id"])
            return t.set_column(t.schema.get_field_index("query_id"), "query_id", mapped)

        return out.map_batches(remap, batch_format="pyarrow")

    def q_embedding_centroids(sf_dir: str):
        # per-label exact integer centroid components (stages/ann.py:
        # grouped_centroids — map-side reduceat combine, ONE narrow
        # groupby over (label, dim) partials)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
            grouped_centroids,
        )

        return grouped_centroids(
            _tbl(sf_dir, "embeddings", ["label", "embedding"]), "label", "embedding"
        )

    def q_knn_filtered(sf_dir: str):
        # metadata-filtered vector search: exact top-k among label==3
        # vectors only (stages/ann.py:knn_filtered — pre-filter fused
        # into the scan, recall 1.0 by construction)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
            knn_filtered,
        )

        qids, qm = _query_matrix(sf_dir)
        out = knn_filtered(
            _tbl(sf_dir, "embeddings"), qm, k=KNN_K, filter_col="label", filter_value=3
        )

        def remap(t: pa.Table) -> pa.Table:
            mapped = pc.take(pa.array(qids, pa.int64()), t["query_id"])
            return t.set_column(t.schema.get_field_index("query_id"), "query_id", mapped)

        return out.map_batches(remap, batch_format="pyarrow")

    def q_basket_pairs(sf_dir: str):
        # frequently-bought-together: top-20 part pairs by distinct-
        # order support (stages/ops.py:grouped_cooccur_topk — bounded
        # order-bucket shuffle, vectorized triu pair emission).
        # Caller audit (round-5 advice): the default raise-on-oversize
        # is correct here — TPC-H orders hold <= 7 line items, far under
        # max_group_items, and the SQL twin is uncapped, so silent
        # truncation would be an oracle mismatch, never intended.
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            grouped_cooccur_topk,
        )

        return grouped_cooccur_topk(
            _tbl(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]),
            "l_orderkey",
            "l_partkey",
            k=20,
        )

    def q_mutual_knn(sf_dir: str):
        # reciprocal nearest neighbours (k=5): the high-precision
        # near-dup signal — block-pair candidate generation (no driver
        # materialization), per-query merge, both-directions groupby
        # (stages/ann.py:mutual_knn_pairs)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
            mutual_knn_pairs,
        )

        return mutual_knn_pairs(_tbl(sf_dir, "embeddings", ["vec_id", "embedding"]), k=5)

    def q_embedding_dim_stats(sf_dir: str):
        # per-dimension exact moments (feature-standardization inputs):
        # one streaming pass, d-bounded groupby
        # (stages/ann.py:embedding_dim_stats)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
            embedding_dim_stats,
        )

        return embedding_dim_stats(_tbl(sf_dir, "embeddings", ["embedding"]))

    def q_knn_range(sf_dir: str):
        # cosine RANGE query (radius 0.30): shuffle-free per-block
        # threshold filter, no top-k merge (stages/ann.py:
        # knn_range_search); same broadcast query matrix as q_knn
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
            knn_range_search,
        )

        qids, qm = _query_matrix(sf_dir)
        out = knn_range_search(
            _tbl(sf_dir, "embeddings"), qm, threshold_e6=300_000
        )

        def remap(t: pa.Table) -> pa.Table:
            mapped = pc.take(pa.array(qids, pa.int64()), t["query_id"])
            return t.set_column(t.schema.get_field_index("query_id"), "query_id", mapped)

        return out.map_batches(remap, batch_format="pyarrow")

    def q_near_dups(sf_dir: str):
        # auto cutover (stages/ann.py): exact all-pairs <= NEAR_DUP_EXACT_MAX
        # rows, banded-LSH + per-bucket exact verify above — the oracle
        # SQL replays whichever side the sf dir's row count selects
        return embedding_near_dup_pairs_auto(
            _tbl(sf_dir, "embeddings"),
            threshold=NEAR_DUP_THR,
            exact_max_rows=NEAR_DUP_EXACT_MAX,
            num_bands=NEAR_DUP_BANDS,
        )

    def q_knn_pq(sf_dir: str):
        # product-quantization ANN (ADC + exact re-rank): m=8 x 16-code
        # int64 codebooks trained on the id-gated sample, per-query
        # distance-table lookups, exact L2 re-rank of the global ADC
        # top-40 shortlist — the memory-bound scale path beyond
        # IVF/LSH; the oracle replays assignment + ADC + shortlist +
        # re-rank from embedded codebooks
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
            pq_topk,
        )

        return pq_topk(
            _tbl(sf_dir, "embeddings", ["vec_id", "embedding"]),
            m=8,
            k_codes=16,
            iters=2,
            rerank=4,
            n_queries=KNN_QUERIES,
            k=KNN_K,
        )

    def q_knn_ivfpq(sf_dir: str):
        # IVF-PQ (coarse integer k-means + PQ on residuals + ADC over
        # probed lists + exact re-rank) — the FAISS-style composition
        # that serves at 100 TB; the oracle replays coarse assignment,
        # residual codes, probe sets, ADC, shortlist, and re-rank from
        # embedded coarse + codebook literals
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
            ivfpq_topk,
        )

        return ivfpq_topk(
            _tbl(sf_dir, "embeddings", ["vec_id", "embedding"]),
            nlist=8,
            nprobe=3,
            m=8,
            k_codes=16,
            iters=2,
            rerank=4,
            n_queries=KNN_QUERIES,
            k=KNN_K,
        )

    def q_knn_ivf(sf_dir: str):
        # rows-only: IVF-partitioned approximate variant — recall vs
        # exact is asserted in tests/test_ann.py, not an equality oracle
        qids, qm = _query_matrix(sf_dir)
        out = ivf_knn(_tbl(sf_dir, "embeddings"), qm, k=KNN_K, nlist=32, nprobe=6)

        def remap(t: pa.Table) -> pa.Table:
            mapped = pc.take(pa.array(qids, pa.int64()), t["query_id"])
            return t.set_column(t.schema.get_field_index("query_id"), "query_id", mapped)

        return out.map_batches(remap, batch_format="pyarrow")

    def q_knn_lsh(sf_dir: str):
        # rows-only: approximate (bucketed) variant — recall vs exact is
        # asserted in tests/test_ann.py, not an equality oracle
        qids, qm = _query_matrix(sf_dir)
        out = lsh_knn(_tbl(sf_dir, "embeddings"), qm, k=KNN_K, num_planes=6)

        def remap(t: pa.Table) -> pa.Table:
            mapped = pc.take(pa.array(qids, pa.int64()), t["query_id"])
            return t.set_column(t.schema.get_field_index("query_id"), "query_id", mapped)

        return out.map_batches(remap, batch_format="pyarrow")

    def q_knn_recall(sf_dir: str) -> pa.Table:
        """ANN quality evaluation: per query, recall@k of the
        hyperplane-LSH path against exact brute force (|approx top-k ∩
        exact top-k|). Both inputs are the distributed ops; the overlap
        count runs on their bounded (queries x k)-row outputs."""
        qids, qm = _query_matrix(sf_dir)
        exact = knn_brute_force(_tbl(sf_dir, "embeddings"), qm, k=KNN_K).take_all()
        approx = lsh_knn(
            _tbl(sf_dir, "embeddings"), qm, k=KNN_K, num_planes=6
        ).take_all()
        ex: dict[int, set[int]] = {}
        ap: dict[int, set[int]] = {}
        for r in exact:
            ex.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
        for r in approx:
            ap.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
        out_q, out_h = [], []
        for qi in sorted(ex):
            out_q.append(int(qids[qi]))
            out_h.append(len(ex[qi] & ap.get(qi, set())))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "n_hits": pa.array(out_h, pa.int64()),
                "k": pa.array([KNN_K] * len(out_q), pa.int64()),
            }
        )

    def q_matryoshka_recall(sf_dir: str) -> pa.Table:
        """Matryoshka trade-off evaluation: per query, recall@k of the
        16-dim-prefix ranking against the full 64-dim exact top-k —
        the number that tells you whether the 4x-cheaper prefix index
        is good enough as the coarse stage. Both rankings are the
        distributed op; the overlap runs on bounded (Q x k) outputs."""
        qids, qm = _query_matrix(sf_dir)
        full = knn_brute_force(_tbl(sf_dir, "embeddings"), qm, k=KNN_K).take_all()
        trunc = knn_brute_force(
            _tbl(sf_dir, "embeddings"), qm, k=KNN_K, dims=16
        ).take_all()
        fu: dict[int, set[int]] = {}
        tr: dict[int, set[int]] = {}
        for r in full:
            fu.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
        for r in trunc:
            tr.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
        out_q, out_h = [], []
        for qi in sorted(fu):
            out_q.append(int(qids[qi]))
            out_h.append(len(fu[qi] & tr.get(qi, set())))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "n_hits": pa.array(out_h, pa.int64()),
                "k": pa.array([KNN_K] * len(out_q), pa.int64()),
            }
        )

    # ---------------- relational (Flame operator inventory) ----------------

    def q_groupby_agg(sf_dir: str):
        # fixed-point cents (int64) quantized per VALUE BEFORE the
        # distributed Sum (half-away on a single 2-decimal value is
        # exact), so the aggregate is pure-integer — no dependence on
        # float summation order or the rint rounding mode (the
        # grouping-sets advice pattern, applied across the family)
        ds = _tbl(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "l_returnflag": t["l_returnflag"],
                    "l_linestatus": t["l_linestatus"],
                    "qty_e2": pc.round(
                        pc.multiply(t["l_quantity"], 100.0),
                        round_mode="half_towards_infinity",
                    ).cast(pa.int64()),
                    "price_e2": pc.round(
                        pc.multiply(t["l_extendedprice"], 100.0),
                        round_mode="half_towards_infinity",
                    ).cast(pa.int64()),
                }
            )

        agg = ds.map_batches(prep, batch_format="pyarrow").groupby(
            ["l_returnflag", "l_linestatus"]
        ).aggregate(
            Count(alias_name="n_rows"),
            Sum("qty_e2", alias_name="sum_qty_e2"),
            Sum("price_e2", alias_name="sum_price_e2"),
        )
        return agg.map_batches(
            lambda t: t.select(
                ["l_returnflag", "l_linestatus", "n_rows", "sum_qty_e2", "sum_price_e2"]
            ),
            batch_format="pyarrow",
        )

    def q_rollup(sf_dir: str):
        # GROUP BY ROLLUP(flag, status): ONE distributed aggregation at
        # the finest level; the coarser levels are re-aggregated from
        # that tiny result locally (group-count-bounded), never from a
        # second scan — the scale plan for hierarchical totals
        ds = _tbl(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

        def prep(t: pa.Table) -> pa.Table:
            # per-value e2 quantization BEFORE aggregation: integer
            # sums all the way up the hierarchy (grouping-sets pattern)
            return pa.table(
                {
                    "l_returnflag": t["l_returnflag"],
                    "l_linestatus": t["l_linestatus"],
                    "qty_e2": pc.round(
                        pc.multiply(t["l_quantity"], 100.0),
                        round_mode="half_towards_infinity",
                    ).cast(pa.int64()),
                }
            )

        finest = ds.map_batches(prep, batch_format="pyarrow").groupby(
            ["l_returnflag", "l_linestatus"]
        ).aggregate(Count(alias_name="n_rows"), Sum("qty_e2", alias_name="sum_qty_e2"))

        import pandas as pd

        # the finest level is group-count-bounded (6 rows here); one
        # local pass computes every coarser level
        df = finest.to_pandas()
        lvl1 = (
            df.groupby("l_returnflag", as_index=False)[["n_rows", "sum_qty_e2"]]
            .sum()
            .assign(l_linestatus=None)
        )
        lvl0 = pd.DataFrame(
            {
                "l_returnflag": [None],
                "l_linestatus": [None],
                "n_rows": [df["n_rows"].sum()],
                "sum_qty_e2": [df["sum_qty_e2"].sum()],
            }
        )
        allv = pd.concat([df, lvl1, lvl0], ignore_index=True)
        return pa.table(
            {
                "l_returnflag": pa.array(allv["l_returnflag"], pa.string()),
                "l_linestatus": pa.array(allv["l_linestatus"], pa.string()),
                "n_rows": pa.array(allv["n_rows"].astype("int64")),
                "sum_qty_e2": pa.array(allv["sum_qty_e2"].astype("int64")),
            }
        )

    def q_unpivot(sf_dir: str):
        # UNPIVOT/melt (the inverse of rel_pivot): lineitem's four
        # numeric measures go wide-to-long as (key, metric, value_e2)
        # in ONE vectorized map_batches — per batch the four column
        # slices concatenate (no Python row loop, no shuffle; output
        # rows = 4x input but each row is 3 narrow columns)
        metrics = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

        def melt(t: pa.Table) -> pa.Table:
            n = t.num_rows
            keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
            lines = t["l_linenumber"].to_numpy(zero_copy_only=False)
            out_k = np.tile(keys, len(metrics))
            out_l = np.tile(lines, len(metrics))
            out_m = np.repeat(np.array(metrics, dtype=object), n)
            out_v = np.concatenate(
                [
                    np.rint(
                        t[m].to_numpy(zero_copy_only=False) * 100
                    ).astype(np.int64)
                    for m in metrics
                ]
            )
            return pa.table(
                {
                    "l_orderkey": pa.array(out_k),
                    "l_linenumber": pa.array(out_l),
                    "metric": pa.array(out_m.tolist(), pa.string()),
                    "value_e2": pa.array(out_v),
                }
            )

        return _tbl(
            sf_dir, "lineitem", ["l_orderkey", "l_linenumber"] + metrics
        ).map_batches(melt, batch_format="pyarrow")

    def q_pivot(sf_dir: str):
        # PIVOT events on event_type: two-pass plan — pass 1 discovers
        # the (bounded) distinct pivot values with a tiny distributed
        # groupby; pass 2 is ONE conditional aggregation: map_batches
        # adds an int64 indicator column per type (vectorized compare,
        # no Python row loop), then a single groupby(user_id) sums
        # them. Output rows = |users| x fixed columns — never wider
        # than the discovered type set, never a second scan per type.
        ds = _tbl(sf_dir, "events", ["user_id", "event_type", "value"])
        types = sorted(
            r["event_type"]
            for r in ds.groupby("event_type").aggregate(Count(alias_name="n")).take_all()
        )

        def add_indicators(t: pa.Table) -> pa.Table:
            et = t["event_type"]
            cols = {"user_id": t["user_id"]}
            for ty in types:
                cols[f"n_{ty}"] = pc.cast(pc.equal(et, ty), pa.int64())
            cols["value_e2_raw"] = pa.array(
                np.rint(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
            )
            return pa.table(cols)

        wide = ds.map_batches(add_indicators, batch_format="pyarrow")
        agg = wide.groupby("user_id").aggregate(
            *[Sum(f"n_{ty}", alias_name=f"n_{ty}") for ty in types],
            Sum("value_e2_raw", alias_name="value_sum_e2"),
        )
        return agg

    def q_cube(sf_dir: str):
        # GROUP BY CUBE(flag, status): like q_rollup, ONE distributed
        # aggregation at the finest level; all four grouping sets are
        # re-aggregated locally from that group-count-bounded result.
        ds = _tbl(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

        def prep(t: pa.Table) -> pa.Table:
            # per-value e2 quantization BEFORE aggregation (the
            # grouping-sets pattern): integer sums at every level
            return pa.table(
                {
                    "l_returnflag": t["l_returnflag"],
                    "l_linestatus": t["l_linestatus"],
                    "qty_e2": pc.round(
                        pc.multiply(t["l_quantity"], 100.0),
                        round_mode="half_towards_infinity",
                    ).cast(pa.int64()),
                }
            )

        finest = ds.map_batches(prep, batch_format="pyarrow").groupby(
            ["l_returnflag", "l_linestatus"]
        ).aggregate(Count(alias_name="n_rows"), Sum("qty_e2", alias_name="sum_qty_e2"))

        import pandas as pd

        df = finest.to_pandas()
        lvl_f = (
            df.groupby("l_returnflag", as_index=False)[["n_rows", "sum_qty_e2"]]
            .sum()
            .assign(l_linestatus=None)
        )
        lvl_s = (
            df.groupby("l_linestatus", as_index=False)[["n_rows", "sum_qty_e2"]]
            .sum()
            .assign(l_returnflag=None)
        )
        lvl0 = pd.DataFrame(
            {
                "l_returnflag": [None],
                "l_linestatus": [None],
                "n_rows": [df["n_rows"].sum()],
                "sum_qty_e2": [df["sum_qty_e2"].sum()],
            }
        )
        allv = pd.concat([df, lvl_f, lvl_s, lvl0], ignore_index=True)
        return pa.table(
            {
                "l_returnflag": pa.array(allv["l_returnflag"], pa.string()),
                "l_linestatus": pa.array(allv["l_linestatus"], pa.string()),
                "n_rows": pa.array(allv["n_rows"].astype("int64")),
                "sum_qty_e2": pa.array(allv["sum_qty_e2"].astype("int64")),
            }
        )

    def q_grouping_sets(sf_dir: str):
        """GROUP BY GROUPING SETS ((flag), (status)) — the generic
        multi-set sibling of rollup/cube (neither hierarchical nor the
        full power set): the two 1-D marginals only. Same physical
        plan as q_cube: ONE distributed finest-level aggregation, both
        requested sets re-aggregated locally from that group-count-
        bounded result; absent grouping columns are NULL. Quantities
        are quantized to int64 cents BEFORE aggregation (per-row
        half-away round of a single value — exact), so the distributed
        sum is pure-integer and independent of float associativity /
        rounding mode (same plan as rel_quantiles / rel_rfm)."""
        ds = _tbl(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "l_returnflag": t["l_returnflag"],
                    "l_linestatus": t["l_linestatus"],
                    "qty_e2": pc.round(
                        pc.multiply(t["l_quantity"], 100.0),
                        round_mode="half_towards_infinity",
                    ).cast(pa.int64()),
                }
            )

        finest = ds.map_batches(prep, batch_format="pyarrow").groupby(
            ["l_returnflag", "l_linestatus"]
        ).aggregate(Count(alias_name="n_rows"), Sum("qty_e2", alias_name="sum_qty_e2"))

        import pandas as pd

        df = finest.to_pandas()
        lvl_f = (
            df.groupby("l_returnflag", as_index=False)[["n_rows", "sum_qty_e2"]]
            .sum()
            .assign(l_linestatus=None)
        )
        lvl_s = (
            df.groupby("l_linestatus", as_index=False)[["n_rows", "sum_qty_e2"]]
            .sum()
            .assign(l_returnflag=None)
        )
        allv = pd.concat([lvl_f, lvl_s], ignore_index=True)
        return pa.table(
            {
                "l_returnflag": pa.array(allv["l_returnflag"], pa.string()),
                "l_linestatus": pa.array(allv["l_linestatus"], pa.string()),
                "n_rows": pa.array(allv["n_rows"].astype("int64")),
                "sum_qty_e2": pa.array(allv["sum_qty_e2"].astype("int64")),
            }
        )

    def q_broadcast_join(sf_dir: str):
        import pyarrow.parquet as pq

        orders = _tbl(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        cust = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
        ).rename_columns(["o_custkey", "c_mktsegment"])
        joined = broadcast_join(orders, cust, on="o_custkey")

        def prep(t: pa.Table) -> pa.Table:
            # per-value e2 quantization BEFORE the Sum: integer revenue
            return pa.table(
                {
                    "c_mktsegment": t["c_mktsegment"],
                    "price_e2": pc.round(
                        pc.multiply(t["o_totalprice"], 100.0),
                        round_mode="half_towards_infinity",
                    ).cast(pa.int64()),
                }
            )

        agg = joined.map_batches(prep, batch_format="pyarrow").groupby(
            "c_mktsegment"
        ).aggregate(Count(alias_name="n_orders"), Sum("price_e2", alias_name="revenue_e2"))
        return agg.map_batches(
            lambda t: t.select(["c_mktsegment", "n_orders", "revenue_e2"]),
            batch_format="pyarrow",
        )

    def q_string_agg(sf_dir: str):
        """Ordered string aggregation per group (the reference's
        foldByKey comma-concat accumulator, FlameWorker.java:223-270,
        made deterministic): per nation, the alphabetically ordered
        comma-joined supplier names. Broadcast dimension + ONE bounded
        key-bucket exchange with a fully vectorized per-bucket concat
        (``stages/ops.grouped_string_agg``)."""
        import pyarrow.parquet as pq

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            grouped_string_agg,
        )

        supp = _tbl(sf_dir, "supplier", ["s_nationkey", "s_name"])
        nation = pq.read_table(
            os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
        ).rename_columns(["s_nationkey", "n_name"])
        joined = broadcast_join(supp, nation, on="s_nationkey")
        return grouped_string_agg(joined, "n_name", "s_name", sep=",")

    def q_distinct(sf_dir: str):
        return distinct_on(
            _tbl(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"]),
            ["l_returnflag", "l_linestatus"],
        )

    def q_intersection(sf_dir: str):
        urgent = _tbl(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
            lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(["o_custkey"]),
            batch_format="pyarrow",
        )
        high = _tbl(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
            lambda t: t.filter(pc.equal(t["o_orderpriority"], "2-HIGH")).select(["o_custkey"]),
            batch_format="pyarrow",
        )
        return intersection(urgent, high, "o_custkey")

    def q_except(sf_dir: str):
        # distributed distinct set-difference (EXCEPT): customers with
        # an urgent order but NO high-priority order — intersection's
        # bucketed plan with the membership test inverted
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            except_distinct,
        )

        urgent = _tbl(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
            lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(["o_custkey"]),
            batch_format="pyarrow",
        )
        high = _tbl(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
            lambda t: t.filter(pc.equal(t["o_orderpriority"], "2-HIGH")).select(["o_custkey"]),
            batch_format="pyarrow",
        )
        return except_distinct(urgent, high, "o_custkey")

    def q_cogroup(sf_dir: str):
        orders = _tbl(sf_dir, "orders", ["o_custkey"]).map_batches(
            lambda t: t.rename_columns(["custkey"]), batch_format="pyarrow"
        )
        cust = _tbl(sf_dir, "customer", ["c_custkey"]).map_batches(
            lambda t: t.rename_columns(["custkey"]), batch_format="pyarrow"
        )
        # vectorized bucketed cogroup reduction (one Arrow group_by per
        # bucket, not one Python call per key)
        return cogroup_counts(
            orders, cust, "custkey", left_name="n_orders", right_name="n_customers"
        )

    def q_window_hour(sf_dir: str):
        ds = _tbl(sf_dir, "events", ["event_type", "ts", "value"])

        def add_hour_e2(t: pa.Table) -> pa.Table:
            # per-value e2 quantization BEFORE the Sum: integer totals
            return pa.table(
                {
                    "event_type": t["event_type"],
                    "hour": pc.floor_temporal(t["ts"], unit="hour"),
                    "value_e2": pc.round(
                        pc.multiply(t["value"], 100.0),
                        round_mode="half_towards_infinity",
                    ).cast(pa.int64()),
                }
            )

        agg = (
            ds.map_batches(add_hour_e2, batch_format="pyarrow")
            .groupby(["event_type", "hour"])
            .aggregate(Count(alias_name="n_events"), Sum("value_e2", alias_name="sum_value_e2"))
        )
        return agg.map_batches(
            lambda t: t.select(["event_type", "hour", "n_events", "sum_value_e2"]),
            batch_format="pyarrow",
        )

    def q_quality_percentile(sf_dir: str):
        """Per-language quality-score decile per document —
        ``stages/textstats.quality_percentile`` (exact rank()-1 based
        deciles via a bounded per-(lang, score_e6) histogram)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            quality_percentile,
        )

        return quality_percentile(
            _tbl(sf_dir, "documents", ["doc_id", "text", "lang"])
        )

    def q_grouped_mode(sf_dir: str):
        """Most frequent event_type per user (MODE aggregate,
        ties -> smaller value) — ``stages/ops.grouped_mode``."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            grouped_mode,
        )

        return grouped_mode(
            _tbl(sf_dir, "events", ["user_id", "event_type"]),
            "user_id",
            "event_type",
        )

    def q_funnel(sf_dir: str):
        """Ordered funnel view -> click -> purchase: users reaching
        each step in order — ``stages/ops.funnel_counts`` (one bounded
        user-bucket shuffle, vectorized greedy chain per bucket)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            funnel_counts,
        )

        return funnel_counts(
            _tbl(sf_dir, "events", ["user_id", "event_type", "ts"]),
            ["view", "click", "purchase"],
        )

    def q_stream_window(sf_dir: str):
        """Streaming watermark replay: per tumbling hour, on-time vs
        late event counts. ARRIVAL time simulates network delay
        deterministically — event time + hash64(event_id) % 4h of
        jitter (the generator's event_id order is perfectly
        ts-monotone, which would make the late path vacuous); an event
        is late iff it arrives > 1 h behind the running event-time
        high-water mark (``stages/ops.watermark_window_counts``)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
            hash64_array,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            watermark_window_counts,
        )

        jitter_mod = 14_400_000_000  # 4 h in us

        def add_arrival(t: pa.Table) -> pa.Table:
            micros = (
                t["ts"]
                .combine_chunks()
                .cast(pa.timestamp("us"))
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            jit = (
                hash64_array(str(i) for i in t["event_id"].to_pylist()) % jitter_mod
            )
            return t.append_column("__arrival", pa.array(micros + jit))

        ds = _tbl(sf_dir, "events", ["event_id", "ts"]).map_batches(
            add_arrival, batch_format="pyarrow"
        )
        return watermark_window_counts(
            ds,
            order_col=["__arrival", "event_id"],
            window_s=3600,
            delay_s=3600,
        )

    def q_retention(sf_dir: str):
        """Cohort retention (first-active epoch-day cohorts, day-k
        return counts) — ``stages/ops.retention_cohorts``."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            retention_cohorts,
        )

        return retention_cohorts(_tbl(sf_dir, "events", ["user_id", "ts"]))

    def q_grouped_distinct(sf_dir: str):
        """Exact count(DISTINCT user_id) per event_type —
        ``stages/ops.grouped_count_distinct`` (bounded-bucket pair
        dedup + associative partial-count Sum; no per-key Python)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            grouped_count_distinct,
        )

        return grouped_count_distinct(
            _tbl(sf_dir, "events", ["event_type", "user_id"]),
            "event_type",
            "user_id",
        ).map_batches(
            lambda t: pa.table(
                {"event_type": t["event_type"], "n_users": t["n_distinct"]}
            ),
            batch_format="pyarrow",
        )

    def q_topk_events(sf_dir: str):
        return (
            _tbl(sf_dir, "events", ["event_id", "value"])
            .sort(["value", "event_id"], descending=[True, False])
            .limit(100)
        )

    def q_fold(sf_dir: str) -> pa.Table:
        # global fold/aggregate (Flame fold, SURVEY §2.1 #13 — done with
        # a real partial+final combine instead of int-only addition)
        ds = _tbl(sf_dir, "lineitem", ["l_extendedprice"])

        def prep(t: pa.Table) -> pa.Table:
            # per-value e2 quantization BEFORE the fold: integer total
            return pa.table(
                {
                    "price_e2": pc.round(
                        pc.multiply(t["l_extendedprice"], 100.0),
                        round_mode="half_towards_infinity",
                    ).cast(pa.int64()),
                }
            )

        agg = ds.map_batches(prep, batch_format="pyarrow").aggregate(
            Count(alias_name="n_rows"), Sum("price_e2", alias_name="s")
        )
        return pa.table(
            {
                "n_rows": pa.array([int(agg["n_rows"])], pa.int64()),
                "sum_price_e2": pa.array([int(agg["s"])], pa.int64()),
            }
        )

    def q_sample(sf_dir: str):
        # deterministic key-based sample (Flame sample, SURVEY §2.1 #16,
        # made reproducible: membership is a pure function of the key)
        def pick(t: pa.Table) -> pa.Table:
            keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(keys % 10 == 0))

        return _tbl(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
            pick, batch_format="pyarrow"
        )

    def q_union(sf_dir: str):
        # union + grouped count (frontier-union analog, SURVEY §2.6)
        def keep(val: str):
            return lambda t: t.filter(pc.equal(t["o_orderpriority"], val))

        o = _tbl(sf_dir, "orders", ["o_orderpriority"])
        u = o.map_batches(keep("1-URGENT"), batch_format="pyarrow").union(
            o.map_batches(keep("2-HIGH"), batch_format="pyarrow")
        )
        return u.groupby("o_orderpriority").aggregate(Count(alias_name="n"))

    def q_shuffle_join(sf_dir: str):
        # big-big equi-join: ONE hash shuffle + Arrow C++ join per
        # bucket (replaces FlamePairRDD.join, FlameWorker.java:491-544)
        li = _tbl(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"]).map_batches(
            lambda t: t.rename_columns(["orderkey", "l_extendedprice"]),
            batch_format="pyarrow",
        )
        od = _tbl(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
            lambda t: t.rename_columns(["orderkey", "o_orderpriority"]),
            batch_format="pyarrow",
        )
        j = shuffle_join(
            li, od, "orderkey", left_cols=["l_extendedprice"], right_cols=["o_orderpriority"]
        )

        def prep(t: pa.Table) -> pa.Table:
            # per-value e2 quantization BEFORE the Sum: integer revenue
            return pa.table(
                {
                    "o_orderpriority": t["o_orderpriority"],
                    "price_e2": pc.round(
                        pc.multiply(t["l_extendedprice"], 100.0),
                        round_mode="half_towards_infinity",
                    ).cast(pa.int64()),
                }
            )

        agg = j.map_batches(prep, batch_format="pyarrow").groupby(
            "o_orderpriority"
        ).aggregate(Count(alias_name="n_items"), Sum("price_e2", alias_name="rev_e2"))
        return agg.map_batches(
            lambda t: t.select(["o_orderpriority", "n_items", "rev_e2"]),
            batch_format="pyarrow",
        )

    def q_rel_star(sf_dir: str):
        # TPC-H Q3-shaped star composition: dimension filter pushed to
        # the read, small side (segment customers) broadcast-joined into
        # orders map-side, ONE big-big shuffle join lineitem x orders,
        # exact integer cents-x-percent revenue (order-insensitive),
        # distributed sort + limit for the top 10 — the classic
        # filter/broadcast/shuffle/agg/topk pipeline in one query
        import pyarrow.parquet as pq
        from datetime import datetime

        cutoff = datetime(1998, 6, 1)
        cust = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"],
        )
        cust = (
            cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))
            .select(["c_custkey"])
            .rename_columns(["o_custkey"])
        )

        def od_prep(t: pa.Table) -> pa.Table:
            t = t.filter(pc.less(t["o_orderdate"], pa.scalar(cutoff)))
            return pa.table(
                {
                    "orderkey": t["o_orderkey"],
                    "o_custkey": t["o_custkey"],
                    "o_date_us": t["o_orderdate"].cast(pa.int64()),
                }
            )

        od = broadcast_join(
            _tbl(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
                od_prep, batch_format="pyarrow"
            ),
            cust,
            on="o_custkey",
        ).select_columns(["orderkey", "o_date_us"])

        def li_prep(t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cutoff)))
            ext = np.rint(
                t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            disc = np.rint(
                (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)) * 100
            ).astype(np.int64)
            return pa.table(
                {"orderkey": t["l_orderkey"], "rev_e4": pa.array(ext * disc)}
            )

        li = _tbl(
            sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
        ).map_batches(li_prep, batch_format="pyarrow")

        j = shuffle_join(li, od, "orderkey", left_cols=["rev_e4"], right_cols=["o_date_us"])
        agg = j.groupby("orderkey").aggregate(
            Sum("rev_e4", alias_name="revenue_e4"), Min("o_date_us", alias_name="o_date_us")
        )
        return agg.sort(["revenue_e4", "orderkey"], descending=[True, False]).limit(10)

    def q_supplier_rank(sf_dir: str):
        # top-3 suppliers by account balance per nation (exact cents,
        # deterministic ties) on the bounded topn kernel, nation names
        # broadcast-joined map-side
        import pyarrow.parquet as pq

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            topn_per_group,
        )

        nation = pq.read_table(
            os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
        )
        names = dict(
            zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
        )
        import ray as _ray

        names_ref = _ray.put(names)

        def prep(t: pa.Table) -> pa.Table:
            nn = _ray.get(names_ref)
            bal = np.rint(
                t["s_acctbal"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            return pa.table(
                {
                    "n_name": pa.array(
                        [nn[k] for k in t["s_nationkey"].to_pylist()], pa.string()
                    ),
                    "s_suppkey": t["s_suppkey"],
                    "acctbal_e2": pa.array(bal),
                }
            )

        return topn_per_group(
            _tbl(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"]).map_batches(
                prep, batch_format="pyarrow"
            ),
            "n_name",
            3,
            [("acctbal_e2", "descending"), ("s_suppkey", "ascending")],
        )

    def q_promo_share(sf_dir: str):
        # TPC-H Q14 shape: revenue share of ECONOMY-type parts in one
        # shipping month — the broadcast-dimension scan (part map via
        # ray.put, ONE lineitem pass, no shuffle at all). Exact-integer
        # numerator/denominator instead of the float percent.
        import pyarrow.parquet as pq
        from datetime import datetime

        import ray as _ray

        lo, hi = datetime(1998, 1, 1), datetime(1998, 7, 1)
        part = pq.read_table(
            os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
        )
        promo = {
            k
            for k, ty in zip(part["p_partkey"].to_pylist(), part["p_type"].to_pylist())
            if ty == "ECONOMY"
        }
        promo_ref = _ray.put(promo)

        def partials(t: pa.Table) -> pa.Table:
            pset = _ray.get(promo_ref)
            t = t.filter(
                pc.and_(
                    pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                    pc.less(t["l_shipdate"], pa.scalar(hi)),
                )
            )
            ext = np.rint(
                t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            disc = np.rint(
                (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)) * 100
            ).astype(np.int64)
            rev = ext * disc
            is_promo = np.array(
                [k in pset for k in t["l_partkey"].to_pylist()], dtype=bool
            )
            return pa.table(
                {
                    "promo_rev_e4": pa.array([int(rev[is_promo].sum())], pa.int64()),
                    "total_rev_e4": pa.array([int(rev.sum())], pa.int64()),
                }
            )

        agg = (
            _tbl(
                sf_dir,
                "lineitem",
                ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
            )
            .map_batches(partials, batch_format="pyarrow")
            .aggregate(
                Sum("promo_rev_e4", alias_name="p"), Sum("total_rev_e4", alias_name="t")
            )
        )
        return pa.table(
            {
                "promo_rev_e4": pa.array([agg["p"]], pa.int64()),
                "total_rev_e4": pa.array([agg["t"]], pa.int64()),
            }
        )

    def q_small_qty_share(sf_dir: str):
        # TPC-H Q17 shape — the correlated-average filter: lineitems
        # whose quantity is below 20% of their PART's average quantity,
        # total revenue + row count. Two passes over the fact table:
        # (1) map-side per-block (partkey -> sum_qty, cnt) partials,
        # merged in a BOUNDED bucket groupby (64 buckets, vectorized
        # combine per bucket — the per-part aggregate is dimension-
        # sized, never lineitem-sized) and broadcast via ray.put;
        # (2) one scan filtering 5*qty*cnt < sum_qty — the exact
        # integer form of qty < 0.2*avg (quantities are integral).
        import ray as _ray

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.shuffle import (
            hash_map_groups,
        )

        def partial_qty(t: pa.Table) -> pa.Table:
            pk = t["l_partkey"].to_numpy(zero_copy_only=False)
            qty = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)).astype(
                np.int64
            )
            u, inv = np.unique(pk, return_inverse=True)
            sq = np.zeros(u.size, np.int64)
            np.add.at(sq, inv, qty)
            c = np.bincount(inv, minlength=u.size).astype(np.int64)
            return pa.table(
                {
                    "pk": pa.array(u.astype(np.int64)),
                    "sq": pa.array(sq),
                    "c": pa.array(c),
                    "bucket": pa.array((u % 64).astype(np.int64)),
                }
            )

        def merge_bucket(g: pa.Table) -> pa.Table:
            pk = g["pk"].to_numpy(zero_copy_only=False)
            u, inv = np.unique(pk, return_inverse=True)
            sq = np.zeros(u.size, np.int64)
            np.add.at(sq, inv, g["sq"].to_numpy(zero_copy_only=False))
            c = np.zeros(u.size, np.int64)
            np.add.at(c, inv, g["c"].to_numpy(zero_copy_only=False))
            return pa.table(
                {"pk": pa.array(u), "sq": pa.array(sq), "c": pa.array(c)}
            )

        li = _tbl(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
        per_part = hash_map_groups(
            li.map_batches(partial_qty, batch_format="pyarrow").select_columns(
                ["pk", "sq", "c", "bucket"]
            ),
            "bucket",
            merge_bucket,
            num_partitions=16,
        ).take_all()
        pks = np.array([r["pk"] for r in per_part], np.int64)
        order = np.argsort(pks)
        pks = pks[order]
        sqs = np.array([r["sq"] for r in per_part], np.int64)[order]
        cnts = np.array([r["c"] for r in per_part], np.int64)[order]
        stats_ref = _ray.put((pks, sqs, cnts))

        def small_rev(t: pa.Table) -> pa.Table:
            pks_b, sqs_b, cnts_b = _ray.get(stats_ref)
            pk = t["l_partkey"].to_numpy(zero_copy_only=False)
            qty = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)).astype(
                np.int64
            )
            pos = np.searchsorted(pks_b, pk)
            keep = 5 * qty * cnts_b[pos] < sqs_b[pos]
            ext = np.rint(
                t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            return pa.table(
                {
                    "rev_e2": pa.array([int(ext[keep].sum())], pa.int64()),
                    "n_small": pa.array([int(keep.sum())], pa.int64()),
                }
            )

        agg = li.map_batches(small_rev, batch_format="pyarrow").aggregate(
            Sum("rev_e2", alias_name="r"), Sum("n_small", alias_name="n")
        )
        return pa.table(
            {
                "rev_e2": pa.array([agg["r"]], pa.int64()),
                "n_small": pa.array([agg["n"]], pa.int64()),
                "avg_yearly_e2": pa.array([agg["r"] // 7], pa.int64()),
            }
        )

    def q_tpch_q3(sf_dir: str):
        # TPC-H Q3 shape (shipping-priority): small-side customer
        # segment filter BROADCAST into the orders scan, big-big
        # lineitem x orders on the shared orderkey bucket join, exact
        # cents*percent integer revenue, distributed multi-key sort for
        # the top 10 (o_orderpriority stands in for o_shippriority —
        # the synthetic orders table carries priority, not shippriority)
        import pyarrow.parquet as pq
        import ray
        from datetime import datetime

        cut = datetime(1998, 7, 1)
        cust = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"],
        )
        keys = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))["c_custkey"]
        keys_ref = ray.put(pa.array(sorted(keys.to_pylist()), pa.int64()))

        def od_prep(t: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            t = t.filter(
                pc.and_(
                    pc.less(t["o_orderdate"], pa.scalar(cut)),
                    pc.is_in(t["o_custkey"], value_set=ks),
                )
            )
            return pa.table(
                {
                    "orderkey": t["o_orderkey"],
                    "o_date_us": t["o_orderdate"].cast(pa.int64()),
                    "o_orderpriority": t["o_orderpriority"],
                }
            )

        od = _tbl(
            sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
        ).map_batches(od_prep, batch_format="pyarrow")

        def li_prep(t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cut)))
            ext = np.rint(
                t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            disc = np.rint(
                (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)) * 100
            ).astype(np.int64)
            return pa.table(
                {"orderkey": t["l_orderkey"], "rev_e4": pa.array(ext * disc)}
            )

        li = _tbl(
            sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
        ).map_batches(li_prep, batch_format="pyarrow")

        j = shuffle_join(
            li, od, "orderkey", left_cols=["rev_e4"], right_cols=["o_date_us", "o_orderpriority"]
        )
        agg = j.groupby(["orderkey", "o_date_us", "o_orderpriority"]).aggregate(
            Sum("rev_e4", alias_name="revenue_e4")
        )
        top = agg.sort(
            ["revenue_e4", "o_date_us", "orderkey"], descending=[True, False, False]
        ).limit(10)
        t = pa.concat_tables([b for b in top.iter_batches(batch_format="pyarrow")])
        return t.select(["orderkey", "revenue_e4", "o_date_us", "o_orderpriority"])

    def q_tpch_q18(sf_dir: str):
        # TPC-H Q18 shape (large-volume customers): distributed
        # per-order quantity rollup, HAVING > 300 admits a tiny order
        # set, ONE bucket join back to orders, customer names mapped
        # from the broadcast dimension; whole qualifying set returned
        # (no LIMIT — the threshold bounds it)
        import pyarrow.parquet as pq
        import ray

        qty = (
            _tbl(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
            .map_batches(
                lambda t: pa.table(
                    {
                        "orderkey": t["l_orderkey"],
                        "qty_e2": pc.round(
                            pc.multiply(t["l_quantity"], 100.0),
                            round_mode="half_towards_infinity",
                        ).cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            .groupby("orderkey")
            .aggregate(Sum("qty_e2", alias_name="sum_qty_e2"))
            .map_batches(
                lambda t: t.filter(pc.greater(t["sum_qty_e2"], 300 * 100)),
                batch_format="pyarrow",
            )
        )

        cust = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
        )
        cust_ref = ray.put(cust)

        def od_prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "orderkey": t["o_orderkey"],
                    "o_custkey": t["o_custkey"],
                    "o_date_us": t["o_orderdate"].cast(pa.int64()),
                    "totalprice_e2": pc.round(
                        pc.multiply(t["o_totalprice"], 100.0),
                        round_mode="half_towards_infinity",
                    ).cast(pa.int64()),
                }
            )

        od = _tbl(
            sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
        ).map_batches(od_prep, batch_format="pyarrow")

        j = shuffle_join(
            qty,
            od,
            "orderkey",
            left_cols=["sum_qty_e2"],
            right_cols=["o_custkey", "o_date_us", "totalprice_e2"],
        )

        def add_name(t: pa.Table) -> pa.Table:
            c = ray.get(cust_ref)
            pos = pc.index_in(t["o_custkey"], value_set=c["c_custkey"].combine_chunks())
            # inner-join semantics: drop orders whose custkey has no
            # customer row (dangling FK) instead of emitting NULL c_name
            t = t.filter(pc.is_valid(pos))
            pos = pc.index_in(t["o_custkey"], value_set=c["c_custkey"].combine_chunks())
            return t.append_column("c_name", pc.take(c["c_name"].combine_chunks(), pos))

        out = j.map_batches(add_name, batch_format="pyarrow")
        return pa.concat_tables(
            [b for b in out.iter_batches(batch_format="pyarrow")]
        ).select(
            ["c_name", "o_custkey", "orderkey", "o_date_us", "totalprice_e2", "sum_qty_e2"]
        )

    def q_rel_star_q5(sf_dir: str):
        # TPC-H Q5 shape — the DEEP join chain (region -> nation ->
        # customer -> orders -> lineitem -> supplier): every dimension
        # is broadcast (region/nation/supplier/customer are tiny at any
        # realistic fanout — the star-schema rule), the single big-big
        # exchange is lineitem x orders, and the "local supplier" filter
        # (s_nationkey == c_nationkey) evaluates map-side against the
        # broadcast supplier map. Exact cents*percent integer revenue.
        import pyarrow.parquet as pq
        from datetime import datetime

        lo, hi = datetime(1996, 1, 1), datetime(1999, 1, 1)
        nation = pq.read_table(
            os.path.join(sf_dir, "nation.parquet"),
            columns=["n_nationkey", "n_name", "n_regionkey"],
        )
        region = pq.read_table(
            os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
        )
        rkeys = set(
            region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"].to_pylist()
        )
        nat = nation.filter(
            pc.is_in(nation["n_regionkey"], value_set=pa.array(sorted(rkeys)))
        )
        nat_name = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
        cust = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_nationkey"],
        )
        cust_nat = {
            c: n
            for c, n in zip(
                cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist()
            )
            if n in nat_name
        }
        supp = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_nationkey"],
        )
        supp_nat = dict(
            zip(supp["s_suppkey"].to_pylist(), supp["s_nationkey"].to_pylist())
        )
        import ray as _ray

        maps_ref = _ray.put((cust_nat, supp_nat, nat_name))

        def od_prep(t: pa.Table) -> pa.Table:
            cn, _sn, _nn = _ray.get(maps_ref)
            t = t.filter(
                pc.and_(
                    pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                    pc.less(t["o_orderdate"], pa.scalar(hi)),
                )
            )
            nk = [cn.get(c, -1) for c in t["o_custkey"].to_pylist()]
            out = pa.table(
                {
                    "orderkey": t["o_orderkey"],
                    "c_nat": pa.array(nk, pa.int64()),
                }
            )
            return out.filter(pc.not_equal(out["c_nat"], -1))

        od = _tbl(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
            od_prep, batch_format="pyarrow"
        )

        def li_prep(t: pa.Table) -> pa.Table:
            _cn, sn, _nn = _ray.get(maps_ref)
            ext = np.rint(
                t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            disc = np.rint(
                (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)) * 100
            ).astype(np.int64)
            s_nat = [sn.get(s, -1) for s in t["l_suppkey"].to_pylist()]
            return pa.table(
                {
                    "orderkey": t["l_orderkey"],
                    "s_nat": pa.array(s_nat, pa.int64()),
                    "rev_e4": pa.array(ext * disc),
                }
            )

        li = _tbl(
            sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
        ).map_batches(li_prep, batch_format="pyarrow")

        j = shuffle_join(
            li, od, "orderkey", left_cols=["s_nat", "rev_e4"], right_cols=["c_nat"]
        )

        def local_only(t: pa.Table) -> pa.Table:
            _cn, _sn, nn = _ray.get(maps_ref)
            t = t.filter(pc.equal(t["s_nat"], t["c_nat"]))
            names = [nn[k] for k in t["s_nat"].to_pylist()]
            return pa.table(
                {"n_name": pa.array(names, pa.string()), "rev_e4": t["rev_e4"]}
            )

        return (
            j.map_batches(local_only, batch_format="pyarrow")
            .groupby("n_name")
            .aggregate(Sum("rev_e4", alias_name="revenue_e4"))
        )

    def q_skew_join(sf_dir: str):
        # skew-defusing salted join: orders with >= 4 lineitems count as
        # HOT (their lineitem rows salt over 4 buckets; the order row is
        # replicated per salt) — same result set as a plain join, which
        # is exactly what the SQL oracle checks
        li = _tbl(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"]).map_batches(
            lambda t: t.rename_columns(["orderkey", "l_linenumber", "l_quantity"]),
            batch_format="pyarrow",
        )
        od = _tbl(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]).map_batches(
            lambda t: t.rename_columns(["orderkey", "o_orderstatus"]),
            batch_format="pyarrow",
        )
        j = skew_join(
            li,
            od,
            "orderkey",
            fact_cols=["l_linenumber", "l_quantity"],
            dim_cols=["o_orderstatus"],
            salt_col="l_linenumber",
            num_salts=4,
            hot_count_threshold=4,
        )
        def prep(t: pa.Table) -> pa.Table:
            # per-value e2 quantization BEFORE the Sum: integer totals
            return pa.table(
                {
                    "o_orderstatus": t["o_orderstatus"],
                    "q_e2": pc.round(
                        pc.multiply(t["l_quantity"], 100.0),
                        round_mode="half_towards_infinity",
                    ).cast(pa.int64()),
                }
            )

        agg = j.map_batches(prep, batch_format="pyarrow").groupby("o_orderstatus").aggregate(
            Count(alias_name="n_items"), Sum("q_e2", alias_name="qty_e2")
        )
        return agg.map_batches(
            lambda t: t.select(["o_orderstatus", "n_items", "qty_e2"]),
            batch_format="pyarrow",
        )

    def q_data_prep(sf_dir: str):
        # the capstone LLM-data chain: quality gate -> exact dedup ->
        # benchmark decontamination -> per-language corpus summary
        # (pipelines/data_prep.py); every stage is one of the verified
        # operators, wired as a single streaming plan
        from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.data_prep import (
            training_data_prep,
        )

        docs = _tbl(sf_dir, "documents", ["doc_id", "text"])
        bench = benchmark_shingle_set(docs, n=3, n_docs=20)
        return training_data_prep(docs, bench, min_hits=10)

    def q_data_prep_v2(sf_dir: str):
        # the v2 chain: v1 plus NEAR-dup removal — n-gram-Jaccard pair
        # components capped at ONE representative per cluster
        # (cluster_cap_marks), the FineWeb-style fuzzy-dedup step
        from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.data_prep import (
            training_data_prep,
        )

        docs = _tbl(sf_dir, "documents", ["doc_id", "text"])
        bench = benchmark_shingle_set(docs, n=3, n_docs=20)
        return training_data_prep(
            docs,
            bench,
            min_hits=10,
            near_dup_cap=1,
            jaccard_threshold=JACCARD_THR,
            cluster_rounds=CLUSTER_ROUNDS,
        )

    def q_decontaminate(sf_dir: str):
        # benchmark decontamination: per-doc count of distinct 3-gram
        # shingles shared with a broadcast benchmark set (here: the
        # shingles of the 20 lowest-doc_id documents, a deterministic
        # eval-set stand-in) — a pure broadcast-membership map, no
        # shuffle; the hygiene pass a 100-TB training-data pipeline
        # runs before training
        docs = _tbl(sf_dir, "documents", ["doc_id", "text"])
        bench = benchmark_shingle_set(docs, n=3, n_docs=20)
        return contamination_counts(docs, bench, n=3, min_hits=1)

    def q_kmv_distinct(sf_dir: str):
        # approximate COUNT(DISTINCT user_id) per event_type via the
        # KMV sketch (k=64) — deterministic md5 hash64, so the DuckDB
        # twin re-derives the identical estimate from the raw rows
        return kmv_distinct(
            _tbl(sf_dir, "events", ["event_type", "user_id"]),
            "event_type",
            "user_id",
            k=64,
        )

    def q_kmv_union(sf_dir: str):
        """KMV sketch algebra: distinct-user estimates for every
        event-type PAIR's union, computed from the per-type bottom-64
        sketches alone (mergeability — the reason KMV distributes);
        exact when both sides are unsaturated
        (stages/ops.kmv_union_estimates)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            kmv_union_estimates,
        )

        return kmv_union_estimates(
            _tbl(sf_dir, "events", ["event_type", "user_id"]),
            "event_type",
            "user_id",
            k=64,
        )

    def q_hll_registers(sf_dir: str):
        # HyperLogLog register table (2^8 buckets) for COUNT DISTINCT
        # user_id — the constant-memory cardinality sketch; registers
        # are integers so the SQL twin replays them exactly (the float
        # estimator is pytest-checked against exact distinct instead)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            hll_registers,
        )

        return hll_registers(_tbl(sf_dir, "events", ["user_id"]), "user_id", b=8)

    def q_hash_split(sf_dir: str):
        # leakage-safe deterministic train/val/test split: same key ->
        # same split on any partitioning; md5-prefix hash64 against
        # floor(cum_frac * 2^63) boundaries, replayed exactly in SQL
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            hash_split,
        )

        ds = hash_split(
            _tbl(sf_dir, "events", ["event_id"]),
            "event_id",
            SPLIT_FRACTIONS,
        )
        return ds.map_batches(
            lambda t: t.select(["event_id", "split"]), batch_format="pyarrow"
        )

    def q_zip_with_index(sf_dir: str):
        # Spark zipWithIndex parity: global row numbers from one sort +
        # a metadata-only prefix-sum over per-block counts
        return zip_with_index(
            _tbl(sf_dir, "events", ["event_id", "ts"]),
            ["ts", "event_id"],
            out_cols=["event_id"],
        )

    def q_left_join(sf_dir: str):
        # distributed LEFT OUTER join: every qualifying left row
        # survives (right columns typed-null when unmatched) — same ONE
        # bounded-bucket shuffle + per-bucket Arrow C++ join as
        # rel_outer_join; a key lives in exactly one bucket, so
        # per-bucket left outer == global left outer
        import pyarrow.dataset as pads
        import ray.data as rd

        cust = rd.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_acctbal"],
            filter=pads.field("c_acctbal") >= 5000.0,
        ).map_batches(
            lambda t: pa.table(
                {
                    "c_custkey": t["c_custkey"],
                    "acctbal_e2": pa.array(
                        np.rint(
                            t["c_acctbal"].to_numpy(zero_copy_only=False) * 100
                        ).astype(np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        urgent = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_orderkey"],
            filter=pads.field("o_orderpriority") == "1-URGENT",
        ).rename_columns({"o_custkey": "c_custkey"})
        return shuffle_join(
            cust,
            urgent,
            "c_custkey",
            left_cols=["acctbal_e2"],
            right_cols=["o_orderkey"],
            how="left outer",
        )

    def q_outer_join(sf_dir: str):
        # distributed FULL OUTER join (typed null padding — the join
        # variant the reference's co-partitioned inner join cannot
        # express, flame/FlameWorker.java:491-544): both sides filtered
        # so left-only AND right-only rows are non-vacuous; same ONE
        # bounded-bucket shuffle + Arrow C++ join per bucket as
        # shuffle_join(how="inner") — a key lives in exactly one
        # bucket, so per-bucket full outer == global full outer
        import pyarrow.dataset as pads
        import ray.data as rd

        cust = rd.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_acctbal"],
            filter=pads.field("c_acctbal") >= 5000.0,
        ).map_batches(
            lambda t: pa.table(
                {
                    "c_custkey": t["c_custkey"],
                    "acctbal_e2": pa.array(
                        np.rint(
                            t["c_acctbal"].to_numpy(zero_copy_only=False) * 100
                        ).astype(np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        urgent = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_orderkey"],
            filter=pads.field("o_orderpriority") == "1-URGENT",
        ).rename_columns({"o_custkey": "c_custkey"})
        return shuffle_join(
            cust,
            urgent,
            "c_custkey",
            left_cols=["acctbal_e2"],
            right_cols=["o_orderkey"],
            how="full outer",
        )

    def q_running_total(sf_dir: str):
        # per-user running totals + LAG delta (SQL window functions
        # over an entity's ordered history) — exact int64 via per-row
        # e2 quantization before the cumulative sum
        return running_totals(
            _tbl(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
            "user_id",
            ["ts", "event_id"],
            "value",
            id_cols=["event_id", "user_id"],
        )

    def q_profile(sf_dir: str):
        # table profiling (ANALYZE): exact per-column n/nulls/ndv/
        # min/max over orders — streaming partial+combine for the
        # bounds, one bounded-bucket distinct per column for NDV
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            profile_columns,
        )

        return profile_columns(
            lambda: _tbl(
                sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"]
            ),
            ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"],
        )

    def q_hopping_window(sf_dir: str):
        # hopping (sliding) 2h windows with a 1h hop over events —
        # vectorized map-side fan-out to k=2 windows, then the
        # partial+final combine groupby (stages/ops.py:
        # hopping_window_counts)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            hopping_window_counts,
        )

        return hopping_window_counts(
            _tbl(sf_dir, "events", ["ts", "value"]),
            window_s=7200,
            hop_s=3600,
        )

    def q_range_window_sum(sf_dir: str):
        # RANGE-frame windowed sum (1-day interval frame, all equal-ts
        # peers included): packed-key searchsorted + exclusive prefix
        # sum per user bucket (stages/temporal.py:range_window_sum)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.temporal import (
            range_window_sum,
        )

        return range_window_sum(
            _tbl(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        )

    def q_new_vs_returning(sf_dir: str):
        # daily new-vs-returning split: per-user first-day table (one
        # groupby Min), ONE bucketed big-big join back onto the event
        # stream, day-bounded rollup — the classic growth-analytics
        # self-join without a self-join
        def prep(t: pa.Table) -> pa.Table:
            day = pc.divide(t["ts"].cast(pa.int64()), 86_400_000_000)
            return pa.table({"user_id": t["user_id"], "day": day})

        ev = _tbl(sf_dir, "events", ["user_id", "ts"]).map_batches(
            prep, batch_format="pyarrow"
        )
        first = (
            ev.groupby("user_id")
            .aggregate(Min("day", alias_name="first_day"))
        )
        j = shuffle_join(ev, first, "user_id", left_cols=["day"], right_cols=["first_day"])

        def flags(t: pa.Table) -> pa.Table:
            d = t["day"].to_numpy(zero_copy_only=False)
            f = t["first_day"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "day": t["day"],
                    "one": pa.array(np.ones(len(t), np.int64)),
                    "new": pa.array((d == f).astype(np.int64)),
                    "ret": pa.array((d > f).astype(np.int64)),
                }
            )

        return (
            j.map_batches(flags, batch_format="pyarrow")
            .groupby("day")
            .aggregate(
                Sum("one", alias_name="n_events"),
                Sum("new", alias_name="n_new"),
                Sum("ret", alias_name="n_returning"),
            )
        )

    def q_late_events(sf_dir: str):
        # streaming watermark audit: deterministic jittered arrival
        # replay (seeded hash permutation), running event-time
        # high-water mark via a metadata-only distributed prefix scan,
        # per-type too-late counts under a 14-day watermark
        # (stages/temporal.py:late_event_counts)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.temporal import (
            late_event_counts,
        )

        return late_event_counts(
            _tbl(sf_dir, "events", ["event_id", "event_type", "ts"])
        )

    def q_epoch_shuffle(sf_dir: str):
        # deterministic seeded global shuffle (training-epoch document
        # order): a seeded md5 hash64 priority per doc, ONE
        # range-partitioning sort, metadata-only prefix-sum positions —
        # the epoch permutation is reproducible across runs, cluster
        # sizes and partitionings (vs ds.random_shuffle, which is not)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
            hash64,
        )

        def add_prio(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            prio = np.fromiter(
                (hash64(f"epoch7:{i}") for i in ids), dtype=np.int64, count=ids.size
            )
            return t.append_column("prio", pa.array(prio))

        docs = _tbl(sf_dir, "documents", ["doc_id"]).map_batches(
            add_prio, batch_format="pyarrow"
        )
        return zip_with_index(docs, ["prio", "doc_id"], out_cols=["doc_id"], idx_col="pos")

    def q_sample_replace(sf_dir: str):
        # with-replacement sample (Flame invokeSampling parity) —
        # deterministic Poisson multiplicity per key, fraction 1.5 so
        # duplicated rows actually appear in the output multiset
        return sample_with_replacement(
            _tbl(sf_dir, "orders", ["o_orderkey", "o_totalprice"]),
            1.5,
            "o_orderkey",
            seed=7,
        )

    def q_sessionize(sf_dir: str):
        # gap-based sessionization (30-min inactivity): the streaming-
        # window operator the reference lacks, expressed as ONE
        # groupby(user) with a vectorized per-group session assignment
        import ray.data as rd  # noqa: F401

        gap_us = 30 * 60 * 1_000_000

        def add_bucket(t: pa.Table) -> pa.Table:
            uid = t["user_id"].to_numpy(zero_copy_only=False)
            return t.append_column("ubucket", pa.array((uid % 64).astype(np.int64)))

        def sessions(group: pa.Table) -> pa.Table:
            # vectorized across ALL users of the bucket: one multi-key
            # sort, session breaks at user change or >gap inactivity
            idx = pc.sort_indices(
                group,
                sort_keys=[("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")],
            )
            g = group.take(idx)
            ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            uid = g["user_id"].to_numpy(zero_copy_only=False)
            new_sess = np.ones(ts.size, dtype=bool)
            new_sess[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
            starts = np.flatnonzero(new_sess)
            ends = np.append(starts[1:], ts.size) - 1
            counts = ends - starts + 1
            s_uid = uid[starts]
            first_of_user = np.ones(starts.size, dtype=bool)
            first_of_user[1:] = s_uid[1:] != s_uid[:-1]
            seq = np.arange(starts.size) - np.repeat(
                np.flatnonzero(first_of_user),
                np.diff(np.append(np.flatnonzero(first_of_user), starts.size)),
            )
            return pa.table(
                {
                    "user_id": pa.array(s_uid),
                    "session_seq": pa.array(seq.astype(np.int64)),
                    "n_events": pa.array(counts.astype(np.int64)),
                    "session_start": pa.array(ts[starts]).cast(pa.timestamp("us")),
                    "session_end": pa.array(ts[ends]).cast(pa.timestamp("us")),
                }
            )

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.shuffle import (
            hash_map_groups,
        )

        return hash_map_groups(
            _tbl(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
                add_bucket, batch_format="pyarrow", batch_size=None
            ),
            "ubucket",
            sessions,
        )

    def q_bounce_rate(sf_dir: str):
        # bounce rate by session-start hour: share of 30-min-gap
        # sessions with exactly ONE event — composes the rel_sessionize
        # kernel with a 24-bounded groupby (integer-micros rate)
        sess = q_sessionize(sf_dir)

        def to_hour(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "hour": pc.hour(t["session_start"]).cast(pa.int64()),
                    "one": pa.array(np.ones(len(t), np.int64)),
                    "bounce": pc.equal(t["n_events"], 1).cast(pa.int64()),
                }
            )

        agg = (
            sess.map_batches(to_hour, batch_format="pyarrow")
            .groupby("hour")
            .aggregate(
                Sum("one", alias_name="n_sessions"),
                Sum("bounce", alias_name="n_bounces"),
            )
        )
        return agg.map_batches(
            lambda t: t.append_column(
                "bounce_e6",
                pa.array(
                    1_000_000
                    * t["n_bounces"].to_numpy(zero_copy_only=False)
                    // t["n_sessions"].to_numpy(zero_copy_only=False)
                ),
            ),
            batch_format="pyarrow",
        )

    def q_scd2(sf_dir: str):
        """Slowly-changing-dimension type-2 snapshot build: per user,
        collapse consecutive runs of equal event_type (ordered by ts,
        event_id) into validity intervals (valid_from inclusive,
        valid_to = next run's start, NULL while current) with a
        per-user version counter — the dimension-table construction
        every warehouse load needs. Same 64-way user bucket + ONE
        vectorized multi-user run detection as rel_sessionize; no
        per-user Python."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.shuffle import (
            hash_map_groups,
        )

        def add_bucket(t: pa.Table) -> pa.Table:
            uid = t["user_id"].to_numpy(zero_copy_only=False)
            return t.append_column("ubucket", pa.array((uid % 64).astype(np.int64)))

        def scd2_of_bucket(group: pa.Table) -> pa.Table:
            idx = pc.sort_indices(
                group,
                sort_keys=[
                    ("user_id", "ascending"),
                    ("ts", "ascending"),
                    ("event_id", "ascending"),
                ],
            )
            g = group.take(idx)
            ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            uid = g["user_id"].to_numpy(zero_copy_only=False)
            et = g["event_type"].combine_chunks().dictionary_encode()
            code = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            if ts.size == 0:
                return pa.table(
                    {
                        "user_id": pa.array([], pa.int64()),
                        "version": pa.array([], pa.int64()),
                        "event_type": pa.array([], pa.string()),
                        "valid_from": pa.array([], pa.timestamp("us")),
                        "valid_to": pa.array([], pa.timestamp("us")),
                        "n_events": pa.array([], pa.int64()),
                    }
                )
            brk = np.ones(ts.size, dtype=bool)
            brk[1:] = (uid[1:] != uid[:-1]) | (code[1:] != code[:-1])
            starts = np.flatnonzero(brk)
            ends = np.append(starts[1:], ts.size) - 1
            n_events = (ends - starts + 1).astype(np.int64)
            s_uid = uid[starts]
            first_of_user = np.ones(starts.size, dtype=bool)
            first_of_user[1:] = s_uid[1:] != s_uid[:-1]
            version = np.arange(starts.size) - np.repeat(
                np.flatnonzero(first_of_user),
                np.diff(np.append(np.flatnonzero(first_of_user), starts.size)),
            )
            valid_from = ts[starts]
            # next run's start within the same user; the idiomatic SCD-2
            # far-future sentinel (9999-12-31) marks the current row —
            # a NULL here would be hash-ambiguous across engines
            sentinel_us = 253402214400000000  # 9999-12-31T00:00:00 epoch-us
            nxt = np.full(starts.size, sentinel_us, dtype=np.int64)
            if starts.size > 1:
                nxt[:-1] = valid_from[1:]
            same_user = np.zeros(starts.size, dtype=bool)
            same_user[:-1] = s_uid[1:] == s_uid[:-1]
            valid_to = pc.if_else(
                pa.array(same_user), pa.array(nxt), pa.scalar(sentinel_us, pa.int64())
            )
            return pa.table(
                {
                    "user_id": pa.array(s_uid),
                    "version": pa.array(version.astype(np.int64)),
                    "event_type": et.dictionary.take(pa.array(code[starts])).cast(
                        pa.string()
                    ),
                    "valid_from": pa.array(valid_from).cast(pa.timestamp("us")),
                    "valid_to": valid_to.cast(pa.timestamp("us")),
                    "n_events": pa.array(n_events),
                }
            )

        return hash_map_groups(
            _tbl(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"]).map_batches(
                add_bucket, batch_format="pyarrow", batch_size=None
            ),
            "ubucket",
            scd2_of_bucket,
        )

    def q_session_paths(sf_dir: str):
        """Top-10 session PATHS (the clickstream journeys report): the
        30-min gap sessions' ordered event-type sequences, truncated to
        the first 8 events, '>'-joined, counted corpus-wide. Same
        64-way user bucket + vectorized multi-user session assignment
        as rel_sessionize; path strings assemble via one ListArray +
        binary_join per bucket (no per-session Python), per-bucket
        combine, then a tiny global count + bounded top-10."""
        from ray.data.aggregate import Sum

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            topn_per_group,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.shuffle import (
            hash_map_groups,
        )

        gap_us = 30 * 60 * 1_000_000

        def add_bucket(t: pa.Table) -> pa.Table:
            uid = t["user_id"].to_numpy(zero_copy_only=False)
            return t.append_column("ubucket", pa.array((uid % 64).astype(np.int64)))

        def paths_of_bucket(group: pa.Table) -> pa.Table:
            idx = pc.sort_indices(
                group,
                sort_keys=[
                    ("user_id", "ascending"),
                    ("ts", "ascending"),
                    ("event_id", "ascending"),
                ],
            )
            g = group.take(idx)
            ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            uid = g["user_id"].to_numpy(zero_copy_only=False)
            if ts.size == 0:
                return pa.table(
                    {
                        "path": pa.array([], pa.string()),
                        "n": pa.array([], pa.int64()),
                    }
                )
            new_sess = np.ones(ts.size, dtype=bool)
            new_sess[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
            starts = np.flatnonzero(new_sess)
            counts = np.diff(np.append(starts, ts.size))
            pos = np.arange(ts.size) - np.repeat(starts, counts)
            keep = pos < 8
            kept_counts = np.minimum(counts, 8)
            offsets = np.concatenate(([0], np.cumsum(kept_counts)))
            types = g["event_type"].take(pa.array(np.flatnonzero(keep)))
            la = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), types.combine_chunks()
            )
            t = pa.table({"path": pc.binary_join(la, ">")})
            agg = t.group_by(["path"]).aggregate([([], "count_all")])
            return pa.table(
                {"path": agg["path"], "n": agg["count_all"].cast(pa.int64())}
            )

        partials = hash_map_groups(
            _tbl(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]).map_batches(
                add_bucket, batch_format="pyarrow", batch_size=None
            ),
            "ubucket",
            paths_of_bucket,
        )
        totals = partials.groupby("path").aggregate(Sum("n", alias_name="n_sessions"))
        tagged = totals.map_batches(
            lambda t: t.append_column("g", pa.array(np.zeros(t.num_rows, np.int64))),
            batch_format="pyarrow",
        )
        top = topn_per_group(
            tagged, "g", 10, [("n_sessions", "descending"), ("path", "ascending")]
        )
        return top.map_batches(
            lambda t: t.select(["path", "n_sessions"]), batch_format="pyarrow"
        )

    def q_dense_hourly(sf_dir: str):
        """Dense zero-filled hourly counts per event type (the
        reporting/alerting primitive: a missing bucket must read 0, not
        vanish): ONE distributed (type, hour) count groupby, a tiny
        Min/Max span aggregate, then the bounded grid x left-join is
        assembled from those aggregates (hours-span x types rows — the
        dense output itself, so no distributed work is skipped)."""
        from ray.data.aggregate import Count as _Count

        ds = _tbl(sf_dir, "events", ["event_type", "ts"])

        def hourify(t: pa.Table) -> pa.Table:
            hr = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // (
                3_600 * 1_000_000
            )
            return pa.table({"event_type": t["event_type"], "hr": pa.array(hr)})

        hours = ds.map_batches(hourify, batch_format="pyarrow")
        cnt = {
            (r["event_type"], r["hr"]): r["n"]
            for r in hours.groupby(["event_type", "hr"])
            .aggregate(_Count(alias_name="n"))
            .take_all()
        }
        # the span is exactly the key range of the counts — no second scan
        hrs = [k[1] for k in cnt]
        lo, hi = (min(hrs), max(hrs)) if hrs else (0, -1)
        types = sorted({k[0] for k in cnt})
        out_t, out_h, out_n = [], [], []
        for et in types:
            for hr in range(lo, hi + 1):
                out_t.append(et)
                out_h.append(hr)
                out_n.append(cnt.get((et, hr), 0))
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "hr": pa.array(out_h, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    def q_streak(sf_dir: str):
        """Longest consecutive-day activity streak per user — the
        classic gaps-and-islands problem. Per user bucket: distinct
        active days (epoch days, exact integers), one sort, run
        detection on day-diff == 1, max run length. The SQL twin is
        the canonical day - row_number() island grouping."""

        def add_bucket(t: pa.Table) -> pa.Table:
            uid = t["user_id"].to_numpy(zero_copy_only=False)
            days = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // (
                86_400 * 1_000_000
            )
            return pa.table(
                {
                    "user_id": t["user_id"],
                    "day": pa.array(days),
                    "ubucket": pa.array((uid % 64).astype(np.int64)),
                }
            )

        def streaks(group: pa.Table) -> pa.Table:
            idx = pc.sort_indices(
                group,
                sort_keys=[("user_id", "ascending"), ("day", "ascending")],
            )
            g = group.take(idx)
            uid = g["user_id"].to_numpy(zero_copy_only=False)
            day = g["day"].to_numpy(zero_copy_only=False)
            # distinct (user, day)
            keep = np.ones(uid.size, dtype=bool)
            keep[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])
            uid, day = uid[keep], day[keep]
            # island break: user change or day gap > 1
            brk = np.ones(uid.size, dtype=bool)
            brk[1:] = (uid[1:] != uid[:-1]) | ((day[1:] - day[:-1]) != 1)
            starts = np.flatnonzero(brk)
            lens = np.diff(np.append(starts, uid.size))
            su = uid[starts]
            # max run per user (runs of a user are contiguous)
            ufirst = np.ones(su.size, dtype=bool)
            ufirst[1:] = su[1:] != su[:-1]
            out_u, out_s = [], []
            i = 0
            for j in list(np.flatnonzero(ufirst)[1:]) + [su.size]:
                out_u.append(int(su[i]))
                out_s.append(int(lens[i:j].max()))
                i = j
            return pa.table(
                {
                    "user_id": pa.array(out_u, pa.int64()),
                    "max_streak": pa.array(out_s, pa.int64()),
                }
            )

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.shuffle import (
            hash_map_groups,
        )

        return hash_map_groups(
            _tbl(sf_dir, "events", ["user_id", "ts"]).map_batches(
                add_bucket, batch_format="pyarrow", batch_size=None
            ),
            "ubucket",
            streaks,
        )

    def q_arg_extremes(sf_dir: str):
        """ARGMIN/ARGMAX aggregate: per event_type the event carrying
        the smallest and the largest value (ties broken by event_id —
        fully deterministic, unlike bare min_by/max_by). Map-side
        combine keeps only each batch's two extreme rows per type, so
        the shuffle carries <= 2 x types x blocks rows."""

        def local(t: pa.Table) -> pa.Table:
            idx = pc.sort_indices(
                t,
                sort_keys=[
                    ("event_type", "ascending"),
                    ("value", "ascending"),
                    ("event_id", "ascending"),
                ],
            )
            g = t.take(idx)
            et = g["event_type"].combine_chunks().dictionary_encode().indices.to_numpy(
                zero_copy_only=False
            )
            first = np.ones(et.size, dtype=bool)
            first[1:] = et[1:] != et[:-1]
            last = np.append(first[1:], True)
            return g.filter(pa.array(first | last))

        def extremes(group: pa.Table) -> pa.Table:
            g = local(group)  # same sort; first/last row per type
            et = g["event_type"].to_pylist()
            ids = g["event_id"].to_numpy(zero_copy_only=False)
            v = np.rint(g["value"].to_numpy(zero_copy_only=False) * 100).astype(
                np.int64
            )
            out_t, amin, amax, vmin, vmax = [], [], [], [], []
            i = 0
            while i < len(et):
                j = i
                while j + 1 < len(et) and et[j + 1] == et[i]:
                    j += 1
                out_t.append(et[i])
                amin.append(int(ids[i]))
                vmin.append(int(v[i]))
                amax.append(int(ids[j]))
                vmax.append(int(v[j]))
                i = j + 1
            return pa.table(
                {
                    "event_type": pa.array(out_t, pa.string()),
                    "argmin_id": pa.array(amin, pa.int64()),
                    "min_e2": pa.array(vmin, pa.int64()),
                    "argmax_id": pa.array(amax, pa.int64()),
                    "max_e2": pa.array(vmax, pa.int64()),
                }
            )

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.shuffle import (
            hash_map_groups,
        )

        return hash_map_groups(
            _tbl(sf_dir, "events", ["event_id", "event_type", "value"]).map_batches(
                local, batch_format="pyarrow"
            ),
            "event_type",
            extremes,
            num_partitions=5,
        )

    def q_decayed_sum(sf_dir: str):
        """Exponentially-decayed per-user engagement counters (the
        streaming freshness primitive): each event contributes
        value_e2 >> age_hours (a half-life of one hour as an EXACT
        integer shift — no float pow, so the sum is order-independent
        and the SQL twin replays it bit-for-bit). Age anchors on the
        corpus max timestamp (one tiny aggregate), then one vectorized
        map + one user groupby."""
        from ray.data.aggregate import Max, Sum

        ds = _tbl(sf_dir, "events", ["user_id", "ts", "value"])
        anchor = ds.aggregate(Max("ts"))["max(ts)"]
        anchor_us = int(pa.scalar(anchor, pa.timestamp("us")).cast(pa.int64()).as_py())

        def decay(t: pa.Table) -> pa.Table:
            v = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100).astype(
                np.int64
            )
            ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            age_h = np.minimum((anchor_us - ts) // 3_600_000_000, 62)
            return pa.table(
                {
                    "user_id": t["user_id"],
                    "decayed": pa.array(v >> age_h),
                }
            )

        return (
            ds.map_batches(decay, batch_format="pyarrow")
            .groupby("user_id")
            .aggregate(Sum("decayed", alias_name="decayed_sum"))
        )

    def q_forward_fill(sf_dir: str):
        """Per-user forward fill (time-series gap repair: an 'error'
        event's value is treated as missing and repaired from the
        user's most recent good reading; leading gaps stay null).
        Same 64-way user bucketing as sessionize; per bucket ONE sort +
        a fully vectorized last-valid-index accumulate that cannot
        cross a user boundary."""

        def add_bucket(t: pa.Table) -> pa.Table:
            uid = t["user_id"].to_numpy(zero_copy_only=False)
            return t.append_column("ubucket", pa.array((uid % 64).astype(np.int64)))

        def ffill(group: pa.Table) -> pa.Table:
            idx = pc.sort_indices(
                group,
                sort_keys=[
                    ("user_id", "ascending"),
                    ("ts", "ascending"),
                    ("event_id", "ascending"),
                ],
            )
            g = group.take(idx)
            n = g.num_rows
            uid = g["user_id"].to_numpy(zero_copy_only=False)
            v = np.rint(g["value"].to_numpy(zero_copy_only=False) * 100).astype(
                np.int64
            )
            valid = np.array(
                [t != "error" for t in g["event_type"].to_pylist()], dtype=bool
            )
            pos = np.arange(n, dtype=np.int64)
            last_valid = np.maximum.accumulate(np.where(valid, pos, -1))
            new_user = np.ones(n, dtype=bool)
            new_user[1:] = uid[1:] != uid[:-1]
            user_start = pos[new_user][np.cumsum(new_user) - 1]
            ok = last_valid >= user_start
            filled = np.where(ok, v[np.maximum(last_valid, 0)], 0)
            return pa.table(
                {
                    "event_id": g["event_id"],
                    "user_id": g["user_id"],
                    # leading gaps (no prior good reading) stay NULL
                    "filled_e2": pa.array(filled, pa.int64(), mask=~ok),
                }
            )

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.shuffle import (
            hash_map_groups,
        )

        return hash_map_groups(
            _tbl(
                sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"]
            ).map_batches(add_bucket, batch_format="pyarrow", batch_size=None),
            "ubucket",
            ffill,
        )

    def q_hist_quantiles(sf_dir: str):
        """Approximate quantiles from a MERGEABLE log-binned histogram
        (the HdrHistogram idea): bin(v) = bit_length(value_e2) — 64
        integer counters regardless of row count, merged by addition —
        then per event_type the estimated quantile is the LOWER BOUND
        (2^(bin-1)) of the bin holding rank ceil(q*n). All-integer, so
        the SQL twin replays bins, ranks and bounds exactly; accuracy
        (one power of two) is the documented trade for O(1) memory."""
        from ray.data.aggregate import Sum

        def binify(t: pa.Table) -> pa.Table:
            v = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100).astype(
                np.int64
            )
            v = np.maximum(v, 0)
            # bit_length via float log2 is unsafe at boundaries; use a
            # vectorized comparison against powers of two instead
            bins = np.searchsorted(
                2 ** np.arange(63, dtype=np.int64), v, side="right"
            ).astype(np.int64)
            from collections import Counter

            cnt = Counter(zip(t["event_type"].to_pylist(), bins.tolist()))
            keys = sorted(cnt)
            return pa.table(
                {
                    "event_type": pa.array([k[0] for k in keys], pa.string()),
                    "bin": pa.array([k[1] for k in keys], pa.int64()),
                    "n": pa.array([cnt[k] for k in keys], pa.int64()),
                }
            )

        hist = (
            _tbl(sf_dir, "events", ["event_type", "value"])
            .map_batches(binify, batch_format="pyarrow")
            .groupby(["event_type", "bin"])
            .aggregate(Sum("n", alias_name="n"))
            .take_all()
        )
        by_type: dict[str, dict[int, int]] = {}
        for r in hist:
            by_type.setdefault(r["event_type"], {})[r["bin"]] = r["n"]
        types, qs, ests = [], [], []
        for et in sorted(by_type):
            bins = by_type[et]
            n = sum(bins.values())
            for q_mille in (500, 900, 990):
                rank = -(-q_mille * n // 1000)  # ceil
                acc = 0
                est = 0
                for b in sorted(bins):
                    acc += bins[b]
                    if acc >= rank:
                        est = 0 if b == 0 else 1 << (b - 1)
                        break
                types.append(et)
                qs.append(q_mille)
                ests.append(est)
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "q_mille": pa.array(qs, pa.int64()),
                "est_lower_e2": pa.array(ests, pa.int64()),
            }
        )

    def q_ntile(sf_dir: str):
        # NTILE(4) OVER (PARTITION BY event_type ORDER BY value,
        # event_id): SQL's equal-ish buckets (larger buckets first) as
        # one vectorized rank->tile formula per type bucket — quartile
        # assignment for downstream stratification
        def tiles(group: pa.Table) -> pa.Table:
            idx = pc.sort_indices(
                group,
                sort_keys=[
                    ("event_type", "ascending"),
                    ("value", "ascending"),
                    ("event_id", "ascending"),
                ],
            )
            g = group.take(idx)
            et = g["event_type"].combine_chunks()
            codes = et.dictionary_encode().indices.to_numpy(zero_copy_only=False)
            first = np.ones(codes.size, dtype=bool)
            first[1:] = codes[1:] != codes[:-1]
            starts = np.flatnonzero(first)
            run_id = np.cumsum(first) - 1
            n_of = np.diff(np.append(starts, codes.size))[run_id]
            r = np.arange(codes.size) - starts[run_id]
            k = 4
            q, rem = n_of // k, n_of % k
            boundary = rem * (q + 1)
            big = r < boundary
            tile = np.where(
                big,
                r // np.maximum(q + 1, 1),
                rem + (r - boundary) // np.maximum(q, 1),
            )
            return pa.table(
                {
                    "event_id": g["event_id"],
                    "event_type": g["event_type"],
                    "tile": pa.array((tile + 1).astype(np.int64)),
                }
            )

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.shuffle import (
            hash_map_groups,
        )

        return hash_map_groups(
            _tbl(sf_dir, "events", ["event_id", "event_type", "value"]),
            "event_type",
            tiles,
            num_partitions=5,
        )

    def _transition_counts(sf_dir: str):
        # Markov transition counts: (from_type -> to_type) over each
        # user's (ts, event_id)-ordered event stream — the behavioral
        # sequence-model input. Same 64-way user bucketing as
        # sessionize; per bucket ONE multi-key sort + vectorized
        # adjacent-pair extraction (pairs crossing a user boundary are
        # masked out), then a tiny (types^2)-group count.
        def add_bucket(t: pa.Table) -> pa.Table:
            uid = t["user_id"].to_numpy(zero_copy_only=False)
            return t.append_column("ubucket", pa.array((uid % 64).astype(np.int64)))

        def pairs(group: pa.Table) -> pa.Table:
            idx = pc.sort_indices(
                group,
                sort_keys=[
                    ("user_id", "ascending"),
                    ("ts", "ascending"),
                    ("event_id", "ascending"),
                ],
            )
            g = group.take(idx)
            uid = g["user_id"].to_numpy(zero_copy_only=False)
            et = g["event_type"].to_pylist()
            same = uid[1:] == uid[:-1]
            keep = np.flatnonzero(same)
            return pa.table(
                {
                    "from_type": pa.array([et[i] for i in keep], pa.string()),
                    "to_type": pa.array([et[i + 1] for i in keep], pa.string()),
                }
            )

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.shuffle import (
            hash_map_groups,
        )

        flat = hash_map_groups(
            _tbl(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]).map_batches(
                add_bucket, batch_format="pyarrow", batch_size=None
            ),
            "ubucket",
            pairs,
        )
        return flat.groupby(["from_type", "to_type"]).aggregate(
            Count(alias_name="n")
        )

    def q_event_transitions(sf_dir: str):
        return _transition_counts(sf_dir)

    def q_markov(sf_dir: str):
        """Markov next-event model: the transition counts normalized
        into per-from-type probabilities — p_e6 = (1e6 * n) // n_from,
        an exact integer floor over the (types^2)-bounded count table
        (driver-side, the bounded-domain exception)."""
        tc = _transition_counts(sf_dir).take_all()
        tot: dict = {}
        for r in tc:
            tot[r["from_type"]] = tot.get(r["from_type"], 0) + r["n"]
        rows = sorted(tc, key=lambda r: (r["from_type"], r["to_type"]))
        return pa.table(
            {
                "from_type": pa.array([r["from_type"] for r in rows], pa.string()),
                "to_type": pa.array([r["to_type"] for r in rows], pa.string()),
                "n": pa.array([r["n"] for r in rows], pa.int64()),
                "p_e6": pa.array(
                    [
                        (1_000_000 * r["n"]) // tot[r["from_type"]]
                        for r in rows
                    ],
                    pa.int64(),
                ),
            }
        )

    def q_moving_avg(sf_dir: str):
        # window frame: 3-row trailing moving average of value per
        # user ordered by (ts, event_id) — ROWS BETWEEN 2 PRECEDING
        # AND CURRENT ROW, stages/temporal.py kernel
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.temporal import (
            moving_avg_per_user,
        )

        return moving_avg_per_user(
            _tbl(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
            window=3,
            quantize_e=6,
        )

    def q_anti_join(sf_dir: str):
        # distributed ANTI join: customers with no URGENT order — one
        # bounded bucket shuffle of key columns, vectorized is_in per
        # bucket (the predicate keeps the result non-vacuous: the
        # synthetic orders table covers every custkey otherwise)
        import pyarrow.dataset as pads
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            anti_join_keys,
        )

        cust = _tbl(sf_dir, "customer", ["c_custkey"])
        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey"],
            filter=pads.field("o_orderpriority") == "1-URGENT",
        ).rename_columns({"o_custkey": "c_custkey"})
        return anti_join_keys(cust, orders, "c_custkey")

    def q_semi_join(sf_dir: str):
        # distributed SEMI join: customers WITH at least one urgent
        # order (same kernel as the anti join, inverted membership)
        import pyarrow.dataset as pads
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            semi_join_keys,
        )

        cust = _tbl(sf_dir, "customer", ["c_custkey"])
        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey"],
            filter=pads.field("o_orderpriority") == "1-URGENT",
        ).rename_columns({"o_custkey": "c_custkey"})
        return semi_join_keys(cust, orders, "c_custkey")

    def q_topn_per_group(sf_dir: str):
        # top-3 events by value per event_type — map-side combine +
        # one bounded bucket shuffle, vectorized sort/run-detect per
        # bucket (never a per-group Python call)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            topn_per_group,
        )

        ev = _tbl(sf_dir, "events", ["event_id", "event_type", "value"])
        return topn_per_group(
            ev,
            "event_type",
            3,
            [("value", "descending"), ("event_id", "ascending")],
        ).select_columns(["event_type", "event_id", "value"])

    def q_group_sample(sf_dir: str):
        # deterministic stratified sample: the 5 smallest-hash64 events
        # per event_type — same bounded-bucket top-n kernel; the hash
        # order is process/partitioning-independent, so the sample is
        # stable across cluster sizes (and replayable in SQL)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
            hash64_array,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            topn_per_group,
        )

        def add_hash(t: pa.Table) -> pa.Table:
            h = hash64_array(
                t["event_id"].cast(pa.string()).to_pylist()
            )
            return t.append_column("__h", pa.array(h))

        ev = _tbl(sf_dir, "events", ["event_id", "event_type", "value"]).map_batches(
            add_hash, batch_format="pyarrow"
        )
        return topn_per_group(
            ev, "event_type", 5, [("__h", "ascending"), ("event_id", "ascending")]
        ).select_columns(["event_type", "event_id", "value"])

    def q_quantiles(sf_dir: str):
        # exact per-group discrete quantiles via distributed histogram
        # (map-side combine -> one narrow shuffle of histogram rows)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            grouped_quantiles,
        )

        return grouped_quantiles(
            _tbl(sf_dir, "events", ["event_type", "value"]), "event_type", "value"
        )

    def q_segment_order_median(sf_dir: str):
        # median order value per customer market segment: broadcast
        # customer->segment map into the orders scan (pc.index_in,
        # vectorized), then the ONE-histogram-shuffle exact quantile
        # kernel over the 5-bounded segment groups
        import pyarrow.parquet as pq
        import ray

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            grouped_quantiles,
        )

        cust = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"],
        )
        cust_ref = ray.put(cust)

        def seg(t: pa.Table) -> pa.Table:
            c = ray.get(cust_ref)
            pos = pc.index_in(t["o_custkey"], value_set=c["c_custkey"].combine_chunks())
            return pa.table(
                {
                    "c_mktsegment": pc.take(c["c_mktsegment"].combine_chunks(), pos),
                    "value": t["o_totalprice"],
                }
            )

        ds = _tbl(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
            seg, batch_format="pyarrow"
        )
        return grouped_quantiles(ds, "c_mktsegment", "value")

    def q_quantiles_cont(sf_dir: str):
        # exact per-group CONTINUOUS (interpolated) quantiles: same
        # ONE-histogram-shuffle plan as rel_quantiles, interpolation in
        # exact rational arithmetic (stages/ops.py:grouped_quantiles_cont)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            grouped_quantiles_cont,
        )

        return grouped_quantiles_cont(
            _tbl(sf_dir, "events", ["event_type", "value"]), "event_type", "value"
        )

    def q_rfm(sf_dir: str):
        """RFM customer segmentation over the event stream: per user
        recency (last event ts), frequency (event count), monetary
        (exact e2 value sum) from ONE distributed groupby; the three
        NTILE(4) scores are then assigned on the group-count-bounded
        aggregate (descending metric, user_id tiebreak — DuckDB's
        ntile bucket-size rule: first n%4 buckets take the extra row).
        At 100 TB the aggregate is |users| rows — the bounded side; the
        scale path for the score pass is the same bounded-histogram
        threshold trick as percentile_rank."""
        ds = _tbl(sf_dir, "events", ["user_id", "ts", "value"])

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "user_id": t["user_id"],
                    "ts_us": t["ts"].cast(pa.int64()),
                    "value_e2": pc.round(
                        pc.multiply(t["value"], 100.0),
                        round_mode="half_towards_infinity",
                    ).cast(pa.int64()),
                }
            )

        agg = (
            ds.map_batches(prep, batch_format="pyarrow")
            .groupby("user_id")
            .aggregate(
                Max("ts_us", alias_name="last_ts_us"),
                Count(alias_name="n_events"),
                Sum("value_e2", alias_name="monetary_e2"),
            )
        )
        t = pa.concat_tables(
            [b for b in agg.iter_batches(batch_format="pyarrow")]
        ).combine_chunks()
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        n = len(t)

        def ntile4_desc(metric: np.ndarray) -> np.ndarray:
            # rank rows by (metric DESC, user_id ASC), then DuckDB's
            # ntile fill: first n%4 buckets get ceil(n/4) rows
            order = np.lexsort((uid, -metric))
            base, rem = divmod(n, 4)
            sizes = np.full(4, base, dtype=np.int64)
            sizes[:rem] += 1
            bucket_of_pos = np.repeat(np.arange(1, 5, dtype=np.int64), sizes)
            out = np.empty(n, dtype=np.int64)
            out[order] = bucket_of_pos
            return out

        last = t["last_ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        freq = t["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
        mon = t["monetary_e2"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "last_ts_us": pa.array(last),
                "n_events": pa.array(freq),
                "monetary_e2": pa.array(mon),
                "r_score": pa.array(ntile4_desc(last)),
                "f_score": pa.array(ntile4_desc(freq)),
                "m_score": pa.array(ntile4_desc(mon)),
            }
        )

    def q_mad_outliers(sf_dir: str):
        # robust outlier screen: exact per-group median + MAD + count
        # of |v-med| > 3*MAD, all from ONE histogram shuffle (the MAD
        # distribution is a fold of the value histogram — no second
        # data pass; stages/ops.py:grouped_mad_outliers)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            grouped_mad_outliers,
        )

        return grouped_mad_outliers(
            _tbl(sf_dir, "events", ["event_type", "value"]), "event_type", "value"
        )

    def q_percentile_rank(sf_dir: str):
        # per-row percent_rank() within event_type WITHOUT a per-group
        # data sort: bounded histogram broadcast + one searchsorted per
        # batch (stages/ops.py:grouped_percentile_rank)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            grouped_percentile_rank,
        )

        return grouped_percentile_rank(
            _tbl(sf_dir, "events", ["event_id", "event_type", "value"]),
            "event_type",
            "value",
            "event_id",
        )

    def q_cume_dist(sf_dir: str):
        # per-row cume_dist() within event_type WITHOUT a per-group
        # data sort: same bounded-histogram broadcast as percent_rank,
        # inclusive count / n (stages/ops.py:grouped_cume_dist)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            grouped_cume_dist,
        )

        return grouped_cume_dist(
            _tbl(sf_dir, "events", ["event_id", "event_type", "value"]),
            "event_type",
            "value",
            "event_id",
        )

    def q_skyline(sf_dir: str):
        # per-type 2-D skyline (value MAX, ts MIN): Pareto-optimal
        # events via local-skyline combiner + tiny per-group merge
        # (stages/ops.py:grouped_skyline_2d)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            grouped_skyline_2d,
        )

        return grouped_skyline_2d(
            _tbl(sf_dir, "events", ["event_id", "event_type", "value", "ts"]),
            "event_type",
            "value",
            "ts",
            "event_id",
        )

    def q_interarrival(sf_dir: str):
        # per-type exact quantiles of same-(user,type) inter-event gaps
        # (stages/temporal.py:interarrival_quantiles — user-bucket sort
        # once, second-quantized gap histogram, quantile_disc rule)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.temporal import (
            interarrival_quantiles,
        )

        return interarrival_quantiles(
            _tbl(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        )

    def q_asof_join(sf_dir: str):
        # AS-OF join (click -> most recent prior view per user): a
        # custom temporal operator Ray Data lacks, expressed as one
        # user-bucket shuffle + vectorized multi-user kernel
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.temporal import (
            asof_join_events,
        )

        return asof_join_events(
            _tbl(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        )

    def q_range_join(sf_dir: str):
        # banded RANGE join (events within 60s after each error, per
        # user), counted; packed-key searchsorted kernel
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.temporal import (
            range_count_after,
        )

        return range_count_after(
            _tbl(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        )

    def q_lang_gate(sf_dir: str):
        # content/lang gate over the pages corpus (replaces the
        # crawler's content-type gate, Crawler.java:174) + per-lang count
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            lang_gate,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "lang"])
        return (
            pages.map_batches(lang_gate(["en", "de"]), batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Count(alias_name="n_pages"))
        )

    def q_host_latest(sf_dir: str):
        """Freshest capture per host (re-crawl bookkeeping: which
        snapshot of each site is current): ARGMAX by warc_ts per host,
        tie by url — the distributed keep-latest that complements the
        keep-first content dedup. Runs on the bounded topn_per_group
        kernel (map-side combine + one bucket shuffle, n=1)."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            topn_per_group,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "warc_ts"])

        def hostify(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "host": pc.list_element(pc.split_pattern(t["url"], "/"), 2),
                    "url": t["url"],
                    "ts_us": t["warc_ts"].cast(pa.int64()),
                }
            )

        return topn_per_group(
            pages.map_batches(hostify, batch_format="pyarrow"),
            "host",
            1,
            [("ts_us", "descending"), ("url", "ascending")],
        )

    def q_host_stats(sf_dir: str):
        """Per-HOST crawl summary over the pages corpus (the per-domain
        rollup every real crawl pipeline maintains): page count + exact
        html/text byte totals. Map-side combine per batch
        (``host_stats_partial``), then one host-cardinality groupby."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            host_stats_partial,
        )

        pages = rd.read_parquet(
            pages_for_sf_dir(sf_dir), columns=["url", "html", "text"]
        )
        agg = (
            pages.map_batches(host_stats_partial, batch_format="pyarrow")
            .groupby("host")
            .aggregate(
                Sum("n_pages", alias_name="n_pages"),
                Sum("sum_html_bytes", alias_name="sum_html_bytes"),
                Sum("sum_text_bytes", alias_name="sum_text_bytes"),
            )
        )
        return agg

    def q_term_complete(sf_dir: str):
        """Prefix autocomplete over the index vocabulary: top-10 terms
        by collection frequency (cf desc, term asc) per query prefix —
        a distributed read of the build's term_stats table, vectorized
        prefix filter, then the bounded-bucket top-N kernel."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            topn_per_group,
        )

        out_dir = _cached_index_dir(sf_dir)
        ds = rd.read_parquet(os.path.join(out_dir, "term_stats"))

        def tag(t: pa.Table) -> pa.Table:
            outs = []
            for p in TERM_COMPLETE_PREFIXES:
                sel = t.filter(pc.starts_with(t["term"], pattern=p))
                outs.append(
                    pa.table(
                        {
                            "prefix": pa.array([p] * sel.num_rows, pa.string()),
                            "term": sel["term"],
                            "cf": sel["cf"],
                        }
                    )
                )
            return pa.concat_tables(outs)

        tagged = ds.map_batches(tag, batch_format="pyarrow")
        return topn_per_group(
            tagged, "prefix", 10, [("cf", "descending"), ("term", "ascending")]
        )

    def q_crawl_links(sf_dir: str):
        # rows-only: link-graph extraction over the synthetic pages
        # corpus (crawler parity, SURVEY §2.2); no SQL view of pages
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
        return pages.map_batches(
            LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
        )

    def q_reciprocal_links(sf_dir: str):
        """Reciprocal link pairs (a links b AND b links a — the mutual-
        endorsement graph signal): extract edges, canonicalize the src
        side with the SAME URL normalizer the dst side already passed
        through, fold each edge to an unordered pair + direction flag,
        and keep pairs seen in BOTH directions via one bounded-bucket
        groupby (never an edge self-join)."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
            hash64,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.shuffle import (
            hash_map_groups,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
        # ONE canonical url convention for graph joins (_canon80 — the
        # same rule the oracles hard-code), applied vectorized
        edges = pages.map_batches(
            LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
        ).map_batches(_canon80_src, batch_format="pyarrow")

        n_buckets = 64

        def fold(t: pa.Table) -> pa.Table:
            srcs = t["src_url"].to_pylist()
            dsts = t["dst_url"].to_pylist()
            ua, ub, direc, bucket = [], [], [], []
            for s, d in zip(srcs, dsts):
                cs = s
                if cs == d:
                    continue
                a, b = (cs, d) if cs < d else (d, cs)
                ua.append(a)
                ub.append(b)
                direc.append(1 if cs < d else 2)
                bucket.append(hash64(a + "\0" + b) % n_buckets)
            return pa.table(
                {
                    "url_a": pa.array(ua, pa.string()),
                    "url_b": pa.array(ub, pa.string()),
                    "dir": pa.array(direc, pa.int64()),
                    "__bucket": pa.array(bucket, pa.int64()),
                }
            )

        def both_dirs(group: pa.Table) -> pa.Table:
            agg = (
                group.select(["url_a", "url_b", "dir"])
                .group_by(["url_a", "url_b"])
                .aggregate([("dir", "min"), ("dir", "max")])
            )
            keep = pc.and_(
                pc.equal(agg["dir_min"], 1), pc.equal(agg["dir_max"], 2)
            )
            return agg.filter(keep).select(["url_a", "url_b"])

        # reciprocal pairs are rare (mutual endorsement): materialize
        # to a TYPED table so an empty result keeps its schema
        rows = hash_map_groups(
            edges.map_batches(fold, batch_format="pyarrow"),
            "__bucket",
            both_dirs,
        ).take_all()
        return pa.table(
            {
                "url_a": pa.array([r["url_a"] for r in rows], pa.string()),
                "url_b": pa.array([r["url_b"] for r in rows], pa.string()),
            }
        )

    def q_rank_frequency(sf_dir: str):
        """Zipf rank-frequency table of the corpus vocabulary (the
        standard corpus-health diagnostic: cf should fall ~1/rank):
        one vocab-bounded term groupby, ranks assigned by
        (cf desc, term) — deterministic ties."""
        from ray.data.aggregate import Sum

        def term_tf(batch: pa.Table) -> pa.Table:
            from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
                tokenize_count_batch,
            )

            terms, tfs, _ = tokenize_count_batch(batch["text"])
            tnp = terms.flatten().to_numpy(zero_copy_only=False)
            fnp = tfs.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            uniq, inv = np.unique(tnp, return_inverse=True)
            sums = np.zeros(uniq.size, np.int64)
            np.add.at(sums, inv, fnp)
            return pa.table(
                {"term": pa.array(uniq.tolist(), pa.string()), "cf": pa.array(sums)}
            )

        rows = (
            _tbl(sf_dir, "documents", ["text"])
            .map_batches(term_tf, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("cf", alias_name="cf"))
            .take_all()
        )
        order = sorted(rows, key=lambda r: (-r["cf"], r["term"]))
        return pa.table(
            {
                "rank": pa.array(range(1, len(order) + 1), pa.int64()),
                "term": pa.array([r["term"] for r in order], pa.string()),
                "cf": pa.array([r["cf"] for r in order], pa.int64()),
            }
        )

    def q_pareto_users(sf_dir: str):
        """Concentration (Pareto) metric: per event_type, the smallest
        number of users whose summed value covers >= 80% of the type's
        total — exact integer cents, deterministic (value desc, user_id
        asc) ordering. One (type, user) sum groupby, then a per-type
        sorted cumulative count on the bounded per-type user lists."""
        from ray.data.aggregate import Sum

        def cents(t: pa.Table) -> pa.Table:
            v = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100).astype(
                np.int64
            )
            return pa.table(
                {
                    "event_type": t["event_type"],
                    "user_id": t["user_id"],
                    "v": pa.array(v),
                }
            )

        per_user = (
            _tbl(sf_dir, "events", ["event_type", "user_id", "value"])
            .map_batches(cents, batch_format="pyarrow")
            .groupby(["event_type", "user_id"])
            .aggregate(Sum("v", alias_name="v"))
            .take_all()
        )
        by_type: dict[str, list[tuple[int, int]]] = {}
        for r in per_user:
            by_type.setdefault(r["event_type"], []).append((-r["v"], r["user_id"]))
        types, ns, totals = [], [], []
        for et in sorted(by_type):
            rows = sorted(by_type[et])
            total = sum(-nv for nv, _u in rows)
            need = -(-total * 8 // 10)  # ceil(0.8 * total)
            acc = 0
            k = 0
            for nv, _u in rows:
                acc += -nv
                k += 1
                if acc >= need:
                    break
            types.append(et)
            ns.append(k)
            totals.append(total)
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "users_for_80pct": pa.array(ns, pa.int64()),
                "total_e2": pa.array(totals, pa.int64()),
            }
        )

    def q_attribution(sf_dir: str):
        """Last-touch attribution: each 'purchase' event credits the
        user's MOST RECENT preceding non-purchase event type (purchases
        with no prior touch credit 'none'); output is credit counts per
        type — the marketing-analytics classic. Same user bucketing +
        last-valid-index accumulate as forward fill."""

        def add_bucket(t: pa.Table) -> pa.Table:
            uid = t["user_id"].to_numpy(zero_copy_only=False)
            return t.append_column("ubucket", pa.array((uid % 64).astype(np.int64)))

        def credit(group: pa.Table) -> pa.Table:
            idx = pc.sort_indices(
                group,
                sort_keys=[
                    ("user_id", "ascending"),
                    ("ts", "ascending"),
                    ("event_id", "ascending"),
                ],
            )
            g = group.take(idx)
            n = g.num_rows
            uid = g["user_id"].to_numpy(zero_copy_only=False)
            et = g["event_type"].to_pylist()
            is_touch = np.array([t != "purchase" for t in et], dtype=bool)
            pos = np.arange(n, dtype=np.int64)
            last_touch = np.maximum.accumulate(np.where(is_touch, pos, -1))
            new_user = np.ones(n, dtype=bool)
            new_user[1:] = uid[1:] != uid[:-1]
            user_start = pos[new_user][np.cumsum(new_user) - 1]
            from collections import Counter

            cnt: Counter = Counter()
            for i in np.flatnonzero(~is_touch):
                lt = last_touch[i]
                cnt[et[lt] if lt >= user_start[i] else "none"] += 1
            keys = sorted(cnt)
            return pa.table(
                {
                    "credited_type": pa.array(keys, pa.string()),
                    "n": pa.array([cnt[k] for k in keys], pa.int64()),
                }
            )

        from ray.data.aggregate import Sum

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.shuffle import (
            hash_map_groups,
        )

        return (
            hash_map_groups(
                _tbl(
                    sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]
                ).map_batches(add_bucket, batch_format="pyarrow", batch_size=None),
                "ubucket",
                credit,
            )
            .groupby("credited_type")
            .aggregate(Sum("n", alias_name="n"))
        )

    def q_benford(sf_dir: str):
        """Benford first-significant-digit distribution of the value
        column (the classic data-quality / fraud screen): digit of the
        exact integer cents, counted per event_type. One vectorized
        map + a 9 x types groupby."""

        def digits(t: pa.Table) -> pa.Table:
            v = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100).astype(
                np.int64
            )
            keep = v > 0
            v = v[keep]
            # first significant digit: divide by 10 until < 10
            while (v >= 10).any():
                big = v >= 10
                v = np.where(big, v // 10, v)
            return pa.table(
                {
                    "event_type": t["event_type"].filter(pa.array(keep)),
                    "digit": pa.array(v),
                }
            )

        return (
            _tbl(sf_dir, "events", ["event_type", "value"])
            .map_batches(digits, batch_format="pyarrow")
            .groupby(["event_type", "digit"])
            .aggregate(Count(alias_name="n"))
        )

    def q_corr(sf_dir: str):
        """Pearson correlation of quantity vs price per (returnflag,
        linestatus) group — the two-moment grouped aggregate
        (``stages/ops.grouped_corr``). Quantize-first discipline:
        x = floor(quantity), y = floor(price dollars) so every moment
        sum is an exact int64 per block and an exact big-int at the
        final combine; the ONLY float op is the last corr_e6 rational,
        replayed with identical IEEE ops by the SQL twin."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            grouped_corr,
        )

        def quantize(t: pa.Table) -> pa.Table:
            q = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False)).astype(
                np.int64
            )
            p = np.floor(t["l_extendedprice"].to_numpy(zero_copy_only=False)).astype(
                np.int64
            )
            return pa.table(
                {
                    "l_returnflag": t["l_returnflag"],
                    "l_linestatus": t["l_linestatus"],
                    "x": pa.array(q),
                    "y": pa.array(p),
                }
            )

        ds = _tbl(
            sf_dir,
            "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
        ).map_batches(quantize, batch_format="pyarrow")
        return grouped_corr(ds, ["l_returnflag", "l_linestatus"], "x", "y")

    def q_linfit(sf_dir: str):
        """Per-group OLS fit price ~ quantity — the regression
        companion of rel_corr on the same moment pass
        (``stages/ops.grouped_linfit``). NO float op anywhere: slope
        and intercept micros are exact big-int floor divisions,
        replayed in HUGEINT by the SQL twin."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            grouped_linfit,
        )

        def quantize(t: pa.Table) -> pa.Table:
            q = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False)).astype(
                np.int64
            )
            p = np.floor(t["l_extendedprice"].to_numpy(zero_copy_only=False)).astype(
                np.int64
            )
            return pa.table(
                {
                    "l_returnflag": t["l_returnflag"],
                    "l_linestatus": t["l_linestatus"],
                    "x": pa.array(q),
                    "y": pa.array(p),
                }
            )

        ds = _tbl(
            sf_dir,
            "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
        ).map_batches(quantize, batch_format="pyarrow")
        return grouped_linfit(ds, ["l_returnflag", "l_linestatus"], "x", "y")

    def q_spearman(sf_dir: str):
        """Spearman rank correlation of quantity vs price per
        returnflag — Pearson on exact DOUBLED average ranks derived
        from bounded per-(group, value) histograms, NO per-group sort
        (stages/ops.grouped_spearman). The SQL twin replays rank2 as
        2*rank() + count(*) OVER (PARTITION BY g, v) - 1."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            grouped_spearman,
        )

        def quantize(t: pa.Table) -> pa.Table:
            q = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False)).astype(
                np.int64
            )
            p = np.floor(t["l_extendedprice"].to_numpy(zero_copy_only=False)).astype(
                np.int64
            )
            return pa.table(
                {
                    "l_returnflag": t["l_returnflag"],
                    "x": pa.array(q),
                    "y": pa.array(p),
                }
            )

        ds = _tbl(
            sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"]
        ).map_batches(quantize, batch_format="pyarrow")
        return grouped_spearman(ds, "l_returnflag", "x", "y")

    def q_ab_test(sf_dir: str):
        """A/B experiment readout: Welch t statistic of the event value
        per event_type between the user_id-parity variants (a
        deterministic traffic split both engines replay). One streaming
        exact-moment pass; the only float arithmetic is the final t
        expression, IEEE-order-mirrored by the twin
        (stages/ops.grouped_welch_t)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            grouped_welch_t,
        )

        def prep(t: pa.Table) -> pa.Table:
            uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = np.floor(t["value"].to_numpy(zero_copy_only=False)).astype(np.int64)
            return pa.table(
                {
                    "event_type": t["event_type"],
                    "variant": pa.array(uid % 2),
                    "x": pa.array(v),
                }
            )

        ds = _tbl(sf_dir, "events", ["event_type", "user_id", "value"]).map_batches(
            prep, batch_format="pyarrow"
        )
        return grouped_welch_t(ds, "event_type", "variant", "x")

    def _two_sample_events(sf_dir: str):
        """Shared prep of the two-sample tests (rel_ab_test /
        rel_ks_test / rel_mannwhitney): event value floor-quantized,
        user_id-parity traffic split."""

        def prep(t: pa.Table) -> pa.Table:
            uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = np.floor(t["value"].to_numpy(zero_copy_only=False)).astype(np.int64)
            return pa.table(
                {
                    "event_type": t["event_type"],
                    "variant": pa.array(uid % 2),
                    "x": pa.array(v),
                }
            )

        return _tbl(sf_dir, "events", ["event_type", "user_id", "value"]).map_batches(
            prep, batch_format="pyarrow"
        )

    def q_ks_test(sf_dir: str):
        """Two-sample Kolmogorov-Smirnov D per event_type between the
        user_id-parity variants — the distribution-SHIFT readout a mean
        test misses. Exact integers end-to-end (sup of |n_b*cumA -
        n_a*cumB| over the bounded value histogram, one floor division
        to micros); see stages/ops.grouped_ks_test."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            grouped_ks_test,
        )

        return grouped_ks_test(
            _two_sample_events(sf_dir), "event_type", "variant", "x"
        )

    def q_mannwhitney(sf_dir: str):
        """Mann-Whitney U rank-sum test per event_type between the
        user_id-parity variants — the nonparametric A/B readout. u2
        (doubled U, half-ties exact) is a pure integer; the tie-
        corrected z is ONE IEEE expression over exact bigint operands,
        mirrored operand-for-operand by the SQL twin
        (stages/ops.grouped_mannwhitney)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            grouped_mannwhitney,
        )

        return grouped_mannwhitney(
            _two_sample_events(sf_dir), "event_type", "variant", "x"
        )

    def q_changepoint(sf_dir: str):
        """Change-point screen: per event_type, the CUSUM-style max
        deviation of the daily-count series from a uniform rate —
        D = max_i |m*S_i - i*n| over the ordered distinct days (S_i
        cumulative events, m days, n events), with the earliest argmax
        day. EXACT integers end-to-end; one bounded (type x day)
        groupby, driver fold — the drift/monitoring primitive."""
        counts = (
            _tbl(sf_dir, "events", ["event_type", "ts"])
            .map_batches(
                lambda t: pa.table(
                    {
                        "event_type": t["event_type"],
                        "day": pc.cast(
                            pc.floor(
                                pc.divide(
                                    pc.cast(t["ts"], pa.int64()), 86_400_000_000
                                )
                            ),
                            pa.int64(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .groupby(["event_type", "day"])
            .aggregate(Count(alias_name="n"))
            .take_all()
        )
        per: dict = {}
        for r in counts:
            per.setdefault(r["event_type"], {})[r["day"]] = r["n"]
        out_t, out_m, out_n, out_d, out_day = [], [], [], [], []
        for et in sorted(per):
            days = sorted(per[et])
            m = len(days)
            n = sum(per[et].values())
            s = 0
            best, best_day = -1, days[0]
            for i, d in enumerate(days, start=1):
                s += per[et][d]
                dev = abs(m * s - i * n)
                if dev > best:
                    best, best_day = dev, d
            out_t.append(et)
            out_m.append(m)
            out_n.append(n)
            out_d.append(best)
            out_day.append(best_day)
        return pa.table(
            {
                "event_type": pa.array(out_t),
                "n_days": pa.array(out_m, pa.int64()),
                "n_events": pa.array(out_n, pa.int64()),
                "cusum_max": pa.array(out_d, pa.int64()),
                "change_day": pa.array(out_day, pa.int64()),
            }
        )

    def q_seasonality(sf_dir: str):
        """Day-of-week seasonality profile per event_type: event count
        and exact-integer share micros per weekday (0 = Sunday, via the
        epoch-day + 4 mod 7 rule — no timezone/locale dependence), all
        7 weekdays emitted per type (zeros included) so profiles are
        comparable. ONE bounded (type x dow) exchange — the 42-cell
        driver fold is the rel_chi2 discipline."""
        def dow_partial(t: pa.Table) -> pa.Table:
            us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            dow = (us // 86_400_000_000 + 4) % 7
            return (
                pa.table({"event_type": t["event_type"], "dow": pa.array(dow)})
                .group_by(["event_type", "dow"])
                .aggregate([([], "count_all")])
            )

        counts = (
            _tbl(sf_dir, "events", ["event_type", "ts"])
            .map_batches(dow_partial, batch_format="pyarrow")
            .take_all()
        )
        per: dict = {}
        for r in counts:
            k = (r["event_type"], r["dow"])
            per[k] = per.get(k, 0) + r["count_all"]
        types = sorted({t for t, _d in per})
        out_t, out_d, out_n, out_s = [], [], [], []
        for t in types:
            total = sum(per.get((t, d), 0) for d in range(7))
            for d in range(7):
                n = per.get((t, d), 0)
                out_t.append(t)
                out_d.append(d)
                out_n.append(n)
                out_s.append((1_000_000 * n) // total if total else 0)
        return pa.table(
            {
                "event_type": pa.array(out_t),
                "dow": pa.array(out_d, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
                "share_e6": pa.array(out_s, pa.int64()),
            }
        )

    def q_autocorr(sf_dir: str):
        """Lag-1 autocorrelation of the daily event-count series per
        event_type (days ordered, gaps ignored — the documented
        contract): Pearson between (c_1..c_{m-1}) and (c_2..c_m) with
        exact integer moments and ONE final IEEE expression (the
        rel_corr discipline). The burstiness/seasonality screen."""
        counts = (
            _tbl(sf_dir, "events", ["event_type", "ts"])
            .map_batches(
                lambda t: pa.table(
                    {
                        "event_type": t["event_type"],
                        "day": pc.cast(
                            pc.divide(
                                pc.cast(t["ts"], pa.int64()), 86_400_000_000
                            ),
                            pa.int64(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .groupby(["event_type", "day"])
            .aggregate(Count(alias_name="n"))
            .take_all()
        )
        import math as _math

        per: dict = {}
        for r in counts:
            per.setdefault(r["event_type"], {})[r["day"]] = r["n"]
        out_t, out_m, out_c = [], [], []
        for et in sorted(per):
            series = [per[et][d] for d in sorted(per[et])]
            if len(series) < 3:
                continue
            xs, ys = series[:-1], series[1:]
            n = len(xs)
            sx, sy = sum(xs), sum(ys)
            sxx = sum(v * v for v in xs)
            syy = sum(v * v for v in ys)
            sxy = sum(a * b for a, b in zip(xs, ys))
            d1, d2 = n * sxx - sx * sx, n * syy - sy * sy
            if d1 <= 0 or d2 <= 0:
                continue
            num = n * sxy - sx * sy
            out_t.append(et)
            out_m.append(n)
            out_c.append(
                _math.floor(
                    1_000_000.0 * num / (_math.sqrt(d1) * _math.sqrt(d2))
                )
            )
        return pa.table(
            {
                "event_type": pa.array(out_t),
                "n_pairs": pa.array(out_m, pa.int64()),
                "autocorr_e6": pa.array(out_c, pa.int64()),
            }
        )

    def q_gini(sf_dir: str):
        """Gini inequality of the event value per event_type — exact
        integers end-to-end from the bounded per-(group, value)
        histogram, no per-group sort (stages/ops.grouped_gini). The
        twin computes S = sum(i*x) with row_number(); tie order is
        harmless since x is constant within a tie block."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            grouped_gini,
        )

        def prep(t: pa.Table) -> pa.Table:
            v = np.floor(t["value"].to_numpy(zero_copy_only=False)).astype(np.int64)
            return pa.table({"event_type": t["event_type"], "x": pa.array(v)})

        ds = _tbl(sf_dir, "events", ["event_type", "value"]).map_batches(
            prep, batch_format="pyarrow"
        )
        return grouped_gini(ds, "event_type", "x")

    def q_chi2(sf_dir: str):
        """Chi-squared independence screen: is event_type independent
        of hour-of-day? EXACT integers end-to-end — the statistic is a
        sum of per-cell floors, chi2q_e6 = sum_cells (1e6 * (O*N -
        R*C)^2) // (N*R*C), so the cell-order-independent integer sum
        replays exactly in HUGEINT (a float per-cell sum would be
        order-sensitive). One bounded (types x 24) groupby; the fold is
        driver-side Python bigints."""
        counts = (
            _tbl(sf_dir, "events", ["event_type", "ts"])
            .map_batches(
                lambda t: pa.table(
                    {
                        "event_type": t["event_type"],
                        "hour": pc.hour(t["ts"]).cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            .groupby(["event_type", "hour"])
            .aggregate(Count(alias_name="n"))
            .take_all()
        )
        obs = {(r["event_type"], r["hour"]): r["n"] for r in counts}
        rows = sorted({k[0] for k in obs})
        cols = sorted({k[1] for k in obs})
        R = {r: sum(obs.get((r, c), 0) for c in cols) for r in rows}
        C = {c: sum(obs.get((r, c), 0) for r in rows) for c in cols}
        N = sum(R.values())
        chi2q = 0
        for r in rows:
            for c in cols:
                o = obs.get((r, c), 0)
                d = o * N - R[r] * C[c]
                chi2q += (1_000_000 * d * d) // (N * R[r] * C[c])
        return pa.table(
            {
                "n_total": pa.array([N], pa.int64()),
                "n_cells": pa.array([len(rows) * len(cols)], pa.int64()),
                "dof": pa.array([(len(rows) - 1) * (len(cols) - 1)], pa.int64()),
                "chi2q_e6": pa.array([chi2q], pa.int64()),
            }
        )

    def q_audience_overlap(sf_dir: str):
        """Audience overlap: |users(a) AND users(b)| for every event-
        type pair — the co-occurrence matrix behind segment analysis.
        Plan: distinct (user, type) via the bounded-bucket kernel, ONE
        user-bucketed groupby that expands each user's (tiny, bounded
        by #types) type set into pairs map-side, then a types^2 count —
        the user cross-join never happens."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            distinct_on,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.shuffle import (
            hash_map_groups,
        )

        ut = distinct_on(
            _tbl(sf_dir, "events", ["user_id", "event_type"]),
            ["user_id", "event_type"],
        )

        def add_bucket(t: pa.Table) -> pa.Table:
            uid = t["user_id"].to_numpy(zero_copy_only=False)
            return t.append_column("ubucket", pa.array((uid % 64).astype(np.int64)))

        def pairs(group: pa.Table) -> pa.Table:
            idx = pc.sort_indices(
                group,
                sort_keys=[("user_id", "ascending"), ("event_type", "ascending")],
            )
            g = group.take(idx)
            uid = g["user_id"].to_numpy(zero_copy_only=False)
            et = g["event_type"].to_pylist()
            a_out, b_out = [], []
            i = 0
            n = uid.size
            while i < n:
                j = i + 1
                while j < n and uid[j] == uid[i]:
                    j += 1
                ts = et[i:j]
                for x in range(len(ts)):
                    for y in range(x + 1, len(ts)):
                        a_out.append(ts[x])
                        b_out.append(ts[y])
                i = j
            return pa.table(
                {
                    "type_a": pa.array(a_out, pa.string()),
                    "type_b": pa.array(b_out, pa.string()),
                }
            )

        return (
            hash_map_groups(
                ut.map_batches(add_bucket, batch_format="pyarrow"),
                "ubucket",
                pairs,
            )
            .groupby(["type_a", "type_b"])
            .aggregate(Count(alias_name="n_users"))
        )

    def q_rel_lift(sf_dir: str):
        """Association lift between event-type pairs (the market-basket
        readout over user behaviour): lift = N * n_ab / (n_a * n_b)
        over DISTINCT users, > 1 = the types co-occur more than
        independence predicts. Pair supports ride the audience-overlap
        kernel (bounded per-user pair expansion, never a user
        cross-join); per-type supports and N are one more bounded
        exchange; lift_e6 is an exact integer floor."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            distinct_on,
        )

        pair_rows = {
            (r["type_a"], r["type_b"]): r["n_users"]
            for r in q_audience_overlap(sf_dir).take_all()
        }
        ut = distinct_on(
            _tbl(sf_dir, "events", ["user_id", "event_type"]),
            ["user_id", "event_type"],
        ).materialize()

        def tcount(t: pa.Table) -> pa.Table:
            return (
                t.select(["event_type"])
                .group_by("event_type")
                .aggregate([([], "count_all")])
            )

        n_of: dict[str, int] = {}
        for r in ut.map_batches(tcount, batch_format="pyarrow").take_all():
            n_of[r["event_type"]] = n_of.get(r["event_type"], 0) + r["count_all"]
        n_users = int(
            distinct_on(ut, ["user_id"]).count()
        )
        out_a, out_b, out_ab, out_na, out_nb, out_l = [], [], [], [], [], []
        for (a, b) in sorted(pair_rows):
            n_ab = pair_rows[(a, b)]
            na, nb = n_of[a], n_of[b]
            out_a.append(a)
            out_b.append(b)
            out_ab.append(n_ab)
            out_na.append(na)
            out_nb.append(nb)
            out_l.append((1_000_000 * n_users * n_ab) // (na * nb))
        return pa.table(
            {
                "type_a": pa.array(out_a),
                "type_b": pa.array(out_b),
                "n_ab": pa.array(out_ab, pa.int64()),
                "n_a": pa.array(out_na, pa.int64()),
                "n_b": pa.array(out_nb, pa.int64()),
                "lift_e6": pa.array(out_l, pa.int64()),
            }
        )

    def q_rel_rate_test(sf_dir: str):
        """Two-sample event-RATE test per event_type between the
        user_id-parity variants (the count-based sibling of the
        value-based Welch/KS/MW family): under a shared Poisson rate,
        z = (n1 - n0) / sqrt(n1 + n0) — the numerator exact, the ONE
        float expression mirrored operand-for-operand by the twin."""
        import math as _math

        def prep(t: pa.Table) -> pa.Table:
            uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return (
                pa.table(
                    {"event_type": t["event_type"], "variant": pa.array(uid % 2)}
                )
                .group_by(["event_type", "variant"])
                .aggregate([([], "count_all")])
            )

        acc: dict = {}
        for r in (
            _tbl(sf_dir, "events", ["event_type", "user_id"])
            .map_batches(prep, batch_format="pyarrow")
            .take_all()
        ):
            k = (r["event_type"], r["variant"])
            acc[k] = acc.get(k, 0) + r["count_all"]
        out_g, out_n0, out_n1, out_z = [], [], [], []
        for g in sorted({k for k, _v in acc}):
            n0 = acc.get((g, 0), 0)
            n1 = acc.get((g, 1), 0)
            if n0 + n1 == 0:
                continue
            z = float(n1 - n0) / _math.sqrt(float(n1 + n0))
            out_g.append(g)
            out_n0.append(n0)
            out_n1.append(n1)
            out_z.append(_math.floor(1_000_000.0 * z))
        return pa.table(
            {
                "event_type": pa.array(out_g),
                "n_a": pa.array(out_n0, pa.int64()),
                "n_b": pa.array(out_n1, pa.int64()),
                "z_e6": pa.array(out_z, pa.int64()),
            }
        )

    def q_orphans(sf_dir: str):
        """Crawl-graph health counts: pages with NO outlinks (PageRank
        dangling mass) and pages never linked to (orphans a pure
        link-following crawler would miss). Pages and link endpoints
        are canonicalized with the same URL normalizer; two bounded
        membership checks via broadcast sets of url hashes."""
        import ray
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
            hash64,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
        edges = pages.map_batches(
            LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
        ).map_batches(_canon80_src, batch_format="pyarrow")

        def srcdst_hashes(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src_h": pa.array(
                        [hash64(s) for s in t["src_url"].to_pylist()], pa.int64()
                    ),
                    "dst_h": pa.array(
                        [hash64(d) for d in t["dst_url"].to_pylist()], pa.int64()
                    ),
                }
            )

        # ONE execution of the extraction chain: collect both columns
        eh_rows = edges.map_batches(srcdst_hashes, batch_format="pyarrow").take_all()
        srcs = {r["src_h"] for r in eh_rows}
        dsts = {r["dst_h"] for r in eh_rows}
        src_ref, dst_ref = ray.put(srcs), ray.put(dsts)

        def flags(t: pa.Table) -> pa.Table:
            s_set, d_set = ray.get(src_ref), ray.get(dst_ref)
            hs = [hash64(_canon80(u)) for u in t["url"].to_pylist()]
            no_out = sum(1 for h in hs if h not in s_set)
            no_in = sum(1 for h in hs if h not in d_set)
            return pa.table(
                {
                    "kind": pa.array(["no_outlinks", "no_inlinks"], pa.string()),
                    "n_pages": pa.array([no_out, no_in], pa.int64()),
                }
            )

        from ray.data.aggregate import Sum

        agg = (
            pages.select_columns(["url"])
            .map_batches(flags, batch_format="pyarrow")
            .groupby("kind")
            .aggregate(Sum("n_pages", alias_name="n_pages"))
        )
        return agg

    def q_degree_dist(sf_dir: str):
        """Link-graph degree distribution: for each direction (out =
        per source page, in = per target) the histogram of degrees —
        the power-law shape check every web-graph pipeline runs. Two
        vocab-bounded groupbys (page-cardinality then degree-
        cardinality); edges never leave the cluster."""
        import ray.data as rd
        from ray.data.aggregate import Count as _Count

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
        # materialize ONCE: both directions aggregate the same edges,
        # and a lazy Dataset would re-run the extraction per loop pass
        edges = pages.map_batches(
            LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
        ).materialize()
        out_t, out_d, out_n = [], [], []
        for direction, key in (("out", "src_url"), ("in", "dst_url")):
            deg = (
                edges.groupby(key)
                .aggregate(_Count(alias_name="deg"))
                .groupby("deg")
                .aggregate(_Count(alias_name="n_pages"))
                .take_all()
            )
            for r in deg:
                out_t.append(direction)
                out_d.append(r["deg"])
                out_n.append(r["n_pages"])
        return pa.table(
            {
                "direction": pa.array(out_t, pa.string()),
                "degree": pa.array(out_d, pa.int64()),
                "n_pages": pa.array(out_n, pa.int64()),
            }
        )

    def q_crawl_components(sf_dir: str):
        """Connected components of the (undirected) LINK graph — the
        site-cluster structure consumed by crawl partitioning and
        spam-farm detection. Nodes are hash64 of the canonical URL (the
        engine's doc_id convention); labels are CLUSTER_ROUNDS rounds
        of min-label propagation on the same task-per-block machinery
        as the dedup clusters, and the oracle unrolls the identical
        rounds in SQL from the link-extraction replay."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
            hash64,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
            dup_clusters,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
        edges = pages.map_batches(
            LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
        ).map_batches(_canon80_src, batch_format="pyarrow")


        return dup_clusters(
            edges.map_batches(_undirected_edge_ids, batch_format="pyarrow"),
            rounds=CLUSTER_ROUNDS,
        )

    def q_crawl_label_prop(sf_dir: str):
        """Label-propagation COMMUNITIES of the undirected link graph
        (Raghavan et al. 2007): synchronous rounds of adopt-the-most-
        frequent-neighbour-label with a (count desc, label asc) tie
        break — finer structure than connected components (a component
        splits into link-dense neighbourhoods). Same edge replay as
        ``crawl_components``; the oracle unrolls the identical rounds
        (stages/crawl.py:label_prop_communities)."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            label_prop_communities,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
        edges = pages.map_batches(
            LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
        ).map_batches(_canon80_src, batch_format="pyarrow")
        return label_prop_communities(
            edges.map_batches(_undirected_edge_ids, batch_format="pyarrow"),
            rounds=LP_ROUNDS,
        )

    def q_crawl_modularity(sf_dir: str):
        """Newman modularity of the label-prop partition — one exact-
        integer summary row Q = (4m*intra - sum_c d_c^2)/(4m^2) micros
        (stages/crawl.label_prop_modularity); says whether the
        communities are real structure (Q > 0) or noise."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            label_prop_modularity,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
        edges = pages.map_batches(
            LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
        ).map_batches(_canon80_src, batch_format="pyarrow")
        return label_prop_modularity(
            edges.map_batches(_undirected_edge_ids, batch_format="pyarrow"),
            rounds=LP_ROUNDS,
        )

    def q_crawl_triangles(sf_dir: str):
        """Exact triangle census of the undirected link graph (nodes,
        edges, wedges, triangles, global transitivity) — the clustering
        / link-farm-density signal over the same edge replay as
        ``crawl_components``. Degree-oriented distributed plan
        (``stages/crawl.triangle_stats``): hub wedge fan-out is defused
        by orienting every edge from low (deg, id) to high."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
            hash64,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            triangle_stats,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            distinct_on,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
        edges = pages.map_batches(
            LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
        ).map_batches(_canon80_src, batch_format="pyarrow")


        undirected = distinct_on(
            edges.map_batches(_undirected_edge_ids, batch_format="pyarrow"), ["doc_a", "doc_b"]
        )
        return triangle_stats(undirected)

    def q_crawl_edge_support(sf_dir: str):
        """Top-20 most EMBEDDED link-graph edges (triangles through the
        edge = common neighbours of its endpoints) — the tie-strength /
        link-clique signal; the per-edge refinement of the triangle
        census (``stages/crawl.edge_support_topk``, same degree-
        oriented wedge plan with the wedge centre retained)."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            edge_support_topk,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            distinct_on,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
        edges = pages.map_batches(
            LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
        ).map_batches(_canon80_src, batch_format="pyarrow")
        undirected = distinct_on(
            edges.map_batches(_undirected_edge_ids, batch_format="pyarrow"),
            ["doc_a", "doc_b"],
        )
        return edge_support_topk(undirected, k=20)

    def q_crawl_ktruss(sf_dir: str):
        """3-truss of the link graph (every surviving edge in >= 1
        triangle of the subgraph itself) — iterative distributed
        support-peel (``stages/crawl.ktruss_edges``), one COUNT to the
        driver per round; the twin unrolls the same bounded rounds
        (idempotent once converged)."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            ktruss_edges,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            distinct_on,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
        edges = pages.map_batches(
            LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
        ).map_batches(_canon80_src, batch_format="pyarrow")
        undirected = distinct_on(
            edges.map_batches(_undirected_edge_ids, batch_format="pyarrow"),
            ["doc_a", "doc_b"],
        )
        return ktruss_edges(undirected, k=3, max_rounds=4)

    def q_crawl_assortativity(sf_dir: str):
        """Degree assortativity of the undirected link graph (Newman
        2002) — one exact-integer row: with both edge orientations the
        marginals coincide, so r is a single signed floor division of
        bigint moments (no float anywhere; the twin uses the HUGEINT
        floor emulation). Negative r = hubs link to leaves, the classic
        web signature (stages/crawl.degree_assortativity)."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            degree_assortativity,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            distinct_on,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
        edges = pages.map_batches(
            LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
        ).map_batches(_canon80_src, batch_format="pyarrow")
        undirected = distinct_on(
            edges.map_batches(_undirected_edge_ids, batch_format="pyarrow"),
            ["doc_a", "doc_b"],
        )
        return degree_assortativity(undirected)

    def q_cocitation(sf_dir: str):
        """Co-citation pairs over the link graph: doc pairs cited
        together by >= 4 distinct sources (Small 1973's relatedness
        signal). Same edge replay as the other graph rows; the pair
        explosion and counting run in bounded bucket kernels
        (``stages/crawl.cocitation_pairs``)."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            cocitation_pairs,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
        edges = pages.map_batches(
            LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
        ).map_batches(_canon80_src, batch_format="pyarrow")
        return cocitation_pairs(edges, min_common=4)

    def q_link_jaccard(sf_dir: str):
        """Neighbourhood-Jaccard link relatedness: co-citation pairs
        normalized by the IN-neighbour-set union — jaccard_e6 is an
        exact integer floor the SQL twin replays verbatim
        (stages/crawl.link_jaccard_pairs)."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            link_jaccard_pairs,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
        edges = pages.map_batches(
            LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
        ).map_batches(_canon80_src, batch_format="pyarrow")
        return link_jaccard_pairs(edges, min_common=4)

    def q_bib_coupling(sf_dir: str):
        """Bibliographic coupling over the link graph: src pairs
        sharing >= 3 common targets (Kessler 1963 — the dual of
        co-citation; ``stages/crawl.bib_coupling_pairs`` runs the
        co-citation kernels over the reversed edges)."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            bib_coupling_pairs,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
        edges = pages.map_batches(
            LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
        ).map_batches(_canon80_src, batch_format="pyarrow")
        return bib_coupling_pairs(edges, min_common=3)

    def q_host_graph(sf_dir: str):
        """Host-level link graph (graph coarsening): distinct page
        edges aggregated to (src_host, dst_host, n_links) — the site
        topology view a crawl scheduler partitions by. Distinct page
        edges via the bounded-bucket dedup, hosts by one vectorized
        regex, per-block partial counts merged in a tiny host-pair
        groupby (host cardinality is corpus-bounded)."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            distinct_on,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.shuffle import (
            hash_map_groups,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
        edges = pages.map_batches(
            LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
        ).map_batches(_canon80_src, batch_format="pyarrow")
        dedup = distinct_on(edges, ["src_url", "dst_url"])

        host_re = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/:?#]+)"

        def hosts_partial(t: pa.Table) -> pa.Table:
            sh = pc.utf8_lower(
                pc.replace_substring_regex(t["src_url"], host_re + r".*$", r"\1")
            )
            dh = pc.utf8_lower(
                pc.replace_substring_regex(t["dst_url"], host_re + r".*$", r"\1")
            )
            agg = (
                pa.table({"src_host": sh, "dst_host": dh})
                .group_by(["src_host", "dst_host"])
                .aggregate([([], "count_all")])
            )
            return agg.rename_columns(["src_host", "dst_host", "n"])

        def merge(g: pa.Table) -> pa.Table:
            agg = (
                g.select(["src_host", "dst_host", "n"])
                .group_by(["src_host", "dst_host"])
                .aggregate([("n", "sum")])
            )
            return agg.rename_columns(["src_host", "dst_host", "n_links"])

        partials = dedup.map_batches(hosts_partial, batch_format="pyarrow")
        return hash_map_groups(partials, "src_host", merge, num_partitions=8)

    def q_inlink_concentration(sf_dir: str):
        """Link-farm screen: per link target (>= 5 distinct in-links),
        how concentrated are its in-links in one source HOST —
        top_share_e6 = (1e6 * top-host links) // n_inlinks, exact
        integer floor. A page endorsed overwhelmingly by a single host
        is self-promotion, not authority (the TrustRank-era spam
        signal). Plan: distinct page edges via the bounded-bucket
        dedup, one vectorized host regex, map-side (dst, host) count
        combine, ONE bounded dst-bucket exchange whose kernel finishes
        the sum + per-dst argmax via sort + run detection — never
        per-dst Python."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            _bucket_of,
            distinct_on,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.shuffle import (
            hash_map_groups,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
        edges = pages.map_batches(
            LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
        ).map_batches(_canon80_src, batch_format="pyarrow")
        dedup = distinct_on(edges, ["src_url", "dst_url"])

        host_re = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/:?#]+)"

        def partial(t: pa.Table) -> pa.Table:
            sh = pc.utf8_lower(
                pc.replace_substring_regex(t["src_url"], host_re + r".*$", r"\1")
            )
            agg = (
                pa.table({"dst_url": t["dst_url"], "src_host": sh})
                .group_by(["dst_url", "src_host"])
                .aggregate([([], "count_all")])
            )
            agg = agg.rename_columns(["dst_url", "src_host", "n"])
            return agg.append_column("__bucket", _bucket_of(agg["dst_url"], 64))

        def screen_of_bucket(t: pa.Table) -> pa.Table:
            t = t.drop_columns(["__bucket"])
            agg = t.group_by(["dst_url", "src_host"]).aggregate([("n", "sum")])
            taken = agg.take(
                pc.sort_indices(
                    agg,
                    sort_keys=[
                        ("dst_url", "ascending"),
                        ("n_sum", "descending"),
                        ("src_host", "ascending"),
                    ],
                )
            )
            g = (
                taken["dst_url"]
                .combine_chunks()
                .dictionary_encode()
                .indices.to_numpy(zero_copy_only=False)
            )
            if len(g) == 0:
                return pa.table(
                    {
                        "dst_url": pa.array([], pa.string()),
                        "n_inlinks": pa.array([], pa.int64()),
                        "n_hosts": pa.array([], pa.int64()),
                        "top_host": pa.array([], pa.string()),
                        "top_share_e6": pa.array([], pa.int64()),
                    }
                )
            n = taken["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
            first = np.ones(len(g), dtype=bool)
            first[1:] = g[1:] != g[:-1]
            starts = np.flatnonzero(first)
            totals = np.add.reduceat(n, starts)
            n_hosts = np.diff(np.append(starts, len(g)))
            keep = totals >= 5
            sel = pa.array(starts[keep])
            return pa.table(
                {
                    "dst_url": taken["dst_url"].take(sel),
                    "n_inlinks": pa.array(totals[keep]),
                    "n_hosts": pa.array(n_hosts[keep].astype(np.int64)),
                    "top_host": taken["src_host"].take(sel),
                    "top_share_e6": pa.array(
                        np.floor_divide(1_000_000 * n[starts][keep], totals[keep])
                    ),
                }
            )

        partials = dedup.map_batches(partial, batch_format="pyarrow")
        return hash_map_groups(partials, "__bucket", screen_of_bucket)

    def q_debounce(sf_dir: str):
        """Debounce (burst collapse) of per-(user, type) event streams:
        keep an event only when it is the first of its key or more than
        1 day after the PREVIOUS event (LAG semantics — the dedup rule
        upstream of retention/funnel metrics). One bounded user-bucket
        exchange, one multi-key sort + vectorized LAG mask per bucket —
        the sessionize machinery with a keep-mask instead of run
        aggregation. Non-vacuous at the gate (drops ~36% of events)."""
        import ray.data as rd  # noqa: F401

        gap_us = 86_400 * 1_000_000

        def add_bucket(t: pa.Table) -> pa.Table:
            uid = t["user_id"].to_numpy(zero_copy_only=False)
            return t.append_column("ubucket", pa.array((uid % 64).astype(np.int64)))

        def debounce(group: pa.Table) -> pa.Table:
            idx = pc.sort_indices(
                group,
                sort_keys=[
                    ("user_id", "ascending"),
                    ("event_type", "ascending"),
                    ("ts", "ascending"),
                    ("event_id", "ascending"),
                ],
            )
            g = group.take(idx)
            ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            uid = g["user_id"].to_numpy(zero_copy_only=False)
            et = g["event_type"].combine_chunks().dictionary_encode().indices.to_numpy(
                zero_copy_only=False
            )
            keep = np.ones(ts.size, dtype=bool)
            keep[1:] = (
                (uid[1:] != uid[:-1])
                | (et[1:] != et[:-1])
                | ((ts[1:] - ts[:-1]) > gap_us)
            )
            out = g.filter(pa.array(keep))
            return out.select(["event_id", "user_id", "event_type", "ts"])

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.shuffle import (
            hash_map_groups,
        )

        return hash_map_groups(
            _tbl(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"]).map_batches(
                add_bucket, batch_format="pyarrow", batch_size=None
            ),
            "ubucket",
            debounce,
        )

    def q_crawl_kcore(sf_dir: str):
        """k-core decomposition of the undirected link graph (k=16,
        CLUSTER_ROUNDS peels): the dense-nucleus membership flag per
        node. Same edge replay as ``crawl_components``; iterative
        peeling runs on the task-per-block plan
        (``stages/crawl.kcore_flags``), the oracle unrolls the
        identical fixed rounds in SQL."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.hashing import (
            hash64,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            kcore_flags,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            distinct_on,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
        edges = pages.map_batches(
            LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
        ).map_batches(_canon80_src, batch_format="pyarrow")


        undirected = distinct_on(
            edges.map_batches(_undirected_edge_ids, batch_format="pyarrow"), ["doc_a", "doc_b"]
        )
        return kcore_flags(undirected, k=KCORE_K, rounds=CLUSTER_ROUNDS)

    def q_robots_gate(sf_dir: str):
        # robots-gate decisions over the pages corpus: per-actor host
        # rules cache (the reference's per-JVM cache, Crawler.java:27)
        # + the exact-then-star two-pass decision, aggregated per host;
        # robots bodies are a pure function of the host so the SQL twin
        # replays every decision from embedded rule literals
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            robots_gate_counts,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url"])
        return robots_gate_counts(pages)

    def q_politeness(sf_dir: str):
        # the politeness throttle (Crawler.java:84-91,452-477) as a
        # deterministic batch schedule: url #k of a host fetches at
        # slot k (1 req/s/host) — the earliest-feasible plan the live
        # retry loop converges to
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            politeness_schedule,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url"])
        return politeness_schedule(pages)

    def q_anchor_terms(sf_dir: str):
        # inbound anchor-text signal: dominant anchor term per target
        # page (the ranking signal the reference's link extractor makes
        # available but never consumes)
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            anchor_top_terms,
        )

        pages = rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
        return anchor_top_terms(pages)

    def q_crawl_pagerank(sf_dir: str):
        # iterative PageRank over the extracted link graph — the
        # consumer of the reference's vestigial rank hook
        # (search/Searcher.java:48,155); damping/iterations mirrored
        # exactly by the unrolled-CTE SQL oracle
        import numpy as np
        import pyarrow.parquet as pq
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            pagerank,
        )

        pages_path = pages_for_sf_dir(sf_dir)
        # canonicalize src like the normalizer canonicalizes dst
        # (explicit :80), or the node-restricted edge set is empty
        edges = (
            rd.read_parquet(pages_path, columns=["url", "html"])
            .map_batches(
                LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
            )
            .map_batches(_canon80_src, batch_format="pyarrow")
        )
        urls = [
            _canon80(u)
            for u in pq.read_table(pages_path, columns=["url"])["url"].to_pylist()
        ]
        t = pagerank(edges, urls, damping=PAGERANK_D, iters=PAGERANK_ITERS)
        e9 = np.round(t["rank"].to_numpy(zero_copy_only=False) * 1e9).astype(np.int64)
        return pa.table({"url": t["url"], "rank_e9": pa.array(e9)})

    def q_crawl_ppr(sf_dir: str):
        """Personalized PageRank (the related-pages / TrustRank
        primitive): teleport and dangling mass go uniformly to the 5
        lexicographically smallest page urls instead of all nodes —
        same block-prepped task plan, r_0 = teleport
        (stages/crawl.pagerank with teleport_urls)."""
        import numpy as np
        import pyarrow.parquet as pq
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            pagerank,
        )

        pages_path = pages_for_sf_dir(sf_dir)
        edges = (
            rd.read_parquet(pages_path, columns=["url", "html"])
            .map_batches(
                LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
            )
            .map_batches(_canon80_src, batch_format="pyarrow")
        )
        urls = [
            _canon80(u)
            for u in pq.read_table(pages_path, columns=["url"])["url"].to_pylist()
        ]
        seeds = sorted(set(urls))[:5]
        t = pagerank(
            edges,
            urls,
            damping=PAGERANK_D,
            iters=PAGERANK_ITERS,
            teleport_urls=seeds,
        )
        e9 = np.round(t["rank"].to_numpy(zero_copy_only=False) * 1e9).astype(np.int64)
        return pa.table({"url": t["url"], "rank_e9": pa.array(e9)})

    def q_crawl_hits(sf_dir: str):
        # HITS hubs/authorities over the same link graph — the pagerank
        # physical plan (block-prepped tasks, broadcast score vector),
        # L1-normalized per half-iteration, e9-quantized after the last
        import numpy as np
        import pyarrow.parquet as pq
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            hits,
        )

        pages_path = pages_for_sf_dir(sf_dir)
        edges = (
            rd.read_parquet(pages_path, columns=["url", "html"])
            .map_batches(
                LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
            )
            .map_batches(_canon80_src, batch_format="pyarrow")
        )
        urls = [
            _canon80(u)
            for u in pq.read_table(pages_path, columns=["url"])["url"].to_pylist()
        ]
        t = hits(edges, urls, iters=HITS_ITERS)
        out = {"url": t["url"]}
        for c in ("auth", "hub"):
            out[c + "_e9"] = pa.array(
                np.round(t[c].to_numpy(zero_copy_only=False) * 1e9).astype(np.int64)
            )
        return pa.table(out)

    def q_crawl_salsa(sf_dir: str):
        """SALSA hubs/authorities (Lempel & Moran 2000) over the same
        link graph — the degree-normalized stochastic cousin of HITS
        (one mega-hub can't dominate every authority it touches). Same
        block-prepped broadcast physical plan as pagerank/hits;
        e9-quantized after the last iteration; oracle unrolls the
        degree-divided half-iterations in SQL."""
        import numpy as np
        import pyarrow.parquet as pq
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            salsa,
        )

        pages_path = pages_for_sf_dir(sf_dir)
        edges = (
            rd.read_parquet(pages_path, columns=["url", "html"])
            .map_batches(
                LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
            )
            .map_batches(_canon80_src, batch_format="pyarrow")
        )
        urls = [
            _canon80(u)
            for u in pq.read_table(pages_path, columns=["url"])["url"].to_pylist()
        ]
        t = salsa(edges, urls, iters=HITS_ITERS)
        out = {"url": t["url"]}
        for c in ("auth", "hub"):
            out[c + "_e9"] = pa.array(
                np.round(t[c].to_numpy(zero_copy_only=False) * 1e9).astype(np.int64)
            )
        return pa.table(out)

    def q_frontier_bfs(sf_dir: str):
        # frontier-wave BFS over the extracted link graph (the
        # reference crawler's urlQueue loop, Crawler.java:47-213):
        # per-wave broadcast frontier, vectorized is_in expansion
        import pyarrow.parquet as pq
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            frontier_bfs,
        )

        pages_path = pages_for_sf_dir(sf_dir)
        # src urls canonicalized like dst (:80) or the graph is
        # artificially disconnected — see _canon80
        edges = (
            rd.read_parquet(pages_path, columns=["url", "html"])
            .map_batches(
                LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
            )
            .map_batches(_canon80_src, batch_format="pyarrow")
        )
        seeds = [
            _canon80(u)
            for u in sorted(
                pq.read_table(pages_path, columns=["url"])["url"].to_pylist()
            )[:3]
        ]
        return frontier_bfs(edges, seeds, max_depth=3)

    def q_crawl_closeness(sf_dir: str):
        """Harmonic closeness centrality (Boldi & Vigna 2014's
        preferred closeness variant — sums reciprocals, so
        disconnection needs no special case) of the top-4 out-degree
        hub pages, directed out-BFS within a CLOSENESS_H-hop horizon:
        harmonic_e6 = sum over reached urls of 1e6 // depth — exact
        integer floors, so the row is hash-exact. Seeds are (out_deg
        desc, url); the BFS reuses the broadcast-frontier machinery of
        ``crawl_frontier_bfs`` (one edge materialization, seeds x H
        bounded waves); out-degrees are a vectorized per-batch combine
        + a src-bounded driver fold (the ``crawl_link_jaccard``
        discipline)."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            frontier_bfs,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            distinct_on,
        )

        edges = (
            rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
            .map_batches(
                LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
            )
            .map_batches(_canon80_src, batch_format="pyarrow")
        )
        ded = distinct_on(edges, ["src_url", "dst_url"]).materialize()

        def deg_partial(t: pa.Table) -> pa.Table:
            return (
                t.select(["src_url"])
                .group_by("src_url")
                .aggregate([([], "count_all")])
            )

        deg: dict[str, int] = {}
        for r in ded.map_batches(deg_partial, batch_format="pyarrow").take_all():
            deg[r["src_url"]] = deg.get(r["src_url"], 0) + r["count_all"]
        seeds = sorted(deg, key=lambda u: (-deg[u], u))[:CLOSENESS_SEEDS]

        out_seed, out_deg, out_n, out_h = [], [], [], []
        for seed in seeds:
            reach = frontier_bfs(ded, [seed], max_depth=CLOSENESS_H)
            depths = reach["depth"].to_numpy(zero_copy_only=False)
            out_seed.append(seed)
            out_deg.append(deg[seed])
            out_n.append(int((depths > 0).sum()))
            out_h.append(int(sum(1_000_000 // int(d) for d in depths if d > 0)))
        return pa.table(
            {
                "seed": pa.array(out_seed, pa.string()),
                "out_deg": pa.array(out_deg, pa.int64()),
                "n_reached": pa.array(out_n, pa.int64()),
                "harmonic_e6": pa.array(out_h, pa.int64()),
            }
        )

    def q_crawl_bowtie(sf_dir: str):
        """Bow-tie decomposition of the directed link graph around its
        strongest hub (Broder et al. 2000, "Graph structure in the
        web"): pivot = max (out_deg, url asc); forward and backward
        BFS within a BOWTIE_H-hop horizon give F = reachable-from and
        B = reaching; CORE (the pivot's SCC, horizon-capped) = F AND B,
        IN = B \\ CORE, OUT = F \\ CORE, OTHER = tendrils +
        disconnected. ONE exact-count row. Both BFS runs reuse the
        broadcast-frontier machinery (the backward walk is the same
        kernel over column-swapped edges); the reach sets are
        node-bounded driver state (the crawl_link_jaccard discipline)."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            pages_for_sf_dir,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
            frontier_bfs,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            distinct_on,
        )

        edges = (
            rd.read_parquet(pages_for_sf_dir(sf_dir), columns=["url", "html"])
            .map_batches(
                LinkExtractStage, batch_format="pyarrow", batch_size=512, concurrency=4
            )
            .map_batches(_canon80_src, batch_format="pyarrow")
        )
        ded = distinct_on(edges, ["src_url", "dst_url"]).materialize()

        # pivot = (max out-degree, url asc): a DISTRIBUTED aggregate +
        # top-1, not a driver degree dict (the dict was O(nodes) driver
        # state — the last graph-glue driver vector, removed round 4)
        from ray.data.aggregate import Sum

        def deg_partial(t: pa.Table) -> pa.Table:
            return (
                t.select(["src_url"]).group_by("src_url").aggregate([([], "count_all")])
            )

        pivot_row = (
            ded.map_batches(deg_partial, batch_format="pyarrow")
            .groupby("src_url")
            .aggregate(Sum("count_all", alias_name="deg"))
            .sort(["deg", "src_url"], descending=[True, False])
            .limit(1)
            .take(1)
        )
        pivot = pivot_row[0]["src_url"]

        def node_partial(t: pa.Table) -> pa.Table:
            u = pa.concat_arrays(
                [t["src_url"].combine_chunks(), t["dst_url"].combine_chunks()]
            )
            return pa.table({"url": u.unique()})

        n_nodes = distinct_on(
            ded.map_batches(node_partial, batch_format="pyarrow"), ["url"]
        ).count()

        rev = ded.map_batches(
            lambda t: pa.table(
                {"src_url": t["dst_url"], "dst_url": t["src_url"]}
            ),
            batch_format="pyarrow",
        ).materialize()

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.graph import (
            resolve_plan,
        )

        if resolve_plan("auto", n_nodes) == "bucketed":
            # reach sets stay SHARDED in the BFS visited actors; the
            # bow-tie sizes come from per-bucket set algebra (both runs
            # bucket by the same url hash, so bucket b of F and bucket
            # b of B hold the same key space) — no global reach set
            # anywhere, only 4B counts cross the driver
            import ray

            from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
                frontier_reach_shards,
            )

            BKT = 16
            fsh = frontier_reach_shards(ded, [pivot], max_depth=BOWTIE_H, num_buckets=BKT)
            bsh = frontier_reach_shards(rev, [pivot], max_depth=BOWTIE_H, num_buckets=BKT)

            @ray.remote
            def bucket_counts(fk, bk):
                sf, sb = set(fk), set(bk)
                return len(sf), len(sb), len(sf & sb), len(sf | sb)

            parts = ray.get(
                [
                    bucket_counts.remote(fsh[b].keys.remote(), bsh[b].keys.remote())
                    for b in range(BKT)
                ]
            )
            n_fwd = sum(p[0] for p in parts)
            n_bwd = sum(p[1] for p in parts)
            n_core = sum(p[2] for p in parts)
            n_union = sum(p[3] for p in parts)
        else:
            fwd = set(
                frontier_bfs(ded, [pivot], max_depth=BOWTIE_H)["url"].to_pylist()
            )
            bwd = set(
                frontier_bfs(rev, [pivot], max_depth=BOWTIE_H)["url"].to_pylist()
            )
            n_fwd, n_bwd = len(fwd), len(bwd)
            n_core, n_union = len(fwd & bwd), len(fwd | bwd)
        return pa.table(
            {
                "pivot": pa.array([pivot], pa.string()),
                "n_nodes": pa.array([n_nodes], pa.int64()),
                "n_core": pa.array([n_core], pa.int64()),
                "n_in": pa.array([n_bwd - n_core], pa.int64()),
                "n_out": pa.array([n_fwd - n_core], pa.int64()),
                "n_other": pa.array([n_nodes - n_union], pa.int64()),
            }
        )

    def q_media_features(sf_dir: str):
        # rows-only: synthetic media corpus (no media in the sf tables).
        # REAL decode: BMP/WAV/WSMV payloads -> pixels/samples ->
        # thumbnail/spectrum features (functions/media_codecs.py)
        import ray.data as rd

        ds = rd.from_arrow(synth_media(MEDIA_N))
        return ds.map_batches(
            MediaFeatureStage, batch_format="pyarrow", batch_size=16, concurrency=2
        ).map_batches(
            lambda t: t.select(
                ["media_id", "kind", "payload_bytes", "payload_sha1", "decoded",
                 "width", "height", "duration_ms"]
            ),
            batch_format="pyarrow",
        )

    def q_media_thumbs(sf_dir: str):
        """Image thumbnailing (decode -> aspect-fit nearest-neighbor
        resample -> re-encode) over the synthetic near-dup image corpus;
        the oracle embeds the pure-function replay's payload size/sha1
        and re-derives the floor-arithmetic dimension rule in SQL."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
            ThumbnailStage,
            synth_images_neardup,
        )

        ds = rd.from_arrow(synth_images_neardup(200))
        return ds.map_batches(
            ThumbnailStage, batch_format="pyarrow", batch_size=32, concurrency=2
        ).map_batches(
            lambda t: t.drop_columns(["thumb"]), batch_format="pyarrow"
        )

    def q_media_image_stats(sf_dir: str):
        """Exact integer per-image channel statistics (means, luma
        range, dark/bright counts) over the synthetic image corpus —
        REAL BMP decode per row; the oracle embeds the statistics of
        the PRE-ENCODE pixel arrays (decode-inverts-encode, the
        media_features contract) as VALUES
        (stages/multimodal.py:ImageStatsStage)."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
            ImageStatsStage,
            synth_images_neardup,
        )

        ds = rd.from_arrow(synth_images_neardup(200))
        return ds.map_batches(
            ImageStatsStage, batch_format="pyarrow", batch_size=32, concurrency=2
        )

    def q_media_scene_cuts(sf_dir: str):
        """Shot-boundary detection (pixel-difference method) over the
        scene-structured synthetic video corpus: per clip, the number
        of hard cuts — exact integer sum|a-b| > thr*n compare, every
        frame really decoded. The oracle embeds the pure-function
        replay per clip; pytest separately asserts the PLANTED scene
        count is recovered (stages/multimodal.SceneCutStage)."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
            SceneCutStage,
            synth_video_scenes,
        )

        ds = rd.from_arrow(synth_video_scenes(120))
        return ds.map_batches(
            SceneCutStage, batch_format="pyarrow", batch_size=16, concurrency=2
        )

    def q_media_audio_segments(sf_dir: str):
        """Energy-based audio activity segmentation (the VAD primitive)
        over the burst-structured synthetic corpus: per clip, active
        windows and activity segments — exact integer
        sum(x^2) > thr^2*n compare, real WAV decode. The oracle embeds
        the pure-function replay; pytest asserts the PLANTED burst
        count is recovered (stages/multimodal.AudioSegmentStage)."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
            AudioSegmentStage,
            synth_audio_segments,
        )

        ds = rd.from_arrow(synth_audio_segments(120))
        return ds.map_batches(
            AudioSegmentStage, batch_format="pyarrow", batch_size=16, concurrency=2
        )

    def q_media_resample(sf_dir: str):
        """Audio decimation (factor-2 downsample) over the synthetic
        near-dup audio corpus; the oracle embeds source sample counts +
        the pure-function replay's payload size/sha1 and re-derives the
        decimation arithmetic (ceil-division output length, halved
        rate) in SQL."""
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
            AudioResampleStage,
            synth_audio_neardup,
        )

        ds = rd.from_arrow(synth_audio_neardup(120))
        return ds.map_batches(
            AudioResampleStage, batch_format="pyarrow", batch_size=16, concurrency=2
        )

    def q_media_frames(sf_dir: str):
        # rows-only: per-frame explode of the video payloads — each
        # sampled frame is sliced out via the container offset table and
        # BMP-decoded (mean_luma/frame_sha1 are of the actual pixels)
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
            FrameSampleStage,
        )

        tbl = synth_media(MEDIA_N)
        vids = tbl.filter(pc.equal(tbl["kind"], "video"))

        def round_luma(t: pa.Table) -> pa.Table:
            # float parity discipline (module docstring): round the one
            # float column for the driver's value hash — DuckDB parses
            # decimal literals through DECIMAL, off the exact double by
            # ~1 ulp
            return t.set_column(
                t.schema.get_field_index("mean_luma"),
                "mean_luma",
                pc.round(t["mean_luma"], ndigits=6),
            )

        return (
            rd.from_arrow(vids)
            .map_batches(
                FrameSampleStage, batch_format="pyarrow", batch_size=8, concurrency=2
            )
            .map_batches(round_luma, batch_format="pyarrow")
        )

    def q_bloom_join(sf_dir: str):
        # Bloom-pruned inner join: the dim side's keys fold into ONE
        # broadcast bitset; fact rows that cannot match never enter the
        # all-to-all exchange (stages/ops.py:bloom_join). Result rows
        # identical to the plain shuffle join by construction.
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            bloom_join,
        )

        li = _tbl(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        od = _tbl(
            sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_orderpriority"]
        ).filter(expr="o_orderstatus == 'F'")
        od = od.map_batches(
            lambda t: pa.table(
                {"l_orderkey": t["o_orderkey"], "o_orderpriority": t["o_orderpriority"]}
            ),
            batch_format="pyarrow",
        )
        j = bloom_join(
            li,
            od,
            "l_orderkey",
            fact_cols=["l_quantity"],
            dim_cols=["o_orderpriority"],
            nbits=1 << 20,
        )
        def prep(t: pa.Table) -> pa.Table:
            # per-value e2 quantization BEFORE the Sum: integer totals
            return pa.table(
                {
                    "o_orderpriority": t["o_orderpriority"],
                    "q_e2": pc.round(
                        pc.multiply(t["l_quantity"], 100.0),
                        round_mode="half_towards_infinity",
                    ).cast(pa.int64()),
                }
            )

        agg = j.map_batches(prep, batch_format="pyarrow").groupby("o_orderpriority").aggregate(
            Count(alias_name="n_items"), Sum("q_e2", alias_name="qty_e2")
        )
        return agg.map_batches(
            lambda t: t.select(["o_orderpriority", "n_items", "qty_e2"]),
            batch_format="pyarrow",
        )

    def q_weighted_sample(sf_dir: str):
        # sequential Poisson (order) sampling, Ohlsson 1998: priority =
        # hash64(doc_id) // n_chars, EXACT integer arithmetic — the 50
        # winners replay bit-for-bit in SQL. Longer docs win more often.
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            weighted_sample,
        )

        return weighted_sample(
            _tbl(sf_dir, "documents", ["doc_id", "source", "n_chars"]),
            id_col="doc_id",
            weight_col="n_chars",
            n=50,
        )

    def q_heavy_hitters(sf_dir: str):
        # exact frequent terms in two passes (Misra-Gries candidates +
        # exact recount) — never shuffles the full vocabulary
        # (stages/ops.py:heavy_hitters)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
            flat_tokens_batch,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            heavy_hitters,
        )

        def partials(t: pa.Table) -> pa.Table:
            flat, _parents, _n = flat_tokens_batch(t["text"])
            tt = pa.table({"term": flat}).group_by("term").aggregate([([], "count_all")])
            return pa.table(
                {"term": tt["term"], "c": tt["count_all"].cast(pa.int64())}
            )

        def mk():
            return _tbl(sf_dir, "documents", ["text"]).map_batches(
                partials, batch_format="pyarrow"
            )

        return heavy_hitters(mk, "term", "c", threshold_fraction=0.005)

    def q_search_scatter(sf_dir: str) -> pa.Table:
        # DOC-RANGE-sharded serving (the 100-TB layout): global exact
        # dedup -> split winners by doc_id range -> one full index per
        # range -> per-query global stats (sum N/total_len/df) pushed
        # to every shard -> each shard scores its own docs completely
        # -> exact cross-shard top-k merge. Bit-identical to the
        # monolithic index (same flagship oracle).
        from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
            SearchIndex,
            scatter_gather_topk,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        shard_dirs = _cached_scatter_dirs(sf_dir, n_ranges=2)
        shards = [SearchIndex.load(d) for d in shard_dirs]
        qids, ranks, doc_ids, scores = [], [], [], []
        for qid, q in reference_queries():
            ranked = scatter_gather_topk(shards, q, k=50)
            e6 = sorted(
                ((int(round(s * 1_000_000)), d) for d, s in ranked),
                key=lambda t: (-t[0], t[1]),
            )[:10]
            for r, (s6, d) in enumerate(e6):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                scores.append(s6)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score_e6": pa.array(scores, pa.int64()),
            }
        )

    def q_search_parallel(sf_dir: str):
        # serving-tier query parallelism as a Ray Data stage: the query
        # set is a Dataset; an ACTOR POOL evaluates it, each actor
        # loading the index ONCE in __init__ (mmap'd shards) — the
        # replicated-index / query-partitioned layout, which is the
        # reference's own serving shape (one full Searcher per worker,
        # Searcher.java:29-57). At 100 TB the index outgrows one node
        # and the layout becomes doc-range shards with scatter-gather
        # top-k merge (each shard scores its own docs fully; partial
        # top-k merges exactly because scores are doc-complete per
        # shard) — the merge here is the same e6 cut either way.
        # Results identical to search_bm25_wand; same flagship oracle.
        import ray.data as rd

        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        out_dir = _cached_index_dir(sf_dir)

        class QueryScorer:
            def __init__(self, idx_dir: str):
                from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
                    SearchIndex,
                )

                self.idx = SearchIndex.load(idx_dir)

            def __call__(self, batch: pa.Table) -> pa.Table:
                qids, ranks, doc_ids, scores = [], [], [], []
                for qid, q in zip(
                    batch["qid"].to_pylist(), batch["query"].to_pylist()
                ):
                    ranked = self.idx.bm25_topk(q, k=50)
                    e6 = sorted(
                        ((int(round(s * 1_000_000)), d) for d, s in ranked),
                        key=lambda t: (-t[0], t[1]),
                    )[:10]
                    for r, (s6, d) in enumerate(e6):
                        qids.append(qid)
                        ranks.append(r)
                        doc_ids.append(d)
                        scores.append(s6)
                return pa.table(
                    {
                        "qid": pa.array(qids, pa.int64()),
                        "rank": pa.array(ranks, pa.int64()),
                        "doc_id": pa.array(doc_ids, pa.int64()),
                        "score_e6": pa.array(scores, pa.int64()),
                    }
                )

        qs = rd.from_items(
            [{"qid": qid, "query": q} for qid, q in reference_queries()]
        )
        return qs.map_batches(
            QueryScorer,
            batch_format="pyarrow",
            batch_size=8,
            concurrency=(1, 4),
            fn_constructor_kwargs={"idx_dir": out_dir},
        )

    def q_search_prf(sf_dir: str) -> pa.Table:
        # pseudo-relevance-feedback (Rocchio-style) query expansion:
        # round-1 BM25 top-10 -> expansion terms from the feedback
        # docs' bodies by the INTEGER offer rule (r_t desc, total tf
        # desc, term asc; never floats) -> round-2 BM25 with expansion
        # terms damped 0.5 (pipelines/query.py:bm25_weighted_topk).
        # The reference's searcher is single-round additive-OR
        # (Searcher.java:139-150); PRF is the classic IR extension.
        from collections import Counter

        from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
            tokenize,
            tokenize_query,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
            DocStore,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
            reference_queries,
        )

        idx = _cached_index(sf_dir)
        store = DocStore(idx._docstore_path)
        qids, ranks, doc_ids, scores = [], [], [], []
        for qid, q in reference_queries():
            r1 = idx.bm25_topk(q, k=50)
            e61 = sorted(
                ((int(round(s * 1_000_000)), d) for d, s in r1),
                key=lambda t: (-t[0], t[1]),
            )[:10]
            fb = [d for _, d in e61]
            orig = tokenize_query(q)
            oset = set(orig)
            r_t: Counter = Counter()
            ttf: Counter = Counter()
            if fb:
                rows = store.lookup(fb)
                for d in fb:
                    for t, n in Counter(tokenize(rows[d]["body"])).items():
                        if t in oset:
                            continue
                        r_t[t] += 1
                        ttf[t] += n
            exp = sorted(r_t, key=lambda t: (-r_t[t], -ttf[t], t))[:3]
            weighted = [(t, 1.0) for t in orig] + [(t, 0.5) for t in exp]
            r2 = idx.bm25_weighted_topk(weighted, k=50)
            e62 = sorted(
                ((int(round(s * 1_000_000)), d) for d, s in r2),
                key=lambda t: (-t[0], t[1]),
            )[:10]
            for r, (s6, d) in enumerate(e62):
                qids.append(qid)
                ranks.append(r)
                doc_ids.append(d)
                scores.append(s6)
        return pa.table(
            {
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "score_e6": pa.array(scores, pa.int64()),
            }
        )

    def q_bigram_loglik(sf_dir: str):
        # bigram-LM transition surprisal (the KenLM-flavored upgrade of
        # text_unigram_loglik): weights e6-quantized per distinct
        # bigram BEFORE the per-doc sum, so sums are exact int64
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            bigram_loglik,
        )

        return bigram_loglik(_tbl(sf_dir, "documents", ["doc_id", "text"]))

    def q_phash_dups(sf_dir: str):
        # image near-dup pairs by perceptual hash: pHash actor pool +
        # the generic pigeonhole banding (stages/multimodal.py:
        # phash_near_dups); deterministic synthetic corpus with planted
        # +-2-noise near-duplicate variants
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
            phash_near_dups,
            synth_images_neardup,
        )

        import ray.data as rd

        media = rd.from_arrow(
            synth_images_neardup(200).select(["media_id", "payload"])
        )
        pairs = phash_near_dups(media, max_hamming=3)
        return pairs.map_batches(
            lambda t: pa.table(
                {
                    "media_a": t["doc_a"],
                    "media_b": t["doc_b"],
                    "hamming": t["hamming"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    def q_audio_dups(sf_dir: str):
        # audio near-dup pairs by band-energy fingerprint: AudioFPStage
        # actor pool + the generic pigeonhole banding (the third
        # hamming_band_pairs consumer after SimHash text and pHash
        # images); deterministic synthetic clips with planted
        # gain/noise near-duplicate variants
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
            audio_near_dups,
            synth_audio_neardup,
        )

        import ray.data as rd

        media = rd.from_arrow(
            synth_audio_neardup(200).select(["media_id", "payload"])
        )
        pairs = audio_near_dups(media, max_hamming=3)
        return pairs.map_batches(
            lambda t: pa.table(
                {
                    "media_a": t["doc_a"],
                    "media_b": t["doc_b"],
                    "hamming": t["hamming"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    def q_video_dups(sf_dir: str):
        # video near-dup pairs by XOR-of-frame-pHashes fingerprint:
        # VideoFPStage actor pool (stride-sampled frames decoded via
        # the WSMV offset table) + the generic pigeonhole banding (the
        # FOURTH hamming_band_pairs consumer); deterministic synthetic
        # clips with planted noise/brightness near-duplicate variants
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
            synth_video_neardup,
            video_near_dups,
        )

        import ray.data as rd

        media = rd.from_arrow(
            synth_video_neardup(120).select(["media_id", "payload"])
        )
        pairs = video_near_dups(media, max_hamming=4)
        return pairs.map_batches(
            lambda t: pa.table(
                {
                    "media_a": t["doc_a"],
                    "media_b": t["doc_b"],
                    "hamming": t["hamming"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    def q_winsorized(sf_dir: str):
        # per-type winsorized (p5/p95-clipped) value aggregate — exact
        # int64 end-to-end (stages/ops.py:winsorized_sum)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            winsorized_sum,
        )

        return winsorized_sum(
            lambda: _tbl(sf_dir, "events", ["event_type", "value"]),
            "event_type",
            "value",
        )

    def q_kmeans(sf_dir: str):
        # exact-integer Lloyd k-means (micro-quantized coords, int64
        # distances, floor-div centroid updates) — every iteration
        # replays bit-for-bit in the unrolled-CTE SQL twin
        # (stages/ann.py:kmeans_assign)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
            kmeans_assign,
        )

        return kmeans_assign(
            _tbl(sf_dir, "embeddings", ["vec_id", "embedding"]), k=8, iters=3
        )

    def q_cluster_topics(sf_dir: str):
        """Topic clustering without an embedding model: hashed
        token-count features (the hashing trick, dim=8) through the
        exact-integer k-means — the mixture-balancing primitive. The
        twin re-derives the features in SQL and chains the shared
        unrolled-CTE k-means replay
        (stages/textstats.doc_hash_features + stages/ann.kmeans_assign)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
            kmeans_assign,
        )
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            doc_hash_features,
        )

        feats = doc_hash_features(
            _tbl(sf_dir, "documents", ["doc_id", "text"]), dim=8
        )
        out = kmeans_assign(feats, k=4, iters=2)
        return out.map_batches(
            lambda t: t.rename_columns(["doc_id", "cluster", "dist"]),
            batch_format="pyarrow",
        )

    def q_dedup_semantic(sf_dir: str):
        # SemDeDup (Abbas et al. 2023): exact-integer k-means clusters,
        # then within-cluster cosine keep-first dedup — one bounded
        # exchange on the cluster id (stages/ann.py:semantic_dedup)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
            semantic_dedup,
        )

        return semantic_dedup(
            _tbl(sf_dir, "embeddings", ["vec_id", "embedding"]),
            k=8,
            iters=3,
            threshold=0.42,
        )

    def q_dedup_winnowing(sf_dir: str):
        """Winnowing fingerprint pairs (Schleimer et al. 2003 — MOSS):
        doc pairs sharing >= 2 window-min char-gram fingerprints — the
        LOCALIZED copied-passage detector (MinHash sketches global
        similarity; winnowing guarantees any shared substring of
        length >= gram+window-1 yields a shared fingerprint)
        (stages/dedup.winnowing_pairs)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
            winnowing_pairs,
        )

        return winnowing_pairs(
            _tbl(sf_dir, "documents", ["doc_id", "text"]),
            gram_len=16,
            window=8,
            min_shared=2,
        )

    def q_dedup_substring(sf_dir: str):
        # char-32-gram cross-doc duplicated-substring accounting — the
        # n-gram approximation of suffix-array substring dedup (Lee et
        # al. 2022); int64-hash exchanges only
        # (stages/dedup.py:substring_dedup_stats)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
            substring_dedup_stats,
        )

        return substring_dedup_stats(_tbl(sf_dir, "documents", ["doc_id", "text"]))

    def q_more_like_this(sf_dir: str):
        """'More like this' related-document retrieval: top-5 tf-idf
        cosine neighbours for each of the 8 lowest-doc_id documents.
        Exact-int64 weights (tf * per-term idf_e3) make the scores
        hash-reproducible (stages/textstats.py:more_like_this)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
            more_like_this,
        )

        return more_like_this(
            _tbl(sf_dir, "documents", ["doc_id", "text"]), n_seeds=8, k=5
        )

    def q_pack_sequences(sf_dir: str):
        """Sequence packing (GPT/Megatron-style sample index): canonical
        tokens + 1 EOS per doc, concatenated in doc_id order, split into
        fixed 256-token training chunks; one row per (doc, chunk) span.
        Narrow (id, n) metadata-only prefix-sum — the text never moves
        (stages/ops.py:pack_sequence_spans)."""
        from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
            pack_sequence_spans,
        )

        return pack_sequence_spans(
            _tbl(sf_dir, "documents", ["doc_id", "text"]), seq_len=256
        )

    return {
        "search_bm25_wand": q_search_bm25,
        "search_bm25_tiered": q_search_tiered,
        "search_bm25_mmr": q_search_mmr_div,
        "search_rrf": q_search_rrf,
        "search_ltr_features": q_search_ltr,
        "search_reference_tfidf": q_search_tfidf,
        "search_eval_ndcg": q_search_ndcg,
        "search_eval_mrr": q_search_mrr,
        "search_eval_map": q_search_map,
        "search_bm25_stemmed": q_search_stemmed,
        # MaxScore dynamic pruning, same contract (and oracle) as WAND
        "search_bm25_maxscore": lambda sf_dir: _search_table(
            sf_dir, "bm25", method="maxscore"
        ),
        # query-likelihood / Dirichlet LM ranking over the same index
        # (SearchIndex.lm_dirichlet_topk — Zhai & Lafferty 2001)
        "search_lm_dirichlet": lambda sf_dir: _search_table(sf_dir, "lm"),
        # stateless cursor pagination: page 2 fetched through the
        # search-after API (SearchIndex.bm25_topk_after — the cursor is
        # page 1's last (score_e6, doc_id); no scroll state server-side)
        "search_page2": q_search_page2,
        "search_bm25_conjunctive": q_search_conj,
        "search_bm25_mm": q_search_mm,
        "search_dismax": q_search_dismax,
        "search_qpp": q_search_qpp,
        "search_explain": q_search_explain,
        "search_bm25f": q_search_bm25f,
        "index_shard_stats": q_index_shard_stats,
        "search_phrase": q_search_phrase,
        "search_phrase_positional": q_search_phrase_positional,
        "search_boolean_and": q_search_boolean,
        "search_bm25_title": q_search_title,
        "search_bm25_anchor": q_search_anchor,
        "search_bm25_anchor_field": q_search_anchor_field,
        "search_bm25f_all_fields": q_search_bm25f_all_fields,
        "search_boolean_not": q_search_not,
        "search_site_filter": q_search_site,
        "search_intitle": q_search_intitle,
        "search_bm25_collapsed": q_search_collapsed,
        "search_facets": q_search_facets,
        "search_recency_boost": q_search_recency,
        "search_prf_expand": q_search_prf,
        "search_bm25_parallel": q_search_parallel,
        "search_bm25_scatter": q_search_scatter,
        "search_snippet": q_search_snippet,
        "search_proximity": q_search_proximity,
        "index_update_stats": q_index_update_stats,
        "index_update_segment_stats": q_index_update_segment_stats,
        "search_segment_bm25": q_search_segment_bm25,
        "index_delete_stats": q_index_delete_stats,
        "ingest_jsonl_pages": q_ingest_jsonl,
        "ingest_ipc_pages": q_ingest_ipc,
        "ingest_csv_pages": q_ingest_csv,
        "ingest_warc_pages": q_ingest_warc,
        "doc_term_stats": q_doc_term_stats,
        "doc_bm25_topk": q_doc_bm25,
        "doc_tfidf_topk": q_doc_tfidf,
        "text_token_stats": q_token_stats,
        "text_lang_id": q_lang_id,
        "text_source_overlap": q_source_overlap,
        "text_lang_eval": q_lang_eval,
        "text_repetition": q_repetition,
        "text_collocations": q_collocations,
        "text_cooccurrence": q_cooccurrence,
        "text_textrank": q_textrank,
        "text_pmi": q_pmi,
        "text_nb_lang": q_nb_lang,
        "text_quality": q_quality,
        "text_fingerprint": q_fingerprint,
        "text_stem_vocab": q_stem_vocab,
        "text_cms_counts": q_cms_counts,
        "text_vocab_neighbors": q_vocab_neighbors,
        "text_chunk_overlap": q_chunk_overlap,
        "text_sentence_stats": q_sentence_stats,
        "text_readability": q_readability,
        "text_entropy": q_entropy,
        "crawl_path_depth": q_path_depth,
        "text_embed_hash": q_embed_hash,
        "text_compress_ratio": q_compress_ratio,
        "text_pii_scrub": q_pii_scrub,
        "text_spell_correct": q_spell_correct,
        "text_keywords": q_keywords,
        "dedup_chunks": q_dedup_chunks,
        "text_domain_mix": q_domain_mix,
        "text_unigram_loglik": q_unigram_loglik,
        "text_bigram_loglik": q_bigram_loglik,
        "text_decontaminate": q_decontaminate,
        "pipeline_data_prep": q_data_prep,
        "pipeline_data_prep_v2": q_data_prep_v2,
        "text_bpe_count": q_bpe_count,
        "text_pack_sequences": q_pack_sequences,
        "text_more_like_this": q_more_like_this,
        "dedup_exact": q_dedup_exact,
        "dedup_source_report": q_dedup_source_report,
        "dedup_shingle_coverage": q_shingle_coverage,
        "dedup_exact_losers": q_dedup_losers,
        "dedup_ngram_jaccard": q_dedup_jaccard,
        "dedup_cluster_components": q_dedup_clusters,
        "dedup_cluster_cap": q_dedup_cluster_cap,
        "dedup_minhash_lsh": q_dedup_minhash,
        "dedup_minhash_eval": q_dedup_eval,
        "dedup_simhash": q_dedup_simhash,
        "knn_cosine_topk": q_knn,
        "knn_matryoshka_topk": q_knn_matryoshka,
        "knn_filtered_topk": q_knn_filtered,
        "rel_basket_pairs": q_basket_pairs,
        "embedding_centroids": q_embedding_centroids,
        "embedding_dim_stats": q_embedding_dim_stats,
        "knn_mutual_pairs": q_mutual_knn,
        "knn_range_search": q_knn_range,
        "knn_kmeans_assign": q_kmeans,
        "dedup_semantic": q_dedup_semantic,
        "text_cluster_topics": q_cluster_topics,
        "knn_lsh_topk": q_knn_lsh,
        "knn_lsh_recall": q_knn_recall,
        "knn_matryoshka_recall": q_matryoshka_recall,
        "knn_ivf_topk": q_knn_ivf,
        "knn_pq_topk": q_knn_pq,
        "knn_ivfpq_topk": q_knn_ivfpq,
        "embedding_near_dups": q_near_dups,
        "rel_groupby_agg": q_groupby_agg,
        "rel_broadcast_join_agg": q_broadcast_join,
        "rel_distinct": q_distinct,
        "rel_string_agg": q_string_agg,
        "rel_intersection": q_intersection,
        "rel_except": q_except,
        "rel_cogroup_counts": q_cogroup,
        "rel_window_hour": q_window_hour,
        "rel_grouped_distinct": q_grouped_distinct,
        "rel_grouped_mode": q_grouped_mode,
        "rel_funnel": q_funnel,
        "rel_retention": q_retention,
        "rel_stream_window": q_stream_window,
        "text_quality_percentile": q_quality_percentile,
        "rel_topk_events": q_topk_events,
        "rel_fold": q_fold,
        "rel_sample": q_sample,
        "rel_sample_replace": q_sample_replace,
        "rel_union_count": q_union,
        "rel_shuffle_join_agg": q_shuffle_join,
        "rel_outer_join": q_outer_join,
        "rel_left_join": q_left_join,
        "rel_running_total": q_running_total,
        "rel_epoch_shuffle": q_epoch_shuffle,
        "rel_late_events": q_late_events,
        "rel_new_vs_returning": q_new_vs_returning,
        "rel_range_window_sum": q_range_window_sum,
        "rel_hopping_window": q_hopping_window,
        "rel_profile": q_profile,
        "rel_skew_join_agg": q_skew_join,
        "rel_star_topk": q_rel_star,
        "rel_star_q5": q_rel_star_q5,
        "rel_tpch_q3": q_tpch_q3,
        "rel_tpch_q18": q_tpch_q18,
        "rel_promo_share": q_promo_share,
        "rel_small_qty_share": q_small_qty_share,
        "rel_supplier_rank": q_supplier_rank,
        "rel_bloom_join_agg": q_bloom_join,
        "rel_weighted_sample": q_weighted_sample,
        "text_heavy_hitters": q_heavy_hitters,
        "dedup_substring": q_dedup_substring,
        "dedup_winnowing": q_dedup_winnowing,
        "rel_approx_distinct_kmv": q_kmv_distinct,
        "rel_kmv_union": q_kmv_union,
        "rel_hll_registers": q_hll_registers,
        "rel_unpivot": q_unpivot,
        "rel_zip_with_index": q_zip_with_index,
        "rel_hash_split": q_hash_split,
        "rel_sessionize": q_sessionize,
        "rel_bounce_rate": q_bounce_rate,
        "rel_scd2": q_scd2,
        "rel_session_paths": q_session_paths,
        "search_hybrid_rerank": q_search_hybrid,
        "crawl_salsa": q_crawl_salsa,
        "crawl_inlink_concentration": q_inlink_concentration,
        "rel_event_transitions": q_event_transitions,
        "rel_markov": q_markov,
        "rel_ntile": q_ntile,
        "rel_hist_quantiles": q_hist_quantiles,
        "rel_forward_fill": q_forward_fill,
        "rel_decayed_sum": q_decayed_sum,
        "rel_arg_extremes": q_arg_extremes,
        "rel_streak": q_streak,
        "rel_dense_hourly": q_dense_hourly,
        "rel_anti_join": q_anti_join,
        "rel_semi_join": q_semi_join,
        "rel_topn_per_group": q_topn_per_group,
        "rel_group_sample": q_group_sample,
        "rel_moving_avg": q_moving_avg,
        "rel_rollup": q_rollup,
        "rel_pivot": q_pivot,
        "rel_cube": q_cube,
        "rel_grouping_sets": q_grouping_sets,
        "rel_quantiles": q_quantiles,
        "rel_quantiles_cont": q_quantiles_cont,
        "rel_segment_order_median": q_segment_order_median,
        "rel_rfm": q_rfm,
        "rel_mad_outliers": q_mad_outliers,
        "rel_percentile_rank": q_percentile_rank,
        "rel_cume_dist": q_cume_dist,
        "rel_skyline": q_skyline,
        "rel_interarrival": q_interarrival,
        "rel_winsorized_agg": q_winsorized,
        "rel_asof_join": q_asof_join,
        "rel_range_join_count": q_range_join,
        "crawl_lang_gate": q_lang_gate,
        "crawl_host_stats": q_host_stats,
        "crawl_host_latest": q_host_latest,
        "crawl_reciprocal_links": q_reciprocal_links,
        "crawl_cocitation": q_cocitation,
        "crawl_link_jaccard": q_link_jaccard,
        "crawl_bib_coupling": q_bib_coupling,
        "crawl_host_graph": q_host_graph,
        "crawl_components": q_crawl_components,
        "crawl_label_prop": q_crawl_label_prop,
        "crawl_modularity": q_crawl_modularity,
        "crawl_triangles": q_crawl_triangles,
        "crawl_edge_support": q_crawl_edge_support,
        "crawl_ktruss": q_crawl_ktruss,
        "crawl_assortativity": q_crawl_assortativity,
        "crawl_kcore": q_crawl_kcore,
        "crawl_degree_dist": q_degree_dist,
        "rel_audience_overlap": q_audience_overlap,
        "rel_lift": q_rel_lift,
        "rel_rate_test": q_rel_rate_test,
        "rel_benford": q_benford,
        "rel_corr": q_corr,
        "rel_linfit": q_linfit,
        "rel_spearman": q_spearman,
        "rel_ab_test": q_ab_test,
        "rel_ks_test": q_ks_test,
        "rel_mannwhitney": q_mannwhitney,
        "rel_chi2": q_chi2,
        "rel_gini": q_gini,
        "rel_changepoint": q_changepoint,
        "rel_autocorr": q_autocorr,
        "rel_seasonality": q_seasonality,
        "rel_debounce": q_debounce,
        "text_rank_frequency": q_rank_frequency,
        "crawl_orphans": q_orphans,
        "rel_attribution": q_attribution,
        "rel_pareto_users": q_pareto_users,
        "search_term_complete": q_term_complete,
        "search_didyoumean": q_didyoumean,
        "search_wildcard": q_wildcard,
        "search_fuzzy": q_search_fuzzy,
        "index_export_acc": q_index_export,
        "index_import_stats": q_index_import,
        "index_compact_stats": q_index_compact,
        "crawl_links": q_crawl_links,
        "crawl_anchor_terms": q_anchor_terms,
        "crawl_robots_gate": q_robots_gate,
        "crawl_politeness_slots": q_politeness,
        "crawl_pagerank": q_crawl_pagerank,
        "crawl_ppr": q_crawl_ppr,
        "crawl_hits": q_crawl_hits,
        "crawl_frontier_bfs": q_frontier_bfs,
        "crawl_closeness": q_crawl_closeness,
        "crawl_bowtie": q_crawl_bowtie,
        "media_features": q_media_features,
        "media_thumbs": q_media_thumbs,
        "media_image_stats": q_media_image_stats,
        "media_scene_cuts": q_media_scene_cuts,
        "media_audio_segments": q_media_audio_segments,
        "media_audio_resample": q_media_resample,
        "media_frames": q_media_frames,
        "media_phash_dups": q_phash_dups,
        "media_audio_dups": q_audio_dups,
        "media_video_dups": q_video_dups,
    }


# --------------------------------------------------------------------------
# oracles
# --------------------------------------------------------------------------


def _title_boost_oracle_sql() -> str:
    """DuckDB twin of ``search_bm25_title``: the flagship BM25 replay
    plus the title field — title extracted from the html with the same
    ``<title[^>]*>(.*?)</title>`` rule as ``functions/tokenize.
    extract_html``, tokenized with the canonical expression, and a flat
    500000-micro boost per DISTINCT body-present query term found in the
    title (the engine drops query terms absent from the body index —
    ``has_term`` — so the boost join is restricted to body vocabulary
    the same way). All-integer scores; (total_e6 desc, doc_id) order."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
        reference_queries,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    q_rows = [
        f"({qid}, '{t}')" for qid, q in reference_queries() for t in tokenize_query(q)
    ]
    ttl_toks = TOKS.replace("(text,", "(title,")
    return f"""
    WITH pages AS (SELECT * FROM read_parquet('{pages_path}')),
    winners AS (
      SELECT url, text, html FROM (
        SELECT url, text, html,
               row_number() OVER (PARTITION BY html ORDER BY warc_ts, url) AS rn
        FROM pages) WHERE rn = 1),
    docs AS (
      SELECT CAST(('0x' || substr(md5(url), 1, 16))::UBIGINT
                  & 9223372036854775807::UBIGINT AS BIGINT) AS doc_id,
             text,
             regexp_extract(decode(html), '<title[^>]*>(.*?)</title>', 1) AS title
      FROM winners),
    toks AS MATERIALIZED (SELECT doc_id, unnest({TOKS}) AS term FROM docs),
    ttoks AS MATERIALIZED (SELECT DISTINCT doc_id, unnest({ttl_toks}) AS term FROM docs),
    tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS MATERIALIZED (SELECT (SELECT count(*) FROM docs) AS n,
                     CAST((SELECT count(*) FROM toks) AS DOUBLE)
                       / (SELECT count(*) FROM docs) AS avgdl),
    q(qid, term) AS (VALUES {', '.join(q_rows)}),
    qb AS MATERIALIZED (SELECT DISTINCT qid, term FROM q
           WHERE term IN (SELECT DISTINCT term FROM tf)),
    df AS (SELECT term, count(*) AS df FROM tf
           WHERE term IN (SELECT DISTINCT term FROM qb) GROUP BY term),
    scores AS (
      SELECT qb.qid, tf.doc_id,
             sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                 * (tf.tf * (1.2 + 1))
                 / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl))) AS score
      FROM qb JOIN df USING (term) JOIN tf ON tf.term = qb.term
      JOIN dl ON tf.doc_id = dl.doc_id, stats
      GROUP BY qb.qid, tf.doc_id),
    e6 AS (SELECT qid, doc_id,
                  CAST(round(score * 1000000) AS BIGINT) AS base_e6
           FROM scores),
    boost AS (SELECT qb.qid, tt.doc_id,
                     CAST(500000 * count(*) AS BIGINT) AS b
              FROM qb JOIN ttoks tt USING (term)
              GROUP BY qb.qid, tt.doc_id),
    tot AS (SELECT e6.qid, e6.doc_id,
                   e6.base_e6 + coalesce(b.b, 0) AS total_e6,
                   e6.base_e6,
                   coalesce(b.b, 0) // 500000 AS n_title_hits
            FROM e6 LEFT JOIN boost b
              ON e6.qid = b.qid AND e6.doc_id = b.doc_id)
    SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY total_e6 DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, total_e6, base_e6, CAST(n_title_hits AS BIGINT) AS n_title_hits
    FROM tot
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY total_e6 DESC, doc_id) <= 10
    """


def _intitle_oracle_sql() -> str:
    """DuckDB twin of ``search_intitle``: the title-boost oracle's CTE
    chain (flagship BM25 e6 scores + canonical title tokens), then the
    field restriction — within the e6 top-50 prefix keep docs whose
    title tokens contain the query's FIRST token (embedded per qid via
    the same pure tokenizer), prefix order, top 10."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
        reference_queries,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    q_rows = [
        f"({qid}, '{t}')" for qid, q in reference_queries() for t in tokenize_query(q)
    ]
    first_rows = [
        f"({qid}, '{tokenize_query(q)[0]}')"
        for qid, q in reference_queries()
        if tokenize_query(q)
    ]
    ttl_toks = TOKS.replace("(text,", "(title,")
    return f"""
    WITH pages AS (SELECT * FROM read_parquet('{pages_path}')),
    winners AS (
      SELECT url, text, html FROM (
        SELECT url, text, html,
               row_number() OVER (PARTITION BY html ORDER BY warc_ts, url) AS rn
        FROM pages) WHERE rn = 1),
    docs AS (
      SELECT CAST(('0x' || substr(md5(url), 1, 16))::UBIGINT
                  & 9223372036854775807::UBIGINT AS BIGINT) AS doc_id,
             text,
             regexp_extract(decode(html), '<title[^>]*>(.*?)</title>', 1) AS title
      FROM winners),
    toks AS MATERIALIZED (SELECT doc_id, unnest({TOKS}) AS term FROM docs),
    ttoks AS MATERIALIZED (SELECT DISTINCT doc_id, unnest({ttl_toks}) AS term FROM docs),
    tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS MATERIALIZED (SELECT (SELECT count(*) FROM docs) AS n,
                     CAST((SELECT count(*) FROM toks) AS DOUBLE)
                       / (SELECT count(*) FROM docs) AS avgdl),
    q(qid, term) AS (VALUES {', '.join(q_rows)}),
    qb AS MATERIALIZED (SELECT DISTINCT qid, term FROM q
           WHERE term IN (SELECT DISTINCT term FROM tf)),
    df AS (SELECT term, count(*) AS df FROM tf
           WHERE term IN (SELECT DISTINCT term FROM qb) GROUP BY term),
    scores AS (
      SELECT qb.qid, tf.doc_id,
             sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                 * (tf.tf * (1.2 + 1))
                 / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl))) AS score
      FROM qb JOIN df USING (term) JOIN tf ON tf.term = qb.term
      JOIN dl ON tf.doc_id = dl.doc_id, stats
      GROUP BY qb.qid, tf.doc_id),
    e6 AS (SELECT qid, doc_id,
                  CAST(round(score * 1000000) AS BIGINT) AS score_e6
           FROM scores),
    pref AS (SELECT qid, doc_id, score_e6,
                    row_number() OVER (PARTITION BY qid
                                       ORDER BY score_e6 DESC, doc_id) AS rn
             FROM e6
             QUALIFY row_number() OVER (PARTITION BY qid
                                        ORDER BY score_e6 DESC, doc_id) <= 50),
    want(qid, term) AS (VALUES {', '.join(first_rows)}),
    kept AS (SELECT p.qid, p.doc_id, p.score_e6, p.rn
             FROM pref p
             JOIN want w ON w.qid = p.qid
             JOIN ttoks t ON t.doc_id = p.doc_id AND t.term = w.term)
    SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY rn) - 1
                AS BIGINT) AS "rank",
           doc_id, score_e6
    FROM kept
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY rn) <= 10
    """


def _bm25f_oracle_sql(w: float = 3.0) -> str:
    """DuckDB twin of ``search_bm25f`` (simple BM25F, Robertson et al.
    2004): the flagship replay plus the title FIELD folded into the
    saturation — tf' = tf_body + w*tf_title, dl' = dl_body +
    w*title_len, avg' = (C_body + w*C_title)/N with C_title the exact
    title token count over canonical docs; idf stays the body idf.
    Re-ranks the e6 top-50 body prefix, engine-parenthesized
    expression, (bm25f_e6 desc, doc_id) order."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
        reference_queries,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    q_rows = [
        f"({qid}, '{t}')" for qid, q in reference_queries() for t in tokenize_query(q)
    ]
    ttl_toks = TOKS.replace("(text,", "(title,")
    return f"""
    WITH pages AS (SELECT * FROM read_parquet('{pages_path}')),
    winners AS (
      SELECT url, text, html FROM (
        SELECT url, text, html,
               row_number() OVER (PARTITION BY html ORDER BY warc_ts, url) AS rn
        FROM pages) WHERE rn = 1),
    docs AS (
      SELECT CAST(('0x' || substr(md5(url), 1, 16))::UBIGINT
                  & 9223372036854775807::UBIGINT AS BIGINT) AS doc_id,
             text,
             regexp_extract(decode(html), '<title[^>]*>(.*?)</title>', 1) AS title
      FROM winners),
    toks AS MATERIALIZED (SELECT doc_id, unnest({TOKS}) AS term FROM docs),
    ttoks_all AS MATERIALIZED (SELECT doc_id, unnest({ttl_toks}) AS term FROM docs),
    tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    ttf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM ttoks_all GROUP BY doc_id, term),
    dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    tlen AS (SELECT doc_id, count(*) AS tl FROM ttoks_all GROUP BY doc_id),
    stats AS MATERIALIZED (SELECT (SELECT count(*) FROM docs) AS n,
                     CAST((SELECT count(*) FROM toks) AS DOUBLE)
                       / (SELECT count(*) FROM docs) AS avgdl,
                     (CAST((SELECT count(*) FROM toks) AS DOUBLE)
                      + {w} * CAST((SELECT count(*) FROM ttoks_all) AS DOUBLE))
                       / (SELECT count(*) FROM docs) AS avgdlf),
    q(qid, term) AS (VALUES {', '.join(q_rows)}),
    qb AS MATERIALIZED (SELECT DISTINCT qid, term FROM q
           WHERE term IN (SELECT DISTINCT term FROM tf)),
    df AS (SELECT term, count(*) AS df FROM tf
           WHERE term IN (SELECT DISTINCT term FROM qb) GROUP BY term),
    scores AS (
      SELECT qb.qid, tf.doc_id,
             sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                 * (tf.tf * (1.2 + 1))
                 / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl))) AS score
      FROM qb JOIN df USING (term) JOIN tf ON tf.term = qb.term
      JOIN dl ON tf.doc_id = dl.doc_id, stats
      GROUP BY qb.qid, tf.doc_id),
    e6 AS (SELECT qid, doc_id,
                  CAST(round(score * 1000000) AS BIGINT) AS score_e6
           FROM scores),
    pref AS MATERIALIZED (SELECT qid, doc_id FROM e6
             QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 50),
    folded AS (SELECT p.qid, p.doc_id, qb.term,
                      COALESCE(tf.tf, 0) + {w} * COALESCE(ttf.tf, 0) AS tfp
               FROM pref p
               JOIN qb ON qb.qid = p.qid
               LEFT JOIN tf ON tf.term = qb.term AND tf.doc_id = p.doc_id
               LEFT JOIN ttf ON ttf.term = qb.term AND ttf.doc_id = p.doc_id
               WHERE COALESCE(tf.tf, 0) + COALESCE(ttf.tf, 0) > 0),
    scored AS (
      SELECT f.qid, f.doc_id,
             sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                 * ((f.tfp * (1.2 + 1))
                    / (f.tfp + 1.2 * ((1 - 0.75)
                       + 0.75 * (dl.dl + {w} * COALESCE(tlen.tl, 0)) / stats.avgdlf)))) AS s
      FROM folded f
      JOIN df USING (term)
      JOIN dl ON dl.doc_id = f.doc_id
      LEFT JOIN tlen ON tlen.doc_id = f.doc_id, stats
      GROUP BY f.qid, f.doc_id)
    SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY bm25f_e6 DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, bm25f_e6
    FROM (SELECT qid, doc_id, CAST(round(s * 1000000) AS BIGINT) AS bm25f_e6 FROM scored)
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY bm25f_e6 DESC, doc_id) <= 10
    """


def _anchor_boost_oracle_sql() -> str:
    """DuckDB twin of ``search_bm25_anchor``: the flagship BM25 replay
    plus the anchor FIELD — ``<a href>(text)</a>`` elements extracted
    from ALL pages (dup losers endorse too) with the same element scope
    as the hash-matched ``crawl_links``/``crawl_anchor_terms`` oracles,
    inner text tokenized with the canonical expression, targets
    resolved by joining the normalized href against the normalized
    corpus page urls (so off-corpus targets drop out), doc_id =
    hash64(raw page url). A flat 300000-micro boost per DISTINCT
    body-present query term among a doc's DISTINCT inbound anchor
    terms; candidates = body matches only (LEFT JOIN from the score
    table). All-integer scores; (total_e6 desc, doc_id) order."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
        SearchIndex,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
        reference_queries,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    boost = SearchIndex.ANCHOR_BOOST_E6
    q_rows = [
        f"({qid}, '{t}')" for qid, q in reference_queries() for t in tokenize_query(q)
    ]
    toks_anchor = TOKS.replace("text", "anchor")
    return f"""
    WITH pages AS (SELECT * FROM read_parquet('{pages_path}')),
    winners AS (
      SELECT url, text FROM (
        SELECT url, text,
               row_number() OVER (PARTITION BY html ORDER BY warc_ts, url) AS rn
        FROM pages) WHERE rn = 1),
    docs AS (
      SELECT CAST(('0x' || substr(md5(url), 1, 16))::UBIGINT
                  & 9223372036854775807::UBIGINT AS BIGINT) AS doc_id,
             text
      FROM winners),
    anchors AS (SELECT
        unnest(regexp_extract_all(decode(html), '<a href="([^"]*)">([^<]*)</a>', 1)) AS href,
        unnest(regexp_extract_all(decode(html), '<a href="([^"]*)">([^<]*)</a>', 2)) AS anchor
      FROM pages),
    apairs AS (SELECT DISTINCT
        regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS dst_url,
        unnest({toks_anchor}) AS term
      FROM anchors),
    aterms AS MATERIALIZED (SELECT DISTINCT
        CAST(('0x' || substr(md5(p.url), 1, 16))::UBIGINT
             & 9223372036854775807::UBIGINT AS BIGINT) AS doc_id,
        a.term
      FROM apairs a JOIN pages p
        ON regexp_replace(p.url, '^http://([^/]*)', 'http://\\1:80') = a.dst_url),
    toks AS MATERIALIZED (SELECT doc_id, unnest({TOKS}) AS term FROM docs),
    tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS MATERIALIZED (SELECT (SELECT count(*) FROM docs) AS n,
                     CAST((SELECT count(*) FROM toks) AS DOUBLE)
                       / (SELECT count(*) FROM docs) AS avgdl),
    q(qid, term) AS (VALUES {', '.join(q_rows)}),
    qb AS MATERIALIZED (SELECT DISTINCT qid, term FROM q
           WHERE term IN (SELECT DISTINCT term FROM tf)),
    df AS (SELECT term, count(*) AS df FROM tf
           WHERE term IN (SELECT DISTINCT term FROM qb) GROUP BY term),
    scores AS (
      SELECT qb.qid, tf.doc_id,
             sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                 * (tf.tf * (1.2 + 1))
                 / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl))) AS score
      FROM qb JOIN df USING (term) JOIN tf ON tf.term = qb.term
      JOIN dl ON tf.doc_id = dl.doc_id, stats
      GROUP BY qb.qid, tf.doc_id),
    e6 AS (SELECT qid, doc_id,
                  CAST(round(score * 1000000) AS BIGINT) AS base_e6
           FROM scores),
    abst AS (SELECT qb.qid, a.doc_id,
                    CAST({boost} * count(*) AS BIGINT) AS b
             FROM qb JOIN aterms a USING (term)
             GROUP BY qb.qid, a.doc_id),
    tot AS (SELECT e6.qid, e6.doc_id,
                   e6.base_e6 + coalesce(abst.b, 0) AS total_e6,
                   e6.base_e6,
                   coalesce(abst.b, 0) // {boost} AS n_anchor_hits
            FROM e6 LEFT JOIN abst
              ON e6.qid = abst.qid AND e6.doc_id = abst.doc_id)
    SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY total_e6 DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, total_e6, base_e6, CAST(n_anchor_hits AS BIGINT) AS n_anchor_hits
    FROM tot
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY total_e6 DESC, doc_id) <= 10
    """


def _anchor_field_oracle_sql(w: float = 2.0) -> str:
    """DuckDB twin of ``search_bm25_anchor_field``: the anchor field
    derived from the corpus — ``<a href>(text)</a>`` elements from ALL
    pages (losers endorse too), inner text tokenized per-occurrence
    (COUNTS, not distinct — field tf), targets resolved by normalized
    href against normalized WINNER urls (losers/off-corpus targets get
    no postings), doc_id = hash64(raw winner url); per-doc anchor
    length = total inbound anchor tokens. BM25F fold: tf' = tf_body +
    w*tf_anchor, dl' = dl_body + w*alen, avgdl' = (C_body +
    w*C_anchor)/N, body idf, candidates = body OR anchor matches of
    body-present query terms. All-integer e6; (score desc, doc_id)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
        reference_queries,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    q_rows = [
        f"({qid}, '{t}')" for qid, q in reference_queries() for t in tokenize_query(q)
    ]
    toks_anchor = TOKS.replace("text", "anchor")
    return f"""
    WITH pages AS (SELECT * FROM read_parquet('{pages_path}')),
    winners AS (
      SELECT url, text FROM (
        SELECT url, text,
               row_number() OVER (PARTITION BY html ORDER BY warc_ts, url) AS rn
        FROM pages) WHERE rn = 1),
    docs AS (
      SELECT CAST(('0x' || substr(md5(url), 1, 16))::UBIGINT
                  & 9223372036854775807::UBIGINT AS BIGINT) AS doc_id,
             url, text
      FROM winners),
    anchors AS (SELECT
        unnest(regexp_extract_all(decode(html), '<a href="([^"]*)">([^<]*)</a>', 1)) AS href,
        unnest(regexp_extract_all(decode(html), '<a href="([^"]*)">([^<]*)</a>', 2)) AS anchor
      FROM pages),
    atoks AS (SELECT
        regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS dst_url,
        unnest({toks_anchor}) AS term
      FROM anchors),
    docnorm AS (SELECT doc_id,
        regexp_replace(url, '^http://([^/]*)', 'http://\\1:80') AS dst_url
      FROM docs),
    atf AS MATERIALIZED (SELECT d.doc_id, a.term, count(*) AS tf
      FROM atoks a JOIN docnorm d USING (dst_url)
      GROUP BY d.doc_id, a.term),
    alen AS MATERIALIZED (SELECT doc_id, sum(tf) AS al FROM atf GROUP BY doc_id),
    toks AS MATERIALIZED (SELECT doc_id, unnest({TOKS}) AS term FROM docs),
    tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS MATERIALIZED (SELECT (SELECT count(*) FROM docs) AS n,
                     (CAST((SELECT count(*) FROM toks) AS DOUBLE)
                      + {w} * CAST((SELECT COALESCE(sum(tf), 0) FROM atf) AS DOUBLE))
                       / (SELECT count(*) FROM docs) AS avgdlf),
    q(qid, term) AS (VALUES {', '.join(q_rows)}),
    qb AS MATERIALIZED (SELECT DISTINCT qid, term FROM q
           WHERE term IN (SELECT DISTINCT term FROM tf)),
    df AS (SELECT term, count(*) AS df FROM tf
           WHERE term IN (SELECT DISTINCT term FROM qb) GROUP BY term),
    cand AS MATERIALIZED (SELECT DISTINCT qb.qid, x.doc_id
      FROM qb JOIN (SELECT term, doc_id FROM tf
                    UNION SELECT term, doc_id FROM atf) x USING (term)),
    folded AS (SELECT c.qid, c.doc_id, qb.term,
                      COALESCE(tf.tf, 0) + {w} * COALESCE(atf.tf, 0) AS tfp
               FROM cand c
               JOIN qb ON qb.qid = c.qid
               LEFT JOIN tf ON tf.term = qb.term AND tf.doc_id = c.doc_id
               LEFT JOIN atf ON atf.term = qb.term AND atf.doc_id = c.doc_id
               WHERE COALESCE(tf.tf, 0) + COALESCE(atf.tf, 0) > 0),
    scored AS (
      SELECT f.qid, f.doc_id,
             sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                 * ((f.tfp * (1.2 + 1))
                    / (f.tfp + 1.2 * ((1 - 0.75)
                       + 0.75 * (COALESCE(dl.dl, 0) + {w} * COALESCE(alen.al, 0))
                         / stats.avgdlf)))) AS s
      FROM folded f
      JOIN df USING (term)
      LEFT JOIN dl ON dl.doc_id = f.doc_id
      LEFT JOIN alen ON alen.doc_id = f.doc_id, stats
      GROUP BY f.qid, f.doc_id)
    SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY bm25f_e6 DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, bm25f_e6
    FROM (SELECT qid, doc_id, CAST(round(s * 1000000) AS BIGINT) AS bm25f_e6 FROM scored)
    WHERE bm25f_e6 > 0
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY bm25f_e6 DESC, doc_id) <= 10
    """


def _bm25f_all_fields_oracle_sql(w_t: float = 3.0, w_a: float = 2.0) -> str:
    """DuckDB twin of ``search_bm25f_all_fields``: both fields derived
    from the corpus — the title via the reference's <title> regex over
    winner html (the docstore's title rule), the anchor field via
    per-occurrence <a href>(text)</a> token counts from ALL pages
    joined to normalized winner urls. Candidates = body OR title OR
    anchor matches of body-present query terms; folded BM25F with
    tf' = tf + w_t*ttf + w_a*atf and dl' = dl + w_t*tl + w_a*al;
    avgdl' = (C_body + w_t*C_title + w_a*C_anchor)/N; body idf.
    All-integer e6; (score desc, doc_id) order, top 10."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
        reference_queries,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    q_rows = [
        f"({qid}, '{t}')" for qid, q in reference_queries() for t in tokenize_query(q)
    ]
    toks_anchor = TOKS.replace("text", "anchor")
    toks_title = TOKS.replace("(text,", "(title,")
    return f"""
    WITH pages AS (SELECT * FROM read_parquet('{pages_path}')),
    winners AS (
      SELECT url, text, html FROM (
        SELECT url, text, html,
               row_number() OVER (PARTITION BY html ORDER BY warc_ts, url) AS rn
        FROM pages) WHERE rn = 1),
    docs AS (
      SELECT CAST(('0x' || substr(md5(url), 1, 16))::UBIGINT
                  & 9223372036854775807::UBIGINT AS BIGINT) AS doc_id,
             url, text,
             regexp_extract(decode(html), '<title[^>]*>(.*?)</title>', 1) AS title
      FROM winners),
    anchors AS (SELECT
        unnest(regexp_extract_all(decode(html), '<a href="([^"]*)">([^<]*)</a>', 1)) AS href,
        unnest(regexp_extract_all(decode(html), '<a href="([^"]*)">([^<]*)</a>', 2)) AS anchor
      FROM pages),
    atoks AS (SELECT
        regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS dst_url,
        unnest({toks_anchor}) AS term
      FROM anchors),
    docnorm AS (SELECT doc_id,
        regexp_replace(url, '^http://([^/]*)', 'http://\\1:80') AS dst_url
      FROM docs),
    atf AS MATERIALIZED (SELECT d.doc_id, a.term, count(*) AS tf
      FROM atoks a JOIN docnorm d USING (dst_url)
      GROUP BY d.doc_id, a.term),
    alen AS MATERIALIZED (SELECT doc_id, sum(tf) AS al FROM atf GROUP BY doc_id),
    ttoks AS MATERIALIZED (SELECT doc_id, unnest({toks_title}) AS term FROM docs),
    ttf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM ttoks GROUP BY doc_id, term),
    tlen AS MATERIALIZED (SELECT doc_id, count(*) AS tl FROM ttoks GROUP BY doc_id),
    toks AS MATERIALIZED (SELECT doc_id, unnest({TOKS}) AS term FROM docs),
    tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS MATERIALIZED (SELECT (SELECT count(*) FROM docs) AS n,
                     (CAST((SELECT count(*) FROM toks) AS DOUBLE)
                      + {w_t} * CAST((SELECT count(*) FROM ttoks) AS DOUBLE)
                      + {w_a} * CAST((SELECT COALESCE(sum(tf), 0) FROM atf) AS DOUBLE))
                       / (SELECT count(*) FROM docs) AS avgdlf),
    q(qid, term) AS (VALUES {', '.join(q_rows)}),
    qb AS MATERIALIZED (SELECT DISTINCT qid, term FROM q
           WHERE term IN (SELECT DISTINCT term FROM tf)),
    df AS (SELECT term, count(*) AS df FROM tf
           WHERE term IN (SELECT DISTINCT term FROM qb) GROUP BY term),
    cand AS MATERIALIZED (SELECT DISTINCT qb.qid, x.doc_id
      FROM qb JOIN (SELECT term, doc_id FROM tf
                    UNION SELECT term, doc_id FROM ttf
                    UNION SELECT term, doc_id FROM atf) x USING (term)),
    folded AS (SELECT c.qid, c.doc_id, qb.term,
                      COALESCE(tf.tf, 0) + {w_t} * COALESCE(ttf.tf, 0)
                        + {w_a} * COALESCE(atf.tf, 0) AS tfp
               FROM cand c
               JOIN qb ON qb.qid = c.qid
               LEFT JOIN tf ON tf.term = qb.term AND tf.doc_id = c.doc_id
               LEFT JOIN ttf ON ttf.term = qb.term AND ttf.doc_id = c.doc_id
               LEFT JOIN atf ON atf.term = qb.term AND atf.doc_id = c.doc_id
               WHERE COALESCE(tf.tf, 0) + COALESCE(ttf.tf, 0) + COALESCE(atf.tf, 0) > 0),
    scored AS (
      SELECT f.qid, f.doc_id,
             sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                 * ((f.tfp * (1.2 + 1))
                    / (f.tfp + 1.2 * ((1 - 0.75)
                       + 0.75 * (COALESCE(dl.dl, 0) + {w_t} * COALESCE(tlen.tl, 0)
                                 + {w_a} * COALESCE(alen.al, 0))
                         / stats.avgdlf)))) AS s
      FROM folded f
      JOIN df USING (term)
      LEFT JOIN dl ON dl.doc_id = f.doc_id
      LEFT JOIN tlen ON tlen.doc_id = f.doc_id
      LEFT JOIN alen ON alen.doc_id = f.doc_id, stats
      GROUP BY f.qid, f.doc_id)
    SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY bm25f_e6 DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, bm25f_e6
    FROM (SELECT qid, doc_id, CAST(round(s * 1000000) AS BIGINT) AS bm25f_e6 FROM scored)
    WHERE bm25f_e6 > 0
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY bm25f_e6 DESC, doc_id) <= 10
    """


def _boolean_not_oracle_sql() -> str:
    """DuckDB twin of ``search_boolean_not``: the flagship BM25 replay
    (distinct query terms, matching the engine's dedup) over docs that
    contain NONE of the exclusion terms — per reference query, the
    exclusion set is the NEXT reference query's terms (cyclic pairing,
    mirrored from the Ray side). Exclusion terms absent from the corpus
    ban nothing (the tf join drops them). All-integer scores;
    (score_e6 desc, doc_id) order, top 10."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
        reference_queries,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    qs = list(reference_queries())
    q_rows = [f"({qid}, '{t}')" for qid, q in qs for t in tokenize_query(q)]
    x_rows = [
        f"({qs[i][0]}, '{t}')"
        for i in range(len(qs))
        for t in tokenize_query(qs[(i + 1) % len(qs)][1])
    ]
    return f"""
    WITH pages AS (SELECT * FROM read_parquet('{pages_path}')),
    winners AS (
      SELECT url, text FROM (
        SELECT url, text,
               row_number() OVER (PARTITION BY html ORDER BY warc_ts, url) AS rn
        FROM pages) WHERE rn = 1),
    docs AS (
      SELECT CAST(('0x' || substr(md5(url), 1, 16))::UBIGINT
                  & 9223372036854775807::UBIGINT AS BIGINT) AS doc_id,
             text
      FROM winners),
    toks AS MATERIALIZED (SELECT doc_id, unnest({TOKS}) AS term FROM docs),
    tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS MATERIALIZED (SELECT (SELECT count(*) FROM docs) AS n,
                     CAST((SELECT count(*) FROM toks) AS DOUBLE)
                       / (SELECT count(*) FROM docs) AS avgdl),
    q(qid, term) AS (VALUES {', '.join(q_rows)}),
    xq(qid, term) AS (VALUES {', '.join(x_rows)}),
    qb AS MATERIALIZED (SELECT DISTINCT qid, term FROM q
           WHERE term IN (SELECT DISTINCT term FROM tf)),
    df AS (SELECT term, count(*) AS df FROM tf
           WHERE term IN (SELECT DISTINCT term FROM qb) GROUP BY term),
    banned AS (SELECT DISTINCT xq.qid, tf.doc_id
               FROM (SELECT DISTINCT qid, term FROM xq) xq
               JOIN tf USING (term)),
    scores AS (
      SELECT qb.qid, tf.doc_id,
             sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                 * (tf.tf * (1.2 + 1))
                 / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl))) AS score
      FROM qb JOIN df USING (term) JOIN tf ON tf.term = qb.term
      JOIN dl ON tf.doc_id = dl.doc_id, stats
      GROUP BY qb.qid, tf.doc_id),
    e6 AS (SELECT s.qid, s.doc_id,
                  CAST(round(s.score * 1000000) AS BIGINT) AS score_e6
           FROM scores s LEFT JOIN banned b
             ON s.qid = b.qid AND s.doc_id = b.doc_id
           WHERE b.doc_id IS NULL)
    SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, score_e6
    FROM e6
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 10
    """


def _flagship_oracle_sql(
    scorer: str,
    host_collapse: int | None = None,
    variant: str | None = None,
    winner_order: str | None = None,
) -> str:
    """DuckDB twin of the FLAGSHIP index-built search queries.

    Recomputes the whole engine contract in SQL over the same synthetic
    pages parquet the Ray build consumes: exact content dedup
    (keep-first by (warc_ts, url) per html — ``crawler/Crawler.java:
    178-190`` semantics), doc_id = first 8 bytes of md5(url) masked to
    63 bits (``functions/hashing.py:hash64``), canonical tokenization
    of the ``text`` column (byte-identical to HTML extraction by the
    generator invariant), exact N/df/dl/avgdl, then BM25
    (``ln(1+(N-df+.5)/(df+.5))``) or the reference tf-idf scorer
    (``log10(N/df)*(1+log10(tf))``, threshold 0.3 —
    ``search/Searcher.java:108-198``), top-10 per reference query with
    the engine's (score desc, doc_id) tie-break.

    The corpus path is resolved for $GRAFT_ORACLE_SF_DIR (default: the
    driver's sf0.01 gate); resolving it also materializes the
    deterministic parquet so the SQL can run before the Ray side.
    """
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
        reference_queries,
    )

    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    pages_path = pages_for_sf_dir(sf_dir)
    q_rows = [
        f"({qid}, '{t}')" for qid, q in reference_queries() for t in tokenize_query(q)
    ]
    toks_pages = TOKS  # operates on the `text` column of docs

    lm_ctes = ""
    if scorer == "bm25":
        score_expr = (
            "sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))"
            " * (tf.tf * (1.2 + 1))"
            " / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl)))"
        )
        joins = (
            "FROM q JOIN df USING (term) JOIN tf ON tf.term = q.term "
            "JOIN dl ON tf.doc_id = dl.doc_id, stats"
        )
        having = ""
    elif scorer == "dismax":
        # DisMax over DISTINCT query terms: best clause + 0.3 * rest,
        # each clause the flagship BM25 contribution
        _term = (
            "ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))"
            " * (tf.tf * (1.2 + 1))"
            " / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl))"
        )
        score_expr = f"max({_term}) + 0.3 * (sum({_term}) - max({_term}))"
        joins = (
            "FROM (SELECT DISTINCT qid, term FROM q) q "
            "JOIN df USING (term) JOIN tf ON tf.term = q.term "
            "JOIN dl ON tf.doc_id = dl.doc_id, stats"
        )
        having = ""
    elif scorer == "lm":
        # query-likelihood with Dirichlet smoothing (SearchIndex.
        # lm_dirichlet_topk, mu=2000): matched-term sum
        # ln(1 + tf*C/(mu*cf)) plus m*ln(mu/(dl+mu)); C (collection
        # token count) and cf re-derived exactly from the toks CTE,
        # query terms deduplicated on both sides
        score_expr = (
            "sum(ln(1 + (tf.tf * stats.c) / (2000.0 * cf.cf)))"
            " + any_value(nq.m) * ln(2000.0 / (any_value(dl.dl) + 2000.0))"
        )
        joins = (
            "FROM (SELECT DISTINCT qid, term FROM q) q "
            "JOIN cf USING (term) "
            "JOIN tf ON tf.term = q.term "
            "JOIN dl ON tf.doc_id = dl.doc_id "
            "JOIN nq ON nq.qid = q.qid, stats"
        )
        having = ""
        lm_ctes = """
    cf AS (SELECT term, CAST(sum(tf) AS DOUBLE) AS cf FROM tf
           WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY term),
    nq AS (SELECT qid, count(DISTINCT term) AS m FROM q
           WHERE term IN (SELECT term FROM cf) GROUP BY qid),"""
    else:
        score_expr = (
            "sum(log10(CAST(stats.n AS DOUBLE) / df.df)"
            " * (1 + log10(CAST(tf.tf AS DOUBLE))))"
        )
        joins = "FROM q JOIN df USING (term) JOIN tf ON tf.term = q.term, stats"
        having = f"HAVING {score_expr} > 0.3"

    if variant == "facets":
        # facet counts (URL host + doc language) over the e6 top-50
        # candidate prefix — SearchIndex.bm25_facets, literally
        collapse_ctes = """,
    pref AS (SELECT qid, doc_id FROM e6
             QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 50),
    joined AS (SELECT pref.qid,
                      lower(regexp_extract(docs.url,
                            '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/:?#]+)', 1)) AS host,
                      docs.lang
               FROM pref JOIN docs USING (doc_id))"""
        final_select = """SELECT qid, 'host' AS facet, host AS facet_value,
           count(*) AS n_docs FROM joined GROUP BY qid, host
    UNION ALL
    SELECT qid, 'lang' AS facet, lang AS facet_value,
           count(*) AS n_docs FROM joined GROUP BY qid, lang"""
    elif variant == "recency":
        # recency re-rank of the e6 top-50 prefix: boosted_e6 =
        # score_e6 + 1000 * epoch_day(warc_ts) — bm25_topk_recency
        collapse_ctes = """,
    pref AS (SELECT qid, doc_id, score_e6 FROM e6
             QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 50),
    boosted AS (SELECT pref.qid, pref.doc_id,
                       pref.score_e6
                       + 1000 * CAST(floor(epoch(docs.warc_ts) / 86400) AS BIGINT)
                         AS boosted_e6
                FROM pref JOIN docs USING (doc_id))"""
        final_select = """SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY boosted_e6 DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, boosted_e6
    FROM boosted
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY boosted_e6 DESC, doc_id) <= 10"""
    elif variant == "site":
        # site:-restricted retrieval over the e6 top-50 prefix: keep
        # docs whose URL host equals the host of the prefix's TOP
        # result, prefix order, top 10 — bm25_site_topk, literally
        collapse_ctes = """,
    pref AS (SELECT qid, doc_id, score_e6,
                    row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) AS rn
             FROM e6
             QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 50),
    hosted AS (SELECT pref.qid, pref.doc_id, pref.score_e6, pref.rn,
                      lower(regexp_extract(docs.url,
                            '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/:?#]+)', 1)) AS host
               FROM pref JOIN docs USING (doc_id)),
    tgt AS (SELECT qid, host AS want FROM hosted WHERE rn = 1)"""
        final_select = """SELECT h.qid,
           CAST(row_number() OVER (PARTITION BY h.qid ORDER BY h.rn) - 1 AS BIGINT) AS "rank",
           h.doc_id, h.score_e6, h.host
    FROM hosted h JOIN tgt ON h.qid = tgt.qid AND h.host = tgt.want
    QUALIFY row_number() OVER (PARTITION BY h.qid ORDER BY h.rn) <= 10"""
    elif variant == "ndcg":
        # NDCG@10 vs a graded relevance oracle (rel = # distinct query
        # terms containing the doc), exact-integer DCG — q_search_ndcg
        w_rows = ", ".join(f"({r}, {w})" for r, w in enumerate(_NDCG_W))
        collapse_ctes = f""",
    top10 AS (SELECT qid, doc_id,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY score_e6 DESC, doc_id) - 1 AS rnk
              FROM e6
              QUALIFY row_number() OVER (PARTITION BY qid
                                         ORDER BY score_e6 DESC, doc_id) <= 10),
    rel AS (SELECT q.qid, tf.doc_id, count(DISTINCT q.term) AS rel
            FROM q JOIN tf ON tf.term = q.term GROUP BY q.qid, tf.doc_id),
    w(rnk, wt) AS (VALUES {w_rows}),
    dcg AS (SELECT t.qid, CAST(sum(COALESCE(rel.rel, 0) * w.wt) AS BIGINT) AS dcg
            FROM top10 t JOIN w ON w.rnk = t.rnk
                 LEFT JOIN rel ON rel.qid = t.qid AND rel.doc_id = t.doc_id
            GROUP BY t.qid),
    ideal AS (SELECT qid, rel,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY rel DESC, doc_id) - 1 AS rnk
              FROM rel
              QUALIFY row_number() OVER (PARTITION BY qid
                                         ORDER BY rel DESC, doc_id) <= 10),
    idcg AS (SELECT qid, CAST(sum(rel * w.wt) AS BIGINT) AS idcg
             FROM ideal JOIN w ON w.rnk = ideal.rnk GROUP BY qid)"""
        final_select = """SELECT dcg.qid, dcg.dcg, idcg.idcg,
           CAST(dcg.dcg * 1000000 // idcg.idcg AS BIGINT) AS ndcg_e6
    FROM dcg JOIN idcg USING (qid)"""
    elif variant == "ltr":
        # LTR feature export — SearchIndex.ltr_features: exact-integer
        # feature vectors for the e6 top-10 (score, dl, matched-term
        # count, summed tf, epoch-day recency)
        collapse_ctes = """,
    top10 AS (SELECT qid, doc_id, score_e6,
                     row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) - 1 AS rnk
              FROM e6
              QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 10),
    qd AS (SELECT DISTINCT qid, term FROM q),
    feat AS (SELECT t.qid, t.doc_id,
                    CAST(count(*) AS BIGINT) AS n_terms,
                    CAST(sum(tf.tf) AS BIGINT) AS sum_tf
             FROM top10 t
             JOIN qd ON qd.qid = t.qid
             JOIN tf ON tf.term = qd.term AND tf.doc_id = t.doc_id
             GROUP BY t.qid, t.doc_id)"""
        final_select = """SELECT t.qid, t.rnk AS "rank", t.doc_id, t.score_e6,
           CAST(dl.dl AS BIGINT) AS dl, feat.n_terms, feat.sum_tf,
           CAST(floor(epoch(d.warc_ts) / 86400) AS BIGINT) AS warc_day
    FROM top10 t
    JOIN dl ON dl.doc_id = t.doc_id
    JOIN feat ON feat.qid = t.qid AND feat.doc_id = t.doc_id
    JOIN docs d ON d.doc_id = t.doc_id"""
    elif variant == "rrf":
        # reciprocal-rank fusion of the BM25 and reference-tfidf top-10
        # rankings: rrf = sum over systems 1e6 // (60 + rank) — exact
        # integers end to end (Cormack et al. 2009's k=60)
        collapse_ctes = """,
    r1 AS (SELECT qid, doc_id,
                  row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) - 1 AS rnk
           FROM e6
           QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 10),
    scores_ref AS (
      SELECT q.qid, tf.doc_id,
             sum(log10(CAST(stats.n AS DOUBLE) / df.df)
                 * (1 + log10(CAST(tf.tf AS DOUBLE)))) AS score
      FROM q JOIN df USING (term) JOIN tf ON tf.term = q.term, stats
      GROUP BY q.qid, tf.doc_id
      HAVING sum(log10(CAST(stats.n AS DOUBLE) / df.df)
                 * (1 + log10(CAST(tf.tf AS DOUBLE)))) > 0.3),
    e6r AS (SELECT qid, doc_id,
                   CAST(round(score * 1000000) AS BIGINT) AS score_e6
            FROM scores_ref),
    r2 AS (SELECT qid, doc_id,
                  row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) - 1 AS rnk
           FROM e6r
           QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 10),
    fused AS (SELECT qid, doc_id,
                     CAST(sum(1000000 // (60 + rnk)) AS BIGINT) AS rrf_e6
              FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
              GROUP BY qid, doc_id)"""
        final_select = """SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf_e6 DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, rrf_e6
    FROM fused
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY rrf_e6 DESC, doc_id) <= 10"""
    elif variant == "mmr":
        # MMR diversification — bm25_topk_mmr: pairwise integer Jaccard
        # over candidate token sets (tf rows ARE the distinct
        # (doc_id, term) pairs), then k-1 unrolled greedy steps; every
        # comparison is int64 (lam_e6=500000)
        _steps = []
        for r in range(1, 10):
            _steps.append(f""",
    cand{r} AS MATERIALIZED (
      SELECT p.qid, p.doc_id, p.score_e6, max(COALESCE(s.sim_e6, 0)) AS ms
      FROM pref p
      ANTI JOIN sel{r - 1} d ON d.qid = p.qid AND d.doc_id = p.doc_id
      JOIN sel{r - 1} t ON t.qid = p.qid
      LEFT JOIN sims s ON s.qid = p.qid AND s.da = p.doc_id AND s.db = t.doc_id
      GROUP BY p.qid, p.doc_id, p.score_e6),
    pick{r} AS MATERIALIZED (
      SELECT qid, doc_id, score_e6, CAST({r} AS BIGINT) AS mmr_rank FROM (
        SELECT qid, doc_id, score_e6,
               500000 * score_e6 - 500000 * ms AS val
        FROM cand{r})
      QUALIFY row_number() OVER (PARTITION BY qid ORDER BY val DESC, doc_id) = 1),
    sel{r} AS MATERIALIZED (
      SELECT * FROM sel{r - 1} UNION ALL SELECT * FROM pick{r})""")
        collapse_ctes = (
            """,
    pref AS MATERIALIZED (
             SELECT qid, doc_id, score_e6,
                    row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) AS rn
             FROM e6
             QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 50),
    ct AS MATERIALIZED (SELECT p.qid, p.doc_id, tf.term
                        FROM pref p JOIN tf USING (doc_id)),
    szs AS (SELECT qid, doc_id, count(*) AS sz FROM ct GROUP BY qid, doc_id),
    it AS (SELECT a.qid, a.doc_id AS da, b.doc_id AS db, count(*) AS i
           FROM ct a JOIN ct b ON a.qid = b.qid AND a.term = b.term
                             AND a.doc_id <> b.doc_id
           GROUP BY a.qid, a.doc_id, b.doc_id),
    sims AS MATERIALIZED (
      SELECT it.qid, it.da, it.db,
             CAST(1000000 * it.i // (sa.sz + sb.sz - it.i) AS BIGINT) AS sim_e6
      FROM it JOIN szs sa ON sa.qid = it.qid AND sa.doc_id = it.da
              JOIN szs sb ON sb.qid = it.qid AND sb.doc_id = it.db),
    sel0 AS MATERIALIZED (
             SELECT qid, doc_id, score_e6, CAST(0 AS BIGINT) AS mmr_rank
             FROM pref WHERE rn = 1)"""
            + "".join(_steps)
        )
        final_select = """SELECT qid, mmr_rank, doc_id, score_e6 FROM sel9"""
    elif variant == "tiered":
        # two-tier champion-list retrieval — bm25_topk_tiered: per-term
        # champion list = top-32 postings by (tf desc, doc_id); tier 1
        # serves from the champion union when it holds >= 50 docs, else
        # tier 2 = the exhaustive flagship ranking
        collapse_ctes = """,
    champ AS (SELECT term, doc_id FROM tf
              WHERE term IN (SELECT DISTINCT term FROM q)
              QUALIFY row_number() OVER (PARTITION BY term
                                         ORDER BY tf DESC, doc_id) <= 32),
    cand AS (SELECT DISTINCT q.qid, c.doc_id FROM q JOIN champ c USING (term)),
    nc AS (SELECT qid, count(*) AS n FROM cand GROUP BY qid),
    tiered AS (
      SELECT e6.qid, e6.doc_id, e6.score_e6, CAST(1 AS BIGINT) AS tier
      FROM e6 JOIN cand ON cand.qid = e6.qid AND cand.doc_id = e6.doc_id
              JOIN nc ON nc.qid = e6.qid
      WHERE nc.n >= 50
      UNION ALL
      SELECT e6.qid, e6.doc_id, e6.score_e6, CAST(2 AS BIGINT) AS tier
      FROM e6 JOIN nc ON nc.qid = e6.qid
      WHERE nc.n < 50)"""
        final_select = """SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, score_e6, tier
    FROM tiered
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 10"""
    elif variant == "mrr":
        # reciprocal rank of the first FULLY-relevant result (doc
        # contains ALL distinct query terms), exact-integer — q_search_mrr
        collapse_ctes = """,
    top10 AS (SELECT qid, doc_id,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY score_e6 DESC, doc_id) - 1 AS rnk
              FROM e6
              QUALIFY row_number() OVER (PARTITION BY qid
                                         ORDER BY score_e6 DESC, doc_id) <= 10),
    nq AS (SELECT qid, count(DISTINCT term) AS n_terms FROM q GROUP BY qid),
    rel AS (SELECT q.qid, tf.doc_id
            FROM q JOIN tf ON tf.term = q.term JOIN nq ON nq.qid = q.qid
            GROUP BY q.qid, tf.doc_id, nq.n_terms
            HAVING count(DISTINCT q.term) = nq.n_terms),
    hit AS (SELECT t.qid, min(t.rnk) AS first_rnk
            FROM top10 t JOIN rel ON rel.qid = t.qid AND rel.doc_id = t.doc_id
            GROUP BY t.qid)"""
        final_select = """SELECT nq.qid,
           COALESCE(hit.first_rnk, -1) AS first_rnk,
           CASE WHEN hit.first_rnk IS NULL THEN 0
                ELSE 1000000 // (hit.first_rnk + 1) END AS rr_e6
    FROM nq LEFT JOIN hit ON hit.qid = nq.qid
    WHERE nq.qid IN (SELECT DISTINCT qid FROM scores)"""
    elif variant == "map":
        # average precision @10 vs the MRR relevance oracle (doc
        # contains ALL distinct query terms) — exact integers via the
        # lcm(1..10)=2520 common denominator: the i-th relevant result
        # at 0-based rank r contributes i * (2520 // (r+1)); ap_e6 =
        # 1e6 * ap_num // (2520 * min(n_rel, 10)) — q_search_map
        collapse_ctes = """,
    top10 AS (SELECT qid, doc_id,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY score_e6 DESC, doc_id) - 1 AS rnk
              FROM e6
              QUALIFY row_number() OVER (PARTITION BY qid
                                         ORDER BY score_e6 DESC, doc_id) <= 10),
    nq AS (SELECT qid, count(DISTINCT term) AS n_terms FROM q GROUP BY qid),
    rel AS (SELECT q.qid, tf.doc_id
            FROM q JOIN tf ON tf.term = q.term JOIN nq ON nq.qid = q.qid
            GROUP BY q.qid, tf.doc_id, nq.n_terms
            HAVING count(DISTINCT q.term) = nq.n_terms),
    nrel AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_rel FROM rel GROUP BY qid),
    hitpos AS (SELECT t.qid, t.rnk
               FROM top10 t
               JOIN rel ON rel.qid = t.qid AND rel.doc_id = t.doc_id),
    hiti AS (SELECT qid, rnk,
                    row_number() OVER (PARTITION BY qid ORDER BY rnk) AS i
             FROM hitpos),
    apn AS (SELECT qid, CAST(sum(i * (2520 // (rnk + 1))) AS BIGINT) AS ap_num
            FROM hiti GROUP BY qid)"""
        final_select = """SELECT nq.qid,
           COALESCE(nrel.n_rel, 0) AS n_rel,
           CASE WHEN COALESCE(nrel.n_rel, 0) = 0 OR apn.ap_num IS NULL THEN 0
                ELSE CAST(1000000 * apn.ap_num
                          // (2520 * least(nrel.n_rel, 10)) AS BIGINT)
           END AS ap_e6
    FROM nq LEFT JOIN nrel ON nrel.qid = nq.qid
            LEFT JOIN apn ON apn.qid = nq.qid
    WHERE nq.qid IN (SELECT DISTINCT qid FROM scores)"""
    elif variant == "conj":
        # strict-AND filter over the flagship ranking: a doc qualifies
        # iff it matches EVERY distinct query term (absent terms make
        # the count unreachable, emptying the query — engine parity)
        collapse_ctes = """,
    nq AS (SELECT qid, count(DISTINCT term) AS m FROM q GROUP BY qid),
    allhit AS (SELECT q.qid, tf.doc_id
               FROM q JOIN tf ON tf.term = q.term JOIN nq ON nq.qid = q.qid
               GROUP BY q.qid, tf.doc_id, nq.m
               HAVING count(DISTINCT q.term) = nq.m),
    conj AS (SELECT e6.* FROM e6
             JOIN allhit ON allhit.qid = e6.qid AND allhit.doc_id = e6.doc_id)"""
        final_select = """SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, score_e6
    FROM conj
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 10"""
    elif variant == "mm":
        # minimum_should_match (mm=2): a doc qualifies iff it matches
        # >= least(2, #distinct query terms) DISTINCT terms — absent
        # terms count as unmatched clauses, exactly like the engine
        collapse_ctes = """,
    nq AS (SELECT qid, count(DISTINCT term) AS m FROM q GROUP BY qid),
    hits AS (SELECT q.qid, tf.doc_id, count(DISTINCT q.term) AS nm
             FROM q JOIN tf ON tf.term = q.term GROUP BY q.qid, tf.doc_id),
    mmok AS (SELECT e6.* FROM e6
             JOIN hits ON hits.qid = e6.qid AND hits.doc_id = e6.doc_id
             JOIN nq ON nq.qid = e6.qid
             WHERE hits.nm >= least(2, nq.m))"""
        final_select = """SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, score_e6
    FROM mmok
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 10"""
    elif variant == "qpp":
        # pre-retrieval QPP features from term stats alone; the scores
        # CTE goes unreferenced (DuckDB skips unmaterialized CTEs)
        collapse_ctes = """,
    qd AS (SELECT DISTINCT qid, term FROM q),
    st AS (SELECT term, count(*) AS df, sum(tf) AS cf FROM tf
           WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY term)"""
        final_select = """SELECT qd.qid,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(round(sum(ln(1 + (stats.n - st.df + 0.5) / (st.df + 0.5))) * 1000000) AS BIGINT) AS sum_idf_e6,
           CAST(round(max(ln(1 + (stats.n - st.df + 0.5) / (st.df + 0.5))) * 1000000) AS BIGINT) AS max_idf_e6,
           CAST(round(sum((1 + ln(CAST(st.cf AS DOUBLE)))
                          * ln(1 + (stats.n - st.df + 0.5) / (st.df + 0.5))) * 1000000) AS BIGINT) AS scq_e6
    FROM qd JOIN st USING (term), stats
    GROUP BY qd.qid"""
    elif variant == "explain":
        # per-(top-3 doc, matched term) BM25 contribution breakdown;
        # parenthesized exactly like the engine (idf * (tf_part))
        collapse_ctes = """,
    top3 AS (SELECT qid, doc_id FROM e6
             QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 3),
    qd AS (SELECT DISTINCT qid, term FROM q)"""
        final_select = """SELECT t.qid, t.doc_id, qd.term,
           CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
           CAST(round(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                 * ((tf.tf * (1.2 + 1))
                    / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl)))
                 * 1000000) AS BIGINT) AS contrib_e6
    FROM top3 t
    JOIN qd ON qd.qid = t.qid
    JOIN tf ON tf.term = qd.term AND tf.doc_id = t.doc_id
    JOIN df ON df.term = qd.term
    JOIN dl ON dl.doc_id = t.doc_id, stats"""
    elif variant == "page2":
        # ranks 11..20 of the flagship ranking — the search-after page
        collapse_ctes = ""
        final_select = """SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, score_e6
    FROM e6
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) BETWEEN 11 AND 20"""
    elif host_collapse is None:
        collapse_ctes = ""
        final_select = """SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, score_e6
    FROM e6
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 10"""
    else:
        # site collapse: e6 top-50 candidate prefix -> at most
        # `host_collapse` rows per URL host in prefix order -> top-10.
        # The host regex is functions/urls.py:HOST_RE, literally.
        collapse_ctes = f""",
    pref AS (SELECT qid, doc_id, score_e6,
                    row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) AS rn
             FROM e6
             QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 50),
    hosted AS (SELECT pref.qid, pref.doc_id, pref.score_e6, pref.rn,
                      lower(regexp_extract(docs.url,
                            '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/:?#]+)', 1)) AS host
               FROM pref JOIN docs USING (doc_id)),
    coll AS (SELECT qid, doc_id, score_e6, host, rn
             FROM hosted
             QUALIFY row_number() OVER (PARTITION BY qid, host ORDER BY rn) <= {host_collapse})"""
        final_select = """SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY rn) - 1 AS BIGINT) AS "rank",
           doc_id, score_e6, host
    FROM coll
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY rn) <= 10"""

    # ``winner_order`` overrides the exact-dedup keep-first rule —
    # the segmented/updated-index fixtures index the EVEN doc_id half
    # first, so cross-generation dup ties resolve first-indexed-wins
    # ("(doc_id % 2), warc_ts, url") instead of the fresh-build
    # "warc_ts, url" (same convention as _index_update_oracle_sql)
    order = winner_order or "warc_ts, url"
    return f"""
    WITH pages AS (SELECT * FROM read_parquet('{pages_path}')),
    winners AS MATERIALIZED (
      SELECT url, text, lang, warc_ts FROM (
        SELECT url, text, lang, warc_ts,
               row_number() OVER (PARTITION BY html ORDER BY {order}) AS rn
        FROM pages) WHERE rn = 1),
    docs AS (
      SELECT CAST(('0x' || substr(md5(url), 1, 16))::UBIGINT
                  & 9223372036854775807::UBIGINT AS BIGINT) AS doc_id,
             url, text, lang, warc_ts
      FROM winners),
    toks AS MATERIALIZED (SELECT doc_id, unnest({toks_pages}) AS term FROM docs),
    tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT (SELECT count(*) FROM docs) AS n,
                     CAST((SELECT count(*) FROM toks) AS DOUBLE)
                       / (SELECT count(*) FROM docs) AS avgdl,
                     CAST((SELECT count(*) FROM toks) AS DOUBLE) AS c),
    q(qid, term) AS (VALUES {', '.join(q_rows)}),
    df AS (SELECT term, count(*) AS df FROM tf
           WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY term),{lm_ctes}
    scores AS (
      SELECT q.qid, tf.doc_id, {score_expr} AS score
      {joins}
      GROUP BY q.qid, tf.doc_id
      {having}),
    e6 AS (SELECT qid, doc_id,
                  CAST(round(score * 1000000) AS BIGINT) AS score_e6
           FROM scores){collapse_ctes}
    {final_select}
    """


def _oracle_sf_dir() -> str:
    return os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _docs_cte() -> str:
    """Shared SQL prefix of the index-built search oracles: the pages
    corpus -> exact content dedup winners -> (doc_id, text) docs, the
    same contract the flagship oracle pins (dedup keep-first by
    (warc_ts, url) per html; doc_id = first 8 bytes of md5(url) masked
    to 63 bits)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    return f"""
    WITH pages AS (SELECT * FROM read_parquet('{pages_path}')),
    winners AS (
      SELECT url, text FROM (
        SELECT url, text,
               row_number() OVER (PARTITION BY html ORDER BY warc_ts, url) AS rn
        FROM pages) WHERE rn = 1),
    docs AS (
      SELECT CAST(('0x' || substr(md5(url), 1, 16))::UBIGINT
                  & 9223372036854775807::UBIGINT AS BIGINT) AS doc_id,
             text
      FROM winners)"""


def _phrase_oracle_sql() -> str:
    """DuckDB twin of ``search_phrase``: re-derives exact-phrase
    occurrence counts from token POSITIONS (unnest + generate_subscripts
    over the canonical tokenization), counting every — including
    overlapping — start position exactly like
    ``SearchIndex.phrase_topk``, then top-10 per qid by
    (n_occ desc, doc_id)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        phrase_queries,
    )

    q_rows = [
        f"({qid}, {off}, '{t}')"
        for qid, q in phrase_queries()
        for off, t in enumerate(tokenize(q))
    ]
    return f"""{_docs_cte()},
    doc_toks AS (SELECT doc_id, {TOKS} AS l FROM docs),
    toks AS (SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
             FROM doc_toks),
    q(qid, off, term) AS (VALUES {', '.join(q_rows)}),
    qn AS (SELECT qid, count(*) AS L FROM q GROUP BY qid),
    starts AS (
      SELECT q.qid, t.doc_id, t.pos - q.off AS s
      FROM toks t JOIN q ON t.term = q.term JOIN qn ON qn.qid = q.qid
      GROUP BY q.qid, t.doc_id, t.pos - q.off, qn.L
      HAVING count(DISTINCT q.off) = qn.L),
    occ AS (SELECT qid, doc_id, count(*) AS n_occ FROM starts GROUP BY qid, doc_id)
    SELECT CAST(qid AS BIGINT) AS qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY n_occ DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, n_occ
    FROM occ
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY n_occ DESC, doc_id) <= 10
    """


def _boolean_oracle_sql() -> str:
    """DuckDB twin of ``search_boolean_and``: docs matching EVERY unique
    query term (strict AND — a corpus-absent term empties the query),
    ranked by summed tf desc then doc_id, top-10 per qid."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        reference_queries,
    )

    q_rows = [
        f"({qid}, '{t}')"
        for qid, q in reference_queries()
        for t in tokenize_query(q)
    ]
    return f"""{_docs_cte()},
    toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM docs),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    q(qid, term) AS (VALUES {', '.join(q_rows)}),
    qn AS (SELECT qid, count(*) AS L FROM q GROUP BY qid),
    hits AS (
      SELECT q.qid, tf.doc_id, sum(tf.tf) AS sum_tf
      FROM q JOIN tf USING (term) JOIN qn ON qn.qid = q.qid
      GROUP BY q.qid, tf.doc_id, qn.L
      HAVING count(DISTINCT q.term) = qn.L)
    SELECT CAST(qid AS BIGINT) AS qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY sum_tf DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, CAST(sum_tf AS BIGINT) AS sum_tf
    FROM hits
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sum_tf DESC, doc_id) <= 10
    """


def _snippet_oracle_sql(width: int = 12) -> str:
    """DuckDB twin of ``search_snippet``: strict-AND top-1 doc per qid,
    then the best ``width``-token window by distinct-query-term coverage
    (tie -> leftmost), re-derived from token positions. SQL positions
    are 1-based (generate_subscripts); the final window_start converts
    to the engine's 0-based convention."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        reference_queries,
    )

    q_rows = [
        f"({qid}, '{t}')"
        for qid, q in reference_queries()
        for t in tokenize_query(q)
    ]
    return f"""{_docs_cte()},
    doc_toks AS (SELECT doc_id, {TOKS} AS l FROM docs),
    toks AS (SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
             FROM doc_toks),
    q(qid, term) AS (VALUES {', '.join(q_rows)}),
    qn AS (SELECT qid, count(*) AS L FROM q GROUP BY qid),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY doc_id, term),
    hits AS (
      SELECT q.qid, tf.doc_id, sum(tf.tf) AS sum_tf
      FROM q JOIN tf USING (term) JOIN qn ON qn.qid = q.qid
      GROUP BY q.qid, tf.doc_id, qn.L
      HAVING count(DISTINCT q.term) = qn.L),
    top1 AS (
      SELECT qid, doc_id FROM hits
      QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sum_tf DESC, doc_id) = 1),
    qpos AS (
      SELECT q.qid, t.doc_id, q.term, t.pos
      FROM q JOIN top1 USING (qid)
      JOIN toks t ON t.doc_id = top1.doc_id AND t.term = q.term),
    starts AS (SELECT DISTINCT qid, doc_id, pos AS s FROM qpos),
    win AS (
      SELECT s.qid, s.doc_id, s.s, count(DISTINCT p.term) AS n_terms
      FROM starts s JOIN qpos p ON p.qid = s.qid AND p.doc_id = s.doc_id
                                AND p.pos >= s.s AND p.pos < s.s + {width}
      GROUP BY s.qid, s.doc_id, s.s)
    SELECT CAST(qid AS BIGINT) AS qid, doc_id,
           CAST(s - 1 AS BIGINT) AS window_start,
           CAST(n_terms AS BIGINT) AS n_terms_in_window
    FROM win
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY n_terms DESC, s) = 1
    """


def _proximity_oracle_sql() -> str:
    """DuckDB twin of ``search_proximity``: for every strict-AND
    candidate doc, the minimal window containing all distinct query
    terms — for each query-term position ``s``, the earliest completion
    is ``max over terms of min(pos >= s)``; require every term to
    complete; doc span = min over ``s``. Top-10 per qid by
    (min_span asc, doc_id)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        reference_queries,
    )

    q_rows = [
        f"({qid}, '{t}')"
        for qid, q in reference_queries()
        for t in tokenize_query(q)
    ]
    return f"""{_docs_cte()},
    doc_toks AS (SELECT doc_id, {TOKS} AS l FROM docs),
    toks AS (SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
             FROM doc_toks),
    q(qid, term) AS (VALUES {', '.join(q_rows)}),
    qn AS (SELECT qid, count(*) AS L FROM q GROUP BY qid),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY doc_id, term),
    hits AS (
      SELECT q.qid, tf.doc_id
      FROM q JOIN tf USING (term) JOIN qn ON qn.qid = q.qid
      GROUP BY q.qid, tf.doc_id, qn.L
      HAVING count(DISTINCT q.term) = qn.L),
    qpos AS (
      SELECT q.qid, t.doc_id, q.term, t.pos
      FROM q JOIN hits h ON h.qid = q.qid
      JOIN toks t ON t.doc_id = h.doc_id AND t.term = q.term),
    starts AS (SELECT DISTINCT qid, doc_id, pos AS s FROM qpos),
    comp AS (
      SELECT s.qid, s.doc_id, s.s, p.term, min(p.pos) AS first_ge
      FROM starts s JOIN qpos p ON p.qid = s.qid AND p.doc_id = s.doc_id
                                AND p.pos >= s.s
      GROUP BY ALL),
    spans AS (
      SELECT c.qid, c.doc_id, c.s, max(c.first_ge) - c.s + 1 AS span
      FROM comp c JOIN qn ON qn.qid = c.qid
      GROUP BY c.qid, c.doc_id, c.s, qn.L
      HAVING count(*) = qn.L),
    minspan AS (SELECT qid, doc_id, CAST(min(span) AS BIGINT) AS min_span
                FROM spans GROUP BY qid, doc_id)
    SELECT CAST(qid AS BIGINT) AS qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY min_span, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, min_span
    FROM minspan
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY min_span, doc_id) <= 10
    """


def _host_stats_oracle_sql() -> str:
    """DuckDB twin of ``crawl_host_stats``: host = url authority via the
    same regex; byte totals via strlen/octet_length (bytes, matching the
    engine's ``binary_length``)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    return f"""
    SELECT regexp_extract(url, '^[a-z]+://([^/:]+)', 1) AS host,
           count(*) AS n_pages,
           CAST(sum(octet_length(html)) AS BIGINT) AS sum_html_bytes,
           CAST(sum(strlen(text)) AS BIGINT) AS sum_text_bytes
    FROM read_parquet('{pages_path}')
    GROUP BY 1
    """


def _vocab_neighbors_oracle_sql() -> str:
    """DuckDB twin of ``text_vocab_neighbors``: native levenshtein over
    the O(V^2) vocabulary cross join of the PAGES corpus — the opposite
    physical plan to the engine's sub-quadratic deletion-hash join."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    return f"""
    WITH toks AS (SELECT DISTINCT unnest({TOKS}) AS term
                  FROM read_parquet('{pages_path}'))
    SELECT a.term AS term_a, b.term AS term_b
    FROM toks a JOIN toks b ON a.term < b.term
    WHERE levenshtein(a.term, b.term) = 1
    """


def _host_latest_oracle_sql() -> str:
    """DuckDB twin of ``crawl_host_latest``: argmax by capture time per
    host (tie by url) via one window rank."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    return f"""
    SELECT split_part(url, '/', 3) AS host, url,
           CAST(epoch_us(warc_ts) AS BIGINT) AS ts_us
    FROM read_parquet('{pages_path}')
    QUALIFY row_number() OVER (PARTITION BY split_part(url, '/', 3)
                               ORDER BY warc_ts DESC, url) = 1
    """


def _term_complete_oracle_sql() -> str:
    """DuckDB twin of ``search_term_complete``: vocabulary cf over the
    dedup winners' tokens, top-10 per prefix by (cf desc, term)."""
    p_rows = ", ".join(f"('{p}')" for p in TERM_COMPLETE_PREFIXES)
    return f"""{_docs_cte()},
    toks AS (SELECT unnest({TOKS}) AS term FROM docs),
    cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term),
    p(prefix) AS (VALUES {p_rows}),
    cand AS (SELECT p.prefix, cf.term, CAST(cf.cf AS BIGINT) AS cf
             FROM p JOIN cf ON starts_with(cf.term, p.prefix))
    SELECT prefix, term, cf FROM cand
    QUALIFY row_number() OVER (PARTITION BY prefix ORDER BY cf DESC, term) <= 10
    """


def _sketch_oracle_sqls(est_threshold: float = 0.2) -> dict[str, str]:
    """Containment oracles for the sketch-based near-dup queries.

    The sketches themselves (blake2b token hashes -> MinHash /
    SimHash) are not expressible in DuckDB, so the per-doc signatures
    are computed HERE with the same pure functions
    (``functions/sketches.py``) and embedded as VALUES literals; the
    SQL then re-derives the full candidate-pair answer from the
    signatures by brute force — every band collision, estimate,
    threshold and pair-dedup decision the DISTRIBUTED banding pipeline
    makes is checked against the quadratic definition. (Recall of the
    sketches vs exact Jaccard stays a pytest metric, tests/test_dedup.py.)
    """
    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.sketches import (
        minhash_params,
        minhash_signature,
        shingle_hashes,
        simhash64,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize,
    )

    docs = pq.read_table(
        os.path.join(_oracle_sf_dir(), "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()

    # --- MinHash (must mirror queries(): q_dedup_minhash params) ---
    num_perm, num_bands, shingle_n, seed = 128, 32, 3, 1
    rows_per_band = num_perm // num_bands
    a, b = minhash_params(num_perm, seed)
    sig_rows = []
    sim_rows = []
    from collections import Counter

    for did, text in zip(ids, texts):
        toks = tokenize(text)
        sig = minhash_signature(shingle_hashes(toks, shingle_n), a, b)
        sig_rows.append(f"({did}, [{','.join(str(int(v)) for v in sig)}])")
        counts = Counter(toks)
        sh = simhash64(
            list(counts.keys()), np.fromiter(counts.values(), np.int64, len(counts))
        )
        if sh >= 1 << 63:  # signed int64 view, as the Arrow column stores it
            sh -= 1 << 64
        sim_rows.append(f"({did}, {sh})")

    minhash_sql = f"""
    WITH sig(doc_id, s) AS (VALUES {', '.join(sig_rows)}),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.s AS sa, b.s AS sb
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id),
    m AS (SELECT doc_a, doc_b,
                 len(list_filter(range(1, {num_perm + 1}), i -> sa[i] = sb[i])) AS agree,
                 len(list_filter(range(0, {num_bands}), b ->
                     list_slice(sa, b*{rows_per_band}+1, (b+1)*{rows_per_band}) =
                     list_slice(sb, b*{rows_per_band}+1, (b+1)*{rows_per_band}))) > 0 AS collide
          FROM p)
    SELECT doc_a, doc_b, agree / {num_perm}.0 AS est_jaccard, false AS truncated
    FROM m WHERE collide AND agree / {num_perm}.0 >= {est_threshold}
    """

    simhash_sql = f"""
    WITH sh(doc_id, h) AS (VALUES {', '.join(sim_rows)})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.h, b.h)) <= 3
    """
    return {"dedup_minhash_lsh": minhash_sql, "dedup_simhash": simhash_sql}


def _pii_scrub_oracle_sql() -> str:
    """text_pii_scrub twin: replay the doc_id-derived PII injection
    (CASE/lpad string builds), then count each pattern on the augmented
    text (``regexp_extract_all`` = non-overlapping left-to-right RE2
    matches, same rule as pyarrow ``count_substring_regex``) and md5 the
    email->phone->IPv4 redaction chain. Patterns are the module
    constants from ``stages/textstats`` so both engines compile the
    identical RE2."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        PII_EMAIL_RE,
        PII_IP_RE,
        PII_PHONE_RE,
    )

    def lit(pat: str) -> str:
        return "'" + pat.replace("'", "''") + "'"

    e, p, i = lit(PII_EMAIL_RE), lit(PII_PHONE_RE), lit(PII_IP_RE)
    return f"""
    WITH aug AS (
      SELECT doc_id,
        text
        || CASE WHEN doc_id % 2 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' ELSE '' END
        || CASE WHEN doc_id % 3 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
        || CASE WHEN doc_id % 5 = 0 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
                || '.0.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
      len(regexp_extract_all(t, {e})) AS n_emails,
      len(regexp_extract_all(t, {p})) AS n_phones,
      len(regexp_extract_all(t, {i})) AS n_ips,
      md5(regexp_replace(regexp_replace(regexp_replace(t,
          {e}, '<EMAIL>', 'g'), {p}, '<PHONE>', 'g'), {i}, '<IP>', 'g')) AS clean_md5
    FROM aug
    """


def _fingerprint_oracle_sql() -> str:
    """text_fingerprint oracle: fp_md5 fully re-derived in SQL from the
    canonical tokenizer expression; fp_rolling (winnowing over blake2b
    token hashes — not SQL-expressible) computed HERE with the pure
    function per doc and embedded as VALUES, joined back by doc_id (the
    sketch-oracle pattern, same as dedup_minhash_lsh)."""
    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.sketches import (
        rolling_fingerprint,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize,
    )

    docs = pq.read_table(
        os.path.join(_oracle_sf_dir(), "documents.parquet"), columns=["doc_id", "text"]
    )
    rows = []
    for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        fp = rolling_fingerprint(tokenize(text))
        if fp >= 1 << 63:  # signed int64 view, as the Arrow column stores it
            fp -= 1 << 64
        rows.append(f"({did}, {fp})")
    return f"""
    WITH roll(doc_id, fp_rolling) AS (VALUES {', '.join(rows)})
    SELECT d.doc_id, md5(array_to_string({TOKS}, ' ')) AS fp_md5, r.fp_rolling
    FROM documents d JOIN roll r ON r.doc_id = d.doc_id
    """


# BPEISH_RE count in pure RE2: the only non-RE2 piece of the pretokenizer
# is the lookahead in `\s+(?!\S)`, which never changes the MATCH COUNT
# except when a whitespace run of length >= 2 ends with a non-space
# whitespace char right before a token — each such site splits one extra
# match, and is itself countable by a second (lookahead-free) regex.
# Exact for RE2-compatible whitespace ([ \t\n\r\f]); proven by a
# 5000-case fuzz + the full driver corpus in tests/test_textstats.py.
BPE_RE2_SQL = "''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+"
BPE_CORR_SQL = "\\s[^\\S ]\\S"


def _bpe_count_oracle_sql() -> str:
    return f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{BPE_RE2_SQL}'))
             + len(regexp_extract_all(text, '{BPE_CORR_SQL}')) AS n_bpe_tokens
    FROM documents
    """


def _media_features_oracle_sql() -> str:
    """media_features oracle: the synthetic corpus generator
    (stages/multimodal.py:synth_media) is a pure function of (n, seed)
    whose METADATA columns (width/height/duration_ms) are chosen before
    encoding; the pipeline must recover them by actually DECODING the
    payload bytes. The oracle embeds, per media_id, the generator
    metadata plus sha1/length computed directly from the generated
    payloads — decode-inverts-encode, checked row by row."""
    import hashlib

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        synth_media,
    )

    t = synth_media(MEDIA_N)
    rows = []
    for i in range(t.num_rows):
        payload = t["payload"][i].as_py()
        rows.append(
            "({}, '{}', {}, '{}', true, {}, {}, {})".format(
                t["media_id"][i].as_py(),
                t["kind"][i].as_py(),
                len(payload),
                hashlib.sha1(payload).hexdigest(),
                t["width"][i].as_py(),
                t["height"][i].as_py(),
                t["duration_ms"][i].as_py(),
            )
        )
    return f"""
    SELECT CAST(media_id AS BIGINT) AS media_id, kind,
           CAST(payload_bytes AS BIGINT) AS payload_bytes, payload_sha1,
           decoded, CAST(width AS INTEGER) AS width,
           CAST(height AS INTEGER) AS height,
           CAST(duration_ms AS INTEGER) AS duration_ms
    FROM (VALUES {', '.join(rows)})
      AS t(media_id, kind, payload_bytes, payload_sha1, decoded, width, height, duration_ms)
    """


def _media_frames_oracle_sql() -> str:
    """media_frames oracle: per-frame ground truth (mean_luma /
    frame_sha1 of the PRE-ENCODE pixel arrays, synth_media_frame_truth)
    is embedded as VALUES for EVERY frame; the frame-sampling rule of
    FrameSampleStage (uniform every stride_ms, capped at max_frames) is
    re-expressed in SQL, so the pipeline must recover the sampled rows
    by slicing + decoding the actual container payloads."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        synth_media_frame_truth,
    )

    t = synth_media_frame_truth(MEDIA_N)
    rows = [
        "({}, {}, {}, {!r}, '{}')".format(
            t["media_id"][i].as_py(),
            t["frame_idx"][i].as_py(),
            t["frame_ts_ms"][i].as_py(),
            t["mean_luma"][i].as_py(),
            t["frame_sha1"][i].as_py(),
        )
        for i in range(t.num_rows)
    ]
    # FrameSampleStage defaults: stride_ms=1000, max_frames=32; the
    # synthetic corpus encodes every video at frame_ms=500
    step = max(1, 1000 // 500)
    return f"""
    SELECT CAST(media_id AS BIGINT) AS media_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(frame_ts_ms AS INTEGER) AS frame_ts_ms,
           round(CAST(mean_luma AS DOUBLE), 6) AS mean_luma, frame_sha1
    FROM (VALUES {', '.join(rows)})
      AS t(media_id, frame_idx, frame_ts_ms, mean_luma, frame_sha1)
    WHERE frame_idx % {step} = 0 AND frame_idx // {step} < 32
    """


def _near_dups_oracle_sql() -> str:
    """Oracle for embedding_near_dups, mirroring the size-aware cutover
    in ``stages/ann.py:embedding_near_dup_pairs_auto``: plain exact
    all-pairs SQL at/below NEAR_DUP_EXACT_MAX rows; above it, the banded
    hyperplane LSH is REPLAYED in SQL — per-band bucket keys recomputed
    from embedded plane literals (planes deterministic in seed 7), a
    same-(band,bucket) self-join for candidates, exact cosine verify,
    DISTINCT across bands — brute-forcing the distributed scale path."""
    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
        hyperplanes,
        near_dup_planes_per_band,
    )

    thr_e6 = int(round(NEAR_DUP_THR * 1e6))
    pf = pq.ParquetFile(os.path.join(_oracle_sf_dir(), "embeddings.parquet"))
    n = pf.metadata.num_rows
    if n <= NEAR_DUP_EXACT_MAX:
        return f"""
    WITH s AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                               CAST(b.embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS cosine_e6
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, cosine_e6 FROM s WHERE cosine_e6 >= {thr_e6}
    """
    dim = len(pf.read_row_group(0, columns=["embedding"])["embedding"][0])
    ppb = near_dup_planes_per_band(n)
    planes = hyperplanes(dim, NEAR_DUP_BANDS * ppb, 7)
    band_selects = []
    for bnd in range(NEAR_DUP_BANDS):
        expr = " + ".join(
            f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
            f"[{','.join(repr(float(x)) for x in planes[bnd * ppb + j])}]) > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(ppb)
        )
        band_selects.append(
            f"SELECT vec_id, {bnd} AS band, {expr} AS bucket FROM embeddings"
        )
    keys_sql = "\n      UNION ALL\n      ".join(band_selects)
    return f"""
    WITH keys AS (
      {keys_sql}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM keys a JOIN keys b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    s AS (
      SELECT c.vec_a, c.vec_b,
             CAST(round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                               CAST(eb.embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS cosine_e6
      FROM cand c
      JOIN embeddings ea ON ea.vec_id = c.vec_a
      JOIN embeddings eb ON eb.vec_id = c.vec_b)
    SELECT vec_a, vec_b, cosine_e6 FROM s WHERE cosine_e6 >= {thr_e6}
    """


def _lsh_knn_oracle_sql() -> str:
    """Oracle for the hyperplane-LSH KNN query: the plane matrix is
    deterministic (seed 7), so the corpus-side bucket assignment is
    recomputed IN SQL from embedded plane literals; the query-side
    buckets (8 queries) are embedded. Candidates = exact bucket match;
    exact cosine re-rank + (cosine desc, vec_id) top-k — the entire
    distributed path replayed by brute force."""
    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
        _normalize,
        hyperplanes,
    )

    num_planes, seed = 6, 7
    emb = pq.read_table(
        os.path.join(_oracle_sf_dir(), "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    emb = emb.filter(pc.less(emb["vec_id"], KNN_QUERIES))
    qids = emb["vec_id"].to_numpy()
    order = np.argsort(qids)
    qm = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)[order]
    dim = qm.shape[1]
    planes = hyperplanes(dim, num_planes, seed)
    qn = _normalize(qm)
    weights = (1 << np.arange(num_planes, dtype=np.int64)).astype(np.int64)
    q_buckets = ((qn @ planes.T) > 0.0).astype(np.int64) @ weights
    qb_rows = ", ".join(
        f"({int(q)}, {int(bkt)})" for q, bkt in zip(qids[order], q_buckets)
    )
    bucket_expr = " + ".join(
        f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"[{','.join(repr(float(x)) for x in planes[p])}]) > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(num_planes)
    )
    return f"""
    WITH vb AS (SELECT vec_id, embedding, {bucket_expr} AS bucket FROM embeddings),
    qb(query_id, bucket) AS (VALUES {qb_rows}),
    q AS (SELECT e.vec_id AS query_id, e.embedding, qb.bucket
          FROM embeddings e JOIN qb ON e.vec_id = qb.query_id),
    s AS (SELECT q.query_id, v.vec_id,
                 CAST(round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                   CAST(v.embedding AS DOUBLE[]))
                            * 1000000) AS BIGINT) AS cosine_e6
          FROM q JOIN vb v ON v.bucket = q.bucket)
    SELECT query_id, vec_id, cosine_e6 FROM s
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cosine_e6 DESC, vec_id) <= {KNN_K}
    """


def _sample_replace_oracle_sql() -> str:
    """Oracle for the deterministic with-replacement sampler: the same
    Poisson(fraction) breakpoints (identical float64 literals) applied
    to the same md5-derived uniform, each row repeated ``k`` times."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ops import (
        poisson_breakpoints,
    )

    fraction, seed = 1.5, 7
    bps = ", ".join(repr(b) for b in poisson_breakpoints(fraction, 16))
    return f"""
    WITH u AS (SELECT o_orderkey, o_totalprice,
                      ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':{seed}'), 1, 13))::UBIGINT
                        / 4503599627370496.0 AS u
               FROM orders),
    c AS (SELECT o_orderkey, o_totalprice,
                 len(list_filter([{bps}], b -> u >= b)) AS k
          FROM u)
    SELECT o_orderkey, o_totalprice
    FROM (SELECT o_orderkey, o_totalprice, unnest(range(k)) FROM c)
    """


def _lang_gate_oracle_sql() -> str:
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    return (
        f"SELECT lang, count(*) AS n_pages FROM read_parquet('{pages_path}') "
        "WHERE lang IN ('en', 'de') GROUP BY lang"
    )


def _prf_oracle_sql() -> str:
    """DuckDB twin of ``search_prf_expand``: the flagship BM25 replay
    (dedup -> doc_id -> tokenize -> stats -> scoring, same e6-quantized
    (score_e6 desc, doc_id) rank rule), then round-1 top-10 feedback
    docs, expansion-term selection by the INTEGER offer rule
    (r_t = feedback docs containing t, desc; total feedback tf desc;
    term asc; original query terms excluded), and a round-2 weighted
    BM25 (originals 1.0, expansion 0.5 — 0.5 is exact in binary)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
        reference_queries,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    q_rows = [
        f"({qid}, '{t}')" for qid, q in reference_queries() for t in tokenize_query(q)
    ]
    bm25 = (
        "ln(1 + (stats.n - {df}.df + 0.5) / ({df}.df + 0.5))"
        " * (tf.tf * (1.2 + 1))"
        " / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl))"
    )
    return f"""
    WITH pages AS (SELECT * FROM read_parquet('{pages_path}')),
    winners AS (
      SELECT url, text FROM (
        SELECT url, text,
               row_number() OVER (PARTITION BY html ORDER BY warc_ts, url) AS rn
        FROM pages) WHERE rn = 1),
    docs AS (
      SELECT CAST(('0x' || substr(md5(url), 1, 16))::UBIGINT
                  & 9223372036854775807::UBIGINT AS BIGINT) AS doc_id,
             text
      FROM winners),
    toks AS MATERIALIZED (SELECT doc_id, unnest({TOKS}) AS term FROM docs),
    tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT (SELECT count(*) FROM docs) AS n,
                     CAST((SELECT count(*) FROM toks) AS DOUBLE)
                       / (SELECT count(*) FROM docs) AS avgdl),
    q(qid, term) AS (VALUES {', '.join(q_rows)}),
    df AS (SELECT term, count(*) AS df FROM tf
           WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY term),
    s1 AS (SELECT q.qid, tf.doc_id, sum({bm25.format(df='df')}) AS score
           FROM q JOIN df USING (term) JOIN tf ON tf.term = q.term
           JOIN dl ON tf.doc_id = dl.doc_id, stats
           GROUP BY q.qid, tf.doc_id),
    r1 AS (SELECT qid, doc_id FROM (
             SELECT qid, doc_id,
                    CAST(round(score * 1000000) AS BIGINT) AS score_e6
             FROM s1)
           QUALIFY row_number() OVER (PARTITION BY qid
                                      ORDER BY score_e6 DESC, doc_id) <= 10),
    cand AS MATERIALIZED (SELECT r1.qid, tf.term, count(*) AS r_t, sum(tf.tf) AS ttf
             FROM r1 JOIN tf USING (doc_id)
             WHERE NOT EXISTS (SELECT 1 FROM q
                               WHERE q.qid = r1.qid AND q.term = tf.term)
             GROUP BY r1.qid, tf.term),
    exp AS (SELECT qid, term FROM cand
            QUALIFY row_number() OVER (PARTITION BY qid
                                       ORDER BY r_t DESC, ttf DESC, term) <= 3),
    allq AS (SELECT qid, term, 1.0 AS w FROM q
             UNION ALL SELECT qid, term, 0.5 AS w FROM exp),
    df2 AS (SELECT term, count(*) AS df FROM tf
            WHERE term IN (SELECT DISTINCT term FROM allq) GROUP BY term),
    s2 AS (SELECT allq.qid, tf.doc_id,
                  sum(allq.w * {bm25.format(df='df2')}) AS score
           FROM allq JOIN df2 USING (term) JOIN tf ON tf.term = allq.term
           JOIN dl ON tf.doc_id = dl.doc_id, stats
           GROUP BY allq.qid, tf.doc_id),
    e62 AS (SELECT qid, doc_id,
                   CAST(round(score * 1000000) AS BIGINT) AS score_e6
            FROM s2)
    SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, score_e6
    FROM e62
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 10
    """


def _phash_dups_oracle_sql() -> str:
    """Sketch-oracle for ``media_phash_dups`` (the MinHash/SimHash
    containment-oracle pattern): per-image pHashes computed by the pure
    function are embedded as VALUES and SQL re-derives every pair with
    popcount(xor) <= 3 — banding completeness is implied by pigeonhole
    (max_hamming 3 < 4 chunks), so the band plumbing needs no replay."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.media_codecs import (
        decode_bmp,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        phash64,
        synth_images_neardup,
    )

    t = synth_images_neardup(200)
    rows = ", ".join(
        f"({i}, {phash64(decode_bmp(p))})"
        for i, p in zip(t["media_id"].to_pylist(), t["payload"].to_pylist())
    )
    return f"""
    WITH ph(media_id, phash) AS (VALUES {rows})
    SELECT a.media_id AS media_a, b.media_id AS media_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
    FROM ph a JOIN ph b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 3
    """


def _image_stats_oracle_sql() -> str:
    """Oracle for ``media_image_stats``: the statistics of the
    PRE-ENCODE pixel arrays (the generator's ``_pixel_truth``) embed as
    VALUES via the same pure :func:`image_stats` kernel — the
    distributed stage must recover them by actually DECODING the BMP
    payloads (decode-inverts-encode, the media_features contract)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        image_stats,
        synth_images_neardup,
    )

    truth: list = []
    synth_images_neardup(200, _pixel_truth=truth)
    rows = []
    for i, px in enumerate(truth):
        st = image_stats(px)
        rows.append(
            "({}, true, {}, {}, {})".format(
                i, px.shape[1], px.shape[0], ", ".join(str(v) for v in st)
            )
        )
    return f"""
    SELECT CAST(media_id AS BIGINT) AS media_id, decoded,
           CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
           CAST(mean_r_e4 AS BIGINT) AS mean_r_e4,
           CAST(mean_g_e4 AS BIGINT) AS mean_g_e4,
           CAST(mean_b_e4 AS BIGINT) AS mean_b_e4,
           CAST(min_luma AS BIGINT) AS min_luma,
           CAST(max_luma AS BIGINT) AS max_luma,
           CAST(n_dark AS BIGINT) AS n_dark,
           CAST(n_bright AS BIGINT) AS n_bright
    FROM (VALUES {', '.join(rows)})
      AS t(media_id, decoded, width, height, mean_r_e4, mean_g_e4,
           mean_b_e4, min_luma, max_luma, n_dark, n_bright)
    """


def _scene_cuts_oracle_sql() -> str:
    """Oracle for ``media_scene_cuts``: per-clip (n_frames, n_cuts)
    from the pure :func:`scene_cut_count` replay over the generator's
    payloads, embedded as VALUES — the distributed stage must recover
    them by actually decoding every frame."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        scene_cut_count,
        synth_video_scenes,
    )

    tbl = synth_video_scenes(120)
    rows = []
    for i, payload in enumerate(tbl["payload"].to_pylist()):
        n, cuts = scene_cut_count(payload)
        rows.append(f"({i}, true, {n}, {cuts})")
    return f"""
    SELECT CAST(media_id AS BIGINT) AS media_id, decoded,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(n_cuts AS BIGINT) AS n_cuts
    FROM (VALUES {', '.join(rows)})
      AS t(media_id, decoded, n_frames, n_cuts)
    """


def _audio_segments_oracle_sql() -> str:
    """Oracle for ``media_audio_segments``: per-clip (n_windows,
    n_active, n_segments) from the pure :func:`audio_segment_count`
    replay, embedded as VALUES — the stage must recover them by
    actually decoding the PCM."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        audio_segment_count,
        synth_audio_segments,
    )

    tbl = synth_audio_segments(120)
    rows = []
    for i, payload in enumerate(tbl["payload"].to_pylist()):
        w, a, s = audio_segment_count(payload)
        rows.append(f"({i}, true, {w}, {a}, {s})")
    return f"""
    SELECT CAST(media_id AS BIGINT) AS media_id, decoded,
           CAST(n_windows AS BIGINT) AS n_windows,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(n_segments AS BIGINT) AS n_segments
    FROM (VALUES {', '.join(rows)})
      AS t(media_id, decoded, n_windows, n_active, n_segments)
    """


def _thumbs_oracle_sql(max_side: int = 32) -> str:
    """Oracle for ``media_thumbs``: the pure-function replay (decode ->
    ``thumb_dims`` -> ``resize_nearest`` -> encode) provides per-image
    payload size + sha1 as embedded ground truth, and SQL RE-DERIVES the
    aspect-fit dimension rule (exact floor arithmetic) from the source
    dims — so the distributed stage is checked against both the rule
    and the bit-level payload."""
    import hashlib

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.media_codecs import (
        decode_bmp,
        encode_bmp,
        resize_nearest,
        thumb_dims,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        synth_images_neardup,
    )

    t = synth_images_neardup(200)
    rows = []
    for i, p in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
        rgb = decode_bmp(p)
        h, w = rgb.shape[0], rgb.shape[1]
        tw, th = thumb_dims(w, h, max_side)
        tp = encode_bmp(resize_nearest(rgb, tw, th))
        rows.append(f"({i}, {w}, {h}, {len(tp)}, '{hashlib.sha1(tp).hexdigest()}')")
    return f"""
    WITH src(media_id, width, height, thumb_bytes, thumb_sha1)
      AS (VALUES {', '.join(rows)})
    SELECT media_id, width, height,
           CASE WHEN greatest(width, height) <= {max_side} THEN width
                ELSE greatest(1, (width * {max_side}) // greatest(width, height))
           END AS thumb_w,
           CASE WHEN greatest(width, height) <= {max_side} THEN height
                ELSE greatest(1, (height * {max_side}) // greatest(width, height))
           END AS thumb_h,
           thumb_bytes, thumb_sha1
    FROM src
    """


def _audio_resample_oracle_sql(factor: int = 2) -> str:
    """Oracle for ``media_audio_resample``: per-clip source length is
    embedded, SQL re-derives the decimation arithmetic (output samples
    = ceil(n / factor), output rate = rate // factor), and the payload
    is pinned by the pure-function replay's size + sha1."""
    import hashlib

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.media_codecs import (
        decode_wav,
        encode_wav,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        synth_audio_neardup,
    )

    t = synth_audio_neardup(120)
    rows = []
    for i, p in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
        samples, rate = decode_wav(p)
        import numpy as _np

        ds = _np.ascontiguousarray(samples[::factor])
        enc = encode_wav(ds, rate // factor)
        rows.append(
            f"({i}, {samples.size}, {rate}, {len(enc)}, "
            f"'{hashlib.sha1(enc).hexdigest()}')"
        )
    return f"""
    WITH src(media_id, n_samples, rate, out_bytes, out_sha1)
      AS (VALUES {', '.join(rows)})
    SELECT media_id, n_samples,
           (n_samples + {factor} - 1) // {factor} AS out_samples,
           rate // {factor} AS out_rate,
           out_bytes, out_sha1
    FROM src
    """


def _vhash_dups_oracle_sql() -> str:
    """Sketch-oracle for ``media_video_dups``: per-clip XOR-of-frame-
    pHash fingerprints computed by the pure function are embedded as
    VALUES and SQL re-derives every pair with popcount(xor) <= 4 —
    banding completeness is implied by pigeonhole (max_hamming 4 < 8
    chunks), so the band plumbing needs no replay."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        synth_video_neardup,
        vhash64,
    )

    t = synth_video_neardup(120)
    rows = ", ".join(
        f"({i}, {vhash64(p)})"
        for i, p in zip(t["media_id"].to_pylist(), t["payload"].to_pylist())
    )
    return f"""
    WITH vh(media_id, vhash) AS (VALUES {rows})
    SELECT a.media_id AS media_a, b.media_id AS media_b,
           CAST(bit_count(xor(a.vhash, b.vhash)) AS BIGINT) AS hamming
    FROM vh a JOIN vh b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.vhash, b.vhash)) <= 4
    """


def _wildcard_oracle_sql() -> str:
    """DuckDB twin of ``search_wildcard``: per prefix, expand to the
    top-8 cf vocabulary terms (cf desc, term), score the expansion as
    a weight-1.0 BM25 sum (exact N/df/dl/avgdl over dedup winners),
    top-10 per qid by (score_e6 desc, doc_id)."""
    p_rows = ", ".join(
        f"({i}, '{p}')" for i, p in enumerate(WILDCARD_PREFIXES)
    )
    bm25 = (
        "ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))"
        " * (tf.tf * (1.2 + 1))"
        " / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl))"
    )
    return f"""{_docs_cte()},
    toks AS MATERIALIZED (SELECT doc_id, unnest({TOKS}) AS term FROM docs),
    tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT (SELECT count(*) FROM docs) AS n,
                     CAST((SELECT count(*) FROM toks) AS DOUBLE)
                       / (SELECT count(*) FROM docs) AS avgdl),
    cf AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    p(qid, prefix) AS (VALUES {p_rows}),
    exp AS (SELECT qid, prefix, term FROM (
              SELECT p.qid, p.prefix, cf.term,
                     row_number() OVER (PARTITION BY p.qid
                       ORDER BY cf.c DESC, cf.term) AS rn
              FROM p JOIN cf ON starts_with(cf.term, p.prefix)) WHERE rn <= 8),
    df AS (SELECT term, count(*) AS df FROM tf
           WHERE term IN (SELECT DISTINCT term FROM exp) GROUP BY term),
    s AS (SELECT exp.qid, exp.prefix, tf.doc_id, sum({bm25}) AS score
          FROM exp JOIN df USING (term) JOIN tf ON tf.term = exp.term
          JOIN dl ON tf.doc_id = dl.doc_id, stats
          GROUP BY exp.qid, exp.prefix, tf.doc_id),
    e6 AS (SELECT qid, prefix, doc_id,
                  CAST(round(score * 1000000) AS BIGINT) AS score_e6
           FROM s)
    SELECT qid, prefix,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, score_e6
    FROM e6
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 10
    """


def _stemmed_search_oracle_sql() -> str:
    """DuckDB twin of ``search_bm25_stemmed``: the (term, stem) map for
    the INDEX vocabulary (dedup-winner tokenization — identical to the
    built index's term_stats, a parity the flagship/compact oracles
    already pin) and each query term's stem are computed by the same
    pure function and embedded as VALUES; SQL replays the per-stem
    top-8-by-cf expansion and the weight-1.0 BM25 scoring."""
    import duckdb

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.stem import (
        porter_stem,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
        reference_queries,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    vocab = [
        r[0]
        for r in duckdb.sql(
            f"""
        WITH pages AS (SELECT * FROM read_parquet('{pages_path}')),
        winners AS (
          SELECT url, text FROM (
            SELECT url, text,
                   row_number() OVER (PARTITION BY html ORDER BY warc_ts, url) AS rn
            FROM pages) WHERE rn = 1)
        SELECT DISTINCT unnest({TOKS}) AS term FROM winners ORDER BY term
        """
        ).fetchall()
    ]

    def esc(s: str) -> str:
        return s.replace("'", "''")

    sm_rows = ", ".join(f"('{esc(v)}', '{esc(porter_stem(v))}')" for v in vocab)
    q_rows = ", ".join(
        f"({qid}, '{esc(porter_stem(t))}')"
        for qid, q in reference_queries()
        for t in sorted(set(tokenize_query(q)))
    )
    bm25 = (
        "ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))"
        " * (tf.tf * (1.2 + 1))"
        " / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl))"
    )
    return f"""{_docs_cte()},
    toks AS MATERIALIZED (SELECT doc_id, unnest({TOKS}) AS term FROM docs),
    tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT (SELECT count(*) FROM docs) AS n,
                     CAST((SELECT count(*) FROM toks) AS DOUBLE)
                       / (SELECT count(*) FROM docs) AS avgdl),
    cf AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    sm(term, stem) AS (VALUES {sm_rows}),
    qraw(qid, qstem) AS (VALUES {q_rows}),
    q AS (SELECT DISTINCT qid, qstem FROM qraw),
    exp AS (SELECT DISTINCT qid, term FROM (
              SELECT q.qid, sm.term,
                     row_number() OVER (PARTITION BY q.qid, q.qstem
                       ORDER BY cf.c DESC, sm.term) AS rn
              FROM q JOIN sm ON sm.stem = q.qstem
                   JOIN cf ON cf.term = sm.term) WHERE rn <= 8),
    df AS (SELECT term, count(*) AS df FROM tf
           WHERE term IN (SELECT DISTINCT term FROM exp) GROUP BY term),
    s AS (SELECT exp.qid, tf.doc_id, sum({bm25}) AS score
          FROM exp JOIN df USING (term) JOIN tf ON tf.term = exp.term
          JOIN dl ON tf.doc_id = dl.doc_id, stats
          GROUP BY exp.qid, tf.doc_id),
    e6 AS (SELECT qid, doc_id,
                  CAST(round(score * 1000000) AS BIGINT) AS score_e6
           FROM s)
    SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, score_e6
    FROM e6
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 10
    """


def _fuzzy_search_oracle_sql() -> str:
    """DuckDB twin of ``search_fuzzy``: each distinct query term's
    <= 8-term unit-edit-distance expansion over the dedup-winner
    vocabulary is replayed with ``levenshtein`` + a (cf desc, term)
    window rank (the engine ranks candidates the same way off
    term_stats, whose parity with the winner tokenization the
    flagship/compact oracles pin), then the deduped expansion scores
    as weight-1.0 BM25 — the ``_stemmed_search_oracle_sql`` machinery
    with the stem map swapped for the edit-distance join."""

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_query,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        reference_queries,
    )

    def esc(s: str) -> str:
        return s.replace("'", "''")

    q_rows = ", ".join(
        f"({qid}, '{esc(t)}')"
        for qid, q in reference_queries()
        for t in sorted(set(tokenize_query(q)))
    )
    bm25 = (
        "ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))"
        " * (tf.tf * (1.2 + 1))"
        " / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl))"
    )
    return f"""{_docs_cte()},
    toks AS MATERIALIZED (SELECT doc_id, unnest({TOKS}) AS term FROM docs),
    tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT (SELECT count(*) FROM docs) AS n,
                     CAST((SELECT count(*) FROM toks) AS DOUBLE)
                       / (SELECT count(*) FROM docs) AS avgdl),
    cf AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    qraw(qid, qterm) AS (VALUES {q_rows}),
    q AS (SELECT DISTINCT qid, qterm FROM qraw),
    exp AS (SELECT DISTINCT qid, term FROM (
              SELECT q.qid, cf.term,
                     row_number() OVER (PARTITION BY q.qid, q.qterm
                       ORDER BY cf.c DESC, cf.term) AS rn
              FROM q JOIN cf ON levenshtein(q.qterm, cf.term) <= 1)
            WHERE rn <= 8),
    df AS (SELECT term, count(*) AS df FROM tf
           WHERE term IN (SELECT DISTINCT term FROM exp) GROUP BY term),
    s AS (SELECT exp.qid, tf.doc_id, sum({bm25}) AS score
          FROM exp JOIN df USING (term) JOIN tf ON tf.term = exp.term
          JOIN dl ON tf.doc_id = dl.doc_id, stats
          GROUP BY exp.qid, tf.doc_id),
    e6 AS (SELECT qid, doc_id,
                  CAST(round(score * 1000000) AS BIGINT) AS score_e6
           FROM s)
    SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, score_e6
    FROM e6
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 10
    """


def _robots_gate_oracle_sql() -> str:
    """SQL twin of ``crawl_robots_gate``: per-host rule literals from
    the SAME pure ``synth_robots``/``parse_robots`` chain are embedded
    as VALUES; the decision — first path-prefix match by rule order,
    exact-agent section before ``*``, default allow
    (``Crawler.java:250-307``) — is replayed per url with window
    ranks, then aggregated per host."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.urls import (
        host_of,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        robots_rule_rows,
    )

    import pyarrow.parquet as _pq

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    hosts = sorted(
        {host_of(u) for u in _pq.read_table(pages_path, columns=["url"])["url"].to_pylist()}
    )
    rows = ", ".join(
        f"('{h}', '{sec}', {o}, '{fl}', '{pre}')"
        for h, sec, o, fl, pre in robots_rule_rows(hosts)
    )
    return f"""
    WITH rules(host, section, ord, flag, prefix) AS (VALUES {rows}),
    p AS (SELECT url,
                 lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/:?#]+)', 1)) AS host,
                 regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*', '') AS path
          FROM read_parquet('{pages_path}')),
    m AS (SELECT p.url, r.section, r.flag,
                 row_number() OVER (PARTITION BY p.url, r.section ORDER BY r.ord) AS rn
          FROM p JOIN rules r ON r.host = p.host AND starts_with(p.path, r.prefix)),
    first_m AS (SELECT url, section, flag FROM m WHERE rn = 1),
    dec AS (SELECT p.url, p.host,
                   COALESCE(MAX(CASE WHEN f.section = 'agent' THEN f.flag END),
                            MAX(CASE WHEN f.section = '*' THEN f.flag END),
                            'allow') AS verdict
            FROM p LEFT JOIN first_m f ON f.url = p.url
            GROUP BY p.url, p.host)
    SELECT host,
           CAST(sum(CASE WHEN verdict = 'allow' THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
           CAST(sum(CASE WHEN verdict = 'allow' THEN 0 ELSE 1 END) AS BIGINT) AS n_denied
    FROM dec GROUP BY host
    """


def _pages_path_for_oracle() -> str:
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    return pages_for_sf_dir(_oracle_sf_dir())


def _didyoumean_oracle_sql() -> str:
    """DuckDB twin of ``search_didyoumean``: re-derives the SAME
    deterministic misspellings from the corpus vocabulary (top-5 cf
    terms of length >= 5, drop the 2nd char), corrects by
    ``levenshtein`` + (dist, term) rank over the full vocabulary, then
    scores the corrected single-term query with the flagship BM25
    expression (k1=1.2, b=0.75, exact N/df/dl/avgdl over dedup
    winners) — top-10 per qid by (score_e6 desc, doc_id)."""
    return f"""{_docs_cte()},
    toks AS MATERIALIZED (SELECT doc_id, unnest({TOKS}) AS term FROM docs),
    tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT (SELECT count(*) FROM docs) AS n,
                     CAST((SELECT count(*) FROM toks) AS DOUBLE)
                       / (SELECT count(*) FROM docs) AS avgdl),
    cf AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    qs AS (SELECT CAST(row_number() OVER (ORDER BY c DESC, term) - 1 AS BIGINT) AS qid,
                  substr(term, 1, 1) || substr(term, 3) AS q
           FROM (SELECT term, c FROM cf WHERE length(term) >= 5
                 ORDER BY c DESC, term LIMIT 5)),
    corr AS (SELECT qid, q, term AS corrected FROM (
               SELECT qs.qid, qs.q, cf.term,
                      row_number() OVER (PARTITION BY qs.qid
                        ORDER BY levenshtein(qs.q, cf.term), cf.term) AS rn
               FROM qs CROSS JOIN cf) WHERE rn = 1),
    df AS (SELECT term, count(*) AS df FROM tf
           WHERE term IN (SELECT corrected FROM corr) GROUP BY term),
    scores AS (
      SELECT corr.qid, corr.q, corr.corrected, tf.doc_id,
             ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * (1.2 + 1))
               / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl)) AS score
      FROM corr JOIN df ON df.term = corr.corrected
           JOIN tf ON tf.term = corr.corrected
           JOIN dl ON tf.doc_id = dl.doc_id, stats),
    e6 AS (SELECT qid, q, corrected, doc_id,
                  CAST(round(score * 1000000) AS BIGINT) AS score_e6
           FROM scores)
    SELECT qid, q, corrected,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) - 1
                AS BIGINT) AS "rank",
           doc_id, score_e6
    FROM e6
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) <= 10
    """


def _afp_dups_oracle_sql() -> str:
    """Sketch-oracle for ``media_audio_dups`` (the ``media_phash_dups``
    pattern on the audio fingerprint): per-clip afp64 values computed
    by the pure function are embedded as VALUES and SQL re-derives
    every pair with popcount(xor) <= 3 — banding completeness is
    implied by pigeonhole (max_hamming 3 < 4 chunks)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.media_codecs import (
        decode_wav,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.multimodal import (
        afp64,
        synth_audio_neardup,
    )

    t = synth_audio_neardup(200)
    rows = ", ".join(
        f"({i}, {afp64(decode_wav(p)[0])})"
        for i, p in zip(t["media_id"].to_pylist(), t["payload"].to_pylist())
    )
    return f"""
    WITH fp(media_id, afp) AS (VALUES {rows})
    SELECT a.media_id AS media_a, b.media_id AS media_b,
           CAST(bit_count(xor(a.afp, b.afp)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.afp, b.afp)) <= 3
    """


def _kmeans_cte_parts(
    k: int, iters: int, v_cte: str | None = None
) -> tuple[list, "object"]:
    """The shared unrolled-CTE k-means replay (see
    :func:`_kmeans_oracle_sql`): returns the WITH-clause parts list and
    the dist-expression builder; ``c{iters}`` is the final centroid
    CTE. Shared by the kmeans, semantic-dedup, and topic-cluster
    oracles. ``v_cte`` overrides the default micro-quantized
    ``v(vec_id, e)`` source (must be a full ``WITH``-leading CTE
    string ending at the v definition)."""
    hexpr = (
        "CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 16))::UBIGINT"
        " & 9223372036854775807::UBIGINT AS BIGINT)"
    )

    def dist(cent: str) -> str:
        return (
            f"list_sum(list_transform(list_zip(v.e, {cent}),"
            " s -> (s[1] - s[2]) * (s[1] - s[2])))"
        )

    if v_cte is None:
        v_cte = (
            "WITH v AS (SELECT vec_id, list_transform(embedding,"
            " x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS e"
            " FROM embeddings)"
        )
    parts = [
        v_cte + ",\n"
        f"c0 AS (SELECT row_number() OVER (ORDER BY {hexpr}, vec_id) - 1 AS c, e"
        f" FROM v QUALIFY row_number() OVER (ORDER BY {hexpr}, vec_id) <= {k})"
    ]
    for i in range(iters):
        parts.append(
            f"a{i} AS (SELECT vec_id, e, c FROM (\n"
            f"  SELECT v.vec_id, v.e, c{i}.c,\n"
            f"         row_number() OVER (PARTITION BY v.vec_id"
            f" ORDER BY {dist(f'c{i}.e')}, c{i}.c) AS rn\n"
            f"  FROM v CROSS JOIN c{i}) WHERE rn = 1)"
        )
        parts.append(
            f"s{i} AS (SELECT c, d, sum(x) AS sx, count(*) AS n FROM"
            f" (SELECT c, unnest(e) AS x, generate_subscripts(e, 1) AS d FROM a{i})"
            " GROUP BY c, d)"
        )
        parts.append(
            f"c{i + 1} AS (SELECT cc.c, COALESCE(nl.e, cc.e) AS e FROM c{i} cc"
            " LEFT JOIN (SELECT c,"
            " list(CAST((sx - ((sx % n) + n) % n) // n AS BIGINT) ORDER BY d) AS e"
            f" FROM s{i} GROUP BY c) nl ON cc.c = nl.c)"
        )
    return parts, dist


def _kmeans_oracle_sql(k: int = 8, iters: int = 3) -> str:
    """Full SQL replay of ``stages/ann.py:kmeans_assign`` — the
    pagerank-style unrolled-CTE iteration: micro-quantize (the
    floor(x*1e6+0.5) rule), seed with the k smallest
    (md5-prefix hash64, vec_id), then ``iters`` exact-integer Lloyd
    steps (int64 squared distances, (dist, c) argmin tie-break, FLOOR
    integer-division centroid update via (sx - ((sx%n)+n)%n) // n,
    empty clusters keep their centroid)."""
    parts, dist = _kmeans_cte_parts(k, iters)
    final = (
        "SELECT vec_id, c AS cluster, dist FROM (\n"
        f"  SELECT v.vec_id, c{iters}.c,"
        f" CAST({dist(f'c{iters}.e')} AS BIGINT) AS dist,\n"
        f"         row_number() OVER (PARTITION BY v.vec_id"
        f" ORDER BY {dist(f'c{iters}.e')}, c{iters}.c) AS rn\n"
        f"  FROM v CROSS JOIN c{iters}) t WHERE rn = 1"
    )
    return ",\n".join(parts) + "\n" + final


def _topic_cluster_oracle_sql(k: int = 4, iters: int = 2, dim: int = 8) -> str:
    """Oracle for ``text_cluster_topics``: re-derives the hashed
    token-count features in SQL (md5-prefix hash64 per DISTINCT term,
    mod ``dim``, occurrence counts densified over all docs x dims,
    micros = c*1e6 — exactly the engine's quantization), then chains
    the shared unrolled-CTE k-means replay."""
    hterm = (
        "CAST(('0x' || substr(md5(term), 1, 16))::UBIGINT"
        " & 9223372036854775807::UBIGINT AS BIGINT)"
    )
    v_cte = f"""WITH t0 AS (SELECT doc_id, {TOKS} AS l FROM documents),
    flat AS (SELECT doc_id, unnest(l) AS term FROM t0),
    hb AS (SELECT doc_id, {hterm} % {dim} AS d FROM flat),
    cnt AS (SELECT doc_id, d, CAST(count(*) AS BIGINT) AS c
            FROM hb GROUP BY doc_id, d),
    dims AS (SELECT unnest(range(0, {dim})) AS d),
    docs0 AS (SELECT DISTINCT doc_id FROM t0),
    dense AS (SELECT docs0.doc_id, dims.d, COALESCE(cnt.c, 0) AS c
              FROM docs0 CROSS JOIN dims
              LEFT JOIN cnt ON cnt.doc_id = docs0.doc_id AND cnt.d = dims.d),
    v AS (SELECT doc_id AS vec_id, list(c * 1000000 ORDER BY d) AS e
          FROM dense GROUP BY doc_id)"""
    parts, dist = _kmeans_cte_parts(k, iters, v_cte=v_cte)
    final = (
        "SELECT vec_id AS doc_id, c AS cluster, dist FROM (\n"
        f"  SELECT v.vec_id, c{iters}.c,"
        f" CAST({dist(f'c{iters}.e')} AS BIGINT) AS dist,\n"
        f"         row_number() OVER (PARTITION BY v.vec_id"
        f" ORDER BY {dist(f'c{iters}.e')}, c{iters}.c) AS rn\n"
        f"  FROM v CROSS JOIN c{iters}) t WHERE rn = 1"
    )
    return ",\n".join(parts) + "\n" + final


def _semantic_dedup_oracle_sql(
    k: int = 8, iters: int = 3, threshold: float = 0.92
) -> str:
    """Oracle for ``dedup_semantic``: the unrolled-CTE k-means replay
    (shared with ``knn_kmeans_assign``) assigns every vector, then a
    within-cluster self-join finds, per vector, the smallest EARLIER
    cluster-mate with cosine_e6 >= threshold — the keep-first SemDeDup
    contract of ``stages/ann.py:semantic_dedup``."""
    thr_e6 = int(round(threshold * 1e6))
    parts, dist = _kmeans_cte_parts(k, iters)
    parts.append(
        "asg AS (SELECT vec_id, c AS cluster FROM (\n"
        f"  SELECT v.vec_id, c{iters}.c,\n"
        f"         row_number() OVER (PARTITION BY v.vec_id"
        f" ORDER BY {dist(f'c{iters}.e')}, c{iters}.c) AS rn\n"
        f"  FROM v CROSS JOIN c{iters}) t WHERE rn = 1)"
    )
    parts.append(
        "d AS (SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of\n"
        "  FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id\n"
        "  JOIN embeddings ea ON ea.vec_id = a.vec_id\n"
        "  JOIN embeddings eb ON eb.vec_id = b.vec_id\n"
        "  WHERE CAST(round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),\n"
        f"        CAST(eb.embedding AS DOUBLE[])) * 1000000) AS BIGINT) >= {thr_e6}\n"
        "  GROUP BY b.vec_id)"
    )
    final = (
        "SELECT asg.vec_id, asg.cluster,\n"
        "       CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup,\n"
        "       d.dup_of AS dup_of\n"
        "FROM asg LEFT JOIN d ON asg.vec_id = d.vec_id"
    )
    return ",\n".join(parts) + "\n" + final


def _ivf_knn_oracle_sql() -> str:
    """Oracle for the IVF KNN query: the codebook is deterministic
    (seeded k-means on the vec_id %% 7 sample), so the NORMALIZED
    centroids are embedded as literals and the SQL re-derives the whole
    answer by brute force — nearest-centroid assignment per vector
    (cosine desc, centroid-index tie-break, matching numpy argmax),
    candidate filtering to each query's probe lists, exact cosine
    re-rank, (cosine desc, vec_id) top-k."""
    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
        _normalize,
        kmeans_centroids,
    )

    k, nlist, nprobe, sample_mod, seed = KNN_K, 32, 6, 7, 11
    emb = pq.read_table(
        os.path.join(_oracle_sf_dir(), "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = emb["vec_id"].to_numpy()
    m = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    cap = 256 * nlist
    sample = m[ids % sample_mod == 0][:cap]
    if sample.shape[0] < nlist:
        sample = m[:cap]
    centroids = kmeans_centroids(sample, nlist, seed=seed)

    qmask = ids < KNN_QUERIES
    qids = ids[qmask]
    order = np.argsort(qids)
    qn = _normalize(m[qmask][order])
    probe = (qn @ centroids.T).argsort(axis=1)[:, ::-1][:, : min(nprobe, centroids.shape[0])]
    probe_rows = ", ".join(
        f"({int(q)}, [{','.join(str(int(c)) for c in probe[i])}])"
        for i, q in enumerate(qids[order])
    )
    cent_rows = ", ".join(
        f"({ci}, [{','.join(repr(float(x)) for x in centroids[ci])}])"
        for ci in range(centroids.shape[0])
    )
    return f"""
    WITH cents(cidx, c) AS (VALUES {cent_rows}),
    a AS (SELECT vec_id, embedding,
                 (SELECT cidx FROM cents
                  ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c) DESC, cidx
                  LIMIT 1) AS ivf_list
          FROM embeddings e),
    probe(query_id, lists) AS (VALUES {probe_rows}),
    q AS (SELECT e.vec_id AS query_id, e.embedding, p.lists
          FROM embeddings e JOIN probe p ON e.vec_id = p.query_id),
    s AS (SELECT q.query_id, a.vec_id,
                 CAST(round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                   CAST(a.embedding AS DOUBLE[]))
                            * 1000000) AS BIGINT) AS cosine_e6
          FROM q JOIN a ON list_contains(q.lists, a.ivf_list))
    SELECT query_id, vec_id, cosine_e6 FROM s
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cosine_e6 DESC, vec_id) <= {k}
    """


def _pq_oracle_sql(
    m: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    rerank: int = 4,
    train_max_id: int = 4096,
) -> str:
    """DuckDB twin of ``knn_pq_topk``: the codebooks are re-trained by
    the same pure function (``stages/ann.train_pq_codebooks``) on the
    same id-gated, id-sorted, micro-quantized sample and embedded as
    VALUES; SQL then replays code assignment (first-min argmin — the
    (d, cidx) window order), the ADC sum, the global ADC top-(k*rerank)
    shortlist, and the exact-L2 re-rank bit-for-bit in int64."""
    import pyarrow.parquet as pq_

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
        train_pq_codebooks,
    )

    t = pq_.read_table(
        os.path.join(_oracle_sf_dir(), "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = t["vec_id"].to_numpy()
    keep = np.flatnonzero(ids < train_max_id)
    keep = keep[np.argsort(ids[keep], kind="stable")]
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)[keep]
    x = np.floor(mat * 1e6 + 0.5).astype(np.int64)
    cbs = train_pq_codebooks(x, m=m, k_codes=k_codes, iters=iters)
    sub = x.shape[1] // m
    rows = ", ".join(
        f"({j}, {c}, [{','.join(str(int(v)) for v in cbs[j, c])}])"
        for j in range(m)
        for c in range(k_codes)
    )
    return f"""
    WITH cb(sub, cidx, c) AS (VALUES {rows}),
    e AS (SELECT vec_id,
                 list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS v
          FROM embeddings),
    sv AS MATERIALIZED (SELECT vec_id, s.sub,
                  list_slice(v, s.sub * {sub} + 1, (s.sub + 1) * {sub}) AS x
           FROM e, (SELECT unnest(range({m})) AS sub) s),
    dists AS MATERIALIZED (SELECT sv.vec_id, sv.sub, cb.cidx,
                  list_sum(list_transform(range(1, {sub} + 1),
                           i -> (sv.x[i] - cb.c[i]) * (sv.x[i] - cb.c[i]))) AS d
           FROM sv JOIN cb ON cb.sub = sv.sub),
    codes AS (SELECT vec_id, sub, cidx AS code FROM dists
              QUALIFY row_number() OVER (PARTITION BY vec_id, sub
                                         ORDER BY d, cidx) = 1),
    dt AS (SELECT vec_id AS query_id, sub, cidx, d FROM dists
           WHERE vec_id < {KNN_QUERIES}),
    s AS (SELECT dt.query_id, codes.vec_id, sum(dt.d) AS adc
          FROM codes JOIN dt ON dt.sub = codes.sub AND dt.cidx = codes.code
          GROUP BY dt.query_id, codes.vec_id),
    short AS (SELECT query_id, vec_id, CAST(adc AS BIGINT) AS adc FROM s
              QUALIFY row_number() OVER (PARTITION BY query_id
                                         ORDER BY adc, vec_id) <= {KNN_K * rerank}),
    ex AS (SELECT short.query_id, short.vec_id, short.adc,
                  list_sum(list_transform(range(1, {m * sub} + 1),
                           i -> (qe.v[i] - de.v[i]) * (qe.v[i] - de.v[i]))) AS dist
           FROM short JOIN e qe ON qe.vec_id = short.query_id
                      JOIN e de ON de.vec_id = short.vec_id)
    SELECT query_id, vec_id, adc, CAST(dist AS BIGINT) AS dist FROM ex
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) <= {KNN_K}
    """


def _ivfpq_oracle_sql(
    nlist: int = 8,
    nprobe: int = 3,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    rerank: int = 4,
    train_max_id: int = 4096,
) -> str:
    """DuckDB twin of ``knn_ivfpq_topk``: coarse centroids + residual
    PQ codebooks are re-trained by ``stages/ann.train_ivfpq`` on the
    identical id-gated, id-sorted, micro-quantized sample and embedded
    as VALUES; SQL replays coarse assignment (first-min argmin),
    residual code assignment, per-query probe sets (nprobe nearest
    coarse by (d, cidx)), the probed-only ADC sum, the global ADC
    top-(k*rerank) shortlist, and the exact-L2 re-rank, all in int64."""
    import pyarrow.parquet as pq_

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
        train_ivfpq,
    )

    t = pq_.read_table(
        os.path.join(_oracle_sf_dir(), "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = t["vec_id"].to_numpy()
    keep = np.flatnonzero(ids < train_max_id)
    keep = keep[np.argsort(ids[keep], kind="stable")]
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)[keep]
    x = np.floor(mat * 1e6 + 0.5).astype(np.int64)
    coarse, cbs = train_ivfpq(x, nlist=nlist, m=m, k_codes=k_codes, iters=iters)
    d = x.shape[1]
    sub = d // m
    co_rows = ", ".join(
        f"({c}, [{','.join(str(int(v)) for v in coarse[c])}])"
        for c in range(coarse.shape[0])
    )
    cb_rows = ", ".join(
        f"({j}, {c}, [{','.join(str(int(v)) for v in cbs[j, c])}])"
        for j in range(m)
        for c in range(k_codes)
    )
    return f"""
    WITH co(cidx, c) AS (VALUES {co_rows}),
    cb(sub, cidx, c) AS (VALUES {cb_rows}),
    e AS (SELECT vec_id,
                 list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS v
          FROM embeddings),
    cd AS MATERIALIZED (SELECT e.vec_id, co.cidx,
                 list_sum(list_transform(range(1, {d} + 1),
                          i -> (e.v[i] - co.c[i]) * (e.v[i] - co.c[i]))) AS dc
          FROM e, co),
    ca AS (SELECT vec_id, cidx AS coarse FROM cd
           QUALIFY row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dc, cidx) = 1),
    rv AS MATERIALIZED (SELECT e.vec_id, ca.coarse,
                 list_transform(range(1, {d} + 1), i -> e.v[i] - co.c[i]) AS r
          FROM e JOIN ca USING (vec_id) JOIN co ON co.cidx = ca.coarse),
    rsv AS (SELECT vec_id, coarse, s.sub,
                   list_slice(r, s.sub * {sub} + 1, (s.sub + 1) * {sub}) AS x
            FROM rv, (SELECT unnest(range({m})) AS sub) s),
    rdist AS MATERIALIZED (SELECT rsv.vec_id, rsv.coarse, rsv.sub, cb.cidx,
                 list_sum(list_transform(range(1, {sub} + 1),
                          i -> (rsv.x[i] - cb.c[i]) * (rsv.x[i] - cb.c[i]))) AS dd
          FROM rsv JOIN cb ON cb.sub = rsv.sub),
    codes AS (SELECT vec_id, coarse, sub, cidx AS code FROM rdist
              QUALIFY row_number() OVER (PARTITION BY vec_id, sub
                                         ORDER BY dd, cidx) = 1),
    probes AS (SELECT vec_id AS query_id, cidx AS coarse FROM cd
               WHERE vec_id < {KNN_QUERIES}
               QUALIFY row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dc, cidx) <= {nprobe}),
    qrv AS (SELECT p.query_id, p.coarse, s.sub,
                   list_slice(list_transform(range(1, {d} + 1),
                                             i -> qe.v[i] - co.c[i]),
                              s.sub * {sub} + 1, (s.sub + 1) * {sub}) AS x
            FROM probes p JOIN e qe ON qe.vec_id = p.query_id
                 JOIN co ON co.cidx = p.coarse,
                 (SELECT unnest(range({m})) AS sub) s),
    dtq AS MATERIALIZED (SELECT qrv.query_id, qrv.coarse, qrv.sub, cb.cidx,
                 list_sum(list_transform(range(1, {sub} + 1),
                          i -> (qrv.x[i] - cb.c[i]) * (qrv.x[i] - cb.c[i]))) AS dd
          FROM qrv JOIN cb ON cb.sub = qrv.sub),
    s AS (SELECT dtq.query_id, codes.vec_id, sum(dtq.dd) AS adc
          FROM codes JOIN dtq ON dtq.coarse = codes.coarse
                             AND dtq.sub = codes.sub AND dtq.cidx = codes.code
          GROUP BY dtq.query_id, codes.vec_id),
    short AS (SELECT query_id, vec_id, CAST(adc AS BIGINT) AS adc FROM s
              QUALIFY row_number() OVER (PARTITION BY query_id
                                         ORDER BY adc, vec_id) <= {KNN_K * rerank}),
    ex AS (SELECT short.query_id, short.vec_id, short.adc,
                  list_sum(list_transform(range(1, {d} + 1),
                           i -> (qe.v[i] - de.v[i]) * (qe.v[i] - de.v[i]))) AS dist
           FROM short JOIN e qe ON qe.vec_id = short.query_id
                      JOIN e de ON de.vec_id = short.vec_id)
    SELECT query_id, vec_id, adc, CAST(dist AS BIGINT) AS dist FROM ex
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) <= {KNN_K}
    """


def _crawl_links_oracle_sql() -> str:
    """Oracle for the link-extraction pipeline over the synthetic pages
    corpus. Scope: the generator emits only absolute
    ``<a href="http://host/path">`` anchors, so normalization reduces
    to inserting the explicit :80 default port; the general scalar
    normalizer is golden-tested separately (tests/test_urls.py). What
    this row checks end-to-end is the distributed plumbing: per-page
    href extraction, normalization application and per-page dedup."""
    pages_path = None
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    return f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{pages_path}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages)
    SELECT DISTINCT src_url,
           regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS dst_url
    FROM hrefs
    """


def _reciprocal_links_oracle_sql() -> str:
    """DuckDB twin of ``crawl_reciprocal_links``: the hash-matched
    ``crawl_links`` edge replay (same anchor scope + ':80' dst
    normalization, applied to the SRC side too), folded to unordered
    pairs and kept when both directions occur."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    return f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{pages_path}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    edges AS (SELECT DISTINCT
                regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80') AS s,
                regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS d
              FROM hrefs),
    pairs AS (SELECT least(s, d) AS url_a, greatest(s, d) AS url_b,
                     CASE WHEN s < d THEN 1 ELSE 2 END AS dir
              FROM edges WHERE s <> d)
    SELECT url_a, url_b FROM pairs
    GROUP BY url_a, url_b HAVING count(DISTINCT dir) = 2
    """


def _cocitation_oracle_sql(min_common: int = 4) -> str:
    """DuckDB twin of ``crawl_cocitation``: the hash-matched edge
    replay (':80' canonicalization both sides), urls hashed to the
    engine's doc ids (md5-prefix hash64), then a src self-join counts
    how many distinct sources cite each (a < b) target pair."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    h = (
        "CAST(('0x' || substr(md5({u}), 1, 16))::UBIGINT"
        " & 9223372036854775807::UBIGINT AS BIGINT)"
    )
    h_src = h.format(u="regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80')")
    h_dst = h.format(u="regexp_replace(href, '^http://([^/]*)', 'http://\\1:80')")
    return f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{pages_path}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    edges AS (SELECT DISTINCT
                {h_src} AS s,
                {h_dst} AS d
              FROM hrefs)
    SELECT a.d AS doc_a, b.d AS doc_b, count(*) AS n_common_src
    FROM edges a JOIN edges b ON a.s = b.s AND a.d < b.d
    GROUP BY a.d, b.d HAVING count(*) >= {min_common}
    """


def _link_jaccard_oracle_sql(min_common: int = 4) -> str:
    """DuckDB twin of ``crawl_link_jaccard``: the co-citation replay
    plus per-target in-degrees over the same DISTINCT edge set; the
    Jaccard micros are one positive integer floor division
    (``//`` == floor on positive operands, matching numpy)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    h = (
        "CAST(('0x' || substr(md5({u}), 1, 16))::UBIGINT"
        " & 9223372036854775807::UBIGINT AS BIGINT)"
    )
    h_src = h.format(u="regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80')")
    h_dst = h.format(u="regexp_replace(href, '^http://([^/]*)', 'http://\\1:80')")
    return f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{pages_path}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    edges AS MATERIALIZED (SELECT DISTINCT
                {h_src} AS s,
                {h_dst} AS d
              FROM hrefs),
    cc AS (SELECT a.d AS doc_a, b.d AS doc_b, count(*) AS n_common_src
           FROM edges a JOIN edges b ON a.s = b.s AND a.d < b.d
           GROUP BY a.d, b.d HAVING count(*) >= {min_common}),
    indeg AS (SELECT d, count(*) AS deg FROM edges GROUP BY d)
    SELECT cc.doc_a, cc.doc_b, CAST(cc.n_common_src AS BIGINT) AS n_common_src,
           CAST((1000000 * cc.n_common_src)
                // (ia.deg + ib.deg - cc.n_common_src) AS BIGINT) AS jaccard_e6
    FROM cc JOIN indeg ia ON ia.d = cc.doc_a
            JOIN indeg ib ON ib.d = cc.doc_b
    """


def _host_graph_oracle_sql() -> str:
    """DuckDB twin of ``crawl_host_graph``: the hash-matched edge
    replay, hosts extracted with the oracle-standard host regex, one
    group-by over host pairs."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    return f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{pages_path}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    edges AS (SELECT DISTINCT
                regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80') AS s,
                regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS d
              FROM hrefs)
    SELECT lower(regexp_extract(s, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/:?#]+)', 1)) AS src_host,
           lower(regexp_extract(d, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/:?#]+)', 1)) AS dst_host,
           count(*) AS n_links
    FROM edges GROUP BY src_host, dst_host
    """


def _inlink_concentration_oracle_sql(min_inlinks: int = 5) -> str:
    """DuckDB twin of ``crawl_inlink_concentration``: the hash-matched
    distinct edge replay, per-(target, source-host) counts, then per
    target the total/host count/argmax host ((n desc, host) ties) and
    the exact integer share floor."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    return f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{pages_path}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    edges AS (SELECT DISTINCT
                regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80') AS s,
                regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS d
              FROM hrefs),
    c AS (SELECT d AS dst_url,
                 lower(regexp_extract(s, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/:?#]+)', 1)) AS src_host,
                 CAST(count(*) AS BIGINT) AS n
          FROM edges GROUP BY 1, 2),
    a AS (SELECT dst_url, sum(n) AS n_inlinks, count(*) AS n_hosts
          FROM c GROUP BY dst_url),
    t AS (SELECT dst_url, src_host, n,
                 row_number() OVER (PARTITION BY dst_url
                                    ORDER BY n DESC, src_host) AS rn
          FROM c)
    SELECT a.dst_url, CAST(a.n_inlinks AS BIGINT) AS n_inlinks,
           CAST(a.n_hosts AS BIGINT) AS n_hosts,
           t.src_host AS top_host,
           CAST((1000000 * t.n) // a.n_inlinks AS BIGINT) AS top_share_e6
    FROM a JOIN t ON t.dst_url = a.dst_url AND t.rn = 1
    WHERE a.n_inlinks >= {min_inlinks}
    """


def _bib_coupling_oracle_sql(min_common: int = 3) -> str:
    """DuckDB twin of ``crawl_bib_coupling``: the same hashed edge
    replay as ``crawl_cocitation``, self-joined on the TARGET side —
    source pairs sharing >= min_common common link targets."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    h = (
        "CAST(('0x' || substr(md5({u}), 1, 16))::UBIGINT"
        " & 9223372036854775807::UBIGINT AS BIGINT)"
    )
    h_src = h.format(u="regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80')")
    h_dst = h.format(u="regexp_replace(href, '^http://([^/]*)', 'http://\\1:80')")
    return f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{pages_path}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    edges AS (SELECT DISTINCT
                {h_src} AS s,
                {h_dst} AS d
              FROM hrefs)
    SELECT a.s AS doc_a, b.s AS doc_b, count(*) AS n_common_dst
    FROM edges a JOIN edges b ON a.d = b.d AND a.s < b.s
    GROUP BY a.s, b.s HAVING count(*) >= {min_common}
    """


def _orphans_oracle_sql() -> str:
    """DuckDB twin of ``crawl_orphans``: pages absent from the edge
    replay's src side (dangling) / dst side (orphans), with the same
    ':80' canonicalization on page urls."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    return f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{pages_path}')),
    canon AS (SELECT regexp_replace(url, '^http://([^/]*)', 'http://\\1:80')
                       AS curl, doc
              FROM pages),
    hrefs AS (SELECT curl AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM canon),
    edges AS (SELECT DISTINCT src_url,
                regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS dst_url
              FROM hrefs)
    SELECT 'no_outlinks' AS kind,
           CAST(count(*) FILTER (curl NOT IN (SELECT src_url FROM edges))
                AS BIGINT) AS n_pages
    FROM canon
    UNION ALL
    SELECT 'no_inlinks' AS kind,
           CAST(count(*) FILTER (curl NOT IN (SELECT dst_url FROM edges))
                AS BIGINT) AS n_pages
    FROM canon
    """


def _degree_dist_oracle_sql() -> str:
    """DuckDB twin of ``crawl_degree_dist``: degree histograms over the
    hash-matched crawl_links edge replay (per-page distinct targets,
    like the engine's per-page dedup)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    return f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{pages_path}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    edges AS (SELECT DISTINCT src_url,
                regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS dst_url
              FROM hrefs),
    outd AS (SELECT src_url, count(*) AS deg FROM edges GROUP BY src_url),
    ind AS (SELECT dst_url, count(*) AS deg FROM edges GROUP BY dst_url)
    SELECT 'out' AS direction, deg AS degree, count(*) AS n_pages
    FROM outd GROUP BY deg
    UNION ALL
    SELECT 'in' AS direction, deg AS degree, count(*) AS n_pages
    FROM ind GROUP BY deg
    """


def _anchor_terms_oracle_sql() -> str:
    """Oracle for ``crawl_anchor_terms``: same anchor-element scope as
    the hash-matched ``crawl_links`` replica (the generator emits only
    absolute double-quoted hrefs with tag-free inner text), plus the
    canonical tokenizer over the anchor text and a top-1-per-target
    window with the engine's (n desc, term) tie-break."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    toks_anchor = TOKS.replace("text", "anchor")
    return f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{pages_path}')),
    anchors AS (SELECT
        unnest(regexp_extract_all(doc, '<a href="([^"]*)">([^<]*)</a>', 1)) AS href,
        unnest(regexp_extract_all(doc, '<a href="([^"]*)">([^<]*)</a>', 2)) AS anchor
      FROM pages),
    terms AS (SELECT
        regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS dst_url,
        unnest({toks_anchor}) AS term
      FROM anchors),
    agg AS (SELECT dst_url, term, count(*) AS n FROM terms GROUP BY dst_url, term)
    SELECT dst_url, term AS top_term, n AS top_n FROM (
      SELECT dst_url, term, n,
             row_number() OVER (PARTITION BY dst_url ORDER BY n DESC, term) AS rn
      FROM agg) WHERE rn = 1
    """


def _dedup_losers_oracle_sql() -> str:
    """Oracle for ``dedup_exact_losers`` over the synthetic pages
    corpus: doc_id = md5-prefix hash64(url) (same convention as the
    flagship, replayed in SQL), canonical = min doc_id per identical
    extracted text."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    return f"""
    WITH docs AS (
      SELECT CAST(('0x' || substr(md5(url), 1, 16))::UBIGINT
                  & 9223372036854775807::UBIGINT AS BIGINT) AS doc_id,
             text
      FROM read_parquet('{pages_path}'))
    SELECT doc_id, canonical_doc_id FROM (
      SELECT doc_id,
             min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_doc_id
      FROM docs) WHERE doc_id != canonical_doc_id
    """


def _frontier_bfs_oracle_sql() -> str:
    """Oracle for ``crawl_frontier_bfs``: the edges CTE is the
    hash-matched ``crawl_links`` replica; the wave loop becomes a
    recursive CTE whose depth column is capped at max_depth=3, and the
    first-reach depth is ``min(depth)`` per url (seeds = the 3
    lexicographically smallest page urls, mirrored in the query)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    return f"""
    WITH RECURSIVE pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{pages_path}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    edges0 AS (SELECT DISTINCT
                      regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80') AS src_url,
                      regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS dst_url
               FROM hrefs),
    seeds AS (SELECT regexp_replace(url, '^http://([^/]*)', 'http://\\1:80') AS url
              FROM (SELECT url FROM pages ORDER BY url LIMIT 3)),
    bfs(url, depth) AS (
      SELECT url, 0 FROM seeds
      UNION
      SELECT e.dst_url, b.depth + 1
      FROM bfs b JOIN edges0 e ON e.src_url = b.url
      WHERE b.depth < 3
    )
    SELECT url, CAST(min(depth) AS BIGINT) AS depth FROM bfs GROUP BY url
    """


def _closeness_oracle_sql() -> str:
    """Oracle for ``crawl_closeness``: the ``crawl_links`` edge replica
    deduped, out-degrees per src, the top-CLOSENESS_SEEDS hubs by
    (out_deg desc, url), then one recursive BFS CTE carrying the seed
    column with the depth capped at CLOSENESS_H; harmonic_e6 is the
    same per-url 1e6 // min-depth integer floor sum."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    return f"""
    WITH RECURSIVE pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{pages_path}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    edges0 AS MATERIALIZED (SELECT DISTINCT
                      regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80') AS src_url,
                      regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS dst_url
               FROM hrefs),
    deg AS (SELECT src_url, count(*) AS out_deg FROM edges0 GROUP BY src_url),
    seeds AS (SELECT src_url AS seed, out_deg FROM deg
              ORDER BY out_deg DESC, src_url LIMIT {CLOSENESS_SEEDS}),
    bfs(seed, url, depth) AS (
      SELECT seed, seed, 0 FROM seeds
      UNION
      SELECT b.seed, e.dst_url, b.depth + 1
      FROM bfs b JOIN edges0 e ON e.src_url = b.url
      WHERE b.depth < {CLOSENESS_H}
    ),
    d AS (SELECT seed, url, min(depth) AS dist FROM bfs GROUP BY seed, url)
    SELECT s.seed, CAST(s.out_deg AS BIGINT) AS out_deg,
           CAST(sum(CASE WHEN d.dist > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_reached,
           CAST(sum(CASE WHEN d.dist > 0 THEN 1000000 // d.dist ELSE 0 END)
                AS BIGINT) AS harmonic_e6
    FROM seeds s JOIN d ON d.seed = s.seed
    GROUP BY s.seed, s.out_deg
    """


def _bowtie_oracle_sql() -> str:
    """Oracle for ``crawl_bowtie``: the deduped edge replica, the
    (out_deg desc, url) pivot, one forward and one backward recursive
    BFS CTE capped at BOWTIE_H, then the four exact set-algebra counts
    (core = F AND B; in/out by difference; other by complement)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    return f"""
    WITH RECURSIVE pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{pages_path}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    edges0 AS MATERIALIZED (SELECT DISTINCT
                      regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80') AS src_url,
                      regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS dst_url
               FROM hrefs),
    deg AS (SELECT src_url, count(*) AS d FROM edges0 GROUP BY src_url),
    piv AS (SELECT src_url AS p FROM deg ORDER BY d DESC, src_url LIMIT 1),
    fwd(url, depth) AS (
      SELECT p, 0 FROM piv
      UNION
      SELECT e.dst_url, f.depth + 1 FROM fwd f
      JOIN edges0 e ON e.src_url = f.url WHERE f.depth < {BOWTIE_H}),
    bwd(url, depth) AS (
      SELECT p, 0 FROM piv
      UNION
      SELECT e.src_url, b.depth + 1 FROM bwd b
      JOIN edges0 e ON e.dst_url = b.url WHERE b.depth < {BOWTIE_H}),
    f AS (SELECT DISTINCT url FROM fwd),
    b AS (SELECT DISTINCT url FROM bwd),
    core AS (SELECT f.url FROM f JOIN b USING (url)),
    nodes AS (SELECT DISTINCT url FROM (
        SELECT src_url AS url FROM edges0
        UNION ALL SELECT dst_url FROM edges0))
    SELECT (SELECT p FROM piv) AS pivot,
           (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM core) AS n_core,
           (SELECT CAST(count(*) AS BIGINT) FROM b)
             - (SELECT count(*) FROM core) AS n_in,
           (SELECT CAST(count(*) AS BIGINT) FROM f)
             - (SELECT count(*) FROM core) AS n_out,
           (SELECT CAST(count(*) AS BIGINT) FROM nodes)
             - ((SELECT count(*) FROM f) + (SELECT count(*) FROM b)
                - (SELECT count(*) FROM core)) AS n_other
    """


def _hash_split_oracle_sql() -> str:
    """Oracle for ``rel_hash_split``: the md5-prefix hash64 of the
    stringified key against the SAME floor(cum_frac * 2^63) integer
    boundaries ``stages.ops.hash_split`` computes (built here from
    SPLIT_FRACTIONS so the literals cannot drift)."""
    import numpy as np

    names = list(SPLIT_FRACTIONS)
    fr = np.array([SPLIT_FRACTIONS[k] for k in names], dtype=np.float64)
    bounds = np.floor(np.cumsum(fr) * float(1 << 63)).astype(np.uint64)
    bounds[-1] = np.uint64(1 << 63)
    hv = (
        "CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 16))::UBIGINT"
        " & 9223372036854775807::UBIGINT AS UBIGINT)"
    )
    cases = " ".join(
        f"WHEN {hv} < {int(b)} THEN '{n}'" for n, b in zip(names[:-1], bounds[:-1])
    )
    return (
        f"SELECT event_id, CASE {cases} ELSE '{names[-1]}' END AS split FROM events"
    )


def _pagerank_oracle_sql() -> str:
    """Oracle for ``crawl_pagerank``: re-derives the link edges in SQL
    (same CTEs as the hash-matched ``crawl_links`` oracle), restricts
    them to the crawled node set, and unrolls ``PAGERANK_ITERS`` damped
    power iterations as a CTE chain — r_{k+1}(v) = (1-d)/n +
    d*(sum_{u->v} r_k(u)/deg(u) + dangling_k/n), identical semantics to
    ``stages.crawl.pagerank``. The damping constants are written as the
    same (1 - 0.85) expression both engines evaluate, and ranks are
    quantized to rank_e9 AFTER the final iteration (the repo's *_e6/_e9
    float-parity pattern)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    d = PAGERANK_D
    head = f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{pages_path}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    edges0 AS (SELECT DISTINCT
                      regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80') AS src_url,
                      regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS dst_url
               FROM hrefs),
    nodes AS (SELECT DISTINCT regexp_replace(url, '^http://([^/]*)', 'http://\\1:80') AS url
              FROM pages),
    e AS MATERIALIZED (SELECT src_url, dst_url FROM edges0
          JOIN nodes ON edges0.dst_url = nodes.url),
    deg AS MATERIALIZED (SELECT src_url, count(*) AS deg FROM e GROUP BY src_url),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    r0 AS MATERIALIZED (SELECT url, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    steps = []
    for k in range(PAGERANK_ITERS):
        steps.append(f""",
    d{k} AS MATERIALIZED (SELECT coalesce(sum(r.rank), 0.0) AS m FROM r{k} r
             LEFT JOIN deg ON r.url = deg.src_url WHERE deg.src_url IS NULL),
    r{k + 1} AS MATERIALIZED (SELECT nodes.url,
               (1 - {d}) / (SELECT n FROM nn)
               + {d} * (coalesce(c.c, 0.0) + (SELECT m FROM d{k}) / (SELECT n FROM nn)) AS rank
             FROM nodes LEFT JOIN (
               SELECT e.dst_url AS url, sum(r.rank / deg.deg) AS c
               FROM e JOIN r{k} r ON e.src_url = r.url
               JOIN deg ON deg.src_url = e.src_url
               GROUP BY e.dst_url) c ON nodes.url = c.url)""")
    tail = f"""
    SELECT url, CAST(round(rank * 1000000000) AS BIGINT) AS rank_e9
    FROM r{PAGERANK_ITERS} ORDER BY url
    """
    return head + "".join(steps) + tail


def _ppr_oracle_sql() -> str:
    """Oracle for ``crawl_ppr``: the pagerank edge/node replay with a
    PERSONALIZED teleport — the 5 lexicographically smallest node urls
    get 1/k teleport mass each, everyone else 0; r_0 = teleport and
    the dangling mass redistributes to the seeds ((1-d)*t + d*(c +
    dang*t), the same IEEE expression order as the engine branch)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    d = PAGERANK_D
    head = f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{pages_path}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    edges0 AS (SELECT DISTINCT
                      regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80') AS src_url,
                      regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS dst_url
               FROM hrefs),
    nodes AS (SELECT DISTINCT regexp_replace(url, '^http://([^/]*)', 'http://\\1:80') AS url
              FROM pages),
    e AS MATERIALIZED (SELECT src_url, dst_url FROM edges0
          JOIN nodes ON edges0.dst_url = nodes.url),
    deg AS MATERIALIZED (SELECT src_url, count(*) AS deg FROM e GROUP BY src_url),
    seeds AS MATERIALIZED (SELECT url FROM nodes ORDER BY url LIMIT 5),
    sk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM seeds),
    tp AS MATERIALIZED (SELECT nodes.url,
            CASE WHEN s.url IS NOT NULL THEN 1.0 / (SELECT k FROM sk)
                 ELSE 0.0 END AS t
          FROM nodes LEFT JOIN seeds s ON nodes.url = s.url),
    r0 AS MATERIALIZED (SELECT url, t AS rank FROM tp)"""
    steps = []
    for k in range(PAGERANK_ITERS):
        steps.append(f""",
    d{k} AS MATERIALIZED (SELECT coalesce(sum(r.rank), 0.0) AS m FROM r{k} r
             LEFT JOIN deg ON r.url = deg.src_url WHERE deg.src_url IS NULL),
    r{k + 1} AS MATERIALIZED (SELECT tp.url,
               (1 - {d}) * tp.t
               + {d} * (coalesce(c.c, 0.0) + (SELECT m FROM d{k}) * tp.t) AS rank
             FROM tp LEFT JOIN (
               SELECT e.dst_url AS url, sum(r.rank / deg.deg) AS c
               FROM e JOIN r{k} r ON e.src_url = r.url
               JOIN deg ON deg.src_url = e.src_url
               GROUP BY e.dst_url) c ON tp.url = c.url)""")
    tail = f"""
    SELECT url, CAST(round(rank * 1000000000) AS BIGINT) AS rank_e9
    FROM r{PAGERANK_ITERS} ORDER BY url
    """
    return head + "".join(steps) + tail


def _hits_oracle_sql() -> str:
    """Oracle for ``crawl_hits``: same edge/node CTEs as the pagerank
    oracle, then HITS_ITERS unrolled (authority, hub) half-iterations,
    each L1-normalized — identical semantics to ``stages.crawl.hits``;
    scores quantized to *_e9 after the final iteration."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    head = f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{pages_path}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    edges0 AS (SELECT DISTINCT
                      regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80') AS src_url,
                      regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS dst_url
               FROM hrefs),
    nodes AS (SELECT DISTINCT regexp_replace(url, '^http://([^/]*)', 'http://\\1:80') AS url
              FROM pages),
    e AS MATERIALIZED (SELECT src_url, dst_url FROM edges0
          JOIN nodes n1 ON edges0.dst_url = n1.url
          JOIN nodes n2 ON edges0.src_url = n2.url),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    h0 AS MATERIALIZED (SELECT url, 1.0 / (SELECT n FROM nn) AS s FROM nodes)"""
    steps = []
    for k in range(HITS_ITERS):
        steps.append(f""",
    ar{k} AS MATERIALIZED (SELECT nodes.url, coalesce(c.c, 0.0) AS s FROM nodes LEFT JOIN (
        SELECT e.dst_url AS url, sum(h.s) AS c FROM e JOIN h{k} h ON e.src_url = h.url
        GROUP BY e.dst_url) c ON nodes.url = c.url),
    a{k + 1} AS MATERIALIZED (SELECT url,
        coalesce(s / nullif((SELECT sum(s) FROM ar{k}), 0), 0.0) AS s FROM ar{k}),
    hr{k} AS MATERIALIZED (SELECT nodes.url, coalesce(c.c, 0.0) AS s FROM nodes LEFT JOIN (
        SELECT e.src_url AS url, sum(a.s) AS c FROM e JOIN a{k + 1} a ON e.dst_url = a.url
        GROUP BY e.src_url) c ON nodes.url = c.url),
    h{k + 1} AS MATERIALIZED (SELECT url,
        coalesce(s / nullif((SELECT sum(s) FROM hr{k}), 0), 0.0) AS s FROM hr{k})""")
    tail = f"""
    SELECT a.url,
           CAST(round(a.s * 1000000000) AS BIGINT) AS auth_e9,
           CAST(round(h.s * 1000000000) AS BIGINT) AS hub_e9
    FROM a{HITS_ITERS} a JOIN h{HITS_ITERS} h USING (url) ORDER BY a.url
    """
    return head + "".join(steps) + tail


def _salsa_oracle_sql() -> str:
    """Oracle for ``crawl_salsa``: same edge/node CTEs as the HITS
    oracle plus restricted out/in-degree tables; each half-iteration
    divides the propagated score by the PROPAGATING node's degree
    (h/outdeg forward, a/indeg backward) then L1-normalizes —
    identical semantics to ``stages.crawl.salsa``; *_e9 quantized
    after the final iteration."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    pages_path = pages_for_sf_dir(_oracle_sf_dir())
    head = f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{pages_path}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    edges0 AS (SELECT DISTINCT
                      regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80') AS src_url,
                      regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS dst_url
               FROM hrefs),
    nodes AS (SELECT DISTINCT regexp_replace(url, '^http://([^/]*)', 'http://\\1:80') AS url
              FROM pages),
    e AS MATERIALIZED (SELECT src_url, dst_url FROM edges0
          JOIN nodes n1 ON edges0.dst_url = n1.url
          JOIN nodes n2 ON edges0.src_url = n2.url),
    od AS MATERIALIZED (SELECT src_url AS url, CAST(count(*) AS DOUBLE) AS d
                        FROM e GROUP BY src_url),
    ind AS MATERIALIZED (SELECT dst_url AS url, CAST(count(*) AS DOUBLE) AS d
                         FROM e GROUP BY dst_url),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    h0 AS MATERIALIZED (SELECT url, 1.0 / (SELECT n FROM nn) AS s FROM nodes)"""
    steps = []
    for k in range(HITS_ITERS):
        steps.append(f""",
    ar{k} AS MATERIALIZED (SELECT nodes.url, coalesce(c.c, 0.0) AS s FROM nodes LEFT JOIN (
        SELECT e.dst_url AS url, sum(h.s / od.d) AS c
        FROM e JOIN h{k} h ON e.src_url = h.url JOIN od ON od.url = e.src_url
        GROUP BY e.dst_url) c ON nodes.url = c.url),
    a{k + 1} AS MATERIALIZED (SELECT url,
        coalesce(s / nullif((SELECT sum(s) FROM ar{k}), 0), 0.0) AS s FROM ar{k}),
    hr{k} AS MATERIALIZED (SELECT nodes.url, coalesce(c.c, 0.0) AS s FROM nodes LEFT JOIN (
        SELECT e.src_url AS url, sum(a.s / ind.d) AS c
        FROM e JOIN a{k + 1} a ON e.dst_url = a.url JOIN ind ON ind.url = e.dst_url
        GROUP BY e.src_url) c ON nodes.url = c.url),
    h{k + 1} AS MATERIALIZED (SELECT url,
        coalesce(s / nullif((SELECT sum(s) FROM hr{k}), 0), 0.0) AS s FROM hr{k})""")
    tail = f"""
    SELECT a.url,
           CAST(round(a.s * 1000000000) AS BIGINT) AS auth_e9,
           CAST(round(h.s * 1000000000) AS BIGINT) AS hub_e9
    FROM a{HITS_ITERS} a JOIN h{HITS_ITERS} h USING (url) ORDER BY a.url
    """
    return head + "".join(steps) + tail


def _index_update_oracle_sql() -> str:
    """DuckDB twin of ``index_update_stats``: from-scratch (term, df, cf)
    over the whole synthetic corpus, with the incremental-update dedup
    winner rule — base generation (even doc_id parity) wins over delta,
    then the engine's (warc_ts, url) keep-first within a generation."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    pages_path = pages_for_sf_dir(sf_dir)
    return f"""
    WITH pages AS (SELECT * FROM read_parquet('{pages_path}')),
    keyed AS (
      SELECT url, warc_ts, html, text,
             CAST(('0x' || substr(md5(url), 1, 16))::UBIGINT
                  & 9223372036854775807::UBIGINT AS BIGINT) AS doc_id
      FROM pages),
    winners AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY html
                                  ORDER BY (doc_id % 2), warc_ts, url) AS rn
        FROM keyed) WHERE rn = 1),
    toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM winners),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term)
    SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
    FROM tf GROUP BY term ORDER BY term
    """


def _index_delete_oracle_sql() -> str:
    """DuckDB twin of ``index_delete_stats``: from-scratch (term, df,
    cf) over the dedup winners of the whole corpus MINUS the deleted
    docs (doc_id % 8 == 3). Deletion does not re-run dedup (a loser is
    never promoted when its winner is deleted — the tombstone
    contract), so winners are computed over the FULL corpus first."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    pages_path = pages_for_sf_dir(sf_dir)
    return f"""
    WITH pages AS (SELECT * FROM read_parquet('{pages_path}')),
    winners AS (
      SELECT url, text FROM (
        SELECT url, text,
               row_number() OVER (PARTITION BY html ORDER BY warc_ts, url) AS rn
        FROM pages) WHERE rn = 1),
    docs AS (
      SELECT CAST(('0x' || substr(md5(url), 1, 16))::UBIGINT
                  & 9223372036854775807::UBIGINT AS BIGINT) AS doc_id, text
      FROM winners),
    kept AS (SELECT * FROM docs WHERE doc_id % 8 <> 3),
    toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM kept),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term)
    SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
    FROM tf GROUP BY term ORDER BY term
    """


def _ingest_oracle_sql() -> str:
    """DuckDB twin of ``ingest_jsonl_pages``: per-lang byte totals over
    the canonical parquet (the JSONL is a lossless round-trip of it)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    pages_path = pages_for_sf_dir(sf_dir)
    return f"""
    SELECT lang, count(*) AS n_pages,
           CAST(sum(strlen(text)) AS BIGINT) AS sum_text_bytes,
           CAST(sum(octet_length(html)) AS BIGINT) AS sum_html_bytes
    FROM read_parquet('{pages_path}')
    GROUP BY lang ORDER BY lang
    """


def _stem_vocab_oracle_sql() -> str:
    """DuckDB twin of ``text_stem_vocab``: the (term, stem) map for the
    corpus's DISTINCT vocabulary is computed by the same pure function
    (``functions/stem.porter_stem``) and embedded as VALUES (the
    bounded-vocabulary sketch-oracle pattern); SQL re-derives per-term
    total tf from the canonical tokenization and both rollups."""
    import pyarrow.parquet as pq_

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.stem import (
        porter_stem,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.tokenize import (
        tokenize_count_batch,
    )

    t = pq_.read_table(
        os.path.join(_oracle_sf_dir(), "documents.parquet"), columns=["text"]
    )
    terms, _tfs, _ = tokenize_count_batch(t["text"].combine_chunks())
    vocab = sorted(set(terms.flatten().to_pylist()))

    def esc(s: str) -> str:
        return s.replace("'", "''")

    rows = ", ".join(f"('{esc(v)}', '{esc(porter_stem(v))}')" for v in vocab)
    return f"""
    WITH toks AS (SELECT unnest({TOKS}) AS term FROM documents),
    tf AS (SELECT term, count(*) AS tf FROM toks GROUP BY term),
    sm(term, stem) AS (VALUES {rows})
    SELECT sm.stem, count(*) AS n_terms, CAST(sum(tf.tf) AS BIGINT) AS total_tf
    FROM tf JOIN sm USING (term)
    GROUP BY sm.stem
    """


def _compress_ratio_oracle_sql() -> str:
    """Oracle for ``text_compress_ratio``: per-doc compressed sizes
    from the same deterministic zlib call are embedded as VALUES keyed
    by doc_id; SQL re-derives raw byte lengths and the exact ratio
    arithmetic from the documents table itself."""
    import zlib

    import pyarrow.parquet as pq_

    t = pq_.read_table(
        os.path.join(_oracle_sf_dir(), "documents.parquet"),
        columns=["doc_id", "text"],
    )
    rows = ", ".join(
        f"({i}, {len(zlib.compress(s.encode(), 6))})"
        for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    )
    return f"""
    WITH comp(doc_id, compressed_bytes) AS (VALUES {rows})
    SELECT d.doc_id, CAST(strlen(d.text) AS BIGINT) AS raw_bytes,
           CAST(comp.compressed_bytes AS BIGINT) AS compressed_bytes,
           CAST(CASE WHEN strlen(d.text) > 0
                THEN comp.compressed_bytes * 10000 // strlen(d.text)
                ELSE 0 END AS BIGINT) AS ratio_e4
    FROM documents d JOIN comp USING (doc_id)
    """


def _ingest_warc_oracle_sql() -> str:
    """DuckDB twin of ``ingest_warc_pages``: per-host counts, html byte
    totals, and second-floored min capture time over the canonical
    parquet (the WARC files are a lossless round-trip of those three
    columns; WARC-Date truncates to whole seconds and floor is
    monotonic, so min commutes with the truncation)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    pages_path = pages_for_sf_dir(sf_dir)
    return f"""
    SELECT split_part(url, '/', 3) AS host, count(*) AS n_pages,
           CAST(sum(octet_length(html)) AS BIGINT) AS sum_html_bytes,
           CAST((epoch_us(min(warc_ts)) // 1000000) * 1000000 AS BIGINT)
             AS min_ts_us
    FROM read_parquet('{pages_path}')
    GROUP BY host ORDER BY host
    """


def oracle_sql() -> dict[str, str]:
    toks_cte = f"WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents)"

    bm25 = f"""
    WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT (SELECT count(*) FROM documents) AS n,
             CAST((SELECT count(*) FROM toks) AS DOUBLE)
               / (SELECT count(*) FROM documents) AS avgdl
    ),
    q AS (SELECT unnest({BM25_QUERY.split()!r}) AS term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
           WHERE term IN (SELECT term FROM q) GROUP BY term)
    SELECT tf.doc_id AS doc_id,
           CAST(round(sum(
             ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * (tf.tf * (1.2 + 1))
               / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl))
           ) * 1000000) AS BIGINT) AS score_e6
    FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id, stats
    GROUP BY tf.doc_id
    ORDER BY score_e6 DESC, doc_id
    LIMIT 20
    """

    tfidf = f"""
    WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    n AS (SELECT count(*) AS n FROM documents),
    q AS (SELECT unnest({TFIDF_QUERY.split()!r}) AS term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
           WHERE term IN (SELECT term FROM q) GROUP BY term)
    SELECT tf.doc_id AS doc_id,
           CAST(round(sum(log10(CAST(n.n AS DOUBLE) / df.df) * (1 + log10(CAST(tf.tf AS DOUBLE)))) * 1000000) AS BIGINT) AS score_e6
    FROM tf JOIN df USING (term), n
    GROUP BY tf.doc_id
    HAVING sum(log10(CAST(n.n AS DOUBLE) / df.df) * (1 + log10(CAST(tf.tf AS DOUBLE)))) > 0.3
    ORDER BY score_e6 DESC, doc_id
    LIMIT 300
    """

    jaccard = f"""
    WITH toksl AS (SELECT doc_id, {TOKS} AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                         i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS shingle
           FROM toksl WHERE len(t) >= 3),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= {JACCARD_THR}
    """

    # the chained prep pipeline: same quality rule as the text_quality
    # oracle, same lang vote as text_lang_id, keep-first dedup losers,
    # same shingle/bench CTEs as text_decontaminate at min_hits=10
    data_prep = f"""
    WITH t AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
    m AS (SELECT doc_id, toks,
                 len(toks) AS n_tokens,
                 len(list_filter(toks, x -> list_contains({EN_SQL}, x))) AS en_hits,
                 len(list_filter(toks, x -> list_contains({DE_SQL}, x))) AS de_hits,
                 len(list_filter(toks, x -> list_contains({FR_SQL}, x))) AS fr_hits,
                 CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                   / greatest(len(toks), 1) AS mean_token_len
          FROM t),
    q AS (SELECT doc_id, n_tokens,
                 CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                      WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS lang_pred
          FROM m
          WHERE n_tokens >= 20
            AND CAST(en_hits AS DOUBLE) / greatest(n_tokens, 1) >= 0.05
            AND mean_token_len <= 12.0),
    losers AS (SELECT doc_id FROM (
                 SELECT doc_id, row_number() OVER (
                   PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM documents)
               WHERE rn > 1),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                         i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS shingle
           FROM t WHERE len(toks) >= 3),
    bench AS (SELECT DISTINCT shingle FROM sh
              WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20)),
    cont AS (SELECT s.doc_id FROM sh s JOIN bench b USING (shingle)
             GROUP BY s.doc_id HAVING count(*) >= 10)
    SELECT lang_pred, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM q
    WHERE doc_id NOT IN (SELECT doc_id FROM losers)
      AND doc_id NOT IN (SELECT doc_id FROM cont)
    GROUP BY lang_pred
    """

    # dup clusters: the jaccard pair CTEs, then CLUSTER_ROUNDS unrolled
    # min-label propagation rounds (identical fixed round count to
    # stages.dedup.dup_clusters; early fixpoints are round-invariant)
    _cluster_steps = "".join(
        f""",
    l{k + 1} AS MATERIALIZED (
      SELECT n.doc_id, least(n.lab, coalesce(m.ml, n.lab)) AS lab
      FROM l{k} n LEFT JOIN (
        SELECT e.dst AS doc_id, min(l.lab) AS ml
        FROM e JOIN l{k} l ON e.src = l.doc_id GROUP BY e.dst) m
      USING (doc_id))"""
        for k in range(CLUSTER_ROUNDS)
    )
    # link-graph components: the crawl_links edge replay, endpoints
    # hashed to the md5 doc_id convention, same unrolled rounds
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir as _pfsd,
    )

    _lg_pages = _pfsd(_oracle_sf_dir())
    _id_of = (
        "CAST(('0x' || substr(md5({u}), 1, 16))::UBIGINT"
        " & 9223372036854775807::UBIGINT AS BIGINT)"
    )
    crawl_components_sql = f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{_lg_pages}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    ed AS (SELECT DISTINCT
             regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80') AS s,
             regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS d
           FROM hrefs),
    ids AS (SELECT {_id_of.format(u='s')} AS a, {_id_of.format(u='d')} AS b
            FROM ed),
    pairs AS (SELECT DISTINCT least(a, b) AS doc_a, greatest(a, b) AS doc_b
              FROM ids WHERE a <> b),
    e AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
                       UNION ALL
                       SELECT doc_b AS src, doc_a AS dst FROM pairs),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS doc_id FROM e),
    l0 AS (SELECT doc_id, doc_id AS lab FROM nodes){_cluster_steps}
    SELECT doc_id, lab AS cluster_id FROM l{CLUSTER_ROUNDS}
    """

    # label-propagation communities: same edge replay, LP_ROUNDS
    # unrolled synchronous adopt-the-mode rounds, (count desc, label
    # asc) tie-break — identical to stages/crawl.label_prop_communities
    _lp_steps = "".join(
        f""",
    p{k + 1} AS MATERIALIZED (
      SELECT w.node, w.lab FROM (
        SELECT e.dst AS node, l.lab, count(*) AS c,
               row_number() OVER (PARTITION BY e.dst
                                  ORDER BY count(*) DESC, l.lab) AS rn
        FROM e JOIN p{k} l ON e.src = l.node GROUP BY e.dst, l.lab) w
      WHERE w.rn = 1)"""
        for k in range(LP_ROUNDS)
    )
    crawl_label_prop_sql = f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{_lg_pages}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    ed AS (SELECT DISTINCT
             regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80') AS s,
             regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS d
           FROM hrefs),
    ids AS (SELECT {_id_of.format(u='s')} AS a, {_id_of.format(u='d')} AS b
            FROM ed),
    pairs AS (SELECT DISTINCT least(a, b) AS doc_a, greatest(a, b) AS doc_b
              FROM ids WHERE a <> b),
    e AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
                       UNION ALL
                       SELECT doc_b AS src, doc_a AS dst FROM pairs),
    p0 AS (SELECT DISTINCT src AS node, src AS lab FROM e){_lp_steps}
    SELECT node AS doc_id, lab AS community_id FROM p{LP_ROUNDS}
    """

    # modularity of the label-prop partition: same CTE chain, then the
    # exact-integer Q = (4m*intra - sum_c d_c^2) / (4m^2) in HUGEINT
    # with the signed floor emulation (Q can be negative)
    crawl_modularity_sql = f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{_lg_pages}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    ed AS (SELECT DISTINCT
             regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80') AS s,
             regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS d
           FROM hrefs),
    ids AS (SELECT {_id_of.format(u='s')} AS a, {_id_of.format(u='d')} AS b
            FROM ed),
    pairs AS MATERIALIZED (SELECT DISTINCT least(a, b) AS doc_a, greatest(a, b) AS doc_b
              FROM ids WHERE a <> b),
    e AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
                       UNION ALL
                       SELECT doc_b AS src, doc_a AS dst FROM pairs),
    p0 AS (SELECT DISTINCT src AS node, src AS lab FROM e){_lp_steps},
    mm AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM pairs),
    intra AS (SELECT CAST(count(*) AS HUGEINT) AS i FROM pairs
              JOIN p{LP_ROUNDS} la ON la.node = pairs.doc_a
              JOIN p{LP_ROUNDS} lb ON lb.node = pairs.doc_b
              WHERE la.lab = lb.lab),
    deg AS (SELECT x AS node, CAST(count(*) AS HUGEINT) AS d FROM
             (SELECT doc_a AS x FROM pairs UNION ALL SELECT doc_b FROM pairs)
            GROUP BY x),
    dc AS (SELECT l.lab, sum(deg.d) AS dsum
           FROM deg JOIN p{LP_ROUNDS} l ON l.node = deg.node GROUP BY l.lab),
    s AS (SELECT (SELECT m FROM mm) AS m,
                 (SELECT i FROM intra) AS i,
                 (SELECT sum(dsum * dsum) FROM dc) AS sd,
                 (SELECT CAST(count(DISTINCT lab) AS BIGINT) FROM p{LP_ROUNDS}) AS nc,
                 (SELECT CAST(count(*) AS BIGINT) FROM p{LP_ROUNDS}) AS nn),
    f AS (SELECT nn, nc, m, 1000000 * (4 * m * i - sd) AS a, 4 * m * m AS b FROM s)
    SELECT CAST(nn AS BIGINT) AS n_nodes, CAST(m AS BIGINT) AS n_edges,
           nc AS n_communities,
           CAST((a - ((a % b) + b) % b) // b AS BIGINT) AS modularity_e6
    FROM f
    """

    # triangle census: the same edge replay up to the distinct (a<b)
    # pair set, then degrees / wedges / the one-orientation triangle
    # join (a<b, b<c closing a<c counts each triangle exactly once)
    crawl_triangles_sql = f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{_lg_pages}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    ed AS (SELECT DISTINCT
             regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80') AS s,
             regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS d
           FROM hrefs),
    ids AS (SELECT {_id_of.format(u='s')} AS a, {_id_of.format(u='d')} AS b
            FROM ed),
    pairs AS MATERIALIZED (
        SELECT DISTINCT least(a, b) AS doc_a, greatest(a, b) AS doc_b
        FROM ids WHERE a <> b),
    deg AS (SELECT node, count(*) AS deg FROM (
              SELECT doc_a AS node FROM pairs
              UNION ALL SELECT doc_b FROM pairs)
            GROUP BY node),
    tri AS (SELECT count(*) AS n FROM pairs e1
            JOIN pairs e2 ON e2.doc_a = e1.doc_b
            JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
    agg AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                   CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
            FROM deg)
    SELECT agg.n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
           agg.n_wedges,
           (SELECT CAST(n AS BIGINT) FROM tri) AS n_triangles,
           CAST(CASE WHEN agg.n_wedges = 0 THEN 0
                ELSE (3000000 * (SELECT n FROM tri)) // agg.n_wedges
                END AS BIGINT) AS transitivity_e6
    FROM agg
    """


    # edge embeddedness: same edge replay; triangles enumerated once
    # (x<y<z by construction) then attributed to all three edges
    crawl_edge_support_sql = f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{_lg_pages}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    ed AS (SELECT DISTINCT
             regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80') AS s,
             regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS d
           FROM hrefs),
    ids AS (SELECT {_id_of.format(u='s')} AS a, {_id_of.format(u='d')} AS b
            FROM ed),
    pairs AS MATERIALIZED (
        SELECT DISTINCT least(a, b) AS doc_a, greatest(a, b) AS doc_b
        FROM ids WHERE a <> b),
    tris AS (SELECT e1.doc_a AS x, e1.doc_b AS y, e2.doc_b AS z
             FROM pairs e1
             JOIN pairs e2 ON e2.doc_a = e1.doc_b
             JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
    attr AS (SELECT x AS a, y AS b FROM tris
             UNION ALL SELECT x, z FROM tris
             UNION ALL SELECT y, z FROM tris)
    SELECT a AS doc_a, b AS doc_b, count(*) AS support
    FROM attr GROUP BY a, b
    ORDER BY support DESC, doc_a, doc_b
    LIMIT 20
    """

    # 3-truss: 4 unrolled support-peel rounds (converged rounds are
    # idempotent, so the fixed unroll equals the loop-until-stable)
    _truss_rounds = []
    for _r in range(1, 5):
        _truss_rounds.append(f""",
    tris{_r} AS (SELECT e1.doc_a AS x, e1.doc_b AS y, e2.doc_b AS z
                 FROM p{_r - 1} e1
                 JOIN p{_r - 1} e2 ON e2.doc_a = e1.doc_b
                 JOIN p{_r - 1} e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
    attr{_r} AS (SELECT x AS a, y AS b FROM tris{_r}
                 UNION ALL SELECT x, z FROM tris{_r}
                 UNION ALL SELECT y, z FROM tris{_r}),
    sup{_r} AS MATERIALIZED (SELECT a, b, count(*) AS s FROM attr{_r} GROUP BY a, b),
    p{_r} AS MATERIALIZED (SELECT a AS doc_a, b AS doc_b FROM sup{_r} WHERE s >= 1)""")
    crawl_ktruss_sql = f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{_lg_pages}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    ed AS (SELECT DISTINCT
             regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80') AS s,
             regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS d
           FROM hrefs),
    ids AS (SELECT {_id_of.format(u='s')} AS a, {_id_of.format(u='d')} AS b
            FROM ed),
    p0 AS MATERIALIZED (
        SELECT DISTINCT least(a, b) AS doc_a, greatest(a, b) AS doc_b
        FROM ids WHERE a <> b){''.join(_truss_rounds)}
    SELECT a AS doc_a, b AS doc_b, CAST(s AS BIGINT) AS support
    FROM sup4 WHERE s >= 1
    """

    # degree assortativity: same edge replay + degree CTE as the
    # triangle census; with both orientations the marginals coincide,
    # so r is one signed HUGEINT floor division — no float anywhere
    crawl_assortativity_sql = f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{_lg_pages}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    ed AS (SELECT DISTINCT
             regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80') AS s,
             regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS d
           FROM hrefs),
    ids AS (SELECT {_id_of.format(u='s')} AS a, {_id_of.format(u='d')} AS b
            FROM ed),
    pairs AS MATERIALIZED (
        SELECT DISTINCT least(a, b) AS doc_a, greatest(a, b) AS doc_b
        FROM ids WHERE a <> b),
    deg AS MATERIALIZED (
        SELECT node, CAST(count(*) AS HUGEINT) AS deg FROM (
              SELECT doc_a AS node FROM pairs
              UNION ALL SELECT doc_b FROM pairs)
            GROUP BY node),
    j AS (SELECT da.deg AS x, db.deg AS y FROM pairs
          JOIN deg da ON da.node = pairs.doc_a
          JOIN deg db ON db.node = pairs.doc_b),
    s AS (SELECT CAST(2 AS HUGEINT) * (SELECT count(*) FROM pairs) AS mm,
                 sum(x + y) AS sx,
                 sum(x * x + y * y) AS sxx,
                 2 * sum(x * y) AS sxy
          FROM j),
    f AS (SELECT mm, 1000000 * (mm * sxy - sx * sx) AS a,
                 mm * sxx - sx * sx AS b
          FROM s)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
           CAST(CASE WHEN b = 0 THEN 0
                ELSE (a - ((a % b) + b) % b) // b END AS BIGINT) AS assort_e6
    FROM f
    """

    # k-core: same edge replay, then CLUSTER_ROUNDS unrolled peels
    crawl_kcore_sql = f"""
    WITH pages AS (SELECT url, decode(html) AS doc
                   FROM read_parquet('{_lg_pages}')),
    hrefs AS (SELECT url AS src_url,
                     unnest(regexp_extract_all(doc, '<a href="([^"]*)">', 1)) AS href
              FROM pages),
    ed AS (SELECT DISTINCT
             regexp_replace(src_url, '^http://([^/]*)', 'http://\\1:80') AS s,
             regexp_replace(href, '^http://([^/]*)', 'http://\\1:80') AS d
           FROM hrefs),
    ids AS (SELECT {_id_of.format(u='s')} AS a, {_id_of.format(u='d')} AS b
            FROM ed),
    pairs AS MATERIALIZED (
        SELECT DISTINCT least(a, b) AS doc_a, greatest(a, b) AS doc_b
        FROM ids WHERE a <> b),
    e AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
                       UNION ALL
                       SELECT doc_b AS src, doc_a AS dst FROM pairs),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS doc_id FROM e),
    a0 AS (SELECT doc_id FROM nodes),
    a1 AS MATERIALIZED (
      SELECT e.src AS doc_id FROM e
      JOIN a0 s ON e.src = s.doc_id
      JOIN a0 t ON e.dst = t.doc_id
      GROUP BY e.src HAVING count(*) >= {KCORE_K}),
    a2 AS MATERIALIZED (
      SELECT e.src AS doc_id FROM e
      JOIN a1 s ON e.src = s.doc_id
      JOIN a1 t ON e.dst = t.doc_id
      GROUP BY e.src HAVING count(*) >= {KCORE_K}),
    a3 AS MATERIALIZED (
      SELECT e.src AS doc_id FROM e
      JOIN a2 s ON e.src = s.doc_id
      JOIN a2 t ON e.dst = t.doc_id
      GROUP BY e.src HAVING count(*) >= {KCORE_K}),
    a4 AS MATERIALIZED (
      SELECT e.src AS doc_id FROM e
      JOIN a3 s ON e.src = s.doc_id
      JOIN a3 t ON e.dst = t.doc_id
      GROUP BY e.src HAVING count(*) >= {KCORE_K}),
    a5 AS MATERIALIZED (
      SELECT e.src AS doc_id FROM e
      JOIN a4 s ON e.src = s.doc_id
      JOIN a4 t ON e.dst = t.doc_id
      GROUP BY e.src HAVING count(*) >= {KCORE_K}),
    a6 AS MATERIALIZED (
      SELECT e.src AS doc_id FROM e
      JOIN a5 s ON e.src = s.doc_id
      JOIN a5 t ON e.dst = t.doc_id
      GROUP BY e.src HAVING count(*) >= {KCORE_K}),
    a7 AS MATERIALIZED (
      SELECT e.src AS doc_id FROM e
      JOIN a6 s ON e.src = s.doc_id
      JOIN a6 t ON e.dst = t.doc_id
      GROUP BY e.src HAVING count(*) >= {KCORE_K}),
    a8 AS MATERIALIZED (
      SELECT e.src AS doc_id FROM e
      JOIN a7 s ON e.src = s.doc_id
      JOIN a7 t ON e.dst = t.doc_id
      GROUP BY e.src HAVING count(*) >= {KCORE_K}),
    a9 AS MATERIALIZED (
      SELECT e.src AS doc_id FROM e
      JOIN a8 s ON e.src = s.doc_id
      JOIN a8 t ON e.dst = t.doc_id
      GROUP BY e.src HAVING count(*) >= {KCORE_K}),
    a10 AS MATERIALIZED (
      SELECT e.src AS doc_id FROM e
      JOIN a9 s ON e.src = s.doc_id
      JOIN a9 t ON e.dst = t.doc_id
      GROUP BY e.src HAVING count(*) >= {KCORE_K})
    SELECT n.doc_id, (k.doc_id IS NOT NULL) AS in_core
    FROM nodes n LEFT JOIN a10 k ON n.doc_id = k.doc_id
    """

    # URL path-depth histogram per host (same pages replay)
    crawl_path_depth_sql = f"""
    WITH pages AS (SELECT url FROM read_parquet('{_lg_pages}')),
    d AS (SELECT lower(regexp_extract(url,
                 '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/:?#]+)', 1)) AS host,
                 CAST(length(p) - length(replace(p, '/', '')) AS BIGINT) AS depth
          FROM (SELECT url,
                       regexp_replace(url,
                         '^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/]*', '') AS p
                FROM pages))
    SELECT host, depth, count(*) AS n_urls FROM d GROUP BY host, depth
    """

    dup_cluster_sql = f"""
    WITH toksl AS (SELECT doc_id, {TOKS} AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                         i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS shingle
           FROM toksl WHERE len(t) >= 3),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id),
    pairs AS (SELECT doc_a, doc_b FROM inter
              JOIN sz sa ON sa.doc_id = doc_a
              JOIN sz sb ON sb.doc_id = doc_b
              WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= {JACCARD_THR}),
    e AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
                       UNION ALL
                       SELECT doc_b AS src, doc_a AS dst FROM pairs),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS doc_id FROM e),
    l0 AS (SELECT doc_id, doc_id AS lab FROM nodes){_cluster_steps}
    SELECT doc_id, lab AS cluster_id FROM l{CLUSTER_ROUNDS}
    """

    # cluster-capped curation: same unrolled component labels, plus the
    # keep-the-cap-lowest-doc_ids-per-cluster window rule
    _cap_final = (
        "SELECT doc_id, lab AS cluster_id,\n"
        "       row_number() OVER (PARTITION BY lab ORDER BY doc_id) <= 2 AS kept\n"
        f"    FROM l{CLUSTER_ROUNDS}"
    )
    cluster_cap_sql = dup_cluster_sql.replace(
        f"SELECT doc_id, lab AS cluster_id FROM l{CLUSTER_ROUNDS}", _cap_final
    )
    assert _cap_final in cluster_cap_sql, "dup_cluster_sql final select changed"

    # v2 prep chain: the v1 drop set (quality gate + exact losers +
    # contamination) plus near-dup cluster capping at ONE representative
    # per component (the same unrolled labels as dedup_cluster_cap)
    data_prep_v2 = f"""
    WITH t AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
    m AS (SELECT doc_id, toks,
                 len(toks) AS n_tokens,
                 len(list_filter(toks, x -> list_contains({EN_SQL}, x))) AS en_hits,
                 len(list_filter(toks, x -> list_contains({DE_SQL}, x))) AS de_hits,
                 len(list_filter(toks, x -> list_contains({FR_SQL}, x))) AS fr_hits,
                 CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                   / greatest(len(toks), 1) AS mean_token_len
          FROM t),
    q AS (SELECT doc_id, n_tokens,
                 CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                      WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS lang_pred
          FROM m
          WHERE n_tokens >= 20
            AND CAST(en_hits AS DOUBLE) / greatest(n_tokens, 1) >= 0.05
            AND mean_token_len <= 12.0),
    losers AS (SELECT doc_id FROM (
                 SELECT doc_id, row_number() OVER (
                   PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM documents)
               WHERE rn > 1),
    sh AS MATERIALIZED (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                         i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS shingle
           FROM t WHERE len(toks) >= 3),
    bench AS (SELECT DISTINCT shingle FROM sh
              WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20)),
    cont AS (SELECT s.doc_id FROM sh s JOIN bench b USING (shingle)
             GROUP BY s.doc_id HAVING count(*) >= 10),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id),
    pairs AS (SELECT doc_a, doc_b FROM inter
              JOIN sz sa ON sa.doc_id = doc_a
              JOIN sz sb ON sb.doc_id = doc_b
              WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= {JACCARD_THR}),
    e AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
                       UNION ALL
                       SELECT doc_b AS src, doc_a AS dst FROM pairs),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS doc_id FROM e),
    l0 AS (SELECT doc_id, doc_id AS lab FROM nodes){_cluster_steps},
    capped AS (SELECT doc_id FROM (
                 SELECT doc_id,
                        row_number() OVER (PARTITION BY lab ORDER BY doc_id) AS rn
                 FROM l{CLUSTER_ROUNDS}) WHERE rn > 1)
    SELECT lang_pred, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM q
    WHERE doc_id NOT IN (SELECT doc_id FROM losers)
      AND doc_id NOT IN (SELECT doc_id FROM cont)
      AND doc_id NOT IN (SELECT doc_id FROM capped)
    GROUP BY lang_pred
    """

    decontaminate = f"""
    WITH toksl AS (SELECT doc_id, {TOKS} AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                         i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS shingle
           FROM toksl WHERE len(t) >= 3),
    bench AS (SELECT DISTINCT shingle FROM sh
              WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20))
    SELECT s.doc_id, count(*) AS n_hits
    FROM sh s JOIN bench b ON s.shingle = b.shingle
    GROUP BY s.doc_id
    """

    knn = f"""
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < {KNN_QUERIES}),
    s AS (SELECT q.query_id, e.vec_id,
                 CAST(round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                   CAST(e.embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS cosine_e6
          FROM q CROSS JOIN embeddings e)
    SELECT query_id, vec_id, cosine_e6 FROM s
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cosine_e6 DESC, vec_id) <= {KNN_K}
    """

    knn_matryoshka = f"""
    WITH q AS (SELECT vec_id AS query_id, list_slice(embedding, 1, 16) AS embedding
               FROM embeddings WHERE vec_id < {KNN_QUERIES}),
    s AS (SELECT q.query_id, e.vec_id,
                 CAST(round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                   CAST(list_slice(e.embedding, 1, 16) AS DOUBLE[])) * 1000000) AS BIGINT) AS cosine_e6
          FROM q CROSS JOIN embeddings e)
    SELECT query_id, vec_id, cosine_e6 FROM s
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cosine_e6 DESC, vec_id) <= {KNN_K}
    """

    knn_filtered = f"""
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < {KNN_QUERIES}),
    c AS (SELECT vec_id, embedding FROM embeddings WHERE label = 3),
    s AS (SELECT q.query_id, c.vec_id,
                 CAST(round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                   CAST(c.embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS cosine_e6
          FROM q CROSS JOIN c)
    SELECT query_id, vec_id, cosine_e6 FROM s
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cosine_e6 DESC, vec_id) <= {KNN_K}
    """

    embedding_centroids = """
    WITH x AS (SELECT label, unnest(embedding) AS v,
                      generate_subscripts(embedding, 1) AS d
               FROM embeddings)
    SELECT label, CAST(d - 1 AS BIGINT) AS dim,
           CAST(sum(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_e6,
           CAST(count(*) AS BIGINT) AS n_vecs
    FROM x GROUP BY label, d
    """


    lang_id = f"""
    WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    hits AS (SELECT doc_id,
             len(list_filter(toks, x -> list_contains({EN_SQL}, x))) AS en_hits,
             len(list_filter(toks, x -> list_contains({DE_SQL}, x))) AS de_hits,
             len(list_filter(toks, x -> list_contains({FR_SQL}, x))) AS fr_hits
             FROM t)
    SELECT doc_id, en_hits, de_hits, fr_hits,
           CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS lang_pred
    FROM hits
    """

    repetition = f"""
    WITH t AS (SELECT doc_id, {TOKS} AS l FROM documents),
    toks AS (SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos FROM t),
    bi AS (SELECT a.doc_id, a.term AS w1, b.term AS w2, count(*) AS c
           FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
           GROUP BY ALL),
    bis AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                   CAST(max(c) AS BIGINT) AS top_bigram_count
            FROM bi GROUP BY doc_id),
    tri AS (SELECT a.doc_id, a.term AS w1, b.term AS w2, c3.term AS w3, count(*) AS c
            FROM toks a
            JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
            JOIN toks c3 ON a.doc_id = c3.doc_id AND c3.pos = a.pos + 2
            GROUP BY ALL),
    tris AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
                    CAST(sum(c) - count(*) AS BIGINT) AS dup_trigram_occurrences
             FROM tri GROUP BY doc_id)
    SELECT t.doc_id, CAST(len(t.l) AS BIGINT) AS n_tokens,
           COALESCE(bis.n_bigrams, 0) AS n_bigrams,
           COALESCE(bis.top_bigram_count, 0) AS top_bigram_count,
           COALESCE(tris.n_trigrams, 0) AS n_trigrams,
           COALESCE(tris.dup_trigram_occurrences, 0) AS dup_trigram_occurrences
    FROM t LEFT JOIN bis USING (doc_id) LEFT JOIN tris USING (doc_id)
    """

    quality = f"""
    WITH t AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
    m AS (SELECT doc_id,
                 length(text) AS n_chars,
                 length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')) AS punct_chars,
                 len(toks) AS n_tokens,
                 len(list_filter(toks, x -> list_contains({EN_SQL}, x))) AS en_hits,
                 CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                   / greatest(len(toks), 1) AS mean_token_len
          FROM t)
    SELECT doc_id, n_chars, punct_chars,
           CAST(en_hits AS DOUBLE) / greatest(n_tokens, 1) AS stopword_ratio,
           (n_tokens >= 20)
             AND (CAST(en_hits AS DOUBLE) / greatest(n_tokens, 1) >= 0.05)
             AND (mean_token_len <= 12.0) AS is_quality
    FROM m
    """

    return {
        "search_bm25_wand": _flagship_oracle_sql("bm25"),
        "search_bm25_tiered": _flagship_oracle_sql("bm25", variant="tiered"),
        "search_bm25_mmr": _flagship_oracle_sql("bm25", variant="mmr"),
        "search_rrf": _flagship_oracle_sql("bm25", variant="rrf"),
        "search_ltr_features": _flagship_oracle_sql("bm25", variant="ltr"),
        "search_reference_tfidf": _flagship_oracle_sql("reference"),
        "search_bm25_collapsed": _flagship_oracle_sql("bm25", host_collapse=1),
        "search_facets": _flagship_oracle_sql("bm25", variant="facets"),
        "search_eval_ndcg": _flagship_oracle_sql("bm25", variant="ndcg"),
        "search_eval_mrr": _flagship_oracle_sql("bm25", variant="mrr"),
        "search_eval_map": _flagship_oracle_sql("bm25", variant="map"),
        "search_bm25_stemmed": _stemmed_search_oracle_sql(),
        "search_bm25_maxscore": _flagship_oracle_sql("bm25"),
        "search_lm_dirichlet": _flagship_oracle_sql("lm"),
        "search_page2": _flagship_oracle_sql("bm25", variant="page2"),
        "search_bm25_conjunctive": _flagship_oracle_sql("bm25", variant="conj"),
        "search_bm25_mm": _flagship_oracle_sql("bm25", variant="mm"),
        "search_dismax": _flagship_oracle_sql("dismax"),
        "search_qpp": _flagship_oracle_sql("bm25", variant="qpp"),
        "search_explain": _flagship_oracle_sql("bm25", variant="explain"),
        "search_bm25f": _bm25f_oracle_sql(),
        "index_shard_stats": _docs_cte()
        + f""",
    toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM docs),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    vocab AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
              FROM tf GROUP BY term),
    routed AS (SELECT CAST(CAST(('0x' || substr(md5(term), 1, 16))::UBIGINT
                             & 9223372036854775807::UBIGINT AS BIGINT) % 16
                       AS BIGINT) AS shard, df, cf
               FROM vocab),
    per AS (SELECT shard, count(*) AS n_terms,
                   CAST(sum(df) AS BIGINT) AS sum_df,
                   CAST(sum(cf) AS BIGINT) AS sum_cf
            FROM routed GROUP BY shard)
    SELECT s.shard, COALESCE(per.n_terms, 0) AS n_terms,
           COALESCE(per.sum_df, 0) AS sum_df,
           COALESCE(per.sum_cf, 0) AS sum_cf
    FROM (SELECT unnest(range(16)) AS shard) s
    LEFT JOIN per USING (shard)
    """,
        "search_recency_boost": _flagship_oracle_sql("bm25", variant="recency"),
        "search_phrase": _phrase_oracle_sql(),
        "search_phrase_positional": _phrase_oracle_sql(),
        "search_boolean_and": _boolean_oracle_sql(),
        "search_snippet": _snippet_oracle_sql(),
        "search_proximity": _proximity_oracle_sql(),
        "index_update_stats": _index_update_oracle_sql(),
        "index_update_segment_stats": _index_update_oracle_sql(),
        "search_segment_bm25": _flagship_oracle_sql(
            "bm25", winner_order=_PARITY_WINNER_ORDER
        ),
        "index_delete_stats": _index_delete_oracle_sql(),
        "ingest_jsonl_pages": _ingest_oracle_sql(),
        "ingest_ipc_pages": _ingest_oracle_sql(),
        "ingest_csv_pages": _ingest_oracle_sql(),
        "ingest_warc_pages": _ingest_warc_oracle_sql(),
        "text_compress_ratio": _compress_ratio_oracle_sql(),
        "text_stem_vocab": _stem_vocab_oracle_sql(),
        # fuzzy vocab self-join: DuckDB's native levenshtein over the
        # O(V^2) cross join vs the engine's deletion-hash plan
        "text_vocab_neighbors": _vocab_neighbors_oracle_sql(),
        # hashed-feature embeddings, long form (md5 dim assignment)
        "text_embed_hash": f"""
    WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dims AS (SELECT doc_id,
               CAST(('0x' || substr(md5(term), 1, 16))::UBIGINT
                    & 9223372036854775807::UBIGINT AS BIGINT) % 64 AS dim,
               tf
             FROM tf)
    SELECT doc_id, dim, CAST(sum(tf) AS BIGINT) AS weight
    FROM dims GROUP BY doc_id, dim
    """,
        # per-doc sentence stats in characters
        "text_sentence_stats": """
    WITH s AS (SELECT doc_id,
                 list_filter(list_transform(string_split_regex(text, '[.!?]'),
                                            x -> trim(x, ' ' || chr(9) || chr(13) || chr(10))),
                             x -> x <> '') AS spans
               FROM documents)
    SELECT doc_id, CAST(len(spans) AS BIGINT) AS n_sentences,
           CAST(COALESCE(list_sum(list_transform(spans, x -> length(x))), 0)
                AS BIGINT) AS sum_sentence_chars,
           CAST(COALESCE(list_max(list_transform(spans, x -> length(x))), 0)
                AS BIGINT) AS max_sentence_chars
    FROM s
    """,
        # token-distribution entropy: per-(tf, dl) contribution
        # e6-quantized before the exact int64 per-doc sum
        "text_entropy": f"""
    WITH t AS (SELECT doc_id, {TOKS} AS l FROM documents),
    flat AS MATERIALIZED (SELECT doc_id, unnest(l) AS term FROM t),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM flat GROUP BY doc_id, term),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM flat GROUP BY doc_id),
    w AS (SELECT tf.doc_id,
            CAST(round(1000000.0 * (CAST(tf.tf AS DOUBLE) / dl.dl)
                 * ln(CAST(tf.tf AS DOUBLE) / dl.dl)) AS BIGINT) AS w
          FROM tf JOIN dl USING (doc_id))
    SELECT w.doc_id, dl.dl, CAST(-sum(w.w) AS BIGINT) AS entropy_e6
    FROM w JOIN dl USING (doc_id)
    GROUP BY w.doc_id, dl.dl
    """,
        # ARI readability: canonical-token chars/words + the sentence
        # rule above; exact integer rational at e3 (positive-shifted
        # numerator so floor == BIGINT truncation in both engines)
        "text_readability": f"""
    WITH t AS (SELECT doc_id, {TOKS} AS toks, text FROM documents),
    m AS (SELECT doc_id,
            CAST(len(toks) AS BIGINT) AS n_words,
            CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0)
                 AS BIGINT) AS n_chars,
            CAST(len(list_filter(list_transform(string_split_regex(text, '[.!?]'),
                          x -> trim(x, ' ' || chr(9) || chr(13) || chr(10))),
                     x -> x <> '')) AS BIGINT) AS n_sentences
          FROM t)
    SELECT doc_id, n_chars, n_words, n_sentences,
           CAST((4710 * n_chars * n_sentences + 500 * n_words * n_words
                 + (30000 - 21430) * n_words * n_sentences)
                // (n_words * n_sentences) - 30000 AS BIGINT) AS ari_e3
    FROM m WHERE n_words > 0 AND n_sentences > 0
    """,
        # overlapping RAG chunks: list_slice windows + native md5
        "text_chunk_overlap": f"""
    WITH toks AS (SELECT doc_id, {TOKS} AS l FROM documents),
    n AS (SELECT doc_id, l, len(l) AS n FROM toks WHERE len(l) > 0),
    starts AS (SELECT doc_id, l, n, unnest(range(0, n, 16)) AS s FROM n),
    chunks AS (SELECT doc_id, s // 16 AS chunk_idx,
                      list_slice(l, s + 1, least(s + 32, n)) AS c
               FROM starts)
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(len(c) AS BIGINT) AS chunk_len,
           md5(array_to_string(c, ' ')) AS chunk_md5
    FROM chunks
    """,
        # count-min sketch: the md5 cell hash is SQL-native, so DuckDB
        # re-derives the whole sketch and the min-over-cells estimate
        "text_cms_counts": f"""
    WITH toks AS (SELECT unnest({TOKS}) AS term FROM documents),
    tf AS (SELECT term, count(*) AS exact_tf FROM toks GROUP BY term),
    grid AS (SELECT unnest(range(4)) AS j),
    hashed AS (SELECT tf.term, grid.j,
                 CAST(('0x' || substr(md5(CAST(grid.j AS VARCHAR) || ':' || tf.term), 1, 16))::UBIGINT
                      & 9223372036854775807::UBIGINT AS BIGINT) % 64 AS cell,
                 tf.exact_tf
               FROM tf, grid),
    cells AS (SELECT j, cell, sum(exact_tf) AS cnt FROM hashed GROUP BY j, cell),
    est AS (SELECT h.term, min(c.cnt) AS est_tf
            FROM hashed h JOIN cells c ON c.j = h.j AND c.cell = h.cell
            GROUP BY h.term)
    SELECT tf.term, CAST(tf.exact_tf AS BIGINT) AS exact_tf,
           CAST(est.est_tf AS BIGINT) AS est_tf
    FROM tf JOIN est USING (term)
    """,
        "doc_term_stats": (
            f"{toks_cte} SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf "
            "FROM toks GROUP BY term"
        ),
        "doc_bm25_topk": bm25,
        # hybrid cascade: the SAME bm25 chain at LIMIT 50 nominates,
        # embedding cosine vs the vec_id=0 query vector re-orders
        "search_hybrid_rerank": f"""
    WITH toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT (SELECT count(*) FROM documents) AS n,
             CAST((SELECT count(*) FROM toks) AS DOUBLE)
               / (SELECT count(*) FROM documents) AS avgdl
    ),
    q AS (SELECT unnest({BM25_QUERY.split()!r}) AS term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
           WHERE term IN (SELECT term FROM q) GROUP BY term),
    cand AS (
      SELECT tf.doc_id AS doc_id,
             CAST(round(sum(
               ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * (1.2 + 1))
                 / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / stats.avgdl))
             ) * 1000000) AS BIGINT) AS bm25_e6
      FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id, stats
      GROUP BY tf.doc_id
      ORDER BY bm25_e6 DESC, doc_id
      LIMIT 50
    ),
    qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0)
    SELECT c.doc_id, c.bm25_e6,
           CAST(round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                             (SELECT v FROM qv)) * 1000000) AS BIGINT)
             AS cosine_e6
    FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id
    ORDER BY cosine_e6 DESC, c.doc_id
    LIMIT 10
    """,
        "doc_tfidf_topk": tfidf,
        # source-pair vocabulary Jaccard; ASCII source names, so the
        # VARCHAR < matches the kernel's lexicographic pair orientation
        "text_source_overlap": f"""
            WITH t AS (SELECT source, {TOKS} AS tk FROM documents),
            toks AS (SELECT DISTINCT source, unnest(tk) AS token FROM t),
            sz AS (SELECT source, count(*) AS sz FROM toks GROUP BY source),
            inter AS (SELECT a.source AS src_a, b.source AS src_b,
                             count(*) AS n_common
                      FROM toks a JOIN toks b ON a.token = b.token
                                            AND a.source < b.source
                      GROUP BY 1, 2)
            SELECT src_a, src_b, CAST(n_common AS BIGINT) AS n_common,
                   CAST(1000000 * n_common // (sa.sz + sb.sz - n_common) AS BIGINT) AS jaccard_e6
            FROM inter JOIN sz sa ON sa.source = src_a
                       JOIN sz sb ON sb.source = src_b
        """,
        # exact heavy hitters: the MG pass is candidate generation only
        # (guaranteed superset); the recount is exact, so the oracle is
        # the plain GROUP BY ... HAVING
        "text_heavy_hitters": (
            f"{toks_cte} SELECT term, count(*) AS cf FROM toks GROUP BY term "
            "HAVING count(*) >= ceil(0.005 * (SELECT count(*) FROM toks))"
        ),
        "text_token_stats": (
            f"{toks_cte} SELECT doc_id, count(*) AS n_tokens, "
            "count(DISTINCT term) AS n_unique_tokens, "
            "CAST(sum(length(term)) AS DOUBLE) / count(*) AS mean_token_len "
            "FROM toks GROUP BY doc_id"
        ),
        "text_lang_id": lang_id,
        # confusion matrix of the same prediction rule vs the label
        "text_lang_eval": f"""
    WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    hits AS (SELECT doc_id,
             len(list_filter(toks, x -> list_contains({EN_SQL}, x))) AS en_hits,
             len(list_filter(toks, x -> list_contains({DE_SQL}, x))) AS de_hits,
             len(list_filter(toks, x -> list_contains({FR_SQL}, x))) AS fr_hits
             FROM t),
    p AS (SELECT doc_id,
           CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS lang_pred
          FROM hits)
    SELECT d.lang, p.lang_pred, count(*) AS n_docs
    FROM p JOIN documents d USING (doc_id)
    GROUP BY d.lang, p.lang_pred
    """,
        "text_repetition": repetition,
        "text_collocations": f"""
    WITH t AS (SELECT doc_id, {TOKS} AS l FROM documents),
    toks AS (SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos FROM t),
    bi AS (SELECT a.term AS w1, b.term AS w2, count(*) AS n_occ
           FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
           GROUP BY ALL)
    SELECT w1, w2, CAST(n_occ AS BIGINT) AS n_occ FROM bi
    QUALIFY row_number() OVER (ORDER BY n_occ DESC, w1, w2) <= 100
    """,
        # windowed co-occurrence over the top-50 vocab: positions from
        # generate_subscripts so out-of-vocab tokens consume distance,
        # unordered pairs via least/greatest (windowed_cooccurrence)
        "text_cooccurrence": f"""
    WITH t AS (SELECT doc_id, {TOKS} AS l FROM documents),
    flat AS MATERIALIZED (SELECT doc_id, unnest(l) AS term,
                                 generate_subscripts(l, 1) AS i FROM t),
    cf AS (SELECT term, count(*) AS c FROM flat GROUP BY term),
    vocab AS (SELECT term FROM cf
              QUALIFY row_number() OVER (ORDER BY c DESC, term) <= 50),
    p AS MATERIALIZED (SELECT doc_id, term, i FROM flat
                       WHERE term IN (SELECT term FROM vocab)),
    pairs AS (SELECT least(a.term, b.term) AS term_a,
                     greatest(a.term, b.term) AS term_b
              FROM p a JOIN p b ON a.doc_id = b.doc_id
                              AND b.i - a.i BETWEEN 1 AND 2)
    SELECT term_a, term_b, CAST(count(*) AS BIGINT) AS n_cooc
    FROM pairs GROUP BY term_a, term_b
    """,
        # TextRank: the co-occurrence CTEs, then 10 unrolled exact-
        # integer damped power-iteration rounds (every floor division
        # explicit; all operands positive so SQL // == Python //)
        "text_textrank": f"""
    WITH t AS (SELECT doc_id, {{TOKS}} AS l FROM documents),
    flat AS MATERIALIZED (SELECT doc_id, unnest(l) AS term,
                                 generate_subscripts(l, 1) AS i FROM t),
    cf AS (SELECT term, count(*) AS c FROM flat GROUP BY term),
    vocab AS MATERIALIZED (SELECT term FROM cf
              QUALIFY row_number() OVER (ORDER BY c DESC, term) <= 50),
    p AS MATERIALIZED (SELECT doc_id, term, i FROM flat
                       WHERE term IN (SELECT term FROM vocab)),
    pr AS MATERIALIZED (
        SELECT least(a.term, b.term) AS term_a,
               greatest(a.term, b.term) AS term_b,
               CAST(count(*) AS BIGINT) AS n_cooc
        FROM p a JOIN p b ON a.doc_id = b.doc_id
                         AND b.i - a.i BETWEEN 1 AND 2
        GROUP BY 1, 2),
    cg AS MATERIALIZED (
        SELECT term_a AS u, term_b AS v, n_cooc FROM pr WHERE term_a <> term_b
        UNION ALL
        SELECT term_b AS u, term_a AS v, n_cooc FROM pr WHERE term_a <> term_b),
    ws AS (SELECT u, sum(n_cooc) AS w FROM cg GROUP BY u),
    wq AS MATERIALIZED (SELECT cg.u, cg.v,
                               (1000000 * cg.n_cooc) // ws.w AS wq
                        FROM cg JOIN ws USING (u)),
    r0 AS (SELECT term, CAST(1000000 AS BIGINT) AS r FROM vocab){{_TR_STEPS}}
    SELECT term, r AS rank_e6 FROM r{{TR_ITERS}}
    """.replace("{TOKS}", TOKS).replace("{_TR_STEPS}", "".join(
        f''',
    r{k + 1} AS MATERIALIZED (
      SELECT n.term,
             CAST(150000 + (85 * COALESCE(s.acc, 0)) // 100 AS BIGINT) AS r
      FROM vocab n LEFT JOIN (
        SELECT wq.v AS term, sum((wq.wq * r.r) // 1000000) AS acc
        FROM wq JOIN r{k} r ON wq.u = r.term GROUP BY wq.v) s USING (term))'''
        for k in range(10)
    )).replace("{TR_ITERS}", "10"),
        # PMI over the same top-100 collocations: exact counts, one
        # e6-rounded IEEE ln in the identical operand order
        "text_pmi": f"""
    WITH t AS (SELECT doc_id, {TOKS} AS l FROM documents),
    toks AS MATERIALIZED (SELECT doc_id, unnest(l) AS term,
                                 generate_subscripts(l, 1) AS pos FROM t),
    bi AS MATERIALIZED (SELECT a.term AS w1, b.term AS w2, count(*) AS n_occ
          FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
          GROUP BY ALL),
    top AS (SELECT w1, w2, n_occ FROM bi
            QUALIFY row_number() OVER (ORDER BY n_occ DESC, w1, w2) <= 100),
    cf AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    tot AS (SELECT (SELECT CAST(sum(n_occ) AS BIGINT) FROM bi) AS tbi,
                   (SELECT count(*) FROM toks) AS tuni)
    SELECT top.w1, top.w2, CAST(top.n_occ AS BIGINT) AS n_occ,
           CAST(round(1000000.0 * ln(
               CAST(top.n_occ AS DOUBLE) * CAST(tot.tuni AS DOUBLE)
               * CAST(tot.tuni AS DOUBLE)
               / (CAST(tot.tbi AS DOUBLE) * CAST(c1.c AS DOUBLE)
                  * CAST(c2.c AS DOUBLE)))) AS BIGINT) AS pmi_e6
    FROM top, tot
    JOIN cf c1 ON c1.term = top.w1
    JOIN cf c2 ON c2.term = top.w2
    """,
        # naive-Bayes lang ID: weights e6-quantized one at a time (the
        # unigram_loglik discipline) so per-doc sums are exact int64
        "text_nb_lang": f"""
    WITH t AS MATERIALIZED (SELECT doc_id, lang, {TOKS} AS l FROM documents),
    flat AS MATERIALIZED (SELECT doc_id, unnest(l) AS term FROM t),
    cf AS (SELECT term, count(*) AS c FROM flat GROUP BY term),
    vocab AS MATERIALIZED (SELECT term FROM cf
              QUALIFY row_number() OVER (ORDER BY c DESC, term) <= 200),
    vs AS (SELECT count(*) AS vn FROM vocab),
    v AS MATERIALIZED (SELECT doc_id, term FROM flat
                       WHERE term IN (SELECT term FROM vocab)),
    tr AS (SELECT d.lang, v.term, count(*) AS n
           FROM v JOIN t d USING (doc_id) GROUP BY d.lang, v.term),
    nl AS (SELECT lang, count(*) AS ndocs FROM t GROUP BY lang),
    ntot AS (SELECT count(*) AS n FROM t),
    totl AS (SELECT lang, CAST(sum(n) AS BIGINT) AS tot FROM tr GROUP BY lang),
    grid AS (SELECT nl.lang, vocab.term FROM nl, vocab),
    w AS MATERIALIZED (
      SELECT g.lang, g.term,
             CAST(round(1000000 * ln((COALESCE(tr.n, 0) + 1.0)
                                     / (totl.tot + vs.vn))) AS BIGINT) AS w_e6
      FROM grid g
      JOIN totl ON totl.lang = g.lang
      LEFT JOIN tr ON tr.lang = g.lang AND tr.term = g.term, vs),
    pri AS (SELECT nl.lang,
                   CAST(round(1000000 * ln(CAST(nl.ndocs AS DOUBLE) / ntot.n))
                        AS BIGINT) AS p_e6
            FROM nl, ntot),
    occ AS (SELECT v.doc_id, w.lang, CAST(sum(w.w_e6) AS BIGINT) AS s
            FROM v JOIN w ON w.term = v.term GROUP BY v.doc_id, w.lang),
    sc AS (SELECT t.doc_id, pri.lang, pri.p_e6 + COALESCE(occ.s, 0) AS score_e6
           FROM t CROSS JOIN pri
           LEFT JOIN occ ON occ.doc_id = t.doc_id AND occ.lang = pri.lang)
    SELECT doc_id, lang AS lang_nb, CAST(score_e6 AS BIGINT) AS nb_score_e6
    FROM sc
    QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score_e6 DESC, lang) = 1
    """,
        "text_quality": quality,
        "text_fingerprint": _fingerprint_oracle_sql(),
        "text_pii_scrub": _pii_scrub_oracle_sql(),
        # misspelling derivation (drop 2nd char of top-5 cf terms of
        # length >= 4) and the (dist, term) tie-break replayed exactly
        "text_bigram_loglik": f"""
    WITH t AS MATERIALIZED (SELECT doc_id, {TOKS} AS l FROM documents),
    pos AS MATERIALIZED (SELECT doc_id, unnest(l) AS term,
                                generate_subscripts(l, 1) AS pos FROM t),
    bi AS MATERIALIZED (SELECT a.doc_id, a.term AS w1, b.term AS w2
          FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
    bc AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY w1, w2),
    lc AS (SELECT w1, sum(c) AS n FROM bc GROUP BY w1),
    w AS (SELECT w1, w2,
                 CAST(round(log10(CAST(c AS DOUBLE) / n) * 1000000) AS BIGINT) AS w6
          FROM bc JOIN lc USING (w1))
    SELECT bi.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(w6) AS BIGINT) AS sum_logprob_e6
    FROM bi JOIN w ON bi.w1 = w.w1 AND bi.w2 = w.w2
    GROUP BY bi.doc_id
    """,
        "text_keywords": f"""
    WITH t AS (SELECT doc_id, {TOKS} AS l FROM documents),
    toks AS (SELECT doc_id, unnest(l) AS term FROM t),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    nn AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM toks),
    idf AS (SELECT term, CAST(round(log10((SELECT n FROM nn) / df) * 1000000) AS BIGINT) AS idf_e6 FROM df),
    s AS (SELECT doc_id, tf.term AS term, tf * idf_e6 AS tfidf_e6,
          row_number() OVER (PARTITION BY doc_id ORDER BY tf * idf_e6 DESC, tf.term) AS rn
          FROM tf JOIN idf ON tf.term = idf.term)
    SELECT doc_id, term, CAST(rn AS BIGINT) AS rank, tfidf_e6 FROM s WHERE rn <= 3
    """,
        "text_spell_correct": f"""
    WITH t AS (SELECT doc_id, {TOKS} AS l FROM documents),
    toks AS (SELECT unnest(l) AS term FROM t),
    cf AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    qs AS (SELECT substr(term, 1, 1) || substr(term, 3) AS q FROM (
             SELECT term FROM cf WHERE length(term) >= 4
             ORDER BY c DESC, term LIMIT 5)),
    best AS (SELECT q, term AS corrected,
                    CAST(levenshtein(q, term) AS BIGINT) AS dist,
                    row_number() OVER (PARTITION BY q
                      ORDER BY levenshtein(q, term), term) AS rn
             FROM qs CROSS JOIN cf)
    SELECT q, corrected, dist FROM best WHERE rn = 1
    """,
        # same md5-prefix hash64 priority as rel_group_sample, budget
        # rule inclusive: running sum including the current doc <= 4000
        "text_domain_mix": """
            SELECT doc_id, source, n_chars FROM (
              SELECT doc_id, source, n_chars,
                sum(n_chars) OVER (
                  PARTITION BY source
                  ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                                & 9223372036854775807::UBIGINT AS BIGINT),
                           doc_id
                  ROWS UNBOUNDED PRECEDING) AS cum
              FROM documents) WHERE cum <= 4000
        """,
        # chunk-level dup accounting: full 8-token windows, HAVING
        # count(*)=8 drops the trailing partial window (same rule as the
        # Ray side's sizes == chunk_tokens filter)
        "dedup_chunks": f"""
    WITH t AS (SELECT doc_id, {TOKS} AS l FROM documents),
    toks AS (SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos FROM t),
    ch AS (
      SELECT doc_id, md5(string_agg(term, ' ' ORDER BY pos)) AS h
      FROM toks GROUP BY doc_id, (pos - 1) // 8
      HAVING count(*) = 8
    ),
    cnt AS (SELECT h, count(*) AS n_occ FROM ch GROUP BY h)
    SELECT doc_id, count(*) AS n_chunks,
           CAST(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
    FROM ch JOIN cnt USING (h) GROUP BY doc_id
    """,
        # unigram LM surprisal: per-term weight quantized to integer
        # micros BEFORE the per-doc sum (float-order-proof); round()
        # half-away vs np.rint half-even only differ at an exact .5
        # boundary, which log10 of a rational hits with probability ~0
        "text_unigram_loglik": f"""
    WITH t AS (SELECT doc_id, {TOKS} AS l FROM documents),
    toks AS (SELECT doc_id, unnest(l) AS term FROM t),
    cf AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    w AS (SELECT term, CAST(round(log10(CAST(c AS DOUBLE)
              / CAST((SELECT sum(c) FROM cf) AS DOUBLE)) * 1000000) AS BIGINT) AS w6
          FROM cf)
    SELECT doc_id, count(*) AS n_tokens, CAST(sum(w6) AS BIGINT) AS sum_logprob_e6
    FROM toks JOIN w USING (term) GROUP BY doc_id
    """,
        "text_bpe_count": _bpe_count_oracle_sql(),
        # more-like-this: exact-int64 tf*idf_e3 weights; dot products and
        # squared norms are integer sums, cosine_e6 is one double op on
        # exact ints (sqrt of the int product) — same op order both sides
        "text_more_like_this": f"""
    WITH t AS (SELECT doc_id, {TOKS} AS l FROM documents),
    toks AS (SELECT doc_id, unnest(l) AS term FROM t),
    tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM toks),
    dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    w AS MATERIALIZED (
      SELECT doc_id, term,
             tf * CAST(round(log10(CAST((SELECT n FROM nd) AS DOUBLE) / df) * 1000) AS BIGINT) AS w
      FROM tf JOIN dfx USING (term)),
    norm AS (SELECT doc_id, CAST(sum(w*w) AS BIGINT) AS n2 FROM w GROUP BY doc_id),
    seeds AS (SELECT doc_id AS seed_id FROM norm ORDER BY doc_id LIMIT 8),
    sw AS (SELECT seeds.seed_id, w.term, w.w AS ws FROM w JOIN seeds ON w.doc_id = seeds.seed_id),
    dot AS (SELECT sw.seed_id, w.doc_id, CAST(sum(w.w * sw.ws) AS BIGINT) AS dot
            FROM w JOIN sw USING (term)
            WHERE w.doc_id <> sw.seed_id
            GROUP BY sw.seed_id, w.doc_id
            HAVING sum(w.w * sw.ws) <> 0),
    cos AS (SELECT seed_id, dot.doc_id,
            CAST(round(CAST(dot AS DOUBLE)
                 / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) * 1000000) AS BIGINT) AS cosine_e6
            FROM dot JOIN norm na ON na.doc_id = dot.seed_id
                     JOIN norm nb ON nb.doc_id = dot.doc_id)
    SELECT seed_id, doc_id, cosine_e6 FROM cos
    QUALIFY row_number() OVER (PARTITION BY seed_id ORDER BY cosine_e6 DESC, doc_id) <= 5
    """,
        # sequence packing: per-doc token count (+1 EOS), running-sum
        # global offset in doc_id order, each doc expanded to the chunks
        # [s/L .. (s+n-1)/L] it intersects via unnest(generate_series)
        "text_pack_sequences": f"""
    WITH t AS (SELECT doc_id, CAST(len({TOKS}) + 1 AS BIGINT) AS n FROM documents),
    ord AS (SELECT doc_id, n,
            CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
            FROM t),
    sp AS (SELECT doc_id, s, n, s // 256 AS c0, (s + n - 1) // 256 AS c1 FROM ord),
    g AS (SELECT doc_id, s, n,
                 c0 + unnest(generate_series(0, c1 - c0)) AS chunk_id
          FROM sp)
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(greatest(chunk_id * 256, s) - chunk_id * 256 AS BIGINT) AS chunk_pos,
           CAST(least((chunk_id + 1) * 256, s + n) - greatest(chunk_id * 256, s) AS BIGINT) AS n_tok
    FROM g
    """,
        "media_features": _media_features_oracle_sql(),
        "media_frames": _media_frames_oracle_sql(),
        # char-32-gram substring dedup: the SQL twin enumerates every
        # window via unnest(range(...)) + substring (codepoint-indexed,
        # same as the UTF-32 window kernel); a doc's distinct gram is
        # "duplicated" iff it occurs in >= 2 distinct docs
        "dedup_substring": """
            WITH pos AS (SELECT doc_id, text,
                                unnest(range(1, greatest(len(text) - 31, 0) + 1)) AS i
                         FROM documents),
            g AS (SELECT doc_id, substring(text, CAST(i AS INT), 32) AS gram FROM pos),
            gd AS (SELECT doc_id, gram, count(*) AS n_occ FROM g GROUP BY doc_id, gram),
            nd AS (SELECT gram, count(*) AS n_docs FROM gd GROUP BY gram)
            SELECT doc_id, CAST(sum(n_occ) AS BIGINT) AS n_grams,
                   CAST(count(*) AS BIGINT) AS n_distinct_grams,
                   CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams
            FROM gd JOIN nd USING (gram) GROUP BY doc_id
        """,
        "dedup_exact": (
            "SELECT md5(text) AS text_md5, min(doc_id) AS canonical_doc_id, "
            "count(*) AS n_copies FROM documents GROUP BY md5(text)"
        ),
        # per-doc duplicate-shingle coverage; same 3-gram shingle CTE
        # as text_decontaminate; docs with < 3 tokens emit no shingles
        "dedup_shingle_coverage": f"""
            WITH toksl AS (SELECT doc_id, {TOKS} AS t FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                          unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                 i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS shingle
                   FROM toksl WHERE len(t) >= 3),
            df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
            SELECT doc_id, count(*) AS n_shingles,
                   CAST(coalesce(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_shared,
                   CAST(1000000 * coalesce(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END), 0)
                        // count(*) AS BIGINT) AS shared_e6
            FROM sh JOIN df USING (shingle) GROUP BY doc_id
        """,
        # per-source exact-dup rate: keep-first by doc_id within a hash
        "dedup_source_report": """
            WITH r AS (SELECT source,
                              row_number() OVER (PARTITION BY md5(text)
                                                 ORDER BY doc_id) AS rn
                       FROM documents)
            SELECT source, count(*) AS n_docs,
                   CAST(coalesce(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dups
            FROM r GROUP BY source
        """,
        # winnowing: 16-char-gram md5-hash64 sequence, sliding 8-window
        # minima (full windows only), DISTINCT per doc, pair join
        "dedup_winnowing": """
            WITH pos AS (SELECT doc_id, text,
                                unnest(range(1, greatest(len(text) - 15, 0) + 1)) AS i
                         FROM documents),
            g AS (SELECT doc_id, i,
                         CAST(('0x' || substr(md5(substring(text, CAST(i AS INT), 16)), 1, 16))::UBIGINT
                              & 9223372036854775807::UBIGINT AS BIGINT) AS h
                  FROM pos),
            w AS (SELECT doc_id,
                         min(h) OVER (PARTITION BY doc_id ORDER BY i
                                      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS mn,
                         count(*) OVER (PARTITION BY doc_id ORDER BY i
                                        ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS cnt
                  FROM g),
            fp AS (SELECT DISTINCT doc_id, mn AS fp FROM w WHERE cnt = 8)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS n_shared_fps
            FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2
        """,
        "dedup_exact_losers": _dedup_losers_oracle_sql(),
        "dedup_ngram_jaccard": jaccard,
        # sketch quality eval: chain the exact-Jaccard and the
        # embedded-signature MinHash oracles, LEFT JOIN on the pair
        "dedup_minhash_eval": f"""
    WITH x AS ({jaccard}),
    s AS ({_sketch_oracle_sqls(est_threshold=0.97)["dedup_minhash_lsh"]})
    SELECT x.doc_a, x.doc_b, x.jaccard, s.doc_a IS NOT NULL AS found
    FROM x LEFT JOIN s ON s.doc_a = x.doc_a AND s.doc_b = x.doc_b
    """,
        "dedup_cluster_components": dup_cluster_sql,
        "dedup_cluster_cap": cluster_cap_sql,
        "text_decontaminate": decontaminate,
        "pipeline_data_prep": data_prep,
        "pipeline_data_prep_v2": data_prep_v2,
        **_sketch_oracle_sqls(),
        "knn_lsh_topk": _lsh_knn_oracle_sql(),
        "knn_lsh_recall": f"""
    WITH e AS ({knn}),
    a AS ({_lsh_knn_oracle_sql()})
    SELECT e.query_id, count(a.vec_id) AS n_hits,
           CAST({KNN_K} AS BIGINT) AS k
    FROM e LEFT JOIN a USING (query_id, vec_id)
    GROUP BY e.query_id
    """,
        "knn_matryoshka_recall": f"""
    WITH e AS ({knn}),
    a AS ({knn_matryoshka})
    SELECT e.query_id, count(a.vec_id) AS n_hits,
           CAST({KNN_K} AS BIGINT) AS k
    FROM e LEFT JOIN a USING (query_id, vec_id)
    GROUP BY e.query_id
    """,
        "knn_ivf_topk": _ivf_knn_oracle_sql(),
        "knn_pq_topk": _pq_oracle_sql(),
        "knn_ivfpq_topk": _ivfpq_oracle_sql(),
        "knn_kmeans_assign": _kmeans_oracle_sql(k=8, iters=3),
        "dedup_semantic": _semantic_dedup_oracle_sql(k=8, iters=3, threshold=0.42),
        "text_cluster_topics": _topic_cluster_oracle_sql(k=4, iters=2, dim=8),
        "media_phash_dups": _phash_dups_oracle_sql(),
        "media_thumbs": _thumbs_oracle_sql(),
        "media_image_stats": _image_stats_oracle_sql(),
        "media_scene_cuts": _scene_cuts_oracle_sql(),
        "media_audio_segments": _audio_segments_oracle_sql(),
        "media_audio_resample": _audio_resample_oracle_sql(),
        "media_audio_dups": _afp_dups_oracle_sql(),
        "media_video_dups": _vhash_dups_oracle_sql(),
        "crawl_lang_gate": _lang_gate_oracle_sql(),
        "crawl_host_stats": _host_stats_oracle_sql(),
        "crawl_host_latest": _host_latest_oracle_sql(),
        "crawl_reciprocal_links": _reciprocal_links_oracle_sql(),
        "crawl_cocitation": _cocitation_oracle_sql(),
        "crawl_link_jaccard": _link_jaccard_oracle_sql(),
        "crawl_bib_coupling": _bib_coupling_oracle_sql(),
        "crawl_host_graph": _host_graph_oracle_sql(),
        "crawl_inlink_concentration": _inlink_concentration_oracle_sql(),
        "crawl_components": crawl_components_sql,
        "crawl_label_prop": crawl_label_prop_sql,
        "crawl_modularity": crawl_modularity_sql,
        "crawl_triangles": crawl_triangles_sql,
        "crawl_edge_support": crawl_edge_support_sql,
        "crawl_ktruss": crawl_ktruss_sql,
        "crawl_assortativity": crawl_assortativity_sql,
        "crawl_kcore": crawl_kcore_sql,
        "crawl_path_depth": crawl_path_depth_sql,
        "crawl_degree_dist": _degree_dist_oracle_sql(),
        "crawl_orphans": _orphans_oracle_sql(),
        "search_term_complete": _term_complete_oracle_sql(),
        "crawl_links": _crawl_links_oracle_sql(),
        "crawl_anchor_terms": _anchor_terms_oracle_sql(),
        "crawl_pagerank": _pagerank_oracle_sql(),
        "crawl_ppr": _ppr_oracle_sql(),
        "crawl_hits": _hits_oracle_sql(),
        "crawl_salsa": _salsa_oracle_sql(),
        "search_bm25_title": _title_boost_oracle_sql(),
        "search_bm25_anchor": _anchor_boost_oracle_sql(),
        "search_bm25_anchor_field": _anchor_field_oracle_sql(),
        "search_bm25f_all_fields": _bm25f_all_fields_oracle_sql(),
        "search_boolean_not": _boolean_not_oracle_sql(),
        "search_site_filter": _flagship_oracle_sql("bm25", variant="site"),
        "search_intitle": _intitle_oracle_sql(),
        "search_prf_expand": _prf_oracle_sql(),
        "search_bm25_parallel": _flagship_oracle_sql("bm25"),
        "search_didyoumean": _didyoumean_oracle_sql(),
        "crawl_robots_gate": _robots_gate_oracle_sql(),
        "search_wildcard": _wildcard_oracle_sql(),
        "search_fuzzy": _fuzzy_search_oracle_sql(),
        # earliest-feasible politeness plan: rank within host by url
        "crawl_politeness_slots": f"""
            SELECT url,
                   lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/:?#]+)', 1)) AS host,
                   CAST(row_number() OVER (
                     PARTITION BY lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/:?#]+)', 1))
                     ORDER BY url) - 1 AS BIGINT) AS slot,
                   CAST(row_number() OVER (
                     PARTITION BY lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/:?#]+)', 1))
                     ORDER BY url) - 1 AS BIGINT) AS fetch_at_s
            FROM read_parquet('{_pages_path_for_oracle()}')
        """,
        # the reference index-table acc format re-derived from the
        # canonical tokenization: same doc_id-ascending posting order
        "index_export_acc": f"""{_docs_cte()},
    toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM docs),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term)
    SELECT term,
           string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
                      ',' ORDER BY doc_id) AS acc
    FROM tf GROUP BY term
    """,
        # export -> import round trip: per-term stats must equal the
        # tokenization-derived truth
        "index_import_stats": f"""{_docs_cte()},
    toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM docs),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term)
    SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf,
           CAST(max(tf) AS BIGINT) AS max_tf
    FROM tf GROUP BY term
    """,
        # compaction is physical: the compacted shards' stats must
        # equal the tokenization-derived truth
        "index_compact_stats": f"""{_docs_cte()},
    toks AS (SELECT doc_id, unnest({TOKS}) AS term FROM docs),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term)
    SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
    FROM tf GROUP BY term
    """,
        "search_bm25_scatter": _flagship_oracle_sql("bm25"),
        "crawl_frontier_bfs": _frontier_bfs_oracle_sql(),
        "crawl_closeness": _closeness_oracle_sql(),
        "crawl_bowtie": _bowtie_oracle_sql(),
        "knn_cosine_topk": knn,
        "knn_matryoshka_topk": knn_matryoshka,
        "knn_filtered_topk": knn_filtered,
        "rel_basket_pairs": """
            WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
                   count(*) AS n_groups
            FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            ORDER BY n_groups DESC, item_a, item_b
            LIMIT 20
        """,
        "embedding_centroids": embedding_centroids,
        "knn_mutual_pairs": """
            WITH s AS (SELECT a.vec_id AS qa, b.vec_id AS vb,
                              CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                                CAST(b.embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS c
                       FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
            topk AS (SELECT qa, vb, c FROM s
                     QUALIFY row_number() OVER (PARTITION BY qa ORDER BY c DESC, vb) <= 5)
            SELECT t1.qa AS vec_a, t1.vb AS vec_b, t1.c AS cosine_e6
            FROM topk t1 JOIN topk t2 ON t1.qa = t2.vb AND t1.vb = t2.qa
            WHERE t1.qa < t1.vb
        """,
        "embedding_dim_stats": """
            WITH x AS (SELECT CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS v,
                              generate_subscripts(embedding, 1) AS d
                       FROM embeddings)
            SELECT CAST(d - 1 AS BIGINT) AS dim, count(*) AS n,
                   CAST(sum(v) AS BIGINT) AS sum_e6,
                   CAST(sum(v * v) AS BIGINT) AS sumsq_e12
            FROM x GROUP BY d
        """,
        "knn_range_search": f"""
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < {KNN_QUERIES}),
    s AS (SELECT q.query_id, e.vec_id,
                 CAST(round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                   CAST(e.embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS cosine_e6
          FROM q CROSS JOIN embeddings e)
    SELECT query_id, vec_id, cosine_e6 FROM s WHERE cosine_e6 >= 300000
    """,
        "embedding_near_dups": _near_dups_oracle_sql(),
        "rel_groupby_agg": (
            "SELECT l_returnflag, l_linestatus, count(*) AS n_rows, "
            "CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_e2, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_e2 "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "rel_broadcast_join_agg": (
            "SELECT c_mktsegment, count(*) AS n_orders, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_e2 "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment"
        ),
        "rel_distinct": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
        # deterministic ordered string_agg (grouped_string_agg twin)
        "rel_string_agg": """
    SELECT n_name,
           string_agg(s_name, ',' ORDER BY s_name) AS agg,
           CAST(count(*) AS BIGINT) AS n_values
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    GROUP BY n_name
    """,
        "rel_intersection": (
            "SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT' "
            "INTERSECT "
            "SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'"
        ),
        "rel_except": (
            "SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT' "
            "EXCEPT "
            "SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'"
        ),
        "rel_cogroup_counts": (
            "SELECT COALESCE(o.k, c.k) AS custkey, COALESCE(o.n, 0) AS n_orders, "
            "COALESCE(c.n, 0) AS n_customers FROM "
            "(SELECT o_custkey AS k, count(*) AS n FROM orders GROUP BY o_custkey) o "
            "FULL JOIN "
            "(SELECT c_custkey AS k, count(*) AS n FROM customer GROUP BY c_custkey) c "
            "ON o.k = c.k"
        ),
        "rel_window_hour": (
            "SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n_events, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_e2 "
            "FROM events GROUP BY event_type, date_trunc('hour', ts)"
        ),
        "rel_grouped_distinct": (
            "SELECT event_type, count(DISTINCT user_id) AS n_users "
            "FROM events GROUP BY event_type"
        ),
        "rel_funnel": """
    WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN s0 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > s0.t0 GROUP BY e.user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY e.user_id)
    SELECT CAST(step_idx AS BIGINT) AS step_idx, step,
           CAST(n_users AS BIGINT) AS n_users
    FROM (VALUES (0, 'view', (SELECT count(*) FROM s0)),
                 (1, 'click', (SELECT count(*) FROM s1)),
                 (2, 'purchase', (SELECT count(*) FROM s2))) AS v(step_idx, step, n_users)
    """,
        "rel_stream_window": """
    WITH w AS (SELECT ts, epoch_us(ts) AS us,
                      max(epoch_us(ts)) OVER (
                        ORDER BY epoch_us(ts)
                          + (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 16))::UBIGINT
                                  & 9223372036854775807 AS BIGINT) % 14400000000::BIGINT),
                          event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hwm
               FROM events),
    f AS (SELECT (us // 3600000000::BIGINT) * 3600 AS window_start_s,
                 (hwm - us) > 3600000000::BIGINT AS late
          FROM w)
    SELECT window_start_s,
           CAST(count(*) FILTER (WHERE NOT late) AS BIGINT) AS n_on_time,
           CAST(count(*) FILTER (WHERE late) AS BIGINT) AS n_late
    FROM f GROUP BY window_start_s
    """,
        "rel_retention": """
    WITH act AS (SELECT DISTINCT user_id,
                        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
                 FROM events),
    f AS (SELECT user_id, min(d) AS d0 FROM act GROUP BY user_id)
    SELECT CAST(f.d0 AS BIGINT) AS cohort_day,
           CAST(act.d - f.d0 AS BIGINT) AS k,
           count(*) AS n_users
    FROM act JOIN f USING (user_id)
    WHERE act.d - f.d0 >= 1
    GROUP BY f.d0, act.d - f.d0
    """,
        "rel_grouped_mode": (
            "SELECT user_id, event_type, n_occ FROM ("
            "  SELECT user_id, event_type, count(*) AS n_occ,"
            "         row_number() OVER (PARTITION BY user_id"
            "                            ORDER BY count(*) DESC, event_type) AS rn"
            "  FROM events GROUP BY user_id, event_type) WHERE rn = 1"
        ),
        "text_quality_percentile": f"""
    WITH t AS (SELECT doc_id, lang, {TOKS} AS toks FROM documents),
    m AS (SELECT doc_id, lang, len(toks) AS n_tokens,
                 len(list_filter(toks, x -> list_contains({EN_SQL}, x))) AS en_hits
          FROM t),
    s AS (SELECT doc_id, lang,
                 (1000000 * en_hits) // n_tokens AS score_e6
          FROM m WHERE n_tokens > 0)
    SELECT doc_id, lang, score_e6,
           (10 * (rank() OVER (PARTITION BY lang ORDER BY score_e6) - 1))
             // count(*) OVER (PARTITION BY lang) AS decile
    FROM s
    """,
        "rel_topk_events": (
            "SELECT event_id, value FROM events ORDER BY value DESC, event_id LIMIT 100"
        ),
        "rel_fold": (
            "SELECT count(*) AS n_rows, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_e2 "
            "FROM lineitem"
        ),
        "rel_sample": (
            "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 = 0"
        ),
        "rel_sample_replace": _sample_replace_oracle_sql(),
        "rel_union_count": (
            "SELECT o_orderpriority, count(*) AS n FROM ("
            "SELECT o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT' "
            "UNION ALL "
            "SELECT o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'"
            ") GROUP BY o_orderpriority"
        ),
        "rel_shuffle_join_agg": (
            "SELECT o_orderpriority, count(*) AS n_items, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_e2 "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderpriority"
        ),
        # top-3 suppliers per nation by exact-cents balance
        "rel_supplier_rank": """
    SELECT n.n_name, s.s_suppkey,
           CAST(round(s.s_acctbal * 100) AS BIGINT) AS acctbal_e2
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    QUALIFY row_number() OVER (PARTITION BY n.n_name
                               ORDER BY s.s_acctbal DESC, s.s_suppkey) <= 3
    """,
        # TPC-H Q14 shape: promo revenue numerator/denominator
        "rel_promo_share": """
    SELECT CAST(sum(CASE WHEN p.p_type = 'ECONOMY'
                 THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                      * CAST(round((1 - l.l_discount) * 100) AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS promo_rev_e4,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * CAST(round((1 - l.l_discount) * 100) AS BIGINT))
                AS BIGINT) AS total_rev_e4
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-07-01'
    """,
        # TPC-H Q17 shape: revenue of lineitems below 20% of their
        # part's average quantity — 5*qty*cnt < sum_qty is the exact
        # integer form of qty < 0.2*(sum/cnt)
        "rel_small_qty_share": """
    WITH a AS (SELECT l_partkey,
                      CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq,
                      count(*) AS c
               FROM lineitem GROUP BY l_partkey)
    SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_e2,
           count(*) AS n_small,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) // 7 AS BIGINT) AS avg_yearly_e2
    FROM lineitem l JOIN a ON a.l_partkey = l.l_partkey
    WHERE 5 * CAST(round(l.l_quantity) AS BIGINT) * a.c < a.sq
    """,
        # TPC-H Q5 shape: local-supplier revenue per ASIA nation
        "rel_tpch_q3": """
            WITH li AS (SELECT l_orderkey,
                               CAST(round(l_extendedprice * 100) AS BIGINT)
                               * CAST(round((1 - l_discount) * 100) AS BIGINT) AS rev_e4
                        FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-07-01'),
            od AS (SELECT o_orderkey, epoch_us(o_orderdate) AS o_date_us, o_orderpriority
                   FROM orders JOIN customer ON c_custkey = o_custkey
                   WHERE c_mktsegment = 'BUILDING'
                     AND o_orderdate < TIMESTAMP '1998-07-01')
            SELECT li.l_orderkey AS orderkey,
                   CAST(sum(rev_e4) AS BIGINT) AS revenue_e4,
                   o_date_us, o_orderpriority
            FROM li JOIN od ON li.l_orderkey = od.o_orderkey
            GROUP BY 1, 3, 4
            ORDER BY revenue_e4 DESC, o_date_us, orderkey
            LIMIT 10
        """,
        "rel_tpch_q18": """
            WITH q AS (SELECT l_orderkey,
                              CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_e2
                       FROM lineitem GROUP BY l_orderkey
                       HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 30000)
            SELECT c.c_name, o.o_custkey, o.o_orderkey AS orderkey,
                   epoch_us(o.o_orderdate) AS o_date_us,
                   CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_e2,
                   q.sum_qty_e2
            FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
        """,
        "rel_star_q5": """
    SELECT n.n_name,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * CAST(round((1 - l.l_discount) * 100) AS BIGINT))
                AS BIGINT) AS revenue_e4
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
        # TPC-H Q3 shape: segment-filtered customers -> dated orders ->
        # shipped lineitems, exact integer cents*percent revenue, top 10
        "rel_star_topk": """
            WITH li AS (
              SELECT l_orderkey AS orderkey,
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round((1 - l_discount) * 100) AS BIGINT) AS rev_e4
              FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-06-01'
            ),
            od AS (
              SELECT o.o_orderkey AS orderkey,
                     CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_date_us
              FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
              WHERE c.c_mktsegment = 'BUILDING'
                AND o.o_orderdate < TIMESTAMP '1998-06-01'
            )
            SELECT li.orderkey, CAST(sum(li.rev_e4) AS BIGINT) AS revenue_e4,
                   min(od.o_date_us) AS o_date_us
            FROM li JOIN od USING (orderkey)
            GROUP BY li.orderkey
            ORDER BY revenue_e4 DESC, orderkey
            LIMIT 10
        """,
        # FULL OUTER JOIN with coalesced key and typed nulls on both
        # sides (Arrow coalesce_keys matches SQL COALESCE)
        "rel_outer_join": """
            SELECT COALESCE(c.c_custkey, o.o_custkey) AS c_custkey,
                   c.acctbal_e2, o.o_orderkey
            FROM (SELECT c_custkey,
                         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_e2
                  FROM customer WHERE c_acctbal >= 5000) c
            FULL OUTER JOIN
                 (SELECT o_custkey, o_orderkey FROM orders
                  WHERE o_orderpriority = '1-URGENT') o
            ON c.c_custkey = o.o_custkey
        """,
        "rel_left_join": """
            SELECT c.c_custkey, c.acctbal_e2, o.o_orderkey
            FROM (SELECT c_custkey,
                         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_e2
                  FROM customer WHERE c_acctbal >= 5000) c
            LEFT JOIN
                 (SELECT o_custkey, o_orderkey FROM orders
                  WHERE o_orderpriority = '1-URGENT') o
            ON c.c_custkey = o.o_custkey
        """,
        # running SUM + LAG delta per user: values e2-quantized per ROW
        # before the window sum, so both sides accumulate exact int64
        "rel_running_total": """
            WITH q AS (SELECT event_id, user_id, ts,
                              CAST(round(value * 100) AS BIGINT) AS val_e2
                       FROM events)
            SELECT event_id, user_id, val_e2,
                   SUM(val_e2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS run_e2,
                   val_e2 - LAG(val_e2) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS delta_e2
            FROM q
        """,
        # same seeded md5-prefix hash64 priority, same (prio, doc_id)
        # total order — the permutation is replayed, not approximated
        "rel_epoch_shuffle": """
            SELECT doc_id,
                   CAST(row_number() OVER (
                     ORDER BY CAST(('0x' || substr(md5('epoch7:' || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                              & 9223372036854775807::UBIGINT AS BIGINT),
                              doc_id) - 1 AS BIGINT) AS pos
            FROM documents
        """,
        # daily new-vs-returning: first day per user, epoch-day ints
        "rel_new_vs_returning": """
            WITH e AS (SELECT user_id,
                              CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
                       FROM events),
            f AS (SELECT user_id, min(day) AS first_day FROM e GROUP BY user_id)
            SELECT day, count(*) AS n_events,
                   CAST(coalesce(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_new,
                   CAST(coalesce(sum(CASE WHEN day > first_day THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_returning
            FROM e JOIN f USING (user_id) GROUP BY day
        """,
        # RANGE frame: a pure ts condition, equal-ts peers all in
        "rel_range_window_sum": """
            SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS wsum_e2
            FROM events
        """,
        # watermark audit: same md5-prefix arrival permutation as
        # rel_epoch_shuffle; wm is NULL at the first arrival (not late)
        "rel_late_events": """
            WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS ts_us,
                              CAST(('0x' || substr(md5('arrival:' || CAST(event_id AS VARCHAR)), 1, 16))::UBIGINT
                                   & 9223372036854775807::UBIGINT AS BIGINT) AS prio
                       FROM events),
            r AS (SELECT event_type, ts_us,
                         max(ts_us) OVER (ORDER BY prio, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
                  FROM e)
            SELECT event_type, count(*) AS n_events,
                   CAST(coalesce(sum(CASE WHEN ts_us < wm - 1209600000000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_late
            FROM r GROUP BY event_type
        """,
        # exact ANALYZE statistics; doubles e2-quantized before
        # min/max/ndv on BOTH sides
        "rel_profile": """
            SELECT 'o_orderkey' AS col, count(*) AS n_rows,
                   count(*) - count(o_orderkey) AS n_nulls,
                   count(DISTINCT o_orderkey) AS ndv,
                   min(o_orderkey) AS min_int, max(o_orderkey) AS max_int,
                   CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
            FROM orders
            UNION ALL
            SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
                   count(DISTINCT o_custkey), min(o_custkey), max(o_custkey),
                   NULL, NULL
            FROM orders
            UNION ALL
            SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
                   count(DISTINCT CAST(round(o_totalprice * 100) AS BIGINT)),
                   min(CAST(round(o_totalprice * 100) AS BIGINT)),
                   max(CAST(round(o_totalprice * 100) AS BIGINT)), NULL, NULL
            FROM orders
            UNION ALL
            SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
                   count(DISTINCT o_orderpriority), NULL, NULL,
                   min(o_orderpriority), max(o_orderpriority)
            FROM orders
        """,
        # each event fans out to its k=2 overlapping windows; values
        # e2-quantized per row before the integer sum
        "rel_hopping_window": """
            WITH e AS (SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
                              CAST(round(value * 100) AS BIGINT) AS v
                       FROM events),
            w AS (SELECT (hr - k) * 3600 AS window_start_s, v
                  FROM e CROSS JOIN (SELECT unnest([0, 1]) AS k))
            SELECT window_start_s, count(*) AS n_events,
                   CAST(sum(v) AS BIGINT) AS sum_val_e2
            FROM w GROUP BY window_start_s
        """,
        # Bloom pruning is physical (false positives drop in the join);
        # the oracle is the plain inner join + aggregate
        "rel_bloom_join_agg": (
            "SELECT o_orderpriority, count(*) AS n_items, "
            "CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_e2 "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE o_orderstatus = 'F' GROUP BY o_orderpriority"
        ),
        # sequential Poisson sample: same md5-prefix hash64, same exact
        # integer-division priority, same (priority, doc_id) tie-break
        "rel_weighted_sample": """
            SELECT doc_id, source, n_chars FROM documents
            ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                          & 9223372036854775807::UBIGINT AS BIGINT) // n_chars,
                     doc_id
            LIMIT 50
        """,
        # the salted join must produce exactly the plain join's rows —
        # salting is physical routing, invisible in the result
        "rel_skew_join_agg": (
            "SELECT o_orderstatus, count(*) AS n_items, "
            "CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_e2 "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderstatus"
        ),
        # KMV estimator replayed exactly: same md5-prefix hash64, same
        # k-th-smallest threshold, same floor(x + 0.5) quantization
        # UNPIVOT/melt: four measures wide-to-long, exact e2 integers
        "rel_unpivot": """
    SELECT l_orderkey, l_linenumber, m.metric,
           CAST(round(CASE m.metric
                 WHEN 'l_quantity' THEN l_quantity
                 WHEN 'l_extendedprice' THEN l_extendedprice
                 WHEN 'l_discount' THEN l_discount
                 ELSE l_tax END * 100) AS BIGINT) AS value_e2
    FROM lineitem,
         (SELECT unnest(['l_quantity','l_extendedprice','l_discount','l_tax'])
            AS metric) m
    """,
        # HyperLogLog: md5 hash64 is SQL-native, so DuckDB re-derives
        # the full register table (bucket = h % 256, rho = leading
        # zeros of the remaining 55 bits + 1)
        "rel_hll_registers": """
    WITH h AS (SELECT DISTINCT
                 CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT
                      & 9223372036854775807::UBIGINT AS BIGINT) AS hv
               FROM events),
    parts AS (SELECT hv % 256 AS bucket, hv // 256 AS w FROM h),
    rho AS (SELECT bucket,
                   CASE WHEN w = 0 THEN 56
                        ELSE strpos(lpad(bin(w), 55, '0'), '1') END AS r
            FROM parts)
    SELECT bucket, CAST(max(r) AS BIGINT) AS max_rho
    FROM rho GROUP BY bucket
    """,
        "rel_approx_distinct_kmv": """
            WITH h AS (
              SELECT DISTINCT event_type,
                     CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT
                          & 9223372036854775807::UBIGINT AS BIGINT) AS hv
              FROM events),
            r AS (SELECT event_type, hv,
                         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
                  FROM h)
            SELECT event_type,
                   CAST(CASE WHEN max(rn) < 64 THEN max(rn)
                        ELSE floor(63.0 * 9223372036854775808.0
                                   / max(CASE WHEN rn = 64 THEN hv END) + 0.5)
                        END AS BIGINT) AS est_distinct
            FROM r GROUP BY event_type
        """,
        # KMV union algebra: the pairwise union estimated from the two
        # bottom-64 sketches alone (exact when both are unsaturated)
        "rel_kmv_union": """
            WITH h AS (
              SELECT DISTINCT event_type,
                     CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT
                          & 9223372036854775807::UBIGINT AS BIGINT) AS hv
              FROM events),
            r AS (SELECT event_type, hv,
                         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
                  FROM h),
            sk AS MATERIALIZED (SELECT event_type, hv FROM r WHERE rn <= 64),
            sz AS (SELECT event_type, count(*) AS n FROM sk GROUP BY event_type),
            tp AS (SELECT a.event_type AS ta, b.event_type AS tb
                   FROM sz a JOIN sz b ON a.event_type < b.event_type),
            mu AS (SELECT tp.ta, tp.tb, sk.hv FROM tp
                   JOIN sk ON sk.event_type = tp.ta OR sk.event_type = tp.tb
                   GROUP BY tp.ta, tp.tb, sk.hv),
            mr AS (SELECT ta, tb, hv,
                          row_number() OVER (PARTITION BY ta, tb ORDER BY hv) AS rn
                   FROM mu)
            SELECT mr.ta AS type_a, mr.tb AS type_b,
                   CAST(CASE WHEN sa.n < 64 AND sb.n < 64 THEN max(mr.rn)
                        ELSE floor(63.0 * 9223372036854775808.0
                                   / max(CASE WHEN mr.rn = 64 THEN mr.hv END) + 0.5)
                        END AS BIGINT) AS est_union
            FROM mr JOIN sz sa ON sa.event_type = mr.ta
                    JOIN sz sb ON sb.event_type = mr.tb
            GROUP BY mr.ta, mr.tb, sa.n, sb.n
        """,
        "rel_zip_with_index": (
            "SELECT event_id, "
            "CAST(row_number() OVER (ORDER BY ts, event_id) - 1 AS BIGINT) AS row_idx "
            "FROM events"
        ),
        # identical integer boundaries computed from SPLIT_FRACTIONS on
        # the Python side; same md5-prefix hash64 as stages.ops.hash_split
        "rel_hash_split": _hash_split_oracle_sql(),
        # Zipf rank-frequency of the corpus vocabulary
        "text_rank_frequency": f"""
    WITH toks AS (SELECT unnest({TOKS}) AS term FROM documents),
    cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term)
    SELECT CAST(row_number() OVER (ORDER BY cf DESC, term) AS BIGINT) AS rank,
           term, CAST(cf AS BIGINT) AS cf
    FROM cf
    """,
        # Pareto: users covering >= 80% of each type's exact total
        "rel_pareto_users": """
    WITH pu AS (SELECT event_type, user_id,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
                FROM events GROUP BY event_type, user_id),
    tot AS (SELECT event_type, sum(v) AS total FROM pu GROUP BY event_type),
    ranked AS (SELECT pu.event_type, pu.v, tot.total,
                      sum(pu.v) OVER (PARTITION BY pu.event_type
                                      ORDER BY pu.v DESC, pu.user_id) AS acc,
                      row_number() OVER (PARTITION BY pu.event_type
                                         ORDER BY pu.v DESC, pu.user_id) AS rn
               FROM pu JOIN tot USING (event_type)),
    hit AS (SELECT event_type, min(rn) AS k FROM ranked
            WHERE acc >= (total * 8 + 9) // 10 GROUP BY event_type),
    nu AS (SELECT event_type, count(*) AS n_users FROM pu GROUP BY event_type)
    SELECT tot.event_type,
           CAST(COALESCE(hit.k, nu.n_users) AS BIGINT) AS users_for_80pct,
           CAST(tot.total AS BIGINT) AS total_e2
    FROM tot JOIN nu USING (event_type)
    LEFT JOIN hit USING (event_type)
    """,
        # last-touch attribution: latest preceding non-purchase type
        "rel_attribution": """
    WITH ordered AS (
      SELECT user_id, event_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_touch
      FROM events)
    SELECT COALESCE(prev_touch, 'none') AS credited_type, count(*) AS n
    FROM ordered WHERE event_type = 'purchase'
    GROUP BY COALESCE(prev_touch, 'none')
    """,
        # Benford first-digit distribution of exact integer cents
        "rel_benford": """
    WITH v AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
               FROM events)
    SELECT event_type,
           CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit,
           count(*) AS n
    FROM v WHERE v > 0
    GROUP BY event_type, digit
    """,
        # debounce: LAG semantics per (user, type), 1-day gap
        "rel_debounce": """
    SELECT event_id, user_id, event_type, ts FROM (
      SELECT event_id, user_id, event_type, ts,
             lag(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS pts
      FROM events)
    WHERE pts IS NULL OR ts - pts > INTERVAL 1 DAY
    """,
        # grouped Pearson correlation: exact HUGEINT moment sums, one
        # identical IEEE expression at the end (matches grouped_corr)
        "rel_corr": """
    WITH q AS (SELECT l_returnflag, l_linestatus,
                      CAST(floor(l_quantity) AS HUGEINT) AS x,
                      CAST(floor(l_extendedprice) AS HUGEINT) AS y
               FROM lineitem),
    s AS (SELECT l_returnflag, l_linestatus,
                 CAST(count(*) AS HUGEINT) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(y * y) AS syy,
                 sum(x * y) AS sxy
          FROM q GROUP BY l_returnflag, l_linestatus),
    d AS (SELECT l_returnflag, l_linestatus, n,
                 n * sxy - sx * sy AS num,
                 n * sxx - sx * sx AS d1,
                 n * syy - sy * sy AS d2
          FROM s)
    SELECT l_returnflag, l_linestatus, CAST(n AS BIGINT) AS n_rows,
           CAST(floor(1000000.0 * CAST(num AS DOUBLE)
                      / (sqrt(CAST(d1 AS DOUBLE)) * sqrt(CAST(d2 AS DOUBLE))))
                AS BIGINT) AS corr_e6
    FROM d WHERE d1 > 0 AND d2 > 0
    """,
        # per-group OLS fit: exact HUGEINT floor-division micros
        # (the (a - ((a%b)+b)%b) // b emulation — SQL // truncates,
        # the engine's Python // floors)
        "rel_linfit": """
    WITH q AS (SELECT l_returnflag, l_linestatus,
                      CAST(floor(l_quantity) AS HUGEINT) AS x,
                      CAST(floor(l_extendedprice) AS HUGEINT) AS y
               FROM lineitem),
    s AS (SELECT l_returnflag, l_linestatus,
                 CAST(count(*) AS HUGEINT) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(x * y) AS sxy
          FROM q GROUP BY l_returnflag, l_linestatus),
    d AS (SELECT l_returnflag, l_linestatus, n, sx, sy,
                 n * sxy - sx * sy AS num,
                 n * sxx - sx * sx AS d1
          FROM s),
    e AS (SELECT l_returnflag, l_linestatus, n, d1,
                 1000000 * num AS a1,
                 1000000 * (sy * d1 - num * sx) AS a2,
                 n * d1 AS b2
          FROM d WHERE d1 > 0)
    SELECT l_returnflag, l_linestatus, CAST(n AS BIGINT) AS n_rows,
           CAST((a1 - ((a1 % d1) + d1) % d1) // d1 AS BIGINT) AS slope_e6,
           CAST((a2 - ((a2 % b2) + b2) % b2) // b2 AS BIGINT) AS intercept_e6
    FROM e
    """,
        # Spearman: Pearson on doubled average ranks (exact integers
        # even under ties; the x2 scaling cancels exactly, incl. the
        # final IEEE expression — sqrt(4d) = 2*sqrt(d) is exact)
        "rel_spearman": """
    WITH q AS (SELECT l_returnflag AS g,
                      CAST(floor(l_quantity) AS BIGINT) AS x,
                      CAST(floor(l_extendedprice) AS BIGINT) AS y
               FROM lineitem),
    r AS (SELECT g,
                 CAST(2 * rank() OVER (PARTITION BY g ORDER BY x)
                      + count(*) OVER (PARTITION BY g, x) - 1 AS HUGEINT) AS rx,
                 CAST(2 * rank() OVER (PARTITION BY g ORDER BY y)
                      + count(*) OVER (PARTITION BY g, y) - 1 AS HUGEINT) AS ry
          FROM q),
    s AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
                 sum(rx) AS sx, sum(ry) AS sy,
                 sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
                 sum(rx * ry) AS sxy
          FROM r GROUP BY g),
    d AS (SELECT g, n,
                 n * sxy - sx * sy AS num,
                 n * sxx - sx * sx AS d1,
                 n * syy - sy * sy AS d2
          FROM s)
    SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n_rows,
           CAST(floor(1000000.0 * CAST(num AS DOUBLE)
                      / (sqrt(CAST(d1 AS DOUBLE)) * sqrt(CAST(d2 AS DOUBLE))))
                AS BIGINT) AS spearman_e6
    FROM d WHERE d1 > 0 AND d2 > 0
    """,
        # Welch t per event_type between user_id-parity variants — the
        # exact-moment / one-IEEE-expression discipline of rel_corr
        "rel_ab_test": """
    WITH q AS (SELECT event_type, user_id % 2 AS variant,
                      CAST(floor(value) AS BIGINT) AS x
               FROM events),
    s AS (SELECT event_type, variant, CAST(count(*) AS BIGINT) AS n,
                 sum(x) AS sx, sum(x * x) AS sxx
          FROM q GROUP BY event_type, variant),
    w AS (SELECT a.event_type,
                 b.n AS n0, b.sx AS s0, b.n * b.sxx - b.sx * b.sx AS d0,
                 a.n AS n1, a.sx AS s1, a.n * a.sxx - a.sx * a.sx AS d1
          FROM s a JOIN s b ON a.event_type = b.event_type
          WHERE a.variant = 1 AND b.variant = 0)
    SELECT event_type, CAST(n0 AS BIGINT) AS n_a, CAST(n1 AS BIGINT) AS n_b,
           CAST(floor(1000000.0 * (
                 (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                 / sqrt(CAST(d1 AS DOUBLE) / CAST(n1 * n1 * (n1 - 1) AS DOUBLE)
                        + CAST(d0 AS DOUBLE) / CAST(n0 * n0 * (n0 - 1) AS DOUBLE))))
                AS BIGINT) AS t_e6
    FROM w WHERE n0 >= 2 AND n1 >= 2 AND d0 > 0 AND d1 > 0
    """,
        # two-sample Kolmogorov-Smirnov per event_type: sup |n_b*cumA -
        # n_a*cumB| over the distinct-value histogram — exact integers,
        # one window cumsum, one floor division to micros
        "rel_ks_test": """
    WITH q AS (SELECT event_type, user_id % 2 AS variant,
                      CAST(floor(value) AS BIGINT) AS x
               FROM events),
    h AS (SELECT event_type, x,
                 CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS a,
                 CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS b
          FROM q GROUP BY event_type, x),
    n AS (SELECT event_type, sum(a) AS na, sum(b) AS nb
          FROM h GROUP BY event_type),
    c AS (SELECT event_type, x,
                 sum(a) OVER (PARTITION BY event_type ORDER BY x) AS ca,
                 sum(b) OVER (PARTITION BY event_type ORDER BY x) AS cb
          FROM h)
    SELECT c.event_type,
           CAST(n.na AS BIGINT) AS n_a, CAST(n.nb AS BIGINT) AS n_b,
           CAST((1000000 * max(abs(n.nb * c.ca - n.na * c.cb)))
                // (n.na * n.nb) AS BIGINT) AS ks_e6
    FROM c JOIN n ON n.event_type = c.event_type
    WHERE n.na > 0 AND n.nb > 0
    GROUP BY c.event_type, n.na, n.nb
    """,
        # Mann-Whitney U per event_type: doubled U (half-ties exact)
        # from the same histogram; tie-corrected z is the ONE float
        # expression, operand-for-operand the engine's
        # (stages/ops.grouped_mannwhitney)
        "rel_mannwhitney": """
    WITH q AS (SELECT event_type, user_id % 2 AS variant,
                      CAST(floor(value) AS BIGINT) AS x
               FROM events),
    h AS (SELECT event_type, x,
                 CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS a,
                 CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS b
          FROM q GROUP BY event_type, x),
    n AS (SELECT event_type, sum(a) AS na, sum(b) AS nb
          FROM h GROUP BY event_type),
    c AS (SELECT event_type, x, a, b,
                 COALESCE(sum(a) OVER (PARTITION BY event_type ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ca_lt
          FROM h),
    u AS (SELECT event_type,
                 sum(b * (2 * ca_lt + a)) AS u2,
                 sum((a + b) * (a + b) * (a + b) - (a + b)) AS t3
          FROM c GROUP BY event_type),
    f AS (SELECT n.event_type, n.na, n.nb, u.u2,
                 u.u2 - n.na * n.nb AS num,
                 n.na * n.nb * ((n.na + n.nb + 1) * (n.na + n.nb)
                                * (n.na + n.nb - 1) - u.t3) AS sa,
                 12 * (n.na + n.nb) * (n.na + n.nb - 1) AS sb
          FROM n JOIN u ON u.event_type = n.event_type
          WHERE n.na > 0 AND n.nb > 0)
    SELECT event_type, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(u2 AS BIGINT) AS u2,
           CAST(floor(1000000.0 * (CAST(num AS DOUBLE)
                / (2.0 * sqrt(CAST(sa AS DOUBLE) / CAST(sb AS DOUBLE)))))
                AS BIGINT) AS z_e6
    FROM f WHERE sa > 0
    """,
        # chi-squared independence of event_type x hour-of-day: the
        # statistic is a SUM OF PER-CELL INTEGER FLOORS (order-
        # independent, unlike a float cell sum), zero cells included
        "rel_chi2": """
    WITH q AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS h FROM events),
    o AS (SELECT event_type, h, CAST(count(*) AS HUGEINT) AS n
          FROM q GROUP BY event_type, h),
    rr AS (SELECT event_type, sum(n) AS r FROM o GROUP BY event_type),
    cc AS (SELECT h, sum(n) AS c FROM o GROUP BY h),
    nn AS (SELECT sum(n) AS n FROM o),
    cells AS (SELECT rr.event_type, cc.h, COALESCE(o.n, 0) AS obs, rr.r, cc.c
              FROM rr CROSS JOIN cc
              LEFT JOIN o ON o.event_type = rr.event_type AND o.h = cc.h),
    t AS (SELECT obs * (SELECT n FROM nn) - r * c AS d, r, c FROM cells)
    SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n_total,
           (SELECT CAST(count(*) AS BIGINT) FROM cells) AS n_cells,
           ((SELECT CAST(count(*) AS BIGINT) FROM rr) - 1)
             * ((SELECT CAST(count(*) AS BIGINT) FROM cc) - 1) AS dof,
           CAST(sum((1000000 * d * d)
                    // ((SELECT n FROM nn) * r * c)) AS BIGINT) AS chi2q_e6
    FROM t
    """,
        # Gini per event_type: S = sum(i*x) over ascending ranks
        # (row_number — tie order harmless, x constant within a tie),
        # exact HUGEINT floor micros
        "rel_gini": """
    WITH q AS (SELECT event_type, CAST(floor(value) AS HUGEINT) AS x
               FROM events),
    r AS (SELECT event_type, x,
                 CAST(row_number() OVER (PARTITION BY event_type ORDER BY x)
                      AS HUGEINT) AS i
          FROM q),
    s AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
                 sum(i * x) AS sr, sum(x) AS t
          FROM r GROUP BY event_type),
    f AS (SELECT event_type, n,
                 1000000 * (2 * sr - (n + 1) * t) AS a, n * t AS b
          FROM s WHERE t > 0)
    SELECT event_type, CAST(n AS BIGINT) AS n_rows,
           CAST((a - ((a % b) + b) % b) // b AS BIGINT) AS gini_e6
    FROM f
    """,
        # CUSUM change-point screen: max |m*S_i - i*n| over the ordered
        # daily-count series, earliest argmax day — exact integers
        # day-of-week seasonality: epoch-day + 4 mod 7 (0 = Sunday, no
        # timezone/locale dependence), all 7 dows per type zero-filled,
        # exact share micros
        "rel_seasonality": """
    WITH q AS (SELECT event_type,
                      (epoch_us(ts) // 86400000000 + 4) % 7 AS dow FROM events),
    o AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n
          FROM q GROUP BY event_type, dow),
    tt AS (SELECT event_type, sum(n) AS total FROM o GROUP BY event_type),
    dows(dow) AS (VALUES (0), (1), (2), (3), (4), (5), (6)),
    cells AS (SELECT tt.event_type, dows.dow, COALESCE(o.n, 0) AS n, tt.total
              FROM tt CROSS JOIN dows
              LEFT JOIN o ON o.event_type = tt.event_type AND o.dow = dows.dow)
    SELECT event_type, CAST(dow AS BIGINT) AS dow, CAST(n AS BIGINT) AS n,
           CAST((1000000 * n) // total AS BIGINT) AS share_e6
    FROM cells
    """,
        "rel_changepoint": """
    WITH q AS (SELECT event_type,
                      epoch_us(ts) // 86400000000 AS day FROM events),
    c AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS n
          FROM q GROUP BY event_type, day),
    w AS (SELECT event_type, day,
                 sum(n) OVER (PARTITION BY event_type ORDER BY day) AS s,
                 row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
                 sum(n) OVER (PARTITION BY event_type) AS tot,
                 count(*) OVER (PARTITION BY event_type) AS m
          FROM c),
    d AS (SELECT event_type, day, m, tot,
                 abs(m * s - i * tot) AS dev
          FROM w),
    b AS (SELECT event_type, day, dev, m, tot,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY dev DESC, day) AS rn
          FROM d)
    SELECT event_type, CAST(m AS BIGINT) AS n_days,
           CAST(tot AS BIGINT) AS n_events,
           CAST(dev AS BIGINT) AS cusum_max,
           CAST(day AS BIGINT) AS change_day
    FROM b WHERE rn = 1
    """,
        # top-10 session paths: the sessionize replay + per-session
        # ordered event-type join, truncated to 8 events
        "rel_session_paths": """
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
      SELECT user_id, ts, event_id, event_type,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered),
    paths AS (
      SELECT user_id, sid,
             array_to_string(
               list_slice(list(event_type ORDER BY ts, event_id), 1, 8),
               '>') AS path
      FROM tagged GROUP BY user_id, sid)
    SELECT path, count(*) AS n_sessions FROM paths GROUP BY path
    QUALIFY row_number() OVER (ORDER BY count(*) DESC, path) <= 10
    """,
        # lag-1 autocorrelation of the ordered daily-count series —
        # exact HUGEINT moments, one IEEE corr expression (rel_corr)
        "rel_autocorr": """
    WITH q AS (SELECT event_type,
                      epoch_us(ts) // 86400000000 AS day FROM events),
    c AS (SELECT event_type, day, CAST(count(*) AS HUGEINT) AS n
          FROM q GROUP BY event_type, day),
    p AS (SELECT event_type, n AS x,
                 lead(n) OVER (PARTITION BY event_type ORDER BY day) AS y
          FROM c),
    s AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(y * y) AS syy,
                 sum(x * y) AS sxy
          FROM p WHERE y IS NOT NULL GROUP BY event_type),
    d AS (SELECT event_type, n,
                 n * sxy - sx * sy AS num,
                 n * sxx - sx * sx AS d1,
                 n * syy - sy * sy AS d2
          FROM s WHERE n >= 2)
    SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
           CAST(floor(1000000.0 * CAST(num AS DOUBLE)
                      / (sqrt(CAST(d1 AS DOUBLE)) * sqrt(CAST(d2 AS DOUBLE))))
                AS BIGINT) AS autocorr_e6
    FROM d WHERE d1 > 0 AND d2 > 0
    """,
        # audience overlap per event-type pair
        "rel_audience_overlap": """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_users
    FROM ut a JOIN ut b ON a.user_id = b.user_id
                       AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    """,
        # association lift over distinct users: N * n_ab / (n_a * n_b),
        # exact integer floor micros
        "rel_lift": """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                 CAST(count(*) AS BIGINT) AS n_ab
          FROM ut a JOIN ut b ON a.user_id = b.user_id
                             AND a.event_type < b.event_type
          GROUP BY 1, 2),
    c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
          FROM ut GROUP BY event_type),
    nn AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events)
    SELECT p.type_a, p.type_b, p.n_ab, ca.n AS n_a, cb.n AS n_b,
           CAST((1000000 * (SELECT n FROM nn) * p.n_ab)
                // (ca.n * cb.n) AS BIGINT) AS lift_e6
    FROM p JOIN c ca ON ca.event_type = p.type_a
           JOIN c cb ON cb.event_type = p.type_b
    """,
        # Poisson rate z between the parity variants: exact counts, ONE
        # float expression mirrored operand-for-operand
        "rel_rate_test": """
    WITH q AS (SELECT event_type, user_id % 2 AS variant FROM events),
    c AS (SELECT event_type,
                 CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                 CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
          FROM q GROUP BY event_type)
    SELECT event_type, n0 AS n_a, n1 AS n_b,
           CAST(floor(1000000.0 * (CAST(n1 - n0 AS DOUBLE)
                / sqrt(CAST(n1 + n0 AS DOUBLE)))) AS BIGINT) AS z_e6
    FROM c WHERE n0 + n1 > 0
    """,
        # dense zero-filled hourly grid per type
        "rel_dense_hourly": """
    WITH h AS (SELECT event_type,
                 CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr
               FROM events),
    span AS (SELECT min(hr) AS lo, max(hr) AS hi FROM h),
    grid AS (SELECT t.event_type, g.hr
             FROM (SELECT DISTINCT event_type FROM events) t,
                  (SELECT unnest(range(span.lo, span.hi + 1)) AS hr
                   FROM span) g),
    cnt AS (SELECT event_type, hr, count(*) AS n FROM h GROUP BY 1, 2)
    SELECT grid.event_type, grid.hr, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n
    FROM grid LEFT JOIN cnt USING (event_type, hr)
    """,
        # gaps-and-islands: longest consecutive-day streak per user
        "rel_streak": """
    WITH days AS (SELECT DISTINCT user_id,
                    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
                  FROM events),
    grp AS (SELECT user_id, day,
                   day - row_number() OVER (PARTITION BY user_id
                                            ORDER BY day) AS island
            FROM days),
    runs AS (SELECT user_id, island, count(*) AS len
             FROM grp GROUP BY user_id, island)
    SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak
    FROM runs GROUP BY user_id
    """,
        # deterministic argmin/argmax per group (ties by event_id)
        "rel_arg_extremes": """
    WITH r AS (SELECT event_type, event_id,
                 CAST(round(value * 100) AS BIGINT) AS v,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS rmin,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id DESC) AS rmax
               FROM events)
    SELECT t.event_type,
           mn.event_id AS argmin_id, mn.v AS min_e2,
           mx.event_id AS argmax_id, mx.v AS max_e2
    FROM (SELECT DISTINCT event_type FROM events) t
    JOIN r mn ON mn.event_type = t.event_type AND mn.rmin = 1
    JOIN r mx ON mx.event_type = t.event_type AND mx.rmax = 1
    """,
        # integer-shift exponential decay: exact, order-independent
        "rel_decayed_sum": """
    WITH anchor AS (SELECT max(ts) AS mx FROM events)
    SELECT user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)
                    >> least(CAST(epoch_us(anchor.mx) - epoch_us(ts) AS BIGINT)
                             // 3600000000, 62)) AS BIGINT) AS decayed_sum
    FROM events, anchor
    GROUP BY user_id
    """,
        # per-user forward fill: error-event values repaired from the
        # last good reading, leading gaps stay NULL
        "rel_forward_fill": """
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type <> 'error'
                           THEN CAST(round(value * 100) AS BIGINT) END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_e2
    FROM events
    """,
        # log-binned histogram quantiles: exact-integer bins via bin()
        # string length, integer-ceil ranks, power-of-two lower bounds
        "rel_hist_quantiles": """
    WITH v AS (SELECT event_type,
                 GREATEST(CAST(round(value * 100) AS BIGINT), 0) AS v
               FROM events),
    b AS (SELECT event_type,
                 CASE WHEN v = 0 THEN 0 ELSE length(bin(v)) END AS bin
          FROM v),
    hist AS (SELECT event_type, bin, count(*) AS n FROM b GROUP BY 1, 2),
    tot AS (SELECT event_type, sum(n) AS n FROM hist GROUP BY 1),
    q(q_mille) AS (VALUES (500), (900), (990)),
    ranks AS (SELECT t.event_type, q.q_mille,
                     (q.q_mille * t.n + 999) // 1000 AS rnk
              FROM tot t, q),
    cum AS (SELECT event_type, bin,
                   sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS acc
            FROM hist),
    sel AS (SELECT r.event_type, r.q_mille, min(c.bin) AS bin
            FROM ranks r JOIN cum c ON c.event_type = r.event_type
                                   AND c.acc >= r.rnk
            GROUP BY r.event_type, r.q_mille)
    SELECT event_type, CAST(q_mille AS BIGINT) AS q_mille,
           CAST(CASE WHEN bin = 0 THEN 0
                     ELSE 1 << (bin - 1) END AS BIGINT) AS est_lower_e2
    FROM sel
    """,
        # NTILE quartiles per event_type (larger buckets first)
        "rel_ntile": """
    SELECT event_id, event_type,
           CAST(ntile(4) OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS BIGINT) AS tile
    FROM events
    """,
        # Markov transitions: LAG over each user's ordered stream
        "rel_event_transitions": """
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events)
    SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
    FROM ordered WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
        # Markov transition probabilities: the counts normalized per
        # from_type — positive-integer floor division, exact
        "rel_markov": """
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    tc AS (SELECT prev_type AS from_type, event_type AS to_type,
                  count(*) AS n
           FROM ordered WHERE prev_type IS NOT NULL
           GROUP BY prev_type, event_type),
    ft AS (SELECT from_type, sum(n) AS tot FROM tc GROUP BY from_type)
    SELECT tc.from_type, tc.to_type, CAST(tc.n AS BIGINT) AS n,
           CAST((1000000 * tc.n) // ft.tot AS BIGINT) AS p_e6
    FROM tc JOIN ft USING (from_type)
    """,
        "rel_sessionize": """
            WITH ordered AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            tagged AS (
              SELECT user_id, ts,
                     CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
                       AS session_seq
              FROM ordered
            )
            SELECT user_id, session_seq, count(*) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM tagged GROUP BY user_id, session_seq
        """,
        # bounce rate by session-start hour: the sessionize CTEs + a
        # 24-bounded rollup; integer-micros floor division
        "rel_bounce_rate": """
            WITH ordered AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            tagged AS (
              SELECT user_id, ts,
                     sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_seq
              FROM ordered
            ),
            sess AS (SELECT user_id, session_seq, count(*) AS n_events,
                            min(ts) AS session_start
                     FROM tagged GROUP BY user_id, session_seq)
            SELECT CAST(hour(session_start) AS BIGINT) AS hour,
                   count(*) AS n_sessions,
                   CAST(coalesce(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_bounces,
                   CAST(1000000 * coalesce(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END), 0)
                        // count(*) AS BIGINT) AS bounce_e6
            FROM sess GROUP BY hour(session_start)
        """,
        # SCD-2 intervals: run breaks at event_type change per user
        # (lag over the same total (ts, event_id) order as the engine's
        # bucket sort), run_id by running sum, valid_to = next run's
        # valid_from via lead() (NULL while current)
        "rel_scd2": """
            WITH e AS (
              SELECT user_id, event_type, ts, event_id,
                     CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            r AS (
              SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) - 1 AS version
              FROM e
            ),
            runs AS (
              SELECT user_id, CAST(version AS BIGINT) AS version,
                     min(event_type) AS event_type,
                     min(ts) AS valid_from, count(*) AS n_events
              FROM r GROUP BY user_id, version
            )
            SELECT user_id, version, event_type, valid_from,
                   coalesce(lead(valid_from) OVER (PARTITION BY user_id ORDER BY version),
                            TIMESTAMP '9999-12-31') AS valid_to,
                   n_events
            FROM runs
        """,
        "rel_anti_join": (
            "SELECT DISTINCT c_custkey FROM customer "
            "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders "
            "WHERE o_orderpriority = '1-URGENT')"
        ),
        "rel_semi_join": (
            "SELECT DISTINCT c_custkey FROM customer "
            "WHERE c_custkey IN (SELECT o_custkey FROM orders "
            "WHERE o_orderpriority = '1-URGENT')"
        ),
        "rel_topn_per_group": """
            SELECT event_type, event_id, value FROM (
              SELECT event_type, event_id, value,
                     row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY value DESC, event_id) AS rn
              FROM events) WHERE rn <= 3
        """,
        # same md5-prefix hash64 as functions/hashing.py, replayed in SQL
        "rel_group_sample": """
            SELECT event_type, event_id, value FROM (
              SELECT event_type, event_id, value,
                     row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 16))::UBIGINT
                                     & 9223372036854775807::UBIGINT AS BIGINT),
                                event_id) AS rn
              FROM events) WHERE rn <= 5
        """,
        "rel_rollup": """
            SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_e2
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        # conditional-aggregation pivot; the engine discovers the type
        # set distributively — the literal list here is the same
        # (deterministic) set, per-type rounding matches the engine's
        # per-ROW value quantization (round first, sum int64 after)
        "rel_pivot": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click')    AS n_click,
                   count(*) FILTER (event_type = 'error')    AS n_error,
                   count(*) FILTER (event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (event_type = 'signup')   AS n_signup,
                   count(*) FILTER (event_type = 'view')     AS n_view,
                   sum(CAST(round(value * 100) AS BIGINT))   AS value_sum_e2
            FROM events GROUP BY user_id
        """,
        "rel_cube": """
            SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_e2
            FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        "rel_moving_avg": """
            SELECT event_id, user_id,
                   CAST(round(avg(value) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 1000000)
                     AS BIGINT) AS ma3_e6
            FROM events
        """,
        "rel_grouping_sets": """
            SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_e2
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """,
        # broadcast dim join + the rel_quantiles quantize/disc rules
        "rel_segment_order_median": """
            SELECT c_mktsegment,
                   CAST(quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT), 0.5) AS BIGINT) AS p50_e2,
                   CAST(quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT), 0.9) AS BIGINT) AS p90_e2,
                   CAST(quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT), 0.99) AS BIGINT) AS p99_e2
            FROM orders JOIN customer ON c_custkey = o_custkey
            GROUP BY c_mktsegment
        """,
        # continuous quantiles: h = q*(n-1) is EXACT in double for
        # q in {.25,.5,.75} (binary-exact q times an integer), and the
        # interpolated value*1e4 is integral (2500*dv), so the float
        # round matches the kernel's exact-rational result
        "rel_quantiles_cont": """
            SELECT event_type,
                   CAST(round(quantile_cont(CAST(round(value * 100) AS BIGINT), 0.25) * 10000) AS BIGINT) AS p25_e6,
                   CAST(round(quantile_cont(CAST(round(value * 100) AS BIGINT), 0.50) * 10000) AS BIGINT) AS p50_e6,
                   CAST(round(quantile_cont(CAST(round(value * 100) AS BIGINT), 0.75) * 10000) AS BIGINT) AS p75_e6
            FROM events GROUP BY event_type
        """,
        # RFM: one grouped aggregate, then ntile(4) per dimension
        # (metric DESC, user_id tiebreak)
        "rel_rfm": """
            WITH a AS (SELECT user_id,
                              max(epoch_us(ts)) AS last_ts_us,
                              count(*) AS n_events,
                              sum(CAST(round(value * 100) AS BIGINT)) AS monetary_e2
                       FROM events GROUP BY user_id)
            SELECT user_id, last_ts_us, n_events, monetary_e2,
                   CAST(ntile(4) OVER (ORDER BY last_ts_us DESC, user_id) AS BIGINT) AS r_score,
                   CAST(ntile(4) OVER (ORDER BY n_events DESC, user_id) AS BIGINT) AS f_score,
                   CAST(ntile(4) OVER (ORDER BY monetary_e2 DESC, user_id) AS BIGINT) AS m_score
            FROM a
        """,
        # exact discrete quantiles; DuckDB's quantile_disc index rule is
        # max(0, ceil(q*n)-1) — the histogram kernel implements the same
        "rel_quantiles": """
            SELECT event_type,
                   CAST(quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5) AS BIGINT) AS p50_e2,
                   CAST(quantile_disc(CAST(round(value * 100) AS BIGINT), 0.9) AS BIGINT) AS p90_e2,
                   CAST(quantile_disc(CAST(round(value * 100) AS BIGINT), 0.99) AS BIGINT) AS p99_e2
            FROM events GROUP BY event_type
        """,
        # per-(user,type) inter-arrival gap quantiles: lag() over the
        # total (ts, event_id) order, floor-seconds, quantile_disc
        "rel_interarrival": """
            WITH g AS (SELECT event_type,
                              CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER
                                (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS BIGINT) AS d_us
                       FROM events)
            SELECT event_type, count(*) AS n_gaps,
                   CAST(quantile_disc(d_us // 1000000, 0.5) AS BIGINT) AS p50_s,
                   CAST(quantile_disc(d_us // 1000000, 0.9) AS BIGINT) AS p90_s
            FROM g WHERE d_us IS NOT NULL GROUP BY event_type
        """,
        # per-type 2-D skyline: NOT-EXISTS strict dominance under
        # (value max, ts min); exact (v, ts) ties are all kept
        "rel_skyline": """
            WITH e AS (SELECT event_id, event_type,
                              CAST(round(value * 100) AS BIGINT) AS vq, ts
                       FROM events)
            SELECT a.event_id, a.event_type, a.vq AS vq_e2, a.ts
            FROM e a WHERE NOT EXISTS (
              SELECT 1 FROM e b WHERE b.event_type = a.event_type
                AND b.vq >= a.vq AND b.ts <= a.ts
                AND (b.vq > a.vq OR b.ts < a.ts))
        """,
        # per-row percent_rank within event_type: rank() ties share the
        # minimum rank, integer-micros division matches Python //
        "rel_percentile_rank": """
            WITH v AS (SELECT event_id, event_type,
                              CAST(round(value * 100) AS BIGINT) AS vq FROM events),
            n AS (SELECT event_type, count(*) AS n FROM v GROUP BY event_type)
            SELECT v.event_id, v.event_type, v.vq AS vq_e2,
                   CAST(1000000 * (rank() OVER (PARTITION BY v.event_type ORDER BY v.vq) - 1)
                        // (n.n - 1) AS BIGINT) AS pr_e6
            FROM v JOIN n USING (event_type)
        """,
        # per-row cume_dist within event_type: inclusive peer count / n,
        # integer-micros floor division matches Python //
        "rel_cume_dist": """
            WITH v AS (SELECT event_id, event_type,
                              CAST(round(value * 100) AS BIGINT) AS vq FROM events),
            n AS (SELECT event_type, count(*) AS n FROM v GROUP BY event_type),
            le AS (SELECT event_id, event_type, vq,
                          count(*) OVER (PARTITION BY event_type ORDER BY vq
                            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_le
                   FROM v)
            SELECT le.event_id, le.event_type, le.vq AS vq_e2,
                   CAST(1000000 * le.n_le // n.n AS BIGINT) AS cd_e6
            FROM le JOIN n USING (event_type)
        """,
        # robust MAD outlier screen: same quantize + quantile_disc
        # (lower-median) rules as rel_quantiles, deviations folded
        # around the median, k=3
        "rel_mad_outliers": """
            WITH v AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS vq FROM events),
            med AS (SELECT event_type, quantile_disc(vq, 0.5) AS med
                    FROM v GROUP BY event_type),
            d AS (SELECT v.event_type, med.med, abs(v.vq - med.med) AS ad
                  FROM v JOIN med USING (event_type)),
            mad AS (SELECT event_type, quantile_disc(ad, 0.5) AS mad
                    FROM d GROUP BY event_type)
            SELECT d.event_type,
                   CAST(any_value(d.med) AS BIGINT) AS med_e2,
                   CAST(any_value(mad.mad) AS BIGINT) AS mad_e2,
                   count(*) AS n,
                   CAST(coalesce(sum(CASE WHEN d.ad > 3 * mad.mad THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_outliers
            FROM d JOIN mad USING (event_type)
            GROUP BY d.event_type
        """,
        # winsorized aggregate: same quantize + quantile_disc rules as
        # rel_quantiles, clip with least/greatest, exact int64 sum
        "rel_winsorized_agg": """
            WITH b AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS v FROM events),
            q AS (SELECT event_type,
                         quantile_disc(v, 0.05) AS lo,
                         quantile_disc(v, 0.95) AS hi
                  FROM b GROUP BY event_type)
            SELECT event_type, CAST(lo AS BIGINT) AS p5_e2,
                   CAST(hi AS BIGINT) AS p95_e2,
                   count(*) AS n_rows,
                   CAST(sum(least(greatest(v, lo), hi)) AS BIGINT) AS sum_clipped_e2
            FROM b JOIN q USING (event_type) GROUP BY event_type, lo, hi
        """,
        # as-of tie rule stated on both sides: a view at the identical
        # timestamp matches iff its event_id is smaller (event_id is
        # unique so the (ts, event_id) order is total)
        "rel_asof_join": """
            SELECT c.event_id AS event_id, c.user_id AS user_id, c.ts AS ts,
                   m.event_id AS view_event_id,
                   CAST(date_diff('microsecond', m.ts, c.ts) AS BIGINT) AS gap_us
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            LEFT JOIN LATERAL (
              SELECT v.event_id, v.ts
              FROM events v
              WHERE v.event_type = 'view' AND v.user_id = c.user_id
                AND (v.ts < c.ts OR (v.ts = c.ts AND v.event_id < c.event_id))
              ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
            ) m ON TRUE
        """,
        "rel_range_join_count": """
            SELECT a.event_id AS event_id, a.user_id AS user_id, a.ts AS ts,
                   (SELECT count(*) FROM events e
                    WHERE e.user_id = a.user_id
                      AND e.ts > a.ts
                      AND e.ts <= a.ts + INTERVAL 60 SECOND) AS n_follow
            FROM events a WHERE a.event_type = 'error'
        """,
    }
