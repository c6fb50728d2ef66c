#!/usr/bin/env python
"""Query CLI over a built index: BM25 (Block-Max WAND) or the pinned
reference tf-idf scorer.

    python jobs/query.py --index <dir> --query "some terms" [--k 10] \
        [--scorer bm25|reference] [--show-docs]

Serving needs no Ray session (shard reads are local parquet; a
multi-node serving tier would shard by ``hash64(term) % num_shards``).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--scorer", choices=["bm25", "reference"], default="bm25")
    ap.add_argument("--show-docs", action="store_true")
    args = ap.parse_args(argv)

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
        SearchIndex,
    )

    idx = SearchIndex.load(args.index)
    t0 = time.time()
    if args.show_docs:
        results = idx.search(args.query, args.k)
    elif args.scorer == "bm25":
        results = [{"doc_id": d, "rank_score": s} for d, s in idx.bm25_topk(args.query, args.k)]
    else:
        results = [
            {"doc_id": d, "rank_score": s} for d, s in idx.reference_topk(args.query, args.k)
        ]
    print(
        json.dumps(
            {"query": args.query, "latency_ms": round((time.time() - t0) * 1000, 2), "results": results},
            indent=2,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
