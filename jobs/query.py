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

# `python jobs/<name>.py` puts jobs/ (not the repo root) on sys.path;
# make the library importable without an install — and export it via
# PYTHONPATH so Ray WORKER processes (which do not inherit the
# driver's sys.path edits) can unpickle the stage classes too
import os as _os
import sys as _sys

_repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _repo_root)
_os.environ["PYTHONPATH"] = _repo_root + _os.pathsep + _os.environ.get("PYTHONPATH", "")



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
