#!/usr/bin/env python
"""``ray job submit`` entry point: run the training-data prep chain
(quality gate -> exact dedup -> benchmark decontamination -> optional
near-dup cluster cap) and write the CURATED CORPUS as partitioned
Parquet plus a per-language summary JSON.

    ray job submit --working-dir . -- \
        python jobs/data_prep.py --docs <documents.parquet> \
            --out <curated dir> [--near-dup-cap 2]

The benchmark set defaults to the first 20 docs by doc_id (the
decontamination convention of the registered ``pipeline_data_prep``
query); pass --benchmark <parquet> to decontaminate against a separate
eval corpus with (doc_id, text) columns.
"""

from __future__ import annotations

import argparse
import json

import os as _os
import sys as _sys

_repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _repo_root)
_os.environ["PYTHONPATH"] = _repo_root + _os.pathsep + _os.environ.get("PYTHONPATH", "")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="input documents parquet (doc_id, text)")
    ap.add_argument("--out", required=True, help="output directory for curated parquet")
    ap.add_argument("--benchmark", default=None, help="eval-set parquet to decontaminate against")
    ap.add_argument("--bench-docs", type=int, default=20, help="benchmark = first N docs by doc_id when --benchmark is not given")
    ap.add_argument("--min-hits", type=int, default=10)
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--near-dup-cap", type=int, default=None)
    ap.add_argument("--jaccard", type=float, default=0.5, help="near-dup n-gram Jaccard threshold")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.data_prep import (
        curated_docs,
    )
    import pyarrow.compute as pc

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
        doc_shingles,
    )

    docs = rd.read_parquet(args.docs, columns=["doc_id", "text"])
    if args.benchmark:
        bench_tbl = pq.read_table(args.benchmark, columns=["doc_id", "text"])
    else:
        bench_tbl = (
            pq.read_table(args.docs, columns=["doc_id", "text"])
            .sort_by("doc_id")
            .slice(0, args.bench_docs)
        )
    _up, sh = doc_shingles(bench_tbl["text"], n=args.ngram)
    shingles = pc.unique(sh)

    kept = curated_docs(
        docs,
        shingles,
        min_hits=args.min_hits,
        ngram=args.ngram,
        near_dup_cap=args.near_dup_cap,
        jaccard_threshold=args.jaccard,
    )
    kept.write_parquet(args.out)

    # per-language summary: a bounded groupby over the pruned re-read
    # of what was just written (also proves the output is readable)
    from ray.data.aggregate import Count, Sum

    rows = (
        rd.read_parquet(args.out, columns=["lang_pred", "n_tokens"])
        .groupby("lang_pred")
        .aggregate(Count(alias_name="n_docs"), Sum("n_tokens", alias_name="total_tokens"))
        .take_all()
    )
    out_summary = {
        r["lang_pred"]: {
            "n_docs": int(r["n_docs"]),
            "total_tokens": int(r["total_tokens"]),
        }
        for r in sorted(rows, key=lambda r: r["lang_pred"])
    }
    summary_path = _os.path.join(args.out, "summary.json")
    with open(summary_path, "w") as f:
        json.dump(out_summary, f, indent=2, sort_keys=True)
    print(json.dumps({"out": args.out, "summary": out_summary}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
