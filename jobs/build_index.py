#!/usr/bin/env python
"""``ray job submit`` entry point: build the inverted index.

    ray job submit --working-dir . -- \
        python jobs/build_index.py --pages <pages.parquet|dir> --out <dir> \
            [--num-partitions 64] [--batch-size 256] [--num-shards 16] \
            [--num-salts 8] [--verify-extraction]

On a real cluster Ray is initialised by the job runtime (we only
``ray.init()`` when standalone). The build is resumable: re-submitting
the same job skips completed extraction partitions via their lineage
manifests (state/manifest.py) and idempotently rebuilds derived outputs.
"""

from __future__ import annotations

import argparse
import json
import sys

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
    ap.add_argument("--pages", required=True, help="input pages parquet file or directory")
    ap.add_argument("--out", required=True, help="index output directory")
    ap.add_argument(
        "--format",
        choices=["parquet", "warc"],
        default="parquet",
        help="input format: canonical pages parquet, or raw WARC "
        "file(s)/directory (staged into <out>/_staged_pages first — "
        "text extracted with the indexer's own pure function, lang "
        "derived by the stopword vote)",
    )
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--num-shards", type=int, default=16)
    ap.add_argument("--num-salts", type=int, default=8)
    ap.add_argument("--hot-df-threshold", type=int, default=None)
    ap.add_argument("--verify-extraction", action="store_true")
    ap.add_argument(
        "--audit-doc-ids",
        action="store_true",
        help="run the hash64(url) collision audit after the build "
        "(recommended at 10^9+ docs; a collision silently merges two "
        "documents' postings)",
    )
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
        build_index,
    )

    pages_in = args.pages
    if args.format == "warc":
        from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.warc import (
            stage_warc_pages,
        )

        pages_in = stage_warc_pages(
            args.pages, _os.path.join(args.out, "_staged_pages")
        )

    paths = build_index(
        pages_in,
        args.out,
        num_partitions=args.num_partitions,
        batch_size=args.batch_size,
        num_shards=args.num_shards,
        num_salts=args.num_salts,
        hot_df_threshold=args.hot_df_threshold,
        verify_extraction=args.verify_extraction,
    )
    meta_out = json.load(open(paths.meta))
    if args.audit_doc_ids:
        from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
            audit_doc_ids,
        )

        audit = audit_doc_ids(paths)
        meta_out["doc_id_audit"] = audit
        if audit["collisions"]:
            print(json.dumps(meta_out, indent=2))
            print(f"FATAL: {audit['collisions']} doc_id collisions", file=sys.stderr)
            ray.shutdown()
            return 1
    print(json.dumps(meta_out, indent=2))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
