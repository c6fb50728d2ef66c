#!/usr/bin/env python
"""``ray job submit`` entry point: incremental index update.

    ray job submit --working-dir . -- \
        python jobs/update_index.py --new-pages <pages.parquet|dir> \
            --base <existing index dir> --out <updated index dir> \
            [--num-partitions 4]

Runs a delta build over the new batch only (pages whose url or content
the base index already admitted are gated out — first-indexed wins),
then merges shards one Ray task each; terms on only one side pass
through zero-copy. The base index is never mutated.
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
    ap.add_argument("--new-pages", required=True, help="delta pages parquet file or dir")
    ap.add_argument("--base", required=True, help="existing index directory")
    ap.add_argument("--out", required=True, help="updated index output directory")
    ap.add_argument("--num-partitions", type=int, default=4)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.update_index import (
        update_index,
    )

    paths = update_index(
        args.new_pages, args.base, args.out, num_partitions=args.num_partitions
    )
    print(json.dumps(json.load(open(paths.meta))))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
