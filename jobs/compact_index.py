#!/usr/bin/env python
"""``ray job submit`` entry point: compact an index in place-of
(segment-merge maintenance after update/delete generations).

    ray job submit --working-dir . -- \
        python jobs/compact_index.py --base <existing index dir> \
            --out <new index dir>

Each shard directory is rewritten into ONE term-sorted file (posting
blobs byte-identical, scoring bit-identical); every non-shard artifact
is hard-linked, so the output is a complete, independently-servable
index. The base index is never mutated.
"""

from __future__ import annotations

import argparse
import glob
import json

import os as _os
import sys as _sys

_repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _repo_root)
_os.environ["PYTHONPATH"] = _repo_root + _os.pathsep + _os.environ.get("PYTHONPATH", "")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", required=True, help="existing index directory")
    ap.add_argument("--out", required=True, help="output index directory")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.compact_index import (
        compact_index,
    )

    out = compact_index(args.base, args.out)
    n_files_before = len(glob.glob(args.base + "/shards/shard=*/*.parquet"))
    n_files_after = len(glob.glob(args.out + "/shards/shard=*/*.parquet"))
    print(
        json.dumps(
            {
                "out_dir": out.out_dir,
                "shard_files_before": n_files_before,
                "shard_files_after": n_files_after,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
