#!/usr/bin/env python
"""``ray job submit`` entry point: delete documents from an index
(tombstone path — recrawl removals, takedown/GDPR deletes).

    ray job submit --working-dir . -- \
        python jobs/delete_docs.py --base <existing index dir> \
            --out <new index dir> \
            (--urls url1 url2 ... | --urls-file <one url per line>)

Only terms that contained a deleted doc are re-encoded; everything
else passes through zero-copy (posting rows) or hard-linked (doc-store
files). The base index is never mutated.
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
    ap.add_argument("--base", required=True, help="existing index directory")
    ap.add_argument("--out", required=True, help="output index directory")
    ap.add_argument("--urls", nargs="*", default=[], help="urls to delete")
    ap.add_argument("--urls-file", help="file with one url per line")
    args = ap.parse_args(argv)

    urls = list(args.urls)
    if args.urls_file:
        with open(args.urls_file) as f:
            urls.extend(line.strip() for line in f if line.strip())
    if not urls:
        ap.error("no urls given (--urls or --urls-file)")

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.delete_index import (
        delete_from_index,
    )

    paths = delete_from_index(args.base, urls, args.out)
    print(json.dumps(json.load(open(paths.meta))))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
