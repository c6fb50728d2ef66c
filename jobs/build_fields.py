#!/usr/bin/env python
"""``ray job submit`` entry point: build the ANCHOR and/or TITLE
postings fields of an existing index (round-5 — real ranked fields for
multi-field BM25F; `pipelines/anchor_field.py`).

    ray job submit --working-dir . -- \
        python jobs/build_fields.py --index <index dir> \
            [--pages <pages parquet>] [--fields anchor,title] \
            [--num-shards 4]

The anchor field needs the pages corpus (link extraction + target
resolution against the index's doc store); the title field builds
straight off the doc store. Re-run after incremental updates to
refresh the fields (each build is a full, idempotent rewrite of its
``<field>_shards`` directory — the segments of the body index are
untouched).
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
    ap.add_argument("--index", required=True, help="existing index directory")
    ap.add_argument("--pages", help="pages parquet (required for the anchor field)")
    ap.add_argument("--fields", default="anchor,title", help="comma list: anchor,title")
    ap.add_argument("--num-shards", type=int, default=4)
    args = ap.parse_args(argv)

    fields = [f.strip() for f in args.fields.split(",") if f.strip()]
    if "anchor" in fields and not args.pages:
        ap.error("--pages is required to build the anchor field")

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.anchor_field import (
        build_anchor_field,
        build_title_field,
    )

    out = {}
    if "anchor" in fields:
        out["anchor"] = build_anchor_field(
            args.pages, args.index, num_shards=args.num_shards
        )
    if "title" in fields:
        out["title"] = build_title_field(args.index, num_shards=args.num_shards)
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
