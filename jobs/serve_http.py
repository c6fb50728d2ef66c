#!/usr/bin/env python
"""HTTP query server over a built index — the reference's user-facing
API (``search/Searcher.java:30-37``): ``GET /search?query=...[&k=10]``
-> JSON ``[{url, rank_score, title, body}]`` + CORS.

    python jobs/serve_http.py --index <dir> [--port 8080] [--distributed]

``--distributed`` serves through the shard-actor scatter-gather tier
(one Ray actor per index shard); the default is single-process serving
(the reference's deployment shape). This script OWNS its Ray session
when the distributed tier is requested.
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--index", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--distributed", action="store_true")
    args = ap.parse_args(argv)

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.serve import (
        SearchHTTPServer,
    )

    if args.distributed:
        import ray

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False)
        from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.serve import (
            DistributedSearch,
        )

        backend = DistributedSearch(args.index)
    else:
        from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
            SearchIndex,
        )

        backend = SearchIndex.load(args.index)

    srv = SearchHTTPServer(backend, host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{srv.port}/search?query=...")
    try:
        srv.httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        if args.distributed:
            backend.shutdown()
            import ray

            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
