#!/usr/bin/env python
"""Volume A/B of the broadcast vs bucketed graph plans (round-4
BASELINE.md table) — reproducible from the repo.

    python tools/bench_graph.py [--nodes 500000] [--edges 2000000]

Runs connected components (8 rounds) and PageRank (10 iters) over a
seeded random graph at both plans, asserts parity (bit-identity for
components, rank_e9 for pagerank), prints ONE JSON line with walls.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import logging

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    n_nodes, n_edges = 500_000, 2_000_000
    for a in sys.argv[1:]:
        if a.startswith("--nodes="):
            n_nodes = int(a.split("=", 1)[1])
        if a.startswith("--edges="):
            n_edges = int(a.split("=", 1)[1])
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        pagerank,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
        dup_clusters,
    )

    out = {"n_nodes": n_nodes, "n_edges": n_edges}

    rng = np.random.default_rng(5)
    ids = np.unique(rng.integers(1, 2**62, size=n_nodes + 1000, dtype=np.int64))[:n_nodes]
    a = ids[rng.integers(0, n_nodes, n_edges)]
    b = ids[rng.integers(0, n_nodes, n_edges)]
    keep = a != b
    ds = (
        rd.from_arrow(pa.table({"doc_a": pa.array(a[keep]), "doc_b": pa.array(b[keep])}))
        .repartition(32)
        .materialize()
    )
    t0 = time.time()
    A = dup_clusters(ds, rounds=8, plan="broadcast")
    out["components_broadcast_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    B = dup_clusters(ds, rounds=8, plan="bucketed", num_buckets=16)
    out["components_bucketed_sec"] = round(time.time() - t0, 2)
    assert A.equals(B), "components A/B diverged"

    n_pr, e_pr = max(1000, n_nodes // 2), max(1000, n_edges // 2)
    rng = np.random.default_rng(7)
    urls = [f"http://n{i}.test:80/" for i in range(n_pr)]
    src = [urls[i] for i in rng.integers(0, n_pr, e_pr)]
    dst = [urls[i] for i in rng.integers(0, n_pr, e_pr)]
    eds = (
        rd.from_arrow(pa.table({"src_url": pa.array(src), "dst_url": pa.array(dst)}))
        .repartition(32)
        .materialize()
    )
    t0 = time.time()
    A = pagerank(eds, urls, iters=10, plan="broadcast")
    out["pagerank_broadcast_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    B = pagerank(eds, urls, iters=10, plan="bucketed", num_buckets=16)
    out["pagerank_bucketed_sec"] = round(time.time() - t0, 2)
    ra = np.asarray(A["rank"].to_pylist())
    rb = np.asarray(B["rank"].to_pylist())
    assert (np.round(ra * 1e9) == np.round(rb * 1e9)).all(), "pagerank A/B diverged"
    out["pagerank_nodes"] = n_pr
    out["pagerank_edges"] = e_pr

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
