#!/usr/bin/env python
"""Multi-node-shaped execution evidence (round-4 verdict #6).

Everything else in BENCH/ runs `ray.init(num_cpus=N)` on one node, so
object transfer, locality and cross-node shuffle never execute. This
tool runs the flagship index build (and a bucketed graph kernel) on an
in-process simulated MULTI-NODE cluster (`ray.cluster_utils.Cluster`,
one head + N-1 worker raylets, each with its own object store), then
rebuilds on plain single-node local mode and asserts the index is
IDENTICAL (shard rows, meta stats) and the graph kernel agrees — the
N-vs-4N parity invariant exercised across real node boundaries.

    python tools/multinode_check.py [n_nodes] [cpus_per_node] [n_docs]

Appends one observation to BENCH/scaling_history.jsonl with
topology="multinode-sim".
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _build(out_dir: str, pages: str) -> float:
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
        build_index,
    )

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    build_index(pages, out_dir, num_partitions=8, batch_size=256)
    return time.time() - t0


def _pagerank(pages: str):
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.crawl import (
        LinkExtractStage,
        pagerank,
    )
    import pyarrow.parquet as pq

    urls = pq.read_table(pages, columns=["url"])["url"].to_pylist()
    edges = rd.read_parquet(pages, columns=["url", "html"]).map_batches(
        LinkExtractStage, batch_format="pyarrow", concurrency=(1, 8)
    )
    return pagerank(edges, urls, iters=5, plan="bucketed")


def _shard_rows(out_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(out_dir, "shards"),
        columns=["term", "df", "cf", "doc_blob", "tf_blob", "dl_blob"],
    )
    return sorted(t.to_pylist(), key=lambda r: r["term"])


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000

    import ray
    from ray.cluster_utils import Cluster

    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_parquet,
    )

    pages = pages_parquet(n_docs)

    # --- multi-node simulated cluster -------------------------------
    # explicit per-node object store: the sim's default split leaves
    # each raylet a sliver and a build this size spill-storms (measured
    # 147 s vs 5.8 s single-node at 4x8/20k docs before pinning this)
    store = 2 * 1024**3
    cluster = Cluster(
        initialize_head=True,
        head_node_args={
            "num_cpus": cpus,
            "include_dashboard": False,
            "object_store_memory": store,
        },
    )
    for _ in range(n_nodes - 1):
        cluster.add_node(num_cpus=cpus, object_store_memory=store)
    ray.init(address=cluster.address, include_dashboard=False)
    nodes = [n for n in ray.nodes() if n["Alive"]]
    assert len(nodes) == n_nodes, f"expected {n_nodes} nodes, got {len(nodes)}"
    multi_wall = _build("/tmp/wse_multinode_idx", pages)
    pr_multi = _pagerank(pages)
    ray.shutdown()
    cluster.shutdown()

    # --- single-node reference --------------------------------------
    ray.init(address="local", num_cpus=n_nodes * cpus, include_dashboard=False)
    single_wall = _build("/tmp/wse_singlenode_idx", pages)
    pr_single = _pagerank(pages)
    ray.shutdown()

    # --- identity ---------------------------------------------------
    with open("/tmp/wse_multinode_idx/meta.json") as f:
        m_multi = json.load(f)
    with open("/tmp/wse_singlenode_idx/meta.json") as f:
        m_single = json.load(f)
    for k in ("N", "avgdl", "total_len", "num_duplicate_docs"):
        assert m_multi[k] == m_single[k], (k, m_multi[k], m_single[k])
    rows_m = _shard_rows("/tmp/wse_multinode_idx")
    rows_s = _shard_rows("/tmp/wse_singlenode_idx")
    assert rows_m == rows_s, "shard rows differ between multi-node and single-node builds"
    assert pr_multi.equals(pr_single), "bucketed pagerank differs across topologies"

    obs = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "topology": "multinode-sim",
        "n_nodes": n_nodes,
        "cpus_per_node": cpus,
        "n_docs": n_docs,
        "build_wall_multi_sec": round(multi_wall, 3),
        "build_wall_single_sec": round(single_wall, 3),
        "shards_identical": True,
        "pagerank_identical": True,
        "note": "flagship build + bucketed pagerank on ray.cluster_utils.Cluster "
        "(separate raylets/object stores per node); output byte-identical to "
        "the single-node build",
    }
    with open(os.path.join(REPO, "BENCH", "scaling_history.jsonl"), "a") as f:
        f.write(json.dumps(obs) + "\n")
    print(json.dumps(obs))


if __name__ == "__main__":
    main()
