#!/usr/bin/env python
"""Concurrent-client latency of the serving tier (round-3 verdict #7).

Starts ``SearchHTTPServer`` (ThreadingHTTPServer: thread per
connection, like the reference's ``webserver/ServerWorker.java`` pool)
over a built index and drives it with N concurrent closed-loop clients
issuing the reference query set (cache-busted per request, so every hit
does real scoring work), reporting the per-request latency distribution
and aggregate throughput at each concurrency level.

    python tools/bench_serve.py [index_dir] [--clients 1,8,32] [--seconds 10]

Backend note: with the in-process ``SearchIndex`` backend the handler
threads score under one GIL but the numpy kernels release it, so
concurrency still overlaps; with ``--distributed`` the backend is the
shard-actor tier (``DistributedSearch``) and scoring runs in actor
processes — the multi-node serving shape.
"""

from __future__ import annotations

import json
import statistics
import sys
import threading
import time
import urllib.parse
import urllib.request


def run_level(port: int, queries: list[str], n_clients: int, seconds: float):
    stop = time.perf_counter() + seconds
    lats: list[list[float]] = [[] for _ in range(n_clients)]
    errors = [0] * n_clients

    def client(ci: int) -> None:
        i = ci  # stagger query streams per client
        while time.perf_counter() < stop:
            q = queries[i % len(queries)]
            # cache-bust: unique suffix term per request (unknown terms
            # don't change results but change the cache key)
            qq = urllib.parse.quote(f"{q} zzcb{ci}x{i}")
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/search?query={qq}", timeout=30
                ) as r:
                    r.read()
                lats[ci].append((time.perf_counter() - t0) * 1000)
            except Exception:
                errors[ci] += 1
            i += n_clients

    threads = [threading.Thread(target=client, args=(ci,)) for ci in range(n_clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    flat = sorted(x for l in lats for x in l)
    if not flat:
        return {"clients": n_clients, "requests": 0, "errors": sum(errors)}
    return {
        "clients": n_clients,
        "requests": len(flat),
        "errors": sum(errors),
        "rps": round(len(flat) / wall, 1),
        "p50_ms": round(statistics.median(flat), 2),
        "p95_ms": round(flat[int(len(flat) * 0.95)], 2),
        "p99_ms": round(flat[int(len(flat) * 0.99)], 2),
        "max_ms": round(flat[-1], 2),
    }


def run_scaling(idx_dir: str, levels=(4, 16), clients: int = 32, seconds: float = 8.0):
    """Serving-side N-vs-4N evidence: run the shard-actor tier in FRESH
    processes at each CPU level (same index, same client count) and
    report throughput at both plus the ratio. Complements bench.py
    --scaling (the build side of the north rule)."""
    import subprocess

    out = {"clients": clients, "levels": {}}
    for n in levels:
        env = dict(
            __import__("os").environ,
            WSE_SERVE_CPUS=str(n),
        )
        r = subprocess.run(
            [
                sys.executable,
                __file__,
                idx_dir,
                f"--clients={clients}",
                f"--seconds={seconds}",
                "--distributed",
            ],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        out["levels"][str(n)] = json.loads(r.stdout.strip().splitlines()[-1])["levels"][0]
    lo, hi = (str(levels[0]), str(levels[1]))
    r_lo, r_hi = out["levels"][lo]["rps"], out["levels"][hi]["rps"]
    out["rps_ratio"] = round(r_hi / r_lo, 3) if r_lo else None
    print(json.dumps(out))


def run_reuseport(
    idx_dir: str, n_routers_levels=(1, 2, 4), clients: int = 32, seconds: float = 8.0,
    port: int = 18923,
) -> None:
    """Single-ENDPOINT router scale-out (round-4 verdict #8): N router
    PROCESSES bind the SAME port via SO_REUSEPORT (kernel-level
    connection balancing — no user-space proxy hop), all sharing ONE
    named shard-actor pool (index memory 1x). Reports one-endpoint rps
    + latency at each router count; the done-bar is >=2x the 1-router
    rps at p95 <= 50 ms."""
    import os as _os
    import subprocess

    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    sys.path.insert(0, ".")
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.serve import (
        DistributedSearch,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        reference_queries,
    )

    # create the shared pool once; workers attach by name
    pool_owner = DistributedSearch(idx_dir, shared=True)
    queries = [q for _, q in reference_queries() if q.strip()]
    out = {"mode": "reuseport-single-endpoint", "clients": clients, "port": port, "levels": {}}
    env = dict(_os.environ, RAY_ADDRESS="auto")
    for n in n_routers_levels:
        procs = [
            subprocess.Popen(
                [sys.executable, __file__, idx_dir, f"--worker-port={port}"],
                env=env,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            for _ in range(n)
        ]
        try:
            # wait for at least one router to answer
            for _ in range(120):
                try:
                    urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/stats", timeout=1
                    ).read()
                    break
                except Exception:
                    time.sleep(0.5)
            time.sleep(1.5)  # let the rest bind
            run_level(port, queries, 4, 2.0)  # warm actor-side caches
            out["levels"][str(n)] = run_level(port, queries, clients, seconds)
        finally:
            for p in procs:
                p.terminate()
            for p in procs:
                p.wait(timeout=10)
    r1 = out["levels"].get("1", {}).get("rps")
    rmax = max(v.get("rps", 0) for v in out["levels"].values())
    out["speedup_vs_1_router"] = round(rmax / r1, 2) if r1 else None
    # leave the shared pool for inspection? no - explicit teardown
    for a in pool_owner.actors:
        ray.kill(a)
    print(json.dumps(out))
    ray.shutdown()


def run_worker(idx_dir: str, port: int) -> None:
    """One reuse-port router process: join the existing Ray instance,
    attach to the shared named shard-actor pool, serve until killed."""
    import ray

    ray.init(address="auto", include_dashboard=False, logging_level="ERROR")
    sys.path.insert(0, ".")
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.serve import (
        DistributedSearch,
        SearchHTTPServer,
    )

    backend = DistributedSearch(idx_dir, shared=True)
    SearchHTTPServer(backend, port=port, reuse_port=True).start()
    while True:
        time.sleep(3600)


def main() -> None:
    import os as _os

    import ray

    sys.path.insert(0, ".")  # run from the repo root, like check_oracles
    if "--scaling" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        run_scaling(args[0] if args else "/tmp/wse_idx_sf01_daat")
        return
    for a in sys.argv[1:]:
        if a.startswith("--worker-port"):
            args = [x for x in sys.argv[1:] if not x.startswith("--")]
            run_worker(args[0], int(a.split("=", 1)[1]))
            return
    if "--reuseport" in sys.argv or any(a.startswith("--reuseport=") for a in sys.argv):
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        levels = (1, 2, 4)
        clients = 32
        for a in sys.argv[1:]:
            if a.startswith("--reuseport="):
                levels = tuple(int(x) for x in a.split("=", 1)[1].split(","))
            if a.startswith("--clients"):
                clients = int(a.split("=", 1)[1])
        run_reuseport(args[0] if args else "/tmp/wse_idx_sf01_daat", levels, clients=clients)
        return
    serve_cpus = _os.environ.get("WSE_SERVE_CPUS")
    if serve_cpus and not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(serve_cpus),
            include_dashboard=False,
            logging_level="ERROR",
        )

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    idx_dir = args[0] if args else "/tmp/wse_idx_sf01_daat"
    levels = [1, 8, 32]
    seconds = 10.0
    distributed = "--distributed" in sys.argv
    shared = "--shared" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--clients"):
            levels = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("--seconds"):
            seconds = float(a.split("=", 1)[1])

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
        SearchIndex,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.serve import (
        DistributedSearch,
        SearchHTTPServer,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        reference_queries,
    )

    backend = (
        DistributedSearch(idx_dir, shared=shared)
        if distributed
        else SearchIndex.load(idx_dir)
    )
    queries = [q for _, q in reference_queries() if q.strip()]
    srv = SearchHTTPServer(backend, port=0).start()
    # warm the postings cache so levels measure serving, not first decode
    run_level(srv.port, queries, 2, 2.0)
    out = {
        "backend": ("shared-pool" if shared else "distributed") if distributed else "in-process",
        "n_docs": getattr(backend, "N", None),
        "levels": [run_level(srv.port, queries, n, seconds) for n in levels],
    }
    srv.shutdown()
    if distributed:
        backend.shutdown()
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
