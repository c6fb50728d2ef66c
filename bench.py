#!/usr/bin/env python
"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "num_cpus": N, ...}

--scaling runs the headline index build in FRESH processes
(num_cpus=4 then 16) on the same input and reports both throughputs +
scaling efficiency (the sandbox stand-in for the north rule's N vs 4N
node requirement); results also land in BENCH/scaling_r*.json.

This script OWNS its Ray session (the driver contract: __ray_entry__
and the library never call ray.init).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SCALING_CPUS = (4, 16)  # the N / 4N pair used by --scaling


def _sf() -> float:
    name = os.path.basename(os.path.normpath(SF_DIR))
    return float(name.replace("sf", "")) if name.startswith("sf") else 0.1


def host_health() -> dict:
    """First-touch page-fault, warm-copy and disk-write throughput (MB/s).

    The sandbox VM intermittently degrades to ~9 MB/s on BOTH fresh-page
    fault-in and disk writes while warm-page copies stay at ~8 GB/s and
    CPU shows zero steal — host-side backing-store contention that
    inflates build walls 2-4x (observed 2026-08-17, see BASELINE.md).
    Every scaling observation records this probe so degraded-window runs
    are identifiable after the fact."""
    import numpy as np

    a = np.ones(200 * 1024 * 1024, np.uint8)
    b = np.empty_like(a)
    t = time.time()
    np.copyto(b, a)
    fault_mbs = 200 / max(time.time() - t, 1e-9)
    t = time.time()
    np.copyto(b, a)
    warm_mbs = 200 / max(time.time() - t, 1e-9)
    path = "/tmp/wse_health_probe.bin"
    t = time.time()
    with open(path, "wb") as f:
        f.write(memoryview(a)[: 100 * 1024 * 1024])
        f.flush()
        os.fsync(f.fileno())
    disk_mbs = 100 / max(time.time() - t, 1e-9)
    os.remove(path)
    return {
        "fault_in_mb_s": round(fault_mbs, 1),
        "warm_copy_mb_s": round(warm_mbs, 1),
        "disk_write_mb_s": round(disk_mbs, 1),
    }


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _build_once(num_cpus: int, out_dir: str, scale_mult: int = 1) -> dict:
    """One full index build over the sf-scaled synthetic pages corpus;
    returns docs, wall seconds, docs/sec. ``scale_mult`` grows the
    corpus (scaling runs use a larger corpus so per-doc compute dominates fixed
    orchestration cost, as it does on a real multi-node corpus)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
        build_index,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
        pages_parquet,
        sf_to_n_docs,
    )

    if scale_mult > 1:
        pages = pages_parquet(sf_to_n_docs(_sf()) * scale_mult)
    else:
        pages = pages_for_sf_dir(SF_DIR)
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    paths = build_index(pages, out_dir, num_partitions=16, batch_size=256)
    wall = time.time() - t0
    with open(paths.meta) as f:
        meta = json.load(f)
    docs = meta["phase_a"]["docs"] + 0  # canonical count is meta["N"] + dups
    total_docs = meta["N"] + meta["num_duplicate_docs"]
    return {
        "wall_sec": wall,
        "docs": total_docs,
        "docs_per_sec": total_docs / wall,
        "num_cpus": num_cpus,
        "timings": meta["timings_sec"],
    }


def run_scaling() -> None:
    """Fresh-process runs at N=4 and 4N=16 CPUs over the SAME corpus.

    The corpus is 10x the bench sf (1M docs at sf0.1) so per-document
    compute dominates the fixed orchestration cost (pipeline/actor
    startup, shuffle setup) the way it does on any real multi-node
    corpus; both runs see identical input, per the north rule's
    same-input requirement."""
    results = {}
    # generate/cache the corpus once so neither timed run pays for it
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_parquet,
        sf_to_n_docs,
    )

    n_lo, n_hi = SCALING_CPUS  # N and 4N
    pages_parquet(sf_to_n_docs(_sf()) * 10)
    health_before = host_health()
    attempts_log: dict[str, list] = {}
    for n in (n_lo, n_hi):
        # adaptive best-of-N: the sandbox VM shows sporadic 2x+
        # throughput swings from host-side backing-store contention
        # (see BASELINE.md / host_health); min wall per level is the
        # honest estimator of the build's own cost, and we repeat until
        # the two best walls agree within 8% (max 4 attempts) so one
        # degraded attempt can't set the level's number alone. Every
        # attempt's wall + pre-attempt health probe is recorded.
        walls: list[float] = []
        best = None
        attempts_log[str(n)] = []
        for _attempt in range(4):
            probe = host_health()
            cmd = [
                sys.executable, __file__, "--one-build", str(n),
                f"/tmp/wse_bench_scaling_{n}", "--scale-mult", "10",
            ]
            out = subprocess.run(cmd, capture_output=True, text=True, check=True)
            r = json.loads(out.stdout.strip().splitlines()[-1])
            walls.append(r["wall_sec"])
            attempts_log[str(n)].append(
                {"wall_sec": round(r["wall_sec"], 2), "health_before": probe}
            )
            if best is None or r["wall_sec"] < best["wall_sec"]:
                best = r
            shutil.rmtree(f"/tmp/wse_bench_scaling_{n}", ignore_errors=True)
            if len(walls) >= 2:
                lo1, lo2 = sorted(walls)[:2]
                if lo2 <= lo1 * 1.08:
                    break
        results[n] = best
    t_lo, t_hi = results[n_lo]["docs_per_sec"], results[n_hi]["docs_per_sec"]
    eff = (t_hi / t_lo) / (n_hi / n_lo)
    payload = {
        "metric": f"index-build scaling N={n_lo} vs 4N={n_hi} cpus (fresh processes, same corpus)",
        "sf": _sf(),
        "throughput_docs_per_sec": {str(n_lo): round(t_lo, 1), str(n_hi): round(t_hi, 1)},
        "wall_sec": {
            str(n_lo): round(results[n_lo]["wall_sec"], 2),
            str(n_hi): round(results[n_hi]["wall_sec"], 2),
        },
        "scaling_efficiency": round(eff, 3),
        "docs": results[n_hi]["docs"],
        "stage_timings_sec": {
            str(n_lo): results[n_lo]["timings"],
            str(n_hi): results[n_hi]["timings"],
        },
        "host_health_mb_s": {"before": health_before, "after": host_health()},
        "attempts": attempts_log,
    }
    # repo-anchored, NOT cwd-relative: a run driven from a scratch cwd
    # once auto-appended its ledger entry outside the repo (BASELINE.md
    # 2026-08-18 note) — anchor on this file's directory so every
    # observation lands in the repo's ledger regardless of cwd
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "scaling_latest.json"), "w") as f:
        json.dump(payload, f, indent=2)
    # append-only history: the sandbox VM's noise swings single runs by
    # 2x, so the record keeps every measurement, not just the last
    with open(os.path.join(bench_dir, "scaling_history.jsonl"), "a") as f:
        f.write(json.dumps(payload) + "\n")
    print(json.dumps(payload))


def _wand_spiky_microbench() -> dict:
    """Cold Block-Max-WAND over a skewed synthetic posting list (the
    workload block-max pruning exists for): decoded-block fraction +
    latency of the format-4 lazy path vs a full eager decode of the
    same shard table. Deterministic, in-process (no Ray)."""
    import numpy as np

    from work_sample_spark_cloud_based_distributed_search_engine_ray.functions.codec import (
        encode_postings_multi,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
        _encoded_table,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
        SearchIndex,
    )
    import pyarrow as pa

    rng = np.random.default_rng(12345)
    n_docs, df = 4_000_000, 400_000
    ids = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
    tfs = np.where(rng.random(df) < 0.002, 200, 1).astype(np.int64)
    dls = np.full(df, 500, dtype=np.int64)
    enc = encode_postings_multi(np.zeros(df, np.int64), ids, tfs, dls)
    tbl = _encoded_table(pa.array(["spiky"]), enc).combine_chunks()
    meta = {"N": n_docs, "avgdl": 500.0, "k1": 1.2, "b": 0.75}

    cold = SearchIndex(meta, tbl, docstore_path="/nonexistent")
    t0 = time.time()
    cold.bm25_topk("spiky", 10, method="wand")
    lazy_ms = (time.time() - t0) * 1000
    decoded, total = cold.last_wand_blocks

    eager = SearchIndex(meta, tbl, docstore_path="/nonexistent")
    t0 = time.time()
    eager.postings("spiky")  # the pre-format-4 cold cost: full decode
    eager_ms = (time.time() - t0) * 1000
    return {
        "df": df,
        "decoded_blocks": int(decoded),
        "total_blocks": int(total),
        "decoded_frac": round(decoded / max(1, total), 4),
        "lazy_cold_query_ms": round(lazy_ms, 2),
        "eager_full_decode_ms": round(eager_ms, 2),
    }


def run_bench() -> None:
    _init_ray(NUM_CPUS)
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
        SearchIndex,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        reference_queries,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.ann import (
        knn_brute_force,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.dedup import (
        minhash_lsh_pairs,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.textstats import (
        TextStatsStage,
    )

    queries: dict[str, float] = {}
    extras: dict[str, object] = {}
    # untimed: identifies degraded-host windows (see BASELINE.md) in the
    # recorded bench line itself
    extras["host_health_mb_s"] = host_health()
    t_all = time.time()

    # 1. headline: index build
    t0 = time.time()
    build = _build_once(NUM_CPUS, "/tmp/wse_bench_index")
    queries["index_build"] = round(build["wall_sec"], 3)
    extras["index_build_docs_per_sec"] = round(build["docs_per_sec"], 1)
    extras["index_build_stage_timings"] = build["timings"]

    # 1b. doc_id collision audit over the build's checkpoint (untimed
    # w.r.t. the headline: a production gate, not a throughput stage)
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
        IndexPaths,
        audit_doc_ids,
    )

    audit = audit_doc_ids(IndexPaths("/tmp/wse_bench_index"))
    extras["doc_id_collisions"] = audit["collisions"]
    assert audit["collisions"] == 0, f"doc_id collision audit failed: {audit}"

    # 2. query serving: load + run the reference query set, p50/p95
    t0 = time.time()
    idx = SearchIndex.load("/tmp/wse_bench_index")
    extras["index_load_sec"] = round(time.time() - t0, 3)
    lat = []
    for _qid, q in reference_queries():
        t1 = time.time()
        idx.bm25_topk(q, k=10)
        lat.append(time.time() - t1)
    lat_arr = np.array(lat)
    queries["bm25_query_set"] = round(float(lat_arr.sum()), 3)
    extras["bm25_p50_ms"] = round(float(np.percentile(lat_arr, 50)) * 1000, 2)
    extras["bm25_p95_ms"] = round(float(np.percentile(lat_arr, 95)) * 1000, 2)
    # format-4 lazy decode instrumentation: fraction of cold terms'
    # posting blocks the WAND admission actually decoded (1.0 = no
    # pruning benefit at this corpus scale; << 1 once theta bites)
    lazy = getattr(idx, "_lazy_cache", {})
    if lazy:
        tot_blocks = sum(int(p.block_last.size) for p in lazy.values())
        dec_blocks = sum(
            min(p.decoded_blocks, int(p.block_last.size)) for p in lazy.values()
        )
        extras["wand_lazy_terms"] = len(lazy)
        extras["wand_decoded_block_frac"] = round(dec_blocks / max(1, tot_blocks), 3)
    # ...and the shape pruning IS built for: a spiky 400k-doc list
    # (mostly tf=1, rare tf=200, constant dl) where theta separates
    # block bounds — decoded fraction and cold-query latency on the
    # admitted-blocks path (pure in-process microbench, no Ray)
    extras["wand_spiky_microbench"] = _wand_spiky_microbench()

    # 3. minhash-LSH dedup over the driver documents table
    docs_path = os.path.join(SF_DIR, "documents.parquet")
    t0 = time.time()
    n_pairs = minhash_lsh_pairs(rd.read_parquet(docs_path), est_threshold=0.5).count()
    queries["minhash_lsh_dedup"] = round(time.time() - t0, 3)
    extras["minhash_pairs"] = n_pairs

    # 4. text stats over documents
    t0 = time.time()
    rd.read_parquet(docs_path).map_batches(
        TextStatsStage, batch_format="pyarrow", concurrency=max(2, NUM_CPUS // 2)
    ).count()
    queries["text_stats"] = round(time.time() - t0, 3)

    # 5. knn over embeddings
    emb_path = os.path.join(SF_DIR, "embeddings.parquet")
    qm = np.asarray(
        pq.read_table(emb_path, columns=["embedding"]).slice(0, 16)["embedding"].to_pylist(),
        dtype=np.float64,
    )
    t0 = time.time()
    knn_brute_force(rd.read_parquet(emb_path), qm, k=10).count()
    queries["knn_bruteforce"] = round(time.time() - t0, 3)

    # 6. incremental update: merge a +10% batch of NEW pages into the
    # stage-1 index (round-3 verdict #6: at 100 TB the delta path IS
    # the steady-state build, so it gets its own recorded bar). The
    # delta corpus is the deterministic tail [n, 1.1n) of a larger
    # synthetic corpus — urls are index-keyed, so the batch is disjoint
    # from the base by construction.
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.update_index import (
        update_index,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_parquet,
        sf_to_n_docs,
    )

    n = sf_to_n_docs(_sf())
    n_delta = int(n * 1.1) - n
    # cache key includes the generator's own cache filename (carries
    # its _g* generation tag), so a generator change can never silently
    # reuse a stale delta slice
    big_path = pages_parquet(int(n * 1.1))
    delta_path = f"/tmp/wse_bench_delta_{os.path.basename(big_path)}"
    if not os.path.exists(delta_path):
        big = pq.read_table(big_path)
        pq.write_table(
            big.slice(n), delta_path, row_group_size=max(256, n_delta // 16)
        )
    shutil.rmtree("/tmp/wse_bench_index_upd", ignore_errors=True)
    shutil.rmtree("/tmp/wse_bench_index_upd.delta", ignore_errors=True)
    t0 = time.time()
    update_index(
        delta_path, "/tmp/wse_bench_index", "/tmp/wse_bench_index_upd", num_partitions=8
    )
    upd_wall = time.time() - t0
    queries["index_update_10pct"] = round(upd_wall, 3)
    extras["update_docs_per_sec"] = round(n_delta / upd_wall, 1)

    # 6b. SEGMENT update (round-5): the same +10% delta landed as a new
    # immutable segment — the O(delta)-I/O steady-state path; the
    # recorded write ratio vs base is the asymptote evidence
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.segments import (
        add_segment,
        create_segmented,
    )

    seg_root = "/tmp/wse_bench_index_seg"
    shutil.rmtree(seg_root, ignore_errors=True)
    create_segmented("/tmp/wse_bench_index", seg_root)
    t0 = time.time()
    seg_metrics = add_segment(seg_root, delta_path, num_partitions=8)
    seg_wall = time.time() - t0
    queries["index_update_segment_10pct"] = round(seg_wall, 3)
    extras["segment_write_ratio_vs_base"] = seg_metrics.get("write_ratio_vs_base")

    # 7. field indexes (round-5): anchor postings (extraction + bucketed
    # url join + term shuffle) and title postings (doc-store pass + term
    # shuffle) over the stage-1 index
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.anchor_field import (
        build_anchor_field,
        build_title_field,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_for_sf_dir,
    )

    t0 = time.time()
    build_anchor_field(pages_for_sf_dir(SF_DIR), "/tmp/wse_bench_index")
    build_title_field("/tmp/wse_bench_index")
    queries["field_index_build"] = round(time.time() - t0, 3)

    total = time.time() - t_all
    print(
        json.dumps(
            {
                "metric": "headline pipelines wall time (index build + BM25 query set + dedup + textstats + knn + 10% incremental update)",
                "value": round(total, 3),
                "unit": "sec",
                "queries": queries,
                "sf": _sf(),
                "num_cpus": NUM_CPUS,
                **extras,
            }
        )
    )
    import ray

    ray.shutdown()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one-build":
        n, out_dir = int(sys.argv[2]), sys.argv[3]
        mult = int(sys.argv[5]) if len(sys.argv) > 5 and sys.argv[4] == "--scale-mult" else 1
        _init_ray(n)
        print(json.dumps(_build_once(n, out_dir, scale_mult=mult)))
        import ray

        ray.shutdown()
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        if "--wait-healthy" in sys.argv:
            # this VM's backing store degrades ~100-1000x for hours
            # (BASELINE.md host notes); degraded windows systematically
            # UNDERSTATE scaling efficiency (the I/O floor binds harder
            # at higher CPU counts), so poll until the store recovers
            # before spending the measurement. Thresholds are ~60% of
            # the observed healthy levels (5,300 / 515 MB/s).
            import time as _time

            deadline = _time.time() + 6 * 3600
            while _time.time() < deadline:
                h = host_health()
                print(json.dumps({"waiting_for_healthy_host": h}), flush=True)
                if h["fault_in_mb_s"] > 3000 and h["disk_write_mb_s"] > 350:
                    break
                _time.sleep(120)
        run_scaling()
    else:
        run_bench()
