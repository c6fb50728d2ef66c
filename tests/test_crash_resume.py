"""Crash-resume with a REAL mid-build SIGKILL (north-rule requirement:
builds resumable from per-partition checkpoints with lineage).

A subprocess build is killed hard while phase A is mid-flight (after at
least one partition manifest has landed, before the index meta exists);
the resumed build must skip the completed partitions and produce shards
BYTE-IDENTICAL to an uninterrupted build of the same corpus — i.e. a
torn run leaves nothing half-trusted: partitions either committed an
atomic manifest or are rebuilt.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq

from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
    IndexPaths,
    build_index,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
    pages_parquet,
)

N_DOCS = 3000
KW = dict(num_partitions=4, hot_df_threshold=100, num_salts=2)

_CHILD = r"""
import sys
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import build_index
build_index(sys.argv[1], sys.argv[2], num_partitions=4, hot_df_threshold=100, num_salts=2)
"""


def _shard_table(paths: IndexPaths):
    import pyarrow as pa

    files = []
    for r, _d, names in os.walk(paths.shards):
        files.extend(os.path.join(r, n) for n in names if n.endswith(".parquet"))
    t = pa.concat_tables(
        [pq.read_table(f, columns=["term", "df", "cf", "doc_blob", "tf_blob"]) for f in sorted(files)]
    )
    return t.sort_by("term")


def test_sigkill_mid_build_then_resume_is_byte_identical(ray_session, tmp_path):
    pages = pages_parquet(N_DOCS, row_group_size=128)
    out_clean = str(tmp_path / "clean")
    out_crash = str(tmp_path / "crashed")
    build_index(pages, out_clean, **KW)

    # child process build; kill it hard once >=1 partition manifest has
    # landed but before the final meta exists (phase A mid-flight)
    env = dict(os.environ, RAY_ADDRESS="local")
    proc = subprocess.Popen(
        [sys.executable, "-c", _CHILD, pages, out_crash],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,  # isolate: kill the whole Ray session group
    )
    ckpt = os.path.join(out_crash, "docs_ckpt")
    deadline = time.time() + 180
    killed_midway = False
    try:
        while time.time() < deadline and proc.poll() is None:
            manifests = []
            if os.path.isdir(ckpt):
                for pid in range(KW["num_partitions"]):
                    m = os.path.join(ckpt, f"part={pid}", "manifest.json")
                    if os.path.exists(m):
                        manifests.append(m)
            if manifests and not os.path.exists(os.path.join(out_crash, "meta.json")):
                os.killpg(proc.pid, signal.SIGKILL)
                killed_midway = True
                break
            time.sleep(0.1)
    finally:
        if proc.poll() is None:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
        proc.wait(timeout=60)

    if not killed_midway:
        # the whole build finished inside one poll interval — still a
        # valid resume case (rerun over a complete tree is idempotent),
        # but flag it so a systematically-too-fast build gets noticed
        assert os.path.exists(os.path.join(out_crash, "meta.json"))

    # derived dirs may be torn — the resume contract only trusts
    # partition manifests; everything else is rebuilt
    paths = build_index(pages, out_crash, **KW)
    with open(paths.meta) as f:
        meta = json.load(f)
    assert meta["N"] > 0
    clean = _shard_table(IndexPaths(out_clean))
    resumed = _shard_table(paths)
    assert clean.equals(resumed)  # byte-identical postings after a hard kill


def test_sigkill_during_derived_phase_then_resume(ray_session, tmp_path):
    """Kill AFTER the docs checkpoint completes (all manifests in, meta
    not yet written): the resume must skip every phase-A partition and
    still emit identical shards."""
    pages = pages_parquet(N_DOCS, row_group_size=128)
    out_clean = str(tmp_path / "clean2")
    out_crash = str(tmp_path / "crashed2")
    build_index(pages, out_clean, **KW)

    env = dict(os.environ, RAY_ADDRESS="local")
    proc = subprocess.Popen(
        [sys.executable, "-c", _CHILD, pages, out_crash],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    ckpt = os.path.join(out_crash, "docs_ckpt")
    deadline = time.time() + 180
    try:
        while time.time() < deadline and proc.poll() is None:
            n = 0
            if os.path.isdir(ckpt):
                n = sum(
                    os.path.exists(os.path.join(ckpt, f"part={pid}", "manifest.json"))
                    for pid in range(KW["num_partitions"])
                )
            if n == KW["num_partitions"] and not os.path.exists(
                os.path.join(out_crash, "meta.json")
            ):
                os.killpg(proc.pid, signal.SIGKILL)
                break
            time.sleep(0.05)
    finally:
        if proc.poll() is None:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
        proc.wait(timeout=60)

    paths = build_index(pages, out_crash, **KW)
    assert _shard_table(IndexPaths(out_clean)).equals(_shard_table(paths))


def test_sigkill_mid_update_leaves_base_intact_and_rerun_identical(
    ray_session, tmp_path
):
    """Incremental update is crash-safe by construction (the base index
    is never mutated): SIGKILL the update subprocess mid-flight, assert
    the base tree is byte-for-byte untouched, then a rerun must produce
    the same merged index an uninterrupted update produces."""
    import hashlib

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.update_index import (
        update_index,
    )

    base_pages = pages_parquet(1500, row_group_size=128)
    delta_pages = pages_parquet(2000, row_group_size=128)  # superset corpus
    base_dir = str(tmp_path / "base")
    build_index(base_pages, base_dir, **KW)

    def tree_digest(root: str) -> dict:
        out = {}
        for r, _d, names in os.walk(root):
            for n in sorted(names):
                p = os.path.join(r, n)
                with open(p, "rb") as f:
                    out[os.path.relpath(p, root)] = hashlib.md5(f.read()).hexdigest()
        return out

    base_before = tree_digest(base_dir)

    # uninterrupted reference update
    ref_out = str(tmp_path / "ref_upd")
    update_index(delta_pages, base_dir, ref_out, num_partitions=2)

    child = r"""
import sys
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.update_index import update_index
update_index(sys.argv[1], sys.argv[2], sys.argv[3], num_partitions=2)
"""
    crash_out = str(tmp_path / "crash_upd")
    env = dict(os.environ, RAY_ADDRESS="local")
    proc = subprocess.Popen(
        [sys.executable, "-c", child, delta_pages, base_dir, crash_out],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    deadline = time.time() + 180
    try:
        while time.time() < deadline and proc.poll() is None:
            # kill once the delta build has started writing anything
            if os.path.isdir(crash_out + ".delta") and not os.path.exists(
                os.path.join(crash_out, "meta.json")
            ):
                time.sleep(0.5)  # let it get mid-write
                os.killpg(proc.pid, signal.SIGKILL)
                break
            time.sleep(0.05)
    finally:
        if proc.poll() is None:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
        proc.wait(timeout=60)

    assert tree_digest(base_dir) == base_before  # base never mutated

    import shutil as _sh

    _sh.rmtree(crash_out, ignore_errors=True)
    _sh.rmtree(crash_out + ".delta", ignore_errors=True)
    update_index(delta_pages, base_dir, crash_out, num_partitions=2)

    def shard_tbl(d):
        import pyarrow as pa

        files = []
        for r, _dd, names in os.walk(os.path.join(d, "shards")):
            files.extend(os.path.join(r, n) for n in names if n.endswith(".parquet"))
        return pa.concat_tables(
            [
                pq.read_table(f, columns=["term", "df", "cf", "doc_blob", "tf_blob"])
                for f in sorted(files)
            ]
        ).sort_by("term")

    assert shard_tbl(ref_out).equals(shard_tbl(crash_out))
