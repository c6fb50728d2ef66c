"""Worker-side thread accounting.

Ray books CPUs per task/actor, but native libraries size their own
pools to ALL physical cores: pyarrow's compute pool (group_by, sorts,
casts) and DuckDB's execution pool silently fan a 1-CPU-booked task
across the node. On one machine that is phantom parallelism — a
4-CPU-capped run borrows the other 28 cores, overstating what a real
4-core node would do (and at full parallelism N workers x 32 threads
thrash). ``cap_worker_threads`` pins pyarrow to the booked share, ONLY
inside Ray worker processes (driver pools are left alone — driver-side
Arrow work is legitimately parallel).
"""

from __future__ import annotations

_capped = False


def cap_worker_threads() -> bool:
    """If running inside a RAY WORKER process, cap pyarrow's compute
    pool to 1 thread (the per-task booked CPU). Idempotent, cheap to
    call from hot kernels. Returns True iff the cap is in effect."""
    global _capped
    if _capped:
        return True
    try:
        import ray
        from ray._private.worker import WORKER_MODE, global_worker

        if getattr(global_worker, "mode", None) != WORKER_MODE:
            return False
    except Exception:
        return False
    import pyarrow as pa

    pa.set_cpu_count(1)
    pa.set_io_thread_count(2)
    _capped = True
    return True
