#!/usr/bin/env python
"""Generate the committed golden artifacts (FIXTURES.md §3) from the
single-process oracle over the canonical 1000-doc fixture corpus.

    python tools/make_goldens.py

Overwrites ``tests/goldens/``. Regenerate ONLY when the pinned
semantics intentionally change (tokenizer, extraction, scorers,
generator) — the goldens exist to catch unintentional drift across
rounds; the engine is separately asserted rank-identical to the oracle
by tests/test_build_query.py, so golden == oracle == engine.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.oracle import (
    OracleIndex,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
    pages_parquet,
    reference_queries,
)

N_DOCS = 1000
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    pages = pq.read_table(pages_parquet(N_DOCS))
    oracle = OracleIndex(pages)

    rows = {"qid": [], "scorer": [], "rank": [], "doc_id": [], "score": []}
    for qid, q in reference_queries():
        for scorer, ranked in (
            ("bm25", oracle.bm25_topk(q, 10)),
            ("reference", oracle.reference_topk(q)),
        ):
            for r, (d, s) in enumerate(ranked):
                rows["qid"].append(qid)
                rows["scorer"].append(scorer)
                rows["rank"].append(r)
                rows["doc_id"].append(d)
                rows["score"].append(s)
    pq.write_table(
        pa.table(
            {
                "qid": pa.array(rows["qid"], pa.int64()),
                "scorer": pa.array(rows["scorer"], pa.string()),
                "rank": pa.array(rows["rank"], pa.int32()),
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "score": pa.array(rows["score"], pa.float64()),
            }
        ),
        os.path.join(OUT, "golden_topk.parquet"),
    )

    st = oracle.term_stats()
    terms = sorted(st)
    pq.write_table(
        pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "df": pa.array([st[t][0] for t in terms], pa.int64()),
                "cf": pa.array([st[t][1] for t in terms], pa.int64()),
            }
        ),
        os.path.join(OUT, "golden_stats.parquet"),
    )
    with open(os.path.join(OUT, "golden_scalars.json"), "w") as f:
        json.dump(
            {"n_docs_input": N_DOCS, "N": oracle.N, "total_len": oracle.total_len, "avgdl": oracle.avgdl},
            f,
            indent=1,
        )
    print(f"goldens written to {OUT}: {len(rows['qid'])} top-k rows, {len(terms)} terms, N={oracle.N}")


if __name__ == "__main__":
    main()
