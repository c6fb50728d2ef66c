"""Multi-format corpus ingestion — the repo's second source family.

The reference ingests exactly one shape (its KVS ``pt-crawl`` table,
``crawler/Crawler.java:168-213``); real webtext arrives as Parquet,
JSONL (one JSON doc per line — the Common-Crawl-derivative convention)
or CSV. ``read_pages`` normalizes any of the three to the canonical
pages schema (``sources.pages.PAGES_SCHEMA``) so every downstream
pipeline — index build, dedup, textstats, data prep — is
format-agnostic.

Design notes (the 100-TB read path):
- All three readers are Ray Data NATIVE sources (``read_parquet`` /
  ``read_json`` / ``read_csv``): file-parallel, streaming, predicate/
  column pruning where the format supports it. Normalization is one
  vectorized ``map_batches`` cast — no per-row Python.
- JSONL/CSV carry no native timestamp/binary types; ``warc_ts`` is
  parsed from ISO-8601 strings and ``html`` utf-8 encoded, both with
  Arrow compute kernels.
- Column pruning: pass ``columns`` to restrict the post-normalization
  projection (Parquet prunes at the reader; JSONL/CSV must parse the
  full line regardless — the reason Parquet is the canonical interchange
  and the other formats are INGEST-ONLY edges).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from .pages import PAGES_SCHEMA


def _normalize(batch: pa.Table) -> pa.Table:
    """Cast a raw JSONL/CSV batch to PAGES_SCHEMA (vectorized)."""
    cols = {}
    for field in PAGES_SCHEMA:
        if field.name not in batch.column_names:
            cols[field.name] = pa.nulls(batch.num_rows, field.type)
            continue
        col = batch[field.name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_timestamp(field.type) and pa.types.is_string(col.type):
            # Arrow casts ISO-8601 strings (incl. fractional seconds)
            col = col.cast(field.type)
        elif pa.types.is_binary(field.type) and pa.types.is_string(col.type):
            col = col.cast(pa.binary())
        elif col.type != field.type:
            col = col.cast(field.type)
        cols[field.name] = col
    return pa.table(cols).cast(PAGES_SCHEMA)


def read_pages(
    path: str,
    *,
    format: str = "parquet",
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Read a pages corpus in any supported format, normalized to
    ``PAGES_SCHEMA``. ``format``: ``parquet`` (canonical; columns pruned
    at the reader), ``jsonl``, or ``csv``."""
    if format == "parquet":
        return rd.read_parquet(path, columns=columns)
    if format == "jsonl":
        ds = rd.read_json(path)
    elif format == "csv":
        # web pages embed newlines inside quoted html fields, which
        # kills Arrow's parallel block splitting WITHIN a file — so
        # parallelism comes from sharded files (write_pages_csv), and
        # each file parses sequentially with newlines_in_values on
        from pyarrow import csv as pacsv

        ds = rd.read_csv(
            path, parse_options=pacsv.ParseOptions(newlines_in_values=True)
        )
    elif format == "ipc":
        # Arrow IPC / Feather-v2: no native Ray reader, so files load
        # file-parallel (the WARC pattern) and decode zero-copy per
        # task — one pa.ipc.open_file per shard, rows stream on
        def decode_ipc(batch: pa.Table) -> pa.Table:
            tables = [
                pa.ipc.open_file(pa.BufferReader(b)).read_all()
                for b in batch["bytes"].to_pylist()
            ]
            if not tables:
                return pa.table({})
            return pa.concat_tables(tables, promote_options="default")

        ds = rd.read_binary_files(path).map_batches(
            decode_ipc, batch_format="pyarrow", batch_size=1
        )
    else:
        raise ValueError(f"unsupported format: {format!r}")
    ds = ds.map_batches(_normalize, batch_format="pyarrow")
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_pages_jsonl(table: pa.Table, path: str) -> None:
    """Test/fixture helper: write a pages table as JSONL (timestamps as
    ISO-8601 strings, html as utf-8 text) — the inverse of the
    ``read_pages(format='jsonl')`` normalization."""
    import json

    with open(path, "w", encoding="utf-8") as f:
        for row in table.to_pylist():
            row = dict(row)
            ts = row.get("warc_ts")
            if ts is not None:
                row["warc_ts"] = ts.isoformat()
            html = row.get("html")
            if isinstance(html, (bytes, bytearray)):
                row["html"] = html.decode("utf-8")
            f.write(json.dumps(row) + "\n")


def write_pages_csv(table: pa.Table, out_dir: str, *, shards: int = 4) -> list[str]:
    """Test/fixture helper: write a pages table as ``shards`` CSV files
    (timestamps as ISO-8601 strings, html as quoted utf-8 text) — the
    inverse of ``read_pages(format='csv')``. Row-range sharding; the
    quoting (embedded commas, quotes AND newlines) is Arrow's."""
    import os

    from pyarrow import csv as pacsv

    as_str = pa.table(
        {
            "url": table["url"],
            "warc_ts": pa.array(
                [t.isoformat() for t in table["warc_ts"].to_pylist()],
                pa.string(),
            ),
            "html": table["html"].cast(pa.string()),
            "text": table["text"],
            "lang": table["lang"],
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    n = as_str.num_rows
    per = max(1, (n + shards - 1) // shards)
    paths = []
    for i in range(shards):
        lo = i * per
        if lo >= n:
            break
        p = os.path.join(out_dir, f"pages-{i:04d}.csv")
        pacsv.write_csv(as_str.slice(lo, per), p)
        paths.append(p)
    return paths


def write_pages_ipc(table: pa.Table, out_dir: str, *, shards: int = 4) -> list[str]:
    """Test/fixture helper: write a pages table as ``shards`` Arrow IPC
    (Feather-v2) files — the inverse of ``read_pages(format='ipc')``.
    Row-range sharding, one ``pa.ipc.new_file`` per shard."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    per = max(1, (n + shards - 1) // shards)
    paths = []
    for i in range(0, shards):
        lo = i * per
        if lo >= n:
            break
        part = table.slice(lo, per)
        p = os.path.join(out_dir, f"pages-{i:04d}.arrow")
        with pa.ipc.new_file(p, part.schema) as w:
            w.write_table(part)
        paths.append(p)
    return paths
