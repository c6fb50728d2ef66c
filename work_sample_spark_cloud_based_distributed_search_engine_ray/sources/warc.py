"""WARC ingestion — the native interchange format of web crawls.

The reference stores crawl output only in its KVS ``pt-crawl`` table
(``crawler/Crawler.java:168-213``); real webtext at 100-TB scale
arrives as WARC (ISO 28500) — Common Crawl alone publishes ~90k
``.warc.gz`` files per monthly snapshot. This module adds WARC as an
ingest edge next to Parquet/JSONL/CSV (``sources/ingest.py``):

- ``read_warc_pages``: a Ray-native reader — ``read_binary_files``
  makes the FILE the unit of parallelism (exactly how Common Crawl is
  consumed: one ~1 GB gzipped WARC per task), then one ``map_batches``
  pass parses records and emits the canonical ``(url, warc_ts, html)``
  columns of ``PAGES_SCHEMA``. Per-record gzip members (the Common
  Crawl convention: each record is its own gzip member, concatenated)
  and plain ``.warc`` both parse; non-``response`` records
  (``warcinfo``, ``request``, ``metadata``) are skipped, matching what
  an indexer consumes.
- ``write_pages_warc``: test/fixture inverse — serializes a pages
  table into sharded WARC files with a leading ``warcinfo`` record so
  the reader's skip path is always exercised.

Scale notes: record parsing is Content-Length-framed and therefore
inherently sequential WITHIN a file, but files parse independently —
the same granularity every production WARC consumer uses. The
per-record loop is over whole documents (kB-MB each), not tokens, so
Python overhead is noise next to gunzip + HTML extraction downstream.
"""

from __future__ import annotations

import gzip
import hashlib
import os

import pyarrow as pa
import ray.data as rd

_CRLF2 = b"\r\n\r\n"


def _build_record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in headers
    )
    return head + b"\r\n" + payload + _CRLF2


def write_pages_warc(
    table: pa.Table,
    out_dir: str,
    *,
    num_shards: int = 4,
    gzip_records: bool = True,
) -> list[str]:
    """Serialize a pages table (``url``, ``warc_ts``, ``html`` used;
    other columns ignored — WARC carries only the wire capture) into
    ``num_shards`` WARC files under ``out_dir``. Row i goes to shard
    ``i % num_shards`` so every shard is non-empty and deterministic.
    Each file leads with a ``warcinfo`` record; each record is its own
    gzip member when ``gzip_records`` (the Common Crawl layout)."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_records else ".warc"
    paths = [
        os.path.join(out_dir, f"shard-{s:03d}{ext}") for s in range(num_shards)
    ]
    urls = table["url"].to_pylist()
    tss = table["warc_ts"].to_pylist()
    htmls = table["html"].to_pylist()

    def emit(f, rec: bytes) -> None:
        f.write(gzip.compress(rec, mtime=0) if gzip_records else rec)

    files = [open(p, "wb") for p in paths]
    try:
        for s, f in enumerate(files):
            info = b"software: wse-ray\r\nformat: WARC File Format 1.0\r\n"
            emit(
                f,
                _build_record(
                    [
                        ("WARC-Type", "warcinfo"),
                        ("WARC-Record-ID", f"<urn:uuid:shard-{s}>"),
                        ("Content-Type", "application/warc-fields"),
                        ("Content-Length", str(len(info))),
                    ],
                    info,
                ),
            )
        for i, (url, ts, html) in enumerate(zip(urls, tss, htmls)):
            body = html if isinstance(html, bytes) else bytes(html or b"")
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode()
                + body
            )
            rec = _build_record(
                [
                    ("WARC-Type", "response"),
                    (
                        "WARC-Record-ID",
                        f"<urn:uuid:{hashlib.md5(url.encode()).hexdigest()}>",
                    ),
                    ("WARC-Date", ts.strftime("%Y-%m-%dT%H:%M:%SZ")),
                    ("WARC-Target-URI", url),
                    ("Content-Type", "application/http; msgtype=response"),
                    ("Content-Length", str(len(http))),
                ],
                http,
            )
            emit(files[i % num_shards], rec)
    finally:
        for f in files:
            f.close()
    return paths


def parse_warc_bytes(raw: bytes) -> tuple[list[str], list[int], list[bytes]]:
    """Parse one WARC file's bytes into parallel (url, ts_us, html)
    lists, keeping only ``response`` records. Content-Length framing
    per the spec; tolerant of both per-record gzip members and
    already-plain input (callers decompress)."""
    urls: list[str] = []
    tss: list[int] = []
    htmls: list[bytes] = []
    pos, n = 0, len(raw)
    while pos < n:
        if raw.startswith(b"\r\n", pos):  # inter-record padding
            pos += 2
            continue
        hdr_end = raw.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in raw[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            # tolerant decode: real crawl WARCs carry occasional raw
            # latin-1 bytes in URIs — one bad record must not abort the
            # whole file's parse
            headers[k.strip().lower().decode("utf-8", "replace")] = v.strip().decode(
                "utf-8", "replace"
            )
        try:
            clen = int(headers.get("content-length", 0))
        except ValueError:
            clen = 0
        payload = raw[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if headers.get("warc-type") != "response":
            continue
        uri = headers.get("warc-target-uri")
        if not uri:
            continue  # malformed response record: skip, don't abort
        from datetime import datetime, timezone

        try:
            dt = datetime.strptime(
                headers.get("warc-date", ""), "%Y-%m-%dT%H:%M:%SZ"
            ).replace(tzinfo=timezone.utc)
        except ValueError:
            continue  # unparsable capture time: skip the record
        http_end = payload.find(_CRLF2)
        body = payload[http_end + 4 :] if http_end >= 0 else payload
        urls.append(uri)
        tss.append(int(dt.timestamp()) * 1_000_000)
        htmls.append(body)
    return urls, tss, htmls


def read_warc_pages(path: str | list[str]) -> rd.Dataset:
    """Read WARC file(s) into the canonical page columns
    ``(url, warc_ts, html)``. File-parallel via ``read_binary_files``
    (each WARC is one block — the Common Crawl task granularity);
    parsing is one ``map_batches`` pass, no shuffle."""

    def parse(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list[int] = []
        htmls: list[bytes] = []
        for buf in batch["bytes"].to_pylist():
            raw = gzip.decompress(buf) if buf[:2] == b"\x1f\x8b" else buf
            u, t, h = parse_warc_bytes(raw)
            urls.extend(u)
            tss.extend(t)
            htmls.extend(h)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
            }
        )

    return rd.read_binary_files(path).map_batches(parse, batch_format="pyarrow")


def stage_warc_pages(path: str | list[str], out_dir: str) -> str:
    """Stage raw WARC file(s) into a canonical pages parquet directory
    — the ingest edge that lets the flagship ``build_index`` consume a
    crawl archive directly (``jobs/build_index.py --format warc``).

    Per batch (one WARC file per block): parse records, extract
    title/text with the SAME pure function the indexer uses
    (``functions/tokenize.extract_html`` — so the downstream
    extraction-verify pass still byte-matches), and assign ``lang`` by
    the stopword argmax vote of the textstats stage (en >= de >= fr tie
    order — WARC carries no language metadata, so it is derived, not
    copied). Output is partitioned parquet; any existing staging dir is
    REPLACED first (Ray's write_parquet appends by default, which would
    silently double every page on a re-run — the resumable unit is the
    downstream build's phase-A manifests, not this staging pass)."""
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.tokenize import extract_html, tokenize_count_batch
    from .pages import DE_STOP, EN_STOP, FR_STOP

    stops = {
        "en": pa.array(EN_STOP, pa.string()),
        "de": pa.array(DE_STOP, pa.string()),
        "fr": pa.array(FR_STOP, pa.string()),
    }

    def enrich(t: pa.Table) -> pa.Table:
        texts = []
        for h in t["html"].to_pylist():
            _title, text = extract_html(h)
            texts.append(text)
        terms, tfs, _dl = tokenize_count_batch(texts)
        flat = terms.flatten()
        weights = tfs.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        parents = pa.ListArray.from_arrays(terms.offsets, flat)
        parent_idx = pc.list_parent_indices(parents).to_numpy(zero_copy_only=False)
        n = t.num_rows
        hits = {}
        for lang, stop in stops.items():
            m = pc.is_in(flat, value_set=stop).to_numpy(zero_copy_only=False)
            hits[lang] = np.bincount(
                parent_idx, weights=m * weights, minlength=n
            ).astype(np.int64)
        en, de, fr = hits["en"], hits["de"], hits["fr"]
        lang = np.where((en >= de) & (en >= fr), "en", np.where(de >= fr, "de", "fr"))
        return pa.table(
            {
                "url": t["url"],
                "warc_ts": t["warc_ts"],
                "html": t["html"],
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(lang.tolist(), pa.string()),
            }
        )

    read_warc_pages(path).map_batches(enrich, batch_format="pyarrow").write_parquet(
        out_dir
    )
    return out_dir
