"""Multi-format ingestion (sources/ingest.py): JSONL/CSV round-trip to
the canonical pages schema, and pipeline-compatibility of the result."""

import os

import pyarrow as pa
import pyarrow.csv as pacsv

from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.ingest import (
    read_pages,
    write_pages_jsonl,
)
from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
    PAGES_SCHEMA,
    pages_parquet,
)


def _fixture_table(n=200):
    import pyarrow.parquet as pq

    return pq.read_table(pages_parquet(n))


def test_jsonl_roundtrip_matches_parquet(tmp_path):
    tbl = _fixture_table()
    p = os.path.join(tmp_path, "pages.jsonl")
    write_pages_jsonl(tbl, p)
    got = read_pages(p, format="jsonl").take_all()
    got_t = pa.Table.from_pylist(got, schema=PAGES_SCHEMA)
    want = tbl.sort_by("url")
    got_t = got_t.sort_by("url")
    assert got_t.schema.equals(PAGES_SCHEMA)
    assert got_t["url"].to_pylist() == want["url"].to_pylist()
    assert got_t["warc_ts"].to_pylist() == want["warc_ts"].to_pylist()
    assert got_t["html"].to_pylist() == want["html"].to_pylist()
    assert got_t["text"].to_pylist() == want["text"].to_pylist()


def test_csv_ingest_normalizes_schema(tmp_path):
    tbl = _fixture_table(50)
    as_str = pa.table(
        {
            "url": tbl["url"],
            "warc_ts": pa.array(
                [t.strftime("%Y-%m-%dT%H:%M:%S") for t in tbl["warc_ts"].to_pylist()]
            ),
            "html": pa.array([h.decode() for h in tbl["html"].to_pylist()]),
            "text": tbl["text"],
            "lang": tbl["lang"],
        }
    )
    p = os.path.join(tmp_path, "pages.csv")
    pacsv.write_csv(as_str, p)
    ds = read_pages(p, format="csv", columns=["url", "html", "lang"])
    got = pa.Table.from_pylist(ds.take_all())
    assert set(got.column_names) == {"url", "html", "lang"}
    assert sorted(got["url"].to_pylist()) == sorted(tbl["url"].to_pylist())


def test_jsonl_feeds_the_extraction_stage(tmp_path):
    import ray.data as rd  # noqa: F401

    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.extract import (
        ExtractDocs,
    )

    tbl = _fixture_table(50)
    p = os.path.join(tmp_path, "pages.jsonl")
    write_pages_jsonl(tbl, p)
    docs = (
        read_pages(p, format="jsonl")
        .map_batches(ExtractDocs, batch_format="pyarrow", concurrency=(1, 2))
        .take_all()
    )
    assert len(docs) == 50
    assert all(d["doc_len"] > 0 for d in docs)

def test_warc_roundtrip_matches_parquet(tmp_path):
    """WARC round-trip (per-record gzip, 4 shards, warcinfo leading
    each shard) recovers url/ts/html exactly, with ts floored to whole
    seconds (the WARC-Date granularity)."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.warc import (
        read_warc_pages,
        write_pages_warc,
    )

    tbl = _fixture_table()
    paths = write_pages_warc(tbl, str(tmp_path / "warc"), num_shards=4)
    assert len(paths) == 4 and all(os.path.exists(p) for p in paths)
    got = pa.Table.from_pylist(read_warc_pages(str(tmp_path / "warc")).take_all())
    got = got.sort_by("url")
    want = tbl.sort_by("url")
    assert got["url"].to_pylist() == want["url"].to_pylist()
    assert got["html"].to_pylist() == want["html"].to_pylist()
    assert [t.replace(microsecond=0) for t in want["warc_ts"].to_pylist()] == got[
        "warc_ts"
    ].to_pylist()


def test_warc_plain_and_skip_nonresponse(tmp_path):
    """Uncompressed .warc parses identically, and non-response records
    (warcinfo) never surface as pages."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.warc import (
        parse_warc_bytes,
        write_pages_warc,
    )

    tbl = _fixture_table(30)
    paths = write_pages_warc(
        tbl, str(tmp_path / "plain"), num_shards=2, gzip_records=False
    )
    n = 0
    for p in paths:
        with open(p, "rb") as f:
            urls, tss, htmls = parse_warc_bytes(f.read())
        assert len(urls) == len(tss) == len(htmls)
        n += len(urls)
    assert n == 30


def test_warc_feeds_the_extraction_stage(tmp_path):
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.warc import (
        read_warc_pages,
        write_pages_warc,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.stages.extract import (
        ExtractDocs,
    )

    tbl = _fixture_table(50)
    write_pages_warc(tbl, str(tmp_path / "warc"), num_shards=3)

    def tag_lang(t: pa.Table) -> pa.Table:
        # WARC carries only the wire capture; lang is assigned
        # downstream (here: constant, in prod: the lang-ID stage)
        return t.append_column("lang", pa.array(["en"] * t.num_rows))

    docs = (
        read_warc_pages(str(tmp_path / "warc"))
        .map_batches(tag_lang, batch_format="pyarrow")
        .map_batches(ExtractDocs, batch_format="pyarrow", concurrency=(1, 2))
        .take_all()
    )
    assert len(docs) == 50
    assert all(d["doc_len"] > 0 for d in docs)


def test_warc_malformed_records_skip_not_abort():
    """One bad record (latin-1 URI bytes, missing WARC-Target-URI, or a
    junk WARC-Date) must be skipped, never abort the file's parse."""
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.warc import (
        _build_record,
        parse_warc_bytes,
    )

    good = _build_record(
        [
            ("WARC-Type", "response"),
            ("WARC-Date", "2026-01-01T00:00:00Z"),
            ("WARC-Target-URI", "http://ok.example/a"),
            ("Content-Length", "20"),
        ],
        b"HTTP/1.1 200 OK\r\n\r\nhi",
    )
    # raw latin-1 byte in the URI header
    bad_uri = good.replace(b"http://ok.example/a", b"http://ex.com/caf\xe9zz")
    no_uri = _build_record(
        [("WARC-Type", "response"), ("WARC-Date", "2026-01-01T00:00:00Z"),
         ("Content-Length", "4")],
        b"body",
    )
    bad_date = _build_record(
        [("WARC-Type", "response"), ("WARC-Date", "not-a-date"),
         ("WARC-Target-URI", "http://x.example/b"), ("Content-Length", "4")],
        b"body",
    )
    urls, tss, htmls = parse_warc_bytes(bad_uri + no_uri + bad_date + good)
    # the latin-1 record parses (replacement char), no-uri and bad-date skip
    assert "http://ok.example/a" in urls
    assert len(urls) == 2 and len(tss) == 2 and len(htmls) == 2


def test_stage_warc_then_build_matches_parquet_build(tmp_path):
    """WARC -> staged pages -> build_index produces the SAME index
    (N, vocabulary df/cf) as building from the original parquet: the
    staging path re-derives text with the indexer's own extractor and
    lang by the stopword vote, so everything downstream byte-matches."""
    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.build_index import (
        build_index,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.pipelines.query import (
        SearchIndex,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_parquet,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.warc import (
        stage_warc_pages,
        write_pages_warc,
    )

    src = pages_parquet(300)
    tbl = pq.read_table(src)
    write_pages_warc(tbl, str(tmp_path / "warc"), num_shards=3)
    staged = stage_warc_pages(str(tmp_path / "warc"), str(tmp_path / "staged"))

    # staged text matches the generator's text byte-for-byte (the
    # extraction-identity invariant), lang is the derived vote
    st = pq.read_table(staged).sort_by("url")
    want = tbl.sort_by("url")
    assert st["text"].to_pylist() == want["text"].to_pylist()
    assert st["html"].to_pylist() == want["html"].to_pylist()

    a = build_index(src, str(tmp_path / "idx_a"), num_partitions=2,
                    hot_df_threshold=100)
    b = build_index(staged, str(tmp_path / "idx_b"), num_partitions=3,
                    hot_df_threshold=100)
    ia, ib = SearchIndex.load(str(tmp_path / "idx_a")), SearchIndex.load(
        str(tmp_path / "idx_b")
    )
    assert ia.N == ib.N
    q = "the tanel"
    assert ia.bm25_topk_exhaustive(q, 10) == ib.bm25_topk_exhaustive(q, 10)


def test_stage_warc_rerun_replaces_not_appends(tmp_path):
    """Re-running the staging pass must REPLACE the staged pages (Ray's
    write_parquet appends by default — an append would silently double
    every page and corrupt the downstream build's N/df/cf)."""
    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_parquet,
    )
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.warc import (
        stage_warc_pages,
        write_pages_warc,
    )

    tbl = pq.read_table(pages_parquet(40))
    write_pages_warc(tbl, str(tmp_path / "warc"), num_shards=2)
    staged = stage_warc_pages(str(tmp_path / "warc"), str(tmp_path / "staged"))
    n1 = pq.read_table(staged).num_rows
    staged = stage_warc_pages(str(tmp_path / "warc"), str(tmp_path / "staged"))
    n2 = pq.read_table(staged).num_rows
    assert n1 == n2 == 40


def test_ipc_round_trip(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.ingest import (
        read_pages,
        write_pages_ipc,
    )

    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.pages import (
        pages_parquet,
    )

    pp = pages_parquet(50)
    t = pq.read_table(pp)
    paths = write_pages_ipc(t, str(tmp_path / "ipc"), shards=3)
    assert len(paths) == 3
    got = (
        read_pages(str(tmp_path / "ipc"), format="ipc")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = t.to_pandas().sort_values("url").reset_index(drop=True)
    assert got.shape == want.shape
    assert (got["url"] == want["url"]).all()
    assert (got["html"] == want["html"]).all()
    assert (got["warc_ts"] == want["warc_ts"]).all()


def test_csv_shards_roundtrip_quoted_newlines(tmp_path):
    # the REAL corpus html embeds newlines/quotes/commas in every row;
    # the sharded CSV round-trip must be byte-lossless through Arrow's
    # quoting + newlines_in_values parsing
    from work_sample_spark_cloud_based_distributed_search_engine_ray.sources.ingest import (
        write_pages_csv,
    )

    tbl = _fixture_table(120)
    assert any(b"\n" in h for h in tbl["html"].to_pylist())
    out = os.path.join(tmp_path, "csv_shards")
    paths = write_pages_csv(tbl, out, shards=3)
    assert len(paths) == 3
    got = read_pages(out, format="csv").take_all()
    got_t = pa.Table.from_pylist(got, schema=PAGES_SCHEMA).sort_by("url")
    want = tbl.sort_by("url")
    assert got_t.schema.equals(PAGES_SCHEMA)
    assert got_t["url"].to_pylist() == want["url"].to_pylist()
    assert got_t["warc_ts"].to_pylist() == want["warc_ts"].to_pylist()
    assert got_t["html"].to_pylist() == want["html"].to_pylist()
    assert got_t["text"].to_pylist() == want["text"].to_pylist()


def test_gzip_jsonl_ingest_matches_plain(tmp_path):
    """Compressed JSONL (the .jsonl.gz shape real dumps arrive in)
    ingests through the same reader — Arrow auto-detects gzip by
    extension — and normalizes to the identical pages table."""
    import gzip

    tbl = _fixture_table()
    plain = os.path.join(tmp_path, "pages.jsonl")
    write_pages_jsonl(tbl, plain)
    gz = os.path.join(tmp_path, "pages.jsonl.gz")
    with open(plain, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    got_plain = pa.Table.from_pylist(
        read_pages(plain, format="jsonl").take_all(), schema=PAGES_SCHEMA
    ).sort_by("url")
    got_gz = pa.Table.from_pylist(
        read_pages(gz, format="jsonl").take_all(), schema=PAGES_SCHEMA
    ).sort_by("url")
    assert got_gz.equals(got_plain)
