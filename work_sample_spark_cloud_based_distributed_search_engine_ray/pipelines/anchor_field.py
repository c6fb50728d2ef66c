"""Anchor text as a REAL index field (round-4 verdict #4).

The reference's crawler extracts ``<a href>(text)</a>`` elements
(``crawler/Crawler.java:421-434``) but its scorer never consumes them
(body-only tf-idf, ``search/Searcher.java:139-150``). The round-3/4
serving-tier form (``SearchIndex.bm25_anchor_boost``) bounded the
endorsement set by the query vocabulary at query time; this module
promotes anchors to a first-class index FIELD built through the same
packed term shuffle as the body index:

1. actor-pool anchor extraction with map-side (dst_url, term, n)
   combine (``stages/crawl.AnchorTermsStage`` — counts, not distinct:
   an anchor field's tf is the number of inbound occurrences);
2. ONE bucketed string join of the normalized targets against the
   canonical doc store urls (off-corpus targets and dedup losers drop
   out — anchor postings exist only for canonical docs);
3. a doc-bucketed pass that finishes the (doc, term) counts and
   computes each doc's anchor-field LENGTH (total inbound anchor
   tokens — the BM25F length-normalization denominator);
4. the term shuffle: per-block ``encode_postings_multi`` pre-encode
   (packed runs), one ``packed_task_groups`` bucket merge
   (``build_index._encode_bucket`` — canonical decode/merge/re-encode,
   so final rows are bit-identical under any partitioning), shard
   parquet + a doc_id-keyed ``anchor_len`` sidecar + ``anchor_meta``.

Query side: ``bm25f_anchor_topk`` scores BM25F (Robertson, Zaragoza &
Taylor 2004) over body+anchor with the anchor field read from its OWN
postings — unlike the boost, an anchor-only match enters the candidate
set; tf' = tf_body + w*tf_anchor, dl' = dl_body + w*anchor_len,
avgdl' = (C_body + w*C_anchor)/N, idf = body idf (anchor-only terms
contribute nothing — the SQL-twin contract).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..functions.codec import decode_postings
from ..functions.hashing import hash64
from ..functions.tokenize import tokenize_query
from ..functions.urls import normalize_seed
from ..stages.crawl import AnchorTermsStage
from ..stages.ops import _bucket_of, tag_union
from ..stages.shuffle import hash_map_groups, packed_task_groups
from .build_index import _encode_bucket, _encoded_table, _fresh_dir, _posting_cols
from .query import SearchIndex, _parquet_files


def _join_and_finish(group: pa.Table) -> pa.Table:
    """One dst_url bucket of the tagged union (anchors side 0:
    (dst_url, term, n) partials; docs side 1: (dst_url, doc_id)) ->
    finished posting rows (term, doc_id, tf, dl=anchor_len) PLUS one
    term=NULL row per doc carrying its field length (the sidecar rides
    the same exchange — split by a per-block filter downstream, no
    extra shuffle). dst_url <-> doc_id is 1:1 and the bucket key is
    dst_url, so a doc's rows are all HERE: both the (doc, term) sum
    and the per-doc length are exact — vectorized Arrow join +
    group_by, no per-doc Python."""
    side = group["__side"]
    left = group.filter(pc.equal(side, 0)).select(["dst_url", "term", "n"])
    right = group.filter(pc.equal(side, 1)).select(["dst_url", "doc_id"])
    g = left.join(right, keys="dst_url", join_type="inner")
    tf = g.group_by(["doc_id", "term"]).aggregate([("n", "sum")])
    alen = tf.group_by(["doc_id"]).aggregate([("n_sum", "sum")])
    al = pc.take(
        alen["n_sum_sum"],
        pc.index_in(tf["doc_id"], value_set=alen["doc_id"].combine_chunks()),
    )
    postings = pa.table(
        {
            "term": tf["term"],
            "doc_id": tf["doc_id"],
            "tf": tf["n_sum"].combine_chunks().cast(pa.int64()),
            "dl": al.cast(pa.int64()),
        }
    )
    lens = pa.table(
        {
            "term": pa.nulls(alen.num_rows, pa.string()),
            "doc_id": alen["doc_id"],
            "tf": pa.nulls(alen.num_rows, pa.int64()),
            "dl": alen["n_sum_sum"].combine_chunks().cast(pa.int64()),
        }
    )
    return pa.concat_tables([postings, lens])


def build_anchor_field(
    pages_path: str,
    index_dir: str,
    *,
    num_shards: int = 4,
    num_buckets: int | None = None,
) -> dict:
    """Build the anchor-field postings under ``index_dir/anchor_shards``
    (+ ``anchor_len`` sidecar + ``anchor_meta.json``). Requires the
    body index (its doc store provides the canonical url -> doc_id
    table). Returns the written meta."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    if num_buckets is None:
        # one group per CPU: the exchange's per-group fixed cost (task +
        # Arrow join setup) dominates past that at sandbox scale, and a
        # bucket is ~|anchors|/num_buckets rows — raise with corpus
        # size so a bucket fits a worker's heap
        num_buckets = max(16, cpus)

    # canonical doc table with the engine's normalized-url join key
    # (normalize_seed — the rule inbound_anchor_query_terms pinned)
    def add_norm(t: pa.Table) -> pa.Table:
        t = t.filter(t["is_canonical"])
        norm = [normalize_seed(u) or "" for u in t["url"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "dst_url": pa.array(norm, pa.string())}
        )

    docs = rd.read_parquet(
        os.path.join(index_dir, "docstore"), columns=["doc_id", "url", "is_canonical"]
    ).map_batches(add_norm, batch_format="pyarrow")

    # extraction with map-side combine -> (dst_url, term, n) partials.
    # AnchorTermsStage holds NO state (module-level compiled regexes),
    # so run it as plain TASKS — an actor pool here would pay ~3-4 s of
    # spin-up for zero reuse benefit (measured: half the build wall)
    # override_num_blocks: the pages corpus is often ONE parquet file
    # with few row groups -> few read tasks -> the fused extraction
    # runs near-serial; force ~2 blocks/CPU (measured 6.0 -> 3.8 s for
    # read+extract at sf0.1/32)
    extract = AnchorTermsStage()
    anchors = rd.read_parquet(
        pages_path, columns=["url", "html"], override_num_blocks=cpus * 2
    ).map_batches(lambda t: extract(t), batch_format="pyarrow")

    # ONE bucketed exchange does join + finish: targets resolve to
    # canonical doc_ids (off-corpus / loser targets drop out at the
    # inner join), (doc, term) sums and per-doc lengths complete inside
    # the bucket (dst_url <-> doc_id is 1:1, so bucketing by dst_url
    # co-locates a doc's rows), and the length sidecar rides the same
    # exchange as term=NULL rows
    tagged = (
        tag_union(anchors, docs, "dst_url")
        .map_batches(
            lambda t: t.append_column("__bucket", _bucket_of(t["dst_url"], num_buckets)),
            batch_format="pyarrow",
        )
        .materialize()
    )
    # task-based packed exchange over the materialized partials (the
    # body build's bucket-merge plan) — plain Ray tasks over
    # range-owned buckets, no aggregator-actor spin-up or per-row
    # routing (measured 13.5 -> ~7 s for the whole exchange at sf0.1)
    both = packed_task_groups(
        tagged, "__bucket", _join_and_finish, num_buckets=num_buckets
    ).materialize()
    resolved = both.map_batches(
        lambda t: t.filter(pc.is_valid(t["term"])), batch_format="pyarrow"
    )
    len_ds = both.map_batches(
        lambda t: t.filter(pc.is_null(t["term"])).select(["doc_id", "dl"]),
        batch_format="pyarrow",
    )

    return _write_field_shards(
        resolved, index_dir, "anchor",
        num_shards=num_shards, num_buckets=num_buckets,
        extra_meta_key="c_anchor", len_ds=len_ds,
    )


def _write_field_shards(
    resolved,
    index_dir: str,
    prefix: str,
    *,
    num_shards: int,
    num_buckets: int,
    extra_meta_key: str | None = None,
    len_ds=None,
) -> dict:
    """Shared tail of every FIELD index build: (term, doc_id, tf,
    dl=field_len) rows -> per-block packed pre-encode
    (``encode_postings_multi``), ONE ``packed_task_groups`` bucket
    merge (the body build's canonical decode/merge/re-encode — final
    rows bit-identical under any partitioning), shard parquet under
    ``<index_dir>/<prefix>_shards`` + a doc_id-keyed
    ``<prefix>_len`` sidecar + ``<prefix>_meta.json``. No salting: a
    field's lists are orders of magnitude shorter than body postings;
    if one ever ran hot, ``build_shards``' salt plan applies
    unchanged."""

    from ..functions.codec import encode_postings_multi

    def pre_encode(batch: pa.Table) -> pa.Table:
        d = batch["term"].combine_chunks().dictionary_encode()
        uniq = d.dictionary
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        enc = encode_postings_multi(
            codes,
            batch["doc_id"].to_numpy(zero_copy_only=False),
            batch["tf"].to_numpy(zero_copy_only=False),
            batch["dl"].to_numpy(zero_copy_only=False),
        )
        terms_out = pc.take(uniq, pa.array(enc["codes_out"]))
        hs = np.fromiter(
            (hash64(t) for t in terms_out.to_pylist()), dtype=np.uint64, count=len(terms_out)
        )
        tbl = _encoded_table(terms_out, enc)
        return tbl.append_column(
            "bucket", pa.array((hs % np.uint64(num_buckets)).astype(np.int64))
        )

    pre = resolved.map_batches(pre_encode, batch_format="pyarrow", batch_size=65536)
    runs = packed_task_groups(pre.materialize(), "bucket", _encode_bucket, num_buckets=num_buckets)

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = pa.array(
            [hash64(t) % num_shards for t in batch["term"].to_pylist()], pa.int64()
        )
        return batch.append_column("shard", shard).select(_posting_cols(False) + ["shard"])

    final = runs.map_batches(add_shard, batch_format="pyarrow").materialize()
    shards_dir = os.path.join(index_dir, f"{prefix}_shards")
    _fresh_dir(shards_dir)
    final.write_parquet(shards_dir, partition_cols=["shard"])

    # doc_id -> field length sidecar. Callers that already produce one
    # exact (doc_id, dl) row per doc pass it as ``len_ds`` (the anchor
    # build emits it from the same join exchange; the title build per
    # batch — the doc store holds one row per doc); otherwise a tiny
    # (doc_id, dl) distinct shuffle derives it from the posting rows.
    if len_ds is None:
        from ..stages.ops import distinct_on

        len_ds = distinct_on(
            resolved.map_batches(
                lambda t: t.select(["doc_id", "dl"]), batch_format="pyarrow"
            ),
            ["doc_id", "dl"],  # dl is constant per doc -> one row per doc
            num_buckets=max(8, num_buckets // 4),
        )
    len_dir = os.path.join(index_dir, f"{prefix}_len")
    _fresh_dir(len_dir)
    len_ds.write_parquet(len_dir)

    c_total = int(resolved.sum("tf") or 0)
    n_docs = pq.read_table(len_dir, columns=["doc_id"]).num_rows
    meta = {
        "c_total": c_total,
        "n_field_docs": n_docs,
        "num_shards": num_shards,
        "field": prefix,
    }
    if extra_meta_key:
        meta[extra_meta_key] = c_total  # legacy alias (anchor_meta.c_anchor)
    with open(os.path.join(index_dir, f"{prefix}_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def build_title_field(
    index_dir: str,
    *,
    num_shards: int = 4,
    num_buckets: int | None = None,
) -> dict:
    """Build a REAL title postings field under
    ``<index_dir>/title_shards`` — closing the documented limitation of
    ``SearchIndex.bm25f_topk`` ('a dedicated title-postings index is
    the corpus-scale form'): with it, a TITLE-ONLY match can enter the
    candidate set and no doc-store fetch happens at scoring time.

    No join and no doc-bucket pass are needed: the doc store holds one
    row per doc, so one vectorized ``tokenize_count_batch`` per batch
    produces exact (term, doc_id, tf, dl=title_len) rows directly —
    the term shuffle is the only exchange."""
    import ray

    from ..functions.tokenize import tokenize_count_batch

    if num_buckets is None:
        num_buckets = max(32, int(ray.cluster_resources().get("CPU", 8)) * 4)

    def title_rows(t: pa.Table) -> pa.Table:
        t = t.filter(t["is_canonical"])
        terms_list, tfs_list, doc_lens = tokenize_count_batch(
            t["title"].combine_chunks()
        )
        parents = pc.list_parent_indices(terms_list)
        lens64 = pa.array(np.asarray(doc_lens, dtype=np.int64))
        postings = pa.table(
            {
                "term": terms_list.flatten(),
                "doc_id": pc.take(t["doc_id"], parents),
                "tf": tfs_list.flatten().cast(pa.int64()),
                "dl": pc.take(lens64, parents),
            }
        )
        # the doc store holds one row per doc, so per-batch len rows
        # are globally exact (term=NULL marker, split downstream)
        keep = pc.greater(lens64, 0)
        n_len = int(pc.sum(pc.cast(keep, pa.int64())).as_py() or 0)
        lens_tbl = pa.table(
            {
                "term": pa.nulls(n_len, pa.string()),
                "doc_id": pc.filter(t["doc_id"].combine_chunks(), keep),
                "tf": pa.nulls(n_len, pa.int64()),
                "dl": pc.filter(lens64, keep),
            }
        )
        return pa.concat_tables([postings, lens_tbl])

    both = (
        rd.read_parquet(
            os.path.join(index_dir, "docstore"),
            columns=["doc_id", "title", "is_canonical"],
        )
        .map_batches(title_rows, batch_format="pyarrow")
        .materialize()
    )
    resolved = both.map_batches(
        lambda t: t.filter(pc.is_valid(t["term"])), batch_format="pyarrow"
    )
    len_ds = both.map_batches(
        lambda t: t.filter(pc.is_null(t["term"])).select(["doc_id", "dl"]),
        batch_format="pyarrow",
    )
    return _write_field_shards(
        resolved, index_dir, "title",
        num_shards=num_shards, num_buckets=num_buckets, len_ds=len_ds,
    )


class FieldReader:
    """Reader over ONE field's postings + length sidecar (anchor,
    title, or any future field built by ``_write_field_shards``)."""

    def __init__(self, index_dir: str, prefix: str):
        self.prefix = prefix
        with open(os.path.join(index_dir, f"{prefix}_meta.json")) as f:
            self.meta = json.load(f)
        self.c_total = self.meta.get("c_total", self.meta.get("c_anchor", 0))
        shards_dir = os.path.join(index_dir, f"{prefix}_shards")
        cols = ["term", "df", "cf", "doc_blob", "tf_blob", "dl_blob"]
        files = _parquet_files(shards_dir)
        self._t = pq.read_table(shards_dir, columns=cols).combine_chunks() if files else None
        self._row = (
            {} if self._t is None else {t: i for i, t in enumerate(self._t["term"].to_pylist())}
        )
        self._cache: dict[str, tuple] = {}
        lt = pq.read_table(os.path.join(index_dir, f"{prefix}_len"))
        ids = lt["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = lt["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        self._len_ids, self._len_vals = ids[order], vals[order]

    def has_term(self, term: str) -> bool:
        return term in self._row

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids ascending, field tfs) — decode-on-demand, cached."""
        p = self._cache.get(term)
        if p is None:
            i = self._row[term]
            ids, tfs, _dls = decode_postings(
                self._t["doc_blob"][i].as_py(),
                self._t["tf_blob"][i].as_py(),
                self._t["dl_blob"][i].as_py(),
                self._t["df"][i].as_py(),
            )
            p = (ids, tfs)
            self._cache[term] = p
        return p

    def alen(self, doc_ids: np.ndarray) -> np.ndarray:
        """Field length per doc (0 for docs without the field) — one
        searchsorted over the sorted sidecar."""
        if self._len_ids.size == 0:
            return np.zeros(doc_ids.size, dtype=np.int64)
        pos = np.searchsorted(self._len_ids, doc_ids)
        pos_c = np.minimum(pos, self._len_ids.size - 1)
        hit = self._len_ids[pos_c] == doc_ids
        return np.where(hit, self._len_vals[pos_c], 0)


class AnchorField(FieldReader):
    """Anchor-field reader (back-compat name + ``c_anchor`` alias)."""

    def __init__(self, index_dir: str):
        super().__init__(index_dir, "anchor")
        self.c_anchor = self.c_total


class TitleField(FieldReader):
    def __init__(self, index_dir: str):
        super().__init__(index_dir, "title")


def bm25f_fields_topk(
    idx: SearchIndex,
    fields: "list[tuple[FieldReader, float]]",
    query: str,
    k: int = 10,
) -> list[tuple[int, int]]:
    """Multi-field BM25F (Robertson, Zaragoza & Taylor 2004) over the
    body plus any number of INDEXED fields:

        tf'  = tf_body + sum_i w_i * tf_field_i
        dl'  = dl_body + sum_i w_i * len_field_i
        avg' = (C_body + sum_i w_i * C_field_i) / N
        score = sum_t idf_body(t) * tf'*(k1+1) / (tf' + k1*((1-b) + b*dl'/avg'))

    Candidates = docs matching >= 1 body-present query term in the
    body OR any field (a field-only match enters — the point of real
    field postings vs query-time boosts/re-ranks). Field-only
    candidates' body dl comes from bounded DocStore point reads.
    All-float kernel e6-quantized at the end; ties (e6 desc, doc_id
    asc). Returns [(doc_id, bm25f_e6)]."""
    q_terms = sorted({t for t in tokenize_query(query) if idx.has_term(t)})
    if not q_terms:
        return []
    parts = []
    for t in q_terms:
        parts.append(idx.postings(t).ids)
        for fr, _w in fields:
            if fr.has_term(t):
                parts.append(fr.postings(t)[0])
    cand = np.unique(np.concatenate(parts))
    # body dl per candidate: from any body-posting hit; field-only
    # candidates fall back to the doc store's doc_len (bounded point
    # reads — at corpus scale a doc-range-sharded dl table)
    dlb = np.full(cand.size, -1, dtype=np.int64)
    for t in q_terms:
        p = idx.postings(t)
        pos = np.minimum(np.searchsorted(p.ids, cand), p.ids.size - 1)
        hit = p.ids[pos] == cand
        dlb[hit] = p.dls[pos[hit]]
    miss = np.flatnonzero(dlb < 0)
    if miss.size:
        rows = idx._store().lookup([int(cand[i]) for i in miss])
        for i in miss:
            r = rows.get(int(cand[i]))
            dlb[i] = int(r["doc_len"]) if r is not None else 0
    avgdlf = (
        float(idx.meta["total_len"])
        + sum(w * float(fr.c_total) for fr, w in fields)
    ) / float(idx.N)
    dlf = dlb.astype(np.float64)
    for fr, w in fields:
        dlf = dlf + w * fr.alen(cand).astype(np.float64)
    k1, b = idx.k1, idx.b
    score = np.zeros(cand.size, np.float64)
    for t in q_terms:
        p = idx.postings(t)
        pos = np.minimum(np.searchsorted(p.ids, cand), p.ids.size - 1)
        hit = p.ids[pos] == cand
        tfp = np.where(hit, p.tfs[pos], 0).astype(np.float64)
        for fr, w in fields:
            if fr.has_term(t):
                f_ids, f_tfs = fr.postings(t)
                fpos = np.minimum(np.searchsorted(f_ids, cand), f_ids.size - 1)
                fhit = f_ids[fpos] == cand
                tff = np.zeros(cand.size, np.float64)
                tff[fhit] = f_tfs[fpos[fhit]]
                tfp = tfp + w * tff
        idf = idx.bm25_idf(p.df)
        with np.errstate(invalid="ignore", divide="ignore"):
            contrib = np.where(
                tfp > 0,
                idf * ((tfp * (k1 + 1.0)) / (tfp + k1 * ((1.0 - b) + b * dlf / avgdlf))),
                0.0,
            )
        score += contrib
    e6 = np.rint(score * 1e6).astype(np.int64)
    keep = e6 > 0
    cand, e6 = cand[keep], e6[keep]
    order = np.lexsort((cand, -e6))[:k]
    return [(int(cand[i]), int(e6[i])) for i in order]


def bm25f_anchor_topk(
    idx: SearchIndex, af: "FieldReader", query: str, k: int = 10, *, w: float = 2.0
) -> list[tuple[int, int]]:
    """BM25F over body + the indexed anchor field (single-field case of
    ``bm25f_fields_topk`` — identical float kernel and op order)."""
    return bm25f_fields_topk(idx, [(af, w)], query, k)
