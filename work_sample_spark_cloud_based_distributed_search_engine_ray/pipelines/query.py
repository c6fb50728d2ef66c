"""Query engine: BM25 top-k (exhaustive + Block-Max WAND) and the
pinned reference tf-idf scorer, over the compressed shards.

Replaces ``search/Searcher.java`` wholesale while preserving its
semantics where required:

- Query normalization = canonical tokenizer + set-dedup of terms
  (``Searcher.java:39-42``).
- Reference scorer (``reference_topk``): ``score(d) = sum over matched
  query terms of log10(N/df) * (1 + log10(tf))``, admission threshold
  ``score > 0.3``, top 300 (``Searcher.java:108-198``). The reference's
  tie order is its KVS scan order (unreproducible); we pin the
  deterministic tie-break (score desc, doc_id asc) — documented
  deviation.
- BM25 (primary scorer, per north_rule): Lucene-style non-negative
  ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``,
  ``tf_part = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``, k1/b pinned
  in ``meta.json`` so N- and 4N-parallelism builds score identically.

The anti-pattern fixed: the reference re-scans the WHOLE ``urls`` table
into driver RAM on EVERY query (``Searcher.java:44-57``); here result
assembly is a by-id binary search over doc-store row-group statistics
(``DocStore``), and scoring touches only the query terms' postings.
"""

from __future__ import annotations

import json
import math
import os
from types import SimpleNamespace

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.codec import (
    BLOCK,
    decode_position_stream,
    decode_postings,
    decode_runs_concat,
)
from ..functions.tokenize import tokenize, tokenize_query

INF = np.iinfo(np.int64).max


def _parquet_files(root: str) -> list[str]:
    out = []
    for r, _d, names in os.walk(root):
        out.extend(os.path.join(r, n) for n in names if n.endswith(".parquet"))
    return sorted(out)


class DocStore:
    """By-id lookup over the doc-id-sorted doc store parquet.

    Uses row-group min/max statistics to read only the row groups that
    can contain the requested ids — the scale path for assembling top-k
    results without scanning the store (contrast ``Searcher.java:44-57``).
    The store is written with 2048-row groups (``write_docstore``) so a
    point lookup decompresses ~2k bodies, not a 100k-row file; on top
    of that a bounded per-doc LRU serves repeated hot docs without any
    parquet read, and file handles (footer parses) are cached. Lookup
    is thread-safe (the serving tier is a thread-per-connection HTTP
    server) — parquet reads serialize on one lock per store, which at
    scale is per shard ACTOR, so cross-shard reads still overlap.
    """

    DOC_CACHE = 8192  # LRU entries (~8k bodies, a few tens of MB)

    def __init__(self, path: str):
        import threading
        from collections import OrderedDict

        self._lock = threading.Lock()
        self._pf: dict[str, "pq.ParquetFile"] = {}
        self._docs: OrderedDict[int, dict] = OrderedDict()
        entries: list[tuple[str, int, int, int]] = []  # (file, rg, min_id, max_id)
        for f in _parquet_files(path):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().names.index("doc_id")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                entries.append((f, rg, st.min, st.max))
        entries.sort(key=lambda e: (e[2], e[3]))
        self.files = entries
        self._mins = np.array([e[2] for e in entries], dtype=np.int64)
        self._maxs = np.array([e[3] for e in entries], dtype=np.int64)
        # The store is written doc_id-sorted, so row-group id ranges are
        # disjoint; when they are, id -> row group is one searchsorted.
        self._disjoint = bool(np.all(self._maxs[:-1] < self._mins[1:]))

    def lookup(self, doc_ids: list[int]) -> dict[int, dict]:
        out: dict[int, dict] = {}
        if not len(self.files):
            return out
        ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
        # hot docs straight from the LRU; only misses touch parquet.
        # Returned rows are SHALLOW COPIES: callers may attach fields
        # (e.g. a snippet) without corrupting the shared cache entry.
        with self._lock:
            missing = []
            for i in ids:
                row = self._docs.get(int(i))
                if row is not None:
                    self._docs.move_to_end(int(i))
                    out[int(i)] = dict(row)
                else:
                    missing.append(int(i))
        if not missing:
            return out
        ids = np.asarray(missing, dtype=np.int64)
        if self._disjoint:
            # O(n_ids * log RG): locate each id's candidate row group
            pos = np.searchsorted(self._mins, ids, side="right") - 1
            ok = (pos >= 0) & (ids <= self._maxs[np.clip(pos, 0, None)])
            pos, ids = pos[ok], ids[ok]
            groups = [(rg_i, ids[pos == rg_i]) for rg_i in np.unique(pos)]
        else:
            # overlapping ranges (unsorted store): binary-search the
            # sorted id list against every row-group range instead of a
            # per-rowgroup scan of the whole want set
            groups = []
            for i, (_f, _rg, lo, hi) in enumerate(self.files):
                s, e = np.searchsorted(ids, [lo, hi + 1])
                if e > s:
                    groups.append((i, ids[s:e]))
        with self._lock:
            for rg_i, hits in groups:
                f, rg, _lo, _hi = self.files[rg_i]
                pf = self._pf.get(f)
                if pf is None:
                    pf = self._pf[f] = pq.ParquetFile(f)
                t = pf.read_row_group(rg)
                mask = pc.is_in(t["doc_id"], value_set=pa.array(hits, pa.int64()))
                for row in t.filter(mask).to_pylist():
                    out[row["doc_id"]] = dict(row)
                    self._docs[row["doc_id"]] = row
                    self._docs.move_to_end(row["doc_id"])
            while len(self._docs) > self.DOC_CACHE:
                self._docs.popitem(last=False)
        return out


class _Postings:
    __slots__ = (
        "df", "cf", "ids", "tfs", "dls",
        "block_last", "block_max_tf", "block_min_dl",
        "pos_flat", "pos_bounds",
    )

    def __init__(
        self, df, cf, ids, tfs, dls, block_last, block_max_tf, block_min_dl,
        pos_flat=None, pos_bounds=None,
    ):
        self.df, self.cf = df, cf
        self.ids, self.tfs, self.dls = ids, tfs, dls
        self.block_last, self.block_max_tf = block_last, block_max_tf
        self.block_min_dl = block_min_dl
        # format 3: flat token positions + per-posting bounds —
        # posting i's positions are pos_flat[pos_bounds[i]:pos_bounds[i+1]]
        self.pos_flat, self.pos_bounds = pos_flat, pos_bounds

    def positions_at(self, i: int) -> np.ndarray:
        return self.pos_flat[self.pos_bounds[i] : self.pos_bounds[i + 1]]


def _elem_view(arr: pa.Array, i: int) -> memoryview:
    """Zero-copy view of element ``i`` of a single-chunk (large_)binary
    array — no per-element bytes allocation, no blob copy."""
    wide = pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type)
    dt = np.int64 if wide else np.int32
    off = np.frombuffer(
        arr.buffers()[1], dtype=dt, count=len(arr) + 1, offset=arr.offset * dt(0).itemsize
    )
    data = arr.buffers()[2]
    if data is None:
        return memoryview(b"")
    return memoryview(data)[int(off[i]) : int(off[i + 1])]


class _LazyPostings:
    """Block-grained lazy view of one term's postings (index format 4:
    shard rows carry per-block BYTE offsets into each varint stream,
    and the codec restarts the doc-id delta chain at every block start
    — ``functions/codec.py:encode_postings_multi``). The vectorized
    WAND path (`SearchIndex._wand_vec`) builds its interval grid and
    upper bounds from block METADATA alone and materializes only
    ADMITTED intervals' blocks, so a cold query term's decode cost is
    proportional to the blocks that survive the theta bound, not df.

    Falls back to wrapping an already-decoded `_Postings` (zero decode,
    slicing views) when the term is warm or the index predates the
    offset columns."""

    __slots__ = (
        "df", "block_last", "block_max_tf", "block_min_dl",
        "_full", "_doc_mv", "_tf_mv", "_dl_mv",
        "_doc_off", "_tf_off", "_dl_off", "_blocks", "decoded_blocks",
    )

    def __init__(self, df, block_last, block_max_tf, block_min_dl, *,
                 full: "_Postings | None" = None,
                 blob_views=None, block_offs=None):
        self.df = df
        self.block_last = block_last
        self.block_max_tf = block_max_tf
        self.block_min_dl = block_min_dl
        self._full = full
        if full is None:
            self._doc_mv, self._tf_mv, self._dl_mv = blob_views
            self._doc_off, self._tf_off, self._dl_off = block_offs
        self._blocks: dict[int, tuple] = {}
        self.decoded_blocks = 0  # instrumentation: blocks actually decoded

    def _block_bytes(self, mv, offs, bi: int):
        end = int(offs[bi + 1]) if bi + 1 < offs.size else len(mv)
        return mv[int(offs[bi]) : end]

    def ensure(self, bis: np.ndarray) -> None:
        """Decode the given blocks if not yet cached — ONE batched
        varint decode across all missing blocks (each block's delta
        chain restarts at its start, so concatenated block slices
        decode as independent runs). Once admission has touched half
        the list, per-block batching has lost to the single big
        vectorized decode — promote to a one-shot full decode (cost
        bounded at ~the eager path; the ∝-admitted property holds
        whenever pruning actually prunes)."""
        if self._full is not None:
            return
        missing = [int(b) for b in bis if int(b) not in self._blocks]
        if not missing:
            return
        nblocks = self.block_last.size
        if len(self._blocks) + len(missing) > nblocks // 4:
            ids, tfs, dls = decode_runs_concat(
                self._doc_mv, self._tf_mv, self._dl_mv,
                np.array([self.df], dtype=np.int64),
            )
            self._full = SimpleNamespace(ids=ids, tfs=tfs, dls=dls)
            self._blocks.clear()
            self.decoded_blocks = nblocks
            return
        ns = np.array(
            [min(BLOCK, self.df - b * BLOCK) for b in missing], dtype=np.int64
        )
        doc_b = b"".join(self._block_bytes(self._doc_mv, self._doc_off, b) for b in missing)
        tf_b = b"".join(self._block_bytes(self._tf_mv, self._tf_off, b) for b in missing)
        dl_b = b"".join(self._block_bytes(self._dl_mv, self._dl_off, b) for b in missing)
        ids, tfs, dls = decode_runs_concat(doc_b, tf_b, dl_b, ns)
        starts = np.concatenate(([0], np.cumsum(ns)))
        for j, b in enumerate(missing):
            s, e = starts[j], starts[j + 1]
            self._blocks[b] = (ids[s:e], tfs[s:e], dls[s:e])
        self.decoded_blocks += len(missing)

    def block(self, bi: int) -> tuple:
        if self._full is not None:
            p = self._full
            s, e = bi * BLOCK, min((bi + 1) * BLOCK, self.df)
            return p.ids[s:e], p.tfs[s:e], p.dls[s:e]
        return self._blocks[bi]

    def cat(self, ubis: np.ndarray) -> tuple:
        """(ids, tfs, dls) of the given blocks concatenated in
        ASCENDING block order — blocks are disjoint ascending doc-id
        ranges, so the result is globally sorted and `searchsorted`
        probes against it resolve interval slices in one vectorized
        call. Warm wraps return the full arrays (same sorted-probe
        semantics, zero copies)."""
        if self._full is not None:
            p = self._full
            return p.ids, p.tfs, p.dls
        self.ensure(ubis)
        if self._full is not None:  # ensure() may promote to full decode
            p = self._full
            return p.ids, p.tfs, p.dls
        if ubis.size == 1:
            return self._blocks[int(ubis[0])]
        parts = [self._blocks[int(b)] for b in ubis]
        return (
            np.concatenate([x[0] for x in parts]),
            np.concatenate([x[1] for x in parts]),
            np.concatenate([x[2] for x in parts]),
        )


class SearchIndex:
    """In-process reader over the built index.

    At sandbox scale all shard rows load into one dict; the layout is
    shard-partitioned by hash(term) so a multi-node serving tier loads
    only its shards (``shard = hash64(term) % num_shards``,
    replacing the reference's range-partitioned KVS routing
    ``kvs/KVSClient.java:188-198``).
    """

    def __init__(self, meta: dict, shard_table: pa.Table, docstore_path: str):
        self.meta = meta
        self.N = meta["N"]
        self.avgdl = meta["avgdl"] or 1.0
        self.k1 = meta["k1"]
        self.b = meta["b"]
        # lazy postings: blobs stay packed in the Arrow shard table;
        # a term is decoded on first access and cached. Loading the
        # index is therefore O(shard bytes) I/O with NO decode work —
        # per-query cost touches only the query terms' postings. Doc
        # lengths are IN the postings (dl_blob), so no doc-length side
        # table is loaded: a serving shard holds 1/num_shards of the
        # index, full stop.
        self._shards = shard_table
        # shard_table is None for an EMPTY index (no parquet under
        # shards/ — e.g. a zero-doc build, or a serving shard that owns
        # no terms): every query then takes the has_term=False path
        self._term_row = (
            {} if shard_table is None else {t: i for i, t in enumerate(shard_table["term"].to_pylist())}
        )
        self._cache: dict[str, _Postings] = {}
        self._docstore: DocStore | None = None
        self._docstore_path = docstore_path

    # ---------------- loading ----------------

    @classmethod
    def load(cls, out_dir: str):
        # a segmented index (pipelines.segments — the O(delta)
        # incremental-update layout) loads as the segment-union reader;
        # its BM25 surface is bit-identical to this class's
        if os.path.exists(os.path.join(out_dir, "segments.json")):
            from .segments import SegmentedIndex

            return SegmentedIndex(out_dir)
        with open(os.path.join(out_dir, "meta.json")) as f:
            meta = json.load(f)
        shards_dir = os.path.join(out_dir, "shards")
        cols = [
            "term", "df", "cf", "doc_blob", "tf_blob", "dl_blob",
            "block_last_id", "block_max_tf", "block_min_dl",
        ]
        if meta.get("positions"):
            cols.append("pos_blob")
        files = _parquet_files(shards_dir)
        if files:
            # format 4 (lazy per-block byte offsets): present on any
            # current build; older indexes load fine without them
            # (eager full decode per term, the pre-format-4 behavior)
            names = set(pq.read_schema(files[0]).names)
            cols += [c for c in ("block_doc_off", "block_tf_off", "block_dl_off") if c in names]
        shard_table = (
            pq.read_table(shards_dir, columns=cols).combine_chunks() if files else None
        )
        return cls(meta, shard_table, os.path.join(out_dir, "docstore"))

    @property
    def has_positions(self) -> bool:
        return bool(self.meta.get("positions"))

    def has_term(self, term: str) -> bool:
        return term in self._term_row

    @property
    def terms(self) -> "_TermMap":
        """Lazy mapping view term -> _Postings (decodes on access)."""
        return _TermMap(self)

    def postings(self, term: str) -> _Postings:
        """Decode-on-demand postings (cached)."""
        p = self._cache.get(term)
        if p is None:
            i = self._term_row[term]
            df = self._shards["df"][i].as_py()
            ids, tfs, dls = decode_postings(
                self._shards["doc_blob"][i].as_py(),
                self._shards["tf_blob"][i].as_py(),
                self._shards["dl_blob"][i].as_py(),
                df,
            )
            pos_flat = pos_bounds = None
            if self.has_positions:
                pos_flat = decode_position_stream(
                    self._shards["pos_blob"][i].as_py(), tfs
                )
                pos_bounds = np.concatenate(([0], np.cumsum(tfs)))
            p = _Postings(
                df,
                self._shards["cf"][i].as_py(),
                ids,
                tfs,
                dls,
                np.asarray(self._shards["block_last_id"][i].as_py(), dtype=np.int64),
                np.asarray(self._shards["block_max_tf"][i].as_py(), dtype=np.int64),
                np.asarray(self._shards["block_min_dl"][i].as_py(), dtype=np.int64),
                pos_flat=pos_flat,
                pos_bounds=pos_bounds,
            )
            self._cache[term] = p
        return p

    def term_df(self, term: str) -> int:
        """df from shard-row METADATA — no posting decode (the DAAT
        method dispatch sizes the query without touching blobs)."""
        p = self._cache.get(term)
        if p is not None:
            return p.df
        return self._shards["df"][self._term_row[term]].as_py()

    def lazy_postings(self, term: str) -> _LazyPostings:
        """Block-lazy postings view (format 4). Warm terms wrap the
        decoded cache; cold terms expose zero-copy blob views + block
        metadata and decode only the blocks the caller admits."""
        full = self._cache.get(term)
        if full is not None:
            # warm: metadata and blocks come straight off the decoded
            # cache — no shard-table touch (also keeps bare in-memory
            # test indexes without ``_shards`` working)
            return _LazyPostings(
                full.df, full.block_last, full.block_max_tf, full.block_min_dl, full=full
            )
        lazy = getattr(self, "_lazy_cache", None)
        if lazy is None:
            lazy = self._lazy_cache = {}
        cached = lazy.get(term)
        if cached is not None:
            return cached
        i = self._term_row[term]
        block_last = np.asarray(self._shards["block_last_id"][i].as_py(), dtype=np.int64)
        block_max_tf = np.asarray(self._shards["block_max_tf"][i].as_py(), dtype=np.int64)
        block_min_dl = np.asarray(self._shards["block_min_dl"][i].as_py(), dtype=np.int64)
        df = self._shards["df"][i].as_py()
        if "block_doc_off" in self._shards.column_names:
            # the table is combine_chunks()'d at load: chunk(0) IS the
            # column, zero-copy (ChunkedArray.combine_chunks would copy
            # the whole blob column on every cold term — measured 21 ms)
            chunk = lambda c: (
                self._shards[c].chunk(0)
                if self._shards[c].num_chunks == 1
                else self._shards[c].combine_chunks()
            )
            p = _LazyPostings(
                df, block_last, block_max_tf, block_min_dl,
                blob_views=(
                    _elem_view(chunk("doc_blob"), i),
                    _elem_view(chunk("tf_blob"), i),
                    _elem_view(chunk("dl_blob"), i),
                ),
                block_offs=(
                    np.asarray(self._shards["block_doc_off"][i].as_py(), dtype=np.int64),
                    np.asarray(self._shards["block_tf_off"][i].as_py(), dtype=np.int64),
                    np.asarray(self._shards["block_dl_off"][i].as_py(), dtype=np.int64),
                ),
            )
            lazy[term] = p  # decoded blocks persist across queries
            return p
        # warm term (or pre-format-4 index): wrap the full decode
        return _LazyPostings(df, block_last, block_max_tf, block_min_dl, full=self.postings(term))

    # ---------------- BM25 ----------------

    def bm25_idf(self, df: int) -> float:
        return math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))

    def _bm25_tf_part(self, tfs: np.ndarray, dls: np.ndarray) -> np.ndarray:
        k1, b = self.k1, self.b
        return tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / self.avgdl))

    def bm25_topk_exhaustive(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Score every posting of every query term (the correctness
        baseline WAND is checked against)."""
        q_terms = [t for t in tokenize_query(query) if self.has_term(t)]
        if not q_terms:
            return []
        all_ids, all_scores = [], []
        for t in q_terms:
            p = self.postings(t)
            all_ids.append(p.ids)
            all_scores.append(self.bm25_idf(p.df) * self._bm25_tf_part(p.tfs.astype(np.float64), p.dls.astype(np.float64)))
        ids = np.concatenate(all_ids)
        scores = np.concatenate(all_scores)
        uniq, inv = np.unique(ids, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(acc, inv, scores)
        return _topk(uniq, acc, k)

    def bm25_topk_global(
        self,
        query: str,
        k: int = 10,
        *,
        n_global: int,
        avgdl_global: float,
        df_global: dict[str, int],
    ) -> list[tuple[int, float]]:
        """Exhaustive BM25 over THIS shard's postings with GLOBAL
        corpus statistics — the doc-range-sharded serving building
        block (each shard holds a disjoint doc range, so every doc's
        score is complete on its own shard and a cross-shard top-k
        merge is exact). Bit-identical to the single-index scorer:
        same term iteration order (locally absent terms skip without
        disturbing a doc's summation order), same float kernels.
        """
        q_terms = [t for t in tokenize_query(query) if self.has_term(t)]
        if not q_terms:
            return []
        k1, b = self.k1, self.b
        all_ids, all_scores = [], []
        for t in q_terms:
            p = self.postings(t)
            df = df_global.get(t, p.df)
            idf = math.log(1.0 + (n_global - df + 0.5) / (df + 0.5))
            tfs = p.tfs.astype(np.float64)
            dls = p.dls.astype(np.float64)
            part = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl_global))
            all_ids.append(p.ids)
            all_scores.append(idf * part)
        ids = np.concatenate(all_ids)
        scores = np.concatenate(all_scores)
        uniq, inv = np.unique(ids, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(acc, inv, scores)
        return _topk(uniq, acc, k)

    def bm25_weighted_topk(
        self, weighted_terms: list[tuple[str, float]], k: int = 10
    ) -> list[tuple[int, float]]:
        """Exhaustive BM25 with a per-term weight multiplier — the
        round-2 scorer of pseudo-relevance-feedback expansion (original
        terms weight 1.0, expansion terms a damping like 0.5). Same
        vectorized kernel as ``bm25_topk_exhaustive``; a term absent
        from the index contributes nothing."""
        pairs = [(t, w) for t, w in weighted_terms if self.has_term(t)]
        if not pairs:
            return []
        all_ids, all_scores = [], []
        for t, w in pairs:
            p = self.postings(t)
            all_ids.append(p.ids)
            all_scores.append(
                w
                * self.bm25_idf(p.df)
                * self._bm25_tf_part(p.tfs.astype(np.float64), p.dls.astype(np.float64))
            )
        ids = np.concatenate(all_ids)
        scores = np.concatenate(all_scores)
        uniq, inv = np.unique(ids, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(acc, inv, scores)
        return _topk(uniq, acc, k)

    # Below this many total candidate postings, the vectorized
    # exhaustive scorer beats even the VECTORIZED block-max WAND (the
    # interval-grid setup costs ~0.1 ms; numpy streams ~10^8
    # postings/s, so small lists are cheaper to just score). Measured
    # crossover at sf0.1 (97k docs): ~15-20k postings — above it the
    # vectorized WAND/MaxScore win and keep winning (p95 5.7/5.0 ms vs
    # 9.9 ms exhaustive at sf0.1; the retired-to-``*_scalar`` Python
    # DAAT loops were 548 ms). Both produce bit-identical rankings
    # (tests assert it) — the cutover is purely a latency choice.
    WAND_MIN_POSTINGS = 16_384

    def bm25_topk(self, query: str, k: int = 10, method: str = "auto") -> list[tuple[int, float]]:
        """BM25 top-k. ``method``: 'auto' (size-dispatched), 'wand',
        'maxscore', 'wand_scalar', 'maxscore_scalar', or 'exhaustive'.

        'wand' / 'maxscore' are the VECTORIZED block-max DAAT paths
        (``_wand_vec`` / ``_maxscore_vec``): the per-doc inner loop is
        numpy block-at-a-time — candidate generation under the
        per-block upper bounds (skip pointers = per-block last doc_id;
        bound = block-max tf at the block-min dl, valid since the BM25
        term score is increasing in tf and decreasing in dl), exact
        rescoring with the exhaustive scorer's own float kernel and
        term-order accumulation, so results are bit-identical to
        ``bm25_topk_exhaustive`` at every k (tests assert it). The
        ``*_scalar`` variants keep the document-at-a-time Python
        reference loops (round-3 verdict: ~1 us/doc of Python per
        cursor advance — 25-70x the vectorized TAAT scorer; retained
        for A/B tests and as the textbook form)."""
        q_terms = [t for t in tokenize_query(query) if self.has_term(t)]
        if not q_terms:
            return []
        if method not in ("wand", "maxscore", "wand_scalar", "maxscore_scalar"):
            # metadata-only sizing: a cold query dispatches to WAND
            # without decoding a single posting (format-4 lazy path)
            total = sum(self.term_df(t) for t in q_terms)
            if method == "exhaustive" or total < self.WAND_MIN_POSTINGS:
                return self.bm25_topk_exhaustive(query, k)
            method = "wand"
        if method == "wand":
            return self._wand_vec(q_terms, k)
        if method == "maxscore":
            return self._maxscore_vec(q_terms, k)
        cursors = []
        for t in q_terms:
            p = self.postings(t)
            idf = self.bm25_idf(p.df)
            # per-block upper bound: max tf and min dl over THE block
            # (score increases in tf, decreases in dl) — tighter than a
            # global min_dl, valid per block, and self-contained in the
            # shard row
            block_ub = idf * self._bm25_tf_part(
                p.block_max_tf.astype(np.float64), p.block_min_dl.astype(np.float64)
            )
            cursors.append(
                _Cursor(p.ids, p.tfs, p.dls, idf, p.block_last, block_ub, order=len(cursors))
            )
        if method == "maxscore_scalar":
            return self._maxscore(cursors, k)
        return self._wand(cursors, k)

    # ---------------- vectorized block-max DAAT ----------------

    def _term_arrays(self, q_terms: list[str]):
        """(postings, idf, per-block ub) per query term, in query-term
        order — the shared setup of both vectorized DAAT paths."""
        plist, idfs, blocks = [], [], []
        for t in q_terms:
            p = self.postings(t)
            idf = self.bm25_idf(p.df)
            plist.append(p)
            idfs.append(idf)
            blocks.append(
                idf
                * self._bm25_tf_part(
                    p.block_max_tf.astype(np.float64),
                    p.block_min_dl.astype(np.float64),
                )
            )
        return plist, idfs, blocks

    def _lazy_term_arrays(self, q_terms: list[str]):
        """(lazy postings, idf, per-block ub) per query term — built
        from shard-row METADATA only (df, block arrays); no posting
        blob is decoded here."""
        plist, idfs, blocks = [], [], []
        for t in q_terms:
            p = self.lazy_postings(t)
            idf = self.bm25_idf(p.df)
            plist.append(p)
            idfs.append(idf)
            blocks.append(
                idf
                * self._bm25_tf_part(
                    p.block_max_tf.astype(np.float64),
                    p.block_min_dl.astype(np.float64),
                )
            )
        return plist, idfs, blocks

    def _wand_vec(
        self, q_terms: list[str], k: int, batch_intervals: int = 64
    ) -> list[tuple[int, float]]:
        """Vectorized Block-Max WAND: the doc space is cut into
        intervals at every term's block boundaries (each interval lies
        inside exactly one block per term, so its upper bound is the
        SUM of the covering blocks' bounds — the same bound scalar WAND
        refines to); intervals are admitted in DESCENDING bound order
        and rescored exactly, batch-at-a-time, until the next bound
        falls below theta (the current k-th best exact score) — at
        which point no remaining interval can contain a top-k doc.
        Skipping is strict (<), so equal-score boundary docs are always
        examined and final ties break by doc_id in ``_topk``, exactly
        like the exhaustive scorer. The per-posting Python of the
        scalar loop becomes ~1 numpy slice per (term x admitted
        interval) — block-at-a-time, as the round-3 verdict prescribed.

        Format 4 (round-5): the grid and every upper bound come from
        block METADATA; posting bytes are decoded per ADMITTED block
        only (``_LazyPostings.ensure`` — batched varint decode over the
        admitted blocks' byte slices, possible because the delta chain
        restarts at each block start and shard rows store per-block
        byte offsets). Decode cost is therefore proportional to the
        blocks that survive the theta bound, not to df; warm terms
        reuse the full decoded cache. Bit-identical to the exhaustive
        scorer at every k (tests assert it): the admitted slices are
        the same id-ranges the eager path sliced, concatenated in the
        same (batch, query-term) order."""
        plist, idfs, blocks = self._lazy_term_arrays(q_terms)
        # interval grid: union of block-last boundaries; interval j is
        # (bnds[j-1], bnds[j]] in doc-id space
        bnds = np.unique(np.concatenate([p.block_last for p in plist]))
        n_int = bnds.size
        ub = np.zeros(n_int, dtype=np.float64)
        for p, bub in zip(plist, blocks):
            bi = np.searchsorted(p.block_last, bnds, side="left")
            valid = bi < bub.size
            ub[valid] += bub[bi[valid]]
        order = np.argsort(-ub, kind="stable")
        order = order[ub[order] > 0.0]
        pool_ids: list[np.ndarray] = []
        pool_scores: list[np.ndarray] = []
        pool_n = 0
        theta = -1.0  # no threshold until the pool holds k docs
        i = 0
        while i < order.size:
            if theta >= 0.0 and ub[order[i]] < theta:
                break  # bounds are descending: nothing left can qualify
            batch = order[i : i + batch_intervals]
            if theta >= 0.0:
                batch = batch[ub[batch] >= theta]  # desc order => prefix
            i += batch_intervals
            if batch.size == 0:
                continue
            # interval j spans (bnds[j-1], bnds[j]]; within one term it
            # lies inside exactly one block (the grid contains every
            # term's block boundaries), so probing the ADMITTED blocks'
            # concatenation (globally sorted: blocks are disjoint
            # ascending ranges) resolves every slice in two vectorized
            # searchsorted calls + one gather — no per-interval Python
            his = bnds[batch]
            los = np.where(batch > 0, bnds[np.maximum(batch - 1, 0)], np.int64(-1))
            all_ids, all_scores = [], []
            for p, idf in zip(plist, idfs):
                bis = np.searchsorted(p.block_last, his, side="left")
                vm = bis < p.block_last.size
                if not vm.any():
                    continue
                cat_ids, cat_tfs, cat_dls = p.cat(np.unique(bis[vm]))
                s = np.searchsorted(cat_ids, los[vm], side="right")
                e = np.searchsorted(cat_ids, his[vm], side="right")
                lens = e - s
                nz = lens > 0
                if not nz.any():
                    continue
                s, lens = s[nz], lens[nz]
                total = int(lens.sum())
                starts = np.cumsum(lens) - lens
                idxs = np.repeat(s - starts, lens) + np.arange(total, dtype=np.int64)
                ids = cat_ids[idxs]
                tfs = cat_tfs[idxs].astype(np.float64)
                dls = cat_dls[idxs].astype(np.float64)
                all_ids.append(ids)
                all_scores.append(idf * self._bm25_tf_part(tfs, dls))
            if not all_ids:
                continue
            cat_ids = np.concatenate(all_ids)
            cat_scores = np.concatenate(all_scores)
            uniq, inv = np.unique(cat_ids, return_inverse=True)
            acc = np.zeros(uniq.size, dtype=np.float64)
            np.add.at(acc, inv, cat_scores)
            if uniq.size == 0:
                continue
            pool_ids.append(uniq)
            pool_scores.append(acc)
            pool_n += uniq.size
            if pool_n >= k:
                s = np.concatenate(pool_scores)
                d = np.concatenate(pool_ids)
                theta = float(np.partition(s, s.size - k)[s.size - k])
                keep = s >= theta  # equal-score docs stay for tie-break
                pool_ids, pool_scores = [d[keep]], [s[keep]]
                pool_n = int(keep.sum())
        # instrumentation: blocks actually decoded vs total (cold lazy
        # terms only count decodes; warm wraps report 0) — read by the
        # lazy-decode tests and the cold-query bench
        self.last_wand_blocks = (
            sum(p.decoded_blocks for p in plist),
            sum(int(p.block_last.size) for p in plist),
        )
        if not pool_ids:
            return []
        return _topk(np.concatenate(pool_ids), np.concatenate(pool_scores), k)

    def _maxscore_vec(
        self, q_terms: list[str], k: int, batch_docs: int = 4096
    ) -> list[tuple[int, float]]:
        """Vectorized MaxScore (Turtle & Flood 1995): terms sort by
        ascending global upper bound; lists whose prefix-bound sum
        stays below theta are NON-ESSENTIAL — candidates enumerate
        from the essential lists only, in ascending doc order,
        ``batch_docs`` at a time; every candidate batch is rescored
        exactly over ALL terms (vectorized ``searchsorted`` probes, one
        per term per batch, accumulating in query-term order — the
        scalar loop's per-candidate Python probe becomes one numpy
        gather). Pruning is strict (< theta), results bit-identical to
        the exhaustive scorer."""
        plist, idfs, blocks = self._term_arrays(q_terms)
        T = len(plist)
        term_ub = np.array([float(b.max()) if b.size else 0.0 for b in blocks])
        by_ub = sorted(range(T), key=lambda t: (term_ub[t], t))
        pre = np.concatenate(([0.0], np.cumsum(term_ub[by_ub])))
        pos = [0] * T  # per-term consumed-candidate frontier
        pool_ids: list[np.ndarray] = []
        pool_scores: list[np.ndarray] = []
        pool_n = 0
        theta = -1.0
        while True:
            # essential boundary: first sorted index whose prefix-bound
            # sum reaches theta (all lists essential until pool >= k)
            j = 0
            if theta >= 0.0:
                j = int(np.searchsorted(pre[1:], theta, side="left"))
            if j >= T:
                break
            ess = [by_ub[t] for t in range(j, T)]
            # next batch: each essential list contributes its next
            # batch_docs postings; cap hi so every list's postings up
            # to hi are fully inside the batch (no doc half-covered)
            hi = INF
            lo = INF
            for t in ess:
                ids = plist[t].ids
                if pos[t] >= ids.size:
                    continue
                lo = min(lo, int(ids[pos[t]]))
                end = min(pos[t] + batch_docs, ids.size)
                cap = INF if end == ids.size else int(ids[end - 1])
                hi = min(hi, cap)
            if lo == INF:
                break
            hi = max(hi, lo)
            cand_parts = []
            for t in ess:
                ids = plist[t].ids
                e = int(np.searchsorted(ids, hi, side="right"))
                if e > pos[t]:
                    cand_parts.append(ids[pos[t] : e])
            cands = np.unique(np.concatenate(cand_parts))
            # optimistic bound per candidate: matched essential bounds
            # + every non-essential bound; strict prune keeps ties
            if theta >= 0.0:
                bound = np.full(cands.size, float(pre[j]))
                for t in ess:
                    ids = plist[t].ids
                    p_ = np.searchsorted(ids, cands)
                    p_c = np.minimum(p_, ids.size - 1)
                    bound += np.where(ids[p_c] == cands, term_ub[t], 0.0)
                cands = cands[bound >= theta]
            if cands.size:
                acc = np.zeros(cands.size, dtype=np.float64)
                for t in range(T):  # query-term order => exhaustive parity
                    p, idf = plist[t], idfs[t]
                    p_ = np.searchsorted(p.ids, cands)
                    p_c = np.minimum(p_, p.ids.size - 1)
                    hit = p.ids[p_c] == cands
                    idx = p_c[hit]
                    acc[hit] += idf * self._bm25_tf_part(
                        p.tfs[idx].astype(np.float64), p.dls[idx].astype(np.float64)
                    )
                pool_ids.append(cands)
                pool_scores.append(acc)
                pool_n += cands.size
                if pool_n >= k:
                    s = np.concatenate(pool_scores)
                    d = np.concatenate(pool_ids)
                    theta = float(np.partition(s, s.size - k)[s.size - k])
                    keep = s >= theta
                    pool_ids, pool_scores = [d[keep]], [s[keep]]
                    pool_n = int(keep.sum())
            # advance every list past the processed doc range
            for t in range(T):
                ids = plist[t].ids
                pos[t] = int(np.searchsorted(ids, hi, side="right"))
        if not pool_ids:
            return []
        return _topk(np.concatenate(pool_ids), np.concatenate(pool_scores), k)

    def bm25_topk_tiered(
        self, query: str, k: int = 10, *, champions: int = 32
    ) -> tuple[list[tuple[int, float]], int]:
        """Two-tier champion-list retrieval (static index pruning —
        Carmel et al. 2001; Manning IIR §7.1.3): tier 1 scores ONLY the
        union of each query term's top-``champions`` postings by
        (tf desc, doc_id asc) — the per-term champion list a tiered
        index stores as its own short posting file, so at corpus scale
        tier 1 touches a bounded number of postings per query no matter
        how common the terms are. If the champion union has fewer than
        ``k`` docs the query falls back to the exhaustive tier (tier 2,
        the reference-parity scorer).

        Candidate scores are bit-identical to ``bm25_topk_exhaustive``
        for the same docs: identical per-posting float kernel on the
        sliced arrays and identical term-order accumulation. Returns
        ``(topk, tier)``.
        """
        q_terms = [t for t in tokenize_query(query) if self.has_term(t)]
        if not q_terms:
            return [], 1
        plist = [self.postings(t) for t in q_terms]
        champ_ids = []
        for p in plist:
            m = min(champions, p.ids.size)
            order = np.lexsort((p.ids, -p.tfs))[:m]
            champ_ids.append(p.ids[order])
        cands = np.unique(np.concatenate(champ_ids))
        if cands.size < k:
            return self.bm25_topk_exhaustive(query, k), 2
        acc = np.zeros(cands.size, dtype=np.float64)
        for p in plist:
            pos = np.searchsorted(p.ids, cands)
            pos_c = np.minimum(pos, p.ids.size - 1)
            hit = p.ids[pos_c] == cands
            idx = pos_c[hit]
            acc[hit] += self.bm25_idf(p.df) * self._bm25_tf_part(
                p.tfs[idx].astype(np.float64), p.dls[idx].astype(np.float64)
            )
        return _topk(cands, acc, k), 1

    def _score_doc(self, cursors: list["_Cursor"], doc: int) -> float:
        s = 0.0
        # accumulate in query-term order, with the same float association
        # (idf * tf_part) as the exhaustive scorer, so sums are
        # bit-identical to it; dl comes off the cursor's own postings
        for c in sorted(cursors, key=lambda c: c.order):
            if c.doc() == doc:
                tf = float(c.tf())
                dl = float(c.dl())
                part = tf * (self.k1 + 1.0) / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))
                s += c.idf * part
        return s

    def _wand(self, cursors: list["_Cursor"], k: int) -> list[tuple[int, float]]:
        import heapq

        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
        theta = 0.0  # k-th best score; bounds use >= so equal-score
        # ties are still examined and broken by doc_id exactly like the
        # exhaustive scorer (_topk: score desc, doc_id asc)
        while True:
            cursors.sort(key=lambda c: c.doc())
            if cursors[0].doc() == INF:
                break
            # find pivot: first prefix whose term-UB sum reaches theta
            ub_sum = 0.0
            pivot = -1
            for i, c in enumerate(cursors):
                if c.doc() == INF:
                    break
                ub_sum += c.term_ub
                if ub_sum >= theta:
                    pivot = i
                    break
            if pivot < 0:
                break  # no doc can reach theta
            pivot_doc = cursors[pivot].doc()
            if cursors[0].doc() == pivot_doc:
                # every cursor positioned AT pivot_doc participates —
                # including ones past the pivot index (sorted order makes
                # them contiguous); missing them would under-score the doc
                matched = [c for c in cursors if c.doc() == pivot_doc]
                # block-max refinement: tighter bound from current blocks
                block_sum = sum(c.block_ub_at(pivot_doc) for c in matched)
                if block_sum >= theta:
                    score = self._score_doc(matched, pivot_doc)
                    if len(heap) < k:
                        heapq.heappush(heap, (score, -pivot_doc))
                    else:
                        worst_score, worst_negdoc = heap[0]
                        if score > worst_score or (
                            score == worst_score and -pivot_doc > worst_negdoc
                        ):
                            heapq.heapreplace(heap, (score, -pivot_doc))
                    if len(heap) == k:
                        theta = heap[0][0]
                    for c in matched:
                        c.advance_to(pivot_doc + 1)
                else:
                    # Skip matched cursors past the minimal current-block
                    # boundary (the skip-pointer hop). The block bound only
                    # covers docs held exclusively by the matched cursors,
                    # so never hop past the first unmatched cursor's doc.
                    nxt = min(c.block_end_at(pivot_doc) for c in matched)
                    unmatched_next = min(
                        (c.doc() for c in cursors if c.doc() > pivot_doc), default=INF
                    )
                    target = min(nxt + 1, unmatched_next)
                    for c in matched:
                        c.advance_to(target)
            else:
                # advance all pre-pivot cursors to the pivot doc
                for c in cursors[:pivot]:
                    c.advance_to(pivot_doc)
        out = sorted(heap, key=lambda x: (-x[0], -x[1]))
        return [(-d, s) for s, d in out]

    def _maxscore(self, cursors: list["_Cursor"], k: int) -> list[tuple[int, float]]:
        """MaxScore dynamic pruning (Turtle & Flood 1995) — the other
        canonical top-k algorithm next to Block-Max WAND, sharing its
        cursors, bounds and (crucially) its scoring: terms sort by
        ascending global upper bound; once the running threshold theta
        exceeds the prefix sum of the lowest-bound terms, those lists
        become NON-ESSENTIAL — no doc appearing only in them can enter
        the heap, so candidates enumerate from the essential lists
        alone and non-essential lists are probed per candidate in
        descending-bound order with early bound pruning. Bounds decide
        PRUNING ONLY; every surviving candidate is rescored over all
        matched cursors in query-term order (``_score_doc``), so
        results are bit-identical to the exhaustive scorer and to WAND
        (asserted in tests). Pruning is strict (< theta): equal-score
        ties are always examined and break by doc_id, like WAND."""
        import heapq

        heap: list[tuple[float, int]] = []
        theta = 0.0
        cs = sorted(cursors, key=lambda c: (c.term_ub, c.order))
        n = len(cs)
        pre = [0.0]
        for c in cs:
            pre.append(pre[-1] + c.term_ub)
        while True:
            j = 0
            while j < n and pre[j + 1] < theta:
                j += 1
            if j >= n:
                break  # all terms together cannot reach theta
            cand = min(c.doc() for c in cs[j:])
            if cand == INF:
                break  # remaining docs live only in non-essential lists
            matched_ub = sum(c.term_ub for c in cs[j:] if c.doc() == cand)
            bound = matched_ub + pre[j]  # optimistic: all non-essential match
            pruned = False
            for i in range(j - 1, -1, -1):  # probe descending bound
                if bound < theta:
                    pruned = True
                    break
                c = cs[i]
                c.advance_to(cand)
                if c.doc() != cand:
                    bound -= c.term_ub
            if not pruned and bound >= theta:
                matched = [c for c in cursors if c.doc() == cand]
                block_sum = sum(c.block_ub_at(cand) for c in matched)
                if block_sum >= theta:
                    score = self._score_doc(matched, cand)
                    if len(heap) < k:
                        heapq.heappush(heap, (score, -cand))
                    else:
                        worst_score, worst_negdoc = heap[0]
                        if score > worst_score or (
                            score == worst_score and -cand > worst_negdoc
                        ):
                            heapq.heapreplace(heap, (score, -cand))
                    if len(heap) == k:
                        theta = heap[0][0]
            for c in cs:
                if c.doc() == cand:
                    c.advance_to(cand + 1)
        out = sorted(heap, key=lambda x: (-x[0], -x[1]))
        return [(-d, s) for s, d in out]

    # ---------------- reference tf-idf scorer ----------------

    def reference_topk(
        self,
        query: str,
        k: int = 300,
        threshold: float = 0.3,
        page_ranks: dict[int, float] | None = None,
        rank_weight: float = 1.0,
    ) -> list[tuple[int, float]]:
        """The reference's shipped ranking (``Searcher.java:108-198``):
        log10 tf-idf, keep score > threshold, top ``k``.

        ``page_ranks`` re-enables the reference's vestigial link-rank
        multiplier (the commented-out ``* pagerank`` hook,
        ``Searcher.java:48,155``): when given a {doc_id: rank} map
        (e.g. from ``stages.crawl.pagerank`` keyed by hash64(url)),
        the tf-idf score is multiplied by ``1 + rank_weight * rank``
        AFTER the admission threshold — threshold semantics match the
        shipped (rank-less) reference exactly; only the final order
        changes."""
        q_terms = [t for t in tokenize_query(query) if self.has_term(t)]
        if not q_terms:
            return []
        all_ids, all_scores = [], []
        for t in q_terms:
            p = self.postings(t)
            idf = math.log10(self.N / p.df)
            all_ids.append(p.ids)
            all_scores.append(idf * (1.0 + np.log10(p.tfs.astype(np.float64))))
        ids = np.concatenate(all_ids)
        scores = np.concatenate(all_scores)
        uniq, inv = np.unique(ids, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(acc, inv, scores)
        keep = acc > threshold
        uniq, acc = uniq[keep], acc[keep]
        if page_ranks is not None and uniq.size:
            boost = np.fromiter(
                (page_ranks.get(int(d), 0.0) for d in uniq), dtype=np.float64, count=uniq.size
            )
            acc = acc * (1.0 + rank_weight * boost)
        return _topk(uniq, acc, k)

    def lm_dirichlet_topk(
        self, query: str, k: int = 10, mu: float = 2000.0
    ) -> list[tuple[int, float]]:
        """Query-likelihood retrieval with Dirichlet-prior smoothing
        (Zhai & Lafferty 2001) — the language-model ranking family the
        reference lacks (its only scorers are log-tf-idf,
        ``Searcher.java:108-150``, and our BM25). Rank-equivalent
        matched-term form over docs containing >= 1 query term:

            score(d) = sum_{t in q, tf>0} ln(1 + tf * C / (mu * cf_t))
                       + m * ln(mu / (dl_d + mu))

        with C = exact collection token count (``meta['total_len']``,
        carried by the build), cf_t = collection frequency from the
        shard row, dl_d read off the posting itself (format-2 dl_blob),
        and m = #distinct query terms present in the index. Everything
        the scorer needs lives in the postings already fetched — same
        access pattern (and cost) as ``bm25_topk_exhaustive``."""
        q_terms = sorted({t for t in tokenize_query(query) if self.has_term(t)})
        if not q_terms:
            return []
        c_total = float(self.meta["total_len"])
        all_ids, all_parts, all_dls = [], [], []
        for t in q_terms:
            p = self.postings(t)
            all_ids.append(p.ids)
            # ln(1 + (tf*C) / (mu*cf)) — parenthesized exactly like the
            # SQL twin so both sides round identically at e6
            all_parts.append(
                np.log(1.0 + (p.tfs.astype(np.float64) * c_total) / (mu * float(p.cf)))
            )
            all_dls.append(p.dls)
        ids = np.concatenate(all_ids)
        parts = np.concatenate(all_parts)
        dls = np.concatenate(all_dls)
        uniq, inv = np.unique(ids, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(acc, inv, parts)
        dl_u = np.zeros(uniq.size, dtype=np.int64)
        dl_u[inv] = dls  # every posting of a doc carries the same dl
        acc += len(q_terms) * np.log(mu / (dl_u.astype(np.float64) + mu))
        return _topk(uniq, acc, k)

    def bm25_conjunctive_topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Strict-AND retrieval with BM25 ranking (the default mode of
        most production engines: every query term must match, results
        ranked by relevance — the reference only has additive OR,
        ``Searcher.java:139-150``). Candidates come from the rarest-
        first sorted intersection; scores are computed exactly like
        ``bm25_topk_exhaustive`` (same per-term accumulation order), so
        a conjunctive result always carries its flagship score."""
        terms_all = [t for t in tokenize_query(query)]
        distinct = sorted(set(terms_all))
        if not distinct or any(not self.has_term(t) for t in distinct):
            return []  # an absent term empties a strict AND
        cand = self._conjunctive_candidates(distinct)
        if cand.size == 0:
            return []
        acc = np.zeros(cand.size, dtype=np.float64)
        for t in terms_all:  # duplicate-preserving, flagship order
            p = self.postings(t)
            pos = np.searchsorted(p.ids, cand)
            tfs = p.tfs[pos].astype(np.float64)
            dls = p.dls[pos].astype(np.float64)
            acc += self.bm25_idf(p.df) * self._bm25_tf_part(tfs, dls)
        return _topk(cand, acc, k)

    def bm25_mm_topk(self, query: str, k: int = 10, mm: int = 2) -> list[tuple[int, float]]:
        """minimum_should_match retrieval (Lucene's ``mm`` knob — the
        middle ground between the reference's additive OR,
        ``Searcher.java:139-150``, and strict AND): a doc qualifies iff
        it matches at least ``min(mm, #distinct query terms)`` DISTINCT
        query terms; qualifying docs are ranked by the flagship
        duplicate-preserving BM25 sum (same kernels as
        ``bm25_topk_exhaustive``). The required count clamps to the
        clause count like Lucene, and counts terms absent from the
        index as unmatched (so mm=2 with one indexed term = empty)."""
        toks = tokenize_query(query)
        required = min(mm, len(set(toks)))
        q_terms = [t for t in toks if self.has_term(t)]
        if required == 0 or not q_terms:
            return []
        all_ids, all_scores = [], []
        for t in q_terms:
            p = self.postings(t)
            all_ids.append(p.ids)
            all_scores.append(
                self.bm25_idf(p.df)
                * self._bm25_tf_part(p.tfs.astype(np.float64), p.dls.astype(np.float64))
            )
        ids = np.concatenate(all_ids)
        scores = np.concatenate(all_scores)
        uniq, inv = np.unique(ids, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(acc, inv, scores)
        nmatch = np.zeros(uniq.size, dtype=np.int64)
        for t in set(q_terms):
            p = self.postings(t)
            nmatch[np.searchsorted(uniq, p.ids)] += 1
        keep = nmatch >= required
        return _topk(uniq[keep], acc[keep], k)

    def dismax_topk(self, query: str, k: int = 10, tie: float = 0.3) -> list[tuple[int, float]]:
        """Disjunction-max retrieval (Lucene DisMaxQuery): each DISTINCT
        query term is one clause scored with the flagship BM25 kernel;
        a doc's score is its best clause plus ``tie`` times the rest —
        ``max + tie * (sum - max)`` — so a doc strong on ONE term beats
        a doc mediocre on many (the additive-OR failure mode)."""
        q_terms = sorted({t for t in tokenize_query(query) if self.has_term(t)})
        if not q_terms:
            return []
        all_ids, all_scores = [], []
        for t in q_terms:
            p = self.postings(t)
            all_ids.append(p.ids)
            all_scores.append(
                self.bm25_idf(p.df)
                * self._bm25_tf_part(p.tfs.astype(np.float64), p.dls.astype(np.float64))
            )
        ids = np.concatenate(all_ids)
        scores = np.concatenate(all_scores)
        uniq, inv = np.unique(ids, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(acc, inv, scores)
        best = np.zeros(uniq.size, dtype=np.float64)
        np.maximum.at(best, inv, scores)
        return _topk(uniq, best + tie * (acc - best), k)

    def qpp_stats(self, query: str) -> dict | None:
        """Pre-retrieval query-performance prediction features (no
        postings traversal beyond per-term stats): per query the
        distinct-indexed-term count, the summed and maximum BM25 idf,
        and SCQ = sum over terms of (1 + ln(cf)) * idf (Zhao, Scholer
        & Tsegay 2008's similarity-collection-query score) — the
        signals a router uses to pick rank depth / rewrite strategy
        BEFORE spending retrieval work. e6 integers; None when no term
        is indexed."""
        terms = sorted({t for t in tokenize_query(query) if self.has_term(t)})
        if not terms:
            return None
        idfs, scq = [], 0.0
        for t in terms:
            p = self.postings(t)
            idf = self.bm25_idf(p.df)
            idfs.append(idf)
            scq += (1.0 + math.log(float(p.tfs.sum()))) * idf
        return {
            "n_terms": len(terms),
            "sum_idf_e6": int(round(sum(idfs) * 1_000_000)),
            "max_idf_e6": int(round(max(idfs) * 1_000_000)),
            "scq_e6": int(round(scq * 1_000_000)),
        }

    def explain_topk(self, query: str, k: int = 3) -> list[dict]:
        """Score EXPLAIN for the e6 top-``k`` results: one row per
        (doc, matched distinct term) with the term's tf, df and its
        single-occurrence BM25 contribution in micros — the per-term
        breakdown a relevance engineer debugs ranking with. Pure
        postings probes (searchsorted per term), no doc fetch."""
        pref = self._e6_prefix(query, candidates=k)[:k]
        if not pref:
            return []
        docs = np.array([d for _s, d in pref], np.int64)
        out = []
        for t in sorted({t for t in tokenize_query(query) if self.has_term(t)}):
            p = self.postings(t)
            pos = np.minimum(np.searchsorted(p.ids, docs), p.ids.size - 1)
            hit = p.ids[pos] == docs
            if not hit.any():
                continue
            idf = self.bm25_idf(p.df)
            tfs = p.tfs[pos].astype(np.float64)
            dls = p.dls[pos].astype(np.float64)
            contrib = idf * self._bm25_tf_part(tfs, dls)
            for i in np.flatnonzero(hit):
                out.append(
                    {
                        "doc_id": int(docs[i]),
                        "term": t,
                        "tf": int(p.tfs[pos[i]]),
                        "df": int(p.df),
                        "contrib_e6": int(round(contrib[i] * 1_000_000)),
                    }
                )
        return out

    # ---------------- boolean / phrase retrieval ----------------

    def _conjunctive_candidates(self, terms: list[str]) -> np.ndarray:
        """Sorted doc_ids containing ALL the given (unique) terms:
        rarest-first sorted-array intersection over the postings, so the
        working set never exceeds the rarest term's df."""
        by_df = sorted(terms, key=lambda t: self.postings(t).df)
        cand = self.postings(by_df[0]).ids
        for t in by_df[1:]:
            if cand.size == 0:
                break
            cand = np.intersect1d(cand, self.postings(t).ids, assume_unique=True)
        return cand

    def boolean_and(self, query: str, k: int = 10) -> list[tuple[int, int]]:
        """Conjunctive boolean retrieval (the missing half of the
        reference's additive-OR scorer, ``Searcher.java:139-150``): docs
        containing EVERY unique query term, ranked by total term
        frequency (sum of tf over the unique query terms) desc, then
        doc_id asc. Returns [(doc_id, sum_tf)] — integer scores, so the
        ranking is exactly reproducible by the SQL oracle.

        A query term absent from the whole corpus empties the result
        (strict AND), mirroring the SQL ``HAVING count(DISTINCT term) =
        L`` contract."""
        q_terms = tokenize_query(query)
        if not q_terms or any(not self.has_term(t) for t in q_terms):
            return []
        cand = self._conjunctive_candidates(q_terms)
        if cand.size == 0:
            return []
        total = np.zeros(cand.size, dtype=np.int64)
        for t in q_terms:
            p = self.postings(t)
            total += p.tfs[np.searchsorted(p.ids, cand)]
        order = np.lexsort((cand, -total))[:k]
        return [(int(cand[i]), int(total[i])) for i in order]

    def bm25_not(
        self, query: str, exclude: str, k: int = 10
    ) -> list[tuple[int, int]]:
        """Exclusion (NOT) retrieval — the boolean-minus half of the
        query surface (the reference is additive-OR only,
        ``Searcher.java:139-150``; ``boolean_and`` is the strict-AND
        half): docs matching >= 1 body query term and containing NONE
        of the ``exclude`` terms, ranked by body BM25 (e6-quantized)
        desc, then doc_id asc. Exclude terms absent from the corpus
        exclude nothing (postings lookup is empty). Returns
        [(doc_id, score_e6)] — all-integer, SQL-reproducible.

        Cost is the same postings traversal as BM25 plus one merged
        banned-id array (union of the exclude terms' posting ids) and a
        sorted-membership test — no doc fetch, no scan."""
        q_terms = list(
            dict.fromkeys(t for t in tokenize_query(query) if self.has_term(t))
        )
        if not q_terms:
            return []
        all_ids, all_scores = [], []
        for t in q_terms:
            p = self.postings(t)
            all_ids.append(p.ids)
            all_scores.append(
                self.bm25_idf(p.df)
                * self._bm25_tf_part(p.tfs.astype(np.float64), p.dls.astype(np.float64))
            )
        ids = np.concatenate(all_ids)
        uniq, inv = np.unique(ids, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(acc, inv, np.concatenate(all_scores))
        score_e6 = np.rint(acc * 1e6).astype(np.int64)

        x_terms = [
            t for t in dict.fromkeys(tokenize_query(exclude)) if self.has_term(t)
        ]
        if x_terms:
            banned = np.unique(
                np.concatenate([self.postings(t).ids for t in x_terms])
            )
            keep = ~np.isin(uniq, banned, assume_unique=True)
            uniq, score_e6 = uniq[keep], score_e6[keep]
        order = np.lexsort((uniq, -score_e6))[:k]
        return [(int(uniq[i]), int(score_e6[i])) for i in order]

    TITLE_BOOST_E6 = 500_000

    def bm25_title_boost(
        self, query: str, k: int = 10, boost_e6: int = TITLE_BOOST_E6
    ) -> list[tuple[int, int, int, int]]:
        """BM25F-lite two-field ranking: body BM25 (e6-quantized) plus a
        flat ``boost_e6`` per DISTINCT query term present in the doc's
        TITLE tokens — the standard title-field boost the reference's
        single-field scorer lacks (``Searcher.java:139-150`` scores body
        text only; the title it stores is display-only,
        ``Searcher.java:54,189``).

        Candidate set = docs matching >= 1 query term in the BODY (a
        title-only match never enters — documented contract). Title
        fetches are pruned by the boost bound: only docs with
        base_e6 >= (k-th best base_e6) - max_total_boost can reach the
        top k, so the doc-store reads stay O(k + boosted band) per query
        regardless of how many docs matched. At corpus scale the same
        semantics come from a dedicated title-field index (title
        postings alongside format 2/3) instead of doc-store fetches;
        this method is the serving-tier form.

        Returns [(doc_id, total_e6, base_e6, n_title_hits)] ordered by
        (total_e6 desc, doc_id asc) — all-integer, SQL-reproducible.
        """
        q_terms = [t for t in tokenize_query(query) if self.has_term(t)]
        if not q_terms:
            return []
        all_ids, all_scores = [], []
        for t in q_terms:
            p = self.postings(t)
            all_ids.append(p.ids)
            all_scores.append(
                self.bm25_idf(p.df)
                * self._bm25_tf_part(p.tfs.astype(np.float64), p.dls.astype(np.float64))
            )
        ids = np.concatenate(all_ids)
        uniq, inv = np.unique(ids, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(acc, inv, np.concatenate(all_scores))
        base_e6 = np.rint(acc * 1e6).astype(np.int64)

        max_boost = boost_e6 * len(q_terms)
        kth = np.partition(base_e6, -min(k, base_e6.size))[-min(k, base_e6.size)]
        band = base_e6 >= kth - max_boost
        cand_ids = uniq[band]
        cand_base = base_e6[band]

        if self._docstore is None:
            self._docstore = DocStore(self._docstore_path)
        rows = self._docstore.lookup([int(d) for d in cand_ids])
        qset = set(q_terms)
        hits = np.fromiter(
            (
                len(qset.intersection(tokenize(rows[d]["title"])) ) if d in rows else 0
                for d in cand_ids
            ),
            dtype=np.int64,
            count=cand_ids.size,
        )
        total = cand_base + boost_e6 * hits
        order = np.lexsort((cand_ids, -total))[:k]
        return [
            (int(cand_ids[i]), int(total[i]), int(cand_base[i]), int(hits[i]))
            for i in order
        ]

    def _title_len_total(self) -> int:
        """Exact total TITLE token count over the canonical doc store
        (the title-field half of the BM25F length normalization) —
        one vectorized tokenize pass over the docstore's title column,
        cached for the index's lifetime."""
        if getattr(self, "_title_total", None) is None:
            import pyarrow.parquet as _pq

            from ..functions.tokenize import tokenize_count_batch

            t = _pq.read_table(
                self._docstore_path, columns=["title", "is_canonical"]
            )
            titles = t.filter(t["is_canonical"])["title"].combine_chunks()
            _terms, tfs, _ = tokenize_count_batch(titles)
            flat = tfs.flatten()
            self._title_total = (
                int(flat.to_numpy(zero_copy_only=False).sum()) if len(flat) else 0
            )
        return self._title_total

    def bm25f_topk(
        self,
        query: str,
        k: int = 10,
        *,
        w_title: float = 3.0,
        candidates: int = 50,
    ) -> list[tuple[int, int]]:
        """Simple BM25F (Robertson, Zaragoza & Taylor 2004): two-field
        ranking where the TITLE field's term frequencies and length are
        folded into the BM25 saturation with weight ``w_title`` —
        unlike the flat ``bm25_title_boost``, a title hit here
        interacts with tf saturation and length normalization:

            tf'  = tf_body + w*tf_title
            dl'  = dl_body + w*title_len
            avg' = (C_body + w*C_title) / N     (exact ints, C_title
                                                 from one cached
                                                 docstore title pass)
            score = sum_t idf_body(t) * (tf'*(k1+1)) / (tf' + k1*((1-b) + b*dl'/avg'))

        Re-ranks the e6 top-``candidates`` body prefix (the re-ranking
        family convention — a title-only match outside the body
        candidate set never enters; a dedicated title-postings index is
        the corpus-scale form). Returns [(doc_id, bm25f_e6)] ordered by
        (score desc, doc_id)."""
        from collections import Counter

        q_terms = sorted({t for t in tokenize_query(query) if self.has_term(t)})
        if not q_terms:
            return []
        pref = self._e6_prefix(query, candidates)
        if not pref:
            return []
        docs = np.array([d for _s, d in pref], np.int64)
        rows = self._store().lookup(docs.tolist())
        tcounts = [Counter(tokenize(rows[int(d)]["title"])) for d in docs]
        tlen = np.array([sum(c.values()) for c in tcounts], np.float64)
        avgdlf = (
            float(self.meta["total_len"]) + w_title * float(self._title_len_total())
        ) / float(self.N)
        k1, b = self.k1, self.b
        dlb = np.zeros(docs.size, np.float64)
        tf_body = {}
        for t in q_terms:
            p = self.postings(t)
            pos = np.minimum(np.searchsorted(p.ids, docs), p.ids.size - 1)
            hit = p.ids[pos] == docs
            tfb = np.where(hit, p.tfs[pos], 0).astype(np.float64)
            tf_body[t] = tfb
            dlb[hit] = p.dls[pos[hit]]
        dlf = dlb + w_title * tlen
        score = np.zeros(docs.size, np.float64)
        for t in q_terms:
            tft = np.array([c.get(t, 0) for c in tcounts], np.float64)
            tfp = tf_body[t] + w_title * tft
            idf = self.bm25_idf(self.postings(t).df)
            with np.errstate(invalid="ignore"):
                contrib = np.where(
                    tfp > 0,
                    idf
                    * (
                        (tfp * (k1 + 1.0))
                        / (tfp + k1 * ((1.0 - b) + b * dlf / avgdlf))
                    ),
                    0.0,
                )
            score += contrib
        e6 = np.rint(score * 1e6).astype(np.int64)
        order = np.lexsort((docs, -e6))[:k]
        return [(int(docs[i]), int(e6[i])) for i in order]

    ANCHOR_BOOST_E6 = 300_000

    def bm25_anchor_boost(
        self,
        query: str,
        anchor_terms: dict[int, set[str]],
        k: int = 10,
        boost_e6: int = ANCHOR_BOOST_E6,
    ) -> list[tuple[int, int, int, int]]:
        """Anchor-field ranking: body BM25 (e6-quantized) plus a flat
        ``boost_e6`` per DISTINCT body-present query term among the
        doc's INBOUND anchor-text terms — the classic web ranking
        signal (other pages' link text endorsing this page) that the
        reference's link extractor makes available but never consumes
        (``Crawler.java:405-436``; its scorer is body-only,
        ``Searcher.java:139-150``).

        ``anchor_terms`` maps doc_id -> the set of inbound anchor terms
        (built by ``stages/crawl.inbound_anchor_query_terms``, bounded
        by the query vocabulary). Candidate set = docs matching >= 1
        query term in the BODY (an anchor-only match never enters —
        same contract as the title boost). Unlike the title boost there
        is no doc-store fetch at all: hits are O(1) dict lookups, so no
        pruning band is needed.

        Returns [(doc_id, total_e6, base_e6, n_anchor_hits)] ordered by
        (total_e6 desc, doc_id asc) — all-integer, SQL-reproducible.
        """
        q_terms = list(
            dict.fromkeys(t for t in tokenize_query(query) if self.has_term(t))
        )
        if not q_terms:
            return []
        all_ids, all_scores = [], []
        for t in q_terms:
            p = self.postings(t)
            all_ids.append(p.ids)
            all_scores.append(
                self.bm25_idf(p.df)
                * self._bm25_tf_part(p.tfs.astype(np.float64), p.dls.astype(np.float64))
            )
        ids = np.concatenate(all_ids)
        uniq, inv = np.unique(ids, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(acc, inv, np.concatenate(all_scores))
        base_e6 = np.rint(acc * 1e6).astype(np.int64)

        qset = set(q_terms)
        empty: frozenset[str] = frozenset()
        hits = np.fromiter(
            (len(qset & anchor_terms.get(int(d), empty)) for d in uniq),
            dtype=np.int64,
            count=uniq.size,
        )
        total = base_e6 + boost_e6 * hits
        order = np.lexsort((uniq, -total))[:k]
        return [
            (int(uniq[i]), int(total[i]), int(base_e6[i]), int(hits[i]))
            for i in order
        ]

    def phrase_topk(
        self, phrase: str, k: int = 10, method: str = "auto"
    ) -> list[tuple[int, int]]:
        """Exact phrase search: docs whose body contains the phrase's
        tokens CONSECUTIVELY, ranked by occurrence count (all start
        positions, overlapping included) desc, then doc_id asc. Returns
        [(doc_id, n_occurrences)].

        Both physical plans share stage 1 — candidate generation =
        conjunctive intersection of the phrase terms' postings, rarest
        term first, so candidates are bounded by the rarest term's df.
        Stage 2 differs by ``method``:

        - ``'positions'`` (format-3 index): adjacency is evaluated on
          the positional postings alone — successive shifted
          intersections of the candidates' per-term position lists. No
          doc fetch at all; this is the 100-TB serving plan.
        - ``'verify'``: exact adjacency verification against the doc
          store — a by-id, row-group-pruned fetch of ONLY the candidate
          bodies (``DocStore.lookup``), re-tokenized with the canonical
          tokenizer (the same function the index build used). The
          standard plan for a position-less index; still O(candidates)
          row reads, never a scan.
        - ``'auto'``: positions when the index has them, else verify.

        The two plans are asserted identical on positional builds
        (tests/test_positions.py).
        """
        terms = tokenize(phrase)  # ordered, duplicates kept
        if not terms or any(not self.has_term(t) for t in set(terms)):
            return []
        cand = self._conjunctive_candidates(list(dict.fromkeys(terms)))
        if cand.size == 0:
            return []
        if method == "auto":
            method = "positions" if self.has_positions else "verify"
        if method == "positions":
            if not self.has_positions:
                raise ValueError("index built without positions (format < 3)")
            plist = [self.postings(t) for t in terms]
            hits: list[tuple[int, int]] = []
            for d in cand:
                # start positions: successively intersect each term's
                # positions shifted back to the phrase start
                p0 = plist[0]
                s = p0.positions_at(int(np.searchsorted(p0.ids, d)))
                for off in range(1, len(terms)):
                    if s.size == 0:
                        break
                    p = plist[off]
                    nxt = p.positions_at(int(np.searchsorted(p.ids, d)))
                    s = s[np.isin(s + off, nxt, assume_unique=True)]
                if s.size:
                    hits.append((int(d), int(s.size)))
            hits.sort(key=lambda t: (-t[1], t[0]))
            return hits[:k]
        if self._docstore is None:
            self._docstore = DocStore(self._docstore_path)
        rows = self._docstore.lookup([int(d) for d in cand])
        L = len(terms)
        hits: list[tuple[int, int]] = []
        for did in sorted(rows):
            toks = tokenize(rows[did]["body"])
            n = len(toks)
            if n < L:
                continue
            arr = np.asarray(toks, dtype=object)
            m = np.ones(n - L + 1, dtype=bool)
            for off, w in enumerate(terms):
                m &= arr[off : off + n - L + 1] == w
            c = int(m.sum())
            if c:
                hits.append((did, c))
        hits.sort(key=lambda t: (-t[1], t[0]))
        return hits[:k]

    def proximity_topk(self, query: str, k: int = 10) -> list[tuple[int, int]]:
        """Proximity ranking (the classic MinCover/MinDist signal, e.g.
        Tao & Zhai 2007): over the strict-AND candidates, the MINIMAL
        token-window length containing ALL distinct query terms, ranked
        span asc then doc_id asc. Returns [(doc_id, min_span)] —
        integer spans, SQL-reproducible. Requires the positional index.

        Vectorized per candidate: for every occurrence position ``s`` of
        any query term, the earliest completion is
        ``max over terms of (first position >= s)``; the doc's min span
        is the minimum of (completion - s + 1). Each term's lookup is
        one searchsorted over its position list."""
        if not self.has_positions:
            raise ValueError("index built without positions (format < 3)")
        q_terms = tokenize_query(query)
        if not q_terms or any(not self.has_term(t) for t in q_terms):
            return []
        cand = self._conjunctive_candidates(q_terms)
        if cand.size == 0:
            return []
        plist = [self.postings(t) for t in q_terms]
        out: list[tuple[int, int]] = []
        for d in cand:
            pls = [p.positions_at(int(np.searchsorted(p.ids, d))) for p in plist]
            starts = np.unique(np.concatenate(pls))
            completion = np.zeros(starts.size, dtype=np.int64)
            ok = np.ones(starts.size, dtype=bool)
            for pl in pls:
                j = np.searchsorted(pl, starts)
                has = j < pl.size
                ok &= has
                first_ge = np.where(has, pl[np.minimum(j, pl.size - 1)], 0)
                completion = np.maximum(completion, first_ge)
            spans = completion[ok] - starts[ok] + 1
            if spans.size:
                out.append((int(d), int(spans.min())))
        out.sort(key=lambda t: (t[1], t[0]))
        return out[:k]

    def snippet_window(
        self, query: str, width: int = 12
    ) -> tuple[int, int, int] | None:
        """Query-biased snippet selection on the POSITIONAL index
        (format 3): for the strict-AND top-1 document, the
        ``width``-token window starting at a query-term occurrence that
        covers the most DISTINCT query terms (tie -> leftmost start).
        Returns (doc_id, window_start, n_distinct_terms_in_window) or
        None when the conjunction matches nothing.

        This is passage selection done entirely on postings — the doc
        text is only needed later to render the chosen window, one
        ``DocStore`` row per result. Candidate starts are query-term
        positions only (a window not starting on a hit is dominated by
        one that does)."""
        if not self.has_positions:
            raise ValueError("index built without positions (format < 3)")
        top = self.boolean_and(query, k=1)
        if not top:
            return None
        doc = top[0][0]
        q_terms = tokenize_query(query)
        pos_lists = []
        for t in q_terms:
            p = self.postings(t)
            pos_lists.append(p.positions_at(int(np.searchsorted(p.ids, doc))))
        starts = np.unique(np.concatenate(pos_lists))
        counts = np.zeros(starts.size, dtype=np.int64)
        for pl in pos_lists:
            lo = np.searchsorted(pl, starts)
            hi = np.searchsorted(pl, starts + width)
            counts += (hi > lo).astype(np.int64)
        best = int(np.lexsort((starts, -counts))[0])
        return doc, int(starts[best]), int(counts[best])

    # ---------------- result assembly ----------------

    def _e6_prefix(self, query: str, candidates: int) -> list[tuple[int, int]]:
        """The e6-quantized top-``candidates`` candidate prefix
        [(score_e6, doc_id)] ordered by (score_e6 desc, doc_id) — the
        shared deterministic contract of the re-ranking family
        (collapse / facets / recency). Candidates are fetched 30-over-
        wide on float scores so the e6 prefix boundary is stable across
        engines (the ``_search_table`` convention)."""
        ranked = self.bm25_topk(query, k=candidates + 30)
        return sorted(
            ((int(round(s * 1_000_000)), d) for d, s in ranked),
            key=lambda t: (-t[0], t[1]),
        )[:candidates]

    def _store(self) -> DocStore:
        if self._docstore is None:
            self._docstore = DocStore(self._docstore_path)
        return self._docstore

    def bm25_topk_after(
        self, query: str, k: int = 10, after: tuple[int, int] | None = None
    ) -> list[tuple[int, int]]:
        """Cursor pagination ("search after"): the next ``k`` results
        STRICTLY after cursor ``after = (score_e6, doc_id)`` in the e6
        contract order (score_e6 desc, doc_id asc); ``None`` = first
        page. Stateless between calls — the serving tier keeps no
        scroll context (the cursor IS the state), so any replica can
        serve any page. Iterative deepening re-runs the ranked prefix
        only as deep as the cursor actually sits."""
        depth = max(2 * k, 20)
        while True:
            pref = self._e6_prefix(query, candidates=depth)
            if after is None:
                return pref[:k]
            key = (-after[0], after[1])
            tail = [t for t in pref if (-t[0], t[1]) > key]
            if len(tail) >= k or len(pref) < depth:
                return tail[:k]
            depth *= 2

    def ltr_features(
        self, query: str, k: int = 10, *, candidates: int = 50
    ) -> list[dict]:
        """Learning-to-rank feature vectors for the e6 top-``k``
        results — the (query, doc) feature table a ranker trains on.
        All features are exact integers: BM25 ``score_e6``, doc length
        ``dl``, ``n_terms`` = distinct query terms whose postings
        contain the doc, ``sum_tf`` = their total tf, and ``warc_day``
        (epoch day, the recency feature — ``calendar.timegm`` to match
        DuckDB ``epoch``). Term features come from bounded
        ``searchsorted`` postings probes; ``warc_day`` from k DocStore
        point reads. Returns dicts in rank order."""
        import calendar

        pref = self._e6_prefix(query, candidates)[:k]
        if not pref:
            return []
        docs = np.array([d for _s, d in pref], np.int64)
        q_terms = sorted({t for t in tokenize_query(query) if self.has_term(t)})
        n_terms = np.zeros(docs.size, np.int64)
        sum_tf = np.zeros(docs.size, np.int64)
        dl = np.zeros(docs.size, np.int64)
        for t in q_terms:
            p = self.postings(t)
            pos = np.minimum(np.searchsorted(p.ids, docs), p.ids.size - 1)
            hit = p.ids[pos] == docs
            n_terms[hit] += 1
            sum_tf[hit] += p.tfs[pos[hit]]
            dl[hit] = p.dls[pos[hit]]
        rows = self._store().lookup(docs.tolist())
        out = []
        for r, (s6, d) in enumerate(pref):
            di = int(np.flatnonzero(docs == d)[0])
            out.append(
                {
                    "rank": r,
                    "doc_id": int(d),
                    "score_e6": int(s6),
                    "dl": int(dl[di]),
                    "n_terms": int(n_terms[di]),
                    "sum_tf": int(sum_tf[di]),
                    "warc_day": calendar.timegm(rows[d]["warc_ts"].timetuple())
                    // 86400,
                }
            )
        return out

    def bm25_topk_mmr(
        self, query: str, k: int = 10, *, candidates: int = 50, lam_e6: int = 500_000
    ) -> list[tuple[int, int, int]]:
        """Maximal-Marginal-Relevance result diversification (Carbonell
        & Goldstein 1998) over the e6 candidate prefix: greedy selection
        maximizing ``lam * relevance - (1 - lam) * max-similarity-to-
        already-selected``, doc-doc similarity = exact integer Jaccard
        (e6-floored) over DISTINCT canonical token sets. Every
        comparison is int64 — value = lam_e6 * score_e6 -
        (1e6 - lam_e6) * maxsim_e6, ties to the lower doc_id — so the
        selection order is hash-exact and the SQL twin unrolls the same
        k-1 greedy steps.

        Token sets come from ``candidates`` DocStore point reads per
        query (bounded, never corpus-dependent; the body is
        byte-identical to the indexed text by the extraction
        invariant). Returns [(doc_id, score_e6, mmr_rank)] in selection
        order; fewer than k results when the prefix is short.
        """
        pref = self._e6_prefix(query, candidates)
        if not pref:
            return []
        rel = {d: s for s, d in pref}
        order = [d for _s, d in pref]
        rows = self._store().lookup(order)
        tsets = {d: frozenset(tokenize(rows[d]["body"])) if d in rows else frozenset() for d in order}

        def sim_e6(a: int, b: int) -> int:
            ta, tb = tsets[a], tsets[b]
            i = len(ta & tb)
            u = len(ta) + len(tb) - i
            return (1_000_000 * i) // u if u else 0

        comp = 1_000_000 - lam_e6
        selected = [order[0]]
        remaining = order[1:]
        while remaining and len(selected) < k:
            best, best_key = None, None
            for d in remaining:
                ms = max(sim_e6(d, s) for s in selected)
                key = (lam_e6 * rel[d] - comp * ms, -d)
                if best_key is None or key > best_key:
                    best, best_key = d, key
            selected.append(best)
            remaining.remove(best)
        return [(d, rel[d], r) for r, d in enumerate(selected)]

    def bm25_facets(
        self, query: str, candidates: int = 50
    ) -> list[tuple[str, str, int]]:
        """Facet counts over the e6 top-``candidates`` prefix: for each
        facet dimension (URL host, doc language) the number of prefix
        docs carrying each value — the result-page refinement sidebar
        the reference's raw ranked list (``Searcher.java:186-195``)
        lacks. Facet lookups are ``candidates`` doc-store point reads
        per query — bounded, not corpus-dependent. Returns sorted
        [(facet, facet_value, n_docs)]."""
        from collections import Counter

        from ..functions.urls import host_of

        e6 = self._e6_prefix(query, candidates)
        rows = self._store().lookup([d for _s, d in e6])
        host_c: Counter = Counter()
        lang_c: Counter = Counter()
        for _s, d in e6:
            host_c[host_of(rows[d]["url"])] += 1
            lang_c[rows[d]["lang"]] += 1
        out = [("host", v, n) for v, n in host_c.items()]
        out += [("lang", v, n) for v, n in lang_c.items()]
        return sorted(out)

    def bm25_topk_recency(
        self,
        query: str,
        k: int = 10,
        candidates: int = 50,
        day_boost_e6: int = 1000,
    ) -> list[tuple[int, int]]:
        """Recency-boosted top-k: within the e6 top-``candidates``
        prefix, re-rank by ``score_e6 + day_boost_e6 *
        epoch_day(warc_ts)`` (newer pages win ties and near-ties; one
        relevance e6-millionth per ``1/day_boost_e6`` days of age).
        Integer arithmetic end-to-end, so the contract replays exactly
        in SQL. ``warc_ts`` is naive-UTC by the pages schema; the epoch
        day is computed with ``calendar.timegm`` to match DuckDB's
        ``epoch(timestamp)``. Returns [(doc_id, boosted_e6)]."""
        import calendar

        e6 = self._e6_prefix(query, candidates)
        rows = self._store().lookup([d for _s, d in e6])
        boosted = [
            (
                s6
                + day_boost_e6
                * (calendar.timegm(rows[d]["warc_ts"].timetuple()) // 86400),
                d,
            )
            for s6, d in e6
        ]
        boosted.sort(key=lambda t: (-t[0], t[1]))
        return [(d, b) for b, d in boosted[:k]]

    def bm25_topk_collapsed(
        self, query: str, k: int = 10, per_host: int = 1, candidates: int = 50
    ) -> list[tuple[int, int, str]]:
        """Host-collapsed (site-collapse) BM25 top-k — result
        diversification the reference's raw ranked list lacks
        (``Searcher.java:186-195`` serves every result regardless of
        host). Deterministic contract, replayed exactly in SQL: the
        candidate set is the e6-quantized top-``candidates`` prefix
        ordered by (score_e6 desc, doc_id); winners are the first
        ``per_host`` rows per URL host in that order, cut to ``k``.
        Returns [(doc_id, score_e6, host)] in final rank order.

        Candidates are fetched 30-over-wide on float scores so the e6
        prefix boundary is stable across engines (the `_search_table`
        convention). Host lookup is ``candidates`` doc-store point
        reads per query — bounded, not corpus-dependent."""
        from ..functions.urls import host_of

        e6 = self._e6_prefix(query, candidates)
        rows = self._store().lookup([d for _s, d in e6])
        out: list[tuple[int, int, str]] = []
        seen: dict[str, int] = {}
        for s6, d in e6:
            h = host_of(rows[d]["url"])
            c = seen.get(h, 0)
            if c < per_host:
                seen[h] = c + 1
                out.append((d, s6, h))
                if len(out) >= k:
                    break
        return out

    def bm25_site_topk(
        self,
        query: str,
        host: str | None = None,
        k: int = 10,
        candidates: int = 50,
    ) -> list[tuple[int, int, str]]:
        """``site:``-restricted retrieval (the "more from this site"
        feature): within the e6 top-``candidates`` prefix, keep only
        docs whose URL host equals ``host`` — by default the host of
        the prefix's TOP result, i.e. "more results like the best one".
        Same bounded contract as the collapse/facets/recency family:
        ``candidates`` doc-store point reads per query, prefix order
        preserved, cut to ``k``. Returns [(doc_id, score_e6, host)]."""
        from ..functions.urls import host_of

        e6 = self._e6_prefix(query, candidates)
        if not e6:
            return []
        rows = self._store().lookup([d for _s, d in e6])
        if host is None:
            host = host_of(rows[e6[0][1]]["url"])
        out: list[tuple[int, int, str]] = []
        for s6, d in e6:
            h = host_of(rows[d]["url"])
            if h == host:
                out.append((d, s6, h))
                if len(out) >= k:
                    break
        return out

    def bm25_intitle_topk(
        self, query: str, k: int = 10, candidates: int = 50
    ) -> list[tuple[int, int]]:
        """``intitle:``-restricted retrieval: within the e6
        top-``candidates`` prefix, keep only docs whose TITLE tokens
        contain the query's FIRST token — the field-restriction
        operator of web query languages. Same bounded contract as the
        site/facets/recency family: ``candidates`` doc-store point
        reads per query, prefix order preserved, cut to ``k``. Returns
        [(doc_id, score_e6)]."""
        from ..functions.tokenize import tokenize, tokenize_query

        toks = tokenize_query(query)
        if not toks:
            return []
        want = toks[0]
        return self._intitle_filtered(query, want, k, candidates)

    def _intitle_filtered(
        self, query: str, want_raw: str, k: int, candidates: int = 50
    ) -> list[tuple[int, int]]:
        """The intitle restriction kernel: e6 prefix of ``query``
        filtered to docs whose title tokens contain the canonical form
        of ``want_raw``. Shared by :meth:`bm25_intitle_topk` (first
        query token) and the ``intitle:term`` query-language route."""
        from ..functions.tokenize import tokenize, tokenize_query

        want_toks = tokenize_query(want_raw)
        if not want_toks:
            return []
        want = want_toks[0]
        e6 = self._e6_prefix(query, candidates)
        if not e6:
            return []
        rows = self._store().lookup([d for _s, d in e6])
        out: list[tuple[int, int]] = []
        for s6, d in e6:
            if want in tokenize(rows[d]["title"]):
                out.append((d, s6))
                if len(out) >= k:
                    break
        return out

    def correct_query(self, query: str) -> str:
        """Did-you-mean rewrite: every OOV query term is replaced by
        its minimum-edit-distance vocabulary term (ties by term — the
        ``stages/textstats.spell_correct`` rule); in-vocab terms pass
        through. The vocabulary codepoint matrix is built lazily ONCE
        per index (a serving shard's vocab is bounded) and cached."""
        from ..functions.tokenize import tokenize_query
        from ..stages.textstats import _levenshtein_to_all

        toks = tokenize_query(query)
        if all(self.has_term(t) for t in toks):
            return query
        if getattr(self, "_vocab_mat", None) is None:
            terms = np.array(list(self._term_row.keys()), dtype=object)
            lens = np.array([len(t) for t in terms], dtype=np.int64)
            mat = np.zeros((len(terms), int(lens.max()) if lens.size else 0), np.uint32)
            for i, t in enumerate(terms):
                mat[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), np.uint32)
            self._vocab_terms, self._vocab_lens, self._vocab_mat = terms, lens, mat
        out = []
        for t in toks:
            if self.has_term(t) or not len(self._vocab_terms):
                out.append(t)
                continue
            dist = _levenshtein_to_all(t, self._vocab_mat, self._vocab_lens)
            out.append(self._vocab_terms[np.lexsort((self._vocab_terms, dist))[0]])
        return " ".join(out)

    def query_language(self, query: str, k: int = 10) -> list[tuple[int, int]]:
        """Operator-query dispatch (``functions/queryparse``): parse
        ``"phrase" -minus site:host terms`` and route to the matching
        verified primitive. Precedence (most restrictive wins, one
        operator per query — combinations fall back in this order):

        1. a quoted phrase     -> ``phrase_topk``   (score = n_occ)
        2. any ``-term``       -> ``bm25_not``      (score = score_e6)
        3. ``site:host``       -> ``bm25_site_topk``(score = score_e6)
        4. ``intitle:term``    -> ``_intitle_filtered`` (score_e6)
        5. plain terms         -> e6-quantized BM25 top-k

        Returns [(doc_id, int score)] — all-integer like the primitives,
        so dispatch identity is exactly testable."""
        from ..functions.queryparse import parse_query

        p = parse_query(query)
        if p.phrases:
            return self.phrase_topk(p.phrases[0], k=k)
        positives = " ".join(p.terms)
        if p.excluded:
            return self.bm25_not(positives, " ".join(p.excluded), k=k)
        if p.site is not None:
            return [
                (d, s) for d, s, _h in self.bm25_site_topk(positives, host=p.site, k=k)
            ]
        if p.intitle is not None:
            return self._intitle_filtered(positives, p.intitle, k)
        # candidates widened to k so pagination (start+k) never caps at
        # the default 50-candidate prefix
        e6 = sorted(
            (
                (int(round(s * 1_000_000)), d)
                for d, s in self.bm25_topk(positives, k=max(50, k))
            ),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        return [(d, s) for s, d in e6]

    def fetch_docs(self, doc_ids: list[int]) -> dict[int, dict]:
        """Doc-store point reads (url/title/body per doc_id) — the
        assembly step shared by ``search`` and the operator-query
        serving route."""
        if self._docstore is None:
            self._docstore = DocStore(self._docstore_path)
        return self._docstore.lookup([int(d) for d in doc_ids])

    def search(self, query: str, k: int = 10, *, fuzzy: bool = False) -> list[dict]:
        """Top-k with url/title/body assembled from the doc store
        (output shape mirrors the reference's JSON:
        ``{url, rank_score, title, body}``, ``Searcher.java:186-195``).
        ``fuzzy=True`` applies the did-you-mean OOV rewrite first."""
        if fuzzy:
            query = self.correct_query(query)
        ranked = self.bm25_topk(query, k)
        rows = self.fetch_docs([d for d, _ in ranked])
        return [
            {
                "doc_id": d,
                "url": rows[d]["url"],
                "rank_score": s,
                "title": rows[d]["title"],
                "body": rows[d]["body"],
            }
            for d, s in ranked
        ]

    def field_readers(self) -> list[tuple]:
        """(FieldReader, weight) pairs for the field indexes built next
        to this index (title w=3.0, anchor w=2.0 — the BM25F convention
        of the registered queries); empty list when none were built.
        Lazily constructed and cached for the index's lifetime."""
        cached = getattr(self, "_field_readers", None)
        if cached is None:
            from .anchor_field import FieldReader

            base = os.path.dirname(self._docstore_path)
            cached = [
                (FieldReader(base, prefix), w)
                for prefix, w in (("title", 3.0), ("anchor", 2.0))
                if os.path.exists(os.path.join(base, f"{prefix}_meta.json"))
            ]
            self._field_readers = cached
        return cached

    def search_fields(self, query: str, k: int = 10) -> list[dict]:
        """Multi-field BM25F retrieval with doc-store-assembled rows —
        the ``/search?rank=fields`` serving route. Scores with every
        field index present (``anchor_field.bm25f_fields_topk``:
        field-only matches enter); with no field indexes built it IS
        plain BM25 search. ``rank_score`` is the integer bm25f_e6."""
        fields = self.field_readers()
        if not fields:
            return self.search(query, k)
        from .anchor_field import bm25f_fields_topk

        ranked = bm25f_fields_topk(self, fields, query, k)
        rows = self.fetch_docs([d for d, _ in ranked])
        return [
            {
                "doc_id": d,
                "url": rows[d]["url"],
                "rank_score": s,
                "title": rows[d]["title"],
                "body": rows[d]["body"],
            }
            for d, s in ranked
        ]


class _TermMap:
    """Dict-like lazy view over a SearchIndex's vocabulary: membership
    and iteration are free; item access decodes (and caches) postings."""

    def __init__(self, idx: SearchIndex):
        self._idx = idx

    def __contains__(self, term: str) -> bool:
        return self._idx.has_term(term)

    def __getitem__(self, term: str) -> _Postings:
        return self._idx.postings(term)

    def __iter__(self):
        return iter(self._idx._term_row)

    def __len__(self) -> int:
        return len(self._idx._term_row)

    def keys(self):
        return self._idx._term_row.keys()

    def items(self):
        for t in self._idx._term_row:
            yield t, self._idx.postings(t)


class _Cursor:
    __slots__ = ("ids", "tfs", "dls", "idf", "block_last", "block_ub", "pos", "term_ub", "order")

    def __init__(self, ids, tfs, dls, idf, block_last, block_ub, order=0):
        self.ids, self.tfs, self.dls, self.idf = ids, tfs, dls, idf
        self.block_last, self.block_ub = block_last, block_ub
        self.pos = 0
        self.term_ub = float(block_ub.max()) if block_ub.size else 0.0
        self.order = order

    def doc(self) -> int:
        return int(self.ids[self.pos]) if self.pos < self.ids.size else INF

    def tf(self) -> int:
        return int(self.tfs[self.pos])

    def dl(self) -> int:
        return int(self.dls[self.pos])

    def advance_to(self, d: int) -> None:
        if self.pos < self.ids.size and self.ids[self.pos] < d:
            self.pos += int(np.searchsorted(self.ids[self.pos :], d, side="left"))

    def _block_idx(self, d: int) -> int:
        return int(np.searchsorted(self.block_last, d, side="left"))

    def block_ub_at(self, d: int) -> float:
        i = self._block_idx(d)
        return float(self.block_ub[i]) if i < self.block_ub.size else 0.0

    def block_end_at(self, d: int) -> int:
        i = self._block_idx(d)
        return int(self.block_last[i]) if i < self.block_last.size else INF


def _topk(ids: np.ndarray, scores: np.ndarray, k: int) -> list[tuple[int, float]]:
    """Deterministic top-k: score desc, doc_id asc."""
    if ids.size == 0:
        return []
    order = np.lexsort((ids, -scores))[:k]
    return [(int(ids[i]), float(scores[i])) for i in order]


def scatter_gather_topk(
    shards: list[SearchIndex], query: str, k: int = 10
) -> list[tuple[int, float]]:
    """Doc-range-sharded BM25 top-k — the 100-TB serving layout: each
    shard holds a DISJOINT doc range (vs the term-sharded storage
    layout of the build), global (N, total_len, per-term df) statistics
    are summed once per query and pushed to every shard, each shard
    scores its own docs completely, and the k best merge exactly
    because no doc's score is split across shards. Results are
    bit-identical to one monolithic index over the union (tests assert
    it). The reference never distributes its searcher (one Searcher
    per node over the full KVS, ``Searcher.java:29-57``); this is the
    layout it would need at web scale."""
    n_global = sum(s.N for s in shards)
    total_len = sum(int(s.meta["total_len"]) for s in shards)
    avgdl = (total_len / n_global) if n_global else 1.0
    terms = set(tokenize_query(query))
    df: dict[str, int] = {}
    for t in terms:
        d = sum(s.postings(t).df for s in shards if s.has_term(t))
        if d:
            df[t] = d
    cands: list[tuple[int, float]] = []
    for s in shards:
        cands.extend(
            s.bm25_topk_global(
                query, k, n_global=n_global, avgdl_global=avgdl, df_global=df
            )
        )
    cands.sort(key=lambda p: (-p[1], p[0]))
    return cands[:k]
