"""Extraction + tokenization stage (stateful actor pool) and the
vectorized postings-explode / dedup / stats batch transforms.

Reference parity:
- HTML->text+title extraction replaces the absent ``cis5550.jobs.Indexer``'s
  jsoup step (contract recovered from ``search/Searcher.java:52-57``);
  byte-identity per url is the pinned invariant.
- Exact content dedup replaces the ``contentSeen`` probe table
  (``crawler/Crawler.java:178-190``): keep the first-seen page per
  content hash (min ``warc_ts``, tie-break min ``url``), record the
  canonical url on the losers (``canonicalURL`` column,
  ``Crawler.java:183-185``) — expressed as a shuffle
  (``groupby(content_sha1).map_groups``) instead of a shared mutable KV.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64, hash64_array, sha1_hex
from ..functions.tokenize import extract_html, tokenize_count_batch

# Hot-term detection samples 1 in HOT_SAMPLE_MOD docs (deterministic by
# doc_id). Single source of truth: ExtractDocs writes the sampled_terms
# column with it and build_index scales the hot threshold by it — the
# two MUST agree or hot-term salting decisions corrupt silently.
HOT_SAMPLE_MOD = 8

DOC_META_COLS = [
    "doc_id",
    "url",
    "warc_ts",
    "lang",
    "content_sha1",
    "title",
    "body",
    "doc_len",
    "is_canonical",
    "canonical_url",
]


class ExtractDocs:
    """Actor-pool ``map_batches`` stage: pages -> docs(+term counts).

    One actor instance per pool slot; setup (nothing heavy here, but the
    pattern holds for real parsers/models) happens once in ``__init__``,
    per-batch work in ``__call__``. Input: pages batches (Arrow,
    zero-copy). Output columns: doc_id, url, warc_ts, lang,
    content_sha1, title, body, doc_len, terms(list<string>),
    tfs(list<int32>).

    Tokenization happens HERE, once, and term counts travel as Arrow
    list columns through the dedup shuffle — this avoids tokenizing
    twice (once for doc_len, once for postings) or re-shuffling text.
    The wide ``html`` column is dropped immediately (projection
    discipline: shuffle payloads stay narrow).
    """

    def __init__(
        self,
        verify_extraction: bool = False,
        hot_sample_mod: int = HOT_SAMPLE_MOD,
        content_seen_ref=None,
        store_positions: bool = False,
    ):
        from ..functions.runtime import cap_worker_threads

        cap_worker_threads()  # honest per-booked-CPU Arrow pool in workers
        self.verify = verify_extraction
        self.hot_sample_mod = hot_sample_mod
        # index format 3: also emit per-doc token POSITIONS (grouped by
        # term, the (terms, tfs) segment layout) for the positional index
        self.store_positions = store_positions
        # incremental-update contentSeen (first-indexed wins): pages whose
        # content sha1 OR url hash is already in the BASE index are dropped
        # at extraction, before any tokenize cost. The ref resolves once
        # per actor from the object store (broadcast, never re-shipped per
        # batch) to either
        #   - the legacy (doc_id list, sha1 list) pair -> frozenset gate
        #     (O(corpus) per actor; kept for the in-place merge path), or
        #   - a ``state.seenset.SeenGate`` (bloom + exact sidecar confirm;
        #     bounded per-actor memory — the segmented-update scale path).
        if content_seen_ref is not None:
            import ray

            gate = ray.get(content_seen_ref)
            if isinstance(gate, tuple):
                seen_ids, seen_sha1 = gate
                seen_ids, seen_sha1 = frozenset(seen_ids), frozenset(seen_sha1)

                class _FrozensetGate:
                    def is_seen(self, ids, sha1s):
                        return np.array(
                            [
                                s in seen_sha1 or int(i) in seen_ids
                                for i, s in zip(ids, sha1s)
                            ],
                            dtype=bool,
                        )

                self.gate = _FrozensetGate()
            else:
                self.gate = gate  # duck-typed: .is_seen(ids, sha1s)
        else:
            self.gate = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.gate is not None and batch.num_rows:
            ids = hash64_array(batch["url"])
            sha1s = [sha1_hex(h) for h in batch["html"].to_pylist()]
            batch = batch.filter(pa.array(~self.gate.is_seen(ids, sha1s)))
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        ref_text = batch["text"].to_pylist() if self.verify and "text" in batch.column_names else None

        # doc ids: ONE vectorized md5 pass over the url column (no
        # per-url Python hashing in phase A — bit-identical to
        # hash64(url) per value, see functions/hashing.py)
        n = len(urls)
        doc_ids = hash64_array(batch["url"])
        # per-doc work is only the string-level extraction + C-speed
        # sha1; tokenization/counting is one vectorized batch kernel
        sha1s: list[str] = []
        titles: list[str] = []
        texts: list[str] = []
        for i in range(n):
            title, text = extract_html(htmls[i])
            if ref_text is not None and text != ref_text[i]:
                raise ValueError(f"extraction not byte-identical for url={urls[i]}")
            sha1s.append(sha1_hex(htmls[i]))
            titles.append(title)
            texts.append(text)
        if self.store_positions:
            terms_list, tfs_list, doc_lens, positions_list = tokenize_count_batch(
                texts, return_positions=True
            )
        else:
            terms_list, tfs_list, doc_lens = tokenize_count_batch(texts)
            positions_list = None

        # ``sampled_terms``: the deterministic 1/HOT_SAMPLE_MOD doc
        # sample's term sets, stored as their own (mostly-empty) list
        # column so the checkpoint COMMIT pass (hot-term partial dfs)
        # reads ~1/8 of the terms bytes instead of the full column.
        mask = (doc_ids & (self.hot_sample_mod - 1)) == 0
        offs = terms_list.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offs) * mask
        new_offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        parents = pc.list_parent_indices(terms_list)
        keep = pa.array(mask[parents.to_numpy(zero_copy_only=False)])
        sampled = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()), terms_list.flatten().filter(keep)
        )

        out = {
            "doc_id": pa.array(doc_ids),
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "lang": batch["lang"],
            "content_sha1": pa.array(sha1s, pa.string()),
            "title": pa.array(titles, pa.string()),
            # the FULL extracted body: the reference's /search JSON
            # returns it per result (``urls`` row ``body``,
            # ``Searcher.java:52-57,186-191``) — a prefix here was a
            # silent contract deviation on the one user-facing API
            "body": pa.array(texts, pa.string()),
            "doc_len": pa.array(doc_lens),
            "terms": terms_list,
            "tfs": tfs_list,
            "sampled_terms": sampled,
        }
        if positions_list is not None:
            out["positions"] = positions_list
        if "part" in batch.column_names:  # checkpoint-partition routing key
            out["part"] = batch["part"]
        return pa.table(out)


def dedup_keep_first(group: pa.Table) -> pa.Table:
    """Per content-hash group: first-seen row (min warc_ts, then min url)
    is canonical; the rest keep only a pointer to the canonical url."""
    if group.num_rows == 1:
        return group.append_column("is_canonical", pa.array([True])).append_column(
            "canonical_url", group["url"]
        )
    ts = group["warc_ts"].to_numpy(zero_copy_only=False)
    urls = np.asarray(group["url"].to_pylist(), dtype=object)
    order = np.lexsort((urls, ts))
    win = int(order[0])
    is_can = np.zeros(group.num_rows, dtype=bool)
    is_can[win] = True
    can_url = np.full(group.num_rows, urls[win], dtype=object)
    return group.append_column("is_canonical", pa.array(is_can)).append_column(
        "canonical_url", pa.array(can_url.tolist(), pa.string())
    )


def explode_postings(batch: pa.Table) -> pa.Table:
    """Vectorized (terms, tfs) list columns -> one (term, doc_id, tf,
    dl) row per posting (``dl`` = the posting's document length, carried
    into the postings encode so scoring needs no doc-length side table).
    Replaces the reference's per-word ``flatMapToPair(word ->
    (word, doc:freq))`` emission (SURVEY §2.3)."""
    terms = batch["terms"].combine_chunks()
    tfs = batch["tfs"].combine_chunks()
    parents = pc.list_parent_indices(terms)
    return pa.table(
        {
            "term": terms.flatten(),
            "doc_id": pc.take(batch["doc_id"].combine_chunks(), parents),
            "tf": tfs.flatten().cast(pa.int64()),
            "dl": pc.take(batch["doc_len"].combine_chunks(), parents).cast(pa.int64()),
        }
    )


def explode_postings_with_positions(batch: pa.Table) -> tuple[pa.Table, np.ndarray]:
    """``explode_postings`` plus the flat position stream (format 3):
    the checkpoint's per-doc ``positions`` list column is already laid
    out in the (terms, tfs) segment order, so flattening it yields every
    posting's position list back-to-back in exploded-row order — the
    exact ``pos_flat`` contract of ``codec.encode_postings_multi``."""
    table = explode_postings(batch)
    pos_flat = (
        pc.list_flatten(batch["positions"].combine_chunks())
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    return table, pos_flat


def partial_term_stats(batch: pa.Table) -> pa.Table:
    """Per-batch partial aggregation of (df, cf) per term — one output
    row per (term, batch). The downstream ``groupby(term).aggregate``
    then shuffles only vocabulary-sized partials, never raw postings
    (pre-aggregate/combiner pattern; the reference shuffles every
    emission through KVS puts instead, ``flame/FlameWorker.java:163``)."""
    agg = batch.group_by("term").aggregate([("tf", "sum"), ("doc_id", "count")])
    return pa.table(
        {
            "term": agg["term"],
            "partial_cf": agg["tf_sum"],
            "partial_df": agg["doc_id_count"].cast(pa.int64()),
        }
    )
