"""Export a built index to the REFERENCE's KVS ``index``-table format.

The reference's whole retrieval contract rests on one string shape:
``index`` table row = term -> ``acc`` = comma-joined postings
``"<docKey>:<freq>,..."`` (produced by the absent Indexer, consumed at
``search/Searcher.java:78-101`` — split on ``,``, each entry split on
``:``, df = entry count at ``Searcher.java:113``). This module reads
OUR format-2 shard parquet back into exactly that shape — the interop
path a reference user would need to feed their existing Searcher from a
Ray-built index, and an end-to-end codec round-trip exercised against a
SQL re-derivation (the ``index_export_acc`` oracle).

Physical plan: a distributed pruned read of the shard files (term, df
and the three varint streams), then ONE vectorized decode per batch —
``decode_runs_concat`` over the zero-copy concatenated blob view, two
Arrow casts, ``binary_join_element_wise`` (doc:tf pairs) and a
list-offset ``binary_join`` (comma concat). No per-term Python. Postings
come out doc_id-ascending (the codec's canonical order) — the reference
never pinned an order (KVS scan order), so we pin the deterministic one.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.codec import binary_values_view, decode_runs_concat


def export_reference_index(out_dir: str) -> rd.Dataset:
    """Shard parquet -> Dataset of (term, acc) rows in the reference's
    ``index`` acc-string format. ``df`` is exactly the posting count of
    the canonical merged row, so no per-term metadata pass is needed."""

    def to_acc(t: pa.Table) -> pa.Table:
        ns = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids, tfs, _dls = decode_runs_concat(
            binary_values_view(t["doc_blob"].combine_chunks()),
            binary_values_view(t["tf_blob"].combine_chunks()),
            binary_values_view(t["dl_blob"].combine_chunks()),
            ns,
        )
        pair = pc.binary_join_element_wise(
            pc.cast(pa.array(ids), pa.string()), pc.cast(pa.array(tfs), pa.string()), ":"
        )
        offs = np.concatenate(([0], np.cumsum(ns))).astype(np.int64)
        acc = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(offs, pa.int64()), pair), ","
        )
        return pa.table({"term": t["term"], "acc": acc})

    shards = rd.read_parquet(
        os.path.join(out_dir, "shards"),
        columns=["term", "df", "doc_blob", "tf_blob", "dl_blob"],
    )
    return shards.map_batches(to_acc, batch_format="pyarrow")


def import_reference_index(acc: rd.Dataset) -> rd.Dataset:
    """The inverse interop: a Dataset of reference ``index``-table rows
    (term, acc) -> parsed per-term stats (term, df, cf, max_tf) — what
    a user migrating FROM the reference runs to admit an existing KVS
    index dump into this engine's world (the acc string is the
    reference's only index artifact; ``Searcher.java:80-113`` defines
    the split-on-','/split-on-':' parse and df = entry count).

    Parsing is fully vectorized per batch: one ``split_pattern`` on
    ',', flatten, one ``split_pattern`` on ':', two list_element casts,
    then segment sums over the original list offsets. Malformed
    entries follow the reference's fallback freq=1 rule
    (``Searcher.java:96-100``)."""

    def parse(t: pa.Table) -> pa.Table:
        entries = pc.split_pattern(t["acc"].combine_chunks(), ",")
        ns = pc.list_value_length(entries).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(entries)
        parts = pc.split_pattern(flat, ":")
        # the reference takes the LAST part as freq and falls back to 1
        # on parse failure (Searcher.java:96-100)
        plens = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        last_idx = np.cumsum(plens) - 1  # last ':'-part of each entry
        last = pc.list_flatten(parts).take(pa.array(last_idx))
        ok = pc.match_substring_regex(last, r"^[0-9]+$")
        tfs = (
            pc.cast(pc.if_else(ok, last, "1"), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        tfs = np.maximum(tfs, 1)
        offs = np.concatenate(([0], np.cumsum(ns)))
        cf = np.add.reduceat(tfs, offs[:-1]) if tfs.size else np.zeros(0, np.int64)
        cf = np.where(ns > 0, cf, 0)
        max_tf = (
            np.maximum.reduceat(tfs, offs[:-1]) if tfs.size else np.zeros(0, np.int64)
        )
        max_tf = np.where(ns > 0, max_tf, 0)
        return pa.table(
            {
                "term": t["term"],
                "df": pa.array(ns),
                "cf": pa.array(cf),
                "max_tf": pa.array(max_tf),
            }
        )

    return acc.map_batches(parse, batch_format="pyarrow")
