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
