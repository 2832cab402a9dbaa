"""Graph operators over edge tables: distributed connected components.

The reference surfaced "clone family" / related-onion groupings (Flask
pages joining domains over shared fingerprints and links — SURVEY.md
§2.2 O25, §2.5); connected components over the link graph is the same
analysis done properly, and doubles as the clustering step of near-dup
deduplication (pairs → duplicate clusters → keep one doc per cluster),
which a training-data pipeline needs after any pair-producing dedup op.

Scale shape (Boruvka-style edge contraction):

1. ``map_batches(_local_forest)``: per-batch union-find emits a spanning
   forest of the batch's edges — ≤ (distinct nodes − components) rows,
   so each pass strictly discards every cycle/duplicate edge it sees.
2. ``repartition`` between passes concentrates surviving forest edges
   into fewer batches, so pass k+1 merges what pass k couldn't see
   together. E shrinks toward (V_linked − C) while never materializing
   more than a block at a time.
3. The residual forest (≤ V_linked − C edges, NOT the raw edge set) is
   union-found once at the end, and the label map is broadcast
   (``ray.put``) to label nodes in a streaming pass.

Step 3 holds O(V_linked) driver state — fine while linked-node count
fits one machine (the raw edge table never does). At a 10^10-node
frontier the label map itself must shard: reuse the seen-shard pattern
(hash-partitioned label actors, batched lookup RPCs) — the operator's
signature would not change.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class _UF:
    """Union-find with path halving (plain dict — keys are node ids)."""

    __slots__ = ("p",)

    def __init__(self):
        self.p: dict = {}

    def find(self, x):
        p = self.p
        r = p.setdefault(x, x)
        while r != p[r]:
            p[r] = p[p[r]]
            r = p[r]
        while x != r:
            p[x], x = r, p[x]
        return r

    def union(self, a, b) -> bool:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        if rb < ra:  # min-root: labels are deterministic (smallest member)
            ra, rb = rb, ra
        self.p[rb] = ra
        return True

    def labels(self) -> dict:
        return {x: self.find(x) for x in self.p}


def _local_forest(batch: pa.Table) -> pa.Table:
    """Union-find one edge batch → spanning-forest edges (a<b rows,
    root-to-member), dropping every redundant edge in the batch."""
    a = batch["a"].to_pylist()
    b = batch["b"].to_pylist()
    uf = _UF()
    keep_a, keep_b = [], []
    for x, y in zip(a, b):
        if x != y and uf.union(x, y):
            keep_a.append(x)
            keep_b.append(y)
    return pa.Table.from_arrays(
        [pa.array(keep_a, type=batch["a"].type), pa.array(keep_b, type=batch["b"].type)],
        names=["a", "b"],
    )


def connected_components(edges_ds, nodes_ds, node_col: str, passes: int = 2):
    """Component label (= smallest member id) for every node.

    ``edges_ds``: Dataset with string/int columns ``a``, ``b``.
    ``nodes_ds``: Dataset holding ``node_col`` (distinct not required —
    labeling dedups nothing; feed distinct nodes for a tidy output).
    Returns a Dataset (node, component); isolated nodes label themselves.
    """
    import ray

    e = edges_ds
    for i in range(max(passes, 1)):
        e = e.map_batches(_local_forest, batch_format="pyarrow")
        if i + 1 < passes:
            e = e.repartition(4 if i == 0 else 1)
    # residual forest: ≤ (linked nodes − components) edges after the
    # contraction passes — the bounded driver pull described above
    uf = _UF()
    for t in e.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        for x, y in zip(t["a"].to_pylist(), t["b"].to_pylist()):
            uf.union(x, y)
    labels_ref = ray.put(uf.labels())

    class Label:
        def __init__(self, ref):
            self.labels = ray.get(ref) if not isinstance(ref, dict) else ref

        def __call__(self, t: pa.Table) -> pa.Table:
            nodes = t[node_col]
            lab = self.labels
            vals = nodes.to_pylist()
            comp = [lab.get(v, v) for v in vals]  # isolated → self
            return pa.Table.from_arrays(
                [nodes.combine_chunks() if isinstance(nodes, pa.ChunkedArray) else nodes,
                 pa.array(comp, type=t[node_col].type)],
                names=["node", "component"],
            )

    return nodes_ds.map_batches(
        Label, fn_constructor_args=(labels_ref,), batch_format="pyarrow",
        batch_size=8192, concurrency=2,
    )


def _pagerank_join_path(e, nodes_ds, node_col: str, iters: int, scale: int):
    """Over-threshold PageRank: per iteration, ranks ⋈ outdeg (node-
    keyed) then edges ⋈ state (source-keyed) hash joins feed the
    contribution kernel, a node-keyed groupby-sum collects in-mass, and
    damping applies through a nodes-side LEFT join (no-inbound nodes
    coalesce to the base) — the broadcast path's integer update
    verbatim, with ranks staying a Dataset end-to-end (materialized
    once per iteration to bound the lazy plan). Caller contract (the
    broadcast path raises on violation; this path inner-drops): edge
    sources ⊆ nodes. Partition counts scale with the smaller join side
    and the session (the chained-join rule)."""
    import numpy as np
    from ray.data.aggregate import Count, Sum

    from .joins import session_parts

    base = (15 * scale) // 100
    nodes = (
        nodes_ds.groupby(node_col)
        .aggregate(Count(alias_name="_n"))
        .select_columns([node_col])
        .map_batches(lambda t: t.rename_columns(["node"]), batch_format="pyarrow")
        .materialize()
    )
    n_nodes = nodes.count()
    outdeg = e.groupby("a").aggregate(Count(alias_name="d")).materialize()
    n_src = outdeg.count()

    def init_ranks(t: pa.Table) -> pa.Table:
        return t.append_column(
            "pagerank", pa.array(np.full(t.num_rows, scale, dtype=np.int64))
        )

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()
    if n_src == 0 or max(iters, 0) == 0:
        # no edges: every iteration leaves base only (or no iterations:
        # the initial scale) — skip the join machinery entirely
        if max(iters, 0) == 0:
            return ranks
        val = base
        return nodes.map_batches(
            lambda t: t.append_column(
                "pagerank", pa.array(np.full(t.num_rows, val, dtype=np.int64))
            ),
            batch_format="pyarrow",
        )

    sp = session_parts()
    p_state = min(sp, min(n_nodes, n_src) // 20_000 + 1)
    p_edges = min(sp, n_src // 20_000 + 1)

    def contrib(t: pa.Table) -> pa.Table:
        r = t["pagerank"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        c = (r * 17) // (20 * d)
        return pa.table({"tgt": t["b"], "c": pa.array(c, pa.int64())})

    def damp(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = pc.coalesce(t["c"], pa.scalar(0, pa.int64()))
        return pa.table(
            {"node": t["node"], "pagerank": pc.add(pc.cast(c, pa.int64()), base)}
        )

    for _ in range(max(iters, 0)):
        state = ranks.join(outdeg, join_type="inner", num_partitions=p_state,
                           on=("node",), right_on=("a",))
        rows = e.join(state, join_type="inner", num_partitions=p_edges,
                      on=("a",), right_on=("node",))
        sums = rows.map_batches(contrib, batch_format="pyarrow").groupby(
            "tgt"
        ).aggregate(Sum("c", alias_name="c"))
        joined = nodes.join(sums, join_type="left_outer", num_partitions=p_state,
                            on=("node",), right_on=("tgt",))
        ranks = joined.map_batches(damp, batch_format="pyarrow").materialize()
    return ranks


def pagerank_int(edges_ds, nodes_ds, node_col: str = "node", iters: int = 5, scale: int = 10**9):
    """Fixed-point integer PageRank — link-graph importance ranking
    (the reference surfaced domains by inbound-link counts; PageRank is
    that analysis done properly) with EXACT cross-engine reproducibility:

    every quantity is an int64 (rank starts at ``scale`` ≡ 1.0;
    per-iteration update ``r' = 0.15·scale + Σ_in (r·17)//(20·outdeg)``
    uses only integer multiply / floor-div / sum, so the result is
    independent of summation order and bit-identical between the engine
    and a DuckDB twin — no float tolerance anywhere). Fixed ``iters``
    power iterations; dangling nodes keep the damping base only (their
    mass leaks — the standard simplification, part of the definition).

    Scale shape: edges stream through ``map_batches`` (never
    materialized); ranks + out-degrees are NODE-level state — below
    GRAPH_BROADCAST_MAX_NODES they broadcast per iteration via
    ``ray.put`` and re-collect from a node-sized groupby (PageRank here
    runs at DOMAIN granularity, so ~10^7 entries at the 10^10-URL
    frontier fits); ABOVE the gate each iteration becomes
    edges ⋈ (ranks ⋈ outdeg) hash-joins + a node-keyed groupby, ranks
    stay a Dataset end-to-end and nothing node-sized touches the driver
    or one worker heap. Identical integer semantics (unit-tested by
    forcing the gate to 0).
    """
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    # distinct directed edges, self-loops dropped (part of the definition)
    import pyarrow.compute as pc

    e = edges_ds.map_batches(
        lambda t: t.filter(pc.not_equal(t["a"], t["b"])), batch_format="pyarrow"
    )
    e = e.groupby(["a", "b"]).aggregate(Count(alias_name="_n")).select_columns(["a", "b"]).materialize()

    if nodes_ds.count() > _graph_threshold():
        return _pagerank_join_path(e, nodes_ds, node_col, iters, scale)

    def _pull_pairs(ds, k, v) -> pd.Series:
        parts = list(ds.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        if not parts:
            return pd.Series([], dtype="int64")
        t = pa.concat_tables(parts)
        return pd.Series(t[v].to_numpy(zero_copy_only=False), index=t[k].to_pylist())

    outdeg = _pull_pairs(e.groupby("a").aggregate(Count(alias_name="d")), "a", "d")
    node_parts = list(nodes_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
    node_tab = pa.concat_tables(node_parts)
    node_type = node_tab[node_col].type
    node_index = pd.Index(pd.unique(np.asarray(node_tab[node_col].to_pylist(), dtype=object)))
    base = (15 * scale) // 100
    ranks = pd.Series(np.full(len(node_index), scale, dtype=np.int64), index=node_index)

    for _ in range(max(iters, 0)):
        ref = ray.put((ranks, outdeg))

        class Contrib:
            def __init__(self):
                r, d = ray.get(ref)
                self.r, self.d = r, d

            def __call__(self, t: pa.Table) -> pa.Table:
                srcs = t["a"].to_pylist()
                idx = self.r.index.get_indexer(srcs)
                di = self.d.index.get_indexer(srcs)
                if (idx < 0).any() or (di < 0).any():
                    raise ValueError("pagerank: edge source not in node set")
                rv = self.r.to_numpy()[idx]
                dv = self.d.to_numpy()[di]
                c = (rv * 17) // (20 * dv)
                return pa.table({"node": t["b"], "c": pa.array(c, pa.int64())})

        sums = e.map_batches(Contrib, batch_format="pyarrow", concurrency=2).groupby(
            "node"
        ).aggregate(Sum("c", alias_name="c"))
        new = pd.Series(np.full(len(node_index), base, dtype=np.int64), index=node_index)
        got = _pull_pairs(sums, "node", "c")  # node-sized
        if len(got):
            pos = new.index.get_indexer(got.index)
            arr = new.to_numpy()
            arr[pos[pos >= 0]] += got.to_numpy()[pos >= 0]
            new = pd.Series(arr, index=node_index)
        ranks = new

    out = pa.table(
        {
            "node": pa.array(list(node_index), type=node_type),
            "pagerank": pa.array(ranks.to_numpy(), pa.int64()),
        }
    )
    return rd.from_arrow(out)


def cluster_stats(cc_ds):
    """(component, size) per cluster — the dedup 'keep one per cluster'
    accounting table."""
    from ray.data.aggregate import Count

    return cc_ds.groupby("component").aggregate(Count(alias_name="size"))


# Broadcast gate for the per-node degree table: at or below this many
# nodes the (pd.Index, degs) pair rides ray.put (2M string nodes ≈
# ~120 MB per worker — the stages/joins.py heap budget); above it the
# orientation flips to two degree-keyed hash joins and NOTHING
# node-sized touches the driver or a single worker heap (round-5
# VERDICT #3: at domain granularity ~10^7 nodes the broadcast is
# GB-scale). Env override lets tests force the join path on tiny data.
GRAPH_BROADCAST_MAX_NODES = 2_000_000


def _graph_threshold() -> int:
    import os

    return int(os.environ.get("GRAFT_GRAPH_BROADCAST_MAX_NODES",
                              GRAPH_BROADCAST_MAX_NODES))


def _orient_from_cols(t: pa.Table) -> pa.Table:
    """(lo, hi, dl, dh) → oriented (u, v, vdeg) with key(u) < key(v),
    key = (degree, name) — the SAME comparison as the broadcast Orient
    (lo < hi lexicographically, so deg ties keep lo first)."""
    lo = t["lo"].to_numpy(zero_copy_only=False)
    hi = t["hi"].to_numpy(zero_copy_only=False)
    dl = t["dl"].to_numpy(zero_copy_only=False)
    dh = t["dh"].to_numpy(zero_copy_only=False)
    fwd = dl <= dh
    u = np.where(fwd, lo, hi)
    v = np.where(fwd, hi, lo)
    vdeg = np.where(fwd, dh, dl)
    return pa.table(
        {
            "u": pa.array(u, pa.string()),
            "v": pa.array(v, pa.string()),
            "vdeg": pa.array(vdeg.astype(np.int64), pa.int64()),
        }
    )


def _oriented_graph(edges_ds):
    """Shared triangle-family prologue over DISTINCT undirected edges
    (lo, hi), lo < hi, no self-loops: degree map, then one
    degree-orientation pass. Both datasets are consumed twice
    downstream, so they are pinned (edge-table-sized, not
    corpus-sized).

    Degree attachment is GATED (GRAPH_BROADCAST_MAX_NODES): broadcast
    (pd.Index get_indexer per batch) below, two node-keyed hash joins
    above — identical output (unit-tested by forcing the gate to 0).
    Returns (oriented_ds, n_nodes, n_edges, deg_ds, dref) where dref is
    None on the hash-join path (clustering_coefficients then joins
    deg_ds instead of broadcasting)."""
    import numpy as np
    import pandas as pd
    import ray
    from ray.data.aggregate import Count

    from .joins import session_parts

    edges_ds = edges_ds.materialize()
    deg_ds = (
        edges_ds.map_batches(
            lambda t: pa.table(
                {
                    "node": pa.concat_arrays(
                        [t["lo"].combine_chunks(), t["hi"].combine_chunks()]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
        .materialize()
    )
    n_nodes = deg_ds.count()
    n_edges = (deg_ds.sum("deg") or 0) // 2

    if n_nodes <= _graph_threshold():
        deg_rows = deg_ds.take_all()
        nodes_idx = pd.Index([r["node"] for r in deg_rows])
        degs = np.array([r["deg"] for r in deg_rows], dtype=np.int64)
        ref = ray.put((nodes_idx, degs))

        class Orient:
            """(lo, hi) → oriented (u, v, vdeg), broadcast degree map;
            one vectorized get_indexer per batch."""

            def __init__(self, deg_ref):
                self.idx, self.deg = ray.get(deg_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                lo = t["lo"].to_numpy(zero_copy_only=False)
                hi = t["hi"].to_numpy(zero_copy_only=False)
                dl = self.deg[self.idx.get_indexer(lo)]
                dh = self.deg[self.idx.get_indexer(hi)]
                t2 = pa.table(
                    {
                        "lo": t["lo"],
                        "hi": t["hi"],
                        "dl": pa.array(dl, pa.int64()),
                        "dh": pa.array(dh, pa.int64()),
                    }
                )
                return _orient_from_cols(t2)

        oriented = edges_ds.map_batches(
            Orient, fn_constructor_args=(ref,), batch_format="pyarrow", concurrency=2
        ).materialize()
        return oriented, n_nodes, n_edges, deg_ds, ref

    # hash-join path: every edge endpoint picks up its degree through a
    # node-keyed shuffle; partitions scale with the node count (and the
    # session), never beyond a side's rows (Ray chained-join rule)
    parts = min(session_parts(), n_nodes // 20_000 + 1)
    deg_lo = deg_ds.map_batches(
        lambda t: t.rename_columns(["lo_k", "dl"]), batch_format="pyarrow"
    )
    deg_hi = deg_ds.map_batches(
        lambda t: t.rename_columns(["hi_k", "dh"]), batch_format="pyarrow"
    )
    j = edges_ds.join(deg_lo, join_type="inner", num_partitions=parts,
                      on=("lo",), right_on=("lo_k",))
    j = j.join(deg_hi, join_type="inner", num_partitions=parts,
               on=("hi",), right_on=("hi_k",))
    oriented = j.map_batches(_orient_from_cols, batch_format="pyarrow").materialize()
    return oriented, n_nodes, n_edges, deg_ds, None


_WEDGE_CHUNK = 1 << 18  # max pair rows materialized per allocation


def _wedge_index_chunks(n: int, max_pairs: int = _WEDGE_CHUNK):
    """Yield (i, j) int64 index-array chunks covering every upper-triangle
    pair of ``range(n)`` in (i, j) order. Each chunk holds at most
    ``max(max_pairs, n - 1)`` pairs, so peak allocation is bounded
    independent of group size — a single hub group can no longer demand
    one O(out_deg²) ``triu_indices`` allocation (round-4 ADVICE). Fully
    vectorized inside a chunk (no per-row Python loop)."""
    r = 0
    while r < n - 1:
        e, total = r, 0
        while e < n - 1 and (total == 0 or total + (n - 1 - e) <= max_pairs):
            total += n - 1 - e
            e += 1
        rows = np.arange(r, e, dtype=np.int64)
        counts = (n - 1) - rows
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        i = np.repeat(rows, counts)
        j = np.arange(total, dtype=np.int64) + np.repeat(rows + 1 - starts, counts)
        yield i, j
        r = e


def triangle_census(edges_ds) -> pa.Table:
    """(n_nodes, n_edges, n_triangles) over a Dataset of DISTINCT
    undirected edges (lo, hi) with lo < hi and no self-loops.

    Degree-oriented wedge counting — the standard distributed triangle
    algorithm: orient every edge from its lower-(degree, name) endpoint
    to the higher, bounding each node's out-degree by ~sqrt(2|E|) even
    at hub domains; enumerate out-neighbor pairs (wedges) per node in
    orientation order; a wedge closes iff its (x, y) pair is itself an
    oriented edge — checked with the sentinel-groupby trick (union
    wedge rows with edge rows, ONE pair-keyed groupby), no join, no
    unoriented hub blow-up."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    oriented, n_nodes, n_edges, _deg_ds, _dref = _oriented_graph(edges_ds)

    def wedges(df):
        df = df.sort_values(["vdeg", "v"], kind="mergesort")
        v = df["v"].to_numpy()
        chunks = [
            pa.table(
                {
                    "x": pa.array(v[i], pa.string()),
                    "y": pa.array(v[j], pa.string()),
                    "w": pa.array(np.ones(len(i), dtype=np.int64)),
                    "e": pa.array(np.zeros(len(i), dtype=np.int64)),
                }
            )
            for i, j in _wedge_index_chunks(len(v))
        ]
        if not chunks:
            return pa.table(
                {
                    "x": pa.array([], pa.string()),
                    "y": pa.array([], pa.string()),
                    "w": pa.array([], pa.int64()),
                    "e": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(chunks)

    wedge_rows = oriented.groupby("u").map_groups(wedges, batch_format="pandas")
    edge_rows = oriented.map_batches(
        lambda t: pa.table(
            {
                "x": t["u"],
                "y": t["v"],
                "w": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "e": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    closed = (
        wedge_rows.union(edge_rows)
        .groupby(["x", "y"])
        .aggregate(Sum("w", alias_name="n_wedges"), Max("e", alias_name="has_edge"))
        .map_batches(
            lambda t: t.filter(pc.equal(t["has_edge"], 1)).select(["n_wedges"]),
            batch_format="pyarrow",
        )
    )
    n_triangles = closed.sum("n_wedges") or 0
    return pa.table(
        {
            "n_nodes": pa.array([n_nodes], pa.int64()),
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_triangles": pa.array([int(n_triangles)], pa.int64()),
        }
    )


def clustering_coefficients(edges_ds):
    """Per-node triangle counts + local clustering coefficient
    coeff = round4(2T / (deg·(deg−1))) over the undirected graph —
    the per-domain tight-cluster score behind the global census.

    Same oriented-wedge machinery as triangle_census, but wedge rows
    keep their CENTER u, and the pair-keyed groupby emits one corner
    row per triangle vertex (wedge rows in a group are triangles iff
    the group also holds the closing edge row). Corner rows → one tiny
    node-keyed sum; degrees ride the broadcast map. Returns a Dataset
    of (node, n_triangles, degree, coeff)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    oriented, n_nodes, _n_edges, deg_ds, dref = _oriented_graph(edges_ds)

    def wedges_with_center(df):
        df = df.sort_values(["vdeg", "v"], kind="mergesort")
        u = df["u"].to_numpy()
        v = df["v"].to_numpy()
        chunks = [
            pa.table(
                {
                    "x": pa.array(v[i], pa.string()),
                    "y": pa.array(v[j], pa.string()),
                    "u": pa.array(np.repeat(u[:1], len(i)), pa.string()),
                    "e": pa.array(np.zeros(len(i), dtype=np.int64)),
                }
            )
            for i, j in _wedge_index_chunks(len(v))
        ]
        if not chunks:
            return pa.table(
                {
                    "x": pa.array([], pa.string()),
                    "y": pa.array([], pa.string()),
                    "u": pa.array([], pa.string()),
                    "e": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(chunks)

    wedge_rows = oriented.groupby("u").map_groups(wedges_with_center, batch_format="pandas")
    edge_rows = oriented.map_batches(
        lambda t: pa.table(
            {
                "x": t["u"],
                "y": t["v"],
                "u": pa.array([""] * t.num_rows, pa.string()),
                "e": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    )

    def corners(t: pa.Table) -> pa.Table:
        # one (x, y) group: wedge rows are triangles iff an edge row exists
        if not pc.any(pc.equal(t["e"], 1)).as_py():
            return pa.table({"node": pa.array([], pa.string()),
                             "t": pa.array([], pa.int64())})
        w = t.filter(pc.equal(t["e"], 0))
        if w.num_rows == 0:
            return pa.table({"node": pa.array([], pa.string()),
                             "t": pa.array([], pa.int64())})
        nodes = np.concatenate([
            w["u"].to_numpy(zero_copy_only=False),
            w["x"].to_numpy(zero_copy_only=False),
            w["y"].to_numpy(zero_copy_only=False),
        ])
        return pa.table({"node": pa.array(nodes, pa.string()),
                         "t": pa.array(np.ones(len(nodes), dtype=np.int64))})

    tri = (
        wedge_rows.union(edge_rows)
        .groupby(["x", "y"])
        .map_groups(corners, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("t", alias_name="n_triangles"))
    )
    # degree map: reuse _oriented_graph's broadcast (dref) when the
    # gate chose broadcast — same (nodes_idx, degs) tuple, no second
    # object-store copy; on the hash-join path (dref None) the degree
    # attaches through one node-keyed join against deg_ds instead

    def _coeff_table(node_col, tr: np.ndarray, d: np.ndarray) -> pa.Table:
        denom = d * (d - 1)
        coeff = round_half_away(
            np.where(denom > 0, 2.0 * tr / np.where(denom > 0, denom, 1), 0.0), 4
        )
        return pa.table(
            {
                "node": node_col,
                "n_triangles": pa.array(tr),
                "degree": pa.array(d.astype(np.int64)),
                "coeff": pa.array(coeff, pa.float64()),
            }
        )

    if dref is not None:

        class AttachDegree:
            def __init__(self, deg_ref):
                self.idx, self.deg = ray.get(deg_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                nodes = t["node"].to_numpy(zero_copy_only=False)
                tr = t["n_triangles"].to_numpy(zero_copy_only=False).astype(np.int64)
                d = self.deg[self.idx.get_indexer(nodes)]
                return _coeff_table(t["node"], tr, d)

        return tri.map_batches(AttachDegree, fn_constructor_args=(dref,),
                               batch_format="pyarrow", concurrency=2)

    from .joins import session_parts

    parts = min(session_parts(), n_nodes // 20_000 + 1)
    deg_named = deg_ds.map_batches(
        lambda t: t.rename_columns(["node_k", "deg"]), batch_format="pyarrow"
    )
    j = tri.join(deg_named, join_type="inner", num_partitions=parts,
                 on=("node",), right_on=("node_k",))
    return j.map_batches(
        lambda t: _coeff_table(
            t["node"],
            t["n_triangles"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["deg"].to_numpy(zero_copy_only=False).astype(np.int64),
        ),
        batch_format="pyarrow",
    )
