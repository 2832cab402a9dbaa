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


def cluster_stats(cc_ds):
    """(component, size) per cluster — the dedup 'keep one per cluster'
    accounting table."""
    from ray.data.aggregate import Count

    return cc_ds.groupby("component").aggregate(Count(alias_name="size"))
