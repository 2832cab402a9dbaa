"""Connected-components operator (stages/graph.py): exactness vs a
naive whole-graph union-find on random graphs, isolated-node labeling,
and multi-pass contraction equivalence."""

import random

import pyarrow as pa
import pytest

from freshonions_torscraper_ray.stages.graph import _UF, _local_forest, connected_components


def naive_components(edges, nodes):
    uf = _UF()
    for a, b in edges:
        uf.union(a, b)
    lab = uf.labels()
    return {n: lab.get(n, n) for n in nodes}


def test_local_forest_drops_cycles():
    t = pa.table({"a": [1, 2, 3, 1, 5], "b": [2, 3, 1, 3, 5]})
    f = _local_forest(t)
    # cycle edge 3-1 (or 1-3) and the self-loop 5-5 are dropped
    assert f.num_rows == 2
    got = naive_components(list(zip(f["a"].to_pylist(), f["b"].to_pylist())), [1, 2, 3])
    assert got == {1: 1, 2: 1, 3: 1}


def _cc_via_dataset(edges, nodes, passes=2):
    import ray.data as rd

    e = rd.from_arrow(
        pa.table({"a": [a for a, _ in edges], "b": [b for _, b in edges]})
    ).repartition(4)
    n = rd.from_arrow(pa.table({"node": nodes}))
    out = connected_components(e, n, "node", passes=passes)
    return {r["node"]: r["component"] for r in out.take_all()}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graph_matches_naive(ray_session, seed):
    rng = random.Random(seed)
    nodes = list(range(200))
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    assert _cc_via_dataset(edges, nodes) == naive_components(edges, nodes)


def test_isolated_nodes_label_themselves(ray_session):
    got = _cc_via_dataset([(1, 2)], [1, 2, 99])
    assert got[99] == 99 and got[1] == got[2] == 1


def test_cluster_stats_counts_members(ray_session):
    import ray.data as rd

    from freshonions_torscraper_ray.stages.graph import cluster_stats

    e = rd.from_arrow(pa.table({"a": [1, 5], "b": [2, 6]}))
    n = rd.from_arrow(pa.table({"node": [1, 2, 5, 6, 9]}))
    cc = connected_components(e, n, "node")
    got = {r["component"]: r["size"] for r in cluster_stats(cc).take_all()}
    assert got == {1: 2, 5: 2, 9: 1}


def test_path_graph_single_pass_insufficient_block_merge_still_exact(ray_session):
    # long path spread across blocks: forest edges must survive
    # contraction passes and merge in the driver finish
    edges = [(i, i + 1) for i in range(100)]
    got = _cc_via_dataset(edges, list(range(101)), passes=3)
    assert set(got.values()) == {0}


def test_pagerank_int_matches_scalar_reference(ray_session):
    """pagerank_int vs a naive per-node scalar implementation of the same
    integer definition (base + sum of (r*17)//(20*outdeg) over in-edges,
    5 iterations) — including dangling nodes and an isolated node."""
    import ray.data as rd

    from freshonions_torscraper_ray.stages.graph import pagerank_int

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"), ("a", "b")]  # dup edge
    nodes = ["a", "b", "c", "d", "e"]  # d dangling target-less? d->a; e isolated
    scale = 10**9
    base = (15 * scale) // 100
    dedup = sorted(set(e for e in edges if e[0] != e[1]))
    outdeg = {}
    for s, _ in dedup:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {n: scale for n in nodes}
    for _ in range(5):
        new = {n: base for n in nodes}
        for s, t in dedup:
            new[t] += (r[s] * 17) // (20 * outdeg[s])
        r = new

    eds = rd.from_items([{"a": s, "b": t} for s, t in edges])
    nds = rd.from_items([{"node": n} for n in nodes])
    got = pagerank_int(eds, nds, "node", iters=5, scale=scale).to_pandas()
    got = dict(zip(got["node"], got["pagerank"]))
    assert got == r


def _edges_ds(pairs):
    import ray.data as rd

    lo = [min(a, b) for a, b in pairs]
    hi = [max(a, b) for a, b in pairs]
    return rd.from_arrow(pa.table({"lo": pa.array(lo, pa.string()),
                                   "hi": pa.array(hi, pa.string())}))


def test_triangle_census_planted(ray_session):
    from freshonions_torscraper_ray.stages.graph import triangle_census

    # K4 on a-d (4 triangles) + a pendant edge + a disjoint triangle
    pairs = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e"), ("x", "y"), ("y", "z"), ("x", "z")]
    out = triangle_census(_edges_ds(pairs)).to_pydict()
    assert out["n_nodes"] == [8]
    assert out["n_edges"] == [10]
    assert out["n_triangles"] == [4 + 1]


@pytest.mark.parametrize("seed", [3, 11])
def test_triangle_census_matches_naive(ray_session, seed):
    from itertools import combinations

    from freshonions_torscraper_ray.stages.graph import triangle_census

    rng = random.Random(seed)
    nodes = [f"n{i}" for i in range(20)]
    pairs = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(60)})
    adj = {n: set() for n in nodes}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    naive = sum(1 for a, b, c in combinations(sorted(adj), 3)
                if b in adj[a] and c in adj[a] and c in adj[b])
    out = triangle_census(_edges_ds(pairs)).to_pydict()
    assert out["n_triangles"] == [naive]
    assert out["n_edges"] == [len(pairs)]


def test_clustering_coefficients_planted(ray_session):
    from freshonions_torscraper_ray.stages.graph import clustering_coefficients

    pairs = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e"), ("x", "y"), ("y", "z"), ("x", "z")]
    out = clustering_coefficients(_edges_ds(pairs)).to_pandas()
    got = {r["node"]: (r["n_triangles"], r["degree"], r["coeff"])
           for _, r in out.iterrows()}
    # K4 members: 3 triangles each; a,b,c deg 3 -> coeff 1.0; d deg 4 -> 0.5
    assert got["a"] == (3, 3, 1.0) and got["b"] == (3, 3, 1.0) and got["c"] == (3, 3, 1.0)
    assert got["d"] == (3, 4, 0.5)
    # disjoint triangle: 1 each, deg 2 -> 1.0; pendant e: no triangles -> absent
    assert got["x"] == (1, 2, 1.0) and got["y"] == (1, 2, 1.0) and got["z"] == (1, 2, 1.0)
    assert "e" not in got


def test_wedge_index_chunks_match_triu():
    import numpy as np

    from freshonions_torscraper_ray.stages.graph import _wedge_index_chunks

    for n in (0, 1, 2, 3, 17, 64, 257):
        ii, jj = np.triu_indices(n, 1)
        chunks = list(_wedge_index_chunks(n, max_pairs=7))
        i = np.concatenate([c[0] for c in chunks]) if chunks else np.empty(0, np.int64)
        j = np.concatenate([c[1] for c in chunks]) if chunks else np.empty(0, np.int64)
        assert (i == ii).all() and (j == jj).all()
        # bound holds: no chunk exceeds max(max_pairs, n - 1)
        assert all(len(c[0]) <= max(7, n - 1) for c in chunks)


def test_triangle_family_hash_join_path_matches_broadcast(ray_session, monkeypatch):
    """Round-5 VERDICT #3: forcing the degree-table gate to 0 routes
    orientation (and clustering's degree attach) through node-keyed
    hash joins; results must be identical to the broadcast path."""
    from freshonions_torscraper_ray.stages.graph import (
        clustering_coefficients,
        triangle_census,
    )

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(25)]
    pairs = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(80)})

    monkeypatch.delenv("GRAFT_GRAPH_BROADCAST_MAX_NODES", raising=False)
    census_b = triangle_census(_edges_ds(pairs)).to_pydict()
    cc_b = clustering_coefficients(_edges_ds(pairs)).to_pandas()

    monkeypatch.setenv("GRAFT_GRAPH_BROADCAST_MAX_NODES", "0")
    census_j = triangle_census(_edges_ds(pairs)).to_pydict()
    cc_j = clustering_coefficients(_edges_ds(pairs)).to_pandas()

    assert census_b == census_j

    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

    assert norm(cc_b).equals(norm(cc_j))


def test_pagerank_join_path_matches_broadcast(ray_session, monkeypatch):
    """Forcing the node-table gate to 0 routes every PageRank iteration
    through hash joins (ranks stay a Dataset); values must be identical
    to the broadcast path — same integer update, no driver state."""
    import ray.data as rd

    from freshonions_torscraper_ray.stages.graph import pagerank_int

    rng = random.Random(13)
    nodes = [f"n{i}" for i in range(30)]
    edges = [tuple(rng.sample(nodes, 2)) for _ in range(120)]
    eds = rd.from_items([{"a": s, "b": t} for s, t in edges])
    nds = rd.from_items([{"node": n} for n in nodes])

    monkeypatch.delenv("GRAFT_GRAPH_BROADCAST_MAX_NODES", raising=False)
    a = pagerank_int(eds, nds, "node", iters=4).to_pandas()
    monkeypatch.setenv("GRAFT_GRAPH_BROADCAST_MAX_NODES", "0")
    eds2 = rd.from_items([{"a": s, "b": t} for s, t in edges])
    nds2 = rd.from_items([{"node": n} for n in nodes])
    b = pagerank_int(eds2, nds2, "node", iters=4).to_pandas()

    assert dict(zip(a["node"], a["pagerank"])) == dict(zip(b["node"], b["pagerank"]))


def test_pagerank_join_path_edge_free_graph(ray_session, monkeypatch):
    import ray.data as rd

    from freshonions_torscraper_ray.stages.graph import pagerank_int

    monkeypatch.setenv("GRAFT_GRAPH_BROADCAST_MAX_NODES", "0")
    eds = rd.from_items([{"a": "x", "b": "x"}])  # self-loop only -> dropped
    nds = rd.from_items([{"node": n} for n in ["x", "y"]])
    got = pagerank_int(eds, nds, "node", iters=3).to_pandas()
    base = (15 * 10**9) // 100
    assert dict(zip(got["node"], got["pagerank"])) == {"x": base, "y": base}
