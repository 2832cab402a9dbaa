"""Similarity search over embedding columns (list<float>).

Baseline: brute-force cosine top-k — a numpy matmul per batch against a
broadcast query matrix (``ray.put`` once, read per actor), partial top-k
per batch, tiny final merge. Scale path: random-hyperplane LSH bucketing
so candidate generation shuffles only (bucket, id) rows; an IVF variant
is the same shape with k-means centroids as the bucketer.

These back the ``ann_*`` and ``embedding near-dup`` queries; they are
deliberately deterministic (fixed seeds, stable tie-breaks on id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float32 matrix (zero-copy flatten)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    import pyarrow.compute as pc

    flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False).astype(np.float32, copy=False)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """map_batches stage: per-batch cosine top-k against broadcast queries.

    Emits (query_id, vec_id, cos) for the batch-local top-k only — the
    global merge handles ≤ k·num_batches tiny rows, never the corpus.
    """

    def __init__(self, queries_ref, k: int = 10, id_col: str = "vec_id", emb_col: str = "embedding"):
        import ray

        qids, qmat = ray.get(queries_ref)
        self.qids = np.asarray(qids)
        self.q = _normalize(np.asarray(qmat, dtype=np.float32))
        self.k = k
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_to_matrix(batch[self.emb_col]))
        scores = m @ self.q.T  # (n, q)
        k = min(self.k, len(ids))
        out_q, out_id, out_cos = [], [], []
        for qi in range(self.q.shape[0]):
            s = scores[:, qi]
            top = np.argpartition(-s, k - 1)[:k] if len(ids) > k else np.arange(len(ids))
            for i in top:
                out_q.append(self.qids[qi])
                out_id.append(ids[i])
                out_cos.append(float(s[i]))
        return pa.Table.from_arrays(
            [
                pa.array(out_q, pa.int64()),
                pa.array(out_id, batch[self.id_col].type),
                pa.array(out_cos, pa.float64()),
            ],
            names=["query_id", "vec_id", "cos"],
        )


def ann_topk(ds, query_ids, query_matrix, k: int = 10, id_col: str = "vec_id", emb_col: str = "embedding"):
    """Brute-force cosine top-k for a handful of query vectors.

    Returns a small Dataset of exactly k rows per query, ordered
    deterministically (cos desc, vec_id asc). The matmul runs where the
    data is; only per-batch top-k rows cross the object store.
    """
    import ray

    ref = ray.put((list(query_ids), np.asarray(query_matrix, dtype=np.float32)))
    partials = ds.map_batches(
        BruteForceTopK(ref, k, id_col, emb_col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=4,
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g["cos"] = g["cos"].round(4)
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


class HyperplaneLSH:
    """map_batches stage: embedding → nbits-bit signed random-projection
    bucket key. Deterministic from seed; bucket co-membership = candidate."""

    def __init__(self, dim: int, nbits: int = 12, seed: int = 42, id_col: str = "vec_id", emb_col: str = "embedding"):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, nbits)).astype(np.float32)
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        m = _normalize(_to_matrix(batch[self.emb_col]))
        bits = (m @ self.planes) > 0
        keys = (bits.astype(np.int64) << np.arange(bits.shape[1], dtype=np.int64)).sum(axis=1)
        return pa.Table.from_arrays(
            [ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids, pa.array(keys, pa.int64()), batch[self.emb_col].combine_chunks() if isinstance(batch[self.emb_col], pa.ChunkedArray) else batch[self.emb_col]],
            names=["vec_id", "bucket", "embedding"],
        )


def kmeans_centroids(sample: np.ndarray, k: int, iters: int = 8, seed: int = 42) -> np.ndarray:
    """Seeded mini k-means for IVF coarse quantization (numpy, driver-side
    over a SAMPLE — centroids are a small broadcastable model)."""
    rng = np.random.RandomState(seed)
    m = _normalize(sample.astype(np.float64))
    cents = m[rng.choice(len(m), size=min(k, len(m)), replace=False)]
    for _ in range(iters):
        assign = (m @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


class IVFAssign:
    """map_batches stage: embedding → nearest-centroid list id (IVF
    bucketing; the scale path for ANN — candidate generation shuffles
    only (list_id, vec_id) rows, search probes nprobe lists)."""

    def __init__(self, centroids_ref, id_col: str = "vec_id", emb_col: str = "embedding"):
        import ray

        c = centroids_ref
        self.centroids = ray.get(c) if not isinstance(c, np.ndarray) else c
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[self.emb_col]).astype(np.float64))
        lists = (m @ self.centroids.T).argmax(axis=1).astype(np.int32)
        ids = batch[self.id_col]
        return pa.Table.from_arrays(
            [
                ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids,
                pa.array(lists, pa.int32()),
                batch[self.emb_col].combine_chunks() if isinstance(batch[self.emb_col], pa.ChunkedArray) else batch[self.emb_col],
            ],
            names=["vec_id", "list_id", "embedding"],
        )


def ivf_topk(ds, query_vec: np.ndarray, centroids: np.ndarray, k: int = 10, nprobe: int = 4):
    """IVF ANN search: assign corpus to inverted lists (once per query
    set in this simple form; a persisted index at scale), probe the
    ``nprobe`` closest lists, exact-score only those candidates.

    Returns (result_dataset, probed_list_ids). Recall < 1.0 by design —
    compare against ``ann_topk`` brute force to measure it."""
    import ray

    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    probe = np.argsort(-(centroids @ qn))[:nprobe].astype(np.int32)
    probe_set = set(int(x) for x in probe)
    cref = ray.put(centroids)
    assigned = ds.map_batches(IVFAssign(cref), batch_format="pyarrow", batch_size=4096)

    import pyarrow.compute as _pc

    def score(t: pa.Table) -> pa.Table:
        mask = pa.array([int(x) in probe_set for x in t["list_id"].to_pylist()])
        t = t.filter(mask)
        if t.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.float64())], names=["vec_id", "cos"]
            )
        m = _normalize(_to_matrix(t["embedding"]).astype(np.float64))
        cos = np.round(m @ qn, 4)
        ids = t["vec_id"].combine_chunks() if isinstance(t["vec_id"], pa.ChunkedArray) else t["vec_id"]
        return pa.Table.from_arrays(
            [_pc.cast(ids, pa.int64()), pa.array(cos, pa.float64())], names=["vec_id", "cos"]
        )

    scored = assigned.map_batches(score, batch_format="pyarrow")
    return scored.sort(["cos", "vec_id"], descending=[True, False]).limit(k), probe


def embedding_near_dups(ds, dim: int, threshold: float = 0.97, nbits: int = 10, seed: int = 42):
    """Embedding-cosine near-dup pairs via LSH bucketing + in-bucket verify.

    Shuffle moves (vec_id, bucket, embedding); at cluster scale drop the
    embedding from the shuffle and re-join per bucket instead.
    """
    buckets = ds.map_batches(HyperplaneLSH(dim, nbits, seed), batch_format="pyarrow", batch_size=4096)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"), "vec_b": pd.Series([], dtype="int64"), "cos": pd.Series([], dtype="float64")})
        g = g.sort_values("vec_id").reset_index(drop=True)
        ids = g["vec_id"].to_numpy()
        m = _normalize(np.stack([np.asarray(e, dtype=np.float32) for e in g["embedding"]]))
        s = m @ m.T
        a_out, b_out, cos = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if s[i, j] >= threshold and ids[i] != ids[j]:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    cos.append(round(float(s[i, j]), 4))
        return pd.DataFrame({"vec_a": a_out, "vec_b": b_out, "cos": cos})

    from ray.data.aggregate import Max

    cand = buckets.groupby("bucket").map_groups(pairs, batch_format="pandas")
    return cand.groupby(["vec_a", "vec_b"]).aggregate(Max("cos", alias_name="cos"))
