"""Shared adaptive dimension join (stages/joins.py) and house-style
distributed top-k (stages/topk.py) — round-3 VERDICT items 7/8."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from freshonions_torscraper_ray.stages.joins import join_dim_column
from freshonions_torscraper_ray.stages.topk import topk


def _dim_fixture(tmp_path):
    dim = pa.table(
        {
            "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "v": pa.array(["a", "b", "c", "d", "e"], pa.string()),
        }
    )
    path = str(tmp_path / "dim.parquet")
    pq.write_table(dim, path)
    fact = pa.table(
        {
            "fk": pa.array([3, 1, 9, 2, 2, 5, 7, 4], pa.int64()),  # 9 and 7 unmatched
            "x": pa.array(list(range(8)), pa.int64()),
        }
    )
    return path, fact


def _norm(ds):
    df = ds.to_pandas()[["fk", "x", "v"]]
    return df.sort_values(["x"]).reset_index(drop=True)


def test_join_dim_column_paths_agree(ray_session, tmp_path):
    """Broadcast and hash-join paths must produce identical INNER-join
    results (unmatched fact rows dropped in both)."""
    path, fact = _dim_fixture(tmp_path)
    ds = rd.from_arrow(fact)
    bcast = _norm(join_dim_column(ds, path, "fk", "k", "v", broadcast_threshold=100))
    hashed = _norm(join_dim_column(rd.from_arrow(fact), path, "fk", "k", "v", broadcast_threshold=2))
    assert len(bcast) == 6  # rows with fk in {1,2,2,3,4,5}
    assert bcast.equals(hashed)
    assert set(bcast["v"]) == {"a", "b", "c", "d", "e"}


def test_topk_matches_sort_limit(ray_session):
    rng = np.random.RandomState(7)
    t = pa.table(
        {
            "score": pa.array(rng.randint(0, 50, size=5000), pa.int64()),
            "id": pa.array(rng.permutation(5000), pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(13)
    got = topk(ds, ["score", "id"], [True, False], 25).to_pandas()
    want = (
        rd.from_arrow(t).sort(["score", "id"], descending=[True, False]).limit(25).to_pandas()
    )
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_topk_fewer_rows_than_k(ray_session):
    t = pa.table({"score": pa.array([3, 1, 2], pa.int64()), "id": pa.array([0, 1, 2], pa.int64())})
    got = topk(rd.from_arrow(t), ["score", "id"], [True, False], 10).to_pandas()
    assert got["score"].tolist() == [3, 2, 1]


def test_join_dim_column_dtype_and_all_miss_batches(ray_session, tmp_path):
    """Broadcast path must keep the dimension's dtype (int64 stays int64
    under partial matches — reindex would NaN-promote to float64) and an
    all-miss batch must emit the SAME typed (empty) column, never a
    null-typed one that breaks downstream schema unification."""
    dim = pa.table(
        {"k": pa.array([1, 2], pa.int64()), "v": pa.array([10, 20], pa.int64())}
    )
    path = str(tmp_path / "dim_int.parquet")
    pq.write_table(dim, path)
    # two blocks: one partially matched, one with NO matches at all
    fact = pa.table({"fk": pa.array([1, 9, 2, 7, 8, 6], pa.int64())})
    ds = rd.from_arrow(fact).repartition(2)
    out = join_dim_column(ds, path, "fk", "k", "v", broadcast_threshold=100)
    assert out.schema().types[1] == pa.int64()  # not float64, not null
    df = out.to_pandas().sort_values("fk").reset_index(drop=True)
    assert df["fk"].tolist() == [1, 2] and df["v"].tolist() == [10, 20]


def test_events_range_join_matches_brute_force(ray_session, tmp_path):
    """Banded range join == brute-force O(n^2) count, and is invariant
    to block layout (replicas/events may land in any block)."""
    import numpy as np

    from freshonions_torscraper_ray.pipelines.queries import (
        _RANGE_H_US,
        q_events_range_join,
    )

    rng = np.random.RandomState(5)
    n = 400
    ts_us = np.sort(rng.randint(0, 5 * _RANGE_H_US, size=n).astype(np.int64))
    uid = rng.randint(0, 7, size=n).astype(np.int64)
    etype = np.where(rng.rand(n) < 0.3, "purchase", "view")
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(etype.tolist(), pa.string()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(t, f"{sf}/events.parquet")

    expect = {}
    for i in range(n):
        if etype[i] != "purchase":
            continue
        m = (uid == uid[i]) & (ts_us < ts_us[i]) & (ts_us >= ts_us[i] - _RANGE_H_US)
        expect[i] = int(m.sum())

    got = q_events_range_join(sf).to_pandas()
    assert len(got) == len(expect)
    assert dict(zip(got["event_id"], got["n_prior"])) == expect
