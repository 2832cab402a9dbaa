"""Round-5 VERDICT #8: bounded-skew two-phase sessionization.

q_events_sessions no longer holds a user's whole event history in one
map_groups group — groups are (user, 30-min bucket). These tests pin
the tricky semantics against a direct pandas lag() reference: exact
1800 s gaps (same session), strict >1800 s (new session), duplicate
timestamps, bucket-boundary predecessors, and a hot user whose history
spans many buckets.
"""

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from freshonions_torscraper_ray.pipelines import queries as q

EPOCH = dt.datetime(2025, 1, 1)


def _write_events(tmp_path, rows):
    """rows: list of (user_id, offset_seconds)"""
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [EPOCH + dt.timedelta(seconds=s) for _, s in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _reference(rows):
    df = pd.DataFrame(rows, columns=["user_id", "s"])
    out = {}
    for u, g in df.groupby("user_id"):
        ts = np.sort(g["s"].to_numpy())
        gaps = np.diff(ts)
        out[u] = 1 + int((gaps > 1800).sum())
    return out


def _run(sf_dir):
    df = q.q_events_sessions(sf_dir).to_pandas()
    return dict(zip(df["user_id"], df["n_sessions"]))


def test_boundary_gaps_and_duplicates(ray_session, tmp_path):
    rows = [
        (1, 0), (1, 1800),            # exactly 1800 s -> SAME session
        (1, 3601),                    # 1801 s after -> NEW session
        (2, 0), (2, 0), (2, 0),       # duplicate timestamps -> one session
        (2, 1801),                    # strict new session
        (3, 0), (3, 1799), (3, 3598), # chained <=1800 hops -> one session
        (4, 0), (4, 5400), (4, 5401), # isolated, then pair exactly 3600+1800+1? no: 5400-0=5400>1800 new; 5401-5400=1 same
    ]
    assert _run(_write_events(tmp_path, rows)) == _reference(rows)


def test_bucket_boundary_predecessor(ray_session, tmp_path):
    # predecessor in the PREVIOUS 30-min bucket, gap exactly/under/over
    rows = [
        (1, 1799), (1, 1800 + 1799),   # gap 1800 across the b=0/b=1 boundary -> same
        (2, 1799), (2, 1800 + 1800),   # gap 1801 -> new
        (3, 5399), (3, 5400),          # adjacent buckets, gap 1 -> same
    ]
    assert _run(_write_events(tmp_path, rows)) == _reference(rows)


@pytest.mark.parametrize("seed", [5, 17])
def test_hot_user_many_buckets_matches_reference(ray_session, tmp_path, seed):
    rng = np.random.RandomState(seed)
    rows = []
    # hot user: 400 events over ~3 days with gap mix straddling 1800 s
    offs = np.cumsum(rng.choice([30, 600, 1800, 1801, 4000], size=400))
    rows += [(99, int(s)) for s in offs]
    # plus sparse background users
    for u in range(5):
        offs = np.cumsum(rng.randint(1, 7200, size=10))
        rows += [(u, int(s)) for s in offs]
    assert _run(_write_events(tmp_path, rows)) == _reference(rows)
