"""Global shuffled-shard export (round-5 VERDICT #6): seeded
deterministic permutation → fixed-row training shards + manifest.
The assignment's hash-match vs the row_number()-over-splitmix64 twin is
in the conformance gate; these pin the operator semantics and the sink.
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from freshonions_torscraper_ray.pipelines import queries as q
from freshonions_torscraper_ray.pipelines.params import SHARD_ROWS


@pytest.fixture()
def tiny_sf(tmp_path):
    n = 150  # 3 shards candidate at SHARD_ROWS=64: 64+64+22
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([f"doc number {i} text" for i in range(n)], pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_assignment_is_a_permutation_into_fixed_shards(ray_session, tiny_sf):
    df = q.q_corpus_shuffle_shards(tiny_sf).to_pandas()
    n = len(df)
    assert n == 150
    # (shard_id, shard_pos) is exactly the sequence 0..n-1 in shard-major order
    flat = sorted(df["shard_id"] * SHARD_ROWS + df["shard_pos"])
    assert flat == list(range(n))
    # every shard except the last is full
    sizes = df.groupby("shard_id").size().sort_index()
    assert (sizes.iloc[:-1] == SHARD_ROWS).all()
    # the permutation actually shuffles (doc_id order != shard order)
    by_rank = df.sort_values(["shard_id", "shard_pos"])["doc_id"].tolist()
    assert by_rank != sorted(by_rank)


def test_assignment_deterministic_across_runs(ray_session, tiny_sf):
    a = q.q_corpus_shuffle_shards(tiny_sf).to_pandas().sort_values("doc_id")
    b = q.q_corpus_shuffle_shards(tiny_sf).to_pandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_export_resumes_without_duplicating_rows(ray_session, tiny_sf, tmp_path):
    """A re-run into a partially-written out_dir must rewrite ONLY the
    incomplete/missing shards — never append duplicate files into
    completed ones — and a re-run after success is a no-op."""
    import shutil

    out = str(tmp_path / "shards")
    first = q.export_shuffle_shards(tiny_sf, out)

    # simulate a crashed export: one shard gone, one shard truncated,
    # and one holding a FOOTERLESS file (killed mid-write) — the scan
    # must classify all three incomplete, never crash on the bad footer
    shutil.rmtree(os.path.join(out, "shard_id=1"))
    d2 = os.path.join(out, "shard_id=2")
    for f in os.listdir(d2):
        os.remove(os.path.join(d2, f))
    pq.write_table(
        pa.table({"doc_id": pa.array([0], pa.int64())}), os.path.join(d2, "partial.parquet")
    )
    d0 = os.path.join(out, "shard_id=0")
    with open(os.path.join(d0, "torn.parquet"), "wb") as fh:
        fh.write(b"PAR1\x00\x00garbage-no-footer")
    os.remove(os.path.join(out, "_manifest.json"))

    again = q.export_shuffle_shards(tiny_sf, out)
    assert again == first  # identical manifest, no doubled rows
    back = pq.ParquetDataset(out).read().to_pandas()
    assert sorted(back["doc_id"]) == list(range(150))

    # idempotent after success
    third = q.export_shuffle_shards(tiny_sf, out)
    assert third == first


def test_export_writes_partitioned_shards_with_manifest(ray_session, tiny_sf, tmp_path):
    out = str(tmp_path / "shards")
    manifest = q.export_shuffle_shards(tiny_sf, out)

    assert manifest["n_rows"] == 150
    assert manifest["shard_rows"] == SHARD_ROWS
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard_id="))
    assert len(dirs) == manifest["n_shards"] == (150 + SHARD_ROWS - 1) // SHARD_ROWS

    # manifest counts match the written files, full shards are full
    on_disk = json.load(open(os.path.join(out, "_manifest.json")))
    assert on_disk == manifest
    sizes = [manifest["shards"][str(i)] for i in range(manifest["n_shards"])]
    assert all(s == SHARD_ROWS for s in sizes[:-1])
    assert sum(sizes) == 150

    # reading everything back yields the exact corpus with the exact
    # assignment the query reports
    back = pq.ParquetDataset(out).read().to_pandas()
    assert sorted(back["doc_id"]) == list(range(150))
    want = q.q_corpus_shuffle_shards(tiny_sf).to_pandas()
    merged = back.merge(want, on="doc_id", suffixes=("_disk", "_q"))
    assert (merged["shard_pos_disk"] == merged["shard_pos_q"]).all()
