"""Incremental (delta) seen-set checkpoints: resume from a delta chain
must reproduce the uninterrupted run exactly, and deltas must be small
relative to fulls."""

import pyarrow.parquet as pq
from tests.conftest import seen_set
import pytest

from freshonions_torscraper_ray.config import CrawlConfig
from freshonions_torscraper_ray.state.cuckoo import SeenShardState
from freshonions_torscraper_ray.synth import write_synth_web

N_DOMAINS = 50
SEED = 42
# fulls at rounds 1 and 6, deltas at 2,3,4,5,7,8,... (interval=1, full_every=6)
CFG = CrawlConfig(
    max_rounds=10,
    num_scheduler_shards=3,
    num_cuckoo_shards=3,
    checkpoint_interval=1,
    checkpoint_full_every=6,
)


def test_delta_roundtrip_unit():
    s = SeenShardState(0)
    s.add_if_new([f"http://{'a' * 16}.onion/p/{i}" for i in range(50)])
    full = s.state_bytes()
    s.add_if_new([f"http://{'b' * 16}.onion/p/{i}" for i in range(30)])
    d1 = s.delta_bytes()
    s.add_if_new([f"http://{'c' * 16}.onion/p/{i}" for i in range(20)])
    d2 = s.delta_bytes()
    r = SeenShardState.from_state_bytes(full, deltas=[d1, d2])
    assert len(r) == 100
    assert not any(r.add_if_new([f"http://{'c' * 16}.onion/p/5"]))
    assert len(d1) < len(s.state_bytes())  # delta strictly smaller than full


@pytest.mark.usefixtures("ray_session")
def test_resume_from_delta_chain(tmp_path):
    from freshonions_torscraper_ray.pipelines.crawl import CrawlEngine

    web = tmp_path / "web"
    write_synth_web(str(web), seed=SEED, n_domains=N_DOMAINS, n_buckets=4)

    ref = CrawlEngine(str(web), str(tmp_path / "store_ref"), CFG)
    ref.run()

    eng1 = CrawlEngine(str(web), str(tmp_path / "store"), CFG)
    eng1.start_fresh()
    for _ in range(4):  # stop at round 4 — a DELTA checkpoint (full was 1)
        eng1.run_round()
    kinds = [eng1.store.read_manifest(r)["meta"]["ckpt_kind"] for r in range(1, 5)]
    assert kinds == ["full", "delta", "delta", "delta"]
    eng1.shutdown()

    eng2 = CrawlEngine(str(web), str(tmp_path / "store"), CFG)
    assert eng2.resume()
    while eng2.round < CFG.max_rounds:
        if eng2.run_round() is None:
            break
    try:
        assert eng2.crawl_order() == ref.crawl_order()
        assert seen_set(eng2) == seen_set(ref)
    finally:
        eng2.shutdown()
        ref.shutdown()
