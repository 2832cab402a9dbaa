"""The engine's central determinism claim, tested directly: crawl
order, seen set, and page contents are identical at ANY parallelism
configuration — scheduler/cuckoo shard counts, merger granularity,
hot-bucket routing factor, checkpoint cadence. (Golden tests pin one
config to the oracle; this pins configs to EACH OTHER, so the claim
"shard count is pure execution config" is itself under test.)
"""

import shutil

from tests.conftest import seen_set
import pytest

from freshonions_torscraper_ray.config import CrawlConfig
from freshonions_torscraper_ray.synth import write_synth_web

N_DOMAINS = 45
SEED = 11

BASE = dict(max_rounds=7, recheck_dead=True, recheck_backoff=2, recheck_max_retries=1)

CONFIGS = [
    CrawlConfig(**BASE, num_scheduler_shards=1, num_cuckoo_shards=1, checkpoint_interval=1),
    CrawlConfig(**BASE, num_scheduler_shards=5, num_cuckoo_shards=3, checkpoint_interval=3,
                merge_rows_target=16, hot_bucket_factor=0.25),
    CrawlConfig(**BASE, num_scheduler_shards=2, num_cuckoo_shards=7, checkpoint_interval=2,
                merge_rows_target=4, hot_bucket_factor=0.0, frontier_head_max=4,
                frontier_fresh_max=8, frontier_refill_chunk=4),
]


@pytest.fixture(scope="module")
def web_dir(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("inv_web")
    write_synth_web(str(d), seed=SEED, n_domains=N_DOMAINS, n_buckets=3)
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


def _run(web_dir, tmp_path_factory, cfg):
    from freshonions_torscraper_ray.pipelines.crawl import CrawlEngine

    store = tmp_path_factory.mktemp("inv_store")
    eng = CrawlEngine(web_dir, str(store), cfg)
    eng.run()
    order = eng.crawl_order()
    seen = seen_set(eng)
    t = eng.pages_table()
    pages = sorted(
        zip(t["url"].to_pylist(), t["clone_fp"].to_pylist(), t["round"].to_pylist())
    )
    eng.shutdown()
    return order, seen, pages


def test_output_identical_across_parallelism_configs(web_dir, tmp_path_factory, ray_session):
    results = [_run(web_dir, tmp_path_factory, cfg) for cfg in CONFIGS]
    ref_order, ref_seen, ref_pages = results[0]
    assert len(ref_order) > 80 and ref_seen
    for order, seen, pages in results[1:]:
        assert order == ref_order
        assert seen == ref_seen
        assert pages == ref_pages


def test_output_identical_with_two_phase_forced_on_and_off(
    web_dir, tmp_path_factory, ray_session, monkeypatch
):
    """Two-phase tail rounds are pure execution config: forcing the
    owner-lookup + cost-balanced-extract path for EVERY round (min=0,
    max huge) vs disabling it entirely (max=0) must yield identical
    crawl order, seen set and page contents."""
    cfg = CONFIGS[1]
    monkeypatch.setenv("ONIONRAY_TWO_PHASE_MIN_ROWS", "0")
    monkeypatch.setenv("ONIONRAY_TWO_PHASE_ROWS", str(1 << 30))
    on = _run(web_dir, tmp_path_factory, cfg)
    monkeypatch.setenv("ONIONRAY_TWO_PHASE_ROWS", "0")
    off = _run(web_dir, tmp_path_factory, cfg)
    assert on == off
