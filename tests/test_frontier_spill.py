"""Spill-to-store frontier (north_rule 10^10-URL scale path): with the
per-domain in-memory bounds squeezed tiny, pending tails spill to disk
runs — the crawl must stay GOLDEN-EXACT vs the oracle (spill bounds never
affect ordering), spill files must actually appear, and kill/resume must
restore run offsets correctly."""

import glob
import shutil

import pyarrow.parquet as pq
from tests.conftest import seen_set
import pytest

from freshonions_torscraper_ray.config import CrawlConfig
from freshonions_torscraper_ray.oracle import build_content, build_robots, crawl_oracle
from freshonions_torscraper_ray.synth import write_synth_web

N_DOMAINS = 60
SEED = 7
# head 2 / fresh 2 / chunk 2 with a 1-page/round politeness cap: hub
# domains discover faster than they fetch, so pending tails spill
CFG = CrawlConfig(
    max_rounds=20,
    num_scheduler_shards=3,
    num_cuckoo_shards=2,
    per_round_domain_cap=1,
    max_pages_per_domain=40,
    frontier_head_max=2,
    frontier_fresh_max=2,
    frontier_refill_chunk=2,
)


@pytest.fixture(scope="module")
def web_dir(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("spillweb")
    write_synth_web(str(d), seed=SEED, n_domains=N_DOMAINS, n_buckets=4)
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def oracle_result(web_dir):
    seeds = pq.read_table(f"{web_dir}/seeds.parquet")["url"].to_pylist()
    return crawl_oracle(seeds, build_content(SEED, N_DOMAINS), build_robots(SEED, N_DOMAINS), CFG)


def test_spill_crawl_matches_oracle(web_dir, tmp_path_factory, oracle_result, ray_session):
    from freshonions_torscraper_ray.pipelines.crawl import CrawlEngine

    store = tmp_path_factory.mktemp("spillstore")
    eng = CrawlEngine(web_dir, str(store), CFG)
    eng.run()
    try:
        import ray as _ray

        stats = _ray.get([h.spill_stats.remote() for h in eng.sched_handles])
        created = sum(c for c, _ in stats)
        gced = sum(g for _, g in stats)
        assert created > 0, "tiny frontier bounds must force disk spill runs"
        # checkpoint-boundary GC reclaims exhausted run files: every
        # created file is either still on disk or was collected
        spill_files = glob.glob(f"{store}/frontier_spill/*/*.run")
        assert len(spill_files) == created - gced
        assert gced > 0, "exhausted spill runs must be garbage-collected"
        assert eng.crawl_order() == oracle_result.crawl_order
        assert seen_set(eng) == oracle_result.seen
        import ray

        residue = {
            (r[0], r[1], r[2])
            for h in eng.sched_handles
            for r in ray.get(h.frontier_rows.remote())
        }
        assert residue == set(oracle_result.frontier_residue)
    finally:
        eng.shutdown()


def test_spill_resume_equals_uninterrupted(web_dir, tmp_path_factory, oracle_result, ray_session):
    """Kill after round 3 (delta ckpts + spilled runs on disk), resume,
    final state identical — run offsets and spill metadata survive."""
    from freshonions_torscraper_ray.pipelines.crawl import CrawlEngine

    cfg = CFG
    store = tmp_path_factory.mktemp("spillstore_resume")
    eng1 = CrawlEngine(web_dir, str(store), cfg)
    eng1.start_fresh()
    for _ in range(3):
        eng1.run_round()
    eng1.shutdown()
    eng2 = CrawlEngine(web_dir, str(store), cfg)
    assert eng2.resume()
    while eng2.round < cfg.max_rounds:
        if eng2.run_round() is None:
            break
    try:
        assert eng2.crawl_order() == oracle_result.crawl_order
        assert seen_set(eng2) == oracle_result.seen
    finally:
        eng2.shutdown()
