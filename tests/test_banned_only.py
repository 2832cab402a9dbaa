"""Regression: a round that schedules nothing but bans URLs must still
persist the bans (they are part of the URL-seen set), and the engine must
match the oracle when the ONLY seed is a robots-disallow-all domain."""

import pyarrow as pa
import pyarrow.parquet as pq
from tests.conftest import seen_set
import pytest

from freshonions_torscraper_ray.config import CrawlConfig
from freshonions_torscraper_ray.oracle import build_content, build_robots, crawl_oracle
from freshonions_torscraper_ray.synth import domain_profile, write_synth_web

N_DOMAINS = 40
SEED = 42
CFG = CrawlConfig(max_rounds=4, num_scheduler_shards=2, num_cuckoo_shards=2)


@pytest.mark.usefixtures("ray_session")
def test_banned_only_round_persists_seen(tmp_path):
    web = tmp_path / "web"
    write_synth_web(str(web), seed=SEED, n_domains=N_DOMAINS, n_buckets=4)
    blocked = [
        p["domain"]
        for i in range(N_DOMAINS)
        if "Disallow: /\n" in (p := domain_profile(SEED, i, N_DOMAINS))["robots"]
    ]
    assert blocked, "synth web should contain a disallow-all domain"
    seed_url = f"http://{blocked[0]}/"
    pq.write_table(
        pa.Table.from_arrays(
            [pa.array([seed_url], pa.string()), pa.array([0], pa.timestamp("us"))],
            names=["url", "added_at"],
        ),
        str(web / "seeds.parquet"),
    )

    from freshonions_torscraper_ray.pipelines.crawl import CrawlEngine

    eng = CrawlEngine(str(web), str(tmp_path / "store"), CFG)
    stats = eng.run()
    oracle = crawl_oracle([seed_url], build_content(SEED, N_DOMAINS), build_robots(SEED, N_DOMAINS), CFG)
    try:
        assert stats["fetched_total"] == 0
        assert eng.crawl_order() == oracle.crawl_order == []
        assert oracle.seen == {seed_url}
        assert seen_set(eng) == oracle.seen  # the banned seed is still "seen"
        banned = eng.store.read_all_rounds("banned")
        assert banned is not None and banned["url"].to_pylist() == [seed_url]
    finally:
        eng.shutdown()
