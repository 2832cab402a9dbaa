"""Alive/dead re-check scheduling (O32): engine==oracle under backoff
re-checks, and dead frontpages are retried exactly the configured number
of times with depressed priority."""

import collections

import pyarrow.parquet as pq
from tests.conftest import seen_set
import pytest

from freshonions_torscraper_ray.config import CrawlConfig
from freshonions_torscraper_ray.oracle import build_content, build_robots, crawl_oracle
from freshonions_torscraper_ray.synth import write_synth_web

N_DOMAINS = 40
SEED = 42
CFG = CrawlConfig(
    max_rounds=14,
    num_scheduler_shards=3,
    num_cuckoo_shards=3,
    recheck_dead=True,
    recheck_backoff=2,
    recheck_max_retries=2,
)


@pytest.fixture(scope="module")
def web_dir(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("web_rc")
    write_synth_web(str(d), seed=SEED, n_domains=N_DOMAINS, n_buckets=4)
    return str(d)


@pytest.fixture(scope="module")
def oracle_result(web_dir):
    seeds = pq.read_table(f"{web_dir}/seeds.parquet")["url"].to_pylist()
    return crawl_oracle(seeds, build_content(SEED, N_DOMAINS), build_robots(SEED, N_DOMAINS), CFG)


@pytest.fixture(scope="module")
def engine(web_dir, tmp_path_factory, ray_session):
    from freshonions_torscraper_ray.pipelines.crawl import CrawlEngine

    eng = CrawlEngine(web_dir, str(tmp_path_factory.mktemp("store_rc")), CFG)
    eng.run()
    yield eng
    eng.shutdown()


def test_rechecks_happen(oracle_result):
    counts = collections.Counter(oracle_result.crawl_order)
    retried = {u: c for u, c in counts.items() if c > 1}
    assert retried, "expected dead frontpages to be re-fetched"
    assert all(c == 1 + CFG.recheck_max_retries for c in retried.values())
    assert all(u.endswith(".onion/") for u in retried)


def test_recheck_crawl_order_matches_oracle(engine, oracle_result):
    assert engine.crawl_order() == oracle_result.crawl_order


def test_recheck_seen_set_matches_oracle(engine, oracle_result):
    assert seen_set(engine) == oracle_result.seen


def test_recheck_pages_match(engine, oracle_result):
    t = engine.pages_table()
    mine = {
        (r["url"], r["round"]): (r["status"], r["vtime"], r["fetch_order"])
        for r in t.to_pylist()
    }
    theirs = {
        (p["url"], p["round"]): (p["status"], p["vtime"], p["fetch_order"])
        for p in oracle_result.pages
    }
    assert mine == theirs
