"""Golden crawl-replay test (SURVEY §5.3): the distributed engine must
reproduce the single-threaded semantic oracle EXACTLY — crawl order,
final URL-seen set, and per-page content (clone_fp = span-sequence hash),
under the same seed list + politeness budget (BASELINE.json north_rule).
"""

import shutil

import pyarrow.parquet as pq
from tests.conftest import seen_set
import pytest

from freshonions_torscraper_ray.config import CrawlConfig
from freshonions_torscraper_ray.oracle import build_content, build_robots, crawl_oracle
from freshonions_torscraper_ray.synth import write_synth_web

N_DOMAINS = 50
SEED = 42
CFG = CrawlConfig(max_rounds=12, num_scheduler_shards=3, num_cuckoo_shards=4)


@pytest.fixture(scope="module")
def web_dir(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("web")
    write_synth_web(str(d), seed=SEED, n_domains=N_DOMAINS, n_buckets=4)
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def oracle_result(web_dir):
    seeds = pq.read_table(f"{web_dir}/seeds.parquet")["url"].to_pylist()
    content = build_content(SEED, N_DOMAINS)
    robots = build_robots(SEED, N_DOMAINS)
    return crawl_oracle(seeds, content, robots, CFG)


@pytest.fixture(scope="module")
def engine(web_dir, tmp_path_factory, ray_session):
    from freshonions_torscraper_ray.pipelines.crawl import CrawlEngine

    store = tmp_path_factory.mktemp("store")
    eng = CrawlEngine(web_dir, str(store), CFG)
    eng.run()
    yield eng
    eng.shutdown()


def test_oracle_is_nontrivial(oracle_result):
    assert len(oracle_result.crawl_order) > 100
    assert oracle_result.rounds > 2
    assert len(oracle_result.seen) > len(oracle_result.crawl_order)
    assert oracle_result.banned  # robots bans occurred
    assert oracle_result.emails and oracle_result.btc


def test_crawl_order_matches_oracle(engine, oracle_result):
    assert engine.crawl_order() == oracle_result.crawl_order


def test_seen_set_matches_oracle(engine, oracle_result):
    assert seen_set(engine) == oracle_result.seen


def test_page_contents_match_oracle(engine, oracle_result):
    """Per-row span-sequence equality via clone_fp + status/title/text."""
    t = engine.pages_table()
    mine = {
        r["url"]: (r["status"], r["clone_fp"], r["title"], r["text"], r["round"], r["vtime"])
        for r in t.to_pylist()
    }
    theirs = {
        p["url"]: (p["status"], p["clone_fp"], p["title"], p["text"], p["round"], p["vtime"])
        for p in oracle_result.pages
    }
    assert mine == theirs


def test_side_tables_match_oracle(engine, oracle_result):
    links = engine.store.read_all_rounds("links")
    mine = set(map(tuple, zip(*[links[c].to_pylist() for c in links.column_names])))
    assert mine == set(oracle_result.links)
    emails = engine.store.read_all_rounds("emails")
    mine_e = set(map(tuple, zip(*[emails[c].to_pylist() for c in emails.column_names])))
    assert mine_e == set(oracle_result.emails)


def test_per_partition_metrics_cover_all_fetches(engine):
    """north_rule: per-partition lineage+metrics — partition rows must
    account for every fetched URL of their round's summary row."""
    m = engine.store.read_all_rounds("metrics")
    assert m is not None
    rows = m.to_pylist()
    summaries = {r["round"]: r for r in rows if r["partition"] == -1}
    assert summaries
    by_round: dict[int, int] = {}
    for r in rows:
        if r["partition"] >= 0:
            by_round[r["round"]] = by_round.get(r["round"], 0) + r["urls_fetched"]
            assert f"partition={r['partition']}" in r["lineage"]
    for rnd, s in summaries.items():
        if s["urls_fetched"]:
            assert by_round.get(rnd, 0) == s["urls_fetched"]


def test_budget_never_exceeded(engine):
    import collections

    t = engine.pages_table()
    counts = collections.Counter(t["domain"].to_pylist())
    assert max(counts.values()) <= CFG.max_pages_per_domain


def test_pack_seq_overflow_fails_loudly():
    """Past the int64 packing envelope, pack_seq must raise — a silent
    clamp would make first-discovery dedup arrival-order-dependent."""
    cfg = CrawlConfig()
    assert cfg.pack_seq(3, 7, 11) == (3 << 44) | (7 << 16) | 11
    for bad in [( 1 << 19, 0, 0), (0, 1 << 28, 0), (0, 0, 1 << 16)]:
        with pytest.raises(OverflowError):
            cfg.pack_seq(*bad)


def test_start_fresh_fences_stale_rounds(web_dir, tmp_path_factory, ray_session):
    """A fresh run into a store holding a longer prior run must not mix
    in the prior run's later rounds (round-1 ADVICE fix)."""
    from freshonions_torscraper_ray.pipelines.crawl import CrawlEngine

    store = tmp_path_factory.mktemp("store_fence")
    eng1 = CrawlEngine(web_dir, str(store), CFG)
    eng1.start_fresh()
    for _ in range(4):
        eng1.run_round()
    eng1.shutdown()
    assert eng1.store.latest_round() >= 4
    eng2 = CrawlEngine(web_dir, str(store), CFG)
    eng2.start_fresh()
    eng2.run_round()
    try:
        assert eng2.store.latest_round() == 1  # stale rounds 2..4 fenced
        t = eng2.pages_table()
        assert set(t["round"].to_pylist()) == {1}
    finally:
        eng2.shutdown()


def test_resume_config_mismatch_fails_loudly(web_dir, tmp_path_factory, ray_session):
    """Resuming under a different CrawlConfig must raise, not silently
    half-apply the new config (round-1 ADVICE fix)."""
    import dataclasses

    from freshonions_torscraper_ray.pipelines.crawl import CrawlEngine

    store = tmp_path_factory.mktemp("store_cfgmismatch")
    eng1 = CrawlEngine(web_dir, str(store), CFG)
    eng1.start_fresh()
    eng1.run_round()
    eng1.shutdown()
    other = dataclasses.replace(CFG, max_pages_per_domain=CFG.max_pages_per_domain + 1)
    eng2 = CrawlEngine(web_dir, str(store), other)
    with pytest.raises(ValueError, match="config mismatch"):
        eng2.resume()
    # the original config still resumes fine
    eng3 = CrawlEngine(web_dir, str(store), CFG)
    assert eng3.resume()
    eng3.shutdown()


def test_resume_equals_uninterrupted(web_dir, tmp_path_factory, engine, ray_session):
    """Kill after round 2, resume, final state identical (determinism)."""
    from freshonions_torscraper_ray.pipelines.crawl import CrawlEngine

    store = tmp_path_factory.mktemp("store_resume")
    eng1 = CrawlEngine(web_dir, str(store), CFG)
    eng1.start_fresh()
    eng1.run_round()
    eng1.run_round()
    # "crash": kill the engine's actors, build a new one, resume from checkpoint
    eng1.shutdown()
    eng2 = CrawlEngine(web_dir, str(store), CFG)
    assert eng2.resume()
    while eng2.round < CFG.max_rounds:
        if eng2.run_round() is None:
            break
    try:
        assert eng2.crawl_order() == engine.crawl_order()
        assert seen_set(eng2) == seen_set(engine)
    finally:
        eng2.shutdown()
