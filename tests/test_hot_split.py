"""Skew-aware hot-bucket splitting (north_rule: skew-aware
repartitioning of hot onion domains).

A web with only TWO content buckets makes every bucket "hot" (each
holds ~half the round), so with a small merge_rows_target (several
mergers per round) and a low hot_bucket_factor the engine must split
bucket sub-blocks across fetch workers — and still reproduce the
single-threaded oracle EXACTLY: splitting reroutes execution, never
ordering (fetch_order is assigned before routing; candidate dedup is
min-seq, arrival-order independent).
"""

import shutil

import pyarrow.parquet as pq
from tests.conftest import seen_set
import pytest

from freshonions_torscraper_ray.config import CrawlConfig
from freshonions_torscraper_ray.oracle import build_content, build_robots, crawl_oracle
from freshonions_torscraper_ray.synth import write_synth_web

N_DOMAINS = 40
SEED = 7
CFG = CrawlConfig(
    max_rounds=8,
    num_scheduler_shards=3,
    num_cuckoo_shards=4,
    merge_rows_target=8,
    hot_bucket_factor=0.25,
)


@pytest.fixture(scope="module")
def web_dir(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("skew_web")
    write_synth_web(str(d), seed=SEED, n_domains=N_DOMAINS, n_buckets=2)
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def oracle_result(web_dir):
    seeds = pq.read_table(f"{web_dir}/seeds.parquet")["url"].to_pylist()
    return crawl_oracle(seeds, build_content(SEED, N_DOMAINS), build_robots(SEED, N_DOMAINS), CFG)


@pytest.fixture(scope="module")
def engine(web_dir, tmp_path_factory, ray_session):
    from freshonions_torscraper_ray.pipelines.crawl import CrawlEngine

    store = tmp_path_factory.mktemp("skew_store")
    eng = CrawlEngine(web_dir, str(store), CFG)
    eng.run()
    yield eng
    eng.shutdown()


def test_splits_actually_happened(engine):
    assert engine.hot_splits_total > 0


# ----------------------- pure routing-plan properties (no Ray needed)

from hypothesis import given, settings
from hypothesis import strategies as st

from freshonions_torscraper_ray.stages.fetch import plan_fetch_routing

bucket_strategy = st.dictionaries(
    st.integers(min_value=0, max_value=63),
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=5000), st.integers()),
        min_size=1,
        max_size=8,
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(by_bucket=bucket_strategy, pool=st.integers(min_value=1, max_value=32), factor=st.sampled_from([0.0, 0.5, 1.0, 2.0]))
def test_plan_routes_every_payload_exactly_once(by_bucket, pool, factor):
    n = sum(nr for items in by_bucket.values() for nr, _ in items)
    submit, loads, n_splits = plan_fetch_routing(by_bucket, n, pool, factor)
    sent = sorted(p for _w, grp in submit for p in grp)
    expect = sorted(p for items in by_bucket.values() for _nr, p in items)
    assert sent == expect  # no payload lost or duplicated
    assert sum(loads) == n
    assert all(0 <= w < pool for w, _ in submit)


@settings(max_examples=100, deadline=None)
@given(by_bucket=bucket_strategy, pool=st.integers(min_value=1, max_value=32), factor=st.sampled_from([0.5, 1.0]))
def test_plan_is_deterministic(by_bucket, pool, factor):
    n = sum(nr for items in by_bucket.values() for nr, _ in items)
    a = plan_fetch_routing(by_bucket, n, pool, factor)
    b = plan_fetch_routing(dict(reversed(list(by_bucket.items()))), n, pool, factor)
    assert a == b  # independent of dict insertion order


@settings(max_examples=100, deadline=None)
@given(pool=st.integers(min_value=2, max_value=32), n_sub=st.integers(min_value=2, max_value=8))
def test_single_hot_bucket_is_split_across_workers(pool, n_sub):
    """The north-rule case: one bucket holds the whole round."""
    items = [(1000, i) for i in range(n_sub)]
    n = 1000 * n_sub
    submit, loads, n_splits = plan_fetch_routing({7: items}, n, pool, 1.0)
    assert n_splits == min(n_sub, pool) - 1
    assert len({w for w, _ in submit}) > 1  # work actually spread


def _slicer(p, off, nr):
    """The crawl's payload form: (ref, offset, n_rows) — pure arithmetic."""
    return (p[0], p[1] + off, nr)


def _coverage(submit):
    """ref -> sorted [(off, nr)] actually routed."""
    cov: dict = {}
    for _w, grp in submit:
        for ref, off, nr in grp:
            cov.setdefault(ref, []).append((off, nr))
    return {r: sorted(v) for r, v in cov.items()}


sliced_bucket_strategy = st.dictionaries(
    st.integers(min_value=0, max_value=63),
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=5000), st.integers(min_value=0, max_value=999)),
        min_size=1,
        max_size=4,
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=200, deadline=None)
@given(by_bucket=sliced_bucket_strategy, pool=st.integers(min_value=1, max_value=32), factor=st.sampled_from([0.0, 0.5, 1.0, 2.0]))
def test_sliced_plan_covers_every_row_exactly_once(by_bucket, pool, factor):
    """With a slicer, payloads may be cut — but the routed slices must
    tile each original payload's [off, off+nr) exactly, no overlap/gap."""
    payloads = {
        (b, i): (nr, ((b, i), 0, nr))
        for b, items in by_bucket.items()
        for i, (nr, _) in enumerate(items)
    }
    inp = {b: [payloads[(b, i)] for i in range(len(items))] for b, items in by_bucket.items()}
    n = sum(nr for nr, _ in payloads.values())
    submit, loads, _ = plan_fetch_routing(inp, n, pool, factor, slicer=_slicer)
    assert sum(loads) == n
    cov = _coverage(submit)
    for key, (nr, _) in payloads.items():
        runs = cov[key]
        pos = 0
        for off, ln in runs:
            assert off == pos and ln >= 1
            pos += ln
        assert pos == nr


@settings(max_examples=100, deadline=None)
@given(pool=st.integers(min_value=2, max_value=32))
def test_single_subblock_hot_bucket_splits_with_slicer(pool):
    """Tail-round case: ONE merger, one hot bucket = one sub-block.
    Without a slicer it cannot split; with one it must."""
    items = [(4000, ("r", 0, 4000))]
    no_slice = plan_fetch_routing({7: items}, 4000, pool, 1.0)
    assert no_slice[2] == 0  # opaque payloads: no split possible
    submit, loads, n_splits = plan_fetch_routing({7: items}, 4000, pool, 1.0, slicer=_slicer)
    assert n_splits > 0
    assert len({w for w, _ in submit}) > 1
    assert max(loads) <= -(-4000 // pool) + 1  # near-fair


import numpy as np

from freshonions_torscraper_ray.stages.fetch import plan_weighted_slices


@settings(max_examples=200, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=6),
    pool=st.integers(min_value=1, max_value=32),
    heavy=st.integers(min_value=1, max_value=5000),
)
def test_weighted_slices_cover_every_row_once(sizes, pool, heavy):
    """Two-phase tail-round plan: slices must tile every block exactly,
    regardless of weight skew (one pathological hub row included)."""
    rng = np.random.RandomState(7)
    blocks = []
    for bi, nr in enumerate(sizes):
        w = rng.randint(1, 30, size=nr).astype(np.int32)
        if nr:
            w[rng.randint(nr)] = heavy  # a hub page
        blocks.append((f"ref{bi}", w))
    plan = plan_weighted_slices(blocks, pool)
    cov: dict = {}
    for wkr, grp in plan:
        assert 0 <= wkr < pool
        for ref, off, nr in grp:
            cov.setdefault(ref, []).append((off, nr))
    for bi, nr in enumerate(sizes):
        runs = sorted(cov.get(f"ref{bi}", []))
        pos = 0
        for off, ln in runs:
            assert off == pos and ln >= 1
            pos += ln
        assert pos == nr


def test_weighted_slices_balance_cost_not_rows():
    """16 cheap-row blocks + one block whose tail rows are hub pages:
    LPT must spread the heavy rows across workers."""
    blocks = [("cheap", np.ones(1600, np.int32))]
    heavy = np.ones(100, np.int32)
    heavy[::10] = 2000  # 10 hub pages
    blocks.append(("hub", heavy))
    plan = plan_weighted_slices(blocks, 8)
    loads = {}
    for wkr, grp in plan:
        loads[wkr] = loads.get(wkr, 0) + sum(
            int(blocks[0][1][off:off + nr].sum()) if ref == "cheap" else int(blocks[1][1][off:off + nr].sum())
            for ref, off, nr in grp
        )
    total = 1600 + int(heavy.sum())
    # no worker carries more than ~2 hub pages' worth over fair share
    assert max(loads.values()) <= total / 8 + 2 * 2000


def test_weighted_slices_deterministic():
    w1 = np.arange(1, 300, dtype=np.int32)
    a = plan_weighted_slices([("x", w1), ("y", w1[::-1].copy())], 5)
    b = plan_weighted_slices([("x", w1), ("y", w1[::-1].copy())], 5)
    assert a == b


def test_crawl_order_exact_under_splitting(engine, oracle_result):
    assert engine.crawl_order() == oracle_result.crawl_order


def test_seen_set_exact_under_splitting(engine, oracle_result):
    assert seen_set(engine) == oracle_result.seen


def test_page_contents_exact_under_splitting(engine, oracle_result):
    t = engine.pages_table()
    mine = {r["url"]: (r["status"], r["clone_fp"], r["round"]) for r in t.to_pylist()}
    theirs = {p["url"]: (p["status"], p["clone_fp"], p["round"]) for p in oracle_result.pages}
    assert mine == theirs
