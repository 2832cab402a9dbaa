"""Domain-liveness history + fresh-onions rollups (crawl_queries):
internal consistency against the flat per-domain stats and the raw
engine pages table. Exact value equality vs the reference semantics is
the conformance CLI's job (oracle SQL twins over the oracle fixture);
these tests pin the invariants that must hold regardless of fixture.
"""

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

from freshonions_torscraper_ray.pipelines.crawl_queries import (
    ensure_engine_fixture,
    q_crawl_domain_history,
    q_crawl_domain_stats,
    q_crawl_fresh_onions,
)


def _by_domain(tbl, key="domain"):
    return {r[key]: r for r in tbl.to_pylist()}


def _collect(ds):
    import pyarrow as pa

    return pa.Table.from_pylist(ds.take_all())


def test_history_matches_flat_stats(ray_session):
    hist = _by_domain(_collect(q_crawl_domain_history("unused")))
    stats = _by_domain(_collect(q_crawl_domain_stats("unused")))
    assert set(hist) == set(stats)
    for d, h in hist.items():
        s = stats[d]
        assert h["n_fetches"] == s["pages_crawled"]
        assert h["n_ok"] == s["pages_ok"]
        assert (h["n_alive_rounds"] > 0) == s["is_up"]
        if h["n_ok"] == 0:
            assert h["last_alive_round"] == -1
        else:
            assert h["last_alive_round"] >= h["first_round"]
            assert h["n_alive_rounds"] <= h["last_alive_round"] - h["first_round"] + 1


def test_history_against_raw_pages(ray_session):
    edir = ensure_engine_fixture()
    pages = pq.read_table(
        os.path.join(edir, "pages.parquet"), columns=["domain", "round", "status"]
    )
    hist = _by_domain(_collect(q_crawl_domain_history("unused")))
    # single-threaded recompute per domain
    want: dict[str, dict] = {}
    for r in pages.to_pylist():
        w = want.setdefault(
            r["domain"],
            {"first": 1 << 60, "last_alive": -1, "alive_rounds": set(), "n": 0, "ok": 0},
        )
        w["first"] = min(w["first"], r["round"])
        w["n"] += 1
        if r["status"] == 200:
            w["ok"] += 1
            w["last_alive"] = max(w["last_alive"], r["round"])
            w["alive_rounds"].add(r["round"])
    assert set(hist) == set(want)
    for d, w in want.items():
        h = hist[d]
        assert h["first_round"] == w["first"]
        assert h["last_alive_round"] == w["last_alive"]
        assert h["n_alive_rounds"] == len(w["alive_rounds"])
        assert h["n_fetches"] == w["n"]
        assert h["n_ok"] == w["ok"]


def test_fresh_onions_partitions_domains(ray_session):
    edir = ensure_engine_fixture()
    pages = pq.read_table(os.path.join(edir, "pages.parquet"), columns=["domain", "round"])
    fresh = _collect(q_crawl_fresh_onions("unused"))
    n_domains = pc.count_distinct(pages["domain"]).as_py()
    # every domain is discovered exactly once, in round >= 0
    assert pc.sum(fresh["n_new_domains"]).as_py() == n_domains
    assert pc.min(fresh["discovery_round"]).as_py() >= 0
    # first-round discoveries == seed domains actually fetched in the
    # earliest round present in the pages table
    r_min = pc.min(pages["round"]).as_py()
    assert pc.min(fresh["discovery_round"]).as_py() == r_min
    r0 = pages.filter(pc.equal(pages["round"], r_min))
    n_r0 = pc.count_distinct(r0["domain"]).as_py()
    got_r0 = fresh.filter(pc.equal(fresh["discovery_round"], r_min))["n_new_domains"]
    assert got_r0.to_pylist() == [n_r0]
