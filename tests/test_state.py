"""Cuckoo seen-shards, scheduler shards, robots parsing — unit level."""

import pyarrow as pa

from freshonions_torscraper_ray.config import CrawlConfig
from freshonions_torscraper_ray.functions.robots import allowed, parse_disallow_prefixes
from freshonions_torscraper_ray.state.cuckoo import CuckooFilter, SeenShardState
from freshonions_torscraper_ray.state.scheduler import SchedulerShardState


def test_cuckoo_no_false_negatives():
    f = CuckooFilter(capacity=1 << 12)
    hs = [hash(f"url{i}") & ((1 << 64) - 1) for i in range(2000)]
    from freshonions_torscraper_ray.functions.hashing import hash64

    hs = [hash64(f"url{i}") for i in range(2000)]
    for h in hs:
        f.insert_hash(h)
    assert all(f.contains_hash(h) for h in hs)


def test_cuckoo_roundtrip():
    f = CuckooFilter(capacity=1 << 10)
    from freshonions_torscraper_ray.functions.hashing import hash64

    for i in range(500):
        f.insert_hash(hash64(f"x{i}"))
    g = CuckooFilter.from_bytes(f.to_bytes())
    assert (g.table == f.table).all() and g.count == f.count


def test_seen_shard_exactness_and_checkpoint():
    s = SeenShardState(0, capacity=1 << 8)  # deliberately tiny filter → FPs likely
    urls = [f"http://{'a' * 16}.onion/p/{i}" for i in range(1000)]
    mask1 = s.add_if_new(urls)
    assert all(mask1)  # exactness: no new URL may be dropped, even with FPs
    mask2 = s.add_if_new(urls)
    assert not any(mask2)
    s2 = SeenShardState.from_state_bytes(s.state_bytes())
    assert len(s2) == 1000
    assert not any(s2.add_if_new(urls[:10]))
    assert s2.add_if_new(["http://new" + "b" * 9 + ".onion/"])[0]


def test_robots_parse_and_allow():
    body = "# c\nUser-agent: google\nDisallow: /g\nUser-agent: *\nDisallow: /p/1\nDisallow:\n"
    p = parse_disallow_prefixes(body)
    assert p == ["/p/1"]
    assert allowed("/", p) and allowed("/p/2", p)
    assert not allowed("/p/1", p) and not allowed("/p/10", p)  # prefix semantics


def mk_cfg(**kw):
    return CrawlConfig(**kw)


def test_scheduler_politeness_and_budget():
    cfg = mk_cfg(per_round_domain_cap=2, max_pages_per_domain=3, download_delay=1.0)
    s = SchedulerShardState(0, cfg, {})
    dom = "c" * 16 + ".onion"
    rows = [(f"http://{dom}/p/{i}", dom, 1, 1.0, 100 + i) for i in range(5)]
    s.add_urls(rows)
    sched1, banned1 = s.schedule()
    assert [t[0] for t in sched1] == [f"http://{dom}/p/0", f"http://{dom}/p/1"]
    assert [t[5] for t in sched1] == [0.0, 1.0]  # politeness spacing
    sched2, _ = s.schedule()
    assert len(sched2) == 1  # budget 3 caps round 2 at 1
    assert sched2[0][5] == 2.0  # vclock carried across rounds
    sched3, _ = s.schedule()
    assert sched3 == []  # budget exhausted; residue stays pending
    assert s.pending_count() == 2


def test_scheduler_priority_order_and_robots_ban():
    cfg = mk_cfg(per_round_domain_cap=10, max_pages_per_domain=10)
    dom = "d" * 16 + ".onion"
    s = SchedulerShardState(0, cfg, {dom: "User-agent: *\nDisallow: /p/2\n"})
    s.add_urls(
        [
            (f"http://{dom}/p/3", dom, 2, 2.0, 7),
            (f"http://{dom}/", dom, 0, 0.0, 9),
            (f"http://{dom}/p/2", dom, 1, 1.0, 5),
        ]
    )
    sched, banned = s.schedule()
    assert [t[0] for t in sched] == [f"http://{dom}/", f"http://{dom}/p/3"]
    assert [b[0] for b in banned] == [f"http://{dom}/p/2"]


def test_scheduler_checkpoint_roundtrip():
    cfg = mk_cfg()
    dom = "e" * 16 + ".onion"
    s = SchedulerShardState(1, cfg, {})
    s.add_urls([(f"http://{dom}/", dom, 0, 0.0, 1), (f"http://{dom}/p/1", dom, 1, 1.0, 2)])
    s.schedule()
    s2 = SchedulerShardState.from_state_bytes(s.state_bytes())
    assert s2.pending_count() == s.pending_count()
    assert s2.schedule() == s.schedule()

def test_scheduler_restore_fails_loudly_on_missing_spill_runs(tmp_path):
    """Checkpoints carry spill-run METADATA only; restoring after the
    spill dir is gone must fail at restore time with a clear error, not
    a bare FileNotFoundError later inside _refill (round-2 ADVICE)."""
    import shutil

    import pytest

    cfg = mk_cfg(frontier_head_max=4, frontier_fresh_max=4, frontier_refill_chunk=4)
    dom = "f" * 16 + ".onion"
    spill = tmp_path / "spill"
    spill.mkdir()
    s = SchedulerShardState(2, cfg, {}, str(spill))
    s.add_urls([(f"http://{dom}/p/{i}", dom, 1, 1.0, i) for i in range(40)])
    s.schedule()  # triggers merge+spill past the head bound
    blob = s.state_bytes()
    assert any(d.runs for d in s.domains.values()), "fixture must actually spill"
    # restore works while runs exist ...
    SchedulerShardState.from_state_bytes(blob)
    # ... and fails loudly once the spill dir is lost
    shutil.rmtree(spill)
    with pytest.raises(FileNotFoundError, match="spill run"):
        SchedulerShardState.from_state_bytes(blob)


def test_content_store_duplicate_doc_id_raises_clear_error(tmp_path):
    """A corrupted/re-written bucket with duplicate doc_id values must
    fail at parse time with the bucket named — not as an opaque pandas
    InvalidIndexError mid-crawl (round-3 ADVICE fix)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from freshonions_torscraper_ray.store import ContentStore

    docs_dir = str(tmp_path / "docs")
    bdir = os.path.join(docs_dir, "bucket=0")
    os.makedirs(bdir)
    t = pa.table({"doc_id": ["http://a/", "http://a/"], "payload": ["x", "y"]})
    pq.write_table(t, os.path.join(bdir, "part-0.parquet"))
    cs = ContentStore(docs_dir, n_buckets=1)
    with pytest.raises(ValueError, match="bucket 0.*duplicate"):
        cs._load(0)
