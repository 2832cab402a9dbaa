"""Crawl-fed incremental search index: postings segments + compaction.

The end-to-end path (fetch workers emit per-round segments → compaction
→ partition-pruned query) is driver-gated by the ``crawl_search_rank`` /
``crawl_search_bm25`` SQL twins; these tests pin the segment builder's
vectorized tf/dl math against a direct Python count.
"""

import re

import numpy as np
import pyarrow as pa

from freshonions_torscraper_ray.functions.regexes import WORD_PATTERN
from freshonions_torscraper_ray.functions.tokenize import term_hash64, token_stats
from freshonions_torscraper_ray.stages.text_index import crawl_postings_table

WORD_RE = re.compile(WORD_PATTERN)


def _pages(rows):
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "status": pa.array([r[1] for r in rows], pa.int32()),
            "text": pa.array([r[2] for r in rows], pa.large_string()),
        }
    )


def test_postings_tf_dl_match_python_counts():
    rows = [
        ("http://a/", 200, "market wallet market the"),
        ("http://b/", 404, "market market market"),  # not indexed
        ("http://c/", 200, ""),  # zero tokens → no postings rows
        ("http://d/", 200, "Wallet WALLET wallet zz"),  # case-folded tf
    ]
    t = crawl_postings_table(_pages(rows), num_parts=8)
    got = {}
    for th, url, tf, dl in zip(
        t["term_hash"].to_pylist(), t["url"].to_pylist(), t["tf"].to_pylist(), t["dl"].to_pylist()
    ):
        got[(url, th)] = (tf, dl)
    for url, status, text in rows:
        toks = [w.lower() for w in WORD_RE.findall(text)]
        for w in set(toks):
            key = (url, np.uint64(term_hash64(w)).astype(np.int64).item())
            if status != 200:
                assert key not in got
            else:
                assert got[key] == (toks.count(w), len(toks)), (url, w)
    # no postings for non-200 or zero-token docs
    assert set(t["url"].to_pylist()) == {"http://a/", "http://d/"}
    # part column is term_hash & (num_parts-1)
    th = np.array(t["term_hash"].to_pylist(), dtype=np.int64).view(np.uint64)
    assert np.array_equal(np.array(t["part"].to_pylist()), (th & np.uint64(7)).astype(np.int32))


def test_postings_chunk_boundary_independence():
    """Segments are per-block; tf must not depend on block slicing."""
    rows = [(f"http://u{i}/", 200, "market " * (i % 5) + "wallet") for i in range(20)]
    whole = crawl_postings_table(_pages(rows), num_parts=8)
    parts = [
        crawl_postings_table(_pages(rows[:7]), num_parts=8),
        crawl_postings_table(_pages(rows[7:]), num_parts=8),
    ]
    merged = pa.concat_tables(parts)
    key = lambda t: sorted(  # noqa: E731
        zip(t["url"].to_pylist(), t["term_hash"].to_pylist(), t["tf"].to_pylist(), t["dl"].to_pylist())
    )
    assert key(whole) == key(merged)


def test_term_hash64_contract():
    import pytest

    assert term_hash64("Market") == term_hash64("market") != 0
    h = token_stats(pa.array(["some market here"], pa.large_string())).hashes
    assert term_hash64("market") == int(h[1])
    for bad in ("two words", "", "dash-ed", "héllo"):
        with pytest.raises(ValueError):
            term_hash64(bad)


def test_compaction_dedups_refetched_200_urls(ray_session, tmp_path):
    """A URL that re-fetches 200 in a later round (changed page) must
    contribute postings from its LATEST round only — df/tf counted once,
    n_docs over distinct 200-urls (round-3 ADVICE fix)."""
    from freshonions_torscraper_ray.store import RoundStore
    from freshonions_torscraper_ray.stages.text_index import compact_crawl_index

    import json
    import os

    import pyarrow.parquet as pq

    store = RoundStore(str(tmp_path / "store"))
    r0 = [
        ("http://a/", 200, "market wallet market"),
        ("http://b/", 200, "wallet wallet zz"),
    ]
    r1 = [
        ("http://a/", 200, "market fresh fresh fresh"),  # re-fetched, new text
        ("http://c/", 200, "zz zz wallet"),
    ]
    for rnd, rows in ((0, r0), (1, r1)):
        pages = _pages(rows)
        store.commit_round(rnd, {"pages": pages, "postings": crawl_postings_table(pages, num_parts=8)})

    idx = compact_crawl_index(store, num_parts=8)
    assert idx is not None
    seg = pq.read_table(os.path.join(idx, "postings"))
    rows_a = {
        (th, tf, dl)
        for th, u, tf, dl in zip(
            seg["term_hash"].to_pylist(), seg["url"].to_pylist(),
            seg["tf"].to_pylist(), seg["dl"].to_pylist(),
        )
        if u == "http://a/"
    }
    # only round-1 terms for the re-fetched url, each exactly once
    expect = crawl_postings_table(_pages([r1[0]]), num_parts=8)
    want = {
        (th, tf, dl)
        for th, tf, dl in zip(
            expect["term_hash"].to_pylist(), expect["tf"].to_pylist(), expect["dl"].to_pylist()
        )
    }
    assert rows_a == want
    # every (term_hash, url) pair unique across the whole index
    pairs = list(zip(seg["term_hash"].to_pylist(), seg["url"].to_pylist()))
    assert len(pairs) == len(set(pairs))
    with open(os.path.join(idx, "stats.json")) as f:
        stats = json.load(f)
    assert stats["n_docs"] == 3  # a, b, c — a counted once
    # avgdl over distinct urls with the latest dl for a: (4 + 3 + 3) / 3
    assert abs(stats["avgdl"] - (4 + 3 + 3) / 3) < 1e-9
