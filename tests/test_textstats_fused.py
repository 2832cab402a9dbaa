"""Fused enrich kernel vs the standalone stages, and the persisted
text index vs corpus-scan scoring.

The fused DuckDB kernel (one token scan → quality + langid + simhash)
must be bit-identical to the three independent paths it replaced —
quality_scores keeps a value-hash-matched driver-gate row, so any
divergence here is a correctness bug, not a perf nit.
"""

import math
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from freshonions_torscraper_ray.functions.regexes import WORD_PATTERN
from freshonions_torscraper_ray.stages.dedup import simhash64, simhash_batch
from freshonions_torscraper_ray.stages.textstats import (
    STOPWORDS,
    LangId,
    enrich_fused,
    quality_scores,
)

TEXTS = [
    "The a the band a-a breathe THE",  # stopword case-sensitivity + \b bounds
    "",  # empty doc
    "a",  # single stopword token
    "the the",  # all stopwords
    "que los que cio entre las",  # es trigrams
    "der die und ein sch more words here",  # de trigrams
    "punctuation!!! only??? ...",
    "x" * 500,  # one long token
    "mixed CASE Tokens with_underscores and digits 123 456",
]


def _batch(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_fused_matches_standalone_stages():
    b = _batch(TEXTS)
    ref = LangId()(quality_scores(b, "text"))
    fused, sims = enrich_fused(b, "text")
    for col in ("n_tokens", "stop_ratio", "mean_token_len", "pred_lang"):
        assert ref[col].to_pylist() == fused[col].to_pylist(), col
    assert np.array_equal(sims, simhash_batch(b["text"]))


def test_fused_counts_match_python_findall():
    """The RE2 count formulations == the per-row findall definitions."""
    fused, _ = enrich_fused(_batch(TEXTS), "text")
    for i, t in enumerate(TEXTS):
        toks = re.findall(WORD_PATTERN, t)
        assert fused["n_tokens"][i].as_py() == len(toks)
        n_stop = sum(1 for x in toks if x in STOPWORDS)
        n_chars = sum(len(x) for x in toks)
        denom = max(len(toks), 1)
        assert fused["stop_ratio"][i].as_py() == pytest.approx(
            round(n_stop / denom, 4) if toks else 0.0
        )
        assert fused["mean_token_len"][i].as_py() == pytest.approx(
            round(n_chars / denom, 4) if toks else 0.0
        )


def test_simhash_scalar_twin_and_empty():
    sh = simhash_batch(TEXTS)
    for i, t in enumerate(TEXTS):
        assert int(sh[i]) == simhash64(t)
    assert simhash64("") == 0
    assert simhash64("!!! ...") == 0  # tokenless


def _write_docs(tmp_path, texts):
    p = str(tmp_path / "documents.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}), p
    )
    return p


CORPUS = [
    "spark data spark engine",
    "data pipeline data data",
    "spark",
    "nothing relevant here",
    "spark spark spark spark data",
    "",
]


def test_text_index_term_tf_matches_scan(tmp_path, ray_session):
    from freshonions_torscraper_ray.stages import text_index as ti

    p = _write_docs(tmp_path, CORPUS)
    idx = ti.build_or_load_text_index(p, num_parts=8)
    got = ti.term_tf_topk(idx, "spark", k=10).to_pandas()
    expect = sorted(
        (
            (i, len([x for x in re.findall(WORD_PATTERN, t.lower()) if x == "spark"]))
            for i, t in enumerate(CORPUS)
        ),
        key=lambda r: (-r[1], r[0]),
    )
    expect = [(i, n) for i, n in expect if n > 0][:10]
    assert list(zip(got["doc_id"], got["score"])) == expect
    # missing term → empty result, not an error
    assert ti.term_tf_topk(idx, "zzzzmissing", k=5).count() == 0


def test_text_index_bm25_matches_formula(tmp_path, ray_session):
    from freshonions_torscraper_ray.functions.rounding import round_half_away
    from freshonions_torscraper_ray.stages import text_index as ti

    terms, k1, b = ["spark", "data"], 1.2, 0.75
    p = _write_docs(tmp_path, CORPUS)
    idx = ti.build_or_load_text_index(p, num_parts=8)
    got = ti.bm25_index_topk(idx, terms, k=10, k1=k1, b=b).to_pandas()

    toks = [re.findall(WORD_PATTERN, t.lower()) for t in CORPUS]
    n = len(CORPUS)
    avgdl = sum(len(ts) for ts in toks) / n
    scores = {}
    for term in terms:
        df = sum(1 for ts in toks if term in ts)
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, ts in enumerate(toks):
            tf = ts.count(term)
            if tf:
                scores[i] = scores.get(i, 0.0) + idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * len(ts) / avgdl)
                )
    expect = sorted(
        ((i, float(round_half_away(np.array([s]), 4)[0])) for i, s in scores.items()),
        key=lambda r: (-r[1], r[0]),
    )[:10]
    assert list(zip(got["doc_id"], got["score"])) == expect


def test_text_index_is_partition_pruned(tmp_path, ray_session):
    """A single-term query must read only that term's part= directory."""
    import glob

    from freshonions_torscraper_ray.functions.hashing import hash64
    from freshonions_torscraper_ray.stages import text_index as ti

    p = _write_docs(tmp_path, CORPUS)
    idx = ti.build_or_load_text_index(p, num_parts=8)
    parts = glob.glob(f"{idx}/postings/part=*")
    assert len(parts) > 1, "fixture must span multiple partitions"
    pruned, stats = ti._pruned_postings(idx, ["spark"])
    want = hash64("spark") & (stats["num_parts"] - 1)
    # the partition invariant that makes path-level pruning sound: the
    # term's postings live ONLY in its hash partition...
    for d in parts:
        terms_here = set()
        for f in glob.glob(f"{d}/*.parquet"):
            terms_here |= set(pq.read_table(f, columns=["term"])["term"].to_pylist())
        if d.endswith(f"part={want}"):
            assert "spark" in terms_here
        else:
            assert "spark" not in terms_here
    # ...and the pruned read returns exactly that partition's spark rows
    in_part = sum(
        pq.read_table(f, columns=["term"])["term"].to_pylist().count("spark")
        for f in glob.glob(f"{idx}/postings/part={want}/*.parquet")
    )
    rows = pruned.to_pandas()
    assert (rows["term"] == "spark").all()
    assert len(rows) == in_part > 0


def test_chunk_documents_matches_scalar_reference():
    """Vectorized gather-based chunking vs the per-row scalar window:
    exact boundaries, short tails, single-chunk, empty docs, and
    zero-copy table slices."""
    import pyarrow as pa

    from freshonions_torscraper_ray.stages.textstats import chunk_documents

    docs = ["a" * 500, "b" * 200, "short", "", "x" * 201, "y" * 350]
    t = pa.table({"doc_id": list(range(len(docs))), "text": docs})

    def ref(did, s, size=200, stride=150):
        if not s:
            return []
        n = 1 + max(0, -(-(len(s) - size) // stride))
        return [
            {"doc_id": did, "chunk_id": c, "chunk": s[c * stride : c * stride + size]}
            for c in range(n)
        ]

    want = [r for did, s in enumerate(docs) for r in ref(did, s)]
    assert chunk_documents(t, size=200, stride=150).to_pylist() == want
    # overlap property: consecutive chunks share size-stride chars
    rows = [r for r in want if r["doc_id"] == 0]
    assert rows[0]["chunk"][150:] == rows[1]["chunk"][:50]
    # zero-copy slice equals rebuilt table
    assert (
        chunk_documents(t.slice(2, 3)).to_pylist()
        == chunk_documents(pa.table({"doc_id": [2, 3, 4], "text": docs[2:5]})).to_pylist()
    )
