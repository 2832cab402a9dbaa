"""Round-5 VERDICT #2: the LM-model broadcast gate and its
over-threshold distributed (bigram-keyed hash-join) path.

The broadcast path (ray.put model tables + per-batch DuckDB kernel) and
the distributed path (counts stay a Dataset; two left-outer hash joins +
one integer per-doc groupby-sum) must produce BIT-IDENTICAL values —
both route every ln/exp/round through the same DuckDB expression text.
The gate is forced with GRAFT_LM_BROADCAST_MAX_KEYS=0.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from freshonions_torscraper_ray.pipelines import queries as q
from freshonions_torscraper_ray.stages import corpus as cp

TEXTS = [
    "the cat sat on the mat",
    "the cat ate the fish",
    "dogs chase the cat around the yard",
    "lorem ipsum dolor sit amet",
    "the the the the",          # degenerate repeats
    "single",                   # one token: zero bigrams
    "",                         # empty doc
    "numbers 123 and words_mix under_scores",
    "cat cat dog dog fish fish bird bird",
    "a b c d e f g h i j k l m",
    # push "the cat" to count >= PMI_MIN_COUNT (5) so pmi_top is non-empty
    "the cat naps",
    "the cat runs",
    "the cat hides while the cat waits",
]


@pytest.fixture()
def tiny_sf(tmp_path):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
            "lang": pa.array(["en"] * len(TEXTS), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _norm(res):
    df = res.to_pandas()  # Dataset and pa.Table both; test-scale only
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _both_paths(fn, sf_dir, monkeypatch):
    monkeypatch.delenv("GRAFT_LM_BROADCAST_MAX_KEYS", raising=False)
    broadcast = _norm(fn(sf_dir))
    monkeypatch.setenv("GRAFT_LM_BROADCAST_MAX_KEYS", "0")
    distributed = _norm(fn(sf_dir))
    return broadcast, distributed


def test_lm_perplexity_paths_bit_equal(ray_session, tiny_sf, monkeypatch):
    a, b = _both_paths(q.q_lm_perplexity, tiny_sf, monkeypatch)
    assert len(a) == len(TEXTS)
    assert a.equals(b)
    # zero-bigram docs (one-token + empty) emit (0, 0.0, 0.0) on both paths
    zeros = a[a["n_bigrams"] == 0]
    assert len(zeros) == 2
    assert (zeros["ll"] == 0.0).all() and (zeros["ppl"] == 0.0).all()


def test_corpus_curate_paths_bit_equal(ray_session, tiny_sf, monkeypatch):
    a, b = _both_paths(q.q_corpus_curate, tiny_sf, monkeypatch)
    assert a.equals(b)


def test_pmi_top_paths_bit_equal(ray_session, tiny_sf, monkeypatch):
    a, b = _both_paths(q.q_pmi_top, tiny_sf, monkeypatch)
    assert len(a) > 0
    assert a.equals(b)


def test_distributed_scores_held_out_docs(ray_session, tiny_sf):
    """DSIR-style reusability: lm_score_distributed on docs containing
    bigrams/unigrams ABSENT from the model must coalesce their counts to
    0 inside the term expression (the broadcast kernel's semantics),
    not drop or mis-join them."""
    import ray.data as rd

    docs, counts = q._lm_counts_ds(tiny_sf)
    vocab = q._lm_vocab_size(counts)
    held_out = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([100, 101], pa.int64()),
                "text": pa.array(
                    ["the cat zzznovel qqqunseen", "zzznovel zzznovel"], pa.string()
                ),
            }
        )
    )
    got = _norm(cp.lm_score_distributed(held_out, counts, vocab))
    assert list(got["n_bigrams"]) == [3, 1]
    # every ppl strictly positive (scored, not dropped)
    assert (got["ppl"] > 0).all()

    # oracle: broadcast-path scorer over the same model must agree
    uni_ref, bi_ref, vocab2 = q._lm_broadcast(counts)
    scorer = cp.LMPerplexityScorer(uni_ref, bi_ref, vocab2)
    want = _norm(
        scorer(
            pa.table(
                {
                    "doc_id": pa.array([100, 101], pa.int64()),
                    "text": pa.array(
                        ["the cat zzznovel qqqunseen", "zzznovel zzznovel"],
                        pa.string(),
                    ),
                }
            )
        )
    )
    assert got.equals(want)
