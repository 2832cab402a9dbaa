"""Vocabulary build (q_vocab_build): dense frequency-rank ids computed
without a global sort (per-(cnt, first-byte) bucket offsets + in-bucket
rank). Planted corpus pins ordering, tie-breaks, min-count gating, and
id contiguity; the oracle gate (row_number twin) covers the real tables.
"""

import pyarrow as pa
import pyarrow.parquet as pq

from freshonions_torscraper_ray.pipelines.queries import VOCAB_MIN_COUNT, q_vocab_build


def _write_docs(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_vocab_rank_ties_and_min_count(ray_session, tmp_path):
    # counts: zeta=4, apple=3, bear=3, ant=3, once=1 (dropped), twice=2 (dropped)
    sf = _write_docs(
        tmp_path,
        [
            "zeta zeta apple bear ant twice",
            "zeta apple bear ant Once",
            "zeta apple bear ant twice",
        ],
    )
    assert VOCAB_MIN_COUNT == 3  # planted counts assume the shipped gate
    out = q_vocab_build(sf).to_pandas().sort_values("token_id").reset_index(drop=True)
    # (cnt desc, token asc): zeta(4), then ant/apple/bear tied at 3
    assert out["token"].tolist() == ["zeta", "ant", "apple", "bear"]
    assert out["cnt"].tolist() == [4, 3, 3, 3]
    assert out["token_id"].tolist() == [0, 1, 2, 3]


def test_vocab_ids_contiguous_across_buckets(ray_session, tmp_path):
    # many first-byte buckets at the same count + a spread of counts
    words = [f"{c}word" for c in "abcdefghij"]
    texts = [" ".join(words)] * 3 + ["jword jword", "aword"]
    sf = _write_docs(tmp_path, texts)
    out = q_vocab_build(sf).to_pandas()
    ids = sorted(out["token_id"].tolist())
    assert ids == list(range(len(out)))  # dense, 0-based, no gaps
    ranked = out.sort_values("token_id")
    pairs = list(zip(-ranked["cnt"], ranked["token"]))
    assert pairs == sorted(pairs)  # id order == (cnt desc, token asc)


def test_corpus_tokenize_positions_and_oov(ray_session, tmp_path):
    from freshonions_torscraper_ray.pipelines.queries import q_corpus_tokenize

    sf = _write_docs(
        tmp_path,
        [
            "zeta zeta zeta rare zeta",  # 'rare' appears once -> OOV (-1)
            "zeta",
        ],
    )
    out = (
        q_corpus_tokenize(sf)
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    d0 = out[out["doc_id"] == 0]
    assert d0["pos"].tolist() == [0, 1, 2, 3, 4]
    assert d0["token_id"].tolist() == [0, 0, 0, -1, 0]  # zeta=id0, rare=OOV
    d1 = out[out["doc_id"] == 1]
    assert d1["token_id"].tolist() == [0]


def test_vocab_and_tokenize_empty_corpus(ray_session, tmp_path):
    """Empty partitions happen at scale; the whole family must produce
    empty results, not crash."""
    from freshonions_torscraper_ray.pipelines.queries import q_corpus_tokenize

    sf = _write_docs(tmp_path, ["", "   ", "!!!"])  # zero tokens everywhere
    assert q_vocab_build(sf).count() == 0
    assert q_corpus_tokenize(sf).count() == 0
