"""Unit tests for the corpus-level training-data operators
(stages/corpus.py) on planted inputs with hand-computed expectations.
The oracle-gate coverage is in the conformance harness; these pin the
kernel semantics themselves (boundary docs, empty cases, tie-breaks)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from freshonions_torscraper_ray.stages import corpus as cp


def _docs(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


class TestRepetitionStats:
    def test_planted_fractions(self):
        out = cp.repetition_stats(_docs([
            "a a a a",          # bigrams: 3x "a a" -> top 3/3; trigrams 2x "a a a" -> dup 1-1/2
            "x y z w",          # all distinct
            "hi",               # 1 token: no bigrams/trigrams -> 0, 0
            "",                 # 0 tokens
        ])).to_pydict()
        assert out["n_tokens"] == [4, 4, 1, 0]
        assert out["top_bigram_frac"] == [1.0, pytest.approx(1 / 3, abs=1e-4), 0.0, 0.0]
        assert out["dup_trigram_frac"] == [0.5, 0.0, 0.0, 0.0]

    def test_two_tokens_no_trigram(self):
        out = cp.repetition_stats(_docs(["ab ab"])).to_pydict()
        assert out["top_bigram_frac"] == [1.0]
        assert out["dup_trigram_frac"] == [0.0]


class TestNgramPartial:
    def test_bigram_counts(self):
        t = cp.ngram_partial_counts(_docs(["a b a b", "a b"]), n=2)
        d = dict(zip(t["ngram"].to_pylist(), t["cnt"].to_pylist()))
        assert d == {"a b": 3, "b a": 1}

    def test_unigram_and_trigram(self):
        t1 = cp.ngram_partial_counts(_docs(["x x y"]), n=1)
        assert dict(zip(t1["ngram"].to_pylist(), t1["cnt"].to_pylist())) == {"x": 2, "y": 1}
        t3 = cp.ngram_partial_counts(_docs(["x y z w"]), n=3)
        assert set(t3["ngram"].to_pylist()) == {"x y z", "y z w"}


class TestTfShingles:
    def test_tf_rows_lowercase_distinct(self):
        t = cp.tf_rows(_docs(["The the THE cat"]))
        d = {(r["doc_id"], r["token"]): r["tf"] for r in t.to_pylist()}
        assert d == {(0, "the"): 3, (0, "cat"): 1}

    def test_shingle_rows_distinct(self):
        t = cp.shingle_rows(_docs(["a b c a b c a b c"]), k=3)
        shs = t["sh"].to_pylist()
        assert len(shs) == len(set(shs)) == 3  # {a b c, b c a, c a b}

    def test_short_doc_no_shingles(self):
        t = cp.shingle_rows(_docs(["a b"]), k=5)
        assert t.num_rows == 0


class TestTopkPerGroup:
    def test_partial_plus_final_equals_window(self):
        rng = np.random.default_rng(7)
        df = pd.DataFrame({
            "g": rng.integers(0, 5, 200),
            "key": np.arange(200),
            "v": rng.integers(0, 10, 200).astype(float),  # heavy ties
        })
        partial = cp.topk_per_group_partial(["g"], "v", 3, "key")
        final = cp.topk_per_group_final(["g"], "v", 3, "key")
        # simulate two map-side batches then the reduce
        thinned = pd.concat([partial(df.iloc[:97]), partial(df.iloc[97:])])
        got = (
            thinned.groupby("g", group_keys=False)[thinned.columns.tolist()]
            .apply(final)
            .sort_values(["g", "key"])
            .reset_index(drop=True)
        )
        exp = (
            df.sort_values(["v", "key"], ascending=[False, True], kind="mergesort")
            .groupby("g", sort=False)
            .head(3)
            .sort_values(["g", "key"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp)


class TestContamination:
    def test_flags_only_overlapping_docs(self, ray_session):
        import ray

        bench = cp.shingle_rows(_docs(["one two three four five six"]), k=5)
        ref = ray.put(bench["sh"].combine_chunks().cast(pa.large_string()))
        flag = cp.ContaminationFlagger(ref, k=5)
        out = flag(_docs([
            "one two three four five",            # 5-gram shared with bench
            "totally unrelated words here now",   # clean
            "zzz one two three four five six",    # 2 shared 5-grams
        ]))
        d = dict(zip(out["doc_id"].to_pylist(), out["n_hits"].to_pylist()))
        assert d == {0: 1, 2: 2}

    def test_empty_batch_schema(self, ray_session):
        import ray

        ref = ray.put(pa.array(["a b c d e"], pa.large_string()))
        flag = cp.ContaminationFlagger(ref, k=5)
        out = flag(_docs(["short text"]))
        assert out.num_rows == 0
        assert out.column_names == ["doc_id", "n_hits"]


class TestChunkDedup:
    def test_partial_df_counts_distinct_docs(self):
        # width=3: doc0 chunks: "a b c","d e f","g"; doc1: "a b c","x"
        # doc2 repeats "a b c" twice -> still ONE distinct-doc count
        t = cp.chunk_partial_df(_docs([
            "a b c d e f g",
            "a b c x",
            "a b c a b c",
        ]), width=3)
        d = dict(zip(t["chunk"].to_pylist(), t["df"].to_pylist()))
        assert d == {"a b c": 3, "d e f": 1, "g": 1, "x": 1}

    def test_rebuilder_cuts_hot_chunks_in_order(self, ray_session):
        import ray

        ref = ray.put(pa.array(["a b c"], pa.string()))
        reb = cp.ChunkDedupRebuilder(ref, width=3)
        out = reb(_docs([
            "a b c d e f g",   # hot head chunk cut
            "a b c a b c",     # both chunks hot -> emptied
            "",                # zero tokens -> survives as ''
            "q r s",           # untouched
        ])).to_pydict()
        assert out["text_clean"] == ["d e f g", "", "", "q r s"]
        assert out["n_removed"] == [1, 2, 0, 0]

    def test_rebuilder_empty_hot_set(self, ray_session):
        import ray

        ref = ray.put(pa.array([], pa.string()))
        reb = cp.ChunkDedupRebuilder(ref, width=3)
        out = reb(_docs(["a b c d"])).to_pydict()
        assert out["text_clean"] == ["a b c d"]
        assert out["n_removed"] == [0]


class TestLMPerplexity:
    def _model(self, texts):
        # corpus-wide model counts via the single-pass batch combiner
        rows = cp.lm_model_partial_counts(_docs(texts))
        kinds = rows["kind"].to_pylist()
        keys = rows["key"].to_pylist()
        cnts = rows["cnt"].to_pylist()
        uni = [(k, c) for kk, k, c in zip(kinds, keys, cnts) if kk == 0]
        bi = [(k, c) for kk, k, c in zip(kinds, keys, cnts) if kk == 1]
        uni_tbl = pa.table({"tok": pa.array([k for k, _ in uni], pa.string()),
                            "c": pa.array([c for _, c in uni], pa.int64())})
        bi_tbl = pa.table({"g": pa.array([k for k, _ in bi], pa.string()),
                           "c": pa.array([c for _, c in bi], pa.int64())})
        return uni_tbl, bi_tbl

    def test_planted_scores(self):
        texts = ["a b", "a b", "a c"]
        uni_tbl, bi_tbl = self._model(texts)
        assert uni_tbl.num_rows == 3  # V = {a, b, c}
        sc = cp.LMPerplexityScorer(uni_tbl, bi_tbl, uni_tbl.num_rows)
        out = sc(_docs(texts)).to_pydict()
        # doc0/1 "a b": P = (2+1)/(3+3) = 0.5 -> ll = round(ln .5, 4)
        # doc2  "a c": P = (1+1)/(3+3) = 1/3
        assert out["n_bigrams"] == [1, 1, 1]
        assert out["ll"] == [-0.6931, -0.6931, -1.0986]
        # exp(1.0986) = 2.999963… -> 3.0 at 4 decimals
        assert out["ppl"] == [1.9999, 1.9999, 3.0]

    def test_empty_and_single_token_docs(self):
        uni_tbl, bi_tbl = self._model(["x y"])
        sc = cp.LMPerplexityScorer(uni_tbl, bi_tbl, uni_tbl.num_rows)
        out = sc(_docs(["", "x", "x y"])).to_pydict()
        assert out["n_bigrams"] == [0, 0, 1]
        assert out["ll"][0] == 0.0 and out["ppl"][0] == 0.0
        assert out["ll"][1] == 0.0 and out["ppl"][1] == 0.0

    def test_integer_quantized_sum_is_order_independent(self):
        # two bigrams whose float logs would be order-sensitive in a
        # naive float sum: quantized int terms must add exactly
        texts = ["a b c"] * 7 + ["b c a"]
        uni_tbl, bi_tbl = self._model(texts)
        sc = cp.LMPerplexityScorer(uni_tbl, bi_tbl, uni_tbl.num_rows)
        fwd = sc(_docs(texts)).to_pydict()
        rev = sc(_docs(texts[::-1])).to_pydict()
        assert fwd["ll"][0] == rev["ll"][-1]
        assert fwd["ppl"][0] == rev["ppl"][-1]


class TestDSIR:
    def _docs_lang(self, texts, langs):
        return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                         "lang": pa.array(langs, pa.string()),
                         "text": pa.array(texts, pa.string())})

    def test_partial_counts_split_target(self):
        t = cp.dsir_partial_counts(self._docs_lang(
            ["aa bb", "aa cc"], ["en", "fr"]))
        assert t["c_raw"].to_pylist() and sum(t["c_raw"].to_pylist()) == 4
        assert sum(t["c_tgt"].to_pylist()) == 2  # only the en doc's tokens
        # every bucket row has c_tgt <= c_raw
        assert all(ct <= cr for ct, cr in zip(t["c_tgt"].to_pylist(),
                                              t["c_raw"].to_pylist()))

    def test_scoring_favors_target_like_docs(self):
        texts = ["good clean prose here"] * 3 + ["zz9 qq8 vv7 kk6"] * 3
        langs = ["en"] * 3 + ["fr"] * 3
        docs = self._docs_lang(texts, langs)
        counts = cp.dsir_partial_counts(docs)
        raw_total = sum(counts["c_raw"].to_pylist())
        tgt_total = sum(counts["c_tgt"].to_pylist())
        terms = cp.dsir_bucket_terms(
            pa.table({"bucket": counts["bucket"], "c_raw": counts["c_raw"],
                      "c_tgt": counts["c_tgt"]}), raw_total, tgt_total)
        sc = cp.DSIRScorer(terms)
        out = sc(docs.select(["doc_id", "text"])).to_pydict()
        # target-distribution docs must outscore the off-target ones
        assert min(out["logw"][:3]) > max(out["logw"][3:])
        assert out["n_tokens"] == [4] * 6

    def test_empty_doc_zero_weight(self):
        docs = self._docs_lang(["a b", ""], ["en", "en"])
        counts = cp.dsir_partial_counts(docs)
        terms = cp.dsir_bucket_terms(
            pa.table({"bucket": counts["bucket"], "c_raw": counts["c_raw"],
                      "c_tgt": counts["c_tgt"]}), 2, 2)
        out = cp.DSIRScorer(terms)(docs.select(["doc_id", "text"])).to_pydict()
        assert out["n_tokens"][1] == 0 and out["logw"][1] == 0.0


class TestPMI:
    def test_model_counts_feed_pmi_expectations(self):
        # "a b" x5 plus "a c" x5: both bigrams share c_a; pmi orders by
        # the rarer right-hand unigram (c_b=5 vs c_c=5 -> tie, lexicographic)
        rows = cp.lm_model_partial_counts(_docs(["a b"] * 5 + ["a c"] * 5))
        d = {(k, key): c for k, key, c in zip(rows["kind"].to_pylist(),
                                              rows["key"].to_pylist(),
                                              rows["cnt"].to_pylist())}
        assert d[(0, "a")] == 10 and d[(0, "b")] == 5 and d[(0, "c")] == 5
        assert d[(1, "a b")] == 5 and d[(1, "a c")] == 5


class TestEntropy:
    def test_planted_entropy(self):
        import math

        out = cp.entropy_stats(_docs([
            "a b c d",   # uniform over 4 types -> ln(4)
            "a a a a",   # single type -> 0
            "x",         # single token -> 0
            "",          # empty -> 0, n=0
        ])).to_pydict()
        assert out["n_tokens"] == [4, 4, 1, 0]
        # quantized terms: q = round(ln(1/4)*1e4) = -13863 -> H = 4*13863/(4e4)
        assert out["entropy"][0] == round(13863 / 10000.0, 4)
        assert abs(out["entropy"][0] - math.log(4)) < 1e-3
        assert out["entropy"][1:] == [0.0, 0.0, 0.0]


class TestCurator:
    def test_gates_applied_in_one_pass(self):
        texts = ["a b c d e f g h i j k l", "a a a a a a a a a a a a", "x y"]
        rows = cp.lm_model_partial_counts(_docs(texts))
        uni = [(k, c) for kk, k, c in zip(rows["kind"].to_pylist(),
                                          rows["key"].to_pylist(),
                                          rows["cnt"].to_pylist()) if kk == 0]
        bi = [(k, c) for kk, k, c in zip(rows["kind"].to_pylist(),
                                         rows["key"].to_pylist(),
                                         rows["cnt"].to_pylist()) if kk == 1]
        uni_tbl = pa.table({"tok": pa.array([k for k, _ in uni], pa.string()),
                            "c": pa.array([c for _, c in uni], pa.int64())})
        bi_tbl = pa.table({"g": pa.array([k for k, _ in bi], pa.string()),
                           "c": pa.array([c for _, c in bi], pa.int64())})
        # loose ppl gate, entropy gate at ln(12)~2.48 cuts the all-'a' doc,
        # min_tokens cuts the 2-token doc
        cur = cp.CorpusCurator(uni_tbl, bi_tbl, uni_tbl.num_rows,
                               ppl_max=1e9, ent_min=2.0, min_tokens=10)
        out = cur(_docs(texts)).to_pydict()
        assert out["doc_id"] == [0]
        assert out["n_tokens"] == [12]


class TestDSIRSample:
    def test_keys_deterministic_and_weight_monotone(self):
        import numpy as np

        docs = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["good clean prose", "good clean prose", "zz9 qq8"], pa.string()),
        })
        terms = np.zeros(cp.DSIR_BUCKETS, dtype=np.int64)
        terms[:] = 0
        sk = cp.DSIRSampleKeys(terms)
        a = sk(docs).to_pydict()
        b = sk(docs).to_pydict()
        assert a == b  # pure function of (doc_id, text, terms)
        # all-zero terms -> logw 0 for every doc; keys differ only by the
        # doc_id-derived Gumbel noise, and u in (0,1) gives finite keys
        assert a["logw"] == [0.0, 0.0, 0.0]
        assert all(np.isfinite(a["key"]))
        # identical text, different ids -> different keys (hash-driven)
        assert a["key"][0] != a["key"][1]
