"""Byte-level tokenizer kernel ≡ the RE2 count-kernel semantics.

The quality-score oracle twins are keyed to Arrow/DuckDB RE2 counts
(``[A-Za-z0-9_]+`` tokens, ASCII ``\\b`` stopword bounds), so the numpy
kernel must match them integer-exactly — including on non-ASCII text,
where RE2's ASCII word class differs from Python ``re``'s Unicode
``\\b`` (the Arrow kernels are the reference here, not ``re``).
"""

import random

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from freshonions_torscraper_ray.functions.regexes import WORD_PATTERN
from freshonions_torscraper_ray.functions.tokenize import token_stats

EDGE_CASES = [
    "", "a", "the", "a the a", "héllo wörld the", "x" * 200 + " the a b",
    "a_b2 C3 __ the The THE athe thea a a", "日本語 the 中文 a", "\n\t the a ",
    " t", "t ", "©a©", "a" * 500, "tok" + "é" * 10 + "the", "ß the",
    "aé the",  # RE2 \b is ASCII: token is "a" → stopword; Python re says no
    "\x00the\x00a", "z" * 100 + " zz Qq", "_", "__ _a a_ _the the_",
]


def _random_cases(n: int = 400) -> list[str]:
    rng = random.Random(7)
    alpha = "ab the_Z9 é中\n ,.!"
    return ["".join(rng.choice(alpha) for _ in range(rng.randrange(0, 300))) for _ in range(n)]


@pytest.mark.parametrize("cases", [EDGE_CASES, _random_cases()], ids=["edge", "random"])
def test_counts_match_arrow_re2_kernels(cases):
    arr = pa.array(cases, pa.large_string())
    st = token_stats(arr)
    ref_tok = pc.cast(pc.count_substring_regex(arr, WORD_PATTERN), pa.int64()).to_numpy(zero_copy_only=False)
    ref_stop = pc.cast(pc.count_substring_regex(arr, r"\b(?:the|a)\b"), pa.int64()).to_numpy(zero_copy_only=False)
    ref_chars = pc.cast(pc.count_substring_regex(arr, "[A-Za-z0-9_]"), pa.int64()).to_numpy(zero_copy_only=False)
    assert np.array_equal(st.n_tok, ref_tok)
    assert np.array_equal(st.n_chars, ref_chars)
    assert np.array_equal(st.n_stop, ref_stop)


def test_hash_family_properties():
    # same token → same hash (case-folded); distinct tokens differ
    st = token_stats(pa.array(["the quick the", "quick THE"], pa.large_string()))
    h = st.hashes
    assert h[0] == h[2] == h[4]
    assert h[0] != h[1] and h[0] != 0
    # long-token fallback path and per-length path agree on the family
    a = token_stats(pa.array(["z" * 500 + " zz Qq"], pa.large_string())).hashes
    b = token_stats(pa.array(["z" * 500, "zz qQ"], pa.large_string())).hashes
    assert np.array_equal(a, b)
    # long tokens differing only past the per-length cap still differ
    t1 = token_stats(pa.array(["q" * 64 + "x"], pa.large_string())).hashes
    t2 = token_stats(pa.array(["q" * 64 + "y"], pa.large_string())).hashes
    assert t1[0] != t2[0]


def test_doc_boundaries_do_not_merge_tokens():
    # doc ending in a word char + doc starting in one: two tokens, and
    # hashes equal the standalone forms
    st = token_stats(pa.array(["abc", "def"], pa.large_string()))
    assert list(st.n_tok) == [1, 1]
    solo = token_stats(pa.array(["abc def"], pa.large_string())).hashes
    assert np.array_equal(st.hashes, solo)


def test_sliced_and_chunked_inputs():
    base = pa.array(["pad pad", "a the", "xyz", ""], pa.large_string())
    sliced = base.slice(1, 3)
    st = token_stats(sliced)
    assert list(st.n_tok) == [2, 1, 0]
    assert list(st.n_stop) == [2, 0, 0]
    chunked = pa.chunked_array([["a the"], ["xyz", ""]], pa.large_string())
    st2 = token_stats(chunked)
    assert np.array_equal(st2.hashes, st.hashes)
    # plain string (non-large) and null handling
    st3 = token_stats(pa.array(["a the", None, "xyz"], pa.string()))
    assert list(st3.n_tok) == [2, 0, 1]
