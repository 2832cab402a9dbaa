"""Winnowing (rolling-hash) document fingerprints: scalar-reference
equality, the shared-substring guarantee, and batch-boundary invariance.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from freshonions_torscraper_ray.stages.textstats import (
    _WINNOW_BASE,
    _kgram_hashes,
    winnow_doc_fps,
    winnow_fingerprints,
)

P = (1 << 61) - 1
K, W = 8, 16


def scalar_kgram_hashes(data: bytes, k: int) -> list[int]:
    """Naive int-arithmetic reference of the polynomial k-gram hash."""
    out = []
    b = int(_WINNOW_BASE)
    for i in range(len(data) - k + 1):
        h = 0
        for c in data[i : i + k]:
            h = (h * b + c) % P
        out.append(h)
    return out


def scalar_winnow(text: str, k: int = K, w: int = W) -> set[int]:
    data = text.encode("utf-8")
    hs = scalar_kgram_hashes(data, k)
    if not hs:
        return set()
    if len(hs) <= w:
        return {min(hs)}
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


text_strategy = st.text(
    alphabet=st.sampled_from("abcdef "), min_size=0, max_size=200
)


@settings(max_examples=60, deadline=None)
@given(text=text_strategy)
def test_kgram_hashes_match_scalar_reference(text):
    data = text.encode("utf-8")
    buf = np.frombuffer(data, dtype=np.uint8)
    got = _kgram_hashes(buf, K).tolist()
    assert got == scalar_kgram_hashes(data, K)


@settings(max_examples=60, deadline=None)
@given(text=text_strategy)
def test_winnow_fps_match_scalar_reference(text):
    data = text.encode("utf-8")
    buf = np.frombuffer(data, dtype=np.uint8)
    got = set(winnow_doc_fps(_kgram_hashes(buf, K), W).tolist())
    assert got == scalar_winnow(text)


@settings(max_examples=40, deadline=None)
@given(
    pre_a=st.text(alphabet=st.sampled_from("xyz"), min_size=0, max_size=60),
    pre_b=st.text(alphabet=st.sampled_from("uvw"), min_size=0, max_size=60),
    shared=st.text(alphabet=st.sampled_from("abcdef "), min_size=W + K - 1, max_size=80),
)
def test_shared_substring_guarantee(pre_a, pre_b, shared):
    """The winnowing guarantee: two docs sharing a run of >= w+k-1 bytes
    must share at least one fingerprint."""
    a, b = pre_a + shared, pre_b + shared
    fa, fb = scalar_winnow(a), scalar_winnow(b)
    # engine form agrees with the scalar sets (covered above); the
    # guarantee itself:
    assert fa & fb


def test_batch_boundary_invariance():
    """A doc's digest cannot depend on its neighbours in the batch."""
    doc = "the quick brown onion jumped over the hidden service " * 4
    alone = winnow_fingerprints(pa.table({"text": [doc]}))
    packed = winnow_fingerprints(
        pa.table({"text": ["padding before it", doc, "and padding after"]})
    )
    cols = ("n_fps", "fp_min", "fp_xor")
    assert tuple(alone[c][0].as_py() for c in cols) == tuple(
        packed[c][1].as_py() for c in cols
    )


def test_identical_docs_identical_digests_and_edits_shift_partially():
    base = "a long enough document about onion services and fingerprints " * 3
    edited = base.replace("onion", "garlic", 1)
    t = winnow_fingerprints(pa.table({"text": [base, base, edited]}))
    assert t["fp_xor"][0].as_py() == t["fp_xor"][1].as_py()
    # a local edit must not destroy all overlap (winnowing is local):
    fa = scalar_winnow(base)
    fb = scalar_winnow(edited)
    assert fa != fb and fa & fb


def test_winnow_fp_rows_explode_matches_sets():
    from freshonions_torscraper_ray.stages.textstats import winnow_fp_rows

    docs = {
        1: "the quick brown onion jumped over the hidden service " * 3,
        2: "completely different text with nothing in common here at all " * 3,
    }
    t = winnow_fp_rows(pa.table({"doc_id": list(docs), "text": list(docs.values())}))
    by_doc: dict[int, set] = {}
    for r in t.to_pylist():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"] & ((1 << 61) - 1))
    for d, text in docs.items():
        assert by_doc[d] == scalar_winnow(text)


def test_dedup_winnow_finds_planted_near_dups(ray_session, tmp_path):
    """Planted near-dup (one word edited) must pair; disjoint docs must not."""
    import pyarrow.parquet as pq

    from freshonions_torscraper_ray.pipelines.queries import q_dedup_winnow

    base = "onion services host hidden content across the dark web tonight " * 5
    docs = [
        (0, base),
        (1, base.replace("tonight", "tomorrow", 1)),  # near-dup of 0
        (2, "unrelated corpus text about cooking recipes and gardens " * 5),
        (3, "another disjoint document on astronomy and telescopes " * 5),
    ]
    pq.write_table(
        pa.table({"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]}),
        str(tmp_path / "documents.parquet"),
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in q_dedup_winnow(str(tmp_path)).take_all()}
    assert (0, 1) in pairs
    assert all(p == (0, 1) for p in pairs)


def test_sliced_array_offset_honored():
    """A bare sliced large_string Array (nonzero .offset) must fingerprint
    the sliced rows, not the parent's rows from offset 0 (the offsets
    buffer is shared with the parent — round-3 ADVICE fix)."""
    from freshonions_torscraper_ray.stages.textstats import _utf8_buffer_views

    docs = [
        "first document about onions and hidden services " * 2,
        "second document entirely different words here " * 2,
        "third document shares nothing with the others " * 2,
        "fourth document also distinct content throughout " * 2,
    ]
    full = pa.array(docs, pa.large_string())
    sliced = full.slice(1, 2)
    assert sliced.offset == 1  # precondition: genuinely sliced
    off_s, buf_s = _utf8_buffer_views(sliced)
    copied = pa.array(docs[1:3], pa.large_string())
    off_c, buf_c = _utf8_buffer_views(copied)
    # rebased offsets and data bytes must describe the same two strings
    assert np.array_equal(off_s - off_s[0], off_c - off_c[0])
    assert np.array_equal(buf_s, buf_c)


def test_winnow_on_sliced_table_matches_copy():
    """End-to-end: winnowing a zero-copy Table slice equals winnowing a
    deep copy of the same rows (guards any future zero-copy
    combine_chunks path)."""
    from freshonions_torscraper_ray.stages.textstats import winnow_fp_rows

    docs = [
        "padding row that must not leak into the slice " * 3,
        "the quick brown onion jumped over the hidden service " * 3,
        "completely different text with nothing in common at all " * 3,
        "trailing padding row that must not leak either " * 3,
    ]
    t = pa.table({"doc_id": [0, 1, 2, 3], "text": pa.array(docs, pa.large_string())})
    sliced = winnow_fp_rows(t.slice(1, 2))
    copied = winnow_fp_rows(
        pa.table({"doc_id": [1, 2], "text": pa.array(docs[1:3], pa.large_string())})
    )
    assert sliced.to_pylist() == copied.to_pylist()
