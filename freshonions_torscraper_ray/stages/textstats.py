"""Text-analysis stages over flat text columns.

The reference scored/typed page text only lightly (language field on
Domain, ES analyzers — SURVEY.md §2.2 O10, §2.6); a training-data
pipeline needs more, so these are first-class batch ops: token counting,
quality scoring, language ID (n-gram heuristic), document fingerprinting.
All vectorized over Arrow batches; regex work uses RE2-compatible
patterns shared with the DuckDB oracle twins.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.regexes import WORD_PATTERN
from ..functions.rounding import round_half_away

STOPWORDS = ("the", "a")  # fixed tiny list shared with oracle SQL


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """tokens = RE2 ``[A-Za-z0-9_]+`` matches (whitespace-ish tokenizer)."""
    n_tokens = pc.count_substring_regex(batch[text_col], WORD_PATTERN)
    return batch.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))


_STOPWORD_RX = r"\b(?:" + "|".join(STOPWORDS) + r")\b"  # RE2 \b = same
# [A-Za-z0-9_] word class as WORD_PATTERN, so a match is exactly a
# whole tokenizer token equal to a stopword
_WORDCHAR_RX = "[A-Za-z0-9_]"


def _quality_columns(batch: pa.Table, n_tok, n_stop, n_chars) -> pa.Table:
    """Append the three quality columns from raw counts — the one shared
    formula (rounding included) behind both the 3-scan and fused paths."""
    denom = np.maximum(n_tok, 1)
    mean_len = round_half_away(np.where(n_tok > 0, n_chars / denom, 0.0), 4)
    ratio = round_half_away(np.where(n_tok > 0, n_stop / denom, 0.0), 4)
    out = batch.append_column("n_tokens", pa.array(n_tok))
    out = out.append_column("stop_ratio", pa.array(ratio))
    return out.append_column("mean_token_len", pa.array(mean_len))


def quality_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality heuristics: token count, stopword ratio, mean token length.

    Mirrors the shape of classic corpus-quality filters (Gopher-style
    length/stopword rules) with a deterministic, oracle-checkable core.

    Fully vectorized on RE2 count kernels: token count = WORD_PATTERN
    matches; stopword count = whole-token stopword matches (\\b bounds);
    token-length sum = single word-char count (every token char is
    counted exactly once). Integer-identical to the per-row findall
    formulation, so the rounded ratios hash-match the DuckDB twin.
    """
    txt = batch[text_col]
    n_tok = pc.cast(pc.count_substring_regex(txt, WORD_PATTERN), pa.int64()).to_numpy(zero_copy_only=False)
    n_stop = pc.cast(pc.count_substring_regex(txt, _STOPWORD_RX), pa.int64()).to_numpy(zero_copy_only=False)
    n_chars = pc.cast(pc.count_substring_regex(txt, _WORDCHAR_RX), pa.int64()).to_numpy(zero_copy_only=False)
    return _quality_columns(batch, n_tok, n_stop, n_chars)


def enrich_fused(batch: pa.Table, text_col: str = "text") -> tuple[pa.Table, np.ndarray]:
    """Quality columns + language ID + uint64 simhashes from one pass.

    Tokens, quality counts and token hashes come from the byte-level
    numpy kernel (``functions/tokenize.py::token_stats`` — one scan of
    the Arrow data buffer, no token-string materialization); language-ID
    trigram flags come from one DuckDB ``contains(lower(t), tri)``
    query (measured 3× faster than 20 Arrow ``match_substring`` scans),
    classified by the same ``LangId.classify``. Counts are
    integer-identical to quality_scores' three-RE2-scan form (the byte
    mask reproduces [A-Za-z0-9_] code-point semantics on UTF-8) and
    pred_lang to the LangId Arrow path, so the fused and standalone
    paths agree bit-for-bit; token hashes are the shared
    ``dedup.token_hash_lists`` family, so enrich simhashes join against
    SimHasher output.
    """
    from ..functions.doc_extract import _duck
    from ..functions.tokenize import token_stats
    from .dedup import vote_simhash

    li = LangId()
    txt = batch[text_col]
    txt = txt.combine_chunks() if isinstance(txt, pa.ChunkedArray) else txt
    st = token_stats(txt)
    sims = vote_simhash(st.n_tok, st.hashes)
    tbl = pa.table({"t": pc.cast(pc.fill_null(txt, ""), pa.large_string())})  # noqa: F841 — duckdb reads it by name
    tri_sql = ", ".join(
        "contains(lt, '{}') AS tri_{}".format(t.replace("'", "''"), i)
        for i, t in enumerate(li.trigrams)
    )
    res = _duck().execute(f"SELECT {tri_sql} FROM (SELECT lower(t) AS lt FROM tbl)").arrow()
    pres = {
        t: pc.cast(res[f"tri_{i}"], pa.int8()).to_numpy(zero_copy_only=False)
        for i, t in enumerate(li.trigrams)
    }
    out = _quality_columns(batch, st.n_tok, st.n_stop, st.n_chars)
    out = out.append_column("pred_lang", li.classify(pres, batch.num_rows))
    return out, sims


def md5_fingerprints(batch: pa.Table, text_col: str = "text", out_col: str = "fp") -> pa.Table:
    """Hex MD5 content fingerprint (DuckDB ``md5()`` twin) — the exact-dedup key."""
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column(out_col, pa.array(fps, pa.string()))


class LangId:
    """Heuristic language ID from character-trigram profiles.

    Stateful stage: the trigram profiles are built once per actor in
    ``__init__`` (the reference loaded a langdetect-style model once per
    process — O10). Deterministic; not oracle-SQL-expressible → registered
    as a rows-only query.
    """

    PROFILES = {
        "en": ["the", "and", "ing", "ion", "ent"],
        "es": ["que", "los", "ent", "cio", "las"],
        "de": ["der", "die", "und", "ein", "sch"],
        "fr": ["les", "des", "ent", "que", "ion"],
    }

    def __init__(self) -> None:
        self.profiles = {lang: set(tris) for lang, tris in self.PROFILES.items()}
        self.langs = sorted(self.profiles)  # argmax first-max = alphabetical
        # tie-break, same as the scalar "n > best_n" loop
        self.trigrams = sorted({t for s in self.profiles.values() for t in s})

    def classify(self, pres: dict[str, np.ndarray], n: int) -> pa.Array:
        """Shared classification core: per-trigram presence vectors →
        docs×langs count matrix → argmax + zero-mask (reproduces the
        scalar "n > best_n" loop). Used by both the Arrow path below and
        the fused-DuckDB enrich kernel — one definition, two producers."""
        m = np.zeros((n, len(self.langs)), dtype=np.int32)
        for j, lang in enumerate(self.langs):
            for t in self.profiles[lang]:
                m[:, j] += pres[t]
        best = np.argmax(m, axis=1)
        hit = m[np.arange(len(best)), best] > 0
        out = np.where(hit, np.asarray(self.langs, dtype=object)[best], "und")
        return pa.array(out.tolist(), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized: per-trigram substring presence (a text's trigram
        set contains t iff t is a substring), summed via ``classify``."""
        low = pc.utf8_lower(batch["text"])
        pres = {
            t: pc.cast(pc.match_substring(low, t), pa.int8()).to_numpy(zero_copy_only=False)
            for t in self.trigrams
        }
        return batch.append_column("pred_lang", self.classify(pres, batch.num_rows))


def extract_pattern_rows(
    batch: pa.Table, pattern: str, text_col: str = "text", id_col: str = "doc_id", out_col: str = "token"
) -> pa.Table:
    """Find-all + explode: one output row per regex match per document
    (document order). The explode core behind the email/btc/onion
    extraction queries (O3/O5/O6) over flat text. One vectorized RE2
    pass over the batch (findall_batch), then an Arrow list explode."""
    from ..functions.doc_extract import findall_batch

    ids = batch[id_col]
    ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    texts = batch[text_col].to_pylist()
    matches = findall_batch(texts, [re.compile(pattern)])[0]
    lists = pa.array(matches, pa.list_(pa.string()))
    parent = pc.list_parent_indices(lists)
    return pa.Table.from_arrays(
        [pc.take(ids, parent), pc.list_flatten(lists)], names=[id_col, out_col]
    )


def chunk_documents(
    batch: pa.Table, size: int = 200, stride: int = 150, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Fixed-window document chunking with overlap — the training-data
    staple (context-window packing): chunk c of a doc covers
    [c·stride, c·stride+size); n_chunks = 1 + max(0, ceil((len−size)/stride))
    (0 for empty docs), so chunks tile the doc with ``size−stride``
    overlap and the tail chunk may be short.

    Fully vectorized: one gather-index build over the batch's flat utf-8
    buffer (repeat + arange arithmetic), one fancy-index copy, offsets by
    cumsum — no per-row Python. Byte-based (ASCII-content assumption
    shared with the other byte kernels; DuckDB ``substr`` is char-based,
    equal on ASCII — see functions/tokenize.py note)."""
    from ..functions.tokenize import _as_large_string_array

    texts = _as_large_string_array(batch[text_col])
    n = len(texts)
    off, buf = _utf8_buffer_views(texts)
    base = int(off[0])
    lens = (off[1:] - off[:-1]).astype(np.int64)
    n_chunks = np.where(lens == 0, 0, 1 + np.maximum(0, (lens - size + stride - 1) // stride))
    total_chunks = int(n_chunks.sum())
    ids = batch[id_col]
    ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    if total_chunks == 0:
        return pa.table(
            {
                id_col: pa.array([], ids.type),
                "chunk_id": pa.array([], pa.int64()),
                "chunk": pa.array([], pa.large_string()),
            }
        )
    parent = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
    chunk_id = np.arange(total_chunks, dtype=np.int64) - np.repeat(
        np.cumsum(n_chunks) - n_chunks, n_chunks
    )
    doc_start = (off[:-1].astype(np.int64) - base)[parent]
    starts = doc_start + chunk_id * stride
    ends = np.minimum(starts + size, doc_start + lens[parent])
    clens = ends - starts
    out_total = int(clens.sum())
    # gather index: for every output byte, its input-buffer position
    cum = np.cumsum(clens) - clens
    gather = (np.arange(out_total, dtype=np.int64) - np.repeat(cum, clens)) + np.repeat(starts, clens)
    values = buf[gather]
    offsets = np.empty(total_chunks + 1, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(clens, out=offsets[1:])
    chunks = pa.Array.from_buffers(
        pa.large_string(), total_chunks, [None, pa.py_buffer(offsets), pa.py_buffer(values)]
    )
    return pa.table(
        {
            id_col: ids.take(pa.array(parent)),
            "chunk_id": pa.array(chunk_id, pa.int64()),
            "chunk": chunks,
        }
    )


# ------------------------------------------------- winnowing (rolling hash)

_WINNOW_BASE = np.uint64(1000003)
def _utf8_buffer_views(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, data-bytes) numpy views of a large_string Array,
    honoring a nonzero ``texts.offset`` — the offsets buffer is shared
    with the parent of a sliced array, so it must be indexed by the
    array offset exactly as ``functions/tokenize.py::token_stats`` does
    (pyarrow 16's combine_chunks copies today, but a bare sliced Array
    from a direct caller — or a zero-copy future pyarrow — must not
    silently fingerprint the wrong rows)."""
    n = len(texts)
    off = np.frombuffer(
        texts.buffers()[1], dtype=np.int64, count=texts.offset + n + 1
    )[texts.offset : texts.offset + n + 1]
    total = int(off[-1] - off[0])
    base = int(off[0])
    buf = (
        np.frombuffer(texts.buffers()[2], dtype=np.uint8, count=total, offset=base)
        if total
        else np.zeros(0, np.uint8)
    )
    return off, buf




def _kgram_hashes(buf: np.ndarray, k: int) -> np.ndarray:
    """Polynomial rolling hashes of every byte k-gram of ``buf`` (uint8),
    mod 2^61-1 — Horner form, k vectorized passes over the whole buffer,
    no sequential dependency, exact split-multiply arithmetic (reuses
    the minhash helpers; a plain uint64 multiply wraps mod 2^64 and
    breaks the hash family)."""
    from .dedup import _fold_p, _mulmod_p

    n = len(buf) - k + 1
    if n <= 0:
        return np.zeros(0, np.uint64)
    h = np.zeros(n, np.uint64)
    for j in range(k):
        h = _fold_p(_mulmod_p(h, _WINNOW_BASE) + buf[j : j + n].astype(np.uint64))
    return h


def winnow_doc_fps(hs: np.ndarray, w: int) -> np.ndarray:
    """Winnowing selection over one doc's k-gram hash sequence: the min
    of every w-window, deduplicated to the unique fingerprint set
    (Schleimer/Wilkerson/Aiken local fingerprinting — guarantees any
    shared run of >= w+k-1 bytes between two docs yields a shared
    fingerprint)."""
    m = len(hs)
    if m == 0:
        return np.zeros(0, np.uint64)
    if m <= w:
        return np.array([hs.min()], np.uint64)
    mins = np.lib.stride_tricks.sliding_window_view(hs, w).min(axis=1)
    return np.unique(mins)


def winnow_fp_rows(
    batch: pa.Table, text_col: str = "text", k: int = 8, w: int = 16, id_col: str = "doc_id"
) -> pa.Table:
    """Exploded (id, fp) winnowing fingerprint rows — the inverted-index
    feed for winnow-based near-dup pairing (same selection as
    :func:`winnow_fingerprints`)."""
    from ..functions.tokenize import _as_large_string_array

    texts = _as_large_string_array(batch[text_col])
    n = len(texts)
    off, buf = _utf8_buffer_views(texts)
    base = int(off[0])
    H = _kgram_hashes(buf, k)
    ids = batch[id_col]
    ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    counts = np.zeros(n, np.int64)
    parts: list[np.ndarray] = []
    for d in range(n):
        s, e = int(off[d] - base), int(off[d + 1] - base)
        m = e - s - k + 1
        if m <= 0:
            continue
        fps = winnow_doc_fps(H[s : s + m], w)
        counts[d] = len(fps)
        parts.append(fps)
    flat = np.concatenate(parts) if parts else np.zeros(0, np.uint64)
    parent = np.repeat(np.arange(n), counts)
    return pa.Table.from_arrays(
        [ids.take(pa.array(parent, pa.int64())), pa.array(flat.astype(np.int64))],
        names=[id_col, "fp"],
    )


def winnow_fingerprints(
    batch: pa.Table, text_col: str = "text", k: int = 8, w: int = 16
) -> pa.Table:
    """Rolling-hash document fingerprints (winnowing): one vectorized
    k-gram hash pass over the batch's flat utf-8 buffer, then a per-doc
    window-min selection (doc slices are small; the heavy work is the
    global pass). Output per doc: fingerprint-set size, min and xor —
    a compact content digest stable under batch boundaries.

    Reference parity: the upstream fingerprinted page content for clone
    detection (SURVEY §2 O11) with a whole-page hash; winnowing is the
    local form that also survives partial edits — the named
    rolling-hash fingerprint of the training-data operator family."""
    from ..functions.tokenize import _as_large_string_array

    texts = _as_large_string_array(batch[text_col])
    n = len(texts)
    off, buf = _utf8_buffer_views(texts)
    base = int(off[0])
    H = _kgram_hashes(buf, k)
    n_fps = np.zeros(n, np.int64)
    fp_min = np.zeros(n, np.uint64)
    fp_xor = np.zeros(n, np.uint64)
    for d in range(n):
        s, e = int(off[d] - base), int(off[d + 1] - base)
        m = e - s - k + 1
        if m <= 0:
            continue
        fps = winnow_doc_fps(H[s : s + m], w)
        n_fps[d] = len(fps)
        fp_min[d] = fps.min()
        fp_xor[d] = np.bitwise_xor.reduce(fps)
    return batch.append_column("n_fps", pa.array(n_fps)).append_column(
        "fp_min", pa.array(fp_min.astype(np.int64))
    ).append_column("fp_xor", pa.array(fp_xor.astype(np.int64)))

