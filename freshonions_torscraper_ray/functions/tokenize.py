"""Byte-level vectorized tokenizer + token-hash kernel.

The engine's tokenizer is RE2 ``WORD_PATTERN`` (``[A-Za-z0-9_]+``).
Every word char is ASCII and UTF-8 continuation bytes are ``>= 0x80``,
so a 256-entry byte lookup table reproduces the code-point semantics
exactly on any valid UTF-8 input — one numpy pass over the Arrow
string column's data buffer replaces a per-batch
``regexp_extract_all`` that materialized every token string
(measured: the materialization was the single largest cost of the
fused enrich kernel, ~2.1 s / 16 k docs).

``token_stats`` returns, per doc: token count, word-char count,
stopword count — integer-identical to the RE2 count-kernel forms in
``stages/textstats.py`` (same oracle-checked quality formulas) — plus
the flattened per-token uint64 hashes in doc-major order.

ASCII case-fold caveat: lowering happens per BYTE (A-Z only). A code
point whose Unicode lowercase maps INTO the ASCII word class (e.g.
U+212A KELVIN SIGN → 'k') stays a non-word byte here but becomes a
word char under SQL ``lower(text)`` — so oracle twins that tokenize
``lower(text)`` agree with these kernels only on ASCII content (true
of the synth fixtures; see stages/text_index.py note).

Token-hash family: polynomial accumulate over the ASCII-lowered token
bytes + a splitmix64 finalizer. Engine-internal only (simhash bits,
shingle identities — never compared against a fixed external value),
so the family is free to choose for vectorizability; the previous
DuckDB ``hash(lower(token))`` family made the same claim
(stages/dedup.py:token_hash_lists) and the swap is the round-3
enrich-throughput item from VERDICT.md.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_ISWORD = np.zeros(256, dtype=bool)
for _c in b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_":
    _ISWORD[_c] = True
_TOLOWER = np.arange(256, dtype=np.uint8)
_TOLOWER[ord("A") : ord("Z") + 1] += 32
# fused lut: lowered byte for word chars, 0 for everything else — one
# 256-entry gather yields both the word mask (!= 0) and the hash input
_LOWER_OR_0 = np.where(_ISWORD, _TOLOWER, np.uint8(0))

_B = np.uint64(0x9E3779B97F4A7C15)  # odd multiplier (2^64 / golden ratio)
_LEN_CAP = 32  # per-length hashing path cap; longer tokens take the fallback


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized — turns the structured
    polynomial accumulator into avalanche-quality bits (simhash voting
    needs each of the 64 bits ~uniform per token)."""
    h = h ^ (h >> np.uint64(30))
    h = h * np.uint64(0xBF58476D1CE4E5B9)
    h = h ^ (h >> np.uint64(27))
    h = h * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def _as_large_string_array(texts) -> pa.Array:
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), pa.large_string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
        if isinstance(texts, pa.ChunkedArray):  # combine keeps the type
            texts = texts.chunk(0) if texts.num_chunks else pa.array([], texts.type)
    texts = pc.fill_null(texts, "")
    if texts.type != pa.large_string():
        texts = texts.cast(pa.large_string())
    return texts


class TokenStats:
    """Result of one kernel pass (doc-major everywhere)."""

    __slots__ = ("n_tok", "n_chars", "n_stop", "hashes")

    def __init__(self, n_tok, n_chars, n_stop, hashes):
        self.n_tok = n_tok  # int64[n_docs] — == RE2 WORD_PATTERN match count
        self.n_chars = n_chars  # int64[n_docs] — == RE2 [A-Za-z0-9_] match count
        self.n_stop = n_stop  # int64[n_docs] — == RE2 \b(?:the|a)\b match count
        self.hashes = hashes  # uint64[sum(n_tok)] — per-token hash, doc-major


_STOP3 = tuple(b"the")
_STOP1 = ord("a")


def token_stats(texts, with_hashes: bool = True) -> TokenStats:
    """One vectorized pass over the concatenated UTF-8 buffer.

    Token boundaries are computed on the byte-level word mask with runs
    explicitly broken at document boundaries (a doc ending in a word
    char followed by one starting in a word char must stay two tokens).
    """
    arr = _as_large_string_array(texts)
    n = len(arr)
    zeros = np.zeros(n, dtype=np.int64)
    if n == 0:
        return TokenStats(zeros, zeros.copy(), zeros.copy(), np.zeros(0, np.uint64))
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    if off[-1] == off[0]:
        return TokenStats(zeros, zeros.copy(), zeros.copy(), np.zeros(0, np.uint64))
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    base = off[0]
    buf = data[base : off[-1]]
    off = (off - base).copy()

    lbuf = _LOWER_OR_0[buf]  # lowered word bytes, 0 elsewhere
    isw = lbuf != 0
    # starts: word char with no word char before it; ends: word char
    # with no word char after it — with doc boundaries forced non-word
    # on the relevant side so runs never span documents
    prev = np.empty_like(isw)
    prev[0] = False
    prev[1:] = isw[:-1]
    nxt = np.empty_like(isw)
    nxt[-1] = False
    nxt[:-1] = isw[1:]
    inner = off[1:-1]
    inner = inner[(inner > 0) & (inner < len(buf))]
    prev[inner] = False
    nxt[inner - 1] = False
    S = np.flatnonzero(isw & ~prev)
    E = np.flatnonzero(isw & ~nxt)
    lens = E - S + 1

    n_tok = np.diff(np.searchsorted(S, off))
    if not len(S):
        return TokenStats(n_tok, zeros.copy(), zeros.copy(), np.zeros(0, np.uint64))
    tok_doc = np.repeat(np.arange(n, dtype=np.int64), n_tok)
    # n_chars = Σ token length per doc == the RE2 single-word-char match
    # count (every token char counted exactly once); bincount weights
    # are float64 but lens < 2^53 so the cast back is exact
    n_chars = np.bincount(tok_doc, weights=lens, minlength=n).astype(np.int64)

    # stopword counts on the len==3 / len==1 token SUBSETS only (full-
    # width clamped gathers over every token measured 3× the cost);
    # S+1/S+2 stay in range because S+2 <= E < len(buf) when len == 3
    i3 = np.flatnonzero(lens == 3)
    S3 = S[i3]
    m3 = (buf[S3] == _STOP3[0]) & (buf[S3 + 1] == _STOP3[1]) & (buf[S3 + 2] == _STOP3[2])
    i1 = np.flatnonzero(lens == 1)
    m1 = buf[S[i1]] == _STOP1
    if m3.any() or m1.any():
        hits = np.concatenate([i3[m3], i1[m1]])
        n_stop = np.bincount(tok_doc[hits], minlength=n).astype(np.int64)
    else:
        n_stop = zeros.copy()

    if not with_hashes:
        return TokenStats(n_tok, n_chars, n_stop, np.zeros(0, np.uint64))

    # per-length compact hashing: tokens of one exact length hash
    # together on contiguous temporaries (L gathers, L fused
    # multiply-adds), then scatter once — no per-iteration fancy-indexed
    # read-modify-write of the output array. Total gather work is
    # sum(lens), the inherent byte count.
    h = np.empty(len(S), dtype=np.uint64)
    max_len = int(lens.max())
    for L in range(1, min(max_len, _LEN_CAP) + 1):
        tl = np.flatnonzero(lens == L)
        if not tl.size:
            continue
        sl = S[tl]
        hl = lbuf[sl].astype(np.uint64)
        for k in range(1, L):
            hl *= _B
            hl += lbuf[sl + k]
        h[tl] = _mix64(hl)
    if max_len > _LEN_CAP:
        # rare very-long tokens: shrinking-active-set Horner (compact
        # temporaries, one scatter at the end) — avoids max_len
        # full-width == scans in the per-length path above
        act = np.flatnonzero(lens > _LEN_CAP)
        sl, ll = S[act], lens[act]
        hl = lbuf[sl].astype(np.uint64)
        k = 1
        while act.size:
            hl *= _B
            hl += lbuf[sl + k]
            k += 1
            alive = ll > k
            if not alive.all():
                done = ~alive
                h[act[done]] = _mix64(hl[done])
                act, sl, ll, hl = act[alive], sl[alive], ll[alive], hl[alive]
    return TokenStats(n_tok, n_chars, n_stop, h)


def token_hash_lists_np(texts) -> tuple[np.ndarray, np.ndarray]:
    """(per-doc token counts, flattened uint64 token hashes) — the
    drop-in signature of ``stages.dedup.token_hash_lists``."""
    st = token_stats(texts)
    return st.n_tok, st.hashes


def term_hash64(term: str) -> int:
    """uint64 hash of one query term under the engine token family.

    ``term`` must itself be a single word token (the search surface's
    contract); raises otherwise so a typo'd multi-word query fails
    loudly instead of silently hashing its first token.
    """
    st = token_stats(pa.array([term], pa.large_string()))
    if int(st.n_tok[0]) != 1 or int(st.n_chars[0]) != len(term):
        raise ValueError(f"not a single word token: {term!r}")
    return int(st.hashes[0])
