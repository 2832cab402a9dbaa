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


def quality_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality heuristics: token count, stopword ratio, mean token length.

    Mirrors the shape of classic corpus-quality filters (Gopher-style
    length/stopword rules) with a deterministic, oracle-checkable core.
    """
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    word_re = re.compile(WORD_PATTERN)
    stop = set(STOPWORDS)
    n_tok = np.empty(len(texts), dtype=np.int64)
    n_stop = np.empty(len(texts), dtype=np.int64)
    mean_len = np.empty(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        toks = word_re.findall(t)
        n_tok[i] = len(toks)
        n_stop[i] = sum(1 for w in toks if w in stop)
        mean_len[i] = sum(map(len, toks)) / len(toks) if toks else 0.0
    mean_len = round_half_away(mean_len, 4)
    ratio = round_half_away(np.where(n_tok > 0, n_stop / np.maximum(n_tok, 1), 0.0), 4)
    out = batch.append_column("n_tokens", pa.array(n_tok))
    out = out.append_column("stop_ratio", pa.array(ratio))
    return out.append_column("mean_token_len", pa.array(mean_len))


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

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_numpy(zero_copy_only=False)
        out = []
        for t in texts:
            tl = t.lower()
            tris = {tl[i : i + 3] for i in range(max(len(tl) - 2, 0))}
            best, best_n = "und", 0
            for lang in sorted(self.profiles):
                n = len(tris & self.profiles[lang])
                if n > best_n:
                    best, best_n = lang, n
            out.append(best)
        return batch.append_column("pred_lang", pa.array(out, pa.string()))


def extract_pattern_rows(
    batch: pa.Table, pattern: str, text_col: str = "text", id_col: str = "doc_id", out_col: str = "token"
) -> pa.Table:
    """Find-all + explode: one output row per regex match per document
    (document order). The explode core behind the email/btc/onion
    extraction queries (O3/O5/O6) over flat text."""
    creg = re.compile(pattern)
    ids = batch[id_col]
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    out_ids, out_tok = [], []
    id_np = ids.to_numpy(zero_copy_only=False)
    for i, t in enumerate(texts):
        for m in creg.findall(t):
            out_ids.append(id_np[i])
            out_tok.append(m)
    return pa.Table.from_arrays(
        [pa.array(out_ids, type=ids.type if not isinstance(ids, pa.ChunkedArray) else ids.type), pa.array(out_tok, pa.string())],
        names=[id_col, out_col],
    )
