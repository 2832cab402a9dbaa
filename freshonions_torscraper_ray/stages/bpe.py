"""Byte-pair-encoding tokenizer training + corpus encoding.

The tokenizer-training step of a large-scale data pipeline, done the
way SentencePiece / HuggingFace tokenizers actually train at corpus
scale: the CORPUS-sized work is one distributed word-frequency pass
(the existing per-batch ``token_partial_counts`` combiner → one tiny
token-keyed groupby-sum); the merge loop itself then runs on the
VOCABULARY-sized (word, count) table — at 100 TB the vocabulary is
MB-scale while the corpus is not, so training never touches the corpus
again. Encoding is a second embarrassingly-parallel pass with the
learned merge ranks broadcast once and a per-actor word→pieces cache
(the HF tokenizers design: every distinct word is encoded once per
actor, repeats are cache hits).

Determinism: merge selection breaks count ties by lexicographically
smallest (left, right) pair, so the merge list is a pure function of
the word-count table — reproducible across runs, shard counts, and
parallelism. No SQL twin is possible (the merge loop is iterative with
data-dependent selection — not ANSI-SQL-expressible), so correctness
is pinned by exact-equality pytest against an independent naive
reference implementation (tests/test_bpe.py) plus invariants
(piece concatenation reconstructs every word).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

END = "</w>"  # end-of-word marker (the classic Sennrich et al. setup)


def train_bpe(word_counts: dict[str, int], num_merges: int = 50,
              min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a (word -> count) table.

    Vocabulary-sized work only: O(num_merges × total symbols across
    distinct words). Ties on pair count break to the lexicographically
    smallest (left, right) pair; training stops early when the best
    pair drops below ``min_pair_count``.
    """
    seqs: dict[str, list[str]] = {w: list(w) + [END] for w in word_counts if w}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in seqs.items():
            c = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best_count = max(pairs.values())
        if best_count < min_pair_count:
            break
        best = min(p for p, c in pairs.items() if c == best_count)
        merges.append(best)
        a, b = best
        ab = a + b
        for w, syms in seqs.items():
            if a not in syms:
                continue
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with the learned merges: repeatedly apply the
    LOWEST-rank merge present (the standard BPE inference rule)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BPEEncodeStats:
    """Actor-pool stage: per-document BPE piece counts under broadcast
    merge ranks (``ray.put`` once; the rank dict is merge-table-sized).
    Per batch: one DuckDB tokenize kernel → np.unique over the batch's
    words → each DISTINCT word encoded once against the per-actor cache
    → per-doc piece totals by vectorized bincount. Output:
    (doc_id, n_words, n_pieces)."""

    def __init__(self, merges_ref, id_col: str = "doc_id", text_col: str = "text"):
        import ray

        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) else merges_ref
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.cache: dict[str, int] = {}
        self.id_col = id_col
        self.text_col = text_col

    CACHE_CAP = 1 << 20  # bound per-actor memory on unbounded vocabularies

    def _pieces_len(self, word: str) -> int:
        n = self.cache.get(word)
        if n is None:
            n = len(encode_word(word, self.ranks))
            if len(self.cache) < self.CACHE_CAP:
                self.cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .corpus import ordered_token_rows

        n = batch.num_rows
        # tokenize against an ORDINAL key so the exploded rows map back
        # to batch positions without any per-row id lookup
        ord_tbl = pa.table(
            {
                "o": pa.array(np.arange(n, dtype=np.int64)),
                "t": batch[self.text_col],
            }
        )
        rows = ordered_token_rows(ord_tbl, "o", "t")
        toks = rows["tok"].to_numpy(zero_copy_only=False)
        doc_idx = rows["o"].to_numpy(zero_copy_only=False)
        if len(toks):
            uniq, inv = np.unique(toks, return_inverse=True)
        else:
            uniq, inv = np.array([], dtype=object), np.array([], dtype=np.int64)
        # distinct words only — per-actor cache makes repeats O(1)
        plens = np.array([self._pieces_len(w) for w in uniq], dtype=np.int64)
        n_words = np.bincount(doc_idx, minlength=n).astype(np.int64)
        # |pieces| per word is tiny, totals < 2^53: float accumulation exact
        n_pieces = np.bincount(
            doc_idx, weights=plens[inv].astype(np.float64), minlength=n
        ).astype(np.int64)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_words": pa.array(n_words),
                "n_pieces": pa.array(n_pieces),
            }
        )
