"""BPE training/encoding correctness: exact equality against an
independent naive reference implementation (written from the Sennrich
et al. algorithm statement, not from stages/bpe.py), plus structural
invariants. This is the correctness gate for the two rows-only
bpe_* queries (no SQL twin is possible for an iterative merge loop)."""

import collections
import random

import pyarrow as pa
import pytest

from freshonions_torscraper_ray.stages import bpe


# ---- independent reference (kept deliberately naive and separate) ----

def ref_train(word_counts, num_merges, min_pair_count=2):
    vocab = {tuple(w) + (bpe.END,): c for w, c in word_counts.items() if w}
    out = []
    for _ in range(num_merges):
        stats = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        top = max(stats.values())
        if top < min_pair_count:
            break
        pair = min(p for p in stats if stats[p] == top)
        out.append(pair)
        new_vocab = {}
        for syms, c in vocab.items():
            merged = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    merged.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_vocab[tuple(merged)] = c
        vocab = new_vocab
    return out


def ref_encode(word, merges):
    syms = list(word) + [bpe.END]
    for a, b in merges:  # apply merges strictly in rank order
        i = 0
        out = []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


# ---- tests ----

def test_train_matches_reference_planted():
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    got = bpe.train_bpe(wc, num_merges=10)
    assert got == ref_train(wc, 10)
    # the classic corpus learns the 'est</w>' family
    joined = {a + b for a, b in got}
    assert any("est" in m for m in joined)


@pytest.mark.parametrize("seed", [1, 9])
def test_train_matches_reference_random(seed):
    rng = random.Random(seed)
    alphabet = "abcdef"
    wc = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))): rng.randint(1, 20)
        for _ in range(60)
    }
    assert bpe.train_bpe(wc, num_merges=30) == ref_train(wc, 30)


def test_train_insertion_order_invariant():
    wc = {"aab": 3, "abb": 2, "bba": 4, "ba": 7}
    rev = dict(reversed(list(wc.items())))
    assert bpe.train_bpe(wc, 15) == bpe.train_bpe(rev, 15)


def test_encode_reconstructs_and_matches_rank_order_rule():
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe.train_bpe(wc, num_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in list(wc) + ["lowest", "newer", "zzz"]:
        pieces = bpe.encode_word(w, ranks)
        assert "".join(pieces) == w + bpe.END
        # lowest-rank-first inference == rank-ordered full application
        assert pieces == ref_encode(w, merges)


def test_encode_stats_batch(ray_session):
    import ray

    wc = {"low": 5, "newest": 6}
    merges = bpe.train_bpe(wc, num_merges=8)
    ranks = {p: i for i, p in enumerate(merges)}
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["low newest low", "", "Newest unseen"], pa.string()),
        }
    )
    enc = bpe.BPEEncodeStats(ray.put(merges))
    out = enc(docs).to_pydict()
    assert out["n_words"] == [3, 0, 2]
    exp = {
        w: len(bpe.encode_word(w, ranks)) for w in ["low", "newest", "unseen"]
    }
    assert out["n_pieces"] == [
        2 * exp["low"] + exp["newest"],
        0,
        exp["newest"] + exp["unseen"],  # lowercased fold
    ]
