"""Dedup family: minhash/simhash correctness properties + exact dedup."""

import numpy as np
import pyarrow as pa
import pytest

from freshonions_torscraper_ray.stages import dedup as dd


def test_minhash_similar_docs_agree():
    m = dd.MinHasher()
    base = "the quick brown fox jumps over the lazy dog " * 20
    near = base.replace("lazy", "sleepy", 3)
    far = "completely different content with other words " * 20
    s1, s2, s3 = m.signature(base), m.signature(near), m.signature(far)
    assert (s1 == s2).mean() > 0.5
    assert (s1 == s3).mean() < 0.2


def test_minhash_estimates_jaccard():
    m = dd.MinHasher(dd.MinHashParams(num_perms=128, num_bands=16))
    a = " ".join(f"w{i}" for i in range(100))
    b = " ".join(f"w{i}" for i in range(50, 150))
    sa, sb = m.signature(a), m.signature(b)
    est = (sa == sb).mean()
    ja = dd.shingle_hashes(a, 3)
    jb = dd.shingle_hashes(b, 3)
    true_j = np.intersect1d(ja, jb).size / np.union1d(ja, jb).size
    assert abs(est - true_j) < 0.15


def test_simhash_hamming_tracks_similarity():
    base = "alpha beta gamma delta epsilon zeta eta theta " * 10
    near = base.replace("zeta", "zzzz", 2)
    far = "one two three four five six seven eight nine ten " * 10
    h1, h2, h3 = dd.simhash64(base), dd.simhash64(near), dd.simhash64(far)
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(h1, h2) < ham(h1, h3)
    assert ham(h1, h2) <= 12


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_finds_planted_dups():
    import ray.data as rd

    base = " ".join(f"tok{i}" for i in range(200))
    rows = [{"doc_id": 0, "text": base}, {"doc_id": 1, "text": base + " tail"}] + [
        {"doc_id": i, "text": " ".join(f"w{i}_{j}" for j in range(100))} for i in range(2, 30)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    pairs = dd.minhash_candidate_pairs(ds).to_pandas()
    assert ((pairs["doc_a"] == 0) & (pairs["doc_b"] == 1) & (pairs["est_jaccard"] > 0.8)).any()


def test_mulmod_matches_python_ints():
    """The split-multiply universal hash must equal exact Python-int
    (a*x+b) mod (2^61-1) — no uint64 wrap (round-1 ADVICE fix)."""
    rng = np.random.RandomState(7)
    P = (1 << 61) - 1
    a = rng.randint(1, P, size=50, dtype=np.uint64)
    x = rng.randint(0, np.iinfo(np.uint64).max, size=50, dtype=np.uint64)
    got = dd._fold_p(dd._mulmod_p(a, dd._fold_p(x)))
    want = np.array([(int(ai) * (int(xi) % P)) % P for ai, xi in zip(a, x)], dtype=np.uint64)
    assert (got == want).all()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("broadcast_threshold", [20_000, 0], ids=["broadcast", "shuffle-join"])
def test_minhash_verified_pairs_match_brute_force(broadcast_threshold):
    """Planted high-similarity corpus: BOTH verify arms (broadcast join
    of the candidate-filtered texts; distributed shuffle join) must find
    exactly the brute-force Jaccard≥0.8 pairs, with the same
    exact-Jaccard values — and no whole-corpus broadcast anywhere."""
    import itertools

    import ray.data as rd

    rng = np.random.RandomState(3)
    docs = []
    for g in range(6):  # 6 groups of 3 near-identical docs
        base = " ".join(f"g{g}tok{i}" for i in range(150))
        for v in range(3):
            words = base.split()
            # perturb ≤2 words → Jaccard stays ≥0.9
            for _ in range(v):
                words[int(rng.randint(0, len(words)))] = f"alt{g}{v}"
            docs.append({"doc_id": g * 3 + v, "text": " ".join(words)})
    for i in range(18, 40):  # unrelated fillers
        docs.append({"doc_id": i, "text": " ".join(f"solo{i}w{j}" for j in range(80))})

    # brute force truth
    sh = {d["doc_id"]: dd.shingle_hashes(d["text"], 3) for d in docs}
    truth = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        sa, sb = sh[a], sh[b]
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        j = inter / (sa.size + sb.size - inter)
        if j >= 0.8:
            truth[(a, b)] = round(j, 4)
    assert len(truth) >= 6  # the planted groups are found by brute force

    ds = rd.from_arrow(pa.Table.from_pylist(docs))
    pairs = dd.minhash_candidate_pairs(ds)
    out = dd.verify_pairs_distributed(
        pairs, ds, broadcast_threshold=broadcast_threshold
    ).to_pandas()
    got = {
        (int(r.doc_a), int(r.doc_b)): float(r.jaccard)
        for r in out.itertuples()
        if r.jaccard >= 0.8
    }
    assert got == truth


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_keeps_first_by_order():
    import ray.data as rd

    rows = [
        {"k": "a", "v": 2},
        {"k": "a", "v": 1},
        {"k": "b", "v": 9},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = dd.exact_dedup(ds, "k", "v").to_pandas().sort_values("k")
    assert out["v"].tolist() == [1, 9]


@pytest.mark.usefixtures("ray_session")
def test_pair_output_invariant_to_partition_fanout():
    """The coarse-partition fan-out (round-2 VERDICT fix: was hardcoded
    64) is pure execution config — simhash AND minhash pair sets must be
    identical at any power-of-two num_parts."""
    import ray.data as rd

    rng = np.random.RandomState(5)
    docs = []
    for g in range(5):
        base = " ".join(f"p{g}tok{i}" for i in range(120))
        for v in range(3):
            words = base.split()
            for _ in range(v):
                words[int(rng.randint(0, len(words)))] = f"alt{g}{v}"
            docs.append({"doc_id": g * 3 + v, "text": " ".join(words)})
    ds = rd.from_arrow(pa.Table.from_pylist(docs))

    def sim_pairs(num_parts):
        out = dd.simhash_near_dups(ds, max_hamming=6, num_parts=num_parts).to_pandas()
        return sorted(map(tuple, out[["doc_a", "doc_b", "hamming"]].itertuples(index=False)))

    def mh_pairs(num_parts):
        out = dd.minhash_candidate_pairs(ds, dd.MinHashParams(num_parts=num_parts)).to_pandas()
        return sorted(map(tuple, out[["doc_a", "doc_b", "est_jaccard"]].itertuples(index=False)))

    ref = sim_pairs(64)
    assert len(ref) >= 5
    assert sim_pairs(4) == ref
    assert sim_pairs(1024) == ref
    mref = mh_pairs(64)
    assert len(mref) >= 5
    assert mh_pairs(4) == mref
    assert mh_pairs(512) == mref
    with pytest.raises(ValueError):
        dd.simhash_near_dups(ds, num_parts=48)


@pytest.mark.usefixtures("ray_session")
def test_jaccard_near_dups_match_brute_force():
    """n-gram Jaccard near-dups vs an independent string-shingle brute
    force: same pairs, same n_shared (eligible shared shingles), same
    RAW double jaccard — and output invariant to the partition fan-out."""
    import itertools
    import re

    import ray.data as rd

    rng = np.random.RandomState(11)
    docs = []
    for g in range(5):
        base = " ".join(f"j{g}tok{i}" for i in range(100))
        for v in range(3):
            words = base.split()
            for _ in range(v * 2):
                words[int(rng.randint(0, len(words)))] = f"alt{g}{v}{rng.randint(9)}"
            docs.append({"doc_id": g * 3 + v, "text": " ".join(words)})
    for i in range(15, 30):
        docs.append({"doc_id": i, "text": " ".join(f"solo{i}w{j}" for j in range(60))})
    docs.append({"doc_id": 30, "text": "tiny doc"})  # < k tokens: no shingles

    k, thr, max_df = 3, 0.5, 50

    # independent truth: STRING shingle sets (the oracle-SQL semantics)
    def shingles(text):
        w = re.findall(r"[a-z0-9_]+", text.lower())
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    sh = {d["doc_id"]: shingles(d["text"]) for d in docs}
    df: dict = {}
    for s in sh.values():
        for x in s:
            df[x] = df.get(x, 0) + 1
    elig = {x for x, n in df.items() if 2 <= n <= max_df}
    truth = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        shared = sh[a] & sh[b] & elig
        if not shared:
            continue
        j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
        if j >= thr:
            truth[(a, b)] = (len(shared), j)
    assert len(truth) >= 10  # planted groups all pair up

    ds = rd.from_arrow(pa.Table.from_pylist(docs))
    for num_parts in (4, 64):
        out = dd.jaccard_near_dups(ds, k=k, threshold=thr, max_df=max_df, num_parts=num_parts).to_pandas()
        got = {
            (int(r.doc_a), int(r.doc_b)): (int(r.n_shared), float(r.jaccard))
            for r in out.itertuples()
        }
        assert got == truth  # exact — raw doubles compare bit-for-bit
