"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference deduplicated only by DB unique keys (url/host/address —
SURVEY.md §2.5 O22–O24) and detected clones by exact normalized-frontpage
hash (O25). A training-data engine needs the near-dup family too; each
operator here is a composition of ``map_batches`` (vectorized sketching)
+ ``groupby`` (bucket shuffle) + ``map_groups`` (within-bucket pairing),
so the only all-to-all exchange is over the *small* sketch rows, never
the documents themselves.

Scale notes (10^10 rows): bucket keys are (band_id, band_hash) — the
shuffle moves ~64 B/doc/band; within-bucket pairing is quadratic per
bucket but bucket sizes are bounded by hash spread; verification re-reads
text only for candidate pairs (broadcast at test scale, hash-join at
cluster scale).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64
from ..functions.regexes import WORD_PATTERN
from ..functions.rounding import round_half_away

_MERSENNE = (1 << 61) - 1
_P64 = np.uint64(_MERSENNE)
_MASK31 = np.uint64(0x7FFFFFFF)
_MASK30 = np.uint64(0x3FFFFFFF)


def _fold_p(v: np.ndarray) -> np.ndarray:
    """Reduce uint64 values < 2^63-ish mod 2^61-1 (2^61 ≡ 1 mod P)."""
    v = (v >> np.uint64(61)) + (v & _P64)
    return np.where(v >= _P64, v - _P64, v)


def _mulmod_p(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a*x) mod (2^61-1) without 64-bit wrap, vectorized uint64.

    Both operands must already be < 2^61. Splits each into 31/30-bit
    halves so every partial product fits in 64 bits; 2^61 ≡ 1 (mod P)
    collapses the shifted terms. This is the exact universal hash family
    (a·x+b mod P) — a plain ``a*x`` in uint64 wraps mod 2^64 first and
    breaks min-wise independence (round-1 ADVICE fix).
    """
    a_hi, a_lo = a >> np.uint64(31), a & _MASK31
    x_hi, x_lo = x >> np.uint64(31), x & _MASK31
    # a*x = a_hi*x_hi*2^62 + (a_hi*x_lo + a_lo*x_hi)*2^31 + a_lo*x_lo
    t1 = (a_hi * x_hi) * np.uint64(2)  # 2^62 ≡ 2 (mod P); < 2^61 so < P+1
    t1 = np.where(t1 >= _P64, t1 - _P64, t1)
    c = _fold_p(a_hi * x_lo + a_lo * x_hi)
    t2 = _fold_p((c >> np.uint64(30)) + ((c & _MASK30) << np.uint64(31)))
    t3 = _fold_p(a_lo * x_lo)
    return t1 + t2 + t3  # each < P; caller folds after adding b


@dataclass(frozen=True)
class MinHashParams:
    num_perms: int = 64
    # 16 bands × 4 rows: LSH threshold (1/B)^(1/r) ≈ 0.5, so recall at
    # the 0.8 near-dup band is structural (miss prob ~3e-7 at j=0.885),
    # not hash-family luck — 8×8 (t≈0.77) left ~2% per-pair miss odds
    # there, which round-4's family swap actually hit
    num_bands: int = 16  # rows per band = num_perms // num_bands
    shingle_k: int = 3
    seed: int = 42
    # coarse-partition fan-out for the bucket shuffle: each partition is
    # one map_groups pandas frame holding ~(corpus·bands)/num_parts sketch
    # rows, so SIZE THIS WITH THE CORPUS (power of two; output-invariant —
    # a (band_id, band_hash) bucket never straddles partitions)
    num_parts: int = 64

    @property
    def rows_per_band(self) -> int:
        return self.num_perms // self.num_bands


def _part_mask(num_parts: int) -> int:
    if num_parts < 1 or num_parts & (num_parts - 1):
        raise ValueError(f"num_parts must be a power of two, got {num_parts}")
    return num_parts - 1


def _perm_coeffs(p: MinHashParams) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(p.seed)
    a = rng.randint(1, _MERSENNE, size=p.num_perms, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=p.num_perms, dtype=np.uint64)
    return a, b


# Worker-global token-hash cache: corpora vocabularies are Zipfian, so
# hashing each distinct token once (blake2b) and mixing cached hashes
# into shingles (vectorized uint64 arithmetic) cuts sketching cost by the
# token repetition factor. Bounded to keep worker heaps sane.
_TOKEN_CACHE: dict[str, int] = {}
_TOKEN_CACHE_MAX = 1_000_000
_MIX = (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F), np.uint64(0x165667B19E3779F9), np.uint64(0x27D4EB2F165667C5))


def _token_hash_array(toks: list[str]) -> np.ndarray:
    tc = _TOKEN_CACHE
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = tc.get(t)
        if h is None:
            if len(tc) >= _TOKEN_CACHE_MAX:
                tc.clear()
            h = tc[t] = hash64(t)
        out[i] = h
    return out


def shingle_hash_sets(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Batched word-k-gram shingle SETS: (per-doc distinct-shingle
    counts, doc-major flattened sorted-unique uint64 shingle hashes).

    Token hash = the byte-level poly+splitmix64 kernel
    (``functions/tokenize.py`` — the same family the simhash path uses,
    replayed bit-for-bit by the dedup_simhash/dedup_minhash SQL twins);
    shingle hash = the fixed ``_MIX``-constant Horner mix of the k token
    hashes (wrapping uint64), all windows of the whole batch in one
    numpy expression. Docs with 0 < n_tokens < k keep the PARTIAL
    shingle (one mix over all their tokens) — sketching never drops a
    non-empty doc (unlike JaccardShingler, whose SQL-window semantics
    require ≥ k tokens)."""
    dl, flat = token_hash_lists(texts)
    n_docs = len(dl)
    if flat.size == 0:
        return np.zeros(n_docs, dtype=np.int64), np.empty(0, dtype=np.uint64)
    if flat.size >= k:
        m = flat.size - k + 1
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            acc = acc * _MIX[j % 4] + flat[j : j + m]
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), dl)
        valid = doc_idx[:m] == doc_idx[k - 1 :]
        sh, d = acc[valid], doc_idx[:m][valid]
    else:
        sh = np.empty(0, dtype=np.uint64)
        d = np.empty(0, dtype=np.int64)
    short = np.flatnonzero((dl > 0) & (dl < k))
    if short.size:
        offs = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(dl, out=offs[1:])
        extra = np.empty(short.size, dtype=np.uint64)
        for out_i, i in enumerate(short):  # rare: only sub-k-token docs
            acc1 = np.uint64(0)
            for j in range(offs[i], offs[i + 1]):
                acc1 = acc1 * _MIX[(j - offs[i]) % 4] + flat[j]
            extra[out_i] = acc1
        sh = np.concatenate([sh, extra])
        d = np.concatenate([d, short])
    order = np.lexsort((sh, d))
    sh, d = sh[order], d[order]
    keep = np.ones(sh.size, dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (sh[1:] != sh[:-1])
    sh, d = sh[keep], d[keep]
    return np.bincount(d, minlength=n_docs).astype(np.int64), sh


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """Word k-gram shingle set as uint64 hashes (sorted unique) — scalar
    twin of ``shingle_hash_sets`` (delegates, so they can never
    diverge)."""
    _, sh = shingle_hash_sets([text], k)
    return sh


class MinHasher:
    """Actor-pool stage: text → MinHash signature → one row per LSH band.

    ``__init__`` builds the permutation coefficients once per actor;
    ``__call__`` sketches a batch and *explodes* it to
    (doc_id, band_id, band_hash, sig) rows ready for the bucket groupby.
    """

    # shingle-hash chunk bound for the batched path — small enough that
    # the (num_perms × chunk) temporaries stay cache-resident (measured:
    # 2k ≈ 4k ≪ 16k shingles/chunk on this box)
    _CHUNK = 2_048

    def __init__(self, params: MinHashParams = MinHashParams(), id_col: str = "doc_id", text_col: str = "text"):
        self.p = params
        self.a, self.b = _perm_coeffs(params)
        # pre-split coefficients for the exact split-multiply hash
        self.a_hi = (self.a >> np.uint64(31))[:, None]
        self.a_lo = (self.a & _MASK31)[:, None]
        self.b_col = self.b[:, None]
        self.id_col, self.text_col = id_col, text_col

    def _hash_block(self, x: np.ndarray) -> np.ndarray:
        """(num_perms, len(x)) exact (a·x+b) mod 2^61-1 for folded x."""
        x = x[None, :]
        x_hi, x_lo = x >> np.uint64(31), x & _MASK31
        t1 = (self.a_hi * x_hi) * np.uint64(2)
        t1 = np.where(t1 >= _P64, t1 - _P64, t1)
        c = _fold_p(self.a_hi * x_lo + self.a_lo * x_hi)
        t2 = _fold_p((c >> np.uint64(30)) + ((c & _MASK30) << np.uint64(31)))
        t3 = _fold_p(self.a_lo * x_lo)
        return _fold_p(t1 + t2 + t3 + self.b_col)

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, num_perms) signature matrix, batched: shingles of many
        docs are hashed in ONE numpy expression per ~50k-shingle chunk and
        per-doc minima come from ``minimum.reduceat`` — numpy dispatch
        cost is per-chunk, not per-doc (the sketching hot path)."""
        lens, flat_sh = shingle_hash_sets(texts, self.p.shingle_k)
        shs = np.split(flat_sh, np.cumsum(lens)[:-1])
        out = np.full((len(texts), self.p.num_perms), np.uint64(_MERSENNE), dtype=np.uint64)
        nonempty = np.flatnonzero(lens)
        if nonempty.size == 0:
            return out
        # chunk along doc boundaries so reduceat segments never split
        start = 0
        while start < nonempty.size:
            end = start
            tot = 0
            while end < nonempty.size and (tot == 0 or tot + lens[nonempty[end]] <= self._CHUNK):
                tot += lens[nonempty[end]]
                end += 1
            docs = nonempty[start:end]
            x = _fold_p(np.concatenate([shs[i] for i in docs]))
            vals = self._hash_block(x)  # (num_perms, tot)
            starts = np.concatenate(([0], np.cumsum(lens[docs])[:-1]))
            mins = np.minimum.reduceat(vals, starts, axis=1)  # (num_perms, n_docs)
            out[docs] = mins.T
            start = end
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batched sketch + band explode. Band keys are a vectorized
        polynomial mix of the band's signature lanes (equal bands ⇒ equal
        keys, which is all LSH bucketing needs) — no per-(doc,band)
        digest calls in the hot path."""
        ids = batch[self.id_col]
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        sigs = self.signatures(texts)  # (n, num_perms)
        B, r = self.p.num_bands, self.p.rows_per_band
        lanes = sigs.reshape(n, B, r)
        acc = np.zeros((n, B), dtype=np.uint64)
        for j in range(r):
            acc = acc * _MIX[j % 4] + lanes[:, :, j]
        keys = (acc & np.uint64((1 << 63) - 1)).astype(np.int64)
        rep = np.repeat(np.arange(n, dtype=np.int64), B)
        sig_arr = pa.array([s.tobytes() for s in sigs], pa.binary())
        return pa.Table.from_arrays(
            [
                ids.take(pa.array(rep)),
                pa.array(np.tile(np.arange(B, dtype=np.int32), n)),
                pa.array(keys.reshape(-1)),
                sig_arr.take(pa.array(rep)),
            ],
            names=["doc_id", "band_id", "band_hash", "sig"],
        )


def band_bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Within one (band_id, band_hash) bucket: emit candidate pairs with
    the estimated Jaccard from full-signature agreement. Runs inside
    ``groupby(["band_id","band_hash"]).map_groups`` (pandas batch)."""
    if len(group) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []}).astype(
            {"doc_a": group["doc_id"].dtype, "doc_b": group["doc_id"].dtype, "est_jaccard": "float64"}
        )
    g = group.sort_values("doc_id").reset_index(drop=True)
    ids = g["doc_id"].to_numpy()
    sigs = [np.frombuffer(s, dtype=np.uint64) for s in g["sig"]]
    a_out, b_out, jac = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if ids[i] == ids[j]:
                continue
            est = float((sigs[i] == sigs[j]).mean())
            a_out.append(ids[i])
            b_out.append(ids[j])
            # half-away (house convention, functions/rounding.py): lane
            # agreement m/64 hits exact .xxxx5 ties (any m ≡ 2 mod 4),
            # where Python's banker round diverges from the SQL twin
            jac.append(float(round_half_away(est, 4)))
    return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "est_jaccard": jac})


def _bucket_pairs_partition(g: pd.DataFrame) -> pd.DataFrame:
    """Process one coarse partition of band rows: drop singleton buckets
    vectorized, then pair within each surviving (band_id, band_hash)
    bucket. Grouping by ~64 coarse partitions instead of millions of tiny
    buckets avoids per-group map_groups overhead — the dominant cost at
    scale."""
    g = g[g.duplicated(["band_id", "band_hash"], keep=False)]
    if g.empty:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype=object), "doc_b": pd.Series([], dtype=object), "est_jaccard": pd.Series([], dtype="float64")}
        )
    outs = [band_bucket_pairs(sub) for _, sub in g.groupby(["band_id", "band_hash"], sort=False)]
    return pd.concat(outs, ignore_index=True)


def minhash_candidate_pairs(ds, params: MinHashParams = MinHashParams(), id_col: str = "doc_id", text_col: str = "text"):
    """Full MinHash-LSH pipeline: sketch → band explode → coarse-bucket
    shuffle (band_hash % params.num_parts partitions, each processed
    vectorized) → pairs → de-dup pairs across bands (keep max estimate)."""
    import pyarrow.compute as _pc

    mask = _part_mask(params.num_parts)
    bands = ds.map_batches(
        MinHasher(params, id_col, text_col),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=4,
    )
    bands = bands.map_batches(
        lambda t: t.append_column("part", _pc.cast(_pc.bit_wise_and(t["band_hash"], mask), pa.int32())),
        batch_format="pyarrow",
    )
    pairs = bands.groupby("part").map_groups(_bucket_pairs_partition, batch_format="pandas")
    from ray.data.aggregate import Max

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Max("est_jaccard", alias_name="est_jaccard"))


def _exact_jaccard(sa: np.ndarray, sb: np.ndarray, digits: int | None = 4) -> float:
    if sa.size == 0 and sb.size == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    denom = sa.size + sb.size - inter
    if not denom:
        return 0.0
    j = inter / denom
    # half-away, not Python's half-even (house convention; SQL-twin parity)
    return float(round_half_away(j, digits)) if digits is not None else j


def verify_pairs_distributed(pairs, docs, shingle_k: int = 3, id_col: str = "doc_id", text_col: str = "text", num_partitions: int = 8, broadcast_threshold: int = 20_000, digits: int | None = 4):
    """Scale-true exact-Jaccard verification of candidate pairs.

    Never materializes corpus text on the driver (the round-1
    scale-killer). Instead:

    1. collect ONLY the distinct candidate doc ids (O(pairs) ints) and
       broadcast them once via ``ray.put``;
    2. semi-filter ``docs`` with a vectorized ``pc.is_in`` — only
       candidate texts survive the map stage (ONE corpus scan), so the
       join moves O(pairs) rows, independent of corpus size;
    3. join pairs ⋈ candidate texts — standard adaptive join selection:
       ≤ ``broadcast_threshold`` candidate ids ⇒ BROADCAST join (the
       small filtered side rides ``ray.put``; memory bounded by the
       threshold, never the corpus); above it ⇒ distributed hash-join
       on doc_a then doc_b;
    4. shingle + exact Jaccard in-batch (shingle cache since a hot doc
       appears in many pairs).

    Returns a Dataset of (doc_a, doc_b, est_jaccard, jaccard).
    """
    import ray
    import pyarrow.compute as _pc

    pairs_mat = pairs.materialize()  # tiny by construction (candidates)
    cand_ids: set = set()
    for b in pairs_mat.iter_batches(batch_format="pyarrow", batch_size=65536):
        cand_ids.update(b["doc_a"].to_pylist())
        cand_ids.update(b["doc_b"].to_pylist())
    if not cand_ids:
        return pairs_mat.map_batches(
            lambda t: t.append_column("jaccard", pa.array([], pa.float64())),
            batch_format="pyarrow",
        )
    ids_ref = ray.put(pa.array(sorted(cand_ids)))
    # join width scales with the candidate count — a tiny pair table gets
    # a single-partition join (Ray join fixed cost per partition is real)
    num_partitions = min(num_partitions, max(1, len(cand_ids) // 20_000 + 1))

    def keep(t: pa.Table) -> pa.Table:
        t = t.filter(_pc.is_in(t[id_col], value_set=ray.get(ids_ref)))
        return pa.Table.from_arrays(
            [t[id_col].combine_chunks(), t[text_col].combine_chunks()],
            names=["cid", "ctext"],
        )

    # ONE corpus scan; the surviving candidate texts (O(pairs) rows) are
    # materialized and feed both join sides
    cand = docs.map_batches(keep, batch_format="pyarrow").materialize()

    if len(cand_ids) <= broadcast_threshold:
        # broadcast path: the filtered side is tiny — skip the shuffle
        # join's fixed cost entirely (2 × JoinOperator ≈ seconds)
        cand_tab = pa.concat_tables(
            list(cand.iter_batches(batch_format="pyarrow", batch_size=65536))
            or [pa.table({"cid": pa.array([], pa.int64()), "ctext": pa.array([], pa.string())})]
        )
        texts = dict(zip(cand_tab["cid"].to_pylist(), cand_tab["ctext"].to_pylist()))
        tref = ray.put(texts)

        # TASK pool, not an actor pool: actor startup costs ~2 s per
        # query for a pair table this small; tasks reuse warm workers
        # and the verifier state is cached worker-globally per ref
        def verify(t: pa.Table) -> pa.Table:
            v = _VERIFIER_CACHE.get(tref.hex())
            if v is None:
                _VERIFIER_CACHE.clear()
                v = _VERIFIER_CACHE[tref.hex()] = ExactJaccardVerifier(tref, shingle_k, digits)
            return v(t)

        return pairs_mat.map_batches(verify, batch_format="pyarrow")

    def rename(side: str):
        return lambda t: t.rename_columns([f"id_{side}", f"text_{side}"])

    cand_a = cand.map_batches(rename("a"), batch_format="pyarrow")
    cand_b = cand.map_batches(rename("b"), batch_format="pyarrow")
    j = pairs_mat.join(cand_a, join_type="inner", num_partitions=num_partitions, on=("doc_a",), right_on=("id_a",))
    j = j.join(cand_b, join_type="inner", num_partitions=num_partitions, on=("doc_b",), right_on=("id_b",))

    def score(t: pa.Table) -> pa.Table:
        a_ids = t["doc_a"].to_numpy(zero_copy_only=False)
        b_ids = t["doc_b"].to_numpy(zero_copy_only=False)
        a_txt = t["text_a"].to_numpy(zero_copy_only=False)
        b_txt = t["text_b"].to_numpy(zero_copy_only=False)
        cache: dict = {}

        def sh(doc_id, text):
            s = cache.get(doc_id)
            if s is None:
                s = cache[doc_id] = shingle_hashes(text, shingle_k)
            return s

        jac = np.empty(len(a_ids), dtype=np.float64)
        for i in range(len(a_ids)):
            jac[i] = _exact_jaccard(sh(a_ids[i], a_txt[i]), sh(b_ids[i], b_txt[i]), digits)
        keep = [c for c in t.column_names if c not in ("id_a", "id_b", "text_a", "text_b")]
        return t.select(keep).append_column("jaccard", pa.array(jac))

    return j.map_batches(score, batch_format="pyarrow")


# worker-global verifier cache for the task-pool broadcast arm (keyed
# by the broadcast ref so a new query's ref evicts the old state)
_VERIFIER_CACHE: dict = {}


class ExactJaccardVerifier:
    """Verify candidate pairs with true n-gram Jaccard via a broadcast
    id→text dict. This is the broadcast-join arm of
    ``verify_pairs_distributed`` — the dict it receives there holds ONLY
    candidate-filtered texts (O(pairs)), never the corpus."""

    def __init__(self, texts_ref, shingle_k: int = 3, digits: int | None = 4):
        import ray

        self.texts = ray.get(texts_ref)
        self.k = shingle_k
        self.digits = digits
        self._cache: dict = {}

    def _sh(self, doc_id):
        s = self._cache.get(doc_id)
        if s is None:
            s = shingle_hashes(self.texts[doc_id], self.k)
            self._cache[doc_id] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        a_ids = batch["doc_a"].to_numpy(zero_copy_only=False)
        b_ids = batch["doc_b"].to_numpy(zero_copy_only=False)
        jac = np.empty(len(a_ids), dtype=np.float64)
        for i in range(len(a_ids)):
            jac[i] = _exact_jaccard(self._sh(a_ids[i]), self._sh(b_ids[i]), self.digits)
        return batch.append_column("jaccard", pa.array(jac))


def token_hash_lists(texts) -> tuple[np.ndarray, np.ndarray]:
    """Batched tokenize+hash: (per-doc token counts, flattened uint64
    token hashes) — the shared kernel under ``simhash_batch`` and the
    n-gram Jaccard shingler. Tokenizes the ORIGINAL text and lowers per
    token (for the word class [A-Za-z0-9_] that equals
    tokenize(lower(text))). Token hash = poly-over-lowered-bytes +
    splitmix64 (``functions/tokenize.py``) — engine-internal only
    (never compared against a fixed external value: the jaccard/simhash
    oracles compare doc ids, counts and set overlaps), so the family is
    free to choose for speed; this byte-level numpy kernel replaced the
    DuckDB ``hash(lower(token))`` scan that materialized every token
    string (round-3 enrich-throughput item)."""
    from ..functions.tokenize import token_hash_lists_np

    return token_hash_lists_np(texts)


def simhash_batch(texts) -> np.ndarray:
    """uint64 SimHash per doc, batched: ONE RE2 token scan + vectorized
    64-bit token hashing for the whole batch (``token_hash_lists``),
    then per-doc bit voting on small cache-resident matrices.

    Replaces the per-doc Python ``re.findall`` + per-token dict-cache
    loop (the round-2 enrich bottleneck, ~1.1k urls/s/core). The
    WHOLE-BLOCK voting matrix was tried and REVERTED in round 2 (BENCH
    ledger: it saturates shared DRAM at 32 workers); per-doc
    64·n_tokens-byte uint8 matrices stay L2-resident.
    """
    dl, flat = token_hash_lists(texts)
    return vote_simhash(dl, flat)


def vote_simhash(dl: np.ndarray, flat: np.ndarray) -> np.ndarray:
    """Per-doc SimHash bit voting over a flattened token-hash array
    (``dl[i]`` hashes per doc, concatenated in ``flat``).

    Small per-doc uint8 matrices stay L2-resident — see simhash_batch
    docstring. The per-doc loop has been benchmarked against chunked
    ``np.add.reduceat`` (8× slower — 2-D reduceat is elementwise),
    chunked cumsum-diff segment sums (8× slower — column-strided int32
    traffic) and ``np.add.at`` (38×); the WHOLE-BATCH matrix was tried
    and REVERTED in round 2 (BENCH ledger: it saturates shared DRAM at
    32 workers). The tiny-matrix loop wins on memory locality."""
    offs = np.zeros(len(dl) + 1, dtype=np.int64)
    np.cumsum(dl, out=offs[1:])
    out = np.zeros(len(dl), dtype=np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for i in range(len(dl)):
        n = int(dl[i])
        if n == 0:
            continue  # tokenless doc → simhash 0 (no bit wins a vote)
        # unpackbits(little) on the little-endian byte view keeps column
        # j == bit j of the uint64; ones[j] = #tokens voting bit j set
        ones = np.unpackbits(
            flat[offs[i] : offs[i + 1]].view(np.uint8).reshape(n, 8), axis=1, bitorder="little"
        ).sum(axis=0, dtype=np.int64)
        out[i] = weights[2 * ones > n].sum()
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (token-hash bit voting) — scalar
    twin of ``simhash_batch`` (delegates, so the two can never diverge)."""
    return int(simhash_batch([text])[0])


class SimHasher:
    """map_batches stage: text → simhash + 4×16-bit LSH chunk keys.
    Fully vectorized: one simhash_batch call, numpy chunk-key expansion."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        sh = simhash_batch(batch[self.text_col])
        n = len(sh)
        rep = np.repeat(np.arange(n, dtype=np.int64), 4)
        chunks = np.tile(np.arange(4, dtype=np.int32), n)
        keys = (
            (sh[:, None] >> (np.uint64(16) * np.arange(4, dtype=np.uint64))[None, :])
            & np.uint64(0xFFFF)
        ).astype(np.int32).ravel()
        return pa.Table.from_arrays(
            [
                ids.take(pa.array(rep)),
                pa.array(chunks),
                pa.array(keys),
                pa.array(np.repeat(sh.view(np.int64), 4)),  # two's-complement signed
            ],
            names=["doc_id", "chunk_id", "chunk_key", "simhash"],
        )


def simhash_bucket_pairs(max_hamming: int = 6):
    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []}).astype(
                {"doc_a": group["doc_id"].dtype, "doc_b": group["doc_id"].dtype, "hamming": "int64"}
            )
        g = group.sort_values("doc_id").reset_index(drop=True)
        ids = g["doc_id"].to_numpy()
        sims = g["simhash"].to_numpy().astype(np.uint64)
        a_out, b_out, ham = [], [], []
        for i in range(len(ids)):
            x = sims ^ sims[i]
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                h = bin(int(x[j])).count("1")
                if h <= max_hamming:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    ham.append(h)
        # explicit dtypes: a zero-pair bucket would otherwise default to
        # float64 and poison the whole groupby's id columns via promotion
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "hamming": ham}).astype(
            {"doc_a": ids.dtype, "doc_b": ids.dtype, "hamming": "int64"}
        )

    return pairs


def simhash_near_dups(ds, max_hamming: int = 6, id_col: str = "doc_id", text_col: str = "text", num_parts: int = 64):
    """SimHash near-dup pairs: sketch → coarse-bucket shuffle → hamming
    verify within (chunk_id, chunk_key) buckets → pair dedup.

    ``num_parts`` (power of two, ≤ 2^16 — chunk keys are 16-bit) sets the
    coarse-partition fan-out; SIZE IT WITH THE CORPUS so each partition's
    pandas frame stays worker-heap-sized. Output is invariant to it: a
    (chunk_id, chunk_key) bucket never straddles partitions."""
    import pyarrow.compute as _pc

    mask = _part_mask(num_parts)
    rows = ds.map_batches(SimHasher(id_col, text_col), batch_format="pyarrow", batch_size=1024, concurrency=4)
    rows = rows.map_batches(
        lambda t: t.append_column("part", _pc.cast(_pc.bit_wise_and(t["chunk_key"], mask), pa.int32())),
        batch_format="pyarrow",
    )
    inner = simhash_bucket_pairs(max_hamming)

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated(["chunk_id", "chunk_key"], keep=False)]
        if g.empty:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype=object), "doc_b": pd.Series([], dtype=object), "hamming": pd.Series([], dtype="int64")}
            )
        outs = [inner(sub) for _, sub in g.groupby(["chunk_id", "chunk_key"], sort=False)]
        return pd.concat(outs, ignore_index=True)

    pairs = rows.groupby("part").map_groups(per_partition, batch_format="pandas")
    from ray.data.aggregate import Min

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))


class JaccardShingler:
    """map_batches stage: text → one row per DISTINCT word-k-gram shingle:
    (sh int64 hash, doc_id, n_sh = the doc's distinct-shingle count).

    Fully vectorized: one DuckDB tokenize+hash scan per batch
    (``token_hash_lists``), then the k-window polynomial mix, window
    validity mask, and per-doc dedup are single numpy expressions over
    the whole batch — no per-doc Python loop. Docs with < k tokens emit
    no rows (exactly the SQL ``range(1, len(w)-1)`` window semantics the
    oracle twin uses — NOT the partial-shingle fallback of
    ``shingle_hashes``, which only verification uses and only ever on
    docs with ≥ k tokens)."""

    def __init__(self, k: int = 3, id_col: str = "doc_id", text_col: str = "text"):
        self.k, self.id_col, self.text_col = k, id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        dl, flat = token_hash_lists(batch[self.text_col])
        k = self.k
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], ids.type), pa.array([], pa.int64())],
            names=["sh", "doc_id", "n_sh"],
        )
        if flat.size < k:
            return empty
        m = flat.size - k + 1
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            acc = acc * _MIX[j % 4] + flat[j : j + m]
        doc_idx = np.repeat(np.arange(len(dl), dtype=np.int64), dl)
        valid = doc_idx[:m] == doc_idx[k - 1 :]  # window stays inside one doc
        sh, d = acc[valid], doc_idx[:m][valid]
        if sh.size == 0:
            return empty
        order = np.lexsort((sh, d))
        sh, d = sh[order], d[order]
        keep = np.ones(sh.size, dtype=bool)
        keep[1:] = (d[1:] != d[:-1]) | (sh[1:] != sh[:-1])
        sh, d = sh[keep], d[keep]
        n_sh = np.bincount(d, minlength=len(dl))[d]
        return pa.Table.from_arrays(
            [pa.array(sh.view(np.int64)), ids.take(pa.array(d)), pa.array(n_sh.astype(np.int64))],
            names=["sh", "doc_id", "n_sh"],
        )


def _jaccard_pairs_partition(max_df: int):
    """Per-coarse-partition candidate pair generation for the inverted
    shingle index. All-vectorized: sort by shingle, run-length group
    bounds, df filter (2 ≤ df ≤ ``max_df`` — classic stop-shingle
    pruning caps the quadratic blowup of boilerplate shingles), then the
    closed-form rank→(i,j) triangle expansion emits every within-group
    pair in one numpy expression. Local (doc_a, doc_b) pre-aggregation
    (run-length count) keeps the global pair shuffle small."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype=g["doc_id"].dtype if len(g) else "int64"),
                "doc_b": pd.Series([], dtype=g["doc_id"].dtype if len(g) else "int64"),
                "n_shared_part": pd.Series([], dtype="int64"),
            }
        )
        if len(g) < 2:
            return out_empty
        sh = g["sh"].to_numpy()
        d = g["doc_id"].to_numpy()
        order = np.lexsort((d, sh))
        sh, d = sh[order], d[order]
        bounds = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1], True])
        sizes = np.diff(bounds)
        ok = (sizes >= 2) & (sizes <= max_df)
        if not ok.any():
            return out_empty
        msz = sizes[ok].astype(np.int64)
        starts = bounds[:-1][ok].astype(np.int64)
        ppg = msz * (msz - 1) // 2
        total = int(ppg.sum())
        grp = np.repeat(np.arange(len(msz), dtype=np.int64), ppg)
        offs = np.concatenate(([0], np.cumsum(ppg)[:-1]))
        r = np.arange(total, dtype=np.int64) - offs[grp]
        # rank → (i < j) within the group triangle; sqrt seed + two
        # integer corrections make it exact for any int64 rank
        j = ((1.0 + np.sqrt(1.0 + 8.0 * r)) / 2.0).astype(np.int64)
        j = np.where(j * (j - 1) // 2 > r, j - 1, j)
        j = np.where((j + 1) * j // 2 <= r, j + 1, j)
        i = r - j * (j - 1) // 2
        a = d[starts[grp] + i]
        b = d[starts[grp] + j]  # docs sorted within group ⇒ a < b
        # local pre-agg: count shared shingles per pair
        po = np.lexsort((b, a))
        a, b = a[po], b[po]
        pb = np.flatnonzero(np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1]), True])
        cnt = np.diff(pb).astype(np.int64)
        return pd.DataFrame({"doc_a": a[pb[:-1]], "doc_b": b[pb[:-1]], "n_shared_part": cnt})

    return pairs


def jaccard_candidate_pairs(ds, k: int = 3, max_df: int = 50, num_parts: int = 64, id_col: str = "doc_id", text_col: str = "text"):
    """n-gram Jaccard candidate pairs via a distributed inverted shingle
    index: shingle explode (vectorized) → coarse-bucket shuffle
    (``sh & (num_parts-1)`` — every row of one shingle lands in one
    partition, so document frequency is exact/global) → within-partition
    df-bounded pair expansion with local pre-aggregation → global
    (doc_a, doc_b) Sum. The shuffle moves (int64, id, int64) rows —
    O(tokens) per doc, the inherent cost of EXACT inverted-index
    candidates (MinHash-LSH is the cheap sketch alternative; this
    operator is its exact-recall twin for df-bounded shingles)."""
    import pyarrow.compute as _pc
    from ray.data.aggregate import Sum

    mask = _part_mask(num_parts)
    rows = ds.map_batches(
        JaccardShingler(k, id_col, text_col), batch_format="pyarrow", batch_size=1024, concurrency=4
    )
    rows = rows.map_batches(
        lambda t: t.append_column("part", _pc.cast(_pc.bit_wise_and(t["sh"], mask), pa.int32())),
        batch_format="pyarrow",
    )
    pairs = rows.groupby("part").map_groups(_jaccard_pairs_partition(max_df), batch_format="pandas")
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Sum("n_shared_part", alias_name="n_shared"))


def jaccard_near_dups(ds, k: int = 3, threshold: float = 0.5, max_df: int = 50, num_parts: int = 64, id_col: str = "doc_id", text_col: str = "text"):
    """n-gram Jaccard near-dup pairs: inverted-index candidates
    (``jaccard_candidate_pairs``) + exact shingle-set Jaccard
    verification (``verify_pairs_distributed`` — semi-filter + adaptive
    join; no corpus text on the driver), filtered to
    ``jaccard >= threshold``.

    Jaccard is emitted as the RAW double of one exact integer division
    (``digits=None``) so the value is bit-identical to the SQL twin's
    ``CAST(nboth AS DOUBLE) / (na + nb - nboth)``."""
    pairs = jaccard_candidate_pairs(ds, k, max_df, num_parts, id_col, text_col)
    verified = verify_pairs_distributed(pairs, ds, shingle_k=k, id_col=id_col, text_col=text_col, digits=None)
    return verified.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], pa.scalar(float(threshold)))),
        batch_format="pyarrow",
    )


def exact_dedup(ds, key_col: str, order_col: str):
    """O22-style exact dedup: hash-partition by key, keep the first row by
    ``order_col`` within each group (the reference's unique-key upsert)."""
    def head1(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_col).head(1)

    return ds.groupby(key_col).map_groups(head1, batch_format="pandas")
