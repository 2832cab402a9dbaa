"""DuckDB oracle SQL twins for every SQL-expressible query in queries.py.

Column names and rounding must match the Ray pipelines exactly (the
driver sorts columns by name and hash-compares values). Queries with no
entry here (hash-family sketch dedup: minhash/simhash/embedding/ivf, and
the stubbed media codecs) get the driver's rows-only check instead.
"""

# Gate/parameter constants shared with the engine kernels — interpolated
# into the twin SQL, never restated as literals (params.py is the single
# source of truth; see that module's docstring).
from .params import (
    CCNET_NBUCKETS,
    CURATE_ENT_MIN,
    CURATE_MIN_TOKENS,
    CURATE_PPL_MAX,
    DSIR_SAMPLE_K,
    GOPHER_MAX_TOKENS,
    GOPHER_MEAN_LEN_MAX,
    GOPHER_MEAN_LEN_MIN,
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_TOKENS,
    GOPHER_UNIQ_MIN,
    EMB_DEDUP_THRESHOLD,
    EMB_LSH_NBITS,
    EMB_LSH_SEED,
    KNN_GRAPH_K,
    KMEANS_ITERS,
    KMEANS_K,
    PMI_MIN_COUNT,
    SEMDEDUP_TAU,
    SHARD_ROWS,
    SHUFFLE_SEED,
)

# ---- winnowing twin: replay the engine's exact mod-2^61-1 polynomial
# rolling hash (k=8 byte-grams, base 1000003, Horner form) in HUGEINT
# arithmetic, then the same w=16 window-min selection + per-doc DISTINCT.
# ASCII-content assumption (shared with the engine's byte-level kernels):
# ord(char) == utf-8 byte only for ASCII text; the testdata fixtures are
# ASCII (see functions/tokenize.py note).
_WINNOW_P = (1 << 61) - 1
_WINNOW_B = 1000003
_winnow_h = "bs[i]"
for _j in range(1, 8):
    _winnow_h = f"(({_winnow_h}) * {_WINNOW_B} + bs[i+{_j}]) % {_WINNOW_P}"
_WINNOW_FPS_CTE = f"""
        bl AS (
          SELECT doc_id,
                 list_transform(range(1, length(text)+1),
                                i -> ord(substr(text, i, 1))::HUGEINT) AS bs,
                 length(text) - 7 AS m
          FROM documents WHERE length(text) >= 8
        ),
        hs AS (
          SELECT doc_id, i, m, ({_winnow_h})::HUGEINT AS h
          FROM bl, unnest(range(1, m + 1)) AS t(i)
        ),
        wm AS (
          SELECT doc_id, i, m,
                 min(h) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS wmin
          FROM hs
        ),
        fps AS (
          SELECT DISTINCT doc_id, wmin::BIGINT AS fp
          FROM wm WHERE i <= greatest(m - 15, 1)
        )
"""

# ---- simhash twin: replay the ENGINE's 64-bit simhash bit-for-bit in
# HUGEINT SQL — per-token Horner polynomial over lowered ASCII byte
# values (the byte-level tokenizer hash, functions/tokenize.py) +
# splitmix64 finalizer, per-doc majority bit voting, then the SAME
# 4×16-bit LSH chunk candidate rule + hamming ≤ 6 verify the engine
# runs (stages/dedup.py::simhash_near_dups). 64×64→64 wrap-around
# multiplication is inlined as a 32-bit-split modmul (HUGEINT is
# signed 128-bit, so a direct 64×64 product overflows); >> is // by a
# power of two on the unsigned value, ^ is xor() (HUGEINT-safe).
_M64 = 1 << 64
_P32 = 1 << 32


def _mm(a: str, c: int) -> str:
    """Inline (a * c) mod 2^64 for a HUGEINT expression and a constant."""
    bh, bl = c >> 32, c & 0xFFFFFFFF
    return (
        f"((({a}) % {_P32}) * {bl} + "
        f"(((({a}) % {_P32}) * {bh} + (({a}) // {_P32}) * {bl}) % {_P32}) * {_P32}) % {_M64}"
    )


def _simhash_pairs_sql(max_hamming: int = 6) -> str:
    B = 0x9E3779B97F4A7C15
    C1 = 0xBF58476D1CE4E5B9
    C2 = 0x94D049BB133111EB
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
        FROM documents
    ),
    poly AS (
        SELECT doc_id,
               list_reduce(list_transform(string_split(tok, ''), c -> unicode(c)::HUGEINT),
                           (a, b) -> (({_mm('a', B)}) + b) % {_M64}) AS h0
        FROM tok
    ),
    m1 AS (SELECT doc_id, {_mm('xor(h0, h0 // 1073741824)', C1)} AS h1 FROM poly),
    m2 AS (SELECT doc_id, {_mm('xor(h1, h1 // 134217728)', C2)} AS h2 FROM m1),
    mix AS (SELECT doc_id, xor(h2, h2 // 2147483648) AS h FROM m2),
    cnt AS (SELECT doc_id, count(*)::HUGEINT AS n FROM mix GROUP BY 1),
    bits AS (
        SELECT m.doc_id, b.j, sum(((m.h // (1::HUGEINT << b.j)) % 2)::HUGEINT) AS ones
        FROM mix m, (SELECT unnest(range(64)) AS j) b
        GROUP BY 1, 2
    ),
    sh AS (
        SELECT b.doc_id,
               sum(CASE WHEN 2 * b.ones > c.n THEN (1::HUGEINT << b.j) ELSE 0::HUGEINT END) AS simhash
        FROM bits b JOIN cnt c USING (doc_id)
        GROUP BY 1
    ),
    allsh AS (
        SELECT d.doc_id, coalesce(s.simhash, 0::HUGEINT) AS simhash
        FROM documents d LEFT JOIN sh s USING (doc_id)
    ),
    chunks AS (
        SELECT doc_id, simhash,
               c.c AS chunk_id,
               (simhash // (1::HUGEINT << (16 * c.c))) % 65536 AS chunk_key
        FROM allsh, (SELECT unnest(range(4)) AS c) c
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
    FROM chunks a JOIN chunks b
      ON a.chunk_id = b.chunk_id AND a.chunk_key = b.chunk_key
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


# ---- minhash twin: replay the ENGINE's MinHash-LSH + exact-Jaccard
# pipeline bit-for-bit (stages/dedup.py::minhash_candidate_pairs +
# verify_pairs_distributed). Token hash = the same HUGEINT Horner poly
# + splitmix64 as the simhash twin; shingle = the _MIX Horner window
# over k token hashes (wrapping mod 2^64, split modmul inlined);
# signatures = min over shingles of the exact universal hash
# (a·x+b) mod 2^61-1 with the engine's OWN permutation coefficients
# embedded as literals (deterministic seed, values generated by calling
# the engine's _perm_coeffs — the SQL hardcodes its output, never the
# RNG); band keys = the _MIX Horner mix of each band's lanes; candidate
# pairs share a (band, key) bucket; est = lane-agreement fraction;
# exact jaccard over the distinct-shingle-hash sets.
_MIX64 = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5)
_P61 = (1 << 61) - 1


def _minhash_pairs_sql() -> str:
    from ..stages.dedup import MinHashParams, _perm_coeffs

    p = MinHashParams()
    a, b = _perm_coeffs(p)
    B_TOK = 0x9E3779B97F4A7C15
    C1 = 0xBF58476D1CE4E5B9
    C2 = 0x94D049BB133111EB
    M1, M2, M3 = _MIX64[1], _MIX64[2], _MIX64[3]
    assert p.shingle_k == 3 and p.rows_per_band == 4, "twin hardcodes k=3, r=4"
    two61 = 1 << 61
    sh2 = "(" + _mm("p0.h", M1) + f" + p1.h) % {_M64}"
    sh3 = "(" + _mm(sh2, M2) + f" + p2.h) % {_M64}"
    # one aggregation pass computes all 64 signature lanes as COLUMNS
    # (a (doc, perm)-row formulation measured ~64x the intermediate rows
    # and timed out at sf0.1); bands/agreement work on the columns too
    sigmins = ", ".join(
        f"min(({int(a[i])} * xs.x + {int(b[i])}) % {_P61}) AS v{i}" for i in range(p.num_perms)
    )
    sigcoalesce = ", ".join(f"coalesce(s.v{i}, {_P61}) AS v{i}" for i in range(p.num_perms))
    band_selects = []
    for band in range(p.num_bands):
        acc = f"v{4 * band}"
        for j, m in enumerate((M1, M2, M3), start=1):
            acc = "(" + _mm(acc, m) + f" + v{4 * band + j}) % {_M64}"
        band_selects.append(
            f"SELECT doc_id, {band} AS band, ({acc}) % {1 << 63} AS band_hash FROM sig"
        )
    bands_union = " UNION ALL ".join(band_selects)
    lane_agree = " + ".join(
        f"CASE WHEN sa.v{i} = sb.v{i} THEN 1 ELSE 0 END" for i in range(p.num_perms)
    )
    return f"""
    WITH lists AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS l
        FROM documents
    ),
    pos AS (
        SELECT doc_id, CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS i,
               unnest(l) AS tok
        FROM lists
    ),
    toks AS (SELECT DISTINCT tok FROM pos),
    th0 AS (
        SELECT tok,
               list_reduce(list_transform(string_split(tok, ''), c -> unicode(c)::HUGEINT),
                           (x, y) -> (({_mm('x', B_TOK)}) + y) % {_M64}) AS h0
        FROM toks
    ),
    tm1 AS (SELECT tok, {_mm('xor(h0, h0 // 1073741824)', C1)} AS h1 FROM th0),
    tm2 AS (SELECT tok, {_mm('xor(h1, h1 // 134217728)', C2)} AS h2 FROM tm1),
    th AS (SELECT tok, xor(h2, h2 // 2147483648) AS h FROM tm2),
    ph AS (SELECT pos.doc_id, pos.i, th.h FROM pos JOIN th USING (tok)),
    nt AS (SELECT doc_id, count(*)::BIGINT AS n FROM ph GROUP BY 1),
    w3 AS (
        SELECT p0.doc_id, {sh3} AS sh
        FROM ph p0
        JOIN ph p1 ON p1.doc_id = p0.doc_id AND p1.i = p0.i + 1
        JOIN ph p2 ON p2.doc_id = p0.doc_id AND p2.i = p0.i + 2
    ),
    s1 AS (
        SELECT ph.doc_id, ph.h AS sh
        FROM ph JOIN nt USING (doc_id) WHERE nt.n = 1
    ),
    s2 AS (
        SELECT p0.doc_id, {sh2} AS sh
        FROM ph p0
        JOIN ph p1 ON p1.doc_id = p0.doc_id AND p1.i = 1 AND p0.i = 0
        JOIN nt ON nt.doc_id = p0.doc_id AND nt.n = 2
    ),
    shingles AS (
        SELECT DISTINCT doc_id, sh
        FROM (SELECT * FROM w3 UNION ALL SELECT * FROM s1 UNION ALL SELECT * FROM s2)
    ),
    xs AS (
        SELECT doc_id,
               CASE WHEN sh // {two61} + sh % {two61} >= {_P61}
                    THEN sh // {two61} + sh % {two61} - {_P61}
                    ELSE sh // {two61} + sh % {two61} END AS x
        FROM shingles
    ),
    sigcols AS (
        SELECT xs.doc_id, {{SIGMINS}}
        FROM xs GROUP BY 1
    ),
    sig AS (
        SELECT d.doc_id, {{SIGCOALESCE}}
        FROM documents d LEFT JOIN sigcols s ON s.doc_id = d.doc_id
    ),
    bh AS ({{BANDS_UNION}}),
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bh x JOIN bh y
          ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
    ),
    est AS (
        SELECT c.doc_a, c.doc_b,
               round(({{LANE_AGREE}}) / {p.num_perms}.0, 4) AS est_jaccard
        FROM cand c
        JOIN sig sa ON sa.doc_id = c.doc_a
        JOIN sig sb ON sb.doc_id = c.doc_b
    ),
    scnt AS (SELECT doc_id, count(*)::BIGINT AS ns FROM shingles GROUP BY 1),
    inter AS (
        SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS ni
        FROM cand c
        JOIN shingles x ON x.doc_id = c.doc_a
        JOIN shingles y ON y.doc_id = c.doc_b AND y.sh = x.sh
        GROUP BY 1, 2
    ),
    jac AS (
        SELECT c.doc_a, c.doc_b,
               CASE WHEN coalesce(na.ns, 0) = 0 AND coalesce(nb.ns, 0) = 0 THEN 1.0
                    ELSE round(coalesce(i.ni, 0)::DOUBLE /
                               (coalesce(na.ns, 0) + coalesce(nb.ns, 0) - coalesce(i.ni, 0)), 4)
               END AS jaccard
        FROM cand c
        LEFT JOIN scnt na ON na.doc_id = c.doc_a
        LEFT JOIN scnt nb ON nb.doc_id = c.doc_b
        LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
    )
    SELECT e.doc_a, e.doc_b, e.est_jaccard, j.jaccard
    FROM est e JOIN jac j ON j.doc_a = e.doc_a AND j.doc_b = e.doc_b
    """.replace("{SIGMINS}", sigmins).replace("{SIGCOALESCE}", sigcoalesce).replace(
        "{BANDS_UNION}", bands_union
    ).replace("{LANE_AGREE}", lane_agree)


# ---- langid twin: per-language trigram-presence counts (a text's
# trigram set contains t iff t is a substring), alphabetical first-max
# tie-break (argmax order de < en < es < fr), 'und' when every count is 0
# — the exact LangId.classify rule (stages/textstats.py).
_LANGID_PROFILES = {
    "de": ["der", "die", "und", "ein", "sch"],
    "en": ["the", "and", "ing", "ion", "ent"],
    "es": ["que", "los", "ent", "cio", "las"],
    "fr": ["les", "des", "ent", "que", "ion"],
}
_langid_counts = ", ".join(
    "(" + " + ".join(f"contains(lt, '{t}')::INT" for t in sorted(tris)) + f") AS c_{lang}"
    for lang, tris in _LANGID_PROFILES.items()
)

ORACLE_SQL: dict[str, str] = {
    "extract_tokens": """
        SELECT doc_id, unnest(regexp_extract_all(text, 'sp[a-z]+')) AS token
        FROM documents
    """,
    "extract_emails": r"""
        SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails
        FROM documents
    """,
    "extract_onions": r"""
        SELECT doc_id, len(regexp_extract_all(text, '[a-z2-7]{16}\.onion'))::BIGINT AS n_onions
        FROM documents
    """,
    "extract_btc": """
        SELECT doc_id, len(regexp_extract_all(text, '[13][a-km-zA-HJ-NP-Z1-9]{25,34}'))::BIGINT AS n_btc
        FROM documents
    """,
    "token_count": """
        SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z0-9_]+'))::BIGINT AS n_tokens
        FROM documents
    """,
    "quality_score": """
        WITH toks AS (
            SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9_]+') AS t FROM documents
        )
        SELECT doc_id,
               len(t)::BIGINT AS n_tokens,
               round(coalesce(len(list_filter(t, x -> x IN ('the', 'a'))) / greatest(len(t), 1), 0), 4) AS stop_ratio,
               round(coalesce(list_aggregate(list_transform(t, x -> length(x)), 'sum') / greatest(len(t), 1), 0), 4) AS mean_token_len
        FROM toks
    """,
    "doc_fingerprint": """
        SELECT doc_id, md5(text) AS fp FROM documents
    """,
    "winnow_fingerprint": f"""
        WITH {_WINNOW_FPS_CTE}
        SELECT d.doc_id,
               coalesce(a.n_fps, 0) AS n_fps,
               coalesce(a.fp_min, 0) AS fp_min,
               coalesce(a.fp_xor, 0) AS fp_xor
        FROM documents d LEFT JOIN (
            SELECT doc_id, count(*)::BIGINT AS n_fps,
                   min(fp) AS fp_min, bit_xor(fp) AS fp_xor
            FROM fps GROUP BY doc_id
        ) a USING (doc_id)
    """,
    "dedup_winnow": f"""
        WITH {_WINNOW_FPS_CTE},
        grp AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) BETWEEN 2 AND 20)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
        FROM fps a JOIN grp USING (fp) JOIN fps b USING (fp)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 2
    """,
    # chunking twin: same window arithmetic (n = 1 + ceil((len-200)/150)
    # in integer form; empty docs yield no chunks); substr is char-based
    # = byte-based on the ASCII fixtures (shared kernel assumption)
    "doc_chunks": """
        SELECT doc_id, i AS chunk_id,
               substr(text, CAST(i * 150 + 1 AS INT), 200) AS chunk
        FROM documents,
             unnest(range(0, CASE WHEN length(text) = 0 THEN 0
                                  ELSE 1 + greatest(0, (length(text) - 200 + 149) // 150)
                             END)) AS t(i)
    """,
    # split twin: same Knuth multiplicative hash mod 2^32 (HUGEINT — the
    # engine's uint64 wrap preserves the mod-2^32 value, so both agree
    # at any id magnitude); threshold = int(0.1 * 2^32)
    "dataset_split": """
        SELECT doc_id,
               CASE WHEN (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 < 429496729
                    THEN 'val' ELSE 'train' END AS split
        FROM documents
    """,
    # packing twin: exclusive prefix sum over doc_id order // budget —
    # the plain-window form of the engine's bucketed two-pass prefix sum
    "pack_chunks": """
        WITH t AS (
            SELECT doc_id,
                   len(regexp_extract_all(text, '[A-Za-z0-9_]+'))::BIGINT AS n_tokens
            FROM documents
        )
        SELECT doc_id, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2000
                    AS BIGINT) AS bin
        FROM t
    """,
    # shuffled-shard twin: the engine's splitmix64 rank key replayed in
    # HUGEINT (the dsir_sample finalizer chain, seeded by XOR), global
    # order = plain row_number() over the key — splitmix64 is a uint64
    # bijection, so ranks are unique and no tie-break is needed
    "corpus_shuffle_shards": f"""
        WITH hx AS (SELECT doc_id, xor(doc_id::HUGEINT, {SHUFFLE_SEED}) AS h0
                    FROM documents),
        hm1 AS (SELECT doc_id, {_mm('xor(h0, h0 // 1073741824)', 0xBF58476D1CE4E5B9)} AS h1 FROM hx),
        hm2 AS (SELECT doc_id, {_mm('xor(h1, h1 // 134217728)', 0x94D049BB133111EB)} AS h2 FROM hm1),
        hr AS (SELECT doc_id, xor(h2, h2 // 2147483648) AS r FROM hm2),
        rk AS (SELECT doc_id, row_number() OVER (ORDER BY r) - 1 AS rk FROM hr)
        SELECT doc_id, (rk // {SHARD_ROWS})::BIGINT AS shard_id,
               (rk % {SHARD_ROWS})::BIGINT AS shard_pos
        FROM rk
    """,
    "langid_pred": f"""
        WITH s AS (
            SELECT doc_id, {_langid_counts}
            FROM (SELECT doc_id, lower(text) AS lt FROM documents)
        )
        SELECT doc_id,
               CASE WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
                    WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
                    WHEN c_en >= c_es AND c_en >= c_fr THEN 'en'
                    WHEN c_es >= c_fr THEN 'es'
                    ELSE 'fr' END AS pred_lang
        FROM s
    """,
    "dedup_exact": """
        SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    # flagship composite: exact-dedup + quality-gated training-corpus
    # export (same stat expressions as quality_score — identical copies
    # share identical stats, so min() carries them through the dedup)
    "corpus_export": """
        WITH toks AS (
            SELECT doc_id, md5(text) AS fp,
                   regexp_extract_all(text, '[A-Za-z0-9_]+') AS t
            FROM documents
        ),
        q AS (
            SELECT doc_id, fp,
                   len(t)::BIGINT AS n_tokens,
                   round(coalesce(len(list_filter(t, x -> x IN ('the', 'a'))) / greatest(len(t), 1), 0), 4) AS stop_ratio,
                   round(coalesce(list_aggregate(list_transform(t, x -> length(x)), 'sum') / greatest(len(t), 1), 0), 4) AS mean_token_len
            FROM toks
        ),
        d AS (
            SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens,
                   min(stop_ratio) AS stop_ratio, min(mean_token_len) AS mean_token_len
            FROM q GROUP BY fp
        )
        SELECT doc_id, n_tokens, stop_ratio, mean_token_len FROM d
        WHERE n_tokens BETWEEN 25 AND 90
          AND stop_ratio <= 0.12
          AND mean_token_len BETWEEN 4.0 AND 5.1
    """,
    "clone_groups": """
        SELECT doc_id, doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_genuine
        FROM documents
    """,
    # n-gram Jaccard near-dup: word 5-gram shingles (same lowercased
    # [a-z0-9_]+ tokenizer as the engine), candidates = pairs sharing a
    # shingle with document frequency in [2, 20] (stop-shingle pruning),
    # jaccard = EXACT distinct-shingle-set overlap as one raw double
    # division (bit-identical to the engine's integer-division double)
    "dedup_simhash": _simhash_pairs_sql(6),
    "dedup_minhash": _minhash_pairs_sql(),
    "dedup_jaccard": """
        WITH words AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS w
          FROM documents
        ),
        shingles AS (
          SELECT DISTINCT doc_id,
                 w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS sh
          FROM words, UNNEST(range(1, len(w) - 3)) AS t(i)
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
        elig AS (
          SELECT sh FROM shingles GROUP BY sh
          HAVING count(*) BETWEEN 2 AND 20
        ),
        cand AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
          FROM shingles a JOIN elig USING (sh) JOIN shingles b USING (sh)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS nboth
          FROM shingles a JOIN shingles b USING (sh)
          JOIN (SELECT doc_a, doc_b FROM cand) c
            ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
          GROUP BY 1, 2
        )
        SELECT c.doc_a, c.doc_b, c.n_shared,
               CAST(i.nboth AS DOUBLE) / (sa.n + sb.n - i.nboth) AS jaccard
        FROM cand c
        JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
        JOIN sizes sa ON sa.doc_id = c.doc_a
        JOIN sizes sb ON sb.doc_id = c.doc_b
        WHERE CAST(i.nboth AS DOUBLE) / (sa.n + sb.n - i.nboth) >= 0.5
    """,
    "dedup_embedding_exact": f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4) >= {EMB_DEDUP_THRESHOLD!r}
    """,
    "embedding_centroids": """
        SELECT label, CAST(i AS BIGINT) AS pos,
               round(avg(CAST(embedding[i + 1] AS DOUBLE)), 4) AS centroid
        FROM embeddings, range(64) t(i)
        GROUP BY label, i
    """,
    "embed_quantize": """
        WITH u AS (
            SELECT vec_id, CAST(i AS BIGINT) AS dim,
                   CAST(embedding[i + 1] AS DOUBLE) AS x
            FROM embeddings, range(64) t(i)
        ),
        s AS (SELECT dim, max(abs(x)) AS m FROM u GROUP BY dim)
        SELECT u.vec_id, u.dim,
               coalesce(CAST(round(127 * u.x / nullif(s.m, 0)) AS BIGINT), 0) AS q
        FROM u JOIN s USING (dim)
    """,
    "ann_topk": """
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
        SELECT CAST(0 AS BIGINT) AS query_id, vec_id,
               round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qe FROM q)), 4) AS cos
        FROM embeddings
        ORDER BY cos DESC, vec_id ASC
        LIMIT 10
    """,
    "ann_multi": """
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
            FROM embeddings WHERE vec_id < 4
        ),
        s AS (
            SELECT q.query_id, e.vec_id,
                   round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 4) AS cos
            FROM embeddings e CROSS JOIN q
        ),
        r AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos DESC, vec_id) AS rn
            FROM s
        )
        SELECT query_id, vec_id, cos FROM r WHERE rn <= 5
    """,
    "events_latest_per_user": """
        SELECT user_id, ts AS last_ts, event_id AS last_event_id
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "events_first_per_type": """
        SELECT user_id, event_type, event_id AS first_event_id
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "events_per_user_stats": """
        SELECT user_id, count(*)::BIGINT AS n_events,
               round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 4) AS total_value
        FROM events GROUP BY user_id
    """,
    "events_recent": """
        SELECT user_id, max(ts) AS last_ts
        FROM events WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
        GROUP BY user_id
    """,
    "orders_by_segment": """
        SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 4) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "customer_order_counts": """
        SELECT c_custkey, c_name, count(*)::BIGINT AS n_orders
        FROM customer JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
    """,
    "supplier_region": """
        SELECT r_name, count(*)::BIGINT AS n_suppliers
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "link_degree": """
        SELECT l_partkey, count(*)::BIGINT AS n_lines FROM lineitem GROUP BY l_partkey
    """,
    "lineitem_agg": """
        SELECT l_returnflag, l_linestatus,
               round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0, 4) AS sum_qty,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 4) AS sum_price,
               round(sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0 / count(*), 4) AS avg_disc,
               count(*)::BIGINT AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "top_lineitems": """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        LIMIT 10
    """,
    "global_stats": """
        SELECT count(*)::BIGINT AS n_docs,
               count(DISTINCT lang)::BIGINT AS n_langs,
               round(avg(n_chars), 4) AS avg_chars
        FROM documents
    """,
    "lang_distribution": """
        SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang
    """,
    "language_filter": """
        SELECT source, count(*)::BIGINT AS n_docs FROM documents WHERE lang = 'en' GROUP BY source
    """,
    # search twins use TOKEN semantics (tf = count of lowercased
    # WORD_PATTERN tokens equal to the term — ES-analyzer-like), matching
    # the persisted-postings engine path in stages/text_index.py
    "search_rank": """
        SELECT doc_id,
               len(list_filter(regexp_extract_all(lower(text), '[A-Za-z0-9_]+'),
                               x -> x = 'spark'))::BIGINT AS score
        FROM documents
        WHERE len(list_filter(regexp_extract_all(lower(text), '[A-Za-z0-9_]+'),
                              x -> x = 'spark')) > 0
        ORDER BY score DESC, doc_id ASC
        LIMIT 20
    """,
    # BM25 twin mirrors queries.q_search_rank_bm25 exactly: same token tf /
    # dl definitions, same k1=1.2 b=0.75 constants, same operation order,
    # half-away round to 4 decimals on both sides
    "search_rank_bm25": """
        WITH tok AS (
            SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS ts
            FROM documents
        ), d AS (
            SELECT doc_id,
                   len(ts)::DOUBLE AS dl,
                   len(list_filter(ts, x -> x = 'spark'))::DOUBLE AS tf0,
                   len(list_filter(ts, x -> x = 'data'))::DOUBLE AS tf1
            FROM tok
        ), s AS (
            SELECT count(*)::DOUBLE AS n,
                   sum(dl) / count(*) AS avgdl,
                   sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df0,
                   sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df1
            FROM d
        )
        SELECT doc_id,
               round(
                   ln((s.n - s.df0 + 0.5) / (s.df0 + 0.5) + 1.0)
                     * (tf0 * (1.2 + 1.0)) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / s.avgdl))
                 + ln((s.n - s.df1 + 0.5) / (s.df1 + 0.5) + 1.0)
                     * (tf1 * (1.2 + 1.0)) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / s.avgdl)),
               4) AS score
        FROM d, s
        WHERE tf0 > 0 OR tf1 > 0
        ORDER BY score DESC, doc_id ASC
        LIMIT 20
    """,
    "random_sample_hash": """
        SELECT doc_id FROM documents WHERE doc_id % 97 = 0
    """,
    "sample_stratified": """
        SELECT event_type, event_id, user_id FROM (
            SELECT event_type, event_id, user_id,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY (event_id * 2654435761) % 4294967296, event_id
                   ) AS rn
            FROM events
        ) WHERE rn <= 5
    """,
    "union_sources": """
        SELECT DISTINCT custkey FROM (
            SELECT c_custkey AS custkey FROM customer
            UNION ALL
            SELECT o_custkey AS custkey FROM orders
        )
    """,
    "brand_revenue": """
        SELECT p_brand,
               round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0, 4) AS revenue,
               count(*)::BIGINT AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "order_priority_count": """
        SELECT o_orderpriority, count(*)::BIGINT AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY o_orderpriority
    """,
    "events_hourly": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*)::BIGINT AS n,
               round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 4) AS total_value
        FROM events GROUP BY 1, 2
    """,
    "events_sessions": """
        SELECT user_id, sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)::BIGINT AS n_sessions
        FROM (
            SELECT user_id,
                   epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap
            FROM events
        ) GROUP BY user_id
    """,
    "events_rolling": """
        SELECT event_id, user_id,
               round(sum(CAST(round(value * 100) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) / 100.0, 4) AS rolling_value
        FROM events
    """,
    "events_range_join": """
        SELECT p.event_id, p.user_id, count(e.event_id)::BIGINT AS n_prior
        FROM events p LEFT JOIN events e
          ON e.user_id = p.user_id
         AND e.ts < p.ts
         AND e.ts >= p.ts - INTERVAL 24 HOUR
        WHERE p.event_type = 'purchase'
        GROUP BY 1, 2
    """,
    "events_asof_purchase": """
        SELECT e.event_id, e.user_id,
               coalesce((
                   SELECT s.event_id FROM events s
                   WHERE s.user_id = e.user_id AND s.event_type = 'signup' AND s.ts <= e.ts
                   ORDER BY s.ts DESC, s.event_id DESC LIMIT 1
               ), -1) AS signup_event_id
        FROM events e WHERE e.event_type = 'purchase'
    """,
    "quality_repetition": """
        WITH x AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9_]+') AS w FROM documents),
        bg AS (SELECT doc_id, w[j] || ' ' || w[j+1] AS g
               FROM x, unnest(range(1, len(w))) AS t2(j)),
        bm AS (SELECT doc_id, max(c) AS mx, sum(c) AS nb
               FROM (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1),
        tg AS (SELECT doc_id, w[j] || ' ' || w[j+1] || ' ' || w[j+2] AS g
               FROM x, unnest(range(1, len(w) - 1)) AS t2(j)),
        tm AS (SELECT doc_id, count(*) AS nt, count(DISTINCT g) AS nd FROM tg GROUP BY 1)
        SELECT x.doc_id,
               len(w)::BIGINT AS n_tokens,
               round(coalesce(1.0 * mx / nb, 0), 4) AS top_bigram_frac,
               round(coalesce(1.0 - 1.0 * nd / nt, 0), 4) AS dup_trigram_frac
        FROM x LEFT JOIN bm ON x.doc_id = bm.doc_id LEFT JOIN tm ON x.doc_id = tm.doc_id
    """,
    "ngram_top": """
        WITH x AS (SELECT regexp_extract_all(text, '[A-Za-z0-9_]+') AS w FROM documents),
        g AS (SELECT w[j] || ' ' || w[j+1] AS ngram
              FROM x, unnest(range(1, len(w))) AS t2(j))
        SELECT ngram, count(*)::BIGINT AS cnt FROM g GROUP BY 1
        ORDER BY cnt DESC, ngram LIMIT 100
    """,
    "vocab_build": """
        WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token
                   FROM documents),
        c AS (SELECT token, count(*)::BIGINT AS cnt FROM w GROUP BY 1
              HAVING count(*) >= 3)
        SELECT token, cnt,
               (row_number() OVER (ORDER BY cnt DESC, token))::BIGINT - 1 AS token_id
        FROM c
    """,
    "corpus_tokenize": """
        WITH w0 AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token
                    FROM documents),
        c AS (SELECT token, count(*)::BIGINT AS cnt FROM w0 GROUP BY 1
              HAVING count(*) >= 3),
        v AS (SELECT token,
                     (row_number() OVER (ORDER BY cnt DESC, token))::BIGINT - 1 AS token_id
              FROM c),
        t AS (SELECT doc_id, CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos,
                     unnest(l) AS tok
              FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS l
                    FROM documents))
        SELECT t.doc_id, t.pos, coalesce(v.token_id, -1) AS token_id
        FROM t LEFT JOIN v ON v.token = t.tok
    """,
    "tfidf_keywords": """
        WITH tf AS (
            SELECT doc_id, tok AS token, count(*)::BIGINT AS tf
            FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
                  FROM documents)
            GROUP BY 1, 2),
        df AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*)::DOUBLE AS n FROM documents),
        s AS (SELECT tf.doc_id, tf.token, round(tf.tf * ln(n.n / df.df), 6) AS tfidf
              FROM tf JOIN df USING (token) CROSS JOIN n),
        r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
              FROM s)
        SELECT doc_id, token, tfidf FROM r WHERE rn <= 3
    """,
    "parts_top_by_brand": """
        WITH r AS (
            SELECT p_brand, p_partkey, p_retailprice,
                   row_number() OVER (PARTITION BY p_brand
                                      ORDER BY p_retailprice DESC, p_partkey) AS rn
            FROM part)
        SELECT p_brand, p_partkey, p_retailprice FROM r WHERE rn <= 3
    """,
    "decontaminate": """
        WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS w FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      w[j] || ' ' || w[j+1] || ' ' || w[j+2] || ' ' || w[j+3] || ' ' || w[j+4] AS sh
               FROM w, unnest(range(1, len(w) - 3)) AS t2(j)),
        bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 10 = 0)
        SELECT s.doc_id, count(*)::BIGINT AS n_hits
        FROM sh s JOIN bench USING (sh)
        WHERE s.doc_id % 10 <> 0
        GROUP BY 1
    """,
}

# dedup_clusters twin: connected components over the exact-Jaccard pair
# graph (the dedup_jaccard twin embedded as a CTE) via recursive-CTE
# min-label propagation — the component minimum reaches every member
# through the lbl < target prune, so min(lbl) per node = component id
# (same construction as crawl_link_components' twin).
ORACLE_SQL["dedup_clusters"] = f"""
    WITH RECURSIVE pairs AS ({ORACLE_SQL["dedup_jaccard"]}),
    e AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    n AS (SELECT doc_id AS node FROM documents),
    walk(node, lbl) AS (
        SELECT node, node FROM n
        UNION
        SELECT e.b, walk.lbl FROM walk JOIN e ON e.a = walk.node
        WHERE walk.lbl < e.b
    )
    SELECT node AS doc_id, min(lbl) AS component, node = min(lbl) AS keep
    FROM walk GROUP BY node
"""

# dedup_cluster_best twin: same component construction, then the
# highest-quality member per component (n_tokens desc, doc_id asc)
ORACLE_SQL["dedup_cluster_best"] = f"""
    WITH RECURSIVE pairs AS ({ORACLE_SQL["dedup_jaccard"]}),
    e AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    n AS (SELECT doc_id AS node FROM documents),
    walk(node, lbl) AS (
        SELECT node, node FROM n
        UNION
        SELECT e.b, walk.lbl FROM walk JOIN e ON e.a = walk.node
        WHERE walk.lbl < e.b
    ),
    comp AS (SELECT node, min(lbl) AS component FROM walk GROUP BY node),
    q AS (
        SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z0-9_]+'))::BIGINT AS n_tokens
        FROM documents
    ),
    r AS (
        SELECT comp.component, comp.node AS doc_id, q.n_tokens,
               row_number() OVER (PARTITION BY comp.component
                                  ORDER BY q.n_tokens DESC, comp.node) AS rn
        FROM comp JOIN q ON q.doc_id = comp.node
    )
    SELECT component, doc_id, n_tokens FROM r WHERE rn = 1
"""

ORACLE_SQL["lang_length_quantiles"] = f"""
    WITH b AS (
        SELECT doc_id, lower(text) AS lt,
               len(regexp_extract_all(text, '[A-Za-z0-9_]+'))::BIGINT AS n_tokens
        FROM documents
    ),
    s AS (SELECT doc_id, n_tokens, {_langid_counts} FROM b),
    l AS (
        SELECT n_tokens,
               CASE WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
                    WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
                    WHEN c_en >= c_es AND c_en >= c_fr THEN 'en'
                    WHEN c_es >= c_fr THEN 'es'
                    ELSE 'fr' END AS pred_lang
        FROM s
    )
    SELECT pred_lang, count(*)::BIGINT AS n_docs,
           quantile_disc(n_tokens, 0.5)::BIGINT AS p50,
           quantile_disc(n_tokens, 0.9)::BIGINT AS p90,
           quantile_disc(n_tokens, 0.99)::BIGINT AS p99
    FROM l GROUP BY pred_lang
"""

ORACLE_SQL["length_quantiles"] = """
    WITH t AS (
        SELECT len(regexp_extract_all(text, '[A-Za-z0-9_]+'))::BIGINT AS n_tokens
        FROM documents
    )
    SELECT count(*)::BIGINT AS n_docs,
           quantile_disc(n_tokens, 0.5)::BIGINT AS p50,
           quantile_disc(n_tokens, 0.9)::BIGINT AS p90,
           quantile_disc(n_tokens, 0.99)::BIGINT AS p99
    FROM t
"""

# dedup_chunks twin: the engine's own chunk/rebuild kernel expressions
# (stages/corpus.py::_chunk_cte / ChunkDedupRebuilder) run corpus-wide —
# 10-token chunks (trailing partial included), df = distinct docs,
# chunks with df >= 2 cut everywhere, survivors re-joined in order.
ORACLE_SQL["dedup_chunks"] = """
    WITH x AS (SELECT doc_id AS i, regexp_extract_all(lower(text), '[a-z0-9_]+') AS w
               FROM documents),
    c AS (SELECT i, j, array_to_string(w[(j-1)*10+1 : j*10], ' ') AS chunk
          FROM x, unnest(range(1, (len(w)+9)//10 + 1)) AS t2(j)),
    df AS (SELECT chunk, count(DISTINCT i) AS df FROM c GROUP BY 1),
    k AS (SELECT c.i, c.j, c.chunk, df.df FROM c JOIN df USING (chunk)),
    reb AS (SELECT i,
                   coalesce(string_agg(chunk, ' ' ORDER BY j) FILTER (WHERE df < 2), '') AS text_clean,
                   (count(*) FILTER (WHERE df >= 2))::BIGINT AS n_removed
            FROM k GROUP BY i)
    SELECT d.doc_id, coalesce(reb.text_clean, '') AS text_clean,
           coalesce(reb.n_removed, 0)::BIGINT AS n_removed
    FROM documents d LEFT JOIN reb ON d.doc_id = reb.i
"""

# dedup_incremental twin: md5-digest anti-join of the 'new' snapshot
# (doc_id % 4 = 0) against the 'old' corpus, then first-per-digest
# within the survivors (same md5 hex as the engine's hashlib kernel).
ORACLE_SQL["dedup_incremental"] = """
    WITH d AS (SELECT doc_id, md5(text) AS digest FROM documents),
    old AS (SELECT DISTINCT digest FROM d WHERE doc_id % 4 <> 0),
    new AS (SELECT * FROM d WHERE doc_id % 4 = 0),
    surv AS (SELECT * FROM new WHERE digest NOT IN (SELECT digest FROM old))
    SELECT min(doc_id)::BIGINT AS doc_id, digest FROM surv GROUP BY digest
"""

# mix_weights twin: per-language token totals, alpha=0.5 temperature
# scaling; sqrt/div are IEEE-identical to the numpy path, rounded to 4.
ORACLE_SQL["mix_weights"] = """
    WITH c AS (
        SELECT lang,
               sum(len(regexp_extract_all(text, '[A-Za-z0-9_]+')))::BIGINT AS n_tokens_total
        FROM documents GROUP BY 1
    )
    SELECT lang, n_tokens_total,
           round(sqrt(n_tokens_total) / (SELECT sum(sqrt(n_tokens_total)) FROM c), 4) AS weight
    FROM c
"""

# lm_perplexity twin: the engine's own scoring kernel expression
# (stages/corpus.py::LMPerplexityScorer) with the model counts computed
# corpus-wide in CTEs. Per-bigram log terms quantize to int64
# (round(ln*1e4)) so the per-doc sum is order-independent — the float
# discipline that makes a several-hundred-term sum hash-match.
ORACLE_SQL["lm_perplexity"] = """
    WITH x AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS w
               FROM documents),
    uni AS (SELECT w1 AS tok, count(*)::BIGINT AS c
            FROM (SELECT unnest(w) AS w1 FROM x) GROUP BY 1),
    bi AS (SELECT g, count(*)::BIGINT AS c
           FROM (SELECT w[j] || ' ' || w[j+1] AS g
                 FROM x, unnest(range(1, len(w))) AS t2(j)) GROUP BY 1),
    v AS (SELECT count(*)::DOUBLE AS v FROM uni),
    p AS (SELECT doc_id, w[j] AS w1, w[j] || ' ' || w[j+1] AS g
          FROM x, unnest(range(1, len(w))) AS t2(j)),
    q AS (SELECT doc_id,
                 CAST(round(ln((coalesce(bi.c, 0) + 1.0)
                               / (coalesce(uni.c, 0) + v.v)) * 10000, 0)
                      AS BIGINT) AS llq
          FROM p CROSS JOIN v
          LEFT JOIN uni ON p.w1 = uni.tok LEFT JOIN bi ON p.g = bi.g),
    d AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(llq) AS s FROM q GROUP BY 1)
    SELECT x.doc_id, coalesce(d.n_bigrams, 0)::BIGINT AS n_bigrams,
           coalesce(round(s / 10000.0, 4), 0.0) AS ll,
           coalesce(round(exp(-(s / 10000.0) / d.n_bigrams), 4), 0.0) AS ppl
    FROM x LEFT JOIN d ON x.doc_id = d.doc_id
"""

# dsir_weights twin: replay the engine's poly+splitmix64 token hash in
# HUGEINT SQL (the simhash twin's chain), bucket mod 1024, add-one
# smoothed target/raw distributions, per-bucket int64-quantized
# log-ratio terms (the engine's own dsir_bucket_terms expression),
# integer per-doc sums — order-independent, exact.
def _dsir_sql() -> str:
    B = 0x9E3779B97F4A7C15
    C1 = 0xBF58476D1CE4E5B9
    C2 = 0x94D049BB133111EB
    return f"""
    WITH tok AS (
        SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
        FROM documents
    ),
    poly AS (
        SELECT doc_id, lang,
               list_reduce(list_transform(string_split(tok, ''), c -> unicode(c)::HUGEINT),
                           (a, b) -> (({_mm('a', B)}) + b) % {_M64}) AS h0
        FROM tok
    ),
    m1 AS (SELECT doc_id, lang, {_mm('xor(h0, h0 // 1073741824)', C1)} AS h1 FROM poly),
    m2 AS (SELECT doc_id, lang, {_mm('xor(h1, h1 // 134217728)', C2)} AS h2 FROM m1),
    bk AS (SELECT doc_id, lang,
                  (xor(h2, h2 // 2147483648) % 1024)::BIGINT AS bucket FROM m2),
    cnt AS (SELECT bucket, count(*)::BIGINT AS c_raw,
                   (count(*) FILTER (WHERE lang = 'en'))::BIGINT AS c_tgt
            FROM bk GROUP BY 1),
    tot AS (SELECT (sum(c_raw) + 1024)::DOUBLE AS rd,
                   (sum(c_tgt) + 1024)::DOUBLE AS td FROM cnt),
    tq AS (SELECT bucket,
                  CAST(round(ln(((c_tgt + 1.0) / tot.td) / ((c_raw + 1.0) / tot.rd)) * 10000, 0)
                       AS BIGINT) AS tq
           FROM cnt CROSS JOIN tot),
    d AS (SELECT bk.doc_id, count(*)::BIGINT AS n_tokens, sum(tq.tq) AS s
          FROM bk JOIN tq USING (bucket) GROUP BY 1),
    dw AS (SELECT doc.doc_id, coalesce(d.n_tokens, 0)::BIGINT AS n_tokens,
                  coalesce(s / 10000.0, 0.0) AS logw
           FROM documents doc LEFT JOIN d ON doc.doc_id = d.doc_id)
    """


ORACLE_SQL["dsir_weights"] = _dsir_sql() + "SELECT doc_id, n_tokens, logw FROM dw"

# dsir_sample twin: Gumbel-top-K resampling over the same per-doc
# weights — u from the splitmix64 finalizer on doc_id (the engine's
# _mix64 chain in HUGEINT), key = round4(logw − ln(−ln(u))).
def _dsir_sample_sql(k: int = DSIR_SAMPLE_K) -> str:
    C1 = 0xBF58476D1CE4E5B9
    C2 = 0x94D049BB133111EB
    u_scale = repr(2.0 ** -53)
    return _dsir_sql() + f""",
    hx AS (SELECT doc_id, doc_id::HUGEINT AS h0 FROM dw),
    hm1 AS (SELECT doc_id, {_mm('xor(h0, h0 // 1073741824)', C1)} AS h1 FROM hx),
    hm2 AS (SELECT doc_id, {_mm('xor(h1, h1 // 134217728)', C2)} AS h2 FROM hm1),
    hu AS (SELECT doc_id,
                  greatest((xor(h2, h2 // 2147483648) // 2048)::DOUBLE * {u_scale},
                           {u_scale}) AS u
           FROM hm2),
    sk AS (SELECT dw.doc_id, dw.n_tokens, dw.logw,
                  round(dw.logw - ln(-ln(hu.u)), 4) AS key
           FROM dw JOIN hu USING (doc_id))
    SELECT doc_id, n_tokens, logw, key FROM sk
    ORDER BY key DESC, doc_id LIMIT {k}
    """


ORACLE_SQL["dsir_sample"] = _dsir_sample_sql()

# dedup_embedding twin: replay the engine's splitmix64 fixed-point
# hyperplane LSH (stages/similarity.py::lsh_planes / HyperplaneLSH)
# bit-for-bit — plane coeff p[d,j] = (mix64((d·nbits+j+seed+1)·B) >> 40)
# − 2^23 in HUGEINT, bucket bit_j = Σ_d floor(x_d·2^20)·p > 0 — then the
# in-bucket verify with round4 list_cosine_similarity (the
# dedup_embedding_exact discipline, threshold compared on the ROUNDED
# value like the engine).
def _emb_lsh_pairs_sql(dim: int = 64, nbits: int = EMB_LSH_NBITS,
                       seed: int = EMB_LSH_SEED,
                       thr: float = EMB_DEDUP_THRESHOLD) -> str:
    B = 0x9E3779B97F4A7C15
    C1 = 0xBF58476D1CE4E5B9
    C2 = 0x94D049BB133111EB
    return f"""
    WITH q AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
               CAST(floor(unnest(embedding)::DOUBLE * 1048576.0) AS BIGINT) AS v
        FROM embeddings),
    pidx AS (SELECT dd.d, jj.j, (dd.d * {nbits} + jj.j + {seed} + 1)::HUGEINT AS i0
             FROM (SELECT unnest(range({dim})) AS d) dd,
                  (SELECT unnest(range({nbits})) AS j) jj),
    ph0 AS (SELECT d, j, {_mm('i0', B)} AS h0 FROM pidx),
    pm1 AS (SELECT d, j, {_mm('xor(h0, h0 // 1073741824)', C1)} AS h1 FROM ph0),
    pm2 AS (SELECT d, j, {_mm('xor(h1, h1 // 134217728)', C2)} AS h2 FROM pm1),
    pl AS (SELECT d, j,
                  ((xor(h2, h2 // 2147483648) // 1099511627776) - 8388608)::BIGINT AS p
           FROM pm2),
    dots AS (SELECT q.vec_id, pl.j, sum(q.v * pl.p) AS s
             FROM q JOIN pl USING (d) GROUP BY 1, 2),
    bk AS (SELECT vec_id,
                  sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS bucket
           FROM dots GROUP BY 1)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                        CAST(eb.embedding AS DOUBLE[])), 4) AS cos
    FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    JOIN embeddings ea ON ea.vec_id = a.vec_id
    JOIN embeddings eb ON eb.vec_id = b.vec_id
    WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                       CAST(eb.embedding AS DOUBLE[])), 4) >= {thr!r}
    """


ORACLE_SQL["dedup_embedding"] = _emb_lsh_pairs_sql()

# kmeans_clusters twin: unrolled-CTE replay of the engine's fixed-point
# integer k-means (stages/similarity.py::kmeans_int) — floor(x·2^20)
# quantization, exact int64 distances, TRUNCATING integer division for
# centroid updates (DuckDB's //), argmin ties to the lowest cluster,
# init = the k lowest-id vectors, empty clusters keep their centroid.
def _kmeans_ctes(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    """The WITH-body CTE chain ending in centroids c{iters} plus the
    final-assignment CTE ``af`` (vec_id, c) — shared by the
    kmeans_clusters and semdedup twins."""
    scale = 1 << 20
    parts = [
        f"""q AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
               CAST(floor(unnest(embedding)::DOUBLE * {scale}.0) AS BIGINT) AS v
        FROM embeddings)""",
        f"""c0 AS (
        SELECT r - 1 AS c, j, v FROM (
            SELECT q.j, q.v, dense_rank() OVER (ORDER BY q.vec_id) AS r
            FROM q
            WHERE q.vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})))""",
    ]
    for i in range(1, iters + 1):
        parts.append(f"""d{i} AS (
        SELECT q.vec_id, cc.c, sum((q.v - cc.v) * (q.v - cc.v)) AS d2
        FROM q JOIN c{i - 1} cc ON q.j = cc.j GROUP BY 1, 2)""")
        parts.append(f"""a{i} AS (
        SELECT vec_id, c FROM (
            SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
            FROM d{i})
        WHERE rn = 1)""")
        parts.append(f"""u{i} AS (
        SELECT a.c, q.j, CAST(sum(q.v) // count(*) AS BIGINT) AS v
        FROM a{i} a JOIN q ON q.vec_id = a.vec_id
        GROUP BY a.c, q.j)""")
        parts.append(f"""c{i} AS (
        SELECT p.c, p.j, coalesce(u.v, p.v) AS v
        FROM c{i - 1} p LEFT JOIN u{i} u ON u.c = p.c AND u.j = p.j)""")
    parts.append(f"""df AS (
        SELECT q.vec_id, cc.c, sum((q.v - cc.v) * (q.v - cc.v)) AS d2
        FROM q JOIN c{iters} cc ON q.j = cc.j GROUP BY 1, 2)""")
    parts.append("""af AS (
        SELECT vec_id, c FROM (
            SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
            FROM df)
        WHERE rn = 1)""")
    return ",\n    ".join(parts)


ORACLE_SQL["kmeans_clusters"] = f"""
    WITH {_kmeans_ctes()}
    SELECT vec_id, c::BIGINT AS cluster FROM af
"""

# semdedup twin: the k-means chain above, then the engine's dominance
# rule — a vector is dropped iff a LOWER-id vector in its cluster has
# round4 cosine >= tau with it (the same round/compare discipline as
# the green dedup_embedding_exact twin).
ORACLE_SQL["semdedup"] = f"""
    WITH {_kmeans_ctes()}
    SELECT s.vec_id, s.c::BIGINT AS cluster
    FROM af s
    WHERE NOT EXISTS (
        SELECT 1
        FROM af t
        JOIN embeddings ea ON ea.vec_id = s.vec_id
        JOIN embeddings eb ON eb.vec_id = t.vec_id
        WHERE t.c = s.c AND t.vec_id < s.vec_id
          AND round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                           CAST(eb.embedding AS DOUBLE[])), 4) >= {SEMDEDUP_TAU!r}
    )
"""

# ann_ivf twin: the fixed-point k-means CTE chain at (IVF_K, KMEANS_ITERS)
# gives centroids c{iters} + assignments af; the query (vec_id = 0)
# quantizes to the same floor(x·2^20) grid, lists rank by exact int64
# squared distance (ties → lowest c — the engine's lexsort), candidates
# come from the probed lists only, scored with round4
# list_cosine_similarity (the green ann_topk discipline).
def _ann_ivf_sql() -> str:
    from .params import IVF_K, IVF_NPROBE, IVF_TOPK

    return f"""
    WITH {_kmeans_ctes(k=IVF_K, iters=KMEANS_ITERS)},
    qv AS (SELECT generate_subscripts(embedding, 1) - 1 AS j,
                  CAST(floor(unnest(embedding)::DOUBLE * 1048576.0) AS BIGINT) AS v
           FROM embeddings WHERE vec_id = 0),
    pd AS (SELECT cc.c, sum((qv.v - cc.v) * (qv.v - cc.v)) AS d2
           FROM qv JOIN c{KMEANS_ITERS} cc USING (j) GROUP BY 1),
    probe AS (SELECT c FROM pd ORDER BY d2, c LIMIT {IVF_NPROBE}),
    cand AS (SELECT af.vec_id FROM af JOIN probe USING (c))
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(q.embedding AS DOUBLE[])), 4) AS cos
    FROM cand
    JOIN embeddings e USING (vec_id)
    CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    ORDER BY cos DESC, e.vec_id LIMIT {IVF_TOPK}
    """


ORACLE_SQL["ann_ivf"] = _ann_ivf_sql()

# pmi_top twin: the engine's own count + quantized-ln expressions
# corpus-wide (n_total inlined as a DOUBLE on the engine side equals
# the (sum)::DOUBLE here — integer totals < 2^53 are double-exact).
ORACLE_SQL["pmi_top"] = f"""
    WITH x AS (SELECT regexp_extract_all(lower(text), '[a-z0-9_]+') AS w FROM documents),
    uni AS (SELECT w1 AS tok, count(*)::BIGINT AS c
            FROM (SELECT unnest(w) AS w1 FROM x) GROUP BY 1),
    n AS (SELECT sum(c)::DOUBLE AS v FROM uni),
    bi AS (SELECT g AS bigram, count(*)::BIGINT AS cnt
           FROM (SELECT w[j] || ' ' || w[j+1] AS g
                 FROM x, unnest(range(1, len(w))) AS t2(j)) GROUP BY 1),
    s AS (SELECT bi.bigram, bi.cnt,
                 CAST(round(ln((bi.cnt * n.v) / (ca.c * cb.c)) * 10000, 0) AS BIGINT) AS q
          FROM bi CROSS JOIN n
          JOIN uni ca ON ca.tok = string_split(bi.bigram, ' ')[1]
          JOIN uni cb ON cb.tok = string_split(bi.bigram, ' ')[2]
          WHERE bi.cnt >= {PMI_MIN_COUNT})
    SELECT bigram, cnt, q / 10000.0 AS pmi
    FROM s ORDER BY q DESC, bigram LIMIT 100
"""

# text_entropy twin: the engine's own per-doc kernel expression
# corpus-wide (stages/corpus.py::_ENTROPY_SQL) — int64-quantized type
# log terms, integer per-doc sums, one trailing round4.
ORACLE_SQL["text_entropy"] = """
    WITH x AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS w
               FROM documents),
    tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf
           FROM (SELECT doc_id, unnest(w) AS tok FROM x) GROUP BY 1, 2),
    n AS (SELECT doc_id, len(w)::BIGINT AS n FROM x),
    q AS (SELECT tf.doc_id, tf.tf,
                 CAST(round(ln(tf.tf / (n.n * 1.0)) * 10000, 0) AS BIGINT) AS lq
          FROM tf JOIN n USING (doc_id)),
    d AS (SELECT doc_id, sum(tf * lq) AS s FROM q GROUP BY 1)
    SELECT x.doc_id, n.n AS n_tokens,
           coalesce(round(-s / (n.n * 10000.0), 4), 0.0) AS entropy
    FROM x JOIN n ON x.doc_id = n.doc_id LEFT JOIN d ON x.doc_id = d.doc_id
"""

# corpus_curate twin: the two score twins joined as subqueries, same
# gates as the engine (comparisons run on round4 values on both sides).
ORACLE_SQL["corpus_curate"] = f"""
    SELECT lm.doc_id, te.n_tokens, te.entropy, lm.ppl
    FROM ({ORACLE_SQL["lm_perplexity"]}) lm
    JOIN ({ORACLE_SQL["text_entropy"]}) te USING (doc_id)
    WHERE te.n_tokens >= {CURATE_MIN_TOKENS}
      AND te.entropy >= {CURATE_ENT_MIN!r} AND lm.ppl <= {CURATE_PPL_MAX!r}
"""

# gopher_rules twin: the ENGINE's kernel SQL verbatim (corpus.py::
# _gopher_sql, thresholds interpolated from params.py on both sides),
# wrapped over documents via a tbl CTE — the kernel IS the oracle.
def _gopher_twin() -> str:
    from ..stages.corpus import _gopher_sql

    body = _gopher_sql(
        GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS, GOPHER_MEAN_LEN_MIN,
        GOPHER_MEAN_LEN_MAX, GOPHER_UNIQ_MIN, GOPHER_MIN_STOPWORDS,
    ).lstrip()
    assert body.startswith("WITH")
    return f"""
    SELECT i AS doc_id, n_tokens, mean_token_len, uniq_ratio, n_stop, gopher_pass
    FROM (WITH tbl AS (SELECT doc_id AS i, text AS t FROM documents),
          {body[len("WITH"):]})
"""


ORACLE_SQL["gopher_rules"] = _gopher_twin()


# knn_graph twin: self cross join + per-source row_number — the plain
# window form of the engine's broadcast-matmul partial top-k. Same
# round4 float discipline as ann_topk/ann_multi.
ORACLE_SQL["knn_graph"] = f"""
    WITH s AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4) AS cos
        FROM embeddings a CROSS JOIN embeddings b
        WHERE a.vec_id != b.vec_id
    ),
    r AS (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cos DESC, nbr_id) AS rn
        FROM s
    )
    SELECT vec_id, nbr_id, cos FROM r WHERE rn <= {KNN_GRAPH_K}
"""

# ccnet_buckets twin: per-language perplexity terciles — plain
# ntile(3) over the lm_perplexity twin joined to the lang column; the
# engine's offset arithmetic reproduces exactly this window function.
ORACLE_SQL["ccnet_buckets"] = f"""
    WITH lm AS ({ORACLE_SQL["lm_perplexity"]}),
    j AS (SELECT lm.doc_id, d.lang, lm.ppl
          FROM lm JOIN documents d USING (doc_id)),
    r AS (SELECT doc_id, lang, ppl,
                 ntile({CCNET_NBUCKETS}) OVER (PARTITION BY lang ORDER BY ppl, doc_id) AS nt
          FROM j)
    SELECT doc_id, lang, ppl,
           CASE WHEN nt = 1 THEN 'head' WHEN nt = 2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM r
"""

# crawl oracle twins read the single-threaded oracle's parquet fixture
# (built lazily, deterministic) — see crawl_queries.crawl_oracle_sql.
from .crawl_queries import crawl_oracle_sql  # noqa: E402

ORACLE_SQL.update(crawl_oracle_sql())
