"""Cross-language hash contract: the HUGEINT SQL replays of the
byte-level token hash (Horner poly + splitmix64) and the mod-2^61-1
universal hash must equal the numpy kernels BIT-FOR-BIT — the
dedup_simhash and dedup_minhash oracle twins stand on this contract.
Property-tested over random ASCII corpora (the documented content
assumption), not just the fixture corpus the conformance gate sees.
"""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from freshonions_torscraper_ray.functions.tokenize import token_stats
from freshonions_torscraper_ray.pipelines.oracle_sqls import _M64, _mm
from freshonions_torscraper_ray.stages.dedup import (
    MinHashParams,
    MinHasher,
    shingle_hash_sets,
)

_B = 0x9E3779B97F4A7C15
_C1 = 0xBF58476D1CE4E5B9
_C2 = 0x94D049BB133111EB

_TOKEN_HASH_SQL = f"""
WITH th0 AS (
    SELECT tok,
           list_reduce(list_transform(string_split(tok, ''), c -> unicode(c)::HUGEINT),
                       (x, y) -> (({_mm('x', _B)}) + y) % {_M64}) AS h0
    FROM tbl
),
tm1 AS (SELECT tok, {_mm('xor(h0, h0 // 1073741824)', _C1)} AS h1 FROM th0),
tm2 AS (SELECT tok, {_mm('xor(h1, h1 // 134217728)', _C2)} AS h2 FROM tm1)
SELECT tok, xor(h2, h2 // 2147483648) AS h FROM tm2
"""

# lowercase word-class tokens: the only strings the per-token hash is
# ever fed (the tokenizer emits [a-z0-9_]+ runs of lowered bytes)
_token = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", min_size=1, max_size=24)


@settings(max_examples=30, deadline=None)
@given(st.lists(_token, min_size=1, max_size=40, unique=True))
def test_sql_token_hash_matches_numpy_kernel(tokens):
    st_ = token_stats([" ".join(tokens)])
    # unique tokens, single doc: kernel hashes appear in token order
    assert len(st_.hashes) == len(tokens)
    want = dict(zip(tokens, (int(h) for h in st_.hashes)))
    import pyarrow as pa

    tbl = pa.table({"tok": pa.array(tokens)})  # noqa: F841 — duckdb by name
    got = dict(duckdb.connect().execute(_TOKEN_HASH_SQL).fetchall())
    assert {k: int(v) for k, v in got.items()} == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdefgh _", min_size=0, max_size=60),
        min_size=1,
        max_size=12,
    )
)
def test_universal_hash_sql_matches_engine_signature(texts):
    """(a·x+b) mod 2^61-1 signature lanes: HUGEINT SQL == MinHasher."""
    p = MinHashParams()
    m = MinHasher(p)
    sigs = m.signatures(texts)
    lens, flat = shingle_hash_sets(texts, p.shingle_k)
    a, b = m.a, m.b
    P = (1 << 61) - 1
    con = duckdb.connect()
    off = 0
    for d, n in enumerate(lens):
        shs = flat[off : off + n]
        off += n
        if n == 0:
            assert (sigs[d] == np.uint64(P)).all()
            continue
        vals = ", ".join(f"({int(s)})" for s in shs)
        for lane in (0, p.num_perms // 2, p.num_perms - 1):
            (got,) = con.execute(
                f"""
                WITH s0(sh0) AS (VALUES {vals}),
                s AS (SELECT CAST(sh0 AS HUGEINT) AS sh FROM s0),
                x AS (SELECT CASE WHEN sh // {1 << 61} + sh % {1 << 61} >= {P}
                                  THEN sh // {1 << 61} + sh % {1 << 61} - {P}
                                  ELSE sh // {1 << 61} + sh % {1 << 61} END AS x
                      FROM s)
                SELECT min(({int(a[lane])} * x + {int(b[lane])}) % {P}) FROM x
                """
            ).fetchone()
            assert int(got) == int(sigs[d][lane]), (d, lane)
