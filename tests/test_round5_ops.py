"""Round-5 operator additions: Gopher rule-set filter, CCNet perplexity
buckets, exact kNN graph, interleaved multimodal sequence packing.
Each is pinned against its DuckDB twin on crafted inputs here (variance
on every rule / tie / modality), beyond the fixture corpus the
conformance gate sees.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from freshonions_torscraper_ray.pipelines import queries as q
from freshonions_torscraper_ray.pipelines.oracle_sqls import ORACLE_SQL
from freshonions_torscraper_ray.pipelines.params import (
    CCNET_NBUCKETS,
    KNN_GRAPH_K,
    PACK_SEQ_BUDGET,
)


def _cmp(engine_df: pd.DataFrame, oracle_df: pd.DataFrame):
    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if pd.api.types.is_float_dtype(df[c]):
                df[c] = df[c].astype("float64").round(4)
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

    a, b = norm(engine_df), norm(oracle_df)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def _oracle(sf_dir: str, name: str) -> pd.DataFrame:
    con = duckdb.connect()
    for tbl in ("documents", "embeddings"):
        try:
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'"
            )
        except duckdb.Error:
            pass
    return con.execute(ORACLE_SQL[name]).df()


@pytest.fixture()
def doc_sf(tmp_path):
    texts = [
        "short doc the end",  # fails min-tokens
        ("the quick brown fox jumps over a lazy dog " * 8).strip(),  # low uniq
        "the a " + " ".join(f"word{i}" for i in range(60)),  # passes
        "zz " * 60,  # no stopwords, low uniq, short mean len
        " ".join(f"unique{i}" for i in range(80)),  # no stopwords
        "",  # empty
    ]
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en", "en", "en", "de", "de", "de"], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_gopher_rules_matches_twin_and_varies(ray_session, doc_sf):
    eng = q.q_gopher_rules(doc_sf).to_pandas()
    ora = _oracle(doc_sf, "gopher_rules")
    _cmp(eng, ora)
    # the crafted corpus exercises both outcomes and >1 failing rule
    got = eng.sort_values("doc_id")["gopher_pass"].tolist()
    assert got == [False, False, True, False, False, False]


def test_ccnet_buckets_matches_twin_ntile(ray_session, doc_sf):
    eng = q.q_ccnet_buckets(doc_sf).to_pandas()
    ora = _oracle(doc_sf, "ccnet_buckets")
    _cmp(eng, ora)
    # per-language ntile: every lang's buckets differ by at most one row
    sizes = eng.groupby(["lang", "bucket"]).size()
    for lang in eng["lang"].unique():
        s = sizes[lang]
        assert s.max() - s.min() <= 1
        assert len(s) <= CCNET_NBUCKETS


def test_ccnet_buckets_distributed_path_matches(ray_session, doc_sf, monkeypatch):
    """Force the over-threshold scoring path (hash-join LM + adaptive
    lang join): bucket assignment must be identical to the broadcast
    path and to the twin."""
    want = q.q_ccnet_buckets(doc_sf).to_pandas()
    monkeypatch.setenv("GRAFT_LM_BROADCAST_MAX_KEYS", "0")
    got = q.q_ccnet_buckets(doc_sf).to_pandas()
    _cmp(got, want)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 29, 100])
def test_ntile_arithmetic_matches_sql(n):
    """The engine's offset→bucket arithmetic (q_ccnet_buckets.assign)
    must reproduce SQL ntile(3) for every group size, including
    n < nbuckets and every remainder class — pure arithmetic, no Ray."""
    nb = CCNET_NBUCKETS
    rank = np.arange(n, dtype=np.int64)
    q_, r = divmod(n, nb)
    big = r * (q_ + 1)
    nt = np.where(
        rank < big,
        rank // max(q_ + 1, 1) + 1,
        r + (rank - big) // max(q_, 1) + 1,
    ).astype(np.int64)
    want = (
        duckdb.connect()
        .execute(
            f"SELECT ntile({nb}) OVER (ORDER BY i) FROM range({n}) t(i) ORDER BY i"
        )
        .df()
        .iloc[:, 0]
        .to_numpy()
    )
    assert (nt == want).all()


@pytest.fixture()
def emb_sf(tmp_path):
    rng = np.random.default_rng(7)
    n, d = 40, 8
    mat = rng.normal(size=(n, d)).astype(np.float32)
    mat[5] = mat[3]  # exact duplicate → cos 1.0 tie broken by id
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_knn_graph_matches_twin(ray_session, emb_sf):
    eng = q.q_knn_graph(emb_sf).to_pandas()
    ora = _oracle(emb_sf, "knn_graph")
    _cmp(eng, ora)
    # exactly k neighbors per vector, none of them the vector itself
    per = eng.groupby("vec_id").size()
    assert (per == KNN_GRAPH_K).all()
    assert (eng["vec_id"] != eng["nbr_id"]).all()
    # the planted duplicate pair finds each other first
    top3 = eng[eng["vec_id"] == 3].iloc[0]
    assert top3["nbr_id"] == 5 and top3["cos"] == 1.0


def test_spans_pack_matches_twin_over_fixture(ray_session):
    from freshonions_torscraper_ray.pipelines.crawl_queries import (
        crawl_oracle_sql,
        q_spans_pack,
    )

    eng = q_spans_pack("unused").to_pandas()
    ora = duckdb.connect().execute(crawl_oracle_sql()["spans_pack"]).df()
    _cmp(eng, ora)
    # budget respected: per-sequence cost ≤ budget except single-span
    # overflow spills (next-fit floor-division semantics)
    tot = eng.groupby("seq_id")["cost"].sum()
    over = tot[tot > PACK_SEQ_BUDGET]
    # overflow sequences only happen via a span crossing the boundary
    assert (tot > 0).all() and len(over) <= len(eng)
    # media spans carry fixed costs
    img = eng[eng["kind"] == "image"]
    assert not img.empty and (img["cost"] == 64).all()


def test_crawl_cpu_budget_guard(ray_session, tmp_path):
    """An actor-reservation sum beyond the session's CPUs must raise
    loudly BEFORE any actor is created (it used to hang the first
    seed-insertion RPC forever — observed at num_cpus=2)."""
    from freshonions_torscraper_ray.config import CrawlConfig
    from freshonions_torscraper_ray.pipelines.crawl import CrawlEngine
    from freshonions_torscraper_ray.synth import write_synth_web

    web = tmp_path / "web"
    web.mkdir()
    write_synth_web(str(web), seed=1, n_domains=12, n_buckets=2)
    cfg = CrawlConfig(num_scheduler_shards=40, num_cuckoo_shards=40, max_rounds=1)
    eng = CrawlEngine(str(web), str(tmp_path / "store"), cfg)
    with pytest.raises(RuntimeError, match="actor reservations"):
        eng.start_fresh()


def test_word_pattern_cross_engine_contract():
    """Arrow's RE2 count and DuckDB's regexp_extract_all must agree on
    WORD_PATTERN token counts for arbitrary ASCII text — the contract
    every kernel/twin pair in this repo rests on. Property-tested
    beyond the fixture corpus."""
    import pyarrow.compute as pc
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from freshonions_torscraper_ray.functions.regexes import WORD_PATTERN

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.text(
        alphabet="abcXYZ019_ .,;\t\n-#*'\"()!", min_size=0, max_size=120
    ), min_size=1, max_size=20))
    def check(texts):
        arrow = pc.count_substring_regex(
            pa.array(texts, pa.string()), WORD_PATTERN
        ).to_pylist()
        tbl = pa.table({"t": pa.array(texts, pa.string())})  # noqa: F841
        duck = [
            r[0]
            for r in duckdb.connect()
            .execute(f"SELECT len(regexp_extract_all(t, '{WORD_PATTERN}')) FROM tbl")
            .fetchall()
        ]
        assert arrow == duck

    check()


def test_crawl_job_entrypoint_runs_and_resumes(ray_session, tmp_path):
    """The `ray job submit` entrypoint (scripts/crawl_job.py): fresh run
    emits metrics and commits rounds; a --resume re-run restores from
    the checkpoint and fetches nothing new (the web is already drained)."""
    import os
    import sys

    scripts_dir = os.path.join(os.path.dirname(__file__), "..", "scripts")
    sys.path.insert(0, scripts_dir)
    try:
        import crawl_job
    finally:
        sys.path.pop(0)
    from freshonions_torscraper_ray.synth import write_synth_web

    web = tmp_path / "web"
    web.mkdir()
    write_synth_web(str(web), seed=3, n_domains=12, n_buckets=2)
    store = str(tmp_path / "store")

    first = crawl_job.main([
        "--web-dir", str(web), "--store-dir", store,
        "--max-rounds", "3", "--scheduler-shards", "2", "--cuckoo-shards", "2",
    ])
    assert first["fetched_total"] > 0 and first["rounds"] >= 1

    again = crawl_job.main([
        "--web-dir", str(web), "--store-dir", store, "--resume",
        "--max-rounds", "3", "--scheduler-shards", "2", "--cuckoo-shards", "2",
    ])
    assert again["resumed"] and again["fetched_total"] == first["fetched_total"]
    assert again["fetched_this_run"] == 0


def test_spans_pack_bucketed_prefix_sum_on_random_webs(ray_session):
    """Property: the order-preserving-bucket two-pass prefix sum equals
    a single-pass cumsum over the global (doc_id, offset) order, for
    randomized doc_id populations (shared and colliding 2-char domain
    prefixes, many spans per doc, all modalities)."""
    import random

    import ray.data as rd

    from freshonions_torscraper_ray.pipelines.crawl_queries import q_spans_pack
    from freshonions_torscraper_ray.pipelines.params import PACK_SEQ_BUDGET

    rng = random.Random(11)
    kinds = ["title", "text", "link", "image", "video", "audio"]
    rows = []
    for _ in range(120):
        dom = "".join(rng.choice("abcdefg234") for _ in range(8)) + ".onion"
        path = "/" if rng.random() < 0.3 else f"/p/{rng.randrange(40)}"
        doc_id = f"http://{dom}{path}"
        spans, off = [], 0
        for _ in range(rng.randrange(1, 7)):
            k = rng.choice(kinds)
            txt = "" if k in ("image", "video", "audio") else " ".join(
                rng.choice(["tok", "word", "x9", "--", "a"]) for _ in range(rng.randrange(0, 30))
            )
            spans.append({"kind": k, "text": txt, "media_ref": "", "offset": off})
            off += max(len(txt), 1)
        rows.append({"doc_id": doc_id, "spans": spans})
    # unique doc_ids only (duplicates would make the global order ambiguous)
    seen, uniq = set(), []
    for r in rows:
        if r["doc_id"] not in seen:
            seen.add(r["doc_id"])
            uniq.append(r)

    ds = rd.from_items(uniq).repartition(7)  # force multi-block layouts
    got = q_spans_pack("unused", _docs=ds).to_pandas()

    # single-pass reference: explode in python, one global cumsum
    cost_of = {"image": 64, "video": 256, "audio": 128}
    import re as _re

    flat = []
    for r in uniq:
        for s in r["spans"]:
            c = cost_of.get(s["kind"], len(_re.findall(r"[A-Za-z0-9_]+", s["text"])))
            flat.append((r["doc_id"], s["offset"], s["kind"], c))
    flat.sort(key=lambda t: (t[0], t[1]))
    run, want = 0, {}
    for doc_id, off, kind, c in flat:
        want[(doc_id, off)] = run // PACK_SEQ_BUDGET
        run += c
    assert len(got) == len(flat)
    for _, row in got.iterrows():
        assert want[(row["doc_id"], row["offset"])] == row["seq_id"], row
