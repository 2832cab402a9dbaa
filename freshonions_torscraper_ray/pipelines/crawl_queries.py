"""Crawl-output queries with a REAL oracle cross-check through DuckDB.

The driver's correctness gate can only oracle-check SQL over parquet, so
these queries arrange a genuine distributed-vs-reference comparison:

- the single-threaded semantic oracle (oracle.py, pure Python) writes its
  pages/links/seen/frontier tables to a deterministic /tmp fixture path;
  the ``oracle_sql()`` twins SELECT from those parquet files;
- the ``queries()`` callables run the DISTRIBUTED engine (actor shards +
  Ray Data round pipeline) over the same synthetic web and return its
  live output.

A value-hash match therefore proves the Ray engine reproduces the
reference semantics — the same assertion as the pytest goldens, but
visible to the driver's CORRECTNESS report.

Fixture: seeded synthetic web (60 domains), CrawlConfig below; built
lazily and cached under the FIX_DIR below (both sides are
deterministic, so rebuilds are byte-identical).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..oracle import build_content, build_robots, crawl_oracle
from ..synth import domain_name, write_synth_web
from .params import (
    PACK_AUDIO_TOKENS as _PACK_AUD,
    PACK_IMG_TOKENS as _PACK_IMG,
    PACK_SEQ_BUDGET as _PACK_BUDGET,
    PACK_VIDEO_TOKENS as _PACK_VID,
)

FIX_DIR = "/tmp/onionray_crawlq_v5"  # v5: adds metrics.parquet to the fixture
N_DOMAINS = 60
SEED = 42
# 8 rounds with alive re-checks enabled: the driver gate also covers the
# backoff/retry scheduling path; budget-capped tails keep the frontier
# residue non-empty for comparison. index_text exercises the incremental
# search-index sink (per-round postings segments) in the same run.
CFG = CrawlConfig(
    max_rounds=8,
    num_scheduler_shards=3,
    num_cuckoo_shards=4,
    recheck_dead=True,
    recheck_backoff=2,
    recheck_max_retries=1,
    index_text=True,
)

PAGE_QCOLS = [
    "url", "domain", "status", "size", "title", "text", "is_frontpage",
    "clone_fp", "depth", "round", "vtime", "fetch_order",
]


def _seed_urls() -> list[str]:
    return [f"http://{domain_name(SEED, i)}/" for i in range(0, N_DOMAINS, 3)]


def ensure_oracle_fixture() -> str:
    """Run the pure-Python oracle once; write its tables as parquet."""
    odir = os.path.join(FIX_DIR, "oracle")
    marker = os.path.join(odir, "_done")
    if os.path.exists(marker):
        return odir
    os.makedirs(odir, exist_ok=True)
    res = crawl_oracle(_seed_urls(), build_content(SEED, N_DOMAINS), build_robots(SEED, N_DOMAINS), CFG)
    page_schema = pa.schema(
        [
            ("url", pa.string()), ("domain", pa.string()), ("status", pa.int32()),
            ("size", pa.int64()), ("title", pa.string()), ("text", pa.large_string()),
            ("is_frontpage", pa.bool_()), ("clone_fp", pa.int64()), ("depth", pa.int32()),
            ("round", pa.int32()), ("vtime", pa.float64()), ("fetch_order", pa.int64()),
        ]
    )
    rows = [
        {**{k: p[k] for k in p}, "is_frontpage": p["url"].endswith(".onion/")}
        for p in res.pages
    ]
    pages = pa.Table.from_pylist([{k: r[k] for k in PAGE_QCOLS} for r in rows], schema=page_schema)
    pq.write_table(pages, os.path.join(odir, "pages.parquet"))
    links = pa.Table.from_arrays(
        [pa.array([l[i] for l in res.links], pa.string()) for i in range(5)],
        names=["src_url", "src_domain", "dst_url", "dst_domain", "anchor"],
    )
    pq.write_table(links, os.path.join(odir, "links.parquet"))
    emails = pa.Table.from_arrays(
        [pa.array([e[i] for e in res.emails], pa.string()) for i in range(3)],
        names=["address", "url", "domain"],
    )
    pq.write_table(emails, os.path.join(odir, "emails.parquet"))
    seen = pa.Table.from_arrays([pa.array(sorted(res.seen), pa.string())], names=["url"])
    pq.write_table(seen, os.path.join(odir, "seen.parquet"))
    frontier = pa.Table.from_arrays(
        [
            pa.array([f[0] for f in res.frontier_residue], pa.string()),
            pa.array([f[1] for f in res.frontier_residue], pa.string()),
            pa.array([f[2] for f in res.frontier_residue], pa.int32()),
        ],
        names=["url", "domain", "depth"],
    )
    pq.write_table(frontier, os.path.join(odir, "frontier.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return odir


def ensure_engine_fixture() -> str:
    """Run the distributed engine once (Ray must be initialized by the
    caller/driver); dump pages/links/seen/frontier parquet."""
    edir = os.path.join(FIX_DIR, "engine")
    marker = os.path.join(edir, "_done")
    if os.path.exists(marker):
        return edir
    import ray

    from .crawl import CrawlEngine

    os.makedirs(edir, exist_ok=True)
    web_dir = os.path.join(FIX_DIR, "web")
    if not os.path.exists(os.path.join(web_dir, "meta.json")):
        os.makedirs(web_dir, exist_ok=True)
        write_synth_web(web_dir, seed=SEED, n_domains=N_DOMAINS, n_buckets=4)
    store_dir = os.path.join(edir, "store")
    eng = CrawlEngine(web_dir, store_dir, CFG)
    eng.run()
    pages = eng.pages_table()
    pq.write_table(pages.select(PAGE_QCOLS), os.path.join(edir, "pages.parquet"))
    pq.write_table(eng.store.read_all_rounds("links"), os.path.join(edir, "links.parquet"))
    emails = eng.store.read_all_rounds("emails")
    pq.write_table(emails, os.path.join(edir, "emails.parquet"))
    # shard-side state export (round-2 VERDICT fix): shards write their
    # own frontier/banned partitions; seen is a distributed
    # union-distinct — no per-URL Python collections on the driver
    eng.export_state_parquet(os.path.join(edir, "state"))
    # checkpointed per-partition lineage/metrics rows (north-rule
    # surface) — exported so queries can cross-check them vs the oracle
    pq.write_table(eng.store.read_all_rounds("metrics"), os.path.join(edir, "metrics.parquet"))
    eng.shutdown()
    with open(marker, "w") as f:
        f.write("ok")
    return edir


# ----------------------------------------------------------- queries()


def q_crawl_pages(sf_dir: str):
    """Distributed crawl pages vs oracle pages (span-sequence equality —
    the north-rule invariant — via clone_fp/text/title/vtime/order)."""
    edir = ensure_engine_fixture()
    return pq.read_table(os.path.join(edir, "pages.parquet"))


def q_crawl_links(sf_dir: str):
    edir = ensure_engine_fixture()
    return pq.read_table(os.path.join(edir, "links.parquet"))


def q_crawl_emails(sf_dir: str):
    edir = ensure_engine_fixture()
    return pq.read_table(os.path.join(edir, "emails.parquet"))


def q_crawl_seen(sf_dir: str):
    """Final URL-seen set equality (cuckoo+exact shards vs oracle set)."""
    edir = ensure_engine_fixture()
    return pq.read_table(os.path.join(edir, "state", "seen"))


def q_crawl_frontier_residue(sf_dir: str):
    """Unfetched frontier residue (budget-capped tails) equality."""
    edir = ensure_engine_fixture()
    return pq.read_table(os.path.join(edir, "state", "frontier"))


def _crawl_fts_index() -> str:
    """Compact the engine fixture's per-round postings segments (written
    by the fetch workers under cfg.index_text) into the query layout."""
    from ..stages.text_index import compact_crawl_index
    from ..store import RoundStore

    edir = ensure_engine_fixture()
    idx = compact_crawl_index(RoundStore(os.path.join(edir, "store")))
    assert idx is not None, "engine fixture ran without index_text"
    return idx


CRAWL_SEARCH_TERM = "market"
CRAWL_BM25_TERMS = ("market", "wallet")


def q_crawl_search_rank(sf_dir: str):
    """S5/O30 over the crawl-fed INCREMENTAL index: fetch workers emit a
    postings segment per round (the reference indexed every crawled page
    into Elasticsearch as it was fetched); segments compact into the
    partition-pruned layout; score = token tf of the query term. The SQL
    twin recomputes tf from the ORACLE's pages text, so a hash match
    verifies the whole sink → segment → compaction → query path."""
    from ..stages.text_index import crawl_term_tf_topk

    return crawl_term_tf_topk(_crawl_fts_index(), CRAWL_SEARCH_TERM, k=20)


def q_crawl_search_bm25(sf_dir: str):
    """BM25 over the crawl-fed incremental index (same formula and
    rounding discipline as ``search_rank_bm25``; df/n/avgdl over the
    status-200 crawl corpus)."""
    from ..stages.text_index import crawl_bm25_topk

    return crawl_bm25_topk(_crawl_fts_index(), CRAWL_BM25_TERMS, k=20)


def q_crawl_clone_domains(sf_dir: str):
    """O25 clone grouping over the crawl output: frontpages sharing a
    clone_fp; earliest fetch is genuine. Runs as a Ray groupby over the
    engine's pages; oracle twin is a SQL window over the oracle's pages."""
    import pandas as pd
    import ray.data as rd

    edir = ensure_engine_fixture()
    ds = rd.read_parquet(
        os.path.join(edir, "pages.parquet"),
        columns=["url", "domain", "status", "is_frontpage", "clone_fp", "fetch_order"],
    )
    ds = ds.map_batches(
        lambda t: t.filter(pc.and_(pc.equal(t["status"], 200), t["is_frontpage"])),
        batch_format="pyarrow",
    )

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("fetch_order")
        g["is_genuine"] = g["fetch_order"] == g["fetch_order"].iloc[0]
        return g[["domain", "clone_fp", "is_genuine"]]

    return ds.groupby("clone_fp").map_groups(mark, batch_format="pandas")


def q_crawl_domain_stats(sf_dir: str):
    """O26/O32 rollup: per-domain pages crawled, alive flag, total bytes."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    edir = ensure_engine_fixture()
    ds = rd.read_parquet(
        os.path.join(edir, "pages.parquet"), columns=["domain", "status", "size"]
    )
    ds = ds.map_batches(
        lambda t: t.append_column("ok", pc.cast(pc.equal(t["status"], 200), pa.int64())),
        batch_format="pyarrow",
    )
    out = ds.groupby("domain").aggregate(
        Count(alias_name="pages_crawled"),
        Sum("ok", alias_name="pages_ok"),
        Sum("size", alias_name="total_bytes"),
    )
    return out.map_batches(
        lambda t: t.append_column("is_up", pc.greater(t["pages_ok"], 0)),
        batch_format="pyarrow",
    )


def q_crawl_domain_history(sf_dir: str):
    """Per-domain liveness HISTORY over crawl rounds — the reference's
    Domain.created_at / Domain.last_alive / is_up tracking (it updated
    those columns on every fetch outcome), recomputed from the
    distributed engine's per-round pages: first round each domain was
    fetched, last round it answered 200, how many distinct rounds it was
    alive, and fetch/ok totals. Two-stage aggregation: a per-batch
    (domain, round) combine bounds the first shuffle by
    distinct-(domain,round)-per-batch, then the per-round rows (≤
    domains × rounds, tiny) roll up per domain — at 10^7 domains both
    stages stay hash-partitioned with no driver materialization."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    edir = ensure_engine_fixture()
    ds = rd.read_parquet(
        os.path.join(edir, "pages.parquet"), columns=["domain", "round", "status"]
    )

    def _per_round_partial(t: pa.Table) -> pa.Table:
        ok = pc.cast(pc.equal(t["status"], 200), pa.int64())
        g = (
            pa.table(
                {
                    "domain": t["domain"],
                    "round": pc.cast(t["round"], pa.int64()),
                    "ok": ok,
                }
            )
            .group_by(["domain", "round"])
            .aggregate([("ok", "sum"), ("ok", "count")])
        )
        return pa.table(
            {
                "domain": g["domain"],
                "round": g["round"],
                "ok": g["ok_sum"],
                "n": pc.cast(g["ok_count"], pa.int64()),
            }
        )

    per_round = (
        ds.map_batches(_per_round_partial, batch_format="pyarrow")
        .groupby(["domain", "round"])
        .aggregate(Sum("ok", alias_name="ok"), Sum("n", alias_name="n"))
    )

    def _alive_cols(t: pa.Table) -> pa.Table:
        alive = pc.greater(t["ok"], 0)
        return pa.table(
            {
                "domain": t["domain"],
                "round": t["round"],
                # -1 sentinel when never alive (twin coalesces the same way)
                "alive_round": pc.if_else(alive, t["round"], pa.scalar(-1, pa.int64())),
                "alive": pc.cast(alive, pa.int64()),
                "ok": t["ok"],
                "n": t["n"],
            }
        )

    return (
        per_round.map_batches(_alive_cols, batch_format="pyarrow")
        .groupby("domain")
        .aggregate(
            Min("round", alias_name="first_round"),
            Max("alive_round", alias_name="last_alive_round"),
            Sum("alive", alias_name="n_alive_rounds"),
            Sum("n", alias_name="n_fetches"),
            Sum("ok", alias_name="n_ok"),
        )
    )


def q_crawl_fresh_onions(sf_dir: str):
    """The reference's NAMESAKE view — "fresh onions": how many
    never-seen-before onion domains each crawl round discovered (its
    index page listed newly found services by discovery date). Discovery
    round = the first round a domain was ever fetched; the rollup counts
    discoveries per round. Same two-stage shape as the history query:
    per-batch (domain → min round) partials bound the shuffle, the
    per-domain firsts (one row per domain) roll up into a ≤max_rounds
    row result."""
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    edir = ensure_engine_fixture()
    ds = rd.read_parquet(os.path.join(edir, "pages.parquet"), columns=["domain", "round"])

    def _first_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"domain": t["domain"], "round": pc.cast(t["round"], pa.int64())})
            .group_by("domain")
            .aggregate([("round", "min")])
        )
        return pa.table({"domain": g["domain"], "round": g["round_min"]})

    firsts = (
        ds.map_batches(_first_partial, batch_format="pyarrow")
        .groupby("domain")
        .aggregate(Min("round", alias_name="discovery_round"))
    )
    return firsts.groupby("discovery_round").aggregate(Count(alias_name="n_new_domains"))


def _web_docs_glob() -> str:
    ensure_engine_fixture()  # guarantees the web exists
    return os.path.join(FIX_DIR, "web", "documents", "**", "*.parquet")


def _read_web_docs():
    import ray.data as rd

    ensure_engine_fixture()
    return rd.read_parquet(os.path.join(FIX_DIR, "web", "documents")).select_columns(
        ["doc_id", "spans"]
    )


def q_spans_media(sf_dir: str):
    """Media-span explode (multimodal input surface): image refs per doc.
    Ray: pyarrow list kernels; oracle: DuckDB unnest over the same spans
    parquet — a genuine nested-type conformance check."""
    from ..stages.multimodal import media_rows_from_spans

    ds = _read_web_docs()
    return ds.map_batches(media_rows_from_spans, batch_format="pyarrow").select_columns(
        ["doc_id", "media_ref"]
    )


def q_spans_links(sf_dir: str):
    """Link-span explode (O2 raw form, pre-canonicalization)."""
    import pyarrow.compute as _pc

    def explode(t: pa.Table) -> pa.Table:
        spans = t["spans"].combine_chunks()
        flat = _pc.list_flatten(spans)
        parents = _pc.list_parent_indices(spans)
        kinds = _pc.struct_field(flat, "kind")
        mask = _pc.equal(kinds, "link")
        ids = t["doc_id"].take(_pc.filter(parents, mask))
        return pa.Table.from_arrays(
            [
                ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids,
                _pc.filter(_pc.struct_field(flat, "media_ref"), mask),
                _pc.filter(_pc.struct_field(flat, "text"), mask),
            ],
            names=["doc_id", "href", "anchor"],
        )

    return _read_web_docs().map_batches(explode, batch_format="pyarrow")


def q_spans_strip_text(sf_dir: str):
    """O7 HTML→text strip: concat title/text/anchor spans in offset order
    (the exact text the reference indexed into Elasticsearch)."""
    from ..stages.extract import doc_text_and_title

    def strip(t: pa.Table) -> pa.Table:
        texts, _, _ = doc_text_and_title(t)
        out = pa.Table.from_arrays(
            [t["doc_id"], pa.array(texts, pa.string())], names=["doc_id", "text"]
        )
        # docs with no text-bearing spans (images only) yield no row,
        # matching the oracle's GROUP BY-over-qualifying-spans semantics
        return out.filter(pc.not_equal(out["text"], ""))

    return _read_web_docs().map_batches(strip, batch_format="pyarrow")


def q_spans_pack(sf_dir: str, _docs=None):
    """Interleaved MULTIMODAL sequence packing — the step that turns
    interleaved text+media documents into fixed-token-budget training
    sequences (the MMC4/OBELICS layout): every span costs tokens
    (text-ish spans: RE2 word-token count; media spans: the fixed
    per-modality patch/frame budget an encoder consumes — see
    params.py PACK_*_TOKENS), and seq_id = exclusive-prefix-sum(cost)
    // PACK_SEQ_BUDGET over the global (doc_id, offset) span order.

    Distributed exclusive prefix sum with NO ordered scan (the
    pack_chunks recipe): spans bucket by an ORDER-PRESERVING doc_id
    range key (chars [7:9] — every web doc_id starts with the constant
    'http://', so the next two base32 domain chars give ~1k balanced,
    order-preserving buckets; widen the slice at larger webs); bucket
    cost sums aggregate to a driver-tiny table whose prefix sum is each
    bucket's global offset (broadcast once); a per-bucket map_groups
    sorts only ITS spans. Twin: plain window sum over the spans parquet.
    """
    import numpy as np
    import pandas as pd
    import ray

    from ..functions.regexes import WORD_PATTERN
    from .params import (
        PACK_AUDIO_TOKENS,
        PACK_IMG_TOKENS,
        PACK_SEQ_BUDGET,
        PACK_VIDEO_TOKENS,
    )

    def explode_cost(t: pa.Table) -> pa.Table:
        spans = t["spans"].combine_chunks()
        flat = pc.list_flatten(spans)
        parents = pc.list_parent_indices(spans)
        ids = t["doc_id"].take(parents)
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        kinds = pc.struct_field(flat, "kind")
        toks = pc.cast(
            pc.count_substring_regex(pc.struct_field(flat, "text"), WORD_PATTERN),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        kn = kinds.to_numpy(zero_copy_only=False)
        cost = np.select(
            [kn == "image", kn == "video", kn == "audio"],
            [PACK_IMG_TOKENS, PACK_VIDEO_TOKENS, PACK_AUDIO_TOKENS],
            default=toks,
        ).astype(np.int64)
        bucket = pc.utf8_slice_codeunits(ids, 7, 9)
        return pa.Table.from_arrays(
            [
                ids,
                kinds,
                pc.cast(pc.struct_field(flat, "offset"), pa.int64()),
                pa.array(cost),
                bucket.combine_chunks() if isinstance(bucket, pa.ChunkedArray) else bucket,
            ],
            names=["doc_id", "kind", "offset", "cost", "bucket"],
        )

    docs = _docs if _docs is not None else _read_web_docs()
    spans = docs.map_batches(explode_cost, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Sum as _Sum

    sums = spans.groupby("bucket").aggregate(_Sum("cost", alias_name="s")).to_pandas()
    sums = sums.sort_values("bucket").reset_index(drop=True)
    offsets = dict(
        zip(
            sums["bucket"].tolist(),
            (sums["s"].cumsum() - sums["s"]).astype("int64").tolist(),
        )
    )
    oref = ray.put(offsets)

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(oref)[g["bucket"].iat[0]]
        g = g.sort_values(["doc_id", "offset"], kind="mergesort")
        excl = g["cost"].cumsum() - g["cost"] + off
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "kind": g["kind"].to_numpy(),
                "offset": g["offset"].to_numpy(),
                "cost": g["cost"].to_numpy(),
                "seq_id": (excl // PACK_SEQ_BUDGET).astype("int64").to_numpy(),
            }
        )

    return spans.groupby("bucket").map_groups(pack, batch_format="pandas")


def q_media_decode(sf_dir: str):
    """Multimodal image pipeline (rows-only: binary pixel parsing isn't
    SQL-expressible): media explode → REAL nearest-neighbor PPM resize →
    REAL numpy PPM decode (dims + per-channel pixel features); small
    batches as large-binary payload discipline requires."""
    import pyarrow.compute as _pc

    from ..stages.multimodal import ImageDecoder, ImageResizer, media_rows_from_spans

    ds = _read_web_docs()
    media = ds.map_batches(media_rows_from_spans, batch_format="pyarrow").map_batches(
        lambda t: t.filter(_pc.equal(t["media_type"], "image")), batch_format="pyarrow"
    )
    resized = media.map_batches(
        ImageResizer, fn_constructor_kwargs={"max_side": 8},
        batch_format="pyarrow", batch_size=256, concurrency=2,
    )
    decoded = resized.map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=256, concurrency=2
    )
    return decoded.select_columns(["doc_id", "media_ref", "height", "width"])


def q_media_frames(sf_dir: str):
    """Video frame sampling (rows-only): media explode → actor-pool
    FrameSampler genuinely DEMUXING the VID0 containers (frame-header
    walk) — one row per stride-sampled frame, small batches for the wide
    binary frame column."""
    import pyarrow.compute as _pc

    from ..stages.multimodal import FrameSampler, media_rows_from_spans

    ds = _read_web_docs()
    media = ds.map_batches(media_rows_from_spans, batch_format="pyarrow").map_batches(
        lambda t: t.filter(_pc.equal(t["media_type"], "video")), batch_format="pyarrow"
    )
    frames = media.map_batches(
        FrameSampler, fn_constructor_kwargs={"stride": 3, "max_frames": 4},
        batch_format="pyarrow", batch_size=128, concurrency=2,
    )
    return frames.select_columns(["doc_id", "media_ref", "frame_idx"])


def q_media_audio(sf_dir: str):
    """Audio feature extraction (rows-only): media explode → actor-pool
    AudioFeatures parsing REAL RIFF/WAVE payloads (sample rate, length,
    RMS, zero-crossing rate from decoded PCM samples)."""
    import pyarrow.compute as _pc

    from ..stages.multimodal import AudioFeatures, media_rows_from_spans

    ds = _read_web_docs()
    media = ds.map_batches(media_rows_from_spans, batch_format="pyarrow").map_batches(
        lambda t: t.filter(_pc.equal(t["media_type"], "audio")), batch_format="pyarrow"
    )
    feats = media.map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=256, concurrency=2
    )
    def _round(t: pa.Table) -> pa.Table:
        from ..functions.rounding import pc_round4

        t = t.set_column(t.schema.get_field_index("rms"), "rms", pc_round4(t["rms"]))
        return t.set_column(t.schema.get_field_index("zcr"), "zcr", pc_round4(t["zcr"]))

    return feats.map_batches(_round, batch_format="pyarrow").select_columns(
        ["doc_id", "media_ref", "sample_rate", "n_samples", "rms", "zcr"]
    )


SEED_TEXT_PATH = os.path.join(FIX_DIR, "seed_list.txt")


def _ensure_seed_text() -> str:
    """Deterministic free-form onion mention list (S2 fixture): seed
    frontpages mixed with junk lines and bare-host mentions."""
    if os.path.exists(SEED_TEXT_PATH):
        return SEED_TEXT_PATH
    os.makedirs(FIX_DIR, exist_ok=True)
    lines = []
    for i, u in enumerate(_seed_urls()):
        host = u.split("://")[1].rstrip("/")
        if i % 3 == 0:
            lines.append(f"check out http://{host}/ for fresh links")
        elif i % 3 == 1:
            lines.append(host)
        else:
            lines.append(f"# mirror list entry {i}: {host} (verified)")
        if i % 4 == 0:
            lines.append("no onions on this line at all")
    with open(SEED_TEXT_PATH + ".tmp", "w") as f:
        f.write("\n".join(lines) + "\n")
    os.rename(SEED_TEXT_PATH + ".tmp", SEED_TEXT_PATH)
    return SEED_TEXT_PATH


def q_seed_import(sf_dir: str):
    """S2 onion-list harvest: read_text → regex harvest → exact dedup
    with mention counts."""
    from ..sources.seeds import read_seed_list

    return read_seed_list(_ensure_seed_text())


def q_crawl_top_pages(sf_dir: str):
    """O28 top-k: largest fetched pages, deterministic tie-break."""
    import ray.data as rd

    edir = ensure_engine_fixture()
    ds = rd.read_parquet(os.path.join(edir, "pages.parquet"), columns=["url", "size", "status"])
    ds = ds.map_batches(lambda t: t.filter(pc.equal(t["status"], 200)), batch_format="pyarrow")
    from ..stages.topk import topk as _topk

    return _topk(ds, ["size", "url"], [True, False], 20).select_columns(["url", "size"])


def q_crawl_email_stats(sf_dir: str):
    """O20 email↔pages m2m: per-address page/domain counts."""
    import ray.data as rd
    from ray.data.aggregate import Count

    edir = ensure_engine_fixture()
    ds = rd.read_parquet(os.path.join(edir, "emails.parquet"))
    out = ds.groupby("address").aggregate(Count(alias_name="n_pages"))
    doms = (
        ds.groupby(["address", "domain"])
        .aggregate(Count(alias_name="_x"))
        .groupby("address")
        .aggregate(Count(alias_name="n_domains"))
    )
    return out.join(doms, join_type="inner", num_partitions=4, on=("address",))


def q_crawl_open_ports(sf_dir: str):
    """Portscan maintenance job (reference OpenPort side-car): probe the
    crawled domain set → per-port domain counts."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    from .maintenance import build_universe_probe, portscan

    edir = ensure_engine_fixture()
    doms = (
        rd.read_parquet(os.path.join(edir, "pages.parquet"), columns=["domain"])
        .groupby("domain")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["domain"])
    )
    ref = ray.put(build_universe_probe(SEED, N_DOMAINS))
    ports = portscan(doms, ref)
    return ports.groupby("port").aggregate(Count(alias_name="n_domains"))


def q_crawl_server_stats(sf_dir: str):
    """O9 header projections (reference Domain.server / Domain.powered_by):
    probe crawled domains' banners → per-(server, powered_by) counts."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    from .maintenance import build_universe_probe, header_banners

    edir = ensure_engine_fixture()
    doms = (
        rd.read_parquet(os.path.join(edir, "pages.parquet"), columns=["domain"])
        .groupby("domain")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["domain"])
    )
    ref = ray.put(build_universe_probe(SEED, N_DOMAINS))
    banners = header_banners(doms, ref)
    return banners.groupby(["server", "powered_by"]).aggregate(Count(alias_name="n_domains"))


def q_crawl_pii_redact(sf_dir: str):
    """PII redaction over the crawled corpus — the sanitization step a
    training pipeline runs before export: email addresses and onion
    host mentions are replaced with typed placeholders. One vectorized
    RE2 ``replace_substring_regex`` pass per pattern over the engine's
    status-200 pages; the twin runs DuckDB ``regexp_replace(..., 'g')``
    with the SAME patterns in the SAME order over the ORACLE's pages,
    so the redacted text hash-matches only if extraction semantics,
    pattern order, and the underlying crawl text all agree."""
    import ray.data as rd

    from ..functions.regexes import EMAIL_PATTERN, ONION_PATTERN

    edir = ensure_engine_fixture()
    ds = rd.read_parquet(os.path.join(edir, "pages.parquet"), columns=["url", "status", "text"])

    def redact(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["status"], 200))
        txt = pc.replace_substring_regex(t["text"], EMAIL_PATTERN, replacement="[EMAIL]")
        txt = pc.replace_substring_regex(txt, ONION_PATTERN, replacement="[ONION]")
        return pa.table({"url": t["url"], "text_redacted": pc.cast(txt, pa.large_string())})

    return ds.map_batches(redact, batch_format="pyarrow")


def q_crawl_pagerank(sf_dir: str):
    """Fixed-point integer PageRank over the crawled domain link graph
    (stages/graph.py::pagerank_int): 5 power iterations, rank scale
    10^9, integer-only arithmetic so the value hash matches a DuckDB
    twin of 5 unrolled CTEs bit-for-bit — engine links vs the ORACLE's
    links, like every crawl twin. Nodes = crawled domains ∪ link
    endpoints; edges = distinct directed (src, dst), self-loops
    dropped; dangling nodes keep the damping base (mass leaks — part
    of the definition)."""
    import ray.data as rd

    from ..stages.graph import pagerank_int

    edir = ensure_engine_fixture()
    links = rd.read_parquet(
        os.path.join(edir, "links.parquet"), columns=["src_domain", "dst_domain"]
    )

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["src_domain"].combine_chunks(), t["dst_domain"].combine_chunks()],
            names=["a", "b"],
        )

    edges = links.map_batches(to_edges, batch_format="pyarrow")
    pages = rd.read_parquet(os.path.join(edir, "pages.parquet"), columns=["domain"]).map_batches(
        lambda t: t.rename_columns(["node"]), batch_format="pyarrow"
    )
    ends = links.map_batches(
        lambda t: pa.Table.from_arrays(
            [pa.concat_arrays([t["src_domain"].combine_chunks(), t["dst_domain"].combine_chunks()])],
            names=["node"],
        ),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Count

    nodes = pages.union(ends).groupby("node").aggregate(Count(alias_name="_n")).select_columns(["node"])
    pr = pagerank_int(edges, nodes, "node", iters=5, scale=10**9)
    return pr.map_batches(
        lambda t: t.rename_columns(["domain", "pagerank"]), batch_format="pyarrow"
    )


def q_crawl_link_components(sf_dir: str):
    """Connected components over the domain link graph — the reference's
    related-onion / clone-family grouping (Flask pages joined domains over
    shared links; SURVEY.md §2.5) done as a first-class graph operator.
    Nodes = crawled domains ∪ link endpoints; undirected edges from the
    links table. Engine: Boruvka-style contraction (stages/graph.py);
    twin: DuckDB recursive-CTE min-label propagation."""
    import ray.data as rd

    from ..stages.graph import connected_components

    edir = ensure_engine_fixture()
    links = rd.read_parquet(
        os.path.join(edir, "links.parquet"), columns=["src_domain", "dst_domain"]
    )

    def to_edges(t: pa.Table) -> pa.Table:
        mask = pc.not_equal(t["src_domain"], t["dst_domain"])
        t = t.filter(mask)
        return pa.Table.from_arrays(
            [t["src_domain"].combine_chunks(), t["dst_domain"].combine_chunks()],
            names=["a", "b"],
        )

    edges = links.map_batches(to_edges, batch_format="pyarrow")
    pages = rd.read_parquet(os.path.join(edir, "pages.parquet"), columns=["domain"]).map_batches(
        lambda t: t.rename_columns(["node"]), batch_format="pyarrow"
    )
    ends = links.map_batches(
        lambda t: pa.Table.from_arrays(
            [pa.concat_arrays([t["src_domain"].combine_chunks(), t["dst_domain"].combine_chunks()])],
            names=["node"],
        ),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Count

    nodes = pages.union(ends).groupby("node").aggregate(Count(alias_name="_n")).select_columns(["node"])
    cc = connected_components(edges, nodes, "node")
    return cc.map_batches(
        lambda t: t.rename_columns(["domain", "component"]), batch_format="pyarrow"
    )


def q_crawl_round_metrics(sf_dir: str):
    """The engine's CHECKPOINTED per-round lineage/metrics rows (the
    north rule's per-partition lineage + metrics surface) cross-checked
    against the reference semantics: the round-summary row's
    urls_fetched must equal the oracle's pages-per-round count — a
    conformance check on the METRICS path itself, not just the data."""
    edir = ensure_engine_fixture()
    m = pq.read_table(
        os.path.join(edir, "metrics.parquet"),
        columns=["round", "partition", "urls_fetched"],
    )
    m = m.filter(pc.equal(m["partition"], -1))
    return pa.table(
        {
            "round": pc.cast(m["round"], pa.int64()),
            "n_fetched": pc.cast(m["urls_fetched"], pa.int64()),
        }
    )


def q_crawl_mutual_domains(sf_dir: str):
    """Reciprocal domain links — pairs of distinct domains that link to
    EACH OTHER (the mirror/affiliate signal the reference surfaced by
    eyeballing shared-link Flask pages; here a first-class graph motif).
    Engine shape: per-batch canonicalize each cross-domain edge to
    (lo, hi, dir) with dir ∈ {0,1}, per-batch distinct combine, then one
    pair-keyed groupby where Min(dir)=0 and Max(dir)=1 ⇔ both directions
    exist. Shuffle volume is distinct-pairs-per-batch; no self-join —
    the SQL twin does the join, the engine never has to."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    edir = ensure_engine_fixture()
    links = rd.read_parquet(
        os.path.join(edir, "links.parquet"), columns=["src_domain", "dst_domain"]
    )

    def canon(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["src_domain"], t["dst_domain"]))
        fwd = pc.less(t["src_domain"], t["dst_domain"])
        lo = pc.if_else(fwd, t["src_domain"], t["dst_domain"])
        hi = pc.if_else(fwd, t["dst_domain"], t["src_domain"])
        d = pc.cast(pc.invert(fwd), pa.int64())
        return (
            pa.table({"lo": lo, "hi": hi, "dir": d})
            .group_by(["lo", "hi", "dir"])
            .aggregate([])
        )

    pairs = (
        links.map_batches(canon, batch_format="pyarrow")
        .groupby(["lo", "hi"])
        .aggregate(Min("dir", alias_name="d0"), Max("dir", alias_name="d1"))
    )
    return pairs.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["d0"], 0), pc.equal(t["d1"], 1))
        ).select(["lo", "hi"]),
        batch_format="pyarrow",
    )


def _undirected_link_edges():
    """DISTINCT undirected domain edges (lo, hi), lo < hi, no
    self-loops, from the engine fixture's links table — the shared
    input of the triangle-family queries. Per-batch canonicalize +
    distinct combine bounds the shuffle at distinct-pairs-per-batch."""
    import ray.data as rd
    from ray.data.aggregate import Count

    edir = ensure_engine_fixture()
    links = rd.read_parquet(
        os.path.join(edir, "links.parquet"), columns=["src_domain", "dst_domain"]
    )

    def canon(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["src_domain"], t["dst_domain"]))
        fwd = pc.less(t["src_domain"], t["dst_domain"])
        lo = pc.if_else(fwd, t["src_domain"], t["dst_domain"])
        hi = pc.if_else(fwd, t["dst_domain"], t["src_domain"])
        return pa.table({"lo": lo, "hi": hi}).group_by(["lo", "hi"]).aggregate([])

    return (
        links.map_batches(canon, batch_format="pyarrow")
        .groupby(["lo", "hi"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["lo", "hi"])
    )


def q_crawl_triangles(sf_dir: str):
    """Triangle census of the undirected domain link graph — the
    tight-cluster / mirror-ring signal one step past reciprocal links
    (crawl_mutual_domains): n_nodes, n_edges, n_triangles.

    Degree-oriented wedge counting, the standard distributed triangle
    algorithm: orient every undirected edge from its lower-(degree,
    name) endpoint to the higher, so each node's OUT-degree is bounded
    by ~sqrt(2|E|) even at hub domains; enumerate out-neighbor pairs
    (wedges) per node; a wedge closes iff its (v, w) pair is itself an
    oriented edge — checked with the house sentinel-groupby trick
    (union wedge rows with edge rows, ONE pair-keyed groupby), so there
    is no join and no unoriented hub blow-up. The degree map broadcasts
    once (domain-granular, ~10^7 at the 10^10-URL frontier — the
    PageRank broadcast note applies; hash-join fallback when it
    outgrows a worker). Algorithm in stages/graph.py::triangle_census."""
    from ..stages.graph import triangle_census

    return triangle_census(_undirected_link_edges())


def q_crawl_clustering(sf_dir: str):
    """Per-domain local clustering coefficient over the undirected link
    graph — the node-level score behind crawl_triangles' census
    (coeff = 2T/(deg·(deg−1)), round4; domains in ≥1 triangle).
    Algorithm in stages/graph.py::clustering_coefficients: the oriented
    wedges keep their center, the pair-keyed groupby emits one corner
    row per triangle vertex, and a node-keyed sum + broadcast degree
    map finish the job — no join against the edge set."""
    from ..stages.graph import clustering_coefficients

    cc = clustering_coefficients(_undirected_link_edges())
    return cc.map_batches(
        lambda t: t.rename_columns(["domain", "n_triangles", "degree", "coeff"]),
        batch_format="pyarrow",
    )


def q_crawl_anchor_index(sf_dir: str):
    """Anchor-text INDEX: the most common anchor string per destination
    URL (count desc, anchor asc tie-break) with its count and the number
    of distinct source domains — what a search engine keeps per target
    from the link graph. Per-batch (dst, anchor) partial counts bound
    the shuffle; per-dst top-1 via the shared per-group top-k combiner
    (map-side partial thins each batch to ≤1 row per dst before the
    groupby). Distinct-source-domain counts ride the same pass as a
    second tiny aggregate."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..stages import corpus as cp

    edir = ensure_engine_fixture()
    links = rd.read_parquet(
        os.path.join(edir, "links.parquet"), columns=["dst_url", "anchor", "src_domain"]
    )

    def partial_counts(t: pa.Table) -> pa.Table:
        return (
            pa.table({"dst_url": t["dst_url"], "anchor": t["anchor"]})
            .group_by(["dst_url", "anchor"])
            .aggregate([([], "count_all")])
            .rename_columns(["dst_url", "anchor", "cnt"])
        )

    counts = (
        links.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["dst_url", "anchor"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    # top-1 anchor per dst: block-local thin to ≤1 row/dst (each
    # (dst, anchor) key is globally unique after the sum, so the global
    # winner survives any block split), tiny per-group final
    import pandas as pd

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cnt", "anchor"], ascending=[False, True])
        return pd.DataFrame(
            {
                "dst_url": [g["dst_url"].iloc[0]],
                "top_anchor": [g["anchor"].iloc[0]],
                "anchor_cnt": [int(g["cnt"].iloc[0])],
            }
        )

    thinned = counts.map_batches(
        cp.topk_per_group_partial(["dst_url"], "cnt", 1, "anchor"),
        batch_format="pandas",
    )
    top = thinned.groupby("dst_url").map_groups(best, batch_format="pandas")

    def src_partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"dst_url": t["dst_url"], "src_domain": t["src_domain"]})
            .group_by(["dst_url", "src_domain"])
            .aggregate([])
        )

    nsrc = (
        links.map_batches(src_partial, batch_format="pyarrow")
        .groupby(["dst_url", "src_domain"])
        .aggregate(Count(alias_name="_n"))
        .groupby("dst_url")
        .aggregate(Count(alias_name="n_src_domains"))
    )
    return top.join(nsrc, join_type="inner", num_partitions=8, on=("dst_url",))


def q_crawl_ssh_groups(sf_dir: str):
    """O21 SSH-fingerprint grouping: domains sharing a host key."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    from .maintenance import build_universe_probe, ssh_fingerprints

    edir = ensure_engine_fixture()
    doms = (
        rd.read_parquet(os.path.join(edir, "pages.parquet"), columns=["domain"])
        .groupby("domain")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["domain"])
    )
    ref = ray.put(build_universe_probe(SEED, N_DOMAINS))
    fps = ssh_fingerprints(doms, ref)
    return fps.groupby("fingerprint").aggregate(Count(alias_name="n_domains"))


def q_crawl_soft404(sf_dir: str):
    """O16 soft-404 probe over crawled alive domains → useful_404 flags."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    from .maintenance import build_universe_probe, soft404_probe

    edir = ensure_engine_fixture()
    doms = (
        rd.read_parquet(os.path.join(edir, "pages.parquet"), columns=["domain"])
        .groupby("domain")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["domain"])
    )
    ref = ray.put(build_universe_probe(SEED, N_DOMAINS))
    return soft404_probe(doms, ref)


def q_crawl_purged_domains(sf_dir: str):
    """O32 purge: alive domains only (dead filtered out)."""
    from .maintenance import purge_dead

    ds = q_crawl_domain_stats(sf_dir)
    return purge_dead(ds).select_columns(["domain", "pages_crawled"])


def _ensure_probe_tables() -> str:
    """Oracle-side port/ssh tables over the ORACLE's crawled domain set
    (probe profile shared — like doc content — aggregation independent)."""
    odir = ensure_oracle_fixture()
    marker = os.path.join(odir, "_probe_done_v3")
    if os.path.exists(marker):
        return odir
    import pyarrow.parquet as _pq

    from .maintenance import build_universe_probe

    pages = _pq.read_table(os.path.join(odir, "pages.parquet"), columns=["domain"])
    doms = sorted(set(pages["domain"].to_pylist()))
    uni = build_universe_probe(SEED, N_DOMAINS)
    pd_, pp = [], []
    fd, ff = [], []
    sd, sflag = [], []
    hd, hs, hp = [], [], []
    for d in doms:
        prof = uni.get(d)
        sd.append(d)
        sflag.append(bool(prof and prof.get("soft404")))
        hd.append(d)
        hs.append(prof.get("server", "") if prof else "")
        hp.append(prof.get("powered_by", "") if prof else "")
        if not prof:
            continue
        for port in prof["ports"]:
            pd_.append(d)
            pp.append(port)
        if prof["ssh_fp"]:
            fd.append(d)
            ff.append(prof["ssh_fp"])
    _pq.write_table(
        pa.Table.from_arrays([pa.array(pd_, pa.string()), pa.array(pp, pa.int32())], names=["domain", "port"]),
        os.path.join(odir, "open_ports.parquet"),
    )
    _pq.write_table(
        pa.Table.from_arrays([pa.array(fd, pa.string()), pa.array(ff, pa.string())], names=["domain", "fingerprint"]),
        os.path.join(odir, "ssh_fps.parquet"),
    )
    _pq.write_table(
        pa.Table.from_arrays([pa.array(sd, pa.string()), pa.array(sflag, pa.bool_())], names=["domain", "useful_404"]),
        os.path.join(odir, "soft404.parquet"),
    )
    _pq.write_table(
        pa.Table.from_arrays(
            [pa.array(hd, pa.string()), pa.array(hs, pa.string()), pa.array(hp, pa.string())],
            names=["domain", "server", "powered_by"],
        ),
        os.path.join(odir, "server_banners.parquet"),
    )
    with open(marker, "w") as f:
        f.write("ok")
    return odir


CRAWL_QUERIES = {
    "crawl_pages": q_crawl_pages,
    "crawl_links": q_crawl_links,
    "crawl_emails": q_crawl_emails,
    "crawl_seen": q_crawl_seen,
    "crawl_frontier_residue": q_crawl_frontier_residue,
    "crawl_clone_domains": q_crawl_clone_domains,
    "crawl_domain_stats": q_crawl_domain_stats,
    "crawl_domain_history": q_crawl_domain_history,
    "crawl_fresh_onions": q_crawl_fresh_onions,
    "spans_media": q_spans_media,
    "spans_links": q_spans_links,
    "spans_strip_text": q_spans_strip_text,
    "spans_pack": q_spans_pack,
    "media_decode": q_media_decode,
    "media_frames": q_media_frames,
    "media_audio": q_media_audio,
    "seed_import": q_seed_import,
    "crawl_top_pages": q_crawl_top_pages,
    "crawl_email_stats": q_crawl_email_stats,
    "crawl_open_ports": q_crawl_open_ports,
    "crawl_server_stats": q_crawl_server_stats,
    "crawl_link_components": q_crawl_link_components,
    "crawl_mutual_domains": q_crawl_mutual_domains,
    "crawl_triangles": q_crawl_triangles,
    "crawl_clustering": q_crawl_clustering,
    "crawl_anchor_index": q_crawl_anchor_index,
    "crawl_round_metrics": q_crawl_round_metrics,
    "crawl_pagerank": q_crawl_pagerank,
    "crawl_pii_redact": q_crawl_pii_redact,
    "crawl_ssh_groups": q_crawl_ssh_groups,
    "crawl_purged_domains": q_crawl_purged_domains,
    "crawl_soft404": q_crawl_soft404,
    "crawl_search_rank": q_crawl_search_rank,
    "crawl_search_bm25": q_crawl_search_bm25,
}


def _pagerank_sql(links_path: str, pages_path: str, iters: int = 5, scale: int = 10**9) -> str:
    """5 unrolled integer-PageRank CTE iterations over the oracle's
    links/pages parquet (see stages/graph.py::pagerank_int for the
    definition; base = 0.15·scale in integer floor arithmetic)."""
    base = (15 * scale) // 100
    ctes = [f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM n)"]
    for i in range(1, iters + 1):
        ctes.append(
            f"""r{i} AS (
            SELECT n.node, CAST({base} + coalesce(s.c, 0) AS BIGINT) AS r
            FROM n LEFT JOIN (
                SELECT e.dst AS node,
                       CAST(sum((r{i-1}.r * 17) // (20 * outd.d)) AS BIGINT) AS c
                FROM e JOIN r{i-1} ON r{i-1}.node = e.src
                       JOIN outd ON outd.src = e.src
                GROUP BY e.dst
            ) s ON s.node = n.node
        )"""
        )
    joined = ",\n        ".join(ctes)
    return f"""
        WITH e AS (
            SELECT DISTINCT src_domain AS src, dst_domain AS dst
            FROM read_parquet('{links_path}') WHERE src_domain <> dst_domain
        ),
        outd AS (SELECT src, count(*)::BIGINT AS d FROM e GROUP BY src),
        n AS (
            SELECT DISTINCT domain AS node FROM read_parquet('{pages_path}')
            UNION SELECT src FROM e UNION SELECT dst FROM e
        ),
        {joined}
        SELECT node AS domain, r AS pagerank FROM r{iters}
    """


def crawl_oracle_sql() -> dict[str, str]:
    """SQL twins — these SELECT from the ORACLE's parquet (built here if
    missing), so the comparison is distributed engine vs reference
    semantics, not engine vs itself."""
    odir = ensure_oracle_fixture()
    p = lambda name: os.path.join(odir, name)  # noqa: E731
    return {
        "crawl_pages": f"SELECT * FROM read_parquet('{p('pages.parquet')}')",
        "crawl_links": f"SELECT * FROM read_parquet('{p('links.parquet')}')",
        "crawl_emails": f"SELECT * FROM read_parquet('{p('emails.parquet')}')",
        "crawl_seen": f"SELECT * FROM read_parquet('{p('seen.parquet')}')",
        "crawl_frontier_residue": f"SELECT * FROM read_parquet('{p('frontier.parquet')}')",
        "crawl_clone_domains": f"""
            SELECT domain, clone_fp,
                   fetch_order = min(fetch_order) OVER (PARTITION BY clone_fp) AS is_genuine
            FROM read_parquet('{p('pages.parquet')}')
            WHERE status = 200 AND is_frontpage
        """,
        "crawl_domain_stats": f"""
            SELECT domain, count(*)::BIGINT AS pages_crawled,
                   sum(CASE WHEN status = 200 THEN 1 ELSE 0 END)::BIGINT AS pages_ok,
                   sum(size)::BIGINT AS total_bytes,
                   sum(CASE WHEN status = 200 THEN 1 ELSE 0 END) > 0 AS is_up
            FROM read_parquet('{p('pages.parquet')}')
            GROUP BY domain
        """,
        "crawl_domain_history": f"""
            WITH pr AS (
                SELECT domain, round::BIGINT AS round,
                       sum(CASE WHEN status = 200 THEN 1 ELSE 0 END)::BIGINT AS ok,
                       count(*)::BIGINT AS n
                FROM read_parquet('{p('pages.parquet')}')
                GROUP BY domain, round
            )
            SELECT domain,
                   min(round) AS first_round,
                   coalesce(max(CASE WHEN ok > 0 THEN round END), -1) AS last_alive_round,
                   sum(CASE WHEN ok > 0 THEN 1 ELSE 0 END)::BIGINT AS n_alive_rounds,
                   sum(n)::BIGINT AS n_fetches,
                   sum(ok)::BIGINT AS n_ok
            FROM pr GROUP BY domain
        """,
        "crawl_fresh_onions": f"""
            WITH firsts AS (
                SELECT domain, min(round)::BIGINT AS discovery_round
                FROM read_parquet('{p('pages.parquet')}')
                GROUP BY domain
            )
            SELECT discovery_round, count(*)::BIGINT AS n_new_domains
            FROM firsts GROUP BY discovery_round
        """,
        # span-explode twins read the synthetic web's own spans parquet —
        # DuckDB unnest over list<struct> vs pyarrow list kernels
        "spans_media": f"""
            SELECT doc_id, s.media_ref AS media_ref
            FROM (SELECT doc_id, unnest(spans) AS s FROM read_parquet('{_web_docs_glob()}'))
            WHERE s.kind = 'image'
        """,
        "spans_links": f"""
            SELECT doc_id, s.media_ref AS href, s.text AS anchor
            FROM (SELECT doc_id, unnest(spans) AS s FROM read_parquet('{_web_docs_glob()}'))
            WHERE s.kind = 'link'
        """,
        "spans_strip_text": f"""
            SELECT doc_id, string_agg(s.text, chr(10) ORDER BY s.offset) AS text
            FROM (SELECT doc_id, unnest(spans) AS s FROM read_parquet('{_web_docs_glob()}'))
            WHERE (s.kind = 'title') OR (s.kind IN ('text', 'link') AND s.text != '')
            GROUP BY doc_id
        """,
        # spans_pack twin: per-modality span costs + a plain window
        # prefix sum over the global (doc_id, offset) span order — the
        # ordered-scan form of the engine's bucketed two-pass prefix sum
        "spans_pack": f"""
            WITH sp AS (
                SELECT doc_id, s.kind AS kind, s."offset" AS "offset",
                       CASE s.kind
                            WHEN 'image' THEN {_PACK_IMG}
                            WHEN 'video' THEN {_PACK_VID}
                            WHEN 'audio' THEN {_PACK_AUD}
                            ELSE len(regexp_extract_all(s.text, '[A-Za-z0-9_]+'))
                       END::BIGINT AS cost
                FROM (SELECT doc_id, unnest(spans) AS s FROM read_parquet('{_web_docs_glob()}'))
            )
            SELECT doc_id, kind, "offset", cost,
                   CAST(coalesce(sum(cost) OVER (ORDER BY doc_id, "offset"
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        // {_PACK_BUDGET} AS BIGINT) AS seq_id
            FROM sp
        """,
        "seed_import": f"""
            SELECT 'http://' || host || '/' AS url, count(*)::BIGINT AS n_mentions
            FROM (
                SELECT unnest(regexp_extract_all(lower(line), '[a-z2-7]{{56}}\\.onion|[a-z2-7]{{16}}\\.onion')) AS host
                FROM read_csv('{_ensure_seed_text()}', columns={{'line': 'VARCHAR'}}, sep='{chr(1)}', header=false)
            )
            GROUP BY host
        """,
        "crawl_top_pages": f"""
            SELECT url, size FROM read_parquet('{p('pages.parquet')}')
            WHERE status = 200
            ORDER BY size DESC, url ASC
            LIMIT 20
        """,
        "crawl_email_stats": f"""
            SELECT address, count(*)::BIGINT AS n_pages,
                   count(DISTINCT domain)::BIGINT AS n_domains
            FROM read_parquet('{p('emails.parquet')}')
            GROUP BY address
        """,
        "crawl_open_ports": f"""
            SELECT port, count(*)::BIGINT AS n_domains
            FROM read_parquet('{os.path.join(_ensure_probe_tables(), 'open_ports.parquet')}')
            GROUP BY port
        """,
        "crawl_ssh_groups": f"""
            SELECT fingerprint, count(*)::BIGINT AS n_domains
            FROM read_parquet('{os.path.join(_ensure_probe_tables(), 'ssh_fps.parquet')}')
            GROUP BY fingerprint
        """,
        "crawl_server_stats": f"""
            SELECT server, powered_by, count(*)::BIGINT AS n_domains
            FROM read_parquet('{os.path.join(_ensure_probe_tables(), 'server_banners.parquet')}')
            GROUP BY server, powered_by
        """,
        # fixed-point integer PageRank twin: 5 unrolled CTE iterations,
        # integer-only arithmetic (BIGINT multiply / floor-div / sum) —
        # order-independent, so the hash match is exact. Same node/edge
        # definition as the engine (distinct directed edges, self-loops
        # dropped, nodes = pages ∪ endpoints, dangling keep the base).
        "crawl_pagerank": _pagerank_sql(p("links.parquet"), p("pages.parquet")),
        "crawl_round_metrics": f"""
            SELECT round::BIGINT AS round, count(*)::BIGINT AS n_fetched
            FROM read_parquet('{p('pages.parquet')}')
            GROUP BY 1
        """,
        "crawl_mutual_domains": f"""
            WITH e AS (
                SELECT DISTINCT least(src_domain, dst_domain) AS lo,
                       greatest(src_domain, dst_domain) AS hi,
                       CASE WHEN src_domain < dst_domain THEN 0 ELSE 1 END AS dir
                FROM read_parquet('{p('links.parquet')}')
                WHERE src_domain <> dst_domain
            )
            SELECT lo, hi FROM e GROUP BY lo, hi
            HAVING min(dir) = 0 AND max(dir) = 1
        """,
        # triangle census twin: canonical a<b<c three-way self-join over
        # the distinct undirected edge list — counts each triangle once,
        # exactly like the engine's degree-oriented wedge counting
        "crawl_triangles": f"""
            WITH e AS (
                SELECT DISTINCT least(src_domain, dst_domain) AS a,
                       greatest(src_domain, dst_domain) AS b
                FROM read_parquet('{p('links.parquet')}')
                WHERE src_domain <> dst_domain
            ),
            n AS (SELECT a AS node FROM e UNION SELECT b FROM e)
            SELECT (SELECT count(*) FROM n)::BIGINT AS n_nodes,
                   (SELECT count(*) FROM e)::BIGINT AS n_edges,
                   (SELECT count(*)
                    FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
                              JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
                   )::BIGINT AS n_triangles
        """,
        # per-node census twin: each a<b<c triangle credits all three
        # corners; coeff = round4(2T / (deg·(deg−1))) on triangle nodes
        "crawl_clustering": f"""
            WITH e AS (
                SELECT DISTINCT least(src_domain, dst_domain) AS a,
                       greatest(src_domain, dst_domain) AS b
                FROM read_parquet('{p('links.parquet')}')
                WHERE src_domain <> dst_domain
            ),
            deg AS (SELECT node, count(*)::BIGINT AS d
                    FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
                    GROUP BY 1),
            t AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
                  FROM e e1 JOIN e e2 ON e2.a = e1.a AND e1.b < e2.b
                            JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
            corner AS (SELECT a AS node FROM t UNION ALL
                       SELECT b FROM t UNION ALL SELECT c FROM t),
            cnt AS (SELECT node, count(*)::BIGINT AS n_triangles FROM corner GROUP BY 1)
            SELECT cnt.node AS domain, cnt.n_triangles, deg.d AS degree,
                   round(2.0 * cnt.n_triangles / (deg.d * (deg.d - 1)), 4) AS coeff
            FROM cnt JOIN deg USING (node)
        """,
        "crawl_anchor_index": f"""
            WITH c AS (
                SELECT dst_url, anchor, count(*)::BIGINT AS cnt
                FROM read_parquet('{p('links.parquet')}')
                GROUP BY 1, 2
            ),
            top AS (
                SELECT dst_url, anchor AS top_anchor, cnt AS anchor_cnt,
                       row_number() OVER (
                           PARTITION BY dst_url ORDER BY cnt DESC, anchor
                       ) AS rn
                FROM c
            ),
            s AS (
                SELECT dst_url, count(DISTINCT src_domain)::BIGINT AS n_src_domains
                FROM read_parquet('{p('links.parquet')}')
                GROUP BY 1
            )
            SELECT t.dst_url, t.top_anchor, t.anchor_cnt, s.n_src_domains
            FROM top t JOIN s USING (dst_url)
            WHERE t.rn = 1
        """,
        "crawl_pii_redact": f"""
            SELECT url,
                   regexp_replace(
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
                       '[a-z2-7]{{16}}\\.onion', '[ONION]', 'g') AS text_redacted
            FROM read_parquet('{p("pages.parquet")}')
            WHERE status = 200
        """,
        # recursive-CTE min-label propagation: the component minimum s
        # reaches every member via the lbl < target prune (s is smaller
        # than every other member), so min(lbl) per node = component id
        "crawl_link_components": f"""
            WITH RECURSIVE
            e AS (
                SELECT src_domain AS a, dst_domain AS b
                FROM read_parquet('{p('links.parquet')}') WHERE src_domain <> dst_domain
                UNION
                SELECT dst_domain, src_domain
                FROM read_parquet('{p('links.parquet')}') WHERE src_domain <> dst_domain
            ),
            n AS (
                SELECT DISTINCT domain AS node FROM read_parquet('{p('pages.parquet')}')
                UNION SELECT a FROM e UNION SELECT b FROM e
            ),
            walk(node, lbl) AS (
                SELECT node, node FROM n
                UNION
                SELECT e.b, walk.lbl FROM walk JOIN e ON e.a = walk.node
                WHERE walk.lbl < e.b
            )
            SELECT node AS domain, min(lbl) AS component FROM walk GROUP BY node
        """,
        "crawl_purged_domains": f"""
            SELECT domain, count(*)::BIGINT AS pages_crawled
            FROM read_parquet('{p('pages.parquet')}')
            GROUP BY domain
            HAVING sum(CASE WHEN status = 200 THEN 1 ELSE 0 END) > 0
        """,
        "crawl_soft404": f"""
            SELECT domain, useful_404
            FROM read_parquet('{os.path.join(_ensure_probe_tables(), 'soft404.parquet')}')
        """,
        # incremental-index twins recompute tf/dl from the ORACLE's page
        # text with the identical token definition (lowercased
        # WORD_PATTERN tokens over status-200 pages), so the hash match
        # verifies the fetch-worker postings segments + compaction, not
        # just the scoring math
        "crawl_search_rank": f"""
            WITH tf AS (
                SELECT url,
                       len(list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'),
                                       x -> x = '{CRAWL_SEARCH_TERM}'))::BIGINT AS score
                FROM read_parquet('{p('pages.parquet')}')
                WHERE status = 200
            )
            SELECT url, score FROM tf WHERE score > 0
            ORDER BY score DESC, url ASC
            LIMIT 20
        """,
        "crawl_search_bm25": f"""
            WITH d AS (
                SELECT url,
                       len(ts)::DOUBLE AS dl,
                       len(list_filter(ts, x -> x = '{CRAWL_BM25_TERMS[0]}'))::DOUBLE AS tf0,
                       len(list_filter(ts, x -> x = '{CRAWL_BM25_TERMS[1]}'))::DOUBLE AS tf1
                FROM (
                    SELECT url, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
                    FROM read_parquet('{p('pages.parquet')}')
                    WHERE status = 200
                )
            ), s AS (
                SELECT count(*)::DOUBLE AS n,
                       sum(dl) / count(*) AS avgdl,
                       sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df0,
                       sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df1
                FROM d
            )
            SELECT url,
                   round(
                       ln((s.n - s.df0 + 0.5) / (s.df0 + 0.5) + 1.0)
                         * (tf0 * (1.2 + 1.0)) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / s.avgdl))
                     + ln((s.n - s.df1 + 0.5) / (s.df1 + 0.5) + 1.0)
                         * (tf1 * (1.2 + 1.0)) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / s.avgdl)),
                   4) AS score
            FROM d, s
            WHERE tf0 > 0 OR tf1 > 0
            ORDER BY score DESC, url ASC
            LIMIT 20
        """,
    }
