"""Persisted inverted (postings) index for the search surface.

The reference duplicated page text into Elasticsearch and served search
from the index (SURVEY.md §2.1 S5 — the ``tor_elasticsearch.py``
reconstruction); round-2's search queries re-scanned the corpus per
query. This is the engine's index-backed path:

- **build once per corpus**: tokenize (RE2 ``WORD_PATTERN`` over
  lowercased text, the Elasticsearch-like token semantics), count
  (doc, term) token frequencies vectorized (Arrow ``group_by`` — no
  Python row loops), and write postings ``(term, doc_id, tf, dl)`` as
  hive-partitioned parquet by ``part = token_hash(term) & (num_parts-1)``
  plus one tiny ``stats.json`` (n_docs, avgdl, num_parts). Postings are
  denormalized with the doc length so query-time scoring needs NO join
  against a doc-stats table.
- **query**: path-level partition-pruned read of ONLY the query terms'
  partitions, term filter, df from the pruned rows, vectorized BM25 (or
  raw-tf) scoring, per-doc Sum, tiny global top-k. Latency is
  index-bound — O(postings of the query terms) — never a corpus scan.

Scale notes (10^10 docs): ``num_parts`` must grow with the corpus so a
partition stays a prunable unit; a hot term's postings list is still
read distributed (many files per partition dir), and the per-doc Sum
shuffles only (doc_id, partial score) rows for docs containing a term.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64
from ..functions.regexes import WORD_PATTERN
from ..functions.rounding import round_half_away
from .topk import topk as _topk

_FTS_VERSION = "v1"


def _fts_cache_dir(parquet_path: str, num_parts: int) -> str:
    # st_mtime_ns, not int(st_mtime): a same-size in-place rewrite within
    # the same second must not serve a stale index
    st = os.stat(parquet_path)
    key = hashlib.md5(
        f"{os.path.abspath(parquet_path)}|{st.st_size}|{st.st_mtime_ns}|{num_parts}|{_FTS_VERSION}".encode()
    ).hexdigest()[:16]
    return f"/tmp/onionray_fts/{key}"


class PostingsBuilder:
    """map_batches stage: (doc_id, text) → (term, doc_id, tf, dl, part)
    postings rows. Tokenization is one RE2 ``regexp_extract_all`` scan
    per batch (DuckDB kernel, same engine the extract twins hash-match);
    (doc, term) counting is an Arrow ``group_by`` — fully vectorized."""

    def __init__(self, num_parts: int = 64, id_col: str = "doc_id", text_col: str = "text"):
        if num_parts < 1 or num_parts & (num_parts - 1):
            raise ValueError(f"num_parts must be a power of two, got {num_parts}")
        self.mask = np.uint64(num_parts - 1)
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.doc_extract import _duck
        from .dedup import _token_hash_array

        id_type = batch[self.id_col].type
        empty = pa.Table.from_arrays(
            [
                pa.array([], pa.string()),
                pa.array([], id_type),
                pa.array([], pa.int32()),
                pa.array([], pa.int64()),
                pa.array([], pa.int32()),
            ],
            names=["term", "doc_id", "tf", "dl", "part"],
        )
        if batch.num_rows == 0:
            return empty
        lowered = pc.cast(pc.utf8_lower(batch[self.text_col]), pa.large_string())
        tbl = pa.table({"t": lowered})  # noqa: F841 — duckdb reads it by name
        toks = (
            _duck()
            .execute(f"SELECT regexp_extract_all(t, '{WORD_PATTERN}') AS m FROM tbl")
            .arrow()["m"]
            .combine_chunks()
        )
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        if len(flat) == 0:
            return empty
        rep = np.repeat(np.arange(batch.num_rows, dtype=np.int64), dl)
        counted = (
            pa.table({"di": pa.array(rep), "term": flat})
            .group_by(["di", "term"])
            .aggregate([("term", "count")])
        )
        di = counted["di"].to_numpy(zero_copy_only=False)
        terms = counted["term"]
        th = _token_hash_array(terms.to_pylist())  # worker-global Zipfian cache
        return pa.Table.from_arrays(
            [
                pc.cast(terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms, pa.string()),
                batch[self.id_col].take(pa.array(di)),
                pc.cast(counted["term_count"].combine_chunks(), pa.int32()),
                pa.array(dl[di], pa.int64()),
                pa.array((th & self.mask).astype(np.int32), pa.int32()),
            ],
            names=["term", "doc_id", "tf", "dl", "part"],
        )


def build_or_load_text_index(parquet_path: str, num_parts: int = 64, id_col: str = "doc_id", text_col: str = "text") -> str:
    """Build (once) or load the persisted postings index for a documents
    table. Same persistence discipline as the IVF index: atomic
    ``_SUCCESS``-gated rename, hive-partitioned parquet, so the second
    query skips the corpus entirely. Returns the index directory."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    idx = _fts_cache_dir(parquet_path, num_parts)
    if os.path.exists(f"{idx}/_SUCCESS"):
        return idx

    ds = rd.read_parquet(parquet_path, columns=[id_col, text_col])
    postings = ds.map_batches(
        PostingsBuilder(num_parts, id_col, text_col),
        batch_format="pyarrow",
        batch_size=512,
        concurrency=4,
    )
    tmp = f"{idx}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    postings.write_parquet(f"{tmp}/postings", partition_cols=["part"])

    # corpus stats over DOCUMENTS (zero-token docs count toward n/avgdl
    # even though they never appear in postings) — one pruned-column pass
    def partial(t: pa.Table) -> pa.Table:
        dl = pc.cast(pc.count_substring_regex(pc.utf8_lower(t[text_col]), WORD_PATTERN), pa.int64())
        return pa.table({"n": [t.num_rows], "sum_dl": [pc.sum(dl).as_py() or 0]})

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sum_dl", alias_name="sum_dl")
    )
    n_docs = int(agg["n"])
    stats = {
        "n_docs": n_docs,
        "avgdl": (agg["sum_dl"] or 0) / max(n_docs, 1),
        "num_parts": num_parts,
        "version": _FTS_VERSION,
    }
    with open(f"{tmp}/stats.json", "w") as f:
        json.dump(stats, f)
    with open(f"{tmp}/_SUCCESS", "w") as f:
        f.write("ok")
    try:
        os.rename(tmp, idx)
    except OSError:  # concurrent builder won the rename — use theirs
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return idx


# --------------------------------------------------------------------
# Crawl-fed incremental index (reference: every crawled page was indexed
# into Elasticsearch as it was fetched — the S5 sink was CONTINUOUS, not
# a batch job). Fetch workers emit per-round postings SEGMENTS
# (term_hash, url, tf, dl, part) for their status-200 pages;
# compact_crawl_index merges all committed segments into the same
# hive-partitioned query layout the batch index uses — the Lucene
# segment-merge shape. Terms are stored as the engine token-family
# hashes (functions/tokenize.py), not strings: segments stay ~16 B/term
# and query-time pruning hashes the query term with the same family.


def crawl_postings_table(pages: pa.Table, num_parts: int = 64, url_col: str = "url", text_col: str = "text") -> pa.Table:
    """(term_hash, url, tf, dl, part) postings rows for one pages block —
    fully vectorized: one byte-level ``token_stats`` pass, then a
    lexsort + run-length count per (doc, term_hash). Only status-200
    pages are indexed (the reference only indexed fetched pages).

    ASCII-content assumption (shared with every byte-level kernel in
    ``functions/tokenize.py``): token_stats lowercases ASCII bytes only,
    while the search/BM25 oracle twins tokenize SQL ``lower(text)``.
    Code points whose lowercase maps INTO ASCII word chars (e.g. U+212A
    KELVIN SIGN → 'k') would tokenize differently on the two sides; the
    crawl corpus is ASCII (synth web + onion pages), so the twins hold.
    Non-ASCII corpora need a case-fold pre-pass before indexing."""
    from ..functions.tokenize import token_stats

    empty = pa.Table.from_arrays(
        [
            pa.array([], pa.int64()),
            pa.array([], pa.string()),
            pa.array([], pa.int32()),
            pa.array([], pa.int64()),
            pa.array([], pa.int32()),
        ],
        names=["term_hash", "url", "tf", "dl", "part"],
    )
    if "status" in pages.column_names:
        pages = pages.filter(pc.equal(pages["status"], 200))
    if pages.num_rows == 0:
        return empty
    st = token_stats(pages[text_col])
    if st.hashes.size == 0:
        return empty
    tok_doc = np.repeat(np.arange(pages.num_rows, dtype=np.int64), st.n_tok)
    order = np.lexsort((st.hashes, tok_doc))
    d, h = tok_doc[order], st.hashes[order]
    bounds = np.flatnonzero(np.r_[True, (d[1:] != d[:-1]) | (h[1:] != h[:-1]), True])
    tf = np.diff(bounds).astype(np.int32)
    d, h = d[bounds[:-1]], h[bounds[:-1]]
    mask = np.uint64(num_parts - 1)
    urls = pages[url_col]
    urls = urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls
    return pa.Table.from_arrays(
        [
            pa.array(h.view(np.int64)),
            urls.take(pa.array(d)),
            pa.array(tf),
            pa.array(st.n_tok[d], pa.int64()),
            pa.array((h & mask).astype(np.int32)),
        ],
        names=["term_hash", "url", "tf", "dl", "part"],
    )


def compact_crawl_index(store, num_parts: int = 64) -> str | None:
    """Merge all committed per-round postings segments of a crawl store
    into the partition-pruned query layout (+ stats.json). Idempotent
    per (store, latest round): re-crawling more rounds re-compacts into
    a new directory; a compaction for the same state is reused.

    Returns the index dir, or None if the store holds no postings
    (crawl ran without ``index_text``)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    latest = store.latest_round()
    seg_paths = store.table_paths("postings", upto=latest)
    if not seg_paths:
        return None
    key = hashlib.md5(f"{os.path.abspath(store.root)}|{latest}|{num_parts}|{_FTS_VERSION}".encode()).hexdigest()[:16]
    idx = f"/tmp/onionray_fts_crawl/{key}"
    if os.path.exists(f"{idx}/_SUCCESS"):
        return idx

    # Re-fetch guard: a URL re-checked in a later round can fetch 200
    # again (changed page); its per-round postings segments would then
    # double-count tf/df and duplicate urls in top-k. The distinct-url
    # aggregate below is needed regardless (n_docs/avgdl must count a
    # re-fetched url once); per-batch pre-aggregation bounds its shuffle
    # to distinct-urls-per-batch, and it runs once per compaction — the
    # postings partition write above already shuffles strictly more.
    # On the common static-web path the dup set is empty and the
    # single-pass compaction below runs unchanged.
    pages_ds = rd.read_parquet(store.table_paths("pages", upto=latest), columns=["url", "status"])
    def _partial_counts(t: pa.Table) -> pa.Table:
        g = t.filter(pc.equal(t["status"], 200)).select(["url"]).group_by("url").aggregate([("url", "count")])
        return pa.table({"url": g["url"], "n": g["url_count"]})

    ok200 = pages_ds.map_batches(_partial_counts, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    url_counts = ok200.groupby("url").aggregate(Sum("n", alias_name="n")).materialize()
    dup_urls = url_counts.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)), batch_format="pyarrow"
    ).to_pandas()
    n_docs_distinct = url_counts.count()  # distinct 200-urls (dedup-correct)

    if len(dup_urls):
        # slow path: keep each duplicate url's postings from its LATEST
        # 200 round only. Round identity comes from the segment's
        # directory (rows carry no round column), so read per round and
        # semi-filter with a broadcast (url -> latest round) map.
        import ray

        dup_set = set(dup_urls["url"].tolist())
        latest_200: dict[str, int] = {}
        # driver-side scan bounded by #rounds × dup set size: read only
        # url+status per round, filtered to the dup urls
        import pyarrow.parquet as _pq

        dup_arr = pa.array(sorted(dup_set), pa.string())
        for rnd in range(latest + 1):
            pdir = store.table_path(rnd, "pages")
            if not os.path.exists(pdir):
                continue
            t = _pq.read_table(pdir, columns=["url", "status"])
            t = t.filter(pc.and_(pc.equal(t["status"], 200), pc.is_in(t["url"], value_set=dup_arr)))
            for u in t["url"].to_pylist():
                latest_200[u] = rnd  # rounds ascend → last write wins
        lref = ray.put((dup_arr, latest_200))

        def keep_latest(rnd: int):
            def f(t: pa.Table) -> pa.Table:
                darr, lmap = ray.get(lref)
                is_dup = pc.is_in(t["url"], value_set=darr).to_numpy(zero_copy_only=False)
                if not is_dup.any():
                    return t
                urls = t["url"].to_numpy(zero_copy_only=False)
                drop = is_dup & np.array([lmap.get(u, -1) != rnd for u in urls])
                return t.filter(pa.array(~drop))

            return f

        parts = []
        for rnd in range(latest + 1):
            sdir = store.table_path(rnd, "postings")
            rpaths = [p for p in seg_paths if p.startswith(sdir + os.sep) or os.path.dirname(p) == sdir]
            if not rpaths:
                continue
            parts.append(rd.read_parquet(rpaths).map_batches(keep_latest(rnd), batch_format="pyarrow"))
        segs = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    else:
        segs = rd.read_parquet(seg_paths)

    tmp = f"{idx}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    segs.write_parquet(f"{tmp}/postings", partition_cols=["part"])
    # corpus stats: n_docs = DISTINCT indexed (status-200) urls, zero-
    # token pages included; sum_dl from one dl row per distinct url (dl
    # is constant per url post-dedup, so Max == the value)
    n_docs = n_docs_distinct
    per_url = segs.select_columns(["url", "dl"]).groupby("url").aggregate(Max("dl", alias_name="dl"))
    agg = per_url.aggregate(Sum("dl", alias_name="sum_dl"))
    stats = {
        "n_docs": int(n_docs or 0),
        "avgdl": (agg["sum_dl"] or 0) / max(int(n_docs or 0), 1),
        "num_parts": num_parts,
        "version": _FTS_VERSION,
    }
    with open(f"{tmp}/stats.json", "w") as f:
        json.dump(stats, f)
    with open(f"{tmp}/_SUCCESS", "w") as f:
        f.write("ok")
    try:
        os.rename(tmp, idx)
    except OSError:  # concurrent builder won the rename — use theirs
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return idx


def _pruned_postings(index_dir: str, terms: list[str]):
    """Partition-pruned postings for the query terms: only the terms'
    ``part=`` directories are even listed. Returns (dataset|None, stats)."""
    import ray.data as rd

    with open(f"{index_dir}/stats.json") as f:
        stats = json.load(f)
    mask = stats["num_parts"] - 1
    parts = sorted({hash64(t) & mask for t in terms})
    paths = [
        f
        for p in parts
        for f in sorted(glob.glob(f"{index_dir}/postings/part={p}/*.parquet"))
    ]
    if not paths:
        return None, stats
    term_set = pa.array(terms, pa.string())
    cand = rd.read_parquet(paths, columns=["term", "doc_id", "tf", "dl"])
    return (
        cand.map_batches(
            lambda t: t.filter(pc.is_in(t["term"], value_set=term_set)),
            batch_format="pyarrow",
        ),
        stats,
    )


def _empty_scores() -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array([], pa.int64()), pa.array([], pa.float64())], names=["doc_id", "score"]
    )


def _pruned_crawl_postings(index_dir: str, terms: list[str]):
    """Partition-pruned crawl postings for the query terms (hash-keyed:
    the query term is hashed with the engine token family and only its
    ``part=`` directories are listed)."""
    import ray.data as rd

    from ..functions.tokenize import term_hash64

    with open(f"{index_dir}/stats.json") as f:
        stats = json.load(f)
    mask = stats["num_parts"] - 1
    hashes = [term_hash64(t) for t in terms]
    parts = sorted({h & mask for h in hashes})
    paths = [
        f
        for p in parts
        for f in sorted(glob.glob(f"{index_dir}/postings/part={p}/*.parquet"))
    ]
    if not paths:
        return None, None, stats
    key_set = pa.array(np.array(hashes, dtype=np.uint64).view(np.int64))
    cand = rd.read_parquet(paths, columns=["term_hash", "url", "tf", "dl"])
    return (
        cand.map_batches(
            lambda t: t.filter(pc.is_in(t["term_hash"], value_set=key_set)),
            batch_format="pyarrow",
        ),
        key_set,
        stats,
    )


def _empty_url_scores() -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array([], pa.string()), pa.array([], pa.float64())], names=["url", "score"]
    )


def crawl_term_tf_topk(index_dir: str, term: str, k: int = 20):
    """O30 search over the crawl-fed incremental index: score = token tf
    of ``term``, top-k by (score desc, url asc); reads only the term's
    partition of the compacted segments."""
    import ray.data as rd

    pruned, _keys, _stats = _pruned_crawl_postings(index_dir, [term])
    if pruned is None:
        return rd.from_arrow(_empty_url_scores())

    def score(t: pa.Table) -> pa.Table:
        u = t["url"]
        return pa.Table.from_arrays(
            [u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u, pc.cast(t["tf"], pa.int64())],
            names=["url", "score"],
        )

    # house-style top-k (stages/topk.py): per-block top-k bounds the
    # global sort input even if the upstream pruning ever widens
    return _topk(
        pruned.map_batches(score, batch_format="pyarrow"),
        ["score", "url"], [True, False], k,
    )


def crawl_bm25_topk(index_dir: str, terms, k: int = 20, k1: float = 1.2, b: float = 0.75):
    """BM25 over the crawl-fed incremental index — same formula (and the
    same DuckDB-twin parity discipline) as ``bm25_index_topk``, keyed by
    term hash and scoring crawl urls."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    terms = list(terms)
    pruned, key_set, stats = _pruned_crawl_postings(index_dir, terms)
    if pruned is None:
        return rd.from_arrow(_empty_url_scores())
    pruned = pruned.materialize()  # consumed twice: df aggregate + scoring

    def df_partial(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["term_hash"], value_set=key_set).to_numpy(zero_copy_only=False)
        return pa.table({f"df_{i}": [int((idx == i).sum())] for i in range(len(terms))})

    agg = pruned.map_batches(df_partial, batch_format="pyarrow").aggregate(
        *[Sum(f"df_{i}", alias_name=f"df_{i}") for i in range(len(terms))]
    )
    if not agg:
        return rd.from_arrow(_empty_url_scores())
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    idf = np.array(
        [
            np.log((n_docs - (agg[f"df_{i}"] or 0) + 0.5) / ((agg[f"df_{i}"] or 0) + 0.5) + 1.0)
            for i in range(len(terms))
        ],
        dtype=np.float64,
    )

    def score(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        ti = pc.index_in(t["term_hash"], value_set=key_set).to_numpy(zero_copy_only=False)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        s = idf[ti] * (tf * (k1 + 1.0)) / (tf + norm)
        u = t["url"]
        return pa.Table.from_arrays(
            [u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u, pa.array(s, pa.float64())],
            names=["url", "part_score"],
        )

    summed = (
        pruned.map_batches(score, batch_format="pyarrow")
        .groupby("url")
        .aggregate(Sum("part_score", alias_name="raw"))
    )
    return _topk(
        summed.map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t["url"].combine_chunks() if isinstance(t["url"], pa.ChunkedArray) else t["url"],
                    pa.array(round_half_away(t["raw"].to_numpy(zero_copy_only=False), 4), pa.float64()),
                ],
                names=["url", "score"],
            ),
            batch_format="pyarrow",
        ),
        ["score", "url"], [True, False], k,
    )


def term_tf_topk(index_dir: str, term: str, k: int = 20):
    """Index-backed O30 search: score = token tf of ``term``, top-k by
    (score desc, doc_id asc). Reads only the term's partition."""
    import ray.data as rd

    pruned, _stats = _pruned_postings(index_dir, [term])
    if pruned is None:
        return rd.from_arrow(_empty_scores())

    def score(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pc.cast(t["doc_id"], pa.int64()), pc.cast(t["tf"], pa.int64())],
            names=["doc_id", "score"],
        )

    # house-style top-k (stages/topk.py): per-block top-k bounds the
    # global sort input even if the upstream pruning ever widens
    return _topk(
        pruned.map_batches(score, batch_format="pyarrow"),
        ["score", "doc_id"], [True, False], k,
    )


def bm25_index_topk(index_dir: str, terms, k: int = 20, k1: float = 1.2, b: float = 0.75):
    """Index-backed BM25 top-k over the persisted postings.

    df comes from the pruned postings (each (term, doc) row exists iff
    tf>0, so df = row count per term); n/avgdl from stats.json. Scoring
    is vectorized; the only shuffle is the per-doc Sum over candidate
    rows. Matches the DuckDB twin's formula exactly: contributions are
    summed per doc and half-away-rounded to 4 decimals at the end.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    terms = list(terms)
    pruned, stats = _pruned_postings(index_dir, terms)
    if pruned is None:
        return rd.from_arrow(_empty_scores())
    pruned = pruned.materialize()  # consumed twice: df aggregate + scoring
    term_arr = pa.array(terms, pa.string())

    def df_partial(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["term"], value_set=term_arr).to_numpy(zero_copy_only=False)
        return pa.table({f"df_{i}": [int((idx == i).sum())] for i in range(len(terms))})

    agg = pruned.map_batches(df_partial, batch_format="pyarrow").aggregate(
        *[Sum(f"df_{i}", alias_name=f"df_{i}") for i in range(len(terms))]
    )
    if not agg:  # partitions existed but held none of the query terms
        return rd.from_arrow(_empty_scores())
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    idf = np.array(
        [
            np.log((n_docs - (agg[f"df_{i}"] or 0) + 0.5) / ((agg[f"df_{i}"] or 0) + 0.5) + 1.0)
            for i in range(len(terms))
        ],
        dtype=np.float64,
    )

    def score(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        ti = pc.index_in(t["term"], value_set=term_arr).to_numpy(zero_copy_only=False)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        s = idf[ti] * (tf * (k1 + 1.0)) / (tf + norm)
        return pa.Table.from_arrays(
            [pc.cast(t["doc_id"], pa.int64()), pa.array(s, pa.float64())],
            names=["doc_id", "part_score"],
        )

    summed = (
        pruned.map_batches(score, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("part_score", alias_name="raw"))
    )
    return _topk(
        summed.map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    t["doc_id"].combine_chunks() if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"],
                    pa.array(round_half_away(t["raw"].to_numpy(zero_copy_only=False), 4), pa.float64()),
                ],
                names=["doc_id", "score"],
            ),
            batch_format="pyarrow",
        ),
        ["score", "doc_id"], [True, False], k,
    )
