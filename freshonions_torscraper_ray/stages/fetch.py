"""Replay-fetch + extract actor stage (S3 + O2..O11 fused).

One actor pool stage does lookup-into-content-store ("fetch") and full
extraction per scheduled URL, emitting a wide Arrow table with list
columns for the side outputs (links/emails/btc/candidates) — downstream
explodes are cheap column ops, and documents are read exactly once.

Stateful: the ContentStore (bucketed parquet handles + per-bucket cache)
is opened once per actor in ``__init__`` (the reference opened its DB/ES
sessions once per process — O15). The batch lookup groups URLs by
domain-hash bucket so each fetch batch touches few partitions.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import FETCH_WORKER_CPUS, CrawlConfig
from ..store import ContentStore

RESULT_FIELDS = [
    ("url", pa.string()),
    ("domain", pa.string()),
    ("status", pa.int32()),
    ("size", pa.int64()),
    ("title", pa.string()),
    ("text", pa.large_string()),
    ("is_frontpage", pa.bool_()),
    ("clone_fp", pa.int64()),
    ("depth", pa.int32()),
    ("priority", pa.float32()),
    ("discovered_seq", pa.int64()),
    ("vtime", pa.float64()),
    ("fetch_order", pa.int64()),
    ("retries", pa.int32()),
    ("link_dsts", pa.list_(pa.string())),
    ("link_dst_domains", pa.list_(pa.string())),
    ("link_anchors", pa.list_(pa.string())),
    ("emails", pa.list_(pa.string())),
    ("btc", pa.list_(pa.string())),
    ("cand_urls", pa.list_(pa.string())),
    ("cand_domains", pa.list_(pa.string())),
    ("cand_depths", pa.list_(pa.int32())),
]
RESULT_SCHEMA = pa.schema([pa.field(n, t) for n, t in RESULT_FIELDS])

PAGE_COLS = [
    "url", "domain", "status", "size", "title", "text", "is_frontpage",
    "clone_fp", "depth", "vtime", "fetch_order", "discovered_seq",
]


# Worker-process-global content-store cache: the fetch stage runs as a
# TASK pool (no per-round actor startup — rounds are short-lived), and Ray
# reuses worker processes, so each worker opens the store once and keeps
# its bucket cache across rounds. Same state-amortization as an actor
# pool without paying actor creation per round.
_STORE_CACHE: dict[tuple[str, int], ContentStore] = {}

# fetch/extract kernel chunk rows: large enough that per-call fixed
# costs (DuckDB findall_batch setup, Arrow kernel dispatch) are noise,
# small enough that one chunk's working set (text + wide output +
# kernel intermediates, ~10-20x the chunk's raw text bytes) stays
# LLC-RESIDENT with every core busy. This is the measured wide-width
# cliff on 2-4 KB pages: at 8192 rows/chunk each worker cycles ~25 MB+
# through the shared L3, and 16 concurrent workers evict each other
# continuously — 2.3-3.7x more CPU per URL than at 1024 (interleaved
# A/B, P=16 standalone kernel: 8192 -> 11-18k urls/s agg, 1024 ->
# 28-40k; P=4 is flat across sizes because 4 workers fit either way).
# Purely an execution knob — results are chunk-boundary independent
# (deliberately NOT CrawlConfig: cfg is fingerprinted as "everything
# that influences crawl ordering").
KERNEL_ROWS = int(os.environ.get("ONIONRAY_KERNEL_ROWS", "1024"))


def _cached_store(docs_dir: str, n_buckets: int) -> ContentStore:
    key = (docs_dir, n_buckets)
    store = _STORE_CACHE.get(key)
    if store is None:
        store = _STORE_CACHE[key] = ContentStore(docs_dir, n_buckets)
    return store


class FetchExtract:
    def __init__(self, docs_dir: str, n_buckets: int, config: CrawlConfig):
        self.store = _cached_store(docs_dir, n_buckets)
        self.cfg = config

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Fully columnar fetch+extract: span-core columns (Arrow
        kernels + numpy segment ops), one vectorized RE2 pass per
        pattern, vectorized dedup/candidate assembly — no per-doc
        Python anywhere. Identical results to per-doc extract_doc
        (golden/conformance/unit-verified).

        A batch carrying ``spans``/``doc_hit`` columns (produced by
        :meth:`join_docs` in a two-phase tail round) skips the content
        store entirely — extract can then run on ANY worker, not just
        the bucket owner."""
        if "doc_hit" in batch.column_names:
            hit = batch["doc_hit"].to_numpy(zero_copy_only=False) == 1
            spans = batch["spans"]
            spans = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) else spans
            spans_hit = spans.filter(pa.array(hit))
            return self._extract(batch.drop_columns(["spans", "doc_hit"]), spans_hit, hit)
        urls = batch["url"].to_numpy(zero_copy_only=False)
        domains = batch["domain"].to_numpy(zero_copy_only=False)
        docs, hst = self.store.lookup(urls, domains)
        return self._extract(batch, docs["spans"], hst == 1)

    def join_docs(self, batch: pa.Table) -> pa.Table:
        """Phase A of a two-phase tail round: content-store lookup ONLY
        (the part that needs bucket affinity). Returns the batch with
        ``spans`` scattered to full length (null on miss) + ``doc_hit``
        — a self-contained block any worker can extract from."""
        import pyarrow.compute as pc

        n = batch.num_rows
        urls = batch["url"].to_numpy(zero_copy_only=False)
        domains = batch["domain"].to_numpy(zero_copy_only=False)
        docs, hst = self.store.lookup(urls, domains)
        hit = hst == 1
        hit_idx = np.flatnonzero(hit)
        idx_map = np.full(n, -1, np.int64)
        idx_map[hit_idx] = np.arange(len(hit_idx))
        spans_col = docs["spans"]
        spans_col = spans_col.combine_chunks() if isinstance(spans_col, pa.ChunkedArray) else spans_col
        spans_full = pc.take(spans_col, pa.array(idx_map, mask=idx_map < 0))
        return batch.append_column("spans", spans_full).append_column(
            "doc_hit", pa.array(hit.astype(np.int8))
        )

    def _extract(self, batch: pa.Table, spans_hit, hit: np.ndarray) -> pa.Table:
        """Extract/assemble from already-joined spans (``spans_hit`` =
        span lists of the hit rows, in batch order)."""
        import pyarrow.compute as pc

        n = batch.num_rows

        def col(name: str, typ: pa.DataType):
            c = batch[name]
            c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            return c.cast(typ) if c.type != typ else c

        depths = batch["depth"].to_numpy(zero_copy_only=False)
        hit_idx = np.flatnonzero(hit)

        from ..functions.doc_extract import extract_finish_columnar, span_core_columns

        url_col = col("url", pa.string())
        core = span_core_columns(spans_hit)
        fin = extract_finish_columnar(
            core, url_col.take(pa.array(hit_idx, pa.int64())), depths[hit_idx].astype(np.int64), self.cfg.max_depth
        )

        # scatter hit-doc scalars to full-batch columns (misses keep 0/"")
        size = np.zeros(n, np.int64)
        clone_fp = np.zeros(n, np.int64)
        size[hit_idx] = core["sizes"]
        clone_fp[hit_idx] = core["clone_fps"]
        idx_map = np.full(n, -1, np.int64)
        idx_map[hit_idx] = np.arange(len(hit_idx))
        take_hits = pa.array(idx_map, mask=idx_map < 0)
        title = pc.fill_null(pc.take(core["titles"], take_hits), "")
        text = pc.fill_null(pc.take(core["texts"], take_hits), "")

        def list_col(counts_hit: np.ndarray, values, typ: pa.DataType):
            """hit-doc (counts, flat values) → full-batch list column."""
            counts = np.zeros(n, np.int64)
            counts[hit_idx] = counts_hit
            offs = np.zeros(n + 1, np.int64)
            np.cumsum(counts, out=offs[1:])
            values = values if isinstance(values, pa.Array) else pa.array(values, typ.value_type)
            if values.type != typ.value_type:
                values = values.cast(typ.value_type)
            return pa.ListArray.from_arrays(pa.array(offs, pa.int32()).cast(pa.int32()), values)

        link_counts = np.bincount(core["link_parent"], minlength=len(hit_idx)) if len(hit_idx) else np.zeros(0, np.int64)
        e_counts, e_vals = fin["emails"]
        b_counts, b_vals = fin["btc"]
        c_counts, c_urls, c_doms, c_deps = fin["cands"]

        retries = (
            col("retries", pa.int32())
            if "retries" in batch.column_names
            else pa.array(np.zeros(n, np.int32))
        )
        # miss rows: extract_doc's is_frontpage is exactly endswith(".onion/"),
        # so ONE vectorized kernel covers hits and misses alike
        T = RESULT_SCHEMA.field
        arrays = {
            "url": url_col,
            "domain": col("domain", pa.string()),
            "status": pa.array(np.where(hit, np.int32(200), np.int32(404))),
            "size": pa.array(size),
            "title": title.cast(pa.string()),
            "text": text.cast(pa.large_string()),
            "is_frontpage": pc.ends_with(url_col, pattern=".onion/"),
            "clone_fp": pa.array(clone_fp),
            "depth": col("depth", pa.int32()),
            "priority": col("priority", pa.float32()),
            "discovered_seq": col("discovered_seq", pa.int64()),
            "vtime": col("vtime", pa.float64()),
            "fetch_order": col("fetch_order", pa.int64()),
            "retries": retries,
            "link_dsts": list_col(link_counts, core["link_dsts"], T("link_dsts").type),
            "link_dst_domains": list_col(link_counts, core["link_doms"], T("link_dst_domains").type),
            "link_anchors": list_col(link_counts, core["link_anchors"], T("link_anchors").type),
            "emails": list_col(e_counts, e_vals, T("emails").type),
            "btc": list_col(b_counts, b_vals, T("btc").type),
            "cand_urls": list_col(c_counts, c_urls, T("cand_urls").type),
            "cand_domains": list_col(c_counts, c_doms, T("cand_domains").type),
            "cand_depths": list_col(c_counts, pa.array(c_deps, pa.int32()), T("cand_depths").type),
        }
        return pa.Table.from_arrays([arrays[f] for f, _ in RESULT_FIELDS], schema=RESULT_SCHEMA)


def _merge_candidates(wide: pa.Table, cfg: CrawlConfig, rnd: int, acc: list) -> int:
    """Stage a block's candidates into the per-actor accumulator as
    COLUMNS (no per-candidate Python). Returns the raw candidate count.

    Seq packing is vectorized (one numpy expression over the flattened
    candidate lists, with the same overflow guard as ``pack_seq``); the
    min-seq dedup happens once per round in :meth:`drain_accepts` — a
    lexsort first-per-url, arrival-order independent like the dict merge
    it replaced."""
    import pyarrow.compute as pc

    cu_col = wide["cand_urls"]
    cu_col = cu_col.combine_chunks() if isinstance(cu_col, pa.ChunkedArray) else cu_col
    lens = pc.list_value_length(cu_col).to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return 0
    orders = wide["fetch_order"].to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(len(lens)), lens)
    pos = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    f = orders[parent]
    if rnd >= (1 << (63 - cfg.ROUND_SHIFT)) or (len(f) and int(f.max()) >= (1 << (cfg.ROUND_SHIFT - cfg.FETCH_SHIFT))) or int(pos.max()) >= (1 << cfg.FETCH_SHIFT):
        raise OverflowError(f"pack_seq overflow in round {rnd} (see CrawlConfig.pack_seq)")
    seqs = (np.int64(rnd) << np.int64(cfg.ROUND_SHIFT)) | (f << np.int64(cfg.FETCH_SHIFT)) | pos
    dc = wide["cand_domains"]
    acc.append(
        (
            pc.list_flatten(cu_col),
            pc.list_flatten(dc.combine_chunks() if isinstance(dc, pa.ChunkedArray) else dc),
            pc.list_flatten(wide["cand_depths"]).to_numpy(zero_copy_only=False),
            seqs,
        )
    )
    return total


def _explode_list_cols(wide: pa.Table, list_cols: list[str], out_names: list[str], keep: list[str]) -> list:
    """Flatten parallel list columns + repeat parent columns, fully on
    Arrow kernels (list_flatten / list_parent_indices / take — the
    pattern proven in stages/extract.py)."""
    import pyarrow.compute as pc

    first = wide[list_cols[0]]
    first = first.combine_chunks() if isinstance(first, pa.ChunkedArray) else first
    parent = pc.list_parent_indices(first)
    out = [pc.take(wide[k], parent) for k in keep]
    for c in list_cols:
        col = wide[c]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        out.append(pc.list_flatten(col))
    return out


def _explode_links(wide: pa.Table) -> pa.Table:
    from ..schemas import LINKS

    src, srcd, dst, dstd, anc = _explode_list_cols(
        wide, ["link_dsts", "link_dst_domains", "link_anchors"], [], ["url", "domain"]
    )
    return pa.Table.from_arrays([src, srcd, dst, dstd, anc], schema=LINKS)


def _explode_addr(wide: pa.Table, col: str) -> pa.Table:
    urls_o, doms_o, addr = _explode_list_cols(wide, [col], [], ["url", "domain"])
    return pa.Table.from_arrays([addr, urls_o, doms_o], names=["address", "url", "domain"])


def enrich_pages(pages: pa.Table) -> pa.Table:
    """Per-page enrichment (cfg.enrich): language ID over the stripped
    text (reference O10 — Domain.language), quality stats, simhash
    fingerprint. Runs inside the fetch actor so text never leaves it
    unenriched; all deterministic (token-hash cache amortizes cost)."""
    from .textstats import enrich_fused

    # ONE text pass serves quality stats, language ID AND simhash (fused
    # DuckDB kernel — replaces ~24 per-batch text scans); .view(int64)
    # is the same two's-complement conversion as dedup.SimHasher —
    # fingerprints must join across tables
    pages, sims = enrich_fused(pages, "text")
    return pages.append_column("simhash", pa.array(sims.view(np.int64)))


def derive_round_tables(wide: pa.Table, rnd: int, enrich: bool = False, index_text: bool = False) -> dict[str, pa.Table]:
    """Derive the output tables (pages/links/emails/btc [+ postings
    segment]) from the wide fetch output — pure column work, no I/O."""
    pages = wide.select(PAGE_COLS).append_column(
        "round", pa.array([rnd] * wide.num_rows, pa.int32())
    )
    if enrich:
        pages = enrich_pages(pages)
    out = {
        "pages": pages,
        "links": _explode_links(wide),
        "emails": _explode_addr(wide, "emails"),
        "btc": _explode_addr(wide, "btc"),
    }
    if index_text:
        # incremental search-index sink (cfg.index_text): one postings
        # SEGMENT per worker per round, compacted at query time by
        # stages/text_index.py::compact_crawl_index
        from .text_index import crawl_postings_table

        out["postings"] = crawl_postings_table(pages)
    return out


def write_table_parts(tables: dict[str, pa.Table], base_dir: str, part: str) -> None:
    """Write one parquet part per table into the staged round directory.
    Part names are caller-unique; the round manifest (written after) is
    the commit gate."""
    for name, table in tables.items():
        tdir = os.path.join(base_dir, name)
        os.makedirs(tdir, exist_ok=True)
        pq.write_table(table, os.path.join(tdir, f"part-{part}.parquet"))




def plan_fetch_routing(
    by_bucket: dict[int, list[tuple[int, object]]],
    n_rows: int,
    pool_size: int,
    factor: float = 1.0,
    slicer=None,
) -> tuple[list[tuple[int, list]], list[int], int]:
    """Skew-aware routing plan [B: north_rule] — pure function (unit /
    property tested) used by the round loop. Input: per-content-bucket
    ``[(n_rows, payload), ...]`` sub-blocks (one per schedule merger).
    Output: ``(submit, loads, n_splits)`` where submit is the
    size-descending list of (worker, [payload, ...]) process calls.

    Two deterministic mechanisms on top of bucket-pinned ownership
    (worker ``b %% pool_size`` owns bucket ``b``):

    1. HOT-BUCKET SPLITTING: a bucket whose rows exceed ``factor`` × a
       worker's fair share would pin the round tail to one actor (hot
       onion domains hash-cluster into content buckets). Its sub-blocks
       are dealt into size-balanced parts assigned to neighbouring
       workers. With ``slicer(payload, offset, n) -> payload`` given
       (the crawl's payloads are ``(ref, offset, n_rows)`` zero-copy
       slices, so sub-slicing is pure arithmetic), a hot bucket splits
       even when it arrives as ONE sub-block — the single-merger tail
       rounds where a last hot domain would otherwise serialize the
       round on its owner while every other worker idles. Without a
       slicer (opaque payloads), only multi-sub-block buckets split.
    2. CONDITIONAL OWNER-PREFERRING GREEDY: static ownership keeps
       every bucket on the worker whose cache holds it; greedy
       rebalancing migrates buckets (one extra partition parse each),
       so it engages only when the static plan is ACTUALLY skewed
       (>10% over fair share) — measured: unconditional 2%-slack
       greedy cost ~15% at 8 cpus (cache churn) to win ~4% at 32.

    Both are cheap under the unbounded per-worker bucket cache, and
    neither affects crawl ordering — fetch_order is assigned before
    routing; candidate dedup is min-seq (arrival-order independent).
    The plan depends only on deterministic sizes, so it is itself
    deterministic at any pool size.
    """
    P = pool_size
    fair = max(1, -(-n_rows // P))
    parts: list[tuple[int, int, int, list]] = []  # (size, bucket, pref_worker, payloads)
    n_splits = 0
    for b, items in by_bucket.items():
        size_b = sum(nr for nr, _ in items)
        if factor > 0 and size_b > factor * fair and (len(items) > 1 or slicer is not None):
            if slicer is None:
                k = min(len(items), -(-size_b // fair))
                bins: list[list] = [[] for _ in range(k)]
                bloads = [0] * k
                for nr, payload in sorted(items, key=lambda x: -x[0]):
                    j = bloads.index(min(bloads))
                    bins[j].append(payload)
                    bloads[j] += nr
            else:
                # slice-level split: cut the bucket's row stream into k
                # near-equal contiguous runs (deterministic: input order)
                k = -(-size_b // fair)
                target = -(-size_b // k)
                bins = [[] for _ in range(k)]
                bloads = [0] * k
                j = 0
                for nr, payload in items:
                    off = 0
                    while nr > 0:
                        if bloads[j] >= target and j < k - 1:
                            j += 1
                        take = min(nr, target - bloads[j]) if j < k - 1 else nr
                        bins[j].append(slicer(payload, off, take))
                        bloads[j] += take
                        off += take
                        nr -= take
            n_splits += k - 1
            for j, grp in enumerate(bins):
                if grp:
                    parts.append((bloads[j], b, (b + j) % P, grp))
        else:
            parts.append((size_b, b, b % P, [payload for _, payload in items]))
    parts.sort(key=lambda p: (-p[0], p[1], p[2]))  # size-desc, ties by bucket
    static_loads = [0] * P
    for sz, _b, pref, _g in parts:
        static_loads[pref] += sz
    loads = [0] * P
    submit: list[tuple[int, list]] = []
    if max(static_loads, default=0) <= fair * 1.1:
        for sz, _b, pref, grp in parts:
            submit.append((pref, grp))
            loads[pref] += sz
    else:
        cap_load = fair * 1.05
        for sz, _b, pref, grp in parts:
            w = pref
            if loads[pref] + sz > cap_load:
                mn = min(loads)
                if loads[pref] - mn > max(fair // 20, 1):
                    w = loads.index(mn)
            submit.append((w, grp))
            loads[w] += sz
    return submit, loads, n_splits


def _resolve_block(block):
    """Materialize a process()/lookup_join() input: a table passes
    through; a list of ObjectRefs is fetched actor-side; a list of
    ``(ref, offset, n_rows)`` payloads resolves each distinct ref ONCE
    and takes zero-copy slices."""
    if isinstance(block, list):
        import ray as _ray

        if block and isinstance(block[0], tuple):
            by_ref: dict = {}
            for ref, off, nr in block:
                by_ref.setdefault(ref, []).append((off, nr))
            refs = list(by_ref)
            parts = [
                t.slice(off, nr)
                for t, ref in zip(_ray.get(refs), refs)
                for off, nr in by_ref[ref]
            ]
        else:
            parts = _ray.get(block)
        block = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
    return block


def plan_weighted_slices(
    blocks: list[tuple[object, np.ndarray]], n_workers: int, slices_per_worker: int = 4
) -> list[tuple[int, list]]:
    """Cost-balanced re-routing plan for two-phase tail rounds — pure
    function (property-tested). Input: ``(ref, weights)`` per joined
    block where ``weights[i]`` is the cost proxy of row i (1 + span
    count: hub pages with thousands of links are the measured tail-round
    straggler — rows balance, bytes don't). Output: ``(worker, [(ref,
    offset, n_rows), ...])`` calls, contiguous slices cut at ~total /
    (n_workers × slices_per_worker) weight, assigned LPT (heaviest slice
    to the least-loaded worker; deterministic tie-breaks)."""
    slices: list[tuple[float, int, int, tuple]] = []  # (wgt, blk, off, payload)
    total = 0.0
    for bi, (_ref, w) in enumerate(blocks):
        total += float(w.sum())
    if total <= 0:
        return []
    target = max(1.0, total / (n_workers * slices_per_worker))
    for bi, (ref, w) in enumerate(blocks):
        cum = 0.0
        off = 0
        for i in range(len(w)):
            cum += float(w[i])
            if cum >= target:
                slices.append((cum, bi, off, (ref, off, i + 1 - off)))
                off = i + 1
                cum = 0.0
        if off < len(w):
            slices.append((cum, bi, off, (ref, off, len(w) - off)))
    loads = [0.0] * n_workers
    out: list[list] = [[] for _ in range(n_workers)]
    for wgt, _bi, _off, payload in sorted(slices, key=lambda s: (-s[0], s[1], s[2])):
        j = loads.index(min(loads))
        out[j].append(payload)
        loads[j] += wgt
    return [(j, grp) for j, grp in enumerate(out) if grp]


def make_fetch_worker():
    """Bucket-pinned persistent fetch actor (raw Ray actor by design).

    Ray Data's map_batches cannot route batches to specific pool members,
    so the content-store cache cannot be made partition-affine under a
    task pool — every worker ends up faulting in every bucket and the
    redundant parquet parsing grows with worker count (measured: 23→63
    cpu-s/round at 150k domains). Each FetchWorker instead OWNS the
    buckets ``{b : b %% pool_size == actor_id}`` for the whole crawl:
    every bucket is parsed once per run, then served from memory across
    all rounds. The round loop submits ONE ``process`` call per worker
    per round carrying (ref, offset, len) slice payloads;
    fetch+extract+candidate-accept+output-write all happen inside the
    actor (single pass, no driver traffic).
    """
    import ray

    @ray.remote(num_cpus=FETCH_WORKER_CPUS)
    class FetchWorker:
        def __init__(self, actor_id: int, docs_dir: str, n_buckets: int, cfg, seen_handles):
            self.actor_id = actor_id
            self.fe = FetchExtract(docs_dir, n_buckets, cfg)
            self.fe.store.MAX_CACHED_BUCKETS = n_buckets + 1  # pin owned buckets
            self.cfg = cfg
            self.seen = seen_handles
            self._cand_acc: list = []  # staged candidate columns per kernel chunk
            self._retry_rows: list[tuple] = []
            self._out: dict[str, list[pa.Table]] = {}

        def process(self, block, rnd: int, out_dir: str) -> tuple[int, int]:
            """Fetch+extract this worker's whole round share (ONE call
            per worker per round); candidates are ACCUMULATED in-actor
            (min-seq merged) and pushed to the seen shards once per round
            via :meth:`drain_accepts`; output tables are BUFFERED
            in-actor and written once per round via :meth:`flush_outputs`
            (one part per table per actor, overlapped with the drain
            phase — not one tiny file per bucket). ``block`` may be:

            - a ``pa.Table`` (tests / direct callers),
            - a list of ObjectRefs — fetched actor-side, concatenated,
            - a list of ``(ref, offset, n_rows)`` slice payloads naming
              zero-copy slices of the mergers' owner-grouped blocks —
              the distinct refs are resolved ONCE, never via the driver.

            The kernel runs in bounded chunks (``KERNEL_ROWS``) so its
            per-call fixed costs amortize on fat rounds without holding
            more than a chunk's wide output in flight at a time; chunk
            boundaries cannot affect results (row-independent kernel,
            min-seq candidate merge is arrival-order independent)."""
            if os.environ.get("ONIONRAY_CPROFILE") and not getattr(self, "_cprofiled", False):
                self._cprofiled = True
                import cProfile

                pr = cProfile.Profile()
                pr.enable()
                out = self._process_inner(block, rnd, out_dir)
                pr.disable()
                pr.dump_stats(f"/tmp/onionray_prof_{self.actor_id}.pstats")
                return out
            return self._process_inner(block, rnd, out_dir)

        def _process_inner(self, block, rnd: int, out_dir: str) -> tuple[int, int]:
            block = _resolve_block(block)
            n_cand = 0
            enrich = getattr(self.cfg, "enrich", False)
            index_text = getattr(self.cfg, "index_text", False)
            recheck = getattr(self.cfg, "recheck_dead", False)
            prof = os.environ.get("ONIONRAY_PROFILE")
            if prof:
                t0w, t0c = time.perf_counter(), time.process_time()
            for s in range(0, block.num_rows, KERNEL_ROWS):
                wide = self.fe(block.slice(s, KERNEL_ROWS))
                n_cand += _merge_candidates(wide, self.cfg, rnd, self._cand_acc)
                if recheck:
                    self._collect_retries(wide, rnd)
                for name, t in derive_round_tables(wide, rnd, enrich=enrich, index_text=index_text).items():
                    self._out.setdefault(name, []).append(t)
            if prof:
                self._perf = (
                    time.perf_counter() - t0w,
                    time.process_time() - t0c,
                    block.num_rows,
                )
            return (block.num_rows, n_cand)

        def lookup_join(self, block) -> tuple:
            """Phase A of a two-phase tail round: bucket-affine content
            lookup only. Returns (ObjectRef of the joined block, per-row
            cost weights = 1 + span count) — the driver re-routes
            extract/enrich slices cost-balanced across ALL workers."""
            import pyarrow.compute as pc
            import ray as _ray

            _t0 = time.perf_counter()
            block = _resolve_block(block)
            _t1 = time.perf_counter()
            joined = self.fe.join_docs(block)
            _t2 = time.perf_counter()
            w = pc.fill_null(pc.list_value_length(joined["spans"]), 0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64) + 1
            ref = _ray.put(joined)
            self._lookup_perf = (_t1 - _t0, _t2 - _t1, time.perf_counter() - _t2)
            return (ref, w.astype(np.int32))

        def lookup_perf(self):
            """Profile-only: (resolve_s, join_s, put_s) of the last
            lookup_join call."""
            return getattr(self, "_lookup_perf", (0.0, 0.0, 0.0))

        def preimport(self) -> int:
            """Absorb this process's one-time heavy imports before the
            first real batch (fired at pool creation, fire-and-forget;
            actor task ordering makes it complete before process())."""
            import duckdb  # noqa: F401
            import pandas  # noqa: F401
            import pyarrow.parquet  # noqa: F401

            from ..functions import doc_extract  # noqa: F401
            from ..functions import tokenize  # noqa: F401

            # first-use lazies inside the extract path (duckdb session)
            doc_extract._duck()
            return 1

        def prewarm(self, owned_buckets: list[int]) -> int:
            """Parse this worker's owned buckets into its cache (first
            round boundary, queued behind round-1 work — fills the
            worker's idle window during driver-side schedule staging)."""
            return self.fe.store.warm(owned_buckets)

        def perf_stats(self):
            """Profile-only (ONIONRAY_PROFILE): (wall_s, cpu_s, rows) of
            this worker's last process() call."""
            return getattr(self, "_perf", (0.0, 0.0, 0))

        def flush_outputs(self, out_dir: str, rnd: int) -> int:
            """Write this round's buffered tables (one parquet part per
            table per actor) into the staged round dir, then clear."""
            bufs = self._out
            self._out = {}
            if not bufs:
                return 0
            tables = {
                name: (ts[0] if len(ts) == 1 else pa.concat_tables(ts))
                for name, ts in bufs.items()
            }
            write_table_parts(tables, out_dir, f"r{rnd:05d}-w{self.actor_id:04d}")
            return tables["pages"].num_rows

        def _collect_retries(self, wide: pa.Table, rnd: int) -> None:
            import pyarrow.compute as pc

            cfg = self.cfg
            mask = pc.and_(
                pc.and_(pc.not_equal(wide["status"], 200), wide["is_frontpage"]),
                pc.less(wide["retries"], cfg.recheck_max_retries),
            )
            if not pc.any(mask).as_py():
                return
            sub = wide.filter(mask)
            for u, d, dep, seq, r in zip(
                sub["url"].to_pylist(),
                sub["domain"].to_pylist(),
                sub["depth"].to_pylist(),
                sub["discovered_seq"].to_pylist(),
                sub["retries"].to_pylist(),
            ):
                self._retry_rows.append(
                    (u, d, dep, 1000.0 + r, seq, rnd + cfg.recheck_backoff * (r + 1), r + 1)
                )

        def drain_retries(self, sched_handles) -> int:
            """Route accumulated alive re-check entries to the scheduler
            shards (O32); called once per round."""
            import ray as _ray

            from ..functions.hashing import hash64_signed

            rows = self._retry_rows
            self._retry_rows = []
            if not rows:
                return 0
            n_sched = len(sched_handles)
            by_shard: dict[int, list[tuple]] = {}
            for row in rows:
                by_shard.setdefault(hash64_signed(row[1]) % n_sched, []).append(row)
            futs = []
            for s, rws in by_shard.items():
                cols = tuple(list(c) for c in zip(*rws))
                futs.append(sched_handles[s].add_retry_cols.remote(cols))
            _ray.get(futs)
            return len(rows)

        def drain_accepts(self) -> int:
            """Min-seq dedup this round's staged candidate columns (one
            lexsort first-per-url — the vectorized form of the old dict
            merge) and route them to the seen shards (columnar
            payloads); called once per round after all process() calls."""
            import pyarrow.compute as _pc
            import ray as _ray

            from ..functions.hashing import hash64_array

            parts = self._cand_acc
            self._cand_acc = []
            if not parts or not self.seen:
                return 0
            urls = pa.concat_arrays([p[0] for p in parts])
            doms = pa.concat_arrays([p[1] for p in parts])
            deps = np.concatenate([p[2] for p in parts])
            seqs = np.concatenate([p[3] for p in parts])
            codes = _pc.dictionary_encode(urls).indices.to_numpy(zero_copy_only=False)
            order = np.lexsort((seqs, codes))
            cs = codes[order]
            first = order[np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])]
            first.sort()  # deterministic payload order (first-seen)
            u_py = urls.take(pa.array(first)).to_pylist()
            d_py = doms.take(pa.array(first)).to_pylist()
            dep_sel = deps[first]
            seq_sel = seqs[first]
            n_shards = len(self.seen)
            shard = hash64_array(u_py) % n_shards
            u_np = np.asarray(u_py, dtype=object)
            d_np = np.asarray(d_py, dtype=object)
            prio = dep_sel.astype(np.float64)
            futs = []
            for s in np.unique(shard):
                m = np.flatnonzero(shard == s)
                cols = (
                    u_np[m].tolist(),
                    d_np[m].tolist(),
                    dep_sel[m].tolist(),
                    prio[m].tolist(),
                    seq_sel[m].tolist(),
                )
                futs.append(self.seen[int(s)].accept.remote(cols))
            _ray.get(futs)
            return len(u_py)

    return FetchWorker
