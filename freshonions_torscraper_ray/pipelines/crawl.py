"""Crawl-round composition: the streaming Ray Data topology (SURVEY §3.1).

One crawl round:

  scheduler shards (actors)  --schedule-->  deterministic (vtime,url) sort
    → rd.from_arrow → map_batches(FetchExtract actor pool)   [replay fetch]
    → wide result (pages + list-typed side outputs), materialized once
    → explodes: pages / links / emails / btc / candidates    [cheap maps]
    → candidates: groupby(url).min(seq) exact round-dedup    [shuffle]
    → RouteNew actor-pool stage: cuckoo-shard add_if_new (URL-seen) +
      forward survivors to scheduler shards                  [actor RPC]
    → RoundStore.commit_round(pages, links, …, seen/sched state, metrics)

Determinism: the *schedule* (computed per-domain by actors, then sorted
by (vtime, url)) defines crawl order before any parallel execution
happens; discovery order is encoded in packed ``discovered_seq`` values
so dedup's first-wins is a distributed groupby-min, not an arrival race.

Failure model: the round commit (write-then-manifest) is the atomicity
unit. A mid-round crash leaves no manifest; resume restores actor state
from the last committed round and re-runs the round from scratch —
re-running is byte-identical because everything is deterministic.

Scale notes: the schedule concat/sort runs driver-side here (politeness
caps bound it to ≤ per_round_domain_cap × active domains); on a real
cluster replace with ds.sort + per-block offset assignment. RouteNew
moves only (url, domain, depth, seq) rows; documents never leave the
fetch stage except as extracted columns.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..functions.hashing import hash64_signed
from ..stages.fetch import FetchExtract
from ..state.cuckoo import make_seen_actor
from ..state.scheduler import make_scheduler_actor
from ..store import RoundStore

SCHED_FIELDS = [
    ("url", pa.string()),
    ("domain", pa.string()),
    ("depth", pa.int32()),
    ("priority", pa.float32()),
    ("discovered_seq", pa.int64()),
    ("vtime", pa.float64()),
    ("fetch_order", pa.int64()),
]

PAGE_COLS = [
    "url", "domain", "status", "size", "title", "text", "is_frontpage",
    "clone_fp", "depth", "vtime", "fetch_order", "discovered_seq",
]


def _sched_table(rows: list[tuple], base_order: int) -> pa.Table:
    """Sort the round's schedule by (vtime, url) and assign fetch_order."""
    rows = sorted(rows, key=lambda t: (t[5], t[0]))
    cols = list(zip(*rows)) if rows else [[] for _ in range(6)]
    n = len(rows)
    arrays = [
        pa.array(cols[0], pa.string()),
        pa.array(cols[1], pa.string()),
        pa.array(cols[2], pa.int32()),
        pa.array(cols[3], pa.float32()),
        pa.array(cols[4], pa.int64()),
        pa.array(cols[5], pa.float64()),
        pa.array(np.arange(base_order, base_order + n, dtype=np.int64)),
    ]
    return pa.Table.from_arrays(arrays, names=[n_ for n_, _ in SCHED_FIELDS])


def explode_candidates(cfg: CrawlConfig, rnd: int):
    """wide batch → candidate rows (url, domain, depth, priority, seq)."""

    def fn(t: pa.Table) -> pa.Table:
        urls, doms, depths, prios, seqs = [], [], [], [], []
        orders = t["fetch_order"].to_numpy(zero_copy_only=False)
        cu = t["cand_urls"].to_pylist()
        cd = t["cand_domains"].to_pylist()
        cdep = t["cand_depths"].to_pylist()
        for i in range(t.num_rows):
            f = int(orders[i])
            for pos, (u, d, dep) in enumerate(zip(cu[i], cd[i], cdep[i])):
                urls.append(u)
                doms.append(d)
                depths.append(dep)
                prios.append(float(dep))
                seqs.append(cfg.pack_seq(rnd, f, pos))
        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(doms, pa.string()),
                pa.array(depths, pa.int32()),
                pa.array(prios, pa.float32()),
                pa.array(seqs, pa.int64()),
            ],
            names=["url", "domain", "depth", "priority", "discovered_seq"],
        )

    return fn


def _dedup_min_seq(t: pa.Table) -> pa.Table:
    """Within-round exact dedup: keep the min discovered_seq row per url.
    (Used inside groupby(url).map_groups — first-discovery-wins.)"""
    import pandas as pd  # noqa: F401

    idx = pa.compute.sort_indices(t, sort_keys=[("discovered_seq", "ascending")])
    return t.take(idx[:1])


class RouteNew:
    """URL-seen check + survivor routing stage (task pool via
    ``route_new_batch``).

    Per batch: group by seen shard → add_if_new RPC (cuckoo + exact) →
    group survivors by scheduler shard → add_urls RPC. Emits one stats
    row per batch. Side-effecting: recovery is per-round restart from
    checkpoint, never task-level retry (see module docstring).
    """

    def __init__(self, seen_handles, sched_handles):
        self.seen = seen_handles
        self.sched = sched_handles

    def __call__(self, t: pa.Table) -> pa.Table:
        import ray

        urls = t["url"].to_pylist()
        doms = t["domain"].to_pylist()
        depths = t["depth"].to_pylist()
        prios = t["priority"].to_pylist()
        seqs = t["discovered_seq"].to_pylist()
        n_seen_shards = len(self.seen)
        by_shard: dict[int, list[int]] = {}
        for i, u in enumerate(urls):
            by_shard.setdefault(hash64_signed(u) % n_seen_shards, []).append(i)
        shard_ids = sorted(by_shard)
        futs = [self.seen[s].add_if_new.remote([urls[i] for i in by_shard[s]]) for s in shard_ids]
        new_mask = [False] * len(urls)
        for s, res in zip(shard_ids, ray.get(futs)):
            for i, is_new in zip(by_shard[s], res):
                new_mask[i] = is_new
        n_sched = len(self.sched)
        adds: dict[int, list[tuple]] = {}
        for i, is_new in enumerate(new_mask):
            if is_new:
                adds.setdefault(hash64_signed(doms[i]) % n_sched, []).append(
                    (urls[i], doms[i], int(depths[i]), float(prios[i]), int(seqs[i]))
                )
        if adds:
            ray.get([self.sched[s].add_urls.remote(rows) for s, rows in adds.items()])
        return pa.Table.from_arrays(
            [
                pa.array([len(urls)], pa.int64()),
                pa.array([sum(new_mask)], pa.int64()),
            ],
            names=["n_candidates", "n_new"],
        )


def route_new_batch(t: pa.Table, *, seen_handles, sched_handles) -> pa.Table:
    """Task-pool form of RouteNew (handles travel in the task closure)."""
    return RouteNew(seen_handles, sched_handles)(t)


class CrawlEngine:
    """Owns the actor pools + round loop + checkpoint/resume."""

    def __init__(self, web_dir: str, store_dir: str, cfg: CrawlConfig | None = None):
        self.web_dir = web_dir
        self.store = RoundStore(store_dir)
        self.cfg = cfg or CrawlConfig()
        with open(os.path.join(web_dir, "meta.json")) as f:
            self.web_meta = json.load(f)
        self.docs_dir = os.path.join(web_dir, "documents")
        self.seen_handles = []
        self.sched_handles = []
        self.fetch_order = 0
        self.round = 0

    # ---------------------------------------------------------- setup

    def _robots_by_shard(self) -> list[dict[str, str]]:
        robots = pq.read_table(os.path.join(self.web_dir, "robots.parquet"))
        shards: list[dict[str, str]] = [dict() for _ in range(self.cfg.num_scheduler_shards)]
        for dom, body in zip(robots["domain"].to_pylist(), robots["body"].to_pylist()):
            shards[hash64_signed(dom) % self.cfg.num_scheduler_shards][dom] = body
        return shards

    def start_fresh(self) -> None:
        Seen = make_seen_actor()
        Sched = make_scheduler_actor()
        cfg = self.cfg
        self.seen_handles = [Seen.remote(i, seed=cfg.seed) for i in range(cfg.num_cuckoo_shards)]
        robots_shards = self._robots_by_shard()
        self.sched_handles = [
            Sched.remote(i, cfg, robots_shards[i]) for i in range(cfg.num_scheduler_shards)
        ]
        # seed insertion (S2/O31): canonical order = file order, first wins
        import ray

        seeds = pq.read_table(os.path.join(self.web_dir, "seeds.parquet"))["url"].to_pylist()
        seen_rpc: dict[int, list[str]] = {}
        order: dict[str, int] = {}
        for i, u in enumerate(seeds):
            if u not in order:
                order[u] = i
                seen_rpc.setdefault(hash64_signed(u) % cfg.num_cuckoo_shards, []).append(u)
        masks = ray.get(
            [self.seen_handles[s].add_if_new.remote(us) for s, us in sorted(seen_rpc.items())]
        )
        adds: dict[int, list[tuple]] = {}
        for (s, us), mask in zip(sorted(seen_rpc.items()), masks):
            for u, is_new in zip(us, mask):
                if is_new:
                    from ..functions.regexes import url_domain

                    d = url_domain(u)
                    adds.setdefault(hash64_signed(d) % cfg.num_scheduler_shards, []).append(
                        (u, d, 0, 0.0, cfg.pack_seq(0, order[u], 0))
                    )
        ray.get([self.sched_handles[s].add_urls.remote(rows) for s, rows in adds.items()])
        self.fetch_order = 0
        self.round = 0

    def resume(self) -> bool:
        """Restore actors from the latest committed round. False if none."""
        last = self.store.latest_round()
        if last is None:
            return False
        import ray

        Seen = make_seen_actor()
        Sched = make_scheduler_actor()
        seen_t = self.store.read(last, "seen_ckpt")
        sched_t = self.store.read(last, "sched_ckpt")
        self.seen_handles = [None] * self.cfg.num_cuckoo_shards
        for sid, blob in zip(seen_t["shard_id"].to_pylist(), seen_t["filter_bytes"].to_pylist()):
            self.seen_handles[sid] = Seen.remote(sid, state=blob)
        self.sched_handles = [None] * self.cfg.num_scheduler_shards
        for sid, blob in zip(sched_t["shard_id"].to_pylist(), sched_t["state_bytes"].to_pylist()):
            self.sched_handles[sid] = Sched.remote(sid, self.cfg, {}, state=blob)
        meta = self.store.read_manifest(last)["meta"]
        self.fetch_order = meta["next_fetch_order"]
        self.round = last
        return True

    # ---------------------------------------------------------- rounds

    def run_round(self) -> int:
        """Execute one crawl round; returns #urls fetched (0 = done)."""
        import ray
        import ray.data as rd

        cfg = self.cfg
        rnd = self.round + 1
        t0 = time.monotonic()
        results = ray.get([h.schedule.remote() for h in self.sched_handles])
        sched_rows = [r for scheduled, _ in results for r in scheduled]
        banned_rows = [b for _, banned in results for b in banned]
        if not sched_rows:
            return 0
        sched = _sched_table(sched_rows, self.fetch_order)
        n = sched.num_rows

        from functools import partial

        from ..stages.fetch import fetch_extract_batch

        wide = (
            rd.from_arrow(sched)
            .map_batches(
                partial(
                    fetch_extract_batch,
                    docs_dir=self.docs_dir,
                    n_buckets=self.web_meta["n_buckets"],
                    cfg=cfg,
                ),
                batch_format="pyarrow",
                batch_size=1024,
            )
            .materialize()
        )

        cands = wide.map_batches(explode_candidates(cfg, rnd), batch_format="pyarrow")
        deduped = cands.groupby("url").map_groups(_dedup_min_seq, batch_format="pyarrow")
        stats = deduped.map_batches(
            partial(route_new_batch, seen_handles=self.seen_handles, sched_handles=self.sched_handles),
            batch_format="pyarrow",
            batch_size=8192,
        ).to_pandas()
        n_cand = int(stats["n_candidates"].sum()) if len(stats) else 0
        n_new = int(stats["n_new"].sum()) if len(stats) else 0

        wide_t = pa.concat_tables(ray.get(wide.to_arrow_refs())).combine_chunks()
        pages = wide_t.select(PAGE_COLS).append_column(
            "round", pa.array([rnd] * wide_t.num_rows, pa.int32())
        )
        links = _explode_links(wide_t)
        emails = _explode_addr(wide_t, "emails")
        btc = _explode_addr(wide_t, "btc")
        banned = pa.Table.from_arrays(
            [
                pa.array([b[0] for b in banned_rows], pa.string()),
                pa.array([b[1] for b in banned_rows], pa.string()),
            ],
            names=["url", "domain"],
        )
        seen_states = ray.get([h.state_bytes.remote() for h in self.seen_handles])
        seen_sizes = ray.get([h.size.remote() for h in self.seen_handles])
        sched_states = ray.get([h.state_bytes.remote() for h in self.sched_handles])
        seen_ckpt = pa.Table.from_arrays(
            [
                pa.array(range(len(seen_states)), pa.int32()),
                pa.array(seen_states, pa.large_binary()),
                pa.array(seen_sizes, pa.int64()),
                pa.array([rnd] * len(seen_states), pa.int32()),
            ],
            names=["shard_id", "filter_bytes", "count", "round"],
        )
        sched_ckpt = pa.Table.from_arrays(
            [
                pa.array(range(len(sched_states)), pa.int32()),
                pa.array(sched_states, pa.large_binary()),
                pa.array([rnd] * len(sched_states), pa.int32()),
            ],
            names=["shard_id", "state_bytes", "round"],
        )
        metrics = pa.Table.from_arrays(
            [
                pa.array([rnd], pa.int32()),
                pa.array([-1], pa.int32()),
                pa.array([n], pa.int64()),
                pa.array([n], pa.int64()),
                pa.array([n_cand], pa.int64()),
                pa.array([n_cand - n_new], pa.int64()),
                pa.array([int((time.monotonic() - t0) * 1000)], pa.int64()),
                pa.array([f"round={rnd};base={self.fetch_order}"], pa.string()),
            ],
            names=["round", "partition", "urls_scheduled", "urls_fetched", "urls_discovered", "urls_deduped", "wall_ms", "lineage"],
        )
        self.store.commit_round(
            rnd,
            {
                "pages": pages,
                "links": links,
                "emails": emails,
                "btc": btc,
                "banned": banned,
                "schedule": sched,
                "seen_ckpt": seen_ckpt,
                "sched_ckpt": sched_ckpt,
                "metrics": metrics,
            },
            meta={"next_fetch_order": self.fetch_order + n, "round": rnd},
        )
        self.fetch_order += n
        self.round = rnd
        return n

    def run(self, resume: bool = False) -> dict:
        if not (resume and self.resume()):
            self.start_fresh()
        total = 0
        while self.round < self.cfg.max_rounds:
            n = self.run_round()
            if n == 0:
                break
            total += n
        return {"rounds": self.round, "fetched_total": self.fetch_order, "fetched_this_run": total}

    def shutdown(self) -> None:
        """Kill this engine's persistent actors (tests create several
        engines in one Ray session; leaked 0.1-CPU actors add up)."""
        import ray

        for h in self.seen_handles + self.sched_handles:
            if h is not None:
                ray.kill(h)
        self.seen_handles = []
        self.sched_handles = []

    # ---------------------------------------------------------- outputs

    def pages_table(self) -> pa.Table | None:
        return self.store.read_all_rounds("pages")

    def crawl_order(self) -> list[str]:
        t = self.pages_table()
        if t is None:
            return []
        idx = pa.compute.sort_indices(t, sort_keys=[("fetch_order", "ascending")])
        return t.take(idx)["url"].to_pylist()

    def seen_set(self) -> set[str]:
        import ray

        # seen = everything ever added to the shards; recover from pages+frontier+banned
        urls = set()
        t = self.pages_table()
        if t is not None:
            urls.update(t["url"].to_pylist())
        for h in self.sched_handles:
            for row in ray.get(h.frontier_rows.remote()):
                urls.add(row[0])
        b = self.store.read_all_rounds("banned")
        if b is not None:
            urls.update(b["url"].to_pylist())
        return urls


def _explode_links(wide: pa.Table) -> pa.Table:
    src, srcd, dst, dstd, anc = [], [], [], [], []
    urls = wide["url"].to_pylist()
    doms = wide["domain"].to_pylist()
    ld = wide["link_dsts"].to_pylist()
    ldd = wide["link_dst_domains"].to_pylist()
    la = wide["link_anchors"].to_pylist()
    for i in range(wide.num_rows):
        for u, d, a in zip(ld[i], ldd[i], la[i]):
            src.append(urls[i])
            srcd.append(doms[i])
            dst.append(u)
            dstd.append(d)
            anc.append(a)
    from ..schemas import LINKS

    return pa.Table.from_arrays(
        [pa.array(src, pa.string()), pa.array(srcd, pa.string()), pa.array(dst, pa.string()), pa.array(dstd, pa.string()), pa.array(anc, pa.string())],
        schema=LINKS,
    )


def _explode_addr(wide: pa.Table, col: str) -> pa.Table:
    addr, urls_o, doms_o = [], [], []
    urls = wide["url"].to_pylist()
    doms = wide["domain"].to_pylist()
    vals = wide[col].to_pylist()
    for i in range(wide.num_rows):
        for a in vals[i]:
            addr.append(a)
            urls_o.append(urls[i])
            doms_o.append(doms[i])
    return pa.Table.from_arrays(
        [pa.array(addr, pa.string()), pa.array(urls_o, pa.string()), pa.array(doms_o, pa.string())],
        names=["address", "url", "domain"],
    )
