"""Domain-shard scheduler actors: politeness, robots, budgets, priority.

Ray-Data-native replacement for Scrapy's downloader slots +
DOWNLOAD_DELAY + CONCURRENT_REQUESTS_PER_DOMAIN + page-limit middleware
(SURVEY.md §2.3 O12/O14/O16). The frontier is hash-partitioned by domain
(``hash64_signed(domain) % num_shards``); each shard actor owns ALL state for
its domains, so any shard count yields identical per-domain decisions —
that is what makes crawl order independent of parallelism.

Round semantics (shared verbatim with oracle.py — the contract):

- pending URLs of a domain are ordered by (priority, discovered_seq, url);
  an entry may carry (not_before_round, retries) for alive re-checks —
  it is invisible to scheduling until ``not_before_round``
- robots-disallowed URLs are banned at schedule time (stay in the seen
  set, never fetch)
- a round schedules at most ``per_round_domain_cap`` URLs per domain and
  never exceeds the lifetime ``max_pages_per_domain`` budget
- the j-th URL scheduled for a domain this round fetches at virtual time
  ``vclock + download_delay * j``; the domain's vclock then advances by
  ``download_delay * n_scheduled`` (politeness: one fetch per delay)
- global fetch order within a round = sort by (vtime, url); this is a
  *schedule*, computed before execution, so parallel fetch execution
  cannot perturb ordering (SURVEY.md §7 risk (a))
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pyarrow as pa

from ..config import CrawlConfig
from ..functions.robots import allowed, parse_disallow_prefixes

# schedule-row schema (the scheduler owns the schedule representation;
# crawl.py composes the round around it)
SCHED_FIELDS = [
    ("url", pa.string()),
    ("domain", pa.string()),
    ("depth", pa.int32()),
    ("priority", pa.float32()),
    ("discovered_seq", pa.int64()),
    ("vtime", pa.float64()),
    ("retries", pa.int32()),
    ("fetch_order", pa.int64()),
]

_SORT_KEYS = [("vtime", "ascending"), ("url", "ascending")]


def rows_to_sched_table(rows: list[tuple]) -> pa.Table:
    """(url, domain, depth, priority, seq, vtime, retries) rows → Arrow
    table sorted by (vtime, url) — fetch_order NOT yet assigned."""
    cols = list(zip(*rows)) if rows else [[] for _ in range(7)]
    t = pa.Table.from_arrays(
        [pa.array(c, typ) for c, (_, typ) in zip(cols, SCHED_FIELDS[:7])],
        names=[n for n, _ in SCHED_FIELDS[:7]],
    )
    return t.take(pa.compute.sort_indices(t, sort_keys=_SORT_KEYS))


def split_by_bucket(sched: pa.Table, n_buckets: int) -> list[tuple[int, pa.Table]]:
    """Split a schedule table into (content-bucket, sub-table) pairs —
    one fetch RPC per content-store partition, routed to the worker that
    owns it. Execution order is free to differ — crawl order lives in
    the fetch_order column, not in block order."""
    from ..functions.hashing import hash64_array

    doms = sched["domain"].to_pylist()
    buckets = hash64_array(doms) % n_buckets
    out = []
    for b in np.unique(buckets):
        out.append((int(b), sched.filter(pa.array(buckets == b))))
    return out


def _bisect_sorted(t: pa.Table, key: tuple[float, str]) -> int:
    """Index of the first row of (vtime,url)-sorted ``t`` with key ≥
    ``key``: numpy searchsorted on vtime, then a log-n url bisect inside
    the equal-vtime run (O(log n) — never a row scan)."""
    kv, ku = key
    vt = t["vtime"].to_numpy()
    lo = int(np.searchsorted(vt, kv, side="left"))
    hi = int(np.searchsorted(vt, kv, side="right"))
    urls = t["url"]
    while lo < hi:
        mid = (lo + hi) // 2
        if urls[mid].as_py() < ku:
            lo = mid + 1
        else:
            hi = mid
    return lo


class DomainState:
    __slots__ = ("vclock", "fetched", "pending", "robots_prefixes", "banned_count")

    def __init__(self):
        self.vclock = 0.0
        self.fetched = 0
        # url -> (priority, seq, depth, not_before_round, retries)
        self.pending: dict[str, tuple[float, int, int, int, int]] = {}
        self.robots_prefixes: list[str] | None = None
        self.banned_count = 0


class SchedulerShardState:
    """Plain-object shard logic (the oracle and unit tests drive it
    directly; the Ray actor wraps it)."""

    def __init__(self, shard_id: int, config: CrawlConfig, robots: dict[str, str]):
        self.shard_id = shard_id
        self.cfg = config
        self.robots = robots  # domain -> robots.txt body (this shard's partition)
        self.domains: dict[str, DomainState] = {}

    def add_urls(self, rows: list[tuple[str, str, int, float, int]]) -> None:
        """rows: (url, domain, depth, priority, discovered_seq). Caller
        guarantees global dedup; insertion order is irrelevant because
        scheduling sorts by (priority, seq, url)."""
        for url, domain, depth, priority, seq in rows:
            d = self.domains.get(domain)
            if d is None:
                d = self.domains[domain] = DomainState()
            if url not in d.pending:
                d.pending[url] = (priority, seq, depth, 0, 0)

    def add_urls_cols(self, cols: tuple) -> None:
        """Columnar form of :meth:`add_urls` (cheaper RPC payloads)."""
        urls, domains, depths, priorities, seqs = cols
        get = self.domains.get
        for i in range(len(urls)):
            domain = domains[i]
            d = get(domain)
            if d is None:
                d = self.domains[domain] = DomainState()
            url = urls[i]
            if url not in d.pending:
                d.pending[url] = (priorities[i], seqs[i], depths[i], 0, 0)

    def add_retry_cols(self, cols: tuple) -> None:
        """Re-check insertions (url, domain, depth, priority, seq,
        not_before_round, retries) — the URL is already in the seen set,
        it re-enters pending directly (O32 alive re-check)."""
        urls, domains, depths, priorities, seqs, nbs, retries = cols
        for i in range(len(urls)):
            domain = domains[i]
            d = self.domains.get(domain)
            if d is None:
                d = self.domains[domain] = DomainState()
            url = urls[i]
            if url not in d.pending:
                d.pending[url] = (priorities[i], seqs[i], depths[i], nbs[i], retries[i])

    def _robots_for(self, domain: str, dstate: DomainState) -> list[str]:
        if dstate.robots_prefixes is None:
            body = self.robots.get(domain, "")
            dstate.robots_prefixes = parse_disallow_prefixes(body) if body else []
        return dstate.robots_prefixes

    def schedule(self, current_round: int = 1 << 30) -> tuple[list[tuple], list[tuple]]:
        """One round for this shard.

        Returns (scheduled, banned):
          scheduled: (url, domain, depth, priority, seq, vtime, retries)
          banned:    (url, domain, depth, priority, seq)

        Entries whose ``not_before_round`` exceeds ``current_round`` stay
        invisible (re-check backoff).
        """
        cfg = self.cfg
        scheduled: list[tuple] = []
        banned: list[tuple] = []
        for domain in self.domains:
            d = self.domains[domain]
            if not d.pending:
                continue
            items = sorted(
                (pr, seq, url, depth, retries)
                for url, (pr, seq, depth, nb, retries) in d.pending.items()
                if nb <= current_round
            )
            if not items:
                continue
            if cfg.obey_robots:
                prefixes = self._robots_for(domain, d)
                if prefixes:
                    kept = []
                    for pr, seq, url, depth, retries in items:
                        path = "/" + url.split("://", 1)[1].split("/", 1)[1] if "/" in url.split("://", 1)[1] else "/"
                        if allowed(path, prefixes):
                            kept.append((pr, seq, url, depth, retries))
                        else:
                            banned.append((url, domain, depth, pr, seq))
                            del d.pending[url]
                            d.banned_count += 1
                    items = kept
            cap = min(cfg.per_round_domain_cap, cfg.max_pages_per_domain - d.fetched)
            if cap <= 0:
                continue
            take = items[:cap]
            for j, (pr, seq, url, depth, retries) in enumerate(take):
                vtime = d.vclock + cfg.download_delay * j
                scheduled.append((url, domain, depth, pr, seq, vtime, retries))
                del d.pending[url]
            d.vclock += cfg.download_delay * len(take)
            d.fetched += len(take)
        return scheduled, banned

    def pending_count(self) -> int:
        return sum(len(d.pending) for d in self.domains.values())

    def has_work(self) -> bool:
        """Any budgeted pending entry (due now or backing off)?"""
        cap = self.cfg.max_pages_per_domain
        return any(d.pending and d.fetched < cap for d in self.domains.values())

    def frontier_rows(self) -> list[tuple]:
        """Pending residue as frontier rows (url, domain, depth, priority, seq)."""
        out = []
        for domain, d in self.domains.items():
            for url, (pr, seq, depth, _nb, _re) in d.pending.items():
                out.append((url, domain, depth, pr, seq))
        return out

    def state_bytes(self) -> bytes:
        return pickle.dumps(
            {
                "shard_id": self.shard_id,
                "cfg": self.cfg,
                "robots": self.robots,
                "domains": {
                    dom: (d.vclock, d.fetched, d.pending, d.robots_prefixes, d.banned_count)
                    for dom, d in self.domains.items()
                },
            }
        )

    @classmethod
    def from_state_bytes(cls, data: bytes) -> "SchedulerShardState":
        blob = pickle.loads(data)
        s = cls(blob["shard_id"], blob["cfg"], blob["robots"])
        for dom, (vclock, fetched, pending, prefixes, banned_count) in blob["domains"].items():
            d = DomainState()
            d.vclock, d.fetched, d.pending, d.robots_prefixes, d.banned_count = (
                vclock,
                fetched,
                dict(pending),
                prefixes,
                banned_count,
            )
            s.domains[dom] = d
        return s


def make_scheduler_actor():
    import ray

    @ray.remote(num_cpus=0.1)
    class SchedulerShard:
        def __init__(self, shard_id: int, config: CrawlConfig, robots: dict[str, str], state: bytes | None = None):
            if state is not None:
                self.s = SchedulerShardState.from_state_bytes(state)
            else:
                self.s = SchedulerShardState(shard_id, config, robots)
            self._staged: pa.Table | None = None

        def add_urls(self, rows):
            self.s.add_urls(rows)
            return len(rows)

        def add_urls_cols(self, cols):
            self.s.add_urls_cols(cols)
            return len(cols[0])

        def schedule(self, current_round: int = 1 << 30):
            return self.s.schedule(current_round)

        # ---- distributed schedule-rank (no per-URL driver transit) ----

        def schedule_stage(self, current_round: int, tmp_dir: str, n_samples: int = 64):
            """Run this shard's round schedule but STAGE the rows in-actor
            (sorted by (vtime, url)); only metadata leaves: (count,
            n_banned, sample keys). Banned rows are persisted as a parquet
            part straight into the staged round dir."""
            import pyarrow.parquet as pq

            scheduled, banned = self.s.schedule(current_round)
            self._staged = rows_to_sched_table(scheduled)
            if banned:
                bt = pa.Table.from_arrays(
                    [
                        pa.array([b[0] for b in banned], pa.string()),
                        pa.array([b[1] for b in banned], pa.string()),
                    ],
                    names=["url", "domain"],
                )
                d = os.path.join(tmp_dir, "banned")
                os.makedirs(d, exist_ok=True)
                pq.write_table(bt, os.path.join(d, f"part-shard{self.s.shard_id:04d}.parquet"))
            n = self._staged.num_rows
            samples: list[tuple[float, str]] = []
            if n:
                vt = self._staged["vtime"].to_numpy()
                urls = self._staged["url"]
                step = max(1, n // n_samples)
                samples = [(float(vt[i]), urls[i].as_py()) for i in range(0, n, step)]
            return n, len(banned), samples

        def range_slices(self, splitters: list[tuple[float, str]]):
            """Cut the staged sorted table at the splitter keys → R
            contiguous slices (R = len(splitters)+1) + per-range counts.
            Called with num_returns=R+1 so each merger fetches ONLY its
            slice from the object store."""
            t = self._staged if self._staged is not None else rows_to_sched_table([])
            self._staged = None
            cuts = [_bisect_sorted(t, k) for k in splitters]
            bounds = [0, *cuts, t.num_rows]
            slices = [
                t.slice(bounds[i], bounds[i + 1] - bounds[i]).combine_chunks()
                for i in range(len(bounds) - 1)
            ]
            return (*slices, [s.num_rows for s in slices])

        def merge_ranges(self, rnd: int, tmp_dir: str, base: int, slice_refs: list, n_buckets: int):
            """Merge one key range across all shards: concat + (vtime,url)
            sort + fetch_order = base..base+n, persist the schedule part,
            split by content bucket and ray.put each block. Returns small
            (bucket, n_rows, block_ref) tuples — the driver routes refs to
            the bucket-pinned fetch workers without touching row data."""
            import pyarrow.parquet as pq

            tabs = [x for x in ray.get(list(slice_refs)) if x.num_rows]
            if not tabs:
                return []
            t = pa.concat_tables(tabs)
            t = t.take(pa.compute.sort_indices(t, sort_keys=_SORT_KEYS))
            out = t.append_column(
                "fetch_order", pa.array(np.arange(base, base + t.num_rows, dtype=np.int64))
            )
            d = os.path.join(tmp_dir, "schedule")
            os.makedirs(d, exist_ok=True)
            pq.write_table(out, os.path.join(d, f"part-base{base:012d}.parquet"))
            return [
                (b, blk.num_rows, ray.put(blk)) for b, blk in split_by_bucket(out, n_buckets)
            ]

        def add_retry_cols(self, cols):
            self.s.add_retry_cols(cols)
            return len(cols[0])

        def pending_count(self):
            return self.s.pending_count()

        def has_work(self):
            return self.s.has_work()

        def frontier_rows(self):
            return self.s.frontier_rows()

        def state_bytes(self):
            return self.s.state_bytes()

    return SchedulerShard
