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

import pickle

from ..config import CrawlConfig
from ..functions.robots import allowed, parse_disallow_prefixes


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

        def add_urls(self, rows):
            self.s.add_urls(rows)
            return len(rows)

        def add_urls_cols(self, cols):
            self.s.add_urls_cols(cols)
            return len(cols[0])

        def schedule(self, current_round: int = 1 << 30):
            return self.s.schedule(current_round)

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
