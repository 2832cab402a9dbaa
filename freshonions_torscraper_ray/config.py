"""Crawl configuration.

Mirrors the reference's Scrapy settings knobs (torscraper/settings.py —
DOWNLOAD_DELAY, CONCURRENT_REQUESTS_PER_DOMAIN, MAX_PAGES_PER_DOMAIN,
ROBOTSTXT_OBEY, RETRY_TIMES; SURVEY.md §2.3 O12/O14) as one frozen
dataclass. Everything that influences crawl ordering lives here so the
distributed engine and the single-threaded oracle consume the exact same
policy object — that is what makes crawl-order equality testable.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CrawlConfig:
    # politeness: one fetch per `download_delay` virtual seconds per domain
    download_delay: float = 1.0
    # max URLs a single domain may fetch within one crawl round
    # (Scrapy CONCURRENT_REQUESTS_PER_DOMAIN analogue under round semantics)
    per_round_domain_cap: int = 4
    # lifetime page budget per domain (page-limit middleware analogue)
    max_pages_per_domain: int = 25
    max_depth: int = 6
    obey_robots: bool = True
    max_rounds: int = 64
    # sharding
    num_scheduler_shards: int = 8
    num_cuckoo_shards: int = 8
    seed: int = 42
    # checkpoint actor state every k rounds (1 = every round; larger
    # values trade resume granularity for less per-round serialization —
    # resume replays from the last checkpointed round, which is exact
    # because rounds are deterministic)
    checkpoint_interval: int = 1
    # every Nth checkpoint serializes the FULL seen-set; the ones between
    # write only the (digest, hash) delta since the previous checkpoint —
    # the exact set grows monotonically, so full-per-round is the scale
    # blocker. The first checkpoint of a run is always full.
    checkpoint_full_every: int = 4
    # per-page enrichment in the fetch stage: language ID (the reference
    # stored Domain.language — O10), quality scoring, simhash fingerprint.
    # Deterministic; adds pred_lang/n_tokens/stop_ratio/simhash columns.
    enrich: bool = False
    # incremental search-index sink (reference: every crawled page was
    # indexed into Elasticsearch as it was fetched — SURVEY §2.1 S5).
    # Each fetch worker emits a per-round postings SEGMENT
    # (term_hash, url, tf, dl) for its status-200 pages;
    # stages/text_index.py::compact_crawl_index merges segments into the
    # partition-pruned query layout (the Lucene segment-merge shape).
    index_text: bool = False
    # alive/dead re-check scheduling (reference cron alive-check, O32):
    # a 404'd FRONTPAGE re-enters the frontier with depressed priority
    # (1000 + retries) after a backoff of recheck_backoff*(retries+1)
    # rounds, up to recheck_max_retries attempts.
    recheck_dead: bool = False
    recheck_backoff: int = 2
    recheck_max_retries: int = 2
    # spill-to-store frontier bounds (state/scheduler.py DomainState):
    # per-domain in-memory head size, fresh-arrival buffer size before a
    # merge/compact, and entries per spill-run frame. These bound shard
    # heap at any frontier size and NEVER affect crawl ordering — any
    # values produce the identical schedule (exact k-way merge).
    frontier_head_max: int = 64
    frontier_fresh_max: int = 128
    frontier_refill_chunk: int = 64
    # skew-aware hot-bucket splitting [B: north_rule]: a content bucket
    # whose scheduled rows exceed factor × (round_size / pool_size) has
    # its per-merger sub-blocks dealt across neighbouring fetch workers
    # instead of pinning the round tail to the bucket's owner. 0
    # disables. Never affects crawl ordering (fetch_order is assigned
    # before routing; candidate dedup is arrival-order independent).
    hot_bucket_factor: float = 1.0
    # target rows per schedule-rank merger: fat rounds use up to
    # num_scheduler_shards mergers, tiny rounds ONE (a single actor-side
    # sort, no per-range protocol). Also the hot-bucket split
    # granularity (sub-blocks arrive one per merger). Never affects
    # ordering — any merger count yields the same global (vtime, url)
    # rank.
    merge_rows_target: int = 32768

    # packed discovered_seq layout: (round << 44) | (fetch_order << 16) | pos
    ROUND_SHIFT: int = 44
    FETCH_SHIFT: int = 16

    def pack_seq(self, rnd: int, fetch_order: int, pos: int) -> int:
        """Deterministic total discovery order without a global counter.

        Any total order works for tie-breaking; packing (round, global
        fetch_order of the discovering page, position within that page)
        avoids a driver-side counter so dedup's "first discovery wins"
        becomes a distributed groupby-min (SURVEY.md §2.5 O22).

        Determinism envelope (int64 layout): rnd < 2^19 (~524k rounds),
        fetch_order < 2^28 (~268M pages), pos < 2^16 links/page. A
        silent clamp would make first-discovery resolution arrival-order
        dependent past those bounds, so overflow FAILS LOUDLY instead
        (widen to a two-int64 seq if a deployment ever needs more).
        """
        if rnd >= (1 << (63 - self.ROUND_SHIFT)) or fetch_order >= (1 << (self.ROUND_SHIFT - self.FETCH_SHIFT)) or pos >= (1 << self.FETCH_SHIFT):
            raise OverflowError(
                f"pack_seq overflow (rnd={rnd}, fetch_order={fetch_order}, pos={pos}); "
                "exceeds the int64 determinism envelope (2^19 rounds / 2^28 pages / 2^16 links-per-page)"
            )
        return (rnd << self.ROUND_SHIFT) | (fetch_order << self.FETCH_SHIFT) | pos


DEFAULT_CONFIG = CrawlConfig()


# Lifetime CPU reservations of the crawl engine's persistent actors —
# the SINGLE source the @ray.remote decorators (state/scheduler.py,
# state/cuckoo.py, stages/fetch.py) and the pre-spawn budget guard
# (pipelines/crawl.py::_check_cpu_budget) both read, so the guard
# cannot drift from what is actually reserved.
SCHED_SHARD_CPUS = 0.1
SEEN_SHARD_CPUS = 0.1
FETCH_WORKER_CPUS = 0.25
SCHED_WRITE_TASK_CPUS = 0.05
