"""Single-threaded reference oracle for the crawl semantics.

Implements the frontier contract (politeness, robots, budgets, dedup,
ordering — see state/scheduler.py docstring for the spec) LITERALLY with
plain dicts and sorts, sharing only the per-document content semantics
(functions/doc_extract.py) and robots parsing with the engine. The
golden replay test asserts the distributed engine's crawl order, final
URL-seen set and per-row span sequences equal this oracle exactly
(BASELINE.json :: north_rule).

Fetching is the same deterministic replay: doc lookup into the synthetic
web (regenerated in-memory via synth.gen_domain_docs — identical to the
parquet content store by construction).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .config import CrawlConfig
from .functions.doc_extract import extract_doc
from .functions.regexes import canonicalize_url, url_domain
from .functions.robots import allowed, parse_disallow_prefixes
from .synth import domain_profile, gen_domain_docs


@dataclass
class OracleResult:
    crawl_order: list[str] = field(default_factory=list)  # urls in fetch order
    seen: set[str] = field(default_factory=set)
    pages: list[dict] = field(default_factory=list)
    links: list[tuple] = field(default_factory=list)
    emails: list[tuple] = field(default_factory=list)
    btc: list[tuple] = field(default_factory=list)
    banned: list[str] = field(default_factory=list)
    frontier_residue: list[tuple] = field(default_factory=list)  # (url, domain, depth)
    rounds: int = 0


def build_content(seed: int, n_domains: int) -> dict[str, list[dict]]:
    content: dict[str, list[dict]] = {}
    for i in range(n_domains):
        for doc in gen_domain_docs(seed, i, n_domains):
            content[doc["doc_id"]] = doc["spans"]
    return content


def build_robots(seed: int, n_domains: int) -> dict[str, str]:
    out = {}
    for i in range(n_domains):
        p = domain_profile(seed, i, n_domains)
        if p["robots"]:
            out[p["domain"]] = p["robots"]
    return out


def crawl_oracle(
    seeds: list[str],
    content: dict[str, list[dict]],
    robots: dict[str, str],
    cfg: CrawlConfig,
) -> OracleResult:
    res = OracleResult()
    # per-domain state: [vclock, fetched,
    #                    pending {url: (priority, seq, depth, retries)},
    #                    parked  {url: (priority, seq, depth, not_before, retries)}]
    dom: dict[str, list] = {}
    robots_cache: dict[str, list[str]] = {}

    def ensure(d: str) -> list:
        st = dom.get(d)
        if st is None:
            st = dom[d] = [0.0, 0, {}, {}]
        return st

    def insert(url: str, d: str, depth: int, pr: float, seq: int, nb: int = 0, retries: int = 0) -> None:
        """Ban-at-insert (the contract shared with the engine, see
        state/scheduler.py): robots bodies are static per crawl, so
        gating at insertion yields the same banned set and the same
        schedule as gating at schedule time — and lets the engine keep
        pending spilled to disk instead of rescanning it every round."""
        st = ensure(d)
        if cfg.obey_robots and d in robots:
            prefixes = robots_cache.setdefault(d, parse_disallow_prefixes(robots[d]))
            if prefixes:
                rest = url.split("://", 1)[1]
                path = "/" + rest.split("/", 1)[1] if "/" in rest else "/"
                if not allowed(path, prefixes):
                    res.banned.append(url)
                    return
        if nb > 0:
            st[3][url] = (pr, seq, depth, nb, retries)
        else:
            st[2][url] = (pr, seq, depth, retries)

    # seed insertion: canonicalize (mirrors the engine), order = seed
    # file order, first canonical occurrence wins
    for i, raw in enumerate(seeds):
        url = canonicalize_url(raw)
        if url is None or url in res.seen:
            continue
        res.seen.add(url)
        insert(url, url_domain(url), 0, 0.0, cfg.pack_seq(0, i, 0))

    fetch_order = 0
    for rnd in range(1, cfg.max_rounds + 1):
        # --- schedule phase (per-domain, independent) ---
        schedule: list[tuple] = []  # (vtime, url, domain, depth, pr, seq, retries)
        for d in dom:
            st = dom[d]
            if st[3]:  # wake due parked re-checks
                for url in [u for u, e in st[3].items() if e[3] <= rnd]:
                    pr, seq, depth, _nb, retries = st[3].pop(url)
                    st[2][url] = (pr, seq, depth, retries)
            if not st[2]:
                continue
            cap = min(cfg.per_round_domain_cap, cfg.max_pages_per_domain - st[1])
            if cap <= 0:
                continue
            take = sorted(
                (pr, seq, url, depth, retries)
                for url, (pr, seq, depth, retries) in st[2].items()
            )[:cap]
            for j, (pr, seq, url, depth, retries) in enumerate(take):
                schedule.append((st[0] + cfg.download_delay * j, url, d, depth, pr, seq, retries))
                del st[2][url]
            st[0] += cfg.download_delay * len(take)
            st[1] += len(take)
        if not schedule:
            # same rule as the engine: backing-off re-checks with budget
            # left consume an idle round instead of terminating
            cap = cfg.max_pages_per_domain
            if any((st[2] or st[3]) and st[1] < cap for st in dom.values()):
                continue
            break
        res.rounds = rnd
        schedule.sort(key=lambda t: (t[0], t[1]))

        # --- fetch + extract + frontier update (in schedule order) ---
        for vtime, url, d, depth, pr, seq, retries in schedule:
            f = fetch_order
            fetch_order += 1
            res.crawl_order.append(url)
            spans = content.get(url)
            if spans is None:
                res.pages.append(
                    {"url": url, "domain": d, "status": 404, "round": rnd, "vtime": vtime, "fetch_order": f, "clone_fp": 0, "title": "", "text": "", "size": 0, "depth": depth}
                )
                # O32 alive re-check: dead frontpages re-enter the
                # frontier with depressed priority and backoff
                if (
                    cfg.recheck_dead
                    and url.endswith(".onion/")
                    and retries < cfg.recheck_max_retries
                ):
                    insert(
                        url, d, depth, 1000.0 + retries, seq,
                        nb=rnd + cfg.recheck_backoff * (retries + 1),
                        retries=retries + 1,
                    )
                continue
            ex = extract_doc(url, spans, depth, cfg.max_depth)
            res.pages.append(
                {
                    "url": url,
                    "domain": d,
                    "status": 200,
                    "round": rnd,
                    "vtime": vtime,
                    "fetch_order": f,
                    "clone_fp": ex["clone_fp"],
                    "title": ex["title"],
                    "text": ex["text"],
                    "size": ex["size"],
                    "depth": depth,
                }
            )
            for dst_url, dst_domain, anchor in ex["links"]:
                res.links.append((url, d, dst_url, dst_domain, anchor))
            for a in ex["emails"]:
                res.emails.append((a, url, d))
            for a in ex["btc"]:
                res.btc.append((a, url, d))
            for pos, (cand_url, cand_domain, cand_depth) in enumerate(ex["candidates"]):
                if cand_url in res.seen:
                    continue
                res.seen.add(cand_url)
                insert(cand_url, cand_domain, cand_depth, float(cand_depth), cfg.pack_seq(rnd, f, pos))
    for d, st in dom.items():
        for url, (_pr, _seq, depth, _re) in st[2].items():
            res.frontier_residue.append((url, d, depth))
        for url, (_pr, _seq, depth, _nb, _re) in st[3].items():
            res.frontier_residue.append((url, d, depth))
    return res
