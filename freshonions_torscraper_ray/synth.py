"""Deterministic synthetic onion web (the replay content store).

This sandbox has no network/Tor, so "fetching" a URL is a deterministic
lookup into a seeded synthetic web of interleaved text+media span
documents with the authoritative input shape
``(doc_id: string, spans: list<struct<kind,text,media_ref,offset>>)``
(BASELINE.json :: input_hint). The web is reproducible from
``(seed, n_domains)`` alone and every document depends only on its own
domain index — generation parallelizes embarrassingly over domains and is
identical under any partitioning.

Shape knobs mirror what made the reference's workload hard
(SURVEY.md §4): power-law pages-per-domain with a few hot "directory"
domains (skew), ~15% dead domains (alive/dead re-check paths), robots.txt
payloads that disallow path prefixes for ~10% of domains and everything
for ~2% (ROBOTSTXT_OBEY), and text spans salted with extractable onion /
email / bitcoin tokens (harvest + Email/BitcoinAddress extraction).
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

from .functions.hashing import base32_name, hash64, hash64_signed
from .schemas import DOCUMENTS, ROBOTS, SEED_LIST

_WORDS = (
    "onion market forum board index link mirror hidden service wiki list "
    "directory fresh page search mail chat news file image upload paste "
    "crypto wallet shop vendor review guide faq contact about home blog"
).split()

_EPOCH = 1_700_000_000_000_000  # fixed timestamp[us] — no wall clock anywhere


def domain_name(seed: int, idx: int) -> str:
    """Deterministic v2-style onion host for universe index ``idx``."""
    return base32_name(hash64(f"{seed}:dom:{idx}"), 16) + ".onion"


def _domain_rng(seed: int, idx: int) -> random.Random:
    return random.Random(hash64(f"{seed}:dstate:{idx}"))


def domain_profile(seed: int, idx: int, n_domains: int) -> dict:
    """Static properties of a domain (dead? page count? robots?)."""
    rng = _domain_rng(seed, idx)
    n_hot = max(2, n_domains // 50)  # ~2% hot directory domains
    hot = idx < n_hot
    dead = (not hot) and rng.random() < 0.15
    if hot:
        n_pages = 20 + rng.randrange(20)
    else:
        n_pages = min(1 + int(rng.paretovariate(1.1)), 40)
    r = rng.random()
    robots = ""
    if r < 0.02:
        robots = "User-agent: *\nDisallow: /\n"
    elif r < 0.10:
        robots = "User-agent: *\nDisallow: /p/1\n"
    # portscan / ssh-fingerprint replay state (reference OpenPort /
    # SSHFingerprint side-cars). Draws appended AFTER the ones above so
    # earlier profiles (and all goldens) are unchanged.
    ports = [80]
    has_ssh = (not dead) and rng.random() < 0.3
    if has_ssh:
        ports.append(22)
    if rng.random() < 0.25:
        ports.append(443)
    ssh_fp = ""
    if has_ssh:
        # small fingerprint-cluster space → some domains share a host key
        # (the clone/mirror signal the reference's ssh side-car hunted)
        fp_group = rng.randrange(max(4, n_domains // 8))
        ssh_fp = "SHA256:" + base32_name(hash64(f"{seed}:sshfp:{fp_group}"), 32)
    # soft-404 behavior (O16): ~7% of alive domains answer 200 for any
    # path ("useful 404" in the reference's Domain fields)
    soft404 = (not dead) and rng.random() < 0.07
    # O9 header analogues (reference Domain.server / Domain.powered_by —
    # tor_scrapy parsed them from response headers): the replay web has
    # no live headers, so the banner is part of the domain's static
    # profile. Draws appended after all earlier ones → goldens unchanged.
    server = ""
    powered_by = ""
    if not dead:
        server = rng.choice(
            ["nginx/1.10.3", "nginx/1.14.2", "Apache/2.4.25", "Apache/2.4.38", "lighttpd/1.4.45", ""]
        )
        if server.startswith("Apache") and rng.random() < 0.6:
            powered_by = rng.choice(["PHP/5.6.40", "PHP/7.0.33", "PHP/7.3.14"])
    return {
        "idx": idx,
        "domain": domain_name(seed, idx),
        "hot": hot,
        "dead": dead,
        "n_pages": 0 if dead else n_pages,
        "robots": robots,
        "ports": [] if dead else ports,
        "ssh_fp": ssh_fp,
        "soft404": soft404,
        "server": server,
        "powered_by": powered_by,
    }


def _pick_target_domain(rng: random.Random, idx: int, n_domains: int) -> int:
    """Skewed cross-domain link target: 30% to a hot domain, else uniform."""
    n_hot = max(2, n_domains // 50)
    if rng.random() < 0.3:
        return rng.randrange(n_hot)
    return rng.randrange(n_domains)


def gen_domain_docs(seed: int, idx: int, n_domains: int, span_scale: int = 1) -> list[dict]:
    """All documents of one domain: list of {doc_id, spans} rows.

    Pure function of (seed, idx, n_domains) — the oracle, the Ray
    generator and the replay fetch path all call this and always agree.
    """
    prof = domain_profile(seed, idx, n_domains)
    if prof["dead"]:
        return []
    dom = prof["domain"]
    docs = []
    for k in range(prof["n_pages"]):
        path = "/" if k == 0 else f"/p/{k}"
        url = f"http://{dom}{path}"
        rng = random.Random(hash64(f"{seed}:doc:{url}"))
        spans: list[dict] = []
        offset = 0

        def add(kind: str, text: str, media_ref: str) -> None:
            nonlocal offset
            spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": offset})
            offset += max(len(text) + len(media_ref), 1)

        if k == 0:
            add("title", f"{rng.choice(_WORDS)} {rng.choice(_WORDS)} :: {dom[:8]}", "")
        # span_scale > 1 → realistically sized pages (KBs of text) for
        # throughput benchmarking; the tiny default keeps goldens fast
        n_spans = (2 + rng.randrange(9)) * span_scale
        for _ in range(n_spans):
            r = rng.random()
            if r < 0.45:  # text span, possibly salted with extractables
                words = [rng.choice(_WORDS) for _ in range((3 + rng.randrange(12)) * min(span_scale, 4))]
                extra = rng.random()
                if extra < 0.20:
                    words.append(f"{rng.choice(_WORDS)}{rng.randrange(99)}@{rng.choice(_WORDS)}{rng.randrange(99)}.com")
                elif extra < 0.32:
                    words.append("1" + base32_name(hash64(f"{seed}:btc:{url}:{len(spans)}"), 26).replace("l", "m").replace("o", "p").replace("0", "z"))
                elif extra < 0.50:
                    words.append(domain_name(seed, _pick_target_domain(rng, idx, n_domains)))
                add("text", " ".join(words), "")
            elif r < 0.80:  # link span
                if rng.random() < 0.7 and prof["n_pages"] > 1:
                    # tk == n_pages is an occasional 404 path (pages run 1..n_pages-1)
                    tk = rng.randrange(1, prof["n_pages"] + 1)
                    target = f"http://{dom}/p/{tk}"
                else:
                    tdom = domain_name(seed, _pick_target_domain(rng, idx, n_domains))
                    target = f"http://{tdom}/"
                add("link", rng.choice(_WORDS), target)
            else:  # image span
                add("image", "", f"http://{dom}/img/{rng.randrange(1000)}.png")
        docs.append({"doc_id": url, "spans": spans})
    return docs


def docs_to_table(rows: list[dict], n_buckets: int | None = None) -> pa.Table:
    """Arrow table in the canonical DOCUMENTS schema (+ optional bucket col)."""
    doc_ids = [r["doc_id"] for r in rows]
    spans = [r["spans"] for r in rows]
    t = pa.Table.from_arrays(
        [
            pa.array(doc_ids, type=pa.string()),
            pa.array(spans, type=DOCUMENTS.field("spans").type),
        ],
        names=["doc_id", "spans"],
    )
    if n_buckets is not None:
        from .functions.regexes import url_domain

        buckets = np.array(
            [hash64_signed(url_domain(u)) % n_buckets for u in doc_ids], dtype=np.int64
        )
        t = t.append_column("bucket", pa.array(buckets, type=pa.int64()))
    return t


def gen_batch(seed: int, idxs: np.ndarray, n_domains: int, n_buckets: int | None, span_scale: int = 1) -> pa.Table:
    rows: list[dict] = []
    for i in idxs:
        rows.extend(gen_domain_docs(seed, int(i), n_domains, span_scale))
    return docs_to_table(rows, n_buckets)


def write_synth_web(out_dir: str, seed: int = 42, n_domains: int = 200, n_buckets: int = 16, span_scale: int = 1) -> dict:
    """Generate and persist the synthetic web with Ray Data.

    Layout (the replay content store; Lance-semantics parquet — see
    store.py):
      out_dir/documents/bucket=<h>/...parquet   hash-partitioned by domain
      out_dir/robots.parquet                    per-domain robots bodies
      out_dir/seeds.parquet                     crawl seed list
      out_dir/meta.json                         (seed, n_domains, n_buckets)

    Partitioning by ``hash64(domain) % n_buckets`` means a fetch batch for
    one domain touches exactly one partition — the property the 100 TB
    content store needs (SURVEY.md §7 risk (d)).
    """
    import json
    import os

    import ray.data as rd

    ds = rd.range(n_domains)
    ds = ds.map_batches(
        lambda b: gen_batch(seed, b["id"], n_domains, n_buckets, span_scale),
        batch_format="numpy",
        batch_size=64,
    )
    docs_dir = os.path.join(out_dir, "documents")
    ds.write_parquet(docs_dir, partition_cols=["bucket"], mode="overwrite")

    # robots + seeds are O(n_domains) driver-side — tiny relative to docs
    profiles = [domain_profile(seed, i, n_domains) for i in range(n_domains)]
    robots_rows = [p for p in profiles if p["robots"]]
    robots = pa.Table.from_arrays(
        [
            pa.array([p["domain"] for p in robots_rows], pa.string()),
            pa.array([p["robots"] for p in robots_rows], pa.string()),
        ],
        schema=ROBOTS,
    )
    # seeds: frontpages of every ~3rd domain (mix of alive, dead, robots-blocked)
    seed_idxs = list(range(0, n_domains, 3))
    seeds = pa.Table.from_arrays(
        [
            pa.array([f"http://{domain_name(seed, i)}/" for i in seed_idxs], pa.string()),
            pa.array([_EPOCH] * len(seed_idxs), pa.timestamp("us")),
        ],
        schema=SEED_LIST,
    )
    import pyarrow.parquet as pq

    pq.write_table(robots, os.path.join(out_dir, "robots.parquet"))
    pq.write_table(seeds, os.path.join(out_dir, "seeds.parquet"))
    meta = {"seed": seed, "n_domains": n_domains, "n_buckets": n_buckets, "span_scale": span_scale}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta
