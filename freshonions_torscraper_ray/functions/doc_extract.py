"""Per-document extraction semantics — the single source of truth.

Both the distributed FetchExtract stage (stages/fetch.py) and the
single-threaded semantic oracle (oracle.py) call these functions, so the
*content* semantics (what a page yields) are definitionally identical;
the crawl-order golden test then cross-validates only the *scheduling*
semantics, which the two sides implement independently.

Mirrors the reference spider's parse step (tor_scrapy.py :: parse):
title, stripped text, link extraction, bare-onion harvest, email/btc
extraction, and the frontier-candidate list with its deterministic
ordering contract:

  candidates = [canonicalized link targets in span order]
             + [harvested onion frontpages in text match order],
  deduplicated keeping first occurrence; same-domain targets get
  depth = parent_depth + 1 (dropped past max_depth), cross-domain
  targets get depth 0 (a new Domain starts fresh, as the reference
  inserted new Domain rows).
"""

from __future__ import annotations

from .hashing import hash64_signed
from .regexes import BTC_RE, EMAIL_RE, ONION_ANY_RE, canonicalize_url, url_domain


def extract_doc(src_url: str, spans: list[dict], depth: int, max_depth: int) -> dict:
    src_domain = url_domain(src_url)
    title = ""
    parts: list[str] = []
    size = 0
    fp_parts: list[str] = []
    links: list[tuple[str, str, str]] = []  # (dst_url, dst_domain, anchor)
    for s in spans:
        k, t, r = s["kind"], s["text"], s["media_ref"]
        size += len(t) + len(r)
        fp_parts.append(f"{k}\x1f{t}\x1f{r}")
        if k == "title":
            if not title:
                title = t
            parts.append(t)
        elif k == "text":
            if t:
                parts.append(t)
        elif k == "link":
            if t:
                parts.append(t)
            canon = canonicalize_url(r)
            if canon is not None:
                links.append((canon, url_domain(canon), t))
    text = "\n".join(parts)
    clone_fp = hash64_signed("\x1e".join(fp_parts))

    def _dedup_first(seq):
        seen = set()
        out = []
        for x in seq:
            if x not in seen:
                seen.add(x)
                out.append(x)
        return out

    emails = _dedup_first(EMAIL_RE.findall(text))
    btc = _dedup_first(BTC_RE.findall(text))
    harvested = _dedup_first(ONION_ANY_RE.findall(text))

    candidates: list[tuple[str, str, int]] = []
    cseen: set[str] = set()
    for dst_url, dst_domain, _anchor in links:
        if dst_url in cseen:
            continue
        if dst_domain == src_domain:
            if depth + 1 > max_depth:
                continue
            cseen.add(dst_url)
            candidates.append((dst_url, dst_domain, depth + 1))
        else:
            cseen.add(dst_url)
            candidates.append((dst_url, dst_domain, 0))
    for host in harvested:
        u = f"http://{host}/"
        if u not in cseen:
            cseen.add(u)
            candidates.append((u, host, 0))

    return {
        "title": title,
        "text": text,
        "size": size,
        "clone_fp": clone_fp,
        "is_frontpage": src_url.endswith(".onion/"),
        "links": links,
        "emails": emails,
        "btc": btc,
        "candidates": candidates,
    }
