"""Minimal robots.txt semantics (User-agent: * / Disallow prefixes).

The reference relied on Scrapy's RobotsTxtMiddleware (ROBOTSTXT_OBEY);
the engine needs the same gate deterministically (SURVEY.md §2.3 O14).
Prefix-match semantics follow urllib.robotparser's core rule: a path is
disallowed iff it starts with any Disallow prefix for UA '*'; an empty
Disallow value allows everything. Allow lines and other UAs are ignored
(the reference's crawler identified as a generic agent).

Shared verbatim by the scheduler actors and the single-threaded oracle —
both must ban the exact same URLs for crawl-order equality.
"""

from __future__ import annotations


def parse_disallow_prefixes(body: str) -> list[str]:
    """Disallow path-prefixes that apply to User-agent: * (document order)."""
    prefixes: list[str] = []
    in_star = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            in_star = value == "*"
        elif key == "disallow" and in_star:
            if value:
                prefixes.append(value)
    return prefixes


def allowed(path: str, prefixes: list[str]) -> bool:
    return not any(path.startswith(p) for p in prefixes)
