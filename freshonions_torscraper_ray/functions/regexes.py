"""Compiled extraction patterns shared by stages and the semantic oracle.

Reproduces the extraction surface of the reference spider
(freshonions-torscraper ``torscraper/spiders/tor_scrapy.py :: parse`` —
onion-address harvest, email extraction, bitcoin-address extraction; see
SURVEY.md §2.2 O3/O5/O6). All patterns are RE2-compatible so the same
pattern text runs in pyarrow.compute, Python ``re`` and DuckDB
``regexp_extract_all`` — that is what makes the DuckDB oracle twins exact.
"""

from __future__ import annotations

import re

# v2 onion addresses ([a-z2-7]{16}) and v3 ([a-z2-7]{56}); the reference
# predates v3-only Tor but harvested bare 16-char addresses from page text.
ONION_PATTERN = r"[a-z2-7]{16}\.onion"
ONION_V3_PATTERN = r"[a-z2-7]{56}\.onion"
ONION_ANY_PATTERN = r"[a-z2-7]{56}\.onion|[a-z2-7]{16}\.onion"

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

# Base58 bitcoin address, as in the reference's BitcoinAddress extraction.
BTC_PATTERN = r"[13][a-km-zA-HJ-NP-Z1-9]{25,34}"

# Word tokens (used by token counting / quality scoring over flat text).
WORD_PATTERN = r"[A-Za-z0-9_]+"

ONION_RE = re.compile(ONION_PATTERN)
ONION_ANY_RE = re.compile(ONION_ANY_PATTERN)
EMAIL_RE = re.compile(EMAIL_PATTERN)
BTC_RE = re.compile(BTC_PATTERN)
WORD_RE = re.compile(WORD_PATTERN)

# URL canonicalization bits (O1): scheme://host[:port]/path
URL_RE = re.compile(r"^(https?)://([a-z2-7]{16}\.onion|[a-z2-7]{56}\.onion)(?::(\d+))?(/[^\s#]*)?$")


def canonicalize_url(raw: str) -> str | None:
    """Canonical onion URL or None if invalid (O1).

    Rules (reference Domain host validation + scrapy request fingerprint
    normalization, re-specified): lowercase, strip whitespace/fragment,
    require http(s) scheme and a valid v2/v3 onion host, drop default
    ports (80/443), default path "/".
    """
    s = raw.strip().lower()
    if "#" in s:
        s = s.split("#", 1)[0]
    m = URL_RE.match(s)
    if not m:
        return None
    scheme, host, port, path = m.group(1), m.group(2), m.group(3), m.group(4)
    if not path:
        path = "/"
    default = "80" if scheme == "http" else "443"
    portpart = "" if (port is None or port == default) else f":{port}"
    return f"{scheme}://{host}{portpart}{path}"


def url_domain(url: str) -> str:
    """Host part of a canonical onion URL."""
    rest = url.split("://", 1)[1]
    host = rest.split("/", 1)[0]
    return host.split(":", 1)[0]
