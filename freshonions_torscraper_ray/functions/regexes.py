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


# named-group twin of URL_RE for pyarrow.compute.extract_regex ([0-9]
# instead of \d — identical on the ASCII fast path, and explicit about
# the charset)
_URL_EXTRACT_PATTERN = (
    r"^(?P<scheme>https?)://(?P<host>[a-z2-7]{16}\.onion|[a-z2-7]{56}\.onion)"
    r"(?::(?P<port>[0-9]+))?(?P<path>/[^\s#]*)?$"
)
# printable-ASCII gate: on this charset Python re and RE2 agree on \s,
# \d, lower() and strip() (the only whitespace present can be 0x20), so
# the vectorized path is character-exact vs canonicalize_url
_SAFE_ASCII_PATTERN = r"^[ -~]*$"


def canonicalize_urls_batch(refs) -> tuple:
    """Vectorized :func:`canonicalize_url` over an Arrow string array.

    Returns ``(canon, domain)`` arrays; invalid URLs are null in both.
    Printable-ASCII rows (everything a real crawl emits) go through
    Arrow RE2 kernels — trim/lower/defragment/extract/reassemble — and
    the rare rest falls back to the scalar function row by row, so the
    result is exactly ``[canonicalize_url(r) for r in refs]``
    (unit-tested on adversarial unicode whitespace/digits).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(refs, pa.ChunkedArray):
        refs = refs.combine_chunks()
    n = len(refs)
    if n == 0:
        return pa.array([], pa.string()), pa.array([], pa.string())
    safe = pc.match_substring_regex(pc.fill_null(refs, "\x80"), _SAFE_ASCII_PATTERN)
    s = pc.utf8_lower(pc.utf8_trim_whitespace(refs))
    s = pc.replace_substring_regex(s, r"#(?s:.*)$", "", max_replacements=1)
    m = pc.extract_regex(s, _URL_EXTRACT_PATTERN)
    ok = pc.and_(m.is_valid(), safe)
    scheme = pc.struct_field(m, "scheme")
    host = pc.struct_field(m, "host")
    port = pc.struct_field(m, "port")
    path = pc.struct_field(m, "path")
    path = pc.if_else(pc.equal(path, ""), "/", path)
    default = pc.if_else(pc.equal(scheme, "http"), "80", "443")
    portpart = pc.if_else(
        pc.or_(pc.equal(port, ""), pc.equal(port, default)),
        "",
        pc.binary_join_element_wise(":", port, ""),
    )
    canon = pc.binary_join_element_wise(scheme, "://", host, portpart, path, "")
    canon = pc.if_else(ok, canon, pa.scalar(None, pa.string()))
    domain = pc.if_else(ok, host, pa.scalar(None, pa.string()))
    if not pc.all(pc.or_(safe, refs.is_null())).as_py():
        # non-ASCII stragglers: scalar fallback keeps exact parity
        unsafe = pc.and_(pc.invert(safe), refs.is_valid())
        idx = pc.indices_nonzero(unsafe).to_numpy(zero_copy_only=False)
        c_list = canon.to_pylist()
        d_list = domain.to_pylist()
        raw = refs.take(pa.array(idx)).to_pylist()
        for i, r in zip(idx, raw):
            c = canonicalize_url(r)
            c_list[i] = c
            d_list[i] = None if c is None else url_domain(c)
        return pa.array(c_list, pa.string()), pa.array(d_list, pa.string())
    return canon, domain
