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


def _dedup_first(seq):
    seen = set()
    out = []
    for x in seq:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def extract_doc_core(src_url: str, spans: list[dict]) -> dict:
    """Span walk only — title/text/size/clone_fp/links. The regex stage
    runs separately so the batch path (`findall_batch`) can scan all of
    a batch's texts in one vectorized RE2 pass."""
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
    return {
        "title": title,
        "text": "\n".join(parts),
        "size": size,
        "clone_fp": hash64_signed("\x1e".join(fp_parts)),
        "is_frontpage": src_url.endswith(".onion/"),
        "links": links,
    }


def finish_extract(core: dict, src_url: str, depth: int, max_depth: int,
                   raw_emails: list[str], raw_btc: list[str], raw_onions: list[str]) -> dict:
    """Dedup the regex finds + build the frontier-candidate list (the
    ordering contract in the module docstring)."""
    src_domain = url_domain(src_url)
    emails = _dedup_first(raw_emails)
    btc = _dedup_first(raw_btc)
    harvested = _dedup_first(raw_onions)
    candidates: list[tuple[str, str, int]] = []
    cseen: set[str] = set()
    for dst_url, dst_domain, _anchor in core["links"]:
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
    return {**core, "emails": emails, "btc": btc, "candidates": candidates}


def extract_cores_batch(src_urls, spans_col) -> list[dict]:
    """Vectorized :func:`extract_doc_core` over a whole hit batch.

    Takes the Arrow ``list<struct{kind,text,media_ref}>`` spans column
    DIRECTLY (the scalar path's ``spans.to_pylist()`` materialized every
    span as a Python dict — measured 72% of fetch+extract wall time) and
    computes size / clone_fp / title / text with Arrow kernels + numpy
    segment ops; the only remaining per-row Python is link
    canonicalization, over link spans only. Output dicts are identical
    to the scalar walk (golden- and conformance-verified):

    - size        = Σ len(text)+len(media_ref) over ALL spans (code points)
    - clone_fp    = hash64_signed("\\x1e".join(f"{k}\\x1f{t}\\x1f{r}"))
    - title       = first kind=="title" span with non-empty text, else ""
    - text        = "\\n".join(title texts (always) + non-empty text/link texts)
    - links       = [(canonicalize(ref), domain, anchor)] over kind=="link"
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .hashing import hash64_array

    arr = spans_col.combine_chunks() if isinstance(spans_col, pa.ChunkedArray) else spans_col
    n = len(arr)
    if n == 0:
        return []
    counts = pc.list_value_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    parent = np.repeat(np.arange(n), counts)
    flat = arr.flatten()  # doc-major span order, slice-safe
    kind = flat.field("kind")
    text = flat.field("text")
    ref = flat.field("media_ref")

    span_sizes = pc.add(pc.utf8_length(text), pc.utf8_length(ref)).to_numpy(zero_copy_only=False)
    sizes = np.bincount(parent, weights=span_sizes, minlength=n).astype(np.int64)

    fp_span = pc.binary_join_element_wise(kind, text, ref, "\x1f")
    fp_doc = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(offsets), fp_span), "\x1e"
    ).to_numpy(zero_copy_only=False)
    clone_fps = hash64_array(fp_doc)

    kind_np = kind.to_numpy(zero_copy_only=False)
    is_title = kind_np == "title"
    nonempty = pc.not_equal(pc.utf8_length(text), 0).to_numpy(zero_copy_only=False)
    keep = is_title | (((kind_np == "text") | (kind_np == "link")) & nonempty)
    kept_counts = np.bincount(parent[keep], minlength=n)
    kept_offsets = np.zeros(n + 1, np.int64)
    np.cumsum(kept_counts, out=kept_offsets[1:])
    texts = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(kept_offsets), text.filter(pa.array(keep))),
        "\n",
    ).to_pylist()

    titles = [""] * n
    # scalar rule is "if not title: title = t" → the first NON-EMPTY
    # title text wins (an empty title span does not latch)
    title_take = is_title & nonempty
    t_parent = parent[title_take]
    if len(t_parent):
        firsts, first_idx = np.unique(t_parent, return_index=True)  # parent sorted → first
        title_texts = text.filter(pa.array(title_take))
        for d, j in zip(firsts, first_idx):
            titles[d] = title_texts[j].as_py()

    links_per_doc: list[list] = [_EMPTY_LINKS] * n
    is_link = kind_np == "link"
    if is_link.any():
        from .regexes import canonicalize_urls_batch

        l_parent = parent[is_link]
        l_mask = pa.array(is_link)
        canon_a, dom_a = canonicalize_urls_batch(ref.filter(l_mask))
        l_anchors = text.filter(l_mask).to_pylist()
        for d, canon, dom, a in zip(l_parent, canon_a.to_pylist(), dom_a.to_pylist(), l_anchors):
            if canon is not None:
                lst = links_per_doc[d]
                if lst is _EMPTY_LINKS:
                    lst = links_per_doc[d] = []
                lst.append((canon, dom, a))

    frontpage = [u.endswith(".onion/") for u in src_urls]
    return [
        {
            "title": titles[i],
            "text": texts[i],
            "size": int(sizes[i]),
            "clone_fp": int(clone_fps[i]),
            "is_frontpage": frontpage[i],
            "links": links_per_doc[i],
        }
        for i in range(n)
    ]


_EMPTY_LINKS: list = []  # shared sentinel: most docs have no links


def extract_doc(src_url: str, spans: list[dict], depth: int, max_depth: int) -> dict:
    """Single-doc reference path (the oracle calls this): core span walk
    + per-doc findall + candidate assembly. The distributed fetch stage
    computes the identical result via extract_doc_core + findall_batch +
    finish_extract (golden/conformance-verified equal)."""
    core = extract_doc_core(src_url, spans)
    text = core["text"]
    return finish_extract(
        core, src_url, depth, max_depth,
        EMAIL_RE.findall(text), BTC_RE.findall(text), ONION_ANY_RE.findall(text),
    )


_DUCK_CON = None  # per-process cached connection (threads=1 — each Ray
# worker owns ~1 cpu; DuckDB's own parallelism would oversubscribe)


def _duck():
    """The per-process DuckDB connection used as a vectorized string/
    regex kernel library (findall_batch here; enrich_fused in
    stages/textstats.py; simhash_batch in stages/dedup.py; the postings
    builder in stages/text_index.py)."""
    global _DUCK_CON
    if _DUCK_CON is None:
        import duckdb

        _DUCK_CON = duckdb.connect()
        _DUCK_CON.execute("SET threads=1")
    return _DUCK_CON


def findall_batch(texts: list[str], patterns: list) -> list[list[list[str]]]:
    """Vectorized multi-pattern findall: one RE2 `regexp_extract_all`
    scan per pattern over the whole batch (DuckDB's vectorized regex
    engine — measured 5.5× faster than per-doc Python `re.findall` on
    real span text, byte-identical output on 17.5k docs; these same
    patterns already hash-match DuckDB in the extract-query oracle
    twins, so re↔RE2 parity is independently established). Returns
    ``out[pattern_idx][doc_idx] -> [match, ...]``. Falls back to Python
    `re` if duckdb is unavailable.

    Patterns must be group-free: with capturing groups, Python
    ``re.findall`` returns group captures while DuckDB
    ``regexp_extract_all`` returns full matches — the two backends would
    silently diverge (round-2 ADVICE), so fail loudly instead."""
    for p in patterns:
        if p.groups:
            raise ValueError(
                f"findall_batch requires group-free patterns (re.findall returns "
                f"captures, regexp_extract_all returns full matches): {p.pattern!r}"
            )
    try:
        import duckdb
    except ImportError:  # pragma: no cover - duckdb is baked into the env
        return [[p.findall(t) for t in texts] for p in patterns]
    import pyarrow as pa

    tbl = pa.table({"t": pa.array(texts, pa.large_string())})  # noqa: F841 — duckdb reads it by name
    # literal SQL (same string every call → cached plan); parameterized
    # execute re-prepares per call — measured 5× the per-call cost
    sel = ", ".join(
        "regexp_extract_all(t, '{}') AS m{}".format(p.pattern.replace("'", "''"), i)
        for i, p in enumerate(patterns)
    )
    res = _duck().execute(f"SELECT {sel} FROM tbl").arrow()
    return [res[f"m{i}"].to_pylist() for i in range(len(patterns))]
