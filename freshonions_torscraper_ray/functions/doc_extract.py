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


def span_core_columns(spans_col) -> dict:
    """Fully columnar :func:`extract_doc_core` over a whole hit batch —
    no per-doc Python at all.

    Takes the Arrow ``list<struct{kind,text,media_ref}>`` spans column
    DIRECTLY (the scalar path's ``spans.to_pylist()`` materialized every
    span as a Python dict — measured 72% of fetch+extract wall time) and
    computes every output with Arrow kernels + numpy segment ops.
    Semantics identical to the scalar walk (golden/conformance/unit
    verified):

    - size      = Σ len(text)+len(media_ref) over ALL spans (code points)
    - clone_fp  = hash64_signed("\\x1e".join(f"{k}\\x1f{t}\\x1f{r}"))
    - title     = first kind=="title" span with non-empty text, else ""
    - text      = "\\n".join(title texts (always) + non-empty text/link texts)
    - links     = canonicalized link spans (invalid targets dropped),
                  returned FLATTENED: (link_parent, dsts, doms, anchors)

    Returns {"n", "sizes" (np i64), "clone_fps" (np i64),
    "titles" (pa string, full batch), "texts" (pa large_string),
    "link_parent" (np i64), "link_dsts"/"link_doms"/"link_anchors" (pa)}.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .hashing import hash64_array
    from .regexes import canonicalize_urls_batch

    arr = spans_col.combine_chunks() if isinstance(spans_col, pa.ChunkedArray) else spans_col
    n = len(arr)
    empty_s = pa.array([], pa.string())
    if n == 0:
        return {
            "n": 0,
            "sizes": np.zeros(0, np.int64),
            "clone_fps": np.zeros(0, np.int64),
            "titles": empty_s,
            "texts": pa.array([], pa.large_string()),
            "link_parent": np.zeros(0, np.int64),
            "link_dsts": empty_s,
            "link_doms": empty_s,
            "link_anchors": empty_s,
        }
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
    )

    # scalar rule is "if not title: title = t" → the first NON-EMPTY
    # title text wins (an empty title span does not latch). Built with a
    # null-index take + fill_null — no per-doc scatter loop.
    title_take = is_title & nonempty
    t_parent = parent[title_take]
    idx_map = np.full(n, -1, np.int64)
    if len(t_parent):
        firsts, first_idx = np.unique(t_parent, return_index=True)  # parent sorted → first
        idx_map[firsts] = first_idx
    titles = pc.fill_null(
        pc.take(text.filter(pa.array(title_take)), pa.array(idx_map, mask=idx_map < 0)), ""
    )

    is_link = kind_np == "link"
    l_parent = parent[is_link]
    l_mask = pa.array(is_link)
    canon_a, dom_a = canonicalize_urls_batch(ref.filter(l_mask))
    valid = canon_a.is_valid().to_numpy(zero_copy_only=False)
    v_mask = pa.array(valid)
    return {
        "n": n,
        "sizes": sizes,
        "clone_fps": clone_fps,
        "titles": titles,
        "texts": texts,
        "link_parent": l_parent[valid],
        "link_dsts": canon_a.filter(v_mask),
        "link_doms": dom_a.filter(v_mask),
        "link_anchors": text.filter(l_mask).filter(v_mask),
    }


def extract_cores_batch(src_urls, spans_col) -> list[dict]:
    """Per-doc dict adapter over :func:`span_core_columns` — the batch
    twin of :func:`extract_doc_core`, kept for tests and scalar callers
    (the fetch stage consumes the columns directly)."""
    cc = span_core_columns(spans_col)
    n = cc["n"]
    if n == 0:
        return []
    links_per_doc: list[list] = [_EMPTY_LINKS] * n
    for d, canon, dom, a in zip(
        cc["link_parent"], cc["link_dsts"].to_pylist(), cc["link_doms"].to_pylist(), cc["link_anchors"].to_pylist()
    ):
        lst = links_per_doc[d]
        if lst is _EMPTY_LINKS:
            lst = links_per_doc[d] = []
        lst.append((canon, dom, a))
    titles = cc["titles"].to_pylist()
    texts = cc["texts"].to_pylist()
    return [
        {
            "title": titles[i],
            "text": texts[i],
            "size": int(cc["sizes"][i]),
            "clone_fp": int(cc["clone_fps"][i]),
            "is_frontpage": src_urls[i].endswith(".onion/"),
            "links": links_per_doc[i],
        }
        for i in range(n)
    ]


_EMPTY_LINKS: list = []  # shared sentinel: most docs have no links


def _as_array(col):
    """Arrow column → plain Array (ChunkedArray-safe)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):  # combine keeps the type
            col = col.chunk(0) if col.num_chunks else pa.array([], col.type)
    return col


def _dedup_first_per_doc(parent: "np.ndarray", values, n_docs: int):
    """Order-preserving per-doc dedup of flattened (parent, value) rows
    (the vectorized form of ``_dedup_first``): keep the FIRST occurrence
    of each value within its doc, preserving original order. Rows must
    be parent-major in original order. Returns (counts, kept_values)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    values = _as_array(values)
    codes = pc.dictionary_encode(values).indices.to_numpy(zero_copy_only=False)
    pos = np.arange(len(codes))
    order = np.lexsort((pos, codes, parent))
    p_s, c_s = parent[order], codes[order]
    keep = np.r_[True, (p_s[1:] != p_s[:-1]) | (c_s[1:] != c_s[:-1])] if len(order) else np.zeros(0, bool)
    sel = np.sort(order[keep])  # parent-major rows → global order == per-doc order
    counts = np.bincount(parent[sel], minlength=n_docs)
    return counts, values.take(pa.array(sel, pa.int64()))


def extract_finish_columnar(core, src_urls, depths: "np.ndarray", max_depth: int) -> dict:
    """Fully columnar :func:`finish_extract` over the hit batch: one
    vectorized RE2 pass per pattern, per-doc order-preserving dedup of
    the finds, and the frontier-candidate assembly (same-domain depth
    rule + keep-first-occurrence contract from the module docstring) as
    numpy/Arrow expressions — no per-doc Python.

    ``core`` is :func:`span_core_columns` output; ``src_urls`` an Arrow
    string array of the hit docs' URLs (canonical). Returns flattened
    list-column pieces keyed for the fetch stage:
    {"emails"/"btc": (counts, values), "cands": (counts, urls, doms, deps)}.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .regexes import BTC_RE, EMAIL_RE, ONION_ANY_RE

    n = core["n"]
    texts = core["texts"]
    emails_l, btc_l, onions_l = findall_batch_arrow(texts, [EMAIL_RE, BTC_RE, ONION_ANY_RE])
    out = {}
    for name, la in (("emails", emails_l), ("btc", btc_l)):
        flat = pc.list_flatten(la)
        par = pc.list_parent_indices(la).to_numpy(zero_copy_only=False)
        counts, vals = _dedup_first_per_doc(par, flat, n)
        out[name] = (counts, vals)

    # candidate assembly — the ordering contract: link targets in span
    # order first, then harvested onion frontpages in match order;
    # keep-first per (doc, url). A same-domain link past max_depth is
    # DROPPED WITHOUT claiming its url (exactly the scalar cseen rule:
    # it never enters cseen, so a later harvest of the same url can
    # still add it).
    src_host = pc.fill_null(
        pc.struct_field(pc.extract_regex(src_urls, r"^https?://(?P<h>[^/:]+)"), "h"), ""
    )
    lp = core["link_parent"]
    l_doms = core["link_doms"]
    same = pc.equal(l_doms, pc.take(src_host, pa.array(lp))).to_numpy(zero_copy_only=False)
    d_next = depths[lp] + 1
    keep_l = ~(same & (d_next > max_depth))
    l_deps = np.where(same, d_next, 0).astype(np.int32)[keep_l]
    k_mask = pa.array(keep_l)
    l_urls = core["link_dsts"].filter(k_mask)
    l_doms_k = l_doms.filter(k_mask)
    lp_k = lp[keep_l]

    # harvested onions: dedup-first per doc, then frontpage URL form
    o_flat = pc.list_flatten(onions_l)
    o_par = pc.list_parent_indices(onions_l).to_numpy(zero_copy_only=False)
    o_counts, o_hosts = _dedup_first_per_doc(o_par, o_flat, n)
    hp = np.repeat(np.arange(n), o_counts)
    o_urls = pc.binary_join_element_wise("http://", o_hosts, "/", "")

    cand_par = np.concatenate([lp_k, hp])
    cand_urls = pa.concat_arrays([l_urls.cast(pa.string()), o_urls.cast(pa.string())])
    cand_doms = pa.concat_arrays([l_doms_k.cast(pa.string()), o_hosts.cast(pa.string())])
    cand_deps = np.concatenate([l_deps, np.zeros(len(hp), np.int32)])
    # keep-first per (doc, url): global concat position orders all link
    # rows before all onion rows, and each part is parent-major, so
    # within one doc the order is (links in span order, onions in match
    # order) — exactly the scalar append order
    codes = pc.dictionary_encode(cand_urls).indices.to_numpy(zero_copy_only=False)
    pos = np.arange(len(codes))
    order = np.lexsort((pos, codes, cand_par))
    p_s, c_s = cand_par[order], codes[order]
    keep = np.r_[True, (p_s[1:] != p_s[:-1]) | (c_s[1:] != c_s[:-1])] if len(order) else np.zeros(0, bool)
    sel = order[keep]
    sel = sel[np.lexsort((sel, cand_par[sel]))]  # parent-major, original order within doc
    counts = np.bincount(cand_par[sel], minlength=n)
    sel_pa = pa.array(sel)
    out["cands"] = (counts, cand_urls.take(sel_pa), cand_doms.take(sel_pa), cand_deps[sel])
    return out


def findall_batch_arrow(texts, patterns: list) -> list:
    """Arrow-native :func:`findall_batch`: takes an Arrow string array,
    returns one ``list<string>`` array per pattern (no Python list
    materialization). Same DuckDB RE2 kernel and group-free contract."""
    import pyarrow as pa

    for p in patterns:
        if p.groups:
            raise ValueError(
                f"findall_batch requires group-free patterns (re.findall returns "
                f"captures, regexp_extract_all returns full matches): {p.pattern!r}"
            )
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    tbl = pa.table({"t": pc.cast(texts, pa.large_string())})  # noqa: F841 — duckdb reads it by name
    sel = ", ".join(
        "regexp_extract_all(t, '{}') AS m{}".format(p.pattern.replace("'", "''"), i)
        for i, p in enumerate(patterns)
    )
    res = _duck().execute(f"SELECT {sel} FROM tbl").arrow()
    return [_as_array(res[f"m{i}"]) for i in range(len(patterns))]


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
