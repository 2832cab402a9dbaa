"""Fetch-and-extract stages over interleaved span documents.

Ray-Data-native re-expression of the reference spider's parse step
(freshonions-torscraper ``torscraper/spiders/tor_scrapy.py :: parse`` —
SURVEY.md §2.2 O1–O11): title extraction, HTML→text stripping, link
extraction (same-domain pages + foreign onion discovery), bare-onion
harvest, email + bitcoin extraction, clone fingerprinting. Here "HTML" is
the span structure: ``kind ∈ {title, text, link, image}``.

All functions are batch transforms: Arrow table in (zero-copy from the
object store), Arrow table(s) out. The nested ``spans`` column is
processed with ``pyarrow.compute`` list kernels (``list_flatten`` +
``list_parent_indices``) so per-span work is vectorized; only the
regex find-all over per-document text runs a C-regex per row.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import regexes as rx
from ..functions.hashing import hash64_array
from ..schemas import BTC, EMAILS, LINKS


def _flat_spans(batch: pa.Table):
    """Flatten the spans column → (kind, text, media_ref, parent_index)."""
    spans = batch["spans"].combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans)
    return (
        pc.struct_field(flat, "kind"),
        pc.struct_field(flat, "text"),
        pc.struct_field(flat, "media_ref"),
        parents,
    )


def doc_text_and_title(batch: pa.Table) -> tuple[list[str], list[str], np.ndarray]:
    """Per-document stripped text (O7), title (O4) and byte size (O8).

    Stripped text = title + text spans + link anchor texts joined with
    newlines in span order (the reference indexed the tag-stripped body
    into Elasticsearch; anchors are part of visible text).
    """
    kinds, texts, refs, parents = _flat_spans(batch)
    n = batch.num_rows
    kind_np = kinds.to_numpy(zero_copy_only=False)
    text_np = texts.to_numpy(zero_copy_only=False)
    ref_np = refs.to_numpy(zero_copy_only=False)
    par_np = parents.to_numpy(zero_copy_only=False)
    doc_parts: list[list[str]] = [[] for _ in range(n)]
    titles = [""] * n
    sizes = np.zeros(n, dtype=np.int64)
    for k, t, r, p in zip(kind_np, text_np, ref_np, par_np):
        sizes[p] += len(t) + len(r)
        if k == "title":
            if not titles[p]:
                titles[p] = t
            doc_parts[p].append(t)
        elif k == "text" or k == "link":
            if t:
                doc_parts[p].append(t)
    return ["\n".join(parts) for parts in doc_parts], titles, sizes


def clone_fingerprints(batch: pa.Table) -> np.ndarray:
    """O11: 64-bit hash of the canonical ordered span sequence
    (kind, text, media_ref) per document.

    This is simultaneously the clone/mirror fingerprint (reference clone
    detection normalizes the frontpage and hashes it) and the engine's
    span-sequence-equality invariant hash (BASELINE.json :: input_hint).
    """
    kinds, texts, refs, parents = _flat_spans(batch)
    n = batch.num_rows
    par_np = parents.to_numpy(zero_copy_only=False)
    reprs: list[list[str]] = [[] for _ in range(n)]
    for k, t, r, p in zip(
        kinds.to_numpy(zero_copy_only=False),
        texts.to_numpy(zero_copy_only=False),
        refs.to_numpy(zero_copy_only=False),
        par_np,
    ):
        reprs[p].append(f"{k}\x1f{t}\x1f{r}")
    return hash64_array(["\x1e".join(parts) for parts in reprs])


def extract_links(batch: pa.Table) -> pa.Table:
    """O2: explode link spans → LINKS edge rows (canonicalized, O1).

    Invalid/non-onion hrefs are dropped, exactly as the reference's
    LinkExtractor only followed onion URLs.
    """
    kinds, texts, refs, parents = _flat_spans(batch)
    mask = pc.equal(kinds, "link")
    hrefs = pc.filter(refs, mask).to_numpy(zero_copy_only=False)
    anchors = pc.filter(texts, mask).to_numpy(zero_copy_only=False)
    par = pc.filter(parents, mask).to_numpy(zero_copy_only=False)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)

    src_urls, src_doms, dst_urls, dst_doms, anc = [], [], [], [], []
    for href, anchor, p in zip(hrefs, anchors, par):
        canon = rx.canonicalize_url(href)
        if canon is None:
            continue
        src = doc_ids[p]
        src_urls.append(src)
        src_doms.append(rx.url_domain(src))
        dst_urls.append(canon)
        dst_doms.append(rx.url_domain(canon))
        anc.append(anchor)
    return pa.Table.from_arrays(
        [
            pa.array(src_urls, pa.string()),
            pa.array(src_doms, pa.string()),
            pa.array(dst_urls, pa.string()),
            pa.array(dst_doms, pa.string()),
            pa.array(anc, pa.string()),
        ],
        schema=LINKS,
    )


def _extract_entities(doc_ids, doc_texts, pattern: re.Pattern, schema: pa.Schema) -> pa.Table:
    """Regex find-all over per-doc text → (address, url, domain) rows,
    de-duplicated per document keeping first occurrence order (the
    reference's Email/BitcoinAddress m2m is unique per page)."""
    addrs, urls, doms = [], [], []
    for u, t in zip(doc_ids, doc_texts):
        found = pattern.findall(t)
        if not found:
            continue
        seen = set()
        d = rx.url_domain(u)
        for a in found:
            if a not in seen:
                seen.add(a)
                addrs.append(a)
                urls.append(u)
                doms.append(d)
    return pa.Table.from_arrays(
        [pa.array(addrs, pa.string()), pa.array(urls, pa.string()), pa.array(doms, pa.string())],
        schema=schema,
    )


def extract_emails(batch: pa.Table) -> pa.Table:
    """O5: email extraction over stripped text."""
    texts, _, _ = doc_text_and_title(batch)
    return _extract_entities(batch["doc_id"].to_numpy(zero_copy_only=False), texts, rx.EMAIL_RE, EMAILS)


def extract_btc(batch: pa.Table) -> pa.Table:
    """O6: base58 bitcoin-address extraction over stripped text."""
    texts, _, _ = doc_text_and_title(batch)
    return _extract_entities(batch["doc_id"].to_numpy(zero_copy_only=False), texts, rx.BTC_RE, BTC)


def harvest_onions(batch: pa.Table) -> pa.Table:
    """O3: bare onion-address harvest from text (outside <a> tags) →
    candidate frontpage URLs, as the reference turned harvested hosts
    into new Domain rows."""
    texts, _, _ = doc_text_and_title(batch)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    rows = _extract_entities(doc_ids, texts, rx.ONION_ANY_RE, EMAILS)  # address=host
    urls = pc.binary_join_element_wise(
        pa.scalar("http://"), rows["address"].combine_chunks(), pa.scalar("/"), ""
    )
    return pa.Table.from_arrays(
        [urls, rows["url"].combine_chunks(), rows["domain"].combine_chunks()],
        names=["dst_url", "src_url", "src_domain"],
    )


def page_table(batch: pa.Table, status: np.ndarray | None = None) -> pa.Table:
    """Project fetched documents → PAGES-shaped columns (subset; the
    crawl round appends round/vtime/fetch_order)."""
    texts, titles, sizes = doc_text_and_title(batch)
    fps = clone_fingerprints(batch)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    doms = [rx.url_domain(u) for u in doc_ids]
    is_front = [u.endswith(".onion/") for u in doc_ids]
    return pa.Table.from_arrays(
        [
            pa.array(doc_ids, pa.string()),
            pa.array(doms, pa.string()),
            pa.array(sizes, pa.int64()),
            pa.array(titles, pa.string()),
            pa.array(texts, pa.large_string()),
            pa.array(is_front, pa.bool_()),
            pa.array(fps, pa.int64()),
        ],
        names=["url", "domain", "size", "title", "text", "is_frontpage", "clone_fp"],
    )
