"""Span extraction stages (O1-O11) on tiny inline fixtures."""

import pyarrow as pa

from freshonions_torscraper_ray.functions.regexes import canonicalize_url, url_domain
from freshonions_torscraper_ray.schemas import DOCUMENTS
from freshonions_torscraper_ray.stages import extract

DOM = "a" * 16 + ".onion"
DOM2 = "b2b2b2b2b2b2b2b2.onion"


def mk(doc_id, spans):
    return pa.Table.from_arrays(
        [pa.array([doc_id], pa.string()), pa.array([spans], DOCUMENTS.field("spans").type)],
        names=["doc_id", "spans"],
    )


def spans_of(*triples):
    out = []
    off = 0
    for kind, text, ref in triples:
        out.append({"kind": kind, "text": text, "media_ref": ref, "offset": off})
        off += max(len(text) + len(ref), 1)
    return out


def test_canonicalize_url():
    assert canonicalize_url(f"HTTP://{DOM.upper()}") == f"http://{DOM}/"
    assert canonicalize_url(f"http://{DOM}:80/x") == f"http://{DOM}/x"
    assert canonicalize_url(f"https://{DOM}:443/x") == f"https://{DOM}/x"
    assert canonicalize_url(f"http://{DOM}:8080/x") == f"http://{DOM}:8080/x"
    assert canonicalize_url(f"http://{DOM}/a#frag") == f"http://{DOM}/a"
    assert canonicalize_url("http://example.com/") is None  # not an onion
    assert canonicalize_url("ftp://" + DOM + "/") is None
    assert url_domain(f"http://{DOM}:8080/x") == DOM


def test_extract_links_canonicalizes_and_drops_invalid():
    t = mk(
        f"http://{DOM}/",
        spans_of(
            ("title", "hi", ""),
            ("link", "anchor1", f"http://{DOM2}"),
            ("link", "bad", "http://example.com/"),
            ("link", "anchor2", f"http://{DOM}/p/2#x"),
        ),
    )
    links = extract.extract_links(t)
    assert links.to_pydict()["dst_url"] == [f"http://{DOM2}/", f"http://{DOM}/p/2"]
    assert links.to_pydict()["src_domain"] == [DOM, DOM]
    assert links.to_pydict()["anchor"] == ["anchor1", "anchor2"]


def test_extract_emails_dedup_per_doc_first_order():
    t = mk(
        f"http://{DOM}/",
        spans_of(
            ("text", "mail me b@x.com then a@x.com", ""),
            ("text", "again a@x.com", ""),
        ),
    )
    emails = extract.extract_emails(t)
    assert emails.to_pydict()["address"] == ["b@x.com", "a@x.com"]


def test_harvest_onions_from_text():
    t = mk(f"http://{DOM}/", spans_of(("text", f"find {DOM2} here", "")))
    h = extract.harvest_onions(t)
    assert h.to_pydict()["dst_url"] == [f"http://{DOM2}/"]


def test_btc_extraction():
    addr = "1BvBMSEYstWetqTFn5Au4m4GFg7xJaNVN2"
    t = mk(f"http://{DOM}/", spans_of(("text", f"pay {addr} now", "")))
    btc = extract.extract_btc(t)
    assert btc.to_pydict()["address"] == [addr]


def test_title_text_size_and_frontpage():
    t = mk(
        f"http://{DOM}/",
        spans_of(("title", "My Title", ""), ("text", "body", ""), ("image", "", "http://x/i.png")),
    )
    pages = extract.page_table(t)
    row = pages.to_pylist()[0]
    assert row["title"] == "My Title"
    assert row["text"] == "My Title\nbody"
    assert row["is_frontpage"] is True
    assert row["size"] == len("My Title") + len("body") + len("http://x/i.png")


def test_clone_fingerprint_is_span_sequence_equality_hash():
    s = spans_of(("title", "t", ""), ("text", "x", ""))
    t1 = mk(f"http://{DOM}/", s)
    t2 = mk(f"http://{DOM2}/", s)  # same content, different url → same fp
    t3 = mk(f"http://{DOM}/p/1", spans_of(("title", "t", ""), ("text", "y", "")))
    f1 = extract.clone_fingerprints(t1)[0]
    f2 = extract.clone_fingerprints(t2)[0]
    f3 = extract.clone_fingerprints(t3)[0]
    assert f1 == f2 != f3


def test_extract_cores_batch_matches_scalar_walk():
    """Vectorized batch extract ≡ per-doc extract_doc_core on adversarial
    spans: empty docs, empty title texts, media-only docs, multi-title,
    invalid + duplicate links, unicode, empty text/link spans."""
    import random

    from freshonions_torscraper_ray.functions.doc_extract import (
        extract_cores_batch,
        extract_doc_core,
    )

    rng = random.Random(7)
    kinds = ["title", "text", "link", "image", "video"]
    texts = ["", "a", "héllo wörld", "x" * 50, "anchor", "Tïtle"]
    refs = ["", f"http://{DOM}/p", f"HTTPS://{DOM2}:443/q#frag", "not a url",
            f"http://{DOM}/p", "ftp://nope", f"http://{'c'*16}.onion:8080/r"]
    docs = []
    for i in range(200):
        docs.append(
            spans_of(*[
                (rng.choice(kinds), rng.choice(texts), rng.choice(refs))
                for _ in range(rng.randrange(0, 12))
            ])
        )
    urls = [f"http://{DOM}/" if i % 3 == 0 else f"http://{DOM}/p/{i}" for i in range(len(docs))]
    col = pa.array(docs, DOCUMENTS.field("spans").type)
    vec = extract_cores_batch(urls, col)
    for u, s, got in zip(urls, docs, vec):
        assert got == extract_doc_core(u, s)


def test_canonicalize_urls_batch_matches_scalar():
    """Vectorized canonicalizer ≡ scalar on adversarial refs: unicode
    whitespace/digits (scalar-fallback path), fragments, default ports,
    case, invalid hosts/schemes, nulls."""
    import pyarrow as pa

    from freshonions_torscraper_ray.functions.regexes import (
        canonicalize_url,
        canonicalize_urls_batch,
        url_domain,
    )

    v2, v3 = "a" * 16 + ".onion", "b" * 56 + ".onion"
    cases = [
        "", " ", f"http://{v2}", f"HTTP://{v2.upper()}/Path#Frag",
        f"  https://{v3}:443/q  ", f"https://{v3}:8443/q", f"http://{v2}:80/",
        f"http://{v2}:81/", "not a url", f"ftp://{v2}/", "http://short.onion/",
        f"http://{v2}/#", f"http://{v2}#x/y", f"http://{v2}/p#a#b",
        f"\xa0http://{v2}/\xa0", f"\x1chttp://{v2}/", f"http://{v2}:٨٠/",
        f"http://{v2}/p\xa0q", f"http://{v2}/p q", f"http://{v2}:0080/",
        None, f"http://{v2}/\n", f"http://{v2}/a\tb", f"https://{v2}",
    ]
    canon, dom = canonicalize_urls_batch(pa.array(cases, pa.string()))
    for raw, cb, db in zip(cases, canon.to_pylist(), dom.to_pylist()):
        cs = None if raw is None else canonicalize_url(raw)
        ds = None if cs is None else url_domain(cs)
        assert (cb, db) == (cs, ds), raw


def test_columnar_finish_matches_scalar_finish_extract():
    """Full columnar extract (span_core_columns + extract_finish_columnar)
    ≡ per-doc extract_doc on adversarial spans: dup links, same-domain
    depth drops (incl. the cseen subtlety: a depth-dropped link does NOT
    claim its url), harvested onions colliding with link targets, dup
    emails/btc, empty docs."""
    import numpy as np
    import pyarrow as pa

    from freshonions_torscraper_ray.functions.doc_extract import (
        extract_doc,
        extract_finish_columnar,
        span_core_columns,
    )

    v2 = "a" * 16 + ".onion"
    other = "b" * 16 + ".onion"
    third = "c" * 56 + ".onion"
    MAXD = 2
    docs = [
        # same-domain link at max depth boundary + harvested onion of SAME url
        (f"http://{v2}/p/1", 2, [
            ("link", "anchor", f"http://{v2}/p/2"),       # depth 3 > MAXD → dropped, url unclaimed
            ("text", f"mention {v2} and {other} twice {other}", ""),
            ("link", "x", f"http://{other}/"),
        ]),
        # dup links + dup emails/btc
        (f"http://{other}/", 0, [
            ("link", "a1", f"http://{v2}/"),
            ("link", "a2", f"http://{v2}/"),               # dup url → kept once (first)
            ("link", "a3", f"HTTP://{v2}:80/"),            # canonicalizes to same → dup
            ("text", "e@x.com e@x.com f@y.org 1BvBMSEYstWetqTFn5Au4m4GFg7xJaNVN2", ""),
            ("link", "", f"http://{third}/deep"),
        ]),
        (f"http://{v2}/", 0, []),  # empty doc
        # cross-domain + harvest-new
        (f"http://{third}/", 1, [
            ("text", f"go {v2}", ""),
            ("link", "self", f"http://{third}/p/1"),       # same-domain depth 2 ≤ MAXD
        ]),
    ]
    spans_t = pa.array(
        [[{"kind": k, "text": t, "media_ref": r, "offset": 0} for k, t, r in sp] for _, _, sp in docs],
        DOCUMENTS.field("spans").type,
    )
    urls = pa.array([u for u, _, _ in docs], pa.string())
    depths = np.array([d for _, d, _ in docs], np.int64)
    core = span_core_columns(spans_t)
    fin = extract_finish_columnar(core, urls, depths, MAXD)

    e_counts, e_vals = fin["emails"]
    b_counts, b_vals = fin["btc"]
    c_counts, c_urls, c_doms, c_deps = fin["cands"]
    e_vals, b_vals = e_vals.to_pylist(), b_vals.to_pylist()
    c_urls, c_doms, c_deps = c_urls.to_pylist(), c_doms.to_pylist(), list(c_deps)
    eo = bo = co = 0
    for i, (u, d, sp) in enumerate(docs):
        ref = extract_doc(u, [{"kind": k, "text": t, "media_ref": r} for k, t, r in sp], d, MAXD)
        assert e_vals[eo:eo + e_counts[i]] == ref["emails"], u
        assert b_vals[bo:bo + b_counts[i]] == ref["btc"], u
        got_c = list(zip(c_urls[co:co + c_counts[i]], c_doms[co:co + c_counts[i]],
                         [int(x) for x in c_deps[co:co + c_counts[i]]]))
        assert got_c == ref["candidates"], u
        eo += e_counts[i]; bo += b_counts[i]; co += c_counts[i]
