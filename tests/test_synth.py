"""Synthetic-web generator: determinism, shape, extractable salt."""

import pyarrow as pa

from freshonions_torscraper_ray.functions import regexes as rx
from freshonions_torscraper_ray.synth import (
    docs_to_table,
    domain_name,
    domain_profile,
    gen_domain_docs,
)


def test_domain_names_are_valid_v2_onions():
    for i in range(50):
        d = domain_name(42, i)
        assert rx.ONION_RE.fullmatch(d), d


def test_generation_is_deterministic_and_partition_independent():
    a = [gen_domain_docs(42, i, 40) for i in range(40)]
    b = [gen_domain_docs(42, i, 40) for i in reversed(range(40))]
    assert a == list(reversed(b))


def test_span_offsets_strictly_increasing():
    for i in range(20):
        for doc in gen_domain_docs(42, i, 20):
            offsets = [s["offset"] for s in doc["spans"]]
            assert offsets == sorted(set(offsets))


def test_profiles_have_skew_dead_and_robots():
    profs = [domain_profile(42, i, 200) for i in range(200)]
    assert any(p["hot"] for p in profs)
    assert 0.05 < sum(p["dead"] for p in profs) / 200 < 0.30
    assert any("Disallow: /" in p["robots"] for p in profs)
    hot_pages = [p["n_pages"] for p in profs if p["hot"]]
    cold_pages = [p["n_pages"] for p in profs if not p["hot"] and not p["dead"]]
    assert min(hot_pages) >= 20 >= max(1, sum(cold_pages) // len(cold_pages))


def test_docs_table_schema_matches_input_hint():
    rows = gen_domain_docs(42, 0, 10)
    t = docs_to_table(rows)
    assert t.schema.field("doc_id").type == pa.string()
    spans_t = t.schema.field("spans").type
    assert pa.types.is_list(spans_t)
    names = [spans_t.value_type.field(i).name for i in range(4)]
    assert names == ["kind", "text", "media_ref", "offset"]
