"""Fixed engine-canonical Arrow schemas (no inference anywhere).

Mapping from the reference's Pony-ORM entities (Domain/Page/Email/
BitcoinAddress/OpenPort/SSHFingerprint — SURVEY.md §1.1) to columnar
tables; the interleaved-span ``documents`` shape is authoritative from
BASELINE.json :: input_hint.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),        # "title" | "text" | "link" | "image"
        pa.field("text", pa.string()),        # text content / anchor text; "" for media
        pa.field("media_ref", pa.string()),   # href / media URI; "" for pure text
        pa.field("offset", pa.int32()),       # char offset, strictly increasing
    ]
)

DOCUMENTS = pa.schema(
    [
        pa.field("doc_id", pa.string()),      # canonical URL
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

SEED_LIST = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("added_at", pa.timestamp("us")),
    ]
)

ROBOTS = pa.schema(
    [
        pa.field("domain", pa.string()),
        pa.field("body", pa.string()),
    ]
)

FRONTIER = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("domain", pa.string()),
        pa.field("domain_hash", pa.int64()),
        pa.field("depth", pa.int32()),
        pa.field("priority", pa.float32()),
        pa.field("discovered_seq", pa.int64()),  # packed (round, fetch_idx, pos) — total discovery order
        pa.field("state", pa.string()),          # pending|fetched|dead|banned
        pa.field("retries", pa.int32()),
    ]
)

PAGES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("domain", pa.string()),
        pa.field("status", pa.int32()),
        pa.field("size", pa.int64()),
        pa.field("title", pa.string()),
        pa.field("text", pa.large_string()),
        pa.field("is_frontpage", pa.bool_()),
        pa.field("round", pa.int32()),
        pa.field("vtime", pa.float64()),         # virtual fetch time within round (politeness clock)
        pa.field("fetch_order", pa.int64()),     # global deterministic crawl order index
        pa.field("clone_fp", pa.int64()),        # span-sequence hash (O11) — doubles as the invariant hash
        pa.field("depth", pa.int32()),
    ]
)

LINKS = pa.schema(
    [
        pa.field("src_url", pa.string()),
        pa.field("src_domain", pa.string()),
        pa.field("dst_url", pa.string()),
        pa.field("dst_domain", pa.string()),
        pa.field("anchor", pa.string()),
    ]
)

EMAILS = pa.schema(
    [
        pa.field("address", pa.string()),
        pa.field("url", pa.string()),
        pa.field("domain", pa.string()),
    ]
)

BTC = pa.schema(
    [
        pa.field("address", pa.string()),
        pa.field("url", pa.string()),
        pa.field("domain", pa.string()),
    ]
)

DOMAINS = pa.schema(
    [
        pa.field("domain", pa.string()),
        pa.field("is_up", pa.bool_()),
        pa.field("title", pa.string()),
        pa.field("pages_crawled", pa.int32()),
        pa.field("clone_fp", pa.int64()),        # frontpage fingerprint
        pa.field("is_genuine", pa.bool_()),
        pa.field("first_seen_seq", pa.int64()),
    ]
)

SEEN_CKPT = pa.schema(
    [
        pa.field("shard_id", pa.int32()),
        pa.field("filter_bytes", pa.large_binary()),
        pa.field("count", pa.int64()),
        pa.field("round", pa.int32()),
    ]
)

SCHED_CKPT = pa.schema(
    [
        pa.field("shard_id", pa.int32()),
        pa.field("state_bytes", pa.large_binary()),  # pickled per-shard domain state
        pa.field("round", pa.int32()),
    ]
)

METRICS = pa.schema(
    [
        pa.field("round", pa.int32()),
        pa.field("partition", pa.int32()),
        pa.field("urls_scheduled", pa.int64()),
        pa.field("urls_fetched", pa.int64()),
        pa.field("urls_discovered", pa.int64()),
        pa.field("urls_deduped", pa.int64()),
        pa.field("wall_ms", pa.int64()),
        pa.field("lineage", pa.string()),
    ]
)
