"""Seed/onion-list import + plain-text export (SURVEY §2.1 S2 / S6).

The reference harvested onion addresses from external text lists
(scripts/harvest*) and exported a plain ``onions.txt`` — here: a
``read_text`` → vectorized parse → canonical frontpage URLs pipeline and
a one-column CSV export.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..functions.regexes import ONION_ANY_PATTERN

_ONION_RE = re.compile(ONION_ANY_PATTERN)


def parse_onion_lines(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Extract onion hosts from free-form text lines → frontpage URLs.

    One output row per (line, host) occurrence, in document order; junk
    lines yield nothing — exactly the reference's tolerant list-harvest
    behavior (any line format, URLs or bare hosts).
    """
    lines = batch[text_col].to_numpy(zero_copy_only=False)
    urls = []
    for line in lines:
        for host in _ONION_RE.findall(line.lower()):
            urls.append(f"http://{host}/")
    return pa.Table.from_arrays([pa.array(urls, pa.string())], names=["url"])


def read_seed_list(path: str):
    """S2: text file(s) of onion mentions → deduplicated seed Dataset."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_text(path)
    urls = ds.map_batches(parse_onion_lines, batch_format="pyarrow")
    return urls.groupby("url").aggregate(Count(alias_name="n_mentions"))


def export_onion_list(domains_ds, out_dir: str) -> None:
    """S6: one-column plain export of known onion hosts (onions.txt)."""
    domains_ds.select_columns(["domain"]).write_csv(out_dir)
