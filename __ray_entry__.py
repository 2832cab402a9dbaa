"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on sf0.001: adapt the flat testdata documents
    into the canonical interleaved-span shape (BASELINE.json ::
    input_hint), then run the fetch-extract stage stack (title/text
    stripping, clone fingerprinting, token stats) as zero-copy Arrow
    map_batches — the same stages the crawl round uses.
    """
    import pyarrow as pa
    import ray.data as rd

    from freshonions_torscraper_ray.schemas import DOCUMENTS
    from freshonions_torscraper_ray.stages import extract
    from freshonions_torscraper_ray.stages.textstats import token_counts

    ds = rd.read_parquet(f"{SF0001}/documents.parquet", columns=["doc_id", "text"])

    def to_spans(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_numpy(zero_copy_only=False)
        doc_ids = [f"http://doc{str(i)}.onion/" for i in ids]
        spans = [
            [
                {"kind": "title", "text": f"doc {i}", "media_ref": "", "offset": 0},
                {"kind": "text", "text": txt, "media_ref": "", "offset": 16},
            ]
            for i, txt in zip(ids, texts)
        ]
        return pa.Table.from_arrays(
            [pa.array(doc_ids, pa.string()), pa.array(spans, DOCUMENTS.field("spans").type)],
            names=["doc_id", "spans"],
        )

    pages = ds.map_batches(to_spans, batch_format="pyarrow").map_batches(
        extract.page_table, batch_format="pyarrow"
    )
    return pages.map_batches(token_counts, batch_format="pyarrow").select_columns(
        ["url", "domain", "size", "title", "is_frontpage", "clone_fp", "n_tokens"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from freshonions_torscraper_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (same column names)."""
    from freshonions_torscraper_ray.pipelines.oracle_sqls import ORACLE_SQL

    return dict(ORACLE_SQL)
