"""House-style distributed top-k (round-3 VERDICT #8).

``ds.sort(keys).limit(k)`` shuffles EVERY block through the range sort
before the limit prunes — a latent scale trap on unpruned inputs. The
house pattern (proven by ``ann_topk``): each block keeps only its local
top-k inside ``map_batches``, so the global sort sees at most
k × num_blocks tiny rows. Result-identical to sort+limit for any
deterministic total order (every global top-k row is inside its own
block's top-k).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def topk(ds, keys: list[str], descending: list[bool], k: int):
    sort_keys = [
        (c, "descending" if d else "ascending") for c, d in zip(keys, descending)
    ]

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = pc.sort_indices(t, sort_keys=sort_keys)
        return t.take(idx.slice(0, k))

    return (
        ds.map_batches(block_topk, batch_format="pyarrow")
        .sort(keys, descending=descending)
        .limit(k)
    )
