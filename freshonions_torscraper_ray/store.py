"""Versioned table store with Lance semantics over parquet.

The north rule stores frontier/pages/checkpoints in Lance; the sandbox
has no ``lance`` wheel (SURVEY.md §7 environment note), so this module
provides the two Lance properties the engine actually depends on, backed
by parquet:

1. **Atomic, versioned round commits** — each crawl round writes its
   output tables into ``root/rounds/round_NNNNN/<table>/`` (data first),
   then writes ``manifest.json`` last. A round without a manifest never
   existed; resume loads the highest manifested round. This is the
   write-then-manifest commit Lance versions give natively.
2. **Key-partitioned random access** — the replay content store is
   hash-partitioned by ``hash64(domain) % n_buckets`` so a fetch batch
   for a domain shard touches exactly one partition (Lance would serve
   this with take-by-key).

Swap-in point for real Lance: implement the same class against
``lance.write_dataset(..., mode="append")`` + dataset versions.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.hashing import hash64_array, hash64_signed


def _write_manifest_atomic(rdir: str, manifest: dict) -> None:
    mpath = os.path.join(rdir, "manifest.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.rename(mpath + ".tmp", mpath)


class RoundStore:
    """Directory-per-round versioned store with atomic manifests."""

    def __init__(self, root: str):
        self.root = root
        self.rounds_dir = os.path.join(root, "rounds")
        os.makedirs(self.rounds_dir, exist_ok=True)

    def _round_dir(self, rnd: int) -> str:
        return os.path.join(self.rounds_dir, f"round_{rnd:05d}")

    def abandon_round(self, rnd: int) -> None:
        """Discard a staged (never-manifested) round attempt."""
        shutil.rmtree(self._round_dir(rnd) + ".tmp", ignore_errors=True)

    def reset_rounds(self) -> None:
        """Delete every committed/staged round AND the frontier spill
        area (fresh-run fencing): a fresh run into an existing store_dir
        must not inherit a longer prior run's rounds or spill runs —
        ``latest_round``/``read_all_rounds`` would silently mix the two
        runs otherwise."""
        shutil.rmtree(self.rounds_dir, ignore_errors=True)
        os.makedirs(self.rounds_dir, exist_ok=True)
        shutil.rmtree(self.frontier_spill_dir(), ignore_errors=True)

    def frontier_spill_dir(self, shard_id: int | None = None) -> str:
        """Scheduler spill-run area (per-shard subdirs); survives round
        commits — run files are immutable and referenced by offset from
        scheduler checkpoints."""
        base = os.path.join(self.root, "frontier_spill")
        return base if shard_id is None else os.path.join(base, f"shard_{shard_id:04d}")

    def latest_round(self) -> int | None:
        """Highest round with a committed manifest, or None."""
        best = None
        for name in os.listdir(self.rounds_dir):
            if not name.startswith("round_"):
                continue
            if os.path.exists(os.path.join(self.rounds_dir, name, "manifest.json")):
                rnd = int(name.split("_")[1])
                best = rnd if best is None else max(best, rnd)
        return best

    def begin_round(self, rnd: int) -> str:
        """Open a round's staging directory (cleared of prior attempts).
        Pipeline tasks write table parts directly under it;
        :meth:`finish_round` seals the commit."""
        rdir = self._round_dir(rnd)
        tmp = rdir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(rdir):
            shutil.rmtree(rdir)
        os.makedirs(tmp)
        return tmp

    def finish_round(self, rnd: int, tables: dict[str, object], meta: dict | None = None, clear: bool = False) -> None:
        """Write the given tables into the staged dir, then rename +
        manifest — manifest written LAST is the atomic commit point (tmp
        + rename, so a torn write can never masquerade as committed).

        Values may be pyarrow Tables (written driver-side — small state/
        metrics tables) or ray.data Datasets (written DISTRIBUTED via
        write_parquet — bulk tables never pass through the driver).
        ``clear=True`` resets any prior staging/committed attempt first
        (the standalone-commit form; the round loop instead stages via
        :meth:`begin_round`). A crashed run leaves a manifest-less
        directory which the next run overwrites — rounds are idempotent
        (determinism makes re-running round k produce identical bytes)."""
        rdir = self._round_dir(rnd)
        tmp = rdir + ".tmp"
        if clear:
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            if os.path.exists(rdir):
                shutil.rmtree(rdir)
            os.makedirs(tmp)
        manifest = {"round": rnd, "tables": {}, "meta": meta or {}}
        for name, table in tables.items():
            tdir = os.path.join(tmp, name)
            if isinstance(table, pa.Table):
                os.makedirs(tdir, exist_ok=True)
                # checkpoint blobs are pre-packed binary (sparse filters,
                # pickles) — parquet compression only burns driver CPU there
                comp = "none" if name.endswith("_ckpt") else "snappy"
                pq.write_table(table, os.path.join(tdir, "part-0.parquet"), compression=comp)
                manifest["tables"][name] = {"rows": table.num_rows}
            else:  # ray.data.Dataset — distributed write
                table.write_parquet(tdir)
                manifest["tables"][name] = {"rows": -1}
        os.rename(tmp, rdir)
        _write_manifest_atomic(rdir, manifest)

    def commit_round(self, rnd: int, tables: dict[str, object], meta: dict | None = None) -> None:
        """Standalone commit (clears prior attempts) — finish_round with
        clear=True; one write-then-manifest implementation."""
        self.finish_round(rnd, tables, meta, clear=True)

    def read(self, rnd: int, name: str) -> pa.Table:
        tdir = os.path.join(self._round_dir(rnd), name)
        return pq.read_table(tdir)

    def read_manifest(self, rnd: int) -> dict:
        with open(os.path.join(self._round_dir(rnd), "manifest.json")) as f:
            return json.load(f)

    def table_path(self, rnd: int, name: str) -> str:
        return os.path.join(self._round_dir(rnd), name)

    def table_dirs(self, name: str, upto: int | None = None) -> list[str]:
        """Committed per-round directories for a table."""
        paths = []
        last = self.latest_round()
        if last is None:
            return paths
        for rnd in range(last + 1):
            if upto is not None and rnd > upto:
                break
            tdir = os.path.join(self._round_dir(rnd), name)
            if os.path.exists(os.path.join(self._round_dir(rnd), "manifest.json")) and os.path.exists(tdir):
                paths.append(tdir)
        return paths

    def table_paths(self, name: str, upto: int | None = None) -> list[str]:
        """Committed parquet FILES for a table across rounds — the LAZY
        read surface: hand these to ``ray.data.read_parquet`` so the scan
        runs on workers, never the driver (a path list disables Ray's
        directory expansion, so expand here)."""
        import glob

        return [
            f
            for tdir in self.table_dirs(name, upto)
            for f in sorted(glob.glob(os.path.join(tdir, "*.parquet")))
        ]

    def read_all_rounds(self, name: str, upto: int | None = None) -> pa.Table | None:
        """Concatenate a table across all committed rounds (append log)."""
        parts = [pq.read_table(tdir) for tdir in self.table_dirs(name, upto)]
        if not parts:
            return None
        return pa.concat_tables(parts)


class ContentStore:
    """Replay content store: URL → document lookup over the bucketed
    synthetic web (stages/fetch.py holds one per fetch actor).

    Per-bucket lazy dict cache: at test scale each bucket is small; at
    100 TB the same layout serves point lookups via parquet row-group
    pruning / Lance take — the partitioning key (domain hash) is the
    contract, the in-memory dict is the sandbox fast path.
    """

    MAX_CACHED_BUCKETS = 12  # per-worker cap; evicts least-recently-used

    def __init__(self, docs_dir: str, n_buckets: int):
        self.docs_dir = docs_dir
        self.n_buckets = n_buckets
        # bucket → pandas Index over doc_id (C-level hash table; built
        # once per parse, vectorized get_indexer per lookup batch — the
        # old per-bucket Python dict cost a scalar dict-build at parse
        # time AND a per-URL .get loop at lookup time)
        self._index: dict[int, object] = {}
        self._tables: dict[int, pa.Table] = {}
        self._lru: list[int] = []

    def bucket_of(self, domain: str) -> int:
        return hash64_signed(domain) % self.n_buckets

    def _load(self, bucket: int) -> None:
        if bucket in self._index:
            if self._lru and self._lru[-1] != bucket:
                try:
                    self._lru.remove(bucket)
                except ValueError:
                    pass
                self._lru.append(bucket)
            return
        while len(self._lru) >= self.MAX_CACHED_BUCKETS:
            old = self._lru.pop(0)
            self._index.pop(old, None)
            self._tables.pop(old, None)
        bdir = os.path.join(self.docs_dir, f"bucket={bucket}")
        if not os.path.exists(bdir):
            self._index[bucket] = None
            self._tables[bucket] = None
            self._lru.append(bucket)
            return
        import pandas as pd

        t = pq.read_table(bdir)
        idx = pd.Index(t.column("doc_id").to_numpy(zero_copy_only=False))
        if not idx.is_unique:
            # get_indexer raises an opaque InvalidIndexError mid-crawl on
            # duplicate keys; fail at parse time with the bucket named
            dups = idx[idx.duplicated()][:3].tolist()
            raise ValueError(
                f"content-store bucket {bucket} ({bdir}) has duplicate "
                f"doc_id values (e.g. {dups}) — bucket is corrupt or was "
                "re-written without dedup"
            )
        self._tables[bucket] = t
        self._index[bucket] = idx
        self._lru.append(bucket)

    def warm(self, buckets) -> int:
        """Eagerly parse the given buckets into the cache (idempotent).
        Used by fetch workers to pre-parse their OWNED buckets during
        the first round boundary's idle window — otherwise the rare
        buckets first touched in a sparse tail round concentrate their
        parse cost on one worker while the rest of the pool idles (the
        measured tail-round straggler term).

        Extends the LRU cap to hold everything warmed — without this,
        warming more than MAX_CACHED_BUCKETS buckets would evict its own
        earlier loads and report success while silently thrashing (the
        guarantee lives with the mechanism, not a far-away caller)."""
        buckets = list(buckets)
        self.MAX_CACHED_BUCKETS = max(self.MAX_CACHED_BUCKETS, len(buckets) + 1)
        n = 0
        for b in buckets:
            if b not in self._index:
                self._load(int(b))
                n += 1
        return n

    def lookup(self, urls, domains) -> tuple[pa.Table, np.ndarray]:
        """Batch lookup → (documents table of hits, per-input 1=hit/-1=miss).

        Returns hit docs in input order; misses are 404s (dead path /
        dead domain) handled by the caller. Fully vectorized: one
        blake2b pass for bucketing, one ``get_indexer`` per touched
        bucket, one take per bucket + one reorder take."""
        urls = np.asarray(urls, dtype=object)
        n = len(urls)
        buckets = hash64_array(domains) % self.n_buckets
        status = np.full(n, -1, dtype=np.int8)
        parts: list[pa.Table] = []
        pos_parts: list[np.ndarray] = []
        for b in np.unique(buckets):
            b = int(b)
            self._load(b)
            idx = self._index[b]
            if idx is None:
                continue
            sel = np.flatnonzero(buckets == b)
            rows = idx.get_indexer(urls[sel])
            hit = rows >= 0
            if not hit.any():
                continue
            pos = sel[hit]
            status[pos] = 1
            parts.append(self._tables[b].take(rows[hit]))
            pos_parts.append(pos)
        if not parts:
            from .schemas import DOCUMENTS

            return DOCUMENTS.empty_table(), status
        cat = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
        order = np.argsort(np.concatenate(pos_parts), kind="stable")
        return cat.take(order).combine_chunks(), status
