"""Sharded URL-seen set: cuckoo filter fast path + exact authority.

The reference's URL-seen semantics are EXACT (Scrapy RFPDupeFilter
fingerprint set per run + DB unique keys across runs — SURVEY.md §2.3
O13), while the north rule mandates a bloom/cuckoo structure for the
10^10-URL frontier. Both are honored: each shard actor holds

- a **cuckoo filter** (numpy bucket array, 4-way, 16-bit fingerprints,
  standard partial-key cuckoo hashing) answering "definitely new" with
  zero memory per stored key beyond the table, and
- an **exact digest set** (16-byte blake2b of the URL) consulted only
  when the cuckoo filter says "maybe seen", so false positives can never
  drop a genuinely new URL — the final seen set is exactly the
  reference's.

Sharding: ``hash64_signed(url) % num_shards`` — the fetch actors group
candidates by shard and issue ``accept`` RPCs; ``flush_round_cols`` commits a
round's accepted URLs. Checkpoints are incremental: full (filter table +
digest bytes) on a periodic base, (digest, hash) deltas between; restore
replays deltas over the newest full base.
"""

from __future__ import annotations

import hashlib
import pickle

import numpy as np

from ..functions.hashing import hash64_signed  # noqa: F401 — sharding docs/tests

_EMPTY = np.uint16(0)


class CuckooFilter:
    """4-way bucketed cuckoo filter with 16-bit fingerprints (fpp ~2^-13
    per lookup at 95% load). Vectorized membership for batches; inserts
    are per-item with standard random-walk eviction (bounded, seeded —
    deterministic)."""

    def __init__(self, capacity: int = 1 << 16, seed: int = 42):
        n_buckets = 1
        while n_buckets * 4 < capacity:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)
        self.seed = seed
        self.count = 0
        self.max_kicks = 500

    @staticmethod
    def _fingerprint(h: int) -> int:
        fp = (h >> 48) & 0xFFFF
        return fp if fp != 0 else 1

    def _index2(self, i1: int, fp: int) -> int:
        # partner bucket via a cheap integer mix (murmur-style constant);
        # cryptographic hashing per eviction kick would dominate insert
        # cost on full tables
        return (i1 ^ ((fp * 0x5BD1E995) & (self.n_buckets - 1))) & (self.n_buckets - 1)

    def contains_hash(self, h: int) -> bool:
        fp = self._fingerprint(h)
        i1 = h & (self.n_buckets - 1)
        if (self.table[i1] == fp).any():
            return True
        i2 = self._index2(i1, fp)
        return bool((self.table[i2] == fp).any())

    def insert_hash(self, h: int) -> bool:
        fp = self._fingerprint(h)
        i1 = h & (self.n_buckets - 1)
        i2 = self._index2(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == _EMPTY)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # eviction random walk, deterministically seeded by (h, count)
        rng = np.random.RandomState((h ^ self.count) & 0x7FFFFFFF)
        i = i1 if rng.randint(2) else i2
        cur = fp
        for _ in range(self.max_kicks):
            slot = rng.randint(4)
            cur, self.table[i][slot] = int(self.table[i][slot]), cur
            i = self._index2(i, cur)
            row = self.table[i]
            empty = np.flatnonzero(row == _EMPTY)
            if empty.size:
                row[empty[0]] = cur
                self.count += 1
                return True
        return False  # table over-full; caller falls back to exact set only

    def insert_hashes(self, hs: np.ndarray) -> bool:
        """Vectorized batch insert. Places every hash whose primary or
        partner bucket has a free slot with numpy scatter passes (the
        overwhelmingly common case below ~95% load); only the leftovers
        take the per-item eviction walk. Returns False on the first
        eviction failure (caller degrades to exact-set-only, same as the
        per-item path).

        The resulting TABLE CONTENT can differ from per-item insertion
        order (slot choice within a bucket), which is semantically free:
        the filter only modulates the false-positive rate — the exact
        digest set is always the authority — and checkpoint equality is
        semantic, not byte-level."""
        hs = np.asarray(hs, dtype=np.uint64)
        if hs.size == 0:
            return True
        fps = ((hs >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fps[fps == 0] = 1
        mask = self.n_buckets - 1
        i1 = (hs & np.uint64(mask)).astype(np.int64)
        i2 = (i1 ^ ((fps.astype(np.int64) * 0x5BD1E995) & mask)) & mask
        rem = np.ones(len(hs), dtype=bool)
        for buckets in (i1, i2):
            idx = np.flatnonzero(rem)
            if not idx.size:
                break
            b = buckets[idx]
            order = np.argsort(b, kind="stable")
            bs = b[order]
            grp = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
            sizes = np.diff(np.r_[grp, len(bs)])
            ranks = np.arange(len(bs)) - np.repeat(grp, sizes)
            rows = self.table[bs]  # (m, 4) gather
            n_empty = (rows == _EMPTY).sum(axis=1)
            # stable argsort of the occupancy mask puts empty slots first,
            # so the rank-th item of a bucket group takes the rank-th
            # empty slot — distinct slots within a group by construction
            slot_order = np.argsort(rows != _EMPTY, axis=1, kind="stable")
            place = ranks < n_empty
            if place.any():
                slots = slot_order[np.arange(len(bs)), np.minimum(ranks, 3)]
                sel = idx[order[place]]
                self.table[bs[place], slots[place]] = fps[sel]
                self.count += int(place.sum())
                rem[sel] = False
        for j in np.flatnonzero(rem):  # rare: both buckets full → evict
            if not self.insert_hash(int(hs[j])):
                return False
        return True

    def to_bytes(self) -> bytes:
        """Sparse when lightly loaded: a shard sized for the 10^10-scale
        frontier is mostly zeros early on, and serializing the dense
        table made checkpoints O(capacity) instead of O(occupancy)
        (measured: 72 MB → ~4 MB per full checkpoint at 550k URLs/32
        shards, and the driver's parquet write of it 3.3 s → ~0.1 s)."""
        flat = self.table.reshape(-1)
        nz = np.flatnonzero(flat)
        if nz.size * 3 < flat.size:  # sparse pays below ~1/3 occupancy
            payload = {"idx": nz.astype(np.int64), "fp": flat[nz]}
        else:
            payload = {"table": self.table}
        return pickle.dumps(
            {"n_buckets": self.n_buckets, "count": self.count, "seed": self.seed, **payload}
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        d = pickle.loads(data)
        f = cls.__new__(cls)
        f.n_buckets = d["n_buckets"]
        if "table" in d:
            f.table = d["table"]
        else:
            flat = np.zeros(f.n_buckets * 4, dtype=np.uint16)
            flat[d["idx"]] = d["fp"]
            f.table = flat.reshape(f.n_buckets, 4)
        f.count = d["count"]
        f.seed = d["seed"]
        f.max_kicks = 500
        return f


def url_digest(url: str) -> bytes:
    return hashlib.blake2b(url.encode("utf-8"), digest_size=16).digest()


def digest_hash64(dg: bytes) -> int:
    """Shard-internal 64-bit hash derived from the exact digest (first 8
    bytes, little-endian) — one blake2b per URL instead of two. Purely
    internal to a seen shard (cuckoo slots + delta blobs); both insert
    paths (add_if_new and the round flush) derive it the same way, which
    is the correctness requirement (a cuckoo false NEGATIVE would skip
    the exact-set check and re-crawl a seen URL)."""
    return int.from_bytes(dg[:8], "little")


class SeenShardState:
    """The shard's actual logic — plain object so the oracle/unit tests can
    drive it without Ray; the Ray actor below is a thin wrapper."""

    def __init__(self, shard_id: int, capacity: int = 1 << 20, seed: int = 42):
        self.shard_id = shard_id
        self.cuckoo = CuckooFilter(capacity, seed)
        self.exact: set[bytes] = set()
        # Once any cuckoo insert fails (table over-full), the filter can
        # give false NEGATIVES for keys it failed to store — from then on
        # every lookup must consult the exact set. Size capacity so this
        # never trips in production; correctness survives if it does.
        self.degraded = False
        # (digest, hash64) pairs added since the last checkpoint — the
        # incremental-checkpoint unit. The exact set grows monotonically
        # (160 GB at 10^10 URLs), so serializing it fully per round is the
        # scale blocker; deltas are O(new URLs per interval).
        self._delta: list[tuple[bytes, int]] = []
        # round-local accepted candidates (url -> frontier row), committed
        # by flush_round_cols; MUST be empty at checkpoint time
        self.round_acc: dict = {}

    def add_if_new(self, urls: list[str]) -> list[bool]:
        """For each url (this shard's partition): True if newly added.
        Duplicates WITHIN the list resolve first-occurrence-wins, so
        callers must pre-order by discovery seq (the round pipeline
        pre-dedups exactly, making order irrelevant)."""
        out = []
        for u in urls:
            d = url_digest(u)
            h = digest_hash64(d)
            if self.degraded or self.cuckoo.contains_hash(h):
                # maybe-seen → exact authority
                if d in self.exact:
                    out.append(False)
                    continue
            self.exact.add(d)
            self._delta.append((d, h))
            self._insert_filter(h)
            out.append(True)
        return out

    # ---- round-accumulation protocol (shuffle-free frontier dedup) ----
    #
    # Candidate batches stream straight from the extract stage (no
    # all-to-all): each shard ACCUMULATES its partition's candidates for
    # the current round, resolving within-round duplicates to the minimum
    # discovered_seq in-actor (actors serialize calls, so arrival order
    # cannot matter). ``flush_round_cols`` then commits digests to the
    # cuckoo+exact structures and hands the surviving frontier rows out
    # for scheduler routing. Exactly the semantics of the former
    # groupby(url).min(seq) pass, without moving every candidate twice.

    def accept(self, cols: tuple) -> int:
        """cols: (urls, domains, depths, priorities, seqs) — parallel
        lists, this shard's hash partition (columnar: pickling five flat
        lists is ~5x cheaper than 100k tuples). Returns #rows accepted."""
        acc = self.round_acc
        urls, domains, depths, priorities, seqs = cols
        n = 0
        exact = self.exact
        for i in range(len(urls)):
            url = urls[i]
            dg = url_digest(url)
            if dg in exact:
                continue
            seq = seqs[i]
            cur = acc.get(url)
            if cur is None or seq < cur[3]:
                acc[url] = (domains[i], depths[i], priorities[i], seq, dg)
                if cur is None:  # min-seq updates don't add a row
                    n += 1
        return n

    def _insert_filter(self, h: int) -> None:
        """Insert into the cuckoo filter unless it has already overflowed
        — a degraded filter is bypassed entirely (every lookup goes to the
        exact set), so paying a full failed eviction walk per insert would
        be pure waste."""
        if not self.degraded and not self.cuckoo.insert_hash(h):
            self.degraded = True

    def flush_round_cols(self) -> tuple | None:
        """Columnar flush: commit and return (urls, domains, depths,
        priorities, seqs) parallel lists, or None if empty. Vectorized:
        one ``hash64_array`` pass + batch set/list extends + the batch
        cuckoo insert — the per-URL Python loop was a measured slice of
        the per-round serial flush chain (85 ms / 16k rows / shard)."""
        acc = self.round_acc
        if not acc:
            return None
        urls = list(acc.keys())
        domains, depths, prios, seqs, dgs = map(list, zip(*acc.values()))
        # 64-bit hashes derived from the digests already computed in
        # accept() — one vectorized frombuffer view, no second blake2b pass
        hs = np.frombuffer(b"".join(dgs), dtype="<u8").reshape(-1, 2)[:, 0].copy()
        self.exact.update(dgs)
        self._delta.extend(zip(dgs, hs.tolist()))
        if not self.degraded and not self.cuckoo.insert_hashes(hs):
            self.degraded = True
        self.round_acc = {}
        return (urls, domains, depths, prios, seqs)

    def __len__(self) -> int:
        return len(self.exact)

    def _check_flushed(self) -> None:
        """Checkpointing mid-round would SILENTLY drop the accepted-but-
        unflushed candidates (round_acc is round-local, not serialized);
        the engine always flushes before checkpointing — enforce it."""
        if self.round_acc:
            raise RuntimeError(
                f"seen shard {self.shard_id}: checkpoint requested with "
                f"{len(self.round_acc)} unflushed accepted candidates — "
                "call flush_round_cols() first"
            )

    def state_bytes(self) -> bytes:
        self._check_flushed()
        # full checkpoint supersedes any pending delta
        self._delta = []
        # set iteration order is process-dependent but checkpoint equality
        # is semantic (membership), not byte-level — no sort needed
        return pickle.dumps(
            {
                "shard_id": self.shard_id,
                "cuckoo": self.cuckoo.to_bytes(),
                "digests": b"".join(self.exact),
                "degraded": self.degraded,
            }
        )

    def delta_bytes(self) -> bytes:
        """Incremental checkpoint: (digest, hash) pairs added since the
        last full/delta checkpoint. Resets the delta buffer — the caller
        commits this blob in the same round manifest. A FAILED commit
        after this call must not reuse the engine in-process (the
        drained delta would be lost from the chain) — CrawlEngine
        enforces that via its commit-failure poisoning; recovery is
        restart + resume from the last committed round."""
        self._check_flushed()
        digests = b"".join(d for d, _ in self._delta)
        hashes = np.array([h for _, h in self._delta], dtype=np.uint64)
        self._delta = []
        return pickle.dumps(
            {"shard_id": self.shard_id, "digests": digests, "hashes": hashes.tobytes(), "degraded": self.degraded}
        )

    def apply_delta_bytes(self, data: bytes) -> None:
        d = pickle.loads(data)
        raw = d["digests"]
        for i in range(0, len(raw), 16):
            self.exact.add(raw[i : i + 16])
        for h in np.frombuffer(d["hashes"], dtype=np.uint64):
            self._insert_filter(int(h))
        self.degraded = self.degraded or d.get("degraded", False)

    @classmethod
    def from_state_bytes(cls, data: bytes, deltas: list[bytes] | None = None) -> "SeenShardState":
        d = pickle.loads(data)
        s = cls.__new__(cls)
        s.shard_id = d["shard_id"]
        s.cuckoo = CuckooFilter.from_bytes(d["cuckoo"])
        raw = d["digests"]
        s.exact = {raw[i : i + 16] for i in range(0, len(raw), 16)}
        s.degraded = d.get("degraded", False)
        s._delta = []
        s.round_acc = {}
        for blob in deltas or []:
            s.apply_delta_bytes(blob)
        return s


def make_seen_actor():
    """Ray actor class for a seen shard (created lazily so importing this
    module never touches Ray)."""
    import ray

    from ..config import SEEN_SHARD_CPUS

    @ray.remote(num_cpus=SEEN_SHARD_CPUS)
    class SeenShard:
        def __init__(self, shard_id: int, capacity: int = 1 << 20, seed: int = 42, state: bytes | None = None, deltas=None):
            if state is not None:
                self.s = SeenShardState.from_state_bytes(state, deltas)
            else:
                self.s = SeenShardState(shard_id, capacity, seed)

        def add_if_new(self, urls: list[str]) -> list[bool]:
            return self.s.add_if_new(urls)

        def accept(self, rows) -> int:
            return self.s.accept(rows)

        def _partition_cols(self, cols, n_sched: int) -> list:
            """Vectorized domain-hash partition of flushed columns into
            ``n_sched`` column tuples (None for empty partitions).
            ``pd.factorize`` (C hash table) maps rows to distinct
            domains; only the distinct domains are blake2b-hashed and
            the per-row partition is one fancy-index — no per-row Python
            anywhere (np.unique object-sort + dict fromiter was 154 ms
            at 65k rows; this is ~70 ms)."""
            import numpy as _np
            import pandas as _pd

            from ..functions.hashing import hash64_array

            urls, domains, depths, prios, seqs = cols
            doms = _np.asarray(domains, dtype=object)
            codes, uniques = _pd.factorize(doms)
            part = (hash64_array(list(uniques)) % n_sched)[codes]
            u_np = _np.asarray(urls, dtype=object)
            deps = _np.asarray(depths, dtype=_np.int64)
            prs = _np.asarray(prios, dtype=_np.float64)
            sqs = _np.asarray(seqs, dtype=_np.int64)
            out: list = [None] * n_sched
            for shard in _np.unique(part):
                idx = _np.flatnonzero(part == shard)
                out[int(shard)] = (
                    u_np[idx].tolist(),
                    doms[idx].tolist(),
                    deps[idx].tolist(),
                    prs[idx].tolist(),
                    sqs[idx].tolist(),
                )
            return out

        def flush_parts(self, n_sched: int):
            """One-wave flush: commit the round's accepted URLs and
            return ``n_sched`` partitioned column tuples PLUS the count
            as separate return objects (``num_returns=n_sched+1``). The
            driver forwards only ObjectRefs; each scheduler shard pulls
            exactly its partitions from the object store — no nested
            actor ray.get, one RPC wave instead of seen×sched calls
            (the measured flush wall was RPC fan-out latency, not
            compute)."""
            cols = self.s.flush_round_cols()
            if cols is None:
                return (*[None] * n_sched, 0)
            parts = self._partition_cols(cols, n_sched)
            return (*parts, len(cols[0]))

        def size(self) -> int:
            return len(self.s)

        def state_bytes(self) -> bytes:
            return self.s.state_bytes()

        def delta_bytes(self) -> bytes:
            return self.s.delta_bytes()

    return SeenShard
