"""Deterministic 64-bit hashing helpers.

The engine's configured 64-bit hash is truncated ``blake2b`` (the sandbox
has no ``xxhash`` wheel; see SURVEY.md §7 environment note). Everything
that persists across processes/rounds (clone fingerprints, domain-shard
assignment, cuckoo fingerprints, synth-web generation) goes through these
so results are reproducible everywhere.
"""

from __future__ import annotations

import hashlib

import numpy as np

_B32_ALPHABET = "abcdefghijklmnopqrstuvwxyz234567"

MASK63 = (1 << 63) - 1


def hash64(data: str | bytes) -> int:
    """Stable 64-bit unsigned hash of a string/bytes."""
    if isinstance(data, str):
        data = data.encode("utf-8", "surrogatepass")
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def hash64_signed(data: str | bytes) -> int:
    """Stable 63-bit hash that fits in an Arrow int64 (always >= 0)."""
    return hash64(data) & MASK63


def hash64_array(values, *, signed: bool = True) -> np.ndarray:
    """Vectorize :func:`hash64` over an iterable of strings → int64/uint64.

    blake2b per element is ~1-2 M hashes/s/core; acceptable because every
    hot-path caller runs inside ``map_batches`` so the work is spread over
    the pool. (A C-level xxhash kernel is the drop-in upgrade on a real
    cluster.)
    """
    blake2b = hashlib.blake2b
    fb = int.from_bytes
    if signed:
        out = np.fromiter(
            (
                fb(blake2b(v.encode("utf-8", "surrogatepass"), digest_size=8).digest(), "little") & MASK63
                for v in values
            ),
            dtype=np.int64,
            count=len(values),
        )
    else:
        out = np.fromiter(
            (
                fb(blake2b(v.encode("utf-8", "surrogatepass"), digest_size=8).digest(), "little")
                for v in values
            ),
            dtype=np.uint64,
            count=len(values),
        )
    return out


def base32_name(value: int, length: int = 16) -> str:
    """Deterministic base32 ([a-z2-7]) name of ``length`` chars from an int."""
    chars = []
    v = value
    for _ in range(length):
        chars.append(_B32_ALPHABET[v & 31])
        v >>= 5
        if v == 0:
            v = hash64(str(value) + str(len(chars)))
    return "".join(chars)
