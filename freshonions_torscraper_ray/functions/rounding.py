"""Rounding that matches DuckDB's ROUND() (half away from zero).

numpy/python round are half-to-even; using them would flip value hashes
against the SQL oracles on exact .5 boundaries (e.g. 4.28125 → 4.2812 vs
DuckDB's 4.2813). Every float the query surface emits goes through these.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def round_half_away(x, ndigits: int = 4):
    """Vectorized half-away-from-zero rounding (numpy array / scalar in)."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0**ndigits
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def pc_round4(col, ndigits: int = 4) -> pa.Array:
    """pyarrow column → float64 rounded half-away (DuckDB-equivalent)."""
    return pc.round(
        pc.cast(col, pa.float64()), ndigits=ndigits, round_mode="half_towards_infinity"
    )
