"""Numeric conventions shared by the engine and the DuckDB oracles.

Float outputs that the driver value-hashes are normalized with
``round6(x) = floor(x*1e6 + 0.5) / 1e6`` — the same expression is emitted
in the oracle SQL (``floor(x*1e6 + 0.5)/1e6``), so both sides perform the
identical IEEE-double operations (no banker's-rounding vs half-away
mismatch).  Sums of float measures that must hash exactly are accumulated
as scaled int64 ("micros") with ``floor(x*1e6+0.5)`` per element, because
float summation order differs between Ray partial aggregation and DuckDB.
"""

from __future__ import annotations

import numpy as np

SCALE = 1e6


def round6(x):
    return np.floor(np.asarray(x, dtype=np.float64) * SCALE + 0.5) / SCALE


def to_micros(x) -> np.ndarray:
    """Per-element exact scaling for order-independent integer summation."""
    return np.floor(np.asarray(x, dtype=np.float64) * SCALE + 0.5).astype(np.int64)


SQL_ROUND6 = "floor({expr} * 1e6 + 0.5) / 1e6"
SQL_MICROS = "CAST(floor({expr} * 1e6 + 0.5) AS BIGINT)"
