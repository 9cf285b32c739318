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


def micros_matrix(m) -> np.ndarray:
    """Embedding matrix → integer-valued float64 micros.  Every element is
    an integer < 2^53, so dot products over dims ≲ 10^7 are EXACT in double
    regardless of summation order — the property that makes engine cosine
    bitwise-equal to the DuckDB oracle's (list_dot_product sums in a
    different order than numpy's pairwise BLAS reduction; with exact
    integer terms the order stops mattering)."""
    return np.floor(np.asarray(m, dtype=np.float64) * SCALE + 0.5)


def cosine_micros_rows(am: np.ndarray, bm: np.ndarray) -> np.ndarray:
    """Row-wise round6 cosine over aligned micros matrices [n, d] — same op
    chain as cosine_micros / SQL_COSINE, one pair per row."""
    dot = (am * bm).sum(axis=1)
    na = np.sqrt((am * am).sum(axis=1))
    nb = np.sqrt((bm * bm).sum(axis=1))
    return round6(dot / np.maximum(na * nb, 1.0))


def cosine_micros(qm: np.ndarray, mm: np.ndarray) -> np.ndarray:
    """round6 cosine matrix [n_q, n_rows] over micros matrices, computed as
    dot / greatest(|a|*|b|, 1.0) — mirror of SQL_COSINE below, op for op."""
    dot = qm @ mm.T
    qn = np.sqrt((qm * qm).sum(axis=1))
    mn = np.sqrt((mm * mm).sum(axis=1))
    denom = np.maximum(qn[:, None] * mn[None, :], 1.0)
    return round6(dot / denom)


# DuckDB mirror: {a}/{b} are list<float> embedding expressions.  The
# list_transform is the SQL form of micros_matrix; the division/guard/round
# chain matches cosine_micros exactly.
SQL_EMB_MICROS = "list_transform({e}, x -> floor(CAST(x AS DOUBLE) * 1e6 + 0.5))"
SQL_COSINE = ("floor(list_dot_product({a}, {b}) / "
              "greatest(sqrt(list_dot_product({a}, {a})) * "
              "sqrt(list_dot_product({b}, {b})), 1.0) * 1e6 + 0.5) / 1e6")
