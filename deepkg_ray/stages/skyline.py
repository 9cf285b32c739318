"""Pareto skyline (2-D): rows not dominated in (minimize, maximize) space.

Skyline is closed under union — skyline(A ∪ B) = skyline(skyline(A) ∪
skyline(B)) — so the distributed plan is a combiner tree, never a global
sort or pairwise join: per-block local skyline (map_batches) → fanout-way
repartition + local skyline → final single-block skyline.  Each level only
ships frontier rows; the frontier of n independent 2-D points is O(log n)
in expectation, and the tree degrades gracefully (never a driver collect)
when the frontier is adversarially large (fully anti-correlated data).

The per-block kernel is one vectorized pass: sort by (min_col asc,
max_col desc), per-price-group maxima via ``np.maximum.reduceat``, then a
row survives iff its max_col equals its group max AND strictly exceeds the
exclusive running max of all strictly-better min_col groups (ties on both
dims are mutually non-dominating and all survive).

Dominance is evaluated on int64 micros (functions/numeric.py) so the
frontier is hash-stable; the SQL oracle's raw-float NOT EXISTS is
equivalent for inputs quantized coarser than 1e-6 (TPC-H prices: 2dp).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deepkg_ray.functions.numeric import round6, to_micros


def _local_skyline(mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """Indices of the 2-D frontier (minimize mn, maximize mx)."""
    order = np.lexsort((-mx, mn))            # mn asc, mx desc
    mn_s, mx_s = mn[order], mx[order]
    starts = np.flatnonzero(np.concatenate(([True], mn_s[1:] != mn_s[:-1])))
    gmax = mx_s[starts]                       # sorted desc within group
    # exclusive prefix max over strictly-smaller-mn groups
    prev = np.concatenate(([np.iinfo(np.int64).min],
                           np.maximum.accumulate(gmax)[:-1]))
    grp = np.cumsum(np.concatenate(([True], mn_s[1:] != mn_s[:-1]))) - 1
    keep = (mx_s == gmax[grp]) & (gmax[grp] > prev[grp])
    return order[keep]


def skyline_2d(ds, key_col: str, min_col: str, max_col: str,
               fanout: int = 8):
    """(key, min_col, max_col) rows on the Pareto frontier: no other row
    is ≤ in min_col AND ≥ in max_col with at least one strict."""

    def to_partial(b: pa.Table) -> pa.Table:
        return pa.table({
            key_col: b[key_col],
            "mn_micros": pa.array(to_micros(b[min_col].to_pylist()),
                                  pa.int64()),
            "mx_micros": pa.array(to_micros(b[max_col].to_pylist()),
                                  pa.int64()),
        })

    def frontier(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        idx = _local_skyline(b["mn_micros"].to_numpy(),
                             b["mx_micros"].to_numpy())
        return b.take(pa.array(np.sort(idx)))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            key_col: b[key_col],
            min_col: pa.array(round6(b["mn_micros"].to_numpy() / 1e6),
                              pa.float64()),
            max_col: pa.array(round6(b["mx_micros"].to_numpy() / 1e6),
                              pa.float64()),
        })

    local = (ds.select_columns([key_col, min_col, max_col])
             .map_batches(to_partial, batch_format="pyarrow")
             .map_batches(frontier, batch_format="pyarrow"))
    # merge levels need block == batch (batch_size=None) so each frontier
    # call sees its whole partition; the top level is the global frontier
    mid = local.repartition(fanout).map_batches(
        frontier, batch_format="pyarrow", batch_size=None)
    top = mid.repartition(1).map_batches(
        frontier, batch_format="pyarrow", batch_size=None)
    return top.map_batches(finish, batch_format="pyarrow")
