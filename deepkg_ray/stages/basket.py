"""Market-basket co-occurrence mining: frequent item pairs per basket.

The A-Priori first step (pair supports) expressed Ray-Data-first: basket
pair generation is a vectorized index computation inside user-complete
partitions — never a Python loop over rows or per-basket tasks — and the
unbounded (item, item) pair space is merged with a per-partition
``value_counts`` combiner before the one Ray groupby shuffle, so the
shuffle carries pre-aggregated (pair, n) rows, not one row per occurrence.

Scale notes:
- Pair fan-out is quadratic in basket size.  ``max_basket`` caps it (hot
  baskets are truncated to their ``max_basket`` smallest item ids — a
  deterministic rule an oracle can replicate); the default ``None``
  matches exact semantics for bounded-basket inputs like lineitem (≤13
  distinct parts per order at any TPC-H scale, the schema's own bound).
- The support filter runs batch-side AFTER the merge, so the output is
  support-filtered, not pair-space-sized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _segment_pairs(sorted_items: np.ndarray, seg_starts: np.ndarray,
                   n: int) -> tuple[np.ndarray, np.ndarray]:
    """All within-segment ordered index pairs (i < j), fully vectorized:
    reps[i] = (segment end of i) − i − 1; b = a + 1 + within-offset."""
    bounds = np.concatenate((seg_starts, [n]))
    seg_ends = np.repeat(bounds[1:], np.diff(bounds))
    reps = seg_ends - np.arange(n) - 1
    total = int(reps.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    a_idx = np.repeat(np.arange(n), reps)
    within = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
    return a_idx, a_idx + 1 + within


def frequent_pairs(ds, basket_col: str, item_col: str,
                   min_support: int = 2, max_basket: int | None = None,
                   n_parts: int = 64):
    """(item_a, item_b, n): count of baskets containing both items
    (a < b, items deduped within basket), support-filtered."""

    def add_part(b: pa.Table) -> pa.Table:
        k = np.asarray(b[basket_col].to_numpy(zero_copy_only=False),
                       np.int64)
        return pa.table({
            basket_col: pa.array(k),
            item_col: b[item_col],
            "part": pa.array((k % n_parts).astype(np.int32)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"item_a": pd.Series([], dtype=np.int64),
                              "item_b": pd.Series([], dtype=np.int64),
                              "n": pd.Series([], dtype=np.int64)})
        if not len(g):
            return empty
        df = g[[basket_col, item_col]].drop_duplicates()
        df = df.sort_values([basket_col, item_col], kind="stable")
        baskets = df[basket_col].to_numpy(np.int64)
        items = df[item_col].to_numpy(np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], baskets[1:] != baskets[:-1])))
        if max_basket is not None:
            # keep each basket's max_basket smallest item ids (items are
            # sorted within the basket, so a rank mask suffices)
            rank = np.arange(len(items)) - np.repeat(
                starts, np.diff(np.concatenate((starts, [len(items)]))))
            keep = rank < max_basket
            baskets, items = baskets[keep], items[keep]
            starts = np.flatnonzero(
                np.concatenate(([True], baskets[1:] != baskets[:-1])))
        a_idx, b_idx = _segment_pairs(items, starts, len(items))
        if not len(a_idx):
            return empty
        c = (pd.DataFrame({"item_a": items[a_idx], "item_b": items[b_idx]})
             .value_counts().reset_index(name="n"))
        c["n"] = c["n"].astype(np.int64)
        return c

    from deepkg_ray.stages.treeagg import merge_partials
    parts = (ds.select_columns([basket_col, item_col])
             .map_batches(add_part, batch_format="pyarrow")
             .groupby("part").map_groups(per_partition,
                                         batch_format="pandas"))
    # mode='auto': pair spaces that fit one task merge as a tree (the
    # sort-shuffle costs ~50x the data here); a 100-TB pair space routes
    # itself to the hash shuffle by observed cardinality.
    merged = merge_partials(parts, ["item_a", "item_b"], {"n": "sum"},
                            mode="auto")

    def finish(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(b["n"].to_numpy() >= min_support))

    return merged.map_batches(finish, batch_format="pyarrow")


def pair_lift(ds, basket_col: str, item_col: str, min_support: int = 2,
              top_k: int = 50):
    """Association-rule LIFT for the top co-occurring item pairs:
    lift(a, b) = N·c(ab) / (c(a)·c(b)) with N = distinct baskets,
    c(x) = baskets containing x, c(ab) from frequent_pairs — > 1 means
    genuine affinity, ≈ 1 coincidence.  The numerator/denominator stay
    exact int64 (Python big-ints for the N·c product; HUGEINT in SQL)
    and lift is ONE round6 division.  Margins come from a basket-deduped
    (item → basket count) groupby; N is one scalar; the top-k cut is by
    (n desc, item_a, item_b) for determinism.
    Returns (item_a, item_b, n, lift)."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Count

    from deepkg_ray.functions.numeric import round6

    pairs = frequent_pairs(ds, basket_col, item_col,
                           min_support=min_support)
    pairs = (pairs.sort(["n", "item_a", "item_b"],
                        descending=[True, False, False])
             .limit(top_k).to_pandas())

    def dedup_batch(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            basket_col: b[basket_col].to_numpy(zero_copy_only=False),
            item_col: b[item_col].to_numpy(zero_copy_only=False)})
        g = df.drop_duplicates()
        return pa.Table.from_pandas(g, preserve_index=False)

    bi = (ds.select_columns([basket_col, item_col])
          .map_batches(dedup_batch, batch_format="pyarrow")
          .groupby([basket_col, item_col])
          .aggregate(Count(alias_name="_m")).drop_columns(["_m"])
          .materialize())
    n_baskets = (bi.groupby(basket_col)
                 .aggregate(Count(alias_name="_c")).count())
    margins = (bi.groupby(item_col)
               .aggregate(Count(alias_name="c")).to_pandas())
    c_of = dict(zip(margins[item_col].astype(np.int64),
                    margins["c"].astype(np.int64)))

    n = pairs["n"].to_numpy(np.int64)
    ia = pairs["item_a"].to_numpy(np.int64)
    ib = pairs["item_b"].to_numpy(np.int64)
    lifts = []
    for a, b_, cab in zip(ia, ib, n):
        num = int(n_baskets) * int(cab)          # exact python ints
        den = int(c_of[int(a)]) * int(c_of[int(b_)])
        lifts.append(float(round6(np.asarray([num / den]))[0]))
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "item_a": pa.array(ia, pa.int64()),
        "item_b": pa.array(ib, pa.int64()),
        "n": pa.array(n, pa.int64()),
        "lift": pa.array(np.asarray(lifts, np.float64), pa.float64())}))
