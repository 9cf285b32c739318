"""Tree-reduction merge of pre-aggregated (partial) rows.

Ray Data's ``groupby().aggregate()`` is a sort-based all-to-all shuffle; for
aggregations whose *partial* output is small (the combiner inside
map_batches already collapsed each batch to one row per key), the shuffle
machinery costs far more than the data movement it performs.  Since the
merges are associative, a repartition + merge tree is exact and avoids the
sort entirely:

    partials (N blocks) → repartition(P) → in-block merge → repartition(1)
    → final merge

Use when the distinct-key space fits in one task's memory (dictionary-sized
results: adjacency edges, per-key stats).  For unbounded key spaces keep
the hash/sort shuffle (``groupby``) — callers choose via ``mode``.

Implementation note: pandas ``groupby().agg({col: fn, ...})`` with mixed
functions takes a slow per-group Python path (~100x slower than the cython
single-function path); the merge below therefore runs one vectorized pass
per aggregation kind — cython groupby-sum for sums, stable-sort +
drop_duplicates for min/max, drop_duplicates for first — and stitches the
results with hash merges.
"""

from __future__ import annotations

import pandas as pd

MERGE_KINDS = {"sum", "min", "max", "first"}


def _merge_frame(df: pd.DataFrame, key_cols: list[str],
                 aggs: dict[str, str]) -> pd.DataFrame:
    sum_cols = [c for c, a in aggs.items() if a == "sum"]
    min_cols = [c for c, a in aggs.items() if a == "min"]
    max_cols = [c for c, a in aggs.items() if a == "max"]
    first_cols = [c for c, a in aggs.items() if a == "first"]

    if sum_cols:
        out = (df.groupby(key_cols, as_index=False, sort=False)[sum_cols]
               .sum())
    else:
        out = df[key_cols].drop_duplicates(key_cols)
    for c in min_cols:
        m = (df[key_cols + [c]]
             .sort_values(key_cols + [c], kind="stable")
             .drop_duplicates(key_cols))
        out = out.merge(m, on=key_cols, how="left", sort=False)
    for c in max_cols:
        m = (df[key_cols + [c]]
             .sort_values(key_cols + [c], ascending=[True] * len(key_cols) + [False],
                          kind="stable")
             .drop_duplicates(key_cols))
        out = out.merge(m, on=key_cols, how="left", sort=False)
    if first_cols:
        f = df[key_cols + first_cols].drop_duplicates(key_cols)
        out = out.merge(f, on=key_cols, how="left", sort=False)
    return out[key_cols + list(aggs)]


def _shuffle_merge(ds, key_cols: list[str], aggs: dict[str, str]):
    """Ray groupby equivalent of the tree merge — the unbounded-key path.
    'first' (exemplar of a key-dependent column) is realized as Min, which
    is a valid exemplar and deterministic."""
    from ray.data.aggregate import Max, Min, Sum
    spec = {"sum": Sum, "min": Min, "max": Max, "first": Min}
    return ds.groupby(key_cols).aggregate(
        *[spec[a](c, alias_name=c) for c, a in aggs.items()])


def merge_partials(ds, key_cols: list[str], aggs: dict[str, str],
                   fanout: int = 8, mode: str = "tree",
                   max_final_rows: int = 2_000_000,
                   decision_out: dict | None = None):
    """Merge partial rows exactly: aggs maps column → sum/min/max/first
    ('first' for columns functionally dependent on the key).

    mode='tree': two-level repartition+merge tree (fanout-way then single
    final) — for key spaces that fit one task.
    mode='shuffle': Ray groupby — for unbounded key spaces.
    mode='auto': run the level-1 merge, then pick by OBSERVED cardinality —
    the level-1 output row count is an upper bound of fanout × distinct
    keys, so `count > max_final_rows` means the single final-merge task
    would not safely hold the keys and the shuffle path is used instead.
    `decision_out` (optional dict) records {'mode', 'est_rows'}."""
    for a in aggs.values():
        assert a in MERGE_KINDS, a

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return _merge_frame(df, key_cols, aggs)

    if mode == "shuffle":
        if decision_out is not None:
            decision_out.update({"mode": "shuffle", "est_rows": None})
        return _shuffle_merge(ds, key_cols, aggs)

    from deepkg_ray.util import tiny_task_cpus
    tc = tiny_task_cpus()
    kw = {"num_cpus": tc} if tc else {}
    if mode == "tree" and fanout == 1:
        # single-barrier fast path: one repartition + one merge — for
        # partials already known tiny (e.g. entity/predicate tables over a
        # materialized dictionary-bounded adjacency) the two-level tree's
        # extra repartition+merge execution is pure fixed cost
        return (ds.repartition(1)
                .map_batches(merge, batch_format="pandas", batch_size=None,
                             **kw))
    mid = (ds.repartition(fanout)
           .map_batches(merge, batch_format="pandas", batch_size=None, **kw))
    if mode == "auto":
        mid = mid.materialize()
        est = mid.count()
        if decision_out is not None:
            decision_out.update(
                {"mode": "shuffle" if est > max_final_rows else "tree",
                 "est_rows": est})
        if est > max_final_rows:
            return _shuffle_merge(mid, key_cols, aggs)
    elif decision_out is not None:
        decision_out.update({"mode": "tree", "est_rows": None})
    return (mid.repartition(1)
            .map_batches(merge, batch_format="pandas", batch_size=None, **kw))
