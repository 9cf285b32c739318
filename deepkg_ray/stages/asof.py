"""As-of and range joins — custom operators Ray Data lacks, built from the
documented composition: tag each side, union, hash-partition by key, and
run the interval logic inside ``groupby(key).map_groups`` — a true
co-group where BOTH sides stream through the shuffle (ray_guide 'As-of /
range join' pattern).  Neither side is ever driver-materialized or shipped
in a task closure: events and orders are each read as a Dataset, projected
to three int64 columns, and meet only inside the per-key group task.

Partitioning assumption: all rows of one key (events + orders of one
customer) fit one group task — salt the key per convgroup.py when a key is
hot.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _events_side(events_ds, user_col: str, ts_col: str) -> "ray.data.Dataset":
    """events → (key, a=ts_us, b=event_id, side=1)."""
    def prep(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table({
            "key": b[user_col].combine_chunks().cast(pa.int64()),
            "a": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "b": b["event_id"].combine_chunks().cast(pa.int64()),
            "side": pa.array(np.ones(n, np.int8)),
        })
    return (events_ds.select_columns(["event_id", user_col, ts_col])
            .map_batches(prep, batch_format="pyarrow"))


def _orders_side(orders_ds, key_src: str, a_src: str,
                 b_src: str | None) -> "ray.data.Dataset":
    """orders → (key, a=o_date_us, b=o_orderkey|0, side=0)."""
    def prep(b: pa.Table) -> pa.Table:
        n = len(b)
        bcol = (b[b_src].combine_chunks().cast(pa.int64()) if b_src
                else pa.array(np.zeros(n, np.int64)))
        return pa.table({
            "key": b[key_src].combine_chunks().cast(pa.int64()),
            "a": b[a_src].cast(pa.timestamp("us")).cast(pa.int64()),
            "b": bcol,
            "side": pa.array(np.zeros(n, np.int8)),
        })
    cols = [key_src, a_src] + ([b_src] if b_src else [])
    return orders_ds.select_columns(cols).map_batches(
        prep, batch_format="pyarrow")


def asof_join_events_orders(events_ds, orders_path: str, *,
                            user_col: str = "user_id",
                            ts_col: str = "ts"):
    """For every event: the latest order of the same customer with
    o_orderdate ≤ event ts (ties on date broken by max orderkey —
    deterministic).  Returns (event_id, user_id, ts_us, asof_orderkey)
    with asof_orderkey = -1 when no order qualifies."""
    import ray.data as rd

    orders = rd.read_parquet(orders_path,
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])
    both = _events_side(events_ds, user_col, ts_col).union(
        _orders_side(orders, "o_custkey", "o_orderdate", "o_orderkey"))

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        uid = int(g["key"].iloc[0])
        is_ev = g["side"].to_numpy() == 1
        ev = g[is_ev].sort_values(["a", "b"], kind="stable")
        od = g[~is_ev].sort_values(["a", "b"], kind="stable")
        out_key = np.full(len(ev), -1, dtype=np.int64)
        if len(od):
            dates = od["a"].to_numpy()
            keys = od["b"].to_numpy()
            idx = np.searchsorted(dates, ev["a"].to_numpy(), side="right") - 1
            ok = idx >= 0
            out_key[ok] = keys[idx[ok]]
        return pd.DataFrame({"event_id": ev["b"].to_numpy(),
                             user_col: np.full(len(ev), uid, np.int64),
                             "ts_us": ev["a"].to_numpy(),
                             "asof_orderkey": out_key})

    return both.groupby("key").map_groups(per_user, batch_format="pandas")


def range_join_counts(events_ds, orders_path: str, *, window_days: int = 7,
                      user_col: str = "user_id", ts_col: str = "ts"):
    """Range join: per event, the count of same-customer orders with
    |o_orderdate − ts| ≤ window_days.  Same co-group composition as the
    as-of join; the window is two searchsorted probes per event."""
    import ray.data as rd

    win_us = window_days * 86_400 * 1_000_000
    orders = rd.read_parquet(orders_path,
                             columns=["o_custkey", "o_orderdate"])
    both = _events_side(events_ds, user_col, ts_col).union(
        _orders_side(orders, "o_custkey", "o_orderdate", None))

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        is_ev = g["side"].to_numpy() == 1
        ev = g[is_ev]
        dates = np.sort(g[~is_ev]["a"].to_numpy())
        ts = ev["a"].to_numpy()
        if len(dates):
            lo = np.searchsorted(dates, ts - win_us, side="left")
            hi = np.searchsorted(dates, ts + win_us, side="right")
            n = (hi - lo).astype(np.int64)
        else:
            n = np.zeros(len(ev), np.int64)
        return pd.DataFrame({"event_id": ev["b"].to_numpy(),
                             "n_orders_in_window": n})

    return both.groupby("key").map_groups(per_user, batch_format="pandas")
