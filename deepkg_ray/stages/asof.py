"""As-of and range joins — custom operators Ray Data lacks, built from the
documented composition: bucket by key, sort within the bucket, and run
``pd.merge_asof`` / interval logic inside ``groupby(key).map_groups``
(ray_guide 'As-of / range join' pattern).  Partitioning assumption: all
rows of one key fit one group task (salt the key per convgroup.py when a
key is hot).

The right side (orders) is the small side here and is broadcast into the
group function; for two large sides, co-group via a shared bucket column
instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join_events_orders(events_ds, orders_path: str, *,
                            user_col: str = "user_id",
                            ts_col: str = "ts"):
    """For every event: the latest order of the same customer with
    o_orderdate ≤ event ts (ties on date broken by max orderkey —
    deterministic).  Returns (event_id, user_id, ts, asof_orderkey) with
    asof_orderkey = -1 when no order qualifies."""
    import pyarrow.parquet as pq
    ot = pq.read_table(orders_path,
                       columns=["o_orderkey", "o_custkey", "o_orderdate"])
    odf = ot.to_pandas()
    odf["o_date_us"] = odf["o_orderdate"].astype("datetime64[us]").astype("int64")
    # sort so merge_asof's "last row ≤ ts" = (max date, then max orderkey)
    odf = odf.sort_values(["o_custkey", "o_date_us", "o_orderkey"],
                          kind="stable")
    by_cust = {k: g[["o_date_us", "o_orderkey"]].to_numpy()
               for k, g in odf.groupby("o_custkey", sort=False)}

    def add_us(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"],
            user_col: b[user_col],
            "ts_us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
        })

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        uid = int(g[user_col].iloc[0])
        g = g.sort_values(["ts_us", "event_id"], kind="stable")
        orders = by_cust.get(uid)
        out_key = np.full(len(g), -1, dtype=np.int64)
        if orders is not None:
            dates = orders[:, 0]
            keys = orders[:, 1]
            idx = np.searchsorted(dates, g["ts_us"].to_numpy(), side="right") - 1
            ok = idx >= 0
            out_key[ok] = keys[idx[ok]]
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             user_col: np.full(len(g), uid, np.int64),
                             "ts_us": g["ts_us"].to_numpy(),
                             "asof_orderkey": out_key})

    return (events_ds.select_columns(["event_id", user_col, ts_col])
            .map_batches(add_us, batch_format="pyarrow")
            .groupby(user_col).map_groups(per_user, batch_format="pandas"))


def range_join_counts(events_ds, orders_path: str, *, window_days: int = 7,
                      user_col: str = "user_id", ts_col: str = "ts"):
    """Range join: per event, the count of same-customer orders with
    |o_orderdate − ts| ≤ window_days.  Same bucket+sort composition as the
    as-of join; the window is two searchsorted probes per event."""
    import pyarrow.parquet as pq
    win_us = window_days * 86_400 * 1_000_000
    ot = pq.read_table(orders_path, columns=["o_custkey", "o_orderdate"])
    odf = ot.to_pandas()
    odf["o_date_us"] = odf["o_orderdate"].astype("datetime64[us]").astype("int64")
    odf = odf.sort_values(["o_custkey", "o_date_us"], kind="stable")
    by_cust = {k: g["o_date_us"].to_numpy()
               for k, g in odf.groupby("o_custkey", sort=False)}

    def add_us(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"],
            user_col: b[user_col],
            "ts_us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
        })

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        uid = int(g[user_col].iloc[0])
        dates = by_cust.get(uid)
        ts = g["ts_us"].to_numpy()
        if dates is None:
            n = np.zeros(len(g), np.int64)
        else:
            lo = np.searchsorted(dates, ts - win_us, side="left")
            hi = np.searchsorted(dates, ts + win_us, side="right")
            n = (hi - lo).astype(np.int64)
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "n_orders_in_window": n})

    return (events_ds.select_columns(["event_id", user_col, ts_col])
            .map_batches(add_us, batch_format="pyarrow")
            .groupby(user_col).map_groups(per_user, batch_format="pandas"))
