"""Generic relational operators over the testdata star schema — the engine's
groupby-aggregate / broadcast-join / sort-limit primitives demonstrated on
lineitem/orders/customer (the same primitives the KG pipeline composes).

Float measures are summed as scaled int64 (functions/numeric.py) so results
hash identically to the DuckDB oracle regardless of accumulation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum

from deepkg_ray.functions.numeric import to_micros


def pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped: per (returnflag, linestatus): sum qty, sum price,
    revenue = Σ extprice*(1-discount), row count."""
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus", "l_quantity",
                                  "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        ext = np.asarray(b["l_extendedprice"].to_pylist(), np.float64)
        disc = np.asarray(b["l_discount"].to_pylist(), np.float64)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "qty_micros": pa.array(to_micros(b["l_quantity"].to_pylist()), pa.int64()),
            "price_micros": pa.array(to_micros(ext), pa.int64()),
            "rev_micros": pa.array(to_micros(ext * (1.0 - disc)), pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("qty_micros", alias_name="qty_micros"),
                      Sum("price_micros", alias_name="price_micros"),
                      Sum("rev_micros", alias_name="rev_micros"),
                      Count(alias_name="count_order")))

    def finish(b: pa.Table) -> pa.Table:
        out = pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "sum_qty": pa.array(np.asarray(b["qty_micros"].to_pylist(), np.float64) / 1e6),
            "sum_base_price": pa.array(np.asarray(b["price_micros"].to_pylist(), np.float64) / 1e6),
            "sum_revenue": pa.array(np.asarray(b["rev_micros"].to_pylist(), np.float64) / 1e6),
            "count_order": b["count_order"].combine_chunks().cast(pa.int64()),
        })
        return out
    return agg.map_batches(finish, batch_format="pyarrow")


def top_revenue_orders(sf_dir: str, k: int = 10):
    """Global top-k: revenue per order, sort desc (tie-break orderkey asc),
    limit k.  Revenue summed as micros; the final sort/limit runs on the
    small aggregated table."""
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        ext = np.asarray(b["l_extendedprice"].to_pylist(), np.float64)
        disc = np.asarray(b["l_discount"].to_pylist(), np.float64)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "rev_micros": pa.array(to_micros(ext * (1.0 - disc)),
                                                pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("l_orderkey")
           .aggregate(Sum("rev_micros", alias_name="rev_micros")))
    # deterministic top-k: sort by (-rev, orderkey)
    topk = (agg.map_batches(
        lambda b: b.append_column("neg", pc.negate(b["rev_micros"].combine_chunks())),
        batch_format="pyarrow")
        .sort(["neg", "l_orderkey"]).limit(k))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "revenue": pa.array(np.asarray(b["rev_micros"].to_pylist(),
                                           np.float64) / 1e6),
        })
    return topk.map_batches(finish, batch_format="pyarrow")


class _SegmentLookup:
    """Broadcast small-side hash join: customer (small) joined into orders
    batches via a dict built once per actor — no shuffle (SURVEY.md §2.4)."""

    def __init__(self, customer_path: str):
        import pyarrow.parquet as pq
        t = pq.read_table(customer_path, columns=["c_custkey", "c_mktsegment"])
        self.seg = dict(zip(t["c_custkey"].to_pylist(),
                            t["c_mktsegment"].to_pylist()))

    def __call__(self, b: pa.Table) -> pa.Table:
        segs = [self.seg.get(k) for k in b["o_custkey"].to_pylist()]
        return b.append_column("c_mktsegment", pa.array(segs, pa.string()))


def segment_revenue(sf_dir: str):
    """Revenue (o_totalprice sum) per customer market segment — broadcast
    join orders→customer then groupby."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    joined = orders.map_batches(
        _SegmentLookup,
        fn_constructor_kwargs={"customer_path": f"{sf_dir}/customer.parquet"},
        batch_format="pyarrow", concurrency=(1, 4))

    def partial(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_mktsegment": b["c_mktsegment"],
            "price_micros": pa.array(to_micros(b["o_totalprice"].to_pylist()),
                                     pa.int64()),
        })
    agg = (joined.map_batches(partial, batch_format="pyarrow")
           .groupby("c_mktsegment")
           .aggregate(Sum("price_micros", alias_name="price_micros"),
                      Count(alias_name="n_orders")))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_mktsegment": b["c_mktsegment"],
            "total_revenue": pa.array(
                np.asarray(b["price_micros"].to_pylist(), np.float64) / 1e6),
            "n_orders": b["n_orders"].combine_chunks().cast(pa.int64()),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


def distinct_event_types(sf_dir: str):
    """unique() demo: distinct event_type values with counts."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
    return ds.groupby("event_type").aggregate(Count(alias_name="n"))
