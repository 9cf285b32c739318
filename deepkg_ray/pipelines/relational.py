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


def _pricing_micros(sf_dir: str):
    """Finest-level (flag, status) pricing aggregate in exact int64 micros —
    shared by pricing_summary (finish) and pricing_rollup (roll up in micros
    first, divide once, so every level equals SQL's SUM(micros)/1e6)."""
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

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("qty_micros", alias_name="qty_micros"),
                       Sum("price_micros", alias_name="price_micros"),
                       Sum("rev_micros", alias_name="rev_micros"),
                       Count(alias_name="count_order")))


def pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped: per (returnflag, linestatus): sum qty, sum price,
    revenue = Σ extprice*(1-discount), row count."""
    agg = _pricing_micros(sf_dir)

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


def pricing_rollup(sf_dir: str):
    """Multi-level ROLLUP(l_returnflag, l_linestatus) in ONE scan: the
    distributed pass aggregates only the FINEST level (the 6-row
    (flag, status) grid — Ray pre-aggregates per block before the tiny
    shuffle); the coarser levels (per-flag, grand total) are derived from
    those partials in a single final task, because sums/counts are
    associative.  At 100 TB the input is read once and nothing beyond the
    finest-level partials ever moves.  Sentinel 'ALL' marks rolled-up
    dimensions (COALESCE form in the SQL oracle).  The roll-up happens in
    exact int64 micros and divides once at the end, so every level equals
    the oracle's SUM(micros)/1e6 bit for bit."""
    fine = _pricing_micros(sf_dir)
    sums = ["qty_micros", "price_micros", "rev_micros", "count_order"]

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        lv1 = (df.groupby("l_returnflag", as_index=False)[sums].sum()
               .assign(l_linestatus="ALL"))
        lv0 = df[sums].sum().to_frame().T.assign(
            l_returnflag="ALL", l_linestatus="ALL")
        out = pd.concat([df, lv1, lv0], ignore_index=True)
        return pd.DataFrame({
            "l_returnflag": out["l_returnflag"].astype(str),
            "l_linestatus": out["l_linestatus"].astype(str),
            "sum_qty": out["qty_micros"].to_numpy(np.float64) / 1e6,
            "sum_base_price": out["price_micros"].to_numpy(np.float64) / 1e6,
            "sum_revenue": out["rev_micros"].to_numpy(np.float64) / 1e6,
            "count_order": out["count_order"].astype(np.int64),
        })

    return fine.repartition(1).map_batches(
        rollup, batch_format="pandas", batch_size=None)


def nation_revenue(sf_dir: str):
    """TPC-H Q5-shaped star join: lineitem ⨝ orders ⨝ customer ⨝ nation →
    revenue per nation.  Join strategy tiered by side size: lineitem is
    pre-aggregated to (orderkey, rev_micros) BEFORE any join (combiner
    first — the join input shrinks from line-items to orders), the two
    big-side joins (→orders, →customer) run on Ray's native
    hash-partitioned Dataset.join, and the 25-row nation dimension is a
    driver-broadcast dict — the one genuinely-small side never shuffles.
    Returns (n_name, revenue, n_orders)."""
    import pyarrow.parquet as pq

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        ext = np.asarray(b["l_extendedprice"].to_pylist(), np.float64)
        disc = np.asarray(b["l_discount"].to_pylist(), np.float64)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "rev_micros": pa.array(to_micros(ext * (1.0 - disc)),
                                                pa.int64())})

    per_order = (li.map_batches(partial, batch_format="pyarrow")
                 .groupby("l_orderkey")
                 .aggregate(Sum("rev_micros", alias_name="rev_micros")))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    j1 = per_order.join(orders, join_type="inner", num_partitions=8,
                        on=("l_orderkey",), right_on=("o_orderkey",))
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    j2 = j1.join(cust, join_type="inner", num_partitions=8,
                 on=("o_custkey",), right_on=("c_custkey",))

    nt = pq.read_table(f"{sf_dir}/nation.parquet",
                       columns=["n_nationkey", "n_name"])
    names = dict(zip(nt["n_nationkey"].to_pylist(), nt["n_name"].to_pylist()))

    def attach(b: pa.Table) -> pa.Table:
        # .get + filter = inner-join semantics on a dangling nationkey
        # (the SQL oracle's inner join drops the row; so do we)
        nk = b["c_nationkey"].to_pylist()
        name_col = [names.get(k) for k in nk]
        t = pa.table({
            "n_name": pa.array(name_col, pa.string()),
            "rev_micros": b["rev_micros"]})
        return t.filter(pc.is_valid(t["n_name"]))

    agg = (j2.map_batches(attach, batch_format="pyarrow")
           .groupby("n_name")
           .aggregate(Sum("rev_micros", alias_name="rev_micros"),
                      Count(alias_name="n_orders")))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": b["n_name"],
            "revenue": pa.array(
                np.asarray(b["rev_micros"].to_pylist(), np.float64) / 1e6),
            "n_orders": b["n_orders"].combine_chunks().cast(pa.int64())})
    return agg.map_batches(finish, batch_format="pyarrow")


def pricing_cube(sf_dir: str):
    """CUBE(l_returnflag, l_linestatus) — all four grouping sets — derived
    from the SAME one-scan finest-level aggregate as pricing_rollup: the
    distributed pass produces only the (flag, status) grid partials, and
    the per-flag, per-status and grand-total levels are folded from those
    in a single final task (sums/counts are associative).  At 100 TB this
    reads the input once and shuffles a 6-row grid; the extra grouping
    set costs nothing more than ROLLUP did.  Sentinel 'ALL' marks
    cubed-away dimensions; micros-exact at every level."""
    fine = _pricing_micros(sf_dir)
    sums = ["qty_micros", "price_micros", "rev_micros", "count_order"]

    def cube(df: pd.DataFrame) -> pd.DataFrame:
        by_flag = (df.groupby("l_returnflag", as_index=False)[sums].sum()
                   .assign(l_linestatus="ALL"))
        by_status = (df.groupby("l_linestatus", as_index=False)[sums].sum()
                     .assign(l_returnflag="ALL"))
        total = df[sums].sum().to_frame().T.assign(
            l_returnflag="ALL", l_linestatus="ALL")
        out = pd.concat([df, by_flag, by_status, total], ignore_index=True)
        return pd.DataFrame({
            "l_returnflag": out["l_returnflag"].astype(str),
            "l_linestatus": out["l_linestatus"].astype(str),
            "sum_qty": out["qty_micros"].to_numpy(np.float64) / 1e6,
            "sum_base_price": out["price_micros"].to_numpy(np.float64) / 1e6,
            "sum_revenue": out["rev_micros"].to_numpy(np.float64) / 1e6,
            "count_order": out["count_order"].astype(np.int64),
        })

    return fine.repartition(1).map_batches(
        cube, batch_format="pandas", batch_size=None)


def column_profile(sf_dir: str,
                   columns=("l_quantity", "l_extendedprice",
                            "l_discount", "l_tax")):
    """Single-pass data-profiling operator: per numeric column, row count,
    null count, min, max and micros-exact mean — the schema-health summary
    every ingest pipeline runs before training-data jobs.  One scan emits
    len(columns) partial rows per block (count/nullcount/min/max/sum are
    all mergeable), so the shuffle is bounded by columns × blocks, never
    row-shaped.  Returns (column, n, n_null, min_v, max_v, mean_v); a
    column that is entirely NULL keeps its n_null and reports
    min/max/mean as NULL (matching SQL min/count semantics)."""
    from ray.data.aggregate import Max, Min

    cols = list(columns)
    _MN_SENTINEL = 1 << 62  # Min/Max identity for fully-null partials
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)

    def partial(b: pa.Table) -> pa.Table:
        names, ns, nulls, mns, mxs, ss = [], [], [], [], [], []
        for c in cols:
            col = b[c]
            vals = col.drop_null()
            n = len(vals)
            names.append(c)
            ns.append(n)
            nulls.append(len(col) - n)
            if n == 0:
                # fully-null block: still contributes its null count; the
                # min/max sentinels are identities for Min/Max merges
                mns.append(_MN_SENTINEL)
                mxs.append(-_MN_SENTINEL)
                ss.append(0)
                continue
            m = np.asarray(to_micros(vals.to_pylist()), np.int64)
            mns.append(int(m.min()))
            mxs.append(int(m.max()))
            ss.append(int(m.sum()))
        return pa.table({
            "column": pa.array(names, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "n_null": pa.array(nulls, pa.int64()),
            "mn": pa.array(mns, pa.int64()),
            "mx": pa.array(mxs, pa.int64()),
            "s": pa.array(ss, pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("column")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("n_null", alias_name="n_null"),
                      Min("mn", alias_name="mn"),
                      Max("mx", alias_name="mx"),
                      Sum("s", alias_name="s")))

    def finish(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n"].to_pylist(), np.float64)
        s = np.asarray(b["s"].to_pylist(), np.float64)
        nz = n > 0
        null_mask = ~nz  # fully-null column → NULL stats, like SQL min/avg
        min_v = np.asarray(b["mn"].to_pylist(), np.float64) / 1e6
        max_v = np.asarray(b["mx"].to_pylist(), np.float64) / 1e6
        mean_v = np.floor(s / np.where(nz, n, 1.0) + 0.5) / 1e6
        return pa.table({
            "column": b["column"],
            "n": b["n"], "n_null": b["n_null"],
            "min_v": pa.array(min_v, pa.float64(), mask=null_mask),
            "max_v": pa.array(max_v, pa.float64(), mask=null_mask),
            "mean_v": pa.array(mean_v, pa.float64(), mask=null_mask),
        })
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


def segment_revenue_share(sf_dir: str):
    """Ratio-to-group window primitive: each order's share of its market
    segment's total revenue — share = round6(order_total / segment_total).
    Two-pass broadcast plan (no per-segment shuffle of order rows): the
    5-row segment-total aggregate is computed once and carried into a
    stateless scoring map; totals stay int64 micros so the share division
    is the only float op, mirrored exactly in SQL.
    Returns (o_orderkey, c_mktsegment, revenue, share)."""
    import ray.data as rd

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]).to_pandas()
    seg_of = dict(zip(cust["c_custkey"].astype("int64"),
                      cust["c_mktsegment"]))

    def attach(b: pa.Table) -> pa.Table:
        # inner-join semantics: a dangling custkey drops the order (the
        # SQL oracle joins customer inner), never KeyErrors
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        seg = [seg_of.get(int(k)) for k in ck]
        price = np.asarray(b["o_totalprice"].to_pylist(), np.float64)
        t = pa.table({
            "o_orderkey": b["o_orderkey"].combine_chunks().cast(pa.int64()),
            "c_mktsegment": pa.array(seg, pa.string()),
            "rev_micros": pa.array(to_micros(price), pa.int64()),
        })
        return t.filter(pc.is_valid(t["c_mktsegment"]))

    tagged = orders.map_batches(attach, batch_format="pyarrow").materialize()
    totals = {r["c_mktsegment"]: int(r["t"]) for r in
              tagged.groupby("c_mktsegment")
              .aggregate(Sum("rev_micros", alias_name="t")).take_all()}

    def score(b: pa.Table) -> pa.Table:
        segs = b["c_mktsegment"].to_pylist()
        rm = b["rev_micros"].to_numpy(zero_copy_only=False).astype(np.float64)
        tot = np.fromiter((totals[s] for s in segs), np.float64, len(segs))
        share = np.floor(rm / tot * 1e6 + 0.5) / 1e6
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "c_mktsegment": b["c_mktsegment"],
            "revenue": pa.array(rm / 1e6, pa.float64()),
            "share": pa.array(share, pa.float64()),
        })

    return tagged.map_batches(score, batch_format="pyarrow")


def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = "1998-06-01", k: int = 10):
    """TPC-H Q3-shaped shipping-priority pipeline: revenue of not-yet-
    shipped lineitems for a market segment's pre-cutoff orders, top-k.

    Plan shape (the Q3 playbook at scale): every side is FILTERED AND
    PROJECTED in the first map over its read (at 100 TB these predicates
    belong in the parquet row-group filter; the vectorized batch filter is
    the same contract), lineitem is pre-aggregated to (orderkey, micros)
    BEFORE any join, both joins are hash-partitioned Dataset.join on the
    already-shrunk sides, and the global top-k sorts only the aggregated
    order-level table (top_revenue_orders' deterministic (-rev, key)
    order).  Returns (l_orderkey, revenue, o_orderdate_us,
    o_orderpriority)."""
    from deepkg_ray.util import join_partitions
    nparts = join_partitions()
    cutoff_us = int(pd.Timestamp(cutoff).value // 1_000)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])

    def li_partial(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = ship > cutoff_us
        ext = np.asarray(b["l_extendedprice"].to_pylist(), np.float64)[keep]
        disc = np.asarray(b["l_discount"].to_pylist(), np.float64)[keep]
        return pa.table({
            "l_orderkey": pa.array(
                b["l_orderkey"].to_numpy(zero_copy_only=False)[keep]),
            "rev_micros": pa.array(to_micros(ext * (1.0 - disc)),
                                   pa.int64())})

    per_order = (li.map_batches(li_partial, batch_format="pyarrow")
                 .groupby("l_orderkey")
                 .aggregate(Sum("rev_micros", alias_name="rev_micros")))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_orderpriority"])

    def ord_filter(b: pa.Table) -> pa.Table:
        od = b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({"o_orderkey": b["o_orderkey"],
                      "o_custkey": b["o_custkey"],
                      "o_orderdate_us": od,
                      "o_orderpriority": b["o_orderpriority"]})
        return t.filter(pc.less(t["o_orderdate_us"], cutoff_us))

    ords = orders.map_batches(ord_filter, batch_format="pyarrow")

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])

    def cust_filter(b: pa.Table) -> pa.Table:
        t = pa.table({"c_custkey": b["c_custkey"],
                      "c_mktsegment": b["c_mktsegment"]})
        return t.filter(pc.equal(t["c_mktsegment"], segment)) \
            .drop_columns(["c_mktsegment"])

    custs = cust.map_batches(cust_filter, batch_format="pyarrow")

    from deepkg_ray.util import drop_empty_blocks
    j1 = drop_empty_blocks(ords).join(
        drop_empty_blocks(custs), join_type="inner",
        num_partitions=nparts, on=("o_custkey",), right_on=("c_custkey",))
    j2 = drop_empty_blocks(per_order).join(
        drop_empty_blocks(j1), join_type="inner",
        num_partitions=nparts, on=("l_orderkey",), right_on=("o_orderkey",))

    topk = (j2.map_batches(
        lambda b: b.append_column(
            "neg", pc.negate(b["rev_micros"].combine_chunks())),
        batch_format="pyarrow")
        .sort(["neg", "l_orderkey"]).limit(k))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "revenue": pa.array(
                np.asarray(b["rev_micros"].to_pylist(), np.float64) / 1e6),
            "o_orderdate_us": b["o_orderdate_us"],
            "o_orderpriority": b["o_orderpriority"]})
    return topk.map_batches(finish, batch_format="pyarrow")
