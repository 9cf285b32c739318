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


def _segmented_orders(sf_dir: str, order_cols: list[str],
                      broadcast_threshold: int):
    """orders with c_mktsegment attached (inner-join semantics: dangling
    custkeys drop), tiered like customer_order_distribution: below the
    threshold customer rides as ONE ray.put sorted-array pair consumed by
    a vectorized searchsorted map (shipped once per node, no per-row dict
    .get loop); above it a native hash join — customer is NOT
    dictionary-sized at the 100-TB design point."""
    from deepkg_ray.util import drop_empty_blocks, join_partitions

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=order_cols)
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    if cust.count() <= broadcast_threshold:
        import ray
        cdf = cust.to_pandas()
        keys = cdf["c_custkey"].to_numpy(np.int64)
        order = np.argsort(keys)
        segs = cdf["c_mktsegment"].to_numpy(object)[order]
        ref = ray.put((keys[order], segs))

        def attach(b: pa.Table) -> pa.Table:
            keys_s, segs_s = ray.get(ref)
            ck = b["o_custkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            pos = np.searchsorted(keys_s, ck)
            pos_c = np.clip(pos, 0, max(len(keys_s) - 1, 0))
            hit = (len(keys_s) > 0) & (keys_s[pos_c] == ck)
            t = b.append_column(
                "c_mktsegment",
                pa.array(np.where(hit, segs_s[pos_c], None), pa.string()))
            return t.filter(pa.array(hit))

        return orders.map_batches(attach, batch_format="pyarrow")

    return drop_empty_blocks(orders).join(
        drop_empty_blocks(cust), join_type="inner",
        num_partitions=join_partitions(),
        on=("o_custkey",), right_on=("c_custkey",))


def segment_revenue(sf_dir: str, broadcast_threshold: int = 2_000_000):
    """Revenue (o_totalprice sum) per customer market segment: tiered
    customer attach (_segmented_orders — broadcast arrays below the
    threshold, native hash join above), then a per-batch combiner over
    the 5-segment domain + tree merge (never a row-shaped groupby)."""
    from deepkg_ray.stages.treeagg import merge_partials

    joined = _segmented_orders(sf_dir, ["o_custkey", "o_totalprice"],
                               broadcast_threshold)

    def cells(b: pa.Table) -> pa.Table:
        import pandas as pd
        g = (pd.DataFrame({
            "c_mktsegment": b["c_mktsegment"].to_pylist(),
            "price_micros": to_micros(b["o_totalprice"].to_pylist())})
            .groupby("c_mktsegment", as_index=False)
            .agg(price_micros=("price_micros", "sum"),
                 n_orders=("price_micros", "size")))
        g["price_micros"] = g["price_micros"].astype("int64")
        g["n_orders"] = g["n_orders"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = merge_partials(joined.map_batches(cells, batch_format="pyarrow"),
                         ["c_mktsegment"],
                         {"price_micros": "sum", "n_orders": "sum"},
                         mode="tree")

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


def segment_revenue_share(sf_dir: str, broadcast_threshold: int = 2_000_000):
    """Ratio-to-group window primitive: each order's share of its market
    segment's total revenue — share = round6(order_total / segment_total).
    Customer attaches through the tiered _segmented_orders (broadcast
    arrays / hash join — inner semantics either way); the 5-row
    segment-total aggregate is computed once and carried into a stateless
    scoring map; totals stay int64 micros so the share division is the
    only float op, mirrored exactly in SQL.
    Returns (o_orderkey, c_mktsegment, revenue, share)."""
    joined = _segmented_orders(sf_dir,
                               ["o_orderkey", "o_custkey", "o_totalprice"],
                               broadcast_threshold)

    def proj(b: pa.Table) -> pa.Table:
        price = np.asarray(b["o_totalprice"].to_pylist(), np.float64)
        return pa.table({
            "o_orderkey": b["o_orderkey"].combine_chunks().cast(pa.int64()),
            "c_mktsegment": b["c_mktsegment"].combine_chunks()
                            .cast(pa.string()),
            "rev_micros": pa.array(to_micros(price), pa.int64()),
        })

    tagged = joined.map_batches(proj, batch_format="pyarrow").materialize()
    from deepkg_ray.util import rows_all
    totals = {r["c_mktsegment"]: int(r["t"]) for r in rows_all(
              tagged.groupby("c_mktsegment")
              .aggregate(Sum("rev_micros", alias_name="t")))}

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
    from deepkg_ray.util import join_partitions, rows_all
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


def order_priority_counts(sf_dir: str):
    """TPC-H Q4-shaped EXISTS semi-join: per order priority, how many orders
    have at least one lineitem shipped AFTER the order date (late-shipped).

    The EXISTS correlated subquery is rewritten as an aggregate semi-join:
    EXISTS(l_shipdate > o_orderdate) ⟺ max(l_shipdate) > o_orderdate, so
    lineitem is reduced to ONE row per orderkey (a Max groupby, combiner-
    first) before the hash join — the join never sees lineitem fan-out, and
    the final groupby is over the 5-value priority dictionary (tree-merge
    sized).  Reference analog: the predicate-driven record filters of
    sel2record (sel2record.py:212-260) lifted to relational shape."""
    from ray.data.aggregate import Max
    from deepkg_ray.util import drop_empty_blocks, join_partitions
    nparts = join_partitions()

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def li_proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "ship_us": b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()),
        })

    max_ship = (li.map_batches(li_proj, batch_format="pyarrow")
                .groupby("l_orderkey")
                .aggregate(Max("ship_us", alias_name="max_ship_us")))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])

    def ord_proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "odate_us": b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()),
            "o_orderpriority": b["o_orderpriority"],
        })

    ords = orders.map_batches(ord_proj, batch_format="pyarrow")
    j = drop_empty_blocks(ords).join(
        drop_empty_blocks(max_ship), join_type="inner",
        num_partitions=nparts, on=("o_orderkey",), right_on=("l_orderkey",))

    late = j.map_batches(
        lambda b: b.filter(pc.greater(b["max_ship_us"], b["odate_us"]))
                   .select(["o_orderpriority"]),
        batch_format="pyarrow")

    agg = late.groupby("o_orderpriority").aggregate(
        Count(alias_name="order_count"))
    return agg.map_batches(
        lambda b: pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "order_count": b["order_count"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow")


def promo_revenue(sf_dir: str, month_start: str = "1997-09-01",
                  month_end: str = "1997-10-01"):
    """TPC-H Q14-shaped promotion-revenue share: 100 × Σ rev over PROMO parts
    / Σ rev over all parts, for lineitems shipped inside one month.

    Scale shape: lineitem is FILTERED at the first map over the read (the
    shipdate predicate belongs in the row-group filter at 100 TB) and
    projected to (l_partkey, rev_micros); part is projected to a boolean
    (p_partkey, is_promo) and hash-joined; the conditional aggregation is a
    per-batch combiner emitting ONE (promo, total) micros row per batch, so
    the global step sums a handful of rows.  Both sums are exact int64
    micros; the single final division is the only float op, mirrored
    verbatim in the SQL oracle."""
    from deepkg_ray.util import drop_empty_blocks, join_partitions
    nparts = join_partitions()
    lo_us = int(pd.Timestamp(month_start).value // 1_000)
    hi_us = int(pd.Timestamp(month_end).value // 1_000)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])

    def li_partial(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = (ship >= lo_us) & (ship < hi_us)
        ext = np.asarray(b["l_extendedprice"].to_pylist(), np.float64)[keep]
        disc = np.asarray(b["l_discount"].to_pylist(), np.float64)[keep]
        return pa.table({
            "l_partkey": pa.array(
                b["l_partkey"].to_numpy(zero_copy_only=False)[keep]),
            "rev_micros": pa.array(to_micros(ext * (1.0 - disc)), pa.int64()),
        })

    lif = li.map_batches(li_partial, batch_format="pyarrow")

    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_type"])

    def part_proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": b["p_partkey"],
            "is_promo": pc.starts_with(b["p_type"], "PROMO"),
        })

    pd_side = parts.map_batches(part_proj, batch_format="pyarrow")
    j = drop_empty_blocks(lif).join(
        drop_empty_blocks(pd_side), join_type="inner",
        num_partitions=nparts, on=("l_partkey",), right_on=("p_partkey",))

    def combine(b: pa.Table) -> pa.Table:
        rev = b["rev_micros"].to_numpy(zero_copy_only=False)
        promo = b["is_promo"].to_numpy(zero_copy_only=False).astype(bool)
        return pa.table({
            "promo_micros": pa.array([int(rev[promo].sum())], pa.int64()),
            "total_micros": pa.array([int(rev.sum())], pa.int64()),
        })

    # the join's hash shuffle emits 0-row blocks that map_batches passes
    # through un-invoked — strip them so every partial block has the
    # (promo_micros, total_micros) schema the Sum sees
    partials = drop_empty_blocks(j).map_batches(combine,
                                                batch_format="pyarrow")
    agg = partials.aggregate(Sum("promo_micros", alias_name="p"),
                             Sum("total_micros", alias_name="t"))
    p, t = int(agg["p"] or 0), int(agg["t"] or 0)
    return pa.table({
        "promo_revenue": pa.array([100.0 * p / t if t else 0.0], pa.float64()),
    })


def large_volume_customers(sf_dir: str, min_qty: float = 300.0,
                           k: int = 100):
    """TPC-H Q18-shaped HAVING-driven semi-join: orders whose total lineitem
    quantity exceeds min_qty, joined back to orders and customer, top-k by
    (o_totalprice desc, orderkey).

    The HAVING clause acts as the semi-join driver: lineitem collapses to
    (orderkey, qty_micros) via a combiner-first Sum groupby, the threshold
    filter shrinks it to the rare heavy orders BEFORE either hash join, so
    both joins move only survivor-sized tables.  Quantity is summed in exact
    int64 micros; the top-k sort key includes orderkey so the LIMIT is
    deterministic."""
    from deepkg_ray.util import drop_empty_blocks, join_partitions
    nparts = join_partitions()
    thresh = int(round(min_qty * 1e6))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])

    def li_partial(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "qty_micros": pa.array(to_micros(b["l_quantity"].to_pylist()),
                                   pa.int64())})

    heavy = (li.map_batches(li_partial, batch_format="pyarrow")
             .groupby("l_orderkey")
             .aggregate(Sum("qty_micros", alias_name="qty_micros"))
             .map_batches(lambda b: b.filter(pc.greater(
                 b["qty_micros"].combine_chunks(), thresh)),
                 batch_format="pyarrow"))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_totalprice"])

    def ord_proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
            "o_orderdate_us": b["o_orderdate"].cast(pa.timestamp("us"))
                                              .cast(pa.int64()),
            "price_micros": pa.array(to_micros(b["o_totalprice"].to_pylist()),
                                     pa.int64())})

    ords = orders.map_batches(ord_proj, batch_format="pyarrow")
    j1 = drop_empty_blocks(heavy).join(
        drop_empty_blocks(ords), join_type="inner",
        num_partitions=nparts, on=("l_orderkey",), right_on=("o_orderkey",))

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    j2 = drop_empty_blocks(j1).join(
        drop_empty_blocks(cust), join_type="inner",
        num_partitions=nparts, on=("o_custkey",), right_on=("c_custkey",))

    topk = (j2.map_batches(
        lambda b: b.append_column(
            "neg_price", pc.negate(b["price_micros"].combine_chunks())),
        batch_format="pyarrow")
        .sort(["neg_price", "l_orderkey"]).limit(k))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_name": b["c_name"],
            "c_custkey": b["o_custkey"],
            "o_orderkey": b["l_orderkey"],
            "o_orderdate_us": b["o_orderdate_us"],
            "o_totalprice": pa.array(
                np.asarray(b["price_micros"].to_pylist(), np.float64) / 1e6),
            "sum_qty": pa.array(
                np.asarray(b["qty_micros"].to_pylist(), np.float64) / 1e6)})
    return topk.map_batches(finish, batch_format="pyarrow")


def part_unpivot(sf_dir: str):
    """UNPIVOT/melt reshape: part's numeric measures (retailprice, size) to
    long form (p_partkey, measure, value) — the inverse of the pivot
    crosstab, as a stateless fully-parallel map (each batch melts locally,
    no shuffle at any scale).  retailprice goes through the shared micros
    round so the double equals SQL's; size is an exact int→double cast."""
    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_retailprice", "p_size"])

    def melt(b: pa.Table) -> pa.Table:
        keys = b["p_partkey"].to_numpy(zero_copy_only=False)
        price = np.asarray(
            to_micros(b["p_retailprice"].to_pylist()), np.int64) / 1e6
        size = b["p_size"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(keys)
        return pa.table({
            "p_partkey": pa.array(np.concatenate([keys, keys])),
            "measure": pa.array(["p_retailprice"] * n + ["p_size"] * n),
            "value": pa.array(np.concatenate([price, size])),
        })

    return ds.map_batches(melt, batch_format="pyarrow")


def customer_order_distribution(sf_dir: str,
                                broadcast_threshold: int = 2_000_000):
    """TPC-H Q13-shaped order-count distribution: for each order count c
    (including 0), how many customers placed exactly c orders.

    Scale shape: orders collapses to ONE row per custkey via a combiner-first
    Count groupby (bounded by |customer|, never |orders|), then a native
    LEFT OUTER hash join against the customer key column preserves the
    zero-order customers; the distribution groupby runs over the tiny
    order-count value domain.  No driver-side materialization at any step.
    Reference analog: the per-conversation record-count rollups of
    sel2record evaluation (evaluation/scorer.py-style counting) lifted to
    relational shape."""
    from deepkg_ray.stages.treeagg import merge_partials
    from deepkg_ray.util import drop_empty_blocks, join_partitions
    nparts = join_partitions()

    def count_partial(b: pa.Table) -> pa.Table:
        keys, cnts = np.unique(
            b["o_custkey"].to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"o_custkey": pa.array(keys.astype(np.int64)),
                         "c_count": pa.array(cnts.astype(np.int64))})

    # per-batch combiner + cardinality-auto merge: tree when custkeys fit
    # one task, hash shuffle when they don't (the 100-TB path)
    per_cust = merge_partials(
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .map_batches(count_partial, batch_format="pyarrow"),
        ["o_custkey"], {"c_count": "sum"}, mode="auto")

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])

    per_cust = per_cust.materialize()
    if per_cust.count() <= broadcast_threshold:
        # bounded tier: the per-custkey count table is customer-bounded —
        # broadcast it as a sorted array and stream CUSTOMER through one
        # stateless lookup map (left-outer semantics: missing key → 0,
        # dangling order custkeys never looked up) — zero join actors
        import ray
        pc_df = per_cust.to_pandas()
        order = np.argsort(pc_df["o_custkey"].to_numpy(np.int64))
        ref = ray.put((pc_df["o_custkey"].to_numpy(np.int64)[order],
                       pc_df["c_count"].to_numpy(np.int64)[order]))

        def lookup_partial(b: pa.Table) -> pa.Table:
            keys, cnts = ray.get(ref)
            ck = b["c_custkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            pos = np.searchsorted(keys, ck)
            pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
            hit = (len(keys) > 0) & (keys[pos_c] == ck)
            cc = np.where(hit, cnts[pos_c], 0)
            vals, n = np.unique(cc, return_counts=True)
            return pa.table({"c_count": pa.array(vals.astype(np.int64)),
                             "custdist": pa.array(n.astype(np.int64))})

        return merge_partials(
            cust.map_batches(lookup_partial, batch_format="pyarrow"),
            ["c_count"], {"custdist": "sum"}, mode="tree")

    j = drop_empty_blocks(cust).join(
        drop_empty_blocks(per_cust), join_type="left_outer",
        num_partitions=nparts, on=("c_custkey",), right_on=("o_custkey",))

    def dist_partial(b: pa.Table) -> pa.Table:
        cc = pc.fill_null(b["c_count"], 0).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(cc, return_counts=True)
        return pa.table({"c_count": pa.array(vals.astype(np.int64)),
                         "custdist": pa.array(cnts.astype(np.int64))})

    # the count-value domain is tiny — combiner + single tree merge, no
    # second hash shuffle
    return merge_partials(
        drop_empty_blocks(j).map_batches(dist_partial,
                                         batch_format="pyarrow"),
        ["c_count"], {"custdist": "sum"}, mode="tree")


def dormant_rich_customers(sf_dir: str, cutoff: str = "2000-01-01"):
    """TPC-H Q22-shaped dormant-account report: customers whose account
    balance exceeds the global average of positive balances but who placed
    no orders on or after ``cutoff``, counted and summed per nation.

    The correlated average is ONE tiny (sum, count) aggregate broadcast as
    two int64 scalars; the comparison acctbal > avg is cleared of division
    (micros·n > sum_micros) so the filter is integer-exact.  The NOT EXISTS
    is a native left_anti hash join against the per-custkey-deduped orders
    side — both sides stream, nothing is driver-loaded (contrast the
    broadcast-Bloom tier in sketches.bloom_anti_join_counts, which this
    engine uses when the member side is dictionary-sized).  totacctbal is
    summed in exact micros; the single /1e6 finish is mirrored in SQL."""
    from deepkg_ray.util import drop_empty_blocks, join_partitions
    nparts = join_partitions()

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b["c_custkey"],
            "c_nationkey": b["c_nationkey"],
            "bal_micros": pa.array(to_micros(b["c_acctbal"].to_pylist()),
                                   pa.int64()),
            "positive": pc.greater(b["c_acctbal"], 0.0),
        })

    projected = cust.map_batches(proj, batch_format="pyarrow")

    def pos_partial(b: pa.Table) -> pa.Table:
        m = b["positive"].to_numpy(zero_copy_only=False).astype(bool)
        bal = b["bal_micros"].to_numpy(zero_copy_only=False)
        return pa.table({"s": pa.array([int(bal[m].sum())], pa.int64()),
                         "n": pa.array([int(m.sum())], pa.int64())})

    avg = (projected.map_batches(pos_partial, batch_format="pyarrow")
           .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n")))
    s, n = int(avg["s"] or 0), int(avg["n"] or 0)

    rich = projected.map_batches(
        lambda b: b.filter(pc.greater(pc.multiply_checked(
            b["bal_micros"], pa.scalar(n, pa.int64())), s))
                   .select(["c_custkey", "c_nationkey", "bal_micros"]),
        batch_format="pyarrow")

    cut_us = int(pd.Timestamp(cutoff).value // 1_000)
    buyers = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_orderdate"])
              .map_batches(lambda b: b.filter(pc.greater_equal(
                  b["o_orderdate"].cast(pa.timestamp("us"))
                                  .cast(pa.int64()), cut_us))
                            .select(["o_custkey"]),
                           batch_format="pyarrow")
              .groupby("o_custkey").aggregate(Count(alias_name="_n"))
              .select_columns(["o_custkey"]))

    dormant = drop_empty_blocks(rich).join(
        drop_empty_blocks(buyers), join_type="left_anti",
        num_partitions=nparts, on=("c_custkey",), right_on=("o_custkey",))

    agg = (drop_empty_blocks(dormant)
           .groupby("c_nationkey")
           .aggregate(Count(alias_name="numcust"),
                      Sum("bal_micros", alias_name="tot_micros")))

    def finish(b: pa.Table) -> pa.Table:
        tot = b["tot_micros"].combine_chunks().cast(pa.int64())
        return pa.table({
            "nationkey": b["c_nationkey"].combine_chunks().cast(pa.int64()),
            "numcust": b["numcust"].combine_chunks().cast(pa.int64()),
            "totacctbal_micros": tot,
            "totacctbal": pa.array(
                tot.to_numpy(zero_copy_only=False).astype(np.float64) / 1e6),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def small_lot_revenue(sf_dir: str, brand: str = "Brand#23"):
    """TPC-H Q17-shaped small-lot revenue: average yearly revenue lost if
    orders below 20% of a part's average order quantity were not filled,
    restricted to one brand.

    The correlated per-part average is division-cleared: l_quantity <
    0.2·avg(qty) ⟺ qty_micros·5·n < sum_qty_micros with per-part (sum, n)
    from a combiner-first groupby — integer-exact, no float threshold.  The
    brand's partkeys are a broadcast frozenset applied AT THE READ side of
    lineitem (row pruning before any shuffle); the per-part stats join then
    moves only brand-filtered rows.  Revenue is summed in exact micros; the
    /7.0/1e6 finish is the one float chain, mirrored in SQL."""
    import ray
    from deepkg_ray.util import drop_empty_blocks, join_partitions
    nparts = join_partitions()

    part_keys = frozenset(
        rd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_brand"])
        .map_batches(lambda b: b.filter(pc.equal(b["p_brand"], brand)),
                     batch_format="pyarrow")
        .to_pandas()["p_partkey"].tolist())
    keys_ref = ray.put(part_keys)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice"])

    def brand_filter(b: pa.Table) -> pa.Table:
        # ray.get on the broadcast ref is a local plasma hit after the
        # first call on each worker — the key set ships ONCE per node,
        # not per task (stateless task, no actor-pool CPU reservation)
        keys = np.sort(np.asarray(list(ray.get(keys_ref)), np.int64))
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        keep = np.isin(pk, keys)
        return pa.table({
            "l_partkey": pa.array(pk[keep]),
            "qm": pa.array(to_micros(
                np.asarray(b["l_quantity"].to_pylist(),
                           np.float64)[keep]), pa.int64()),
            "em": pa.array(to_micros(
                np.asarray(b["l_extendedprice"].to_pylist(),
                           np.float64)[keep]), pa.int64()),
        })

    lif = li.map_batches(brand_filter, batch_format="pyarrow")
    stats = (lif.select_columns(["l_partkey", "qm"])
             .groupby("l_partkey")
             .aggregate(Sum("qm", alias_name="sq"),
                        Count(alias_name="n")))

    j = drop_empty_blocks(lif).join(
        drop_empty_blocks(stats.map_batches(
            lambda b: pa.table({
                "s_partkey": b["l_partkey"],
                "sq": b["sq"].combine_chunks().cast(pa.int64()),
                "n": b["n"].combine_chunks().cast(pa.int64())}),
            batch_format="pyarrow")),
        join_type="inner", num_partitions=nparts,
        on=("l_partkey",), right_on=("s_partkey",))

    def small_partial(b: pa.Table) -> pa.Table:
        qm = b["qm"].to_numpy(zero_copy_only=False)
        em = b["em"].to_numpy(zero_copy_only=False)
        sq = b["sq"].to_numpy(zero_copy_only=False)
        nn = b["n"].to_numpy(zero_copy_only=False)
        keep = qm * 5 * nn < sq
        return pa.table({"t": pa.array([int(em[keep].sum())], pa.int64())})

    agg = (drop_empty_blocks(j)
           .map_batches(small_partial, batch_format="pyarrow")
           .aggregate(Sum("t", alias_name="t")))
    total = int(agg["t"] or 0)
    return pa.table({
        "total_micros": pa.array([total], pa.int64()),
        "avg_yearly": pa.array([float(total) / 7.0 / 1e6], pa.float64()),
    })


def supplier_share_nations(sf_dir: str, pct_twentieths: int = 1):
    """TPC-H Q11-shaped value-concentration report: nations whose suppliers'
    total account balance exceeds a fixed fraction (pct_twentieths/20, i.e.
    5% by default) of the global total.

    The subquery scalar is ONE global Sum broadcast to the filter; the
    HAVING comparison is division-cleared (nation_sum·20 > global_sum·k) so
    it is integer-exact even with negative balances.  The nation dimension
    (25 rows) is a broadcast dict, never shuffled.  Mirrors the
    global-threshold semantics of phrasemine's corpus-frequency pruning
    (extractors.py frequency floor) in relational shape."""
    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_nationkey", "s_acctbal"])

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "s_nationkey": b["s_nationkey"],
            "bal_micros": pa.array(to_micros(b["s_acctbal"].to_pylist()),
                                   pa.int64()),
        })

    projected = sup.map_batches(proj, batch_format="pyarrow")
    per_nation = (projected.groupby("s_nationkey")
                  .aggregate(Sum("bal_micros", alias_name="value_micros")))
    total = int(projected.aggregate(
        Sum("bal_micros", alias_name="t"))["t"] or 0)

    from deepkg_ray.util import rows_all
    names = {int(r["n_nationkey"]): r["n_name"]
             for r in rows_all(
                 rd.read_parquet(f"{sf_dir}/nation.parquet",
                                 columns=["n_nationkey", "n_name"]))}

    def finish(b: pa.Table) -> pa.Table:
        vm = b["value_micros"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        nk = b["s_nationkey"].to_numpy(zero_copy_only=False)
        keep = vm * 20 > total * pct_twentieths
        nk, vm = nk[keep], vm[keep]
        # inner-join semantics on the dim: drop dangling nationkeys
        nm = [names.get(int(k)) for k in nk]
        ok = np.array([x is not None for x in nm], bool)
        return pa.table({
            "nationkey": pa.array(nk[ok].astype(np.int64)),
            "n_name": pa.array([x for x in nm if x is not None]),
            "value_micros": pa.array(vm[ok], pa.int64()),
        })

    return per_nation.map_batches(finish, batch_format="pyarrow")


def returned_item_customers(sf_dir: str, k: int = 20):
    """TPC-H Q10-shaped returned-item loss report: revenue of returned
    lineitems (l_returnflag = 'R') per customer, top-k with the nation name
    attached.

    Scale shape: the returnflag predicate prunes lineitem at the first map
    (row-group filter territory at 100 TB), revenue collapses to ONE row
    per orderkey before the hash join to orders, the per-customer groupby
    is combiner-first, and only the k survivors (plus the 25-row broadcast
    nation dim) reach the driver-side finish.  Revenue in exact micros;
    the deterministic sort key includes custkey.  Returns
    (c_custkey, c_name, n_name, revenue)."""
    import pyarrow.parquet as pq
    from deepkg_ray.util import drop_empty_blocks, join_partitions
    nparts = join_partitions()

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag",
                                  "l_extendedprice", "l_discount"])

    def li_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        ext = np.asarray(b["l_extendedprice"].to_pylist(), np.float64)
        disc = np.asarray(b["l_discount"].to_pylist(), np.float64)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "rev_micros": pa.array(to_micros(ext * (1.0 - disc)),
                                   pa.int64())})

    per_order = (li.map_batches(li_partial, batch_format="pyarrow")
                 .groupby("l_orderkey")
                 .aggregate(Sum("rev_micros", alias_name="rev_micros")))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    j1 = drop_empty_blocks(per_order).join(
        drop_empty_blocks(orders), join_type="inner",
        num_partitions=nparts, on=("l_orderkey",), right_on=("o_orderkey",))

    per_cust = (drop_empty_blocks(j1)
                .groupby("o_custkey")
                .aggregate(Sum("rev_micros", alias_name="rev_micros")))

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name", "c_nationkey"])
    j2 = drop_empty_blocks(per_cust).join(
        drop_empty_blocks(cust), join_type="inner",
        num_partitions=nparts, on=("o_custkey",), right_on=("c_custkey",))

    nt = pq.read_table(f"{sf_dir}/nation.parquet",
                       columns=["n_nationkey", "n_name"])
    names = dict(zip(nt["n_nationkey"].to_pylist(), nt["n_name"].to_pylist()))

    def topk_partial(b: pa.Table) -> pa.Table:
        rev = b["rev_micros"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if len(rev) > k:
            # over-keep ties: every row with rev >= the kth-largest value
            # survives the block cut, so a tied row with a smaller custkey
            # (global order: rev DESC, custkey ASC) is never lost here
            kth = np.partition(rev, len(rev) - k)[len(rev) - k]
            b = b.filter(pa.array(rev >= kth))
        return b

    # per-block partial top-k (combiner) then one tiny driver finish
    parts = (drop_empty_blocks(j2)
             .map_batches(topk_partial, batch_format="pyarrow")
             .to_pandas())
    parts = parts.sort_values(["rev_micros", "o_custkey"],
                              ascending=[False, True]).head(k)
    nm = [names.get(int(x)) for x in parts["c_nationkey"]]
    ok = np.array([x is not None for x in nm], bool)
    parts = parts[ok]
    return pa.table({
        "c_custkey": pa.array(parts["o_custkey"].astype(np.int64)),
        "c_name": pa.array(parts["c_name"].astype(str)),
        "n_name": pa.array([x for x in nm if x is not None]),
        "revenue": pa.array(
            parts["rev_micros"].to_numpy(np.float64) / 1e6, pa.float64()),
    })


def top_supplier_revenue(sf_dir: str, lo: str = "1997-01-01",
                         hi: str = "1997-04-01"):
    """TPC-H Q15-shaped top supplier: revenue per supplier over one
    quarter's shipments, keeping EVERY supplier tied for the maximum
    (Q15's view + max subquery = WITH TIES semantics).

    Scale shape: date filter at the first map, per-suppkey combiner-first
    Sum groupby (bounded by |supplier|), the max is ONE tiny aggregate
    broadcast to an integer-equality filter, and the supplier dim attaches
    via a broadcast dict.  Returns (s_suppkey, s_name, total_revenue)."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Max
    lo_us = int(pd.Timestamp(lo).value // 1_000)
    hi_us = int(pd.Timestamp(hi).value // 1_000)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])

    def li_partial(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = (ship >= lo_us) & (ship < hi_us)
        ext = np.asarray(b["l_extendedprice"].to_pylist(), np.float64)[keep]
        disc = np.asarray(b["l_discount"].to_pylist(), np.float64)[keep]
        return pa.table({
            "l_suppkey": pa.array(
                b["l_suppkey"].to_numpy(zero_copy_only=False)[keep]),
            "rev_micros": pa.array(to_micros(ext * (1.0 - disc)),
                                   pa.int64())})

    per_supp = (li.map_batches(li_partial, batch_format="pyarrow")
                .groupby("l_suppkey")
                .aggregate(Sum("rev_micros", alias_name="rev_micros")))
    mx = int(per_supp.aggregate(Max("rev_micros", alias_name="m"))["m"] or 0)

    st = pq.read_table(f"{sf_dir}/supplier.parquet",
                       columns=["s_suppkey", "s_name"])
    names = dict(zip(st["s_suppkey"].to_pylist(), st["s_name"].to_pylist()))

    def finish(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["rev_micros"].combine_chunks(), mx))
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        nm = [names.get(int(x)) for x in sk]
        ok = np.array([x is not None for x in nm], bool)
        rev = b["rev_micros"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)[ok]
        return pa.table({
            "s_suppkey": pa.array(sk[ok].astype(np.int64)),
            "s_name": pa.array([x for x in nm if x is not None]),
            "total_revenue": pa.array(rev.astype(np.float64) / 1e6),
        })

    return per_supp.map_batches(finish, batch_format="pyarrow")


def brand_supplier_counts(sf_dir: str, exclude_brand: str = "Brand#45"):
    """TPC-H Q16-shaped supplier-diversity report: per (p_brand, p_type),
    how many DISTINCT suppliers shipped that part class (partsupp is
    absent from the synth schema; lineitem's l_suppkey supplies the
    supplier relationship — the same count-distinct-over-join shape).

    Scale shape: lineitem projects to (partkey, suppkey) and dedups
    per-batch BEFORE the join (combiner shrinks the shuffle), the part
    dim join is hash-partitioned, the distinct collapses to a
    (brand, type, suppkey) groupby, and the final count groups over the
    small brand×type grid.  Returns (p_brand, p_type, supplier_cnt)."""
    from deepkg_ray.util import drop_empty_blocks, join_partitions
    nparts = join_partitions()

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])

    def dedup_batch(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        pairs = np.unique(np.stack([pk, sk], axis=1), axis=0)
        return pa.table({"l_partkey": pa.array(pairs[:, 0], pa.int64()),
                         "l_suppkey": pa.array(pairs[:, 1], pa.int64())})

    ps = li.map_batches(dedup_batch, batch_format="pyarrow")

    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_brand", "p_type"])
    parts = parts.map_batches(
        lambda b: b.filter(pc.not_equal(b["p_brand"], exclude_brand)),
        batch_format="pyarrow")

    j = drop_empty_blocks(ps).join(
        drop_empty_blocks(parts), join_type="inner",
        num_partitions=nparts, on=("l_partkey",), right_on=("p_partkey",))

    distinct = (drop_empty_blocks(j)
                .groupby(["p_brand", "p_type", "l_suppkey"])
                .aggregate(Count(alias_name="_m"))
                .drop_columns(["_m"]))
    agg = (distinct.groupby(["p_brand", "p_type"])
           .aggregate(Count(alias_name="supplier_cnt")))
    return agg.map_batches(
        lambda b: pa.table({
            "p_brand": b["p_brand"], "p_type": b["p_type"],
            "supplier_cnt":
                b["supplier_cnt"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow")


def disjunctive_revenue(sf_dir: str):
    """TPC-H Q19-shaped disjunctive-predicate revenue: an OR of three
    (brand, size-range, quantity-range) conjunct groups across the
    lineitem ⨝ part join — the predicate shape that defeats naive
    row-group pruning and must evaluate vectorized per batch.

    Scale shape: part projects to (partkey, brand, size) and joins
    hash-partitioned; the three-arm OR evaluates as numpy masks in one
    pass; the final Sum is a per-batch single-row combiner.  Returns one
    row (n_rows, revenue) in exact micros."""
    from deepkg_ray.util import drop_empty_blocks, join_partitions
    nparts = join_partitions()

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice", "l_discount"])

    def li_proj(b: pa.Table) -> pa.Table:
        ext = np.asarray(b["l_extendedprice"].to_pylist(), np.float64)
        disc = np.asarray(b["l_discount"].to_pylist(), np.float64)
        return pa.table({
            "l_partkey": b["l_partkey"],
            "qty": pa.array(to_micros(b["l_quantity"].to_pylist()),
                            pa.int64()),
            "rev_micros": pa.array(to_micros(ext * (1.0 - disc)),
                                   pa.int64())})

    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_brand", "p_size"])
    j = drop_empty_blocks(
        li.map_batches(li_proj, batch_format="pyarrow")).join(
        drop_empty_blocks(parts), join_type="inner",
        num_partitions=nparts, on=("l_partkey",), right_on=("p_partkey",))

    M = 1_000_000

    def arm_mask(brand, size, qty, b_lo_size, b_hi_size, b_brand,
                 q_lo, q_hi):
        return ((brand == b_brand) & (size >= b_lo_size)
                & (size <= b_hi_size) & (qty >= q_lo * M)
                & (qty <= q_hi * M))

    def combine(b: pa.Table) -> pa.Table:
        brand = np.asarray(b["p_brand"].to_pylist(), object)
        size = b["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = b["qty"].to_numpy(zero_copy_only=False)
        rev = b["rev_micros"].to_numpy(zero_copy_only=False)
        m = (arm_mask(brand, size, qty, 1, 5, "Brand#12", 1, 11)
             | arm_mask(brand, size, qty, 1, 10, "Brand#23", 10, 20)
             | arm_mask(brand, size, qty, 1, 15, "Brand#34", 20, 30))
        return pa.table({
            "n": pa.array([int(m.sum())], pa.int64()),
            "t": pa.array([int(rev[m].sum())], pa.int64())})

    agg = (drop_empty_blocks(j)
           .map_batches(combine, batch_format="pyarrow")
           .aggregate(Sum("n", alias_name="n"), Sum("t", alias_name="t")))
    n, t = int(agg["n"] or 0), int(agg["t"] or 0)
    return pa.table({
        "n_rows": pa.array([n], pa.int64()),
        "revenue": pa.array([float(t) / 1e6], pa.float64())})


def monthly_revenue_growth(sf_dir: str):
    """Month-over-month revenue growth over the orders series — the
    LAG-on-aggregate window shape (aggregate first, window the tiny
    series).  The distributed part is one combiner-first month groupby in
    exact micros; the months table (one row per month of history) is
    driver-finished, where LAG and the single growth division
    growth = round6((rev − prev) / prev) run vectorized.  The first
    month (no LAG predecessor) is excluded, mirroring SQL's NULL-LAG
    drop.  Returns (month_us, rev_micros, prev_micros, growth)."""
    from deepkg_ray.functions.numeric import round6

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        dt = pd.to_datetime(us, unit="us")
        month_us = (dt.to_period("M").to_timestamp().asi8 // 1_000)
        return pa.table({
            "month_us": pa.array(month_us, pa.int64()),
            "rev_micros": pa.array(to_micros(b["o_totalprice"].to_pylist()),
                                   pa.int64())})

    months = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("month_us")
              .aggregate(Sum("rev_micros", alias_name="rev_micros"))
              .to_pandas().sort_values("month_us"))
    rev = months["rev_micros"].to_numpy(np.int64)
    prev = np.concatenate([[0], rev[:-1]])
    out = pd.DataFrame({
        "month_us": months["month_us"].to_numpy(np.int64),
        "rev_micros": rev, "prev_micros": prev})
    out = out.iloc[1:]
    growth = round6((out["rev_micros"].to_numpy(np.int64)
                     - out["prev_micros"].to_numpy(np.int64))
                    .astype(np.float64)
                    / out["prev_micros"].to_numpy(np.int64)
                    .astype(np.float64))
    return pa.table({
        "month_us": pa.array(out["month_us"].to_numpy(np.int64), pa.int64()),
        "rev_micros": pa.array(out["rev_micros"].to_numpy(np.int64),
                               pa.int64()),
        "prev_micros": pa.array(out["prev_micros"].to_numpy(np.int64),
                                pa.int64()),
        "growth": pa.array(growth, pa.float64())})


def part_size_histogram(sf_dir: str, n_bins: int = 10,
                        lo: int = 1, hi: int = 50):
    """Equal-width histogram of p_size over fixed integer bin edges —
    the bincount-combiner reduction (each batch contributes one partial
    histogram row per occupied bin; the merge moves n_bins rows, never
    data).  Bin b covers [lo + b·w, lo + (b+1)·w) with w = (hi−lo+1)/
    n_bins in exact integer arithmetic (b = (v − lo)·n_bins // (hi−lo+1));
    out-of-range values are clipped into the edge bins, mirroring SQL's
    LEAST/GREATEST.  Returns (bucket, lo_edge, n)."""
    from deepkg_ray.stages.treeagg import merge_partials
    span = hi - lo + 1

    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_size"])

    def partial(b: pa.Table) -> pa.Table:
        v = b["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        bk = np.clip((v - lo) * n_bins // span, 0, n_bins - 1)
        vals, cnts = np.unique(bk, return_counts=True)
        return pa.table({"bucket": pa.array(vals.astype(np.int64)),
                         "n": pa.array(cnts.astype(np.int64))})

    hist = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                          ["bucket"], {"n": "sum"}, mode="tree")
    return hist.map_batches(
        lambda b: pa.table({
            "bucket": b["bucket"].combine_chunks().cast(pa.int64()),
            "lo_edge": pa.array(
                lo + b["bucket"].combine_chunks().cast(pa.int64())
                .to_numpy(zero_copy_only=False) * span // n_bins,
                pa.int64()),
            "n": b["n"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow")


def _global_ranks(ds, key_col: str, id_col: str, n_buckets: int = 1024):
    """Exact 0-based global rank of every row under ORDER BY (key, id) —
    the two-phase scan of packing.global_shuffle_positions generalized to
    an arbitrary int64 sort key: order-preserving unsigned bucketing on
    the key's top bits, per-bucket counts fold to exclusive offsets on
    the driver (n_buckets integers, never rows), one bucket groupby sorts
    in-bucket and adds the offset.  Key skew imbalances buckets (a perf
    caveat, never a correctness one).  Returns (id, rank)."""
    import ray
    shift = np.uint64(64 - int(n_buckets).bit_length() + 1)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        key = df[key_col].to_numpy(np.int64)
        u = key.view(np.uint64) ^ np.uint64(1 << 63)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            "_key": key,
            "_bucket": (u >> shift).astype(np.int64)})

    with_key = ds.map_batches(keyed, batch_format="pandas")
    parts = with_key.map_batches(
        lambda df: df.groupby("_bucket", as_index=False).size()
        .rename(columns={"size": "cnt"}),
        batch_format="pandas", batch_size=None).to_pandas()
    if len(parts) == 0:
        return rd.from_pandas(pd.DataFrame({
            id_col: pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64)}))
    sums = parts.groupby("_bucket")["cnt"].sum().sort_index()
    offsets = {int(b): int(v) for b, v in
               zip(sums.index, np.concatenate(([0], np.cumsum(
                   sums.to_numpy(np.int64))[:-1])))}
    offsets_ref = ray.put(offsets)

    def place(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_key", id_col], kind="stable")
        base = ray.get(offsets_ref)[int(df["_bucket"].iloc[0])]
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            "rank": base + np.arange(len(df), dtype=np.int64)})

    return with_key.groupby("_bucket").map_groups(place,
                                                  batch_format="pandas")


def _ntile(rank: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE(k) from 0-based ranks: the first n mod k tiles get one
    extra row (the rank_events rule)."""
    size, rem = divmod(n, k)
    big = rem * (size + 1)
    return np.where(rank < big, rank // max(size + 1, 1),
                    rem + (rank - big) // max(size, 1)) + 1


def rfm_scores(sf_dir: str, k: int = 5,
               broadcast_threshold: int = 2_000_000):
    """RFM customer scoring: per customer the last-order recency, order
    frequency and monetary total, each bucketed into NTILE(k) segments —
    the classic marketing-segmentation scoring, here as three exact
    distributed global ranks (no per-dimension full sort on the driver).

    Plan: ONE combiner-first per-customer aggregate (last_us via Max,
    n_orders via Count, monetary via micros Sum), then three
    _global_ranks passes (two-phase scan; driver holds bucket counts
    only) joined back by custkey through broadcast maps of the
    customer-bounded rank tables.  r_tile ranks by (−last_us, custkey) so
    tile 1 = most recent; f/m rank ascending.  Returns (c_custkey,
    last_us, n_orders, monetary_micros, r_tile, f_tile, m_tile)."""
    import ray
    from ray.data.aggregate import Max

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate",
                                      "o_totalprice"])

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"],
            "last_us": b["o_orderdate"].cast(pa.timestamp("us"))
                        .cast(pa.int64()),
            "tp_micros": pa.array(to_micros(b["o_totalprice"].to_pylist()),
                                  pa.int64())})

    per_cust = (orders.map_batches(proj, batch_format="pyarrow")
                .groupby("o_custkey")
                .aggregate(Max("last_us", alias_name="last_us"),
                           Count(alias_name="n_orders"),
                           Sum("tp_micros", alias_name="monetary_micros"))
                .map_batches(lambda b: pa.table({
                    "o_custkey": b["o_custkey"],
                    "last_us":
                        b["last_us"].combine_chunks().cast(pa.int64()),
                    "n_orders":
                        b["n_orders"].combine_chunks().cast(pa.int64()),
                    "monetary_micros": b["monetary_micros"].combine_chunks()
                        .cast(pa.int64())}), batch_format="pyarrow")
                .materialize())
    n = per_cust.count()

    def key_ds(col, negate=False):
        def mk(b: pa.Table) -> pa.Table:
            v = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "key": pa.array(-v if negate else v, pa.int64()),
                "o_custkey": b["o_custkey"]})
        return per_cust.map_batches(mk, batch_format="pyarrow")

    dims = (("r_tile", "last_us", True),
            ("f_tile", "n_orders", False),
            ("m_tile", "monetary_micros", False))

    def tiled(name, col, neg):
        rk = _global_ranks(key_ds(col, neg), "key", "o_custkey")

        def to_tile(b: pa.Table) -> pa.Table:
            r = b["rank"].to_numpy(zero_copy_only=False)
            return pa.table({
                "o_custkey": b["o_custkey"],
                name: pa.array(_ntile(r, n, k).astype(np.int64),
                               pa.int64())})
        return rk.map_batches(to_tile, batch_format="pyarrow")

    if n <= broadcast_threshold:
        # customer-bounded broadcast tier: three rank tables collect to
        # sorted-array maps (one driver-sized pull each), one stateless
        # attach pass — no joins
        maps = {}
        for name, col, neg in dims:
            t = tiled(name, col, neg).to_pandas()
            order = np.argsort(t["o_custkey"].to_numpy(np.int64))
            maps[name] = ray.put(
                (t["o_custkey"].to_numpy(np.int64)[order],
                 t[name].to_numpy(np.int64)[order]))

        def attach(b: pa.Table) -> pa.Table:
            ck = b["o_custkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            cols = {"c_custkey": pa.array(ck),
                    "last_us": b["last_us"], "n_orders": b["n_orders"],
                    "monetary_micros": b["monetary_micros"]}
            for name in ("r_tile", "f_tile", "m_tile"):
                keys, vals = ray.get(maps[name])
                cols[name] = pa.array(vals[np.searchsorted(keys, ck)],
                                      pa.int64())
            return pa.table(cols)

        return per_cust.map_batches(attach, batch_format="pyarrow")

    # distributed tier: three hash joins back onto the per-customer table
    from deepkg_ray.util import drop_empty_blocks, join_partitions
    nparts = join_partitions()
    out = per_cust.map_batches(
        lambda b: pa.table({
            "c_custkey": b["o_custkey"].combine_chunks().cast(pa.int64()),
            "last_us": b["last_us"], "n_orders": b["n_orders"],
            "monetary_micros": b["monetary_micros"]}),
        batch_format="pyarrow")
    for name, col, neg in dims:
        out = drop_empty_blocks(out).join(
            drop_empty_blocks(tiled(name, col, neg)), join_type="inner",
            num_partitions=nparts, on=("c_custkey",),
            right_on=("o_custkey",))
    return out


def forecast_revenue(sf_dir: str, year: int = 1997,
                     disc_lo: int = 50_000, disc_hi: int = 70_000,
                     max_qty: int = 24):
    """TPC-H Q6-shaped forecasting filter: Σ extendedprice·discount over
    lineitems of one shipdate year with discount in a band and quantity
    below a cap — the pure predicate-pushdown aggregate (every predicate
    belongs in the row-group filter at 100 TB; here one vectorized mask).
    Discount compares in exact micros (disc_lo/hi are micros bounds) so
    no float-literal boundary can flip a row.  Returns one row
    (n_rows, revenue) with revenue = Σ micros/1e6."""
    lo_us = int(pd.Timestamp(f"{year}-01-01").value // 1_000)
    hi_us = int(pd.Timestamp(f"{year + 1}-01-01").value // 1_000)

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_shipdate", "l_discount", "l_quantity",
                                  "l_extendedprice"])

    def combine(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        dm = np.asarray(to_micros(b["l_discount"].to_pylist()), np.int64)
        qm = np.asarray(to_micros(b["l_quantity"].to_pylist()), np.int64)
        ext = np.asarray(b["l_extendedprice"].to_pylist(), np.float64)
        disc = np.asarray(b["l_discount"].to_pylist(), np.float64)
        m = ((ship >= lo_us) & (ship < hi_us)
             & (dm >= disc_lo) & (dm <= disc_hi)
             & (qm < max_qty * 1_000_000))
        rev = to_micros(ext[m] * disc[m])
        return pa.table({"n": pa.array([int(m.sum())], pa.int64()),
                         "t": pa.array([int(rev.sum())], pa.int64())})

    agg = (ds.map_batches(combine, batch_format="pyarrow")
           .aggregate(Sum("n", alias_name="n"), Sum("t", alias_name="t")))
    n, t = int(agg["n"] or 0), int(agg["t"] or 0)
    return pa.table({"n_rows": pa.array([n], pa.int64()),
                     "revenue": pa.array([float(t) / 1e6], pa.float64())})


def nation_market_share(sf_dir: str, nation: str = "NATION_3",
                        region: str = "EUROPE"):
    """TPC-H Q8-shaped market share: per order year, the share of revenue
    (to customers in ``region``) supplied by ``nation``'s suppliers.

    Scale shape: lineitem pre-projects (orderkey, suppkey, rev micros);
    orders contributes (orderkey, custkey, year) through a native hash
    join; customer's regional membership arrives by a second hash join
    against the region-filtered customer keys; the supplier→is-nation flag
    and the nation/region dimensions are driver-broadcast (dimension
    tables — at a fleet scale where supplier outgrows broadcast, swap the
    flag attach for a third hash join).  The share is promo_revenue's
    conditional-aggregation pattern per year: both sums exact int64
    micros, one division each.  Returns (o_year, share, nation_micros,
    total_micros)."""
    import pyarrow.parquet as pq
    from deepkg_ray.util import drop_empty_blocks, join_partitions
    nparts = join_partitions()

    nt = pq.read_table(f"{sf_dir}/nation.parquet")
    rt = pq.read_table(f"{sf_dir}/region.parquet")
    rkey = {int(r["r_regionkey"]): r["r_name"]
            for r in rt.to_pylist()}
    nat_in_region = {int(r["n_nationkey"]) for r in nt.to_pylist()
                     if rkey.get(int(r["n_regionkey"])) == region}
    nation_key = next(int(r["n_nationkey"]) for r in nt.to_pylist()
                      if r["n_name"] == nation)

    st = pq.read_table(f"{sf_dir}/supplier.parquet",
                       columns=["s_suppkey", "s_nationkey"])
    is_nation = {int(k): int(nk) == nation_key
                 for k, nk in zip(st["s_suppkey"].to_pylist(),
                                  st["s_nationkey"].to_pylist())}

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])

    def li_proj(b: pa.Table) -> pa.Table:
        ext = np.asarray(b["l_extendedprice"].to_pylist(), np.float64)
        disc = np.asarray(b["l_discount"].to_pylist(), np.float64)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        flag = np.array([is_nation.get(int(x), False) for x in sk], bool)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "rev_micros": pa.array(to_micros(ext * (1.0 - disc)),
                                   pa.int64()),
            "from_nation": pa.array(flag)})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def ord_proj(b: pa.Table) -> pa.Table:
        dt = pd.to_datetime(
            b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False), unit="us")
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
            "o_year": pa.array(dt.year.to_numpy().astype(np.int64))})

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])

    def cust_filter(b: pa.Table) -> pa.Table:
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False)
        keep = np.array([int(x) in nat_in_region for x in nk], bool)
        return pa.table({"c_custkey": pa.array(
            b["c_custkey"].to_numpy(zero_copy_only=False)[keep])})

    j1 = drop_empty_blocks(li.map_batches(li_proj,
                                          batch_format="pyarrow")).join(
        drop_empty_blocks(orders.map_batches(ord_proj,
                                             batch_format="pyarrow")),
        join_type="inner", num_partitions=nparts,
        on=("l_orderkey",), right_on=("o_orderkey",))
    j2 = drop_empty_blocks(j1).join(
        drop_empty_blocks(cust.map_batches(cust_filter,
                                           batch_format="pyarrow")),
        join_type="inner", num_partitions=nparts,
        on=("o_custkey",), right_on=("c_custkey",))

    def combine(b: pa.Table) -> pa.Table:
        rev = b["rev_micros"].to_numpy(zero_copy_only=False)
        fl = b["from_nation"].to_numpy(zero_copy_only=False).astype(bool)
        yr = b["o_year"].to_numpy(zero_copy_only=False)
        years, inv = np.unique(yr, return_inverse=True)
        nm = np.bincount(inv, weights=np.where(fl, rev, 0)) \
            .astype(np.int64)
        tm = np.bincount(inv, weights=rev.astype(np.float64)) \
            .astype(np.int64)
        return pa.table({"o_year": pa.array(years.astype(np.int64)),
                         "nation_micros": pa.array(nm, pa.int64()),
                         "total_micros": pa.array(tm, pa.int64())})

    from deepkg_ray.stages.treeagg import merge_partials
    agg = merge_partials(
        drop_empty_blocks(j2).map_batches(combine, batch_format="pyarrow"),
        ["o_year"], {"nation_micros": "sum", "total_micros": "sum"},
        mode="tree")

    def finish(b: pa.Table) -> pa.Table:
        nm = b["nation_micros"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        tm = b["total_micros"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "o_year": b["o_year"].combine_chunks().cast(pa.int64()),
            "share": pa.array(nm.astype(np.float64)
                              / tm.astype(np.float64), pa.float64()),
            "nation_micros": pa.array(nm, pa.int64()),
            "total_micros": pa.array(tm, pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def heavy_part_suppliers(sf_dir: str, brand: str = "Brand#12",
                         min_qty: float = 50.0):
    """TPC-H Q20-shaped nested semi-join: suppliers whose total shipped
    quantity of one brand's parts exceeds a threshold, with names
    attached — the have-they-shipped-enough supplier screen.

    The brand partkeys broadcast into the lineitem scan (row pruning at
    the read), the per-supplier Sum groupby is combiner-first and
    supplier-bounded, the threshold compares in exact micros, and the
    supplier dim attaches from a broadcast dict.  Returns
    (s_suppkey, s_name, qty)."""
    import pyarrow.parquet as pq
    import ray
    thresh = int(round(min_qty * 1e6))

    pt = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_brand"])
    keys = np.sort(np.array(
        [int(k) for k, b_ in zip(pt["p_partkey"].to_pylist(),
                                 pt["p_brand"].to_pylist()) if b_ == brand],
        np.int64))
    keys_ref = ray.put(keys)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey", "l_quantity"])

    def li_filter(b: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        keep = np.isin(pk, ks)
        return pa.table({
            "l_suppkey": pa.array(
                b["l_suppkey"].to_numpy(zero_copy_only=False)[keep]),
            "qm": pa.array(to_micros(np.asarray(
                b["l_quantity"].to_pylist(), np.float64)[keep]),
                pa.int64())})

    per_supp = (li.map_batches(li_filter, batch_format="pyarrow")
                .groupby("l_suppkey")
                .aggregate(Sum("qm", alias_name="qm")))

    st = pq.read_table(f"{sf_dir}/supplier.parquet",
                       columns=["s_suppkey", "s_name"])
    names = dict(zip(st["s_suppkey"].to_pylist(), st["s_name"].to_pylist()))

    def finish(b: pa.Table) -> pa.Table:
        qm = b["qm"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        keep = qm > thresh
        sk, qm = sk[keep], qm[keep]
        nm = [names.get(int(x)) for x in sk]
        ok = np.array([x is not None for x in nm], bool)
        return pa.table({
            "s_suppkey": pa.array(sk[ok].astype(np.int64)),
            "s_name": pa.array([x for x in nm if x is not None]),
            "qty": pa.array(qm[ok].astype(np.float64) / 1e6, pa.float64()),
        })

    return per_supp.map_batches(finish, batch_format="pyarrow")


def order_type_diversity(sf_dir: str):
    """Basket diversity: distinct part TYPES per order, as a
    count-of-counts histogram — the cross-sell breadth signal
    (order_line_histogram counts lines; this counts distinct
    categories).  part's (partkey → type) attaches as a broadcast map;
    (order, type) presence dedupes on the merge tree (auto), per-order
    counts fold the same way, and the final histogram is
    type-count-bounded.  Returns (n_types, n_orders)."""
    import ray

    import pyarrow.parquet as pq

    from deepkg_ray.stages.treeagg import merge_partials

    pt = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_type"])
    pk = np.asarray(pt["p_partkey"].to_pylist(), np.int64)
    order = np.argsort(pk)
    dim_ref = ray.put((pk[order],
                       np.asarray(pt["p_type"].to_pylist(),
                                  object)[order]))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    def presence(b: pa.Table) -> pd.DataFrame:
        keys, types = ray.get(dim_ref)
        lp = b["l_partkey"].to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "p_type": types[np.searchsorted(keys, lp)]})
            .drop_duplicates())
        g["one"] = np.int64(1)
        return g

    pres = merge_partials(
        li.map_batches(presence, batch_format="pyarrow"),
        ["l_orderkey", "p_type"], {"one": "first"}, mode="auto")

    per_order = merge_partials(
        pres.map_batches(
            lambda b: pa.table({
                "l_orderkey": b["l_orderkey"].combine_chunks()
                              .cast(pa.int64()),
                "n_types": pa.array(np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["l_orderkey"], {"n_types": "sum"}, mode="auto")

    def hist(b: pa.Table) -> pa.Table:
        vals, cnts = np.unique(
            b["n_types"].to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"n_types": pa.array(vals.astype(np.int64)),
                         "n_orders": pa.array(cnts.astype(np.int64))})

    return merge_partials(
        per_order.map_batches(hist, batch_format="pyarrow"),
        ["n_types"], {"n_orders": "sum"}, mode="tree")


def brand_hhi(sf_dir: str):
    """Brand market concentration per product type: the Herfindahl–
    Hirschman index Σ share² of brand revenue within each p_type —
    the antitrust-style concentration score (HHI → 1: one brand owns
    the category; → 1/n_brands: perfectly split).

    Plan: part's (partkey → type, brand) attaches as a broadcast map
    (the Q9 dim tier); revenue folds per (type, brand) in exact micros
    on the merge tree (type×brand-dictionary-bounded); the HHI finish
    squares in Python big-ints (rm² overflows int64) with ONE double
    division per type.  Returns (p_type, n_brands, total_micros,
    hhi)."""
    import ray

    import pyarrow.parquet as pq

    from deepkg_ray.stages.treeagg import merge_partials

    pt = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_type", "p_brand"])
    pk = np.asarray(pt["p_partkey"].to_pylist(), np.int64)
    order = np.argsort(pk)
    pk = pk[order]
    ptype = np.asarray(pt["p_type"].to_pylist(), object)[order]
    pbrand = np.asarray(pt["p_brand"].to_pylist(), object)[order]
    dim_ref = ray.put((pk, ptype, pbrand))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount"])

    def partial(b: pa.Table) -> pd.DataFrame:
        keys, types, brands = ray.get(dim_ref)
        lp = b["l_partkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, lp)
        ext = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        # per-row revenue micros: the module-wide to_micros(ext·(1−disc))
        rm = np.asarray(to_micros(ext * (1.0 - disc)), np.int64)
        g = (pd.DataFrame({"p_type": types[idx], "p_brand": brands[idx],
                           "rm": rm})
             .groupby(["p_type", "p_brand"], as_index=False, sort=False)
             .sum())
        g["rm"] = g["rm"].astype("int64")
        return g

    cells = merge_partials(
        li.map_batches(partial, batch_format="pyarrow"),
        ["p_type", "p_brand"], {"rm": "sum"}, mode="tree")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in df.groupby("p_type"):
            rm = g["rm"].to_numpy(np.int64)
            tot = int(rm.sum())
            num = int((rm.astype(object) ** 2).sum())
            hhi = float(num) / (float(tot) * float(tot)) if tot else 0.0
            rows.append((t, len(rm), tot, hhi))
        out = pd.DataFrame(rows, columns=["p_type", "n_brands",
                                          "total_micros", "hhi"])
        out["n_brands"] = out["n_brands"].astype("int64")
        out["total_micros"] = out["total_micros"].astype("int64")
        return out

    return cells.repartition(1).map_batches(finish,
                                            batch_format="pandas",
                                            batch_size=None)


def order_line_histogram(sf_dir: str):
    """Order-size distribution: count-of-counts of lineitems per order
    (customer_order_distribution's lineitem-grain sibling; the shape
    planners consult before picking a join side).  Per-order counts
    fold distributed (orderkey groupby, mode='auto'), then the
    histogram cells are count-bounded.  Returns (n_lines, n_orders)."""
    from deepkg_ray.stages.treeagg import merge_partials

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"])

    def partial(b: pa.Table) -> pa.Table:
        vals, cnts = np.unique(
            b["l_orderkey"].to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"l_orderkey": pa.array(vals.astype(np.int64)),
                         "c": pa.array(cnts.astype(np.int64))})

    per_order = merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_orderkey"], {"c": "sum"}, mode="auto")

    def hist(b: pa.Table) -> pa.Table:
        vals, cnts = np.unique(b["c"].to_numpy(zero_copy_only=False),
                               return_counts=True)
        return pa.table({"n_lines": pa.array(vals.astype(np.int64)),
                         "n_orders": pa.array(cnts.astype(np.int64))})

    return merge_partials(
        per_order.map_batches(hist, batch_format="pyarrow"),
        ["n_lines"], {"n_orders": "sum"}, mode="tree")


def revenue_concentration(sf_dir: str):
    """Revenue-concentration audit over per-customer lifetime revenue:
    Gini coefficient plus the top-10% / top-1% customer revenue shares —
    the Lorenz-curve skew diagnostic (an account book where 1% of
    customers carry half the revenue shuffles and samples very
    differently from a flat one).

    Exactness: per-customer micros fold distributed (custkey groupby,
    mode='auto'); the Lorenz statistics run over the per-customer
    revenue VALUE-COUNT histogram (the quantile-family posture), so the
    final task sees distinct revenue values, not customers.  Sorted-form
    integer Gini (source_length_gini's identity); rank-cut top-k is
    tie-invariant because tied values contribute equally either side of
    the cut.  Returns one row (n_customers, total_micros, gini,
    top10_micros, top10_share, top1_micros, top1_share)."""
    from deepkg_ray.stages.treeagg import merge_partials

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pd.DataFrame:
        g = (pd.DataFrame({
            "o_custkey": b["o_custkey"].to_numpy(zero_copy_only=False),
            "rm": np.asarray(to_micros(b["o_totalprice"].to_pylist()),
                             np.int64)})
            .groupby("o_custkey", as_index=False, sort=False).sum())
        g["rm"] = g["rm"].astype("int64")
        return g

    per_cust = merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["o_custkey"], {"rm": "sum"}, mode="auto")

    def hist(b: pa.Table) -> pa.Table:
        vals, cnts = np.unique(
            b["rm"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"rm": pa.array(vals.astype(np.int64)),
                         "cnt": pa.array(cnts.astype(np.int64))})

    h = merge_partials(
        per_cust.map_batches(hist, batch_format="pyarrow"),
        ["rm"], {"cnt": "sum"}, mode="tree")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("rm", kind="stable")
        v = df["rm"].to_numpy(np.int64)
        c = df["cnt"].to_numpy(np.int64)
        n = int(c.sum())
        tot = int((v.astype(object) * c).sum())
        r_start = np.cumsum(c) - c + 1        # first rank of each run
        # exact big-int numerator (n·tot can exceed int64): object dtype
        # keeps every term a Python int, one float conversion at the end
        sum_i_xi = int((v.astype(object)
                        * (c.astype(object) * r_start
                           + c.astype(object) * (c - 1) // 2)).sum())
        gini_num = 2 * sum_i_xi - (n + 1) * tot
        gini = float(gini_num) / (float(n) * float(tot)) if tot else 0.0

        vd, cd = v[::-1], c[::-1]
        ccd = np.cumsum(cd)

        def top_micros(k: int) -> int:
            take = np.clip(k - (ccd - cd), 0, cd)
            return int(np.sum(vd * take))

        k10, k1 = max(n // 10, 1), max(n // 100, 1)
        t10, t1 = top_micros(k10), top_micros(k1)
        return pd.DataFrame({
            "n_customers": pd.array([n], dtype="int64"),
            "total_micros": pd.array([tot], dtype="int64"),
            "gini": [gini],
            "top10_micros": pd.array([t10], dtype="int64"),
            "top10_share": [float(t10) / float(tot) if tot else 0.0],
            "top1_micros": pd.array([t1], dtype="int64"),
            "top1_share": [float(t1) / float(tot) if tot else 0.0]})

    return h.repartition(1).map_batches(finish, batch_format="pandas",
                                        batch_size=None)


def latest_order_per_customer(sf_dir: str):
    """Keep-latest-row-per-key (the SCD-1 compaction / CDC dedup shape):
    per customer, their most recent order row, ties broken by the larger
    orderkey — the per-key argmax as an ASSOCIATIVE combiner: each batch
    reduces to one candidate row per custkey on the packed key
    (date_us·2^20 + orderkey low bits ordering via lexicographic pair
    max), partials merge by the same max, so the reduction tree never
    moves more than |customer| rows.  Returns (o_custkey, o_orderkey,
    last_us, o_totalprice)."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderkey", "o_orderdate",
                                  "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_custkey": b["o_custkey"].to_numpy(zero_copy_only=False),
            "o_orderkey": b["o_orderkey"].to_numpy(zero_copy_only=False),
            "last_us": b["o_orderdate"].cast(pa.timestamp("us"))
                        .cast(pa.int64()).to_numpy(zero_copy_only=False),
            "tp_micros": np.asarray(
                to_micros(b["o_totalprice"].to_pylist()), np.int64),
        })
        df = df.sort_values(["o_custkey", "last_us", "o_orderkey"],
                            kind="stable")
        keep = df.groupby("o_custkey", sort=False).tail(1)
        return pa.Table.from_pandas(keep, preserve_index=False)

    # 'max' over the (last_us, o_orderkey) ORDER is not expressible as
    # independent per-column maxes (a row's fields travel together), so
    # the merge tree reuses the row-wise argmax kernel itself: level-1
    # fan-in, then one final merge whose input is ≤ |customer| candidate
    # rows (the documented key-bounded final-task tier — for open key
    # domains use Max(last_us) + join-back instead)
    parts = ds.map_batches(partial, batch_format="pyarrow")

    def merge_frames(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "last_us", "o_orderkey"],
                            kind="stable")
        return df.groupby("o_custkey", sort=False).tail(1)

    lvl1 = parts.repartition(8).map_batches(
        merge_frames, batch_format="pandas", batch_size=None)
    final = lvl1.repartition(1).map_batches(
        merge_frames, batch_format="pandas", batch_size=None)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": b["o_custkey"].combine_chunks().cast(pa.int64()),
            "o_orderkey": b["o_orderkey"].combine_chunks().cast(pa.int64()),
            "last_us": b["last_us"].combine_chunks().cast(pa.int64()),
            "o_totalprice": pa.array(
                b["tp_micros"].combine_chunks().cast(pa.int64())
                .to_numpy(zero_copy_only=False).astype(np.float64) / 1e6,
                pa.float64())})
    return final.map_batches(finish, batch_format="pyarrow")


def revenue_cohorts(sf_dir: str, broadcast_threshold: int = 2_000_000):
    """Revenue cohort triangle: customers grouped by FIRST-order month
    (the cohort), revenue rolled up by months-since-first (the age) —
    the classic retention/LTV table at revenue grain (events_retention's
    user-count analog, here with exact micros money).

    Plan: first-order month per customer is a combiner-first Min groupby
    (customer-bounded); below the threshold it broadcasts as a sorted
    array into one stateless pass over orders (no join), above it falls
    back to a hash join.  The (cohort, age) grid is months² — tree-merge
    sized.  Returns (cohort_month, age_months, n_orders, rev_micros)."""
    import ray
    from ray.data.aggregate import Min

    from deepkg_ray.stages.treeagg import merge_partials

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate",
                                      "o_totalprice"])

    def proj(b: pa.Table) -> pa.Table:
        us = b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        dt = pd.to_datetime(us, unit="us")
        mnum = (dt.year * 12 + (dt.month - 1)).to_numpy()
        return pa.table({
            "o_custkey": b["o_custkey"],
            "mnum": pa.array(mnum.astype(np.int64), pa.int64()),
            "tpm": pa.array(to_micros(b["o_totalprice"].to_pylist()),
                            pa.int64())})

    op = orders.map_batches(proj, batch_format="pyarrow").materialize()
    first = (op.select_columns(["o_custkey", "mnum"])
             .groupby("o_custkey")
             .aggregate(Min("mnum", alias_name="cohort"))
             .materialize())

    def grid_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "cohort": b["cohort"].to_numpy(zero_copy_only=False),
            "age": b["mnum"].to_numpy(zero_copy_only=False)
                   - b["cohort"].to_numpy(zero_copy_only=False),
            "tpm": b["tpm"].to_numpy(zero_copy_only=False)})
        g = (df.groupby(["cohort", "age"], sort=False)
             .agg(n_orders=("tpm", "size"), rev=("tpm", "sum"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    if first.count() <= broadcast_threshold:
        fd = first.to_pandas()
        order = np.argsort(fd["o_custkey"].to_numpy(np.int64))
        ref = ray.put((fd["o_custkey"].to_numpy(np.int64)[order],
                       fd["cohort"].to_numpy(np.int64)[order]))

        def attach(b: pa.Table) -> pa.Table:
            keys, coh = ray.get(ref)
            ck = b["o_custkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            c = coh[np.searchsorted(keys, ck)]
            return pa.table({"cohort": pa.array(c, pa.int64()),
                             "mnum": b["mnum"], "tpm": b["tpm"]})

        joined = op.map_batches(attach, batch_format="pyarrow")
    else:
        from deepkg_ray.util import drop_empty_blocks, join_partitions
        joined = drop_empty_blocks(op).join(
            drop_empty_blocks(first), join_type="inner",
            num_partitions=join_partitions(), on=("o_custkey",))

    grid = merge_partials(
        joined.map_batches(grid_partial, batch_format="pyarrow"),
        ["cohort", "age"], {"n_orders": "sum", "rev": "sum"}, mode="tree")
    return grid.map_batches(
        lambda b: pa.table({
            "cohort_month": b["cohort"].combine_chunks().cast(pa.int64()),
            "age_months": b["age"].combine_chunks().cast(pa.int64()),
            "n_orders": b["n_orders"].combine_chunks().cast(pa.int64()),
            "rev_micros": b["rev"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow")


def segment_priority_counts(sf_dir: str,
                            broadcast_threshold: int = 2_000_000):
    """Cross-table crosstab: order counts per (market segment, order
    priority) — the dimension-attach crosstab (segment lives on customer,
    priority on orders).  The custkey→segment map is customer-bounded and
    broadcasts as a sorted array below the threshold (hash join above);
    the (segment × priority) grid is tens of cells — combiner + tree
    merge.  Returns (c_mktsegment, o_orderpriority, n)."""
    import ray

    from deepkg_ray.stages.treeagg import merge_partials

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]) \
        .materialize()

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority"])

    if cust.count() <= broadcast_threshold:
        cd = cust.to_pandas()
        order = np.argsort(cd["c_custkey"].to_numpy(np.int64))
        ref = ray.put((cd["c_custkey"].to_numpy(np.int64)[order],
                       cd["c_mktsegment"].to_numpy()[order]))

        def attach(b: pa.Table) -> pa.Table:
            keys, segs = ray.get(ref)
            ck = b["o_custkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            pos = np.searchsorted(keys, ck)
            pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
            hit = (len(keys) > 0) & (keys[pos_c] == ck)
            # inner-join semantics: drop dangling custkeys
            seg = segs[pos_c][hit]
            pri = np.asarray(b["o_orderpriority"].to_pylist(),
                             object)[hit]
            df = pd.DataFrame({"c_mktsegment": seg,
                               "o_orderpriority": pri})
            g = (df.groupby(["c_mktsegment", "o_orderpriority"],
                            sort=False).size().reset_index(name="n"))
            return pa.Table.from_pandas(g, preserve_index=False)

        partials = orders.map_batches(attach, batch_format="pyarrow")
    else:
        from deepkg_ray.util import drop_empty_blocks, join_partitions
        j = drop_empty_blocks(orders).join(
            drop_empty_blocks(cust), join_type="inner",
            num_partitions=join_partitions(),
            on=("o_custkey",), right_on=("c_custkey",))

        def grid(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "c_mktsegment": b["c_mktsegment"].to_pylist(),
                "o_orderpriority": b["o_orderpriority"].to_pylist()})
            g = (df.groupby(["c_mktsegment", "o_orderpriority"],
                            sort=False).size().reset_index(name="n"))
            return pa.Table.from_pandas(g, preserve_index=False)

        partials = drop_empty_blocks(j).map_batches(
            grid, batch_format="pyarrow")

    return merge_partials(partials, ["c_mktsegment", "o_orderpriority"],
                          {"n": "sum"}, mode="tree")


def rollup_segment_priority(sf_dir: str):
    """GROUP BY ROLLUP (segment, priority): leaf cells + per-segment
    subtotals + grand total, with 'ALL' standing in for the rolled-up
    dimension.  The subtotal derivation runs ONCE over the already-merged
    leaf grid (tens of cells — merge_partials ends in a single block), so
    the rollup costs nothing beyond the leaf crosstab's one pass; this is
    the general plan for hierarchy subtotals at any scale (subtotals are
    always derivable from leaves, never re-scan the fact table).
    Returns (c_mktsegment, o_orderpriority, n)."""
    leaf = segment_priority_counts(sf_dir)

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        seg = df.groupby("c_mktsegment", as_index=False)["n"].sum()
        seg["o_orderpriority"] = "ALL"
        total = pd.DataFrame({"c_mktsegment": ["ALL"],
                              "o_orderpriority": ["ALL"],
                              "n": [df["n"].sum()]})
        cols = ["c_mktsegment", "o_orderpriority", "n"]
        out = pd.concat([df[cols], seg[cols], total[cols]],
                        ignore_index=True)
        out["n"] = out["n"].astype("int64")
        return out

    return leaf.map_batches(rollup, batch_format="pandas",
                            batch_size=None)


def shipping_delay_quantiles(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.9)):
    """Order-to-ship latency distribution per order priority: the
    interpolated (type-7) quantiles of whole-day shipping delays — the
    operational-SLA profile (lineitem's shipdate joined back to its
    order's date; delays quantized to integer days so the histogram plan
    is exact).  One hash join, then grouped_quantiles_cont's
    groups × distinct-days bounded histogram.  Returns
    (o_orderpriority, q, value)."""
    from deepkg_ray.stages.quantiles import grouped_quantiles_cont
    from deepkg_ray.util import drop_empty_blocks, join_partitions

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])

    def li_proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "ship_us": b["l_shipdate"].cast(pa.timestamp("us"))
                        .cast(pa.int64())})

    def ord_proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "odate_us": b["o_orderdate"].cast(pa.timestamp("us"))
                         .cast(pa.int64()),
            "o_orderpriority": b["o_orderpriority"]})

    j = drop_empty_blocks(
        li.map_batches(li_proj, batch_format="pyarrow")).join(
        drop_empty_blocks(orders.map_batches(ord_proj,
                                             batch_format="pyarrow")),
        join_type="inner", num_partitions=join_partitions(),
        on=("l_orderkey",), right_on=("o_orderkey",))

    DAY = 86_400_000_000

    def delays(b: pa.Table) -> pa.Table:
        d = (b["ship_us"].to_numpy(zero_copy_only=False)
             - b["odate_us"].to_numpy(zero_copy_only=False)) // DAY
        return pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "delay_days": pa.array(d.astype(np.float64), pa.float64())})

    dd = drop_empty_blocks(j).map_batches(delays, batch_format="pyarrow")
    return grouped_quantiles_cont(dd, "o_orderpriority", "delay_days",
                                  list(qs))


def pricing_charge_summary(sf_dir: str):
    """TPC-H Q1's full measure set completed: per (returnflag, status)
    the CHARGE aggregate Σ price·(1−disc)·(1+tax) alongside avg
    quantities — pricing_summary's missing columns (avg_qty, avg_price,
    avg_disc via floor(sum/n+0.5) micros division).  One combiner pass in
    exact micros, a 6-row grid groupby.  Returns (l_returnflag,
    l_linestatus, sum_charge, avg_qty, avg_price, avg_disc,
    count_order)."""
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus",
                                  "l_quantity", "l_extendedprice",
                                  "l_discount", "l_tax"])

    def partial(b: pa.Table) -> pa.Table:
        ext = np.asarray(b["l_extendedprice"].to_pylist(), np.float64)
        disc = np.asarray(b["l_discount"].to_pylist(), np.float64)
        tax = np.asarray(b["l_tax"].to_pylist(), np.float64)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "qty_micros": pa.array(to_micros(b["l_quantity"].to_pylist()),
                                   pa.int64()),
            "price_micros": pa.array(to_micros(ext), pa.int64()),
            "disc_micros": pa.array(to_micros(disc), pa.int64()),
            "charge_micros": pa.array(
                to_micros(ext * (1.0 - disc) * (1.0 + tax)), pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("qty_micros", alias_name="qm"),
                      Sum("price_micros", alias_name="pm"),
                      Sum("disc_micros", alias_name="dm"),
                      Sum("charge_micros", alias_name="cm"),
                      Count(alias_name="count_order")))

    def finish(b: pa.Table) -> pa.Table:
        n = b["count_order"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        def avg(col):
            s = b[col].combine_chunks().cast(pa.int64()) \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            return np.floor(s / n + 0.5) / 1e6
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "sum_charge": pa.array(
                b["cm"].combine_chunks().cast(pa.int64())
                .to_numpy(zero_copy_only=False).astype(np.float64) / 1e6),
            "avg_qty": pa.array(avg("qm"), pa.float64()),
            "avg_price": pa.array(avg("pm"), pa.float64()),
            "avg_disc": pa.array(avg("dm"), pa.float64()),
            "count_order": b["count_order"].combine_chunks()
                .cast(pa.int64())})
    return agg.map_batches(finish, batch_format="pyarrow")


def _ts_us(s: str) -> int:
    return int(pd.Timestamp(s).value // 1_000)


def _broadcast_i64_map(path: str, key: str, val: str) -> tuple:
    """(sorted keys, values) arrays for a searchsorted broadcast lookup of
    a dimension table — ray.put by the caller."""
    import pyarrow.parquet as pq
    t = pq.read_table(path, columns=[key, val])
    k = np.asarray(t[key].to_pylist(), np.int64)
    v = np.asarray(t[val].to_pylist(), np.int64)
    order = np.argsort(k)
    return k[order], v[order]


def local_supplier_volume(sf_dir: str, region: str = "ASIA",
                          year_start: str = "1996-01-01",
                          year_end: str = "1997-01-01"):
    """TPC-H Q5 proper: revenue per nation for orders placed in one year
    where the CUSTOMER and the LINEITEM'S SUPPLIER sit in the same nation
    of one region.  Plan: lineitem projects to (orderkey, suppkey, rev
    micros); orders filter at the read (date predicate → row-group filter
    at 100 TB) and hash-join; customer hash-joins for c_nationkey; the
    supplier/nation/region dimensions broadcast (supplier is 10k·sf rows —
    the one side that is genuinely dimension-shaped here; swap for a hash
    join if a deployment's supplier table is data-sized).  Returns
    (n_name, revenue)."""
    import ray

    import pyarrow.parquet as pq

    from deepkg_ray.util import drop_empty_blocks, join_partitions
    nparts = join_partitions()
    lo, hi = _ts_us(year_start), _ts_us(year_end)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])

    def li_proj(b: pa.Table) -> pa.Table:
        ext = np.asarray(b["l_extendedprice"].to_pylist(), np.float64)
        disc = np.asarray(b["l_discount"].to_pylist(), np.float64)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "rev_micros": pa.array(to_micros(ext * (1.0 - disc)), pa.int64())})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def o_proj(b: pa.Table) -> pa.Table:
        od = b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = (od >= lo) & (od < hi)
        return pa.table({
            "o_orderkey": pa.array(
                b["o_orderkey"].to_numpy(zero_copy_only=False)[keep]),
            "o_custkey": pa.array(
                b["o_custkey"].to_numpy(zero_copy_only=False)[keep])})

    j1 = drop_empty_blocks(li.map_batches(li_proj, batch_format="pyarrow")) \
        .join(drop_empty_blocks(orders.map_batches(
            o_proj, batch_format="pyarrow")),
            join_type="inner", num_partitions=nparts,
            on=("l_orderkey",), right_on=("o_orderkey",))
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    j2 = drop_empty_blocks(j1).join(
        drop_empty_blocks(cust), join_type="inner", num_partitions=nparts,
        on=("o_custkey",), right_on=("c_custkey",))

    sk, sv = _broadcast_i64_map(f"{sf_dir}/supplier.parquet",
                                "s_suppkey", "s_nationkey")
    supp_ref = ray.put((sk, sv))
    nt = pq.read_table(f"{sf_dir}/nation.parquet")
    rt = pq.read_table(f"{sf_dir}/region.parquet")
    rk = {r: n for r, n in zip(rt["r_regionkey"].to_pylist(),
                               rt["r_name"].to_pylist())}
    nation_name = {k: (n, rk.get(g)) for k, n, g in
                   zip(nt["n_nationkey"].to_pylist(),
                       nt["n_name"].to_pylist(),
                       nt["n_regionkey"].to_pylist())}
    nat_ref = ray.put(nation_name)

    def attach(b: pa.Table) -> pa.Table:
        skeys, svals = ray.get(supp_ref)
        nats = ray.get(nat_ref)
        sup = b["l_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(skeys, sup)
        pos = np.clip(pos, 0, len(skeys) - 1)
        ok = skeys[pos] == sup
        s_nat = np.where(ok, svals[pos], -1)
        c_nat = b["c_nationkey"].to_numpy(zero_copy_only=False)
        keep = ok & (s_nat == c_nat)
        names = []
        for nk in s_nat[keep]:
            n, r = nats.get(int(nk), (None, None))
            names.append(n if r == region else None)
        t = pa.table({
            "n_name": pa.array(names, pa.string()),
            "rev_micros": pa.array(
                b["rev_micros"].to_numpy(zero_copy_only=False)[keep])})
        return t.filter(pc.is_valid(t["n_name"]))

    agg = (drop_empty_blocks(j2).map_batches(attach, batch_format="pyarrow")
           .groupby("n_name").aggregate(Sum("rev_micros", alias_name="rm")))
    return agg.map_batches(
        lambda b: pa.table({
            "n_name": b["n_name"],
            "revenue": pa.array(
                np.asarray(b["rm"].to_pylist(), np.float64) / 1e6)}),
        batch_format="pyarrow")


def volume_shipping(sf_dir: str, nation_a: str = "NATION_3",
                    nation_b: str = "NATION_8",
                    lo: str = "1996-01-01", hi: str = "1998-01-01"):
    """TPC-H Q7 proper: yearly shipping volume between a nation pair —
    (supp_nation, cust_nation, l_year, revenue) for the two directed
    directions, lineitems shipped inside [lo, hi).  Supplier and nation
    broadcast; orders→customer hash-join carries cust nation.  The year is
    extracted from the shipdate in µs (both sides use the same epoch
    arithmetic via year() in SQL / numpy datetime in the engine)."""
    import ray

    import pyarrow.parquet as pq

    from deepkg_ray.util import drop_empty_blocks, join_partitions
    nparts = join_partitions()
    lo_us, hi_us = _ts_us(lo), _ts_us(hi)

    nt = pq.read_table(f"{sf_dir}/nation.parquet",
                       columns=["n_nationkey", "n_name"])
    nat = dict(zip(nt["n_nationkey"].to_pylist(), nt["n_name"].to_pylist()))
    pair = {nation_a, nation_b}
    sk, sv = _broadcast_i64_map(f"{sf_dir}/supplier.parquet",
                                "s_suppkey", "s_nationkey")
    supp_ref = ray.put((sk, sv))
    nat_ref = ray.put(nat)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])

    def li_proj(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = (ship >= lo_us) & (ship < hi_us)
        skeys, svals = ray.get(supp_ref)
        nats = ray.get(nat_ref)
        sup = b["l_suppkey"].to_numpy(zero_copy_only=False)[keep]
        pos = np.clip(np.searchsorted(skeys, sup), 0, len(skeys) - 1)
        ok = skeys[pos] == sup
        s_nat = svals[pos]
        names = np.array([nats.get(int(x), "") for x in s_nat], object)
        keep2 = ok & np.isin(names, list(pair))
        ext = np.asarray(b["l_extendedprice"].to_pylist(), np.float64)[keep]
        disc = np.asarray(b["l_discount"].to_pylist(), np.float64)[keep]
        years = (ship[keep][keep2].astype("datetime64[us]")
                 .astype("datetime64[Y]").astype(np.int64) + 1970)
        return pa.table({
            "l_orderkey": pa.array(
                b["l_orderkey"].to_numpy(zero_copy_only=False)[keep][keep2]),
            "supp_nation": pa.array(names[keep2].astype(str), pa.string()),
            "l_year": pa.array(years, pa.int64()),
            "rev_micros": pa.array(
                to_micros((ext * (1.0 - disc)))[keep2], pa.int64())})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    oj = drop_empty_blocks(orders).join(
        drop_empty_blocks(cust), join_type="inner", num_partitions=nparts,
        on=("o_custkey",), right_on=("c_custkey",))
    j = drop_empty_blocks(
        li.map_batches(li_proj, batch_format="pyarrow")).join(
        drop_empty_blocks(oj), join_type="inner", num_partitions=nparts,
        on=("l_orderkey",), right_on=("o_orderkey",))

    def attach_cust(b: pa.Table) -> pa.Table:
        nats = ray.get(nat_ref)
        c_nat = b["c_nationkey"].to_numpy(zero_copy_only=False)
        cnames = np.array([nats.get(int(x), "") for x in c_nat], object)
        sn = np.asarray(b["supp_nation"].to_pylist(), object)
        keep = ((cnames != sn)
                & np.isin(cnames, list(pair)))
        return pa.table({
            "supp_nation": pa.array(sn[keep].astype(str), pa.string()),
            "cust_nation": pa.array(cnames[keep].astype(str), pa.string()),
            "l_year": pa.array(
                b["l_year"].to_numpy(zero_copy_only=False)[keep]),
            "rev_micros": pa.array(
                b["rev_micros"].to_numpy(zero_copy_only=False)[keep])})

    agg = (drop_empty_blocks(j)
           .map_batches(attach_cust, batch_format="pyarrow")
           .groupby(["supp_nation", "cust_nation", "l_year"])
           .aggregate(Sum("rev_micros", alias_name="rm")))
    return agg.map_batches(
        lambda b: pa.table({
            "supp_nation": b["supp_nation"],
            "cust_nation": b["cust_nation"],
            "l_year": b["l_year"].combine_chunks().cast(pa.int64()),
            "revenue": pa.array(
                np.asarray(b["rm"].to_pylist(), np.float64) / 1e6)}),
        batch_format="pyarrow")


def product_type_profit(sf_dir: str, name_like: str = "gear"):
    """TPC-H Q9 shape (profit by supplier nation × order year for parts
    whose name contains a substring) adapted to this star schema: the
    testdata has no partsupp table, so profit = Σ ext·(1−disc) (the
    supplycost term is dropped; the join/aggregation topology — part
    filter, supplier-nation attach, order-year attach, two-key group — is
    the Q9 plan).  part broadcast as a filtered key set; supplier/nation
    broadcast; orders hash-join for the year."""
    import ray

    import pyarrow.parquet as pq

    from deepkg_ray.util import drop_empty_blocks, join_partitions
    nparts = join_partitions()

    pt = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_name"])
    keep_parts = np.sort(np.asarray(
        [k for k, n in zip(pt["p_partkey"].to_pylist(),
                           pt["p_name"].to_pylist()) if name_like in n],
        np.int64))
    parts_ref = ray.put(keep_parts)
    sk, sv = _broadcast_i64_map(f"{sf_dir}/supplier.parquet",
                                "s_suppkey", "s_nationkey")
    supp_ref = ray.put((sk, sv))
    nt = pq.read_table(f"{sf_dir}/nation.parquet",
                       columns=["n_nationkey", "n_name"])
    nat_ref = ray.put(dict(zip(nt["n_nationkey"].to_pylist(),
                               nt["n_name"].to_pylist())))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])

    def li_proj(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        kp = ray.get(parts_ref)
        pos = np.clip(np.searchsorted(kp, pk), 0, max(len(kp) - 1, 0))
        keep = (kp[pos] == pk) if len(kp) else np.zeros(len(pk), bool)
        skeys, svals = ray.get(supp_ref)
        nats = ray.get(nat_ref)
        sup = b["l_suppkey"].to_numpy(zero_copy_only=False)[keep]
        spos = np.clip(np.searchsorted(skeys, sup), 0, len(skeys) - 1)
        ok = skeys[spos] == sup
        names = np.array([nats.get(int(x), "") for x in svals[spos]], object)
        ext = np.asarray(b["l_extendedprice"].to_pylist(), np.float64)[keep]
        disc = np.asarray(b["l_discount"].to_pylist(), np.float64)[keep]
        return pa.table({
            "l_orderkey": pa.array(
                b["l_orderkey"].to_numpy(zero_copy_only=False)[keep][ok]),
            "nation": pa.array(names[ok].astype(str), pa.string()),
            "rev_micros": pa.array(
                to_micros(ext * (1.0 - disc))[ok], pa.int64())})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])

    def o_proj(b: pa.Table) -> pa.Table:
        od = b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        years = (od.astype("datetime64[us]").astype("datetime64[Y]")
                 .astype(np.int64) + 1970)
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_year": pa.array(years, pa.int64())})

    j = drop_empty_blocks(li.map_batches(li_proj, batch_format="pyarrow")) \
        .join(drop_empty_blocks(orders.map_batches(
            o_proj, batch_format="pyarrow")),
            join_type="inner", num_partitions=nparts,
            on=("l_orderkey",), right_on=("o_orderkey",))
    agg = (drop_empty_blocks(j)
           .groupby(["nation", "o_year"])
           .aggregate(Sum("rev_micros", alias_name="rm")))
    return agg.map_batches(
        lambda b: pa.table({
            "nation": b["nation"],
            "o_year": b["o_year"].combine_chunks().cast(pa.int64()),
            "profit": pa.array(
                np.asarray(b["rm"].to_pylist(), np.float64) / 1e6)}),
        batch_format="pyarrow")


def shipmode_priority_counts(sf_dir: str, delay_days: int = 90):
    """TPC-H Q12 shape adapted (no l_shipmode/receiptdate in this schema):
    lineitems bucket into late/ontime by l_shipdate − o_orderdate ≥
    ``delay_days``, and per bucket count lines on HIGH-priority orders
    (1-URGENT / 2-HIGH) vs the rest — the Q12 CASE-sum over a join.  One
    hash join (lineitem→orders) then a two-key combiner groupby."""
    from deepkg_ray.util import drop_empty_blocks, join_partitions
    nparts = join_partitions()
    delay_us = delay_days * 86_400_000_000

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def li_proj(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "ship_us": ship})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])

    def o_proj(b: pa.Table) -> pa.Table:
        od = b["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        pri = b["o_orderpriority"]
        high = pc.or_(pc.equal(pri, "1-URGENT"), pc.equal(pri, "2-HIGH"))
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "order_us": od,
                         "is_high": high})

    j = drop_empty_blocks(li.map_batches(li_proj, batch_format="pyarrow")) \
        .join(drop_empty_blocks(orders.map_batches(
            o_proj, batch_format="pyarrow")),
            join_type="inner", num_partitions=nparts,
            on=("l_orderkey",), right_on=("o_orderkey",))

    def combine(b: pa.Table) -> pa.Table:
        late = (b["ship_us"].to_numpy(zero_copy_only=False)
                - b["order_us"].to_numpy(zero_copy_only=False)) >= delay_us
        high = b["is_high"].to_numpy(zero_copy_only=False).astype(bool)
        rows = {"bucket": [], "high_count": [], "low_count": []}
        for flag, name in ((late, "late"), (~late, "ontime")):
            rows["bucket"].append(name)
            rows["high_count"].append(int((flag & high).sum()))
            rows["low_count"].append(int((flag & ~high).sum()))
        return pa.table({
            "bucket": pa.array(rows["bucket"], pa.string()),
            "high_count": pa.array(rows["high_count"], pa.int64()),
            "low_count": pa.array(rows["low_count"], pa.int64())})

    agg = (drop_empty_blocks(j).map_batches(combine, batch_format="pyarrow")
           .groupby("bucket")
           .aggregate(Sum("high_count", alias_name="high_count"),
                      Sum("low_count", alias_name="low_count")))
    return agg.map_batches(
        lambda b: pa.table({
            "bucket": b["bucket"],
            "high_count": b["high_count"].combine_chunks().cast(pa.int64()),
            "low_count": b["low_count"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow")


def waiting_suppliers(sf_dir: str, status: str = "F", min_suppliers: int = 2):
    """TPC-H Q21 shape adapted (no receipt/commit dates): for finished
    ('F') orders served by ≥ ``min_suppliers`` distinct suppliers, the
    supplier(s) that UNIQUELY shipped last (their max l_shipdate equals
    the order's max and no other supplier attains it) 'kept the order
    waiting'.  Per-supplier count of such orders.

    Plan: per-(order, supplier) max-shipdate groupby (combiner inside the
    shuffle), then a per-order cogroup resolves the unique-latest
    supplier — both shuffles are ids+timestamps only; supplier names
    attach by broadcast at the end.  Returns (s_name, numwait)."""
    import ray

    import pyarrow.parquet as pq

    from ray.data.aggregate import Max

    from deepkg_ray.util import drop_empty_blocks, join_partitions
    nparts = join_partitions()

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderstatus"])
    okeep = orders.map_batches(
        lambda b: b.filter(pc.equal(b["o_orderstatus"], status))
        .select(["o_orderkey"]), batch_format="pyarrow")

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_shipdate"])

    def li_proj(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"],
                         "ship_us": ship})

    j = drop_empty_blocks(li.map_batches(li_proj, batch_format="pyarrow")) \
        .join(drop_empty_blocks(okeep), join_type="inner",
              num_partitions=nparts, on=("l_orderkey",),
              right_on=("o_orderkey",))

    # per-(order, supplier) latest shipment — int keys, combiner shuffle
    per_os = drop_empty_blocks(j).groupby(["l_orderkey", "l_suppkey"]) \
        .aggregate(Max("ship_us", alias_name="smax"))

    # order-complete COARSE partitions + one vectorized pandas pass per
    # partition (per-order map_groups pays a multi-second fixed cost for
    # thousands of tiny groups — the turn_latency lesson)
    n_parts_c = 64

    def add_part(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "part", pa.array((ok % n_parts_c).astype(np.int32)))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("l_orderkey")
        ns = grp["l_suppkey"].transform("size")     # rows are per-supplier
        m = grp["smax"].transform("max")
        at_max = g["smax"].eq(m)
        n_at_max = at_max.groupby(g["l_orderkey"]).transform("sum")
        keep = (ns >= min_suppliers) & at_max & (n_at_max == 1)
        return g.loc[keep, ["l_suppkey"]]

    waits = (per_os.map_batches(add_part, batch_format="pyarrow")
             .groupby("part").map_groups(per_part, batch_format="pandas"))
    agg = waits.groupby("l_suppkey").aggregate(Count(alias_name="numwait"))

    st = pq.read_table(f"{sf_dir}/supplier.parquet",
                       columns=["s_suppkey", "s_name"])
    names_ref = ray.put(dict(zip(st["s_suppkey"].to_pylist(),
                                 st["s_name"].to_pylist())))

    def attach(b: pa.Table) -> pa.Table:
        nm = ray.get(names_ref)
        keys = b["l_suppkey"].to_pylist()
        return pa.table({
            "s_name": pa.array([nm[k] for k in keys], pa.string()),
            "numwait": b["numwait"].combine_chunks().cast(pa.int64())})

    return agg.map_batches(attach, batch_format="pyarrow")


def cheapest_supplier_per_part(sf_dir: str, region: str = "EUROPE",
                               ptype: str = "SMALL", max_size: int = 10,
                               k: int = 100):
    """TPC-H Q2-shaped correlated-min join — the last playbook shape: for
    parts of one type/size band, every REGION supplier that achieves the
    per-part MINIMUM sale price, decorated and ranked by account balance
    (DeepKg analog: picking the minimum-cost canonical source per entity;
    reference semantics per CoreKnowledgeGraph entity merge).

    Without a partsupp table the supply cost is the lineitem extendedprice
    (exact micros).  Plan: both dims broadcast (part filter as a sorted
    key array, region suppliers as a dict — dims are key-bounded); the
    lineitem scan keeps, per batch, only rows tying the per-part batch
    minimum (an associative argmin-with-ties combiner, deduped on
    (part, supp)), then the same kernel merges through an 8-way level and
    a final task whose input is bounded by |eligible parts| × ties — the
    latest_order_per_customer reduction generalized to keep ALL min rows.
    Returns (s_acctbal, s_name, n_name, p_partkey, p_brand, cost) in
    Q2 order (acctbal DESC, n_name, s_name, p_partkey) limited to k."""
    import pyarrow.parquet as pq
    import ray

    pt = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_brand", "p_type", "p_size"])
    pdf = pt.to_pandas()
    pdf = pdf[(pdf["p_type"] == ptype) & (pdf["p_size"] <= max_size)]
    part_keys = np.sort(pdf["p_partkey"].to_numpy(np.int64))
    brand_of = dict(zip(pdf["p_partkey"].astype(int), pdf["p_brand"]))

    nt = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    rt = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    ok_nations = nt.merge(rt, left_on="n_regionkey", right_on="r_regionkey")
    ok_nations = ok_nations[ok_nations["r_name"] == region]
    st = pq.read_table(f"{sf_dir}/supplier.parquet").to_pandas()
    sdf = st.merge(ok_nations[["n_nationkey", "n_name"]],
                   left_on="s_nationkey", right_on="n_nationkey")
    supp = {int(r.s_suppkey): (r.s_name, float(r.s_acctbal), r.n_name)
            for r in sdf.itertuples()}
    supp_keys = np.sort(sdf["s_suppkey"].to_numpy(np.int64))
    pref, sref = ray.put(part_keys), ray.put(supp_keys)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey",
                                  "l_extendedprice"])

    def argmin_ties(df: pd.DataFrame) -> pd.DataFrame:
        mn = df.groupby("p_partkey", sort=False)["cost_micros"] \
               .transform("min")
        out = df[df["cost_micros"].eq(mn)]
        return out.drop_duplicates(["p_partkey", "s_suppkey"])

    def li_partial(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        keep = np.isin(pk, ray.get(pref)) & np.isin(sk, ray.get(sref))
        df = pd.DataFrame({
            "p_partkey": pk[keep].astype(np.int64),
            "s_suppkey": sk[keep].astype(np.int64),
            "cost_micros": np.asarray(to_micros(np.asarray(
                b["l_extendedprice"].to_pylist(), np.float64)[keep]),
                np.int64)})
        return pa.Table.from_pandas(argmin_ties(df), preserve_index=False)

    parts = li.map_batches(li_partial, batch_format="pyarrow")
    lvl1 = parts.repartition(8).map_batches(
        argmin_ties, batch_format="pandas", batch_size=None)
    final = lvl1.repartition(1).map_batches(
        argmin_ties, batch_format="pandas", batch_size=None)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"s_acctbal": pd.Series([], dtype="float64"),
                                 "s_name": pd.Series([], dtype="string"),
                                 "n_name": pd.Series([], dtype="string"),
                                 "p_partkey": pd.Series([], dtype="int64"),
                                 "p_brand": pd.Series([], dtype="string"),
                                 "cost": pd.Series([], dtype="float64")})
        dec = df["s_suppkey"].map(supp)
        out = pd.DataFrame({
            "s_acctbal": dec.str[1].astype(np.float64),
            "s_name": dec.str[0],
            "n_name": dec.str[2],
            "p_partkey": df["p_partkey"].astype(np.int64),
            "p_brand": df["p_partkey"].map(brand_of),
            "cost": df["cost_micros"].astype(np.float64) / 1e6})
        out = out.sort_values(
            ["s_acctbal", "n_name", "s_name", "p_partkey"],
            ascending=[False, True, True, True], kind="stable")
        return out.head(k).reset_index(drop=True)

    return final.map_batches(finish, batch_format="pandas",
                             batch_size=None)


def join_size_audit(sf_dir: str, mode: str = "auto"):
    """Join-size audit for orders ⋈ lineitem on orderkey — the
    cardinality-planning primitive a distributed engine consults before
    choosing a join strategy: per-side row and distinct-key counts plus
    the EXACT join output size Σ_k cnt_left(k)·cnt_right(k) (computed
    from the two per-key count tables, never by materializing the join).

    Shuffle shape: each side collapses to (key, cnt) via a per-batch
    combiner + cardinality-auto merge (key-bounded); the product-sum
    folds inside conv... key-complete coarse partitions of the SMALL
    merged tables, then one scalar row.  Returns (n_left, n_right,
    n_keys_left, n_keys_right, n_keys_common, est_join_rows)."""
    import pandas as pd

    from deepkg_ray.functions.hashing import stable_hash64_batch
    from deepkg_ray.stages.treeagg import merge_partials

    def counts(path: str, col: str):
        def partial(b: pa.Table) -> pa.Table:
            k, c = np.unique(b[col].to_numpy(zero_copy_only=False)
                             .astype(np.int64), return_counts=True)
            return pa.table({"k": pa.array(k, pa.int64()),
                             "cnt": pa.array(c.astype(np.int64))})
        return merge_partials(
            rd.read_parquet(path, columns=[col])
            .map_batches(partial, batch_format="pyarrow"),
            ["k"], {"cnt": "sum"}, mode=mode)

    left = counts(f"{sf_dir}/orders.parquet", "o_orderkey")
    right = counts(f"{sf_dir}/lineitem.parquet", "l_orderkey")

    def tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            h = stable_hash64_batch(
                [str(x) for x in b["k"].to_pylist()])
            return pa.table({
                "part": pa.array((h % np.uint64(64)).astype(np.int32)),
                "k": b["k"], "cnt": b["cnt"],
                "side": pa.array(np.full(b.num_rows, side, np.int64))})
        return f

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["side"] == 0]
        rt = g[g["side"] == 1]
        m = lf.merge(rt, on="k", suffixes=("_l", "_r"))
        return pd.DataFrame({
            "n_left": [np.int64(lf["cnt"].sum())],
            "n_right": [np.int64(rt["cnt"].sum())],
            "n_keys_left": [np.int64(len(lf))],
            "n_keys_right": [np.int64(len(rt))],
            "n_keys_common": [np.int64(len(m))],
            "est_join_rows": [np.int64(
                (m["cnt_l"].to_numpy(np.int64)
                 * m["cnt_r"].to_numpy(np.int64)).sum())]})

    # 64 single-row partials → one scalar row (repartition(1) moves 64
    # tiny rows, the quantiles finisher shape)
    parts = both.groupby("part").map_groups(fold, batch_format="pandas")
    return parts.repartition(1).map_batches(
        lambda df: df.sum().to_frame().T.astype("int64"),
        batch_format="pandas", batch_size=None)
