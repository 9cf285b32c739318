"""Exact distributed quantiles over integer-valued metric columns via the
value-count histogram method: per-batch partial counts (vectorized
np.unique) → one small groupby-Sum shuffle over the DISTINCT values →
driver-side cumulative pick.

Scale note: the shuffle and driver step are bounded by the number of
DISTINCT values, not rows — the right shape for discrete metrics (token
counts, degrees, duplicate counts) whose value space is thousands while the
row count is billions.  For continuous/unbounded columns use a sort-based
or sketch method instead (documented trade-off; out of scope here since
every quantile target in this engine is a discrete count).

Quantile definition matches DuckDB's quantile_disc: the element at
idx = max(0, ceil(q·n) − 1) of the sorted multiset — computed in integer
arithmetic from micro-units of q so engine and SQL agree bitwise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Sum


def value_counts(ds, col: str):
    """Distributed histogram: (value, n) with one row per distinct value.
    Per-batch partials keep the shuffle at distinct-value size."""
    def partial(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(v, return_counts=True)
        return pa.table({"value": pa.array(vals.astype(np.int64), pa.int64()),
                         "n": pa.array(cnts.astype(np.int64), pa.int64())})

    return (ds.select_columns([col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("value").aggregate(Sum("n", alias_name="n")))


def quantiles_disc(ds, col: str, qs: list[float]):
    """Exact discrete quantiles of an integer column.  Returns a Dataset
    (q float64, value int64) with one row per requested quantile."""
    hist = value_counts(ds, col).to_pandas().sort_values("value")
    values = hist["value"].to_numpy(dtype=np.int64)
    cum = hist["n"].to_numpy(dtype=np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            continue
        q_micros = int(np.floor(q * 1e6 + 0.5))
        idx = max(0, -(-(q_micros * n) // 1_000_000) - 1)   # ceil(q·n)−1
        pos = int(np.searchsorted(cum, idx + 1, side="left"))
        out_q.append(q)
        out_v.append(int(values[min(pos, len(values) - 1)]))
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "q": pa.array(out_q, pa.float64()),
        "value": pa.array(out_v, pa.int64())}))


def add_token_count(batch: pa.Table, text_col: str = "text",
                    out_col: str = "n_tokens") -> pa.Table:
    """Whitespace token count per row — the doc_stats n_tokens convention
    (trim, then split on runs of whitespace; empty/blank text → 0)."""
    import re
    ws = re.compile(r"\s+")
    texts = batch[text_col].to_pylist()
    counts = np.fromiter(
        (len(ws.split(t.strip())) if t.strip() else 0 for t in texts),
        dtype=np.int64, count=len(texts))
    return batch.append_column(out_col, pa.array(counts, pa.int64()))


def token_count_quantiles(ds, qs: list[float], text_col: str = "text"):
    counted = ds.map_batches(
        lambda b: add_token_count(b, text_col), batch_format="pyarrow")
    return quantiles_disc(counted, "n_tokens", qs)


def grouped_quantiles_disc(ds, group_col: str, col: str, qs: list[float]):
    """Exact per-group discrete quantiles: per-batch (group, value) count
    partials → one groupby-Sum shuffle bounded by groups × distinct values
    → per-group pick inside map_groups (DISTRIBUTED — nothing collects to
    the driver, unlike the global quantiles_disc whose histogram is
    driver-picked).  Returns (group, q, value) rows; same quantile_disc
    index formula as the global path."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            group_col: b[group_col].to_pylist(),
            "value": b[col].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        g = (df.groupby([group_col, "value"], sort=False).size()
             .reset_index(name="n"))
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (ds.select_columns([group_col, col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby([group_col, "value"]).aggregate(Sum("n", alias_name="n")))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value", kind="stable")
        values = g["value"].to_numpy(dtype=np.int64)
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        out_q, out_v = [], []
        for q in qs:
            q_micros = int(np.floor(q * 1e6 + 0.5))
            idx = max(0, -(-(q_micros * n) // 1_000_000) - 1)
            pos = int(np.searchsorted(cum, idx + 1, side="left"))
            out_q.append(q)
            out_v.append(int(values[min(pos, len(values) - 1)]))
        return pd.DataFrame({group_col: [g[group_col].iloc[0]] * len(out_q),
                             "q": np.asarray(out_q, np.float64),
                             "value": np.asarray(out_v, np.int64)})

    return hist.groupby(group_col).map_groups(pick, batch_format="pandas")


def key_skew_stats(ds, col: str, qs: tuple = (0.5, 0.9, 0.99)):
    """Shuffle-planning diagnostic: the distribution of per-key row counts
    for a prospective groupby/join key — the signal that decides salted
    two-level aggregation (convgroup) vs a plain groupby.  Two bounded
    stages: per-batch (key, n) partials → groupby(key) Sum (the only
    key-shaped shuffle), then a count-of-counts histogram (distinct-count-
    bounded) folded on the driver.  Returns one row: n_keys, n_rows,
    max_cnt, p50/p90/p99 of per-key counts, top_share =
    round6(max/total rows)."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({col: b[col].to_pylist()})
        g = df.groupby(col, sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    cnts = (ds.select_columns([col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(col).aggregate(Sum("n", alias_name="n")))
    hist = (value_counts(cnts, "n").to_pandas().sort_values("value"))
    import ray.data as rd
    if len(hist) == 0:
        return rd.from_arrow(pa.table({
            "n_keys": pa.array([0], pa.int64()),
            "n_rows": pa.array([0], pa.int64()),
            "max_cnt": pa.array([0], pa.int64()),
            "p50": pa.array([0], pa.int64()),
            "p90": pa.array([0], pa.int64()),
            "p99": pa.array([0], pa.int64()),
            "top_share": pa.array([0.0], pa.float64())}))
    values = hist["value"].to_numpy(np.int64)     # distinct per-key counts
    mult = hist["n"].to_numpy(np.int64)           # how many keys have each
    cum = mult.cumsum()
    n_keys = int(cum[-1])
    n_rows = int((values * mult).sum())
    picks = []
    for q in qs:
        q_micros = int(np.floor(q * 1e6 + 0.5))
        idx = max(0, -(-(q_micros * n_keys) // 1_000_000) - 1)
        pos = int(np.searchsorted(cum, idx + 1, side="left"))
        picks.append(int(values[min(pos, len(values) - 1)]))
    mx = int(values[-1])
    top_share = np.floor(mx / n_rows * 1e6 + 0.5) / 1e6
    return rd.from_arrow(pa.table({
        "n_keys": pa.array([n_keys], pa.int64()),
        "n_rows": pa.array([n_rows], pa.int64()),
        "max_cnt": pa.array([mx], pa.int64()),
        "p50": pa.array([picks[0]], pa.int64()),
        "p90": pa.array([picks[1]], pa.int64()),
        "p99": pa.array([picks[2]], pa.int64()),
        "top_share": pa.array([top_share], pa.float64())}))


def grid_quantiles(ds, col: str, qs: list[float], n_bins: int = 4096):
    """Approximate quantiles for CONTINUOUS / open value domains — the
    scale path the exact distinct-bounded method above explicitly scopes
    out.  Fixed-width histogram over the observed micros range: one tiny
    min/max pass, then an n_bins-bounded bucket-count shuffle (per-batch
    bincount partials); error ≤ (max−min)/n_bins by construction.  Unlike
    randomized sketches (KLL/t-digest) the result is DETERMINISTIC and
    partitioning-invariant — every step is integer arithmetic — so the SQL
    oracle reproduces it bitwise.  Quantile pick follows the
    quantile_disc convention above (idx = ceil(q·n)−1 in integer micros);
    the reported value is the selected bucket's lower edge.

    Overflow bound: (max−min)·n_bins must stay < 2^63 — with micros
    values that allows value ranges up to ~2×10^12/n_bins, plenty for
    metric columns; assert-guarded.  Returns (q, bucket, approx)."""
    from ray.data.aggregate import Max, Min

    def to_vm(b: pa.Table) -> pa.Table:
        v = np.asarray(b[col].to_pylist(), np.float64)
        return pa.table({"vm": pa.array(
            np.floor(v * 1e6 + 0.5).astype(np.int64), pa.int64())})

    vm_ds = ds.select_columns([col]).map_batches(
        to_vm, batch_format="pyarrow").materialize()
    mm = vm_ds.aggregate(Min("vm"), Max("vm"))
    mn, mx = int(mm["min(vm)"]), int(mm["max(vm)"])
    denom = mx - mn + 1
    assert denom * n_bins < 2**63, "value range too wide for the grid"

    def bucket_partial(b: pa.Table) -> pa.Table:
        vm = b["vm"].to_numpy(zero_copy_only=False)
        bk = (vm - mn) * n_bins // denom
        vals, cnts = np.unique(bk, return_counts=True)
        return pa.table({"bucket": pa.array(vals.astype(np.int64)),
                         "n": pa.array(cnts.astype(np.int64))})

    hist = (vm_ds.map_batches(bucket_partial, batch_format="pyarrow")
            .groupby("bucket").aggregate(Sum("n", alias_name="n"))
            .to_pandas().sort_values("bucket"))
    buckets = hist["bucket"].to_numpy(np.int64)
    cum = hist["n"].to_numpy(np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_b, out_a = [], [], []
    for q in qs:
        if n == 0:
            continue
        q_micros = int(np.floor(q * 1e6 + 0.5))
        idx = max(0, -(-(q_micros * n) // 1_000_000) - 1)   # ceil(q·n)−1
        pos = int(np.searchsorted(cum, idx + 1, side="left"))
        bk = int(buckets[min(pos, len(buckets) - 1)])
        out_q.append(q)
        out_b.append(bk)
        out_a.append((mn + bk * denom // n_bins) / 1e6)
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "q": pa.array(out_q, pa.float64()),
        "bucket": pa.array(out_b, pa.int64()),
        "approx": pa.array(out_a, pa.float64())}))


def quantiles_cont(ds, col: str, qs: list[float]):
    """Exact INTERPOLATED quantiles (percentile_cont / numpy type-7) of an
    integer column: position h = q·(n−1); value = v⌊h⌋ + frac·(v⌈h⌉ −
    v⌊h⌋).  Same value-count histogram plan as quantiles_disc (shuffle
    bounded by distinct values, driver holds only the histogram); all
    positional arithmetic in integer micros of q, ONE float op chain at
    the end —  v = v_lo + (frac_micros·(v_hi−v_lo)) / 1e6  — mirrored
    verbatim in the SQL oracle (DuckDB's builtin quantile_cont may
    interpolate through a different expression ordering).
    Returns (q float64, value float64 round6)."""
    hist = value_counts(ds, col).to_pandas().sort_values("value")
    values = hist["value"].to_numpy(dtype=np.int64)
    cum = hist["n"].to_numpy(dtype=np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    from deepkg_ray.functions.numeric import round6
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            continue
        q_micros = int(np.floor(q * 1e6 + 0.5))
        hm = q_micros * (n - 1)              # position in micro-index units
        lo = hm // 1_000_000
        frac = hm % 1_000_000
        # element at 0-based index i = min value with cum > i
        p_lo = int(np.searchsorted(cum, lo + 1, side="left"))
        v_lo = int(values[min(p_lo, len(values) - 1)])
        if frac > 0:
            p_hi = int(np.searchsorted(cum, lo + 2, side="left"))
            v_hi = int(values[min(p_hi, len(values) - 1)])
        else:
            v_hi = v_lo
        out_q.append(q)
        out_v.append(float(round6(
            np.asarray([v_lo + (frac * (v_hi - v_lo)) / 1e6]))[0]))
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "q": pa.array(out_q, pa.float64()),
        "value": pa.array(out_v, pa.float64())}))


def token_count_quantiles_cont(ds, qs: list[float], text_col: str = "text"):
    counted = ds.map_batches(
        lambda b: add_token_count(b, text_col), batch_format="pyarrow")
    return quantiles_cont(counted, "n_tokens", qs)


def grouped_quantiles_cont(ds, group_col: str, col: str, qs: list[float]):
    """Per-group INTERPOLATED quantiles (percentile_cont / type-7) of a
    float column quantized to int64 micros: grouped_quantiles_disc's
    distributed plan — per-batch (group, micros) count partials, one
    groupby-Sum shuffle bounded by groups × distinct values, per-group
    pick inside map_groups — with quantiles_cont's micro-index
    interpolation in the pick.  Op chain per quantile:
    value = round6((v_lo + (frac·(v_hi − v_lo)) / 1e6) / 1e6) on micros —
    mirrored verbatim in SQL.  Returns (group, q, value float64)."""
    import pandas as pd
    from deepkg_ray.functions.numeric import round6, to_micros

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            group_col: b[group_col].to_pylist(),
            "vm": to_micros(b[col].to_pylist()),
        })
        g = (df.groupby([group_col, "vm"], sort=False).size()
             .reset_index(name="n"))
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (ds.select_columns([group_col, col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby([group_col, "vm"]).aggregate(Sum("n", alias_name="n")))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vm", kind="stable")
        values = g["vm"].to_numpy(dtype=np.int64)
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        out_q, out_v = [], []
        for q in qs:
            q_micros = int(np.floor(q * 1e6 + 0.5))
            hm = q_micros * (n - 1)
            lo, frac = hm // 1_000_000, hm % 1_000_000
            p_lo = int(np.searchsorted(cum, lo + 1, side="left"))
            v_lo = int(values[min(p_lo, len(values) - 1)])
            if frac > 0:
                p_hi = int(np.searchsorted(cum, lo + 2, side="left"))
                v_hi = int(values[min(p_hi, len(values) - 1)])
            else:
                v_hi = v_lo
            out_q.append(q)
            out_v.append(float(round6(np.asarray(
                [(v_lo + (frac * (v_hi - v_lo)) / 1e6) / 1e6]))[0]))
        return pd.DataFrame({group_col: [g[group_col].iloc[0]] * len(out_q),
                             "q": np.asarray(out_q, np.float64),
                             "value": np.asarray(out_v, np.float64)})

    return hist.groupby(group_col).map_groups(pick, batch_format="pandas")


def grouped_iqr_outliers(ds, group_col: str = "event_type",
                         col: str = "value", id_col: str = "event_id"):
    """Tukey-fence outlier detection per group: rows whose value falls
    outside [q1 − 1.5·IQR, q3 + 1.5·IQR] of their group's interpolated
    quartiles — the quantile-join-filter pattern (compute a per-group
    statistic, broadcast it back, filter the stream).

    The quartiles come from grouped_quantiles_cont's histogram plan, kept
    in the EXACT scaled-integer space q_s = v_lo·1e6 + frac·(v_hi − v_lo)
    (micros × 1e6); the 1.5 factor is cleared to integers by comparing
    2·vm·1e6 against 2·q1_s − 3·IQR_s, so the fence test is pure int64 on
    both sides — no float round can flip a boundary row.  Requires
    |value| < 4.6e5 (2·vm·1e6 must fit int64; asserted).  The per-group
    fence table is dictionary-sized and is broadcast into the filter map;
    the event stream itself never shuffles.  Returns
    (event_id, event_type, value) for outlier rows."""
    import pandas as pd
    import ray
    from deepkg_ray.functions.numeric import to_micros

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({
            group_col: b[group_col].to_pylist(),
            "vm": to_micros(b[col].to_pylist()),
        })
        g = (df.groupby([group_col, "vm"], sort=False).size()
             .reset_index(name="n"))
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (ds.select_columns([group_col, col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby([group_col, "vm"]).aggregate(Sum("n", alias_name="n")))

    def pick_q_s(g: pd.DataFrame, q: float) -> int:
        values = g["vm"].to_numpy(dtype=np.int64)
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        q_micros = int(np.floor(q * 1e6 + 0.5))
        hm = q_micros * (n - 1)
        lo, frac = hm // 1_000_000, hm % 1_000_000
        p_lo = int(np.searchsorted(cum, lo + 1, side="left"))
        v_lo = int(values[min(p_lo, len(values) - 1)])
        if frac > 0:
            p_hi = int(np.searchsorted(cum, lo + 2, side="left"))
            v_hi = int(values[min(p_hi, len(values) - 1)])
        else:
            v_hi = v_lo
        return v_lo * 1_000_000 + frac * (v_hi - v_lo)

    def fences(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vm", kind="stable")
        # fences are |2*q - 3*iqr| <= 8 * max|vm| * 1e6, so int64 safety
        # needs max|vm| < 2^63 / 8e6 ~= 1.15e12 micros (|value| < ~1.15e6)
        assert int(np.abs(g["vm"].to_numpy(np.int64)).max()) < 10 ** 12, \
            "grouped_iqr_outliers requires |value| < 1e6 (int64 fence space)"
        q1s, q3s = pick_q_s(g, 0.25), pick_q_s(g, 0.75)
        iqr = q3s - q1s
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             "lo2": [2 * q1s - 3 * iqr],
                             "hi2": [2 * q3s + 3 * iqr]})

    fence_df = (hist.groupby(group_col)
                .map_groups(fences, batch_format="pandas").to_pandas())
    fence_ref = ray.put({r[group_col]: (int(r["lo2"]), int(r["hi2"]))
                         for _, r in fence_df.iterrows()})

    def flag(b: pa.Table, ref=fence_ref) -> pa.Table:
        fen = ray.get(ref)
        grp = b[group_col].to_pylist()
        vm = np.asarray(to_micros(b[col].to_pylist()), np.int64)
        lo2 = np.asarray([fen[g][0] for g in grp], np.int64)
        hi2 = np.asarray([fen[g][1] for g in grp], np.int64)
        vm2 = 2 * vm * 1_000_000
        keep = (vm2 < lo2) | (vm2 > hi2)
        return pa.table({
            id_col: pa.array(
                b[id_col].to_numpy(zero_copy_only=False)[keep]),
            group_col: pa.array(np.asarray(grp, object)[keep], pa.string()),
            col: pa.array(vm[keep].astype(np.float64) / 1e6, pa.float64())})

    return ds.select_columns([id_col, group_col, col]).map_batches(
        flag, batch_format="pyarrow")


def grouped_mad(ds, group_col: str = "event_type", col: str = "value"):
    """Per-group median absolute deviation, interpolation-exact: median in
    DOUBLED micros space (med2 = vm[(n−1)//2] + vm[n//2], an exact int64
    whether n is odd or even), deviations d2 = |2·vm − med2| stay integral,
    and the MAD repeats the doubled-median trick giving mad4 in 4× micros.
    The only float ops are the final /2e6 and /4e6 casts, mirrored in SQL.

    Two histogram passes (same value-count plan as grouped_quantiles_cont:
    shuffle bounded by groups × distinct values, never rows); the per-group
    med2 dict is driver-broadcast between them — groups are
    dictionary-sized (event types), documented like the other grouped
    quantile ops.  Robust-scale statistic for outlier gating at corpus
    scale (reference analog: the frequency-floor heuristics of
    extractors.py phrase pruning, replaced by a principled robust scale).
    Returns (group, med2, mad4, median, mad)."""
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.functions.numeric import to_micros

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({group_col: b[group_col].to_pylist(),
                           "vm": to_micros(b[col].to_pylist())})
        g = (df.groupby([group_col, "vm"], sort=False).size()
             .reset_index(name="n"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from deepkg_ray.stages.treeagg import merge_partials
    hist = merge_partials(
        ds.select_columns([group_col, col])
        .map_batches(partial, batch_format="pyarrow"),
        [group_col, "vm"], {"n": "sum"}, mode="auto")

    def pick2(g: pd.DataFrame, vcol: str) -> int:
        """x[(n−1)//2] + x[n//2] of the histogram multiset — exact int."""
        g = g.sort_values(vcol, kind="stable")
        values = g[vcol].to_numpy(dtype=np.int64)
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        ilo, ihi = (n - 1) // 2, n // 2
        p_lo = int(np.searchsorted(cum, ilo + 1, side="left"))
        p_hi = int(np.searchsorted(cum, ihi + 1, side="left"))
        return int(values[p_lo]) + int(values[p_hi])

    def pick_med(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             "med2": [pick2(g, "vm")]})

    med = (hist.groupby(group_col).map_groups(pick_med,
                                              batch_format="pandas")
           .to_pandas())
    med2_of = dict(zip(med[group_col], med["med2"].astype(np.int64)))

    def dev_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({group_col: b[group_col].to_pylist(),
                           "vm": to_micros(b[col].to_pylist())})
        m2 = df[group_col].map(med2_of).to_numpy(np.int64)
        df["d2"] = np.abs(2 * df["vm"].to_numpy(np.int64) - m2)
        g = (df.groupby([group_col, "d2"], sort=False).size()
             .reset_index(name="n"))
        return pa.Table.from_pandas(g[[group_col, "d2", "n"]],
                                    preserve_index=False)

    dev_hist = merge_partials(
        ds.select_columns([group_col, col])
        .map_batches(dev_partial, batch_format="pyarrow"),
        [group_col, "d2"], {"n": "sum"}, mode="auto")

    def pick_mad(g: pd.DataFrame) -> pd.DataFrame:
        grp = g[group_col].iloc[0]
        med2 = int(med2_of[grp])
        mad4 = pick2(g, "d2")
        return pd.DataFrame({
            group_col: [grp],
            "med2": np.asarray([med2], np.int64),
            "mad4": np.asarray([mad4], np.int64),
            "median": np.asarray([med2 / 2e6], np.float64),
            "mad": np.asarray([mad4 / 4e6], np.float64)})

    return dev_hist.groupby(group_col).map_groups(pick_mad,
                                                  batch_format="pandas")


def ks_two_sample(ds, group_col: str = "event_type", col: str = "value",
                  type_a: str = "click", type_b: str = "view"):
    """Two-sample Kolmogorov–Smirnov statistic between the value
    distributions of two groups, division-cleared: D·n_a·n_b =
    max over the sorted value union of |cum_a·n_b − cum_b·n_a| — every
    comparison is exact int64; the single d_num/(n_a·n_b) cast at the end
    is the only float op, mirrored in SQL.

    Plan: one (vm → count_a, count_b) histogram shuffle bounded by
    DISTINCT values (the module's standing bound, documented at top); the
    driver walks the sorted histogram once (distinct-sized, not
    row-sized).  Returns one row (n_a, n_b, d_num, d)."""
    import ray.data as rd
    from deepkg_ray.functions.numeric import to_micros

    def partial(b: pa.Table) -> pa.Table:
        t = np.asarray(b[group_col].to_pylist(), object)
        vm = np.asarray(to_micros(b[col].to_pylist()), np.int64)
        is_a, is_b = t == type_a, t == type_b
        keep = is_a | is_b
        vm, a = vm[keep], is_a[keep].astype(np.int64)
        vals, inv = np.unique(vm, return_inverse=True)
        ca = np.bincount(inv, weights=a).astype(np.int64)
        cb = np.bincount(inv, weights=1 - a).astype(np.int64)
        return pa.table({"vm": pa.array(vals, pa.int64()),
                         "a": pa.array(ca, pa.int64()),
                         "b": pa.array(cb, pa.int64())})

    hist = (ds.select_columns([group_col, col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("vm").aggregate(Sum("a", alias_name="a"),
                                     Sum("b", alias_name="b"))
            .to_pandas().sort_values("vm"))
    cuma = hist["a"].to_numpy(np.int64).cumsum()
    cumb = hist["b"].to_numpy(np.int64).cumsum()
    n_a = int(cuma[-1]) if len(cuma) else 0
    n_b = int(cumb[-1]) if len(cumb) else 0
    d_num = int(np.max(np.abs(cuma * n_b - cumb * n_a))) if len(cuma) else 0
    d = float(d_num) / (float(n_a) * float(n_b)) if n_a and n_b else 0.0
    return rd.from_arrow(pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "d_num": pa.array([d_num], pa.int64()),
        "d": pa.array([d], pa.float64())}))


def roc_auc(ds, group_col: str = "event_type", col: str = "value",
            positive: str = "purchase"):
    """ROC AUC of ``col`` as a score for the ``positive`` class, with exact
    average-rank tie handling in DOUBLED space: auc_num2 =
    Σ_v pos(v)·(2·neg_below(v) + neg_at(v)) — an exact int64 numerator
    (each tied pair contributes 1 of 2 half-units); auc =
    num2 / (2·P·N) is the single float chain, mirrored in SQL.

    Same distinct-value-bounded histogram plan as ks_two_sample.  Returns
    one row (n_pos, n_neg, auc_num2, auc)."""
    import ray.data as rd
    from deepkg_ray.functions.numeric import to_micros

    def partial(b: pa.Table) -> pa.Table:
        t = np.asarray(b[group_col].to_pylist(), object)
        vm = np.asarray(to_micros(b[col].to_pylist()), np.int64)
        p = (t == positive).astype(np.int64)
        vals, inv = np.unique(vm, return_inverse=True)
        cp = np.bincount(inv, weights=p).astype(np.int64)
        cq = np.bincount(inv, weights=1 - p).astype(np.int64)
        return pa.table({"vm": pa.array(vals, pa.int64()),
                         "p": pa.array(cp, pa.int64()),
                         "q": pa.array(cq, pa.int64())})

    hist = (ds.select_columns([group_col, col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("vm").aggregate(Sum("p", alias_name="p"),
                                     Sum("q", alias_name="q"))
            .to_pandas().sort_values("vm"))
    p = hist["p"].to_numpy(np.int64)
    q = hist["q"].to_numpy(np.int64)
    n_pos, n_neg = int(p.sum()), int(q.sum())
    qb = np.concatenate([[0], q.cumsum()[:-1]]) if len(q) else q
    num2 = int(np.sum(p * (2 * qb + q)))
    auc = float(num2) / (2.0 * float(n_pos) * float(n_neg)) \
        if n_pos and n_neg else 0.0
    return rd.from_arrow(pa.table({
        "n_pos": pa.array([n_pos], pa.int64()),
        "n_neg": pa.array([n_neg], pa.int64()),
        "auc_num2": pa.array([num2], pa.int64()),
        "auc": pa.array([auc], pa.float64())}))


def pr_auc(ds, group_col: str = "event_type", col: str = "value",
           positive: str = "purchase"):
    """Average precision (area under the precision-recall curve, the
    step-wise interpolation sklearn calls AP) of ``col`` as a score for
    the ``positive`` class — the imbalanced-class companion of roc_auc:

        AP = Σ_v  (p(v)/P) · cp(v)/(cp(v)+cq(v))

    over distinct score values v descending, cp/cq the ≥v cumulative
    positive/negative counts.  Exactness: each term is the INTEGER floor
    (p·cp·10⁶) // (cp+cq) in arbitrary-precision ints (HUGEINT in the SQL
    mirror), summed to ap_num_micros; only the final ap = num/P/1e6
    scalar is float, in oracle-identical op order.  Same distinct-value-
    bounded histogram plan as roc_auc/ks_two_sample (the driver sees one
    row per distinct micros value, never row-shaped data).  Returns one
    row (n_pos, n_neg, ap_num_micros, average_precision)."""
    import ray.data as rd
    from deepkg_ray.functions.numeric import round6, to_micros

    def partial(b: pa.Table) -> pa.Table:
        t = np.asarray(b[group_col].to_pylist(), object)
        vm = np.asarray(to_micros(b[col].to_pylist()), np.int64)
        p = (t == positive).astype(np.int64)
        vals, inv = np.unique(vm, return_inverse=True)
        cp = np.bincount(inv, weights=p).astype(np.int64)
        cq = np.bincount(inv, weights=1 - p).astype(np.int64)
        return pa.table({"vm": pa.array(vals, pa.int64()),
                         "p": pa.array(cp, pa.int64()),
                         "q": pa.array(cq, pa.int64())})

    hist = (ds.select_columns([group_col, col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("vm").aggregate(Sum("p", alias_name="p"),
                                     Sum("q", alias_name="q"))
            .to_pandas().sort_values("vm", ascending=False))
    p = hist["p"].to_numpy(np.int64)
    q = hist["q"].to_numpy(np.int64)
    n_pos, n_neg = int(p.sum()), int(q.sum())
    num = 0
    cp = cq = 0
    for pi, qi in zip(p.tolist(), q.tolist()):
        cp += int(pi)
        cq += int(qi)
        if pi:
            num += (int(pi) * cp * 10**6) // (cp + cq)
    ap = (float(round6(np.asarray(
        [float(num) / float(n_pos) / 1e6]))[0]) if n_pos else 0.0)
    return rd.from_arrow(pa.table({
        "n_pos": pa.array([n_pos], pa.int64()),
        "n_neg": pa.array([n_neg], pa.int64()),
        "ap_num_micros": pa.array([num], pa.int64()),
        "average_precision": pa.array([ap], pa.float64())}))


def grouped_mad_outliers(ds, k: int = 3, group_col: str = "event_type",
                         col: str = "value", id_col: str = "event_id"):
    """Robust outlier flagging per group: rows more than ``k`` MADs from
    their group median — the Hampel filter companion to
    grouped_iqr_outliers (median/MAD resist the very outliers that drag
    mean/stddev z-scores).

    Integer-exact end to end: grouped_mad supplies (med2, mad4) in
    doubled/quadrupled micros; the test |vm − median| > k·MAD clears to
    2·|2·vm − med2| > k·mad4, pure int64 both sides.  The per-group
    (med2, mad4) table is dictionary-sized and broadcast into the filter
    map — the event stream itself never shuffles.  Returns
    (event_id, event_type, value) for outlier rows."""
    import ray
    from deepkg_ray.functions.numeric import to_micros

    stats = grouped_mad(ds, group_col=group_col, col=col).to_pandas()
    ref = ray.put({r[group_col]: (int(r["med2"]), int(r["mad4"]))
                   for _, r in stats.iterrows()})

    def flag(b: pa.Table) -> pa.Table:
        sm = ray.get(ref)
        grp = np.asarray(b[group_col].to_pylist(), object)
        vm = np.asarray(to_micros(b[col].to_pylist()), np.int64)
        med2 = np.array([sm[g][0] for g in grp], np.int64)
        mad4 = np.array([sm[g][1] for g in grp], np.int64)
        out = 2 * np.abs(2 * vm - med2) > k * mad4
        return pa.table({
            id_col: pa.array(
                b[id_col].to_numpy(zero_copy_only=False)[out]),
            group_col: pa.array(grp[out].astype(str), pa.string()),
            col: pa.array(np.asarray(
                b[col].to_pylist(), np.float64)[out], pa.float64())})

    return ds.select_columns([id_col, group_col, col]).map_batches(
        flag, batch_format="pyarrow")


def grouped_winsorized_mean(ds, group_col: str = "event_type",
                            col: str = "value",
                            q_lo: float = 0.05, q_hi: float = 0.95):
    """Winsorized mean per group: values clipped to the group's exact
    DISCRETE [q_lo, q_hi] quantiles (quantile_disc elements, so the clip
    bounds are actual data micros — integer clip, no interpolation
    boundary risk), then the mean via the module's floor(sum/n+0.5)/1e6
    convention.  The robust-mean companion to grouped_iqr_outliers /
    grouped_mad_outliers: instead of dropping tails it pins them.

    Plan: one grouped value-count histogram for the bounds
    (grouped_quantiles_disc), bounds broadcast as a dict, then one
    (n, clipped-sum) combiner pass + tree merge over the group
    dictionary.  Returns (group, n, sum_micros, wmean)."""
    import pandas as pd
    import ray
    from deepkg_ray.functions.numeric import to_micros
    from deepkg_ray.stages.treeagg import merge_partials

    def to_vm(b: pa.Table) -> pa.Table:
        return pa.table({
            group_col: b[group_col],
            "vm": pa.array(to_micros(b[col].to_pylist()), pa.int64())})

    vm_ds = ds.select_columns([group_col, col]).map_batches(
        to_vm, batch_format="pyarrow").materialize()
    qt = grouped_quantiles_disc(vm_ds, group_col, "vm",
                                [q_lo, q_hi]).to_pandas()
    lo_of, hi_of = {}, {}
    for _, r in qt.iterrows():
        if abs(r["q"] - q_lo) < 1e-9:
            lo_of[r[group_col]] = int(r["value"])
        else:
            hi_of[r[group_col]] = int(r["value"])
    ref = ray.put((lo_of, hi_of))

    def partial(b: pa.Table) -> pa.Table:
        lo_m, hi_m = ray.get(ref)
        df = pd.DataFrame({group_col: b[group_col].to_pylist(),
                           "vm": b["vm"].to_numpy(zero_copy_only=False)})
        lo = df[group_col].map(lo_m).to_numpy(np.int64)
        hi = df[group_col].map(hi_m).to_numpy(np.int64)
        df["cl"] = np.minimum(np.maximum(df["vm"].to_numpy(np.int64), lo),
                              hi)
        g = (df.groupby(group_col, sort=False)
             .agg(n=("cl", "size"), s=("cl", "sum")).reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    merged = merge_partials(
        vm_ds.map_batches(partial, batch_format="pyarrow"),
        [group_col], {"n": "sum", "s": "sum"}, mode="tree")

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        s = b["s"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        wmean = np.floor(s.astype(np.float64) / n.astype(np.float64)
                         + 0.5) / 1e6
        return pa.table({
            group_col: b[group_col],
            "n": pa.array(n, pa.int64()),
            "sum_micros": pa.array(s, pa.int64()),
            "wmean": pa.array(wmean, pa.float64())})
    return merged.map_batches(finish, batch_format="pyarrow")


def weighted_median_price(sf_dir: str, qs=(0.5,)):
    """WEIGHTED quantiles: the order-price distribution where each
    lineitem price counts with its quantity as mass — quantile_disc
    generalized to integer weights: the element at the smallest value
    whose cumulative weight reaches ceil(q·W) (W = total weight), all in
    integer micros of q.  Same value-count histogram plan (shuffle
    bounded by distinct prices), weights summed instead of counted.
    Returns (q, value) with value = the selected price."""
    import ray.data as rd

    from deepkg_ray.functions.numeric import to_micros

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        pm = np.asarray(to_micros(b["l_extendedprice"].to_pylist()),
                        np.int64)
        qm = np.asarray(to_micros(b["l_quantity"].to_pylist()), np.int64)
        vals, inv = np.unique(pm, return_inverse=True)
        w = np.bincount(inv, weights=qm.astype(np.float64)) \
            .astype(np.int64)
        return pa.table({"vm": pa.array(vals, pa.int64()),
                         "w": pa.array(w, pa.int64())})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("vm").aggregate(Sum("w", alias_name="w"))
            .to_pandas().sort_values("vm"))
    values = hist["vm"].to_numpy(np.int64)
    cum = hist["w"].to_numpy(np.int64).cumsum()
    total = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        if total == 0:
            continue
        q_micros = int(np.floor(q * 1e6 + 0.5))
        target = -(-(q_micros * total) // 1_000_000)      # ceil(q·W)
        pos = int(np.searchsorted(cum, target, side="left"))
        out_q.append(q)
        out_v.append(values[min(pos, len(values) - 1)] / 1e6)
    return rd.from_arrow(pa.table({
        "q": pa.array(out_q, pa.float64()),
        "value": pa.array(out_v, pa.float64())}))


def grouped_harmonic_mean(ds, group_col: str = "event_type",
                          col: str = "value"):
    """Harmonic mean of the POSITIVE values per group — the rate-averaging
    statistic (throughputs, latencies-as-rates), division-cleared to
    integer sums: each reciprocal is floor(1e12/vm + 0.5) — reciprocal
    MICROS, exact int since vm ≥ 1 micro — Σ as int64, and
    hmean = n·1e12/Σ/1e6, one double chain mirrored in SQL.  Rows with
    value ≤ 0 are excluded (matching SQL's WHERE).  Returns
    (group, n, sum_recip_micros, hmean)."""
    import pandas as pd

    from deepkg_ray.functions.numeric import to_micros
    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({group_col: b[group_col].to_pylist(),
                           "vm": to_micros(b[col].to_pylist())})
        df = df[df["vm"] > 0]
        vm = df["vm"].to_numpy(np.int64)
        df["r"] = np.floor(1e12 / vm + 0.5).astype(np.int64)
        g = (df.groupby(group_col, sort=False)
             .agg(n=("r", "size"), s=("r", "sum")).reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    merged = merge_partials(
        ds.select_columns([group_col, col])
        .map_batches(partial, batch_format="pyarrow"),
        [group_col], {"n": "sum", "s": "sum"}, mode="tree")

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        s = b["s"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        hm = n.astype(np.float64) * 1e12 / s.astype(np.float64) / 1e6
        return pa.table({
            group_col: b[group_col],
            "n": pa.array(n, pa.int64()),
            "sum_recip_micros": pa.array(s, pa.int64()),
            "hmean": pa.array(hm, pa.float64())})
    return merged.map_batches(finish, batch_format="pyarrow")


def grouped_geometric_mean(ds, group_col: str = "event_type",
                           col: str = "value"):
    """Geometric mean of the POSITIVE values per group — completes the
    mean family (arithmetic: windows, harmonic: above): per element
    floor(ln(vm/1e6)·1e6 + 0.5) ln-MICROS (one ln per value, the
    source_kl convention), Σ as int64, gmean = exp(Σ/n/1e6) — one exp in
    double mirrored in SQL.  Rows with value ≤ 0 are excluded.  Returns
    (group, n, sum_ln_micros, gmean)."""
    import pandas as pd

    from deepkg_ray.functions.numeric import to_micros
    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({group_col: b[group_col].to_pylist(),
                           "vm": to_micros(b[col].to_pylist())})
        df = df[df["vm"] > 0]
        vm = df["vm"].to_numpy(np.int64)
        df["l"] = np.floor(np.log(vm / 1e6) * 1e6 + 0.5).astype(np.int64)
        g = (df.groupby(group_col, sort=False)
             .agg(n=("l", "size"), s=("l", "sum")).reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    merged = merge_partials(
        ds.select_columns([group_col, col])
        .map_batches(partial, batch_format="pyarrow"),
        [group_col], {"n": "sum", "s": "sum"}, mode="tree")

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        s = b["s"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        gm = np.exp(s.astype(np.float64) / n.astype(np.float64) / 1e6)
        gm = np.floor(gm * 1e6 + 0.5) / 1e6
        return pa.table({
            group_col: b[group_col],
            "n": pa.array(n, pa.int64()),
            "sum_ln_micros": pa.array(s, pa.int64()),
            "gmean": pa.array(gm, pa.float64())})
    return merged.map_batches(finish, batch_format="pyarrow")


def events_emd_1d(ds, type_col: str = "event_type", col: str = "value"):
    """1-D earth mover's distance (Wasserstein-1) between the value
    distributions of the two lexicographically smallest event types —
    the distribution-shift measure complementing KS (sup gap) and KL
    (likelihood ratio):  EMD = ∫|F_A − F_B| dv evaluated EXACTLY on the
    merged micros support as Σ |cumA·n_B − cumB·n_A|·Δvm over support
    gaps (integers; Python big ints in the value-count-bounded finish),
    with one closing round6 division.  Histogram plan as the quantile
    family: per-batch (type, vm) counts, vm-bounded merge.  Returns one
    row (type_a, type_b, n_a, n_b, emd)."""
    import pandas as pd

    from deepkg_ray.functions.numeric import to_micros
    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"t": b[type_col].to_pylist(),
                           "vm": to_micros(b[col].to_pylist())})
        g = (df.groupby(["t", "vm"], as_index=False).size()
             .rename(columns={"size": "c"}))
        g["c"] = g["c"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = merge_partials(
        ds.select_columns([type_col, col]).map_batches(
            partial, batch_format="pyarrow"),
        ["t", "vm"], {"c": "sum"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        types = sorted(df["t"].unique())[:2]
        ta, tb = types[0], types[1]
        d = df[df["t"].isin(types)].sort_values("vm", kind="stable")
        vm = np.sort(d["vm"].unique())
        ca = np.zeros(len(vm), np.int64)
        cb = np.zeros(len(vm), np.int64)
        da = d[d["t"] == ta]
        db = d[d["t"] == tb]
        ca[np.searchsorted(vm, da["vm"].to_numpy(np.int64))] = \
            da["c"].to_numpy(np.int64)
        cb[np.searchsorted(vm, db["vm"].to_numpy(np.int64))] = \
            db["c"].to_numpy(np.int64)
        na, nb = int(ca.sum()), int(cb.sum())
        cumA = np.cumsum(ca)
        cumB = np.cumsum(cb)
        gaps = np.diff(vm)
        s = int(np.abs(cumA[:-1].astype(object) * nb
                       - cumB[:-1].astype(object) * na).dot(
                           gaps.astype(object)))   # exact big-int sum
        emd = np.floor(float(s) / (na * nb) / 1e6 * 1e6 + 0.5) / 1e6
        return pd.DataFrame({"type_a": [ta], "type_b": [tb],
                             "n_a": [na], "n_b": [nb], "emd": [emd]})

    return hist.map_batches(finish, batch_format="pandas",
                            batch_size=None)


def benford_digits(ds, col: str = "value"):
    """Benford first-significant-digit audit of the positive values —
    the classic fabricated/synthetic-data forensic: observed share per
    leading digit vs log10(1 + 1/d).  The leading digit of value equals
    the leading digit of its micros int (scaling by 10⁶ preserves it),
    so extraction is string-free integer math; counts merge on 9 cells.
    Returns (digit, n, share, benford, excess) — share/benford/excess
    round6."""
    import pandas as pd

    from deepkg_ray.functions.numeric import round6, to_micros
    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pa.Table:
        vm = to_micros(b[col].to_pylist())
        vm = vm[vm > 0]
        # strip trailing decimal magnitude: first digit of the int
        d = vm.copy()
        while (d >= 10).any():
            d = np.where(d >= 10, d // 10, d)
        dig, cnt = np.unique(d, return_counts=True)
        return pa.table({"digit": pa.array(dig.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    merged = merge_partials(
        ds.select_columns([col]).map_batches(partial,
                                             batch_format="pyarrow"),
        ["digit"], {"n": "sum"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("digit", kind="stable").reset_index(drop=True)
        n = df["n"].to_numpy(np.int64)
        tot = int(n.sum())
        dig = df["digit"].to_numpy(np.int64)
        share = round6(n / tot)
        benford = round6(np.log10(1.0 + 1.0 / dig))
        return pd.DataFrame({
            "digit": dig, "n": n, "share": share, "benford": benford,
            "excess": round6(share - benford)})

    return merged.map_batches(finish, batch_format="pandas",
                              batch_size=None)
