"""Event-time windowed aggregates and sessionization over the events table.

Ray Data has no event-time windowing primitives (SURVEY.md §2.9: neither
does the reference — strictly batch).  Windows are expressed as derived
bucket columns + groupby (tumbling), and sessionization as per-key ordered
processing inside ``groupby(key).map_groups`` — the same
sort-within-partition contract the KG pipeline uses for stable turn
ordering.  Ordering assumption: rows within a (user) group are sorted by
(ts, event_id) inside the group function; block arrival order is never
relied on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Sum

from deepkg_ray.functions.numeric import round6, to_micros


def tumbling_window(ds, window_sec: int, ts_col: str = "ts",
                    key_col: str = "event_type", value_col: str = "value"):
    """(key, window_start_us, n_events, sum_value): tumbling event-time
    window via epoch-bucket column + groupby."""
    win_us = window_sec * 1_000_000

    def add_bucket(b: pa.Table) -> pa.Table:
        # normalize to µs regardless of the source timestamp unit
        us = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        bucket = pc.multiply(pc.divide(us, win_us), win_us)  # int floor-div
        # float measure → scaled int64 so the partial-aggregate sum is
        # order-independent and oracle-hash-exact (functions/numeric.py)
        micros = pa.array(to_micros(b[value_col].to_pylist()), pa.int64())
        return pa.table({key_col: b[key_col],
                         "window_start_us": bucket,
                         "v_micros": micros})

    bucketed = ds.select_columns([key_col, ts_col, value_col]).map_batches(
        add_bucket, batch_format="pyarrow")
    agg = (bucketed.groupby([key_col, "window_start_us"])
           .aggregate(Count(alias_name="n_events"),
                      Sum("v_micros", alias_name="v_micros")))

    def finish(b: pa.Table) -> pa.Table:
        v = np.asarray(b["v_micros"].to_pylist(), np.float64) / 1e6
        return (b.drop_columns(["v_micros"])
                .append_column("sum_value", pa.array(v, pa.float64())))
    return agg.map_batches(finish, batch_format="pyarrow")


def hopping_window(ds, window_sec: int, hop_sec: int, ts_col: str = "ts",
                   key_col: str = "event_type", value_col: str = "value"):
    """(key, window_start_us, n_events, sum_value): hopping (sliding)
    event-time window — window length ``window_sec`` advancing every
    ``hop_sec``.  Each event is exploded into its window_sec/hop_sec
    covering windows (k·hop ≤ t < k·hop + win ⇔
    floor((t-win)/hop)+1 ≤ k ≤ floor(t/hop)) and the rest is the same
    partial-sum groupby as the tumbling window — no ordering or state
    needed, so it shuffles exactly one small row per (event, window)."""
    assert window_sec % hop_sec == 0, "window must be a multiple of hop"
    win_us = window_sec * 1_000_000
    hop_us = hop_sec * 1_000_000
    n_covers = window_sec // hop_sec

    def explode(b: pa.Table) -> pa.Table:
        us = (b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        micros = np.asarray(to_micros(b[value_col].to_pylist()), np.int64)
        keys = b[key_col].to_numpy(zero_copy_only=False)
        k_max = us // hop_us                       # int floor (us ≥ 0)
        # one row per covering window, built vectorized via tiling
        offs = np.arange(n_covers, dtype=np.int64)
        starts = (k_max[:, None] - offs[None, :]) * hop_us   # (rows, covers)
        return pa.table({
            key_col: pa.array(np.repeat(keys, n_covers)),
            "window_start_us": pa.array(starts.ravel(), pa.int64()),
            "v_micros": pa.array(np.repeat(micros, n_covers), pa.int64()),
        })

    bucketed = ds.select_columns([key_col, ts_col, value_col]).map_batches(
        explode, batch_format="pyarrow")
    agg = (bucketed.groupby([key_col, "window_start_us"])
           .aggregate(Count(alias_name="n_events"),
                      Sum("v_micros", alias_name="v_micros")))

    def finish(b: pa.Table) -> pa.Table:
        v = np.asarray(b["v_micros"].to_pylist(), np.float64) / 1e6
        return (b.drop_columns(["v_micros"])
                .append_column("sum_value", pa.array(v, pa.float64())))
    return agg.map_batches(finish, batch_format="pyarrow")


def moving_average(ds, k: int = 3, user_col: str = "user_id",
                   ts_col: str = "ts", id_col: str = "event_id",
                   value_col: str = "value", n_parts: int = 64):
    """Trailing k-row moving average of ``value`` per user in event-time
    order — the ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW windowed
    aggregate (reference has no streaming ops; this extends §2.9 alongside
    tumbling/hopping/sessionize).

    Shuffle shape: users are hashed into ``n_parts`` user-complete coarse
    partitions (same plan as convgroup.turn_latency) — one groupby over
    ~n_parts groups, each processed with one vectorized sort + shifted-sum
    pass; per-user state never leaves the task and no per-user group ever
    stands alone as a straggler.

    Exactness: per-row micros (numeric.to_micros), window sum is an exact
    int64, avg = floor(sum/n + 0.5)/1e6 evaluated identically in SQL.
    Returns (user_id, event_id, n_window, ma_value)."""
    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        return pa.table({
            user_col: b[user_col], id_col: b[id_col],
            "ts_us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "vm": pa.array(to_micros(b[value_col].to_pylist()), pa.int64()),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "ts_us", id_col], kind="stable")
        users = g[user_col].to_numpy()
        vm = g["vm"].to_numpy(dtype=np.int64)
        n = len(g)
        s = vm.copy()
        cnt = np.ones(n, np.int64)
        for lag in range(1, k):
            same = users[lag:] == users[:-lag]      # same-user lag validity
            s[lag:] += np.where(same, vm[:-lag], 0)
            cnt[lag:] += same.astype(np.int64)
        ma = np.floor(s.astype(np.float64) / cnt + 0.5) / 1e6
        return pd.DataFrame({user_col: users,
                             id_col: g[id_col].to_numpy(),
                             "n_window": cnt, "ma_value": ma})

    parted = ds.select_columns([user_col, ts_col, id_col, value_col]) \
        .map_batches(add_part, batch_format="pyarrow")
    return parted.groupby("part").map_groups(per_partition,
                                             batch_format="pandas")


def sessionize(ds, gap_sec: int = 1800, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id"):
    """(user_id, n_sessions, n_events): session = maximal run of events with
    inter-event gap ≤ gap_sec, computed per user on (ts, id)-sorted rows."""
    gap_us = gap_sec * 1_000_000

    # derive an explicit int64 µs column in Arrow BEFORE any pandas
    # conversion — pandas datetime64 unit (ns vs us) is version/peer
    # dependent and silently breaks gap comparisons
    def add_us(b: pa.Table) -> pa.Table:
        return pa.table({user_col: b[user_col],
                         id_col: b[id_col],
                         "ts_us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())})

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", id_col], kind="stable")
        us = g["ts_us"].to_numpy()
        n_sessions = 1 + int((np.diff(us) > gap_us).sum()) if len(us) else 0
        return pd.DataFrame({user_col: [g[user_col].iloc[0]],
                             "n_sessions": np.array([n_sessions], np.int64),
                             "n_events": np.array([len(g)], np.int64)})

    return (ds.select_columns([user_col, ts_col, id_col])
            .map_batches(add_us, batch_format="pyarrow")
            .groupby(user_col).map_groups(per_user, batch_format="pandas"))


def cohort_retention(ds, bucket_sec: int = 86400, user_col: str = "user_id",
                     ts_col: str = "ts", n_parts: int = 64):
    """Cohort retention matrix over the event stream: users are cohorted by
    the epoch-day of their FIRST event, and each cell counts the distinct
    users of cohort d active exactly ``offset`` days later — the classic
    product-analytics retention triangle (reference is strictly batch; this
    extends §2.9 alongside funnel/sessionize).

    Plan: users hashed into ``n_parts`` user-complete coarse partitions; in
    each partition one vectorized pass dedups (user, day), takes the
    per-user min day (cohort) and emits per-(cohort, offset) PARTIAL
    counts — each user contributes to a cell at most once globally because
    its rows are partition-complete, so the partials sum exactly.  The
    final groupby is over cohort_days × offsets (calendar-bounded), never
    row-shaped.  Returns (cohort_day, day_offset, n_users)."""
    bucket_us = bucket_sec * 1_000_000

    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        us = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({
            user_col: b[user_col],
            "day": pc.divide(us, bucket_us),   # int floor-div (us ≥ 0)
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates([user_col, "day"])
        cohort = d.groupby(user_col)["day"].transform("min").to_numpy()
        out = pd.DataFrame({"cohort_day": cohort,
                            "day_offset": d["day"].to_numpy() - cohort})
        p = (out.groupby(["cohort_day", "day_offset"], as_index=False)
             .size().rename(columns={"size": "n_users"}))
        p["n_users"] = p["n_users"].astype(np.int64)
        return p

    parted = ds.select_columns([user_col, ts_col]).map_batches(
        add_part, batch_format="pyarrow")
    partials = parted.groupby("part").map_groups(per_partition,
                                                 batch_format="pandas")
    return (partials.groupby(["cohort_day", "day_offset"])
            .aggregate(Sum("n_users", alias_name="n_users")))


def rank_events(ds, n_tiles: int = 4, key_col: str = "event_type",
                id_col: str = "event_id", value_col: str = "value"):
    """Per-key rank analytics: SQL ``percent_rank()`` and ``ntile(k)`` over
    (value, id)-ordered rows within each key — the ranking window-function
    family (ROW_NUMBER/PERCENT_RANK/NTILE) the reference lacks.

    The (value, id) composite order makes every rank deterministic (no
    ties), so percent_rank is exactly (rn−1)/(n−1) and ntile follows SQL's
    first-(n mod k)-buckets-get-one-extra rule, both reproduced verbatim in
    the oracle.  Partitioning assumption: one task per key (groupby
    map_groups) — per-key rows must fit a worker; for open key domains
    salt the key and merge rank offsets.  Returns
    (event_id, event_type, pct_rank, tile)."""
    def add_vm(b: pa.Table) -> pa.Table:
        return pa.table({
            key_col: b[key_col], id_col: b[id_col],
            "vm": pa.array(to_micros(b[value_col].to_pylist()), pa.int64()),
        })

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["vm", id_col], kind="stable")
        n = len(g)
        rn0 = np.arange(n, dtype=np.int64)
        pct = round6(rn0 / (n - 1)) if n > 1 else np.zeros(n)
        size, rem = divmod(n, n_tiles)
        big = rem * (size + 1)
        tile = np.where(rn0 < big, rn0 // max(size + 1, 1),
                        rem + (rn0 - big) // max(size, 1)) + 1
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             key_col: g[key_col].to_numpy(),
                             "pct_rank": pct,
                             "tile": tile.astype(np.int64)})

    return (ds.select_columns([key_col, id_col, value_col])
            .map_batches(add_vm, batch_format="pyarrow")
            .groupby(key_col).map_groups(per_key, batch_format="pandas"))


def interarrival_gaps(ds, user_col: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id", n_parts: int = 64):
    """Per-event gap to the SAME USER's previous event — the LAG window
    function (LAG(ts) OVER (PARTITION BY user ORDER BY ts, id)), the
    building block of inter-arrival / retention-latency analyses.

    Plan: user-complete coarse hash partitions, one sort + shifted-diff
    pass per partition (diff is per-user-segment valid, vectorized).
    First events per user have no predecessor and are dropped (SQL
    mirrors with IS NOT NULL).  Returns (user_id, event_id, gap_us)."""
    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        return pa.table({
            user_col: b[user_col], id_col: b[id_col],
            "us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "us", id_col], kind="stable")
        users = g[user_col].to_numpy()
        us = g["us"].to_numpy(np.int64)
        same = np.concatenate(([False], users[1:] == users[:-1]))
        gap = np.concatenate(([0], us[1:] - us[:-1]))
        return pd.DataFrame({user_col: users[same],
                             id_col: g[id_col].to_numpy()[same],
                             "gap_us": gap[same]})

    parted = ds.select_columns([user_col, ts_col, id_col]).map_batches(
        add_part, batch_format="pyarrow")
    return parted.groupby("part").map_groups(per_partition,
                                             batch_format="pandas")


def pivot_counts(ds, types=("click", "error", "purchase", "signup", "view"),
                 ts_col: str = "ts", type_col: str = "event_type"):
    """PIVOT/crosstab: long (day-of-week, event_type) counts reshaped into
    one wide row per dow with an n_<type> column per pivot value.  The
    distributed pass is a dictionary-bounded groupby over the
    (dow × type) grid; the reshape runs in a single final task on that
    tiny grid — the wide table never exists distributed.  Pivot values
    must be a known, bounded list (same contract as SQL PIVOT ... IN)."""
    def add_keys(b: pa.Table) -> pa.Table:
        us = (b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        dow = (us // 86_400_000_000) % 7
        return pa.table({"dow": pa.array(dow, pa.int64()),
                         type_col: b[type_col]})

    grid = (ds.select_columns([ts_col, type_col])
            .map_batches(add_keys, batch_format="pyarrow")
            .groupby(["dow", type_col]).aggregate(Count(alias_name="n")))

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        out = {"dow": sorted(df["dow"].unique())}
        w = df.pivot_table(index="dow", columns=type_col, values="n",
                           aggfunc="sum", fill_value=0)
        for t in types:
            col = w[t] if t in w.columns else pd.Series(0, index=w.index)
            out[f"n_{t}"] = col.reindex(out["dow"], fill_value=0) \
                               .astype(np.int64).to_numpy()
        return pd.DataFrame(out)

    return grid.repartition(1).map_batches(widen, batch_format="pandas",
                                           batch_size=None)


def funnel_counts(ds, steps=("view", "click", "purchase"),
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts", n_parts: int = 64):
    """Ordered funnel analysis over the event stream: how many users
    completed step 1, steps 1→2 (strictly later), steps 1→2→3 — the
    classic product-analytics sequence-match aggregate (a per-key ORDERED
    pattern, not expressible as any single groupby).

    Plan: users hashed into ``n_parts`` user-complete coarse partitions;
    inside each partition the three stages resolve with vectorized merges
    (min ts of step1 per user → min ts of step2 AFTER it → …), never a
    Python loop per user; single-row partials then sum.  Strictly-greater
    µs comparisons make the result deterministic under timestamp ties.
    Returns one row (n_step1, n_step2, n_step3)."""
    assert len(steps) == 3
    s1, s2, s3 = steps

    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        return pa.table({
            user_col: b[user_col],
            type_col: b[type_col],
            "us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        a = (g[g[type_col] == s1].groupby(user_col, as_index=False)
             .agg(ta=("us", "min")))
        b2 = g[g[type_col] == s2].merge(a, on=user_col)
        b2 = (b2[b2["us"] > b2["ta"]].groupby(user_col, as_index=False)
              .agg(tb=("us", "min")))
        c = g[g[type_col] == s3].merge(b2, on=user_col)
        c = (c[c["us"] > c["tb"]].groupby(user_col, as_index=False)
             .agg(tc=("us", "min")))
        return pd.DataFrame({"n_step1": [np.int64(len(a))],
                             "n_step2": [np.int64(len(b2))],
                             "n_step3": [np.int64(len(c))]})

    parted = ds.select_columns([user_col, type_col, ts_col]).map_batches(
        add_part, batch_format="pyarrow")
    partials = parted.groupby("part").map_groups(per_partition,
                                                 batch_format="pandas")

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({c: [np.int64(df[c].sum())]
                             for c in ("n_step1", "n_step2", "n_step3")})
    return partials.repartition(1).map_batches(total, batch_format="pandas",
                                               batch_size=None)


def zscore_events(ds, key_col: str = "event_type", id_col: str = "event_id",
                  value_col: str = "value", z_cut: float = 3.0):
    """Per-key z-score standardization (and |z|>cut outlier flag) over the
    event stream — the feature-standardization / anomaly-gate primitive.

    Two streaming passes: (1) per-key moments (n, Σmicros, Σmicros(v²)) —
    a key-bounded aggregate, nothing row-shaped shuffles; (2) a broadcast
    map computes z with the FIXED op chain
        mean = Σv/1e6/n;  var = Σv²/1e6/n − mean²;  z = (v − mean)/√var
    — every step a correctly-rounded double op on integer inputs, so the
    SQL oracle evaluating the identical chain hash-matches (round6(z)).
    Keys whose variance is 0 emit z = 0.  Returns
    (event_id, event_type, z, is_outlier)."""
    from ray.data.aggregate import Count, Sum

    def moments(b: pa.Table) -> pa.Table:
        v = np.asarray(b[value_col].to_pylist(), np.float64)
        # v²·1e6 must fit int64 ⇒ |value| < ~3.0e6 (same convention as
        # corr_events' documented Σx² bound) — checked, not assumed
        if len(v) and float(np.abs(v).max()) >= 3.0e6:
            raise ValueError(
                f"zscore_events: |{value_col}| must be < 3.0e6 for the "
                f"int64-micros second moment (got {np.abs(v).max():.3g}); "
                "rescale the column or use a millis tier")
        return pa.table({
            key_col: b[key_col],
            "vm": pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64)),
            "v2m": pa.array(np.floor(v * v * 1e6 + 0.5).astype(np.int64)),
        })

    agg = (ds.select_columns([key_col, value_col])
           .map_batches(moments, batch_format="pyarrow")
           .groupby(key_col)
           .aggregate(Count(alias_name="n"), Sum("vm", alias_name="s1"),
                      Sum("v2m", alias_name="s2")))
    from deepkg_ray.util import rows_all
    agg = rows_all(agg)
    stats = {}
    for r in agg:
        n = float(r["n"])
        mean = float(r["s1"]) / 1e6 / n
        var = float(r["s2"]) / 1e6 / n - mean * mean
        stats[r[key_col]] = (mean, np.sqrt(var) if var > 0 else 0.0)

    def score(b: pa.Table) -> pa.Table:
        v = np.asarray(b[value_col].to_pylist(), np.float64)
        keys = b[key_col].to_pylist()
        mean = np.fromiter((stats[k][0] for k in keys), np.float64, len(keys))
        std = np.fromiter((stats[k][1] for k in keys), np.float64, len(keys))
        z = np.where(std > 0, (v - mean) / np.where(std > 0, std, 1.0), 0.0)
        z = round6(z)
        return pa.table({
            id_col: b[id_col], key_col: b[key_col],
            "z": pa.array(z, pa.float64()),
            "is_outlier": pa.array(np.abs(z) > z_cut),
        })

    return ds.select_columns([id_col, key_col, value_col]).map_batches(
        score, batch_format="pyarrow")


def corr_events(ds, key_col: str = "event_type", ts_col: str = "ts",
                value_col: str = "value"):
    """Per-key Pearson correlation between value and hour-of-day — the
    single-pass mergeable-moments pattern: each batch emits per-key
    partials (n, Σx, Σy, Σxy, Σx², Σy²) with x = value-MILLIS (int64 —
    millis not micros so Σx² stays in int64: per-key n·x² < 2^63 needs
    n ≲ 3e7 at this value range; r is invariant to the linear scale) and
    y = hour (0-23); the groupby merges key-bounded six-tuples, never
    rows.  The final r is evaluated on DOUBLE-cast sums with the FIXED op
    chain  num = n·Σxy − Σx·Σy;  r = num / (√(n·Σx²−Σx²ᵥ)·√(n·Σy²−Σy²ᵥ))
    — identical in the SQL oracle, so round6(r) hash-matches (DuckDB's
    own corr() uses a different numerical path and would not).  Zero
    variance ⇒ r = 0.  Returns (event_type, n, corr_r)."""
    def partial(b: pa.Table) -> pa.Table:
        v = np.asarray(b[value_col].to_pylist(), np.float64)
        x = np.floor(v * 1e3 + 0.5).astype(np.int64)
        us = (b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        y = (us // 3_600_000_000) % 24
        return pa.table({
            key_col: b[key_col],
            "sx": pa.array(x), "sy": pa.array(y),
            "sxy": pa.array(x * y), "sxx": pa.array(x * x),
            "syy": pa.array(y * y),
        })

    agg = (ds.select_columns([key_col, ts_col, value_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(key_col)
           .aggregate(Count(alias_name="n"),
                      Sum("sx", alias_name="sx"), Sum("sy", alias_name="sy"),
                      Sum("sxy", alias_name="sxy"),
                      Sum("sxx", alias_name="sxx"),
                      Sum("syy", alias_name="syy")))

    def finish(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n"].to_pylist(), np.float64)
        sx = np.asarray(b["sx"].to_pylist(), np.float64)
        sy = np.asarray(b["sy"].to_pylist(), np.float64)
        sxy = np.asarray(b["sxy"].to_pylist(), np.float64)
        sxx = np.asarray(b["sxx"].to_pylist(), np.float64)
        syy = np.asarray(b["syy"].to_pylist(), np.float64)
        num = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        den = np.sqrt(vx) * np.sqrt(vy)
        r = round6(np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0))
        return pa.table({key_col: b[key_col],
                         "n": b["n"].combine_chunks().cast(pa.int64()),
                         "corr_r": pa.array(r, pa.float64())})
    return agg.map_batches(finish, batch_format="pyarrow")


def top_events_with_ties(ds, k: int = 2, key_col: str = "event_type",
                         id_col: str = "event_id",
                         value_col: str = "value"):
    """Per-key top-k WITH TIES: every event whose value-micros is among
    the key's k highest DISTINCT values — SQL dense_rank() ≤ k, the
    ties-inclusive complement of the rank-based top_events_per_type.
    One groupby per key; inside, a vectorized distinct-sort + isin mask.
    Returns (event_type, event_id, vrank)."""
    def add_vm(b: pa.Table) -> pa.Table:
        return pa.table({
            key_col: b[key_col], id_col: b[id_col],
            "vm": pa.array(to_micros(b[value_col].to_pylist()), pa.int64()),
        })

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        vm = g["vm"].to_numpy(np.int64)
        top = np.unique(vm)[::-1][:k]              # k highest distinct
        rank_of = {v: i + 1 for i, v in enumerate(top)}
        keep = np.isin(vm, top)
        return pd.DataFrame({
            key_col: g[key_col].to_numpy()[keep],
            id_col: g[id_col].to_numpy()[keep],
            "vrank": np.array([rank_of[v] for v in vm[keep]], np.int64),
        })

    return (ds.select_columns([key_col, id_col, value_col])
            .map_batches(add_vm, batch_format="pyarrow")
            .groupby(key_col).map_groups(per_key, batch_format="pandas"))


def time_window_sum(ds, window_sec: int = 600, user_col: str = "user_id",
                    ts_col: str = "ts", id_col: str = "event_id",
                    value_col: str = "value", n_parts: int = 64):
    """Trailing TIME-window sum per key — the RANGE-frame windowed
    aggregate (SUM OVER ... RANGE BETWEEN W PRECEDING AND CURRENT ROW),
    complementing the ROWS-frame moving_average above.  SQL RANGE-frame
    semantics are preserved exactly: the frame covers ALL rows with
    timestamp in [t−W, t], including same-timestamp peers, so the result
    is deterministic under timestamp ties.

    Plan: user-complete coarse hash partitions; inside each partition one
    sort + per-user-segment cumulative-sum with two binary searches per
    row (vectorized searchsorted over the segment) — the loop is over
    KEYS in the partition, not rows.  Window sums are exact int64 micros.
    Returns (user_id, event_id, n_in_window, win_sum)."""
    win_us = window_sec * 1_000_000

    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        return pa.table({
            user_col: b[user_col], id_col: b[id_col],
            "us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "vm": pa.array(to_micros(b[value_col].to_pylist()), pa.int64()),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "us", id_col], kind="stable")
        users = g[user_col].to_numpy()
        us = g["us"].to_numpy(np.int64)
        vm = g["vm"].to_numpy(np.int64)
        n = len(g)
        out_sum = np.zeros(n, np.int64)
        out_n = np.zeros(n, np.int64)
        # user segment boundaries (users are contiguous after the sort)
        seg = np.flatnonzero(np.concatenate(
            ([True], users[1:] != users[:-1], [True])))
        for si in range(len(seg) - 1):
            a, b2 = seg[si], seg[si + 1]
            u = us[a:b2]
            cum = np.concatenate(([0], vm[a:b2].cumsum()))
            lo = np.searchsorted(u, u - win_us, side="left")
            hi = np.searchsorted(u, u, side="right")
            out_sum[a:b2] = cum[hi] - cum[lo]
            out_n[a:b2] = hi - lo
        return pd.DataFrame({
            user_col: users, id_col: g[id_col].to_numpy(),
            "n_in_window": out_n,
            "win_sum": out_sum.astype(np.float64) / 1e6})

    parted = ds.select_columns([user_col, ts_col, id_col, value_col]) \
        .map_batches(add_part, batch_format="pyarrow")
    return parted.groupby("part").map_groups(per_partition,
                                             batch_format="pandas")


def resample_ohlc(ds, window_sec: int = 300, user_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  value_col: str = "value"):
    """Time-series downsample: per (user, tumbling window) emit
    (n_events, v_first, v_last, v_min, v_max) — the OHLC/resample
    primitive (open/close = first/last by the total (ts, event_id) order,
    high/low = max/min).

    Scale shape: the per-batch combiner reduces each block to ONE partial
    row per (user, window) seen in that block — the partial
    (first_key, first_vm, last_key, last_vm, vmin, vmax, n) is
    associative-mergeable, so the shuffle carries O(keys x blocks) tiny
    rows, never the events.  Partials merge inside user-complete coarse
    hash partitions — two lexsorts + reduceat per partition, never a
    per-key Python call (the unbounded (user, window) key space shuffles
    as ~64 coarse parts).  Values travel as int64 micros; the float divide +
    round6 happens once at finish (oracle: events_resample_oracle, same
    op chain via row_number rn=1 / rn=n joins)."""
    win_us = window_sec * 1_000_000

    def partials(b: pa.Table) -> pd.DataFrame:
        us = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        u = b[user_col].to_numpy(zero_copy_only=False)
        w = (us // win_us) * win_us
        eid = b[id_col].to_numpy(zero_copy_only=False)
        vm = to_micros(b[value_col].to_pylist())
        # one lexsort, then segment extrema via reduceat — no pandas
        # mixed-function agg (repo convention: that's the slow per-group path)
        order = np.lexsort((eid, us, w, u))
        u, w, us, eid, vm = u[order], w[order], us[order], eid[order], \
            vm[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], (u[1:] != u[:-1]) | (w[1:] != w[:-1]))))
        ends = np.concatenate((starts[1:], [len(u)]))
        return pd.DataFrame({
            "u": u[starts], "w": w[starts],
            "first_us": us[starts], "first_eid": eid[starts],
            "first_vm": vm[starts],
            "last_us": us[ends - 1], "last_eid": eid[ends - 1],
            "last_vm": vm[ends - 1],
            "vmin": np.minimum.reduceat(vm, starts),
            "vmax": np.maximum.reduceat(vm, starts),
            "n": (ends - starts).astype(np.int64),
        })

    def add_part(df: pd.DataFrame, n_parts: int = 64) -> pd.DataFrame:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(df["u"].tolist())
        df["part"] = (h % np.uint64(n_parts)).astype(np.int32)
        return df

    def merge_partition(g: pd.DataFrame) -> pd.DataFrame:
        # user-complete partition: every partial of a (u, w) key is here.
        # firsts by (first_us, first_eid) order, lasts by (last_us,
        # last_eid) — two lexsorts + reduceat, no per-key Python.
        u = g["u"].to_numpy()
        w = g["w"].to_numpy(np.int64)
        of = np.lexsort((g["first_eid"].to_numpy(), g["first_us"].to_numpy(),
                         w, u))
        seg = np.concatenate(([True], (u[of][1:] != u[of][:-1])
                              | (w[of][1:] != w[of][:-1])))
        starts = np.flatnonzero(seg)
        ends = np.concatenate((starts[1:], [len(u)]))
        ol = np.lexsort((g["last_eid"].to_numpy(), g["last_us"].to_numpy(),
                         w, u))
        return pd.DataFrame({
            user_col: u[of][starts],
            "window_start_us": w[of][starts],
            "n_events": np.add.reduceat(
                g["n"].to_numpy(np.int64)[of], starts).astype(np.int64),
            "v_first": round6(
                g["first_vm"].to_numpy(np.int64)[of][starts] / 1e6),
            "v_last": round6(
                g["last_vm"].to_numpy(np.int64)[ol][ends - 1] / 1e6),
            "v_min": round6(np.minimum.reduceat(
                g["vmin"].to_numpy(np.int64)[of], starts) / 1e6),
            "v_max": round6(np.maximum.reduceat(
                g["vmax"].to_numpy(np.int64)[of], starts) / 1e6),
        })

    parts = ds.select_columns([user_col, ts_col, id_col, value_col]) \
        .map_batches(partials, batch_format="pyarrow") \
        .map_batches(add_part, batch_format="pandas")
    return parts.groupby("part").map_groups(merge_partition,
                                            batch_format="pandas")


def state_history(ds, user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id", key_col: str = "event_type",
                  n_parts: int = 64):
    """SCD2-style state history: collapse each user's consecutive runs of
    equal ``event_type`` into validity intervals
    (user, type, valid_from_us, valid_to_us, n_events) — the
    gaps-and-islands pattern (SQL: rn − rn_per_type island key, island
    aggregate, LEAD(valid_from) for the closing edge; open intervals get
    the -1 sentinel).

    Plan: user-complete coarse hash partitions (same contract as
    interarrival_gaps), then ONE vectorized run-length encode per
    partition — run starts are `user-change | type-change` boundaries on
    the (user, ts, event_id)-sorted frame, never a Python loop over rows.
    Shuffle carries only (user, type, ts µs, id) — the output is
    run-count-sized, bounded by the input but typically far smaller."""
    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        return pa.table({
            user_col: b[user_col], key_col: b[key_col], id_col: b[id_col],
            "us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "us", id_col], kind="stable")
        users = g[user_col].to_numpy()
        types = g[key_col].to_numpy()
        us = g["us"].to_numpy(np.int64)
        n = len(g)
        new_run = np.concatenate(([True], (users[1:] != users[:-1])
                                  | (types[1:] != types[:-1])))
        starts = np.flatnonzero(new_run)
        ends = np.concatenate((starts[1:], [n]))
        run_user = users[starts]
        valid_from = us[starts]
        same_next = np.concatenate((run_user[1:] == run_user[:-1], [False]))
        nxt_from = np.concatenate((valid_from[1:], [-1]))
        return pd.DataFrame({
            user_col: run_user,
            key_col: types[starts],
            "valid_from_us": valid_from,
            "valid_to_us": np.where(same_next, nxt_from, -1).astype(np.int64),
            "n_events": (ends - starts).astype(np.int64),
        })

    parted = ds.select_columns([user_col, ts_col, id_col, key_col]) \
        .map_batches(add_part, batch_format="pyarrow")
    return parted.groupby("part").map_groups(per_partition,
                                             batch_format="pandas")


def markov_transitions(ds, user_col: str = "user_id", ts_col: str = "ts",
                       id_col: str = "event_id",
                       key_col: str = "event_type", n_parts: int = 64):
    """First-order Markov transition matrix over each user's event-type
    sequence: (src_type, dst_type, n, p) with p = n / Σ_dst n — the
    LEAD-pair count + row-normalization (sequence-mining building block).

    Plan: user-complete coarse partitions → vectorized consecutive-pair
    extraction + per-partition value_counts (the combiner), then
    treeagg.merge_partials over the |types|² bounded key space (repo convention:
    tree, not shuffle, for dictionary-sized keys).  The row-normalizing
    divide happens once on the final ≤|types|² rows (repartition(1) —
    bounded by construction) so p is a single correctly-rounded float op
    on exact integer counts, identical to the SQL oracle's op chain."""
    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        return pa.table({
            user_col: b[user_col], key_col: b[key_col], id_col: b[id_col],
            "us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "us", id_col], kind="stable")
        users = g[user_col].to_numpy()
        types = g[key_col].to_numpy()
        same = users[1:] == users[:-1]
        src, dst = types[:-1][same], types[1:][same]
        if not len(src):
            return pd.DataFrame({"src_type": pd.Series([], dtype=object),
                                 "dst_type": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        c = (pd.DataFrame({"src_type": src, "dst_type": dst})
             .value_counts().reset_index(name="n"))
        c["n"] = c["n"].astype(np.int64)
        return c

    from deepkg_ray.stages.treeagg import merge_partials
    parts = ds.select_columns([user_col, ts_col, id_col, key_col]) \
        .map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(per_partition, batch_format="pandas")
    merged = merge_partials(parts, ["src_type", "dst_type"], {"n": "sum"},
                            mode="tree")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("src_type")["n"].transform("sum") \
            .to_numpy(np.float64)
        out = df.copy()
        out["p"] = round6(out["n"].to_numpy(np.float64) / tot)
        return out

    return merged.repartition(1).map_batches(finish, batch_format="pandas",
                                             batch_size=None)


def regression_events(ds, key_col: str = "event_type", ts_col: str = "ts",
                      value_col: str = "value"):
    """Per-key OLS fit value ~ hour-of-day: (event_type, n, slope,
    intercept) — the grouped-regression primitive, single-pass mergeable
    moments like corr_events (x = hour 0-23, y = value in int64 MILLIS so
    Σy² stays in int64; see corr_events' bound note).  The finish divides
    on DOUBLE-cast integer sums with a FIXED op chain —
        num = n·Σxy − Σx·Σy;   den = n·Σx² − (Σx)²
        slope = (num/den)/1e3;  intercept = ((Σy − (num/den)·Σx)/n)/1e3
    — identical in the SQL oracle (DuckDB's regr_slope uses a different
    numerical path and would not hash-match).  Zero x-variance ⇒ slope 0,
    intercept = mean.  round6 on both outputs."""
    def partial(b: pa.Table) -> pa.Table:
        v = np.asarray(b[value_col].to_pylist(), np.float64)
        y = np.floor(v * 1e3 + 0.5).astype(np.int64)
        us = (b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        x = (us // 3_600_000_000) % 24
        return pa.table({
            key_col: b[key_col],
            "sx": pa.array(x), "sy": pa.array(y),
            "sxy": pa.array(x * y), "sxx": pa.array(x * x),
        })

    agg = (ds.select_columns([key_col, ts_col, value_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(key_col)
           .aggregate(Count(alias_name="n"),
                      Sum("sx", alias_name="sx"), Sum("sy", alias_name="sy"),
                      Sum("sxy", alias_name="sxy"),
                      Sum("sxx", alias_name="sxx")))

    def finish(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n"].to_pylist(), np.float64)
        sx = np.asarray(b["sx"].to_pylist(), np.float64)
        sy = np.asarray(b["sy"].to_pylist(), np.float64)
        sxy = np.asarray(b["sxy"].to_pylist(), np.float64)
        sxx = np.asarray(b["sxx"].to_pylist(), np.float64)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        m = np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0)
        slope = round6(m / 1e3)
        intercept = round6(((sy - m * sx) / n) / 1e3)
        return pa.table({key_col: b[key_col],
                         "n": b["n"].combine_chunks().cast(pa.int64()),
                         "slope": pa.array(slope, pa.float64()),
                         "intercept": pa.array(intercept, pa.float64())})
    return agg.map_batches(finish, batch_format="pyarrow")


def running_distinct(ds, user_col: str = "user_id", ts_col: str = "ts",
                     id_col: str = "event_id", key_col: str = "event_type",
                     n_parts: int = 64):
    """Per-event RUNNING COUNT DISTINCT: how many distinct event types the
    same user has seen up to and including this event — the windowed
    count(DISTINCT) that SQL engines can't frame directly (emulated as a
    first-occurrence flag + running SUM; same two-step op chain here).

    Plan: user-complete coarse partitions; inside each, one sort +
    vectorized first-occurrence mask (pandas duplicated over (user, type))
    + segment-rebased cumulative sum.  Returns (user_id, event_id,
    n_distinct_types)."""
    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        return pa.table({
            user_col: b[user_col], key_col: b[key_col], id_col: b[id_col],
            "us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "us", id_col], kind="stable")
        users = g[user_col].to_numpy()
        first = (~g.duplicated([user_col, key_col])).to_numpy() \
            .astype(np.int64)
        cs = first.cumsum()
        new_seg = np.concatenate(([True], users[1:] != users[:-1]))
        seg_id = np.cumsum(new_seg) - 1
        # cumsum value just before each segment start, rebased per segment
        seg_base = (cs[new_seg] - first[new_seg])[seg_id]
        return pd.DataFrame({
            user_col: users,
            id_col: g[id_col].to_numpy(),
            "n_distinct_types": cs - seg_base,
        })

    parted = ds.select_columns([user_col, ts_col, id_col, key_col]) \
        .map_batches(add_part, batch_format="pyarrow")
    return parted.groupby("part").map_groups(per_partition,
                                             batch_format="pandas")


def cume_dist_events(ds, key_col: str = "event_type",
                     id_col: str = "event_id", value_col: str = "value"):
    """SQL ``cume_dist()`` per key over value order — the TIE-AWARE rank
    window (every row in a tie class shares the fraction of rows ≤ it),
    complementing rank_events' tie-free percent_rank.

    Values are compared as exact int64 micros on both sides so tie classes
    are identical to the oracle's.  Per-key plan: one sorted pass,
    cume = searchsorted(vm, vm, 'right')/n, vectorized.  Partitioning
    assumption as rank_events: per-key rows fit one task (dictionary-sized
    key domain); salt + offset-merge for open domains.  Returns
    (event_id, event_type, cume_dist)."""
    def add_vm(b: pa.Table) -> pa.Table:
        return pa.table({
            key_col: b[key_col], id_col: b[id_col],
            "vm": pa.array(to_micros(b[value_col].to_pylist()), pa.int64()),
        })

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["vm", id_col], kind="stable")
        vm = g["vm"].to_numpy(np.int64)
        n = len(g)
        cume = round6(np.searchsorted(vm, vm, side="right") / n)
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             key_col: g[key_col].to_numpy(),
                             "cume_dist": cume})

    return (ds.select_columns([key_col, id_col, value_col])
            .map_batches(add_vm, batch_format="pyarrow")
            .groupby(key_col).map_groups(per_key, batch_format="pandas"))


def mode_per_user(ds, user_col: str = "user_id", key_col: str = "event_type",
                  n_parts: int = 64):
    """Grouped MODE: each user's most frequent event type, ties broken by
    lexicographically smallest type — the statistical-mode aggregate SQL
    spells as row_number() over (partition by user order by cnt desc, type).

    Plan: (user, type) Count groupby first (combiner-first, output bounded
    by users × type-dictionary), then user-complete coarse hash partitions
    where one lexsort + first-row-per-user pass picks the argmax — the
    per-partition merge pattern of interarrival_gaps, never one task per
    user.  Returns (user_id, mode_type, mode_count)."""
    counts = (ds.select_columns([user_col, key_col])
              .groupby([user_col, key_col])
              .aggregate(Count(alias_name="cnt")))

    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        return pa.table({
            user_col: b[user_col], key_col: b[key_col],
            "cnt": b["cnt"].combine_chunks().cast(pa.int64()),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "cnt", key_col],
                          ascending=[True, False, True], kind="stable")
        users = g[user_col].to_numpy()
        first = np.concatenate(([True], users[1:] != users[:-1]))
        return pd.DataFrame({user_col: users[first],
                             "mode_type": g[key_col].to_numpy()[first],
                             "mode_count": g["cnt"].to_numpy(np.int64)[first]})

    parted = counts.map_batches(add_part, batch_format="pyarrow")
    return parted.groupby("part").map_groups(per_partition,
                                             batch_format="pandas")


def props_extract_stats(ds, props_col: str = "props",
                        key_col: str = "event_type"):
    """Semi-structured extraction: pull the integer field ``k`` out of the
    JSON props column with ONE vectorized regex pass (compiled once, pandas
    str.extract — no per-row json.loads loop), then per-type
    count/sum/min/max via combiner-first groupby.  Rows without the field
    are dropped (the oracle's IS NOT NULL).  The regex '"k"\\s*:\\s*(\\d+)'
    is in the re∩RE2 common subset, the same contract as scrub.py's PII
    patterns, so DuckDB's json_extract agrees on this corpus shape.
    Returns (event_type, n, sum_k, min_k, max_k)."""
    from ray.data.aggregate import Count as _Count, Max, Min, Sum as _Sum

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        k = df[props_col].str.extract(r'"k"\s*:\s*(\d+)', expand=False)
        ok = k.notna()
        return pd.DataFrame({
            key_col: df[key_col].to_numpy()[ok.to_numpy()],
            "k": k[ok].astype(np.int64).to_numpy()})

    agg = (ds.select_columns([key_col, props_col])
           .map_batches(extract, batch_format="pandas")
           .groupby(key_col)
           .aggregate(_Count(alias_name="n"),
                      _Sum("k", alias_name="sum_k"),
                      Min("k", alias_name="min_k"),
                      Max("k", alias_name="max_k")))

    def cast(b: pa.Table) -> pa.Table:
        return pa.table({
            key_col: b[key_col],
            "n": b["n"].combine_chunks().cast(pa.int64()),
            "sum_k": b["sum_k"].combine_chunks().cast(pa.int64()),
            "min_k": b["min_k"].combine_chunks().cast(pa.int64()),
            "max_k": b["max_k"].combine_chunks().cast(pa.int64())})
    return agg.map_batches(cast, batch_format="pyarrow")


def chi_square_independence(ds, ts_col: str = "ts",
                            type_col: str = "event_type"):
    """Pearson χ² test of independence between day-of-week and event type:
    χ² = Σ_cells (O − E)²/E with E = row·col/N over the FULL dow × type
    grid (unobserved cells contribute E, as the test requires).

    The distributed pass is the dictionary-bounded (dow, type) Count
    groupby of pivot_counts; the ≤ 7×|types| grid is finished in one final
    task — margins, expected counts and the cell sum never exist
    distributed.  All counts are exact int64; E and the terms are doubles
    (cross-backend Σ-order differences are below the 6-dp contract).
    Returns one row (chi2, dof, n)."""
    def add_keys(b: pa.Table) -> pa.Table:
        us = (b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        dow = (us // 86_400_000_000) % 7
        return pa.table({"dow": pa.array(dow, pa.int64()),
                         type_col: b[type_col]})

    grid = (ds.select_columns([ts_col, type_col])
            .map_batches(add_keys, batch_format="pyarrow")
            .groupby(["dow", type_col]).aggregate(Count(alias_name="n")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        wide = (df.pivot_table(index="dow", columns=type_col, values="n",
                               aggfunc="sum", fill_value=0)
                .astype(np.int64))
        obs = wide.to_numpy(np.float64)
        r = obs.sum(axis=1, keepdims=True)
        c = obs.sum(axis=0, keepdims=True)
        n = obs.sum()
        e = (r * c) / n
        chi2 = float(round6(np.asarray(
            [np.sum((obs - e) * (obs - e) / e)]))[0])
        dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
        return pd.DataFrame({"chi2": [chi2],
                             "dof": np.asarray([dof], np.int64),
                             "n": np.asarray([int(n)], np.int64)})

    return grid.repartition(1).map_batches(finish, batch_format="pandas",
                                           batch_size=None)


def max_drawdown(ds, user_col: str = "user_id", ts_col: str = "ts",
                 id_col: str = "event_id", value_col: str = "value",
                 n_parts: int = 64):
    """Per-user maximum drawdown of the cumulative value series in
    event-time order: max over t of (running-max(cumsum) − cumsum) — the
    chained SUM-OVER / MAX-OVER / grouped-MAX window composition.

    Shuffle shape: the moving_average user-complete coarse-partition plan
    (hash users into n_parts, one vectorized pass per partition) — per-user
    state never crosses tasks, no per-user straggler groups.  The running
    sums stay exact int64 micros end-to-end; the single /1e6 finish is
    mirrored in SQL.  Returns (user_id, n_events, max_drawdown_micros,
    max_drawdown)."""
    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        return pa.table({
            user_col: b[user_col], id_col: b[id_col],
            "ts_us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "vm": pa.array(to_micros(b[value_col].to_pylist()), pa.int64()),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "ts_us", id_col], kind="stable")
        run = g.groupby(user_col, sort=False)["vm"].cumsum().to_numpy(
            np.int64)
        g = g.assign(run=run)
        runmax = g.groupby(user_col, sort=False)["run"].cummax().to_numpy(
            np.int64)
        g = g.assign(dd=runmax - run)
        out = (g.groupby(user_col, sort=False)
               .agg(n_events=("dd", "size"),
                    max_drawdown_micros=("dd", "max"))
               .reset_index())
        return pd.DataFrame({
            user_col: out[user_col],
            "n_events": out["n_events"].astype(np.int64),
            "max_drawdown_micros":
                out["max_drawdown_micros"].astype(np.int64),
            "max_drawdown":
                out["max_drawdown_micros"].to_numpy(np.float64) / 1e6,
        })

    parted = ds.select_columns([user_col, ts_col, id_col, value_col]) \
        .map_batches(add_part, batch_format="pyarrow")
    return parted.groupby("part").map_groups(per_partition,
                                             batch_format="pandas")


def user_event_entropy(ds, user_col: str = "user_id",
                       type_col: str = "event_type"):
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity signal (one number per user; uniform usage →
    ln(n_types), single-type users → 0).

    Exactness: per-(user, type) counts from one combiner-first groupby;
    the per-user finish computes each term as
    floor(−(c/n)·ln(c/n)·1e6+0.5) int64 and integer-sums them —
    order-free, unlike a float Σ p·ln p — mirrored verbatim in SQL.
    The per-user type list is dictionary-sized, so the map_groups frame
    is tiny.  Returns (user_id, n_events, n_types, ent_micros, entropy)."""
    def count_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({user_col: b[user_col].to_pylist(),
                           type_col: b[type_col].to_pylist()})
        g = (df.groupby([user_col, type_col], sort=False).size()
             .reset_index(name="c"))
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (ds.select_columns([user_col, type_col])
              .map_batches(count_partial, batch_format="pyarrow")
              .groupby([user_col, type_col])
              .aggregate(Sum("c", alias_name="c")))

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(np.int64).astype(np.float64)
        n = c.sum()
        p = c / n
        terms = np.floor(-(p * np.log(p)) * 1e6 + 0.5).astype(np.int64)
        em = int(terms.sum())
        return pd.DataFrame({
            user_col: [g[user_col].iloc[0]],
            "n_events": np.asarray([int(n)], np.int64),
            "n_types": np.asarray([len(c)], np.int64),
            "ent_micros": np.asarray([em], np.int64),
            "entropy": np.asarray([em / 1e6], np.float64)})

    return counts.groupby(user_col).map_groups(per_user,
                                               batch_format="pandas")


def conversion_lag_quantiles(ds, first_type: str = "view",
                             then_type: str = "purchase",
                             qs=(0.25, 0.5, 0.75, 0.9),
                             user_col: str = "user_id", ts_col: str = "ts",
                             type_col: str = "event_type"):
    """Funnel latency distribution: per user, the lag from the FIRST
    ``first_type`` event to the FIRST ``then_type`` event (users with both,
    positive lags only), summarized as interpolated type-7 quantiles in
    whole seconds.

    Plan: per-batch (user, min_first, min_then) sentinel partials are
    exact Min combiners; one user-bounded groupby-Min; the surviving lag
    values feed quantiles_cont's value-count histogram (shuffle bounded by
    distinct lag values).  All arithmetic integer micros → integer
    seconds; interpolation is the module-standard micro-index chain.
    Returns (q, value)."""
    from deepkg_ray.stages.quantiles import quantiles_cont

    SENT = np.int64(2**62)

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            user_col: b[user_col].to_pylist(),
            "t": np.asarray(b[type_col].to_pylist(), object),
            "us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
                  .to_numpy(zero_copy_only=False),
        })
        df["v"] = np.where(df["t"] == first_type, df["us"], SENT)
        df["p"] = np.where(df["t"] == then_type, df["us"], SENT)
        g = (df.groupby(user_col, sort=False)
             .agg(v=("v", "min"), p=("p", "min")).reset_index())
        return pa.Table.from_pandas(g[[user_col, "v", "p"]],
                                    preserve_index=False)

    from ray.data.aggregate import Min
    per_user = (ds.select_columns([user_col, ts_col, type_col])
                .map_batches(partial, batch_format="pyarrow")
                .groupby(user_col)
                .aggregate(Min("v", alias_name="v"),
                           Min("p", alias_name="p")))

    def lags(b: pa.Table) -> pa.Table:
        v = b["v"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        p = b["p"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = (v < SENT) & (p < SENT) & (p > v)
        lag_s = (p[keep] - v[keep]) // 1_000_000
        return pa.table({"lag_s": pa.array(lag_s, pa.int64())})

    return quantiles_cont(per_user.map_batches(lags,
                                               batch_format="pyarrow"),
                          "lag_s", list(qs))


def timed_conversions(ds, first_type: str = "view",
                      then_type: str = "purchase", window_sec: int = 3600,
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type", n_parts: int = 64):
    """Time-bounded sequential conversion count: per user, how many
    ``then_type`` events have at least one ``first_type`` event in the
    strictly-preceding ``window_sec`` window — the timed funnel step
    (events_funnel counts unordered presence; this enforces order AND
    recency, the as-of-join shape on a single stream).

    Plan: the user-complete coarse-partition contract (moving_average);
    inside a partition both sides sort once and every containment test is
    one vectorized np.searchsorted over an integer (user, ts) encoding —
    no per-user Python loop.  Returns (user_id, n_then, n_converted)."""
    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        return pa.table({
            user_col: b[user_col],
            "t": b[type_col],
            "ts_us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
        })

    win_us = np.int64(window_sec) * 1_000_000

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        users, uidx = np.unique(g[user_col].to_numpy(), return_inverse=True)
        ts = g["ts_us"].to_numpy(np.int64)
        t = np.asarray(g["t"].to_numpy(), object)
        tmin = ts.min() if len(ts) else np.int64(0)
        span = np.int64(ts.max() - tmin + win_us + 2) if len(ts) else np.int64(1)
        # the (user, ts) packing must fit int64 or searchsorted containment
        # silently wraps — fail loudly, mirroring the graph PACK asserts
        assert int(len(users)) * int(span) < 2 ** 63, (
            "timed_conversions: users*span overflows int64 "
            f"({len(users)} users x span {int(span)} us)")
        key = uidx.astype(np.int64) * span + (ts - tmin)

        vkey = np.sort(key[t == first_type])
        is_then = t == then_type
        pk = key[is_then]
        pu = uidx[is_then]
        # a view exists in [p−win, p) ⟺ the sorted view-key array has an
        # element in [pk−win, pk) — same user guaranteed because the span
        # encoding separates users by more than win_us
        lo = np.searchsorted(vkey, pk - win_us, side="left")
        hi = np.searchsorted(vkey, pk, side="left")
        conv = (hi > lo)

        n_then = np.bincount(pu, minlength=len(users)).astype(np.int64)
        n_conv = np.bincount(pu, weights=conv.astype(np.float64),
                             minlength=len(users)).astype(np.int64)
        keep = n_then > 0
        return pd.DataFrame({
            user_col: users[keep],
            "n_then": n_then[keep],
            "n_converted": n_conv[keep]})

    parted = ds.select_columns([user_col, ts_col, type_col]) \
        .map_batches(add_part, batch_format="pyarrow")
    return parted.groupby("part").map_groups(per_partition,
                                             batch_format="pandas")


def session_stats(ds, gap_sec: int = 1800, purchase_type: str = "purchase",
                  user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id", type_col: str = "event_type",
                  value_col: str = "value", n_parts: int = 64):
    """Session-GRAIN analytics (sessionize reports per-user totals; this
    emits the session-length histogram with duration and purchase-revenue
    attribution): sessions split on ``gap_sec`` inactivity, then per
    session-length bucket — how many sessions, their total duration, and
    the purchase value they captured (last-mile revenue attribution).

    Plan: user-complete coarse partitions (sessions can never straddle
    them), one vectorized island pass per partition (gap flags → cumsum
    session ids → groupby agg), per-partition histogram partials, tree
    merge over the tiny session-length domain.  Duration and revenue stay
    exact int64 (µs / micros).  Returns
    (session_len, n_sessions, total_duration_us, purchase_micros)."""
    gap_us = np.int64(gap_sec) * 1_000_000

    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        return pa.table({
            user_col: b[user_col], id_col: b[id_col],
            "t": b[type_col],
            "ts_us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "vm": pa.array(to_micros(b[value_col].to_pylist()), pa.int64()),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "ts_us", id_col], kind="stable")
        users = g[user_col].to_numpy()
        ts = g["ts_us"].to_numpy(np.int64)
        new_user = np.ones(len(g), bool)
        new_user[1:] = users[1:] != users[:-1]
        gap = np.ones(len(g), bool)
        gap[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new_user | gap)
        pv = np.where(np.asarray(g["t"].to_numpy(), object)
                      == purchase_type, g["vm"].to_numpy(np.int64), 0)
        g = g.assign(sid=sid, pv=pv)
        per = (g.groupby("sid", sort=False)
               .agg(n_ev=("ts_us", "size"),
                    lo=("ts_us", "min"), hi=("ts_us", "max"),
                    pv=("pv", "sum")).reset_index())
        per["dur"] = per["hi"] - per["lo"]
        hist = (per.groupby("n_ev", sort=False)
                .agg(n_sessions=("n_ev", "size"),
                     total_duration_us=("dur", "sum"),
                     purchase_micros=("pv", "sum")).reset_index())
        return pd.DataFrame({
            "session_len": hist["n_ev"].astype(np.int64),
            "n_sessions": hist["n_sessions"].astype(np.int64),
            "total_duration_us": hist["total_duration_us"].astype(np.int64),
            "purchase_micros": hist["purchase_micros"].astype(np.int64)})

    from deepkg_ray.stages.treeagg import merge_partials
    parted = ds.select_columns([user_col, ts_col, id_col, type_col,
                                value_col]) \
        .map_batches(add_part, batch_format="pyarrow")
    partials = parted.groupby("part").map_groups(per_partition,
                                                 batch_format="pandas")
    return merge_partials(partials, ["session_len"],
                          {"n_sessions": "sum", "total_duration_us": "sum",
                           "purchase_micros": "sum"}, mode="tree")


def value_histogram_by_type(ds, n_bins: int = 20, lo: float = -10.0,
                            hi: float = 10.0,
                            type_col: str = "event_type",
                            value_col: str = "value"):
    """Equal-width value histogram per event type over FIXED micros bin
    edges (out-of-range clips into the edge bins) — the 2-key bincount
    combiner: every batch contributes at most |types|·n_bins partial
    rows, merged through the tree.  All bucket arithmetic in exact
    integer micros.  Returns (event_type, bucket, lo_edge, n)."""
    lo_m = np.int64(np.floor(lo * 1e6 + 0.5))
    hi_m = np.int64(np.floor(hi * 1e6 + 0.5))
    span = hi_m - lo_m + 1

    def partial(b: pa.Table) -> pa.Table:
        vm = np.asarray(to_micros(b[value_col].to_pylist()), np.int64)
        bk = np.clip((vm - lo_m) * n_bins // span, 0, n_bins - 1)
        df = pd.DataFrame({type_col: b[type_col].to_pylist(), "bucket": bk})
        g = (df.groupby([type_col, "bucket"], sort=False).size()
             .reset_index(name="n"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from deepkg_ray.stages.treeagg import merge_partials
    hist = merge_partials(
        ds.select_columns([type_col, value_col])
        .map_batches(partial, batch_format="pyarrow"),
        [type_col, "bucket"], {"n": "sum"}, mode="tree")
    return hist.map_batches(
        lambda b: pa.table({
            type_col: b[type_col],
            "bucket": b["bucket"].combine_chunks().cast(pa.int64()),
            "lo_edge": pa.array(
                (lo_m + b["bucket"].combine_chunks().cast(pa.int64())
                 .to_numpy(zero_copy_only=False) * span // n_bins)
                .astype(np.float64) / 1e6, pa.float64()),
            "n": b["n"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow")


def dow_hour_heatmap(ds, ts_col: str = "ts"):
    """Usage heatmap grid: event counts per (day-of-week, hour-of-day) —
    the 7×24 bincount combiner (every batch emits ≤ 168 partial rows; the
    merge tree moves grids, never events).  DOW follows DuckDB's
    dayofweek (0 = Sunday).  Returns (dow, hour, n)."""
    def partial(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        dt = pd.to_datetime(us, unit="us")
        # pandas dayofweek: 0=Monday; DuckDB dayofweek: 0=Sunday
        dow = (dt.dayofweek.to_numpy() + 1) % 7
        hour = dt.hour.to_numpy()
        key = dow * 24 + hour
        vals, cnts = np.unique(key, return_counts=True)
        return pa.table({
            "dow": pa.array((vals // 24).astype(np.int64), pa.int64()),
            "hour": pa.array((vals % 24).astype(np.int64), pa.int64()),
            "n": pa.array(cnts.astype(np.int64), pa.int64())})

    from deepkg_ray.stages.treeagg import merge_partials
    return merge_partials(
        ds.select_columns([ts_col])
        .map_batches(partial, batch_format="pyarrow"),
        ["dow", "hour"], {"n": "sum"}, mode="tree")


def daily_type_mix(ds, ts_col: str = "ts", type_col: str = "event_type"):
    """Category mix over time: per calendar day the event-type counts
    and each type's within-day share (round6 of one division) — the
    drift monitor for event streams (a type whose share trends is the
    first sign of instrumentation change).  One (day, type) grid
    combiner + tree merge; day totals fold from the grid itself.
    Returns (day_us, event_type, n, share)."""
    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        dt = pd.to_datetime(us, unit="us")
        day_us = dt.to_period("D").to_timestamp().asi8 // 1_000
        df = pd.DataFrame({"day_us": day_us.astype(np.int64),
                           type_col: b[type_col].to_pylist()})
        g = (df.groupby(["day_us", type_col], sort=False).size()
             .reset_index(name="n"))
        return pa.Table.from_pandas(g, preserve_index=False)

    grid = merge_partials(
        ds.select_columns([ts_col, type_col])
        .map_batches(partial, batch_format="pyarrow"),
        ["day_us", type_col], {"n": "sum"}, mode="tree").to_pandas()

    tot = grid.groupby("day_us")["n"].transform("sum").to_numpy(np.int64)
    n = grid["n"].to_numpy(np.int64)
    share = round6(n.astype(np.float64) / tot.astype(np.float64))
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "day_us": pa.array(grid["day_us"].to_numpy(np.int64),
                           pa.int64()),
        type_col: pa.array(grid[type_col].astype(str), pa.string()),
        "n": pa.array(n, pa.int64()),
        "share": pa.array(share, pa.float64())}))


def event_context_pairs(ds, k: int = 3, user_col: str = "user_id",
                        ts_col: str = "ts", id_col: str = "event_id",
                        type_col: str = "event_type", n_parts: int = 64):
    """Sequential context pairs: for every user's event-time-ordered
    stream, count (type_a → type_b) where b occurs within the next ``k``
    events after a — the skip-gram of behavioral sequences
    (markov_transitions is the k=1 cut; larger k captures loose order).

    Plan: user-complete coarse partitions; inside each, ONE vectorized
    pass per lag 1..k (shifted same-user masks, the moving_average
    pattern) emits (ta, tb) partial counts; the |types|²-bounded grid
    tree-merges.  Returns (type_a, type_b, n)."""
    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        return pa.table({
            user_col: b[user_col], id_col: b[id_col],
            "t": b[type_col],
            "ts_us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "ts_us", id_col], kind="stable")
        users = g[user_col].to_numpy()
        t = np.asarray(g["t"].to_numpy(), object)
        acc: dict[tuple, int] = {}
        for lag in range(1, k + 1):
            if lag >= len(t):
                break
            same = users[lag:] == users[:-lag]
            ta = t[:-lag][same]
            tb = t[lag:][same]
            for a, b_ in zip(ta, tb):
                key = (a, b_)
                acc[key] = acc.get(key, 0) + 1
        keys = list(acc.keys())
        return pd.DataFrame({
            "type_a": [kk[0] for kk in keys],
            "type_b": [kk[1] for kk in keys],
            "n": np.asarray([acc[kk] for kk in keys], np.int64)})

    from deepkg_ray.stages.treeagg import merge_partials
    parted = ds.select_columns([user_col, ts_col, id_col, type_col]) \
        .map_batches(add_part, batch_format="pyarrow")
    partials = parted.groupby("part").map_groups(per_partition,
                                                 batch_format="pandas")
    return merge_partials(partials, ["type_a", "type_b"], {"n": "sum"},
                          mode="tree")


def weekly_active_users(ds, window_days: int = 7,
                        user_col: str = "user_id", ts_col: str = "ts"):
    """DAU / WAU / stickiness per calendar day: distinct daily actives,
    distinct actives over the TRAILING ``window_days`` window, and their
    round6 ratio — the engagement report, with the rolling distinct
    computed EXACTLY (no sketch): each (day, user) active pair explodes
    to the ≤ ``window_days`` window-days it contributes to, and a second
    dedup-count collapses them — users are never listed on the driver,
    and both shuffles are bounded by days × users, not events.
    Returns (day_us, dau, wau, stickiness)."""
    from ray.data.aggregate import Count
    from deepkg_ray.functions.numeric import round6

    DAY_US = np.int64(86_400_000_000)

    def day_user(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        day = (us // DAY_US) * DAY_US
        df = pd.DataFrame({"day_us": day,
                           user_col: b[user_col].to_pylist()})
        g = df.drop_duplicates()
        return pa.Table.from_pandas(g, preserve_index=False)

    pairs = (ds.select_columns([ts_col, user_col])
             .map_batches(day_user, batch_format="pyarrow")
             .groupby(["day_us", user_col])
             .aggregate(Count(alias_name="_m")).drop_columns(["_m"])
             .materialize())

    dau = pairs.groupby("day_us").aggregate(Count(alias_name="dau"))

    def explode(b: pa.Table) -> pa.Table:
        day = b["day_us"].to_numpy(zero_copy_only=False)
        users = np.asarray(b[user_col].to_pylist(), object)
        wd = (day[:, None] + DAY_US * np.arange(window_days)[None, :]) \
            .ravel()
        uu = np.repeat(users, window_days)
        return pa.table({"wday_us": pa.array(wd, pa.int64()),
                         user_col: pa.array(uu.astype(str), pa.string())})

    wau = (pairs.map_batches(explode, batch_format="pyarrow")
           .groupby(["wday_us", user_col])
           .aggregate(Count(alias_name="_m")).drop_columns(["_m"])
           .groupby("wday_us").aggregate(Count(alias_name="wau")))

    from deepkg_ray.util import drop_empty_blocks, join_partitions, rows_all
    j = drop_empty_blocks(dau).join(
        drop_empty_blocks(wau), join_type="inner",
        num_partitions=join_partitions(),
        on=("day_us",), right_on=("wday_us",))

    def finish(b: pa.Table) -> pa.Table:
        d = b["dau"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        w = b["wau"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "day_us": b["day_us"].combine_chunks().cast(pa.int64()),
            "dau": pa.array(d, pa.int64()),
            "wau": pa.array(w, pa.int64()),
            "stickiness": pa.array(round6(
                d.astype(np.float64) / w.astype(np.float64)),
                pa.float64())})
    return drop_empty_blocks(j).map_batches(finish,
                                            batch_format="pyarrow")


def value_autocorr(ds, user_col: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id", value_col: str = "value",
                   n_parts: int = 64):
    """Pooled lag-1 autocorrelation of the value series: Pearson r over
    all same-user consecutive (vₜ, vₜ₊₁) pairs in event-time order —
    the persistence/momentum diagnostic (white-noise streams read ≈ 0).

    Exactness: the corr_events convention — millis-quantized values, five
    int64 moment sums (per-partition single-row partials → one global
    Sum), then the identical float chain num/(√vx·√vy) mirrored in SQL
    (the moment products exceed 2^53 so the DOUBLE chain itself is the
    contract, same ops both sides).  Pairs never cross partitions
    (user-complete hashing).  Returns one row (n_pairs, autocorr)."""
    from ray.data.aggregate import Sum
    from deepkg_ray.functions.numeric import round6

    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        v = np.asarray(b[value_col].to_pylist(), np.float64)
        return pa.table({
            user_col: b[user_col], id_col: b[id_col],
            "ts_us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "xm": pa.array(np.floor(v * 1e3 + 0.5).astype(np.int64),
                           pa.int64()),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "ts_us", id_col], kind="stable")
        users = g[user_col].to_numpy()
        xm = g["xm"].to_numpy(np.int64)
        if len(xm) < 2:
            return pd.DataFrame({c: np.asarray([0], np.int64)
                                 for c in ["n", "sx", "sy", "sxy",
                                           "sxx", "syy"]})
        same = users[1:] == users[:-1]
        x = xm[:-1][same]
        y = xm[1:][same]
        return pd.DataFrame({
            "n": np.asarray([len(x)], np.int64),
            "sx": np.asarray([int(x.sum())], np.int64),
            "sy": np.asarray([int(y.sum())], np.int64),
            "sxy": np.asarray([int((x * y).sum())], np.int64),
            "sxx": np.asarray([int((x * x).sum())], np.int64),
            "syy": np.asarray([int((y * y).sum())], np.int64)})

    parted = ds.select_columns([user_col, ts_col, id_col, value_col]) \
        .map_batches(add_part, batch_format="pyarrow")
    agg = (parted.groupby("part")
           .map_groups(per_partition, batch_format="pandas")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"),
                      Sum("sxy", alias_name="sxy"),
                      Sum("sxx", alias_name="sxx"),
                      Sum("syy", alias_name="syy")))
    n = float(agg["n"] or 0)
    import ray.data as rd
    if n < 2:
        return rd.from_arrow(pa.table({
            "n_pairs": pa.array([int(n)], pa.int64()),
            "autocorr": pa.array([0.0], pa.float64())}))
    sx, sy = float(agg["sx"]), float(agg["sy"])
    sxy, sxx, syy = float(agg["sxy"]), float(agg["sxx"]), float(agg["syy"])
    num = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    den = np.sqrt(vx) * np.sqrt(vy)
    r = float(round6(np.asarray([num / den if den > 0 else 0.0]))[0])
    return rd.from_arrow(pa.table({
        "n_pairs": pa.array([int(agg["n"])], pa.int64()),
        "autocorr": pa.array([r], pa.float64())}))


def weekend_effect(ds, ts_col: str = "ts", value_col: str = "value"):
    """Weekend-vs-weekday value comparison: Welch's t statistic over the
    two buckets — the did-the-distribution-shift test (chi2 covers
    categorical mixes; this covers the metric's mean).

    Moments are exact int64 millis sums (the corr_events convention);
    the finish chain  t = (m1 − m2)/√(v1/n1 + v2/n2)  with vᵢ the
    sample variance (n−1) runs in the same DOUBLE op order as the SQL
    mirror.  One single-row-per-batch combiner, one global Sum.
    Returns (n_weekday, n_weekend, mean_weekday, mean_weekend, t_stat)."""
    from ray.data.aggregate import Sum
    from deepkg_ray.functions.numeric import round6

    def partial(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        dt = pd.to_datetime(us, unit="us")
        # DuckDB dayofweek: 0=Sunday, 6=Saturday
        dow = (dt.dayofweek.to_numpy() + 1) % 7
        we = (dow == 0) | (dow == 6)
        v = np.asarray(b[value_col].to_pylist(), np.float64)
        x = np.floor(v * 1e3 + 0.5).astype(np.int64)
        out = {}
        for tag, mask in (("wd", ~we), ("we", we)):
            xs = x[mask]
            out[f"n_{tag}"] = int(mask.sum())
            out[f"s_{tag}"] = int(xs.sum())
            out[f"ss_{tag}"] = int((xs * xs).sum())
        return pa.table({k: pa.array([v_], pa.int64())
                         for k, v_ in out.items()})

    agg = (ds.select_columns([ts_col, value_col])
           .map_batches(partial, batch_format="pyarrow")
           .aggregate(*[Sum(c, alias_name=c)
                        for c in ["n_wd", "s_wd", "ss_wd",
                                  "n_we", "s_we", "ss_we"]]))
    import ray.data as rd
    n1, n2 = float(agg["n_wd"] or 0), float(agg["n_we"] or 0)
    if n1 < 2 or n2 < 2:
        return rd.from_arrow(pa.table({
            "n_weekday": pa.array([int(n1)], pa.int64()),
            "n_weekend": pa.array([int(n2)], pa.int64()),
            "mean_weekday": pa.array([0.0], pa.float64()),
            "mean_weekend": pa.array([0.0], pa.float64()),
            "t_stat": pa.array([0.0], pa.float64())}))
    s1, ss1 = float(agg["s_wd"]), float(agg["ss_wd"])
    s2, ss2 = float(agg["s_we"]), float(agg["ss_we"])
    m1 = s1 / n1 / 1e3
    m2 = s2 / n2 / 1e3
    v1 = (ss1 - s1 * s1 / n1) / (n1 - 1.0)
    v2 = (ss2 - s2 * s2 / n2) / (n2 - 1.0)
    # zero-variance guard: both sides constant → se = 0 and the Welch
    # ratio is undefined; report t = 0 (no detectable shift) instead of
    # letting a divide-by-zero RuntimeWarning mask future real errors
    se2 = v1 / n1 + v2 / n2
    t = (s1 / n1 - s2 / n2) / np.sqrt(se2) if se2 > 0 else 0.0
    return rd.from_arrow(pa.table({
        "n_weekday": pa.array([int(n1)], pa.int64()),
        "n_weekend": pa.array([int(n2)], pa.int64()),
        "mean_weekday": pa.array([float(round6(np.asarray([m1]))[0])],
                                 pa.float64()),
        "mean_weekend": pa.array([float(round6(np.asarray([m2]))[0])],
                                 pa.float64()),
        "t_stat": pa.array([float(round6(np.asarray([t]))[0])],
                           pa.float64())}))


def mann_whitney_weekend(ds, ts_col: str = "ts", value_col: str = "value",
                         shift: int = 12, max_buckets: int = 1 << 20):
    """Mann–Whitney U rank-sum test, weekend vs weekday values — the
    nonparametric twin of weekend_effect (that one tests the mean; this
    tests stochastic dominance and is robust to heavy tails).

    Exactness: values are compared as int64 millis (weekend_effect's
    quantization), so tie classes match the SQL oracle bit for bit.  The
    U statistic is kept in HALF-UNITS (u2 = 2·U, integer — a tie
    contributes ½ per pair) and assembled WITHOUT a global sort via
    ordered value-range buckets (bucket = vm >> shift — monotone in vm by
    construction, the curation histogram-prefix trick):

      * per batch: batch-local distinct-vm counts (combiner),
      * per bucket (one task): within-bucket exact pair count
        u2w = Σ_v c_we(v)·(2·prefix_wd(<v) + c_wd(v)) and the tie term
        t3 = Σ_v (c³ − c) over c = c_wd + c_we, both in arbitrary-
        precision Python ints over ≤ 2^shift distinct values,
      * driver: cross-bucket pairs from the bucket-totals table
        (u2x = 2·Σ_b twe(b)·prefix_wd(<b)) — bucket-shaped
        (value_range/2^shift rows, asserted ≤ max_buckets), never
        row-shaped.

    z uses the normal approximation with tie correction,
    σ² = (n1·n2/12)·((N+1) − t3/(N(N−1))), identical DOUBLE op order to
    the SQL mirror.  Documented bounds: per-bucket u2w and the total u2
    are emitted as int64 (fine below ~4·10⁹ rows per value-range bucket
    and ~3·10⁹ total rows; shard the test per stratum beyond that).
    Returns one row (n_weekday, n_weekend, u2_weekend, tie_t3, z_stat)."""
    import math

    import ray.data as rd
    from deepkg_ray.util import rows_all

    def partial(b: pa.Table) -> pd.DataFrame:
        us = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        dt = pd.to_datetime(us, unit="us")
        dow = (dt.dayofweek.to_numpy() + 1) % 7       # DuckDB: 0=Sun
        we = ((dow == 0) | (dow == 6)).astype(np.int64)
        v = np.asarray(b[value_col].to_pylist(), np.float64)
        vm = np.floor(v * 1e3 + 0.5).astype(np.int64)
        d = pd.DataFrame({"vm": vm, "we": we})
        g = d.groupby("vm", sort=False)["we"].agg(["count", "sum"]) \
            .reset_index()
        out = pd.DataFrame({
            "bucket": (g["vm"].to_numpy(np.int64) >> shift),
            "vm": g["vm"].to_numpy(np.int64),
            "c_we": g["sum"].to_numpy(np.int64),
            "c_wd": (g["count"] - g["sum"]).to_numpy(np.int64)})
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = (g.groupby("vm", sort=True)[["c_wd", "c_we"]].sum()
             .reset_index())
        cwd = m["c_wd"].tolist()
        cwe = m["c_we"].tolist()
        u2w = 0
        t3 = 0
        pw = 0                                   # prefix of c_wd within
        for w_, e_ in zip(cwd, cwe):
            w_, e_ = int(w_), int(e_)
            u2w += e_ * (2 * pw + w_)
            c = w_ + e_
            t3 += c * c * c - c
            pw += w_
        return pd.DataFrame({
            "bucket": np.asarray([g["bucket"].iloc[0]], np.int64),
            "twd": np.asarray([pw], np.int64),
            "twe": np.asarray([sum(map(int, cwe))], np.int64),
            "u2w": np.asarray([u2w], np.int64),
            "t3": np.asarray([t3], np.int64)})

    buckets = (ds.select_columns([ts_col, value_col])
               .map_batches(partial, batch_format="pyarrow")
               .groupby("bucket").map_groups(per_bucket,
                                             batch_format="pandas"))
    rows = sorted(rows_all(buckets), key=lambda r: r["bucket"])
    assert len(rows) <= max_buckets, \
        f"bucket table {len(rows)} > {max_buckets}: raise shift"
    n1 = sum(int(r["twd"]) for r in rows)          # weekday
    n2 = sum(int(r["twe"]) for r in rows)          # weekend
    t3 = sum(int(r["t3"]) for r in rows)
    u2 = 0
    pw = 0
    for r in rows:                                 # cross-bucket pairs
        u2 += int(r["u2w"]) + 2 * int(r["twe"]) * pw
        pw += int(r["twd"])
    N = n1 + n2
    mu2 = n1 * n2
    if n1 > 0 and n2 > 0 and N > 1:
        # inner >= 0 algebraically (t3 <= N^3 - N); the guard also
        # absorbs the all-tied case where float rounding could dip below 0
        inner = (N + 1) - t3 / (N * (N - 1))
        sigma = math.sqrt((n1 * n2) * inner / 12.0) if inner > 0 else 0.0
    else:
        sigma = 0.0
    z = (float(round6(np.asarray([(u2 - mu2) / (2.0 * sigma)]))[0])
         if sigma > 0 else 0.0)
    return rd.from_arrow(pa.table({
        "n_weekday": pa.array([n1], pa.int64()),
        "n_weekend": pa.array([n2], pa.int64()),
        "u2_weekend": pa.array([u2], pa.int64()),
        "tie_t3": pa.array([t3], pa.int64()),
        "z_stat": pa.array([z], pa.float64())}))


def watermark_late_counts(ds, *, lateness_us: int = 60_000_000,
                          window_us: int = 60_000_000, n_parts: int = 64):
    """Streaming watermark audit over merged per-key ordered streams.
    Arrival order is (user_id, event_id) — each user's stream arrives in
    order and streams are merged user by user — and the watermark at any
    arrival is the running MAX event time over everything already arrived
    minus the allowed lateness; an event is LATE iff ts < watermark.
    Returns (window_start_us, n_ontime, n_late) per tumbling event-time
    window — the on-time/late accounting a streaming sink needs to decide
    window finalization (beam/flink watermark semantics, batch-audited).

    Plan (the global-prefix streaming op Ray Data lacks, in two passes
    that partition identically by user-range buckets):
    pass 1: per-batch (bucket, max_us) combiner + tiny tree merge — the
    driver sees n_parts rows and turns them into an EXCLUSIVE prefix-max
    carry per bucket.  pass 2: bucket-complete groups re-scan with the
    carry (n_parts-entry dict, shipped in the closure), compute flags
    with one sort + np.maximum.accumulate, and collapse straight to
    window cells.  No global sort ever happens; driver state is n_parts
    scalars."""
    from deepkg_ray.stages.treeagg import merge_partials

    NEG = -(2 ** 62)
    max_uid = int(ds.max("user_id"))
    span = max_uid // n_parts + 1

    def keyed(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "bucket": pa.array(uid // span, pa.int64()),
            "user_id": pa.array(uid),
            "event_id": b["event_id"].combine_chunks().cast(pa.int64()),
            "us": b["ts"].cast(pa.timestamp("us")).cast(pa.int64())})

    keyed_ds = (ds.select_columns(["user_id", "event_id", "ts"])
                .map_batches(keyed, batch_format="pyarrow")
                .materialize())   # both passes read the same keyed blocks

    def bucket_max(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"bucket": b["bucket"].to_numpy(),
                           "max_us": b["us"].to_numpy()})
        return df.groupby("bucket", as_index=False)["max_us"].max()

    bm = merge_partials(keyed_ds.map_batches(bucket_max,
                                             batch_format="pyarrow"),
                        ["bucket"], {"max_us": "max"}).to_pandas() \
        .sort_values("bucket")
    # exclusive prefix max: carry[b] = max ts of every bucket before b
    pm = np.concatenate(([NEG],
                         np.maximum.accumulate(
                             bm["max_us"].to_numpy(np.int64))[:-1]))
    carry = dict(zip(bm["bucket"].astype(int), pm.tolist()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_id"], kind="stable")
        us = g["us"].to_numpy(np.int64)
        run = np.maximum.accumulate(us)
        prev = np.empty_like(run)
        prev[0] = carry[int(g["bucket"].iloc[0])]
        prev[1:] = np.maximum(run[:-1], prev[0])
        late = (prev > NEG) & (us < prev - lateness_us)
        cells = pd.DataFrame({
            "window_start_us": (us // window_us) * window_us,
            "n_late": late.astype(np.int64),
            "n_ontime": (~late).astype(np.int64)})
        return (cells.groupby("window_start_us", as_index=False)
                [["n_late", "n_ontime"]].sum())

    parts = keyed_ds.groupby("bucket").map_groups(per_bucket,
                                                  batch_format="pandas")
    return merge_partials(parts, ["window_start_us"],
                          {"n_late": "sum", "n_ontime": "sum"})


def user_activity_streaks(ds, user_col: str = "user_id",
                          ts_col: str = "ts", n_parts: int = 64):
    """Gaps-and-islands per user over active DAYS: (user_id,
    n_active_days, longest_streak) where a streak is a maximal run of
    consecutive calendar days with ≥1 event — the classic retention
    signal SQL spells with the day − row_number() island trick.

    Plan: user-complete coarse hash partitions; per partition one
    distinct + sort + vectorized island segmentation (no window function
    machinery, one diff pass)."""
    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        return pa.table({
            user_col: b[user_col],
            "day": pc.divide(b[ts_col].combine_chunks()
                             .cast(pa.timestamp("us")).cast(pa.int64()),
                             86_400_000_000),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32))})

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        d = g[[user_col, "day"]].drop_duplicates() \
            .sort_values([user_col, "day"], kind="stable")
        u = d[user_col].to_numpy()
        day = d["day"].to_numpy(np.int64)
        new_seg = np.concatenate(([True], (u[1:] != u[:-1])
                                  | (day[1:] != day[:-1] + 1)))
        seg = np.cumsum(new_seg) - 1
        seg_len = np.bincount(seg)
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        out = pd.DataFrame({user_col: u, "seg": seg})
        per_seg = out.drop_duplicates("seg")
        per_seg = per_seg.assign(len=seg_len[per_seg["seg"]])
        res = (per_seg.groupby(user_col, as_index=False)
               .agg(n_active_days=("len", "sum"),
                    longest_streak=("len", "max")))
        res["n_active_days"] = res["n_active_days"].astype("int64")
        res["longest_streak"] = res["longest_streak"].astype("int64")
        return res

    parted = ds.select_columns([user_col, ts_col]).map_batches(
        add_part, batch_format="pyarrow")
    return parted.groupby("part").map_groups(per_partition,
                                             batch_format="pandas")


def trending_per_window(ds, *, window_us: int = 3_600_000_000, k: int = 3,
                        type_col: str = "event_type", ts_col: str = "ts"):
    """Trending-items table: the top-k event types per tumbling window
    (ties broken by type name, row_number semantics so exactly k rows per
    window) — the per-window grouped top-k a streaming dashboard serves.
    Counts pre-aggregate per batch into (window, type) cells (bounded by
    windows × type dictionary), merge on the tree, and the rank cut runs
    once over the merged cells.  Returns (window_start_us, event_type,
    n, rnk)."""
    from deepkg_ray.stages.treeagg import merge_partials

    def cells(b: pa.Table) -> pd.DataFrame:
        us = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({
            "window_start_us": (us // window_us) * window_us,
            "event_type": b[type_col].to_pylist()})
            .groupby(["window_start_us", "event_type"], as_index=False)
            .size().rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        return g

    merged = merge_partials(
        ds.select_columns([type_col, ts_col]).map_batches(
            cells, batch_format="pyarrow"),
        ["window_start_us", "event_type"], {"n": "sum"})

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["window_start_us", "n", "event_type"],
                            ascending=[True, False, True], kind="stable")
        df["rnk"] = df.groupby("window_start_us").cumcount() + 1
        out = df[df["rnk"] <= k].reset_index(drop=True)
        out["rnk"] = out["rnk"].astype("int64")
        return out

    return merged.map_batches(topk, batch_format="pandas",
                              batch_size=None)


def session_type_pairs(ds, gap_sec: int = 1800, user_col: str = "user_id",
                       ts_col: str = "ts", id_col: str = "event_id",
                       type_col: str = "event_type", n_parts: int = 64):
    """Within-session event-type co-occurrence: (t1, t2, n_sessions) =
    number of user sessions (sessionize's gap rule) whose event-type set
    contains BOTH types — the behavioral basket signal at session
    granularity (same-turn cooccurrence_counts' event-stream twin).

    Plan: user-complete coarse partitions; per partition one sort pass
    assigns session ids (cumsum of gap breaks), dedups (user, session,
    type) and self-merges the per-session type sets into pair partials;
    the (t1, t2) merge is type-dictionary²-bounded."""
    gap_us = gap_sec * 1_000_000

    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        return pa.table({
            user_col: b[user_col],
            id_col: b[id_col].combine_chunks().cast(pa.int64()),
            type_col: b[type_col],
            "us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32))})

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "us", id_col], kind="stable")
        u = g[user_col].to_numpy()
        us = g["us"].to_numpy(np.int64)
        same = np.concatenate(([False], u[1:] == u[:-1]))
        gap = np.concatenate(([0], us[1:] - us[:-1]))
        brk = (~same) | (gap > gap_us)
        sid = np.cumsum(brk)                       # globally unique in part
        d = pd.DataFrame({"sid": sid,
                          "t": g[type_col].to_numpy()}).drop_duplicates()
        m = d.merge(d, on="sid", suffixes=("_1", "_2"))
        m = m[m["t_1"] < m["t_2"]]
        out = (m.groupby(["t_1", "t_2"], as_index=False).size()
               .rename(columns={"t_1": "t1", "t_2": "t2",
                                "size": "n_sessions"}))
        out["n_sessions"] = out["n_sessions"].astype("int64")
        return out

    from deepkg_ray.stages.treeagg import merge_partials
    parted = ds.select_columns([user_col, ts_col, id_col, type_col]) \
        .map_batches(add_part, batch_format="pyarrow")
    pairs = parted.groupby("part").map_groups(per_partition,
                                              batch_format="pandas")
    return merge_partials(pairs, ["t1", "t2"], {"n_sessions": "sum"})


def first_touch_attribution(ds, *, purchase_type: str = "purchase",
                            user_col: str = "user_id", ts_col: str = "ts",
                            id_col: str = "event_id",
                            type_col: str = "event_type",
                            value_col: str = "value",
                            _user_table: bool = False):
    """First-touch attribution: each user's FIRST event overall (order
    (ts, event_id)) names the acquisition channel; purchases and
    purchase revenue then roll up per channel — the marketing
    counterpart of timed_conversions' last-hour window rule.

    Plan: one per-batch pass emits ONE row per user carrying BOTH the
    batch-argmin first-event candidate (first_us, first_id, first_type
    travel together — the latest_order_per_customer row-wise kernel)
    AND the batch's purchase partials (np, rm), so a single two-level
    merge tree reduces everything; the final task holds ≤ |users|
    candidate rows (the documented key-bounded final-task tier).
    Returns (first_type, n_users, n_purchases, rev_micros, revenue)."""
    from deepkg_ray.functions.numeric import to_micros as _tm

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            user_col: b[user_col].to_numpy(zero_copy_only=False),
            "us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
                  .to_numpy(zero_copy_only=False),
            "eid": b[id_col].to_numpy(zero_copy_only=False),
            "etype": b[type_col].to_pylist(),
            "vm": np.asarray(_tm(b[value_col].to_pylist()), np.int64)})
        is_p = (df["etype"] == purchase_type).to_numpy()
        sums = (pd.DataFrame({user_col: df[user_col],
                              "np": is_p.astype(np.int64),
                              "rm": np.where(is_p, df["vm"].to_numpy(), 0)})
                .groupby(user_col, as_index=False, sort=False).sum())
        first = (df.sort_values([user_col, "us", "eid"], kind="stable")
                 .groupby(user_col, sort=False).head(1)
                 [[user_col, "us", "eid", "etype"]]
                 .rename(columns={"us": "first_us", "eid": "first_id",
                                  "etype": "first_type"}))
        out = first.merge(sums, on=user_col, sort=False)
        out["np"] = out["np"].astype("int64")
        out["rm"] = out["rm"].astype("int64")
        return out

    def merge_frames(df: pd.DataFrame) -> pd.DataFrame:
        sums = (df.groupby(user_col, as_index=False, sort=False)
                [["np", "rm"]].sum())
        first = (df.sort_values([user_col, "first_us", "first_id"],
                                kind="stable")
                 .groupby(user_col, sort=False).head(1)
                 [[user_col, "first_us", "first_id", "first_type"]])
        out = first.merge(sums, on=user_col, sort=False)
        out["np"] = out["np"].astype("int64")
        out["rm"] = out["rm"].astype("int64")
        return out

    cols = [user_col, ts_col, id_col, type_col, value_col]
    parts = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow")
    lvl1 = parts.repartition(8).map_batches(
        merge_frames, batch_format="pandas", batch_size=None)
    final = lvl1.repartition(1).map_batches(
        merge_frames, batch_format="pandas", batch_size=None)

    if _user_table:
        return final

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("first_type", as_index=False)
             .agg(n_users=(user_col, "size"), n_purchases=("np", "sum"),
                  rev_micros=("rm", "sum")))
        g["n_users"] = g["n_users"].astype("int64")
        g["n_purchases"] = g["n_purchases"].astype("int64")
        g["rev_micros"] = g["rev_micros"].astype("int64")
        g["revenue"] = g["rev_micros"].to_numpy(np.int64) / 1e6
        return g

    return final.map_batches(finish, batch_format="pandas",
                             batch_size=None)


def markov_stationary(ds, n_iters: int = 8, scale: int = 10 ** 12,
                      user_col: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id",
                      type_col: str = "event_type", n_parts: int = 64):
    """Stationary distribution of the event-type Markov chain: π·Pᵏ from
    the uniform start over the LEAD-pair transition matrix — where the
    per-step probabilities (markov_transitions) END UP if behavior
    repeats; the long-run type mix forecast.

    Exactness: the pagerank_scaled convention — all arithmetic in int64
    units of 1/scale, per-edge contribution (π_i·n_ij) // row_tot_i
    (floor mass-drop is deterministic on both sides; absorbing types
    re-emit nothing, also both sides).  The |types|² transition grid is
    dictionary-sized, so after the distributed pair fold the power
    iteration runs in one numpy pass on the driver (the kg_walk_counts
    driver tier).  Returns (event_type, pi_scaled)."""
    import ray.data as rd

    from deepkg_ray.util import rows_all

    trans = markov_transitions(ds, user_col=user_col, ts_col=ts_col,
                               id_col=id_col, key_col=type_col,
                               n_parts=n_parts)
    rows = rows_all(trans.select_columns(["src_type", "dst_type", "n"]))
    types = sorted({r["src_type"] for r in rows}
                   | {r["dst_type"] for r in rows})
    if not types:
        return rd.from_arrow(pa.table({
            "event_type": pa.array([], pa.string()),
            "pi_scaled": pa.array([], pa.int64())}))
    idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    si = np.asarray([idx[r["src_type"]] for r in rows], np.int64)
    di = np.asarray([idx[r["dst_type"]] for r in rows], np.int64)
    nn = np.asarray([r["n"] for r in rows], np.int64)
    tot = np.zeros(k, np.int64)
    np.add.at(tot, si, nn)
    assert scale * int(nn.max()) < 2 ** 63, \
        "markov_stationary int64 bound exceeded"
    pi = np.full(k, scale // k, np.int64)
    for _ in range(n_iters):
        contrib = (pi[si] * nn) // tot[si]
        new = np.zeros(k, np.int64)
        np.add.at(new, di, contrib)
        pi = new
    return rd.from_arrow(pa.table({
        "event_type": pa.array(types, pa.string()),
        "pi_scaled": pa.array(pi, pa.int64())}))


def user_time_weighted_avg(ds, user_col: str = "user_id",
                           ts_col: str = "ts", id_col: str = "event_id",
                           value_col: str = "value", n_parts: int = 64):
    """Per-user TIME-weighted average value: each event's value holds
    until the user's next event (step function), so
    TWA = Σ vᵢ·Δtᵢ / ΣΔtᵢ — the metric for state-like values (a plan
    tier, a queue depth) where the plain mean over-weights chatty
    periods.  Gaps quantize to whole seconds (µs products would
    overflow int64; loud assert on the vm·Δt bound); users whose span
    rounds to 0 s drop.

    Plan: user-complete coarse partitions, one sort + shifted-product
    pass each — per-partition rows are FINAL (a user never straddles
    partitions).  twa = floor(num/den + 0.5)/1e6 on exact int64s.
    Returns (user_id, n_events, span_s, twa)."""
    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        return pa.table({
            user_col: b[user_col],
            id_col: b[id_col].combine_chunks().cast(pa.int64()),
            "us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "vm": pa.array(np.asarray(
                to_micros(b[value_col].to_pylist()), np.int64)),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32))})

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "us", id_col], kind="stable")
        u = g[user_col].to_numpy()
        us = g["us"].to_numpy(np.int64)
        vm = g["vm"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        dt = (us[1:] - us[:-1]) // 1_000_000
        if len(vm) and dt.size:
            assert int(np.abs(vm).max()) * int(max(dt.max(), 1)) \
                < 2 ** 62, "twa int64 bound exceeded"
        num_t = np.where(same, vm[:-1] * dt, 0)
        den_t = np.where(same, dt, 0)
        d = pd.DataFrame({user_col: u[:-1][same],
                          "num": num_t[same], "den": den_t[same],
                          "n": np.ones(int(same.sum()), np.int64)})
        out = d.groupby(user_col, as_index=False).sum()
        out = out[out["den"] > 0]
        num = out["num"].to_numpy(np.int64)
        den = out["den"].to_numpy(np.int64)
        return pd.DataFrame({
            user_col: out[user_col].to_numpy(),
            "n_events": out["n"].to_numpy(np.int64) + 1,
            "span_s": den,
            "twa": np.floor(num / den.astype(np.float64) + 0.5) / 1e6})

    parted = ds.select_columns(
        [user_col, ts_col, id_col, value_col]).map_batches(
        add_part, batch_format="pyarrow")
    return parted.groupby("part").map_groups(per_partition,
                                             batch_format="pandas")


def duplicate_event_audit(ds, eps_sec: int = 5,
                          user_col: str = "user_id",
                          ts_col: str = "ts", id_col: str = "event_id",
                          type_col: str = "event_type",
                          value_col: str = "value"):
    """Instrumentation double-fire audit: an event is a DUPLICATE when
    the same user's immediately preceding event (order (ts, event_id))
    has the same type AND the same micros value within ``eps_sec`` —
    the client-retry / at-least-once-delivery artifact every event
    pipeline deduplicates before counting.  Per type: events, dups and
    the round6 dup rate.

    Plan: user-complete coarse partitions (the interarrival shape),
    one sort + shifted-compare pass each, then a type-dictionary
    merge.  Returns (event_type, n_events, n_dups, dup_rate)."""
    eps_us = eps_sec * 1_000_000
    n_parts = 64

    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        return pa.table({
            user_col: b[user_col],
            id_col: b[id_col].combine_chunks().cast(pa.int64()),
            type_col: b[type_col],
            "us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "vm": pa.array(np.asarray(
                to_micros(b[value_col].to_pylist()), np.int64)),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32))})

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "us", id_col], kind="stable")
        u = g[user_col].to_numpy()
        t = g[type_col].to_numpy()
        us = g["us"].to_numpy(np.int64)
        vm = g["vm"].to_numpy(np.int64)
        dup = np.concatenate(([False],
                              (u[1:] == u[:-1]) & (t[1:] == t[:-1])
                              & (vm[1:] == vm[:-1])
                              & (us[1:] - us[:-1] <= eps_us)))
        out = (pd.DataFrame({type_col: t,
                             "n_events": np.ones(len(t), np.int64),
                             "n_dups": dup.astype(np.int64)})
               .groupby(type_col, as_index=False).sum())
        out["n_events"] = out["n_events"].astype("int64")
        out["n_dups"] = out["n_dups"].astype("int64")
        return out

    from deepkg_ray.stages.treeagg import merge_partials
    parted = ds.select_columns(
        [user_col, ts_col, id_col, type_col, value_col]).map_batches(
        add_part, batch_format="pyarrow")
    merged = merge_partials(
        parted.groupby("part").map_groups(per_partition,
                                          batch_format="pandas"),
        [type_col], {"n_events": "sum", "n_dups": "sum"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        ne = df["n_events"].to_numpy(np.int64)
        nd = df["n_dups"].to_numpy(np.int64)
        df = df.assign(dup_rate=np.floor(
            nd / ne.astype(np.float64) * 1e6 + 0.5) / 1e6)
        return df

    return merged.map_batches(finish, batch_format="pandas",
                              batch_size=None)


def user_regularity(ds, user_col: str = "user_id", ts_col: str = "ts",
                    id_col: str = "event_id"):
    """Per-user inter-arrival regularity: variance-to-mean ratio of the
    gap series in WHOLE SECONDS — the bot-likeness screen (a human's
    gaps are over-dispersed, VMR ≫ 1; a scheduled client's are nearly
    constant, VMR → 0; token_burstiness' identity applied to time).

    Exactness: gaps floor to seconds (µs² would overflow int64), the
    per-user (n, Σg, Σg²) moments fold distributed, VMR =
    (n·Σg² − (Σg)²) / (n·Σg) is ONE double division of exact int64s
    (loud bound assert).  Users with < 2 gaps drop (VMR undefined).
    Returns (user_id, n_gaps, sum_gap_s, vmr)."""
    from deepkg_ray.stages.treeagg import merge_partials

    gaps = interarrival_gaps(ds, user_col=user_col, ts_col=ts_col,
                             id_col=id_col)

    def moments(b: pa.Table) -> pd.DataFrame:
        g = b["gap_us"].to_numpy(zero_copy_only=False) // 1_000_000
        df = pd.DataFrame({
            user_col: b[user_col].to_numpy(zero_copy_only=False),
            "n": np.ones(len(g), np.int64), "sg": g, "sg2": g * g})
        out = df.groupby(user_col, as_index=False, sort=False).sum()
        for c in ("n", "sg", "sg2"):
            out[c] = out[c].astype("int64")
        return out

    merged = merge_partials(
        gaps.map_batches(moments, batch_format="pyarrow"),
        [user_col], {"n": "sum", "sg": "sum", "sg2": "sum"},
        mode="auto")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n"] >= 2]
        n = df["n"].to_numpy(np.int64)
        sg = df["sg"].to_numpy(np.int64)
        sg2 = df["sg2"].to_numpy(np.int64)
        assert len(n) == 0 or int((n.astype(object) * sg2).max()) < 2 ** 63, \
            "user_regularity int64 bound exceeded"
        num = n * sg2 - sg * sg
        den = n * sg
        vmr = np.where(den > 0, num / np.where(den > 0, den, 1)
                       .astype(np.float64), 0.0)
        return pd.DataFrame({
            user_col: df[user_col].to_numpy(),
            "n_gaps": n, "sum_gap_s": sg, "vmr": vmr})

    return merged.map_batches(finish, batch_format="pandas")


def seasonality_strength(ds, ts_col: str = "ts"):
    """Weekly seasonality strength of the daily event-count series: the
    share of daily-count variance explained by day-of-week means
    (between-group / total, the one-way ANOVA R²) — dow_daily_anomaly's
    single-number summary (near 0: no weekly cycle, near 1: volume is
    pure weekly seasonality).

    Exactness: S/SS fold as exact integers on the calendar-complete
    grid; each dow's between-variance term Dc·(μ_d − μ)² quantizes to
    micros and integer-sums (order-free — 7 doubles summed by SQL in
    arbitrary order would not hash-match), then two divisions and one
    round6.  Returns one row (n_days, total, var_total, var_between,
    strength)."""
    from deepkg_ray.functions.numeric import round6 as _r6
    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(us // 86_400_000_000, return_counts=True)
        return pa.table({"day": pa.array(vals.astype(np.int64)),
                         "n": pa.array(cnts.astype(np.int64))})

    merged = merge_partials(
        ds.select_columns([ts_col]).map_batches(
            partial, batch_format="pyarrow"),
        ["day"], {"n": "sum"}, mode="tree")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day", kind="stable")
        days = df["day"].to_numpy(np.int64)
        d0, d1 = int(days[0]), int(days[-1])
        D = d1 - d0 + 1
        full = np.zeros(D, np.int64)
        full[days - d0] = df["n"].to_numpy(np.int64)
        dow = (np.arange(d0, d1 + 1, dtype=np.int64) + 4) % 7
        S = int(full.sum())
        SS = int((full * full).sum())
        Sd = np.zeros(7, np.int64)
        np.add.at(Sd, dow, full)
        Dc = np.bincount(dow, minlength=7).astype(np.int64)
        mu = float(S) / D
        var_total = float(SS) / D - mu * mu
        present = Dc > 0
        mud = Sd[present] / Dc[present].astype(np.float64)
        terms = np.floor(Dc[present] * (mud - mu) * (mud - mu)
                         * 1e6 + 0.5).astype(np.int64)
        var_between = float(int(terms.sum())) / 1e6 / D
        strength = _r6(var_between / var_total) if var_total > 0 else 0.0
        return pd.DataFrame({
            "n_days": pd.array([D], dtype="int64"),
            "total": pd.array([S], dtype="int64"),
            "var_total": [var_total],
            "var_between": [var_between],
            "strength": [strength]})

    return merged.repartition(1).map_batches(finish,
                                             batch_format="pandas",
                                             batch_size=None)


def survival_curve(ds, *, event_type: str = "purchase",
                   user_col: str = "user_id", ts_col: str = "ts",
                   type_col: str = "event_type"):
    """Kaplan–Meier survival curve for time-to-first-``event_type``:
    per user the duration (whole days) from their FIRST event to their
    first purchase, right-censored at their last observed event — the
    conversion-lag estimator that handles never-converters honestly
    (conversion_lag's quantiles condition on converting; KM does not).

    Exactness: the per-user (first, first-purchase, last) triple folds
    as min/min/max partials (sentinel = int64 max for no purchase);
    durations histogram into (t_days, c, d) cells (day-range-bounded);
    each factor ln(1 − d/n) quantizes to ln-micros and the product is
    ONE exp of the integer cumulative sum (the geometric-mean
    convention), with d = n_at_risk pinning survival to 0 from that
    time on.  Returns event-time rows (t_days, n_risk, d, survival)."""
    from deepkg_ray.stages.treeagg import merge_partials

    SENTINEL = np.iinfo(np.int64).max

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            user_col: b[user_col].to_numpy(zero_copy_only=False),
            "us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
                  .to_numpy(zero_copy_only=False),
            "is_p": np.asarray(
                pc.equal(b[type_col], event_type).to_numpy(
                    zero_copy_only=False))})
        df["pus"] = np.where(df["is_p"], df["us"], SENTINEL)
        g = (df.groupby(user_col, as_index=False, sort=False)
             .agg(f=("us", "min"), p=("pus", "min"), l=("us", "max")))
        for c in ("f", "p", "l"):
            g[c] = g[c].astype("int64")
        return g

    trip = merge_partials(
        ds.select_columns([user_col, ts_col, type_col]).map_batches(
            partial, batch_format="pyarrow"),
        [user_col], {"f": "min", "p": "min", "l": "max"}, mode="auto")

    def durations(b: pa.Table) -> pa.Table:
        f = b["f"].to_numpy(zero_copy_only=False)
        p = b["p"].to_numpy(zero_copy_only=False)
        l = b["l"].to_numpy(zero_copy_only=False)
        ev = p != SENTINEL
        t = np.where(ev, p - f, l - f) // 86_400_000_000
        g = (pd.DataFrame({"t_days": t.astype(np.int64),
                           "ev": ev.astype(np.int64), "one": 1})
             .groupby(["t_days"], as_index=False)
             .agg(c=("one", "sum"), d=("ev", "sum")))
        g["c"] = g["c"].astype("int64")
        g["d"] = g["d"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = merge_partials(
        trip.map_batches(durations, batch_format="pyarrow"),
        ["t_days"], {"c": "sum", "d": "sum"}, mode="tree")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("t_days", kind="stable")
        c = df["c"].to_numpy(np.int64)
        d = df["d"].to_numpy(np.int64)
        n_risk = np.cumsum(c[::-1])[::-1]       # at risk: t_u >= t
        dead = d == n_risk
        # guard BEFORE the log: np.where evaluates both branches and
        # floor(log(0)) -> int64 garbage
        ratio = np.where(dead, 1.0, 1.0 - d / n_risk.astype(np.float64))
        lm = np.floor(np.log(ratio) * 1e6 + 0.5).astype(np.int64)
        cum = np.cumsum(lm)
        anydead = np.maximum.accumulate(dead)
        surv = np.where(anydead, 0.0,
                        np.floor(np.exp(cum / 1e6) * 1e6 + 0.5) / 1e6)
        out = pd.DataFrame({
            "t_days": df["t_days"].to_numpy(np.int64),
            "n_risk": n_risk.astype(np.int64),
            "d": d, "survival": surv})
        return out[d > 0].reset_index(drop=True)

    return cells.repartition(1).map_batches(finish,
                                            batch_format="pandas",
                                            batch_size=None)


def dow_daily_anomaly(ds, ts_col: str = "ts", thresh: float = 2.0):
    """Seasonality-adjusted daily volume anomaly: each calendar day's
    event count z-scored against ITS day-of-week's mean/std over the
    calendar-complete range (missing days count 0, the
    cusum_changepoint convention) — the weekly-seasonal monitor that
    doesn't page on every quiet Sunday.  DOW follows DuckDB's
    dayofweek (0 = Sunday; epoch day 0 is a Thursday → (day+4) % 7).

    Exactness: per-dow Σn / Σn² are exact integers; z is ONE fixed
    double chain (n − S/D) / √(SS/D − (S/D)²), round6'd, with
    zero-variance dows pinned to z = 0.  (day, n) grid combiner + tree
    merge; the finish sees ≤ D rows.  Returns (day_us, dow, n, z,
    is_outlier)."""
    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(us // 86_400_000_000, return_counts=True)
        return pa.table({"day": pa.array(vals.astype(np.int64)),
                         "n": pa.array(cnts.astype(np.int64))})

    merged = merge_partials(
        ds.select_columns([ts_col]).map_batches(
            partial, batch_format="pyarrow"),
        ["day"], {"n": "sum"}, mode="tree")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day", kind="stable")
        days = df["day"].to_numpy(np.int64)
        d0, d1 = int(days[0]), int(days[-1])
        D = d1 - d0 + 1
        full = np.zeros(D, np.int64)
        full[days - d0] = df["n"].to_numpy(np.int64)
        all_days = np.arange(d0, d1 + 1, dtype=np.int64)
        dow = (all_days + 4) % 7
        S = np.zeros(7, np.int64)
        np.add.at(S, dow, full)                 # exact int sums (bincount
        SS = np.zeros(7, np.int64)              # weights would go float)
        np.add.at(SS, dow, full * full)
        Dc = np.bincount(dow, minlength=7).astype(np.int64)
        mu = S / Dc.astype(np.float64)
        var = SS / Dc.astype(np.float64) - mu * mu
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(var[dow] <= 0, 0.0,
                         (full - mu[dow]) / np.sqrt(var[dow]))
        z6 = np.floor(z * 1e6 + 0.5) / 1e6
        return pd.DataFrame({
            "day_us": all_days * 86_400_000_000,
            "dow": dow.astype(np.int64),
            "n": full,
            "z": z6,
            "is_outlier": (np.abs(z6) > thresh).astype(np.int64)})

    return merged.repartition(1).map_batches(finish,
                                             batch_format="pandas",
                                             batch_size=None)


def channel_ltv_quantiles(ds, qs=(0.25, 0.5, 0.75, 0.9), **kw):
    """Customer-lifetime-value distribution per acquisition channel:
    interpolated quantiles of per-user purchase revenue grouped by the
    user's FIRST event type — first_touch_attribution (who acquired
    them) composed with grouped_quantiles_cont (what they're worth);
    the mean-only rollup hides exactly the skew this shows.

    The per-user (first_type, rm) table comes off first-touch's merge
    tree; rm micros → double → micros round-trips exactly below 2^52,
    so the quantile plan's quantization is lossless.  Returns
    (first_type, q, value)."""
    from deepkg_ray.stages.quantiles import grouped_quantiles_cont

    users = first_touch_attribution(ds, _user_table=True, **kw)

    def to_ltv(b: pa.Table) -> pa.Table:
        return pa.table({
            "first_type": b["first_type"],
            "ltv": pa.array(b["rm"].to_numpy(zero_copy_only=False)
                            / 1e6, pa.float64())})

    return grouped_quantiles_cont(
        users.map_batches(to_ltv, batch_format="pyarrow"),
        "first_type", "ltv", list(qs))


def cusum_changepoint(ds, ts_col: str = "ts"):
    """CUSUM level-shift scan over the calendar-complete daily
    event-count series: with μ = total/D over ALL D days in [first,
    last] (missing days count 0), S_k = Σ_{i≤k}(n_i − μ) and the change
    point is the day maximizing |S_k| (tie → earliest day) — the
    offline mean-shift detector (Page 1954's batch form) a volume
    monitor runs before alerting on a step change.

    Exactness: the scaled statistic s_k = D·prefix_k − k·total is an
    exact int64 (loud assert on the bound, the PACK convention), the
    argmax runs on integers, and the reported cusum is ONE round6
    division s*/D.  Plan: (day, n) grid combiner + tree merge
    (calendar-bounded), one final task over ≤ D rows.  Returns one row
    (change_day_us, cusum, n_days, total)."""
    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(us // 86_400_000_000, return_counts=True)
        return pa.table({"day": pa.array(vals.astype(np.int64)),
                         "n": pa.array(cnts.astype(np.int64))})

    merged = merge_partials(
        ds.select_columns([ts_col]).map_batches(
            partial, batch_format="pyarrow"),
        ["day"], {"n": "sum"}, mode="tree")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day", kind="stable")
        days = df["day"].to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        d0, d1 = int(days[0]), int(days[-1])
        D = d1 - d0 + 1
        full = np.zeros(D, np.int64)
        full[days - d0] = n
        total = int(full.sum())
        assert total * D < 2 ** 62, "cusum int64 bound exceeded"
        k = np.arange(1, D + 1, dtype=np.int64)
        s = D * np.cumsum(full) - k * total
        idx = int(np.argmax(np.abs(s)))      # first max == earliest day
        return pd.DataFrame({
            "change_day_us": pd.array(
                [(d0 + idx) * 86_400_000_000], dtype="int64"),
            "cusum": [round6(s[idx] / D)],
            "n_days": pd.array([D], dtype="int64"),
            "total": pd.array([total], dtype="int64")})

    return merged.repartition(1).map_batches(finish,
                                             batch_format="pandas",
                                             batch_size=None)


def session_paths(ds, gap_sec: int = 1800, prefix_len: int = 3,
                  user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id", type_col: str = "event_type"):
    """Session path analysis: the '>'-joined sequence of the first
    ``prefix_len`` event types of each user session (session_type_pairs'
    gap rule, (ts, event_id) order) with the number of sessions following
    each path — the clickstream "top paths" report.

    Plan: user-complete coarse partitions; per partition one sort pass
    assigns session ids, a rank-pivot builds the prefix strings fully
    vectorized, and the (path) count merge is bounded by the
    |types|^prefix_len path dictionary.  Returns (path, n_sessions)."""
    gap_us = gap_sec * 1_000_000
    n_parts = 64

    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b[user_col].to_pylist())
        return pa.table({
            user_col: b[user_col],
            id_col: b[id_col].combine_chunks().cast(pa.int64()),
            type_col: b[type_col],
            "us": b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32))})

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, "us", id_col], kind="stable")
        u = g[user_col].to_numpy()
        us = g["us"].to_numpy(np.int64)
        same = np.concatenate(([False], u[1:] == u[:-1]))
        gap = np.concatenate(([0], us[1:] - us[:-1]))
        sid = np.cumsum((~same) | (gap > gap_us))
        first = np.concatenate(([0], np.nonzero(
            sid[1:] != sid[:-1])[0] + 1))
        rn = np.arange(len(sid)) - first[
            np.cumsum(np.concatenate(([False], sid[1:] != sid[:-1])))]
        kept = pd.DataFrame({"sid": sid, "rn": rn,
                             "t": g[type_col].to_numpy()})
        kept = kept[kept["rn"] < prefix_len]
        piv = kept.pivot(index="sid", columns="rn", values="t") \
            .reindex(columns=range(prefix_len))
        path = piv[0].to_numpy(dtype=object)
        for j in range(1, prefix_len):
            col = piv[j]
            mask = col.isna().to_numpy()
            seg = np.where(
                mask, "",
                ">" + col.fillna("").astype(str).to_numpy(dtype=object))
            path = path + seg
        out = (pd.Series(path).value_counts().rename_axis("path")
               .reset_index(name="n_sessions"))
        out["n_sessions"] = out["n_sessions"].astype("int64")
        return out

    from deepkg_ray.stages.treeagg import merge_partials
    parted = ds.select_columns([user_col, ts_col, id_col, type_col]) \
        .map_batches(add_part, batch_format="pyarrow")
    paths = parted.groupby("part").map_groups(per_partition,
                                              batch_format="pandas")
    return merge_partials(paths, ["path"], {"n_sessions": "sum"})


def expfit_ks(ds, user_col: str = "user_id", ts_col: str = "ts",
              id_col: str = "event_id"):
    """One-sample goodness-of-fit: MLE-fit an exponential to the per-user
    inter-arrival gaps and report the Kolmogorov–Smirnov statistic
    against the fitted CDF — the Poisson-process model check (completes
    the statistics family: OLS/Zipf fit parameters, two-sample KS; this
    is the one-sample fit-VALIDATION member).

    Exactness: the MLE mean is the exact integer Σgap/n; the KS sup runs
    over the gap VALUE-COUNT histogram (the quantile-family posture), so
    each support point contributes two deterministic doubles
    (|cum/n − F|, |(cum−cnt)/n − F| with F = 1 − exp(−g/mean)) and the
    max is order-free; one round6 at the end.  Returns one row
    (n, sum_gap_us, ks_d)."""
    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.treeagg import merge_partials

    gaps = interarrival_gaps(ds, user_col=user_col, ts_col=ts_col,
                             id_col=id_col)

    def hist(b: pa.Table) -> pd.DataFrame:
        g = (pd.DataFrame({"gap_us": b["gap_us"].to_numpy(
            zero_copy_only=False)})
            .groupby("gap_us", as_index=False).size()
            .rename(columns={"size": "cnt"}))
        g["cnt"] = g["cnt"].astype("int64")
        return g

    merged = merge_partials(
        gaps.select_columns(["gap_us"]).map_batches(
            hist, batch_format="pyarrow"),
        ["gap_us"], {"cnt": "sum"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("gap_us", kind="stable")
        g = df["gap_us"].to_numpy(np.int64)
        c = df["cnt"].to_numpy(np.int64)
        n = int(c.sum())
        s = int((g * c).sum())
        mean = float(s) / n
        F = 1.0 - np.exp(-(g / mean))
        cum = np.cumsum(c)
        d = np.maximum(np.abs(cum / n - F),
                       np.abs((cum - c) / n - F)).max()
        return pd.DataFrame({"n": [n], "sum_gap_us": [s],
                             "ks_d": [round6(d)]})

    return merged.repartition(1).map_batches(finish,
                                             batch_format="pandas",
                                             batch_size=None)


def cep_pattern_matches(ds, *, a_type: str = "view",
                        b_type: str = "click",
                        c_type: str = "purchase",
                        window_us: int = 3_600_000_000,
                        n_parts: int = 64):
    """Multi-event sequence-pattern detection — SEQ(A, B+, C) within a
    time window under skip-till-next-match semantics (the SASE/CEP
    match model, Wu et al. SIGMOD'06; Ray Data has no CEP operator, this
    is the batch-audited equivalent): for every A event, take the FIRST
    C event of the same user strictly later in (ts, event_id) order and
    within ``window_us``; the pattern matches iff ≥ 1 B event sits
    strictly between them.  Deterministic: total order is (ts_us,
    event_id), so ties never float.

    Plan: user-complete coarse hash partitions (the max_drawdown shape);
    inside each partition one sort + per-user vectorized searchsorted
    (first-C lookup) + prefix-count difference (Bs between) — no
    per-event Python loop.  Returns per-user rows
    (user_id, n_a, n_matched, n_b_in_matches)."""
    import pandas as pd

    from deepkg_ray.functions.hashing import stable_hash64_batch

    def keyed(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = stable_hash64_batch([str(u) for u in uid])
        return pa.table({
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
            "user_id": pa.array(uid, pa.int64()),
            "event_id": b["event_id"].combine_chunks().cast(pa.int64()),
            "ts_us": b["ts"].combine_chunks().cast(pa.timestamp("us"))
                     .cast(pa.int64()),
            "event_type": b["event_type"]})

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="stable")
        out = []
        for uid, u in g.groupby("user_id", sort=False):
            et = u["event_type"].to_numpy(object)
            ts = u["ts_us"].to_numpy(np.int64)
            is_b = (et == b_type)
            bcum = np.concatenate([[0], np.cumsum(is_b)])  # prefix incl.
            a_pos = np.flatnonzero(et == a_type)
            c_pos = np.flatnonzero(et == c_type)
            n_a = len(a_pos)
            if n_a == 0:
                out.append((int(uid), 0, 0, 0))
                continue
            if len(c_pos) == 0:
                out.append((int(uid), n_a, 0, 0))
                continue
            idx = np.searchsorted(c_pos, a_pos, side="right")
            valid = idx < len(c_pos)
            first_c = np.where(valid, c_pos[np.minimum(
                idx, len(c_pos) - 1)], -1)
            in_win = valid & (ts[first_c] - ts[a_pos] <= window_us)
            # Bs strictly between positions a_pos and first_c
            nb = np.where(in_win,
                          bcum[np.maximum(first_c, 0)]
                          - bcum[a_pos + 1], 0)
            matched = in_win & (nb >= 1)
            out.append((int(uid), n_a, int(matched.sum()),
                        int(nb[matched].sum())))
        return pd.DataFrame(out, columns=["user_id", "n_a", "n_matched",
                                          "n_b_in_matches"]) \
            .astype({"user_id": "int64", "n_a": "int64",
                     "n_matched": "int64", "n_b_in_matches": "int64"})

    return (ds.select_columns(["user_id", "event_id", "ts", "event_type"])
            .map_batches(keyed, batch_format="pyarrow")
            .groupby("part").map_groups(per_part, batch_format="pandas"))


def cep_absence_matches(ds, *, a_type: str = "signup",
                        n_type: str = "error",
                        c_type: str = "purchase",
                        window_us: int = 3_600_000_000,
                        n_parts: int = 64):
    """Negation CEP — SEQ(A, ¬N, C) within a window: for every A event,
    the first same-user C strictly later in (ts, event_id) order within
    ``window_us`` MATCHES iff ZERO N-type events sit strictly between —
    absence detection (the "clean conversion" pattern: signup →
    purchase with no error in between), the dual of
    cep_pattern_matches' B+ requirement and the second half of the
    SASE operator set.  Same plan: user-complete partitions, one sort,
    vectorized first-C lookup + prefix-count difference.
    Returns (user_id, n_a, n_matched, n_blocked) — blocked = an
    in-window C existed but an N intervened."""
    import pandas as pd

    from deepkg_ray.functions.hashing import stable_hash64_batch

    def keyed(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = stable_hash64_batch([str(u) for u in uid])
        return pa.table({
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
            "user_id": pa.array(uid, pa.int64()),
            "event_id": b["event_id"].combine_chunks().cast(pa.int64()),
            "ts_us": b["ts"].combine_chunks().cast(pa.timestamp("us"))
                     .cast(pa.int64()),
            "event_type": b["event_type"]})

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="stable")
        out = []
        for uid, u in g.groupby("user_id", sort=False):
            et = u["event_type"].to_numpy(object)
            ts = u["ts_us"].to_numpy(np.int64)
            ncum = np.concatenate([[0], np.cumsum(et == n_type)])
            a_pos = np.flatnonzero(et == a_type)
            c_pos = np.flatnonzero(et == c_type)
            n_a = len(a_pos)
            if n_a == 0 or len(c_pos) == 0:
                out.append((int(uid), n_a, 0, 0))
                continue
            idx = np.searchsorted(c_pos, a_pos, side="right")
            valid = idx < len(c_pos)
            first_c = np.where(valid, c_pos[np.minimum(
                idx, len(c_pos) - 1)], -1)
            in_win = valid & (ts[first_c] - ts[a_pos] <= window_us)
            nn = np.where(in_win,
                          ncum[np.maximum(first_c, 0)]
                          - ncum[a_pos + 1], 0)
            matched = in_win & (nn == 0)
            blocked = in_win & (nn > 0)
            out.append((int(uid), n_a, int(matched.sum()),
                        int(blocked.sum())))
        return pd.DataFrame(out, columns=["user_id", "n_a", "n_matched",
                                          "n_blocked"]) \
            .astype({"user_id": "int64", "n_a": "int64",
                     "n_matched": "int64", "n_blocked": "int64"})

    return (ds.select_columns(["user_id", "event_id", "ts", "event_type"])
            .map_batches(keyed, batch_format="pyarrow")
            .groupby("part").map_groups(per_part, batch_format="pandas"))


def markov_entropy_rate(ds, user_col: str = "user_id", ts_col: str = "ts",
                        id_col: str = "event_id",
                        key_col: str = "event_type"):
    """Plug-in entropy rate of the event-type chain: the conditional
    entropy H(next | current) = Σ_ij (n_ij/N)·ln(n_i·/n_ij) over the
    empirical transition counts — how predictable the next event is
    given the current one (0 = deterministic chain, ln|types| = i.i.d.
    uniform).  Per-term micros floor then integer sum (the ln-parity
    convention); all counts come from the markov_transitions pipeline
    (bounded |types|² rows), so this is one bounded finisher on top of
    it.  Returns (n_transitions, n_pairs, entropy_micros, entropy_rate)."""
    import math

    import ray.data as rd

    t = markov_transitions(ds, user_col=user_col, ts_col=ts_col,
                           id_col=id_col, key_col=key_col).to_pandas()
    n = t["n"].to_numpy(np.int64)
    big_n = int(n.sum())
    row_tot = t.groupby("src_type")["n"].transform("sum") \
        .to_numpy(np.int64)
    terms = [math.floor((int(nij) / big_n)
                        * math.log(int(tot) / int(nij)) * 1e6 + 0.5)
             for nij, tot in zip(n, row_tot)]
    hm = int(sum(terms))
    return rd.from_arrow(pa.table({
        "n_transitions": pa.array([big_n], pa.int64()),
        "n_pairs": pa.array([len(t)], pa.int64()),
        "entropy_micros": pa.array([hm], pa.int64()),
        "entropy_rate": pa.array([hm / 1e6], pa.float64())}))
