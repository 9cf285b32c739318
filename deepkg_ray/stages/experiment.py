"""Experimentation / monitoring analytics: CUPED variance reduction and
PSI drift.

Engine-only additions (the reference has no experimentation surface);
both follow the repo's integer-moment exactness conventions:

* **CUPED** (Deng et al. 2013 "Improving the Sensitivity of Online
  Controlled Experiments by Utilizing Pre-Experiment Data"): the
  industry-standard variance-reduction adjustment — regress each user's
  experiment-period metric on their pre-period metric, θ =
  cov(pre, post)/var(pre), report the variance-reduction fraction ρ².
  Per-user sums are micros-exact; the moment pass quantizes user totals
  to MILLIS (documented bound: Σx² < 2^63 — holds to ~10^6 users at
  ~5e6-milli totals; raise the quantizer at larger scale) so the
  distributed partials stay int64, and the final θ/ρ² products run in
  Python big ints (SQL: HUGEINT).

* **PSI** (population stability index, the standard model-monitoring
  drift score): categorical PSI of the event_type mix between the first
  and second half of the time range, Σ (p−q)·ln(p/q) with +0.5 count
  smoothing; per-type terms are micros-floored then integer-summed (the
  ln-parity convention), so DuckDB reproduces every term bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def cuped_adjustment(ds, *, ts_col: str = "ts", user_col: str = "user_id",
                     value_col: str = "value"):
    """θ and variance-reduction fraction for the half-period split: pre =
    user's value sum in [min_ts, mid), post = sum in [mid, max_ts]; users
    missing from a half contribute 0 (standard — the user universe is
    everyone active in the window).  Returns one row
    (n_users, theta, var_reduction)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.treeagg import merge_partials

    span = ds.select_columns([ts_col]).map_batches(
        lambda b: pa.table({
            "lo": pa.array([int(np.min(
                b[ts_col].cast(pa.int64()).to_numpy()))], pa.int64()),
            "hi": pa.array([int(np.max(
                b[ts_col].cast(pa.int64()).to_numpy()))], pa.int64())}),
        batch_format="pyarrow").aggregate(Min("lo", alias_name="lo"),
                                          Max("hi", alias_name="hi"))
    lo, hi = int(span["lo"]), int(span["hi"])
    mid = (lo + hi) // 2

    def per_user_partial(b: pa.Table) -> pd.DataFrame:
        ts = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        vm = np.floor(np.asarray(b[value_col].to_numpy(
            zero_copy_only=False), np.float64) * 1e6 + 0.5).astype(np.int64)
        d = pd.DataFrame({
            "u": b[user_col].to_numpy(zero_copy_only=False),
            "pre": np.where(ts < mid, vm, 0),
            "post": np.where(ts >= mid, vm, 0)})
        return d.groupby("u", sort=False, as_index=False).sum()

    users = merge_partials(
        ds.select_columns([ts_col, user_col, value_col]).map_batches(
            per_user_partial, batch_format="pyarrow"),
        ["u"], {"pre": "sum", "post": "sum"}, mode="auto")

    def moments(b: pa.Table) -> pa.Table:
        # millis quantization keeps Σx² int64-safe (module docstring)
        x = b["pre"].to_numpy(zero_copy_only=False) // 1000
        y = b["post"].to_numpy(zero_copy_only=False) // 1000
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64())})

    agg = users.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
        Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"))
    n, sx, sy = int(agg["n"]), int(agg["sx"]), int(agg["sy"])
    sxx, syy, sxy = int(agg["sxx"]), int(agg["syy"]), int(agg["sxy"])
    cov_num = n * sxy - sx * sy            # python big ints — exact
    varx_num = n * sxx - sx * sx
    vary_num = n * syy - sy * sy
    theta = float(cov_num) / float(varx_num) if varx_num else 0.0
    rho2 = (float(cov_num) * float(cov_num)
            / (float(varx_num) * float(vary_num))
            if varx_num and vary_num else 0.0)
    return rd.from_arrow(pa.table({
        "n_users": pa.array([n], pa.int64()),
        "theta": pa.array([round6(theta)], pa.float64()),
        "var_reduction": pa.array([round6(rho2)], pa.float64())}))


def diff_in_diff(ds, *, ts_col: str = "ts", user_col: str = "user_id",
                 value_col: str = "value"):
    """Difference-in-differences estimator over the event stream — the
    causal-inference workhorse for staggered rollouts (Card & Krueger
    1994 canon): treatment group = odd user_id (the deterministic
    assignment an A/B hash would give), period split at the CUPED
    midpoint mid = (min_ts + max_ts)//2, and

        DiD = (mean_t,post − mean_t,pre) − (mean_c,post − mean_c,pre)

    The distributed part is ONE stateless pass emitting eight int64
    cells per batch (count + micros value sum per 2×2 cell) folded by a
    global Sum — nothing keyed, nothing row-shaped on the driver.  All
    four means and the DiD run in ONE double chain each from the raw
    integer cells (round6 at the end only), mirrored in SQL.  Returns
    one row (n_c_pre, n_c_post, n_t_pre, n_t_post, mean_c_pre,
    mean_c_post, mean_t_pre, mean_t_post, did)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    from deepkg_ray.functions.numeric import round6

    span = ds.select_columns([ts_col]).map_batches(
        lambda b: pa.table({
            "lo": pa.array([int(np.min(
                b[ts_col].cast(pa.int64()).to_numpy()))], pa.int64()),
            "hi": pa.array([int(np.max(
                b[ts_col].cast(pa.int64()).to_numpy()))], pa.int64())}),
        batch_format="pyarrow").aggregate(Min("lo", alias_name="lo"),
                                          Max("hi", alias_name="hi"))
    mid = (int(span["lo"]) + int(span["hi"])) // 2

    cells = ("c_pre", "c_post", "t_pre", "t_post")

    def partial(b: pa.Table) -> pa.Table:
        ts = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = b[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vm = np.floor(np.asarray(b[value_col].to_numpy(
            zero_copy_only=False), np.float64) * 1e6 + 0.5) \
            .astype(np.int64)
        treat = (u % 2) == 1
        post = ts >= mid
        out = {}
        for name, m in (("c_pre", ~treat & ~post),
                        ("c_post", ~treat & post),
                        ("t_pre", treat & ~post),
                        ("t_post", treat & post)):
            out[f"n_{name}"] = pa.array([int(m.sum())], pa.int64())
            out[f"s_{name}"] = pa.array([int(vm[m].sum())], pa.int64())
        return pa.table(out)

    agg = (ds.select_columns([ts_col, user_col, value_col])
           .map_batches(partial, batch_format="pyarrow")
           .aggregate(*[Sum(f"{k}_{c}", alias_name=f"{k}_{c}")
                        for c in cells for k in ("n", "s")]))
    n = {c: int(agg[f"n_{c}"] or 0) for c in cells}
    s = {c: int(agg[f"s_{c}"] or 0) for c in cells}
    means = {c: (float(round6(np.asarray([s[c] / n[c] / 1e6]))[0])
                 if n[c] else 0.0) for c in cells}
    if all(n[c] > 0 for c in cells):
        did = float(round6(np.asarray([
            ((s["t_post"] / n["t_post"] - s["t_pre"] / n["t_pre"])
             - (s["c_post"] / n["c_post"] - s["c_pre"] / n["c_pre"]))
            / 1e6]))[0])
    else:
        did = 0.0
    cols = {}
    for c in cells:
        cols[f"n_{c}"] = pa.array([n[c]], pa.int64())
    for c in cells:
        cols[f"mean_{c}"] = pa.array([means[c]], pa.float64())
    cols["did"] = pa.array([did], pa.float64())
    return rd.from_arrow(pa.table(cols))


def permutation_test_weekend(ds, *, ts_col: str = "ts",
                             id_col: str = "event_id",
                             value_col: str = "value", seed: int = 17,
                             k_perms: int = 64):
    """Randomization test for the weekend effect: is the observed Welch
    t for weekend-vs-weekday means extreme against the null of
    exchangeable labels?  The permutation distribution is built in ONE
    corpus pass: permutation k relabels every row by BIT k of
    md5('seed:event_id') (64 deterministic Bernoulli-½ relabelings from
    one hash — the random-relabeling form of the test, valid under
    exchangeability since each permuted t uses its own group sizes),
    so the pass emits a 65-row (k, n₁, Σx, Σx²) table instead of
    rerunning 64 times.  p = (1 + #{|t_k| ≥ |t_obs|}) / (K + 1), the
    add-one permutation p-value (Phipson & Smyth 2010).

    Exactness: values are int64 millis (weekend_effect's quantization),
    partials merge by integer Sum, every t runs the weekend_effect Welch
    chain and is round6-ed BEFORE comparison — the SQL twin reproduces
    each t and the exceedance count bit for bit.  Overflow bound as
    weekend_effect: Σx² int64 holds to ~10⁹ rows at |value| ≤ 5·10⁵
    (shard the test beyond).  Returns one row
    (t_obs, k_perms, n_exceed, p_value)."""
    import ray.data as rd

    from deepkg_ray.functions.hashing import md5_lower64_batch
    from deepkg_ray.functions.numeric import round6

    K = int(k_perms)
    assert 1 <= K <= 64, "one md5 supplies at most 64 label bits"

    def partial(b: pa.Table) -> pd.DataFrame:
        us = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        dt = pd.to_datetime(us, unit="us")
        dow = (dt.dayofweek.to_numpy() + 1) % 7
        we = ((dow == 0) | (dow == 6))
        v = np.asarray(b[value_col].to_pylist(), np.float64)
        x = np.floor(v * 1e3 + 0.5).astype(np.int64)
        ids = b[id_col].to_pylist()
        h = md5_lower64_batch([f"{seed}:{i}" for i in ids])
        bits = ((h[:, None] >> np.arange(K, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)      # n × K
        ks = list(range(K)) + [100, 101]              # 100=weekend, 101=all
        n1 = np.concatenate([bits.sum(axis=0),
                             [int(we.sum()), len(x)]])
        s1 = np.concatenate([(bits * x[:, None]).sum(axis=0),
                             [int(x[we].sum()), int(x.sum())]])
        xx = x * x
        ss1 = np.concatenate([(bits * xx[:, None]).sum(axis=0),
                              [int(xx[we].sum()), int(xx.sum())]])
        return pd.DataFrame({"k": np.asarray(ks, np.int64),
                             "n1": n1.astype(np.int64),
                             "s1": s1.astype(np.int64),
                             "ss1": ss1.astype(np.int64)})

    from deepkg_ray.stages.treeagg import merge_partials
    m = merge_partials(
        ds.select_columns([ts_col, id_col, value_col]).map_batches(
            partial, batch_format="pyarrow"),
        ["k"], {"n1": "sum", "s1": "sum", "ss1": "sum"},
        mode="tree").to_pandas().set_index("k")

    N = int(m.loc[101, "n1"])
    S = int(m.loc[101, "s1"])
    SS = int(m.loc[101, "ss1"])

    def welch_t(n1, s1, ss1):
        """weekend_effect's exact Welch chain on (group1, complement)."""
        n0 = N - n1
        s0, ss0 = S - s1, SS - ss1
        if n1 < 2 or n0 < 2:
            return 0.0
        f1, f0 = float(n1), float(n0)
        v1 = (float(ss1) - float(s1) * float(s1) / f1) / (f1 - 1.0)
        v0 = (float(ss0) - float(s0) * float(s0) / f0) / (f0 - 1.0)
        se2 = v1 / f1 + v0 / f0
        if se2 <= 0:
            return 0.0
        return float(round6(np.asarray(
            [(float(s1) / f1 - float(s0) / f0) / np.sqrt(se2)]))[0])

    t_obs = welch_t(int(m.loc[100, "n1"]), int(m.loc[100, "s1"]),
                    int(m.loc[100, "ss1"]))
    n_exceed = 0
    for k in range(K):
        tk = welch_t(int(m.loc[k, "n1"]), int(m.loc[k, "s1"]),
                     int(m.loc[k, "ss1"]))
        if abs(tk) >= abs(t_obs):
            n_exceed += 1
    p = float(round6(np.asarray([(1 + n_exceed) / (K + 1)]))[0])
    return rd.from_arrow(pa.table({
        "t_obs": pa.array([t_obs], pa.float64()),
        "k_perms": pa.array([K], pa.int64()),
        "n_exceed": pa.array([n_exceed], pa.int64()),
        "p_value": pa.array([p], pa.float64())}))


def srm_check(ds, *, user_col: str = "user_id"):
    """Sample-ratio mismatch guardrail for the odd/even user assignment
    (the #1 A/B-test validity check — Fabijan et al. 2019: an SRM means
    the randomization itself broke, and every downstream metric is
    suspect): χ² of the DISTINCT-user split against 50/50,

        χ² = (n_t − n_c)² / (n_t + n_c)

    computed on randomization UNITS (distinct users — counting events
    would double-weight heavy users), as an exact integer rational in
    micros; flag at the 3.84 (α=0.05, df=1) threshold via integer
    comparison.  One user-keyed dedup groupby + a parity fold.  Returns
    one row (n_control, n_treat, chi2_micros, srm_flag)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    users = (ds.select_columns([user_col]).groupby(user_col)
             .aggregate(Count(alias_name="_c")))

    def parity(b: pa.Table) -> pa.Table:
        u = b[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = (u % 2) == 1
        return pa.table({
            "n_c": pa.array([int((~t).sum())], pa.int64()),
            "n_t": pa.array([int(t.sum())], pa.int64())})

    agg = users.map_batches(parity, batch_format="pyarrow").aggregate(
        Sum("n_c", alias_name="n_c"), Sum("n_t", alias_name="n_t"))
    n_c, n_t = int(agg["n_c"] or 0), int(agg["n_t"] or 0)
    tot = n_c + n_t
    chi2_micros = ((n_t - n_c) ** 2 * 10**6) // tot if tot else 0
    return rd.from_arrow(pa.table({
        "n_control": pa.array([n_c], pa.int64()),
        "n_treat": pa.array([n_t], pa.int64()),
        "chi2_micros": pa.array([chi2_micros], pa.int64()),
        "srm_flag": pa.array([int(chi2_micros > 3_841_459)],
                             pa.int64())}))


def psi_drift(ds, *, ts_col: str = "ts", cat_col: str = "event_type"):
    """Categorical PSI between the first and second half of the time
    range: per category (cat, n_first, n_second, psi_term_micros) with
    term = (p−q)·ln(p/q) over +0.5-smoothed shares, micros-floored —
    integer-sum the column for the total PSI.  Two bounded passes (span
    scalars, then a category×half count table)."""
    import math

    import ray.data as rd
    from ray.data.aggregate import Max, Min

    from deepkg_ray.stages.treeagg import merge_partials

    span = ds.select_columns([ts_col]).map_batches(
        lambda b: pa.table({
            "lo": pa.array([int(np.min(
                b[ts_col].cast(pa.int64()).to_numpy()))], pa.int64()),
            "hi": pa.array([int(np.max(
                b[ts_col].cast(pa.int64()).to_numpy()))], pa.int64())}),
        batch_format="pyarrow").aggregate(Min("lo", alias_name="lo"),
                                          Max("hi", alias_name="hi"))
    lo, hi = int(span["lo"]), int(span["hi"])
    mid = (lo + hi) // 2

    def partial(b: pa.Table) -> pd.DataFrame:
        ts = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = pd.DataFrame({
            "cat": b[cat_col].to_pylist(),
            "first": (ts < mid).astype(np.int64)})
        d["second"] = 1 - d["first"]
        return d.groupby("cat", sort=False, as_index=False).sum()

    counts = merge_partials(
        ds.select_columns([ts_col, cat_col]).map_batches(
            partial, batch_format="pyarrow"),
        ["cat"], {"first": "sum", "second": "sum"}).to_pandas()
    ta = float(counts["first"].sum())
    tb = float(counts["second"].sum())
    k = len(counts)
    rows = []
    for cat, a, b_ in sorted(zip(counts["cat"], counts["first"],
                                 counts["second"])):
        p = (a + 0.5) / (ta + 0.5 * k)
        q = (b_ + 0.5) / (tb + 0.5 * k)
        term = math.floor((p - q) * math.log(p / q) * 1e6 + 0.5)
        rows.append((cat, int(a), int(b_), int(term)))
    return rd.from_arrow(pa.table({
        "cat": pa.array([r[0] for r in rows], pa.string()),
        "n_first": pa.array([r[1] for r in rows], pa.int64()),
        "n_second": pa.array([r[2] for r in rows], pa.int64()),
        "psi_term_micros": pa.array([r[3] for r in rows], pa.int64())}))
