"""CUPED + PSI drift (stages/experiment.py)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data as rd


def _events(n_users=60, per_user=20, seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    base = 1_700_000_000_000_000
    span = 10_000_000_000
    for u in range(n_users):
        trait = rng.normal(10.0, 3.0)
        for _ in range(per_user):
            ts = base + int(rng.integers(0, span))
            # post values correlate with the user's trait → CUPED helps
            val = max(0.01, trait + rng.normal(0.0, 1.0))
            rows.append((ts, u, round(val, 2)))
    df = pd.DataFrame(rows, columns=["tsu", "user_id", "value"])
    df["ts"] = pd.to_datetime(df["tsu"], unit="us")
    return df[["ts", "user_id", "value"]]


def test_cuped_matches_numpy_and_reduces_variance():
    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.experiment import cuped_adjustment
    df = _events()
    got = cuped_adjustment(rd.from_pandas(df)).to_pandas()
    # numpy ground truth with the same quantization pipeline
    tsu = df["ts"].astype("int64").to_numpy()
    mid = (int(tsu.min()) + int(tsu.max())) // 2
    vm = np.floor(df["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    agg = pd.DataFrame({
        "u": df["user_id"],
        "pre": np.where(tsu < mid, vm, 0),
        "post": np.where(tsu >= mid, vm, 0)}).groupby("u").sum()
    x = (agg["pre"].to_numpy() // 1000).astype(object)
    y = (agg["post"].to_numpy() // 1000).astype(object)
    n = len(x)
    sx, sy = int(sum(x)), int(sum(y))
    sxx = int(sum(a * a for a in x))
    syy = int(sum(a * a for a in y))
    sxy = int(sum(a * b for a, b in zip(x, y)))
    cov, vx, vy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    assert got.loc[0, "n_users"] == n
    assert got.loc[0, "theta"] == round6(float(cov) / float(vx))
    assert got.loc[0, "var_reduction"] == round6(
        float(cov) * float(cov) / (float(vx) * float(vy)))
    # the trait-driven correlation must yield a real reduction (the
    # complementary split counts add anti-correlated noise, so the
    # attainable rho^2 here is modest but clearly non-zero)
    assert got.loc[0, "var_reduction"] > 0.05
    assert got.loc[0, "theta"] > 0


def test_psi_drift_detects_mix_shift():
    from deepkg_ray.stages.experiment import psi_drift
    base = 1_700_000_000_000_000
    rows = []
    # first half: mostly A; second half: mostly B → large PSI terms
    for i in range(400):
        rows.append((base + i, "A" if i % 4 else "B"))
    for i in range(400):
        rows.append((base + 10_000_000 + i, "B" if i % 4 else "A"))
    df = pd.DataFrame(rows, columns=["tsu", "event_type"])
    df["ts"] = pd.to_datetime(df["tsu"], unit="us")
    got = (psi_drift(rd.from_pandas(df[["ts", "event_type"]]))
           .to_pandas().set_index("cat"))
    assert got.loc["A", "n_first"] == 300 and got.loc["A", "n_second"] == 100
    # hand-compute the A term
    p = (300 + 0.5) / (400 + 1.0)
    q = (100 + 0.5) / (400 + 1.0)
    want = math.floor((p - q) * math.log(p / q) * 1e6 + 0.5)
    assert got.loc["A", "psi_term_micros"] == want
    # drifted mix → total PSI well above the 0.2 alert bar
    assert got["psi_term_micros"].sum() / 1e6 > 0.2


def test_psi_drift_stable_mix_near_zero():
    from deepkg_ray.stages.experiment import psi_drift
    base = 1_700_000_000_000_000
    rows = [(base + i * 1_000, "ABC"[i % 3]) for i in range(1200)]
    df = pd.DataFrame(rows, columns=["tsu", "event_type"])
    df["ts"] = pd.to_datetime(df["tsu"], unit="us")
    got = psi_drift(rd.from_pandas(df[["ts", "event_type"]])).to_pandas()
    assert abs(got["psi_term_micros"].sum()) / 1e6 < 0.01


def test_bootstrap_diff_ci_covers_true_difference():
    from deepkg_ray.stages.approx import poisson_bootstrap_diff_ci
    rng = np.random.default_rng(8)
    n = 4000
    grp = np.where(rng.random(n) < 0.4, "A", "B")
    vals = np.where(grp == "A",
                    rng.normal(60.0, 5.0, n),
                    rng.normal(50.0, 5.0, n)).round(2)
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "v": vals, "g": grp})
    ds = rd.from_pandas(df)
    ci = poisson_bootstrap_diff_ci(ds, "id", "v", "g", "A", n_boot=64)
    true_diff = vals[grp == "A"].mean() - vals[grp == "B"].mean()
    assert ci.loc[0, "ci_lo"] < true_diff < ci.loc[0, "ci_hi"]
    # the ~10-unit effect is way outside a zero-covering CI
    assert ci.loc[0, "ci_lo"] > 5.0
    # deterministic
    again = poisson_bootstrap_diff_ci(ds, "id", "v", "g", "A", n_boot=64)
    pd.testing.assert_frame_equal(ci, again)


def test_diff_in_diff_golden():
    """Hand-built 2x2: control flat (5 -> 5), treated lifts (5 -> 8)
    after the midpoint => DiD = 3.  Odd users are treated."""
    from deepkg_ray.stages.experiment import diff_in_diff
    base = 1_700_000_000_000_000
    rows = []
    for u, pre_v, post_v in [(2, 5.0, 5.0), (4, 5.0, 5.0),
                             (1, 5.0, 8.0), (3, 5.0, 8.0)]:
        rows.append((base, u, pre_v))                 # pre (ts = lo)
        rows.append((base + 1_000_000_000, u, post_v))  # post (ts = hi)
    df = pd.DataFrame(rows, columns=["tsu", "user_id", "value"])
    df["ts"] = pd.to_datetime(df["tsu"], unit="us")
    out = diff_in_diff(rd.from_pandas(
        df[["ts", "user_id", "value"]])).to_pandas()
    assert out["n_c_pre"].item() == 2 and out["n_t_post"].item() == 2
    assert out["mean_c_pre"].item() == 5.0
    assert out["mean_t_post"].item() == 8.0
    assert out["did"].item() == 3.0


def test_diff_in_diff_parallel_trends_zero():
    """Both groups drift by the same +2 => DiD = 0 (the estimator
    removes the shared trend)."""
    from deepkg_ray.stages.experiment import diff_in_diff
    base = 1_700_000_000_000_000
    rows = []
    for u, pre_v in [(2, 4.0), (4, 6.0), (1, 3.0), (3, 9.0)]:
        rows.append((base, u, pre_v))
        rows.append((base + 1_000_000_000, u, pre_v + 2.0))
    df = pd.DataFrame(rows, columns=["tsu", "user_id", "value"])
    df["ts"] = pd.to_datetime(df["tsu"], unit="us")
    out = diff_in_diff(rd.from_pandas(
        df[["ts", "user_id", "value"]])).to_pandas()
    assert out["did"].item() == 0.0


def test_srm_check_golden():
    """6 even vs 14 odd distinct users, duplicated event rows must not
    double-count: chi2 = (14-6)^2/20 = 3.2 -> no flag; a 2-vs-18 split
    flags."""
    from deepkg_ray.stages.experiment import srm_check
    users = list(range(0, 12, 2)) + list(range(1, 28, 2))
    df = pd.DataFrame({"user_id": users * 3})      # 3 events per user
    out = srm_check(rd.from_pandas(df)).to_pandas()
    assert out["n_control"].item() == 6
    assert out["n_treat"].item() == 14
    assert out["chi2_micros"].item() == (8 * 8 * 10**6) // 20
    assert out["srm_flag"].item() == 0
    df2 = pd.DataFrame({"user_id": [0, 2] + list(range(1, 36, 2))})
    out2 = srm_check(rd.from_pandas(df2)).to_pandas()
    assert out2["srm_flag"].item() == 1


def test_permutation_test_null_is_uniformish():
    """Labels independent of values: the observed weekend 'effect' on a
    symmetric null corpus should not be extreme — p well above 0.05 —
    and a strong injected effect drives p to the floor 1/(K+1)."""
    from deepkg_ray.stages.experiment import permutation_test_weekend
    rng = np.random.default_rng(3)
    n = 400
    # Jan 2024: 6th/7th are Sat/Sun, 8th/9th Mon/Tue
    days = ["2024-01-06", "2024-01-07", "2024-01-08", "2024-01-09"]
    ts = pd.to_datetime([days[i % 4] for i in range(n)])
    null_vals = rng.normal(50.0, 5.0, n).round(2)
    df = pd.DataFrame({"ts": ts,
                       "event_id": np.arange(n, dtype=np.int64),
                       "value": null_vals})
    out = permutation_test_weekend(rd.from_pandas(df)).to_pandas()
    assert out["p_value"].item() > 0.05
    # inject +30 on weekends -> significant
    lift = null_vals + np.where(np.arange(n) % 4 < 2, 30.0, 0.0)
    df2 = df.assign(value=lift)
    out2 = permutation_test_weekend(rd.from_pandas(df2)).to_pandas()
    assert out2["p_value"].item() <= 2 / 65
    assert abs(out2["t_obs"].item()) > 10
