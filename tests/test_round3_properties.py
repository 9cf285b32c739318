"""Brute-force property tests for the round-3 statistics operators —
independent of both the engine plan AND the SQL oracle (a shared formula
error would pass parity; these recompute semantics from scratch)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st


def _values(min_size=2, max_size=60):
    # micros-grid floats so float→micros quantization is exact
    return st.lists(
        st.integers(min_value=-10**6, max_value=10**6).map(
            lambda m: m / 1e3),
        min_size=min_size, max_size=max_size)


@settings(max_examples=15, deadline=None)
@given(_values(min_size=1))
def test_grouped_mad_property(vals):
    from deepkg_ray.stages.quantiles import grouped_mad
    df = pd.DataFrame({"event_type": ["g"] * len(vals),
                       "value": np.asarray(vals, np.float64)})
    out = grouped_mad(rd.from_pandas(df)).to_pandas()
    vm = np.floor(np.asarray(vals) * 1e6 + 0.5).astype(np.int64)
    s = np.sort(vm)
    med2 = int(s[(len(s) - 1) // 2]) + int(s[len(s) // 2])
    d2 = np.sort(np.abs(2 * vm - med2))
    mad4 = int(d2[(len(d2) - 1) // 2]) + int(d2[len(d2) // 2])
    assert out["med2"].item() == med2
    assert out["mad4"].item() == mad4


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(st.booleans(),
                          st.integers(min_value=-1000, max_value=1000)),
                min_size=2, max_size=60))
def test_roc_auc_property(rows):
    from deepkg_ray.stages.quantiles import roc_auc
    if not any(p for p, _ in rows) or all(p for p, _ in rows):
        return                                    # needs both classes
    df = pd.DataFrame({
        "event_type": ["purchase" if p else "view" for p, _ in rows],
        "value": [v / 10.0 for _, v in rows]})
    out = roc_auc(rd.from_pandas(df)).to_pandas()
    pos = [v for p, v in rows if p]
    neg = [v for p, v in rows if not p]
    num2 = sum(2 if pv > nv else 1 if pv == nv else 0
               for pv in pos for nv in neg)
    assert out["auc_num2"].item() == num2
    assert abs(out["auc"].item()
               - num2 / (2 * len(pos) * len(neg))) < 1e-12


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3),            # user
                          st.integers(0, 8000),         # ts seconds
                          st.booleans()),               # purchase?
                min_size=1, max_size=50))
def test_timed_conversions_property(rows):
    from deepkg_ray.stages.windows import timed_conversions
    df = pd.DataFrame({
        "user_id": [f"u{u}" for u, _, _ in rows],
        "ts": pd.to_datetime([t for _, t, _ in rows], unit="s"),
        "event_type": ["purchase" if p else "view" for _, _, p in rows]})
    out = timed_conversions(rd.from_pandas(df), n_parts=3).to_pandas()
    if len(out) == 0:
        assert not any(p for _, _, p in rows)   # nobody purchased
        return
    out = out.set_index("user_id")
    win = 3600
    for u in sorted({f"u{x}" for x, _, _ in rows}):
        purchases = [t for uu, t, p in rows if f"u{uu}" == u and p]
        views = [t for uu, t, p in rows if f"u{uu}" == u and not p]
        if not purchases:
            assert u not in out.index
            continue
        conv = sum(1 for pt in purchases
                   if any(pt - win <= vt < pt for vt in views))
        assert out.loc[u, "n_then"] == len(purchases)
        assert out.loc[u, "n_converted"] == conv


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2),
                          st.integers(min_value=-500, max_value=500)),
                min_size=1, max_size=40))
def test_max_drawdown_property(rows):
    from deepkg_ray.stages.windows import max_drawdown
    df = pd.DataFrame({
        "user_id": [f"u{u}" for u, _ in rows],
        "event_id": np.arange(len(rows), dtype=np.int64),
        "ts": pd.to_datetime(np.arange(len(rows)), unit="s"),
        "value": [v / 10.0 for _, v in rows]})
    out = (max_drawdown(rd.from_pandas(df), n_parts=3).to_pandas()
           .set_index("user_id"))
    for u in sorted({f"u{x}" for x, _ in rows}):
        vals = [v / 10.0 for uu, v in rows if f"u{uu}" == u]
        run = peak = 0.0
        dd = 0.0
        run = 0.0
        peak = -1e18
        for v in vals:
            run += v
            peak = max(peak, run)
            dd = max(dd, peak - run)
        assert abs(out.loc[u, "max_drawdown"] - dd) < 1e-6
