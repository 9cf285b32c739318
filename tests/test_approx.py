"""Count-min sketch + Poisson bootstrap (stages/approx.py)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _toy_docs(n_docs: int = 300, seed: int = 9):
    rng = np.random.default_rng(seed)
    vocab = [f"tok{i:03d}" for i in range(150)]
    probs = np.array([1.0 / (i + 1) for i in range(150)])
    probs /= probs.sum()
    texts = [" ".join(rng.choice(vocab, size=25, p=probs))
             for _ in range(n_docs)]
    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64), "text": texts})), texts


def test_cms_state_invariants():
    from deepkg_ray.stages.approx import CMS_DEPTH, CMS_WIDTH, cms_state
    from deepkg_ray.util import rows_all
    ds, texts = _toy_docs()
    state = pd.DataFrame(rows_all(cms_state(ds)))
    total = sum(len(t.split()) for t in texts)
    # the sketch is linear: every row of the grid holds the full mass
    per_row = state.groupby("row_j")["cnt"].sum()
    assert list(per_row.index) == list(range(CMS_DEPTH))
    assert (per_row == total).all()
    assert (state["col"] >= 0).all() and (state["col"] < CMS_WIDTH).all()
    assert (state["cnt"] > 0).all()


def test_cms_estimates_never_underestimate():
    from deepkg_ray.stages.approx import cms_estimates
    ds, texts = _toy_docs()
    est = cms_estimates(ds, k=15)
    from collections import Counter
    truth = Counter(w for t in texts for w in t.split())
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert list(zip(est["token"], est["n_true"])) == want
    # CMS one-sided error guarantee
    assert (est["n_est"] >= est["n_true"]).all()
    # 150 tokens into 4×1024 cells: top-15 estimates should be exact here
    assert (est["n_est"] == est["n_true"]).mean() >= 0.9


def test_poisson_cutoffs_match_distribution():
    from deepkg_ray.stages.approx import POISSON1_CUTOFFS
    c = np.asarray(POISSON1_CUTOFFS, dtype=float) / 2.0 ** 64
    # cutoffs are the Poisson(1) CDF at k = 0.. — increasing, → 1
    assert (np.diff(c) > 0).all() and c[-1] > 1 - 1e-6
    assert abs(c[0] - math.exp(-1)) < 1e-12


def test_poisson_bootstrap_means_and_ci():
    from deepkg_ray.stages.approx import (poisson_bootstrap_ci,
                                          poisson_bootstrap_means)
    from deepkg_ray.util import rows_all
    rng = np.random.default_rng(3)
    n = 4000
    vals = rng.normal(50.0, 8.0, size=n).round(2)
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "v": vals})
    ds = rd.from_pandas(df)
    means = pd.DataFrame(rows_all(poisson_bootstrap_means(ds, "id", "v",
                                                          n_boot=64)))
    assert len(means) == 64 and list(means["b"]) == list(range(64))
    # replicate sizes concentrate at n (Poisson(1) per row, sd = sqrt(n))
    assert (np.abs(means["n_eff"] - n) < 6 * math.sqrt(n)).all()
    # replicate means scatter around the true mean with sd ~ s/sqrt(n)
    true_mean = vals.mean()
    se = vals.std() / math.sqrt(n)
    assert abs(means["mean_value"].mean() - true_mean) < 4 * se
    assert 0.4 * se < means["mean_value"].std() < 2.5 * se
    # determinism: a second run is identical
    again = pd.DataFrame(rows_all(poisson_bootstrap_means(ds, "id", "v",
                                                          n_boot=64)))
    pd.testing.assert_frame_equal(means, again)
    ci = poisson_bootstrap_ci(ds, "id", "v", n_boot=64)
    assert ci.loc[0, "ci_lo"] < true_mean < ci.loc[0, "ci_hi"]
    assert ci.loc[0, "lo_rank"] == 2 and ci.loc[0, "hi_rank"] == 63


def test_poisson_weights_follow_poisson1():
    """The deterministic weight of each (row, replicate) cell follows
    Poisson(1) across rows: check the w=0 and w=1 frequencies."""
    from deepkg_ray.stages.approx import (MIX_A, POISSON1_CUTOFFS,
                                          _replicate_addends)
    from deepkg_ray.stages.sketches import _hash64
    h = _hash64([str(i) for i in range(20000)])
    with np.errstate(over="ignore"):
        hb = h * np.uint64(MIX_A) + _replicate_addends(1)[0]
    w = np.searchsorted(np.asarray(POISSON1_CUTOFFS, dtype=np.uint64),
                        hb, side="right")
    p0 = (w == 0).mean()
    p1 = (w == 1).mean()
    assert abs(p0 - math.exp(-1)) < 0.02
    assert abs(p1 - math.exp(-1)) < 0.02
    assert w.max() <= len(POISSON1_CUTOFFS)


def test_truncation_recall_properties():
    """Full-dim truncation must give recall 1; overlap counts match a
    numpy brute-force recomputation."""
    from deepkg_ray.functions.numeric import micros_matrix, round6
    from deepkg_ray.stages.similarity import truncation_recall
    rng = np.random.default_rng(13)
    n, d, k = 200, 16, 5
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(vecs)})
    ds = rd.from_pandas(df)
    q, qids = vecs[:4], [0, 1, 2, 3]
    got = truncation_recall(ds, q, qids, k=k, dims=(4, d))
    got = got.set_index("trunc_dim")
    assert got.loc[d, "recall"] == 1.0 and got.loc[d, "n_common"] == k * 4

    def topk_set(t):
        vm = micros_matrix(vecs[:, :t]).astype(np.float64)
        qm = micros_matrix(q[:, :t]).astype(np.float64)
        sims = qm @ vm.T / np.maximum(
            np.linalg.norm(qm, axis=1)[:, None]
            * np.linalg.norm(vm, axis=1)[None, :], 1.0)
        out = set()
        for qi, row in zip(qids, np.vectorize(round6)(sims)):
            order = sorted(range(n), key=lambda i: (-row[i], i))[:k]
            out.update((qi, i) for i in order)
        return out

    want = len(topk_set(4) & topk_set(d))
    assert got.loc[4, "n_common"] == want
    assert got.loc[4, "recall"] == round6(want / (k * 4))
