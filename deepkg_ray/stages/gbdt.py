"""Gradient-boosted stumps (binary logistic loss) — a dependency-free
classifier for the phrase-quality slot.

The reference scores phrase candidates with a trained GBDT over statistical
features (AutoPhraseX-main/autophrasex/autophrase.py:53-56,118-130:
features → classifier → quality score → ranked phrases); sklearn is not in
this container, so this is Friedman's gradient boosting (public algorithm)
specialized to depth-1 trees:

    F_0 = log(p̄ / (1 − p̄))
    per round m: r_i = y_i − σ(F(x_i))          (negative gradient)
                 stump = argmax split gain over all (feature, threshold)
                 leaf value = Σr / Σ σ(1−σ)      (one Newton step)
                 F += lr · stump(x)

Deterministic (no randomness; ties break toward the lowest feature index
then lowest threshold), fully vectorized per feature via prefix sums.
Intended for the DRIVER-SIDE candidate table (thousands of rows), the same
plan position as the reference's pooled classifier step.
"""

from __future__ import annotations

import numpy as np


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30, 30)))


class GradientBoostedStumps:
    def __init__(self, n_rounds: int = 50, learning_rate: float = 0.2,
                 min_leaf: int = 2):
        self.n_rounds = n_rounds
        self.lr = learning_rate
        self.min_leaf = min_leaf
        self.stumps: list[tuple[int, float, float, float]] = []
        self.f0 = 0.0

    def _fit_stump(self, X: np.ndarray, r: np.ndarray, h: np.ndarray):
        """Best (feature, threshold, left_value, right_value) by squared-
        error gain on the residuals; leaf values are Newton steps Σr/Σh."""
        n, d = X.shape
        best = None
        best_gain = -np.inf
        for j in range(d):
            order = np.argsort(X[:, j], kind="stable")
            xs = X[order, j]
            rs = np.cumsum(r[order])
            hs = np.cumsum(h[order])
            # candidate splits between distinct consecutive values
            cut = np.nonzero(xs[1:] != xs[:-1])[0]     # split after index i
            cut = cut[(cut + 1 >= self.min_leaf) & (n - cut - 1 >= self.min_leaf)]
            if len(cut) == 0:
                continue
            rl, hl = rs[cut], hs[cut]
            rr, hr = rs[-1] - rl, hs[-1] - hl
            gain = rl ** 2 / np.maximum(hl, 1e-12) + rr ** 2 / np.maximum(hr, 1e-12)
            k = int(np.argmax(gain))
            if gain[k] > best_gain + 1e-12:
                best_gain = float(gain[k])
                thr = 0.5 * (xs[cut[k]] + xs[cut[k] + 1])
                lv = float(rl[k] / max(hl[k], 1e-12))
                rv = float(rr[k] / max(hr[k], 1e-12))
                best = (j, float(thr), lv, rv)
        return best

    def fit(self, X, y) -> "GradientBoostedStumps":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        p = float(np.clip(y.mean(), 1e-6, 1 - 1e-6))
        self.f0 = float(np.log(p / (1 - p)))
        F = np.full(len(y), self.f0)
        self.stumps = []
        for _ in range(self.n_rounds):
            prob = _sigmoid(F)
            r = y - prob
            h = np.maximum(prob * (1 - prob), 1e-12)
            stump = self._fit_stump(X, r, h)
            if stump is None:
                break
            j, thr, lv, rv = stump
            F = F + self.lr * np.where(X[:, j] <= thr, lv, rv)
            self.stumps.append(stump)
        return self

    def decision_function(self, X) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        F = np.full(len(X), self.f0)
        for j, thr, lv, rv in self.stumps:
            F = F + self.lr * np.where(X[:, j] <= thr, lv, rv)
        return F

    def predict_proba(self, X) -> np.ndarray:
        return _sigmoid(self.decision_function(X))
