"""Distributed linear quality classifier: hard-sigmoid logistic
regression trained by full-batch gradient descent over Ray Data, with an
INTEGER-EXACT training loop (no floating point anywhere in the iterate),
distilling doc_stats' rule-based quality score into a learned linear
filter.

The LLM-pipeline role: fasttext-style linear quality classifiers are the
standard corpus-filtering model (GPT-3's LR quality filter, CCNet,
RedPajama); the reference trains its own model stages the same
shape — iterate over the full corpus, aggregate a gradient, update a
small parameter vector (GBDT phrase classifier
AutoPhrase/train_model.py-analog in stages/gbdt.py; seq2seq trainer in
stages/seq2seq.py).  This module adds the linear member of that family
with a DuckDB-checkable training trajectory.

Exactness design (the reason it can be oracle-⊕): the logistic σ is
replaced by the hard sigmoid  σ(z) = clamp(z/4 + 1/2, 0, 1)  and every
quantity lives in int64 micros:

    x        per-doc feature vector, micros      (bias = 1e6)
    z        Σ_j w_j·x_j                         (1e12-scaled int64)
    sig      clamp(tdiv(z, 4e6) + 5e5, 0, 1e6)   (micros)
    g_j      Σ_docs tdiv((sig − y·1e6)·x_j, 1e6) (micros, int64)
    w_j     −= tdiv(eta_num·g_j, n)              (micros)

tdiv is TRUNCATING division (DuckDB's BIGINT `//` semantics, which
truncates toward zero — Python's `//` floors, so the engine uses an
explicit sign-aware helper).  With no transcendental calls there is no
libm-vs-DuckDB ulp risk at all; engine and the unrolled-CTE SQL oracle
agree bit for bit on every iterate.

Scale shape: features are extracted once (one map_batches pass over the
corpus, doc-shaped output, materialized); each of the T iterations is
one combiner map_batches (per-batch int64 gradient partials, 5 cells)
plus one global Sum — the classic Lloyd/kmeans.py pattern, nothing
row-shaped ever reaches the driver.  Overflow bounds (documented
partitioning assumptions): |w| < 2×10⁹ micros keeps z < 2^63 at 5
features; the int64 gradient Sum holds to ~9×10¹² docs.

Features (all integer micros, capped so no single feature dominates):
bias, min(n_chars,2000)/2000, min(n_tokens,400)/400, alpha_ratio,
stop_ratio — the doc_stats_kernel raw counts, so the SQL mirror reuses
doc_stats_oracle's verified base CTE.  Label: doc_stats quality ≥ 0.5
(the distillation target).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum

LR_FEATURES = ("bias", "len_capped", "tokens_capped", "alpha_ratio",
               "stop_ratio")
LR_ETA_NUM = 4
LR_ITERS = 16
_M = 1_000_000


def _tdiv(a: np.ndarray, b) -> np.ndarray:
    """Truncating integer division (DuckDB BIGINT // semantics):
    -7 tdiv 2 = -3.  b > 0."""
    return np.sign(a) * (np.abs(a) // b)


def lr_features(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc integer-micros feature matrix + distillation label.
    Reuses textstats.doc_stats_kernel (the oracle-verified counting
    kernel); emits (doc_id, x0..x4, y) with x_j int64 micros and
    y ∈ {0,1} = [quality ≥ 0.5]."""
    from deepkg_ray.stages.textstats import doc_stats_kernel

    def feats(b: pa.Table) -> pa.Table:
        s = doc_stats_kernel(b, text_col=text_col)
        nc = s["n_chars_calc"].to_numpy(zero_copy_only=False)
        nt = s["n_tokens"].to_numpy(zero_copy_only=False)
        # alpha_ratio/stop_ratio are integer-valued-micros/1e6 doubles;
        # recover the exact micros ints
        a_m = np.floor(np.asarray(s["alpha_ratio"].to_pylist(),
                                  np.float64) * 1e6 + 0.5).astype(np.int64)
        s_m = np.floor(np.asarray(s["stop_ratio"].to_pylist(),
                                  np.float64) * 1e6 + 0.5).astype(np.int64)
        q = np.asarray(s["quality"].to_pylist(), np.float64)
        return pa.table({
            id_col: s[id_col],
            "x0": pa.array(np.full(len(nc), _M, np.int64)),
            "x1": pa.array(np.minimum(nc, 2000).astype(np.int64) * 500),
            "x2": pa.array(np.minimum(nt, 400).astype(np.int64) * 2500),
            "x3": pa.array(a_m),
            "x4": pa.array(s_m),
            "y": pa.array((q >= 0.5).astype(np.int64)),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        feats, batch_format="pyarrow")


def _z_scaled(b: pa.Table, w: list[int]) -> np.ndarray:
    z = np.zeros(b.num_rows, np.int64)
    for j, wj in enumerate(w):
        z += wj * b[f"x{j}"].to_numpy(zero_copy_only=False)
    return z


def lr_train(feats, *, eta_num: int = LR_ETA_NUM,
             n_iters: int = LR_ITERS) -> list[int]:
    """Full-batch hard-sigmoid GD: T rounds of (combiner map_batches →
    5-cell Sum → driver weight update).  ``feats`` should be the
    materialized lr_features output.  Returns the final int-micros
    weight list."""
    n = feats.count()
    w = [0] * len(LR_FEATURES)
    for _ in range(n_iters):
        cur = list(w)

        def partial(b: pa.Table, cur=cur) -> pa.Table:
            z = _z_scaled(b, cur)
            sig = np.clip(_tdiv(z, 4 * _M) + _M // 2, 0, _M)
            resid = sig - b["y"].to_numpy(zero_copy_only=False) * _M
            cols = {}
            for j in range(len(cur)):
                x = b[f"x{j}"].to_numpy(zero_copy_only=False)
                cols[f"g{j}"] = pa.array(
                    [int(_tdiv(resid * x, _M).sum())], pa.int64())
            return pa.table(cols)

        agg = feats.map_batches(partial, batch_format="pyarrow") \
            .aggregate(*[Sum(f"g{j}", alias_name=f"g{j}")
                         for j in range(len(w))])
        for j in range(len(w)):
            g = int(agg[f"g{j}"] or 0)
            q = abs(eta_num * g) // n
            w[j] -= q if g >= 0 else -q
    return w


def lr_weight_table(ds, *, text_col: str = "text",
                    id_col: str = "doc_id", eta_num: int = LR_ETA_NUM,
                    n_iters: int = LR_ITERS):
    """Train and return the weight vector as rows
    (feature, w_micros)."""
    import ray.data as rd
    feats = lr_features(ds, text_col=text_col,
                        id_col=id_col).materialize()
    w = lr_train(feats, eta_num=eta_num, n_iters=n_iters)
    return rd.from_arrow(pa.table({
        "feature": pa.array(list(LR_FEATURES), pa.string()),
        "w_micros": pa.array(w, pa.int64())}))


def lr_scores(ds, *, text_col: str = "text", id_col: str = "doc_id",
              eta_num: int = LR_ETA_NUM, n_iters: int = LR_ITERS):
    """Train, then one stateless scoring pass: per doc
    (doc_id, z_scaled — the exact 1e12-scaled int64 margin, pred =
    [z ≥ 0], label).  The whole chain (feature → 16 training rounds →
    margin) is integer arithmetic, hash-exact vs the unrolled SQL."""
    feats = lr_features(ds, text_col=text_col,
                        id_col=id_col).materialize()
    w = lr_train(feats, eta_num=eta_num, n_iters=n_iters)

    def score(b: pa.Table, w=list(w)) -> pa.Table:
        z = _z_scaled(b, w)
        return pa.table({
            id_col: b[id_col],
            "z_scaled": pa.array(z, pa.int64()),
            "pred": pa.array((z >= 0).astype(np.int64)),
            "label": b["y"],
        })

    return feats.map_batches(score, batch_format="pyarrow")


def lr_holdout(ds, *, text_col: str = "text", id_col: str = "doc_id",
               eta_num: int = LR_ETA_NUM, n_iters: int = LR_ITERS,
               seed: int = 9, train_cut: int = 204):
    """Generalization check for the quality classifier: train ONLY on
    the deterministic md5 80% split (curation.dataset_split_assign's
    convention — first md5 byte of 'seed:id' < 204), then evaluate on
    both splits.  The gap between the two accuracy rows is the
    overfitting measure; the whole chain stays integer-exact so the
    unrolled SQL reproduces the held-out predictions bit for bit.
    Returns rows (split ∈ {train, holdout}, n_docs, n_correct,
    accuracy)."""
    import hashlib

    import pyarrow.compute as pc
    import ray.data as rd
    from deepkg_ray.functions.numeric import round6

    def add_tr(b: pa.Table) -> pa.Table:
        tr = [1 if int(hashlib.md5(f"{seed}:{i}".encode())
                       .hexdigest()[:2], 16) < train_cut else 0
              for i in b[id_col].to_pylist()]
        return b.append_column("tr", pa.array(tr, pa.int64()))

    feats = (lr_features(ds, text_col=text_col, id_col=id_col)
             .map_batches(add_tr, batch_format="pyarrow").materialize())
    train = feats.map_batches(
        lambda b: b.filter(pc.equal(b["tr"], 1)),
        batch_format="pyarrow").materialize()
    w = lr_train(train, eta_num=eta_num, n_iters=n_iters)

    def partial(b: pa.Table, w=list(w)) -> pa.Table:
        z = _z_scaled(b, w)
        pred = (z >= 0).astype(np.int64)
        lab = b["y"].to_numpy(zero_copy_only=False)
        tr = b["tr"].to_numpy(zero_copy_only=False)
        cols = {}
        for tag, m in (("tr", tr == 1), ("ho", tr == 0)):
            cols[f"n_{tag}"] = pa.array([int(m.sum())], pa.int64())
            cols[f"c_{tag}"] = pa.array(
                [int((pred[m] == lab[m]).sum())], pa.int64())
        return pa.table(cols)

    agg = feats.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(c, alias_name=c)
          for c in ("n_tr", "c_tr", "n_ho", "c_ho")])
    rows = []
    for name, nk, ck in (("train", "n_tr", "c_tr"),
                         ("holdout", "n_ho", "c_ho")):
        n, c = int(agg[nk] or 0), int(agg[ck] or 0)
        rows.append((name, n, c,
                     float(round6(np.asarray([c / n]))[0]) if n else 0.0))
    return rd.from_arrow(pa.table({
        "split": pa.array([r[0] for r in rows], pa.string()),
        "n_docs": pa.array([r[1] for r in rows], pa.int64()),
        "n_correct": pa.array([r[2] for r in rows], pa.int64()),
        "accuracy": pa.array([r[3] for r in rows], pa.float64())}))


def lr_accuracy(ds, *, text_col: str = "text", id_col: str = "doc_id",
                eta_num: int = LR_ETA_NUM, n_iters: int = LR_ITERS):
    """One-row training report: (n_docs, n_pos, n_correct,
    train_accuracy) — accuracy from integer counts, one float division
    with round6."""
    import ray.data as rd
    from deepkg_ray.functions.numeric import round6
    sc = lr_scores(ds, text_col=text_col, id_col=id_col,
                   eta_num=eta_num, n_iters=n_iters)

    def partial(b: pa.Table) -> pa.Table:
        pred = b["pred"].to_numpy(zero_copy_only=False)
        lab = b["label"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([b.num_rows], pa.int64()),
            "np_": pa.array([int(lab.sum())], pa.int64()),
            "nc": pa.array([int((pred == lab).sum())], pa.int64())})

    agg = sc.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("np_", alias_name="np_"),
        Sum("nc", alias_name="nc"))
    n, npos, ncorr = int(agg["n"] or 0), int(agg["np_"] or 0), \
        int(agg["nc"] or 0)
    acc = float(round6(np.asarray([ncorr / n]))[0]) if n else 0.0
    return rd.from_arrow(pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "n_pos": pa.array([npos], pa.int64()),
        "n_correct": pa.array([ncorr], pa.int64()),
        "train_accuracy": pa.array([acc], pa.float64())}))
