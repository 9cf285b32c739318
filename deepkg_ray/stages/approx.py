"""Approximate / resampling aggregates: count-min sketch + Poisson bootstrap.

Extends the mergeable-sketch family of stages/sketches.py (HLL, Bloom —
the reference has no sketches, SURVEY.md §2.5) with two more staples of
web-scale data pipelines:

* **Count-min sketch** (Cormode & Muthukrishnan 2005): a d×w grid of
  counters, each item counted at position ``hash_j(item) % w`` in every
  row j; the point estimate ``min_j cell[j][h_j(x)]`` never underestimates
  the true count.  Per-batch grids are integer-summed (the sketch is
  linear), so the merge is a bounded d·w-cell tree fold — never a
  full-vocabulary shuffle.  Hashing is the repo's md5 parity convention
  (sketches._hash64 ≡ DuckDB ``md5_number_lower``) over ``"j:token"``, so
  the ENTIRE sketch state and every estimate are value-reproducible in the
  SQL oracle.

* **Poisson bootstrap** (the only bootstrap that works on data too large
  to index: each replicate re-weights every row i.i.d. Poisson(1) instead
  of drawing n indices with replacement, so one streaming pass computes
  all B replicates — the classic "bag of little bootstraps"-era trick for
  map-reduce resampling).  Replicate weights are deterministic: one md5
  row hash, mixed per replicate with an (a·h + c_b) mod 2^64 affine step
  (the same HUGEINT-splittable family the MinHash oracle already
  replicates in SQL), then inverse-CDF'd through integer cutoffs shared
  verbatim between engine and oracle — every replicate sum is exact in
  both.

Engine-only additions (no reference analog); scale notes inline.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from deepkg_ray.stages.sketches import _hash64

# ----------------------------------------------------------------- CMS ------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_grid(tokens: list[str], counts: np.ndarray,
              depth: int, width: int) -> np.ndarray:
    """d×w int64 grid for a token-count vector (md5 of ``"j:token"``)."""
    grid = np.zeros((depth, width), dtype=np.int64)
    for j in range(depth):
        cols = (_hash64([f"{j}:{t}" for t in tokens])
                % np.uint64(width)).astype(np.int64)
        np.add.at(grid[j], cols, counts)
    return grid


def _batch_token_counts(b: pa.Table, text_col: str):
    """Whitespace token counts of a batch (the heavy_hitter_tokens
    convention: lower().strip(), split on \\s+, empty docs skipped)."""
    import re
    ws = re.compile(r"\s+")
    toks: dict[str, int] = {}
    for t in b[text_col].to_pylist():
        t = t.lower().strip()
        if not t:
            continue
        for w in ws.split(t):
            toks[w] = toks.get(w, 0) + 1
    return toks


def cms_state(ds, text_col: str = "text",
              depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
    """Merged count-min sketch over whitespace tokens, as its nonzero-cell
    table (row_j, col, cnt) — the value-hash-checkable artifact (like
    sketches.hll_registers).  One streaming pass; the shuffle moves only
    ≤ depth·width cell rows per block."""
    from deepkg_ray.stages.treeagg import merge_partials

    def sketch(b: pa.Table) -> pa.Table:
        toks = _batch_token_counts(b, text_col)
        if not toks:
            return pa.table({"row_j": pa.array([], pa.int64()),
                             "col": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        grid = _cms_grid(list(toks.keys()),
                         np.fromiter(toks.values(), dtype=np.int64,
                                     count=len(toks)),
                         depth, width)
        j_idx, c_idx = np.nonzero(grid)
        return pa.table({"row_j": pa.array(j_idx.astype(np.int64)),
                         "col": pa.array(c_idx.astype(np.int64)),
                         "cnt": pa.array(grid[j_idx, c_idx])})

    part = (ds.select_columns([text_col])
            .map_batches(sketch, batch_format="pyarrow"))
    return merge_partials(part, ["row_j", "col"], {"cnt": "sum"})


def cms_estimates(ds, text_col: str = "text", k: int = 20,
                  depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
    """CMS point estimates vs exact truth for the exact top-k tokens:
    (token, n_true, n_est), n_est = min_j cell[j][h_j(token)] ≥ n_true.

    The candidate set comes from the certified exact heavy-hitter pass, so
    the comparison is honest (no estimate-picks-its-own-winners bias); the
    sketch state is dictionary-sized (d·w cells) and collected driver-side
    for the k lookups."""
    from deepkg_ray.stages.sketches import heavy_hitter_tokens
    from deepkg_ray.util import rows_all

    state = pd.DataFrame(rows_all(cms_state(ds, text_col, depth, width)))
    grid = np.zeros((depth, width), dtype=np.int64)
    grid[state["row_j"].to_numpy(), state["col"].to_numpy()] = \
        state["cnt"].to_numpy()
    top = pd.DataFrame(rows_all(heavy_hitter_tokens(ds, text_col, k=k)))
    ests = []
    for tok in top["token"]:
        cells = [grid[j, int(_hash64([f"{j}:{tok}"])[0]
                             % np.uint64(width))] for j in range(depth)]
        ests.append(int(min(cells)))
    return pd.DataFrame({"token": top["token"],
                         "n_true": top["n"].astype("int64"),
                         "n_est": np.asarray(ests, dtype=np.int64)})


# --------------------------------------------------- Poisson bootstrap ------

# Affine per-replicate mixers (splitmix64's odd constants): replicate b's
# weight-uniform is (MIX_A·h + b·MIX_C + MIX_D) mod 2^64 of the row hash h.
MIX_A = 0x9E3779B97F4A7C15
MIX_C = 0xBF58476D1CE4E5B9
MIX_D = 0x94D049BB133111EB


def _poisson1_cutoffs(kmax: int = 10) -> list[int]:
    """u64 cutoffs c_k = floor(P(Poisson(1) ≤ k) · 2^64), k = 0..kmax-1.
    A uniform u gets weight w = #{k : u ≥ c_k} (so w ≤ kmax; the ≥ kmax
    tail carries probability ~1.1e-8 and is folded into w = kmax).
    Shared verbatim with the SQL oracle — parity is by construction, not
    by float luck."""
    cdf, term = 0.0, math.exp(-1.0)
    out = []
    for k in range(kmax):
        cdf += term
        out.append(min(int(cdf * 2.0 ** 64), 2 ** 64 - 1))
        term /= (k + 1)
    return out


POISSON1_CUTOFFS = _poisson1_cutoffs()


def _replicate_addends(n_boot: int) -> np.ndarray:
    """(b·MIX_C + MIX_D) mod 2^64 for b = 0..B-1."""
    b = np.arange(n_boot, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return b * np.uint64(MIX_C) + np.uint64(MIX_D)


def poisson_bootstrap_means(ds, id_col: str, value_col: str,
                            n_boot: int = 100):
    """All B bootstrap replicates of mean(value) in ONE streaming pass:
    per batch, every row gets B deterministic Poisson(1) weights (row
    md5 → B affine mixes → integer inverse-CDF) and contributes
    w·micros(value) to each replicate's (n_eff, sum_micros) partial;
    the B-row partials fold through the merge tree.  Returns B rows
    (b, n_eff, sum_micros, mean_value).

    Scale: no shuffle of data rows at all — the only exchange is B
    partial rows per block.  This is exactly how you bootstrap 100 TB."""
    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.treeagg import merge_partials

    addends = _replicate_addends(n_boot)
    cutoffs = np.asarray(POISSON1_CUTOFFS, dtype=np.uint64)

    def partial(b: pa.Table) -> pa.Table:
        ids = [str(v) for v in b[id_col].to_pylist()]
        vals = np.asarray(b[value_col].to_numpy(zero_copy_only=False),
                          dtype=np.float64)
        micros = np.floor(vals * 1e6 + 0.5).astype(np.int64)
        h = _hash64(ids)
        with np.errstate(over="ignore"):
            hb = (h * np.uint64(MIX_A))[:, None] + addends[None, :]
        w = np.searchsorted(cutoffs, hb.ravel(), side="right") \
            .reshape(hb.shape).astype(np.int64)          # rows × B
        return pa.table({
            "b": pa.array(np.arange(n_boot, dtype=np.int64)),
            "n_eff": pa.array(w.sum(axis=0)),
            "sum_micros": pa.array((w * micros[:, None]).sum(axis=0))})

    merged = merge_partials(
        ds.select_columns([id_col, value_col])
          .map_batches(partial, batch_format="pyarrow"),
        ["b"], {"n_eff": "sum", "sum_micros": "sum"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("b").reset_index(drop=True)
        df["mean_value"] = [
            round6(s / 1e6 / n) if n else 0.0
            for s, n in zip(df["sum_micros"], df["n_eff"])]
        return df[["b", "n_eff", "sum_micros", "mean_value"]]

    return merged.map_batches(finish, batch_format="pandas", batch_size=None)


def poisson_bootstrap_ci(ds, id_col: str, value_col: str,
                         n_boot: int = 100, alpha: float = 0.05):
    """Percentile-bootstrap CI for mean(value): one row
    (n_boot, lo_rank, hi_rank, ci_lo, ci_hi) from the exact order
    statistics of the B replicate means (lo = ⌊α/2·B⌋+1-th smallest,
    hi = (B−⌊α/2·B⌋)-th).  B is bounded, so the finisher is driver-safe."""
    from deepkg_ray.util import rows_all
    means = pd.DataFrame(
        rows_all(poisson_bootstrap_means(ds, id_col, value_col, n_boot)))
    mv = np.sort(means["mean_value"].to_numpy())
    k = int(alpha / 2 * n_boot)
    return pd.DataFrame({
        "n_boot": pd.array([n_boot], dtype="int64"),
        "lo_rank": pd.array([k + 1], dtype="int64"),
        "hi_rank": pd.array([n_boot - k], dtype="int64"),
        "ci_lo": [float(mv[k])],
        "ci_hi": [float(mv[n_boot - k - 1])],
    })


def poisson_bootstrap_diff_ci(ds, id_col: str, value_col: str,
                              group_col: str, group_value,
                              n_boot: int = 100, alpha: float = 0.05):
    """Two-sample Poisson bootstrap: percentile CI for
    mean(value | group==group_value) − mean(value | otherwise), all B
    replicates in the same single streaming pass as
    poisson_bootstrap_means (each row carries its group flag; every
    replicate accumulates (n, sum) for both arms).  The difference CI is
    the experimentation primitive the single-arm CI builds toward.
    Returns one row (n_boot, lo_rank, hi_rank, ci_lo, ci_hi)."""
    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.treeagg import merge_partials
    from deepkg_ray.util import rows_all

    addends = _replicate_addends(n_boot)
    cutoffs = np.asarray(POISSON1_CUTOFFS, dtype=np.uint64)

    def partial(b: pa.Table) -> pa.Table:
        ids = [str(v) for v in b[id_col].to_pylist()]
        vals = np.asarray(b[value_col].to_numpy(zero_copy_only=False),
                          dtype=np.float64)
        micros = np.floor(vals * 1e6 + 0.5).astype(np.int64)
        ga = np.asarray([1 if v == group_value else 0
                         for v in b[group_col].to_pylist()], np.int64)
        h = _hash64(ids)
        with np.errstate(over="ignore"):
            hb = (h * np.uint64(MIX_A))[:, None] + addends[None, :]
        w = np.searchsorted(cutoffs, hb.ravel(), side="right") \
            .reshape(hb.shape).astype(np.int64)          # rows × B
        wa = w * ga[:, None]
        wb = w * (1 - ga)[:, None]
        return pa.table({
            "b": pa.array(np.arange(n_boot, dtype=np.int64)),
            "na": pa.array(wa.sum(axis=0)),
            "sa": pa.array((wa * micros[:, None]).sum(axis=0)),
            "nb": pa.array(wb.sum(axis=0)),
            "sb": pa.array((wb * micros[:, None]).sum(axis=0))})

    merged = pd.DataFrame(rows_all(merge_partials(
        ds.select_columns([id_col, value_col, group_col])
          .map_batches(partial, batch_format="pyarrow"),
        ["b"], {"na": "sum", "sa": "sum", "nb": "sum", "sb": "sum"})))
    diffs = np.sort(np.asarray([
        round6(s_a / 1e6 / n_a - s_b / 1e6 / n_b)
        for n_a, s_a, n_b, s_b in zip(merged["na"], merged["sa"],
                                      merged["nb"], merged["sb"])]))
    k = int(alpha / 2 * n_boot)
    return pd.DataFrame({
        "n_boot": pd.array([n_boot], dtype="int64"),
        "lo_rank": pd.array([k + 1], dtype="int64"),
        "hi_rank": pd.array([n_boot - k], dtype="int64"),
        "ci_lo": [float(diffs[k])],
        "ci_hi": [float(diffs[n_boot - k - 1])],
    })
