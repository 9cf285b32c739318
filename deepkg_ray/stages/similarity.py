"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — per batch, a dense numpy matmul of the
batch's vectors against a broadcast query matrix, emitting per-(query, row)
partial top-k that a tiny global top-k reduction finishes.  This is the
distributed analog of the reference's faiss flat/IVF inner-product search
(SimCSE-Chinese-Pytorch/simcse_unsup.py:44-76: normalized vectors, IP =
cosine, top-K with explicit ids).

Scale path: IVF — k-means coarse centroids (trained on a driver-side
sample), each row assigned to its nearest centroid in a vectorized
map_batches; queries probe only the nprobe nearest centroid partitions,
mirroring GpuIndexIVFFlat(nprobe) semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from deepkg_ray.functions.numeric import cosine_micros, micros_matrix, round6


def _as_matrix(col) -> np.ndarray:
    return np.stack(col.to_pandas().to_numpy()) if hasattr(col, "to_pandas") else np.stack(col)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.clip(n, 1e-12, None)


class BruteForceTopK:
    """Actor stage: per batch, cosine of all rows vs the query matrix,
    emit each batch's local top-k rows per query (partial top-k combiner —
    the global reduction then sees ≤ k rows per query per batch)."""

    def __init__(self, queries: np.ndarray, query_ids: list[int], k: int,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self.qm = micros_matrix(queries)
        self.qids = np.asarray(query_ids, dtype=np.int64)
        self.k = k
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=np.int64)
        # micros cosine (numeric.cosine_micros) so the rounded value is
        # bitwise-identical to the DuckDB oracle's SQL_COSINE expression
        sims = cosine_micros(self.qm, micros_matrix(_as_matrix(batch[self.vec_col])))
        k = min(self.k, sims.shape[1])
        q_out, id_out, s_out = [], [], []
        for qi in range(sims.shape[0]):
            # select in the SAME total order the global reduction (and the
            # SQL oracle) uses — (rounded cosine desc, vec_id asc) — so a
            # row dropped here is strictly worse under that order too
            sel = np.lexsort((ids, -sims[qi]))[:k]
            q_out.extend([int(self.qids[qi])] * len(sel))
            id_out.extend(ids[sel].tolist())
            s_out.extend(sims[qi, sel].tolist())
        return pa.table({
            "query_id": pa.array(q_out, pa.int64()),
            "vec_id": pa.array(id_out, pa.int64()),
            "cosine": pa.array(np.asarray(s_out, np.float64), pa.float64()),
        })


def brute_force_topk(ds, queries: np.ndarray, query_ids: list[int], k: int,
                     *, id_col="vec_id", vec_col="embedding", concurrency=None):
    """Dataset of vectors → global top-k rows per query.
    Result: (query_id, vec_id, cosine, rank) with rank 0 = best.
    Tie-break on (−cosine, vec_id) for determinism."""
    from deepkg_ray.util import rows_all, stateful_map
    partial = stateful_map(
        ds.select_columns([id_col, vec_col]), BruteForceTopK,
        {"queries": queries, "query_ids": query_ids,
         "k": k, "id_col": id_col, "vec_col": vec_col},
        concurrency=concurrency, batch_size=None)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True],
                          kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int32)
        return g

    return partial.groupby("query_id").map_groups(finish, batch_format="pandas")


# ------------------------------------------------------------------ IVF ----

def train_centroids(sample: np.ndarray, n_centroids: int, n_iter: int = 10,
                    seed: int = 11, callbacks=None) -> np.ndarray:
    """Plain Lloyd k-means on a (driver-side, sampled) matrix — the analog
    of faiss index.train (simcse_unsup.py:44-53).  Deterministic.
    ``callbacks`` get on_epoch_begin/end with state['centroid_shift'];
    an EarlyStopping(monitor='centroid_shift') ends training once moves
    stall (state/callbacks.py)."""
    from deepkg_ray.state.callbacks import run_epochs
    rng = np.random.default_rng(seed)
    x = _normalize(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)
    c = x[idx].copy()

    def step(epoch, state):
        assign = np.argmax(x @ c.T, axis=1)
        shift = 0.0
        for j in range(len(c)):
            pts = x[assign == j]
            if len(pts):
                v = pts.mean(axis=0)
                v = v / max(np.linalg.norm(v), 1e-12)
                shift = max(shift, float(np.abs(v - c[j]).max()))
                c[j] = v
        state["centroid_shift"] = shift
        state["n_epochs_run"] = epoch + 1

    run_epochs(n_iter, step, callbacks=callbacks)
    return c


class IVFAssign:
    """Vectorized map_batches: add the nearest-centroid partition id."""

    def __init__(self, centroids: np.ndarray, vec_col: str = "embedding"):
        self.c = np.asarray(centroids, dtype=np.float64)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_as_matrix(batch[self.vec_col]).astype(np.float64))
        part = np.argmax(m @ self.c.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_cell", pa.array(part, pa.int32()))


class IVFScanTopK:
    """Fused assign+scan actor: per batch, assign rows to their nearest
    centroid, and for every query scan ONLY the rows whose cell is in the
    query's probe set, emitting the batch-local top-k per query.

    This removes the round-2 scale bound where one IVF cell was one
    ``map_groups`` task (cell ≈ N/n_centroids rows in a single task's
    memory): cells are never physically grouped at all — each batch scans
    its own slice of every cell, and the only shuffle left is the final
    per-query reduction over ≤ k·n_batches candidate rows.  Per-batch
    selection uses the SAME total order as the global finish (cosine desc,
    vec_id asc), so dropping a row locally never changes the global top-k."""

    def __init__(self, queries: np.ndarray, query_ids: list[int], k: int,
                 centroids: np.ndarray, nprobe: int, spill: int = 1,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        c = _normalize(np.asarray(centroids, dtype=np.float64))
        q = _normalize(np.asarray(queries, dtype=np.float64))
        self.c = c
        self.qm = micros_matrix(queries)         # scoring tier (oracle parity)
        self.qids = np.asarray(query_ids, dtype=np.int64)
        self.k = k
        # spill > 1 = multi-assignment: each ROW lives in its `spill`
        # nearest cells (boundary vectors stop falling through probe
        # sets — the recall lever that beats raising nprobe alone at
        # equal scan fraction; measured in tests/test_ann_recall_floor)
        self.spill = max(1, int(spill))
        self.id_col, self.vec_col = id_col, vec_col
        probe = np.argsort(-(q @ c.T), axis=1)[:, :nprobe]   # [n_q, nprobe]
        self.probe_mask = np.zeros((len(q), len(c)), dtype=bool)
        for qi, cells in enumerate(probe):
            self.probe_mask[qi, cells] = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _as_matrix(batch[self.vec_col]).astype(np.float64)
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=np.int64)
        sim_c = _normalize(mat) @ self.c.T
        if self.spill == 1:
            assign = np.argmax(sim_c, axis=1)[:, None]
        else:
            assign = np.argsort(-sim_c, axis=1)[:, :self.spill]
        # scan[qi, row] — row is in ≥1 probed cell of query qi (the any()
        # dedups a row whose multiple assigned cells are all probed)
        scan = self.probe_mask[:, assign].any(axis=2)
        mm = micros_matrix(mat)
        q_out, id_out, s_out = [], [], []
        for qi in range(len(self.qids)):
            rows = np.flatnonzero(scan[qi])
            if not len(rows):
                continue
            sims = cosine_micros(self.qm[qi:qi + 1], mm[rows])[0]
            rids = ids[rows]
            sel = np.lexsort((rids, -sims))[:min(self.k, len(rows))]
            q_out.extend([int(self.qids[qi])] * len(sel))
            id_out.extend(rids[sel].tolist())
            s_out.extend(sims[sel].tolist())
        return pa.table({
            "query_id": pa.array(q_out, pa.int64()),
            "vec_id": pa.array(id_out, pa.int64()),
            "cosine": pa.array(np.asarray(s_out, np.float64), pa.float64()),
        })


def ivf_topk(ds, queries: np.ndarray, query_ids: list[int], k: int, *,
             centroids: np.ndarray, nprobe: int = 4, spill: int = 1,
             id_col="vec_id", vec_col="embedding", concurrency=None,
             batch_size=None):
    """IVF cosine top-k: rows are bucketed by nearest centroid(s); each
    query only scans its `nprobe` nearest cells.  With nprobe = n_centroids
    this is exact and equals brute_force_topk.  ``spill`` > 1 assigns each
    row to its `spill` nearest cells (multi-assignment IVF — the
    boundary-vector recall fix; 64 cells / nprobe 24 / spill 2 measures
    recall@10 ≥ 0.92 on the synth embeddings at ~0.6 scan fraction, vs
    0.71-0.78 for the old 8/4 single-assign default).  Cell size never
    bounds a task: the scan is a per-batch partial top-k (IVFScanTopK), so
    a cell spread over many batches is scanned by many tasks."""
    from deepkg_ray.util import stateful_map
    partial = stateful_map(
        ds.select_columns([id_col, vec_col]), IVFScanTopK,
        {"queries": queries, "query_ids": query_ids, "k": k,
         "centroids": centroids, "nprobe": nprobe, "spill": spill,
         "id_col": id_col, "vec_col": vec_col},
        concurrency=concurrency, batch_size=batch_size)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True],
                          kind="stable").head(k).reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int32)
        return g

    return partial.groupby("query_id").map_groups(finish, batch_format="pandas")


def embedding_gram(ds, emb_col: str = "embedding", dim: int | None = None):
    """Uncentered second-moment (Gram) matrix of the embedding column —
    the one-pass distributed reduction behind PCA / covariance / whitening:
    each batch contributes a d×d outer-product partial, the tree merge sums
    d(d+1)/2 int64 cells, and NOTHING row-shaped ever shuffles.

    Exactness: each per-row product (float32→float64 cast, double multiply)
    is rounded to int64 micros BEFORE the sum — the numeric.round6
    convention lifted to a matrix reduction, so the DuckDB oracle's integer
    SUM over the identical expression grid hash-matches.

    Output rows (i ≤ j, 1-based to match SQL list indexing):
    (i, j, n, sxy_micros, sxy)."""
    import pandas as pd

    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pd.DataFrame:
        mat = _as_matrix(b[emb_col]).astype(np.float64)
        d = mat.shape[1] if dim is None else dim
        m = np.floor(mat[:, :, None] * mat[:, None, :] * 1e6 + 0.5) \
            .astype(np.int64).sum(axis=0)
        iu, ju = np.triu_indices(d)
        return pd.DataFrame({
            "i": (iu + 1).astype(np.int64), "j": (ju + 1).astype(np.int64),
            "n": np.full(len(iu), len(mat), dtype=np.int64),
            "sxy_micros": m[iu, ju],
        })

    merged = merge_partials(
        ds.select_columns([emb_col]).map_batches(
            partial, batch_format="pyarrow", batch_size=1024),
        ["i", "j"], {"n": "sum", "sxy_micros": "sum"}, fanout=1)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["sxy"] = df["sxy_micros"] / 1e6
        return df
    return merged.map_batches(finish, batch_format="pandas")


def pca_power_projection(ds, emb_col: str = "embedding",
                         id_col: str = "vec_id", n_iters: int = 6):
    """Distributed PCA, top component: power iteration on the Gram matrix
    (one distributed pass — ``embedding_gram``'s d(d+1)/2 int64-micros
    cells), then one map_batches projection of every row onto the dominant
    direction.  The d×d iteration itself is driver-side (d² scalars, never
    data-sized); the data-sized work is two streaming passes.

    Determinism/oracle-exactness: iterations renormalize by max|w| (an
    order-independent reduction) instead of the L2 norm (whose float sum
    is order-dependent), and every intermediate stays an exactly-
    representable integer in double — Gn ∈ [-1e6, 1e6], v ∈ [-1e6, 1e6],
    so each matvec term ≤ 1e12 and each matvec sum ≤ d·1e12 < 2^53 is
    EXACT in any summation order; the only roundings are correctly-rounded
    double divisions mirrored op-for-op by the unrolled-CTE SQL oracle
    (oracle.embedding_pca_oracle).  Fixed all-ones init pins the sign.

    Returns (vec_id, pc1) with pc1 = round6(Σ_j micros(e_j)·v_j / 1e12
    · 1e6) — i.e. the projection in the same round6 float convention."""
    import pyarrow as pa

    gram = embedding_gram(ds, emb_col)
    from deepkg_ray.util import rows_all
    cells = rows_all(gram.select_columns(["i", "j", "sxy_micros"]))
    if not cells:
        # empty input → empty projection (matching the empty-graph guards
        # in pagerank_scaled / hits_scaled) instead of a max() ValueError
        import ray.data as rd
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "pc1": pa.array([], pa.float64())}))
    d = max(int(c["j"]) for c in cells)
    g = np.zeros((d, d), np.float64)
    for c in cells:
        i, j = int(c["i"]) - 1, int(c["j"]) - 1
        g[i, j] = g[j, i] = float(c["sxy_micros"])
    gmax = np.abs(g).max()
    if gmax == 0.0:
        v = np.zeros(d, np.float64)
    else:
        gn = np.floor(g / gmax * 1e6 + 0.5)           # |gn| ≤ 1e6, exact ints
        v = np.full(d, 1e6, np.float64)
        for _ in range(n_iters):
            w = gn @ v                                 # exact integer matvec
            m = np.abs(w).max()
            if m == 0.0:
                break
            v = np.floor(w / m * 1e6 + 0.5)

    def project(b: pa.Table) -> pa.Table:
        mat = _as_matrix(b[emb_col]).astype(np.float64)
        em = np.floor(mat * 1e6 + 0.5)                 # micros, exact ints
        dot = em @ v                                   # ≤ d·1e12, exact
        pc1 = np.floor(dot / 1e6 + 0.5) / 1e6
        return pa.table({id_col: b[id_col],
                         "pc1": pa.array(pc1, pa.float64())})

    return ds.select_columns([id_col, emb_col]).map_batches(
        project, batch_format="pyarrow")


def embedding_centroids(ds, label_col: str = "label",
                        emb_col: str = "embedding"):
    """Per-label mean embedding (class prototypes — the nearest-centroid /
    prototypical-classification building block, and the per-cluster step
    SemDeDup-style pipelines reuse).  One streaming pass: each batch
    contributes per-label (n, Σ micros(e)) partials — a (labels × d)
    matrix, never rows — merged by a label-bounded tree merge; mean =
    floor(sum/n + 0.5)/1e6 per dimension, evaluated identically in SQL.
    Output exploded for the oracle: (label, i, n, mean_i) with 1-based i."""
    import pandas as pd

    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pd.DataFrame:
        mat = _as_matrix(b[emb_col]).astype(np.float64)
        em = np.floor(mat * 1e6 + 0.5).astype(np.int64)
        d = em.shape[1]
        df = pd.DataFrame({"label": b[label_col].to_pylist()})
        labels, inv = np.unique(df["label"].to_numpy(), return_inverse=True)
        sums = np.zeros((len(labels), d), np.int64)
        np.add.at(sums, inv, em)
        cnt = np.bincount(inv, minlength=len(labels)).astype(np.int64)
        return pd.DataFrame({
            "label": np.repeat(labels, d),
            "i": np.tile(np.arange(1, d + 1, dtype=np.int64), len(labels)),
            "n": np.repeat(cnt, d),
            "s_micros": sums.ravel(),
        })

    merged = merge_partials(
        ds.select_columns([label_col, emb_col]).map_batches(
            partial, batch_format="pyarrow"),
        ["label", "i"], {"n": "sum", "s_micros": "sum"}, fanout=2)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["mean_i"] = np.floor(df["s_micros"].to_numpy(np.float64)
                                / df["n"].to_numpy(np.float64) + 0.5) / 1e6
        return df
    return merged.map_batches(finish, batch_format="pandas")


def embedding_isotropy(ds, emb_col: str = "embedding", dim: int = 64):
    """Embedding-space isotropy estimate: ‖μ‖² / mean ‖v‖² — the
    common-direction (anisotropy) diagnostic for encoder output
    (Ethayarajh 2019's observation that contextual embeddings collapse
    into a narrow cone; a healthy centered space scores near 0, a
    collapsed one near 1).  Degenerates from the same moments the
    dim-stats/Gram family already folds: per-dim micros sums S_j, row
    count n and Σ‖v‖² — so one d+1-row combiner per batch and a
    d-bounded merge tree carry everything; isotropy =
    Σ_j S_j² / (n · Σ‖v‖²) with the numerator in exact Python big-ints
    and ONE double division.  Returns (n, sum_norm2, isotropy)."""
    import pandas as pd

    from deepkg_ray.functions.numeric import micros_matrix
    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pa.Table:
        m = micros_matrix(np.stack(
            [np.asarray(x, np.float64) for x in b[emb_col].to_pylist()]))
        s = m.sum(axis=0).astype(np.int64)
        n2 = int((m * m).sum())
        i = np.arange(0, dim + 1, dtype=np.int64)
        return pa.table({
            "i": pa.array(i),
            "s": pa.array(np.concatenate(([0], s)), pa.int64()),
            "n": pa.array(np.concatenate(
                ([m.shape[0]], np.zeros(dim, np.int64))), pa.int64()),
            "n2": pa.array(np.concatenate(
                ([n2], np.zeros(dim, np.int64))), pa.int64())})

    merged = merge_partials(
        ds.select_columns([emb_col]).map_batches(
            partial, batch_format="pyarrow"),
        ["i"], {"s": "sum", "n": "sum", "n2": "sum"}, mode="tree")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        sc = df[df["i"] == 0]
        n = int(sc["n"].iloc[0])
        den = int(sc["n2"].iloc[0])
        dd = df[df["i"] > 0]
        num = int((dd["s"].astype(object) ** 2).sum())
        iso = float(num) / (float(n) * float(den)) if den else 0.0
        return pd.DataFrame({
            "n": pd.array([n], dtype="int64"),
            "sum_norm2": pd.array([den], dtype="int64"),
            "isotropy": [iso]})

    return merged.map_batches(finish, batch_format="pandas",
                              batch_size=None)


def embedding_norms(ds, emb_col: str = "embedding",
                    label_col: str = "label"):
    """Per-label squared-norm statistics of the embedding column in the
    EXACT integer micros² space (micros_matrix: every element integral in
    double, dot products order-free; functions/numeric.py): per label n,
    Σ‖v‖² and the mean — the embedding-health check (collapsed or
    exploding norms are the first symptom of a broken encoder; cf.
    linking.EncoderStage's unit-norm contract).  One stateless combiner
    pass + a tree merge over the label dictionary.  Returns
    (label, n, sum_norm2, mean_norm2)."""
    import pandas as pd

    from deepkg_ray.functions.numeric import micros_matrix
    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pa.Table:
        m = micros_matrix(np.stack(
            [np.asarray(x, np.float64) for x in b[emb_col].to_pylist()]))
        n2 = (m * m).sum(axis=1).astype(np.int64)
        df = pd.DataFrame({"label": b[label_col].to_pylist(), "n2": n2})
        g = (df.groupby("label", sort=False)
             .agg(n=("n2", "size"), s=("n2", "sum")).reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    merged = merge_partials(
        ds.select_columns([label_col, emb_col])
        .map_batches(partial, batch_format="pyarrow"),
        ["label"], {"n": "sum", "s": "sum"}, mode="tree")

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        s = b["s"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "label": b["label"],
            "n": pa.array(n, pa.int64()),
            "sum_norm2": pa.array(s, pa.int64()),
            "mean_norm2": pa.array(s.astype(np.float64)
                                   / n.astype(np.float64), pa.float64())})
    return merged.map_batches(finish, batch_format="pyarrow")


def embedding_dim_stats(ds, emb_col: str = "embedding", dim: int = 64):
    """Per-dimension moment statistics of the embedding matrix — the
    feature-standardization pre-pass ((x − μ)/σ normalization needs
    exactly these moments; the d²-bounded Gram reduction's 1-D sibling):
    per dim i, n, Σx and Σx² in exact micros / micros² integers, mean and
    std by one fixed double op chain (μ = (Σx/n)/1e6; σ =
    √(n·Σx² − (Σx)²)/n/1e6 — IEEE sqrt is correctly rounded, so both
    sides land on the same double).  Per-batch partials emit d rows each;
    the merge tree moves d-bounded tables only.  The n·Σx² product is
    taken in Python big-ints (SQL mirrors with HUGEINT).
    Returns (i, n, sum_micros, ss, mean, std) with 1-based i."""
    import pandas as pd

    from deepkg_ray.functions.numeric import micros_matrix
    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pa.Table:
        m = micros_matrix(np.stack(
            [np.asarray(x, np.float64) for x in b[emb_col].to_pylist()]))
        return pa.table({
            "i": pa.array(np.arange(1, m.shape[1] + 1, dtype=np.int64)),
            "n": pa.array(np.full(m.shape[1], m.shape[0], np.int64)),
            "sm": pa.array(m.sum(axis=0).astype(np.int64), pa.int64()),
            "ss": pa.array((m * m).sum(axis=0).astype(np.int64),
                           pa.int64())})

    merged = merge_partials(
        ds.select_columns([emb_col]).map_batches(partial,
                                                 batch_format="pyarrow"),
        ["i"], {"n": "sum", "sm": "sum", "ss": "sum"},
        mode="tree").to_pandas()

    n = merged["n"].to_numpy(np.int64)
    sm = merged["sm"].to_numpy(np.int64)
    ss = merged["ss"].to_numpy(np.int64)
    mean = (sm.astype(np.float64) / n.astype(np.float64)) / 1e6
    num = [int(nn) * int(s2) - int(s1) * int(s1)
           for nn, s2, s1 in zip(n, ss, sm)]          # exact big-ints
    std = np.sqrt(np.asarray([float(x) for x in num], np.float64)) \
        / n.astype(np.float64) / 1e6
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "i": pa.array(merged["i"].to_numpy(np.int64), pa.int64()),
        "n": pa.array(n, pa.int64()),
        "sum_micros": pa.array(sm, pa.int64()),
        "ss": pa.array(ss, pa.int64()),
        "mean": pa.array(mean, pa.float64()),
        "std": pa.array(std, pa.float64())}))


def sq8_audit(ds, emb_col: str = "embedding", dim: int = 64):
    """Int8 scalar-quantization (SQ8) audit — the memory-4×-reduction
    codec every large ANN deployment offers (faiss ScalarQuantizer
    QT_8bit semantics: per-dimension min/max affine grid, 256 levels):
    per dim  code = round((x − min)·255/range),
             recon = min + round(code·range/255),
    reported as per-dimension reconstruction SSE/MSE — the
    distortion-vs-PQ comparison point (pq_distortion is the codebook
    sibling).

    Exactness: values are micros ints; both roundings are the integer
    round-half-up identity ((2a+b)//2b), so codes, reconstructions and
    squared errors are exact int64 on both sides — no float in the
    codec.  Plan: one d-bounded min/max aggregate (merge tree), then one
    stateless pass emitting d-bounded SSE partials; nothing row-shaped
    reaches the driver.  Returns (i, n, vmin_micros, vmax_micros, sse,
    mse) with 1-based i and mse = floor(sse/n + 0.5)."""
    import pandas as pd  # noqa: F401
    import ray.data as rd

    from deepkg_ray.functions.numeric import micros_matrix
    from deepkg_ray.stages.treeagg import merge_partials

    def mm_partial(b: pa.Table) -> pa.Table:
        m = micros_matrix(np.stack(
            [np.asarray(x, np.float64) for x in b[emb_col].to_pylist()]))
        return pa.table({
            "i": pa.array(np.arange(1, m.shape[1] + 1, dtype=np.int64)),
            "mn": pa.array(m.min(axis=0).astype(np.int64)),
            "mx": pa.array(m.max(axis=0).astype(np.int64))})

    mm = merge_partials(
        ds.select_columns([emb_col]).map_batches(mm_partial,
                                                 batch_format="pyarrow"),
        ["i"], {"mn": "min", "mx": "max"}, mode="tree").to_pandas() \
        .sort_values("i")
    mn = mm["mn"].to_numpy(np.int64)
    mx = mm["mx"].to_numpy(np.int64)
    rng = mx - mn

    def sse_partial(b: pa.Table, mn=mn, rng=rng) -> pa.Table:
        m = micros_matrix(np.stack(
            [np.asarray(x, np.float64) for x in b[emb_col].to_pylist()]))
        d = (m - mn[None, :]).astype(np.int64)
        safe = np.maximum(rng, 1)[None, :]
        c = np.where(rng[None, :] > 0,
                     (d * 510 + rng[None, :]) // (2 * safe), 0)
        r = np.where(rng[None, :] > 0,
                     (c * rng[None, :] * 2 + 255) // 510, 0)
        err = d - r
        return pa.table({
            "i": pa.array(np.arange(1, m.shape[1] + 1, dtype=np.int64)),
            "n": pa.array(np.full(m.shape[1], m.shape[0], np.int64)),
            "sse": pa.array((err * err).sum(axis=0).astype(np.int64))})

    agg = merge_partials(
        ds.select_columns([emb_col]).map_batches(sse_partial,
                                                 batch_format="pyarrow"),
        ["i"], {"n": "sum", "sse": "sum"}, mode="tree").to_pandas() \
        .sort_values("i")
    n = agg["n"].to_numpy(np.int64)
    sse = agg["sse"].to_numpy(np.int64)
    mse = np.floor(sse.astype(np.float64) / n.astype(np.float64)
                   + 0.5).astype(np.int64)
    return rd.from_arrow(pa.table({
        "i": pa.array(agg["i"].to_numpy(np.int64), pa.int64()),
        "n": pa.array(n, pa.int64()),
        "vmin_micros": pa.array(mn, pa.int64()),
        "vmax_micros": pa.array(mx, pa.int64()),
        "sse": pa.array(sse, pa.int64()),
        "mse": pa.array(mse, pa.int64())}))


def semantic_contamination(ds, queries: np.ndarray, query_ids, tau: float,
                           *, id_col: str = "vec_id",
                           vec_col: str = "embedding"):
    """Train/eval SEMANTIC decontamination scan: every (eval vector, train
    vector) pair with round6 cosine ≥ tau — the embedding analog of the
    n-gram decontaminate op (eval sets are small by nature, so the eval
    matrix broadcasts inside the kernel closure and the train side
    STREAMS; one pass, no shuffle, no top-k bound — contamination wants
    every hit, not the best k).  Returns (query_id, vec_id, cosine).

    Reference analog: the faiss similarity scan of simcse_unsup.py:44-76;
    the thresholded-scan variant is an engine addition (training-data
    decontamination per the round brief)."""
    from deepkg_ray.functions.numeric import cosine_micros, micros_matrix
    qm = micros_matrix(np.asarray(queries))
    qids = np.asarray(query_ids, dtype=np.int64)

    def scan(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        sims = cosine_micros(qm, micros_matrix(_as_matrix(batch[vec_col])))
        qi, vi = np.nonzero(sims >= tau)
        return pa.table({
            "query_id": pa.array(qids[qi], pa.int64()),
            "vec_id": pa.array(ids[vi], pa.int64()),
            "cosine": pa.array(sims[qi, vi].astype(np.float64),
                               pa.float64())})

    return ds.select_columns([id_col, vec_col]).map_batches(
        scan, batch_format="pyarrow")


def hard_negatives(ds, anchors: np.ndarray, anchor_ids, anchor_labels,
                   k: int = 5, *, id_col: str = "vec_id",
                   vec_col: str = "embedding", label_col: str = "label"):
    """Contrastive hard-negative mining: for each anchor vector, the k
    most-cosine-similar corpus vectors whose ``label`` DIFFERS from the
    anchor's — the candidates a contrastive trainer most needs (closest
    wrong-class points; simcse_unsup.py:44-76 builds its training batches
    from exactly this faiss scan, minus the label exclusion).

    Scale shape: the anchor matrix rides the kernel closure (anchors are
    few by nature — a training batch, not a corpus), the corpus STREAMS;
    each batch emits only its local top-k per anchor in the same
    (round6 cosine desc, vec_id asc) total order the global reduction and
    the SQL oracle use, so the global groupby sees ≤ k rows per anchor per
    block.  Returns (anchor_id, vec_id, cosine, rank), rank 0 = hardest."""
    am = micros_matrix(np.asarray(anchors))
    aids = np.asarray(anchor_ids, dtype=np.int64)
    albl = np.asarray(anchor_labels, dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        lbl = np.asarray(batch[label_col].to_pylist(), dtype=np.int64)
        sims = cosine_micros(am, micros_matrix(_as_matrix(batch[vec_col])))
        a_out, id_out, s_out = [], [], []
        for ai in range(sims.shape[0]):
            ok = np.flatnonzero(lbl != albl[ai])
            if not len(ok):
                continue
            sel = ok[np.lexsort((ids[ok], -sims[ai, ok]))[:k]]
            a_out.extend([int(aids[ai])] * len(sel))
            id_out.extend(ids[sel].tolist())
            s_out.extend(sims[ai, sel].tolist())
        return pa.table({
            "anchor_id": pa.array(a_out, pa.int64()),
            "vec_id": pa.array(id_out, pa.int64()),
            "cosine": pa.array(np.asarray(s_out, np.float64), pa.float64()),
        })

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True],
                          kind="stable").head(k).reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int32)
        return g

    return (ds.select_columns([id_col, vec_col, label_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("anchor_id").map_groups(finish, batch_format="pandas"))


def knn_graph(ds, k: int = 5, *, id_col: str = "vec_id",
              vec_col: str = "embedding",
              broadcast_threshold: int = 200_000, concurrency=None):
    """Exact k-nearest-neighbor GRAPH over the embedding column: for every
    vector its top-k round6-cosine neighbors (self excluded), ties → the
    smaller neighbor id — the corpus-wide generalization of
    brute_force_topk where every row is a query (the structure semantic
    dedup / hard-negative mining / diversity sampling consume; the
    reference's faiss index serves exactly this query when SimCSE
    evaluates recall, simcse_unsup.py:44-76).

    Plan: the corpus (ids + micros matrix) broadcasts ONCE via ray.put —
    N×d int64, ≤ broadcast_threshold rows so the object is ~100 MB at
    d=64 — and each streaming batch matmuls against it, emitting its
    rows' FINAL top-k: the broadcast side is the whole corpus, so no
    cross-batch reduction or shuffle exists at all.  Above the threshold
    the exact graph routes to the BLOCKED tier (_knn_graph_blocked): the
    corpus is hash-split into broadcast-sized blocks, the stream scanned
    once per block for per-block top-k candidates, and a per-id merge
    keeps the global top-k — same O(N²) flops an exact answer costs, but
    no single object or task ever exceeds the broadcast bound (the
    round-4 loud-fail past 200k is gone; ann_ivf remains the sub-
    quadratic approximate path).  Tier agreement is pytest-asserted.

    Returns (vec_id, nbr_id, cosine, rank), rank 0 = nearest."""
    import ray

    from deepkg_ray.util import stateful_map

    src = ds.select_columns([id_col, vec_col]).materialize()
    if src.count() > broadcast_threshold:
        return _knn_graph_blocked(src, k, id_col=id_col, vec_col=vec_col,
                                  block_rows=broadcast_threshold,
                                  concurrency=concurrency)
    corpus = src.to_pandas()
    ids_all = corpus[id_col].to_numpy(np.int64)
    order = np.argsort(ids_all, kind="stable")
    ids_all = ids_all[order]
    mm = micros_matrix(np.stack(corpus[vec_col].to_numpy())[order])
    ref = ray.put((ids_all, mm))

    def per_batch(b: pa.Table) -> pa.Table:
        nodes, mat = ray.get(ref)
        ids = np.asarray(b[id_col].to_pylist(), dtype=np.int64)
        sims = cosine_micros(micros_matrix(_as_matrix(b[vec_col])), mat)
        # self-exclusion: cosine ≥ -1 always, so -2 sorts strictly last
        pos = np.searchsorted(nodes, ids)
        sims[np.arange(len(ids)), pos] = -2.0
        kk = min(k, sims.shape[1] - 1)
        src, nbr, cos, rnk = [], [], [], []
        for i in range(len(ids)):
            sel = np.lexsort((nodes, -sims[i]))[:kk]
            src.extend([int(ids[i])] * len(sel))
            nbr.extend(nodes[sel].tolist())
            cos.extend(sims[i, sel].tolist())
            rnk.extend(range(len(sel)))
        return pa.table({
            id_col: pa.array(src, pa.int64()),
            "nbr_id": pa.array(nbr, pa.int64()),
            "cosine": pa.array(np.asarray(cos, np.float64), pa.float64()),
            "rank": pa.array(np.asarray(rnk, np.int32), pa.int32())})

    return src.map_batches(per_batch, batch_format="pyarrow")


def _knn_graph_blocked(src, k: int, *, id_col: str, vec_col: str,
                       block_rows: int, n_parts: int = 64,
                       concurrency=None):
    """Exact kNN above the broadcast bound: the corpus splits into
    ceil(N / block_rows) hash blocks; block b's (ids, micros matrix) is
    collected transiently (driver holds ONE block at a time, each ≤ the
    bound the single-broadcast tier enforces) and ray.put; the stream is
    scanned once per block emitting per-(row, block) top-k candidates
    (self-similarity masked to −2 and filtered); a vec_id-partitioned
    merge keeps the global top-k under the SAME total order
    (cosine desc, nbr_id asc), so the result is row-identical to the
    broadcast tier wherever both apply.  Shuffle payload: N·blocks·k
    candidate rows — never a matrix."""
    import ray

    from deepkg_ray.functions.hashing import mix64

    n = src.count()
    n_blocks = max(1, -(-n // block_rows))

    def in_block(b: pa.Table, blk: int) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (mix64(ids.astype(np.uint64))
                % np.uint64(n_blocks)) == np.uint64(blk)
        return b.filter(pa.array(keep))

    partials = []
    for blk in range(n_blocks):
        part = src.map_batches(
            lambda b, _blk=blk: in_block(b, _blk),
            batch_format="pyarrow").to_pandas()
        nodes = part[id_col].to_numpy(np.int64)
        order = np.argsort(nodes, kind="stable")
        nodes = nodes[order]
        mm = micros_matrix(np.stack(part[vec_col].to_numpy())[order])
        ref = ray.put((nodes, mm))

        def scan(b: pa.Table, _ref=ref) -> pa.Table:
            nodes_b, mat = ray.get(_ref)
            ids = np.asarray(b[id_col].to_pylist(), dtype=np.int64)
            sims = cosine_micros(micros_matrix(_as_matrix(b[vec_col])),
                                 mat)
            pos = np.searchsorted(nodes_b, ids)
            posc = np.clip(pos, 0, max(len(nodes_b) - 1, 0))
            selfrow = np.flatnonzero(nodes_b[posc] == ids)
            sims[selfrow, posc[selfrow]] = -2.0
            kk = min(k, sims.shape[1])
            src_o, nbr_o, cos_o = [], [], []
            for i in range(len(ids)):
                sel = np.lexsort((nodes_b, -sims[i]))[:kk]
                sel = sel[sims[i, sel] > -2.0]
                src_o.extend([int(ids[i])] * len(sel))
                nbr_o.extend(nodes_b[sel].tolist())
                cos_o.extend(sims[i, sel].tolist())
            return pa.table({
                id_col: pa.array(src_o, pa.int64()),
                "nbr_id": pa.array(nbr_o, pa.int64()),
                "cosine": pa.array(np.asarray(cos_o, np.float64),
                                   pa.float64())})

        partials.append(src.map_batches(scan, batch_format="pyarrow"))

    cand = partials[0]
    for p in partials[1:]:
        cand = cand.union(p)

    def add_part(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return b.append_column(
            "part",
            pa.array((mix64(ids) % np.uint64(n_parts)).astype(np.int32)))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "cosine", "nbr_id"],
                          ascending=[True, False, True], kind="stable")
        g = g.groupby(id_col, sort=False).head(k)
        g["rank"] = g.groupby(id_col, sort=False).cumcount() \
            .astype(np.int32)
        return g[[id_col, "nbr_id", "cosine", "rank"]]

    return (cand.map_batches(add_part, batch_format="pyarrow")
            .groupby("part").map_groups(finish, batch_format="pandas"))


def knn_mutuality(ds, k: int = 5, *, id_col: str = "vec_id",
                  vec_col: str = "embedding"):
    """Mutual-neighbor rate of the exact kNN graph, per rank: how often
    a vector's rank-r neighbor lists it back among ITS top-k — the
    hubness/asymmetry diagnostic of the embedding space (low mutuality
    at rank 0 means hub points dominate everyone's lists and
    kNN-based dedup/retrieval will skew).

    Plan: knn_graph's exact broadcast tier builds the edge list (its
    N ≤ 200k bound already makes the edge set driver-sized, so the
    packed reverse-edge membership set rides the same broadcast —
    ids asserted < 2^31, the PACK convention); each batch tests
    nbr→src membership with one np.isin against the sorted key array
    and folds (rank, n, n_mutual) cells.  Returns
    (rank, n, n_mutual, share)."""
    import pandas as pd
    import ray

    from deepkg_ray.stages.treeagg import merge_partials

    edges = knn_graph(ds, k=k, id_col=id_col,
                      vec_col=vec_col).materialize()
    ed = edges.select_columns([id_col, "nbr_id"]).to_pandas()
    s = ed[id_col].to_numpy(np.int64)
    d = ed["nbr_id"].to_numpy(np.int64)
    assert s.max(initial=0) < 2 ** 31 and d.max(initial=0) < 2 ** 31, \
        "knn_mutuality PACK bound: ids must fit 31 bits"
    keys = np.sort(s * (2 ** 31) + d)
    ref = ray.put(keys)

    def cells(b: pa.Table) -> pd.DataFrame:
        kk = ray.get(ref)
        src = b[id_col].to_numpy(zero_copy_only=False)
        nbr = b["nbr_id"].to_numpy(zero_copy_only=False)
        rev = nbr * (2 ** 31) + src
        mut = np.zeros(len(rev), bool)
        idx = np.searchsorted(kk, rev)
        inb = idx < len(kk)
        mut[inb] = kk[idx[inb]] == rev[inb]
        g = (pd.DataFrame({
            "rank": b["rank"].to_numpy(zero_copy_only=False)
                    .astype(np.int64),
            "one": np.ones(len(rev), np.int64),
            "m": mut.astype(np.int64)})
            .groupby("rank", as_index=False).sum())
        return g.rename(columns={"one": "n", "m": "n_mutual"})

    merged = merge_partials(
        edges.map_batches(cells, batch_format="pyarrow"),
        ["rank"], {"n": "sum", "n_mutual": "sum"}, mode="tree")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        m = df["n_mutual"].to_numpy(np.int64)
        share = np.floor(m / n.astype(np.float64) * 1e6 + 0.5) / 1e6
        out = df.assign(share=share).sort_values("rank", kind="stable")
        out["n"] = out["n"].astype("int64")
        out["n_mutual"] = out["n_mutual"].astype("int64")
        return out.reset_index(drop=True)

    return merged.map_batches(finish, batch_format="pandas",
                              batch_size=None)


def centroid_similarity(ds, label_col: str = "label",
                        emb_col: str = "embedding"):
    """Pairwise cosine between per-label centroids — the class-prototype
    confusion structure (which clusters/classes sit close in embedding
    space; the inter-cluster gap SemDeDup-style thresholds consult).

    Built on embedding_centroids' (label, i, n, s_micros) cells: centroid
    components quantize to int64 micros (floor(s/n + 0.5)), so dots and
    norms² are EXACT integer sums (|c|≤1e6 micros, d·1e12 ≪ 2^63) and the
    only float op is the final round6(dot / (√n1·√n2)) — no accumulation
    order dependence on either side.  The pair step runs once over the
    label²·d-bounded merged cells.  Returns (l1, l2, dot_m2, cosine)."""
    import pandas as pd

    cells = embedding_centroids(ds, label_col, emb_col)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        from deepkg_ray.functions.numeric import round6
        cm = np.floor(df["s_micros"].to_numpy(np.float64)
                      / df["n"].to_numpy(np.float64) + 0.5).astype(np.int64)
        labels = np.unique(df["label"].to_numpy())
        d = int(df["i"].max())
        C = np.zeros((len(labels), d), np.int64)
        li = np.searchsorted(labels, df["label"].to_numpy())
        C[li, df["i"].to_numpy(np.int64) - 1] = cm
        G = C @ C.T
        i, j = np.triu_indices(len(labels), k=1)
        dot = G[i, j]
        cos = round6(dot.astype(np.float64)
                     / (np.sqrt(G[i, i].astype(np.float64))
                        * np.sqrt(G[j, j].astype(np.float64))))
        return pd.DataFrame({
            "l1": labels[i].astype(np.int64),
            "l2": labels[j].astype(np.int64),
            "dot_m2": dot,
            "cosine": cos})

    return cells.map_batches(finish, batch_format="pandas",
                             batch_size=None)


def knn_accuracy(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                 label_col: str = "label"):
    """Leave-one-out 1-NN classification accuracy per label: each vector
    is classified by its nearest OTHER vector's label (exact integer
    quadratic distance in micros space, ties → lowest vec_id) — the
    embedding-quality probe (does the space cluster by label?).

    Plan: the reference set broadcasts once via ray.put (this exact tier
    is bounded by worker memory — the scale path routes through the IVF
    index like ann_ivf); the streaming side is one matmul per batch and
    collapses to per-label (n, n_correct) partials.  Returns
    (label, n, n_correct, accuracy)."""
    import ray

    from deepkg_ray.functions.numeric import micros_matrix, round6
    from deepkg_ray.stages.treeagg import merge_partials

    refd = ds.select_columns([id_col, vec_col, label_col]).to_pandas()
    ids = refd[id_col].to_numpy(np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = micros_matrix(np.stack(refd[vec_col].to_numpy())[order])
    labels = refd[label_col].to_numpy()[order].astype(np.int64)
    ref = ray.put((ids, mat, labels))

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        rid, rmat, rlab = ray.get(ref)
        q = micros_matrix(_as_matrix(b[vec_col]))
        qid = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        qlab = b[label_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d2 = ((q * q).sum(1)[:, None] - 2.0 * (q @ rmat.T)
              + (rmat * rmat).sum(1)[None, :])
        self_pos = np.searchsorted(rid, qid)
        is_self = (self_pos < len(rid)) & (rid[np.clip(
            self_pos, 0, len(rid) - 1)] == qid)
        rows = np.flatnonzero(is_self)
        d2[rows, self_pos[rows]] = np.inf
        nn = d2.argmin(1)       # np argmin → FIRST minimum = lowest id
        pred = rlab[nn]
        g = (pd.DataFrame({"label": qlab,
                           "ok": (pred == qlab).astype(np.int64)})
             .groupby("label", as_index=False)
             .agg(n=("ok", "size"), n_correct=("ok", "sum"))
             .astype({"n": "int64", "n_correct": "int64"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    merged = merge_partials(
        ds.select_columns([id_col, vec_col, label_col]).map_batches(
            partial, batch_format="pyarrow"),
        ["label"], {"n": "sum", "n_correct": "sum"})

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = b["n_correct"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return b.append_column("accuracy", pa.array(round6(c / n)))

    return merged.map_batches(finish, batch_format="pyarrow")


def mmr_select(ds, *, query_id: int = 0, k: int = 8, window: int = 50,
               lam_micros: int = 500_000, id_col: str = "vec_id",
               vec_col: str = "embedding"):
    """Maximal Marginal Relevance selection (Carbonell & Goldstein 1998):
    greedily pick ``k`` vectors maximizing
    λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s) — the diversity-aware
    rerank a training-data curator runs after retrieval so the selected
    exemplars aren't k near-duplicates of the top hit.  The reference's
    recall stage stops at plain top-N (BM25_Model.py:38-72); MMR is the
    beyond-reference diversification layer over the embedding column.

    Plan: ONE distributed scan computes integer-micros relevance vs the
    broadcast query vector and keeps each batch's top-``window``
    candidates (same total order as the global cut: rel desc, id asc —
    a locally dropped row is globally dropped); the window (the rerank
    pool, ≤ `window` rows with their vectors) reduces to the driver,
    where the k-step greedy runs over the window×window micros sim
    matrix — the standard rerank-window shape (the pool comes from the
    retrieval stage; it is NOT the corpus).  All scoring is exact int64:
    score = lam_micros·rel_m − (1e6−lam_micros)·maxsim_m, ties → smaller
    vec_id, empty-selection similarity term = 0.  The SQL oracle unrolls
    the same k steps (oracle.mmr_select_oracle).
    Returns (rank, vec_id, rel_m, score) — all integer-exact."""
    import ray.data as rd

    from deepkg_ray.functions.numeric import micros_matrix
    from deepkg_ray.util import rows_all

    src = ds.select_columns([id_col, vec_col])
    qvec = None
    for r in rows_all(src.filter(expr=f"{id_col} == {int(query_id)}")):
        qvec = np.asarray(r[vec_col], np.float64)
    if qvec is None:
        raise ValueError(f"query vec_id {query_id} not found")
    qm = micros_matrix(qvec[None, :])[0]
    qn = np.sqrt((qm * qm).sum())

    def cand(b: pa.Table) -> pa.Table:
        # the query vector is a QUERY, not a candidate — leaving it in
        # the pool degenerates every λ=0.5 score to 0 (its pair sim to
        # any candidate equals that candidate's relevance)
        keep = pa.compute.not_equal(b[id_col], query_id)
        b = b.filter(keep)
        ids = np.asarray(b[id_col].to_pylist(), np.int64)
        mm = micros_matrix(_as_matrix(b[vec_col]))
        dot = mm @ qm
        nn = np.sqrt((mm * mm).sum(axis=1))
        rel = np.floor(dot / np.maximum(nn * qn, 1.0) * 1e6 + 0.5) \
            .astype(np.int64)
        sel = np.lexsort((ids, -rel))[:min(window, len(ids))]
        t = b.take(pa.array(sel, pa.int64()))
        return t.append_column("rel_m", pa.array(rel[sel], pa.int64()))

    pool = (pd.DataFrame(rows_all(src.map_batches(cand,
                                                  batch_format="pyarrow")))
            .sort_values(["rel_m", id_col], ascending=[False, True],
                         kind="stable").head(window)
            .reset_index(drop=True))
    ids = pool[id_col].to_numpy(np.int64)
    rel = pool["rel_m"].to_numpy(np.int64)
    mm = micros_matrix(np.stack(pool[vec_col].to_numpy()))
    dots = mm @ mm.T
    norms = np.sqrt((mm * mm).sum(axis=1))
    sim = np.floor(dots / np.maximum(np.outer(norms, norms), 1.0)
                   * 1e6 + 0.5).astype(np.int64)

    lm = int(lam_micros)
    order = np.argsort(ids, kind="stable")          # vec_id asc tie order
    selected: list[int] = []
    out_rows = []
    for step in range(min(k, len(ids))):
        best_i, best_score = -1, None
        for i in order:
            if i in selected:
                continue
            maxsim = int(sim[i, selected].max()) if selected else 0
            score = lm * int(rel[i]) - (1_000_000 - lm) * maxsim
            if best_score is None or score > best_score:
                best_i, best_score = int(i), score
        selected.append(best_i)
        out_rows.append((step, int(ids[best_i]), int(rel[best_i]),
                         int(best_score)))

    return rd.from_arrow(pa.table({
        "rank": pa.array([r[0] for r in out_rows], pa.int32()),
        "vec_id": pa.array([r[1] for r in out_rows], pa.int64()),
        "rel_m": pa.array([r[2] for r in out_rows], pa.int64()),
        "score": pa.array([r[3] for r in out_rows], pa.int64())}))


def truncation_recall(ds, queries: np.ndarray, query_ids: list[int],
                      k: int = 10, dims=(16, 32),
                      id_col: str = "vec_id", vec_col: str = "embedding"):
    """Matryoshka-style dimension-truncation diagnostic: recall@k of
    brute-force cosine top-k computed on only the first ``t`` dimensions
    against the full-dimension top-k, per truncation level — the table an
    embedding-serving team reads to decide how many dims the ANN tier can
    drop (Kusupati et al. 2022).  micros-quantization commutes with
    truncation, so the SQL oracle slices the same micros lists.

    One brute pass per level (each is the ann_topk plan: per-batch partial
    top-k, per-query merge); the overlap join runs on the k·n_queries-row
    results driver-side.  Returns (trunc_dim, k, n_queries, n_common,
    recall) with recall = round6(n_common / (k·n_queries))."""
    import pandas as pd

    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.util import rows_all

    full = pd.DataFrame(rows_all(
        brute_force_topk(ds, queries, query_ids, k,
                         id_col=id_col, vec_col=vec_col)))
    full_set = set(zip(full["query_id"], full["vec_id"]))
    nq = len(query_ids)
    rows = []
    for t in dims:
        def cut(b: pa.Table, t=t) -> pa.Table:
            m = np.stack(b[vec_col].to_pandas().to_numpy())[:, :t]
            return pa.table({
                id_col: b[id_col],
                vec_col: pa.array(list(m.astype(np.float32)))})

        trunc = pd.DataFrame(rows_all(brute_force_topk(
            ds.select_columns([id_col, vec_col])
              .map_batches(cut, batch_format="pyarrow"),
            queries[:, :t], query_ids, k,
            id_col=id_col, vec_col=vec_col)))
        common = sum((q, v) in full_set
                     for q, v in zip(trunc["query_id"], trunc["vec_id"]))
        rows.append((int(t), int(k), nq, int(common),
                     round6(common / (k * nq))))
    return pd.DataFrame(rows, columns=["trunc_dim", "k", "n_queries",
                                       "n_common", "recall"])
