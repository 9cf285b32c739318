"""Distributed Lloyd's k-means over an embedding column (list<float>).

The cluster step a large-scale training-data pipeline needs for semantic
dedup / cluster-balanced sampling (SemDeDup-style): embeddings are grouped
into k clusters, then downstream stages dedup or sample within clusters.
The reference's analog is the faiss coarse-quantizer training used by its
IVF recall index (SimCSE-Chinese-Pytorch/simcse_unsup.py:44-76 builds the
index; faiss trains k-means centroids inside GpuIndexIVFFlat) — here the
whole algorithm is expressed on ray.data.

Plan (100-TB-shaped):
- every pass is ``map_batches`` over the streaming Dataset; a batch
  contributes a single (k × d sums, k counts) partial — the ONLY data that
  leaves a batch.  No shuffle at any point; the driver merges k×d-sized
  partials (a few KiB) per iteration.
- centroids are broadcast once per iteration via ``ray.put`` and read
  inside each task (never re-shipped per batch).
- fixed iteration count, deterministic init (the k rows with the smallest
  ids) — same contract as stages/graph.py pagerank: iterative algorithms
  become oracle-checkable when every step is deterministic.

Exactness convention (functions/numeric.py): vectors are folded to integer
micros (float64-exact integers), distances are the integer-exact quadratic
form ||v||^2 - 2 v.c + ||c||^2, and the centroid update is
``floor(sum / count)`` in float64 — every operation is order-independent
and bit-identical to the DuckDB oracle (oracle.kmeans_oracle).  Partial
sums stay exact while cluster_size × 1e6 × |x| < 2^53, i.e. ≲ 9e9 rows
per cluster per dimension at unit-scale embeddings; beyond that, switch
the partial dtype to int64 (object-store cost identical).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from deepkg_ray.functions.numeric import micros_matrix


def _matrix(col) -> np.ndarray:
    return np.stack(col.to_pandas().to_numpy())


def _assign(vm: np.ndarray, cm: np.ndarray) -> np.ndarray:
    """Nearest-centroid index per row; ties → lowest centroid index
    (np.argmin first-minimum == the oracle's ORDER BY dist, cidx)."""
    d2 = ((vm * vm).sum(axis=1)[:, None] - 2.0 * (vm @ cm.T)
          + (cm * cm).sum(axis=1)[None, :])
    return np.argmin(d2, axis=1)


def _init_centroids(ds, k: int, id_col: str, vec_col: str,
                    fanout: int = 8) -> np.ndarray:
    """Rows with the k smallest ids, ordered by id — per-batch partial
    top-k (each batch forwards ≤ k rows), then a two-level merge tree so
    the driver materializes exactly k rows (never k × n_blocks)."""
    def partial(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col].to_pylist(), dtype=np.int64)
        sel = np.argsort(ids, kind="stable")[:k]
        return b.select([id_col, vec_col]).take(pa.array(sel))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(id_col, kind="stable").head(k)

    from deepkg_ray.util import tiny_task_cpus
    tc = tiny_task_cpus()
    kw = {"num_cpus": tc} if tc else {}
    small = (ds.map_batches(partial, batch_format="pyarrow")
             .repartition(fanout)
             .map_batches(topk, batch_format="pandas", batch_size=None, **kw)
             .repartition(1)
             .map_batches(topk, batch_format="pandas", batch_size=None, **kw)
             .to_pandas())
    small = small.sort_values(id_col, kind="stable").head(k)
    return micros_matrix(np.stack(small[vec_col].to_numpy()))


def kmeans_fit(ds, k: int = 8, iters: int = 4, id_col: str = "vec_id",
               vec_col: str = "embedding") -> np.ndarray:
    """Run `iters` Lloyd iterations; returns the (k, d) micros centroid
    matrix.  Each iteration is one streaming pass emitting (cluster, dim)
    cell partials, folded through treeagg.merge_partials — the driver
    materializes exactly k×d rows per iteration (a few KiB), never a
    block-count-shaped table.  Cell sums are integer-valued float64
    (exact while cluster_size × 1e6 × |x| < 2^53), so the tree merge is
    order-independent — same plan as stages/similarity.embedding_gram."""
    from deepkg_ray.stages.treeagg import merge_partials

    cm = _init_centroids(ds, k, id_col, vec_col)
    d = cm.shape[1]
    cell_cluster = np.repeat(np.arange(k, dtype=np.int64), d)
    cell_dim = np.tile(np.arange(d, dtype=np.int64), k)

    for _ in range(iters):
        ref = ray.put(cm)

        def partials(b: pa.Table, cref=ref) -> pa.Table:
            c = ray.get(cref)
            vm = micros_matrix(_matrix(b[vec_col]))
            a = _assign(vm, c)
            onehot = (a[:, None] == np.arange(c.shape[0])[None, :])
            sums = onehot.astype(np.float64).T @ vm          # (k, d) exact
            cnts = onehot.sum(axis=0).astype(np.int64)
            return pa.table({
                "cluster": pa.array(cell_cluster),
                "dim": pa.array(cell_dim),
                "v": pa.array(sums.ravel()),
                "cnt": pa.array(np.repeat(cnts, d)),
            })

        cells = ds.map_batches(partials, batch_format="pyarrow")
        p = merge_partials(cells, ["cluster", "dim"],
                           {"v": "sum", "cnt": "sum"}).to_pandas()
        p = p.sort_values(["cluster", "dim"], kind="stable")
        sums = p["v"].to_numpy(np.float64).reshape(k, d)
        cnts = p["cnt"].to_numpy(np.int64).reshape(k, d)[:, 0]
        new = cm.copy()
        nz = cnts > 0
        new[nz] = np.floor(sums[nz] / cnts[nz, None])
        cm = new
    return cm


def kmeans_assign(ds, centroids: np.ndarray, id_col: str = "vec_id",
                  vec_col: str = "embedding", keep_vec: bool = False):
    """Final assignment pass → Dataset(id_col, cluster:int64); with
    ``keep_vec`` the embedding rides along (for within-cluster stages)."""
    ref = ray.put(centroids)

    def fn(b: pa.Table) -> pa.Table:
        c = ray.get(ref)
        vm = micros_matrix(_matrix(b[vec_col]))
        cols = {id_col: b[id_col],
                "cluster": pa.array(_assign(vm, c).astype(np.int64))}
        if keep_vec:
            cols[vec_col] = b[vec_col]
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def kmeans(ds, k: int = 8, iters: int = 4, id_col: str = "vec_id",
           vec_col: str = "embedding"):
    """fit + assign over the same Dataset."""
    return kmeans_assign(ds, kmeans_fit(ds, k, iters, id_col, vec_col),
                         id_col, vec_col)


def semantic_dedup(ds, k: int = 8, iters: int = 4, tau: float = 0.95,
                   id_col: str = "vec_id", vec_col: str = "embedding"):
    """SemDeDup (arXiv:2303.09540) keep-set: cluster embeddings with
    k-means, then inside each cluster drop a row iff a LOWER-id row has
    round6 cosine ≥ tau with it.

    The dominance rule (vs greedy chaining) is order-independent, so the
    within-cluster filter needs no sequential scan — it vectorizes to one
    cosine matrix per cluster and is exactly SQL-expressible
    (oracle.semantic_dedup_oracle).  Scale note: within-cluster work is
    O(|c|²); size k ~ N / target_cluster_size so clusters stay bounded —
    the groupby shuffle moves each embedding exactly once."""
    from deepkg_ray.functions.numeric import cosine_micros

    asgn = kmeans_assign(ds, kmeans_fit(ds, k, iters, id_col, vec_col),
                         id_col, vec_col, keep_vec=True)

    def per_cluster(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="stable").reset_index(drop=True)
        vm = micros_matrix(np.stack(df[vec_col].to_numpy()))
        sims = cosine_micros(vm, vm)
        # column i dominated ⇔ some row j < i (upper triangle) has sim ≥ tau
        dominated = np.triu(sims >= tau, 1).any(axis=0)
        return df.loc[~dominated, [id_col, "cluster"]]

    return asgn.groupby("cluster").map_groups(per_cluster,
                                              batch_format="pandas")


def pq_fit(ds, m: int = 4, k: int = 16, iters: int = 2,
           id_col: str = "vec_id", vec_col: str = "embedding") -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011): the d dims are
    split into m contiguous width-(d/m) subspaces and Lloyd runs per
    subspace — faiss IndexPQ's train step (the reference's faiss recall
    index quantizes exactly this way when memory-bound;
    SimCSE-Chinese-Pytorch/simcse_unsup.py:44-76 is the index consumer).

    FUSED passes: all m subspace fits share each streaming iteration —
    a batch emits (sub, cluster, dim) cells for every subspace at once, so
    PQ training costs the same number of passes as ONE kmeans_fit
    regardless of m, and the merge tree hands the driver exactly k×d cell
    rows per iteration.  Init/arithmetic conventions are kmeans_fit's
    (first-k-ids init per subspace — the same rows for every subspace —
    micros vectors, integer-exact distances, floor(sum/cnt) update, empty
    cluster keeps its centroid), so each subspace's codebook is bitwise
    what kmeans_fit would produce on the sliced input.

    Returns (m, k, d/m) micros codebooks."""
    from deepkg_ray.stages.treeagg import merge_partials

    init = _init_centroids(ds, k, id_col, vec_col)   # (k, d) micros
    d = init.shape[1]
    assert d % m == 0, (d, m)
    w = d // m
    cm = np.stack([init[:, j * w:(j + 1) * w] for j in range(m)])  # (m,k,w)
    cell_sub = np.repeat(np.arange(m, dtype=np.int64), k * w)
    cell_cluster = np.tile(np.repeat(np.arange(k, dtype=np.int64), w), m)
    cell_dim = np.tile(np.arange(w, dtype=np.int64), m * k)

    for _ in range(iters):
        ref = ray.put(cm)

        def partials(b: pa.Table, cref=ref) -> pa.Table:
            c = ray.get(cref)
            vm = micros_matrix(_matrix(b[vec_col]))
            v_out = np.empty((m, k, w), np.float64)
            n_out = np.empty((m, k), np.int64)
            for j in range(m):
                sub = vm[:, j * w:(j + 1) * w]
                a = _assign(sub, c[j])
                onehot = (a[:, None] == np.arange(k)[None, :])
                v_out[j] = onehot.astype(np.float64).T @ sub
                n_out[j] = onehot.sum(axis=0)
            return pa.table({
                "sub": pa.array(cell_sub),
                "cluster": pa.array(cell_cluster),
                "dim": pa.array(cell_dim),
                "v": pa.array(v_out.ravel()),
                "cnt": pa.array(np.repeat(n_out.ravel(), w)),
            })

        cells = ds.map_batches(partials, batch_format="pyarrow")
        p = merge_partials(cells, ["sub", "cluster", "dim"],
                           {"v": "sum", "cnt": "sum"}).to_pandas()
        p = p.sort_values(["sub", "cluster", "dim"], kind="stable")
        sums = p["v"].to_numpy(np.float64).reshape(m, k, w)
        cnts = p["cnt"].to_numpy(np.int64).reshape(m, k, w)[:, :, 0]
        new = cm.copy()
        nz = cnts > 0
        new[nz] = np.floor(sums[nz] / cnts[nz, None])
        cm = new
    return cm


def pq_assign(ds, codebooks: np.ndarray, id_col: str = "vec_id",
              vec_col: str = "embedding"):
    """Encode every vector against the (m, k, w) codebooks → one row per
    vector with columns code0..code{m-1} (int64) — faiss IndexPQ.add's
    code computation, streaming."""
    mq, kq, w = codebooks.shape
    ref = ray.put(codebooks)

    def fn(b: pa.Table) -> pa.Table:
        c = ray.get(ref)
        vm = micros_matrix(_matrix(b[vec_col]))
        cols = {id_col: b[id_col]}
        for j in range(mq):
            a = _assign(vm[:, j * w:(j + 1) * w], c[j])
            cols[f"code{j}"] = pa.array(a.astype(np.int64))
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def pq_codes(ds, m: int = 4, k: int = 16, iters: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding"):
    """fit + encode over the same Dataset."""
    return pq_assign(ds, pq_fit(ds, m, k, iters, id_col, vec_col),
                     id_col, vec_col)


def pq_adc_topk(ds, queries: np.ndarray, query_ids, codebooks: np.ndarray,
                k: int = 10, id_col: str = "vec_id",
                vec_col: str = "embedding"):
    """Asymmetric-distance top-k over PQ codes (faiss IndexPQ.search): per
    query, an (m, k_codes) lookup table of exact integer sub-distances to
    every codebook centroid is built once; each streaming batch then
    encodes its vectors and scores them with m table lookups + adds — no
    full-dimension math per candidate.  All values are integer-exact in
    float64 (micros² × w ≪ 2^53), so the result hashes bitwise against the
    SQL re-derivation.  Returns (query_id, vec_id, dist:int64, rank),
    ordered (dist asc, vec_id asc)."""
    mq, kq, w = codebooks.shape
    qm = micros_matrix(np.asarray(queries))
    qids = np.asarray(query_ids, dtype=np.int64)
    # LUT[q, j, c] = ||q_j - c||² (exact integers)
    lut = np.empty((len(qm), mq, kq), np.float64)
    for j in range(mq):
        qs = qm[:, j * w:(j + 1) * w]
        cm = codebooks[j]
        lut[:, j, :] = ((qs * qs).sum(1)[:, None] - 2.0 * qs @ cm.T
                        + (cm * cm).sum(1)[None, :])
    cref = ray.put(codebooks)
    lref = ray.put(lut)

    def partial(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        lt = ray.get(lref)
        ids = np.asarray(b[id_col].to_pylist(), dtype=np.int64)
        vm = micros_matrix(_matrix(b[vec_col]))
        dist = np.zeros((len(lt), len(ids)), np.float64)
        for j in range(mq):
            codes = _assign(vm[:, j * w:(j + 1) * w], c[j])
            dist += lt[:, j, :][:, codes]
        kk = min(k, len(ids))
        q_out, id_out, d_out = [], [], []
        for qi in range(len(lt)):
            sel = np.lexsort((ids, dist[qi]))[:kk]
            q_out.extend([int(qids[qi])] * len(sel))
            id_out.extend(ids[sel].tolist())
            d_out.extend(dist[qi, sel].astype(np.int64).tolist())
        return pa.table({
            "query_id": pa.array(q_out, pa.int64()),
            "vec_id": pa.array(id_out, pa.int64()),
            "dist": pa.array(d_out, pa.int64())})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dist", "vec_id"], kind="stable") \
             .head(k).reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int32)
        return g

    return (ds.select_columns([id_col, vec_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("query_id").map_groups(finish, batch_format="pandas"))


def silhouette_by_cluster(ds, k: int = 8, iters: int = 4,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding"):
    """Per-cluster simplified silhouette of the kmeans_fit clustering:
    for each point, a = distance to its own centroid, b = distance to the
    nearest OTHER centroid, s = (b−a)/max(a,b) — the centroid-based
    silhouette (Hruschka et al.), the standard O(n·k) clustering-quality
    score (the O(n²) pairwise variant is not a streaming op).

    Exactness: quadratic distances are integer-valued float64 (micros
    space, same argument as kmeans_fit), sqrt/divide are single
    deterministic double ops per point, s quantizes to int64 micros and
    integer-sums per cluster.  One streaming pass after the fit; the
    merge is k-bounded.  Returns (cluster, n, s_micros, mean_sil)."""
    assert k >= 2
    from deepkg_ray.stages.treeagg import merge_partials

    cm = kmeans_fit(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    ref = ray.put(cm)

    def partial(b: pa.Table) -> pa.Table:
        c = ray.get(ref)
        vm = micros_matrix(_matrix(b[vec_col]))
        d2 = ((vm * vm).sum(1)[:, None] - 2.0 * (vm @ c.T)
              + (c * c).sum(1)[None, :])
        a_idx = _assign(vm, c)
        rows = np.arange(len(vm))
        da = np.sqrt(d2[rows, a_idx])
        d2o = d2.copy()
        d2o[rows, a_idx] = np.inf
        db = np.sqrt(d2o.min(1))
        mx = np.maximum(da, db)
        s = np.where(mx > 0, (db - da) / np.where(mx > 0, mx, 1.0), 0.0)
        sm = np.floor(s * 1e6 + 0.5).astype(np.int64)
        out = pd.DataFrame({"cluster": a_idx, "sm": sm}) \
            .groupby("cluster", as_index=False) \
            .agg(n=("sm", "size"), s_micros=("sm", "sum"))
        return pa.table({
            "cluster": pa.array(out["cluster"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "s_micros": pa.array(out["s_micros"].to_numpy(np.int64))})

    merged = merge_partials(
        ds.select_columns([id_col, vec_col]).map_batches(
            partial, batch_format="pyarrow"),
        ["cluster"], {"n": "sum", "s_micros": "sum"})

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sm = b["s_micros"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return b.append_column("mean_sil", pa.array(sm / n / 1e6))

    return merged.map_batches(finish, batch_format="pyarrow")


def cluster_purity(ds, k: int = 8, iters: int = 4,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label"):
    """Cluster-vs-gold-label quality: the (cluster × label) confusion
    counts plus per-cluster purity = majority-label share — the external
    clustering-evaluation table (purity/NMI family; purity is the
    integer-exact member, so engine ≡ SQL with one round6 division).

    One assignment pass after the fit emits (cluster, label) cell
    partials; the merge is k × label-dictionary bounded.  Returns
    (cluster, label, n, cluster_n, purity) — purity repeated per cell so
    the table stays one relation (majority ties break toward the count
    itself: purity = max n / cluster_n)."""
    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.treeagg import merge_partials

    cm = kmeans_fit(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    ref = ray.put(cm)

    def partial(b: pa.Table) -> pa.Table:
        c = ray.get(ref)
        vm = micros_matrix(_matrix(b[vec_col]))
        out = pd.DataFrame({
            "cluster": _assign(vm, c).astype(np.int64),
            "label": b[label_col].to_numpy(zero_copy_only=False)
            .astype(np.int64)}) \
            .groupby(["cluster", "label"], as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    cells = merge_partials(
        ds.select_columns([id_col, vec_col, label_col]).map_batches(
            partial, batch_format="pyarrow"),
        ["cluster", "label"], {"n": "sum"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("cluster")["n"].transform("sum")
        mx = df.groupby("cluster")["n"].transform("max")
        df = df.copy()
        df["cluster_n"] = tot.astype("int64")
        df["purity"] = round6(mx.to_numpy(np.float64)
                              / tot.to_numpy(np.float64))
        return df

    return cells.map_batches(finish, batch_format="pandas",
                             batch_size=None)


def cluster_nmi(ds, k: int = 8, iters: int = 4, id_col: str = "vec_id",
                vec_col: str = "embedding", label_col: str = "label"):
    """Normalized mutual information between the k-means clustering and
    the gold labels — the scale-free external eval (purity rewards many
    tiny clusters; NMI doesn't).  From the same (cluster, label) cells as
    cluster_purity: MI = Σ (n_ij/N)·ln(n_ij·N/(a_i·b_j)) and the two
    entropies accumulate as per-cell floor(term·1e6+0.5) int64 sums (the
    source_kl ln-micros convention — order-free, SQL-identical); the
    single NMI = mi/√(hc·hl) division is one double op.  Returns one row
    (n, mi_micros, hc_micros, hl_micros, nmi)."""
    from deepkg_ray.stages.treeagg import merge_partials

    cm = kmeans_fit(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    ref = ray.put(cm)

    def partial(b: pa.Table) -> pa.Table:
        c = ray.get(ref)
        vm = micros_matrix(_matrix(b[vec_col]))
        out = pd.DataFrame({
            "cluster": _assign(vm, c).astype(np.int64),
            "label": b[label_col].to_numpy(zero_copy_only=False)
            .astype(np.int64)}) \
            .groupby(["cluster", "label"], as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    cells = merge_partials(
        ds.select_columns([id_col, vec_col, label_col]).map_batches(
            partial, batch_format="pyarrow"),
        ["cluster", "label"], {"n": "sum"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        N = int(n.sum())
        a = df.groupby("cluster")["n"].transform("sum").to_numpy(np.int64)
        b = df.groupby("label")["n"].transform("sum").to_numpy(np.int64)
        term = (n / N) * np.log(n.astype(np.float64) * N
                                / (a.astype(np.float64) * b))
        mi_m = int(np.floor(term * 1e6 + 0.5).astype(np.int64).sum())
        ca = df.groupby("cluster", as_index=False)["n"].sum()["n"] \
            .to_numpy(np.int64)
        cb = df.groupby("label", as_index=False)["n"].sum()["n"] \
            .to_numpy(np.int64)
        hc_m = int(np.floor(-(ca / N) * np.log(ca / N) * 1e6 + 0.5)
                   .astype(np.int64).sum())
        hl_m = int(np.floor(-(cb / N) * np.log(cb / N) * 1e6 + 0.5)
                   .astype(np.int64).sum())
        denom = np.sqrt(float(hc_m)) * np.sqrt(float(hl_m))
        nmi = float(mi_m) / denom if denom > 0 else 0.0
        return pd.DataFrame({
            "n": [N], "mi_micros": [mi_m], "hc_micros": [hc_m],
            "hl_micros": [hl_m],
            "nmi": [np.floor(nmi * 1e6 + 0.5) / 1e6]})

    return cells.map_batches(finish, batch_format="pandas",
                             batch_size=None)


def cluster_ari(ds, k: int = 8, iters: int = 4, id_col: str = "vec_id",
                vec_col: str = "embedding", label_col: str = "label"):
    """Adjusted Rand index between the k-means clustering and the gold
    labels — the chance-corrected pair-counting eval completing the
    purity/NMI family.  Everything up to the last op is exact integer
    combinatorics over the confusion cells:

        sij = Σ_ij C(n_ij,2),  sa = Σ_i C(a_i,2),  sb = Σ_j C(b_j,2)
        ARI = (C(N,2)·sij − sa·sb) / (C(N,2)·(sa+sb)/2 − sa·sb)

    evaluated as num2/den2 with both sides doubled (keeps the midpoint
    integral), Python big ints (no overflow), and ONE final round6
    double division — engine ≡ SQL exactly.  Returns one row
    (n, sum_cells_c2, sum_a_c2, sum_b_c2, ari)."""
    from deepkg_ray.stages.treeagg import merge_partials

    cm = kmeans_fit(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    ref = ray.put(cm)

    def partial(b: pa.Table) -> pa.Table:
        c = ray.get(ref)
        vm = micros_matrix(_matrix(b[vec_col]))
        out = pd.DataFrame({
            "cluster": _assign(vm, c).astype(np.int64),
            "label": b[label_col].to_numpy(zero_copy_only=False)
            .astype(np.int64)}) \
            .groupby(["cluster", "label"], as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    cells = merge_partials(
        ds.select_columns([id_col, vec_col, label_col]).map_batches(
            partial, batch_format="pyarrow"),
        ["cluster", "label"], {"n": "sum"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        N = int(n.sum())
        a = df.groupby("cluster")["n"].sum().to_numpy(np.int64)
        b = df.groupby("label")["n"].sum().to_numpy(np.int64)
        c2 = lambda x: int((x * (x - 1) // 2).sum())
        sij, sa, sb = c2(n), c2(a), c2(b)
        cn2 = N * (N - 1) // 2
        num2 = 2 * cn2 * sij - 2 * sa * sb
        den2 = cn2 * (sa + sb) - 2 * sa * sb
        ari = (np.floor(num2 / den2 * 1e6 + 0.5) / 1e6
               if den2 != 0 else 0.0)
        return pd.DataFrame({
            "n": [N], "sum_cells_c2": [sij], "sum_a_c2": [sa],
            "sum_b_c2": [sb], "ari": [ari]})

    return cells.map_batches(finish, batch_format="pandas",
                             batch_size=None)


def pq_distortion(ds, m: int = 4, k: int = 16, iters: int = 2,
                  id_col: str = "vec_id", vec_col: str = "embedding"):
    """Per-subspace PQ reconstruction distortion — the quantization-error
    audit behind every PQ deployment (faiss's imbalance/quantization-error
    report): for each subspace j, SSE = Σ over vectors of the exact
    integer quadratic distance (micros²) to the ASSIGNED centroid, plus
    the rounded mean (mse = floor(sse/n + 0.5), float64 division —
    identical in SQL).

    One extra streaming pass over the fitted codebooks (broadcast via
    ray.put); per-batch (subspace, n, sse) partials fold through the merge
    tree — m rows total.  Overflow bound: per-row-subspace distance ≤
    w·(2·maxabs_micros)² ≈ 6.4e13 at w=16, so int64 holds corpora to
    ~10^5 × that row count per block — the per-batch partial keeps blocks
    bounded.  Returns (subspace, n_vecs, sse, mse)."""
    from deepkg_ray.stages.treeagg import merge_partials

    cb = pq_fit(ds, m, k, iters, id_col, vec_col)
    mq, kq, w = cb.shape
    ref = ray.put(cb)

    def part(b: pa.Table) -> pa.Table:
        c = ray.get(ref)
        vm = micros_matrix(_matrix(b[vec_col]))
        subs, ns, sses = [], [], []
        for j in range(mq):
            x = vm[:, j * w:(j + 1) * w].astype(np.float64)
            cj = c[j].astype(np.float64)
            d2 = ((x * x).sum(axis=1)[:, None] - 2.0 * (x @ cj.T)
                  + (cj * cj).sum(axis=1)[None, :])
            # integer-exact: micros ≤ ~2e6 keeps every term < 2^53
            dmin = d2.min(axis=1)
            subs.append(j)
            ns.append(x.shape[0])
            sses.append(int(dmin.astype(np.int64).sum()))
        return pa.table({"subspace": pa.array(subs, pa.int64()),
                         "n_vecs": pa.array(ns, pa.int64()),
                         "sse": pa.array(sses, pa.int64())})

    merged = merge_partials(
        ds.select_columns([id_col, vec_col]).map_batches(
            part, batch_format="pyarrow"),
        ["subspace"], {"n_vecs": "sum", "sse": "sum"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("subspace").reset_index(drop=True)
        df["mse"] = [float(np.floor(s / n + 0.5)) if n else 0.0
                     for s, n in zip(df["sse"], df["n_vecs"])]
        return df[["subspace", "n_vecs", "sse", "mse"]]

    return merged.map_batches(finish, batch_format="pandas",
                              batch_size=None)
