"""Distributed Lloyd's k-means (stages/kmeans.py) vs a plain in-memory
reference implementing the same deterministic contract."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from deepkg_ray.functions.numeric import micros_matrix
from deepkg_ray.stages import kmeans as km


def _reference(vecs: np.ndarray, ids: np.ndarray, k: int, iters: int):
    """Single-machine Lloyd with the module's exact conventions."""
    vm = micros_matrix(vecs)
    order = np.argsort(ids, kind="stable")
    cm = vm[order[:k]].copy()
    for _ in range(iters + 1):
        d2 = ((vm * vm).sum(1)[:, None] - 2.0 * vm @ cm.T
              + (cm * cm).sum(1)[None, :])
        a = np.argmin(d2, axis=1)
        if _ == iters:
            break
        for j in range(k):
            m = a == j
            if m.any():
                cm[j] = np.floor(vm[m].sum(0) / m.sum())
    return a


def _ds(vecs: np.ndarray, ids: np.ndarray, blocks: int = 5):
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(vecs.astype(np.float32)))})
    return rd.from_arrow(t).repartition(blocks)


def test_kmeans_matches_reference_on_random_vectors():
    rng = np.random.default_rng(7)
    n, d, k, iters = 400, 16, 6, 3
    vecs = rng.normal(size=(n, d))
    ids = rng.permutation(n).astype(np.int64)
    out = (km.kmeans(_ds(vecs, ids), k=k, iters=iters)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    want = _reference(vecs, ids, k, iters)
    got = out.set_index("vec_id")["cluster"]
    expect = pd.Series(want, index=ids).sort_index()
    assert (got.sort_index().to_numpy() == expect.to_numpy()).all()


def test_kmeans_empty_cluster_keeps_centroid():
    # all points identical → ties send every row to cluster 0, cluster 1
    # is empty from iteration 1 on; fit must keep the old centroid (no
    # NaN / crash) and assignments must match the reference.
    vecs = np.ones((40, 4))
    ids = np.arange(40, dtype=np.int64)
    out = (km.kmeans(_ds(vecs, ids, blocks=3), k=2, iters=3)
           .to_pandas().sort_values("vec_id"))
    want = _reference(vecs, ids, 2, 3)
    assert (out["cluster"].to_numpy() == want).all()
    assert (out["cluster"] == 0).all()


def test_semantic_dedup_drops_dominated_rows():
    # pairs of near-identical vectors: within each pair the higher id must
    # be dropped; distinct directions all survive.
    rng = np.random.default_rng(3)
    base = rng.normal(size=(30, 8))
    vecs = np.vstack([base, base + rng.normal(0, 1e-4, size=base.shape)])
    ids = np.arange(60, dtype=np.int64)
    out = (km.semantic_dedup(_ds(vecs, ids, blocks=4), k=4, iters=3,
                             tau=0.999)
           .to_pandas().sort_values("vec_id"))
    kept = set(out["vec_id"])
    # clones land in the same cluster as their base (distance ~0), so every
    # clone (id >= 30) is dominated by its base (id < 30)
    assert kept == set(range(30))


def test_kmeans_cluster_separation():
    # two far groups with init centroids in both → clean 2-way split.
    rng = np.random.default_rng(1)
    a = rng.normal(0.0, 0.01, size=(50, 4))
    b = rng.normal(5.0, 0.01, size=(50, 4))
    vecs = np.vstack([a, b])[rng.permutation(100)]
    ids = np.arange(100, dtype=np.int64)
    out = (km.kmeans(_ds(vecs, ids, blocks=3), k=2, iters=4)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    grp = (vecs[:, 0] > 2.5).astype(int)
    c_of = {g: set(out["cluster"][grp == g]) for g in (0, 1)}
    assert all(len(s) == 1 for s in c_of.values()) and c_of[0] != c_of[1]


def test_pq_fit_matches_per_subspace_kmeans(ray_session):
    rng = np.random.default_rng(7)
    d, m, k = 8, 4, 3
    vecs = rng.normal(size=(40, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                       "embedding": list(vecs)})
    ds = rd.from_pandas(df)
    books = km.pq_fit(ds, m=m, k=k, iters=2)
    assert books.shape == (m, k, d // m)
    w = d // m
    for j in range(m):
        sub_df = pd.DataFrame({
            "vec_id": df["vec_id"],
            "embedding": [v[j * w:(j + 1) * w] for v in vecs]})
        ref = km.kmeans_fit(rd.from_pandas(sub_df), k=k, iters=2)
        np.testing.assert_array_equal(books[j], ref)


def test_pq_assign_codes_are_nearest_subcentroid(ray_session):
    rng = np.random.default_rng(3)
    d, m, k = 8, 2, 4
    vecs = rng.normal(size=(30, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(30, dtype=np.int64),
                       "embedding": list(vecs)})
    ds = rd.from_pandas(df)
    books = km.pq_fit(ds, m=m, k=k, iters=1)
    out = (km.pq_assign(ds, books).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    vm = micros_matrix(vecs)
    w = d // m
    for j in range(m):
        sub = vm[:, j * w:(j + 1) * w]
        cm = books[j]
        d2 = ((sub * sub).sum(1)[:, None] - 2.0 * sub @ cm.T
              + (cm * cm).sum(1)[None, :])
        np.testing.assert_array_equal(out[f"code{j}"].to_numpy(),
                                      np.argmin(d2, axis=1))


def test_pq_adc_topk_matches_exhaustive_code_distance(ray_session):
    rng = np.random.default_rng(11)
    d, m, k_codes = 8, 2, 4
    vecs = rng.normal(size=(50, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(50, dtype=np.int64),
                       "embedding": list(vecs)})
    ds = rd.from_pandas(df)
    books = km.pq_fit(ds, m=m, k=k_codes, iters=1)
    out = (km.pq_adc_topk(ds, vecs[:2], [0, 1], books, k=5).to_pandas()
           .sort_values(["query_id", "rank"]).reset_index(drop=True))
    # exhaustive reference: encode all, then LUT-sum per (query, vector)
    vm = micros_matrix(vecs)
    qm = micros_matrix(vecs[:2])
    w = d // m
    dist = np.zeros((2, 50))
    for j in range(m):
        sub, qs, cm = vm[:, j*w:(j+1)*w], qm[:, j*w:(j+1)*w], books[j]
        d2 = ((sub*sub).sum(1)[:, None] - 2.0*sub@cm.T + (cm*cm).sum(1))
        codes = np.argmin(d2, axis=1)
        qd = ((qs*qs).sum(1)[:, None] - 2.0*qs@cm.T + (cm*cm).sum(1))
        dist += qd[:, codes]
    for qi in (0, 1):
        exp = np.lexsort((np.arange(50), dist[qi]))[:5]
        got = out[out.query_id == qi].sort_values("rank")
        np.testing.assert_array_equal(got["vec_id"].to_numpy(), exp)
        np.testing.assert_array_equal(got["dist"].to_numpy(),
                                      dist[qi, exp].astype(np.int64))


def test_silhouette_separated_blobs(ray_session):
    """Two well-separated blobs with k=2 score near-1 silhouette."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.kmeans import silhouette_by_cluster
    rng = np.random.RandomState(7)
    a = rng.normal(0.0, 0.01, (40, 8)) + 1.0
    b = rng.normal(0.0, 0.01, (40, 8)) - 1.0
    vecs = np.vstack([a, b]).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(80, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))})
    out = silhouette_by_cluster(rd.from_arrow(t), k=2, iters=4) \
        .to_pandas()
    assert len(out) == 2 and out["n"].sum() == 80
    assert (out["mean_sil"] > 0.9).all()


def test_cluster_purity_perfect_blobs(ray_session):
    """Blobs aligned to labels give purity 1.0 everywhere."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.kmeans import cluster_purity
    rng = np.random.RandomState(3)
    vecs = np.vstack([rng.normal(0, 0.01, (30, 8)) + 1.0,
                      rng.normal(0, 0.01, (30, 8)) - 1.0]).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(60, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 30 + [1] * 30, pa.int32())})
    out = cluster_purity(rd.from_arrow(t), k=2, iters=4).to_pandas()
    assert len(out) == 2                          # one label per cluster
    assert (out["purity"] == 1.0).all()
    assert out["cluster_n"].sum() == 60


def test_cluster_nmi_perfect_and_bounds(ray_session):
    """Perfectly label-aligned blobs give NMI == 1; value bounded."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.kmeans import cluster_nmi
    rng = np.random.RandomState(11)
    vecs = np.vstack([rng.normal(0, 0.01, (25, 8)) + 1.0,
                      rng.normal(0, 0.01, (25, 8)) - 1.0]).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(50, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 25 + [1] * 25, pa.int32())})
    out = cluster_nmi(rd.from_arrow(t), k=2, iters=4).to_pandas()
    assert len(out) == 1 and out["n"].iloc[0] == 50
    assert abs(out["nmi"].iloc[0] - 1.0) < 1e-5


def test_cluster_ari_perfect(ray_session):
    """Label-aligned blobs give ARI == 1."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.kmeans import cluster_ari
    rng = np.random.RandomState(5)
    vecs = np.vstack([rng.normal(0, 0.01, (20, 8)) + 1.0,
                      rng.normal(0, 0.01, (20, 8)) - 1.0]).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 20 + [1] * 20, pa.int32())})
    out = cluster_ari(rd.from_arrow(t), k=2, iters=4).to_pandas()
    assert out["ari"].iloc[0] == 1.0 and out["n"].iloc[0] == 40


def test_pq_distortion_matches_bruteforce(ray_session):
    rng = np.random.default_rng(21)
    d, m, k = 8, 2, 4
    vecs = rng.normal(size=(50, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(50, dtype=np.int64),
                       "embedding": list(vecs)})
    ds = rd.from_pandas(df)
    got = (km.pq_distortion(ds, m=m, k=k, iters=1).to_pandas()
           .sort_values("subspace").reset_index(drop=True))
    books = km.pq_fit(ds, m=m, k=k, iters=1)
    vm = micros_matrix(vecs)
    w = d // m
    for j in range(m):
        sub = vm[:, j * w:(j + 1) * w].astype(np.float64)
        cm = books[j].astype(np.float64)
        d2 = ((sub * sub).sum(1)[:, None] - 2.0 * sub @ cm.T
              + (cm * cm).sum(1)[None, :])
        sse = int(d2.min(axis=1).astype(np.int64).sum())
        assert got.loc[j, "n_vecs"] == 50
        assert got.loc[j, "sse"] == sse
        assert got.loc[j, "mse"] == float(np.floor(sse / 50 + 0.5))
    # more codewords can only reduce distortion
    finer = (km.pq_distortion(ds, m=m, k=8, iters=1).to_pandas()
             .sort_values("subspace").reset_index(drop=True))
    assert (finer["sse"].to_numpy() <= got["sse"].to_numpy()).all()
