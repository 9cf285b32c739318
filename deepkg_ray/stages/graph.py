"""Graph operators over edge tables: connected components (the cluster step
that completes the near-dup family — after LSH pair generation you still
need "which docs form one duplicate group, who survives"), degree stats and
triangle counting over the built KG adjacency.

Reference parity: the reference has no graph algorithms — its KG build stops
at the edge list (DeepKG KnowledgeExtraction writes triples; see
pipelines/kg.py docstring for the file:line map).  These operators are the
round-brief "beyond the reference" additions a 100-TB dedup / KG pipeline
needs downstream of the edges.

Scale notes
-----------
- connected_components is ADAPTIVE like minhash verify: near-dup pair sets
  are tiny relative to the corpus (per-mille of docs), so up to
  `driver_limit` pair rows a driver-side union-find is exact and cheap;
  beyond it, a join-free min-label propagation runs distributed — each
  round is two groupby shuffles (labels ∪ bidirected edges keyed by node;
  per-group forward the node's current label along its edges; then a
  per-node min).  Rounds = graph diameter, which for duplicate clusters is
  small; the convergence probe is a single Sum aggregate (labels only ever
  decrease, so an unchanged sum IS the fixpoint).
- degrees / triangles shuffle by vertex id; triangle counting uses the
  standard degree-ordered orientation so each triangle is counted once and
  hub vertices don't explode the join fan-out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Min, Sum


# ------------------------------------------------------ driver union-find ---

def union_find_components(pairs_df: pd.DataFrame, a_col: str = "doc_a",
                          b_col: str = "doc_b") -> pd.DataFrame:
    """Exact union-find over a bounded pair table (driver-side tier).
    Returns (node, component) for every node appearing in a pair, where
    component = min node id of the connected component."""
    a = pairs_df[a_col].to_numpy(dtype=np.int64)
    b = pairs_df[b_col].to_numpy(dtype=np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    idx = {int(n): i for i, n in enumerate(nodes)}
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:          # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(a, b):
        ru, rv = find(idx[int(u)]), find(idx[int(v)])
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)   # min-root union
    roots = np.fromiter((find(i) for i in range(len(nodes))),
                        dtype=np.int64, count=len(nodes))
    # nodes[] ascending ⇒ min root index = min node id of the component
    return pd.DataFrame({"node": nodes, "component": nodes[roots]})


# ------------------------------------------- distributed label propagation --

def label_propagation_components(pairs, a_col: str = "doc_a",
                                 b_col: str = "doc_b",
                                 max_rounds: int = 50):
    """Distributed min-label propagation, join-free: each round unions the
    current (node, lbl) table with the bidirected edge list keyed by node,
    groups by node to forward the node's label along its edges, then takes
    a per-node min.  Two groupby shuffles per round, O(diameter) rounds.
    Returns a Dataset (node, component)."""
    import ray.data  # noqa: F401  (Dataset ops on `pairs`)

    def bidirect(b: pa.Table) -> pa.Table:
        u = b[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "node": pa.array(np.concatenate([u, v]), pa.int64()),
            "peer": pa.array(np.concatenate([v, u]), pa.int64()),
        })

    edges = pairs.map_batches(bidirect, batch_format="pyarrow").materialize()

    # initial labels: own id
    labels = (edges.groupby("node").aggregate(Min("peer", alias_name="lbl"))
              .map_batches(lambda t: pa.table({
                  "node": t["node"],
                  "lbl": pa.array(np.minimum(
                      t["node"].to_numpy(zero_copy_only=False),
                      t["lbl"].to_numpy(zero_copy_only=False)), pa.int64())}),
                  batch_format="pyarrow")
              .materialize())

    def lbl_sum(ds) -> int:
        return ds.aggregate(Sum("lbl", alias_name="s"))["s"]

    prev = lbl_sum(labels)
    for _ in range(max_rounds):
        lab_rows = labels.map_batches(
            lambda t: pa.table({"node": t["node"], "peer": t["lbl"],
                                "is_edge": pa.array(
                                    np.zeros(t.num_rows, dtype=bool))}),
            batch_format="pyarrow")
        edge_rows = edges.map_batches(
            lambda t: pa.table({"node": t["node"], "peer": t["peer"],
                                "is_edge": pa.array(
                                    np.ones(t.num_rows, dtype=bool))}),
            batch_format="pyarrow")

        def forward(g: pd.DataFrame) -> pd.DataFrame:
            lbl = int(g.loc[~g["is_edge"], "peer"].min())
            dst = g.loc[g["is_edge"], "peer"].to_numpy(dtype=np.int64)
            node = int(g["node"].iloc[0])
            return pd.DataFrame({
                "node": np.concatenate([dst, [node]]),
                "lbl": np.full(len(dst) + 1, lbl, dtype=np.int64)})

        labels = (lab_rows.union(edge_rows)
                  .groupby("node").map_groups(forward, batch_format="pandas")
                  .groupby("node").aggregate(Min("lbl", alias_name="lbl"))
                  .materialize())
        cur = lbl_sum(labels)
        if cur == prev:       # labels only decrease ⇒ fixpoint
            break
        prev = cur
    return labels.map_batches(
        lambda t: pa.table({"node": t["node"], "component": t["lbl"]}),
        batch_format="pyarrow")


def connected_components(pairs, a_col: str = "doc_a", b_col: str = "doc_b",
                         mode: str = "auto", driver_limit: int = 1_000_000):
    """(node, component) for every node in the pair table; component = min
    reachable node id.  mode='auto' routes by observed pair count (see
    module docstring); 'driver' / 'distributed' force a tier."""
    if mode == "distributed":
        return label_propagation_components(pairs, a_col, b_col)
    pairs = pairs.materialize()
    if mode == "auto" and pairs.count() > driver_limit:
        return label_propagation_components(pairs, a_col, b_col)
    import ray.data as rd
    df = pairs.to_pandas()
    if not len(df):
        return rd.from_pandas(pd.DataFrame({
            "node": pd.Series([], dtype=np.int64),
            "component": pd.Series([], dtype=np.int64)}))
    return rd.from_pandas(union_find_components(df, a_col, b_col))


def dedup_cluster_stats(components):
    """(component, n_members) per duplicate cluster — the 'keep one per
    cluster' accounting table (survivor = the component id itself, the min
    node)."""
    return components.groupby("component").aggregate(
        Count(alias_name="n_members"))


# ------------------------------------------------------------- pagerank -----

PR_SCALE = 10**12

# (lo, hi) node-pair packing base for combiner keys and broadcast edge
# sets — requires node ids < 2^31 (assert-guarded at use sites)
PACK = np.int64(2**31)


def pagerank_scaled(edges, src_col: str = "subj_id", dst_col: str = "obj_id",
                    n_iters: int = 5, damping_pct: int = 85):
    """Fixed-iteration PageRank over the simple directed graph (self-loops
    dropped, parallel edges deduped), ALL arithmetic in int64 units of
    1/PR_SCALE so the engine and the unrolled-CTE SQL oracle are bitwise
    identical (the micros convention generalized to an iterative op):

        pm0        = PR_SCALE // n
        base       = ((100-damping_pct) * PR_SCALE) // (100 * n)
        contrib(u) = pm[u] // outdeg[u]           (per out-edge)
        pm'[v]     = base + (damping_pct * Σ contrib) // 100

    Dangling mass is dropped (documented; both sides identical).  Each
    iteration is two groupby shuffles, join-free like the CC rounds: the
    state (node, pm, outdeg) unions with the edge list keyed by src to
    scatter contributions, then a per-node group folds them with the static
    outdeg row.  Returns (node, pr_scaled int64)."""
    def orient(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        return pa.table({"s": pa.array(u[keep], pa.int64()),
                         "d": pa.array(v[keep], pa.int64())})

    dedges = (edges.map_batches(orient, batch_format="pyarrow")
              .groupby(["s", "d"]).aggregate(Count(alias_name="_m"))
              .drop_columns(["_m"]).materialize())

    def nodes_of(b: pa.Table) -> pa.Table:
        both = np.concatenate([b["s"].to_numpy(zero_copy_only=False),
                               b["d"].to_numpy(zero_copy_only=False)])
        return pa.table({"node": pa.array(np.unique(both), pa.int64())})

    nodes = (dedges.map_batches(nodes_of, batch_format="pyarrow")
             .groupby("node").aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"]).materialize())
    n = nodes.count()
    if n == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "pr_scaled": pa.array([], pa.int64())}))
    pm0 = PR_SCALE // n
    base = ((100 - damping_pct) * PR_SCALE) // (100 * n)

    # static per-node zero rows: every node appears in the fold groupby
    # even with no in-edges
    def zero_row(b: pa.Table) -> pa.Table:
        z = np.zeros(b.num_rows, dtype=np.int64)
        return pa.table({"node": b["node"], "val": pa.array(z, pa.int64())})
    zero_rows = nodes.map_batches(zero_row, batch_format="pyarrow").materialize()

    state = nodes.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "pm": pa.array(np.full(b.num_rows, pm0,
                                                   np.int64))}),
        batch_format="pyarrow")
    dp = damping_pct

    for it in range(n_iters):
        # phase 1: scatter contributions along out-edges (keyed by src);
        # a node's outdeg IS its group's edge-row count
        st_rows = state.map_batches(
            lambda b: pa.table({"node": b["node"], "peer": b["pm"],
                                "is_edge": pa.array(
                                    np.zeros(b.num_rows, dtype=bool))}),
            batch_format="pyarrow")
        ed_rows = dedges.map_batches(
            lambda b: pa.table({"node": b["s"], "peer": b["d"],
                                "is_edge": pa.array(
                                    np.ones(b.num_rows, dtype=bool))}),
            batch_format="pyarrow")

        def scatter(g: pa.Table) -> pa.Table:
            is_edge = g["is_edge"].to_numpy(zero_copy_only=False)
            peer = g["peer"].to_numpy(zero_copy_only=False)
            pm = int(peer[~is_edge][0])
            dst = peer[is_edge]
            if len(dst) == 0:       # dangling: mass dropped (documented)
                return pa.table({"node": pa.array([], pa.int64()),
                                 "val": pa.array([], pa.int64())})
            contrib = pm // len(dst)
            return pa.table({"node": pa.array(dst, pa.int64()),
                             "val": pa.array(
                                 np.full(len(dst), contrib, np.int64))})

        contribs = (st_rows.union(ed_rows).groupby("node")
                    .map_groups(scatter, batch_format="pyarrow"))

        # phase 2: fold contributions per node (zero rows keep isolated-
        # in-degree nodes present)
        def fold(g: pa.Table) -> pa.Table:
            total = int(pc.sum(g["val"]).as_py() or 0)
            return pa.table({"node": g["node"].slice(0, 1),
                             "pm": pa.array([base + (dp * total) // 100],
                                            pa.int64())})

        state = (contribs.union(zero_rows).groupby("node")
                 .map_groups(fold, batch_format="pyarrow").materialize())

    return state.map_batches(
        lambda b: pa.table({"node": b["node"], "pr_scaled": b["pm"]}),
        batch_format="pyarrow")



def personalized_pagerank_scaled(edges, src_col: str = "subj_id",
                                 dst_col: str = "obj_id", n_seeds: int = 2,
                                 n_iters: int = 5, damping_pct: int = 85):
    """Personalized PageRank (random walk with restart) — pagerank_scaled
    with the teleport mass concentrated on a seed set instead of uniform:

        S          = the n_seeds smallest node ids (deterministic, so the
                     unrolled-CTE oracle derives the same set)
        pm0[v]     = PR_SCALE // |S|  if v ∈ S else 0
        base[v]    = ((100−dp)·PR_SCALE) // (100·|S|)  if v ∈ S else 0
        pm'[v]     = base[v] + (dp · Σ contrib) // 100

    Same int64 op chain, dangling mass dropped, two groupby shuffles per
    iteration.  The seed set is tiny by definition (a personalization
    vector), so holding it in the fold closure is a broadcast, not a
    driver materialization of data.  Returns (node, ppr_scaled int64).
    Reference analog: the restart-biased neighborhood scoring the linking
    stage's candidate ranker approximates lexically."""
    def orient(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        return pa.table({"s": pa.array(u[keep], pa.int64()),
                         "d": pa.array(v[keep], pa.int64())})

    dedges = (edges.map_batches(orient, batch_format="pyarrow")
              .groupby(["s", "d"]).aggregate(Count(alias_name="_m"))
              .drop_columns(["_m"]).materialize())

    def nodes_of(b: pa.Table) -> pa.Table:
        both = np.concatenate([b["s"].to_numpy(zero_copy_only=False),
                               b["d"].to_numpy(zero_copy_only=False)])
        return pa.table({"node": pa.array(np.unique(both), pa.int64())})

    nodes = (dedges.map_batches(nodes_of, batch_format="pyarrow")
             .groupby("node").aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"]).materialize())
    if nodes.count() == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "ppr_scaled": pa.array([], pa.int64())}))
    from deepkg_ray.util import rows_all
    seeds = frozenset(
        r["node"] for r in rows_all(nodes.sort("node").limit(n_seeds)))
    s_cnt = len(seeds)
    pm0 = PR_SCALE // s_cnt
    base = ((100 - damping_pct) * PR_SCALE) // (100 * s_cnt)
    dp = damping_pct

    def zero_row(b: pa.Table) -> pa.Table:
        z = np.zeros(b.num_rows, dtype=np.int64)
        return pa.table({"node": b["node"], "val": pa.array(z, pa.int64())})
    zero_rows = nodes.map_batches(zero_row,
                                  batch_format="pyarrow").materialize()

    def init_state(b: pa.Table) -> pa.Table:
        nd = b["node"].to_numpy()
        pm = np.where(np.isin(nd, np.fromiter(seeds, np.int64)), pm0, 0)
        return pa.table({"node": b["node"],
                         "pm": pa.array(pm.astype(np.int64))})
    state = nodes.map_batches(init_state, batch_format="pyarrow")

    for _ in range(n_iters):
        st_rows = state.map_batches(
            lambda b: pa.table({"node": b["node"], "peer": b["pm"],
                                "is_edge": pa.array(
                                    np.zeros(b.num_rows, dtype=bool))}),
            batch_format="pyarrow")
        ed_rows = dedges.map_batches(
            lambda b: pa.table({"node": b["s"], "peer": b["d"],
                                "is_edge": pa.array(
                                    np.ones(b.num_rows, dtype=bool))}),
            batch_format="pyarrow")

        def scatter(g: pa.Table) -> pa.Table:
            is_edge = g["is_edge"].to_numpy(zero_copy_only=False)
            peer = g["peer"].to_numpy(zero_copy_only=False)
            pm = int(peer[~is_edge][0])
            dst = peer[is_edge]
            if len(dst) == 0:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "val": pa.array([], pa.int64())})
            contrib = pm // len(dst)
            return pa.table({"node": pa.array(dst, pa.int64()),
                             "val": pa.array(
                                 np.full(len(dst), contrib, np.int64))})

        contribs = (st_rows.union(ed_rows).groupby("node")
                    .map_groups(scatter, batch_format="pyarrow"))

        def fold(g: pa.Table) -> pa.Table:
            node = int(g["node"][0].as_py())
            total = int(pc.sum(g["val"]).as_py() or 0)
            b0 = base if node in seeds else 0
            return pa.table({"node": g["node"].slice(0, 1),
                             "pm": pa.array([b0 + (dp * total) // 100],
                                            pa.int64())})

        state = (contribs.union(zero_rows).groupby("node")
                 .map_groups(fold, batch_format="pyarrow").materialize())

    return state.map_batches(
        lambda b: pa.table({"node": b["node"], "ppr_scaled": b["pm"]}),
        batch_format="pyarrow")


HITS_SCALE = 10**6


def eigenvector_scaled(edges, src_col: str = "subj_id",
                       dst_col: str = "obj_id", n_iters: int = 3,
                       scale: int = HITS_SCALE):
    """Fixed-iteration eigenvector centrality over the UNDIRECTED simple
    graph: power iteration x' = A·x with integer max-normalization per
    round — hits_scaled's convention restricted to ONE half-step per
    iteration on the symmetrized edge set (for symmetric A the hub and
    authority updates coincide, so this is the remaining member of the
    spectral family: PageRank damps, HITS alternates, eigenvector
    iterates pure A·x):

        x0       = scale
        raw(v)   = Σ_{u~v} x[u]
        x[v]     = (raw·scale) // max(raw)

    Overflow bound: raw·scale < 2^63 requires maxdeg < 9.2e6
    (hits_scaled's documented partitioning assumption).  Each round is
    one join-free scatter (state ∪ symmetric edges grouped by the
    scatter key) + one node-keyed Sum; the normalizer is a scalar max.
    Returns (node, eig_scaled)."""
    import ray.data as rd
    from ray.data.aggregate import Sum as RSum

    def orient(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"lo": pa.array(np.minimum(u, v), pa.int64()),
                         "hi": pa.array(np.maximum(u, v), pa.int64())})

    und = (edges.map_batches(orient, batch_format="pyarrow")
           .groupby(["lo", "hi"]).aggregate(Count(alias_name="_m"))
           .drop_columns(["_m"]))

    def bidir(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        return pa.table({
            "s": pa.array(np.concatenate([lo, hi]), pa.int64()),
            "d": pa.array(np.concatenate([hi, lo]), pa.int64())})

    dedges = und.map_batches(bidir, batch_format="pyarrow").materialize()

    def nodes_of(b: pa.Table) -> pa.Table:
        return pa.table({"node": pa.array(
            np.unique(b["s"].to_numpy(zero_copy_only=False)), pa.int64())})

    nodes = (dedges.map_batches(nodes_of, batch_format="pyarrow")
             .groupby("node").aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"]).materialize())
    if nodes.count() == 0:
        empty = pa.array([], pa.int64())
        return rd.from_arrow(pa.table({"node": empty,
                                       "eig_scaled": empty}))

    zero_rows = nodes.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "val": pa.array(np.zeros(b.num_rows,
                                                     np.int64))}),
        batch_format="pyarrow").materialize()

    state = nodes.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "v": pa.array(np.full(b.num_rows, scale,
                                                  np.int64))}),
        batch_format="pyarrow").materialize()

    for _ in range(n_iters):
        st_rows = state.map_batches(
            lambda b: pa.table({"node": b["node"], "peer": b["v"],
                                "is_edge": pa.array(
                                    np.zeros(b.num_rows, dtype=bool))}),
            batch_format="pyarrow")
        ed_rows = dedges.map_batches(
            lambda b: pa.table({"node": b["s"], "peer": b["d"],
                                "is_edge": pa.array(
                                    np.ones(b.num_rows, dtype=bool))}),
            batch_format="pyarrow")

        def scatter(g: pa.Table) -> pa.Table:
            is_edge = g["is_edge"].to_numpy(zero_copy_only=False)
            pv = g["peer"].to_numpy(zero_copy_only=False)
            val = int(pv[~is_edge][0])
            dst = pv[is_edge]
            return pa.table({"node": pa.array(dst, pa.int64()),
                             "val": pa.array(
                                 np.full(len(dst), val, np.int64))})

        raw = (st_rows.union(ed_rows).groupby("node").map_groups(
            scatter, batch_format="pyarrow")
            .union(zero_rows).groupby("node")
            .aggregate(RSum("val", alias_name="raw")).materialize())
        mx = int(raw.max("raw") or 0)

        def norm(b: pa.Table, mx=mx) -> pa.Table:
            r = b["raw"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = (r * scale) // mx if mx > 0 else np.zeros(len(r),
                                                          np.int64)
            return pa.table({"node": b["node"],
                             "v": pa.array(v, pa.int64())})

        state = raw.map_batches(norm, batch_format="pyarrow") \
            .materialize()

    return state.map_batches(
        lambda b: pa.table({"node": b["node"], "eig_scaled": b["v"]}),
        batch_format="pyarrow")


def hits_scaled(edges, src_col: str = "subj_id", dst_col: str = "obj_id",
                n_iters: int = 3, scale: int = HITS_SCALE):
    """Fixed-iteration HITS (hubs & authorities) over the simple directed
    graph, ALL arithmetic in int64 units of 1/scale so engine and
    unrolled-CTE SQL agree bitwise (pagerank_scaled's convention, with
    max-normalization replacing the damping fold):

        h0            = scale
        a_raw(v)      = Σ_{u→v} h[u];  a[v] = (a_raw·scale) // max(a_raw)
        h_raw(u)      = Σ_{u→v} a[v];  h[u] = (h_raw·scale) // max(h_raw)

    Overflow bound: raw ≤ scale·maxdeg and raw·scale < 2^63 requires
    maxdeg < 9.2e6 — documented partitioning assumption.  Each
    half-iteration is one join-free scatter (state ∪ edges, grouped by the
    scatter key) + one node-keyed Sum; the normalizer is a scalar max over
    the node-shaped state, never row-shaped.  Returns
    (node, hub_scaled, auth_scaled)."""
    import ray.data as rd
    from ray.data.aggregate import Sum as RSum

    def orient(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        return pa.table({"s": pa.array(u[keep], pa.int64()),
                         "d": pa.array(v[keep], pa.int64())})

    dedges = (edges.map_batches(orient, batch_format="pyarrow")
              .groupby(["s", "d"]).aggregate(Count(alias_name="_m"))
              .drop_columns(["_m"]).materialize())

    def nodes_of(b: pa.Table) -> pa.Table:
        both = np.concatenate([b["s"].to_numpy(zero_copy_only=False),
                               b["d"].to_numpy(zero_copy_only=False)])
        return pa.table({"node": pa.array(np.unique(both), pa.int64())})

    nodes = (dedges.map_batches(nodes_of, batch_format="pyarrow")
             .groupby("node").aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"]).materialize())
    if nodes.count() == 0:
        empty = pa.array([], pa.int64())
        return rd.from_arrow(pa.table({"node": empty, "hub_scaled": empty,
                                       "auth_scaled": empty}))

    zero_rows = nodes.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "val": pa.array(np.zeros(b.num_rows, np.int64))}),
        batch_format="pyarrow").materialize()

    def half_step(state, key, out):
        """Scatter state values along edges keyed by ``key`` (s: along
        out-edges to d; d: along in-edges to s), sum per receiving node,
        max-normalize back to ``scale``."""
        peer = "d" if key == "s" else "s"
        st_rows = state.map_batches(
            lambda b: pa.table({"node": b["node"], "peer": b["v"],
                                "is_edge": pa.array(
                                    np.zeros(b.num_rows, dtype=bool))}),
            batch_format="pyarrow")
        ed_rows = dedges.map_batches(
            lambda b, key=key, peer=peer: pa.table(
                {"node": b[key], "peer": b[peer],
                 "is_edge": pa.array(np.ones(b.num_rows, dtype=bool))}),
            batch_format="pyarrow")

        def scatter(g: pa.Table) -> pa.Table:
            is_edge = g["is_edge"].to_numpy(zero_copy_only=False)
            pv = g["peer"].to_numpy(zero_copy_only=False)
            val = int(pv[~is_edge][0])
            dst = pv[is_edge]
            return pa.table({"node": pa.array(dst, pa.int64()),
                             "val": pa.array(
                                 np.full(len(dst), val, np.int64))})

        raw = (st_rows.union(ed_rows).groupby("node").map_groups(
            scatter, batch_format="pyarrow")
            .union(zero_rows).groupby("node")
            .aggregate(RSum("val", alias_name="raw")).materialize())
        mx = int(raw.max("raw") or 0)

        def norm(b: pa.Table, mx=mx) -> pa.Table:
            r = b["raw"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = (r * scale) // mx if mx > 0 else np.zeros(len(r), np.int64)
            return pa.table({"node": b["node"],
                             out: pa.array(v, pa.int64())})
        return raw.map_batches(norm, batch_format="pyarrow").materialize()

    h = nodes.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "v": pa.array(np.full(b.num_rows, scale,
                                                  np.int64))}),
        batch_format="pyarrow").materialize()
    a = None
    for _ in range(n_iters):
        a = half_step(h, "s", "v")          # authorities from hubs
        h = half_step(a, "d", "v")          # hubs from authorities

    def tag(ds, name):
        return ds.map_batches(
            lambda b, name=name: pa.table(
                {"node": b["node"], "which": pa.array(
                    np.full(b.num_rows, 0 if name == "hub" else 1, np.int8)),
                 "val": b["v"]}), batch_format="pyarrow")

    def fold(g: pa.Table) -> pa.Table:
        w = g["which"].to_numpy(zero_copy_only=False)
        v = g["val"].to_numpy(zero_copy_only=False)
        return pa.table({"node": g["node"].slice(0, 1),
                         "hub_scaled": pa.array([int(v[w == 0][0])],
                                                pa.int64()),
                         "auth_scaled": pa.array([int(v[w == 1][0])],
                                                 pa.int64())})

    return (tag(h, "hub").union(tag(a, "auth"))
            .groupby("node").map_groups(fold, batch_format="pyarrow"))


def katz_scaled(edges, src_col: str = "subj_id", dst_col: str = "obj_id",
                n_iters: int = 3, alpha_num: int = 1, alpha_den: int = 5,
                scale: int = HITS_SCALE):
    """Fixed-iteration Katz centrality over the simple directed graph,
    ALL arithmetic in int64 units of 1/scale so the engine and the
    unrolled-CTE SQL oracle agree bitwise (the remaining member of the
    spectral family next to eigenvector_scaled / hits_scaled: Katz adds a
    per-node β source term instead of normalizing, so prestige flows along
    in-edges but every node keeps a baseline):

        x0(v)     = scale                       (β = 1 in scaled units)
        x_t+1(v)  = scale + (α_num · Σ_{u→v} x_t(u)) // α_den

    α = α_num/α_den = 0.2 by default — inside the convergence radius
    whenever α < 1/λ_max.  Overflow bound: with α=0.2 and T=3 iterations
    x ≤ scale·(1 + D/5 + (D/5)² + (D/5)³) for max in-degree D, so
    D < 2×10⁴ keeps everything < 2^63 — documented partitioning
    assumption, far above the synth KG's degrees.  Each round is one
    join-free scatter (state ∪ edges grouped by the destination key) +
    one node-keyed Sum; no driver-side state beyond the loop counter.
    Returns (node, katz_scaled)."""
    import ray.data as rd
    from ray.data.aggregate import Sum as RSum

    def orient(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        return pa.table({"s": pa.array(u[keep], pa.int64()),
                         "d": pa.array(v[keep], pa.int64())})

    dedges = (edges.map_batches(orient, batch_format="pyarrow")
              .groupby(["s", "d"]).aggregate(Count(alias_name="_m"))
              .drop_columns(["_m"]).materialize())

    def nodes_of(b: pa.Table) -> pa.Table:
        both = np.concatenate([b["s"].to_numpy(zero_copy_only=False),
                               b["d"].to_numpy(zero_copy_only=False)])
        return pa.table({"node": pa.array(np.unique(both), pa.int64())})

    nodes = (dedges.map_batches(nodes_of, batch_format="pyarrow")
             .groupby("node").aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"]).materialize())
    if nodes.count() == 0:
        empty = pa.array([], pa.int64())
        return rd.from_arrow(pa.table({"node": empty,
                                       "katz_scaled": empty}))

    zero_rows = nodes.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "val": pa.array(np.zeros(b.num_rows,
                                                     np.int64))}),
        batch_format="pyarrow").materialize()

    state = nodes.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "v": pa.array(np.full(b.num_rows, scale,
                                                  np.int64))}),
        batch_format="pyarrow").materialize()

    for _ in range(n_iters):
        st_rows = state.map_batches(
            lambda b: pa.table({"node": b["node"], "peer": b["v"],
                                "is_edge": pa.array(
                                    np.zeros(b.num_rows, dtype=bool))}),
            batch_format="pyarrow")
        ed_rows = dedges.map_batches(
            lambda b: pa.table({"node": b["s"], "peer": b["d"],
                                "is_edge": pa.array(
                                    np.ones(b.num_rows, dtype=bool))}),
            batch_format="pyarrow")

        def scatter(g: pa.Table) -> pa.Table:
            is_edge = g["is_edge"].to_numpy(zero_copy_only=False)
            pv = g["peer"].to_numpy(zero_copy_only=False)
            val = int(pv[~is_edge][0])
            dst = pv[is_edge]
            return pa.table({"node": pa.array(dst, pa.int64()),
                             "val": pa.array(
                                 np.full(len(dst), val, np.int64))})

        raw = (st_rows.union(ed_rows).groupby("node").map_groups(
            scatter, batch_format="pyarrow")
            .union(zero_rows).groupby("node")
            .aggregate(RSum("val", alias_name="raw")))

        def fold(b: pa.Table) -> pa.Table:
            r = b["raw"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = scale + (alpha_num * r) // alpha_den
            return pa.table({"node": b["node"],
                             "v": pa.array(v, pa.int64())})

        state = raw.map_batches(fold, batch_format="pyarrow").materialize()

    return state.map_batches(
        lambda b: pa.table({"node": b["node"], "katz_scaled": b["v"]}),
        batch_format="pyarrow")


def reciprocity(edges, src_col: str = "subj_id", dst_col: str = "obj_id"):
    """Edge reciprocity of the simple directed graph: the fraction of
    distinct s≠d edges whose reverse edge also exists.  One groupby over
    the UNORDERED pair key — each group holds ≤2 direction rows, so a pair
    is reciprocal iff its group has both; nothing heavier than the edge
    dedup ever shuffles.  Returns one row
    (n_edges, n_reciprocal, reciprocity=round6)."""
    from deepkg_ray.functions.numeric import round6

    def orient(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"lo": pa.array(np.minimum(u, v), pa.int64()),
                         "hi": pa.array(np.maximum(u, v), pa.int64()),
                         "fwd": pa.array(u < v)})

    def per_pair(g: pd.DataFrame) -> pd.DataFrame:
        dirs = g["fwd"].nunique()
        return pd.DataFrame({"n_edges": [np.int64(dirs)],
                             "n_reciprocal": [np.int64(2 if dirs == 2 else 0)]})

    partials = (edges.map_batches(orient, batch_format="pyarrow")
                .groupby(["lo", "hi"]).map_groups(per_pair,
                                                  batch_format="pandas"))

    def total(df: pd.DataFrame) -> pd.DataFrame:
        ne = np.int64(df["n_edges"].sum())
        nr = np.int64(df["n_reciprocal"].sum())
        r = float(round6(np.array([nr / ne]))[0]) if ne else 0.0
        return pd.DataFrame({"n_edges": [ne], "n_reciprocal": [nr],
                             "reciprocity": [r]})
    return partials.repartition(1).map_batches(total, batch_format="pandas",
                                               batch_size=None)


# ---------------------------------------------------------- KG graph stats --

def node_degrees(edges, src_col: str = "subj_id", dst_col: str = "obj_id"):
    """Undirected degree per node over a (possibly multi-) edge table:
    distinct-neighbor degree, shuffled by vertex id.

    Plan: per-batch LOCAL (node, peer) dedup (cheap combiner — shrinks the
    shuffle), one distributed (node, peer) dedup groupby, then a vectorized
    Count per node — no per-group Python frames."""
    def bidirect_dedup(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = np.unique(np.stack([np.concatenate([u, v]),
                                    np.concatenate([v, u])], axis=1), axis=0)
        return pa.table({"node": pa.array(pairs[:, 0], pa.int64()),
                         "peer": pa.array(pairs[:, 1], pa.int64())})

    distinct = (edges.map_batches(bidirect_dedup, batch_format="pyarrow")
                .groupby(["node", "peer"]).aggregate(Count(alias_name="_m"))
                .drop_columns(["_m"]))
    deg = distinct.groupby("node").aggregate(Count(alias_name="degree"))

    def cast(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b["node"],
            "degree": b["degree"].combine_chunks().cast(pa.int64())})
    return deg.map_batches(cast, batch_format="pyarrow")


def link_prediction(edges, src_col: str = "subj_id",
                    dst_col: str = "obj_id", min_cn: int = 2,
                    max_degree: int | None = None,
                    num_partitions: int | None = None):
    """Structural link prediction over the undirected simple graph:
    for every non-adjacent pair (e1 < e2) sharing ≥ ``min_cn`` neighbors,
    emit common-neighbor count and the resource-allocation index
    RA = Σ_{z ∈ N(e1)∩N(e2)} 1/deg(z)  (Zhou, Lü & Zhang, EPJ B 2009 —
    the floor-stable cousin of Adamic-Adar: 1e6/deg is an exact-integer
    double division, so the micros convention hashes identically in SQL,
    where ln() could differ by an ulp and flip the floor).

    Plan: bidirected neighbor lists co-located per center vertex (one
    groupby), wedge pairs weighted by the center's 1e6/deg emitted inside
    the group, one (e1, e2) aggregate, then a distributed left_anti hash
    join removes already-connected pairs.  Hub centers emit deg²/2 wedge
    rows — pass ``max_degree`` to drop super-hub centers at scale (the
    standard LP truncation; default None matches the exact oracle).
    Returns (e1, e2, cn, ra)."""
    if num_partitions is None:
        from deepkg_ray.util import join_partitions, rows_all
        num_partitions = join_partitions()

    def bidirect(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({
            "node": pa.array(np.concatenate([u, v]), pa.int64()),
            "peer": pa.array(np.concatenate([v, u]), pa.int64())})

    bidir = edges.map_batches(bidirect, batch_format="pyarrow")

    # node-complete coarse partitions: one task processes MANY centers
    # (one-task-per-node map_groups drowned 180-node graphs in per-task
    # overhead; hub balance comes from the hash spread)
    def add_part(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy(zero_copy_only=False)
        return b.append_column("part", pa.array(
            (node % np.int64(64)).astype(np.int32)))

    def wedge_partition(g: pa.Table) -> pa.Table:
        node = g["node"].to_numpy(zero_copy_only=False)
        peer = g["peer"].to_numpy(zero_copy_only=False)
        if len(peer):
            assert peer.min() >= 0 and peer.max() < 2**31, \
                "pair packing requires node ids in [0, 2^31)"
        order = np.lexsort((peer, node))
        node, peer = node[order], peer[order]
        # per-center distinct peers: drop duplicate (node, peer) runs
        first = np.ones(len(node), bool)
        first[1:] = (node[1:] != node[:-1]) | (peer[1:] != peer[:-1])
        node, peer = node[first], peer[first]
        starts = np.nonzero(np.concatenate(
            ([True], node[1:] != node[:-1])))[0]
        ends = np.concatenate((starts[1:], [len(node)]))
        e1o, e2o, wmo = [], [], []
        for s, e in zip(starts, ends):
            deg = e - s
            if deg < 2 or (max_degree is not None and deg > max_degree):
                continue
            wm = np.int64(np.floor(1e6 / deg + 0.5))
            ai, bi = np.triu_indices(deg, k=1)
            p = peer[s:e]
            e1o.append(p[ai])
            e2o.append(p[bi])
            wmo.append(np.full(len(ai), wm, np.int64))
        if not e1o:
            return pa.table({"e1": pa.array([], pa.int64()),
                             "e2": pa.array([], pa.int64()),
                             "cn": pa.array([], pa.int64()),
                             "ra_micros": pa.array([], pa.int64())})
        e1c = np.concatenate(e1o)
        e2c = np.concatenate(e2o)
        wmc = np.concatenate(wmo)
        # local combiner: fold duplicate (e1, e2) wedges inside the task
        # (ids < 2^31 — packing bound shared with the anti-join tier)
        key = e1c * PACK + e2c
        uk, inv = np.unique(key, return_inverse=True)
        cn = np.bincount(inv).astype(np.int64)
        wm_sum = np.bincount(inv, weights=wmc.astype(np.float64)) \
            .astype(np.int64)
        return pa.table({
            "e1": pa.array((uk // PACK).astype(np.int64), pa.int64()),
            "e2": pa.array((uk % PACK).astype(np.int64), pa.int64()),
            "cn": pa.array(cn, pa.int64()),
            "ra_micros": pa.array(wm_sum, pa.int64())})

    from deepkg_ray.stages.treeagg import merge_partials
    cand = merge_partials(
        bidir.map_batches(add_part, batch_format="pyarrow")
        .groupby("part").map_groups(wedge_partition,
                                    batch_format="pyarrow"),
        ["e1", "e2"], {"cn": "sum", "ra_micros": "sum"}, mode="auto")

    def keep_min_cn(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(
            b["cn"].combine_chunks().cast(pa.int64()),
            pa.scalar(min_cn)))
    cand = cand.map_batches(keep_min_cn, batch_format="pyarrow")

    def orient(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        if len(lo):
            assert lo.min() >= 0 and hi.max() < 2**31, \
                "pair packing requires node ids in [0, 2^31)"
        packed = np.unique(lo * PACK + hi)
        return pa.table({"packed": pa.array(packed, pa.int64())})

    simple_packed = merge_partials(
        edges.map_batches(orient, batch_format="pyarrow")
        .map_batches(lambda b: b.append_column(
            "_n", pa.array(np.ones(b.num_rows, np.int64))),
            batch_format="pyarrow"),
        ["packed"], {"_n": "sum"}, mode="auto").materialize()

    from deepkg_ray.util import drop_empty_blocks
    n_edges = simple_packed.count()
    if n_edges <= 2_000_000:
        # dictionary-bounded tier: broadcast the packed edge set and
        # filter the candidate stream — no join actors
        import ray
        ep = np.sort(simple_packed.to_pandas()["packed"]
                     .to_numpy(np.int64))
        ep_ref = ray.put(ep)

        def anti(b: pa.Table) -> pa.Table:
            edges_arr = ray.get(ep_ref)
            key = b["e1"].to_numpy(zero_copy_only=False) * PACK \
                + b["e2"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(edges_arr, key)
            pos_c = np.clip(pos, 0, max(len(edges_arr) - 1, 0))
            hit = (len(edges_arr) > 0) & (edges_arr[pos_c] == key)
            return b.filter(pa.array(~hit))

        new_pairs = drop_empty_blocks(cand).map_batches(
            anti, batch_format="pyarrow")
    else:
        simple = simple_packed.map_batches(
            lambda b: pa.table({
                "e1": pa.array(b["packed"].to_numpy(
                    zero_copy_only=False) // PACK, pa.int64()),
                "e2": pa.array(b["packed"].to_numpy(
                    zero_copy_only=False) % PACK, pa.int64())}),
            batch_format="pyarrow")
        new_pairs = drop_empty_blocks(cand).join(
            drop_empty_blocks(simple), join_type="left_anti",
            num_partitions=num_partitions, on=("e1", "e2"))

    def finish(b: pa.Table) -> pa.Table:
        ra = np.asarray(b["ra_micros"].to_pylist(), np.float64) / 1e6
        return pa.table({"e1": b["e1"], "e2": b["e2"],
                         "cn": b["cn"].combine_chunks().cast(pa.int64()),
                         "ra": pa.array(ra, pa.float64())})
    return new_pairs.map_batches(finish, batch_format="pyarrow")


def truss_edges(edges, k: int = 3, src_col: str = "subj_id",
                dst_col: str = "obj_id", max_iters: int = 8,
                num_partitions: int | None = None,
                driver_threshold: int = 200_000):
    """k-truss peeling over the undirected simple graph: iteratively drop
    every edge whose support (triangles containing it within the CURRENT
    edge set) is < k−2, to fixpoint — the edge-cohesion analog of k-core
    (node degrees), and a strictly stronger community filter.

    Each round reuses the link-prediction wedge machinery: neighbor lists
    co-located per center (one groupby), wedge pairs emitted inside the
    group, a (p1, p2) Count, then an INNER hash join back onto the edge
    set (support of an edge = wedges matching it) and a support filter.
    Rounds stop at fixpoint (edge count unchanged — one scalar count per
    round on the driver, never rows); ``max_iters`` bounds the cascade
    and an assertion documents non-convergence instead of silently
    returning a non-truss.  Hub wedge fan-out is deg²/2 per center —
    at scale compose with the same max_degree truncation as
    link_prediction (here the oracle unrolls the exact semantics, so no
    cap).  Returns the surviving (e1, e2) edges."""
    # support-0 edges never reach the wedge aggregate, so the INNER join
    # below implements "< min_sup drops them" only when min_sup ≥ 1
    assert k >= 3, "k-truss requires k >= 3 (k=2 is the whole simple graph)"
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()
    from deepkg_ray.util import drop_empty_blocks

    def orient(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"e1": pa.array(np.minimum(u, v), pa.int64()),
                         "e2": pa.array(np.maximum(u, v), pa.int64())})

    cur = (edges.map_batches(orient, batch_format="pyarrow")
           .groupby(["e1", "e2"]).aggregate(Count(alias_name="_m"))
           .drop_columns(["_m"]).materialize())
    n_edges = cur.count()
    min_sup = k - 2

    # driver tier (same auto-routing convention as scc_components /
    # connected_components): below the threshold each peeling round is a
    # fixed-cost Ray join+groupby on a driver-sized edge set — peel
    # locally instead.  The distributed path remains the scale tier and
    # is exercised by tests via a forced-zero threshold.
    if n_edges <= driver_threshold:
        import ray.data as rd
        ed = cur.to_pandas()
        pairs = set(zip(ed["e1"].tolist(), ed["e2"].tolist()))
        while True:
            nbrs: dict[int, set[int]] = {}
            for a, b in pairs:
                nbrs.setdefault(a, set()).add(b)
                nbrs.setdefault(b, set()).add(a)
            nxt = {(a, b) for (a, b) in pairs
                   if len(nbrs[a] & nbrs[b]) >= min_sup}
            if nxt == pairs:
                break
            pairs = nxt
        if pairs:
            arr = np.array(sorted(pairs), np.int64)
            return rd.from_arrow(pa.table({
                "e1": pa.array(arr[:, 0], pa.int64()),
                "e2": pa.array(arr[:, 1], pa.int64())}))
        return rd.from_arrow(pa.table({"e1": pa.array([], pa.int64()),
                                       "e2": pa.array([], pa.int64())}))

    def bidirect(b: pa.Table) -> pa.Table:
        u = b["e1"].to_numpy(zero_copy_only=False)
        v = b["e2"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.concatenate([u, v]), pa.int64()),
            "peer": pa.array(np.concatenate([v, u]), pa.int64())})

    def wedge_pairs(g: pa.Table) -> pa.Table:
        peers = np.unique(g["peer"].to_numpy(zero_copy_only=False))
        if len(peers) < 2:
            return pa.table({"e1": pa.array([], pa.int64()),
                             "e2": pa.array([], pa.int64())})
        ai, bi = np.triu_indices(len(peers), k=1)
        return pa.table({"e1": pa.array(peers[ai], pa.int64()),
                         "e2": pa.array(peers[bi], pa.int64())})

    for _ in range(max_iters):
        if n_edges == 0:
            break
        support = (cur.map_batches(bidirect, batch_format="pyarrow")
                   .groupby("node").map_groups(wedge_pairs,
                                               batch_format="pyarrow")
                   .groupby(["e1", "e2"]).aggregate(Count(alias_name="sup"))
                   .map_batches(
                       lambda b: b.rename_columns(["s1", "s2", "sup"]),
                       batch_format="pyarrow")).materialize()
        if support.count() == 0:
            # no wedges at all: every remaining edge has support 0 < k−2
            import ray.data as rd
            return rd.from_arrow(pa.table({"e1": pa.array([], pa.int64()),
                                           "e2": pa.array([], pa.int64())}))
        survivors = drop_empty_blocks(cur).join(
            drop_empty_blocks(support), join_type="inner",
            num_partitions=num_partitions,
            on=("e1", "e2"), right_on=("s1", "s2"))

        def keep_sup(b: pa.Table) -> pa.Table:
            kept = b.filter(pc.greater_equal(b["sup"], pa.scalar(min_sup)))
            return kept.select(["e1", "e2"])

        nxt = survivors.map_batches(keep_sup,
                                    batch_format="pyarrow").materialize()
        n_next = nxt.count()
        if n_next == n_edges:
            return nxt
        cur, n_edges = nxt, n_next
    assert n_edges == 0, (
        f"k-truss did not converge within {max_iters} rounds "
        f"({n_edges} edges still changing)")
    return cur


def triangle_count(edges, src_col: str = "subj_id", dst_col: str = "obj_id",
                   num_partitions: int | None = None):
    """Global triangle count over the undirected simple graph induced by the
    edge table.  Orientation: each undirected edge kept once as (lo, hi);
    wedges built per lo-vertex inside a groupby (adjacency lists co-located
    by vertex), then a hash join probes whether each wedge's closing edge
    exists.  Returns a 1-row Dataset {n_triangles}."""
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()

    def orient(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v                       # drop self-loops
        u, v = u[keep], v[keep]
        return pa.table({"lo": pa.array(np.minimum(u, v), pa.int64()),
                         "hi": pa.array(np.maximum(u, v), pa.int64())})

    simple = (edges.map_batches(orient, batch_format="pyarrow")
              .groupby(["lo", "hi"]).aggregate(Count(alias_name="_m"))
              .drop_columns(["_m"]).materialize())

    def wedges(g: pa.Table) -> pa.Table:
        # explicit-schema Arrow output: empty pandas blocks drop their
        # schema and break the downstream hash join's key resolution
        hi = np.sort(g["hi"].to_numpy(zero_copy_only=False))
        if len(hi) < 2:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        ai, bi = np.triu_indices(len(hi), k=1)
        return pa.table({"lo": pa.array(hi[ai], pa.int64()),
                         "hi": pa.array(hi[bi], pa.int64())})

    wedge_ds = simple.groupby("lo").map_groups(
        wedges, batch_format="pyarrow").materialize()
    import ray.data as rd
    if wedge_ds.count() == 0:      # all-empty left side breaks the hash join
        return rd.from_items([{"n_triangles": 0}])
    from deepkg_ray.util import drop_empty_blocks
    closed = drop_empty_blocks(wedge_ds).join(
        drop_empty_blocks(simple), join_type="inner",
        num_partitions=num_partitions, on=("lo", "hi"))
    return rd.from_items([{"n_triangles": closed.count()}])


def kcore_nodes(edges, k: int = 3, src_col: str = "subj_id",
                dst_col: str = "obj_id", mode: str = "broadcast",
                max_rounds: int = 64, num_partitions: int | None = None):
    """Nodes of the k-core of the undirected simple graph induced by the
    edge table: iterative peeling (drop nodes with degree < k until stable).
    Returns a Dataset (node, degree) with the IN-CORE degree (all ≥ k).

    Each round is one degree aggregation (bidirect + groupby Count — a
    simple edge list has distinct neighbors by construction) plus an
    endpoint filter.  The alive-node count is monotone nonincreasing, so an
    unchanged count IS the fixpoint.  mode='broadcast' ships the alive-node
    id array via ray.put and masks edges with np.isin (right while the
    node DICTIONARY is driver-sized — entity vocabularies are); mode='join'
    semi-joins both endpoints with hash-partitioned Dataset.joins, nothing
    node-sized on the driver (the open-graph 100-TB path).  Oracle:
    oracle.kg_kcore_oracle (unrolled peel rounds; peeling is monotone so
    surplus SQL rounds are no-ops)."""
    import ray
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()

    def orient(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"u": pa.array(np.minimum(u, v), pa.int64()),
                         "v": pa.array(np.maximum(u, v), pa.int64())})

    def bidirect(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([u, v]), pa.int64())})

    cur = (edges.map_batches(orient, batch_format="pyarrow")
           .groupby(["u", "v"]).aggregate(Count(alias_name="_m"))
           .drop_columns(["_m"]).materialize())
    prev_alive = -1
    for _ in range(max_rounds):
        deg = (cur.map_batches(bidirect, batch_format="pyarrow")
               .groupby("node").aggregate(Count(alias_name="degree"))
               .materialize())
        alive = deg.filter(expr=f"degree >= {k}").materialize()
        n_alive = alive.count()
        if n_alive == prev_alive:
            return alive
        prev_alive = n_alive
        if n_alive == 0:
            return alive
        if mode == "broadcast":
            ids_ref = ray.put(np.sort(
                alive.to_pandas()["node"].to_numpy(np.int64)))

            def keep_alive(b: pa.Table, ref=ids_ref) -> pa.Table:
                ids = ray.get(ref)
                u = b["u"].to_numpy(zero_copy_only=False)
                v = b["v"].to_numpy(zero_copy_only=False)
                m = (ids[np.searchsorted(ids, u.clip(ids[0], ids[-1]))] == u) \
                    & (ids[np.searchsorted(ids, v.clip(ids[0], ids[-1]))] == v)
                return b.filter(pa.array(m))

            cur = cur.map_batches(keep_alive,
                                  batch_format="pyarrow").materialize()
        else:
            # strip the 0-column empty blocks hash groupbys emit (see
            # util.drop_empty_blocks) from BOTH join inputs
            from deepkg_ray.util import drop_empty_blocks
            nodes = drop_empty_blocks(alive).drop_columns(["degree"])
            cur = drop_empty_blocks(cur).join(
                nodes.map_batches(lambda b: b.rename_columns(["u"]),
                                  batch_format="pyarrow"),
                join_type="inner", num_partitions=num_partitions, on=("u",))
            cur = cur.join(
                nodes.map_batches(lambda b: b.rename_columns(["v"]),
                                  batch_format="pyarrow"),
                join_type="inner", num_partitions=num_partitions,
                on=("v",)).materialize()
    return alive





def _tarjan_min_label(s: np.ndarray, d: np.ndarray) -> dict[int, int]:
    """Iterative Tarjan SCC over a driver-sized directed edge list;
    returns {node: min member of its SCC} (the same labeling the
    distributed FW-BW path and the recursive-closure oracle produce)."""
    adj: dict[int, list[int]] = {}
    nodes: set[int] = set()
    for a, b in zip(s.tolist(), d.tolist()):
        adj.setdefault(a, []).append(b)
        nodes.add(a)
        nodes.add(b)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    comp: dict[int, int] = {}
    counter = 0
    for root in nodes:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack.add(v)
            advanced = False
            for j in range(pi, len(adj.get(v, ()))):
                w = adj[v][j]
                if w not in index:
                    work[-1] = (v, j + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if low[v] == index[v]:
                scc = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    scc.append(w)
                    if w == v:
                        break
                m = min(scc)
                for w in scc:
                    comp[w] = m
            if work:
                pv, _ = work[-1]
                low[pv] = min(low[pv], low[v])
    return comp


def scc_components(edges, src_col: str = "subj_id", dst_col: str = "obj_id",
                   max_outer: int = 12, max_rounds: int = 32,
                   num_partitions: int | None = None,
                   driver_threshold: int = 500_000):
    """Strongly connected components of the DIRECTED simple graph via
    forward-backward min-label coloring (Orzan-style FW-BW, the standard
    distributed SCC): per outer round, (1) forward fixpoint lab[v] = min
    ancestor-or-self (join+Min rounds, monotone — Σlab unchanged ⇒
    fixpoint), (2) backward reach of each color root WITHIN its color
    class (intra-color edges only; count unchanged ⇒ fixpoint),
    (3) settle reached nodes with component = color root (an SCC is never
    split across colors: mutual reachability ⇒ identical ancestor sets ⇒
    identical min label; the settled root's component is exactly its
    SCC's minimum member), (4) remove settled nodes.  Nodes that lose all
    edges settle as singletons at the end.  Assertion documents
    non-termination instead of returning a partial labeling.

    Everything is join-shaped (nothing node-sized on the driver beyond
    per-round scalar convergence counters).  Returns (node, component)
    with component = min SCC member id, matching the recursive-closure
    SQL oracle (kg_scc_oracle)."""
    import ray.data as rd
    from ray.data.aggregate import Min
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()
    from deepkg_ray.util import drop_empty_blocks

    def orient(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        return pa.table({"s": pa.array(u[keep], pa.int64()),
                         "d": pa.array(v[keep], pa.int64())})

    active = (edges.map_batches(orient, batch_format="pyarrow")
              .groupby(["s", "d"]).aggregate(Count(alias_name="_m"))
              .drop_columns(["_m"]).materialize())

    def nodes_of(ds_edges):
        def both(b: pa.Table) -> pa.Table:
            nd = np.unique(np.concatenate(
                [b["s"].to_numpy(zero_copy_only=False),
                 b["d"].to_numpy(zero_copy_only=False)]))
            return pa.table({"node": pa.array(nd, pa.int64())})
        return (ds_edges.map_batches(both, batch_format="pyarrow")
                .groupby("node").aggregate(Count(alias_name="_c"))
                .drop_columns(["_c"]))

    all_nodes = nodes_of(active).materialize()
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "component": pa.array([], pa.int64())})
    if all_nodes.count() == 0:
        return rd.from_arrow(empty)

    # ---- driver tier: below the threshold the deduped edge list is
    # driver-sized and the FW-BW round structure is pure orchestration
    # overhead (each join+Min round costs a fixed Ray stage, ~30-60 rounds
    # total) — finish with one exact iterative Tarjan pass instead.  Same
    # auto-routing convention as connected_components' 1M-pair cut; the
    # distributed path stays the scale tier (and is exercised by tests via
    # a forced-low threshold).
    if active.count() <= driver_threshold:
        ed = active.to_pandas()
        comp = _tarjan_min_label(ed["s"].to_numpy(np.int64),
                                 ed["d"].to_numpy(np.int64))
        nodes = np.fromiter(comp.keys(), np.int64, len(comp))
        order = np.argsort(nodes)
        nodes = nodes[order]
        labels = np.fromiter(comp.values(), np.int64, len(comp))[order]
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.int64()),
            "component": pa.array(labels, pa.int64())}))

    settled_parts = []

    for _ in range(max_outer):
        if active.count() == 0:
            break
        nodes = nodes_of(active).materialize()
        n_nodes = nodes.count()

        # ---- forward min-label fixpoint: lab[v] = min(ancestors ∪ {v})
        lab = nodes.map_batches(
            lambda b: pa.table({"node": b["node"], "lab": b["node"]}),
            batch_format="pyarrow").materialize()
        s_prev = int(lab.sum("lab"))
        for _r in range(max_rounds):
            cand = drop_empty_blocks(active).join(
                drop_empty_blocks(lab), join_type="inner",
                num_partitions=num_partitions, on=("s",),
                right_on=("node",))
            prop = cand.map_batches(
                lambda b: pa.table({"node": b["d"], "lab": b["lab"]}),
                batch_format="pyarrow")
            lab = (prop.union(lab).groupby("node")
                   .aggregate(Min("lab", alias_name="lab")).materialize())
            s_now = int(lab.sum("lab"))
            if s_now == s_prev:
                break
            s_prev = s_now
        else:
            raise AssertionError("SCC forward fixpoint did not converge")

        # ---- intra-color edges: keep (s, d) where lab[s] == lab[d]
        lab_s = lab.map_batches(
            lambda b: b.rename_columns(["ns", "lab_s"]),
            batch_format="pyarrow")
        lab_d = lab.map_batches(
            lambda b: b.rename_columns(["nd", "lab_d"]),
            batch_format="pyarrow")
        es = drop_empty_blocks(active).join(
            drop_empty_blocks(lab_s), join_type="inner",
            num_partitions=num_partitions, on=("s",), right_on=("ns",))
        esd = drop_empty_blocks(es).join(
            drop_empty_blocks(lab_d), join_type="inner",
            num_partitions=num_partitions, on=("d",), right_on=("nd",))

        def intra(b: pa.Table) -> pa.Table:
            keep = pc.equal(b["lab_s"], b["lab_d"])
            return b.filter(keep).select(["s", "d"])
        el = esd.map_batches(intra, batch_format="pyarrow").materialize()

        # ---- backward reach of color roots within the color class
        reached = lab.map_batches(
            lambda b: b.filter(pc.equal(b["node"], b["lab"]))
            .select(["node"]),
            batch_format="pyarrow").materialize()
        n_prev = reached.count()
        # no intra-color edges ⇒ roots are already the whole reach set
        # (empty-left joins break pyarrow schema resolution; see
        # util.drop_empty_blocks)
        if el.count() > 0:
            for _r in range(max_rounds):
                cand = drop_empty_blocks(el).join(
                    drop_empty_blocks(reached), join_type="inner",
                    num_partitions=num_partitions, on=("d",),
                    right_on=("node",)).materialize()
                if cand.count() == 0:
                    break       # nothing flows into the reach set
                prop = cand.map_batches(
                    lambda b: pa.table({"node": b["s"]}),
                    batch_format="pyarrow")
                reached = (prop.union(reached).groupby("node")
                           .aggregate(Count(alias_name="_c"))
                           .drop_columns(["_c"]).materialize())
                n_now = reached.count()
                if n_now == n_prev:
                    break
                n_prev = n_now
            else:
                raise AssertionError(
                    "SCC backward fixpoint did not converge")

        # ---- settle: reached nodes, component = their color label
        settled = drop_empty_blocks(lab).join(
            drop_empty_blocks(reached.map_batches(
                lambda b: b.rename_columns(["rn"]),
                batch_format="pyarrow")),
            join_type="inner", num_partitions=num_partitions,
            on=("node",), right_on=("rn",)).map_batches(
            lambda b: pa.table({"node": b["node"], "component": b["lab"]}),
            batch_format="pyarrow").materialize()
        settled_parts.append(settled)

        # ---- remove settled nodes from the active graph (two anti-joins)
        sn = settled.map_batches(lambda b: b.select(["node"]),
                                 batch_format="pyarrow")
        empty_edges = rd.from_arrow(pa.table({
            "s": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}))
        a1 = drop_empty_blocks(active).join(
            drop_empty_blocks(sn), join_type="left_anti",
            num_partitions=num_partitions, on=("s",),
            right_on=("node",)).materialize()
        if a1.count() == 0:     # all-empty left breaks pyarrow joins
            active = empty_edges
            continue
        active = drop_empty_blocks(a1).join(
            drop_empty_blocks(sn), join_type="left_anti",
            num_partitions=num_partitions, on=("d",),
            right_on=("node",)).materialize()
    assert active.count() == 0, (
        f"SCC coloring did not terminate within {max_outer} outer rounds")

    out = settled_parts[0]
    for p in settled_parts[1:]:
        out = out.union(p)
    # nodes that lost every edge before being reached: singleton SCCs
    done = out.map_batches(lambda b: b.select(["node"]),
                           batch_format="pyarrow")
    leftover = drop_empty_blocks(all_nodes).join(
        drop_empty_blocks(done.map_batches(
            lambda b: b.rename_columns(["dn"]), batch_format="pyarrow")),
        join_type="left_anti", num_partitions=num_partitions,
        on=("node",), right_on=("dn",)).map_batches(
        lambda b: pa.table({"node": b["node"], "component": b["node"]}),
        batch_format="pyarrow")
    return out.union(leftover)


def sssp_weighted(edges, source: int | None = None,
                  src_col: str = "subj_id", dst_col: str = "obj_id",
                  weight_col: str = "weight", max_rounds: int = 16,
                  num_partitions: int | None = None):
    """Weighted single-source shortest paths (Bellman-Ford relaxation
    rounds) over the undirected simple graph with integer edge weights —
    the weighted complement of bfs_distances.  Edge weight of an unordered
    pair = min over its (pred, direction) parallel rows; ``source``
    defaults to the smallest node id (deterministic, oracle-derivable).

    Each round is one hash join (edges ⋈ state) + one Min-groupby —
    join-shaped like bfs_distances' mode='join', nothing node-sized on the
    driver.  The fold is monotone (dists only appear or decrease), so
    convergence is exactly "(node count, Σdist) unchanged" — two scalar
    aggregates per round; ``max_rounds`` bounds the relaxation and an
    assertion documents non-convergence instead of returning a non-SSSP.
    Returns (node, dist) over nodes reachable from the source."""
    import ray.data as rd
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()
    from deepkg_ray.util import drop_empty_blocks
    from ray.data.aggregate import Min

    def pairw(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v, w = u[keep], v[keep], w[keep]
        return pa.table({"a": pa.array(np.minimum(u, v), pa.int64()),
                         "b": pa.array(np.maximum(u, v), pa.int64()),
                         "w": pa.array(w, pa.int64())})

    pair = (edges.map_batches(pairw, batch_format="pyarrow")
            .groupby(["a", "b"]).aggregate(Min("w", alias_name="w")))

    def bidirect(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        w = b["w"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(np.concatenate([a, bb]), pa.int64()),
            "v": pa.array(np.concatenate([bb, a]), pa.int64()),
            "w": pa.array(np.concatenate([w, w]), pa.int64())})

    bi = pair.map_batches(bidirect, batch_format="pyarrow").materialize()
    if bi.count() == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "dist": pa.array([], pa.int64())}))
    if source is None:
        source = int(bi.min("u"))

    state = rd.from_arrow(pa.table({
        "node": pa.array([int(source)], pa.int64()),
        "dist": pa.array([0], pa.int64())})).materialize()
    n_prev, s_prev = 1, 0

    for _ in range(max_rounds):
        cand = drop_empty_blocks(bi).join(
            drop_empty_blocks(state), join_type="inner",
            num_partitions=num_partitions, on=("u",), right_on=("node",))

        def relax(b: pa.Table) -> pa.Table:
            return pa.table({
                "node": b["v"],
                "dist": pc.add(b["dist"].combine_chunks(),
                               b["w"].combine_chunks())})

        nxt = (cand.map_batches(relax, batch_format="pyarrow")
               .union(state)
               .groupby("node").aggregate(Min("dist", alias_name="dist"))
               .materialize())
        n_now, s_now = nxt.count(), int(nxt.sum("dist"))
        state = nxt
        if (n_now, s_now) == (n_prev, s_prev):
            return state          # monotone fold: unchanged ⇒ fixpoint
        n_prev, s_prev = n_now, s_now
    raise AssertionError(
        f"SSSP did not converge within {max_rounds} relaxation rounds")


def bfs_distances(edges, sources, src_col: str = "subj_id",
                  dst_col: str = "obj_id", mode: str = "broadcast",
                  max_rounds: int = 64, num_partitions: int | None = None):
    """Single/multi-source BFS hop distances over the undirected simple
    graph induced by the edge table.  Returns a Dataset (node, dist) for
    every node reachable from ``sources`` (sources at dist 0).

    mode='broadcast': classic frontier expansion — the frontier id array
    and the visited set live on the driver / in ray.put (right while the
    node DICTIONARY is driver-sized, as entity vocabularies are); each
    round is one map_batches edge scan, no shuffle at all.  mode='join':
    nothing node-sized on the driver — per round one hash join
    (edges ⋈ frontier) plus one min-groupby, the open-graph 100-TB path;
    convergence = unchanged reached-node count (monotone nondecreasing).
    Oracle: oracle.kg_bfs_oracle (unrolled min-fold rounds; BFS folds are
    monotone so surplus SQL rounds are no-ops)."""
    import ray
    import ray.data as rd
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()
    src_list = sorted({int(s) for s in sources})

    def bidirect(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"u": pa.array(np.concatenate([u, v]), pa.int64()),
                         "v": pa.array(np.concatenate([v, u]), pa.int64())})

    bi = edges.map_batches(bidirect, batch_format="pyarrow").materialize()

    if mode == "broadcast":
        dist: dict[int, int] = {s: 0 for s in src_list}
        frontier = np.asarray(src_list, np.int64)
        for d in range(1, max_rounds + 1):
            f_ref = ray.put(np.sort(frontier))

            def neighbors(b: pa.Table, ref=f_ref) -> pa.Table:
                f = ray.get(ref)
                u = b["u"].to_numpy(zero_copy_only=False)
                m = (f[np.searchsorted(f, u.clip(f[0], f[-1]))] == u)
                # per-batch unique keeps the driver collect bounded by the
                # node dictionary, not the edge count
                return pa.table({"v": pa.array(
                    np.unique(b["v"].to_numpy(zero_copy_only=False)[m]),
                    pa.int64())})

            nxt = np.unique(np.concatenate(
                [b["v"].to_numpy(zero_copy_only=False) for b in
                 bi.map_batches(neighbors, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow")] or
                [np.array([], np.int64)]))
            frontier = np.asarray([n for n in nxt if n not in dist], np.int64)
            if len(frontier) == 0:
                break
            for n in frontier:
                dist[int(n)] = d
        return rd.from_items([{"node": n, "dist": d}
                              for n, d in sorted(dist.items())])

    if mode != "join":
        raise ValueError(mode)
    dist_ds = rd.from_items([{"node": s, "dist": 0} for s in src_list])
    n_reached = len(src_list)

    def as_frontier(b: pa.Table) -> pa.Table:
        return pa.table({"u": b["node"], "dist": b["dist"]})

    def step(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["v"], "dist": pc.add(b["dist"], 1)})

    from deepkg_ray.util import drop_empty_blocks
    for _ in range(max_rounds):
        # groupby Min emits 0-column empty blocks that map_batches passes
        # through WITHOUT calling the UDF; strip them or the join's schema
        # resolution fails on right partitions that got only such shards
        stepped = (bi.join(
            drop_empty_blocks(dist_ds).map_batches(
                as_frontier, batch_format="pyarrow"),
            join_type="inner", num_partitions=num_partitions, on=("u",))
            .map_batches(step, batch_format="pyarrow"))
        dist_ds = (dist_ds.union(stepped).groupby("node")
                   .aggregate(Min("dist", alias_name="dist")).materialize())
        n = dist_ds.count()
        if n == n_reached:
            break
        n_reached = n
    return dist_ds


def label_propagation(edges, rounds: int = 4, src_col: str = "subj_id",
                      dst_col: str = "obj_id", mode: str = "broadcast",
                      num_partitions: int | None = None):
    """Deterministic synchronous label propagation (community detection)
    over the undirected SIMPLE graph induced by the edge table: labels
    start as node ids; each round every node adopts the most frequent
    label among its distinct neighbors, ties broken by the smaller label.
    Runs EXACTLY ``rounds`` synchronous rounds in both the engine and the
    unrolled-CTE oracle — synchronous LPA can 2-cycle on bipartite
    structures, so round-count parity (not convergence) is the contract;
    an exact fixpoint (labels unchanged) short-circuits safely since every
    further round is then the identity.

    mode='broadcast': the label array lives in ray.put (node dictionary is
    driver-sized, as entity vocabularies are); each round is one shuffle-
    free edge scan emitting (node, neighbor-label) count partials, tree-
    merged, argmax on the driver.  mode='join': per round one hash join
    (edges ⋈ labels on the neighbor) + one count groupby + one per-node
    argmax groupby — nothing node-sized on the driver (the open-graph
    path).  Returns a Dataset (node, label)."""
    import ray
    import ray.data as rd

    from deepkg_ray.stages.dedup import dedup_pair_rows
    from deepkg_ray.stages.treeagg import merge_partials
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()

    def bidirect(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"u": pa.array(np.concatenate([u, v]), pa.int64()),
                         "v": pa.array(np.concatenate([v, u]), pa.int64())})

    simple = dedup_pair_rows(
        edges.map_batches(bidirect, batch_format="pyarrow"),
        a_col="u", b_col="v").drop_columns(["n_hits"]).materialize()

    def argmax_frame(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["u", "cnt", "label"],
                            ascending=[True, False, True], kind="stable")
        return df.drop_duplicates("u")[["u", "label"]]

    if mode == "join":
        labels = simple.map_batches(
            lambda b: pa.table({"v": pc.unique(b["u"]),
                                "label": pc.unique(b["u"])}),
            batch_format="pyarrow").groupby("v").aggregate(
                Min("label", alias_name="label"))
        for _ in range(rounds):
            j = simple.join(labels, join_type="inner",
                            num_partitions=num_partitions, on=("v",))
            counts = (j.groupby(["u", "label"])
                      .aggregate(Count(alias_name="cnt")))
            labels = (counts.groupby("u")
                      .map_groups(argmax_frame, batch_format="pandas")
                      .map_batches(lambda b: b.rename_columns(["v", "label"]),
                                   batch_format="pyarrow"))
        return labels.map_batches(
            lambda b: b.rename_columns(["node", "label"]),
            batch_format="pyarrow")

    nodes = np.unique(np.concatenate(
        [b["u"].to_numpy(zero_copy_only=False)
         for b in simple.select_columns(["u"]).iter_batches(
             batch_format="pyarrow")] or [np.empty(0, np.int64)]))
    labels_arr = nodes.copy()
    for _ in range(rounds):
        ref = ray.put((nodes, labels_arr))

        def partial(b: pa.Table, r=ref) -> pd.DataFrame:
            nd, lb = ray.get(r)
            u = b["u"].to_numpy(zero_copy_only=False)
            v = b["v"].to_numpy(zero_copy_only=False)
            lab_v = lb[np.searchsorted(nd, v)]
            d = pd.DataFrame({"u": u, "label": lab_v})
            g = d.groupby(["u", "label"], sort=False).size()
            return g.reset_index(name="cnt")

        merged = merge_partials(
            simple.map_batches(partial, batch_format="pyarrow"),
            ["u", "label"], {"cnt": "sum"}, fanout=2).to_pandas()
        new = argmax_frame(merged).sort_values("u")
        new_arr = new.set_index("u")["label"].reindex(nodes).to_numpy(
            dtype=np.int64)
        if np.array_equal(new_arr, labels_arr):   # exact fixpoint
            break
        labels_arr = new_arr
    return rd.from_pandas(pd.DataFrame({"node": nodes, "label": labels_arr}))


def negative_triples(adj, ks=(1, 7), src_col: str = "subj_id",
                     pred_col: str = "pred", dst_col: str = "obj_id",
                     n_entities: int | None = None,
                     num_partitions: int | None = None):
    """TransE-style filtered negative sampling over a deduplicated triple
    table: for each positive (s, p, o) and each offset k, the corruption
    (s, p, (o+k) mod V) — deterministic, so the sample is reproducible on
    any partitioning — minus every corruption that collides with a REAL
    positive (the standard 'filtered' setting), removed by a distributed
    left_anti hash join on (s, p, o').  V defaults to 1 + max entity id.
    Returns (subj_id, pred, obj_neg, k)."""
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()
    edges = adj.select_columns([src_col, pred_col, dst_col])
    if n_entities is None:
        mx = edges.map_batches(
            lambda b: pa.table({"m": pa.array(
                [max(int(pc.max(b[src_col]).as_py() or 0),
                     int(pc.max(b[dst_col]).as_py() or 0))], pa.int64())}),
            batch_format="pyarrow")
        n_entities = 1 + int(mx.max("m"))
    v = int(n_entities)

    def corrupt(b: pa.Table) -> pa.Table:
        s = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        p = b[pred_col].to_pylist()
        o = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        outs, outp, outo, outk = [], [], [], []
        for k in ks:
            outs.append(s)
            outp.extend(p)
            outo.append((o + int(k)) % v)
            outk.append(np.full(len(s), int(k), dtype=np.int64))
        return pa.table({
            src_col: pa.array(np.concatenate(outs), pa.int64()),
            pred_col: pa.array(outp, b.schema.field(pred_col).type),
            "obj_neg": pa.array(np.concatenate(outo), pa.int64()),
            "k": pa.array(np.concatenate(outk), pa.int64()),
        })

    cand = edges.map_batches(corrupt, batch_format="pyarrow")
    pos = edges.map_batches(
        lambda b: b.rename_columns([src_col, pred_col, "obj_neg"]),
        batch_format="pyarrow")
    return cand.join(pos, join_type="left_anti",
                     num_partitions=num_partitions,
                     on=(src_col, pred_col, "obj_neg"))


WALK_C1, WALK_C2 = 2654435761, 40503   # Knuth multiplicative constants


def random_walks(edges, steps: int = 4, start_mod: int = 3,
                 src_col: str = "subj_id", dst_col: str = "obj_id",
                 mode: str = "dict", num_partitions: int | None = None):
    """Deterministic node2vec-style random walks over the undirected
    simple graph — the corpus-generation step of KG-embedding training,
    made reproducible on any partitioning: from node u at step t the walk
    moves to the ((u·C1 + t·C2) mod deg(u))-th neighbor in ascending-id
    order.  Starts = nodes with id % start_mod == 0; returns one row per
    (start, step, node) visit, steps 0..``steps``.

    mode='dict': the deduped adjacency (node-dictionary-bounded for
    entity graphs) is collected once into CSR arrays and every step is a
    single vectorized gather — the pair dedup is the only shuffle.
    mode='join': nothing node-sized on the driver — ranked adjacency
    (u, v, rnk, deg) is built once with a per-node groupby and each step
    is ONE hash join (walk frontier ⋈ ranked adjacency on the current
    node) followed by the rank filter; the join fans out by deg(cur)
    before filtering, the documented cost of staying join-only (a hub
    visit expands to its degree for one stage).
    Oracle: oracle.kg_walks_oracle (row_number-ranked neighbors,
    identical recurrence, unrolled)."""
    import ray
    import ray.data as rd

    from deepkg_ray.stages.dedup import dedup_pair_rows

    def bidirect(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"u": pa.array(np.concatenate([u, v]), pa.int64()),
                         "v": pa.array(np.concatenate([v, u]), pa.int64())})

    simple = dedup_pair_rows(
        edges.map_batches(bidirect, batch_format="pyarrow"),
        a_col="u", b_col="v").drop_columns(["n_hits"])

    if mode == "join":
        if num_partitions is None:
            from deepkg_ray.util import join_partitions
            num_partitions = join_partitions()

        def rank_group(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("v", kind="stable")
            return pd.DataFrame({
                "cur": g["u"].to_numpy(dtype=np.int64),
                "nxt": g["v"].to_numpy(dtype=np.int64),
                "rnk": np.arange(1, len(g) + 1, dtype=np.int64),
                "deg": np.full(len(g), len(g), dtype=np.int64)})

        ranked = simple.groupby("u").map_groups(
            rank_group, batch_format="pandas").materialize()

        def start_rows(b: pa.Table) -> pa.Table:
            u = np.unique(b["cur"].to_numpy(zero_copy_only=False))
            u = u[u % start_mod == 0]
            return pa.table({"start": pa.array(u, pa.int64()),
                             "cur": pa.array(u, pa.int64())})

        walks = ranked.map_batches(start_rows, batch_format="pyarrow")             .groupby("start").aggregate(Min("cur", alias_name="cur"))
        outs = [walks.map_batches(
            lambda b: pa.table({"start": b["start"],
                                "step": pa.array(
                                    np.zeros(b.num_rows, np.int64)),
                                "node": b["cur"]}),
            batch_format="pyarrow")]
        for t in range(1, steps + 1):
            j = walks.join(ranked, join_type="inner",
                           num_partitions=num_partitions, on=("cur",))

            def advance(b: pa.Table, tt=t) -> pa.Table:
                cur = b["cur"].to_numpy(zero_copy_only=False)
                deg = b["deg"].to_numpy(zero_copy_only=False)
                rnk = b["rnk"].to_numpy(zero_copy_only=False)
                pick = rnk == (cur * WALK_C1 + tt * WALK_C2) % deg + 1
                return pa.table({
                    "start": pa.array(b["start"].to_numpy(
                        zero_copy_only=False)[pick], pa.int64()),
                    "cur": pa.array(b["nxt"].to_numpy(
                        zero_copy_only=False)[pick], pa.int64())})

            walks = j.map_batches(advance, batch_format="pyarrow")                 .materialize()
            outs.append(walks.map_batches(
                lambda b, tt=t: pa.table({
                    "start": b["start"],
                    "step": pa.array(np.full(b.num_rows, tt, np.int64)),
                    "node": b["cur"]}), batch_format="pyarrow"))
        out = outs[0]
        for o in outs[1:]:
            out = out.union(o)
        return out

    adj = simple.to_pandas().sort_values(["u", "v"], kind="stable")
    nodes = np.unique(adj["u"].to_numpy(dtype=np.int64))
    deg = adj.groupby("u", sort=True).size().to_numpy(dtype=np.int64)
    indptr = np.zeros(len(nodes) + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    nbrs = adj["v"].to_numpy(dtype=np.int64)

    starts = nodes[nodes % start_mod == 0]
    cur = starts.copy()
    out_start = [starts]
    out_step = [np.zeros(len(starts), dtype=np.int64)]
    out_node = [starts]
    for t in range(1, steps + 1):
        pos = np.searchsorted(nodes, cur)
        d = deg[pos]
        idx = (cur * WALK_C1 + t * WALK_C2) % d
        cur = nbrs[indptr[pos] + idx]
        out_start.append(starts)
        out_step.append(np.full(len(starts), t, dtype=np.int64))
        out_node.append(cur)
    return rd.from_pandas(pd.DataFrame({
        "start": np.concatenate(out_start),
        "step": np.concatenate(out_step),
        "node": np.concatenate(out_node)}))


def _landmark_bfs_state(edges, k_seeds, src_col, dst_col, max_rounds,
                        num_partitions):
    """Shared labeled-BFS fixpoint over the bidirected simple graph for
    the landmark-centrality family (closeness, harmonic): returns the
    converged (seed, node, dist) Dataset, or None for an empty graph.
    Seeds are the k smallest node ids; per round one hash join + one
    Min-groupby; convergence when (pair count, Σdist) stops moving
    (monotone fold)."""
    import ray.data as rd
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()
    from deepkg_ray.util import drop_empty_blocks
    from ray.data.aggregate import Count as _Count, Min

    def bidirect(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"u": pa.array(np.concatenate([u, v]), pa.int64()),
                         "v": pa.array(np.concatenate([v, u]), pa.int64())})

    bi = edges.map_batches(bidirect, batch_format="pyarrow").materialize()
    if bi.count() == 0:
        return None

    seed_rows = (bi.select_columns(["u"]).groupby("u")
                 .aggregate(_Count(alias_name="c"))
                 .sort("u").limit(k_seeds).to_pandas())
    seeds = seed_rows["u"].astype(np.int64).tolist()

    state = rd.from_arrow(pa.table({
        "seed": pa.array(seeds, pa.int64()),
        "node": pa.array(seeds, pa.int64()),
        "dist": pa.array([0] * len(seeds), pa.int64())})).materialize()
    n_prev, s_prev = len(seeds), 0

    for _ in range(max_rounds):
        cand = drop_empty_blocks(bi).join(
            drop_empty_blocks(state), join_type="inner",
            num_partitions=num_partitions, on=("u",), right_on=("node",))

        def relax(b: pa.Table) -> pa.Table:
            return pa.table({
                "seed": b["seed"],
                "node": b["v"],
                "dist": pc.add(b["dist"].combine_chunks(), 1)})

        nxt = (cand.map_batches(relax, batch_format="pyarrow")
               .union(state)
               .groupby(["seed", "node"])
               .aggregate(Min("dist", alias_name="dist"))
               .materialize())
        n_now, s_now = nxt.count(), int(nxt.sum("dist"))
        state = nxt
        if (n_now, s_now) == (n_prev, s_prev):
            break                  # monotone fold: unchanged ⇒ fixpoint
        n_prev, s_prev = n_now, s_now
    else:
        raise AssertionError(
            f"labeled BFS did not converge within {max_rounds} rounds")
    return state


def harmonic_centrality(edges, k_seeds: int = 4,
                        src_col: str = "subj_id",
                        dst_col: str = "obj_id", max_rounds: int = 32,
                        num_partitions: int | None = None):
    """Landmark HARMONIC centrality (Marchiori & Latora 2000; Boldi &
    Vigna 2014 argue it is the principled closeness variant): per seed
    Σ_{v≠seed reached} 1/dist(v) — unlike closeness it handles
    disconnected graphs gracefully (unreached nodes contribute 0 instead
    of poisoning the mean).  Same labeled-BFS fixpoint as
    closeness_centrality (shared _landmark_bfs_state, one fixpoint for
    all k seeds).  Exactness: per-node term is the INTEGER
    1000000 // dist, summed as int64 — no float accumulation, the SQL
    twin is bit-identical.  Returns (seed, n_reach, harmonic_micros,
    harmonic)."""
    import ray.data as rd
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    state = _landmark_bfs_state(edges, k_seeds, src_col, dst_col,
                                max_rounds, num_partitions)
    if state is None:
        return rd.from_arrow(pa.table({
            "seed": pa.array([], pa.int64()),
            "n_reach": pa.array([], pa.int64()),
            "harmonic_micros": pa.array([], pa.int64()),
            "harmonic": pa.array([], pa.float64())}))

    def terms(b: pa.Table) -> pa.Table:
        d = b["dist"].to_numpy(zero_copy_only=False).astype(np.int64)
        hm = np.where(d > 0, 1_000_000 // np.maximum(d, 1), 0)
        return pa.table({"seed": b["seed"],
                         "one": pa.array(np.ones(len(d), np.int64)),
                         "hm": pa.array(hm, pa.int64())})

    agg = (state.map_batches(terms, batch_format="pyarrow")
           .groupby("seed")
           .aggregate(_Sum("one", alias_name="n_reach"),
                      _Sum("hm", alias_name="harmonic_micros")))

    def finish(b: pa.Table) -> pa.Table:
        hm = b["harmonic_micros"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "seed": b["seed"].combine_chunks().cast(pa.int64()),
            "n_reach": b["n_reach"].combine_chunks().cast(pa.int64()),
            "harmonic_micros": pa.array(hm, pa.int64()),
            "harmonic": pa.array(hm / 1e6, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def closeness_centrality(edges, k_seeds: int = 4, src_col: str = "subj_id",
                         dst_col: str = "obj_id", max_rounds: int = 32,
                         num_partitions: int | None = None):
    """Landmark closeness centrality: exact per-seed BFS distances for the
    ``k_seeds`` smallest node ids, folded to (n_reach, Σdist, closeness =
    (n_reach−1)/Σdist) per seed — the landmark-sampling estimator for
    closeness at scale (run it on a node sample; each seed's column is an
    exact BFS).

    One LABELED Bellman-Ford over composite state (seed, node, dist) runs
    all seeds together: per round one hash join (edges ⋈ state on node)
    plus one Min-groupby on (seed, node) — k seeds cost one fixpoint, not k
    (the SSSP machinery of sssp_weighted with a seed label carried through
    the fold).  The fold is monotone, so convergence is "(pair count,
    Σdist) unchanged".  Nothing node-sized touches the driver except the
    k-row seed pick."""
    import ray.data as rd
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    state = _landmark_bfs_state(edges, k_seeds, src_col, dst_col,
                                max_rounds, num_partitions)
    if state is None:
        return rd.from_arrow(pa.table({
            "seed": pa.array([], pa.int64()),
            "n_reach": pa.array([], pa.int64()),
            "total_dist": pa.array([], pa.int64()),
            "closeness": pa.array([], pa.float64())}))

    agg = (state.groupby("seed")
           .aggregate(_Count(alias_name="n_reach"),
                      _Sum("dist", alias_name="total_dist")))

    def finish(b: pa.Table) -> pa.Table:
        n = b["n_reach"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = b["total_dist"].to_numpy(zero_copy_only=False).astype(np.int64)
        clo = np.where(s > 0, (n - 1).astype(np.float64)
                       / np.where(s > 0, s, 1).astype(np.float64), 0.0)
        return pa.table({
            "seed": b["seed"].combine_chunks().cast(pa.int64()),
            "n_reach": pa.array(n, pa.int64()),
            "total_dist": pa.array(s, pa.int64()),
            "closeness": pa.array(clo, pa.float64())})
    return agg.map_batches(finish, batch_format="pyarrow")


def diameter_2sweep(edges, src_col: str = "subj_id",
                    dst_col: str = "obj_id", max_rounds: int = 64):
    """Graph-diameter lower bound by the classic 2-sweep heuristic
    (Magnien, Latapy & Habib 2009): BFS from the smallest node id, then BFS
    from the farthest node found (ties to the smallest id); the second
    eccentricity is the bound — exact on trees, within a small factor on
    real graphs, and two BFS passes instead of n.

    Both sweeps reuse bfs_distances (frontier broadcast — the node
    dictionary is driver-sized by that mode's documented contract); only
    the (node, dist) tables, never edges, reach the driver.  Returns one
    row (src, far_node, diameter_lb)."""
    import ray.data as rd

    def orient(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        return pa.table({"u": pa.array(u[keep], pa.int64()),
                         "v": pa.array(v[keep], pa.int64())})

    simple = edges.map_batches(orient, batch_format="pyarrow").materialize()
    if simple.count() == 0:
        return rd.from_arrow(pa.table({
            "src": pa.array([], pa.int64()),
            "far_node": pa.array([], pa.int64()),
            "diameter_lb": pa.array([], pa.int64())}))
    seed = min(int(simple.min("u")), int(simple.min("v")))

    def far_of(dist_df: pd.DataFrame) -> int:
        mx = dist_df["dist"].max()
        return int(dist_df.loc[dist_df["dist"] == mx, "node"].min())

    d1 = bfs_distances(simple, [seed], src_col="u", dst_col="v",
                       max_rounds=max_rounds).to_pandas()
    far = far_of(d1)
    d2 = bfs_distances(simple, [far], src_col="u", dst_col="v",
                       max_rounds=max_rounds).to_pandas()
    return rd.from_arrow(pa.table({
        "src": pa.array([seed], pa.int64()),
        "far_node": pa.array([far], pa.int64()),
        "diameter_lb": pa.array([int(d2["dist"].max())], pa.int64())}))


def robustness_profile(edges, ks=(0, 5, 10), src_col: str = "subj_id",
                       dst_col: str = "obj_id"):
    """Targeted-attack robustness: for each k in ``ks``, remove the
    top-k degree hubs (tie → smaller id) and report the largest
    connected component of the remaining edge-induced graph — the
    Albert–Jeong–Barabási scale-free fragility curve (a KG whose LCC
    collapses after a handful of hub deletions routes everything
    through those entities).  Nodes that lose all edges leave the
    graph (edge-induced convention, both sides).

    Plan: distinct-neighbor degrees → a k-sized hub list (sort+limit
    moves k rows); per k one broadcast-filtered edge scan feeds
    connected_components' tiered CC; per-component sizes reduce to two
    scalars.  Returns (k_removed, n_nodes, lcc_size, lcc_share)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count as _Cnt

    ks = sorted(ks)
    # hub degrees over the SELF-LOOP-FREE graph — the oracle computes
    # degrees over subj_id <> obj_id edges, and the per-k filter below
    # drops self-loops anyway (same guard as link_prediction_scores)
    noself = edges.map_batches(
        lambda b: b.filter(pc.not_equal(b[src_col], b[dst_col])),
        batch_format="pyarrow")
    deg = node_degrees(noself, src_col=src_col, dst_col=dst_col)
    hubs = (deg.sort(["degree", "node"], descending=[True, False])
            .limit(max(ks) if ks else 0).to_pandas())
    hub_ids = hubs["node"].to_numpy(np.int64)

    out_rows = []
    for k in ks:
        drop = np.sort(hub_ids[:k])
        ref = ray.put(drop)

        def filt(b: pa.Table) -> pa.Table:
            d = ray.get(ref)
            u = b[src_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            v = b[dst_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            keep = (u != v)
            if len(d):
                keep &= ~np.isin(u, d) & ~np.isin(v, d)
            return pa.table({"doc_a": pa.array(u[keep], pa.int64()),
                             "doc_b": pa.array(v[keep], pa.int64())})

        cc = connected_components(
            edges.map_batches(filt, batch_format="pyarrow"))
        sizes = cc.groupby("component").aggregate(
            _Cnt(alias_name="c")).materialize()
        n_nodes = int(sizes.sum("c") or 0)
        lcc = int(sizes.max("c") or 0)
        share = float(np.floor(lcc / n_nodes * 1e6 + 0.5) / 1e6) \
            if n_nodes else 0.0
        out_rows.append((k, n_nodes, lcc, share))

    return rd.from_arrow(pa.table({
        "k_removed": pa.array([r[0] for r in out_rows], pa.int64()),
        "n_nodes": pa.array([r[1] for r in out_rows], pa.int64()),
        "lcc_size": pa.array([r[2] for r in out_rows], pa.int64()),
        "lcc_share": pa.array([r[3] for r in out_rows], pa.float64())}))


def avg_neighbor_degree(edges, src_col: str = "subj_id",
                        dst_col: str = "obj_id",
                        num_partitions: int | None = None,
                        broadcast_threshold: int = 2_000_000):
    """Average neighbor degree per node over the simple undirected
    graph — degree_assortativity's node-local view (a node whose
    neighbors out-rank it sits in a rich-club periphery; the
    Pastor-Satorras k_nn(k) curve folds from these rows).

    Plan: distinct (node, peer) pairs; the |V|-sized degree table
    attaches to the peer side by broadcast below the threshold and by
    one hash join above (the link_prediction_scores tier pair); the
    per-node fold is exact integers with ONE round6 division.
    Returns (node, degree, avg_nbr_deg)."""
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()
    from deepkg_ray.util import drop_empty_blocks

    from deepkg_ray.stages.treeagg import merge_partials

    def bidirect_dedup(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        pairs = np.unique(np.stack([np.concatenate([u, v]),
                                    np.concatenate([v, u])],
                                   axis=1), axis=0)
        return pa.table({"node": pa.array(pairs[:, 0], pa.int64()),
                         "peer": pa.array(pairs[:, 1], pa.int64()),
                         "_n": pa.array(np.ones(len(pairs), np.int64))})

    pairs = merge_partials(
        edges.map_batches(bidirect_dedup, batch_format="pyarrow"),
        ["node", "peer"], {"_n": "sum"}, mode="auto") \
        .drop_columns(["_n"]).materialize()

    deg = merge_partials(
        pairs.map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "degree": pa.array(np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["node"], {"degree": "sum"}, mode="auto").materialize()

    def finish(df):
        s = df["s"].to_numpy(np.int64)
        n = df["degree"].to_numpy(np.int64)
        return pd.DataFrame({
            "node": df["node"].to_numpy(np.int64),
            "degree": n,
            "avg_nbr_deg": np.floor(s / n.astype(np.float64)
                                    * 1e6 + 0.5) / 1e6})

    import pandas as pd

    if deg.count() <= broadcast_threshold:
        import ray
        dp = deg.to_pandas()
        nodes = dp["node"].to_numpy(np.int64)
        order = np.argsort(nodes)
        ref = ray.put((nodes[order],
                       dp["degree"].to_numpy(np.int64)[order]))

        def attach(b: pa.Table) -> pd.DataFrame:
            keys, dv = ray.get(ref)
            peer = b["peer"].to_numpy(zero_copy_only=False)
            pd_ = dv[np.searchsorted(keys, peer)]
            g = (pd.DataFrame({
                "node": b["node"].to_numpy(zero_copy_only=False),
                "s": pd_, "degree": np.ones(len(pd_), np.int64)})
                .groupby("node", as_index=False).sum())
            g["s"] = g["s"].astype("int64")
            g["degree"] = g["degree"].astype("int64")
            return g

        merged = merge_partials(
            pairs.map_batches(attach, batch_format="pyarrow"),
            ["node"], {"s": "sum", "degree": "sum"}, mode="auto")
        return merged.map_batches(finish, batch_format="pandas")

    peer_deg = deg.map_batches(
        lambda b: pa.table({"peer": b["node"], "pdeg": b["degree"]}),
        batch_format="pyarrow")
    joined = drop_empty_blocks(pairs).join(
        drop_empty_blocks(peer_deg), join_type="inner",
        num_partitions=num_partitions, on=("peer",))
    merged = merge_partials(
        joined.map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "s": b["pdeg"],
                "degree": pa.array(np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["node"], {"s": "sum", "degree": "sum"}, mode="auto")
    return merged.map_batches(finish, batch_format="pandas")


def edge_embeddedness(edges, src_col: str = "subj_id",
                      dst_col: str = "obj_id",
                      num_partitions: int | None = None,
                      broadcast_threshold: int = 2_000_000):
    """Embeddedness of every EXISTING undirected edge: the number of
    common neighbors of its endpoints (= the edge's triangle support;
    Granovetter's tie-strength proxy — an edge with embeddedness 0 is
    a local bridge).  link_prediction's wedge machinery with the anti
    join flipped to a LEFT attach onto the edge set, so bridges report
    cn = 0 instead of vanishing.

    Plan: node-complete wedge partitions fold (e1, e2) wedge counts
    (mode='auto'); the simple edge set left-attaches them — broadcast
    packed-key lookup below the threshold, hash left_outer join above.
    Returns (e1, e2, cn) with e1 < e2."""
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()
    from deepkg_ray.util import drop_empty_blocks

    def bidirect(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({
            "node": pa.array(np.concatenate([u, v]), pa.int64()),
            "peer": pa.array(np.concatenate([v, u]), pa.int64())})

    bidir = edges.map_batches(bidirect, batch_format="pyarrow")

    def add_part(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy(zero_copy_only=False)
        return b.append_column("part", pa.array(
            (node % np.int64(64)).astype(np.int32)))

    def wedge_partition(g: pa.Table) -> pa.Table:
        node = g["node"].to_numpy(zero_copy_only=False)
        peer = g["peer"].to_numpy(zero_copy_only=False)
        if len(peer):
            assert peer.min() >= 0 and peer.max() < 2**31, \
                "pair packing requires node ids in [0, 2^31)"
        order = np.lexsort((peer, node))
        node, peer = node[order], peer[order]
        first = np.ones(len(node), bool)
        first[1:] = (node[1:] != node[:-1]) | (peer[1:] != peer[:-1])
        node, peer = node[first], peer[first]
        starts = np.nonzero(np.concatenate(
            ([True], node[1:] != node[:-1])))[0]
        ends = np.concatenate((starts[1:], [len(node)]))
        keys = []
        for s, e in zip(starts, ends):
            deg = e - s
            if deg < 2:
                continue
            ai, bi = np.triu_indices(deg, k=1)
            p = peer[s:e]
            keys.append(p[ai] * PACK + p[bi])
        if not keys:
            return pa.table({"e1": pa.array([], pa.int64()),
                             "e2": pa.array([], pa.int64()),
                             "cn": pa.array([], pa.int64())})
        uk, cnts = np.unique(np.concatenate(keys), return_counts=True)
        return pa.table({
            "e1": pa.array((uk // PACK).astype(np.int64), pa.int64()),
            "e2": pa.array((uk % PACK).astype(np.int64), pa.int64()),
            "cn": pa.array(cnts.astype(np.int64), pa.int64())})

    from deepkg_ray.stages.treeagg import merge_partials
    cand = merge_partials(
        bidir.map_batches(add_part, batch_format="pyarrow")
        .groupby("part").map_groups(wedge_partition,
                                    batch_format="pyarrow"),
        ["e1", "e2"], {"cn": "sum"}, mode="auto").materialize()

    def orient(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        packed = np.unique(lo * PACK + hi)
        return pa.table({"packed": pa.array(packed, pa.int64()),
                         "_n": pa.array(np.ones(len(packed), np.int64))})

    simple = merge_partials(
        edges.map_batches(orient, batch_format="pyarrow"),
        ["packed"], {"_n": "sum"}, mode="auto").drop_columns(["_n"])

    if cand.count() <= broadcast_threshold:
        import ray
        cp = cand.to_pandas()
        ck = cp["e1"].to_numpy(np.int64) * PACK \
            + cp["e2"].to_numpy(np.int64)
        order = np.argsort(ck)
        ref = ray.put((ck[order],
                       cp["cn"].to_numpy(np.int64)[order]))

        def attach(b: pa.Table) -> pa.Table:
            keys, cns = ray.get(ref)
            pk = b["packed"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, pk)
            pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
            hit = (len(keys) > 0) & (keys[pos_c] == pk)
            cn = np.where(hit, cns[pos_c], 0)
            return pa.table({
                "e1": pa.array(pk // PACK, pa.int64()),
                "e2": pa.array(pk % PACK, pa.int64()),
                "cn": pa.array(cn.astype(np.int64), pa.int64())})

        return simple.map_batches(attach, batch_format="pyarrow")

    unpacked = simple.map_batches(
        lambda b: pa.table({
            "e1": pa.array(b["packed"].to_numpy(
                zero_copy_only=False) // PACK, pa.int64()),
            "e2": pa.array(b["packed"].to_numpy(
                zero_copy_only=False) % PACK, pa.int64())}),
        batch_format="pyarrow")
    joined = drop_empty_blocks(unpacked).join(
        drop_empty_blocks(cand), join_type="left_outer",
        num_partitions=num_partitions, on=("e1", "e2"))
    return joined.map_batches(
        lambda b: pa.table({
            "e1": b["e1"].combine_chunks().cast(pa.int64()),
            "e2": b["e2"].combine_chunks().cast(pa.int64()),
            "cn": pa.array(np.nan_to_num(
                b["cn"].to_numpy(zero_copy_only=False)
                .astype(np.float64)).astype(np.int64), pa.int64())}),
        batch_format="pyarrow")


def link_prediction_scores(edges, src_col: str = "subj_id",
                           dst_col: str = "obj_id", min_cn: int = 2,
                           max_degree: int | None = None,
                           num_partitions: int | None = None,
                           broadcast_threshold: int = 2_000_000):
    """link_prediction extended with the full structural score family:
    common neighbors (cn), resource allocation (ra = Σ 1/deg z), Adamic–
    Adar (aa = Σ 1/ln deg z; Adamic & Adar, Soc. Networks 2003) and the
    neighborhood Jaccard  cn / (deg e1 + deg e2 − cn).

    Exactness: ra/aa terms are per-center integers floor(1e6/f(deg)+0.5)
    summed as int64 (f = identity / ln); the ln path is safe because the
    term is computed from the integer degree on BOTH sides with the same
    libm — verified bit-equal over deg ∈ [2, 10^6] (numpy log, CPython
    math.log and DuckDB ln agree); jaccard is ONE round6 division of two
    int64s.  Plan: the wedge/anti-join pipeline of link_prediction plus
    two hash joins against the distinct-neighbor degree table (node_degrees
    — |V|-sized, fully distributed; no driver or closure capture).
    Returns (e1, e2, cn, ra, aa, jaccard)."""
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()
    from deepkg_ray.util import drop_empty_blocks

    def bidirect(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({
            "node": pa.array(np.concatenate([u, v]), pa.int64()),
            "peer": pa.array(np.concatenate([v, u]), pa.int64())})

    bidir = edges.map_batches(bidirect, batch_format="pyarrow")

    # node-complete coarse partitions + local (e1, e2) combiner — the
    # link_prediction plan with the (ra, aa) weight pair
    def add_part(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy(zero_copy_only=False)
        return b.append_column("part", pa.array(
            (node % np.int64(64)).astype(np.int32)))

    def wedge_partition(g: pa.Table) -> pa.Table:
        node = g["node"].to_numpy(zero_copy_only=False)
        peer = g["peer"].to_numpy(zero_copy_only=False)
        if len(peer):
            assert peer.min() >= 0 and peer.max() < 2**31, \
                "pair packing requires node ids in [0, 2^31)"
        order = np.lexsort((peer, node))
        node, peer = node[order], peer[order]
        first = np.ones(len(node), bool)
        first[1:] = (node[1:] != node[:-1]) | (peer[1:] != peer[:-1])
        node, peer = node[first], peer[first]
        starts = np.nonzero(np.concatenate(
            ([True], node[1:] != node[:-1])))[0]
        ends = np.concatenate((starts[1:], [len(node)]))
        e1o, e2o, rao, aao = [], [], [], []
        for s, e in zip(starts, ends):
            deg = e - s
            if deg < 2 or (max_degree is not None and deg > max_degree):
                continue
            wm_ra = np.int64(np.floor(1e6 / deg + 0.5))
            wm_aa = np.int64(np.floor(1e6 / np.log(deg) + 0.5))
            ai, bi = np.triu_indices(deg, k=1)
            p = peer[s:e]
            e1o.append(p[ai])
            e2o.append(p[bi])
            rao.append(np.full(len(ai), wm_ra, np.int64))
            aao.append(np.full(len(ai), wm_aa, np.int64))
        if not e1o:
            return pa.table({"e1": pa.array([], pa.int64()),
                             "e2": pa.array([], pa.int64()),
                             "cn": pa.array([], pa.int64()),
                             "ra_micros": pa.array([], pa.int64()),
                             "aa_micros": pa.array([], pa.int64())})
        key = np.concatenate(e1o) * PACK + np.concatenate(e2o)
        ra = np.concatenate(rao)
        aa = np.concatenate(aao)
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "e1": pa.array((uk // PACK).astype(np.int64), pa.int64()),
            "e2": pa.array((uk % PACK).astype(np.int64), pa.int64()),
            "cn": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
            "ra_micros": pa.array(np.bincount(
                inv, weights=ra.astype(np.float64)).astype(np.int64),
                pa.int64()),
            "aa_micros": pa.array(np.bincount(
                inv, weights=aa.astype(np.float64)).astype(np.int64),
                pa.int64())})

    from deepkg_ray.stages.treeagg import merge_partials
    cand = merge_partials(
        bidir.map_batches(add_part, batch_format="pyarrow")
        .groupby("part").map_groups(wedge_partition,
                                    batch_format="pyarrow"),
        ["e1", "e2"], {"cn": "sum", "ra_micros": "sum",
                       "aa_micros": "sum"}, mode="auto")
    cand = cand.map_batches(
        lambda b: b.filter(pc.greater_equal(
            b["cn"].combine_chunks().cast(pa.int64()),
            pa.scalar(min_cn))),
        batch_format="pyarrow")

    def orient(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        packed = np.unique(lo * PACK + hi)
        return pa.table({"packed": pa.array(packed, pa.int64())})

    simple_packed = merge_partials(
        edges.map_batches(orient, batch_format="pyarrow")
        .map_batches(lambda b: b.append_column(
            "_n", pa.array(np.ones(b.num_rows, np.int64))),
            batch_format="pyarrow"),
        ["packed"], {"_n": "sum"}, mode="auto").materialize()

    if simple_packed.count() <= 2_000_000:
        import ray
        ep = np.sort(simple_packed.to_pandas()["packed"]
                     .to_numpy(np.int64))
        ep_ref = ray.put(ep)

        def anti(b: pa.Table) -> pa.Table:
            edges_arr = ray.get(ep_ref)
            key = b["e1"].to_numpy(zero_copy_only=False) * PACK \
                + b["e2"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(edges_arr, key)
            pos_c = np.clip(pos, 0, max(len(edges_arr) - 1, 0))
            hit = (len(edges_arr) > 0) & (edges_arr[pos_c] == key)
            return b.filter(pa.array(~hit))

        new_pairs = drop_empty_blocks(cand).map_batches(
            anti, batch_format="pyarrow")
    else:
        simple = simple_packed.map_batches(
            lambda b: pa.table({
                "e1": pa.array(b["packed"].to_numpy(
                    zero_copy_only=False) // PACK, pa.int64()),
                "e2": pa.array(b["packed"].to_numpy(
                    zero_copy_only=False) % PACK, pa.int64())}),
            batch_format="pyarrow")
        new_pairs = drop_empty_blocks(cand).join(
            drop_empty_blocks(simple), join_type="left_anti",
            num_partitions=num_partitions, on=("e1", "e2"))

    # degrees over the SELF-LOOP-FREE simple graph (the wedge machinery and
    # the oracle's adj CTE both exclude u = v; node_degrees alone would
    # count a self-loop as a neighbor)
    noself = edges.map_batches(
        lambda b: b.filter(pc.not_equal(b[src_col], b[dst_col])),
        batch_format="pyarrow")
    deg = node_degrees(noself, src_col=src_col, dst_col=dst_col) \
        .materialize()

    def attach_broadcast(pairs_ds, deg_map_ref):
        import ray

        def finish(b: pa.Table) -> pa.Table:
            from deepkg_ray.functions.numeric import round6
            dm = ray.get(deg_map_ref)
            cn = b["cn"].combine_chunks().cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            e1 = b["e1"].to_numpy(zero_copy_only=False)
            e2 = b["e2"].to_numpy(zero_copy_only=False)
            idx1 = np.searchsorted(dm[0], e1)
            idx2 = np.searchsorted(dm[0], e2)
            # anti-joined candidate endpoints always carry a degree; the
            # take is safe because every e1/e2 appeared as a wedge peer
            d1 = dm[1][idx1]
            d2 = dm[1][idx2]
            den = d1 + d2 - cn
            jac = round6(cn.astype(np.float64) / den.astype(np.float64))
            return pa.table({
                "e1": pa.array(e1, pa.int64()),
                "e2": pa.array(e2, pa.int64()),
                "cn": pa.array(cn, pa.int64()),
                "ra": pa.array(np.asarray(
                    b["ra_micros"].to_pylist(), np.float64) / 1e6),
                "aa": pa.array(np.asarray(
                    b["aa_micros"].to_pylist(), np.float64) / 1e6),
                "jaccard": pa.array(jac, pa.float64())})

        return drop_empty_blocks(pairs_ds).map_batches(
            finish, batch_format="pyarrow")

    # tiered degree attach: the degree table is |V|-sized — when the node
    # vocabulary is dictionary-bounded (the KG case: entities come from the
    # alias dictionary) a ray.put sorted-array broadcast replaces TWO hash
    # joins; above the threshold fall back to the distributed joins
    if deg.count() <= broadcast_threshold:
        import ray
        dd = deg.to_pandas()
        order = np.argsort(dd["node"].to_numpy(np.int64))
        deg_ref = ray.put((dd["node"].to_numpy(np.int64)[order],
                           dd["degree"].to_numpy(np.int64)[order]))
        return attach_broadcast(new_pairs, deg_ref)

    j1 = drop_empty_blocks(new_pairs).join(
        drop_empty_blocks(deg.map_batches(
            lambda b: pa.table({"n1": b["node"], "d1": b["degree"]}),
            batch_format="pyarrow")),
        join_type="inner", num_partitions=num_partitions,
        on=("e1",), right_on=("n1",))
    j2 = drop_empty_blocks(j1).join(
        drop_empty_blocks(deg.map_batches(
            lambda b: pa.table({"n2": b["node"], "d2": b["degree"]}),
            batch_format="pyarrow")),
        join_type="inner", num_partitions=num_partitions,
        on=("e2",), right_on=("n2",))

    def finish(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.numeric import round6
        cn = b["cn"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        d1 = b["d1"].to_numpy(zero_copy_only=False).astype(np.int64)
        d2 = b["d2"].to_numpy(zero_copy_only=False).astype(np.int64)
        den = d1 + d2 - cn
        jac = round6(cn.astype(np.float64) / den.astype(np.float64))
        return pa.table({
            "e1": b["e1"], "e2": b["e2"],
            "cn": pa.array(cn, pa.int64()),
            "ra": pa.array(np.asarray(
                b["ra_micros"].to_pylist(), np.float64) / 1e6),
            "aa": pa.array(np.asarray(
                b["aa_micros"].to_pylist(), np.float64) / 1e6),
            "jaccard": pa.array(jac, pa.float64())})

    return drop_empty_blocks(j2).map_batches(finish, batch_format="pyarrow")


def two_hop_sizes(edges, src_col: str = "subj_id", dst_col: str = "obj_id",
                  num_partitions: int | None = None,
                  driver_threshold: int = 500_000):
    """Ego-network reach per node on the undirected simple graph: degree
    (1-hop) and the distinct node count within ≤ 2 hops (excluding self)
    — the neighborhood-growth signal (dense cores grow slowly, tree-like
    regions double).

    Plan: bidirected edges self-joined on the middle vertex emit 2-path
    endpoints (a, c); unioned with the direct (a, b) pairs and deduped by
    one (node, reach) groupby, then a Count per node.  The join moves
    Σ deg² wedge rows — the same fan-out bound as link_prediction, and
    the same max_degree truncation applies at scale (exact here to match
    the oracle).  Returns (node, n1, n2)."""
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()
    from deepkg_ray.util import drop_empty_blocks

    def bidirect(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({
            "a": pa.array(np.concatenate([u, v]), pa.int64()),
            "b": pa.array(np.concatenate([v, u]), pa.int64())})

    bidir = (edges.map_batches(bidirect, batch_format="pyarrow")
             .groupby(["a", "b"]).aggregate(Count(alias_name="_m"))
             .drop_columns(["_m"]).materialize())

    # driver tier below the edge threshold (the scc/truss auto-routing
    # convention): neighbor-set unions on a dict beat a Σdeg² wedge join
    # whose every stage pays fixed shuffle cost
    if bidir.count() <= driver_threshold:
        import ray.data as rd
        ed = bidir.to_pandas()
        nbrs: dict[int, set] = {}
        for a, b in zip(ed["a"].to_numpy(np.int64),
                        ed["b"].to_numpy(np.int64)):
            nbrs.setdefault(int(a), set()).add(int(b))
        nodes = sorted(nbrs)
        n1 = [len(nbrs[v]) for v in nodes]
        n2 = []
        for v in nodes:
            reach = set(nbrs[v])
            for u in nbrs[v]:
                reach |= nbrs[u]
            reach.discard(v)
            n2.append(len(reach))
        return rd.from_arrow(pa.table({
            "node": pa.array(np.asarray(nodes, np.int64), pa.int64()),
            "n1": pa.array(np.asarray(n1, np.int64), pa.int64()),
            "n2": pa.array(np.asarray(n2, np.int64), pa.int64())}))

    mid = bidir.map_batches(
        lambda t: pa.table({"m": t["a"], "c": t["b"]}),
        batch_format="pyarrow")
    paths2 = drop_empty_blocks(bidir).join(
        drop_empty_blocks(mid), join_type="inner",
        num_partitions=num_partitions, on=("b",), right_on=("m",))

    reach2 = paths2.map_batches(
        lambda t: t.filter(pc.not_equal(t["a"], t["c"]))
                   .select(["a", "c"])
                   .rename_columns(["node", "reach"]),
        batch_format="pyarrow")
    reach1 = bidir.map_batches(
        lambda t: t.rename_columns(["node", "reach"]),
        batch_format="pyarrow")

    distinct = (reach1.union(reach2)
                .groupby(["node", "reach"])
                .aggregate(Count(alias_name="_m")).drop_columns(["_m"]))
    n2 = distinct.groupby("node").aggregate(Count(alias_name="n2"))

    deg = node_degrees(
        edges.map_batches(
            lambda b: b.filter(pc.not_equal(b[src_col], b[dst_col])),
            batch_format="pyarrow"),
        src_col=src_col, dst_col=dst_col)

    j = drop_empty_blocks(n2).join(
        drop_empty_blocks(deg.map_batches(
            lambda b: pa.table({"dn": b["node"], "n1": b["degree"]}),
            batch_format="pyarrow")),
        join_type="inner", num_partitions=num_partitions,
        on=("node",), right_on=("dn",))
    return drop_empty_blocks(j).map_batches(
        lambda b: pa.table({
            "node": b["node"].combine_chunks().cast(pa.int64()),
            "n1": b["n1"].combine_chunks().cast(pa.int64()),
            "n2": b["n2"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow")


def degree_distribution(edges, src_col: str = "subj_id",
                        dst_col: str = "obj_id"):
    """Degree distribution of the undirected simple graph: how many nodes
    have each distinct-neighbor degree — the power-law diagnostic (a
    heavy tail marks hub risk for every wedge-shaped operator in this
    module).  node_degrees' |V|-bounded table collapses to a value-count
    histogram (degree-value-bounded shuffle).  Returns (degree, n_nodes)."""
    deg = node_degrees(
        edges.map_batches(
            lambda b: b.filter(pc.not_equal(b[src_col], b[dst_col])),
            batch_format="pyarrow"),
        src_col=src_col, dst_col=dst_col)

    def partial(b: pa.Table) -> pa.Table:
        d = b["degree"].to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(d, return_counts=True)
        return pa.table({"degree": pa.array(vals.astype(np.int64)),
                         "n_nodes": pa.array(cnts.astype(np.int64))})

    from deepkg_ray.stages.treeagg import merge_partials
    return merge_partials(
        deg.map_batches(partial, batch_format="pyarrow"),
        ["degree"], {"n_nodes": "sum"}, mode="tree")


def degree_assortativity(edges, src_col: str = "subj_id",
                         dst_col: str = "obj_id",
                         num_partitions: int | None = None,
                         broadcast_max: int = 2_000_000):
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of (deg u, deg v) over the bidirected edge list —
    positive = hubs attach to hubs, negative = hub-and-spoke.

    Exactness: degrees are ints, so all five moments (Σx, Σy, Σxy, Σx²,
    Σy²) are exact int64 partial sums; the M·Σxy − Σx·Σy products finish
    in Python big-ints (HUGEINT in SQL) and the one float chain is
    num / (√a · √b) — IEEE sqrt, same on both sides.  Plan: degrees
    attach to edge endpoints by broadcast below 2M nodes (hash joins
    above), moments fold per batch to single-row partials.
    Returns one row (m, num, r)."""
    import ray
    from ray.data.aggregate import Sum
    from deepkg_ray.util import drop_empty_blocks, join_partitions
    if num_partitions is None:
        num_partitions = join_partitions()

    noself = edges.map_batches(
        lambda b: b.filter(pc.not_equal(b[src_col], b[dst_col])),
        batch_format="pyarrow")
    deg = node_degrees(noself, src_col=src_col, dst_col=dst_col) \
        .materialize()

    def bidirect(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        packed = np.unique(lo * PACK + hi)
        return pa.table({
            "a": pa.array(np.concatenate([packed // PACK,
                                          packed % PACK]), pa.int64()),
            "b": pa.array(np.concatenate([packed % PACK,
                                          packed // PACK]), pa.int64())})

    # per-batch local edge dedup; the exact global dedup below
    bidir = (noself.map_batches(bidirect, batch_format="pyarrow")
             .groupby(["a", "b"]).aggregate(Count(alias_name="_m"))
             .drop_columns(["_m"]))

    if deg.count() <= broadcast_max:
        # broadcast tier: degrees attach via ray.put'd sorted arrays
        dd = deg.to_pandas()
        order = np.argsort(dd["node"].to_numpy(np.int64))
        ref = ray.put((dd["node"].to_numpy(np.int64)[order],
                       dd["degree"].to_numpy(np.int64)[order]))

        def moments(b: pa.Table) -> pa.Table:
            nodes, degs = ray.get(ref)
            x = degs[np.searchsorted(nodes, b["a"].to_numpy(
                zero_copy_only=False))]
            y = degs[np.searchsorted(nodes, b["b"].to_numpy(
                zero_copy_only=False))]
            return pa.table({
                "m": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64())})

        withdeg = drop_empty_blocks(bidir).map_batches(
            moments, batch_format="pyarrow")
    else:
        # distributed tier: two hash joins attach (deg a, deg b) — the
        # link_prediction_scores join shape, no driver materialization
        dega = deg.map_batches(lambda t: t.rename_columns(["node", "dx"]),
                               batch_format="pyarrow")
        degb = deg.map_batches(lambda t: t.rename_columns(["nodeb", "dy"]),
                               batch_format="pyarrow")
        j = drop_empty_blocks(bidir).join(
            drop_empty_blocks(dega), join_type="inner",
            num_partitions=num_partitions, on=("a",), right_on=("node",))
        j = drop_empty_blocks(j).join(
            drop_empty_blocks(degb), join_type="inner",
            num_partitions=num_partitions, on=("b",), right_on=("nodeb",))

        def moments_j(b: pa.Table) -> pa.Table:
            x = b["dx"].to_numpy(zero_copy_only=False).astype(np.int64)
            y = b["dy"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "m": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64())})

        withdeg = drop_empty_blocks(j).map_batches(
            moments_j, batch_format="pyarrow")

    agg = withdeg.aggregate(
        Sum("m", alias_name="m"), Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
        Sum("sxx", alias_name="sxx"), Sum("syy", alias_name="syy"))
    m = int(agg["m"] or 0)
    import ray.data as rd
    if m == 0:
        return rd.from_arrow(pa.table({
            "m": pa.array([0], pa.int64()),
            "num": pa.array([0.0], pa.float64()),
            "r": pa.array([0.0], pa.float64())}))
    sx, sy = int(agg["sx"]), int(agg["sy"])
    sxy, sxx, syy = int(agg["sxy"]), int(agg["sxx"]), int(agg["syy"])
    num = m * sxy - sx * sy                       # exact python ints
    a = m * sxx - sx * sx
    bq = m * syy - sy * sy
    r = float(num) / (np.sqrt(float(a)) * np.sqrt(float(bq))) \
        if a > 0 and bq > 0 else 0.0
    return rd.from_arrow(pa.table({
        "m": pa.array([m], pa.int64()),
        "num": pa.array([float(num)], pa.float64()),
        "r": pa.array([r], pa.float64())}))


def clustering_coefficients(edges, src_col: str = "subj_id",
                            dst_col: str = "obj_id",
                            broadcast_threshold: int = 2_000_000):
    """Local clustering coefficient per node: cc(v) = 2·T(v) / (d(v)·
    (d(v)−1)) with T(v) = closed wedges centered at v — the transitivity
    profile (Watts–Strogatz 1998) that k-truss thresholds and triangle
    counts summarize globally.

    Plan: the link-prediction coarse-partition wedge pass emits each
    center's peer pairs; closure tests run against the broadcast packed
    edge set (node ids < 2^31; the tier the anti-join uses, here as a
    MEMBERSHIP probe — join fallback above the threshold is the
    triangle_count shape).  cc is ONE round6 division.  Returns
    (node, degree, triangles, cc)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum
    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.util import drop_empty_blocks

    def bidirect(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({
            "node": pa.array(np.concatenate([u, v]), pa.int64()),
            "peer": pa.array(np.concatenate([v, u]), pa.int64())})

    bidir = edges.map_batches(bidirect, batch_format="pyarrow")

    def orient(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        if len(lo):
            assert lo.min() >= 0 and hi.max() < 2**31, \
                "pair packing requires node ids in [0, 2^31)"
        packed = np.unique(lo * PACK + hi)
        return pa.table({"packed": pa.array(packed, pa.int64())})

    from deepkg_ray.stages.treeagg import merge_partials
    simple_packed = merge_partials(
        edges.map_batches(orient, batch_format="pyarrow")
        .map_batches(lambda b: b.append_column(
            "_n", pa.array(np.ones(b.num_rows, np.int64))),
            batch_format="pyarrow"),
        ["packed"], {"_n": "sum"}, mode="auto").materialize()
    assert simple_packed.count() <= broadcast_threshold, \
        "membership broadcast tier only (triangle_count joins beyond it)"
    ep = np.sort(simple_packed.to_pandas()["packed"].to_numpy(np.int64))
    ep_ref = ray.put(ep)

    def add_part(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy(zero_copy_only=False)
        return b.append_column("part", pa.array(
            (node % np.int64(64)).astype(np.int32)))

    def per_partition(g: pa.Table) -> pa.Table:
        edges_arr = ray.get(ep_ref)
        node = g["node"].to_numpy(zero_copy_only=False)
        peer = g["peer"].to_numpy(zero_copy_only=False)
        order = np.lexsort((peer, node))
        node, peer = node[order], peer[order]
        first = np.ones(len(node), bool)
        first[1:] = (node[1:] != node[:-1]) | (peer[1:] != peer[:-1])
        node, peer = node[first], peer[first]
        starts = np.nonzero(np.concatenate(
            ([True], node[1:] != node[:-1])))[0]
        ends = np.concatenate((starts[1:], [len(node)]))
        outn, outd, outt = [], [], []
        for s, e in zip(starts, ends):
            deg = e - s
            outn.append(int(node[s]))
            outd.append(int(deg))
            if deg < 2:
                outt.append(0)
                continue
            p = peer[s:e]
            ai, bi = np.triu_indices(deg, k=1)
            key = p[ai] * PACK + p[bi]
            pos = np.searchsorted(edges_arr, key)
            pos_c = np.clip(pos, 0, max(len(edges_arr) - 1, 0))
            hit = (len(edges_arr) > 0) & (edges_arr[pos_c] == key)
            outt.append(int(hit.sum()))
        return pa.table({
            "node": pa.array(np.asarray(outn, np.int64), pa.int64()),
            "degree": pa.array(np.asarray(outd, np.int64), pa.int64()),
            "triangles": pa.array(np.asarray(outt, np.int64), pa.int64())})

    per_node = (bidir.map_batches(add_part, batch_format="pyarrow")
                .groupby("part").map_groups(per_partition,
                                            batch_format="pyarrow"))

    def finish(b: pa.Table) -> pa.Table:
        d = b["degree"].to_numpy(zero_copy_only=False)
        t = b["triangles"].to_numpy(zero_copy_only=False)
        denom = d * (d - 1)
        cc = round6(np.where(denom > 0,
                             2.0 * t / np.where(denom > 0, denom, 1),
                             0.0))
        return pa.table({"node": b["node"], "degree": b["degree"],
                         "triangles": b["triangles"],
                         "cc": pa.array(cc, pa.float64())})
    return per_node.map_batches(finish, batch_format="pyarrow")


def metapath_counts(adjacency, num_partitions: int | None = None):
    """Meta-path profile of the typed KG: counts of directed 2-paths
    s →p1→ m →p2→ o aggregated by (subj_type, mid_type, obj_type) — the
    schema-level connectivity fingerprint (which type triangles the
    extraction actually produces; the per-instance analog is kg_schema's
    predicate signatures).

    Input is the canonical adjacency (one row per (subj, pred, obj) with
    types attached); paths multiply edge pairs through ONE directed hash
    join on the shared middle vertex, then the |types|³-bounded grid
    folds through per-batch combiners + tree merge.  Returns
    (subj_type, mid_type, obj_type, n_paths)."""
    import pandas as pd
    from deepkg_ray.stages.treeagg import merge_partials
    from deepkg_ray.util import drop_empty_blocks, join_partitions
    if num_partitions is None:
        num_partitions = join_partitions()

    left = adjacency.map_batches(
        lambda b: pa.table({
            "subj_type": b["subj_type"],
            "mid": b["obj_id"],
            "mid_type": b["obj_type"]}),
        batch_format="pyarrow")
    right = adjacency.map_batches(
        lambda b: pa.table({
            "mid2": b["subj_id"],
            "obj_type2": b["obj_type"]}),
        batch_format="pyarrow")

    j = drop_empty_blocks(left).join(
        drop_empty_blocks(right), join_type="inner",
        num_partitions=num_partitions, on=("mid",), right_on=("mid2",))

    def grid(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "subj_type": b["subj_type"].to_pylist(),
            "mid_type": b["mid_type"].to_pylist(),
            "obj_type": b["obj_type2"].to_pylist()})
        g = (df.groupby(["subj_type", "mid_type", "obj_type"],
                        sort=False).size().reset_index(name="n_paths"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return merge_partials(
        drop_empty_blocks(j).map_batches(grid, batch_format="pyarrow"),
        ["subj_type", "mid_type", "obj_type"], {"n_paths": "sum"},
        mode="tree")


def modularity(edges, rounds: int = 4, src_col: str = "subj_id",
               dst_col: str = "obj_id"):
    """Newman modularity of the label-propagation communities over the
    undirected simple graph: per community c,
    Q_c = e_c/m − (d_c/(2m))² with e_c = intra-community undirected
    edges, d_c = community degree sum, m = undirected edge count — the
    community-quality score the reference's graph consumers read off a
    partition (CoreKnowledgeGraph's clustered entity groups).

    Plan: communities come from label_propagation (broadcast tier — the
    node dictionary is entity-vocabulary-bounded, the same collect LPA
    itself performs); one additional edge scan classifies every directed
    es row by its endpoints' labels and emits per-label (deg2, e2) count
    partials, tree-merged to the label-bounded table.  In doubled-edge
    terms Q_c = (e2_c·m2 − d_c²)/m2² with m2 = |es| = 2m, e2_c = 2e_c —
    all integers; the single rounding is the round6 of that exact ratio,
    computed in double (numerators are asserted < 2^53 so the double math
    is exact and hash-matches the SQL mirror, which cannot use DuckDB's
    truncating // on negative numerators).

    Returns (label, n_nodes, intra_edges, degree_total, q_contrib);
    Q = Σ q_contrib (up to the per-community roundings)."""
    import ray
    import ray.data as rd

    from deepkg_ray.stages.dedup import dedup_pair_rows
    from deepkg_ray.stages.treeagg import merge_partials

    lab_df = label_propagation(edges, rounds, src_col, dst_col).to_pandas()
    nd = lab_df["node"].to_numpy(np.int64)
    lb = lab_df["label"].to_numpy(np.int64)
    order = np.argsort(nd, kind="stable")
    nd, lb = nd[order], lb[order]
    ref = ray.put((nd, lb))

    def bidirect(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"u": pa.array(np.concatenate([u, v]), pa.int64()),
                         "v": pa.array(np.concatenate([v, u]), pa.int64())})

    simple = dedup_pair_rows(
        edges.map_batches(bidirect, batch_format="pyarrow"),
        a_col="u", b_col="v").drop_columns(["n_hits"])

    def partial(b: pa.Table) -> pa.Table:
        nodes, labels = ray.get(ref)
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        lu = labels[np.searchsorted(nodes, u)]
        lv = labels[np.searchsorted(nodes, v)]
        uniq, codes = np.unique(lu, return_inverse=True)
        deg2 = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        e2 = np.bincount(codes, weights=(lu == lv).astype(np.float64),
                         minlength=len(uniq)).astype(np.int64)
        return pa.table({"label": pa.array(uniq),
                         "deg2": pa.array(deg2), "e2": pa.array(e2)})

    cells = merge_partials(
        simple.map_batches(partial, batch_format="pyarrow"),
        ["label"], {"deg2": "sum", "e2": "sum"}).to_pandas()

    n_nodes = pd.Series(lb).value_counts()
    deg2 = cells["deg2"].to_numpy(np.int64)        # d_c (each es row adds 1)
    e2 = cells["e2"].to_numpy(np.int64)            # 2·e_c
    m2 = int(deg2.sum())                           # 2·m
    num = e2.astype(np.float64) * m2 - deg2.astype(np.float64) ** 2
    assert (np.abs(e2.astype(object) * m2) < 2 ** 53).all() and \
        (deg2.astype(object) ** 2 < 2 ** 53).all(), \
        "modularity double-exactness bound exceeded; use exact-int tier"
    q = np.floor(num / (float(m2) * m2) * 1e6 + 0.5) / 1e6 if m2 else \
        np.zeros(len(num))
    out = pd.DataFrame({
        "label": cells["label"].to_numpy(np.int64),
        "n_nodes": n_nodes.reindex(cells["label"]).fillna(0)
                    .to_numpy(np.int64),
        "intra_edges": e2 // 2,
        "degree_total": deg2,
        "q_contrib": q})
    return rd.from_pandas(out)


def stress_centrality(edges, src_col: str = "subj_id",
                      dst_col: str = "obj_id", max_nodes: int = 2048):
    """Stress centrality (Shimbel): for every node v, the number of
    shortest s–t paths that pass THROUGH v, over unordered pairs s<t of
    the bidirected simple KG graph — the exactly-integer cousin of
    betweenness (betweenness divides each term by σ_st; stress keeps the
    raw count, so engine ≡ SQL bit for bit with no float dependency
    accumulation).

    Plan: (1) per-source BFS with shortest-path counts σ — the source set
    fans out as a dataset over a broadcast CSR (ray.put once), each task
    O(m) vectorized per source; (2) the (dist, σ) matrices assemble on the
    driver — n²-bounded state, asserted by max_nodes (this operator's
    state IS all-pairs; above the bound, restrict the seed set: landmark
    stress, the closeness_centrality convention) — and broadcast back;
    (3) the O(n²)-per-node pair accumulation fans out node by node:
    stress(v) = Σ_{s<t≠v} [d(s,v)+d(v,t)=d(s,t)]·σ_sv·σ_tv as one masked
    outer product per node.  Returns (node, stress)."""
    import ray
    import ray.data as rd

    def bidirect(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"u": pa.array(np.concatenate([u, v]), pa.int64()),
                         "v": pa.array(np.concatenate([v, u]), pa.int64())})

    simple = (edges.map_batches(bidirect, batch_format="pyarrow")
              .groupby(["u", "v"]).aggregate(Count(alias_name="_m"))
              .drop_columns(["_m"]).to_pandas())
    if len(simple) == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "stress": pa.array([], pa.int64())}))
    us = simple["u"].to_numpy(np.int64)
    vs = simple["v"].to_numpy(np.int64)
    nodes = np.unique(us)
    n = len(nodes)
    assert n <= max_nodes, (
        f"stress_centrality exact tier holds n^2 state: {n} > {max_nodes}; "
        "restrict the seed set (landmark stress) above the bound")
    order = np.lexsort((vs, us))
    ui = np.searchsorted(nodes, us[order])
    nbrs = np.searchsorted(nodes, vs[order]).astype(np.int64)
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, ui + 1, 1)
    np.cumsum(indptr, out=indptr)
    csr_ref = ray.put((indptr, nbrs, n))

    def bfs_sigma(b: pa.Table) -> pa.Table:
        indptr, nbrs, n = ray.get(csr_ref)
        out_s, out_v, out_d, out_g = [], [], [], []
        for s in b["sidx"].to_numpy(zero_copy_only=False):
            dist = np.full(n, -1, np.int32)
            sig = np.zeros(n, np.int64)
            dist[s] = 0
            sig[s] = 1
            frontier = np.asarray([s], np.int64)
            lvl = 0
            while len(frontier):
                cnt = indptr[frontier + 1] - indptr[frontier]
                idx = np.repeat(indptr[frontier], cnt) \
                    + (np.arange(int(cnt.sum()))
                       - np.repeat(np.cumsum(cnt) - cnt, cnt))
                nb = nbrs[idx]
                src_sig = np.repeat(sig[frontier], cnt)
                new = dist[nb] == -1
                dist[nb[new]] = lvl + 1
                on_level = dist[nb] == lvl + 1
                np.add.at(sig, nb[on_level], src_sig[on_level])
                frontier = np.unique(nb[new])
                lvl += 1
            reach = np.flatnonzero(dist >= 0)
            out_s.append(np.full(len(reach), s, np.int64))
            out_v.append(reach.astype(np.int64))
            out_d.append(dist[reach].astype(np.int64))
            out_g.append(sig[reach])
        return pa.table({
            "sidx": pa.array(np.concatenate(out_s)),
            "vidx": pa.array(np.concatenate(out_v)),
            "dist": pa.array(np.concatenate(out_d)),
            "sig": pa.array(np.concatenate(out_g))})

    src_ds = rd.from_arrow(pa.table({
        "sidx": pa.array(np.arange(n, dtype=np.int64))}))
    ap = (src_ds.map_batches(bfs_sigma, batch_format="pyarrow")
          .to_pandas())                      # n^2-bounded (max_nodes assert)

    D = np.full((n, n), -1, np.int32)
    S = np.zeros((n, n), np.int64)
    si = ap["sidx"].to_numpy(np.int64)
    vi = ap["vidx"].to_numpy(np.int64)
    D[si, vi] = ap["dist"].to_numpy(np.int64)
    S[si, vi] = ap["sig"].to_numpy(np.int64)
    mat_ref = ray.put((D, S))

    def per_node(b: pa.Table) -> pa.Table:
        D, S = ray.get(mat_ref)
        out = np.empty(b.num_rows, np.int64)
        for i, v in enumerate(b["vidx"].to_numpy(zero_copy_only=False)):
            dv = D[:, v].astype(np.int64)
            sv = S[:, v]
            ok = (dv >= 0)[:, None] & (dv >= 0)[None, :] & (D >= 0)
            cond = (dv[:, None] + dv[None, :] == D) & ok
            cond[v, :] = False
            cond[:, v] = False
            np.fill_diagonal(cond, False)
            out[i] = int((sv[:, None] * sv[None, :])[cond].sum()) // 2
        return pa.table({"node": pa.array(nodes[
            b["vidx"].to_numpy(zero_copy_only=False)], pa.int64()),
            "stress": pa.array(out)})

    return src_ds.map_batches(
        lambda t: t.rename_columns(["vidx"]),
        batch_format="pyarrow").map_batches(per_node,
                                            batch_format="pyarrow")


def node_bfs_profiles(edges, src_col: str = "subj_id",
                      dst_col: str = "obj_id",
                      max_edges: int = 4_000_000):
    """Per-node BFS profile over the bidirected simple KG graph:
    (node, n_reach, ecc, harmonic_micros) — reach size, eccentricity
    (max distance), and harmonic centrality Σ_{u≠v} 1/d(v,u) in the
    integer-micros convention (1000000 // d: distances are small ints, so
    the per-term floor IS integer division and engine ≡ SQL exactly).

    Unlike stress_centrality this needs NO all-pairs state: the source
    set fans out as a dataset over a broadcast CSR and each source
    collapses to ONE row inside its task.  The CSR broadcast bounds the
    tier (max_edges; restrict the seed set above — landmark profiles,
    the closeness convention)."""
    import ray
    import ray.data as rd

    def bidirect(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"u": pa.array(np.concatenate([u, v]), pa.int64()),
                         "v": pa.array(np.concatenate([v, u]), pa.int64())})

    simple = (edges.map_batches(bidirect, batch_format="pyarrow")
              .groupby(["u", "v"]).aggregate(Count(alias_name="_m"))
              .drop_columns(["_m"]).to_pandas())
    if len(simple) == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "n_reach": pa.array([], pa.int64()),
            "ecc": pa.array([], pa.int64()),
            "harmonic_micros": pa.array([], pa.int64())}))
    assert len(simple) <= max_edges, (
        f"node_bfs_profiles CSR broadcast tier: {len(simple)} > {max_edges}")
    us = simple["u"].to_numpy(np.int64)
    vs = simple["v"].to_numpy(np.int64)
    nodes = np.unique(us)
    n = len(nodes)
    order = np.lexsort((vs, us))
    ui = np.searchsorted(nodes, us[order])
    nbrs = np.searchsorted(nodes, vs[order]).astype(np.int64)
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, ui + 1, 1)
    np.cumsum(indptr, out=indptr)
    csr_ref = ray.put((indptr, nbrs, nodes))

    def profile(b: pa.Table) -> pa.Table:
        indptr, nbrs, nodes = ray.get(csr_ref)
        n = len(nodes)
        out_n, out_r, out_e, out_h = [], [], [], []
        for s in b["sidx"].to_numpy(zero_copy_only=False):
            dist = np.full(n, -1, np.int32)
            dist[s] = 0
            frontier = np.asarray([s], np.int64)
            lvl = 0
            while len(frontier):
                cnt = indptr[frontier + 1] - indptr[frontier]
                idx = np.repeat(indptr[frontier], cnt) \
                    + (np.arange(int(cnt.sum()))
                       - np.repeat(np.cumsum(cnt) - cnt, cnt))
                nb = nbrs[idx]
                new = dist[nb] == -1
                dist[nb[new]] = lvl + 1
                frontier = np.unique(nb[new])
                lvl += 1
            d = dist[dist > 0].astype(np.int64)
            out_n.append(int(nodes[s]))
            out_r.append(len(d) + 1)
            out_e.append(int(d.max()) if len(d) else 0)
            out_h.append(int((1_000_000 // d).sum()))
        return pa.table({
            "node": pa.array(out_n, pa.int64()),
            "n_reach": pa.array(out_r, pa.int64()),
            "ecc": pa.array(out_e, pa.int64()),
            "harmonic_micros": pa.array(out_h, pa.int64())})

    src_ds = rd.from_arrow(pa.table({
        "sidx": pa.array(np.arange(n, dtype=np.int64))}))
    return src_ds.map_batches(profile, batch_format="pyarrow")


def weighted_pagerank_scaled(edges, src_col: str = "subj_id",
                             dst_col: str = "obj_id",
                             weight_col: str = "weight",
                             n_iters: int = 5, damping_pct: int = 85):
    """Weight-proportional PageRank over the directed KG (self-loops
    dropped, parallel edges' weights summed): a node's mass splits across
    out-edges proportionally to edge weight — the evidence-weighted
    variant an adjacency with extraction counts calls for.  Same exact
    int64 unit chain as pagerank_scaled, with the per-edge contribution
    pm·w // W_out (floor per edge, asserted pm·w < 2^63); dangling mass
    dropped.  Returns (node, pr_scaled int64)."""
    import ray.data as rd
    from ray.data.aggregate import Sum as _Sum

    def orient(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        return pa.table({"s": pa.array(u[keep], pa.int64()),
                         "d": pa.array(v[keep], pa.int64()),
                         "w": pa.array(w[keep], pa.int64())})

    dedges = (edges.map_batches(orient, batch_format="pyarrow")
              .groupby(["s", "d"]).aggregate(_Sum("w", alias_name="w"))
              .materialize())

    def nodes_of(b: pa.Table) -> pa.Table:
        both = np.concatenate([b["s"].to_numpy(zero_copy_only=False),
                               b["d"].to_numpy(zero_copy_only=False)])
        return pa.table({"node": pa.array(np.unique(both), pa.int64())})

    nodes = (dedges.map_batches(nodes_of, batch_format="pyarrow")
             .groupby("node").aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"]).materialize())
    n = nodes.count()
    if n == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "pr_scaled": pa.array([], pa.int64())}))
    pm0 = PR_SCALE // n
    base = ((100 - damping_pct) * PR_SCALE) // (100 * n)

    def zero_row(b: pa.Table) -> pa.Table:
        z = np.zeros(b.num_rows, dtype=np.int64)
        return pa.table({"node": b["node"], "val": pa.array(z, pa.int64())})
    zero_rows = nodes.map_batches(zero_row,
                                  batch_format="pyarrow").materialize()

    state = nodes.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "pm": pa.array(np.full(b.num_rows, pm0,
                                                   np.int64))}),
        batch_format="pyarrow")
    dp = damping_pct

    for _ in range(n_iters):
        st_rows = state.map_batches(
            lambda b: pa.table({"node": b["node"], "peer": b["pm"],
                                "w": pa.array(np.zeros(b.num_rows,
                                                       np.int64)),
                                "is_edge": pa.array(
                                    np.zeros(b.num_rows, dtype=bool))}),
            batch_format="pyarrow")
        ed_rows = dedges.map_batches(
            lambda b: pa.table({"node": b["s"], "peer": b["d"],
                                "w": b["w"].combine_chunks()
                                .cast(pa.int64()),
                                "is_edge": pa.array(
                                    np.ones(b.num_rows, dtype=bool))}),
            batch_format="pyarrow")

        def scatter(g: pa.Table) -> pa.Table:
            is_edge = g["is_edge"].to_numpy(zero_copy_only=False)
            peer = g["peer"].to_numpy(zero_copy_only=False)
            w = g["w"].to_numpy(zero_copy_only=False)
            pm = int(peer[~is_edge][0])
            dst = peer[is_edge]
            we = w[is_edge].astype(np.int64)
            if len(dst) == 0:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "val": pa.array([], pa.int64())})
            W = int(we.sum())
            assert we.max() * pm < 2 ** 63, "pm*w overflows int64"
            contrib = (pm * we) // W
            return pa.table({"node": pa.array(dst, pa.int64()),
                             "val": pa.array(contrib, pa.int64())})

        contribs = (st_rows.union(ed_rows).groupby("node")
                    .map_groups(scatter, batch_format="pyarrow"))

        def fold(g: pa.Table) -> pa.Table:
            total = int(pc.sum(g["val"]).as_py() or 0)
            return pa.table({"node": g["node"].slice(0, 1),
                             "pm": pa.array([base + (dp * total) // 100],
                                            pa.int64())})

        state = (contribs.union(zero_rows).groupby("node")
                 .map_groups(fold, batch_format="pyarrow").materialize())

    return state.map_batches(
        lambda b: pa.table({"node": b["node"], "pr_scaled": b["pm"]}),
        batch_format="pyarrow")


def rich_club(edges, src_col: str = "subj_id", dst_col: str = "obj_id"):
    """Rich-club coefficients of the bidirected simple KG graph: for each
    degree threshold k, φ(k) = 2·E_k / (N_k·(N_k−1)) where N_k = nodes
    with degree > k and E_k = edges with BOTH endpoints of degree > k —
    the do-hubs-stick-together connectivity profile (Colizza et al.).

    One histogram pass instead of per-k scans: an edge with
    min(deg_u, deg_v) = m belongs to E_k for every k < m, so a histogram
    of min-degrees + a suffix sum yields every E_k at once (same for N_k
    from the degree histogram).  The degree map broadcasts via ray.put
    (node-dictionary bounded); rows per k where N_k ≥ 2.  Returns
    (k, n_nodes, n_edges, phi)."""
    import ray
    import ray.data as rd

    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.treeagg import merge_partials

    def undirect(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        return pa.table({"u": pa.array(lo), "v": pa.array(hi)})

    und = (edges.map_batches(undirect, batch_format="pyarrow")
           .groupby(["u", "v"]).aggregate(Count(alias_name="_m"))
           .drop_columns(["_m"]).materialize())
    if und.count() == 0:
        return rd.from_arrow(pa.table({
            "k": pa.array([], pa.int64()),
            "n_nodes": pa.array([], pa.int64()),
            "n_edges": pa.array([], pa.int64()),
            "phi": pa.array([], pa.float64())}))

    def deg_rows(b: pa.Table) -> pa.Table:
        both = np.concatenate([b["u"].to_numpy(zero_copy_only=False),
                               b["v"].to_numpy(zero_copy_only=False)])
        n, c = np.unique(both, return_counts=True)
        return pa.table({"node": pa.array(n, pa.int64()),
                         "deg": pa.array(c.astype(np.int64))})

    degs = merge_partials(und.map_batches(deg_rows,
                                          batch_format="pyarrow"),
                          ["node"], {"deg": "sum"}).to_pandas()
    nodes = degs["node"].to_numpy(np.int64)
    dval = degs["deg"].to_numpy(np.int64)
    order = np.argsort(nodes)
    ref = ray.put((nodes[order], dval[order]))

    def md_hist(b: pa.Table) -> pa.Table:
        nd, dg = ray.get(ref)
        du = dg[np.searchsorted(nd, b["u"].to_numpy(
            zero_copy_only=False))]
        dv = dg[np.searchsorted(nd, b["v"].to_numpy(
            zero_copy_only=False))]
        m, c = np.unique(np.minimum(du, dv), return_counts=True)
        return pa.table({"md": pa.array(m.astype(np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    eh = merge_partials(und.map_batches(md_hist, batch_format="pyarrow"),
                        ["md"], {"cnt": "sum"}).to_pandas()

    kmax = int(dval.max())
    ecnt = np.zeros(kmax + 1, np.int64)
    ecnt[eh["md"].to_numpy(np.int64)] = eh["cnt"].to_numpy(np.int64)
    dcnt = np.zeros(kmax + 1, np.int64)
    dn, dc = np.unique(dval, return_counts=True)
    dcnt[dn] = dc
    # suffix sums: E_k / N_k = mass strictly above k
    e_above = np.concatenate((np.cumsum(ecnt[::-1])[::-1][1:], [0]))
    n_above = np.concatenate((np.cumsum(dcnt[::-1])[::-1][1:], [0]))
    ks = np.arange(1, kmax + 1, dtype=np.int64)
    nk = n_above[ks]              # nodes with deg > k
    ek = e_above[ks]              # edges with min(deg) > k
    keep = nk >= 2
    ks, nk, ek = ks[keep], nk[keep], ek[keep]
    phi = round6(2.0 * ek / (nk.astype(np.float64)
                             * (nk - 1).astype(np.float64)))
    return rd.from_arrow(pa.table({
        "k": pa.array(ks), "n_nodes": pa.array(nk),
        "n_edges": pa.array(ek), "phi": pa.array(phi)}))


def walk_counts_from(edges, max_len: int = 4, src_col: str = "subj_id",
                     dst_col: str = "obj_id",
                     driver_threshold: int = 500_000):
    """Directed walk counts from the smallest source node: for k = 1..L,
    n_walks(v, k) = number of length-k directed walks source → v over the
    simple (deduped) edge set — the A^k·e_s matvec sequence (the integer
    backbone of Katz/diffusion scores, exact where the damped variants
    are floats).  Each step is one hash join edges ⋈ state + an integer
    Sum groupby — the SSSP shuffle shape with counts instead of min.
    Below driver_threshold deduped edges the L join rounds are pure
    orchestration overhead, so the matvec chain runs as one vectorized
    np.add.at scatter on the driver (the scc/truss auto-routing
    convention; the distributed path stays the scale tier and is
    exercised by a forced-zero-threshold test).
    Returns (k, node, n_walks)."""
    import ray.data as rd
    from ray.data.aggregate import Sum as _Sum

    from deepkg_ray.util import drop_empty_blocks, join_partitions

    def orient(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        return pa.table({"s": pa.array(u[keep], pa.int64()),
                         "d": pa.array(v[keep], pa.int64())})

    dedges = (edges.map_batches(orient, batch_format="pyarrow")
              .groupby(["s", "d"]).aggregate(Count(alias_name="_m"))
              .drop_columns(["_m"]).materialize())
    n_edges = dedges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "k": pa.array([], pa.int64()),
            "node": pa.array([], pa.int64()),
            "n_walks": pa.array([], pa.int64())}))
    src = int(dedges.min("s"))

    if n_edges <= driver_threshold:
        ed = dedges.to_pandas()
        s = ed["s"].to_numpy(np.int64)
        d = ed["d"].to_numpy(np.int64)
        nodes = np.unique(np.concatenate([s, d]))
        si = np.searchsorted(nodes, s)
        di = np.searchsorted(nodes, d)
        vec = np.zeros(len(nodes), np.int64)
        vec[np.searchsorted(nodes, src)] = 1
        ks, out_nodes, out_n = [], [], []
        for k in range(1, max_len + 1):
            new = np.zeros(len(nodes), np.int64)
            np.add.at(new, di, vec[si])
            vec = new
            nz = np.nonzero(vec)[0]
            ks.append(np.full(len(nz), k, np.int64))
            out_nodes.append(nodes[nz])
            out_n.append(vec[nz])
        return rd.from_arrow(pa.table({
            "k": pa.array(np.concatenate(ks), pa.int64()),
            "node": pa.array(np.concatenate(out_nodes), pa.int64()),
            "n_walks": pa.array(np.concatenate(out_n), pa.int64())}))
    state = rd.from_arrow(pa.table({
        "node": pa.array([src], pa.int64()),
        "n": pa.array([1], pa.int64())})).materialize()
    np_join = join_partitions()
    outs = []
    for k in range(1, max_len + 1):
        cand = drop_empty_blocks(dedges).join(
            drop_empty_blocks(state), join_type="inner",
            num_partitions=np_join, on=("s",), right_on=("node",))
        state = (cand.map_batches(
            lambda b: pa.table({"node": b["d"], "n": b["n"]}),
            batch_format="pyarrow")
            .groupby("node").aggregate(_Sum("n", alias_name="n"))
            .materialize())
        outs.append(state.map_batches(
            lambda b, kk=k: pa.table({
                "k": pa.array(np.full(b.num_rows, kk, np.int64)),
                "node": b["node"].combine_chunks().cast(pa.int64()),
                "n_walks": b["n"].combine_chunks().cast(pa.int64())}),
            batch_format="pyarrow"))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def _temporal_split(spans):
    """Shared temporal-eval split: pair-level min first-observation fold
    (entity²-bounded merge), integer-midpoint cutoff, (train, after)
    filtered views.  Returns (cutoff, train_pairs, after_pairs) — pair
    tables with (lo, hi) columns, lo < hi."""
    from deepkg_ray.stages.treeagg import merge_partials

    def to_pair(b: pa.Table) -> pa.Table:
        u = b["subj_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["obj_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        f = b["first_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        lo = np.minimum(u[keep], v[keep])
        hi = np.maximum(u[keep], v[keep])
        return pa.table({"lo": pa.array(lo, pa.int64()),
                         "hi": pa.array(hi, pa.int64()),
                         "first_us": pa.array(f[keep], pa.int64())})

    pf = merge_partials(
        spans.select_columns(["subj_id", "obj_id", "first_us"])
        .map_batches(to_pair, batch_format="pyarrow"),
        ["lo", "hi"], {"first_us": "min"}, mode="auto").materialize()
    mn, mx = int(pf.min("first_us")), int(pf.max("first_us"))
    cutoff = (mn + mx) // 2
    train = pf.filter(expr=f"first_us < {cutoff}")
    after = pf.filter(expr=f"first_us >= {cutoff}")
    return cutoff, train, after


def temporal_linkpred_eval(spans, min_cn: int = 2,
                           num_partitions: int | None = None):
    """Temporal link-prediction evaluation — the standard KG-completion
    eval run the way production KGs validate a scorer: split edges at a
    time cutoff, score NON-edges of the train graph with structural
    common-neighbor signals, and measure ROC AUC of the score against
    "did this pair actually appear after the cutoff" (Liben-Nowell &
    Kleinberg 2007's temporal protocol; the reference's KG has no eval
    loop at all — this is the beyond-reference quality floor for
    kg_linkpred).

    Input: an edge_spans table (subj_id, pred, obj_id, first_us, ...).
    cutoff = integer midpoint of the pair-level first-observation range.
    Plan: pair-level min-first fold (entity²-bounded merge) → two
    filtered views (train / appeared-after); the candidate scorer is the
    existing link_prediction_scores wedge/anti-join pipeline over the
    train pairs; labels attach with ONE hash join (candidate pairs ×
    after-pairs); the AUC collapses to cn-value histogram cells (exact
    doubled-rank tie handling, the quantiles.roc_auc convention).
    Returns one row (cutoff_us, n_train_pairs, n_new_pairs,
    n_candidates, n_pos, n_neg, auc_num2, auc)."""
    import ray.data as rd

    from deepkg_ray.stages.treeagg import merge_partials
    from deepkg_ray.util import drop_empty_blocks, join_partitions

    if num_partitions is None:
        num_partitions = join_partitions()

    cutoff, train, after = _temporal_split(spans)
    n_train = train.count()
    n_new = after.count()

    cand = link_prediction_scores(
        train.map_batches(
            lambda b: pa.table({"subj_id": b["lo"], "obj_id": b["hi"]}),
            batch_format="pyarrow"),
        min_cn=min_cn, num_partitions=num_partitions)

    lab = drop_empty_blocks(cand.select_columns(["e1", "e2", "cn"])) \
        .join(drop_empty_blocks(
            after.map_batches(
                lambda b: pa.table({
                    "e1": b["lo"], "e2": b["hi"],
                    "pos": pa.array(np.ones(b.num_rows, np.int64))}),
                batch_format="pyarrow")),
            join_type="left_outer", num_partitions=num_partitions,
            on=("e1", "e2"))

    def cells(b: pa.Table) -> pa.Table:
        cn = b["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.nan_to_num(
            b["pos"].to_numpy(zero_copy_only=False).astype(np.float64),
            nan=0.0).astype(np.int64)
        vals, inv = np.unique(cn, return_inverse=True)
        p = np.bincount(inv, weights=pos).astype(np.int64)
        q = np.bincount(inv, weights=1 - pos).astype(np.int64)
        return pa.table({"cn": pa.array(vals, pa.int64()),
                         "p": pa.array(p, pa.int64()),
                         "q": pa.array(q, pa.int64())})

    hist = merge_partials(
        drop_empty_blocks(lab).map_batches(cells, batch_format="pyarrow"),
        ["cn"], {"p": "sum", "q": "sum"}, mode="tree") \
        .to_pandas().sort_values("cn")
    p = hist["p"].to_numpy(np.int64)
    q = hist["q"].to_numpy(np.int64)
    n_pos, n_neg = int(p.sum()), int(q.sum())
    qb = np.concatenate([[0], q.cumsum()[:-1]]) if len(q) else q
    num2 = int(np.sum(p * (2 * qb + q)))
    auc = float(num2) / (2.0 * float(n_pos) * float(n_neg)) \
        if n_pos and n_neg else 0.0
    return rd.from_arrow(pa.table({
        "cutoff_us": pa.array([cutoff], pa.int64()),
        "n_train_pairs": pa.array([n_train], pa.int64()),
        "n_new_pairs": pa.array([n_new], pa.int64()),
        "n_candidates": pa.array([n_pos + n_neg], pa.int64()),
        "n_pos": pa.array([n_pos], pa.int64()),
        "n_neg": pa.array([n_neg], pa.int64()),
        "auc_num2": pa.array([num2], pa.int64()),
        "auc": pa.array([auc], pa.float64())}))


def temporal_linkpred_ranking(spans, ks=(1, 5, 10), min_cn: int = 1,
                              num_partitions: int | None = None):
    """KG-completion ranking metrics over the temporal split: for every
    pair that APPEARS after the cutoff, the rank of its hi endpoint among
    the lo endpoint's candidate partners (cn desc, partner asc) —
    MRR and Hits@k, the standard completion eval (Bordes et al. 2013's
    ranking protocol on structural scores; a new pair outside the
    candidate set counts as a miss, reciprocal rank 0).

    Plan: _temporal_split + the wedge scorer (min_cn=1 keeps candidate
    lists dense); candidates explode to (endpoint, partner, cn) rows and
    hash-join the after-pairs on the lo endpoint; each (lo, hi) group
    ranks vectorized in one task (group size = that endpoint's candidate
    count).  rr is exact micros floor(1e6/rank + 0.5); the MRR/Hits
    finish divides by n_eval once.  Returns one row (cutoff_us, n_eval,
    n_ranked, rr_micros, mrr, n_hits@k..., plus hits rates)."""
    import pandas as pd
    import ray.data as rd

    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.util import drop_empty_blocks, join_partitions

    if num_partitions is None:
        num_partitions = join_partitions()
    ks = tuple(sorted(set(int(k) for k in ks)))

    cutoff, train, after = _temporal_split(spans)
    n_eval = after.count()

    cand = link_prediction_scores(
        train.map_batches(
            lambda b: pa.table({"subj_id": b["lo"], "obj_id": b["hi"]}),
            batch_format="pyarrow"),
        min_cn=min_cn, num_partitions=num_partitions)

    def explode(b: pa.Table) -> pa.Table:
        e1 = b["e1"].to_numpy(zero_copy_only=False).astype(np.int64)
        e2 = b["e2"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = b["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "node": pa.array(np.concatenate([e1, e2]), pa.int64()),
            "partner": pa.array(np.concatenate([e2, e1]), pa.int64()),
            "cn": pa.array(np.concatenate([cn, cn]), pa.int64())})

    side = cand.select_columns(["e1", "e2", "cn"]) \
        .map_batches(explode, batch_format="pyarrow")
    ev = drop_empty_blocks(
        after.map_batches(
            lambda b: pa.table({"node": b["lo"], "hi": b["hi"]}),
            batch_format="pyarrow")) \
        .join(drop_empty_blocks(side), join_type="inner",
              num_partitions=num_partitions, on=("node",))

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (node, hi), grp in g.groupby(["node", "hi"], sort=False):
            hit = grp[grp["partner"] == hi]
            if not len(hit):
                continue
            cn_true = int(hit["cn"].iloc[0])
            cn = grp["cn"].to_numpy(np.int64)
            pr = grp["partner"].to_numpy(np.int64)
            rank = 1 + int(((cn > cn_true)
                            | ((cn == cn_true) & (pr < hi))).sum())
            out.append((rank,))
        return pd.DataFrame(out, columns=["rank"])

    rdf = drop_empty_blocks(ev).groupby("node").map_groups(
        ranks, batch_format="pandas")

    def cells(b: pa.Table) -> pa.Table:
        r = b["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        row = {"n_ranked": np.int64(len(r)),
               "rr_micros": np.floor(1e6 / r + 0.5).astype(np.int64)
                                .sum()}
        for k in ks:
            row[f"n_hits{k}"] = np.int64((r <= k).sum())
        return pa.table({c: pa.array([int(v)], pa.int64())
                         for c, v in row.items()})

    # one combiner row per block → the driver sums a block-count-bounded
    # frame (the roc_auc finish posture)
    agg = drop_empty_blocks(rdf).map_batches(
        cells, batch_format="pyarrow").to_pandas()
    n_ranked = int(agg["n_ranked"].sum()) if len(agg) else 0
    rrm = int(agg["rr_micros"].sum()) if len(agg) else 0
    cols = {
        "cutoff_us": pa.array([cutoff], pa.int64()),
        "n_eval": pa.array([n_eval], pa.int64()),
        "n_ranked": pa.array([n_ranked], pa.int64()),
        "rr_micros": pa.array([rrm], pa.int64()),
        "mrr": pa.array([float(round6(np.asarray(
            [rrm / 1e6 / n_eval if n_eval else 0.0])))], pa.float64())}
    for k in ks:
        nh = int(agg[f"n_hits{k}"].sum()) if len(agg) else 0
        cols[f"n_hits{k}"] = pa.array([nh], pa.int64())
        cols[f"hits{k}"] = pa.array([float(round6(np.asarray(
            [nh / n_eval if n_eval else 0.0])))], pa.float64())
    return rd.from_arrow(pa.table(cols))


def temporal_linkpred_calibration(spans, min_cn: int = 2,
                                  num_partitions: int | None = None):
    """Reliability curve of the common-neighbor scorer over the temporal
    split: per cn value, how many candidate pairs exist and what
    fraction actually appeared after the cutoff — the calibration table
    that turns a ranking score into an edge-probability estimate (and
    exposes score saturation the AUC can't show).  Same split + scorer +
    label join as temporal_linkpred_eval, stopping at the cn histogram.
    Returns (cn, n, n_pos, pos_rate) rows."""
    import ray.data as rd

    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.treeagg import merge_partials
    from deepkg_ray.util import drop_empty_blocks, join_partitions

    if num_partitions is None:
        num_partitions = join_partitions()
    cutoff, train, after = _temporal_split(spans)
    cand = link_prediction_scores(
        train.map_batches(
            lambda b: pa.table({"subj_id": b["lo"], "obj_id": b["hi"]}),
            batch_format="pyarrow"),
        min_cn=min_cn, num_partitions=num_partitions)
    lab = drop_empty_blocks(cand.select_columns(["e1", "e2", "cn"])) \
        .join(drop_empty_blocks(
            after.map_batches(
                lambda b: pa.table({
                    "e1": b["lo"], "e2": b["hi"],
                    "pos": pa.array(np.ones(b.num_rows, np.int64))}),
                batch_format="pyarrow")),
            join_type="left_outer", num_partitions=num_partitions,
            on=("e1", "e2"))

    def cells(b: pa.Table) -> pa.Table:
        cn = b["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.nan_to_num(
            b["pos"].to_numpy(zero_copy_only=False).astype(np.float64),
            nan=0.0).astype(np.int64)
        vals, inv = np.unique(cn, return_inverse=True)
        return pa.table({
            "cn": pa.array(vals, pa.int64()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "n_pos": pa.array(np.bincount(inv, weights=pos)
                              .astype(np.int64))})

    hist = merge_partials(
        drop_empty_blocks(lab).map_batches(cells, batch_format="pyarrow"),
        ["cn"], {"n": "sum", "n_pos": "sum"}, mode="tree")

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        p = b["n_pos"].to_numpy(zero_copy_only=False).astype(np.float64)
        return b.append_column("pos_rate", pa.array(round6(p / n)))

    return hist.map_batches(finish, batch_format="pyarrow")


def kg_edge_proposals(spans, min_cn: int = 2,
                      min_rate_micros: int = 250_000,
                      num_partitions: int | None = None):
    """Calibrated KG-completion proposals — the actionable end product
    of the temporal eval family: every train-graph non-edge whose
    common-neighbor count carries a calibrated appeared-after rate ≥ the
    threshold, annotated with that rate and whether the edge DID appear
    after the cutoff (appeared = confirmation, not-appeared = the open
    proposal a curator reviews).  Plan: the shared split + wedge scorer
    + label join; the cn→rate map is the cn-bounded calibration
    histogram (driver dict, broadcast in the finish closure).
    Returns (e1, e2, cn, pos_rate, appeared) rows."""
    import ray.data as rd

    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.treeagg import merge_partials
    from deepkg_ray.util import drop_empty_blocks, join_partitions

    if num_partitions is None:
        num_partitions = join_partitions()
    cutoff, train, after = _temporal_split(spans)
    cand = link_prediction_scores(
        train.map_batches(
            lambda b: pa.table({"subj_id": b["lo"], "obj_id": b["hi"]}),
            batch_format="pyarrow"),
        min_cn=min_cn, num_partitions=num_partitions)
    lab = drop_empty_blocks(cand.select_columns(["e1", "e2", "cn"])) \
        .join(drop_empty_blocks(
            after.map_batches(
                lambda b: pa.table({
                    "e1": b["lo"], "e2": b["hi"],
                    "pos": pa.array(np.ones(b.num_rows, np.int64))}),
                batch_format="pyarrow")),
            join_type="left_outer", num_partitions=num_partitions,
            on=("e1", "e2")).materialize()

    def cells(b: pa.Table) -> pa.Table:
        cn = b["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.nan_to_num(
            b["pos"].to_numpy(zero_copy_only=False).astype(np.float64),
            nan=0.0).astype(np.int64)
        vals, inv = np.unique(cn, return_inverse=True)
        return pa.table({
            "cn": pa.array(vals, pa.int64()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "n_pos": pa.array(np.bincount(inv, weights=pos)
                              .astype(np.int64))})

    hist = merge_partials(
        drop_empty_blocks(lab).map_batches(cells, batch_format="pyarrow"),
        ["cn"], {"n": "sum", "n_pos": "sum"}, mode="tree").to_pandas()
    rate_of = {
        int(c): int(np.floor(p / n * 1e6 + 0.5))
        for c, n, p in zip(hist["cn"], hist["n"], hist["n_pos"])}

    def finish(b: pa.Table) -> pa.Table:
        cn = b["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
        rate = np.fromiter((rate_of[int(c)] for c in cn), np.int64,
                           count=len(cn))
        pos = np.nan_to_num(
            b["pos"].to_numpy(zero_copy_only=False).astype(np.float64),
            nan=0.0).astype(np.int64)
        keep = rate >= min_rate_micros
        return pa.table({
            "e1": pa.array(b["e1"].to_numpy(
                zero_copy_only=False).astype(np.int64)[keep]),
            "e2": pa.array(b["e2"].to_numpy(
                zero_copy_only=False).astype(np.int64)[keep]),
            "cn": pa.array(cn[keep], pa.int64()),
            "pos_rate": pa.array(rate[keep].astype(np.float64) / 1e6,
                                 pa.float64()),
            "appeared": pa.array(pos[keep], pa.int64())})

    return drop_empty_blocks(lab).map_batches(finish,
                                              batch_format="pyarrow")


# ------------------------------------------------ maximal independent set --

def _mis_priority(nodes: np.ndarray) -> np.ndarray:
    """Deterministic unique MIS priority per node: the md5 hash (mod 2^40)
    shifted over the id (nodes must fit 20 bits — entity dictionaries do;
    asserted).  Random-order priorities give Luby's O(log n) round bound;
    embedding the id makes every priority unique so comparisons never
    tie.  SQL twin: (md5_number_lower(node::VARCHAR) % 2^40) * 2^20 +
    node."""
    from deepkg_ray.stages.sketches import _hash64
    assert nodes.size == 0 or (nodes.min() >= 0 and nodes.max() < 1 << 20), \
        "MIS priority packing requires node ids < 2^20"
    h = _hash64([str(int(n)) for n in nodes])
    return ((h % np.uint64(1 << 40)).astype(np.int64) << 20) + nodes


def maximal_independent_set(edges, src_col: str = "subj_id",
                            dst_col: str = "obj_id", max_rounds: int = 12,
                            mode: str = "broadcast",
                            num_partitions: int | None = None):
    """Luby-style maximal independent set over the undirected simple graph
    (Luby 1986): each synchronous round, every undecided node whose
    priority is a strict local minimum among its undecided neighbors joins
    the MIS and its neighbors leave the candidate pool — the classic
    distributed symmetry-breaking primitive (scheduling, graph coloring,
    parallel greedy).  Deterministic: priorities are id-derived hashes
    (_mis_priority), so the result equals the sequential greedy MIS in
    hash-priority order on any partitioning.

    mode='broadcast': node statuses are a driver array (node dictionary is
    driver-sized); each round is two shuffle-free edge scans — (a) per-node
    min undecided-neighbor priority, tree-merged; (b) mark neighbors of
    the new MIS members.  mode='join': the undecided frontier is a
    Dataset; each round joins it onto the edge table twice (both-endpoint
    filter → per-node Min, then exclusion scatter) — nothing node-sized on
    the driver.  Raises if the graph is not fully decided after
    ``max_rounds`` (the SQL oracle unrolls the same fixed count; decided
    states are fixpoints, so early convergence is round-count safe).
    Returns a Dataset (node, in_mis ∈ {0,1})."""
    import ray
    import ray.data as rd

    from deepkg_ray.stages.dedup import dedup_pair_rows
    from deepkg_ray.stages.treeagg import merge_partials
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()

    def bidirect(b: pa.Table) -> pa.Table:
        u = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"u": pa.array(np.concatenate([u, v]), pa.int64()),
                         "v": pa.array(np.concatenate([v, u]), pa.int64())})

    simple = dedup_pair_rows(
        edges.map_batches(bidirect, batch_format="pyarrow"),
        a_col="u", b_col="v").drop_columns(["n_hits"]).materialize()

    if mode == "join":
        return _mis_join_tier(simple, max_rounds, num_partitions)

    nodes = np.unique(np.concatenate(
        [b["u"].to_numpy(zero_copy_only=False)
         for b in simple.select_columns(["u"]).iter_batches(
             batch_format="pyarrow")] or [np.empty(0, np.int64)]))
    prs = _mis_priority(nodes)
    status = np.zeros(nodes.size, dtype=np.int8)      # 0 und / 1 mis / 2 out

    for _ in range(max_rounds):
        und_idx = np.flatnonzero(status == 0)
        if und_idx.size == 0:
            break
        ref = ray.put((nodes, prs, status))

        def min_nbr(b: pa.Table, r=ref) -> pd.DataFrame:
            nd, pr, st = ray.get(r)
            u = b["u"].to_numpy(zero_copy_only=False)
            v = b["v"].to_numpy(zero_copy_only=False)
            iu, iv = np.searchsorted(nd, u), np.searchsorted(nd, v)
            keep = (st[iu] == 0) & (st[iv] == 0)
            d = pd.DataFrame({"u": u[keep], "pv": pr[iv[keep]]})
            return d.groupby("u", sort=False, as_index=False)["pv"].min()

        mn = merge_partials(
            simple.map_batches(min_nbr, batch_format="pyarrow"),
            ["u"], {"pv": "min"}, fanout=2).to_pandas()
        mins = np.full(nodes.size, np.iinfo(np.int64).max, dtype=np.int64)
        if len(mn):
            mins[np.searchsorted(nodes, mn["u"].to_numpy())] = \
                mn["pv"].to_numpy(np.int64)
        new_mis = und_idx[prs[und_idx] < mins[und_idx]]
        status[new_mis] = 1
        mref = ray.put((nodes, status, frozenset(nodes[new_mis].tolist())))

        def nbrs_of_mis(b: pa.Table, r=mref) -> pa.Table:
            nd, st, mset = ray.get(r)
            u = b["u"].to_numpy(zero_copy_only=False)
            v = b["v"].to_numpy(zero_copy_only=False)
            keep = np.fromiter((x in mset for x in u), dtype=bool,
                               count=u.size)
            out = np.unique(v[keep])
            return pa.table({"v": pa.array(out, pa.int64()),
                             "one": pa.array(np.ones(out.size, np.int64))})

        ex = merge_partials(
            simple.map_batches(nbrs_of_mis, batch_format="pyarrow"),
            ["v"], {"one": "min"}, fanout=2).to_pandas()
        if len(ex):
            ei = np.searchsorted(nodes, ex["v"].to_numpy())
            status[ei[status[ei] == 0]] = 2
    if (status == 0).any():
        raise ValueError(
            f"maximal_independent_set: {int((status == 0).sum())} nodes "
            f"undecided after {max_rounds} rounds — raise max_rounds")
    return rd.from_pandas(pd.DataFrame({
        "node": nodes, "in_mis": (status == 1).astype(np.int64)}))


def _mis_join_tier(simple, max_rounds: int, num_partitions: int):
    """Join-tier MIS rounds: the undecided frontier is a Dataset
    (node, pr); decided rows accumulate in a result list unioned at the
    end.  Same round semantics as the broadcast tier (tier-agreement
    pytest).  Filtering is vectorized batch-level; every join input that
    derives from a hash groupby/join is drop_empty_blocks-cleaned (see
    util.drop_empty_blocks for the 0-column-shard hazard)."""
    import ray.data as rd

    from deepkg_ray.util import drop_empty_blocks

    def seed(b: pa.Table) -> pa.Table:
        u = np.unique(b["u"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(u, pa.int64()),
                         "pr": pa.array(_mis_priority(u), pa.int64())})

    und = drop_empty_blocks(
        simple.select_columns(["u"]).map_batches(seed,
                                                 batch_format="pyarrow")
        .groupby("node").aggregate(Min("pr", alias_name="pr")))
    decided = []
    for _ in range(max_rounds):
        if und.count() == 0:
            break
        # both-endpoint-undecided edges, neighbor priority attached
        e1 = simple.join(
            und.map_batches(lambda b: b.rename_columns(["v", "pv"]),
                            batch_format="pyarrow"),
            join_type="inner", num_partitions=num_partitions, on=("v",))
        e2 = drop_empty_blocks(e1).join(
            und.map_batches(lambda b: pa.table({"u": b["node"]}),
                            batch_format="pyarrow"),
            join_type="inner", num_partitions=num_partitions, on=("u",))
        mn = drop_empty_blocks(
            drop_empty_blocks(e2).groupby("u")
            .aggregate(Min("pv", alias_name="mn")))
        if mn.count() == 0:
            # frontier is itself independent (no undecided-undecided
            # edges): every remaining node joins — guard the all-empty
            # join-side case drop_empty_blocks documents
            new_mis = und.map_batches(
                lambda b: pa.table({"node": b["node"]}),
                batch_format="pyarrow").materialize()
        else:
            jo = drop_empty_blocks(und.join(
                mn.map_batches(lambda b: b.rename_columns(["node", "mn"]),
                               batch_format="pyarrow"),
                join_type="left_outer", num_partitions=num_partitions,
                on=("node",)))

            def winners(b: pa.Table) -> pa.Table:
                pr = b["pr"].to_numpy(zero_copy_only=False)
                mn_ = np.asarray(
                    b["mn"].to_pandas().fillna(np.iinfo(np.int64).max),
                    dtype=np.int64)
                return pa.table(
                    {"node": b["node"].filter(pa.array(pr < mn_))})

            new_mis = drop_empty_blocks(
                jo.map_batches(winners, batch_format="pyarrow"))
        decided.append(new_mis.map_batches(
            lambda b: pa.table({"node": b["node"],
                                "in_mis": pa.array(
                                    np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow").materialize())
        # neighbors of new MIS members leave the pool as excluded
        excl = (drop_empty_blocks(simple.join(
            new_mis.map_batches(lambda b: pa.table({"u": b["node"]}),
                                batch_format="pyarrow"),
            join_type="inner", num_partitions=num_partitions, on=("u",)))
            .groupby("v").aggregate(Count(alias_name="_c"))
            .map_batches(lambda b: pa.table({"node": b["v"]}),
                         batch_format="pyarrow"))
        gone = drop_empty_blocks(
            new_mis.union(drop_empty_blocks(excl)).groupby("node")
            .aggregate(Count(alias_name="_g")))
        nxt = drop_empty_blocks(und.join(
            gone.map_batches(lambda b: b.rename_columns(["node", "_g"]),
                             batch_format="pyarrow"),
            join_type="left_outer", num_partitions=num_partitions,
            on=("node",)))
        marked = drop_empty_blocks(nxt.join(
            new_mis.map_batches(
                lambda b: pa.table({"node": b["node"],
                                    "_m": pa.array(
                                        np.ones(b.num_rows, np.int64))}),
                batch_format="pyarrow"),
            join_type="left_outer", num_partitions=num_partitions,
            on=("node",)))

        def excluded(b: pa.Table) -> pa.Table:
            mask = pc.and_kleene(pc.is_valid(b["_g"]), pc.is_null(b["_m"]))
            mask = pc.fill_null(mask, False)
            node = b["node"].filter(mask)
            return pa.table({
                "node": node,
                "in_mis": pa.array(np.zeros(len(node), np.int64))})

        decided.append(marked.map_batches(excluded, batch_format="pyarrow")
                       .materialize())

        def still_undecided(b: pa.Table) -> pa.Table:
            mask = pc.is_null(b["_g"])
            return pa.table({"node": b["node"].filter(mask),
                             "pr": b["pr"].filter(mask)})

        und = drop_empty_blocks(
            nxt.map_batches(still_undecided, batch_format="pyarrow"))
    if und.count() > 0:
        raise ValueError(
            f"maximal_independent_set(join): {und.count()} nodes undecided "
            f"after {max_rounds} rounds — raise max_rounds")
    if not decided:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "in_mis": pa.array([], pa.int64())}))
    out = decided[0]
    for d in decided[1:]:
        out = out.union(d)
    return out
