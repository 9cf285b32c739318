"""Graph operators: connected components (driver vs distributed parity),
dedup cluster stats, degrees, triangle counting."""

import numpy as np
import pandas as pd
import ray.data as rd

from deepkg_ray.stages import graph


def _pairs_ds(edges):
    df = pd.DataFrame({"doc_a": np.array([e[0] for e in edges], np.int64),
                       "doc_b": np.array([e[1] for e in edges], np.int64)})
    return rd.from_pandas(df), df


def test_union_find_known_components():
    # {1,2,3} via chain, {10,11}, and a cycle {20,21,22}
    _, df = _pairs_ds([(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)])
    out = graph.union_find_components(df).set_index("node")["component"]
    assert out.to_dict() == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                             20: 20, 21: 20, 22: 20}


def test_distributed_matches_driver_on_random_graph():
    rng = np.random.default_rng(11)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 60, (80, 2))
             if a != b]
    ds, df = _pairs_ds(edges)
    want = (graph.union_find_components(df)
            .sort_values("node").reset_index(drop=True))
    got = (graph.connected_components(ds, mode="distributed").to_pandas()
           .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["node", "component"]],
                                  want[["node", "component"]],
                                  check_dtype=False)


def test_connected_components_auto_small_and_empty():
    ds, df = _pairs_ds([(5, 9), (9, 7)])
    out = graph.connected_components(ds).to_pandas().set_index("node")
    assert out["component"].to_dict() == {5: 5, 9: 5, 7: 5}
    empty = rd.from_pandas(pd.DataFrame({
        "doc_a": pd.Series([], dtype=np.int64),
        "doc_b": pd.Series([], dtype=np.int64)}))
    assert graph.connected_components(empty).count() == 0


def test_cluster_stats():
    ds, _ = _pairs_ds([(1, 2), (2, 3), (10, 11)])
    cc = graph.connected_components(ds)
    stats = (graph.dedup_cluster_stats(cc).to_pandas()
             .set_index("component")["n_members"].to_dict())
    assert stats == {1: 3, 10: 2}


def _edges_ds(edges):
    return rd.from_pandas(pd.DataFrame({
        "subj_id": np.array([e[0] for e in edges], np.int64),
        "obj_id": np.array([e[1] for e in edges], np.int64)}))


def test_node_degrees_distinct_and_bidirectional():
    # multi-edge 1->2 twice, and both directions 2->3 / 3->2: degree is
    # distinct-neighbor, direction-free
    ds = _edges_ds([(1, 2), (1, 2), (2, 3), (3, 2)])
    deg = (graph.node_degrees(ds).to_pandas()
           .set_index("node")["degree"].to_dict())
    assert deg == {1: 1, 2: 2, 3: 1}


def test_triangle_count_known_graphs():
    # triangle + pendant edge = 1 triangle
    ds = _edges_ds([(1, 2), (2, 3), (3, 1), (3, 4)])
    assert graph.triangle_count(ds).to_pandas()["n_triangles"][0] == 1
    # K4 = 4 triangles, with duplicate/reversed/self-loop noise
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(1, 0), (2, 2), (0, 1)]
    assert graph.triangle_count(_edges_ds(noisy)).to_pandas(
        )["n_triangles"][0] == 4
    # no triangle in a path
    path = _edges_ds([(1, 2), (2, 3), (3, 4)])
    assert graph.triangle_count(path).to_pandas()["n_triangles"][0] == 0


def _naive_pagerank(edges, n_iters=5, dp=85, scale=10**12):
    """Per-definition integer PageRank mirror (dedupe, drop self-loops)."""
    simple = sorted({(u, v) for u, v in edges if u != v})
    nodes = sorted({x for e in simple for x in e})
    n = len(nodes)
    pm = {x: scale // n for x in nodes}
    out = {}
    for u, v in simple:
        out.setdefault(u, []).append(v)
    base = (100 - dp) * scale // (100 * n)
    for _ in range(n_iters):
        tot = {x: 0 for x in nodes}
        for u, vs in out.items():
            c = pm[u] // len(vs)
            for v in vs:
                tot[v] += c
        pm = {x: base + (dp * tot[x]) // 100 for x in nodes}
    return pm


def test_pagerank_matches_naive_reference():
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (1, 2), (2, 2), (5, 1)]
    ds = _edges_ds(edges)
    got = (graph.pagerank_scaled(ds, n_iters=5).to_pandas()
           .set_index("node")["pr_scaled"].to_dict())
    assert got == _naive_pagerank(edges)
    # rank sanity: node 1 (most in-links) outranks the dangling-ish node 5
    assert got[1] > got[5]


def test_kcore_peels_to_known_core():
    # K4 on {1,2,3,4} plus a pendant path 4-5-6: 3-core = the K4 (the path
    # peels away over two rounds).
    ds, _ = _pairs_ds([(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                       (4, 5), (5, 6)])
    out = graph.kcore_nodes(ds, k=3, src_col="doc_a", dst_col="doc_b")
    df = out.to_pandas().sort_values("node").reset_index(drop=True)
    assert df["node"].tolist() == [1, 2, 3, 4]
    assert (df["degree"] == 3).all()


def test_kcore_modes_agree_on_random_graph():
    rng = np.random.default_rng(5)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 40, (120, 2))]
    ds, _ = _pairs_ds(edges)
    bc = (graph.kcore_nodes(ds, k=3, src_col="doc_a", dst_col="doc_b")
          .to_pandas().sort_values("node").reset_index(drop=True))
    jn = (graph.kcore_nodes(ds, k=3, src_col="doc_a", dst_col="doc_b",
                            mode="join")
          .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(bc, jn)
    assert len(bc) > 0 and (bc["degree"] >= 3).all()


def test_kcore_empty_when_k_too_large():
    ds, _ = _pairs_ds([(1, 2), (2, 3)])
    assert graph.kcore_nodes(ds, k=3, src_col="doc_a",
                             dst_col="doc_b").count() == 0


def test_bfs_modes_agree_and_match_known_distances():
    # path 1-2-3-4 plus branch 2-5; node 9-10 disconnected
    ds, _ = _pairs_ds([(1, 2), (2, 3), (3, 4), (2, 5), (9, 10)])
    want = {1: 0, 2: 1, 3: 2, 5: 2, 4: 3}
    bc = (graph.bfs_distances(ds, [1], src_col="doc_a", dst_col="doc_b")
          .to_pandas())
    assert dict(zip(bc["node"], bc["dist"])) == want
    jn = (graph.bfs_distances(ds, [1], src_col="doc_a", dst_col="doc_b",
                              mode="join").to_pandas())
    assert dict(zip(jn["node"], jn["dist"])) == want


def test_bfs_multi_source_takes_min_hops():
    ds, _ = _pairs_ds([(1, 2), (2, 3), (3, 4), (4, 5)])
    out = (graph.bfs_distances(ds, [1, 5], src_col="doc_a", dst_col="doc_b")
           .to_pandas())
    assert dict(zip(out["node"], out["dist"])) == {1: 0, 5: 0, 2: 1,
                                                   4: 1, 3: 2}


def test_label_propagation_golden_and_modes(ray_session):
    import ray.data as rd
    from deepkg_ray.stages.graph import label_propagation
    # triangle {0,1,2} + pendant 3-4 chain; node 2 bridges
    edges = pd.DataFrame({
        "subj_id": np.array([0, 1, 0, 2, 3], dtype=np.int64),
        "obj_id": np.array([1, 2, 2, 3, 4], dtype=np.int64),
    })
    ds = rd.from_pandas(edges)
    b = (label_propagation(ds, rounds=4, mode="broadcast").to_pandas()
         .sort_values("node").reset_index(drop=True))
    j = (label_propagation(ds, rounds=4, mode="join").to_pandas()
         .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(b, j[["node", "label"]], check_dtype=False)
    # brute-force synchronous LPA, tie -> min label
    adj = {0: {1, 2}, 1: {0, 2}, 2: {0, 1, 3}, 3: {2, 4}, 4: {3}}
    lab = {n: n for n in adj}
    for _ in range(4):
        new = {}
        for n, nb in adj.items():
            cnt = {}
            for m in nb:
                cnt[lab[m]] = cnt.get(lab[m], 0) + 1
            best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[n] = best
        if new == lab:
            break
        lab = new
    want = pd.DataFrame(sorted(lab.items()), columns=["node", "label"])
    pd.testing.assert_frame_equal(b, want, check_dtype=False)


def test_negative_triples_filtered(ray_session):
    import ray.data as rd
    from deepkg_ray.stages.graph import negative_triples
    adj = pd.DataFrame({
        "subj_id": np.array([0, 0, 1], dtype=np.int64),
        "pred": ["r", "r", "s"],
        "obj_id": np.array([1, 2, 2], dtype=np.int64),
    })
    # V = 3; corruption k=1: (0,r,2) collides with positive -> filtered
    out = (negative_triples(rd.from_pandas(adj), ks=(1,))
           .to_pandas().sort_values(["subj_id", "pred", "obj_neg"])
           .reset_index(drop=True))
    want = {(0, "r", 0), (1, "s", 0)}   # (0,r,2) dropped as a positive
    assert set(map(tuple, out[["subj_id", "pred", "obj_neg"]]
                   .itertuples(index=False))) == want
    assert (out["k"] == 1).all()


def test_random_walks_deterministic_golden(ray_session):
    import ray.data as rd
    from deepkg_ray.stages.graph import WALK_C1, WALK_C2, random_walks
    edges = pd.DataFrame({
        "subj_id": np.array([0, 0, 1, 2], dtype=np.int64),
        "obj_id": np.array([1, 2, 2, 3], dtype=np.int64),
    })
    out = (random_walks(rd.from_pandas(edges), steps=2, start_mod=3)
           .to_pandas())
    # starts: nodes {0, 3}
    assert set(out[out["step"] == 0]["node"]) == {0, 3}
    # hand-walk start 0: nbrs(0)=[1,2]; t=1: (0*C1+1*C2)%2
    adj = {0: [1, 2], 1: [0, 2], 2: [0, 1, 3], 3: [2]}
    for s in (0, 3):
        cur = s
        for t in (1, 2):
            cur = adj[cur][(cur * WALK_C1 + t * WALK_C2) % len(adj[cur])]
            got = out[(out["start"] == s) & (out["step"] == t)]["node"]
            assert list(got) == [cur], (s, t)


def test_random_walks_modes_agree(ray_session):
    import ray.data as rd
    from deepkg_ray.stages.graph import random_walks
    rng = np.random.default_rng(17)
    edges = pd.DataFrame({
        "subj_id": rng.integers(0, 30, size=80).astype(np.int64),
        "obj_id": rng.integers(0, 30, size=80).astype(np.int64),
    })
    edges = edges[edges["subj_id"] != edges["obj_id"]]
    ds = rd.from_pandas(edges)
    d = (random_walks(ds, steps=3, start_mod=2, mode="dict").to_pandas()
         .sort_values(["start", "step"]).reset_index(drop=True))
    j = (random_walks(ds, steps=3, start_mod=2, mode="join").to_pandas()
         .sort_values(["start", "step"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(d, j[d.columns], check_dtype=False)
    assert len(d) > 0


def test_hits_matches_naive_reference():
    import ray.data as rd
    from deepkg_ray.stages.graph import hits_scaled, HITS_SCALE
    rng = np.random.default_rng(5)
    edges = pd.DataFrame({
        "subj_id": rng.integers(0, 20, size=60).astype(np.int64),
        "obj_id": rng.integers(0, 20, size=60).astype(np.int64),
    })
    edges = edges[edges["subj_id"] != edges["obj_id"]]
    got = (hits_scaled(rd.from_pandas(edges), n_iters=3).to_pandas()
           .sort_values("node").reset_index(drop=True))
    # naive integer reference with the identical op chain
    de = edges.drop_duplicates(["subj_id", "obj_id"])
    nodes = sorted(set(de["subj_id"]) | set(de["obj_id"]))
    idx = {n: i for i, n in enumerate(nodes)}
    E = [(idx[s], idx[d]) for s, d in de.itertuples(index=False)]
    h = {i: HITS_SCALE for i in range(len(nodes))}
    a = {}
    for _ in range(3):
        raw = {i: 0 for i in range(len(nodes))}
        for s, d in E:
            raw[d] += h[s]
        mx = max(raw.values())
        a = {i: (v * HITS_SCALE) // mx if mx else 0 for i, v in raw.items()}
        raw = {i: 0 for i in range(len(nodes))}
        for s, d in E:
            raw[s] += a[d]
        mx = max(raw.values())
        h = {i: (v * HITS_SCALE) // mx if mx else 0 for i, v in raw.items()}
    want = pd.DataFrame({"node": nodes,
                         "hub_scaled": [h[idx[n]] for n in nodes],
                         "auth_scaled": [a[idx[n]] for n in nodes]})
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)
    assert got["hub_scaled"].max() == HITS_SCALE


def test_reciprocity_golden():
    import ray.data as rd
    from deepkg_ray.stages.graph import reciprocity
    # edges: 1<->2 reciprocal, 1->3 one-way, 3->3 self-loop dropped,
    # duplicate 1->2 deduped
    edges = pd.DataFrame({"subj_id": [1, 2, 1, 3, 1],
                          "obj_id": [2, 1, 3, 3, 2]})
    out = reciprocity(rd.from_pandas(edges)).to_pandas()
    assert out["n_edges"].tolist() == [3]
    assert out["n_reciprocal"].tolist() == [2]
    import math
    assert out["reciprocity"].tolist() == [math.floor(2 / 3 * 1e6 + 0.5) / 1e6]


def test_personalized_pagerank_golden_and_seed_bias():
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.graph import PR_SCALE, personalized_pagerank_scaled

    # 1->2->3->1 triangle plus 4->3 ; seeds = {1, 2}
    edges = pd.DataFrame({"subj_id": [1, 2, 3, 4],
                          "obj_id": [2, 3, 1, 3]})
    out = (personalized_pagerank_scaled(rd.from_pandas(edges), n_seeds=2,
                                        n_iters=5)
           .to_pandas().set_index("node")["ppr_scaled"].to_dict())

    # pure-python replica of the documented int64 op chain
    seeds, dp = {1, 2}, 85
    adj = {1: [2], 2: [3], 3: [1], 4: [3]}
    nodes = [1, 2, 3, 4]
    base = {v: ((100 - dp) * PR_SCALE) // (100 * len(seeds))
            if v in seeds else 0 for v in nodes}
    pm = {v: PR_SCALE // len(seeds) if v in seeds else 0 for v in nodes}
    for _ in range(5):
        tot = {v: 0 for v in nodes}
        for u, dsts in adj.items():
            c = pm[u] // len(dsts)
            for d in dsts:
                tot[d] += c
        pm = {v: base[v] + (dp * tot[v]) // 100 for v in nodes}
    assert out == pm
    # restart bias: the seed set holds more mass than the non-seeds
    assert out[1] + out[2] > out[3] + out[4]
    # node 4 has no in-edges and is not a seed -> exactly zero
    assert out[4] == 0


def test_truss_edges_golden_and_cascade():
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.graph import truss_edges

    # triangle (1,2,3) + pendant (3,4) + tail (4,5): 3-truss = the triangle
    e = pd.DataFrame({"subj_id": [1, 2, 3, 3, 4],
                      "obj_id": [2, 3, 1, 4, 5]})
    out = (truss_edges(rd.from_pandas(e), k=3).to_pandas()
           .sort_values(["e1", "e2"]).reset_index(drop=True))
    assert out.values.tolist() == [[1, 2], [1, 3], [2, 3]]

    # square with one diagonal: 4-truss cascades to empty (diagonal's
    # support collapses after round-1 removals)
    e2 = pd.DataFrame({"subj_id": [1, 2, 3, 4, 1],
                       "obj_id": [2, 3, 4, 1, 3]})
    out2 = truss_edges(rd.from_pandas(e2), k=4)
    assert out2.count() == 0


def test_sssp_weighted_golden():
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.graph import sssp_weighted

    # weighted path beats fewer hops: 1-2 (w=10) vs 1-3-2 (w=2+3)
    # parallel rows between 1 and 4 keep the MIN weight (7 over 9)
    e = pd.DataFrame({
        "subj_id": [1, 1, 3, 1, 4, 5],
        "obj_id":  [2, 3, 2, 4, 1, 6],
        "weight":  [10, 2, 3, 9, 7, 1]})
    out = (sssp_weighted(rd.from_pandas(e)).to_pandas()
           .set_index("node")["dist"].to_dict())
    # source = smallest node = 1; nodes 5,6 unreachable
    assert out == {1: 0, 2: 5, 3: 2, 4: 7}


def test_scc_components_golden():
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.graph import scc_components

    # cycle {1,2,3}, 2-cycle {5,6}, bridge 3->5, DAG tail 6->7
    e = pd.DataFrame({"subj_id": [1, 2, 3, 3, 5, 6, 6],
                      "obj_id":  [2, 3, 1, 5, 6, 5, 7]})
    out = (scc_components(rd.from_pandas(e)).to_pandas()
           .set_index("node")["component"].to_dict())
    assert out == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 7}


def test_closeness_centrality_path_graph():
    """Path 1-2-3-4: closeness(1) = 3/(1+2+3), closeness(2) = 3/(1+1+2);
    all 4 nodes are seeds (k=4), every seed reaches all 4 nodes."""
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.graph import closeness_centrality
    edges = pd.DataFrame({"subj_id": [1, 2, 3], "obj_id": [2, 3, 4]})
    out = (closeness_centrality(rd.from_pandas(edges), k_seeds=4)
           .to_pandas().sort_values("seed").reset_index(drop=True))
    assert out["seed"].tolist() == [1, 2, 3, 4]
    assert out["n_reach"].tolist() == [4, 4, 4, 4]
    assert out["total_dist"].tolist() == [6, 4, 4, 6]
    assert abs(out["closeness"][0] - 0.5) < 1e-12
    assert abs(out["closeness"][1] - 0.75) < 1e-12


def test_closeness_centrality_disconnected():
    """Two components: a seed in the small component reaches only it."""
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.graph import closeness_centrality
    edges = pd.DataFrame({"subj_id": [1, 10], "obj_id": [2, 11]})
    out = (closeness_centrality(rd.from_pandas(edges), k_seeds=2)
           .to_pandas().sort_values("seed").reset_index(drop=True))
    assert out["seed"].tolist() == [1, 2]
    assert out["n_reach"].tolist() == [2, 2]
    assert out["total_dist"].tolist() == [1, 1]


def test_diameter_2sweep_path_exact():
    """2-sweep is exact on trees: path 5-6-7-8-9 has diameter 4; starting
    from an interior smallest id still finds an endpoint."""
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.graph import diameter_2sweep
    edges = pd.DataFrame({"subj_id": [5, 6, 7, 8], "obj_id": [6, 7, 8, 9]})
    out = diameter_2sweep(rd.from_pandas(edges)).to_pandas()
    assert out["src"].tolist() == [5]
    assert out["far_node"].tolist() == [9]
    assert out["diameter_lb"].tolist() == [4]


def test_scc_driver_and_distributed_tiers_agree():
    """The Tarjan driver tier (default routing for small edge lists) and
    the FW-BW distributed path (forced via driver_threshold=0) must
    produce the identical min-member labeling on a random digraph."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.graph import scc_components

    rng = np.random.default_rng(11)
    e = pd.DataFrame({
        "subj_id": rng.integers(0, 30, 120).astype(np.int64),
        "obj_id": rng.integers(0, 30, 120).astype(np.int64)})
    ds = rd.from_pandas(e)
    fast = (scc_components(ds).to_pandas()
            .sort_values("node").reset_index(drop=True))
    slow = (scc_components(ds, driver_threshold=0).to_pandas()
            .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, slow)


def test_truss_driver_and_distributed_tiers_agree():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.graph import truss_edges

    rng = np.random.default_rng(13)
    e = pd.DataFrame({
        "subj_id": rng.integers(0, 25, 150).astype(np.int64),
        "obj_id": rng.integers(0, 25, 150).astype(np.int64)})
    ds = rd.from_pandas(e)
    fast = (truss_edges(ds, k=3).to_pandas()
            .sort_values(["e1", "e2"]).reset_index(drop=True))
    slow = (truss_edges(ds, k=3, driver_threshold=0).to_pandas()
            .sort_values(["e1", "e2"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, slow)


def test_two_hop_sizes_path_graph():
    """Path 1-2-3-4-5: node 1 reaches {2,3}, node 3 reaches {1,2,4,5}."""
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.graph import two_hop_sizes
    e = pd.DataFrame({"subj_id": [1, 2, 3, 4], "obj_id": [2, 3, 4, 5]})
    out = (two_hop_sizes(rd.from_pandas(e)).to_pandas()
           .set_index("node").sort_index())
    assert out["n1"].tolist() == [1, 2, 2, 2, 1]
    assert out["n2"].tolist() == [2, 3, 4, 3, 2]


def test_two_hop_driver_and_distributed_tiers_agree():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.graph import two_hop_sizes
    rng = np.random.default_rng(19)
    e = pd.DataFrame({
        "subj_id": rng.integers(0, 22, 80).astype(np.int64),
        "obj_id": rng.integers(0, 22, 80).astype(np.int64)})
    ds = rd.from_pandas(e)
    fast = (two_hop_sizes(ds).to_pandas()
            .sort_values("node").reset_index(drop=True))
    slow = (two_hop_sizes(ds, driver_threshold=0).to_pandas()
            .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, slow)


def test_degree_distribution_star_graph():
    """Star 0-{1..5}: center degree 5 (one node), leaves degree 1 (5)."""
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.graph import degree_distribution
    e = pd.DataFrame({"subj_id": [0] * 5,
                      "obj_id": [1, 2, 3, 4, 5]})
    out = (degree_distribution(rd.from_pandas(e)).to_pandas()
           .set_index("degree").sort_index())
    assert out["n_nodes"].to_dict() == {1: 5, 5: 1}


def test_assortativity_star_is_negative():
    """A star graph is maximally disassortative (r = −1)."""
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.graph import degree_assortativity
    e = pd.DataFrame({"subj_id": [0] * 5, "obj_id": [1, 2, 3, 4, 5]})
    out = degree_assortativity(rd.from_pandas(e)).to_pandas()
    assert abs(out["r"].item() + 1.0) < 1e-9


def test_assortativity_tiers_agree():
    """The distributed two-hash-join tier (forced via broadcast_max=0)
    must produce the same exact moments and r as the broadcast tier."""
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.graph import degree_assortativity
    rng = __import__("numpy").random.default_rng(7)
    e = pd.DataFrame({"subj_id": rng.integers(0, 40, 300),
                      "obj_id": rng.integers(0, 40, 300)})
    a = degree_assortativity(rd.from_pandas(e)).to_pandas()
    b = degree_assortativity(rd.from_pandas(e),
                             broadcast_max=0).to_pandas()
    assert a["m"].item() == b["m"].item()
    assert a["r"].item() == b["r"].item()


def test_assortativity_cycle_is_degenerate_zero():
    """A cycle has constant degree → zero variance → r reported as 0."""
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.graph import degree_assortativity
    e = pd.DataFrame({"subj_id": [1, 2, 3, 4], "obj_id": [2, 3, 4, 1]})
    out = degree_assortativity(rd.from_pandas(e)).to_pandas()
    assert out["r"].item() == 0.0


def test_clustering_triangle_and_star():
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.graph import clustering_coefficients
    # triangle {1,2,3} each cc=1; star center 4-{5,6} cc=0 (no 5-6 edge)
    e = pd.DataFrame({"subj_id": [1, 2, 3, 4, 4],
                      "obj_id": [2, 3, 1, 5, 6]})
    out = (clustering_coefficients(rd.from_pandas(e)).to_pandas()
           .set_index("node").sort_index())
    assert out.loc[1, "cc"] == 1.0 and out.loc[3, "cc"] == 1.0
    assert out.loc[4, "cc"] == 0.0
    assert out.loc[4, "triangles"] == 0 and out.loc[1, "triangles"] == 1


def test_metapath_counts_golden():
    """Typed chain A-1->B-2->C plus B-2->D gives two 2-paths from 1."""
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.graph import metapath_counts
    adj = pd.DataFrame({
        "subj_id": [1, 2, 2],
        "obj_id": [2, 3, 4],
        "subj_type": ["A", "B", "B"],
        "obj_type": ["B", "C", "D"],
        "pred": ["p", "p", "p"]})
    out = (metapath_counts(rd.from_pandas(adj)).to_pandas()
           .sort_values(["subj_type", "mid_type", "obj_type"])
           .reset_index(drop=True))
    assert list(zip(out["subj_type"], out["mid_type"],
                    out["obj_type"])) == [("A", "B", "C"), ("A", "B", "D")]
    assert out["n_paths"].tolist() == [1, 1]


def test_modularity_golden(ray_session):
    """Two disjoint triangles: LPA labels each triangle with its min node;
    per community e_c = 3, d_c = 6, m = 6 → Q_c = 3/6 - (6/12)^2 = 0.25."""
    import ray.data as rd

    from deepkg_ray.stages.graph import modularity
    edges = pd.DataFrame({
        "subj_id": np.array([0, 1, 0, 10, 11, 10], dtype=np.int64),
        "obj_id": np.array([1, 2, 2, 11, 12, 12], dtype=np.int64),
    })
    out = (modularity(rd.from_pandas(edges), rounds=4).to_pandas()
           .sort_values("label").reset_index(drop=True))
    assert out["label"].tolist() == [0, 10]
    assert out["n_nodes"].tolist() == [3, 3]
    assert out["intra_edges"].tolist() == [3, 3]
    assert out["degree_total"].tolist() == [6, 6]
    assert np.allclose(out["q_contrib"], [0.25, 0.25])
    # bipartite 4-chain: synchronous LPA 2-cycles into the alternating
    # partition {0,2}/{1,3}, both sides edgeless inside => Q_c = -(1/2)^2
    chain = pd.DataFrame({"subj_id": np.array([0, 1, 2], np.int64),
                          "obj_id": np.array([1, 2, 3], np.int64)})
    o2 = modularity(rd.from_pandas(chain), rounds=8).to_pandas()
    assert sorted(o2["intra_edges"]) == [0, 0]
    assert np.allclose(sorted(o2["q_contrib"]), [-0.25, -0.25])


def test_stress_centrality_goldens(ray_session):
    """Closed forms: path interior nodes, star center C(k,2), diamond
    (two parallel shortest paths each counted)."""
    import pyarrow as pa

    def run(su, ob):
        ds = rd.from_arrow(pa.table({
            "subj_id": pa.array(su, pa.int64()),
            "obj_id": pa.array(ob, pa.int64())}))
        out = graph.stress_centrality(ds).to_pandas()
        return dict(zip(out["node"], out["stress"]))

    assert run([0, 1, 2], [1, 2, 3]) == {0: 0, 1: 2, 2: 2, 3: 0}
    assert run([0, 0, 0, 0], [1, 2, 3, 4]) == {0: 6, 1: 0, 2: 0, 3: 0, 4: 0}
    assert run([0, 0, 1, 2], [1, 2, 3, 3]) == {0: 1, 1: 1, 2: 1, 3: 1}


def test_node_bfs_profiles_goldens(ray_session):
    """Path 0-1-2-3: ecc, reach, harmonic closed forms."""
    import pyarrow as pa
    ds = rd.from_arrow(pa.table({
        "subj_id": pa.array([0, 1, 2], pa.int64()),
        "obj_id": pa.array([1, 2, 3], pa.int64())}))
    out = graph.node_bfs_profiles(ds).to_pandas().set_index("node")
    assert out.loc[0, "ecc"] == 3 and out.loc[1, "ecc"] == 2
    assert (out["n_reach"] == 4).all()
    # node 1: d = 1,1,2 -> 1e6 + 1e6 + 500000
    assert out.loc[1, "harmonic_micros"] == 2_500_000
    # node 0: d = 1,2,3 -> 1e6 + 500000 + 333333
    assert out.loc[0, "harmonic_micros"] == 1_833_333


def test_weighted_pagerank_uniform_equals_unweighted(ray_session):
    """With all weights equal the weighted variant reduces exactly to
    pagerank_scaled (same int64 chain)."""
    import pandas as pd
    import pyarrow as pa
    edges = pa.table({
        "subj_id": pa.array([0, 0, 1, 2, 3], pa.int64()),
        "obj_id": pa.array([1, 2, 2, 3, 0], pa.int64()),
        "weight": pa.array([7, 7, 7, 7, 7], pa.int64())})
    w = (graph.weighted_pagerank_scaled(rd.from_arrow(edges))
         .to_pandas().sort_values("node").reset_index(drop=True))
    u = (graph.pagerank_scaled(rd.from_arrow(edges))
         .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(w, u, check_dtype=False)

    # unequal weights shift mass toward the heavy edge
    edges2 = pa.table({
        "subj_id": pa.array([0, 0], pa.int64()),
        "obj_id": pa.array([1, 2], pa.int64()),
        "weight": pa.array([9, 1], pa.int64())})
    w2 = graph.weighted_pagerank_scaled(rd.from_arrow(edges2)) \
        .to_pandas().set_index("node")["pr_scaled"]
    assert w2[1] > w2[2]


def test_rich_club_goldens(ray_session):
    """Star + clique hybrid: the clique is the rich club."""
    import pyarrow as pa
    # triangle 0-1-2 (deg 3,3,2 after pendants) + pendants 3,4 on 0 and 1
    edges = [(0, 1), (1, 2), (0, 2), (0, 3), (1, 4)]
    ds = rd.from_arrow(pa.table({
        "subj_id": pa.array([e[0] for e in edges], pa.int64()),
        "obj_id": pa.array([e[1] for e in edges], pa.int64())}))
    out = graph.rich_club(ds).to_pandas().set_index("k")
    # degrees: 0->3, 1->3, 2->2, 3->1, 4->1
    # k=1: nodes {0,1,2} (deg>1), edges among them = 3 -> phi = 1.0
    assert out.loc[1, "n_nodes"] == 3 and out.loc[1, "n_edges"] == 3
    assert out.loc[1, "phi"] == 1.0
    # k=2: nodes {0,1}, edge (0,1) -> phi = 1.0
    assert out.loc[2, "n_nodes"] == 2 and out.loc[2, "phi"] == 1.0


def test_walk_counts_goldens(ray_session):
    """Directed diamond 0→1, 0→2, 1→3, 2→3: two length-2 walks to 3."""
    import pyarrow as pa
    ds = rd.from_arrow(pa.table({
        "subj_id": pa.array([0, 0, 1, 2], pa.int64()),
        "obj_id": pa.array([1, 2, 3, 3], pa.int64())}))
    out = graph.walk_counts_from(ds, max_len=2).to_pandas()
    got = {(r.k, r.node): r.n_walks for r in out.itertuples()}
    assert got[(1, 1)] == 1 and got[(1, 2)] == 1
    assert got[(2, 3)] == 2
    assert (2, 1) not in got            # no length-2 walk ends at 1


def test_walk_counts_tiers_agree(ray_session):
    """Driver matvec tier == distributed join rounds on a random digraph."""
    import pyarrow as pa
    rng = np.random.default_rng(7)
    s = rng.integers(0, 40, 300).astype(np.int64)
    d = rng.integers(0, 40, 300).astype(np.int64)
    ds = rd.from_arrow(pa.table({"subj_id": pa.array(s),
                                 "obj_id": pa.array(d)}))
    a = (graph.walk_counts_from(ds, max_len=3).to_pandas()
         .sort_values(["k", "node"]).reset_index(drop=True))
    b = (graph.walk_counts_from(ds, max_len=3, driver_threshold=0)
         .to_pandas().sort_values(["k", "node"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_eigenvector_scaled_golden(ray_session):
    """Star 0-1, 0-2, 0-3: the hub dominates; leaves tie below it.
    After round 1: raw(0)=3·scale -> x0=scale; leaves raw=scale ->
    x=scale//3.  Naive integer recurrence mirrored in pure python."""
    import pyarrow as pa
    ds = rd.from_arrow(pa.table({
        "subj_id": pa.array([0, 0, 0], pa.int64()),
        "obj_id": pa.array([1, 2, 3], pa.int64())}))
    out = (graph.eigenvector_scaled(ds, n_iters=3).to_pandas()
           .set_index("node")["eig_scaled"])
    scale = 10 ** 6
    # pure-python reference on the symmetric star
    x = {n: scale for n in range(4)}
    for _ in range(3):
        raw = {0: x[1] + x[2] + x[3], 1: x[0], 2: x[0], 3: x[0]}
        mx = max(raw.values())
        x = {n: (raw[n] * scale) // mx for n in raw}
    for n in range(4):
        assert out[n] == x[n], (n, out[n], x[n])
    assert out[0] == scale and out[1] == out[2] == out[3] < scale


def test_harmonic_centrality_golden(ray_session):
    """Path 1-2-3-4 with k_seeds=2: seed 1 sees d=1,2,3 →
    hm = 1e6 + 5e5 + 333333; seed 2 sees d=1,1,2 → 2e6 + 5e5.
    Disconnected node 9-10 pair untouched (seeds are smallest ids)."""
    ds = _edges_ds([(1, 2), (2, 3), (3, 4), (9, 10)])
    out = (graph.harmonic_centrality(ds, k_seeds=2).to_pandas()
           .set_index("seed"))
    assert out.loc[1, "harmonic_micros"] == 1_000_000 + 500_000 + 333_333
    assert out.loc[2, "harmonic_micros"] == 2_000_000 + 500_000
    assert out.loc[1, "n_reach"] == 4 and out.loc[2, "n_reach"] == 4


def test_katz_scaled_golden(ray_session):
    """Path 1->2->3 plus 4->2: node 2 collects two β-sized in-flows, 3
    collects 2's growing score, sources stay at β.  Naive integer
    recurrence mirrored in pure python (α = 1/5, scale = 1e6)."""
    import pyarrow as pa
    ds = rd.from_arrow(pa.table({
        "subj_id": pa.array([1, 2, 4], pa.int64()),
        "obj_id": pa.array([2, 3, 2], pa.int64())}))
    out = (graph.katz_scaled(ds, n_iters=3).to_pandas()
           .set_index("node")["katz_scaled"])
    scale = 10 ** 6
    ins = {2: [1, 4], 3: [2], 1: [], 4: []}
    x = {n: scale for n in ins}
    for _ in range(3):
        x = {n: scale + (1 * sum(x[u] for u in ins[n])) // 5 for n in ins}
    for n in ins:
        assert out[n] == x[n], (n, out[n], x[n])
    assert out[2] > out[3] > out[1] == out[4] == scale


def test_edge_embeddedness_golden(ray_session):
    """Triangle {1,2,3} + bridge 3-4: triangle edges have cn=1, the
    bridge has cn=0 and still appears."""
    ds = _edges_ds([(1, 2), (2, 3), (3, 1), (3, 4)])
    out = (graph.edge_embeddedness(ds).to_pandas()
           .set_index(["e1", "e2"])["cn"].to_dict())
    assert out == {(1, 2): 1, (2, 3): 1, (1, 3): 1, (3, 4): 0}
    # K4: every edge sits in 2 triangles
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    out2 = graph.edge_embeddedness(_edges_ds(k4)).to_pandas()
    assert (out2["cn"] == 2).all() and len(out2) == 6


def test_avg_neighbor_degree_tiers_agree(ray_session):
    """Star 0-{1,2,3}: hub's neighbors all have degree 1 -> 1.0;
    leaves see the hub's degree 3 -> 3.0.  Broadcast and join tiers
    agree on a random graph."""
    ds = _edges_ds([(0, 1), (0, 2), (0, 3)])
    out = (graph.avg_neighbor_degree(ds).to_pandas()
           .set_index("node"))
    assert out.loc[0, "avg_nbr_deg"] == 1.0 and out.loc[0, "degree"] == 3
    assert out.loc[1, "avg_nbr_deg"] == 3.0
    rng = np.random.default_rng(3)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 30, (80, 2))
             if a != b]
    ds2 = _edges_ds(edges)
    a = (graph.avg_neighbor_degree(ds2).to_pandas()
         .sort_values("node").reset_index(drop=True))
    b = (graph.avg_neighbor_degree(ds2, broadcast_threshold=0)
         .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_robustness_profile_golden(ray_session):
    """Star 0-{1..4} plus pendant pair 5-6: k=0 LCC is the 5-node star;
    k=1 removes hub 0 and only the 5-6 pair remains."""
    ds = _edges_ds([(0, 1), (0, 2), (0, 3), (0, 4), (5, 6)])
    out = (graph.robustness_profile(ds, ks=(0, 1)).to_pandas()
           .set_index("k_removed"))
    assert out.loc[0, "n_nodes"] == 7
    assert out.loc[0, "lcc_size"] == 5
    assert out.loc[1, "n_nodes"] == 2      # leaves lost all edges
    assert out.loc[1, "lcc_size"] == 2
    assert out.loc[1, "lcc_share"] == 1.0


def test_kg_temporal_linkpred_matches_duckdb(sf_dir, ray_session):
    """Temporal split + CN scoring + exact doubled-rank AUC equals the
    SQL composition, and the AUC is a valid probability."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m
    got = m.queries()["kg_temporal_linkpred"](sf_dir).to_pandas()
    import duckdb

    from deepkg_ray.oracle import kg_temporal_linkpred_oracle
    con = duckdb.connect()
    want = con.sql(kg_temporal_linkpred_oracle(sf_dir)).df()
    for c in ["cutoff_us", "n_train_pairs", "n_new_pairs",
              "n_candidates", "n_pos", "n_neg", "auc_num2"]:
        assert int(got[c].iloc[0]) == int(want[c].iloc[0]), c
    assert got["auc"].iloc[0] == want["auc"].iloc[0]
    assert 0.0 <= got["auc"].iloc[0] <= 1.0


def test_kg_temporal_ranking_matches_duckdb(sf_dir, ray_session):
    """MRR/Hits@k ranking eval equals the SQL composition; metric
    invariants hold (hits1 <= hits5 <= hits10 <= n_ranked/n_eval,
    mrr in [0, 1])."""
    import sys

    sys.path.insert(0, "/root/repo")
    import duckdb

    import __ray_entry__ as m
    from deepkg_ray.oracle import kg_temporal_ranking_oracle
    got = m.queries()["kg_temporal_ranking"](sf_dir).to_pandas()
    con = duckdb.connect()
    want = con.sql(kg_temporal_ranking_oracle(sf_dir)).df()
    for c in sorted(got.columns):
        assert got[c].iloc[0] == want[c].iloc[0], c
    r = got.iloc[0]
    assert r["n_hits1"] <= r["n_hits5"] <= r["n_hits10"] <= r["n_ranked"]
    assert 0.0 <= r["mrr"] <= 1.0


def test_kg_temporal_calibration_matches_duckdb(sf_dir, ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import duckdb

    import __ray_entry__ as m
    from deepkg_ray.oracle import kg_temporal_calibration_oracle
    got = (m.queries()["kg_temporal_calibration"](sf_dir).to_pandas()
           .sort_values("cn").reset_index(drop=True))
    con = duckdb.connect()
    want = (con.sql(kg_temporal_calibration_oracle(sf_dir)).df()
            .sort_values("cn").reset_index(drop=True))
    for c in ["cn", "n", "n_pos", "pos_rate"]:
        assert got[c].tolist() == want[c].tolist(), c
    assert (got["n_pos"] <= got["n"]).all()


def test_kg_edge_proposals_matches_duckdb(sf_dir, ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import duckdb

    from deepkg_ray import synth
    from deepkg_ray.oracle import kg_edge_proposals_oracle
    from deepkg_ray.pipelines import kg
    from deepkg_ray.sources.readers import read_transcripts
    from deepkg_ray.stages.canonical import edge_spans
    from deepkg_ray.stages.graph import kg_edge_proposals
    turns = read_transcripts(synth.transcripts_path(sf_dir),
                             columns=["conv_id", "turn_idx", "ts"])
    spans = edge_spans(kg.linked_triples_dataset(sf_dir), turns)
    got = (kg_edge_proposals(spans, min_cn=2, min_rate_micros=1)
           .to_pandas().sort_values(["e1", "e2"]).reset_index(drop=True))
    con = duckdb.connect()
    want = (con.sql(kg_edge_proposals_oracle(sf_dir, min_rate_micros=1))
            .df().sort_values(["e1", "e2"]).reset_index(drop=True))
    for c in ["e1", "e2", "cn", "pos_rate", "appeared"]:
        assert got[c].tolist() == want[c].tolist(), c
    assert len(got) > 0 and set(got["appeared"]) <= {0, 1}
