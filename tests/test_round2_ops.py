"""Round-2 additions: moving average, ROLLUP, co-occurrence, link
prediction, PCA power projection — brute-force / DuckDB parity at tiny
scale."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- moving avg --

def test_moving_average_golden_and_user_isolation():
    from deepkg_ray.stages.windows import moving_average
    df = pd.DataFrame({
        "user_id": ["a", "a", "a", "a", "b", "b"],
        "event_id": np.arange(6, dtype=np.int64),
        "ts": pd.to_datetime([1, 2, 3, 4, 1, 2], unit="s"),
        "value": [1.0, 2.0, 6.0, 3.0, 10.0, 20.0],
    })
    out = (moving_average(rd.from_pandas(df), k=3, n_parts=4).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    # windows: [1], [1,2], [1,2,6], [2,6,3] | [10], [10,20]
    assert out["n_window"].tolist() == [1, 2, 3, 3, 1, 2]
    assert out["ma_value"].tolist() == [1.0, 1.5, 3.0, 3.666667, 10.0, 15.0]


def test_moving_average_matches_duckdb_on_events():
    from deepkg_ray.oracle import moving_average_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import moving_average
    got = (moving_average(read_events(SF, ["user_id", "event_id", "ts",
                                           "value"]), k=3)
           .to_pandas().sort_values(["user_id", "event_id"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = (con.execute(moving_average_oracle(k=3)).fetchdf()
            .sort_values(["user_id", "event_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["user_id", "event_id", "n_window", "ma_value"]],
        want[["user_id", "event_id", "n_window", "ma_value"]],
        check_dtype=False)


# ------------------------------------------------------------------ rollup --

def test_pricing_rollup_levels_consistent_and_duckdb_exact():
    from deepkg_ray.oracle import pricing_rollup_oracle
    from deepkg_ray.pipelines.relational import pricing_rollup
    got = (pricing_rollup(SF).to_pandas()
           .sort_values(["l_returnflag", "l_linestatus"])
           .reset_index(drop=True))
    # internal consistency: grand total equals the sum of the finest level
    fine = got[(got.l_returnflag != "ALL") & (got.l_linestatus != "ALL")]
    total = got[(got.l_returnflag == "ALL") & (got.l_linestatus == "ALL")]
    assert int(total["count_order"].iloc[0]) == int(fine["count_order"].sum())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF}/lineitem.parquet')")
    want = (con.execute(pricing_rollup_oracle()).fetchdf()
            .sort_values(["l_returnflag", "l_linestatus"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


# ----------------------------------------------------------- co-occurrence --

def test_cooccurrence_brute_force_parity():
    from deepkg_ray.stages.mention import cooccurrence_counts
    mentions = pd.DataFrame({
        "conv_id": ["c1", "c1", "c1", "c1", "c2", "c2", "c2"],
        "turn_idx": np.array([0, 0, 0, 1, 0, 0, 0], np.int32),
        "entity_id": np.array([7, 3, 3, 7, 3, 7, 9], np.int64),
    })
    got = (cooccurrence_counts(rd.from_pandas(mentions)).to_pandas()
           .sort_values(["e1", "e2"]).reset_index(drop=True))
    # c1t0: {3,7}; c1t1: {7}; c2t0: {3,7,9}
    want = pd.DataFrame({"e1": [3, 3, 7], "e2": [7, 9, 9],
                         "n_turns": [2, 1, 1]})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# --------------------------------------------------------- link prediction --

def _lp_brute(edges, min_cn):
    import collections
    import math
    nbrs = collections.defaultdict(set)
    eset = set()
    for u, v in edges:
        if u == v:
            continue
        nbrs[u].add(v)
        nbrs[v].add(u)
        eset.add((min(u, v), max(u, v)))
    cand = collections.defaultdict(lambda: [0, 0])
    for z, peers in nbrs.items():
        deg = len(peers)
        if deg < 2:
            continue
        wm = int(math.floor(1e6 / deg + 0.5))
        ps = sorted(peers)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                cand[(ps[i], ps[j])][0] += 1
                cand[(ps[i], ps[j])][1] += wm
    rows = [(a, b, cn, ram / 1e6) for (a, b), (cn, ram) in cand.items()
            if cn >= min_cn and (a, b) not in eset]
    return (pd.DataFrame(rows, columns=["e1", "e2", "cn", "ra"])
            .sort_values(["e1", "e2"]).reset_index(drop=True))


def test_link_prediction_brute_force_parity():
    from deepkg_ray.stages.graph import link_prediction
    rng = np.random.default_rng(5)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 25, (60, 2))]
    ds = rd.from_pandas(pd.DataFrame(
        {"subj_id": np.array([e[0] for e in edges], np.int64),
         "obj_id": np.array([e[1] for e in edges], np.int64)}))
    got = (link_prediction(ds, min_cn=1).to_pandas()
           .sort_values(["e1", "e2"]).reset_index(drop=True))
    want = _lp_brute(edges, min_cn=1)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_link_prediction_max_degree_drops_hub_centers():
    from deepkg_ray.stages.graph import link_prediction
    # star around 0 (degree 5) plus a path 1-2-3; max_degree=3 keeps only
    # wedges centered at 2 (and at 1/3 if deg≥2 — they have deg 2)
    edges = [(0, k) for k in range(1, 6)] + [(1, 2), (2, 3)]
    ds = rd.from_pandas(pd.DataFrame(
        {"subj_id": np.array([e[0] for e in edges], np.int64),
         "obj_id": np.array([e[1] for e in edges], np.int64)}))
    got = link_prediction(ds, min_cn=1, max_degree=3).to_pandas()
    # center 0 excluded → pair (1,3) via center 2 survives; star pairs do not
    pairs = set(zip(got["e1"], got["e2"]))
    assert (1, 3) in pairs
    assert (4, 5) not in pairs


# --------------------------------------------------------------------- pca --

def test_pca_projection_recovers_dominant_direction():
    from deepkg_ray.stages.similarity import pca_power_projection
    rng = np.random.default_rng(3)
    d, n = 16, 400
    direction = rng.normal(size=d)
    direction /= np.linalg.norm(direction)
    coef = rng.normal(size=n) * 5.0           # dominant variance along dir
    noise = rng.normal(size=(n, d)) * 0.1
    mat = np.outer(coef, direction) + noise
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [r.astype(np.float32) for r in mat]})
    out = (pca_power_projection(rd.from_pandas(df), n_iters=8).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    r = np.corrcoef(out["pc1"].to_numpy(), mat @ direction)[0, 1]
    assert abs(r) > 0.99


def test_pca_matches_duckdb_oracle_exactly():
    from deepkg_ray.oracle import embedding_pca_oracle
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import pca_power_projection
    got = (pca_power_projection(read_embeddings(SF, ["vec_id", "embedding"]),
                                n_iters=6)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    want = (con.execute(embedding_pca_oracle(dim=64, n_iters=6)).fetchdf()
            .sort_values("vec_id").reset_index(drop=True))
    assert got["pc1"].tolist() == want["pc1"].tolist()


# -------------------------------------------------------------- edge spans --

def test_edge_spans_brute_force_parity():
    from deepkg_ray.stages.canonical import edge_spans
    tri = pd.DataFrame({
        "conv_id": ["c1", "c1", "c1", "c2", "c2"],
        "turn_idx": np.array([0, 0, 2, 1, 1], np.int32),
        "subj_id": np.array([1, 1, 1, 2, 1], np.int64),
        "pred": ["p", "p", "p", "p", "q"],
        "obj_id": np.array([5, 5, 5, 6, 5], np.int64),
    })
    turns = pd.DataFrame({
        "conv_id": ["c1", "c1", "c1", "c2", "c2"],
        "turn_idx": np.array([0, 1, 2, 0, 1], np.int32),
        "ts": pd.to_datetime([100, 200, 300, 50, 75], unit="s"),
    })
    got = (edge_spans(rd.from_pandas(tri), rd.from_pandas(turns),
                      n_parts=4).to_pandas()
           .sort_values(["subj_id", "pred", "obj_id"])
           .reset_index(drop=True))
    want = pd.DataFrame({
        "subj_id": np.array([1, 1, 2], np.int64),
        "pred": ["p", "q", "p"],
        "obj_id": np.array([5, 5, 6], np.int64),
        "weight": np.array([3, 1, 1], np.int64),
        "first_us": np.array([100, 75, 75], np.int64) * 1_000_000,
        "last_us": np.array([300, 75, 75], np.int64) * 1_000_000,
    })
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


# --------------------------------------------------------------------- dsir --

def test_dsir_scores_separate_target_language():
    from deepkg_ray.stages.curation import dsir_scores
    en = ["the cat sat on the mat", "the dog ran to the park",
          "a cat and a dog played"]
    de = ["der hund lief zum park", "die katze sass auf der matte",
          "ein hund und eine katze"]
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": en + de,
        "lang": ["en"] * 3 + ["de"] * 3,
    })
    out = (dsir_scores(rd.from_pandas(df), n_buckets=256).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # every English doc scores above every German doc (separable vocab)
    assert out["dsir"][:3].min() > out["dsir"][3:].max()
    assert (out["n_tokens"] > 0).all()


def test_dsir_matches_duckdb_oracle_exactly():
    from deepkg_ray.oracle import dsir_scores_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import dsir_scores
    got = (dsir_scores(read_documents(SF, ["doc_id", "text", "lang"]))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = (con.execute(dsir_scores_oracle()).fetchdf()
            .sort_values("doc_id").reset_index(drop=True))
    assert got["dsir_micros"].tolist() == want["dsir_micros"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()


# ---------------------------------------------------------------- centroids --

def test_embedding_centroids_matches_duckdb():
    from deepkg_ray.oracle import embedding_centroids_oracle
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import embedding_centroids
    got = (embedding_centroids(read_embeddings(SF, ["label", "embedding"]))
           .to_pandas().sort_values(["label", "i"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    want = (con.execute(embedding_centroids_oracle(dim=64)).fetchdf()
            .sort_values(["label", "i"]).reset_index(drop=True))
    assert got["s_micros"].tolist() == want["s_micros"].tolist()
    assert got["mean_i"].tolist() == want["mean_i"].tolist()


# ------------------------------------------------------------------ schema --

def test_schema_table_counts():
    from deepkg_ray.stages.canonical import schema_table
    adj = pd.DataFrame({
        "subj_id": np.array([1, 2, 3, 4], np.int64),
        "pred": ["works_at", "works_at", "located_in", "works_at"],
        "obj_id": np.array([9, 9, 8, 7], np.int64),
        "subj_type": ["PER", "PER", "ORG", "PER"],
        "obj_type": ["ORG", "ORG", "LOC", "ORG"],
        "weight": np.array([2, 3, 1, 1], np.int64),
    })
    got = (schema_table(rd.from_pandas(adj)).to_pandas()
           .sort_values(["pred"]).reset_index(drop=True))
    want = pd.DataFrame({
        "subj_type": ["ORG", "PER"], "pred": ["located_in", "works_at"],
        "obj_type": ["LOC", "ORG"],
        "n_edges": [1, 3], "n_support": [1, 6],
    }).sort_values(["pred"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_dsir_fast_hash_mode_still_separates():
    from deepkg_ray.stages.curation import dsir_scores
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["the cat sat", "the dog ran", "der hund lief",
                 "die katze sass"],
        "lang": ["en", "en", "de", "de"],
    })
    out = (dsir_scores(rd.from_pandas(df), n_buckets=256, hash_mode="fast")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["dsir"][:2].min() > out["dsir"][2:].max()


# ------------------------------------------------------------- grid quant --

def test_grid_quantiles_accuracy_and_duckdb_exact():
    from deepkg_ray.oracle import grid_quantiles_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import grid_quantiles
    qs = [0.05, 0.25, 0.5, 0.75, 0.95, 0.99]
    got = (grid_quantiles(read_events(SF, ["value"]), "value", qs)
           .to_pandas().sort_values("q").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = (con.execute(grid_quantiles_oracle(tuple(qs))).fetchdf()
            .sort_values("q").reset_index(drop=True))
    assert got["bucket"].tolist() == want["bucket"].tolist()
    assert got["approx"].tolist() == want["approx"].tolist()
    # accuracy: within one grid cell of the true quantile
    vals = con.execute("SELECT value FROM events").fetchdf()["value"].to_numpy()
    cell = (vals.max() - vals.min()) / 4096
    svals = np.sort(vals)
    for q, a in zip(got["q"], got["approx"]):
        idx = max(0, int(np.ceil(q * len(svals))) - 1)   # quantile_disc
        true = svals[idx]
        assert abs(a - true) <= cell + 1e-5, (q, a, true)


# --------------------------------------------------------------------- mrr --

def test_mrr_ds_golden():
    from deepkg_ray.stages.scoring import mrr_ds
    cands = pd.DataFrame({
        "query": ["a", "a", "b", "b", "c"],
        "candidate_name": ["x", "GOLD_A", "GOLD_B", "y", "z"],
        "rank": np.array([0, 1, 0, 1, 0], np.int32),
    })
    gold = {"a": ["GOLD_A"], "b": ["GOLD_B"], "c": ["GOLD_C"]}
    n_q, mrr = mrr_ds(rd.from_pandas(cands), gold, n=5)
    # rr: a=1/2, b=1, c=0 → mean = 0.5 = floor((500000+1000000+0)/3+0.5)/1e6
    assert n_q == 3
    assert mrr == 0.5


# ------------------------------------------------------------------ funnel --

def test_funnel_counts_golden():
    from deepkg_ray.stages.windows import funnel_counts
    rows = [
        # u1 completes all three in order
        ("u1", "view", 1), ("u1", "click", 2), ("u1", "purchase", 3),
        # u2: click BEFORE view → stops at step1
        ("u2", "click", 1), ("u2", "view", 2),
        # u3: view then click; purchase at the SAME us as click (not later)
        ("u3", "view", 1), ("u3", "click", 5), ("u3", "purchase", 5),
        # u4 never views
        ("u4", "purchase", 1),
    ]
    df = pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "event_type": [r[1] for r in rows],
        "ts": pd.to_datetime([r[2] for r in rows], unit="s"),
    })
    out = funnel_counts(rd.from_pandas(df), n_parts=4).to_pandas()
    assert out["n_step1"].iloc[0] == 3    # u1, u2, u3 viewed
    assert out["n_step2"].iloc[0] == 2    # u1, u3 clicked after viewing
    assert out["n_step3"].iloc[0] == 1    # only u1 purchased strictly later


def test_funnel_matches_duckdb_on_events():
    from deepkg_ray.oracle import funnel_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import funnel_counts
    got = funnel_counts(read_events(SF, ["user_id", "event_type", "ts"])
                        ).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(funnel_oracle()).fetchdf()
    assert got["n_step1"].iloc[0] == want["n_step1"].iloc[0]
    assert got["n_step2"].iloc[0] == want["n_step2"].iloc[0]
    assert got["n_step3"].iloc[0] == want["n_step3"].iloc[0]


# ------------------------------------------------------------------ zscore --

def test_zscore_matches_duckdb_and_flags_outliers():
    from deepkg_ray.oracle import zscore_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import zscore_events
    got = (zscore_events(read_events(SF, ["event_id", "event_type", "value"]))
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = (con.execute(zscore_oracle()).fetchdf()
            .sort_values("event_id").reset_index(drop=True))
    assert got["z"].tolist() == want["z"].tolist()
    assert got["is_outlier"].tolist() == want["is_outlier"].tolist()
    # z-scores are standardized: per-type mean ≈ 0, std ≈ 1
    for _, g in got.groupby("event_type"):
        assert abs(g["z"].mean()) < 0.05
        assert abs(g["z"].std(ddof=0) - 1.0) < 0.05


# ------------------------------------------------------------- time window --

def test_time_window_sum_golden_and_duckdb():
    from deepkg_ray.oracle import time_window_sum_oracle
    from deepkg_ray.stages.windows import time_window_sum
    # u1: ts 0, 300, 900 (window 600s: row3 covers 300+900 only);
    # tie: u2 has two events at the same ts — RANGE includes BOTH peers
    df = pd.DataFrame({
        "user_id": ["u1", "u1", "u1", "u2", "u2"],
        "event_id": np.arange(5, dtype=np.int64),
        "ts": pd.to_datetime([0, 300, 900, 50, 50], unit="s"),
        "value": [1.0, 2.0, 4.0, 10.0, 20.0],
    })
    out = (time_window_sum(rd.from_pandas(df), window_sec=600, n_parts=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert out["win_sum"].tolist() == [1.0, 3.0, 6.0, 30.0, 30.0]
    assert out["n_in_window"].tolist() == [1, 2, 2, 2, 2]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    from deepkg_ray.sources.readers import read_events
    got = (time_window_sum(read_events(SF, ["user_id", "event_id", "ts",
                                            "value"])).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    want = (con.execute(time_window_sum_oracle()).fetchdf()
            .sort_values("event_id").reset_index(drop=True))
    assert got["win_sum"].tolist() == want["win_sum"].tolist()
    assert got["n_in_window"].tolist() == want["n_in_window"].tolist()


# ------------------------------------------------------------------- share --

def test_segment_revenue_share_sums_to_one_and_duckdb_exact():
    from deepkg_ray.oracle import segment_revenue_share_oracle
    from deepkg_ray.pipelines.relational import segment_revenue_share
    got = (segment_revenue_share(SF).to_pandas()
           .sort_values("o_orderkey").reset_index(drop=True))
    # per-segment shares sum to ~1 (each share rounded to 1e-6)
    sums = got.groupby("c_mktsegment")["share"].sum()
    assert ((sums - 1.0).abs() < 1e-3).all()
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want = (con.execute(segment_revenue_share_oracle()).fetchdf()
            .sort_values("o_orderkey").reset_index(drop=True))
    assert got["share"].tolist() == want["share"].tolist()
    assert got["revenue"].tolist() == want["revenue"].tolist()


def test_segment_revenue_join_tier_matches_broadcast():
    """broadcast_threshold=0 forces the native hash-join tier (the
    above-2M-customers path); both tiers must agree row-for-row."""
    from deepkg_ray.pipelines.relational import (segment_revenue,
                                                 segment_revenue_share)
    base = (segment_revenue(SF).to_pandas()
            .sort_values("c_mktsegment").reset_index(drop=True))
    joined = (segment_revenue(SF, broadcast_threshold=0).to_pandas()
              .sort_values("c_mktsegment").reset_index(drop=True))
    pd.testing.assert_frame_equal(base, joined)
    base_s = (segment_revenue_share(SF).to_pandas()
              .sort_values("o_orderkey").reset_index(drop=True))
    join_s = (segment_revenue_share(SF, broadcast_threshold=0).to_pandas()
              .sort_values("o_orderkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(base_s, join_s)


# ------------------------------------------------------ entity spans / lang --

def test_entity_spans_brute_force_parity(sf_dir):
    """Engine entity_spans equals a pandas brute-force over the same
    mentions + timestamps at sf0.001."""
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.pipelines import kg
    from deepkg_ray.sources.readers import read_transcripts
    from deepkg_ray.stages.mention import entity_spans
    turns = read_transcripts(synth.transcripts_path(sf_dir),
                             columns=["conv_id", "turn_idx", "ts"])
    got = (entity_spans(kg.mentions_dataset(sf_dir), turns, n_parts=8)
           .to_pandas().sort_values("entity_id").reset_index(drop=True))
    m = kg.mentions_dataset(sf_dir).to_pandas()
    t = turns.to_pandas()
    t["ts_us"] = t["ts"].astype("datetime64[us]").astype("int64")
    t["turn_idx"] = t["turn_idx"].astype("int64")
    m["turn_idx"] = m["turn_idx"].astype("int64")
    j = m.merge(t[["conv_id", "turn_idx", "ts_us"]],
                on=["conv_id", "turn_idx"])
    want = (j.groupby("entity_id", as_index=False)
            .agg(n_mentions=("ts_us", "size"), first_us=("ts_us", "min"),
                 last_us=("ts_us", "max"))
            .sort_values("entity_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_lang_confusion_matches_duckdb():
    """The matrix is exact vs the oracle; note the synth documents' text is
    English-templated regardless of the gold lang column, so the matrix
    correctly reports the heuristic's behavior rather than a diagonal."""
    from deepkg_ray.oracle import lang_confusion_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import lang_confusion
    got = (lang_confusion(read_documents(SF, ["text", "lang"])).to_pandas()
           .sort_values(["lang", "lang_detected"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = (con.execute(lang_confusion_oracle()).fetchdf()
            .sort_values(["lang", "lang_detected"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
    assert got["n"].sum() == 500


# -------------------------------------------------------------- ann recall --

def test_ivf_recall_floor():
    """The ann_recall config (64 cells, nprobe=24, spill=2) holds the
    asserted ≥0.9 overall recall@10 floor (measured 0.925 at sf0.01 /
    0.975 at sf0.1; the old 8-cell nprobe=4 single-assign default sat at
    0.71-0.78).  The query itself asserts the floor — this test also
    checks the per-query artifact shape."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m
    df = m.queries()["ann_recall"](SF)
    assert (df["n_exact"] == 10).all()
    assert df["n_hit"].sum() / df["n_exact"].sum() >= 0.9


# --------------------------------------------------------------- sessions --

def test_conv_sessions_golden():
    from deepkg_ray.stages.convgroup import conv_sessions
    df = pd.DataFrame({
        "conv_id": ["c1", "c1", "c1", "c2"],
        "turn_idx": np.array([0, 1, 2, 0], np.int32),
        # c1: gap 10s then gap 2h → 2 sessions; c2: single turn
        "ts": pd.to_datetime([0, 10, 7300, 5], unit="s"),
    })
    out = (conv_sessions(rd.from_pandas(df), n_parts=4).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    assert out["n_sessions"].tolist() == [2, 1]
    assert out["n_turns"].tolist() == [3, 1]
    assert out["span_us"].tolist() == [7300_000_000, 0]


# --------------------------------------------------------------------- pmi --

def test_cooccurrence_pmi_brute_force():
    from deepkg_ray.stages.mention import cooccurrence_pmi
    mentions = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2", "c2", "c3"],
        "turn_idx": np.array([0, 0, 0, 0, 0], np.int32),
        "entity_id": np.array([1, 2, 1, 2, 1], np.int64),
    })
    # N=4 total turns (one extra mention-free); n1=3, n2=2, n12=2
    out = cooccurrence_pmi(rd.from_pandas(mentions), n_turns_total=4,
                           ).to_pandas()
    assert len(out) == 1
    want = np.floor(np.log((2 * 4.0) / (3.0 * 2.0)) * 1e6 + 0.5) / 1e6
    assert out["pmi"].iloc[0] == want
    assert out["n_turns"].iloc[0] == 2


# ------------------------------------------------------- windowed distinct --

def test_windowed_hll_estimates_accurate():
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.sketches import windowed_hll_estimates
    est = windowed_hll_estimates(read_events(SF, ["ts", "user_id"]))
    con = duckdb.connect()
    truth = con.execute(f"""
        SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS w,
               count(DISTINCT user_id) AS n
        FROM read_parquet('{SF}/events.parquet') GROUP BY w
    """).fetchdf().set_index("w")["n"]
    assert len(est) == len(truth)
    for _, r in est.iterrows():
        true = truth[int(r["window_start_us"])]
        assert abs(r["n_distinct_est"] - true) / max(true, 1) < 0.15


# ---------------------------------------------------------- weighted sample --

def test_weighted_sample_partition_invariant_and_biased():
    from deepkg_ray.stages.textstats import weighted_sample_k
    rng = np.random.default_rng(2)
    n = 2000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        # half the docs are 50x heavier
        "n_chars": np.where(np.arange(n) % 2 == 0, 5000, 100).astype(np.int64),
    })
    a = (weighted_sample_k(rd.from_pandas(df), k=200).to_pandas()
         .sort_values("rank").reset_index(drop=True))
    b = (weighted_sample_k(rd.from_pandas(df).repartition(13), k=200)
         .to_pandas().sort_values("rank").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)                # partition-invariant
    heavy = (a["doc_id"] % 2 == 0).mean()
    assert heavy > 0.8                                 # ppswor bias visible


# ------------------------------------------------------------ cube/profile --

def test_pricing_cube_grouping_sets_consistent_and_duckdb_exact():
    from deepkg_ray.oracle import pricing_cube_oracle
    from deepkg_ray.pipelines.relational import pricing_cube
    got = (pricing_cube(SF).to_pandas()
           .sort_values(["l_returnflag", "l_linestatus"])
           .reset_index(drop=True))
    fine = got[(got.l_returnflag != "ALL") & (got.l_linestatus != "ALL")]
    by_status = got[(got.l_returnflag == "ALL") & (got.l_linestatus != "ALL")]
    assert int(by_status["count_order"].sum()) == int(fine["count_order"].sum())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF}/lineitem.parquet')")
    want = (con.execute(pricing_cube_oracle()).fetchdf()
            .sort_values(["l_returnflag", "l_linestatus"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


def test_column_profile_matches_duckdb():
    from deepkg_ray.oracle import column_profile_oracle
    from deepkg_ray.pipelines.relational import column_profile
    got = (column_profile(SF).to_pandas()
           .sort_values("column").reset_index(drop=True))
    assert (got["n_null"] == 0).all() and (got["n"] > 0).all()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF}/lineitem.parquet')")
    want = (con.execute(column_profile_oracle()).fetchdf()
            .sort_values("column").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


def test_nation_revenue_matches_duckdb():
    from deepkg_ray.oracle import nation_revenue_oracle
    from deepkg_ray.pipelines.relational import nation_revenue
    got = (nation_revenue(SF).to_pandas()
           .sort_values("n_name").reset_index(drop=True))
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want = (con.execute(nation_revenue_oracle()).fetchdf()
            .sort_values("n_name").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)
    assert len(got) > 0


def test_centroid_similarity_self_consistency():
    """cosine bounds and symmetry of the pair grid; identical-label
    centroid pairs score exactly what a numpy rederivation gives."""
    import numpy as np
    import pyarrow.parquet as pq
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import centroid_similarity
    sf = "/root/testdata/sf0.001"
    out = centroid_similarity(read_embeddings(sf, ["label", "embedding"])) \
        .to_pandas()
    assert (out["cosine"] <= 1.0).all() and (out["cosine"] >= -1.0).all()
    assert (out["l1"] < out["l2"]).all()
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["label", "embedding"]).to_pandas()
    em = np.floor(np.stack(t["embedding"].to_numpy()).astype(np.float64)
                  * 1e6 + 0.5).astype(np.int64)
    labels = sorted(t["label"].unique())
    C = np.stack([
        np.floor(em[t["label"].to_numpy() == l].sum(0).astype(np.float64)
                 / (t["label"] == l).sum() + 0.5).astype(np.int64)
        for l in labels])
    k = len(labels)
    assert len(out) == k * (k - 1) // 2
    r0 = out.iloc[0]
    a = C[labels.index(r0["l1"])]
    b = C[labels.index(r0["l2"])]
    assert int(r0["dot_m2"]) == int(a @ b)


def test_knn_accuracy_separated_blobs(ray_session):
    """Tight label-aligned blobs give accuracy 1.0; self is excluded
    (leave-one-out, not trivially 100% via self-match)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.similarity import knn_accuracy
    rng = np.random.RandomState(9)
    vecs = np.vstack([rng.normal(0, 0.01, (20, 8)) + 1.0,
                      rng.normal(0, 0.01, (20, 8)) - 1.0]).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 20 + [1] * 20, pa.int32())})
    out = knn_accuracy(rd.from_arrow(t)).to_pandas()
    assert (out["accuracy"] == 1.0).all() and out["n"].sum() == 40

    # a lone-label vector CANNOT match itself: its accuracy is 0
    t2 = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.9, 0.1], [5.0, 5.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0, 7], pa.int32())})
    out2 = knn_accuracy(rd.from_arrow(t2)).to_pandas() \
        .set_index("label")
    assert out2.loc[7, "accuracy"] == 0.0


def test_entity_relatedness_golden():
    """Conv-set Jaccard: entity 3 appears in {c1,c2}, 7 in {c1,c2},
    9 in {c2} -> J(3,7)=1.0, J(3,9)=J(7,9)=0.5; repeated mentions in
    the same conversation do not inflate presence."""
    from deepkg_ray.stages.mention import entity_relatedness
    mentions = pd.DataFrame({
        "conv_id": ["c1", "c1", "c1", "c2", "c2", "c2", "c2"],
        "turn_idx": np.array([0, 1, 1, 0, 0, 1, 2], np.int32),
        "entity_id": np.array([3, 7, 7, 3, 7, 9, 9], np.int64),
    })
    got = (entity_relatedness(rd.from_pandas(mentions)).to_pandas()
           .sort_values(["e1", "e2"]).reset_index(drop=True))
    want = pd.DataFrame({
        "e1": [3, 3, 7], "e2": [7, 9, 9],
        "n_inter": [2, 1, 1], "n_a": [2, 2, 2], "n_b": [2, 1, 1],
        "jaccard": [1.0, 0.5, 0.5]})
    pd.testing.assert_frame_equal(
        got[["e1", "e2", "n_inter", "n_a", "n_b", "jaccard"]], want,
        check_dtype=False)


def test_kg_growth_curve_golden():
    """Edges first observed on days 0, 0, 2 -> daily new counts (2,0,1)
    with a calendar-complete zero day and cumulative (2,2,3)."""
    from deepkg_ray.stages.canonical import kg_growth_curve
    day = 86_400
    tri = pd.DataFrame({
        "conv_id": ["c1", "c2", "c3", "c3"],
        "turn_idx": np.array([0, 0, 0, 0], np.int32),
        "subj_id": np.array([1, 2, 3, 1], np.int64),
        "pred": ["p", "p", "p", "p"],
        "obj_id": np.array([5, 6, 7, 5], np.int64),
    })
    turns = pd.DataFrame({
        "conv_id": ["c1", "c2", "c3"],
        "turn_idx": np.array([0, 0, 0], np.int32),
        "ts": pd.to_datetime([10, 20, 2 * day + 5], unit="s"),
    })
    got = (kg_growth_curve(rd.from_pandas(tri), rd.from_pandas(turns),
                           n_parts=4).to_pandas())
    assert got["n_new"].tolist() == [2, 0, 1]
    assert got["cum_edges"].tolist() == [2, 2, 3]
    assert got["day_us"].tolist() == [0, day * 1_000_000,
                                      2 * day * 1_000_000]


def test_predicate_cardinality_golden():
    """p: 1->5,6 and 2->5 (out fan 2, in fan 2 -> M:N); q: 1->7 only
    (1:1); r: 1->8, 2->8 (out 1, in 2 -> N:1)."""
    from deepkg_ray.stages.canonical import predicate_cardinality
    edges = pd.DataFrame({
        "subj_id": np.array([1, 1, 2, 1, 1, 2], np.int64),
        "pred": ["p", "p", "p", "q", "r", "r"],
        "obj_id": np.array([5, 6, 5, 7, 8, 8], np.int64)})
    out = (predicate_cardinality(rd.from_pandas(edges)).to_pandas()
           .set_index("pred"))
    assert out.loc["p", "cardinality"] == "M:N"
    assert out.loc["p", "n_edges"] == 3
    assert out.loc["q", "cardinality"] == "1:1"
    assert out.loc["r", "cardinality"] == "N:1"
    assert out.loc["r", "max_in"] == 2 and out.loc["r", "max_out"] == 1


def test_entity_introducer_argmin_semantics(ray_session):
    """The first-mentioning turn's role wins per (conv, entity), even
    when a later turn re-mentions with another role."""
    from deepkg_ray.stages.mention import entity_introducer
    from deepkg_ray import synth
    sf = "/root/testdata/sf0.001"
    from deepkg_ray.pipelines.kg import transcripts_with_norm
    ds = transcripts_with_norm(
        sf, columns=["conv_id", "turn_idx", "text", "role"])
    out = entity_introducer(ds, synth.dictionary_path(sf)).to_pandas()
    assert (out["n_introduced"] > 0).all()
    # role vocabulary sanity + totals equal the distinct (conv, entity)
    # first-mention count derived independently via pandas
    import duckdb
    from deepkg_ray.oracle import entity_introducer_sql
    want = duckdb.sql(entity_introducer_sql(sf)).fetchdf()
    got = out.sort_values(["role", "type"]).reset_index(drop=True)
    want = want.sort_values(["role", "type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["role", "type", "n_introduced"]],
        want[["role", "type", "n_introduced"]], check_dtype=False)


def test_entity_relatedness_modes_agree():
    """tree/auto vs shuffle presence-dedup modes give identical pairs."""
    from deepkg_ray.stages.mention import entity_relatedness
    rng = np.random.default_rng(17)
    mentions = pd.DataFrame({
        "conv_id": [f"c{i}" for i in rng.integers(0, 25, 400)],
        "turn_idx": np.zeros(400, np.int32),
        "entity_id": rng.integers(0, 12, 400).astype(np.int64),
    })
    ds = rd.from_pandas(mentions)
    a = (entity_relatedness(ds, mode="auto").to_pandas()
         .sort_values(["e1", "e2"]).reset_index(drop=True))
    b = (entity_relatedness(ds, mode="shuffle").to_pandas()
         .sort_values(["e1", "e2"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
