"""Round-3 distribution statistics: grouped MAD, two-sample KS, ROC AUC,
max drawdown — goldens against hand-computed values plus DuckDB parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _events_con():
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        else:
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# ------------------------------------------------------------------- MAD --

def test_grouped_mad_golden():
    from deepkg_ray.stages.quantiles import grouped_mad
    df = pd.DataFrame({
        "event_type": ["a"] * 5 + ["b"] * 4,
        "value": [1.0, 2.0, 4.0, 7.0, 9.0,      # med=4, |d|=3,2,0,3,5 med=3
                  10.0, 20.0, 30.0, 100.0],     # med=25, |d|=15,5,5,75→10
    })
    out = (grouped_mad(rd.from_pandas(df)).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    assert out["median"].tolist() == [4.0, 25.0]
    assert out["mad"].tolist() == [3.0, 10.0]
    # doubled-space invariants: med2 = 2·median, mad4 = 4·mad in micros
    assert out["med2"].tolist() == [8_000_000, 50_000_000]
    assert out["mad4"].tolist() == [12_000_000, 40_000_000]


def test_grouped_mad_matches_duckdb():
    from deepkg_ray.oracle import grouped_mad_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import grouped_mad
    got = _canon(grouped_mad(
        read_events(SF, ["event_type", "value"])).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(grouped_mad_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


# -------------------------------------------------------------------- KS --

def test_ks_two_sample_golden():
    from deepkg_ray.stages.quantiles import ks_two_sample
    # a: {1,2,3}, b: {3,4,5} → D = 2/3 at v=2
    df = pd.DataFrame({
        "event_type": ["click"] * 3 + ["view"] * 3 + ["other"],
        "value": [1.0, 2.0, 3.0, 3.0, 4.0, 5.0, 99.0],
    })
    out = ks_two_sample(rd.from_pandas(df)).to_pandas()
    assert out["n_a"].item() == 3 and out["n_b"].item() == 3
    assert out["d_num"].item() == 6          # |2·3 − 0·3| at v=2
    assert abs(out["d"].item() - 2 / 3) < 1e-12


def test_ks_identical_distributions_is_zero():
    from deepkg_ray.stages.quantiles import ks_two_sample
    df = pd.DataFrame({
        "event_type": ["click", "view"] * 4,
        "value": [1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 4.0],
    })
    assert ks_two_sample(rd.from_pandas(df)).to_pandas()["d_num"].item() == 0


def test_ks_matches_duckdb():
    from deepkg_ray.oracle import ks_two_sample_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import ks_two_sample
    got = _canon(ks_two_sample(
        read_events(SF, ["event_type", "value"])).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(ks_two_sample_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


# ------------------------------------------------------------------- AUC --

def test_roc_auc_golden_with_ties():
    from deepkg_ray.stages.quantiles import roc_auc
    # pos scores {3, 2}, neg scores {1, 2} → pairs: (3>1)=1, (3>2)=1,
    # (2>1)=1, (2=2)=0.5 → AUC = 3.5/4
    df = pd.DataFrame({
        "event_type": ["purchase", "purchase", "view", "view"],
        "value": [3.0, 2.0, 1.0, 2.0],
    })
    out = roc_auc(rd.from_pandas(df)).to_pandas()
    assert out["n_pos"].item() == 2 and out["n_neg"].item() == 2
    assert out["auc_num2"].item() == 7       # 2·AUC·P·N = 7
    assert abs(out["auc"].item() - 0.875) < 1e-12


def test_roc_auc_perfect_separation():
    from deepkg_ray.stages.quantiles import roc_auc
    df = pd.DataFrame({
        "event_type": ["purchase"] * 3 + ["view"] * 3,
        "value": [10.0, 11.0, 12.0, 1.0, 2.0, 3.0],
    })
    assert roc_auc(rd.from_pandas(df)).to_pandas()["auc"].item() == 1.0


def test_pr_auc_golden_with_ties():
    from deepkg_ray.stages.quantiles import pr_auc
    # thresholds desc: v=3 -> cp=1, cq=0, term = 1·1e6//1 = 1e6
    #                  v=2 -> p=1 (tied with one neg), cp=2, cq=1,
    #                         term = 1·2·1e6//3 = 666666
    # AP = (1e6 + 666666)/2/1e6 = 0.833333
    df = pd.DataFrame({
        "event_type": ["purchase", "purchase", "view", "view"],
        "value": [3.0, 2.0, 1.0, 2.0],
    })
    out = pr_auc(rd.from_pandas(df)).to_pandas()
    assert out["n_pos"].item() == 2 and out["n_neg"].item() == 2
    assert out["ap_num_micros"].item() == 10**6 + 666666
    assert out["average_precision"].item() == 0.833333


def test_pr_auc_perfect_separation():
    from deepkg_ray.stages.quantiles import pr_auc
    df = pd.DataFrame({
        "event_type": ["purchase"] * 3 + ["view"] * 3,
        "value": [10.0, 11.0, 12.0, 1.0, 2.0, 3.0],
    })
    out = pr_auc(rd.from_pandas(df)).to_pandas()
    assert out["average_precision"].item() == 1.0


def test_pr_auc_matches_duckdb():
    from deepkg_ray.oracle import pr_auc_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import pr_auc
    got = _canon(pr_auc(
        read_events(SF, ["event_type", "value"])).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(pr_auc_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_roc_auc_matches_duckdb():
    from deepkg_ray.oracle import roc_auc_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import roc_auc
    got = _canon(roc_auc(
        read_events(SF, ["event_type", "value"])).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(roc_auc_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


# -------------------------------------------------------------- drawdown --

def test_max_drawdown_golden():
    from deepkg_ray.stages.windows import max_drawdown
    # user a: values 5, -3, -4, 10 → run 5, 2, -2, 8; peak 5,5,5,8 →
    # dd 0, 3, 7, 0 → max 7.  user b monotone up → 0.
    df = pd.DataFrame({
        "user_id": ["a"] * 4 + ["b"] * 3,
        "event_id": np.arange(7, dtype=np.int64),
        "ts": pd.to_datetime([1, 2, 3, 4, 1, 2, 3], unit="s"),
        "value": [5.0, -3.0, -4.0, 10.0, 1.0, 2.0, 3.0],
    })
    out = (max_drawdown(rd.from_pandas(df), n_parts=4).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert out["max_drawdown"].tolist() == [7.0, 0.0]
    assert out["n_events"].tolist() == [4, 3]


def test_max_drawdown_matches_duckdb():
    from deepkg_ray.oracle import max_drawdown_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import max_drawdown
    got = _canon(max_drawdown(
        read_events(SF, ["user_id", "event_id", "ts", "value"]))
        .to_pandas())
    con = _events_con()
    exp = _canon(con.sql(max_drawdown_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


# -------------------------------------------------- linkpred score family --

def test_link_prediction_scores_brute_force_parity():
    import math
    from deepkg_ray.stages.graph import link_prediction_scores
    rng = np.random.default_rng(7)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 20, (50, 2))]
    ds = rd.from_pandas(pd.DataFrame(
        {"subj_id": np.array([e[0] for e in edges], np.int64),
         "obj_id": np.array([e[1] for e in edges], np.int64)}))
    got = (link_prediction_scores(ds, min_cn=1).to_pandas()
           .sort_values(["e1", "e2"]).reset_index(drop=True))

    # brute force over the simple undirected graph
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    rows = []
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if v in nbrs[u]:
                continue
            common = nbrs[u] & nbrs[v]
            if not common:
                continue
            ra = sum(int(np.floor(1e6 / len(nbrs[z]) + 0.5))
                     for z in common) / 1e6
            aa = sum(int(np.floor(1e6 / math.log(len(nbrs[z])) + 0.5))
                     for z in common if len(nbrs[z]) >= 2) / 1e6
            cn = len(common)
            den = len(nbrs[u]) + len(nbrs[v]) - cn
            jac = np.floor(cn / den * 1e6 + 0.5) / 1e6
            rows.append((u, v, cn, ra, aa, jac))
    want = pd.DataFrame(rows, columns=["e1", "e2", "cn", "ra", "aa",
                                       "jaccard"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------------------ corpus statistics --

def _docs_con():
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return con


def test_token_zipf_fit_perfect_zipf_slope():
    from deepkg_ray.stages.textstats import token_zipf_fit
    # counts ∝ 1/rank → slope ≈ −1 exactly on the fitted points
    docs = []
    words = [f"w{i:02d}" for i in range(20)]
    for r, w in enumerate(words, start=1):
        docs.extend([w] * (1200 // r))
    df = pd.DataFrame({"doc_id": [0], "text": [" ".join(docs)]})
    out = token_zipf_fit(rd.from_pandas(df), k=20).to_pandas()
    assert out["n_tokens"].item() == 20
    assert abs(out["slope"].item() + 1.0) < 0.01


def test_token_zipf_fit_matches_duckdb():
    from deepkg_ray.oracle import token_zipf_fit_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import token_zipf_fit
    got = _canon(token_zipf_fit(read_documents(SF, ["text"])).to_pandas())
    con = _docs_con()
    exp = _canon(con.sql(token_zipf_fit_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_token_burstiness_golden():
    from deepkg_ray.stages.textstats import token_burstiness
    # 'a': tf per doc [4, 0] over N=2 docs → mean 2, var 4, vmr 2
    # 'b': tf [1, 1] → var 0 → vmr 0
    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": ["a a a a b", "b c"]})
    out = (token_burstiness(rd.from_pandas(df), k=10).to_pandas()
           .set_index("token"))
    assert out.loc["a", "vmr"] == 2.0 and out.loc["a", "df"] == 1
    assert out.loc["b", "vmr"] == 0.0 and out.loc["b", "df"] == 2


def test_token_burstiness_matches_duckdb():
    from deepkg_ray.oracle import token_burstiness_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import token_burstiness
    got = _canon(token_burstiness(
        read_documents(SF, ["doc_id", "text"])).to_pandas())
    con = _docs_con()
    exp = _canon(con.sql(token_burstiness_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_source_kl_zero_on_identical_slices():
    from deepkg_ray.stages.textstats import source_kl_divergence
    df = pd.DataFrame({
        "source": ["src0", "src1"],
        "text": ["alpha beta gamma", "alpha beta gamma"]})
    out = source_kl_divergence(rd.from_pandas(df)).to_pandas()
    assert out["kl_micros"].item() == 0


def test_source_js_symmetric_and_bounded():
    from deepkg_ray.stages.textstats import source_js_divergence
    import math
    df = pd.DataFrame({
        "source": ["src0", "src0", "src1"],
        "text": ["alpha alpha beta", "gamma", "omega beta omega"]})
    a = source_js_divergence(rd.from_pandas(df),
                             src_a="src0", src_b="src1").to_pandas()
    b = source_js_divergence(rd.from_pandas(df),
                             src_a="src1", src_b="src0").to_pandas()
    # JS is symmetric (micros may differ by per-term rounding only)
    assert abs(a["js_micros"].item() - b["js_micros"].item()) <= len("x")
    assert 0 <= a["js"].item() <= math.log(2) + 1e-9
    # identical slices → 0
    df2 = pd.DataFrame({"source": ["src0", "src1"],
                        "text": ["alpha beta", "alpha beta"]})
    z = source_js_divergence(rd.from_pandas(df2)).to_pandas()
    assert z["js_micros"].item() == 0


def test_source_kl_positive_on_disjoint_slices():
    from deepkg_ray.stages.textstats import source_kl_divergence
    df = pd.DataFrame({
        "source": ["src0", "src1"],
        "text": ["alpha alpha alpha", "omega omega omega"]})
    out = source_kl_divergence(rd.from_pandas(df)).to_pandas()
    assert out["kl"].item() > 0.5


def test_source_kl_matches_duckdb():
    from deepkg_ray.oracle import source_kl_divergence_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import source_kl_divergence
    got = _canon(source_kl_divergence(
        read_documents(SF, ["source", "text"])).to_pandas())
    con = _docs_con()
    exp = _canon(con.sql(source_kl_divergence_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


# -------------------------------------------------- csv roundtrip, entropy --

def test_csv_roundtrip_counts_matches_parquet():
    from deepkg_ray.oracle import csv_roundtrip_counts_oracle
    from deepkg_ray.sources.readers import csv_roundtrip_counts
    got = _canon(csv_roundtrip_counts(
        SF, tmp_root="/tmp/deepkg_csv_test").to_pandas())
    con = _events_con()
    exp = _canon(con.sql(csv_roundtrip_counts_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_user_event_entropy_golden():
    import math
    from deepkg_ray.stages.windows import user_event_entropy
    df = pd.DataFrame({
        "user_id": ["u1"] * 4 + ["u2"] * 3,
        "event_type": ["a", "a", "b", "b", "c", "c", "c"],
    })
    out = (user_event_entropy(rd.from_pandas(df)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    # u1: uniform over 2 types → ln 2; u2: single type → 0
    want_u1 = 2 * int(np.floor(0.5 * math.log(2.0) * 1e6 + 0.5)) / 1e6
    assert out["entropy"].tolist() == [want_u1, 0.0]
    assert out["n_types"].tolist() == [2, 1]


def test_user_event_entropy_matches_duckdb():
    from deepkg_ray.oracle import user_event_entropy_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import user_event_entropy
    got = _canon(user_event_entropy(
        read_events(SF, ["user_id", "event_type"])).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(user_event_entropy_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


# --------------------------------------------- growth, conversion latency --

def test_monthly_revenue_growth_matches_duckdb():
    from deepkg_ray.oracle import monthly_revenue_growth_oracle
    from deepkg_ray.pipelines.relational import monthly_revenue_growth
    got = _canon(pd.DataFrame(monthly_revenue_growth(SF).to_pandas()))
    con = duckdb.connect()
    con.execute("CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{SF}/orders.parquet')")
    exp = _canon(con.sql(monthly_revenue_growth_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 12      # several years of monthly history


def test_conversion_lag_golden():
    from deepkg_ray.stages.windows import conversion_lag_quantiles
    # u1: view@10s, purchase@70s → 60; u2: view@0, purchase@120 → 120
    # u3: purchase before view → dropped; u4: view only → dropped
    df = pd.DataFrame({
        "user_id": ["u1", "u1", "u2", "u2", "u3", "u3", "u4"],
        "ts": pd.to_datetime([10, 70, 0, 120, 50, 40, 5], unit="s"),
        "event_type": ["view", "purchase", "view", "purchase",
                       "view", "purchase", "view"],
    })
    out = (conversion_lag_quantiles(rd.from_pandas(df), qs=(0.5,))
           .to_pandas())
    assert out["value"].tolist() == [90.0]     # midpoint of {60, 120}


def test_conversion_lag_matches_duckdb():
    from deepkg_ray.oracle import conversion_lag_quantiles_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import conversion_lag_quantiles
    got = _canon(conversion_lag_quantiles(
        read_events(SF, ["user_id", "ts", "event_type"])).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(conversion_lag_quantiles_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_json_roundtrip_counts_matches_parquet():
    from deepkg_ray.oracle import csv_roundtrip_counts_oracle
    from deepkg_ray.sources.readers import json_roundtrip_counts
    got = _canon(json_roundtrip_counts(
        SF, tmp_root="/tmp/deepkg_jsonl_test").to_pandas())
    con = _events_con()
    exp = _canon(con.sql(csv_roundtrip_counts_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_timed_conversions_golden():
    from deepkg_ray.stages.windows import timed_conversions
    # u1: view@0, purchase@1800 (in window), purchase@7200 (view too old)
    # u2: purchase@100 with no view; u3's view must not leak into u2
    df = pd.DataFrame({
        "user_id": ["u1", "u1", "u1", "u2", "u3"],
        "ts": pd.to_datetime([0, 1800, 7200, 100, 50], unit="s"),
        "event_type": ["view", "purchase", "purchase", "purchase", "view"],
    })
    out = (timed_conversions(rd.from_pandas(df), n_parts=1).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert out["user_id"].tolist() == ["u1", "u2"]
    assert out["n_then"].tolist() == [2, 1]
    assert out["n_converted"].tolist() == [1, 0]


def test_timed_conversions_window_boundaries():
    from deepkg_ray.stages.windows import timed_conversions
    # view exactly at p − window is IN; view exactly at p is OUT
    df = pd.DataFrame({
        "user_id": ["a", "a", "b", "b"],
        "ts": pd.to_datetime([0, 3600, 3600, 3600], unit="s"),
        "event_type": ["view", "purchase", "view", "purchase"],
    })
    out = (timed_conversions(rd.from_pandas(df), n_parts=2).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert out["n_converted"].tolist() == [1, 0]


def test_timed_conversions_matches_duckdb():
    from deepkg_ray.oracle import timed_conversions_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import timed_conversions
    got = _canon(timed_conversions(
        read_events(SF, ["user_id", "ts", "event_type"])).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(timed_conversions_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_grouped_mad_outliers_golden():
    from deepkg_ray.stages.quantiles import grouped_mad_outliers
    # med2=4+7=11 (median 5.5), mad4=7+7=14 (MAD 3.5):
    # 2·|2v−med2| > 3·mad4 ⟺ d2 > 21 — only v=20 (d2=29)
    df = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "event_type": ["a"] * 6,
        "value": [1.0, 2.0, 4.0, 7.0, 9.0, 20.0],
    })
    out = grouped_mad_outliers(rd.from_pandas(df), k=3).to_pandas()
    assert out["value"].tolist() == [20.0]


def test_grouped_mad_outliers_matches_duckdb():
    from deepkg_ray.oracle import grouped_mad_outliers_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import grouped_mad_outliers
    got = _canon(grouped_mad_outliers(
        read_events(SF, ["event_id", "event_type", "value"])).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(grouped_mad_outliers_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_part_size_histogram_matches_duckdb():
    from deepkg_ray.oracle import part_size_histogram_oracle
    from deepkg_ray.pipelines.relational import part_size_histogram
    got = _canon(part_size_histogram(SF).to_pandas())
    con = duckdb.connect()
    con.execute("CREATE VIEW part AS SELECT * FROM "
                f"read_parquet('{SF}/part.parquet')")
    exp = _canon(con.sql(part_size_histogram_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)
    # the histogram covers every part exactly once
    n = con.sql("SELECT count(*) FROM part").fetchone()[0]
    assert got["n"].sum() == n


# ------------------------------------------------- search, gini ----------

def test_conjunctive_search_golden():
    from deepkg_ray.stages.textstats import conjunctive_search
    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["alpha beta alpha", "alpha gamma", "beta beta alpha"]})
    out = (conjunctive_search(rd.from_pandas(df), query="alpha beta")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [0, 2]      # doc 1 lacks 'beta'
    assert out["tf_sum"].tolist() == [3, 3]


def test_conjunctive_search_matches_duckdb():
    from deepkg_ray.oracle import conjunctive_search_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import conjunctive_search
    got = _canon(conjunctive_search(
        read_documents(SF, ["doc_id", "text"])).to_pandas())
    con = _docs_con()
    exp = _canon(con.sql(conjunctive_search_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_source_length_gini_golden():
    from deepkg_ray.stages.textstats import source_length_gini
    # equal lengths → gini 0; lengths 1 and 3 → G = (2·(1·1+2·3) − 3·4)
    #  / (2·4) = 2/8 = 0.25
    df = pd.DataFrame({
        "source": ["a", "a", "b", "b"],
        "text": ["x y", "p q", "w", "u v w"]})
    out = (source_length_gini(rd.from_pandas(df)).to_pandas()
           .sort_values("source").reset_index(drop=True))
    assert out["gini"].tolist() == [0.0, 0.25]


def test_source_length_gini_matches_duckdb():
    from deepkg_ray.oracle import source_length_gini_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import source_length_gini
    got = _canon(source_length_gini(
        read_documents(SF, ["source", "text"])).to_pandas())
    con = _docs_con()
    exp = _canon(con.sql(source_length_gini_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_type_cooccurrence_golden():
    from deepkg_ray.stages.events import type_cooccurrence_jaccard
    # users: u1 does a+b, u2 does a, u3 does b+c
    df = pd.DataFrame({
        "user_id": ["u1", "u1", "u2", "u3", "u3", "u1"],
        "event_type": ["a", "b", "a", "b", "c", "a"]})
    out = (type_cooccurrence_jaccard(rd.from_pandas(df)).to_pandas()
           .set_index(["type_a", "type_b"]))
    assert out.loc[("a", "b"), "n_both"] == 1     # u1
    assert out.loc[("a", "b"), "n_either"] == 3   # u1, u2, u3
    assert out.loc[("a", "c"), "n_both"] == 0
    assert out.loc[("b", "c"), "n_both"] == 1     # u3
    assert abs(out.loc[("a", "b"), "jaccard"] - 0.333333) < 1e-9


def test_type_cooccurrence_matches_duckdb():
    from deepkg_ray.oracle import type_cooccurrence_jaccard_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.events import type_cooccurrence_jaccard
    got = _canon(type_cooccurrence_jaccard(
        read_events(SF, ["user_id", "event_type"])).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(type_cooccurrence_jaccard_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_grouped_winsorized_mean_golden():
    from deepkg_ray.stages.quantiles import grouped_winsorized_mean
    # values 1..9 + outlier 1000 at (q10, q90): disc bounds are the
    # elements at idx ceil(q·n)−1 → lo = 1 (idx 0), hi = 9 (idx 8),
    # so the outlier pins to 9
    df = pd.DataFrame({
        "event_type": ["a"] * 10,
        "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1000.0]})
    out = grouped_winsorized_mean(rd.from_pandas(df),
                                  q_lo=0.1, q_hi=0.9).to_pandas()
    # bounds: lo = idx ceil(1)−1=0 → 1; hi = idx ceil(9)−1=8 → 9
    # clipped sum = 45 + 9 = 54 → mean 5.4
    assert out["wmean"].item() == 5.4


def test_grouped_winsorized_mean_matches_duckdb():
    from deepkg_ray.oracle import grouped_winsorized_mean_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import grouped_winsorized_mean
    got = _canon(grouped_winsorized_mean(
        read_events(SF, ["event_type", "value"])).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(grouped_winsorized_mean_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_partitioned_prune_counts_matches_filtered_base():
    from deepkg_ray.oracle import partitioned_prune_counts_oracle
    from deepkg_ray.sources.readers import partitioned_prune_counts
    got = _canon(partitioned_prune_counts(
        SF, tmp_root="/tmp/deepkg_part_test", cleanup=False).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(partitioned_prune_counts_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)
    # the partitioned layout really exists, one dir per type
    import os
    import shutil
    base = partitioned_prune_counts.last_out_dir
    assert sorted(d for d in os.listdir(base)
                  if d.startswith("event_type=")) == [
        f"event_type={t}" for t in
        ["click", "error", "purchase", "signup", "view"]]
    shutil.rmtree(base, ignore_errors=True)


def test_embedding_dim_stats_golden():
    from deepkg_ray.stages.similarity import embedding_dim_stats
    df = pd.DataFrame({
        "embedding": [np.array([1.0, 0.0]), np.array([3.0, 0.0])]})
    out = (embedding_dim_stats(rd.from_pandas(df), dim=2).to_pandas()
           .sort_values("i").reset_index(drop=True))
    assert out["mean"].tolist() == [2.0, 0.0]
    assert out["std"].tolist() == [1.0, 0.0]     # population std of {1,3}


def test_embedding_dim_stats_matches_duckdb():
    import duckdb as _d
    from deepkg_ray.oracle import embedding_dim_stats_oracle
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import embedding_dim_stats
    got = _canon(embedding_dim_stats(
        read_embeddings(SF, ["embedding"])).to_pandas())
    con = _d.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    exp = _canon(con.sql(embedding_dim_stats_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_dataset_split_deterministic_and_complete():
    from deepkg_ray.stages.curation import dataset_split_assign
    df = pd.DataFrame({"doc_id": np.arange(500, dtype=np.int64),
                       "lang": ["en", "zh"] * 250})
    out1 = _canon(dataset_split_assign(rd.from_pandas(df)).to_pandas())
    out2 = _canon(dataset_split_assign(
        rd.from_pandas(df).repartition(7)).to_pandas())
    pd.testing.assert_frame_equal(out1, out2)   # partitioning-invariant
    assert out1["n"].sum() == 500               # every row assigned once
    tr = out1[out1["split"] == "train"]["n"].sum()
    assert 320 <= tr <= 480                      # ~80% of 500


def test_dataset_split_matches_duckdb():
    from deepkg_ray.oracle import dataset_split_assign_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import dataset_split_assign
    got = _canon(dataset_split_assign(
        read_documents(SF, ["doc_id", "lang"])).to_pandas())
    con = _docs_con()
    exp = _canon(con.sql(dataset_split_assign_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_harmonic_mean_golden():
    import ray.data as _rd
    from deepkg_ray.stages.quantiles import grouped_harmonic_mean
    # harmonic mean of {1, 2} = 2/(1 + 0.5) = 4/3
    df = pd.DataFrame({"event_type": ["a", "a", "a"],
                       "value": [1.0, 2.0, -5.0]})   # negative excluded
    out = grouped_harmonic_mean(_rd.from_pandas(df)).to_pandas()
    assert out["n"].item() == 2
    assert abs(out["hmean"].item() - 4 / 3) < 1e-6


def test_weighted_median_matches_duckdb():
    from deepkg_ray.oracle import weighted_median_price_oracle
    from deepkg_ray.stages.quantiles import weighted_median_price
    got = _canon(weighted_median_price(SF, qs=(0.25, 0.5, 0.75))
                 .to_pandas())
    con = duckdb.connect()
    con.execute("CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF}/lineitem.parquet')")
    exp = _canon(con.sql(
        weighted_median_price_oracle(qs=(0.25, 0.5, 0.75))).df())
    pd.testing.assert_frame_equal(got, exp)


def test_harmonic_mean_matches_duckdb():
    from deepkg_ray.oracle import grouped_harmonic_mean_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import grouped_harmonic_mean
    got = _canon(grouped_harmonic_mean(
        read_events(SF, ["event_type", "value"])).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(grouped_harmonic_mean_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_salted_type_stats_matches_plain_groupby():
    from deepkg_ray.oracle import salted_type_stats_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.events import salted_type_stats
    got = _canon(salted_type_stats(
        read_events(SF, ["event_id", "event_type", "value"])).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(salted_type_stats_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_salted_type_stats_hot_key_spread():
    from deepkg_ray.stages.events import salted_type_stats
    # one hot key with 400 rows, one cold with 4 — result must still be
    # the plain totals
    df = pd.DataFrame({
        "event_id": np.arange(404, dtype=np.int64),
        "event_type": ["hot"] * 400 + ["cold"] * 4,
        "value": [1.0] * 404})
    out = (salted_type_stats(rd.from_pandas(df)).to_pandas()
           .set_index("event_type"))
    assert out.loc["hot", "n"] == 400 and out.loc["cold", "n"] == 4
    assert out.loc["hot", "sum_micros"] == 400_000_000


def test_session_stats_golden():
    from deepkg_ray.stages.windows import session_stats
    # u1: events at 0s, 10s (one session, purchase 5.0 at 10s), then a
    # 1h gap → second session of 1 event; u2: single event
    df = pd.DataFrame({
        "user_id": ["u1", "u1", "u1", "u2"],
        "event_id": np.arange(4, dtype=np.int64),
        "ts": pd.to_datetime([0, 10, 4000, 7], unit="s"),
        "event_type": ["view", "purchase", "view", "view"],
        "value": [1.0, 5.0, 2.0, 3.0],
    })
    out = (session_stats(rd.from_pandas(df), n_parts=2).to_pandas()
           .set_index("session_len"))
    assert out.loc[2, "n_sessions"] == 1
    assert out.loc[2, "total_duration_us"] == 10_000_000
    assert out.loc[2, "purchase_micros"] == 5_000_000
    assert out.loc[1, "n_sessions"] == 2     # u1's tail + u2


def test_session_stats_matches_duckdb():
    from deepkg_ray.oracle import session_stats_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import session_stats
    got = _canon(session_stats(
        read_events(SF, ["user_id", "event_id", "ts", "event_type",
                         "value"])).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(session_stats_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_dedup_keep_longest_golden():
    from deepkg_ray.stages.dedup import dedup_keep_longest
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["Hello World", "  hello world ", "hello world!", "x"]})
    # docs 0 and 1 normalize identically ("hello world"); doc 1's
    # normalized length ties doc 0's → smaller id (0) survives
    out = (dedup_keep_longest(rd.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 3
    grp = out[out["n_dups"] == 2]
    assert grp["doc_id"].item() == 0


def test_dedup_keep_longest_matches_duckdb():
    from deepkg_ray.oracle import dedup_keep_longest_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.dedup import dedup_keep_longest
    got = _canon(dedup_keep_longest(
        read_documents(SF, ["doc_id", "text"])).to_pandas())
    con = _docs_con()
    exp = _canon(con.sql(dedup_keep_longest_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_lang_top_tokens_matches_duckdb():
    from deepkg_ray.oracle import lang_top_tokens_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import lang_top_tokens
    got = _canon(lang_top_tokens(
        read_documents(SF, ["lang", "text"])).to_pandas())
    con = _docs_con()
    exp = _canon(con.sql(lang_top_tokens_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_events_value_histogram_matches_duckdb():
    from deepkg_ray.oracle import value_histogram_by_type_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import value_histogram_by_type
    got = _canon(value_histogram_by_type(
        read_events(SF, ["event_type", "value"])).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(value_histogram_by_type_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)
    # per-type bucket counts cover every event exactly once
    n = con.sql("SELECT count(*) FROM events").fetchone()[0]
    assert got["n"].sum() == n


def test_events_heatmap_matches_duckdb():
    from deepkg_ray.oracle import dow_hour_heatmap_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import dow_hour_heatmap
    got = _canon(dow_hour_heatmap(read_events(SF, ["ts"])).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(dow_hour_heatmap_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)
    n = con.sql("SELECT count(*) FROM events").fetchone()[0]
    assert got["n"].sum() == n


def test_training_manifest_matches_duckdb():
    from deepkg_ray.oracle import training_manifest_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import training_manifest
    got = _canon(training_manifest(
        read_documents(SF, ["doc_id", "text"])).to_pandas())
    con = _docs_con()
    exp = _canon(con.sql(training_manifest_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)
    assert set(got["split"]) <= {"train", "val", "test"}


def test_source_dup_rates_matches_duckdb():
    from deepkg_ray.oracle import source_dup_rates_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.dedup import source_dup_rates
    got = _canon(source_dup_rates(
        read_documents(SF, ["doc_id", "text", "source"])).to_pandas())
    con = _docs_con()
    exp = _canon(con.sql(source_dup_rates_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_brand_price_summary_matches_duckdb():
    import ray.data as _rd
    from deepkg_ray.oracle import brand_price_summary_oracle
    from deepkg_ray.stages.quantiles import grouped_quantiles_cont
    ds = _rd.read_parquet(f"{SF}/part.parquet",
                          columns=["p_brand", "p_retailprice"])
    got = _canon(grouped_quantiles_cont(
        ds, "p_brand", "p_retailprice",
        [0.0, 0.25, 0.5, 0.75, 1.0]).to_pandas()
        .rename(columns={"p_brand": "p_brand"}))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM "
                f"read_parquet('{SF}/part.parquet')")
    exp = _canon(con.sql(brand_price_summary_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_daily_type_mix_shares_sum_to_one():
    from deepkg_ray.oracle import daily_type_mix_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import daily_type_mix
    got = daily_type_mix(
        read_events(SF, ["ts", "event_type"])).to_pandas()
    con = _events_con()
    exp = _canon(con.sql(daily_type_mix_oracle()).df())
    pd.testing.assert_frame_equal(_canon(got), exp)
    sums = got.groupby("day_us")["share"].sum()
    assert ((sums - 1.0).abs() < 1e-4).all()   # round6 residuals only


def test_event_context_pairs_golden():
    from deepkg_ray.stages.windows import event_context_pairs
    # u1 sequence a,b,c with k=2 → pairs: (a,b),(a,c),(b,c)
    df = pd.DataFrame({
        "user_id": ["u1"] * 3,
        "ts": pd.to_datetime([1, 2, 3], unit="s"),
        "event_id": np.arange(3, dtype=np.int64),
        "event_type": ["a", "b", "c"]})
    out = (event_context_pairs(rd.from_pandas(df), k=2).to_pandas()
           .sort_values(["type_a", "type_b"]).reset_index(drop=True))
    assert list(zip(out["type_a"], out["type_b"])) == [
        ("a", "b"), ("a", "c"), ("b", "c")]
    assert out["n"].tolist() == [1, 1, 1]


def test_event_context_pairs_matches_duckdb():
    from deepkg_ray.oracle import event_context_pairs_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import event_context_pairs
    got = _canon(event_context_pairs(
        read_events(SF, ["user_id", "ts", "event_id", "event_type"]))
        .to_pandas())
    con = _events_con()
    exp = _canon(con.sql(event_context_pairs_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_weekly_active_users_golden():
    from deepkg_ray.stages.windows import weekly_active_users
    # day 0: u1, u2; day 1: u1; day 9: u3 (outside day-1's window)
    day = 86_400
    df = pd.DataFrame({
        "ts": pd.to_datetime([0, 10, day + 5, 9 * day], unit="s"),
        "user_id": ["u1", "u2", "u1", "u3"]})
    out = (weekly_active_users(rd.from_pandas(df)).to_pandas()
           .sort_values("day_us").reset_index(drop=True))
    assert out["dau"].tolist() == [2, 1, 1]
    # day 1's trailing week includes day 0 → wau = 2; day 9 stands alone
    assert out["wau"].tolist() == [2, 2, 1]
    assert out["stickiness"].tolist() == [1.0, 0.5, 1.0]


def test_weekly_active_users_matches_duckdb():
    from deepkg_ray.oracle import weekly_active_users_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import weekly_active_users
    got = _canon(weekly_active_users(
        read_events(SF, ["ts", "user_id"])).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(weekly_active_users_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_value_autocorr_golden():
    from deepkg_ray.stages.windows import value_autocorr
    # perfectly alternating series → strong negative lag-1 autocorr
    df = pd.DataFrame({
        "user_id": ["u"] * 8,
        "ts": pd.to_datetime(np.arange(8), unit="s"),
        "event_id": np.arange(8, dtype=np.int64),
        "value": [1.0, -1.0] * 4})
    out = value_autocorr(rd.from_pandas(df), n_parts=2).to_pandas()
    assert out["n_pairs"].item() == 7
    assert out["autocorr"].item() < -0.9


def test_value_autocorr_matches_duckdb():
    from deepkg_ray.oracle import value_autocorr_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import value_autocorr
    got = _canon(value_autocorr(
        read_events(SF, ["user_id", "ts", "event_id", "value"]))
        .to_pandas())
    con = _events_con()
    exp = _canon(con.sql(value_autocorr_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_pair_lift_golden():
    from deepkg_ray.stages.basket import pair_lift
    # baskets: {1,2} x3, {1},{2},{3} → c(1)=4, c(2)=4, c(12)=3, N=6
    # lift(1,2) = 6*3/(4*4) = 1.125
    df = pd.DataFrame({
        "basket": [10, 10, 11, 11, 12, 12, 13, 14, 15],
        "item": [1, 2, 1, 2, 1, 2, 1, 2, 3]})
    out = pair_lift(rd.from_pandas(df), basket_col="basket",
                    item_col="item", min_support=2).to_pandas()
    assert out["n"].tolist() == [3]
    assert out["lift"].tolist() == [1.125]


def test_pair_lift_matches_duckdb():
    from deepkg_ray.oracle import pair_lift_oracle
    from deepkg_ray.sources.readers import read_table
    from deepkg_ray.stages.basket import pair_lift
    got = _canon(pair_lift(
        read_table(SF, "lineitem", ["l_orderkey", "l_partkey"]),
        basket_col="l_orderkey", item_col="l_partkey").to_pandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{SF}/lineitem.parquet')")
    exp = _canon(con.sql(pair_lift_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_weekend_effect_golden():
    from deepkg_ray.stages.windows import weekend_effect
    # Jan 6+7 2024 = Sat+Sun; Jan 8-9 = Mon-Tue
    df = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-06", "2024-01-07",
                              "2024-01-08", "2024-01-09"]),
        "value": [10.0, 10.0, 2.0, 2.0]})
    out = weekend_effect(rd.from_pandas(df)).to_pandas()
    assert out["n_weekend"].item() == 2 and out["n_weekday"].item() == 2
    assert out["mean_weekend"].item() == 10.0
    assert out["mean_weekday"].item() == 2.0


def test_mann_whitney_golden_bruteforce():
    """Bucketed half-unit U == the O(n1·n2) definition (2 per strict
    weekend win, 1 per tie), with values straddling bucket boundaries
    (shift=2 -> 4-milli buckets) and tie classes on both sides."""
    from deepkg_ray.stages.windows import mann_whitney_weekend
    we_days = ["2024-01-06", "2024-01-07"]
    wd_days = ["2024-01-08", "2024-01-09"]
    we_vals = [0.010, 0.010, 0.002, 0.050, 0.007]
    wd_vals = [0.004, 0.010, 0.002, 0.049, 0.003, 0.051]
    df = pd.DataFrame({
        "ts": pd.to_datetime(
            [we_days[i % 2] for i in range(len(we_vals))]
            + [wd_days[i % 2] for i in range(len(wd_vals))]),
        "value": we_vals + wd_vals})
    out = mann_whitney_weekend(rd.from_pandas(df), shift=2).to_pandas()
    wem = [round(v * 1e3) for v in we_vals]
    wdm = [round(v * 1e3) for v in wd_vals]
    u2 = sum(2 if a > b else (1 if a == b else 0)
             for a in wem for b in wdm)
    assert out["u2_weekend"].item() == u2
    assert out["n_weekend"].item() == len(we_vals)
    assert out["n_weekday"].item() == len(wd_vals)
    from collections import Counter
    t3 = sum(c ** 3 - c for c in Counter(wem + wdm).values())
    assert out["tie_t3"].item() == t3


def test_mann_whitney_matches_duckdb():
    from deepkg_ray.oracle import mann_whitney_weekend_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import mann_whitney_weekend
    got = _canon(mann_whitney_weekend(
        read_events(SF, ["ts", "value"])).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(mann_whitney_weekend_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_weekend_effect_matches_duckdb():
    from deepkg_ray.oracle import weekend_effect_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.windows import weekend_effect
    got = _canon(weekend_effect(
        read_events(SF, ["ts", "value"])).to_pandas())
    con = _events_con()
    exp = _canon(con.sql(weekend_effect_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_source_vocab_overlap_bitmask_matches_sets(sf_dir):
    """The bitmask/Gram plan equals a direct driver set computation."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import _WS, source_vocab_overlap

    got = (source_vocab_overlap(read_documents(sf_dir, ["text", "source"]))
           .to_pandas().sort_values(["s1", "s2"]).reset_index(drop=True))

    df = pq.read_table(f"{sf_dir}/documents.parquet",
                       columns=["text", "source"]).to_pandas()
    vocab: dict[str, set] = {}
    for t, s in zip(df["text"], df["source"]):
        tl = t.lower().strip()
        if tl:
            vocab.setdefault(s, set()).update(_WS.split(tl))
    rows = []
    for s1 in sorted(vocab):
        for s2 in sorted(vocab):
            if s1 < s2:
                a, b = vocab[s1], vocab[s2]
                i = len(a & b)
                rows.append((s1, s2, len(a), len(b), i,
                             np.floor(i / len(a | b) * 1e6 + 0.5) / 1e6))
    exp = pd.DataFrame(rows, columns=["s1", "s2", "n_a", "n_b", "n_inter",
                                      "jaccard"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_readability_scores_golden(ray_session):
    """Hand-computed Flesch on a two-doc table."""
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.textstats import readability_scores
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["the cat sat. the cat ran.", "aaa eee", "  "],
                         pa.string())})
    out = (readability_scores(rd.from_arrow(t)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == [1, 2]          # blank doc dropped
    r = out.iloc[0]
    # 6 words, 2 sentences, 6 vowel groups, 4 distinct words
    assert (r["n_words"], r["n_sentences"], r["n_syllables"],
            r["n_distinct"]) == (6, 2, 6, 4)
    exp = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert abs(r["flesch"] - exp) < 1e-6
    assert abs(r["ttr"] - round(4 / 6, 6)) < 1e-6


def test_orc_roundtrip_matches_csv_roundtrip(sf_dir):
    """The ORC path and the CSV path land on identical aggregates —
    both interchange layers are lossless."""
    import pandas as pd
    from deepkg_ray.sources.readers import (csv_roundtrip_counts,
                                            orc_roundtrip_counts)
    a = (orc_roundtrip_counts(sf_dir).to_pandas()
         .sort_values("event_type").reset_index(drop=True))
    b = (csv_roundtrip_counts(sf_dir).to_pandas()
         .sort_values("event_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_char_entropy_goldens(ray_session):
    """Uniform 2-char doc -> ln 2; single-char doc -> 0."""
    import math

    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.textstats import char_entropy
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["abab", "aaaa"], pa.string())})
    out = char_entropy(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert abs(out.loc[1, "entropy"] - math.log(2)) < 1e-5
    assert out.loc[2, "entropy"] == 0.0
    assert out.loc[1, "n_distinct_chars"] == 2


def test_hapax_by_source_golden(ray_session):
    """Cross-source repeats are not hapax; true singletons are."""
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.textstats import hapax_by_source
    t = pa.table({
        "source": pa.array(["s1", "s2"], pa.string()),
        "text": pa.array(["alpha beta shared", "gamma shared"],
                         pa.string())})
    out = hapax_by_source(rd.from_arrow(t)).to_pandas() \
        .set_index("source")
    # 'shared' occurs in both sources -> not hapax anywhere
    assert out.loc["s1", "n_hapax"] == 2       # alpha, beta
    assert out.loc["s2", "n_hapax"] == 1       # gamma
    assert out.loc["s1", "n_tokens"] == 3


def test_source_weighted_jaccard_golden(ray_session):
    """min/max identity on a hand case; identical corpora score 1."""
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.textstats import source_weighted_jaccard
    t = pa.table({
        "source": pa.array(["a", "b"], pa.string()),
        "text": pa.array(["x x y", "x y y z"], pa.string())})
    out = source_weighted_jaccard(rd.from_arrow(t)).to_pandas()
    r = out.iloc[0]
    # counts a: x2 y1; b: x1 y2 z1 -> min 1+1=2, max 2+2+1=5
    assert (r["sum_min"], r["sum_max"]) == (2, 5)
    assert abs(r["wjaccard"] - 0.4) < 1e-9
    t2 = pa.table({
        "source": pa.array(["a", "b"], pa.string()),
        "text": pa.array(["p q", "p q"], pa.string())})
    out2 = source_weighted_jaccard(rd.from_arrow(t2)).to_pandas()
    assert out2["wjaccard"].iloc[0] == 1.0


def test_chi2_tokens_golden():
    """Hand-built corpus where 'zebra' is exclusive to src0: it must top
    src0's list; the integer-rational micros equal the float chi2."""
    from deepkg_ray.stages.textstats import chi2_tokens
    df = pd.DataFrame({
        "source": ["src0", "src0", "src1", "src1"],
        "text": ["zebra zebra common", "common common",
                 "common common common", "other common"]})
    out = chi2_tokens(rd.from_pandas(df), k=2).to_pandas()
    top0 = out[out["source"] == "src0"].iloc[0]
    assert top0["token"] == "zebra" and top0["n_sw"] == 2
    # brute-force chi2 for (src0, zebra): a=2,b=3,c=0,d=5, N=10
    a, b, c_, d_ = 2, 3, 0, 5
    n = a + b + c_ + d_
    num = n * (a * d_ - b * c_) ** 2 * 10**6
    den = (a + b) * (c_ + d_) * (a + c_) * (b + d_)
    assert top0["chi2_micros"] == num // den
    assert (out.groupby("source").size() <= 2).all()
