"""Round-3 TPC-H-family additions: Q13 order-count distribution, Q22
dormant-rich customers, Q17 small-lot revenue, Q11 supplier share —
DuckDB parity at tiny scale plus semantics goldens."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "part", "supplier",
              "nation", "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
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


def test_customer_order_distribution_matches_duckdb():
    from deepkg_ray.oracle import customer_order_distribution_oracle
    from deepkg_ray.pipelines.relational import customer_order_distribution
    got = _canon(customer_order_distribution(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(customer_order_distribution_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)
    # distribution covers every customer exactly once
    n_cust = con.sql("SELECT count(*) FROM customer").fetchone()[0]
    assert got["custdist"].sum() == n_cust


def test_dormant_rich_customers_matches_duckdb():
    from deepkg_ray.oracle import dormant_rich_customers_oracle
    from deepkg_ray.pipelines.relational import dormant_rich_customers
    got = _canon(dormant_rich_customers(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(dormant_rich_customers_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0, "cutoff should leave some dormant-rich customers"


def test_small_lot_revenue_matches_duckdb():
    from deepkg_ray.oracle import small_lot_revenue_oracle
    from deepkg_ray.pipelines.relational import small_lot_revenue
    got = _canon(small_lot_revenue(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(small_lot_revenue_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_small_lot_threshold_is_integer_exact():
    # qty*5*n < sum_qty must be equivalent to qty < 0.2*avg for integral
    # quantities: spot-check the division-cleared form on a boundary case
    qm = np.array([10_000_000, 2_000_000, 2_000_000], np.int64)  # 10, 2, 2
    sq, n = int(qm.sum()), len(qm)                               # avg=14/3
    # 0.2*avg = 14/15 ≈ 0.933 → nothing below it
    assert [bool(x * 5 * n < sq) for x in qm] == [False, False, False]
    qm2 = np.array([1_000_000, 50_000_000], np.int64)            # 1, 50
    sq2, n2 = int(qm2.sum()), len(qm2)                           # avg=25.5
    # 0.2*avg = 5.1 → the qty=1 row is below
    assert [bool(x * 5 * n2 < sq2) for x in qm2] == [True, False]


def test_supplier_share_nations_matches_duckdb():
    from deepkg_ray.oracle import supplier_share_nations_oracle
    from deepkg_ray.pipelines.relational import supplier_share_nations
    got = _canon(supplier_share_nations(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(supplier_share_nations_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)
    # every surviving nation really holds > 5% of the global total
    tot = con.sql(
        "SELECT SUM(CAST(floor(s_acctbal*1e6+0.5) AS BIGINT)) "
        "FROM supplier").fetchone()[0]
    assert np.all(got["value_micros"].to_numpy() * 20 > tot)


def test_returned_item_customers_matches_duckdb():
    from deepkg_ray.oracle import returned_item_customers_oracle
    from deepkg_ray.pipelines.relational import returned_item_customers
    got = _canon(returned_item_customers(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(returned_item_customers_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) == 20


def test_top_supplier_revenue_matches_duckdb_with_ties():
    from deepkg_ray.oracle import top_supplier_revenue_oracle
    from deepkg_ray.pipelines.relational import top_supplier_revenue
    got = _canon(top_supplier_revenue(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(top_supplier_revenue_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) >= 1


def test_brand_supplier_counts_matches_duckdb():
    from deepkg_ray.oracle import brand_supplier_counts_oracle
    from deepkg_ray.pipelines.relational import brand_supplier_counts
    got = _canon(brand_supplier_counts(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(brand_supplier_counts_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)
    # the excluded brand never appears
    assert not (got["p_brand"] == "Brand#45").any()


def test_disjunctive_revenue_matches_duckdb():
    from deepkg_ray.oracle import disjunctive_revenue_oracle
    from deepkg_ray.pipelines.relational import disjunctive_revenue
    got = _canon(disjunctive_revenue(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(disjunctive_revenue_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_global_ranks_matches_row_number():
    import numpy as np
    import ray.data as rd
    from deepkg_ray.pipelines.relational import _global_ranks
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "key": rng.integers(-10**12, 10**12, 500).astype(np.int64),
        "o_custkey": np.arange(500, dtype=np.int64)})
    # duplicate keys to exercise the (key, id) tie-break
    df.loc[100:199, "key"] = df.loc[0:99, "key"].to_numpy()
    got = (_global_ranks(rd.from_pandas(df), "key", "o_custkey")
           .to_pandas().sort_values("o_custkey").reset_index(drop=True))
    want = (df.sort_values(["key", "o_custkey"], kind="stable")
            .assign(rank=np.arange(500, dtype=np.int64))
            .sort_values("o_custkey").reset_index(drop=True))
    assert got["rank"].tolist() == want["rank"].tolist()


def test_ntile_rule_matches_duckdb():
    import numpy as np
    from deepkg_ray.pipelines.relational import _ntile
    for n, k in [(7, 5), (10, 3), (5, 5), (4, 5), (23, 4)]:
        got = _ntile(np.arange(n, dtype=np.int64), n, k).tolist()
        con = duckdb.connect()
        exp = [r[0] for r in con.sql(
            f"SELECT NTILE({k}) OVER (ORDER BY x) FROM "
            f"(SELECT unnest(range({n})) x)").fetchall()]
        assert got == exp, (n, k)


def test_rfm_scores_matches_duckdb():
    from deepkg_ray.oracle import rfm_scores_oracle
    from deepkg_ray.pipelines.relational import rfm_scores
    got = _canon(rfm_scores(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(rfm_scores_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_forecast_revenue_matches_duckdb():
    from deepkg_ray.oracle import forecast_revenue_oracle
    from deepkg_ray.pipelines.relational import forecast_revenue
    got = _canon(forecast_revenue(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(forecast_revenue_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_nation_market_share_matches_duckdb():
    from deepkg_ray.oracle import nation_market_share_oracle
    from deepkg_ray.pipelines.relational import nation_market_share
    got = _canon(nation_market_share(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(nation_market_share_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)
    assert (got["share"] <= 1.0).all() and (got["share"] >= 0.0).all()


def test_heavy_part_suppliers_matches_duckdb():
    from deepkg_ray.oracle import heavy_part_suppliers_oracle
    from deepkg_ray.pipelines.relational import heavy_part_suppliers
    got = _canon(heavy_part_suppliers(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(heavy_part_suppliers_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_latest_order_per_customer_matches_duckdb():
    from deepkg_ray.oracle import latest_order_per_customer_oracle
    from deepkg_ray.pipelines.relational import latest_order_per_customer
    got = _canon(latest_order_per_customer(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(latest_order_per_customer_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)
    # exactly one row per customer with orders
    n = con.sql("SELECT count(DISTINCT o_custkey) FROM orders").fetchone()[0]
    assert len(got) == n


def test_upsert_snapshot_matches_duckdb():
    from deepkg_ray.oracle import upsert_snapshot_oracle
    from deepkg_ray.stages.diff import upsert_snapshot
    got = _canon(upsert_snapshot(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(upsert_snapshot_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)
    # deletes really removed rows: applied total < base total
    n_base = con.sql("SELECT count(*) FROM orders").fetchone()[0]
    n_del = con.sql(
        "SELECT count(*) FROM orders WHERE o_orderkey % 7 = 0").fetchone()[0]
    n_ins = con.sql(
        "SELECT count(*) FROM orders WHERE o_orderkey % 11 = 0").fetchone()[0]
    assert got["n"].sum() == n_base - n_del + n_ins


def test_embedding_norms_matches_duckdb():
    import duckdb as _d
    from deepkg_ray.oracle import embedding_norms_oracle
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import embedding_norms
    got = _canon(embedding_norms(
        read_embeddings(SF, ["label", "embedding"])).to_pandas())
    con = _d.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    exp = _canon(con.sql(embedding_norms_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_q13_broadcast_and_join_tiers_agree():
    from deepkg_ray.pipelines.relational import customer_order_distribution
    fast = _canon(customer_order_distribution(SF).to_pandas())
    slow = _canon(customer_order_distribution(
        SF, broadcast_threshold=0).to_pandas())
    pd.testing.assert_frame_equal(fast, slow)


def test_rfm_broadcast_and_join_tiers_agree():
    from deepkg_ray.pipelines.relational import rfm_scores
    fast = _canon(rfm_scores(SF).to_pandas())
    slow = _canon(rfm_scores(SF, broadcast_threshold=0).to_pandas())
    pd.testing.assert_frame_equal(fast, slow)


def test_linkpred_scores_broadcast_and_join_tiers_agree():
    import numpy as np
    import ray.data as rd
    from deepkg_ray.stages.graph import link_prediction_scores
    rng = np.random.default_rng(17)
    e = pd.DataFrame({
        "subj_id": rng.integers(0, 18, 60).astype(np.int64),
        "obj_id": rng.integers(0, 18, 60).astype(np.int64)})
    ds = rd.from_pandas(e)
    fast = (link_prediction_scores(ds, min_cn=1).to_pandas()
            .sort_values(["e1", "e2"]).reset_index(drop=True))
    slow = (link_prediction_scores(ds, min_cn=1, broadcast_threshold=0)
            .to_pandas().sort_values(["e1", "e2"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, slow)


def test_revenue_cohorts_matches_duckdb_and_tiers_agree():
    from deepkg_ray.oracle import revenue_cohorts_oracle
    from deepkg_ray.pipelines.relational import revenue_cohorts
    got = _canon(revenue_cohorts(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(revenue_cohorts_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)
    slow = _canon(revenue_cohorts(SF, broadcast_threshold=0).to_pandas())
    pd.testing.assert_frame_equal(got, slow)
    # age 0 revenue equals the first-order-month totals (cohort sanity)
    assert (got["age_months"] >= 0).all()


def test_segment_priority_counts_matches_duckdb_and_tiers_agree():
    from deepkg_ray.oracle import segment_priority_counts_oracle
    from deepkg_ray.pipelines.relational import segment_priority_counts
    got = _canon(segment_priority_counts(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(segment_priority_counts_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)
    slow = _canon(segment_priority_counts(
        SF, broadcast_threshold=0).to_pandas())
    pd.testing.assert_frame_equal(got, slow)


def test_shipping_delay_quantiles_matches_duckdb():
    from deepkg_ray.oracle import shipping_delay_quantiles_oracle
    from deepkg_ray.pipelines.relational import shipping_delay_quantiles
    got = _canon(shipping_delay_quantiles(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(shipping_delay_quantiles_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_pricing_charge_matches_duckdb():
    from deepkg_ray.oracle import pricing_charge_summary_oracle
    from deepkg_ray.pipelines.relational import pricing_charge_summary
    got = _canon(pricing_charge_summary(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(pricing_charge_summary_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_user_value_bands_matches_duckdb():
    from deepkg_ray.oracle import user_value_bands_oracle
    from deepkg_ray.sources.readers import read_events
    from deepkg_ray.stages.quantiles import grouped_quantiles_cont
    got = _canon(grouped_quantiles_cont(
        read_events(SF, ["user_id", "value"]), "user_id", "value",
        [0.1, 0.9]).to_pandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    exp = _canon(con.sql(user_value_bands_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_embedding_isotropy_golden(ray_session):
    """Identical vectors -> isotropy 1; sign-balanced pair -> 0."""
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.similarity import embedding_isotropy
    v = np.zeros(64, np.float64)
    v[0] = 1.0
    same = pa.table({"embedding": pa.array([v.tolist()] * 4)})
    out = embedding_isotropy(rd.from_arrow(same)).to_pandas()
    assert out["n"].iloc[0] == 4
    assert out["isotropy"].iloc[0] == 1.0
    bal = pa.table({"embedding": pa.array([v.tolist(), (-v).tolist()])})
    out2 = embedding_isotropy(rd.from_arrow(bal)).to_pandas()
    assert out2["isotropy"].iloc[0] == 0.0


def test_knn_mutuality_golden(ray_session):
    """Two tight pairs (a,b) and (c,d) at k=1: every vector's nearest
    neighbor is its partner -> rank-0 mutuality 1.0.  Add a hub-ish
    outlier pulled toward pair 1 at k=1: its nearest (a) does not
    reciprocate, dropping the share to 4/5."""
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.similarity import knn_mutuality
    d = 8
    def v(*coords):
        x = np.zeros(d); x[list(range(len(coords)))] = coords
        return x.tolist()
    vecs = [v(1.0), v(0.99, 0.1), v(0.0, 0.0, 1.0), v(0.0, 0.1, 0.99),
            v(0.9, 0.4)]
    t = pa.table({"vec_id": pa.array(range(5), pa.int64()),
                  "embedding": pa.array(vecs)})
    out = knn_mutuality(rd.from_arrow(t), k=1).to_pandas()
    assert out["rank"].tolist() == [0]
    assert out["n"].iloc[0] == 5
    assert out["n_mutual"].iloc[0] == 4
    assert out["share"].iloc[0] == 0.8


def test_join_size_audit_matches_duckdb_and_actual_join(sf_dir):
    """Audit equals SQL, and est_join_rows equals the true join size."""
    import duckdb

    from deepkg_ray.oracle import join_size_audit_oracle
    from deepkg_ray.pipelines.relational import join_size_audit
    SF = "/root/testdata/sf0.001"
    got = join_size_audit(SF).to_pandas()
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want = con.sql(join_size_audit_oracle()).df()
    for c in sorted(got.columns):
        assert int(got[c].iloc[0]) == int(want[c].iloc[0]), c
    true_join = con.sql(
        "SELECT count(*) FROM orders o JOIN lineitem l "
        "ON l.l_orderkey = o.o_orderkey").fetchone()[0]
    assert int(got["est_join_rows"].iloc[0]) == int(true_join)
