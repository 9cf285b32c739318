"""Round-4 TPC-H playbook additions (Q5/Q7/Q9/Q12/Q21 shapes): DuckDB
parity at sf0.001."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]


def _con():
    con = duckdb.connect()
    for t in TABLES:
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


def _check(fn, sql):
    got = _canon(fn(SF).to_pandas())
    con = _con()
    exp = _canon(con.sql(sql).df())
    con.close()
    pd.testing.assert_frame_equal(got, exp)
    return got


def test_q5_local_supplier_volume():
    from deepkg_ray import oracle
    from deepkg_ray.pipelines.relational import local_supplier_volume
    _check(local_supplier_volume, oracle.local_supplier_volume_oracle())


def test_q7_volume_shipping():
    from deepkg_ray import oracle
    from deepkg_ray.pipelines.relational import volume_shipping
    _check(volume_shipping, oracle.volume_shipping_oracle())


def test_q9_product_type_profit():
    from deepkg_ray import oracle
    from deepkg_ray.pipelines.relational import product_type_profit
    got = _check(product_type_profit, oracle.product_type_profit_oracle())
    assert len(got) > 0


def test_q12_shipmode_priority_counts():
    from deepkg_ray import oracle
    from deepkg_ray.pipelines.relational import shipmode_priority_counts
    got = _check(shipmode_priority_counts,
                 oracle.shipmode_priority_counts_oracle())
    assert set(got["bucket"]) <= {"late", "ontime"}


def test_q21_waiting_suppliers():
    from deepkg_ray import oracle
    from deepkg_ray.pipelines.relational import waiting_suppliers
    _check(waiting_suppliers, oracle.waiting_suppliers_oracle())


def test_semantic_contamination_matches_brute_force():
    """Thresholded scan must equal the brute-force pair set (same micros
    cosine) on a small synthetic corpus with planted near-dups."""
    import ray.data as rd
    from deepkg_ray.functions.numeric import cosine_micros, micros_matrix
    from deepkg_ray.stages.similarity import semantic_contamination
    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 8)).astype(np.float32)
    base[25] = base[0] + 0.01           # planted contamination
    ids = np.arange(40, dtype=np.int64)
    q, qids = base[:4], ids[:4]
    train = pd.DataFrame({"vec_id": ids[4:],
                          "embedding": list(base[4:])})
    out = (semantic_contamination(rd.from_pandas(train), q, qids, tau=0.9)
           .to_pandas().sort_values(["query_id", "vec_id"])
           .reset_index(drop=True))
    sims = cosine_micros(micros_matrix(q), micros_matrix(base[4:]))
    qi, vi = np.nonzero(sims >= 0.9)
    assert list(zip(out["query_id"], out["vec_id"])) == \
        list(zip(qids[qi], ids[4:][vi]))
    assert (0, 25) in set(zip(out["query_id"], out["vec_id"]))


def test_mixture_plan_quotas_and_shortfall():
    import ray.data as rd
    from deepkg_ray.stages.textstats import mixture_plan
    df = pd.DataFrame({"doc_id": range(30),
                       "source": ["a"] * 20 + ["b"] * 5 + ["c"] * 5})
    out = (mixture_plan(rd.from_pandas(df),
                        weights={"a": 0.5, "b": 0.5}, budget=20)
           .to_pandas())
    # a: quota 10 of 20; b: quota 10 but only 5 exist (shortfall); c: no
    # weight -> nothing
    counts = out["source"].value_counts().to_dict()
    assert counts == {"a": 10, "b": 5}
    # deterministic: same input -> same ids
    out2 = mixture_plan(rd.from_pandas(df),
                        weights={"a": 0.5, "b": 0.5}, budget=20).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_rollup_subtotals_consistent(sf_dir):
    """ROLLUP subtotals must equal sums of their leaf cells."""
    from deepkg_ray.pipelines.relational import rollup_segment_priority
    df = rollup_segment_priority(sf_dir).to_pandas()
    leaf = df[(df.c_mktsegment != "ALL") & (df.o_orderpriority != "ALL")]
    seg = df[(df.c_mktsegment != "ALL") & (df.o_orderpriority == "ALL")]
    assert set(seg.c_mktsegment) == set(leaf.c_mktsegment)
    for s, n in zip(seg.c_mktsegment, seg.n):
        assert n == leaf[leaf.c_mktsegment == s].n.sum()
    total = df[df.c_mktsegment == "ALL"]
    assert len(total) == 1 and total.n.iloc[0] == leaf.n.sum()
    assert total.o_orderpriority.iloc[0] == "ALL"


def test_revenue_concentration_golden(ray_session, tmp_path):
    """4 customers with revenues 1,1,1,7 (total 10): top-10% = top-1
    customer = 0.7 share; Gini = (2*(1+2+3+28) - 5*10)/(4*10) = 0.45."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pa.table({
        "o_custkey": pa.array([1, 2, 3, 4, 4], pa.int64()),
        "o_totalprice": pa.array([1.0, 1.0, 1.0, 3.0, 4.0])})
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    from deepkg_ray.pipelines.relational import revenue_concentration
    out = revenue_concentration(str(tmp_path)).to_pandas()
    assert out["n_customers"].iloc[0] == 4
    assert out["total_micros"].iloc[0] == 10_000_000
    assert out["top10_share"].iloc[0] == 0.7
    assert out["top1_share"].iloc[0] == 0.7
    assert abs(out["gini"].iloc[0] - 0.45) < 1e-12


def test_order_line_histogram_matches_duckdb(ray_session):
    from deepkg_ray.pipelines.relational import order_line_histogram
    got = (order_line_histogram(SF).to_pandas()
           .sort_values("n_lines").reset_index(drop=True))
    want = (_con().execute("""
        WITH c AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
                   FROM lineitem GROUP BY l_orderkey)
        SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
        FROM c GROUP BY n_lines ORDER BY n_lines""").fetchdf())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["n_orders"].sum() > 0


def test_brand_hhi_matches_duckdb(ray_session):
    from deepkg_ray.pipelines.relational import brand_hhi
    got = (brand_hhi(SF).to_pandas()
           .sort_values("p_type").reset_index(drop=True))
    want = (_con().execute("""
        WITH r AS (
          SELECT p.p_type, p.p_brand,
                 CAST(SUM(CAST(floor(l.l_extendedprice
                       * (1.0 - l.l_discount) * 1e6 + 0.5) AS BIGINT))
                      AS BIGINT) AS rm
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          GROUP BY p.p_type, p.p_brand)
        SELECT p_type, CAST(count(*) AS BIGINT) AS n_brands,
               CAST(SUM(rm) AS BIGINT) AS total_micros,
               CAST(SUM(CAST(rm AS HUGEINT) * rm) AS DOUBLE)
                 / (CAST(CAST(SUM(rm) AS BIGINT) AS DOUBLE)
                    * CAST(SUM(rm) AS BIGINT)) AS hhi
        FROM r GROUP BY p_type ORDER BY p_type""").fetchdf())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert ((got["hhi"] > 0) & (got["hhi"] <= 1.0)).all()


def test_order_type_diversity_matches_duckdb(ray_session):
    from deepkg_ray.pipelines.relational import order_type_diversity
    got = (order_type_diversity(SF).to_pandas()
           .sort_values("n_types").reset_index(drop=True))
    want = (_con().execute("""
        WITH c AS (SELECT l.l_orderkey,
                          CAST(count(DISTINCT p.p_type) AS BIGINT) AS n_types
                   FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
                   GROUP BY l.l_orderkey)
        SELECT n_types, CAST(count(*) AS BIGINT) AS n_orders
        FROM c GROUP BY n_types ORDER BY n_types""").fetchdf())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
