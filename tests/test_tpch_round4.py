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
