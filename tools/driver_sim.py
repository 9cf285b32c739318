"""Simulate the driver's correctness pass: run every queries() entry at
sf0.01 AND its oracle_sql() in DuckDB, compare row count + schema + sorted
values.  Usage: python tools/driver_sim.py [sf_dir] [query ...]"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()   # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith(("uint", "int", "Int", "UInt")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as mod

    args = sys.argv[1:]
    sf = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    only = [a for a in args if not a.startswith("/")]

    qs = mod.queries()
    oracles = mod.oracle_sql()
    con = duckdb.connect()
    # the real driver pre-registers the testdata tables as views
    for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
                "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM "
                    f"read_parquet('{sf}/{tbl}.parquet')")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf)))
        except Exception as e:
            print(f"FAIL {name}: engine raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        t_engine = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows={len(mine)} (rows-only, no oracle) "
                  f"[{t_engine:.1f}s]")
            continue
        t0 = time.time()
        ref = canon(con.execute(sql).fetchdf())
        t_oracle = time.time() - t0
        status = []
        if len(mine) != len(ref):
            status.append(f"ROWCOUNT {len(mine)} vs {len(ref)}")
        elif list(mine.columns) != list(ref.columns):
            status.append(f"SCHEMA {list(mine.columns)} vs {list(ref.columns)}")
        else:
            try:
                pd.testing.assert_frame_equal(mine, ref, check_dtype=False,
                                              check_exact=False, rtol=1e-5)
            except AssertionError as e:
                status.append("VALUES differ: " + str(e).split("\n")[0])
                # show a small diff sample
                neq = (mine != ref).any(axis=1)
                print(mine[neq].head(3))
                print(ref[neq].head(3))
        if status:
            print(f"FAIL {name}: {'; '.join(status)} [{t_engine:.1f}s engine, "
                  f"{t_oracle:.1f}s oracle]")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(mine)} cols={list(mine.columns)} "
                  f"[{t_engine:.1f}s engine, {t_oracle:.1f}s oracle]")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
