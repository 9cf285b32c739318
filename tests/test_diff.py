"""Snapshot diff + FK audit (stages/diff.py) goldens and tier agreement."""

import numpy as np
import pandas as pd
import ray.data as rd

from deepkg_ray.stages.diff import fk_orphans, table_diff


def _ds(rows):
    return rd.from_pandas(pd.DataFrame(rows))


def test_table_diff_golden():
    a = _ds({"k": [1, 2, 3, 4], "v": [10.0, 20.0, 30.0, 40.0]})
    b = _ds({"k": [2, 3, 4, 5], "v": [20.0, 31.5, 40.0, 50.0]})
    out = (table_diff(a, b, "k", "v").to_pandas()
           .sort_values("k").reset_index(drop=True))
    # k=1 removed, k=2 unchanged (dropped), k=3 changed, k=4 unchanged, k=5 added
    assert out["k"].tolist() == [1, 3, 5]
    assert out["status"].tolist() == ["removed", "changed", "added"]
    assert np.isclose(out["value_a"].tolist(), [10.0, 30.0, -1.0]).all()
    assert np.isclose(out["value_b"].tolist(), [-1.0, 31.5, 50.0]).all()


def test_table_diff_micros_exact_equality():
    # values equal to 6 decimals are "unchanged" even if float repr differs
    a = _ds({"k": [1], "v": [0.1 + 0.2]})
    b = _ds({"k": [1], "v": [0.3]})
    out = table_diff(a, b, "k", "v").to_pandas()
    assert len(out) == 0      # 300000 micros on both sides


def test_fk_orphans_tiers_agree_and_golden():
    child = _ds({"ck": [1, 1, 2, 3, 9, 9, 9]})
    parent = _ds({"pk": [1, 2, 4]})
    for bc in (True, False):
        out = fk_orphans(child, parent, "ck", "pk",
                         "child.ck->parent", broadcast=bc)
        assert out["fk_edge"].tolist() == ["child.ck->parent"]
        assert int(out["n_child"].iloc[0]) == 7
        # orphans: key 3 (1 row) + key 9 (3 rows)
        assert int(out["n_orphans"].iloc[0]) == 4, f"broadcast={bc}"


def test_snapshot_diff_and_fk_audit_sql_parity(sf_dir):
    import duckdb
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m
    from deepkg_ray import oracle
    con = duckdb.connect()
    for tbl in ["orders", "lineitem", "customer", "nation", "supplier"]:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{tbl}.parquet')")
    eng = (m.queries()["snapshot_diff"](sf_dir).to_pandas()
           .sort_values("o_orderkey").reset_index(drop=True))
    ora = (con.execute(oracle.snapshot_diff_oracle()).df()
           .sort_values("o_orderkey").reset_index(drop=True))
    assert len(eng) == len(ora) > 0
    assert (eng["status"].to_numpy() == ora["status"].to_numpy()).all()
    for c in ["value_a", "value_b"]:
        assert np.isclose(eng[c].to_numpy(), ora[c].to_numpy()).all()
    # at least one of each status present in the synthetic delta
    assert set(eng["status"]) == {"added", "removed", "changed"}

    key = ["fk_edge"]
    eng = (m.queries()["fk_audit"](sf_dir)
           .sort_values(key).reset_index(drop=True))
    ora = (con.execute(oracle.fk_audit_oracle()).df()
           .sort_values(key).reset_index(drop=True))
    assert eng["fk_edge"].tolist() == ora["fk_edge"].tolist()
    assert (eng["n_child"].to_numpy() == ora["n_child"].to_numpy()).all()
    assert (eng["n_orphans"].to_numpy() == ora["n_orphans"].to_numpy()).all()
    assert eng["n_orphans"].sum() > 0     # the %13 injection found orphans
