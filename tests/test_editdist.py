"""Edit-distance join: golden kernel cases, brute-force losslessness, and
DuckDB levenshtein parity over the sf0.001 customer names."""

from __future__ import annotations

import itertools
import random

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_edit_distance_le1_kernel():
    from deepkg_ray.stages.editdist import edit_distance_le1
    assert edit_distance_le1("abc", "abc") == 0
    assert edit_distance_le1("abc", "abd") == 1          # substitution
    assert edit_distance_le1("abc", "abcd") == 1         # insertion
    assert edit_distance_le1("abcd", "abd") == 1         # deletion
    assert edit_distance_le1("abc", "axd") == 2
    assert edit_distance_le1("abc", "abcde") == 2
    assert edit_distance_le1("", "x") == 1
    assert edit_distance_le1("ab", "ba") == 2


def _brute_pairs(names: dict[int, str]) -> set[tuple[int, int, int]]:
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]
    out = set()
    for (ia, a), (ib, b) in itertools.combinations(sorted(names.items()), 2):
        d = lev(a, b)
        if d <= 1:
            out.add((ia, ib, d))
    return out


def test_blocking_lossless_vs_brute_force():
    """Random short strings over a tiny alphabet (dense collisions) —
    the deletion-neighborhood blocking must find EXACTLY the brute-force
    ed<=1 pair set, duplicates and all three edit kinds included."""
    from deepkg_ray.stages.editdist import editdist_pairs
    rng = random.Random(7)
    names = {i: "".join(rng.choice("ab") for _ in range(rng.randint(1, 5)))
             for i in range(80)}
    ds = rd.from_pandas(pd.DataFrame(
        {"id": list(names), "name": list(names.values())}))
    got = {(int(r["id_a"]), int(r["id_b"]), int(r["dist"]))
           for r in editdist_pairs(ds, n_buckets=8).to_pandas()
           .to_dict("records")}
    assert got == _brute_pairs(names)


def test_editdist_pairs_matches_duckdb_customers():
    from deepkg_ray.oracle import editdist_pairs_oracle
    from deepkg_ray.stages.editdist import editdist_pairs
    cust = rd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    got = (editdist_pairs(cust, id_col="c_custkey", name_col="c_name")
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM "
                f"read_parquet('{SF}/customer.parquet')")
    want = (con.execute(editdist_pairs_oracle()).fetchdf()
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_editdist_clusters_matches_duckdb_customers():
    from deepkg_ray.oracle import editdist_clusters_oracle
    from deepkg_ray.stages.editdist import editdist_clusters
    cust = rd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    got = (editdist_clusters(cust, id_col="c_custkey", name_col="c_name")
           .to_pandas().sort_values("node").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM "
                f"read_parquet('{SF}/customer.parquet')")
    want = (con.execute(editdist_clusters_oracle()).fetchdf()
            .sort_values("node").reset_index(drop=True))
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got[["node", "component"]],
        want[["node", "component"]].astype(np.int64), check_dtype=False)


def test_editdist_clusters_distributed_tier_agrees():
    from deepkg_ray.stages.editdist import editdist_clusters
    cust = rd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    a = (editdist_clusters(cust, id_col="c_custkey", name_col="c_name",
                           mode="driver").to_pandas()
         .sort_values("node").reset_index(drop=True))
    b = (editdist_clusters(cust, id_col="c_custkey", name_col="c_name",
                           mode="distributed").to_pandas()
         .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
