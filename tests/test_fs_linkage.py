"""Fellegi–Sunter record-linkage weights + scores (stages/editdist.py)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data as rd


def _cust():
    # three near-dup name clusters + distinct rows; attributes agree
    # inside cluster 1, disagree inside cluster 2
    rows = [
        (1, "acme corp", 3, "AUTO", 1500.0),
        (2, "acme orp", 3, "AUTO", 1700.0),     # ed 1 to #1, agrees a lot
        (3, "beta llc", 7, "STEEL", 200.0),
        (4, "beta lc", 9, "HOUSE", 9500.0),     # ed 1 to #3, disagrees
        (5, "gamma inc", 3, "AUTO", 1600.0),
        (6, "delta gmbh", 11, "STEEL", -400.0),
    ]
    return rd.from_pandas(pd.DataFrame(
        rows, columns=["c_custkey", "c_name", "c_nationkey",
                       "c_mktsegment", "c_acctbal"]))


def test_fs_weights_hand_computed():
    from deepkg_ray.stages.editdist import fs_weight_table
    w = fs_weight_table(_cust()).set_index("feature")
    # match set: (1,2) and (3,4); agreements: nation 1/2, segment 1/2,
    # band 1/2 (1500//1000 == 1700//1000; 200//1000 != 9500//1000)
    n, npairs = 6, 2
    d = n * (n - 1)
    # marginals Σc(c-1): nation {3:3,7:1,9:1,11:1} → 6;
    # segment {AUTO:3,STEEL:2,HOUSE:1} → 8; band {1:3,0:1,9:1,-1:1} → 6
    for feat, s_u, a_m in (("nation", 6, 1), ("segment", 8, 1),
                           ("band", 6, 1)):
        m = (a_m + 0.5) / (npairs + 1)
        u = (s_u + 0.5) / (d + 1)
        assert w.loc[feat, "m_prob"] == m
        assert w.loc[feat, "u_prob"] == u
        assert w.loc[feat, "w_agree_micros"] == \
            math.floor(math.log(m / u) * 1e6 + 0.5)
        assert w.loc[feat, "w_disagree_micros"] == \
            math.floor(math.log((1 - m) / (1 - u)) * 1e6 + 0.5)


def test_fs_scores_rank_agreeing_pair_higher():
    from deepkg_ray.stages.editdist import fs_match_scores
    got = (fs_match_scores(_cust()).to_pandas()
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert len(got) == 2
    by_pair = got.set_index(["id_a", "id_b"])
    # (1,2) agrees on all three features, (3,4) on none
    assert tuple(by_pair.loc[(1, 2),
                             ["agree_nation", "agree_segment",
                              "agree_band"]]) == (1, 1, 1)
    assert tuple(by_pair.loc[(3, 4),
                             ["agree_nation", "agree_segment",
                              "agree_band"]]) == (0, 0, 0)
    assert by_pair.loc[(1, 2), "score_micros"] > \
        by_pair.loc[(3, 4), "score_micros"]
    assert (got["score"] == got["score_micros"] / 1e6).all()


def test_er_canonical_survivorship():
    from deepkg_ray.stages.editdist import er_canonical
    rows = [
        (1, "acme corp", 3, "AUTO"),
        (2, "acme orp", 3, "AUTO"),
        (3, "acme cor", 5, "STEEL"),     # cluster {1,2,3}: nation mode 3
        (7, "beta llc", 7, "HOUSE"),
        (8, "beta lc", 9, "HOUSE"),      # cluster {7,8}: nation tie -> 7
        (9, "solo name", 11, "AUTO"),    # singleton: absent
    ]
    ds = rd.from_pandas(pd.DataFrame(
        rows, columns=["c_custkey", "c_name", "c_nationkey",
                       "c_mktsegment"]))
    got = (er_canonical(ds).to_pandas()
           .set_index("component").sort_index())
    assert list(got.index) == [1, 7]
    assert got.loc[1, "n_members"] == 3
    assert got.loc[1, "canonical_nation"] == 3
    assert got.loc[1, "canonical_segment"] == "AUTO"
    # name mode: all distinct -> lexicographically smallest
    assert got.loc[1, "canonical_name"] == "acme cor"
    assert got.loc[7, "n_members"] == 2
    assert got.loc[7, "canonical_nation"] == 7      # tie -> smallest
    assert got.loc[7, "canonical_segment"] == "HOUSE"
