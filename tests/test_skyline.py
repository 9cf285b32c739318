"""skyline_2d (stages/skyline.py): kernel goldens, tie semantics, brute parity."""

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from deepkg_ray.stages.skyline import _local_skyline, skyline_2d


def brute(mn, mx):
    keep = []
    for i in range(len(mn)):
        dominated = any(
            mn[j] <= mn[i] and mx[j] >= mx[i]
            and (mn[j] < mn[i] or mx[j] > mx[i]) for j in range(len(mn)))
        if not dominated:
            keep.append(i)
    return sorted(keep)


def test_local_skyline_golden_and_ties():
    # (price, size): (1,5) dominates (2,5),(1,4); (3,9) survives; exact
    # duplicates (1,5) twice -> both survive (mutually non-dominating)
    mn = np.array([1, 2, 1, 3, 1], np.int64)
    mx = np.array([5, 5, 4, 9, 5], np.int64)
    assert sorted(_local_skyline(mn, mx).tolist()) == [0, 3, 4]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                min_size=1, max_size=40))
def test_local_skyline_matches_bruteforce(pts):
    mn = np.array([p[0] for p in pts], np.int64)
    mx = np.array([p[1] for p in pts], np.int64)
    assert sorted(_local_skyline(mn, mx).tolist()) == brute(mn, mx)


def test_skyline_2d_distributed_matches_bruteforce(sf_dir):
    part = pd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_retailprice", "p_size"])
    eng = (skyline_2d(rd.from_pandas(part).repartition(6), "p_partkey",
                      "p_retailprice", "p_size")
           .to_pandas().sort_values("p_partkey").reset_index(drop=True))
    mn = np.floor(part["p_retailprice"].to_numpy() * 1e6 + 0.5)
    mx = part["p_size"].to_numpy().astype(np.int64) * 10**6
    idx = brute(mn, mx)
    ref = part.iloc[idx].sort_values("p_partkey").reset_index(drop=True)
    assert eng["p_partkey"].tolist() == ref["p_partkey"].tolist()
    assert np.isclose(eng["p_retailprice"].to_numpy(),
                      ref["p_retailprice"].round(6).to_numpy()).all()
