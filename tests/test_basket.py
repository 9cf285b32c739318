"""frequent_pairs (stages/basket.py): goldens, dedup, cap, brute parity."""

import numpy as np
import pandas as pd
import ray.data as rd

from deepkg_ray.stages.basket import _segment_pairs, frequent_pairs


def test_segment_pairs_vectorized():
    items = np.array([1, 2, 3, 7, 8], np.int64)   # segs [0,3) and [3,5)
    a, b = _segment_pairs(items, np.array([0, 3]), 5)
    pairs = sorted(zip(items[a].tolist(), items[b].tolist()))
    assert pairs == [(1, 2), (1, 3), (2, 3), (7, 8)]


def test_frequent_pairs_golden_dedup_and_support():
    # baskets: 1:{a,b,c}, 2:{a,b}, 3:{a,b(x2 dup),d}, 4:{c}
    df = pd.DataFrame({
        "bk": [1, 1, 1, 2, 2, 3, 3, 3, 3, 4],
        "it": [10, 20, 30, 10, 20, 10, 20, 20, 40, 30]})
    out = (frequent_pairs(rd.from_pandas(df), "bk", "it", min_support=2)
           .to_pandas().sort_values(["item_a", "item_b"])
           .reset_index(drop=True))
    # (10,20) appears in baskets 1,2,3 -> n=3 (dup of 20 in basket 3 deduped)
    assert out[["item_a", "item_b", "n"]].values.tolist() == [[10, 20, 3]]


def test_frequent_pairs_max_basket_cap():
    df = pd.DataFrame({"bk": [1] * 4, "it": [4, 3, 2, 1]})
    out = (frequent_pairs(rd.from_pandas(df), "bk", "it", min_support=1,
                          max_basket=2).to_pandas())
    # only the 2 smallest item ids survive the cap -> single pair (1,2)
    assert out[["item_a", "item_b", "n"]].values.tolist() == [[1, 2, 1]]


def test_frequent_pairs_matches_bruteforce(sf_dir):
    lt = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    eng = (frequent_pairs(rd.from_pandas(lt), "l_orderkey", "l_partkey",
                          min_support=2).to_pandas()
           .sort_values(["item_a", "item_b"]).reset_index(drop=True))
    b = lt.drop_duplicates()
    m = b.merge(b, on="l_orderkey")
    m = m[m["l_partkey_x"] < m["l_partkey_y"]]
    ref = (m.groupby(["l_partkey_x", "l_partkey_y"]).size()
           .reset_index(name="n"))
    ref = ref[ref["n"] >= 2].sort_values(["l_partkey_x", "l_partkey_y"]) \
        .reset_index(drop=True)
    assert len(eng) == len(ref)
    assert (eng["item_a"].to_numpy() == ref["l_partkey_x"].to_numpy()).all()
    assert (eng["item_b"].to_numpy() == ref["l_partkey_y"].to_numpy()).all()
    assert (eng["n"].to_numpy() == ref["n"].to_numpy()).all()
