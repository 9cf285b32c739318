"""Luby maximal independent set (graph.maximal_independent_set)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _rand_edges(n=60, m=150, seed=4):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n, size=m).astype(np.int64)
    v = rng.integers(0, n, size=m).astype(np.int64)
    return pd.DataFrame({"subj_id": u, "obj_id": v})


def _greedy_mis(df: pd.DataFrame) -> dict[int, int]:
    """Sequential greedy MIS in hash-priority order — the ground truth the
    distributed rounds must equal."""
    from deepkg_ray.stages.graph import _mis_priority
    e = df[df.subj_id != df.obj_id]
    nodes = np.unique(np.concatenate([e.subj_id, e.obj_id]))
    pr = _mis_priority(nodes)
    adj: dict[int, set[int]] = {int(n): set() for n in nodes}
    for a, b in zip(e.subj_id, e.obj_id):
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))
    st = {int(n): 0 for n in nodes}
    for n in (nodes[np.argsort(pr)]):
        n = int(n)
        if st[n] == 0:
            st[n] = 1
            for w in adj[n]:
                if st[w] == 0:
                    st[w] = 2
    return {n: (1 if s == 1 else 0) for n, s in st.items()}


def test_mis_broadcast_equals_sequential_greedy():
    from deepkg_ray.stages.graph import maximal_independent_set
    df = _rand_edges()
    got = (maximal_independent_set(rd.from_pandas(df)).to_pandas()
           .set_index("node")["in_mis"].to_dict())
    assert got == _greedy_mis(df)
    # independence + maximality directly
    e = df[df.subj_id != df.obj_id]
    assert not any(got[int(a)] == 1 and got[int(b)] == 1
                   for a, b in zip(e.subj_id, e.obj_id))
    adj: dict[int, list[int]] = {}
    for a, b in zip(e.subj_id, e.obj_id):
        adj.setdefault(int(a), []).append(int(b))
        adj.setdefault(int(b), []).append(int(a))
    for n, flag in got.items():
        if flag == 0:
            assert any(got[w] == 1 for w in adj[n])


def test_mis_join_tier_agrees():
    from deepkg_ray.stages.graph import maximal_independent_set
    df = _rand_edges(n=40, m=90, seed=7)
    a = (maximal_independent_set(rd.from_pandas(df), mode="broadcast")
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (maximal_independent_set(rd.from_pandas(df), mode="join")
         .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_mis_raises_when_rounds_exhausted():
    from deepkg_ray.stages.graph import maximal_independent_set
    df = _rand_edges(n=80, m=300, seed=2)
    with pytest.raises(ValueError, match="undecided"):
        maximal_independent_set(rd.from_pandas(df), max_rounds=1)
