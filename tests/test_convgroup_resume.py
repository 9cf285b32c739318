"""Salted conversation grouping + resumable partitioned KG build."""

import glob
import os
import shutil

import pyarrow.parquet as pq
import ray.data as rd

from deepkg_ray import synth
from deepkg_ray.pipelines import kg
from deepkg_ray.stages import convgroup


def test_salted_conv_stats_match_direct(sf_dir, synth_dir):
    ds = rd.read_parquet(os.path.join(synth_dir, "transcripts"),
                         columns=["conv_id", "turn_idx", "text"])
    out = convgroup.salted_conv_stats(ds, turns_per_salt=64).to_pandas()
    # direct (unsalted) reference computation
    df = pq.read_table(os.path.join(synth_dir, "transcripts"),
                       columns=["conv_id", "turn_idx", "text"]).to_pandas()
    direct = (df.assign(chars=df.text.str.len())
              .groupby("conv_id")
              .agg(n_chars=("chars", "sum"), n_turns=("turn_idx", "count")))
    merged = out.set_index("conv_id").join(direct, lsuffix="_salted")
    assert (merged["n_chars_salted"] == merged["n_chars"]).all()
    assert (merged["n_turns_salted"] == merged["n_turns"]).all()
    # hot conversations span multiple salt blocks (skew actually exercised)
    hot = out[out.conv_id.str.startswith("conv-hot")]
    assert (hot["n_salt_blocks"] > 1).all()


def test_conv_context_windows_cross_block(sf_dir, synth_dir):
    ds = rd.read_parquet(os.path.join(synth_dir, "transcripts"),
                         columns=["conv_id", "turn_idx", "text"])
    K = 64
    out = convgroup.conv_context_windows(ds, window=2,
                                         turns_per_salt=K).to_pandas()
    df = pq.read_table(os.path.join(synth_dir, "transcripts"),
                       columns=["conv_id", "turn_idx", "text"]).to_pandas()
    txt = {(c, t): x for c, t, x in zip(df.conv_id, df.turn_idx, df.text)}
    # verify context at a salt-block boundary of a hot conversation
    hot = out[(out.conv_id == "conv-hot-00") & (out.turn_idx == K)].iloc[0]
    expect = " | ".join([txt[("conv-hot-00", K - 2)], txt[("conv-hot-00", K - 1)]])
    assert hot["context"] == expect
    # first turn has empty context
    first = out[(out.conv_id == "conv-hot-00") & (out.turn_idx == 0)].iloc[0]
    assert first["context"] == ""
    assert len(out) == len(df)


def test_build_kg_resumable(sf_dir, synth_dir, tmp_path):
    out_dir = str(tmp_path / "kg")
    r1 = kg.build_kg_resumable(sf_dir, out_dir)
    n_parts = len(glob.glob(f"{synth.transcripts_path(sf_dir)}/*.parquet"))
    assert len(r1["counters"]) == n_parts
    adj1 = pq.read_table(glob.glob(f"{out_dir}/adjacency/*.parquet")[0] if False
                         else f"{out_dir}/adjacency").to_pandas()
    gold = pq.read_table(os.path.join(synth_dir, "triples_gold.parquet")).to_pandas()
    assert int(adj1["weight"].sum()) == len(gold)
    # resume: second run reprocesses nothing (manifest unchanged mtimes)
    manifest = f"{out_dir}/linked/_manifest.json"
    mtime = os.path.getmtime(manifest)
    part_dir = sorted(glob.glob(f"{out_dir}/linked/part=*"))[0]
    pmtime = os.path.getmtime(part_dir)
    r2 = kg.build_kg_resumable(sf_dir, out_dir)
    assert os.path.getmtime(part_dir) == pmtime     # partition untouched
    assert r2["counters"] == r1["counters"]
    # crash-resume: wipe one partition + its manifest entry → only it reruns
    import json
    with open(manifest) as f:
        m = json.load(f)
    victim = sorted(m["partitions"])[0]
    del m["partitions"][victim]
    with open(manifest, "w") as f:
        json.dump(m, f)
    shutil.rmtree(f"{out_dir}/linked/part={victim}")
    r3 = kg.build_kg_resumable(sf_dir, out_dir)
    adj3 = pq.read_table(f"{out_dir}/adjacency").to_pandas()
    assert int(adj3["weight"].sum()) == len(gold)   # byte-stable re-output
    # metrics/lineage table exists with one row per partition
    mt = pq.read_table(f"{out_dir}/metrics.parquet").to_pandas()
    assert len(mt) == n_parts and (mt["rows_out"] > 0).all()


def test_build_kg_resumable_partition_controls(sf_dir, synth_dir, tmp_path):
    """target_partitions (file grouping) and salt (conv-hash sub-units —
    the hot-conversation skew control) must produce the SAME adjacency as
    the default 1-file-1-unit build, with the expected unit count."""
    base_dir = str(tmp_path / "base")
    ctrl_dir = str(tmp_path / "ctrl")
    kg.build_kg_resumable(sf_dir, base_dir)
    r = kg.build_kg_resumable(sf_dir, ctrl_dir, target_partitions=2, salt=3)
    n_files = len(glob.glob(f"{synth.transcripts_path(sf_dir)}/*.parquet"))
    assert len(r["counters"]) == min(2, n_files) * 3
    cols = ["subj_id", "pred", "obj_id", "weight", "src"]
    a = (pq.read_table(f"{base_dir}/adjacency").to_pandas()[cols]
         .sort_values(cols[:3]).reset_index(drop=True))
    b = (pq.read_table(f"{ctrl_dir}/adjacency").to_pandas()[cols]
         .sort_values(cols[:3]).reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)


def test_turn_latency_golden(ray_session):
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.convgroup import turn_latency
    ts0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # conv A: u(0s) -> a(1s) -> u(4s); conv B: a(0s) -> a(10s)
    for conv, seq in [("A", [("user", 0), ("asst", 1), ("user", 4)]),
                      ("B", [("asst", 0), ("asst", 10)])]:
        for i, (role, sec) in enumerate(seq):
            rows.append({"conv_id": conv, "turn_idx": i, "role": role,
                         "ts": ts0 + pd.Timedelta(seconds=sec)})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = (turn_latency(ds).to_pandas()
           .set_index(["from_role", "to_role"]).sort_index())
    assert out.loc[("user", "asst"), "total_us"] == 1_000_000
    assert out.loc[("asst", "user"), "total_us"] == 3_000_000
    assert out.loc[("asst", "asst"), "total_us"] == 10_000_000
    assert out.loc[("user", "asst"), "n"] == 1
    assert out.loc[("asst", "asst"), "avg_us"] == 10_000_000


def test_tool_usage_golden(ray_session):
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.convgroup import tool_usage
    df = pd.DataFrame({
        "conv_id": ["a", "a", "a", "b", "b"],
        "role": ["asst", "asst", "user", "asst", "asst"],
        "tool": ["search", "", "calc", "search", "search"],
    })
    out = (tool_usage(rd.from_pandas(df)).to_pandas()
           .set_index(["role", "tool"]).sort_index())
    assert out.loc[("asst", "search"), "n_turns"] == 3
    assert out.loc[("asst", "search"), "n_convs"] == 2
    assert out.loc[("user", "calc"), "n_turns"] == 1
    assert ("asst", "") not in out.index


def test_conv_transcripts_ordered_collect(ray_session):
    import pandas as pd
    df = pd.DataFrame({
        "conv_id": ["c2", "c1", "c1", "c1"],
        "turn_idx": [0, 2, 0, 1],
        "text": ["solo", "three", "one", "two"]})
    out = (convgroup.conv_transcripts(rd.from_pandas(df)).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    assert out["conv_id"].tolist() == ["c1", "c2"]
    assert out["n_turns"].tolist() == [3, 1]
    assert out["transcript"].tolist() == ["one\ntwo\nthree", "solo"]


def test_conv_turn_taking_golden(ray_session):
    """Perfect alternation -> 1.0; monologue -> 0.0; single-turn conv
    excluded; mixed conv = 1 alternation of 3 adjacencies."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.convgroup import conv_turn_taking
    rows = [
        ("c1", 0, "user"), ("c1", 1, "assistant"), ("c1", 2, "user"),
        ("c2", 0, "user"), ("c2", 1, "user"),
        ("c3", 0, "user"),
        ("c4", 0, "user"), ("c4", 1, "user"), ("c4", 2, "assistant"),
        ("c4", 3, "assistant"),
    ]
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
        "role": pa.array([r[2] for r in rows])})
    out = (conv_turn_taking(rd.from_arrow(t)).to_pandas()
           .set_index("conv_id"))
    assert "c3" not in out.index
    assert out.loc["c1", "alt_rate"] == 1.0 and out.loc["c1", "n_alt"] == 2
    assert out.loc["c2", "alt_rate"] == 0.0
    assert out.loc["c4", "n_turns"] == 4 and out.loc["c4", "n_alt"] == 1
    assert abs(out.loc["c4", "alt_rate"] - 1 / 3) < 1e-6


def test_context_budget_report_golden(ray_session):
    """Conv a: 3 tokens (fits a 4-token limit); conv b: 6 tokens
    (overflows by 2)."""
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.convgroup import context_budget_report
    t = pa.table({
        "conv_id": pa.array(["a", "a", "b", "b"]),
        "text": pa.array(["one two", "three", "a b c", "d e f"])})
    out = context_budget_report(rd.from_arrow(t), limit=4).to_pandas()
    assert out["n_convs"].iloc[0] == 2
    assert out["n_fit"].iloc[0] == 1
    assert out["n_trunc"].iloc[0] == 1
    assert out["fit_share"].iloc[0] == 0.5
    assert out["total_tokens"].iloc[0] == 9
    assert out["overflow_tokens"].iloc[0] == 2
