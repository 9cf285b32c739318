"""Synthesizer invariants that the SQL-oracle equivalence relies on."""

import glob
import os

import pyarrow.parquet as pq

from deepkg_ray import synth


def test_dictionary_deterministic_and_substring_free():
    d1 = synth.build_dictionary()
    d2 = synth.build_dictionary()
    assert [e.name for e in d1] == [e.name for e in d2]
    # ids dense in sorted-name order
    names = [e.name for e in d1]
    assert names == sorted(names)
    assert [e.entity_id for e in d1] == list(range(len(d1)))
    surfaces = [s for e in d1 for s in e.aliases]
    assert len(set(surfaces)) == len(surfaces)


def test_synth_idempotent_and_schema(synth_dir):
    files = sorted(glob.glob(os.path.join(synth_dir, "transcripts", "*.parquet")))
    assert files
    s = pq.read_schema(files[0])
    assert [s.field(i).name for i in range(len(s.names))] == \
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert str(s.field("turn_idx").type) == "int32"
    assert str(s.field("ts").type) == "timestamp[us]"
    # second call must be a no-op returning the same dir
    assert synth.ensure_synth("/root/testdata/sf0.001") == synth_dir


def test_turn_idx_dense_and_ts_monotone(synth_dir):
    t = pq.read_table(os.path.join(synth_dir, "transcripts"),
                      columns=["conv_id", "turn_idx", "ts"])
    df = t.to_pandas()
    for conv, g in df.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        assert list(g["turn_idx"]) == list(range(len(g)))
        assert g["ts"].is_monotonic_increasing


def test_gold_mentions_point_at_text(synth_dir):
    tr = pq.read_table(os.path.join(synth_dir, "transcripts")).to_pandas()
    gm = pq.read_table(os.path.join(synth_dir, "mentions_gold.parquet")).to_pandas()
    txt = {(c, t): x for c, t, x in zip(tr.conv_id, tr.turn_idx, tr.text)}
    sample = gm.sample(min(500, len(gm)), random_state=0)
    from deepkg_ray.functions.textnorm import normalize_text
    for r in sample.itertuples():
        raw = txt[(r.conv_id, r.turn_idx)]
        # inclusive end index, offsets valid in raw AND normalized text
        assert normalize_text(raw)[r.start_idx:r.end_idx + 1] == r.surface
