"""Tests for the .ck corpus reader and the SNLI triplet builder."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_read_ck_corpus_matches_gold(sf_dir):
    from deepkg_ray import synth
    from deepkg_ray.sources.readers import read_ck_corpus

    ck, gold = synth.ck_paths(sf_dir)
    parsed = (read_ck_corpus(ck).to_pandas()
              .sort_values(["sent_idx", "token_idx"]).reset_index(drop=True))
    expect = (pq.read_table(gold).to_pandas()
              .sort_values(["sent_idx", "token_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(parsed[expect.columns], expect)
    assert parsed["doc_idx"].nunique() > 1          # -DOCSTART- splits seen
    assert set(parsed["boundary"]) == {"I", "O"}


def test_read_ck_three_column_and_structure(tmp_path):
    from deepkg_ray.sources.readers import read_ck_corpus

    p = tmp_path / "tiny.ck"
    p.write_text(
        "-DOCSTART-\n"
        "foo I None\n"            # 3-column line → implicitly safe
        "bar O ORG D\n"
        "\n"
        "baz I LOC S\n"
        "\n"
        "-DOCSTART-\n"
        "qux I None S\n"
        "\n")
    df = (read_ck_corpus(str(p)).to_pandas()
          .sort_values(["sent_idx", "token_idx"]).reset_index(drop=True))
    assert df["token"].tolist() == ["foo", "bar", "baz", "qux"]
    assert df["doc_idx"].tolist() == [0, 0, 0, 1]
    assert df["sent_idx"].tolist() == [0, 0, 1, 2]
    assert df["token_idx"].tolist() == [0, 1, 0, 0]
    assert df["safe"].tolist() == [1, 0, 1, 1]      # 3-col line is safe


def test_snli_triplets_last_wins_and_filtering():
    import ray.data as rd
    from deepkg_ray.stages.snli import snli_triplets

    t = pa.table({
        "row_idx": pa.array(range(7), pa.int64()),
        "sentence1": ["p1", "p1", "p1", "p2", "p2", "p3", "p1"],
        "sentence2": ["e1", "c1", "x1", "e2", "x2", "c3", "e1b"],
        "gold_label": ["entailment", "contradiction", "neutral",
                       "entailment", "neutral", "contradiction",
                       "entailment"],
    })
    out = (snli_triplets(rd.from_arrow(t)).to_pandas()
           .sort_values("origin").reset_index(drop=True))
    # p1: both labels, entailment overwritten by the later row (last wins);
    # p2 lacks contradiction, p3 lacks entailment → filtered out
    assert out["origin"].tolist() == ["p1"]
    assert out["entailment"].tolist() == ["e1b"]
    assert out["contradiction"].tolist() == ["c1"]


def test_snli_triplets_matches_duckdb_oracle(sf_dir):
    import duckdb
    import ray.data as rd
    from deepkg_ray import oracle, synth
    from deepkg_ray.stages.snli import snli_triplets

    eng = (snli_triplets(rd.read_parquet(synth.snli_path(sf_dir)))
           .to_pandas().sort_values("origin").reset_index(drop=True))
    ora = (duckdb.sql(oracle.snli_triplets_oracle(sf_dir)).df()
           .sort_values("origin").reset_index(drop=True))
    pd.testing.assert_frame_equal(eng[ora.columns], ora)
    assert len(eng) > 50
