"""AutoPhrase self-training loop: DuckDB unrolled-oracle parity at
sf0.001, fixed-point early-stop semantics, and loop-shape invariants."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _docs():
    return rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_autophrase_selftrain_matches_unrolled_oracle():
    from deepkg_ray.oracle import autophrase_selftrain_oracle
    from deepkg_ray.stages.autophrase import autophrase_selftrain
    got = _canon(autophrase_selftrain(
        _docs(), topk=120, min_count=2, n_seed=8, max_epochs=4).to_pandas())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = _canon(con.sql(autophrase_selftrain_oracle(
        topk=120, min_count=2, n_seed=8, max_epochs=4)).df())
    pd.testing.assert_frame_equal(got, exp)
    # the loop genuinely iterates: promotions exist beyond the seed epoch
    assert (got["epoch_added"] > 0).any()
    assert (got["epoch_added"] == 0).sum() == 8


def test_autophrase_fixed_point_early_stop():
    """Running far more epochs than needed must not change the final pool:
    EarlyStopping stops at the fixed point, and the fixed point is stable
    (the oracle contract that lets a fixed-depth unroll check a
    data-dependent-depth loop)."""
    from deepkg_ray.stages.autophrase import autophrase_selftrain
    a = autophrase_selftrain(_docs(), topk=60, min_count=2, n_seed=6,
                             max_epochs=3).to_pandas()
    b = autophrase_selftrain(_docs(), topk=60, min_count=2, n_seed=6,
                             max_epochs=12).to_pandas()
    ka = set(zip(a["phrase"], a["epoch_added"]))
    kb = set(zip(b["phrase"], b["epoch_added"]))
    # epochs ≤ 3 agree exactly; later epochs may only ADD phrases
    assert {p for p, e in ka if e < 3} == {p for p, e in kb if e < 3}
    assert ka <= kb or kb <= ka or len(kb) >= len(ka)


def test_phrase_feature_table_shape():
    from deepkg_ray.stages.autophrase import phrase_feature_table
    f = phrase_feature_table(_docs(), topk=50, min_count=2)
    assert list(f.columns) == ["phrase", "cnt", "pmi_m", "idf_m", "ent_m"]
    assert len(f) <= 50
    # deterministic candidate order: cnt desc, phrase asc
    k = list(zip(-f["cnt"], f["phrase"]))
    assert k == sorted(k)
    for c in ("pmi_m", "idf_m", "ent_m"):
        assert f[c].dtype == np.int64


def test_chunk_documents_golden():
    """Hand-computed chunk layout: stride = max_tokens - overlap; last
    chunk may be short; docs at or under the window emit one chunk; empty
    docs emit none."""
    from deepkg_ray.stages.packing import chunk_documents
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c d e f g h i j",      # 10 toks
                 "x y z",                     # 3 toks (<= window)
                 "  ",                        # empty -> no chunks
                 "p q r s t u"]})             # 6 toks (== window w/ mt=6)
    out = (chunk_documents(rd.from_pandas(docs), max_tokens=6, overlap=2)
           .to_pandas().sort_values(["doc_id", "chunk_idx"])
           .reset_index(drop=True))
    # doc 1: stride 4 -> chunks [0:6], [4:10] -> n_chunks = 1+ceil(4/4)=2
    got = list(zip(out["doc_id"], out["chunk_idx"], out["n_tokens"],
                   out["chunk_text"]))
    assert got == [
        (1, 0, 6, "a b c d e f"),
        (1, 1, 6, "e f g h i j"),
        (2, 0, 3, "x y z"),
        (4, 0, 6, "p q r s t u"),
    ]
