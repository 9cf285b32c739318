"""Hard-sigmoid logistic-regression quality classifier (stages/logreg.py):
integer-exact distributed training vs the unrolled DuckDB oracle, plus a
learnability floor on the distillation task."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)


def _docs_con():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return con


def test_tdiv_truncates_like_duckdb():
    from deepkg_ray.stages.logreg import _tdiv
    a = np.array([-7, 7, -8, 8, 0, -1], np.int64)
    got = _tdiv(a, 2)
    exp = [r[0] for r in duckdb.sql(
        "SELECT x // 2 FROM (VALUES (-7),(7),(-8),(8),(0),(-1)) t(x)"
    ).fetchall()]
    assert got.tolist() == exp == [-3, 3, -4, 4, 0, 0]


def test_lr_weights_match_duckdb(ray_session):
    from deepkg_ray.oracle import quality_lr_weights_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.logreg import lr_weight_table
    got = _canon(lr_weight_table(
        read_documents(SF, ["doc_id", "text"])).to_pandas())
    con = _docs_con()
    exp = _canon(con.sql(quality_lr_weights_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_lr_scores_match_duckdb(ray_session):
    from deepkg_ray.oracle import quality_lr_scores_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.logreg import lr_scores
    got = _canon(lr_scores(
        read_documents(SF, ["doc_id", "text"])).to_pandas())
    con = _docs_con()
    exp = _canon(con.sql(quality_lr_scores_oracle()).df())
    pd.testing.assert_frame_equal(got, exp)


def test_lr_training_learns_the_quality_rule(ray_session):
    """The distillation must actually work: train accuracy well above
    the majority-class baseline (0.516 pos rate at sf0.001) — the same
    kind of floor uie_trained asserts for its P/R."""
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.logreg import lr_accuracy
    out = lr_accuracy(read_documents(SF, ["doc_id", "text"])).to_pandas()
    assert out["n_docs"].item() > 0
    assert out["train_accuracy"].item() >= 0.85


def test_lr_holdout_matches_duckdb_and_generalizes(ray_session):
    from deepkg_ray.oracle import quality_lr_holdout_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.logreg import lr_holdout
    got = lr_holdout(read_documents(SF, ["doc_id", "text"])).to_pandas()
    con = _docs_con()
    exp = _canon(con.sql(quality_lr_holdout_oracle()).df())
    pd.testing.assert_frame_equal(_canon(got), exp)
    ho = got.set_index("split")
    # the distilled rule generalizes: held-out accuracy clears the
    # majority baseline by a wide margin
    assert ho.loc["holdout", "accuracy"] >= 0.75
    assert ho.loc["train", "n_docs"].item() \
        + ho.loc["holdout", "n_docs"].item() > 0


def test_lr_batch_order_invariance(ray_session):
    """Gradient sums are integer micros, so training is invariant to
    block layout — 1 block vs many blocks give identical weights."""
    import pyarrow.parquet as pq
    from deepkg_ray.stages.logreg import lr_features, lr_train
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    one = rd.from_arrow(t)
    many = rd.from_arrow(t).repartition(13)
    w1 = lr_train(lr_features(one).materialize(), n_iters=4)
    w2 = lr_train(lr_features(many).materialize(), n_iters=4)
    assert w1 == w2


def test_dsir_sample_matches_duckdb(ray_session):
    """Gumbel-top-k DSIR resample is hash-exact vs the SQL chain, and
    higher-score docs are overrepresented vs a uniform draw."""
    from deepkg_ray.oracle import dsir_sample_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import dsir_sample
    got = _canon(dsir_sample(
        read_documents(SF, ["doc_id", "text", "lang"]),
        m=50).to_pandas())
    con = _docs_con()
    exp = _canon(con.sql(dsir_sample_oracle(m=50)).df())
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) == 50
