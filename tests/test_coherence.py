"""Collective entity linking (stages/linking.coherence_link)."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        else:
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_coherence_link_matches_duckdb(ray_session):
    from deepkg_ray import synth
    from deepkg_ray.oracle import coherence_link_oracle
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.linking import coherence_link
    got = coherence_link(kg.mentions_dataset(SF),
                         kg.adjacency_dataset(SF),
                         synth.dictionary_path(SF)).to_pandas()
    con = duckdb.connect()
    exp = con.sql(coherence_link_oracle(SF)).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))
    # the rerank is a real signal on this corpus: winners carry positive
    # coherence weight somewhere, and both hit columns are populated
    assert got["coh_weight"].max() > 0
    assert got["bm25_hit"].sum() > 0 and got["coh_hit"].sum() > 0


def test_coherence_tiers_agree(ray_session):
    """Broadcast tier == fully-joined tier on the same corpus."""
    from deepkg_ray import synth
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.linking import coherence_link
    a = coherence_link(kg.mentions_dataset(SF),
                       kg.adjacency_dataset(SF),
                       synth.dictionary_path(SF)).to_pandas()
    b = coherence_link(kg.mentions_dataset(SF),
                       kg.adjacency_dataset(SF),
                       synth.dictionary_path(SF),
                       mode="join").to_pandas()
    pd.testing.assert_frame_equal(_canon(a), _canon(b))


def test_semantic_coherence_matches_duckdb(ray_session):
    from deepkg_ray import synth
    from deepkg_ray.oracle import semantic_coherence_oracle
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.linking import semantic_coherence_link
    got = semantic_coherence_link(
        kg.mentions_dataset(SF), f"{SF}/embeddings.parquet",
        synth.dictionary_path(SF)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    exp = con.sql(semantic_coherence_oracle(SF)).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))
    assert got["cos_micros"].abs().max() > 0


def test_fused_link_matches_duckdb_and_dominates(ray_session):
    from deepkg_ray import synth
    from deepkg_ray.oracle import fused_link_oracle
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.linking import fused_link
    got = fused_link(kg.mentions_dataset(SF),
                     kg.adjacency_dataset(SF),
                     f"{SF}/embeddings.parquet",
                     synth.dictionary_path(SF)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    exp = con.sql(fused_link_oracle(SF)).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))
    # the fused decision follows coherence when coherence is decisive:
    # rows where coh_top1 == sem_top1 must have final_id equal to it
    agree = got.loc[got["coh_top1"] == got["sem_top1"]]
    assert (agree["final_id"] == agree["coh_top1"]).all()


def test_coherence_beats_or_matches_bm25_on_ambiguous_surfaces(
        ray_session):
    """Where BM25's top-1 already equals gold, coherence should rarely
    break it (the context is built FROM gold co-mentions); report the
    two hit rates and require coherence not to collapse."""
    from deepkg_ray import synth
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.linking import coherence_link
    got = coherence_link(kg.mentions_dataset(SF),
                         kg.adjacency_dataset(SF),
                         synth.dictionary_path(SF)).to_pandas()
    bm25_rate = got["bm25_hit"].mean()
    coh_rate = got["coh_hit"].mean()
    assert coh_rate >= 0.5 * bm25_rate
