"""BPE merge tier (stages/bpe.py): learning vs hand-derivable merges,
greedy apply vs exhaustive recomputation, cache-stage equivalence."""

import numpy as np
import pyarrow as pa

from deepkg_ray.stages.bpe import (BpeCounter, bpe_segment,
                                   corpus_word_freqs, learn_bpe,
                                   pretokenize)


def test_learn_bpe_golden():
    # "aaab" ×3: pairs (a,a)=6, (a,b)=3 → first merge ('a','a');
    # then symbols [aa, a, b]: pairs (aa,a)=3, (a,b)=3 → tie broken
    # lexicographically: ('a','b') < ('aa','a')
    merges = learn_bpe({"aaab": 3}, 2)
    assert merges == [("a", "a"), ("a", "b")]


def test_segment_applies_lowest_rank_first():
    ranks = {("a", "b"): 0, ("b", "c"): 1, ("ab", "c"): 2}
    assert bpe_segment("abc", ranks) == ["abc"]       # ab then ab+c
    assert bpe_segment("bc", ranks) == ["bc"]
    assert bpe_segment("cab", ranks) == ["c", "ab"]
    assert bpe_segment("xyz", ranks) == ["x", "y", "z"]


def apply_reference(word, merges):
    """Alternative formulation: replay the merge list IN LEARNING ORDER
    (Sennrich's apply).  For merge tables learned by learn_bpe the result
    token count equals the greedy lowest-rank loop — cross-validates
    bpe_segment."""
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_segment_matches_replay_on_learned_tables():
    rng = np.random.default_rng(5)
    alpha = "abcd"
    for trial in range(30):
        words = ["".join(rng.choice(list(alpha),
                                    size=rng.integers(1, 8)))
                 for _ in range(30)]
        freqs = corpus_word_freqs([" ".join(words)])
        merges = learn_bpe(freqs, 12)
        ranks = {m: i for i, m in enumerate(merges)}
        for w in freqs:
            assert bpe_segment(w, ranks) == apply_reference(w, merges), \
                (w, merges)


def test_counter_stage_and_cache():
    merges = learn_bpe({"hello": 5, " world": 5}, 6)
    c = BpeCounter(merges)
    batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["hello world", ""], pa.string())})
    out = c(batch)
    ranks = {m: i for i, m in enumerate(merges)}
    want = sum(len(bpe_segment(w, ranks))
               for w in pretokenize("hello world"))
    assert out["n_merge_tokens"].to_pylist() == [want, 0]
    assert "hello" in c.cache and " world" in c.cache


def test_token_count_decreases_with_merges():
    freqs = corpus_word_freqs(["the cat sat on the mat " * 3])
    m0 = learn_bpe(freqs, 0)
    m20 = learn_bpe(freqs, 20)
    r0 = {m: i for i, m in enumerate(m0)}
    r20 = {m: i for i, m in enumerate(m20)}
    n0 = sum(len(bpe_segment(w, r0)) * f for w, f in freqs.items())
    n20 = sum(len(bpe_segment(w, r20)) * f for w, f in freqs.items())
    assert n20 < n0


def test_pack_conversations_matches_duckdb_and_never_splits(sf_dir,
                                                            ray_session):
    import duckdb
    import ray.data as rd

    from deepkg_ray import synth
    from deepkg_ray.oracle import pack_conversations_oracle
    from deepkg_ray.stages.packing import pack_conversations
    ds = rd.read_parquet(synth.transcripts_path(sf_dir),
                         columns=["conv_id", "text"])
    got = (pack_conversations(ds, window=512).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    con = duckdb.connect()
    want = (con.sql(pack_conversations_oracle(sf_dir, window=512)).df()
            .sort_values("conv_id").reset_index(drop=True))
    for c in ["conv_id", "n_tokens", "token_start", "pack_id"]:
        assert got[c].tolist() == want[c].tolist(), c
    # invariant: one pack per conversation (whole-conv assignment) and
    # pack ids are non-decreasing in conv order with no gaps beyond
    # what oversized conversations create
    assert got["conv_id"].is_unique
    assert (np.diff(got.sort_values("token_start")["pack_id"]
                    .to_numpy(np.int64)) >= 0).all()


def test_conv_packing_stats_matches_duckdb(sf_dir, ray_session):
    import duckdb
    import ray.data as rd

    from deepkg_ray import synth
    from deepkg_ray.oracle import conv_packing_stats_oracle
    from deepkg_ray.stages.packing import conv_packing_stats
    ds = rd.read_parquet(synth.transcripts_path(sf_dir),
                         columns=["conv_id", "text"])
    got = conv_packing_stats(ds, window=512).to_pandas()
    con = duckdb.connect()
    want = con.sql(conv_packing_stats_oracle(sf_dir, window=512)).df()
    for c in sorted(got.columns):
        assert got[c].iloc[0] == want[c].iloc[0], c
    assert 0.0 < got["mean_fill"].iloc[0]
