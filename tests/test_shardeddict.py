"""Tier-agreement tests for the sharded dictionary tiers (SURVEY §7.5):
sharded mention detection and sharded BM25 must be row-identical to the
broadcast tiers on the same inputs."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (df.sort_values(list(df.columns), kind="stable")
            .reset_index(drop=True))


@pytest.fixture(scope="module")
def norm_transcripts(sf_dir):
    from deepkg_ray.pipelines.kg import transcripts_with_norm
    return transcripts_with_norm(sf_dir)


@pytest.fixture(scope="module")
def dict_path(sf_dir):
    from deepkg_ray import synth
    return synth.dictionary_path(sf_dir)


def test_sharded_mentions_match_broadcast(norm_transcripts, dict_path):
    from deepkg_ray.stages.mention import detect_mentions
    from deepkg_ray.stages.shardeddict import detect_mentions_sharded
    base = _canon(detect_mentions(norm_transcripts, dict_path).to_pandas())
    shard = _canon(detect_mentions_sharded(
        norm_transcripts, dict_path, n_shards=4).to_pandas())
    assert len(base) > 0
    pd.testing.assert_frame_equal(base, shard)


def test_detect_mentions_gate_routes_to_sharded(norm_transcripts, dict_path):
    """broadcast_threshold below the dictionary size must route through
    the sharded tier and still produce identical mentions."""
    from deepkg_ray.stages import mention
    from deepkg_ray.stages.shardeddict import dictionary_surface_count
    n = dictionary_surface_count(dict_path)
    assert n > 1
    base = _canon(mention.detect_mentions(
        norm_transcripts, dict_path).to_pandas())
    mention._SURFACE_COUNT_CACHE.pop(dict_path, None)
    gated = _canon(mention.detect_mentions(
        norm_transcripts, dict_path,
        broadcast_threshold=max(1, n // 3)).to_pandas())
    pd.testing.assert_frame_equal(base, gated)


def test_sharded_overlapping_surfaces_cross_shards(tmp_path):
    """Surfaces engineered to overlap ('ab' inside 'abc', adjacent 'cd')
    must resolve to the SAME greedy winners whatever shard they land in —
    the candidate lookahead + greedy replay contract."""
    from deepkg_ray.stages.mention import detect_mentions
    from deepkg_ray.stages.shardeddict import detect_mentions_sharded
    path = os.path.join(tmp_path, "dict.parquet")
    pq.write_table(pa.table({
        "entity_id": pa.array([1, 2, 3, 4], pa.int64()),
        "name": pa.array(["abc", "ab", "cd", "bcd"], pa.string()),
        "type": pa.array(["T1", "T2", "T3", "T4"], pa.string()),
        "aliases": pa.array([["abc"], ["ab"], ["cd"], ["bcd"]],
                            pa.list_(pa.string()))}), path)
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array(["c0", "c0", "c1"], pa.string()),
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "text_norm": pa.array(["xabcdy", "ababcd", "bcdcdab"],
                              pa.string())}))
    base = _canon(detect_mentions(ds, path).to_pandas())
    assert len(base) > 0
    for n_shards in (2, 3, 4):
        shard = _canon(detect_mentions_sharded(
            ds, path, n_shards=n_shards).to_pandas())
        pd.testing.assert_frame_equal(base, shard)


def test_sharded_bm25_matches_broadcast(dict_path):
    from deepkg_ray.stages.linking import CandidateGenerator
    from deepkg_ray.stages.shardeddict import bm25_candidates_sharded
    aliases = pq.read_table(dict_path, columns=["aliases"]).to_pandas()
    surf = sorted({a for al in aliases["aliases"] for a in al})[:200]
    qds = rd.from_arrow(pa.table({"surface": pa.array(surf, pa.string())}))
    base = _canon(qds.map_batches(
        CandidateGenerator,
        fn_constructor_kwargs={"dictionary_path": dict_path, "top_n": 5,
                               "exact": True},
        batch_format="pyarrow", concurrency=(1, 2)).to_pandas())
    base["rank"] = base["rank"].astype(np.int32)
    for n_shards in (2, 3):
        shard = _canon(bm25_candidates_sharded(
            qds, dict_path, n_shards=n_shards, top_n=5).to_pandas())
        pd.testing.assert_frame_equal(base, shard)


def test_greedy_resolve_property_random_dicts():
    """Property: for RANDOM dictionaries and texts, merging per-shard
    lookahead candidates through _resolve_greedy reproduces the
    full-dictionary longest-first finditer scan — the core semantic
    contract, tested without Ray on the bare kernels."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from deepkg_ray.functions.hashing import stable_hash64_batch
    from deepkg_ray.stages.shardeddict import _resolve_greedy

    alphabet = "abc"
    surf = st.text(alphabet, min_size=1, max_size=4)

    @settings(max_examples=60, deadline=None)
    @given(st.sets(surf, min_size=1, max_size=8),
           st.text(alphabet, min_size=0, max_size=30),
           st.integers(min_value=2, max_value=4))
    def check(surfaces, text, n_shards):
        surfaces = sorted(surfaces)
        # broadcast scan: longest-first alternation, non-overlapping
        rx = re.compile("|".join(
            re.escape(s) for s in sorted(surfaces, key=len, reverse=True)))
        want = [(m.start(), m.end() - 1, m.group(0))
                for m in rx.finditer(text)]
        # per-shard lookahead candidates
        h = stable_hash64_batch(surfaces) % np.uint64(n_shards)
        rows = []
        for r in range(n_shards):
            shard = [s for s, hh in zip(surfaces, h)
                     if hh == np.uint64(r)]
            if not shard:
                continue
            srx = re.compile("(?=(" + "|".join(
                re.escape(s) for s in sorted(shard, key=len,
                                             reverse=True)) + "))")
            for m in srx.finditer(text):
                s = m.group(1)
                rows.append(("c", 0, m.start(), m.start() + len(s),
                             s, 1, "T"))
        cand = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "start",
                                           "end", "surface", "entity_id",
                                           "type"])
        got = _resolve_greedy(cand)
        assert (list(zip(got["start_idx"], got["end_idx"],
                         got["surface"])) == want)

    check()


def test_generate_candidates_gate_routes_to_sharded(dict_path):
    """broadcast_threshold below the name count must route
    generate_candidates through the sharded index and still match the
    broadcast tier row-for-row (ranks recomputed identically)."""
    from deepkg_ray.stages.linking import generate_candidates
    aliases = pq.read_table(dict_path, columns=["aliases"]).to_pandas()
    surf = sorted({a for al in aliases["aliases"] for a in al})[:120]
    qds = rd.from_arrow(pa.table({"surface": pa.array(surf, pa.string())}))
    base = _canon(generate_candidates(qds, dict_path, top_n=5).to_pandas())
    base["rank"] = base["rank"].astype(np.int32)
    gated = _canon(generate_candidates(qds, dict_path, top_n=5,
                                       broadcast_threshold=10).to_pandas())
    pd.testing.assert_frame_equal(base, gated)


def test_detect_mentions_multi_delta_matches_full(norm_transcripts,
                                                  dict_path, tmp_path):
    """Dictionary-delta ingest: per-file candidate passes + global
    resolve over a base/delta split of the dictionary must equal
    detect_mentions over the FULL dictionary; the candidate cache must
    reproduce the same result on a second call (base scan skipped)."""
    from deepkg_ray.stages.mention import detect_mentions
    from deepkg_ray.stages.shardeddict import detect_mentions_multi
    t = pq.read_table(dict_path)
    eid = np.asarray(t["entity_id"].to_pylist(), np.int64)
    base_p = os.path.join(tmp_path, "base.parquet")
    delta_p = os.path.join(tmp_path, "delta.parquet")
    pq.write_table(t.filter(pa.array(eid % 2 == 0)), base_p)
    pq.write_table(t.filter(pa.array(eid % 2 == 1)), delta_p)
    full = _canon(detect_mentions(norm_transcripts, dict_path).to_pandas())
    multi = _canon(detect_mentions_multi(
        norm_transcripts, [base_p, delta_p]).to_pandas())
    pd.testing.assert_frame_equal(full, multi)
    cache = os.path.join(tmp_path, "cand_cache")
    first = _canon(detect_mentions_multi(
        norm_transcripts, [base_p, delta_p],
        candidate_cache_dir=cache).to_pandas())
    again = _canon(detect_mentions_multi(
        norm_transcripts, [base_p, delta_p],
        candidate_cache_dir=cache).to_pandas())
    pd.testing.assert_frame_equal(full, first)
    pd.testing.assert_frame_equal(full, again)


def test_bm25_global_stats_match_index(dict_path):
    """The streamed global stats equal BM25Index's own exact arrays."""
    from deepkg_ray.stages.linking import BM25Index
    from deepkg_ray.stages.shardeddict import bm25_global_stats
    names = pq.read_table(dict_path, columns=["name"])["name"].to_pylist()
    idx = BM25Index(names)
    _, idf64, denom64 = idx._exact_arrays()
    stats = bm25_global_stats(dict_path)
    assert stats["n_docs"] == len(names)
    for term, j in idx.vocab.items():
        assert stats["idf"][term] == idf64[j]
    dl = idx.tf.astype(np.float64).sum(axis=1)
    np.testing.assert_allclose(
        idx.k1 * (1.0 - idx.b + idx.b * dl / stats["avgdl"]), denom64,
        rtol=0, atol=0)
