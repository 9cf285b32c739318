"""length_bucketing (packing) + rendezvous shard_plan (curation)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def test_length_bucketing_golden():
    from deepkg_ray.stages.packing import length_bucketing
    texts = ["one", "a b", "a b c", "a b c d", " ".join(["w"] * 17), ""]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64), "text": texts}))
    got = (length_bucketing(ds).to_pandas()
           .set_index("bucket").sort_index())
    # token counts: 1,2,3,4,17,0 → buckets 1,2,4,4,32,1
    assert got.loc[1, "n_docs"] == 2 and got.loc[1, "total_tokens"] == 1
    assert got.loc[2, "n_docs"] == 1 and got.loc[2, "total_padding"] == 0
    assert got.loc[4, "n_docs"] == 2 and got.loc[4, "total_tokens"] == 7
    assert got.loc[4, "total_padding"] == 1
    assert got.loc[32, "total_padding"] == 15
    assert got.loc[4, "fill"] == 0.875
    # padding + tokens == capacity everywhere
    cap = got.index.to_numpy() * got["n_docs"].to_numpy()
    assert (got["total_tokens"].to_numpy()
            + got["total_padding"].to_numpy() == cap).all()


def test_shard_plan_hrw_stability():
    from deepkg_ray.stages.curation import shard_plan
    n, s = 3000, 8
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64)}))
    got = (shard_plan(ds, n_shards=s).to_pandas()
           .set_index("shard").sort_index())
    assert got["n_docs"].sum() == n
    # balanced within ~5 sigma of n/s
    exp = n / s
    assert (np.abs(got["n_docs"] - exp)
            < 5 * np.sqrt(exp * (1 - 1 / s))).all()
    # HRW minimal disruption: surviving shards keep every doc,
    # the dropped shard keeps none
    for shard in range(s - 1):
        assert got.loc[shard, "n_stable"] == got.loc[shard, "n_docs"]
    assert got.loc[s - 1, "n_stable"] == 0


def test_doc_dup_fraction_golden():
    from deepkg_ray.stages.dedup import doc_dup_fraction
    rep = "alpha beta gamma delta eps"
    texts = [
        f"{rep} one two three",          # 5-token dup span at 0..5
        f"zero {rep} tail",              # same span shifted
        "totally unique words here only there",
        "",
    ]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64), "text": texts}))
    got = (doc_dup_fraction(ds, w=5).to_pandas()
           .set_index("doc_id").sort_index())
    assert got.loc[0, "n_tokens"] == 8 and got.loc[0, "dup_tokens"] == 5
    assert got.loc[0, "dup_fraction"] == 0.625
    assert got.loc[1, "dup_tokens"] == 5
    assert got.loc[2, "dup_tokens"] == 0
    assert got.loc[2, "dup_fraction"] == 0.0
    assert got.loc[3, "n_tokens"] == 0 and got.loc[3, "dup_fraction"] == 0.0


def test_cdc_chunk_stats_properties():
    from deepkg_ray.stages.dedup import cdc_chunk_stats
    seg = "the quick brown fox jumps over the lazy dog again and again"
    texts = [seg + " one", seg + " two", "short", ""]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64), "text": texts}))
    got = cdc_chunk_stats(ds).to_pandas().iloc[0]
    # empty doc excluded; every char lands in exactly one chunk
    assert got["n_docs"] == 3
    assert got["total_chars"] == sum(len(t) for t in texts)
    assert got["distinct_chunks"] <= got["total_chunks"]
    # the shared prefix makes the two long docs share their leading
    # chunks → dedup finds duplicates
    assert got["dup_ratio"] > 0.0
    # boundary stability: appending a suffix must not change the
    # boundaries inside the shared prefix — verify via a direct re-chunk
    from deepkg_ray.functions.hashing import _MERSENNE
    def chunks(t, w=8, mod=64):
        base, M = 257, _MERSENNE
        pw = pow(base, w - 1, M)
        h, start, out = 0, 0, []
        for i, c in enumerate(t):
            h = (h * base + ord(c)) % M
            if i >= w:
                h = (h - ord(t[i - w]) * pw * base) % M
            if i >= w - 1 and h % mod == 0:
                out.append(t[start:i + 1])
                start = i + 1
        if start < len(t):
            out.append(t[start:])
        return out
    c1, c2 = chunks(texts[0]), chunks(texts[1])
    # chunks that end at least a window before the divergence point are
    # byte-identical between the two docs (the CDC property); later
    # chunks may differ
    assert len(c1) > 1 and len(c2) > 1
    assert c1[0] == c2[0]
