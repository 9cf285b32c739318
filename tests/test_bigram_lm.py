"""Laplace-smoothed bigram LM scoring (textstats.doc_logprob_bigram)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data as rd


def _docs():
    texts = [
        "the cat sat on the mat",
        "the cat sat",
        "a dog ran",
        "solo",
        "",
        "the cat sat on the mat the cat",
    ]
    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts})), texts


def _truth(texts):
    from collections import Counter
    c2: Counter = Counter()
    vocab = set()
    for t in texts:
        ws = t.lower().split()
        vocab.update(ws)
        c2.update(zip(ws, ws[1:]))
    c1 = Counter()
    for (a, _), n in c2.items():
        c1[a] += n
    v = len(vocab)
    out = {}
    for i, t in enumerate(texts):
        ws = t.lower().split()
        s = 0
        for bg in zip(ws, ws[1:]):
            s += math.floor(
                math.log((c2[bg] + 1) / (c1[bg[0]] + v)) * 1e6 + 0.5)
        out[i] = (max(len(ws) - 1, 0), s)
    return out


def test_bigram_logprob_matches_truth():
    from deepkg_ray.stages.textstats import doc_logprob_bigram
    ds, texts = _docs()
    got = (doc_logprob_bigram(ds).to_pandas()
           .set_index("doc_id").sort_index())
    want = _truth(texts)
    for i, (nb, lp) in want.items():
        assert got.loc[i, "n_bigrams"] == nb
        assert got.loc[i, "logprob_micros"] == lp
        if nb:
            assert got.loc[i, "avg_logprob"] == \
                math.floor(lp / nb + 0.5) / 1e6
        else:
            assert got.loc[i, "avg_logprob"] == 0.0
    # frequent bigrams score higher than hapax bigrams
    assert got.loc[0, "avg_logprob"] > got.loc[2, "avg_logprob"]


def _kn_truth(texts, d=0.75):
    from collections import Counter
    c2: Counter = Counter()
    for t in texts:
        ws = t.lower().split()
        c2.update(zip(ws, ws[1:]))
    c1, n1f, n1b = Counter(), Counter(), Counter()
    for (a, b), n in c2.items():
        c1[a] += n
        n1f[a] += 1
        n1b[b] += 1
    B = float(len(c2))
    out = {}
    for i, t in enumerate(texts):
        ws = t.lower().split()
        s = 0
        for a, b in zip(ws, ws[1:]):
            p = (c2[(a, b)] - d) / c1[a] + d * n1f[a] / c1[a] \
                * (n1b[b] / B)
            s += math.floor(math.log(p) * 1e6 + 0.5)
        out[i] = (max(len(ws) - 1, 0), s)
    return out


def test_kn_logprob_matches_truth():
    from deepkg_ray.stages.textstats import doc_logprob_kn
    ds, texts = _docs()
    got = (doc_logprob_kn(ds).to_pandas()
           .set_index("doc_id").sort_index())
    want = _kn_truth(texts)
    for i, (nb, lp) in want.items():
        assert got.loc[i, "n_bigrams"] == nb
        assert got.loc[i, "logprob_micros"] == lp
    # repeated bigrams still score higher than hapax ones under KN
    assert got.loc[0, "avg_logprob"] > got.loc[2, "avg_logprob"]


def test_kn_logprob_join_tier_agrees():
    from deepkg_ray.stages.textstats import doc_logprob_kn
    ds, _ = _docs()
    a = (doc_logprob_kn(ds, mode="broadcast").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (doc_logprob_kn(ds, mode="join").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_bigram_logprob_join_tier_agrees():
    from deepkg_ray.stages.textstats import doc_logprob_bigram
    ds, _ = _docs()
    a = (doc_logprob_bigram(ds, mode="broadcast").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (doc_logprob_bigram(ds, mode="join").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_source_fertility_golden():
    """Corpus ratio, not mean-of-ratios: srcA has a long fragmenting doc
    (punctuation-heavy) that must dominate its fertility."""
    from deepkg_ray.stages.textstats import source_fertility
    df = pd.DataFrame({
        "source": ["a", "a", "b"],
        "text": ["don't stop-me now!!", "ok", "plain words here"]})
    out = (source_fertility(rd.from_pandas(df)).to_pandas()
           .set_index("source"))
    # 'don't stop-me now!!' -> pretokens: don,'t, stop,-,me, now,!! = 7
    # 'ok' -> 1 ; ws: 3 + 1
    assert out.loc["a", "sum_bpe"] == 8 and out.loc["a", "sum_ws"] == 4
    assert out.loc["a", "fertility"] == 2.0
    assert out.loc["b", "sum_bpe"] == 3 and out.loc["b", "fertility"] == 1.0
