"""vocab_coverage (textstats) + domain_stats (scrub)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def test_vocab_coverage_matches_full_sort():
    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.textstats import vocab_coverage
    from deepkg_ray.util import rows_all
    rng = np.random.default_rng(11)
    vocab = [f"v{i:03d}" for i in range(120)]
    probs = np.array([1.0 / (i + 1) for i in range(120)])
    probs /= probs.sum()
    texts = [" ".join(rng.choice(vocab, size=20, p=probs))
             for _ in range(300)]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64), "text": texts}))
    got = pd.DataFrame(rows_all(vocab_coverage(
        ds, checkpoints=(5, 50, 500)))).sort_values("top_n")
    # ground truth by full sort
    from collections import Counter
    cnt = Counter(w for t in texts for w in t.split())
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    for top_n, row in zip((5, 50, 500), got.itertuples()):
        want = sum(n for _, n in ordered[:top_n])
        assert row.top_n == top_n
        assert row.cum_tokens == want
        assert row.total_tokens == total
        assert row.coverage == round6(want / total)
    # coverage is monotone and saturates past the vocabulary size
    assert got["coverage"].is_monotonic_increasing
    assert got["coverage"].iloc[-1] == 1.0


def test_domain_stats_counts():
    from deepkg_ray.stages.scrub import domain_stats
    from deepkg_ray.util import rows_all
    texts = [
        "see https://a.example.com/x and https://a.example.com/y too",
        "ref http://b.example.org/p plus https://a.example.com/z",
        "no urls here",
        "mailto not a url, but https://c.example.net ends it",
    ]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64), "text": texts}))
    got = (pd.DataFrame(rows_all(domain_stats(ds)))
           .set_index("domain").sort_index())
    assert got.loc["a.example.com", "n_occ"] == 3
    assert got.loc["a.example.com", "n_docs"] == 2
    assert got.loc["b.example.org", "n_occ"] == 1
    assert got.loc["c.example.net", "n_docs"] == 1
    assert len(got) == 3
