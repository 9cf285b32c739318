"""Real BPE merge tier (upgrades the regex-fertility proxy of
stages/textstats.bpe_token_counts): learn a byte-pair-encoding merge table
from the corpus, apply it vectorized per batch, count tokens per document.

Algorithm (the standard Sennrich/GPT-2 formulation):

- **learn**: words = pre-token pieces from BPE_PRETOKEN_PATTERN (leading
  space kept, GPT-2 style); start from characters; repeatedly merge the
  globally most frequent adjacent symbol pair (ties broken by the
  lexicographically smallest pair — deterministic), recording the merge
  order as ranks.
- **apply**: per word, repeatedly merge the present pair with the LOWEST
  rank until none applies (the gpt-2 greedy loop) — so
  n_tokens(word) = len(word) − (#merges applied).

Scale shape: learning runs driver-side over a word-frequency dictionary —
at 100 TB that dict comes from a distributed pre-aggregation
(map_batches word counts → groupby sum → top-K by frequency), which is
exactly the ngram-frequency plan already in phrasemine.py; applying is an
actor-pool map with a per-actor word→count cache (Zipf makes the cache hit
rate ≈ 1), so the merge loop runs once per DISTINCT word per actor, not
once per occurrence.

The learned artifacts (merges + word→n_tokens vocabulary) are persisted as
parquet; the DuckDB oracle re-derives per-doc counts by extracting the
same pre-token pieces in SQL and joining the vocabulary — the word-level
merge math itself is pinned by brute-force unit tests.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from deepkg_ray.stages.textstats import BPE_PRETOKEN_PATTERN

_PRETOKEN_RE = re.compile(BPE_PRETOKEN_PATTERN, re.ASCII)


def pretokenize(text: str) -> list[str]:
    return _PRETOKEN_RE.findall(text)


def learn_bpe(word_freqs: dict[str, int], n_merges: int
              ) -> list[tuple[str, str]]:
    """Classic BPE learning over a word-frequency dict.  Returns the
    ordered merge list (rank = position)."""
    words = {w: list(w) for w in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        # max frequency, tie-break lexicographically smallest pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for w, syms in words.items():
            if a not in syms:
                continue
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def bpe_segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merge loop (the gpt-2 `bpe()` algorithm)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        merged = syms[best_i] + syms[best_i + 1]
        a, b = syms[best_i], syms[best_i + 1]
        # merge ALL occurrences of this pair in one pass (gpt-2 semantics)
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def corpus_word_freqs(texts) -> dict[str, int]:
    freqs: dict[str, int] = {}
    for t in texts:
        for w in pretokenize(t or ""):
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


class BpeCounter:
    """Actor stage: documents → (doc_id, n_merge_tokens).  The merge table
    is a constructor artifact (loaded once per actor); a word→count cache
    makes the merge loop amortized O(1) per occurrence."""

    def __init__(self, merges: list[tuple[str, str]],
                 text_col: str = "text", id_col: str = "doc_id"):
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.cache: dict[str, int] = {}
        self.text_col, self.id_col = text_col, id_col

    def n_tokens(self, word: str) -> int:
        n = self.cache.get(word)
        if n is None:
            n = len(bpe_segment(word, self.ranks))
            self.cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        counts = [sum(self.n_tokens(w) for w in pretokenize(t or ""))
                  for t in batch[self.text_col].to_pylist()]
        return pa.table({
            self.id_col: ids,
            "n_merge_tokens": pa.array(counts, pa.int64())})


def bpe_merge_token_counts(ds, merges, *, text_col="text",
                           id_col="doc_id", concurrency=None):
    """Per-doc token counts under the LEARNED merge table — the real-BPE
    upgrade of bpe_token_counts' pre-token fertility proxy."""
    from deepkg_ray.util import stateful_map
    return stateful_map(
        ds.select_columns([id_col, text_col]), BpeCounter,
        {"merges": merges, "text_col": text_col, "id_col": id_col},
        concurrency=concurrency, batch_size=2048)


def bpe_artifacts(sf_dir: str, n_merges: int = 200) -> tuple[str, str]:
    """Learn (and cache) the merge table + word→n_tokens vocabulary for
    the documents table of ``sf_dir``.  Returns (merges_parquet,
    vocab_parquet); both live in the synth cache dir.  The vocabulary
    covers every distinct pre-token in the corpus, so the SQL oracle's
    inner join is total."""
    import os

    import pyarrow.parquet as pq

    from deepkg_ray import synth
    out = synth.ensure_synth(sf_dir)
    merges_p = os.path.join(out, f"bpe_merges_{n_merges}.parquet")
    vocab_p = os.path.join(out, f"bpe_vocab_{n_merges}.parquet")
    if os.path.exists(merges_p) and os.path.exists(vocab_p):
        return merges_p, vocab_p
    texts = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["text"])["text"].to_pylist()
    freqs = corpus_word_freqs(texts)
    merges = learn_bpe(freqs, n_merges)
    ranks = {m: i for i, m in enumerate(merges)}
    vocab_rows = sorted((w, len(bpe_segment(w, ranks))) for w in freqs)
    t = pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([a for a, _ in merges], pa.string()),
        "right": pa.array([b for _, b in merges], pa.string())})
    pq.write_table(t, merges_p + ".tmp")
    os.replace(merges_p + ".tmp", merges_p)
    v = pa.table({
        "word": pa.array([w for w, _ in vocab_rows], pa.string()),
        "n_tokens": pa.array([n for _, n in vocab_rows], pa.int64())})
    pq.write_table(v, vocab_p + ".tmp")
    os.replace(vocab_p + ".tmp", vocab_p)
    return merges_p, vocab_p
