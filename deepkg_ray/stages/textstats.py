"""Text analysis over a document table: token counts, quality scoring,
language ID, document fingerprints.

These are the training-data-pipeline operators the engine adds as
first-class stages; the quality/stat kernels are vectorized pandas/numpy
inside map_batches.  Every SQL-checkable output is rounded to 6 decimals so
the engine and the DuckDB oracle hash identically.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from deepkg_ray.functions.numeric import round6

from deepkg_ray.functions.hashing import SimHasher, rolling_fingerprint

_WS = re.compile(r"\s+")
PUNCT_CLASS = ".,;:!?"

# tiny per-language stopword inventories for the n-gram/stopword-hit
# language-ID heuristic; priority order breaks ties deterministically.
LANG_STOPWORDS: list[tuple[str, frozenset[str]]] = [
    ("en", frozenset("the and of to in".split())),
    ("de", frozenset("der die und das ist".split())),
    ("es", frozenset("el la los y de".split())),
    ("fr", frozenset("le la les et des".split())),
]


def doc_stats_kernel(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc stats: n_chars, n_tokens, alpha_ratio, punct_ratio,
    stop_ratio (English stopwords), quality score.  All ratios rounded to 6
    decimals; quality = clipped linear combination (deterministic)."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    n_chars = np.empty(n, dtype=np.int64)
    n_tokens = np.empty(n, dtype=np.int64)
    n_alpha = np.empty(n, dtype=np.int64)
    n_punct = np.empty(n, dtype=np.int64)
    n_stop = np.empty(n, dtype=np.int64)
    en_stop = LANG_STOPWORDS[0][1]
    for i, t in enumerate(texts):
        n_chars[i] = len(t)
        toks = _WS.split(t.strip()) if t.strip() else []
        n_tokens[i] = len(toks)
        n_alpha[i] = sum(c.isalpha() and c.isascii() for c in t)
        n_punct[i] = sum(c in PUNCT_CLASS for c in t)
        n_stop[i] = sum(w.lower() in en_stop for w in toks)
    # ratios as integer-valued micros (floor(x*1e6+0.5)); quality is then
    # derived from the micros with ONE final rounding, so the engine and the
    # SQL oracle perform the identical double ops (chaining three
    # already-rounded doubles diverged by 1 ulp on ~1/500 rows)
    a_m = np.floor(n_alpha / np.maximum(n_chars, 1) * 1e6 + 0.5)
    p_m = np.floor(n_punct / np.maximum(n_chars, 1) * 1e6 + 0.5)
    s_m = np.floor(n_stop / np.maximum(n_tokens, 1) * 1e6 + 0.5)
    t_m = np.minimum(n_tokens, 100) * 10000.0
    q_m = np.floor(0.4 * a_m + 0.3 * t_m + 0.3 * s_m + 0.5)
    alpha_ratio = a_m / 1e6
    punct_ratio = p_m / 1e6
    stop_ratio = s_m / 1e6
    quality = np.minimum(np.maximum(q_m, 0.0), 1e6) / 1e6
    out = batch.select([c for c in batch.column_names if c != text_col])
    for name, arr, typ in [("n_chars_calc", n_chars, pa.int64()),
                           ("n_tokens", n_tokens, pa.int64()),
                           ("alpha_ratio", alpha_ratio, pa.float64()),
                           ("punct_ratio", punct_ratio, pa.float64()),
                           ("stop_ratio", stop_ratio, pa.float64()),
                           ("quality", quality, pa.float64())]:
        out = out.append_column(name, pa.array(arr, typ))
    return out


def doc_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.select_columns([id_col, text_col]).map_batches(
        lambda b: doc_stats_kernel(b, text_col), batch_format="pyarrow")


def lang_id_kernel(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-hit language ID; argmax over LANG_STOPWORDS with
    priority-order tie-break; 0 hits → 'unknown'.  Matches the oracle's
    CASE-chain exactly."""
    texts = batch[text_col].to_pylist()
    langs = []
    for t in texts:
        toks = [w for w in _WS.split(t.lower().strip()) if w]
        hits = [sum(w in sw for w in toks) for _, sw in LANG_STOPWORDS]
        best = max(hits)
        if best == 0:
            langs.append("unknown")
        else:
            langs.append(LANG_STOPWORDS[hits.index(best)][0])
    out = batch.select([c for c in batch.column_names if c != text_col])
    return out.append_column("lang_detected", pa.array(langs, pa.string()))


def lang_id(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.select_columns([id_col, text_col]).map_batches(
        lambda b: lang_id_kernel(b, text_col), batch_format="pyarrow")


class FingerprintStage:
    """Actor stage: SimHash + winnowing rolling-hash fingerprints per doc
    (document fingerprinting for containment/near-dup diagnostics)."""

    def __init__(self, text_col: str = "text", window: int = 8,
                 keep_mod: int = 16):
        self.sh = SimHasher()
        self.text_col = text_col
        self.window, self.keep_mod = window, keep_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sims = self.sh.fingerprints(texts)
        fps = [rolling_fingerprint(t, self.window, self.keep_mod) for t in texts]
        out = batch.select([c for c in batch.column_names if c != self.text_col])
        return (out.append_column("simhash", pa.array(sims, pa.uint64()))
                .append_column("fingerprints", pa.array(fps, pa.list_(pa.uint64())))
                .append_column("n_fingerprints",
                               pa.array([len(f) for f in fps], pa.int64())))


def fingerprints(ds, text_col: str = "text", id_col: str = "doc_id",
                 concurrency=None):
    from deepkg_ray.util import stateful_map
    return stateful_map(ds.select_columns([id_col, text_col]),
                        FingerprintStage, {"text_col": text_col},
                        concurrency=concurrency, batch_size=None)


# GPT-2-style BPE pre-tokenizer restricted to the Python-re ∩ RE2 subset
# (no lookahead, explicit ASCII classes) so DuckDB regexp_extract_all is an
# exact oracle for the match count.  Alternation order matters (both
# engines are leftmost-first): contraction suffixes, then optional-space
# letter / digit / punctuation runs.  A second consecutive space is never
# consumed (space ∉ the punct class), matching the upstream pattern's
# behavior of discarding inter-token whitespace.
BPE_PRETOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_counts(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc token counts under the BPE-ish pre-tokenizer vs whitespace:
    (doc_id, n_bpe_tokens, n_ws_tokens, bpe_per_ws) — the fertility-style
    signal used to budget tokenizer work before a real BPE merge pass.
    bpe_per_ws = round6(n_bpe / max(n_ws, 1)); ratio computed from integer
    micros so the oracle reproduces it bit-exactly."""
    pat = BPE_PRETOKEN_PATTERN

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        # re.ASCII pins \s to the ASCII class, matching RE2's semantics
        # (Unicode whitespace like \xa0 would otherwise diverge)
        n_bpe = df[text_col].str.count(pat, flags=re.ASCII).to_numpy(np.int64)
        stripped = df[text_col].str.strip()
        n_ws = np.where(stripped.to_numpy() == "", 0,
                        stripped.str.count(r"\s+", flags=re.ASCII)
                        .to_numpy(np.int64) + 1)
        ratio = np.floor(n_bpe / np.maximum(n_ws, 1) * 1e6 + 0.5) / 1e6
        return pd.DataFrame({id_col: df[id_col],
                             "n_bpe_tokens": n_bpe,
                             "n_ws_tokens": n_ws.astype(np.int64),
                             "bpe_per_ws": ratio})

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pandas")


def source_fertility(ds, text_col: str = "text",
                     src_col: str = "source"):
    """Tokenizer FERTILITY per source: corpus-level BPE-pretoken count
    over whitespace-word count, the tokenizer-health metric that flags
    domains where a tokenizer fragments badly (high fertility = more
    compute per word; the per-language fertility tables of the BLOOM /
    XLM-R tokenizer analyses).  Corpus ratio Σbpe/Σws (not a mean of
    per-doc ratios — long docs should weigh more), from exact integer
    sums via one source-keyed combiner + merge tree; round6 at the end.
    Returns (source, n_docs, sum_bpe, sum_ws, fertility)."""
    import ray.data as rd

    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.treeagg import merge_partials

    pat = BPE_PRETOKEN_PATTERN

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n_bpe = df[text_col].str.count(pat, flags=re.ASCII) \
            .to_numpy(np.int64)
        stripped = df[text_col].str.strip()
        n_ws = np.where(stripped.to_numpy() == "", 0,
                        stripped.str.count(r"\s+", flags=re.ASCII)
                        .to_numpy(np.int64) + 1)
        d = pd.DataFrame({src_col: df[src_col],
                          "n_docs": np.ones(len(df), np.int64),
                          "sum_bpe": n_bpe,
                          "sum_ws": n_ws.astype(np.int64)})
        return d.groupby(src_col, sort=False, as_index=False).sum()

    m = merge_partials(
        ds.select_columns([src_col, text_col]).map_batches(
            partial, batch_format="pandas"),
        [src_col], {"n_docs": "sum", "sum_bpe": "sum", "sum_ws": "sum"},
        mode="tree").to_pandas()
    sb = m["sum_bpe"].to_numpy(np.int64)
    sw = m["sum_ws"].to_numpy(np.int64)
    fert = round6(sb / np.maximum(sw, 1))
    return rd.from_arrow(pa.table({
        src_col: pa.array(m[src_col].astype(str), pa.string()),
        "n_docs": pa.array(m["n_docs"].to_numpy(np.int64), pa.int64()),
        "sum_bpe": pa.array(sb, pa.int64()),
        "sum_ws": pa.array(sw, pa.int64()),
        "fertility": pa.array(fert, pa.float64())}))


def chunk_documents(ds, *, chunk_size: int = 64, overlap: int = 16,
                    text_col: str = "text", id_col: str = "doc_id"):
    """RAG/training-style document chunking: split each doc's whitespace
    tokens into ``chunk_size``-token windows advancing by ``chunk_size -
    overlap``; the last chunk may be short.  Emits (doc_id, chunk_idx,
    tok_start, tok_end, chunk_text).  n_chunks = 0 for empty docs, 1 when
    n ≤ chunk_size, else ceil((n - chunk_size)/stride) + 1 — every chunk
    beyond the first contributes at least one new token.  Pure per-doc
    map_batches: no shuffle, embarrassingly parallel at any scale."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    C, S = int(chunk_size), int(chunk_size) - int(overlap)

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        o_id, o_idx, o_start, o_end, o_text = [], [], [], [], []
        for i, t in enumerate(texts):
            ws = t.split()
            n = len(ws)
            if n == 0:
                continue
            k = 1 if n <= C else -(-(n - C) // S) + 1
            for j in range(k):
                s = j * S
                e = min(s + C, n)
                o_id.append(ids[i])
                o_idx.append(j)
                o_start.append(s)
                o_end.append(e)
                o_text.append(" ".join(ws[s:e]))
        return pa.table({id_col: pa.array(o_id, pa.int64()),
                         "chunk_idx": pa.array(o_idx, pa.int64()),
                         "tok_start": pa.array(o_start, pa.int64()),
                         "tok_end": pa.array(o_end, pa.int64()),
                         "chunk_text": pa.array(o_text, pa.string())})

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow")


def sample_exact_k(ds, k: int = 100, id_col: str = "doc_id"):
    """Deterministic EXACT-size-k corpus sample (the keep-mask sampler
    gives a binomial size): rank every id by md5_lower64 of its decimal
    string and keep the k smallest (tie → smaller id).  Partition- and
    order-free, reproducible anywhere; per-block partial top-k
    (argpartition) then one tiny global merge — k rows per block is all
    that ever shuffles.  SQL: ORDER BY md5_number_lower(id::VARCHAR), id
    LIMIT k."""
    from deepkg_ray.functions.hashing import md5_lower64_batch
    kk = int(k)
    _SIGN = np.uint64(1 << 63)

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "_rk": pa.array([], pa.int64())})
        r = md5_lower64_batch([str(int(x)) for x in ids])
        # order-preserving signed shift so the rank survives Arrow int64
        rk = (r ^ _SIGN).view(np.int64)
        if len(ids) > kk:
            sel = np.lexsort((ids, rk))[:kk]
            ids, rk = ids[sel], rk[sel]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "_rk": pa.array(rk, pa.int64())})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_rk", id_col], kind="stable").head(kk)
        return df[[id_col]].reset_index(drop=True)

    return (ds.select_columns([id_col])
            .map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def stratified_exact_k(ds, k: int = 10, group_col: str = "source",
                       id_col: str = "doc_id"):
    """Exact-size-k sample PER GROUP (corpus-mixing primitive with hard
    per-source quotas, vs the binomial keep-mask sampler): within each
    group keep the k smallest md5 ranks.  Per-block partial top-k per
    group (sort + head — vectorized) then one groupby(group) final pick;
    at most k rows per (block, group) ever shuffle.  SQL: QUALIFY
    ROW_NUMBER() OVER (PARTITION BY group ORDER BY md5, id) <= k."""
    from deepkg_ray.functions.hashing import md5_lower64_batch
    kk = int(k)
    _SIGN = np.uint64(1 << 63)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 id_col: pd.Series([], dtype=np.int64),
                                 "_rk": pd.Series([], dtype=np.int64)})
        ids = df[id_col].to_numpy(np.int64)
        rk = (md5_lower64_batch([str(int(x)) for x in ids])
              ^ _SIGN).view(np.int64)
        out = pd.DataFrame({group_col: df[group_col].to_numpy(),
                            id_col: ids, "_rk": rk})
        return (out.sort_values([group_col, "_rk", id_col], kind="stable")
                .groupby(group_col, sort=False).head(kk))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_rk", id_col], kind="stable").head(kk)
        return df[[group_col, id_col]].reset_index(drop=True)

    return (ds.select_columns([group_col, id_col])
            .map_batches(partial, batch_format="pandas")
            .groupby(group_col).map_groups(final, batch_format="pandas"))


# ------------------------------------------------- corpus prep additions ----

def source_keep_pct(source: str) -> int:
    """Deterministic per-source keep percentage for the stratified-sampling
    demo rule: 5 + (source ordinal % 10) × 10 ∈ {5, 15, …, 95}.  Shared
    verbatim with the SQL oracle (oracle.stratified_sample_oracle builds
    its CASE from this function)."""
    import re
    m = re.search(r"(\d+)$", source)
    return 5 + ((int(m.group(1)) if m else 0) % 10) * 10


def stratified_sample_counts(ds, id_col: str = "doc_id",
                             class_col: str = "source"):
    """Corpus-mixing primitive: per-class deterministic md5 keep mask with a
    per-class rate (the reference's seeded negative-keep filter,
    utils_torch.py:133-139, generalized to per-stratum rates — the knob a
    training-data pipeline uses to reweight sources).  Returns one row per
    class: (class, n_total, n_kept).  Exact, reproducible on any
    partitioning: the mask depends only on the row id."""
    import pandas as pd

    from deepkg_ray.functions.textnorm import md5_keep_mask
    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pa.Table:
        # one md5_keep_mask call per class present in the batch — the SAME
        # sampling primitive transcript_sample and its SQL convention use
        # (no second copy of the cut rule to keep in sync)
        df = pd.DataFrame({class_col: b[class_col].to_pylist(),
                           "key": [str(i) for i in b[id_col].to_pylist()]})
        df["n_kept"] = 0
        for src, idx in df.groupby(class_col, sort=False).groups.items():
            mask = md5_keep_mask(df.loc[idx, "key"].tolist(),
                                 source_keep_pct(src))
            df.loc[idx, "n_kept"] = [int(m) for m in mask]
        df["n_total"] = 1
        g = (df[[class_col, "n_total", "n_kept"]]
             .groupby(class_col, as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    part = ds.select_columns([id_col, class_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536)
    return merge_partials(part, [class_col],
                          {"n_total": "sum", "n_kept": "sum"}, fanout=2)


def explode_sentences(ds, text_col: str = "text",
                      key_cols: tuple[str, ...] = ("conv_id", "turn_idx")):
    """Sentence explode over '. '-joined text: one output row per sentence
    with a 1-based sent_idx and the trailing periods stripped — the
    sentence-level processing unit of the extraction pipelines.  Split
    semantics are shared exactly with the DuckDB oracle
    (string_split(text, '. ') + rtrim(part, '.'))."""
    def explode(b: pa.Table) -> pa.Table:
        keys = [b[c].to_pylist() for c in key_cols]
        texts = b[text_col].to_pylist()
        out_keys: list[list] = [[] for _ in key_cols]
        idxs: list[int] = []
        sents: list[str] = []
        for row, t in enumerate(texts):
            for i, part in enumerate(t.split(". "), start=1):
                for kc, col in zip(out_keys, keys):
                    kc.append(col[row])
                idxs.append(i)
                sents.append(part.rstrip("."))
        cols = {c: pa.array(k, b[c].type)
                for c, k in zip(key_cols, out_keys)}
        cols["sent_idx"] = pa.array(idxs, pa.int64())
        cols["sentence"] = pa.array(sents, pa.string())
        return pa.table(cols)

    return ds.select_columns([*key_cols, text_col]).map_batches(
        explode, batch_format="pyarrow", batch_size=8192)


QUALITY_STOPWORDS = ("the", "a", "of", "to", "in")


def _quality_signals(texts: list[str]):
    """(n_words, sum_word_len, stop_hits) int64 arrays — the shared raw
    signals behind quality_filter and filter_by_quality."""
    stop = frozenset(QUALITY_STOPWORDS)
    m = len(texts)
    n_words = np.empty(m, dtype=np.int64)
    sum_len = np.empty(m, dtype=np.int64)
    stop_hits = np.empty(m, dtype=np.int64)
    for i, t in enumerate(texts):
        ws = _WS.split(t.strip()) if t.strip() else []
        n_words[i] = len(ws)
        sum_len[i] = sum(len(w) for w in ws)
        stop_hits[i] = sum(w.lower() in stop for w in ws)
    return n_words, sum_len, stop_hits


def _quality_keep(n_words, sum_len, stop_hits, min_words, max_words,
                  min_mean_len, max_mean_len, min_stop_hits):
    """Per-rule flag arrays + keep — mean_word_len compared on the round6
    value so the engine and the SQL oracle gate identical doubles."""
    mean_m = np.floor(sum_len / np.maximum(n_words, 1) * 1e6 + 0.5)
    mean_word_len = np.where(n_words > 0, mean_m / 1e6, 0.0)
    f_words = ((n_words >= min_words) & (n_words <= max_words))
    f_len = ((mean_word_len >= min_mean_len)
             & (mean_word_len <= max_mean_len))
    f_stop = stop_hits >= min_stop_hits
    return mean_word_len, f_words, f_len, f_stop, f_words & f_len & f_stop


def filter_by_quality(ds, text_col: str = "text",
                      min_words: int = 30, max_words: int = 100_000,
                      min_mean_len: float = 3.0, max_mean_len: float = 10.0,
                      min_stop_hits: int = 2):
    """Row filter applying the quality_filter keep rule in place — keeps
    ALL input columns (quality_filter emits the diagnostic flag table
    instead)."""
    def kernel(b: pa.Table) -> pa.Table:
        sig = _quality_signals(b[text_col].to_pylist())
        keep = _quality_keep(*sig, min_words, max_words, min_mean_len,
                             max_mean_len, min_stop_hits)[4]
        return b.filter(pa.array(keep))
    return ds.map_batches(kernel, batch_format="pyarrow", batch_size=8192)


def quality_filter(ds, text_col: str = "text", id_col: str = "doc_id",
                   min_words: int = 30, max_words: int = 100_000,
                   min_mean_len: float = 3.0, max_mean_len: float = 10.0,
                   min_stop_hits: int = 2):
    """Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1 shape):
    per doc emit the raw signals, one 0/1 flag per rule, and
    keep = AND of flags.  Rules: word count in [min_words, max_words],
    mean word length in [min_mean_len, max_mean_len], ≥ min_stop_hits
    occurrences of the tiny stopword inventory.  mean_word_len is round6
    micros so the value hash matches oracle.quality_filter_oracle.
    Stateless vectorized kernel — the flag thresholds are plain ints the
    tasks capture by value."""
    def kernel(b: pa.Table) -> pa.Table:
        n_words, sum_len, stop_hits = _quality_signals(
            b[text_col].to_pylist())
        mean_word_len, f_words, f_len, f_stop, keep = _quality_keep(
            n_words, sum_len, stop_hits, min_words, max_words,
            min_mean_len, max_mean_len, min_stop_hits)
        return pa.table({
            id_col: b[id_col],
            "n_words": pa.array(n_words, pa.int64()),
            "mean_word_len": pa.array(mean_word_len, pa.float64()),
            "stop_hits": pa.array(stop_hits, pa.int64()),
            "flag_words": pa.array(f_words.astype(np.int64), pa.int64()),
            "flag_mean_len": pa.array(f_len.astype(np.int64), pa.int64()),
            "flag_stop": pa.array(f_stop.astype(np.int64), pa.int64()),
            "keep": pa.array(keep.astype(np.int64), pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", batch_size=8192)


def doc_logprob(ds, text_col: str = "text", id_col: str = "doc_id",
                mode: str = "broadcast"):
    """Per-document unigram log-likelihood under the corpus' own unigram
    model — the classic LM-based quality signal (CCNet-style, here with the
    corpus itself as the model).  p(w) = count(w) / total_tokens over the
    whole input; per-token contribution floor(ln(count/total)*1e6+0.5) as
    int64 micros, integer-summed per doc — the BM25 micros convention
    (linking.BM25Index.scores_micros) generalized, so DuckDB ``ln`` lands
    on identical values and the query is hash-exact.

    mode='broadcast' (dictionary-bounded vocab): the unigram count table is
    tree-merged, collected once, shipped via ray.put; one stateless pass
    scores docs.  mode='join' (open vocab): explode (doc_id, term, tf)
    rows, hash-join the count table on term, groupby-sum per doc — two
    shuffles, nothing vocabulary-sized on the driver.

    Output: (doc_id, n_tokens, logprob_micros, logprob, avg_logprob);
    avg_logprob = floor(micros/n_tokens + 0.5)/1e6 (int64/int64 → float64
    division, identical in SQL)."""
    import ray

    from deepkg_ray.stages.phrasemine import ngram_counts

    counts = ngram_counts(ds.select_columns([text_col]), 1, text_col)

    def tf_rows(b: pa.Table) -> pd.DataFrame:
        rows_id, rows_w = [], []
        for d, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            tt = t.lower().strip()
            for w in (_WS.split(tt) if tt else []):
                rows_id.append(d)
                rows_w.append(w)
        d = pd.DataFrame({id_col: rows_id, "w1": rows_w})
        return (d.groupby([id_col, "w1"], sort=False).size()
                .reset_index(name="tf"))

    def add_derived(df: pd.DataFrame) -> pd.DataFrame:
        df["logprob"] = df["logprob_micros"] / 1e6
        df["avg_logprob"] = np.floor(
            df["logprob_micros"].to_numpy(np.float64)
            / df["n_tokens"].to_numpy(np.float64) + 0.5) / 1e6
        return df

    if mode == "join":
        tf = ds.select_columns([id_col, text_col]).map_batches(
            tf_rows, batch_format="pyarrow")
        joined = tf.join(counts, join_type="inner", num_partitions=8,
                         on=("w1",))
        total = int(counts.sum("cnt"))

        def contrib(b: pa.Table) -> pd.DataFrame:
            d = b.to_pandas()
            lpm = np.floor(np.log(d["cnt"].to_numpy(np.float64) / total)
                           * 1e6 + 0.5).astype(np.int64)
            d["n_tokens"] = d["tf"].astype(np.int64)
            d["logprob_micros"] = d["tf"].to_numpy(np.int64) * lpm
            return (d.groupby(id_col, as_index=False, sort=False)
                    [["n_tokens", "logprob_micros"]].sum())

        per_doc = joined.map_batches(contrib, batch_format="pyarrow")
        from deepkg_ray.stages.treeagg import merge_partials
        merged = merge_partials(per_doc, [id_col],
                                {"n_tokens": "sum", "logprob_micros": "sum"},
                                mode="shuffle")
        return merged.map_batches(add_derived, batch_format="pandas")

    tbl = counts.to_pandas()
    total = int(tbl["cnt"].sum())
    lpm = np.floor(np.log(tbl["cnt"].to_numpy(np.float64) / total)
                   * 1e6 + 0.5).astype(np.int64)
    ref = ray.put(dict(zip(tbl["w1"], lpm)))

    def score(b: pa.Table) -> pd.DataFrame:
        lp = ray.get(ref)
        ids = b[id_col].to_pylist()
        n_tok = np.zeros(len(ids), dtype=np.int64)
        micros = np.zeros(len(ids), dtype=np.int64)
        for i, t in enumerate(b[text_col].to_pylist()):
            tt = t.lower().strip()
            ws = _WS.split(tt) if tt else []
            n_tok[i] = len(ws)
            micros[i] = sum(lp[w] for w in ws)
        d = pd.DataFrame({id_col: ids, "n_tokens": n_tok,
                          "logprob_micros": micros})
        d = d[d["n_tokens"] > 0]
        d["logprob"] = d["logprob_micros"] / 1e6
        d["avg_logprob"] = np.floor(
            d["logprob_micros"].to_numpy(np.float64)
            / d["n_tokens"].to_numpy(np.float64) + 0.5) / 1e6
        return d

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", batch_size=8192)


def doc_repetition(ds, n: int = 2, text_col: str = "text",
                   id_col: str = "doc_id"):
    """Within-document repetition signal (C4/Gopher-style quality filter):
    per doc, the fraction of word n-grams that are duplicates —
    rep_ratio = 1 − distinct_ngrams / total_ngrams (0 when the doc has
    fewer than n words).  Stateless vectorized kernel; ratio in round6
    micros so the value hash matches the DuckDB list-comprehension
    oracle."""
    def kernel(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        total = np.empty(len(texts), dtype=np.int64)
        distinct = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            ws = t.split()
            grams = [" ".join(ws[j:j + n]) for j in range(len(ws) - n + 1)]
            total[i] = len(grams)
            distinct[i] = len(set(grams))
        rep = np.where(total > 0,
                       np.floor((1.0 - distinct / np.maximum(total, 1)) * 1e6
                                + 0.5) / 1e6, 0.0)
        return pa.table({
            id_col: b[id_col],
            "n_ngrams": pa.array(total, pa.int64()),
            "n_distinct": pa.array(distinct, pa.int64()),
            "rep_ratio": pa.array(rep, pa.float64()),
        })
    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", batch_size=8192)


def lang_confusion(ds, text_col: str = "text", gold_col: str = "lang"):
    """Confusion matrix of the stopword lang-id heuristic vs the gold
    label column: (lang, lang_detected, n) — the eval aggregate that turns
    the classifier into a measured component.  Key space ≤ |langs|², so
    the count merge is a tiny tree."""
    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pa.Table:
        scored = lang_id_kernel(b, text_col)
        import pandas as pd
        df = (scored.select([gold_col, "lang_detected"]).to_pandas()
              .groupby([gold_col, "lang_detected"], as_index=False).size()
              .rename(columns={"size": "n"}))
        df["n"] = df["n"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    return merge_partials(
        ds.select_columns([gold_col, text_col]).map_batches(
            partial, batch_format="pyarrow"),
        [gold_col, "lang_detected"], {"n": "sum"}, fanout=1)


def weighted_sample_k(ds, k: int = 100, weight_col: str = "n_chars",
                      id_col: str = "doc_id", seed: int = 7):
    """Deterministic weighted sample WITHOUT replacement, exact size k —
    Efraimidis-Spirakis A-ES (IPL 2006): rank rows by ln(u)/w with u a
    deterministic md5-uniform in (0,1], keep the k largest keys;
    inclusion probability rises with weight (ppswor).  u is built as
    ((md5_64 >> 11) + 1) / 2^53 — an EXACT dyadic double, so key values
    (one ln + one division on identical inputs) reproduce bitwise in SQL
    and the selected set is partition- and order-free.  Per-block partial
    top-k, then one ≤ k·blocks-row final merge — the sample_exact_k plan
    with a weighted key.  Returns (doc_id, weight, rank)."""
    from deepkg_ray.functions.hashing import md5_lower64_batch
    kk = int(k)

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "weight": pa.array([], pa.int64()),
                             "_key": pa.array([], pa.float64())})
        h = md5_lower64_batch([f"{seed}:{int(x)}" for x in ids])
        u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) / float(1 << 53)
        key = np.log(u) / np.maximum(w, 1.0)        # w ≥ 1 guard, ≤ 0 keys
        if len(ids) > kk:
            sel = np.lexsort((ids, -key))[:kk]
            ids, w, key = ids[sel], w[sel], key[sel]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "weight": pa.array(w.astype(np.int64), pa.int64()),
                         "_key": pa.array(key, pa.float64())})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_key", id_col], ascending=[False, True],
                            kind="stable").head(kk).reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[[id_col, "weight", "rank"]]

    return (ds.select_columns([id_col, weight_col])
            .map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


# --------------------------------------------------- corpus-level statistics

def bigram_cond_entropy(ds, text_col: str = "text",
                        src_col: str = "source"):
    """Per-source conditional bigram entropy H(w₂|w₁) in nats — the
    local-predictability complement of the unigram statistics (Zipf /
    burstiness / KL measure WHAT occurs; this measures how predictable
    the NEXT token is: templated or duplicated sources score low,
    diverse prose high).

    Exactness: bigram counts c₁₂ and margins c₁ are exact integers;
    each bigram's term c₁₂·ln(c₁₂/c₁) quantizes to micros and
    integer-sums per source (order-free), H = −Σ/1e6/T with T the
    source's bigram total — one fixed double chain.  Plan: per-batch
    (source, w1, w2) combiner → open-vocab groupby Sum; margins fold
    inside (source, w1) groups (map_groups emits ONE row per group),
    then a source-keyed merge.  Returns (source, n_bigrams, entropy)."""
    import pandas as pd

    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pd.DataFrame:
        srcs = b[src_col].to_pylist()
        texts = b[text_col].to_pylist()
        acc: dict[tuple, int] = {}
        for s, t in zip(srcs, texts):
            tl = t.lower().strip()
            ws = _WS.split(tl) if tl else []
            for i in range(len(ws) - 1):
                k = (s, ws[i], ws[i + 1])
                acc[k] = acc.get(k, 0) + 1
        if not acc:
            return pd.DataFrame({"source": [], "w1": [], "w2": [],
                                 "c": pd.array([], dtype="int64")})
        ks = list(acc.keys())
        return pd.DataFrame({
            "source": [k[0] for k in ks],
            "w1": [k[1] for k in ks],
            "w2": [k[2] for k in ks],
            "c": pd.array(list(acc.values()), dtype="int64")})

    # (source, w1, w2) cells are Heaps-sublinear in corpus size: auto
    # routing merges them on the tree while observed cardinality stays
    # bounded and falls back to the hash shuffle beyond (treeagg.py)
    bg = merge_partials(
        ds.select_columns([src_col, text_col])
        .map_batches(partial, batch_format="pyarrow"),
        ["source", "w1", "w2"], {"c": "sum"}, mode="auto")

    # margins need (source, w1) co-located; a per-group map_groups would
    # pay one pandas call per context — instead 64 coarse hash
    # partitions, margins via ONE vectorized groupby-transform each
    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        keys = [f"{s}\x00{w}" for s, w in zip(b["source"].to_pylist(),
                                              b["w1"].to_pylist())]
        h = stable_hash64_batch(keys)
        return b.append_column(
            "part", pa.array((h % np.uint64(64)).astype(np.int32)))

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(np.int64)
        c1 = g.groupby(["source", "w1"])["c"].transform("sum") \
            .to_numpy(np.int64)
        tm = np.floor(c * np.log(c / c1.astype(np.float64))
                      * 1e6 + 0.5).astype(np.int64)
        out = (pd.DataFrame({"source": g["source"], "s_tm": tm, "t": c})
               .groupby("source", as_index=False).sum())
        out["s_tm"] = out["s_tm"].astype("int64")
        out["t"] = out["t"].astype("int64")
        return out

    per_src = merge_partials(
        bg.map_batches(add_part, batch_format="pyarrow")
        .groupby("part").map_groups(per_partition,
                                    batch_format="pandas"),
        ["source"], {"s_tm": "sum", "t": "sum"}, mode="tree")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        s = df["s_tm"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        ent = -(s.astype(np.float64) / 1e6 / t)
        out = pd.DataFrame({"source": df["source"],
                            "n_bigrams": t,
                            "entropy": ent})
        return out

    return per_src.map_batches(finish, batch_format="pandas",
                               batch_size=None)


def heaps_fit(ds, stride: int = 1, text_col: str = "text",
              id_col: str = "doc_id"):
    """Heaps'-law fit over vocabulary growth: OLS of ln V(N) on ln N at
    doc-prefix checkpoints in doc_id order, where N is cumulative token
    count and V cumulative distinct vocabulary — token_zipf_fit's
    companion law (Heaps 1978; healthy natural text sits at β ≈ 0.4-0.6,
    template/duplicated corpora flatten toward 0).

    Plan: checkpoints sit at the end of each doc_id//stride bucket, so
    BOTH reductions are bucket-bounded — (bucket, Σtokens) cells from a
    per-batch combiner, and a per-token min-first-doc groupby (the open-
    vocab shuffle) histogrammed into (bucket, new-vocab) cells — and the
    finish folds cumsums over ≤ max_bucket rows.  stride = 1 checkpoints
    every doc (the test tier); at corpus scale pick stride so buckets
    stay ≲ 10⁴ (the two-phase-scan posture, packing.py).

    Exactness: N/V are exact integers, per-point lns floor-micro'd from
    integer args (the zipf convention), OLS moments in Python big-ints,
    slope/intercept ONE fixed double chain.  Returns one row
    (n_points, slope, intercept): slope ≈ β."""
    import ray.data as rd
    from ray.data.aggregate import Min as _Min

    from deepkg_ray.stages.treeagg import merge_partials

    def tok_cells(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        texts = b[text_col].to_pylist()
        bks, nts = [], []
        fd: dict[str, int] = {}
        for i, t in enumerate(texts):
            tl = t.lower().strip()
            ws = _WS.split(tl) if tl else []
            if not ws:
                # empty/whitespace docs contribute no tokens AND no
                # checkpoint bucket — the oracle derives its bucket set
                # from trim(text) <> '' token rows, so a trailing empty
                # doc must not extend B with duplicate OLS checkpoints
                continue
            bks.append(int(ids[i]) // stride)
            nts.append(len(ws))
            for w in ws:
                prev = fd.get(w)
                if prev is None or ids[i] < prev:
                    fd[w] = int(ids[i])
        g = (pd.DataFrame({"b": np.asarray(bks, np.int64),
                           "nt": np.asarray(nts, np.int64)})
             .groupby("b", as_index=False).sum())
        g["nt"] = g["nt"].astype("int64")
        t1 = pa.Table.from_pandas(g, preserve_index=False)
        t2 = pa.table({"w": pa.array(list(fd.keys())),
                       "fdoc": pa.array(list(fd.values()), pa.int64())})
        return {"nt": t1, "fd": t2}

    # two passes share the tokenizer cost shape but keep plans simple:
    # bucket token sums (combiner + tree) and per-token min first doc
    # (open-vocab shuffle), histogrammed per bucket
    src = ds.select_columns([id_col, text_col])
    nt_cells = merge_partials(
        src.map_batches(lambda b: tok_cells(b)["nt"],
                        batch_format="pyarrow"),
        ["b"], {"nt": "sum"}, mode="tree")
    fdoc = (src.map_batches(lambda b: tok_cells(b)["fd"],
                            batch_format="pyarrow")
            .groupby("w").aggregate(_Min("fdoc", alias_name="fdoc")))
    vn_cells = merge_partials(
        fdoc.map_batches(
            lambda b: pa.table({
                "b": pa.array(b["fdoc"].to_numpy(zero_copy_only=False)
                              // stride, pa.int64()),
                "vnew": pa.array(np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["b"], {"vnew": "sum"}, mode="tree")

    nt_df = nt_cells.to_pandas()
    vn_df = vn_cells.to_pandas()
    if len(nt_df) == 0:
        return rd.from_arrow(pa.table({
            "n_points": pa.array([0], pa.int64()),
            "slope": pa.array([0.0], pa.float64()),
            "intercept": pa.array([0.0], pa.float64())}))
    B = int(max(nt_df["b"].max(), vn_df["b"].max())) + 1
    nt = np.zeros(B, np.int64)
    nt[nt_df["b"].to_numpy(np.int64)] = nt_df["nt"].to_numpy(np.int64)
    vn = np.zeros(B, np.int64)
    vn[vn_df["b"].to_numpy(np.int64)] = vn_df["vnew"].to_numpy(np.int64)
    N = np.cumsum(nt)
    V = np.cumsum(vn)
    keep = N > 0
    x = np.floor(np.log(N[keep]) * 1e6 + 0.5).astype(np.int64)
    y = np.floor(np.log(V[keep]) * 1e6 + 0.5).astype(np.int64)
    n = len(x)
    if n < 2:
        return rd.from_arrow(pa.table({
            "n_points": pa.array([n], pa.int64()),
            "slope": pa.array([0.0], pa.float64()),
            "intercept": pa.array([0.0], pa.float64())}))
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x.astype(object) * y).sum())
    sxx = int((x.astype(object) * x).sum())
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    slope = float(num) / float(den)
    intercept = (float(sy) - slope * float(sx)) / float(n) / 1e6
    return rd.from_arrow(pa.table({
        "n_points": pa.array([n], pa.int64()),
        "slope": pa.array([slope], pa.float64()),
        "intercept": pa.array([intercept], pa.float64())}))


def token_zipf_fit(ds, k: int = 500, text_col: str = "text"):
    """Zipf-law fit over the corpus unigram distribution: OLS of ln(freq)
    on ln(rank) for the top-``k`` tokens (rank by freq desc, token asc —
    fully deterministic).  A healthy natural-language corpus sits near
    slope ≈ −1 (Zipf 1949); synthetic or heavily-duplicated data drifts —
    a cheap corpus-health diagnostic for training-data pipelines.

    Exactness: per-point ln values are floor-microed from INTEGER ranks
    and counts (np.log / libm / DuckDB ln verified bit-equal on integer
    args), the OLS moments are exact Python big-ints on the k-sized driver
    table (the dictionary-bounded tier, as llr_collocations), and the
    slope/intercept finish is one fixed double op chain mirrored in SQL
    (which promotes to HUGEINT for the same products).  The distributed
    part is exactly ngram_counts(n=1): per-batch combiner, one
    vocab-bounded groupby, then sort+limit moves only k rows.
    Returns one row (n_tokens, slope, intercept)."""
    import ray.data as rd
    from deepkg_ray.stages.phrasemine import ngram_counts

    top = (ngram_counts(ds, 1, text_col=text_col)
           .sort(["cnt", "w1"], descending=[True, False])
           .limit(k).to_pandas())
    n = len(top)
    if n < 2:
        return rd.from_arrow(pa.table({
            "n_tokens": pa.array([n], pa.int64()),
            "slope": pa.array([0.0], pa.float64()),
            "intercept": pa.array([0.0], pa.float64())}))
    rnk = np.arange(1, n + 1, dtype=np.int64)
    cnt = top["cnt"].to_numpy(np.int64)
    x = np.floor(np.log(rnk) * 1e6 + 0.5).astype(np.int64)
    y = np.floor(np.log(cnt) * 1e6 + 0.5).astype(np.int64)
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x * y).sum())
    sxx = int((x * x).sum())
    num, den = n * sxy - sx * sy, n * sxx - sx * sx   # exact python ints
    slope = float(num) / float(den)
    intercept = (float(sy) - slope * float(sx)) / float(n) / 1e6
    return rd.from_arrow(pa.table({
        "n_tokens": pa.array([n], pa.int64()),
        "slope": pa.array([slope], pa.float64()),
        "intercept": pa.array([intercept], pa.float64())}))


def token_burstiness(ds, k: int = 50, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Per-token burstiness (variance-to-mean ratio of the per-document
    term-frequency count, zeros included): VMR = (N·Σtf² − (Σtf)²) /
    (N·Σtf) — division-cleared to ONE double division of two exact int64s.
    VMR ≈ 1 is Poisson scatter; bursty content words score ≫ 1 while
    function words sit near uniform (Church & Gale 1995) — a
    quality/topicality signal over the corpus.

    Plan: docs are rows, so per-batch (token, Σtf, Σtf², n_docs) partials
    are exact combiners; one vocab-bounded groupby-Sum, sort+limit moves
    only the top-k rows; the global doc count is one scalar.  Overflow
    bound: N·Σtf² must stay < 2^63 (asserted).  Returns
    (token, df, total_tf, vmr) for the top-k tokens by total_tf."""
    from ray.data.aggregate import Count, Sum

    def partial(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        acc: dict[str, list[int]] = {}
        for t in texts:
            tf: dict[str, int] = {}
            tl = t.lower().strip()
            for w in (_WS.split(tl) if tl else []):
                tf[w] = tf.get(w, 0) + 1
            for w, c in tf.items():
                s = acc.get(w)
                if s is None:
                    acc[w] = [c, c * c, 1]
                else:
                    s[0] += c
                    s[1] += c * c
                    s[2] += 1
        toks = list(acc.keys())
        return pa.table({
            "token": pa.array(toks, pa.string()),
            "s_tf": pa.array([acc[w][0] for w in toks], pa.int64()),
            "s_tf2": pa.array([acc[w][1] for w in toks], pa.int64()),
            "df": pa.array([acc[w][2] for w in toks], pa.int64())})

    agg = (ds.select_columns([id_col, text_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("token")
           .aggregate(Sum("s_tf", alias_name="total_tf"),
                      Sum("s_tf2", alias_name="s_tf2"),
                      Sum("df", alias_name="df")))
    n_docs = ds.count()
    top = (agg.sort(["total_tf", "token"], descending=[True, False])
           .limit(k))

    def finish(b: pa.Table) -> pa.Table:
        tf = b["total_tf"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        s2 = b["s_tf2"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        df = b["df"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        assert s2.max(initial=0) < 2**63 // max(n_docs, 1), \
            "N·Σtf² would overflow int64"
        num = n_docs * s2 - tf * tf
        den = n_docs * tf
        return pa.table({
            "token": b["token"],
            "df": pa.array(df, pa.int64()),
            "total_tf": pa.array(tf, pa.int64()),
            "vmr": pa.array(num.astype(np.float64) / den.astype(np.float64),
                            pa.float64())})

    return top.map_batches(finish, batch_format="pyarrow")


def chi2_tokens(ds, k: int = 3, text_col: str = "text",
                src_col: str = "source"):
    """Per-source top-k DISCRIMINATIVE tokens by the chi-square statistic
    of the 2×2 (token-in-source vs rest-of-corpus) contingency table —
    the classic feature-selection score (Yang & Pedersen 1997) and the
    quick "what makes this source different" triage view:

        χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))

    with a = c(s,w), b = t_s − a, c = c(w) − a, d = N − t_s − (c(w) − a).
    Exactness: χ² is a RATIONAL of integer counts — computed as
    chi2_micros = (N·(ad−bc)²·10⁶) // denom in arbitrary-precision
    Python ints (HUGEINT in the SQL twin), no floats anywhere.  Top-k
    per source ordered (chi2 desc, token asc), deterministic.

    Distributed part: one vocab×sources-bounded (source, token) count
    groupby with per-batch combiners; the finish is dictionary-bounded
    on the driver (the llr_collocations tier).  Returns
    (source, token, n_sw, chi2_micros)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        srcs = b[src_col].to_pylist()
        acc: dict[tuple, int] = {}
        for t, s in zip(texts, srcs):
            tl = t.lower().strip()
            for w in (_WS.split(tl) if tl else []):
                key = (s, w)
                acc[key] = acc.get(key, 0) + 1
        ks = list(acc.keys())
        return pa.table({
            src_col: pa.array([x[0] for x in ks], pa.string()),
            "token": pa.array([x[1] for x in ks], pa.string()),
            "n_sw": pa.array([acc[x] for x in ks], pa.int64())})

    c = (ds.select_columns([src_col, text_col])
         .map_batches(partial, batch_format="pyarrow")
         .groupby([src_col, "token"])
         .aggregate(Sum("n_sw", alias_name="n_sw"))
         .to_pandas())
    if len(c) == 0:
        return rd.from_arrow(pa.table({
            src_col: pa.array([], pa.string()),
            "token": pa.array([], pa.string()),
            "n_sw": pa.array([], pa.int64()),
            "chi2_micros": pa.array([], pa.int64())}))
    ts_ = c.groupby(src_col)["n_sw"].sum()          # tokens per source
    cw = c.groupby("token")["n_sw"].sum()           # corpus token count
    N = int(c["n_sw"].sum())
    rows = []
    for src, tok, a in zip(c[src_col], c["token"],
                           c["n_sw"].astype(int)):
        t_s = int(ts_[src])
        c_w = int(cw[tok])
        b_ = t_s - a
        c_ = c_w - a
        d_ = N - t_s - c_
        num = N * (a * d_ - b_ * c_) ** 2 * 10**6
        den = (a + b_) * (c_ + d_) * (a + c_) * (b_ + d_)
        rows.append((src, tok, a, num // den if den else 0))
    df = pd.DataFrame(rows, columns=[src_col, "token", "n_sw",
                                     "chi2_micros"])
    df = (df.sort_values([src_col, "chi2_micros", "token"],
                         ascending=[True, False, True], kind="stable")
          .groupby(src_col, sort=False).head(k)
          .reset_index(drop=True))
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _two_source_counts(ds, src_a, src_b, text_col, src_col):
    """Joint-vocab (token → cₐ, c_b) counts for two corpus slices: one
    vocab-bounded groupby with per-batch combiners, collected to the
    driver (dictionary-bounded tier — shared by the KL/JS divergence
    monitors)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        srcs = b[src_col].to_pylist()
        acc: dict[str, list[int]] = {}
        for t, s in zip(texts, srcs):
            if s != src_a and s != src_b:
                continue
            ia = 1 if s == src_a else 0
            tl = t.lower().strip()
            for w in (_WS.split(tl) if tl else []):
                e = acc.get(w)
                if e is None:
                    acc[w] = [ia, 1 - ia]
                else:
                    e[0] += ia
                    e[1] += 1 - ia
        toks = list(acc.keys())
        return pa.table({
            "w1": pa.array(toks, pa.string()),
            "ca": pa.array([acc[w][0] for w in toks], pa.int64()),
            "cb": pa.array([acc[w][1] for w in toks], pa.int64())})

    return (ds.select_columns([src_col, text_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("w1").aggregate(Sum("ca", alias_name="ca"),
                                     Sum("cb", alias_name="cb"))
            .to_pandas())


def source_js_divergence(ds, src_a: str = "src0", src_b: str = "src1",
                         text_col: str = "text", src_col: str = "source"):
    """Jensen–Shannon divergence between the add-one-smoothed unigram
    distributions of two corpus slices — the SYMMETRIC, bounded-by-ln2
    companion of source_kl_divergence (the drift score you can threshold
    without caring which side is 'reference'):

        JS = ½·KL(P‖M) + ½·KL(Q‖M),   M = ½(P+Q)

    Per-token contribution floor((0.5·p·ln(p/m) + 0.5·q·ln(q/m))·1e6
    + 0.5) as int64 (ONE rounding per term, the doc_stats micros-chain
    lesson), integer-summed; same vocab-bounded distributed counts as
    KL (shared _two_source_counts).  Returns one row
    (n_vocab, t_a, t_b, js_micros, js)."""
    import ray.data as rd

    c = _two_source_counts(ds, src_a, src_b, text_col, src_col)
    v = len(c)
    ca = c["ca"].to_numpy(np.int64)
    cb = c["cb"].to_numpy(np.int64)
    ta, tb = int(ca.sum()), int(cb.sum())
    if v == 0:
        js_micros = 0
    else:
        p = (ca + 1).astype(np.float64) / np.float64(ta + v)
        q = (cb + 1).astype(np.float64) / np.float64(tb + v)
        m = 0.5 * (p + q)
        term = 0.5 * p * np.log(p / m) + 0.5 * q * np.log(q / m)
        js_micros = int(np.floor(term * 1e6 + 0.5).astype(np.int64).sum())
    return rd.from_arrow(pa.table({
        "n_vocab": pa.array([v], pa.int64()),
        "t_a": pa.array([ta], pa.int64()),
        "t_b": pa.array([tb], pa.int64()),
        "js_micros": pa.array([js_micros], pa.int64()),
        "js": pa.array([js_micros / 1e6], pa.float64())}))


def source_kl_divergence(ds, src_a: str = "src0", src_b: str = "src1",
                         text_col: str = "text", src_col: str = "source"):
    """KL divergence KL(Pₐ ‖ P_b) between the add-one-smoothed unigram
    distributions of two corpus slices — the standard domain-shift /
    contamination monitor between data sources (cf. the DSIR importance
    weights in curation.py, which this generalizes to a symmetric-ready
    divergence).

    p_i = (cₐᵢ+1)/(Tₐ+V), q_i = (c_bᵢ+1)/(T_b+V) over the JOINT vocab;
    per-term contribution floor(p·ln(p/q)·1e6+0.5) as int64, integer-
    summed — the module's standing ln-micros convention (doc_logprob), so
    the oracle lands on identical values.  Distributed part: one
    vocab-bounded (token → cₐ, c_b) groupby with per-batch combiners; the
    vocab-sized finish runs vectorized on the driver (dictionary-bounded
    tier, as llr_collocations).  Returns one row
    (n_vocab, t_a, t_b, kl_micros, kl)."""
    import ray.data as rd

    c = _two_source_counts(ds, src_a, src_b, text_col, src_col)
    v = len(c)
    ca = c["ca"].to_numpy(np.int64)
    cb = c["cb"].to_numpy(np.int64)
    ta, tb = int(ca.sum()), int(cb.sum())
    if v == 0:
        kl_micros = 0
    else:
        p = (ca + 1).astype(np.float64) / np.float64(ta + v)
        q = (cb + 1).astype(np.float64) / np.float64(tb + v)
        term = p * np.log(p / q)
        kl_micros = int(np.floor(term * 1e6 + 0.5).astype(np.int64).sum())
    return rd.from_arrow(pa.table({
        "n_vocab": pa.array([v], pa.int64()),
        "t_a": pa.array([ta], pa.int64()),
        "t_b": pa.array([tb], pa.int64()),
        "kl_micros": pa.array([kl_micros], pa.int64()),
        "kl": pa.array([kl_micros / 1e6], pa.float64())}))


def kwic_search(ds, term: str = "join", width: int = 40,
                text_col: str = "text", id_col: str = "doc_id"):
    """Keyword-in-context (KWIC) extraction: for every document
    containing ``term``, the FIRST occurrence's 1-based character
    position plus the ``width``-char left/right context windows — the
    concordance view a corpus linguist (or a prompt auditor) reads
    before deciding on a filter rule; conjunctive_search's
    show-me-the-hits sibling.

    Pure streaming scan, shuffle-free: the match scan is a vectorized
    str.find per batch; only MATCHING rows pay the per-row context
    slice (variable-offset gather-slices have no pandas kernel — the
    source_length_gini posture).  Substring semantics: 'join' also
    hits 'joins', identical to SQL strpos.  Returns
    (doc_id, pos, left_ctx, right_ctx)."""
    import pandas as pd

    def kernel(b: pa.Table) -> pd.DataFrame:
        s = pd.Series(b[text_col].to_pylist())
        pos = s.str.find(term).to_numpy() + 1          # strpos: 1-based
        ids = b[id_col].to_numpy(zero_copy_only=False)
        m = pos > 0
        s, pos, ids = s[m].reset_index(drop=True), pos[m], ids[m]
        lstart = np.maximum(pos - width, 1)
        left = np.asarray([t[ls - 1:p - 1]
                           for t, ls, p in zip(s, lstart, pos)],
                          dtype=object)
        right = np.asarray([t[p - 1 + len(term):p - 1 + len(term) + width]
                            for t, p in zip(s, pos)], dtype=object)
        return pd.DataFrame({
            "doc_id": ids.astype(np.int64), "pos": pos.astype(np.int64),
            "left_ctx": left, "right_ctx": right})

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow")


def conjunctive_search(ds, query: str = "data hash join",
                       text_col: str = "text", id_col: str = "doc_id"):
    """Conjunctive (AND) keyword search: documents containing EVERY query
    token, scored by total term frequency — the retrieval counterpart of
    the BM25 ranking stage (linking.BM25Index), as a pure streaming scan:
    the query tokens broadcast in the task closure, each batch computes
    per-doc hit masks vectorized, no index required (the index-backed path
    is inverted_index + a semi-join; this is the scan tier a fresh corpus
    query uses).  Returns (doc_id, n_terms, tf_sum) for matching docs."""
    q_tokens = sorted(set(w for w in _WS.split(query.lower().strip()) if w))
    k = len(q_tokens)

    def kernel(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        ids = b[id_col].to_numpy(zero_copy_only=False)
        out_id, out_n, out_tf = [], [], []
        for i, t in enumerate(texts):
            tl = t.lower().strip()
            toks = _WS.split(tl) if tl else []
            tf = 0
            hit = 0
            for q in q_tokens:
                c = toks.count(q)
                if c:
                    hit += 1
                    tf += c
            if hit == k:
                out_id.append(int(ids[i]))
                out_n.append(k)
                out_tf.append(tf)
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "n_terms": pa.array(out_n, pa.int64()),
            "tf_sum": pa.array(out_tf, pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow")


def source_length_gini(ds, text_col: str = "text", src_col: str = "source"):
    """Per-source Gini coefficient of document token counts — the
    length-inequality diagnostic for corpus mixing (a source whose Gini
    spikes is dominated by a few giant documents; cf. the doc-length
    quality gates of curation.py).

    Sorted-form Gini: G = (2·Σ i·x(i) − (n+1)·Σx) / (n·Σx) with 1-based
    ranks over ascending token counts — numerator and denominator are
    exact int64 (token counts are ints), ONE double division at the end,
    mirrored in SQL via row_number.  Per-batch (source, len) rows shuffle
    by source (dictionary-sized groups, one vectorized sort per group).
    Returns (source, n_docs, sum_len, gini_num, gini)."""
    def lens(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        n = np.empty(len(texts), np.int64)
        for i, t in enumerate(texts):
            tl = t.strip()
            n[i] = len(_WS.split(tl)) if tl else 0
        return pa.table({src_col: b[src_col],
                         "len": pa.array(n, pa.int64())})

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        x = np.sort(g["len"].to_numpy(np.int64))
        n = len(x)
        sx = int(x.sum())
        num = int(2 * np.sum(np.arange(1, n + 1, dtype=np.int64) * x)
                  - (n + 1) * sx)
        gini = float(num) / float(n * sx) if sx else 0.0
        return pd.DataFrame({
            src_col: [g[src_col].iloc[0]],
            "n_docs": np.asarray([n], np.int64),
            "sum_len": np.asarray([sx], np.int64),
            "gini_num": np.asarray([num], np.int64),
            "gini": np.asarray([gini], np.float64)})

    return (ds.select_columns([src_col, text_col])
            .map_batches(lens, batch_format="pyarrow")
            .groupby(src_col).map_groups(per_source,
                                         batch_format="pandas"))


def lang_top_tokens(ds, k: int = 5, text_col: str = "text",
                    lang_col: str = "lang"):
    """Per-language top-k tokens by corpus frequency (tie → token asc) —
    the grouped heavy-hitters report (heavy_hitter_tokens is global; this
    partitions by the lang dictionary).  One (lang, token) count shuffle
    with per-batch combiners (vocab×langs bounded), then a per-lang
    vectorized top-k pick inside map_groups.  Returns
    (lang, rank, token, cnt)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        langs = b[lang_col].to_pylist()
        acc: dict[tuple, int] = {}
        for t, lg in zip(texts, langs):
            tl = t.lower().strip()
            for w in (_WS.split(tl) if tl else []):
                key = (lg, w)
                acc[key] = acc.get(key, 0) + 1
        keys = list(acc.keys())
        return pa.table({
            "lang": pa.array([kk[0] for kk in keys], pa.string()),
            "token": pa.array([kk[1] for kk in keys], pa.string()),
            "cnt": pa.array([acc[kk] for kk in keys], pa.int64())})

    counts = (ds.select_columns([lang_col, text_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(["lang", "token"])
              .aggregate(Sum("cnt", alias_name="cnt")))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cnt", "token"], ascending=[False, True],
                          kind="stable").head(k)
        return pd.DataFrame({
            "lang": g["lang"].to_numpy(),
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            "token": g["token"].to_numpy(),
            "cnt": g["cnt"].to_numpy(np.int64)})

    return counts.groupby("lang").map_groups(topk, batch_format="pandas")


def gopher_repetition(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-rule repetition signals (Rae et al. 2021 §A1.1) the n-gram
    rep_ratio (doc_repetition) doesn't cover: per doc,

    - n_lines and dup_line_frac — fraction of LINE INSTANCES whose line
      text occurs more than once in the doc ('. '-split + rtrim('.')
      sentence semantics, the sentence_dedup convention);
    - dup_line_char_frac — the same fraction weighted by line characters
      (0 when the doc has no line characters);
    - top_bigram_frac — occurrences of the modal word bigram over total
      bigrams (0 when the doc has fewer than 2 words).

    Counts are exact ints; each fraction is ONE float64 divide in round6 —
    the DuckDB oracle evaluates the identical grid.  Stateless vectorized
    kernel, no shuffle."""
    from collections import Counter

    def kernel(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        n_lines = np.empty(len(texts), np.int64)
        dupf = np.empty(len(texts), np.float64)
        dupcf = np.empty(len(texts), np.float64)
        topbf = np.empty(len(texts), np.float64)
        for i, t in enumerate(texts):
            lines = [p.rstrip(".") for p in t.split(". ")]
            lc = Counter(lines)
            n = len(lines)
            dup = sum(c for c in lc.values() if c > 1)
            chars = sum(len(x) for x in lines)
            dup_chars = sum(len(x) * c for x, c in lc.items() if c > 1)
            n_lines[i] = n
            dupf[i] = np.floor(dup / n * 1e6 + 0.5) / 1e6
            dupcf[i] = (np.floor(dup_chars / chars * 1e6 + 0.5) / 1e6
                        if chars else 0.0)
            ws = t.split()
            bg = Counter(zip(ws, ws[1:]))
            tot = sum(bg.values())
            topbf[i] = (np.floor(max(bg.values()) / tot * 1e6 + 0.5) / 1e6
                        if tot else 0.0)
        return pa.table({
            id_col: b[id_col],
            "n_lines": pa.array(n_lines, pa.int64()),
            "dup_line_frac": pa.array(dupf, pa.float64()),
            "dup_line_char_frac": pa.array(dupcf, pa.float64()),
            "top_bigram_frac": pa.array(topbf, pa.float64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow", batch_size=8192)


def mixture_plan(ds, weights: dict[str, float], budget: int,
                 id_col: str = "doc_id", class_col: str = "source"):
    """Data-mixing selection to TARGET proportions (the trainer-prep knob:
    'give me `budget` docs at these source weights'): per source s, keep
    the floor(budget·w_s) docs that rank first by (md5(doc_id), doc_id) —
    the same deterministic order every sampling op here uses, so the
    selection is reproducible on any partitioning and exactly
    SQL-expressible (row_number over the md5 order).  Sources absent from
    ``weights`` contribute nothing; a source smaller than its quota yields
    all its docs (the plan reports the shortfall).

    Returns the selected rows (class, doc_id) plus per-source plan rows
    via ``mixture_plan_summary``.  Plan: per-source ranking runs in one
    vectorized pass per source group — sources are mixture components
    (dozens), so groups are coarse by construction."""
    import hashlib

    import pandas as pd

    targets = {s: int(budget * w) for s, w in weights.items()}

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        src = g[class_col].iloc[0]
        t = targets.get(src, 0)
        if t <= 0:
            return pd.DataFrame({class_col: pd.Series([], dtype=object),
                                 id_col: pd.Series([], dtype=np.int64)})
        h = [hashlib.md5(str(i).encode()).hexdigest()
             for i in g[id_col].to_numpy()]
        order = np.lexsort((g[id_col].to_numpy(np.int64),
                            np.asarray(h, object)))
        keep = order[:t]
        return pd.DataFrame({class_col: g[class_col].to_numpy()[keep],
                             id_col: g[id_col].to_numpy(np.int64)[keep]})

    return ds.select_columns([id_col, class_col]).groupby(class_col) \
        .map_groups(per_source, batch_format="pandas")


# ------------------------------------------------------------- RAKE --------

RAKE_STOPWORDS = frozenset("a the and of to in".split())


def _rake_phrase_rows(texts: list, stop_arr: np.ndarray) -> pd.DataFrame:
    """Whitespace tokens → candidate-phrase rows (doc, grp, tok): maximal
    stopword-free runs, the RAKE segmentation (Rose et al. 2010).  One
    vectorized pass: explode tokens, cumsum the stopword mask as the
    island id — (doc, grp) keys keep runs from bridging documents."""
    s = pd.Series(texts, dtype="object").fillna("").str.strip()
    s = s[s != ""].str.lower().str.split()
    if not len(s):
        return pd.DataFrame({"doc": pd.Series([], dtype=np.int64),
                             "grp": pd.Series([], dtype=np.int64),
                             "tok": pd.Series([], dtype="object")})
    ex = s.explode()
    tok = ex.to_numpy()
    stop = np.isin(tok, stop_arr)
    return pd.DataFrame({"doc": ex.index.to_numpy(np.int64),
                         "grp": np.cumsum(stop),
                         "tok": tok})[~stop]


def rake_keywords(ds, text_col: str = "text", k: int = 50,
                  stopwords=RAKE_STOPWORDS):
    """RAKE keyword extraction at corpus level: candidate phrases are
    stopword-delimited token runs; word score = deg/freq where freq counts
    a word's phrase occurrences and deg sums the lengths of its containing
    phrases (within-phrase co-occurrence incl. self); a phrase scores the
    sum of its words' scores.  Returns the top-k distinct phrases
    (phrase, n_occurrences, score), score DESC / phrase ASC.

    Two streaming passes: (1) per-batch (word → freq, deg) count partials
    tree-merge to the vocabulary-bounded score table, broadcast back as
    int64 micros; (2) phrases rebuilt per batch score themselves by lookup
    and pre-aggregate (phrase, n, s_micros) partials that the merge tree
    finishes with one sort+head task — the phrase space is the observed
    n-gram table, frequent_phrases' posture.  All arithmetic is the round6
    micros convention, so the DuckDB mirror (rake_keywords_oracle) hashes
    identically."""
    import ray

    from deepkg_ray.stages.treeagg import merge_partials

    stop_arr = np.asarray(sorted(stopwords))

    def word_partial(b: pa.Table) -> pa.Table:
        dfk = _rake_phrase_rows(b[text_col].to_pylist(), stop_arr)
        if not len(dfk):
            return pa.table({"word": pa.array([], pa.string()),
                             "freq": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())})
        plen = dfk.groupby(["doc", "grp"], sort=False)["tok"] \
                  .transform("size").to_numpy(np.int64)
        g = pd.DataFrame({"tok": dfk["tok"].to_numpy(), "plen": plen}) \
            .groupby("tok", sort=False)
        freq = g.size()
        deg = g["plen"].sum()
        return pa.table({"word": pa.array(freq.index.to_numpy(), pa.string()),
                         "freq": pa.array(freq.to_numpy(np.int64)),
                         "deg": pa.array(deg.to_numpy(np.int64))})

    wstat = merge_partials(
        ds.select_columns([text_col]).map_batches(
            word_partial, batch_format="pyarrow"),
        ["word"], {"freq": "sum", "deg": "sum"}).to_pandas()
    sm = np.floor(wstat["deg"].to_numpy(np.float64)
                  / wstat["freq"].to_numpy(np.float64) * 1e6 + 0.5) \
        .astype(np.int64)
    score_ref = ray.put(dict(zip(wstat["word"], sm)))

    def phrase_partial(b: pa.Table) -> pa.Table:
        scores = ray.get(score_ref)
        dfk = _rake_phrase_rows(b[text_col].to_pylist(), stop_arr)
        if not len(dfk):
            return pa.table({"phrase": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "s_micros": pa.array([], pa.int64())})
        dfk = dfk.assign(sm=dfk["tok"].map(scores).astype(np.int64))
        g = dfk.groupby(["doc", "grp"], sort=False)
        ph = pd.DataFrame({"phrase": g["tok"].agg(" ".join),
                           "s_micros": g["sm"].sum()})
        agg = ph.groupby("phrase", sort=False).agg(
            n=("s_micros", "size"), s_micros=("s_micros", "first"))
        return pa.table({
            "phrase": pa.array(agg.index.to_numpy(), pa.string()),
            "n": pa.array(agg["n"].to_numpy(np.int64)),
            "s_micros": pa.array(agg["s_micros"].to_numpy(np.int64))})

    merged = merge_partials(
        ds.select_columns([text_col]).map_batches(
            phrase_partial, batch_format="pyarrow"),
        ["phrase"], {"n": "sum", "s_micros": "first"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(score=df["s_micros"].to_numpy(np.float64) / 1e6)
        df = df.sort_values(["score", "phrase"], ascending=[False, True],
                            kind="stable").head(k).reset_index(drop=True)
        return df.rename(columns={"n": "n_occurrences"})[
            ["phrase", "n_occurrences", "score"]]

    return merged.map_batches(finish, batch_format="pandas",
                              batch_size=None)


def source_vocab_overlap(ds, text_col: str = "text",
                         src_col: str = "source"):
    """Pairwise vocabulary Jaccard between corpus sources: for every
    source pair (s1 < s2), |V₁∩V₂| / |V₁∪V₂| over distinct lowercase
    whitespace tokens — the corpus-comparison matrix that complements
    source_kl_divergence (KL compares frequencies of two named slices;
    this compares vocab SETS across all pairs at once).

    Plan: (1) distinct (source, token) via per-batch sets + cardinality-
    auto merge; (2) sources enumerate to bits (source dictionary is tiny
    — one driver-visible list), per-token membership masks fold with an
    integer SUM (each bit occurs once per token after the distinct, so
    sum ≡ or); (3) each batch of masks contributes one Mᵀ·M matrix —
    intersections off-diagonal, vocab sizes on it — merged as n_src²
    cells.  No token ever shuffles after step 1; the pair space never
    exceeds n_src².  Returns (s1, s2, n_a, n_b, n_inter, jaccard)."""
    from deepkg_ray.stages.treeagg import merge_partials

    def tok_sets(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        srcs = b[src_col].to_pylist()
        seen = set()
        for t, s in zip(texts, srcs):
            tl = t.lower().strip()
            if tl:
                for w in _WS.split(tl):
                    seen.add((s, w))
        return pa.table({
            "source": pa.array([p[0] for p in seen], pa.string()),
            "w": pa.array([p[1] for p in seen], pa.string()),
            "one": pa.array(np.ones(len(seen), np.int64))})

    pairs = merge_partials(
        ds.select_columns([src_col, text_col])
          .map_batches(tok_sets, batch_format="pyarrow"),
        ["source", "w"], {"one": "first"}, mode="auto").materialize()
    return _bitmask_set_overlap(pairs)


def _bitmask_set_overlap(pairs):
    """Shared pair-overlap core: a distinct (source, w) Dataset folds to
    per-key source-membership bitmasks (integer sum ≡ or after the
    distinct), each mask batch contributes one MᵀM Gram (sizes on the
    diagonal, intersections off it), and the n_src²-bounded cells finish
    to (s1, s2, n_a, n_b, n_inter, jaccard)."""
    import pandas as pd

    from deepkg_ray.stages.treeagg import merge_partials

    srcs = sorted(pairs.groupby("source")
                  .count().to_pandas()["source"].tolist())
    bit = {s: i for i, s in enumerate(srcs)}
    n_src = len(srcs)
    assert n_src <= 62, "source dictionary exceeds the bitmask tier"

    def masks(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"w": b["w"].to_pylist(),
                           "m": [1 << bit[s]
                                 for s in b["source"].to_pylist()]})
        g = df.groupby("w", sort=False, as_index=False)["m"].sum()
        return pa.table({"w": pa.array(g["w"], pa.string()),
                         "mask": pa.array(g["m"].to_numpy(np.int64))})

    mask_ds = merge_partials(pairs.map_batches(masks, batch_format="pyarrow"),
                             ["w"], {"mask": "sum"}, mode="auto")

    def gram(b: pa.Table) -> pa.Table:
        m = b["mask"].to_numpy(zero_copy_only=False).astype(np.int64)
        M = ((m[:, None] >> np.arange(n_src)[None, :]) & 1).astype(np.int64)
        G = M.T @ M                    # diag = sizes, off-diag = inters
        i, j = np.triu_indices(n_src)
        return pa.table({"i": pa.array(i.astype(np.int64)),
                         "j": pa.array(j.astype(np.int64)),
                         "cnt": pa.array(G[i, j])})

    cells = merge_partials(mask_ds.map_batches(gram, batch_format="pyarrow"),
                           ["i", "j"], {"cnt": "sum"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = np.zeros((n_src, n_src), np.int64)
        g[df["i"], df["j"]] = df["cnt"]
        i, j = np.triu_indices(n_src, k=1)
        na, nb, inter = g[i, i], g[j, j], g[i, j]
        return pd.DataFrame({
            "s1": [srcs[x] for x in i], "s2": [srcs[x] for x in j],
            "n_a": na, "n_b": nb, "n_inter": inter,
            "jaccard": round6(inter / (na + nb - inter).astype(np.float64))})

    return cells.map_batches(finish, batch_format="pandas",
                             batch_size=None)


def cross_source_dups(ds, text_col: str = "text", src_col: str = "source"):
    """Cross-source duplicate-document matrix: for every source pair,
    how many distinct normalized texts (lower+strip) appear in BOTH —
    the contamination-between-slices view of exact dedup (dedup_exact
    collapses globally; this says WHERE the duplication lives).  Same
    bitmask/Gram core as source_vocab_overlap, keyed by the normalized
    text instead of tokens.  Returns (s1, s2, n_a, n_b, n_inter,
    jaccard)."""
    from deepkg_ray.stages.treeagg import merge_partials

    def doc_sets(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        srcs = b[src_col].to_pylist()
        seen = {(s, t.lower().strip()) for t, s in zip(texts, srcs)}
        return pa.table({
            "source": pa.array([p[0] for p in seen], pa.string()),
            "w": pa.array([p[1] for p in seen], pa.string()),
            "one": pa.array(np.ones(len(seen), np.int64))})

    pairs = merge_partials(
        ds.select_columns([src_col, text_col])
          .map_batches(doc_sets, batch_format="pyarrow"),
        ["source", "w"], {"one": "first"}, mode="auto").materialize()
    return _bitmask_set_overlap(pairs)


_VOWELS = re.compile(r"[aeiou]+")


def readability_scores(ds, text_col: str = "text",
                       id_col: str = "doc_id"):
    """Per-document readability + lexical diversity: Flesch reading ease
    (206.835 − 1.015·W/S − 84.6·Syl/W, syllables ≈ vowel groups — the
    standard dictionary-free approximation) and type-token ratio — the
    quality-scoring signals a curation gate thresholds on alongside
    doc_stats.  Stateless per-record map, zero shuffle; all ratios round6
    in double so the SQL oracle lands on identical values.  Empty-vocab
    docs are dropped (W = 0 has no defined score).  Returns
    (doc_id, n_words, n_sentences, n_syllables, n_distinct, flesch, ttr)."""
    def score(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        texts = b[text_col].to_pylist()
        out_id, nw, ns, sy, nd = [], [], [], [], []
        for i, t in zip(ids, texts):
            tl = t.lower().strip()
            if not tl:
                continue
            words = _WS.split(tl)
            out_id.append(int(i))
            nw.append(len(words))
            ns.append(max(1, tl.count(".")))
            sy.append(len(_VOWELS.findall(tl)))
            nd.append(len(set(words)))
        w = np.asarray(nw, np.float64)
        s = np.asarray(ns, np.float64)
        syl = np.asarray(sy, np.float64)
        d = np.asarray(nd, np.float64)
        flesch = round6(206.835 - 1.015 * (w / s) - 84.6 * (syl / w))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "n_words": pa.array(np.asarray(nw, np.int64)),
            "n_sentences": pa.array(np.asarray(ns, np.int64)),
            "n_syllables": pa.array(np.asarray(sy, np.int64)),
            "n_distinct": pa.array(np.asarray(nd, np.int64)),
            "flesch": pa.array(flesch),
            "ttr": pa.array(round6(d / w))})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def char_entropy(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document character-level Shannon entropy (nats) over the
    normalized (lower+strip) text — the gibberish/compressibility signal
    (low-entropy docs are repetitive boilerplate, ultra-high-entropy docs
    are noise) complementing the word-level quality scores.  Stateless
    per-record map; per-character-class terms quantize to ln-micros and
    integer-sum (the module convention), one division per doc.  Empty
    docs are dropped.  Returns (doc_id, n_chars, n_distinct_chars,
    entropy)."""
    def score(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        texts = b[text_col].to_pylist()
        out_id, nc, nd, em = [], [], [], []
        for i, t in zip(ids, texts):
            tl = t.lower().strip()
            if not tl:
                continue
            codes = np.frombuffer(tl.encode("utf-32-le"), np.uint32)
            _, cnt = np.unique(codes, return_counts=True)
            n = len(codes)
            p = cnt / n
            h = int(np.floor(-p * np.log(p) * 1e6 + 0.5)
                    .astype(np.int64).sum())
            out_id.append(int(i))
            nc.append(n)
            nd.append(len(cnt))
            em.append(h)
        hm = np.asarray(em, np.int64)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "n_chars": pa.array(np.asarray(nc, np.int64)),
            "n_distinct_chars": pa.array(np.asarray(nd, np.int64)),
            "entropy": pa.array(hm.astype(np.float64) / 1e6)})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def hapax_by_source(ds, text_col: str = "text", src_col: str = "source"):
    """Hapax legomena per source: how many of a source's token
    occurrences are corpus-wide singletons — the vocabulary-tail /
    noisiness signal (OCR garbage and boilerplate templates sit at the
    extremes).  From ONE (source, token) count table (vocab × sources
    bounded): a token is hapax iff its GLOBAL count is 1, in which case
    exactly one source carries its single occurrence.  The finish runs
    on the merged cells (dictionary-bounded tier, as llr_collocations).
    Returns (source, n_tokens, n_hapax, hapax_rate)."""
    import pandas as pd

    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.treeagg import merge_partials

    def cells(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        srcs = b[src_col].to_pylist()
        acc: dict[tuple, int] = {}
        for t, s in zip(texts, srcs):
            tl = t.lower().strip()
            if tl:
                for w in _WS.split(tl):
                    k = (s, w)
                    acc[k] = acc.get(k, 0) + 1
        ks = list(acc.keys())
        return pa.table({
            "source": pa.array([k[0] for k in ks], pa.string()),
            "w": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([acc[k] for k in ks], pa.int64())})

    merged = merge_partials(
        ds.select_columns([src_col, text_col]).map_batches(
            cells, batch_format="pyarrow"),
        ["source", "w"], {"n": "sum"}, mode="auto")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("w")["n"].transform("sum")
        df = df.assign(hapax=((tot == 1) & (df["n"] == 1))
                       .astype(np.int64))
        g = (df.groupby("source", as_index=False)
             .agg(n_tokens=("n", "sum"), n_hapax=("hapax", "sum")))
        g["n_tokens"] = g["n_tokens"].astype("int64")
        g["n_hapax"] = g["n_hapax"].astype("int64")
        g["hapax_rate"] = round6(g["n_hapax"].to_numpy(np.float64)
                                 / g["n_tokens"].to_numpy(np.float64))
        return g

    # the hapax test needs every (source, w) row of a token in ONE task:
    # repartition(1) (the documented vocab-bounded finish tier) — the
    # auto merge's shuffle path would otherwise split tokens across
    # blocks and corrupt the global totals
    return merged.repartition(1).map_batches(finish, batch_format="pandas",
                                             batch_size=None)


def source_weighted_jaccard(ds, text_col: str = "text",
                            src_col: str = "source"):
    """Frequency-weighted Jaccard between sources: Σ_w min(a_w, b_w) /
    Σ_w max(a_w, b_w) over token counts — the occurrence-mass overlap
    (set Jaccard says WHICH words are shared; this says how much of the
    corpora's token mass is).  Identity used on both sides:
    Σmax = tot_a + tot_b − Σmin, so only shared tokens need pairing.
    Plan: (source, token, n) cells (vocab × sources bounded), finish in
    one task on the sorted count matrix — 20 columns of pairwise mins.
    Returns (s1, s2, sum_min, sum_max, wjaccard)."""
    import pandas as pd

    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.treeagg import merge_partials

    def cells(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        srcs = b[src_col].to_pylist()
        acc: dict[tuple, int] = {}
        for t, s in zip(texts, srcs):
            tl = t.lower().strip()
            if tl:
                for w in _WS.split(tl):
                    k = (s, w)
                    acc[k] = acc.get(k, 0) + 1
        ks = list(acc.keys())
        return pa.table({
            "source": pa.array([k[0] for k in ks], pa.string()),
            "w": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([acc[k] for k in ks], pa.int64())})

    merged = merge_partials(
        ds.select_columns([src_col, text_col]).map_batches(
            cells, batch_format="pyarrow"),
        ["source", "w"], {"n": "sum"}, mode="auto")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        srcs = sorted(df["source"].unique())
        words = {w: i for i, w in enumerate(df["w"].unique())}
        M = np.zeros((len(words), len(srcs)), np.int64)
        si = np.searchsorted(srcs, df["source"].to_numpy())
        wi = df["w"].map(words).to_numpy(np.int64)
        M[wi, si] = df["n"].to_numpy(np.int64)
        tot = M.sum(0)
        i, j = np.triu_indices(len(srcs), k=1)
        smin = np.array([int(np.minimum(M[:, a], M[:, b]).sum())
                         for a, b in zip(i, j)], np.int64)
        smax = tot[i] + tot[j] - smin
        return pd.DataFrame({
            "s1": [srcs[x] for x in i], "s2": [srcs[x] for x in j],
            "sum_min": smin, "sum_max": smax,
            "wjaccard": round6(smin / smax.astype(np.float64))})

    return merged.repartition(1).map_batches(finish,
                                             batch_format="pandas",
                                             batch_size=None)


def distinct_ngram_diversity(ds, ns=(1, 2), text_col: str = "text",
                             src_col: str = "source"):
    """Distinct-n corpus diversity per source (Li et al. 2016's
    distinct-1/distinct-2, the standard templatedness diagnostic):
    ratio = distinct n-grams / total n-grams — a source whose ratio
    collapses is template-generated or heavily duplicated, exactly what
    a training-data curator down-weights before mixing.

    Shuffle shape: ONE tokenize pass emits batch-local (source, n,
    gram, cnt) combiner cells; ONE open-vocabulary groupby sums them —
    its output carries BOTH statistics (n_distinct = surviving rows,
    total = Σcnt), folded to (source, n) cells by a combiner + tree
    merge.  Ratio is one round6 per cell.
    Returns (source, n, total, n_distinct, ratio)."""
    import pandas as pd
    from ray.data.aggregate import Sum as _Sum

    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.treeagg import merge_partials

    ns = tuple(sorted(set(int(n) for n in ns)))

    def gram_cells(b: pa.Table) -> pa.Table:
        srcs = b[src_col].to_pylist()
        texts = b[text_col].to_pylist()
        cnt: dict = {}
        for s, t in zip(srcs, texts):
            tl = t.lower().strip()
            ws = _WS.split(tl) if tl else []
            for n in ns:
                gs = ws if n == 1 else \
                    [" ".join(ws[i:i + n])
                     for i in range(len(ws) - n + 1)]
                for g in gs:
                    key = (s, n, g)
                    cnt[key] = cnt.get(key, 0) + 1
        keys = list(cnt.keys())
        return pa.table({
            src_col: pa.array([k[0] for k in keys], pa.string()),
            "n": pa.array([k[1] for k in keys], pa.int64()),
            "gram": pa.array([k[2] for k in keys], pa.string()),
            "cnt": pa.array(list(cnt.values()), pa.int64())})

    per_gram = (ds.select_columns([src_col, text_col])
                .map_batches(gram_cells, batch_format="pyarrow")
                .groupby([src_col, "n", "gram"])
                .aggregate(_Sum("cnt", alias_name="cnt")))
    cells = merge_partials(
        per_gram.map_batches(
            lambda b: pa.table({
                src_col: b[src_col],
                "n": b["n"].combine_chunks().cast(pa.int64()),
                "total": b["cnt"].combine_chunks().cast(pa.int64()),
                "n_distinct": pa.array(np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow"),
        [src_col, "n"], {"total": "sum", "n_distinct": "sum"},
        mode="tree")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        t = df["total"].to_numpy(np.int64)
        d = df["n_distinct"].to_numpy(np.int64)
        ratio = np.where(t > 0, np.asarray(round6(
            d / np.maximum(t, 1).astype(np.float64))), 0.0)
        return df.assign(ratio=ratio)[[src_col, "n", "total",
                                       "n_distinct", "ratio"]]

    return cells.map_batches(finish, batch_format="pandas",
                             batch_size=None)


def compression_ratio(ds, text_col: str = "text", id_col: str = "doc_id",
                      level: int = 6):
    """Per-document zlib compression ratio — the industry repetition /
    templatedness filter (a ratio near the format floor means the text
    is highly compressible ⇒ boilerplate or repeated spans; CCNet-style
    pipelines gate on it next to the Gopher rules).  DEFLATE level
    pinned so the byte count is deterministic across workers/retries.

    Verification note: zlib is not SQL-expressible; the oracle is a
    construction-gold parquet computed by an independent driver-side
    pass over the same rows (compression_gold_path) — what the check
    proves is the DISTRIBUTED path (batching, encoding, row alignment)
    reproduces the sequential reference bit-for-bit, the multimodal
    plumbing-gold convention.  Returns (doc_id, n_bytes,
    n_compressed, ratio) with ratio = round6(compressed / raw)."""
    import zlib

    from deepkg_ray.functions.numeric import round6

    def kernel(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = b[text_col].to_pylist()
        raw = np.fromiter((len(t.encode("utf-8")) for t in texts),
                          np.int64, count=len(texts))
        comp = np.fromiter(
            (len(zlib.compress(t.encode("utf-8"), level))
             for t in texts), np.int64, count=len(texts))
        ratio = round6(comp / np.maximum(raw, 1).astype(np.float64))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_bytes": pa.array(raw, pa.int64()),
            "n_compressed": pa.array(comp, pa.int64()),
            "ratio": pa.array(ratio, pa.float64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow")


def compression_gold_path(sf_dir: str, level: int = 6) -> str:
    """Construction gold for compression_ratio: ONE sequential
    driver-side pass over the documents parquet (no Ray, no batching),
    cached under the synth root."""
    import os
    import zlib

    import pyarrow.parquet as pq

    from deepkg_ray import synth
    from deepkg_ray.functions.numeric import round6
    root = synth.ensure_synth(sf_dir)
    path = os.path.join(root, f"compression_gold_l{level}.parquet")
    if os.path.exists(path):
        return path
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    ids, raw, comp = [], [], []
    for i, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        enc = txt.encode("utf-8")
        ids.append(int(i))
        raw.append(len(enc))
        comp.append(len(zlib.compress(enc, level)))
    raw_a = np.asarray(raw, np.int64)
    comp_a = np.asarray(comp, np.int64)
    out = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_bytes": pa.array(raw_a, pa.int64()),
        "n_compressed": pa.array(comp_a, pa.int64()),
        "ratio": pa.array(round6(
            comp_a / np.maximum(raw_a, 1).astype(np.float64)),
            pa.float64())})
    tmp = path + f".tmp{os.getpid()}"
    pq.write_table(out, tmp)
    os.replace(tmp, path)
    return path


def vocab_coverage(ds, checkpoints=(10, 100, 1000, 5000),
                   text_col: str = "text"):
    """Token-mass coverage of the top-N vocabulary at size checkpoints:
    (top_n, cum_tokens, total_tokens, coverage) — the curve a tokenizer /
    vocabulary designer reads to pick a vocab size ("how much of the
    corpus do the most frequent N types cover?").

    Top-N mass is tie-unambiguous: tokens tied at the boundary share the
    same count, so the mass of any (count desc, token asc) prefix of
    length N is well-defined regardless of tie order.

    Plan: the open-vocabulary token-count table (phrasemine.ngram_counts
    n=1, cardinality-auto merge) never reaches the driver — it folds to a
    count-of-counts histogram (distinct count values are O(√mass), always
    tiny) and the checkpoint prefix sums are read off the histogram.
    Engine-only addition (no reference analog)."""
    import ray.data as rd
    from deepkg_ray.stages.phrasemine import ngram_counts
    from deepkg_ray.stages.treeagg import merge_partials
    from deepkg_ray.util import rows_all

    def cc(b: pa.Table) -> pa.Table:
        n = np.asarray(b["cnt"].to_numpy(zero_copy_only=False), np.int64)
        u, m = np.unique(n, return_counts=True)
        return pa.table({"n": pa.array(u, pa.int64()),
                         "m": pa.array(m.astype(np.int64), pa.int64())})

    hist = pd.DataFrame(rows_all(merge_partials(
        ngram_counts(ds, 1, text_col=text_col)
        .map_batches(cc, batch_format="pyarrow"),
        ["n"], {"m": "sum"})))
    hist = hist.sort_values("n", ascending=False).reset_index(drop=True)
    ns = hist["n"].to_numpy(np.int64)
    ms = hist["m"].to_numpy(np.int64)
    cum_vocab = np.cumsum(ms)
    cum_mass = np.cumsum(ns * ms)
    vocab = int(cum_vocab[-1]) if len(ms) else 0
    total = int(cum_mass[-1]) if len(ms) else 0
    rows = []
    for top_n in checkpoints:
        if vocab == 0 or total == 0:
            rows.append((int(top_n), 0, 0, 0.0))
            continue
        if top_n >= vocab:
            cum = total
        else:
            # first count-group whose cumulative vocab reaches rank top_n
            i = int(np.searchsorted(cum_vocab, top_n, side="left"))
            before_v = int(cum_vocab[i - 1]) if i else 0
            before_m = int(cum_mass[i - 1]) if i else 0
            cum = before_m + (int(top_n) - before_v) * int(ns[i])
        rows.append((int(top_n), cum, total, round6(cum / total)))
    return rd.from_arrow(pa.table({
        "top_n": pa.array([r[0] for r in rows], pa.int64()),
        "cum_tokens": pa.array([r[1] for r in rows], pa.int64()),
        "total_tokens": pa.array([r[2] for r in rows], pa.int64()),
        "coverage": pa.array([r[3] for r in rows], pa.float64())}))


def doc_logprob_bigram(ds, text_col: str = "text", id_col: str = "doc_id",
                       mode: str = "broadcast"):
    """Per-document BIGRAM log-likelihood under the corpus' own
    Laplace-smoothed bigram model — one rung up from doc_logprob's unigram
    quality signal (the KenLM-style filter CCNet popularized, with the
    corpus itself as the model):

        P(w2 | w1) = (c(w1,w2) + 1) / (c(w1·) + V)

    c(w1·) is the bigram-history count (Σ_w2 c(w1,w2)) and V the unigram
    vocabulary size, so every in-corpus bigram has a defined probability
    and self-scoring never sees OOV.  Per-bigram contribution
    floor(ln((c2+1)/(c1+V))·1e6+0.5) as int64 micros, integer-summed per
    doc (the doc_logprob ln-parity convention — DuckDB ln lands on
    identical values).

    mode='broadcast': the (w1,w2)→micros table is tree-merged, shipped
    once via ray.put, one stateless scoring pass.  mode='join': explode
    (doc, w1, w2, tf) rows, hash-join the micros table, groupby-sum —
    nothing vocabulary-sized on the driver (open-vocab tier;
    tier-agreement pytest).

    Output (doc_id, n_bigrams, logprob_micros, logprob, avg_logprob);
    docs with < 2 tokens score 0 everywhere."""
    import ray
    import ray.data as rd

    from deepkg_ray.stages.phrasemine import ngram_counts
    from deepkg_ray.stages.treeagg import merge_partials

    big = ngram_counts(ds.select_columns([text_col]), 2, text_col)
    vocab_size = ngram_counts(ds.select_columns([text_col]), 1,
                              text_col).count()

    def hist_partial(b: pa.Table) -> pd.DataFrame:
        d = b.select(["w1", "cnt"]).to_pandas()
        return d.groupby("w1", sort=False, as_index=False)["cnt"].sum() \
                .rename(columns={"cnt": "c1"})

    hist = merge_partials(big.map_batches(hist_partial,
                                          batch_format="pyarrow"),
                          ["w1"], {"c1": "sum"})

    def lpm_table(b: pa.Table) -> pa.Table:
        d = b.to_pandas()
        lpm = np.floor(np.log(
            (d["cnt"].to_numpy(np.float64) + 1.0)
            / (d["c1"].to_numpy(np.float64) + float(vocab_size)))
            * 1e6 + 0.5).astype(np.int64)
        return pa.table({"w1": pa.array(d["w1"], pa.string()),
                         "w2": pa.array(d["w2"], pa.string()),
                         "lpm": pa.array(lpm, pa.int64())})

    from deepkg_ray.util import drop_empty_blocks, join_partitions
    scored = drop_empty_blocks(big.join(
        drop_empty_blocks(hist), join_type="inner",
        num_partitions=join_partitions(), on=("w1",))) \
        .map_batches(lpm_table, batch_format="pyarrow")

    return _score_bigram_lpm(ds, scored, id_col, text_col, mode)


def doc_logprob_kn(ds, text_col: str = "text", id_col: str = "doc_id",
                   mode: str = "broadcast", discount: float = 0.75):
    """Per-document bigram log-likelihood under interpolated KNESER-NEY
    smoothing — the state-of-the-art count-based LM (Kneser & Ney 1995;
    Chen & Goodman 1999), one rung up from doc_logprob_bigram's Laplace:

        P(w2|w1) = (c(w1,w2) − D)/c1(w1)
                   + D·n1f(w1)/c1(w1) · (n1b(w2)/B)

    with D = 0.75, c1 the history count, n1f(w1) = #distinct
    continuations of w1, n1b(w2) = #distinct histories of w2, and
    B = #distinct bigrams (the continuation-probability normalizer —
    the "how many contexts does w2 complete" insight that distinguishes
    KN from frequency smoothing).  Self-scoring: every scored bigram has
    c ≥ 1 > D, so the first term is positive and OOV never arises.

    Per-bigram micros floor(ln(P)·1e6+0.5) with ONE canonical float
    chain ((c−0.75)/c1 + 0.75·n1f/c1·(n1b/B)), mirrored op for op in
    SQL (doc_logprob's np.log ≡ DuckDB ln parity convention).  Model
    tables are vocabulary-shaped: bigram counts + two distinct-count
    marginals (one groupby each) + two hash joins.  Scoring reuses
    _score_bigram_lpm — broadcast lut or the open-vocab join tier.
    Output schema identical to doc_logprob_bigram."""
    from deepkg_ray.stages.phrasemine import ngram_counts
    from deepkg_ray.stages.treeagg import merge_partials
    from deepkg_ray.util import drop_empty_blocks, join_partitions

    big = ngram_counts(ds.select_columns([text_col]), 2, text_col)
    n_bigrams_distinct = big.count()

    def fwd_partial(b: pa.Table) -> pd.DataFrame:
        d = b.select(["w1", "cnt"]).to_pandas()
        g = d.groupby("w1", sort=False)["cnt"].agg(["sum", "count"]) \
            .reset_index()
        return g.rename(columns={"sum": "c1", "count": "n1f"})

    fwd = merge_partials(big.map_batches(fwd_partial,
                                         batch_format="pyarrow"),
                         ["w1"], {"c1": "sum", "n1f": "sum"})

    def bwd_partial(b: pa.Table) -> pd.DataFrame:
        d = b.select(["w2"]).to_pandas()
        return (d.groupby("w2", sort=False).size()
                .reset_index(name="n1b"))

    bwd = merge_partials(big.map_batches(bwd_partial,
                                         batch_format="pyarrow"),
                         ["w2"], {"n1b": "sum"})

    def lpm_table(b: pa.Table, B=float(n_bigrams_distinct)) -> pa.Table:
        d = b.to_pandas()
        c = d["cnt"].to_numpy(np.float64)
        c1 = d["c1"].to_numpy(np.float64)
        n1f = d["n1f"].to_numpy(np.float64)
        n1b = d["n1b"].to_numpy(np.float64)
        p = (c - discount) / c1 + discount * n1f / c1 * (n1b / B)
        lpm = np.floor(np.log(p) * 1e6 + 0.5).astype(np.int64)
        return pa.table({"w1": pa.array(d["w1"], pa.string()),
                         "w2": pa.array(d["w2"], pa.string()),
                         "lpm": pa.array(lpm, pa.int64())})

    np_ = join_partitions()
    scored = drop_empty_blocks(
        drop_empty_blocks(big.join(drop_empty_blocks(fwd),
                                   join_type="inner",
                                   num_partitions=np_, on=("w1",)))
        .join(drop_empty_blocks(bwd), join_type="inner",
              num_partitions=np_, on=("w2",))) \
        .map_batches(lpm_table, batch_format="pyarrow")

    return _score_bigram_lpm(ds, scored, id_col, text_col, mode)


def _score_bigram_lpm(ds, scored, id_col, text_col, mode):
    """Shared doc-scoring scaffold over a (w1, w2, lpm) per-bigram
    micros table: broadcast tier (lut via ray.put, one stateless pass)
    or open-vocab join tier (explode doc bigram tf rows, hash join,
    groupby-sum, zero-restore).  Used by doc_logprob_bigram (Laplace)
    and doc_logprob_kn (Kneser-Ney) — the model only changes the lpm
    table."""
    import ray
    import ray.data as rd  # noqa: F401  (parity with callers)

    from deepkg_ray.stages.treeagg import merge_partials
    from deepkg_ray.util import drop_empty_blocks, join_partitions

    def add_derived(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[id_col, "n_bigrams", "logprob_micros"]]
        df = df.copy()
        df["logprob"] = df["logprob_micros"] / 1e6
        n = df["n_bigrams"].to_numpy(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            av = np.floor(df["logprob_micros"].to_numpy(np.float64)
                          / np.maximum(n, 1.0) + 0.5) / 1e6
        df["avg_logprob"] = np.where(n == 0, 0.0, av)
        return df

    if mode == "join":
        def bigram_tf(b: pa.Table) -> pd.DataFrame:
            rid, r1, r2 = [], [], []
            for d, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
                tt = t.lower().strip()
                ws = _WS.split(tt) if tt else []
                for a, c in zip(ws, ws[1:]):
                    rid.append(d)
                    r1.append(a)
                    r2.append(c)
            d = pd.DataFrame({id_col: rid, "w1": r1, "w2": r2})
            return (d.groupby([id_col, "w1", "w2"], sort=False).size()
                    .reset_index(name="tf"))

        tf = ds.select_columns([id_col, text_col]).map_batches(
            bigram_tf, batch_format="pyarrow")
        joined = drop_empty_blocks(tf).join(
            scored, join_type="inner",
            num_partitions=join_partitions(), on=("w1", "w2"))

        def contrib(b: pa.Table) -> pd.DataFrame:
            d = b.to_pandas()
            d["n_bigrams"] = d["tf"].astype(np.int64)
            d["logprob_micros"] = (d["tf"].to_numpy(np.int64)
                                   * d["lpm"].to_numpy(np.int64))
            return (d.groupby(id_col, as_index=False, sort=False)
                    [["n_bigrams", "logprob_micros"]].sum())

        per_doc = merge_partials(
            drop_empty_blocks(joined).map_batches(contrib,
                                                  batch_format="pyarrow"),
            [id_col], {"n_bigrams": "sum", "logprob_micros": "sum"},
            mode="shuffle")
        # docs with < 2 tokens produce no join rows — restore them as zeros
        def zero_rows(b: pa.Table) -> pa.Table:
            n = [len(_WS.split(t.lower().strip())) if t.strip() else 0
                 for t in b[text_col].to_pylist()]
            keep = [i for i, k in enumerate(n) if k < 2]
            ids = [b[id_col][i].as_py() for i in keep]
            z = [0] * len(keep)
            return pa.table({id_col: pa.array(ids, b[id_col].type),
                             "n_bigrams": pa.array(z, pa.int64()),
                             "logprob_micros": pa.array(z, pa.int64())})

        zeros = ds.select_columns([id_col, text_col]).map_batches(
            zero_rows, batch_format="pyarrow")
        return drop_empty_blocks(per_doc.union(drop_empty_blocks(zeros))) \
            .map_batches(add_derived, batch_format="pandas")

    lpm_df = scored.to_pandas()
    model = ray.put((dict(zip(zip(lpm_df["w1"], lpm_df["w2"]),
                              lpm_df["lpm"].astype(np.int64)))))

    def score_docs(b: pa.Table) -> pd.DataFrame:
        lut = ray.get(model)
        ids, nb, lp = [], [], []
        for d, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            tt = t.lower().strip()
            ws = _WS.split(tt) if tt else []
            s = 0
            for a, c in zip(ws, ws[1:]):
                s += lut[(a, c)]
            ids.append(d)
            nb.append(max(len(ws) - 1, 0))
            lp.append(s)
        return pd.DataFrame({id_col: ids,
                             "n_bigrams": np.asarray(nb, np.int64),
                             "logprob_micros": np.asarray(lp, np.int64)})

    return ds.select_columns([id_col, text_col]).map_batches(
        score_docs, batch_format="pyarrow").map_batches(
        add_derived, batch_format="pandas")
