"""Phrase-mining corpus statistics: n-gram frequency, document frequency /
IDF, PMI, left/right neighbor entropy — the distributed re-expression of the
reference's in-memory Counter extractors
(AutoPhraseX-main/autophrasex/extractors.py:101-290).

Each statistic is: explode n-grams inside map_batches with a per-batch
pre-aggregation (combiner), then a small groupby-sum — the Counters become
groupby-aggregate outputs (SURVEY.md §2.5).  Formulas (PMI
extractors.py:120-158, IDF 186-213, entropy 245-290) are computed
post-aggregation and rounded to 6 decimals for oracle comparison.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum

from deepkg_ray.functions.numeric import round6

_WS = re.compile(r"\s+")


def _tokens(text: str) -> list[str]:
    t = text.lower().strip()
    return _WS.split(t) if t else []


def _explode_counts(texts: list[str], n: int) -> pd.DataFrame:
    """Per-batch n-gram counts (combiner)."""
    counts: dict[tuple, int] = {}
    for t in texts:
        ws = _tokens(t)
        for i in range(len(ws) - n + 1):
            key = tuple(ws[i:i + n])
            counts[key] = counts.get(key, 0) + 1
    if not counts:
        return pd.DataFrame({f"w{j+1}": [] for j in range(n)} | {"cnt": []})
    keys = list(counts.keys())
    data = {f"w{j+1}": [k[j] for k in keys] for j in range(n)}
    data["cnt"] = list(counts.values())
    return pd.DataFrame(data)


def ngram_counts(ds, n: int, text_col: str = "text"):
    """Global n-gram frequency table (w1..wn, cnt).  Per-batch combiner
    (_explode_counts already emits one row per distinct n-gram per batch)
    then the cardinality-auto merge (treeagg): pandas tree below 2M
    distinct n-grams, Ray groupby beyond — string-keyed sort-aggregates
    are ~4× slower at tree-friendly vocabulary sizes."""
    from deepkg_ray.stages.treeagg import merge_partials
    key_cols = [f"w{j+1}" for j in range(n)]
    partial = ds.select_columns([text_col]).map_batches(
        lambda b: _explode_counts(b[text_col].to_pylist(), n),
        batch_format="pyarrow")
    return merge_partials(partial, key_cols, {"cnt": "sum"}, mode="auto")


def doc_frequency(ds, text_col: str = "text"):
    """Distinct-per-document unigram counts (df) — reference
    extractors.py:161-184."""
    def explode(b: pa.Table) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for t in b[text_col].to_pylist():
            for w in set(_tokens(t)):
                counts[w] = counts.get(w, 0) + 1
        return pd.DataFrame({"w1": list(counts.keys()),
                             "df": list(counts.values())})
    from deepkg_ray.stages.treeagg import merge_partials
    partial = ds.select_columns([text_col]).map_batches(explode,
                                                        batch_format="pyarrow")
    return merge_partials(partial, ["w1"], {"df": "sum"}, mode="auto")


def idf_table(ds, n_docs: int, text_col: str = "text"):
    """(w1, df, idf) with idf = ln(n_docs / df), rounded to 6 dp."""
    df = doc_frequency(ds, text_col)

    def add_idf(b: pa.Table) -> pa.Table:
        d = np.asarray(b["df"].to_pylist(), dtype=np.float64)
        return b.append_column("idf", pa.array(round6(np.log(n_docs / d)),
                                               pa.float64()))
    return df.map_batches(add_idf, batch_format="pyarrow")


def tfidf_top_terms(ds, n_docs: int, k: int = 5, text_col: str = "text",
                    id_col: str = "doc_id", mode: str = "broadcast"):
    """Per-document top-k terms by tf·idf — the keyword-extraction step of
    a corpus-prep pipeline (reference idf analog extractors.py:161-184).

    score = round6(tf × round6(ln(n_docs/df))) — both roundings mirrored in
    oracle.tfidf_top_terms_oracle; ties broken (score desc, term asc).

    A document's rows are batch-local (one text cell per doc), so tf AND
    the per-doc top-k are computed inside map_batches with NO shuffle; only
    the global df table is shared state.  mode='broadcast' ships the idf
    dict once via ray.put (right whenever the vocabulary is
    dictionary-/language-sized); mode='join' is the open-vocab escape
    hatch: hash-partitioned Dataset.join on term, then a per-doc groupby
    top-k (two shuffles, nothing vocabulary-sized on the driver)."""
    import ray

    idf_ds = idf_table(ds.select_columns([text_col]), n_docs, text_col)

    def tf_rows(b: pa.Table) -> pd.DataFrame:
        ids = b[id_col].to_pylist()
        toks = [_tokens(t) for t in b[text_col].to_pylist()]
        lens = [len(x) for x in toks]
        d = pd.DataFrame({
            id_col: np.repeat(np.asarray(ids), lens),
            "term": np.concatenate(toks) if any(lens) else
                    np.empty(0, dtype=object),
        })
        return (d.groupby([id_col, "term"], sort=False).size()
                .reset_index(name="tf"))

    def topk(d: pd.DataFrame, idf: pd.Series) -> pd.DataFrame:
        d["score"] = round6(d["tf"].to_numpy(np.float64)
                            * d["term"].map(idf).to_numpy(np.float64))
        d = d.sort_values([id_col, "score", "term"],
                          ascending=[True, False, True], kind="stable")
        d["rank"] = d.groupby(id_col, sort=False).cumcount() + 1
        return d[d["rank"] <= k].reset_index(drop=True)

    if mode == "join":
        tf = ds.map_batches(tf_rows, batch_format="pyarrow")
        joined = tf.join(idf_ds.map_batches(
            lambda b: b.rename_columns(["term", "df", "idf"]),
            batch_format="pyarrow"), join_type="inner",
            num_partitions=8, on=("term",))

        def per_doc(g: pd.DataFrame) -> pd.DataFrame:
            idf = g.drop_duplicates("term").set_index("term")["idf"]
            return topk(g[[id_col, "term", "tf"]].copy(), idf)
        return joined.groupby(id_col).map_groups(per_doc,
                                                 batch_format="pandas")

    idf_df = idf_ds.to_pandas()
    ref = ray.put(pd.Series(idf_df["idf"].to_numpy(),
                            index=idf_df["w1"].to_numpy()))

    def kernel(b: pa.Table) -> pd.DataFrame:
        idf = ray.get(ref)
        return topk(tf_rows(b), idf)

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow")


def pmi_bigrams(ds, text_col: str = "text", min_count: int = 1,
                mode: str = "driver"):
    """(w1, w2, cnt, pmi): pmi = ln((c12/N2) / ((c1/N1)*(c2/N1))), the
    log-ratio form of extractors.py:120-158, rounded to 6 dp.

    mode='driver' (dictionary-bounded vocab): ONE pass emitting unigram AND
    bigram partial counts per batch (unigram rows use a '' sentinel for w2),
    one tree merge, PMI formula on the driver over the merged
    (vocab²-bounded) table → pandas DataFrame.

    mode='groupby' (open vocab, the 100-TB shape): Ray groupby for the
    counts, the two unigram lookups as hash-partitioned Dataset.joins, PMI
    computed per batch → returns a streaming Dataset; nothing
    vocabulary-sized ever lands on the driver."""
    from deepkg_ray.stages.treeagg import merge_partials

    def both_counts(b: pa.Table) -> pd.DataFrame:
        counts: dict[tuple[str, str], int] = {}
        for t in b[text_col].to_pylist():
            ws = _tokens(t)
            for w in ws:
                counts[(w, "")] = counts.get((w, ""), 0) + 1
            for i in range(len(ws) - 1):
                k = (ws[i], ws[i + 1])
                counts[k] = counts.get(k, 0) + 1
        ks = list(counts)
        return pd.DataFrame({"w1": [k[0] for k in ks],
                             "w2": [k[1] for k in ks],
                             "cnt": list(counts.values())})

    partial = ds.select_columns([text_col]).map_batches(both_counts,
                                                        batch_format="pyarrow")
    if mode == "groupby":
        return _pmi_bigrams_groupby(partial, min_count)
    merged = merge_partials(partial, ["w1", "w2"], {"cnt": "sum"}).to_pandas()
    uni = merged[merged["w2"] == ""]
    big = merged[merged["w2"] != ""].copy()
    n1 = float(uni["cnt"].sum())
    n2 = float(big["cnt"].sum())
    counts = dict(zip(uni["w1"], uni["cnt"]))
    c12 = big["cnt"].to_numpy(np.float64)
    c1 = np.asarray([counts[w] for w in big["w1"]], np.float64)
    c2 = np.asarray([counts[w] for w in big["w2"]], np.float64)
    big["pmi"] = round6(np.log((c12 / n2) / ((c1 / n1) * (c2 / n1))))
    if min_count > 1:
        big = big[big["cnt"] >= min_count]
    return big.reset_index(drop=True)[["w1", "w2", "cnt", "pmi"]]


def _pmi_bigrams_groupby(partial, min_count: int):
    """Unbounded-vocab PMI: groupby-sum the mixed partial rows, split
    unigrams/bigrams as Datasets, attach c1/c2 via hash joins, compute PMI
    per batch.  The two scalar totals (n1, n2) are the only driver values."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    merged = (partial.groupby(["w1", "w2"])
              .aggregate(Sum("cnt", alias_name="cnt")).materialize())
    uni = merged.filter(expr="w2 == ''")
    big = merged.filter(expr="w2 != ''")
    n1 = float(uni.sum("cnt"))
    n2 = float(big.sum("cnt"))
    from deepkg_ray.util import join_partitions
    np_ = join_partitions()

    def rename(names):
        return lambda b: b.rename_columns(names)

    u1 = uni.select_columns(["w1", "cnt"]).map_batches(
        rename(["w1", "c1"]), batch_format="pyarrow")
    u2 = uni.select_columns(["w1", "cnt"]).map_batches(
        rename(["w2", "c2"]), batch_format="pyarrow")
    j = big.join(u1, join_type="inner", num_partitions=np_, on=("w1",))
    j = j.join(u2, join_type="inner", num_partitions=np_, on=("w2",))

    def add_pmi(b: pa.Table) -> pa.Table:
        c12 = np.asarray(b["cnt"].to_pylist(), np.float64)
        c1 = np.asarray(b["c1"].to_pylist(), np.float64)
        c2 = np.asarray(b["c2"].to_pylist(), np.float64)
        pmi = round6(np.log((c12 / n2) / ((c1 / n1) * (c2 / n1))))
        out = pa.table({"w1": b["w1"], "w2": b["w2"],
                        "cnt": b["cnt"].combine_chunks().cast(pa.int64()),
                        "pmi": pa.array(pmi, pa.float64())})
        if min_count > 1:
            out = out.filter(pc.greater_equal(out["cnt"], min_count))
        return out

    return j.map_batches(add_pmi, batch_format="pyarrow")


def neighbor_entropy(ds, side: str = "right", text_col: str = "text",
                     mode: str = "driver"):
    """(w1, entropy): Shannon entropy of the left/right-neighbor
    distribution of each unigram (extractors.py:216-290), rounded 6 dp.
    Tokens at sequence edges contribute a sentinel neighbor '∅'.

    mode='driver': tree-merge + driver pandas (vocab²-bounded).
    mode='groupby': Ray groupby for the (w1, nb) counts, then per-w1
    entropy inside groupby('w1').map_groups — streaming Dataset, nothing
    vocabulary-sized on the driver (open-vocab / 100-TB shape)."""
    assert side in ("left", "right")

    def explode(b: pa.Table) -> pd.DataFrame:
        counts: dict[tuple[str, str], int] = {}
        for t in b[text_col].to_pylist():
            ws = _tokens(t)
            for i, w in enumerate(ws):
                if side == "right":
                    nb = ws[i + 1] if i + 1 < len(ws) else "∅"
                else:
                    nb = ws[i - 1] if i > 0 else "∅"
                counts[(w, nb)] = counts.get((w, nb), 0) + 1
        ks = list(counts.keys())
        return pd.DataFrame({"w1": [k[0] for k in ks],
                             "nb": [k[1] for k in ks],
                             "cnt": list(counts.values())})

    from deepkg_ray.stages.treeagg import merge_partials
    partial = ds.select_columns([text_col]).map_batches(explode,
                                                        batch_format="pyarrow")
    if mode == "groupby":
        from ray.data.aggregate import Sum

        def per_w1(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["w1", "nb"], kind="stable")
            c = g["cnt"].to_numpy(np.float64)
            p = c / c.sum()
            return pd.DataFrame({"w1": [g["w1"].iloc[0]],
                                 "entropy": [float(round6(-(p * np.log(p)).sum()))]})

        return (partial.groupby(["w1", "nb"])
                .aggregate(Sum("cnt", alias_name="cnt"))
                .groupby("w1").map_groups(per_w1, batch_format="pandas"))
    pairs = merge_partials(partial, ["w1", "nb"], {"cnt": "sum"}).to_pandas()
    # per-w1 entropy on the (vocab²-bounded) merged table, driver-side;
    # the summation order inside each group is pinned by a (w1, nb) sort so
    # the rounded value is deterministic
    pairs = pairs.sort_values(["w1", "nb"], kind="stable")
    out_w, out_h = [], []
    for w1, g in pairs.groupby("w1", sort=True):
        c = g["cnt"].to_numpy(np.float64)
        p = c / c.sum()
        out_w.append(w1)
        out_h.append(float(round6(-(p * np.log(p)).sum())))
    return pd.DataFrame({"w1": out_w, "entropy": out_h})


STOPWORDS = frozenset(
    "the a an and of to in is are was were be been it this that".split())
_NON_ALNUM = re.compile(r"[^a-z0-9 ]")


def frequent_phrases(ds, n: int = 2, topk: int = 50, min_count: int = 2,
                     text_col: str = "text"):
    """Top-k frequent n-gram phrase candidates after quality filters —
    the reference's frequent-phrase selection (AutoPhraseX
    selector.py:107-135) with its stopword/charset candidate filters
    (extractors.py:13-15,76-88): drop phrases containing stopwords or
    non-alphanumeric tokens, keep count ≥ min_count, order by count desc
    then phrase asc (deterministic tie-break), take topk."""
    counts = ngram_counts(ds, n, text_col)
    key_cols = [f"w{j+1}" for j in range(n)]

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        ok = np.ones(len(df), dtype=bool)
        for c in key_cols:
            vals = df[c].astype(str)
            ok &= ~vals.isin(STOPWORDS)
            ok &= vals.map(lambda w: _NON_ALNUM.search(w) is None)
        df = df[ok & (df["cnt"] >= min_count)].copy()
        if df.empty:   # empty blocks appear at high parallelism; .agg on an
            # empty frame returns a DataFrame and breaks the column assign
            return pd.DataFrame({"phrase": pd.Series([], dtype=str),
                                 "cnt": pd.Series([], dtype=np.int64)})
        df["phrase"] = df[key_cols[0]].astype(str).str.cat(
            [df[c].astype(str) for c in key_cols[1:]], sep=" ")
        return df[["phrase", "cnt"]]

    cands = counts.map_batches(filt, batch_format="pandas")

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["cnt", "phrase"], ascending=[False, True],
                               kind="stable").head(topk).reset_index(drop=True))
    # candidates are already a small aggregated table → single-task top-k
    return cands.repartition(1).map_batches(final_topk, batch_format="pandas",
                                            batch_size=None)


def prune_low_freq(ds, min_freq: int = 2, text_col: str = "text",
                   id_col: str = "doc_id", mode: str = "broadcast"):
    """Two-pass low-frequency token prune (reference
    text_preprocess.py:31-43): pass 1 computes global token counts; pass 2
    counts surviving tokens (freq > min_freq) per doc.  Docs with zero
    surviving tokens are omitted.

    mode='broadcast' (bounded vocab): pass-1 counts collected to the driver
    and broadcast into pass 2 — no shuffle join.
    mode='semijoin' (open vocab): the surviving vocabulary stays a Dataset;
    exploded (doc_id, w1) token rows hash-join it and re-aggregate per doc
    — nothing vocabulary-sized on the driver."""
    if mode == "semijoin":
        return _prune_low_freq_semijoin(ds, min_freq, text_col, id_col)
    uni = ngram_counts(ds.select_columns([text_col]), 1, text_col).to_pandas()
    keep = frozenset(uni.loc[uni["cnt"] > min_freq, "w1"])

    def per_doc(b: pa.Table) -> pa.Table:
        ids, kept = [], []
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            n = sum(w in keep for w in _tokens(t))
            if n:
                ids.append(i)
                kept.append(n)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_kept": pa.array(kept, pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        per_doc, batch_format="pyarrow")


def _prune_low_freq_semijoin(ds, min_freq: int, text_col: str, id_col: str):
    import pyarrow.compute as pc
    from ray.data.aggregate import Count
    from deepkg_ray.util import join_partitions

    vocab = (ngram_counts(ds.select_columns([text_col]), 1, text_col)
             .map_batches(lambda b: b.filter(pc.greater(b["cnt"], min_freq))
                          .select(["w1"]), batch_format="pyarrow"))

    def explode_tokens(b: pa.Table) -> pa.Table:
        ids, ws = [], []
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            for w in _tokens(t):
                ids.append(i)
                ws.append(w)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "w1": pa.array(ws, pa.string())})

    toks = ds.select_columns([id_col, text_col]).map_batches(
        explode_tokens, batch_format="pyarrow")
    kept = toks.join(vocab, join_type="inner",
                     num_partitions=join_partitions(), on=("w1",))
    return (kept.groupby(id_col).aggregate(Count(alias_name="n_kept"))
            .map_batches(lambda b: pa.table(
                {id_col: b[id_col].combine_chunks().cast(pa.int64()),
                 "n_kept": b["n_kept"].combine_chunks().cast(pa.int64())}),
                batch_format="pyarrow"))


PHRASE_FEATURE_WEIGHTS = {"pmi": 0.5, "idf_min": 0.3, "entropy_min": 0.2}


def phrase_quality_scores(ds, topk: int = 50, min_count: int = 2,
                          text_col: str = "text",
                          classifier: str = "linear",
                          positive_phrases: set[str] | None = None,
                          gbdt_params: dict | None = None):
    """Phrase-quality scoring: statistical features (PMI, min-token IDF,
    min neighbor entropy) → classifier → ranked phrases, the reference's
    phrase-classifier step (AutoPhraseX autophrase.py:53-56,118-130).

    classifier='linear': fixed-weight scorer (deterministic baseline).
    classifier='gbdt': gradient-boosted stumps (stages/gbdt.py) trained by
    distant supervision — candidates in ``positive_phrases`` (the
    reference's quality-phrase seed pool, autophrase.py:53-56) are
    positives, the rest negatives; quality = P(positive | features).
    Both run on the small candidate table driver-side after the distributed
    stat aggregation (same plan position as the reference's pooling step)."""
    import math
    cands = frequent_phrases(ds, n=2, topk=topk * 4,
                             min_count=min_count, text_col=text_col).to_pandas()
    pmi = pmi_bigrams(ds, text_col=text_col)
    pmi["phrase"] = pmi["w1"] + " " + pmi["w2"]
    n_docs = ds.count()
    idf = idf_table(ds.select_columns([text_col]), n_docs=n_docs,
                    text_col=text_col).to_pandas().set_index("w1")["idf"]
    ent = neighbor_entropy(ds, side="right",
                           text_col=text_col).set_index("w1")["entropy"]

    df = cands.merge(pmi[["phrase", "pmi"]], on="phrase", how="left")
    words = df["phrase"].str.split(" ")
    df["idf_min"] = [min(idf.get(w, 0.0) for w in ws) for ws in words]
    df["entropy_min"] = [min(ent.get(w, 0.0) for w in ws) for ws in words]
    if classifier == "gbdt":
        if not positive_phrases:
            raise ValueError("classifier='gbdt' needs positive_phrases "
                             "(the quality-phrase seed pool)")
        from deepkg_ray.stages.gbdt import GradientBoostedStumps
        X = df[["pmi", "idf_min", "entropy_min"]].fillna(0.0).to_numpy()
        y = df["phrase"].isin(positive_phrases).to_numpy(dtype=np.float64)
        model = GradientBoostedStumps(**(gbdt_params or {}))
        df["quality"] = model.fit(X, y).predict_proba(X)
    else:
        w = PHRASE_FEATURE_WEIGHTS
        df["quality"] = (w["pmi"] * df["pmi"].fillna(0.0)
                         + w["idf_min"] * df["idf_min"]
                         + w["entropy_min"] * df["entropy_min"])
    from deepkg_ray.functions.numeric import round6
    df["quality"] = round6(df["quality"])
    df = df.sort_values(["quality", "phrase"], ascending=[False, True],
                        kind="stable").head(topk).reset_index(drop=True)
    return df[["phrase", "cnt", "quality"]]


def inverted_index(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Search-index construction: per term emit document frequency (df),
    collection frequency (cf), and the posting list as a comma-joined
    doc_id string in ascending id order (string-encoded so the row is a
    flat hashable scalar — the SQL oracle's string_agg ORDER BY mirrors
    it).  One shuffle: per-batch (term, doc_id, tf) partials are already
    one row per (term, doc) — docs are batch-local — then a term groupby
    co-locates each posting list.

    Scale note: a hot term's posting list lands in ONE group; for web-scale
    vocabularies cap or shard postings (e.g. segment by doc_id range) —
    this emits the classic single-segment index."""
    def explode(b: pa.Table) -> pd.DataFrame:
        ids, terms, tfs = [], [], []
        for d, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            cnt: dict[str, int] = {}
            for w in _tokens(t):
                cnt[w] = cnt.get(w, 0) + 1
            ids.extend([d] * len(cnt))
            terms.extend(cnt.keys())
            tfs.extend(cnt.values())
        return pd.DataFrame({"term": terms,
                             id_col: np.asarray(ids, np.int64),
                             "tf": np.asarray(tfs, np.int64)})

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable")
        return pd.DataFrame({
            "term": [g["term"].iloc[0]],
            "df": np.asarray([len(g)], np.int64),
            "cf": np.asarray([int(g["tf"].sum())], np.int64),
            "postings": [",".join(str(int(d)) for d in g[id_col])],
        })

    return (ds.select_columns([id_col, text_col])
            .map_batches(explode, batch_format="pyarrow")
            .groupby("term").map_groups(build, batch_format="pandas"))


def textrank_words(ds, n_iters: int = 5, text_col: str = "text",
                   local_threshold: int = 100_000):
    """TextRank keyword scores: integer-scaled PageRank over the corpus
    bigram graph (unweighted simple digraph w1→w2, self-bigrams dropped) —
    the graph-based keyword-extraction composition of the phrase-mining
    bigram pass and graph.pagerank_scaled (Mihalcea & Tarau 2004
    semantics at window=2).

    Node ids must agree bitwise with SQL, so words map to their
    dense_rank in sorted order: the vocabulary is dictionary-bounded (the
    same assumption every phrasemine aggregate documents), collected once
    driver-side from the tiny bigram table and broadcast.  Returns
    (word, pr_scaled)."""
    from deepkg_ray.stages.graph import pagerank_scaled

    bigrams = ngram_counts(ds, 2, text_col=text_col)

    def to_edges(b: pa.Table) -> pa.Table:
        return pa.table({"w1": b["w1"], "w2": b["w2"]})
    edge_words = bigrams.map_batches(to_edges,
                                     batch_format="pyarrow").materialize()

    vocab = sorted(set(edge_words.unique("w1"))
                   | set(edge_words.unique("w2")))
    wid = {w: i + 1 for i, w in enumerate(vocab)}     # dense_rank ORDER BY w

    def encode(b: pa.Table) -> pa.Table:
        s = np.fromiter((wid[w] for w in b["w1"].to_pylist()), np.int64,
                        b.num_rows)
        d = np.fromiter((wid[w] for w in b["w2"].to_pylist()), np.int64,
                        b.num_rows)
        return pa.table({"subj_id": pa.array(s), "obj_id": pa.array(d)})

    if len(vocab) <= local_threshold:
        # dictionary-bounded vocab: the graph already fits the driver
        # (it was collected to build ids) — the distributed scatter
        # rounds' per-iteration fixed cost would dominate.  Identical
        # integer op chain as pagerank_scaled (same oracle).
        import ray.data as rd
        from deepkg_ray.stages.graph import PR_SCALE
        ew = edge_words.to_pandas().drop_duplicates(["w1", "w2"])
        s = ew["w1"].map(wid).to_numpy(np.int64) - 1
        d = ew["w2"].map(wid).to_numpy(np.int64) - 1
        keep = s != d
        s, d = s[keep], d[keep]
        node_ids = np.unique(np.concatenate([s, d]))
        n = len(node_ids)
        if n == 0:
            return rd.from_arrow(pa.table({
                "word": pa.array([], pa.string()),
                "pr_scaled": pa.array([], pa.int64())}))
        pos = np.full(len(vocab), -1, np.int64)
        pos[node_ids] = np.arange(n)
        si, di = pos[s], pos[d]
        outdeg = np.bincount(si, minlength=n).astype(np.int64)
        dp = 85                       # pagerank_scaled's default damping
        pm = np.full(n, PR_SCALE // n, np.int64)
        base = ((100 - dp) * PR_SCALE) // (100 * n)
        for _ in range(n_iters):
            contrib = pm[si] // outdeg[si]
            tot = np.zeros(n, np.int64)
            np.add.at(tot, di, contrib)
            pm = base + (dp * tot) // 100
        words = [vocab[i] for i in node_ids]
        return rd.from_arrow(pa.table({
            "word": pa.array(words, pa.string()),
            "pr_scaled": pa.array(pm, pa.int64())}))

    pr = pagerank_scaled(edge_words.map_batches(encode,
                                                batch_format="pyarrow"),
                         n_iters=n_iters)
    names = {i: w for w, i in wid.items()}

    def decode(b: pa.Table) -> pa.Table:
        return pa.table({
            "word": pa.array([names[i] for i in b["node"].to_pylist()],
                             pa.string()),
            "pr_scaled": b["pr_scaled"]})
    return pr.map_batches(decode, batch_format="pyarrow")


def llr_collocations(ds, text_col: str = "text", min_count: int = 1):
    """Dunning log-likelihood-ratio (G²) collocation scores per bigram —
    the significance-test complement of pmi_bigrams (PMI over-rewards rare
    pairs; G² weights by evidence).  Reference analog: the phrase-quality
    scoring features of extractors.py:120-158, with the G² statistic from
    Dunning (1993).

    The 2×2 contingency is over bigram positions: k11 = c(w1,w2),
    margins r = Σ_y c(w1,y) and c = Σ_x c(x,w2), N = Σ all bigrams — ALL
    derivable from the bigram count table alone, so the distributed pass
    is exactly ngram_counts(n=2) (per-batch combiner + one groupby); the
    vocab²-bounded count table is finished on the driver (the
    dictionary-bounded tier, as pmi_bigrams mode='driver').  The four
    k·ln(kN/(row·col)) terms are summed in fixed order and rounded to 6 dp,
    mirrored verbatim in the SQL oracle.  Returns
    (w1, w2, cnt, llr) as pandas."""
    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.treeagg import merge_partials

    partial = ds.select_columns([text_col]).map_batches(
        lambda b: _explode_counts(b[text_col].to_pylist(), 2),
        batch_format="pyarrow")
    big = merge_partials(partial, ["w1", "w2"], {"cnt": "sum"}).to_pandas()
    if len(big) == 0:
        return pd.DataFrame({"w1": [], "w2": [], "cnt": [], "llr": []})

    n = float(big["cnt"].sum())
    r = big.groupby("w1")["cnt"].sum()
    c = big.groupby("w2")["cnt"].sum()
    k11 = big["cnt"].to_numpy(np.float64)
    rr = r.loc[big["w1"]].to_numpy(np.float64)
    cc = c.loc[big["w2"]].to_numpy(np.float64)
    k12 = rr - k11
    k21 = cc - k11
    k22 = n - rr - cc + k11

    def term(k, row, col):
        with np.errstate(divide="ignore", invalid="ignore"):
            t = k * np.log((k * n) / (row * col))
        return np.where(k > 0, t, 0.0)

    llr = 2.0 * (term(k11, rr, cc) + term(k12, rr, n - cc)
                 + term(k21, n - rr, cc) + term(k22, n - rr, n - cc))
    out = pd.DataFrame({"w1": big["w1"].to_numpy(),
                        "w2": big["w2"].to_numpy(),
                        "cnt": big["cnt"].astype(np.int64).to_numpy(),
                        "llr": round6(llr)})
    if min_count > 1:
        out = out[out["cnt"] >= min_count].reset_index(drop=True)
    return out
