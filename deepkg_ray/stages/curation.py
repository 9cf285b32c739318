"""Corpus curation operators: sentence-level exact dedup and
budget-constrained quality selection.

- ``sentence_dedup``: C4/RefinedWeb-style line dedup — across the whole
  corpus, each distinct sentence survives only at its first occurrence
  (min (doc_id, sent_idx)); documents are re-assembled from their surviving
  sentences.  Exactly two shuffles: a groupby on the sentence (min-key
  aggregate — the winner's coordinates are ENCODED in the key, so no join
  back) and a groupby on doc_id to re-assemble.  Sentence semantics are
  shared verbatim with textstats.explode_sentences / the SQL oracle
  ('. ' split, trailing periods stripped).

- ``budget_select``: pick the highest-quality documents until a weight
  budget (e.g. token count) is exhausted — the data-mixing step that turns
  quality scores into an actual training set.  Globally this is a prefix
  sum over the score-desc ordering; the implementation never sorts the
  data: pass 1 builds a per-score weight histogram (distinct-score-bounded
  — scores are round6 micros, ≤1e6+1 values by construction), the driver
  prefix-sums it to find the boundary score, and the boundary GROUP (only)
  is resolved by an O(log n) distributed binary search over doc_id on a
  materialized boundary slice — the exact-quantiles trick
  (stages/quantiles.py) generalized to weighted prefix selection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SENT_KEY_M = 1 << 20   # sent_idx < 2^20 per doc; key = doc_id*M + sent_idx


def sentence_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, n_kept, text_clean): corpus-wide first-occurrence sentence
    dedup.  Docs whose every sentence lost are dropped (mirrored in
    oracle.sentence_dedup_oracle)."""
    from ray.data.aggregate import Min

    def explode(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        sents: list[str] = []
        keys: list[int] = []
        for d, t in zip(ids, b[text_col].to_pylist()):
            for i, part in enumerate(t.split(". "), start=1):
                sents.append(part.rstrip("."))
                keys.append(d * _SENT_KEY_M + i)
        return pa.table({"sentence": pa.array(sents, pa.string()),
                         "key": pa.array(keys, pa.int64())})

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow")
    # cardinality-auto first-occurrence pick: pandas merge tree below 2M
    # distinct sentences, Ray groupby beyond (string-keyed sort-aggregates
    # are ~4× slower at tree-friendly sizes)
    from deepkg_ray.stages.treeagg import merge_partials
    winners = merge_partials(exploded, ["sentence"], {"key": "min"},
                             mode="auto")

    n_parts = 64

    def decode(b: pa.Table) -> pa.Table:
        k = b["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = k // _SENT_KEY_M
        return pa.table({
            id_col: pa.array(doc, pa.int64()),
            "sent_idx": pa.array(k % _SENT_KEY_M, pa.int64()),
            "sentence": b["sentence"],
            # doc-complete COARSE partitions: per-doc map_groups pays a
            # multi-second fixed cost for thousands of tiny groups (the
            # turn_latency lesson) — one vectorized pandas pass per ~64
            # partitions reassembles the same output in one shuffle
            "part": pa.array((doc % n_parts).astype(np.int32)),
        })

    def reassemble_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "sent_idx"], kind="stable")
        out = (g.groupby(id_col, sort=False)
               .agg(n_kept=("sentence", "size"),
                    text_clean=("sentence", ". ".join)).reset_index())
        out["n_kept"] = out["n_kept"].astype(np.int64)
        return out

    return (winners.map_batches(decode, batch_format="pyarrow")
            .groupby("part").map_groups(reassemble_part,
                                        batch_format="pandas"))


def budget_select(ds, budget: int, score_col: str = "score",
                  weight_col: str = "weight", id_col: str = "doc_id"):
    """Rows of ``ds`` forming the maximal (score DESC, id ASC)-ordered
    prefix whose cumulative weight ≤ budget — returned as the selected
    (id, score, weight) rows, order-independent (the driver/oracle compare
    sorts).  Weights must be non-negative ints.

    Scale shape: one distinct-score-bounded tree merge, then ≤ ~log2(n)
    cheap aggregate probes over ONLY the boundary score group (materialized
    once); the full dataset is never sorted or collected."""
    from deepkg_ray.stages.treeagg import merge_partials

    def per_score_partial(b: pa.Table) -> pd.DataFrame:
        d = pd.DataFrame({
            score_col: b[score_col].to_numpy(zero_copy_only=False),
            "w": b[weight_col].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        return d.groupby(score_col, as_index=False, sort=False).sum()

    hist = merge_partials(
        ds.select_columns([score_col, weight_col]).map_batches(
            per_score_partial, batch_format="pyarrow"),
        [score_col], {"w": "sum"}, fanout=2).to_pandas()
    hist = hist.sort_values(score_col, ascending=False, kind="stable")
    cum = hist["w"].cumsum()
    inside = cum <= budget
    if inside.all():
        return ds.select_columns([id_col, score_col, weight_col])
    bpos = int(inside.sum())              # first score group that overflows
    s_star = hist[score_col].iloc[bpos]
    remaining = int(budget - (cum.iloc[bpos - 1] if bpos else 0))

    def keep_above(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b[score_col], pa.scalar(s_star)))

    def keep_boundary(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b[score_col], pa.scalar(s_star)))

    cols = [id_col, score_col, weight_col]
    above = ds.select_columns(cols).map_batches(
        keep_above, batch_format="pyarrow")
    boundary = ds.select_columns(cols).map_batches(
        keep_boundary, batch_format="pyarrow").materialize()

    # binary-search the largest id cut with prefix weight ≤ remaining
    lo = int(boundary.min(id_col)) - 1      # select none
    hi = int(boundary.max(id_col))          # select all ≤ hi
    if int(boundary.sum(weight_col)) <= remaining:
        cut = hi
    else:
        while hi - lo > 1:
            mid = (lo + hi) // 2
            got = boundary.map_batches(
                lambda b, m=mid: b.filter(
                    pc.less_equal(b[id_col], pa.scalar(m))),
                batch_format="pyarrow").sum(weight_col)
            if int(got or 0) <= remaining:
                lo = mid
            else:
                hi = mid
        cut = lo
    picked = boundary.map_batches(
        lambda b: b.filter(pc.less_equal(b[id_col], pa.scalar(cut))),
        batch_format="pyarrow")
    return above.union(picked)


def corpus_curate(ds, budget_frac: float = 0.6, text_col: str = "text",
                  id_col: str = "doc_id"):
    """The end-to-end curation pipeline: quality-rule gate →
    corpus-wide sentence dedup → re-score the CLEANED text → token-budget
    selection (budget = floor(budget_frac × total cleaned tokens)).
    Returns the selected (doc_id, quality, n_tokens) rows.

    One streaming pass feeds the dedup shuffles; only the (doc_id, quality,
    n_tokens) stats table — three scalars per doc — is materialized (it is
    consumed twice: once for the budget total, once for the histogram
    selection)."""
    from deepkg_ray.stages.textstats import doc_stats, filter_by_quality

    kept = filter_by_quality(ds.select_columns([id_col, text_col]),
                             text_col=text_col)
    clean = sentence_dedup(kept, text_col=text_col, id_col=id_col)
    stats = (doc_stats(clean, text_col="text_clean", id_col=id_col)
             .select_columns([id_col, "quality", "n_tokens"]).materialize())
    total = stats.sum("n_tokens")
    if not total:
        return stats
    return budget_select(stats, int(budget_frac * int(total)),
                         score_col="quality", weight_col="n_tokens",
                         id_col=id_col)


def dsir_scores(ds, target_lang: str = "en", text_col: str = "text",
                id_col: str = "doc_id", lang_col: str = "lang",
                n_buckets: int = 1024, hash_mode: str = "md5"):
    """Hashed-ngram importance scores for data selection (DSIR, Xie et al.
    2023, arXiv:2302.03169): score(doc) = Σ_tokens [ ln p_target(b(w)) −
    ln p_raw(b(w)) ] over hashed unigram buckets with add-1 smoothing —
    the log-likelihood ratio a doc would get under a bag-of-hashed-ngrams
    model of the target domain vs the raw corpus.  Selecting top-score
    docs (compose with budget_select) importance-resamples the corpus
    toward the target.

    Two streaming passes, nothing row-shaped shuffles:
      1. bucket counts — per-batch (bucket → raw_n, tgt_n) partials, tree
         merge over the n_buckets-bounded key space;
      2. the driver turns the ≤ n_buckets count rows into a micros
         log-ratio array (broadcast via closure — 8 KiB), and a stateless
         map scores every doc as an exact int64 sum.

    SQL parity: tokens = string_split_regex(lower(trim(text)), '\\s+')
    (the word_idf convention), bucket = md5_number_lower(w) % n_buckets
    (functions/hashing.md5_lower64_batch), per-bucket micros =
    floor((ln((tgt+1)/(T+B)) − ln((raw+1)/(R+B)))*1e6+0.5) — the
    ln-micros convention established by doc_logprob/word_idf.
    Returns (doc_id, n_tokens, dsir_micros, dsir).

    ``hash_mode='md5'`` is the oracle-checked parity tier;
    ``hash_mode='fast'`` swaps in the vectorized non-crypto 64-bit hash
    (functions/hashing.stable_hash64_batch) — the 100-TB path, identical
    bucket statistics, ~10x cheaper per token."""
    from deepkg_ray.functions.hashing import (md5_lower64_batch,
                                              stable_hash64_batch)
    from deepkg_ray.stages.phrasemine import _tokens
    from deepkg_ray.stages.treeagg import merge_partials

    hash_batch = (md5_lower64_batch if hash_mode == "md5"
                  else stable_hash64_batch)
    B = int(n_buckets)

    def bucket_counts(b: pa.Table) -> pd.DataFrame:
        raw = np.zeros(B, np.int64)
        tgt = np.zeros(B, np.int64)
        langs = b[lang_col].to_pylist()
        for text, lang in zip(b[text_col].to_pylist(), langs):
            toks = _tokens(text)
            if not toks:
                continue
            bk = (hash_batch(toks) % np.uint64(B)).astype(np.int64)
            cnt = np.bincount(bk, minlength=B)
            raw += cnt
            if lang == target_lang:
                tgt += cnt
        nz = np.flatnonzero(raw)
        return pd.DataFrame({"b": nz.astype(np.int64),
                             "raw_n": raw[nz], "tgt_n": tgt[nz]})

    merged = merge_partials(
        ds.select_columns([text_col, lang_col]).map_batches(
            bucket_counts, batch_format="pyarrow"),
        ["b"], {"raw_n": "sum", "tgt_n": "sum"}, fanout=2)
    from deepkg_ray.util import rows_all
    rows = rows_all(merged)                       # ≤ n_buckets rows, bounded
    raw_n = np.zeros(B, np.int64)
    tgt_n = np.zeros(B, np.int64)
    for r in rows:
        raw_n[int(r["b"])] = int(r["raw_n"])
        tgt_n[int(r["b"])] = int(r["tgt_n"])
    R, T = int(raw_n.sum()), int(tgt_n.sum())
    lam = (np.log((tgt_n + 1.0) / (T + B)) - np.log((raw_n + 1.0) / (R + B)))
    lam_m = np.floor(lam * 1e6 + 0.5).astype(np.int64)

    def score(b: pa.Table) -> pa.Table:
        n_out = np.zeros(b.num_rows, np.int64)
        m_out = np.zeros(b.num_rows, np.int64)
        for i, text in enumerate(b[text_col].to_pylist()):
            toks = _tokens(text)
            if not toks:
                continue
            bk = (hash_batch(toks) % np.uint64(B)).astype(np.int64)
            n_out[i] = len(toks)
            m_out[i] = int(lam_m[bk].sum())
        return pa.table({
            id_col: b[id_col],
            "n_tokens": pa.array(n_out, pa.int64()),
            "dsir_micros": pa.array(m_out, pa.int64()),
            "dsir": pa.array(m_out.astype(np.float64) / 1e6, pa.float64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def dsir_sample(ds, m: int = 100, seed: int = 13,
                target_lang: str = "en", text_col: str = "text",
                id_col: str = "doc_id", lang_col: str = "lang",
                n_buckets: int = 1024, hash_mode: str = "md5"):
    """EXECUTE the DSIR plan (the neyman_allocation → neyman_sample arc
    for importance resampling): deterministic Gumbel-top-k over the
    dsir_scores output — sampling WITHOUT replacement with inclusion
    probability ∝ exp(score), the importance-resampling step of Xie et
    al. 2023 §2, realized order-free:

        key(doc) = dsir_micros/1e6 − ln(−ln(u))

    with u the exact-dyadic md5 uniform of 'seed:doc_id'
    (weighted_sample_k's A-ES convention — Gumbel-max equals A-ES with
    w = eˢ but never overflows exp).  Top-m by (key desc, doc_id):
    per-block partial top-m, then one ≤ m·blocks-row final merge —
    nothing corpus-shaped on the driver.  Returns
    (doc_id, dsir_micros, rank)."""
    import pandas as pd

    from deepkg_ray.functions.hashing import md5_lower64_batch

    scores = dsir_scores(ds, target_lang=target_lang, text_col=text_col,
                         id_col=id_col, lang_col=lang_col,
                         n_buckets=n_buckets, hash_mode=hash_mode)
    mm = int(m)

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sm = b["dsir_micros"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dsir_micros": pa.array([], pa.int64()),
                             "_key": pa.array([], pa.float64())})
        h = md5_lower64_batch([f"{seed}:{int(x)}" for x in ids])
        u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) \
            / float(1 << 53)
        key = sm / 1e6 - np.log(-np.log(u))
        if len(ids) > mm:
            sel = np.lexsort((ids, -key))[:mm]
            ids, sm, key = ids[sel], sm[sel], key[sel]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "dsir_micros": pa.array(sm, pa.int64()),
                         "_key": pa.array(key, pa.float64())})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_key", id_col], ascending=[False, True],
                            kind="stable").head(mm).reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[[id_col, "dsir_micros", "rank"]]

    return (scores.map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def dataset_split_assign(ds, id_col: str = "doc_id",
                         group_col: str = "lang",
                         pcts=(80, 10, 10), seed: int = 9):
    """Deterministic train/val/test split assignment + per-(split, group)
    accounting — the reproducible-split primitive every training-data
    export needs: split = first md5 byte of "seed:id" against cumulative
    percent cuts (the md5_keep_mask convention, functions/textnorm.py:96,
    generalized to k-way), so ANY worker on ANY partitioning assigns the
    same row to the same split, and DuckDB reproduces the assignment
    byte-for-byte.  Returns (split, group, n) counts (the assignment
    itself is the per-batch map; counts verify it)."""
    import hashlib

    import pandas as pd

    from deepkg_ray.stages.treeagg import merge_partials

    names = ["train", "val", "test"]
    cuts = []
    acc = 0
    for p in pcts:
        acc += p
        cuts.append(acc * 256 // 100)

    def assign(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        grp = b[group_col].to_pylist()
        byte = [int(hashlib.md5(f"{seed}:{i}".encode())
                    .hexdigest()[:2], 16) for i in ids]
        split = [names[0] if x < cuts[0]
                 else names[1] if x < cuts[1] else names[2]
                 for x in byte]
        df = pd.DataFrame({"split": split, group_col: grp})
        g = (df.groupby(["split", group_col], sort=False).size()
             .reset_index(name="n"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return merge_partials(
        ds.select_columns([id_col, group_col])
        .map_batches(assign, batch_format="pyarrow"),
        ["split", group_col], {"n": "sum"}, mode="tree")


def training_manifest(ds_docs, budget_frac: float = 0.6,
                      pcts=(80, 10, 10), seed: int = 9):
    """The full training-set manifest — the end of the curation story
    composed under ONE check: corpus_curate (quality gate → sentence
    dedup → budget select) → exact dedup among the selected docs (min-id
    survivor per raw-text content) → deterministic md5 split assignment →
    per-split doc and token accounting.  Every stage is the already-
    oracle-checked operator; the manifest proves they compose without
    semantic drift.

    The curated id→n_tokens table is corpus-bounded and broadcasts as a
    sorted array into the dedup/split passes (documented tier — swap for
    hash joins when the selection outgrows a broadcast).  Returns
    (split, n_docs, sum_tokens)."""
    import hashlib

    import pandas as pd
    import ray
    import ray.data as rd

    from deepkg_ray.stages.dedup import dedup_exact
    from deepkg_ray.stages.treeagg import merge_partials

    sel = corpus_curate(ds_docs, budget_frac=budget_frac).to_pandas()
    order = np.argsort(sel["doc_id"].to_numpy(np.int64))
    sel_ids = sel["doc_id"].to_numpy(np.int64)[order]
    sel_tok = sel["n_tokens"].to_numpy(np.int64)[order]
    ids_ref = ray.put(sel_ids)

    def keep_selected(b: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(ids, did)
        pos_c = np.clip(pos, 0, max(len(ids) - 1, 0))
        hit = (len(ids) > 0) & (ids[pos_c] == did)
        return b.filter(pa.array(hit))

    survivors = dedup_exact(
        ds_docs.map_batches(keep_selected, batch_format="pyarrow"))

    names = ["train", "val", "test"]
    cuts = []
    acc = 0
    for p in pcts:
        acc += p
        cuts.append(acc * 256 // 100)
    tok_ref = ray.put((sel_ids, sel_tok))

    def assign(b: pa.Table) -> pa.Table:
        ids, toks = ray.get(tok_ref)
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nt = toks[np.searchsorted(ids, did)]
        byte = [int(hashlib.md5(f"{seed}:{i}".encode())
                    .hexdigest()[:2], 16) for i in did]
        split = [names[0] if x < cuts[0]
                 else names[1] if x < cuts[1] else names[2]
                 for x in byte]
        df = pd.DataFrame({"split": split, "nt": nt})
        g = (df.groupby("split", sort=False)
             .agg(n_docs=("nt", "size"), sum_tokens=("nt", "sum"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    return merge_partials(
        survivors.map_batches(assign, batch_format="pyarrow"),
        ["split"], {"n_docs": "sum", "sum_tokens": "sum"}, mode="tree")


def boilerplate_stats(ds, min_docs: int = 3, text_col: str = "text",
                      id_col: str = "doc_id",
                      max_broadcast: int = 500_000,
                      decision_out: dict | None = None):
    """CCNet/RefinedWeb-style boilerplate detection: a sentence occurring
    in ≥ ``min_docs`` DISTINCT documents is boilerplate (nav bars, license
    footers, share buttons); report per doc how much text survives its
    removal.  Sentence semantics are sentence_dedup's ('. ' split, trailing
    periods stripped) so the two curation ops compose on one convention.

    Returns (doc_id, n_sents, n_boiler, kept_chars): total sentence
    occurrences, occurrences of boilerplate sentences, and the summed
    character length of the kept (non-boilerplate) occurrences.

    Scale shape, two tiers on the ONE uncertain cardinality (the boiler
    set):
    - document-frequency pass: per-batch per-doc-DISTINCT (sentence, 1)
      partials → cardinality-auto merge tree (string-keyed Ray groupby is
      pathological at tree-friendly sizes — memory/ray-groupby-vs-treeagg);
    - boiler set ≤ max_broadcast → ray.put a frozenset, one streaming
      map_batches over the docs computes all three stats in-batch (docs are
      row-atomic, no second shuffle at all);
    - larger boiler sets → sentence-keyed inner join of the occurrence
      partials against the boiler table, then a doc_id-keyed Sum merge
      unioned with batch-side per-doc totals (zero-filled columns instead
      of an outer join).

    Reference analog: none (engine addition per the round brief — web-scale
    curation needs boilerplate removal alongside sentence_dedup)."""
    import ray

    from deepkg_ray.stages.treeagg import merge_partials

    def _sents(text: str) -> list[str]:
        return [p.rstrip(".") for p in text.split(". ")]

    def df_partial(b: pa.Table) -> pd.DataFrame:
        rows_doc, rows_sent = [], []
        for d, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            for s in set(_sents(t)):
                rows_doc.append(d)
                rows_sent.append(s)
        df = pd.DataFrame({"sentence": rows_sent, "_doc": rows_doc})
        out = (df.groupby("sentence", as_index=False, sort=False)
               .agg(df=("_doc", "size")))
        out["df"] = out["df"].astype("int64")
        return out

    docfreq = merge_partials(
        ds.select_columns([id_col, text_col]).map_batches(
            df_partial, batch_format="pyarrow"),
        ["sentence"], {"df": "sum"}, mode="auto")
    boiler = docfreq.map_batches(
        lambda b: b.filter(pc.greater_equal(b["df"], pa.scalar(min_docs))),
        batch_format="pyarrow").materialize()
    n_boiler = boiler.count()

    if n_boiler <= max_broadcast:
        if decision_out is not None:
            decision_out.update({"mode": "broadcast", "n_boiler": n_boiler})
        bset = frozenset(
            s for blk in boiler.select_columns(["sentence"])
            .iter_batches(batch_format="pyarrow")
            for s in blk["sentence"].to_pylist())
        ref = ray.put(bset)

        class Probe:
            def __init__(self, ref):
                self.bset = ray.get(ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                ids, ns, nb, kc = [], [], [], []
                for d, t in zip(b[id_col].to_pylist(),
                                b[text_col].to_pylist()):
                    sents = _sents(t)
                    boil = [s in self.bset for s in sents]
                    ids.append(d)
                    ns.append(len(sents))
                    nb.append(sum(boil))
                    kc.append(sum(len(s) for s, x in zip(sents, boil)
                               if not x))
                return pa.table({
                    id_col: pa.array(ids, pa.int64()),
                    "n_sents": pa.array(ns, pa.int64()),
                    "n_boiler": pa.array(nb, pa.int64()),
                    "kept_chars": pa.array(kc, pa.int64())})

        from deepkg_ray.util import rows_all, stateful_map
        return stateful_map(ds.select_columns([id_col, text_col]), Probe,
                            {"ref": ref})

    # join tier: occurrence partials × boiler table, then doc-keyed sums
    if decision_out is not None:
        decision_out.update({"mode": "join", "n_boiler": n_boiler})

    def occ_partial(b: pa.Table) -> pd.DataFrame:
        rows = []
        for d, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            for s in _sents(t):
                rows.append((s, d, 1, len(s)))
        df = pd.DataFrame(rows, columns=["sentence", id_col, "occ", "chars"])
        out = (df.groupby(["sentence", id_col], as_index=False, sort=False)
               .agg(occ=("occ", "sum"), chars=("chars", "sum")))
        out["occ"] = out["occ"].astype("int64")
        out["chars"] = out["chars"].astype("int64")
        return out

    occ = ds.select_columns([id_col, text_col]).map_batches(
        occ_partial, batch_format="pyarrow")
    hit = occ.join(boiler.select_columns(["sentence"]), join_type="inner",
                   num_partitions=16, on=("sentence",))

    def tag_hits(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col],
            "n_sents": pa.array(np.zeros(len(b), np.int64)),
            "n_boiler": b["occ"],
            "boiler_chars": b["chars"],
            "total_chars": pa.array(np.zeros(len(b), np.int64))})

    def tag_totals(b: pa.Table) -> pa.Table:
        ids, ns, tc = [], [], []
        for d, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            sents = _sents(t)
            ids.append(d)
            ns.append(len(sents))
            tc.append(sum(len(s) for s in sents))
        z = np.zeros(len(ids), np.int64)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_sents": pa.array(ns, pa.int64()),
            "n_boiler": pa.array(z),
            "boiler_chars": pa.array(z),
            "total_chars": pa.array(tc, pa.int64())})

    tagged = (hit.map_batches(tag_hits, batch_format="pyarrow")
              .union(ds.select_columns([id_col, text_col]).map_batches(
                  tag_totals, batch_format="pyarrow")))
    merged = merge_partials(tagged, [id_col],
                            {"n_sents": "sum", "n_boiler": "sum",
                             "boiler_chars": "sum", "total_chars": "sum"},
                            mode="auto")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col],
            "n_sents": b["n_sents"],
            "n_boiler": b["n_boiler"],
            "kept_chars": pa.array(
                b["total_chars"].to_numpy() - b["boiler_chars"].to_numpy(),
                pa.int64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def neyman_allocation(ds, k: int = 1000, stratum_col: str = "source",
                      text_col: str = "text"):
    """Neyman-optimal stratified sampling allocation over document
    length: allocate a budget of ``k`` samples across strata
    proportionally to N_h·S_h (stratum size × within-stratum std of doc
    length, Neyman 1934) — the variance-minimizing sample design a
    curator uses instead of naive proportional allocation when strata
    have very different spreads.  Integer seats land via the largest-
    remainder method (floor + top fractional parts, ties → stratum asc).

    Shuffle shape: per-batch (stratum, n, Σlen, Σlen²) cells → tree
    merge (stratum-bounded); the seat assignment runs on the
    strata-sized driver table with ONE fixed double op chain per
    stratum, mirrored in SQL.  Returns (source, n_docs, std_len,
    weight, alloc)."""
    import ray.data as rd

    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.treeagg import merge_partials

    def cells(b: pa.Table) -> pa.Table:
        srcs = np.asarray(b[stratum_col].to_pylist(), object)
        ln = np.fromiter((len(t) for t in b[text_col].to_pylist()),
                         np.int64, count=b.num_rows)
        uniq, inv = np.unique(srcs, return_inverse=True)
        return pa.table({
            stratum_col: pa.array(uniq.tolist(), pa.string()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "s1": pa.array(np.bincount(inv, weights=ln)
                           .astype(np.int64)),
            "s2": pa.array(np.bincount(inv, weights=ln * ln)
                           .astype(np.int64))})

    m = merge_partials(
        ds.select_columns([stratum_col, text_col])
        .map_batches(cells, batch_format="pyarrow"),
        [stratum_col], {"n": "sum", "s1": "sum", "s2": "sum"},
        mode="tree").to_pandas().sort_values(stratum_col) \
        .reset_index(drop=True)

    n = m["n"].to_numpy(np.int64).astype(np.float64)
    s1 = m["s1"].to_numpy(np.int64).astype(np.float64)
    s2 = m["s2"].to_numpy(np.int64).astype(np.float64)
    # sample variance (n-1); single-doc strata contribute zero weight
    var = np.where(n > 1, (s2 - s1 * s1 / n) / (n - 1.0), 0.0)
    std = np.sqrt(np.maximum(var, 0.0))
    w = n * std
    tot = w.sum()
    share = np.where(tot > 0, w / tot, 0.0)
    exact = k * share
    base = np.floor(exact).astype(np.int64)
    rem = int(k - base.sum())
    frac = exact - base
    order = np.lexsort((m[stratum_col].to_numpy(object), -frac))
    alloc = base.copy()
    alloc[order[:rem]] += 1
    return rd.from_arrow(pa.table({
        stratum_col: pa.array(m[stratum_col].tolist(), pa.string()),
        "n_docs": pa.array(m["n"].to_numpy(np.int64), pa.int64()),
        "std_len": pa.array(round6(std), pa.float64()),
        "weight": pa.array(round6(w), pa.float64()),
        "alloc": pa.array(alloc, pa.int64())}))


def neyman_sample(ds, k: int = 1000, stratum_col: str = "source",
                  id_col: str = "doc_id", text_col: str = "text"):
    """EXECUTE the Neyman design: draw exactly the per-stratum seat
    counts that neyman_allocation assigns, deterministically (per
    stratum the alloc_h smallest md5 ranks, the stratified_exact_k
    order).  Two passes over the corpus — the moments pass and the
    sample scan; the quota table rides in the task closure
    (strata-bounded).  Returns (source, doc_id) rows, Σ = k exactly
    whenever every stratum holds at least its quota."""
    from deepkg_ray.functions.hashing import md5_lower64_batch

    plan = neyman_allocation(ds, k=k, stratum_col=stratum_col,
                             text_col=text_col).to_pandas()
    quota = dict(zip(plan[stratum_col].tolist(),
                     plan["alloc"].astype(int).tolist()))
    _SIGN = np.uint64(1 << 63)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({stratum_col: pd.Series([], dtype=object),
                                 id_col: pd.Series([], dtype=np.int64),
                                 "_rk": pd.Series([], dtype=np.int64)})
        ids = df[id_col].to_numpy(np.int64)
        rk = (md5_lower64_batch([str(int(x)) for x in ids])
              ^ _SIGN).view(np.int64)
        out = pd.DataFrame({stratum_col: df[stratum_col].to_numpy(),
                            id_col: ids, "_rk": rk})
        out = out.sort_values([stratum_col, "_rk", id_col],
                              kind="stable")
        keep = (out.groupby(stratum_col, sort=False).cumcount()
                < out[stratum_col].map(quota).fillna(0).to_numpy())
        return out.loc[keep]

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([stratum_col, "_rk", id_col], kind="stable")
        keep = (g.groupby(stratum_col, sort=False).cumcount()
                < g[stratum_col].map(quota).fillna(0).to_numpy())
        return g.loc[keep, [stratum_col, id_col]]

    return (ds.select_columns([stratum_col, id_col])
            .map_batches(partial, batch_format="pandas")
            .groupby(stratum_col)
            .map_groups(final, batch_format="pandas"))


def split_leakage_audit(ds, id_col: str = "doc_id",
                        text_col: str = "text",
                        pcts=(80, 10, 10), seed: int = 9):
    """Cross-split contamination audit: exact-duplicate documents that
    straddle the train/val/test assignment — the eval-integrity check
    every training-data export runs BEFORE shipping (a val doc whose
    exact text also sits in train makes the eval score a lie).  Split
    assignment is dataset_split_assign's md5-byte rule; content identity
    is md5(text) (the dedup_exact convention, so DuckDB reproduces both
    byte-for-byte).

    Plan: one map emits (content_hash, split) cells; the only shuffle is
    the content-hash groupby (bounded by distinct texts); per-hash split
    counts collapse to THREE pair cells (n_hashes, n_pairs =
    Σ n_a·n_b) merged by tree.  Returns (split_a, split_b, n_hashes,
    n_pairs)."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    from deepkg_ray.functions.hashing import content_md5_batch
    from deepkg_ray.stages.treeagg import merge_partials

    names = ["train", "val", "test"]
    cuts = []
    acc = 0
    for p in pcts:
        acc += p
        cuts.append(acc * 256 // 100)

    def cells(b: pa.Table) -> pd.DataFrame:
        ids = b[id_col].to_pylist()
        hs = content_md5_batch(b[text_col].to_pylist())
        byte = [int(hashlib.md5(f"{seed}:{i}".encode())
                    .hexdigest()[:2], 16) for i in ids]
        split = [names[0] if x < cuts[0]
                 else names[1] if x < cuts[1] else names[2]
                 for x in byte]
        g = (pd.DataFrame({"h": hs, "split": split})
             .groupby(["h", "split"], as_index=False).size()
             .rename(columns={"size": "c"}))
        g["c"] = g["c"].astype("int64")
        return g

    per_hash = merge_partials(
        ds.select_columns([id_col, text_col])
        .map_batches(cells, batch_format="pyarrow"),
        ["h", "split"], {"c": "sum"}, mode="shuffle")

    # a hash's split rows can land in different shuffle blocks — re-hash
    # them into coarse hash-complete partitions before pairing
    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b["h"].to_pylist())
        return b.append_column(
            "part", pa.array((h % np.uint64(64)).astype(np.int32)))

    def pair_cells(g: pd.DataFrame) -> pd.DataFrame:
        w = (g.pivot_table(index="h", columns="split", values="c",
                           aggfunc="sum", fill_value=0))
        for nme in names:
            if nme not in w.columns:
                w[nme] = 0
        rows = []
        for a, b2 in (("train", "val"), ("train", "test"),
                      ("val", "test")):
            na = w[a].to_numpy(np.int64)
            nb = w[b2].to_numpy(np.int64)
            both = (na > 0) & (nb > 0)
            rows.append((a, b2, int(both.sum()),
                         int((na[both] * nb[both]).sum())))
        return pd.DataFrame(rows, columns=["split_a", "split_b",
                                           "n_hashes", "n_pairs"]) \
            .astype({"n_hashes": "int64", "n_pairs": "int64"})

    return merge_partials(
        per_hash.map_batches(add_part, batch_format="pyarrow")
        .groupby("part").map_groups(
            lambda g: pair_cells(g.drop(columns=["part"])),
            batch_format="pandas"),
        ["split_a", "split_b"], {"n_hashes": "sum", "n_pairs": "sum"},
        mode="tree")


def near_dup_leakage_audit(ds, documents_path: str,
                           threshold: float = 0.8,
                           pcts=(80, 10, 10), seed: int = 9):
    """NEAR-duplicate cross-split contamination — the realistic leakage
    case exact hashing misses (a val doc that is a lightly-edited train
    doc still leaks the answer): MinHash-LSH verified pairs
    (dedup.minhash_dedup_pairs, Jaccard ≥ threshold) rolled up by the
    split pair of their endpoints (split order follows the fixed
    train<val<test name order, so (train,val) and (val,train) collapse).
    Same-split pairs report too — they are ordinary dups, the
    off-diagonal rows are the leaks.  Returns (split_a, split_b,
    n_pairs)."""
    import hashlib

    import pandas as pd

    from deepkg_ray.stages.dedup import minhash_dedup_pairs
    from deepkg_ray.stages.treeagg import merge_partials

    names = ["train", "val", "test"]
    rank = {n: i for i, n in enumerate(names)}
    cuts = []
    acc = 0
    for p in pcts:
        acc += p
        cuts.append(acc * 256 // 100)

    def split_of(ids):
        out = []
        for i in ids:
            x = int(hashlib.md5(f"{seed}:{i}".encode())
                    .hexdigest()[:2], 16)
            out.append(names[0] if x < cuts[0]
                       else names[1] if x < cuts[1] else names[2])
        return out

    pairs = minhash_dedup_pairs(ds, documents_path,
                                threshold=threshold,
                                hash_mode="parity")

    def cells(b: pa.Table) -> pd.DataFrame:
        sa = split_of(b["doc_a"].to_pylist())
        sb = split_of(b["doc_b"].to_pylist())
        lo = [a if rank[a] <= rank[b2] else b2
              for a, b2 in zip(sa, sb)]
        hi = [b2 if rank[a] <= rank[b2] else a
              for a, b2 in zip(sa, sb)]
        g = (pd.DataFrame({"split_a": lo, "split_b": hi})
             .groupby(["split_a", "split_b"], as_index=False).size()
             .rename(columns={"size": "n_pairs"}))
        g["n_pairs"] = g["n_pairs"].astype("int64")
        return g

    return merge_partials(
        pairs.map_batches(cells, batch_format="pyarrow"),
        ["split_a", "split_b"], {"n_pairs": "sum"}, mode="tree")


def quarantine_leaked_docs(ds, documents_path: str,
                           threshold: float = 0.8,
                           pcts=(80, 10, 10), seed: int = 9):
    """The REMEDIATION step after near_dup_leakage_audit: every val/test
    document that near-duplicates (Jaccard ≥ threshold) ANY train
    document, with its split and the count of train near-dups — the
    quarantine list an export job subtracts from the eval splits before
    shipping (leaving a leaked eval doc in place makes the benchmark
    score a lie; moving it to train is the standard fix).
    Returns (doc_id, split, n_train_dups)."""
    import hashlib

    import pandas as pd

    from deepkg_ray.stages.dedup import minhash_dedup_pairs
    from deepkg_ray.stages.treeagg import merge_partials

    names = ["train", "val", "test"]
    cuts = []
    acc = 0
    for p in pcts:
        acc += p
        cuts.append(acc * 256 // 100)

    def split_of(ids):
        out = []
        for i in ids:
            x = int(hashlib.md5(f"{seed}:{i}".encode())
                    .hexdigest()[:2], 16)
            out.append(names[0] if x < cuts[0]
                       else names[1] if x < cuts[1] else names[2])
        return out

    pairs = minhash_dedup_pairs(ds, documents_path,
                                threshold=threshold,
                                hash_mode="parity")

    def cells(b: pa.Table) -> pd.DataFrame:
        da = b["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        db = b["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        sa = np.asarray(split_of(da.tolist()), object)
        sb = np.asarray(split_of(db.tolist()), object)
        rows = []
        # eval side paired with a train side, either orientation
        for ev, tr, se in ((da, sb, sa), (db, sa, sb)):
            m = (se != "train") & (tr == "train")
            for d, s_ in zip(ev[m], se[m]):
                rows.append((int(d), s_, 1))
        g = (pd.DataFrame(rows, columns=["doc_id", "split",
                                         "n_train_dups"])
             .groupby(["doc_id", "split"], as_index=False).sum())
        g["n_train_dups"] = g["n_train_dups"].astype("int64")
        return g

    return merge_partials(
        pairs.map_batches(cells, batch_format="pyarrow"),
        ["doc_id", "split"], {"n_train_dups": "sum"}, mode="tree")


def shard_plan(ds, n_shards: int = 8, id_col: str = "doc_id"):
    """Rendezvous (highest-random-weight) shard assignment audit —
    the stable shard-map primitive behind resumable partitioned output:
    doc → argmax over shards of md5(shard ':' doc), so removing one shard
    remaps ONLY that shard's docs (minimal disruption, Thaler & Ravishankar
    1998).  The report proves it: per shard,

        (shard, n_docs, n_stable)

    where n_stable counts docs that keep their shard when shard
    n_shards−1 is dropped — equal to n_docs for every surviving shard by
    the HRW property, and 0 for the dropped one.  One streaming pass,
    n_shards hash evaluations per row, S-row partials."""
    import ray.data as rd

    from deepkg_ray.stages.sketches import _hash64
    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pd.DataFrame:
        ids = [str(v) for v in b[id_col].to_pylist()]
        if not ids:
            return pd.DataFrame({"shard": [], "n_docs": [], "n_stable": []})
        w = np.stack([_hash64([f"{s}:{i}" for i in ids])
                      for s in range(n_shards)])          # S × n
        full = w.argmax(axis=0)
        drop = w[:-1].argmax(axis=0) if n_shards > 1 else full
        d = pd.DataFrame({
            "shard": full.astype(np.int64),
            "stable": (full == drop).astype(np.int64)})
        g = d.groupby("shard", sort=False).agg(
            n_docs=("stable", "size"), n_stable=("stable", "sum"))
        return g.reset_index()

    merged = merge_partials(
        ds.select_columns([id_col]).map_batches(partial,
                                                batch_format="pyarrow"),
        ["shard"], {"n_docs": "sum", "n_stable": "sum"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("shard").reset_index(drop=True)
        return df[["shard", "n_docs", "n_stable"]].astype(
            {"shard": np.int64, "n_docs": np.int64, "n_stable": np.int64})

    return merged.map_batches(finish, batch_format="pandas",
                              batch_size=None)
