"""Sequence packing for training-data preparation: concat-and-chunk
assignment of documents to fixed-size token windows (the GPT-pretraining
packing scheme — all docs concatenated in doc_id order with a separator
token, then chunked into ``window``-token packs).

The core primitive is a DISTRIBUTED EXCLUSIVE PREFIX SUM over the corpus in
id order — the classic two-phase scan:

  phase 1 (no shuffle): per-batch partial sums per contiguous id bucket
          (``bucket = doc_id // bucket_size``) → a bucket-count-bounded
          table folded on the driver into exclusive bucket offsets;
  phase 2 (one shuffle): groupby(bucket).map_groups — sort the bucket by
          doc_id, in-bucket cumsum + the bucket's offset.

At 100 TB nothing row-shaped ever reaches the driver: phase 1 ships one
row per (block, bucket) and the driver folds ``n_buckets`` integers;
``bucket_size`` bounds phase-2 group size (tune so a bucket's rows fit one
task).  Output is integer-exact, so the DuckDB window-function oracle
(``SUM(eff) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING ... 1
PRECEDING)``) reproduces it bit-for-bit.

Reference analog: the reference prepares training corpora driver-side
(e.g. UIE_torch/run_seq2struct_torch.py data collation); packing itself is
an engine addition per the round brief (training-data pipeline ops).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_WS_EMPTY_SAFE = r"\s+"


def _ws_token_counts(texts: pd.Series) -> np.ndarray:
    """Whitespace token counts matching the SQL oracle's
    len(string_split_regex(trim(text), '\\s+')) with ''→0."""
    import re
    stripped = texts.str.strip()
    return np.where(stripped.to_numpy() == "", 0,
                    stripped.str.count(_WS_EMPTY_SAFE, flags=re.ASCII)
                    .to_numpy(np.int64) + 1).astype(np.int64)


def pack_sequences(ds, *, window: int = 2048, sep_tokens: int = 1,
                   id_col: str = "doc_id", text_col: str = "text",
                   bucket_size: int = 1 << 16):
    """documents → (doc_id, n_tokens, token_start, pack_id, pack_offset,
    n_packs_spanned): each doc's placement in the concat-and-chunk token
    stream.  ``eff = n_tokens + sep_tokens`` (the separator/EOS the doc
    contributes); ``token_start`` is the exclusive prefix sum of eff in
    doc_id order; ``pack_id = token_start // window``; a doc straddling a
    chunk boundary spans ``n_packs_spanned`` consecutive packs."""
    import ray

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        n_tok = _ws_token_counts(df[text_col])
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            "n_tokens": n_tok,
            "eff": n_tok + np.int64(sep_tokens),
            "bucket": df[id_col].to_numpy(np.int64) // bucket_size,
        })

    with_eff = ds.select_columns([id_col, text_col]).map_batches(
        counts, batch_format="pandas")

    # phase 1: bucket partial sums (one row per (block, bucket) — tiny)
    def bucket_partials(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bucket", as_index=False)["eff"].sum()
        return g.rename(columns={"eff": "bucket_sum"})

    parts = with_eff.map_batches(bucket_partials, batch_format="pandas",
                                 batch_size=None).to_pandas()
    if len(parts) == 0:
        import ray.data as rd
        return rd.from_pandas(pd.DataFrame({
            id_col: pd.Series([], dtype=np.int64),
            "n_tokens": pd.Series([], dtype=np.int64),
            "token_start": pd.Series([], dtype=np.int64),
            "pack_id": pd.Series([], dtype=np.int64),
            "pack_offset": pd.Series([], dtype=np.int64),
            "n_packs_spanned": pd.Series([], dtype=np.int64)}))
    sums = (parts.groupby("bucket")["bucket_sum"].sum().sort_index())
    offsets = {int(b): int(v) for b, v in
               zip(sums.index, np.concatenate(([0], np.cumsum(
                   sums.to_numpy(np.int64))[:-1])))}
    offsets_ref = ray.put(offsets)
    w = int(window)

    # phase 2: in-bucket ordered cumsum + the bucket's global offset
    def place(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="stable")
        eff = df["eff"].to_numpy(np.int64)
        base = ray.get(offsets_ref)[int(df["bucket"].iloc[0])]
        start = base + np.concatenate(([0], np.cumsum(eff)[:-1]))
        pack_id = start // w
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            "n_tokens": df["n_tokens"].to_numpy(np.int64),
            "token_start": start,
            "pack_id": pack_id,
            "pack_offset": start % w,
            "n_packs_spanned": (start + eff - 1) // w - pack_id + 1})

    return with_eff.groupby("bucket").map_groups(place, batch_format="pandas")


def packing_stats(ds, *, window: int = 2048, sep_tokens: int = 1,
                  id_col: str = "doc_id", text_col: str = "text",
                  bucket_size: int = 1 << 16):
    """Corpus-level packing summary: (n_docs, total_tokens, n_packs,
    n_straddlers, last_fill) — derived from pack_sequences without a second
    pass (Sum/Max/Count aggregate over the placement table)."""
    placed = pack_sequences(ds, window=window, sep_tokens=sep_tokens,
                            id_col=id_col, text_col=text_col,
                            bucket_size=bucket_size)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"n_docs": pd.Series([], dtype=np.int64),
                                 "total_tokens": pd.Series([], dtype=np.int64),
                                 "n_straddlers": pd.Series([], dtype=np.int64)})
        end = (df["token_start"].to_numpy(np.int64)
               + df["n_tokens"].to_numpy(np.int64) + sep_tokens)
        return pd.DataFrame({
            "n_docs": [np.int64(len(df))],
            "total_tokens": [end.max()],
            "n_straddlers": [np.int64(
                (df["n_packs_spanned"].to_numpy(np.int64) > 1).sum())]})

    parts = placed.map_batches(partial, batch_format="pandas",
                               batch_size=None).to_pandas()
    total = int(parts["total_tokens"].max()) if len(parts) else 0
    n_packs = -(-total // window) if total else 0
    last_fill = (total - (n_packs - 1) * window) / window if n_packs else 0.0
    from deepkg_ray.functions.numeric import round6
    import ray.data as rd
    return rd.from_pandas(pd.DataFrame({
        "n_docs": [np.int64(parts["n_docs"].sum() if len(parts) else 0)],
        "total_tokens": [np.int64(total)],
        "n_packs": [np.int64(n_packs)],
        "n_straddlers": [np.int64(parts["n_straddlers"].sum()
                                  if len(parts) else 0)],
        "last_fill": [round6(last_fill)]}))


def global_shuffle_positions(ds, *, seed: int = 7, id_col: str = "doc_id",
                             n_buckets: int = 4096):
    """Deterministic global shuffle with MATERIALIZED positions: assign
    every row its rank under the permutation key md5_lower64(f"{seed}:{id}")
    (tie → smaller id).  Returns (doc_id, shuffle_pos) — the training-export
    order a sharded writer consumes, reproducible on any partitioning and
    resumable (re-running a shard recomputes identical positions, unlike
    random_shuffle whose order is an execution artifact).

    Distributed rank via the same two-phase scan as pack_sequences, with
    the md5 key's own uniformity providing the range partition: bucket =
    key's top bits (``n_buckets`` uniform ranges), per-bucket counts fold
    to exclusive offsets on the driver (n_buckets integers), one bucket
    groupby sorts in-bucket and adds the offset.  SQL oracle:
    ROW_NUMBER() OVER (ORDER BY md5_number_lower('seed:'||id), id) - 1."""
    import ray
    from deepkg_ray.functions.hashing import md5_lower64_batch

    shift = np.uint64(64 - int(n_buckets).bit_length() + 1)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        key = md5_lower64_batch([f"{seed}:{int(x)}" for x in ids])
        return pd.DataFrame({
            id_col: ids,
            # order-preserving signed shift (Arrow blocks degrade uint64)
            "_key": (key ^ np.uint64(1 << 63)).view(np.int64),
            "_bucket": (key >> shift).astype(np.int64)})

    with_key = ds.select_columns([id_col]).map_batches(
        keyed, batch_format="pandas")

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("_bucket", as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    parts = with_key.map_batches(bucket_counts, batch_format="pandas",
                                 batch_size=None).to_pandas()
    if len(parts) == 0:
        import ray.data as rd
        return rd.from_pandas(pd.DataFrame({
            id_col: pd.Series([], dtype=np.int64),
            "shuffle_pos": pd.Series([], dtype=np.int64)}))
    sums = parts.groupby("_bucket")["cnt"].sum().sort_index()
    offsets = {int(b): int(v) for b, v in
               zip(sums.index, np.concatenate(([0], np.cumsum(
                   sums.to_numpy(np.int64))[:-1])))}
    offsets_ref = ray.put(offsets)

    def place(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_key", id_col], kind="stable")
        base = ray.get(offsets_ref)[int(df["_bucket"].iloc[0])]
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            "shuffle_pos": base + np.arange(len(df), dtype=np.int64)})

    return with_key.groupby("_bucket").map_groups(place,
                                                  batch_format="pandas")



def pack_conversations(ds, *, window: int = 2048, sep_tokens: int = 1,
                       conv_col: str = "conv_id", text_col: str = "text",
                       bucket_chars: int = 9):
    """Conversation-boundary-respecting packing: each CONVERSATION is
    assigned whole to the pack where its token stream starts (pack_id =
    exclusive prefix sum of per-conv effective tokens, in conv_id order,
    // window) — dialogue training must never split a conversation
    across contexts, so packs stretch past the window rather than cut
    (the trainer pads/truncates; pack_sequences is the doc-level
    splitting variant).

    Plan: per-conv token totals (conv-bounded cardinality-auto merge),
    then the distributed ordered prefix via PREFIX BUCKETS of the
    conv_id string — a fixed-length string prefix respects
    lexicographic order, so per-(block, bucket) partial sums give the
    driver an exclusive carry per bucket (the pack_sequences two-phase
    scan lifted to string keys) and bucket-complete groups finish
    locally.  Returns (conv_id, n_tokens, token_start, pack_id)."""
    from deepkg_ray.stages.treeagg import merge_partials

    def conv_cells(df: pd.DataFrame) -> pd.DataFrame:
        n_tok = _ws_token_counts(df[text_col])
        g = (pd.DataFrame({conv_col: df[conv_col].to_numpy(object),
                           "n_tokens": n_tok})
             .groupby(conv_col, as_index=False).sum())
        g["n_tokens"] = g["n_tokens"].astype("int64")
        return g

    totals = merge_partials(
        ds.select_columns([conv_col, text_col]).map_batches(
            conv_cells, batch_format="pandas"),
        [conv_col], {"n_tokens": "sum"}, mode="auto").materialize()

    def add_bucket(b: pa.Table) -> pa.Table:
        bk = [c[:bucket_chars] for c in b[conv_col].to_pylist()]
        return b.append_column("bucket", pa.array(bk, pa.string()))

    with_bk = totals.map_batches(add_bucket, batch_format="pyarrow") \
        .materialize()

    # phase 1: per-bucket eff sums → driver exclusive carries (buckets
    # are lexicographically ordered because the prefix is)
    parts = with_bk.map_batches(
        lambda df: df.assign(eff=df["n_tokens"] + np.int64(sep_tokens))
        .groupby("bucket", as_index=False)["eff"].sum(),
        batch_format="pandas").to_pandas()
    agg = parts.groupby("bucket")["eff"].sum().sort_index()
    carry = {b: int(s) for b, s in
             zip(agg.index, np.concatenate([[0], agg.cumsum()
                                            .to_numpy()[:-1]]))}

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(conv_col, kind="stable")
        eff = g["n_tokens"].to_numpy(np.int64) + np.int64(sep_tokens)
        start = (carry[g["bucket"].iloc[0]]
                 + np.concatenate([[0], eff.cumsum()[:-1]]))
        return pd.DataFrame({
            conv_col: g[conv_col].to_numpy(object),
            "n_tokens": g["n_tokens"].to_numpy(np.int64),
            "token_start": start.astype(np.int64),
            "pack_id": (start // window).astype(np.int64)})

    return with_bk.groupby("bucket").map_groups(finish,
                                                batch_format="pandas")


def conv_packing_stats(ds, *, window: int = 2048, sep_tokens: int = 1,
                       conv_col: str = "conv_id", text_col: str = "text",
                       bucket_chars: int = 9):
    """Utilization summary of conversation packing: (n_convs, n_packs,
    n_oversized, total_tokens, mean_fill) where an OVERSIZED
    conversation exceeds the window by itself (it necessarily
    stretches its pack) and mean_fill = round6(total effective tokens / (n_packs ×
    window)) — the padding-waste metric a dialogue-training run
    budgets by.  One aggregate over pack_conversations."""
    from deepkg_ray.functions.numeric import round6
    placed = pack_conversations(ds, window=window,
                                sep_tokens=sep_tokens,
                                conv_col=conv_col, text_col=text_col,
                                bucket_chars=bucket_chars)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        nt = df["n_tokens"].to_numpy(np.int64)
        return pd.DataFrame({
            "n_convs": [np.int64(len(df))],
            "n_oversized": [np.int64(
                (nt + sep_tokens > window).sum())],
            "eff_tokens": [np.int64((nt + sep_tokens).sum())],
            "max_pack": [np.int64(df["pack_id"].max())
                         if len(df) else np.int64(-1)]})

    parts = placed.map_batches(partial, batch_format="pandas",
                               batch_size=None).to_pandas()
    n_convs = int(parts["n_convs"].sum())
    n_over = int(parts["n_oversized"].sum())
    eff = int(parts["eff_tokens"].sum())
    n_packs = int(parts["max_pack"].max()) + 1 if n_convs else 0
    fill = float(round6(np.asarray(
        [eff / (n_packs * window)]))[0]) if n_packs else 0.0
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "n_convs": pa.array([n_convs], pa.int64()),
        "n_packs": pa.array([n_packs], pa.int64()),
        "n_oversized": pa.array([n_over], pa.int64()),
        "total_tokens": pa.array([eff], pa.int64()),
        "mean_fill": pa.array([fill], pa.float64())}))


def conv_weighted_sample(ds, k: int = 50, seed: int = 11,
                         conv_col: str = "conv_id",
                         text_col: str = "text"):
    """Whole-conversation weighted sample WITHOUT replacement, inclusion
    probability rising with conversation length — eval-set construction
    that keeps dialogues intact (sampling turns would break coherence;
    sampling convs uniformly under-weights the long multi-turn sessions
    that dominate training tokens).  A-ES (Efraimidis–Spirakis) over
    per-conversation token totals: key = ln(u)/max(w, 1) with u the
    exact-dyadic md5 uniform of 'seed:conv_id' (weighted_sample_k's
    convention on the string key), top-k by (key desc, conv_id).

    Plan: per-batch conversation token partials → one conv-keyed Sum
    groupby (the only all-to-all) → per-block partial top-k → one
    ≤ k·blocks-row final merge.  Returns (conv_id, n_tokens, rank)."""
    from ray.data.aggregate import Sum

    from deepkg_ray.functions.hashing import md5_lower64_batch

    kk = int(k)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            conv_col: df[conv_col],
            "n_tokens": _ws_token_counts(df[text_col])})
        return d.groupby(conv_col, sort=False, as_index=False).sum()

    per_conv = (ds.select_columns([conv_col, text_col])
                .map_batches(counts, batch_format="pandas")
                .groupby(conv_col)
                .aggregate(Sum("n_tokens", alias_name="n_tokens")))

    def partial(b: pa.Table) -> pa.Table:
        ids = b[conv_col].to_pylist()
        w = b["n_tokens"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        if not ids:
            return pa.table({conv_col: pa.array([], pa.string()),
                             "n_tokens": pa.array([], pa.int64()),
                             "_key": pa.array([], pa.float64())})
        h = md5_lower64_batch([f"{seed}:{c}" for c in ids])
        u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) \
            / float(1 << 53)
        key = np.log(u) / np.maximum(w, 1.0)
        if len(ids) > kk:
            order = np.lexsort((np.asarray(ids, object), -key))[:kk]
            ids = [ids[i] for i in order]
            w, key = w[order], key[order]
        return pa.table({conv_col: pa.array(ids, pa.string()),
                         "n_tokens": pa.array(w.astype(np.int64)),
                         "_key": pa.array(key, pa.float64())})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_key", conv_col],
                            ascending=[False, True],
                            kind="stable").head(kk).reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[[conv_col, "n_tokens", "rank"]]

    return (per_conv.map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def length_bucketing(ds, *, text_col: str = "text"):
    """Serving-efficiency report for power-of-2 length-bucketed batching:
    each doc lands in the bucket 2^ceil(log2(n_tokens)) (computed via
    integer bit length — no float log), and the report shows how much
    padding that batching scheme wastes per bucket:

        (bucket, n_docs, total_tokens, total_padding, fill)

    fill = round6(total_tokens / (n_docs · bucket)).  One streaming pass;
    per-batch (bucket → count, token-sum) partials fold through the merge
    tree (≤ ~40 buckets exist for any corpus)."""
    import ray.data as rd

    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pd.DataFrame:
        n = _ws_token_counts(b[text_col].to_pandas())
        bucket = np.asarray(
            [1 if x <= 1 else 1 << int(x - 1).bit_length() for x in n],
            np.int64)
        d = pd.DataFrame({"bucket": bucket, "n": n.astype(np.int64)})
        g = d.groupby("bucket", sort=False).agg(
            n_docs=("n", "size"), total_tokens=("n", "sum"))
        return g.reset_index()

    merged = merge_partials(
        ds.select_columns([text_col]).map_batches(partial,
                                                  batch_format="pyarrow"),
        ["bucket"], {"n_docs": "sum", "total_tokens": "sum"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("bucket").reset_index(drop=True)
        cap = df["bucket"].to_numpy(np.int64) * df["n_docs"].to_numpy(np.int64)
        df["total_padding"] = cap - df["total_tokens"].to_numpy(np.int64)
        df["fill"] = [round6(t / c) if c else 0.0
                      for t, c in zip(df["total_tokens"], cap)]
        return df[["bucket", "n_docs", "total_tokens", "total_padding",
                   "fill"]]

    return merged.map_batches(finish, batch_format="pandas",
                              batch_size=None)
