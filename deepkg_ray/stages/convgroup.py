"""Conversation-aware grouping with salted-key skew mitigation.

The transcript table has hot conversations (1000× median turns —
FIXTURES.md §1).  Any per-conversation grouped computation
(`groupby("conv_id")`) puts a whole conversation in one task; a hot
conversation becomes a straggler.  Mitigation (SURVEY.md §7.4 / north_rule
"salted-key skew handling"):

1. **Salted two-level aggregation** — group on
   ``(conv_id, salt = turn_idx // K)`` first (bounded group size), then
   merge the per-salt partials per conversation.  Works whenever the
   per-conversation computation is decomposable (counts, sums, windows with
   bounded overlap).

2. **Ordered per-conversation processing** — when the computation needs the
   full ordered conversation (context windows), sort within the salted
   group and carry boundary rows between adjacent salt blocks.

This module implements (1) generically and provides conversation context
windows via (2) with a one-turn overlap carry.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Max, Min, Sum


def add_salt(ds, *, turns_per_salt: int = 256, conv_col: str = "conv_id",
             turn_col: str = "turn_idx"):
    """Append ``salt = turn_idx // K`` — the sub-conversation bucket key."""
    def kernel(b: pa.Table) -> pa.Table:
        salt = pc.divide(b[turn_col].combine_chunks().cast(pa.int64()),
                         turns_per_salt)
        return b.append_column("salt", salt.cast(pa.int32()))
    return ds.map_batches(kernel, batch_format="pyarrow")


def salted_conv_stats(ds, *, turns_per_salt: int = 256):
    """Per-conversation turn counts / char sums via salted two-level
    aggregation: level 1 groups on (conv_id, salt) — no group exceeds
    turns_per_salt rows regardless of conversation size — level 2 merges
    the (tiny) per-salt partials."""
    def kernel(b: pa.Table) -> pa.Table:
        salt = pc.divide(b["turn_idx"].combine_chunks().cast(pa.int64()),
                         turns_per_salt)
        return pa.table({
            "conv_id": b["conv_id"],
            "salt": salt.cast(pa.int32()),
            "chars": pc.utf8_length(b["text"].combine_chunks()).cast(pa.int64()),
            "turn_idx": b["turn_idx"].combine_chunks().cast(pa.int64()),
        })

    lv1 = (ds.map_batches(kernel, batch_format="pyarrow")
           .groupby(["conv_id", "salt"])
           .aggregate(Sum("chars", alias_name="chars"),
                      Min("turn_idx", alias_name="min_turn"),
                      Max("turn_idx", alias_name="max_turn")))

    def count_col(b: pa.Table) -> pa.Table:
        n = pc.add(pc.subtract(b["max_turn"].combine_chunks(),
                               b["min_turn"].combine_chunks()), 1)
        return (b.append_column("n_turns", n.cast(pa.int64()))
                .drop_columns(["min_turn", "max_turn"]))

    lv2 = (lv1.map_batches(count_col, batch_format="pyarrow")
           .groupby("conv_id")
           .aggregate(Sum("chars", alias_name="n_chars"),
                      Sum("n_turns", alias_name="n_turns"),
                      Max("salt", alias_name="n_salt_blocks")))

    def fix_blocks(b: pa.Table) -> pa.Table:
        blocks = pc.add(b["n_salt_blocks"].combine_chunks(), 1)
        return b.set_column(b.schema.get_field_index("n_salt_blocks"),
                            "n_salt_blocks", blocks.cast(pa.int32()))
    return lv2.map_batches(fix_blocks, batch_format="pyarrow")


def conv_context_windows(ds, *, window: int = 2, turns_per_salt: int = 256):
    """Per-turn context: concat of the previous `window` turns' text within
    the conversation, computed per salted block with a `window`-turn overlap
    carry so block boundaries don't lose context.  Ordered processing inside
    the group (sort by turn_idx), never relying on block arrival order.

    Returns (conv_id, turn_idx, context) where context joins the previous
    `window` turn texts with " | "."""
    assert window < turns_per_salt

    def kernel(b: pa.Table) -> pa.Table:
        turn = b["turn_idx"].combine_chunks().cast(pa.int64())
        salt = pc.divide(turn, turns_per_salt)
        base = pa.table({"conv_id": b["conv_id"], "turn_idx": turn,
                         "text": b["text"], "salt": salt.cast(pa.int32()),
                         "carry": pa.array(np.zeros(b.num_rows, np.bool_))})
        # overlap carry: the last `window` turns of each block are ALSO sent
        # to the next block (carry=True rows provide context only)
        nxt_mask = pc.greater_equal(
            pc.add(turn, window),
            pc.multiply(pc.add(salt, 1), turns_per_salt))
        carry_rows = base.filter(nxt_mask)
        if carry_rows.num_rows:
            carry_rows = (carry_rows
                          .set_column(3, "salt",
                                      pc.add(carry_rows["salt"].combine_chunks(), 1).cast(pa.int32()))
                          .set_column(4, "carry",
                                      pa.array(np.ones(carry_rows.num_rows, np.bool_))))
            base = pa.concat_tables([base, carry_rows])
        return base

    salted = ds.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
        kernel, batch_format="pyarrow")

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["turn_idx", "carry"], kind="stable")
        g = g.drop_duplicates("turn_idx", keep="first")
        texts = g["text"].tolist()
        turns = g["turn_idx"].tolist()
        carry = g["carry"].tolist()
        ctx = []
        for i in range(len(g)):
            prev = [texts[j] for j in range(max(0, i - window), i)]
            ctx.append(" | ".join(prev))
        out = pd.DataFrame({"conv_id": g["conv_id"].tolist(),
                            "turn_idx": np.asarray(turns, np.int64),
                            "context": ctx,
                            "carry": carry})
        return out[~out["carry"]].drop(columns=["carry"])

    return salted.groupby(["conv_id", "salt"]).map_groups(
        per_block, batch_format="pandas")


def turn_latency(ds, *, n_parts: int = 64):
    """Role-transition latency stats over the transcript table:
    for every adjacent turn pair within a conversation (turn order, the
    SQL lag() adjacency), emit (from_role, to_role) with the timestamp
    delta in integer microseconds; aggregate to
    (from_role, to_role, n, total_us, avg_us).

    Shuffle shape: the transition kernel is a vectorized O(n log n)
    sort+diff, so hot conversations need co-location, NOT salting — rows
    are hashed into ``n_parts`` conversation-complete coarse partitions
    (one groupby over ~n_parts groups, each processed with one vectorized
    pandas pass); a whole hot conversation in one task is cheap here,
    unlike the per-turn text ops that motivate the salted tier above.
    avg_us = floor(total/n + 0.5) evaluated identically in SQL."""
    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b["conv_id"].to_pylist())
        us = b["ts"].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({
            "conv_id": b["conv_id"],
            "turn_idx": b["turn_idx"].combine_chunks().cast(pa.int64()),
            "role": b["role"], "us": us,
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
        })

    parted = ds.select_columns(["conv_id", "turn_idx", "role", "ts"]) \
        .map_batches(add_part, batch_format="pyarrow")

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        same = g["conv_id"].to_numpy()[1:] == g["conv_id"].to_numpy()[:-1]
        roles = g["role"].to_numpy()
        us = g["us"].to_numpy(dtype=np.int64)
        if len(g) < 2 or not same.any():
            return pd.DataFrame({"from_role": [], "to_role": [],
                                 "n": [], "total_us": []})
        d = pd.DataFrame({"from_role": roles[:-1][same],
                          "to_role": roles[1:][same],
                          "delta": (us[1:] - us[:-1])[same]})
        return (d.groupby(["from_role", "to_role"], sort=False)
                .agg(n=("delta", "size"), total_us=("delta", "sum"))
                .reset_index())

    from deepkg_ray.stages.treeagg import merge_partials
    merged = merge_partials(
        parted.groupby("part").map_groups(per_partition,
                                          batch_format="pandas"),
        ["from_role", "to_role"], {"n": "sum", "total_us": "sum"}, fanout=1)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n"] = df["n"].astype(np.int64)
        df["total_us"] = df["total_us"].astype(np.int64)
        df["avg_us"] = np.floor(df["total_us"].to_numpy(np.float64)
                                / df["n"].to_numpy(np.float64)
                                + 0.5).astype(np.int64)
        return df
    return merged.map_batches(finish, batch_format="pandas")


def context_budget_report(ds, limit: int = 2048):
    """Context-window budget report: how much of the transcript corpus
    fits a ``limit``-token context whole — n_convs, the fit/truncate
    split, total and over-budget token mass — the sizing answer a
    fine-tuning run needs before choosing max_seq_len (sequence_packing
    packs what this counts).  Tokens are whitespace tokens summed per
    conversation (associative ⇒ per-batch combiner + merge, no
    conversation co-location needed).  Returns one row (n_convs, n_fit,
    n_trunc, fit_share, total_tokens, overflow_tokens)."""
    import pandas as pd

    from deepkg_ray.stages.treeagg import merge_partials

    ws = re.compile(r"\s+")

    def partial(b: pa.Table) -> pd.DataFrame:
        texts = b["text"].to_pylist()
        n = np.empty(len(texts), np.int64)
        for i, t in enumerate(texts):
            tl = t.strip()
            n[i] = len(ws.split(tl)) if tl else 0
        g = (pd.DataFrame({"conv_id": b["conv_id"].to_pylist(),
                           "tok": n})
             .groupby("conv_id", as_index=False).sum())
        g["tok"] = g["tok"].astype("int64")
        return g

    per_conv = merge_partials(
        ds.select_columns(["conv_id", "text"]).map_batches(
            partial, batch_format="pyarrow"),
        ["conv_id"], {"tok": "sum"}, mode="auto")

    def cells(b: pa.Table) -> pa.Table:
        tok = b["tok"].to_numpy(zero_copy_only=False)
        fit = tok <= limit
        return pa.table({
            "n_convs": pa.array([len(tok)], pa.int64()),
            "n_fit": pa.array([int(fit.sum())], pa.int64()),
            "total_tokens": pa.array([int(tok.sum())], pa.int64()),
            "overflow_tokens": pa.array(
                [int((tok[~fit] - limit).sum())], pa.int64())})

    merged = merge_partials(
        per_conv.map_batches(cells, batch_format="pyarrow")
        .map_batches(lambda b: b.append_column(
            "k", pa.array(np.zeros(b.num_rows, np.int64))),
            batch_format="pyarrow"),
        ["k"], {"n_convs": "sum", "n_fit": "sum", "total_tokens": "sum",
                "overflow_tokens": "sum"}, mode="tree")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        nc = int(df["n_convs"].iloc[0])
        nf = int(df["n_fit"].iloc[0])
        return pd.DataFrame({
            "n_convs": pd.array([nc], dtype="int64"),
            "n_fit": pd.array([nf], dtype="int64"),
            "n_trunc": pd.array([nc - nf], dtype="int64"),
            "fit_share": [float(np.floor(nf / nc * 1e6 + 0.5) / 1e6)
                          if nc else 0.0],
            "total_tokens": pd.array([int(df["total_tokens"].iloc[0])],
                                     dtype="int64"),
            "overflow_tokens": pd.array(
                [int(df["overflow_tokens"].iloc[0])], dtype="int64")})

    return merged.map_batches(finish, batch_format="pandas",
                              batch_size=None)


def conv_turn_taking(ds, *, n_parts: int = 64):
    """Per-conversation turn-taking profile: how often adjacent turns
    switch speaker role — alternation rate 1.0 is a clean dialogue,
    low rates flag monologues / repeated-role runs (a transcript-
    quality signal next to conv_sessions and turn_latency).  Only
    conversations with ≥ 2 turns emit (the adjacency is undefined
    otherwise, matching the SQL lag() filter).

    turn_latency's plan: conversation-complete coarse partitions, one
    vectorized sort+shift pass each; alt_rate = round6(n_alt / n_adj).
    Returns (conv_id, n_turns, n_alt, alt_rate)."""
    from deepkg_ray.functions.numeric import round6  # noqa: F401 (doc)

    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b["conv_id"].to_pylist())
        return pa.table({
            "conv_id": b["conv_id"],
            "turn_idx": b["turn_idx"].combine_chunks().cast(pa.int64()),
            "role": b["role"],
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        conv = g["conv_id"].to_numpy()
        roles = g["role"].to_numpy()
        n = len(g)
        if n < 2:
            return pd.DataFrame({
                "conv_id": [], "n_turns": pd.array([], dtype="int64"),
                "n_alt": pd.array([], dtype="int64"),
                "alt_rate": pd.array([], dtype="float64")})
        same = conv[1:] == conv[:-1]
        alt = (roles[1:] != roles[:-1]) & same
        d = pd.DataFrame({"conv_id": conv,
                          "adj": np.concatenate(([False], same)),
                          "alt": np.concatenate(([False], alt))})
        out = (d.groupby("conv_id", as_index=False)
               .agg(n_turns=("adj", "size"), n_adj=("adj", "sum"),
                    n_alt=("alt", "sum")))
        out = out[out["n_adj"] > 0]
        na = out["n_adj"].to_numpy(np.int64)
        nl = out["n_alt"].to_numpy(np.int64)
        return pd.DataFrame({
            "conv_id": out["conv_id"].to_numpy(),
            "n_turns": out["n_turns"].to_numpy(np.int64),
            "n_alt": nl,
            "alt_rate": np.floor(nl / na.astype(np.float64)
                                 * 1e6 + 0.5) / 1e6})

    parted = ds.select_columns(["conv_id", "turn_idx", "role"]) \
        .map_batches(add_part, batch_format="pyarrow")
    return parted.groupby("part").map_groups(per_partition,
                                             batch_format="pandas")


def tool_usage(ds):
    """Per (role, tool) usage stats over tool-bearing turns: turn count and
    DISTINCT conversations — two-level aggregation (per (role, tool,
    conv_id) partial first) so the wide shuffle only moves pre-aggregated
    rows and the distinct-count never materializes a conversation set."""
    from ray.data.aggregate import Count, Sum

    def keep_tools(b: pa.Table) -> pa.Table:
        return b.filter(pc.not_equal(b["tool"], pa.scalar("")))

    lv1 = (ds.select_columns(["conv_id", "role", "tool"])
           .map_batches(keep_tools, batch_format="pyarrow")
           .groupby(["role", "tool", "conv_id"])
           .aggregate(Count(alias_name="n")))
    return (lv1.groupby(["role", "tool"])
            .aggregate(Sum("n", alias_name="n_turns"),
                       Count(alias_name="n_convs")))


def conv_sessions(ds, gap_sec: int = 1800, n_parts: int = 64):
    """Conversation session segmentation over the TRANSCRIPT table:
    a session = maximal run of turns with inter-turn gap ≤ gap_sec
    (the transcript-native twin of windows.sessionize — long-running agent
    conversations fragment into work sessions; session count and span are
    per-conversation curation signals).

    Plan: conversation-complete coarse hash partitions (the turn_latency
    shape), one vectorized sort+diff pass per partition.  Returns
    (conv_id, n_turns, n_sessions, span_us)."""
    gap_us = gap_sec * 1_000_000

    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b["conv_id"].to_pylist())
        return pa.table({
            "conv_id": b["conv_id"],
            "turn_idx": b["turn_idx"].combine_chunks().cast(pa.int64()),
            "us": b["ts"].combine_chunks()
                   .cast(pa.timestamp("us")).cast(pa.int64()),
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        conv = g["conv_id"].to_numpy()
        us = g["us"].to_numpy(np.int64)
        same = np.concatenate(([False], conv[1:] == conv[:-1]))
        gap = np.concatenate(([0], us[1:] - us[:-1]))
        new_session = (~same) | (gap > gap_us)
        df = pd.DataFrame({"conv_id": conv, "us": us,
                           "ns": new_session.astype(np.int64)})
        out = (df.groupby("conv_id", sort=False)
               .agg(n_turns=("us", "size"), n_sessions=("ns", "sum"),
                    first_us=("us", "min"), last_us=("us", "max"))
               .reset_index())
        out["span_us"] = (out["last_us"] - out["first_us"]).astype(np.int64)
        out["n_turns"] = out["n_turns"].astype(np.int64)
        out["n_sessions"] = out["n_sessions"].astype(np.int64)
        return out[["conv_id", "n_turns", "n_sessions", "span_us"]]

    parted = ds.select_columns(["conv_id", "turn_idx", "ts"]).map_batches(
        add_part, batch_format="pyarrow")
    return parted.groupby("part").map_groups(per_partition,
                                             batch_format="pandas")


def conv_transcripts(ds, sep: str = "\n", conv_col: str = "conv_id",
                     order_col: str = "turn_idx", text_col: str = "text"):
    """Ordered collect: one document per conversation — turns sorted by
    ``order_col`` and joined with ``sep`` (SQL
    string_agg(text, sep ORDER BY turn_idx)).  The document-assembly step
    of an LLM training-data pipeline: groupby co-locates each
    conversation, the group fn is one pandas sort + str join.
    Partitioning assumption: one conversation fits a task (same contract
    as every conv_* op; salt via convgroup.add_salt for hot
    conversations).  Returns (conv_id, n_turns, transcript)."""
    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, kind="stable")
        return pd.DataFrame({
            conv_col: [g[conv_col].iloc[0]],
            "n_turns": np.array([len(g)], np.int64),
            "transcript": [sep.join(g[text_col].astype(str))],
        })

    return (ds.select_columns([conv_col, order_col, text_col])
            .groupby(conv_col).map_groups(per_conv, batch_format="pandas"))
