"""Canonicalization, triple dedup, and graph aggregation.

Semantics from the reference's cross-instance annotation union
(UIE_torch/process_data.py:506-556): group records by the relation key
``(type, arg0, arg1)`` (process_data.py:517-527) and keep one — here the key
is the canonical ``(subj_id, pred, obj_id)`` after linking, so alias
variants of the same fact collapse (the Normalization module's purpose,
SURVEY.md §2.7 "near-dup / fuzzy dedup").

Scale design: a bare groupby would shuffle every extracted triple.  Instead
each batch is **pre-aggregated** (combiner) to one row per distinct key per
batch, and only those partials enter the global groupby-sum — the classic
partial/final aggregate split (SURVEY.md §2.5 n-gram pattern).  Provenance
is kept as per-key counts plus a bounded first-seen (conv_id, turn_idx)
exemplar, not an unbounded list.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data.aggregate import Count, Min, Sum

KEY_COLS = ["subj_id", "pred", "obj_id"]


def _partial_adjacency(batch: pa.Table) -> pa.Table:
    """Combiner: one row per (subj_id, pred, obj_id) per batch with a local
    count and a deterministic provenance exemplar (lexicographically first
    (conv_id, turn_idx))."""
    cols = KEY_COLS + ["subj_name", "subj_type", "obj_name", "obj_type",
                       "conv_id", "turn_idx"]
    df = batch.select(cols).to_pandas()
    # single sortable provenance key so the global Min() stays a *real*
    # (conv_id, turn_idx) exemplar rather than field-wise minima
    df["src"] = df["conv_id"] + ":" + df["turn_idx"].astype(int).astype(str).str.zfill(8)
    grp = (df.groupby(KEY_COLS, as_index=False)
             .agg(subj_name=("subj_name", "first"),
                  subj_type=("subj_type", "first"),
                  obj_name=("obj_name", "first"),
                  obj_type=("obj_type", "first"),
                  src=("src", "min"),
                  cnt=("pred", "size")))
    return pa.Table.from_pandas(grp, preserve_index=False)


def aggregate_adjacency(linked_triples_ds):
    """linked triples Dataset → adjacency Dataset
    (subj_id, pred, obj_id, subj_name, subj_type, obj_name, obj_type,
    weight, src_conv, src_turn).

    weight = number of supporting extractions (the graph edge weight of
    SURVEY.md §1.3 adjacency output)."""
    partial = linked_triples_ds.map_batches(_partial_adjacency,
                                            batch_format="pyarrow",
                                            batch_size=16384)
    agg = (partial
           .groupby(KEY_COLS)
           .aggregate(Sum("cnt", alias_name="weight"),
                      Min("src", alias_name="src"),
                      Min("subj_name", alias_name="subj_name"),
                      Min("subj_type", alias_name="subj_type"),
                      Min("obj_name", alias_name="obj_name"),
                      Min("obj_type", alias_name="obj_type")))
    return agg


def dedup_triples(linked_triples_ds):
    """Global exact dedup of (subj_id, pred, obj_id) — the canonical triple
    set.  Same combiner trick; result keeps names/types for readability."""
    adj = aggregate_adjacency(linked_triples_ds)
    return adj.drop_columns(["src"])


def entity_table(adjacency_ds):
    """Distinct entities participating in the graph, with degree counts —
    the `entities.parquet` dictionary side output (SURVEY.md §1.3)."""
    def explode(batch: pa.Table) -> pa.Table:
        out = {
            "entity_id": pa.concat_arrays([
                batch["subj_id"].combine_chunks().cast(pa.int64()),
                batch["obj_id"].combine_chunks().cast(pa.int64())]),
            "name": pa.concat_arrays([
                batch["subj_name"].combine_chunks(),
                batch["obj_name"].combine_chunks()]),
            "type": pa.concat_arrays([
                batch["subj_type"].combine_chunks(),
                batch["obj_type"].combine_chunks()]),
            "degree": pa.concat_arrays([
                batch["weight"].combine_chunks().cast(pa.int64()),
                batch["weight"].combine_chunks().cast(pa.int64())]),
        }
        return pa.table(out)
    exploded = adjacency_ds.map_batches(explode, batch_format="pyarrow")
    return (exploded.groupby(["entity_id", "name", "type"])
            .aggregate(Sum("degree", alias_name="degree")))


def predicate_table(adjacency_ds):
    """Distinct predicates with edge/support counts — `predicates.parquet`."""
    return (adjacency_ds.groupby("pred")
            .aggregate(Count(alias_name="n_edges"),
                       Sum("weight", alias_name="n_support")))
