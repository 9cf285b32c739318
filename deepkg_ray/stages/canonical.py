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

import numpy as np
import pyarrow as pa

KEY_COLS = ["subj_id", "pred", "obj_id"]


def _partial_adjacency(batch: pa.Table) -> pa.Table:
    """Combiner: one row per (subj_id, pred, obj_id) per batch with a local
    count and a deterministic provenance exemplar (lexicographically first
    (conv_id, turn_idx)).  Only the 5 key/aggregate columns travel through
    the shuffle — the name/type columns are functionally dependent on the
    ids and are re-attached from the broadcast dictionary on the (tiny)
    final table."""
    import pyarrow.compute as pc
    from deepkg_ray.stages.treeagg import _merge_frame
    # single sortable provenance key so the global min stays a *real*
    # (conv_id, turn_idx) exemplar rather than field-wise minima; built
    # vectorized in Arrow before the pandas conversion
    src = pc.binary_join_element_wise(
        batch["conv_id"].combine_chunks(),
        pc.utf8_lpad(pc.cast(batch["turn_idx"].combine_chunks(), pa.string()),
                     8, "0"),
        ":")
    df = batch.select(KEY_COLS).to_pandas()
    df["src"] = src.to_pandas()
    df["cnt"] = 1
    grp = _merge_frame(df, KEY_COLS, {"cnt": "sum", "src": "min"})
    return pa.Table.from_pandas(grp, preserve_index=False)


def _attach_names(dictionary_path: str):
    """map_batches kernel factory: append subj/obj name+type columns from
    the (broadcast, dictionary-path-loaded) id→(name, type) map."""
    import pyarrow.parquet as pq
    t = pq.read_table(dictionary_path, columns=["entity_id", "name", "type"])
    id2name = dict(zip(t["entity_id"].to_pylist(), t["name"].to_pylist()))
    id2type = dict(zip(t["entity_id"].to_pylist(), t["type"].to_pylist()))

    def kernel(b: pa.Table) -> pa.Table:
        s_ids = b["subj_id"].to_pylist()
        o_ids = b["obj_id"].to_pylist()
        return (b.append_column("subj_name",
                                pa.array([id2name.get(i, "") for i in s_ids]))
                .append_column("subj_type",
                               pa.array([id2type.get(i, "") for i in s_ids]))
                .append_column("obj_name",
                               pa.array([id2name.get(i, "") for i in o_ids]))
                .append_column("obj_type",
                               pa.array([id2type.get(i, "") for i in o_ids])))
    return kernel


def aggregate_adjacency(linked_triples_ds, mode: str = "auto",
                        dictionary_path: str | None = None,
                        decision_out: dict | None = None):
    """linked triples Dataset → adjacency Dataset
    (subj_id, pred, obj_id, subj_name, subj_type, obj_name, obj_type,
    weight, src).

    weight = number of supporting extractions (the graph edge weight of
    SURVEY.md §1.3 adjacency output).

    mode='auto' (default): per-batch combiner, then treeagg picks tree vs
    shuffle from the OBSERVED level-1 key cardinality — high-cardinality
    edge sets route to the Ray groupby without caller intervention.
    mode='tree': force the repartition+merge tree (exact, ~5x faster than
    the sort shuffle when the distinct edge set is known dictionary-bounded
    — the flagship KG path passes this explicitly).  mode='shuffle': force
    Ray groupby (unbounded key spaces, the 100 TB path)."""
    if dictionary_path is None:
        # legacy path: carry names through the aggregation (works without a
        # dictionary artifact, e.g. for ad-hoc linked tables)
        import pyarrow.compute as pc
        from deepkg_ray.stages.treeagg import _merge_frame, merge_partials

        def partial_with_names(batch: pa.Table) -> pa.Table:
            src = pc.binary_join_element_wise(
                batch["conv_id"].combine_chunks(),
                pc.utf8_lpad(pc.cast(batch["turn_idx"].combine_chunks(),
                                     pa.string()), 8, "0"), ":")
            df = batch.select(KEY_COLS + ["subj_name", "subj_type",
                                          "obj_name", "obj_type"]).to_pandas()
            df["src"] = src.to_pandas()
            df["weight"] = 1
            return pa.Table.from_pandas(
                _merge_frame(df, KEY_COLS,
                             {"weight": "sum", "src": "min",
                              "subj_name": "first", "subj_type": "first",
                              "obj_name": "first", "obj_type": "first"}),
                preserve_index=False)

        partial = linked_triples_ds.map_batches(partial_with_names,
                                                batch_format="pyarrow",
                                                batch_size=65536)
        return merge_partials(partial, KEY_COLS,
                              {"weight": "sum", "src": "min",
                               "subj_name": "first", "subj_type": "first",
                               "obj_name": "first", "obj_type": "first"})

    from deepkg_ray.util import tiny_task_cpus
    tc = tiny_task_cpus()
    kw = {"num_cpus": tc} if tc else {}
    partial = linked_triples_ds.map_batches(_partial_adjacency,
                                            batch_format="pyarrow",
                                            batch_size=None, **kw)
    from deepkg_ray.stages.treeagg import merge_partials
    merged = merge_partials(
        partial.map_batches(lambda b: b.rename_columns(
            [c if c != "cnt" else "weight" for c in b.column_names]),
            batch_format="pyarrow", **kw),
        KEY_COLS, {"weight": "sum", "src": "min"}, mode=mode,
        decision_out=decision_out)
    return merged.map_batches(_attach_names(dictionary_path),
                              batch_format="pyarrow", **kw)


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
    from deepkg_ray.stages.treeagg import merge_partials
    # fanout=1 single-barrier fast path: the adjacency is dictionary-
    # bounded, so the exploded entity partials always fit one merge task
    return merge_partials(exploded, ["entity_id", "name", "type"],
                          {"degree": "sum"}, fanout=1)


def predicate_table(adjacency_ds):
    """Distinct predicates with edge/support counts — `predicates.parquet`."""
    def partial(b: pa.Table) -> pa.Table:
        df = b.select(["pred", "weight"]).to_pandas()
        g = df.groupby("pred", as_index=False).agg(
            n_edges=("weight", "size"), n_support=("weight", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)
    from deepkg_ray.stages.treeagg import merge_partials
    return merge_partials(
        adjacency_ds.map_batches(partial, batch_format="pyarrow"),
        ["pred"], {"n_edges": "sum", "n_support": "sum"}, fanout=1)


def kg_growth_curve(linked_triples_ds, transcripts_ds,
                    n_parts: int = 64):
    """KG growth curve: per calendar day, how many NEW canonical edges
    were first observed and the cumulative edge count — the
    construction-monitoring view of edge_spans (a knowledge graph whose
    growth flattens has saturated its source; one that spikes signals
    an ingest change).  Missing days fill with zero (the
    cusum_changepoint calendar-complete convention).

    Plan: edge_spans' distributed first-observation fold, then a
    (day, n_new) histogram combiner + tree merge (day-range-bounded)
    and one cumsum finish.  Returns (day_us, n_new, cum_edges)."""
    import pandas as pd

    from deepkg_ray.stages.treeagg import merge_partials

    spans = edge_spans(linked_triples_ds, transcripts_ds,
                       n_parts=n_parts)

    def hist(b: pa.Table) -> pa.Table:
        fd = b["first_us"].to_numpy(zero_copy_only=False) \
            // 86_400_000_000
        vals, cnts = np.unique(fd, return_counts=True)
        return pa.table({"day": pa.array(vals.astype(np.int64)),
                         "n_new": pa.array(cnts.astype(np.int64))})

    merged = merge_partials(
        spans.map_batches(hist, batch_format="pyarrow"),
        ["day"], {"n_new": "sum"}, mode="tree")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day", kind="stable")
        days = df["day"].to_numpy(np.int64)
        d0, d1 = int(days[0]), int(days[-1])
        D = d1 - d0 + 1
        full = np.zeros(D, np.int64)
        full[days - d0] = df["n_new"].to_numpy(np.int64)
        return pd.DataFrame({
            "day_us": np.arange(d0, d1 + 1, dtype=np.int64)
                      * 86_400_000_000,
            "n_new": full,
            "cum_edges": np.cumsum(full)})

    return merged.repartition(1).map_batches(finish,
                                             batch_format="pandas",
                                             batch_size=None)


def edge_spans(linked_triples_ds, transcripts_ds, n_parts: int = 64,
               mode: str = "auto"):
    """Temporal KG edges: (subj_id, pred, obj_id, weight, first_us,
    last_us) — each canonical edge annotated with the first/last event-time
    it was observed (temporal provenance; the validity-interval primitive
    of temporal KGs).

    Plan: both sides are hashed into ``n_parts`` conversation-complete
    coarse partitions (the convgroup.turn_latency plan) and merged with a
    vectorized pandas join INSIDE each partition — Ray's generic hash join
    (actor-pool shuffle) measured 38x slower on this shape at sf0.1
    (107 s vs 2.8 s), because a two-key equi-join of pre-aggregated rows
    needs co-location, not a general-purpose join operator.  Triples are
    pre-aggregated per (conv, turn, s, p, o) first, so the shuffle carries
    supporting TURNS, not extractions; per-partition (s, p, o) partials
    then flow through the standard tree/shuffle merge (min/max int64 µs +
    weight sum — associative, so partition boundaries are invisible)."""
    import pandas as pd

    from deepkg_ray.functions.hashing import stable_hash64_batch
    from deepkg_ray.stages.treeagg import merge_partials

    def tri_partial(b: pa.Table) -> pa.Table:
        df = b.select(["conv_id", "turn_idx"] + KEY_COLS).to_pandas()
        df["turn_idx"] = df["turn_idx"].astype("int64")
        g = (df.groupby(["conv_id", "turn_idx"] + KEY_COLS, as_index=False)
             .size().rename(columns={"size": "n"}))
        h = stable_hash64_batch(g["conv_id"].tolist())
        return pa.table({
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
            "conv_id": pa.array(g["conv_id"], pa.string()),
            "turn_idx": pa.array(g["turn_idx"].to_numpy(np.int64)),
            "subj_id": pa.array(g["subj_id"].to_numpy(np.int64)),
            "pred": pa.array(g["pred"], pa.string()),
            "obj_id": pa.array(g["obj_id"].to_numpy(np.int64)),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "ts_us": pa.array(np.full(len(g), -1, np.int64)),
        })

    def turn_ts(b: pa.Table) -> pa.Table:
        h = stable_hash64_batch(b["conv_id"].to_pylist())
        nr = b.num_rows
        return pa.table({
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
            "conv_id": b["conv_id"],
            "turn_idx": b["turn_idx"].combine_chunks().cast(pa.int64()),
            "subj_id": pa.array(np.zeros(nr, np.int64)),
            "pred": pa.array([""] * nr, pa.string()),
            "obj_id": pa.array(np.zeros(nr, np.int64)),
            "n": pa.array(np.zeros(nr, np.int64)),
            "ts_us": b["ts"].combine_chunks()
                      .cast(pa.timestamp("us")).cast(pa.int64()),
        })

    tri = linked_triples_ds.map_batches(tri_partial, batch_format="pyarrow")
    turns = transcripts_ds.map_batches(turn_ts, batch_format="pyarrow")

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        is_turn = g["n"] == 0
        tdf = g.loc[is_turn, ["conv_id", "turn_idx", "ts_us"]]
        xdf = g.loc[~is_turn].drop(columns=["ts_us", "part"])
        m = xdf.merge(tdf, on=["conv_id", "turn_idx"])
        out = (m.groupby(KEY_COLS, as_index=False)
               .agg(weight=("n", "sum"), first_us=("ts_us", "min"),
                    last_us=("ts_us", "max")))
        for c in ("weight", "first_us", "last_us"):
            out[c] = out[c].astype(np.int64)
        return out

    partials = tri.union(turns).groupby("part").map_groups(
        merge_part, batch_format="pandas")
    return merge_partials(partials, KEY_COLS,
                          {"weight": "sum", "first_us": "min",
                           "last_us": "max"}, mode=mode)


def predicate_cardinality(adjacency_ds):
    """Relation-cardinality induction per predicate over the canonical
    DISTINCT edge set: max out-fan (objects per subject) and in-fan
    (subjects per object) classify each predicate as 1:1 / 1:N / N:1 /
    M:N — the schema constraint KG-embedding losses (TransE's flaw with
    N-to-N relations, Bordes 2013) and entity-resolution rules both
    consult; schema_table's cardinality complement.

    Plan: adjacency rows are already one-per-canonical-edge, so the
    out-fan cells are (pred, subj) sizes (auto merge), folded to a
    pred-bounded max; same for in-fan; the classification runs once on
    the pred-dictionary table.  Returns (pred, n_edges, max_out,
    max_in, cardinality)."""
    import pandas as pd

    from deepkg_ray.stages.treeagg import merge_partials

    def fan_cells(key_col):
        def cells(b: pa.Table) -> pd.DataFrame:
            g = (pd.DataFrame({
                "pred": b["pred"].to_pylist(),
                "k": b[key_col].to_numpy(zero_copy_only=False)})
                .groupby(["pred", "k"], as_index=False).size()
                .rename(columns={"size": "c"}))
            g["c"] = g["c"].astype("int64")
            return g
        return cells

    edges = adjacency_ds.select_columns(["subj_id", "pred", "obj_id"])
    out_fan = merge_partials(
        merge_partials(edges.map_batches(fan_cells("subj_id"),
                                         batch_format="pyarrow"),
                       ["pred", "k"], {"c": "sum"}, mode="auto")
        .map_batches(lambda b: pa.table({
            "pred": b["pred"], "max_out": b["c"],
            "n_edges": b["c"]}), batch_format="pyarrow"),
        ["pred"], {"max_out": "max", "n_edges": "sum"})
    in_fan = merge_partials(
        merge_partials(edges.map_batches(fan_cells("obj_id"),
                                         batch_format="pyarrow"),
                       ["pred", "k"], {"c": "sum"}, mode="auto")
        .map_batches(lambda b: pa.table({
            "pred": b["pred"], "max_in": b["c"]}),
            batch_format="pyarrow"),
        ["pred"], {"max_in": "max"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        mo = df["max_out"].to_numpy(np.int64)
        mi = df["max_in"].to_numpy(np.int64)
        card = np.where(mo == 1, np.where(mi == 1, "1:1", "N:1"),
                        np.where(mi == 1, "1:N", "M:N"))
        return df.assign(cardinality=card)

    # both sides are pred-dictionary-sized: merge them on the driver
    # (the broadcast-table convention; never row-shaped)
    import ray.data as rd

    from deepkg_ray.util import rows_all
    a = pd.DataFrame(rows_all(out_fan))
    b = pd.DataFrame(rows_all(in_fan))
    m = a.merge(b, on="pred").sort_values("pred", kind="stable") \
        .reset_index(drop=True)
    m = finish(m)
    return rd.from_pandas(m[["pred", "n_edges", "max_out", "max_in",
                             "cardinality"]])


def schema_table(adjacency_ds):
    """Predicate signature induction over the canonical graph:
    (subj_type, pred, obj_type, n_edges, n_support) — the observed type
    signature of every predicate (ontology-induction signal; the
    reference's schema is declared up front in its YAML/record converters,
    this derives it from data).  Tiny aggregate over the already-canonical
    edge table — nothing row-shaped shuffles."""
    import pandas as pd

    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(["subj_type", "pred", "obj_type", "weight"]).to_pandas()
        g = (df.groupby(["subj_type", "pred", "obj_type"], as_index=False)
             .agg(n_edges=("weight", "size"), n_support=("weight", "sum")))
        g["n_edges"] = g["n_edges"].astype("int64")
        g["n_support"] = g["n_support"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    return merge_partials(
        adjacency_ds.map_batches(partial, batch_format="pyarrow"),
        ["subj_type", "pred", "obj_type"],
        {"n_edges": "sum", "n_support": "sum"}, fanout=1)


def edge_provenance(linked, mode: str = "auto"):
    """Provenance breadth per canonical edge: (subj_id, pred, obj_id,
    n_convs) = distinct conversations that evidence the edge — the
    trust/diversity signal an incremental KG ranks by alongside raw
    weight (one hot conversation repeating a claim ≠ many independent
    ones).  Two-level plan: per-batch distinct (edge, conv) cells made
    globally distinct by a cardinality-auto merge, then the count fold
    (rows per edge are summable after the distinct)."""
    import pandas as pd

    import numpy as np
    import pyarrow as pa

    from deepkg_ray.stages.treeagg import merge_partials

    def cells(b: pa.Table) -> pd.DataFrame:
        g = (pd.DataFrame({
            "subj_id": b["subj_id"].to_numpy(zero_copy_only=False),
            "pred": b["pred"].to_pylist(),
            "obj_id": b["obj_id"].to_numpy(zero_copy_only=False),
            "conv_id": b["conv_id"].to_pylist()})
            .drop_duplicates())
        g["one"] = np.ones(len(g), np.int64)
        return g

    distinct = merge_partials(
        linked.select_columns(["subj_id", "pred", "obj_id", "conv_id"])
        .map_batches(cells, batch_format="pyarrow"),
        ["subj_id", "pred", "obj_id", "conv_id"], {"one": "first"},
        mode=mode)

    def fold(b: pa.Table) -> pd.DataFrame:
        g = (pd.DataFrame({
            "subj_id": b["subj_id"].to_numpy(zero_copy_only=False),
            "pred": b["pred"].to_pylist(),
            "obj_id": b["obj_id"].to_numpy(zero_copy_only=False)})
            .groupby(["subj_id", "pred", "obj_id"], as_index=False)
            .size().rename(columns={"size": "n_convs"}))
        g["n_convs"] = g["n_convs"].astype("int64")
        return g

    return merge_partials(
        distinct.map_batches(fold, batch_format="pyarrow"),
        ["subj_id", "pred", "obj_id"], {"n_convs": "sum"}, mode=mode)
