"""The flagship KG-construction pipeline (SURVEY.md §7.1):

    transcripts.parquet
      → read_parquet (pruned columns)
      → [A] normalize          (stateless map_batches, Arrow)
      → [B] mention detection  (DictionaryMentionDetector, worker-cached
            task pool by default / actor pool on request)               — mentions table
      → [C] relation extraction (RelationExtractor, same execution)     — surface triples
      → [D] entity linking      (ExactLinker, broadcast dictionary;
            fused into [C] on the flagship path)                        — linked triples
      → [E] canonical dedup     (partial-agg + groupby on (subj_id,pred,obj_id))
      → [F] materialize         adjacency / entities / predicates parquet

The whole thing is lazy: nothing materializes until the caller consumes
(write_parquet / to_pandas on the small aggregate outputs).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from deepkg_ray import synth
from deepkg_ray.functions.textnorm import add_text_norm
from deepkg_ray.sources.readers import read_transcripts
from deepkg_ray.stages.canonical import (aggregate_adjacency, entity_table,
                                         predicate_table)
from deepkg_ray.stages.linking import link_triples
from deepkg_ray.stages.mention import detect_mentions
from deepkg_ray.stages.relation import extract_triples


def transcripts_with_norm(sf_dir: str, *, repeat: int = 1,
                          columns: list[str] | None = None):
    """repeat>1 re-reads the shard list N times — used by the scaling bench
    to measure steady-state throughput on a workload large enough that
    fixed startup costs don't dominate.  columns widens the default
    read pruning (e.g. + ts for the temporal operators)."""
    import glob
    from deepkg_ray.util import tiny_task_cpus
    path = synth.transcripts_path(sf_dir)
    files = sorted(glob.glob(f"{path}/*.parquet")) or [path]
    tc = tiny_task_cpus()
    ds = read_transcripts(files * repeat if repeat > 1 else path,
                          columns=columns, num_cpus=tc)
    # batch_size=None → whole read blocks pass through as single batches;
    # mismatched batch sizes between fused stages make Ray Data re-slice
    # and rebuild (copy) every batch boundary — measured 3-4x overhead on
    # the hot chain at 32 CPUs vs whole-block batches
    return ds.map_batches(add_text_norm, batch_format="pyarrow", batch_size=None,
                          **({"num_cpus": tc} if tc else {}))


def mentions_dataset(sf_dir: str, *, concurrency=None):
    """transcripts → typed mention spans (inclusive end), analog of the
    reference NER output format."""
    dict_path = synth.dictionary_path(sf_dir)
    ds = transcripts_with_norm(sf_dir)
    return detect_mentions(ds, dict_path, concurrency=concurrency)


def entity_lifespan_dataset(sf_dir: str, *, bucket_us: int = 60_000_000,
                            concurrency=None):
    """transcripts (+ts) → per-entity temporal lineage
    (mention.entity_lifespan: fused detect+collapse, zero mention
    shuffle).  Default bucket is 1 minute — the synth corpus spans under
    an hour, so minute buckets exercise the real two-level cell merge;
    production corpora would pass mention._DAY_US."""
    from deepkg_ray.stages.mention import entity_lifespan
    dict_path = synth.dictionary_path(sf_dir)
    ds = transcripts_with_norm(
        sf_dir, columns=["conv_id", "turn_idx", "text", "ts"])
    return entity_lifespan(ds, dict_path, bucket_us=bucket_us,
                           concurrency=concurrency)


def role_entity_affinity_dataset(sf_dir: str, *, concurrency=None):
    """transcripts (+role) → (role, entity_id, type, n_mentions, n_turns)
    (mention.role_entity_affinity: fused detect+collapse, zero mention
    shuffle)."""
    from deepkg_ray.stages.mention import role_entity_affinity
    dict_path = synth.dictionary_path(sf_dir)
    ds = transcripts_with_norm(
        sf_dir, columns=["conv_id", "turn_idx", "text", "role"])
    return role_entity_affinity(ds, dict_path, concurrency=concurrency)


def entity_timeseries_dataset(sf_dir: str, *, bucket_us: int = 60_000_000,
                              concurrency=None):
    """transcripts (+ts) → (entity_id, bucket, n) activity series."""
    from deepkg_ray.stages.mention import entity_mention_timeseries
    dict_path = synth.dictionary_path(sf_dir)
    ds = transcripts_with_norm(
        sf_dir, columns=["conv_id", "turn_idx", "text", "ts"])
    return entity_mention_timeseries(ds, dict_path, bucket_us=bucket_us,
                                     concurrency=concurrency)


def entity_burst_dataset(sf_dir: str, *, bucket_us: int = 60_000_000,
                         concurrency=None):
    """transcripts (+ts) → per-entity burst concentration."""
    from deepkg_ray.stages.mention import entity_burst_shares
    dict_path = synth.dictionary_path(sf_dir)
    ds = transcripts_with_norm(
        sf_dir, columns=["conv_id", "turn_idx", "text", "ts"])
    return entity_burst_shares(ds, dict_path, bucket_us=bucket_us,
                               concurrency=concurrency)


class _ConvProfileCells:
    """ONE fused transcripts pass for the whole conversation profile:
    each batch runs the mention detector AND the relation extractor
    (both kernels share the actor/worker: compiled once in __init__) and
    emits padded rows keyed (conv_id, entity_id) — entity rows carry the
    (conv, entity) mention-cell counts (needed for the exact distinct-
    entity fold), the entity_id = −1 row carries the batch-local turn
    and triple counters."""

    def __init__(self, dictionary_path: str):
        from deepkg_ray.stages.mention import DictionaryMentionDetector
        from deepkg_ray.stages.relation import LinkedRelationExtractor
        self.det = DictionaryMentionDetector(dictionary_path)
        self.rel = LinkedRelationExtractor(dictionary_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        men = self.det(batch)
        tri = self.rel(batch)
        mc = (pd.DataFrame({
            "conv_id": men["conv_id"].to_pylist(),
            "entity_id": men["entity_id"].to_numpy(zero_copy_only=False)})
            .groupby(["conv_id", "entity_id"], as_index=False).size()
            .rename(columns={"size": "n_m"}))
        mc["n_turns"] = np.zeros(len(mc), np.int64)
        mc["n_triples"] = np.zeros(len(mc), np.int64)
        sc = (pd.DataFrame({"conv_id": batch["conv_id"].to_pylist()})
              .groupby("conv_id", as_index=False).size()
              .rename(columns={"size": "n_turns"}))
        tc = (pd.DataFrame({"conv_id": tri["conv_id"].to_pylist()})
              .groupby("conv_id", as_index=False).size()
              .rename(columns={"size": "n_triples"}))
        sc = sc.merge(tc, on="conv_id", how="outer").fillna(0)
        sc["entity_id"] = np.full(len(sc), -1, np.int64)
        sc["n_m"] = np.zeros(len(sc), np.int64)
        cols = ["conv_id", "entity_id", "n_m", "n_turns", "n_triples"]
        out = pd.concat([mc[cols], sc[cols]], ignore_index=True)
        for c in cols[1:]:
            out[c] = out[c].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)


def conv_profile_dataset(sf_dir: str, *, concurrency=None):
    """Per-conversation KG profile: (conv_id, n_turns, n_mentions,
    n_entities, n_triples) — the curation table that ranks conversations
    by knowledge density (how much a conversation contributes to the KG).

    Plan: ONE fused transcripts pass (_ConvProfileCells: detector +
    extractor share the task; turn/triple counters ride a padded −1 row
    next to the (conv, entity) mention cells), a cardinality-auto merge
    on (conv_id, entity_id) that makes the entity cells globally
    distinct, then a second conv-keyed merge folds cells into the
    profile (n_entities = count of entity rows).  No generic join;
    zero-mention conversations survive via the counter rows.  Perf note
    (measured): the original three-stream plan re-read + re-normalized
    transcripts three times (3.47 s at sf0.1/32 CPUs); this fused plan
    reads ONCE — at sf0.1 wall time is comparable (~4 s: the tiny input
    makes the conv×entity cell merge, not IO, the bottleneck), but at
    the 100-TB design point the 3× input-scan reduction dominates."""
    import pandas as pd

    from deepkg_ray.stages.treeagg import merge_partials
    from deepkg_ray.util import stateful_map

    dict_path = synth.dictionary_path(sf_dir)
    ds = transcripts_with_norm(sf_dir)
    cells = merge_partials(
        stateful_map(ds, _ConvProfileCells, {"dictionary_path": dict_path},
                     concurrency=concurrency, batch_size=None),
        ["conv_id", "entity_id"],
        {"n_m": "sum", "n_turns": "sum", "n_triples": "sum"}, mode="auto")

    def fold(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "conv_id": b["conv_id"].to_pylist(),
            "entity_id": b["entity_id"].to_numpy(zero_copy_only=False),
            "n_m": b["n_m"].to_numpy(zero_copy_only=False),
            "n_turns": b["n_turns"].to_numpy(zero_copy_only=False),
            "n_triples": b["n_triples"].to_numpy(zero_copy_only=False)})
        df["is_ent"] = (df["entity_id"] >= 0).astype(np.int64)
        g = (df.groupby("conv_id", as_index=False)
             .agg(n_turns=("n_turns", "sum"),
                  n_mentions=("n_m", "sum"),
                  n_entities=("is_ent", "sum"),
                  n_triples=("n_triples", "sum")))
        for c in ["n_turns", "n_mentions", "n_entities", "n_triples"]:
            g[c] = g[c].astype("int64")
        return g

    return merge_partials(
        cells.map_batches(fold, batch_format="pyarrow"),
        ["conv_id"],
        {"n_turns": "sum", "n_mentions": "sum", "n_entities": "sum",
         "n_triples": "sum"}, mode="auto")


def decayed_adjacency_dataset(sf_dir: str, *,
                              halflife_us: int = 600_000_000,
                              concurrency=None):
    """transcripts (+ts) → freshness-weighted KG edges
    (relation.decayed_adjacency).  tref (corpus max ts) comes from a
    ts-only distributed Max pre-pass — one pruned-column scan, driver
    sees a single scalar."""
    import pyarrow as pa

    from deepkg_ray.stages.relation import decayed_adjacency
    from deepkg_ray.util import tiny_task_cpus

    tc = tiny_task_cpus()
    ts_only = read_transcripts(synth.transcripts_path(sf_dir),
                               columns=["ts"], num_cpus=tc)
    tref_us = int(ts_only.map_batches(
        lambda b: pa.table({"ts_us": b["ts"].cast(pa.timestamp("us"))
                            .cast(pa.int64())}),
        batch_format="pyarrow").max("ts_us"))
    dict_path = synth.dictionary_path(sf_dir)
    ds = transcripts_with_norm(
        sf_dir, columns=["conv_id", "turn_idx", "text", "ts"])
    return decayed_adjacency(ds, dict_path, tref_us,
                             halflife_us=halflife_us,
                             concurrency=concurrency)


def surface_triples_dataset(sf_dir: str, *, concurrency=None):
    """transcripts → (conv_id, turn_idx, pred, subj/obj surface+type+start)."""
    dict_path = synth.dictionary_path(sf_dir)
    ds = transcripts_with_norm(sf_dir)
    return extract_triples(ds, dict_path, concurrency=concurrency)


def linked_triples_dataset(sf_dir: str, *, concurrency=None, repeat: int = 1):
    """Fused extract+link actor pool (one hot stage, cluster-sized)."""
    from deepkg_ray.stages.relation import (extract_linked_triples,
                                            extract_linked_triples_tasks)
    dict_path = synth.dictionary_path(sf_dir)
    ds = transcripts_with_norm(sf_dir, repeat=repeat)
    if concurrency is None:
        # Execution-strategy default: the elastic task pool with per-worker
        # state caches — measured faster than the actor pool at EVERY
        # cluster size on this host once the whole hot chain fuses into one
        # task operator (r2: 205k vs 86k turns/s at 2 CPUs, 728k vs ~450k
        # at 8, 1.2M vs 1.09M at 32), because there is no pool boot/ramp
        # and no pool-vs-task slot contention.  DEEPKG_STRATEGY=actors
        # pins the actor-pool variant (the shape a GPU model tier needs).
        import os
        if os.environ.get("DEEPKG_STRATEGY") == "actors":
            return extract_linked_triples(ds, dict_path)
        return extract_linked_triples_tasks(ds, dict_path)
    return extract_linked_triples(ds, dict_path, concurrency=concurrency)


def adjacency_dataset(sf_dir: str, *, concurrency=None):
    """Canonical graph edges (subj_id, pred, obj_id, names, types, weight, src)."""
    return aggregate_adjacency(linked_triples_dataset(sf_dir, concurrency=concurrency),
                               dictionary_path=synth.dictionary_path(sf_dir))


def build_kg(sf_dir: str, out_dir: str | None = None, *, concurrency=None,
             repeat: int = 1) -> dict:
    """Run the full pipeline; if out_dir is given, materialize all graph
    artifacts as parquet (the [F] stage); returns the datasets."""
    linked = linked_triples_dataset(sf_dir, concurrency=concurrency, repeat=repeat)
    adj = aggregate_adjacency(linked,
                              dictionary_path=synth.dictionary_path(sf_dir))
    out = {
        "adjacency": adj,
        "entities": entity_table(adj),
        "predicates": predicate_table(adj),
    }
    if out_dir:
        # NB: consuming `adj` three times would re-execute the upstream
        # extraction; materialize the (small) aggregated edge list once.
        adj_m = adj.materialize()
        out = {"adjacency": adj_m,
               "entities": entity_table(adj_m),
               "predicates": predicate_table(adj_m)}
        adj_m.write_parquet(f"{out_dir}/adjacency")
        out["entities"].write_parquet(f"{out_dir}/entities")
        out["predicates"].write_parquet(f"{out_dir}/predicates")
    return out


def conv_cumulative_triples(sf_dir: str, *, concurrency=None):
    """Per-conversation ordered analytics: per (conv_id, turn_idx) triple
    counts with a running cumulative per conversation — exercises the
    stable-turn-ordering contract (sort inside the group, never block
    arrival order; SURVEY.md §2.9)."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Count

    per_turn = (surface_triples_dataset(sf_dir, concurrency=concurrency)
                .groupby(["conv_id", "turn_idx"])
                .aggregate(Count(alias_name="n_triples")))

    def cum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx", kind="stable").reset_index(drop=True)
        g["cum_triples"] = g["n_triples"].astype(np.int64).cumsum()
        g["n_triples"] = g["n_triples"].astype(np.int64)
        return g

    return per_turn.groupby("conv_id").map_groups(cum, batch_format="pandas")


def build_kg_resumable(sf_dir: str, out_dir: str, *, concurrency=None,
                       target_partitions: int | None = None,
                       salt: int = 1) -> dict:
    """Checkpointed variant of build_kg: each work unit is processed and
    written atomically under ``out_dir/linked/part=<unit>/`` with a
    manifest (state/checkpoint.py), so a rerun skips completed units; the
    canonical adjacency is then aggregated over the partitioned output.
    This is the shape a 100 TB run uses: lineage counters per unit,
    resume = skip.

    Partition controls (SURVEY §7.4):
    - ``target_partitions``: groups the input files round-robin into ≤ N
      work units — checkpoint granularity decoupled from the input file
      layout (a 100 TB input of a million small files must not mean a
      million manifest entries; None keeps the 1-file-1-unit default).
    - ``salt`` > 1: each file group fans out into `salt` sub-units, unit
      r processing only conversations with hash(conv_id) % salt == r —
      the salted-conv-group skew control: a HOT conversation's turns
      split across `salt` independently-checkpointed units instead of
      making one straggler partition (valid because the per-turn
      extract→link chain never needs conversation completeness; the
      downstream adjacency aggregate is edge-keyed and combiner-first).
    Resume is stable for a fixed (file set, target_partitions, salt)."""
    import glob
    import ray.data as rd
    from deepkg_ray.functions.hashing import stable_hash64_batch
    from deepkg_ray.state.checkpoint import metrics_table, run_partitioned
    from deepkg_ray.stages.linking import link_triples
    from deepkg_ray.stages.relation import extract_triples

    dict_path = synth.dictionary_path(sf_dir)
    files = sorted(glob.glob(f"{synth.transcripts_path(sf_dir)}/*.parquet"))

    if target_partitions is None or target_partitions >= len(files):
        groups = [[f] for f in files]
        gnames = [os.path.splitext(os.path.basename(f))[0] for f in files]
    else:
        k = max(1, target_partitions)
        groups = [files[i::k] for i in range(k)]
        groups = [g for g in groups if g]
        gnames = [f"g{i:04d}" for i in range(len(groups))]
    units: dict[str, tuple[list[str], int]] = {}
    for gname, g in zip(gnames, groups):
        if salt <= 1:
            units[gname] = (g, -1)
        else:
            for r in range(salt):
                units[f"{gname}.s{r:02d}"] = (g, r)

    def process(unit: str):
        g, r = units[unit]
        ds = rd.read_parquet(g, columns=["conv_id", "turn_idx", "text"])
        if r >= 0:
            def keep_salt(b: pa.Table) -> pa.Table:
                h = stable_hash64_batch(b["conv_id"].to_pylist())
                return b.filter(pa.array(
                    (h % np.uint64(salt)) == np.uint64(r)))
            ds = ds.map_batches(keep_salt, batch_format="pyarrow")
        ds = ds.map_batches(add_text_norm, batch_format="pyarrow",
                            batch_size=8192)
        triples = extract_triples(ds, dict_path, concurrency=concurrency)
        return link_triples(triples, dict_path, concurrency=concurrency)

    linked_dir = f"{out_dir}/linked"
    counters = run_partitioned(sorted(units), linked_dir, process,
                               partition_name=lambda u: u)

    # NB: ray 2.49 read_parquet accepts a list of FILES but trips on a
    # list of multiple directories — expand to the part files explicitly
    linked = rd.read_parquet(sorted(glob.glob(f"{linked_dir}/part=*/*.parquet")))
    adj = aggregate_adjacency(linked, dictionary_path=dict_path)
    # atomic overwrite — write_parquet otherwise APPENDS uniquely-named
    # files into an existing dir, double-counting on rerun
    import shutil
    tmp = f"{out_dir}/.adjacency.tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    adj.write_parquet(tmp)
    final = f"{out_dir}/adjacency"
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp, final)
    import pyarrow.parquet as pq
    pq.write_table(metrics_table(linked_dir), f"{out_dir}/metrics.parquet")
    return {"counters": counters, "adjacency_dir": final}


def update_adjacency(existing_adj, delta_adj, mode: str = "auto"):
    """Incremental KG ingest: merge a new partition's adjacency DELTA into
    an existing adjacency — the production path at 10^12-turn scale, where
    each arriving transcript partition is extracted once and folded in
    instead of rebuilding the graph.  The per-edge aggregate is associative
    (weight: sum, src: min over the zero-padded conv:turn key, names/types:
    functionally dependent on the ids), so
    update(adj(A), adj(B)) == adj(A ∪ B) EXACTLY — the kg_incremental
    driver query proves it against the full-rebuild SQL oracle.
    mode as in stages/canonical.aggregate_adjacency ('auto' routes tree vs
    shuffle by observed key cardinality)."""
    from deepkg_ray.stages.treeagg import merge_partials
    merged = existing_adj.union(delta_adj)
    return merge_partials(
        merged, ["subj_id", "pred", "obj_id"],
        {"weight": "sum", "src": "min", "subj_name": "first",
         "subj_type": "first", "obj_name": "first", "obj_type": "first"},
        mode=mode)


def adjacency_dataset_for_files(sf_dir: str, files: list[str], *,
                                concurrency=None):
    """adjacency over an explicit transcript-file subset (one ingest
    partition) — the delta builder for update_adjacency."""
    import ray.data as rd
    from deepkg_ray.stages.canonical import aggregate_adjacency
    from deepkg_ray.stages.linking import link_triples
    from deepkg_ray.stages.relation import extract_triples
    dict_path = synth.dictionary_path(sf_dir)
    ds = rd.read_parquet(sorted(files),
                         columns=["conv_id", "turn_idx", "text"])
    ds = ds.map_batches(add_text_norm, batch_format="pyarrow",
                        batch_size=8192)
    linked = link_triples(extract_triples(ds, dict_path,
                                          concurrency=concurrency),
                          dict_path, concurrency=concurrency)
    return aggregate_adjacency(linked, dictionary_path=dict_path)
