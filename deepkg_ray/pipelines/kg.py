"""The flagship KG-construction pipeline (SURVEY.md §7.1):

    transcripts.parquet
      → read_parquet (pruned columns)
      → [A] normalize          (stateless map_batches, Arrow)
      → [B] mention detection  (DictionaryMentionDetector actor pool)   — mentions table
      → [C] relation extraction (RelationExtractor actor pool)          — surface triples
      → [D] entity linking      (ExactLinker, broadcast dictionary)     — linked triples
      → [E] canonical dedup     (partial-agg + groupby on (subj_id,pred,obj_id))
      → [F] materialize         adjacency / entities / predicates parquet

The whole thing is lazy: nothing materializes until the caller consumes
(write_parquet / to_pandas on the small aggregate outputs).
"""

from __future__ import annotations

import pyarrow as pa

from deepkg_ray import synth
from deepkg_ray.functions.textnorm import add_text_norm
from deepkg_ray.sources.readers import read_transcripts
from deepkg_ray.stages.canonical import (aggregate_adjacency, entity_table,
                                         predicate_table)
from deepkg_ray.stages.linking import link_triples
from deepkg_ray.stages.mention import detect_mentions
from deepkg_ray.stages.relation import extract_triples


def transcripts_with_norm(sf_dir: str, *, parallelism: int | None = None):
    path = synth.transcripts_path(sf_dir)
    ds = read_transcripts(path)
    return ds.map_batches(add_text_norm, batch_format="pyarrow", batch_size=8192)


def mentions_dataset(sf_dir: str, *, concurrency=(1, 8)):
    """transcripts → typed mention spans (inclusive end), analog of the
    reference NER output format."""
    dict_path = synth.dictionary_path(sf_dir)
    ds = transcripts_with_norm(sf_dir)
    return detect_mentions(ds, dict_path, concurrency=concurrency)


def surface_triples_dataset(sf_dir: str, *, concurrency=(1, 8)):
    """transcripts → (conv_id, turn_idx, pred, subj/obj surface+type+start)."""
    dict_path = synth.dictionary_path(sf_dir)
    ds = transcripts_with_norm(sf_dir)
    return extract_triples(ds, dict_path, concurrency=concurrency)


def linked_triples_dataset(sf_dir: str, *, concurrency=(1, 8)):
    dict_path = synth.dictionary_path(sf_dir)
    return link_triples(surface_triples_dataset(sf_dir, concurrency=concurrency),
                        dict_path, concurrency=concurrency)


def adjacency_dataset(sf_dir: str, *, concurrency=(1, 8)):
    """Canonical graph edges (subj_id, pred, obj_id, names, types, weight, src)."""
    return aggregate_adjacency(linked_triples_dataset(sf_dir, concurrency=concurrency))


def build_kg(sf_dir: str, out_dir: str | None = None, *, concurrency=(1, 8)) -> dict:
    """Run the full pipeline; if out_dir is given, materialize all graph
    artifacts as parquet (the [F] stage); returns the datasets."""
    linked = linked_triples_dataset(sf_dir, concurrency=concurrency)
    adj = aggregate_adjacency(linked)
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


def conv_cumulative_triples(sf_dir: str, *, concurrency=(1, 8)):
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
