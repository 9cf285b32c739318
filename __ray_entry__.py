"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline at sf0.001; ``queries()`` exposes
one callable per implemented operator/pipeline (SURVEY.md §2), each taking
``sf_dir``; ``oracle_sql()`` returns the DuckDB-equivalent SQL for every
SQL-expressible query (same column names both sides).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in deepkg_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_ORACLE = "/root/testdata/sf0.01"   # the driver's correctness scale


def entry() -> Any:
    """Flagship pipeline: transcripts → mentions → triples → linking →
    canonical adjacency, at sf0.001."""
    from deepkg_ray.pipelines import kg
    return kg.adjacency_dataset("/root/testdata/sf0.001")


# --------------------------------------------------------------- queries ----

def _q_kg_mention_counts(sf_dir: str):
    from ray.data.aggregate import Count
    from deepkg_ray.pipelines import kg
    m = kg.mentions_dataset(sf_dir)
    return (m.groupby(["conv_id", "turn_idx", "surface", "entity_id", "type"])
            .aggregate(Count(alias_name="n_occ")))


def _q_kg_triples(sf_dir: str):
    from deepkg_ray.pipelines import kg
    return kg.surface_triples_dataset(sf_dir).select_columns(
        ["conv_id", "turn_idx", "pred", "subj_text", "subj_type",
         "obj_text", "obj_type"])


def _q_kg_adjacency(sf_dir: str):
    from deepkg_ray.pipelines import kg
    return kg.adjacency_dataset(sf_dir)


def _q_kg_entities(sf_dir: str):
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.canonical import entity_table
    return entity_table(kg.adjacency_dataset(sf_dir))


def _q_kg_predicates(sf_dir: str):
    from deepkg_ray.pipelines import kg
    from deepkg_ray.stages.canonical import predicate_table
    return predicate_table(kg.adjacency_dataset(sf_dir))


def _q_transcript_stats(sf_dir: str):
    """Per-role turn/char/conversation counts over the transcript table —
    two-level aggregation (partial per (role, conv) then final per role) so
    the wide shuffle only moves pre-aggregated rows."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum
    from deepkg_ray import synth

    ds = rd.read_parquet(synth.transcripts_path(sf_dir),
                         columns=["conv_id", "role", "text"])

    def add_len(b: pa.Table) -> pa.Table:
        return (b.append_column("chars", pc.utf8_length(b["text"]))
                .drop_columns(["text"]))

    lv1 = (ds.map_batches(add_len, batch_format="pyarrow")
           .groupby(["role", "conv_id"])
           .aggregate(Count(alias_name="turns"), Sum("chars", alias_name="chars")))
    return (lv1.groupby("role")
            .aggregate(Sum("turns", alias_name="n_turns"),
                       Sum("chars", alias_name="n_chars"),
                       Count(alias_name="n_convs")))


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "kg_mention_counts": _q_kg_mention_counts,
        "kg_triples": _q_kg_triples,
        "kg_adjacency": _q_kg_adjacency,
        "kg_entities": _q_kg_entities,
        "kg_predicates": _q_kg_predicates,
        "transcript_stats": _q_transcript_stats,
    }


def oracle_sql() -> dict[str, str]:
    from deepkg_ray import oracle, synth
    synth.ensure_synth(SF_ORACLE)   # SQL reads the synthesized parquet
    return {
        "kg_mention_counts": oracle.mention_counts_sql(SF_ORACLE),
        "kg_triples": oracle.triples_sql(SF_ORACLE),
        "kg_adjacency": oracle.adjacency_sql(SF_ORACLE),
        "kg_entities": oracle.entities_sql(SF_ORACLE),
        "kg_predicates": oracle.predicates_sql(SF_ORACLE),
        "transcript_stats": oracle.transcript_stats_sql(SF_ORACLE),
    }
