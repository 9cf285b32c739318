"""DuckDB oracle-SQL builders for the KG pipeline queries.

The oracle is an *independent* implementation of the same semantics in pure
ANSI SQL (DuckDB dialect, RE2 regexes — no lookbehind), built from the same
deterministic dictionary/templates as the engine.  The driver runs engine
and oracle side by side and compares row counts + schema + value hashes.

Equivalence rests on the synthesis invariants documented in
deepkg_ray/synth.py (no surface is a substring of another, surfaces never
overlap, relation sentences are sentence-anchored and never adjacent,
normalization is lower()-equivalent on surface-bearing regions).
"""

from __future__ import annotations

import os

from deepkg_ray import synth
from deepkg_ray.synth import RELATION_TEMPLATES


def _transcripts_glob(sf_dir: str) -> str:
    return os.path.join(synth.transcripts_path(sf_dir), "*.parquet")


def dict_values_cte() -> str:
    """Inline VALUES list of every dictionary surface:
    dict(surface, entity_id, type, name)."""
    rows = []
    for e in synth.build_dictionary():
        for a in e.aliases:
            rows.append(f"('{a}', {e.entity_id}, '{e.etype}', '{e.name}')")
    return "dict(surface, entity_id, type, name) AS (VALUES " + ", ".join(rows) + ")"


def transcripts_cte(sf_dir: str) -> str:
    return ("t AS (SELECT conv_id, turn_idx, lower(text) AS txt "
            f"FROM read_parquet('{_transcripts_glob(sf_dir)}'))")


def mention_counts_sql(sf_dir: str) -> str:
    """Occurrence count per (turn, surface) — equals the engine's maximal
    trie matching because no surface is a substring of another and
    occurrences never overlap (synth invariant 1)."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)}
SELECT t.conv_id, t.turn_idx, d.surface, d.entity_id, d.type,
       CAST((length(t.txt) - length(replace(t.txt, d.surface, ''))) / length(d.surface) AS BIGINT) AS n_occ
FROM t JOIN dict d ON strpos(t.txt, d.surface) > 0
"""


def _triples_cte(sf_dir: str) -> str:
    """UNION ALL of one RE2 extraction per predicate, validated against the
    inline dictionary with the template's type constraints."""
    parts = []
    for pred, subj_t, obj_t, infix in RELATION_TEMPLATES:
        pat = r"(?:^|\. )([a-z][a-z0-9, -]*?)" + infix + r"([a-z][a-z0-9, -]*?)\."
        parts.append(f"""
SELECT conv_id, turn_idx, '{pred}' AS pred,
       unnest(regexp_extract_all(txt, '{pat}', 1)) AS subj_text,
       '{subj_t}' AS subj_type,
       unnest(regexp_extract_all(txt, '{pat}', 2)) AS obj_text,
       '{obj_t}' AS obj_type
FROM t""")
    raw = " UNION ALL ".join(parts)
    return f"""raw_triples AS ({raw}),
triples AS (
  SELECT r.conv_id, r.turn_idx, r.pred,
         r.subj_text, r.subj_type, ds.entity_id AS subj_id, ds.name AS subj_name,
         r.obj_text, r.obj_type, dobj.entity_id AS obj_id, dobj.name AS obj_name
  FROM raw_triples r
  JOIN dict ds  ON ds.surface = r.subj_text AND ds.type = r.subj_type
  JOIN dict dobj ON dobj.surface = r.obj_text AND dobj.type = r.obj_type
)"""


def triples_sql(sf_dir: str) -> str:
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)}
SELECT conv_id, turn_idx, pred, subj_text, subj_type, obj_text, obj_type
FROM triples
"""


def adjacency_sql(sf_dir: str) -> str:
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)}
SELECT subj_id, pred, obj_id,
       CAST(count(*) AS BIGINT) AS weight,
       min(conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 8, '0')) AS src,
       min(subj_name) AS subj_name, min(subj_type) AS subj_type,
       min(obj_name) AS obj_name, min(obj_type) AS obj_type
FROM triples
GROUP BY subj_id, pred, obj_id
"""


def entities_sql(sf_dir: str) -> str:
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
adj AS (
  SELECT subj_id, pred, obj_id, count(*) AS weight,
         min(subj_name) AS subj_name, min(subj_type) AS subj_type,
         min(obj_name) AS obj_name, min(obj_type) AS obj_type
  FROM triples GROUP BY subj_id, pred, obj_id
),
sides AS (
  SELECT subj_id AS entity_id, subj_name AS name, subj_type AS type, weight FROM adj
  UNION ALL
  SELECT obj_id, obj_name, obj_type, weight FROM adj
)
SELECT entity_id, name, type, CAST(sum(weight) AS BIGINT) AS degree
FROM sides GROUP BY entity_id, name, type
"""


def predicates_sql(sf_dir: str) -> str:
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
adj AS (
  SELECT subj_id, pred, obj_id, count(*) AS weight
  FROM triples GROUP BY subj_id, pred, obj_id
)
SELECT pred, CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(weight) AS BIGINT) AS n_support
FROM adj GROUP BY pred
"""


def transcript_stats_sql(sf_dir: str) -> str:
    return f"""
SELECT role, CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM read_parquet('{_transcripts_glob(sf_dir)}')
GROUP BY role
"""
