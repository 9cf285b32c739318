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


def entity_lifespan_sql(sf_dir: str, bucket_us: int = 60_000_000) -> str:
    """Per-entity temporal lineage: total mention occurrences, first/last
    mention timestamp (us) and distinct active time buckets.  Occurrence
    counting is the mention_counts_sql substring-count identity (synth
    invariant 1); the bucket key is epoch_us // bucket_us, matching the
    engine's int64 floor division (synth timestamps are post-epoch, so
    // == floor)."""
    return f"""
WITH {dict_values_cte()},
t AS (SELECT conv_id, turn_idx, lower(text) AS txt, epoch_us(ts) AS ts_us
      FROM read_parquet('{_transcripts_glob(sf_dir)}')),
occ AS (
  SELECT d.entity_id,
         CAST((length(t.txt) - length(replace(t.txt, d.surface, ''))) / length(d.surface) AS BIGINT) AS n_occ,
         t.ts_us
  FROM t JOIN dict d ON strpos(t.txt, d.surface) > 0
),
per_bucket AS (
  SELECT entity_id, ts_us // {int(bucket_us)} AS bucket,
         SUM(n_occ) AS n, MIN(ts_us) AS first_us, MAX(ts_us) AS last_us
  FROM occ GROUP BY entity_id, bucket
)
SELECT entity_id, CAST(sum(n) AS BIGINT) AS n_mentions,
       CAST(min(first_us) AS BIGINT) AS first_us,
       CAST(max(last_us) AS BIGINT) AS last_us,
       CAST(count(*) AS BIGINT) AS n_active_buckets
FROM per_bucket GROUP BY entity_id
"""


def _entity_bucket_cte(sf_dir: str, bucket_us: int) -> str:
    """occ → (entity_id, bucket, n) cells shared by the time-series and
    burst oracles (the lifespan substring-count identity)."""
    return f"""
t AS (SELECT conv_id, turn_idx, lower(text) AS txt, epoch_us(ts) AS ts_us
      FROM read_parquet('{_transcripts_glob(sf_dir)}')),
cells AS (
  SELECT d.entity_id, t.ts_us // {int(bucket_us)} AS bucket,
         CAST(sum((length(t.txt) - length(replace(t.txt, d.surface, ''))) / length(d.surface)) AS BIGINT) AS n
  FROM t JOIN dict d ON strpos(t.txt, d.surface) > 0
  GROUP BY d.entity_id, bucket
)"""


def entity_timeseries_sql(sf_dir: str, bucket_us: int = 60_000_000) -> str:
    return f"""
WITH {dict_values_cte()},
{_entity_bucket_cte(sf_dir, bucket_us)}
SELECT entity_id, bucket, n FROM cells
"""


def entity_burst_sql(sf_dir: str, bucket_us: int = 60_000_000) -> str:
    """peak_share = round6(max bucket count / total) per entity."""
    return f"""
WITH {dict_values_cte()},
{_entity_bucket_cte(sf_dir, bucket_us)}
SELECT entity_id, CAST(max(n) AS BIGINT) AS peak_n,
       CAST(sum(n) AS BIGINT) AS total_n,
       floor(max(n) / CAST(sum(n) AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS peak_share
FROM cells GROUP BY entity_id
"""


def conv_entity_entropy_sql(sf_dir: str) -> str:
    """Mirror of mention.conv_entity_entropy: per-(conv, entity)
    occurrence counts, ln-micros entropy terms, integer sum / 1e6."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
occ AS (
  SELECT t.conv_id, d.entity_id,
         CAST(sum((length(t.txt) - length(replace(t.txt, d.surface, ''))) / length(d.surface)) AS BIGINT) AS n
  FROM t JOIN dict d ON strpos(t.txt, d.surface) > 0
  GROUP BY t.conv_id, d.entity_id
),
tot AS (SELECT conv_id, CAST(sum(n) AS BIGINT) AS tn,
               CAST(count(*) AS BIGINT) AS ne
        FROM occ GROUP BY conv_id)
SELECT o.conv_id, t.tn AS n_mentions, t.ne AS n_entities,
       CAST(sum(CAST(floor(-(o.n / CAST(t.tn AS DOUBLE))
                           * ln(o.n / CAST(t.tn AS DOUBLE))
                           * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6
         AS entropy
FROM occ o JOIN tot t ON t.conv_id = o.conv_id
GROUP BY o.conv_id, t.tn, t.ne
"""


def entity_relatedness_sql(sf_dir: str) -> str:
    """Mirror of mention.entity_relatedness: DISTINCT (conv, entity)
    presence, self-join pair intersections, conv-degree Jaccard with one
    round6 division."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
pres AS (SELECT DISTINCT t.conv_id, d.entity_id
         FROM t JOIN dict d ON strpos(t.txt, d.surface) > 0),
deg AS (SELECT entity_id, CAST(count(*) AS BIGINT) AS n
        FROM pres GROUP BY entity_id),
pr AS (SELECT a.entity_id AS e1, b.entity_id AS e2,
              CAST(count(*) AS BIGINT) AS n_inter
       FROM pres a JOIN pres b
         ON a.conv_id = b.conv_id AND a.entity_id < b.entity_id
       GROUP BY a.entity_id, b.entity_id)
SELECT pr.e1, pr.e2, pr.n_inter, da.n AS n_a, db.n AS n_b,
       floor(pr.n_inter / CAST(da.n + db.n - pr.n_inter AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS jaccard
FROM pr JOIN deg da ON da.entity_id = pr.e1
        JOIN deg db ON db.entity_id = pr.e2
"""


def mention_gini_sql(sf_dir: str) -> str:
    """Mirror of mention.mention_concentration_gini: per-entity counts,
    sorted-form integer Gini per type (row_number ties are sum-invariant
    because tied x values contribute symmetrically)."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
occ AS (
  SELECT d.type, d.entity_id,
         CAST(sum((length(t.txt) - length(replace(t.txt, d.surface, ''))) / length(d.surface)) AS BIGINT) AS n
  FROM t JOIN dict d ON strpos(t.txt, d.surface) > 0
  GROUP BY d.type, d.entity_id
),
r AS (SELECT type, n,
             row_number() OVER (PARTITION BY type ORDER BY n) AS rn
      FROM occ),
agg AS (
  SELECT type, CAST(count(*) AS BIGINT) AS n_entities,
         CAST(sum(n) AS BIGINT) AS sum_mentions,
         CAST(2 * sum(rn * n) - (count(*) + 1) * sum(n) AS BIGINT)
           AS gini_num
  FROM r GROUP BY type
)
SELECT type, n_entities, sum_mentions, gini_num,
       CASE WHEN sum_mentions > 0
            THEN CAST(gini_num AS DOUBLE)
                 / CAST(n_entities * sum_mentions AS DOUBLE)
            ELSE 0.0 END AS gini
FROM agg
"""


def alias_usage_sql(sf_dir: str) -> str:
    """Mirror of mention.alias_usage: substring occurrence totals per
    (entity, surface), share = round6(n / entity total)."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
occ AS (
  SELECT d.entity_id, d.surface,
         CAST(sum((length(t.txt) - length(replace(t.txt, d.surface, ''))) / length(d.surface)) AS BIGINT) AS n
  FROM t JOIN dict d ON strpos(t.txt, d.surface) > 0
  GROUP BY d.entity_id, d.surface
),
tot AS (SELECT entity_id, CAST(sum(n) AS BIGINT) AS tn
        FROM occ GROUP BY entity_id)
SELECT o.entity_id, o.surface, o.n,
       floor(o.n / CAST(t.tn AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS share
FROM occ o JOIN tot t ON t.entity_id = o.entity_id
"""


def edge_provenance_sql(sf_dir: str) -> str:
    """Mirror of canonical.edge_provenance: distinct evidencing
    conversations per canonical edge."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)}
SELECT subj_id, pred, obj_id,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM triples GROUP BY subj_id, pred, obj_id
"""


def entity_transitions_sql(sf_dir: str) -> str:
    """Mirror of mention.entity_transitions: per-turn DISTINCT entity
    sets (substring containment — n_occ > 0 ⇔ strpos > 0), self-joined
    on turn_idx + 1 within the conversation."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
tm AS (
  SELECT DISTINCT t.conv_id, t.turn_idx, d.entity_id
  FROM t JOIN dict d ON strpos(t.txt, d.surface) > 0
)
SELECT a.entity_id AS e1, b.entity_id AS e2,
       CAST(count(*) AS BIGINT) AS n
FROM tm a JOIN tm b
  ON b.conv_id = a.conv_id AND b.turn_idx = a.turn_idx + 1
GROUP BY a.entity_id, b.entity_id
"""


def role_entity_affinity_sql(sf_dir: str) -> str:
    """(role, entity_id, type) mention totals + distinct mentioning turns.
    Occurrence counting is the mention_counts_sql substring identity;
    n_turns is COUNT(DISTINCT turn) because two aliases of one entity in
    one turn must count that turn once."""
    return f"""
WITH {dict_values_cte()},
t AS (SELECT conv_id, turn_idx, role, lower(text) AS txt
      FROM read_parquet('{_transcripts_glob(sf_dir)}'))
SELECT t.role, d.entity_id, d.type,
       CAST(sum((length(t.txt) - length(replace(t.txt, d.surface, ''))) / length(d.surface)) AS BIGINT) AS n_mentions,
       CAST(count(DISTINCT t.conv_id || ':' || t.turn_idx) AS BIGINT) AS n_turns
FROM t JOIN dict d ON strpos(t.txt, d.surface) > 0
GROUP BY t.role, d.entity_id, d.type
"""


def entity_introducer_sql(sf_dir: str) -> str:
    """Mirror of mention.entity_introducer: per (conv, entity) the role
    of the first-mentioning turn (min turn_idx; role is unique per
    turn), rolled up to (role, type)."""
    return f"""
WITH {dict_values_cte()},
t AS (SELECT conv_id, turn_idx, role, lower(text) AS txt
      FROM read_parquet('{_transcripts_glob(sf_dir)}')),
m AS (SELECT DISTINCT t.conv_id, t.turn_idx, t.role,
             d.entity_id, d.type
      FROM t JOIN dict d ON strpos(t.txt, d.surface) > 0),
f AS (SELECT conv_id, entity_id, type, role FROM m
      QUALIFY row_number() OVER (PARTITION BY conv_id, entity_id
                                 ORDER BY turn_idx) = 1)
SELECT role, type, CAST(count(*) AS BIGINT) AS n_introduced
FROM f GROUP BY role, type
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


def decayed_adjacency_sql(sf_dir: str,
                          halflife_us: int = 600_000_000) -> str:
    """Mirror of relation.decayed_adjacency: per-extraction decay weight
    floor(exp(-ln2·(tref-ts)/halflife)·1e6 + 0.5) as BIGINT, integer SUM
    per canonical edge (order-independent, engine-exact); tref = corpus
    max epoch_us."""
    return f"""
WITH {dict_values_cte()},
t AS (SELECT conv_id, turn_idx, lower(text) AS txt, epoch_us(ts) AS ts_us
      FROM read_parquet('{_transcripts_glob(sf_dir)}')),
{_triples_cte(sf_dir)},
tref AS (SELECT max(ts_us) AS v FROM t)
SELECT tr.subj_id, tr.pred, tr.obj_id,
       CAST(sum(CAST(floor(exp(-0.6931471805599453 * (tref.v - tt.ts_us)
                               / {float(halflife_us)}) * 1000000 + 0.5)
                     AS BIGINT)) AS BIGINT) AS w_micros,
       CAST(count(*) AS BIGINT) AS n
FROM triples tr
JOIN t tt ON tt.conv_id = tr.conv_id AND tt.turn_idx = tr.turn_idx, tref
GROUP BY tr.subj_id, tr.pred, tr.obj_id
"""


def conv_profile_sql(sf_dir: str) -> str:
    """Mirror of pipelines/kg.conv_profile_dataset: per-conversation turn,
    mention-occurrence, distinct-entity and triple counts (zeros kept via
    the turn stream / LEFT JOINs)."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
turns AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns
          FROM t GROUP BY conv_id),
men AS (
  SELECT t.conv_id, d.entity_id,
         CAST((length(t.txt) - length(replace(t.txt, d.surface, ''))) / length(d.surface) AS BIGINT) AS n_occ
  FROM t JOIN dict d ON strpos(t.txt, d.surface) > 0
),
mstats AS (
  SELECT conv_id, CAST(sum(n_occ) AS BIGINT) AS n_mentions,
         CAST(count(DISTINCT entity_id) AS BIGINT) AS n_entities
  FROM men GROUP BY conv_id
),
tri AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_triples
        FROM triples GROUP BY conv_id)
SELECT tu.conv_id, tu.n_turns,
       CAST(COALESCE(m.n_mentions, 0) AS BIGINT) AS n_mentions,
       CAST(COALESCE(m.n_entities, 0) AS BIGINT) AS n_entities,
       CAST(COALESCE(tr.n_triples, 0) AS BIGINT) AS n_triples
FROM turns tu
LEFT JOIN mstats m ON m.conv_id = tu.conv_id
LEFT JOIN tri tr ON tr.conv_id = tu.conv_id
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


def key_skew_stats_oracle(sf_dir: str, col: str = "conv_id") -> str:
    """Per-key count distribution (quantiles.key_skew_stats) — quantile_disc
    matches the engine's ceil(q·n)−1 index formula bitwise."""
    return f"""
WITH c AS (
  SELECT {col}, CAST(COUNT(*) AS BIGINT) AS n
  FROM read_parquet('{_transcripts_glob(sf_dir)}') GROUP BY {col}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(MAX(n) AS BIGINT) AS max_cnt,
       CAST(quantile_disc(n, 0.5) AS BIGINT) AS p50,
       CAST(quantile_disc(n, 0.9) AS BIGINT) AS p90,
       CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99,
       floor(MAX(n) * 1.0 / SUM(n) * 1e6 + 0.5) / 1e6 AS top_share
FROM c
"""


def transcript_stats_sql(sf_dir: str) -> str:
    return f"""
SELECT role, CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM read_parquet('{_transcripts_glob(sf_dir)}')
GROUP BY role
"""


def prf_sql(sf_dir: str) -> str:
    """Oracle for extraction_prf: set-mode tuple P/R/F1 of the triples CTE
    vs the generation-time gold parquet (scorer.py:44-111 semantics).

    Set mode sums per-instance |set(g) ∩ set(p)| / |set(g)| / |set(p)|,
    which equals global DISTINCT (key, tuple) counts and their inner join.
    P/R/F1 are single IEEE double divisions of exact integers in the same
    operation order as TupleMetric.compute_f1 (scoring.py:66-71), so the
    doubles are bit-identical — no rounding convention needed."""
    gold_path = os.path.join(synth.ensure_synth(sf_dir), "triples_gold.parquet")
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
g AS (SELECT DISTINCT conv_id, turn_idx, pred, subj_text, obj_text
      FROM read_parquet('{gold_path}')),
p AS (SELECT DISTINCT conv_id, turn_idx, pred, subj_text, obj_text
      FROM triples),
c AS (SELECT
        CAST((SELECT count(*) FROM g) AS DOUBLE) AS gn,
        CAST((SELECT count(*) FROM p) AS DOUBLE) AS pn,
        CAST((SELECT count(*) FROM g JOIN p USING
              (conv_id, turn_idx, pred, subj_text, obj_text)) AS DOUBLE) AS tp),
r AS (SELECT tp, gn, pn,
        CASE WHEN pn = 0 THEN 0.0 ELSE tp / pn END AS p_raw,
        CASE WHEN gn = 0 THEN 0.0 ELSE tp / gn END AS r_raw
      FROM c)
SELECT tp, gn AS gold, pn AS pred, p_raw * 100 AS P, r_raw * 100 AS R,
       CASE WHEN p_raw + r_raw = 0 THEN 0.0
            ELSE 2 * p_raw * r_raw / (p_raw + r_raw) END * 100 AS F1
FROM r
"""


def _kmeans_parts(k: int, iters: int, suffix: str = "",
                  vec_expr: str | None = None) -> str:
    """Comma-joined CTE parts for one unrolled Lloyd chain — mirrors
    stages/kmeans.py op for op: micros vectors, integer-exact quadratic
    distance, ties → lowest centroid index, centroid = floor(sum/count) in
    double, empty clusters keep their previous centroid.  ``suffix`` renames
    every CTE (vecs{suffix}, a0{suffix}, …) so several chains — e.g. one per
    PQ subspace — compose inside one WITH; ``vec_expr`` overrides the
    micros-vector expression (e.g. a list_slice for a PQ subspace).
    Exposes ``vecs{suffix}(vec_id, em)`` and the final assignment
    ``a{iters}{suffix}(vec_id, em, cl)``."""
    from deepkg_ray.functions.numeric import SQL_EMB_MICROS
    em = vec_expr or SQL_EMB_MICROS.format(e="embedding")
    s = suffix
    parts = [f"""
vecs{s} AS (SELECT vec_id, {em} AS em FROM embeddings),
cent0{s} AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cidx,
                 em AS cem
          FROM (SELECT vec_id, em FROM vecs{s} ORDER BY vec_id LIMIT {k}))"""]
    for i in range(iters + 1):
        parts.append(f"""
a{i}{s} AS (SELECT vec_id, em, cl FROM (
    SELECT v.vec_id, v.em, c.cidx AS cl,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
               list_dot_product(v.em, v.em)
               - 2 * list_dot_product(v.em, c.cem)
               + list_dot_product(c.cem, c.cem), c.cidx) AS rn
    FROM vecs{s} v CROSS JOIN cent{i}{s} c) WHERE rn = 1)""")
        if i == iters:
            break
        parts.append(f"""
s{i}{s} AS (SELECT cl, i, sum(x) AS sx, count(*) AS cnt
         FROM (SELECT cl, unnest(em) AS x,
                      unnest(range(1, 1 + len(em))) AS i FROM a{i}{s})
         GROUP BY cl, i),
n{i}{s} AS (SELECT cl AS cidx, list(floor(sx / cnt) ORDER BY i) AS cem
         FROM s{i}{s} GROUP BY cl),
cent{i + 1}{s} AS (SELECT c.cidx, COALESCE(n.cem, c.cem) AS cem
                FROM cent{i}{s} c LEFT JOIN n{i}{s} n USING (cidx))""")
    return ",".join(parts)


def _kmeans_cte(k: int, iters: int) -> str:
    """One-chain WITH wrapper over _kmeans_parts (original callers)."""
    return "WITH " + _kmeans_parts(k, iters)


def pq_codes_oracle(m: int = 4, k: int = 16, iters: int = 2,
                    dim: int = 64) -> str:
    """Product-quantization codes — one Lloyd chain per contiguous
    subspace (list_slice of the micros vector, 1-based inclusive), joined
    on vec_id.  Mirrors stages/kmeans.pq_fit/pq_assign (whose fused pass
    is bitwise per-subspace kmeans_fit)."""
    from deepkg_ray.functions.numeric import SQL_EMB_MICROS
    em = SQL_EMB_MICROS.format(e="embedding")
    w = dim // m
    chains = []
    for j in range(m):
        expr = f"list_slice({em}, {j * w + 1}, {(j + 1) * w})"
        chains.append(_kmeans_parts(k, iters, suffix=f"_p{j}",
                                    vec_expr=expr))
    cols = ",\n       ".join(
        f"CAST(a{iters}_p{j}.cl AS BIGINT) AS code{j}" for j in range(m))
    joins = "\n".join(
        f"JOIN a{iters}_p{j} ON a{iters}_p{j}.vec_id = a{iters}_p0.vec_id"
        for j in range(1, m))
    return f"""WITH {",".join(chains)}
SELECT a{iters}_p0.vec_id AS vec_id,
       {cols}
FROM a{iters}_p0
{joins}
"""


def pq_adc_topk_oracle(m: int = 4, k_codes: int = 16, iters: int = 2,
                       dim: int = 64, n_queries: int = 8,
                       k: int = 10) -> str:
    """ADC search over the PQ chains: per (query, vector), the distance is
    the sum over subspaces of the exact integer quadratic distance between
    the query's sub-vector and the CENTROID the vector's code points at —
    mirrors stages/kmeans.pq_adc_topk's lookup-table scan."""
    from deepkg_ray.functions.numeric import SQL_EMB_MICROS
    em = SQL_EMB_MICROS.format(e="embedding")
    w = dim // m
    chains = [
        _kmeans_parts(k_codes, iters, suffix=f"_p{j}",
                      vec_expr=f"list_slice({em}, {j * w + 1}, {(j + 1) * w})")
        for j in range(m)]
    unions = []
    for j in range(m):
        qj = f"list_slice(q.em, {j * w + 1}, {(j + 1) * w})"
        unions.append(f"""
  SELECT q.query_id, a.vec_id,
         list_dot_product({qj}, {qj})
         - 2 * list_dot_product({qj}, c.cem)
         + list_dot_product(c.cem, c.cem) AS dj
  FROM qfull q
  CROSS JOIN a{iters}_p{j} a
  JOIN cent{iters}_p{j} c ON c.cidx = a.cl""")
    u = "\n  UNION ALL\n".join(unions)
    return f"""WITH {",".join(chains)},
qfull AS (SELECT vec_id AS query_id, {em} AS em
          FROM embeddings WHERE vec_id < {n_queries}),
d AS ({u}),
s AS (SELECT query_id, vec_id, CAST(SUM(dj) AS BIGINT) AS dist
      FROM d GROUP BY query_id, vec_id),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY dist, vec_id) - 1 AS INTEGER) AS rank FROM s)
SELECT query_id, vec_id, dist, rank FROM r WHERE rank < {k}
"""


def kmeans_oracle(k: int = 8, iters: int = 4) -> str:
    return (_kmeans_cte(k, iters)
            + f"\nSELECT vec_id, CAST(cl AS BIGINT) AS cluster FROM a{iters}\n")


def semantic_dedup_oracle(k: int = 8, iters: int = 4,
                          tau: float = 0.95) -> str:
    """SemDeDup keep-set: within each k-means cluster, drop a row iff a
    LOWER-id row of the same cluster has round6 cosine ≥ tau with it
    (dominance rule — order-independent, no chaining).  Mirrors
    stages/kmeans.semantic_dedup."""
    from deepkg_ray.functions.numeric import SQL_COSINE
    cos = SQL_COSINE.format(a="b.em", b="a.em")
    return f"""{_kmeans_cte(k, iters)}
SELECT a.vec_id, CAST(a.cl AS BIGINT) AS cluster
FROM a{iters} a
WHERE NOT EXISTS (
  SELECT 1 FROM a{iters} b
  WHERE b.cl = a.cl AND b.vec_id < a.vec_id AND {cos} >= {tau})
"""


def knn_accuracy_oracle() -> str:
    """Mirror of similarity.knn_accuracy: exact integer quadratic
    distances, ties → lowest vec_id, per-label accuracy round6."""
    from deepkg_ray.functions.numeric import SQL_EMB_MICROS
    em = SQL_EMB_MICROS.format(e="embedding")
    return f"""
WITH v AS (SELECT vec_id, CAST(label AS BIGINT) AS label, {em} AS em
           FROM embeddings),
d AS (
  SELECT a.vec_id, a.label AS la, b.label AS lb, b.vec_id AS nb,
         list_dot_product(a.em, a.em)
         - 2 * list_dot_product(a.em, b.em)
         + list_dot_product(b.em, b.em) AS d2
  FROM v a JOIN v b ON b.vec_id <> a.vec_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY d2, nb) AS rn
  FROM d
)
SELECT la AS label, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN lb = la THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       floor(sum(CASE WHEN lb = la THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS accuracy
FROM r WHERE rn = 1 GROUP BY la
"""


def cluster_purity_oracle(k: int = 8, iters: int = 4) -> str:
    """Mirror of stages/kmeans.cluster_purity: confusion cells from the
    unrolled Lloyd assignment joined to the gold label, purity =
    round6(max cell / cluster size)."""
    return f"""{_kmeans_cte(k, iters)},
cells AS (
  SELECT a.cl, CAST(e.label AS BIGINT) AS label,
         CAST(count(*) AS BIGINT) AS n
  FROM a{iters} a JOIN embeddings e ON e.vec_id = a.vec_id
  GROUP BY a.cl, e.label
),
tots AS (
  SELECT cl, CAST(sum(n) AS BIGINT) AS cluster_n,
         CAST(max(n) AS BIGINT) AS mx
  FROM cells GROUP BY cl
)
SELECT CAST(c.cl AS BIGINT) AS cluster, c.label, c.n, t.cluster_n,
       floor(CAST(t.mx AS DOUBLE) / t.cluster_n * 1000000 + 0.5)
         / 1000000 AS purity
FROM cells c JOIN tots t ON t.cl = c.cl
"""


def cluster_nmi_oracle(k: int = 8, iters: int = 4) -> str:
    """Mirror of stages/kmeans.cluster_nmi: ln-micros MI/entropy sums
    over the confusion cells, one final mi/√(hc·hl) double op."""
    return f"""{_kmeans_cte(k, iters)},
cells AS (
  SELECT a.cl, CAST(e.label AS BIGINT) AS label,
         CAST(count(*) AS BIGINT) AS n
  FROM a{iters} a JOIN embeddings e ON e.vec_id = a.vec_id
  GROUP BY a.cl, e.label
),
tots AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
arow AS (SELECT cl, CAST(sum(n) AS BIGINT) AS a FROM cells GROUP BY cl),
brow AS (SELECT label, CAST(sum(n) AS BIGINT) AS b
         FROM cells GROUP BY label),
mi AS (
  SELECT CAST(sum(CAST(floor(
      (c.n / CAST(t.nn AS DOUBLE))
      * ln(CAST(c.n AS DOUBLE) * t.nn
           / (CAST(a.a AS DOUBLE) * b.b)) * 1e6 + 0.5) AS BIGINT))
    AS BIGINT) AS mi_m
  FROM cells c JOIN arow a ON a.cl = c.cl
  JOIN brow b ON b.label = c.label, tots t
),
hc AS (
  SELECT CAST(sum(CAST(floor(
      -(a / CAST(t.nn AS DOUBLE)) * ln(a / CAST(t.nn AS DOUBLE))
      * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS hc_m
  FROM arow, tots t
),
hl AS (
  SELECT CAST(sum(CAST(floor(
      -(b / CAST(t.nn AS DOUBLE)) * ln(b / CAST(t.nn AS DOUBLE))
      * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS hl_m
  FROM brow, tots t
)
SELECT t.nn AS n, mi.mi_m AS mi_micros, hc.hc_m AS hc_micros,
       hl.hl_m AS hl_micros,
       CASE WHEN hc.hc_m > 0 AND hl.hl_m > 0
            THEN floor(CAST(mi.mi_m AS DOUBLE)
                       / (sqrt(CAST(hc.hc_m AS DOUBLE))
                          * sqrt(CAST(hl.hl_m AS DOUBLE)))
                       * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS nmi
FROM tots t, mi, hc, hl
"""


def cluster_ari_oracle(k: int = 8, iters: int = 4) -> str:
    """Mirror of stages/kmeans.cluster_ari: exact integer pair counts,
    one final doubled-form round6 division."""
    return f"""{_kmeans_cte(k, iters)},
cells AS (
  SELECT a.cl, CAST(e.label AS BIGINT) AS label,
         CAST(count(*) AS BIGINT) AS n
  FROM a{iters} a JOIN embeddings e ON e.vec_id = a.vec_id
  GROUP BY a.cl, e.label
),
arow AS (SELECT cl, CAST(sum(n) AS BIGINT) AS a FROM cells GROUP BY cl),
brow AS (SELECT label, CAST(sum(n) AS BIGINT) AS b
         FROM cells GROUP BY label),
agg AS (
  SELECT (SELECT CAST(sum(n) AS BIGINT) FROM cells) AS nn,
         (SELECT CAST(sum(n * (n - 1) // 2) AS BIGINT) FROM cells) AS sij,
         (SELECT CAST(sum(a * (a - 1) // 2) AS BIGINT) FROM arow) AS sa,
         (SELECT CAST(sum(b * (b - 1) // 2) AS BIGINT) FROM brow) AS sb
),
f AS (
  SELECT nn, sij, sa, sb,
         2 * (nn * (nn - 1) // 2) * sij - 2 * sa * sb AS num2,
         (nn * (nn - 1) // 2) * (sa + sb) - 2 * sa * sb AS den2
  FROM agg
)
SELECT nn AS n, sij AS sum_cells_c2, sa AS sum_a_c2, sb AS sum_b_c2,
       CASE WHEN den2 <> 0
            THEN floor(CAST(num2 AS DOUBLE) / den2 * 1000000 + 0.5)
                 / 1000000
            ELSE 0.0 END AS ari
FROM f
"""


def silhouette_oracle(k: int = 8, iters: int = 4) -> str:
    """Mirror of stages/kmeans.silhouette_by_cluster: integer quadratic
    distances to every final centroid, a = own / b = min other, one sqrt
    + divide per point, micros-quantized and integer-summed per cluster."""
    return f"""{_kmeans_cte(k, iters)},
dists AS (
  SELECT a.vec_id, a.cl, c.cidx,
         list_dot_product(a.em, a.em)
         - 2 * list_dot_product(a.em, c.cem)
         + list_dot_product(c.cem, c.cem) AS d2
  FROM a{iters} a CROSS JOIN cent{iters} c
),
ab AS (
  SELECT vec_id, cl,
         sqrt(CAST(min(CASE WHEN cidx = cl THEN d2 END) AS DOUBLE)) AS da,
         sqrt(CAST(min(CASE WHEN cidx <> cl THEN d2 END) AS DOUBLE)) AS db
  FROM dists GROUP BY vec_id, cl
),
sm AS (
  SELECT cl,
         CAST(floor(CASE WHEN greatest(da, db) > 0
                         THEN (db - da) / greatest(da, db)
                         ELSE 0.0 END * 1000000 + 0.5) AS BIGINT) AS s
  FROM ab
)
SELECT CAST(cl AS BIGINT) AS cluster, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(s) AS BIGINT) AS s_micros,
       CAST(sum(s) AS DOUBLE) / count(*) / 1e6 AS mean_sil
FROM sm GROUP BY cl
"""


# ---------------------------------------------------------------------------
# Oracles over the driver's pre-registered testdata views (documents, events,
# lineitem, orders, customer, embeddings).  Float convention: see
# functions/numeric.py — round6(x) = floor(x*1e6+0.5)/1e6; float sums via
# per-element CAST(floor(x*1e6+0.5) AS BIGINT) then integer SUM.
# ---------------------------------------------------------------------------

def doc_stats_oracle(table: str = "documents") -> str:
    stop = "'the','and','of','to','in'"
    return f"""
WITH base AS (
  SELECT doc_id, text,
         length(text) AS n_chars_calc,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                   x -> x IN ({stop}))) END AS n_stop
  FROM {table}
), r AS (
  -- ratios as integer-valued micros; quality derived from the micros with
  -- one final floor — mirrors textstats.doc_stats_kernel op for op
  SELECT doc_id, n_chars_calc, n_tokens,
         floor(n_alpha * 1.0 / greatest(n_chars_calc, 1) * 1e6 + 0.5) AS a_m,
         floor(n_punct * 1.0 / greatest(n_chars_calc, 1) * 1e6 + 0.5) AS p_m,
         floor(n_stop * 1.0 / greatest(n_tokens, 1) * 1e6 + 0.5) AS s_m
  FROM base
)
SELECT doc_id, CAST(n_chars_calc AS BIGINT) AS n_chars_calc,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       a_m / 1e6 AS alpha_ratio, p_m / 1e6 AS punct_ratio,
       s_m / 1e6 AS stop_ratio,
       least(greatest(floor(0.4*a_m + 0.3*(least(n_tokens,100)*10000.0)
                            + 0.3*s_m + 0.5), 0.0), 1000000.0) / 1e6 AS quality
FROM r
"""


def _lr_chain(table: str = "documents", eta_num: int = 4,
              n_iters: int = 16, holdout: bool = False,
              seed: int = 9, train_cut: int = 204) -> str:
    """Shared CTE chain for the hard-sigmoid logistic-regression oracles
    (stages/logreg.py): doc_stats base counts → integer-micros features +
    distillation label → T unrolled (gradient, weight-update) CTE pairs.
    All arithmetic BIGINT with DuckDB's truncating `//`, mirroring the
    engine's tdiv — zero floats in the iterate."""
    stop = "'the','and','of','to','in'"
    am = "floor(n_alpha * 1.0 / greatest(n_chars_calc, 1) * 1e6 + 0.5)"
    sm = "floor(n_stop * 1.0 / greatest(n_tokens, 1) * 1e6 + 0.5)"
    qm = (f"least(greatest(floor(0.4*{am} + 0.3*(least(n_tokens,100)"
          f"*10000.0) + 0.3*{sm} + 0.5), 0.0), 1000000.0)")
    zex = ("(f.x0*w.w0 + f.x1*w.w1 + f.x2*w.w2 + f.x3*w.w3 "
           "+ f.x4*w.w4)")
    sig = f"least(greatest({zex} // 4000000 + 500000, 0), 1000000)"
    iters = []
    prev = "w0"
    for i in range(1, n_iters + 1):
        gs = ", ".join(
            f"CAST(SUM((({sig} - f.y*1000000) * f.x{j}) // 1000000) "
            f"AS BIGINT) AS g{j}" for j in range(5))
        ws = ", ".join(
            f"CAST(w.w{j} - ({eta_num}*g.g{j}) // c.n AS BIGINT) AS w{j}"
            for j in range(5))
        where = " WHERE f.tr = 1" if holdout else ""
        iters.append(
            f"g{i} AS MATERIALIZED (SELECT {gs} FROM f, {prev} w"
            f"{where}),\n"
            f"w{i} AS MATERIALIZED (SELECT {ws} FROM {prev} w, g{i} g, "
            f"cnt c)")
        prev = f"w{i}"
    chain = ",\n".join(iters)
    tr_col = (f",\n         CAST(CASE WHEN substr(md5('{seed}:' || "
              f"CAST(doc_id AS VARCHAR)), 1, 2) < '{train_cut:02x}' "
              f"THEN 1 ELSE 0 END AS BIGINT) AS tr"
              if holdout else "")
    cnt_where = " WHERE tr = 1" if holdout else ""
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id,
         length(text) AS n_chars_calc,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+'))
              END AS n_tokens,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(list_filter(string_split_regex(lower(trim(text)),
                                                      '\\s+'),
                                   x -> x IN ({stop}))) END AS n_stop
  FROM {table}
), f AS MATERIALIZED (
  SELECT doc_id,
         CAST(1000000 AS BIGINT) AS x0,
         CAST(least(n_chars_calc, 2000) * 500 AS BIGINT) AS x1,
         CAST(least(n_tokens, 400) * 2500 AS BIGINT) AS x2,
         CAST({am} AS BIGINT) AS x3,
         CAST({sm} AS BIGINT) AS x4,
         CAST(CASE WHEN {qm} / 1e6 >= 0.5 THEN 1 ELSE 0 END AS BIGINT)
             AS y{tr_col}
  FROM base
),
cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f{cnt_where}),
w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
              CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3,
              CAST(0 AS BIGINT) AS w4),
{chain}"""


def quality_lr_weights_oracle(table: str = "documents",
                              eta_num: int = 4,
                              n_iters: int = 16) -> str:
    """Mirror of logreg.lr_weight_table: final weight vector unpivoted
    to (feature, w_micros) rows."""
    rows = " UNION ALL ".join(
        f"SELECT '{name}' AS feature, w{j} AS w_micros FROM w{n_iters}"
        for j, name in enumerate(("bias", "len_capped", "tokens_capped",
                                  "alpha_ratio", "stop_ratio")))
    return _lr_chain(table, eta_num, n_iters) + "\n" + rows


def quality_lr_scores_oracle(table: str = "documents",
                             eta_num: int = 4,
                             n_iters: int = 16) -> str:
    """Mirror of logreg.lr_scores: per-doc exact int64 margin under the
    trained weights, pred = [z ≥ 0], distillation label."""
    zex = ("(f.x0*w.w0 + f.x1*w.w1 + f.x2*w.w2 + f.x3*w.w3 "
           "+ f.x4*w.w4)")
    return _lr_chain(table, eta_num, n_iters) + f"""
SELECT f.doc_id, CAST({zex} AS BIGINT) AS z_scaled,
       CAST(CASE WHEN {zex} >= 0 THEN 1 ELSE 0 END AS BIGINT) AS pred,
       f.y AS label
FROM f, w{n_iters} w
"""


def quality_lr_accuracy_oracle(table: str = "documents",
                               eta_num: int = 4,
                               n_iters: int = 16) -> str:
    """Mirror of logreg.lr_accuracy: integer confusion counts + one
    round6 float division."""
    zex = ("(f.x0*w.w0 + f.x1*w.w1 + f.x2*w.w2 + f.x3*w.w3 "
           "+ f.x4*w.w4)")
    return _lr_chain(table, eta_num, n_iters) + f"""
, p AS (SELECT f.y AS label,
               CASE WHEN {zex} >= 0 THEN 1 ELSE 0 END AS pred
        FROM f, w{n_iters} w)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(label) AS BIGINT) AS n_pos,
       CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct,
       floor(CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6
           AS train_accuracy
FROM p
"""


def quality_lr_holdout_oracle(table: str = "documents",
                              eta_num: int = 4,
                              n_iters: int = 16) -> str:
    """Mirror of logreg.lr_holdout: weights trained only on the md5-80%
    split (f.tr = 1 rows), both splits evaluated."""
    zex = ("(f.x0*w.w0 + f.x1*w.w1 + f.x2*w.w2 + f.x3*w.w3 "
           "+ f.x4*w.w4)")
    return _lr_chain(table, eta_num, n_iters, holdout=True) + f"""
, p AS (SELECT CASE WHEN f.tr = 1 THEN 'train' ELSE 'holdout' END
               AS split,
               f.y AS label,
               CASE WHEN {zex} >= 0 THEN 1 ELSE 0 END AS pred
        FROM f, w{n_iters} w)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct,
       floor(CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS accuracy
FROM p GROUP BY split
"""


def sequence_packing_oracle(window: int = 2048, sep_tokens: int = 1,
                            table: str = "documents") -> str:
    """Window-function re-derivation of the distributed prefix-sum packing
    (stages/packing.pack_sequences) — integer-exact."""
    return f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt
  FROM {table}
), e AS (
  SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
         CAST(nt + {sep_tokens} AS BIGINT) AS eff
  FROM t
), p AS (
  SELECT doc_id, n_tokens, eff,
         CAST(COALESCE(SUM(eff) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS token_start
  FROM e
)
SELECT doc_id, n_tokens, token_start,
       token_start // {window} AS pack_id,
       token_start % {window} AS pack_offset,
       (token_start + eff - 1) // {window} - token_start // {window} + 1
         AS n_packs_spanned
FROM p
"""


def packing_stats_oracle(window: int = 2048, sep_tokens: int = 1,
                         table: str = "documents") -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt
  FROM {table}
), e AS (
  SELECT doc_id, CAST(nt + {sep_tokens} AS BIGINT) AS eff FROM t
), p AS (
  SELECT doc_id, eff,
         CAST(COALESCE(SUM(eff) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS token_start
  FROM e
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COALESCE(MAX(token_start + eff), 0) AS BIGINT) AS total_tokens,
         CAST(COALESCE(SUM(CASE WHEN (token_start + eff - 1) // {window}
                            > token_start // {window} THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_straddlers
  FROM p
)
SELECT n_docs, total_tokens,
       CAST(CASE WHEN total_tokens = 0 THEN 0
            ELSE (total_tokens + {window} - 1) // {window} END AS BIGINT)
         AS n_packs,
       n_straddlers,
       CASE WHEN total_tokens = 0 THEN 0.0
            ELSE floor((total_tokens
                        - ((total_tokens + {window} - 1) // {window} - 1)
                          * {window}) * 1.0 / {window} * 1e6 + 0.5) / 1e6
            END AS last_fill
FROM agg
"""


def chunk_documents_oracle(chunk_size: int = 64, overlap: int = 16,
                           table: str = "documents") -> str:
    C, S = chunk_size, chunk_size - overlap
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x <> '') AS ws
  FROM {table}
), n AS (
  SELECT doc_id, ws, len(ws) AS n,
         CASE WHEN len(ws) = 0 THEN 0
              WHEN len(ws) <= {C} THEN 1
              ELSE (len(ws) - {C} + {S} - 1) // {S} + 1 END AS k
  FROM toks
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * {S} AS BIGINT) AS tok_start,
       CAST(least(i * {S} + {C}, n) AS BIGINT) AS tok_end,
       array_to_string(ws[i * {S} + 1 : least(i * {S} + {C}, n)], ' ')
         AS chunk_text
FROM n, unnest(generate_series(0, k - 1)) AS t(i)
"""


def stratified_exact_k_oracle(k: int = 10, group_col: str = "source",
                              table: str = "documents") -> str:
    return f"""
SELECT {group_col}, doc_id FROM {table}
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY {group_col}
    ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id) <= {k}
"""


def global_shuffle_positions_oracle(seed: int = 7,
                                    table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (
           ORDER BY md5_number_lower('{seed}:' || CAST(doc_id AS VARCHAR)),
                    doc_id) - 1 AS BIGINT) AS shuffle_pos
FROM {table}
"""


def sample_exact_k_oracle(k: int = 100, table: str = "documents") -> str:
    return f"""
SELECT doc_id FROM {table}
ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id
LIMIT {k}
"""


def bpe_token_counts_oracle(table: str = "documents") -> str:
    """regexp_extract_all under the identical RE2-safe pre-tokenizer
    pattern (textstats.BPE_PRETOKEN_PATTERN); ratio from integer micros."""
    from deepkg_ray.stages.textstats import BPE_PRETOKEN_PATTERN
    sqlpat = BPE_PRETOKEN_PATTERN.replace("'", "''")
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{sqlpat}')) AS BIGINT)
           AS n_bpe_tokens,
         CASE WHEN trim(text) = '' THEN 0
              ELSE CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
              END AS n_ws_tokens
  FROM {table}
)
SELECT doc_id, n_bpe_tokens, n_ws_tokens,
       floor(n_bpe_tokens * 1.0 / greatest(n_ws_tokens, 1) * 1e6 + 0.5) / 1e6
         AS bpe_per_ws
FROM base
"""


def source_fertility_oracle(table: str = "documents") -> str:
    """Mirror of textstats.source_fertility: corpus-ratio fertility from
    exact integer sums under the identical RE2-safe pre-tokenizer."""
    from deepkg_ray.stages.textstats import BPE_PRETOKEN_PATTERN
    sqlpat = BPE_PRETOKEN_PATTERN.replace("'", "''")
    return f"""
WITH base AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '{sqlpat}')) AS BIGINT)
           AS n_bpe,
         CASE WHEN trim(text) = '' THEN 0
              ELSE CAST(len(string_split_regex(trim(text), '\\s+'))
                        AS BIGINT) END AS n_ws
  FROM {table}
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_bpe) AS BIGINT) AS sum_bpe,
         CAST(SUM(n_ws) AS BIGINT) AS sum_ws
  FROM base GROUP BY source
)
SELECT source, n_docs, sum_bpe, sum_ws,
       floor(CAST(sum_bpe AS DOUBLE) / greatest(sum_ws, 1) * 1e6 + 0.5)
           / 1e6 AS fertility
FROM agg
"""


def lang_id_oracle() -> str:
    langs = {
        "en": "'the','and','of','to','in'",
        "de": "'der','die','und','das','ist'",
        "es": "'el','la','los','y','de'",
        "fr": "'le','la','les','et','des'",
    }
    hit_cols = ", ".join(
        f"len(list_filter(toks, x -> x IN ({sw}))) AS h_{lg}"
        for lg, sw in langs.items())
    return f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(lower(trim(text)), '\\s+') END AS toks
  FROM documents
), hits AS (SELECT doc_id, {hit_cols} FROM toks)
SELECT doc_id,
       CASE WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr AND h_en > 0 THEN 'en'
            WHEN h_de >= h_es AND h_de >= h_fr AND h_de > 0 THEN 'de'
            WHEN h_es >= h_fr AND h_es > 0 THEN 'es'
            WHEN h_fr > 0 THEN 'fr'
            ELSE 'unknown' END AS lang_detected
FROM hits
"""


def dedup_exact_oracle() -> str:
    return """
SELECT md5(text) AS content_hash,
       CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY text
"""


def dedup_stats_oracle() -> str:
    return """
WITH g AS (SELECT count(*) c FROM documents GROUP BY text)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(c) AS BIGINT) AS n_docs,
       CAST(sum(c) - count(*) AS BIGINT) AS n_dup_docs
FROM g
"""


def bigram_counts_oracle() -> str:
    return """
WITH toks AS (
  SELECT CASE WHEN trim(text)='' THEN []
              ELSE string_split_regex(lower(trim(text)), '\\s+') END AS ws
  FROM documents
), big AS (
  SELECT ws[i] AS w1, ws[i+1] AS w2
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) g
)
SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt FROM big GROUP BY w1, w2
"""


def word_idf_oracle() -> str:
    return """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w1
  FROM documents WHERE trim(text) <> ''
), df AS (
  SELECT w1, count(DISTINCT doc_id) AS df FROM toks GROUP BY w1
)
SELECT w1, CAST(df AS BIGINT) AS df,
       floor(ln((SELECT count(*) FROM documents) * 1.0 / df) * 1e6 + 0.5) / 1e6 AS idf
FROM df
"""


def tfidf_top_terms_oracle(k: int = 5) -> str:
    """Mirror of stages/phrasemine.tfidf_top_terms: score =
    round6(tf × round6(ln(N/df))), ties (score desc, term asc)."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), dfq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
), sc AS (
  SELECT t.doc_id, t.term, t.tf,
         floor(t.tf * (floor(ln((SELECT count(*) FROM documents) * 1.0 / d.df)
                             * 1e6 + 0.5) / 1e6) * 1e6 + 0.5) / 1e6 AS score
  FROM tf t JOIN dfq d USING (term)
), r AS (
  SELECT sc.*, row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term) AS rnk
  FROM sc
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, score,
       CAST(rnk AS BIGINT) AS "rank"
FROM r WHERE rnk <= {k}
"""


def pmi_bigrams_oracle() -> str:
    return """
WITH toks AS (
  SELECT CASE WHEN trim(text)='' THEN []
              ELSE string_split_regex(lower(trim(text)), '\\s+') END AS ws
  FROM documents
), uni AS (
  SELECT w, count(*) AS c FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY w
), big AS (
  SELECT ws[i] AS w1, ws[i+1] AS w2
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) g
), bc AS (
  SELECT w1, w2, count(*) AS cnt FROM big GROUP BY w1, w2
), tot AS (
  SELECT (SELECT sum(c) FROM uni) AS n1, (SELECT sum(cnt) FROM bc) AS n2
)
SELECT bc.w1, bc.w2, CAST(bc.cnt AS BIGINT) AS cnt,
       floor(ln((bc.cnt / t.n2) / ((u1.c / t.n1) * (u2.c / t.n1))) * 1e6 + 0.5) / 1e6 AS pmi
FROM bc, tot t
JOIN uni u1 ON u1.w = bc.w1
JOIN uni u2 ON u2.w = bc.w2
"""


def neighbor_entropy_oracle() -> str:
    return """
WITH toks AS (
  SELECT row_number() OVER () AS doc, ws FROM (
    SELECT CASE WHEN trim(text)='' THEN []
                ELSE string_split_regex(lower(trim(text)), '\\s+') END AS ws
    FROM documents)
), pairs AS (
  SELECT ws[i] AS w1,
         CASE WHEN i+1 <= len(ws) THEN ws[i+1] ELSE '∅' END AS nb
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) g
), pc2 AS (
  SELECT w1, nb, count(*) AS cnt FROM pairs GROUP BY w1, nb
), tot AS (
  SELECT w1, sum(cnt) AS total FROM pc2 GROUP BY w1
)
SELECT p.w1,
       floor(-sum((p.cnt * 1.0 / t.total) * ln(p.cnt * 1.0 / t.total)) * 1e6 + 0.5) / 1e6 AS entropy
FROM pc2 p JOIN tot t ON p.w1 = t.w1
GROUP BY p.w1
"""


def ann_topk_oracle(n_queries: int = 8, k: int = 10) -> str:
    from deepkg_ray.functions.numeric import SQL_COSINE, SQL_EMB_MICROS
    cos = SQL_COSINE.format(a="q.qm", b="e.em")
    return f"""
WITH q AS (SELECT vec_id AS query_id,
                  {SQL_EMB_MICROS.format(e="embedding")} AS qm
           FROM embeddings WHERE vec_id < {n_queries}),
em AS (SELECT vec_id, {SQL_EMB_MICROS.format(e="embedding")} AS em
       FROM embeddings),
s AS (
  SELECT q.query_id, e.vec_id, {cos} AS cosine
  FROM q CROSS JOIN em e
), r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, vec_id) - 1 AS INTEGER) AS rank
  FROM s
)
SELECT query_id, vec_id, cosine, rank FROM r WHERE rank < {k}
"""


def hard_negatives_oracle(n_anchors: int = 8, k: int = 5) -> str:
    """Brute-force mirror of stages/similarity.hard_negatives: per anchor
    (vec_id < n_anchors), top-k round6 cosine among different-label rows,
    rank ordered (cosine DESC, vec_id)."""
    from deepkg_ray.functions.numeric import SQL_COSINE, SQL_EMB_MICROS
    cos = SQL_COSINE.format(a="a.am", b="e.em")
    return f"""
WITH a AS (SELECT vec_id AS anchor_id, label AS albl,
                  {SQL_EMB_MICROS.format(e="embedding")} AS am
           FROM embeddings WHERE vec_id < {n_anchors}),
em AS (SELECT vec_id, label, {SQL_EMB_MICROS.format(e="embedding")} AS em
       FROM embeddings),
s AS (
  SELECT a.anchor_id, e.vec_id, {cos} AS cosine
  FROM a JOIN em e ON e.label <> a.albl
), r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY anchor_id
                 ORDER BY cosine DESC, vec_id) - 1 AS INTEGER) AS rank
  FROM s
)
SELECT anchor_id, vec_id, cosine, rank FROM r WHERE rank < {k}
"""


def embedding_near_dup_oracle(threshold: float = 0.3) -> str:
    from deepkg_ray.functions.numeric import SQL_COSINE, SQL_EMB_MICROS
    cos = SQL_COSINE.format(a="a.em", b="b.em")
    return f"""
WITH m AS (SELECT vec_id, label,
                  {SQL_EMB_MICROS.format(e="embedding")} AS em
           FROM embeddings),
p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cosine
  FROM m a JOIN m b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= {threshold}
"""


def embedding_near_dup_lsh_oracle(threshold: float = 0.45) -> str:
    """All-pairs (label-free) variant: the hyperplane-LSH engine path must
    recover every qualifying pair to hash-match this."""
    from deepkg_ray.functions.numeric import SQL_COSINE, SQL_EMB_MICROS
    cos = SQL_COSINE.format(a="a.em", b="b.em")
    return f"""
WITH m AS (SELECT vec_id, {SQL_EMB_MICROS.format(e="embedding")} AS em
           FROM embeddings),
p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cosine
  FROM m a JOIN m b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= {threshold}
"""


def events_window_oracle(window_sec: int = 300) -> str:
    win_us = window_sec * 1_000_000
    return f"""
SELECT event_type,
       (epoch_us(ts) // {win_us}) * {win_us} AS window_start_us,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) / 1e6 AS sum_value
FROM events
GROUP BY event_type, window_start_us
"""


def watermark_late_oracle(lateness_us: int = 60_000_000,
                          window_us: int = 60_000_000) -> str:
    """Mirror of windows.watermark_late_counts: arrival order is
    (user_id, event_id); the watermark is the exclusive running MAX event
    time over that order minus the allowed lateness; NULL prefix (the
    first arrival) is on time."""
    return f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
w AS (SELECT us,
             MAX(us) OVER (ORDER BY user_id, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS pm
      FROM e)
SELECT (us // {window_us}) * {window_us} AS window_start_us,
       CAST(count(*) FILTER (WHERE pm IS NOT NULL
                             AND us < pm - {lateness_us}) AS BIGINT) AS n_late,
       CAST(count(*) FILTER (WHERE pm IS NULL
                             OR us >= pm - {lateness_us}) AS BIGINT) AS n_ontime
FROM w GROUP BY window_start_us
"""


def session_type_pairs_oracle(gap_sec: int = 1800) -> str:
    """Mirror of windows.session_type_pairs: window-function session ids
    (cumsum of gap breaks over (us, event_id) order), distinct
    (user, session, type), self-join for pairs."""
    gap_us = gap_sec * 1_000_000
    return f"""
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events),
w AS (SELECT user_id, event_type, us, event_id,
             CASE WHEN us - lag(us) OVER (PARTITION BY user_id
                                          ORDER BY us, event_id)
                  > {gap_us} THEN 1 ELSE 0 END AS brk
      FROM e),
sids AS (SELECT user_id, event_type,
                SUM(brk) OVER (PARTITION BY user_id
                               ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
         FROM w),
dt AS (SELECT DISTINCT user_id, sid, event_type FROM sids)
SELECT a.event_type AS t1, b.event_type AS t2,
       CAST(count(*) AS BIGINT) AS n_sessions
FROM dt a JOIN dt b ON a.user_id = b.user_id AND a.sid = b.sid
                    AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type
"""


def session_paths_oracle(gap_sec: int = 1800, prefix_len: int = 3) -> str:
    """Mirror of windows.session_paths: session ids via the gap-break
    window sum (session_type_pairs' derivation), first-``prefix_len``
    ranks string_agg'd in order."""
    gap_us = gap_sec * 1_000_000
    return f"""
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events),
w AS (SELECT user_id, event_type, us, event_id,
             CASE WHEN us - lag(us) OVER (PARTITION BY user_id
                                          ORDER BY us, event_id)
                  > {gap_us} THEN 1 ELSE 0 END AS brk
      FROM e),
sids AS (SELECT user_id, event_type, us, event_id,
                SUM(brk) OVER (PARTITION BY user_id
                               ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
         FROM w),
r AS (SELECT user_id, sid, event_type,
             row_number() OVER (PARTITION BY user_id, sid
                                ORDER BY us, event_id) AS rn
      FROM sids),
p AS (SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= {prefix_len} GROUP BY user_id, sid)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM p GROUP BY path
"""


def order_type_diversity_oracle() -> str:
    """Mirror of relational.order_type_diversity."""
    return """
WITH c AS (
  SELECT l.l_orderkey,
         CAST(count(DISTINCT p.p_type) AS BIGINT) AS n_types
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY l.l_orderkey)
SELECT n_types, CAST(count(*) AS BIGINT) AS n_orders
FROM c GROUP BY n_types
"""


def brand_hhi_oracle() -> str:
    """Mirror of relational.brand_hhi: per-(type, brand) revenue micros
    (the module floor(ext·(1−disc)·1e6+0.5) convention), HUGEINT share
    squares, one double division per type."""
    return """
WITH r AS (
  SELECT p.p_type, p.p_brand,
         CAST(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                             * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS rm
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_type, p.p_brand
)
SELECT p_type, CAST(count(*) AS BIGINT) AS n_brands,
       CAST(SUM(rm) AS BIGINT) AS total_micros,
       CAST(SUM(CAST(rm AS HUGEINT) * rm) AS DOUBLE)
         / (CAST(CAST(SUM(rm) AS BIGINT) AS DOUBLE)
            * CAST(SUM(rm) AS BIGINT)) AS hhi
FROM r GROUP BY p_type
"""


def order_line_histogram_oracle() -> str:
    """Mirror of relational.order_line_histogram: count-of-counts."""
    return """
WITH c AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
           FROM lineitem GROUP BY l_orderkey)
SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
FROM c GROUP BY n_lines
"""


def revenue_concentration_oracle() -> str:
    """Mirror of relational.revenue_concentration: per-customer micros
    sums, sorted-form integer Gini via row_number, rank-cut top-k
    shares (tie-invariant)."""
    return """
WITH r AS (SELECT o_custkey,
                  CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5)
                                AS BIGINT)) AS BIGINT) AS rm
           FROM orders GROUP BY o_custkey),
t AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(rm) AS BIGINT) AS tot FROM r),
s AS (SELECT rm, row_number() OVER (ORDER BY rm) AS rn FROM r),
gn AS (SELECT 2 * SUM(rn * rm)
               - ((SELECT n FROM t) + 1) * (SELECT tot FROM t)
               AS gini_num FROM s),
d AS (SELECT rm, row_number() OVER (ORDER BY rm DESC) AS dn FROM r),
k AS (SELECT greatest(n // 10, 1) AS k10,
             greatest(n // 100, 1) AS k1 FROM t),
t10 AS (SELECT CAST(COALESCE(SUM(rm), 0) AS BIGINT) AS m
        FROM d, k WHERE dn <= k.k10),
t1 AS (SELECT CAST(COALESCE(SUM(rm), 0) AS BIGINT) AS m
       FROM d, k WHERE dn <= k.k1)
SELECT t.n AS n_customers, t.tot AS total_micros,
       CAST(gn.gini_num AS DOUBLE)
         / (CAST(t.n AS DOUBLE) * t.tot) AS gini,
       t10.m AS top10_micros,
       CAST(t10.m AS DOUBLE) / t.tot AS top10_share,
       t1.m AS top1_micros,
       CAST(t1.m AS DOUBLE) / t.tot AS top1_share
FROM t, gn, t10, t1
"""


def first_touch_attribution_oracle(purchase_type: str = "purchase") -> str:
    """Mirror of windows.first_touch_attribution: first event per user by
    (us, event_id), purchase count + value micros rolled up per first
    type; revenue is the single micros division."""
    return f"""
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                  CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
           FROM events),
f AS (SELECT user_id, event_type AS first_type FROM e
      QUALIFY row_number() OVER (PARTITION BY user_id
                                 ORDER BY us, event_id) = 1),
p AS (SELECT user_id,
             CAST(COUNT(CASE WHEN event_type = '{purchase_type}'
                             THEN 1 END) AS BIGINT) AS np,
             CAST(COALESCE(SUM(CASE WHEN event_type = '{purchase_type}'
                                    THEN vm END), 0) AS BIGINT) AS rm
      FROM e GROUP BY user_id)
SELECT f.first_type, CAST(count(*) AS BIGINT) AS n_users,
       CAST(SUM(p.np) AS BIGINT) AS n_purchases,
       CAST(SUM(p.rm) AS BIGINT) AS rev_micros,
       CAST(SUM(p.rm) AS DOUBLE) / 1e6 AS revenue
FROM f JOIN p USING (user_id) GROUP BY f.first_type
"""


def user_time_weighted_avg_oracle() -> str:
    """Mirror of windows.user_time_weighted_avg: LEAD step-function
    integral with whole-second gaps, one double division."""
    return """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                  CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
           FROM events),
l AS (SELECT user_id, vm,
             (lead(us) OVER w - us) // 1000000 AS dt
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
      QUALIFY dt IS NOT NULL),
m AS (SELECT user_id, CAST(count(*) + 1 AS BIGINT) AS n_events,
             CAST(SUM(dt) AS BIGINT) AS den,
             CAST(SUM(vm * dt) AS BIGINT) AS num
      FROM l GROUP BY user_id)
SELECT user_id, n_events, den AS span_s,
       floor(num / CAST(den AS DOUBLE) + 0.5) / 1e6 AS twa
FROM m WHERE den > 0
"""


def duplicate_event_audit_oracle(eps_sec: int = 5) -> str:
    """Mirror of windows.duplicate_event_audit: lag over the user
    stream, same-type/same-micros/within-eps dup flags per type."""
    eps_us = eps_sec * 1_000_000
    return f"""
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                  CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
           FROM events),
l AS (SELECT event_type,
             CASE WHEN event_type = lag(event_type) OVER w
                   AND vm = lag(vm) OVER w
                   AND us - lag(us) OVER w <= {eps_us}
                  THEN 1 ELSE 0 END AS dup
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(dup) AS BIGINT) AS n_dups,
       floor(SUM(dup) / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS dup_rate
FROM l GROUP BY event_type
"""


def user_regularity_oracle() -> str:
    """Mirror of windows.user_regularity: lag gaps in whole seconds,
    per-user integer moments, one double VMR division."""
    return """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
gp AS (SELECT user_id,
              (us - lag(us) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id)) // 1000000 AS g
       FROM e QUALIFY g IS NOT NULL),
m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(g) AS BIGINT) AS sg,
             CAST(SUM(g * g) AS BIGINT) AS sg2
      FROM gp GROUP BY user_id)
SELECT user_id, n AS n_gaps, sg AS sum_gap_s,
       CASE WHEN n * sg = 0 THEN 0.0
            ELSE CAST(CAST(n AS HUGEINT) * sg2
                      - CAST(sg AS HUGEINT) * sg AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * sg AS DOUBLE) END AS vmr
FROM m WHERE n >= 2
"""


def seasonality_strength_oracle() -> str:
    """Mirror of windows.seasonality_strength: calendar-complete daily
    counts, integer moments, micros-quantized per-dow between terms."""
    return """
WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY day),
b AS (SELECT min(day) AS d0, max(day) AS d1,
             CAST(max(day) - min(day) + 1 AS BIGINT) AS dd FROM c),
g AS (SELECT unnest(generate_series(b.d0, b.d1)) AS day FROM b),
f AS (SELECT g.day, CAST((g.day + 4) % 7 AS BIGINT) AS dow,
             CAST(COALESCE(c.n, 0) AS BIGINT) AS n
      FROM g LEFT JOIN c USING (day)),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS s,
             CAST(SUM(n * n) AS BIGINT) AS ss FROM f),
m AS (SELECT dow, CAST(SUM(n) AS BIGINT) AS sd,
             CAST(count(*) AS BIGINT) AS dc FROM f GROUP BY dow),
mt AS (SELECT CAST(t.s AS DOUBLE) / b.dd AS mu,
              CAST(t.ss AS DOUBLE) / b.dd
                - (CAST(t.s AS DOUBLE) / b.dd)
                  * (CAST(t.s AS DOUBLE) / b.dd) AS var_total
       FROM t, b),
terms AS (SELECT CAST(floor(
            m.dc * (CAST(m.sd AS DOUBLE) / m.dc - mt.mu)
                 * (CAST(m.sd AS DOUBLE) / m.dc - mt.mu)
                 * 1e6 + 0.5) AS BIGINT) AS tm
          FROM m, mt),
vb AS (SELECT CAST(SUM(tm) AS DOUBLE) / 1e6 / (SELECT dd FROM b)
         AS var_between FROM terms)
SELECT b.dd AS n_days, t.s AS total, mt.var_total, vb.var_between,
       CASE WHEN mt.var_total > 0
            THEN floor(vb.var_between / mt.var_total * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS strength
FROM b, t, mt, vb
"""


def survival_curve_oracle(event_type: str = "purchase") -> str:
    """Mirror of windows.survival_curve: per-user min/min/max triple,
    day-duration histogram, suffix-sum risk sets, ln-micros cumulative
    product with the d = n_risk zero-pin."""
    return f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
u AS (SELECT user_id, min(us) AS f,
             min(CASE WHEN event_type = '{event_type}' THEN us END) AS p,
             max(us) AS l
      FROM e GROUP BY user_id),
t AS (SELECT CASE WHEN p IS NOT NULL THEN (p - f) // 86400000000
                  ELSE (l - f) // 86400000000 END AS t_days,
             CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM u),
h AS (SELECT t_days, CAST(count(*) AS BIGINT) AS c,
             CAST(SUM(ev) AS BIGINT) AS d
      FROM t GROUP BY t_days),
r AS (SELECT t_days, c, d,
             CAST(SUM(c) OVER (ORDER BY t_days
                               ROWS BETWEEN CURRENT ROW
                               AND UNBOUNDED FOLLOWING) AS BIGINT)
               AS n_risk
      FROM h),
k AS (SELECT t_days, n_risk, d,
             CASE WHEN d = n_risk THEN 1 ELSE 0 END AS dead,
             CASE WHEN d = n_risk THEN 0
                  ELSE CAST(floor(ln(1 - d / CAST(n_risk AS DOUBLE))
                                  * 1e6 + 0.5) AS BIGINT) END AS lm
      FROM r),
s AS (SELECT t_days, n_risk, d,
             SUM(lm) OVER (ORDER BY t_days) AS cum,
             MAX(dead) OVER (ORDER BY t_days) AS anydead
      FROM k)
SELECT t_days, n_risk, d,
       CASE WHEN anydead = 1 THEN 0.0
            ELSE floor(exp(CAST(cum AS DOUBLE) / 1e6) * 1e6 + 0.5) / 1e6
       END AS survival
FROM s WHERE d > 0
"""


def dow_daily_anomaly_oracle(thresh: float = 2.0) -> str:
    """Mirror of windows.dow_daily_anomaly: calendar-complete daily
    counts, per-dow integer moments, the identical double z chain."""
    return f"""
WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY day),
b AS (SELECT min(day) AS d0, max(day) AS d1 FROM c),
g AS (SELECT unnest(generate_series(b.d0, b.d1)) AS day FROM b),
f AS (SELECT g.day, CAST((g.day + 4) % 7 AS BIGINT) AS dow,
             CAST(COALESCE(c.n, 0) AS BIGINT) AS n
      FROM g LEFT JOIN c USING (day)),
m AS (SELECT dow, CAST(SUM(n) AS BIGINT) AS s,
             CAST(SUM(n * n) AS BIGINT) AS ss,
             CAST(count(*) AS BIGINT) AS dc
      FROM f GROUP BY dow),
z AS (SELECT f.day, f.dow, f.n,
             CAST(m.s AS DOUBLE) / m.dc AS mu,
             CAST(m.ss AS DOUBLE) / m.dc
               - (CAST(m.s AS DOUBLE) / m.dc)
                 * (CAST(m.s AS DOUBLE) / m.dc) AS var
      FROM f JOIN m USING (dow)),
r AS (SELECT day, dow, n,
             CASE WHEN var <= 0 THEN 0.0
                  ELSE floor((n - mu) / sqrt(var) * 1e6 + 0.5) / 1e6
             END AS z
      FROM z)
SELECT CAST(day * 86400000000 AS BIGINT) AS day_us, dow, n, z,
       CAST(CASE WHEN abs(z) > {thresh} THEN 1 ELSE 0 END AS BIGINT)
         AS is_outlier
FROM r
"""


def cusum_changepoint_oracle() -> str:
    """Mirror of windows.cusum_changepoint: calendar-complete daily
    counts via generate_series, scaled integer statistic
    s_k = D·prefix_k − k·total, argmax |s| (tie → earliest day), one
    round6 division at the end."""
    return """
WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY day),
b AS (SELECT min(day) AS d0, max(day) AS d1,
             CAST(max(day) - min(day) + 1 AS BIGINT) AS dd,
             CAST(sum(n) AS BIGINT) AS total FROM c),
g AS (SELECT unnest(generate_series(b.d0, b.d1)) AS day FROM b),
f AS (SELECT g.day, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
      FROM g LEFT JOIN c USING (day)),
p AS (SELECT day, SUM(n) OVER (ORDER BY day) AS pre,
             row_number() OVER (ORDER BY day) AS k FROM f),
s AS (SELECT p.day, b.dd * p.pre - p.k * b.total AS sv FROM p, b),
w AS (SELECT s.day, s.sv FROM s ORDER BY abs(s.sv) DESC, s.day LIMIT 1)
SELECT CAST(w.day * 86400000000 AS BIGINT) AS change_day_us,
       floor(CAST(w.sv AS DOUBLE) / b.dd * 1e6 + 0.5) / 1e6 AS cusum,
       b.dd AS n_days, b.total AS total
FROM w, b
"""


def expfit_ks_oracle() -> str:
    """Mirror of windows.expfit_ks: MLE mean = Σgap/n, KS sup over the
    gap histogram support, round6."""
    mean = "(CAST(t.s AS DOUBLE) / t.n)"
    f = f"(1 - exp(-(c.gap / {mean})))"
    return f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
gp AS (SELECT us - lag(us) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id) AS gap
       FROM e QUALIFY gap IS NOT NULL),
h AS (SELECT gap, CAST(count(*) AS BIGINT) AS cnt FROM gp GROUP BY gap),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(gap * cnt) AS BIGINT) AS s FROM h),
c AS (SELECT gap, cnt, SUM(cnt) OVER (ORDER BY gap) AS cum FROM h)
SELECT t.n, t.s AS sum_gap_us,
       floor(max(greatest(
           abs(c.cum / CAST(t.n AS DOUBLE) - {f}),
           abs((c.cum - c.cnt) / CAST(t.n AS DOUBLE) - {f})))
           * 1000000 + 0.5) / 1000000 AS ks_d
FROM c, t GROUP BY t.n, t.s
"""


def user_activity_streaks_oracle() -> str:
    """Mirror of windows.user_activity_streaks: the day − row_number()
    gaps-and-islands identity."""
    return """
WITH d AS (SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 AS day FROM events),
r AS (SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id
                                      ORDER BY day) AS grp
      FROM d),
i AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
      FROM r GROUP BY user_id, grp)
SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(max(len) AS BIGINT) AS longest_streak
FROM i GROUP BY user_id
"""


def trending_per_window_oracle(window_us: int = 3_600_000_000,
                               k: int = 3) -> str:
    """Mirror of windows.trending_per_window: row_number over
    (n DESC, type) per tumbling window."""
    return f"""
WITH c AS (
  SELECT (epoch_us(ts) // {window_us}) * {window_us} AS window_start_us,
         event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY window_start_us, event_type
),
r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY window_start_us
                 ORDER BY n DESC, event_type) AS BIGINT) AS rnk
  FROM c
)
SELECT window_start_us, event_type, n, rnk FROM r WHERE rnk <= {k}
"""


def sessionize_oracle(gap_sec: int = 1800) -> str:
    gap_us = gap_sec * 1_000_000
    return f"""
WITH e AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
  FROM events
)
SELECT user_id,
       CAST(1 + sum(CASE WHEN pts IS NULL THEN 0
                         WHEN epoch_us(ts) - epoch_us(pts) > {gap_us} THEN 1
                         ELSE 0 END) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events
FROM e GROUP BY user_id
"""


def pricing_summary_oracle() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       sum(CAST(floor(l_quantity * 1e6 + 0.5) AS BIGINT)) / 1e6 AS sum_qty,
       sum(CAST(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT)) / 1e6 AS sum_base_price,
       sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1e6 + 0.5) AS BIGINT)) / 1e6 AS sum_revenue,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def top_revenue_orders_oracle(k: int = 10) -> str:
    return f"""
WITH r AS (
  SELECT l_orderkey,
         sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1e6 + 0.5) AS BIGINT)) AS rev_micros
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey, rev_micros / 1e6 AS revenue
FROM r ORDER BY rev_micros DESC, l_orderkey LIMIT {k}
"""


def segment_revenue_oracle() -> str:
    return """
SELECT c.c_mktsegment,
       sum(CAST(floor(o.o_totalprice * 1e6 + 0.5) AS BIGINT)) / 1e6 AS total_revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def distinct_event_types_oracle() -> str:
    return """
SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY event_type
"""


def conv_cumulative_triples_sql(sf_dir: str) -> str:
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
c AS (
  SELECT conv_id, turn_idx, CAST(count(*) AS BIGINT) AS n_triples
  FROM triples GROUP BY conv_id, turn_idx
)
SELECT conv_id, turn_idx, n_triples,
       CAST(sum(n_triples) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT) AS cum_triples
FROM c
"""


def frequent_phrases_oracle(n: int = 2, topk: int = 50, min_count: int = 2) -> str:
    stop = ",".join(f"'{w}'" for w in
                    "the a an and of to in is are was were be been it this that".split())
    return f"""
WITH toks AS (
  SELECT CASE WHEN trim(text)='' THEN []
              ELSE string_split_regex(lower(trim(text)), '\\s+') END AS ws
  FROM documents
), big AS (
  SELECT ws[i] AS w1, ws[i+1] AS w2
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) g
), counts AS (
  SELECT w1, w2, count(*) AS cnt FROM big GROUP BY w1, w2
)
SELECT w1 || ' ' || w2 AS phrase, CAST(cnt AS BIGINT) AS cnt
FROM counts
WHERE cnt >= {min_count}
  AND w1 NOT IN ({stop}) AND w2 NOT IN ({stop})
  AND NOT regexp_matches(w1, '[^a-z0-9 ]') AND NOT regexp_matches(w2, '[^a-z0-9 ]')
ORDER BY cnt DESC, phrase LIMIT {topk}
"""


def transcript_sample_oracle(sf_dir: str, keep_pct: int = 30) -> str:
    cut_hex = format(keep_pct * 256 // 100, "02x")
    return f"""
SELECT role, CAST(count(*) AS BIGINT) AS n_kept
FROM read_parquet('{_transcripts_glob(sf_dir)}')
WHERE substr(md5(conv_id || ':' || CAST(turn_idx AS VARCHAR)), 1, 2) < '{cut_hex}'
GROUP BY role
"""


def duplicate_turn_groups_oracle(sf_dir: str) -> str:
    return f"""
SELECT md5(text) AS content_hash, CAST(count(*) AS BIGINT) AS n_turns,
       min(conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 8, '0')) AS first_src
FROM read_parquet('{_transcripts_glob(sf_dir)}')
GROUP BY text HAVING count(*) > 1
"""


def pruned_token_counts_oracle(min_freq: int = 2) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents WHERE trim(text) <> ''
), freq AS (SELECT w, count(*) AS c FROM toks GROUP BY w)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_kept
FROM toks t JOIN freq f ON t.w = f.w
WHERE f.c > {min_freq}
GROUP BY t.doc_id
"""


def conv_context_oracle(sf_dir: str, window: int = 2) -> str:
    """Previous-`window`-turn context per turn via window functions (the
    engine computes it with salted blocks + overlap carry; this oracle
    validates cross-block correctness)."""
    lags = ", ".join(
        f"lag(text, {k}) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS l{k}"
        for k in range(window, 0, -1))
    concat_args = ", ".join(f"l{k}" for k in range(window, 0, -1))
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, text, {lags}
  FROM read_parquet('{_transcripts_glob(sf_dir)}')
)
SELECT conv_id, turn_idx, concat_ws(' | ', {concat_args}) AS context
FROM t
"""


def events_sql(sf_dir: str) -> str:
    from deepkg_ray.synth import EVENT_TYPES
    trig = ", ".join(f"'{t}'" for t in EVENT_TYPES)
    pat = r"(?:^|\. )alert: ([a-z]+?) at ([a-z][a-z0-9, -]*?) involving ([a-z][a-z0-9, -]*?)\."
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
raw AS (
  SELECT conv_id, turn_idx,
         unnest(regexp_extract_all(txt, '{pat}', 1)) AS event_type,
         unnest(regexp_extract_all(txt, '{pat}', 2)) AS place_text,
         unnest(regexp_extract_all(txt, '{pat}', 3)) AS actor_text
  FROM t
)
SELECT r.conv_id, r.turn_idx, r.event_type,
       r.place_text, dp.entity_id AS place_id,
       r.actor_text, da.entity_id AS actor_id
FROM raw r
JOIN dict dp ON dp.surface = r.place_text AND dp.type = 'LOC'
JOIN dict da ON da.surface = r.actor_text AND da.type = 'ORG'
WHERE r.event_type IN ({trig})
"""


def ngram_jaccard_pairs_oracle(max_id: int = 200, threshold: float = 0.05,
                               k: int = 3) -> str:
    return f"""
WITH d AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws
  FROM documents WHERE doc_id < {max_id} AND trim(text) <> ''
), sh AS (
  SELECT DISTINCT doc_id,
         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(ws)-{k-1})) AS i) g
  WHERE len(ws) >= {k}
  UNION
  SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS shingle
  FROM d WHERE len(ws) < {k}
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b,
       floor(i.i * 1.0 / (sa.n + sb.n - i.i) * 1e6 + 0.5) / 1e6 AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE i.i * 1.0 / (sa.n + sb.n - i.i) >= {threshold}
"""


def asof_join_oracle() -> str:
    return """
WITH j AS (
  SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, o.o_orderkey,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e LEFT JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT event_id, CAST(user_id AS BIGINT) AS user_id, ts_us,
       CAST(coalesce(o_orderkey, -1) AS BIGINT) AS asof_orderkey
FROM j WHERE rn = 1
"""


def range_join_oracle(window_days: int = 7) -> str:
    win_us = window_days * 86_400 * 1_000_000
    return f"""
SELECT e.event_id,
       CAST(count(o.o_orderkey) AS BIGINT) AS n_orders_in_window
FROM events e LEFT JOIN orders o
  ON o.o_custkey = e.user_id
 AND abs(epoch_us(o.o_orderdate) - epoch_us(e.ts)) <= {win_us}
GROUP BY e.event_id
"""


def users_without_orders_oracle() -> str:
    return """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_rows
FROM events
WHERE user_id NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
GROUP BY user_id
"""


def top_events_per_type_oracle(k: int = 2) -> str:
    return f"""
WITH r AS (
  SELECT event_type, event_id,
         floor(value * 1e6 + 0.5) / 1e6 AS value,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY value DESC, event_id) - 1 AS INTEGER) AS rank
  FROM events
)
SELECT event_type, event_id, value, rank FROM r WHERE rank < {k}
"""


def snli_triplets_oracle(sf_dir: str) -> str:
    """DuckDB equivalent of stages/snli.snli_triplets: last-seen (by file
    order = row_idx) entailment/contradiction hypothesis per premise, only
    premises having both (reference data_process.py:24-53)."""
    from deepkg_ray import synth
    p = synth.snli_path(sf_dir)
    return f"""
WITH t AS (SELECT * FROM read_parquet('{p}')),
e AS (SELECT sentence1, arg_max(sentence2, row_idx) AS entailment
      FROM t WHERE gold_label = 'entailment' GROUP BY sentence1),
c AS (SELECT sentence1, arg_max(sentence2, row_idx) AS contradiction
      FROM t WHERE gold_label = 'contradiction' GROUP BY sentence1)
SELECT e.sentence1 AS origin, e.entailment, c.contradiction
FROM e JOIN c ON e.sentence1 = c.sentence1
"""


def ck_tokens_oracle(sf_dir: str) -> str:
    """The .ck reader's parse must reproduce the generation-time gold
    parquet row-for-row (synth.ck_paths writes both from one in-memory
    corpus)."""
    from deepkg_ray import synth
    _, gold = synth.ck_paths(sf_dir)
    return (f"SELECT doc_idx, sent_idx, token_idx, token, boundary, types, "
            f"safe FROM read_parquet('{gold}')")


def gopher_repetition_oracle() -> str:
    """Mirror of stages/textstats.gopher_repetition: '. '-split +
    rtrim('.') lines, per-doc duplicate-line instance/char fractions and
    the modal-bigram fraction — exact integer counts, one round6 float64
    divide per fraction."""
    return """
WITH s AS (
  SELECT doc_id, rtrim(unnest(string_split(text, '. ')), '.') AS line
  FROM documents
), lc AS (
  SELECT doc_id, line, count(*) AS c, count(*) * len(line) AS chars
  FROM s GROUP BY doc_id, line
), l AS (
  SELECT doc_id,
         sum(c) AS n_lines,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_lines,
         sum(chars) AS total_chars,
         sum(CASE WHEN c > 1 THEN chars ELSE 0 END) AS dup_chars
  FROM lc GROUP BY doc_id
), toks AS (
  SELECT doc_id,
         CASE WHEN trim(text)='' THEN []
              ELSE string_split_regex(trim(text), '\\s+') END AS ws
  FROM documents
), bg AS (
  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g, count(*) AS c
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) x
  GROUP BY doc_id, g
), tb AS (
  SELECT doc_id, max(c) AS top, sum(c) AS tot FROM bg GROUP BY doc_id
)
SELECT l.doc_id,
       CAST(l.n_lines AS BIGINT) AS n_lines,
       floor(CAST(l.dup_lines AS DOUBLE) / l.n_lines * 1e6 + 0.5) / 1e6
         AS dup_line_frac,
       CASE WHEN l.total_chars > 0
            THEN floor(CAST(l.dup_chars AS DOUBLE) / l.total_chars * 1e6
                       + 0.5) / 1e6
            ELSE 0.0 END AS dup_line_char_frac,
       CASE WHEN tb.tot IS NOT NULL
            THEN floor(CAST(tb.top AS DOUBLE) / tb.tot * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS top_bigram_frac
FROM l LEFT JOIN tb ON tb.doc_id = l.doc_id
"""


def autophrase_selftrain_oracle(topk: int = 200, min_count: int = 2,
                                n_seed: int = 10,
                                max_epochs: int = 6) -> str:
    """Unrolled re-derivation of the WHOLE self-training loop
    (stages/autophrase.autophrase_selftrain) — the kg_pagerank convention
    applied to a learning loop: one CTE pair (centroids, pool) per epoch.
    The epoch map is deterministic and reaches a fixed point, so the
    engine's EarlyStopping (stop when an epoch moves nothing) and this
    fixed-depth unroll land on identical final pools.  All loop math is
    integer micros: centroid = floor(CAST(sum AS DOUBLE)/count) (sums
    < 2^53, exact), margins are BIGINT squared distances."""
    stop = ",".join(f"'{w}'" for w in
                    "the a an and of to in is are was were be been it this that".split())
    d2 = ("((f.pmi_m - c.{s}_pmi)*(f.pmi_m - c.{s}_pmi)"
          " + (f.idf_m - c.{s}_idf)*(f.idf_m - c.{s}_idf)"
          " + (f.ent_m - c.{s}_ent)*(f.ent_m - c.{s}_ent))")
    cent_expr = ("CAST(floor(CAST(sum(f.{col}) AS DOUBLE) / count(*)) "
                 "AS BIGINT)")
    epochs = []
    prev = "pool0"
    for i in range(1, max_epochs + 1):
        pos_sel = ", ".join(
            cent_expr.format(col=c) + f" AS p_{a}"
            for c, a in [("pmi_m", "pmi"), ("idf_m", "idf"),
                         ("ent_m", "ent")])
        neg_sel = ", ".join(
            cent_expr.format(col=c) + f" AS n_{a}"
            for c, a in [("pmi_m", "pmi"), ("idf_m", "idf"),
                         ("ent_m", "ent")])
        epochs.append(f"""cent{i} AS MATERIALIZED (
  SELECT * FROM
    (SELECT {pos_sel} FROM feat f
     WHERE f.phrase IN (SELECT phrase FROM {prev})),
    (SELECT {neg_sel} FROM feat f
     WHERE f.phrase NOT IN (SELECT phrase FROM {prev}))
),
pool{i} AS MATERIALIZED (
  SELECT phrase, epoch_added FROM {prev}
  UNION ALL
  SELECT f.phrase, {i} AS epoch_added
  FROM feat f, cent{i} c
  WHERE f.phrase NOT IN (SELECT phrase FROM {prev})
    AND {d2.format(s='n')} - {d2.format(s='p')} > 0
)""")
        prev = f"pool{i}"
    chain = ",\n".join(epochs)
    return f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text)='' THEN []
              ELSE string_split_regex(lower(trim(text)), '\\s+') END AS ws
  FROM documents
), big AS (
  SELECT ws[i] AS w1, ws[i+1] AS w2
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) g
), bc AS (
  SELECT w1, w2, count(*) AS cnt FROM big GROUP BY w1, w2
), cands AS (
  SELECT w1, w2, w1 || ' ' || w2 AS phrase, cnt
  FROM bc
  WHERE cnt >= {min_count}
    AND w1 NOT IN ({stop}) AND w2 NOT IN ({stop})
    AND NOT regexp_matches(w1, '[^a-z0-9 ]')
    AND NOT regexp_matches(w2, '[^a-z0-9 ]')
  ORDER BY cnt DESC, phrase LIMIT {topk}
), uni AS (
  SELECT w, count(*) AS c FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY w
), tot AS (
  SELECT (SELECT sum(c) FROM uni) AS n1, (SELECT sum(cnt) FROM bc) AS n2
), pmi AS (
  SELECT bc.w1, bc.w2,
         CAST(floor(ln((bc.cnt / t.n2) / ((u1.c / t.n1) * (u2.c / t.n1)))
                    * 1e6 + 0.5) AS BIGINT) AS pmi_m
  FROM bc, tot t
  JOIN uni u1 ON u1.w = bc.w1
  JOIN uni u2 ON u2.w = bc.w2
), dtoks AS (
  SELECT doc_id, unnest(ws) AS w FROM toks
), dfq AS (
  SELECT w, count(DISTINCT doc_id) AS df FROM dtoks GROUP BY w
), idf AS (
  SELECT w, CAST(floor(ln((SELECT count(*) FROM documents) * 1.0 / df)
                       * 1e6 + 0.5) AS BIGINT) AS idf_m
  FROM dfq
), pairs AS (
  SELECT ws[i] AS w1,
         CASE WHEN i+1 <= len(ws) THEN ws[i+1] ELSE '∅' END AS nb
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) g
), pc2 AS (
  SELECT w1, nb, count(*) AS cnt FROM pairs GROUP BY w1, nb
), ptot AS (
  SELECT w1, sum(cnt) AS total FROM pc2 GROUP BY w1
), ent AS (
  SELECT p.w1 AS w,
         CAST(floor(-sum((p.cnt * 1.0 / t.total) * ln(p.cnt * 1.0 / t.total))
                    * 1e6 + 0.5) AS BIGINT) AS ent_m
  FROM pc2 p JOIN ptot t ON p.w1 = t.w1
  GROUP BY p.w1
), feat AS MATERIALIZED (
  SELECT c.phrase, c.cnt, p.pmi_m,
         least(i1.idf_m, i2.idf_m) AS idf_m,
         least(e1.ent_m, e2.ent_m) AS ent_m
  FROM cands c
  JOIN pmi p ON p.w1 = c.w1 AND p.w2 = c.w2
  JOIN idf i1 ON i1.w = c.w1 JOIN idf i2 ON i2.w = c.w2
  JOIN ent e1 ON e1.w = c.w1 JOIN ent e2 ON e2.w = c.w2
), pool0 AS (
  SELECT phrase, 0 AS epoch_added
  FROM cands ORDER BY cnt DESC, phrase LIMIT {n_seed}
),
{chain}
SELECT f.phrase, CAST(f.cnt AS BIGINT) AS cnt,
       CAST(p.epoch_added AS BIGINT) AS epoch_added
FROM {prev} p JOIN feat f USING (phrase)
"""


def multimodal_features_oracle() -> str:
    """decode_features(RealDecoder) must reproduce the construction-gold
    features (multimodal.media_features_gold: same feature math over the
    RAW pixel/sample arrays, never through encode/decode — so the codec
    path and distributed plumbing are what this checks)."""
    from deepkg_ray.stages.multimodal import media_gold_paths
    fpath, _ = media_gold_paths()
    return f"SELECT * FROM read_parquet('{fpath}')"


def uie_model_generate_oracle(sf_dir: str, limit: int = 2000) -> str:
    """model_sel_table (NumpySeq2SEL through the actor pool) must
    reproduce the construction gold: the same seeded weights decoded by
    an independent per-sentence recurrence (uie.model_sel_gold_path) —
    no batching, compaction, or frozen lookup tables."""
    from deepkg_ray.pipelines.uie import model_sel_gold_path
    return (f"SELECT * FROM "
            f"read_parquet('{model_sel_gold_path(sf_dir, limit=limit)}')")


def image_exposure_oracle() -> str:
    """image_exposure (P6 decode → exposure stats) must reproduce the
    construction gold computed from the raw pixels."""
    from deepkg_ray.stages.multimodal import exposure_gold_path
    return f"SELECT * FROM read_parquet('{exposure_gold_path()}')"


def audio_silence_oracle() -> str:
    """audio_silence (WAV decode → VAD-style silence stats) must
    reproduce the construction gold computed from the raw samples."""
    from deepkg_ray.stages.multimodal import silence_gold_path
    return f"SELECT * FROM read_parquet('{silence_gold_path()}')"


def video_frame_sample_oracle() -> str:
    """sample_video_frames (stride-4 decode of the concatenated-P6 walk)
    must reproduce the construction gold computed from the raw frames."""
    from deepkg_ray.stages.multimodal import media_gold_paths
    _, vpath = media_gold_paths()
    return f"SELECT * FROM read_parquet('{vpath}')"


def hopping_window_oracle(window_sec: int = 300, hop_sec: int = 60) -> str:
    """Each event lands in exactly window/hop hopping windows with starts
    (floor(us/hop) - i)·hop, i ∈ [0, window/hop) — the same closed form
    stages/windows.hopping_window explodes with."""
    hop_us = hop_sec * 1_000_000
    n = window_sec // hop_sec
    return f"""
SELECT event_type,
       (epoch_us(ts) // {hop_us} - g.i) * {hop_us} AS window_start_us,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) / 1e6 AS sum_value
FROM events, generate_series(0, {n - 1}) AS g(i)
GROUP BY event_type, window_start_us
"""


def stratified_sample_oracle() -> str:
    """Per-source deterministic md5 keep counts; the per-source cut bytes
    are generated from the SAME rule the engine uses
    (textstats.source_keep_pct)."""
    from deepkg_ray.stages.textstats import source_keep_pct
    cases = "\n         ".join(
        f"WHEN 'src{i}' THEN '{source_keep_pct(f'src{i}') * 256 // 100:02x}'"
        for i in range(20))
    return f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
         CASE source
         {cases}
         ELSE '{source_keep_pct("other") * 256 // 100:02x}' END
         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents
GROUP BY source
"""


def conv_sentences_oracle(sf_dir: str) -> str:
    """Sentence explode parity: DuckDB lateral generate_series over the
    '. '-split list, trailing periods stripped (same semantics as
    textstats.explode_sentences)."""
    return f"""
SELECT conv_id, turn_idx,
       CAST(unnest(generate_series(1, len(parts))) AS BIGINT) AS sent_idx,
       rtrim(unnest(parts), '.') AS sentence
FROM (SELECT conv_id, turn_idx, string_split(text, '. ') AS parts
      FROM read_parquet('{_transcripts_glob(sf_dir)}'))
"""


def doc_repetition_oracle(n: int = 2) -> str:
    """Duplicate-ngram fraction per doc via DuckDB list lambdas — the same
    grams (space-joined word windows) the engine kernel builds."""
    return f"""
WITH g AS (
  SELECT doc_id,
         CASE WHEN len(string_split_regex(trim(text), '\\s+')) >= {n}
              THEN list_transform(
                     generate_series(1, len(string_split_regex(trim(text), '\\s+')) - {n - 1}),
                     i -> array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), i, i + {n - 1}), ' '))
              ELSE [] END AS grams
  FROM documents
)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_ngrams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
       CASE WHEN len(grams) = 0 THEN 0.0 ELSE
         floor((1.0 - len(list_distinct(grams)) /
                CAST(len(grams) AS DOUBLE)) * 1e6 + 0.5) / 1e6 END
         AS rep_ratio
FROM g
"""


def _jaccard_pairs_cte(max_id: int = 200, threshold: float = 0.05,
                       k: int = 3) -> str:
    """The ngram_jaccard_pairs_oracle body as a reusable CTE block ending in
    `jpairs(doc_a, doc_b)` — the SQL-reproducible edge source the graph
    oracles build on."""
    return f"""d AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws
  FROM documents WHERE doc_id < {max_id} AND trim(text) <> ''
), sh AS (
  SELECT DISTINCT doc_id,
         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(ws)-{k-1})) AS i) g
  WHERE len(ws) >= {k}
  UNION
  SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS shingle
  FROM d WHERE len(ws) < {k}
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), jpairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE i.i * 1.0 / (sa.n + sb.n - i.i) >= {threshold}
)"""


def dedup_clusters_oracle(max_id: int = 200, threshold: float = 0.05) -> str:
    """Connected components over the exact-Jaccard pair graph via a
    recursive transitive-closure CTE (UNION dedups, so it terminates);
    component = min reachable node id."""
    return f"""
WITH RECURSIVE {_jaccard_pairs_cte(max_id, threshold)},
edges2 AS (
  SELECT doc_a AS u, doc_b AS v FROM jpairs
  UNION
  SELECT doc_b, doc_a FROM jpairs
),
reach(u, v) AS (
  SELECT u, v FROM edges2
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges2 e ON r.v = e.u
)
SELECT u AS node, least(u, min(v)) AS component
FROM reach GROUP BY u
"""


def dedup_cluster_sizes_oracle(max_id: int = 200,
                               threshold: float = 0.05) -> str:
    return f"""
WITH RECURSIVE {_jaccard_pairs_cte(max_id, threshold)},
edges2 AS (
  SELECT doc_a AS u, doc_b AS v FROM jpairs
  UNION
  SELECT doc_b, doc_a FROM jpairs
),
reach(u, v) AS (
  SELECT u, v FROM edges2
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges2 e ON r.v = e.u
),
cc AS (
  SELECT u AS node, least(u, min(v)) AS component
  FROM reach GROUP BY u
)
SELECT component, CAST(count(*) AS BIGINT) AS n_members
FROM cc GROUP BY component
"""


def kg_degrees_oracle(sf_dir: str) -> str:
    """Undirected distinct-neighbor degree over the KG edge list (the same
    triples CTE the adjacency oracle builds)."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
adj AS (SELECT DISTINCT subj_id, obj_id FROM triples),
bidir AS (
  SELECT subj_id AS node, obj_id AS peer FROM adj
  UNION
  SELECT obj_id, subj_id FROM adj
)
SELECT node, CAST(count(DISTINCT peer) AS BIGINT) AS degree
FROM bidir GROUP BY node
"""


def kg_kcore_oracle(sf_dir: str, k: int = 3, rounds: int = 8) -> str:
    """Unrolled peel rounds for stages/graph.kcore_nodes over the KG edge
    list.  Peeling is monotone, so rounds beyond the fixpoint are no-ops —
    `rounds` only needs to be ≥ the peel depth at this scale (validated by
    the driver comparison itself: a too-small value would hash-mismatch)."""
    # every per-round CTE is referenced more than once downstream — force
    # MATERIALIZED or DuckDB's inlining re-evaluates the whole chain
    # exponentially (6^rounds regex scans)
    parts = [f"""
e0 AS MATERIALIZED (SELECT DISTINCT least(subj_id, obj_id) AS u,
                       greatest(subj_id, obj_id) AS v
       FROM triples WHERE subj_id <> obj_id)"""]
    for i in range(rounds + 1):
        parts.append(f"""
d{i} AS MATERIALIZED (SELECT node, count(*) AS deg
         FROM (SELECT u AS node FROM e{i} UNION ALL SELECT v FROM e{i})
         GROUP BY node),
a{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= {k})""")
        if i == rounds:
            break
        parts.append(f"""
e{i + 1} AS MATERIALIZED (SELECT e.u, e.v FROM e{i} e
             JOIN a{i} x ON e.u = x.node
             JOIN a{i} y ON e.v = y.node)""")
    return (f"WITH {dict_values_cte()},\n{transcripts_cte(sf_dir)},\n"
            + _triples_cte(sf_dir) + "," + ",".join(parts)
            + f"""
SELECT node, CAST(deg AS BIGINT) AS degree
FROM d{rounds} WHERE deg >= {k}
""")


def kg_triangles_oracle(sf_dir: str) -> str:
    """Triangle count over the simple undirected KG graph: degree-ordered
    orientation (lo < hi), wedge + closing-edge join — each triangle
    counted exactly once."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
simple AS (
  SELECT DISTINCT least(subj_id, obj_id) AS lo,
         greatest(subj_id, obj_id) AS hi
  FROM triples WHERE subj_id <> obj_id
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM simple e1
JOIN simple e2 ON e2.lo = e1.lo AND e1.hi < e2.hi
JOIN simple e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
"""


def token_quantiles_oracle(qs=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) -> str:
    """Exact discrete quantiles of per-doc token counts — quantile_disc on
    the doc_stats n_tokens convention."""
    rows = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q, "
        f"CAST(quantile_disc(n_tokens, {q}) AS BIGINT) AS value FROM base"
        for q in qs)
    return f"""
WITH base AS (
  SELECT CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
  FROM documents
)
{rows}
"""


def kg_pagerank_oracle(sf_dir: str, n_iters: int = 5,
                       damping_pct: int = 85) -> str:
    """Fixed-iteration integer-scaled PageRank, unrolled one CTE per
    iteration (recursive CTEs can't aggregate in the recursive term) —
    mirrors stages/graph.py pagerank_scaled op for op: BIGINT floor
    division (//) everywhere, dangling mass dropped."""
    scale, dp = 10**12, damping_pct
    prev = "pr0"
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(f"""pr{i} AS (
  SELECT nd.node,
         (SELECT ({100 - dp} * {scale}) // (100 * n) FROM params)
         + ({dp} * COALESCE(t.total, 0)) // 100 AS pm
  FROM nodes nd LEFT JOIN (
    SELECT e.d AS node, SUM(p.pm // o.c) AS total
    FROM {prev} p JOIN dedges e ON e.s = p.node
    JOIN outdeg o ON o.s = p.node
    GROUP BY e.d
  ) t ON t.node = nd.node
)""")
        prev = f"pr{i}"
    chain = ",\n".join(iters)
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
dedges AS (
  SELECT DISTINCT subj_id AS s, obj_id AS d FROM triples
  WHERE subj_id <> obj_id
),
nodes AS (SELECT s AS node FROM dedges UNION SELECT d FROM dedges),
params AS (SELECT count(*) AS n FROM nodes),
outdeg AS (SELECT s, count(*) AS c FROM dedges GROUP BY s),
pr0 AS (SELECT node, (SELECT {scale} // n FROM params) AS pm FROM nodes),
{chain}
SELECT node, CAST(pm AS BIGINT) AS pr_scaled FROM {prev}
"""


def weighted_pagerank_oracle(sf_dir: str, n_iters: int = 5,
                             damping_pct: int = 85) -> str:
    """Mirror of stages/graph.weighted_pagerank_scaled: the kg_pagerank
    BIGINT chain with weight-proportional contributions — per-edge
    (pm·w) // W_out, edge weight = extraction count per (subj, obj)."""
    scale, dp = 10**12, damping_pct
    prev = "pr0"
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(f"""pr{i} AS MATERIALIZED (
  SELECT nd.node,
         (SELECT ({100 - dp} * {scale}) // (100 * n) FROM params)
         + ({dp} * COALESCE(t.total, 0)) // 100 AS pm
  FROM nodes nd LEFT JOIN (
    SELECT e.d AS node, SUM((p.pm * e.w) // o.tw) AS total
    FROM {prev} p JOIN dedges e ON e.s = p.node
    JOIN outw o ON o.s = p.node
    GROUP BY e.d
  ) t ON t.node = nd.node
)""")
        prev = f"pr{i}"
    chain = ",\n".join(iters)
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
dedges AS MATERIALIZED (
  SELECT subj_id AS s, obj_id AS d, CAST(count(*) AS BIGINT) AS w
  FROM triples WHERE subj_id <> obj_id GROUP BY s, d
),
nodes AS (SELECT s AS node FROM dedges UNION SELECT d FROM dedges),
params AS (SELECT count(*) AS n FROM nodes),
outw AS (SELECT s, CAST(sum(w) AS BIGINT) AS tw FROM dedges GROUP BY s),
pr0 AS (SELECT node, (SELECT {scale} // n FROM params) AS pm FROM nodes),
{chain}
SELECT node, CAST(pm AS BIGINT) AS pr_scaled FROM {prev}
"""


def textrank_words_oracle(n_iters: int = 5, damping_pct: int = 85) -> str:
    """TextRank mirror of stages/phrasemine.textrank_words: the
    kg_pagerank chain (identical BIGINT ops) over the documents bigram
    digraph, with word→id via dense_rank(ORDER BY w) — the same sorted
    enumeration the engine broadcasts."""
    scale, dp = 10**12, damping_pct
    prev = "pr0"
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(f"""pr{i} AS MATERIALIZED (
  SELECT nd.node,
         (SELECT ({100 - dp} * {scale}) // (100 * n) FROM params)
         + ({dp} * COALESCE(t.total, 0)) // 100 AS pm
  FROM nodes nd LEFT JOIN (
    SELECT e.d AS node, SUM(p.pm // o.c) AS total
    FROM {prev} p JOIN dedges e ON e.s = p.node
    JOIN outdeg o ON o.s = p.node
    GROUP BY e.d
  ) t ON t.node = nd.node
)""")
        prev = f"pr{i}"
    chain = ",\n".join(iters)
    return f"""
WITH toks AS (
  SELECT CASE WHEN trim(text)='' THEN []
              ELSE string_split_regex(lower(trim(text)), '\\s+') END AS ws
  FROM documents
), big AS (
  SELECT ws[i] AS w1, ws[i+1] AS w2
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) g
),
dedges0 AS MATERIALIZED (
  SELECT DISTINCT w1, w2 FROM big WHERE w1 <> w2
),
ids AS MATERIALIZED (
  SELECT w, CAST(dense_rank() OVER (ORDER BY w) AS BIGINT) AS id
  FROM (SELECT w1 AS w FROM dedges0 UNION SELECT w2 FROM dedges0)
),
dedges AS MATERIALIZED (
  SELECT a.id AS s, b.id AS d
  FROM dedges0 JOIN ids a ON a.w = dedges0.w1
  JOIN ids b ON b.w = dedges0.w2
),
nodes AS (SELECT s AS node FROM dedges UNION SELECT d FROM dedges),
params AS (SELECT count(*) AS n FROM nodes),
outdeg AS (SELECT s, count(*) AS c FROM dedges GROUP BY s),
pr0 AS (SELECT node, (SELECT {scale} // n FROM params) AS pm FROM nodes),
{chain}
SELECT ids.w AS word, CAST(pm AS BIGINT) AS pr_scaled
FROM {prev} JOIN ids ON ids.id = {prev}.node
"""


def avg_neighbor_degree_oracle(sf_dir: str) -> str:
    """Mirror of graph.avg_neighbor_degree over the symmetrized KG."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
adj AS (
  SELECT DISTINCT least(subj_id, obj_id) AS lo,
                  greatest(subj_id, obj_id) AS hi
  FROM triples WHERE subj_id <> obj_id
),
bidir AS (
  SELECT lo AS node, hi AS peer FROM adj
  UNION ALL SELECT hi, lo FROM adj
),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
        FROM bidir GROUP BY node)
SELECT b.node, CAST(count(*) AS BIGINT) AS degree,
       floor(SUM(d.degree) / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS avg_nbr_deg
FROM bidir b JOIN deg d ON d.node = b.peer
GROUP BY b.node
"""


def edge_embeddedness_oracle(sf_dir: str) -> str:
    """Mirror of graph.edge_embeddedness: common-neighbor counts per
    existing undirected edge, bridges kept with cn = 0."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
adj AS (
  SELECT DISTINCT least(subj_id, obj_id) AS lo,
                  greatest(subj_id, obj_id) AS hi
  FROM triples WHERE subj_id <> obj_id
),
bidir AS (
  SELECT lo AS node, hi AS peer FROM adj
  UNION ALL SELECT hi, lo FROM adj
),
cn AS (
  SELECT a.lo, a.hi, CAST(count(*) AS BIGINT) AS cn
  FROM adj a JOIN bidir x ON x.node = a.lo
             JOIN bidir y ON y.node = a.hi AND y.peer = x.peer
  GROUP BY a.lo, a.hi
)
SELECT a.lo AS e1, a.hi AS e2,
       CAST(COALESCE(cn.cn, 0) AS BIGINT) AS cn
FROM adj a LEFT JOIN cn ON cn.lo = a.lo AND cn.hi = a.hi
"""


def kg_eigenvector_oracle(sf_dir: str, n_iters: int = 3,
                          scale: int = 10**6) -> str:
    """Fixed-iteration integer-scaled eigenvector centrality over the
    symmetrized KG, one MATERIALIZED CTE per iteration — mirrors
    stages/graph.eigenvector_scaled op for op (kg_hits_oracle's chain
    with a single x-update per round)."""
    prev = "x0"
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(f"""x{i}raw AS MATERIALIZED (
  SELECT nd.node, CAST(COALESCE(t.sm, 0) AS BIGINT) AS raw
  FROM nodes nd LEFT JOIN (
    SELECT e.d AS node, SUM(p.v) AS sm
    FROM {prev} p JOIN dedges e ON e.s = p.node GROUP BY e.d
  ) t ON t.node = nd.node
), x{i} AS MATERIALIZED (
  SELECT node, CASE WHEN (SELECT max(raw) FROM x{i}raw) > 0
    THEN (raw * {scale}) // (SELECT max(raw) FROM x{i}raw)
    ELSE 0 END AS v
  FROM x{i}raw
)""")
        prev = f"x{i}"
    chain = ",\n".join(iters)
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
adj AS MATERIALIZED (
  SELECT DISTINCT least(subj_id, obj_id) AS lo,
                  greatest(subj_id, obj_id) AS hi
  FROM triples WHERE subj_id <> obj_id
),
dedges AS MATERIALIZED (
  SELECT lo AS s, hi AS d FROM adj UNION ALL SELECT hi, lo FROM adj
),
nodes AS (SELECT DISTINCT s AS node FROM dedges),
x0 AS (SELECT node, CAST({scale} AS BIGINT) AS v FROM nodes),
{chain}
SELECT node, CAST(v AS BIGINT) AS eig_scaled FROM x{n_iters}
"""


def kg_hits_oracle(sf_dir: str, n_iters: int = 3,
                   scale: int = 10**6) -> str:
    """Fixed-iteration integer-scaled HITS, unrolled one MATERIALIZED CTE
    pair per iteration (inlined CTEs re-expand the base scan exponentially
    through the scalar-subquery normalizers and exhaust file handles) — mirrors stages/graph.hits_scaled op for op: BIGINT sums,
    max-normalization via `(raw * scale) // max(raw)` floor division."""
    prev_h = "h0"
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(f"""a{i}raw AS MATERIALIZED (
  SELECT nd.node, CAST(COALESCE(t.sm, 0) AS BIGINT) AS raw
  FROM nodes nd LEFT JOIN (
    SELECT e.d AS node, SUM(p.v) AS sm
    FROM {prev_h} p JOIN dedges e ON e.s = p.node GROUP BY e.d
  ) t ON t.node = nd.node
), a{i} AS MATERIALIZED (
  SELECT node, CASE WHEN (SELECT max(raw) FROM a{i}raw) > 0
    THEN (raw * {scale}) // (SELECT max(raw) FROM a{i}raw)
    ELSE 0 END AS v
  FROM a{i}raw
), h{i}raw AS MATERIALIZED (
  SELECT nd.node, CAST(COALESCE(t.sm, 0) AS BIGINT) AS raw
  FROM nodes nd LEFT JOIN (
    SELECT e.s AS node, SUM(p.v) AS sm
    FROM a{i} p JOIN dedges e ON e.d = p.node GROUP BY e.s
  ) t ON t.node = nd.node
), h{i} AS MATERIALIZED (
  SELECT node, CASE WHEN (SELECT max(raw) FROM h{i}raw) > 0
    THEN (raw * {scale}) // (SELECT max(raw) FROM h{i}raw)
    ELSE 0 END AS v
  FROM h{i}raw
)""")
        prev_h = f"h{i}"
    chain = ",\n".join(iters)
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
dedges AS MATERIALIZED (
  SELECT DISTINCT subj_id AS s, obj_id AS d FROM triples
  WHERE subj_id <> obj_id
),
nodes AS (SELECT s AS node FROM dedges UNION SELECT d FROM dedges),
h0 AS (SELECT node, CAST({scale} AS BIGINT) AS v FROM nodes),
{chain}
SELECT h.node, CAST(h.v AS BIGINT) AS hub_scaled,
       CAST(a.v AS BIGINT) AS auth_scaled
FROM h{n_iters} h JOIN a{n_iters} a USING (node)
"""


def kg_katz_oracle(sf_dir: str, n_iters: int = 3, alpha_num: int = 1,
                   alpha_den: int = 5, scale: int = 10**6) -> str:
    """Fixed-iteration integer-scaled Katz centrality over the simple
    DIRECTED KG, one MATERIALIZED CTE per iteration — mirrors
    stages/graph.katz_scaled op for op (x = scale + (α_num·Σ_in)//α_den,
    BIGINT floor division throughout)."""
    prev = "x0"
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(f"""x{i} AS MATERIALIZED (
  SELECT nd.node,
         CAST({scale} + ({alpha_num} * CAST(COALESCE(t.sm, 0) AS BIGINT))
              // {alpha_den} AS BIGINT) AS v
  FROM nodes nd LEFT JOIN (
    SELECT e.d AS node, SUM(p.v) AS sm
    FROM {prev} p JOIN dedges e ON e.s = p.node GROUP BY e.d
  ) t ON t.node = nd.node
)""")
        prev = f"x{i}"
    chain = ",\n".join(iters)
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
dedges AS MATERIALIZED (
  SELECT DISTINCT subj_id AS s, obj_id AS d FROM triples
  WHERE subj_id <> obj_id
),
nodes AS (SELECT s AS node FROM dedges UNION SELECT d FROM dedges),
x0 AS (SELECT node, CAST({scale} AS BIGINT) AS v FROM nodes),
{chain}
SELECT node, CAST(v AS BIGINT) AS katz_scaled FROM x{n_iters}
"""


def hll_registers_oracle(p: int = 12) -> str:
    """HyperLogLog sketch state over events.user_id / event_type — the md5-
    parity twin of stages/sketches.py (_hash64 ≡ md5_number_lower; register
    = top p hash bits, rho = leading zeros of the low 64-p bits + 1 via
    EXACT integer bit length, to_base(low, 2))."""
    mask = (1 << (64 - p)) - 1
    return f"""
WITH h AS (
  SELECT 'user_id' AS col, md5_number_lower(user_id::VARCHAR) AS h FROM events
  UNION ALL
  SELECT 'event_type' AS col, md5_number_lower(event_type::VARCHAR) FROM events
),
r AS (
  SELECT col, CAST(h >> {64 - p} AS BIGINT) AS register,
         {64 - p + 1} - (CASE WHEN (h & {mask}) = 0 THEN 0
              ELSE length(to_base(CAST(h & {mask} AS BIGINT), 2)) END) AS rho
  FROM h
)
SELECT col, register, CAST(MAX(rho) AS BIGINT) AS rho
FROM r GROUP BY col, register
"""


def _fp_rows_sql(window: int, keep_mod: int) -> str:
    """Shared fingerprint-row derivation (see doc_fingerprints_oracle)."""
    m = (1 << 61) - 1
    ks = [pow(257, window - 1 - t, m) for t in range(window)]
    terms = " + ".join(f"CAST(cs[p + {t}] AS HUGEINT) * {k}"
                       for t, k in enumerate(ks))
    return f"""
WITH codes AS (
  SELECT doc_id, list_transform(string_split(text, ''), c -> ord(c)) AS cs,
         length(text) AS n
  FROM documents
),
long AS (
  SELECT doc_id, CAST(({terms}) % {m} AS BIGINT) AS fp
  FROM codes, unnest(generate_series(1, n - {window - 1})) AS u(p)
  WHERE n >= {window}
),
fp_rows AS (
  SELECT doc_id, fp FROM long WHERE fp % {keep_mod} = 0
  UNION ALL
  SELECT doc_id, CAST(md5_number_lower(text) % {m} AS BIGINT) AS fp
  FROM documents WHERE length(text) BETWEEN 1 AND {window - 1}
)"""


def doc_fingerprints_oracle(window: int = 8, keep_mod: int = 16) -> str:
    """Rabin-Karp rolling fingerprints (functions/hashing.py
    rolling_fingerprint) — the rolling recurrence equals the per-window
    polynomial hash Σ ord(c_{p+t})·257^(window-1-t) mod 2^61-1, so every
    emitted value is computable position-independently (no recursion);
    short texts fall back to md5_number_lower % mod, emitted unfiltered."""
    return _fp_rows_sql(window, keep_mod) + """
SELECT doc_id, fp FROM fp_rows
"""


def containment_pairs_oracle(window: int = 8, keep_mod: int = 16,
                             threshold: float = 0.5,
                             max_bucket: int = 64) -> str:
    """Winnowing containment ground truth: distinct fingerprints per doc,
    stop-fingerprint buckets (> max_bucket docs) dropped, pair share
    counts over surviving buckets, containment = shared / min(|FP|)."""
    return _fp_rows_sql(window, keep_mod) + f""",
fps AS (SELECT DISTINCT doc_id, fp FROM fp_rows),
nfp AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp
        FROM fps GROUP BY doc_id),
ok_fp AS (SELECT fp FROM fps GROUP BY fp
          HAVING COUNT(*) BETWEEN 2 AND {max_bucket}),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM fps a
  JOIN ok_fp o ON o.fp = a.fp
  JOIN fps b ON b.fp = a.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
scored AS (
  SELECT p.doc_a, p.doc_b, p.n_shared,
         floor(p.n_shared * 1.0
               / greatest(least(na.n_fp, nb.n_fp), 1) * 1e6 + 0.5) / 1e6
           AS containment
  FROM pairs p
  JOIN nfp na ON na.doc_id = p.doc_a
  JOIN nfp nb ON nb.doc_id = p.doc_b
)
SELECT doc_a, doc_b, n_shared, containment
FROM scored WHERE containment >= {threshold}
"""


def dedup_simhash_oracle(max_hamming: int = 3) -> str:
    """All-pairs SimHash ground truth (md5-parity word hashes): fingerprint
    bit i = majority sign of Σ_w (2·bit_i(md5_lower64(w)) − 1); pairs with
    bit_count(xor) ≤ max_hamming.  The engine's 16-bit-chunk blocking is
    complete for this radius, so engine set == this set exactly."""
    return f"""
WITH words AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'),
                            w -> w <> '')) AS w
  FROM documents
),
wh AS (SELECT doc_id, md5_number_lower(w) AS h FROM words),
bits AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM wh, unnest(generate_series(0, 63)) AS u(b)
  GROUP BY doc_id, b
),
fpw AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN
              CASE WHEN b = 63 THEN -9223372036854775808
                   ELSE (1::BIGINT << b) END ELSE 0 END) AS BIGINT) AS f
  FROM bits GROUP BY doc_id
),
fp AS (  -- docs with no words fingerprint to 0
  SELECT d.doc_id, COALESCE(fpw.f, 0::BIGINT) AS f
  FROM documents d LEFT JOIN fpw ON d.doc_id = fpw.doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.f, b.f)) <= {max_hamming}
"""


def dedup_minhash_oracle(threshold: float = 0.8, n_perm: int = 64,
                         n_bands: int = 16, shingle_k: int = 3) -> str:
    """Full MinHash-LSH near-dup ground truth under md5-parity hashing:
    k-word shingles → md5_number_lower → the engine's (a·x+b) mod 2^64
    permutation family (seed-7 constants inlined; the 128-bit product is
    split 32/64 so every intermediate fits HUGEINT) → per-band key =
    md5_number_lower of the comma-joined minima → candidate pairs sharing
    any band → EXACT shingle-set Jaccard, round6, ≥ threshold.  Matching
    the engine value-for-value proves both the LSH candidate generation
    and the distributed verify join."""
    from deepkg_ray.functions.hashing import MinHasher
    mh = MinHasher(n_perm=n_perm, shingle_k=shingle_k)
    perm_rows = ",\n    ".join(
        f"({p}, {int(a)}::UBIGINT, {int(b)}::UBIGINT)"
        for p, (a, b) in enumerate(zip(mh.a, mh.b)))
    rows = n_perm // n_bands
    m64 = 1 << 64
    return f"""
WITH perms(p, a, b) AS (VALUES
    {perm_rows}),
words AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                             w -> w <> '') AS ws
  FROM documents
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(ws) >= {shingle_k} THEN
           list_transform(generate_series(1, len(ws) - {shingle_k - 1}),
                          i -> array_to_string(ws[i:i+{shingle_k - 1}], ' '))
         WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
         ELSE [] END AS shingles
  FROM words
),
hv AS (
  SELECT doc_id, md5_number_lower(s) AS h
  FROM (SELECT doc_id, unnest(list_distinct(shingles)) AS s FROM sh)
),
pv AS (
  SELECT doc_id, p,
         CAST((a::HUGEINT * (h & 4294967295)
               + ((a::HUGEINT * (h >> 32)) % 4294967296) * 4294967296
               + b) % {m64} AS UBIGINT) AS v
  FROM hv, perms
),
sig0 AS (SELECT doc_id, p, MIN(v) AS mv FROM pv GROUP BY doc_id, p),
sig AS (
  SELECT d.doc_id, pr.p,
         COALESCE(s.mv, 18446744073709551615::UBIGINT) AS mv
  FROM documents d CROSS JOIN perms pr
  LEFT JOIN sig0 s ON s.doc_id = d.doc_id AND s.p = pr.p
),
bands AS (
  SELECT doc_id, p // {rows} AS band_idx,
         md5_number_lower(string_agg(mv::VARCHAR, ',' ORDER BY p)) AS bk
  FROM sig GROUP BY doc_id, band_idx
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.bk = b.bk AND a.doc_id < b.doc_id
),
ss AS (SELECT doc_id, list_distinct(shingles) AS sset FROM sh),
jac AS (
  SELECT c.doc_a, c.doc_b,
         CASE WHEN len(list_distinct(list_concat(x.sset, y.sset))) = 0
              THEN 1.0
              ELSE floor((len(list_intersect(x.sset, y.sset))::DOUBLE
                          / len(list_distinct(list_concat(x.sset, y.sset))))
                         * 1000000 + 0.5) / 1000000 END AS jaccard
  FROM cand c
  JOIN ss x ON x.doc_id = c.doc_a
  JOIN ss y ON y.doc_id = c.doc_b
)
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= {threshold}
"""


def substring_dup_spans_oracle(w: int = 5, min_count: int = 2,
                               table: str = "documents") -> str:
    """All-gram re-derivation of substring_dup_spans (md5-parity tier):
    w-token grams → md5_number_lower → HAVING count ≥ min_count → the
    identical gaps-and-islands merge (break when gap > w)."""
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x <> '') AS ws
  FROM {table}
),
grams AS (
  SELECT doc_id, i - 1 AS pos,
         md5_number_lower(array_to_string(ws[i:i+{w - 1}], ' ')) AS h
  FROM toks, unnest(generate_series(1, len(ws) - {w - 1})) AS t(i)
  WHERE len(ws) >= {w}
),
dup AS (SELECT h FROM grams GROUP BY h HAVING COUNT(*) >= {min_count}),
hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (h)),
marks AS (
  SELECT doc_id, pos,
         CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {w} THEN 0 ELSE 1 END AS brk
  FROM hits
),
grp AS (SELECT doc_id, pos,
        SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g FROM marks)
SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {w} AS BIGINT) AS span_end,
       CAST(COUNT(*) AS BIGINT) AS n_dup_grams
FROM grp GROUP BY doc_id, g
"""


def heavy_hitter_tokens_oracle(k: int = 20) -> str:
    return f"""
WITH toks AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents WHERE trim(text) <> ''
),
c AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY token)
SELECT token, n FROM c ORDER BY n DESC, token LIMIT {k}
"""

def _bm25_ctes(sf_dir: str, query_cte: str) -> str:
    """Shared Okapi BM25 scoring CTE chain, exactly as
    stages/linking.BM25Index.topn_micros computes scores: idf pre-rounded
    to micros, each per-(query-term-occurrence, doc) contribution evaluated
    left-to-right in float64
    (``idf * tf * 2.5 / (tf + 1.5*(1 - 0.75 + 0.75*dl/avgdl))``), rounded
    to int64 micros, integer-summed; positive scores only; rank by
    (score desc, entity_id).  ``query_cte`` must define ``q(query [, ...])``.
    Reference semantics: Okapi scoring loop of
    Normalization/recall/model/BM25_Model.py:38-72."""
    p = synth.dictionary_path(sf_dir)
    return f"""
WITH dict AS (SELECT entity_id, name, aliases FROM read_parquet('{p}')),
{query_cte},
dtok AS (SELECT entity_id, unnest(regexp_extract_all(name, '[a-z0-9]+')) AS tok
         FROM dict),
tf AS (SELECT entity_id, tok, CAST(count(*) AS DOUBLE) AS tf
       FROM dtok GROUP BY entity_id, tok),
dl AS (SELECT entity_id, CAST(count(*) AS DOUBLE) AS dl
       FROM dtok GROUP BY entity_id),
stats AS (SELECT CAST((SELECT count(*) FROM dict) AS DOUBLE) AS n_docs,
                 (SELECT sum(dl) FROM dl)
                 / CAST((SELECT count(*) FROM dict) AS DOUBLE) AS avgdl),
df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
idf AS (SELECT tok,
               floor(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                     * 1e6 + 0.5) / 1e6 AS idf
        FROM df, stats s),
qtok AS (SELECT query, unnest(regexp_extract_all(query, '[a-z0-9]+')) AS tok
         FROM q),
contrib AS (
  SELECT qt.query, tf.entity_id,
         CAST(floor(i.idf * tf.tf * 2.5
                    / (tf.tf + 1.5 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl))
                    * 1e6 + 0.5) AS BIGINT) AS c
  FROM qtok qt
  JOIN idf i ON i.tok = qt.tok
  JOIN tf ON tf.tok = qt.tok
  JOIN dl ON dl.entity_id = tf.entity_id, stats s),
score AS (SELECT query, entity_id, sum(c) AS s
          FROM contrib GROUP BY query, entity_id),
ranked AS (
  SELECT query, entity_id, s,
         CAST(row_number() OVER (PARTITION BY query
                                 ORDER BY s DESC, entity_id) - 1
              AS INTEGER) AS rank
  FROM score WHERE s > 0)"""


def bm25_topn_oracle(sf_dir: str, top_n: int = 5) -> str:
    """BM25 top-N per DISTINCT alias surface — see _bm25_ctes."""
    q = "q AS (SELECT DISTINCT unnest(aliases) AS query FROM dict)"
    return _bm25_ctes(sf_dir, q) + f"""
SELECT r.query, r.entity_id AS candidate_id, d.name AS candidate_name,
       CAST(r.s AS DOUBLE) / 1e6 AS score, r.rank
FROM ranked r JOIN dict d ON d.entity_id = r.entity_id
WHERE r.rank < {top_n}
"""


def coherence_link_oracle(sf_dir: str, top_n: int = 5) -> str:
    """Mirror of linking.coherence_link: nested-WITH composition (each
    sub-chain keeps its own `dict`/`t` namespaces) — mention rows via the
    strpos identity (synth invariant 1, as mention_counts_sql), BM25
    candidates via _bm25_ctes over the mention surfaces, undirected pair
    weights from the triples chain, coherence Σ, (coh desc, rank,
    cand_id) winner per (conv, surface)."""
    p = synth.dictionary_path(sf_dir)
    glob = _transcripts_glob(sf_dir)
    q_cte = (
        f"t2 AS (SELECT lower(text) AS txt FROM read_parquet('{glob}')),\n"
        "da2 AS (SELECT unnest(aliases) AS surface FROM dict),\n"
        "q AS (SELECT DISTINCT da2.surface AS query\n"
        "      FROM t2 JOIN da2 ON strpos(t2.txt, da2.surface) > 0)")
    cand_select = _bm25_ctes(sf_dir, q_cte) + f"""
SELECT query AS surface, entity_id AS cand_id, rank
FROM ranked WHERE rank < {top_n}"""
    mrows_select = f"""
WITH da AS (SELECT entity_id, unnest(aliases) AS surface
            FROM read_parquet('{p}')),
tt AS (SELECT conv_id, lower(text) AS txt FROM read_parquet('{glob}'))
SELECT DISTINCT tt.conv_id, da.surface, da.entity_id AS gold
FROM tt JOIN da ON strpos(tt.txt, da.surface) > 0"""
    pair_select = f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)}
SELECT least(subj_id, obj_id) AS a, greatest(subj_id, obj_id) AS b,
       CAST(count(*) AS BIGINT) AS w
FROM triples WHERE subj_id <> obj_id GROUP BY 1, 2"""
    return f"""
WITH mrows AS ({mrows_select}),
cands AS ({cand_select}),
pairw AS ({pair_select}),
ctx AS (
  SELECT DISTINCT m.conv_id, m.surface, m2.gold AS ctx_gold
  FROM mrows m JOIN mrows m2
    ON m2.conv_id = m.conv_id AND m2.surface <> m.surface),
base AS (
  SELECT m.conv_id, m.surface, m.gold, c.cand_id, c.rank
  FROM mrows m JOIN cands c ON c.surface = m.surface),
coh AS (
  SELECT b.conv_id, b.surface, b.cand_id,
         CAST(COALESCE(SUM(CASE WHEN x.ctx_gold IS NOT NULL
                                     AND x.ctx_gold <> b.cand_id
                                THEN COALESCE(p.w, 0) ELSE 0 END), 0)
              AS BIGINT) AS coh
  FROM base b
  LEFT JOIN ctx x ON x.conv_id = b.conv_id AND x.surface = b.surface
  LEFT JOIN pairw p ON p.a = least(b.cand_id, x.ctx_gold)
                    AND p.b = greatest(b.cand_id, x.ctx_gold)
  GROUP BY b.conv_id, b.surface, b.cand_id),
sel AS (
  SELECT b.conv_id, b.surface, b.gold, b.cand_id, b.rank, c.coh,
         row_number() OVER (PARTITION BY b.conv_id, b.surface
                            ORDER BY c.coh DESC, b.rank, b.cand_id)
             AS rc
  FROM base b JOIN coh c ON c.conv_id = b.conv_id
    AND c.surface = b.surface AND c.cand_id = b.cand_id)
SELECT conv_id, surface, gold AS gold_id,
       CAST(MAX(CASE WHEN rank = 0 THEN cand_id END) AS BIGINT)
           AS bm25_top1,
       CAST(MAX(CASE WHEN rc = 1 THEN cand_id END) AS BIGINT)
           AS coh_top1,
       CAST(MAX(CASE WHEN rc = 1 THEN coh END) AS BIGINT) AS coh_weight,
       CAST(MAX(CASE WHEN rank = 0 AND cand_id = gold
                     THEN 1 ELSE 0 END) AS BIGINT) AS bm25_hit,
       CAST(MAX(CASE WHEN rc = 1 AND cand_id = gold
                     THEN 1 ELSE 0 END) AS BIGINT) AS coh_hit
FROM sel GROUP BY conv_id, surface, gold
"""


def semantic_coherence_oracle(sf_dir: str, top_n: int = 5,
                              dim: int = 64) -> str:
    """Mirror of linking.semantic_coherence_link: per-dim integer
    context-vector sums with the lone-gold correction, exact integer
    dots/norms, one IEEE float chain num/max(√da·√db, 1), winner by
    (cos desc, rank, cand_id)."""
    p = synth.dictionary_path(sf_dir)
    glob = _transcripts_glob(sf_dir)
    q_cte = (
        f"t2 AS (SELECT lower(text) AS txt FROM read_parquet('{glob}')),\n"
        "da2 AS (SELECT unnest(aliases) AS surface FROM dict),\n"
        "q AS (SELECT DISTINCT da2.surface AS query\n"
        "      FROM t2 JOIN da2 ON strpos(t2.txt, da2.surface) > 0)")
    cand_select = _bm25_ctes(sf_dir, q_cte) + f"""
SELECT query AS surface, entity_id AS cand_id, rank
FROM ranked WHERE rank < {top_n}"""
    mrows_select = f"""
WITH da AS (SELECT entity_id, unnest(aliases) AS surface
            FROM read_parquet('{p}')),
tt AS (SELECT conv_id, lower(text) AS txt FROM read_parquet('{glob}'))
SELECT DISTINCT tt.conv_id, da.surface, da.entity_id AS gold
FROM tt JOIN da ON strpos(tt.txt, da.surface) > 0"""
    return f"""
WITH mrows AS ({mrows_select}),
cands AS ({cand_select}),
idx AS (SELECT unnest(generate_series(1, {dim})) AS i),
ev AS (
  SELECT vec_id AS e, idx.i,
         CAST(floor(CAST(embedding[idx.i] AS DOUBLE) * 1e6 + 0.5)
              AS BIGINT) AS v
  FROM embeddings, idx),
ents AS (
  SELECT conv_id, gold, CAST(count(*) AS BIGINT) AS n_surf
  FROM mrows GROUP BY conv_id, gold),
convsum AS (
  SELECT en.conv_id, ev.i, CAST(SUM(ev.v) AS BIGINT) AS sv
  FROM ents en JOIN ev ON ev.e = en.gold GROUP BY en.conv_id, ev.i),
adjv AS (
  SELECT m.conv_id, m.surface, m.gold, cs.i,
         CAST(cs.sv - CASE WHEN en.n_surf = 1 THEN evg.v ELSE 0 END
              AS BIGINT) AS av
  FROM mrows m
  JOIN ents en ON en.conv_id = m.conv_id AND en.gold = m.gold
  JOIN convsum cs ON cs.conv_id = m.conv_id
  JOIN ev evg ON evg.e = m.gold AND evg.i = cs.i),
danorm AS (
  SELECT conv_id, surface, CAST(SUM(av * av) AS BIGINT) AS da
  FROM adjv GROUP BY conv_id, surface),
dbn AS (SELECT e, CAST(SUM(v * v) AS BIGINT) AS db FROM ev GROUP BY e),
nums AS (
  SELECT a.conv_id, a.surface, c.cand_id, c.rank,
         CAST(SUM(a.av * ev.v) AS BIGINT) AS num
  FROM adjv a
  JOIN cands c ON c.surface = a.surface
  JOIN ev ON ev.e = c.cand_id AND ev.i = a.i
  GROUP BY a.conv_id, a.surface, c.cand_id, c.rank),
sel AS (
  SELECT n.conv_id, n.surface, m.gold, n.cand_id, n.rank,
         CAST(floor(CAST(n.num AS DOUBLE)
                    / greatest(sqrt(CAST(d.da AS DOUBLE))
                               * sqrt(CAST(b.db AS DOUBLE)), 1.0)
                    * 1e6 + 0.5) AS BIGINT) AS cosm
  FROM nums n
  JOIN danorm d ON d.conv_id = n.conv_id AND d.surface = n.surface
  JOIN dbn b ON b.e = n.cand_id
  JOIN mrows m ON m.conv_id = n.conv_id AND m.surface = n.surface),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, surface
                               ORDER BY cosm DESC, rank, cand_id) AS rc
  FROM sel)
SELECT conv_id, surface, gold AS gold_id,
       CAST(MAX(CASE WHEN rank = 0 THEN cand_id END) AS BIGINT)
           AS bm25_top1,
       CAST(MAX(CASE WHEN rc = 1 THEN cand_id END) AS BIGINT)
           AS sem_top1,
       CAST(MAX(CASE WHEN rc = 1 THEN cosm END) AS BIGINT)
           AS cos_micros,
       CAST(MAX(CASE WHEN rank = 0 AND cand_id = gold
                     THEN 1 ELSE 0 END) AS BIGINT) AS bm25_hit,
       CAST(MAX(CASE WHEN rc = 1 AND cand_id = gold
                     THEN 1 ELSE 0 END) AS BIGINT) AS sem_hit
FROM rk GROUP BY conv_id, surface, gold
"""


def fused_link_oracle(sf_dir: str, top_n: int = 5,
                      dim: int = 64) -> str:
    """Mirror of linking.fused_link: the coherence_link and
    semantic_coherence chains joined per (conv, surface, candidate),
    three winner windows (coh / cosine / lexicographic fusion), BM25
    rank-0 prior."""
    p = synth.dictionary_path(sf_dir)
    glob = _transcripts_glob(sf_dir)
    q_cte = (
        f"t2 AS (SELECT lower(text) AS txt FROM read_parquet('{glob}')),\n"
        "da2 AS (SELECT unnest(aliases) AS surface FROM dict),\n"
        "q AS (SELECT DISTINCT da2.surface AS query\n"
        "      FROM t2 JOIN da2 ON strpos(t2.txt, da2.surface) > 0)")
    cand_select = _bm25_ctes(sf_dir, q_cte) + f"""
SELECT query AS surface, entity_id AS cand_id, rank
FROM ranked WHERE rank < {top_n}"""
    mrows_select = f"""
WITH da AS (SELECT entity_id, unnest(aliases) AS surface
            FROM read_parquet('{p}')),
tt AS (SELECT conv_id, lower(text) AS txt FROM read_parquet('{glob}'))
SELECT DISTINCT tt.conv_id, da.surface, da.entity_id AS gold
FROM tt JOIN da ON strpos(tt.txt, da.surface) > 0"""
    pair_select = f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)}
SELECT least(subj_id, obj_id) AS a, greatest(subj_id, obj_id) AS b,
       CAST(count(*) AS BIGINT) AS w
FROM triples WHERE subj_id <> obj_id GROUP BY 1, 2"""
    return f"""
WITH mrows AS ({mrows_select}),
cands AS ({cand_select}),
pairw AS ({pair_select}),
ctx AS (
  SELECT DISTINCT m.conv_id, m.surface, m2.gold AS ctx_gold
  FROM mrows m JOIN mrows m2
    ON m2.conv_id = m.conv_id AND m2.surface <> m.surface),
base AS (
  SELECT m.conv_id, m.surface, m.gold, c.cand_id, c.rank
  FROM mrows m JOIN cands c ON c.surface = m.surface),
coh AS (
  SELECT b.conv_id, b.surface, b.cand_id,
         CAST(COALESCE(SUM(CASE WHEN x.ctx_gold IS NOT NULL
                                     AND x.ctx_gold <> b.cand_id
                                THEN COALESCE(p.w, 0) ELSE 0 END), 0)
              AS BIGINT) AS coh
  FROM base b
  LEFT JOIN ctx x ON x.conv_id = b.conv_id AND x.surface = b.surface
  LEFT JOIN pairw p ON p.a = least(b.cand_id, x.ctx_gold)
                    AND p.b = greatest(b.cand_id, x.ctx_gold)
  GROUP BY b.conv_id, b.surface, b.cand_id),
idx AS (SELECT unnest(generate_series(1, {dim})) AS i),
ev AS (
  SELECT vec_id AS e, idx.i,
         CAST(floor(CAST(embedding[idx.i] AS DOUBLE) * 1e6 + 0.5)
              AS BIGINT) AS v
  FROM embeddings, idx),
ents AS (
  SELECT conv_id, gold, CAST(count(*) AS BIGINT) AS n_surf
  FROM mrows GROUP BY conv_id, gold),
convsum AS (
  SELECT en.conv_id, ev.i, CAST(SUM(ev.v) AS BIGINT) AS sv
  FROM ents en JOIN ev ON ev.e = en.gold GROUP BY en.conv_id, ev.i),
adjv AS (
  SELECT m.conv_id, m.surface, cs.i,
         CAST(cs.sv - CASE WHEN en.n_surf = 1 THEN evg.v ELSE 0 END
              AS BIGINT) AS av
  FROM mrows m
  JOIN ents en ON en.conv_id = m.conv_id AND en.gold = m.gold
  JOIN convsum cs ON cs.conv_id = m.conv_id
  JOIN ev evg ON evg.e = m.gold AND evg.i = cs.i),
danorm AS (
  SELECT conv_id, surface, CAST(SUM(av * av) AS BIGINT) AS da
  FROM adjv GROUP BY conv_id, surface),
dbn AS (SELECT e, CAST(SUM(v * v) AS BIGINT) AS db FROM ev GROUP BY e),
nums AS (
  SELECT a.conv_id, a.surface, c.cand_id,
         CAST(SUM(a.av * ev.v) AS BIGINT) AS num
  FROM adjv a
  JOIN cands c ON c.surface = a.surface
  JOIN ev ON ev.e = c.cand_id AND ev.i = a.i
  GROUP BY a.conv_id, a.surface, c.cand_id),
sig AS (
  SELECT b.conv_id, b.surface, b.gold, b.cand_id, b.rank, h.coh,
         CAST(floor(CAST(n.num AS DOUBLE)
                    / greatest(sqrt(CAST(d.da AS DOUBLE))
                               * sqrt(CAST(db.db AS DOUBLE)), 1.0)
                    * 1e6 + 0.5) AS BIGINT) AS cosm
  FROM base b
  JOIN coh h ON h.conv_id = b.conv_id AND h.surface = b.surface
            AND h.cand_id = b.cand_id
  JOIN nums n ON n.conv_id = b.conv_id AND n.surface = b.surface
             AND n.cand_id = b.cand_id
  JOIN danorm d ON d.conv_id = b.conv_id AND d.surface = b.surface
  JOIN dbn db ON db.e = b.cand_id),
rk AS (
  SELECT *,
         row_number() OVER (PARTITION BY conv_id, surface
                            ORDER BY coh DESC, rank, cand_id) AS rc,
         row_number() OVER (PARTITION BY conv_id, surface
                            ORDER BY cosm DESC, rank, cand_id) AS rs,
         row_number() OVER (PARTITION BY conv_id, surface
                            ORDER BY coh DESC, cosm DESC, rank,
                                     cand_id) AS rf
  FROM sig)
SELECT conv_id, surface, gold AS gold_id,
       CAST(MAX(CASE WHEN rank = 0 THEN cand_id END) AS BIGINT)
           AS bm25_top1,
       CAST(MAX(CASE WHEN rc = 1 THEN cand_id END) AS BIGINT)
           AS coh_top1,
       CAST(MAX(CASE WHEN rs = 1 THEN cand_id END) AS BIGINT)
           AS sem_top1,
       CAST(MAX(CASE WHEN rf = 1 THEN cand_id END) AS BIGINT)
           AS final_id,
       CAST(MAX(CASE WHEN rf = 1 AND cand_id = gold
                     THEN 1 ELSE 0 END) AS BIGINT) AS final_hit
FROM rk GROUP BY conv_id, surface, gold
"""


def linking_recall_oracle(sf_dir: str) -> str:
    """recall@1 / recall@5 of the canonical name among BM25 candidates,
    over non-canonical alias surfaces (gold = the alias's own entity name)
    — the reference recall evaluation (Normalization run.py:39-50) as exact
    row-mean (0/1 sums are exact in float64, so one divide + round6 matches
    the engine bit-for-bit)."""
    q = ("q AS (SELECT DISTINCT a.query, dict.name AS gold FROM dict, "
         "unnest(dict.aliases) AS a(query) WHERE a.query <> dict.name)")
    return _bm25_ctes(sf_dir, q) + """
, hits AS (
  SELECT q.query,
         max(CASE WHEN r.rank < 1 AND d.name = q.gold THEN 1 ELSE 0 END) AS h1,
         max(CASE WHEN r.rank < 5 AND d.name = q.gold THEN 1 ELSE 0 END) AS h5
  FROM q
  LEFT JOIN ranked r ON r.query = q.query
  LEFT JOIN dict d ON d.entity_id = r.entity_id
  GROUP BY q.query)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       floor(CAST(sum(h1) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1e6 + 0.5)
         / 1e6 AS recall_at_1,
       floor(CAST(sum(h5) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1e6 + 0.5)
         / 1e6 AS recall_at_5
FROM hits
"""

def similarity_join_oracle(threshold: float = 0.4, left_max: int = 300,
                           right_max: int = 600) -> str:
    """Exact word-token-set Jaccard R×S join over a bounded id slice of
    documents (left = ids < left_max, right = ids in [left_max, right_max))
    — the all-pairs ground truth for stages/simjoin.similarity_join, whose
    prefix-filtered plan must produce the identical pair set and round6
    jaccards (integer ∩/∪ counts, one float64 divide on both sides)."""
    return f"""
WITH l AS (SELECT doc_id, text FROM documents WHERE doc_id < {left_max}),
r AS (SELECT doc_id, text FROM documents
      WHERE doc_id >= {left_max} AND doc_id < {right_max}),
lt AS (SELECT DISTINCT doc_id, tok FROM
       (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
        AS tok FROM l)),
rt AS (SELECT DISTINCT doc_id, tok FROM
       (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
        AS tok FROM r)),
ln AS (SELECT doc_id, count(*) AS n FROM lt GROUP BY doc_id),
rn AS (SELECT doc_id, count(*) AS n FROM rt GROUP BY doc_id),
inter AS (SELECT lt.doc_id AS a, rt.doc_id AS b, count(*) AS i
          FROM lt JOIN rt ON lt.tok = rt.tok GROUP BY lt.doc_id, rt.doc_id),
jac AS (SELECT a, b,
               CAST(i AS DOUBLE) / CAST(ln.n + rn.n - i AS DOUBLE) AS j
        FROM inter JOIN ln ON ln.doc_id = a JOIN rn ON rn.doc_id = b)
SELECT a AS doc_a, b AS doc_b, floor(j * 1e6 + 0.5) / 1e6 AS jaccard
FROM jac WHERE j >= {threshold}
"""

def kg_bfs_oracle(sf_dir: str, sources=(0,), rounds: int = 8) -> str:
    """Unrolled min-fold BFS rounds for stages/graph.bfs_distances over the
    KG edge list.  The fold is monotone (dists only appear/decrease and hit
    the hop fixpoint at the graph diameter), so `rounds` beyond the
    diameter are no-ops — a too-small value would hash-mismatch in the
    driver comparison itself.  CTEs are MATERIALIZED for the same reason as
    kg_kcore_oracle (multiple downstream references)."""
    srcs = ", ".join(f"({int(s)}, 0)" for s in sorted(set(sources)))
    parts = [f"""
e0 AS MATERIALIZED (
  SELECT subj_id AS u, obj_id AS v FROM triples WHERE subj_id <> obj_id
  UNION ALL
  SELECT obj_id, subj_id FROM triples WHERE subj_id <> obj_id),
d0(node, dist) AS (VALUES {srcs})"""]
    for i in range(rounds):
        parts.append(f"""
d{i + 1} AS MATERIALIZED (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d{i}
    UNION ALL
    SELECT e.v AS node, d.dist + 1 AS dist
    FROM d{i} d JOIN e0 e ON e.u = d.node)
  GROUP BY node)""")
    return (f"WITH {dict_values_cte()},\n{transcripts_cte(sf_dir)},\n"
            + _triples_cte(sf_dir) + "," + ",".join(parts)
            + f"""
SELECT node, CAST(dist AS BIGINT) AS dist FROM d{rounds}
""")


# ------------------------------------------------- corpus cleaning oracles --

def source_pii_rates_oracle() -> str:
    """Mirror of scrub.source_pii_rates: regexp_extract_all hit counts
    per (source, PII class) — exact because the patterns live in the
    Python-re ∩ RE2 subset (the pii_scrub contract)."""
    from deepkg_ray.stages.scrub import PII_PATTERNS
    kinds = " UNION ALL ".join(
        f"SELECT '{k}' AS kind, '{p}' AS pat"
        for k, p, _ in PII_PATTERNS)
    return f"""
WITH k AS ({kinds}),
aug AS (
  SELECT source,
         text || ' contact doc' || doc_id
              || '@mail.example.com see https://docs.example.org/d/'
              || doc_id || ' call 202-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents),
c AS (SELECT d.source, k.kind,
             CAST(len(regexp_extract_all(d.text, k.pat)) AS BIGINT) AS n
      FROM aug d, k)
SELECT source, kind, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_hit,
       CAST(SUM(n) AS BIGINT) AS n_hits,
       floor(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS hit_rate
FROM c GROUP BY source, kind
"""


def pii_scrub_oracle() -> str:
    """PII scrub over PII-augmented text — the SAME pattern strings as
    stages/scrub.PII_PATTERNS (imported, not re-typed) feed DuckDB's RE2;
    the patterns are restricted to the re∩RE2 common subset so counts and
    replacements agree character for character.  The augmentation suffix
    mirrors stages/scrub.augment_pii_kernel verbatim."""
    from deepkg_ray.stages.scrub import PII_PATTERNS
    counts = ",\n  ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}s"
        for name, pat, _ in PII_PATTERNS)
    scrub = "text"
    for _, pat, rep in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{rep}', 'g')"
    return f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact doc' || doc_id
              || '@mail.example.com see https://docs.example.org/d/'
              || doc_id || ' call 202-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents)
SELECT doc_id,
  {counts},
  {scrub} AS text_scrubbed
FROM aug
"""


def quality_filter_oracle(min_words: int = 30, max_words: int = 100_000,
                          min_mean_len: float = 3.0,
                          max_mean_len: float = 10.0,
                          min_stop_hits: int = 2) -> str:
    """Gopher-rule quality gate — mirrors stages/textstats.quality_filter:
    same stopword inventory (QUALITY_STOPWORDS), same micros rounding for
    mean_word_len, flags compared on the rounded value."""
    from deepkg_ray.stages.textstats import QUALITY_STOPWORDS
    stop_list = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    return f"""
WITH w AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text), '\\s+') END AS ws
  FROM documents),
s AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST(COALESCE(list_aggregate(list_transform(ws, x -> length(x)),
                                      'sum'), 0) AS BIGINT) AS sum_len,
         CAST(len(list_filter(ws,
              x -> list_contains([{stop_list}], lower(x)))) AS BIGINT)
           AS stop_hits
  FROM w),
m AS (
  SELECT doc_id, n_words, stop_hits,
         CASE WHEN n_words > 0 THEN
           floor(CAST(sum_len AS DOUBLE) / n_words * 1e6 + 0.5) / 1e6
         ELSE 0.0 END AS mean_word_len
  FROM s)
SELECT doc_id, n_words, mean_word_len, stop_hits,
  CAST(n_words >= {min_words} AND n_words <= {max_words} AS BIGINT)
    AS flag_words,
  CAST(mean_word_len >= {min_mean_len} AND mean_word_len <= {max_mean_len}
    AS BIGINT) AS flag_mean_len,
  CAST(stop_hits >= {min_stop_hits} AS BIGINT) AS flag_stop,
  CAST(n_words >= {min_words} AND n_words <= {max_words}
       AND mean_word_len >= {min_mean_len}
       AND mean_word_len <= {max_mean_len}
       AND stop_hits >= {min_stop_hits} AS BIGINT) AS keep
FROM m
"""


def decontaminate_oracle(n: int = 4, bench_mod: int = 17) -> str:
    """Benchmark n-gram decontamination — mirrors stages/scrub.decontaminate
    with the query-level benchmark rule doc_id % bench_mod = 0: n_hits =
    distinct shared n-grams, over non-benchmark docs only."""
    return f"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
  FROM documents),
g AS (
  SELECT doc_id, unnest(
    CASE WHEN len(ws) >= {n} THEN list_transform(
           generate_series(1, len(ws) - {n - 1}),
           i -> array_to_string(list_slice(ws, i, i + {n - 1}), ' '))
         ELSE CAST([] AS VARCHAR[]) END) AS gram
  FROM d),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {bench_mod} = 0),
hits AS (
  SELECT g.doc_id, CAST(count(DISTINCT g.gram) AS BIGINT) AS n_hits
  FROM g JOIN bench USING (gram)
  WHERE g.doc_id % {bench_mod} <> 0
  GROUP BY g.doc_id)
SELECT d.doc_id,
       COALESCE(h.n_hits, 0) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) > 0 AS BIGINT) AS contaminated
FROM d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {bench_mod} <> 0
"""


def doc_logprob_oracle() -> str:
    """Per-doc unigram log-likelihood — mirrors stages/textstats.doc_logprob:
    per-token micros floor(ln(count/total)*1e6+0.5) then integer SUM (the
    BM25 ln-parity convention; DuckDB ln and numpy log are both float64
    libm log on this expression grid)."""
    return """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents WHERE trim(text) <> ''),
cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM cnt),
lp AS (
  SELECT w, CAST(floor(ln(CAST(c AS DOUBLE) / t) * 1e6 + 0.5) AS BIGINT)
         AS lpm
  FROM cnt, tot),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(lpm) AS BIGINT) AS logprob_micros
  FROM tok JOIN lp USING (w) GROUP BY doc_id)
SELECT doc_id, n_tokens, logprob_micros,
       logprob_micros / 1e6 AS logprob,
       floor(CAST(logprob_micros AS DOUBLE) / n_tokens + 0.5) / 1e6
         AS avg_logprob
FROM per
"""


def sentence_dedup_oracle(table: str = "documents") -> str:
    """Corpus-wide first-occurrence sentence dedup — mirrors
    stages/curation.sentence_dedup: same '. ' split + rtrim('.') sentence
    semantics as conv_sentences, winner = min(doc_id*2^20 + sent_idx),
    docs reassembled in sent_idx order (docs with no surviving sentence
    drop)."""
    return f"""
WITH s AS (
  SELECT doc_id,
         CAST(unnest(generate_series(1, len(parts))) AS BIGINT) AS sent_idx,
         rtrim(unnest(parts), '.') AS sentence
  FROM (SELECT doc_id, string_split(text, '. ') AS parts FROM {table})),
w AS (
  SELECT sentence, min(doc_id * 1048576 + sent_idx) AS key
  FROM s GROUP BY sentence),
k AS (
  SELECT CAST(key // 1048576 AS BIGINT) AS doc_id,
         CAST(key % 1048576 AS BIGINT) AS sent_idx, sentence
  FROM w)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       string_agg(sentence, '. ' ORDER BY sent_idx) AS text_clean
FROM k GROUP BY doc_id
"""


def boilerplate_stats_oracle(min_docs: int = 3,
                             table: str = "documents") -> str:
    """Mirrors stages/curation.boilerplate_stats: '. ' split + rtrim('.')
    sentences; df = COUNT(DISTINCT doc_id); per-doc occurrence totals,
    boilerplate occurrence count (df >= min_docs), and kept characters."""
    return f"""
WITH s AS (
  SELECT doc_id, rtrim(unnest(string_split(text, '. ')), '.') AS sentence
  FROM {table}),
df AS (
  SELECT sentence, COUNT(DISTINCT doc_id) AS df FROM s GROUP BY sentence)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_sents,
       CAST(SUM(CASE WHEN df.df >= {min_docs} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler,
       CAST(SUM(CASE WHEN df.df < {min_docs} THEN length(s.sentence)
                ELSE 0 END) AS BIGINT) AS kept_chars
FROM s JOIN df USING (sentence)
GROUP BY s.doc_id
"""


def budget_select_oracle(frac: float = 0.6) -> str:
    """Quality-ordered token-budget selection — mirrors
    stages/curation.budget_select over doc_stats(quality, n_tokens):
    maximal (quality DESC, doc_id ASC) prefix with running token sum ≤
    floor(frac × total tokens).  The window running SUM is the ground
    truth the engine's histogram + boundary binary search must equal."""
    return f"""
WITH t AS ({doc_stats_oracle()}),
b AS (SELECT CAST(floor({frac} * sum(n_tokens)) AS BIGINT) AS budget FROM t),
w AS (
  SELECT doc_id, quality, n_tokens,
         SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id) AS cum
  FROM t)
SELECT doc_id, quality, n_tokens
FROM w, b WHERE cum <= budget
"""


def corpus_curate_oracle(frac: float = 0.6) -> str:
    """The composed curation pipeline — quality gate → sentence dedup →
    re-score cleaned text → budget selection — as one chained-CTE query
    mirroring stages/curation.corpus_curate stage for stage."""
    return f"""
WITH q AS ({quality_filter_oracle()}),
kept AS (
  SELECT d.doc_id, d.text FROM documents d
  JOIN q USING (doc_id) WHERE q.keep = 1),
sd AS ({sentence_dedup_oracle("kept")}),
clean AS (SELECT doc_id, text_clean AS text FROM sd),
t AS ({doc_stats_oracle("clean")}),
b AS (SELECT CAST(floor({frac} * sum(n_tokens)) AS BIGINT) AS budget FROM t),
w AS (
  SELECT doc_id, quality, n_tokens,
         SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id) AS cum
  FROM t)
SELECT doc_id, quality, n_tokens
FROM w, b WHERE cum <= budget
"""


def embedding_gram_oracle(dim: int = 64) -> str:
    """Gram-matrix reduction — mirrors stages/similarity.embedding_gram:
    per (row, i≤j) micros floor(CAST(e[i] AS DOUBLE)*e[j]*1e6+0.5), integer
    SUM per cell (1-based i, j as DuckDB lists are 1-based)."""
    return f"""
WITH idx AS (SELECT unnest(generate_series(1, {dim})) AS i),
cell AS (
  SELECT a.i, b.i AS j,
         CAST(floor(CAST(e.embedding[a.i] AS DOUBLE)
                    * CAST(e.embedding[b.i] AS DOUBLE) * 1e6 + 0.5)
              AS BIGINT) AS m
  FROM embeddings e, idx a, idx b
  WHERE b.i >= a.i)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(m) AS BIGINT) AS sxy_micros,
       CAST(sum(m) AS BIGINT) / 1e6 AS sxy
FROM cell GROUP BY i, j
"""


def _lpa_ctes(rounds: int) -> str:
    """The unrolled synchronous label-propagation CTE chain over the KG's
    undirected simple graph (es, l0 … l{rounds}) — shared by
    kg_labelprop_oracle and kg_modularity_oracle."""
    parts = ["""
es AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT subj_id AS u, obj_id AS v FROM triples WHERE subj_id <> obj_id
    UNION ALL
    SELECT obj_id, subj_id FROM triples WHERE subj_id <> obj_id)),
l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM es)"""]
    for i in range(rounds):
        parts.append(f"""
c{i + 1} AS MATERIALIZED (
  SELECT es.u, l.label, count(*) AS cnt
  FROM es JOIN l{i} l ON l.node = es.v
  GROUP BY es.u, l.label),
l{i + 1} AS MATERIALIZED (
  SELECT u AS node, label FROM c{i + 1}
  QUALIFY row_number() OVER (PARTITION BY u ORDER BY cnt DESC, label) = 1)""")
    return ",".join(parts)


def kg_labelprop_oracle(sf_dir: str, rounds: int = 4) -> str:
    """Unrolled synchronous label-propagation rounds over the KG's
    undirected simple graph — mirrors stages/graph.label_propagation:
    argmax neighbor-label count, tie → min label, EXACTLY ``rounds``
    rounds (synchronous LPA may 2-cycle, so the round count is the
    contract; the engine's fixpoint short-circuit only fires when further
    rounds are the identity)."""
    return (f"WITH {dict_values_cte()},\n{transcripts_cte(sf_dir)},\n"
            + _triples_cte(sf_dir) + "," + _lpa_ctes(rounds)
            + f"""
SELECT node, CAST(label AS BIGINT) AS label FROM l{rounds}
""")


def kg_modularity_oracle(sf_dir: str, rounds: int = 4) -> str:
    """Mirror of stages/graph.modularity: Newman Q per LPA community in
    doubled-edge terms, Q_c = (e2_c·m2 − d_c²)/m2².  The round6 is done in
    DOUBLE exactly as the engine does (numerators < 2^53 are exact in
    double; DuckDB's integer // truncates toward zero on negatives, so the
    floor must happen in float space)."""
    return (f"WITH {dict_values_cte()},\n{transcripts_cte(sf_dir)},\n"
            + _triples_cte(sf_dir) + "," + _lpa_ctes(rounds)
            + f""",
lab AS (SELECT node, CAST(label AS BIGINT) AS label FROM l{rounds}),
deg AS (SELECT u AS node, count(*) AS deg FROM es GROUP BY u),
mm AS (SELECT count(*) AS m2 FROM es),
e2t AS (
  SELECT la.label, count(*) AS e2
  FROM es
  JOIN lab la ON la.node = es.u
  JOIN lab lb ON lb.node = es.v
  WHERE la.label = lb.label
  GROUP BY la.label),
dct AS (
  SELECT la.label, CAST(sum(d.deg) AS BIGINT) AS d_tot,
         CAST(count(*) AS BIGINT) AS n_nodes
  FROM lab la JOIN deg d ON d.node = la.node
  GROUP BY la.label)
SELECT dct.label,
       dct.n_nodes,
       CAST(COALESCE(e2t.e2, 0) / 2 AS BIGINT) AS intra_edges,
       dct.d_tot AS degree_total,
       CAST(floor((CAST(COALESCE(e2t.e2, 0) AS DOUBLE) * mm.m2
                   - CAST(dct.d_tot AS DOUBLE) * dct.d_tot)
                  / (CAST(mm.m2 AS DOUBLE) * mm.m2) * 1e6 + 0.5) AS BIGINT)
           / 1e6 AS q_contrib
FROM dct LEFT JOIN e2t USING (label) CROSS JOIN mm
""")


def kg_components_oracle(sf_dir: str) -> str:
    """Connected components over the KG's undirected edge graph —
    recursive transitive-closure CTE (UNION dedups → terminates),
    component = min reachable node id."""
    return (f"WITH RECURSIVE {dict_values_cte()},\n{transcripts_cte(sf_dir)},\n"
            + _triples_cte(sf_dir) + """,
edges2 AS (
  SELECT subj_id AS u, obj_id AS v FROM triples WHERE subj_id <> obj_id
  UNION
  SELECT obj_id, subj_id FROM triples WHERE subj_id <> obj_id),
reach(u, v) AS (
  SELECT u, v FROM edges2
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges2 e ON r.v = e.u)
SELECT u AS node, least(u, min(v)) AS component
FROM reach GROUP BY u
""")


def robustness_profile_oracle(sf_dir: str, ks=(0, 5, 10)) -> str:
    """Mirror of graph.robustness_profile: per k, top-k degree hubs
    (tie → smaller id) removed, transitive-closure LCC over the
    remaining edges."""
    arms = []
    for k in sorted(ks):
        arms.append(f"""hub{k} AS (
  SELECT node FROM deg
  QUALIFY row_number() OVER (ORDER BY degree DESC, node) <= {k}
), ed{k} AS (
  SELECT u, v FROM edges2
  WHERE u NOT IN (SELECT node FROM hub{k})
    AND v NOT IN (SELECT node FROM hub{k})
), reach{k}(u, v) AS (
  SELECT u, v FROM ed{k}
  UNION
  SELECT r.u, e.v FROM reach{k} r JOIN ed{k} e ON r.v = e.u
), comp{k} AS (
  SELECT u AS node, least(u, min(v)) AS component
  FROM reach{k} GROUP BY u
), sizes{k} AS (
  SELECT component, CAST(count(*) AS BIGINT) AS c
  FROM comp{k} GROUP BY component
)""")
        ctes = ",\n".join(arms)
    finals = " UNION ALL ".join(
        f"""SELECT CAST({k} AS BIGINT) AS k_removed,
       CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_nodes,
       CAST(COALESCE(MAX(c), 0) AS BIGINT) AS lcc_size,
       CASE WHEN COALESCE(SUM(c), 0) = 0 THEN 0.0
            ELSE floor(MAX(c) / CAST(SUM(c) AS DOUBLE) * 1e6 + 0.5)
                 / 1e6 END AS lcc_share
FROM sizes{k}""" for k in sorted(ks))
    return (f"WITH RECURSIVE {dict_values_cte()},\n"
            f"{transcripts_cte(sf_dir)},\n"
            + _triples_cte(sf_dir) + f""",
edges2 AS (
  SELECT subj_id AS u, obj_id AS v FROM triples WHERE subj_id <> obj_id
  UNION
  SELECT obj_id, subj_id FROM triples WHERE subj_id <> obj_id),
deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS degree
        FROM edges2 GROUP BY u),
{ctes}
{finals}
""")


def grouped_quantiles_oracle(qs=(0.25, 0.5, 0.75, 0.9)) -> str:
    """Per-lang n_chars quantiles — mirrors
    stages/quantiles.grouped_quantiles_disc (quantile_disc semantics)."""
    qlist = ", ".join(str(q) for q in qs)
    return f"""
WITH g AS (
  SELECT lang, quantile_disc(n_chars, [{qlist}]) AS ql
  FROM documents GROUP BY lang)
SELECT lang, unnest([{qlist}]) AS q, CAST(unnest(ql) AS BIGINT) AS value
FROM g
"""


def inverted_index_oracle() -> str:
    """Posting-list build — mirrors stages/phrasemine.inverted_index:
    same lower+trim+\\s+ tokenization as the tf/idf family, postings as
    ascending comma-joined doc_ids."""
    return """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''),
td AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY term, doc_id)
SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM td GROUP BY term
"""


def kg_negatives_oracle(sf_dir: str, ks=(1, 7)) -> str:
    """Filtered negative sampling — mirrors stages/graph.negative_triples
    over the deduplicated (subj_id, pred, obj_id) adjacency: corruption
    (s, p, (o+k) mod V), V = 1 + max entity id, minus real positives."""
    klist = ", ".join(str(int(k)) for k in ks)
    return (f"WITH {dict_values_cte()},\n{transcripts_cte(sf_dir)},\n"
            + _triples_cte(sf_dir) + f""",
adj AS MATERIALIZED (SELECT DISTINCT subj_id, pred, obj_id FROM triples),
vv AS (SELECT 1 + greatest(max(subj_id), max(obj_id)) AS n FROM adj),
cand AS (
  SELECT subj_id, pred, (obj_id + k) % n AS obj_neg, CAST(k AS BIGINT) AS k
  FROM adj, vv, (SELECT unnest([{klist}]) AS k))
SELECT c.subj_id, c.pred, CAST(c.obj_neg AS BIGINT) AS obj_neg, c.k
FROM cand c
WHERE NOT EXISTS (
  SELECT 1 FROM adj a
  WHERE a.subj_id = c.subj_id AND a.pred = c.pred AND a.obj_id = c.obj_neg)
""")


def turn_latency_oracle(sf_dir: str) -> str:
    """Role-transition latency — mirrors stages/convgroup.turn_latency:
    lag() adjacency per conversation in turn order, integer-microsecond
    deltas, avg = floor(total/n + 0.5)."""
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, role, epoch_us(ts) AS us
  FROM read_parquet('{_transcripts_glob(sf_dir)}')),
l AS (
  SELECT role AS to_role,
         lag(role) OVER w AS from_role,
         us - lag(us) OVER w AS delta
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
SELECT from_role, to_role, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(delta) AS BIGINT) AS total_us,
       CAST(floor(CAST(sum(delta) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
         AS avg_us
FROM l WHERE from_role IS NOT NULL
GROUP BY from_role, to_role
"""


def context_budget_oracle(sf_dir: str, limit: int = 2048) -> str:
    """Mirror of convgroup.context_budget_report: whitespace tokens per
    conversation (doc_stats convention), fit/overflow split."""
    return f"""
WITH t AS (
  SELECT conv_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt
  FROM read_parquet('{_transcripts_glob(sf_dir)}')),
c AS (SELECT conv_id, CAST(SUM(nt) AS BIGINT) AS tok
      FROM t GROUP BY conv_id),
a AS (SELECT CAST(count(*) AS BIGINT) AS n_convs,
             CAST(SUM(CASE WHEN tok <= {limit} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_fit,
             CAST(SUM(tok) AS BIGINT) AS total_tokens,
             CAST(SUM(CASE WHEN tok > {limit} THEN tok - {limit}
                           ELSE 0 END) AS BIGINT) AS overflow_tokens
      FROM c)
SELECT n_convs, n_fit, n_convs - n_fit AS n_trunc,
       floor(n_fit / CAST(n_convs AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS fit_share,
       total_tokens, overflow_tokens
FROM a
"""


def conv_turn_taking_oracle(sf_dir: str) -> str:
    """Mirror of convgroup.conv_turn_taking: lag() role adjacency per
    conversation, alternation share with one round6 division."""
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, role
  FROM read_parquet('{_transcripts_glob(sf_dir)}')),
l AS (
  SELECT conv_id,
         CASE WHEN role <> lag(role) OVER w THEN 1 ELSE 0 END AS alt,
         CASE WHEN lag(role) OVER w IS NULL THEN 0 ELSE 1 END AS adj
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
a AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
             CAST(SUM(adj) AS BIGINT) AS n_adj,
             CAST(SUM(CASE WHEN adj = 1 THEN alt ELSE 0 END) AS BIGINT)
               AS n_alt
      FROM l GROUP BY conv_id)
SELECT conv_id, n_turns, n_alt,
       floor(n_alt / CAST(n_adj AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS alt_rate
FROM a WHERE n_adj > 0
"""


def kg_walks_oracle(sf_dir: str, steps: int = 4, start_mod: int = 3) -> str:
    """Deterministic random walks — mirrors stages/graph.random_walks:
    neighbors ranked by ascending id (row_number), next-hop rank =
    (u*2654435761 + t*40503) mod deg + 1, unrolled ``steps`` rounds."""
    parts = [f"""
es AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT subj_id AS u, obj_id AS v FROM triples WHERE subj_id <> obj_id
    UNION ALL
    SELECT obj_id, subj_id FROM triples WHERE subj_id <> obj_id)),
er AS MATERIALIZED (
  SELECT u, v,
         row_number() OVER (PARTITION BY u ORDER BY v) AS rnk,
         count(*) OVER (PARTITION BY u) AS deg
  FROM es),
w0 AS (SELECT DISTINCT u AS start, u AS cur FROM es
       WHERE u % {start_mod} = 0)"""]
    for t in range(1, steps + 1):
        parts.append(f"""
w{t} AS MATERIALIZED (
  SELECT w.start, er.v AS cur
  FROM w{t - 1} w JOIN er
    ON er.u = w.cur
   AND er.rnk = (w.cur * 2654435761 + {t} * 40503) % er.deg + 1)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT start, CAST({t} AS BIGINT) AS step, cur AS node FROM w{t}"
        for t in range(steps + 1))
    return (f"WITH {dict_values_cte()},\n{transcripts_cte(sf_dir)},\n"
            + _triples_cte(sf_dir) + "," + ",".join(parts) + "\n" + sel)


def tool_usage_oracle(sf_dir: str) -> str:
    """Per (role, tool) turn + distinct-conversation counts over
    tool-bearing turns — mirrors stages/convgroup.tool_usage."""
    return f"""
SELECT role, tool, CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM read_parquet('{_transcripts_glob(sf_dir)}')
WHERE tool <> ''
GROUP BY role, tool
"""


def moving_average_oracle(k: int = 3) -> str:
    """Trailing k-row per-user moving average — mirrors
    stages/windows.moving_average: per-row micros, exact int window sum,
    avg = floor(sum/n + 0.5)/1e6."""
    frame = f"ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW"
    return f"""
WITH e AS (
  SELECT user_id, event_id, ts,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
  FROM events
),
w AS (
  SELECT user_id, event_id,
         sum(vm) OVER (PARTITION BY user_id ORDER BY ts, event_id {frame}) AS s,
         count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id {frame}) AS n
  FROM e
)
SELECT user_id, event_id, CAST(n AS BIGINT) AS n_window,
       floor(CAST(s AS DOUBLE) / n + 0.5) / 1e6 AS ma_value
FROM w
"""


def conv_transcripts_oracle(sf_dir: str) -> str:
    """Ordered-collect mirror of stages/convgroup.conv_transcripts —
    string_agg(text, chr(10) ORDER BY turn_idx) per conversation."""
    return f"""
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
       string_agg(text, chr(10) ORDER BY turn_idx) AS transcript
FROM read_parquet('{_transcripts_glob(sf_dir)}')
GROUP BY conv_id
"""


def nation_revenue_oracle() -> str:
    """4-table star-join mirror of pipelines/relational.nation_revenue —
    per-lineitem micros summed per nation; n_orders counts distinct
    orders that have lineitems."""
    return """
SELECT n.n_name,
       sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 1e6 + 0.5)
                AS BIGINT)) / 1e6 AS revenue,
       CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def corr_events_oracle() -> str:
    """Per-key Pearson-r mirror of stages/windows.corr_events — DOUBLE-cast
    int sums evaluated with the engine's exact op chain (DuckDB's native
    corr() uses a different numerical path)."""
    return """
WITH m AS (
  SELECT event_type,
         CAST(floor(value * 1e3 + 0.5) AS BIGINT) AS x,
         (CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24 AS y
  FROM events
), s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(x * y) AS DOUBLE) AS sxy,
         CAST(sum(x * x) AS DOUBLE) AS sxx,
         CAST(sum(y * y) AS DOUBLE) AS syy
  FROM m GROUP BY event_type
)
SELECT event_type, n,
       CASE WHEN sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy) > 0
            THEN floor((n * sxy - sx * sy)
                       / (sqrt(n * sxx - sx * sx)
                          * sqrt(n * syy - sy * sy)) * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS corr_r
FROM s
"""


def top_with_ties_oracle(k: int = 2) -> str:
    """dense_rank ≤ k mirror of stages/windows.top_events_with_ties."""
    return f"""
WITH v AS (
  SELECT event_type, event_id,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
  FROM events
), r AS (
  SELECT event_type, event_id,
         CAST(dense_rank() OVER (PARTITION BY event_type ORDER BY vm DESC)
              AS BIGINT) AS vrank
  FROM v
)
SELECT event_type, event_id, vrank FROM r WHERE vrank <= {k}
"""


def interarrival_oracle() -> str:
    """LAG mirror of stages/windows.interarrival_gaps — µs gap to the same
    user's previous event, first-per-user rows dropped."""
    return """
WITH g AS (
  SELECT user_id, event_id,
         CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER
              (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
              AS BIGINT) AS gap_us
  FROM events
)
SELECT user_id, event_id, gap_us FROM g WHERE gap_us IS NOT NULL
"""


def pivot_counts_oracle(types=("click", "error", "purchase", "signup",
                               "view")) -> str:
    """Crosstab mirror of stages/windows.pivot_counts — one CASE-sum arm
    per pivot value over the epoch-day-of-week key."""
    arms = ",\n       ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_{t}" for t in types)
    return f"""
SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7 AS dow,
       {arms}
FROM events GROUP BY dow
"""


def kg_reciprocity_oracle(sf_dir: str) -> str:
    """Reciprocity mirror of stages/graph.reciprocity over the KG's
    distinct directed s≠d edges."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
dedges AS (
  SELECT DISTINCT subj_id AS s, obj_id AS d FROM triples
  WHERE subj_id <> obj_id
)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(CASE WHEN r.s IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_reciprocal,
       floor(CAST(sum(CASE WHEN r.s IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
             / count(*) * 1e6 + 0.5) / 1e6 AS reciprocity
FROM dedges e LEFT JOIN dedges r ON r.s = e.d AND r.d = e.s
"""


def pricing_cube_oracle() -> str:
    """GROUP BY CUBE mirror of pipelines/relational.pricing_cube
    (sentinel 'ALL' for cubed-away dimensions; micros sums per level)."""
    return """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       sum(CAST(floor(l_quantity * 1e6 + 0.5) AS BIGINT)) / 1e6 AS sum_qty,
       sum(CAST(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT)) / 1e6 AS sum_base_price,
       sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1e6 + 0.5) AS BIGINT)) / 1e6 AS sum_revenue,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
"""


def column_profile_oracle(columns=("l_quantity", "l_extendedprice",
                                   "l_discount", "l_tax")) -> str:
    """Per-column profiling mirror of pipelines/relational.column_profile —
    one UNION ALL arm per column, micros-exact min/max/mean."""
    arms = []
    for c in columns:
        arms.append(f"""
SELECT '{c}' AS "column",
       CAST(count({c}) AS BIGINT) AS n,
       CAST(count(*) - count({c}) AS BIGINT) AS n_null,
       CAST(min(CAST(floor({c} * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS min_v,
       CAST(max(CAST(floor({c} * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS max_v,
       floor(CAST(sum(CAST(floor({c} * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
             / count({c}) + 0.5) / 1e6 AS mean_v
FROM lineitem""")
    return " UNION ALL ".join(arms)


def cohort_retention_oracle(bucket_sec: int = 86400) -> str:
    """Daily cohort retention mirror of stages/windows.cohort_retention:
    cohort = epoch-day of each user's first event; cell (cohort, offset)
    counts distinct users active on cohort+offset."""
    return f"""
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / {bucket_sec}) AS BIGINT) AS day
  FROM events
), c AS (
  SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id
)
SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM d JOIN c USING (user_id)
GROUP BY 1, 2
"""


def rank_events_oracle(n_tiles: int = 4) -> str:
    """percent_rank + ntile mirror of stages/windows.rank_events — the
    window orders by (value-micros, event_id), a total order, so
    percent_rank is tie-free and ntile follows SQL bucket-fill rules."""
    return f"""
WITH v AS (
  SELECT event_id, event_type,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
  FROM events
)
SELECT event_id, event_type,
       floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pct_rank,
       CAST(ntile({n_tiles}) OVER w AS BIGINT) AS tile
FROM v
WINDOW w AS (PARTITION BY event_type ORDER BY vm, event_id)
"""


def pricing_rollup_oracle() -> str:
    """GROUP BY ROLLUP mirror of pipelines/relational.pricing_rollup
    (sentinel 'ALL' for rolled-up dimensions; micros sums per level)."""
    return """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       sum(CAST(floor(l_quantity * 1e6 + 0.5) AS BIGINT)) / 1e6 AS sum_qty,
       sum(CAST(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT)) / 1e6 AS sum_base_price,
       sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1e6 + 0.5) AS BIGINT)) / 1e6 AS sum_revenue,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def kg_cooccurrence_oracle(sf_dir: str) -> str:
    """Same-turn entity co-occurrence — mirrors
    stages/mention.cooccurrence_counts: distinct (turn, entity) mention
    rows self-joined per turn (e1 < e2), counted per pair.  Uses the same
    substring-membership derivation as mention_counts_sql (synth
    invariants: no surface is a substring of another, no overlaps)."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
m AS (
  SELECT DISTINCT t.conv_id, t.turn_idx, d.entity_id
  FROM t JOIN dict d ON strpos(t.txt, d.surface) > 0
)
SELECT a.entity_id AS e1, b.entity_id AS e2,
       CAST(count(*) AS BIGINT) AS n_turns
FROM m a JOIN m b
  ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
 AND a.entity_id < b.entity_id
GROUP BY e1, e2
"""


def kg_linkpred_oracle(sf_dir: str, min_cn: int = 2,
                       max_degree: int | None = None) -> str:
    """Structural link prediction over the KG — mirrors
    stages/graph.link_prediction: wedge pairs through common neighbors
    weighted by the center's resource-allocation term floor(1e6/deg+0.5),
    existing edges anti-joined away.  ``max_degree`` applies the engine's
    hub-truncation cap (centers with deg > max_degree emit no wedges) so
    the 100-TB scale posture is itself oracle-checked."""
    cap = f"AND d.degree <= {max_degree}" if max_degree is not None else ""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
adj AS (
  SELECT DISTINCT least(subj_id, obj_id) AS lo, greatest(subj_id, obj_id) AS hi
  FROM triples WHERE subj_id <> obj_id
),
bidir AS (
  SELECT lo AS node, hi AS peer FROM adj
  UNION
  SELECT hi, lo FROM adj
),
deg AS (SELECT node, count(*) AS degree FROM bidir GROUP BY node),
w AS (
  SELECT b.node, b.peer,
         CAST(floor(1e6 / d.degree + 0.5) AS BIGINT) AS wm
  FROM bidir b JOIN deg d USING (node)
  WHERE d.degree >= 2 {cap}
),
pairs AS (
  SELECT a.peer AS e1, b.peer AS e2, a.wm
  FROM w a JOIN w b ON a.node = b.node AND a.peer < b.peer
),
cand AS (
  SELECT e1, e2, CAST(count(*) AS BIGINT) AS cn,
         CAST(sum(wm) AS BIGINT) AS ra_micros
  FROM pairs GROUP BY e1, e2
  HAVING count(*) >= {min_cn}
)
SELECT c.e1, c.e2, c.cn, c.ra_micros / 1e6 AS ra
FROM cand c
WHERE NOT EXISTS (SELECT 1 FROM adj e WHERE e.lo = c.e1 AND e.hi = c.e2)
"""


def embedding_pca_oracle(dim: int = 64, n_iters: int = 6) -> str:
    """Unrolled power iteration on the Gram matrix — mirrors
    stages/similarity.pca_power_projection.  Every intermediate is an
    exactly-representable integer in double (Gn, v in [-1e6, 1e6]; matvec
    sums < 2^53), so summation order never matters; the only roundings are
    the floor(x*1e6+0.5) chains both sides evaluate identically."""
    steps = []
    prev = "v0"
    for t in range(1, n_iters + 1):
        steps.append(f"""
w{t} AS (
  SELECT gn.i, sum(gn.gv * {prev}.val) AS w
  FROM gn JOIN {prev} ON gn.j = {prev}.i GROUP BY gn.i
),
m{t} AS (SELECT max(abs(w)) AS m FROM w{t}),
v{t} AS (SELECT i, floor(w / m * 1e6 + 0.5) AS val FROM w{t}, m{t})""")
        prev = f"v{t}"
    unrolled = ",".join(steps)
    return f"""
WITH idx AS (SELECT unnest(generate_series(1, {dim})) AS i),
cell AS (
  SELECT a.i, b.i AS j,
         CAST(floor(CAST(e.embedding[a.i] AS DOUBLE)
                    * CAST(e.embedding[b.i] AS DOUBLE) * 1e6 + 0.5)
              AS BIGINT) AS m
  FROM embeddings e, idx a, idx b
  WHERE b.i >= a.i),
agg AS (SELECT i, j, CAST(sum(m) AS BIGINT) AS sm FROM cell GROUP BY i, j),
g AS (
  SELECT i, j, sm FROM agg
  UNION ALL
  SELECT j, i, sm FROM agg WHERE i <> j
),
gm AS (SELECT max(abs(sm)) AS m FROM g),
-- NULLIF guards the all-zero/empty Gram (gv NULL -> empty result, matching
-- the engine's empty-input early return); identical on any real input
gn AS (SELECT g.i, g.j,
              floor(CAST(g.sm AS DOUBLE) / NULLIF(gm.m, 0) * 1e6 + 0.5) AS gv
       FROM g, gm),
v0 AS (SELECT i, CAST(1000000 AS DOUBLE) AS val FROM idx),
{unrolled},
p AS (
  SELECT e.vec_id,
         floor(CAST(e.embedding[v.i] AS DOUBLE) * 1e6 + 0.5) * v.val AS t
  FROM embeddings e, {prev} v
)
SELECT vec_id, floor(sum(t) / 1e6 + 0.5) / 1e6 AS pc1
FROM p GROUP BY vec_id
"""


def kg_edge_spans_oracle(sf_dir: str) -> str:
    """Temporal KG edges — mirrors stages/canonical.edge_spans: triples
    joined to the turn timestamp, min/max integer µs per canonical edge."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
tr AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us
  FROM read_parquet('{_transcripts_glob(sf_dir)}')
)
SELECT x.subj_id, x.pred, x.obj_id,
       CAST(count(*) AS BIGINT) AS weight,
       CAST(min(tr.ts_us) AS BIGINT) AS first_us,
       CAST(max(tr.ts_us) AS BIGINT) AS last_us
FROM triples x JOIN tr
  ON tr.conv_id = x.conv_id AND tr.turn_idx = x.turn_idx
GROUP BY x.subj_id, x.pred, x.obj_id
"""


def predicate_cardinality_oracle(sf_dir: str) -> str:
    """Mirror of canonical.predicate_cardinality over the canonical
    DISTINCT edge set."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
ed AS (SELECT DISTINCT subj_id, pred, obj_id FROM triples),
o AS (SELECT pred, subj_id, CAST(count(*) AS BIGINT) AS c
      FROM ed GROUP BY pred, subj_id),
i AS (SELECT pred, obj_id, CAST(count(*) AS BIGINT) AS c
      FROM ed GROUP BY pred, obj_id),
oo AS (SELECT pred, CAST(max(c) AS BIGINT) AS max_out,
              CAST(sum(c) AS BIGINT) AS n_edges FROM o GROUP BY pred),
ii AS (SELECT pred, CAST(max(c) AS BIGINT) AS max_in
       FROM i GROUP BY pred)
SELECT oo.pred, oo.n_edges, oo.max_out, ii.max_in,
       CASE WHEN oo.max_out = 1 AND ii.max_in = 1 THEN '1:1'
            WHEN oo.max_out = 1 THEN 'N:1'
            WHEN ii.max_in = 1 THEN '1:N'
            ELSE 'M:N' END AS cardinality
FROM oo JOIN ii USING (pred)
"""


def kg_growth_curve_oracle(sf_dir: str) -> str:
    """Mirror of canonical.kg_growth_curve: first-observation day per
    canonical edge (kg_edge_spans derivation), calendar-complete daily
    new-edge counts + running cumulative."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
tr AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us
  FROM read_parquet('{_transcripts_glob(sf_dir)}')
),
sp AS (
  SELECT x.subj_id, x.pred, x.obj_id,
         min(tr.ts_us) // 86400000000 AS day
  FROM triples x JOIN tr
    ON tr.conv_id = x.conv_id AND tr.turn_idx = x.turn_idx
  GROUP BY x.subj_id, x.pred, x.obj_id
),
c AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new FROM sp
      GROUP BY day),
b AS (SELECT min(day) AS d0, max(day) AS d1 FROM c),
g AS (SELECT unnest(generate_series(b.d0, b.d1)) AS day FROM b),
f AS (SELECT g.day, CAST(COALESCE(c.n_new, 0) AS BIGINT) AS n_new
      FROM g LEFT JOIN c USING (day))
SELECT CAST(day * 86400000000 AS BIGINT) AS day_us, n_new,
       CAST(SUM(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_edges
FROM f
"""


def dsir_scores_oracle(target_lang: str = "en", n_buckets: int = 1024) -> str:
    """Hashed-unigram DSIR log-likelihood-ratio scores — mirrors
    stages/curation.dsir_scores (word_idf tokenization, md5_number_lower
    bucketing, ln-micros per bucket, exact int64 per-doc sum)."""
    b = int(n_buckets)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents WHERE trim(text) <> ''
),
tb AS (
  SELECT doc_id, CAST(md5_number_lower(w) % {b} AS BIGINT) AS b FROM toks
),
flags AS (SELECT doc_id, (lang = '{target_lang}') AS is_tgt FROM documents),
cnt AS (
  SELECT tb.b, count(*) AS raw_n,
         sum(CASE WHEN f.is_tgt THEN 1 ELSE 0 END) AS tgt_n
  FROM tb JOIN flags f USING (doc_id) GROUP BY tb.b
),
tot AS (SELECT sum(raw_n) AS r, sum(tgt_n) AS t FROM cnt),
lm AS (
  SELECT b,
         CAST(floor((ln((tgt_n + 1.0) / (t + {b}))
                     - ln((raw_n + 1.0) / (r + {b}))) * 1e6 + 0.5)
              AS BIGINT) AS lmm
  FROM cnt, tot
),
s AS (
  SELECT tb.doc_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(lm.lmm) AS BIGINT) AS m
  FROM tb JOIN lm USING (b) GROUP BY tb.doc_id
)
SELECT d.doc_id,
       COALESCE(s.n, 0) AS n_tokens,
       COALESCE(s.m, 0) AS dsir_micros,
       COALESCE(s.m, 0) / 1e6 AS dsir
FROM documents d LEFT JOIN s USING (doc_id)
"""


def embedding_centroids_oracle(dim: int = 64) -> str:
    """Per-label mean embedding — mirrors
    stages/similarity.embedding_centroids (per-element micros, integer
    SUM, floor(sum/n+0.5)/1e6)."""
    return f"""
WITH idx AS (SELECT unnest(generate_series(1, {dim})) AS i),
m AS (
  SELECT e.label, idx.i,
         CAST(floor(CAST(e.embedding[idx.i] AS DOUBLE) * 1e6 + 0.5)
              AS BIGINT) AS em
  FROM embeddings e, idx
)
SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS i,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(em) AS BIGINT) AS s_micros,
       floor(CAST(sum(em) AS DOUBLE) / count(*) + 0.5) / 1e6 AS mean_i
FROM m GROUP BY label, i
"""


def centroid_similarity_oracle(dim: int = 64) -> str:
    """Mirror of similarity.centroid_similarity: integer micros centroids
    (floor(sum/n + 0.5)), exact integer dot/norm sums, one final
    round6(dot / (√n1·√n2)) double op."""
    return f"""
WITH idx AS (SELECT unnest(generate_series(1, {dim})) AS i),
m AS (
  SELECT e.label, idx.i,
         CAST(floor(CAST(e.embedding[idx.i] AS DOUBLE) * 1e6 + 0.5)
              AS BIGINT) AS em
  FROM embeddings e, idx
),
c AS (
  SELECT label, i,
         CAST(floor(CAST(sum(em) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
           AS cm
  FROM m GROUP BY label, i
),
dots AS (
  SELECT a.label AS l1, b.label AS l2,
         CAST(sum(a.cm * b.cm) AS BIGINT) AS dot_m2
  FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
  GROUP BY a.label, b.label
),
nn AS (SELECT label, CAST(sum(cm * cm) AS BIGINT) AS n2
       FROM c GROUP BY label)
SELECT CAST(d.l1 AS BIGINT) AS l1, CAST(d.l2 AS BIGINT) AS l2, d.dot_m2,
       floor(CAST(d.dot_m2 AS DOUBLE)
             / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
             * 1000000 + 0.5) / 1000000 AS cosine
FROM dots d JOIN nn a ON a.label = d.l1 JOIN nn b ON b.label = d.l2
"""


def kg_schema_oracle(sf_dir: str) -> str:
    """Predicate type-signature counts — mirrors
    stages/canonical.schema_table over the adjacency derivation."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
adj AS (
  SELECT subj_id, pred, obj_id, count(*) AS weight,
         min(subj_type) AS subj_type, min(obj_type) AS obj_type
  FROM triples GROUP BY subj_id, pred, obj_id
)
SELECT subj_type, pred, obj_type,
       CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(weight) AS BIGINT) AS n_support
FROM adj GROUP BY subj_type, pred, obj_type
"""


def grid_quantiles_oracle(qs=(0.05, 0.25, 0.5, 0.75, 0.95, 0.99),
                          n_bins: int = 4096) -> str:
    """Fixed-grid histogram quantiles over events.value — mirrors
    stages/quantiles.grid_quantiles (integer micros grid, quantile_disc
    pick, bucket lower edge)."""
    picks = []
    for q in qs:
        qm = int(q * 1e6 + 0.5)   # floor(q*1e6+0.5), q ≥ 0
        picks.append(f"""
SELECT CAST({q} AS DOUBLE) AS q, t.bucket,
       CAST(mm.mn + t.bucket * (mm.mx - mm.mn + 1) // {n_bins} AS BIGINT)
         / 1e6 AS approx
FROM mm, (
  SELECT min(bucket) AS bucket FROM s
  WHERE cum >= greatest(0, ({qm} * (SELECT tot FROM tot)
                            + 999999) // 1000000 - 1) + 1
) t""")
    body = " UNION ALL ".join(picks)
    return f"""
WITH v AS (SELECT CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm FROM events),
mm AS (SELECT min(vm) AS mn, max(vm) AS mx FROM v),
tot AS (SELECT count(*) AS tot FROM v),
b AS (SELECT (vm - mn) * {n_bins} // (mx - mn + 1) AS bucket FROM v, mm),
h AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket),
s AS (SELECT bucket, sum(n) OVER (ORDER BY bucket) AS cum FROM h)
{body}
"""


def linking_mrr_oracle(sf_dir: str, top_n: int = 5) -> str:
    """MRR of the canonical name among BM25 top-n candidates over
    non-canonical alias queries — mirrors stages/scoring.mrr_ds on the
    micros-exact BM25 tier (same q CTE as linking_recall_oracle)."""
    q = ("q AS (SELECT DISTINCT a.query, dict.name AS gold FROM dict, "
         "unnest(dict.aliases) AS a(query) WHERE a.query <> dict.name)")
    return _bm25_ctes(sf_dir, q) + f"""
, hits AS (
  SELECT q.query,
         min(CASE WHEN r.rank < {top_n} AND d.name = q.gold
                  THEN r.rank END) AS best
  FROM q
  LEFT JOIN ranked r ON r.query = q.query
  LEFT JOIN dict d ON d.entity_id = r.entity_id
  GROUP BY q.query)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       floor(CAST(sum(CASE WHEN best IS NULL THEN 0
                           ELSE CAST(floor(1e6 / (best + 1) + 0.5) AS BIGINT)
                      END) AS DOUBLE)
             / count(*) + 0.5) / 1e6 AS mrr
FROM hits
"""


def linking_ndcg_oracle(sf_dir: str, top_n: int = 5) -> str:
    """nDCG of the canonical name among BM25 top-n candidates — mirrors
    stages/scoring.ndcg_distributed (linking_mrr_oracle's hits CTE with
    the ln-ratio log₂ discount)."""
    q = ("q AS (SELECT DISTINCT a.query, dict.name AS gold FROM dict, "
         "unnest(dict.aliases) AS a(query) WHERE a.query <> dict.name)")
    return _bm25_ctes(sf_dir, q) + f"""
, hits AS (
  SELECT q.query,
         min(CASE WHEN r.rank < {top_n} AND d.name = q.gold
                  THEN r.rank END) AS best
  FROM q
  LEFT JOIN ranked r ON r.query = q.query
  LEFT JOIN dict d ON d.entity_id = r.entity_id
  GROUP BY q.query)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       floor(CAST(sum(CASE WHEN best IS NULL THEN 0
                           ELSE CAST(floor(1e6 * ln(2) / ln(best + 2)
                                           + 0.5) AS BIGINT)
                      END) AS DOUBLE)
             / count(*) + 0.5) / 1e6 AS ndcg
FROM hits
"""


def funnel_oracle(steps=("view", "click", "purchase")) -> str:
    """Ordered funnel counts — mirrors stages/windows.funnel_counts
    (strictly-later µs at each stage)."""
    s1, s2, s3 = steps
    return f"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
a AS (SELECT user_id, min(us) AS ta FROM e
      WHERE event_type = '{s1}' GROUP BY user_id),
b AS (SELECT e.user_id, min(e.us) AS tb FROM e JOIN a USING (user_id)
      WHERE e.event_type = '{s2}' AND e.us > a.ta GROUP BY e.user_id),
c AS (SELECT e.user_id, min(e.us) AS tc FROM e JOIN b USING (user_id)
      WHERE e.event_type = '{s3}' AND e.us > b.tb GROUP BY e.user_id)
SELECT (SELECT count(*) FROM a) AS n_step1,
       (SELECT count(*) FROM b) AS n_step2,
       (SELECT count(*) FROM c) AS n_step3
"""


def zscore_oracle(z_cut: float = 3.0) -> str:
    """Per-type z-scores over events — mirrors
    stages/windows.zscore_events op for op."""
    return f"""
WITH m AS (
  SELECT event_type, count(*) AS n,
         sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS s1,
         sum(CAST(floor(value * value * 1e6 + 0.5) AS BIGINT)) AS s2
  FROM events GROUP BY event_type
),
st AS (
  SELECT event_type,
         CAST(s1 AS DOUBLE) / 1e6 / n AS mean,
         CAST(s2 AS DOUBLE) / 1e6 / n
           - (CAST(s1 AS DOUBLE) / 1e6 / n) * (CAST(s1 AS DOUBLE) / 1e6 / n)
           AS var
  FROM m
),
z AS (
  SELECT e.event_id, e.event_type,
         CASE WHEN st.var > 0
              THEN floor((e.value - st.mean) / sqrt(st.var) * 1e6 + 0.5) / 1e6
              ELSE 0.0 END AS z
  FROM events e JOIN st USING (event_type)
)
SELECT event_id, event_type, z, abs(z) > {z_cut} AS is_outlier FROM z
"""


def time_window_sum_oracle(window_sec: int = 600) -> str:
    """RANGE-frame trailing time-window sum — mirrors
    stages/windows.time_window_sum (peer rows at equal ts included)."""
    win_us = window_sec * 1_000_000
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
  FROM events
)
SELECT user_id, event_id,
       CAST(count(*) OVER w AS BIGINT) AS n_in_window,
       sum(vm) OVER w / 1e6 AS win_sum
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY us
             RANGE BETWEEN {win_us} PRECEDING AND CURRENT ROW)
"""


def segment_revenue_share_oracle() -> str:
    """Ratio-to-group shares — mirrors
    pipelines/relational.segment_revenue_share (micros totals, one rounded
    division)."""
    return """
WITH o AS (
  SELECT o.o_orderkey, c.c_mktsegment,
         CAST(floor(o.o_totalprice * 1e6 + 0.5) AS BIGINT) AS rm
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
t AS (SELECT c_mktsegment, sum(rm) AS tot FROM o GROUP BY c_mktsegment)
SELECT o.o_orderkey, o.c_mktsegment,
       CAST(o.rm AS DOUBLE) / 1e6 AS revenue,
       floor(CAST(o.rm AS DOUBLE) / tot * 1e6 + 0.5) / 1e6 AS share
FROM o JOIN t USING (c_mktsegment)
"""


def lang_confusion_oracle() -> str:
    """Lang-id confusion counts vs the gold lang column — mirrors
    stages/textstats.lang_confusion (same CASE chain as lang_id_oracle)."""
    langs = {
        "en": "'the','and','of','to','in'",
        "de": "'der','die','und','das','ist'",
        "es": "'el','la','los','y','de'",
        "fr": "'le','la','les','et','des'",
    }
    hit_cols = ", ".join(
        f"len(list_filter(toks, x -> x IN ({sw}))) AS h_{lg}"
        for lg, sw in langs.items())
    return f"""
WITH toks AS (
  SELECT lang,
         CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(lower(trim(text)), '\\s+') END AS toks
  FROM documents
), hits AS (SELECT lang, {hit_cols} FROM toks),
det AS (
  SELECT lang,
       CASE WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr AND h_en > 0 THEN 'en'
            WHEN h_de >= h_es AND h_de >= h_fr AND h_de > 0 THEN 'de'
            WHEN h_es >= h_fr AND h_es > 0 THEN 'es'
            WHEN h_fr > 0 THEN 'fr'
            ELSE 'unknown' END AS lang_detected
  FROM hits
)
SELECT lang, lang_detected, CAST(count(*) AS BIGINT) AS n
FROM det GROUP BY lang, lang_detected
"""


def entity_spans_oracle(sf_dir: str) -> str:
    """Entity timeline — mirrors stages/mention.entity_spans: per-turn
    occurrence counts per entity (summed over its surfaces), joined to the
    turn timestamp, min/max µs + mention sum per entity."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
m AS (
  SELECT t.conv_id, t.turn_idx, d.entity_id,
         CAST(sum((length(t.txt) - length(replace(t.txt, d.surface, '')))
                  / length(d.surface)) AS BIGINT) AS n
  FROM t JOIN dict d ON strpos(t.txt, d.surface) > 0
  GROUP BY t.conv_id, t.turn_idx, d.entity_id
),
tr AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us
  FROM read_parquet('{_transcripts_glob(sf_dir)}')
)
SELECT m.entity_id, CAST(sum(m.n) AS BIGINT) AS n_mentions,
       CAST(min(tr.ts_us) AS BIGINT) AS first_us,
       CAST(max(tr.ts_us) AS BIGINT) AS last_us
FROM m JOIN tr ON tr.conv_id = m.conv_id AND tr.turn_idx = m.turn_idx
GROUP BY m.entity_id
"""


def conv_sessions_oracle(sf_dir: str, gap_sec: int = 1800) -> str:
    """Per-conversation session counts over the transcript table — mirrors
    stages/convgroup.conv_sessions (turn order, gap > gap_sec starts a new
    session)."""
    gap_us = gap_sec * 1_000_000
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS pus
  FROM read_parquet('{_transcripts_glob(sf_dir)}')
)
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(CASE WHEN pus IS NULL OR us - pus > {gap_us}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       CAST(max(us) - min(us) AS BIGINT) AS span_us
FROM t GROUP BY conv_id
"""


def cooccurrence_pmi_oracle(sf_dir: str) -> str:
    """Entity co-occurrence PMI — mirrors stages/mention.cooccurrence_pmi
    (turn-level marginals, N = total transcript turns, ln-micros)."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
m AS (
  SELECT DISTINCT t.conv_id, t.turn_idx, d.entity_id
  FROM t JOIN dict d ON strpos(t.txt, d.surface) > 0
),
pair AS (
  SELECT a.entity_id AS e1, b.entity_id AS e2,
         CAST(count(*) AS BIGINT) AS n_turns
  FROM m a JOIN m b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
   AND a.entity_id < b.entity_id
  GROUP BY e1, e2
),
ent AS (SELECT entity_id, count(*) AS n FROM m GROUP BY entity_id),
tot AS (SELECT count(*) AS n FROM t)
SELECT p.e1, p.e2, p.n_turns,
       floor(ln((p.n_turns * tot.n) / CAST(a.n * b.n AS DOUBLE)) * 1e6 + 0.5)
         / 1e6 AS pmi
FROM pair p
JOIN ent a ON a.entity_id = p.e1
JOIN ent b ON b.entity_id = p.e2, tot
"""


def windowed_hll_oracle(window_sec: int = 3600, p: int = 12) -> str:
    """Per-tumbling-window HLL register state over events.user_id —
    mirrors stages/sketches.windowed_hll_registers (md5-parity hash,
    exact bit-length rho, Max per (window, register))."""
    win_us = window_sec * 1_000_000
    mask = (1 << (64 - p)) - 1
    return f"""
WITH h AS (
  SELECT (epoch_us(ts) // {win_us}) * {win_us} AS window_start_us,
         md5_number_lower(user_id::VARCHAR) AS h
  FROM events
),
r AS (
  SELECT window_start_us, CAST(h >> {64 - p} AS BIGINT) AS register,
         {64 - p + 1} - (CASE WHEN (h & {mask}) = 0 THEN 0
              ELSE length(to_base(CAST(h & {mask} AS BIGINT), 2)) END) AS rho
  FROM h
)
SELECT window_start_us, register, CAST(max(rho) AS BIGINT) AS rho
FROM r GROUP BY window_start_us, register
"""


def conv_weighted_sample_oracle(sf_dir: str, k: int = 50,
                                seed: int = 11) -> str:
    """Mirror of packing.conv_weighted_sample: per-conversation ws-token
    totals over the synthesized transcripts, exact-dyadic md5 uniform on
    the string conv key, A-ES ln(u)/max(w,1) top-k."""
    u = (f"((md5_number_lower('{seed}:' || conv_id) >> 11) + 1.0) "
         f"/ {float(1 << 53)!r}")
    return f"""
WITH {transcripts_cte(sf_dir)},
c AS (
  SELECT conv_id,
         CAST(SUM(CASE WHEN trim(txt) = '' THEN 0
                  ELSE len(string_split_regex(trim(txt), '\\s+')) END)
              AS BIGINT) AS n_tokens
  FROM t GROUP BY conv_id
), s AS (
  SELECT conv_id, n_tokens,
         ln({u}) / greatest(CAST(n_tokens AS DOUBLE), 1.0) AS key
  FROM c
)
SELECT conv_id, n_tokens,
       CAST(row_number() OVER (ORDER BY key DESC, conv_id) AS BIGINT)
         AS "rank"
FROM s ORDER BY key DESC, conv_id LIMIT {k}
"""


def dsir_sample_oracle(m: int = 100, seed: int = 13,
                       target_lang: str = "en",
                       n_buckets: int = 1024) -> str:
    """Mirror of curation.dsir_sample: the dsir_scores chain wrapped as
    a CTE, Gumbel key dsir_micros/1e6 − ln(−ln(u)) with the exact-dyadic
    md5 uniform, top-m (key desc, doc_id)."""
    u = (f"((md5_number_lower('{seed}:' || CAST(doc_id AS VARCHAR)) >> 11)"
         f" + 1.0) / {float(1 << 53)!r}")
    return f"""
WITH sc AS ({dsir_scores_oracle(target_lang, n_buckets)}),
g AS (
  SELECT doc_id, dsir_micros,
         CAST(dsir_micros AS DOUBLE) / 1e6 - ln(-ln({u})) AS key
  FROM sc
)
SELECT doc_id, dsir_micros,
       CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS BIGINT)
         AS "rank"
FROM g ORDER BY key DESC, doc_id LIMIT {m}
"""


def weighted_sample_oracle(k: int = 100, seed: int = 7) -> str:
    """A-ES weighted sample — mirrors stages/textstats.weighted_sample_k:
    identical exact-dyadic u and ln(u)/max(w,1) key, ORDER BY key DESC."""
    u = (f"((md5_number_lower('{seed}:' || CAST(doc_id AS VARCHAR)) >> 11)"
         f" + 1.0) / {float(1 << 53)!r}")
    return f"""
WITH s AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         ln({u}) / greatest(CAST(n_chars AS DOUBLE), 1.0) AS key
  FROM documents
)
SELECT doc_id, weight,
       CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS BIGINT)
         AS "rank"
FROM s ORDER BY key DESC, doc_id LIMIT {k}
"""


def distant_label_oracle(sf_dir: str) -> str:
    """Distant-supervision labels over the synthesized corpus — mirrors
    stages/distant.distant_label.  SQL-derivable because of synth.
    distant_paths' construction invariants (disjoint vocabularies,
    non-overlapping non-abutting occurrences): the Σδ² DP segmentation
    then equals 'every dictionary occurrence is a segment', so labels
    reduce to joins: core match start → I/type/S, core match inside →
    O/type/S, any position of a full match OR one past it → O/None/D
    (annotation.h:276-281 Unknown spill), else I/None/S."""
    from deepkg_ray import synth
    sents_p, core_p, full_p = synth.distant_paths(sf_dir)
    return f"""
WITH sents AS (SELECT doc_idx, sent_idx, string_split(text, ' ') AS toks
               FROM read_parquet('{sents_p}')),
tok AS (SELECT doc_idx, sent_idx,
               unnest(toks) AS token,
               generate_subscripts(toks, 1) - 1 AS token_idx
        FROM sents),
core AS (SELECT surface,
                string_agg(DISTINCT "type", ',' ORDER BY "type") AS types
         FROM read_parquet('{core_p}') GROUP BY surface),
core1 AS (SELECT surface AS w, types FROM core
          WHERE NOT contains(surface, ' ')),
core2 AS (SELECT string_split(surface, ' ')[1] AS w1,
                 string_split(surface, ' ')[2] AS w2, types
          FROM core WHERE contains(surface, ' ')),
full1 AS (SELECT surface AS w FROM read_parquet('{full_p}')
          WHERE NOT contains(surface, ' ')),
full2 AS (SELECT string_split(surface, ' ')[1] AS w1,
                 string_split(surface, ' ')[2] AS w2
          FROM read_parquet('{full_p}') WHERE contains(surface, ' ')),
m_core AS (
  SELECT t.doc_idx, t.sent_idx, t.token_idx AS l, t.token_idx + 1 AS r,
         c.types
  FROM tok t JOIN core1 c ON t.token = c.w
  UNION ALL
  SELECT a.doc_idx, a.sent_idx, a.token_idx, a.token_idx + 2, c.types
  FROM tok a JOIN tok b ON b.doc_idx = a.doc_idx
                       AND b.sent_idx = a.sent_idx
                       AND b.token_idx = a.token_idx + 1
  JOIN core2 c ON a.token = c.w1 AND b.token = c.w2),
m_full AS (
  SELECT t.doc_idx, t.sent_idx, t.token_idx AS l, t.token_idx + 1 AS r
  FROM tok t JOIN full1 c ON t.token = c.w
  UNION ALL
  SELECT a.doc_idx, a.sent_idx, a.token_idx, a.token_idx + 2
  FROM tok a JOIN tok b ON b.doc_idx = a.doc_idx
                       AND b.sent_idx = a.sent_idx
                       AND b.token_idx = a.token_idx + 1
  JOIN full2 c ON a.token = c.w1 AND b.token = c.w2)
SELECT t.doc_idx, t.sent_idx, t.token_idx, t.token,
  CASE WHEN cs.types IS NOT NULL THEN 'I'
       WHEN ci.types IS NOT NULL THEN 'O'
       WHEN EXISTS (SELECT 1 FROM m_full f
                    WHERE f.doc_idx = t.doc_idx AND f.sent_idx = t.sent_idx
                      AND t.token_idx BETWEEN f.l AND f.r) THEN 'O'
       ELSE 'I' END AS boundary,
  coalesce(cs.types, ci.types, 'None') AS types,
  CASE WHEN cs.types IS NOT NULL OR ci.types IS NOT NULL THEN 1
       WHEN EXISTS (SELECT 1 FROM m_full f
                    WHERE f.doc_idx = t.doc_idx AND f.sent_idx = t.sent_idx
                      AND t.token_idx BETWEEN f.l AND f.r) THEN 0
       ELSE 1 END AS safe
FROM tok t
LEFT JOIN m_core cs ON cs.doc_idx = t.doc_idx AND cs.sent_idx = t.sent_idx
                   AND cs.l = t.token_idx
LEFT JOIN m_core ci ON ci.doc_idx = t.doc_idx AND ci.sent_idx = t.sent_idx
                   AND ci.l = t.token_idx - 1 AND ci.r = t.token_idx + 1
"""


def bpe_merge_counts_oracle(sf_dir: str, n_merges: int = 200) -> str:
    """Per-doc token counts under the LEARNED BPE merge table — mirrors
    stages/bpe.bpe_merge_token_counts: the same RE2-safe pre-tokenizer in
    SQL, joined to the persisted word→n_tokens vocabulary (total by
    construction: the vocab covers every distinct corpus pre-token; the
    word-level merge math is pinned by brute-force unit tests in
    tests/test_bpe.py)."""
    from deepkg_ray.stages.bpe import bpe_artifacts
    from deepkg_ray.stages.textstats import BPE_PRETOKEN_PATTERN
    _, vocab_p = bpe_artifacts(sf_dir, n_merges)
    sqlpat = BPE_PRETOKEN_PATTERN.replace("'", "''")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{sqlpat}')) AS word
  FROM documents),
c AS (
  SELECT t.doc_id, CAST(sum(v.n_tokens) AS BIGINT) AS n_merge_tokens
  FROM toks t JOIN read_parquet('{vocab_p}') v ON t.word = v.word
  GROUP BY t.doc_id)
SELECT d.doc_id, coalesce(c.n_merge_tokens, 0) AS n_merge_tokens
FROM documents d LEFT JOIN c USING (doc_id)
"""


# ------------------------------------------------------- edit-distance join --

def editdist_pairs_oracle() -> str:
    """All-pairs Levenshtein <= 1 over customer names — the blocking-free
    ground truth stages/editdist.editdist_pairs must reproduce exactly
    (the deletion-neighborhood blocking is lossless for max_d=1)."""
    return """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND abs(length(a.c_name) - length(b.c_name)) <= 1
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


def editdist_clusters_oracle() -> str:
    """Connected components (min reachable id) over the ed<=1 pair graph
    via the same transitive-closure CTE dedup_clusters_oracle uses."""
    return """
WITH RECURSIVE pairs AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_custkey < b.c_custkey
   AND abs(length(a.c_name) - length(b.c_name)) <= 1
  WHERE levenshtein(a.c_name, b.c_name) <= 1
),
edges2 AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges2
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges2 e ON r.v = e.u
)
SELECT u AS node, CAST(least(u, min(v)) AS BIGINT) AS component
FROM reach GROUP BY u
"""


def events_resample_oracle(window_sec: int = 300) -> str:
    """Per (user, tumbling window) OHLC resample for
    stages/windows.resample_ohlc: first/last by the total (ts_us, event_id)
    order via row_number rn=1 / rn=n joins (DuckDB arg_min cannot take a
    composite key), min/max/count over int64 micros, round6 finish — the
    engine's op chain verbatim."""
    win_us = window_sec * 1_000_000
    return f"""
WITH e AS (
  SELECT user_id,
         (epoch_us(ts) // {win_us}) * {win_us} AS window_start_us,
         epoch_us(ts) AS ts_us, event_id,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
  FROM events
),
r AS (
  SELECT user_id, window_start_us, vm,
         row_number() OVER (PARTITION BY user_id, window_start_us
                            ORDER BY ts_us, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id, window_start_us) AS n
  FROM e
),
g AS (
  SELECT user_id, window_start_us,
         CAST(count(*) AS BIGINT) AS n_events,
         min(vm) AS mn, max(vm) AS mx
  FROM e GROUP BY user_id, window_start_us
)
SELECT g.user_id, g.window_start_us, g.n_events,
       floor((f.vm / 1e6) * 1e6 + 0.5) / 1e6 AS v_first,
       floor((l.vm / 1e6) * 1e6 + 0.5) / 1e6 AS v_last,
       floor((g.mn / 1e6) * 1e6 + 0.5) / 1e6 AS v_min,
       floor((g.mx / 1e6) * 1e6 + 0.5) / 1e6 AS v_max
FROM g
JOIN r f ON f.user_id = g.user_id
        AND f.window_start_us = g.window_start_us AND f.rn = 1
JOIN r l ON l.user_id = g.user_id
        AND l.window_start_us = g.window_start_us AND l.rn = l.n
"""


def snapshot_diff_oracle() -> str:
    """CDC delta between the two deterministic orders snapshots in
    stages/diff.table_diff's query wiring: snapshot A drops keys %10==3,
    snapshot B drops keys %7==2 and bumps price by +1.0 on keys %5==0.
    FULL OUTER JOIN on the key; unchanged rows (equal micros) excluded;
    -1.0 sentinel for the absent side (matching diff.ABSENT)."""
    return """
WITH a AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT) AS vm
  FROM orders WHERE o_orderkey % 10 != 3
),
b AS (
  SELECT o_orderkey,
         CAST(floor((o_totalprice +
                     CASE WHEN o_orderkey % 5 = 0 THEN 1.0 ELSE 0.0 END)
                    * 1e6 + 0.5) AS BIGINT) AS vm
  FROM orders WHERE o_orderkey % 7 != 2
)
SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN a.o_orderkey IS NULL THEN 'added'
            WHEN b.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS status,
       CASE WHEN a.o_orderkey IS NULL THEN -1.0
            ELSE floor((a.vm / 1e6) * 1e6 + 0.5) / 1e6 END AS value_a,
       CASE WHEN b.o_orderkey IS NULL THEN -1.0
            ELSE floor((b.vm / 1e6) * 1e6 + 0.5) / 1e6 END AS value_b
FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL OR a.vm != b.vm
"""


def fk_audit_oracle() -> str:
    """Referential-integrity audit for stages/diff.fk_orphans: per FK edge,
    child rowcount + orphan count against a parent view that deterministically
    drops keys %13==0 (orphan injection — same view on the engine side)."""
    return """
SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
       CAST(count(*) AS BIGINT) AS n_child,
       CAST(count(*) FILTER (WHERE p.o_orderkey IS NULL) AS BIGINT) AS n_orphans
FROM lineitem c LEFT JOIN
     (SELECT o_orderkey FROM orders WHERE o_orderkey % 13 != 0) p
  ON c.l_orderkey = p.o_orderkey
UNION ALL
SELECT 'orders.o_custkey->customer',
       CAST(count(*) AS BIGINT),
       CAST(count(*) FILTER (WHERE p.c_custkey IS NULL) AS BIGINT)
FROM orders c LEFT JOIN
     (SELECT c_custkey FROM customer WHERE c_custkey % 13 != 0) p
  ON c.o_custkey = p.c_custkey
UNION ALL
SELECT 'customer.c_nationkey->nation',
       CAST(count(*) AS BIGINT),
       CAST(count(*) FILTER (WHERE p.n_nationkey IS NULL) AS BIGINT)
FROM customer c LEFT JOIN nation p
  ON c.c_nationkey = p.n_nationkey
UNION ALL
SELECT 'lineitem.l_suppkey->supplier',
       CAST(count(*) AS BIGINT),
       CAST(count(*) FILTER (WHERE p.s_suppkey IS NULL) AS BIGINT)
FROM lineitem c LEFT JOIN
     (SELECT s_suppkey FROM supplier WHERE s_suppkey % 13 != 0) p
  ON c.l_suppkey = p.s_suppkey
"""


def state_history_oracle() -> str:
    """Gaps-and-islands SCD2 intervals for stages/windows.state_history:
    island key = rn − rn_per_type over the (ts, event_id) total order,
    island aggregate, LEAD(valid_from) closes each interval (-1 = open)."""
    return """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_us(ts), event_id) AS rn_t
  FROM events
),
isl AS (
  SELECT user_id, event_type, min(ts_us) AS valid_from_us,
         CAST(count(*) AS BIGINT) AS n_events
  FROM e GROUP BY user_id, event_type, rn - rn_t
)
SELECT user_id, event_type, valid_from_us,
       COALESCE(LEAD(valid_from_us) OVER (PARTITION BY user_id
                                          ORDER BY valid_from_us),
                -1) AS valid_to_us,
       n_events
FROM isl
"""


def markov_stationary_oracle(n_iters: int = 8,
                             scale: int = 10 ** 12) -> str:
    """Mirror of windows.markov_stationary: the unrolled π·Pᵏ chain in
    integer floor arithmetic (kg_hits_oracle's MATERIALIZED-CTE
    convention over the LEAD-pair transition grid)."""
    prev = "x0"
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(f"""x{i} AS MATERIALIZED (
  SELECT ty.t, CAST(COALESCE(s.sm, 0) AS BIGINT) AS v
  FROM ty LEFT JOIN (
    SELECT c.dst_type AS t, SUM((p.v * c.n) // r.tot) AS sm
    FROM {prev} p JOIN c ON c.src_type = p.t
                 JOIN r ON r.src_type = c.src_type
    GROUP BY c.dst_type) s ON s.t = ty.t
)""")
        prev = f"x{i}"
    chain = ",\n".join(iters)
    return f"""
WITH e AS (
  SELECT event_type AS src_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id)
           AS dst_type
  FROM events
),
c AS (SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS n
      FROM e WHERE dst_type IS NOT NULL GROUP BY src_type, dst_type),
ty AS (SELECT src_type AS t FROM c UNION SELECT dst_type FROM c),
kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ty),
r AS (SELECT src_type, CAST(SUM(n) AS BIGINT) AS tot
      FROM c GROUP BY src_type),
x0 AS (SELECT t, CAST({scale} // (SELECT k FROM kk) AS BIGINT) AS v
       FROM ty),
{chain}
SELECT t AS event_type, CAST(v AS BIGINT) AS pi_scaled FROM x{n_iters}
"""


def markov_transitions_oracle() -> str:
    """LEAD-pair transition counts + row-normalized probability for
    stages/windows.markov_transitions (single correctly-rounded divide on
    exact integer counts, same op chain as the engine finish)."""
    return """
WITH e AS (
  SELECT event_type AS src_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS dst_type
  FROM events
),
c AS (
  SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS n
  FROM e WHERE dst_type IS NOT NULL GROUP BY src_type, dst_type
)
SELECT src_type, dst_type, n,
       floor((CAST(n AS DOUBLE) /
              CAST(sum(n) OVER (PARTITION BY src_type) AS DOUBLE))
             * 1e6 + 0.5) / 1e6 AS p
FROM c
"""


def frequent_pairs_oracle(min_support: int = 2) -> str:
    """Basket pair supports for stages/basket.frequent_pairs: distinct
    (order, part) baskets, a<b self-join, HAVING support filter."""
    return f"""
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS item_a, b2.l_partkey AS item_b,
       CAST(count(*) AS BIGINT) AS n
FROM b a JOIN b b2
  ON a.l_orderkey = b2.l_orderkey AND a.l_partkey < b2.l_partkey
GROUP BY a.l_partkey, b2.l_partkey
HAVING count(*) >= {min_support}
"""


def skyline_oracle() -> str:
    """Pareto frontier of part in (minimize p_retailprice, maximize
    p_size) for stages/skyline.skyline_2d: NOT EXISTS dominance test
    (≤/≥ with at least one strict), round6 on the echoed measures."""
    return """
SELECT p.p_partkey,
       floor(p.p_retailprice * 1e6 + 0.5) / 1e6 AS p_retailprice,
       floor(p.p_size * 1e6 + 0.5) / 1e6 AS p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
"""


def kg_ppr_oracle(sf_dir: str, n_seeds: int = 2, n_iters: int = 5,
                  damping_pct: int = 85) -> str:
    """Personalized PageRank mirror of stages/graph.py
    personalized_pagerank_scaled: the kg_pagerank unrolled-CTE chain with
    teleport mass restricted to the n_seeds smallest node ids (CASE base
    term), identical BIGINT floor-division ops."""
    scale, dp = 10**12, damping_pct
    prev = "pr0"
    iters = []
    for i in range(1, n_iters + 1):
        iters.append(f"""pr{i} AS (
  SELECT nd.node,
         (CASE WHEN nd.node IN (SELECT node FROM seeds)
               THEN (SELECT ({100 - dp} * {scale}) // (100 * s)
                     FROM sparams)
               ELSE 0 END)
         + ({dp} * COALESCE(t.total, 0)) // 100 AS pm
  FROM nodes nd LEFT JOIN (
    SELECT e.d AS node, SUM(p.pm // o.c) AS total
    FROM {prev} p JOIN dedges e ON e.s = p.node
    JOIN outdeg o ON o.s = p.node
    GROUP BY e.d
  ) t ON t.node = nd.node
)""")
        prev = f"pr{i}"
    chain = ",\n".join(iters)
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
dedges AS (
  SELECT DISTINCT subj_id AS s, obj_id AS d FROM triples
  WHERE subj_id <> obj_id
),
nodes AS (SELECT s AS node FROM dedges UNION SELECT d FROM dedges),
seeds AS (SELECT node FROM nodes ORDER BY node LIMIT {n_seeds}),
sparams AS (SELECT count(*) AS s FROM seeds),
outdeg AS (SELECT s, count(*) AS c FROM dedges GROUP BY s),
pr0 AS (SELECT node,
               CASE WHEN node IN (SELECT node FROM seeds)
                    THEN (SELECT {scale} // s FROM sparams) ELSE 0 END AS pm
        FROM nodes),
{chain}
SELECT node, CAST(pm AS BIGINT) AS ppr_scaled FROM {prev}
"""


def regression_events_oracle() -> str:
    """Per-key OLS mirror of stages/windows.regression_events — DOUBLE-cast
    integer sums, the engine's exact op chain (not DuckDB regr_slope)."""
    return """
WITH m AS (
  SELECT event_type,
         (CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24 AS x,
         CAST(floor(value * 1e3 + 0.5) AS BIGINT) AS y
  FROM events
), s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(x * y) AS DOUBLE) AS sxy,
         CAST(sum(x * x) AS DOUBLE) AS sxx
  FROM m GROUP BY event_type
)
SELECT event_type, n,
       floor((CASE WHEN n * sxx - sx * sx > 0
                   THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                   ELSE 0.0 END) / 1e3 * 1e6 + 0.5) / 1e6 AS slope,
       floor(((sy - (CASE WHEN n * sxx - sx * sx > 0
                          THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                          ELSE 0.0 END) * sx) / n) / 1e3 * 1e6 + 0.5) / 1e6
         AS intercept
FROM s
"""


def token_quantiles_cont_oracle(qs=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) -> str:
    """Interpolated (type-7) quantiles of per-doc token counts for
    stages/quantiles.quantiles_cont — re-derived from the cumulative
    histogram with the engine's exact micro-index op chain, NOT the
    builtin quantile_cont (different internal expression ordering)."""
    q_rows = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q, "
        f"CAST(floor({q} * 1e6 + 0.5) AS BIGINT) AS qm" for q in qs)
    return f"""
WITH base AS (
  SELECT CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS v
  FROM documents
),
h AS (SELECT v, count(*) AS n FROM base GROUP BY v),
c AS (SELECT v, sum(n) OVER (ORDER BY v) AS cum FROM h),
params AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM h),
qs AS ({q_rows}),
pos AS (
  SELECT q, qm * (n - 1) AS hm FROM qs, params
),
pick AS (
  SELECT q, hm // 1000000 AS lo, hm % 1000000 AS frac FROM pos
),
el AS (
  SELECT p.q, p.frac,
         (SELECT min(v) FROM c WHERE cum > p.lo) AS vlo,
         (SELECT min(v) FROM c
          WHERE cum > p.lo + CASE WHEN p.frac > 0 THEN 1 ELSE 0 END) AS vhi
  FROM pick p
)
SELECT q,
       floor((vlo + (frac * (vhi - vlo)) / 1e6) * 1e6 + 0.5) / 1e6 AS value
FROM el
"""


def shipping_priority_oracle(segment: str = "BUILDING",
                             cutoff: str = "1998-06-01", k: int = 10) -> str:
    """TPC-H Q3 mirror of pipelines/relational.shipping_priority: micros
    revenue, deterministic (-rev, orderkey) top-k."""
    return f"""
SELECT l.l_orderkey,
       sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 1e6 + 0.5)
                AS BIGINT)) / 1e6 AS revenue,
       CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_orderdate_us,
       o.o_orderpriority
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{segment}'
  AND epoch_us(o.o_orderdate) < epoch_us(TIMESTAMP '{cutoff}')
  AND epoch_us(l.l_shipdate) > epoch_us(TIMESTAMP '{cutoff}')
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 1e6 + 0.5)
             AS BIGINT)) DESC, l.l_orderkey
LIMIT {k}
"""


def running_distinct_oracle() -> str:
    """First-occurrence flag + running SUM emulation of windowed
    count(DISTINCT) for stages/windows.running_distinct."""
    return """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY epoch_us(ts), event_id) = 1
              THEN 1 ELSE 0 END AS fst
  FROM events
)
SELECT user_id, event_id,
       CAST(sum(fst) OVER (PARTITION BY user_id
                           ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_distinct_types
FROM e
"""


def kg_truss_oracle(sf_dir: str, k: int = 3, n_rounds: int = 8) -> str:
    """k-truss peeling mirror of stages/graph.truss_edges: per round,
    wedge-pair supports over the current edge set, support < k−2 dropped;
    unrolled n_rounds (extra rounds past the fixpoint are no-ops, so any
    n_rounds ≥ the engine's convergence round matches exactly)."""
    min_sup = k - 2
    rounds = []
    prev = "t0"
    for i in range(1, n_rounds + 1):
        rounds.append(f"""b{i} AS MATERIALIZED (
  SELECT e1 AS node, e2 AS peer FROM {prev}
  UNION ALL SELECT e2, e1 FROM {prev}
),
s{i} AS MATERIALIZED (
  SELECT a.peer AS e1, b.peer AS e2, count(*) AS sup
  FROM b{i} a JOIN b{i} b ON a.node = b.node AND a.peer < b.peer
  GROUP BY a.peer, b.peer
),
t{i} AS MATERIALIZED (
  SELECT t.e1, t.e2 FROM {prev} t
  JOIN s{i} s ON s.e1 = t.e1 AND s.e2 = t.e2
  WHERE s.sup >= {min_sup}
)""")
        prev = f"t{i}"
    chain = ",\n".join(rounds)
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
t0 AS MATERIALIZED (
  SELECT DISTINCT least(subj_id, obj_id) AS e1,
                  greatest(subj_id, obj_id) AS e2
  FROM triples WHERE subj_id <> obj_id
),
{chain}
SELECT e1, e2 FROM {prev}
"""


def kg_sssp_oracle(sf_dir: str, rounds: int = 16) -> str:
    """Unrolled Bellman-Ford min-folds for stages/graph.sssp_weighted over
    the KG adjacency: pair weight = min over (pred, direction) parallel
    rows of the (subj, pred, obj) support count; source = smallest node.
    The fold is monotone, so rounds beyond the weighted diameter are
    no-ops (kg_bfs_oracle's argument, with dist + w replacing dist + 1)."""
    parts = [f"""
adjw AS MATERIALIZED (
  SELECT subj_id, obj_id, CAST(count(*) AS BIGINT) AS w
  FROM triples WHERE subj_id <> obj_id
  GROUP BY subj_id, pred, obj_id
),
pairw AS MATERIALIZED (
  SELECT least(subj_id, obj_id) AS a, greatest(subj_id, obj_id) AS b,
         min(w) AS w
  FROM adjw GROUP BY least(subj_id, obj_id), greatest(subj_id, obj_id)
),
e0 AS MATERIALIZED (
  SELECT a AS u, b AS v, w FROM pairw
  UNION ALL SELECT b, a, w FROM pairw
),
d0 AS (SELECT min(u) AS node, CAST(0 AS BIGINT) AS dist FROM e0)"""]
    for i in range(rounds):
        parts.append(f"""
d{i + 1} AS MATERIALIZED (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d{i}
    UNION ALL
    SELECT e.v AS node, d.dist + e.w AS dist
    FROM d{i} d JOIN e0 e ON e.u = d.node)
  GROUP BY node)""")
    return (f"WITH {dict_values_cte()},\n{transcripts_cte(sf_dir)},\n"
            + _triples_cte(sf_dir) + "," + ",".join(parts)
            + f"""
SELECT node, CAST(dist AS BIGINT) AS dist FROM d{rounds}
""")


def flag_quantiles_cont_oracle(qs=(0.25, 0.5, 0.75, 0.9)) -> str:
    """Per-returnflag interpolated quantiles of l_quantity for
    stages/quantiles.grouped_quantiles_cont — per-group cumulative
    histogram + the engine's exact micro-index op chain."""
    q_rows = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q, "
        f"CAST(floor({q} * 1e6 + 0.5) AS BIGINT) AS qm" for q in qs)
    return f"""
WITH base AS (
  SELECT l_returnflag AS grp,
         CAST(floor(l_quantity * 1e6 + 0.5) AS BIGINT) AS vm
  FROM lineitem
),
h AS (SELECT grp, vm, count(*) AS n FROM base GROUP BY grp, vm),
c AS (SELECT grp, vm, sum(n) OVER (PARTITION BY grp ORDER BY vm) AS cum
      FROM h),
params AS (SELECT grp, CAST(sum(n) AS BIGINT) AS n FROM h GROUP BY grp),
qs AS ({q_rows}),
pos AS (
  SELECT p.grp, q.q, q.qm * (p.n - 1) AS hm FROM params p, qs q
),
pick AS (
  SELECT grp, q, hm // 1000000 AS lo, hm % 1000000 AS frac FROM pos
),
el AS (
  SELECT p.grp, p.q, p.frac,
         (SELECT min(vm) FROM c WHERE c.grp = p.grp AND cum > p.lo) AS vlo,
         (SELECT min(vm) FROM c WHERE c.grp = p.grp
          AND cum > p.lo + CASE WHEN p.frac > 0 THEN 1 ELSE 0 END) AS vhi
  FROM pick p
)
SELECT grp AS l_returnflag, q,
       floor(((vlo + (frac * (vhi - vlo)) / 1e6) / 1e6) * 1e6 + 0.5) / 1e6
         AS value
FROM el
"""


def kg_scc_oracle(sf_dir: str) -> str:
    """Strongly connected components by definition, for
    stages/graph.scc_components: recursive directed transitive closure,
    mutual-reach pairs, component = min(mutual partners ∪ self) — the
    same id (min SCC member) the FW-BW coloring assigns."""
    return f"""
WITH RECURSIVE {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
dedges AS (
  SELECT DISTINCT subj_id AS s, obj_id AS d FROM triples
  WHERE subj_id <> obj_id
),
nodes AS (SELECT s AS node FROM dedges UNION SELECT d FROM dedges),
reach(u, v) AS (
  SELECT s, d FROM dedges
  UNION
  SELECT r.u, e.d FROM reach r JOIN dedges e ON r.v = e.s
),
mutual AS (
  SELECT r1.u AS a, r1.v AS b
  FROM reach r1 JOIN reach r2 ON r1.u = r2.v AND r1.v = r2.u
)
SELECT nd.node,
       CAST(least(nd.node, COALESCE(min(m.a), nd.node)) AS BIGINT)
         AS component
FROM nodes nd LEFT JOIN mutual m ON m.b = nd.node
GROUP BY nd.node
"""


def order_priority_counts_oracle() -> str:
    """TPC-H Q4 mirror of pipelines/relational.order_priority_counts: the
    EXISTS correlated subquery the engine rewrites as max(shipdate) > odate."""
    return """
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate))
GROUP BY o.o_orderpriority
"""


def promo_revenue_oracle(month_start: str = "1997-09-01",
                         month_end: str = "1997-10-01") -> str:
    """TPC-H Q14 mirror of pipelines/relational.promo_revenue: both sums as
    exact int64 micros, one final 100·promo/total double division (the same
    op chain as the engine)."""
    return f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
             THEN CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 1e6
                             + 0.5) AS BIGINT) ELSE 0 END) AS DOUBLE)
       / CAST(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 1e6
                             + 0.5) AS BIGINT)) AS DOUBLE) AS promo_revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE epoch_us(l.l_shipdate) >= epoch_us(TIMESTAMP '{month_start}')
  AND epoch_us(l.l_shipdate) <  epoch_us(TIMESTAMP '{month_end}')
"""


def large_volume_customers_oracle(min_qty: float = 300.0,
                                  k: int = 100) -> str:
    """TPC-H Q18 mirror of pipelines/relational.large_volume_customers:
    HAVING on the exact micros quantity sum, deterministic
    (-totalprice_micros, orderkey) top-k."""
    thresh = int(round(min_qty * 1e6))
    return f"""
WITH heavy AS (
  SELECT l_orderkey,
         SUM(CAST(floor(l_quantity * 1e6 + 0.5) AS BIGINT)) AS qty_micros
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(floor(l_quantity * 1e6 + 0.5) AS BIGINT)) > {thresh}
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_orderdate_us,
       CAST(floor(o.o_totalprice * 1e6 + 0.5) AS BIGINT) / 1e6
         AS o_totalprice,
       h.qty_micros / 1e6 AS sum_qty
FROM heavy h
JOIN orders o   ON o.o_orderkey = h.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY CAST(floor(o.o_totalprice * 1e6 + 0.5) AS BIGINT) DESC,
         o.o_orderkey
LIMIT {k}
"""


def cume_dist_events_oracle() -> str:
    """cume_dist mirror of stages/windows.cume_dist_events — tie classes on
    exact value micros, the engine's floor-based 6-dp round."""
    return """
WITH v AS (
  SELECT event_id, event_type,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
  FROM events
)
SELECT event_id, event_type,
       floor(cume_dist() OVER (PARTITION BY event_type ORDER BY vm)
             * 1e6 + 0.5) / 1e6 AS cume_dist
FROM v
"""


def mode_per_user_oracle() -> str:
    """Grouped-mode mirror of stages/windows.mode_per_user: highest count
    wins, ties to the lexicographically smallest type."""
    return """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id, event_type
),
r AS (
  SELECT user_id, event_type, cnt,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY cnt DESC, event_type) AS rn
  FROM c
)
SELECT user_id, event_type AS mode_type, cnt AS mode_count
FROM r WHERE rn = 1
"""


def part_unpivot_oracle() -> str:
    """UNION-ALL melt mirror of pipelines/relational.part_unpivot."""
    return """
SELECT p_partkey, 'p_retailprice' AS measure,
       CAST(floor(p_retailprice * 1e6 + 0.5) AS BIGINT) / 1e6 AS value
FROM part
UNION ALL
SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value
FROM part
"""


def closeness_centrality_oracle(sf_dir: str, k_seeds: int = 4,
                                rounds: int = 8) -> str:
    """Unrolled labeled min-fold BFS for stages/graph.closeness_centrality:
    seeds are the k smallest node ids of the bidirected simple KG graph;
    rounds beyond the diameter are no-ops (monotone fold, same argument as
    kg_bfs_oracle).  Finish mirrors the engine's (n_reach−1)/Σdist double
    division."""
    parts = [f"""
e0 AS MATERIALIZED (
  SELECT subj_id AS u, obj_id AS v FROM triples WHERE subj_id <> obj_id
  UNION ALL
  SELECT obj_id, subj_id FROM triples WHERE subj_id <> obj_id),
seeds AS MATERIALIZED (
  SELECT DISTINCT u AS s FROM e0 ORDER BY u LIMIT {k_seeds}),
d0(seed, node, dist) AS (SELECT s, s, 0 FROM seeds)"""]
    for i in range(rounds):
        parts.append(f"""
d{i + 1} AS MATERIALIZED (
  SELECT seed, node, min(dist) AS dist FROM (
    SELECT seed, node, dist FROM d{i}
    UNION ALL
    SELECT d.seed, e.v AS node, d.dist + 1 AS dist
    FROM d{i} d JOIN e0 e ON e.u = d.node)
  GROUP BY seed, node)""")
    return (f"WITH {dict_values_cte()},\n{transcripts_cte(sf_dir)},\n"
            + _triples_cte(sf_dir) + "," + ",".join(parts)
            + f"""
SELECT seed, CAST(count(*) AS BIGINT) AS n_reach,
       CAST(sum(dist) AS BIGINT) AS total_dist,
       CASE WHEN sum(dist) > 0
            THEN CAST(count(*) - 1 AS DOUBLE) / CAST(sum(dist) AS DOUBLE)
            ELSE 0.0 END AS closeness
FROM d{rounds}
GROUP BY seed
""")


def harmonic_centrality_oracle(sf_dir: str, k_seeds: int = 4,
                               rounds: int = 8) -> str:
    """Unrolled labeled min-fold BFS for stages/graph.harmonic_centrality
    — the kg_closeness chain with the integer-harmonic finisher
    Σ 1000000 // dist over dist > 0 (DuckDB // on positives = the
    engine's floor)."""
    parts = [f"""
e0 AS MATERIALIZED (
  SELECT subj_id AS u, obj_id AS v FROM triples WHERE subj_id <> obj_id
  UNION ALL
  SELECT obj_id, subj_id FROM triples WHERE subj_id <> obj_id),
seeds AS MATERIALIZED (
  SELECT DISTINCT u AS s FROM e0 ORDER BY u LIMIT {k_seeds}),
d0(seed, node, dist) AS (SELECT s, s, 0 FROM seeds)"""]
    for i in range(rounds):
        parts.append(f"""
d{i + 1} AS MATERIALIZED (
  SELECT seed, node, min(dist) AS dist FROM (
    SELECT seed, node, dist FROM d{i}
    UNION ALL
    SELECT d.seed, e.v AS node, d.dist + 1 AS dist
    FROM d{i} d JOIN e0 e ON e.u = d.node)
  GROUP BY seed, node)""")
    return (f"WITH {dict_values_cte()},\n{transcripts_cte(sf_dir)},\n"
            + _triples_cte(sf_dir) + "," + ",".join(parts)
            + f"""
SELECT seed, CAST(count(*) AS BIGINT) AS n_reach,
       CAST(SUM(CASE WHEN dist > 0 THEN 1000000 // dist ELSE 0 END)
            AS BIGINT) AS harmonic_micros,
       CAST(SUM(CASE WHEN dist > 0 THEN 1000000 // dist ELSE 0 END)
            AS BIGINT) / 1e6 AS harmonic
FROM d{rounds}
GROUP BY seed
""")


def stress_centrality_oracle(sf_dir: str, rounds: int = 8) -> str:
    """Unrolled all-sources BFS with shortest-path counts for
    stages/graph.stress_centrality: the kg_closeness min-fold chain gives
    final distances; σ then fills level by level (σ(s,v) = Σ σ(s,u) over
    edges u→v with dist(s,v) = dist(s,u)+1 — levels partition, so the
    per-level UNION ALL is exact); stress(v) sums σ_sv·σ_tv over pairs
    s<t with d(s,v)+d(v,t) = d(s,t).  All integer, no float accumulation.
    Edges are DISTINCT (σ counts paths in the simple graph)."""
    parts = [f"""
e0 AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT subj_id AS u, obj_id AS v FROM triples WHERE subj_id <> obj_id
    UNION ALL
    SELECT obj_id, subj_id FROM triples WHERE subj_id <> obj_id)),
gnodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM e0),
d0(seed, node, dist) AS (SELECT node, node, 0 FROM gnodes)"""]
    for i in range(rounds):
        parts.append(f"""
d{i + 1} AS MATERIALIZED (
  SELECT seed, node, min(dist) AS dist FROM (
    SELECT seed, node, dist FROM d{i}
    UNION ALL
    SELECT d.seed, e.v AS node, d.dist + 1 AS dist
    FROM d{i} d JOIN e0 e ON e.u = d.node)
  GROUP BY seed, node)""")
    parts.append(f"""
dd AS MATERIALIZED (SELECT seed, node, dist FROM d{rounds}),
s0 AS (SELECT node AS seed, node, CAST(1 AS BIGINT) AS sig FROM gnodes)""")
    for k in range(1, rounds + 1):
        parts.append(f"""
s{k} AS MATERIALIZED (
  SELECT p.seed, e.v AS node, CAST(sum(p.sig) AS BIGINT) AS sig
  FROM s{k - 1} p JOIN e0 e ON e.u = p.node
  JOIN dd ON dd.seed = p.seed AND dd.node = e.v AND dd.dist = {k}
  GROUP BY p.seed, e.v)""")
    sig_union = " UNION ALL ".join(f"SELECT * FROM s{k}"
                                   for k in range(rounds + 1))
    parts.append(f"""
sig AS MATERIALIZED ({sig_union}),
ap AS MATERIALIZED (
  SELECT dd.seed, dd.node, dd.dist, sig.sig
  FROM dd JOIN sig ON sig.seed = dd.seed AND sig.node = dd.node),
spairs AS (
  SELECT a.node AS node, CAST(sum(a.sig * b.sig) AS BIGINT) AS stress
  FROM ap a JOIN ap b ON b.node = a.node AND b.seed > a.seed
  JOIN ap c ON c.seed = a.seed AND c.node = b.seed
           AND c.dist = a.dist + b.dist
  WHERE a.seed <> a.node AND b.seed <> b.node
  GROUP BY a.node)""")
    return (f"WITH {dict_values_cte()},\n{transcripts_cte(sf_dir)},\n"
            + _triples_cte(sf_dir) + "," + ",".join(parts)
            + """
SELECT g.node, CAST(COALESCE(p.stress, 0) AS BIGINT) AS stress
FROM gnodes g LEFT JOIN spairs p ON p.node = g.node
""")


def walk_counts_oracle(sf_dir: str, max_len: int = 4) -> str:
    """Mirror of stages/graph.walk_counts_from: k chained joins over the
    DISTINCT directed edge set from the smallest source node."""
    parts = ["""
dedges AS MATERIALIZED (
  SELECT DISTINCT subj_id AS s, obj_id AS d FROM triples
  WHERE subj_id <> obj_id),
w0 AS (SELECT (SELECT min(s) FROM dedges) AS node,
              CAST(1 AS BIGINT) AS n)"""]
    for k in range(1, max_len + 1):
        parts.append(f"""
w{k} AS MATERIALIZED (
  SELECT e.d AS node, CAST(sum(p.n) AS BIGINT) AS n
  FROM w{k - 1} p JOIN dedges e ON e.s = p.node
  GROUP BY e.d)""")
    union = " UNION ALL ".join(
        f"SELECT {k} AS k, node, n AS n_walks FROM w{k}"
        for k in range(1, max_len + 1))
    return (f"WITH {dict_values_cte()},\n{transcripts_cte(sf_dir)},\n"
            + _triples_cte(sf_dir) + "," + ",".join(parts)
            + f"\nSELECT CAST(k AS BIGINT) AS k, node, n_walks "
              f"FROM ({union})\n")


def rich_club_oracle(sf_dir: str) -> str:
    """Mirror of stages/graph.rich_club: per-k node/edge threshold counts
    over the undirected simple KG graph, φ = round6(2E/(N(N−1)))."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
eu AS MATERIALIZED (
  SELECT DISTINCT least(subj_id, obj_id) AS u,
                  greatest(subj_id, obj_id) AS v
  FROM triples WHERE subj_id <> obj_id),
deg AS MATERIALIZED (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM eu UNION ALL SELECT v FROM eu)
  GROUP BY node),
ks AS (SELECT unnest(generate_series(1,
          (SELECT CAST(max(d) AS INTEGER) FROM deg))) AS k),
nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_nodes
       FROM ks JOIN deg ON deg.d > ks.k GROUP BY k),
ek AS (SELECT k, CAST(count(*) AS BIGINT) AS n_edges
       FROM ks JOIN eu ON true
       JOIN deg a ON a.node = eu.u JOIN deg b ON b.node = eu.v
       WHERE least(a.d, b.d) > ks.k GROUP BY k)
SELECT nk.k AS k, nk.n_nodes,
       CAST(COALESCE(ek.n_edges, 0) AS BIGINT) AS n_edges,
       floor(2.0 * COALESCE(ek.n_edges, 0)
             / (CAST(nk.n_nodes AS DOUBLE) * (nk.n_nodes - 1))
             * 1000000 + 0.5) / 1000000 AS phi
FROM nk LEFT JOIN ek ON ek.k = nk.k
WHERE nk.n_nodes >= 2
"""


def node_bfs_profiles_oracle(sf_dir: str, rounds: int = 8) -> str:
    """Mirror of stages/graph.node_bfs_profiles: all-sources min-fold BFS
    (the kg_closeness chain over DISTINCT edges), then per-seed reach /
    max dist / Σ 1000000 // dist — integer division on both sides."""
    parts = [f"""
e0 AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT subj_id AS u, obj_id AS v FROM triples WHERE subj_id <> obj_id
    UNION ALL
    SELECT obj_id, subj_id FROM triples WHERE subj_id <> obj_id)),
gnodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM e0),
d0(seed, node, dist) AS (SELECT node, node, 0 FROM gnodes)"""]
    for i in range(rounds):
        parts.append(f"""
d{i + 1} AS MATERIALIZED (
  SELECT seed, node, min(dist) AS dist FROM (
    SELECT seed, node, dist FROM d{i}
    UNION ALL
    SELECT d.seed, e.v AS node, d.dist + 1 AS dist
    FROM d{i} d JOIN e0 e ON e.u = d.node)
  GROUP BY seed, node)""")
    return (f"WITH {dict_values_cte()},\n{transcripts_cte(sf_dir)},\n"
            + _triples_cte(sf_dir) + "," + ",".join(parts)
            + f"""
SELECT seed AS node, CAST(count(*) AS BIGINT) AS n_reach,
       CAST(max(dist) AS BIGINT) AS ecc,
       CAST(COALESCE(sum(1000000 // dist) FILTER (WHERE dist > 0), 0)
            AS BIGINT) AS harmonic_micros
FROM d{rounds}
GROUP BY seed
""")


def llr_collocations_oracle() -> str:
    """Dunning G² mirror of stages/phrasemine.llr_collocations: margins and
    N re-derived from the bigram count table, the four k·ln(kN/(row·col))
    terms summed in the engine's fixed order, 6-dp floor round."""
    t11 = ("CASE WHEN k11 > 0 THEN k11 * ln((k11 * n) / (r * c)) "
           "ELSE 0 END")
    t12 = ("CASE WHEN k12 > 0 THEN k12 * ln((k12 * n) / (r * (n - c))) "
           "ELSE 0 END")
    t21 = ("CASE WHEN k21 > 0 THEN k21 * ln((k21 * n) / ((n - r) * c)) "
           "ELSE 0 END")
    t22 = ("CASE WHEN k22 > 0 THEN k22 * ln((k22 * n) / ((n - r) * (n - c))) "
           "ELSE 0 END")
    return f"""
WITH toks AS (
  SELECT CASE WHEN trim(text)='' THEN []
              ELSE string_split_regex(lower(trim(text)), '\\s+') END AS ws
  FROM documents
), big AS (
  SELECT ws[i] AS w1, ws[i+1] AS w2
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) g
), bc AS (
  SELECT w1, w2, count(*) AS cnt FROM big GROUP BY w1, w2
), rm AS (
  SELECT w1, CAST(sum(cnt) AS DOUBLE) AS r FROM bc GROUP BY w1
), cm AS (
  SELECT w2, CAST(sum(cnt) AS DOUBLE) AS c FROM bc GROUP BY w2
), tot AS (
  SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM bc
), cells AS (
  SELECT bc.w1, bc.w2, bc.cnt, rm.r, cm.c, t.n,
         CAST(bc.cnt AS DOUBLE)              AS k11,
         rm.r - CAST(bc.cnt AS DOUBLE)       AS k12,
         cm.c - CAST(bc.cnt AS DOUBLE)       AS k21,
         t.n - rm.r - cm.c + CAST(bc.cnt AS DOUBLE) AS k22
  FROM bc JOIN rm ON rm.w1 = bc.w1
          JOIN cm ON cm.w2 = bc.w2, tot t
)
SELECT w1, w2, CAST(cnt AS BIGINT) AS cnt,
       floor(2.0 * ({t11} + {t12} + {t21} + {t22}) * 1e6 + 0.5) / 1e6 AS llr
FROM cells
"""


def diameter_2sweep_oracle(sf_dir: str, rounds: int = 10) -> str:
    """2-sweep mirror of stages/graph.diameter_2sweep: two unrolled
    min-fold BFS chains (monotone, surplus rounds no-ops), far node =
    (max dist, smallest id) after sweep 1."""
    parts = [f"""
e0 AS MATERIALIZED (
  SELECT subj_id AS u, obj_id AS v FROM triples WHERE subj_id <> obj_id
  UNION ALL
  SELECT obj_id, subj_id FROM triples WHERE subj_id <> obj_id),
mn AS (SELECT min(u) AS s FROM e0),
a0 AS (SELECT s AS node, 0 AS dist FROM mn)"""]
    for i in range(rounds):
        parts.append(f"""
a{i + 1} AS MATERIALIZED (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM a{i}
    UNION ALL
    SELECT e.v AS node, d.dist + 1 AS dist
    FROM a{i} d JOIN e0 e ON e.u = d.node)
  GROUP BY node)""")
    parts.append(f"""
far AS (SELECT node FROM a{rounds}
        WHERE dist = (SELECT max(dist) FROM a{rounds})
        ORDER BY node LIMIT 1),
b0 AS (SELECT node, 0 AS dist FROM far)""")
    for i in range(rounds):
        parts.append(f"""
b{i + 1} AS MATERIALIZED (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM b{i}
    UNION ALL
    SELECT e.v AS node, d.dist + 1 AS dist
    FROM b{i} d JOIN e0 e ON e.u = d.node)
  GROUP BY node)""")
    return (f"WITH {dict_values_cte()},\n{transcripts_cte(sf_dir)},\n"
            + _triples_cte(sf_dir) + "," + ",".join(parts)
            + f"""
SELECT CAST((SELECT s FROM mn) AS BIGINT) AS src,
       CAST((SELECT node FROM far) AS BIGINT) AS far_node,
       CAST(max(dist) AS BIGINT) AS diameter_lb
FROM b{rounds}
""")


def events_props_extract_oracle() -> str:
    """JSON-path mirror of the engine's vectorized regex extraction of the
    props column's integer k (per-type min/max/sum/count)."""
    return """
WITH x AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
  WHERE json_extract(props, '$.k') IS NOT NULL
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM x GROUP BY event_type
"""


def grouped_iqr_outliers_oracle() -> str:
    """Tukey-fence mirror of stages/quantiles.grouped_iqr_outliers: the
    grouped interpolated quartiles in the engine's exact scaled-integer
    space, the 1.5 factor cleared to the 2·vm·1e6 vs 2·q1−3·IQR integer
    comparison — boundary rows cannot flip."""
    return """
WITH base AS (
  SELECT event_id, event_type AS grp,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
  FROM events
),
h AS (SELECT grp, vm, count(*) AS n FROM base GROUP BY grp, vm),
c AS (SELECT grp, vm, sum(n) OVER (PARTITION BY grp ORDER BY vm) AS cum
      FROM h),
params AS (SELECT grp, CAST(sum(n) AS BIGINT) AS n FROM h GROUP BY grp),
qq(q, qm) AS (VALUES (0.25, 250000), (0.75, 750000)),
pos AS (SELECT p.grp, q.q, q.qm * (p.n - 1) AS hm FROM params p, qq q),
pick AS (SELECT grp, q, hm // 1000000 AS lo, hm % 1000000 AS frac FROM pos),
el AS (
  SELECT p.grp, p.q, p.frac,
         (SELECT min(vm) FROM c WHERE c.grp = p.grp AND cum > p.lo) AS vlo,
         (SELECT min(vm) FROM c WHERE c.grp = p.grp
          AND cum > p.lo + CASE WHEN p.frac > 0 THEN 1 ELSE 0 END) AS vhi
  FROM pick p
),
qscaled AS (
  SELECT grp, q, vlo * 1000000 + frac * (vhi - vlo) AS qs FROM el
),
fences AS (
  SELECT a.grp,
         2 * a.qs - 3 * (b.qs - a.qs) AS lo2,
         2 * b.qs + 3 * (b.qs - a.qs) AS hi2
  FROM qscaled a JOIN qscaled b ON a.grp = b.grp
  WHERE a.q = 0.25 AND b.q = 0.75
)
SELECT base.event_id, base.grp AS event_type, base.vm / 1e6 AS value
FROM base JOIN fences f ON f.grp = base.grp
WHERE 2 * base.vm * 1000000 < f.lo2 OR 2 * base.vm * 1000000 > f.hi2
"""


def chi_square_independence_oracle() -> str:
    """χ² mirror of stages/windows.chi_square_independence: full
    dow × type grid via margin cross join with COALESCE(0) observed,
    the engine's (r·c)/N expected-count op chain, 6-dp floor round."""
    return """
WITH base AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7 AS dow, event_type
  FROM events
),
cnt AS (SELECT dow, event_type, CAST(count(*) AS BIGINT) AS n
        FROM base GROUP BY dow, event_type),
rows_ AS (SELECT dow, CAST(sum(n) AS DOUBLE) AS r FROM cnt GROUP BY dow),
cols_ AS (SELECT event_type, CAST(sum(n) AS DOUBLE) AS c
          FROM cnt GROUP BY event_type),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn,
               CAST(sum(n) AS BIGINT) AS n_int FROM cnt),
grid AS (
  SELECT r.dow, c.event_type, r.r, c.c,
         CAST(COALESCE(cnt.n, 0) AS DOUBLE) AS o
  FROM rows_ r CROSS JOIN cols_ c
  LEFT JOIN cnt ON cnt.dow = r.dow AND cnt.event_type = c.event_type
)
SELECT floor(sum((g.o - (g.r * g.c) / t.nn) * (g.o - (g.r * g.c) / t.nn)
                 / ((g.r * g.c) / t.nn)) * 1e6 + 0.5) / 1e6 AS chi2,
       CAST(((SELECT count(*) FROM rows_) - 1)
            * ((SELECT count(*) FROM cols_) - 1) AS BIGINT) AS dof,
       CAST(max(t.n_int) AS BIGINT) AS n
FROM grid g, tot t
"""


def customer_order_distribution_oracle() -> str:
    """TPC-H Q13 mirror of relational.customer_order_distribution: LEFT JOIN
    preserves zero-order customers, identical to the engine's left_outer
    join + fill_null(0)."""
    return """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c.c_custkey,
             CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey) per_cust
GROUP BY c_count
"""


def dormant_rich_customers_oracle(cutoff: str = "2000-01-01") -> str:
    """TPC-H Q22 mirror of relational.dormant_rich_customers: the avg
    comparison cleared of division (micros·n > sum_micros) exactly as the
    engine does, NOT EXISTS = the engine's left_anti join."""
    return f"""
WITH cm AS (SELECT c_custkey, c_nationkey,
                   CAST(floor(c_acctbal * 1e6 + 0.5) AS BIGINT) AS bal_micros,
                   c_acctbal
            FROM customer),
     avgpos AS (SELECT CAST(coalesce(SUM(bal_micros), 0) AS BIGINT) AS s,
                       CAST(count(*) AS BIGINT) AS n
                FROM cm WHERE c_acctbal > 0.0)
SELECT CAST(cm.c_nationkey AS BIGINT) AS nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(SUM(cm.bal_micros) AS BIGINT) AS totacctbal_micros,
       CAST(CAST(SUM(cm.bal_micros) AS BIGINT) AS DOUBLE) / 1e6
           AS totacctbal
FROM cm, avgpos
WHERE cm.bal_micros * avgpos.n > avgpos.s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = cm.c_custkey
                    AND epoch_us(o.o_orderdate)
                        >= epoch_us(TIMESTAMP '{cutoff}'))
GROUP BY cm.c_nationkey
"""


def small_lot_revenue_oracle(brand: str = "Brand#23") -> str:
    """TPC-H Q17 mirror of relational.small_lot_revenue: the 0.2·avg
    threshold cleared of division (qm·5·n < sum_qm), revenue in exact
    micros, the same /7.0/1e6 finish chain."""
    return f"""
WITH li AS (SELECT l.l_partkey,
                   CAST(floor(l.l_quantity * 1e6 + 0.5) AS BIGINT) AS qm,
                   CAST(floor(l.l_extendedprice * 1e6 + 0.5) AS BIGINT) AS em
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
                       AND p.p_brand = '{brand}'),
     st AS (SELECT l_partkey, CAST(SUM(qm) AS BIGINT) AS sq,
                   CAST(count(*) AS BIGINT) AS n
            FROM li GROUP BY l_partkey)
SELECT CAST(coalesce(SUM(li.em), 0) AS BIGINT) AS total_micros,
       CAST(CAST(coalesce(SUM(li.em), 0) AS BIGINT) AS DOUBLE) / 7.0 / 1e6
           AS avg_yearly
FROM li JOIN st ON st.l_partkey = li.l_partkey
WHERE li.qm * 5 * st.n < st.sq
"""


def supplier_share_nations_oracle(pct_twentieths: int = 1) -> str:
    """TPC-H Q11 mirror of relational.supplier_share_nations: HAVING cleared
    of division (nation_sum·20 > global_sum·k), inner join to nation."""
    return f"""
WITH sm AS (SELECT s_nationkey,
                   CAST(floor(s_acctbal * 1e6 + 0.5) AS BIGINT) AS bal_micros
            FROM supplier),
     tot AS (SELECT CAST(coalesce(SUM(bal_micros), 0) AS BIGINT) AS t
             FROM sm)
SELECT CAST(sm.s_nationkey AS BIGINT) AS nationkey,
       n.n_name,
       CAST(SUM(sm.bal_micros) AS BIGINT) AS value_micros
FROM sm JOIN nation n ON n.n_nationkey = sm.s_nationkey, tot
GROUP BY sm.s_nationkey, n.n_name, tot.t
HAVING CAST(SUM(sm.bal_micros) AS BIGINT) * 20 > tot.t * {pct_twentieths}
"""


def grouped_mad_oracle() -> str:
    """Mirror of quantiles.grouped_mad: doubled-space medians (med2 =
    vm[(n−1)//2] + vm[n//2]) computed via row_number, deviations kept
    integral, the same /2e6 and /4e6 finish casts."""
    return """
WITH vm AS (SELECT event_type AS g,
                   CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
            FROM events),
     cnt AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM vm GROUP BY g),
     ordv AS (SELECT g, vm,
                     row_number() OVER (PARTITION BY g ORDER BY vm) - 1 AS i
              FROM vm),
     med AS (SELECT o.g,
                    CAST(SUM(CASE WHEN o.i = (c.n - 1) // 2
                             THEN o.vm ELSE 0 END)
                       + SUM(CASE WHEN o.i = c.n // 2
                             THEN o.vm ELSE 0 END) AS BIGINT) AS med2
             FROM ordv o JOIN cnt c ON c.g = o.g GROUP BY o.g),
     dev AS (SELECT v.g, ABS(2 * v.vm - m.med2) AS d2
             FROM vm v JOIN med m ON m.g = v.g),
     ordd AS (SELECT g, d2,
                     row_number() OVER (PARTITION BY g ORDER BY d2) - 1 AS i
              FROM dev),
     mad AS (SELECT o.g,
                    CAST(SUM(CASE WHEN o.i = (c.n - 1) // 2
                             THEN o.d2 ELSE 0 END)
                       + SUM(CASE WHEN o.i = c.n // 2
                             THEN o.d2 ELSE 0 END) AS BIGINT) AS mad4
             FROM ordd o JOIN cnt c ON c.g = o.g GROUP BY o.g)
SELECT m.g AS event_type, m.med2, d.mad4,
       CAST(m.med2 AS DOUBLE) / 2e6 AS median,
       CAST(d.mad4 AS DOUBLE) / 4e6 AS mad
FROM med m JOIN mad d ON d.g = m.g
"""


def ks_two_sample_oracle(type_a: str = "click", type_b: str = "view") -> str:
    """Mirror of quantiles.ks_two_sample: division-cleared
    D·n_a·n_b = max |cum_a·n_b − cum_b·n_a| over the sorted value union."""
    return f"""
WITH vm AS (SELECT CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm,
                   CASE WHEN event_type = '{type_a}' THEN 1 ELSE 0 END AS ia,
                   CASE WHEN event_type = '{type_b}' THEN 1 ELSE 0 END AS ib
            FROM events
            WHERE event_type IN ('{type_a}', '{type_b}')),
     h AS (SELECT vm, CAST(SUM(ia) AS BIGINT) AS a,
                  CAST(SUM(ib) AS BIGINT) AS b
           FROM vm GROUP BY vm),
     t AS (SELECT CAST(SUM(a) AS BIGINT) AS na,
                  CAST(SUM(b) AS BIGINT) AS nb FROM h),
     c AS (SELECT SUM(a) OVER (ORDER BY vm
                               ROWS UNBOUNDED PRECEDING) AS cuma,
                  SUM(b) OVER (ORDER BY vm
                               ROWS UNBOUNDED PRECEDING) AS cumb
           FROM h)
SELECT t.na AS n_a, t.nb AS n_b,
       CAST(max(ABS(c.cuma * t.nb - c.cumb * t.na)) AS BIGINT) AS d_num,
       CAST(max(ABS(c.cuma * t.nb - c.cumb * t.na)) AS DOUBLE)
           / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)) AS d
FROM c, t GROUP BY t.na, t.nb
"""


def roc_auc_oracle(positive: str = "purchase") -> str:
    """Mirror of quantiles.roc_auc: exact doubled-space tie handling,
    num2 = Σ pos(v)·(2·neg_below + neg_at), auc = num2/(2·P·N)."""
    return f"""
WITH vm AS (SELECT CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm,
                   CASE WHEN event_type = '{positive}'
                        THEN 1 ELSE 0 END AS p
            FROM events),
     h AS (SELECT vm, CAST(SUM(p) AS BIGINT) AS p,
                  CAST(count(*) - SUM(p) AS BIGINT) AS q
           FROM vm GROUP BY vm),
     t AS (SELECT CAST(SUM(p) AS BIGINT) AS np,
                  CAST(SUM(q) AS BIGINT) AS nq FROM h),
     c AS (SELECT p, q,
                  CAST(coalesce(SUM(q) OVER (ORDER BY vm
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS qb
           FROM h)
SELECT t.np AS n_pos, t.nq AS n_neg,
       CAST(SUM(c.p * (2 * c.qb + c.q)) AS BIGINT) AS auc_num2,
       CAST(SUM(c.p * (2 * c.qb + c.q)) AS DOUBLE)
           / (2.0 * CAST(t.np AS DOUBLE) * CAST(t.nq AS DOUBLE)) AS auc
FROM c, t GROUP BY t.np, t.nq
"""


def pr_auc_oracle(positive: str = "purchase") -> str:
    """Mirror of quantiles.pr_auc: integer per-threshold terms
    (p·cp·10⁶)//(cp+cq) in HUGEINT over distinct micros values
    descending, one float op chain for the final scalar."""
    return f"""
WITH vm AS (SELECT CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm,
                   CASE WHEN event_type = '{positive}'
                        THEN 1 ELSE 0 END AS p
            FROM events),
     h AS (SELECT vm, CAST(SUM(p) AS BIGINT) AS p,
                  CAST(count(*) - SUM(p) AS BIGINT) AS q
           FROM vm GROUP BY vm),
     t AS (SELECT CAST(SUM(p) AS BIGINT) AS np,
                  CAST(SUM(q) AS BIGINT) AS nq FROM h),
     c AS (SELECT p, q,
                  CAST(SUM(p) OVER (ORDER BY vm DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cp,
                  CAST(SUM(q) OVER (ORDER BY vm DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cq
           FROM h),
     s AS (SELECT CAST(SUM(CASE WHEN p > 0 THEN
                  (CAST(p AS HUGEINT) * cp * 1000000) // (cp + cq)
                  ELSE 0 END) AS BIGINT) AS num
           FROM c)
SELECT t.np AS n_pos, t.nq AS n_neg, s.num AS ap_num_micros,
       CASE WHEN t.np = 0 THEN 0.0 ELSE
         floor(CAST(s.num AS DOUBLE) / CAST(t.np AS DOUBLE) / 1e6
               * 1e6 + 0.5) / 1e6 END AS average_precision
FROM s, t
"""


def max_drawdown_oracle() -> str:
    """Mirror of windows.max_drawdown: SUM-OVER running total, MAX-OVER
    running peak, grouped MAX of the gap — all in exact micros."""
    return """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tu,
                  CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
           FROM events),
     r AS (SELECT user_id, tu, event_id,
                  SUM(vm) OVER (PARTITION BY user_id ORDER BY tu, event_id
                                ROWS UNBOUNDED PRECEDING) AS run
           FROM e),
     m AS (SELECT user_id, run,
                  MAX(run) OVER (PARTITION BY user_id ORDER BY tu, event_id
                                 ROWS UNBOUNDED PRECEDING) AS runmax
           FROM r)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(MAX(runmax - run) AS BIGINT) AS max_drawdown_micros,
       CAST(MAX(runmax - run) AS DOUBLE) / 1e6 AS max_drawdown
FROM m GROUP BY user_id
"""


def kg_linkpred_scores_oracle(sf_dir: str, min_cn: int = 2,
                              max_degree: int | None = None) -> str:
    """Mirror of stages/graph.link_prediction_scores: the kg_linkpred
    wedge/anti-join derivation extended with Adamic–Adar center weights
    floor(1e6/ln(deg)+0.5) (ln verified bit-equal numpy/libm/DuckDB over
    deg ∈ [2, 10^6]) and the endpoint-degree Jaccard as ONE round6
    division."""
    cap = f"AND d.degree <= {max_degree}" if max_degree is not None else ""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
adj AS (
  SELECT DISTINCT least(subj_id, obj_id) AS lo, greatest(subj_id, obj_id) AS hi
  FROM triples WHERE subj_id <> obj_id
),
bidir AS (
  SELECT lo AS node, hi AS peer FROM adj
  UNION
  SELECT hi, lo FROM adj
),
deg AS (SELECT node, count(*) AS degree FROM bidir GROUP BY node),
w AS (
  SELECT b.node, b.peer,
         CAST(floor(1e6 / d.degree + 0.5) AS BIGINT) AS wra,
         CAST(floor(1e6 / ln(d.degree) + 0.5) AS BIGINT) AS waa
  FROM bidir b JOIN deg d USING (node)
  WHERE d.degree >= 2 {cap}
),
pairs AS (
  SELECT a.peer AS e1, b.peer AS e2, a.wra, a.waa
  FROM w a JOIN w b ON a.node = b.node AND a.peer < b.peer
),
cand AS (
  SELECT e1, e2, CAST(count(*) AS BIGINT) AS cn,
         CAST(sum(wra) AS BIGINT) AS ra_micros,
         CAST(sum(waa) AS BIGINT) AS aa_micros
  FROM pairs GROUP BY e1, e2
  HAVING count(*) >= {min_cn}
)
SELECT c.e1, c.e2, c.cn,
       c.ra_micros / 1e6 AS ra,
       c.aa_micros / 1e6 AS aa,
       floor(CAST(c.cn AS DOUBLE)
             / CAST(d1.degree + d2.degree - c.cn AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS jaccard
FROM cand c
JOIN deg d1 ON d1.node = c.e1
JOIN deg d2 ON d2.node = c.e2
WHERE NOT EXISTS (SELECT 1 FROM adj e WHERE e.lo = c.e1 AND e.hi = c.e2)
"""


def token_zipf_fit_oracle(k: int = 500) -> str:
    """Mirror of textstats.token_zipf_fit: deterministic (freq desc, token
    asc) ranks, ln-micros points, HUGEINT moments (the engine's Python
    big-ints), the same slope/intercept double op chain."""
    return f"""
WITH toks AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w1
  FROM documents WHERE trim(text) <> ''
), cnts AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY w1
), topk AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w1) AS rnk
  FROM cnts QUALIFY rnk <= {k}
), xy AS (
  SELECT CAST(floor(ln(rnk) * 1e6 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(cnt) * 1e6 + 0.5) AS BIGINT) AS y
  FROM topk
), m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx,
         CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(x * y) AS HUGEINT) AS sxy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx
  FROM xy
)
SELECT CAST(n AS BIGINT) AS n_tokens,
       CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
       (CAST(sy AS DOUBLE)
        - (CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
           / CAST(n AS DOUBLE) / 1e6 AS intercept
FROM m
"""


def token_burstiness_oracle(k: int = 50) -> str:
    """Mirror of textstats.token_burstiness: per-doc tf with zeros folded
    in analytically, VMR division-cleared to one double division."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w1
  FROM documents WHERE trim(text) <> ''
), tf AS (
  SELECT doc_id, w1, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, w1
), agg AS (
  SELECT w1 AS token, CAST(count(*) AS BIGINT) AS df,
         CAST(SUM(tf) AS BIGINT) AS total_tf,
         CAST(SUM(tf * tf) AS BIGINT) AS s2
  FROM tf GROUP BY w1
), nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
topk AS (
  SELECT * FROM agg ORDER BY total_tf DESC, token LIMIT {k}
)
SELECT t.token, t.df, t.total_tf,
       CAST(nd.n * t.s2 - t.total_tf * t.total_tf AS DOUBLE)
           / CAST(nd.n * t.total_tf AS DOUBLE) AS vmr
FROM topk t, nd
"""


def char_entropy_oracle() -> str:
    """Mirror of textstats.char_entropy: per-(doc, char) counts, ln-micros
    per class, integer sum / 1e6."""
    return """
WITH d AS (SELECT doc_id, lower(trim(text)) AS tl
           FROM documents WHERE trim(text) <> ''),
ch AS (SELECT doc_id, unnest(string_split_regex(tl, '')) AS c FROM d),
cc AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS cnt
       FROM ch GROUP BY doc_id, c),
n AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chars,
             CAST(count(*) AS BIGINT) AS n_distinct_chars
      FROM cc GROUP BY doc_id)
SELECT n.doc_id, n.n_chars, n.n_distinct_chars,
       CAST(sum(CAST(floor(-(cc.cnt / CAST(n.n_chars AS DOUBLE))
                           * ln(cc.cnt / CAST(n.n_chars AS DOUBLE))
                           * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6
         AS entropy
FROM cc JOIN n ON n.doc_id = cc.doc_id
GROUP BY n.doc_id, n.n_chars, n.n_distinct_chars
"""


def readability_scores_oracle() -> str:
    """Mirror of textstats.readability_scores: identical left-associated
    double chain 206.835 - 1.015*(W/S) - 84.6*(Syl/W), round6."""
    return """
WITH d AS (
  SELECT doc_id, lower(trim(text)) AS tl
  FROM documents WHERE trim(text) <> ''
),
m AS (
  SELECT doc_id,
         CAST(len(string_split_regex(tl, '\\s+')) AS BIGINT) AS n_words,
         CAST(GREATEST(1, length(tl) - length(replace(tl, '.', '')))
              AS BIGINT) AS n_sentences,
         CAST(len(regexp_extract_all(tl, '[aeiou]+')) AS BIGINT)
           AS n_syllables,
         CAST(len(list_distinct(string_split_regex(tl, '\\s+')))
              AS BIGINT) AS n_distinct
  FROM d
)
SELECT doc_id, n_words, n_sentences, n_syllables, n_distinct,
       floor((206.835
              - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
              - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words))
             * 1000000 + 0.5) / 1000000 AS flesch,
       floor(CAST(n_distinct AS DOUBLE) / n_words * 1000000 + 0.5)
         / 1000000 AS ttr
FROM m
"""


def source_vocab_overlap_oracle() -> str:
    """Mirror of textstats.source_vocab_overlap: distinct lowercase
    whitespace tokens per source, pairwise Jaccard (round6 double)."""
    return """
WITH toks0 AS (
  SELECT source, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents WHERE trim(text) <> ''
),
toks AS (SELECT DISTINCT source, w FROM toks0),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS c
          FROM toks GROUP BY source),
inter AS (
  SELECT a.source AS s1, b.source AS s2, CAST(count(*) AS BIGINT) AS i
  FROM toks a JOIN toks b ON a.w = b.w AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT p1.source AS s1, p2.source AS s2, p1.c AS n_a, p2.c AS n_b,
       CAST(COALESCE(i.i, 0) AS BIGINT) AS n_inter,
       floor(COALESCE(i.i, 0)
             / CAST(p1.c + p2.c - COALESCE(i.i, 0) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS jaccard
FROM sizes p1 JOIN sizes p2 ON p1.source < p2.source
LEFT JOIN inter i ON i.s1 = p1.source AND i.s2 = p2.source
"""


def source_weighted_jaccard_oracle() -> str:
    """Mirror of textstats.source_weighted_jaccard: Σmin over shared
    tokens (inner join), Σmax = tot_a + tot_b − Σmin."""
    return """
WITH toks AS (
  SELECT source, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents WHERE trim(text) <> ''
),
c AS (SELECT source, w, CAST(count(*) AS BIGINT) AS n
      FROM toks GROUP BY source, w),
tots AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot
         FROM c GROUP BY source),
mins AS (
  SELECT a.source AS s1, b.source AS s2,
         CAST(sum(least(a.n, b.n)) AS BIGINT) AS smin
  FROM c a JOIN c b ON a.w = b.w AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT t1.source AS s1, t2.source AS s2,
       CAST(COALESCE(m.smin, 0) AS BIGINT) AS sum_min,
       CAST(t1.tot + t2.tot - COALESCE(m.smin, 0) AS BIGINT) AS sum_max,
       floor(COALESCE(m.smin, 0)
             / CAST(t1.tot + t2.tot - COALESCE(m.smin, 0) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS wjaccard
FROM tots t1 JOIN tots t2 ON t1.source < t2.source
LEFT JOIN mins m ON m.s1 = t1.source AND m.s2 = t2.source
"""


def hapax_by_source_oracle() -> str:
    """Mirror of textstats.hapax_by_source: corpus-wide singleton tokens
    attributed to their one source."""
    return """
WITH toks AS (
  SELECT source, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents WHERE trim(text) <> ''
),
c AS (SELECT source, w, CAST(count(*) AS BIGINT) AS n
      FROM toks GROUP BY source, w),
g AS (SELECT w, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY w)
SELECT c.source, CAST(sum(c.n) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN g.tot = 1 AND c.n = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hapax,
       floor(sum(CASE WHEN g.tot = 1 AND c.n = 1 THEN 1 ELSE 0 END)
             / CAST(sum(c.n) AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS hapax_rate
FROM c JOIN g ON g.w = c.w
GROUP BY c.source
"""


def cross_source_dups_oracle() -> str:
    """Mirror of textstats.cross_source_dups: distinct normalized texts
    per source, pairwise intersection/Jaccard."""
    return """
WITH toks AS (SELECT DISTINCT source, lower(trim(text)) AS w
              FROM documents),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS c
          FROM toks GROUP BY source),
inter AS (
  SELECT a.source AS s1, b.source AS s2, CAST(count(*) AS BIGINT) AS i
  FROM toks a JOIN toks b ON a.w = b.w AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT p1.source AS s1, p2.source AS s2, p1.c AS n_a, p2.c AS n_b,
       CAST(COALESCE(i.i, 0) AS BIGINT) AS n_inter,
       floor(COALESCE(i.i, 0)
             / CAST(p1.c + p2.c - COALESCE(i.i, 0) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS jaccard
FROM sizes p1 JOIN sizes p2 ON p1.source < p2.source
LEFT JOIN inter i ON i.s1 = p1.source AND i.s2 = p2.source
"""


def source_kl_divergence_oracle(src_a: str = "src0",
                                src_b: str = "src1") -> str:
    """Mirror of textstats.source_kl_divergence: add-one smoothing over
    the joint vocab, per-term floor(p·ln(p/q)·1e6+0.5) int64 sum — the
    identical double op chain (two divisions, one ln, one product)."""
    return f"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w1
  FROM documents
  WHERE source IN ('{src_a}', '{src_b}') AND trim(text) <> ''
), c AS (
  SELECT w1,
         CAST(SUM(CASE WHEN source = '{src_a}' THEN 1 ELSE 0 END)
              AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN source = '{src_b}' THEN 1 ELSE 0 END)
              AS BIGINT) AS cb
  FROM toks GROUP BY w1
), t AS (
  SELECT CAST(count(*) AS BIGINT) AS v,
         CAST(coalesce(SUM(ca), 0) AS BIGINT) AS ta,
         CAST(coalesce(SUM(cb), 0) AS BIGINT) AS tb
  FROM c
)
SELECT t.v AS n_vocab, t.ta AS t_a, t.tb AS t_b,
       CAST(coalesce(SUM(CAST(floor(
           (CAST(c.ca + 1 AS DOUBLE) / CAST(t.ta + t.v AS DOUBLE))
           * ln((CAST(c.ca + 1 AS DOUBLE) / CAST(t.ta + t.v AS DOUBLE))
                / (CAST(c.cb + 1 AS DOUBLE) / CAST(t.tb + t.v AS DOUBLE)))
           * 1e6 + 0.5) AS BIGINT)), 0) AS BIGINT) AS kl_micros,
       CAST(CAST(coalesce(SUM(CAST(floor(
           (CAST(c.ca + 1 AS DOUBLE) / CAST(t.ta + t.v AS DOUBLE))
           * ln((CAST(c.ca + 1 AS DOUBLE) / CAST(t.ta + t.v AS DOUBLE))
                / (CAST(c.cb + 1 AS DOUBLE) / CAST(t.tb + t.v AS DOUBLE)))
           * 1e6 + 0.5) AS BIGINT)), 0) AS BIGINT) AS DOUBLE) / 1e6 AS kl
FROM c, t GROUP BY t.v, t.ta, t.tb
"""


def chi2_tokens_oracle(k: int = 3) -> str:
    """Mirror of textstats.chi2_tokens: integer-rational χ² micros in
    HUGEINT (safe to ~4×10⁹ total tokens; the engine's Python ints are
    unbounded), row_number top-k per source (chi2 desc, token asc)."""
    return f"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(lower(trim(text)), '\\s+'))
      AS token
  FROM documents WHERE trim(text) <> ''
), c AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS n_sw
  FROM toks GROUP BY source, token
), ts AS (SELECT source, CAST(SUM(n_sw) AS BIGINT) AS t_s
          FROM c GROUP BY source),
cw AS (SELECT token, CAST(SUM(n_sw) AS BIGINT) AS c_w
       FROM c GROUP BY token),
nn AS (SELECT CAST(SUM(n_sw) AS BIGINT) AS n FROM c),
ab AS (
  SELECT c.source, c.token, c.n_sw,
         CAST(c.n_sw AS HUGEINT) AS a,
         CAST(ts.t_s - c.n_sw AS HUGEINT) AS b,
         CAST(cw.c_w - c.n_sw AS HUGEINT) AS cc,
         CAST(nn.n - ts.t_s - (cw.c_w - c.n_sw) AS HUGEINT) AS d,
         CAST(nn.n AS HUGEINT) AS n
  FROM c JOIN ts USING (source) JOIN cw USING (token), nn
), x AS (
  SELECT source, token, n_sw,
         CASE WHEN (a + b) * (cc + d) * (a + cc) * (b + d) = 0 THEN 0
              ELSE CAST((n * (a * d - b * cc) * (a * d - b * cc)
                         * 1000000)
                        // ((a + b) * (cc + d) * (a + cc) * (b + d))
                        AS BIGINT) END AS chi2_micros
  FROM ab
)
SELECT source, token, n_sw, chi2_micros FROM (
  SELECT *, row_number() OVER (PARTITION BY source
             ORDER BY chi2_micros DESC, token) AS rn
  FROM x) WHERE rn <= {k}
"""


def source_js_divergence_oracle(src_a: str = "src0",
                                src_b: str = "src1") -> str:
    """Mirror of textstats.source_js_divergence: JS = ½KL(P‖M)+½KL(Q‖M)
    with M = ½(P+Q), per-term floor((0.5·p·ln(p/m)+0.5·q·ln(q/m))·1e6
    +0.5) int64 sum in the engine's exact double op order."""
    return f"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w1
  FROM documents
  WHERE source IN ('{src_a}', '{src_b}') AND trim(text) <> ''
), c AS (
  SELECT w1,
         CAST(SUM(CASE WHEN source = '{src_a}' THEN 1 ELSE 0 END)
              AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN source = '{src_b}' THEN 1 ELSE 0 END)
              AS BIGINT) AS cb
  FROM toks GROUP BY w1
), t AS (
  SELECT CAST(count(*) AS BIGINT) AS v,
         CAST(coalesce(SUM(ca), 0) AS BIGINT) AS ta,
         CAST(coalesce(SUM(cb), 0) AS BIGINT) AS tb
  FROM c
), pq AS (
  SELECT CAST(c.ca + 1 AS DOUBLE) / CAST(t.ta + t.v AS DOUBLE) AS p,
         CAST(c.cb + 1 AS DOUBLE) / CAST(t.tb + t.v AS DOUBLE) AS q
  FROM c, t
), tm AS (
  SELECT CAST(floor((0.5 * p * ln(p / (0.5 * (p + q)))
                     + 0.5 * q * ln(q / (0.5 * (p + q))))
                    * 1e6 + 0.5) AS BIGINT) AS term
  FROM pq
)
SELECT t.v AS n_vocab, t.ta AS t_a, t.tb AS t_b,
       CAST(coalesce((SELECT SUM(term) FROM tm), 0) AS BIGINT)
           AS js_micros,
       CAST(CAST(coalesce((SELECT SUM(term) FROM tm), 0) AS BIGINT)
            AS DOUBLE) / 1e6 AS js
FROM t
"""


def returned_item_customers_oracle(k: int = 20) -> str:
    """TPC-H Q10 mirror of relational.returned_item_customers: returned
    revenue per customer in exact micros, deterministic (rev desc,
    custkey) top-k, inner joins throughout."""
    return f"""
WITH rev AS (
  SELECT o.o_custkey,
         CAST(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                             * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS rm
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY o.o_custkey
)
SELECT c.c_custkey, c.c_name, n.n_name, rev.rm / 1e6 AS revenue
FROM rev
JOIN customer c ON c.c_custkey = rev.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY rev.rm DESC, c.c_custkey
LIMIT {k}
"""


def top_supplier_revenue_oracle(lo: str = "1997-01-01",
                                hi: str = "1997-04-01") -> str:
    """TPC-H Q15 mirror of relational.top_supplier_revenue: WITH TIES via
    integer-equality against the max micros revenue."""
    return f"""
WITH rev AS (
  SELECT l.l_suppkey,
         CAST(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                             * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS rm
  FROM lineitem l
  WHERE epoch_us(l.l_shipdate) >= epoch_us(TIMESTAMP '{lo}')
    AND epoch_us(l.l_shipdate) < epoch_us(TIMESTAMP '{hi}')
  GROUP BY l.l_suppkey
)
SELECT s.s_suppkey, s.s_name, rev.rm / 1e6 AS total_revenue
FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
WHERE rev.rm = (SELECT max(rm) FROM rev)
"""


def brand_supplier_counts_oracle(exclude_brand: str = "Brand#45") -> str:
    """TPC-H Q16 mirror of relational.brand_supplier_counts: distinct
    suppliers per (brand, type) via the lineitem supplier relationship."""
    return f"""
SELECT p.p_brand, p.p_type,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> '{exclude_brand}'
GROUP BY p.p_brand, p.p_type
"""


def disjunctive_revenue_oracle() -> str:
    """TPC-H Q19 mirror of relational.disjunctive_revenue: the three-arm
    OR evaluated on micros-quantized quantity, revenue in exact micros."""
    return """
WITH j AS (
  SELECT p.p_brand, p.p_size,
         CAST(floor(l.l_quantity * 1e6 + 0.5) AS BIGINT) AS qty,
         CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 1e6 + 0.5)
              AS BIGINT) AS rm
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(CAST(coalesce(SUM(rm), 0) AS BIGINT) AS DOUBLE) / 1e6
           AS revenue
FROM j
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND qty BETWEEN 1 * 1000000 AND 11 * 1000000)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND qty BETWEEN 10 * 1000000 AND 20 * 1000000)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND qty BETWEEN 20 * 1000000 AND 30 * 1000000)
"""


def csv_roundtrip_counts_oracle() -> str:
    """Parquet-side mirror of readers.csv_roundtrip_counts: if the CSV
    sink+source layer is lossless the aggregates hash-match."""
    return """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_micros
FROM events GROUP BY event_type
"""


def user_event_entropy_oracle() -> str:
    """Mirror of windows.user_event_entropy: per-term
    floor(−(c/n)·ln(c/n)·1e6+0.5) integer sum (order-free)."""
    return """
WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY user_id, event_type),
     n AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
                  CAST(count(*) AS BIGINT) AS n_types
           FROM c GROUP BY user_id)
SELECT n.user_id, n.n AS n_events, n.n_types,
       CAST(SUM(CAST(floor(
           -((CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE))
             * ln(CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE)))
           * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS ent_micros,
       CAST(CAST(SUM(CAST(floor(
           -((CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE))
             * ln(CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE)))
           * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e6 AS entropy
FROM c JOIN n ON n.user_id = c.user_id
GROUP BY n.user_id, n.n, n.n_types
"""


def monthly_revenue_growth_oracle() -> str:
    """Mirror of relational.monthly_revenue_growth: month aggregate in
    exact micros, LAG window, one round6 growth division."""
    return """
WITH m AS (
  SELECT epoch_us(date_trunc('month', o_orderdate)) AS month_us,
         CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_micros
  FROM orders GROUP BY 1
), w AS (
  SELECT month_us, rev_micros,
         LAG(rev_micros) OVER (ORDER BY month_us) AS prev_micros
  FROM m
)
SELECT month_us, rev_micros, CAST(prev_micros AS BIGINT) AS prev_micros,
       floor(CAST(rev_micros - prev_micros AS DOUBLE)
             / CAST(prev_micros AS DOUBLE) * 1e6 + 0.5) / 1e6 AS growth
FROM w WHERE prev_micros IS NOT NULL
"""


def conversion_lag_quantiles_oracle(first_type: str = "view",
                                    then_type: str = "purchase",
                                    qs=(0.25, 0.5, 0.75, 0.9)) -> str:
    """Mirror of windows.conversion_lag_quantiles: first-event lags in
    integer seconds through the engine's exact micro-index type-7
    interpolation chain (same CTE shape as token_quantiles_cont)."""
    q_rows = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q, "
        f"CAST(floor({q} * 1e6 + 0.5) AS BIGINT) AS qm" for q in qs)
    return f"""
WITH fv AS (
  SELECT user_id,
         min(CASE WHEN event_type = '{first_type}'
             THEN epoch_us(ts) END) AS v,
         min(CASE WHEN event_type = '{then_type}'
             THEN epoch_us(ts) END) AS p
  FROM events GROUP BY user_id
),
base AS (
  SELECT (p - v) // 1000000 AS v FROM fv
  WHERE v IS NOT NULL AND p IS NOT NULL AND p > v
),
h AS (SELECT v, count(*) AS n FROM base GROUP BY v),
c AS (SELECT v, sum(n) OVER (ORDER BY v) AS cum FROM h),
params AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM h),
qs AS ({q_rows}),
pos AS (SELECT q, qm * (n - 1) AS hm FROM qs, params),
pick AS (SELECT q, hm // 1000000 AS lo, hm % 1000000 AS frac FROM pos),
el AS (
  SELECT p.q, p.frac,
         (SELECT min(v) FROM c WHERE cum > p.lo) AS vlo,
         (SELECT min(v) FROM c
          WHERE cum > p.lo + CASE WHEN p.frac > 0 THEN 1 ELSE 0 END) AS vhi
  FROM pick p
)
SELECT q,
       floor((vlo + (frac * (vhi - vlo)) / 1e6) * 1e6 + 0.5) / 1e6 AS value
FROM el
"""


def timed_conversions_oracle(first_type: str = "view",
                             then_type: str = "purchase",
                             window_sec: int = 3600) -> str:
    """Mirror of windows.timed_conversions: a first_type event in
    [p − window, p) strictly before each then_type event."""
    w = window_sec * 1_000_000
    return f"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
     p AS (SELECT user_id, tu FROM e WHERE event_type = '{then_type}'),
     v AS (SELECT user_id, tu FROM e WHERE event_type = '{first_type}')
SELECT p.user_id, CAST(count(*) AS BIGINT) AS n_then,
       CAST(SUM(CASE WHEN EXISTS (
                SELECT 1 FROM v
                WHERE v.user_id = p.user_id
                  AND v.tu >= p.tu - {w} AND v.tu < p.tu)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM p GROUP BY p.user_id
"""


def grouped_mad_outliers_oracle(k: int = 3) -> str:
    """Mirror of quantiles.grouped_mad_outliers: the grouped_mad doubled-
    space CTEs composed with the division-cleared Hampel test
    2·|2·vm − med2| > k·mad4."""
    return f"""
WITH vm AS (SELECT event_type AS g,
                   CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
            FROM events),
     cnt AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM vm GROUP BY g),
     ordv AS (SELECT g, vm,
                     row_number() OVER (PARTITION BY g ORDER BY vm) - 1 AS i
              FROM vm),
     med AS (SELECT o.g,
                    CAST(SUM(CASE WHEN o.i = (c.n - 1) // 2
                             THEN o.vm ELSE 0 END)
                       + SUM(CASE WHEN o.i = c.n // 2
                             THEN o.vm ELSE 0 END) AS BIGINT) AS med2
             FROM ordv o JOIN cnt c ON c.g = o.g GROUP BY o.g),
     dev AS (SELECT v.g, ABS(2 * v.vm - m.med2) AS d2
             FROM vm v JOIN med m ON m.g = v.g),
     ordd AS (SELECT g, d2,
                     row_number() OVER (PARTITION BY g ORDER BY d2) - 1 AS i
              FROM dev),
     mad AS (SELECT o.g,
                    CAST(SUM(CASE WHEN o.i = (c.n - 1) // 2
                             THEN o.d2 ELSE 0 END)
                       + SUM(CASE WHEN o.i = c.n // 2
                             THEN o.d2 ELSE 0 END) AS BIGINT) AS mad4
             FROM ordd o JOIN cnt c ON c.g = o.g GROUP BY o.g)
SELECT e.event_id, e.event_type, e.value
FROM events e
JOIN med m ON m.g = e.event_type
JOIN mad d ON d.g = e.event_type
WHERE 2 * ABS(2 * CAST(floor(e.value * 1e6 + 0.5) AS BIGINT) - m.med2)
      > {k} * d.mad4
"""


def part_size_histogram_oracle(n_bins: int = 10, lo: int = 1,
                               hi: int = 50) -> str:
    """Mirror of relational.part_size_histogram: integer bucket and edge
    arithmetic, clipped edge bins."""
    span = hi - lo + 1
    return f"""
SELECT bucket,
       CAST({lo} + bucket * {span} // {n_bins} AS BIGINT) AS lo_edge,
       CAST(count(*) AS BIGINT) AS n
FROM (SELECT LEAST(GREATEST((p_size - {lo}) * {n_bins} // {span}, 0),
                   {n_bins - 1}) AS bucket
      FROM part)
GROUP BY bucket
"""


def rfm_scores_oracle(k: int = 5) -> str:
    """Mirror of relational.rfm_scores: NTILE(k) over (last_us DESC,
    custkey) / (n_orders, custkey) / (monetary, custkey)."""
    return f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(max(epoch_us(o_orderdate)) AS BIGINT) AS last_us,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT))
              AS BIGINT) AS monetary_micros
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey AS c_custkey, last_us, n_orders, monetary_micros,
       CAST(NTILE({k}) OVER (ORDER BY last_us DESC, o_custkey)
            AS BIGINT) AS r_tile,
       CAST(NTILE({k}) OVER (ORDER BY n_orders, o_custkey)
            AS BIGINT) AS f_tile,
       CAST(NTILE({k}) OVER (ORDER BY monetary_micros, o_custkey)
            AS BIGINT) AS m_tile
FROM per_cust
"""


def conjunctive_search_oracle(query: str = "data hash join") -> str:
    """Mirror of textstats.conjunctive_search: docs containing every
    query token, total tf."""
    toks = sorted(set(w for w in query.lower().strip().split() if w))
    in_list = ", ".join(f"'{t}'" for t in toks)
    k = len(toks)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents WHERE trim(text) <> ''
), m AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
  FROM toks WHERE w IN ({in_list}) GROUP BY doc_id, w
)
SELECT doc_id, CAST({k} AS BIGINT) AS n_terms,
       CAST(SUM(c) AS BIGINT) AS tf_sum
FROM m GROUP BY doc_id HAVING count(*) = {k}
"""


def source_length_gini_oracle() -> str:
    """Mirror of textstats.source_length_gini: sorted-form Gini with
    exact integer numerator, one double division."""
    return """
WITH l AS (
  SELECT source,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS len
  FROM documents
), o AS (
  SELECT source, len,
         row_number() OVER (PARTITION BY source ORDER BY len) AS i
  FROM l
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(len) AS BIGINT) AS sum_len,
       CAST(2 * SUM(i * len) - (count(*) + 1) * SUM(len) AS BIGINT)
           AS gini_num,
       CAST(CAST(2 * SUM(i * len) - (count(*) + 1) * SUM(len) AS BIGINT)
            AS DOUBLE)
           / CAST(count(*) * SUM(len) AS DOUBLE) AS gini
FROM o GROUP BY source
"""


def forecast_revenue_oracle(year: int = 1997, disc_lo: int = 50_000,
                            disc_hi: int = 70_000,
                            max_qty: int = 24) -> str:
    """TPC-H Q6 mirror of relational.forecast_revenue: micros-exact
    discount band and quantity cap, Σ extprice·discount micros."""
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(CAST(coalesce(SUM(CAST(floor(
           l_extendedprice * l_discount * 1e6 + 0.5) AS BIGINT)), 0)
           AS BIGINT) AS DOUBLE) / 1e6 AS revenue
FROM lineitem
WHERE epoch_us(l_shipdate) >= epoch_us(TIMESTAMP '{year}-01-01')
  AND epoch_us(l_shipdate) < epoch_us(TIMESTAMP '{year + 1}-01-01')
  AND CAST(floor(l_discount * 1e6 + 0.5) AS BIGINT)
      BETWEEN {disc_lo} AND {disc_hi}
  AND CAST(floor(l_quantity * 1e6 + 0.5) AS BIGINT) < {max_qty} * 1000000
"""


def nation_market_share_oracle(nation: str = "NATION_3",
                               region: str = "EUROPE") -> str:
    """TPC-H Q8 mirror of relational.nation_market_share: conditional
    micros aggregation per order year, one share division."""
    return f"""
WITH li AS (
  SELECT l.l_orderkey,
         CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 1e6 + 0.5)
              AS BIGINT) AS rm,
         (s.s_nationkey = (SELECT n_nationkey FROM nation
                           WHERE n_name = '{nation}')) AS fl
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
), o AS (
  SELECT o_orderkey, o_custkey,
         CAST(year(o_orderdate) AS BIGINT) AS o_year
  FROM orders
), c AS (
  SELECT c.c_custkey
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
                AND r.r_name = '{region}'
)
SELECT o.o_year,
       CAST(SUM(CASE WHEN li.fl THEN li.rm ELSE 0 END) AS DOUBLE)
           / CAST(SUM(li.rm) AS DOUBLE) AS share,
       CAST(SUM(CASE WHEN li.fl THEN li.rm ELSE 0 END) AS BIGINT)
           AS nation_micros,
       CAST(SUM(li.rm) AS BIGINT) AS total_micros
FROM li
JOIN o ON o.o_orderkey = li.l_orderkey
JOIN c ON c.c_custkey = o.o_custkey
GROUP BY o.o_year
"""


def heavy_part_suppliers_oracle(brand: str = "Brand#12",
                                min_qty: float = 50.0) -> str:
    """TPC-H Q20 mirror of relational.heavy_part_suppliers: per-supplier
    shipped quantity of one brand in exact micros over the threshold."""
    thresh = int(round(min_qty * 1e6))
    return f"""
WITH x AS (
  SELECT l.l_suppkey,
         CAST(SUM(CAST(floor(l.l_quantity * 1e6 + 0.5) AS BIGINT))
              AS BIGINT) AS qm
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
                              AND p.p_brand = '{brand}'
  GROUP BY l.l_suppkey
)
SELECT x.l_suppkey AS s_suppkey, s.s_name,
       CAST(x.qm AS DOUBLE) / 1e6 AS qty
FROM x JOIN supplier s ON s.s_suppkey = x.l_suppkey
WHERE x.qm > {thresh}
"""


def latest_order_per_customer_oracle() -> str:
    """Mirror of relational.latest_order_per_customer: row_number() DESC
    over (last_us, orderkey) per customer."""
    return """
WITH o AS (
  SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS last_us,
         CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT) AS tpm,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY epoch_us(o_orderdate) DESC,
                                     o_orderkey DESC) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey, CAST(last_us AS BIGINT) AS last_us,
       CAST(tpm AS DOUBLE) / 1e6 AS o_totalprice
FROM o WHERE rn = 1
"""


def upsert_snapshot_oracle() -> str:
    """Mirror of diff.upsert_snapshot: the same derived change set
    (D: %7, U: %3 of the rest, I: %11) applied via LEFT JOIN semantics."""
    return """
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT) AS tpm
  FROM orders
), ch AS (
  SELECT o_orderkey AS c_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
         tpm + 10000000 AS new_tpm
  FROM base WHERE o_orderkey % 7 = 0 OR o_orderkey % 3 = 0
), applied AS (
  SELECT b.o_orderstatus,
         CASE WHEN c.op = 'U' THEN c.new_tpm ELSE b.tpm END AS tpm
  FROM base b LEFT JOIN ch c ON c.c_orderkey = b.o_orderkey
  WHERE c.op IS NULL OR c.op <> 'D'
), ins AS (
  SELECT 'I' AS o_orderstatus, CAST(100000000 AS BIGINT) AS tpm
  FROM base WHERE o_orderkey % 11 = 0
), allr AS (
  SELECT * FROM applied UNION ALL SELECT * FROM ins
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(tpm) AS BIGINT) AS sum_micros
FROM allr GROUP BY o_orderstatus
"""


def kwic_search_oracle(term: str = "join", width: int = 40) -> str:
    """Mirror of textstats.kwic_search: strpos first occurrence,
    substr context windows (char-based; corpus is ASCII)."""
    tl = len(term)
    return f"""
WITH h AS (SELECT doc_id, text, strpos(text, '{term}') AS pos
           FROM documents WHERE strpos(text, '{term}') > 0)
SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       substr(text, greatest(pos - {width}, 1),
              pos - greatest(pos - {width}, 1)) AS left_ctx,
       substr(text, pos + {tl}, {width}) AS right_ctx
FROM h
"""


def embedding_isotropy_oracle(dim: int = 64) -> str:
    """Mirror of similarity.embedding_isotropy: per-dim micros sums
    squared (HUGEINT), Σ‖v‖² micros², one double division."""
    return f"""
WITH idx AS (SELECT unnest(generate_series(1, {dim})) AS i),
m AS (SELECT idx.i,
             CAST(floor(CAST(e.embedding[idx.i] AS DOUBLE) * 1e6 + 0.5)
                  AS BIGINT) AS em
      FROM embeddings e, idx),
s AS (SELECT i, CAST(SUM(em) AS BIGINT) AS sv FROM m GROUP BY i),
num AS (SELECT SUM(CAST(sv AS HUGEINT) * sv) AS num FROM s),
n2 AS (SELECT (SELECT CAST(SUM(CAST(floor(x * 1e6 + 0.5) AS BIGINT)
                               * CAST(floor(x * 1e6 + 0.5) AS BIGINT))
                           AS BIGINT)
               FROM unnest(embedding) AS t(x)) AS n2
       FROM embeddings),
den AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(n2) AS BIGINT) AS sum_norm2 FROM n2)
SELECT den.n, den.sum_norm2,
       CAST(num.num AS DOUBLE)
         / (CAST(den.n AS DOUBLE) * den.sum_norm2) AS isotropy
FROM num, den
"""


def embedding_norms_oracle() -> str:
    """Mirror of similarity.embedding_norms: Σ over dims of the squared
    micros-quantized components, exact integer sums per label."""
    return """
WITH n2 AS (
  SELECT label,
         (SELECT CAST(SUM(CAST(floor(x * 1e6 + 0.5) AS BIGINT)
                           * CAST(floor(x * 1e6 + 0.5) AS BIGINT))
                      AS BIGINT)
          FROM unnest(embedding) AS t(x)) AS n2
  FROM embeddings
)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(n2) AS BIGINT) AS sum_norm2,
       CAST(SUM(n2) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_norm2
FROM n2 GROUP BY label
"""


def type_cooccurrence_jaccard_oracle() -> str:
    """Mirror of events.type_cooccurrence_jaccard: distinct (user, type)
    pairs self-joined a < b, union via inclusion-exclusion."""
    return """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
     pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         CAST(count(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id
                      AND a.event_type < b.event_type
  GROUP BY 1, 2
), cnt AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1
)
SELECT ca.event_type AS type_a, cb.event_type AS type_b,
       CAST(coalesce(p.n_both, 0) AS BIGINT) AS n_both,
       CAST(ca.n + cb.n - coalesce(p.n_both, 0) AS BIGINT) AS n_either,
       floor(CAST(coalesce(p.n_both, 0) AS DOUBLE)
             / CAST(ca.n + cb.n - coalesce(p.n_both, 0) AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS jaccard
FROM cnt ca
JOIN cnt cb ON ca.event_type < cb.event_type
LEFT JOIN pairs p ON p.ta = ca.event_type AND p.tb = cb.event_type
"""


def grouped_winsorized_mean_oracle(q_lo: float = 0.05,
                                   q_hi: float = 0.95) -> str:
    """Mirror of quantiles.grouped_winsorized_mean: quantile_disc clip
    bounds (DuckDB's quantile_disc = the engine's ceil(q·n)−1 element),
    integer clip, floor(sum/n+0.5)/1e6 mean."""
    return f"""
WITH vm AS (SELECT event_type AS g,
                   CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
            FROM events),
     b AS (SELECT g, CAST(quantile_disc(vm, {q_lo}) AS BIGINT) AS lo,
                  CAST(quantile_disc(vm, {q_hi}) AS BIGINT) AS hi
           FROM vm GROUP BY g)
SELECT vm.g AS event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(LEAST(GREATEST(vm.vm, b.lo), b.hi)) AS BIGINT)
           AS sum_micros,
       floor(CAST(SUM(LEAST(GREATEST(vm.vm, b.lo), b.hi)) AS BIGINT)
             / CAST(count(*) AS DOUBLE) + 0.5) / 1e6 AS wmean
FROM vm JOIN b ON b.g = vm.g
GROUP BY vm.g
"""


def partitioned_prune_counts_oracle(keep_type: str = "purchase") -> str:
    """Predicate-filtered mirror of readers.partitioned_prune_counts on
    the unpartitioned base — equality proves the partitioned sink +
    pruned source layer is lossless."""
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_micros,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events WHERE event_type = '{keep_type}'
"""


def embedding_dim_stats_oracle(dim: int = 64) -> str:
    """Mirror of similarity.embedding_dim_stats: per-dim micros moments,
    HUGEINT n·Σx² − (Σx)² (the engine's Python big-ints), the same
    μ/σ double chains."""
    return f"""
WITH idx AS (SELECT unnest(generate_series(1, {dim})) AS i),
x AS (
  SELECT idx.i,
         CAST(floor(CAST(e.embedding[idx.i] AS DOUBLE) * 1e6 + 0.5)
              AS BIGINT) AS xm
  FROM embeddings e, idx),
m AS (
  SELECT i, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(xm) AS BIGINT) AS sm,
         CAST(SUM(xm * xm) AS BIGINT) AS ss
  FROM x GROUP BY i)
SELECT CAST(i AS BIGINT) AS i, n, sm AS sum_micros, ss,
       (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)) / 1e6 AS mean,
       sqrt(CAST(CAST(n AS HUGEINT) * CAST(ss AS HUGEINT)
                 - CAST(sm AS HUGEINT) * CAST(sm AS HUGEINT) AS DOUBLE))
           / CAST(n AS DOUBLE) / 1e6 AS std
FROM m
"""


def sq8_audit_oracle(dim: int = 64) -> str:
    """Mirror of similarity.sq8_audit: per-dim min/max micros grid,
    integer round-half-up code/recon ((2a+b)//2b identity, DuckDB //
    on non-negatives = floor), exact SSE, mse = floor(sse/n + 0.5)."""
    return f"""
WITH idx AS (SELECT unnest(generate_series(1, {dim})) AS i),
x AS (
  SELECT idx.i,
         CAST(floor(CAST(e.embedding[idx.i] AS DOUBLE) * 1e6 + 0.5)
              AS BIGINT) AS xm
  FROM embeddings e, idx),
mm AS (
  SELECT i, CAST(MIN(xm) AS BIGINT) AS mn, CAST(MAX(xm) AS BIGINT) AS mx
  FROM x GROUP BY i),
co AS (
  SELECT x.i, x.xm - mm.mn AS d, mm.mx - mm.mn AS rng, mm.mn, mm.mx,
         CASE WHEN mm.mx - mm.mn = 0 THEN 0
              ELSE ((x.xm - mm.mn) * 510 + (mm.mx - mm.mn))
                   // (2 * (mm.mx - mm.mn)) END AS c
  FROM x JOIN mm USING (i)),
er AS (
  SELECT i, mn, mx,
         d - CASE WHEN rng = 0 THEN 0
                  ELSE (c * rng * 2 + 255) // 510 END AS err
  FROM co)
SELECT CAST(i AS BIGINT) AS i, CAST(count(*) AS BIGINT) AS n,
       CAST(mn AS BIGINT) AS vmin_micros, CAST(mx AS BIGINT)
           AS vmax_micros,
       CAST(SUM(err * err) AS BIGINT) AS sse,
       CAST(floor(CAST(SUM(err * err) AS DOUBLE) / count(*) + 0.5)
            AS BIGINT) AS mse
FROM er GROUP BY i, mn, mx
"""


def dataset_split_assign_oracle(pcts=(80, 10, 10), seed: int = 9) -> str:
    """Mirror of curation.dataset_split_assign: first md5 byte of
    'seed:doc_id' against the same cumulative 256-scaled cuts."""
    acc = 0
    cuts = []
    for p in pcts:
        acc += p
        cuts.append(acc * 256 // 100)
    c0 = f"{cuts[0]:02x}"
    c1 = f"{cuts[1]:02x}"
    return f"""
WITH a AS (
  SELECT CASE
           WHEN substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 2)
                < '{c0}' THEN 'train'
           WHEN substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 2)
                < '{c1}' THEN 'val'
           ELSE 'test' END AS split,
         lang
  FROM documents)
SELECT split, lang, CAST(count(*) AS BIGINT) AS n
FROM a GROUP BY split, lang
"""


def weighted_median_price_oracle(qs=(0.5,)) -> str:
    """Mirror of quantiles.weighted_median_price: smallest price whose
    cumulative quantity weight reaches ceil(q·W), integer micros of q."""
    q_rows = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q, "
        f"CAST(floor({q} * 1e6 + 0.5) AS BIGINT) AS qm" for q in qs)
    return f"""
WITH h AS (
  SELECT CAST(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT) AS vm,
         CAST(SUM(CAST(floor(l_quantity * 1e6 + 0.5) AS BIGINT))
              AS BIGINT) AS w
  FROM lineitem GROUP BY 1
), c AS (
  SELECT vm, SUM(w) OVER (ORDER BY vm) AS cum FROM h
), t AS (SELECT CAST(SUM(w) AS BIGINT) AS total FROM h),
qs AS ({q_rows})
SELECT qs.q,
       (SELECT min(vm) FROM c, t
        WHERE c.cum >= -((-(qs.qm * t.total)) // 1000000)) / 1e6 AS value
FROM qs
"""


def grouped_harmonic_mean_oracle() -> str:
    """Mirror of quantiles.grouped_harmonic_mean: reciprocal micros
    floor(1e12/vm+0.5) over positive values, n·1e12/Σ/1e6 finish."""
    return """
WITH vm AS (SELECT event_type AS g,
                   CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
            FROM events
            WHERE CAST(floor(value * 1e6 + 0.5) AS BIGINT) > 0)
SELECT g AS event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(1e12 / vm + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_recip_micros,
       CAST(count(*) AS DOUBLE) * 1e12
           / CAST(SUM(CAST(floor(1e12 / vm + 0.5) AS BIGINT)) AS DOUBLE)
           / 1e6 AS hmean
FROM vm GROUP BY g
"""


def benford_digits_oracle() -> str:
    """Mirror of quantiles.benford_digits: leading digit of the positive
    micros ints, round6 shares vs log10(1+1/d); excess is round6 of the
    DIFFERENCE of the two already-rounded values (matching the engine)."""
    share = "floor(n / CAST(tot AS DOUBLE) * 1e6 + 0.5) / 1e6"
    benford = "floor(log10(1.0 + 1.0 / digit) * 1e6 + 0.5) / 1e6"
    return f"""
WITH vm AS (SELECT CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v
            FROM events
            WHERE CAST(floor(value * 1e6 + 0.5) AS BIGINT) > 0),
d AS (SELECT CAST(left(CAST(v AS VARCHAR), 1) AS BIGINT) AS digit
      FROM vm),
c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
SELECT digit, n, {share} AS share, {benford} AS benford,
       floor((({share}) - ({benford})) * 1e6 + 0.5) / 1e6 AS excess
FROM c, t
"""


def events_emd_1d_oracle() -> str:
    """Mirror of quantiles.events_emd_1d: exact integer CDF cross terms
    on the merged micros support (HUGEINT sum), one round6 division."""
    return """
WITH two AS (SELECT event_type FROM events GROUP BY event_type
             ORDER BY event_type LIMIT 2),
v AS (SELECT event_type AS t,
             CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
      FROM events WHERE event_type IN (SELECT event_type FROM two)),
h AS (SELECT vm,
             CAST(SUM(CASE WHEN t = (SELECT min(event_type) FROM two)
                           THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN t = (SELECT max(event_type) FROM two)
                           THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM v GROUP BY vm),
c AS (SELECT vm,
             SUM(ca) OVER (ORDER BY vm) AS cuma,
             SUM(cb) OVER (ORDER BY vm) AS cumb,
             LEAD(vm) OVER (ORDER BY vm) AS nxt
      FROM h),
tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
               CAST(SUM(cb) AS BIGINT) AS nb FROM h),
s AS (SELECT SUM(ABS(c.cuma * tot.nb - c.cumb * tot.na)
                 * (c.nxt - c.vm)) AS sv
      FROM c, tot WHERE c.nxt IS NOT NULL)
SELECT (SELECT min(event_type) FROM two) AS type_a,
       (SELECT max(event_type) FROM two) AS type_b,
       tot.na AS n_a, tot.nb AS n_b,
       floor(CAST(s.sv AS DOUBLE) / (tot.na * tot.nb) / 1e6
             * 1000000 + 0.5) / 1000000 AS emd
FROM tot, s
"""


def grouped_geometric_mean_oracle() -> str:
    """Mirror of quantiles.grouped_geometric_mean: ln-micros
    floor(ln(vm/1e6)·1e6+0.5) over positive values, exp(Σ/n/1e6) round6
    finish."""
    return """
WITH vm AS (SELECT event_type AS g,
                   CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
            FROM events
            WHERE CAST(floor(value * 1e6 + 0.5) AS BIGINT) > 0)
SELECT g AS event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(ln(vm / 1e6) * 1e6 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_ln_micros,
       floor(exp(CAST(SUM(CAST(floor(ln(vm / 1e6) * 1e6 + 0.5) AS BIGINT))
                      AS DOUBLE) / count(*) / 1e6) * 1e6 + 0.5) / 1e6
         AS gmean
FROM vm GROUP BY g
"""


def salted_type_stats_oracle() -> str:
    """Plain GROUP BY mirror of events.salted_type_stats — equality
    proves the salted two-phase plan is answer-preserving."""
    return """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_micros
FROM events GROUP BY event_type
"""


def session_stats_oracle(gap_sec: int = 1800,
                         purchase_type: str = "purchase") -> str:
    """Mirror of windows.session_stats: gaps-and-islands session ids,
    session-grain agg, session-length histogram with exact µs/micros."""
    gap_us = gap_sec * 1_000_000
    return f"""
WITH e AS (
  SELECT user_id, event_id, event_type,
         epoch_us(ts) AS tu,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
  FROM events
), s AS (
  SELECT *, SUM(CASE WHEN pts IS NULL
                     OR tu - epoch_us(pts) > {gap_us} THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY tu, event_id
                  ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
), per AS (
  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_ev,
         CAST(max(tu) - min(tu) AS BIGINT) AS dur,
         CAST(SUM(CASE WHEN event_type = '{purchase_type}'
                  THEN vm ELSE 0 END) AS BIGINT) AS pv
  FROM s GROUP BY user_id, sid
)
SELECT n_ev AS session_len, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(SUM(dur) AS BIGINT) AS total_duration_us,
       CAST(SUM(pv) AS BIGINT) AS purchase_micros
FROM per GROUP BY n_ev
"""


def kg_two_hop_sizes_oracle(sf_dir: str) -> str:
    """Mirror of stages/graph.two_hop_sizes over the KG adjacency:
    2-path self-join unioned with direct neighbors, distinct reach count."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
adj AS (
  SELECT DISTINCT least(subj_id, obj_id) AS lo, greatest(subj_id, obj_id) AS hi
  FROM triples WHERE subj_id <> obj_id
),
bidir AS (
  SELECT lo AS a, hi AS b FROM adj
  UNION
  SELECT hi, lo FROM adj
),
reach AS (
  SELECT a AS node, b AS reach FROM bidir
  UNION
  SELECT p.a, q.b FROM bidir p JOIN bidir q ON q.a = p.b
  WHERE q.b <> p.a
),
n2 AS (SELECT node, CAST(count(*) AS BIGINT) AS n2 FROM reach
       GROUP BY node),
deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS n1 FROM bidir
        GROUP BY a)
SELECT n2.node, deg.n1, n2.n2
FROM n2 JOIN deg ON deg.node = n2.node
"""


def revenue_cohorts_oracle() -> str:
    """Mirror of relational.revenue_cohorts: first-order month per
    customer, month-number arithmetic, exact micros revenue grid."""
    return """
WITH o AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + (month(o_orderdate) - 1)
              AS BIGINT) AS mnum,
         CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT) AS tpm
  FROM orders
), f AS (
  SELECT o_custkey, CAST(min(mnum) AS BIGINT) AS cohort
  FROM o GROUP BY o_custkey
)
SELECT f.cohort AS cohort_month,
       CAST(o.mnum - f.cohort AS BIGINT) AS age_months,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(o.tpm) AS BIGINT) AS rev_micros
FROM o JOIN f ON f.o_custkey = o.o_custkey
GROUP BY f.cohort, o.mnum - f.cohort
"""


def dedup_keep_longest_oracle() -> str:
    """Mirror of dedup.dedup_keep_longest: per normalized-content group
    the longest doc (tie → smallest id)."""
    return """
WITH n AS (
  SELECT doc_id, md5(lower(trim(text))) AS content_hash,
         CAST(len(lower(trim(text))) AS BIGINT) AS n_chars
  FROM documents
), r AS (
  SELECT *, row_number() OVER (PARTITION BY content_hash
                               ORDER BY n_chars DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY content_hash) AS n_dups
  FROM n
)
SELECT content_hash, doc_id, n_chars, CAST(n_dups AS BIGINT) AS n_dups
FROM r WHERE rn = 1
"""


def lang_top_tokens_oracle(k: int = 5) -> str:
    """Mirror of textstats.lang_top_tokens: per-lang row_number over
    (cnt desc, token)."""
    return f"""
WITH toks AS (
  SELECT lang, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents WHERE trim(text) <> ''
), c AS (
  SELECT lang, w AS token, CAST(count(*) AS BIGINT) AS cnt
  FROM toks GROUP BY lang, w
), r AS (
  SELECT lang, token, cnt,
         row_number() OVER (PARTITION BY lang
                            ORDER BY cnt DESC, token) AS rank
  FROM c
)
SELECT lang, CAST(rank AS BIGINT) AS rank, token, cnt
FROM r WHERE rank <= {k}
"""


def value_histogram_by_type_oracle(n_bins: int = 20, lo: float = -10.0,
                                   hi: float = 10.0) -> str:
    """Mirror of windows.value_histogram_by_type: fixed micros bin edges,
    integer bucket arithmetic, clipped edge bins."""
    import math
    lo_m = int(math.floor(lo * 1e6 + 0.5))
    hi_m = int(math.floor(hi * 1e6 + 0.5))
    span = hi_m - lo_m + 1
    return f"""
WITH b AS (
  SELECT event_type,
         LEAST(GREATEST((CAST(floor(value * 1e6 + 0.5) AS BIGINT)
                         - {lo_m}) * {n_bins} // {span}, 0),
               {n_bins - 1}) AS bucket
  FROM events)
SELECT event_type, bucket,
       CAST(CAST({lo_m} + bucket * {span} // {n_bins} AS BIGINT)
            AS DOUBLE) / 1e6 AS lo_edge,
       CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY event_type, bucket
"""


def dow_hour_heatmap_oracle() -> str:
    """Mirror of windows.dow_hour_heatmap (DuckDB dayofweek: 0=Sunday)."""
    return """
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
"""


def kg_degree_distribution_oracle(sf_dir: str) -> str:
    """Mirror of stages/graph.degree_distribution over the KG."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
adj AS (
  SELECT DISTINCT least(subj_id, obj_id) AS lo, greatest(subj_id, obj_id) AS hi
  FROM triples WHERE subj_id <> obj_id
),
bidir AS (
  SELECT lo AS node, hi AS peer FROM adj
  UNION
  SELECT hi, lo FROM adj
),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM bidir
        GROUP BY node)
SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree
"""


def training_manifest_oracle(budget_frac: float = 0.6,
                             pcts=(80, 10, 10), seed: int = 9) -> str:
    """Mirror of curation.training_manifest: the corpus_curate chain →
    min-id exact dedup among selected docs → md5 split → accounting."""
    acc = 0
    cuts = []
    for p in pcts:
        acc += p
        cuts.append(acc * 256 // 100)
    c0, c1 = f"{cuts[0]:02x}", f"{cuts[1]:02x}"
    return f"""
WITH sel AS ({corpus_curate_oracle(budget_frac)}),
docs2 AS (
  SELECT d.doc_id, d.text FROM documents d JOIN sel USING (doc_id)
),
grp AS (
  SELECT CAST(min(doc_id) AS BIGINT) AS doc_id FROM docs2 GROUP BY md5(text)
),
sur AS (
  SELECT g.doc_id, s.n_tokens FROM grp g JOIN sel s USING (doc_id)
),
a AS (
  SELECT CASE
           WHEN substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 2)
                < '{c0}' THEN 'train'
           WHEN substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 2)
                < '{c1}' THEN 'val'
           ELSE 'test' END AS split,
         n_tokens
  FROM sur)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM a GROUP BY split
"""


def kg_degree_assortativity_oracle(sf_dir: str) -> str:
    """Mirror of stages/graph.degree_assortativity over the KG: HUGEINT
    moments, num/(√a·√b) finish."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
adj AS (
  SELECT DISTINCT least(subj_id, obj_id) AS lo, greatest(subj_id, obj_id) AS hi
  FROM triples WHERE subj_id <> obj_id
),
bidir AS (
  SELECT lo AS a, hi AS b FROM adj
  UNION
  SELECT hi, lo FROM adj
),
deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS degree FROM bidir
        GROUP BY a),
xy AS (
  SELECT d1.degree AS x, d2.degree AS y
  FROM bidir e
  JOIN deg d1 ON d1.node = e.a
  JOIN deg d2 ON d2.node = e.b
),
mm AS (
  SELECT CAST(count(*) AS HUGEINT) AS m,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(x * y) AS HUGEINT) AS sxy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx,
         CAST(SUM(y * y) AS HUGEINT) AS syy
  FROM xy
)
SELECT CAST(m AS BIGINT) AS m,
       CAST(m * sxy - sx * sy AS DOUBLE) AS num,
       CAST(m * sxy - sx * sy AS DOUBLE)
           / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
              * sqrt(CAST(m * syy - sy * sy AS DOUBLE))) AS r
FROM mm
"""


def source_dup_rates_oracle() -> str:
    """Mirror of dedup.source_dup_rates."""
    return """
WITH c AS (
  SELECT source, md5(text) AS h, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY source, md5(text)
)
SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_distinct,
       floor(CAST(SUM(n) - count(*) AS DOUBLE)
             / CAST(SUM(n) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS dup_rate
FROM c GROUP BY source
"""


def brand_price_summary_oracle(qs=(0.0, 0.25, 0.5, 0.75, 1.0)) -> str:
    """Per-brand five-number summary of p_retailprice for
    stages/quantiles.grouped_quantiles_cont — the flag_quantiles_cont
    CTE on the part dimension (q=0/1 interpolate to exact min/max)."""
    q_rows = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q, "
        f"CAST(floor({q} * 1e6 + 0.5) AS BIGINT) AS qm" for q in qs)
    return f"""
WITH base AS (
  SELECT p_brand AS grp,
         CAST(floor(p_retailprice * 1e6 + 0.5) AS BIGINT) AS vm
  FROM part
),
h AS (SELECT grp, vm, count(*) AS n FROM base GROUP BY grp, vm),
c AS (SELECT grp, vm, sum(n) OVER (PARTITION BY grp ORDER BY vm) AS cum
      FROM h),
params AS (SELECT grp, CAST(sum(n) AS BIGINT) AS n FROM h GROUP BY grp),
qs AS ({q_rows}),
pos AS (
  SELECT p.grp, q.q, q.qm * (p.n - 1) AS hm FROM params p, qs q
),
pick AS (
  SELECT grp, q, hm // 1000000 AS lo, hm % 1000000 AS frac FROM pos
),
el AS (
  SELECT p.grp, p.q, p.frac,
         (SELECT min(vm) FROM c WHERE c.grp = p.grp AND cum > p.lo) AS vlo,
         (SELECT min(vm) FROM c WHERE c.grp = p.grp
          AND cum > p.lo + CASE WHEN p.frac > 0 THEN 1 ELSE 0 END) AS vhi
  FROM pick p
)
SELECT grp AS p_brand, q,
       floor(((vlo + (frac * (vhi - vlo)) / 1e6) / 1e6) * 1e6 + 0.5) / 1e6
         AS value
FROM el
"""


def daily_type_mix_oracle() -> str:
    """Mirror of windows.daily_type_mix: per-day event-type counts and
    round6 within-day shares."""
    return """
WITH m AS (
  SELECT epoch_us(date_trunc('day', ts)) AS day_us, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), t AS (
  SELECT day_us, CAST(SUM(n) AS BIGINT) AS tot FROM m GROUP BY day_us
)
SELECT m.day_us, m.event_type, m.n,
       floor(CAST(m.n AS DOUBLE) / CAST(t.tot AS DOUBLE) * 1e6 + 0.5)
           / 1e6 AS share
FROM m JOIN t ON t.day_us = m.day_us
"""


def segment_priority_counts_oracle() -> str:
    """Mirror of relational.segment_priority_counts."""
    return """
SELECT c.c_mktsegment, o.o_orderpriority, CAST(count(*) AS BIGINT) AS n
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment, o.o_orderpriority
"""


def rollup_segment_priority_oracle() -> str:
    """Mirror of relational.rollup_segment_priority: GROUP BY ROLLUP with
    'ALL' standing in for the rolled-up dimension."""
    return """
SELECT COALESCE(c.c_mktsegment, 'ALL') AS c_mktsegment,
       COALESCE(o.o_orderpriority, 'ALL') AS o_orderpriority,
       CAST(count(*) AS BIGINT) AS n
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY ROLLUP(c.c_mktsegment, o.o_orderpriority)
"""


def event_context_pairs_oracle(k: int = 3) -> str:
    """Mirror of windows.event_context_pairs: self-join on row_number
    distance 1..k within the per-user (ts, event_id) order."""
    return f"""
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n
FROM o a JOIN o b ON b.user_id = a.user_id
                  AND b.rn > a.rn AND b.rn <= a.rn + {k}
GROUP BY a.event_type, b.event_type
"""


def weekly_active_users_oracle(window_days: int = 7) -> str:
    """Mirror of windows.weekly_active_users: a (day, user) active table,
    DAU per day, WAU per day via the trailing-window membership join
    (inner join keeps only days with actives — the engine's wday
    explosion also emits warm-up days past the data edge, which the
    inner join on DAU-days drops on both sides)."""
    w_us = window_days * 86_400_000_000
    return f"""
WITH au AS (
  SELECT DISTINCT (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
         user_id
  FROM events
), dau AS (
  SELECT day_us, CAST(count(*) AS BIGINT) AS dau FROM au GROUP BY day_us
), wau AS (
  SELECT d.day_us, CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
  FROM dau d JOIN au a
    ON a.day_us > d.day_us - {w_us} AND a.day_us <= d.day_us
  GROUP BY d.day_us
)
SELECT dau.day_us, dau.dau, wau.wau,
       floor(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS stickiness
FROM dau JOIN wau ON wau.day_us = dau.day_us
"""


def value_autocorr_oracle() -> str:
    """Mirror of windows.value_autocorr: LEAD pairs, int64 moment sums,
    the identical DOUBLE chain num/(√vx·√vy), round6."""
    return """
WITH p AS (
  SELECT user_id, CAST(floor(value * 1e3 + 0.5) AS BIGINT) AS x,
         LEAD(CAST(floor(value * 1e3 + 0.5) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
  FROM events
), q AS (SELECT x, y FROM p WHERE y IS NOT NULL),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM q
)
SELECT n AS n_pairs,
       floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             * 1e6 + 0.5) / 1e6 AS autocorr
FROM m
"""


def kg_clustering_oracle(sf_dir: str) -> str:
    """Mirror of stages/graph.clustering_coefficients over the KG:
    wedges joined against the edge set, the same 2·T/(d·(d−1)) round6
    chain, degree<2 nodes at cc=0."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
adj AS (
  SELECT DISTINCT least(subj_id, obj_id) AS lo, greatest(subj_id, obj_id) AS hi
  FROM triples WHERE subj_id <> obj_id
),
bidir AS (
  SELECT lo AS node, hi AS peer FROM adj
  UNION
  SELECT hi, lo FROM adj
),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM bidir
        GROUP BY node),
wedge AS (
  SELECT a.node, a.peer AS p1, b.peer AS p2
  FROM bidir a JOIN bidir b ON b.node = a.node AND b.peer > a.peer
),
tri AS (
  SELECT w.node, CAST(count(*) AS BIGINT) AS t
  FROM wedge w JOIN adj e ON e.lo = w.p1 AND e.hi = w.p2
  GROUP BY w.node
)
SELECT d.node, d.degree,
       CAST(coalesce(t.t, 0) AS BIGINT) AS triangles,
       CASE WHEN d.degree < 2 THEN 0.0
            ELSE floor(2.0 * coalesce(t.t, 0)
                       / (d.degree * (d.degree - 1)) * 1e6 + 0.5) / 1e6
       END AS cc
FROM deg d LEFT JOIN tri t ON t.node = d.node
"""


def pair_lift_oracle(min_support: int = 2, top_k: int = 50) -> str:
    """Mirror of basket.pair_lift on lineitem baskets: HUGEINT N·c(ab)
    over c(a)·c(b), round6; deterministic (n desc, a, b) top-k."""
    return f"""
WITH bi AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
), pr AS (
  SELECT a.item AS item_a, b.item AS item_b,
         CAST(count(*) AS BIGINT) AS n
  FROM bi a JOIN bi b ON b.basket = a.basket AND b.item > a.item
  GROUP BY a.item, b.item
  HAVING count(*) >= {min_support}
), topk AS (
  SELECT * FROM pr ORDER BY n DESC, item_a, item_b LIMIT {top_k}
), nb AS (SELECT CAST(count(DISTINCT basket) AS HUGEINT) AS n_baskets
          FROM bi),
mg AS (SELECT item, CAST(count(*) AS HUGEINT) AS c FROM bi GROUP BY item)
SELECT t.item_a, t.item_b, t.n,
       floor(CAST(nb.n_baskets * CAST(t.n AS HUGEINT) AS DOUBLE)
             / CAST(ma.c * mb.c AS DOUBLE) * 1e6 + 0.5) / 1e6 AS lift
FROM topk t, nb
JOIN mg ma ON ma.item = t.item_a
JOIN mg mb ON mb.item = t.item_b
"""


def shipping_delay_quantiles_oracle(qs=(0.25, 0.5, 0.75, 0.9)) -> str:
    """Mirror of relational.shipping_delay_quantiles: whole-day delays
    through the flag_quantiles_cont per-group interpolation CTE."""
    q_rows = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q, "
        f"CAST(floor({q} * 1e6 + 0.5) AS BIGINT) AS qm" for q in qs)
    return f"""
WITH base AS (
  SELECT o.o_orderpriority AS grp,
         CAST(floor(CAST((epoch_us(l.l_shipdate)
                          - epoch_us(o.o_orderdate)) // 86400000000
                         AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS vm
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
h AS (SELECT grp, vm, count(*) AS n FROM base GROUP BY grp, vm),
c AS (SELECT grp, vm, sum(n) OVER (PARTITION BY grp ORDER BY vm) AS cum
      FROM h),
params AS (SELECT grp, CAST(sum(n) AS BIGINT) AS n FROM h GROUP BY grp),
qs AS ({q_rows}),
pos AS (
  SELECT p.grp, q.q, q.qm * (p.n - 1) AS hm FROM params p, qs q
),
pick AS (
  SELECT grp, q, hm // 1000000 AS lo, hm % 1000000 AS frac FROM pos
),
el AS (
  SELECT p.grp, p.q, p.frac,
         (SELECT min(vm) FROM c WHERE c.grp = p.grp AND cum > p.lo) AS vlo,
         (SELECT min(vm) FROM c WHERE c.grp = p.grp
          AND cum > p.lo + CASE WHEN p.frac > 0 THEN 1 ELSE 0 END) AS vhi
  FROM pick p
)
SELECT grp AS o_orderpriority, q,
       floor(((vlo + (frac * (vhi - vlo)) / 1e6) / 1e6) * 1e6 + 0.5) / 1e6
         AS value
FROM el
"""


def mann_whitney_weekend_oracle() -> str:
    """Mirror of windows.mann_whitney_weekend: U in half-units via the
    midrank identity u2 = Σ_v c_we(v)·(2·prefix(<v) + c(v) + 1)
    − n2·(n2+1) over int64-millis tie classes (algebraically equal to the
    engine's bucketed pair count — both count 2 per strict win and 1 per
    tie), tie term t3 = Σ (c³ − c), and the tie-corrected normal z in the
    engine's DOUBLE op order."""
    return """
WITH x AS (
  SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we,
         CAST(floor(value * 1e3 + 0.5) AS BIGINT) AS vm
  FROM events
), c AS (
  SELECT vm, CAST(SUM(we) AS BIGINT) AS c_we,
         CAST(COUNT(*) - SUM(we) AS BIGINT) AS c_wd,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM x GROUP BY vm
), p AS (
  SELECT vm, c_we, c_wd, c,
         CAST(COALESCE(SUM(c) OVER (ORDER BY vm
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cl
  FROM c
), s AS (
  SELECT CAST(SUM(c_wd) AS BIGINT) AS n1,
         CAST(SUM(c_we) AS BIGINT) AS n2,
         CAST(SUM(c_we * (2 * cl + c + 1)) AS BIGINT) AS r2we,
         CAST(SUM(c * c * c - c) AS BIGINT) AS t3
  FROM p
)
SELECT n1 AS n_weekday, n2 AS n_weekend,
       CAST(r2we - n2 * (n2 + 1) AS BIGINT) AS u2_weekend,
       t3 AS tie_t3,
       CASE WHEN n1 = 0 OR n2 = 0 OR n1 + n2 < 2 THEN 0.0
            WHEN ((n1 + n2 + 1) - CAST(t3 AS DOUBLE)
                  / ((n1 + n2) * (n1 + n2 - 1))) <= 0 THEN 0.0
            ELSE floor(
              (r2we - n2 * (n2 + 1) - n1 * n2)
              / (2.0 * sqrt(CAST(n1 * n2 AS DOUBLE)
                  * ((n1 + n2 + 1) - CAST(t3 AS DOUBLE)
                     / ((n1 + n2) * (n1 + n2 - 1))) / 12.0))
              * 1e6 + 0.5) / 1e6 END AS z_stat
FROM s
"""


def weekend_effect_oracle() -> str:
    """Mirror of windows.weekend_effect: identical DOUBLE op order for
    the Welch chain on millis-int moments."""
    return """
WITH x AS (
  SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we,
         CAST(floor(value * 1e3 + 0.5) AS BIGINT) AS xm
  FROM events
), m AS (
  SELECT CAST(SUM(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN we = 0 THEN xm ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN we = 0 THEN xm * xm ELSE 0 END) AS BIGINT)
             AS ss1,
         CAST(SUM(CASE WHEN we = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN we = 1 THEN xm ELSE 0 END) AS BIGINT) AS s2,
         CAST(SUM(CASE WHEN we = 1 THEN xm * xm ELSE 0 END) AS BIGINT)
             AS ss2
  FROM x
)
, w AS (
  SELECT n1, n2, s1, s2,
         (CAST(ss1 AS DOUBLE)
          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
            / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)
         / CAST(n1 AS DOUBLE)
         + (CAST(ss2 AS DOUBLE)
            - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
              / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)
         / CAST(n2 AS DOUBLE) AS se2
  FROM m
)
SELECT n1 AS n_weekday, n2 AS n_weekend,
       floor(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 1e3 * 1e6 + 0.5)
           / 1e6 AS mean_weekday,
       floor(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 1e3 * 1e6 + 0.5)
           / 1e6 AS mean_weekend,
       -- zero-variance guard mirrors windows.weekend_effect: se = 0 -> t = 0
       CASE WHEN se2 <= 0 THEN 0.0 ELSE
       floor((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
             / sqrt(se2)
             * 1e6 + 0.5) / 1e6 END AS t_stat
FROM w
"""


def kg_metapaths_oracle(sf_dir: str) -> str:
    """Mirror of stages/graph.metapath_counts over the canonical
    adjacency: directed 2-path self-join on the middle vertex."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
adjn AS (
  SELECT subj_id, obj_id,
         min(subj_type) AS subj_type, min(obj_type) AS obj_type
  FROM triples GROUP BY subj_id, pred, obj_id
)
SELECT a.subj_type, a.obj_type AS mid_type, b.obj_type,
       CAST(count(*) AS BIGINT) AS n_paths
FROM adjn a JOIN adjn b ON b.subj_id = a.obj_id
GROUP BY a.subj_type, a.obj_type, b.obj_type
"""


def channel_ltv_quantiles_oracle(qs=(0.25, 0.5, 0.75, 0.9),
                                 purchase_type: str = "purchase") -> str:
    """Mirror of windows.channel_ltv_quantiles: first-touch channel per
    user, purchase micros sums as the quantile values, the
    grouped-percentile_cont micro-interpolation CTE."""
    q_rows = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q, "
        f"CAST(floor({q} * 1e6 + 0.5) AS BIGINT) AS qm" for q in qs)
    return f"""
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                  CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
           FROM events),
f AS (SELECT user_id, event_type AS first_type FROM e
      QUALIFY row_number() OVER (PARTITION BY user_id
                                 ORDER BY us, event_id) = 1),
p AS (SELECT user_id,
             CAST(COALESCE(SUM(CASE WHEN event_type = '{purchase_type}'
                                    THEN vm END), 0) AS BIGINT) AS rm
      FROM e GROUP BY user_id),
base AS (SELECT f.first_type AS grp, p.rm AS vm
         FROM f JOIN p USING (user_id)),
h AS (SELECT grp, vm, count(*) AS n FROM base GROUP BY grp, vm),
c AS (SELECT grp, vm, sum(n) OVER (PARTITION BY grp ORDER BY vm) AS cum
      FROM h),
params AS (SELECT grp, CAST(sum(n) AS BIGINT) AS n FROM h GROUP BY grp),
qs AS ({q_rows}),
pos AS (
  SELECT p.grp, q.q, q.qm * (p.n - 1) AS hm FROM params p, qs q
),
pick AS (
  SELECT grp, q, hm // 1000000 AS lo, hm % 1000000 AS frac FROM pos
),
el AS (
  SELECT p.grp, p.q, p.frac,
         (SELECT min(vm) FROM c WHERE c.grp = p.grp AND cum > p.lo) AS vlo,
         (SELECT min(vm) FROM c WHERE c.grp = p.grp
          AND cum > p.lo + CASE WHEN p.frac > 0 THEN 1 ELSE 0 END) AS vhi
  FROM pick p
)
SELECT grp AS first_type, q,
       floor(((vlo + (frac * (vhi - vlo)) / 1e6) / 1e6) * 1e6 + 0.5) / 1e6
         AS value
FROM el
"""


def user_value_bands_oracle(qs=(0.1, 0.9)) -> str:
    """Per-user interpolated value quantiles — the flag_quantiles_cont
    CTE keyed by user_id on micros-quantized values."""
    q_rows = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q, "
        f"CAST(floor({q} * 1e6 + 0.5) AS BIGINT) AS qm" for q in qs)
    return f"""
WITH base AS (
  SELECT user_id AS grp,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
  FROM events
),
h AS (SELECT grp, vm, count(*) AS n FROM base GROUP BY grp, vm),
c AS (SELECT grp, vm, sum(n) OVER (PARTITION BY grp ORDER BY vm) AS cum
      FROM h),
params AS (SELECT grp, CAST(sum(n) AS BIGINT) AS n FROM h GROUP BY grp),
qs AS ({q_rows}),
pos AS (
  SELECT p.grp, q.q, q.qm * (p.n - 1) AS hm FROM params p, qs q
),
pick AS (
  SELECT grp, q, hm // 1000000 AS lo, hm % 1000000 AS frac FROM pos
),
el AS (
  SELECT p.grp, p.q, p.frac,
         (SELECT min(vm) FROM c WHERE c.grp = p.grp AND cum > p.lo) AS vlo,
         (SELECT min(vm) FROM c WHERE c.grp = p.grp
          AND cum > p.lo + CASE WHEN p.frac > 0 THEN 1 ELSE 0 END) AS vhi
  FROM pick p
)
SELECT grp AS user_id, q,
       floor(((vlo + (frac * (vhi - vlo)) / 1e6) / 1e6) * 1e6 + 0.5) / 1e6
         AS value
FROM el
"""


def pricing_charge_summary_oracle() -> str:
    """Mirror of relational.pricing_charge_summary: Q1's charge + avg
    columns, micros sums and floor(sum/n+0.5)/1e6 averages."""
    return """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(floor(l_extendedprice * (1.0 - l_discount)
                      * (1.0 + l_tax) * 1e6 + 0.5) AS BIGINT)) / 1e6
           AS sum_charge,
       floor(CAST(SUM(CAST(floor(l_quantity * 1e6 + 0.5) AS BIGINT))
                  AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) / 1e6
           AS avg_qty,
       floor(CAST(SUM(CAST(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT))
                  AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) / 1e6
           AS avg_price,
       floor(CAST(SUM(CAST(floor(l_discount * 1e6 + 0.5) AS BIGINT))
                  AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) / 1e6
           AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def local_supplier_volume_oracle(region: str = "ASIA",
                                 year_start: str = "1996-01-01",
                                 year_end: str = "1997-01-01") -> str:
    """TPC-H Q5 proper — mirror of relational.local_supplier_volume
    (per-lineitem micros, customer nation = supplier nation, one region,
    one order year)."""
    return f"""
SELECT n.n_name,
       sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 1e6 + 0.5)
                AS BIGINT)) / 1e6 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey
  AND r.r_name = '{region}'
  AND o.o_orderdate >= TIMESTAMP '{year_start}'
  AND o.o_orderdate < TIMESTAMP '{year_end}'
GROUP BY n.n_name
"""


def volume_shipping_oracle(nation_a: str = "NATION_3",
                           nation_b: str = "NATION_8",
                           lo: str = "1996-01-01",
                           hi: str = "1998-01-01") -> str:
    """TPC-H Q7 proper — mirror of relational.volume_shipping."""
    return f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 1e6 + 0.5)
                AS BIGINT)) / 1e6 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = '{nation_a}' AND n2.n_name = '{nation_b}')
    OR (n1.n_name = '{nation_b}' AND n2.n_name = '{nation_a}'))
  AND l.l_shipdate >= TIMESTAMP '{lo}'
  AND l.l_shipdate < TIMESTAMP '{hi}'
GROUP BY supp_nation, cust_nation, l_year
"""


def product_type_profit_oracle(name_like: str = "gear") -> str:
    """TPC-H Q9 shape (no partsupp in this schema, so profit omits the
    supplycost term) — mirror of relational.product_type_profit."""
    return f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 1e6 + 0.5)
                AS BIGINT)) / 1e6 AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%{name_like}%'
GROUP BY nation, o_year
"""


def shipmode_priority_counts_oracle(delay_days: int = 90) -> str:
    """TPC-H Q12 shape (late/ontime buckets by ship−order delay, no
    shipmode column here) — mirror of relational.shipmode_priority_counts."""
    delay_us = delay_days * 86_400_000_000
    return f"""
SELECT CASE WHEN epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
            >= {delay_us} THEN 'late' ELSE 'ontime' END AS bucket,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY bucket
"""


def waiting_suppliers_oracle(status: str = "F",
                             min_suppliers: int = 2) -> str:
    """TPC-H Q21 shape (unique-latest supplier on multi-supplier finished
    orders; no receipt/commit dates here) — mirror of
    relational.waiting_suppliers."""
    return f"""
WITH f AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = '{status}'),
os AS (
  SELECT l.l_orderkey, l.l_suppkey, max(l.l_shipdate) AS smax
  FROM lineitem l JOIN f ON l.l_orderkey = f.o_orderkey
  GROUP BY l.l_orderkey, l.l_suppkey),
om AS (
  SELECT l_orderkey, max(smax) AS m, count(*) AS ns
  FROM os GROUP BY l_orderkey),
w AS (
  SELECT os.l_orderkey, min(os.l_suppkey) AS l_suppkey
  FROM os JOIN om USING (l_orderkey)
  WHERE om.ns >= {min_suppliers} AND os.smax = om.m
  GROUP BY os.l_orderkey HAVING count(*) = 1)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey
GROUP BY s.s_name
"""


def semantic_contamination_oracle(n_eval: int = 16,
                                  tau: float = 0.5) -> str:
    """Thresholded eval×train cosine scan — mirror of
    similarity.semantic_contamination over the vec_id split (eval =
    vec_id < n_eval, train = the rest); identical SQL_COSINE micros
    grid as the ANN oracles."""
    from deepkg_ray.functions.numeric import SQL_COSINE, SQL_EMB_MICROS
    cos = SQL_COSINE.format(a="q.qm", b="e.em")
    return f"""
WITH q AS (SELECT vec_id AS query_id,
                  {SQL_EMB_MICROS.format(e="embedding")} AS qm
           FROM embeddings WHERE vec_id < {n_eval}),
em AS (SELECT vec_id, {SQL_EMB_MICROS.format(e="embedding")} AS em
       FROM embeddings WHERE vec_id >= {n_eval})
SELECT q.query_id, e.vec_id, {cos} AS cosine
FROM q CROSS JOIN em e
WHERE {cos} >= {tau}
"""


def mixture_plan_oracle(weights: dict[str, float] | None = None,
                        budget: int = 200) -> str:
    """Mirror of textstats.mixture_plan: per-source quota =
    floor(budget·w), selection = first quota docs by (md5(doc_id),
    doc_id)."""
    weights = weights or {f"src{i}": 1.0 / 8 for i in range(8)}
    cases = " ".join(
        f"WHEN '{s}' THEN {int(budget * w)}" for s, w in weights.items())
    return f"""
WITH r AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn,
         CASE source {cases} ELSE 0 END AS quota
  FROM documents)
SELECT source, doc_id FROM r WHERE rn <= quota
"""


def cheapest_supplier_per_part_oracle(region: str = "EUROPE",
                                      ptype: str = "SMALL",
                                      max_size: int = 10,
                                      k: int = 100) -> str:
    """Mirror of relational.cheapest_supplier_per_part: TPC-H Q2's
    correlated MIN subquery over micros-exact lineitem prices."""
    return f"""
WITH elig_part AS (
  SELECT p_partkey, p_brand FROM part
  WHERE p_type = '{ptype}' AND p_size <= {max_size}
), elig_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{region}'
), costs AS (
  SELECT DISTINCT l_partkey, l_suppkey,
         CAST(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT) AS cost_micros
  FROM lineitem
  JOIN elig_part ON l_partkey = p_partkey
  JOIN elig_supp ON l_suppkey = s_suppkey
), mins AS (
  SELECT l_partkey, MIN(cost_micros) AS mc FROM costs GROUP BY l_partkey
)
SELECT s.s_acctbal, s.s_name, s.n_name,
       c.l_partkey AS p_partkey, p.p_brand,
       CAST(c.cost_micros AS DOUBLE) / 1e6 AS cost
FROM costs c
JOIN mins m ON c.l_partkey = m.l_partkey AND c.cost_micros = m.mc
JOIN elig_supp s ON c.l_suppkey = s.s_suppkey
JOIN elig_part p ON c.l_partkey = p.p_partkey
ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, c.l_partkey
LIMIT {k}
"""


def media_phash_oracle() -> str:
    """phash_hashes (P6 decode → integer DCT pHash through the actor pool)
    must reproduce the construction gold computed from the raw pixels."""
    from deepkg_ray.stages.multimodal import phash_gold_path
    return f"SELECT * FROM read_parquet('{phash_gold_path()}')"


def phash_near_dups_oracle(hamming_max: int = 6) -> str:
    """Brute-force XOR-popcount self-join over the pHash gold: the banded
    LSH plan is lossless for hamming_max < 8 (pigeonhole over 8×8-bit
    bands), so the two must agree exactly."""
    from deepkg_ray.stages.multimodal import phash_gold_path
    return f"""
WITH g AS (SELECT * FROM read_parquet('{phash_gold_path()}'))
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM g a JOIN g b ON a.media_id < b.media_id
WHERE bit_count(xor(a.phash, b.phash)) <= {hamming_max}
"""


def knn_graph_oracle(k: int = 5) -> str:
    """Brute-force mirror of stages/similarity.knn_graph: per vector the
    top-k round6 cosine neighbors (self excluded), rank ordered
    (cosine DESC, nbr id)."""
    from deepkg_ray.functions.numeric import SQL_COSINE, SQL_EMB_MICROS
    cos = SQL_COSINE.format(a="a.em", b="b.em")
    return f"""
WITH em AS (SELECT vec_id, {SQL_EMB_MICROS.format(e="embedding")} AS em
            FROM embeddings),
s AS (
  SELECT a.vec_id, b.vec_id AS nbr_id, {cos} AS cosine
  FROM em a JOIN em b ON a.vec_id <> b.vec_id
), r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
                 ORDER BY cosine DESC, nbr_id) - 1 AS INTEGER) AS rank
  FROM s
)
SELECT vec_id, nbr_id, cosine, rank FROM r WHERE rank < {k}
"""


def bigram_cond_entropy_oracle() -> str:
    """Mirror of textstats.bigram_cond_entropy: per-source bigram counts
    and w1 margins, micros-quantized c·ln(c/c1) terms, one double
    chain."""
    return """
WITH toks AS (
  SELECT source, CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(lower(trim(text)), '\\s+') END AS ws
  FROM documents
), big AS (
  SELECT source, ws[i] AS w1, ws[i+1] AS w2
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) g
), c AS (SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS c
         FROM big GROUP BY 1, 2, 3),
m AS (SELECT source, w1, CAST(SUM(c) AS BIGINT) AS c1
      FROM c GROUP BY 1, 2),
t AS (SELECT c.source,
             CAST(SUM(CAST(floor(c.c * ln(c.c / CAST(m.c1 AS DOUBLE))
                                 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s,
             CAST(SUM(c.c) AS BIGINT) AS tt
      FROM c JOIN m ON m.source = c.source AND m.w1 = c.w1
      GROUP BY c.source)
SELECT source, tt AS n_bigrams,
       -(CAST(s AS DOUBLE) / 1e6 / tt) AS entropy
FROM t
"""


def heaps_fit_oracle(stride: int = 1) -> str:
    """Mirror of textstats.heaps_fit: bucket token sums + per-token min
    first doc, calendar-complete bucket cumsums, ln-micros OLS."""
    return f"""
WITH tok AS (SELECT doc_id,
                    unnest(string_split_regex(lower(trim(text)),
                                              '\\s+')) AS w
             FROM documents WHERE trim(text) <> ''),
nt AS (SELECT doc_id // {stride} AS b, CAST(count(*) AS BIGINT) AS nt
       FROM tok GROUP BY 1),
fd AS (SELECT w, min(doc_id) AS fdoc FROM tok GROUP BY w),
vn AS (SELECT fdoc // {stride} AS b, CAST(count(*) AS BIGINT) AS vnew
       FROM fd GROUP BY 1),
mb AS (SELECT greatest((SELECT max(b) FROM nt),
                       (SELECT max(b) FROM vn)) AS m),
bs AS (SELECT unnest(generate_series(0, (SELECT m FROM mb))) AS b),
c AS (SELECT bs.b,
             SUM(COALESCE(nt.nt, 0)) OVER (ORDER BY bs.b) AS nn,
             SUM(COALESCE(vn.vnew, 0)) OVER (ORDER BY bs.b) AS vv
      FROM bs LEFT JOIN nt USING (b) LEFT JOIN vn USING (b)),
p AS (SELECT CAST(floor(ln(nn) * 1e6 + 0.5) AS BIGINT) AS x,
             CAST(floor(ln(vv) * 1e6 + 0.5) AS BIGINT) AS y
      FROM c WHERE nn > 0),
m AS (SELECT CAST(count(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM p),
sl AS (SELECT n, sx, sy,
              CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
       FROM m)
SELECT n AS n_points, slope,
       (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / n / 1e6
         AS intercept
FROM sl
"""


def knn_mutuality_oracle(k: int = 5) -> str:
    """Mirror of similarity.knn_mutuality: knn_graph_oracle's edge CTE
    left-joined to its own reverse, per-rank counts + round6 share."""
    from deepkg_ray.functions.numeric import SQL_COSINE, SQL_EMB_MICROS
    cos = SQL_COSINE.format(a="a.em", b="b.em")
    return f"""
WITH em AS (SELECT vec_id, {SQL_EMB_MICROS.format(e="embedding")} AS em
            FROM embeddings),
s AS (
  SELECT a.vec_id, b.vec_id AS nbr_id, {cos} AS cosine
  FROM em a JOIN em b ON a.vec_id <> b.vec_id
), r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
                 ORDER BY cosine DESC, nbr_id) - 1 AS INTEGER) AS rank
  FROM s
), g AS (SELECT vec_id, nbr_id, rank FROM r WHERE rank < {k})
SELECT CAST(g.rank AS BIGINT) AS rank, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN g2.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_mutual,
       floor(SUM(CASE WHEN g2.vec_id IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS share
FROM g LEFT JOIN g g2
  ON g2.vec_id = g.nbr_id AND g2.nbr_id = g.vec_id
GROUP BY g.rank
"""


def rake_keywords_oracle(k: int = 50) -> str:
    """Mirror of stages/textstats.rake_keywords: RAKE phrase segmentation
    as a cumsum-of-stopwords gaps-and-islands, word score deg/freq rounded
    to micros in double, phrase score the integer micros sum."""
    from deepkg_ray.stages.textstats import RAKE_STOPWORDS
    stops = ", ".join(f"'{w}'" for w in sorted(RAKE_STOPWORDS))
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tl
  FROM documents WHERE trim(text) <> ''
), pt AS (
  SELECT doc_id, u.z.pos AS pos, u.z.tok AS tok
  FROM toks, unnest(list_transform(tl, (x, i) -> {{'tok': x, 'pos': i}})) u(z)
), m AS (
  SELECT doc_id, pos, tok,
         CASE WHEN tok IN ({stops}) THEN 1 ELSE 0 END AS stop
  FROM pt
), isl AS (
  SELECT *, SUM(stop) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM m
), pw AS (
  SELECT doc_id, grp, pos, tok FROM isl WHERE stop = 0
), ph AS (
  SELECT doc_id, grp, string_agg(tok, ' ' ORDER BY pos) AS phrase,
         CAST(count(*) AS BIGINT) AS plen
  FROM pw GROUP BY doc_id, grp
), wstat AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(plen) AS BIGINT) AS deg
  FROM pw JOIN ph USING (doc_id, grp) GROUP BY tok
), wscore AS (
  SELECT tok, CAST(floor(CAST(deg AS DOUBLE) / freq * 1e6 + 0.5) AS BIGINT)
           AS sm
  FROM wstat
), pscore AS (
  SELECT ph.doc_id, ph.grp, ph.phrase,
         CAST(SUM(ws.sm) AS BIGINT) AS s_micros
  FROM pw JOIN ph USING (doc_id, grp) JOIN wscore ws ON ws.tok = pw.tok
  GROUP BY ph.doc_id, ph.grp, ph.phrase
), agg AS (
  SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
         MIN(s_micros) AS s_micros
  FROM pscore GROUP BY phrase
)
SELECT phrase, n_occurrences, CAST(s_micros AS DOUBLE) / 1e6 AS score
FROM agg ORDER BY score DESC, phrase LIMIT {k}
"""


def mmr_select_oracle(query_id: int = 0, k: int = 8, window: int = 50,
                      lam_micros: int = 500_000) -> str:
    """Mirror of similarity.mmr_select: integer-micros relevance vs the
    query vector, top-``window`` rerank pool, then the k-step MMR greedy
    UNROLLED as one CTE pair per step (the graph-family unrolled-CTE
    pattern) — score = lam·rel_m − (1e6−lam)·max sim_m to the selected
    set, ties → smaller vec_id, empty-set similarity term 0."""
    from deepkg_ray.functions.numeric import SQL_EMB_MICROS
    lm = int(lam_micros)
    em = SQL_EMB_MICROS.format(e="embedding")
    cosm = ("CAST(floor(list_dot_product({a}, {b}) / "
            "greatest(sqrt(list_dot_product({a}, {a})) * "
            "sqrt(list_dot_product({b}, {b})), 1.0) * 1e6 + 0.5) "
            "AS BIGINT)")
    parts = [f"""
WITH em AS (SELECT vec_id, {em} AS em FROM embeddings),
q AS (SELECT em FROM em WHERE vec_id = {query_id}),
rel AS (SELECT e.vec_id, {cosm.format(a='e.em', b='q.em')} AS rel_m
        FROM em e, q),
win AS MATERIALIZED (SELECT r.vec_id, r.rel_m, e.em
        FROM rel r JOIN em e USING (vec_id)
        WHERE r.vec_id <> {query_id}
        ORDER BY r.rel_m DESC, r.vec_id LIMIT {window}),
pairs AS MATERIALIZED (SELECT a.vec_id AS a, b.vec_id AS b,
                 {cosm.format(a='a.em', b='b.em')} AS sim_m
          FROM win a JOIN win b ON a.vec_id <> b.vec_id),
s1 AS MATERIALIZED (SELECT vec_id, rel_m,
       CAST({lm} AS BIGINT) * rel_m AS score
       FROM win ORDER BY score DESC, vec_id LIMIT 1),
sel1 AS MATERIALIZED (SELECT vec_id FROM s1)"""]
    for i in range(2, k + 1):
        parts.append(f""",
s{i} AS MATERIALIZED (SELECT w.vec_id, w.rel_m,
                CAST({lm} AS BIGINT) * w.rel_m
                - CAST({10**6 - lm} AS BIGINT)
                  * (SELECT max(p.sim_m) FROM pairs p
                     WHERE p.a = w.vec_id
                       AND p.b IN (SELECT vec_id FROM sel{i - 1}))
                  AS score
         FROM win w
         WHERE w.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
         ORDER BY score DESC, vec_id LIMIT 1),
sel{i} AS MATERIALIZED (SELECT vec_id FROM sel{i - 1}
           UNION ALL SELECT vec_id FROM s{i})""")
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({i - 1} AS INTEGER) AS rank, vec_id, rel_m, score "
        f"FROM s{i}" for i in range(1, k + 1))
    return "".join(parts) + "\n" + unions + "\nORDER BY rank"


def distinct_ngram_diversity_oracle() -> str:
    """Mirror of textstats.distinct_ngram_diversity (ns=(1,2)): the
    bigram_counts tokenization (lower/trim, \\s+ split, space-joined
    bigrams), distinct + total per (source, n), one round6 ratio."""
    return """
WITH toks AS (
  SELECT source,
         CASE WHEN trim(text)='' THEN []
              ELSE string_split_regex(lower(trim(text)), '\\s+') END AS ws
  FROM documents
), uni AS (
  SELECT source, unnest(ws) AS g FROM toks
), big AS (
  SELECT source, ws[i] || ' ' || ws[i+1] AS g
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) t
), cells AS (
  SELECT source, CAST(1 AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS total,
         CAST(count(DISTINCT g) AS BIGINT) AS n_distinct
  FROM uni GROUP BY source
  UNION ALL
  SELECT source, CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
         CAST(count(DISTINCT g) AS BIGINT)
  FROM big GROUP BY source
)
SELECT source, n, total, n_distinct,
       CASE WHEN total > 0 THEN
         floor(n_distinct / CAST(greatest(total, 1) AS DOUBLE)
               * 1e6 + 0.5) / 1e6
       ELSE 0.0 END AS ratio
FROM cells
"""


def audio_spectral_oracle() -> str:
    """audio_spectral (WAV decode → power-spectrum stats) must reproduce
    the construction gold computed from the raw samples."""
    from deepkg_ray.stages.multimodal import spectral_gold_path
    return f"SELECT * FROM read_parquet('{spectral_gold_path()}')"


def kg_temporal_linkpred_oracle(sf_dir: str, min_cn: int = 2) -> str:
    """Mirror of stages/graph.temporal_linkpred_eval: pair-level min
    first-observation µs, integer-midpoint cutoff, the
    kg_linkpred_scores wedge derivation over the TRAIN pairs,
    appeared-after labels, and the exact doubled-rank AUC
    (roc_auc_oracle's histogram convention) on the cn score."""
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
tr AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us
  FROM read_parquet('{_transcripts_glob(sf_dir)}')
),
es AS (
  SELECT x.subj_id, x.obj_id, CAST(min(tr.ts_us) AS BIGINT) AS first_us
  FROM triples x JOIN tr
    ON tr.conv_id = x.conv_id AND tr.turn_idx = x.turn_idx
  WHERE x.subj_id <> x.obj_id
  GROUP BY x.subj_id, x.obj_id
),
pfirst AS (
  SELECT least(subj_id, obj_id) AS lo, greatest(subj_id, obj_id) AS hi,
         CAST(min(first_us) AS BIGINT) AS first_us
  FROM es GROUP BY 1, 2
),
cut AS (SELECT (min(first_us) + max(first_us)) // 2 AS c FROM pfirst),
train AS (SELECT lo, hi FROM pfirst, cut WHERE first_us < c),
aft AS (SELECT lo, hi FROM pfirst, cut WHERE first_us >= c),
bidir AS (SELECT lo AS node, hi AS peer FROM train
          UNION SELECT hi, lo FROM train),
deg AS (SELECT node, count(*) AS degree FROM bidir GROUP BY node),
w AS (SELECT b.node, b.peer FROM bidir b JOIN deg d USING (node)
      WHERE d.degree >= 2),
pairs AS (SELECT a.peer AS e1, b.peer AS e2
          FROM w a JOIN w b ON a.node = b.node AND a.peer < b.peer),
cand AS (SELECT e1, e2, CAST(count(*) AS BIGINT) AS cn
         FROM pairs GROUP BY e1, e2 HAVING count(*) >= {min_cn}),
cand2 AS (SELECT c.* FROM cand c
          WHERE NOT EXISTS (SELECT 1 FROM train t
                            WHERE t.lo = c.e1 AND t.hi = c.e2)),
lab AS (SELECT c.cn,
               CASE WHEN a.lo IS NOT NULL THEN 1 ELSE 0 END AS pos
        FROM cand2 c LEFT JOIN aft a
          ON a.lo = c.e1 AND a.hi = c.e2),
hist AS (SELECT cn, CAST(SUM(pos) AS BIGINT) AS p,
                CAST(SUM(1 - pos) AS BIGINT) AS q
         FROM lab GROUP BY cn),
o AS (SELECT cn, p, q,
             CAST(COALESCE(SUM(q) OVER (ORDER BY cn
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS qb
      FROM hist),
agg AS (SELECT CAST(COALESCE(SUM(p), 0) AS BIGINT) AS n_pos,
               CAST(COALESCE(SUM(q), 0) AS BIGINT) AS n_neg,
               CAST(COALESCE(SUM(p * (2 * qb + q)), 0) AS BIGINT)
                   AS auc_num2
        FROM o)
SELECT cut.c AS cutoff_us,
       (SELECT CAST(count(*) AS BIGINT) FROM train) AS n_train_pairs,
       (SELECT CAST(count(*) AS BIGINT) FROM aft) AS n_new_pairs,
       agg.n_pos + agg.n_neg AS n_candidates,
       agg.n_pos, agg.n_neg, agg.auc_num2,
       CASE WHEN agg.n_pos > 0 AND agg.n_neg > 0 THEN
         CAST(agg.auc_num2 AS DOUBLE)
         / (2.0 * CAST(agg.n_pos AS DOUBLE) * CAST(agg.n_neg AS DOUBLE))
       ELSE 0.0 END AS auc
FROM cut, agg
"""


def kg_temporal_ranking_oracle(sf_dir: str, min_cn: int = 1,
                               ks=(1, 5, 10)) -> str:
    """Mirror of stages/graph.temporal_linkpred_ranking: the temporal
    split + wedge candidates of kg_temporal_linkpred_oracle (min_cn=1),
    candidates exploded to (endpoint, partner, cn) sides, per-new-pair
    rank = 1 + better-candidates count under (cn desc, partner asc),
    exact micros reciprocal ranks, one round6 per reported rate."""
    ks = tuple(sorted(set(int(k) for k in ks)))
    hit_cols = ",\n       ".join(
        f"(SELECT CAST(count(*) AS BIGINT) FROM rnk WHERE rank <= {k}) "
        f"AS n_hits{k},\n       "
        f"floor((SELECT count(*) FROM rnk WHERE rank <= {k})"
        f" / CAST((SELECT count(*) FROM aft) AS DOUBLE) * 1e6 + 0.5)"
        f" / 1e6 AS hits{k}" for k in ks)
    return f"""
WITH {dict_values_cte()},
{transcripts_cte(sf_dir)},
{_triples_cte(sf_dir)},
tr AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us
  FROM read_parquet('{_transcripts_glob(sf_dir)}')
),
es AS (
  SELECT x.subj_id, x.obj_id, CAST(min(tr.ts_us) AS BIGINT) AS first_us
  FROM triples x JOIN tr
    ON tr.conv_id = x.conv_id AND tr.turn_idx = x.turn_idx
  WHERE x.subj_id <> x.obj_id
  GROUP BY x.subj_id, x.obj_id
),
pfirst AS (
  SELECT least(subj_id, obj_id) AS lo, greatest(subj_id, obj_id) AS hi,
         CAST(min(first_us) AS BIGINT) AS first_us
  FROM es GROUP BY 1, 2
),
cut AS (SELECT (min(first_us) + max(first_us)) // 2 AS c FROM pfirst),
train AS (SELECT lo, hi FROM pfirst, cut WHERE first_us < c),
aft AS (SELECT lo, hi FROM pfirst, cut WHERE first_us >= c),
bidir AS (SELECT lo AS node, hi AS peer FROM train
          UNION SELECT hi, lo FROM train),
deg AS (SELECT node, count(*) AS degree FROM bidir GROUP BY node),
w AS (SELECT b.node, b.peer FROM bidir b JOIN deg d USING (node)
      WHERE d.degree >= 2),
pairs AS (SELECT a.peer AS e1, b.peer AS e2
          FROM w a JOIN w b ON a.node = b.node AND a.peer < b.peer),
cand AS (SELECT e1, e2, CAST(count(*) AS BIGINT) AS cn
         FROM pairs GROUP BY e1, e2 HAVING count(*) >= {min_cn}),
cand2 AS MATERIALIZED (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM train t
                    WHERE t.lo = c.e1 AND t.hi = c.e2)),
side AS MATERIALIZED (
  SELECT e1 AS node, e2 AS partner, cn FROM cand2
  UNION ALL SELECT e2, e1, cn FROM cand2),
ev AS MATERIALIZED (
  SELECT a.lo, a.hi, s.partner, s.cn
  FROM aft a JOIN side s ON s.node = a.lo),
tgt AS (SELECT lo, hi, cn AS cn_true FROM ev WHERE partner = hi),
rnk AS MATERIALIZED (
  SELECT t.lo, t.hi,
         1 + COALESCE((SELECT count(*) FROM ev e
                       WHERE e.lo = t.lo AND e.hi = t.hi
                         AND (e.cn > t.cn_true
                              OR (e.cn = t.cn_true
                                  AND e.partner < t.hi))), 0) AS rank
  FROM tgt t)
SELECT cut.c AS cutoff_us,
       (SELECT CAST(count(*) AS BIGINT) FROM aft) AS n_eval,
       (SELECT CAST(count(*) AS BIGINT) FROM rnk) AS n_ranked,
       (SELECT CAST(COALESCE(SUM(CAST(floor(1e6 / rank + 0.5)
                                      AS BIGINT)), 0) AS BIGINT)
        FROM rnk) AS rr_micros,
       floor((SELECT COALESCE(SUM(floor(1e6 / rank + 0.5)), 0) FROM rnk)
             / 1e6 / (SELECT count(*) FROM aft) * 1e6 + 0.5) / 1e6
           AS mrr,
       {hit_cols}
FROM cut
"""


def kg_temporal_calibration_oracle(sf_dir: str, min_cn: int = 2) -> str:
    """Mirror of stages/graph.temporal_linkpred_calibration: the
    kg_temporal_linkpred_oracle derivation stopped at the per-cn
    histogram, one round6 rate per row."""
    base = kg_temporal_linkpred_oracle(sf_dir, min_cn)
    head, _sep, _tail = base.partition("o AS (SELECT cn, p, q,")
    return head + """calib AS (
  SELECT cn, CAST(n AS BIGINT) AS n, CAST(p AS BIGINT) AS n_pos,
         floor(p / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS pos_rate
  FROM (SELECT cn, p + q AS n, p FROM hist))
SELECT cn, n, n_pos, pos_rate FROM calib
"""


def join_size_audit_oracle() -> str:
    """Mirror of pipelines/relational.join_size_audit: per-key count
    tables for both sides, exact Σ cnt_l·cnt_r join-size product."""
    return """
WITH l AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS cnt
           FROM orders GROUP BY 1),
r AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1),
m AS (SELECT l.cnt AS cl, r.cnt AS cr FROM l JOIN r USING (k))
SELECT (SELECT CAST(SUM(cnt) AS BIGINT) FROM l) AS n_left,
       (SELECT CAST(SUM(cnt) AS BIGINT) FROM r) AS n_right,
       (SELECT CAST(count(*) AS BIGINT) FROM l) AS n_keys_left,
       (SELECT CAST(count(*) AS BIGINT) FROM r) AS n_keys_right,
       CAST(count(*) AS BIGINT) AS n_keys_common,
       CAST(COALESCE(SUM(cl * cr), 0) AS BIGINT) AS est_join_rows
FROM m
"""


def cep_pattern_oracle(a_type: str = "view", b_type: str = "click",
                       c_type: str = "purchase",
                       window_us: int = 3_600_000_000) -> str:
    """Mirror of windows.cep_pattern_matches: per A event the first
    later-(ts, event_id) C of the same user within the window (LATERAL
    top-1), B count strictly between under the same total order,
    per-user rollup over ALL users."""
    return f"""
WITH e AS MATERIALIZED (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
  FROM events
),
u AS (SELECT DISTINCT user_id FROM e),
a AS (SELECT * FROM e WHERE event_type = '{a_type}'),
m AS MATERIALIZED (
  SELECT a.user_id, a.ts_us AS a_ts, a.event_id AS a_id, f.c_ts, f.c_id
  FROM a LEFT JOIN LATERAL (
    SELECT c.ts_us AS c_ts, c.event_id AS c_id
    FROM e c
    WHERE c.user_id = a.user_id AND c.event_type = '{c_type}'
      AND (c.ts_us > a.ts_us
           OR (c.ts_us = a.ts_us AND c.event_id > a.event_id))
    ORDER BY c.ts_us, c.event_id LIMIT 1) f ON TRUE
),
mb AS MATERIALIZED (
  SELECT m.user_id, m.a_id,
         CASE WHEN m.c_ts IS NOT NULL
                   AND m.c_ts - m.a_ts <= {window_us}
              THEN 1 ELSE 0 END AS in_win,
         CASE WHEN m.c_ts IS NOT NULL
                   AND m.c_ts - m.a_ts <= {window_us} THEN
           (SELECT count(*) FROM e b
            WHERE b.user_id = m.user_id
              AND b.event_type = '{b_type}'
              AND (b.ts_us > m.a_ts
                   OR (b.ts_us = m.a_ts AND b.event_id > m.a_id))
              AND (b.ts_us < m.c_ts
                   OR (b.ts_us = m.c_ts AND b.event_id < m.c_id)))
         ELSE 0 END AS nb
  FROM m
)
SELECT u.user_id,
       CAST(count(mb.a_id) AS BIGINT) AS n_a,
       CAST(COALESCE(SUM(CASE WHEN mb.in_win = 1 AND mb.nb >= 1
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_matched,
       CAST(COALESCE(SUM(CASE WHEN mb.in_win = 1 AND mb.nb >= 1
                              THEN mb.nb ELSE 0 END), 0) AS BIGINT)
           AS n_b_in_matches
FROM u LEFT JOIN mb USING (user_id)
GROUP BY u.user_id
"""


def neyman_allocation_oracle(k: int = 1000) -> str:
    """Mirror of curation.neyman_allocation: integer length moments per
    source, the same double op chain for std/weight/share, largest-
    remainder seats (floor + rank by fractional part desc, source asc)."""
    return f"""
WITH m AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(length(text)) AS BIGINT) AS s1,
         CAST(SUM(CAST(length(text) AS BIGINT)
                  * CAST(length(text) AS BIGINT)) AS BIGINT) AS s2
  FROM documents GROUP BY source
),
w AS (
  SELECT source, n,
         sqrt(greatest(CASE WHEN n > 1 THEN
           (CAST(s2 AS DOUBLE)
            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
              / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
         ELSE 0.0 END, 0.0)) AS std
  FROM m
),
ww AS (SELECT source, n, std, CAST(n AS DOUBLE) * std AS wt FROM w),
t AS (SELECT SUM(wt) AS tot FROM ww),
ex AS (
  SELECT ww.source, ww.n, ww.std, ww.wt,
         CASE WHEN t.tot > 0 THEN {k} * (ww.wt / t.tot) ELSE 0.0 END
             AS exact
  FROM ww, t
),
b AS (
  SELECT source, n, std, wt, exact,
         CAST(floor(exact) AS BIGINT) AS base,
         exact - floor(exact) AS frac
  FROM ex
),
r AS (
  SELECT *, row_number() OVER (ORDER BY frac DESC, source) AS rk,
         (SELECT {k} - SUM(base) FROM b) AS rem
  FROM b
)
SELECT source, n AS n_docs,
       floor(std * 1e6 + 0.5) / 1e6 AS std_len,
       floor(wt * 1e6 + 0.5) / 1e6 AS weight,
       CAST(base + CASE WHEN rk <= rem THEN 1 ELSE 0 END AS BIGINT)
           AS alloc
FROM r
"""


def cep_absence_oracle(a_type: str = "signup", n_type: str = "error",
                       c_type: str = "purchase",
                       window_us: int = 3_600_000_000) -> str:
    """Mirror of windows.cep_absence_matches: cep_pattern_oracle's
    LATERAL first-C derivation, match iff the between-count of N-type
    events is ZERO (blocked iff positive)."""
    return f"""
WITH e AS MATERIALIZED (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
  FROM events
),
u AS (SELECT DISTINCT user_id FROM e),
a AS (SELECT * FROM e WHERE event_type = '{a_type}'),
m AS MATERIALIZED (
  SELECT a.user_id, a.ts_us AS a_ts, a.event_id AS a_id, f.c_ts, f.c_id
  FROM a LEFT JOIN LATERAL (
    SELECT c.ts_us AS c_ts, c.event_id AS c_id
    FROM e c
    WHERE c.user_id = a.user_id AND c.event_type = '{c_type}'
      AND (c.ts_us > a.ts_us
           OR (c.ts_us = a.ts_us AND c.event_id > a.event_id))
    ORDER BY c.ts_us, c.event_id LIMIT 1) f ON TRUE
),
mb AS MATERIALIZED (
  SELECT m.user_id, m.a_id,
         CASE WHEN m.c_ts IS NOT NULL
                   AND m.c_ts - m.a_ts <= {window_us}
              THEN 1 ELSE 0 END AS in_win,
         CASE WHEN m.c_ts IS NOT NULL
                   AND m.c_ts - m.a_ts <= {window_us} THEN
           (SELECT count(*) FROM e b
            WHERE b.user_id = m.user_id
              AND b.event_type = '{n_type}'
              AND (b.ts_us > m.a_ts
                   OR (b.ts_us = m.a_ts AND b.event_id > m.a_id))
              AND (b.ts_us < m.c_ts
                   OR (b.ts_us = m.c_ts AND b.event_id < m.c_id)))
         ELSE 0 END AS nn
  FROM m
)
SELECT u.user_id,
       CAST(count(mb.a_id) AS BIGINT) AS n_a,
       CAST(COALESCE(SUM(CASE WHEN mb.in_win = 1 AND mb.nn = 0
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_matched,
       CAST(COALESCE(SUM(CASE WHEN mb.in_win = 1 AND mb.nn > 0
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_blocked
FROM u LEFT JOIN mb USING (user_id)
GROUP BY u.user_id
"""


def neyman_sample_oracle(k: int = 1000) -> str:
    """Mirror of curation.neyman_sample: the neyman_allocation seat
    derivation joined to per-source md5 ranks (the sample_exact_k order:
    md5_number_lower(id::VARCHAR), id)."""
    base = neyman_allocation_oracle(k)
    head, _sep, _tail = base.partition("SELECT source, n AS n_docs,")
    return head.rstrip() + ",\n" + f"""alloc AS (
  SELECT source,
         CAST(base + CASE WHEN rk <= rem THEN 1 ELSE 0 END AS BIGINT)
             AS alloc
  FROM r
),
ranked AS (
  SELECT d.source, d.doc_id,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY md5_number_lower(CAST(d.doc_id AS VARCHAR)),
                    d.doc_id) AS rn
  FROM documents d
)
SELECT ranked.source, ranked.doc_id
FROM ranked JOIN alloc USING (source)
WHERE ranked.rn <= alloc.alloc
"""


def compression_ratio_oracle(sf_dir: str) -> str:
    """compression_ratio's distributed path must reproduce the
    sequential driver-side gold pass (zlib is not SQL-expressible; this
    is the multimodal plumbing-gold convention)."""
    from deepkg_ray.stages.textstats import compression_gold_path
    return (f"SELECT * FROM "
            f"read_parquet('{compression_gold_path(sf_dir)}')")


def kg_edge_proposals_oracle(sf_dir: str, min_cn: int = 2,
                             min_rate_micros: int = 250_000) -> str:
    """Mirror of stages/graph.kg_edge_proposals: the calibration
    histogram joined back onto the labeled candidates, rate-thresholded."""
    base = kg_temporal_linkpred_oracle(sf_dir, min_cn)
    head, _sep, _tail = base.partition("o AS (SELECT cn, p, q,")
    return head + f"""rates AS (
  SELECT cn, CAST(floor(p / CAST(p + q AS DOUBLE) * 1e6 + 0.5)
              AS BIGINT) AS rate_m
  FROM hist),
lab2 AS (
  SELECT c.e1, c.e2, c.cn,
         CASE WHEN a.lo IS NOT NULL THEN 1 ELSE 0 END AS appeared
  FROM cand2 c LEFT JOIN aft a ON a.lo = c.e1 AND a.hi = c.e2)
SELECT l.e1, l.e2, l.cn,
       CAST(r.rate_m AS DOUBLE) / 1e6 AS pos_rate,
       CAST(l.appeared AS BIGINT) AS appeared
FROM lab2 l JOIN rates r USING (cn)
WHERE r.rate_m >= {min_rate_micros}
"""


def split_leakage_oracle(pcts=(80, 10, 10), seed: int = 9) -> str:
    """Mirror of curation.split_leakage_audit: md5-byte split rule +
    md5(text) content identity, per-hash split counts, three pair
    cells."""
    acc = 0
    cuts = []
    for p in pcts:
        acc += p
        cuts.append(acc * 256 // 100)
    c0 = f"{cuts[0]:02x}"
    c1 = f"{cuts[1]:02x}"
    return f"""
WITH a AS (
  SELECT md5(text) AS h,
         CASE
           WHEN substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 2)
                < '{c0}' THEN 'train'
           WHEN substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 2)
                < '{c1}' THEN 'val'
           ELSE 'test' END AS split
  FROM documents),
g AS (
  SELECT h,
         SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS tr,
         SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS va,
         SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS te
  FROM a GROUP BY h)
SELECT 'train' AS split_a, 'val' AS split_b,
       CAST(SUM(CASE WHEN tr > 0 AND va > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hashes,
       CAST(SUM(CASE WHEN tr > 0 AND va > 0 THEN tr * va ELSE 0 END)
            AS BIGINT) AS n_pairs
FROM g
UNION ALL
SELECT 'train', 'test',
       CAST(SUM(CASE WHEN tr > 0 AND te > 0 THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(SUM(CASE WHEN tr > 0 AND te > 0 THEN tr * te ELSE 0 END)
            AS BIGINT)
FROM g
UNION ALL
SELECT 'val', 'test',
       CAST(SUM(CASE WHEN va > 0 AND te > 0 THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(SUM(CASE WHEN va > 0 AND te > 0 THEN va * te ELSE 0 END)
            AS BIGINT)
FROM g
"""


def near_dup_leakage_oracle(threshold: float = 0.8,
                            pcts=(80, 10, 10), seed: int = 9) -> str:
    """Mirror of curation.near_dup_leakage_audit: the full
    dedup_minhash_oracle pair derivation as a subquery, endpoints
    assigned by the md5-byte split rule, pair splits ordered by the
    fixed train<val<test rank."""
    acc = 0
    cuts = []
    for p in pcts:
        acc += p
        cuts.append(acc * 256 // 100)
    c0, c1 = f"{cuts[0]:02x}", f"{cuts[1]:02x}"
    case = ("CASE WHEN substr(md5('" + str(seed)
            + ":' || CAST({col} AS VARCHAR)), 1, 2) < '" + c0
            + "' THEN 'train' WHEN substr(md5('" + str(seed)
            + ":' || CAST({col} AS VARCHAR)), 1, 2) < '" + c1
            + "' THEN 'val' ELSE 'test' END")
    return f"""
WITH pr AS (
  SELECT doc_a, doc_b FROM ({dedup_minhash_oracle(threshold)}) q
),
sp AS (
  SELECT {case.format(col='doc_a')} AS sa,
         {case.format(col='doc_b')} AS sb
  FROM pr
),
rk(nm, r) AS (VALUES ('train', 0), ('val', 1), ('test', 2)),
o AS (
  SELECT CASE WHEN ra.r <= rb.r THEN sp.sa ELSE sp.sb END AS split_a,
         CASE WHEN ra.r <= rb.r THEN sp.sb ELSE sp.sa END AS split_b
  FROM sp JOIN rk ra ON ra.nm = sp.sa JOIN rk rb ON rb.nm = sp.sb
)
SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs
FROM o GROUP BY split_a, split_b
"""


def quarantine_leaked_oracle(threshold: float = 0.8,
                             pcts=(80, 10, 10), seed: int = 9) -> str:
    """Mirror of curation.quarantine_leaked_docs: the MinHash pair
    subquery, both orientations unioned, eval-side docs paired with a
    train-side doc."""
    acc = 0
    cuts = []
    for p in pcts:
        acc += p
        cuts.append(acc * 256 // 100)
    c0, c1 = f"{cuts[0]:02x}", f"{cuts[1]:02x}"
    case = ("CASE WHEN substr(md5('" + str(seed)
            + ":' || CAST({col} AS VARCHAR)), 1, 2) < '" + c0
            + "' THEN 'train' WHEN substr(md5('" + str(seed)
            + ":' || CAST({col} AS VARCHAR)), 1, 2) < '" + c1
            + "' THEN 'val' ELSE 'test' END")
    return f"""
WITH pr AS (
  SELECT doc_a, doc_b FROM ({dedup_minhash_oracle(threshold)}) q
),
orient AS (
  SELECT doc_a AS ev, doc_b AS tr FROM pr
  UNION ALL
  SELECT doc_b, doc_a FROM pr
),
s AS (
  SELECT ev AS doc_id, {case.format(col='ev')} AS split,
         {case.format(col='tr')} AS tr_split
  FROM orient
)
SELECT doc_id, split, CAST(count(*) AS BIGINT) AS n_train_dups
FROM s
WHERE split <> 'train' AND tr_split = 'train'
GROUP BY doc_id, split
"""


def pack_conversations_oracle(sf_dir: str, window: int = 2048,
                              sep_tokens: int = 1) -> str:
    """Mirror of packing.pack_conversations: per-conv whitespace token
    totals, exclusive prefix in conv_id order, integer pack ids."""
    return f"""
WITH t AS (
  SELECT conv_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt
  FROM read_parquet('{_transcripts_glob(sf_dir)}')
),
c AS (
  SELECT conv_id, CAST(SUM(nt) AS BIGINT) AS n_tokens
  FROM t GROUP BY conv_id
),
p AS (
  SELECT conv_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens + {sep_tokens}) OVER (
           ORDER BY conv_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS token_start
  FROM c
)
SELECT conv_id, n_tokens, token_start,
       token_start // {window} AS pack_id
FROM p
"""


def conv_packing_stats_oracle(sf_dir: str, window: int = 2048,
                              sep_tokens: int = 1) -> str:
    """Mirror of packing.conv_packing_stats over the
    pack_conversations derivation."""
    base = pack_conversations_oracle(sf_dir, window, sep_tokens)
    return f"""
WITH placed AS ({base})
SELECT CAST(count(*) AS BIGINT) AS n_convs,
       CAST(max(pack_id) + 1 AS BIGINT) AS n_packs,
       CAST(SUM(CASE WHEN n_tokens + {sep_tokens} > {window}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_oversized,
       CAST(SUM(n_tokens + {sep_tokens}) AS BIGINT) AS total_tokens,
       floor(SUM(n_tokens + {sep_tokens})
             / (CAST(max(pack_id) + 1 AS DOUBLE) * {window})
             * 1e6 + 0.5) / 1e6 AS mean_fill
FROM placed
"""


# ------------------------------------------------ approx: CMS + bootstrap ---

def _cms_cells_cte(depth: int, width: int) -> str:
    """Shared CTE chain: whitespace tokens of documents → count-min cell
    rows, the md5-parity twin of stages/approx._cms_grid (col =
    md5_number_lower('j:token') % width)."""
    return f"""
toks AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents WHERE trim(text) <> ''
),
cells AS (
  SELECT g.j, CAST(md5_number_lower(CAST(g.j AS VARCHAR) || ':' || token)
                   % {width} AS BIGINT) AS col,
         CAST(count(*) AS BIGINT) AS cnt
  FROM toks CROSS JOIN unnest(generate_series(0, {depth - 1})) AS g(j)
  GROUP BY 1, 2
)"""


def cms_state_oracle(depth: int = 4, width: int = 1024) -> str:
    """Count-min sketch state over document tokens (approx.cms_state):
    every nonzero (row_j, col, cnt) cell, value-exact by md5 parity."""
    return f"""
WITH {_cms_cells_cte(depth, width)}
SELECT j AS row_j, col, cnt FROM cells
"""


def cms_estimates_oracle(k: int = 20, depth: int = 4,
                         width: int = 1024) -> str:
    """CMS point estimates for the exact top-k tokens
    (approx.cms_estimates): n_est = MIN over rows of the hashed cell."""
    return f"""
WITH {_cms_cells_cte(depth, width)},
c AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY token),
top AS (SELECT token, n FROM c ORDER BY n DESC, token LIMIT {k}),
probe AS (
  SELECT t.token, t.n, g.j,
         CAST(md5_number_lower(CAST(g.j AS VARCHAR) || ':' || t.token)
              % {width} AS BIGINT) AS col
  FROM top t CROSS JOIN unnest(generate_series(0, {depth - 1})) AS g(j)
)
SELECT p.token, p.n AS n_true, CAST(MIN(ce.cnt) AS BIGINT) AS n_est
FROM probe p JOIN cells ce ON ce.j = p.j AND ce.col = p.col
GROUP BY p.token, p.n
"""


def _bootstrap_means_cte(n_boot: int) -> str:
    """Shared CTE chain: orders → per-replicate (n_eff, sum_micros, mean)
    of o_totalprice, the exact twin of approx.poisson_bootstrap_means
    (md5 row hash → (MIX_A·h + b·MIX_C + MIX_D) mod 2^64 via the
    HUGEINT 32/64 split → integer Poisson(1) inverse-CDF cutoffs shared
    verbatim with the engine)."""
    from deepkg_ray.stages.approx import (MIX_A, POISSON1_CUTOFFS,
                                          _replicate_addends)
    addends = _replicate_addends(n_boot)
    rep_rows = ",\n    ".join(
        f"({b}, {int(addends[b])}::UBIGINT)" for b in range(n_boot))
    w_cases = " + ".join(
        f"(CASE WHEN CAST(u AS HUGEINT) >= {int(c)} THEN 1 ELSE 0 END)"
        for c in POISSON1_CUTOFFS)
    m64 = 1 << 64
    return f"""
reps(b, addend) AS (VALUES
    {rep_rows}),
h AS (
  SELECT md5_number_lower(CAST(o_orderkey AS VARCHAR)) AS h,
         CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT) AS vm
  FROM orders
),
u AS (
  SELECT r.b, h.vm,
         CAST(({MIX_A}::HUGEINT * (h & 4294967295)
               + (({MIX_A}::HUGEINT * (h >> 32)) % 4294967296) * 4294967296
               + r.addend) % {m64} AS UBIGINT) AS u
  FROM h CROSS JOIN reps r
),
w AS (SELECT b, vm, {w_cases} AS w FROM u),
means AS (
  SELECT b, CAST(SUM(w) AS BIGINT) AS n_eff,
         CAST(SUM(w * vm) AS BIGINT) AS sum_micros,
         floor(CAST(SUM(w * vm) AS DOUBLE) / 1e6 / SUM(w) * 1e6 + 0.5)
           / 1e6 AS mean_value
  FROM w GROUP BY b
)"""


def bootstrap_means_oracle(n_boot: int = 100) -> str:
    """All Poisson-bootstrap replicates of mean(o_totalprice)
    (approx.poisson_bootstrap_means over orders)."""
    return f"""
WITH {_bootstrap_means_cte(n_boot)}
SELECT b, n_eff, sum_micros, mean_value FROM means
"""


def bootstrap_ci_oracle(n_boot: int = 100, alpha: float = 0.05) -> str:
    """Percentile CI from the replicate means (approx.poisson_bootstrap_ci):
    exact order statistics at ranks ⌊α/2·B⌋+1 and B−⌊α/2·B⌋."""
    k = int(alpha / 2 * n_boot)
    return f"""
WITH {_bootstrap_means_cte(n_boot)}
SELECT CAST({n_boot} AS BIGINT) AS n_boot,
       CAST({k + 1} AS BIGINT) AS lo_rank,
       CAST({n_boot - k} AS BIGINT) AS hi_rank,
       (SELECT mean_value FROM means ORDER BY mean_value
        LIMIT 1 OFFSET {k}) AS ci_lo,
       (SELECT mean_value FROM means ORDER BY mean_value
        LIMIT 1 OFFSET {n_boot - k - 1}) AS ci_hi
"""


def vocab_coverage_oracle(checkpoints=(10, 100, 1000, 5000)) -> str:
    """Mirror of textstats.vocab_coverage: running token mass over the
    (count desc, token asc) vocabulary order, read at the checkpoint ranks
    (ties share a count, so prefix mass is order-independent)."""
    cp_rows = ", ".join(f"({int(n)})" for n in checkpoints)
    return f"""
WITH toks AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents WHERE trim(text) <> ''
),
c AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY token),
r AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, token) AS r,
         SUM(n) OVER (ORDER BY n DESC, token
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM c
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS v FROM c),
cp(top_n) AS (VALUES {cp_rows})
SELECT CAST(cp.top_n AS BIGINT) AS top_n,
       CAST(r.cum AS BIGINT) AS cum_tokens,
       tot.t AS total_tokens,
       floor(CAST(r.cum AS DOUBLE) / tot.t * 1e6 + 0.5) / 1e6 AS coverage
FROM cp CROSS JOIN tot
JOIN r ON r.r = LEAST(CAST(cp.top_n AS BIGINT), tot.v)
"""


def domain_stats_oracle() -> str:
    """Mirror of scrub.domain_stats over the URL-augmented corpus: the
    aug CTE appends scrub.augment_urls_kernel's identical suffix, then
    hosts come from the capture-group regexp (re ∩ RE2), distinct-doc and
    occurrence counts per domain."""
    return """
WITH aug AS (
  SELECT doc_id,
         text || ' link https://site' || CAST(doc_id % 7 AS VARCHAR)
              || '.example.com/p/' || CAST(doc_id AS VARCHAR)
              || CASE WHEN doc_id % 3 = 0
                      THEN ' more https://cdn.example.net/x' ELSE '' END
           AS text
  FROM documents
),
hosts AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text,
                'https?://([A-Za-z0-9._-]+)', 1)) AS domain
  FROM aug
)
SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occ
FROM hosts GROUP BY domain
"""


def kg_mis_oracle(sf_dir: str, rounds: int = 12) -> str:
    """Luby maximal independent set over the KG's undirected simple graph
    (graph.maximal_independent_set): unrolled synchronous rounds — each
    round the undecided strict-local-minimum-priority nodes join (m_r),
    their undecided neighbors leave (st=2).  Priority twin:
    (md5_number_lower(node) % 2^40) * 2^20 + node.  Decided states are
    fixpoints, so a fixed unroll ≥ the engine's max_rounds is exact."""
    head = (f"WITH {dict_values_cte()},\n{transcripts_cte(sf_dir)},\n"
            + _triples_cte(sf_dir) + """,
edges2 AS MATERIALIZED (
  SELECT subj_id AS u, obj_id AS v FROM triples WHERE subj_id <> obj_id
  UNION
  SELECT obj_id, subj_id FROM triples WHERE subj_id <> obj_id),
nds AS (SELECT DISTINCT u AS node FROM edges2),
s0 AS MATERIALIZED (
  SELECT node,
         CAST((md5_number_lower(CAST(node AS VARCHAR)) % 1099511627776)
              * 1048576 + node AS BIGINT) AS pr,
         0 AS st
  FROM nds)""")
    parts = [head]
    for r in range(rounds):
        parts.append(f""",
m{r + 1} AS MATERIALIZED (
  SELECT a.node FROM s{r} a
  WHERE a.st = 0 AND NOT EXISTS (
    SELECT 1 FROM edges2 e JOIN s{r} b ON b.node = e.v AND b.st = 0
    WHERE e.u = a.node AND b.pr < a.pr)),
s{r + 1} AS MATERIALIZED (
  SELECT a.node, a.pr,
         CASE WHEN a.node IN (SELECT node FROM m{r + 1}) THEN 1
              WHEN a.st = 0 AND EXISTS (
                SELECT 1 FROM edges2 e JOIN m{r + 1} m ON m.node = e.v
                WHERE e.u = a.node) THEN 2
              ELSE a.st END AS st
  FROM s{r} a)""")
    parts.append(f"""
SELECT node, CAST(CASE WHEN st = 1 THEN 1 ELSE 0 END AS BIGINT) AS in_mis
FROM s{rounds}
""")
    return "".join(parts)


def doc_logprob_bigram_oracle() -> str:
    """Per-doc Laplace-smoothed bigram log-likelihood — mirrors
    textstats.doc_logprob_bigram: per-bigram micros
    floor(ln((c2+1)/(c1+V))·1e6+0.5), integer SUM per doc; c1 is the
    bigram-history count, V the unigram vocabulary size; docs with < 2
    tokens score 0."""
    return """
WITH ws AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(lower(trim(text)), '\\s+') END AS ws
  FROM documents),
big AS (
  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
  FROM ws, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) g),
c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
       FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
v AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM (
        SELECT unnest(ws) AS w FROM ws)),
lp AS (
  SELECT c2.w1, c2.w2,
         CAST(floor(ln(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + v.v))
                    * 1e6 + 0.5) AS BIGINT) AS lpm
  FROM c2 JOIN c1 USING (w1), v),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(lpm) AS BIGINT) AS logprob_micros
  FROM big JOIN lp USING (w1, w2) GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(per.n_bigrams, 0) AS n_bigrams,
       COALESCE(per.logprob_micros, 0) AS logprob_micros,
       COALESCE(per.logprob_micros, 0) / 1e6 AS logprob,
       CASE WHEN COALESCE(per.n_bigrams, 0) = 0 THEN 0.0
            ELSE floor(CAST(per.logprob_micros AS DOUBLE) / per.n_bigrams
                       + 0.5) / 1e6 END AS avg_logprob
FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
"""


def doc_logprob_kn_oracle(discount: float = 0.75) -> str:
    """Per-doc interpolated Kneser-Ney bigram log-likelihood — mirrors
    textstats.doc_logprob_kn: per-bigram micros
    floor(ln((c−D)/c1 + D·n1f/c1·(n1b/B))·1e6+0.5) in the engine's
    exact DOUBLE op order, integer SUM per doc, <2-token docs 0."""
    return f"""
WITH ws AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(lower(trim(text)), '\\s+') END AS ws
  FROM documents),
big AS (
  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
  FROM ws, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) g),
c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
       FROM big GROUP BY w1, w2),
fwd AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n1f
        FROM c2 GROUP BY w1),
bwd AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1b
        FROM c2 GROUP BY w2),
bt AS (SELECT CAST(count(*) AS DOUBLE) AS b FROM c2),
lp AS (
  SELECT c2.w1, c2.w2,
         CAST(floor(ln((CAST(c2.c2 AS DOUBLE) - {discount}) / fwd.c1
                       + {discount} * fwd.n1f / fwd.c1
                         * (bwd.n1b / bt.b))
                    * 1e6 + 0.5) AS BIGINT) AS lpm
  FROM c2 JOIN fwd USING (w1) JOIN bwd USING (w2), bt),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(lpm) AS BIGINT) AS logprob_micros
  FROM big JOIN lp USING (w1, w2) GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(per.n_bigrams, 0) AS n_bigrams,
       COALESCE(per.logprob_micros, 0) AS logprob_micros,
       COALESCE(per.logprob_micros, 0) / 1e6 AS logprob,
       CASE WHEN COALESCE(per.n_bigrams, 0) = 0 THEN 0.0
            ELSE floor(CAST(per.logprob_micros AS DOUBLE) / per.n_bigrams
                       + 0.5) / 1e6 END AS avg_logprob
FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
"""


def pq_distortion_oracle(m: int = 4, k: int = 16, iters: int = 2,
                         dim: int = 64) -> str:
    """Per-subspace PQ reconstruction SSE — mirrors kmeans.pq_distortion:
    the same _kmeans_parts chains as pq_codes, then for every (vector,
    subspace) the exact integer quadratic distance to the assigned
    centroid, BIGINT-summed (per-row CAST keeps the sum integer-exact);
    mse = floor(sse/n + 0.5) in float64 like the engine."""
    from deepkg_ray.functions.numeric import SQL_EMB_MICROS
    em = SQL_EMB_MICROS.format(e="embedding")
    w = dim // m
    chains = [
        _kmeans_parts(k, iters, suffix=f"_p{j}",
                      vec_expr=f"list_slice({em}, {j * w + 1}, {(j + 1) * w})")
        for j in range(m)]
    unions = []
    for j in range(m):
        xj = f"list_slice(v.em, {j * w + 1}, {(j + 1) * w})"
        unions.append(f"""
  SELECT {j} AS subspace,
         CAST(list_dot_product({xj}, {xj})
              - 2 * list_dot_product({xj}, c.cem)
              + list_dot_product(c.cem, c.cem) AS BIGINT) AS d
  FROM vf v
  JOIN a{iters}_p{j} a ON a.vec_id = v.vec_id
  JOIN cent{iters}_p{j} c ON c.cidx = a.cl""")
    u = "\n  UNION ALL\n".join(unions)
    return f"""WITH {",".join(chains)},
vf AS (SELECT vec_id, {em} AS em FROM embeddings),
d AS ({u}),
s AS (SELECT subspace, CAST(count(*) AS BIGINT) AS n_vecs,
             CAST(SUM(d) AS BIGINT) AS sse
      FROM d GROUP BY subspace)
SELECT subspace, n_vecs, sse,
       CASE WHEN n_vecs = 0 THEN 0.0
            ELSE floor(CAST(sse AS DOUBLE) / n_vecs + 0.5) END AS mse
FROM s
"""


def truncation_recall_oracle(n_queries: int = 8, k: int = 10,
                             dims=(16, 32)) -> str:
    """Matryoshka truncation recall — mirrors similarity.truncation_recall:
    per level t, the brute cosine top-k over list_slice'd micros vectors
    joined against the full-dimension top-k (micros quantization commutes
    with truncation)."""
    from deepkg_ray.functions.numeric import SQL_COSINE, SQL_EMB_MICROS
    em = SQL_EMB_MICROS.format(e="embedding")
    parts = [f"""
q AS MATERIALIZED (SELECT vec_id AS query_id, {em} AS qm
     FROM embeddings WHERE vec_id < {n_queries}),
ev AS MATERIALIZED (SELECT vec_id, {em} AS em FROM embeddings),
rfull AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           {SQL_COSINE.format(a="q.qm", b="e.em")} AS cosine,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {SQL_COSINE.format(a="q.qm", b="e.em")} DESC,
                      e.vec_id) AS rn
    FROM q CROSS JOIN ev e) WHERE rn <= {k})"""]
    selects = []
    for t in dims:
        qa = f"list_slice(q.qm, 1, {t})"
        eb = f"list_slice(e.em, 1, {t})"
        cos = SQL_COSINE.format(a=qa, b=eb)
        parts.append(f""",
r{t} AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id, {cos} AS cosine,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {cos} DESC, e.vec_id) AS rn
    FROM q CROSS JOIN ev e) WHERE rn <= {k})""")
        selects.append(f"""
SELECT CAST({t} AS BIGINT) AS trunc_dim, CAST({k} AS BIGINT) AS k,
       CAST({n_queries} AS BIGINT) AS n_queries,
       (SELECT CAST(count(*) AS BIGINT) FROM r{t}
        JOIN rfull USING (query_id, vec_id)) AS n_common,
       floor((SELECT count(*) FROM r{t} JOIN rfull
              USING (query_id, vec_id))
             / ({k}.0 * {n_queries}) * 1e6 + 0.5) / 1e6 AS recall""")
    return "WITH " + "".join(parts) + "\nUNION ALL".join(selects)


def _fs_ctes() -> str:
    """Shared Fellegi–Sunter CTE chain over customer (mirrors
    stages/editdist fs_*): ed≤1 name pairs as the declared match set,
    agreement flags per feature, smoothed m from the match set and
    frequency-based u from the marginals, ln-micros weights with the
    engine's exact float nesting."""
    feats = [("nation", "un"), ("segment", "us"), ("band", "ub")]
    margs = ",\n".join(
        f"""{cte} AS (SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS s FROM (
  SELECT count(*) AS c FROM attrs GROUP BY {f}))"""
        for f, cte in feats)
    agg = {"nation": "an", "segment": "asg", "band": "ab"}
    wcols = []
    for f, cte in feats:
        m = f"((ms.{agg[f]} + 0.5) / (ms.np + 1))"
        u = f"(({cte}.s + 0.5) / (nn.n * (nn.n - 1) + 1))"
        wcols.append(
            f"CAST(floor(ln({m} / {u}) * 1e6 + 0.5) AS BIGINT) AS wa_{f},\n"
            f"  CAST(floor(ln((1 - {m}) / (1 - {u})) * 1e6 + 0.5) AS BIGINT)"
            f" AS wd_{f},\n  {m} AS m_{f},\n  {u} AS u_{f}")
    return f"""
pairs AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_custkey < b.c_custkey
   AND abs(length(a.c_name) - length(b.c_name)) <= 1
  WHERE levenshtein(a.c_name, b.c_name) <= 1),
attrs AS (
  SELECT c_custkey AS cid, CAST(c_nationkey AS BIGINT) AS nation,
         c_mktsegment AS segment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
  FROM customer),
fl AS (
  SELECT p.id_a, p.id_b,
         CASE WHEN a.nation = b.nation THEN 1 ELSE 0 END AS agree_nation,
         CASE WHEN a.segment = b.segment THEN 1 ELSE 0 END AS agree_segment,
         CASE WHEN a.band = b.band THEN 1 ELSE 0 END AS agree_band
  FROM pairs p JOIN attrs a ON a.cid = p.id_a
               JOIN attrs b ON b.cid = p.id_b),
ms AS (SELECT CAST(count(*) AS BIGINT) AS np,
              CAST(SUM(agree_nation) AS BIGINT) AS an,
              CAST(SUM(agree_segment) AS BIGINT) AS asg,
              CAST(SUM(agree_band) AS BIGINT) AS ab FROM fl),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer),
{margs},
w AS (SELECT
  {",".join(wcols)}
FROM ms, nn, un, us, ub)"""


def fs_weight_table_oracle() -> str:
    """Mirror of editdist.fs_weight_table: one row per feature."""
    arms = " UNION ALL ".join(
        f"""SELECT '{f}' AS feature, w.m_{f} AS m_prob, w.u_{f} AS u_prob,
       w.wa_{f} AS w_agree_micros, w.wd_{f} AS w_disagree_micros FROM w"""
        for f in ("nation", "segment", "band"))
    return f"WITH {_fs_ctes()}\n{arms}"


def fs_match_scores_oracle() -> str:
    """Mirror of editdist.fs_match_scores: per-pair log-likelihood-ratio
    score in micros (agree → w_agree, else w_disagree; integer sum)."""
    return f"""WITH {_fs_ctes()},
sc AS (
  SELECT fl.*,
         CAST((CASE WHEN fl.agree_nation = 1 THEN w.wa_nation
                    ELSE w.wd_nation END)
            + (CASE WHEN fl.agree_segment = 1 THEN w.wa_segment
                    ELSE w.wd_segment END)
            + (CASE WHEN fl.agree_band = 1 THEN w.wa_band
                    ELSE w.wd_band END) AS BIGINT) AS score_micros
  FROM fl, w)
SELECT id_a, id_b, agree_nation, agree_segment, agree_band,
       score_micros, score_micros / 1e6 AS score
FROM sc
"""


def er_canonical_oracle() -> str:
    """Mirror of editdist.er_canonical: per ed≤1 cluster the per-attribute
    mode (count desc, value asc) via QUALIFY row_number."""
    return """
WITH RECURSIVE pairs AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_custkey < b.c_custkey
   AND abs(length(a.c_name) - length(b.c_name)) <= 1
  WHERE levenshtein(a.c_name, b.c_name) <= 1
),
edges2 AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges2
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges2 e ON r.v = e.u
),
comp AS (
  SELECT u AS node, CAST(least(u, min(v)) AS BIGINT) AS component
  FROM reach GROUP BY u
),
mem AS (
  SELECT c.component, cu.c_name AS name,
         CAST(cu.c_nationkey AS BIGINT) AS nation,
         cu.c_mktsegment AS segment
  FROM comp c JOIN customer cu ON cu.c_custkey = c.node
),
mname AS (
  SELECT component, name FROM (
    SELECT component, name, count(*) AS c FROM mem GROUP BY 1, 2)
  QUALIFY row_number() OVER (PARTITION BY component
                             ORDER BY c DESC, name) = 1
),
mnat AS (
  SELECT component, nation FROM (
    SELECT component, nation, count(*) AS c FROM mem GROUP BY 1, 2)
  QUALIFY row_number() OVER (PARTITION BY component
                             ORDER BY c DESC, nation) = 1
),
mseg AS (
  SELECT component, segment FROM (
    SELECT component, segment, count(*) AS c FROM mem GROUP BY 1, 2)
  QUALIFY row_number() OVER (PARTITION BY component
                             ORDER BY c DESC, segment) = 1
),
sz AS (SELECT component, CAST(count(*) AS BIGINT) AS n_members
       FROM mem GROUP BY component)
SELECT sz.component, sz.n_members,
       mname.name AS canonical_name,
       mnat.nation AS canonical_nation,
       mseg.segment AS canonical_segment
FROM sz JOIN mname USING (component)
        JOIN mnat USING (component)
        JOIN mseg USING (component)
"""


def length_bucketing_oracle() -> str:
    """Mirror of packing.length_bucketing: power-of-2 bucket via integer
    bit length (1 << length(to_base(n-1,2))), per-bucket padding audit."""
    return """
WITH n AS (
  SELECT CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n
  FROM documents),
b AS (
  SELECT CASE WHEN n <= 1 THEN 1
              ELSE (1::BIGINT << length(to_base(n - 1, 2))) END AS bucket,
         n
  FROM n),
g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(n) AS BIGINT) AS total_tokens
      FROM b GROUP BY bucket)
SELECT bucket, n_docs, total_tokens,
       bucket * n_docs - total_tokens AS total_padding,
       floor(CAST(total_tokens AS DOUBLE) / (bucket * n_docs) * 1e6 + 0.5)
         / 1e6 AS fill
FROM g
"""


def shard_plan_oracle(n_shards: int = 8) -> str:
    """Mirror of curation.shard_plan: rendezvous argmax via QUALIFY
    (weight DESC, shard ASC), stability vs dropping the last shard."""
    return f"""
WITH w AS (
  SELECT doc_id, g.s,
         md5_number_lower(CAST(g.s AS VARCHAR) || ':'
                          || CAST(doc_id AS VARCHAR)) AS w
  FROM documents
  CROSS JOIN unnest(generate_series(0, {n_shards - 1})) AS g(s)),
fulla AS (
  SELECT doc_id, s AS shard FROM w
  QUALIFY row_number() OVER (PARTITION BY doc_id
                             ORDER BY w DESC, s) = 1),
dropa AS (
  SELECT doc_id, s AS shard FROM w WHERE s < {n_shards - 1}
  QUALIFY row_number() OVER (PARTITION BY doc_id
                             ORDER BY w DESC, s) = 1)
SELECT f.shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN d.shard = f.shard THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stable
FROM fulla f JOIN dropa d USING (doc_id)
GROUP BY f.shard
"""


def doc_dup_fraction_oracle(w: int = 5, min_count: int = 2) -> str:
    """Mirror of dedup.doc_dup_fraction: the substring_dup_spans oracle as
    a subquery, rolled up to per-doc duplicated-token share (token count
    via the same filtered whitespace split)."""
    spans = substring_dup_spans_oracle(w, min_count)
    return f"""
WITH sp AS ({spans}),
lens AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents),
dup AS (SELECT doc_id, CAST(SUM(span_end - span_start) AS BIGINT)
               AS dup_tokens
        FROM sp GROUP BY doc_id)
SELECT l.doc_id, l.n_tokens,
       COALESCE(d.dup_tokens, 0) AS dup_tokens,
       CASE WHEN l.n_tokens = 0 THEN 0.0
            ELSE floor(COALESCE(d.dup_tokens, 0)
                       / CAST(l.n_tokens AS DOUBLE) * 1e6 + 0.5) / 1e6
            END AS dup_fraction
FROM lens l LEFT JOIN dup d USING (doc_id)
"""


def diff_in_diff_oracle() -> str:
    """Mirror of experiment.diff_in_diff: odd-user treatment, CUPED
    integer-μs midpoint period split, eight exact int64 cells, each mean
    and the DiD from raw cells in the engine's exact double nesting."""
    mean = ("floor(CAST(s_{c} AS DOUBLE) / n_{c} / 1e6 * 1e6 + 0.5) "
            "/ 1e6")
    means = ",\n       ".join(
        f"CASE WHEN n_{c} = 0 THEN 0.0 ELSE {mean.format(c=c)} END "
        f"AS mean_{c}"
        for c in ("c_pre", "c_post", "t_pre", "t_post"))
    return f"""
WITH t AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) AS tsu,
         CAST(user_id AS BIGINT) AS u,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
  FROM events),
sp AS (SELECT (MIN(tsu) + MAX(tsu)) // 2 AS mid FROM t),
x AS (
  SELECT CASE WHEN u % 2 = 1 THEN 1 ELSE 0 END AS treat,
         CASE WHEN tsu >= sp.mid THEN 1 ELSE 0 END AS post, vm
  FROM t, sp),
c AS (
  SELECT
    CAST(SUM(CASE WHEN treat = 0 AND post = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_c_pre,
    CAST(SUM(CASE WHEN treat = 0 AND post = 0 THEN vm ELSE 0 END)
         AS BIGINT) AS s_c_pre,
    CAST(SUM(CASE WHEN treat = 0 AND post = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_c_post,
    CAST(SUM(CASE WHEN treat = 0 AND post = 1 THEN vm ELSE 0 END)
         AS BIGINT) AS s_c_post,
    CAST(SUM(CASE WHEN treat = 1 AND post = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_t_pre,
    CAST(SUM(CASE WHEN treat = 1 AND post = 0 THEN vm ELSE 0 END)
         AS BIGINT) AS s_t_pre,
    CAST(SUM(CASE WHEN treat = 1 AND post = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_t_post,
    CAST(SUM(CASE WHEN treat = 1 AND post = 1 THEN vm ELSE 0 END)
         AS BIGINT) AS s_t_post
  FROM x)
SELECT n_c_pre, n_c_post, n_t_pre, n_t_post,
       {means},
       CASE WHEN n_c_pre = 0 OR n_c_post = 0 OR n_t_pre = 0
                 OR n_t_post = 0 THEN 0.0
            ELSE floor(
              ((CAST(s_t_post AS DOUBLE) / n_t_post
                - CAST(s_t_pre AS DOUBLE) / n_t_pre)
               - (CAST(s_c_post AS DOUBLE) / n_c_post
                  - CAST(s_c_pre AS DOUBLE) / n_c_pre))
              / 1e6 * 1e6 + 0.5) / 1e6 END AS did
FROM c
"""


def permutation_test_weekend_oracle(seed: int = 17,
                                    k_perms: int = 64) -> str:
    """Mirror of experiment.permutation_test_weekend: 64 label bits from
    one md5, per-k Welch t in the engine's exact double chain (round6
    before comparison), add-one permutation p-value."""
    def welch(n1, s1, ss1):
        n0 = f"(t.nn - {n1})"
        s0 = f"(t.s - {s1})"
        ss0 = f"(t.ss - {ss1})"
        se2 = (f"(CAST({ss1} AS DOUBLE) - CAST({s1} AS DOUBLE)"
               f" * CAST({s1} AS DOUBLE) / CAST({n1} AS DOUBLE))"
               f" / (CAST({n1} AS DOUBLE) - 1.0) / CAST({n1} AS DOUBLE)"
               f" + (CAST({ss0} AS DOUBLE) - CAST({s0} AS DOUBLE)"
               f" * CAST({s0} AS DOUBLE) / CAST({n0} AS DOUBLE))"
               f" / (CAST({n0} AS DOUBLE) - 1.0) / CAST({n0} AS DOUBLE)")
        tt = (f"(CAST({s1} AS DOUBLE) / CAST({n1} AS DOUBLE)"
              f" - CAST({s0} AS DOUBLE) / CAST({n0} AS DOUBLE))"
              f" / sqrt({se2})")
        return (f"CASE WHEN {n1} < 2 OR {n0} < 2 THEN 0.0"
                f" WHEN ({se2}) <= 0 THEN 0.0"
                f" ELSE floor(({tt}) * 1e6 + 0.5) / 1e6 END")

    t_obs = welch("t.nwe", "t.swe", "t.sswe")
    t_k = welch("pk.n1", "pk.s1", "pk.ss1")
    return f"""
WITH e AS (
  SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we,
         CAST(floor(value * 1e3 + 0.5) AS BIGINT) AS xm,
         md5_number_lower('{seed}:' || CAST(event_id AS VARCHAR)) AS h
  FROM events),
ks AS (SELECT unnest(generate_series(0, {k_perms - 1})) AS k),
g AS (SELECT ks.k, CAST((e.h >> ks.k) & 1 AS BIGINT) AS b, e.xm
      FROM e, ks),
pk AS (SELECT k, CAST(SUM(b) AS BIGINT) AS n1,
              CAST(SUM(b * xm) AS BIGINT) AS s1,
              CAST(SUM(b * xm * xm) AS BIGINT) AS ss1
       FROM g GROUP BY k),
t AS (SELECT CAST(count(*) AS BIGINT) AS nn,
             CAST(SUM(xm) AS BIGINT) AS s,
             CAST(SUM(xm * xm) AS BIGINT) AS ss,
             CAST(SUM(we) AS BIGINT) AS nwe,
             CAST(SUM(we * xm) AS BIGINT) AS swe,
             CAST(SUM(we * xm * xm) AS BIGINT) AS sswe
      FROM e),
ex AS (SELECT CAST(SUM(CASE WHEN abs({t_k}) >= abs({t_obs})
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_exceed
       FROM pk, t)
SELECT {t_obs} AS t_obs,
       CAST({k_perms} AS BIGINT) AS k_perms,
       ex.n_exceed,
       floor((1 + ex.n_exceed) / ({k_perms} + 1.0) * 1e6 + 0.5) / 1e6
           AS p_value
FROM t, ex
"""


def srm_check_oracle() -> str:
    """Mirror of experiment.srm_check: distinct-user parity counts,
    integer-rational chi2 micros, 3.84 (micros 3841459) flag."""
    return """
WITH u AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS u FROM events),
c AS (
  SELECT CAST(SUM(CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_c,
         CAST(SUM(CASE WHEN u % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_t
  FROM u)
SELECT n_c AS n_control, n_t AS n_treat,
       CASE WHEN n_c + n_t = 0 THEN 0
            ELSE ((n_t - n_c) * (n_t - n_c) * 1000000) // (n_c + n_t)
            END AS chi2_micros,
       CAST(CASE WHEN n_c + n_t > 0 AND
                 ((n_t - n_c) * (n_t - n_c) * 1000000) // (n_c + n_t)
                 > 3841459 THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
FROM c
"""


def cuped_adjustment_oracle() -> str:
    """Mirror of experiment.cuped_adjustment: per-user micros pre/post
    sums split at the integer-μs midpoint, millis quantization (integer
    division — engine floor and SQL truncation agree because
    events.value ≥ 0 keeps the sums non-negative), HUGEINT moment
    products, the engine's exact float nesting for θ and ρ²."""
    return """
WITH t AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) AS tsu, user_id,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vm
  FROM events),
sp AS (SELECT MIN(tsu) AS lo, MAX(tsu) AS hi FROM t),
u AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN tsu < (sp.lo + sp.hi) // 2
                       THEN vm ELSE 0 END) AS BIGINT) AS pre,
         CAST(SUM(CASE WHEN tsu >= (sp.lo + sp.hi) // 2
                       THEN vm ELSE 0 END) AS BIGINT) AS post
  FROM t, sp GROUP BY user_id),
q AS (SELECT pre // 1000 AS x, post // 1000 AS y FROM u),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM q)
SELECT CAST(m.n AS BIGINT) AS n_users,
       floor(CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
             / CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE) * 1e6 + 0.5)
         / 1e6 AS theta,
       floor((CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
              * CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE))
             / (CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)
                * CAST(m.n * m.syy - m.sy * m.sy AS DOUBLE))
             * 1e6 + 0.5) / 1e6 AS var_reduction
FROM m
"""


def psi_drift_oracle() -> str:
    """Mirror of experiment.psi_drift: category×half counts split at the
    integer-μs midpoint, +0.5 smoothing, per-term micros floor."""
    return """
WITH t AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) AS tsu, event_type AS cat
  FROM events),
sp AS (SELECT MIN(tsu) AS lo, MAX(tsu) AS hi FROM t),
c AS (
  SELECT cat,
         CAST(SUM(CASE WHEN tsu < (sp.lo + sp.hi) // 2
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
         CAST(SUM(CASE WHEN tsu >= (sp.lo + sp.hi) // 2
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_second
  FROM t, sp GROUP BY cat),
tot AS (SELECT CAST(SUM(n_first) AS DOUBLE) AS ta,
               CAST(SUM(n_second) AS DOUBLE) AS tb,
               CAST(count(*) AS BIGINT) AS k FROM c)
SELECT c.cat, c.n_first, c.n_second,
       CAST(floor(((c.n_first + 0.5) / (tot.ta + 0.5 * tot.k)
                   - (c.n_second + 0.5) / (tot.tb + 0.5 * tot.k))
                  * ln(((c.n_first + 0.5) / (tot.ta + 0.5 * tot.k))
                       / ((c.n_second + 0.5) / (tot.tb + 0.5 * tot.k)))
                  * 1e6 + 0.5) AS BIGINT) AS psi_term_micros
FROM c, tot
"""


def cdc_chunk_stats_oracle(w: int = 8, boundary_mod: int = 64) -> str:
    """Mirror of dedup.cdc_chunk_stats: per-position polynomial window
    hashes (the doc_fingerprints derivation), boundaries where
    h % boundary_mod = 0, chunk segments via LAG over boundary end
    positions plus the tail, chunk identity via md5_number_lower of the
    substring, corpus rollup."""
    m = (1 << 61) - 1
    ks = [pow(257, w - 1 - t, m) for t in range(w)]
    terms = " + ".join(f"CAST(cs[p + {t}] AS HUGEINT) * {k}"
                       for t, k in enumerate(ks))
    return f"""
WITH codes AS (
  SELECT doc_id, text,
         list_transform(string_split(text, ''), c -> ord(c)) AS cs,
         length(text) AS n
  FROM documents WHERE length(text) > 0),
pos AS (
  SELECT doc_id, p + {w - 1} AS e,
         CAST(({terms}) % {m} AS BIGINT) AS h
  FROM codes, unnest(generate_series(1, n - {w - 1})) AS u(p)
  WHERE n >= {w}),
bnd AS (SELECT doc_id, e FROM pos WHERE h % {boundary_mod} = 0),
segs AS (
  SELECT doc_id,
         COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY e), 0) + 1
           AS s,
         e
  FROM bnd
  UNION ALL
  SELECT c.doc_id,
         COALESCE((SELECT MAX(b.e) FROM bnd b
                   WHERE b.doc_id = c.doc_id), 0) + 1 AS s,
         c.n AS e
  FROM codes c
  WHERE COALESCE((SELECT MAX(b.e) FROM bnd b
                  WHERE b.doc_id = c.doc_id), 0) < c.n),
ch AS (
  SELECT sg.doc_id, sg.e - sg.s + 1 AS clen,
         md5_number_lower(substr(c.text, sg.s, sg.e - sg.s + 1)) AS h
  FROM segs sg JOIN codes c ON c.doc_id = sg.doc_id)
SELECT CAST((SELECT count(*) FROM codes) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS total_chunks,
       CAST(count(DISTINCT h) AS BIGINT) AS distinct_chunks,
       floor((1 - count(DISTINCT h) / CAST(count(*) AS DOUBLE))
             * 1e6 + 0.5) / 1e6 AS dup_ratio,
       CAST(SUM(clen) AS BIGINT) AS total_chars,
       floor(SUM(clen) / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS mean_chunk_len
FROM ch
"""


def markov_entropy_rate_oracle() -> str:
    """Mirror of windows.markov_entropy_rate: per-pair micros terms
    (n_ij/N)·ln(n_i·/n_ij) over the LEAD-pair counts, integer-summed."""
    return """
WITH e AS (
  SELECT event_type AS src_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS dst_type
  FROM events
),
c AS (
  SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS n
  FROM e WHERE dst_type IS NOT NULL GROUP BY src_type, dst_type
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS big_n FROM c),
rows_ AS (
  SELECT c.n,
         CAST(SUM(c.n) OVER (PARTITION BY c.src_type) AS BIGINT) AS rt
  FROM c
),
terms AS (
  SELECT CAST(floor((CAST(n AS DOUBLE) / tot.big_n)
              * ln(CAST(rt AS DOUBLE) / n) * 1e6 + 0.5) AS BIGINT) AS tm
  FROM rows_, tot
)
SELECT tot.big_n AS n_transitions,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_pairs,
       CAST((SELECT SUM(tm) FROM terms) AS BIGINT) AS entropy_micros,
       CAST((SELECT SUM(tm) FROM terms) AS BIGINT) / 1e6 AS entropy_rate
FROM tot
"""


def bootstrap_diff_ci_oracle(n_boot: int = 100, alpha: float = 0.05,
                             group_value: str = "1-URGENT") -> str:
    """Two-sample Poisson-bootstrap difference CI
    (approx.poisson_bootstrap_diff_ci over orders, A = o_orderpriority ==
    group_value): same reps/h/u/w chain as the single-arm oracle plus a
    group flag; per-replicate diff of means, order-statistic CI."""
    from deepkg_ray.stages.approx import (MIX_A, POISSON1_CUTOFFS,
                                          _replicate_addends)
    addends = _replicate_addends(n_boot)
    rep_rows = ",\n    ".join(
        f"({b}, {int(addends[b])}::UBIGINT)" for b in range(n_boot))
    w_cases = " + ".join(
        f"(CASE WHEN CAST(u AS HUGEINT) >= {int(c)} THEN 1 ELSE 0 END)"
        for c in POISSON1_CUTOFFS)
    m64 = 1 << 64
    k = int(alpha / 2 * n_boot)
    return f"""
WITH reps(b, addend) AS (VALUES
    {rep_rows}),
h AS (
  SELECT md5_number_lower(CAST(o_orderkey AS VARCHAR)) AS h,
         CAST(floor(o_totalprice * 1e6 + 0.5) AS BIGINT) AS vm,
         CASE WHEN o_orderpriority = '{group_value}'
              THEN 1 ELSE 0 END AS ga
  FROM orders
),
u AS (
  SELECT r.b, h.vm, h.ga,
         CAST(({MIX_A}::HUGEINT * (h & 4294967295)
               + (({MIX_A}::HUGEINT * (h >> 32)) % 4294967296) * 4294967296
               + r.addend) % {m64} AS UBIGINT) AS u
  FROM h CROSS JOIN reps r
),
w AS (SELECT b, vm, ga, {w_cases} AS w FROM u),
d AS (
  SELECT b,
         CAST(SUM(w * ga) AS BIGINT) AS na,
         CAST(SUM(w * vm * ga) AS BIGINT) AS sa,
         CAST(SUM(w * (1 - ga)) AS BIGINT) AS nb,
         CAST(SUM(w * vm * (1 - ga)) AS BIGINT) AS sb
  FROM w GROUP BY b
),
diffs AS (
  SELECT floor((CAST(sa AS DOUBLE) / 1e6 / na
                - CAST(sb AS DOUBLE) / 1e6 / nb) * 1e6 + 0.5) / 1e6
           AS diff
  FROM d
)
SELECT CAST({n_boot} AS BIGINT) AS n_boot,
       CAST({k + 1} AS BIGINT) AS lo_rank,
       CAST({n_boot - k} AS BIGINT) AS hi_rank,
       (SELECT diff FROM diffs ORDER BY diff LIMIT 1 OFFSET {k}) AS ci_lo,
       (SELECT diff FROM diffs ORDER BY diff
        LIMIT 1 OFFSET {n_boot - k - 1}) AS ci_hi
"""
