"""Dictionary mention detection — the deterministic NER tier.

Reimplements the *semantics* of the reference's trie dictionary matcher with
maximal forward matching (AutoNER/src/string_match.h:21-99,
annotation.h:16-243): scan normalized text for entity-dictionary surfaces,
prefer the longest surface at each position, emit typed char spans with
**inclusive** end indices like the reference's NER output format
(ExtractionEntities/README.md:40-95).

Execution model: a stateful actor-pool `map_batches` stage — the alias
automaton is compiled ONCE per actor in ``__init__`` (the analog of the
reference building its trie once per process), then each ``__call__``
performs a single C-speed regex pass per batch: all row texts are joined
with a ``\\x00`` sentinel and scanned once; match positions are mapped back
to rows with ``np.searchsorted`` over the cumulative row offsets.  No
per-row Python loop in the hot path.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MENTION_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("start_idx", pa.int32()),
    ("end_idx", pa.int32()),       # inclusive, reference convention
    ("type", pa.string()),
    ("surface", pa.string()),
    ("entity_id", pa.int64()),
])


def load_alias_map(dictionary_path: str) -> dict[str, tuple[int, str, str]]:
    """surface → (entity_id, type, canonical_name); surfaces normalized."""
    t = pq.read_table(dictionary_path)
    out: dict[str, tuple[int, str, str]] = {}
    for eid, name, etype, aliases in zip(
            t["entity_id"].to_pylist(), t["name"].to_pylist(),
            t["type"].to_pylist(), t["aliases"].to_pylist()):
        for a in aliases:
            out[a] = (eid, etype, name)
    return out


def compile_alias_regex(surfaces) -> re.Pattern:
    """Longest-first literal alternation ≙ maximal forward matching of the
    reference trie (string_match.h:21-89): at equal start positions the
    longer surface wins; finditer's non-overlapping scan then mirrors the
    matcher's jump-past-match behavior."""
    ordered = sorted(surfaces, key=len, reverse=True)
    return re.compile("|".join(re.escape(s) for s in ordered))


class DictionaryMentionDetector:
    """Actor-pool map_batches stage: transcripts batch → mentions batch.

    Expects a ``text_norm`` column (stages upstream: textnorm.add_text_norm);
    emitted spans are valid offsets into the raw ``text`` too, because
    normalization is length-preserving.
    """

    def __init__(self, dictionary_path: str, text_col: str = "text_norm",
                 key_cols: tuple[str, str] = ("conv_id", "turn_idx")):
        self.alias_map = load_alias_map(dictionary_path)
        self.rx = compile_alias_regex(self.alias_map.keys())
        self.text_col = text_col
        self.key_cols = key_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        # single scan over the whole batch
        blob = "\x00".join(texts)
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
        starts = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lens[:-1] + 1, out=starts[1:])          # +1 for the sentinel

        m_pos: list[int] = []
        m_end: list[int] = []
        m_surf: list[str] = []
        for m in self.rx.finditer(blob):
            m_pos.append(m.start())
            m_end.append(m.end())
            m_surf.append(m.group(0))

        pos = np.asarray(m_pos, dtype=np.int64)
        row = np.searchsorted(starts, pos, side="right") - 1 if len(pos) else pos
        local_start = pos - starts[row] if len(pos) else pos
        local_end = (np.asarray(m_end, dtype=np.int64) - starts[row] - 1) if len(pos) else pos

        k0, k1 = self.key_cols
        conv = batch[k0].take(pa.array(row, pa.int64())) if len(pos) else pa.array([], pa.string())
        turn = batch[k1].take(pa.array(row, pa.int64())) if len(pos) else pa.array([], pa.int32())
        meta = [self.alias_map[s] for s in m_surf]
        return pa.table({
            "conv_id": conv,
            "turn_idx": turn,
            "start_idx": pa.array(local_start, pa.int32()),
            "end_idx": pa.array(local_end, pa.int32()),
            "type": pa.array([m[1] for m in meta], pa.string()),
            "surface": pa.array(m_surf, pa.string()),
            "entity_id": pa.array([m[0] for m in meta], pa.int64()),
        }, schema=MENTION_SCHEMA)


def cooccurrence_counts(mentions, mode: str = "auto"):
    """Same-turn entity co-occurrence edges over the mention stream:
    (e1, e2, n_turns) = number of turns whose text mentions BOTH entities
    (e1 < e2) — the classic co-occurrence signal KG construction uses to
    propose candidate edges beyond pattern-extracted triples (distant-
    supervision flavor; the reference keeps only pattern triples, this is
    the additive signal layer).

    Shuffle shape: a turn's mentions are emitted into ONE batch by the
    detector (its text is one row), so the per-turn distinct-pair explosion
    is batch-local — a vectorized self-merge per batch, NO (conv, turn)
    shuffle ever happens.  Pair cardinality is bounded by the dictionary
    (|E|²/2), so the count merge is dictionary-sized; merge_partials
    mode='auto' falls back to the groupby shuffle for open vocabularies.
    Per-turn pair sets are tiny (mentions-per-turn choose 2), unlike a
    per-conversation grouping, which a hot conversation would blow up."""
    import pandas as pd

    from deepkg_ray.stages.treeagg import merge_partials

    def pairs(b: pa.Table) -> pd.DataFrame:
        df = (b.select(["conv_id", "turn_idx", "entity_id"]).to_pandas()
              .drop_duplicates())
        m = df.merge(df, on=["conv_id", "turn_idx"], suffixes=("_1", "_2"))
        m = m[m["entity_id_1"] < m["entity_id_2"]]
        out = (m.groupby(["entity_id_1", "entity_id_2"], as_index=False)
               .size().rename(columns={"entity_id_1": "e1",
                                       "entity_id_2": "e2",
                                       "size": "n_turns"}))
        out["n_turns"] = out["n_turns"].astype("int64")
        return out

    return merge_partials(
        mentions.map_batches(pairs, batch_format="pyarrow"),
        ["e1", "e2"], {"n_turns": "sum"}, mode=mode)


_SURFACE_COUNT_CACHE: dict[str, int] = {}


def detect_mentions(ds, dictionary_path: str, *, concurrency=None,
                    batch_size: int | None = None,
                    broadcast_threshold: int = 2_000_000,
                    n_shards: int | None = None):
    """transcripts Dataset (with text_norm) → mentions Dataset.

    Default execution is the worker-cached task pool (automaton compiled
    once per worker process); pass an explicit ``concurrency`` tuple for
    an actor pool (util.stateful_map).

    Size gate (SURVEY §7.5 "dictionary must stay broadcastable"): up to
    ``broadcast_threshold`` alias surfaces every worker compiles the full
    automaton (the reference's ~40k-name ICD dictionary sits far below);
    above it the dictionary is hash-sharded and the stream replicated —
    shardeddict.detect_mentions_sharded, output identical by the
    tier-agreement test.  ``n_shards`` forces a tier explicitly (1 =
    broadcast); None auto-picks ceil(surfaces / threshold)."""
    from deepkg_ray.util import rows_all, stateful_map
    if n_shards is None:
        n = _SURFACE_COUNT_CACHE.get(dictionary_path)
        if n is None:
            from deepkg_ray.stages.shardeddict import \
                dictionary_surface_count
            n = dictionary_surface_count(dictionary_path)
            _SURFACE_COUNT_CACHE[dictionary_path] = n
        n_shards = 1 if n <= broadcast_threshold \
            else -(-n // broadcast_threshold)
    if n_shards > 1:
        from deepkg_ray.stages.shardeddict import detect_mentions_sharded
        return detect_mentions_sharded(ds, dictionary_path,
                                       n_shards=n_shards,
                                       concurrency=concurrency,
                                       batch_size=batch_size)
    return stateful_map(ds, DictionaryMentionDetector,
                        {"dictionary_path": dictionary_path},
                        concurrency=concurrency, batch_size=batch_size)


def entity_spans(mentions, transcripts_ds, n_parts: int = 64,
                 mode: str = "auto"):
    """Entity timeline: (entity_id, n_mentions, first_us, last_us) — the
    per-entity lifecycle fold (first/last observation µs and total mention
    count), the entity-side twin of canonical.edge_spans.

    Same plan: both sides hashed into conversation-complete coarse
    partitions, vectorized in-partition equi-join (Ray's generic hash join
    measured 38x slower on this shape), associative per-partition partials
    merged by the tree/shuffle tier."""
    import pandas as pd

    from deepkg_ray.functions.hashing import stable_hash64_batch
    from deepkg_ray.stages.treeagg import merge_partials

    def men_partial(b: pa.Table) -> pa.Table:
        df = (b.select(["conv_id", "turn_idx", "entity_id"]).to_pandas()
              .groupby(["conv_id", "turn_idx", "entity_id"], as_index=False)
              .size().rename(columns={"size": "n"}))
        h = stable_hash64_batch(df["conv_id"].tolist())
        return pa.table({
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
            "conv_id": pa.array(df["conv_id"], pa.string()),
            "turn_idx": pa.array(df["turn_idx"].to_numpy(np.int64)),
            "entity_id": pa.array(df["entity_id"].to_numpy(np.int64)),
            "n": pa.array(df["n"].to_numpy(np.int64)),
            "ts_us": pa.array(np.full(len(df), -1, np.int64)),
        })

    def turn_ts(b: pa.Table) -> pa.Table:
        h = stable_hash64_batch(b["conv_id"].to_pylist())
        nr = b.num_rows
        return pa.table({
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
            "conv_id": b["conv_id"],
            "turn_idx": b["turn_idx"].combine_chunks().cast(pa.int64()),
            "entity_id": pa.array(np.zeros(nr, np.int64)),
            "n": pa.array(np.zeros(nr, np.int64)),
            "ts_us": b["ts"].combine_chunks()
                      .cast(pa.timestamp("us")).cast(pa.int64()),
        })

    men = mentions.map_batches(men_partial, batch_format="pyarrow")
    turns = transcripts_ds.map_batches(turn_ts, batch_format="pyarrow")

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        is_turn = g["n"] == 0
        tdf = g.loc[is_turn, ["conv_id", "turn_idx", "ts_us"]]
        xdf = g.loc[~is_turn].drop(columns=["ts_us", "part"])
        m = xdf.merge(tdf, on=["conv_id", "turn_idx"])
        out = (m.groupby("entity_id", as_index=False)
               .agg(n_mentions=("n", "sum"), first_us=("ts_us", "min"),
                    last_us=("ts_us", "max")))
        for c in ("n_mentions", "first_us", "last_us"):
            out[c] = out[c].astype(np.int64)
        return out

    partials = men.union(turns).groupby("part").map_groups(
        merge_part, batch_format="pandas")
    return merge_partials(partials, ["entity_id"],
                          {"n_mentions": "sum", "first_us": "min",
                           "last_us": "max"}, mode=mode)


def cooccurrence_pmi(mentions, n_turns_total: int, mode: str = "auto"):
    """Scored co-occurrence edges: PMI(e1, e2) = ln(n12·N / (n1·n2)) over
    turn-level entity occurrences — the association score that turns raw
    co-occurrence counts into ranked edge PROPOSALS (the distant-
    supervision scoring layer; phrasemine.pmi_bigrams' formula lifted from
    token bigrams to entity pairs).

    Both inputs reuse the batch-local-turn property (a turn's mentions
    never span batches): pair counts via cooccurrence_counts, per-entity
    distinct-turn counts via a batch-local dedup + dictionary-bounded
    merge.  The (≤|E|) marginals are broadcast into a finish map over the
    (≤|E|²/2) pair table — nothing row-shaped shuffles.  ln-micros
    convention (exact-integer ratio into one ln, one round).
    Returns (e1, e2, n_turns, pmi)."""
    import pandas as pd

    from deepkg_ray.stages.treeagg import merge_partials

    pairs = cooccurrence_counts(mentions, mode=mode)

    def ent_partial(b: pa.Table) -> pd.DataFrame:
        df = (b.select(["conv_id", "turn_idx", "entity_id"]).to_pandas()
              .drop_duplicates()
              .groupby("entity_id", as_index=False).size()
              .rename(columns={"size": "n"}))
        df["n"] = df["n"].astype("int64")
        return df

    marg = merge_partials(
        mentions.map_batches(ent_partial, batch_format="pyarrow"),
        ["entity_id"], {"n": "sum"}, mode=mode)
    from deepkg_ray.util import rows_all
    marg = rows_all(marg)
    n_of = {int(r["entity_id"]): int(r["n"]) for r in marg}
    n_total = float(n_turns_total)

    def finish(b: pa.Table) -> pa.Table:
        e1 = b["e1"].to_numpy(zero_copy_only=False).astype(np.int64)
        e2 = b["e2"].to_numpy(zero_copy_only=False).astype(np.int64)
        n12 = b["n_turns"].to_numpy(zero_copy_only=False).astype(np.float64)
        n1 = np.fromiter((n_of[int(x)] for x in e1), np.float64, len(e1))
        n2 = np.fromiter((n_of[int(x)] for x in e2), np.float64, len(e2))
        pmi = np.floor(np.log((n12 * n_total) / (n1 * n2)) * 1e6 + 0.5) / 1e6
        return pa.table({
            "e1": b["e1"], "e2": b["e2"], "n_turns": b["n_turns"],
            "pmi": pa.array(pmi, pa.float64()),
        })

    return pairs.map_batches(finish, batch_format="pyarrow")


_DAY_US = 86_400_000_000


class EntityLifespanCells(DictionaryMentionDetector):
    """Fused per-batch stage: detect mentions (the DictionaryMentionDetector
    kernel) and immediately collapse them to (entity_id, bucket) cells with
    (n, first_us, last_us) — the mention rows never leave the task, and ts
    attaches from the SAME batch (both sides come from the same transcript
    rows, so the 'join' is a batch-local two-key merge, zero shuffle).
    bucket_us is the time-bucket width (1 day in production; tests and the
    driver query use 1 minute because the synth corpus spans < 1 hour)."""

    def __init__(self, dictionary_path: str, bucket_us: int = _DAY_US,
                 **kw):
        super().__init__(dictionary_path, **kw)
        self.bucket_us = int(bucket_us)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        men = DictionaryMentionDetector.__call__(
            self, batch)
        empty = pa.table({
            "entity_id": pa.array([], pa.int64()),
            "bucket": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "first_us": pa.array([], pa.int64()),
            "last_us": pa.array([], pa.int64())})
        if men.num_rows == 0:
            return empty
        bm = pd.DataFrame({
            "conv_id": batch["conv_id"].to_pylist(),
            "turn_idx": batch["turn_idx"].to_numpy(zero_copy_only=False),
            "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
                      .to_numpy(zero_copy_only=False)})
        md = pd.DataFrame({
            "conv_id": men["conv_id"].to_pylist(),
            "turn_idx": men["turn_idx"].to_numpy(zero_copy_only=False),
            "entity_id": men["entity_id"].to_numpy(zero_copy_only=False)})
        j = md.merge(bm, on=["conv_id", "turn_idx"], how="left", sort=False)
        j["bucket"] = j["ts_us"].to_numpy(np.int64) // self.bucket_us
        g = j.groupby(["entity_id", "bucket"], sort=False)["ts_us"]
        out = pd.DataFrame({"n": g.size(), "first_us": g.min(),
                            "last_us": g.max()}).reset_index()
        return pa.table({
            "entity_id": pa.array(out["entity_id"].to_numpy(np.int64)),
            "bucket": pa.array(out["bucket"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "first_us": pa.array(out["first_us"].to_numpy(np.int64)),
            "last_us": pa.array(out["last_us"].to_numpy(np.int64))})


def entity_lifespan(ds, dictionary_path: str, *, bucket_us: int = _DAY_US,
                    concurrency=None):
    """Temporal lineage per KG entity: first/last mention timestamp, total
    mention count and distinct active time buckets — the entity-freshness
    table an incremental KG build consults (reference analog: the
    per-entity update bookkeeping around CoreKnowledgeGraph merges,
    KnowledgeGraph/core.py).

    ds must carry (conv_id, turn_idx, text_norm, ts).  Plan: one fused
    detect+collapse pass (EntityLifespanCells — mention rows never shuffle),
    (entity, bucket) cells tree-merge (entity-vocabulary × buckets bounded),
    then the bucket dimension folds out in a second cell-sized merge.
    Returns (entity_id, n_mentions, first_us, last_us, n_active_buckets)."""
    from deepkg_ray.stages.treeagg import merge_partials
    from deepkg_ray.util import stateful_map

    cells = stateful_map(ds, EntityLifespanCells,
                         {"dictionary_path": dictionary_path,
                          "bucket_us": bucket_us},
                         concurrency=concurrency, batch_size=None)
    per_bucket = merge_partials(cells, ["entity_id", "bucket"],
                                {"n": "sum", "first_us": "min",
                                 "last_us": "max"})

    def bucket_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "entity_id": b["entity_id"].combine_chunks().cast(pa.int64()),
            "n_mentions": b["n"].combine_chunks().cast(pa.int64()),
            "first_us": b["first_us"].combine_chunks().cast(pa.int64()),
            "last_us": b["last_us"].combine_chunks().cast(pa.int64()),
            "n_active_buckets": pa.array(np.ones(b.num_rows, np.int64))})

    return merge_partials(
        per_bucket.map_batches(bucket_rows, batch_format="pyarrow"),
        ["entity_id"],
        {"n_mentions": "sum", "first_us": "min", "last_us": "max",
         "n_active_buckets": "sum"})


class RoleEntityCells(DictionaryMentionDetector):
    """Fused per-batch stage: detect mentions and collapse them to
    (role, entity_id, type) cells with (n_mentions, n_turns).  role
    attaches from the SAME batch (batch-local two-key merge, zero mention
    shuffle), and n_turns — distinct turns where the role mentions the
    entity — is batch-locally exact because a turn's text is one row and
    therefore lives in exactly one batch."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        men = DictionaryMentionDetector.__call__(self, batch)
        if men.num_rows == 0:
            return pa.table({
                "role": pa.array([], pa.string()),
                "entity_id": pa.array([], pa.int64()),
                "type": pa.array([], pa.string()),
                "n_mentions": pa.array([], pa.int64()),
                "n_turns": pa.array([], pa.int64())})
        bm = pd.DataFrame({
            "conv_id": batch["conv_id"].to_pylist(),
            "turn_idx": batch["turn_idx"].to_numpy(zero_copy_only=False),
            "role": batch["role"].to_pylist()})
        md = pd.DataFrame({
            "conv_id": men["conv_id"].to_pylist(),
            "turn_idx": men["turn_idx"].to_numpy(zero_copy_only=False),
            "entity_id": men["entity_id"].to_numpy(zero_copy_only=False),
            "type": men["type"].to_pylist()})
        j = md.merge(bm, on=["conv_id", "turn_idx"], how="left", sort=False)
        keys = ["role", "entity_id", "type"]
        n = j.groupby(keys, sort=False).size()
        nt = (j.drop_duplicates(keys + ["conv_id", "turn_idx"])
              .groupby(keys, sort=False).size())
        out = pd.DataFrame({"n_mentions": n, "n_turns": nt}).reset_index()
        return pa.table({
            "role": pa.array(out["role"], pa.string()),
            "entity_id": pa.array(out["entity_id"].to_numpy(np.int64)),
            "type": pa.array(out["type"], pa.string()),
            "n_mentions": pa.array(out["n_mentions"].to_numpy(np.int64)),
            "n_turns": pa.array(out["n_turns"].to_numpy(np.int64))})


def role_entity_affinity(ds, dictionary_path: str, *, concurrency=None):
    """Which speaker role mentions which entity: (role, entity_id, type,
    n_mentions, n_turns) — the transcript-axis affinity table (who talks
    about what) that conversational KG curation slices by.  ds must carry
    (conv_id, turn_idx, role, text_norm).  Plan: fused detect+collapse
    (RoleEntityCells), then one roles × dictionary-bounded tree merge."""
    from deepkg_ray.stages.treeagg import merge_partials
    from deepkg_ray.util import stateful_map

    cells = stateful_map(ds, RoleEntityCells,
                         {"dictionary_path": dictionary_path},
                         concurrency=concurrency, batch_size=None)
    return merge_partials(cells, ["role", "entity_id", "type"],
                          {"n_mentions": "sum", "n_turns": "sum"})


def entity_mention_timeseries(ds, dictionary_path: str, *,
                              bucket_us: int = _DAY_US, concurrency=None):
    """Per-entity activity time series: (entity_id, bucket, n) mention
    counts per time bucket — the trend table burst detection and KG
    freshness dashboards read.  Same fused detect+collapse plan as
    entity_lifespan (EntityLifespanCells), stopping at the
    (entity, bucket) merge."""
    from deepkg_ray.stages.treeagg import merge_partials
    from deepkg_ray.util import stateful_map
    cells = stateful_map(ds, EntityLifespanCells,
                         {"dictionary_path": dictionary_path,
                          "bucket_us": bucket_us},
                         concurrency=concurrency, batch_size=None)
    return merge_partials(cells, ["entity_id", "bucket"], {"n": "sum"})


def entity_burst_shares(ds, dictionary_path: str, *,
                        bucket_us: int = _DAY_US, concurrency=None):
    """Burst concentration per entity: (entity_id, peak_n, total_n,
    peak_share) where peak_share = round6(max bucket count / total) — a
    bursty entity (event-driven) scores near 1, a steady one near
    1/n_buckets.  Derived from the (entity, bucket) cells with one more
    dictionary-bounded merge; peak_share is round6 in double (the driver
    float convention)."""
    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.treeagg import merge_partials

    cells = entity_mention_timeseries(ds, dictionary_path,
                                      bucket_us=bucket_us,
                                      concurrency=concurrency)

    def to_partial(b: pa.Table) -> pa.Table:
        return pa.table({
            "entity_id": b["entity_id"].combine_chunks().cast(pa.int64()),
            "peak_n": b["n"].combine_chunks().cast(pa.int64()),
            "total_n": b["n"].combine_chunks().cast(pa.int64())})

    per_ent = merge_partials(
        cells.map_batches(to_partial, batch_format="pyarrow"),
        ["entity_id"], {"peak_n": "max", "total_n": "sum"})

    def finish(b: pa.Table) -> pa.Table:
        peak = b["peak_n"].to_numpy(zero_copy_only=False).astype(np.float64)
        tot = b["total_n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return b.append_column("peak_share", pa.array(round6(peak / tot)))

    return per_ent.map_batches(finish, batch_format="pyarrow")


def entity_transitions(mentions, n_parts: int = 64, mode: str = "auto"):
    """Entity transition edges across consecutive turns: (e1, e2, n) =
    number of (turn t, turn t+1) adjacencies within one conversation
    where e1 is mentioned in t and e2 in t+1 (entities deduped per turn)
    — the discourse-flow graph (what gets talked about after what) that
    complements same-turn cooccurrence_counts.

    Plan: conversation-complete coarse hash partitions (the turn_latency
    shape — per-turn mention sets must meet their successor turn, which
    can live in another read block); per partition one vectorized
    dedup + self-merge on turn_idx+1; the (e1, e2) count merge is
    dictionary²-bounded (cardinality-auto for open vocabularies)."""
    import pandas as pd

    from deepkg_ray.stages.treeagg import merge_partials

    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b["conv_id"].to_pylist())
        return pa.table({
            "conv_id": b["conv_id"],
            "turn_idx": b["turn_idx"].combine_chunks().cast(pa.int64()),
            "entity_id": b["entity_id"],
            "part": pa.array((h % np.uint64(n_parts)).astype(np.int32))})

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["conv_id", "turn_idx", "entity_id"]].drop_duplicates()
        nxt = d.assign(turn_idx=d["turn_idx"] - 1)
        m = d.merge(nxt, on=["conv_id", "turn_idx"],
                    suffixes=("_1", "_2"))
        out = (m.groupby(["entity_id_1", "entity_id_2"], as_index=False)
               .size().rename(columns={"entity_id_1": "e1",
                                       "entity_id_2": "e2", "size": "n"}))
        out["n"] = out["n"].astype("int64")
        return out

    parted = (mentions.select_columns(["conv_id", "turn_idx", "entity_id"])
              .map_batches(add_part, batch_format="pyarrow"))
    pairs = parted.groupby("part").map_groups(per_partition,
                                              batch_format="pandas")
    return merge_partials(pairs, ["e1", "e2"], {"n": "sum"}, mode=mode)


def alias_usage(mentions, mode: str = "auto"):
    """Alias-usage distribution per entity: (entity_id, surface, n,
    share) — which surface form carries each entity's mentions (the
    canonicalization evidence table an alias-dictionary curator reads;
    a near-zero share flags a stale alias).  share = round6(n / entity
    total), computed on the dictionary-bounded merged cells."""
    import pandas as pd

    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.treeagg import merge_partials

    def cells(b: pa.Table) -> pd.DataFrame:
        g = (pd.DataFrame({
            "entity_id": b["entity_id"].to_numpy(zero_copy_only=False),
            "surface": b["surface"].to_pylist()})
            .groupby(["entity_id", "surface"], as_index=False).size()
            .rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        return g

    merged = merge_partials(
        mentions.select_columns(["entity_id", "surface"]).map_batches(
            cells, batch_format="pyarrow"),
        ["entity_id", "surface"], {"n": "sum"}, mode=mode)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("entity_id")["n"].transform("sum")
        df = df.copy()
        df["share"] = round6(df["n"].to_numpy(np.float64)
                             / tot.to_numpy(np.float64))
        return df

    return merged.map_batches(finish, batch_format="pandas",
                              batch_size=None)


def mention_concentration_gini(mentions, mode: str = "auto"):
    """Mention-concentration Gini per entity TYPE: how unequally the
    type's mention mass distributes over its entities — a spiking Gini
    means a few head entities dominate the type (the KG skew diagnostic
    that predicts hot-key trouble for entity-partitioned stages).
    Sorted-form exact-integer Gini (the source_length_gini identity) on
    the dictionary-bounded per-entity counts.  Returns
    (type, n_entities, sum_mentions, gini_num, gini)."""
    import pandas as pd

    from deepkg_ray.stages.treeagg import merge_partials

    def cells(b: pa.Table) -> pd.DataFrame:
        g = (pd.DataFrame({
            "type": b["type"].to_pylist(),
            "entity_id": b["entity_id"].to_numpy(zero_copy_only=False)})
            .groupby(["type", "entity_id"], as_index=False).size()
            .rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        return g

    merged = merge_partials(
        mentions.select_columns(["type", "entity_id"]).map_batches(
            cells, batch_format="pyarrow"),
        ["type", "entity_id"], {"n": "sum"}, mode=mode)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in df.groupby("type"):
            x = np.sort(g["n"].to_numpy(np.int64))
            n = len(x)
            sx = int(x.sum())
            num = int(2 * np.sum(np.arange(1, n + 1, dtype=np.int64) * x)
                      - (n + 1) * sx)
            rows.append((t, n, sx, num,
                         float(num) / float(n * sx) if sx else 0.0))
        return pd.DataFrame(rows, columns=["type", "n_entities",
                                           "sum_mentions", "gini_num",
                                           "gini"])

    return merged.repartition(1).map_batches(finish,
                                             batch_format="pandas",
                                             batch_size=None)


def entity_introducer(ds, dictionary_path: str, *, concurrency=None,
                      n_parts: int = 64):
    """Who introduces entities into conversations: for every (conv,
    entity) the ROLE of its first-mentioning turn, rolled up to
    (role, type, n_introduced) — the initiative signal conversational
    KG curation slices by (user-introduced entities are asks,
    assistant-introduced ones are knowledge injection).
    ds must carry (conv_id, turn_idx, role, text_norm).

    Plan: RoleEntityCells' fused detect+attach emits batch-local
    (conv, entity, type, first turn, role) argmin candidates; the
    global argmin folds inside conv-complete coarse partitions (a
    conversation never straddles, so partition rows are FINAL), and
    the (role, type) rollup is dictionary-bounded.  Returns
    (role, type, n_introduced)."""
    import pandas as pd

    from deepkg_ray.stages.treeagg import merge_partials
    from deepkg_ray.util import stateful_map

    class IntroCells(DictionaryMentionDetector):
        def __call__(self, batch: pa.Table) -> pa.Table:
            men = DictionaryMentionDetector.__call__(self, batch)
            if men.num_rows == 0:
                return pa.table({
                    "conv_id": pa.array([], pa.string()),
                    "entity_id": pa.array([], pa.int64()),
                    "type": pa.array([], pa.string()),
                    "turn_idx": pa.array([], pa.int64()),
                    "role": pa.array([], pa.string())})
            bm = pd.DataFrame({
                "conv_id": batch["conv_id"].to_pylist(),
                "turn_idx": batch["turn_idx"]
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64),
                "role": batch["role"].to_pylist()})
            md = pd.DataFrame({
                "conv_id": men["conv_id"].to_pylist(),
                "turn_idx": men["turn_idx"]
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64),
                "entity_id": men["entity_id"]
                             .to_numpy(zero_copy_only=False),
                "type": men["type"].to_pylist()})
            j = (md.merge(bm, on=["conv_id", "turn_idx"], how="left",
                          sort=False)
                 .sort_values(["conv_id", "entity_id", "turn_idx"],
                              kind="stable")
                 .groupby(["conv_id", "entity_id"], sort=False).head(1))
            return pa.Table.from_pandas(
                j[["conv_id", "entity_id", "type", "turn_idx", "role"]],
                preserve_index=False)

    cells = stateful_map(ds, IntroCells,
                         {"dictionary_path": dictionary_path},
                         concurrency=concurrency)

    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b["conv_id"].to_pylist())
        return b.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32)))

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        first = (g.sort_values(["conv_id", "entity_id", "turn_idx"],
                               kind="stable")
                 .groupby(["conv_id", "entity_id"], sort=False).head(1))
        out = (first.groupby(["role", "type"], as_index=False).size()
               .rename(columns={"size": "n_introduced"}))
        out["n_introduced"] = out["n_introduced"].astype("int64")
        return out

    return merge_partials(
        cells.map_batches(add_part, batch_format="pyarrow")
        .groupby("part").map_groups(per_partition,
                                    batch_format="pandas"),
        ["role", "type"], {"n_introduced": "sum"})


def entity_relatedness(mentions, mode: str = "auto"):
    """Entity-relatedness edges by shared conversations: for every
    entity pair mentioned together in ≥1 conversation, the
    conversation-set Jaccard |convs(a) ∩ convs(b)| / |convs(a) ∪
    convs(b)| — the distributional-similarity complement of
    cooccurrence_counts (same turn) and entity_transitions (adjacent
    turns): co-presence at CONVERSATION grain, degree-normalized.

    Plan: (conv, entity) presence cells dedupe on the merge tree;
    pair intersections fan out per conversation inside conv-complete
    partitions (bounded by per-conv entity counts) and merge on the
    entity²-bounded pair grid; per-entity conv counts fold from the
    same presence cells (dictionary-bounded) and attach in the final
    pair task as a broadcast map.  One round6 division per pair.
    Returns (e1, e2, n_a, n_b, n_inter, jaccard)."""
    import pandas as pd
    import ray

    from deepkg_ray.stages.treeagg import merge_partials
    from deepkg_ray.util import rows_all

    def cells(b: pa.Table) -> pd.DataFrame:
        g = (pd.DataFrame({
            "conv_id": b["conv_id"].to_pylist(),
            "entity_id": b["entity_id"].to_numpy(zero_copy_only=False)})
            .drop_duplicates())
        g["one"] = np.int64(1)
        return g

    presence = merge_partials(
        mentions.select_columns(["conv_id", "entity_id"]).map_batches(
            cells, batch_format="pyarrow"),
        ["conv_id", "entity_id"], {"one": "first"}, mode=mode
    ).materialize()

    deg = merge_partials(
        presence.map_batches(
            lambda b: pd.DataFrame({
                "entity_id": b["entity_id"].to_numpy(
                    zero_copy_only=False),
                "n_convs": np.ones(b.num_rows, np.int64)}),
            batch_format="pyarrow"),
        ["entity_id"], {"n_convs": "sum"})
    deg_map = {int(r["entity_id"]): int(r["n_convs"])
               for r in rows_all(deg)}
    deg_ref = ray.put(deg_map)

    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b["conv_id"].to_pylist())
        return b.append_column(
            "part", pa.array((h % np.uint64(64)).astype(np.int32)))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["conv_id", "entity_id"]]
        m = d.merge(d, on="conv_id", suffixes=("_1", "_2"))
        m = m[m["entity_id_1"] < m["entity_id_2"]]
        out = (m.groupby(["entity_id_1", "entity_id_2"], as_index=False)
               .size().rename(columns={"entity_id_1": "e1",
                                       "entity_id_2": "e2",
                                       "size": "n_inter"}))
        out["n_inter"] = out["n_inter"].astype("int64")
        return out

    pair_counts = merge_partials(
        presence.map_batches(add_part, batch_format="pyarrow")
        .groupby("part").map_groups(pairs, batch_format="pandas"),
        ["e1", "e2"], {"n_inter": "sum"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        dm = ray.get(deg_ref)
        na = df["e1"].map(dm).to_numpy(np.int64)
        nb = df["e2"].map(dm).to_numpy(np.int64)
        inter = df["n_inter"].to_numpy(np.int64)
        jac = np.floor(inter / (na + nb - inter) * 1e6 + 0.5) / 1e6
        return df.assign(n_a=na, n_b=nb, jaccard=jac)

    return pair_counts.map_batches(finish, batch_format="pandas")


def conv_entity_entropy(mentions, mode: str = "auto"):
    """Per-conversation entity-mention Shannon entropy (nats): a focused
    conversation (one entity dominates) scores near 0, a roaming one
    near ln(n_entities) — the topical-focus curation signal over the
    (conv, entity) cells.  Per-class terms quantize to ln-micros and
    integer-sum (the module convention); one division per conversation.
    Returns (conv_id, n_mentions, n_entities, entropy)."""
    import pandas as pd

    from deepkg_ray.stages.treeagg import merge_partials

    def cells(b: pa.Table) -> pd.DataFrame:
        g = (pd.DataFrame({
            "conv_id": b["conv_id"].to_pylist(),
            "entity_id": b["entity_id"].to_numpy(zero_copy_only=False)})
            .groupby(["conv_id", "entity_id"], as_index=False).size()
            .rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        return g

    merged = merge_partials(
        mentions.select_columns(["conv_id", "entity_id"]).map_batches(
            cells, batch_format="pyarrow"),
        ["conv_id", "entity_id"], {"n": "sum"}, mode=mode)

    # a conversation's cells must meet in ONE task (the merge is keyed
    # (conv, entity), so a conv can straddle blocks): conv-complete
    # coarse hash partitions, the turn_latency shape — scales with convs
    def add_part(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        h = stable_hash64_batch(b["conv_id"].to_pylist())
        return b.append_column(
            "part", pa.array((h % np.uint64(64)).astype(np.int32)))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("conv_id")["n"].transform("sum") \
            .to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        p = n / tot
        df = df.assign(hm=np.floor(-p * np.log(p) * 1e6 + 0.5)
                       .astype(np.int64))
        g = (df.groupby("conv_id", as_index=False)
             .agg(n_mentions=("n", "sum"), n_entities=("n", "size"),
                  hm=("hm", "sum")))
        g["n_mentions"] = g["n_mentions"].astype("int64")
        g["n_entities"] = g["n_entities"].astype("int64")
        g["entropy"] = g["hm"].to_numpy(np.int64).astype(np.float64) / 1e6
        return g.drop(columns=["hm"])

    return (merged.map_batches(add_part, batch_format="pyarrow")
            .groupby("part").map_groups(finish, batch_format="pandas"))
