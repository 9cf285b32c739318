"""Sharded entity-dictionary tiers for mention detection and BM25 linking.

The broadcast tiers (mention.DictionaryMentionDetector, linking.BM25Index)
load the FULL alias dictionary into every worker — the right plan for the
reference's ~40k-name ICD dictionary (Bulid_Data_Model.py:32-35,
ES_Model.py:11-67 likewise hold one whole index per process), but SURVEY §7.5
flags the open hard part: "dictionary must stay broadcastable (cap size /
shard the index if not)".  This module is the above-the-cap tier:

- **Mention detection** (`detect_mentions_sharded`): the dictionary is
  hash-partitioned into ``n_shards`` disjoint surface sets; the transcript
  stream is REPLICATED over the shards (one stateful pass per shard, each
  actor holding 1/S of the automaton); per-shard passes emit *candidate*
  matches — at every text position, the longest shard-local surface
  starting there (a zero-width lookahead scan, so candidates a shard's own
  greedy scan would jump over are still emitted); a conversation-partitioned
  resolve step then replays the reference trie's global greedy semantics
  (maximal forward match: leftmost start, longest surface, jump past the
  match — AutoNER/src/string_match.h:21-99) over the union.  The resolved
  output is IDENTICAL to the broadcast tier's (tier-agreement-tested), and
  per-actor memory drops from O(|dict|) to O(|dict|/S).

- **BM25 candidate generation** (`bm25_candidates_sharded`): the name
  corpus is hash-partitioned by entity; every shard actor holds its slice's
  dense tf matrix — the memory hog of linking.BM25Index is the
  n_docs × vocab matrix, so resident state drops by S — while idf / avgdl
  come from ONE global-stats sweep (term df is corpus-global; a shard-local
  idf would change scores).  The term-vocabulary stats dict is the piece
  assumed broadcastable — vocab grows ~Heaps-sublinearly in n_docs, so it
  outlives the matrix by orders of magnitude.  Per-shard micros-exact
  top-N (identical op order to BM25Index.scores_micros ⇒ identical
  per-doc scores), then a query-partitioned merge keeps the global top-N
  by (score desc, entity_id asc).  Output is row-identical to
  linking.CandidateGenerator(exact=True).

Shuffle shape at 100 TB: the transcript/query stream is scanned S times
(replication factor = shard count — the standard dictionary-partitioned
join trade: S small, chosen as ceil(|dict| / broadcast_cap)); candidates /
per-shard top-N rows are the only shuffled payload, bounded by matches
(not text) and S·N per query respectively.  Nothing dictionary-shaped is
ever collected on the driver.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from deepkg_ray.functions.hashing import stable_hash64_batch
from deepkg_ray.stages.mention import MENTION_SCHEMA

# ------------------------------------------------------------------ mentions


def load_alias_shard(dictionary_path: str, n_shards: int, shard_idx: int
                     ) -> dict[str, tuple[int, str, str]]:
    """surface → (entity_id, type, name) for surfaces hashed to this shard.
    Surface-hash partitioning keeps shard sets disjoint and deterministic
    across processes (stable_hash64, no PYTHONHASHSEED).  The dictionary
    STREAMS through iter_batches — resident memory is the kept shard plus
    one row batch, never the whole alias table (the entire point of the
    above-broadcast tier)."""
    out: dict[str, tuple[int, str, str]] = {}
    pf = pq.ParquetFile(dictionary_path)
    for rb in pf.iter_batches(
            columns=["entity_id", "name", "type", "aliases"],
            batch_size=65536):
        t = pa.Table.from_batches([rb])
        surfs, metas = [], []
        for eid, name, etype, aliases in zip(
                t["entity_id"].to_pylist(), t["name"].to_pylist(),
                t["type"].to_pylist(), t["aliases"].to_pylist()):
            for a in aliases:
                surfs.append(a)
                metas.append((eid, etype, name))
        if not surfs:
            continue
        if n_shards > 1:
            h = stable_hash64_batch(surfs) % np.uint64(n_shards)
            keep = np.flatnonzero(h == np.uint64(shard_idx))
        else:
            keep = range(len(surfs))
        for i in keep:
            out[surfs[i]] = metas[i]
    return out


class ShardCandidateDetector:
    """Per-shard candidate emitter: at EVERY text position, the longest
    shard-local surface starting there (zero-width lookahead over the
    longest-first alternation — ``(?=(a|b|...))`` captures the longest
    alternative at each start because re tries alternatives in order).
    Plain finditer would skip positions inside its own matches, losing
    candidates that the cross-shard greedy resolve needs.

    Emits (conv_id, turn_idx, start, end, surface, entity_id, type) with
    end EXCLUSIVE — the resolve step converts to the inclusive reference
    convention after picking winners."""

    def __init__(self, dictionary_path: str, n_shards: int, shard_idx: int,
                 text_col: str = "text_norm",
                 key_cols: tuple[str, str] = ("conv_id", "turn_idx")):
        self.alias_map = load_alias_shard(dictionary_path, n_shards,
                                          shard_idx)
        ordered = sorted(self.alias_map.keys(), key=len, reverse=True)
        self.rx = (re.compile(
            "(?=(" + "|".join(re.escape(s) for s in ordered) + "))")
            if ordered else None)
        self.text_col = text_col
        self.key_cols = key_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "start": pa.array([], pa.int64()),
            "end": pa.array([], pa.int64()),
            "surface": pa.array([], pa.string()),
            "entity_id": pa.array([], pa.int64()),
            "type": pa.array([], pa.string())})
        if self.rx is None:
            return empty
        texts = batch[self.text_col].to_pylist()
        blob = "\x00".join(texts)
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                           count=len(texts))
        starts = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lens[:-1] + 1, out=starts[1:])

        m_pos, m_surf = [], []
        for m in self.rx.finditer(blob):
            m_pos.append(m.start())
            m_surf.append(m.group(1))
        if not m_pos:
            return empty
        pos = np.asarray(m_pos, dtype=np.int64)
        slen = np.fromiter((len(s) for s in m_surf), dtype=np.int64,
                           count=len(m_surf))
        row = np.searchsorted(starts, pos, side="right") - 1
        local = pos - starts[row]
        k0, k1 = self.key_cols
        meta = [self.alias_map[s] for s in m_surf]
        return pa.table({
            "conv_id": batch[k0].take(pa.array(row, pa.int64())),
            "turn_idx": batch[k1].take(pa.array(row, pa.int64()))
                        .combine_chunks().cast(pa.int32()),
            "start": pa.array(local, pa.int64()),
            "end": pa.array(local + slen, pa.int64()),
            "surface": pa.array(m_surf, pa.string()),
            "entity_id": pa.array([m[0] for m in meta], pa.int64()),
            "type": pa.array([m[1] for m in meta], pa.string())})


def _resolve_greedy(g: pd.DataFrame) -> pd.DataFrame:
    """Replay the full-dictionary greedy scan over the merged candidate
    set: per text, walk candidates by (start asc, end desc); emit a
    candidate iff its start is at/past the cursor, then jump the cursor to
    its end.  Distinct same-length surfaces can't collide at one position
    (they'd have to equal the same substring), so the longest candidate at
    each start is unique and the replay is deterministic."""
    g = g.sort_values(["conv_id", "turn_idx", "start", "end"],
                      ascending=[True, True, True, False],
                      kind="stable")
    conv = g["conv_id"].to_numpy(object)
    turn = g["turn_idx"].to_numpy(np.int64)
    start = g["start"].to_numpy(np.int64)
    end = g["end"].to_numpy(np.int64)
    keep = np.zeros(len(g), dtype=bool)
    cur_key: tuple | None = None
    cursor = 0
    for i in range(len(g)):
        key = (conv[i], turn[i])
        if key != cur_key:
            cur_key, cursor = key, 0
        if start[i] >= cursor:
            keep[i] = True
            cursor = end[i]
    out = g.loc[keep]
    return pd.DataFrame({
        "conv_id": out["conv_id"].astype(str),
        "turn_idx": out["turn_idx"].astype(np.int32),
        "start_idx": out["start"].astype(np.int32),
        "end_idx": (out["end"] - 1).astype(np.int32),   # inclusive
        "type": out["type"].astype(str),
        "surface": out["surface"].astype(str),
        "entity_id": out["entity_id"].astype(np.int64)})


def detect_mentions_sharded(ds, dictionary_path: str, *, n_shards: int,
                            concurrency=None, batch_size: int | None = None,
                            n_parts: int = 64,
                            materialize_input: bool = False):
    """transcripts (with text_norm) → mentions, dictionary sharded S ways.
    One stateful candidate pass per shard over the replicated stream, then
    conversation-complete coarse partitions resolve the global greedy
    winners (a turn's candidates from different shards must meet in one
    task; partitioning by conv hash reuses the engine-wide turn_latency
    shape and keeps groups coarse).

    ``materialize_input=False`` (default) lets each shard pass re-execute
    the read+normalize lineage — the scale-correct posture (a 100 TB
    corpus cannot pin in the object store, and S columnar re-reads of
    cheap storage beat spill-thrashing; measured parity at sf0.1, 9.9 s
    pinned vs 10.4 s re-read, because the scan is a small share of the
    regex work).  Pass True to pin the upstream blocks once and re-scan
    zero-copy — the right call when the upstream lineage is EXPENSIVE
    (a model-scored or heavily-joined stream), not a bare read."""
    from deepkg_ray.util import stateful_map

    if materialize_input:
        ds = ds.materialize()
    shards = [stateful_map(ds, ShardCandidateDetector,
                           {"dictionary_path": dictionary_path,
                            "n_shards": n_shards, "shard_idx": i},
                           concurrency=concurrency, batch_size=batch_size)
              for i in range(n_shards)]
    cand = shards[0]
    for s in shards[1:]:
        cand = cand.union(s)

    def add_part(b: pa.Table) -> pa.Table:
        h = stable_hash64_batch(b["conv_id"].to_pylist())
        return b.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32)))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        return _resolve_greedy(g.drop(columns=["part"]))

    out = (cand.map_batches(add_part, batch_format="pyarrow")
           .groupby("part").map_groups(resolve, batch_format="pandas"))
    return out.map_batches(
        lambda b: b.select(MENTION_SCHEMA.names).cast(MENTION_SCHEMA),
        batch_format="pyarrow")


def dictionary_surface_count(dictionary_path: str) -> int:
    """Total alias-surface count — the broadcast-gate probe.  Streams the
    single list column batch by batch (never resident all at once; at
    real scale this probe is trivially cheap next to shipping the
    dictionary to every worker)."""
    import pyarrow.compute as pc
    n = 0
    pf = pq.ParquetFile(dictionary_path)
    for rb in pf.iter_batches(columns=["aliases"], batch_size=65536):
        n += int(pc.sum(pc.list_value_length(rb.column(0))).as_py() or 0)
    return n


# ------------------------------------------------------------------ BM25

_GLOBAL_STATS_CACHE: dict = {}


def bm25_global_stats(dictionary_path: str, mode: str = "word",
                      k1: float = 1.5, b: float = 0.75):
    """One streaming sweep over the name corpus → the corpus-global pieces
    every shard needs: micros-rounded idf per term (round6, the
    BM25Index._exact_arrays convention so sharded == broadcast bit-for-bit)
    and the per-doc length denominator's avgdl.  O(vocab) resident — the
    documented broadcastable remainder once the dense matrix is sharded.
    Worker-process memoized (every shard instance in a worker shares it)."""
    key = (dictionary_path, mode, k1, b)
    hit = _GLOBAL_STATS_CACHE.get(key)
    if hit is not None:
        return hit
    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.linking import cut

    df: dict[str, int] = {}
    n_docs = 0
    sum_dl = 0
    pf = pq.ParquetFile(dictionary_path)
    for rb in pf.iter_batches(columns=["name"]):
        for name in rb.column(0).to_pylist():
            toks = cut(name, mode)
            n_docs += 1
            sum_dl += len(toks)
            for t in set(toks):
                df[t] = df.get(t, 0) + 1
    terms = list(df.keys())
    dfv = np.fromiter((df[t] for t in terms), np.float64, count=len(terms))
    idf = np.asarray(round6(
        np.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0)), np.float64)
    idf_map = dict(zip(terms, idf))
    avgdl = sum_dl / n_docs if n_docs else 1.0
    stats = {"idf": idf_map, "avgdl": avgdl, "n_docs": n_docs}
    _GLOBAL_STATS_CACHE[key] = stats
    return stats


class ShardedBM25Candidates:
    """Per-shard BM25 scorer: holds the dense tf matrix for ITS entity
    slice only (hash(entity_id) % n_shards), scores with global idf/avgdl
    in the exact op order of BM25Index.scores_micros, and emits the
    shard-local top-N (positive scores, score desc / entity_id asc) as
    score_micros rows for the cross-shard merge."""

    def __init__(self, dictionary_path: str, n_shards: int, shard_idx: int,
                 mode: str = "word", top_n: int = 10,
                 text_col: str = "surface",
                 k1: float = 1.5, b: float = 0.75):
        from deepkg_ray.stages.linking import cut
        stats = bm25_global_stats(dictionary_path, mode, k1, b)
        self.mode, self.top_n, self.text_col = mode, top_n, text_col
        self.k1, self.b = k1, b

        # stream the name corpus, keeping only this shard's slice —
        # resident memory is the shard, plus one row batch in flight
        from deepkg_ray.functions.hashing import mix64
        eid_parts: list[np.ndarray] = []
        names: list[str] = []
        pf = pq.ParquetFile(dictionary_path)
        for rb in pf.iter_batches(columns=["entity_id", "name"],
                                  batch_size=65536):
            eids = np.asarray(rb.column(0).to_pylist(), np.int64)
            nms = rb.column(1).to_pylist()
            if n_shards > 1:
                keep = (mix64(eids.astype(np.uint64))
                        % np.uint64(n_shards)) == np.uint64(shard_idx)
                eids = eids[keep]
                nms = [n for n, k in zip(nms, keep) if k]
            eid_parts.append(eids)
            names.extend(nms)
        self.entity_ids = (np.concatenate(eid_parts) if eid_parts
                           else np.empty(0, np.int64))
        self.names = names

        docs = [cut(n, mode) for n in names]
        self.vocab: dict[str, int] = {}
        rows, cols, vals = [], [], []
        dl = np.zeros(len(docs), np.float64)
        for i, toks in enumerate(docs):
            dl[i] = len(toks)
            tf: dict[int, int] = {}
            for tok in toks:
                j = self.vocab.setdefault(tok, len(self.vocab))
                tf[j] = tf.get(j, 0) + 1
            for j, c in tf.items():
                rows.append(i); cols.append(j); vals.append(c)
        self.tf = np.zeros((len(docs), len(self.vocab)), np.float64)
        if rows:
            self.tf[rows, cols] = vals
        idf_map = stats["idf"]
        self.idf = np.fromiter(
            (idf_map.get(t, 0.0) for t in self.vocab), np.float64,
            count=len(self.vocab))
        # doc-length denominator from GLOBAL avgdl — the piece a
        # shard-local average would get wrong
        self.denom = self.k1 * (1.0 - self.b
                                + self.b * dl / max(stats["avgdl"], 1e-9))

    def _scores_micros(self, query: str) -> np.ndarray:
        from deepkg_ray.stages.linking import cut
        s = np.zeros(self.tf.shape[0], np.int64)
        for t in cut(query, self.mode):
            j = self.vocab.get(t)
            if j is None:
                continue
            tf_j = self.tf[:, j]
            contrib = (self.idf[j] * tf_j * (self.k1 + 1.0)
                       / (tf_j + self.denom))
            s += np.floor(contrib * 1e6 + 0.5).astype(np.int64)
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        queries = batch[self.text_col].to_pylist()
        q_out, cid, cname, sm = [], [], [], []
        for q in queries:
            s = self._scores_micros(q)
            pos = np.flatnonzero(s > 0)
            if len(pos) == 0:
                continue
            order = np.lexsort((self.entity_ids[pos], -s[pos]))
            for i in order[:min(self.top_n, len(pos))]:
                k = pos[i]
                q_out.append(q)
                cid.append(int(self.entity_ids[k]))
                cname.append(self.names[k])
                sm.append(int(s[k]))
        return pa.table({
            "query": pa.array(q_out, pa.string()),
            "candidate_id": pa.array(cid, pa.int64()),
            "candidate_name": pa.array(cname, pa.string()),
            "score_micros": pa.array(sm, pa.int64())})


def bm25_candidates_sharded(queries_ds, dictionary_path: str, *,
                            n_shards: int, top_n: int = 10,
                            mode: str = "word", text_col: str = "surface",
                            concurrency=None, n_parts: int = 64):
    """Query stream → global BM25 top-N with the name index sharded S
    ways.  Per-shard top-N is sufficient (every global winner lives in
    some shard and survives that shard's cut); the merge re-ranks the
    ≤ S·N union per query by (score desc, entity_id asc) inside
    query-hash partitions.  Output rows/columns identical to
    linking.CandidateGenerator(exact=True)."""
    from deepkg_ray.util import stateful_map

    shards = [stateful_map(queries_ds, ShardedBM25Candidates,
                           {"dictionary_path": dictionary_path,
                            "n_shards": n_shards, "shard_idx": i,
                            "mode": mode, "top_n": top_n,
                            "text_col": text_col},
                           concurrency=concurrency)
              for i in range(n_shards)]
    cand = shards[0]
    for s in shards[1:]:
        cand = cand.union(s)

    def add_part(b: pa.Table) -> pa.Table:
        h = stable_hash64_batch(b["query"].to_pylist())
        return b.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32)))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["query", "score_micros", "candidate_id"],
                          ascending=[True, False, True], kind="stable")
        g = g.groupby("query", sort=False).head(top_n)
        g["rank"] = g.groupby("query", sort=False).cumcount() \
            .astype(np.int32)
        g["score"] = g["score_micros"].to_numpy(np.int64) / 1e6
        return g[["query", "candidate_id", "candidate_name", "score",
                  "rank"]]

    out = (cand.map_batches(add_part, batch_format="pyarrow")
           .groupby("part").map_groups(merge, batch_format="pandas"))
    schema = pa.schema([("query", pa.string()),
                        ("candidate_id", pa.int64()),
                        ("candidate_name", pa.string()),
                        ("score", pa.float64()),
                        ("rank", pa.int32())])
    return out.map_batches(lambda b: b.select(schema.names).cast(schema),
                           batch_format="pyarrow")


def detect_mentions_multi(ds, dictionary_paths: list[str], *,
                          concurrency=None, batch_size: int | None = None,
                          n_parts: int = 64,
                          candidate_cache_dir: str | None = None):
    """Mention detection over a PARTITIONED dictionary — the
    dictionary-DELTA ingest path: each dictionary file runs its own
    candidate pass (ShardCandidateDetector with the whole file as one
    shard), and the global greedy resolve reproduces full-dictionary
    maximal matching exactly.  Maximal-forward matching is NOT
    compositional (a new alias can change existing match boundaries), so
    the incremental design keeps the non-compositional step — resolve —
    cheap and re-runnable while the expensive corpus scans stay
    per-dictionary-file.

    ``candidate_cache_dir``: if set, each file's candidate stream is
    written to ``<dir>/<md5(path)>/`` on first use and read back on
    subsequent calls — when a delta dictionary arrives, ONLY the delta
    file's corpus scan runs; base candidates load from parquet.  The
    cache key is the dictionary file path: bump the file name when its
    contents change (the synth-cache convention)."""
    import hashlib
    import os

    import ray.data as rd

    from deepkg_ray.util import stateful_map

    streams = []
    for path in dictionary_paths:
        cache = None
        if candidate_cache_dir is not None:
            cache = os.path.join(
                candidate_cache_dir,
                hashlib.md5(path.encode()).hexdigest())
        if cache is not None and os.path.exists(
                os.path.join(cache, "_COMPLETE")):
            streams.append(rd.read_parquet(cache))
            continue
        cand = stateful_map(ds, ShardCandidateDetector,
                            {"dictionary_path": path, "n_shards": 1,
                             "shard_idx": 0},
                            concurrency=concurrency,
                            batch_size=batch_size)
        if cache is not None:
            tmp = cache + f".tmp{os.getpid()}"
            if os.path.exists(tmp):
                import shutil
                shutil.rmtree(tmp)
            cand.write_parquet(tmp)
            os.replace(tmp, cache)
            with open(os.path.join(cache, "_COMPLETE"), "w") as f:
                f.write("ok")
            cand = rd.read_parquet(cache)
        streams.append(cand)

    cand = streams[0]
    for s in streams[1:]:
        cand = cand.union(s)

    def add_part(b: pa.Table) -> pa.Table:
        h = stable_hash64_batch(b["conv_id"].to_pylist())
        return b.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32)))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        return _resolve_greedy(g.drop(columns=["part"]))

    from deepkg_ray.stages.mention import MENTION_SCHEMA
    out = (cand.map_batches(add_part, batch_format="pyarrow")
           .groupby("part").map_groups(resolve, batch_format="pandas"))
    return out.map_batches(
        lambda b: b.select(MENTION_SCHEMA.names).cast(MENTION_SCHEMA),
        batch_format="pyarrow")
