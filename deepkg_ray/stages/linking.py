"""Entity linking: mention/triple surfaces → canonical entity ids.

Two tiers, mirroring the reference's Normalization module:

1. **Exact tier** — surface is a known dictionary alias: broadcast hash
   lookup (the dictionary is the small side; analog of the reference's
   id↔name maps, Bulid_Data_Model.py:32-35).  No shuffle: the map rides in
   the actor constructor, per SURVEY.md §2.4.

2. **Fuzzy tier** — unseen surfaces get candidate generation + scoring:
   - BM25 over the tokenized dictionary (semantics of
     Normalization/recall/model/BM25_Model.py:38-72: Okapi BM25, per-query
     scores against every dictionary entry, top-N by score), and
   - char-ngram cosine (the model-free stand-in for the SimCSE embedding
     recall stage, SimCSE-Chinese-Pytorch/simcse_unsup.py:44-76).
   Both are per-row top-k via ``np.argpartition`` — a per-query sort over
   the dictionary, NOT a dataset shuffle (SURVEY.md §2.6).

Cut modes (char / word / ngram) mirror BM25_Model.py:22-28 /
text_preprocess.py:17-116.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from deepkg_ray.stages.mention import load_alias_map

_WORD_RE = re.compile(r"[a-z0-9]+")


def cut(text: str, mode: str = "word", n: int = 2, segmenter=None) -> list[str]:
    """Tokenization modes analog of the reference's cut-function adapter dict
    (BM25_Model.py:22-28): 'word' (\\w+ tokens), 'char', 'ngram' (char
    n-grams), 'dict' (jieba-semantics dictionary-DP segmentation — pass a
    functions/zh.DictSegmenter built from the user dictionary, the analog of
    jieba.load_userdict)."""
    if mode == "word":
        return _WORD_RE.findall(text)
    if mode == "char":
        return [c for c in text if not c.isspace()]
    if mode == "ngram":
        s = text.replace(" ", "")
        return [s[i:i + n] for i in range(max(1, len(s) - n + 1))]
    if mode == "dict":
        if segmenter is None:
            raise ValueError("mode='dict' needs a zh.DictSegmenter")
        return [w for w in segmenter.cut(text) if not w.isspace()]
    raise ValueError(mode)


class BM25Index:
    """Okapi BM25 over a (small, broadcastable) name dictionary.

    Vectorized: document term-frequency matrix is materialized dense
    (n_docs × vocab) at build time — the dictionary side is small by design
    (the reference's ICD dictionary is ~40k names; ours smaller). Scoring a
    query touches only its term columns.
    """

    def __init__(self, names: list[str], mode: str = "word", k1: float = 1.5,
                 b: float = 0.75):
        self.names = names
        self.mode = mode
        self.k1, self.b = k1, b
        docs = [cut(n, mode) for n in names]
        self.vocab: dict[str, int] = {}
        rows, cols, vals = [], [], []
        dl = np.zeros(len(docs), dtype=np.float64)
        for i, toks in enumerate(docs):
            dl[i] = len(toks)
            tf: dict[int, int] = {}
            for t in toks:
                j = self.vocab.setdefault(t, len(self.vocab))
                tf[j] = tf.get(j, 0) + 1
            for j, c in tf.items():
                rows.append(i); cols.append(j); vals.append(c)
        self.tf = np.zeros((len(docs), len(self.vocab)), dtype=np.float32)
        self.tf[rows, cols] = vals
        df = (self.tf > 0).sum(axis=0)
        n_docs = len(docs)
        # Okapi idf with the standard +0.5 smoothing (BM25Okapi semantics
        # used at BM25_Model.py:38-52)
        self.idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0).astype(np.float32)
        avgdl = dl.mean() if n_docs else 1.0
        denom_doc = self.k1 * (1 - self.b + self.b * dl / max(avgdl, 1e-9))
        self.denom_doc = denom_doc.astype(np.float32)

    def scores(self, query: str) -> np.ndarray:
        toks = cut(query, self.mode)
        s = np.zeros(self.tf.shape[0], dtype=np.float32)
        for t in toks:
            j = self.vocab.get(t)
            if j is None:
                continue
            tf_j = self.tf[:, j]
            s += self.idf[j] * tf_j * (self.k1 + 1) / (tf_j + self.denom_doc)
        return s

    def topn(self, query: str, n: int) -> list[tuple[int, float]]:
        s = self.scores(query)
        n = min(n, len(s))
        idx = np.argpartition(-s, n - 1)[:n]
        idx = idx[np.argsort(-s[idx], kind="stable")]
        return [(int(i), float(s[i])) for i in idx]

    def _exact_arrays(self):
        """Float64 mirrors for the micros-exact scoring path, built lazily.
        tf counts and doc lengths are small integers, so the float32→float64
        promotion is exact; idf is recomputed in float64 and pre-rounded to
        micros so the SQL oracle (DuckDB ln, also float64) lands on the
        identical grid (the functions/numeric.py float convention)."""
        if not hasattr(self, "_tf64"):
            from deepkg_ray.functions.numeric import round6
            self._tf64 = self.tf.astype(np.float64)
            df = (self._tf64 > 0).sum(axis=0)
            n_docs = self._tf64.shape[0]
            self._idf64 = np.asarray(round6(
                np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)), np.float64)
            # recompute the doc-length denominator end-to-end in float64
            # (the float32 self.denom_doc would diverge from DuckDB):
            # dl = row sums of integer tf (exact), avgdl = sum/n (exact
            # int sum, one float64 divide — same value DuckDB computes)
            dl = self._tf64.sum(axis=1)
            avgdl = dl.sum() / n_docs
            self._denom64 = self.k1 * (1.0 - self.b + self.b * dl / avgdl)
        return self._tf64, self._idf64, self._denom64

    def scores_micros(self, query: str) -> np.ndarray:
        """Okapi scores as int64 micros: each per-(term, doc) contribution
        is computed in float64 with a fixed expression order
        ``(idf_r * tf) * (k1+1) / (tf + k1*(1-b+b*dl/avgdl))``, rounded to
        int64 micros, then integer-summed — bit-identical to the DuckDB
        oracle (oracle.bm25_topn_oracle) which evaluates the same
        expression left-to-right.  Query-term multiplicity counts, exactly
        as ``scores`` (reference BM25_Model.py:38-52 loops query tokens)."""
        tf64, idf64, denom64 = self._exact_arrays()
        s = np.zeros(tf64.shape[0], dtype=np.int64)
        for t in cut(query, self.mode):
            j = self.vocab.get(t)
            if j is None:
                continue
            tf_j = tf64[:, j]
            contrib = idf64[j] * tf_j * (self.k1 + 1.0) / (tf_j + denom64)
            s += np.floor(contrib * 1e6 + 0.5).astype(np.int64)
        return s

    def topn_micros(self, query: str, n: int,
                    tie_ids: np.ndarray | None = None
                    ) -> list[tuple[int, int]]:
        """(doc_index, score_micros) for the n highest POSITIVE scores,
        ordered by (score desc, tie_ids asc — defaults to doc index).
        Zero-score docs are excluded so the output set is exactly 'docs
        sharing ≥1 query term', the set the SQL oracle's join produces."""
        s = self.scores_micros(query)
        pos = np.flatnonzero(s > 0)
        if len(pos) == 0:
            return []
        ids = pos if tie_ids is None else np.asarray(tie_ids)[pos]
        order = np.lexsort((ids, -s[pos]))[:min(n, len(pos))]
        return [(int(pos[i]), int(s[pos[i]])) for i in order]


class CharNgramVectorizer:
    """Hashing-trick char-ngram cosine — the deterministic, model-free
    stand-in for the SimCSE embedding recall stage (simcse_unsup.py:44-76);
    same contract: unit-norm vectors, inner-product = cosine, top-K."""

    def __init__(self, dim: int = 512, n: int = 3):
        self.dim, self.n = dim, n

    def vectorize(self, texts: list[str]) -> np.ndarray:
        import zlib
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            s = " " + t.replace(" ", "_") + " "
            for j in range(max(1, len(s) - self.n + 1)):
                h = zlib.crc32(s[j:j + self.n].encode()) % self.dim
                out[i, h] += 1.0
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        np.divide(out, norms, out=out, where=norms > 0)
        return out


class CandidateGenerator:
    """Actor-pool stage: mention batch → top-N candidate rows
    (mention surface, candidate entity_id, candidate name, score, rank) —
    the reference's recall-stage output shape (Bulid_Data_Model.py:62-68)."""

    def __init__(self, dictionary_path: str, mode: str = "word", top_n: int = 10,
                 text_col: str = "surface", exact: bool = False):
        t = pq.read_table(dictionary_path)
        self.names = t["name"].to_pylist()
        self.entity_ids = t["entity_id"].to_pylist()
        self.index = BM25Index(self.names, mode=mode)
        self.top_n = top_n
        self.text_col = text_col
        self.exact = exact
        self._tie = np.asarray(self.entity_ids, np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        queries = batch[self.text_col].to_pylist()
        q_out, cid, cname, score, rank = [], [], [], [], []
        for q in queries:
            if self.exact:
                # micros-exact tier: positive-score candidates only,
                # (score desc, entity_id asc) order — the SQL-checkable
                # contract (oracle.bm25_topn_oracle)
                top = [(i, s / 1e6) for i, s in
                       self.index.topn_micros(q, self.top_n, self._tie)]
            else:
                top = [(i, round(s, 6)) for i, s in
                       self.index.topn(q, self.top_n)]
            for r, (i, s) in enumerate(top):
                q_out.append(q)
                cid.append(self.entity_ids[i])
                cname.append(self.names[i])
                score.append(s)
                rank.append(r)
        return pa.table({
            "query": pa.array(q_out, pa.string()),
            "candidate_id": pa.array(cid, pa.int64()),
            "candidate_name": pa.array(cname, pa.string()),
            "score": pa.array(score,
                              pa.float64() if self.exact else pa.float32()),
            "rank": pa.array(rank, pa.int32()),
        })


def generate_candidates(queries_ds, dictionary_path: str, *,
                        top_n: int = 10, mode: str = "word",
                        text_col: str = "surface",
                        broadcast_threshold: int = 200_000,
                        n_shards: int | None = None,
                        concurrency=(1, 4)):
    """BM25 candidate generation with the dictionary-size gate (SURVEY
    §7.5): up to ``broadcast_threshold`` names every actor holds the full
    dense index (CandidateGenerator, micros-exact tier); above it the
    index hash-shards across actors (shardeddict.bm25_candidates_sharded
    — per-slice tf, one global idf/avgdl sweep, cross-shard top-N merge;
    bit-identical scores, tier-agreement-tested).  ``n_shards`` forces a
    tier (1 = broadcast); None auto-picks ceil(names / threshold) from
    parquet row-count metadata (no data read)."""
    if n_shards is None:
        n = pq.ParquetFile(dictionary_path).metadata.num_rows
        n_shards = 1 if n <= broadcast_threshold \
            else -(-n // broadcast_threshold)
    if n_shards > 1:
        from deepkg_ray.stages.shardeddict import bm25_candidates_sharded
        return bm25_candidates_sharded(
            queries_ds, dictionary_path, n_shards=n_shards, top_n=top_n,
            mode=mode, text_col=text_col,
            concurrency=None if isinstance(concurrency, tuple) else
            concurrency)
    return queries_ds.map_batches(
        CandidateGenerator,
        fn_constructor_kwargs={"dictionary_path": dictionary_path,
                               "top_n": top_n, "mode": mode,
                               "text_col": text_col, "exact": True},
        batch_format="pyarrow", concurrency=concurrency)


def coherence_link(mentions, adjacency, dictionary_path, *,
                   top_n: int = 5, n_parts: int = 64,
                   num_partitions: int | None = None,
                   mode: str = "broadcast"):
    """COLLECTIVE entity linking: rerank each mention surface's BM25
    candidates by graph coherence with the other entities mentioned in
    the same conversation — the AIDA/global-coherence step (Hoffart et
    al. 2011) on top of the recall stage, where a candidate scores by

        coh(c | conv, s) = Σ_{e ∈ ctx(conv, s), e ≠ c} w(c, e)

    with ctx the distinct gold entities of the conversation's OTHER
    surfaces and w the undirected canonical-adjacency support weight.
    The winner is (coh desc, bm25 rank asc, entity_id asc); emitting the
    BM25 top-1 next to it makes the query its own ablation (coh_hit vs
    bm25_hit against the alias-map gold).

    Scale shape — the conv-complete coarse-partition pattern (the
    kg_edge_spans / mode_per_user posture), with BOTH model tables
    broadcast: the BM25 candidate table (≤ |aliases|·top_n rows — rides
    the dictionary broadcast gate) and the adjacency neighbor lists
    (entity-pair-dictionary-sized) ship once via ray.put; after the
    distinct-(conv, surface) groupby, ONE groupby over 64 salt-free conv
    hash partitions computes context sets, coherence sums and winners
    task-locally.  Per-candidate cost is O(deg) via a sorted-ents
    searchsorted — linear in mentions, no conv-quadratic expansion (a
    naive per-(surface × ctx-entity) join plan measured 132 s on the
    hot-conversation layout; this runs the whole query in ~8 s).

    ``mode='join'`` is the above-the-gate tier: NO driver-side model
    table of any size — pair weights aggregated distributed, candidates
    fanned by a hash join, S(conv, c) = Σ_{e ∈ ents(conv)} w(c, e)
    assembled via the algebraic decomposition
    coh = S − [lone gold]·w(c, g_s) with joins end to end
    (tier-agreement-tested, identical output).  Returns (conv_id,
    surface, gold_id, bm25_top1, coh_top1, coh_weight, bm25_hit,
    coh_hit)."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Min

    from deepkg_ray.functions.hashing import stable_hash64_batch

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": b["conv_id"], "surface": b["surface"],
            "gold": b["entity_id"].combine_chunks().cast(pa.int64())})

    ms = (mentions.map_batches(proj, batch_format="pyarrow")
          .groupby(["conv_id", "surface"])
          .aggregate(Min("gold", alias_name="gold")))

    # distinct surfaces -> BM25 candidates (dictionary-sized broadcast)
    from ray.data.aggregate import Count
    surfaces = (ms.groupby("surface").aggregate(Count(alias_name="_c"))
                .drop_columns(["_c"]))
    cand_ds = surfaces.map_batches(
        CandidateGenerator,
        fn_constructor_kwargs={"dictionary_path": dictionary_path,
                               "top_n": top_n, "exact": True},
        batch_format="pyarrow", concurrency=(1, 4)).map_batches(
        lambda b: pa.table({
            "surface": b["query"], "cand_id": b["candidate_id"],
            "rank": b["rank"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow")
    if mode == "join":
        from deepkg_ray.util import join_partitions
        return _coherence_link_join(
            ms, cand_ds, adjacency,
            num_partitions or join_partitions(), n_parts)
    cdf = cand_ds.to_pandas().rename(
        columns={"surface": "query", "cand_id": "candidate_id"})
    cmap: dict[str, list[tuple[int, int]]] = {}
    for s_, c_, r_ in zip(cdf["query"], cdf["candidate_id"],
                          cdf["rank"]):
        cmap.setdefault(s_, []).append((int(c_), int(r_)))
    for v in cmap.values():
        v.sort(key=lambda t: t[1])            # rank ascending
    cmap_ref = ray.put(cmap)

    # undirected pair weights -> neighbor lists + pair dict (broadcast)
    adf = adjacency.select_columns(["subj_id", "obj_id", "weight"]) \
        .to_pandas()
    sa = adf["subj_id"].to_numpy(np.int64)
    sb = adf["obj_id"].to_numpy(np.int64)
    sw = adf["weight"].to_numpy(np.int64)
    keep = sa != sb
    pwdf = pd.DataFrame({"lo": np.minimum(sa, sb)[keep],
                         "hi": np.maximum(sa, sb)[keep],
                         "w": sw[keep]}) \
        .groupby(["lo", "hi"], as_index=False).sum()
    pw = {(int(lo), int(hi)): int(w) for lo, hi, w in
          zip(pwdf["lo"], pwdf["hi"], pwdf["w"])}
    nd = pd.DataFrame({
        "e": np.concatenate([pwdf["lo"].to_numpy(np.int64),
                             pwdf["hi"].to_numpy(np.int64)]),
        "c": np.concatenate([pwdf["hi"].to_numpy(np.int64),
                             pwdf["lo"].to_numpy(np.int64)]),
        "w": np.concatenate([pwdf["w"].to_numpy(np.int64)] * 2)})
    nmap = {int(e_): (g["c"].to_numpy(np.int64),
                      g["w"].to_numpy(np.int64))
            for e_, g in nd.groupby("e", sort=False)}
    model_ref = ray.put((pw, nmap))

    def add_part(b: pa.Table) -> pa.Table:
        h = stable_hash64_batch(b["conv_id"].to_pylist())
        return b.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32)))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        cm = ray.get(cmap_ref)
        pw_, nm = ray.get(model_ref)
        o_conv, o_surf, o_gold = [], [], []
        o_b1, o_c1, o_cw, o_bh, o_ch = [], [], [], [], []
        for conv, sub in g.groupby("conv_id", sort=False):
            golds = sub["gold"].to_numpy(np.int64)
            from collections import Counter
            ncnt = Counter(golds.tolist())
            ents = np.unique(golds)
            surf_list = sub["surface"].tolist()
            cand_lists = [cm.get(s) for s in surf_list]
            # S(conv, c) is surface-independent — compute once per conv
            # for the union of candidate ids, not once per surface
            s_sums: dict[int, int] = {}
            for lst in cand_lists:
                if not lst:
                    continue
                for c_, _ in lst:
                    if c_ in s_sums:
                        continue
                    hit = nm.get(c_)
                    if hit is None:
                        s_sums[c_] = 0
                    else:
                        cs, ws = hit
                        idx = np.searchsorted(ents, cs)
                        idx[idx >= len(ents)] = 0
                        s_sums[c_] = int(ws[ents[idx] == cs].sum())
            for s_, g_, cands in zip(surf_list, golds.tolist(),
                                     cand_lists):
                if not cands:
                    continue
                best_key, best_c, best_coh = None, None, 0
                b1 = cands[0][0]              # rank 0 first
                lone = ncnt[g_] == 1
                for c_, r_ in cands:
                    corr = pw_.get((min(c_, g_), max(c_, g_)), 0) \
                        if lone and c_ != g_ else 0
                    coh = s_sums[c_] - corr
                    key = (-coh, r_, c_)
                    if best_key is None or key < best_key:
                        best_key, best_c, best_coh = key, c_, coh
                o_conv.append(conv)
                o_surf.append(s_)
                o_gold.append(g_)
                o_b1.append(b1)
                o_c1.append(best_c)
                o_cw.append(best_coh)
                o_bh.append(int(b1 == g_))
                o_ch.append(int(best_c == g_))
        return pd.DataFrame({
            "conv_id": o_conv, "surface": o_surf,
            "gold_id": np.asarray(o_gold, np.int64),
            "bm25_top1": np.asarray(o_b1, np.int64),
            "coh_top1": np.asarray(o_c1, np.int64),
            "coh_weight": np.asarray(o_cw, np.int64),
            "bm25_hit": np.asarray(o_bh, np.int64),
            "coh_hit": np.asarray(o_ch, np.int64)})

    return (ms.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda g: per_part(g.drop(columns=["part"])),
                        batch_format="pandas"))



def semantic_coherence_link(mentions, embeddings_path: str,
                            dictionary_path: str, *, top_n: int = 5,
                            n_parts: int = 64, dim: int = 64):
    """EMBEDDING-coherence entity linking — the dense sibling of
    coherence_link (the north star's 'string/embedding-based
    canonicalization' pairing): each surface's BM25 candidates are
    rescored by cosine against the conversation's CONTEXT VECTOR, the
    sum of its entity embeddings (entity e ↔ embeddings.vec_id = e)
    with the lone-gold correction of coherence_link (the surface's own
    entity is subtracted unless another surface shares it):

        ctxvec(conv, s) = Σ_{e ∈ ents(conv)} v(e) − [lone g_s]·v(g_s)
        score(c)        = round6 cos(v(c), ctxvec)

    Exactness: vectors are int64 micros; sums, dots and norms are exact
    integers (documented bound: |ents(conv)| ≲ 4000 at unit-norm
    embeddings keeps Σav² < 2^63 — the entity dictionary is far
    smaller), and the single float chain
    num / max(√da·√db, 1) is IEEE-identical in DuckDB.  Using the SUM
    vector instead of the centroid is exact too: cosine is
    scale-invariant.  Same conv-complete coarse-partition plan as
    coherence_link; the entity-embedding matrix (dictionary-sized) and
    candidate table broadcast once.  Returns (conv_id, surface,
    gold_id, bm25_top1, sem_top1, cos_micros, bm25_hit, sem_hit)."""
    import math

    import pandas as pd
    import ray
    from ray.data.aggregate import Count, Min

    from deepkg_ray.functions.hashing import stable_hash64_batch
    from deepkg_ray.functions.numeric import micros_matrix

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": b["conv_id"], "surface": b["surface"],
            "gold": b["entity_id"].combine_chunks().cast(pa.int64())})

    ms = (mentions.map_batches(proj, batch_format="pyarrow")
          .groupby(["conv_id", "surface"])
          .aggregate(Min("gold", alias_name="gold")))

    surfaces = (ms.groupby("surface").aggregate(Count(alias_name="_c"))
                .drop_columns(["_c"]))
    cdf = surfaces.map_batches(
        CandidateGenerator,
        fn_constructor_kwargs={"dictionary_path": dictionary_path,
                               "top_n": top_n, "exact": True},
        batch_format="pyarrow", concurrency=(1, 4)).to_pandas()
    cmap: dict[str, list[tuple[int, int]]] = {}
    for s_, c_, r_ in zip(cdf["query"], cdf["candidate_id"],
                          cdf["rank"]):
        cmap.setdefault(s_, []).append((int(c_), int(r_)))
    for v in cmap.values():
        v.sort(key=lambda t: t[1])

    et = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    em = micros_matrix(np.stack(
        [np.asarray(x, np.float64) for x in
         et["embedding"].to_pylist()])).astype(np.int64)
    erow = {int(v): i for i, v in
            enumerate(et["vec_id"].to_pylist())}
    model_ref = ray.put((cmap, em, erow))

    def add_part(b: pa.Table) -> pa.Table:
        h = stable_hash64_batch(b["conv_id"].to_pylist())
        return b.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32)))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        cm, E, er = ray.get(model_ref)
        db_cache: dict[int, int] = {}
        o = {k: [] for k in ("conv_id", "surface", "gold_id",
                             "bm25_top1", "sem_top1", "cos_micros",
                             "bm25_hit", "sem_hit")}
        from collections import Counter
        for conv, sub in g.groupby("conv_id", sort=False):
            golds = sub["gold"].to_numpy(np.int64)
            ncnt = Counter(golds.tolist())
            ents = np.unique(golds)
            rows = np.asarray([er[int(e)] for e in ents], np.int64)
            sumvec = E[rows].sum(axis=0)
            for s_, g_ in zip(sub["surface"].tolist(), golds.tolist()):
                cands = cm.get(s_)
                if not cands:
                    continue
                av = sumvec - E[er[g_]] if ncnt[g_] == 1 else sumvec
                da = int(av @ av)
                best_key, best_c, best_cos = None, None, 0
                b1 = cands[0][0]
                for c_, r_ in cands:
                    cv = E[er[c_]]
                    num = int(av @ cv)
                    db = db_cache.get(c_)
                    if db is None:
                        db = int(cv @ cv)
                        db_cache[c_] = db
                    cosm = int(math.floor(
                        num / max(math.sqrt(da) * math.sqrt(db), 1.0)
                        * 1e6 + 0.5))
                    key = (-cosm, r_, c_)
                    if best_key is None or key < best_key:
                        best_key, best_c, best_cos = key, c_, cosm
                o["conv_id"].append(conv)
                o["surface"].append(s_)
                o["gold_id"].append(g_)
                o["bm25_top1"].append(b1)
                o["sem_top1"].append(best_c)
                o["cos_micros"].append(best_cos)
                o["bm25_hit"].append(int(b1 == g_))
                o["sem_hit"].append(int(best_c == g_))
        return pd.DataFrame({
            "conv_id": o["conv_id"], "surface": o["surface"],
            "gold_id": np.asarray(o["gold_id"], np.int64),
            "bm25_top1": np.asarray(o["bm25_top1"], np.int64),
            "sem_top1": np.asarray(o["sem_top1"], np.int64),
            "cos_micros": np.asarray(o["cos_micros"], np.int64),
            "bm25_hit": np.asarray(o["bm25_hit"], np.int64),
            "sem_hit": np.asarray(o["sem_hit"], np.int64)})

    return (ms.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda g: per_part(g.drop(columns=["part"])),
                        batch_format="pandas"))


def fused_link(mentions, adjacency, embeddings_path: str,
               dictionary_path: str, *, top_n: int = 5,
               n_parts: int = 64):
    """The FINAL linker: one decision per mention surface fusing all
    three signals LEXICOGRAPHICALLY — graph coherence first (the
    strongest evidence: entities that interact in the KG), embedding
    cosine to the conversation context vector as the tiebreak, BM25
    rank last (string prior).  Lexicographic fusion needs no arbitrary
    scale mixing, stays integer-exact, and reduces to each single-signal
    linker when the stronger signals tie:

        winner = argmin over candidates of
                 (−coh, −cos_micros, bm25_rank, entity_id)

    One conv-complete coarse-partition pass with all three model tables
    broadcast (BM25 candidate table, adjacency neighbor lists + pair
    weights, entity-embedding matrix — each dictionary-sized); the per-
    conv S-sum hoist and context-vector algebra of coherence_link /
    semantic_coherence_link apply unchanged.  Returns (conv_id,
    surface, gold_id, bm25_top1, coh_top1, sem_top1, final_id,
    final_hit)."""
    import math

    import pandas as pd
    import ray
    from ray.data.aggregate import Count, Min

    from deepkg_ray.functions.hashing import stable_hash64_batch
    from deepkg_ray.functions.numeric import micros_matrix

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": b["conv_id"], "surface": b["surface"],
            "gold": b["entity_id"].combine_chunks().cast(pa.int64())})

    ms = (mentions.map_batches(proj, batch_format="pyarrow")
          .groupby(["conv_id", "surface"])
          .aggregate(Min("gold", alias_name="gold")))

    surfaces = (ms.groupby("surface").aggregate(Count(alias_name="_c"))
                .drop_columns(["_c"]))
    cdf = surfaces.map_batches(
        CandidateGenerator,
        fn_constructor_kwargs={"dictionary_path": dictionary_path,
                               "top_n": top_n, "exact": True},
        batch_format="pyarrow", concurrency=(1, 4)).to_pandas()
    cmap: dict[str, list[tuple[int, int]]] = {}
    for s_, c_, r_ in zip(cdf["query"], cdf["candidate_id"],
                          cdf["rank"]):
        cmap.setdefault(s_, []).append((int(c_), int(r_)))
    for v in cmap.values():
        v.sort(key=lambda t: t[1])

    adf = adjacency.select_columns(["subj_id", "obj_id", "weight"]) \
        .to_pandas()
    sa = adf["subj_id"].to_numpy(np.int64)
    sb = adf["obj_id"].to_numpy(np.int64)
    sw = adf["weight"].to_numpy(np.int64)
    keep = sa != sb
    pwdf = pd.DataFrame({"lo": np.minimum(sa, sb)[keep],
                         "hi": np.maximum(sa, sb)[keep],
                         "w": sw[keep]}) \
        .groupby(["lo", "hi"], as_index=False).sum()
    pw = {(int(lo), int(hi)): int(w) for lo, hi, w in
          zip(pwdf["lo"], pwdf["hi"], pwdf["w"])}
    nd = pd.DataFrame({
        "e": np.concatenate([pwdf["lo"].to_numpy(np.int64),
                             pwdf["hi"].to_numpy(np.int64)]),
        "c": np.concatenate([pwdf["hi"].to_numpy(np.int64),
                             pwdf["lo"].to_numpy(np.int64)]),
        "w": np.concatenate([pwdf["w"].to_numpy(np.int64)] * 2)})
    nmap = {int(e_): (g["c"].to_numpy(np.int64),
                      g["w"].to_numpy(np.int64))
            for e_, g in nd.groupby("e", sort=False)}

    et = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    em = micros_matrix(np.stack(
        [np.asarray(x, np.float64) for x in
         et["embedding"].to_pylist()])).astype(np.int64)
    erow = {int(v): i for i, v in enumerate(et["vec_id"].to_pylist())}
    model_ref = ray.put((cmap, pw, nmap, em, erow))

    def add_part(b: pa.Table) -> pa.Table:
        h = stable_hash64_batch(b["conv_id"].to_pylist())
        return b.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32)))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        cm, pw_, nm, E, er = ray.get(model_ref)
        db_cache: dict[int, int] = {}
        o = {k: [] for k in ("conv_id", "surface", "gold_id",
                             "bm25_top1", "coh_top1", "sem_top1",
                             "final_id", "final_hit")}
        from collections import Counter
        for conv, sub in g.groupby("conv_id", sort=False):
            golds = sub["gold"].to_numpy(np.int64)
            ncnt = Counter(golds.tolist())
            ents = np.unique(golds)
            rows = np.asarray([er[int(e)] for e in ents], np.int64)
            sumvec = E[rows].sum(axis=0)
            surf_list = sub["surface"].tolist()
            cand_lists = [cm.get(s) for s in surf_list]
            s_sums: dict[int, int] = {}
            for lst in cand_lists:
                if not lst:
                    continue
                for c_, _ in lst:
                    if c_ in s_sums:
                        continue
                    hit = nm.get(c_)
                    if hit is None:
                        s_sums[c_] = 0
                    else:
                        cs, ws = hit
                        idx = np.searchsorted(ents, cs)
                        idx[idx >= len(ents)] = 0
                        s_sums[c_] = int(ws[ents[idx] == cs].sum())
            for s_, g_, cands in zip(surf_list, golds.tolist(),
                                     cand_lists):
                if not cands:
                    continue
                lone = ncnt[g_] == 1
                av = sumvec - E[er[g_]] if lone else sumvec
                da = int(av @ av)
                bk_c = bk_s = bk_f = None
                bc_c = bc_s = bc_f = None
                b1 = cands[0][0]
                for c_, r_ in cands:
                    corr = pw_.get((min(c_, g_), max(c_, g_)), 0) \
                        if lone and c_ != g_ else 0
                    coh = s_sums[c_] - corr
                    cv = E[er[c_]]
                    num = int(av @ cv)
                    db = db_cache.get(c_)
                    if db is None:
                        db = int(cv @ cv)
                        db_cache[c_] = db
                    cosm = int(math.floor(
                        num / max(math.sqrt(da) * math.sqrt(db), 1.0)
                        * 1e6 + 0.5))
                    kc = (-coh, r_, c_)
                    ks = (-cosm, r_, c_)
                    kf = (-coh, -cosm, r_, c_)
                    if bk_c is None or kc < bk_c:
                        bk_c, bc_c = kc, c_
                    if bk_s is None or ks < bk_s:
                        bk_s, bc_s = ks, c_
                    if bk_f is None or kf < bk_f:
                        bk_f, bc_f = kf, c_
                o["conv_id"].append(conv)
                o["surface"].append(s_)
                o["gold_id"].append(g_)
                o["bm25_top1"].append(b1)
                o["coh_top1"].append(bc_c)
                o["sem_top1"].append(bc_s)
                o["final_id"].append(bc_f)
                o["final_hit"].append(int(bc_f == g_))
        return pd.DataFrame({
            "conv_id": o["conv_id"], "surface": o["surface"],
            "gold_id": np.asarray(o["gold_id"], np.int64),
            "bm25_top1": np.asarray(o["bm25_top1"], np.int64),
            "coh_top1": np.asarray(o["coh_top1"], np.int64),
            "sem_top1": np.asarray(o["sem_top1"], np.int64),
            "final_id": np.asarray(o["final_id"], np.int64),
            "final_hit": np.asarray(o["final_hit"], np.int64)})

    return (ms.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda g: per_part(g.drop(columns=["part"])),
                        batch_format="pandas"))


def _coherence_link_join(ms, cand_ds, adjacency, num_partitions,
                         n_parts):
    """coherence_link's above-the-gate tier: hash joins end to end, no
    driver-side model table.  S(conv, c) = Σ_{e ∈ ents(conv)} w(c, e)
    via candidate-set × neighbor-table × conv-entity joins; the lone-
    gold correction −w(c, g_s) via a (lo, hi) join on the pair-weight
    table; one keyed Sum/Min/Max merge; coarse-partition vectorized
    finisher.  Output identical to the broadcast tier (tier-agreement
    pytest)."""
    import pandas as pd
    from ray.data.aggregate import Count, Max, Min, Sum

    from deepkg_ray.functions.hashing import stable_hash64_batch
    from deepkg_ray.util import drop_empty_blocks

    def orient(b: pa.Table) -> pa.Table:
        a = b["subj_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["obj_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = b["weight"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != c
        a, c, w = a[keep], c[keep], w[keep]
        return pa.table({"lo": pa.array(np.minimum(a, c), pa.int64()),
                         "hi": pa.array(np.maximum(a, c), pa.int64()),
                         "w": pa.array(w, pa.int64())})

    pw_ds = (adjacency.select_columns(["subj_id", "obj_id", "weight"])
             .map_batches(orient, batch_format="pyarrow")
             .groupby(["lo", "hi"]).aggregate(Sum("w", alias_name="w"))
             .materialize())

    def bidir(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        w = b["w"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cand_id": pa.array(np.concatenate([lo, hi]), pa.int64()),
            "gold": pa.array(np.concatenate([hi, lo]), pa.int64()),
            "w": pa.array(np.concatenate([w, w]), pa.int64())})

    nbr = pw_ds.map_batches(bidir, batch_format="pyarrow")

    ms = ms.materialize()
    conv_ents = (ms.groupby(["conv_id", "gold"])
                 .aggregate(Count(alias_name="n_surf")).materialize())
    base = (drop_empty_blocks(ms).join(
        drop_empty_blocks(cand_ds), join_type="inner",
        num_partitions=num_partitions, on=("surface",))
        .materialize())
    cand_conv = (base.groupby(["conv_id", "cand_id"])
                 .aggregate(Count(alias_name="_c"))
                 .drop_columns(["_c"]))

    s_rows = (drop_empty_blocks(cand_conv).join(
        drop_empty_blocks(nbr), join_type="inner",
        num_partitions=num_partitions, on=("cand_id",))
        .join(drop_empty_blocks(conv_ents.drop_columns(["n_surf"])),
              join_type="inner", num_partitions=num_partitions,
              on=("conv_id", "gold"))
        .groupby(["conv_id", "cand_id"])
        .aggregate(Sum("w", alias_name="s")))

    def base_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": b["conv_id"], "surface": b["surface"],
            "cand_id": b["cand_id"], "rank": b["rank"],
            "gold": b["gold"],
            "coh": pa.array(np.zeros(b.num_rows, np.int64))})

    def s_fanned(b: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": b["conv_id"], "surface": b["surface"],
            "cand_id": b["cand_id"], "rank": b["rank"],
            "gold": pa.array(np.full(b.num_rows, -1, np.int64)),
            "coh": b["s"].combine_chunks().cast(pa.int64())})

    s_contrib = drop_empty_blocks(base).join(
        drop_empty_blocks(s_rows), join_type="inner",
        num_partitions=num_partitions, on=("conv_id", "cand_id")) \
        .map_batches(s_fanned, batch_format="pyarrow")

    # lone-gold correction: base rows where n_surf(conv, gold) == 1 and
    # cand != gold, joined onto the pair-weight table by (lo, hi)
    def corr_keys(b: pa.Table) -> pa.Table:
        cid = b["cand_id"].to_numpy(zero_copy_only=False)
        g = b["gold"].to_numpy(zero_copy_only=False)
        ns = b["n_surf"].to_numpy(zero_copy_only=False)
        keep = (ns == 1) & (cid != g)
        t = b.filter(pa.array(keep))
        cid, g = cid[keep], g[keep]
        return pa.table({
            "conv_id": t["conv_id"], "surface": t["surface"],
            "cand_id": t["cand_id"], "rank": t["rank"],
            "lo": pa.array(np.minimum(cid, g), pa.int64()),
            "hi": pa.array(np.maximum(cid, g), pa.int64())})

    def corr_rows(b: pa.Table) -> pa.Table:
        w = b["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "conv_id": b["conv_id"], "surface": b["surface"],
            "cand_id": b["cand_id"], "rank": b["rank"],
            "gold": pa.array(np.full(b.num_rows, -1, np.int64)),
            "coh": pa.array(-w, pa.int64())})

    corr = (drop_empty_blocks(
        drop_empty_blocks(base).join(
            drop_empty_blocks(conv_ents), join_type="inner",
            num_partitions=num_partitions, on=("conv_id", "gold"))
        .map_batches(corr_keys, batch_format="pyarrow"))
        .join(drop_empty_blocks(pw_ds), join_type="inner",
              num_partitions=num_partitions, on=("lo", "hi"))
        .map_batches(corr_rows, batch_format="pyarrow"))

    merged = (drop_empty_blocks(base)
              .map_batches(base_rows, batch_format="pyarrow")
              .union(drop_empty_blocks(s_contrib))
              .union(drop_empty_blocks(corr))
              .groupby(["conv_id", "surface", "cand_id"])
              .aggregate(Sum("coh", alias_name="coh"),
                         Min("rank", alias_name="rank"),
                         Max("gold", alias_name="gold")))

    def add_part(b: pa.Table) -> pa.Table:
        h = stable_hash64_batch(b["conv_id"].to_pylist())
        return b.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32)))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        keys = ["conv_id", "surface"]
        gold = (g.groupby(keys, sort=False, as_index=False)["gold"]
                .max().rename(columns={"gold": "gold_id"}))
        s = g.sort_values(keys + ["coh", "rank", "cand_id"],
                          ascending=[True, True, False, True, True],
                          kind="stable")
        win = s.drop_duplicates(keys)[
            keys + ["cand_id", "coh"]].rename(
            columns={"cand_id": "coh_top1", "coh": "coh_weight"})
        b0 = g.loc[g["rank"] == 0, keys + ["cand_id"]] \
            .drop_duplicates(keys).rename(columns={"cand_id":
                                                   "bm25_top1"})
        out = gold.merge(b0, on=keys, sort=False) \
            .merge(win, on=keys, sort=False)
        out["bm25_hit"] = (out["bm25_top1"] == out["gold_id"]) \
            .astype(np.int64)
        out["coh_hit"] = (out["coh_top1"] == out["gold_id"]) \
            .astype(np.int64)
        for c in ("gold_id", "bm25_top1", "coh_top1", "coh_weight"):
            out[c] = out[c].astype(np.int64)
        return out[keys + ["gold_id", "bm25_top1", "coh_top1",
                           "coh_weight", "bm25_hit", "coh_hit"]]

    return (drop_empty_blocks(merged)
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda g: per_part(g.drop(columns=["part"])),
                        batch_format="pandas"))


class ExactLinker:
    """Stateless-shaped actor stage: add subj_id/obj_id (+ canonical names)
    to surface triples via broadcast alias map; unresolved surfaces get
    id -1 (routed to the fuzzy tier by the pipeline)."""

    def __init__(self, dictionary_path: str):
        self.alias_map = load_alias_map(dictionary_path)

    def _link(self, surfaces: list[str]) -> tuple[list[int], list[str]]:
        ids, names = [], []
        for s in surfaces:
            m = self.alias_map.get(s)
            ids.append(m[0] if m else -1)
            names.append(m[2] if m else s)
        return ids, names

    def __call__(self, batch: pa.Table) -> pa.Table:
        s_ids, s_names = self._link(batch["subj_text"].to_pylist())
        o_ids, o_names = self._link(batch["obj_text"].to_pylist())
        return (batch
                .append_column("subj_id", pa.array(s_ids, pa.int64()))
                .append_column("subj_name", pa.array(s_names, pa.string()))
                .append_column("obj_id", pa.array(o_ids, pa.int64()))
                .append_column("obj_name", pa.array(o_names, pa.string())))


def link_triples(ds, dictionary_path: str, *, concurrency=None, batch_size=None):
    """Default = worker-cached task pool; explicit concurrency = actor pool
    (util.stateful_map)."""
    from deepkg_ray.util import stateful_map
    return stateful_map(ds, ExactLinker, {"dictionary_path": dictionary_path},
                        concurrency=concurrency, batch_size=batch_size)


def recall_at_n(candidates: pa.Table, gold: dict[str, list[str]], n: int) -> float:
    """Row-mean recall@N (Bulid_Data_Model.py:71-89): per query, the
    fraction of gold canonical names present in its top-N candidates —
    computed exactly (no block-average bias; reference run.py:47 averages
    block averages)."""
    per_q: dict[str, set[str]] = {}
    for q, c, r in zip(candidates["query"].to_pylist(),
                       candidates["candidate_name"].to_pylist(),
                       candidates["rank"].to_pylist()):
        if r < n:
            per_q.setdefault(q, set()).add(c)
    vals = []
    for q, golds in gold.items():
        got = per_q.get(q, set())
        vals.append(sum(g in got for g in golds) / len(golds))
    return float(np.mean(vals)) if vals else math.nan


def build_candidate_pairs(candidates: pa.Table, gold: dict[str, list[str]],
                          false_num_rate: float = 2.0, seed: int = 13):
    """Training-pair builder for a cross-encoder rank stage: positives are
    the gold canonical names; negatives are top candidates not in gold, at
    ``false_num_rate`` negatives per positive (semantics of the reference's
    build-pair step, Normalization/recall/model/Bulid_Data_Model.py:111-143;
    the reference encodes gold as a '##'-joined field, we take a dict).

    Deterministic: negatives are taken in candidate-rank order, not sampled
    (retry-safe under Ray; SURVEY.md §7.5 determinism)."""
    rows_q, rows_c, rows_y = [], [], []
    by_q: dict[str, list[tuple[int, str]]] = {}
    for q, name, rank in zip(candidates["query"].to_pylist(),
                             candidates["candidate_name"].to_pylist(),
                             candidates["rank"].to_pylist()):
        by_q.setdefault(q, []).append((rank, name))
    for q, golds in gold.items():
        pos = list(golds)
        for g in pos:
            rows_q.append(q); rows_c.append(g); rows_y.append(1)
        n_neg = int(len(pos) * false_num_rate)
        negs = [name for _, name in sorted(by_q.get(q, []))
                if name not in set(pos)][:n_neg]
        for n_ in negs:
            rows_q.append(q); rows_c.append(n_); rows_y.append(0)
    return pa.table({"text1": pa.array(rows_q, pa.string()),
                     "text2": pa.array(rows_c, pa.string()),
                     "label": pa.array(rows_y, pa.int32())})


class CrossScorer:
    """Deterministic pair scorer standing in for the (absent-in-reference)
    cross-encoder rank stage (Normalization/rank has only an empty readme;
    readme.md:42-43 promises it).  Scores = char-ngram cosine of the pair —
    same actor contract a trained cross-encoder would use."""

    def __init__(self, dim: int = 512, n: int = 3):
        self.vec = CharNgramVectorizer(dim=dim, n=n)

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = self.vec.vectorize(batch["text1"].to_pylist())
        b = self.vec.vectorize(batch["text2"].to_pylist())
        from deepkg_ray.functions.numeric import round6
        s = round6((a * b).sum(axis=1))
        return batch.append_column("score", pa.array(s, pa.float64()))


def rescore_candidates(batch: pa.Table, *, boost_repeats: bool = True) -> pa.Table:
    """Length-normalized rescoring with repeat boost — semantics of the
    reference's ES rescorer (ES_Model.py:76-123): per (query, candidate),
    score' = score / (len(candidate) + len(query)); a candidate surfacing
    more than once for the same query gets its (summed) score doubled; the
    per-query rank is recomputed on the new score (desc, then name)."""
    import pandas as pd
    from deepkg_ray.functions.numeric import round6
    df = batch.to_pandas()
    df["norm_score"] = df["score"] / (df["candidate_name"].str.len()
                                      + df["query"].str.len())
    g = (df.groupby(["query", "candidate_name", "candidate_id"], as_index=False)
         .agg(norm_score=("norm_score", "sum"), n_hits=("norm_score", "size")))
    if boost_repeats:
        g.loc[g["n_hits"] > 1, "norm_score"] *= 2.0
    g["norm_score"] = round6(g["norm_score"])
    g = g.sort_values(["query", "norm_score", "candidate_name"],
                      ascending=[True, False, True], kind="stable")
    g["rank"] = g.groupby("query").cumcount().astype("int32")
    return pa.Table.from_pandas(g, preserve_index=False)


class EncoderStage:
    """Embedding-encoder actor stage: text column → unit-norm embedding
    column (list<float32>) — the SimCSE encode-batch contract
    (simcse_unsup.py:54-64,152-182: deterministic eval mode, L2-normalized
    vectors).  The bundled vectorizer is the model-free hashing tier; a
    BERT replica drops into the same __init__/__call__ with num_gpus=1."""

    def __init__(self, dim: int = 256, n: int = 3, text_col: str = "text",
                 out_col: str = "embedding", model_tier: str = "hash",
                 hidden: int = 128, seed: int = 13):
        self.vec = CharNgramVectorizer(dim=dim, n=n)
        self.text_col, self.out_col = text_col, out_col
        self.mlp = None
        if model_tier == "numpy":
            # REAL encoder forward (seeded-random, untrained): hashed BoW →
            # W1/relu → W2/tanh → L2-norm — actual matmul inference through
            # the actor pool; a trained torch SimCSE replaces the two
            # matmuls behind the same __call__ (simcse_unsup.py:54-64)
            rng = np.random.default_rng(seed)
            self.mlp = (
                (rng.standard_normal((dim, hidden)).astype(np.float32)
                 / np.sqrt(dim)),
                (rng.standard_normal((hidden, dim)).astype(np.float32)
                 / np.sqrt(hidden)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.vec.vectorize(batch[self.text_col].to_pylist())
        if self.mlp is not None:
            w1, w2 = self.mlp
            h = np.maximum(m @ w1, 0.0)
            m = np.tanh(h @ w2)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            m = (m / np.maximum(norms, 1e-12)).astype(np.float32)
        return batch.append_column(
            self.out_col, pa.array([row.tolist() for row in m],
                                   pa.list_(pa.float32())))


def encode_texts(ds, *, dim: int = 256, text_col: str = "text",
                 concurrency=(1, 4), batch_size: int = 2048):
    return ds.map_batches(EncoderStage,
                          fn_constructor_kwargs={"dim": dim,
                                                 "text_col": text_col},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def export_training_pairs(pairs: pa.Table, path: str, seed: int = 17) -> str:
    """Shuffled TSV pair export (text1\\ttext2\\tlabel) — the reference's
    recall-stage training-data sink (Normalization/recall/run.py:36-39:
    DataFrame.sample(frac=1) then to_csv(sep='\\t')).  Seeded shuffle for
    determinism."""
    df = pairs.to_pandas().sample(frac=1, random_state=seed)
    df.to_csv(path, sep="\t", index=False, header=False)
    return path
