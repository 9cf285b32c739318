"""Span-model NER plumbing: tokenize-with-offsets → span score tensor →
threshold decode → char-offset mentions.

This reproduces the reference's GlobalPointer inference *pipeline shape*
(ExtractionEntities/inference.py:35-80):

1. tokenizer with a token↔char alignment map — the reference's
   `token_rematch` contract (utils/tools.py:23-75): every token knows its
   original char span, so model output maps back to char offsets.  Our
   normalization is length-preserving (functions/textnorm.py), so the
   alignment is direct (no per-row char_mapping needed).
2. a scorer producing a dense (n_types, L, L) upper-triangular span score
   tensor — the reference's span-matrix label tensor (data_process.py:43-55).
   The bundled ``DictSpanScorer`` is the deterministic, model-free stand-in
   (same role the trie matcher plays for AutoNER); a trained GlobalPointer /
   Biaffine model drops into the same interface on a GPU actor pool.
3. threshold decode (inference.py:66-80): mask the CLS/SEP analog
   (first/last positions when ``add_specials``), mask the lower triangle
   (model/model.py:79-87), ``np.where(scores > threshold)``, map token
   spans to inclusive char offsets.

The Ray stage is an actor pool (model state loaded once per actor).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize_with_offsets(text: str) -> tuple[list[str], np.ndarray, np.ndarray]:
    """tokens + char start (inclusive) / end (exclusive) arrays — the
    token↔char alignment map."""
    toks, starts, ends = [], [], []
    for m in _TOKEN_RE.finditer(text):
        toks.append(m.group(0))
        starts.append(m.start())
        ends.append(m.end())
    return toks, np.asarray(starts, np.int64), np.asarray(ends, np.int64)


class DictSpanScorer:
    """score[t, i, j] = 1.0 iff text[starts[i]:ends[j]] is a dictionary
    surface of type t, else -1.0 — a deterministic 'model' that exercises
    the exact decode path a trained span model would."""

    def __init__(self, alias_map: dict[str, tuple[int, str, str]],
                 type_order: list[str], max_span_tokens: int = 6):
        self.alias_map = alias_map
        self.type_index = {t: i for i, t in enumerate(type_order)}
        self.type_order = type_order
        self.max_span_tokens = max_span_tokens
        # spans can only start on a token that begins SOME alias — the
        # prefilter turns the L × max_span probe loop into a probe per
        # plausible start (the score tensor itself is unchanged)
        self.first_tokens = frozenset(
            m.group(0) for k in alias_map
            if (m := _TOKEN_RE.search(k)) is not None)

    def score(self, text: str, toks, starts, ends,
              tok_hashes=None) -> np.ndarray:
        L = len(toks)
        s = np.full((len(self.type_order), L, L), -1.0, dtype=np.float32)
        first = self.first_tokens
        for i in range(L):
            if toks[i] not in first:
                continue
            for j in range(i, min(L, i + self.max_span_tokens)):
                span = text[starts[i]:ends[j]]
                m = self.alias_map.get(span)
                if m is not None:
                    s[self.type_index[m[1]], i, j] = 1.0
        return s


class NumpySpanScorer:
    """REAL GlobalPointer head on CPU (seeded-random, untrained): hashed
    token-embedding lookup → neighbor context mix → per-type W_q/W_k
    projections → score[t, i, j] = q_i·k_j/√d — the actual tensor
    computation of the reference head (ExtractionEntities/model/model.py
    GlobalPointer forward), minus training.  Its threshold crossings are
    arbitrary spans; the tier exists to prove the actor-pool + decode
    contract executes real tensor compute (the role NumpySeq2SEL plays for
    the UIE generator).  A trained torch GlobalPointer replaces this class
    behind the same .score signature."""

    def __init__(self, type_order: list[str], dim: int = 32, seed: int = 11,
                 vocab_buckets: int = 4096):
        rng = np.random.default_rng(seed)
        nt = len(type_order)
        self.emb = (rng.standard_normal((vocab_buckets, dim))
                    .astype(np.float32) * 0.5)
        self.wq = (rng.standard_normal((nt, dim, dim)).astype(np.float32)
                   / np.sqrt(dim))
        self.wk = (rng.standard_normal((nt, dim, dim)).astype(np.float32)
                   / np.sqrt(dim))
        self.dim = dim
        self.buckets = vocab_buckets

    def score(self, text: str, toks, starts, ends,
              tok_hashes=None) -> np.ndarray:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        nt = self.wq.shape[0]
        L = len(toks)
        if L == 0:
            return np.zeros((nt, 0, 0), dtype=np.float32)
        if tok_hashes is None:
            tok_hashes = stable_hash64_batch(list(toks))
        idx = (tok_hashes % np.uint64(self.buckets)).astype(np.int64)
        h = self.emb[idx]                                    # L × d
        hm = h.copy()
        hm[1:] += 0.5 * h[:-1]
        hm[:-1] += 0.5 * h[1:]                               # context mix
        q = np.einsum("tde,ld->tle", self.wq, hm)            # nt × L × d
        k = np.einsum("tde,ld->tle", self.wk, hm)
        return (q @ k.transpose(0, 2, 1)
                / np.float32(np.sqrt(self.dim))).astype(np.float32)


class BiaffineSpanScorer:
    """REAL Biaffine span head on CPU — the second NER head of the
    reference (ExtractionEntities/model/model.py:89-147 Biaffine /
    :193-235 UnlabeledEntity): start/end MLP projections of the token
    representations, a per-type bilinear form, a linear term over the
    concatenated pair, and a clipped relative-position embedding:

        s(t, i, j) = hs_i · U_t · he_j  +  w_t · [hs_i ; he_j]
                     + r_t[min(j−i, R−1)]  +  b_t

    Two tiers behind the same ``.score`` signature:

    * ``dict_margin=None`` — pure untrained head (seeded weights): its
      threshold crossings are arbitrary spans; the tier exists to prove
      the biaffine tensor computation executes through the actor pool
      (the role NumpySpanScorer plays for GlobalPointer).
    * ``dict_margin=alias_map`` — the FULL biaffine forward runs, its raw
      output is squashed to (−0.4, 0.4) (x/(1+|x|)·0.4 — order-preserving,
      never crosses the decode threshold on its own) and a ±1 dictionary
      margin is added, so decode equals dictionary membership and the
      query is SQL-checkable while every batch still pays — and proves —
      the real bilinear math.  A trained torch Biaffine replaces the
      squash+margin with its learned logits behind the same interface.
    """

    def __init__(self, type_order: list[str], dim: int = 32, seed: int = 17,
                 vocab_buckets: int = 4096, max_rel: int = 8,
                 dict_margin: dict | None = None,
                 max_span_tokens: int = 6):
        rng = np.random.default_rng(seed)
        nt = len(type_order)
        self.type_order = type_order
        self.type_index = {t: i for i, t in enumerate(type_order)}
        self.emb = (rng.standard_normal((vocab_buckets, dim))
                    .astype(np.float32) * 0.5)
        # start / end MLPs (model.py:96-101 start_layer/end_layer analog)
        self.ws = (rng.standard_normal((dim, dim)).astype(np.float32)
                   / np.sqrt(dim))
        self.we = (rng.standard_normal((dim, dim)).astype(np.float32)
                   / np.sqrt(dim))
        # biaffine tensor U: nt × d × d (model.py:107 weight bilinear)
        self.u = (rng.standard_normal((nt, dim, dim)).astype(np.float32)
                  / dim)
        # linear term over [hs; he] and bias (model.py:108-110)
        self.w = (rng.standard_normal((nt, 2 * dim)).astype(np.float32)
                  / np.sqrt(2 * dim))
        self.b = rng.standard_normal(nt).astype(np.float32) * 0.1
        # relative-position table (model.py:193-235 UnlabeledEntity's
        # clipped span-width / relative-position embedding)
        self.rel = (rng.standard_normal((nt, max_rel)).astype(np.float32)
                    * 0.1)
        # (d, nt·d) layout of U so the per-type bilinear left products are
        # ONE matmul for all types (score(): hs @ u_flat → L × nt·d)
        self.u_flat = np.ascontiguousarray(
            self.u.transpose(1, 0, 2).reshape(dim, nt * dim))
        self._rel_idx_cache: dict[int, np.ndarray] = {}
        self.max_rel = max_rel
        self.dim = dim
        self.buckets = vocab_buckets
        self.dict_margin = dict_margin
        self.max_span_tokens = max_span_tokens
        if dict_margin is not None:
            self.first_tokens = frozenset(
                m.group(0) for k in dict_margin
                if (m := _TOKEN_RE.search(k)) is not None)

    def _reps(self, toks, tok_hashes=None) -> np.ndarray:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        if tok_hashes is None:
            tok_hashes = stable_hash64_batch(list(toks))
        idx = (tok_hashes % np.uint64(self.buckets)).astype(np.int64)
        h = self.emb[idx]
        hm = h.copy()
        hm[1:] += 0.5 * h[:-1]
        hm[:-1] += 0.5 * h[1:]
        return hm

    def score(self, text: str, toks, starts, ends,
              tok_hashes=None) -> np.ndarray:
        nt = self.u.shape[0]
        L = len(toks)
        if L == 0:
            return np.zeros((nt, 0, 0), dtype=np.float32)
        hm = self._reps(toks, tok_hashes)
        hs = np.tanh(hm @ self.ws)                           # L × d
        he = np.tanh(hm @ self.we)
        # bilinear: s1[t,i,j] = hs_i U_t he_j — all types in TWO matmuls
        # ((L×d)(d×nt·d) then the stacked (nt,L,d)@(d,L) batch matmul;
        # the per-type loop costs ~2·nt python/numpy dispatches per turn)
        nt_ = self.u.shape[0]
        het = he.T
        z = (hs @ self.u_flat).reshape(L, nt_, self.dim).transpose(1, 0, 2)
        raw = np.matmul(z, het)                              # nt × L × L
        # linear over the pair: w_t·hs_i + w_t·he_j (split halves),
        # accumulated in place
        ls = hs @ self.w[:, :self.dim].T                     # L × nt
        le = he @ self.w[:, self.dim:].T
        raw += ls.T[:, :, None]
        raw += le.T[:, None, :]
        # clipped relative-position embedding (index matrix cached per L)
        rel_idx = self._rel_idx_cache.get(L)
        if rel_idx is None:
            rel_idx = np.clip(np.arange(L)[None, :] - np.arange(L)[:, None],
                              0, self.max_rel - 1)
            self._rel_idx_cache[L] = rel_idx
        raw += self.rel[:, rel_idx]                          # nt × L × L
        raw += self.b[:, None, None]
        if self.dict_margin is None:
            return raw
        # dict-margin tier: squash raw to (−0.4, 0.4), add ±1 dict margin
        # (in-place: raw is not referenced afterwards)
        den = np.abs(raw)
        den += 1.0
        out = np.divide(raw, den, out=raw)
        out *= 0.4
        out -= 1.0
        first = self.first_tokens
        for i in range(L):
            if toks[i] not in first:
                continue
            for j in range(i, min(L, i + self.max_span_tokens)):
                m = self.dict_margin.get(text[starts[i]:ends[j]])
                if m is not None:
                    t = self.type_index[m[1]]
                    out[t, i, j] += 2.0
        return out


def decode_spans(scores: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                 type_order: list[str], threshold: float = 0.0,
                 mask_specials: bool = False):
    """(type, char_start, char_end_inclusive) list via threshold decode.

    mask_specials mirrors the reference's CLS/SEP −inf masking
    (inference.py:66-69) for tokenizers that add special positions."""
    # no-copy decode: threshold first, then drop the lower triangle
    # (add_mask_tril analog, model/model.py:79-87) and the special
    # positions as index filters — same crossings as masking with −inf,
    # without materializing a masked copy of the (nt, L, L) tensor
    t_hit, i_hit, j_hit = np.where(scores > threshold)
    keep = j_hit >= i_hit
    if mask_specials and scores.shape[1] >= 2:
        L = scores.shape[1]
        keep &= ((i_hit != 0) & (i_hit != L - 1)
                 & (j_hit != 0) & (j_hit != L - 1))
    out = []
    for t_idx, i, j in zip(t_hit[keep], i_hit[keep], j_hit[keep]):
        out.append((type_order[t_idx], int(starts[i]), int(ends[j]) - 1))
    return out


class SpanModelNER:
    """Actor-pool stage: transcripts batch → typed mention rows, through the
    tokenize→score→decode path.  Interchangeable with
    mention.DictionaryMentionDetector (same output schema) — the two tiers
    cross-validate each other in tests."""

    def __init__(self, dictionary_path: str, text_col: str = "text_norm",
                 threshold: float = 0.0, scorer_tier: str = "dict",
                 dim: int = 32, seed: int = 11):
        from deepkg_ray.stages.mention import load_alias_map
        self.alias_map = load_alias_map(dictionary_path)
        from deepkg_ray.synth import ENTITY_TYPES
        self.type_order = list(ENTITY_TYPES)
        if scorer_tier == "numpy":
            # real-tensor-compute tier: spans are arbitrary (untrained head),
            # entity_id falls back to -1 for surfaces outside the KB
            self.scorer = NumpySpanScorer(self.type_order, dim=dim, seed=seed)
        elif scorer_tier == "biaffine":
            self.scorer = BiaffineSpanScorer(self.type_order, dim=dim,
                                             seed=seed)
        elif scorer_tier == "biaffine_dict":
            # full biaffine forward + dominating dictionary margin —
            # decode is dictionary membership (oracle-checkable) while the
            # bilinear math runs per batch
            self.scorer = BiaffineSpanScorer(self.type_order, dim=dim,
                                             seed=seed,
                                             dict_margin=self.alias_map)
        else:
            self.scorer = DictSpanScorer(self.alias_map, self.type_order)
        self.text_col = text_col
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        conv, turn = batch["conv_id"].to_pylist(), batch["turn_idx"].to_pylist()
        rows = {"conv_id": [], "turn_idx": [], "start_idx": [], "end_idx": [],
                "type": [], "surface": [], "entity_id": []}
        # tokenize the whole batch first and hash ALL tokens in ONE call
        # (per-turn hashing pays a fixed pandas hash_array overhead that
        # dominates short turns), then slice per turn
        toked = [(c, t, text, *tokenize_with_offsets(text))
                 for c, t, text in zip(conv, turn,
                                       batch[self.text_col].to_pylist())]
        all_toks: list[str] = []
        for _, _, _, toks, _, _ in toked:
            all_toks.extend(toks)
        all_hashes = (stable_hash64_batch(all_toks) if all_toks
                      else np.empty(0, np.uint64))
        pos = 0
        for c, t, text, toks, starts, ends in toked:
            if not toks:
                continue
            th = all_hashes[pos:pos + len(toks)]
            pos += len(toks)
            scores = self.scorer.score(text, toks, starts, ends,
                                       tok_hashes=th)
            for etype, cs, ce in decode_spans(scores, starts, ends,
                                              self.type_order, self.threshold):
                surface = text[cs:ce + 1]
                m = self.alias_map.get(surface)
                rows["conv_id"].append(c)
                rows["turn_idx"].append(t)
                rows["start_idx"].append(cs)
                rows["end_idx"].append(ce)
                rows["type"].append(etype)
                rows["surface"].append(surface)
                rows["entity_id"].append(m[0] if m is not None else -1)
        from deepkg_ray.stages.mention import MENTION_SCHEMA
        return pa.table({
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "start_idx": pa.array(rows["start_idx"], pa.int32()),
            "end_idx": pa.array(rows["end_idx"], pa.int32()),
            "type": pa.array(rows["type"], pa.string()),
            "surface": pa.array(rows["surface"], pa.string()),
            "entity_id": pa.array(rows["entity_id"], pa.int64()),
        }, schema=MENTION_SCHEMA)
