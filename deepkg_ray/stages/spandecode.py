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

    def score(self, text: str, toks, starts, ends) -> np.ndarray:
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

    def score(self, text: str, toks, starts, ends) -> np.ndarray:
        from deepkg_ray.functions.hashing import stable_hash64_batch
        nt = self.wq.shape[0]
        L = len(toks)
        if L == 0:
            return np.zeros((nt, 0, 0), dtype=np.float32)
        idx = (stable_hash64_batch(list(toks))
               % np.uint64(self.buckets)).astype(np.int64)
        h = self.emb[idx]                                    # L × d
        hm = h.copy()
        hm[1:] += 0.5 * h[:-1]
        hm[:-1] += 0.5 * h[1:]                               # context mix
        q = np.einsum("tde,ld->tle", self.wq, hm)            # nt × L × d
        k = np.einsum("tde,ld->tle", self.wk, hm)
        return (q @ k.transpose(0, 2, 1)
                / np.float32(np.sqrt(self.dim))).astype(np.float32)


def decode_spans(scores: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                 type_order: list[str], threshold: float = 0.0,
                 mask_specials: bool = False):
    """(type, char_start, char_end_inclusive) list via threshold decode.

    mask_specials mirrors the reference's CLS/SEP −inf masking
    (inference.py:66-69) for tokenizers that add special positions."""
    s = scores.copy()
    if mask_specials and s.shape[1] >= 2:
        s[:, 0, :] = -np.inf
        s[:, -1, :] = -np.inf
        s[:, :, 0] = -np.inf
        s[:, :, -1] = -np.inf
    # lower-triangle mask (add_mask_tril analog, model/model.py:79-87)
    L = s.shape[1]
    tril = np.tril_indices(L, k=-1)
    s[:, tril[0], tril[1]] = -np.inf
    out = []
    for t_idx, i, j in zip(*np.where(s > threshold)):
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
        else:
            self.scorer = DictSpanScorer(self.alias_map, self.type_order)
        self.text_col = text_col
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv, turn = batch["conv_id"].to_pylist(), batch["turn_idx"].to_pylist()
        rows = {"conv_id": [], "turn_idx": [], "start_idx": [], "end_idx": [],
                "type": [], "surface": [], "entity_id": []}
        for c, t, text in zip(conv, turn, batch[self.text_col].to_pylist()):
            toks, starts, ends = tokenize_with_offsets(text)
            if not toks:
                continue
            scores = self.scorer.score(text, toks, starts, ends)
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
