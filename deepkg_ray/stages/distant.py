"""AutoNER distant-supervision labeler: (raw text + core/full dictionaries)
→ tie-or-break token labels — the module the reference trains AutoNER from
(AutoNER/src/annotation.h + string_match.h), Ray-Data-first.

Semantics reproduced exactly:

- **Trie KB** (annotation.h:17-148): core-dict surfaces insert their type
  set under raw / ALL-UPPER / all-lower token forms (lowercase skipped when
  the type string contains PER/ORG/LOC or a surface token is a stopword —
  loadKBForMatching:193-203); full-dict surfaces mark nodes as
  ``__FILTERED__`` only where no real type exists (markAsFiltered:52-96);
  the full dict inherits the LAST core line's noLowercases flag — a
  loadKBForMatching quirk (:182,211) kept for parity.  Stopword cleaning
  removes lower/UPPER/Capitalized unigram nodes (cleanStopwords:219-231).

- **Σδ² DP segmentation** (string_match.h:21-99 segmentDP): maximize the
  sum of squared match lengths (weight·δ² for full-dict-only matches) over
  a segmentation of the sentence; loop order and the strict-``<``
  improvement test are mirrored exactly, so tie-breaking matches the
  reference decision-for-decision.

- **Tie-or-break labels** (annotation.h:263-323 getBoundary/getTypes,
  :325-351 toCk): entity segment [l,r) → break at l (``I type S``),
  connect inside (``O type S``); a filtered segment marks l..r — one
  PAST its end — Unknown (``O None D``), with later entity segments
  re-breaking an overwritten position; everything else breaks
  (``I None S``).

The Ray stage is an actor pool over sentence rows — the same parallel unit
as the reference's per-file processes, with zero shuffle: labels stream
out block-for-block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

FILTERED_TYPE = "__FILTERED__"


class TrieKB:
    """Token-level trie over core + full dictionary surfaces."""

    def __init__(self, core: list[tuple[str, str]], full: list[str],
                 stopwords: tuple[str, ...] = ()):
        self._children: list[dict[str, int]] = [{}]
        self._types: list[set[str]] = [set()]
        self._stop = {w.lower() for w in stopwords}
        no_lower_last = False
        for types_str, surface in core:
            toks = surface.strip().split(" ")
            no_lower = ("PER" in types_str or "ORG" in types_str
                        or "LOC" in types_str
                        or any(t.lower() in self._stop for t in toks))
            no_lower_last = no_lower
            self._insert(toks, types_str.split(","), no_lower)
        for surface in full:
            self._mark_filtered(surface.strip().split(" "), no_lower_last)
        for w in stopwords:
            self._remove([w.lower()])
            self._remove([w.upper()])
            self._remove([w[:1].upper() + w[1:]])

    # -- construction -------------------------------------------------
    def _walk_insert(self, toks) -> int:
        u = 0
        for t in toks:
            v = self._children[u].get(t)
            if v is None:
                v = len(self._children)
                self._children[u][t] = v
                self._children.append({})
                self._types.append(set())
            u = v
        return u

    def _insert(self, toks, types, no_lower):
        for variant in self._variants(toks, no_lower):
            self._types[self._walk_insert(variant)].update(types)

    def _mark_filtered(self, toks, no_lower):
        for variant in self._variants(toks, no_lower):
            u = self._walk_insert(variant)
            if not self._types[u]:
                self._types[u].add(FILTERED_TYPE)

    @staticmethod
    def _variants(toks, no_lower):
        yield toks                                   # raw
        yield [t.upper() for t in toks]              # ALL UPPER
        if not no_lower:
            yield [t.lower() for t in toks]          # all lower

    def _remove(self, toks):
        u = 0
        for t in toks:
            u = self._children[u].get(t, -1)
            if u < 0:
                return
        self._types[u].clear()

    # -- matching ------------------------------------------------------
    def child(self, u: int, token: str) -> int:
        return self._children[u].get(token, -1) if u >= 0 else -1

    def is_entity(self, u: int) -> bool:
        t = self._types[u]
        return len(t) > 0 and FILTERED_TYPE not in t

    def is_filtered(self, u: int) -> bool:
        t = self._types[u]
        return len(t) == 1 and FILTERED_TYPE in t

    def types_str(self, u: int) -> str:
        return ",".join(sorted(self._types[u]))


def segment_dp(tokens: list[str], kb: TrieKB,
               weight: float = 1.0) -> list[tuple[int, int, str]]:
    """Σδ² DP segmentation (string_match.h:21-99), loop order exact.
    Returns [(l, r_exclusive, types_str)] covering the sentence;
    types_str '' = O segment, FILTERED_TYPE = full-dict-only match."""
    n = len(tokens)
    f = [-1.0] * (n + 1)
    f[0] = 0.0
    tb: list[tuple[int, str]] = [(0, "")] * (n + 1)
    for i in range(n):
        if f[i] > f[i + 1]:
            f[i + 1] = f[i]
            tb[i + 1] = (i, "")
        u, delta = 0, 0
        for j in range(i, n):
            if tokens[j] == "\n":
                break
            delta += 1
            u = kb.child(u, tokens[j])
            if u < 0:
                break
            if kb.is_entity(u):
                if f[j + 1] < f[i] + delta * delta:
                    f[j + 1] = f[i] + delta * delta
                    tb[j + 1] = (i, kb.types_str(u))
            elif kb.is_filtered(u):
                if f[j + 1] < f[i] + weight * delta * delta:
                    f[j + 1] = f[i] + weight * delta * delta
                    tb[j + 1] = (i, FILTERED_TYPE)
    segs: list[tuple[int, int, str]] = []
    j = n
    while j > 0:
        i, types = tb[j]
        segs.append((i, j, types))
        j = i
    segs.reverse()
    return segs


def label_tokens(tokens: list[str], kb: TrieKB, weight: float = 1.0
                 ) -> list[tuple[str, str, str, int]]:
    """Per-token (token, boundary I/O, types, safe 1/0) — the .ck row
    content (annotation.h:263-351 getBoundary + getTypes + toCk)."""
    n = len(tokens)
    segs = segment_dp(tokens, kb, weight)
    boundary = np.ones(n, dtype=np.int8)        # 1=Break, -1=Connect, 0=?
    types = ["None"] * n
    for l, r, ty in segs:
        if ty == FILTERED_TYPE:
            # Unknown spills one past the segment end (annotation.h:276-281)
            boundary[l:min(r + 1, n)] = 0
        elif ty == "":
            pass                                # O: default Break stands
        else:
            boundary[l] = 1                     # re-break an overwritten l
            boundary[l + 1:r] = -1
            for k in range(l, r):
                types[k] = ty
    out = []
    for i, tok in enumerate(tokens):
        if boundary[i] == 0:
            out.append((tok, "O", "None", 0))
        elif boundary[i] == 1:
            out.append((tok, "I", types[i], 1))
        else:
            out.append((tok, "O", types[i], 1))
    return out


class DistantLabeler:
    """Actor-pool stage: sentence rows (doc_idx, sent_idx, text) →
    token label rows (doc_idx, sent_idx, token_idx, token, boundary,
    types, safe) — the exact row shape sources/readers.read_ck_corpus
    parses, so labeler output round-trips through the .ck format."""

    def __init__(self, core_path: str, full_path: str,
                 stopwords: tuple[str, ...] = (), weight: float = 1.0):
        import pyarrow.parquet as pq
        ct = pq.read_table(core_path)
        core = list(zip(ct["type"].to_pylist(), ct["surface"].to_pylist()))
        full = pq.read_table(full_path)["surface"].to_pylist()
        self.kb = TrieKB(core, full, stopwords)
        self.weight = weight

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in
                                 ("doc_idx", "sent_idx", "token_idx",
                                  "token", "boundary", "types", "safe")}
        for d, s, text in zip(batch["doc_idx"].to_pylist(),
                              batch["sent_idx"].to_pylist(),
                              batch["text"].to_pylist()):
            toks = text.split(" ") if text else []
            for ti, (tok, b, ty, safe) in enumerate(
                    label_tokens(toks, self.kb, self.weight)):
                cols["doc_idx"].append(d)
                cols["sent_idx"].append(s)
                cols["token_idx"].append(ti)
                cols["token"].append(tok)
                cols["boundary"].append(b)
                cols["types"].append(ty)
                cols["safe"].append(safe)
        return pa.table({
            "doc_idx": pa.array(cols["doc_idx"], pa.int64()),
            "sent_idx": pa.array(cols["sent_idx"], pa.int64()),
            "token_idx": pa.array(cols["token_idx"], pa.int64()),
            "token": pa.array(cols["token"], pa.string()),
            "boundary": pa.array(cols["boundary"], pa.string()),
            "types": pa.array(cols["types"], pa.string()),
            "safe": pa.array(cols["safe"], pa.int64()),
        })


def distant_label(sents_ds, core_path: str, full_path: str, *,
                  stopwords: tuple[str, ...] = (), weight: float = 1.0,
                  concurrency=None):
    """The distant-supervision operator: one streaming actor-pool pass,
    no shuffle (each sentence labels independently, like the reference's
    per-file processes)."""
    from deepkg_ray.util import stateful_map
    return stateful_map(
        sents_ds.select_columns(["doc_idx", "sent_idx", "text"]),
        DistantLabeler,
        {"core_path": core_path, "full_path": full_path,
         "stopwords": stopwords, "weight": weight},
        concurrency=concurrency, batch_size=1024)


def to_ck_lines(rows: pd.DataFrame) -> str:
    """Render labeler rows as .ck text (annotation.h:325-351 toCk):
    ``<s> O None S`` sentence sentinels, ``<eof> I None S`` terminators,
    one ``token I/O type S/D`` line per token.  Input must be one
    document's rows, sorted by (sent_idx, token_idx)."""
    out = []
    for _, sent in rows.groupby("sent_idx", sort=True):
        out.append("<s> O None S")
        for _, r in sent.iterrows():
            out.append(f"{r['token']} {r['boundary']} {r['types']} "
                       f"{'S' if r['safe'] else 'D'}")
        out.append("<eof> I None S")
        out.append("")
    return "\n".join(out) + "\n"
