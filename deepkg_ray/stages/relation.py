"""Relation (triple) extraction — deterministic pattern tier.

Produces the reference's relation record shape: the 5-tuple
``(rel_type, subj_type, subj_span, obj_type, obj_span)`` whose
``(subj, pred, obj)`` projection is the KG triple
(UIE_torch/uie/evaluation/scorer.py:266-349; record assembly
sel2record.py:405-519).  Where the reference gets records from a T5
generator + SEL parse, this deterministic tier gets them from
sentence-anchored surface patterns validated against the entity
dictionary — the same "generate candidates, then validate types/spans
against the schema, then de-duplicate" contract (sel2record.py:976-992,
463-466), with the dictionary playing the role of the record schema.

Execution: stateful actor pool; patterns compiled + dictionary loaded once
per actor.  Per batch: one C-speed regex pass per predicate over the
``\\x00``-joined batch text (no per-row Python loop), candidate captures
validated by hash lookup, per-sentence de-dup by construction (finditer is
non-overlapping).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from deepkg_ray.stages.mention import load_alias_map

# default predicate templates — shared with the synthesizer so the engine
# and the DuckDB oracle extract from identical surface forms.
from deepkg_ray.synth import RELATION_TEMPLATES

TRIPLE_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("pred", pa.string()),
    ("subj_text", pa.string()),
    ("subj_type", pa.string()),
    ("subj_start", pa.int32()),
    ("obj_text", pa.string()),
    ("obj_type", pa.string()),
    ("obj_start", pa.int32()),
])

# a candidate entity surface: starts with a letter, continues with
# letters/digits/space/hyphen/comma — the charset the SQL oracle's RE2
# capture uses; engine-side validation is the dictionary lookup itself.
_SURF_OK = re.compile(r"[a-z][a-z0-9, -]*\Z")


def compile_pred_patterns(templates=RELATION_TEMPLATES) -> list[tuple[str, str, str, re.Pattern]]:
    """One compiled *infix* pattern per predicate.  The extraction anchors on
    infix occurrences (rare) and expands to the enclosing sentence with
    C-speed find/rfind — equivalent to the oracle regex
    ``(^|\\. )(surf)<infix>(surf)\\.`` but O(text) instead of a lazy-capture
    scan that backtracks quadratically per sentence."""
    return [(pred, subj_t, obj_t, re.compile(re.escape(infix)))
            for pred, subj_t, obj_t, infix in templates]


class RelationExtractor:
    """transcripts batch (with text_norm) → surface-triples batch."""

    def __init__(self, dictionary_path: str, text_col: str = "text_norm",
                 templates=RELATION_TEMPLATES):
        import re as _re
        self.alias_map = load_alias_map(dictionary_path)  # surface → (eid, type, canonical)
        self.patterns = compile_pred_patterns(templates)
        self.text_col = text_col
        # ONE joint alternation over all predicate infixes → a single
        # C-speed pass over the batch blob instead of one pass per
        # predicate (8x fewer scans; measured 2.1 s → ~1.1 s per 502k
        # turns).  Soundness: a joint non-overlapping scan could only skip
        # an infix occurrence that overlaps a previous match by its
        # boundary space — such a candidate's subject/object would contain
        # infix words and can never validate against the dictionary
        # (synth invariant 2: surfaces are infix-word-free), so the
        # accepted triple set is identical to the per-predicate scans
        # (and to the oracle's per-predicate regexes).
        self.joint_rx = _re.compile(
            "|".join(_re.escape(infix) for _, _, _, infix in templates))
        self.infix_meta = {infix: (pred, st, ot)
                           for pred, st, ot, infix in templates}
        # vectorized C prefilter: rows without any predicate infix can never
        # yield a triple — drop them before the Python-object conversion
        # (typically 2-3x fewer rows reach the Python regex path)
        self.prefilter_re = "|".join(_re.escape(infix.strip())
                                     for _, _, _, infix in templates)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.match_substring_regex(batch[self.text_col], self.prefilter_re)
        batch = batch.filter(mask)
        texts = batch[self.text_col].to_pylist()
        blob = "\x00".join(texts)
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
        row_starts = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lens[:-1] + 1, out=row_starts[1:])

        # candidate spans from ONE joint pass (see __init__)
        cands = [(m.start(), m.end(), m.group(0))
                 for m in self.joint_rx.finditer(blob)]
        if not cands:
            return pa.table({f.name: pa.array([], f.type)
                             for f in TRIPLE_SCHEMA}, schema=TRIPLE_SCHEMA)
        ist = np.fromiter((c[0] for c in cands), np.int64, len(cands))
        ien = np.fromiter((c[1] for c in cands), np.int64, len(cands))

        if blob.isascii():
            # Vectorized sentence-boundary resolution: one byte scan finds
            # every '.', '. ' and row sentinel; per-candidate rfind/find
            # becomes batched searchsorted (the scalar loop spent ~6 µs per
            # match here — the kernel's dominant cost).
            buf = np.frombuffer(blob.encode("ascii"), dtype=np.uint8)
            dot_pos = np.flatnonzero(buf == ord("."))
            follow = np.full(len(buf), 0, dtype=np.uint8)
            follow[:-1] = buf[1:]
            dotspace = dot_pos[follow[dot_pos] == ord(" ")]
            nul_pos = np.flatnonzero(buf == 0)
            big = np.iinfo(np.int64).max
            # sentinel padding makes every searchsorted index valid even on
            # empty position arrays (single-row batch → no '\x00')
            dotspace_p = np.concatenate(([-2], dotspace))
            nul_lo = np.concatenate(([-1], nul_pos))
            dot_hi = np.concatenate((dot_pos, [big]))
            nul_hi = np.concatenate((nul_pos, [big]))
            # subject start: max(last '. ' start < istart-1 → +2,
            #                    last sentinel < istart → +1); pads give 0
            ds_cand = dotspace_p[np.searchsorted(dotspace_p, ist - 1,
                                                 side="left") - 1] + 2
            nl_cand = nul_lo[np.searchsorted(nul_lo, ist, side="left") - 1] + 1
            sstart = np.maximum(ds_cand, nl_cand)
            # object end: first '.' ≥ iend, with no sentinel in between
            pend = dot_hi[np.searchsorted(dot_pos, ien, side="left")]
            next_nul = nul_hi[np.searchsorted(nul_pos, ien, side="left")]
            ok = (pend != big) & (next_nul > pend)
        else:
            # non-ASCII fallback: byte offsets ≠ char offsets, keep the
            # scalar boundary search (correct for any unicode)
            sstart = np.empty(len(cands), np.int64)
            pend = np.empty(len(cands), np.int64)
            ok = np.ones(len(cands), bool)
            for i, (istart, iend, _) in enumerate(cands):
                b_dot = blob.rfind(". ", 0, istart)
                b_nul = blob.rfind("\x00", 0, istart)
                sstart[i] = max(b_dot + 2 if b_dot != -1 else 0,
                                b_nul + 1 if b_nul != -1 else 0)
                p = blob.find(".", iend)
                pend[i] = p
                ok[i] = p != -1 and blob.find("\x00", iend, p) == -1

        ridx_all = np.searchsorted(row_starts, sstart, side="right") - 1

        rows: list[int] = []
        preds: list[str] = []
        s_txt: list[str] = []
        s_typ: list[str] = []
        s_pos: list[int] = []
        o_txt: list[str] = []
        o_typ: list[str] = []
        o_pos: list[int] = []
        amap = self.alias_map
        imeta = self.infix_meta
        for i in range(len(cands)):
            if not ok[i]:
                continue
            istart, iend, infix = cands[i]
            ss = int(sstart[i])
            subj = blob[ss:istart]
            obj = blob[iend:int(pend[i])]
            # validate captured surfaces against the dictionary with the
            # template's type constraints (schema-validation analog,
            # sel2record.py:976-992); also enforce the oracle's RE2
            # surface charset so engine ≡ oracle on any input
            sm = amap.get(subj)
            om = amap.get(obj)
            pred, subj_t, obj_t = imeta[infix]
            if (sm is None or om is None or sm[1] != subj_t
                    or om[1] != obj_t or not _SURF_OK.match(subj)
                    or not _SURF_OK.match(obj)):
                continue
            r = int(ridx_all[i])
            rows.append(r)
            preds.append(pred)
            s_txt.append(subj)
            s_typ.append(subj_t)
            s_pos.append(ss - int(row_starts[r]))
            o_txt.append(obj)
            o_typ.append(obj_t)
            o_pos.append(iend - int(row_starts[r]))

        idx = pa.array(np.asarray(rows, dtype=np.int64))
        return pa.table({
            "conv_id": batch["conv_id"].take(idx),
            "turn_idx": batch["turn_idx"].take(idx),
            "pred": pa.array(preds, pa.string()),
            "subj_text": pa.array(s_txt, pa.string()),
            "subj_type": pa.array(s_typ, pa.string()),
            "subj_start": pa.array(s_pos, pa.int32()),
            "obj_text": pa.array(o_txt, pa.string()),
            "obj_type": pa.array(o_typ, pa.string()),
            "obj_start": pa.array(o_pos, pa.int32()),
        }, schema=TRIPLE_SCHEMA)


def extract_triples(ds, dictionary_path: str, *, concurrency=None,
                    batch_size: int | None = None):
    """Default = worker-cached task pool; explicit concurrency = actor pool
    (util.stateful_map)."""
    from deepkg_ray.util import stateful_map
    return stateful_map(ds, RelationExtractor,
                        {"dictionary_path": dictionary_path},
                        concurrency=concurrency, batch_size=batch_size)


class LinkedRelationExtractor(RelationExtractor):
    """Fused extraction + exact linking: the alias map is already in this
    actor, so emitting canonical ids here removes a whole actor-pool stage
    (and one object-store hop) from the hot path."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = super().__call__(batch)
        s_ids, s_names, o_ids, o_names = [], [], [], []
        for s in t["subj_text"].to_pylist():
            m = self.alias_map[s]
            s_ids.append(m[0]); s_names.append(m[2])
        for o in t["obj_text"].to_pylist():
            m = self.alias_map[o]
            o_ids.append(m[0]); o_names.append(m[2])
        return (t.append_column("subj_id", pa.array(s_ids, pa.int64()))
                .append_column("subj_name", pa.array(s_names, pa.string()))
                .append_column("obj_id", pa.array(o_ids, pa.int64()))
                .append_column("obj_name", pa.array(o_names, pa.string())))


def extract_linked_triples(ds, dictionary_path: str, *, concurrency=None,
                           batch_size: int = 8192):
    from deepkg_ray.util import cluster_cpus, heavy_pool
    kwargs: dict = {}
    if concurrency is None:
        if cluster_cpus() <= 3:
            # tiny clusters: three half-CPU actors keep the extraction share
            # at ~3/4 of the cluster — the SAME share larger clusters get
            # from heavy_pool, so scaling measurements across levels compare
            # like with like (integer actors at n=2 force a 50% share, which
            # showed up as fake super-linear 2→8 efficiency)
            concurrency = (3, 3)
            kwargs["num_cpus"] = 0.5
        else:
            concurrency = heavy_pool()
    return ds.map_batches(
        LinkedRelationExtractor,
        fn_constructor_kwargs={"dictionary_path": dictionary_path},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        **kwargs,
    )


def extract_linked_triples_tasks(ds, dictionary_path: str, *,
                                 batch_size: int | None = None):
    """TASK-pool variant via the shared per-worker state cache
    (util.stateful_map): the extractor (alias map + compiled patterns) is
    built once per worker process — the same amortization an actor pool
    gives, WITHOUT pool sizing/ramp pathologies.  Actor pools remain the
    right shape for GPU/model stages (multimodal.py, uie.py)."""
    from deepkg_ray.util import stateful_map
    return stateful_map(ds, LinkedRelationExtractor,
                        {"dictionary_path": dictionary_path},
                        concurrency=None, batch_size=batch_size)


_LN2 = 0.6931471805599453


class DecayedEdgeCells(LinkedRelationExtractor):
    """Fused extraction + linking + freshness collapse: per batch, extract
    linked triples, attach ts batch-locally ((conv, turn) lives in this
    batch's rows), weight each extraction exp(-ln2 * (tref - ts)/halflife)
    rounded to int64 micros, and collapse to (subj_id, pred, obj_id) cells
    with (w_micros, n).  Integer micros per extraction + integer SUM keeps
    the result order-independent and SQL-exact (the harmonic-mean
    convention applied to a decay kernel)."""

    def __init__(self, dictionary_path: str, tref_us: int,
                 halflife_us: int = 600_000_000, **kw):
        super().__init__(dictionary_path, **kw)
        self.tref_us = int(tref_us)
        self.halflife_us = int(halflife_us)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        tri = LinkedRelationExtractor.__call__(self, batch)
        if tri.num_rows == 0:
            return pa.table({
                "subj_id": pa.array([], pa.int64()),
                "pred": pa.array([], pa.string()),
                "obj_id": pa.array([], pa.int64()),
                "w_micros": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())})
        bm = pd.DataFrame({
            "conv_id": batch["conv_id"].to_pylist(),
            "turn_idx": batch["turn_idx"].to_numpy(zero_copy_only=False),
            "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
                      .to_numpy(zero_copy_only=False)})
        td = pd.DataFrame({
            "conv_id": tri["conv_id"].to_pylist(),
            "turn_idx": tri["turn_idx"].to_numpy(zero_copy_only=False),
            "subj_id": tri["subj_id"].to_numpy(zero_copy_only=False),
            "pred": tri["pred"].to_pylist(),
            "obj_id": tri["obj_id"].to_numpy(zero_copy_only=False)})
        j = td.merge(bm, on=["conv_id", "turn_idx"], how="left", sort=False)
        dt = (self.tref_us - j["ts_us"].to_numpy(np.int64)).astype(np.float64)
        w = np.floor(np.exp(-_LN2 * dt / float(self.halflife_us))
                     * 1_000_000.0 + 0.5).astype(np.int64)
        j["w_micros"] = w
        g = j.groupby(["subj_id", "pred", "obj_id"], sort=False)["w_micros"]
        out = pd.DataFrame({"w_micros": g.sum(), "n": g.size()}).reset_index()
        return pa.table({
            "subj_id": pa.array(out["subj_id"].to_numpy(np.int64)),
            "pred": pa.array(out["pred"], pa.string()),
            "obj_id": pa.array(out["obj_id"].to_numpy(np.int64)),
            "w_micros": pa.array(out["w_micros"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64))})


def decayed_adjacency(ds, dictionary_path: str, tref_us: int, *,
                      halflife_us: int = 600_000_000, concurrency=None):
    """Freshness-weighted KG edges: (subj_id, pred, obj_id, w_micros, n)
    where w_micros = Σ round6-micros(exp(-ln2·(tref-ts)/halflife)) over
    that edge's extractions — the recency signal an incremental KG ranks
    edges by (old evidence decays, repeated fresh evidence dominates).
    ds must carry (conv_id, turn_idx, text_norm, ts); tref_us is the
    corpus max-ts computed by the caller's cheap ts-only pre-pass.
    Plan: fused extract+decay+collapse (DecayedEdgeCells — triple rows
    never shuffle), one dictionary-bounded tree merge."""
    from deepkg_ray.stages.treeagg import merge_partials
    from deepkg_ray.util import stateful_map
    cells = stateful_map(ds, DecayedEdgeCells,
                         {"dictionary_path": dictionary_path,
                          "tref_us": tref_us, "halflife_us": halflife_us},
                         concurrency=concurrency, batch_size=None)
    return merge_partials(cells, ["subj_id", "pred", "obj_id"],
                          {"w_micros": "sum", "n": "sum"})
