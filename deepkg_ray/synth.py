"""Deterministic synthesis of the transcript table + entity dictionary.

The engine's primary input (per BASELINE.json ``input_hint``) is a Parquet
table of multi-turn conversation transcripts::

    (conv_id: string, turn_idx: int32, role: string, text: string,
     tool: string, ts: timestamp[us])

There is no external data in the sandbox, so this module synthesizes that
table deterministically (fixed seed) at a scale derived from the testdata
scale factor, together with the entity dictionary (the analog of the
reference's ICD-10 xlsx dictionary, Normalization/recall/model/
Bulid_Data_Model.py:32-35) and gold mention/triple tables known by
construction (FIXTURES.md §1-§5).

Construction invariants (asserted at build time) that make the pipeline
output *exactly* SQL-checkable by a DuckDB oracle:

1. No entity surface (alias) is a substring of any other surface, and
   surfaces never overlap in generated text → trie maximal matching equals
   plain substring counting.
2. Entity surfaces are built from pseudo-words disjoint from the filler and
   template vocabulary → no accidental mentions.
3. Relation sentences have exactly one surface form per predicate, the
   subject starts at a sentence boundary, and two relation sentences are
   never adjacent → an RE2-compatible regex (no lookbehind) extracts exactly
   the planted triples.
4. Normalization (width-fold + lowercase + control→space) is
   length-preserving, and non-ASCII / control characters are planted only in
   filler words → char offsets are identical in raw and normalized text, and
   DuckDB's plain ``lower(text)`` agrees with the engine's normalizer on
   every surface-bearing region.

Nothing here imports Ray; synthesis is a pure driver-side step whose output
is read back with ``ray.data.read_parquet``.
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260817
SYNTH_VERSION = "v2"
SYNTH_ROOT = "/tmp/deepkg_synth"

ENTITY_TYPES = ["PERSON", "ORG", "LOC", "PRODUCT", "DRUG", "DISEASE"]

# Event sentences: "alert: {trigger} at {LOC} involving {ORG}." — the
# trigger word IS the event type; roles are (place: LOC, actor: ORG).
# Shapes mirror the reference's event record
# {type, trigger_span, roles: [(role, span)...]} (sel2record.py:522-662).
EVENT_TYPES = ["breach", "outage", "overload", "leak"]
EVENT_PREFIX = "alert: "
EVENT_AT = " at "
EVENT_INVOLVING = " involving "

# (pred, subj_type, obj_type, infix) — infix is the literal text between the
# subject and object surfaces; the sentence is "{subj}{infix}{obj}.".
# Shapes mirror the reference's relation 5-tuple
# (rel_type, subj_type, subj_span, obj_type, obj_span)
# (UIE_torch/uie/evaluation/scorer.py:266-349).
RELATION_TEMPLATES: list[tuple[str, str, str, str]] = [
    ("works_at", "PERSON", "ORG", " works at "),
    ("founded", "PERSON", "ORG", " founded "),
    ("located_in", "ORG", "LOC", " is located in "),
    ("part_of", "LOC", "LOC", " is part of "),
    ("acquired", "ORG", "ORG", " acquired "),
    ("develops", "ORG", "PRODUCT", " develops "),
    ("uses", "PERSON", "PRODUCT", " uses "),
    ("treats", "DRUG", "DISEASE", " treats "),
]

# Filler vocabulary: deliberately excludes every relation-template keyword
# (works, at, founded, located, in, part, of, acquired, develops, uses,
# treats, is) and every dictionary suffix word.
FILLER_WORDS = (
    "the a then we they meeting notes review follow up summary action "
    "agenda topic discussion result metric chart report deck plan idea "
    "question answer detail context update status draft final copy table "
    "list item thing point case issue fix test run batch job task queue "
    "log trace error warning info debug line page file folder link"
).split()

# A few width-variant / control-flavored filler tokens to exercise the
# normalizer; planted only in filler sentences (invariant 4).
WEIRD_FILLERS = ["ｎｏｔｅ", "ｄａｔａ", "ｐｌａｎ", "todo\tlist"]

MENTION_WRAPPERS = [
    ("we discussed ", " today"),
    ("follow up on ", ""),
    ("see the report about ", ""),
    ("next topic ", ""),
]

TYPE_SUFFIXES = {
    # canonical-suffix, alias-suffix (invariant 1: base word unique per
    # entity, so "X holdings" vs "X group" are never substrings of anything).
    "ORG": ("holdings", "group"),
    "LOC": ("valley", "harbor"),
    "PRODUCT": ("engine", "toolkit"),
    "DRUG": ("tablets", "serum"),
    "DISEASE": ("syndrome", "fever"),
}

_CONSONANTS = "bdfgklmnprstvz"
_VOWELS = "aeiou"


@dataclass(frozen=True)
class Entity:
    entity_id: int
    name: str          # canonical surface (normalized form, lowercase)
    etype: str
    aliases: tuple[str, ...]  # all surfaces incl. canonical, normalized

    @property
    def alias_only(self) -> tuple[str, ...]:
        return tuple(a for a in self.aliases if a != self.name)


@dataclass
class SynthSpec:
    sf: float
    n_convs: int
    avg_turns: int
    n_hot: int
    hot_turns: int
    shard_rows: int = 50_000

    @classmethod
    def for_sf(cls, sf: float) -> "SynthSpec":
        total = int(5_400_000 * sf)          # sf0.01 → ~54k turns (FIXTURES.md §9)
        n_convs = max(20, total // 27)
        return cls(
            sf=sf,
            n_convs=n_convs,
            avg_turns=25,
            n_hot=2,
            hot_turns=max(200, min(2000, total // 10)),
        )


def _pseudo_words(rng: random.Random, n: int, taken: set[str], nsyll=(2, 3)) -> list[str]:
    """Unique pronounceable pseudo-words, disjoint from all vocab in `taken`."""
    out: list[str] = []
    while len(out) < n:
        k = rng.randint(*nsyll)
        w = "".join(rng.choice(_CONSONANTS) + rng.choice(_VOWELS) for _ in range(k))
        if w in taken or any(w in t or t in w for t in taken):
            continue
        taken.add(w)
        out.append(w)
    return out


def build_dictionary(n_per_type: int = 30, seed: int = SEED) -> list[Entity]:
    """Deterministic entity dictionary: analog of the reference's two-column
    (id, name) term table (Bulid_Data_Model.py:32-35) extended with typed
    aliases.  entity_id is dense in sorted-canonical-name order (SURVEY.md
    §2.5 "label vocabulary build": order pinned by sort, not appearance)."""
    rng = random.Random(seed)
    taken = set(FILLER_WORDS)
    for _, _, _, infix in RELATION_TEMPLATES:
        taken.update(infix.split())
    taken.update(EVENT_TYPES)
    taken.update(["alert", "involving"])
    for a, b in TYPE_SUFFIXES.values():
        taken.update((a, b))
    for pre, post in MENTION_WRAPPERS:
        taken.update((pre + post).split())

    raw: list[tuple[str, str, tuple[str, ...]]] = []   # (name, type, aliases)
    for etype in ENTITY_TYPES:
        if etype == "PERSON":
            firsts = _pseudo_words(rng, n_per_type, taken)
            lasts = _pseudo_words(rng, n_per_type, taken)
            for f, ln in zip(firsts, lasts):
                name = f"{f} {ln}"
                raw.append((name, etype, (name, f"{ln} {f}")))
        else:
            suf_a, suf_b = TYPE_SUFFIXES[etype]
            bases = _pseudo_words(rng, n_per_type, taken)
            for b in bases:
                name = f"{b} {suf_a}"
                raw.append((name, etype, (name, f"{b} {suf_b}")))

    # invariant 1: no surface is a substring of any other surface
    surfaces = [s for _, _, al in raw for s in al]
    assert len(surfaces) == len(set(surfaces))
    for i, s in enumerate(surfaces):
        for j, t in enumerate(surfaces):
            if i != j and s in t:
                raise AssertionError(f"surface substring collision: {s!r} in {t!r}")

    raw.sort(key=lambda r: r[0])
    return [Entity(i, name, etype, aliases) for i, (name, etype, aliases) in enumerate(raw)]


@dataclass
class _Gold:
    mentions: list[tuple] = field(default_factory=list)   # conv, turn, start, end_incl, type, surface, entity_id
    triples: list[tuple] = field(default_factory=list)    # conv, turn, pred, s_txt, s_type, s_id, o_txt, o_type, o_id
    events: list[tuple] = field(default_factory=list)     # conv, turn, etype, trig_start, place_txt, place_id, actor_txt, actor_id


class _TurnWriter:
    """Assembles one turn's text from sentences while recording gold offsets."""

    def __init__(self, conv_id: str, turn_idx: int, gold: _Gold):
        self.conv_id, self.turn_idx, self.gold = conv_id, turn_idx, gold
        self.parts: list[str] = []
        self.pos = 0

    def _append(self, s: str) -> int:
        start = self.pos
        self.parts.append(s)
        self.pos += len(s)
        return start

    def sep(self):
        if self.parts:
            self._append(" ")

    def filler(self, rng: random.Random):
        self.sep()
        n = rng.randint(3, 7)
        ws = [rng.choice(FILLER_WORDS) for _ in range(n)]
        if rng.random() < 0.08:
            ws[rng.randrange(n)] = rng.choice(WEIRD_FILLERS)
        self._append(" ".join(ws) + ".")

    def _mention_at(self, offset: int, ent: Entity, surface: str):
        self.gold.mentions.append(
            (self.conv_id, self.turn_idx, offset, offset + len(surface) - 1,
             ent.etype, surface, ent.entity_id))

    def mention(self, rng: random.Random, ent: Entity):
        self.sep()
        pre, post = MENTION_WRAPPERS[rng.randrange(len(MENTION_WRAPPERS))]
        surface = ent.aliases[rng.randrange(len(ent.aliases))]
        start = self._append(pre + surface + post + ".")
        self._mention_at(start + len(pre), ent, surface)

    def relation(self, rng: random.Random, pred: str, infix: str,
                 subj: Entity, obj: Entity):
        self.sep()
        s_surf = subj.aliases[rng.randrange(len(subj.aliases))]
        o_surf = obj.aliases[rng.randrange(len(obj.aliases))]
        start = self._append(s_surf + infix + o_surf + ".")
        self._mention_at(start, subj, s_surf)
        self._mention_at(start + len(s_surf) + len(infix), obj, o_surf)
        self.gold.triples.append(
            (self.conv_id, self.turn_idx, pred,
             s_surf, subj.etype, subj.entity_id,
             o_surf, obj.etype, obj.entity_id))

    def event(self, rng: random.Random, etype: str, place: Entity,
              actor: Entity):
        self.sep()
        p_surf = place.aliases[rng.randrange(len(place.aliases))]
        a_surf = actor.aliases[rng.randrange(len(actor.aliases))]
        start = self._append(EVENT_PREFIX + etype + EVENT_AT + p_surf
                             + EVENT_INVOLVING + a_surf + ".")
        trig_start = start + len(EVENT_PREFIX)
        p_start = trig_start + len(etype) + len(EVENT_AT)
        a_start = p_start + len(p_surf) + len(EVENT_INVOLVING)
        self._mention_at(p_start, place, p_surf)
        self._mention_at(a_start, actor, a_surf)
        self.gold.events.append(
            (self.conv_id, self.turn_idx, etype, trig_start,
             p_surf, place.entity_id, a_surf, actor.entity_id))

    def text(self) -> str:
        return "".join(self.parts)


def _gen_turn_text(rng: random.Random, conv_id: str, turn_idx: int,
                   by_type: dict[str, list[Entity]], gold: _Gold) -> str:
    w = _TurnWriter(conv_id, turn_idx, gold)
    w.filler(rng)
    n_extra = rng.randint(0, 3)
    prev_was_relation = False
    for _ in range(n_extra):
        r = rng.random()
        if r < 0.45 and not prev_was_relation:
            pred, st, ot, infix = RELATION_TEMPLATES[rng.randrange(len(RELATION_TEMPLATES))]
            subj = rng.choice(by_type[st])
            obj = rng.choice(by_type[ot])
            if st == ot and subj.entity_id == obj.entity_id:
                obj = by_type[ot][(by_type[ot].index(subj) + 1) % len(by_type[ot])]
            w.relation(rng, pred, infix, subj, obj)
            # invariant 3: never two relation sentences back-to-back — the
            # oracle regex consumes the trailing "." of a matched sentence.
            prev_was_relation = True
        elif r < 0.55 and not prev_was_relation:
            w.event(rng, EVENT_TYPES[rng.randrange(len(EVENT_TYPES))],
                    rng.choice(by_type["LOC"]), rng.choice(by_type["ORG"]))
            # event sentences consume their trailing "." when matched —
            # same non-adjacency rule as relations (invariant 3)
            prev_was_relation = True
        elif r < 0.78:
            w.mention(rng, rng.choice(by_type[rng.choice(ENTITY_TYPES)]))
            prev_was_relation = False
        else:
            w.filler(rng)
            prev_was_relation = False
    return w.text()


def synth_dir_for(sf_dir: str) -> str:
    """Map a testdata dir like /root/testdata/sf0.01 → this synth's output dir."""
    name = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(SYNTH_ROOT, SYNTH_VERSION, name)


def sf_from_dir(sf_dir: str) -> float:
    name = os.path.basename(os.path.normpath(sf_dir))
    return float(name.replace("sf", "")) if name.startswith("sf") else 0.01


def ensure_synth(sf_dir: str) -> str:
    """Idempotently synthesize transcripts + dictionary + golds for the scale
    implied by ``sf_dir``.  Returns the synth output dir containing:

    - transcripts/part-NNNN.parquet  (sharded, for resume tests)
    - dictionary.parquet             (entity_id, name, type, aliases)
    - mentions_gold.parquet
    - triples_gold.parquet
    - spec.json
    """
    out = synth_dir_for(sf_dir)
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out

    sf = sf_from_dir(sf_dir)
    spec = SynthSpec.for_sf(sf)
    entities = build_dictionary()
    by_type: dict[str, list[Entity]] = {t: [] for t in ENTITY_TYPES}
    for e in entities:
        by_type[e.etype].append(e)

    rng = random.Random(SEED + 1)
    gold = _Gold()

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []

    base_ts = 1_700_000_000_000_000  # µs epoch
    tool_names = ["search", "calc", "browse", ""]

    def emit_conv(conv_id: str, n_turns: int):
        t0 = base_ts + rng.randrange(10**9)
        for ti in range(n_turns):
            text = _gen_turn_text(rng, conv_id, ti, by_type, gold)
            is_tool = rng.random() < 0.1
            conv_ids.append(conv_id)
            turn_idxs.append(ti)
            roles.append("tool" if is_tool else ("user" if ti % 2 == 0 else "assistant"))
            tools.append(rng.choice(tool_names[:3]) if is_tool else "")
            texts.append(text)
            tss.append(t0 + ti * 1_000_000)

    # hot conversations first (invariant: a few convs get ~100x median turns
    # to exercise salted-key skew handling, FIXTURES.md §1)
    for h in range(spec.n_hot):
        emit_conv(f"conv-hot-{h:02d}", spec.hot_turns)
    for c in range(spec.n_convs):
        emit_conv(f"conv-{c:06d}", max(2, int(rng.expovariate(1 / spec.avg_turns))))

    tmp = out + ".tmp"
    if os.path.exists(tmp):
        import shutil
        shutil.rmtree(tmp)
    os.makedirs(os.path.join(tmp, "transcripts"), exist_ok=True)

    table = pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us")),
    })
    n = table.num_rows
    shard = spec.shard_rows
    for i, off in enumerate(range(0, n, shard)):
        pq.write_table(table.slice(off, shard),
                       os.path.join(tmp, "transcripts", f"part-{i:04d}.parquet"))

    pq.write_table(pa.table({
        "entity_id": pa.array([e.entity_id for e in entities], pa.int64()),
        "name": pa.array([e.name for e in entities], pa.string()),
        "type": pa.array([e.etype for e in entities], pa.string()),
        "aliases": pa.array([list(e.aliases) for e in entities], pa.list_(pa.string())),
    }), os.path.join(tmp, "dictionary.parquet"))

    m = gold.mentions
    pq.write_table(pa.table({
        "conv_id": pa.array([x[0] for x in m], pa.string()),
        "turn_idx": pa.array([x[1] for x in m], pa.int32()),
        "start_idx": pa.array([x[2] for x in m], pa.int32()),
        "end_idx": pa.array([x[3] for x in m], pa.int32()),   # inclusive, like the reference
        "type": pa.array([x[4] for x in m], pa.string()),
        "surface": pa.array([x[5] for x in m], pa.string()),
        "entity_id": pa.array([x[6] for x in m], pa.int64()),
    }), os.path.join(tmp, "mentions_gold.parquet"))

    t = gold.triples
    pq.write_table(pa.table({
        "conv_id": pa.array([x[0] for x in t], pa.string()),
        "turn_idx": pa.array([x[1] for x in t], pa.int32()),
        "pred": pa.array([x[2] for x in t], pa.string()),
        "subj_text": pa.array([x[3] for x in t], pa.string()),
        "subj_type": pa.array([x[4] for x in t], pa.string()),
        "subj_id": pa.array([x[5] for x in t], pa.int64()),
        "obj_text": pa.array([x[6] for x in t], pa.string()),
        "obj_type": pa.array([x[7] for x in t], pa.string()),
        "obj_id": pa.array([x[8] for x in t], pa.int64()),
    }), os.path.join(tmp, "triples_gold.parquet"))

    ev = gold.events
    pq.write_table(pa.table({
        "conv_id": pa.array([x[0] for x in ev], pa.string()),
        "turn_idx": pa.array([x[1] for x in ev], pa.int32()),
        "event_type": pa.array([x[2] for x in ev], pa.string()),
        "trigger_start": pa.array([x[3] for x in ev], pa.int32()),
        "place_text": pa.array([x[4] for x in ev], pa.string()),
        "place_id": pa.array([x[5] for x in ev], pa.int64()),
        "actor_text": pa.array([x[6] for x in ev], pa.string()),
        "actor_id": pa.array([x[7] for x in ev], pa.int64()),
    }), os.path.join(tmp, "events_gold.parquet"))

    with open(os.path.join(tmp, "spec.json"), "w") as f:
        json.dump({"sf": sf, "n_rows": n, "n_convs": spec.n_convs + spec.n_hot,
                   "n_gold_triples": len(t), "n_gold_mentions": len(m),
                   "n_gold_events": len(ev),
                   "seed": SEED, "version": SYNTH_VERSION}, f)

    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write("ok")
    os.makedirs(SYNTH_ROOT, exist_ok=True)
    # atomic-ish rename; tolerate a concurrent winner
    try:
        os.rename(tmp, out)
    except OSError:
        if not os.path.exists(marker):
            raise
    return out


def snli_path(sf_dir: str) -> str:
    """Lazily synthesize an SNLI-style premise/hypothesis pair table
    (row_idx, sentence1, sentence2, gold_label) in the synth cache dir —
    the input shape of the reference's supervised-SimCSE preprocess
    (SimCSE-Chinese-Pytorch/data_process.py:24-53).  Generated as a
    separate artifact with its own marker so existing caches stay valid.

    Deterministic properties the snli_triplets oracle relies on:
    - labels ∈ {entailment, contradiction, neutral};
    - some premises appear with the same label more than once (exercises
      the reference's dict-overwrite last-wins semantics);
    - some premises lack one of the two labels (filtered out)."""
    out = ensure_synth(sf_dir)
    path = os.path.join(out, "snli.parquet")
    if os.path.exists(path):
        return path
    rng = random.Random(SEED + 7)
    n_base = max(200, int(20_000 * sf_from_dir(sf_dir)))
    rows: list[tuple[int, str, str, str]] = []
    ridx = 0
    for i in range(n_base):
        w = [rng.choice(FILLER_WORDS) for _ in range(rng.randint(3, 6))]
        s1 = f"premise {i:05d} " + " ".join(w)
        labels = ["entailment", "contradiction", "neutral"]
        # ~70% of premises get both target labels; the rest miss one
        picks = (labels if rng.random() < 0.7
                 else [rng.choice(labels[:2]), "neutral"])
        if rng.random() < 0.3:          # duplicate a label → last-wins case
            picks.append(picks[0])
        for lbl in picks:
            s2 = f"hyp {ridx:06d} " + rng.choice(FILLER_WORDS)
            rows.append((ridx, s1, s2, lbl))
            ridx += 1
    t = pa.table({
        "row_idx": pa.array([r[0] for r in rows], pa.int64()),
        "sentence1": pa.array([r[1] for r in rows], pa.string()),
        "sentence2": pa.array([r[2] for r in rows], pa.string()),
        "gold_label": pa.array([r[3] for r in rows], pa.string()),
    })
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path


def ck_paths(sf_dir: str) -> tuple[str, str]:
    """Lazily synthesize a .ck noisy-annotation corpus (the AutoNER
    distant-supervision train format: one token per line —
    ``token I/O type[,type...] [S|D]`` — blank line between sentences,
    ``-DOCSTART-`` between documents; AutoNER/preprocess_partial_ner/
    encode_folder.py:55-75) plus a parquet gold of the same content, so
    the reader's parse is SQL-checkable row-for-row.
    Returns (ck_file, gold_parquet)."""
    out = ensure_synth(sf_dir)
    ck = os.path.join(out, "corpus.ck")
    gold = os.path.join(out, "ck_gold.parquet")
    if os.path.exists(ck) and os.path.exists(gold):
        return ck, gold
    rng = random.Random(SEED + 11)
    entities = build_dictionary()
    n_sents = max(200, int(50_000 * sf_from_dir(sf_dir)))
    lines: list[str] = []
    g: dict[str, list] = {k: [] for k in
                          ("doc_idx", "sent_idx", "token_idx", "token",
                           "boundary", "types", "safe")}
    doc_idx, sent_in_doc = 0, 0
    sent_idx = 0
    lines.append("-DOCSTART-\n")
    for _ in range(n_sents):
        if sent_in_doc >= 20:
            lines.append("-DOCSTART-\n")
            doc_idx += 1
            sent_in_doc = 0
        toks: list[tuple[str, str, str, int]] = []
        for _ in range(rng.randint(2, 6)):
            if rng.random() < 0.3:
                e = entities[rng.randrange(len(entities))]
                words = e.name.split()
                for k, w in enumerate(words):
                    # I = break BEFORE this token, O = connected to previous
                    toks.append((w, "I" if k == 0 else "O", e.etype,
                                 1 if rng.random() < 0.8 else 0))
            else:
                toks.append((rng.choice(FILLER_WORDS), "I", "None", 1))
        for ti, (w, b, ty, safe) in enumerate(toks):
            lines.append(f"{w} {b} {ty} {'S' if safe else 'D'}\n")
            g["doc_idx"].append(doc_idx)
            g["sent_idx"].append(sent_idx)
            g["token_idx"].append(ti)
            g["token"].append(w)
            g["boundary"].append(b)
            g["types"].append(ty)
            g["safe"].append(safe)
        lines.append("\n")
        sent_idx += 1
        sent_in_doc += 1
    with open(ck + ".tmp", "w") as f:
        f.writelines(lines)
    pq.write_table(pa.table({
        "doc_idx": pa.array(g["doc_idx"], pa.int64()),
        "sent_idx": pa.array(g["sent_idx"], pa.int64()),
        "token_idx": pa.array(g["token_idx"], pa.int64()),
        "token": pa.array(g["token"], pa.string()),
        "boundary": pa.array(g["boundary"], pa.string()),
        "types": pa.array(g["types"], pa.string()),
        "safe": pa.array(g["safe"], pa.int64()),
    }), gold + ".tmp")
    os.replace(ck + ".tmp", ck)
    os.replace(gold + ".tmp", gold)
    return ck, gold


def transcripts_path(sf_dir: str) -> str:
    return os.path.join(ensure_synth(sf_dir), "transcripts")


DOC_VOCAB = ("stream shard block batch merge spill probe build scan seek "
             "flush fold pivot slice stripe bucket vector kernel lattice "
             "cursor ledger packet beacon tensor module router schema "
             "window filter reduce append encode decode verify sample "
             "anchor offset replay braid quorum epoch digest signal").split()


def documents_table_path(sf_dir: str) -> str:
    """documents.parquet for ``sf_dir``: the driver testdata file when it
    exists, else a lazily synthesized corpus of the SAME shape (doc_id,
    text, lang, source, n_chars; 50k docs/sf; ~1% exact-dup + ~2% near-dup
    rows so the dedup family has structure to find) in the synth cache —
    what lets bench.py run the dedup pipelines at sf1, where no testdata
    tier exists."""
    real = os.path.join(sf_dir, "documents.parquet")
    if os.path.exists(real):
        return real
    out = synth_dir_for(sf_dir)
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "documents.parquet")
    if os.path.exists(path):
        return path
    rng = random.Random(SEED + 23)
    n = max(500, int(50_000 * sf_from_dir(sf_dir)))
    langs = ["en"] * 6 + ["zh"] * 2 + ["es", "fr"]
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 100 and r < 0.01:                    # exact duplicate
            texts.append(texts[rng.randrange(i - 100, i)])
            continue
        if i > 100 and r < 0.03:                    # near duplicate
            w = texts[rng.randrange(i - 100, i)].split()
            for _ in range(rng.randint(1, 2)):
                w[rng.randrange(len(w))] = rng.choice(DOC_VOCAB)
            texts.append(" ".join(w))
            continue
        k = rng.randint(10, 60)
        texts.append(" ".join(rng.choice(DOC_VOCAB) for _ in range(k)))
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([langs[i % len(langs)] for i in range(n)],
                         pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(t_) for t_ in texts], pa.int64()),
    })
    tmp = path + f".tmp{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path


def dictionary_path(sf_dir: str) -> str:
    return os.path.join(ensure_synth(sf_dir), "dictionary.parquet")


def distant_paths(sf_dir: str) -> tuple[str, str, str]:
    """Lazily synthesize the AutoNER distant-supervision inputs
    (AutoNER/src/annotation.h:180-217 loadKBForMatching's two dictionaries
    plus a raw token corpus):

    - distant_sents.parquet  (doc_idx, sent_idx, text) — space-joined
      token sentences (the parallel unit, one row per sentence);
    - distant_core.parquet   (surface, type) — the CORE dict: typed, safe
      supervision (one row per (surface, type); a surface may carry
      several types, comma-joined by the trie like the reference's
      set<string>);
    - distant_full.parquet   (surface) — the FULL dict: untyped surfaces
      that mark tie-or-break boundaries as Unknown/dangerous.

    Construction invariants that make the Σδ² DP segmentation
    (string_match.h:21-99) SQL-derivable on THIS corpus (the general
    engine handles overlaps; tests cover those separately):

    1. dict-surface tokens and filler tokens come from disjoint vocabularies
       (no accidental or partial matches);
    2. unigram-surface tokens, bigram first tokens and bigram second tokens
       are pairwise disjoint (no surface is a prefix of another);
    3. injected occurrences are separated by ≥1 filler token (matches never
       overlap or abut, so optimal DP = all occurrences, and the filtered
       span's Unknown spill always lands on a filler);
    4. everything is lowercase and stopword-free (case folding and stopword
       cleaning are identities here; covered by unit tests instead).

    Returns (sents_parquet, core_parquet, full_parquet)."""
    out = ensure_synth(sf_dir)
    sents_p = os.path.join(out, "distant_sents.parquet")
    core_p = os.path.join(out, "distant_core.parquet")
    full_p = os.path.join(out, "distant_full.parquet")
    if all(os.path.exists(p) for p in (sents_p, core_p, full_p)):
        return sents_p, core_p, full_p

    rng = random.Random(SEED + 13)
    core_uni = [f"coru{i}qk" for i in range(20)]
    core_bi = [(f"corp{i}vx", f"corq{i}mz") for i in range(20)]
    full_uni = [f"fulu{i}rt" for i in range(15)]
    full_bi = [(f"fulp{i}gd", f"fulq{i}bn") for i in range(15)]

    core_rows: list[tuple[str, str]] = []
    for i, w in enumerate(core_uni):
        core_rows.append((w, ENTITY_TYPES[i % len(ENTITY_TYPES)]))
    for i, (a, b) in enumerate(core_bi):
        core_rows.append((f"{a} {b}", ENTITY_TYPES[(i + 2) % len(ENTITY_TYPES)]))
    # two surfaces carry a second type — exercises the trie's set-union +
    # comma-join (annotation.h:161-177 getTypeFromKB)
    core_rows.append((core_uni[0], "PRODUCT"))
    core_rows.append((f"{core_bi[0][0]} {core_bi[0][1]}", "LOC"))
    full_rows = list(full_uni) + [f"{a} {b}" for a, b in full_bi]

    core_surfaces = [s for s, _ in core_rows]
    full_surfaces = list(full_rows)

    n_sents = max(300, int(30_000 * sf_from_dir(sf_dir)))
    docs, sents, texts = [], [], []
    for s in range(n_sents):
        toks: list[str] = []
        n_seg = rng.randint(2, 5)
        for k in range(n_seg):
            # ≥1 filler between injections (invariant 3)
            for _ in range(rng.randint(1, 3)):
                toks.append(rng.choice(FILLER_WORDS))
            r = rng.random()
            if r < 0.35:
                toks.extend(rng.choice(core_surfaces).split())
            elif r < 0.55:
                toks.extend(rng.choice(full_surfaces).split())
        if rng.random() < 0.5:          # half the sentences end on a filler
            toks.append(rng.choice(FILLER_WORDS))
        docs.append(s // 20)
        sents.append(s)
        texts.append(" ".join(toks))

    def _write(t: pa.Table, path: str):
        pq.write_table(t, path + ".tmp")
        os.replace(path + ".tmp", path)

    _write(pa.table({
        "doc_idx": pa.array(docs, pa.int64()),
        "sent_idx": pa.array(sents, pa.int64()),
        "text": pa.array(texts, pa.string())}), sents_p)
    _write(pa.table({
        "surface": pa.array([s for s, _ in core_rows], pa.string()),
        "type": pa.array([t for _, t in core_rows], pa.string())}), core_p)
    _write(pa.table({
        "surface": pa.array(full_rows, pa.string())}), full_p)
    return sents_p, core_p, full_p
