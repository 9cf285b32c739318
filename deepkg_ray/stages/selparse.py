"""SEL (structured extraction language) → record parsing: a from-scratch
reimplementation of the reference's generated-string decoder semantics
(UIE_torch/uie/evaluation/sel2record.py), used to parse the output of a
UIE-style seq2struct generator into entity / relation / event records.

Parity targets (reference cites; no code copied):
- bracket conversion + token spacing      (sel2record.py:888-903 add_space /
  convert_bracket; special tokens constants.py:21-28)
- balanced-prefix truncation              (clean_text, sel2record.py:925-943)
- ill-formed repair by appending brackets (add_bracket, sel2record.py:958-965)
- label/span resplit on <extra_id_5>      (resplit_label_span, :946-955)
- <unk> repair from raw text via regex with the 100-char bail-out
  (fix_unk_from_text_without_tokenizer, :766-793)
- schema validation + span∈text check     (rewrite_label_span, :976-992)
- spot/asoc tree walk dropping malformed subtrees (SpotAsocPredictParser
  .get_record_list, :1110-1187)
- spot/asoc → entity/relation/event projection with the entity-type fallback
  ``entity_dict.get(tail, spot_type)``  (proprocessing_graph_record, :41-96)
- offset mapping: match_sublist (:99-117), overlap check (:120-137),
  strategies first / closest / longer_first with de-duplication
  (EntityRecord/RelationRecord, :297-519)

The parse is a pure function of (sel string, text, schema) → stateless
map_batches kernel; the schema is a small broadcast object (SURVEY.md §1.3).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

TYPE_START = "<extra_id_0>"
TYPE_END = "<extra_id_1>"
SPAN_START = "<extra_id_5>"
NULL_SPAN = "<extra_id_6>"
UNK = "<unk>"

LEFT, RIGHT = "【", "】"
_SPECIAL = re.compile(r"<extra_id_\d>")


# ------------------------------------------------------------ text → tree ---

def add_space(text: str) -> str:
    """Interleave each special token with the text following it (text before
    the first special token is dropped, as in the reference zip)."""
    specials = _SPECIAL.findall(text)
    pieces = _SPECIAL.split(text)[1:]
    out: list[str] = []
    for s, p in zip(specials, pieces):
        out.append(s)
        out.append(p)
    return " ".join(out)


def convert_bracket(text: str) -> str:
    text = add_space(text)
    return text.replace(TYPE_START, LEFT).replace(TYPE_END, RIGHT)


def find_bracket_num(tokens) -> int:
    n = 0
    for t in tokens:
        if t == LEFT:
            n += 1
        elif t == RIGHT:
            n -= 1
    return n


def check_well_form(tree_str: str) -> bool:
    return find_bracket_num(tree_str) == 0


def clean_text(tree_str: str) -> str:
    """Keep the first balanced prefix (token level)."""
    toks = tree_str.split()
    count = seen = 0
    for i, t in enumerate(toks):
        if t == LEFT:
            count += 1
            seen += 1
        elif t == RIGHT:
            count -= 1
            seen += 1
        if count == 0 and seen > 0:
            return " ".join(toks[: i + 1])
    return " ".join(toks)


def add_bracket(tree_str: str) -> str:
    toks = tree_str.split()
    return " ".join(toks + [RIGHT] * find_bracket_num(toks))


@dataclass
class Node:
    label: str = ""
    children: list = field(default_factory=list)   # str | Node


def parse_tree(tree_str: str) -> Node:
    """Minimal bracket-tree parser with the same shape nltk's
    ParentedTree.fromstring(brackets='【】') yields: node label = first token
    after '【'; raises ValueError on imbalance."""
    toks = tree_str.split()
    pos = 0

    def parse_node() -> Node:
        nonlocal pos
        assert toks[pos] == LEFT
        pos += 1
        node = Node()
        first = True
        while pos < len(toks):
            t = toks[pos]
            if t == RIGHT:
                pos += 1
                return node
            if t == LEFT:
                node.children.append(parse_node())
                first = False
            else:
                if first:
                    node.label = t
                    first = False
                else:
                    node.children.append(t)
                pos += 1
        raise ValueError("unbalanced tree: missing closing bracket")

    if not toks or toks[0] != LEFT:
        raise ValueError("tree must start with a bracket")
    root = parse_node()
    if pos != len(toks):
        raise ValueError("trailing tokens after root")
    return root


def get_tree_str(node: Node) -> str:
    return " ".join(c for c in node.children if isinstance(c, str))


def resplit_label_span(label: str, span: str,
                       split_symbol: str = SPAN_START) -> tuple[str, str]:
    label_span = label + " " + span
    if split_symbol in label_span:
        parts = label_span.split(split_symbol)
        if len(parts) == 2:
            return parts[0].strip(), parts[1].strip()
    return label, span


def fix_unk_from_text(span: str, text: str, unk: str = UNK) -> str:
    """Regex reconstruction of spans containing <unk>, incl. the reference's
    100-char regex bail-out (sel2record.py:766-793)."""
    if unk not in span:
        return span

    def clean_wildcard(x: str) -> str:
        sp = ".*?()[]+"
        return re.sub("(" + "|".join(f"\\{s}" for s in sp) + ")", r"\\\g<1>", x)

    match = r"\s*[^，？。\s]+\s*".join(
        clean_wildcard(item.strip()) for item in span.split(unk))
    if len(match) > 100:
        return span
    result = re.search(match, text)
    if not result:
        return span
    return result.group().strip()


def rewrite_label_span(label, span, label_set=None, text=None):
    if label_set and label not in label_set:
        return None, None
    if text is not None and UNK in span:
        span = fix_unk_from_text(span, text)
    if text is not None and span not in text:
        return None, None
    return label, span


# ------------------------------------------------------------ tree → records

def parse_sel(pred: str, text: str | None = None, spot_set=None, asoc_set=None):
    """SEL string → (record_list, counters).  record =
    {'type': spot_type, 'spot': spot_text, 'asocs': [(label, text), ...]}."""
    counters: dict[str, int] = {}

    def bump(k):
        counters[k] = counters.get(k, 0) + 1

    s = clean_text(convert_bracket(pred))
    if not check_well_form(s):
        s = add_bracket(s)
        bump("fixed")
    try:
        tree = parse_tree(s)
        bump("well-formed")
    except (ValueError, AssertionError, IndexError):
        bump("ill-formed")
        tree = Node()

    records = []
    for spot in tree.children:
        if isinstance(spot, str) or not (spot.label or spot.children):
            continue
        spot_type, spot_text = resplit_label_span(spot.label, get_tree_str(spot))
        spot_type, spot_text = rewrite_label_span(spot_type, spot_text,
                                                  spot_set, text)
        if spot_text is None or spot_text == NULL_SPAN or spot_type is None:
            continue
        rec = {"type": spot_type, "spot": spot_text, "asocs": []}
        for asoc in spot.children:
            if isinstance(asoc, str) or not (asoc.label or asoc.children):
                continue
            a_label, a_text = resplit_label_span(asoc.label, get_tree_str(asoc))
            a_label, a_text = rewrite_label_span(a_label, a_text, asoc_set, text)
            if a_text is None or a_text == NULL_SPAN or a_label is None:
                continue
            rec["asocs"].append((a_label, a_text))
        records.append(rec)
    return records, counters


def records_to_tasks(records: list[dict], entity_types: set[str],
                     event_types: set[str]) -> dict:
    """Spot/asoc records → {'entity': [...], 'relation': [...], 'event': [...]}
    with the reference's projection rules: a spot whose type is an entity
    type yields an entity (and its asocs become relations whose object type
    falls back to the subject's type when the tail wasn't itself an
    extracted entity); an event-type spot yields an event whose roles are
    filtered to known entities when any entity exists."""
    out = {"entity": [], "relation": [], "event": []}
    entity_dict: dict[str, str] = {}
    for rec in records:
        if rec["type"] in entity_types:
            out["entity"].append({"text": rec["spot"], "type": rec["type"]})
            entity_dict[rec["spot"]] = rec["type"]
        elif rec["type"] in event_types:
            out["event"].append({"trigger": rec["spot"], "type": rec["type"],
                                 "roles": list(rec["asocs"])})
    for rec in records:
        if rec["type"] in entity_types:
            for label, tail in rec["asocs"]:
                out["relation"].append({
                    "type": label,
                    "roles": [(rec["type"], rec["spot"]),
                              (entity_dict.get(tail, rec["type"]), tail)],
                })
    if entity_dict:
        for ev in out["event"]:
            ev["roles"] = [r for r in ev["roles"] if r[1] in entity_dict]
    return out


# -------------------------------------------------------- offset strategies --

def match_sublist(the_list, to_match):
    n = len(to_match)
    return [(i, i + n - 1) for i in range(len(the_list) - n + 1)
            if the_list[i:i + n] == to_match]


def check_overlap(x, y) -> bool:
    return not (x[1] < y[0] or y[1] < x[0])


def span_to_token(text: str, mode: str = "space") -> list[str]:
    if mode == "space":
        return text.split(" ")
    if mode == "list":
        return list(text)
    raise ValueError(mode)


def entity_to_offset(entities: list[dict], tokens: list[str],
                     strategy: str = "first", token_mode: str = "space"):
    """[(type, (tok_idx...))] with first-match / longer-first semantics and
    cross-record de-dup on (type, span)."""
    ents = list(entities)
    if strategy == "longer_first":
        ents = sorted(ents, key=lambda e: len(e["text"]), reverse=True)
    out = []
    matched_set: set = set()
    for e in ents:
        if e["text"] == "":
            continue
        matches = match_sublist(tokens, span_to_token(e["text"], token_mode))
        for m in matches:
            if strategy == "longer_first" and any(
                    check_overlap(g, m) for _, g in matched_set):
                continue
            if (e["type"], m) not in matched_set:
                out.append((e["type"], tuple(range(m[0], m[1] + 1))))
                matched_set.add((e["type"], m))
                break
    return out


def relation_to_offset(relations: list[dict], tokens: list[str],
                       strategy: str = "first", token_mode: str = "space",
                       de_duplicate: bool = True):
    """[(rel_type, arg1_type, arg1_span, arg2_type, arg2_span)] — 'first'
    takes the first match per argument; 'closest' minimizes the start-index
    distance between the two argument matches."""
    out = []
    for rec in relations:
        if len(rec["roles"]) < 2:
            continue
        rel_type = rec["type"]
        (t1, s1), (t2, s2) = rec["roles"][0], rec["roles"][1]
        m1 = match_sublist(tokens, span_to_token(s1, token_mode))
        m2 = match_sublist(tokens, span_to_token(s2, token_mode))
        if not m1 or not m2:
            # reference `break`s out of the whole instance on a failed
            # reconstruction (sel2record.py:458-462) — mirrored
            break
        if strategy == "closest":
            pairs = sorted((abs(a[0] - b[0]), a, b) for a in m1 for b in m2)
            a, b = pairs[0][1], pairs[0][2]
        else:
            a, b = m1[0], m2[0]
        rel = (rel_type, t1, tuple(range(a[0], a[1] + 1)),
               t2, tuple(range(b[0], b[1] + 1)))
        if de_duplicate and rel in out:
            continue
        out.append(rel)
    return out


# ------------------------------------------------------------ Ray kernel ----

class Sel2RecordKernel:
    """Stateless map_batches kernel: batch with (pred_sel, text) columns →
    exploded relation-record rows (the schema rides in the constructor, the
    analog of the broadcast record schema)."""

    def __init__(self, entity_types: set[str], event_types: set[str] = (),
                 asoc_types: set[str] | None = None,
                 sel_col: str = "pred_sel", text_col: str = "text"):
        self.entity_types = set(entity_types)
        self.event_types = set(event_types)
        self.spot_set = self.entity_types | self.event_types
        self.asoc_set = set(asoc_types) if asoc_types else None
        self.sel_col, self.text_col = sel_col, text_col

    def __call__(self, batch):
        import pyarrow as pa
        sels = batch[self.sel_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        rows = {"row_idx": [], "pred": [], "subj_type": [], "subj_text": [],
                "obj_type": [], "obj_text": []}
        for i, (sel, text) in enumerate(zip(sels, texts)):
            records, _ = parse_sel(sel, text, self.spot_set, self.asoc_set)
            tasks = records_to_tasks(records, self.entity_types,
                                     self.event_types)
            for rel in tasks["relation"]:
                (t1, s1), (t2, s2) = rel["roles"]
                rows["row_idx"].append(i)
                rows["pred"].append(rel["type"])
                rows["subj_type"].append(t1)
                rows["subj_text"].append(s1)
                rows["obj_type"].append(t2)
                rows["obj_text"].append(s2)
        idx = pa.array(rows.pop("row_idx"), pa.int64())
        cols = {}
        for kc in batch.column_names:
            if kc not in (self.sel_col, self.text_col):
                cols[kc] = batch[kc].take(idx)
        for name, vals in rows.items():
            cols[name] = pa.array(vals, pa.string())
        return pa.table(cols)


# ------------------------------------------------------- records → SEL -----

def convert_spot_asoc(records: list[dict]) -> str:
    """Serialize spot-asoc records back to a SEL string — the reference's
    target-string builder (convert_spot_asoc, sel2record.py:995-1026, with
    the BaseStructureMarker tokens of constants.py:59-73).  Inverse of
    parse_sel for well-formed records; used for gold-side generation
    (annonote_graph analog, process_data.py:284-350) and round-trip tests."""
    parts = []
    for rec in records:
        inner = [rec["type"], SPAN_START, rec["spot"]]
        for label, text in rec.get("asocs", []):
            inner.append(TYPE_START)
            inner.extend([label, SPAN_START, text])
            inner.append(TYPE_END)
        parts.append(TYPE_START + " " + " ".join(inner) + " " + TYPE_END)
    return TYPE_START + " " + " ".join(parts) + " " + TYPE_END


def tasks_to_spot_asoc(entities: list[dict], relations: list[dict],
                       events: list[dict]) -> list[dict]:
    """entity/relation/event task records → spot-asoc records — the
    `annonote_graph` inversion (process_data.py:284-350): entities become
    spots; each relation attaches (rel_type, obj_text) as an asoc of its
    subject spot; events become spots with their role asocs."""
    by_spot: dict[tuple[str, str], dict] = {}
    for e in entities:
        key = (e["type"], e["text"])
        by_spot.setdefault(key, {"type": e["type"], "spot": e["text"],
                                 "asocs": []})
    for r in relations:
        (s_type, s_text), (_o_type, o_text) = r["roles"][0], r["roles"][1]
        spot = by_spot.setdefault((s_type, s_text),
                                  {"type": s_type, "spot": s_text, "asocs": []})
        spot["asocs"].append((r["type"], o_text))
    out = list(by_spot.values())
    for ev in events:
        out.append({"type": ev["type"], "spot": ev["trigger"],
                    "asocs": list(ev.get("roles", []))})
    return out


def build_ssi_prefix(spot_types: list[str], asoc_types: list[str]) -> str:
    """Structured-schema-instruction prompt prefix: ordered
    '<spot> t1 <spot> t2 ... <asoc> a1 ... <extra_id_2>' (the reference's
    ordered_prompt=True assembly, data_collator_torch.py:196-226, 298-311;
    ordering pinned by sort for determinism)."""
    parts = []
    for t in sorted(spot_types):
        parts.append("<spot> " + t)
    for a in sorted(asoc_types):
        parts.append("<asoc> " + a)
    return " ".join(parts) + " <extra_id_2> "
