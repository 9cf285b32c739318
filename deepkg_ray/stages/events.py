"""Event extraction — the third UIE record family.

Emits the reference's event record shape
{type, trigger_span, roles: [(role, span), ...]}
(UIE_torch/uie/evaluation/sel2record.py:522-662) for the deterministic
event template: "alert: {trigger} at {LOC} involving {ORG}." — trigger word
= event type, roles = (place: LOC, actor: ORG).

Same execution shape as relation.py: anchored single-pass scan over the
``\\x00``-joined batch blob, boundary checks with C-speed find/rfind,
dictionary + trigger-vocabulary validation.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from deepkg_ray.stages.mention import load_alias_map
from deepkg_ray.synth import (EVENT_AT, EVENT_INVOLVING, EVENT_PREFIX,
                              EVENT_TYPES)

EVENT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("event_type", pa.string()),
    ("trigger_start", pa.int32()),
    ("place_text", pa.string()),
    ("place_id", pa.int64()),
    ("actor_text", pa.string()),
    ("actor_id", pa.int64()),
])


class EventExtractor:
    """transcripts batch (with text_norm) → event rows."""

    def __init__(self, dictionary_path: str, text_col: str = "text_norm",
                 event_types=EVENT_TYPES):
        self.alias_map = load_alias_map(dictionary_path)
        self.event_types = set(event_types)
        self.anchor = re.compile(re.escape(EVENT_PREFIX))
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.match_substring(batch[self.text_col], EVENT_PREFIX)
        batch = batch.filter(mask)
        texts = batch[self.text_col].to_pylist()
        blob = "\x00".join(texts)
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                           count=len(texts))
        row_starts = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lens[:-1] + 1, out=row_starts[1:])

        out = {k: [] for k in ("row", "etype", "tstart", "ptxt", "pid",
                               "atxt", "aid")}
        for m in self.anchor.finditer(blob):
            istart, iend = m.span()
            # sentence boundary before "alert: "
            if not (istart == 0 or blob[istart - 1] == "\x00"
                    or blob[max(0, istart - 2):istart] == ". "):
                continue
            at = blob.find(EVENT_AT, iend)
            if at == -1:
                continue
            trigger = blob[iend:at]
            inv = blob.find(EVENT_INVOLVING, at + len(EVENT_AT))
            if inv == -1:
                continue
            place = blob[at + len(EVENT_AT):inv]
            pend = blob.find(".", inv + len(EVENT_INVOLVING))
            if pend == -1:
                continue
            actor = blob[inv + len(EVENT_INVOLVING):pend]
            # nothing may cross a row sentinel
            if "\x00" in blob[istart:pend]:
                continue
            pm = self.alias_map.get(place)
            am = self.alias_map.get(actor)
            if (trigger not in self.event_types or pm is None or am is None
                    or pm[1] != "LOC" or am[1] != "ORG"):
                continue
            ridx = int(np.searchsorted(row_starts, istart, side="right") - 1)
            out["row"].append(ridx)
            out["etype"].append(trigger)
            out["tstart"].append(iend - int(row_starts[ridx]))
            out["ptxt"].append(place)
            out["pid"].append(pm[0])
            out["atxt"].append(actor)
            out["aid"].append(am[0])

        idx = pa.array(np.asarray(out["row"], dtype=np.int64))
        return pa.table({
            "conv_id": batch["conv_id"].take(idx),
            "turn_idx": batch["turn_idx"].take(idx),
            "event_type": pa.array(out["etype"], pa.string()),
            "trigger_start": pa.array(out["tstart"], pa.int32()),
            "place_text": pa.array(out["ptxt"], pa.string()),
            "place_id": pa.array(out["pid"], pa.int64()),
            "actor_text": pa.array(out["atxt"], pa.string()),
            "actor_id": pa.array(out["aid"], pa.int64()),
        }, schema=EVENT_SCHEMA)


def extract_events(ds, dictionary_path: str, *, concurrency=None,
                   batch_size: int | None = None):
    """Default = worker-cached task pool; explicit concurrency = actor pool
    (util.stateful_map)."""
    from deepkg_ray.util import stateful_map
    return stateful_map(ds, EventExtractor,
                        {"dictionary_path": dictionary_path},
                        concurrency=concurrency, batch_size=batch_size)
