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
    from deepkg_ray.util import rows_all, stateful_map
    return stateful_map(ds, EventExtractor,
                        {"dictionary_path": dictionary_path},
                        concurrency=concurrency, batch_size=batch_size)


def type_cooccurrence_jaccard(ds, user_col: str = "user_id",
                              type_col: str = "event_type"):
    """User-set overlap between event types: for every type pair a < b,
    |users(a) ∩ users(b)|, |users(a) ∪ users(b)| and their Jaccard — the
    audience-overlap set operation (intersection/union cardinalities
    computed WITHOUT materializing any user set).

    Plan: one (user → type-bitmask) groupby (per-batch OR-combiner), then
    the bitmask HISTOGRAM (≤ 2^|types| rows, a dictionary-sized table)
    folds to every pairwise intersection/union count on the driver —
    users are counted, never listed, so the shuffle is user-bounded and
    the driver holds 2^k integers.  Jaccard is one round6 division.
    Returns (type_a, type_b, n_both, n_either, jaccard)."""
    import itertools

    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    from deepkg_ray.functions.numeric import round6

    # stable type order: sorted distinct types (dictionary-sized)
    from deepkg_ray.util import rows_all
    types = sorted(r[type_col] for r in rows_all(
                   ds.select_columns([type_col])
                   .groupby(type_col).aggregate(Max(type_col,
                                                    alias_name="_m"))
                   .drop_columns(["_m"])))
    bit_of = {t: 1 << i for i, t in enumerate(types)}

    # bitwise-OR is not a built-in Ray aggregate; the exact route is
    # (user, bit) dedup rows + Sum — distinct bits sum to the OR mask
    def bit_rows(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "u": b[user_col].to_pylist(),
            "bit": [bit_of[t] for t in b[type_col].to_pylist()]})
        g = df.drop_duplicates()
        return pa.table({"u": pa.array(g["u"].astype(str), pa.string()),
                         "bit": pa.array(g["bit"].to_numpy(np.int64),
                                         pa.int64())})

    masks = (ds.select_columns([user_col, type_col])
             .map_batches(bit_rows, batch_format="pyarrow")
             .groupby(["u", "bit"]).aggregate(Sum("bit", alias_name="_s"))
             .drop_columns(["_s"])
             .groupby("u").aggregate(Sum("bit", alias_name="mask")))

    def mask_hist(b: pa.Table) -> pa.Table:
        m = b["mask"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(m, return_counts=True)
        return pa.table({"mask": pa.array(vals.astype(np.int64)),
                         "n": pa.array(cnts.astype(np.int64))})

    from deepkg_ray.stages.treeagg import merge_partials
    hist = merge_partials(
        masks.map_batches(mask_hist, batch_format="pyarrow"),
        ["mask"], {"n": "sum"}, mode="tree").to_pandas()

    mvals = hist["mask"].to_numpy(np.int64)
    mcnts = hist["n"].to_numpy(np.int64)
    rows = []
    for (i, a), (jj, b_) in itertools.combinations(enumerate(types), 2):
        ba, bb = 1 << i, 1 << jj
        has_a = (mvals & ba) > 0
        has_b = (mvals & bb) > 0
        n_both = int(mcnts[has_a & has_b].sum())
        n_either = int(mcnts[has_a | has_b].sum())
        jac = float(round6(np.asarray(
            [n_both / n_either]))[0]) if n_either else 0.0
        rows.append((a, b_, n_both, n_either, jac))
    return rd.from_arrow(pa.table({
        "type_a": pa.array([r[0] for r in rows], pa.string()),
        "type_b": pa.array([r[1] for r in rows], pa.string()),
        "n_both": pa.array([r[2] for r in rows], pa.int64()),
        "n_either": pa.array([r[3] for r in rows], pa.int64()),
        "jaccard": pa.array([r[4] for r in rows], pa.float64())}))


def salted_type_stats(ds, type_col: str = "event_type",
                      value_col: str = "value", id_col: str = "event_id",
                      n_salts: int = 16):
    """Hot-key-safe grouped aggregation: counts + exact micros sums per
    event type computed through a SALTED two-phase plan — phase 1 groups
    by (type, salt) where salt = md5-byte of the row id mod n_salts, so a
    hot type's rows spread over n_salts reducers instead of one straggler
    partition; phase 2 folds the n_salts partials per type (a
    dictionary-sized merge).  The result is identical to a plain GROUP BY
    (the SQL oracle) — salting changes the shuffle shape, never the
    answer.  The same mitigation convgroup.py applies to hot
    conversations, here gate-checked on its own.  Returns
    (event_type, n, sum_micros)."""
    import hashlib

    import pandas as pd
    from ray.data.aggregate import Sum

    from deepkg_ray.functions.numeric import to_micros
    from deepkg_ray.stages.treeagg import merge_partials

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        salt = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16)
             % n_salts for i in ids), np.int64, len(ids))
        df = pd.DataFrame({
            type_col: b[type_col].to_pylist(),
            "salt": salt,
            "vm": to_micros(b[value_col].to_pylist())})
        g = (df.groupby([type_col, "salt"], sort=False)
             .agg(n=("vm", "size"), s=("vm", "sum")).reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    salted = (ds.select_columns([id_col, type_col, value_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby([type_col, "salt"])
              .aggregate(Sum("n", alias_name="n"),
                         Sum("s", alias_name="s")))

    # phase 2: fold the ≤ |types|·n_salts partials per type
    return merge_partials(
        salted.map_batches(
            lambda b: pa.table({
                type_col: b[type_col],
                "n": b["n"].combine_chunks().cast(pa.int64()),
                "sum_micros": b["s"].combine_chunks().cast(pa.int64())}),
            batch_format="pyarrow"),
        [type_col], {"n": "sum", "sum_micros": "sum"}, mode="tree")
