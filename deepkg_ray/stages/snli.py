"""SNLI-style triplet building for supervised contrastive training.

Reference semantics (SimCSE-Chinese-Pytorch/data_process.py:24-53): stream
(sentence1, sentence2, gold_label) rows; per premise keep the LAST-seen
entailment hypothesis and the LAST-seen contradiction hypothesis (the
reference's dict assignment overwrites on re-visit), and emit only premises
that have both — rows (origin, entailment, contradiction).

Ray-Data-first shape: the reference's single-process dict over the whole
file becomes a per-batch combiner + exact tree/shuffle merge.  "Last seen"
is made associative by carrying ``zfill(row_idx):sentence2`` composite keys
whose ``max`` is the argmax-by-row_idx — so partials merge in any order and
the result is deterministic under any partitioning (the 100 TB layout).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

_PAD = 20  # row_idx zero-pad width (> max int64 digits, so the
           # string max is the numeric argmax at ANY scale);
           # prefix is _PAD+1 chars incl. ':'


def _partial(b: pa.Table) -> pa.Table:
    df = b.select(["row_idx", "sentence1", "sentence2", "gold_label"]).to_pandas()
    df = df[df["gold_label"].isin(("entailment", "contradiction"))]
    key = df["row_idx"].astype(str).str.zfill(_PAD) + ":" + df["sentence2"]
    out = pd.DataFrame({
        "sentence1": df["sentence1"],
        "ent_key": key.where(df["gold_label"] == "entailment", ""),
        "con_key": key.where(df["gold_label"] == "contradiction", ""),
    })
    grp = out.groupby("sentence1", as_index=False, sort=False).max()
    return pa.Table.from_pandas(grp, preserve_index=False)


def _finalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[(df["ent_key"] != "") & (df["con_key"] != "")]
    return pd.DataFrame({
        "origin": df["sentence1"],
        "entailment": df["ent_key"].str.slice(_PAD + 1),
        "contradiction": df["con_key"].str.slice(_PAD + 1),
    })


def snli_triplets(ds, mode: str = "tree"):
    """(row_idx, sentence1, sentence2, gold_label) Dataset →
    (origin, entailment, contradiction) Dataset.

    mode: treeagg routing — 'tree' when the distinct premise set fits one
    task, 'shuffle'/'auto' for open corpora (treeagg.merge_partials)."""
    from deepkg_ray.stages.treeagg import merge_partials
    partial = ds.map_batches(_partial, batch_format="pyarrow",
                             batch_size=65536)
    merged = merge_partials(partial, ["sentence1"],
                            {"ent_key": "max", "con_key": "max"}, mode=mode)
    return merged.map_batches(_finalize, batch_format="pandas")
