"""AutoPhrase-style iterative self-training over the phrase-candidate
table — the reference's mining epoch loop (AutoPhraseX-main/autophrasex/
autophrase.py:102-167: classify the negative pool, move confident
negatives to the positive pool, refit, repeat; EarlyStopping flips the
driver flag when pool growth stalls, callbacks.py:224-241).

Engine shape (the kg_pagerank convention applied to a learning loop —
every step deterministic, so the WHOLE loop is oracle-checkable by an
unrolled per-epoch SQL re-derivation, oracle.autophrase_selftrain_oracle):

- candidate features are the distributed stat aggregations the engine
  already SQL-checks (PMI, min-token IDF, min right-neighbor entropy),
  folded to integer micros;
- the per-epoch FIT is a closed-form nearest-centroid model: the positive
  and negative pools' feature centroids (floor(sum/|pool|) on exact
  float64 sums — both sides evaluate the identical expression).  The
  reference fine-tunes a GBDT here; the closed-form fit keeps the loop
  SQL-re-derivable, and stages/gbdt.GradientBoostedStumps slots into the
  same loop body for the non-oracle tier (phrasemine.phrase_quality_scores);
- the per-epoch CLASSIFY is distributed: centroids broadcast via ray.put,
  margin = d²(x, neg centroid) − d²(x, pos centroid) computed int64-exact
  inside map_batches; a negative-pool phrase moves to the positive pool
  when margin > 0;
- the loop is driven by state/callbacks.run_epochs with
  EarlyStopping(monitor='pos_size', min_delta=1, patience=1): stop at the
  first epoch that moves nothing — a FIXED POINT of the deterministic
  epoch map, so the unrolled oracle (which always evaluates max_epochs
  epochs) lands on the identical final pools.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

FEATS = ("pmi_m", "idf_m", "ent_m")


def phrase_feature_table(ds, topk: int = 200, min_count: int = 2,
                         text_col: str = "text") -> pd.DataFrame:
    """Candidate bigram phrases with integer-micros features
    (phrase, cnt, pmi_m, idf_m, ent_m).  The stats are the engine's
    distributed aggregations (phrasemine.pmi_bigrams / idf_table /
    neighbor_entropy — each independently oracle-checked); the topk-bounded
    assembly happens driver-side, the same plan position as the
    reference's pooled selector (autophrase.py:105-118)."""
    from deepkg_ray.functions.numeric import to_micros
    from deepkg_ray.stages.phrasemine import (frequent_phrases, idf_table,
                                              neighbor_entropy, pmi_bigrams)

    cands = frequent_phrases(ds, n=2, topk=topk, min_count=min_count,
                             text_col=text_col).to_pandas()
    pmi = pmi_bigrams(ds, text_col=text_col)
    pmi["phrase"] = pmi["w1"] + " " + pmi["w2"]
    n_docs = ds.count()
    idf = idf_table(ds.select_columns([text_col]), n_docs=n_docs,
                    text_col=text_col).to_pandas().set_index("w1")["idf"]
    ent = neighbor_entropy(ds, side="right",
                           text_col=text_col).set_index("w1")["entropy"]

    df = cands.merge(pmi[["phrase", "pmi"]], on="phrase", how="left")
    words = df["phrase"].str.split(" ")
    df["idf_min"] = [min(idf[w] for w in ws) for ws in words]
    df["ent_min"] = [min(ent[w] for w in ws) for ws in words]
    assert not df[["pmi", "idf_min", "ent_min"]].isna().any().any(), \
        "every candidate bigram must carry all three stats"
    out = pd.DataFrame({
        "phrase": df["phrase"],
        "cnt": df["cnt"].astype(np.int64),
        "pmi_m": to_micros(df["pmi"].to_numpy()),
        "idf_m": to_micros(df["idf_min"].to_numpy()),
        "ent_m": to_micros(df["ent_min"].to_numpy()),
    })
    # pin the (cnt desc, phrase asc) candidate order — the seed cut below
    # must not depend on block arrival order
    return out.sort_values(["cnt", "phrase"], ascending=[False, True],
                           kind="stable").reset_index(drop=True)


def _centroids(labeled) -> dict:
    """One streaming pass → 8 scalars: pool sizes + per-feature sums for
    both pools (exact: micros ints sum in int64)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        pos = b["epoch_added"].to_numpy(zero_copy_only=False) >= 0
        cols = {"n_pos": pa.array([int(pos.sum())], pa.int64()),
                "n_neg": pa.array([int((~pos).sum())], pa.int64())}
        for f in FEATS:
            x = b[f].to_numpy(zero_copy_only=False)
            cols[f"p_{f}"] = pa.array([int(x[pos].sum())], pa.int64())
            cols[f"n_{f}"] = pa.array([int(x[~pos].sum())], pa.int64())
        return pa.table(cols)

    names = (["n_pos", "n_neg"] + [f"p_{f}" for f in FEATS]
             + [f"n_{f}" for f in FEATS])
    agg = labeled.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(c, alias_name=c) for c in names])
    return {c: int(agg[c] or 0) for c in names}


def autophrase_selftrain(ds, topk: int = 200, min_count: int = 2,
                         n_seed: int = 10, max_epochs: int = 6,
                         text_col: str = "text"):
    """Run the self-training loop; returns a Dataset of the FINAL positive
    pool (phrase, cnt, epoch_added) — epoch_added = 0 for seeds, e for
    phrases the epoch-e classifier promoted.  Deterministic end-to-end;
    see the module docstring for the oracle contract."""
    import ray.data as rd

    from deepkg_ray.state.callbacks import EarlyStopping, run_epochs

    feat = phrase_feature_table(ds, topk=topk, min_count=min_count,
                                text_col=text_col)
    # seed pool: the n_seed most frequent candidates (cnt desc, phrase asc
    # — the frequent_phrases order), the quality-phrase-file analog
    seed = set(feat["phrase"].head(n_seed))
    assert seed, "empty seed pool"
    feat["epoch_added"] = np.where(feat["phrase"].isin(seed), 0, -1) \
        .astype(np.int64)
    labeled = rd.from_pandas(feat).materialize()
    holder = {"ds": labeled}

    def body(epoch: int, state: dict):
        c = _centroids(holder["ds"])
        if c["n_neg"] == 0:                     # nothing left to promote
            state["pos_size"] = c["n_pos"]
            state["early_stop"] = True
            return
        # floor(sum/n) on exact float64 (sums < 2^53) — the identical
        # expression the SQL oracle evaluates
        cp = np.array([np.floor(c[f"p_{f}"] / c["n_pos"]) for f in FEATS],
                      dtype=np.int64)
        cn = np.array([np.floor(c[f"n_{f}"] / c["n_neg"]) for f in FEATS],
                      dtype=np.int64)
        ref = ray.put((cp, cn, epoch))

        def classify(b: pa.Table) -> pa.Table:
            cpos, cneg, ep = ray.get(ref)
            x = np.stack([b[f].to_numpy(zero_copy_only=False)
                          for f in FEATS], axis=1)
            d2p = ((x - cpos[None, :]) ** 2).sum(axis=1)
            d2n = ((x - cneg[None, :]) ** 2).sum(axis=1)
            lab = b["epoch_added"].to_numpy(zero_copy_only=False).copy()
            move = (lab < 0) & (d2n - d2p > 0)
            lab[move] = ep + 1
            return b.set_column(b.schema.get_field_index("epoch_added"),
                                "epoch_added", pa.array(lab, pa.int64()))

        holder["ds"] = holder["ds"].map_batches(
            classify, batch_format="pyarrow").materialize()
        state["pos_size"] = int(holder["ds"].map_batches(
            lambda b: pa.table({"n": pa.array(
                [int((b["epoch_added"].to_numpy(zero_copy_only=False)
                      >= 0).sum())], pa.int64())}),
            batch_format="pyarrow").sum("n") or 0)

    run_epochs(max_epochs, body,
               callbacks=[EarlyStopping(monitor="pos_size", patience=1,
                                        min_delta=1)])
    return holder["ds"].filter(expr="epoch_added >= 0") \
        .select_columns(["phrase", "cnt", "epoch_added"])
