"""Evaluation metrics with reference-parity semantics, distributed.

- ``TupleMetric``: exact tuple P/R/F1 with the reference's three match
  modes (uie/evaluation/scorer.py:44-111):
  * 'set'        — per-instance set intersection
  * 'normal'     — multiset one-shot matching (each gold matched once)
  * 'multimatch' — every pred matching any gold counts
  F1 formula ×100 as in scorer.py compute_f1 (:65-77).

- ``distributed_prf``: the Ray plan — per-row (tp, gold, pred) counters
  emitted inside map_batches, global sums, final P/R/F1 on the driver
  (SURVEY.md §2.5: per-row semantics preserved exactly, only the counter
  summation is distributed).

- ``global_pointer_f1``: 2·Σ(y_true·y_pred)/Σ(y_true+y_pred)
  (ExtractionEntities/metrics/metrics.py:2-4) over span sets.

- ``recall_at_n_ds``: mean over rows of the fraction of gold names present
  in the top-N candidates (Normalization Bulid_Data_Model.py:71-89) —
  computed exactly over all rows (the reference averages per-process block
  averages, run.py:47, which biases when blocks are uneven; we do not).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class TupleMetric:
    def __init__(self, match_mode: str = "normal"):
        assert match_mode in {"set", "normal", "multimatch"}
        self.match_mode = match_mode
        self.tp = 0.0
        self.gold_num = 0.0
        self.pred_num = 0.0

    @staticmethod
    def _safe_div(a, b):
        return 0.0 if b == 0 else a / b

    def count_instance(self, gold_list, pred_list):
        if self.match_mode == "set":
            g, p = set(gold_list), set(pred_list)
            self.gold_num += len(g)
            self.pred_num += len(p)
            self.tp += len(g & p)
            return
        self.gold_num += len(gold_list)
        self.pred_num += len(pred_list)
        dup = list(gold_list)
        for pred in pred_list:
            if pred in dup:
                self.tp += 1
                if self.match_mode == "normal":
                    dup.remove(pred)

    def merge(self, other: "TupleMetric"):
        self.tp += other.tp
        self.gold_num += other.gold_num
        self.pred_num += other.pred_num

    def compute_f1(self, prefix: str = "") -> dict:
        p = self._safe_div(self.tp, self.pred_num)
        r = self._safe_div(self.tp, self.gold_num)
        return {prefix + "tp": self.tp, prefix + "gold": self.gold_num,
                prefix + "pred": self.pred_num, prefix + "P": p * 100,
                prefix + "R": r * 100,
                prefix + "F1": self._safe_div(2 * p * r, p + r) * 100}


def _instance_counters(gold_lists, pred_lists, match_mode):
    tp = gold = pred = 0.0
    for g, p in zip(gold_lists, pred_lists):
        m = TupleMetric(match_mode)
        m.count_instance(g, p)
        tp += m.tp
        gold += m.gold_num
        pred += m.pred_num
    return tp, gold, pred


_TUPLE_SEP = "\x1f"


def distributed_prf(gold_ds, pred_ds, key_cols, tuple_cols,
                    match_mode: str = "set") -> dict:
    """P/R/F1 of pred vs gold tuples grouped per instance key — fully
    distributed.

    Plan (nothing data-sized ever reaches the driver):
      1. per-batch combiner on each side: rows → (key, tuple, side count)
         cells (tuples encoded as \\x1f-joined strings — injective as long
         as the separator never appears in a field, so set/multiset match
         semantics are preserved exactly);
      2. union of the two sides → ONE groupby at (instance, tuple) grain
         summing the per-side counts — the cogroup, with no per-group
         Python: every TupleMetric mode is a closed form over the two
         cell counts (see `finish` below), evaluated vectorized per batch;
      3. a global Sum over (tp, gold, pred) — three scalars — and
         compute_f1 on the driver.
    Instances present on only one side still form cells (outer-join
    semantics for free).  Per-instance match semantics are exactly
    TupleMetric's (uie/evaluation/scorer.py:44-111): 'normal' sequential
    gold-removal matching ≡ Σ min(gc, pc) per tuple cell."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def side_combiner(side: str):
        def per_batch(df: pd.DataFrame) -> pd.DataFrame:
            enc = [_TUPLE_SEP.join(map(str, t))
                   for t in zip(*[df[c] for c in tuple_cols])]
            df = df[list(key_cols)].copy()
            df["_tup"] = enc
            g = (df.groupby(list(key_cols) + ["_tup"]).size()
                 .reset_index(name="c"))
            g["gc"] = g["c"] if side == "g" else 0
            g["pc"] = g["c"] if side == "p" else 0
            return g.drop(columns=["c"])
        return per_batch

    g = gold_ds.select_columns(list(key_cols) + list(tuple_cols)) \
        .map_batches(side_combiner("g"), batch_format="pandas")
    p = pred_ds.select_columns(list(key_cols) + list(tuple_cols)) \
        .map_batches(side_combiner("p"), batch_format="pandas")

    # ONE cogroup at (instance, tuple) grain, then a vectorized per-batch
    # finish — no per-group Python.  Every TupleMetric mode is a closed
    # form over the two per-cell counts (instances split across batches
    # just sum):
    #   set:        tp = Σ [gc>0 ∧ pc>0], gold = Σ [gc>0], pred = Σ [pc>0]
    #   normal:     tp = Σ min(gc, pc),   gold = Σ gc,     pred = Σ pc
    #   multimatch: tp = Σ pc·[gc>0],     gold = Σ gc,     pred = Σ pc
    # The cell merge routes by observed cardinality (treeagg mode='auto'):
    # pandas merge tree while the distinct cells fit one task, Ray groupby
    # beyond — a Ray sort-aggregate keyed on long tuple STRINGS is ~4×
    # slower at the tree-friendly scale.
    from deepkg_ray.stages.treeagg import merge_partials
    cells = merge_partials(g.union(p), list(key_cols) + ["_tup"],
                           {"gc": "sum", "pc": "sum"}, mode="auto")

    def finish(b: pa.Table) -> pa.Table:
        gc = b["gc"].to_numpy(zero_copy_only=False).astype(np.int64)
        pc = b["pc"].to_numpy(zero_copy_only=False).astype(np.int64)
        if match_mode == "set":
            tp = int(((gc > 0) & (pc > 0)).sum())
            gold, pred = int((gc > 0).sum()), int((pc > 0).sum())
        elif match_mode == "normal":
            tp = int(np.minimum(gc, pc).sum())
            gold, pred = int(gc.sum()), int(pc.sum())
        else:                                        # multimatch
            tp = int((pc * (gc > 0)).sum())
            gold, pred = int(gc.sum()), int(pc.sum())
        return pa.table({"tp": pa.array([tp], pa.int64()),
                         "gold": pa.array([gold], pa.int64()),
                         "pred": pa.array([pred], pa.int64())})

    counters = cells.map_batches(finish, batch_format="pyarrow").aggregate(
        Sum("tp", alias_name="tp"), Sum("gold", alias_name="gold"),
        Sum("pred", alias_name="pred"))
    m = TupleMetric(match_mode)
    m.tp = float(counters["tp"] or 0.0)
    m.gold_num = float(counters["gold"] or 0.0)
    m.pred_num = float(counters["pred"] or 0.0)
    return m.compute_f1()


def global_pointer_f1(gold_spans: set, pred_spans: set) -> float:
    """2*|intersection| / (|gold| + |pred|) — the dense-tensor formula of
    metrics/metrics.py:2-4 restated over span sets (identical value)."""
    inter = len(gold_spans & pred_spans)
    denom = len(gold_spans) + len(pred_spans)
    return 0.0 if denom == 0 else 2 * inter / denom


def recall_at_n_ds(candidates_ds, gold: dict[str, list[str]], n: int, *,
                   mode: str = "fraction") -> float:
    """Exact row-mean recall@N from a candidates Dataset
    (query, candidate_name, rank).  mode='fraction' scores each query by
    the fraction of its gold names retrieved; mode='any' scores 1.0 if ANY
    gold name is retrieved (the SQL oracle's max-over-golds semantics —
    identical when every query has one gold)."""
    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["rank"] < n]
        g = (df.groupby("query")["candidate_name"].agg(set).reset_index())
        return g

    per_q = candidates_ds.map_batches(per_batch, batch_format="pandas").to_pandas()
    got = {q: set() for q in gold}
    for q, s in zip(per_q["query"], per_q["candidate_name"]):
        if q in got:
            got[q] |= s
    if mode == "any":
        vals = [float(any(g in got[q] for g in golds)) if golds else 1.0
                for q, golds in gold.items()]
    else:
        vals = [np.mean([g in got[q] for g in golds]) if golds else 1.0
                for q, golds in gold.items()]
    return float(np.mean(vals)) if vals else float("nan")


def _min_gold_rank(candidates_ds, gold_ds, *, num_partitions=None):
    """(query, minr) Dataset: inner hash-join of candidate rows
    (query, candidate_name, rank) to gold pairs (query, gold) on
    (query, name), then groupby(query).min(rank).  Duplicate gold pairs
    are harmless (min over more copies), so no dedup shuffle is needed."""
    from ray.data.aggregate import Min

    from deepkg_ray.util import drop_empty_blocks, join_partitions
    if num_partitions is None:
        num_partitions = join_partitions()
    g = gold_ds.map_batches(
        lambda t: t.rename_columns(["query", "candidate_name"]),
        batch_format="pyarrow")
    matched = drop_empty_blocks(
        candidates_ds.select_columns(["query", "candidate_name", "rank"])) \
        .join(drop_empty_blocks(g), join_type="inner",
              num_partitions=num_partitions,
              on=("query", "candidate_name"))
    return matched.groupby("query").aggregate(Min("rank", alias_name="minr"))


def _distinct_query_count(gold_ds) -> int:
    """n_queries of an open gold set — distinct-key groupby, count only
    (no query strings reach the driver)."""
    from ray.data.aggregate import Count
    return gold_ds.select_columns(["query"]).groupby("query") \
        .aggregate(Count(alias_name="_c")).count()


def recall_at_n_distributed(candidates_ds, gold_ds, ns=(1, 5), *,
                            num_partitions=None) -> dict:
    """Any-match recall@N for an OPEN query set: gold is a Dataset of
    (query, gold) pairs — never a driver dict.  Plan: hash-join to the
    matched candidate rows, min-rank per query (groupby), per-batch hit
    counters, global Sum — four scalars reach the driver.  Round6 row-mean
    (exact 0/1 integer sums, one float64 divide) — same value as
    recall_at_n_ds(mode='any')."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from deepkg_ray.functions.numeric import round6

    minr = _min_gold_rank(candidates_ds, gold_ds,
                          num_partitions=num_partitions)

    def hits(b: pa.Table) -> pa.Table:
        r = b["minr"].to_numpy(zero_copy_only=False)
        return pa.table({f"h{n}": pa.array([int((r < n).sum())], pa.int64())
                         for n in ns})

    agg = minr.map_batches(hits, batch_format="pyarrow").aggregate(
        *[Sum(f"h{n}", alias_name=f"h{n}") for n in ns])
    n_q = _distinct_query_count(gold_ds)
    out = {"n_queries": n_q}
    for n in ns:
        out[f"recall_at_{n}"] = float(round6((agg[f"h{n}"] or 0) / n_q)) \
            if n_q else float("nan")
    return out


def mrr_distributed(candidates_ds, gold_ds, *,
                    num_partitions=None) -> tuple:
    """MRR for an OPEN query set (gold as a (query, gold) Dataset): the
    min-rank groupby feeds per-batch micros-reciprocal sums
    (floor(1e6/(rank+1)+0.5) — exact-integer double division), one global
    Sum, one driver divide.  Same value as mrr_ds.  Returns
    (n_queries, mrr)."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    minr = _min_gold_rank(candidates_ds, gold_ds,
                          num_partitions=num_partitions)

    def rr(b: pa.Table) -> pa.Table:
        r = b["minr"].to_numpy(zero_copy_only=False).astype(np.float64)
        micros = np.floor(1e6 / (r + 1.0) + 0.5).astype(np.int64)
        return pa.table({"rr": pa.array([int(micros.sum())], pa.int64())})

    total = minr.map_batches(rr, batch_format="pyarrow") \
        .aggregate(Sum("rr", alias_name="rr"))["rr"] or 0
    n_q = _distinct_query_count(gold_ds)
    mrr = float(np.floor(total / n_q + 0.5) / 1e6) if n_q else float("nan")
    return n_q, mrr


def ndcg_distributed(candidates_ds, gold_ds, *,
                     num_partitions=None) -> tuple:
    """nDCG for the single-gold retrieval eval (binary relevance, one
    gold per query ⇒ IDCG = 1): per query 1/log₂(best_rank + 2), 0 on
    miss — mrr_distributed's plan with the log discount.  The discount
    quantizes as floor(1e6·ln 2 / ln(rank+2) + 0.5): ln on INTEGER args
    is bit-equal engine/DuckDB (the zipf-fit precedent), so the metric
    is hash-exact.  Returns (n_queries, ndcg)."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    minr = _min_gold_rank(candidates_ds, gold_ds,
                          num_partitions=num_partitions)

    def dcg(b: pa.Table) -> pa.Table:
        r = b["minr"].to_numpy(zero_copy_only=False).astype(np.float64)
        micros = np.floor(1e6 * np.log(2.0) / np.log(r + 2.0) + 0.5) \
            .astype(np.int64)
        return pa.table({"g": pa.array([int(micros.sum())], pa.int64())})

    total = minr.map_batches(dcg, batch_format="pyarrow") \
        .aggregate(Sum("g", alias_name="g"))["g"] or 0
    n_q = _distinct_query_count(gold_ds)
    nd = float(np.floor(total / n_q + 0.5) / 1e6) if n_q else float("nan")
    return n_q, nd


def spearman(x, y) -> float:
    """Spearman rank correlation — the reference's embedding-eval metric
    (simcse_unsup.py:204-228), computed driver-side on a small eval set."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    def ranks(a):
        order = np.argsort(a, kind="stable")
        r = np.empty(len(a), np.float64)
        r[order] = np.arange(1, len(a) + 1)
        # average ties
        s = pd.Series(a)
        return s.rank(method="average").to_numpy()
    rx, ry = ranks(x), ranks(y)
    rx -= rx.mean(); ry -= ry.mean()
    denom = np.sqrt((rx ** 2).sum() * (ry ** 2).sum())
    return float((rx * ry).sum() / denom) if denom else 0.0


def mrr_ds(candidates_ds, gold: dict[str, list[str]], n: int = 5) -> tuple:
    """Mean reciprocal rank from a candidates Dataset
    (query, candidate_name, rank): rr(q) = 1/(1 + rank of the first gold
    candidate) or 0 if absent from the top-n.  Reciprocals are micros ints
    (floor(1e6/(rank+1)+0.5) — exact-integer double division, so the SQL
    oracle matches bitwise); MRR = floor(Σrr/n_q + 0.5)/1e6.
    Returns (n_queries, mrr)."""
    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["rank"] < n]
        return df[["query", "candidate_name", "rank"]]

    per_q = candidates_ds.map_batches(per_batch,
                                      batch_format="pandas").to_pandas()
    best: dict[str, int] = {}
    for q, name, rank in zip(per_q["query"], per_q["candidate_name"],
                             per_q["rank"]):
        if q in gold and name in gold[q]:
            r = int(rank)
            if q not in best or r < best[q]:
                best[q] = r
    total = 0
    for q in gold:
        if q in best:
            total += int(np.floor(1e6 / (best[q] + 1) + 0.5))
    n_q = len(gold)
    mrr = float(np.floor(total / n_q + 0.5) / 1e6) if n_q else float("nan")
    return n_q, mrr
