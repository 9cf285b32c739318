"""Set-similarity join: exact word-token Jaccard R×S join with AllPairs
prefix filtering.

The scalable form of the reference's pairwise duplicate detection
(Normalization recall candidates / the dedup family): find every
(left, right) pair whose DISTINCT-token Jaccard ≥ t WITHOUT the all-pairs
product.  Prefix-filter theorem (Bayardo et al., WWW'07 "Scaling Up All
Pairs Similarity Search" — public knowledge): under ANY global token
order, the smallest shared token of a qualifying pair lies within the
first ``|X| - ceil(t·|X|) + 1`` tokens of BOTH sides' sorted sets, so
bucketing only those prefix tokens through ONE groupby shuffle finds every
candidate.  Ordering tokens by ascending document frequency makes the hot
buckets (stopwords) land at the END of sorted sets — outside prefixes —
which is what bounds bucket sizes at corpus scale.

Pipeline shape (all streaming, one all-to-all for the bucket groupby, two
hash joins for the verify):

  tokenize → [df pass: groupby token → broadcast rank map, or 'lex' order
  with no global state at all] → emit prefix rows (token, side, id, n_tok)
  → groupby(token-bucket) pair-gen with the |min|≥t·|max| length filter
  → dedup pairs → attach texts via hash joins (never a full-corpus dict)
  → exact-Jaccard verify (integer intersection/union → one float64 divide
  → round6; identical expression in oracle.similarity_join_oracle).
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from deepkg_ray.functions.numeric import round6

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _token_set(text: str) -> list[str]:
    return sorted(set(_TOKEN_RE.findall(text.lower())))


def _distinct_tokens_ds(ds, id_col: str, text_col: str, side: str):
    """(id, side, token) rows, one per DISTINCT token per record."""
    def explode(b: pa.Table) -> pa.Table:
        ids, toks = [], []
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            ts = _token_set(t)
            ids.extend([i] * len(ts))
            toks.extend(ts)
        return pa.table({"rid": pa.array(ids, pa.int64()),
                         "side": pa.array([side] * len(ids), pa.string()),
                         "token": pa.array(toks, pa.string())})
    return ds.map_batches(explode, batch_format="pyarrow")


def _prefix_len(n: int, threshold: float) -> int:
    return n - math.ceil(threshold * n) + 1


def similarity_join(left, right, *, threshold: float = 0.5,
                    id_col: str = "doc_id", text_col: str = "text",
                    order: str = "df", num_partitions: int | None = None,
                    n_buckets: int = 64):
    """Exact Jaccard similarity join of two Datasets on word-token sets.
    Returns (doc_a, doc_b, jaccard) with doc_a from ``left``, doc_b from
    ``right``, jaccard = |A∩B| / |A∪B| ≥ threshold (round6 output, exact
    pre-round comparison — the SQL oracle's expression verbatim).

    order='df': one groupby-Count over the distinct-token rows of both
    sides builds the document-frequency order, broadcast as a rank map via
    ray.put — right while the token VOCABULARY is driver-sized (it is for
    word tokens: vocabulary grows ~log corpus).  order='lex': plain
    lexicographic order — no df pass, no driver-side state of any size,
    same correctness (the prefix theorem holds for any total order), larger
    buckets; the escape hatch if the vocabulary itself is huge."""
    import ray

    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()
    thr = float(threshold)

    rank_ref = None
    if order == "df":
        toks = _distinct_tokens_ds(left, id_col, text_col, "l").union(
            _distinct_tokens_ds(right, id_col, text_col, "r"))
        from ray.data.aggregate import Count
        df_tbl = (toks.groupby("token").aggregate(Count(alias_name="df"))
                  .to_pandas())
        df_tbl = df_tbl.sort_values(["df", "token"], kind="stable")
        rank_ref = ray.put(dict(zip(df_tbl["token"],
                                    range(len(df_tbl)))))
    elif order != "lex":
        raise ValueError(order)

    def emit_prefix(side: str):
        def fn(b: pa.Table) -> pa.Table:
            rank = ray.get(rank_ref) if rank_ref is not None else None
            ids, toks, ns = [], [], []
            for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
                ts = _token_set(t)
                if not ts:
                    continue
                if rank is not None:
                    ts.sort(key=lambda x: rank[x])
                p = _prefix_len(len(ts), thr)
                ids.extend([i] * p)
                toks.extend(ts[:p])
                ns.extend([len(ts)] * p)
            h = pd.util.hash_array(np.asarray(toks, dtype=object))
            return pa.table({
                "rid": pa.array(ids, pa.int64()),
                "side": pa.array([side] * len(ids), pa.string()),
                "token": pa.array(toks, pa.string()),
                "n_tok": pa.array(ns, pa.int32()),
                # coarse co-location key: one groupby over ~n_buckets
                # groups instead of per-token groups (same bytes shuffled,
                # none of the tiny-group scheduling overhead)
                "bucket": pa.array((h % n_buckets).astype(np.int32)),
            })
        return fn

    prefix = left.map_batches(emit_prefix("l"), batch_format="pyarrow").union(
        right.map_batches(emit_prefix("r"), batch_format="pyarrow"))

    def bucket_pairs(part: pd.DataFrame) -> pd.DataFrame:
        ra, rb = [], []
        for _, g in part.groupby("token", sort=False):
            l = g[g["side"] == "l"]
            r = g[g["side"] == "r"]
            if len(l) == 0 or len(r) == 0:
                continue
            la = l["rid"].to_numpy(np.int64)
            na = l["n_tok"].to_numpy(np.int64)
            rb_ids = r["rid"].to_numpy(np.int64)
            nb = r["n_tok"].to_numpy(np.int64)
            ai, bi = np.meshgrid(np.arange(len(la)), np.arange(len(rb_ids)),
                                 indexing="ij")
            ai, bi = ai.ravel(), bi.ravel()
            # length filter: J ≥ t ⇒ min(|A|,|B|) ≥ t·max(|A|,|B|)
            mn = np.minimum(na[ai], nb[bi])
            mx = np.maximum(na[ai], nb[bi])
            keep = mn >= thr * mx
            ra.extend(la[ai[keep]].tolist())
            rb.extend(rb_ids[bi[keep]].tolist())
        return pd.DataFrame({"doc_a": np.asarray(ra, np.int64),
                             "doc_b": np.asarray(rb, np.int64)})

    raw = prefix.groupby("bucket").map_groups(bucket_pairs,
                                              batch_format="pandas")
    from deepkg_ray.stages.dedup import dedup_pair_rows
    cand = (dedup_pair_rows(raw, a_col="doc_a", b_col="doc_b",
                            count_col="_hits").drop_columns(["_hits"])
            .materialize())
    if cand.count() == 0:       # disjoint vocabularies — no candidates
        import ray.data as rd
        return rd.from_pandas(pd.DataFrame({
            "doc_a": pd.Series([], dtype=np.int64),
            "doc_b": pd.Series([], dtype=np.int64),
            "jaccard": pd.Series([], dtype=np.float64)}))
    from deepkg_ray.util import drop_empty_blocks
    cand = drop_empty_blocks(cand)
    # attach each side's text from ITS OWN table (R×S, not self-join):
    # two hash-partitioned joins, never a full-corpus dict
    ta, tb = f"{text_col}_a", f"{text_col}_b"

    def _renamer(names):
        return lambda b: b.rename_columns(names)
    side_a = left.select_columns([id_col, text_col]).map_batches(
        _renamer(["doc_a", ta]), batch_format="pyarrow")
    side_b = right.select_columns([id_col, text_col]).map_batches(
        _renamer(["doc_b", tb]), batch_format="pyarrow")
    withtext = (cand.join(side_a, join_type="inner",
                          num_partitions=num_partitions, on=("doc_a",))
                .join(side_b, join_type="inner",
                      num_partitions=num_partitions, on=("doc_b",)))

    def verify(b: pa.Table) -> pa.Table:
        ja = []
        for x, y in zip(b[ta].to_pylist(), b[tb].to_pylist()):
            sa, sb = set(_token_set(x)), set(_token_set(y))
            inter = len(sa & sb)
            union = len(sa | sb)
            ja.append(inter / union if union else 1.0)
        ja = np.asarray(ja, np.float64)
        keep = ja >= thr
        out = pa.table({"doc_a": b["doc_a"], "doc_b": b["doc_b"],
                        "jaccard": pa.array(round6(ja), pa.float64())})
        return out.filter(pa.array(keep))

    return withtext.map_batches(verify, batch_format="pyarrow")
