"""Edit-distance (Levenshtein <= 1) similarity self-join with LOSSLESS
deletion-neighborhood blocking, plus edit-distance canonicalization
clusters.

The string-similarity half of the reference's normalization candidate
recall (Normalization/recall/run_recall.py builds fuzzy candidates for
entity canonicalization; the reference does it with an in-memory index on
one box).  Here the scalable form: FastSS-style deletion neighborhoods
(Bocek et al. 2007, "Fast Similarity Search in Large Dictionaries" —
public knowledge).  For max_d = 1 the blocking theorem is:

  ed(a, b) <= 1  =>  D(a) ∩ D(b) != ∅,   D(x) = {x} ∪ {x minus one char}

(substitution at i: both delete i; insertion/deletion: the shorter string
itself is a deletion variant of the longer).  So bucketing every record
under the 64-bit hash of each of its <= L+1 deletion variants and
pair-generating within buckets finds EVERY qualifying pair — blocking is
lossless, which is what lets a DuckDB all-pairs ``levenshtein() <= 1``
oracle check the engine output exactly (oracle.editdist_pairs_oracle).

Scale shape (the 100-TB posture):
  * ONE all-to-all: the (variant-hash, id, name) rows — (L+1) short rows
    per record, grouped by a coarse ``hash % n_buckets`` key exactly like
    simjoin.similarity_join (few big groups, not 10^9 tiny ones).
  * Bucket pair-gen groups by the exact variant hash inside the task;
    variant collisions are bounded (a variant is shared only by strings
    within ed 2 of each other), so no quadratic blowup on skew.
  * Verification is O(L) per candidate (two-pointer scan — ed <= 1 needs
    no DP), inside the same task; only verified (id_a, id_b, dist) rows
    ever leave, then one ids-only dedup groupby.
  * No driver-side state of any size.

Clusters: editdist_clusters feeds the verified pairs to
graph.connected_components (min-reachable-id component), the same
canonicalization primitive the dedup family uses — oracle via the
transitive-closure CTE (oracle.editdist_clusters_oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from deepkg_ray.functions.hashing import stable_hash64_batch


def _deletion_variants(name: str) -> list[str]:
    """The string itself plus every DISTINCT single-character deletion
    (deleting any of a run of equal chars yields one variant — dedup here
    keeps repeated-char names from quadratic pair-gen re-tries)."""
    return list(dict.fromkeys(
        [name] + [name[:i] + name[i + 1:] for i in range(len(name))]))


def edit_distance_le1(a: str, b: str) -> int:
    """Exact Levenshtein distance when it is <= 1, else 2 ("more than 1").
    O(L) two-pointer scan — no DP matrix."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == lb:                      # substitution only
        mism = sum(1 for x, y in zip(a, b) if x != y)
        return 1 if mism == 1 else 2
    if abs(la - lb) != 1:
        return 2
    if la > lb:                       # a = b plus one inserted char
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1:] else 2


def editdist_pairs(ds, *, id_col: str = "id", name_col: str = "name",
                   n_buckets: int = 64):
    """All (id_a, id_b, dist) pairs with Levenshtein(name_a, name_b) <= 1
    and id_a < id_b over ONE Dataset of (id, name) records.  dist is int64
    (0 for exact duplicates under distinct ids, else 1)."""

    def explode(b: pa.Table) -> pa.Table:
        ids, names, variants = [], [], []
        for i, nm in zip(b[id_col].to_pylist(), b[name_col].to_pylist()):
            vs = _deletion_variants(nm)
            ids.extend([i] * len(vs))
            names.extend([nm] * len(vs))
            variants.extend(vs)
        vh = stable_hash64_batch(variants)
        return pa.table({
            "rid": pa.array(ids, pa.int64()),
            "name": pa.array(names, pa.string()),
            "vh": pa.array(vh.astype(np.int64)),
            "bucket": pa.array((vh % np.uint64(n_buckets)).astype(np.int32)),
        })

    rows = ds.select_columns([id_col, name_col]).map_batches(
        explode, batch_format="pyarrow")

    def bucket_pairs(part: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_d = [], [], []
        seen: set[tuple[int, int]] = set()   # per-task dedup only
        for _, g in part.groupby("vh", sort=False):
            if len(g) < 2:
                continue
            rids = g["rid"].to_numpy(np.int64)
            names = g["name"].tolist()
            for x in range(len(rids)):
                for y in range(x + 1, len(rids)):
                    ia, ib = rids[x], rids[y]
                    if ia == ib:
                        continue
                    if ia > ib:
                        ia, ib = ib, ia
                    key = (int(ia), int(ib))
                    if key in seen:
                        continue
                    seen.add(key)
                    d = edit_distance_le1(names[x], names[y])
                    if d <= 1:
                        out_a.append(ia)
                        out_b.append(ib)
                        out_d.append(d)
        return pd.DataFrame({"id_a": np.asarray(out_a, np.int64),
                             "id_b": np.asarray(out_b, np.int64),
                             "dist": np.asarray(out_d, np.int64)})

    raw = rows.groupby("bucket").map_groups(bucket_pairs,
                                            batch_format="pandas")
    # a pair can surface in two different buckets (two shared variants with
    # different hashes) — one global ids-only dedup groupby; dist is a
    # function of the pair so min() == the value
    from ray.data.aggregate import Min
    return (raw.groupby(["id_a", "id_b"])
            .aggregate(Min("dist", alias_name="dist")))


def editdist_clusters(ds, *, id_col: str = "id", name_col: str = "name",
                      n_buckets: int = 64, mode: str = "auto"):
    """(node, component) canonicalization clusters over the ed<=1 pair
    graph; component = min reachable id.  Nodes with no qualifying pair
    are absent (singletons are their own canonical form — same contract as
    dedup clusters and the SQL transitive-closure oracle)."""
    pairs = editdist_pairs(ds, id_col=id_col, name_col=name_col,
                           n_buckets=n_buckets)
    from deepkg_ray.stages.graph import connected_components
    return connected_components(pairs, a_col="id_a", b_col="id_b",
                                mode=mode)
