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
    ever leave.  A verified pair is emitted ONLY from the group of its
    minimum shared variant hash (computable task-locally from the two
    names), so cross-bucket duplicates never exist and the bucket
    groupby is the ONLY all-to-all in the whole operator.
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
        # per-task caches only — name -> uint64 variant-hash array, and
        # (id_a, id_b) -> verified distance (a pair sharing two variants
        # can surface in two groups; don't re-verify it)
        vcache: dict[str, np.ndarray] = {}
        dcache: dict[tuple[int, int], int] = {}

        def vhashes(nm: str) -> np.ndarray:
            h = vcache.get(nm)
            if h is None:
                h = np.sort(stable_hash64_batch(_deletion_variants(nm)))
                vcache[nm] = h
            return h

        for vh, g in part.groupby("vh", sort=False):
            if len(g) < 2:
                continue
            cur = np.int64(vh)
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
                    d = dcache.get(key)
                    if d is None:
                        d = edit_distance_le1(names[x], names[y])
                        dcache[key] = d
                    if d > 1:
                        continue
                    # canonical-bucket emission: a qualifying pair is
                    # emitted ONLY from the group of its minimum shared
                    # variant hash (min in uint64 space, same space the
                    # bucketing hashed in) — every other group drops it,
                    # so no global dedup shuffle is needed afterwards
                    shared = np.intersect1d(vhashes(names[x]),
                                            vhashes(names[y]),
                                            assume_unique=False)
                    if shared.min().astype(np.int64) != cur:
                        continue
                    out_a.append(ia)
                    out_b.append(ib)
                    out_d.append(d)
        return pd.DataFrame({"id_a": np.asarray(out_a, np.int64),
                             "id_b": np.asarray(out_b, np.int64),
                             "dist": np.asarray(out_d, np.int64)})

    # ONE all-to-all total: the bucket groupby.  Cross-bucket duplicate
    # emission is impossible by the canonical-bucket rule above (the min
    # shared variant hash picks exactly one group globally), so the old
    # second groupby(["id_a","id_b"]).min(dist) pass is gone.
    return rows.groupby("bucket").map_groups(bucket_pairs,
                                             batch_format="pandas")


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


# ------------------------------------------------ Fellegi–Sunter scoring ---

FS_FEATURES = ("nation", "segment", "band")


def _fs_attrs(cust, id_col, nation_col, seg_col, bal_col):
    def prep(b: pa.Table) -> pa.Table:
        bal = b[bal_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "cid": b[id_col].cast(pa.int64()),
            "nation": b[nation_col].cast(pa.int64()),
            "segment": b[seg_col],
            "band": pa.array(np.floor(bal / 1000.0).astype(np.int64))})
    return cust.map_batches(prep, batch_format="pyarrow")


def _fs_flagged(cust, pairs, id_col, nation_col, seg_col, bal_col,
                num_partitions):
    """Candidate pairs with per-feature agreement flags — two hash joins
    of the pair table onto the attribute table (nothing customer-sized on
    the driver)."""
    from deepkg_ray.util import drop_empty_blocks
    attrs = _fs_attrs(cust, id_col, nation_col, seg_col, bal_col)
    a = pairs.select_columns(["id_a", "id_b"]).join(
        attrs.map_batches(
            lambda b: b.rename_columns(["id_a", "na", "sa", "ba"]),
            batch_format="pyarrow"),
        join_type="inner", num_partitions=num_partitions, on=("id_a",))
    ab = drop_empty_blocks(a).join(
        attrs.map_batches(
            lambda b: b.rename_columns(["id_b", "nb", "sb", "bb"]),
            batch_format="pyarrow"),
        join_type="inner", num_partitions=num_partitions, on=("id_b",))

    def flags(b: pa.Table) -> pa.Table:
        return pa.table({
            "id_a": b["id_a"], "id_b": b["id_b"],
            "agree_nation": pa.array(
                (b["na"].to_numpy(zero_copy_only=False)
                 == b["nb"].to_numpy(zero_copy_only=False))
                .astype(np.int64)),
            "agree_segment": pa.array(
                np.asarray([x == y for x, y in
                            zip(b["sa"].to_pylist(), b["sb"].to_pylist())],
                           dtype=np.int64)),
            "agree_band": pa.array(
                (b["ba"].to_numpy(zero_copy_only=False)
                 == b["bb"].to_numpy(zero_copy_only=False))
                .astype(np.int64)),
        })

    return drop_empty_blocks(ab).map_batches(flags, batch_format="pyarrow") \
        .materialize()


def _fs_weights(cust, flagged, nation_col, seg_col, bal_col, id_col):
    """Per-feature (m, u, w_agree_micros, w_disagree_micros):
    m from the declared match set (the candidate pairs) with +0.5/+1
    smoothing; u frequency-based from the attribute marginals
    (P(agree | random ordered pair) = Σ c(c−1) / N(N−1)), same smoothing.
    Float order fixed: ln((a+0.5)/(n+1) / ((s+0.5)/(d+1))) — the SQL twin
    nests identically."""
    import math

    from ray.data.aggregate import Count, Sum
    from deepkg_ray.stages.treeagg import merge_partials

    stats = flagged.aggregate(
        Count(alias_name="np"),
        Sum("agree_nation", alias_name="an"),
        Sum("agree_segment", alias_name="as_"),
        Sum("agree_band", alias_name="ab"))
    n_pairs = int(stats["np"])
    agree = {"nation": int(stats["an"]), "segment": int(stats["as_"]),
             "band": int(stats["ab"])}

    attrs = _fs_attrs(cust, id_col, nation_col, seg_col, bal_col)

    def marg(col):
        def partial(b: pa.Table) -> pd.DataFrame:
            d = pd.DataFrame({"k": b[col].to_pylist()})
            return (d.groupby("k", sort=False).size()
                    .reset_index(name="c"))
        m = merge_partials(attrs.map_batches(partial,
                                             batch_format="pyarrow"),
                           ["k"], {"c": "sum"}).to_pandas()
        c = m["c"].to_numpy(np.int64)
        return int((c * (c - 1)).sum()), int(c.sum())

    rows = []
    for feat in FS_FEATURES:
        s, n = marg(feat)
        d = n * (n - 1)
        m_f = (agree[feat] + 0.5) / (n_pairs + 1)
        u_f = (s + 0.5) / (d + 1)
        wa = math.floor(math.log(m_f / u_f) * 1e6 + 0.5)
        wd = math.floor(math.log((1.0 - m_f) / (1.0 - u_f)) * 1e6 + 0.5)
        rows.append((feat, m_f, u_f, int(wa), int(wd)))
    return pd.DataFrame(rows, columns=["feature", "m_prob", "u_prob",
                                       "w_agree_micros",
                                       "w_disagree_micros"])


def fs_weight_table(cust, *, id_col="c_custkey", name_col="c_name",
                    nation_col="c_nationkey", seg_col="c_mktsegment",
                    bal_col="c_acctbal", num_partitions: int | None = None):
    """Fellegi–Sunter (1969) agreement/disagreement weights for customer
    record linkage: the ed≤1 name pairs act as the declared match set for
    the m-probabilities; u-probabilities are frequency-based from the
    attribute marginals (the standard 'random pair agrees by chance'
    estimate).  Returns one row per feature (nation / mktsegment /
    acctbal-band) with smoothed m, u and ln-micros weights."""
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()
    pairs = editdist_pairs(cust.select_columns([id_col, name_col]),
                           id_col=id_col, name_col=name_col)
    flagged = _fs_flagged(cust, pairs, id_col, nation_col, seg_col,
                          bal_col, num_partitions)
    return _fs_weights(cust, flagged, nation_col, seg_col, bal_col, id_col)


def fs_match_scores(cust, *, id_col="c_custkey", name_col="c_name",
                    nation_col="c_nationkey", seg_col="c_mktsegment",
                    bal_col="c_acctbal", num_partitions: int | None = None):
    """Fellegi–Sunter match scores for every ed≤1 candidate pair:
    score_micros = Σ over features of (agree ? w_agree : w_disagree) —
    the classic record-linkage log-likelihood-ratio ranking, here with
    deterministic m/u estimation (see fs_weight_table).  One extra
    stateless pass over the flagged pair table.  Returns (id_a, id_b,
    agree_nation, agree_segment, agree_band, score_micros, score)."""
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()
    pairs = editdist_pairs(cust.select_columns([id_col, name_col]),
                           id_col=id_col, name_col=name_col)
    flagged = _fs_flagged(cust, pairs, id_col, nation_col, seg_col,
                          bal_col, num_partitions)
    w = _fs_weights(cust, flagged, nation_col, seg_col, bal_col, id_col)
    wa = dict(zip(w["feature"], w["w_agree_micros"].astype(np.int64)))
    wd = dict(zip(w["feature"], w["w_disagree_micros"].astype(np.int64)))

    def score(b: pa.Table) -> pa.Table:
        s = np.zeros(b.num_rows, dtype=np.int64)
        for feat in FS_FEATURES:
            f = b[f"agree_{feat}"].to_numpy(zero_copy_only=False)
            s += np.where(f == 1, wa[feat], wd[feat])
        return b.append_column(
            "score_micros", pa.array(s)).append_column(
            "score", pa.array(s / 1e6, pa.float64()))

    return flagged.map_batches(score, batch_format="pyarrow")


def er_canonical(cust, *, id_col="c_custkey", name_col="c_name",
                 nation_col="c_nationkey", seg_col="c_mktsegment",
                 num_partitions: int | None = None, mode: str = "auto"):
    """Entity-resolution survivorship: one canonical record per ed≤1 name
    cluster — per attribute the MODE across cluster members (ties → the
    lexicographically/numerically smallest value), the standard
    most-frequent-value survivorship rule of MDM pipelines.  Completes the
    blocking → pairing → clustering → FS-scoring linkage chain with the
    golden-record step.

    Plan: (node, component) clusters hash-joined onto the attribute rows,
    then one groupby(component).map_groups finisher — cluster groups are
    near-dup-sized (a handful of rows), so the per-group pandas kernel is
    bounded regardless of corpus size.  Returns (component, n_members,
    canonical_name, canonical_nation, canonical_segment)."""
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()
    from deepkg_ray.util import drop_empty_blocks

    clusters = editdist_clusters(cust.select_columns([id_col, name_col]),
                                 id_col=id_col, name_col=name_col,
                                 mode=mode)

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"node": b[id_col].cast(pa.int64()),
                         "name": b[name_col],
                         "nation": b[nation_col].cast(pa.int64()),
                         "segment": b[seg_col]})

    joined = drop_empty_blocks(clusters).join(
        cust.map_batches(prep, batch_format="pyarrow"),
        join_type="inner", num_partitions=num_partitions, on=("node",))

    def survive(g: pd.DataFrame) -> pd.DataFrame:
        def md(col):
            vc = (g.groupby(col, sort=False).size().reset_index(name="c")
                  .sort_values(["c", col], ascending=[False, True],
                               kind="stable"))
            return vc.iloc[0][col]
        return pd.DataFrame({
            "component": [g["component"].iloc[0]],
            "n_members": np.asarray([len(g)], np.int64),
            "canonical_name": [md("name")],
            "canonical_nation": np.asarray([md("nation")], np.int64),
            "canonical_segment": [md("segment")]})

    return drop_empty_blocks(joined).groupby("component").map_groups(
        survive, batch_format="pandas")
