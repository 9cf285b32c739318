"""Deduplication family over a document table — exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

These are the large-scale training-data-pipeline operators the engine adds
beyond the reference (whose only dedups are per-record key dedup,
sel2record.py:463-466, and cross-instance union, process_data.py:506-556 —
the exact tier here generalizes the latter).

Scale notes
-----------
- Exact dedup: content-hash column added vectorized in `map_batches`, then
  a groupby on the hash — the shuffle moves one small hash row per doc, not
  the document body, when `project=True`.
- MinHash-LSH: signature per doc (actor pool) → explode to
  (band_idx, band_hash, doc_id) rows → groupby band bucket → candidate
  pairs → exact-Jaccard verification — candidate generation never compares
  all pairs (SURVEY.md guidance / ray_guide near-dup pattern).
- Embedding near-dup: LSH over random hyperplanes (or a blocking column)
  to bucket, then in-bucket cosine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Min

from deepkg_ray.functions.hashing import (MinHasher, SimHasher, band_hashes,
                                          content_md5_batch, hamming64_array,
                                          word_shingles)
from deepkg_ray.functions.numeric import cosine_micros, micros_matrix, round6


# ---------------------------------------------------------------- exact ----

def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    return batch.append_column(
        "content_hash", pa.array(content_md5_batch(batch[text_col].to_pylist())))


def dedup_exact(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the min-id representative per distinct text.  Returns
    (doc_id, content_hash, n_dups).  The group step routes by observed
    cardinality (treeagg mode='auto'): pandas merge tree while the
    distinct-hash set fits one task, Ray groupby beyond — sort-aggregates
    keyed on md5 hex strings are ~4× slower at tree-friendly sizes."""
    from deepkg_ray.stages.treeagg import merge_partials
    hashed = ds.map_batches(lambda b: add_content_hash(b, text_col),
                            batch_format="pyarrow")
    proj = hashed.map_batches(
        lambda b: pa.table({
            "content_hash": b["content_hash"],
            id_col: b[id_col],
            "n_dups": pa.array(np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow")
    return merge_partials(proj, ["content_hash"],
                          {id_col: "min", "n_dups": "sum"}, mode="auto")


def exact_dup_stats(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(n_groups, n_docs, n_dup_docs) summary of exact duplication."""
    groups = dedup_exact(ds, id_col, text_col)

    def summarize(batch: pa.Table) -> pa.Table:
        n = pc.sum(batch["n_dups"]).as_py() or 0
        return pa.table({
            "g": pa.array([1], pa.int32()),
            "n_groups": pa.array([batch.num_rows], pa.int64()),
            "n_docs": pa.array([n], pa.int64()),
            "n_dup_docs": pa.array([n - batch.num_rows], pa.int64()),
        })
    partial = groups.map_batches(summarize, batch_format="pyarrow")
    from ray.data.aggregate import Sum
    return (partial.groupby("g")
            .aggregate(Sum("n_groups", alias_name="n_groups"),
                       Sum("n_docs", alias_name="n_docs"),
                       Sum("n_dup_docs", alias_name="n_dup_docs"))
            .drop_columns(["g"]))


# ---------------------------------------------------------- minhash-LSH ----

class MinHashSignature:
    """Actor stage: add the per-doc band-hash column (and optionally the raw
    minhash signature).  By default only the n_bands u64 band hashes leave
    this stage — the 64-perm signature never enters the shuffle (round-1
    shipped sig×n_bands through the exchange: 16× the bytes for nothing)."""

    def __init__(self, n_perm: int = 64, n_bands: int = 16, shingle_k: int = 3,
                 text_col: str = "text", keep_signature: bool = False,
                 hash_mode: str = "fast"):
        self.mh = MinHasher(n_perm=n_perm, shingle_k=shingle_k,
                            hash_mode=hash_mode)
        self.n_bands = n_bands
        self.text_col = text_col
        self.keep_signature = keep_signature
        self.hash_mode = hash_mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        from deepkg_ray.functions.hashing import (band_hashes_matrix,
                                                  band_keys_parity)
        sigs = self.mh.signatures(batch[self.text_col].to_pylist())
        band_fn = (band_keys_parity if self.hash_mode == "parity"
                   else band_hashes_matrix)
        bm = band_fn(sigs, self.n_bands)                     # (n, n_bands)
        bands = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (len(bm) + 1) * self.n_bands, self.n_bands),
                     pa.int32()),
            pa.array(bm.reshape(-1), pa.uint64()))
        out = batch.append_column("bands", bands)
        if self.keep_signature:
            out = out.append_column(
                "minhash", pa.array([s.tolist() for s in sigs],
                                    pa.list_(pa.uint64())))
        return out


def _explode_bands(batch: pa.Table, id_col: str,
                   n_partitions: int = 64) -> pa.Table:
    """(doc_id, band_idx, band_hash, bucket) rows — ~28 bytes each; this is
    ALL that moves through the LSH shuffle."""
    bands = batch["bands"]
    if isinstance(bands, pa.ChunkedArray):
        bands = bands.combine_chunks()
    lens = pc.list_value_length(bands).to_numpy(zero_copy_only=False)
    ids = np.repeat(batch[id_col].to_numpy(zero_copy_only=False),
                    lens.astype(np.int64))
    flat = bands.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    total = len(flat)
    # band_idx restarts at 0 per doc (bands are fixed-length per doc)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    band_idx = (np.arange(total, dtype=np.int64)
                - np.repeat(starts, lens.astype(np.int64))).astype(np.int32)
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "band_idx": pa.array(band_idx, pa.int32()),
        "band_hash": pa.array(flat, pa.uint64()),
        # coarse co-location key: shuffling into ~n_partitions groups costs
        # the same as per-bucket groups but avoids the per-group scheduling
        # overhead of millions of tiny LSH buckets
        "bucket": pa.array((flat % np.uint64(n_partitions)).astype(np.int32)),
    })


def dedup_pair_rows(pairs, *, a_col: str = "doc_a", b_col: str = "doc_b",
                    count_col: str = "n_hits", n_partitions: int = 64,
                    value_col: str | None = None, value_agg: str = "min"):
    """Canonicalize duplicate (a, b) candidate rows to one row per pair —
    a collision count by default, or value_agg over value_col.  Coarse-
    bucket the pair key, then a vectorized pandas dedup per bucket.  Ray's
    groupby().aggregate(Count) over pandas-block pair rows is ~400× slower
    on this shape (163 s vs 0.4 s at 390k rows), so the aggregate is done
    inside map_groups instead."""
    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pb"] = ((df[a_col] * 1_000_003 + df[b_col])
                     % n_partitions).astype(np.int32)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if value_col is not None:
            g = (df.groupby([a_col, b_col], sort=False)[value_col]
                 .agg(value_agg).reset_index())
            return g[[a_col, b_col, value_col]]
        g = (df.groupby([a_col, b_col], sort=False).size()
             .reset_index(name=count_col))
        return g[[a_col, b_col, count_col]]

    return (pairs.map_batches(add_bucket, batch_format="pandas")
            .groupby("_pb").map_groups(per_bucket, batch_format="pandas"))


def minhash_raw_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                      n_perm: int = 64, n_bands: int = 16,
                      shingle_k: int = 3, concurrency=None,
                      hash_mode: str = "fast"):
    """documents → RAW in-bucket candidate rows (doc_a < doc_b), one row per
    band collision — a pair colliding in several bands appears once per
    band.  One all-to-all (the band-bucket groupby); callers canonicalize
    (dedup_pair_rows distributed, or driver-side pandas when the candidate
    set is observed small)."""
    from deepkg_ray.util import rows_all, spread_small, stateful_map
    sigged = stateful_map(
        spread_small(ds.select_columns([id_col, text_col])), MinHashSignature,
        {"n_perm": n_perm, "n_bands": n_bands,
         "shingle_k": shingle_k, "text_col": text_col,
         "hash_mode": hash_mode},
        concurrency=concurrency, batch_size=None)
    exploded = sigged.map_batches(lambda b: _explode_bands(b, id_col),
                                  batch_format="pyarrow")

    def partition_pairs(part: pd.DataFrame) -> pd.DataFrame:
        """All LSH-bucket pairs within one coarse hash partition: an inner
        pandas groupby over the real (band_idx, band_hash) buckets."""
        ra, rb = [], []
        for _, g in part.groupby(["band_idx", "band_hash"], sort=False):
            if len(g) < 2:
                continue
            ids = np.sort(g[id_col].to_numpy())
            a_idx, b_idx = np.triu_indices(len(ids), k=1)
            ra.extend(ids[a_idx].tolist())
            rb.extend(ids[b_idx].tolist())
        return pd.DataFrame({"doc_a": np.asarray(ra, np.int64),
                             "doc_b": np.asarray(rb, np.int64)})

    return (exploded.groupby("bucket")
            .map_groups(partition_pairs, batch_format="pandas"))


def minhash_candidate_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                            n_perm: int = 64, n_bands: int = 16,
                            shingle_k: int = 3, concurrency=None,
                            hash_mode: str = "fast"):
    """documents → candidate near-dup pairs (doc_a < doc_b, n_bands_hit).
    Pairs are generated per LSH bucket — never all-pairs; a pair surfacing
    from several bands is canonicalized to one row by the final groupby
    (whose Count doubles as the band-collision strength signal)."""
    pairs = minhash_raw_pairs(ds, id_col, text_col, n_perm, n_bands,
                              shingle_k, concurrency, hash_mode)
    return dedup_pair_rows(pairs, a_col="doc_a", b_col="doc_b",
                           count_col="n_bands_hit")


def exact_jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = set(word_shingles(a, k)), set(word_shingles(b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def attach_pair_columns(pairs, docs, *, id_col: str, cols: list[str],
                        a_key: str = "doc_a", b_key: str = "doc_b",
                        num_partitions: int | None = None):
    """Join candidate pairs back to the source table on each side with Ray
    Data's hash-partitioned Dataset.join — the 100-TB-safe replacement for
    round-1's per-actor full-corpus dict (every verifier actor read the
    whole docs parquet; fatal beyond toy scale).  Adds {col}_a / {col}_b."""
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()

    def _renamer(names):   # Dataset.rename_columns chokes on pandas blocks
        return lambda b: b.rename_columns(names)
    side_a = docs.select_columns([id_col] + cols).map_batches(
        _renamer([a_key] + [f"{c}_a" for c in cols]), batch_format="pyarrow")
    side_b = docs.select_columns([id_col] + cols).map_batches(
        _renamer([b_key] + [f"{c}_b" for c in cols]), batch_format="pyarrow")
    from deepkg_ray.util import drop_empty_blocks
    out = pairs.join(side_a, join_type="inner",
                     num_partitions=num_partitions, on=(a_key,))
    # the first join emits zero-column blocks for empty hash partitions;
    # strip them or the second join fails pyarrow field resolution when a
    # partition receives only such shards (sparse pair sets)
    return drop_empty_blocks(out).join(side_b, join_type="inner",
                                       num_partitions=num_partitions,
                                       on=(b_key,))


def attach_pair_texts(pairs, docs, *, id_col: str = "doc_id",
                      text_col: str = "text", num_partitions: int | None = None):
    return attach_pair_columns(pairs, docs, id_col=id_col, cols=[text_col],
                               num_partitions=num_partitions)


def minhash_dedup_pairs(ds, docs_path: str | None = None, *,
                        threshold: float = 0.8, id_col="doc_id",
                        text_col="text", n_perm=64, n_bands=16, shingle_k=3,
                        concurrency=None, num_partitions: int | None = None,
                        broadcast_limit: int = 50_000,
                        hash_mode: str = "fast"):
    """Full near-dup pipeline: LSH candidates → attach texts → exact-Jaccard
    verify → pairs ≥ threshold.  Returns (doc_a, doc_b, jaccard).

    Text attachment is ADAPTIVE on the observed candidate count: few pairs
    (≤ broadcast_limit) gather only the REFERENCED texts distributed-side
    and broadcast that bounded dict via ray.put (two Dataset.joins cost
    ~17 s of aggregator-actor boot for a 256-pair verify); many pairs use
    the hash-partitioned joins (the 100-TB path — never a full-corpus dict,
    the broadcast dict is bounded by 2×broadcast_limit texts).  The small
    path also canonicalizes the raw band-collision rows driver-side (one
    pandas groupby over ≤ broadcast_limit rows) instead of paying the
    distributed dedup_pair_rows barrier; the join path keeps it."""
    raw = minhash_raw_pairs(ds, id_col, text_col, n_perm, n_bands,
                            shingle_k, concurrency, hash_mode).materialize()
    if raw.count() == 0:        # zero LSH collisions — no candidates at all
        import ray.data as rd
        return rd.from_pandas(pd.DataFrame({
            "doc_a": pd.Series([], dtype=np.int64),
            "doc_b": pd.Series([], dtype=np.int64),
            "jaccard": pd.Series([], dtype=np.float64)}))
    if docs_path is not None:
        import ray.data as rd
        docs = rd.read_parquet(docs_path, columns=[id_col, text_col])
    else:
        docs = ds
    thr, k = threshold, shingle_k

    if raw.count() <= broadcast_limit:
        import ray
        import ray.data as rd
        raw_df = raw.to_pandas()
        pairs_df = (raw_df.groupby(["doc_a", "doc_b"], sort=False).size()
                    .reset_index(name="n_bands_hit"))
        cand = rd.from_pandas(pairs_df)
        need = set(pairs_df["doc_a"]) | set(pairs_df["doc_b"])
        need_ref = ray.put(need)

        def gather(b: pa.Table) -> pa.Table:
            nd = ray.get(need_ref)
            ids = b[id_col].to_pylist()
            keep = [i for i, x in enumerate(ids) if x in nd]
            return b.select([id_col, text_col]).take(pa.array(keep, pa.int64()))

        hits = (docs.select_columns([id_col, text_col])
                .map_batches(gather, batch_format="pyarrow"))
        from deepkg_ray.util import rows_all
        hits = rows_all(hits)
        text_ref = ray.put({r[id_col]: r[text_col] for r in hits})

        def verify_bc(b: pa.Table) -> pa.Table:
            td = ray.get(text_ref)
            ja = round6([exact_jaccard(td[a], td[bb], k) for a, bb in
                         zip(b["doc_a"].to_pylist(), b["doc_b"].to_pylist())])
            out = pa.table({"doc_a": b["doc_a"], "doc_b": b["doc_b"],
                            "jaccard": pa.array(ja, pa.float64())})
            return out.filter(pc.greater_equal(out["jaccard"], thr))

        return cand.map_batches(verify_bc, batch_format="pyarrow")

    cand = dedup_pair_rows(raw, a_col="doc_a", b_col="doc_b",
                           count_col="n_bands_hit")
    withtext = attach_pair_texts(cand, docs, id_col=id_col, text_col=text_col,
                                 num_partitions=num_partitions)
    ta, tb = f"{text_col}_a", f"{text_col}_b"

    def verify(b: pa.Table) -> pa.Table:
        ja = round6([exact_jaccard(a, bb, k) for a, bb in
                     zip(b[ta].to_pylist(), b[tb].to_pylist())])
        out = pa.table({"doc_a": b["doc_a"], "doc_b": b["doc_b"],
                        "jaccard": pa.array(ja, pa.float64())})
        return out.filter(pc.greater_equal(out["jaccard"], thr))

    return withtext.map_batches(verify, batch_format="pyarrow")


# -------------------------------------------------------------- simhash ----

class SimHashStage:
    def __init__(self, text_col: str = "text", hash_mode: str = "fast"):
        self.sh = SimHasher(hash_mode=hash_mode)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = self.sh.fingerprints(batch[self.text_col].to_pylist())
        return batch.append_column("simhash", pa.array(fps, pa.uint64()))


def simhash_dataset(ds, id_col="doc_id", text_col="text", concurrency=None,
                    hash_mode: str = "fast"):
    from deepkg_ray.util import spread_small, stateful_map
    return stateful_map(spread_small(ds.select_columns([id_col, text_col])),
                        SimHashStage,
                        {"text_col": text_col, "hash_mode": hash_mode},
                        concurrency=concurrency, batch_size=None)


def simhash_near_pairs(ds, id_col="doc_id", text_col="text",
                       max_hamming: int = 3, n_tables: int = 4, concurrency=None,
                       hash_mode: str = "fast"):
    """Near-dup pairs by SimHash: block on 16-bit key chunks (any pair with
    hamming ≤ 3 over 64 bits shares at least one of 4 16-bit chunks — the
    blocking is COMPLETE for max_hamming ≤ n_tables - 1 by pigeonhole), then
    verify hamming in-bucket.  With hash_mode="parity" the result set is
    exactly {pairs : hamming(fp_a, fp_b) ≤ max_hamming} under md5 word
    hashes, which oracle.dedup_simhash_oracle reproduces all-pairs in SQL —
    the driver check therefore proves the blocking loses no pair."""
    assert max_hamming <= n_tables - 1, "blocking incomplete for this radius"
    sh = simhash_dataset(ds, id_col, text_col, concurrency, hash_mode)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        fps = batch["simhash"].to_pylist()
        o_id, o_t, o_k, o_fp, o_b = [], [], [], [], []
        for i, fp in zip(ids, fps):
            for t in range(n_tables):
                key = (fp >> (t * 16)) & 0xFFFF
                o_id.append(i)
                o_t.append(t)
                o_k.append(key)
                o_fp.append(fp)
                o_b.append(key % 64)
        return pa.table({id_col: pa.array(o_id, pa.int64()),
                         "tbl": pa.array(o_t, pa.int32()),
                         "key": pa.array(o_k, pa.int32()),
                         "simhash": pa.array(o_fp, pa.uint64()),
                         "bucket": pa.array(o_b, pa.int32())})

    def partition_pairs(part: pd.DataFrame) -> pd.DataFrame:
        ra, rb, hd = [], [], []
        for _, g in part.groupby(["tbl", "key"], sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values(id_col, kind="stable")
            ids = g[id_col].to_numpy()
            fps = g["simhash"].to_numpy().astype(np.uint64)
            a_idx, b_idx = np.triu_indices(len(ids), k=1)
            h = hamming64_array(fps[a_idx] ^ fps[b_idx])
            keep = h <= max_hamming
            ra.extend(ids[a_idx[keep]].tolist())
            rb.extend(ids[b_idx[keep]].tolist())
            hd.extend(h[keep].tolist())
        return pd.DataFrame({"doc_a": np.asarray(ra, np.int64),
                             "doc_b": np.asarray(rb, np.int64),
                             "hamming": np.asarray(hd, np.int64)})

    pairs = (sh.map_batches(explode, batch_format="pyarrow")
             .groupby("bucket").map_groups(partition_pairs,
                                           batch_format="pandas"))
    return dedup_pair_rows(pairs, a_col="doc_a", b_col="doc_b",
                           value_col="hamming", value_agg="min")


# ---------------------------------------------------- embedding near-dup ----

def embedding_near_pairs(ds, *, threshold: float = 0.95, block_col: str | None = "label",
                         id_col: str = "vec_id", vec_col: str = "embedding"):
    """Pairs of vectors with cosine ≥ threshold.  Blocking: group by
    `block_col` (a cluster/label/LSH-bucket column) so each group does a
    dense in-group matmul instead of an all-pairs sweep; pass
    block_col=None only for small inputs."""
    cols = [id_col, vec_col] + ([block_col] if block_col else [])
    proj = ds.select_columns(cols)

    def _empty():
        return pd.DataFrame({"vec_a": pd.Series([], dtype=np.int64),
                             "vec_b": pd.Series([], dtype=np.int64),
                             "cosine": pd.Series([], dtype=np.float64)})

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _empty()
        g = g.sort_values(id_col, kind="stable")
        ids = g[id_col].to_numpy()
        # micros cosine (numeric.cosine_micros) and threshold on the ROUNDED
        # value so engine and SQL oracle agree bitwise at the cut boundary
        mm = micros_matrix(np.stack(g[vec_col].to_numpy()))
        sims = cosine_micros(mm, mm)
        ai, bi = np.triu_indices(len(ids), k=1)
        mask = sims[ai, bi] >= threshold
        if not mask.any():
            return _empty()
        return pd.DataFrame({"vec_a": ids[ai[mask]].astype(np.int64),
                             "vec_b": ids[bi[mask]].astype(np.int64),
                             "cosine": sims[ai, bi][mask]})

    if block_col:
        return proj.groupby(block_col).map_groups(group_pairs, batch_format="pandas")
    # single logical group: coalesce then one dense pass
    return proj.repartition(1).map_batches(
        lambda df: group_pairs(df), batch_format="pandas", batch_size=None)


class HyperplaneSigner:
    """Stateless map_batches kernel: per table t of `n_tables`, the `n_bits`
    sign bits of R_t·v packed into a small int key.  Planes are derived from
    the seed in __init__ (once per actor/worker), never shipped per batch.
    This is the unlabeled-corpus bucketing the round-1 embedding near-dup
    lacked (it required a pre-existing `label` column; reference recall
    analog: SimCSE-Chinese-Pytorch/simcse_unsup.py:44-76 faiss recall)."""

    def __init__(self, dim: int, n_bits: int = 4, n_tables: int = 48,
                 seed: int = 7, id_col: str = "vec_id",
                 vec_col: str = "embedding", n_partitions: int = 64):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, n_bits, dim))
        self.pow2 = (1 << np.arange(n_bits)).astype(np.int64)
        self.id_col, self.vec_col = id_col, vec_col
        self.n_partitions = n_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=np.int64)
        m = np.stack(batch[self.vec_col].to_pandas().to_numpy()).astype(np.float64)
        # keys[t, n] = packed sign bits of table t's hyperplanes
        keys = ((np.einsum("tbd,nd->tnb", self.planes, m) >= 0)
                @ self.pow2).astype(np.int64)
        T, n = keys.shape
        out_id = np.tile(ids, T)
        out_t = np.repeat(np.arange(T, dtype=np.int32), n)
        out_k = keys.reshape(-1)
        bucket = ((out_t.astype(np.int64) * 1_000_003 + out_k)
                  % self.n_partitions).astype(np.int32)
        return pa.table({self.id_col: pa.array(out_id, pa.int64()),
                         "tbl": pa.array(out_t, pa.int32()),
                         "key": pa.array(out_k, pa.int64()),
                         "bucket": pa.array(bucket, pa.int32())})


def embedding_lsh_near_pairs(ds, *, threshold: float = 0.45, dim: int,
                             n_bits: int = 4, n_tables: int = 48,
                             seed: int = 7, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             num_partitions: int | None = None):
    """Unlabeled embedding near-dup: random-hyperplane LSH bucketing →
    in-bucket candidate pairs (ids only through the shuffle) → join vectors
    back per side → exact micros-cosine ≥ threshold.

    Recall: P(pair at angle θ shares one table's bucket) = (1−θ/π)^n_bits,
    OR-ed over n_tables.  At near-dup thresholds (≥0.8) a handful of tables
    suffices; the defaults (4 bits × 48 tables) are sized for the test
    corpus' 0.45 cut and verified recall-1 against brute force in tests."""
    proj = ds.select_columns([id_col, vec_col])
    from deepkg_ray.util import spread_small, stateful_map
    signed = stateful_map(spread_small(proj), HyperplaneSigner,
                          {"dim": dim, "n_bits": n_bits,
                           "n_tables": n_tables, "seed": seed,
                           "id_col": id_col, "vec_col": vec_col},
                          concurrency=None, batch_size=None)

    def partition_pairs(part: pd.DataFrame) -> pd.DataFrame:
        ra, rb = [], []
        for _, g in part.groupby(["tbl", "key"], sort=False):
            if len(g) < 2:
                continue
            ids = np.sort(g[id_col].to_numpy())
            a_idx, b_idx = np.triu_indices(len(ids), k=1)
            ra.extend(ids[a_idx].tolist())
            rb.extend(ids[b_idx].tolist())
        return pd.DataFrame({"vec_a": np.asarray(ra, np.int64),
                             "vec_b": np.asarray(rb, np.int64)})

    cand = dedup_pair_rows(
        signed.groupby("bucket").map_groups(partition_pairs,
                                            batch_format="pandas"),
        a_col="vec_a", b_col="vec_b", count_col="n_tables_hit")

    # vectors ride through the hash join as fixed-width float32 bytes —
    # Acero rejects list/tensor payload columns, and binary is cheaper to
    # shuffle anyway (no offsets)
    def pack(b: pa.Table) -> pa.Table:
        m = np.stack(b[vec_col].to_pandas().to_numpy()).astype(np.float32)
        return pa.table({id_col: b[id_col],
                         "emb_bin": pa.array([r.tobytes() for r in m],
                                             pa.binary())})

    packed = proj.map_batches(pack, batch_format="pyarrow")
    withvec = attach_pair_columns(cand, packed, id_col=id_col,
                                  cols=["emb_bin"], a_key="vec_a",
                                  b_key="vec_b", num_partitions=num_partitions)
    thr = threshold

    def _unpack(col) -> np.ndarray:
        return np.stack([np.frombuffer(x, dtype=np.float32)
                         for x in col.to_pylist()])

    def verify(b: pa.Table) -> pa.Table:
        from deepkg_ray.functions.numeric import cosine_micros_rows
        if b.num_rows == 0:
            return pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        am = micros_matrix(_unpack(b["emb_bin_a"]))
        bm = micros_matrix(_unpack(b["emb_bin_b"]))
        cos = cosine_micros_rows(am, bm)
        out = pa.table({"vec_a": b["vec_a"], "vec_b": b["vec_b"],
                        "cosine": pa.array(cos, pa.float64())})
        return out.filter(pc.greater_equal(out["cosine"], thr))

    return withvec.map_batches(verify, batch_format="pyarrow")


def ngram_jaccard_pairs(ds, *, max_id: int = 200, threshold: float = 0.05,
                        shingle_k: int = 3, id_col="doc_id", text_col="text"):
    """Exact all-pairs word-shingle Jaccard on a bounded id-range subset —
    the exact-verification harness for the near-dup family (the scale path
    is minhash_dedup_pairs; this exact variant is what validates it and is
    itself SQL-checkable).  Output: (doc_a, doc_b, jaccard ≥ threshold)."""
    import pyarrow.compute as pc

    sub = ds.select_columns([id_col, text_col]).map_batches(
        lambda b: b.filter(pc.less(b[id_col], max_id)), batch_format="pyarrow")

    def all_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="stable")
        ids = df[id_col].to_numpy()
        sets = [set(word_shingles(t, shingle_k)) for t in df[text_col]]
        ra, rb, js = [], [], []
        for x in range(len(ids)):
            sx = sets[x]
            for y in range(x + 1, len(ids)):
                sy = sets[y]
                if not sx and not sy:
                    j = 1.0
                else:
                    inter = len(sx & sy)
                    if inter == 0:
                        continue
                    j = inter / (len(sx) + len(sy) - inter)
                if j >= threshold:
                    ra.append(int(ids[x])); rb.append(int(ids[y])); js.append(j)
        return pd.DataFrame({"doc_a": np.asarray(ra, np.int64),
                             "doc_b": np.asarray(rb, np.int64),
                             "jaccard": round6(js)})

    return sub.repartition(1).map_batches(all_pairs, batch_format="pandas",
                                          batch_size=None)


# ------------------------------------------------- incremental minhash ----

def minhash_band_table(ds, id_col: str = "doc_id", text_col: str = "text",
                       n_perm: int = 64, n_bands: int = 16,
                       shingle_k: int = 3, concurrency=None,
                       hash_mode: str = "fast"):
    """(doc_id, band_idx, band_hash) — the persistable LSH index of a
    corpus partition.  A production run writes this next to the corpus
    (one directory per ingest partition) so later partitions dedup against
    it WITHOUT recomputing old signatures."""
    from deepkg_ray.util import spread_small, stateful_map
    sigged = stateful_map(
        spread_small(ds.select_columns([id_col, text_col])), MinHashSignature,
        {"n_perm": n_perm, "n_bands": n_bands,
         "shingle_k": shingle_k, "text_col": text_col,
         "hash_mode": hash_mode},
        concurrency=concurrency, batch_size=None)
    return sigged.map_batches(
        lambda b: _explode_bands(b, id_col).drop_columns(["bucket"]),
        batch_format="pyarrow")


def minhash_raw_pairs_incremental(new_ds, old_bands, id_col: str = "doc_id",
                                  text_col: str = "text", n_perm: int = 64,
                                  n_bands: int = 16, shingle_k: int = 3,
                                  concurrency=None,
                                  num_partitions: int | None = None):
    """RAW candidate rows for an incremental dedup round: the NEW partition
    against itself (the usual bucket groupby) plus NEW × OLD via one hash
    join of the new band rows against the persisted old band table on
    (band_idx, band_hash) — old signatures are never recomputed, old×old
    pairs were already emitted by the old run.  Union of raw (doc_a <
    doc_b) rows; canonicalize with dedup_pair_rows as usual.

    Assumes disjoint id spaces between partitions (ingest invariant)."""
    if num_partitions is None:
        from deepkg_ray.util import join_partitions
        num_partitions = join_partitions()

    within = minhash_raw_pairs(new_ds, id_col, text_col, n_perm, n_bands,
                               shingle_k, concurrency)
    new_bands = minhash_band_table(new_ds, id_col, text_col, n_perm,
                                   n_bands, shingle_k, concurrency)
    old = old_bands.map_batches(
        lambda b: b.select([id_col, "band_idx", "band_hash"])
                   .rename_columns(["old_id", "band_idx", "band_hash"]),
        batch_format="pyarrow")
    cross = new_bands.join(old, join_type="inner",
                           num_partitions=num_partitions,
                           on=("band_idx", "band_hash"))

    def orient(b: pa.Table) -> pa.Table:
        a = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        o = b["old_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != o
        a, o = a[keep], o[keep]
        return pa.table({"doc_a": pa.array(np.minimum(a, o), pa.int64()),
                         "doc_b": pa.array(np.maximum(a, o), pa.int64())})

    return within.union(cross.map_batches(orient, batch_format="pyarrow"))


# ------------------------------------------- repeated-substring dedup ----

class GramRows:
    """documents → (doc_id, pos, h): one row per w-token-gram position.
    hash_mode 'fast' = siphash over the gram strings (throughput tier);
    'parity' = md5_lower64 (≡ DuckDB md5_number_lower) so the dup-span
    derivation is reproducible by oracle.substring_dup_spans_oracle.
    Docs shorter than w tokens emit nothing (no gram exists)."""

    def __init__(self, w: int = 5, id_col: str = "doc_id",
                 text_col: str = "text", hash_mode: str = "fast"):
        from deepkg_ray.functions.hashing import (md5_lower64_batch,
                                                  stable_hash64_batch)
        self.w = w
        self.id_col, self.text_col = id_col, text_col
        self._hash = (md5_lower64_batch if hash_mode == "parity"
                      else stable_hash64_batch)

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = self.w
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        texts = batch[self.text_col].to_pylist()
        grams: list[str] = []
        id_chunks, pos_chunks = [], []
        for i, t in enumerate(texts):
            ws = t.split()
            m = len(ws) - w + 1
            if m <= 0:
                continue
            grams.extend(" ".join(ws[j:j + w]) for j in range(m))
            id_chunks.append(np.full(m, ids[i], dtype=np.int64))
            pos_chunks.append(np.arange(m, dtype=np.int64))
        if not grams:
            return pa.table({self.id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64())})
        # int64 bit-reinterpret: groupby/join keys stay a native Arrow type
        # through the hash-shuffle (uint64 degrades to a pickled-object
        # extension column in the aggregate path and the join rejects it)
        return pa.table({
            self.id_col: pa.array(np.concatenate(id_chunks), pa.int64()),
            "pos": pa.array(np.concatenate(pos_chunks), pa.int64()),
            "h": pa.array(self._hash(grams).view(np.int64), pa.int64())})


def substring_dup_spans(ds, *, w: int = 5, min_count: int = 2,
                        id_col: str = "doc_id", text_col: str = "text",
                        hash_mode: str = "fast", concurrency=None,
                        num_partitions: int | None = None,
                        broadcast_limit: int = 2_000_000):
    """Repeated-substring detection (the hash variant of suffix-array
    training-data dedup, Lee et al. 2022 'Deduplicating Training Data
    Makes Language Models Better'): find every w-token gram occurring
    ≥ min_count times across the corpus and merge the covered positions
    into per-doc spans.  Returns (doc_id, span_start, span_end,
    n_dup_grams) token-index intervals — the spans a curation pass would
    cut or down-weight.

    Plan (scale shape): gram rows (doc_id, pos, h) are materialized once
    (object-store backed, spills at scale) and consumed twice — (1)
    per-block np.unique partial counts → groupby(h) Sum → dup-hash table
    (only duplicated grams survive, a tiny fraction of the corpus), (2)
    a semi-join of gram rows against the dup table — broadcast np.isin
    when the dup set fits ``broadcast_limit`` hashes (~16 MB), else a
    hash-partitioned Dataset.join — so only duplicated positions reach
    the final per-doc islands groupby.  Nothing row-shaped touches the
    driver.  Spans merge when consecutive dup positions are ≤ w apart
    (overlap or touch).  At toy scale wall time is dominated by the two
    all-to-all barrier boots, not kernels — both amortize at scale."""
    from ray.data.aggregate import Sum
    from deepkg_ray.util import join_partitions, spread_small, stateful_map

    if num_partitions is None:
        num_partitions = join_partitions()
    grams = stateful_map(
        spread_small(ds.select_columns([id_col, text_col])), GramRows,
        {"w": w, "id_col": id_col, "text_col": text_col,
         "hash_mode": hash_mode},
        concurrency=concurrency, batch_size=None).materialize()

    def _empty_spans():
        import ray.data as rd
        # pandas, not arrow: an empty arrow block loses its schema through
        # Ray's block accessor (to_pandas comes back zero-column)
        return rd.from_pandas(pd.DataFrame({
            id_col: pd.Series([], dtype=np.int64),
            "span_start": pd.Series([], dtype=np.int64),
            "span_end": pd.Series([], dtype=np.int64),
            "n_dup_grams": pd.Series([], dtype=np.int64)}))

    if grams.count() == 0:      # no doc reaches w tokens — nothing to dedup
        return _empty_spans()

    def pcount(b: pa.Table) -> pa.Table:
        h, c = np.unique(b["h"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"h": pa.array(h, pa.int64()),
                         "cnt": pa.array(c, pa.int64())})

    dup = (grams.map_batches(pcount, batch_format="pyarrow")
           .groupby("h").aggregate(Sum("cnt", alias_name="cnt"))
           .filter(expr=f"cnt >= {int(min_count)}")
           .select_columns(["h"])).materialize()

    n_dup = dup.count()
    if n_dup == 0:              # no gram repeats anywhere
        return _empty_spans()

    # adaptive semi-join: the dup-hash table is usually a tiny fraction of
    # the corpus — broadcast it (ray.put once, np.isin per batch) instead
    # of paying the hash-join aggregator boot; the join path remains for
    # open-vocab dup sets past the broadcast bound (~16 MB of hashes).
    if n_dup <= broadcast_limit:
        import ray
        dup_arr = np.sort(dup.to_pandas()["h"].to_numpy(np.int64))
        dup_ref = ray.put(dup_arr)

        def semi(b: pa.Table) -> pa.Table:
            d = ray.get(dup_ref)
            mask = np.isin(b["h"].to_numpy(zero_copy_only=False), d,
                           assume_unique=False)
            return b.filter(pa.array(mask))

        hits = grams.map_batches(semi, batch_format="pyarrow")
    else:
        hits = grams.join(dup, join_type="inner",
                          num_partitions=num_partitions, on=("h",))

    def islands(df: pd.DataFrame) -> pd.DataFrame:
        pos = np.sort(df["pos"].to_numpy(np.int64))
        brk = np.ones(len(pos), dtype=np.int64)
        brk[1:] = (np.diff(pos) > w).astype(np.int64)
        g = np.cumsum(brk)
        gdf = pd.DataFrame({"pos": pos, "g": g})
        agg = gdf.groupby("g", sort=True)["pos"].agg(["min", "max", "count"])
        return pd.DataFrame({
            id_col: np.full(len(agg), df[id_col].iloc[0], dtype=np.int64),
            "span_start": agg["min"].to_numpy(np.int64),
            "span_end": agg["max"].to_numpy(np.int64) + w,
            "n_dup_grams": agg["count"].to_numpy(np.int64)})

    return hits.groupby(id_col).map_groups(islands, batch_format="pandas")


# ------------------------------------------- fingerprint containment ----

def containment_pairs(ds, *, window: int = 8, keep_mod: int = 16,
                      threshold: float = 0.5, max_bucket: int = 64,
                      id_col: str = "doc_id", text_col: str = "text",
                      concurrency=None, num_partitions: int | None = None):
    """Winnowing containment detection (Schleimer et al. 2003 'MOSS'):
    docs sharing a high fraction of rolling-hash fingerprints — catches
    quotation/subset relations that whole-doc near-dup (minhash over the
    full shingle set) dilutes away.  Returns (doc_a, doc_b, n_shared,
    containment) with containment = round6(shared / min(|FP_a|, |FP_b|))
    ≥ threshold.

    Scale shape: distinct (doc_id, fp) rows → groupby(fp) buckets emit
    pairs in-bucket (never all-pairs); buckets larger than ``max_bucket``
    docs are stop-fingerprints and dropped (the skew guard — boilerplate
    shared by every corpus); per-doc fingerprint counts attach via the
    hash-partitioned pair joins (attach_pair_columns)."""
    from deepkg_ray.util import spread_small, stateful_map
    from deepkg_ray.stages.textstats import FingerprintStage

    fp_ds = stateful_map(
        spread_small(ds.select_columns([id_col, text_col])),
        FingerprintStage, {"text_col": text_col, "window": window,
                           "keep_mod": keep_mod},
        concurrency=concurrency, batch_size=None)

    # two projections of one pass: (doc_id, fp) rows and (doc_id, n_fp)
    def explode(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        fps = b["fingerprints"].to_pylist()
        o_id, o_fp = [], []
        for i, lst in enumerate(fps):
            u = np.unique(np.asarray(lst, dtype=np.int64))
            o_id.append(np.full(len(u), ids[i], dtype=np.int64))
            o_fp.append(u)
        flat_id = (np.concatenate(o_id) if o_id
                   else np.empty(0, dtype=np.int64))
        flat_fp = (np.concatenate(o_fp) if o_fp
                   else np.empty(0, dtype=np.int64))
        return pa.table({id_col: pa.array(flat_id, pa.int64()),
                         "fp": pa.array(flat_fp, pa.int64())})

    def nfp(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        fps = b["fingerprints"].to_pylist()
        n = np.array([len(np.unique(np.asarray(l, dtype=np.int64)))
                      for l in fps], dtype=np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_fp": pa.array(n, pa.int64())})

    fp_mat = fp_ds.materialize()
    fp_rows = fp_mat.map_batches(explode, batch_format="pyarrow")
    nfp_ds = fp_mat.map_batches(nfp, batch_format="pyarrow")

    mb = int(max_bucket)

    # coarse-bucket the fp space (64 shuffle groups, not one Ray group per
    # fingerprint — millions of tiny groups cost per-group scheduling),
    # then a vectorized segment scan emits in-fp pairs inside each bucket
    def add_fb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_fb"] = (df["fp"] % 64).astype(np.int32)
        return df

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["fp", id_col], kind="stable")
        fps = df["fp"].to_numpy(np.int64)
        ids = df[id_col].to_numpy(np.int64)
        bound = np.flatnonzero(np.r_[True, fps[1:] != fps[:-1], True])
        out_a, out_b = [], []
        for s, e in zip(bound[:-1], bound[1:]):
            n = e - s
            if n < 2 or n > mb:
                continue
            seg = ids[s:e]
            ia, ib = np.triu_indices(n, k=1)
            out_a.append(seg[ia])
            out_b.append(seg[ib])
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"doc_a": np.concatenate(out_a),
                             "doc_b": np.concatenate(out_b)})

    pairs = (fp_rows.map_batches(add_fb, batch_format="pandas")
             .groupby("_fb").map_groups(bucket_pairs,
                                        batch_format="pandas"))
    counted = dedup_pair_rows(pairs, a_col="doc_a", b_col="doc_b",
                              count_col="n_shared").materialize()
    if counted.count() == 0:    # no shared fingerprints anywhere
        import ray.data as rd
        return rd.from_pandas(pd.DataFrame({
            "doc_a": pd.Series([], dtype=np.int64),
            "doc_b": pd.Series([], dtype=np.int64),
            "n_shared": pd.Series([], dtype=np.int64),
            "containment": pd.Series([], dtype=np.float64)}))
    from deepkg_ray.util import drop_empty_blocks
    withn = attach_pair_columns(drop_empty_blocks(counted), nfp_ds,
                                id_col=id_col, cols=["n_fp"],
                                num_partitions=num_partitions)

    thr = float(threshold)

    def score(b: pa.Table) -> pa.Table:
        sh = b["n_shared"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = b["n_fp_a"].to_numpy(zero_copy_only=False)
        nb_ = b["n_fp_b"].to_numpy(zero_copy_only=False)
        denom = np.minimum(na, nb_).astype(np.float64)
        cont = np.floor(sh / np.maximum(denom, 1.0) * 1e6 + 0.5) / 1e6
        out = pa.table({"doc_a": b["doc_a"], "doc_b": b["doc_b"],
                        "n_shared": b["n_shared"],
                        "containment": pa.array(cont, pa.float64())})
        return out.filter(pc.greater_equal(out["containment"], thr))

    return withn.map_batches(score, batch_format="pyarrow")


def dedup_keep_longest(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact dedup with the KEEP-LONGEST survivorship policy (dedup_exact
    keeps min id; real curation pipelines usually keep the longest copy —
    boilerplate-stripped variants lose to the full document): per distinct
    NORMALIZED content (lower+trim), the survivor maximizes (n_chars,
    −doc_id) — a row-wise argmax that is associative, so it folds per
    batch and merges through the repartition tree (the
    latest_order_per_customer kernel on content groups; final task holds
    ≤ distinct-content candidate rows — for open content domains swap the
    tree for Max(n_chars)-join-Min(id) shuffle rounds).
    Returns (content_hash, doc_id, n_chars, n_dups)."""
    import hashlib

    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        ids = b[id_col].to_numpy(zero_copy_only=False)
        norm = [t.lower().strip() for t in texts]
        df = pd.DataFrame({
            "content_hash": [hashlib.md5(t.encode()).hexdigest()
                             for t in norm],
            id_col: ids.astype(np.int64),
            "n_chars": np.asarray([len(t) for t in norm], np.int64),
            "n_dups": np.ones(len(ids), np.int64)})
        df = df.sort_values(["content_hash", "n_chars", id_col],
                            ascending=[True, True, False], kind="stable")
        agg = (df.groupby("content_hash", sort=False)
               .agg({id_col: "last", "n_chars": "last", "n_dups": "sum"})
               .reset_index())
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = ds.select_columns([id_col, text_col]).map_batches(
        partial, batch_format="pyarrow")

    def merge_frames(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["content_hash", "n_chars", id_col],
                            ascending=[True, True, False], kind="stable")
        agg = (df.groupby("content_hash", sort=False)
               .agg({id_col: "last", "n_chars": "last", "n_dups": "sum"})
               .reset_index())
        return agg

    lvl1 = parts.repartition(8).map_batches(
        merge_frames, batch_format="pandas", batch_size=None)
    return lvl1.repartition(1).map_batches(
        merge_frames, batch_format="pandas", batch_size=None)


def source_dup_rates(ds, id_col: str = "doc_id", text_col: str = "text",
                     src_col: str = "source"):
    """Per-source exact-duplication report: docs, distinct contents, and
    the duplicate fraction (round6) — the where-is-my-duplication-coming-
    from breakdown that decides which source needs the minhash pass.
    One (source, content_hash) counting shuffle with per-batch combiners.
    Returns (source, n_docs, n_distinct, dup_rate)."""
    import pandas as pd

    from deepkg_ray.functions.numeric import round6
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        hashed = add_content_hash(b, text_col)
        df = pd.DataFrame({src_col: hashed[src_col].to_pylist(),
                           "content_hash":
                               hashed["content_hash"].to_pylist()})
        g = (df.groupby([src_col, "content_hash"], sort=False).size()
             .reset_index(name="n"))
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (ds.select_columns([id_col, text_col, src_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby([src_col, "content_hash"])
              .aggregate(Sum("n", alias_name="n")))

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        n_docs = int(g["n"].sum())
        n_distinct = len(g)
        rate = float(round6(np.asarray(
            [(n_docs - n_distinct) / n_docs]))[0]) if n_docs else 0.0
        return pd.DataFrame({
            src_col: [g[src_col].iloc[0]],
            "n_docs": np.asarray([n_docs], np.int64),
            "n_distinct": np.asarray([n_distinct], np.int64),
            "dup_rate": np.asarray([rate], np.float64)})

    return counts.groupby(src_col).map_groups(per_source,
                                              batch_format="pandas")


def doc_dup_fraction(ds, *, w: int = 5, min_count: int = 2,
                     id_col: str = "doc_id", text_col: str = "text",
                     hash_mode: str = "parity",
                     num_partitions: int | None = None):
    """Per-document duplicated-token share: the substring_dup_spans span
    table rolled up to (doc_id, n_tokens, dup_tokens, dup_fraction) —
    the curation signal that decides whether to cut spans or drop the
    whole doc (Lee et al. 2022 report corpus-level dup fractions exactly
    this way).  Spans are disjoint per doc by construction, so
    dup_tokens = Σ (span_end − span_start).  Docs with no duplicated
    span report 0."""
    from deepkg_ray.stages.treeagg import merge_partials
    from deepkg_ray.util import drop_empty_blocks, join_partitions
    if num_partitions is None:
        num_partitions = join_partitions()
    from deepkg_ray.functions.numeric import round6

    spans = substring_dup_spans(ds, w=w, min_count=min_count,
                                id_col=id_col, text_col=text_col,
                                hash_mode=hash_mode,
                                num_partitions=num_partitions)

    def dup_partial(b: pa.Table) -> pd.DataFrame:
        d = pd.DataFrame({
            id_col: b[id_col].to_numpy(zero_copy_only=False),
            "dup_tokens": (b["span_end"].to_numpy(zero_copy_only=False)
                           - b["span_start"].to_numpy(zero_copy_only=False))})
        return d.groupby(id_col, sort=False, as_index=False).sum()

    dup = merge_partials(
        spans.map_batches(dup_partial, batch_format="pyarrow"),
        [id_col], {"dup_tokens": "sum"}, mode="auto")

    def lens(b: pa.Table) -> pa.Table:
        n = [len(t.split()) for t in b[text_col].to_pylist()]
        return pa.table({id_col: b[id_col].cast(pa.int64()),
                         "n_tokens": pa.array(n, pa.int64())})

    lengths = ds.select_columns([id_col, text_col]).map_batches(
        lens, batch_format="pyarrow")
    joined = drop_empty_blocks(lengths).join(
        drop_empty_blocks(dup), join_type="left_outer",
        num_partitions=num_partitions, on=(id_col,))

    def finish(b: pa.Table) -> pd.DataFrame:
        d = b.to_pandas()
        d["dup_tokens"] = d["dup_tokens"].fillna(0).astype(np.int64)
        n = d["n_tokens"].to_numpy(np.int64)
        d["dup_fraction"] = [
            round6(dt / nt) if nt else 0.0
            for dt, nt in zip(d["dup_tokens"], n)]
        return d[[id_col, "n_tokens", "dup_tokens", "dup_fraction"]]

    return drop_empty_blocks(joined).map_batches(finish,
                                                 batch_format="pyarrow")


def cdc_chunk_stats(ds, *, w: int = 8, boundary_mod: int = 64,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Content-defined chunking dedup audit (the Rabin/LBFS idea behind
    blob-level dedup in backup systems and multimodal payload stores):
    chunk boundaries fall wherever the w-char polynomial rolling hash
    ≡ 0 (mod boundary_mod) — boundaries survive insertions/deletions
    elsewhere in the stream, unlike fixed-size blocks — then chunks are
    content-hashed (md5 parity) and counted corpus-wide.

    Returns ONE row: (n_docs, total_chunks, distinct_chunks, dup_ratio,
    total_chars, mean_chunk_len).  dup_ratio = round6(1 − distinct/total)
    is the share of chunk storage dedup would reclaim.

    Plan: per-doc chunking is batch-local (the rolling hash is the
    rolling_fingerprint recurrence, SQL-reproducible without recursion);
    only (chunk_hash, 1) rows shuffle into a groupby count — chunk-level
    cardinality, never characters.  Empty docs contribute nothing."""
    from ray.data.aggregate import Count, Sum
    from deepkg_ray.functions.hashing import _MERSENNE
    from deepkg_ray.functions.numeric import round6
    from deepkg_ray.stages.sketches import _hash64

    base, mod = 257, _MERSENNE

    def chunk_rows(b: pa.Table) -> pa.Table:
        hashes: list[str] = []
        lens: list[int] = []
        docs = 0
        for t in b[text_col].to_pylist():
            n = len(t)
            if n == 0:
                continue
            docs += 1
            if n < w:
                hashes.append(t)
                lens.append(n)
                continue
            pw = pow(base, w - 1, mod)
            h = 0
            start = 0
            for i, c in enumerate(t):
                h = (h * base + ord(c)) % mod
                if i >= w:
                    h = (h - ord(t[i - w]) * pw * base) % mod
                if i >= w - 1 and h % boundary_mod == 0:
                    hashes.append(t[start:i + 1])
                    lens.append(i + 1 - start)
                    start = i + 1
            if start < n:
                hashes.append(t[start:])
                lens.append(n - start)
        hv = (_hash64(hashes).view(np.int64) if hashes
              else np.empty(0, np.int64))
        return pa.table({
            "h": pa.array(hv, pa.int64()),
            "clen": pa.array(np.asarray(lens, np.int64)),
            "docs": pa.array(
                np.concatenate([[docs], np.zeros(max(len(hv) - 1, 0),
                                                 np.int64)])
                if len(hv) else np.empty(0, np.int64), pa.int64())})

    rows = ds.select_columns([text_col]).map_batches(
        chunk_rows, batch_format="pyarrow").materialize()
    totals = rows.aggregate(Count(alias_name="total_chunks"),
                            Sum("clen", alias_name="total_chars"),
                            Sum("docs", alias_name="n_docs"))
    distinct = rows.groupby("h").aggregate(
        Count(alias_name="_c")).count()
    tc = int(totals["total_chunks"])
    n_docs = int(totals["n_docs"] or 0)
    chars = int(totals["total_chars"] or 0)
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "total_chunks": pa.array([tc], pa.int64()),
        "distinct_chunks": pa.array([int(distinct)], pa.int64()),
        "dup_ratio": pa.array(
            [round6(1.0 - distinct / tc) if tc else 0.0], pa.float64()),
        "total_chars": pa.array([chars], pa.int64()),
        "mean_chunk_len": pa.array(
            [round6(chars / tc) if tc else 0.0], pa.float64())}))
