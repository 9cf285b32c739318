"""Curation ops: sentence dedup golden + budget_select vs brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from deepkg_ray.stages import curation


def test_sentence_dedup_golden(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.array([0, 1, 2], dtype=np.int64),
        "text": ["alpha beta. gamma delta. alpha beta",  # self-dup sentence
                 "gamma delta. epsilon",                 # first sentence lost
                 "alpha beta. gamma delta"],             # fully duplicated
    })
    out = (curation.sentence_dedup(rd.from_pandas(docs))
           .to_pandas().set_index("doc_id").sort_index())
    # doc 0 keeps both first occurrences; its repeated 'alpha beta' loses
    assert out.loc[0, "text_clean"] == "alpha beta. gamma delta"
    assert out.loc[0, "n_kept"] == 2
    assert out.loc[1, "text_clean"] == "epsilon"
    # doc 2 lost every sentence → dropped entirely
    assert 2 not in out.index


def test_budget_select_matches_bruteforce(ray_session):
    rng = np.random.default_rng(11)
    for trial in range(4):
        n = 200
        df = pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64),
            # few distinct scores → heavy ties → boundary group is wide
            "score": rng.choice([0.1, 0.25, 0.5, 0.75], size=n),
            "weight": rng.integers(0, 50, size=n).astype(np.int64),
        })
        total = int(df["weight"].sum())
        budget = int(total * [0.0, 0.3, 0.7, 1.0][trial])
        got = curation.budget_select(rd.from_pandas(df), budget).to_pandas()
        b = df.sort_values(["score", "doc_id"], ascending=[False, True])
        b = b[b["weight"].cumsum() <= budget]
        want = b.sort_values("doc_id").reset_index(drop=True)
        if want.empty:
            assert got.empty
            continue
        got = got.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["doc_id", "score", "weight"]], want, check_dtype=False)


def test_budget_select_all_fit(ray_session):
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                       "score": [1.0, 0.5, 0.5, 0.2, 0.1],
                       "weight": np.array([1, 1, 1, 1, 1], dtype=np.int64)})
    got = curation.budget_select(rd.from_pandas(df), 100).to_pandas()
    assert len(got) == 5


def test_filter_by_quality_matches_flags(ray_session):
    from deepkg_ray.stages.textstats import filter_by_quality, quality_filter
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["the quick brown fox dogs " * 10, "word " * 10,
                 "supercalifragilistic " * 40,
                 "the tiny one of all in a to " * 8],
    })
    ds = rd.from_pandas(docs)
    flags = quality_filter(ds).to_pandas()
    kept = filter_by_quality(ds).to_pandas()
    assert sorted(kept["doc_id"]) == sorted(
        flags[flags["keep"] == 1]["doc_id"])
    assert list(kept.columns) == ["doc_id", "text"]   # all columns preserved


def test_corpus_curate_end_to_end(ray_session):
    rng = np.random.default_rng(3)
    vocab = ["the", "of", "to", "alpha", "beta", "gamma", "delta", "omega"]
    docs = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [". ".join(
            " ".join(rng.choice(vocab, size=rng.integers(6, 10)))
            for _ in range(rng.integers(4, 9))) for _ in range(40)],
    })
    out = curation.corpus_curate(rd.from_pandas(docs), budget_frac=0.5) \
        .to_pandas()
    assert set(out.columns) == {"doc_id", "quality", "n_tokens"}
    # budget respected and selection is quality-prefix-shaped
    assert 0 < len(out) < 40


def test_embedding_gram_bruteforce(ray_session):
    from deepkg_ray.stages.similarity import embedding_gram
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(30, 4)).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame({"embedding": list(mat)}))
    out = embedding_gram(ds).to_pandas().set_index(["i", "j"]).sort_index()
    m64 = mat.astype(np.float64)
    for i in range(4):
        for j in range(i, 4):
            want = int(np.floor(m64[:, i] * m64[:, j] * 1e6 + 0.5).sum())
            assert out.loc[(i + 1, j + 1), "sxy_micros"] == want
    assert (out["n"] == 30).all()


def test_boilerplate_stats_golden_and_tier_agreement(ray_session):
    # "footer" appears in 3 docs -> boilerplate at min_docs=3; "hello"
    # appears in 2 -> kept.  Doc 3 repeats the footer twice: both
    # occurrences count as boiler but df counts the doc once.
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["footer. hello world",
                 "footer. unique one",
                 "hello world. other text",
                 "footer. footer. tail"]})
    ds = rd.from_pandas(docs)
    dec = {}
    out = (curation.boilerplate_stats(ds, min_docs=3, decision_out=dec)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert dec["mode"] == "broadcast"
    assert list(out["n_sents"]) == [2, 2, 2, 3]
    assert list(out["n_boiler"]) == [1, 1, 0, 2]
    assert list(out["kept_chars"]) == [len("hello world"),
                                       len("unique one"),
                                       len("hello world") + len("other text"),
                                       len("tail")]
    dec2 = {}
    out2 = (curation.boilerplate_stats(ds, min_docs=3, max_broadcast=0,
                                       decision_out=dec2)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert dec2["mode"] == "join"
    pd.testing.assert_frame_equal(out, out2[out.columns])


def test_neyman_allocation_matches_duckdb_and_sums_to_k(sf_dir):
    import duckdb

    from deepkg_ray.oracle import neyman_allocation_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import neyman_allocation
    got = (neyman_allocation(read_documents(sf_dir, ["source", "text"]),
                             k=97).to_pandas()
           .sort_values("source").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = (con.sql(neyman_allocation_oracle(k=97)).df()
            .sort_values("source").reset_index(drop=True))
    for c in ["source", "n_docs", "std_len", "weight", "alloc"]:
        assert got[c].tolist() == want[c].tolist(), c
    assert int(got["alloc"].sum()) == 97
    # allocations never exceed what weight share implies by more than 1
    sh = got["weight"] / got["weight"].sum()
    assert (got["alloc"] - np.floor(97 * sh) <= 1).all()


def test_neyman_sample_matches_duckdb_and_quota(sf_dir):
    import duckdb

    from deepkg_ray.oracle import neyman_sample_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import (neyman_allocation,
                                            neyman_sample)
    docs = read_documents(sf_dir, ["source", "doc_id", "text"])
    got = (neyman_sample(docs, k=40).to_pandas()
           .sort_values(["source", "doc_id"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = (con.sql(neyman_sample_oracle(k=40)).df()
            .sort_values(["source", "doc_id"]).reset_index(drop=True))
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["source"].tolist() == want["source"].tolist()
    # drawn counts equal the allocation plan exactly
    plan = neyman_allocation(docs, k=40).to_pandas() \
        .set_index("source")["alloc"]
    drawn = got.groupby("source").size()
    for s_, a in plan.items():
        assert drawn.get(s_, 0) == a, s_


def test_split_leakage_matches_duckdb_and_finds_planted_dup(sf_dir):
    import duckdb
    import ray.data as rd

    from deepkg_ray.oracle import split_leakage_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import split_leakage_audit
    got = (split_leakage_audit(read_documents(sf_dir,
                                              ["doc_id", "text"]))
           .to_pandas().sort_values(["split_a", "split_b"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = (con.sql(split_leakage_oracle()).df()
            .sort_values(["split_a", "split_b"]).reset_index(drop=True))
    for c in ["split_a", "split_b", "n_hashes", "n_pairs"]:
        assert got[c].tolist() == want[c].tolist(), c
    # planted: same text under ids known to hash into different splits
    # (found by scanning the split rule) must register as leakage
    import hashlib
    names = ["train", "val", "test"]
    cuts = [204, 230, 256]

    def split_of(i):
        x = int(hashlib.md5(f"9:{i}".encode()).hexdigest()[:2], 16)
        return (names[0] if x < cuts[0]
                else names[1] if x < cuts[1] else names[2])
    tr = next(i for i in range(1000) if split_of(i) == "train")
    va = next(i for i in range(1000) if split_of(i) == "val")
    t = pa.table({"doc_id": pa.array([tr, va], pa.int64()),
                  "text": pa.array(["LEAKED DOC"] * 2, pa.string())})
    leaked = (split_leakage_audit(rd.from_arrow(t)).to_pandas()
              .set_index(["split_a", "split_b"]))
    assert leaked.loc[("train", "val"), "n_pairs"] == 1


def test_near_dup_leakage_matches_duckdb(sf_dir):
    import duckdb

    from deepkg_ray.oracle import near_dup_leakage_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import near_dup_leakage_audit
    got = (near_dup_leakage_audit(
        read_documents(sf_dir, ["doc_id", "text"]),
        f"{sf_dir}/documents.parquet").to_pandas()
        .sort_values(["split_a", "split_b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = (con.sql(near_dup_leakage_oracle()).df()
            .sort_values(["split_a", "split_b"]).reset_index(drop=True))
    for c in ["split_a", "split_b", "n_pairs"]:
        assert got[c].tolist() == want[c].tolist(), c
    assert got["n_pairs"].sum() > 0        # synth HAS near-dups


def test_quarantine_leaked_matches_duckdb(sf_dir):
    import duckdb

    from deepkg_ray.oracle import quarantine_leaked_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.curation import quarantine_leaked_docs
    got = (quarantine_leaked_docs(
        read_documents(sf_dir, ["doc_id", "text"]),
        f"{sf_dir}/documents.parquet").to_pandas()
        .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = (con.sql(quarantine_leaked_oracle()).df()
            .sort_values("doc_id").reset_index(drop=True))
    for c in ["doc_id", "split", "n_train_dups"]:
        assert got[c].tolist() == want[c].tolist(), c
    assert set(got["split"]) <= {"val", "test"}
