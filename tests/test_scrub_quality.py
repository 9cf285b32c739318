"""PII scrub, quality gate, decontamination, unigram logprob — goldens,
modes-agree, and DuckDB-parity checks on the regex subset."""

import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from deepkg_ray.stages import scrub, textstats


def test_pii_scrub_golden():
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": ["mail a.b+c@x.co and http://x.org/p then 123-456-7890",
                 "clean text no pii"],
    })
    out = scrub.pii_scrub_kernel(t).to_pylist()
    r = out[0]
    assert (r["n_emails"], r["n_urls"], r["n_phones"]) == (1, 1, 1)
    assert r["text_scrubbed"] == "mail <EMAIL> and <URL> then <PHONE>"
    assert out[1]["text_scrubbed"] == "clean text no pii"
    assert out[1]["n_emails"] == 0


def test_pii_patterns_match_duckdb_re2():
    """The load-bearing parity claim: on adversarial-ish strings, Python re
    and DuckDB RE2 agree on match counts AND on the replaced text for every
    PII pattern (greedy backtracking vs RE2 simulation)."""
    texts = [
        "a@b.cd x@y.z ab.cd@ef.gh.ij",       # .z TLD too short → no match
        "https://a.b/c/d http://e.f dangling https://",
        "000-111-2222 00-111-2222 0000-111-22223",
        "a.b@c.d.e.fg end",                   # greedy domain backtrack
        "doc7@mail.example.com see https://docs.example.org/d/7 "
        "call 202-555-0007",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": texts})
    eng = scrub.pii_scrub_kernel(t).to_pandas()
    con = duckdb.connect()
    con.register("docs", pd.DataFrame({"doc_id": range(len(texts)),
                                       "text": texts}))
    sel = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}s"
        for name, pat, _ in scrub.PII_PATTERNS)
    rep = "text"
    for _, pat, r in scrub.PII_PATTERNS:
        rep = f"regexp_replace({rep}, '{pat}', '{r}', 'g')"
    ora = con.execute(
        f"SELECT doc_id, {sel}, {rep} AS text_scrubbed FROM docs "
        "ORDER BY doc_id").df()
    for col in ["n_emails", "n_urls", "n_phones", "text_scrubbed"]:
        assert list(eng[col]) == list(ora[col]), col


def test_quality_filter_golden(ray_session):
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["the quick brown fox dogs " * 10,  # 50 words, stops, keep
                 "word " * 10,                      # too few words
                 "supercalifragilistic " * 40],     # mean len > 10, no stops
    })
    out = (textstats.quality_filter(rd.from_pandas(docs))
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[0, "keep"] == 1
    assert out.loc[1, "keep"] == 0 and out.loc[1, "flag_words"] == 0
    assert out.loc[2, "keep"] == 0
    assert out.loc[2, "flag_mean_len"] == 0 and out.loc[2, "flag_stop"] == 0
    assert out.loc[0, "mean_word_len"] == math.floor(
        (3 + 5 + 5 + 3 + 4) / 5 * 1e6 + 0.5) / 1e6


def test_decontaminate_modes_agree(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, size=rng.integers(4, 14)))
                 for _ in range(60)],
    })
    ds = rd.from_pandas(docs)
    bench_mask = docs["doc_id"] % 5 == 0
    bench = scrub.benchmark_ngrams(
        rd.from_pandas(docs[bench_mask]), n=3)
    rest = rd.from_pandas(docs[~bench_mask])
    b = (scrub.decontaminate(rest, bench, n=3, mode="broadcast")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    j = (scrub.decontaminate(rest, bench, n=3, mode="join")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    hit = b[b["n_hits"] > 0].reset_index(drop=True)
    assert len(hit) > 0, "fixture produced no contamination"
    pd.testing.assert_frame_equal(hit, j, check_dtype=False)
    # brute-force golden for one contaminated doc
    gid = int(hit.loc[0, "doc_id"])
    grams = set(scrub._doc_grams(docs.loc[gid, "text"], 3))
    bgrams = set()
    for t in docs[bench_mask]["text"]:
        bgrams |= set(scrub._doc_grams(t, 3))
    assert hit.loc[0, "n_hits"] == len(grams & bgrams)


def test_doc_logprob_modes_and_golden(ray_session):
    docs = pd.DataFrame({"doc_id": [0, 1],
                         "text": ["a a b", "b c"]})
    ds = rd.from_pandas(docs)
    out = (textstats.doc_logprob(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # corpus counts: a=2, b=2, c=1, total=5
    lp = {w: math.floor(math.log(c / 5) * 1e6 + 0.5)
          for w, c in {"a": 2, "b": 2, "c": 1}.items()}
    assert out.loc[0, "logprob_micros"] == 2 * lp["a"] + lp["b"]
    assert out.loc[1, "logprob_micros"] == lp["b"] + lp["c"]
    assert out.loc[0, "n_tokens"] == 3
    assert out.loc[0, "avg_logprob"] == math.floor(
        (2 * lp["a"] + lp["b"]) / 3 + 0.5) / 1e6
    j = (textstats.doc_logprob(ds, mode="join").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, j[out.columns], check_dtype=False)


def test_rake_keywords_golden(ray_session):
    """Hand-derived RAKE: 'deep learning of the deep graph' + 'a graph' →
    deg/freq word scores deep=2, learning=2, graph=1.5 and phrase scores
    4.0 / 3.5 / 1.5."""
    import ray.data as rd

    from deepkg_ray.stages.textstats import rake_keywords
    docs = pd.DataFrame({"doc_id": [0, 1],
                         "text": ["deep learning of the deep graph",
                                  "a graph"]})
    out = rake_keywords(rd.from_pandas(docs), k=10).to_pandas()
    assert out["phrase"].tolist() == ["deep learning", "deep graph", "graph"]
    assert out["n_occurrences"].tolist() == [1, 1, 1]
    assert np.allclose(out["score"], [4.0, 3.5, 1.5])


def test_source_pii_rates_golden(ray_session):
    """Source a: 2 docs, one with an email; source b: 1 doc with two
    URLs and a phone."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.scrub import source_pii_rates
    t = pa.table({
        "source": pa.array(["a", "a", "b"]),
        "text": pa.array([
            "reach me at bob@x.org today",
            "nothing here",
            "see https://x.org/a and https://y.org/b call 555-123-4567"])})
    out = (source_pii_rates(rd.from_arrow(t)).to_pandas()
           .set_index(["source", "kind"]))
    assert out.loc[("a", "email"), "n_docs_hit"] == 1
    assert out.loc[("a", "email"), "hit_rate"] == 0.5
    assert out.loc[("a", "url"), "n_hits"] == 0
    assert out.loc[("b", "url"), "n_hits"] == 2
    assert out.loc[("b", "phone"), "n_hits"] == 1
    assert out.loc[("b", "phone"), "hit_rate"] == 1.0


def test_distinct_ngram_diversity_matches_duckdb(sf_dir):
    import duckdb

    from deepkg_ray.oracle import distinct_ngram_diversity_oracle
    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import distinct_ngram_diversity
    got = (distinct_ngram_diversity(
        read_documents(sf_dir, ["source", "text"])).to_pandas()
        .sort_values(["source", "n"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = (con.sql(distinct_ngram_diversity_oracle()).df()
            .sort_values(["source", "n"]).reset_index(drop=True))
    assert got["total"].tolist() == want["total"].tolist()
    assert got["n_distinct"].tolist() == want["n_distinct"].tolist()
    assert got["ratio"].tolist() == want["ratio"].tolist()
    # diversity sanity: distinct-2 ratio ≥ distinct-1 ratio per source
    # (bigrams repeat less than unigrams in natural-ish text)
    p = got.pivot(index="source", columns="n", values="ratio")
    assert (p[2] >= p[1]).all()


def test_compression_ratio_gold_and_monotonicity(sf_dir):
    import pyarrow.parquet as pq

    from deepkg_ray.sources.readers import read_documents
    from deepkg_ray.stages.textstats import (compression_gold_path,
                                             compression_ratio)
    got = (compression_ratio(read_documents(sf_dir, ["doc_id", "text"]))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    gold = (pq.read_table(compression_gold_path(sf_dir)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    for c in ["doc_id", "n_bytes", "n_compressed", "ratio"]:
        assert got[c].tolist() == gold[c].tolist(), c
    # a doc repeated 10x must compress far better than once
    import ray.data as rd
    base = "the quick brown fox jumps over the lazy dog. "
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array([base, base * 10], pa.string())})
    r = (compression_ratio(rd.from_arrow(t)).to_pandas()
         .set_index("doc_id")["ratio"])
    assert r[1] < r[0]
