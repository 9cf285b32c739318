"""Round-trip, rescoring, sampling, spearman — parity extras."""

import numpy as np
import pyarrow as pa

from deepkg_ray.functions.textnorm import md5_keep_mask
from deepkg_ray.stages import selparse as s2r
from deepkg_ray.stages.linking import rescore_candidates
from deepkg_ray.stages.scoring import spearman


def test_sel_roundtrip():
    """records → SEL (convert_spot_asoc analog) → parse_sel → records."""
    records = [
        {"type": "person", "spot": "alice smith",
         "asocs": [("works for", "acme corp"), ("uses", "toolx")]},
        {"type": "org", "spot": "acme corp", "asocs": []},
    ]
    sel = s2r.convert_spot_asoc(records)
    text = "alice smith works for acme corp and uses toolx"
    back, ctr = s2r.parse_sel(sel, text=text,
                              spot_set={"person", "org"},
                              asoc_set={"works for", "uses"})
    assert ctr.get("well-formed") == 1
    assert back == records


def test_tasks_to_spot_asoc_inversion():
    """entity/relation/event → spot-asoc (annonote_graph analog) followed by
    the forward projection is identity on the relation set."""
    entities = [{"text": "alice", "type": "person"},
                {"text": "acme", "type": "org"}]
    relations = [{"type": "works for",
                  "roles": [("person", "alice"), ("org", "acme")]}]
    spot_asoc = s2r.tasks_to_spot_asoc(entities, relations, [])
    tasks = s2r.records_to_tasks(spot_asoc, {"person", "org"}, set())
    assert tasks["relation"] == relations
    assert sorted(e["text"] for e in tasks["entity"]) == ["acme", "alice"]


def test_ssi_prefix():
    p = s2r.build_ssi_prefix(["person", "org"], ["works for"])
    assert p == "<spot> org <spot> person <asoc> works for <extra_id_2> "


def test_rescore_candidates():
    t = pa.table({
        "query": ["q1", "q1", "q1", "q2"],
        "candidate_name": ["aa", "aa", "bbbb", "cc"],
        "candidate_id": pa.array([1, 1, 2, 3], pa.int64()),
        "score": pa.array([1.0, 1.0, 4.0, 2.0], pa.float32()),
        "rank": pa.array([0, 1, 2, 0], pa.int32()),
    })
    out = rescore_candidates(t).to_pandas()
    q1 = out[out["query"] == "q1"].set_index("candidate_name")
    # aa: (1/(2+2) + 1/(2+2)) * 2 (repeat boost) = 1.0 ; bbbb: 4/(4+2)=0.667
    assert abs(q1.loc["aa", "norm_score"] - 1.0) < 1e-6
    assert abs(q1.loc["bbbb", "norm_score"] - 4 / 6) < 1e-4
    assert q1.loc["aa", "rank"] == 0 and q1.loc["bbbb", "rank"] == 1


def test_md5_keep_mask_deterministic_and_proportional():
    keys = [f"conv-{i}:{j}" for i in range(200) for j in range(5)]
    m1 = md5_keep_mask(keys, 30)
    m2 = md5_keep_mask(keys, 30)
    assert m1 == m2
    frac = sum(m1) / len(m1)
    assert 0.25 < frac < 0.35
    assert sum(md5_keep_mask(keys, 100)) == len(keys)
    assert sum(md5_keep_mask(keys, 0)) == 0


def test_spearman():
    assert abs(spearman([1, 2, 3, 4], [10, 20, 30, 40]) - 1.0) < 1e-9
    assert abs(spearman([1, 2, 3, 4], [40, 30, 20, 10]) + 1.0) < 1e-9
    # ties averaged
    v = spearman([1, 2, 2, 3], [1, 2, 3, 4])
    assert 0.9 < v < 1.0


def test_prune_low_freq_golden():
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.phrasemine import prune_low_freq
    docs = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                         "text": ["a a b", "a c", "c d"]})
    # freqs: a=3, b=1, c=2, d=1; min_freq=1 → keep freq>1: a, c
    out = prune_low_freq(rd.from_pandas(docs), min_freq=1).to_pandas()
    got = dict(zip(out.doc_id, out.n_kept))
    assert got == {0: 2, 1: 2, 2: 1}


def test_read_text_and_jsonl(tmp_path):
    import json
    import ray.data as rd
    from deepkg_ray.sources.readers import read_jsonl, read_text_corpus
    txt = tmp_path / "corpus.txt"
    txt.write_text("line one\nline two\nline three\n")
    ds = read_text_corpus(str(txt))
    assert ds.count() == 3
    assert sorted(r["text"] for r in ds.take(3))[0] == "line one"
    jl = tmp_path / "rows.jsonl"
    with open(jl, "w") as f:
        for i in range(4):
            f.write(json.dumps({"text": f"t{i}", "entities": [
                {"start_idx": 0, "end_idx": 1, "type": "X", "entity": "t"}]}) + "\n")
    ds2 = read_jsonl(str(jl))
    rows = ds2.take(4)
    assert len(rows) == 4 and rows[0]["entities"][0]["type"] == "X"


def test_uie_path_equals_direct_path(sf_dir):
    from deepkg_ray.pipelines import kg
    from deepkg_ray.pipelines.uie import triples_via_sel
    cols = ["conv_id", "turn_idx", "pred", "subj_text", "subj_type",
            "obj_text", "obj_type"]
    direct = kg.surface_triples_dataset(sf_dir).select_columns(cols).to_pandas()
    via_sel = triples_via_sel(sf_dir).select_columns(cols).to_pandas()
    a = sorted(map(tuple, direct.itertuples(index=False)))
    b = sorted(map(tuple, via_sel.itertuples(index=False)))
    assert a == b


def test_encoder_stage_and_pair_export(tmp_path):
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.linking import encode_texts, export_training_pairs
    ds = rd.from_pandas(pd.DataFrame({"text": ["abc def", "abc def", "xyz"]}))
    out = encode_texts(ds, dim=64).to_pandas()
    import numpy as np
    m = np.stack(out["embedding"].to_numpy())
    assert m.shape == (3, 64)
    # unit-norm + deterministic: identical texts → identical vectors
    assert np.allclose(np.linalg.norm(m, axis=1), 1.0)
    assert np.allclose(m[0], m[1])
    t = pa.table({"text1": ["a", "b"], "text2": ["c", "d"],
                  "label": pa.array([1, 0], pa.int32())})
    p = export_training_pairs(t, str(tmp_path / "pairs.tsv"))
    lines = open(p).read().strip().split("\n")
    assert len(lines) == 2 and all("\t" in ln for ln in lines)


def test_phrase_quality_scores():
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.phrasemine import phrase_quality_scores
    docs = pd.DataFrame({"text": ["big data engine", "big data rocks",
                                  "small data engine", "big data wins"]})
    out = phrase_quality_scores(rd.from_pandas(docs), topk=5, min_count=2)
    assert "big data" in set(out["phrase"])
    assert (out["quality"].diff().dropna() <= 1e-9).all()   # sorted desc


def test_config_registry_pipeline(sf_dir, synth_dir):
    import os
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.config import STAGE_REGISTRY, build_pipeline, register_stage
    ds = rd.read_parquet(synth.transcripts_path(sf_dir),
                         columns=["conv_id", "turn_idx", "text"])
    spec = [{"stage": "normalize"},
            {"stage": "triples", "params": {"dictionary_path": "$dict"}},
            {"stage": "link", "params": {"dictionary_path": "$dict"}},
            {"stage": "adjacency"}]
    out = build_pipeline(ds, spec,
                         context={"dict": synth.dictionary_path(sf_dir)})
    import pyarrow.parquet as pq
    gold = pq.read_metadata(os.path.join(synth_dir, "triples_gold.parquet")).num_rows
    df = out.to_pandas()
    assert int(df["weight"].sum()) == gold

    @register_stage("noop_test")
    def _noop(ds):
        return ds
    assert "noop_test" in STAGE_REGISTRY


def test_asof_and_range_join_golden(tmp_path):
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.asof import asof_join_events_orders, range_join_counts
    base = 1_700_000_000_000_000
    day = 86_400 * 1_000_000
    orders = pd.DataFrame({
        "o_orderkey": [10, 11, 12], "o_custkey": [1, 1, 2],
        "o_orderdate": pd.to_datetime([base, base + 5 * day, base], unit="us"),
    })
    opath = str(tmp_path / "orders.parquet")
    pa.parquet.write_table(pa.Table.from_pandas(orders), opath)
    events = pd.DataFrame({
        "event_id": [0, 1, 2, 3],
        "user_id": [1, 1, 2, 3],
        "ts": pd.to_datetime([base - day,          # before any order → -1
                              base + 6 * day,      # after both → key 11
                              base + day,          # user 2 → key 12
                              base], unit="us"),   # user 3: no orders → -1
    })
    ds = rd.from_pandas(events)
    out = asof_join_events_orders(ds, opath).to_pandas().set_index("event_id")
    assert out.loc[0, "asof_orderkey"] == -1
    assert out.loc[1, "asof_orderkey"] == 11
    assert out.loc[2, "asof_orderkey"] == 12
    assert out.loc[3, "asof_orderkey"] == -1
    rng = range_join_counts(ds, opath, window_days=2).to_pandas().set_index("event_id")
    assert rng.loc[0, "n_orders_in_window"] == 1    # base within 2d of base-1d
    assert rng.loc[1, "n_orders_in_window"] == 1    # base+5d within 2d of base+6d
    assert rng.loc[2, "n_orders_in_window"] == 1
    assert rng.loc[3, "n_orders_in_window"] == 0


def test_hll_accuracy():
    import numpy as np
    from deepkg_ray.stages.sketches import HLL, _hash64
    h = HLL(p=12)
    keys = [f"key-{i}" for i in range(50_000)]
    h.add_hashes(_hash64(keys))
    est = h.estimate()
    assert abs(est - 50_000) / 50_000 < 0.05      # ~1.04/sqrt(4096) ≈ 1.6%
    # mergeable: two halves merged == whole
    h1, h2 = HLL(12), HLL(12)
    h1.add_hashes(_hash64(keys[:25_000]))
    h2.add_hashes(_hash64(keys[25_000:]))
    h1.merge(h2)
    assert np.array_equal(h1.registers, h.registers)
    # serialization round-trip
    assert HLL.deserialize(h.serialize()).estimate() == est


def test_bloom_no_false_negatives():
    from deepkg_ray.stages.sketches import BloomFilter
    members = [f"m{i}" for i in range(2000)]
    bf = BloomFilter()
    bf.add(members)
    assert bf.might_contain(members).all()        # zero false negatives
    others = [f"x{i}" for i in range(2000)]
    fp = bf.might_contain(others).mean()
    assert fp < 0.05                              # 64Kib/2k keys, k=4


def test_spread_small_and_state_cache(tmp_path):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray import util

    # parquet-backed few-file table with real bytes → repartitioned up to
    # ~2x cores
    pa.parquet.write_table(pa.table({"x": ["y" * 200] * 60000}),
                           str(tmp_path / "t.parquet"))
    ds = rd.read_parquet(str(tmp_path / "t.parquet"))
    out = util.spread_small(ds, target=6)
    assert out.materialize().num_blocks() == 6
    # tiny tables are NOT worth the repartition barrier (size-gated)
    pa.parquet.write_table(pa.table({"x": list(range(100))}),
                           str(tmp_path / "small.parquet"))
    tiny = rd.read_parquet(str(tmp_path / "small.parquet"))
    assert util.spread_small(tiny, target=6) is tiny
    # in-memory datasets (unknown file backing) are left untouched
    ds2 = rd.from_pandas(pd.DataFrame({"x": [1, 2]}))
    assert util.spread_small(ds2, target=6) is ds2

    # bounded per-worker instance cache: FIFO eviction, digest keys for
    # non-hashable ctor args
    util._STATE_CACHE.clear()
    import numpy as np

    class K:
        def __init__(self, m):
            self.m = m

    a = util._cached_instance(K, {"m": np.array([1.0])})
    assert util._cached_instance(K, {"m": np.array([1.0])}) is a   # hit
    for i in range(util._STATE_CACHE_MAX):
        util._cached_instance(K, {"m": np.array([float(i + 2)])})
    assert util._cached_instance(K, {"m": np.array([1.0])}) is not a  # evicted
    util._STATE_CACHE.clear()


def test_drop_empty_blocks_strips_groupby_empties():
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min
    from deepkg_ray import util

    agg = (rd.from_items([{"node": 1, "dist": 0}, {"node": 2, "dist": 1}])
           .groupby("node").aggregate(Min("dist", alias_name="dist"))
           .materialize())
    raw = [ray.get(ref).num_columns
           for bundle in agg.iter_internal_ref_bundles()
           for ref, _ in bundle.blocks]
    assert 0 in raw                        # the hazard this util exists for
    clean = util.drop_empty_blocks(agg)
    for bundle in clean.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            assert meta.num_rows > 0
    assert sorted(map(tuple, clean.to_pandas().itertuples(index=False))) \
        == [(1, 0), (2, 1)]
    # all-empty datasets come back unchanged (caller guards that case)
    empty = rd.from_items([{"x": 1}]).filter(lambda r: False).materialize()
    assert util.drop_empty_blocks(empty) is empty


def test_encoder_numpy_model_tier(ray_session):
    """Real matmul encoder forward (seeded-random MLP over hashed BoW)
    through the actor pool: unit-norm, deterministic, and distinct from
    the hashing tier (proves the matmuls actually ran)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.linking import EncoderStage
    df = pd.DataFrame({"text": ["abc def", "abc def", "xyz", ""]})

    def run():
        return (rd.from_pandas(df).map_batches(
            EncoderStage,
            fn_constructor_kwargs={"dim": 64, "model_tier": "numpy"},
            batch_format="pyarrow", batch_size=2,
            concurrency=(1, 2)).to_pandas())

    a, b = run(), run()
    ma = np.stack(a["embedding"].to_numpy())
    mb = np.stack(b["embedding"].to_numpy())
    assert np.array_equal(ma, mb)
    assert np.allclose(np.linalg.norm(ma[:3], axis=1), 1.0, atol=1e-5)
    assert np.allclose(ma[0], ma[1])
    hash_tier = (rd.from_pandas(df).map_batches(
        EncoderStage, fn_constructor_kwargs={"dim": 64},
        batch_format="pyarrow", concurrency=1).to_pandas())
    mh = np.stack(hash_tier["embedding"].to_numpy())
    assert not np.allclose(ma[0], mh[0])


def test_shipping_priority_sql_parity(sf_dir):
    import duckdb
    import numpy as np
    from deepkg_ray import oracle
    from deepkg_ray.pipelines.relational import shipping_priority
    eng = (shipping_priority(sf_dir).to_pandas()
           .sort_values("l_orderkey").reset_index(drop=True))
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    ora = (con.execute(oracle.shipping_priority_oracle()).df()
           .sort_values("l_orderkey").reset_index(drop=True))
    assert len(eng) == len(ora) > 0
    assert eng["l_orderkey"].tolist() == ora["l_orderkey"].tolist()
    assert np.isclose(eng["revenue"].to_numpy(),
                      ora["revenue"].to_numpy()).all()
    assert (eng["o_orderdate_us"].to_numpy()
            == ora["o_orderdate_us"].to_numpy()).all()
    assert eng["o_orderpriority"].tolist() == ora["o_orderpriority"].tolist()


def test_order_priority_counts_sql_parity(sf_dir):
    """TPC-H Q4 shape: engine's max-shipdate semi-join rewrite equals the
    EXISTS correlated subquery."""
    import duckdb
    from deepkg_ray import oracle
    from deepkg_ray.pipelines.relational import order_priority_counts
    eng = (order_priority_counts(sf_dir).to_pandas()
           .sort_values("o_orderpriority").reset_index(drop=True))
    con = duckdb.connect()
    for t in ["orders", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    ora = (con.execute(oracle.order_priority_counts_oracle()).df()
           .sort_values("o_orderpriority").reset_index(drop=True))
    assert len(eng) == len(ora) > 0
    assert eng["o_orderpriority"].tolist() == ora["o_orderpriority"].tolist()
    assert eng["order_count"].tolist() == ora["order_count"].tolist()


def test_promo_revenue_sql_parity(sf_dir):
    """TPC-H Q14 shape: micros-exact conditional aggregation over the
    part join matches SQL to the shared 6-dp contract."""
    import duckdb
    from deepkg_ray import oracle
    from deepkg_ray.pipelines.relational import promo_revenue
    eng = promo_revenue(sf_dir).to_pandas()
    con = duckdb.connect()
    for t in ["lineitem", "part"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    ora = con.execute(oracle.promo_revenue_oracle()).df()
    assert len(eng) == 1
    v_e, v_o = float(eng["promo_revenue"][0]), float(ora["promo_revenue"][0])
    assert 0.0 < v_e < 100.0
    assert round(v_e, 6) == round(v_o, 6)


def test_large_volume_customers_sql_parity(sf_dir):
    """TPC-H Q18 shape: HAVING-driven semi-join survivors and deterministic
    top-k match SQL exactly."""
    import duckdb
    import numpy as np
    from deepkg_ray import oracle
    from deepkg_ray.pipelines.relational import large_volume_customers
    eng = (large_volume_customers(sf_dir).to_pandas()
           .sort_values("o_orderkey").reset_index(drop=True))
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    ora = (con.execute(oracle.large_volume_customers_oracle()).df()
           .sort_values("o_orderkey").reset_index(drop=True))
    assert len(eng) == len(ora) > 0
    assert eng["o_orderkey"].tolist() == ora["o_orderkey"].tolist()
    assert eng["c_name"].tolist() == ora["c_name"].tolist()
    assert np.isclose(eng["o_totalprice"].to_numpy(),
                      ora["o_totalprice"].to_numpy()).all()
    assert np.isclose(eng["sum_qty"].to_numpy(),
                      ora["sum_qty"].to_numpy()).all()
    # every survivor really exceeds the threshold
    assert (eng["sum_qty"] > 300.0).all()


def test_cheapest_supplier_sql_parity(sf_dir):
    """TPC-H Q2 shape: the argmin-with-ties merge tree equals the
    correlated MIN subquery, including the Q2 ordering and limit."""
    import duckdb
    from deepkg_ray import oracle
    from deepkg_ray.pipelines.relational import cheapest_supplier_per_part
    eng = cheapest_supplier_per_part(sf_dir).to_pandas() \
        .reset_index(drop=True)
    con = duckdb.connect()
    for t in ["part", "supplier", "nation", "region", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    ora = con.execute(
        oracle.cheapest_supplier_per_part_oracle()).df()
    assert len(eng) == len(ora) > 0
    for c in ["s_name", "n_name", "p_partkey", "p_brand"]:
        assert eng[c].tolist() == ora[c].tolist()
    assert np.isclose(eng["s_acctbal"], ora["s_acctbal"]).all()
    assert np.isclose(eng["cost"], ora["cost"]).all()
    # every part keeps ALL suppliers tying its minimum (Q2 semantics)
    assert eng.duplicated(["p_partkey", "s_name"]).sum() == 0
