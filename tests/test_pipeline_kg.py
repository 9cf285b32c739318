"""End-to-end KG pipeline on Ray: golden P/R and canonicalization checks."""

import os

import pyarrow.parquet as pq

from deepkg_ray.pipelines import kg


def test_linked_triples_match_gold(sf_dir, synth_dir):
    lt = kg.linked_triples_dataset(sf_dir).to_pandas()
    gold = pq.read_table(os.path.join(synth_dir, "triples_gold.parquet")).to_pandas()
    cols = ["conv_id", "turn_idx", "pred", "subj_id", "obj_id"]
    a = set(map(tuple, lt[cols].itertuples(index=False)))
    b = set(map(tuple, gold[cols].itertuples(index=False)))
    # north-star gate is P/R ≥ 0.95; the deterministic tier is exact
    assert a == b
    # alias surfaces resolved to canonical ids
    assert (lt["subj_id"] >= 0).all() and (lt["obj_id"] >= 0).all()


def test_adjacency_weights_sum_to_extractions(sf_dir, synth_dir):
    adj = kg.adjacency_dataset(sf_dir).to_pandas()
    gold = pq.read_table(os.path.join(synth_dir, "triples_gold.parquet")).to_pandas()
    assert int(adj["weight"].sum()) == len(gold)
    # canonical dedup: keys unique
    assert not adj.duplicated(["subj_id", "pred", "obj_id"]).any()
    # canonicalization collapses alias variants: distinct canonical keys
    gold_keys = set(map(tuple, gold[["subj_id", "pred", "obj_id"]].itertuples(index=False)))
    assert len(adj) == len(gold_keys)
    # provenance exemplar is a real (conv:turn) of that edge
    row = adj.iloc[0]
    conv, turn = row["src"].split(":")
    sub = gold[(gold.conv_id == conv) & (gold.turn_idx == int(turn))]
    assert ((sub.subj_id == row.subj_id) & (sub.obj_id == row.obj_id)
            & (sub.pred == row["pred"])).any()


def test_mentions_dataset_counts(sf_dir, synth_dir):
    n = kg.mentions_dataset(sf_dir).count()
    gold = pq.read_metadata(os.path.join(synth_dir, "mentions_gold.parquet")).num_rows
    assert n == gold


def test_events_match_gold(sf_dir, synth_dir):
    import ray.data as rd
    from deepkg_ray import synth
    from deepkg_ray.pipelines.kg import transcripts_with_norm
    from deepkg_ray.stages.events import extract_events
    ev = extract_events(transcripts_with_norm(sf_dir),
                        synth.dictionary_path(sf_dir)).to_pandas()
    gold = pq.read_table(os.path.join(synth_dir, "events_gold.parquet")).to_pandas()
    cols = ["conv_id", "turn_idx", "event_type", "trigger_start",
            "place_text", "place_id", "actor_text", "actor_id"]
    assert sorted(map(tuple, ev[cols].itertuples(index=False))) == \
        sorted(map(tuple, gold[cols].itertuples(index=False)))


def test_aggregate_modes_equivalent(sf_dir):
    """tree-merge, sort-shuffle, and no-dictionary (legacy) aggregation
    paths produce identical adjacency."""
    from deepkg_ray import synth
    from deepkg_ray.stages.canonical import aggregate_adjacency
    dict_path = synth.dictionary_path(sf_dir)
    linked = kg.linked_triples_dataset(sf_dir)
    cols = ["subj_id", "pred", "obj_id", "weight", "src",
            "subj_name", "subj_type", "obj_name", "obj_type"]

    def canon(ds):
        df = ds.to_pandas()[cols]
        return df.sort_values(cols[:3]).reset_index(drop=True)

    tree = canon(aggregate_adjacency(kg.linked_triples_dataset(sf_dir),
                                     mode="tree", dictionary_path=dict_path))
    shuf = canon(aggregate_adjacency(kg.linked_triples_dataset(sf_dir),
                                     mode="shuffle", dictionary_path=dict_path))
    legacy = canon(aggregate_adjacency(kg.linked_triples_dataset(sf_dir)))
    import pandas as pd
    pd.testing.assert_frame_equal(tree, shuf, check_dtype=False)
    pd.testing.assert_frame_equal(tree, legacy, check_dtype=False)


def test_auto_mode_routes_by_cardinality(ray_session):
    """VERDICT round-1: key cardinality must pick tree vs shuffle, not the
    caller.  Low-cardinality partials stay on the tree; high-cardinality
    ones route to the Ray groupby — and both produce the exact merge."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.treeagg import merge_partials

    # high cardinality: every row its own key
    n = 5000
    hi = pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                       "v": np.ones(n, dtype=np.int64)})
    dec = {}
    out = merge_partials(rd.from_pandas(hi), ["k"], {"v": "sum"},
                         mode="auto", max_final_rows=1000,
                         decision_out=dec).to_pandas()
    assert dec["mode"] == "shuffle" and dec["est_rows"] > 1000
    assert len(out) == n and (out["v"] == 1).all()

    # low cardinality: 3 keys
    lo = pd.DataFrame({"k": np.arange(n, dtype=np.int64) % 3,
                       "v": np.ones(n, dtype=np.int64)})
    dec = {}
    out = merge_partials(rd.from_pandas(lo), ["k"], {"v": "sum"},
                         mode="auto", max_final_rows=1000,
                         decision_out=dec).to_pandas()
    assert dec["mode"] == "tree" and dec["est_rows"] <= 24
    assert sorted(out["v"]) == sorted([(n + 2) // 3, (n + 1) // 3, n // 3])


def test_linked_triples_tasks_and_actors_paths_agree(sf_dir):
    """The fused extract+link stage must produce identical rows whether it
    runs as the worker-cached task pool (default) or an explicit actor
    pool (DEEPKG_STRATEGY=actors / GPU-tier shape)."""
    import pandas as pd
    from deepkg_ray import synth
    from deepkg_ray.pipelines.kg import transcripts_with_norm
    from deepkg_ray.stages.relation import (extract_linked_triples,
                                            extract_linked_triples_tasks)

    dict_path = synth.dictionary_path(sf_dir)
    cols = ["conv_id", "turn_idx", "pred", "subj_id", "obj_id", "subj_start"]
    tasks = (extract_linked_triples_tasks(transcripts_with_norm(sf_dir),
                                          dict_path)
             .to_pandas()[cols].sort_values(cols).reset_index(drop=True))
    actors = (extract_linked_triples(transcripts_with_norm(sf_dir), dict_path,
                                     concurrency=(1, 2))
              .to_pandas()[cols].sort_values(cols).reset_index(drop=True))
    assert len(tasks) > 100
    pd.testing.assert_frame_equal(tasks, actors)


def test_incremental_update_equals_full_rebuild(ray_session):
    import glob

    import pandas as pd
    from deepkg_ray import synth
    from deepkg_ray.pipelines import kg
    sf = "/root/testdata/sf0.01"   # sf0.001 synthesizes a single file
    files = sorted(glob.glob(f"{synth.transcripts_path(sf)}/*.parquet"))
    assert len(files) >= 2, files
    half = len(files) // 2
    base = kg.adjacency_dataset_for_files(sf, files[:half])
    delta = kg.adjacency_dataset_for_files(sf, files[half:])
    inc = (kg.update_adjacency(base, delta).to_pandas()
           .sort_values(["subj_id", "pred", "obj_id"])
           .reset_index(drop=True))
    full = (kg.adjacency_dataset(sf).to_pandas()
            .sort_values(["subj_id", "pred", "obj_id"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(inc[sorted(inc.columns)],
                                  full[sorted(full.columns)],
                                  check_dtype=False)


def test_entity_lifespan_matches_rederivation(sf_dir, synth_dir):
    """The fused detect+collapse lifespan plan (mention rows never leave the
    task) equals a naive driver re-derivation: mentions_gold joined to the
    transcript ts, grouped by (entity, day) then entity."""
    import numpy as np
    import pandas as pd
    from deepkg_ray import synth

    got = (kg.entity_lifespan_dataset(sf_dir).to_pandas()
           .sort_values("entity_id").reset_index(drop=True))

    men = pq.read_table(os.path.join(synth_dir, "mentions_gold.parquet"),
                        columns=["conv_id", "turn_idx", "entity_id"]).to_pandas()
    tr = pq.read_table(synth.transcripts_path(sf_dir),
                       columns=["conv_id", "turn_idx", "ts"]).to_pandas()
    tr["ts_us"] = tr["ts"].astype("datetime64[us]").astype("int64")
    j = men.merge(tr[["conv_id", "turn_idx", "ts_us"]],
                  on=["conv_id", "turn_idx"], how="left")
    j["bucket"] = j["ts_us"].to_numpy(np.int64) // 60_000_000
    per_bucket = (j.groupby(["entity_id", "bucket"])["ts_us"]
                  .agg(n="size", first_us="min", last_us="max").reset_index())
    exp = (per_bucket.groupby("entity_id")
           .agg(n_mentions=("n", "sum"), first_us=("first_us", "min"),
                last_us=("last_us", "max"),
                n_active_buckets=("bucket", "size"))
           .reset_index().sort_values("entity_id").reset_index(drop=True))
    assert got["n_active_buckets"].max() > 1       # bucket dimension is real
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)],
        check_dtype=False)


def test_decayed_adjacency_consistent_with_adjacency(sf_dir):
    """The decay table's n equals the adjacency weight per edge, and
    weights obey 0 < w_micros <= n * 1e6 (each extraction contributes at
    most exp(0)=1)."""
    import pandas as pd
    dec = kg.decayed_adjacency_dataset(sf_dir).to_pandas()
    adj = kg.adjacency_dataset(sf_dir).to_pandas()
    keys = ["subj_id", "pred", "obj_id"]
    m = dec.merge(adj[keys + ["weight"]], on=keys, how="outer",
                  indicator=True)
    assert (m["_merge"] == "both").all()
    assert (m["n"] == m["weight"]).all()
    assert (m["w_micros"] > 0).all()
    assert (m["w_micros"] <= m["n"] * 1_000_000).all()


def test_entity_burst_shares_bounds(sf_dir):
    """peak_share in (0, 1]; peak <= total; totals equal the lifespan
    mention totals."""
    b = kg.entity_burst_dataset(sf_dir).to_pandas()
    ls = kg.entity_lifespan_dataset(sf_dir).to_pandas()
    assert (b["peak_share"] > 0).all() and (b["peak_share"] <= 1).all()
    assert (b["peak_n"] <= b["total_n"]).all()
    m = b.merge(ls[["entity_id", "n_mentions"]], on="entity_id")
    assert len(m) == len(b) and (m["total_n"] == m["n_mentions"]).all()


def test_conv_profile_totals(sf_dir, synth_dir):
    """Column totals tie to the gold mention/triple tables; every conv
    from the transcripts appears."""
    prof = kg.conv_profile_dataset(sf_dir).to_pandas()
    men = pq.read_table(os.path.join(synth_dir, "mentions_gold.parquet"))
    tri = pq.read_table(os.path.join(synth_dir, "triples_gold.parquet"))
    assert prof["n_mentions"].sum() == men.num_rows
    assert prof["n_triples"].sum() == tri.num_rows
    assert (prof["n_entities"] <= prof["n_mentions"]).all()
    from deepkg_ray import synth
    n_convs = pq.read_table(synth.transcripts_path(sf_dir),
                            columns=["conv_id"])
    import pyarrow.compute as pc
    assert len(prof) == len(pc.unique(n_convs["conv_id"]))


def test_entity_transitions_rederivation(sf_dir, synth_dir):
    """Partitioned self-merge equals a driver rederivation from the gold
    mentions."""
    import pandas as pd
    from deepkg_ray.stages.mention import entity_transitions
    got = (entity_transitions(kg.mentions_dataset(sf_dir))
           .to_pandas().sort_values(["e1", "e2"]).reset_index(drop=True))
    men = pq.read_table(os.path.join(synth_dir, "mentions_gold.parquet"),
                        columns=["conv_id", "turn_idx", "entity_id"]) \
        .to_pandas().drop_duplicates()
    nxt = men.assign(turn_idx=men["turn_idx"] - 1)
    m = men.merge(nxt, on=["conv_id", "turn_idx"], suffixes=("_1", "_2"))
    exp = (m.groupby(["entity_id_1", "entity_id_2"], as_index=False)
           .size().rename(columns={"entity_id_1": "e1",
                                   "entity_id_2": "e2", "size": "n"})
           .sort_values(["e1", "e2"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_alias_usage_and_edge_provenance_consistency(sf_dir, synth_dir):
    """Alias shares sum to 1 per entity; provenance never exceeds the
    adjacency weight and is >= 1."""
    from deepkg_ray.stages.canonical import edge_provenance
    from deepkg_ray.stages.mention import alias_usage
    au = alias_usage(kg.mentions_dataset(sf_dir)).to_pandas()
    sums = au.groupby("entity_id")["share"].sum()
    assert ((sums - 1.0).abs() < 1e-4).all()
    assert au["n"].sum() == pq.read_metadata(
        os.path.join(synth_dir, "mentions_gold.parquet")).num_rows

    prov = edge_provenance(kg.linked_triples_dataset(sf_dir)).to_pandas()
    adj = kg.adjacency_dataset(sf_dir).to_pandas()
    keys = ["subj_id", "pred", "obj_id"]
    m = prov.merge(adj[keys + ["weight"]], on=keys)
    assert len(m) == len(prov) == len(adj)
    assert (m["n_convs"] >= 1).all()
    assert (m["n_convs"] <= m["weight"]).all()


def test_mention_gini_goldens(ray_session):
    """Equal counts -> Gini 0; extreme concentration -> near (n-1)/n."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.mention import mention_concentration_gini

    def mk(counts, typ):
        rows = []
        for eid, c in enumerate(counts):
            rows += [(typ, eid)] * c
        return rows

    rows = mk([5, 5, 5, 5], "EQ") + mk([1, 1, 1, 97], "SKEW")
    ds = rd.from_arrow(pa.table({
        "type": pa.array([r[0] for r in rows], pa.string()),
        "entity_id": pa.array([r[1] for r in rows], pa.int64())}))
    out = mention_concentration_gini(ds).to_pandas().set_index("type")
    assert out.loc["EQ", "gini"] == 0.0
    assert out.loc["SKEW", "gini"] > 0.65


def test_conv_entity_entropy_goldens(ray_session):
    """Single-entity conv -> 0; uniform two-entity conv -> ln 2."""
    import math

    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.mention import conv_entity_entropy
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array(["c1", "c1", "c2", "c2"], pa.string()),
        "entity_id": pa.array([7, 7, 1, 2], pa.int64())}))
    out = conv_entity_entropy(ds).to_pandas().set_index("conv_id")
    assert out.loc["c1", "entropy"] == 0.0
    assert abs(out.loc["c2", "entropy"] - math.log(2)) < 1e-5
    assert out.loc["c2", "n_entities"] == 2
