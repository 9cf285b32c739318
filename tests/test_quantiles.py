"""Exact distributed quantiles: histogram method vs DuckDB quantile_disc."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from deepkg_ray.stages.quantiles import (add_token_count, quantiles_disc,
                                         value_counts)


def test_value_counts_match_numpy():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 40, 5000).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"v": x}))
    got = (value_counts(ds, "v").to_pandas()
           .sort_values("value").reset_index(drop=True))
    vals, cnts = np.unique(x, return_counts=True)
    assert (got["value"].to_numpy() == vals).all()
    assert (got["n"].to_numpy() == cnts).all()


def test_quantiles_match_duckdb_on_random_ints():
    rng = np.random.default_rng(9)
    for n in (1, 7, 1000, 4096):
        x = rng.integers(0, 300, n).astype(np.int64)
        ds = rd.from_pandas(pd.DataFrame({"v": x}))
        qs = [0.0, 0.1, 0.25, 0.5, 0.7, 0.75, 0.9, 0.99, 1.0]
        got = quantiles_disc(ds, "v", qs).to_pandas()
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"v": x}))
        for q, v in zip(got["q"], got["value"]):
            want = con.sql(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
            assert v == want, (n, q, v, want)


def test_add_token_count_blank_and_whitespace():
    import pyarrow as pa
    b = pa.table({"text": ["a b  c", "", "   ", "single"]})
    out = add_token_count(b)["n_tokens"].to_pylist()
    assert out == [3, 0, 0, 1]


def test_grouped_quantiles_match_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from deepkg_ray.stages.quantiles import grouped_quantiles_disc
    rng = np.random.default_rng(13)
    df = pd.DataFrame({"grp": rng.choice(["a", "b", "c"], size=500),
                       "x": rng.integers(0, 40, size=500).astype(np.int64)})
    qs = [0.1, 0.5, 0.9]
    got = (grouped_quantiles_disc(rd.from_pandas(df), "grp", "x", qs)
           .to_pandas().sort_values(["grp", "q"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "WITH g AS (SELECT grp, quantile_disc(x, [0.1,0.5,0.9]) ql "
        "FROM t GROUP BY grp) "
        "SELECT grp, unnest([0.1,0.5,0.9]) q, "
        "CAST(unnest(ql) AS BIGINT) AS value FROM g ORDER BY grp, q").df()
    pd.testing.assert_frame_equal(
        got.rename(columns={"grp": "grp"}), want, check_dtype=False)


def test_key_skew_stats_golden():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.quantiles import key_skew_stats
    # 10 keys with 1 row, one hot key with 90 rows
    keys = [f"k{i}" for i in range(10)] + ["hot"] * 90
    out = key_skew_stats(rd.from_pandas(pd.DataFrame({"k": keys}))
                         .repartition(4), "k").to_pandas().iloc[0]
    assert (out["n_keys"], out["n_rows"], out["max_cnt"]) == (11, 100, 90)
    assert out["p50"] == 1 and out["p99"] == 90
    assert out["top_share"] == 0.9


def test_quantiles_cont_matches_numpy_type7():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.quantiles import quantiles_cont
    vals = np.array([1, 1, 2, 5, 9, 9, 10, 40], np.int64)
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    out = (quantiles_cont(rd.from_pandas(pd.DataFrame({"v": vals})), "v", qs)
           .to_pandas())
    ref = np.quantile(vals, qs)               # numpy default = type-7
    assert out["q"].tolist() == qs
    assert np.allclose(out["value"].to_numpy(), ref, atol=2e-6)


def test_grouped_quantiles_cont_matches_numpy_per_group():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.quantiles import grouped_quantiles_cont
    rng = {"a": np.array([1.0, 2.0, 3.5, 10.0]),
           "b": np.array([5.0, 5.0, 7.25])}
    df = pd.DataFrame({
        "g": np.repeat(list(rng), [len(v) for v in rng.values()]),
        "v": np.concatenate(list(rng.values()))})
    qs = [0.25, 0.5, 0.75]
    out = (grouped_quantiles_cont(rd.from_pandas(df), "g", "v", qs)
           .to_pandas().sort_values(["g", "q"]).reset_index(drop=True))
    for g, vals in rng.items():
        got = out[out["g"] == g]["value"].to_numpy()
        assert np.allclose(got, np.quantile(vals, qs), atol=2e-6), g


def test_grouped_iqr_outliers_golden():
    """19 uniform values + one far spike per group: exactly the spike is
    fenced out; a tight group with no spike emits nothing."""
    import pandas as pd
    import ray.data as rd
    from deepkg_ray.stages.quantiles import grouped_iqr_outliers
    vals_a = [float(i) for i in range(1, 20)] + [1000.0]
    vals_b = [5.0, 5.5, 6.0, 6.5, 7.0]
    df = pd.DataFrame({
        "event_id": list(range(25)),
        "event_type": ["a"] * 20 + ["b"] * 5,
        "value": vals_a + vals_b})
    out = grouped_iqr_outliers(rd.from_pandas(df)).to_pandas()
    assert out["event_id"].tolist() == [19]
    assert out["value"].tolist() == [1000.0]


def test_grouped_geometric_mean_golden(ray_session):
    """gmean of {1, e^2} is e; negatives excluded."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.quantiles import grouped_geometric_mean
    t = pa.table({
        "event_type": pa.array(["a", "a", "a"], pa.string()),
        "value": pa.array([1.0, math.exp(2.0), -5.0], pa.float64())})
    out = grouped_geometric_mean(rd.from_arrow(t)).to_pandas()
    assert out["n"].iloc[0] == 2
    assert abs(out["gmean"].iloc[0] - math.e) < 1e-4


def test_events_emd_golden(ray_session):
    """Point masses at 0 and d have EMD d; identical distributions 0."""
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.quantiles import events_emd_1d
    t = pa.table({
        "event_type": pa.array(["a", "a", "b", "b"], pa.string()),
        "value": pa.array([0.0, 0.0, 2.5, 2.5], pa.float64())})
    out = events_emd_1d(rd.from_arrow(t)).to_pandas()
    assert out["emd"].iloc[0] == 2.5
    t2 = pa.table({
        "event_type": pa.array(["a", "a", "b", "b"], pa.string()),
        "value": pa.array([1.0, 3.0, 1.0, 3.0], pa.float64())})
    out2 = events_emd_1d(rd.from_arrow(t2)).to_pandas()
    assert out2["emd"].iloc[0] == 0.0


def test_benford_digits_golden(ray_session):
    """Digit extraction is magnitude-invariant; shares sum to 1."""
    import pyarrow as pa
    import ray.data as rd
    from deepkg_ray.stages.quantiles import benford_digits
    t = pa.table({"value": pa.array(
        [1.0, 0.019, 123.0, 9000.5, 0.0002, -5.0], pa.float64())})
    out = benford_digits(rd.from_arrow(t)).to_pandas() \
        .set_index("digit")
    # digits: 1 (1.0), 1 (0.019), 1 (123.0), 9 (9000.5), 2 (0.0002);
    # -5 excluded
    assert out.loc[1, "n"] == 3 and out.loc[9, "n"] == 1
    assert out.loc[2, "n"] == 1
    assert abs(out["share"].sum() - 1.0) < 1e-5
