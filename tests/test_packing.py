

def test_conv_weighted_sample_deterministic_and_weighted(ray_session):
    """Same input twice -> identical sample; a conversation with 100x
    the tokens of every other conv is (near-)surely included."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from deepkg_ray.stages.packing import conv_weighted_sample
    rows = []
    for c in range(40):
        rows.append((f"conv{c:03d}", "a b c"))
    rows.append(("convBIG", " ".join(["tok"] * 300)))
    df = pd.DataFrame(rows, columns=["conv_id", "text"])
    a = conv_weighted_sample(rd.from_pandas(df), k=10).to_pandas()
    b = conv_weighted_sample(rd.from_pandas(df).repartition(7),
                             k=10).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("rank").reset_index(drop=True),
        b.sort_values("rank").reset_index(drop=True))
    assert len(a) == 10
    assert "convBIG" in set(a["conv_id"])
    assert a.loc[a["conv_id"] == "convBIG", "n_tokens"].item() == 300
