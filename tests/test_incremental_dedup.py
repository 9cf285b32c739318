import numpy as np
import pandas as pd
import ray.data as rd

from deepkg_ray.stages import dedup


def test_incremental_minhash_equals_full(ray_session):
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(15)]
    def mk(n, offset):
        base = [" ".join(rng.choice(vocab, size=12)) for _ in range(n)]
        # inject near-dups within and across partitions
        texts = base + [t + " w0" for t in base[:4]]
        return pd.DataFrame({
            "doc_id": np.arange(offset, offset + len(texts), dtype=np.int64),
            "text": texts})
    old = mk(12, 0)
    new = pd.concat([mk(10, 1000),
                     old.head(3).assign(doc_id=lambda d: d.doc_id + 2000)],
                    ignore_index=True)   # exact cross-partition dups
    both = pd.concat([old, new], ignore_index=True)

    def canon(raw):
        df = dedup.dedup_pair_rows(raw, a_col="doc_a", b_col="doc_b") \
            .to_pandas()
        return set(map(tuple, df[["doc_a", "doc_b"]].itertuples(index=False)))

    full = canon(dedup.minhash_raw_pairs(rd.from_pandas(both)))
    old_pairs = canon(dedup.minhash_raw_pairs(rd.from_pandas(old)))
    bands_old = dedup.minhash_band_table(rd.from_pandas(old)).materialize()
    inc = canon(dedup.minhash_raw_pairs_incremental(
        rd.from_pandas(new), bands_old))
    assert old_pairs | inc == full
    # the cross-partition exact dups must be found by the incremental round
    assert any(a < 1000 <= b for a, b in inc)
