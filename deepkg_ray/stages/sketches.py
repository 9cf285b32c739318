"""Mergeable sketches: HyperLogLog approximate distinct + Bloom filters.

The reference has no approximate aggregates (SURVEY.md §2.5: "no sketches
anywhere"); these are the engine's scale additions for diagnostics — the
canonical mergeable-sketch plan: one serialized sketch per batch emitted
from map_batches, merged in a tiny second stage (sketches are designed to
be mergeable), never a giant exact shuffle.  Correctness paths stay exact.

Bloom filters serve broadcast semi/anti-join prefiltering: ship the filter
(kilobytes) instead of the key set (gigabytes), accept false positives,
confirm exactly afterwards if needed.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _hash64(values: list[str]) -> np.ndarray:
    """64-bit hash = little-endian int of md5-digest bytes 8..16 —
    deliberately the exact value DuckDB's ``md5_number_lower()`` computes,
    so sketch state (HLL registers) is reproducible in the SQL oracle."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(v.encode()).digest()[8:16], "little")
         for v in values),
        dtype=np.uint64, count=len(values))


class HLL:
    """HyperLogLog with 2^p registers (standard bias-corrected estimator)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        self.alpha = 0.7213 / (1 + 1.079 / self.m)

    def add_hashes(self, h: np.ndarray):
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        low = h & np.uint64((1 << (64 - self.p)) - 1)
        # rank = leading zeros of the low 64-p bits + 1, via EXACT integer
        # bit_length (frexp exponent; low ≤ 2^52 for p ≥ 12 so the float64
        # conversion is exact — no log2 rounding hazard, and the identical
        # value is computable in SQL as length(to_base(low, 2)))
        assert self.p >= 12
        bl = np.frexp(low.astype(np.float64))[1]     # bit_length, 0 for 0
        rho = ((64 - self.p + 1) - bl).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HLL"):
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> float:
        e = self.alpha * self.m ** 2 / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * self.m and zeros:
            return self.m * math.log(self.m / zeros)    # small-range correction
        return float(e)

    def serialize(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def deserialize(cls, b: bytes, p: int = 12) -> "HLL":
        h = cls(p)
        h.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return h


def merged_hll(ds, col: str, p: int = 12) -> HLL:
    """Per-batch HLL sketches over a column, merged driver-side (each
    sketch is 4 KiB — the merge is trivial)."""
    def sketch(b: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add_hashes(_hash64([str(v) for v in b[col].to_pylist()]))
        return pa.table({"sketch": pa.array([h.serialize()], pa.binary())})

    merged = HLL(p)
    for row in ds.select_columns([col]).map_batches(
            sketch, batch_format="pyarrow").iter_rows():
        merged.merge(HLL.deserialize(row["sketch"], p))
    return merged


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate count-distinct of a column via merged HLL sketches."""
    return merged_hll(ds, col, p).estimate()


def hll_registers(ds, col: str, p: int = 12) -> pd.DataFrame:
    """The merged sketch STATE as an integer table (register, rho) over
    nonzero registers.  This is the value-hash-checkable artifact of the
    approximate-distinct path: the md5-parity hash (_hash64 ≡ DuckDB
    md5_number_lower) and exact bit-length rho make every register value
    reproducible in SQL; estimate() accuracy is pytest-covered."""
    m = merged_hll(ds, col, p)
    nz = np.flatnonzero(m.registers)
    return pd.DataFrame({"register": nz.astype(np.int64),
                         "rho": m.registers[nz].astype(np.int64)})


class BloomFilter:
    """Fixed-size Bloom filter (k hashes via double hashing); mergeable by
    OR.  Built from one side's keys, broadcast into map_batches for
    semi/anti prefiltering (no false negatives)."""

    def __init__(self, n_bits: int = 1 << 16, k: int = 4):
        assert n_bits & (n_bits - 1) == 0
        self.n_bits, self.k = n_bits, k
        self.bits = np.zeros(n_bits // 8, dtype=np.uint8)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        h1 = h & np.uint64(0xFFFFFFFF)
        h2 = h >> np.uint64(32)
        ks = np.arange(self.k, dtype=np.uint64)
        return ((h1[:, None] + ks[None, :] * h2[:, None])
                % np.uint64(self.n_bits)).astype(np.int64)

    def add(self, keys: list[str]):
        pos = self._positions(_hash64(keys)).ravel()
        np.bitwise_or.at(self.bits, pos // 8,
                         (1 << (pos % 8)).astype(np.uint8))

    def might_contain(self, keys: list[str]) -> np.ndarray:
        pos = self._positions(_hash64(keys))
        byte = self.bits[pos // 8]
        hit = (byte & (1 << (pos % 8)).astype(np.uint8)) != 0
        return hit.all(axis=1)


def bloom_anti_join_counts(ds, key_col: str, member_keys: list[str],
                           exact: bool = True):
    """Rows of ds whose key is NOT in member_keys, counted per key.
    Bloom prefilter (no false negatives → anti-join candidates are a
    superset) + exact broadcast-set confirmation when ``exact``."""
    bloom = BloomFilter()
    bloom.add(member_keys)
    member_set = frozenset(member_keys) if exact else None

    def kernel(b: pa.Table) -> pd.DataFrame:
        keys = [str(v) for v in b[key_col].to_pylist()]
        maybe_member = bloom.might_contain(keys)
        anti = ~maybe_member
        if exact:
            # Bloom false positives would wrongly drop rows — confirm them
            fp_check = np.array([k not in member_set for k in keys])
            anti = anti | (maybe_member & fp_check)
        kept = [k for k, a in zip(keys, anti) if a]
        vc = pd.Series(kept).value_counts()
        return pd.DataFrame({key_col: vc.index.astype(str),
                             "n_rows": vc.to_numpy().astype(np.int64)})

    from deepkg_ray.stages.treeagg import merge_partials
    partial = ds.select_columns([key_col]).map_batches(kernel,
                                                       batch_format="pyarrow")
    return merge_partials(partial, [key_col], {"n_rows": "sum"}, fanout=2)


# ------------------------------------------------- Misra-Gries heavy hitters

def mg_prune(tokens: np.ndarray, counts: np.ndarray,
             budget: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Batch Misra-Gries decrement: subtract the (budget+1)-th largest count
    from every counter, keep the positives (≤ budget survive).  Returns
    (tokens, residual_counts, decrement); any item's true count within the
    summarized data is ≤ residual + decrement."""
    if len(tokens) <= budget:
        return tokens, counts, 0
    thr = int(np.partition(counts, -(budget + 1))[-(budget + 1)])
    keep = counts > thr
    return tokens[keep], counts[keep] - thr, thr


def heavy_hitter_tokens(ds, text_col: str = "text", k: int = 20,
                        budget: int = 4096):
    """EXACT top-k most frequent whitespace tokens without a full-vocabulary
    shuffle — the two-pass heavy-hitter plan:

    1. candidate pass: per-block token counts pruned to a Misra-Gries
       sketch of `budget` rows (so only budget×n_blocks rows shuffle, not
       the open vocabulary) → groupby-sum → one more MG prune;
    2. verify pass: EXACT counts for the bounded candidate set only
       (broadcast membership, np.isin per batch, bounded groupby) →
       deterministic top-k (count desc, token asc).

    Exactness: a non-candidate's true count is ≤ the accumulated MG
    decrement bound U; the result is provably the true top-k whenever the
    k-th exact candidate count > U — asserted at runtime (raise rather
    than silently return an approximate answer; at 100 TB raise `budget`).
    Returns a Dataset (token, n)."""
    import re
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum
    ws = re.compile(r"\s+")

    def block_sketch(b: pa.Table) -> pa.Table:
        toks: dict[str, int] = {}
        for t in b[text_col].to_pylist():
            t = t.lower().strip()
            if not t:
                continue
            for w in ws.split(t):
                toks[w] = toks.get(w, 0) + 1
        if not toks:
            return pa.table({"token": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())})
        tk = np.asarray(list(toks.keys()), dtype=object)
        ct = np.asarray(list(toks.values()), dtype=np.int64)
        tk, ct, dec = mg_prune(tk, ct, budget)
        # sidecar row carries this block's decrement; token "" is a safe
        # sentinel (whitespace-split of stripped text never yields "")
        return pa.table({
            "token": pa.array(list(tk) + [""], pa.string()),
            "c": pa.array(np.concatenate([ct, [0]]), pa.int64()),
            "d": pa.array([0] * len(tk) + [dec], pa.int64())})

    sketch = (ds.select_columns([text_col])
              .map_batches(block_sketch, batch_format="pyarrow")
              .groupby("token")
              .aggregate(Sum("c", alias_name="c"), Sum("d", alias_name="d"))
              .to_pandas())
    side = sketch["token"] == ""
    u_blocks = int(sketch.loc[side, "d"].sum())
    body = sketch[~side]
    tk, ct, dec = mg_prune(body["token"].to_numpy(),
                           body["c"].to_numpy(dtype=np.int64), budget)
    u_bound = u_blocks + dec
    cand_ref = ray.put(set(tk.tolist()))

    def exact_counts(b: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        toks: dict[str, int] = {}
        for t in b[text_col].to_pylist():
            t = t.lower().strip()
            if not t:
                continue
            for w in ws.split(t):
                if w in cand:
                    toks[w] = toks.get(w, 0) + 1
        return pa.table({"token": pa.array(list(toks.keys()), pa.string()),
                         "n": pa.array(list(toks.values()), pa.int64())})

    exact = (ds.select_columns([text_col])
             .map_batches(exact_counts, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("n", alias_name="n"))
             .to_pandas()
             .sort_values(["n", "token"], ascending=[False, True],
                          kind="stable").head(k))
    kth = int(exact["n"].iloc[-1]) if len(exact) else 0
    # certify: with pruning (u_bound > 0), a non-candidate's true count can
    # be as high as u_bound — need k certified candidates strictly above it
    if u_bound > 0 and (len(exact) < k or kth <= u_bound):
        raise ValueError(
            f"heavy_hitter_tokens: cannot certify exact top-{k} "
            f"(k-th count {kth} <= undercount bound {u_bound}); "
            f"raise budget (={budget})")
    return rd.from_pandas(exact.reset_index(drop=True))


def windowed_hll_registers(ds, window_sec: int = 3600,
                           col: str = "user_id", ts_col: str = "ts",
                           p: int = 12):
    """Approximate distinct-per-window: HLL register state per TUMBLING
    event-time window — the mergeable-sketch composition a 100 TB
    windowed-distinct needs (exact distinct per window would shuffle every
    (window, user) pair; this shuffles ≤ 2^p register rows per window).

    Per batch: (window_bucket, register, rho) rows computed vectorized
    with the md5-parity hash and exact bit-length rho (same conventions as
    the global HLL above), then one groupby Max(rho) — sketch merge IS the
    aggregate.  The register STATE is the value-hash-checked artifact
    (oracle.windowed_hll_oracle) — the estimate itself is NOT a hashed
    column because the 2^-rho float sum is summation-order-dependent;
    use windowed_hll_estimates() for the numbers (pytest-covered
    accuracy).  Returns (window_start_us, register, rho)."""
    import pandas as pd

    from ray.data.aggregate import Max

    win_us = window_sec * 1_000_000
    assert p >= 12
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)

    def partial(b: pa.Table) -> pa.Table:
        us = (b[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        bucket = (us // win_us) * win_us
        h = _hash64([str(v) for v in b[col].to_pylist()])
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        low = h & np.uint64((1 << (64 - p)) - 1)
        bl = np.frexp(low.astype(np.float64))[1]
        rho = ((64 - p + 1) - bl).astype(np.int64)
        df = (pd.DataFrame({"window_start_us": bucket, "register": idx,
                            "rho": rho})
              .groupby(["window_start_us", "register"], as_index=False)
              .max())
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (ds.select_columns([ts_col, col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(["window_start_us", "register"])
           .aggregate(Max("rho", alias_name="rho")))

    def cast_cols(b: pa.Table) -> pa.Table:
        return pa.table({
            "window_start_us": b["window_start_us"].combine_chunks()
                                .cast(pa.int64()),
            "register": b["register"].combine_chunks().cast(pa.int64()),
            "rho": b["rho"].combine_chunks().cast(pa.int64()),
        })
    return agg.map_batches(cast_cols, batch_format="pyarrow")


def windowed_hll_estimates(ds, window_sec: int = 3600,
                           col: str = "user_id", ts_col: str = "ts",
                           p: int = 12) -> pd.DataFrame:
    """Per-window approximate distinct counts from the windowed register
    state (driver-side finish over ≤ 2^p rows per window)."""
    regs = windowed_hll_registers(ds, window_sec, col, ts_col, p).to_pandas()
    out = []
    for w, g in regs.groupby("window_start_us"):
        h = HLL(p)
        h.registers[g["register"].to_numpy(np.int64)] = \
            g["rho"].to_numpy(np.int64).astype(np.uint8)
        out.append((int(w), float(h.estimate())))
    return pd.DataFrame(out, columns=["window_start_us", "n_distinct_est"])
