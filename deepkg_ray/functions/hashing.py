"""Deterministic hashing utilities: stable 64-bit hashes, MinHash, SimHash,
rolling (Rabin-Karp-style) document fingerprints.

All functions are seed-stable across processes and parallelism levels
(no PYTHONHASHSEED dependence) — required for retry-safe, deterministic
Ray tasks (SURVEY.md §7.5 "Determinism").
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAX64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def stable_hash64_batch(texts: list[str]) -> np.ndarray:
    """Vectorized 64-bit string hash: pandas' C siphash13 over the object
    array with its fixed default key — deterministic across processes, and
    ~40× faster than a per-string Python blake2b loop (the shingle-hash
    base of minhash/simhash is the hot path of both dedup families)."""
    if not len(texts):
        return np.empty(0, dtype=np.uint64)
    import pandas as pd
    return pd.util.hash_array(np.asarray(texts, dtype=object),
                              categorize=False)


def stable_hash64(s: str) -> int:
    """Scalar variant of stable_hash64_batch (same function)."""
    return int(stable_hash64_batch([s])[0])


def content_md5_batch(texts: list[str]) -> list[str]:
    """md5 hex — deliberately the same function DuckDB's md5() computes, so
    the exact-dedup oracle can reproduce the hash column in SQL."""
    return [hashlib.md5(t.encode()).hexdigest() for t in texts]


def word_shingles(text: str, k: int = 3) -> list[str]:
    ws = text.split()
    if len(ws) < k:
        return [" ".join(ws)] if ws else []
    return [" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)]


class MinHasher:
    """n_perm MinHash over shingle sets; mergeable and deterministic.

    Hash family: (a*x + b) with natural uint64 wrap-around (mod 2^64, a odd)
    — fully vectorized; adequate mixing for minhash since the base shingle
    hashes are siphash13 (stable_hash64_batch).  Signatures are uint64[n_perm]."""

    def __init__(self, n_perm: int = 64, seed: int = 7, shingle_k: int = 3):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 63, size=n_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
        self.b = rng.integers(0, 1 << 63, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def signatures(self, texts: list[str]) -> np.ndarray:
        """Vectorized batch path: flatten all shingle hashes, one
        (n_perm × total_shingles) multiply-add, then per-doc segment minima
        via np.minimum.reduceat."""
        if not texts:
            return np.empty((0, self.n_perm), dtype=np.uint64)
        shingle_lists = [word_shingles(t, self.shingle_k) for t in texts]
        lens = np.fromiter((len(s) for s in shingle_lists), dtype=np.int64,
                           count=len(texts))
        flat = [s for sl in shingle_lists for s in sl]
        out = np.full((len(texts), self.n_perm), _MAX64, dtype=np.uint64)
        if not flat:
            return out
        base = stable_hash64_batch(flat)                       # [total]
        with np.errstate(over="ignore"):
            vals = self.a[:, None] * base[None, :] + self.b[:, None]
        offsets = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        nonempty = lens > 0
        # reduceat needs strictly valid segment starts; compute on the
        # non-empty segments and scatter back
        ne_off = offsets[nonempty]
        mins = np.minimum.reduceat(vals, ne_off, axis=1)       # [n_perm, n_ne]
        out[nonempty] = mins.T
        return out


def band_hashes(sig: np.ndarray, n_bands: int) -> list[int]:
    """Split a signature into bands and hash each band (LSH bucketing)."""
    rows = len(sig) // n_bands
    out = []
    for b in range(n_bands):
        band = sig[b * rows:(b + 1) * rows]
        h = hashlib.blake2b(band.tobytes(), digest_size=8).digest()
        out.append(int.from_bytes(h, "big"))
    return out


class SimHasher:
    """64-bit SimHash over word-unigram features."""

    def __init__(self, bits: int = 64):
        self.bits = bits
        self._shifts = np.arange(bits, dtype=np.uint64)

    def fingerprint(self, text: str) -> int:
        return int(self.fingerprints([text])[0])

    def fingerprints(self, texts: list[str]) -> np.ndarray:
        """Vectorized batch path: flatten word hashes, unpack to a ±1 bit
        matrix, segment-sum per doc via np.add.reduceat, repack sign bits.
        Bit-identical to the per-word definition (bit i of fp = 1 iff
        Σ_w (2·bit_i(h(w)) − 1) > 0)."""
        words_lists = [t.split() for t in texts]
        lens = np.fromiter((len(w) for w in words_lists), dtype=np.int64,
                           count=len(texts))
        flat = [w for wl in words_lists for w in wl]
        out = np.zeros(len(texts), dtype=np.uint64)
        if not flat:
            return out
        hs = stable_hash64_batch(flat)                        # [total]
        signed = (2 * ((hs[:, None] >> self._shifts) & np.uint64(1))
                  .astype(np.int32) - 1)                      # [total, bits]
        offsets = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        nonempty = lens > 0
        sums = np.add.reduceat(signed, offsets[nonempty], axis=0)
        fps = ((sums > 0).astype(np.uint64) << self._shifts).sum(axis=1,
                                                                 dtype=np.uint64)
        out[nonempty] = fps
        return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming64_array(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over a uint64 array (byte-LUT; numpy<2 has no
    bitwise_count)."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    return _POP8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)


def rolling_fingerprint(text: str, window: int = 8, keep_mod: int = 16) -> list[int]:
    """Winnowing-style document fingerprint: rolling hash over char windows,
    keep hashes ≡ 0 (mod keep_mod).  Deterministic; used as a cheap
    containment/near-dup signal (SURVEY.md 'document fingerprinting')."""
    if len(text) < window:
        return [stable_hash64(text)] if text else []
    base, mod = 257, _MERSENNE
    pw = pow(base, window - 1, mod)
    h = 0
    out = []
    for i, c in enumerate(text):
        h = (h * base + ord(c)) % mod
        if i >= window:
            h = (h - ord(text[i - window]) * pw * base) % mod
        if i >= window - 1 and h % keep_mod == 0:
            out.append(h)
    return out
