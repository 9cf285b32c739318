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


_SPLITMIX_1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized — full-avalanche dispersion of a
    uint64 array (public-domain constant set, Steele et al. 2014)."""
    x = np.array(x, dtype=np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= _SPLITMIX_1
        x ^= x >> np.uint64(27)
        x *= _SPLITMIX_2
        x ^= x >> np.uint64(31)
    return x


def shingle_hashes_batch(texts: list[str], k: int = 3
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc k-word-shingle hashes WITHOUT materializing shingle strings:
    hash each word once (vectorized siphash), then combine the k hashes of
    each window with positionally-salted multiply-xor and a splitmix64
    finish.  Equal word sequences hash equal; the O(words·k) string joins
    of the naive path (the minhash hot-path cost) disappear.

    Returns (flat, counts): flat = concatenated shingle hashes doc by doc,
    counts[i] = number of shingles of texts[i] (0 for empty docs; 1 for
    docs shorter than k words, hashing the whole word sequence)."""
    n = len(texts)
    counts = np.zeros(n, dtype=np.int64)
    if n == 0:
        return np.empty(0, dtype=np.uint64), counts
    words_lists = [t.split() for t in texts]
    wlens = np.fromiter((len(w) for w in words_lists), dtype=np.int64, count=n)
    flat_words = [w for wl in words_lists for w in wl]
    if not flat_words:
        return np.empty(0, dtype=np.uint64), counts
    hw = stable_hash64_batch(flat_words)
    np.copyto(counts, np.where(wlens >= k, wlens - k + 1,
                               (wlens > 0).astype(np.int64)))
    woff = np.zeros(n, dtype=np.int64)
    np.cumsum(wlens[:-1], out=woff[1:])

    # window starts for the full-window docs, one flat index array
    full = wlens >= k
    n_win = np.where(full, wlens - k + 1, 0)
    total = int(n_win.sum())
    salts = mix64(_GOLDEN * np.arange(1, k + 1, dtype=np.uint64))
    out_full = np.empty(0, dtype=np.uint64)
    if total:
        reps = n_win[full]
        base = np.repeat(woff[full], reps)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
        idx = base + within
        acc = np.zeros(total, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                acc ^= hw[idx + j] * salts[j]
        out_full = mix64(acc)

    short = (wlens > 0) & ~full
    if not short.any():
        return out_full, counts
    # rare tail: docs with 1..k-1 words hash their whole word sequence
    short_hashes = np.empty(int(short.sum()), dtype=np.uint64)
    for si, di in enumerate(np.flatnonzero(short)):
        seg = hw[woff[di]:woff[di] + wlens[di]]
        acc = np.uint64(0)
        with np.errstate(over="ignore"):
            for j in range(len(seg)):
                acc ^= seg[j] * salts[j]
        short_hashes[si] = mix64(acc[None])[0]
    # interleave full-window and short-doc shingles back into doc order
    out = np.empty(int(counts.sum()), dtype=np.uint64)
    soff = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=soff[1:])
    if total:
        reps = n_win[full]
        base = np.repeat(soff[full], reps)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
        out[base + within] = out_full
    out[soff[short]] = short_hashes
    return out, counts


class MinHasher:
    """n_perm MinHash over shingle sets; mergeable and deterministic.

    Hash family: (a*x + b) with natural uint64 wrap-around (mod 2^64, a odd)
    — fully vectorized; adequate mixing for minhash since the base shingle
    hashes are siphash13 (stable_hash64_batch).  Signatures are uint64[n_perm].

    hash_mode: "fast" = string-free siphash shingle hashes (the throughput
    path); "parity" = md5_lower64 over the materialized shingle STRINGS
    (≡ DuckDB md5_number_lower) — every signature value, band key and
    therefore the whole LSH candidate set becomes reproducible by the SQL
    oracle (oracle.dedup_minhash_oracle)."""

    def __init__(self, n_perm: int = 64, seed: int = 7, shingle_k: int = 3,
                 hash_mode: str = "fast"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 63, size=n_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
        self.b = rng.integers(0, 1 << 63, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.shingle_k = shingle_k
        self.hash_mode = hash_mode

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def _signatures_parity(self, texts: list[str]) -> np.ndarray:
        out = np.full((len(texts), self.n_perm), _MAX64, dtype=np.uint64)
        for i, t in enumerate(texts):
            sh = word_shingles(t, self.shingle_k)
            if not sh:
                continue
            base = md5_lower64_batch(sh)
            with np.errstate(over="ignore"):
                vals = base[None, :] * self.a[:, None] + self.b[:, None]
            out[i] = vals.min(axis=1)
        return out

    def signatures(self, texts: list[str]) -> np.ndarray:
        """Vectorized batch path: flatten all shingle hashes (string-free,
        shingle_hashes_batch), one (n_perm × total_shingles) multiply-add,
        then per-doc segment minima via np.minimum.reduceat."""
        if not texts:
            return np.empty((0, self.n_perm), dtype=np.uint64)
        if self.hash_mode == "parity":
            return self._signatures_parity(texts)
        base, lens = shingle_hashes_batch(texts, self.shingle_k)
        out = np.full((len(texts), self.n_perm), _MAX64, dtype=np.uint64)
        if not len(base):
            return out
        offsets = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        # chunk over doc ranges so the (n_perm × shingles) working matrix
        # stays ≤ ~256 MiB even for whole-block batches of large docs
        chunk = max(1 << 19, int(lens.max()))
        d0 = 0
        while d0 < len(texts):
            d1 = d0
            tot = 0
            while d1 < len(texts) and (tot + lens[d1] <= chunk or d1 == d0):
                tot += int(lens[d1])
                d1 += 1
            if tot:
                s0 = int(offsets[d0])
                seg = base[s0:s0 + tot]
                # per-row contiguous multiply-add: the broadcast outer form
                # (a[:,None]*base[None,:]) routes numpy through a stride-0
                # inner loop that can be 10-80× slower for uint64
                vals = np.empty((self.n_perm, tot), dtype=np.uint64)
                with np.errstate(over="ignore"):
                    for i in range(self.n_perm):
                        np.multiply(seg, self.a[i], out=vals[i])
                        vals[i] += self.b[i]
                sub_lens = lens[d0:d1]
                nonempty = sub_lens > 0
                ne_off = (offsets[d0:d1] - s0)[nonempty]
                # reduceat needs strictly valid segment starts; compute on
                # the non-empty segments and scatter back
                mins = np.minimum.reduceat(vals, ne_off, axis=1)
                out[d0:d1][nonempty] = mins.T
            d0 = d1
        return out


def band_hashes_matrix(sigs: np.ndarray, n_bands: int) -> np.ndarray:
    """Vectorized band hashing for a whole batch: sigs is (n, n_perm);
    returns (n, n_bands) uint64.  Each band's `rows` signature values are
    folded with a golden-ratio multiply + splitmix64 finish — one numpy
    pass replacing n·n_bands per-doc blake2b calls (the round-1 cost)."""
    n, n_perm = sigs.shape
    rows = n_perm // n_bands
    v = sigs[:, :rows * n_bands].reshape(n, n_bands, rows)
    acc = np.zeros((n, n_bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(rows):
            acc = acc * _GOLDEN ^ mix64(v[:, :, j])
    return mix64(acc)


def band_keys_parity(sigs: np.ndarray, n_bands: int) -> np.ndarray:
    """SQL-parity band keys: md5_lower64 of the comma-joined decimal
    signature values of each band (≡ DuckDB md5_number_lower(string_agg(
    mv::VARCHAR, ',' ORDER BY perm)))."""
    n, n_perm = sigs.shape
    rows = n_perm // n_bands
    out = np.empty((n, n_bands), dtype=np.uint64)
    for i in range(n):
        row = sigs[i]
        for b in range(n_bands):
            seg = row[b * rows:(b + 1) * rows]
            out[i, b] = md5_lower64(",".join(str(int(v)) for v in seg))
    return out


def band_hashes(sig: np.ndarray, n_bands: int) -> list[int]:
    """Split a signature into bands and hash each band (LSH bucketing)."""
    return band_hashes_matrix(np.asarray(sig, dtype=np.uint64)[None, :],
                              n_bands)[0].tolist()


def md5_lower64_batch(texts: list[str]) -> np.ndarray:
    """Batch md5_lower64 — the SQL-parity 64-bit hash (slower than
    stable_hash64_batch; used by oracle-checked query configurations)."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode()).digest()[8:16], "little")
         for t in texts), dtype=np.uint64, count=len(texts))


class SimHasher:
    """64-bit SimHash over word-unigram features.

    hash_mode: "fast" = siphash13 word hashes (the throughput path);
    "parity" = md5_lower64 (≡ DuckDB md5_number_lower) so the whole
    fingerprint — and therefore the near-pair set — is reproducible by the
    SQL oracle (oracle.dedup_simhash_oracle)."""

    def __init__(self, bits: int = 64, hash_mode: str = "fast"):
        self.bits = bits
        self._shifts = np.arange(bits, dtype=np.uint64)
        self._hash = (stable_hash64_batch if hash_mode == "fast"
                      else md5_lower64_batch)

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
        hs = self._hash(flat)                                 # [total]
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


def md5_lower64(s: str) -> int:
    """Little-endian int of md5-digest bytes 8..16 ≡ DuckDB
    md5_number_lower() — the SQL-parity 64-bit string hash."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


def rolling_fingerprint(text: str, window: int = 8, keep_mod: int = 16) -> list[int]:
    """Winnowing-style document fingerprint: rolling hash over char windows,
    keep hashes ≡ 0 (mod keep_mod).  Deterministic; used as a cheap
    containment/near-dup signal (SURVEY.md 'document fingerprinting').

    SQL-parity: each emitted value is the polynomial hash of one
    window-char span, Σ ord(c_{p+t})·257^(window-1-t) mod (2^61-1) — the
    rolling recurrence below computes exactly that per position, so the
    DuckDB oracle reproduces it without recursion
    (oracle.doc_fingerprints_oracle); the short-text fallback is
    md5_lower64 % mod (≡ md5_number_lower % mod)."""
    if len(text) < window:
        return [md5_lower64(text) % _MERSENNE] if text else []
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
