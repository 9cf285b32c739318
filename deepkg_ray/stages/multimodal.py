"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with a
``media_type`` tag; decode / feature-extract / resize / frame-sample are
actor-pool map_batches stages.  Three decoder tiers behind one actor
contract:

- ``RealDecoder`` — ACTUAL decoding, zero external libs: P6 PPM images
  (header parse + np.frombuffer → pixels → nearest-neighbor resize →
  channel stats + histogram) and RIFF/WAVE PCM16 audio (chunk walk →
  samples → RMS/ZCR/peak + rFFT band energies).
- ``FakeDecoder`` — hash-seeded deterministic stand-in for plumbing tests
  with arbitrary payloads.
- ``LibDecoder`` — compressed formats (JPEG/MP3/...), import-gated on
  PIL/soundfile which this container lacks; raises NotImplementedError.

Scale note: binary rows are wide; callers should use a SMALL ``batch_size``
(default 64 here) and rely on object-store spilling rather than Python
lists (SURVEY.md "Memory-aware").
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),     # "image" | "audio"
    ("payload", pa.binary()),
    ("meta_width", pa.int32()),      # images
    ("meta_height", pa.int32()),
    ("meta_sample_rate", pa.int32()),  # audio
])


def synth_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media rows for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    ids, types, payloads, w, h, sr = [], [], [], [], [], []
    for i in range(n):
        is_img = i % 2 == 0
        ids.append(i)
        types.append("image" if is_img else "audio")
        payloads.append(rng.integers(0, 256, size=int(rng.integers(256, 2048)),
                                     dtype=np.uint8).tobytes())
        w.append(int(rng.integers(8, 64)) if is_img else 0)
        h.append(int(rng.integers(8, 64)) if is_img else 0)
        sr.append(16000 if not is_img else 0)
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta_width": pa.array(w, pa.int32()),
        "meta_height": pa.array(h, pa.int32()),
        "meta_sample_rate": pa.array(sr, pa.int32()),
    }, schema=MEDIA_SCHEMA)


class FakeDecoder:
    """Deterministic decode stub: payload bytes → feature vector.

    Real deployments replace this class with one whose __init__ loads the
    codec/model (same actor contract); __call__ signature and output schema
    are identical, so the pipeline around it is fully exercised."""

    def __init__(self, feat_dim: int = 16):
        self.feat_dim = feat_dim

    def _features(self, payload: bytes) -> np.ndarray:
        # hash-seeded pseudo-features: stable across processes
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(h, "big"))
        return rng.standard_normal(self.feat_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p) for p in batch["payload"].to_pylist()]
        sizes = [len(p) for p in batch["payload"].to_pylist()]
        out = batch.select(["media_id", "media_type", "meta_width",
                            "meta_height", "meta_sample_rate"])
        return (out.append_column("payload_bytes", pa.array(sizes, pa.int64()))
                .append_column("features",
                               pa.array([f.tolist() for f in feats],
                                        pa.list_(pa.float32()))))


class LibDecoder(FakeDecoder):
    """Real-codec tier; import-gated.  Raises NotImplementedError in this
    container (no PIL/soundfile) — see module docstring."""

    def __init__(self, feat_dim: int = 16):
        super().__init__(feat_dim)
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "image/audio codecs are not installed in this environment; "
                "use FakeDecoder for plumbing tests") from e


def decode_features(ds, *, decoder=FakeDecoder, feat_dim: int = 16,
                    concurrency=(1, 4), batch_size: int = 64):
    """media Dataset → per-item feature rows.  Small batch_size by design:
    payload rows are wide."""
    return ds.map_batches(decoder,
                          fn_constructor_kwargs={"feat_dim": feat_dim},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


# ------------------------------------------------ real-codec tier (PPM/WAV) --

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8.  Pure numpy — no codec libs."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # cursor header parse: exactly ONE whitespace byte follows maxval, so
    # raster bytes that are themselves whitespace (0x20/0x0a/...) survive —
    # a str.split header parse would eat them (iter_ppm_frames convention)
    cursor, vals = 2, []
    while len(vals) < 3:
        while payload[cursor] in b" \t\r\n":
            cursor += 1
        start = cursor
        while payload[cursor] not in b" \t\r\n":
            cursor += 1
        vals.append(int(payload[start:cursor]))
    cursor += 1
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    px = np.frombuffer(payload[cursor: cursor + w * h * 3], dtype=np.uint8)
    return px.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples → minimal RIFF/WAVE PCM16 bytes."""
    import struct
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * 2
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono → (int16 samples, sample_rate)."""
    import struct
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, 16000, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            _, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if ch != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if samples is None:
        raise ValueError("no data chunk")
    return samples, rate


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize by integer index striding (vectorized)."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return img[ri][:, ci]


def _real_media_items(n: int = 64, seed: int = 5) -> list[dict]:
    """The one in-memory corpus behind BOTH the encoded media table and
    the construction-gold features (ck_tokens convention): each item keeps
    its raw pixel/sample array alongside the encoded payload."""
    rng = np.random.default_rng(seed)
    items = []
    for i in range(n):
        is_img = i % 2 == 0
        if is_img:
            w = int(rng.integers(8, 48))
            h = int(rng.integers(8, 48))
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack([(xx * 255 // max(w - 1, 1)),
                           (yy * 255 // max(h - 1, 1)),
                           np.full((h, w), int(rng.integers(0, 256)))],
                          axis=-1).astype(np.uint8)
            items.append({"media_id": i, "media_type": "image",
                          "payload": encode_ppm(px), "raw": px,
                          "meta_width": w, "meta_height": h,
                          "meta_sample_rate": 0})
        else:
            rate = 16000
            dur = int(rng.integers(400, 1600))
            freq = float(rng.integers(100, 2000))
            t = np.arange(dur, dtype=np.float64) / rate
            s = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
            items.append({"media_id": i, "media_type": "audio",
                          "payload": encode_wav(s, rate), "raw": s,
                          "meta_width": 0, "meta_height": 0,
                          "meta_sample_rate": rate})
    return items


def synth_real_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Media rows whose payloads are VALID encoded formats: gradient-
    pattern P6 PPM images and sine-wave PCM16 WAVs — the real-decode tier's
    test corpus (no codec libs needed to produce or parse them)."""
    items = _real_media_items(n, seed)
    return pa.table({
        "media_id": pa.array([d["media_id"] for d in items], pa.int64()),
        "media_type": pa.array([d["media_type"] for d in items], pa.string()),
        "payload": pa.array([d["payload"] for d in items], pa.binary()),
        "meta_width": pa.array([d["meta_width"] for d in items], pa.int32()),
        "meta_height": pa.array([d["meta_height"] for d in items], pa.int32()),
        "meta_sample_rate": pa.array([d["meta_sample_rate"] for d in items],
                                     pa.int32()),
    }, schema=MEDIA_SCHEMA)


def image_features_from_pixels(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 → 16-dim features (per-channel mean/std of the
    16×16 nearest-neighbor resize + 10-bin grayscale histogram).  Shared
    by the decode tier AND the construction-gold generator — the parity
    the golden oracle checks is the encode→decode→distribute path, the
    ck_tokens convention (one in-memory corpus, two routes to the rows)."""
    small = resize_nearest(px, 16, 16).astype(np.float32) / 255.0
    mean = small.mean(axis=(0, 1))
    std = small.std(axis=(0, 1))
    gray = small.mean(axis=2)
    hist, _ = np.histogram(gray, bins=10, range=(0.0, 1.0))
    hist = hist.astype(np.float32) / gray.size
    return np.concatenate([mean, std, hist]).astype(np.float32)


def audio_features_from_samples(s: np.ndarray) -> np.ndarray:
    """int16 mono samples → 16-dim features (RMS, ZCR, peak + 13
    log-spaced rFFT band energy fractions).  See image_features_from_pixels
    for the shared-math golden-oracle convention."""
    x = s.astype(np.float32) / 32768.0
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
    peak = float(np.max(np.abs(x))) if len(x) else 0.0
    spec = np.abs(np.fft.rfft(x))
    edges = np.unique(np.geomspace(1, max(len(spec) - 1, 2),
                                   num=14).astype(np.int64))
    bands = np.zeros(13, dtype=np.float32)
    total = spec.sum() or 1.0
    for b in range(min(13, len(edges) - 1)):
        bands[b] = spec[edges[b]:edges[b + 1]].sum() / total
    return np.concatenate([[rms, zcr, peak], bands]).astype(np.float32)


class RealDecoder:
    """REAL decode tier, zero external libs: PPM images are parsed to pixel
    arrays (decode → nearest-neighbor resize to 16×16 → per-channel
    mean/std + 10-bin grayscale histogram = 16-dim features); WAV audio is
    parsed to PCM16 samples (RMS, zero-crossing rate, peak + 13 log-spaced
    rFFT band energies = 16-dim).  Same actor contract and output schema
    as FakeDecoder — PIL/ffmpeg tiers for compressed formats slot into the
    same class boundary (LibDecoder), which stays import-gated here."""

    def __init__(self, feat_dim: int = 16):
        if feat_dim != 16:
            raise ValueError("RealDecoder emits fixed 16-dim features")
        self.feat_dim = feat_dim

    def _image_features(self, payload: bytes) -> np.ndarray:
        return image_features_from_pixels(decode_ppm(payload))

    def _audio_features(self, payload: bytes) -> np.ndarray:
        s, _rate = decode_wav(payload)
        return audio_features_from_samples(s)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, sizes = [], []
        for mt, p in zip(batch["media_type"].to_pylist(),
                         batch["payload"].to_pylist()):
            sizes.append(len(p))
            feats.append(self._image_features(p) if mt == "image"
                         else self._audio_features(p))
        out = batch.select(["media_id", "media_type", "meta_width",
                            "meta_height", "meta_sample_rate"])
        return (out.append_column("payload_bytes", pa.array(sizes, pa.int64()))
                .append_column("features",
                               pa.array([f.tolist() for f in feats],
                                        pa.list_(pa.float32()))))


# -------------------------------------------------------- video frames ----

def encode_ppm_video(frames: list[np.ndarray]) -> bytes:
    """Concatenated P6 frames — a raw 'video' container (MJPEG-style frame
    concatenation, uncompressed)."""
    return b"".join(encode_ppm(f) for f in frames)


def iter_ppm_frames(payload: bytes):
    """Walk a concatenated-P6 stream, yielding (h, w, 3) frames without
    copying the whole payload per frame."""
    pos = 0
    view = memoryview(payload)
    while pos < len(payload):
        if payload[pos:pos + 2] != b"P6":
            raise ValueError(f"bad frame header at byte {pos}")
        # header = three whitespace-separated ints after the magic
        cursor, vals = pos + 2, []
        while len(vals) < 3:
            while payload[cursor] in b" \t\r\n":
                cursor += 1
            start = cursor
            while payload[cursor] not in b" \t\r\n":
                cursor += 1
            vals.append(int(payload[start:cursor]))
        cursor += 1                       # the single whitespace after maxval
        w, h, maxval = vals
        if maxval != 255:
            raise ValueError("only maxval=255 supported")
        nbytes = w * h * 3
        yield np.frombuffer(view[cursor:cursor + nbytes],
                            dtype=np.uint8).reshape(h, w, 3)
        pos = cursor + nbytes


class FrameSampler:
    """Actor stage: video payload rows → one row per SAMPLED frame
    (media_id, frame_idx, n_frames, features) — decode only every
    ``stride``-th frame (the frame-sample op: at 100 TB you never decode
    frames you don't keep; the stream walk skips payload bytes, frombuffer
    is zero-copy into the Arrow buffer)."""

    def __init__(self, stride: int = 4, feat_dim: int = 16):
        self.stride = int(stride)
        self.dec = RealDecoder(feat_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, nfr, feats = [], [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(),
                          batch["payload"].to_pylist()):
            frames = list(iter_ppm_frames(p))
            for j in range(0, len(frames), self.stride):
                ids.append(mid)
                fidx.append(j)
                nfr.append(len(frames))
                feats.append(self.dec._image_features(encode_ppm(frames[j])))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "n_frames": pa.array(nfr, pa.int64()),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32()))})


def sample_video_frames(ds, *, stride: int = 4, concurrency=(1, 4),
                        batch_size: int = 16):
    """video Dataset → sampled-frame feature rows (small batches: video
    payload rows are the widest of all)."""
    return ds.map_batches(FrameSampler,
                          fn_constructor_kwargs={"stride": stride},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def _video_items(n: int = 8, seed: int = 9) -> list[dict]:
    """In-memory video corpus (raw frames + encoded payload) — see
    _real_media_items."""
    rng = np.random.default_rng(seed)
    items = []
    for i in range(n):
        k = int(rng.integers(6, 17))
        w, h = int(rng.integers(8, 24)), int(rng.integers(8, 24))
        frames = []
        for f in range(k):
            yy, xx = np.mgrid[0:h, 0:w]
            frames.append(np.stack(
                [(xx * 255 // max(w - 1, 1)),
                 np.full((h, w), (f * 255) // max(k - 1, 1)),
                 (yy * 255 // max(h - 1, 1))], axis=-1).astype(np.uint8))
        items.append({"media_id": i, "frames": frames,
                      "payload": encode_ppm_video(frames)})
    return items


def synth_video_table(n: int = 8, seed: int = 9) -> pa.Table:
    """Video rows: concatenated-P6 payloads of 6-16 gradient frames."""
    items = _video_items(n, seed)
    return pa.table({
        "media_id": pa.array([d["media_id"] for d in items], pa.int64()),
        "payload": pa.array([d["payload"] for d in items], pa.binary()),
        "n_frames_true": pa.array([len(d["frames"]) for d in items],
                                  pa.int64())})


# ------------------------------------------------- construction golds ------

FEAT_COLS = [f"f{i:02d}" for i in range(16)]


def _feat_columns(feats: list[np.ndarray]) -> dict:
    """16-dim feature vectors → round6 float64 columns f00..f15 (the
    driver-hash float convention, functions/numeric.round6)."""
    from deepkg_ray.functions.numeric import round6
    m = round6(np.stack(feats).astype(np.float64))
    return {c: pa.array(m[:, j], pa.float64())
            for j, c in enumerate(FEAT_COLS)}


def media_features_gold(n: int = 64, seed: int = 5) -> pa.Table:
    """Expected decode_features(RealDecoder) output, computed from the RAW
    construction arrays (never through encode/decode bytes) — what the
    golden oracle reads.  A decode/codec/plumbing bug shows up as an
    engine/gold mismatch."""
    items = _real_media_items(n, seed)
    feats = [image_features_from_pixels(d["raw"])
             if d["media_type"] == "image"
             else audio_features_from_samples(d["raw"]) for d in items]
    cols = {
        "media_id": pa.array([d["media_id"] for d in items], pa.int64()),
        "media_type": pa.array([d["media_type"] for d in items], pa.string()),
        "meta_width": pa.array([d["meta_width"] for d in items], pa.int32()),
        "meta_height": pa.array([d["meta_height"] for d in items], pa.int32()),
        "meta_sample_rate": pa.array([d["meta_sample_rate"] for d in items],
                                     pa.int32()),
        "payload_bytes": pa.array([len(d["payload"]) for d in items],
                                  pa.int64()),
    }
    cols.update(_feat_columns(feats))
    return pa.table(cols)


def video_frames_gold(n: int = 8, seed: int = 9,
                      stride: int = 4) -> pa.Table:
    """Expected sample_video_frames output from the raw construction
    frames (same stride arithmetic, no payload walk)."""
    items = _video_items(n, seed)
    ids, fidx, nfr, feats = [], [], [], []
    for d in items:
        k = len(d["frames"])
        for j in range(0, k, stride):
            ids.append(d["media_id"])
            fidx.append(j)
            nfr.append(k)
            feats.append(image_features_from_pixels(d["frames"][j]))
    cols = {"media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "n_frames": pa.array(nfr, pa.int64())}
    cols.update(_feat_columns(feats))
    return pa.table(cols)


def exposure_stats_from_pixels(px: np.ndarray, lo: int = 48,
                               hi: int = 717) -> tuple:
    """(h, w, 3) uint8 → (n_pixels, n_dark, n_bright, mean_brightness):
    gray is the integer r+g+b sum (0..765, the phash grayscale),
    dark/bright are the clipped tails, mean_brightness =
    round6(Σgray / n / 765.0) — the share of full brightness, one
    fixed double chain on exact integers.  Shared by the decode tier
    and the construction gold."""
    g = px.astype(np.int64).sum(axis=2)
    n = int(g.size)
    nd = int((g < lo).sum())
    nb = int((g > hi).sum())
    s = int(g.sum())
    mean = float(np.floor(s / n / 765.0 * 1e6 + 0.5) / 1e6) if n else 0.0
    return n, nd, nb, mean


class ExposureAnalyzer:
    """Image-only decode stage: P6 payload → exposure statistics — the
    over/under-exposure gate an image-training pipeline applies before
    feature extraction (SilenceAnalyzer's image sibling)."""

    def __init__(self, lo: int = 48, hi: int = 717):
        self.lo, self.hi = lo, hi

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["media_type"], pa.scalar("image"))
        batch = batch.filter(keep)
        ids, ns, nd, nb, mg = [], [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            px = decode_ppm(payload)
            a, b, c, d = exposure_stats_from_pixels(px, self.lo, self.hi)
            ids.append(mid)
            ns.append(a)
            nd.append(b)
            nb.append(c)
            mg.append(d)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "n_pixels": pa.array(ns, pa.int64()),
            "n_dark": pa.array(nd, pa.int64()),
            "n_bright": pa.array(nb, pa.int64()),
            "mean_brightness": pa.array(mg, pa.float64())})


def image_exposure(ds, *, lo: int = 48, hi: int = 717,
                   concurrency=(1, 4), batch_size: int = 64):
    """media Dataset → per-image exposure stats (actor pool)."""
    return ds.map_batches(ExposureAnalyzer,
                          fn_constructor_kwargs={"lo": lo, "hi": hi},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def image_exposure_gold(n: int = 64, seed: int = 5, lo: int = 48,
                        hi: int = 717) -> pa.Table:
    """Expected image_exposure output from the RAW pixel arrays."""
    items = [d for d in _real_media_items(n, seed)
             if d["media_type"] == "image"]
    rows = [exposure_stats_from_pixels(d["raw"], lo, hi) for d in items]
    return pa.table({
        "media_id": pa.array([d["media_id"] for d in items], pa.int64()),
        "n_pixels": pa.array([r[0] for r in rows], pa.int64()),
        "n_dark": pa.array([r[1] for r in rows], pa.int64()),
        "n_bright": pa.array([r[2] for r in rows], pa.int64()),
        "mean_brightness": pa.array([r[3] for r in rows], pa.float64())})


def exposure_gold_path() -> str:
    """Idempotent golden parquet for image_exposure."""
    import os

    import pyarrow.parquet as pq

    from deepkg_ray import synth
    root = os.path.join(synth.SYNTH_ROOT, synth.SYNTH_VERSION)
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "image_exposure_gold_v1.parquet")
    if not os.path.exists(path):
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(image_exposure_gold(n=256), tmp)
        os.replace(tmp, path)
    return path


def silence_stats_from_samples(s: np.ndarray,
                               thresh: int = 4000) -> tuple:
    """PCM16 samples → (n_samples, n_silent, longest_run,
    silence_ratio): |sample| < thresh counts as silent; longest_run is
    the longest consecutive silent stretch.  Shared by the decode tier
    and the construction gold (image_features_from_pixels convention)."""
    a = np.abs(s.astype(np.int64))
    quiet = a < thresh
    n = len(s)
    nq = int(quiet.sum())
    if nq == 0 or n == 0:
        longest = 0
    else:
        brk = np.nonzero(~quiet)[0]
        edges = np.concatenate(([-1], brk, [n]))
        longest = int(np.max(np.diff(edges)) - 1)
    ratio = float(np.floor(nq / n * 1e6 + 0.5) / 1e6) if n else 0.0
    return n, nq, longest, ratio


class SilenceAnalyzer:
    """Audio-only decode stage: WAV payload → silence statistics — the
    VAD-style pre-filter an audio-training pipeline runs before paying
    for transcription (RealDecoder's actor contract; stateless here but
    the __init__/__call__ split keeps the codec-loading tier drop-in)."""

    def __init__(self, thresh: int = 4000):
        self.thresh = thresh

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["media_type"], pa.scalar("audio"))
        batch = batch.filter(keep)
        ids, ns, nq, lr, ratio = [], [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            s, _rate = decode_wav(payload)
            a, b, c, d = silence_stats_from_samples(s, self.thresh)
            ids.append(mid)
            ns.append(a)
            nq.append(b)
            lr.append(c)
            ratio.append(d)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "n_samples": pa.array(ns, pa.int64()),
            "n_silent": pa.array(nq, pa.int64()),
            "longest_run": pa.array(lr, pa.int64()),
            "silence_ratio": pa.array(ratio, pa.float64())})


def audio_silence(ds, *, thresh: int = 4000, concurrency=(1, 4),
                  batch_size: int = 64):
    """media Dataset → per-audio-item silence stats (actor pool, wide
    payload rows ⇒ small batches, the decode_features posture)."""
    return ds.map_batches(SilenceAnalyzer,
                          fn_constructor_kwargs={"thresh": thresh},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def audio_silence_gold(n: int = 64, seed: int = 5,
                       thresh: int = 4000) -> pa.Table:
    """Expected audio_silence output from the RAW sample arrays (never
    through encode/decode bytes)."""
    items = [d for d in _real_media_items(n, seed)
             if d["media_type"] == "audio"]
    rows = [silence_stats_from_samples(d["raw"], thresh) for d in items]
    return pa.table({
        "media_id": pa.array([d["media_id"] for d in items], pa.int64()),
        "n_samples": pa.array([r[0] for r in rows], pa.int64()),
        "n_silent": pa.array([r[1] for r in rows], pa.int64()),
        "longest_run": pa.array([r[2] for r in rows], pa.int64()),
        "silence_ratio": pa.array([r[3] for r in rows], pa.float64())})


def silence_gold_path() -> str:
    """Idempotent golden parquet for audio_silence (media_gold_paths
    convention)."""
    import os

    import pyarrow.parquet as pq

    from deepkg_ray import synth
    root = os.path.join(synth.SYNTH_ROOT, synth.SYNTH_VERSION)
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "audio_silence_gold_v1.parquet")
    if not os.path.exists(path):
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(audio_silence_gold(n=256), tmp)
        os.replace(tmp, path)
    return path


def media_gold_paths() -> tuple[str, str]:
    """Idempotently write the two golden parquets under the synth cache
    (versioned like every other golden); returns (features_gold,
    video_gold) paths."""
    import os

    import pyarrow.parquet as pq

    from deepkg_ray import synth
    root = os.path.join(synth.SYNTH_ROOT, synth.SYNTH_VERSION)
    os.makedirs(root, exist_ok=True)
    fpath = os.path.join(root, "media_features_gold_v1.parquet")
    vpath = os.path.join(root, "video_frames_gold_v1.parquet")
    if not os.path.exists(fpath):
        tmp = fpath + f".tmp{os.getpid()}"
        pq.write_table(media_features_gold(n=256), tmp)
        os.replace(tmp, fpath)
    if not os.path.exists(vpath):
        tmp = vpath + f".tmp{os.getpid()}"
        pq.write_table(video_frames_gold(n=16), tmp)
        os.replace(tmp, vpath)
    return fpath, vpath


# ---------------------------------------------- perceptual hash (pHash) ----

def dct_basis_micros(n: int = 32) -> np.ndarray:
    """DCT-II cosine basis scaled to exact int64 micros:
    B[k, j] = floor(cos(pi * (j + 0.5) * k / n) * 1e6 + 0.5).  Integer
    matmuls through this basis are BLAS-free in numpy (int64 path), so the
    transform is bit-identical on every worker — the property the phash
    golden oracle relies on (float DCTs can differ across BLAS builds)."""
    k = np.arange(n, dtype=np.float64)[:, None]
    j = np.arange(n, dtype=np.float64)[None, :]
    return np.floor(np.cos(np.pi * (j + 0.5) * k / n) * 1e6 + 0.5) \
        .astype(np.int64)


_PHASH_N = 32          # resize edge
_PHASH_K = 8           # low-frequency block edge


def phash_from_pixels(px: np.ndarray) -> int:
    """(h, w, 3) uint8 → 63-bit perceptual hash: nearest-neighbor resize
    to 32×32, integer grayscale (r+g+b), exact int64 DCT-II through the
    micros basis, keep the top-left 8×8 low-frequency block, drop the DC
    term, set bit j iff coefficient j exceeds the exact integer median of
    the 63 AC coefficients.  Every step is integer-exact (|coeff| ≤
    32²·765·1e12 < 2^63), so the same image hashes identically on every
    worker, BLAS, and the golden generator."""
    small = resize_nearest(px, _PHASH_N, _PHASH_N)
    gray = small.astype(np.int64).sum(axis=2)           # 0..765 exact
    b = dct_basis_micros(_PHASH_N)[:_PHASH_K]           # (8, 32) int64
    coeff = b @ gray @ b.T                              # exact int64 (8, 8)
    ac = coeff.ravel()[1:]                              # drop DC → 63 vals
    med = int(np.sort(ac)[31])                          # exact middle of 63
    bits = ac > med
    h = 0
    for i in range(63):
        if bits[i]:
            h |= 1 << i
    return h


def _phash_items(n: int = 96, seed: int = 11) -> list[dict]:
    """Image corpus with PLANTED near-duplicates: each base image is a
    random 4×4 block pattern upsampled to 32×32 (strong distinct
    low-frequency content); every i % 3 == 2 item re-uses the previous
    item's blocks with one block nudged by +6 gray levels — a small
    low-frequency perturbation, so the pair's pHash hamming distance is
    small but usually nonzero.  Raw pixels ride along for the golds."""
    rng = np.random.default_rng(seed)
    items = []
    prev_blocks = None
    for i in range(n):
        if i % 3 == 2 and prev_blocks is not None:
            blocks = prev_blocks.copy()
            r, c = int(rng.integers(0, 4)), int(rng.integers(0, 4))
            blocks[r, c] = np.minimum(blocks[r, c].astype(np.int64) + 6,
                                      255).astype(np.uint8)
        else:
            blocks = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
        prev_blocks = blocks
        px = resize_nearest(blocks, 32, 32)
        items.append({"media_id": i, "payload": encode_ppm(px), "raw": px})
    return items


def synth_phash_table(n: int = 96, seed: int = 11) -> pa.Table:
    """Encoded P6 payload rows for the pHash corpus."""
    items = _phash_items(n, seed)
    return pa.table({
        "media_id": pa.array([d["media_id"] for d in items], pa.int64()),
        "payload": pa.array([d["payload"] for d in items], pa.binary())})


def phash_gold(n: int = 96, seed: int = 11) -> pa.Table:
    """(media_id, phash) computed from the RAW construction pixels — the
    golden the oracle self-joins for near-dup pairs."""
    items = _phash_items(n, seed)
    return pa.table({
        "media_id": pa.array([d["media_id"] for d in items], pa.int64()),
        "phash": pa.array([phash_from_pixels(d["raw"]) for d in items],
                          pa.int64())})


def phash_gold_path() -> str:
    """Idempotently write the pHash golden parquet (versioned synth-cache
    convention, see media_gold_paths)."""
    import os

    import pyarrow.parquet as pq

    from deepkg_ray import synth
    root = os.path.join(synth.SYNTH_ROOT, synth.SYNTH_VERSION)
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "phash_gold_v1.parquet")
    if not os.path.exists(path):
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(phash_gold(n=256), tmp)
        os.replace(tmp, path)
    return path


class PhashStage:
    """Actor stage: P6 payload rows → (media_id, phash:int64).  The DCT
    basis is built once per actor in __init__ (stateful-stage convention);
    __call__ is the per-batch decode + integer transform."""

    def __init__(self):
        self.basis = dct_basis_micros(_PHASH_N)[:_PHASH_K]

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [phash_from_pixels(decode_ppm(p))
                  for p in batch["payload"].to_pylist()]
        return pa.table({
            "media_id": batch["media_id"].combine_chunks().cast(pa.int64()),
            "phash": pa.array(hashes, pa.int64())})


def phash_hashes(ds, *, concurrency=(1, 4), batch_size: int = 64):
    """media Dataset → (media_id, phash) through the actor pool."""
    return ds.map_batches(PhashStage, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


_PHASH_BANDS = 8       # 8 bands × 8 bits: band-equality is GUARANTEED
                       # for any pair at hamming ≤ 7 (pigeonhole), so the
                       # banded plan finds exactly the brute-force pairs
                       # for every hamming_max < 8.


def phash_near_dups(ds, hamming_max: int = 6, *, concurrency=(1, 4)):
    """Perceptual-hash image near-dup pairs: decode → 63-bit integer pHash
    (actor pool) → band the 64 hash bits into 8 × 8-bit LSH buckets →
    within-bucket pairs → exact XOR-popcount hamming verify ≤ hamming_max
    → distinct pairs.  With hamming_max < 8 the banding is LOSSLESS
    (pigeonhole over 8 bands), so the result equals the brute-force
    self-join the oracle runs — LSH here is purely a shuffle-size
    optimization: candidate generation moves (band, bucket, id, hash)
    rows only, never payloads, and buckets are the unit of pair work
    (100-TB posture: same as dedup.minhash_near_dups' band plan).
    Returns (id_a, id_b, hamming:int64)."""
    assert hamming_max < _PHASH_BANDS, \
        "banding guarantee requires hamming_max < n_bands"
    from ray.data.aggregate import Min

    hashes = phash_hashes(ds, concurrency=concurrency)

    def band(b: pa.Table) -> pa.Table:
        h = b["phash"].to_numpy(zero_copy_only=False)
        ids = b["media_id"].to_numpy(zero_copy_only=False)
        k = _PHASH_BANDS
        bid = np.repeat(np.arange(k, dtype=np.int64), len(h))
        hh = np.tile(h, k)
        buck = (hh >> (np.repeat(np.arange(k, dtype=np.int64), len(h)) * 8)) \
            & 0xFF
        return pa.table({
            "band": pa.array(bid),
            "bucket": pa.array(buck.astype(np.int64)),
            "media_id": pa.array(np.tile(ids, k).astype(np.int64)),
            "phash": pa.array(hh.astype(np.int64))})

    def pairs(g) -> "pd.DataFrame":
        import pandas as pd
        g = g.sort_values("media_id", kind="stable")
        ids = g["media_id"].to_numpy(np.int64)
        h = g["phash"].to_numpy(np.int64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        ia, ib = np.triu_indices(len(ids), 1)
        x = (h[ia] ^ h[ib]).astype(np.uint64)
        hd = np.zeros(len(x), np.int64)
        while x.any():
            hd += (x & 1).astype(np.int64)
            x >>= 1
        keep = hd <= hamming_max
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                             "hamming": hd[keep]})

    cand = (hashes.map_batches(band, batch_format="pyarrow")
            .groupby(["band", "bucket"])
            .map_groups(pairs, batch_format="pandas"))
    # a pair can surface from several bands — Min collapses duplicates
    # (hamming is identical for every sighting of the same pair)
    return (cand.groupby(["id_a", "id_b"])
            .aggregate(Min("hamming", alias_name="hamming")))


def spectral_stats_from_samples(s: np.ndarray, rate: int) -> tuple:
    """PCM16 samples → (n_samples, centroid_hz, bandwidth_hz,
    rolloff85_hz): magnitude-rFFT spectral centroid / bandwidth and the
    85% energy rolloff frequency — the frequency-domain triage features
    an audio-training pipeline gates on (speech vs tone vs noise) before
    paying for ASR.  Shared by the decode tier and the construction gold
    (silence_stats_from_samples convention); centroid/bandwidth are
    round6'd, rolloff is an exact bin frequency."""
    from deepkg_ray.functions.numeric import round6
    x = s.astype(np.float64)
    n = len(x)
    if n == 0:
        return 0, 0.0, 0.0, 0.0
    mag = np.abs(np.fft.rfft(x)) ** 2        # power: leakage tails
    # weigh ~quadratically less than the peak, so a sine's centroid
    # lands near its generator frequency
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    tot = mag.sum()
    if tot <= 0:
        return n, 0.0, 0.0, 0.0
    c = (freqs * mag).sum() / tot
    bw = np.sqrt(((freqs - c) ** 2 * mag).sum() / tot)
    cum = np.cumsum(mag)
    k = int(np.searchsorted(cum, 0.85 * tot))
    roll = float(freqs[min(k, len(freqs) - 1)])
    r6 = round6(np.asarray([c, bw, roll], np.float64))
    return n, float(r6[0]), float(r6[1]), float(r6[2])


class SpectralAnalyzer:
    """Audio-only decode stage: WAV payload → spectral statistics
    (SilenceAnalyzer's actor contract; stateless, __init__/__call__
    split kept for drop-in codec tiers)."""

    def __init__(self):
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["media_type"], pa.scalar("audio"))
        batch = batch.filter(keep)
        ids, ns, cen, bw, roll = [], [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            s, rate = decode_wav(payload)
            a, b, c, d = spectral_stats_from_samples(s, rate)
            ids.append(mid); ns.append(a)
            cen.append(b); bw.append(c); roll.append(d)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "n_samples": pa.array(ns, pa.int64()),
            "centroid_hz": pa.array(cen, pa.float64()),
            "bandwidth_hz": pa.array(bw, pa.float64()),
            "rolloff85_hz": pa.array(roll, pa.float64())})


def audio_spectral(ds, *, concurrency=(1, 4), batch_size: int = 64):
    """media Dataset → per-audio-item spectral stats (actor pool, wide
    payload rows ⇒ small batches, the decode_features posture)."""
    return ds.map_batches(SpectralAnalyzer, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


def audio_spectral_gold(n: int = 64, seed: int = 5) -> pa.Table:
    """Expected audio_spectral output from the RAW sample arrays (never
    through encode/decode bytes)."""
    items = [d for d in _real_media_items(n, seed)
             if d["media_type"] == "audio"]
    rows = [spectral_stats_from_samples(d["raw"], d["meta_sample_rate"])
            for d in items]
    return pa.table({
        "media_id": pa.array([d["media_id"] for d in items], pa.int64()),
        "n_samples": pa.array([r[0] for r in rows], pa.int64()),
        "centroid_hz": pa.array([r[1] for r in rows], pa.float64()),
        "bandwidth_hz": pa.array([r[2] for r in rows], pa.float64()),
        "rolloff85_hz": pa.array([r[3] for r in rows], pa.float64())})


def spectral_gold_path() -> str:
    """Idempotent golden parquet for audio_spectral (media_gold_paths
    convention)."""
    import os

    import pyarrow.parquet as pq

    from deepkg_ray import synth
    root = os.path.join(synth.SYNTH_ROOT, synth.SYNTH_VERSION)
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "audio_spectral_gold_v2.parquet")
    if not os.path.exists(path):
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(audio_spectral_gold(n=256), tmp)
        os.replace(tmp, path)
    return path
