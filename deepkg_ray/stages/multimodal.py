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
    parts = payload.split(maxsplit=4)          # P6, w, h, maxval, raster
    w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    raster = parts[4] if len(parts) == 5 else b""
    px = np.frombuffer(raster[: w * h * 3], dtype=np.uint8)
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


def synth_real_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Media rows whose payloads are VALID encoded formats: gradient-
    pattern P6 PPM images and sine-wave PCM16 WAVs — the real-decode tier's
    test corpus (no codec libs needed to produce or parse them)."""
    rng = np.random.default_rng(seed)
    ids, types, payloads, w_, h_, sr = [], [], [], [], [], []
    for i in range(n):
        is_img = i % 2 == 0
        ids.append(i)
        if is_img:
            w = int(rng.integers(8, 48))
            h = int(rng.integers(8, 48))
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack([(xx * 255 // max(w - 1, 1)),
                           (yy * 255 // max(h - 1, 1)),
                           np.full((h, w), int(rng.integers(0, 256)))],
                          axis=-1).astype(np.uint8)
            payloads.append(encode_ppm(px))
            types.append("image")
            w_.append(w)
            h_.append(h)
            sr.append(0)
        else:
            rate = 16000
            dur = int(rng.integers(400, 1600))
            freq = float(rng.integers(100, 2000))
            t = np.arange(dur, dtype=np.float64) / rate
            s = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
            payloads.append(encode_wav(s, rate))
            types.append("audio")
            w_.append(0)
            h_.append(0)
            sr.append(rate)
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta_width": pa.array(w_, pa.int32()),
        "meta_height": pa.array(h_, pa.int32()),
        "meta_sample_rate": pa.array(sr, pa.int32()),
    }, schema=MEDIA_SCHEMA)


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
        px = decode_ppm(payload)
        small = resize_nearest(px, 16, 16).astype(np.float32) / 255.0
        mean = small.mean(axis=(0, 1))
        std = small.std(axis=(0, 1))
        gray = small.mean(axis=2)
        hist, _ = np.histogram(gray, bins=10, range=(0.0, 1.0))
        hist = hist.astype(np.float32) / gray.size
        return np.concatenate([mean, std, hist]).astype(np.float32)

    def _audio_features(self, payload: bytes) -> np.ndarray:
        s, rate = decode_wav(payload)
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


def synth_video_table(n: int = 8, seed: int = 9) -> pa.Table:
    """Video rows: concatenated-P6 payloads of 6-16 gradient frames."""
    rng = np.random.default_rng(seed)
    ids, payloads, counts = [], [], []
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
        ids.append(i)
        payloads.append(encode_ppm_video(frames))
        counts.append(k)
    return pa.table({"media_id": pa.array(ids, pa.int64()),
                     "payload": pa.array(payloads, pa.binary()),
                     "n_frames_true": pa.array(counts, pa.int64())})
