"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with a
``media_type`` tag; decode / feature-extract / resize / frame-sample are
actor-pool map_batches stages.  The decode libraries are not available in
this container, so the codec boundary is STUBBED: ``FakeDecoder`` is a
deterministic stand-in (hash-seeded pseudo-pixels) and ``LibDecoder`` raises
``NotImplementedError`` unless PIL/soundfile import.  The Ray-side plumbing
— schema, batch sizing for wide binary rows, actor signature, output layout
— is real and tested.

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
