"""Multimodal column plumbing (image/audio/video as opaque binary).

Decode is IMPORT-GATED: ``decoder="real"`` uses PIL for images when it is
importable and raises ``NotImplementedError`` at actor construction when
it is not (this container ships neither PIL nor ffmpeg) — the gate is
honest both ways: with PIL present the real path decodes/resizes actual
image bytes (gated test), without it the plug point fails loudly.  Audio/
video frame decode needs ffmpeg and stays a declared stub either way.
``decoder="fake"`` (default) produces a deterministic hash-derived feature
vector so the Ray-side plumbing — schema, batch sizing, actor signature,
output layout — is real and tested regardless of libraries.

Design per the build brief: decode/feature-extract runs as an actor-pool
``map_batches`` stage with small batches (large binary payloads), emitting
fixed-width feature columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _try_import_pil():
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),          # opaque encoded bytes
    ("width", pa.int32()),             # typed metadata (nullable)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])

FEATURE_DIM = 16


def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table matching MEDIA_SCHEMA."""
    rng = np.random.RandomState(seed)
    kinds = np.array(["image", "audio", "video"])[rng.randint(0, 3, n)]
    payloads = [rng.randint(0, 256, payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_ref": pa.array([f"media://cat/{i:06d}.bin" for i in range(n)]),
        "kind": pa.array(list(kinds)),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(rng.randint(16, 4096, n).astype(np.int32)),
        "height": pa.array(rng.randint(16, 4096, n).astype(np.int32)),
        "duration_ms": pa.array(rng.randint(0, 600000, n).astype(np.int32)),
    })


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract media payloads.

    ``__init__`` loads the decoder ONCE per actor (the expensive part for a
    real model); ``__call__`` processes one (small) batch.  Use
    ``map_batches(MediaFeatureExtractor, batch_size=64, concurrency=(2, 8),
    num_cpus=1)`` — small batches because payloads are large.
    """

    def __init__(self, decoder: str = "fake"):
        self._pil = None
        if decoder == "real":
            self._pil = _try_import_pil()
            if self._pil is None:
                raise NotImplementedError(
                    "real media decoding requires PIL (images) — not "
                    "importable in this container; the import-gated real "
                    "path activates automatically where PIL exists")
        self.decoder = decoder

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        # deterministic pseudo-features from payload bytes
        arr = np.frombuffer(payload, dtype=np.uint8)
        chunks = np.array_split(arr.astype(np.float64), FEATURE_DIM)
        return np.array([c.mean() if len(c) else 0.0 for c in chunks])

    def _real_decode_image(self, payload: bytes) -> np.ndarray:
        """PIL path: decode → grayscale → 4×4 mean-pool = FEATURE_DIM."""
        import io

        img = self._pil.open(io.BytesIO(payload)).convert("L").resize((4, 4))
        return np.asarray(img, dtype=np.float64).ravel()

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if self._pil is not None and kind == "image":
            try:
                return self._real_decode_image(payload)
            except Exception:
                return np.zeros(FEATURE_DIM)  # undecodable bytes
        # audio/video need ffmpeg (absent): deterministic stub either way
        return self._fake_decode(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.stack([self._decode(p, k) for p, k in
                          zip(batch["payload"].to_pylist(),
                              batch["kind"].to_pylist())])
        return pa.table({
            "media_ref": batch["media_ref"],
            "kind": batch["kind"],
            "feature": pa.array(list(feats), pa.list_(pa.float64(), FEATURE_DIM)),
        })


def extract_media_features(ds, *, batch_size: int = 64, concurrency=(2, 4)):
    """The plumbing: small batches, actor pool, fixed-width output."""
    return ds.map_batches(
        MediaFeatureExtractor, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs={"decoder": "fake"},
        concurrency=concurrency, num_cpus=1,
    )


RESIZE_H, RESIZE_W = 8, 8


class MediaResizer:
    """Actor-pool resize stage (images): payload → fixed (H×W) pixel grid.

    The interpolation itself is stubbed deterministically (byte grid mean-
    pooled to H×W — a real PIL/cv2 resize plugs into ``_resize``); the
    Ray-side geometry is real: fixed-size-list output column, small batches,
    per-actor setup in ``__init__``.
    """

    def __init__(self, decoder: str = "fake"):
        self._pil = None
        if decoder == "real":
            self._pil = _try_import_pil()
            if self._pil is None:
                raise NotImplementedError(
                    "real image resize requires PIL — not importable in "
                    "this container; activates automatically where PIL "
                    "exists")

    def _resize(self, payload: bytes) -> np.ndarray:
        if self._pil is not None:
            try:
                img = self._pil.open(__import__("io").BytesIO(payload))
                img = img.convert("L").resize((RESIZE_W, RESIZE_H))
                return np.asarray(img, dtype=np.float64).ravel()
            except Exception:
                return np.zeros(RESIZE_H * RESIZE_W)
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        side = max(int(len(arr) ** 0.5), 1)
        grid = arr[: side * side].reshape(side, side)
        ys = np.array_split(grid, RESIZE_H, axis=0)
        return np.array([[x.mean() if x.size else 0.0
                          for x in np.array_split(y, RESIZE_W, axis=1)]
                         for y in ys]).ravel()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        imgs = batch.filter(pc.equal(batch["kind"], "image"))
        if not imgs.num_rows:
            return pa.table({"media_ref": pa.array([], pa.string()),
                             "pixels": pa.array([], pa.list_(
                                 pa.float64(), RESIZE_H * RESIZE_W))})
        px = np.stack([self._resize(p) for p in imgs["payload"].to_pylist()])
        return pa.table({
            "media_ref": imgs["media_ref"],
            "pixels": pa.array(list(px), pa.list_(pa.float64(),
                                                  RESIZE_H * RESIZE_W)),
        })


class FrameSampler:
    """Actor-pool frame-sampling stage (videos): one INPUT row explodes to
    ``n_frames`` OUTPUT rows (media_ref, frame_idx, ts_ms, feature) — the
    row-expanding geometry a real ffmpeg sampler has; frame decode is the
    deterministic stub."""

    def __init__(self, n_frames: int = 4, decoder: str = "fake"):
        if decoder == "real":
            raise NotImplementedError(
                "real frame sampling requires ffmpeg — plug in here")
        self.n_frames = n_frames
        self._fx = MediaFeatureExtractor(decoder)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vids = batch.filter(pc.equal(batch["kind"], "video"))
        refs, idxs, ts, feats = [], [], [], []
        for ref, payload, dur in zip(vids["media_ref"].to_pylist(),
                                     vids["payload"].to_pylist(),
                                     vids["duration_ms"].to_pylist()):
            dur = dur or 0
            for f in range(self.n_frames):
                # deterministic "frame" = payload slice per frame index
                lo = (len(payload) * f) // self.n_frames
                hi = (len(payload) * (f + 1)) // self.n_frames
                refs.append(ref)
                idxs.append(f)
                ts.append((dur * f) // max(self.n_frames, 1))
                feats.append(self._fx._fake_decode(payload[lo:hi] or b"\0"))
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "ts_ms": pa.array(ts, pa.int64()),
            "feature": pa.array([list(f) for f in feats],
                                pa.list_(pa.float64(), FEATURE_DIM)),
        })


def sample_video_frames(ds, *, n_frames: int = 4, batch_size: int = 32,
                        concurrency=(2, 4)):
    """Row-exploding frame sampling: small batches (video payloads are the
    largest), actor pool, fixed-width per-frame features."""
    return ds.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs={"n_frames": n_frames, "decoder": "fake"},
        concurrency=concurrency, num_cpus=1,
    )


def resize_images(ds, *, batch_size: int = 64, concurrency=(2, 4)):
    return ds.map_batches(
        MediaResizer, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs={"decoder": "fake"},
        concurrency=concurrency, num_cpus=1,
    )
