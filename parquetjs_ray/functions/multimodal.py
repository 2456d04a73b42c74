"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with typed
metadata columns next to them; decode / feature-extract / resize /
frame-sample run as actor-pool ``map_batches`` stages (model + codec
state loaded once per actor in ``__init__``).

The actual codec libraries (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode step is stubbed: ``decode_image`` raises
``NotImplementedError`` unless a deterministic fake is requested. The
Ray-side plumbing — schema, batch sizing for large payloads, actor
signature, output layout — is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["MEDIA_SCHEMA", "synth_media_table", "ImageFeatureActor", "decode_image"]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),  # opaque encoded bytes (jpeg/png/wav/...)
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
    ]
)


def synth_media_table(rows: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table (payload = seeded random bytes)."""
    rng = np.random.default_rng(seed)
    sizes = rng.integers(512, 8192, rows)
    payloads = [rng.integers(0, 256, int(s)).astype(np.uint8).tobytes() for s in sizes]
    return pa.Table.from_arrays(
        [
            pa.array([f"img{1000+i}" for i in range(rows)], pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(["image"] * rows, pa.string()),
            pa.array(rng.integers(32, 512, rows).astype(np.int32)),
            pa.array(rng.integers(32, 512, rows).astype(np.int32)),
            pa.array([len(p) for p in payloads], pa.int64()),
        ],
        schema=MEDIA_SCHEMA,
    )


def decode_image(payload: bytes, *, fake: bool = False) -> np.ndarray:
    """Decode an encoded image to an HxWx3 array.

    Real decoding needs PIL/libjpeg (not in this container) — callers in
    production would install them and this function would use them.
    ``fake=True`` returns a deterministic 8×8×3 array derived from the
    payload bytes so the pipeline plumbing is testable end-to-end.
    """
    try:
        from PIL import Image  # noqa: F401  (absent in this sandbox)
    except ImportError:
        if not fake:
            raise NotImplementedError(
                "image decoding requires PIL/libjpeg, not available in this container; "
                "pass fake=True for the deterministic test double"
            )
        h = np.frombuffer(payload[:192].ljust(192, b"\0"), dtype=np.uint8)
        return h.reshape(8, 8, 3)
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))


class ImageFeatureActor:
    """Actor-pool stage: decode + featurize image payloads.

    ``__init__`` loads the "model" once per actor (a seeded projection
    matrix standing in for real weights); ``__call__`` is vectorized over
    the batch except the per-image decode (inherent to codecs). Use
    small ``batch_size`` (payloads are large) and ``concurrency`` sized
    to the node, e.g.::

        ds.map_batches(ImageFeatureActor, batch_format="pyarrow",
                       batch_size=64, concurrency=8, num_cpus=1)
    """

    FEAT_DIM = 16

    def __init__(self, seed: int = 5, fake_decode: bool = True):
        rng = np.random.default_rng(seed)
        self.weights = rng.standard_normal((192, self.FEAT_DIM)).astype(np.float32)
        self.fake = fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.empty((batch.num_rows, self.FEAT_DIM), dtype=np.float32)
        payloads = batch["payload"].to_pylist()
        for i, payload in enumerate(payloads):  # per-image decode is inherent
            img = decode_image(payload, fake=self.fake)
            feats[i] = img.reshape(-1).astype(np.float32) @ self.weights
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), self.FEAT_DIM
                ),
            }
        )


class ImageResizeActor:
    """Actor-pool resize stage: decode → resize → re-emit payload+dims.

    Real resizing needs PIL (absent here); the deterministic fake
    nearest-neighbor-resizes the stub-decoded 8×8 image so batch sizing,
    schema, and actor plumbing are real and testable."""

    def __init__(self, width: int = 64, height: int = 64, fake_decode: bool = True):
        self.w, self.h = width, height
        self.fake = fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payloads = []
        for payload in batch["payload"].to_pylist():
            img = decode_image(payload, fake=self.fake)
            yi = (np.arange(self.h) * img.shape[0] // self.h)[:, None]
            xi = (np.arange(self.w) * img.shape[1] // self.w)[None, :]
            out_payloads.append(img[yi, xi].tobytes())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": pa.array(out_payloads, pa.binary()),
                "width": pa.array([self.w] * batch.num_rows, pa.int32()),
                "height": pa.array([self.h] * batch.num_rows, pa.int32()),
            }
        )


def frame_sample(batch: pa.Table, *, every_n: int = 10) -> pa.Table:
    """Video frame-sampling stage (stub codec): emits one row per sampled
    frame with deterministic fake frame payloads. The real implementation
    would call ffmpeg per payload inside an actor; the Ray-side explode
    (one input row → many frame rows) is the part exercised here."""
    media_ids, frame_idx, frames = [], [], []
    for mid, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
        n_frames = max(1, len(payload) // 1024)
        for i in range(0, n_frames, every_n):
            media_ids.append(mid)
            frame_idx.append(i)
            frames.append(payload[i * 512 : i * 512 + 192].ljust(192, b"\0"))
    return pa.table(
        {
            "media_id": pa.array(media_ids, pa.string()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "frame_payload": pa.array(frames, pa.binary()),
        }
    )
