"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with typed
metadata columns next to them; decode / feature-extract / resize /
frame-sample run as actor-pool ``map_batches`` stages (model + codec
state loaded once per actor in ``__init__``).

Codec reality by format: PPM (P6) images and PCM-16 WAV audio decode
NATIVELY (pure numpy / stdlib ``wave`` — real codecs, no external
deps); JPEG/PNG take the guarded PIL path (absent in this container),
and video frame extraction stays stubbed (needs ffmpeg). Opaque-payload
plumbing — schema, batch sizing for large payloads, actor signature,
output layout — is real and tested in every case.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "MEDIA_SCHEMA",
    "synth_media_table",
    "synth_audio_table",
    "ImageFeatureActor",
    "ImageResizeActor",
    "AudioFeatureActor",
    "decode_image",
    "decode_ppm",
    "encode_ppm",
    "decode_wav_pcm16",
    "encode_wav_pcm16",
    "frame_sample",
]

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


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL image decode for binary PPM (P6) — pure numpy, no external
    libs: parse the `P6 <w> <h> <maxval>` header, reshape the raw RGB
    plane. The simplest real codec a self-contained pipeline can own."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic + 3 whitespace-separated ints, then ONE whitespace byte
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i).reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def decode_image(payload: bytes, *, fake: bool = False) -> np.ndarray:
    """Decode an encoded image to an HxWx3 array.

    PPM (P6) decodes natively (pure numpy — a REAL codec path with no
    external deps); JPEG/PNG need PIL/libjpeg (not in this container) —
    production installs them and this function uses them. ``fake=True``
    returns a deterministic 8×8×3 array derived from the payload bytes
    so opaque-payload plumbing is testable end-to-end.
    """
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    try:
        from PIL import Image  # noqa: F401  (absent in this sandbox)
    except ImportError:
        if not fake:
            raise NotImplementedError(
                "non-PPM image decoding requires PIL/libjpeg, not available in this "
                "container; pass fake=True for the deterministic test double"
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
            if img.shape != (8, 8, 3):  # real images: pool to the model input
                yi = (np.arange(8) * img.shape[0] // 8)[:, None]
                xi = (np.arange(8) * img.shape[1] // 8)[None, :]
                img = img[yi, xi]
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


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL audio decode for PCM-16 WAV via the stdlib ``wave`` module →
    (mono float32 samples in [-1, 1], sample rate). No external deps."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only PCM-16 WAV supported")
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
        pcm = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
        if w.getnchannels() > 1:
            pcm = pcm.reshape(-1, w.getnchannels()).mean(axis=1)
    return pcm, rate


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(samples, -1, 1) * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


class AudioFeatureActor:
    """Actor-pool stage: REAL PCM-16 WAV decode (stdlib) + vectorized
    features per clip: duration, RMS energy, zero-crossing rate, and
    spectral centroid (numpy rfft). Same actor shape as the image stage:
    state in ``__init__``, per-batch work in ``__call__``."""

    def __init__(self, n_fft: int = 2048):
        self.n_fft = n_fft
        self.freqs: np.ndarray | None = None  # cached per (n_fft, rate)
        self._rate = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, dur_ms, rms_x1e6, zcr_x1e6, centroid_hz = [], [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            pcm, rate = decode_wav_pcm16(payload)
            n = len(pcm)
            ids.append(mid)
            dur_ms.append(int(n * 1000 // max(rate, 1)))
            rms_x1e6.append(int(np.sqrt(np.mean(pcm**2)) * 1e6) if n else 0)
            zcr_x1e6.append(int(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])) * 1e6) if n > 1 else 0)
            if n:
                seg = pcm[: self.n_fft] if n >= self.n_fft else pcm
                spec = np.abs(np.fft.rfft(seg, n=self.n_fft))
                if self.freqs is None or self._rate != rate:
                    self.freqs = np.fft.rfftfreq(self.n_fft, d=1.0 / rate)
                    self._rate = rate
                denom = float(spec.sum())
                centroid_hz.append(int((self.freqs * spec).sum() / denom) if denom > 0 else 0)
            else:
                centroid_hz.append(0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "duration_ms": pa.array(dur_ms, pa.int64()),
                "rms_x1e6": pa.array(rms_x1e6, pa.int64()),
                "zcr_x1e6": pa.array(zcr_x1e6, pa.int64()),
                "centroid_hz": pa.array(centroid_hz, pa.int64()),
            }
        )


def synth_audio_table(rows: int, seed: int = 17) -> pa.Table:
    """Deterministic REAL WAV clips (sine + noise mixes, PCM-16)."""
    rng = np.random.default_rng(seed)
    ids, payloads = [], []
    for i in range(rows):
        rate = 8000
        t = np.arange(int(rate * 0.25)) / rate  # 250 ms clips
        f = 100 + 40 * (i % 20)
        s = 0.5 * np.sin(2 * np.pi * f * t) + 0.05 * rng.standard_normal(len(t))
        ids.append(f"clip{2000 + i}")
        payloads.append(encode_wav_pcm16(s, rate))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["audio"] * rows, pa.string()),
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
