"""Frame-of-reference + RLE/bit-pack codec for integer columns.

Not present in the reference (its only codecs are PLAIN and RLE,
`/root/reference/lib/codec/index.js:1-2`); this is one of the new
lightweight codecs the north rule adds. Values are rebased by the chunk
minimum, then the non-negative residuals go through the parquetjs-style
RLE/bit-pack hybrid (:mod:`parquetjs_ray.codecs.rle`), so both narrow
value ranges (bit width) and runs (RLE) pay off.

Chunk parameters (reference value, bit width, count) live in the
partition manifest, not inline — the encoded buffer is the bare hybrid
stream without envelope.
"""

from __future__ import annotations

import numpy as np

from . import rle
from .bitpack import bit_width

__all__ = ["encode", "decode", "estimate_size"]


def encode(values: np.ndarray) -> tuple[bytes, dict]:
    """Encode an integer array → (buffer, params for the manifest).

    Residuals are computed with wrap-around subtraction in the input's
    own width (then viewed unsigned) — correct because the true span
    fits the unsigned width, and it avoids a full-size int64 staging
    copy (large fresh allocations dominate cost on this sandbox)."""
    v = np.ascontiguousarray(values)
    n = len(v)
    if n == 0:
        return b"", {"ref": 0, "width": 0, "count": 0}
    lo = int(v.min())
    hi = int(v.max())
    width = bit_width(hi - lo)
    if v.dtype.itemsize <= 4:
        residuals = np.subtract(v, v.dtype.type(lo)).view(f"u{v.dtype.itemsize}")
    elif hi - lo < (1 << 32):
        residuals = np.subtract(v, lo).astype(np.uint32)
    else:
        residuals = np.subtract(v, lo).view(np.uint64)
    buf = rle.encode(residuals, width, disable_envelope=True)
    return buf, {"ref": lo, "width": width, "count": n}


def decode(buf: bytes, params: dict, dtype=np.int64) -> np.ndarray:
    n = int(params["count"])
    dtype = np.dtype(dtype)
    if n == 0:
        return np.zeros(0, dtype=dtype)
    lo = int(params["ref"])
    residuals = rle.decode(buf, n, int(params["width"]), disable_envelope=True)
    if dtype.itemsize <= 4 and int(params["width"]) <= 32:
        out = residuals.astype(dtype.str.replace("i", "u"), copy=False).view(dtype)
        out = out + dtype.type(lo)  # wrap-around add: true values fit dtype
        return out
    if dtype.kind == "u" and dtype.itemsize == 8:
        # uint64: lo may exceed int64 range; stay in uint64 (wrap-around exact)
        out = residuals.astype(np.uint64)
        out += np.uint64(lo)
        return out
    out = residuals.astype(np.int64)
    out += lo
    return out.astype(dtype, copy=False)


def estimate_size(lo: int, hi: int, n: int, mean_run: float = 1.0) -> int:
    """Cheap size estimate in bytes (used by the codec selector)."""
    width = bit_width(max(0, hi - lo))
    if mean_run >= 8:
        # mostly repeated runs: ~ (n / mean_run) * (2 + value bytes)
        return int(n / mean_run) * (2 + (width + 7) // 8) + 16
    return (n * width + 7) // 8 + 16
