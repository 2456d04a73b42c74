"""PFOR — patched frame-of-reference (Zukowski et al., ICDE 2006 style).

For heavy-tailed integer distributions (Zipf token ids) plain FOR pays
the full tail width for every value. PFOR picks the cost-optimal base
width ``w`` from the chunk's bit-length histogram, bit-packs residuals
``< 2**w`` at ``w`` bits, and stores the few exceptions as
(position, value) side streams (both FOR+RLE encoded — positions are
ascending so their deltas compress well).

Not in the reference (its only codecs are PLAIN/RLE); one of the north
rule's lightweight additions, selected per column chunk when its
estimated size beats FOR+RLE.
"""

from __future__ import annotations

import numpy as np

from . import fornum, rle
from .bitpack import _unsigned_view, bit_width, pack_bits, unpack_bits

__all__ = ["choose_width", "encode", "decode", "estimate_size"]

_EXC_COST = 5.0  # ≈ bytes per exception (delta-packed position + value)


def _bitlen_histogram(residuals: np.ndarray) -> np.ndarray:
    """counts[w] = number of values whose bit length is exactly w (0..64)."""
    powers = np.left_shift(np.uint64(1), np.arange(1, 64, dtype=np.uint64))
    bl = np.searchsorted(powers, residuals, side="right") + 1
    bl[residuals == 0] = 0
    return np.bincount(bl, minlength=65)


def choose_width(residuals: np.ndarray, max_width: int) -> tuple[int, float]:
    """Cost-optimal base width → (width, estimated bytes)."""
    n = len(residuals)
    counts = _bitlen_histogram(residuals)
    tail = np.cumsum(counts[::-1])[::-1]  # tail[w] = #values needing > w-1 bits
    best_w, best_cost = max_width, n * max_width / 8
    for w in range(1, max_width + 1):
        exceptions = int(tail[w + 1]) if w + 1 <= 64 else 0
        cost = n * w / 8 + exceptions * _EXC_COST + 16
        if cost < best_cost:
            best_w, best_cost = w, cost
    return best_w, best_cost


def encode(values: np.ndarray) -> tuple[dict[str, bytes], dict]:
    """→ ({"base":…, "exc_pos":…, "exc_val":…}, params)."""
    v = np.ascontiguousarray(values)
    n = len(v)
    if n == 0:
        return {"base": b"", "exc_pos": b"", "exc_val": b""}, {
            "ref": 0, "width": 0, "count": 0, "n_exc": 0, "exc_pos_for": {}, "exc_val_for": {}}
    lo = int(v.min())
    hi = int(v.max())
    full_width = bit_width(hi - lo)
    if v.dtype.itemsize <= 4:
        residuals = np.subtract(v, v.dtype.type(lo)).view(f"u{v.dtype.itemsize}")
    else:
        residuals = np.subtract(v, lo).view(np.uint64)
    width, _ = choose_width(residuals, full_width)
    limit = residuals.dtype.type((1 << width) - 1) if width < 64 else residuals.dtype.type(np.iinfo(np.uint64).max)
    exc_mask = residuals > limit
    exc_pos = np.flatnonzero(exc_mask)
    # 64-bit residuals ≥ 2^63 must keep their bit pattern: view, not astype
    picked = residuals[exc_pos]
    exc_val = picked.view(np.int64) if picked.dtype.itemsize == 8 else picked.astype(np.int64)
    base = residuals if not len(exc_pos) else np.where(exc_mask, residuals.dtype.type(0), residuals)
    base_buf = pack_bits(base, width)
    pos_buf, pos_params = fornum.encode(exc_pos)
    val_buf, val_params = fornum.encode(exc_val)
    params = {
        "ref": lo,
        "width": width,
        "count": n,
        "n_exc": int(len(exc_pos)),
        "exc_pos_for": pos_params,
        "exc_val_for": val_params,
    }
    return {"base": base_buf, "exc_pos": pos_buf, "exc_val": val_buf}, params


def decode(bufs: dict[str, bytes], params: dict, dtype=np.int64) -> np.ndarray:
    n = int(params["count"])
    dtype = np.dtype(dtype)
    if n == 0:
        return np.zeros(0, dtype=dtype)
    width = int(params["width"])
    residuals = unpack_bits(bufs["base"], n, width)
    if dtype.kind == "u" and dtype.itemsize == 8:
        # uint64: ref may exceed int64 range; stay unsigned (wrap-around exact)
        out = residuals.astype(np.uint64)
        if params["n_exc"]:
            pos = fornum.decode(bufs["exc_pos"], params["exc_pos_for"])
            val = fornum.decode(bufs["exc_val"], params["exc_val_for"])
            out[pos] = val.view(np.uint64)
        out += np.uint64(int(params["ref"]))
        return out
    out64 = residuals.astype(np.int64)
    if params["n_exc"]:
        pos = fornum.decode(bufs["exc_pos"], params["exc_pos_for"])
        val = fornum.decode(bufs["exc_val"], params["exc_val_for"])
        out64[pos] = val
    out64 += int(params["ref"])
    return out64.astype(dtype, copy=False)


def estimate_size(residual_sample: np.ndarray, n_total: int, max_width: int) -> float:
    """Scaled size estimate from a sample (selector use)."""
    if len(residual_sample) == 0:
        return 0.0
    _, cost = choose_width(residual_sample, max_width)
    return cost * n_total / len(residual_sample)
