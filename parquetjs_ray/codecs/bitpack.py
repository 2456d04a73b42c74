"""LSB-first bit-packing kernels (numpy-vectorized).

Bit layout matches the reference's RLE bit-packed runs
(`/root/reference/lib/codec/rle.js:3-19`): value *i* occupies bits
``[i*width, (i+1)*width)`` of the output stream, bits are filled
LSB-first within each value and within each output byte. ``numpy``'s
``packbits/unpackbits`` with ``bitorder="little"`` implement exactly
this stream order, so both kernels are pure vectorized code with no
per-value Python loop.
"""

from __future__ import annotations

import numpy as np

__all__ = ["bit_width", "pack_bits", "unpack_bits"]


def bit_width(max_value: int) -> int:
    """Bits needed to represent ``max_value`` (non-negative).

    Mirrors the reference's ``getBitWidth`` = ceil(log2(v+1))
    (`/root/reference/lib/util.js:37-43`): 0 → 0, 1 → 1, 7 → 3, 8 → 4.
    """
    if max_value < 0:
        raise ValueError("bit_width requires a non-negative value")
    return int(max_value).bit_length()


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative ints into an LSB-first bitstream of ``width`` bits each.

    The output is padded with zero bits to a whole byte (numpy packbits
    semantics); callers that need value-granular padding (RLE runs padded to
    a multiple of 8 *values*) pad ``values`` themselves.
    """
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64 unsupported")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack_bits(buf: bytes | np.ndarray, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns ``uint64`` array of length ``n``."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else buf
    need = (n * width + 7) // 8
    if len(raw) < need:
        raise ValueError(f"buffer too small: {len(raw)} < {need}")
    bits = np.unpackbits(raw[:need], bitorder="little")[: n * width]
    w = bits.reshape(n, width).astype(np.uint64)
    weights = np.left_shift(np.uint64(1), np.arange(width, dtype=np.uint64))
    return (w * weights).sum(axis=1, dtype=np.uint64)
