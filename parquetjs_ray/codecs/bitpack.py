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

__all__ = ["bit_width", "pack_bits", "unpack_bits", "pack_words", "unpack_words"]


def bit_width(max_value: int) -> int:
    """Bits needed to represent ``max_value`` (non-negative).

    Mirrors the reference's ``getBitWidth`` = ceil(log2(v+1))
    (`/root/reference/lib/util.js:37-43`): 0 → 0, 1 → 1, 7 → 3, 8 → 4.
    """
    if max_value < 0:
        raise ValueError("bit_width requires a non-negative value")
    return int(max_value).bit_length()


_BYTE_WIDTH_DTYPE = {8: "<u1", 16: "<u2", 32: "<u4", 64: "<u8"}
_CHUNK = 1 << 21  # values per packing block (multiple of 8 → byte-aligned)


def _pack_block(v: np.ndarray, width: int, bits_buf: np.ndarray) -> bytes:
    n = len(v)
    bits = bits_buf[: n * width].reshape(n, width)
    one = v.dtype.type(1)
    for i in range(width):
        np.bitwise_and(v >> v.dtype.type(i), one, out=bits[:, i], casting="unsafe")
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def _unsigned_view(values: np.ndarray) -> np.ndarray:
    """Reinterpret a signed array as unsigned of the same width (no copy).

    Callers guarantee values are non-negative, so the bit patterns are
    identical; the view avoids a full-width uint64 copy — large fresh
    allocations are what this sandbox punishes most (see __init__)."""
    v = np.ascontiguousarray(values)
    if v.dtype.kind == "i":
        return v.view(f"u{v.dtype.itemsize}")
    if v.dtype.kind != "u":
        return v.astype(np.uint64)
    return v


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative ints into an LSB-first bitstream of ``width`` bits each.

    The output is padded with zero bits to a whole byte (numpy packbits
    semantics); callers that need value-granular padding (RLE runs padded to
    a multiple of 8 *values*) pad ``values`` themselves.

    Byte-multiple widths (8/16/32/64) are a straight dtype cast (memcpy
    speed); other widths use a per-bit vectorized loop over bounded-size
    blocks — never a quadratic ``(n, width)`` broadcast and never a fresh
    full-size uint64 copy (memory footprint is the hot cost here).
    """
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64 unsupported")
    v = _unsigned_view(values)
    if width > v.dtype.itemsize * 8:
        v = v.astype(np.uint64)
    if width in _BYTE_WIDTH_DTYPE:
        return v.astype(_BYTE_WIDTH_DTYPE[width], copy=False).tobytes()
    if n <= _CHUNK:
        return _pack_block(v, width, np.empty(n * width, dtype=np.uint8))
    bits_buf = np.empty(_CHUNK * width, dtype=np.uint8)
    return b"".join(_pack_block(v[s : s + _CHUNK], width, bits_buf) for s in range(0, n, _CHUNK))


def unpack_bits(buf: bytes | np.ndarray, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`.

    Returns the narrowest unsigned dtype that holds ``width`` bits
    (uint8/16/32/64) — callers cast as needed; keeping outputs narrow
    bounds the memory footprint, the dominant cost on this sandbox."""
    dt = np.uint8 if width <= 8 else np.uint16 if width <= 16 else np.uint32 if width <= 32 else np.uint64
    if width == 0 or n == 0:
        return np.zeros(n, dtype=dt)
    raw = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else buf
    need = (n * width + 7) // 8
    if len(raw) < need:
        raise ValueError(f"buffer too small: {len(raw)} < {need}")
    if width in _BYTE_WIDTH_DTYPE:
        return np.frombuffer(raw[:need].tobytes(), dtype=_BYTE_WIDTH_DTYPE[width], count=n)
    if width in (2, 4):
        # byte-aligned sub-byte widths (8 % width == 0): k strided
        # shift+mask passes over n/k-sized views beat unpackbits 3-5×
        # (width 1 IS unpackbits' native case, so it keeps the loop below)
        k = 8 // width
        src = raw[:need]
        out2 = np.empty((need, k), dtype=np.uint8)
        mask = np.uint8((1 << width) - 1)
        for i in range(k):
            np.bitwise_and(src >> np.uint8(i * width), mask, out=out2[:, i])
        return out2.reshape(-1)[:n]
    out = np.empty(n, dtype=dt)
    for s in range(0, n, _CHUNK):
        e = min(s + _CHUNK, n)
        bits = np.unpackbits(raw[s * width // 8 : (e * width + 7) // 8], bitorder="little")
        block = out[s:e]
        block[:] = 0
        bm = bits[: (e - s) * width].reshape(e - s, width)
        for i in range(width):
            block |= (bm[:, i].astype(dt) << dt(i))
    return out


def pack_words(values: np.ndarray, width: int) -> bytes:
    """Pack ``width``-bit values k-per-64-bit-word (k = 64 // width),
    LSB-first within each word; the last word is zero-padded.

    Trades (64 mod width) wasted bits per word for k-strided vectorized
    passes instead of a per-BIT loop — 3-5× faster than :func:`pack_bits`
    for widths 5..32, which is where heavy-tailed class streams live.
    """
    if width <= 0 or width > 64:
        raise ValueError(f"width {width} out of range")
    k = 64 // width
    v = _unsigned_view(values)
    if v.dtype != np.uint64:
        v = v.astype(np.uint64)
    n = len(v)
    if n == 0:
        return b""
    m = (n + k - 1) // k
    vv = v
    if m * k != n:
        vv = np.zeros(m * k, dtype=np.uint64)
        vv[:n] = v
    words = np.zeros(m, dtype=np.uint64)
    for i in range(k):
        words |= vv[i::k] << np.uint64(i * width)
    return words.tobytes()


def unpack_words(buf: bytes | np.ndarray, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_words` → uint64 array of length ``n``."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    k = 64 // width
    words = np.frombuffer(buf, dtype=np.uint64) if isinstance(buf, (bytes, bytearray, memoryview)) else buf
    mask = np.uint64((1 << width) - 1) if width < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
    out = np.empty(len(words) * k, dtype=np.uint64)
    for i in range(k):
        out[i::k] = (words >> np.uint64(i * width)) & mask
    return out[:n]
