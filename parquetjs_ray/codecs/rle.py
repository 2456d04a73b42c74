"""Parquet RLE / bit-pack hybrid codec, parquetjs semantics, vectorized.

Stream grammar (identical to `/root/reference/lib/codec/rle.js:35-150`):

* optional 4-byte LE length envelope (absent when ``disable_envelope``),
* then a sequence of runs until ``count`` values are produced:
  - header ``varint((groups << 1) | 1)`` → bit-packed run of ``groups*8``
    values, LSB-first, ``width`` bits each (`rle.js:3-19`);
  - header ``varint(count << 1)`` → repeated run: one value stored in
    ``ceil(width/8)`` bytes (`rle.js:21-33`).
* the final bit-packed run may be zero-padded to a multiple of 8 values;
  the decoder truncates to ``count`` (`rle.js:143`).

Documented divergence from the reference: its repeated-run value bytes
drop every byte but the lowest (`rle.js:26` and `rle.js:114` discard the
shift result), so values > 255 with ``width > 8`` corrupt. We write and
read proper little-endian multi-byte values — all reference golden
vectors (`/root/reference/test/codec_rle.js`) use width ≤ 6 and are
byte-identical under both schemes.

Run selection: the reference opens a repeated run whenever the pending
bit-packed run sits at a multiple-of-8 position and the next two values
are equal (`rle.js:59`), which is inherently sequential. This encoder
uses a decode-compatible *vectorized* greedy: maximal equal-value runs
of length ≥ 8 become repeated runs (head-trimmed so every interior
bit-packed gap stays a multiple of 8 values); everything else is
bit-packed. On the reference's own test vectors the output is
byte-identical. `parquetjs_ray.oracle.parquetjs_rle` replicates the
reference's exact run selection for size accounting.
"""

from __future__ import annotations

import struct

import numpy as np

from .bitpack import pack_bits, unpack_bits

__all__ = ["encode", "decode"]

_MIN_REPEAT = 8  # shortest maximal run worth a repeated-run encoding


def _varint(value: int) -> bytes:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: np.ndarray, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = int(buf[pos])
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _find_long_runs(v: np.ndarray) -> list[tuple[int, int]]:
    """Maximal equal-value runs of length ≥ 8, as (start, end) pairs.

    Memory-lean: a windowed AND over the equality mask finds every
    position that starts 8 equal values; consecutive candidates collapse
    into maximal runs. Temporaries are two bool arrays (n bytes) plus
    O(bytes-in-runs) ints — never the O(n) int64 run-boundary arrays a
    naive ``diff``-based scan would allocate (fresh allocations are the
    dominant cost on this sandbox)."""
    n = len(v)
    if n < _MIN_REPEAT:
        return []
    eq = v[1:] == v[:-1]
    m = eq[: n - 7].copy()
    for i in range(1, 7):
        m &= eq[i : n - 7 + i]
    cand = np.flatnonzero(m)  # starts of 8-value equal windows
    if not len(cand):
        return []
    brk = np.flatnonzero(np.diff(cand) > 1)
    seg_first = np.concatenate(([0], brk + 1))
    seg_last = np.concatenate((brk, [len(cand) - 1]))
    return [(int(cand[a]), int(cand[b]) + 8) for a, b in zip(seg_first, seg_last)]


def _encode_bitpacked(values: np.ndarray, width: int) -> bytes:
    n = len(values)
    pad = (-n) % 8
    if pad:
        values = np.concatenate([values, np.zeros(pad, dtype=values.dtype)])
    groups = len(values) // 8
    return _varint((groups << 1) | 1) + pack_bits(values, width)


def _encode_repeated(value: int, count: int, width: int) -> bytes:
    nbytes = (width + 7) // 8
    return _varint(count << 1) + int(value).to_bytes(nbytes, "little")


def encode(values: np.ndarray, width: int, *, disable_envelope: bool = False) -> bytes:
    """Encode non-negative ints (< 2**width) into the hybrid stream.

    Works in the input's own integer width (a signed input is viewed as
    unsigned, zero-copy) — no full-size uint64 staging copy; large fresh
    allocations are the dominant cost on this sandbox."""
    from .bitpack import _unsigned_view

    v = _unsigned_view(values)
    n = len(v)
    parts: list[bytes] = []
    if n:
        pend = 0  # start of the pending bit-packed region
        for s, e in _find_long_runs(v):
            if s < pend:  # overlap after an earlier trim (defensive)
                s = pend
            gap = s - pend
            steal = (-gap) % 8  # move run-head values into the gap to 8-align it
            if e - (s + steal) < _MIN_REPEAT:
                continue  # stealing would leave too short a run; keep bit-packed
            s += steal
            if s > pend:
                parts.append(_encode_bitpacked(v[pend:s], width))
            parts.append(_encode_repeated(int(v[s]), e - s, width))
            pend = e
        if pend < n:
            parts.append(_encode_bitpacked(v[pend:n], width))
    buf = b"".join(parts)
    if disable_envelope:
        return buf
    return struct.pack("<I", len(buf)) + buf


def decode(
    buf: bytes | memoryview,
    count: int,
    width: int,
    *,
    disable_envelope: bool = False,
) -> np.ndarray:
    """Decode ``count`` values; returns the narrowest unsigned array
    (uint32 for width ≤ 32, else uint64) to bound memory footprint."""
    dt = np.uint32 if width <= 32 else np.uint64
    raw = np.frombuffer(buf, dtype=np.uint8)
    pos = 0
    if not disable_envelope:
        pos += 4  # skip LE length envelope (`rle.js:127-129`)
    chunks: list[np.ndarray] = []
    produced = 0
    while produced < count:
        header, pos = _read_varint(raw, pos)
        if header & 1:
            run = (header >> 1) * 8
            nbytes = width * (run // 8)
            chunks.append(unpack_bits(raw[pos : pos + nbytes], run, width).astype(dt, copy=False))
            pos += nbytes
        else:
            run = header >> 1
            nbytes = (width + 7) // 8
            value = int.from_bytes(raw[pos : pos + nbytes].tobytes(), "little")
            chunks.append(np.full(run, value, dtype=dt))
            pos += nbytes
        produced += run
    out = np.concatenate(chunks) if chunks else np.zeros(0, dtype=dt)
    return out[:count]
