"""Bit-faithful reimplementation of the reference's RLE run *selection*.

The production codec (:mod:`parquetjs_ray.codecs.rle`) is vectorized and
may pick different (decode-compatible) runs. This oracle replicates the
reference encoder's exact sequential behavior
(`/root/reference/lib/codec/rle.js:35-93`) so we can (a) assert golden
byte equality and (b) compute the reference's *sizes* for the baseline
comparison in BASELINE.md:

* a repeated run opens only when the pending bit-packed run length is a
  multiple of 8 and ``values[i] == values[i+1]`` (`rle.js:59`);
* bit-packed runs are zero-padded to a multiple of 8 values with header
  ``varint((len/8) << 1 | 1)`` (`rle.js:3-19`);
* repeated runs use header ``varint(count << 1)`` and ``ceil(width/8)``
  value bytes (`rle.js:21-33`).

One documented divergence: the reference writes the same low byte into
every position of a multi-byte repeated value (`rle.js:26` discards the
shift), corrupting widths > 8. We write correct little-endian bytes —
identical length, so all size accounting matches, and byte-identical
output for width ≤ 8 (every reference test vector).
"""

from __future__ import annotations

import numpy as np

from ..codecs.rle import _encode_bitpacked, _encode_repeated, _varint  # shared helpers

__all__ = ["encode_reference", "reference_rle_size"]


def encode_reference(values, width: int, *, disable_envelope: bool = False) -> bytes:
    vals = [int(v) for v in np.asarray(values)]
    n = len(vals)
    parts: list[bytes] = []
    run: list[int] = []
    repeats = 0
    for i in range(n):
        nxt = vals[i + 1] if i + 1 < n else None
        if repeats == 0 and len(run) % 8 == 0 and vals[i] == nxt:
            if run:
                parts.append(_encode_bitpacked(np.array(run, dtype=np.uint64), width))
                run = []
            repeats = 1
        elif repeats > 0 and vals[i] == vals[i - 1]:
            repeats += 1
        else:
            if repeats:
                parts.append(_encode_repeated(vals[i - 1], repeats, width))
                repeats = 0
            run.append(vals[i])
    if repeats:
        parts.append(_encode_repeated(vals[-1], repeats, width))
    elif run:
        parts.append(_encode_bitpacked(np.array(run, dtype=np.uint64), width))
    buf = b"".join(parts)
    if disable_envelope:
        return buf
    return len(buf).to_bytes(4, "little") + buf


def reference_rle_size(values, width: int, *, disable_envelope: bool = False) -> int:
    return len(encode_reference(values, width, disable_envelope=disable_envelope))
