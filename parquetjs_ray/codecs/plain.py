"""PLAIN codec — Parquet plain encoding, vectorized.

Byte layouts match `/root/reference/lib/codec/plain.js`:

* BOOLEAN: one bit per value, LSB-first (`plain.js:5-28`);
* INT32/INT64/FLOAT/DOUBLE: little-endian fixed width arrays
  (`plain.js:30-68,105-143`) — for Arrow-backed numpy input this is a
  zero-copy (or single-memcpy) ``tobytes``;
* BYTE_ARRAY: ``[uint32 LE length][bytes]`` per value (`plain.js:145-175`);
* FIXED_LEN_BYTE_ARRAY: concatenated fixed-size values (`plain.js:179-209`).

INT96 is intentionally unsupported (reference-only legacy type; see
`plain.js:70-103`).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "encode_boolean",
    "decode_boolean",
    "encode_numeric",
    "decode_numeric",
    "encode_byte_array",
    "decode_byte_array",
    "encode_fixed",
    "decode_fixed",
    "encode_int96",
    "decode_int96",
    "interval_to_bytes",
    "interval_from_bytes",
]

_NUMERIC_DTYPES = {
    "INT32": np.dtype("<i4"),
    "INT64": np.dtype("<i8"),
    "FLOAT": np.dtype("<f4"),
    "DOUBLE": np.dtype("<f8"),
}


def encode_boolean(values: np.ndarray) -> bytes:
    return np.packbits(np.asarray(values, dtype=bool), bitorder="little").tobytes()


def decode_boolean(buf: bytes, count: int) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), bitorder="little")
    return bits[:count].astype(bool)


def encode_numeric(values: np.ndarray, type_name: str) -> bytes:
    dt = _NUMERIC_DTYPES[type_name]
    return np.ascontiguousarray(values, dtype=dt).tobytes()


def decode_numeric(buf: bytes | memoryview, type_name: str) -> np.ndarray:
    return np.frombuffer(buf, dtype=_NUMERIC_DTYPES[type_name])


def encode_byte_array(data: bytes | np.ndarray, offsets: np.ndarray) -> bytes:
    """Encode variable-length values given Arrow-style ``offsets`` into ``data``.

    Fully vectorized scatter: each value's 4-byte LE length lands at
    ``offsets[i] + 4*i`` and its payload bytes shift right by ``4*(i+1)``.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    src = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else data
    lo, hi = int(offsets[0]), int(offsets[-1])
    src = src[lo:hi]
    offs = offsets - lo
    lens = np.diff(offs)
    total = int(offs[-1])
    out = np.zeros(total + 4 * n, dtype=np.uint8)
    # length prefixes
    len_pos = (offs[:-1] + 4 * np.arange(n, dtype=np.int64))[:, None] + np.arange(4)
    len_bytes = lens.astype("<u4").view(np.uint8).reshape(n, 4)
    out[len_pos.reshape(-1)] = len_bytes.reshape(-1)
    # payload bytes
    if total:
        row_of_byte = np.repeat(np.arange(n, dtype=np.int64), lens)
        out[np.arange(total, dtype=np.int64) + 4 * (row_of_byte + 1)] = src
    return out.tobytes()


def decode_byte_array(buf: bytes | memoryview, count: int) -> tuple[bytes, np.ndarray]:
    """Decode ``count`` values → (concatenated data, Arrow int32 offsets)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    lens = np.empty(count, dtype=np.int64)
    pos = 0
    for i in range(count):  # sequential: each offset depends on the previous length
        lens[i] = int(raw[pos : pos + 4].view("<u4")[0])
        pos += 4 + lens[i]
    offsets = np.zeros(count + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    total = int(offsets[-1])
    out = np.empty(total, dtype=np.uint8)
    if total:
        row_of_byte = np.repeat(np.arange(count, dtype=np.int64), lens)
        out[:] = raw[np.arange(total, dtype=np.int64) + 4 * (row_of_byte + 1)]
    return out.tobytes(), offsets


def encode_fixed(data: bytes | np.ndarray, type_length: int, count: int) -> bytes:
    src = bytes(data)
    if len(src) != type_length * count:
        raise ValueError("fixed-length payload size mismatch")
    return src


def decode_fixed(buf: bytes, type_length: int, count: int) -> bytes:
    if len(buf) < type_length * count:
        raise ValueError("fixed-length buffer too small")
    return bytes(buf[: type_length * count])


def encode_int96(values: np.ndarray) -> bytes:
    """PLAIN INT96: 12-byte little-endian values, byte-identical to the
    reference (`/root/reference/lib/codec/plain.js:70-84`): low 8 bytes =
    int64 LE, upper 4 bytes = sign extension (0 or 0xFFFFFFFF).

    Divergence (documented): the reference reads/writes through INT53,
    truncating to JS's 53-bit float precision; this implementation is
    EXACT over the full int64 range (identical bytes wherever the
    reference is exact)."""
    v = np.ascontiguousarray(values, dtype="<i8")
    out = np.zeros((len(v), 12), dtype=np.uint8)
    out[:, :8] = v.view(np.uint8).reshape(-1, 8)
    out[:, 8:] = np.where((v < 0)[:, None], np.uint8(0xFF), np.uint8(0))
    return out.tobytes()


def decode_int96(buf: bytes | memoryview, count: int) -> np.ndarray:
    """Inverse of :func:`encode_int96` (the reference's high-word branch,
    `plain.js:87-103`, reduces to the identity on two's-complement int64)."""
    b = np.frombuffer(buf, dtype=np.uint8, count=count * 12).reshape(count, 12)
    return np.ascontiguousarray(b[:, :8]).view("<i8").ravel().copy()


def interval_to_bytes(months: np.ndarray, days: np.ndarray, millis: np.ndarray) -> bytes:
    """Parquet INTERVAL logical type: 12-byte FIXED_LEN_BYTE_ARRAY of
    (months, days, milliseconds) as uint32 LE each — byte-identical to
    the reference's toPrimitive_INTERVAL (`/root/reference/lib/types.js:382-401`)."""
    n = len(months)
    out = np.empty((n, 3), dtype="<u4")
    out[:, 0] = months
    out[:, 1] = days
    out[:, 2] = millis
    return out.tobytes()


def interval_from_bytes(buf: bytes | memoryview, count: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`interval_to_bytes` → (months, days, millis) uint32."""
    m = np.frombuffer(buf, dtype="<u4", count=count * 3).reshape(count, 3)
    return m[:, 0].copy(), m[:, 1].copy(), m[:, 2].copy()
