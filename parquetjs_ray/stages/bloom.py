"""Per-chunk Bloom filters for point-predicate fragment pruning.

The parquet format reserves split-block Bloom filters per column chunk
(parquet.thrift BloomFilterHeader / BloomFilterAlgorithm) so a reader
can skip row groups that cannot contain an equality operand — a feature
the reference (ironSource/parquetjs) never implements.  This module is
that idea re-expressed for the manifest-based artifact layout: zone maps
(``stages.encoder._column_zones``) prune range predicates on ordered
columns, while Bloom filters prune ``==`` predicates on HIGH-CARDINALITY,
UNORDERED columns (content strings, hash keys, scattered ids) where a
chunk's min/max spans everything and zones admit every fragment.

Design:

* classic Bloom filter, ``k`` probe bits per key derived from ONE 64-bit
  content hash by Kirsch–Mitzenstein double hashing (``h1 + i*h2``) —
  one vectorized hash pass per column per chunk at encode time;
* sizing: ``bits_per_key × n`` rounded up to a power of two (min 256
  bits, cap 2^17 = 16 KiB) — at the 10-bits/key default and k=4 the
  false-admit rate is ≈1.2%, i.e. a miss lookup reads ~1% of fragments;
* the bit array is stored base64 in the fragment manifest next to the
  zone maps, with a type tag so the query side normalizes the operand
  through the same hash;
* hashes: strings/binary use the engine's positional content fingerprint
  (``functions.text.fingerprint64``); integers wrap to their 64-bit
  two's-complement pattern and go through the mix64 finalizer — both
  sides (column at encode, scalar operand at prune) share these
  functions, so there is no cross-domain drift.

Nulls never match an equality operand and are excluded from the filter.
"""

from __future__ import annotations

import base64

import numpy as np
import pyarrow as pa

__all__ = [
    "column_hash",
    "scalar_hash",
    "build_bloom",
    "bloom_admits",
    "build_bloom_fixed",
    "bloom_mask",
    "BLOOM_K",
]

_U = np.uint64
BLOOM_K = 4
_MIN_BITS = 256
_MAX_BITS = 1 << 17  # 16 KiB per column per chunk
_H2_SALT = _U(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> _U(30))) * _U(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U(27))) * _U(0x94D049BB133111EB)
    return x ^ (x >> _U(31))


def column_hash(arr: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, str] | None:
    """(uint64 content hash per non-null value, type tag) — or ``None``
    when the type has no bloom support (floats: NaN/-0.0 equality
    semantics make hashed equality a trap; nested types: no scalar
    operand form)."""
    from ..functions.text import fingerprint64

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.drop_null()
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return fingerprint64(arr), "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        # hash the raw bytes directly (fingerprint64 reads the offsets/
        # data buffers, which binary shares with string) — a cast to
        # string would UTF-8-validate and raise on arbitrary bytes
        return fingerprint64(arr), "str"
    if pa.types.is_integer(t):
        v = arr.to_numpy(zero_copy_only=False)
        # canonical 64-bit pattern: sign-extend signed, zero-extend unsigned
        u = v.astype(np.uint64) if v.dtype.kind == "u" else v.astype(np.int64).view(np.uint64)
        return _mix64(u), "int"
    if pa.types.is_list(t) and pa.types.is_integer(t.value_type):
        # token-list columns: the bloom keys are the chunk's DISTINCT
        # flat values (so the filter sizes by vocabulary, not token
        # count) — drives the `contains` predicate's fragment pruning
        import pyarrow.compute as pc

        flat = pc.unique(pc.list_flatten(arr))
        if flat.null_count:
            flat = flat.drop_null()
        v = flat.to_numpy(zero_copy_only=False)
        u = v.astype(np.uint64) if v.dtype.kind == "u" else v.astype(np.int64).view(np.uint64)
        return _mix64(u), "int"
    return None


def scalar_hash(value, tag: str) -> int | None:
    """Hash a predicate operand into the same domain as
    :func:`column_hash`; ``None`` when the operand can't be normalized
    (leave the decision to the exact residual filter)."""
    from ..functions.text import fingerprint64

    if tag == "str":
        if isinstance(value, bytes):
            # bytes operand: hash the raw bytes, same domain as a binary
            # column's fingerprint (no lossy UTF-8 round-trip)
            return int(fingerprint64(pa.array([value], pa.binary()))[0])
        if not isinstance(value, str):
            return None
        return int(fingerprint64(pa.array([value], pa.string()))[0])
    if tag == "int":
        if isinstance(value, bool) or not isinstance(value, (int, np.integer)):
            return None
        return int(_mix64(np.array([int(value) & 0xFFFFFFFFFFFFFFFF], dtype=np.uint64))[0])
    return None


def build_bloom(hashes: np.ndarray, tag: str, bits_per_key: int = 10) -> dict:
    """Bit array sized to the chunk's key count → JSON-safe manifest entry."""
    n = max(1, len(hashes))
    m = _MIN_BITS
    while m < n * bits_per_key and m < _MAX_BITS:
        m <<= 1
    buf = np.zeros(m >> 3, dtype=np.uint8)
    if len(hashes):
        mask = _U(m - 1)
        h1 = hashes
        h2 = _mix64(hashes ^ _H2_SALT) | _U(1)
        for i in range(BLOOM_K):
            idx = (h1 + _U(i) * h2) & mask
            np.bitwise_or.at(
                buf,
                (idx >> _U(3)).astype(np.int64),
                np.left_shift(np.uint8(1), (idx & _U(7)).astype(np.uint8)),
            )
    return {"m": m, "k": BLOOM_K, "t": tag, "b64": base64.b64encode(buf.tobytes()).decode()}


def build_bloom_fixed(hashes: np.ndarray, m: int) -> np.ndarray:
    """Bit array of EXACTLY ``m`` bits (power of two) as a uint8 buffer —
    the mergeable form: partial filters built per batch with the same
    ``m`` OR together into the filter of the union. Used by the
    semi-join bloom pre-filter, where the size must be fixed up front
    (from ``count()`` metadata) so distributed partials stay mergeable."""
    assert m >= 8 and not (m & (m - 1))
    buf = np.zeros(m >> 3, dtype=np.uint8)
    if len(hashes):
        mask = _U(m - 1)
        h2 = _mix64(hashes ^ _H2_SALT) | _U(1)
        for i in range(BLOOM_K):
            idx = (hashes + _U(i) * h2) & mask
            np.bitwise_or.at(
                buf,
                (idx >> _U(3)).astype(np.int64),
                np.left_shift(np.uint8(1), (idx & _U(7)).astype(np.uint8)),
            )
    return buf


def bloom_mask(buf: np.ndarray, m: int, hashes: np.ndarray) -> np.ndarray:
    """Vectorized membership probe: boolean mask, True = might be in the
    set (no false negatives)."""
    mask = _U(m - 1)
    h2 = _mix64(hashes ^ _H2_SALT) | _U(1)
    ok = np.ones(len(hashes), dtype=bool)
    for i in range(BLOOM_K):
        idx = (hashes + _U(i) * h2) & mask
        bits = buf[(idx >> _U(3)).astype(np.int64)] >> (idx & _U(7)).astype(np.uint8)
        ok &= (bits & 1).astype(bool)
    return ok


def bloom_admits(bloom: dict, value) -> bool:
    """Might the chunk behind this filter contain ``value``?  Errs on
    admit: unknown tags, unhashable operands and corrupt entries all
    return True — pruning is best-effort, the residual filter is exact."""
    h = scalar_hash(value, bloom.get("t", ""))
    if h is None:
        return True
    try:
        buf = np.frombuffer(base64.b64decode(bloom["b64"]), dtype=np.uint8)
        m = int(bloom["m"])
        if m & (m - 1) or (m >> 3) != len(buf):
            return True
    except (KeyError, ValueError, TypeError):
        return True
    h1 = _U(h)
    h2 = _mix64(np.array([h1 ^ _H2_SALT], dtype=np.uint64))[0] | _U(1)
    for i in range(int(bloom.get("k", BLOOM_K))):
        idx = int((h1 + _U(i) * h2) & _U(m - 1))
        if not (buf[idx >> 3] >> (idx & 7)) & 1:
            return False
    return True
