"""Front coding (incremental prefix encoding) for SORTED string pages.

The classic dictionary-page trick (Lemire & Boytsov's survey lineage;
also Parquet-format's DELTA_BYTE_ARRAY): after sorting, adjacent strings
share long prefixes, so each entry stores only ``(lcp, suffix)`` — the
length of the longest common prefix with the PREVIOUS string plus the
remaining bytes. On id-like dictionaries (``src_0001``, ``user_4471``…)
this beats a PLAIN page by the shared-prefix fraction on top of the
4-byte-offset saving.

Nothing reference-derived: the reference (ironSource/parquetjs,
`lib/codec/index.js:1-2`) declares only PLAIN/RLE; this is a north-rule
codec-family addition used for LOCAL DICTIONARY pages
(``codecs/dictionary.py`` keeps the page format flag), where the page is
cardinality-sized — the sequential prefix-chain reconstruction on decode
is bounded by the dictionary size, never by row count.

Layout (little-endian)::

    uint32 n | uint32 blob_len | uint16 lcp[n] | uint16 slen[n] | blob

Strings must be < 65536 bytes (``ValueError`` otherwise — callers fall
back to PLAIN); input MUST be sorted ascending (asserted cheaply via the
lcp computation only touching adjacent pairs — an unsorted input still
round-trips, it just compresses worse, so sortedness is the caller's
size contract, not a correctness one).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode", "decode"]


def _ranges_to_indices(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized [s0:s0+l0) ∪ [s1:s1+l1) ∪ … gather index array."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    out_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return (
        np.arange(total, dtype=np.int64)
        - np.repeat(out_starts, lens)
        + np.repeat(starts, lens)
    )


def encode(data: np.ndarray, offsets: np.ndarray) -> bytes:
    """Encode n strings given as a flat uint8 buffer + int64 offsets
    (len(offsets) == n+1). Vectorized: the adjacent-pair LCPs advance one
    byte position per numpy pass (total passes = longest shared prefix);
    suffixes are gathered with one fancy-index copy."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    lens = np.diff(offsets)
    if n and int(lens.max()) >= 1 << 16:
        raise ValueError("front coding requires string lengths < 65536")
    data = np.asarray(data, dtype=np.uint8)

    lcp = np.zeros(n, np.int64)
    if n > 1:
        idx = np.arange(1, n)
        alive = idx[np.minimum(lens[idx], lens[idx - 1]) > 0]
        p = 0
        while len(alive):
            eq = data[offsets[alive - 1] + p] == data[offsets[alive] + p]
            alive = alive[eq]
            lcp[alive] += 1
            p += 1
            alive = alive[np.minimum(lens[alive], lens[alive - 1]) > p]
    slen = lens - lcp
    blob_idx = _ranges_to_indices(offsets[:-1] + lcp, slen)
    blob = data[blob_idx].tobytes()
    return b"".join(
        (
            struct.pack("<II", n, len(blob)),
            lcp.astype("<u2").tobytes(),
            slen.astype("<u2").tobytes(),
            blob,
        )
    )


def decode(buf: bytes | memoryview) -> tuple[np.ndarray, np.ndarray]:
    """Decode to (flat uint8 data, int64 offsets). Suffix bytes land with
    one vectorized scatter; the prefix chain is reconstructed with one
    slice copy per string — O(dictionary cardinality) iterations, the
    documented bound for dictionary pages."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    n, blob_len = struct.unpack("<II", raw[:8].tobytes())
    pos = 8
    lcp = raw[pos : pos + 2 * n].view("<u2").astype(np.int64)
    pos += 2 * n
    slen = raw[pos : pos + 2 * n].view("<u2").astype(np.int64)
    pos += 2 * n
    blob = raw[pos : pos + blob_len]
    lens = lcp + slen
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    out = np.empty(int(offsets[-1]), np.uint8)
    # suffixes: one vectorized scatter into their final positions
    out[_ranges_to_indices(offsets[:-1] + lcp, slen)] = blob
    # prefix chain: copy lcp[i] bytes from the previous (fully built) string
    for i in range(1, n):
        c = lcp[i]
        if c:
            out[offsets[i] : offsets[i] + c] = out[offsets[i - 1] : offsets[i - 1] + c]
    return out, offsets
