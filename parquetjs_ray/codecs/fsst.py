"""FSST-style string compression (from-scratch, public-paper semantics).

Fast Static Symbol Table compression (Boncz, Neumann, Leis — "FSST:
Fast Random Access String Compression", VLDB 2020): a table of up to 255
symbols of 1–8 bytes; each input string becomes a sequence of one-byte
codes; bytes not covered by any symbol are emitted as an escape code
(255) followed by the literal byte. The reference repo has no string
codec beyond PLAIN — this is one of the north rule's additions, used for
``doc_id``/``source`` columns.

Design for Ray: the symbol table is trained ONCE on a driver-side sample
(sampling pass), broadcast via ``ray.put``, and held by encoder actors.
Encoding is a vectorized longest-match precompute (8 ``searchsorted``
passes over sliding-window keys) followed by a tight greedy jump loop
over tokens; decoding is fully vectorized (no per-byte Python loop).
"""

from __future__ import annotations

import struct
from collections import Counter

import numpy as np

__all__ = ["FsstTable", "train", "encode", "decode"]

ESCAPE = 255
MAX_SYMBOLS = 255  # codes 0..254
MAX_LEN = 8


def _key_of(sym: bytes) -> int:
    """Little-endian integer key of a symbol's bytes."""
    return int.from_bytes(sym, "little")


class FsstTable:
    """Immutable symbol table with precomputed vectorized lookup state."""

    def __init__(self, symbols: list[bytes]):
        if len(symbols) > MAX_SYMBOLS:
            raise ValueError("too many symbols")
        self.symbols = symbols
        self.sym_lens = np.array([len(s) for s in symbols], dtype=np.int64)
        flat = b"".join(symbols)
        self.sym_flat = np.frombuffer(flat, dtype=np.uint8)
        self.sym_starts = np.zeros(len(symbols), dtype=np.int64)
        if symbols:
            np.cumsum(self.sym_lens[:-1], out=self.sym_starts[1:])
        # per-length sorted key arrays for searchsorted lookup
        self._by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for L in range(1, MAX_LEN + 1):
            codes = [c for c, s in enumerate(symbols) if len(s) == L]
            if not codes:
                continue
            keys = np.array([_key_of(symbols[c]) for c in codes], dtype=np.uint64)
            order = np.argsort(keys)
            self._by_len[L] = (keys[order], np.array(codes, dtype=np.int64)[order])

    def serialize(self) -> bytes:
        out = [struct.pack("<H", len(self.symbols))]
        for s in self.symbols:
            out.append(struct.pack("<B", len(s)))
            out.append(s)
        return b"".join(out)

    @classmethod
    def deserialize(cls, buf: bytes) -> "FsstTable":
        (n,) = struct.unpack_from("<H", buf, 0)
        pos = 2
        symbols = []
        for _ in range(n):
            ln = buf[pos]
            pos += 1
            symbols.append(bytes(buf[pos : pos + ln]))
            pos += ln
        return cls(symbols)


def _window_keys(data: np.ndarray) -> np.ndarray:
    """uint64 little-endian key of the (zero-padded) 8-byte window at each pos."""
    n = len(data)
    padded = np.zeros(n + MAX_LEN, dtype=np.uint8)
    padded[:n] = data
    w = np.zeros(n, dtype=np.uint64)
    for i in range(MAX_LEN):
        w |= padded[i : n + i].astype(np.uint64) << np.uint64(8 * i)
    return w


def _match_arrays(table: FsstTable, data: np.ndarray, allowed: np.ndarray):
    """Longest symbol match per position → (match_len, match_code) arrays."""
    n = len(data)
    w8 = _window_keys(data)
    best_len = np.zeros(n, dtype=np.int64)
    best_code = np.zeros(n, dtype=np.int64)
    for L in range(MAX_LEN, 0, -1):
        if L not in table._by_len:
            continue
        keys, codes = table._by_len[L]
        mask_bits = np.uint64((1 << (8 * L)) - 1) if L < 8 else np.uint64(0xFFFFFFFFFFFFFFFF)
        wl = w8 & mask_bits
        cand = (best_len == 0) & (allowed >= L)
        if not cand.any():
            continue
        idx = np.searchsorted(keys, wl[cand])
        idx[idx >= len(keys)] = 0
        hit = keys[idx] == wl[cand]
        pos = np.flatnonzero(cand)[hit]
        best_len[pos] = L
        best_code[pos] = codes[idx[hit]]
    return best_len, best_code


def encode(table: FsstTable, data: np.ndarray, offsets: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode concatenated strings → (code bytes, int64 offsets in code space).

    ``data`` is the concatenated utf8/binary payload (uint8 array),
    ``offsets`` the Arrow-style value offsets (len = n_strings + 1).
    Matches never cross string boundaries.
    """
    data = np.ascontiguousarray(data, dtype=np.uint8)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(data)
    nstr = len(offsets) - 1
    if n == 0:
        return b"", np.zeros(nstr + 1, dtype=np.int64)
    # bytes allowed at each position before the owning string ends
    row_of_byte = np.repeat(np.arange(nstr, dtype=np.int64), np.diff(offsets))
    allowed = np.minimum(offsets[row_of_byte + 1] - np.arange(n), MAX_LEN)
    mlen, mcode = _match_arrays(table, data, allowed)
    # tight greedy jump loop over tokens (list access is ~3x faster than ndarray)
    mlen_l = mlen.tolist()
    mcode_l = mcode.tolist()
    data_l = data.tolist()
    bounds = offsets.tolist()
    out = bytearray()
    out_offsets = np.empty(nstr + 1, dtype=np.int64)
    out_offsets[0] = 0
    for s in range(nstr):
        pos, end = bounds[s], bounds[s + 1]
        while pos < end:
            L = mlen_l[pos]
            if L:
                out.append(mcode_l[pos])
                pos += L
            else:
                out.append(ESCAPE)
                out.append(data_l[pos])
                pos += 1
        out_offsets[s + 1] = len(out)
    return bytes(out), out_offsets


def _escape_markers(codes: np.ndarray) -> np.ndarray:
    """Boolean mask of positions that are escape MARKERS (not literals).

    In any maximal run of consecutive 0xFF codes the markers sit at even
    offsets from the run start (a literal always follows its marker), so
    marker detection is a vectorized run-parity computation.
    """
    e = codes == ESCAPE
    n = len(codes)
    marker = np.zeros(n, dtype=bool)
    if not e.any():
        return marker
    ei = np.flatnonzero(e)
    run_start = np.zeros(len(ei), dtype=np.int64)
    new_run = np.concatenate(([True], np.diff(ei) > 1))
    run_start = ei[new_run][np.cumsum(new_run) - 1]
    marker[ei[((ei - run_start) % 2) == 0]] = True
    return marker


def decode(table: FsstTable, codes: bytes | np.ndarray, offsets: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Decode code stream → (concatenated payload bytes, int64 value offsets)."""
    codes = np.frombuffer(codes, dtype=np.uint8) if isinstance(codes, (bytes, bytearray, memoryview)) else codes
    offsets = np.asarray(offsets, dtype=np.int64)
    nstr = len(offsets) - 1
    n = len(codes)
    if n == 0:
        return b"", np.zeros(nstr + 1, dtype=np.int64)
    marker = _escape_markers(codes)
    literal_pos = np.flatnonzero(marker) + 1
    is_token = np.ones(n, dtype=bool)
    is_token[literal_pos] = False  # literals are consumed by their marker
    tok_pos = np.flatnonzero(is_token)
    tok_is_lit = marker[tok_pos]
    tok_code = codes[tok_pos].astype(np.int64)
    # output length per token; gather source = symbol flat bytes ++ raw code stream
    src = np.concatenate([table.sym_flat, codes])
    if len(table.symbols) == 0:
        lens = np.ones(len(tok_pos), dtype=np.int64)
        base = len(table.sym_flat) + tok_pos + 1  # every token is a literal
    else:
        code_idx = np.where(tok_is_lit, 0, tok_code)
        lens = np.where(tok_is_lit, 1, table.sym_lens[code_idx])
        base = np.where(
            tok_is_lit,
            len(table.sym_flat) + tok_pos + 1,  # the literal byte after the marker
            table.sym_starts[code_idx],
        )
    total = int(lens.sum())
    out_off = np.zeros(len(tok_pos) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    idx = np.repeat(base, lens) + (np.arange(total, dtype=np.int64) - np.repeat(out_off[:-1], lens))
    out = src[idx]
    # per-string offsets: tokens belong to the string whose code-range contains them
    tok_row = np.searchsorted(offsets, tok_pos, side="right") - 1
    str_lens = np.bincount(tok_row, weights=lens, minlength=nstr).astype(np.int64)
    out_offsets = np.zeros(nstr + 1, dtype=np.int64)
    np.cumsum(str_lens, out=out_offsets[1:])
    return out.tobytes(), out_offsets


def train(samples: list[bytes], max_symbols: int = MAX_SYMBOLS, iters: int = 4) -> FsstTable:
    """Train a symbol table on sample strings (driver-side, small input).

    Simplified FSST bottom-up construction: start from single bytes,
    repeatedly encode the sample with the current table, count tokens and
    adjacent-token concatenations (≤ 8 bytes), keep the ``max_symbols``
    candidates with the highest gain = frequency × length.
    """
    blob = b"".join(samples)
    if len(blob) > 1 << 20:  # cap training cost
        blob = blob[: 1 << 20]
    sample_offsets = np.zeros(2, dtype=np.int64)
    sample_offsets[1] = len(blob)
    data = np.frombuffer(blob, dtype=np.uint8)
    # string boundaries matter for candidate quality; rebuild real offsets
    lens = [len(s) for s in samples]
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    offs = np.clip(offs, 0, len(blob))

    table = FsstTable([])
    for _ in range(iters):
        enc_codes, enc_offs = encode(table, data, offs)
        # reconstruct token segments (start, len in SOURCE bytes) from the encoder
        codes_arr = np.frombuffer(enc_codes, dtype=np.uint8)
        marker = _escape_markers(codes_arr)
        is_token = np.ones(len(codes_arr), dtype=bool)
        is_token[np.flatnonzero(marker) + 1] = False
        tok_pos = np.flatnonzero(is_token)
        tok_is_lit = marker[tok_pos]
        tok_code = codes_arr[tok_pos].astype(np.int64)
        src_lens = np.where(tok_is_lit, 1, table.sym_lens[np.where(tok_is_lit, 0, tok_code)] if len(table.symbols) else 1)
        src_starts = np.zeros(len(tok_pos) + 1, dtype=np.int64)
        np.cumsum(src_lens, out=src_starts[1:])
        # token row (string) ids to avoid pairing across string boundaries
        tok_row = np.searchsorted(enc_offs, tok_pos, side="right") - 1
        counts: Counter[bytes] = Counter()
        starts = src_starts[:-1]
        for i in range(len(tok_pos)):
            s = int(starts[i])
            L = int(src_lens[i])
            counts[blob[s : s + L]] += 1
            if i + 1 < len(tok_pos) and tok_row[i] == tok_row[i + 1]:
                L2 = L + int(src_lens[i + 1])
                if L2 <= MAX_LEN:
                    counts[blob[s : s + L2]] += 1
        gains = sorted(
            ((freq * len(sym), sym) for sym, freq in counts.items() if len(sym) >= 1),
            key=lambda t: (-t[0], t[1]),
        )
        table = FsstTable([sym for _, sym in gains[:max_symbols]])
    return table
