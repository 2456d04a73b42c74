"""Pure-Python LZO1X stream codec.

The reference exposes LZO page compression (`/root/reference/lib/
compression.js:20-23,59-66`, lazy-loading the native ``lzo`` binding).
No LZO library ships in this environment, so this module implements the
LZO1X *bitstream* itself, from the public format description
(Linux ``Documentation/lzo.txt`` — the instruction encodings, state
machine and end-of-stream marker are quoted there in full).

``decompress`` implements the complete version-0 instruction set,
including the state-dependent 0..15 opcodes our encoder never emits, so
it can read streams produced by other LZO1X encoders. ``compress`` is a
greedy LZO1X-1-style encoder (4-byte hash chain, window 16 kB) that
emits only the M2 (2 kB) and M4 (16 kB) match forms plus literal runs —
a strict subset of the format, decodable by any conforming decoder.

This is a *compatibility* codec: pure Python, a few MB/s. It exists to
read/write the reference's legacy LZO artifacts; new artifacts should
use zstd/snappy (``stages/writer.py:SUPPORTED_COMPRESSION``) which go
through pyarrow's native codecs.
"""

from __future__ import annotations

__all__ = ["compress", "decompress", "LzoError"]

_WINDOW = 16384  # M4 max distance; we never emit M3 (16..48kB) except EOS
_M2_MAX_DIST = 2048


class LzoError(ValueError):
    pass


def _emit_extended(out: bytearray, base_code: int, total: int) -> None:
    """Emit ``base_code`` then the (255*n + non_zero_byte) length extension
    encoding ``total`` (the amount beyond the opcode's inline maximum)."""
    n = (total - 1) // 255
    out.append(base_code)
    out.extend(b"\x00" * n)
    out.append(total - 255 * n)


def _emit_literal_run(out: bytearray, data: bytes, start: int, length: int) -> None:
    """State-0 long literal run (opcode 0..15): length = 3 + (L ?: 15 + ext)."""
    if length < 4:
        raise LzoError(f"literal run of {length} needs a match S field")
    if length <= 18:
        out.append(length - 3)
    else:
        _emit_extended(out, 0x00, length - 18)
    out.extend(data[start : start + length])


def compress(data: bytes) -> bytes:
    """Compress to an LZO1X stream (greedy, window 16 kB, min match 4)."""
    n = len(data)
    out = bytearray()
    if n == 0:
        out.extend(b"\x11\x00\x00")  # bare end-of-stream marker
        return bytes(out)

    # ── find matches greedily: table of last position per 4-byte prefix ──
    table: dict[bytes, int] = {}
    matches: list[tuple[int, int, int]] = []  # (pos, distance, length)
    pos = 4 if n >= 8 else n  # first 4 bytes are always literals (first-byte run)
    i = 0
    while i < pos:
        if i + 4 <= n:
            table[data[i : i + 4]] = i
        i += 1
    while pos + 4 <= n:
        key = data[pos : pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is not None and pos - cand <= _WINDOW:
            length = 4
            limit = n - pos
            while length < limit and data[cand + length] == data[pos + length]:
                length += 1
            matches.append((pos, pos - cand, length))
            end = pos + length
            pos += 1
            while pos < end and pos + 4 <= n:  # sparse table update inside match
                if pos % 2 == 0:
                    table[data[pos : pos + 4]] = pos
                pos += 1
            pos = end
        else:
            pos += 1

    # ── serialize: initial literal run, then (match, gap-literals)* ──
    first_match = matches[0][0] if matches else n
    if first_match == n:
        # whole input is literal
        if n <= 3:
            out.append(17 + n)  # first-byte special: copy n literals
            out.extend(data)
        else:
            _emit_literal_run(out, data, 0, n)
        out.extend(b"\x11\x00\x00")
        return bytes(out)

    _emit_literal_run(out, data, 0, first_match)  # ≥4 by construction

    for mi, (mpos, dist, mlen) in enumerate(matches):
        nxt = matches[mi + 1][0] if mi + 1 < len(matches) else n
        gap = nxt - (mpos + mlen)
        s = gap if gap <= 3 else 0
        d = dist - 1
        if 4 <= mlen <= 8 and dist <= _M2_MAX_DIST:
            if mlen <= 4:  # 0 1 L D D D S S ; H
                out.append(0x40 | ((mlen - 3) << 5) | ((d & 7) << 2) | s)
            else:  # 1 L L D D D S S ; H
                out.append(0x80 | ((mlen - 5) << 5) | ((d & 7) << 2) | s)
            out.append(d >> 3)
        else:  # M4: 0 0 1 L L L L L ; LE16 = (D << 2) | S
            if mlen <= 33:
                out.append(0x20 | (mlen - 2))
            else:
                _emit_extended(out, 0x20, mlen - 33)
            le16 = (d << 2) | s
            out.append(le16 & 0xFF)
            out.append(le16 >> 8)
        if s:
            out.extend(data[mpos + mlen : mpos + mlen + s])
        elif gap:
            _emit_literal_run(out, data, mpos + mlen, gap)

    out.extend(b"\x11\x00\x00")
    return bytes(out)


def _take_extended(src: bytes, ip: int) -> tuple[int, int]:
    """Read the (255*n + non_zero_byte) run-length extension at ``ip``."""
    ext = 0
    while ip < len(src) and src[ip] == 0:
        ext += 255
        ip += 1
    if ip >= len(src):
        raise LzoError("truncated length extension")
    return ext + src[ip], ip + 1


def decompress(src: bytes, out_len: int | None = None) -> bytes:
    """Decompress a full LZO1X version-0 stream (all instruction forms)."""
    out = bytearray()
    n = len(src)
    if n < 3:
        raise LzoError("stream too short")
    ip = 0
    state = 0

    # first-byte special encoding (Documentation/lzo.txt "First byte encoding")
    t0 = src[0]
    if t0 > 17:
        ip = 1
        lit = t0 - 17
        if ip + lit > n:
            raise LzoError("truncated stream")
        out.extend(src[ip : ip + lit])
        ip += lit
        state = lit if lit < 4 else 4

    # bounds guard: multi-byte operand reads must fail as LzoError (the
    # codec's documented error contract), never as a raw IndexError
    def _need(ip: int, k: int) -> None:
        if ip + k > n:
            raise LzoError("truncated stream")

    while True:
        if ip >= n:
            raise LzoError("missing end-of-stream marker")
        t = src[ip]
        ip += 1
        if t >= 64:  # M2: 3-8 byte match, distance ≤ 2kB
            if t >= 128:
                length = 5 + ((t >> 5) & 3)
            else:
                length = 3 + ((t >> 5) & 1)
            d, s = (t >> 2) & 7, t & 3
            _need(ip, 1)
            dist = (src[ip] << 3) + d + 1
            ip += 1
        elif t >= 32:  # M4: distance ≤ 16kB
            length = t & 31
            if length == 0:
                length, ip = _take_extended(src, ip)
                length += 31
            length += 2
            _need(ip, 2)
            le16 = src[ip] | (src[ip + 1] << 8)
            ip += 2
            dist, s = (le16 >> 2) + 1, le16 & 3
        elif t >= 16:  # M3: distance 16..48kB; dist==16384 is EOS
            length = t & 7
            if length == 0:
                length, ip = _take_extended(src, ip)
                length += 7
            length += 2
            _need(ip, 2)
            le16 = src[ip] | (src[ip + 1] << 8)
            ip += 2
            dist, s = 16384 + (((t >> 3) & 1) << 14) + (le16 >> 2), le16 & 3
            if dist == 16384:
                break  # end of stream
        else:  # 0..15: depends on state
            if state == 0:  # long literal run
                length = t
                if length == 0:
                    length, ip = _take_extended(src, ip)
                    length += 15
                length += 3
                _need(ip, length)
                out.extend(src[ip : ip + length])
                ip += length
                state = 4
                continue
            d, s = (t >> 2) & 3, t & 3
            _need(ip, 1)
            if state == 4:  # 3-byte match at 2..3kB
                length = 3
                dist = (src[ip] << 2) + d + 2049
            else:  # state 1..3: 2-byte match ≤ 1kB
                length = 2
                dist = (src[ip] << 2) + d + 1
            ip += 1

        if dist > len(out):
            raise LzoError(f"match distance {dist} beyond output at {len(out)}")
        start = len(out) - dist
        if dist >= length:
            out.extend(out[start : start + length])
        else:  # overlapping copy: byte-at-a-time semantics
            for k in range(length):
                out.append(out[start + k])
        _need(ip, s)
        out.extend(src[ip : ip + s])
        ip += s
        state = s

    if out_len is not None and len(out) != out_len:
        raise LzoError(f"decompressed {len(out)} bytes, expected {out_len}")
    return bytes(out)
