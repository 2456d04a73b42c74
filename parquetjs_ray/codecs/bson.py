"""Pure-Python BSON document codec.

The reference's BSON logical type serializes a JS object to BSON bytes
stored in a BYTE_ARRAY column (`/root/reference/lib/types.js:288-296`,
via the npm ``bson`` package). No BSON library ships here, so this
implements the subset of the public BSON spec (bsonspec.org, version
1.1) that the reference path round-trips: double (0x01), string (0x02),
embedded document (0x03), array (0x04), generic binary (0x05), boolean
(0x08), UTC datetime (0x09), null (0x0A), int32 (0x10) and int64
(0x12).

``encode``/``decode`` work on one document (a ``dict``); the
column-level plumbing is the same as the JSON logical type — a binary
Arrow column whose cells hold one serialized document each
(``encode_column``/``decode_column``).
"""

from __future__ import annotations

import datetime as _dt
import struct

import pyarrow as pa

__all__ = ["encode", "decode", "encode_column", "decode_column", "BsonError"]

_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


class BsonError(ValueError):
    pass


def _cstring(s: str) -> bytes:
    b = s.encode("utf-8")
    if b"\x00" in b:
        raise BsonError("BSON element names cannot contain NUL")
    return b + b"\x00"


def _encode_value(name: str, value) -> bytes:
    key = _cstring(name)
    if isinstance(value, bool):  # before int: bool is an int subclass
        return b"\x08" + key + (b"\x01" if value else b"\x00")
    if isinstance(value, float):
        return b"\x01" + key + struct.pack("<d", value)
    if isinstance(value, str):
        b = value.encode("utf-8")
        return b"\x02" + key + struct.pack("<i", len(b) + 1) + b + b"\x00"
    if isinstance(value, dict):
        return b"\x03" + key + encode(value)
    if isinstance(value, (list, tuple)):
        doc = encode({str(i): v for i, v in enumerate(value)})
        return b"\x04" + key + doc
    if isinstance(value, (bytes, bytearray, memoryview)):
        b = bytes(value)
        return b"\x05" + key + struct.pack("<i", len(b)) + b"\x00" + b
    if isinstance(value, _dt.datetime):
        if value.tzinfo is None:
            value = value.replace(tzinfo=_dt.timezone.utc)
        ms = round((value - _EPOCH).total_seconds() * 1000)
        return b"\x09" + key + struct.pack("<q", ms)
    if value is None:
        return b"\x0a" + key
    if isinstance(value, int):
        if -(1 << 31) <= value < (1 << 31):
            return b"\x10" + key + struct.pack("<i", value)
        if -(1 << 63) <= value < (1 << 63):
            return b"\x12" + key + struct.pack("<q", value)
        raise BsonError(f"integer {value} exceeds int64")
    raise BsonError(f"unsupported BSON value type {type(value).__name__}")


def encode(doc: dict) -> bytes:
    """Serialize ``doc`` per the BSON spec: int32 total size, elements,
    trailing NUL — ``document ::= int32 e_list \\x00``."""
    body = b"".join(_encode_value(str(k), v) for k, v in doc.items())
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _read_cstring(buf: memoryview, at: int) -> tuple[str, int]:
    end = at
    while end < len(buf) and buf[end] != 0:
        end += 1
    if end >= len(buf):
        raise BsonError("unterminated element name")
    return bytes(buf[at:end]).decode("utf-8"), end + 1


def _decode_doc(buf: memoryview, at: int) -> tuple[dict, int]:
    if at + 5 > len(buf):
        raise BsonError("truncated document header")
    (size,) = struct.unpack_from("<i", buf, at)
    end = at + size
    if size < 5 or end > len(buf):
        raise BsonError(f"bad document size {size}")
    out: dict = {}
    pos = at + 4
    while True:
        # corrupt inner lengths can push pos past the declared end before
        # the 0 terminator: fail as BsonError, never a raw IndexError
        if pos >= end:
            raise BsonError("truncated document")
        kind = buf[pos]
        pos += 1
        if kind == 0:
            break
        name, pos = _read_cstring(buf, pos)
        if kind == 0x01:
            (out[name],) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif kind == 0x02:
            (slen,) = struct.unpack_from("<i", buf, pos)
            pos += 4
            if slen < 1 or buf[pos + slen - 1] != 0:
                raise BsonError("bad string terminator")
            out[name] = bytes(buf[pos : pos + slen - 1]).decode("utf-8")
            pos += slen
        elif kind in (0x03, 0x04):
            sub, pos = _decode_doc(buf, pos)
            out[name] = list(sub.values()) if kind == 0x04 else sub
        elif kind == 0x05:
            (blen,) = struct.unpack_from("<i", buf, pos)
            pos += 5  # length + subtype byte (subtype ignored on read)
            out[name] = bytes(buf[pos : pos + blen])
            pos += blen
        elif kind == 0x08:
            out[name] = buf[pos] != 0
            pos += 1
        elif kind == 0x09:
            (ms,) = struct.unpack_from("<q", buf, pos)
            pos += 8
            out[name] = _EPOCH + _dt.timedelta(milliseconds=ms)
        elif kind == 0x0A:
            out[name] = None
        elif kind == 0x10:
            (out[name],) = struct.unpack_from("<i", buf, pos)
            pos += 4
        elif kind == 0x12:
            (out[name],) = struct.unpack_from("<q", buf, pos)
            pos += 8
        else:
            raise BsonError(f"unsupported BSON element type 0x{kind:02x}")
    if pos != end:
        raise BsonError("document size mismatch")
    return out, pos


def decode(data: bytes | memoryview) -> dict:
    try:
        doc, pos = _decode_doc(memoryview(data), 0)
    except (IndexError, struct.error) as e:  # corrupt operand lengths
        raise BsonError(f"truncated element: {e}") from e
    if pos != len(data):
        raise BsonError("trailing bytes after document")
    return doc


def encode_column(docs: list[dict | None]) -> pa.Array:
    """dicts → one BSON blob per cell (the logical type's storage form)."""
    return pa.array(
        [None if d is None else encode(d) for d in docs], type=pa.binary()
    )


def decode_column(arr: pa.Array) -> list[dict | None]:
    return [None if v is None else decode(v) for v in arr.to_pylist()]
