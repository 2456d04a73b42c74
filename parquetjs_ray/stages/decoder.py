"""Chunk → Arrow decode path (verification + consumers).

Inverse of :mod:`parquetjs_ray.stages.encoder`; plays the role of the
reference's ``decodeDataPages``/``materializeRecords``
(`/root/reference/lib/reader.js:297-339`, `lib/shred.js:157-195`) but
rebuilds Arrow arrays from buffers instead of materializing row objects.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_util import list_from_buffers, strings_from_buffers
from ..codecs import fornum, fsst as fsst_mod, plain, rle
from ..codecs.bitpack import bit_width
from .encoder import EncoderState

__all__ = ["decode_chunk"]

# every Arrow integer type the encoder fast path accepts (the reference
# supports INT_8..UINT_64, `/root/reference/lib/types.js:30-100`); the
# codecs work in the column's own width and decode back to it exactly
_INT_TYPES = {
    "int8": (pa.int8(), np.int8),
    "int16": (pa.int16(), np.int16),
    "int32": (pa.int32(), np.int32),
    "int64": (pa.int64(), np.int64),
    "uint8": (pa.uint8(), np.uint8),
    "uint16": (pa.uint16(), np.uint16),
    "uint32": (pa.uint32(), np.uint32),
    "uint64": (pa.uint64(), np.uint64),
}


class SparseChunk:
    """Chunk stand-in holding only SELECTED byte ranges (projection
    pushdown all the way to storage: un-requested column segments are
    never read). Supports exactly the slice accesses `_segment` makes."""

    def __init__(self, ranges: list[tuple[int, int]], blobs: list[bytes]):
        self._ranges = sorted(zip((r[0] for r in ranges), (r[1] for r in ranges), blobs))

    def __getitem__(self, sl: slice) -> memoryview:
        lo, hi = sl.start or 0, sl.stop
        for off, ln, blob in self._ranges:
            if off <= lo and hi <= off + ln:
                return memoryview(blob)[lo - off : hi - off]
        raise KeyError(f"byte range [{lo}, {hi}) was not loaded into this SparseChunk")


def collect_segment_ranges(meta: dict) -> list[tuple[int, int]]:
    """All (offset, length) byte ranges a column's decode will touch
    (recursive over validity / lens / values / child / fields)."""
    out: list[tuple[int, int]] = []

    def walk(m: dict) -> None:
        for seg in m.get("segments", {}).values():
            out.append((int(seg[0]), int(seg[1])))
        if "validity" in m:
            out.append((int(m["validity"][0]), int(m["validity"][1])))
        for sub in ("lens", "values", "child", "inner"):
            if isinstance(m.get(sub), dict):
                walk(m[sub])
        for f in m.get("fields", {}).values():
            walk(f)
        for s in m.get("streams", {}).values():
            walk(s)

    walk(meta)
    return out


def _segment(chunk, seg: list[int]):
    off, ln = seg
    return chunk[off : off + ln]


def _decode_int_stream(chunk: memoryview, meta_sub: dict, np_t, state: EncoderState | None = None) -> np.ndarray:
    codec = meta_sub["codec"]
    segs = meta_sub["segments"]
    params = meta_sub["params"]
    if codec == "dict_ranks":
        codes = _decode_int_stream(chunk, meta_sub["inner"], np.int64)
        card = int(params["card"])
        out = np.empty(len(codes), dtype=np.int64)
        in_dict = codes < card
        out[in_dict] = state.rank2val[codes[in_dict]]
        if params["n_exc"]:
            pos = fornum.decode(_segment(chunk, segs["exc_pos"]), params["exc_pos_for"])
            val = fornum.decode(_segment(chunk, segs["exc_val"]), params["exc_val_for"])
            out[pos] = val
        return out.astype(np_t, copy=False)
    if codec == "delta":
        dp = params["delta"]
        inner = {"codec": dp["inner_codec"], "segments": segs, "params": dp["inner_params"]}
        np_t = np.dtype(np_t)
        if np_t.itemsize == 8:
            # 64-bit: diffs were taken in the native dtype (wrap-exact mod
            # 2^64); cumsum in the same dtype restores the exact values
            d = _decode_int_stream(chunk, inner, np_t, state)
            full = np.empty(len(d) + 1, dtype=np_t)
            full[0] = np_t.type(dp["first"] & 0xFFFFFFFFFFFFFFFF) if np_t.kind == "u" else dp["first"]
            full[1:] = d
            return np.cumsum(full, dtype=np_t)
        # narrower: diffs were widened to int64 at encode (exact signed)
        d = _decode_int_stream(chunk, inner, np.int64, state)
        full = np.empty(len(d) + 1, dtype=np.int64)
        full[0] = dp["first"]
        full[1:] = d
        return np.cumsum(full).astype(np_t, copy=False)
    if codec == "pfor":
        from ..codecs import pfor as pfor_mod

        bufs = {k: _segment(chunk, segs[k]) for k in ("base", "exc_pos", "exc_val")}
        return pfor_mod.decode(bufs, params["pfor"], dtype=np_t)
    if codec == "vpack":
        from ..codecs import vpack as vpack_mod

        bufs = {k: _segment(chunk, segs[k]) for k in ("sel", "c0", "c1", "c2", "c3")}
        return vpack_mod.decode(bufs, params["vpack"], dtype=np_t)
    return fornum.decode(_segment(chunk, segs["data"]), params["for"], dtype=np_t)


def decode_chunk(chunk, manifest: dict, state: EncoderState) -> pa.Table:
    if isinstance(chunk, (bytes, bytearray)):
        chunk = memoryview(chunk)
    rows = int(manifest["rows"])
    arrays = {}
    for name, meta in manifest["columns"].items():
        codec = meta["codec"]
        if "arrow_type" in meta:  # general shredded path (nulls/nesting/etc.)
            from .shred import decode_any

            arrays[name] = decode_any(chunk, meta, state)
            continue
        segs = meta["segments"]
        params = meta.get("params", {})
        n = int(meta.get("count", rows))
        if codec == "dict_global":
            width = int(params["width"])
            idx = rle.decode(_segment(chunk, segs["idx"]), n, width, disable_envelope=True)
            arrays[name] = pa.compute.take(state.source_dict, pa.array(idx.astype(np.int64)))
        elif codec == "dict_local":
            from ..codecs import dictionary

            arrays[name] = dictionary.decode_local(
                _segment(chunk, segs["idx"]), _segment(chunk, segs["dict"]), params
            )
        elif codec == "fsst":
            lens = fornum.decode(_segment(chunk, segs["lens"]), params["lens_for"])
            code_offs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=code_offs[1:])
            data, offsets = fsst_mod.decode(
                state.fsst_table, np.frombuffer(_segment(chunk, segs["codes"]), dtype=np.uint8), code_offs
            )
            arrays[name] = strings_from_buffers(data, offsets)
        elif codec == "plain":
            data, offsets = plain.decode_byte_array(_segment(chunk, segs["data"]), n)
            arrays[name] = strings_from_buffers(data, offsets)
        elif codec in ("for_rle", "pfor", "vpack", "delta"):
            pa_t, np_t = _INT_TYPES[meta["dtype"]]
            vals = _decode_int_stream(chunk, meta, np_t)
            arrays[name] = pa.array(vals, type=pa_t)
        elif codec == "list_int":
            pa_t, np_t = _INT_TYPES[meta["dtype"]]
            lens = _decode_int_stream(chunk, meta["lens"], np.int64)
            flat = _decode_int_stream(chunk, meta["values"], np_t, state)
            arrays[name] = list_from_buffers(flat, lens, pa_t)
        else:
            raise ValueError(f"unknown codec {codec!r} for column {name}")
    return pa.table(arrays)
