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


def _segment(chunk: memoryview, seg: list[int]) -> memoryview:
    off, ln = seg
    return chunk[off : off + ln]


def _decode_int_stream(chunk: memoryview, meta_sub: dict, np_t) -> np.ndarray:
    codec = meta_sub["codec"]
    segs = meta_sub["segments"]
    params = meta_sub["params"]
    if codec == "pfor":
        from ..codecs import pfor as pfor_mod

        bufs = {k: _segment(chunk, segs[k]) for k in ("base", "exc_pos", "exc_val")}
        return pfor_mod.decode(bufs, params["pfor"], dtype=np_t)
    return fornum.decode(_segment(chunk, segs["data"]), params["for"], dtype=np_t)


def decode_chunk(chunk: bytes | memoryview, manifest: dict, state: EncoderState) -> pa.Table:
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
        elif codec in ("for_rle", "pfor"):
            pa_t, np_t = _INT_TYPES[meta["dtype"]]
            vals = _decode_int_stream(chunk, meta, np_t)
            arrays[name] = pa.array(vals, type=pa_t)
        elif codec == "list_int":
            pa_t, np_t = _INT_TYPES[meta["dtype"]]
            lens = _decode_int_stream(chunk, meta["lens"], np.int64)
            flat = _decode_int_stream(chunk, meta["values"], np_t)
            arrays[name] = list_from_buffers(flat, lens, pa_t)
        else:
            raise ValueError(f"unknown codec {codec!r} for column {name}")
    return pa.table(arrays)
