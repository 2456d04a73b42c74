"""Recursive Arrow shredding: any nested/nullable column → codec streams.

The reference shreds nested records into Dremel repetition/definition
levels (`/root/reference/lib/shred.js:28-135`) and reassembles them in
``materializeRecords`` (`lib/shred.js:157-245`). Arrow already carries
exactly that information structurally — validity bitmaps are the
definition information, list offsets are the repetition information —
so our "shredder" is a recursive walk over Arrow buffers:

* nullable level → validity bitmap segment (LSB-first, = d-level info);
* list level → per-row lengths stream (FOR/PFOR, = r-level info) +
  recurse into the flattened child;
* struct level → recurse into each field;
* leaves → the lightweight codecs (dict/FSST/FOR/PFOR/RLE/PLAIN).

This covers the reference's whole type surface (BOOLEAN, INT32/64,
FLOAT/DOUBLE, BYTE_ARRAY, FIXED_LEN_BYTE_ARRAY, UTF8, DATE,
TIME/TIMESTAMP, nested optional/repeated groups — `lib/types.js:4-131`,
`lib/schema.js:82-120`), minus INT96 (legacy, intentionally dropped).
Round-trip parity with the reference's shred/materialize semantics is
pinned by the fruits fixture tests (FIXTURES.md F3).
"""

from __future__ import annotations

import base64

import numpy as np
import pyarrow as pa

from ..arrow_util import string_buffers
from ..codecs import plain
from .encoder import EncoderState, _ChunkBuilder, _encode_string, encode_int_stream

__all__ = ["encode_any", "decode_any"]


def _type_blob(t: pa.DataType) -> str:
    return base64.b64encode(pa.schema([("c", t)]).serialize().to_pybytes()).decode()


def _type_from_blob(blob: str) -> pa.DataType:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(blob))).field(0).type


_INT_CAST = {
    "date32": pa.int32(),
    "time32": pa.int32(),
    "date64": pa.int64(),
    "time64": pa.int64(),
    "timestamp": pa.int64(),
    "duration": pa.int64(),
}


def _storage_int_type(t: pa.DataType) -> pa.DataType | None:
    if pa.types.is_integer(t):
        # keep the NATIVE width: the codecs handle every integer dtype
        # (a cast to int64 would reject uint64 values ≥ 2^63)
        return t
    for prefix, target in _INT_CAST.items():
        if str(t).startswith(prefix):
            return target
    return None


def encode_any(arr: pa.Array, state: EncoderState, cb: _ChunkBuilder) -> dict:
    """Encode any supported Arrow array → manifest meta (recursive)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    n = len(arr)
    meta: dict = {"codec": None, "count": n, "arrow_type": _type_blob(t)}

    # ── validity (definition) level ──
    if arr.null_count:
        valid_np = np.zeros(n, dtype=bool)
        if n:
            # is_valid gives a boolean array regardless of offset handling
            valid_np = pa.compute.is_valid(arr).to_numpy(zero_copy_only=False)
        meta["validity"] = cb.add_segment(plain.encode_boolean(valid_np))
        meta["n_valid"] = int(valid_np.sum())
        arr = arr.drop_null()

    if pa.types.is_list(t) or pa.types.is_large_list(t):
        # .offsets is already slice-adjusted (len(arr)+1); .values is the
        # full unsliced child — rebase by offsets[0] only (see arrow_util)
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lengths = np.diff(offsets)
        codec, segs, params = encode_int_stream(lengths, cb, vpack_margin=state.vpack_margin)
        child = arr.values.slice(int(offsets[0]), int(offsets[-1] - offsets[0]))
        meta.update(
            codec="list",
            lens={"codec": codec, "segments": segs, "params": params},
            child=encode_any(child, state, cb),
        )
    elif pa.types.is_struct(t):
        meta.update(
            codec="struct",
            fields={
                t.field(i).name: encode_any(arr.field(i), state, cb) for i in range(t.num_fields)
            },
        )
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        leaf = _encode_string("", arr, state, cb)
        leaf.pop("count", None)  # keep the pre-drop_null count set above
        meta.update(leaf)
        meta["arrow_type"] = _type_blob(t)
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        data, offsets = string_buffers(arr)
        raw = plain.encode_byte_array(data, offsets)
        # media payload columns (images/audio) are large opaque blobs:
        # zstd the whole segment when it pays ≥10%, else store raw
        comp = pa.Codec("zstd").compress(raw, asbytes=True)
        if len(comp) < 0.9 * len(raw):
            meta.update(
                codec="plain_binary_zstd",
                uncompressed_size=len(raw),
                segments={"data": cb.add_segment(comp)},
            )
        else:
            meta.update(codec="plain_binary", segments={"data": cb.add_segment(raw)})
    elif pa.types.is_fixed_size_binary(t):
        # concatenate via to_pylist (fixed columns are narrow; offset-safe)
        buf = b"".join(arr.to_pylist())
        meta.update(codec="plain_fixed", type_length=t.byte_width, segments={"data": cb.add_segment(buf)})
    elif pa.types.is_boolean(t):
        vals = arr.to_numpy(zero_copy_only=False)
        meta.update(codec="plain_bool", segments={"data": cb.add_segment(plain.encode_boolean(vals))})
    elif (it := _storage_int_type(t)) is not None:
        ints = arr.cast(it)
        values = ints.to_numpy(zero_copy_only=False)
        codec, segs, params = encode_int_stream(values, cb, vpack_margin=state.vpack_margin)
        meta.update(codec=codec, segments=segs, params=params, dtype=str(it))
    elif pa.types.is_interval(t):
        # Arrow month_day_nano_interval ↔ the reference's INTERVAL logical
        # type (`/root/reference/lib/types.js:124-130,382-401`), stored as
        # three int streams (months/days int32, nanos int64 — LOSSLESS,
        # unlike the reference's millisecond truncation; the 12-byte
        # parquet serialization is available via codecs.plain.interval_*).
        # Values buffer layout: (int32 months, int32 days, int64 nanos).
        rec = np.frombuffer(
            arr.buffers()[1], dtype=np.dtype([("m", "<i4"), ("d", "<i4"), ("n", "<i8")]),
            count=len(arr) + arr.offset,
        )[arr.offset :]
        sub = {}
        for key, vals in (("months", rec["m"]), ("days", rec["d"]), ("nanos", rec["n"])):
            codec, segs, params = encode_int_stream(
                np.ascontiguousarray(vals), cb, vpack_margin=state.vpack_margin
            )
            sub[key] = {"codec": codec, "segments": segs, "params": params}
        meta.update(codec="interval_mdn", streams=sub, segments={})
    elif pa.types.is_floating(t):
        type_name = "DOUBLE" if t.bit_width == 64 else "FLOAT"
        vals = arr.to_numpy(zero_copy_only=False)
        raw = plain.encode_numeric(vals, type_name)
        # per-chunk float codec selection: ALP (decimal scale-to-int,
        # BIT-EXACT, see codecs/alp.py) vs PLAIN vs zstd(raw) vs
        # byte-stream-split+zstd (the Parquet BYTE_STREAM_SPLIT idea:
        # group the i-th byte of every value into one stream — exponent/
        # sign bytes of similar-magnitude floats become repetitive, and
        # low-precision values leave runs of zero mantissa bytes).
        # Whichever is smallest wins, with a 10% margin over PLAIN.
        itemsize = t.bit_width // 8
        candidates: dict[str, bytes] = {}
        if len(vals):
            split = np.frombuffer(raw, dtype=np.uint8).reshape(-1, itemsize).T.copy().tobytes()
            candidates["bss_zstd"] = pa.Codec("zstd").compress(split, asbytes=True)
            candidates["num_zstd"] = pa.Codec("zstd").compress(raw, asbytes=True)
        best = min(candidates, key=lambda k: len(candidates[k])) if candidates else None
        best_len = len(candidates[best]) if best is not None else len(raw)
        alp_pick = None
        if len(vals) >= 64:
            from ..codecs import alp as alp_mod
            from .encoder import estimate_int_stream

            hit = alp_mod.probe(vals)
            if hit is not None:
                e, ok = hit
                with np.errstate(invalid="ignore", over="ignore"):
                    scaled = np.round(vals.astype(np.float64, copy=False) * 10.0**e)
                # exception slots hold the valid minimum so they never
                # widen the FOR range of the scaled stream
                filler = float(scaled[ok].min()) if ok.any() else 0.0
                s = np.where(ok, scaled, filler).astype(np.int64)
                n_exc = int((~ok).sum())
                est = estimate_int_stream(s) + n_exc * (itemsize + 4) + 24
                if est < 0.95 * min(best_len, len(raw)):
                    alp_pick = (e, ok, s, n_exc, est)
        if alp_pick is not None:
            e, ok, s, n_exc, est = alp_pick
            codec_s, segs_s, params_s = encode_int_stream(s, cb, vpack_margin=state.vpack_margin)
            streams = {"scaled": {"codec": codec_s, "segments": segs_s, "params": params_s}}
            segments: dict = {}
            if n_exc:
                pos = np.flatnonzero(~ok).astype(np.int64)
                codec_p, segs_p, params_p = encode_int_stream(pos, cb, vpack_margin=state.vpack_margin)
                streams["exc_pos"] = {"codec": codec_p, "segments": segs_p, "params": params_p}
                segments["exc_raw"] = cb.add_segment(vals[~ok].tobytes())
            meta.update(
                codec="alp",
                num_type=type_name,
                exp=e,
                n_exceptions=n_exc,
                est={"alp": est, "zstd_best": best_len, "plain": len(raw)},
                streams=streams,
                segments=segments,
            )
        elif best is not None and len(candidates[best]) < 0.9 * len(raw):
            meta.update(
                codec=best,
                num_type=type_name,
                uncompressed_size=len(raw),
                segments={"data": cb.add_segment(candidates[best])},
            )
        else:
            meta.update(codec="plain_num", num_type=type_name, segments={"data": cb.add_segment(raw)})
    else:
        raise TypeError(f"unsupported Arrow type {t}")
    meta["leaf_count"] = len(arr)
    return meta


def decode_any(chunk: memoryview, meta: dict, state: EncoderState) -> pa.Array:
    """Inverse of :func:`encode_any` (recursive)."""
    from .decoder import _decode_int_stream, _segment

    t = _type_from_blob(meta["arrow_type"])
    n = int(meta["count"])
    n_valid = int(meta.get("n_valid", n))
    has_nulls = "validity" in meta
    m = n_valid if has_nulls else n
    codec = meta["codec"]

    if codec == "list":
        lengths = _decode_int_stream(chunk, meta["lens"], np.int64)
        child = decode_any(chunk, meta["child"], state)
        offsets = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        dense = pa.ListArray.from_arrays(pa.array(offsets.astype(np.int32), pa.int32()), child)
        if pa.types.is_large_list(t):
            dense = dense.cast(t)
        elif dense.type != t:
            dense = dense.cast(t)
    elif codec == "struct":
        children = [decode_any(chunk, meta["fields"][t.field(i).name], state) for i in range(t.num_fields)]
        dense = pa.StructArray.from_arrays(children, fields=[t.field(i) for i in range(t.num_fields)])
    elif codec in ("dict_global", "fsst", "plain"):
        from .decoder import decode_chunk  # reuse leaf string decoding

        leaf_meta = {k: v for k, v in meta.items() if k not in ("arrow_type", "validity", "n_valid")}
        leaf_meta["count"] = m
        sub_manifest = {"rows": m, "columns": {"c": leaf_meta}}
        dense = decode_chunk(chunk, sub_manifest, state).column("c").combine_chunks()
        if dense.type != t:
            dense = dense.cast(t)
    elif codec in ("plain_binary", "plain_binary_zstd"):
        seg = _segment(chunk, meta["segments"]["data"])
        if codec == "plain_binary_zstd":
            seg = pa.Codec("zstd").decompress(bytes(seg), meta["uncompressed_size"], asbytes=True)
        data, offsets = plain.decode_byte_array(seg, m)
        from ..arrow_util import strings_from_buffers

        dense = strings_from_buffers(data, offsets, as_string=False)
        if dense.type != t:
            dense = dense.cast(t)
    elif codec == "plain_fixed":
        raw = bytes(_segment(chunk, meta["segments"]["data"]))
        w = int(meta["type_length"])
        dense = pa.array([raw[i * w : (i + 1) * w] for i in range(m)], type=t)
    elif codec == "plain_bool":
        vals = plain.decode_boolean(bytes(_segment(chunk, meta["segments"]["data"])), m)
        dense = pa.array(vals, type=pa.bool_())
    elif codec in ("for_rle", "pfor", "vpack", "delta"):
        from .decoder import _INT_TYPES

        it = pa.type_for_alias(meta["dtype"])
        if meta["dtype"] in _INT_TYPES:
            np_t = _INT_TYPES[meta["dtype"]][1]
        else:
            np_t = np.int64 if it.bit_width == 64 else np.int32
        vals = _decode_int_stream(chunk, meta, np_t)
        dense = pa.array(vals, type=it)
        if dense.type != t:
            dense = dense.cast(t)
    elif codec == "interval_mdn":
        rec = np.empty(m, dtype=np.dtype([("m", "<i4"), ("d", "<i4"), ("n", "<i8")]))
        rec["m"] = _decode_int_stream(chunk, meta["streams"]["months"], np.int32)
        rec["d"] = _decode_int_stream(chunk, meta["streams"]["days"], np.int32)
        rec["n"] = _decode_int_stream(chunk, meta["streams"]["nanos"], np.int64)
        dense = pa.Array.from_buffers(
            pa.month_day_nano_interval(), m, [None, pa.py_buffer(rec.tobytes())]
        )
    elif codec == "alp":
        np_t = np.float64 if meta["num_type"] == "DOUBLE" else np.float32
        s = _decode_int_stream(chunk, meta["streams"]["scaled"], np.int64)
        # exact inverse of the encode arithmetic: int64 → float64
        # divide by the (exactly representable) power of 10 → column
        # dtype; losslessness was verified per value at encode time
        vals = (s / 10.0 ** int(meta["exp"])).astype(np_t)
        if int(meta.get("n_exceptions", 0)):
            pos = _decode_int_stream(chunk, meta["streams"]["exc_pos"], np.int64)
            exc = np.frombuffer(bytes(_segment(chunk, meta["segments"]["exc_raw"])), dtype=np_t)
            vals[pos] = exc
        dense = pa.array(vals[:m], type=t)
    elif codec == "plain_num":
        vals = plain.decode_numeric(bytes(_segment(chunk, meta["segments"]["data"])), meta["num_type"])
        dense = pa.array(vals[:m], type=t)
    elif codec in ("bss_zstd", "num_zstd"):
        raw = pa.Codec("zstd").decompress(
            bytes(_segment(chunk, meta["segments"]["data"])), meta["uncompressed_size"], asbytes=True
        )
        if codec == "bss_zstd":
            itemsize = 8 if meta["num_type"] == "DOUBLE" else 4
            raw = np.frombuffer(raw, dtype=np.uint8).reshape(itemsize, -1).T.copy().tobytes()
        vals = plain.decode_numeric(raw, meta["num_type"])
        dense = pa.array(vals[:m], type=t)
    else:
        raise ValueError(f"unknown codec {codec}")

    if not has_nulls:
        return dense
    # re-insert nulls: scatter dense values to valid positions
    valid = plain.decode_boolean(bytes(_segment(chunk, meta["validity"])), n)
    positions = np.flatnonzero(valid)
    if len(positions) == 0:
        return pa.nulls(n, type=dense.type)
    take_idx = np.full(n, -1, dtype=np.int64)
    take_idx[positions] = np.arange(len(positions))
    mask = pa.array(take_idx >= 0)
    take_arr = pa.array(np.where(take_idx >= 0, take_idx, 0))
    scattered = dense.take(take_arr)
    # null out invalid slots
    return pa.compute.if_else(mask, scattered, pa.scalar(None, type=scattered.type))
