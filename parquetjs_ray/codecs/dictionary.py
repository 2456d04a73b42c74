"""Dictionary + RLE codec.

The reference declares dictionary encodings in its thrift enum but never
implements them (`/root/reference/lib/codec/index.js:1-2`); this codec
is one of the north rule's additions. Two modes:

* **local**: dictionary built per chunk (``pa.compute.dictionary_encode``,
  C++-vectorized) and serialized next to the indices;
* **global**: a dictionary built once in the sampling pass, broadcast via
  ``ray.put`` to every encoder actor; chunks store indices only (via
  ``pc.index_in``) and reference the shared artifact — the right shape
  for a low-cardinality column like ``source`` at 10^12 rows.

Indices are encoded with the parquetjs RLE/bit-pack hybrid at
``bit_width(card-1)`` bits.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import frontcode, plain, rle
from .bitpack import bit_width

__all__ = [
    "encode_local",
    "decode_local",
    "encode_global",
    "decode_global",
    "serialize_dict",
    "deserialize_dict",
]


def serialize_dict(values: pa.Array) -> bytes:
    """Serialize dictionary values as a PLAIN BYTE_ARRAY page (strings/binary)."""
    arr = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.binary())
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int32, count=len(arr) + 1 + arr.offset)[arr.offset :]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.zeros(0, np.uint8)
    return plain.encode_byte_array(data, offsets.astype(np.int64))


def deserialize_dict(buf: bytes, card: int, *, as_string: bool = True) -> pa.Array:
    data, offsets = plain.decode_byte_array(buf, card)
    arr = pa.Array.from_buffers(
        pa.binary(),
        card,
        [None, pa.py_buffer(offsets.astype(np.int32).tobytes()), pa.py_buffer(data)],
    )
    return arr.cast(pa.string()) if as_string else arr


def _encode_indices(indices: np.ndarray, card: int) -> tuple[bytes, int]:
    width = bit_width(max(0, card - 1))
    return rle.encode(indices.astype(np.uint64), width, disable_envelope=True), width


def encode_local(arr: pa.Array, *, try_front: bool = True) -> tuple[bytes, bytes, dict]:
    """Per-chunk dictionary. Returns (index_buf, dict_buf, params).

    With ``try_front`` (default) the dictionary page is ALSO built
    sorted + front-coded (``codecs/frontcode.py``) and the smaller TOTAL
    (index stream + dictionary page — sorting remaps the indices, which
    can change their RLE size) wins; ``params["dict_fmt"]`` records the
    page format, defaulting to ``"plain"`` so pre-existing artifacts
    decode unchanged."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    denc = pc.dictionary_encode(arr)
    dict_vals = denc.dictionary
    indices = denc.indices.to_numpy(zero_copy_only=False)
    card = len(dict_vals)
    buf, width = _encode_indices(indices, card)
    dict_buf = serialize_dict(dict_vals)
    params = {"card": card, "width": width, "count": len(arr), "dict_fmt": "plain"}
    if try_front and card and (
        pa.types.is_string(dict_vals.type)
        or pa.types.is_large_string(dict_vals.type)
        or pa.types.is_binary(dict_vals.type)
    ):
        order = pc.array_sort_indices(dict_vals)
        order_np = order.to_numpy(zero_copy_only=False).astype(np.int64)
        rank = np.empty(card, np.int64)
        rank[order_np] = np.arange(card)
        sorted_vals = dict_vals.take(order).cast(pa.binary())
        b = sorted_vals.buffers()
        offs = np.frombuffer(b[1], dtype=np.int32, count=card + 1 + sorted_vals.offset)[
            sorted_vals.offset :
        ].astype(np.int64)
        data = (
            np.frombuffer(b[2], dtype=np.uint8)
            if b[2] is not None
            else np.zeros(0, np.uint8)
        )
        try:
            front_buf = frontcode.encode(data, offs)
        except ValueError:
            front_buf = None  # a dict string ≥ 64 KiB: PLAIN page it is
        if front_buf is not None:
            idx_sorted, _ = _encode_indices(rank[indices], card)
            if len(front_buf) + len(idx_sorted) < len(dict_buf) + len(buf):
                buf, dict_buf = idx_sorted, front_buf
                params["dict_fmt"] = "front"
    return buf, dict_buf, params


def deserialize_dict_front(buf: bytes, *, as_string: bool = True) -> pa.Array:
    data, offsets = frontcode.decode(buf)
    arr = pa.Array.from_buffers(
        pa.binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(offsets.astype(np.int32).tobytes()), pa.py_buffer(data)],
    )
    return arr.cast(pa.string()) if as_string else arr


def decode_local(index_buf: bytes, dict_buf: bytes, params: dict) -> pa.Array:
    card, n = int(params["card"]), int(params["count"])
    if params.get("dict_fmt", "plain") == "front":
        dict_vals = deserialize_dict_front(dict_buf)
    else:
        dict_vals = deserialize_dict(dict_buf, card)
    idx = rle.decode(index_buf, n, int(params["width"]), disable_envelope=True)
    return pc.take(dict_vals, pa.array(idx.astype(np.int64)))


def encode_global(arr: pa.Array, dict_vals: pa.Array) -> tuple[bytes, dict]:
    """Encode against a broadcast global dictionary. Unseen values raise."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    idx = pc.index_in(arr, value_set=dict_vals)
    if idx.null_count:
        raise ValueError("value not present in global dictionary")
    indices = idx.to_numpy(zero_copy_only=False)
    card = len(dict_vals)
    buf, width = _encode_indices(indices, card)
    return buf, {"card": card, "width": width, "count": len(arr)}


def decode_global(index_buf: bytes, dict_vals: pa.Array, params: dict) -> pa.Array:
    n = int(params["count"])
    idx = rle.decode(index_buf, n, int(params["width"]), disable_envelope=True)
    return pc.take(dict_vals, pa.array(idx.astype(np.int64)))
