"""Zero-copy accessors for Arrow buffers (no per-row Python in hot paths)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["string_buffers", "list_buffers", "strings_from_buffers", "list_from_buffers"]


def string_buffers(arr: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(data uint8 array, int64 value offsets) of a string/binary array.

    Offsets are rebased to 0; data is sliced to the referenced range, so
    sliced/offset Arrow arrays are handled. Zero-copy views of the Arrow
    buffers except for the (cheap) offset rebase.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype, count=len(arr) + 1 + arr.offset)[arr.offset :]
    offsets = offsets.astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8, count=int(offsets[-1]))
        if bufs[2] is not None
        else np.zeros(0, dtype=np.uint8)
    )
    lo = int(offsets[0])
    return data[lo : int(offsets[-1])], offsets - lo


def strings_from_buffers(data: bytes | np.ndarray, offsets: np.ndarray, *, as_string: bool = True) -> pa.Array:
    """Rebuild a string/binary array from (data, int64 offsets)."""
    payload = data.tobytes() if isinstance(data, np.ndarray) else bytes(data)
    n = len(offsets) - 1
    arr = pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(np.asarray(offsets, dtype=np.int32).tobytes()), pa.py_buffer(payload)],
    )
    return arr.cast(pa.string()) if as_string else arr


def list_buffers(arr: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(flat child values as numpy, int64 per-row lengths) of a list array.

    ``ListArray.offsets`` is already slice-adjusted by pyarrow (length
    ``len(arr)+1`` starting at the slice), while ``.values`` is the FULL
    unsliced child — so the only rebase needed is by ``offsets[0]``.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = arr.values.to_numpy(zero_copy_only=False)
    lo = int(offsets[0])
    return values[lo : int(offsets[-1])], np.diff(offsets)


def list_from_buffers(flat: np.ndarray, lengths: np.ndarray, value_type: pa.DataType) -> pa.Array:
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), type=pa.int32()),
        pa.array(np.asarray(flat), type=value_type),
    )
