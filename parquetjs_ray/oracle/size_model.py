"""Analytic size model of the reference's output for a north-rule table.

The reference cannot run in this sandbox (Node package, no node_modules),
so BASELINE.md operationalizes "≤ the reference's compressed size" as an
analytic computation of the bytes parquetjs would write for the same
table under its defaults (`/root/reference/lib/schema.js:129-131,137-139`:
PLAIN encoding, UNCOMPRESSED, 4096-row groups, one DATA_PAGE per column
chunk — `lib/writer.js:26,428-447`).

Payload bytes are exact (PLAIN size model from `lib/codec/plain.js` +
the faithful RLE oracle for level streams). Thrift overhead (compact
protocol PageHeader / ColumnMetaData / footer) is computed with a small
compact-protocol size calculator — field ids are all < 16 (short-form
1-byte headers), so sizes are exact for the structs parquetjs emits.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .parquetjs_rle import encode_reference

__all__ = ["reference_table_size", "plain_size"]

ROW_GROUP_SIZE = 4096  # lib/writer.js:26


def _uvarint_len(v: int) -> int:
    n = 1
    while v >= 0x80:
        v >>= 7
        n += 1
    return n


def _zigzag_len(v: int) -> int:
    return _uvarint_len((v << 1) ^ (v >> 63))


def _struct_size(int_fields: list[int], nested: list[int] = ()) -> int:
    """Compact-protocol struct size: 1-byte header per field (ids < 16),
    zigzag-varint int values, nested struct sizes, 1 stop byte."""
    size = 1  # stop
    for v in int_fields:
        size += 1 + _zigzag_len(int(v))
    for s in nested:
        size += 1 + s  # field header + pre-computed struct size
    return size


def _page_header_size(num_values: int, page_bytes: int) -> int:
    # PageHeader{type, uncompressed_page_size, compressed_page_size,
    #            data_page_header{num_values, encoding, dl_encoding, rl_encoding}}
    dph = _struct_size([num_values, 0, 3, 3])
    return _struct_size([0, page_bytes, page_bytes], [dph])


def plain_size(column: pa.ChunkedArray | pa.Array) -> int:
    """Exact PLAIN payload bytes for a column (lib/codec/plain.js size model)."""
    arr = column.combine_chunks() if isinstance(column, pa.ChunkedArray) else column
    t = arr.type
    n = len(arr)
    if pa.types.is_boolean(t):
        return (n + 7) // 8
    if pa.types.is_int32(t) or pa.types.is_float32(t):
        return 4 * n
    if pa.types.is_int64(t) or pa.types.is_float64(t):
        return 8 * n
    if pa.types.is_string(t) or pa.types.is_binary(t) or pa.types.is_large_string(t):
        total_data = int(pa.compute.sum(pa.compute.binary_length(arr)).as_py() or 0)
        return 4 * n + total_data
    if pa.types.is_fixed_size_binary(t):
        return t.byte_width * n
    raise TypeError(f"no PLAIN size model for {t}")


def reference_table_size(table: pa.Table) -> dict:
    """Bytes parquetjs would write for ``table`` under its defaults.

    Returns a per-column and total breakdown. List columns are costed as
    the reference costs a ``repeated`` field: RLE rlevel + dlevel streams
    (bitWidth 1, 4-byte envelopes — `lib/writer.js:314-331`) plus PLAIN
    values of the flattened child.
    """
    per_column: dict[str, int] = {}
    total = 8  # PAR1 magic twice (lib/writer.js:207-209, 520-569)
    n_rows = table.num_rows
    for name in table.column_names:
        col = table.column(name)
        col_bytes = 0
        for start in range(0, n_rows, ROW_GROUP_SIZE):
            chunk = col.slice(start, ROW_GROUP_SIZE)
            arr = chunk.combine_chunks() if isinstance(chunk, pa.ChunkedArray) else chunk
            if pa.types.is_list(arr.type):
                offsets = arr.offsets.to_numpy(zero_copy_only=False)
                lens = np.diff(offsets)
                # rlevels: 0 at each value-start, 1 inside; dlevels: all 1
                rl = np.ones(int(lens.sum()), dtype=np.uint64)
                starts = np.zeros(len(lens) + 1, dtype=np.int64)
                np.cumsum(lens, out=starts[1:])
                rl_idx = starts[:-1][lens > 0]
                rl[rl_idx] = 0
                dl = np.ones(len(rl), dtype=np.uint64)
                level_bytes = len(encode_reference(rl, 1)) + len(encode_reference(dl, 1))
                values_bytes = plain_size(arr.flatten())
                page = level_bytes + values_bytes
                page += _page_header_size(len(rl), page)
            else:
                values_bytes = plain_size(arr)
                page = values_bytes + _page_header_size(len(arr), values_bytes)
            col_bytes += page
            # ColumnMetaData: type, encodings list ≈ 3B, path ≈ len+2, codec,
            # num_values, sizes, offsets — model the int fields exactly, the
            # two small list/str fields with their measured encoding lengths
            col_bytes += _struct_size([1, 0, len(arr), page, page, total]) + 3 + len(name) + 2
        per_column[name] = col_bytes
        total += col_bytes
    # footer: schema elements + row-group skeleton (small, amortized)
    n_groups = (n_rows + ROW_GROUP_SIZE - 1) // ROW_GROUP_SIZE
    footer = 50 + sum(20 + len(n) for n in table.column_names) + 25 * n_groups
    total += footer + 8  # footer length + magic
    return {"per_column": per_column, "footer": footer, "total": total, "n_rows": n_rows}
