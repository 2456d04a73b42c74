"""Distributed set operations: INTERSECT / EXCEPT, set and bag semantics.

SQL's four row-set operators over two datasets with identical schemas:

* ``intersect``  (distinct rows present in BOTH sides)
* ``intersect_all`` (each row min(count_a, count_b) times)
* ``except_``    (distinct rows of A absent from B)
* ``except_all`` (each row max(count_a − count_b, 0) times)

Plan: tag each side, union, ONE row-hash shuffle (vectorized 64-bit
whole-row fingerprint — strings through the polynomial fingerprint,
numerics through bit-view mixing) partitioned into ``num_buckets``
hash buckets (equal rows always land in the same bucket), then resolve
each BUCKET with one vectorized Arrow ``group_by`` over the real
columns — exact regardless of hash collisions, and no per-distinct-row
Python group ever exists. Shuffle volume is the rows themselves
(inherent: the result contains rows); project to the needed columns
before calling.

The reference engine has no multi-table operators at all; this is part
of the engine-completeness surface (SURVEY §2.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .text import _mix64, fingerprint64

__all__ = ["dataset_setop"]

_U = np.uint64
_NULL_H = _U(0xA5A5_5A5A_DEAD_BEEF)
_OPS = ("intersect", "intersect_all", "except", "except_all")


def _col_hashes(arr: pa.Array) -> np.ndarray:
    """Vectorized per-value 64-bit hash of one column (nulls constant)."""
    t = arr.type
    null_mask = arr.is_null().to_numpy(zero_copy_only=False) if arr.null_count else None
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        h = fingerprint64(arr.fill_null("") if null_mask is not None else arr)
    elif pa.types.is_boolean(t):
        v = arr.cast(pa.int8()).fill_null(0).to_numpy(zero_copy_only=False)
        h = _mix64(v.astype(np.uint64))
    elif pa.types.is_integer(t) or pa.types.is_temporal(t):
        storage = pa.int64() if t.bit_width == 64 or pa.types.is_temporal(t) else pa.int32()
        v = arr.cast(storage).fill_null(0).to_numpy(zero_copy_only=False)
        h = _mix64(v.astype(np.int64).view(np.uint64))
    elif pa.types.is_floating(t):
        v = arr.fill_null(0.0).to_numpy(zero_copy_only=False)
        bits = v.view(np.uint64) if v.dtype == np.float64 else v.view(np.uint32).astype(np.uint64)
        h = _mix64(bits)
    else:
        raise TypeError(f"set ops support scalar columns only, got {t}")
    if null_mask is not None:
        h = h.copy()
        h[null_mask] = _NULL_H
    return h


def _row_hashes(t: pa.Table, cols: list[str]) -> np.ndarray:
    acc = np.full(t.num_rows, _U(0x0123_4567_89AB_CDEF), dtype=np.uint64)
    for i, c in enumerate(cols):
        arr = t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]
        acc = _mix64(acc ^ (_col_hashes(arr) + _U(0x9E37_79B9_7F4A_7C15) * _U(i + 1)))
    return acc


def dataset_setop(
    a: rd.Dataset, b: rd.Dataset, *, op: str = "intersect", num_buckets: int = 64
) -> rd.Dataset:
    """A ``op`` B over identically-named scalar columns → result rows.

    ``intersect``/``except`` return DISTINCT rows (SQL set semantics);
    the ``_all`` variants return bag multiplicities (min / clamped
    difference of per-side counts). Output columns are in SORTED name
    order (schemas are validated eagerly only when already known —
    ``Dataset.schema()`` on an unexecuted pipeline would silently run a
    limit-1 probe through every upstream stage; a mismatch otherwise
    fails at the union). ``num_buckets`` bounds one resolution group's
    size (both inputs' rows / num_buckets must fit a worker — size it
    up at corpus scale)."""
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}")
    sa = a.schema(fetch_if_missing=False)
    sb = b.schema(fetch_if_missing=False)
    if sa is not None and sb is not None and sorted(sa.names) != sorted(sb.names):
        raise ValueError(f"schemas differ: {sa.names} vs {sb.names}")

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            cols = sorted(t.column_names)
            t = t.select(cols)
            bucket = (_row_hashes(t, cols) % _U(num_buckets)).view(np.int64)
            return t.append_column("__b", pa.array(bucket)).append_column(
                "__side", pa.array(np.full(t.num_rows, side, np.int8))
            )

        return fn

    def resolve(g: pa.Table) -> pa.Table:
        cols = [c for c in g.column_names if c not in ("__b", "__side")]
        side = g["__side"].combine_chunks().to_numpy(zero_copy_only=False)
        g2 = (
            g.drop_columns(["__b", "__side"])
            .append_column("__ca", pa.array((side == 0).astype(np.int64)))
            .append_column("__cb", pa.array((side == 1).astype(np.int64)))
        )
        gb = g2.group_by(cols).aggregate([("__ca", "sum"), ("__cb", "sum")])
        na = gb["__ca_sum"].to_numpy(zero_copy_only=False)
        nb = gb["__cb_sum"].to_numpy(zero_copy_only=False)
        if op == "intersect":
            k = ((na > 0) & (nb > 0)).astype(np.int64)
        elif op == "intersect_all":
            k = np.minimum(na, nb)
        elif op == "except":
            k = ((na > 0) & (nb == 0)).astype(np.int64)
        else:  # except_all
            k = np.maximum(na - nb, 0)
        idx = np.repeat(np.arange(len(k)), k)
        return gb.select(cols).take(pa.array(idx))

    tagged = a.map_batches(tag(0), batch_format="pyarrow").union(
        b.map_batches(tag(1), batch_format="pyarrow")
    )
    return tagged.groupby("__b").map_groups(resolve, batch_format="pyarrow")
