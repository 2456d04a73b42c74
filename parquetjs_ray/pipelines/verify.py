"""Round-trip verification, order-insensitive and streaming.

The reference's invariant is per-row deep equality after write-then-read
(`/root/reference/test/integration.js:99-231`). At 10^12 rows a
driver-side sorted compare is impossible, so verification is a pair of
streaming aggregates: a vectorized 64-bit row hash (order-sensitive
WITHIN a row: token position is mixed in; order-insensitive ACROSS rows:
hashes are summed mod 2^64) computed over both the original dataset and
the decoded dataset. Equal (count, hash-sum) ⇒ multiset row equality
with overwhelming probability. Tests additionally do exact sorted
compares at small scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..arrow_util import list_buffers, string_buffers

__all__ = ["row_hashes", "dataset_fingerprint", "verify_roundtrip", "verify_artifact"]

_U = np.uint64


def _mix64(x: np.ndarray) -> np.ndarray:
    # in-place after one copy: 2 temporaries instead of 6 (heap growth is
    # the dominant cold cost on big token columns)
    x = x.astype(np.uint64, copy=True)
    t = x >> _U(30)
    x ^= t
    x *= _U(0xBF58476D1CE4E5B9)
    np.right_shift(x, _U(27), out=t)
    x ^= t
    x *= _U(0x94D049BB133111EB)
    np.right_shift(x, _U(31), out=t)
    x ^= t
    return x


def _mix64_inplace(x: np.ndarray) -> np.ndarray:
    """_mix64 mutating a caller-owned uint64 temp (no copy)."""
    t = x >> _U(30)
    x ^= t
    x *= _U(0xBF58476D1CE4E5B9)
    np.right_shift(x, _U(27), out=t)
    x ^= t
    x *= _U(0x94D049BB133111EB)
    np.right_shift(x, _U(31), out=t)
    x ^= t
    return x


_HASH_CHUNK = 1 << 22  # values per kernel chunk (32 MB of uint64 temps)


def _positional_value_hash(values: np.ndarray, offsets: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """mix64(value + P1*(in_row_pos+1)) summed per row, then mixed with
    the row length. Processed in bounded row-aligned chunks with in-place
    ops: peak temporaries stay ~2×32 MB regardless of batch size, so the
    kernel never grows a worker heap by the column size (fresh first-touch
    pages are the dominant cold cost on token columns in this sandbox)."""
    n = len(lens)
    sums = np.zeros(n, dtype=np.uint64)
    row = 0
    while row < n:
        # rows [row, end): at most _HASH_CHUNK values, at least one row
        end = int(np.searchsorted(offsets, offsets[row] + _HASH_CHUNK, side="right")) - 1
        end = min(max(end, row + 1), n)
        v0, v1 = int(offsets[row]), int(offsets[end])
        pos = np.arange(v0, v1, dtype=np.uint64)
        pos -= np.repeat(offsets[row:end], lens[row:end]).astype(np.uint64, copy=False)
        pos += _U(1)
        pos *= _U(0x9E3779B97F4A7C15)
        pos += values[v0:v1].astype(np.uint64)
        _mix64_inplace(pos)
        lslice = lens[row:end]
        nonempty = lslice > 0
        if nonempty.any():
            sums[row:end][nonempty] = np.add.reduceat(pos, (offsets[row:end] - v0)[nonempty])
        row = end
    sums ^= lens.astype(np.uint64)
    return _mix64_inplace(sums)


def _string_col_hash(arr: pa.Array) -> np.ndarray:
    """Full-content per-string hash: every byte weighted by its in-row position."""
    data, offsets = string_buffers(arr)
    lens = np.diff(offsets)
    if len(data) == 0:
        return _mix64(lens.astype(np.uint64))
    return _positional_value_hash(data, offsets, lens)


def _list_int_col_hash(arr: pa.Array) -> np.ndarray:
    flat, lens = list_buffers(arr)
    n = len(lens)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    if len(flat) == 0:
        return _mix64(lens.astype(np.uint64))
    return _positional_value_hash(flat, offsets, lens)


def _is_composite(t: pa.DataType) -> bool:
    return (
        pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t)
        or pa.types.is_struct(t)
        or pa.types.is_map(t)
    )


# incremented by the per-row repr fallback; tests pin that nested
# production types (list/struct at any nesting) never reach it
_REPR_FALLBACK_CALLS = 0


def _value_hashes(arr: pa.Array) -> np.ndarray:
    """Vectorized per-element content hash for ANY Arrow type, recursing
    through list/struct/map nesting with the same kernels the flat paths
    use — no per-row Python. Null elements hash to 0 (callers mix the
    validity bitmap separately, so null vs value is always distinguished
    at every nesting level)."""
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if arr.null_count:
        out = np.zeros(len(arr), dtype=np.uint64)
        vidx = np.flatnonzero(pc.is_valid(arr).to_numpy(zero_copy_only=False))
        if len(vidx):
            out[vidx] = _value_hashes(arr.drop_null())
        return out
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return _string_col_hash(arr)  # string_buffers reads all four layouts
    if pa.types.is_fixed_size_binary(t):
        return _string_col_hash(arr.cast(pa.binary()))
    if pa.types.is_map(t):
        # a map is a list<struct<key,value>> — reuse that shape
        arr = arr.cast(pa.list_(pa.struct([("key", t.key_type), ("value", t.item_type)])))
        t = arr.type
    if pa.types.is_fixed_size_list(t):
        arr = arr.cast(pa.list_(t.value_type))
        t = arr.type
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        if pa.types.is_integer(t.value_type):
            return _list_int_col_hash(arr)  # flat fast path, hash-compatible
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lo = int(offsets[0])
        lens = np.diff(offsets)
        child = arr.values.slice(lo, int(offsets[-1]) - lo)
        if len(child) == 0:
            return _mix64(lens.astype(np.uint64))
        ch = _value_hashes(child)
        # child validity is part of the element identity (null item ≠
        # item whose hash is 0) — added UNCONDITIONALLY so an element's
        # hash never depends on whether its batch-mates contain nulls
        if child.null_count:
            ch = ch + pc.is_valid(child).to_numpy(zero_copy_only=False).astype(np.uint64) * _U(7919)
        else:
            ch = ch + _U(7919)
        off0 = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=off0[1:])
        return _positional_value_hash(ch, off0, lens)
    if pa.types.is_struct(t):
        h = np.zeros(len(arr), dtype=np.uint64)
        # flatten() propagates the struct's validity into the children,
        # so garbage under null parents never reaches the hash
        for j, field in enumerate(arr.flatten()):
            fh = _value_hashes(field)
            h ^= _mix64(fh + _U(1000003) * _U(j + 1))
            fvalid = pc.is_valid(field).to_numpy(zero_copy_only=False)
            h ^= _mix64(fvalid.astype(np.uint64) + _U(7919) * _U(j + 1))
        return h
    if pa.types.is_interval(t):
        rec = np.frombuffer(
            arr.buffers()[1], dtype=np.uint64, count=2 * (len(arr) + arr.offset)
        )[2 * arr.offset :].reshape(-1, 2)
        return _mix64(rec[:, 0]) ^ _mix64(rec[:, 1] + _U(17))
    if pa.types.is_unsigned_integer(t):
        return _mix64(arr.cast(pa.uint64()).to_numpy(zero_copy_only=False).astype(np.uint64, copy=False))
    if pa.types.is_integer(t) or (pa.types.is_temporal(t) and not pa.types.is_interval(t)) or pa.types.is_boolean(t):
        return _mix64(arr.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64))
    if pa.types.is_floating(t):
        return _mix64(arr.to_numpy(zero_copy_only=False).astype(np.float64).view(np.uint64))
    # exotic leaves (decimal, dictionary, union): per-row repr, logged once
    global _REPR_FALLBACK_CALLS
    if not _REPR_FALLBACK_CALLS:
        import logging

        logging.getLogger(__name__).warning(
            "row_hashes: per-row Python fallback for type %s — add a vectorized branch", t
        )
    _REPR_FALLBACK_CALLS += 1
    import hashlib as _hl

    return np.array(
        [int.from_bytes(_hl.sha1(repr(x).encode()).digest()[:8], "little") for x in arr.to_pylist()],
        dtype=np.uint64,
    )


def row_hashes(batch: pa.Table) -> np.ndarray:
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for i, name in enumerate(sorted(batch.column_names)):
        col = batch.column(name)
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        t = arr.type
        # null-aware and batch-composition-independent: ALWAYS mix the
        # validity flags (so a row's hash never depends on whether its
        # batch-mates happen to contain nulls), then hash filled values.
        valid = pa.compute.is_valid(arr).to_numpy(zero_copy_only=False)
        h ^= _mix64(valid.astype(np.uint64) + _U(7919) * _U(i + 1))
        if arr.null_count:
            if _is_composite(t):
                # hash valid rows with the vectorized recursive kernel and
                # scatter: a row's hash never depends on its batch-mates'
                # nulls (validity itself is already mixed in above)
                ch = np.zeros(len(arr), dtype=np.uint64)
                vidx = np.flatnonzero(valid)
                if len(vidx):
                    ch[vidx] = _value_hashes(arr.drop_null())
                h ^= _mix64(ch + _U(1000003) * _U(i + 1))
                continue
            try:
                arr = pa.compute.fill_null(arr, pa.scalar("" if pa.types.is_string(t) else 0 if not pa.types.is_floating(t) else 0.0, type=t))
            except Exception:
                arr = pa.compute.fill_null(arr, arr[0])
        if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t):
            ch = _string_col_hash(arr if not pa.types.is_binary(t) else arr.cast(pa.binary()))
        elif pa.types.is_list(t) and pa.types.is_integer(t.value_type):
            ch = _list_int_col_hash(arr)
        elif _is_composite(t):
            # nested non-int-list types (list<string>, struct, map, …):
            # vectorized recursive kernel, never the per-row fallback
            ch = _value_hashes(arr)
        elif pa.types.is_interval(t):
            # month_day_nano: hash the raw (m:i4, d:i4, n:i8) records as
            # two uint64 words (vectorized; nulls already filled above? —
            # intervals have no fill scalar, so use the values buffer and
            # rely on the validity mix for null placement)
            rec = np.frombuffer(
                arr.buffers()[1], dtype=np.uint64, count=2 * (len(arr) + arr.offset)
            )[2 * arr.offset :].reshape(-1, 2)
            vmask = valid.astype(np.uint64)
            ch = _mix64(rec[:, 0] * vmask) ^ _mix64(rec[:, 1] * vmask + _U(17))
        elif pa.types.is_unsigned_integer(t):
            # unsigned must never go through a signed cast: uint64 ≥ 2^63
            # (and uint32 ≥ 2^31 through the old int32 path) would raise.
            # Same hash as before wherever the old path didn't crash
            # (identical uint64 bit pattern).
            vals = arr.cast(pa.uint64()).to_numpy(zero_copy_only=False)
            ch = _mix64(vals.astype(np.uint64, copy=False))
        elif pa.types.is_integer(t) or (pa.types.is_temporal(t) and not pa.types.is_interval(t)) or pa.types.is_boolean(t):
            bits = 64 if (pa.types.is_temporal(t) and t.bit_width == 64) or t.bit_width == 64 else 32
            ints = arr.cast(pa.int64() if bits == 64 else pa.int32()).cast(pa.int64())
            ch = _mix64(ints.to_numpy(zero_copy_only=False).astype(np.uint64))
        elif pa.types.is_floating(t):
            v = arr.to_numpy(zero_copy_only=False)
            bitsv = v.astype(np.float64).view(np.uint64)  # bit-pattern hash
            ch = _mix64(bitsv)
        else:
            # exotic leaves only (decimal/dictionary/union): _value_hashes
            # ends at a logged per-row fallback for these
            ch = _value_hashes(arr)
        h ^= _mix64(ch + _U(1000003) * _U(i + 1))
    return h


def _fingerprint_batch(batch: pa.Table) -> pa.Table:
    h = row_hashes(batch)
    return pa.table(
        {
            "count": pa.array([len(h)], type=pa.int64()),
            "hash_sum": pa.array([int(h.sum(dtype=np.uint64))], type=pa.uint64()),
        }
    )


def dataset_fingerprint(ds: rd.Dataset, columns: list[str] | None = None) -> tuple[int, int]:
    """(row count, 64-bit multiset hash) computed as a streaming aggregate."""
    if columns:
        ds = ds.select_columns(columns)
    parts = ds.map_batches(_fingerprint_batch, batch_format="pyarrow").take_all()
    count = sum(p["count"] for p in parts)
    hsum = 0
    for p in parts:
        hsum = (hsum + int(p["hash_sum"])) % (1 << 64)
    return count, hsum


def decode_fingerprint(out_dir: str) -> tuple[int, int]:
    """(row count, multiset hash) of the decoded artifact, with the hash
    computed INSIDE each decode task.

    ``dataset_fingerprint(decode_dataset(...))`` runs decode and hash as
    two (fused) map stages, which re-batches every decoded block through
    the second stage; here one function decodes a handful of fragments
    and immediately reduces them to a 2-cell partial, so decoded rows
    never cross a stage boundary and only kilobyte partials move."""
    import ray.data as rd

    from .encode import _decode_units, list_decode_units

    units = list_decode_units(out_dir)

    def fp_units(batch: pa.Table) -> pa.Table:
        return _fingerprint_batch(_decode_units(batch, out_dir))

    import ray

    # same block sizing as decode_dataset: 2 tasks per CPU (measured 2×
    # faster than per-fragment blocks; scheduling overhead, not codec CPU,
    # dominates at finer granularity)
    n_cpus = int(ray.cluster_resources().get("CPU", 32)) if ray.is_initialized() else 32
    parts = (
        rd.from_items(units, override_num_blocks=max(1, min(len(units), 2 * n_cpus)))
        .map_batches(fp_units, batch_format="pyarrow", batch_size=8)
        .take_all()
    )
    count = sum(p["count"] for p in parts)
    hsum = 0
    for p in parts:
        hsum = (hsum + int(p["hash_sum"])) % (1 << 64)
    return count, hsum


def verify_artifact(out_dir: str) -> dict:
    """Verify a decode against fingerprints STORED in the artifact
    (``encode_dataset(..., row_fingerprint=True)``): sums the per-unit
    (count, hash-sum) partials from the manifests, fingerprints one
    decode stream, compares. No re-scan of the original corpus — the
    scale-correct verification shape (checks cost one decode pass).
    """
    from .. import storage as st
    from ..stages.writer import read_global_manifest

    gm = read_global_manifest(out_dir)
    want_rows = 0
    want_hash = 0
    missing = 0
    for p in gm["partitions"]:
        pdir = st.join(out_dir, f"part-{p['partition']}")
        pm = st.read_json(st.join(pdir, "manifest.json"))
        units = (
            [st.read_json(st.join(pdir, f"frag-{fr}.json")) for fr in pm["fragments"]]
            if "fragments" in pm
            else [pm]
        )
        for um in units:
            if "fp_rows" not in um:
                missing += 1
                continue
            want_rows += int(um["fp_rows"])
            want_hash = (want_hash + int(um["fp_hash_sum"])) % (1 << 64)
    if missing:
        raise ValueError(
            f"{missing} units lack stored fingerprints — encode with row_fingerprint=True"
        )
    got_rows, got_hash = decode_fingerprint(out_dir)
    return {
        "rows_expected": want_rows,
        "rows_decoded": got_rows,
        "hash_expected": want_hash,
        "hash_decoded": got_hash,
        "equal": (want_rows == got_rows) and (want_hash == got_hash),
    }


def verify_roundtrip(original: rd.Dataset, decoded: rd.Dataset) -> dict:
    cols = sorted(original.schema().names)
    c1, h1 = dataset_fingerprint(original, cols)
    c2, h2 = dataset_fingerprint(decoded, cols)
    return {
        "rows_original": c1,
        "rows_decoded": c2,
        "hash_original": h1,
        "hash_decoded": h2,
        "equal": (c1 == c2) and (h1 == h2),
    }
