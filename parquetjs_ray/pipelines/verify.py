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
            if pa.types.is_list(t) and pa.types.is_integer(t.value_type):
                # hash valid rows with the vectorized kernel and scatter:
                # a row's hash never depends on its batch-mates' nulls
                # (validity itself is already mixed in above)
                ch = np.zeros(len(arr), dtype=np.uint64)
                vidx = np.flatnonzero(valid)
                if len(vidx):
                    ch[vidx] = _list_int_col_hash(arr.drop_null())
                h ^= _mix64(ch + _U(1000003) * _U(i + 1))
                continue
            if not (pa.types.is_list(t) or pa.types.is_struct(t)):
                try:
                    arr = pa.compute.fill_null(arr, pa.scalar("" if pa.types.is_string(t) else 0 if not pa.types.is_floating(t) else 0.0, type=t))
                except Exception:
                    arr = pa.compute.fill_null(arr, arr[0])
            # other list/struct: fall through to the per-row repr fallback,
            # which hashes None deterministically regardless of batching
        if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t):
            ch = _string_col_hash(arr if not pa.types.is_binary(t) else arr.cast(pa.binary()))
        elif pa.types.is_list(t) and pa.types.is_integer(t.value_type):
            ch = _list_int_col_hash(arr)
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
            # generic fallback: per-row python repr hash (slow; nested types)
            import hashlib as _hl

            ch = np.array(
                [int.from_bytes(_hl.sha1(repr(x).encode()).digest()[:8], "little") for x in arr.to_pylist()],
                dtype=np.uint64,
            )
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

    parts = (
        rd.from_items(units)
        .map_batches(fp_units, batch_format="pyarrow", batch_size=4)
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
