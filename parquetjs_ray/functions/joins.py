"""Distributed time-series joins Ray Data lacks natively.

Both operators use the engine's cogroup shape — ``union + groupby(by)``
(a repartition-join over the stable groupby operator) — and do the
per-group work fully vectorized with numpy ``searchsorted`` over sorted
timestamps. Shuffle volume is the projected join columns only, never
whole tables; the partitioning assumption is that one group (one ``by``
key's rows on both sides) fits a worker — the same per-user bound the
session-window operator relies on.

* :func:`asof_join` — for each left row, the LAST right row of the same
  ``by`` key with time ≤ the left time (backward as-of), deterministic
  tie-break on a caller-named column.
* :func:`range_join_count` — for each row, how many same-key rows fall
  in ``[t + lo_off, t + hi_off]`` (inclusive); the count form of an
  interval self-join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

__all__ = [
    "asof_join",
    "range_join_count",
    "equi_join",
    "auto_num_buckets",
    "semi_join",
    "interval_overlap_join",
    "string_key_join",
]


def _as_epoch_i64(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Normalize any temporal column to epoch-MICROSECOND int64 before
    comparison — a date32 right side against a timestamp[us] left side
    must not silently compare days against microseconds."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    t = arr.type
    if pa.types.is_timestamp(t):
        if t.unit != "us":
            arr = arr.cast(pa.timestamp("us", t.tz))
        return arr.cast(pa.int64())
    if pa.types.is_date(t):  # date32 (days) / date64 (ms) → midnight us
        return arr.cast(pa.timestamp("us")).cast(pa.int64())
    if pa.types.is_time(t):
        return arr.cast(pa.time64("us")).cast(pa.int64())
    if pa.types.is_integer(t):
        return arr.cast(pa.int64())
    raise TypeError(f"unsupported temporal join key type: {t}")


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    by: str,
    left_on: str,
    right_on: str,
    left_cols: list[str],
    right_cols: list[str],
    right_by: str | None = None,
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> rd.Dataset:
    """As-of join → left_cols + by + ``left_on`` (as epoch-us int64,
    named ``<left_on>_us``) + right_cols.

    ``direction="backward"`` (default) matches the latest right row at
    or before the left time (null when none exists) — ties on the right
    time break on the GREATEST ``tiebreak`` value. ``"forward"`` matches
    the earliest right row at or after the left time — ties break on the
    SMALLEST ``tiebreak`` (the next-scheduled-event shape).
    ``"nearest"`` matches the right row minimizing ``|right_t - left_t|``
    in either direction; among ALL rows at the minimal distance (at most
    two equal-time runs, one per side) the SMALLEST ``tiebreak`` wins —
    exactly ``row_number() OVER (PARTITION BY left_row ORDER BY abs(dt),
    tiebreak) = 1``. Every direction is deterministic and
    SQL-reproducible; ``tiebreak``
    defaults to the first of ``right_cols``. ``tolerance_us`` (the
    pandas ``merge_asof(tolerance=...)`` shape) voids a match whose time
    distance exceeds it — match SELECTION is unchanged, only matches
    outside the window become nulls, so the SQL replica is the plain
    as-of expression plus one CASE filter."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")
    if tolerance_us is not None and tolerance_us < 0:
        raise ValueError("tolerance_us must be >= 0")
    fwd = direction == "forward"
    near = direction == "nearest"
    tb = tiebreak or right_cols[0]
    rby = right_by or by
    lschema = left.schema()
    rschema = right.schema()
    lmap = dict(zip(lschema.names, lschema.types))
    rmap = dict(zip(rschema.names, rschema.types))
    ltypes = {n: lmap[n] for n in left_cols}
    rtypes = {n: rmap[n] for n in right_cols + [tb]}
    time_col = f"{left_on}_us"

    def left_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {"__by": b[by].cast(pa.int64()), "__t": _as_epoch_i64(b[left_on]), "__side": pa.array(np.zeros(n, np.int8))}
        for c in left_cols:
            cols[f"l_{c}"] = b[c]
        for c in rtypes:
            cols[f"r_{c}"] = pa.nulls(n, rtypes[c])
        return pa.table(cols)

    def right_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {"__by": b[rby].cast(pa.int64()), "__t": _as_epoch_i64(b[right_on]), "__side": pa.array(np.ones(n, np.int8))}
        for c in left_cols:
            cols[f"l_{c}"] = pa.nulls(n, ltypes[c])
        for c in rtypes:
            cols[f"r_{c}"] = b[c]
        return pa.table(cols)

    out_fields = [(c, ltypes[c]) for c in left_cols] + [(by, pa.int64()), (time_col, pa.int64())]
    out_fields += [(c, rtypes[c]) for c in right_cols]
    empty = pa.table({n: pa.array([], t) for n, t in out_fields})

    def merge(group: pa.Table) -> pa.Table:
        side = group["__side"].to_numpy(zero_copy_only=False)
        lsel = np.flatnonzero(side == 0)
        if not len(lsel):
            return empty
        lt = group["__t"].to_numpy(zero_copy_only=False)[lsel]
        rsel = np.flatnonzero(side == 1)
        cols: dict[str, pa.Array] = {}
        lidx = pa.array(lsel)
        for c in left_cols:
            cols[c] = pc.take(group[f"l_{c}"], lidx)
        cols[by] = pc.take(group["__by"], lidx)
        cols[time_col] = pa.array(lt, pa.int64())
        if len(rsel):
            rt = group["__t"].to_numpy(zero_copy_only=False)[rsel]
            # take first: the right-row slice has no nulls, so numpy keeps
            # the integer dtype (a raw to_numpy on the nullable column
            # would degrade to float64)
            rtb = pc.take(group[f"r_{tb}"], pa.array(rsel)).to_numpy(zero_copy_only=False)
            order = np.lexsort((rtb, rt))  # time asc, tiebreak asc
            rt_sorted = rt[order]
            if near:
                nr = len(rt_sorted)
                tb_sorted = rtb[order]
                # forward candidate: first row at-or-after (run head =
                # smallest tiebreak of its equal-time run)
                pos_f = np.searchsorted(rt_sorted, lt, side="left")
                have_f = pos_f < nr
                pf = np.minimum(pos_f, nr - 1)
                # backward candidate: run HEAD of the last equal-time
                # run at-or-before (smallest tiebreak of that run)
                pr = np.searchsorted(rt_sorted, lt, side="right") - 1
                have_b = pr >= 0
                prc = np.maximum(pr, 0)
                pb = np.searchsorted(rt_sorted, rt_sorted[prc], side="left")
                dist_f = rt_sorted[pf] - lt
                dist_b = lt - rt_sorted[pb]
                # min distance wins; equal distance -> smaller tiebreak.
                # At dist 0 both candidates are the SAME run head.
                use_b = have_b & (
                    ~have_f
                    | (dist_b < dist_f)
                    | ((dist_b == dist_f) & (tb_sorted[pb] <= tb_sorted[pf]))
                )
                pos = np.where(use_b, pb, pf)
                have = have_b | have_f
                if tolerance_us is not None:
                    dist = np.where(use_b, dist_b, dist_f)
                    have = have & (dist <= tolerance_us)
            elif fwd:
                # first right row at-or-after: 'left' lands on the first
                # of an equal-time run → smallest tiebreak
                pos = np.searchsorted(rt_sorted, lt, side="left")
                have = pos < len(rt_sorted)
                pos = np.minimum(pos, len(rt_sorted) - 1)
            else:
                # last right row at-or-before: 'right'-1 lands on the
                # last of an equal-time run → greatest tiebreak
                pos = np.searchsorted(rt_sorted, lt, side="right") - 1
                have = pos >= 0
                pos = np.maximum(pos, 0)
            if tolerance_us is not None and not near:  # nearest: handled above
                dist = (rt_sorted[pos] - lt) if fwd else (lt - rt_sorted[pos])
                have = have & (dist <= tolerance_us)
            take_idx = np.where(have, rsel[order[pos]], -1)
            mask = pa.array(have)
            for c in right_cols:
                taken = pc.take(group[f"r_{c}"], pa.array(np.maximum(take_idx, 0)))
                cols[c] = pc.if_else(mask, taken, pa.scalar(None, rtypes[c]))
        else:
            for c in right_cols:
                cols[c] = pa.nulls(len(lsel), rtypes[c])
        return pa.table(cols)

    unioned = left.map_batches(left_rows, batch_format="pyarrow").union(
        right.map_batches(right_rows, batch_format="pyarrow")
    )
    return unioned.groupby("__by").map_groups(merge, batch_format="pyarrow")


def _arrow_type(t) -> pa.DataType:
    """Normalize a Dataset.schema() entry to an Arrow type: parquet-backed
    Datasets report pa.DataType already, pandas-backed blocks report numpy
    dtypes (with ``object`` for strings)."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.string()


def _est_row_bytes(types: dict[str, pa.DataType]) -> int:
    """Conservative projected-row width for bucket sizing: fixed-width
    types by their byte width, variable-width (strings/binary/lists) at a
    flat 32-byte estimate — a sizing heuristic, not an exact accounting."""
    total = 8  # the int64 join key
    for t in types.values():
        try:
            total += max(_arrow_type(t).bit_width // 8, 1)
        except ValueError:  # variable-width type
            total += 32
    return total


def auto_num_buckets(
    left: rd.Dataset,
    right: rd.Dataset,
    ltypes: dict[str, pa.DataType],
    rtypes: dict[str, pa.DataType],
    *,
    target_bucket_bytes: int = 64 << 20,
) -> int:
    """Derive the equi-join bucket count from estimated shuffle volume so
    one bucket (both sides) always fits a worker at any input scale:
    ``ceil(projected_bytes / target_bucket_bytes)`` clamped to [16, 4096].

    ``count()`` is metadata-only for parquet-backed Datasets; callers
    whose inputs carry heavy lazy transforms should pass ``num_buckets``
    explicitly instead of paying a count() execution here."""
    est = left.count() * _est_row_bytes(ltypes) + right.count() * _est_row_bytes(rtypes)
    return int(min(4096, max(16, -(-est // target_bucket_bytes))))


def _plan_hot_keys(
    left: rd.Dataset,
    left_on: str,
    ltypes: dict[str, pa.DataType],
    *,
    target_bucket_bytes: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Find left keys whose row count alone exceeds one bucket's capacity
    (via the exact Misra-Gries :func:`heavy_hitters` pass — the tail never
    shuffles) and assign each a dedicated range of salt buckets sized
    ``ceil(count / rows_per_bucket)``. Returns ``(keys_sorted, base,
    salts)`` aligned int64 arrays, or ``None`` when no key is hot."""
    from parquetjs_ray.functions.heavy import heavy_hitters

    n_left = left.count()
    target_rows = max(1, target_bucket_bytes // _est_row_bytes(ltypes))
    if n_left <= target_rows:
        return None
    t = heavy_hitters(
        left.select_columns([left_on]), left_on, phi_num=target_rows, phi_den=n_left
    )
    if t.num_rows == 0:
        return None
    keys = t["key"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    counts = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    salts = -(-counts // target_rows)
    need = salts > 1
    if not need.any():
        return None
    keys, salts = keys[need], salts[need].astype(np.int64)
    order = np.argsort(keys)
    keys, salts = keys[order], salts[order]
    base = (np.cumsum(salts) - salts).astype(np.int64)
    return keys, base, salts


def equi_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_on: str,
    right_on: str,
    left_cols: list[str],
    right_cols: list[str],
    num_buckets: int | None = None,
    target_bucket_bytes: int = 64 << 20,
    salt_hot_keys: bool = False,
    how: str = "inner",
) -> rd.Dataset:
    """Equi-join of two LARGE Datasets (neither side broadcast): the
    large-large shuffle join the broadcast-join queries can't cover.
    ``how="left"`` keeps unmatched left rows with null right columns
    (the attach-optional-metadata shape) — correct under salting too,
    since every right row of a key lands in (or replicates into) the
    same bucket as its left rows, so "no match in the bucket" is "no
    match globally". ``how="full"`` additionally emits unmatched RIGHT
    rows with null left columns (the reconciliation/diff shape);
    incompatible with ``salt_hot_keys`` (replicated right rows would
    emit once per salt bucket).

    Both sides are shuffled by ``hash(key) % num_buckets`` — a bounded
    number of groups regardless of key cardinality, so there is no
    per-key Python-group overhead — and each bucket is joined with a
    vectorized sort + double ``searchsorted`` range expansion (the
    in-memory sort-merge join). Shuffle volume is the projected join
    columns only. Partitioning assumption: one bucket's rows (both
    sides) fit a worker; ``num_buckets=None`` (the default) sizes the
    bucket count from estimated projected bytes via
    :func:`auto_num_buckets` so that assumption holds at any input scale
    (≈``target_bucket_bytes`` per bucket). Keys must be integers (the
    TPC-H fact/dim shape); Ray's native ``Dataset.join`` is avoided
    deliberately (crashes on empty-schema blocks in 2.49).

    ``salt_hot_keys=True`` additionally bounds SINGLE-KEY skew, which
    hashing alone cannot: a Misra-Gries pass over the left keys finds
    every key whose own row count exceeds a bucket's capacity; each hot
    key gets ``ceil(count/rows_per_bucket)`` dedicated salt buckets —
    left hot rows spread round-robin across them, right hot rows are
    REPLICATED into each (cheap for the fact/dim shape where the right
    side holds few rows per key; a key hot on BOTH sides is the
    inherently quadratic case and stays out of scope). Exactness is
    unaffected: every left row still meets all its right matches exactly
    once. Costs two extra passes over the projected left key column.

    Output columns: ``left_on`` (int64 key) + left_cols + right_cols."""
    if how not in ("inner", "left", "full"):
        raise ValueError(f"how must be 'inner', 'left' or 'full', got {how!r}")
    if how == "full" and salt_hot_keys:
        # salting REPLICATES right rows across a hot key's salt buckets;
        # an unmatched right row would then emit once per replica
        raise ValueError("how='full' is incompatible with salt_hot_keys")
    lschema, rschema = left.schema(), right.schema()
    ltypes = {n: _arrow_type(t) for n, t in zip(lschema.names, lschema.types) if n in left_cols}
    rtypes = {n: _arrow_type(t) for n, t in zip(rschema.names, rschema.types) if n in right_cols}
    if num_buckets is None:
        num_buckets = auto_num_buckets(
            left, right, ltypes, rtypes, target_bucket_bytes=target_bucket_bytes
        )
    nb = np.int64(num_buckets)
    hot_plan = (
        _plan_hot_keys(left, left_on, ltypes, target_bucket_bytes=target_bucket_bytes)
        if salt_hot_keys
        else None
    )

    def l_project(b: pa.Table) -> pa.Table:
        n = b.num_rows
        k = b[left_on].cast(pa.int64()).combine_chunks()
        kv = k.to_numpy(zero_copy_only=False)
        bucket = kv % nb
        if hot_plan is not None and n:
            hk, hbase, hsalts = hot_plan
            pos = np.minimum(np.searchsorted(hk, kv), len(hk) - 1)
            m = hk[pos] == kv
            if m.any():
                sel = np.flatnonzero(m)
                hi = pos[sel]
                bucket[sel] = nb + hbase[hi] + (np.arange(len(sel)) % hsalts[hi])
        cols = {"__key": k, "__b": pa.array(bucket),
                "__side": pa.array(np.zeros(n, np.int8))}
        for c in left_cols:
            cols[f"l_{c}"] = b[c]
        for c in right_cols:
            cols[f"r_{c}"] = pa.nulls(n, rtypes[c])
        return pa.table(cols)

    def r_project(b: pa.Table) -> pa.Table:
        k = b[right_on].cast(pa.int64()).combine_chunks()
        kv = k.to_numpy(zero_copy_only=False)
        bucket = kv % nb
        if hot_plan is not None and b.num_rows:
            hk, hbase, hsalts = hot_plan
            pos = np.minimum(np.searchsorted(hk, kv), len(hk) - 1)
            m = hk[pos] == kv
            if m.any():
                # hot right rows are replicated into every salt bucket of
                # their key (and leave their hash bucket)
                sel = np.flatnonzero(m)
                hi = pos[sel]
                reps = hsalts[hi]
                offs = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
                take_idx = np.concatenate([np.flatnonzero(~m), np.repeat(sel, reps)])
                bucket = np.concatenate(
                    [bucket[~m], nb + np.repeat(hbase[hi], reps) + offs]
                )
                ti = pa.array(take_idx)
                b = b.take(ti)
                k = pc.take(k, ti)
        n = b.num_rows
        cols = {"__key": k, "__b": pa.array(bucket),
                "__side": pa.array(np.ones(n, np.int8))}
        for c in left_cols:
            cols[f"l_{c}"] = pa.nulls(n, ltypes[c])
        for c in right_cols:
            cols[f"r_{c}"] = b[c]
        return pa.table(cols)

    out_fields = [(left_on, pa.int64())] + [(c, ltypes[c]) for c in left_cols] + [
        (c, rtypes[c]) for c in right_cols
    ]
    empty = pa.table({n: pa.array([], t) for n, t in out_fields})

    def merge(group: pa.Table) -> pa.Table:
        side = group["__side"].to_numpy(zero_copy_only=False)
        lsel = np.flatnonzero(side == 0)
        rsel = np.flatnonzero(side == 1)
        keep_left = how in ("left", "full")
        if (not len(lsel) and how != "full") or (how == "inner" and not len(rsel)):
            return empty
        keys = group["__key"].to_numpy(zero_copy_only=False)
        lk, rk = keys[lsel], keys[rsel]
        order = np.argsort(rk, kind="stable")
        rk_sorted = rk[order]
        lo = np.searchsorted(rk_sorted, lk, side="left")
        hi = np.searchsorted(rk_sorted, lk, side="right")
        cnt = hi - lo
        if keep_left:
            # unmatched left rows emit once with null right columns: a
            # NULL take index yields nulls, so the expansion is uniform
            out_per_left = np.maximum(cnt, 1)
        else:
            out_per_left = cnt
        total = int(out_per_left.sum())
        li = lsel[np.repeat(np.arange(len(lk)), out_per_left)]
        # for left row i, right matches are rk_sorted[lo[i]:hi[i]]
        pos = np.arange(total) - np.repeat(
            np.cumsum(out_per_left) - out_per_left, out_per_left
        ) + np.repeat(lo, out_per_left)
        li_list: list = [pa.array(li)]
        if keep_left:
            matched = np.repeat(cnt > 0, out_per_left)
            ri_np = np.zeros(total, np.int64)
            ri_np[matched] = rsel[order[pos[matched]]]
            ri_a = pa.array(np.where(matched, ri_np, -1), pa.int64())
            ri_a = pc.if_else(pc.equal(ri_a, -1), pa.scalar(None, pa.int64()), ri_a)
        else:
            ri_a = pa.array(rsel[order[pos]])
        ri_list: list = [ri_a]
        key_list: list = [pa.array(keys[li]) if total else pa.array([], pa.int64())]
        if how == "full" and len(rsel):
            # right rows with no left partner emit once with null left cols
            r_unmatched = rsel[~np.isin(rk, lk)] if len(lsel) else rsel
            if len(r_unmatched):
                n_u = len(r_unmatched)
                li_list.append(pa.nulls(n_u, pa.int64()))
                ri_list.append(pa.array(r_unmatched))
                key_list.append(pa.array(keys[r_unmatched]))
        li_a = pa.concat_arrays([a.cast(pa.int64()) for a in li_list])
        ri_a = pa.concat_arrays([a.cast(pa.int64()) for a in ri_list])
        key_a = pa.concat_arrays([a.cast(pa.int64()) for a in key_list])
        if not len(key_a):
            return empty
        cols = {left_on: key_a}
        for c in left_cols:
            cols[c] = pc.take(group[f"l_{c}"], li_a)
        for c in right_cols:
            cols[c] = pc.take(group[f"r_{c}"], ri_a)
        return pa.table(cols)

    unioned = left.map_batches(l_project, batch_format="pyarrow").union(
        right.map_batches(r_project, batch_format="pyarrow")
    )
    return unioned.groupby("__b").map_groups(merge, batch_format="pyarrow")


def semi_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_on: str,
    right_on: str,
    anti: bool = False,
    broadcast_limit: int = 64 << 20,
    num_buckets: int | None = None,
    bloom_prefilter: bool = True,
    bloom_cap_bits: int = 1 << 27,
) -> rd.Dataset:
    """Semi-join (``anti=False``: keep left rows whose key appears on the
    right) or anti-join (``anti=True``: keep rows whose key does NOT) —
    the ``IN`` / ``NOT IN`` subquery shape. Left rows pass through with
    ALL their columns; nothing from the right is attached.

    Path selection mirrors the dedup verify stage: when the right side's
    distinct keys fit ``broadcast_limit`` (estimated from ``count()``
    metadata at 8 B/key before any execution), they are collected as one
    deduplicated int64 array, ``ray.put`` once, and the left side
    filters per batch with ``pc.is_in`` — ZERO shuffle, the 100 TB left
    side never moves.  Above the limit both sides hash-bucket like
    :func:`equi_join` (membership is a per-bucket ``np.isin``; here the
    whole left row must survive, so the bucketed leg shuffles the left
    rows once).

    ``bloom_prefilter`` (bucketed path only) cuts that left shuffle: a
    fixed-size Bloom filter of the right keys (10 bits/key up to
    ``bloom_cap_bits``, built as mergeable per-batch partials and OR'd)
    is broadcast once; bloom-NEGATIVE left rows are definitively
    non-members — dropped before the shuffle in semi mode, emitted
    DIRECTLY (no shuffle at all) in anti mode — so only true members
    plus the ~1% false-positive band ever enter the exchange. False
    positives are removed by the exact in-bucket verify; exactness is
    unaffected. Keys must be non-null integers (cast to int64), as in
    :func:`equi_join`."""
    if right.count() * 8 <= broadcast_limit:
        def distinct(b: pa.Table) -> pa.Table:
            k = b[right_on].cast(pa.int64()).combine_chunks()
            return pa.table({"k": pc.unique(k.drop_null())})

        partials = right.select_columns([right_on]).map_batches(
            distinct, batch_format="pyarrow"
        ).take_all()
        keys = np.unique(np.array([r["k"] for r in partials], np.int64))
        keys_ref = ray.put(keys)

        def filt(b: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            member = pc.is_in(b[left_on].cast(pa.int64()), value_set=pa.array(ks, pa.int64()))
            member = pc.fill_null(member, False)
            return b.filter(pc.invert(member) if anti else member)

        return left.map_batches(filt, batch_format="pyarrow")

    # bucketed path: cogroup by hash(key) % nb, per-bucket np.isin
    lschema = left.schema()
    ltypes = {n: _arrow_type(t) for n, t in zip(lschema.names, lschema.types)}
    if num_buckets is None:
        num_buckets = auto_num_buckets(left, right, ltypes, {right_on: pa.int64()})
    nb = np.int64(num_buckets)
    lnames = list(lschema.names)

    direct: rd.Dataset | None = None
    if bloom_prefilter:
        from parquetjs_ray.stages.bloom import _mix64, bloom_mask, build_bloom_fixed

        m = 256
        while m < right.count() * 10 and m < bloom_cap_bits:
            m <<= 1

        def partial_bloom(b: pa.Table) -> pa.Table:
            k = b[right_on].cast(pa.int64()).combine_chunks()
            h = _mix64(k.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64))
            return pa.table(
                {"bloom": pa.array([build_bloom_fixed(h, m).tobytes()], pa.large_binary())}
            )

        buf = np.zeros(m >> 3, np.uint8)
        for r in (
            right.select_columns([right_on])
            .map_batches(partial_bloom, batch_format="pyarrow")
            .take_all()
        ):
            buf |= np.frombuffer(r["bloom"], np.uint8)
        bloom_ref = ray.put(buf)

        def _lkey_hashes(b: pa.Table) -> np.ndarray:
            k = b[left_on].cast(pa.int64()).combine_chunks()
            return _mix64(k.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64))

        def keep_maybe(b: pa.Table) -> pa.Table:
            return b.filter(pa.array(bloom_mask(ray.get(bloom_ref), m, _lkey_hashes(b))))

        def keep_definite_miss(b: pa.Table) -> pa.Table:
            return b.filter(pa.array(~bloom_mask(ray.get(bloom_ref), m, _lkey_hashes(b))))

        if anti:
            direct = left.map_batches(keep_definite_miss, batch_format="pyarrow")
        left = left.map_batches(keep_maybe, batch_format="pyarrow")

    def l_rows(b: pa.Table) -> pa.Table:
        k = b[left_on].cast(pa.int64()).combine_chunks()
        kv = k.to_numpy(zero_copy_only=False)
        return b.append_column("__b", pa.array(kv % nb)).append_column(
            "__side", pa.array(np.zeros(b.num_rows, np.int8))
        ).append_column("__k", k)

    def r_rows(b: pa.Table) -> pa.Table:
        k = b[right_on].cast(pa.int64()).combine_chunks()
        kv = k.to_numpy(zero_copy_only=False)
        cols = {n: pa.nulls(b.num_rows, ltypes[n]) for n in lnames}
        t = pa.table(cols)
        return t.append_column("__b", pa.array(kv % nb)).append_column(
            "__side", pa.array(np.ones(b.num_rows, np.int8))
        ).append_column("__k", k)

    empty = pa.table({n: pa.array([], ltypes[n]) for n in lnames})

    def member(group: pa.Table) -> pa.Table:
        side = group["__side"].to_numpy(zero_copy_only=False)
        lsel = np.flatnonzero(side == 0)
        if not len(lsel):
            return empty
        keys = group["__k"].to_numpy(zero_copy_only=False)
        rkeys = np.unique(keys[side == 1])
        hit = np.isin(keys[lsel], rkeys)
        take = pa.array(lsel[~hit if anti else hit])
        return pa.table({n: pc.take(group[n], take) for n in lnames})

    unioned = left.map_batches(l_rows, batch_format="pyarrow").union(
        right.select_columns([right_on]).map_batches(r_rows, batch_format="pyarrow")
    )
    bucketed = unioned.groupby("__b").map_groups(member, batch_format="pyarrow")
    return bucketed.union(direct) if direct is not None else bucketed


def range_join_count(
    ds: rd.Dataset,
    *,
    by: str,
    on: str,
    lo_off_us: int,
    hi_off_us: int,
    id_col: str,
) -> rd.Dataset:
    """Per-row count of same-``by`` rows whose time lies in
    ``[t + lo_off_us, t + hi_off_us]`` (inclusive; a row counts itself
    when 0 is inside the window) → (id_col, n_in_range)."""

    def project(b: pa.Table) -> pa.Table:
        return pa.table({"__by": b[by].cast(pa.int64()), "__t": _as_epoch_i64(b[on]), id_col: b[id_col]})

    def count(group: pa.Table) -> pa.Table:
        t = group["__t"].to_numpy(zero_copy_only=False)
        order = np.argsort(t, kind="stable")
        ts = t[order]
        lo = np.searchsorted(ts, t + lo_off_us, side="left")
        hi = np.searchsorted(ts, t + hi_off_us, side="right")
        return pa.table({id_col: group[id_col], "n_in_range": pa.array((hi - lo).astype(np.int64))})

    return ds.map_batches(project, batch_format="pyarrow").groupby("__by").map_groups(
        count, batch_format="pyarrow"
    )


def interval_overlap_join(
    a: rd.Dataset,
    b: rd.Dataset,
    *,
    key_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
    bucket_us: int,
    max_buckets_per_interval: int = 256,
) -> rd.Dataset:
    """All same-key interval pairs that OVERLAP (inclusive:
    ``a.start ≤ b.end AND b.start ≤ a.end``) → ``(key, id_a, id_b)``.

    The interval-join shape ``asof_join``/``range_join_count`` don't
    cover: both sides are RANGES. Plan: every interval replicates to the
    time buckets it touches (``start//W .. end//W`` — replication factor
    = interval span / W, guarded loudly by ``max_buckets_per_interval``),
    partition by ``(key, bucket)``, and a pair is resolved EXACTLY ONCE
    in the bucket containing ``max(a.start, b.start)`` — that bucket is
    inside both intervals' ranges, so both copies are present there and
    nowhere else does the max-start rule fire. In-bucket matching is a
    per-A-row vectorized window over B sorted by start (searchsorted on
    ``b.start ≤ a.end``, mask on ``b.end ≥ a.start``), so group work is
    bounded by bucket occupancy, never corpus size.
    """
    W = int(bucket_us)
    if W <= 0:
        raise ValueError("bucket_us must be positive")

    def expand(side: int):
        def fn(t: pa.Table) -> pa.Table:
            s = np.asarray(_as_epoch_i64(t[start_col]))
            e = np.asarray(_as_epoch_i64(t[end_col]))
            if np.any(e < s):
                raise ValueError("interval end < start")
            b0 = s // W
            spans = (e // W - b0 + 1).astype(np.int64)
            if spans.max(initial=0) > max_buckets_per_interval:
                raise ValueError(
                    f"an interval touches {int(spans.max())} buckets "
                    f"(> {max_buckets_per_interval}); raise bucket_us"
                )
            idx = np.repeat(np.arange(len(s)), spans)
            # bucket id of each replica: b0 + within-interval offset
            off = np.arange(len(idx)) - np.repeat(
                np.concatenate(([0], np.cumsum(spans[:-1]))), spans
            )
            rep = pa.array(idx)
            return pa.table(
                {
                    "__k": t[key_col].take(rep),
                    "__b": pa.array(b0[idx] + off),
                    "__s": pa.array(s[idx]),
                    "__e": pa.array(e[idx]),
                    "__id": t[id_col].take(rep).cast(pa.int64()),
                    "__side": pa.array(np.full(len(idx), side, np.int8)),
                }
            )

        return fn

    def resolve(g: pa.Table) -> pa.Table:
        gid = int(g["__b"][0].as_py())
        side = g["__side"].combine_chunks().to_numpy(zero_copy_only=False)
        s = g["__s"].combine_chunks().to_numpy(zero_copy_only=False)
        e = g["__e"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = g["__id"].combine_chunks().to_numpy(zero_copy_only=False)
        am, bm = side == 0, side == 1
        empty = pa.table(
            {
                key_col: g["__k"].slice(0, 0),
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
            }
        )
        if not am.any() or not bm.any():
            return empty
        sb, eb, ib = s[bm], e[bm], ids[bm]
        order = np.argsort(sb, kind="stable")
        sb, eb, ib = sb[order], eb[order], ib[order]
        out_a, out_b = [], []
        for sa, ea, ia in zip(s[am], e[am], ids[am]):
            hi = int(np.searchsorted(sb, ea, side="right"))  # b.start ≤ a.end
            if not hi:
                continue
            m = (eb[:hi] >= sa) & (np.maximum(sb[:hi], sa) // W == gid)
            if m.any():
                out_a.extend([ia] * int(m.sum()))
                out_b.extend(ib[:hi][m].tolist())
        if not out_a:
            return empty
        return pa.table(
            {
                key_col: pa.concat_arrays([g["__k"].combine_chunks().slice(0, 1)] * len(out_a)),
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
            }
        )

    cols_a = a.map_batches(expand(0), batch_format="pyarrow")
    cols_b = b.map_batches(expand(1), batch_format="pyarrow")
    return (
        cols_a.union(cols_b)
        .groupby(["__k", "__b"])
        .map_groups(resolve, batch_format="pyarrow")
    )


def string_key_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_on: str,
    right_on: str,
    left_cols: list[str],
    right_cols: list[str],
    num_buckets: int | None = None,
    target_bucket_bytes: int = 64 << 20,
    fingerprint=None,
) -> rd.Dataset:
    """Inner equi-join on a STRING key (the north-rule ``doc_id:string``
    shape) — :func:`equi_join` handles integer keys only, so string keys
    route through it via a 64-bit content fingerprint: each side
    projects ``(fingerprint64(key), key, cols...)``, the bucketed
    sort-merge runs on the int64 fingerprint (8 B/row in the exchange
    instead of the full string), and an exact per-row string-equality
    verify after the merge removes fingerprint collisions — so the
    result is EXACT regardless of hash quality (pinned in tests by
    injecting a deliberately colliding fingerprint).

    Inner-only: a left row whose fingerprint matched only collision
    rows cannot be resurrected as "unmatched" after the verify without
    a second pass, so ``how='left'`` is not offered here — use an
    id-keyed :func:`equi_join` or a :func:`semi_join` prefilter for
    that shape. Output: ``left_on`` (string) + left_cols + right_cols.

    ``fingerprint`` (tests only): override the hash with a weaker one
    to force collisions."""
    from .text import fingerprint64

    fp_fn = fingerprint or fingerprint64
    # distinct sentinel names even when left_on == right_on
    lk, rk = f"__l_{left_on}_str", f"__r_{right_on}_str"

    def l_fp(b: pa.Table) -> pa.Table:
        fp = fp_fn(b[left_on])
        t = pa.table({"__fp": pa.array(fp.view(np.int64)), lk: b[left_on]})
        for c in left_cols:
            t = t.append_column(c, b[c])
        return t

    def r_fp(b: pa.Table) -> pa.Table:
        fp = fp_fn(b[right_on])
        t = pa.table({"__fp": pa.array(fp.view(np.int64)), rk: b[right_on]})
        for c in right_cols:
            t = t.append_column(c, b[c])
        return t

    joined = equi_join(
        left.map_batches(l_fp, batch_format="pyarrow"),
        right.map_batches(r_fp, batch_format="pyarrow"),
        left_on="__fp",
        right_on="__fp",
        left_cols=[lk, *left_cols],
        right_cols=[rk, *right_cols],
        num_buckets=num_buckets,
        target_bucket_bytes=target_bucket_bytes,
    )

    def verify(b: pa.Table) -> pa.Table:
        keep = pc.fill_null(pc.equal(b[lk], b[rk]), False)
        b = b.filter(keep)
        out = pa.table({left_on: b[lk]})
        for c in left_cols + right_cols:
            out = out.append_column(c, b[c])
        return out

    return joined.map_batches(verify, batch_format="pyarrow")
