"""Windowed aggregates over event streams (batch-on-log semantics).

Ray Data has no event-time windows; per the repo's streaming guidance the
input is treated as a partitioned log: ``groupby(key)`` co-locates one
key's events, ``map_groups`` sorts by timestamp within the group and
applies the window logic with vectorized numpy/pandas. Ordering
assumption: windows are computed per key over that key's full history in
the group — correct for bounded inputs; an unbounded deployment would
bucket time ranges first.

All outputs are integers so every operator here is SQL-oracle-checkable
(tumbling: GROUP BY floor; session: gaps-and-islands with LAG/SUM).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

__all__ = [
    "tumbling_counts",
    "session_windows",
    "sliding_counts",
    "running_totals",
    "lag_deltas",
    "funnel_stages",
    "rolling_window_agg",
    "ohlc_downsample",
    "resample_ffill",
    "twap_per_group",
    "cohort_retention",
    "transition_counts",
    "path_topk",
    "conversion_latency",
    "rate_change",
    "longest_streak",
    "rolling_distinct",
    "state_durations",
    "gap_quantiles",
    "activity_summary",
]


def tumbling_counts(ds: rd.Dataset, *, key: str = "user_id", ts: str = "ts", size_us: int = 3_600_000_000) -> rd.Dataset:
    """Count per (key, tumbling window)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    def bucket(batch: pa.Table) -> pa.Table:
        epoch = batch[ts].cast(pa.int64())
        b = pc.floor(pc.divide(epoch, size_us))
        return pa.table({key: batch[key], "bucket": b.cast(pa.int64())})

    return ds.map_batches(bucket, batch_format="pyarrow").groupby([key, "bucket"]).aggregate(
        Count(alias_name="n_events")
    )


def session_windows(
    ds: rd.Dataset, *, key: str = "user_id", ts: str = "ts",
    gap_us: int = 1_800_000_000, bucket_us: int | None = None,
) -> rd.Dataset:
    """Session windows: a new session starts when the gap to the previous
    event of the same key exceeds ``gap_us``. Returns one row per session
    (key, session_start_us, n_events) — all integers.

    Two-phase so NO group ever materializes one key's full history (a hot
    key at 100 TB owns billions of events):

    1. sessionize WITHIN ``(key, time bucket)`` groups — a group holds
       only that key's events inside one ``bucket_us`` span;
    2. merge cross-bucket chains over per-bucket BOUNDARY sessions only
       (the first and last session of each bucket — interior sessions are
       separated from both boundaries by > ``gap_us`` and pass through).

    ``bucket_us`` must exceed ``gap_us`` (default 16×): consecutive
    events inside one session are ≤ ``gap_us`` apart, so a session can
    never span an EMPTY bucket and boundary merges only ever join
    adjacent non-empty buckets. Phase-1 output (session summaries, ≤
    output-sized) is materialized to the object store so the boundary
    and interior branches don't recompute the event scan."""
    import pyarrow.compute as pc

    bucket_us = bucket_us or max(gap_us * 16, gap_us + 1)

    def bucketize(batch: pa.Table) -> pa.Table:
        epoch = batch[ts].cast(pa.int64())
        b = pc.divide(epoch, bucket_us)  # integer division (ts ≥ 0)
        return pa.table({key: batch[key], "__ts": epoch, "__b": b})

    def local_sessions(g: pd.DataFrame) -> pd.DataFrame:
        t = np.sort(g["__ts"].to_numpy())
        new = np.ones(len(t), dtype=bool)
        new[1:] = (t[1:] - t[:-1]) > gap_us
        sid = np.cumsum(new) - 1
        starts = t[new]
        counts = np.bincount(sid)
        last_idx = np.concatenate((np.flatnonzero(new)[1:] - 1, [len(t) - 1]))
        n_sess = len(starts)
        boundary = np.zeros(n_sess, dtype=bool)
        boundary[0] = boundary[-1] = True  # only these can merge across buckets
        return pd.DataFrame(
            {
                key: g[key].iloc[0],
                "session_start_us": starts,
                "session_end_us": t[last_idx],
                "n_events": counts,
                "__boundary": boundary,
            }
        )

    sessions = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby([key, "__b"])
        .map_groups(local_sessions, batch_format="pandas")
        .materialize()
    )
    def take_interior(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.invert(batch["__boundary"]))
        return out.select([key, "session_start_us", "n_events"])

    def take_boundary(batch: pa.Table) -> pa.Table:
        return batch.filter(batch["__boundary"])

    interior = sessions.map_batches(take_interior, batch_format="pyarrow")

    def merge_chains(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("session_start_us")
        s = g["session_start_us"].to_numpy()
        e = g["session_end_us"].to_numpy()
        n = g["n_events"].to_numpy()
        # a chain continues while the next boundary session starts within
        # gap_us of the running end (ends are bucket-monotone, so the
        # running max IS the previous end)
        new = np.ones(len(s), dtype=bool)
        new[1:] = (s[1:] - e[:-1]) > gap_us
        cid = np.cumsum(new) - 1
        return pd.DataFrame(
            {
                key: g[key].iloc[0],
                "session_start_us": s[new],
                "n_events": np.bincount(cid, weights=n).astype(np.int64),
            }
        )

    merged = (
        sessions.map_batches(take_boundary, batch_format="pyarrow")
        .groupby(key)
        .map_groups(merge_chains, batch_format="pandas")
    )
    return interior.union(merged)


def running_totals(
    ds: rd.Dataset, *, key: str = "user_id", ts: str = "ts",
    value: str = "event_id", bucket_us: int = 86_400_000_000,
) -> rd.Dataset:
    """Per-key running COUNT and SUM in event-time order — the
    ``SUM() OVER (PARTITION BY key ORDER BY ts ROWS UNBOUNDED PRECEDING)``
    window shape — emitted for EVERY event: ``(key, ts_us, cum_n, cum_v)``.
    ``value`` must be an integer column (exact 64-bit arithmetic, so the
    SQL oracle matches bit-for-bit); ``(key, ts)`` must be unique (true
    for event logs keyed by unique event ids).

    Hot-key-proof two-phase (like :func:`session_windows`): a naive
    ``groupby(key)`` materializes one key's entire history — billions of
    events for a hot key at 100 TB. Instead:

    1. bucket totals: ``groupby (key, ts // bucket_us)`` COUNT/SUM — a
       combiner-sized shuffle (one row per key-bucket);
    2. per-key EXCLUSIVE prefix over the bucket totals — a group here is
       one key's bucket summaries, bounded by the TIME SPAN, not volume;
    3. the offset rows union back into the event stream and cogroup by
       ``(key, bucket)``: each group sorts only that bucket's events and
       adds its local cumulative sums to the carried offset. No
       broadcast, no driver state; group size is one key's events within
       ``bucket_us``."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def bucketize(batch: pa.Table) -> pa.Table:
        epoch = batch[ts].cast(pa.int64())
        return pa.table(
            {
                key: batch[key],
                "__b": pc.divide(epoch, bucket_us).cast(pa.int64()),
                "__ts": epoch,  # ≥ 0; -1 marks offset carrier rows below
                "__v": batch[value].cast(pa.int64()),
            }
        )

    events = ds.map_batches(bucketize, batch_format="pyarrow")
    totals = events.groupby([key, "__b"]).aggregate(
        Count(alias_name="__n"), Sum("__v", alias_name="__s")
    )

    def prefix(g: pa.Table) -> pa.Table:
        b = g["__b"].to_numpy(zero_copy_only=False)
        n = g["__n"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = g["__s"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(b, kind="stable")
        n, s = n[o], s[o]
        oa = pa.array(o)
        return pa.table(
            {
                key: pc.take(g[key], oa),
                "__b": pc.take(g["__b"], oa),
                "__ts": pa.array(np.full(len(b), -1, np.int64)),
                "__v": pa.array(np.zeros(len(b), np.int64)),
                "__off_n": pa.array(np.cumsum(n) - n),
                "__off_v": pa.array(np.cumsum(s) - s),
            }
        )

    offsets = totals.groupby(key).map_groups(prefix, batch_format="pyarrow")

    def ev_align(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return batch.append_column("__off_n", pa.nulls(n, pa.int64())).append_column(
            "__off_v", pa.nulls(n, pa.int64())
        )

    def local(g: pd.DataFrame) -> pd.DataFrame:
        tcol = g["__ts"].to_numpy()
        is_off = tcol < 0
        off_n = int(g.loc[is_off, "__off_n"].iloc[0])
        off_v = int(g.loc[is_off, "__off_v"].iloc[0])
        ev = g[~is_off]
        t = ev["__ts"].to_numpy().astype(np.int64)
        v = ev["__v"].to_numpy().astype(np.int64)
        order = np.argsort(t, kind="stable")
        return pd.DataFrame(
            {
                key: ev[key].to_numpy()[order],
                "ts_us": t[order],
                "cum_n": off_n + np.arange(1, len(t) + 1, dtype=np.int64),
                "cum_v": off_v + np.cumsum(v[order]),
            }
        )

    return (
        events.map_batches(ev_align, batch_format="pyarrow")
        .union(offsets)
        .groupby([key, "__b"])
        .map_groups(local, batch_format="pandas")
    )


def lag_deltas(
    ds: rd.Dataset, *, key: str = "user_id", ts: str = "ts",
    order_id: str = "event_id", bucket_us: int = 86_400_000_000,
) -> rd.Dataset:
    """Per-key LAG: for every event, the time since that key's previous
    event — ``ts - LAG(ts) OVER (PARTITION BY key ORDER BY ts, order_id)``
    — emitted as ``(key, event_id, ts_us, delta_us)`` with ``delta_us = -1``
    for a key's first event (integer sentinel instead of NULL so the SQL
    oracle compares exactly). ``order_id`` breaks timestamp ties
    deterministically (must be unique per key).

    Hot-key-proof two-phase like :func:`running_totals` — a delta only
    couples CONSECUTIVE events, so:

    1. ``groupby (key, ts // bucket_us)`` sorts one key's events WITHIN
       one time bucket (group size bounded by the bucket span, never the
       key's total volume) and resolves every delta except the bucket's
       first event; that first event doubles as the bucket's summary row,
       carrying the bucket's last ts;
    2. a per-key pass over the summary rows (one per NON-EMPTY bucket —
       bounded by the time span) resolves each bucket's first event
       against the previous non-empty bucket's last ts. Empty buckets
       are fine — unlike sessionization there is no gap bound.

    Phase-1 output is materialized so the interior/first-event branches
    don't re-run the event shuffle."""
    import pyarrow.compute as pc

    def bucketize(batch: pa.Table) -> pa.Table:
        epoch = batch[ts].cast(pa.int64())
        return pa.table(
            {
                key: batch[key],
                "__b": pc.divide(epoch, bucket_us).cast(pa.int64()),
                "__ts": epoch,
                "__id": batch[order_id].cast(pa.int64()),
            }
        )

    def local(g: pd.DataFrame) -> pd.DataFrame:
        t = g["__ts"].to_numpy().astype(np.int64)
        i = g["__id"].to_numpy().astype(np.int64)
        o = np.lexsort((i, t))
        t, i = t[o], i[o]
        n = len(t)
        delta = np.empty(n, np.int64)
        delta[1:] = t[1:] - t[:-1]
        last_ts = np.full(n, -1, np.int64)
        first = np.zeros(n, bool)
        last_ts[-1] = t[-1]  # the final row is the bucket-first/summary row
        first[-1] = True
        return pd.DataFrame(
            {
                key: g[key].iloc[0],
                "event_id": np.concatenate((i[1:], i[:1])),
                "ts_us": np.concatenate((t[1:], t[:1])),
                "delta_us": np.concatenate((delta[1:], [np.int64(-1)])),
                "__b": int(g["__b"].iloc[0]),
                "__last_ts": last_ts,
                "__first": first,
            }
        )

    phase1 = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby([key, "__b"])
        .map_groups(local, batch_format="pandas")
        .materialize()
    )

    def take_interior(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.invert(batch["__first"]))
        return out.select([key, "event_id", "ts_us", "delta_us"])

    interior = phase1.map_batches(take_interior, batch_format="pyarrow")

    def take_first(batch: pa.Table) -> pa.Table:
        out = batch.filter(batch["__first"])
        return out.select([key, "event_id", "ts_us", "__b", "__last_ts"])

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__b")
        tf = g["ts_us"].to_numpy().astype(np.int64)
        last = g["__last_ts"].to_numpy().astype(np.int64)
        delta = np.empty(len(g), np.int64)
        delta[0] = -1
        delta[1:] = tf[1:] - last[:-1]
        return pd.DataFrame(
            {
                key: g[key].to_numpy(),
                "event_id": g["event_id"].to_numpy(),
                "ts_us": tf,
                "delta_us": delta,
            }
        )

    firsts = (
        phase1.map_batches(take_first, batch_format="pyarrow")
        .groupby(key)
        .map_groups(resolve, batch_format="pandas")
    )
    return interior.union(firsts)


def sliding_counts(
    ds: rd.Dataset, *, key: str = "user_id", ts: str = "ts",
    size_us: int = 3_600_000_000, step_us: int = 900_000_000,
) -> rd.Dataset:
    """Sliding windows as overlapping steps: an event at time t belongs to
    every window whose start is in (t-size, t]; emitted per (key, window
    start step) via a flat-map-style expansion inside map_batches."""
    from ray.data.aggregate import Count

    k = size_us // step_us

    def expand(batch: pa.Table) -> pa.Table:
        epoch = batch[ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keys = batch[key].to_numpy(zero_copy_only=False)
        base_step = epoch // step_us
        steps = (base_step[:, None] - np.arange(k)[None, :]).reshape(-1)
        kk = np.repeat(keys, k)
        win_start = steps * step_us
        keep = win_start + size_us > np.repeat(epoch, k)
        return pa.table(
            {key: pa.array(kk[keep]), "win_start_us": pa.array(win_start[keep])}
        )

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby([key, "win_start_us"])
        .aggregate(Count(alias_name="n_events"))
    )


def activity_summary(
    ds: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    bucket_us: int = 86_400_000_000,
) -> rd.Dataset:
    """Per-key activity report in ONE pair shuffle → ``(key, n_events,
    n_active, first_bucket, last_bucket, events_per_active_milli)``
    (the lifetime-summary table an engagement pipeline materializes;
    per-domain crawl cadence over a corpus). All integers
    (``events_per_active_milli = (1000·n_events) // n_active``) →
    hash-exact.

    Scale shape: per-batch (key, bucket) → count combiner, one pair-
    sized Sum exchange, then ONE vectorized fold per key-hash bucket
    (never per key) over rows bounded by keys × calendar."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .dedup import _mix64

    num_buckets = 256

    def bucketize(batch: pa.Table) -> pa.Table:
        epoch = batch[ts].cast(pa.int64())
        t = pa.table(
            {key: batch[key], "__b": pc.divide(epoch, bucket_us).cast(pa.int64())}
        )
        return t.group_by([key, "__b"]).aggregate([([], "count_all")])

    def add_bk(b: pa.Table) -> pa.Table:
        u = b[key].cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
        bk = (_mix64(u) % np.uint64(num_buckets)).astype(np.int64)
        return b.append_column("__bk", pa.array(bk, pa.int64()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].to_numpy()
        b = g["__b"].to_numpy().astype(np.int64)
        c = g["__n"].to_numpy().astype(np.int64)
        o = np.lexsort((b, k))
        k, b, c = k[o], b[o], c[o]
        n = len(k)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new_key)
        ends = np.concatenate((starts[1:], [n])) - 1
        seg = np.cumsum(new_key) - 1
        sums = np.bincount(seg, weights=c).astype(np.int64)
        n_active = (ends - starts + 1).astype(np.int64)
        return pd.DataFrame(
            {
                key: k[starts],
                "n_events": sums,
                "n_active": n_active,
                "first_bucket": b[starts],
                "last_bucket": b[ends],
                "events_per_active_milli": (1000 * sums) // n_active,
            }
        )

    return (
        ds.select_columns([key, ts])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby([key, "__b"])
        .aggregate(Sum("count_all", alias_name="__n"))
        .map_batches(add_bk, batch_format="pyarrow")
        .groupby("__bk")
        .map_groups(fold, batch_format="pandas")
    )


def rolling_distinct(
    ds: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    bucket_us: int = 86_400_000_000,
    window_buckets: int = 7,
) -> rd.Dataset:
    """Rolling DISTINCT count — e.g. trailing-7-day active users per day:
    for every ACTIVE bucket ``d`` (one with ≥1 event), the number of
    distinct keys seen in buckets ``(d−window+1 … d)`` →
    ``(bucket, n_distinct)``. The active-user metric
    :func:`sliding_counts` (plain counts) cannot express — distinct does
    not decompose into per-bucket sums.

    Scale shape: events collapse to distinct (key, bucket) pairs per
    batch BEFORE anything shuffles; each pair replicates to the ≤
    ``window_buckets`` trailing windows it serves (filtered against the
    broadcast ACTIVE-bucket set, calendar-bounded); one (bucket, key)
    dedup exchange of those pairs (≤ window × pairs rows, never event
    volume) feeds a per-bucket count. Hash-exact vs the SQL range-join
    + ``count(DISTINCT)`` replica."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    def pairs(batch: pa.Table) -> pa.Table:
        epoch = batch[ts].cast(pa.int64())
        t = pa.table(
            {key: batch[key], "__b": pc.divide(epoch, bucket_us).cast(pa.int64())}
        )
        return t.group_by([key, "__b"]).aggregate([])

    dpairs = (
        ds.select_columns([key, ts])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby([key, "__b"])
        .aggregate(Count(alias_name="__c"))  # dedup exchange; count unused
        .materialize()  # reused: active-bucket probe + the expansion pass
    )
    active = np.array(
        sorted(
            r["__b"]
            for r in dpairs.groupby("__b")
            .aggregate(Count(alias_name="__n"))
            .take_all()
        ),
        dtype=np.int64,
    )  # calendar-bounded (one int per non-empty bucket; driver holds buckets, never pairs)

    def expand(batch: pa.Table) -> pa.Table:
        b = batch["__b"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = batch[key].to_numpy(zero_copy_only=False)
        wins = (b[:, None] + np.arange(window_buckets)[None, :]).reshape(-1)
        kk = np.repeat(k, window_buckets)
        keep = np.isin(wins, active)  # only windows anchored at ACTIVE buckets
        return pa.table(
            {key: pa.array(kk[keep]), "bucket": pa.array(wins[keep], pa.int64())}
        )

    return (
        dpairs.map_batches(expand, batch_format="pyarrow")
        .groupby(["bucket", key])
        .aggregate(Count(alias_name="__c"))  # dedup (bucket, key)
        .groupby("bucket")
        .aggregate(Count(alias_name="n_distinct"))
    )


def funnel_stages(
    ds: rd.Dataset,
    stages: list[str],
    *,
    key: str = "user_id",
    type_col: str = "event_type",
    ts: str = "ts",
    within_us: int | None = None,
) -> rd.Dataset:
    """Ordered conversion funnel: for each prefix of ``stages``, how
    many distinct keys completed it IN TEMPORAL ORDER — stage i counts a
    key iff it has a stage-i event STRICTLY AFTER the earliest valid
    completion time of stage i-1 (the standard product-analytics funnel,
    greedy-earliest matching).

    One shuffle total: events are pre-filtered to the stage types and
    projected to ``(key, stage_index, ts)`` triples — the text/props
    payload never moves — then a single ``groupby(key).map_groups``
    walks the whole chain per key with ``searchsorted`` over per-stage
    sorted timestamps (no per-event Python). Per-key depth rows are
    kilobytes; the final per-stage count is an in-batch fold. Per-key
    group size is that key's stage-event count (same bounded-history
    assumption as :func:`session_windows`, documented at module top).

    ``within_us`` adds the conversion-window constraint: stage i only
    counts when it happens within ``within_us`` of the matched stage-i-1
    time (strictly after, at most T later) — the "purchased within 24 h
    of clicking" shape. Semantics stay FIRST-TOUCH ANCHORED (the greedy
    chain from each key's earliest stage-0 event), the standard
    product-analytics definition. Note this is NOT max-conversion
    matching: with a window, a later stage-0 anchor can occasionally
    convert where the earliest cannot; counting such keys requires
    per-key dynamic matching, deliberately out of scope.

    Output: ``(stage, event_type, n_keys)`` — stage is 1-based; every
    stage emits a row even at zero survivors.
    """
    import pyarrow.compute as pc

    if not stages:
        raise ValueError("stages must be non-empty")
    stage_arr = pa.array(stages)
    n_stages = len(stages)

    def project(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch[type_col], value_set=stage_arr)
        keep = pc.is_valid(idx)
        t = pa.table(
            {
                key: batch[key],
                "__stage": idx.cast(pa.int64()),
                "__ts": batch[ts].cast(pa.int64()),
            }
        ).filter(keep)
        return t

    def depth_of_key(g: pd.DataFrame) -> pd.DataFrame:
        st = g["__stage"].to_numpy()
        tv = g["__ts"].to_numpy()
        depth = 0
        prev = None
        for i in range(n_stages):
            arr = np.sort(tv[st == i])
            if prev is None:
                if len(arr) == 0:
                    break
                prev = arr[0]
            else:
                pos = int(np.searchsorted(arr, prev, side="right"))
                if pos >= len(arr):
                    break
                nxt = arr[pos]
                if within_us is not None and nxt - prev > within_us:
                    break
                prev = nxt
            depth = i + 1
        return pd.DataFrame({"depth": [depth]})

    def fold(batch: pa.Table) -> pa.Table:
        d = batch["depth"].to_numpy(zero_copy_only=False)
        # keys at depth d survive stages 1..d → suffix-sum the histogram
        hist = np.bincount(d, minlength=n_stages + 1)
        surv = np.cumsum(hist[::-1])[::-1]  # surv[i] = count(depth >= i)
        return pa.table({"__partial": pa.array(surv[1:].astype(np.int64))}).append_column(
            "stage", pa.array(np.arange(1, n_stages + 1, dtype=np.int64))
        )

    from ray.data.aggregate import Sum

    depths = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby(key)
        .map_groups(depth_of_key, batch_format="pandas")
    )
    counts = (
        depths.map_batches(fold, batch_format="pyarrow")
        .groupby("stage")
        .aggregate(Sum("__partial", alias_name="n_keys"))
    )

    def label(batch: pa.Table) -> pa.Table:
        s = batch["stage"].to_numpy(zero_copy_only=False).astype(np.int64)
        names = np.array(stages, dtype=object)[s - 1]
        return pa.table(
            {
                "stage": batch["stage"],
                "event_type": pa.array(names.tolist(), type=pa.string()),
                "n_keys": batch["n_keys"],
            }
        )

    return counts.map_batches(label, batch_format="pyarrow")


def _range_minmax(vals: np.ndarray, lo: np.ndarray, hi: np.ndarray):
    """Vectorized range-min/max queries over ``vals`` for half-open index
    windows ``[lo, hi)`` (every window non-empty) via an O(n log n) sparse
    table — log n numpy passes to build, one pass per distinct window
    log-size to answer. No Python loop over queries."""
    mn = [vals]
    mx = [vals]
    j = 1
    while (1 << j) <= len(vals):
        h = 1 << (j - 1)
        mn.append(np.minimum(mn[-1][:-h], mn[-1][h:]))
        mx.append(np.maximum(mx[-1][:-h], mx[-1][h:]))
        j += 1
    k = np.floor(np.log2(hi - lo)).astype(np.int64)
    out_mn = np.empty(len(lo), vals.dtype)
    out_mx = np.empty(len(lo), vals.dtype)
    for kk in np.unique(k):
        m = k == kk
        h = 1 << int(kk)
        out_mn[m] = np.minimum(mn[kk][lo[m]], mn[kk][hi[m] - h])
        out_mx[m] = np.maximum(mx[kk][lo[m]], mx[kk][hi[m] - h])
    return out_mn, out_mx


def rolling_window_agg(
    ds: rd.Dataset, *, key: str = "user_id", ts: str = "ts",
    order_id: str = "event_id", value: str = "value",
    size_us: int = 3_600_000_000, bucket_us: int | None = None,
) -> rd.Dataset:
    """Trailing time-range window aggregate: for every event, COUNT /
    MIN(value) / MAX(value) over the same key's events in ``[t - size,
    t]`` (both ends inclusive) — exactly SQL's ``... OVER (PARTITION BY
    key ORDER BY ts RANGE BETWEEN size PRECEDING AND CURRENT ROW)``.
    Output ``(key, event_id, ts_us, n_window, min_value, max_value)``;
    count is int64, min/max are order-independent so the whole row is
    hash-exact against the SQL window even on doubles.

    Hot-key-proof in ONE shuffle: a window reaches back at most
    ``size_us``, so with time buckets of ``bucket_us >= size_us`` every
    window is covered by the event's own bucket plus the previous one.
    Each event is shipped twice — once as an aggregation subject in its
    own ``(key, ts // bucket_us)`` group, once as carried context into
    the NEXT bucket's group — and each group answers its own events'
    windows with sorted-timestamp ``searchsorted`` bounds + a sparse
    table for range-min/max (:func:`_range_minmax`). Group size is
    bounded by two buckets' volume, never a key's total history; shuffle
    volume is 2× the projected ``(key, ts, id, value)`` columns.
    """
    import pyarrow.compute as pc

    if bucket_us is None:
        bucket_us = size_us
    if bucket_us < size_us:
        raise ValueError("bucket_us must be >= size_us so one carry bucket suffices")

    def expand(batch: pa.Table) -> pa.Table:
        epoch = batch[ts].cast(pa.int64())
        b = pc.divide(epoch, bucket_us).cast(pa.int64())
        cols = {
            key: batch[key],
            "__ts": epoch,
            "__id": batch[order_id].cast(pa.int64()),
            "__v": batch[value].cast(pa.float64()),
        }
        own = pa.table({**cols, "__b": b, "__own": pa.array(np.ones(len(batch), bool))})
        carry = pa.table(
            {**cols, "__b": pc.add(b, 1), "__own": pa.array(np.zeros(len(batch), bool))}
        )
        return pa.concat_tables([own, carry])

    def local(g: pd.DataFrame) -> pd.DataFrame:
        t = g["__ts"].to_numpy().astype(np.int64)
        v = g["__v"].to_numpy().astype(np.float64)
        own = g["__own"].to_numpy().astype(bool)
        eid = g["__id"].to_numpy().astype(np.int64)
        o = np.argsort(t, kind="stable")
        t, v, own, eid = t[o], v[o], own[o], eid[o]
        sel = np.flatnonzero(own)
        if len(sel) == 0:  # carry-only group (next bucket has no events)
            return pd.DataFrame(
                {key: [], "event_id": [], "ts_us": [], "n_window": [],
                 "min_value": [], "max_value": []}
            )
        ts_self = t[sel]
        lo = np.searchsorted(t, ts_self - size_us, side="left")
        hi = np.searchsorted(t, ts_self, side="right")
        mn, mx = _range_minmax(v, lo, hi)
        return pd.DataFrame(
            {
                key: g[key].iloc[0],
                "event_id": eid[sel],
                "ts_us": ts_self,
                "n_window": (hi - lo).astype(np.int64),
                "min_value": mn,
                "max_value": mx,
            }
        )

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby([key, "__b"])
        .map_groups(local, batch_format="pandas")
    )


def ohlc_downsample(
    ds: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    order_id: str = "event_id",
    value: str = "value",
    bucket_us: int = 3_600_000_000,
) -> rd.Dataset:
    """Downsample an event stream to one row per ``(key, time bucket)``
    with open / high / low / close of ``value`` plus the event count —
    the classic telemetry/finance reduction that shrinks a raw stream by
    the bucket factor before it ever hits wide storage. Open/close are
    the values at the bucket's first/last event ordered by ``(ts,
    order_id)`` (the id tiebreak makes both deterministic, so the row
    hash-matches SQL's ``first(value ORDER BY ts, id)``).

    Fully pre-aggregated BEFORE the shuffle: each batch collapses to ONE
    partial row per (key, bucket) it touches — sort the batch by (key,
    bucket, ts, id), take run boundaries, slice endpoints and segmented
    min/max — so shuffle volume is bounded by (touched groups ×
    batches), never the event count, and the final per-group merge sees
    at most one row per batch. No group ever holds raw events.
    """
    import pyarrow.compute as pc

    def partials(batch: pa.Table) -> pa.Table:
        epoch = batch[ts].cast(pa.int64())
        b = pc.divide(epoch, bucket_us).cast(pa.int64())
        t = pa.table(
            {
                key: batch[key],
                "__b": b,
                "__ts": epoch,
                "__id": batch[order_id].cast(pa.int64()),
                "__v": batch[value].cast(pa.float64()),
            }
        ).sort_by([(key, "ascending"), ("__b", "ascending"), ("__ts", "ascending"), ("__id", "ascending")])
        k = np.asarray(t[key])
        bb = t["__b"].to_numpy(zero_copy_only=False)
        v = t["__v"].to_numpy(zero_copy_only=False)
        tt = t["__ts"].to_numpy(zero_copy_only=False)
        ii = t["__id"].to_numpy(zero_copy_only=False)
        if len(k) == 0:
            starts = np.array([], np.int64)
        else:
            change = (k[1:] != k[:-1]) | (bb[1:] != bb[:-1])
            starts = np.concatenate(([0], np.flatnonzero(change) + 1))
        ends = np.concatenate((starts[1:], [len(k)]))
        hi = np.maximum.reduceat(v, starts) if len(starts) else np.array([], np.float64)
        lo = np.minimum.reduceat(v, starts) if len(starts) else np.array([], np.float64)
        return pa.table(
            {
                key: pa.array(k[starts].tolist(), type=t[key].type),
                "__b": pa.array(bb[starts]),
                "open_ts": pa.array(tt[starts]),
                "open_id": pa.array(ii[starts]),
                "open_v": pa.array(v[starts]),
                "close_ts": pa.array(tt[ends - 1]),
                "close_id": pa.array(ii[ends - 1]),
                "close_v": pa.array(v[ends - 1]),
                "high": pa.array(hi),
                "low": pa.array(lo),
                "n": pa.array((ends - starts).astype(np.int64)),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        o = np.lexsort((g["open_id"].to_numpy(), g["open_ts"].to_numpy()))[0]
        c = np.lexsort((g["close_id"].to_numpy(), g["close_ts"].to_numpy()))[-1]
        return pd.DataFrame(
            {
                key: [g[key].iloc[0]],
                "bucket_us": [int(g["__b"].iloc[0]) * bucket_us],
                "open_value": [float(g["open_v"].iloc[o])],
                "high_value": [float(g["high"].max())],
                "low_value": [float(g["low"].min())],
                "close_value": [float(g["close_v"].iloc[c])],
                "n_events": [int(g["n"].sum())],
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby([key, "__b"])
        .map_groups(merge, batch_format="pandas")
    )


def resample_ffill(
    ds: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    order_id: str = "event_id",
    bucket_us: int = 3_600_000_000,
) -> rd.Dataset:
    """Gap-filled downsample: for every key and every time bucket of the
    GLOBAL observed span, the key's latest ``value`` at-or-before the
    bucket's end (forward fill; NULL before the key's first observation)
    → ``(key, bucket, value)``, one row per (key, bucket) — the
    regular-grid resample that turns sparse event streams into dense
    time series for feature windows.

    "Latest" is deterministic: greatest ``(ts, order_id)`` in the
    bucket. Shuffle volume: ≤ 1 row per (key, bucket, batch) — a
    per-batch last-in-bucket combiner collapses events before the ONE
    key-level exchange; the per-key group is then bounded by the grid
    length (time span / bucket), never by the key's event count. The
    filled value is a verbatim copy of an input double (no arithmetic),
    so results hash-match a SQL ``last_value IGNORE NULLS`` oracle
    exactly."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Max, Min

    span = ds.select_columns([ts]).aggregate(
        Min(ts, alias_name="lo"), Max(ts, alias_name="hi")
    )
    lo_b = int(pa.scalar(span["lo"]).cast(pa.timestamp("us")).cast(pa.int64()).as_py()) // bucket_us
    hi_b = int(pa.scalar(span["hi"]).cast(pa.timestamp("us")).cast(pa.int64()).as_py()) // bucket_us
    n_buckets = hi_b - lo_b + 1

    def last_in_bucket(batch: pa.Table) -> pa.Table:
        t = batch[ts].cast(pa.timestamp("us")).cast(pa.int64())
        b = pc.divide(t, bucket_us)
        g = pa.table(
            {
                key: batch[key],
                "__b": b,
                "__t": t,
                "__o": batch[order_id].cast(pa.int64()),
                value: batch[value],
            }
        ).sort_by(
            [(key, "ascending"), ("__b", "ascending"), ("__t", "descending"), ("__o", "descending")]
        )
        kk = g[key].combine_chunks().to_numpy(zero_copy_only=False)
        bb = g["__b"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.ones(len(g), dtype=bool)
        keep[1:] = (kk[1:] != kk[:-1]) | (bb[1:] != bb[:-1])
        return g.filter(pa.array(keep))

    def fill(g: pa.Table) -> pa.Table:
        s = g.sort_by([("__b", "ascending"), ("__t", "descending"), ("__o", "descending")])
        bb = s["__b"].combine_chunks().to_numpy(zero_copy_only=False)
        # one batch can still emit two rows per (key, bucket); keep the
        # greatest-(ts, order) one — the sort put it first in its run
        first = np.ones(len(s), dtype=bool)
        first[1:] = bb[1:] != bb[:-1]
        s = s.filter(pa.array(first))
        bb = bb[first.nonzero()[0]] if len(bb) else bb
        vals = s[value].combine_chunks()
        grid = np.arange(lo_b, hi_b + 1, dtype=np.int64)
        # index of the last observed bucket at-or-before each grid slot
        pos = np.searchsorted(bb, grid, side="right") - 1
        have = pos >= 0
        take = pa.array(np.where(have, pos, 0))
        filled = pc.if_else(pa.array(have), vals.take(take), pa.scalar(None, vals.type))
        return pa.table(
            {
                key: pa.concat_arrays([s[key].combine_chunks().slice(0, 1)] * n_buckets),
                "bucket": pa.array(grid),
                value: filled,
            }
        )

    return (
        ds.select_columns([key, ts, value, order_id])
        .map_batches(last_in_bucket, batch_format="pyarrow")
        .groupby(key)
        .map_groups(fill, batch_format="pyarrow")
    )


def twap_per_group(
    ds: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    val: str = "value",
    order_id: str = "event_id",
    val_scale: int = 2,
) -> rd.Dataset:
    """Time-weighted average per key → ``(key, n_events, twap)``: each
    event's value holds until the key's next event, so
    ``twap = Σ vᵢ·(tᵢ₊₁−tᵢ) / Σ (tᵢ₊₁−tᵢ)`` over consecutive pairs in
    ``(ts, order_id)`` order. Keys with a single event emit no row
    (there is no interval); a key whose events all share one timestamp
    emits ``twap = NULL`` (0/0, matching SQL division-by-zero).

    EXACT at any corpus size: values are lifted to integers
    (``round(v·10^scale)``, verified exact per value — never silently
    rounded), every v·Δt product is split into 31-bit halves summed in
    PYTHON INTS per run, and ``twap`` is exactly ONE float division of
    two exact integers — so the double hash-matches the SQL
    ``CAST(sum(v*(tn-t)) AS DOUBLE)/CAST(sum(tn-t)*10^s AS DOUBLE)``
    window expression bit-for-bit.

    Shape: ONE range-partitioned global sort by (key, ts, order_id),
    then a fully VECTORIZED per-block pass resolves every intra-block
    interval and emits one summary row per (key, block-run) — kilobytes
    per block, ~block_size× smaller than the input — and a per-key fold
    over the summaries adds the run-to-run intervals (correct under ANY
    block split: the interval chain is associative, so fold order by
    (first_ts, first_id) reproduces the exact pair sum). Never a
    per-(key, day) group: a hot key costs one summary row per block it
    touches, never its event history in one task. (If ONE key owns most
    of a 10^12-row corpus its summary list is still rows/block_size —
    re-apply the same fold hierarchically in that regime.)"""
    _MASK31 = (1 << 31) - 1

    def project(batch: pa.Table) -> pa.Table:
        epoch = batch[ts].cast(pa.int64())
        v = batch[val].combine_chunks().to_numpy(zero_copy_only=False)
        f = 10.0**val_scale
        vi = np.round(v.astype(np.float64) * f).astype(np.int64)
        if not np.array_equal(vi / f, v.astype(np.float64)):
            raise ValueError(f"{val} is not exact at scale {val_scale}")
        if np.any(np.abs(vi) >= 2**31):
            raise ValueError(f"{val} exceeds 31 bits at scale {val_scale}")
        return pa.table(
            {
                key: batch[key],
                "__ts": epoch,
                "__id": batch[order_id].cast(pa.int64()),
                "__v": pa.array(vi),
            }
        )

    def local(b: pa.Table) -> pa.Table:
        # the block arrives globally sorted by (key, __ts, __id)
        k = b[key].combine_chunks() if isinstance(b[key], pa.ChunkedArray) else b[key]
        t = b["__ts"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        i = b["__id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["__v"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(t)
        if n == 0:
            return pa.table(
                {
                    key: k,
                    "__num": pa.array([], pa.string()),
                    "__den": pa.array([], pa.int64()),
                    "__n": pa.array([], pa.int64()),
                    "__first_ts": pa.array([], pa.int64()),
                    "__first_id": pa.array([], pa.int64()),
                    "__last_ts": pa.array([], pa.int64()),
                    "__last_v": pa.array([], pa.int64()),
                }
            )
        codes = k.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        new = np.empty(n, dtype=bool)
        new[0] = True
        np.not_equal(codes[1:], codes[:-1], out=new[1:])
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [n]))
        d = t[1:] - t[:-1]
        vh = v[:-1]
        nums, dens = [], []
        for s, e in zip(starts, ends):  # loop over RUNS (keys per block), not rows
            if e - s >= 2:
                dd, vv = d[s : e - 1], vh[s : e - 1]
                num = (
                    int(np.add.reduce((vv * (dd >> 31)).astype(object), initial=0)) << 31
                ) + int(np.add.reduce((vv * (dd & _MASK31)).astype(object), initial=0))
                den = int(np.add.reduce(dd.astype(object), initial=0))
            else:
                num, den = 0, 0
            nums.append(str(num))
            dens.append(den)
        return pa.table(
            {
                key: k.take(pa.array(starts)),
                "__num": pa.array(nums, pa.string()),
                "__den": pa.array(dens, pa.int64()),
                "__n": pa.array((ends - starts).astype(np.int64)),
                "__first_ts": pa.array(t[starts]),
                "__first_id": pa.array(i[starts]),
                "__last_ts": pa.array(t[ends - 1]),
                "__last_v": pa.array(v[ends - 1]),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__first_ts", "__first_id"], kind="stable")
        n = int(g["__n"].sum())
        if n < 2:
            return pd.DataFrame({key: [], "n_events": [], "twap": []}).astype(
                {key: g[key].dtype, "n_events": np.int64, "twap": np.float64}
            )
        num = sum(int(s) for s in g["__num"])
        den = int(g["__den"].astype(object).sum())
        first_ts = g["__first_ts"].to_numpy().astype(np.int64)
        last_ts = g["__last_ts"].to_numpy().astype(np.int64)
        last_v = g["__last_v"].to_numpy().astype(np.int64)
        for j in range(1, len(g)):  # run-to-run intervals (≤ blocks per key)
            dur = int(first_ts[j]) - int(last_ts[j - 1])
            num += int(last_v[j - 1]) * dur
            den += dur
        twap = float(num) / float(den * 10**val_scale) if den else None
        return pd.DataFrame(
            {key: [g[key].iloc[0]], "n_events": np.array([n], np.int64),
             "twap": np.array([twap], np.float64)}
        )

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .sort([key, "__ts", "__id"])
        .map_batches(local, batch_format="pyarrow")
        .groupby(key)
        .map_groups(fold, batch_format="pandas")
    )


def cohort_retention(
    ds: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    bucket_us: int = 604_800_000_000,  # one week
) -> rd.Dataset:
    """Cohort retention matrix — for each acquisition cohort (the time
    bucket of a key's FIRST event), how many keys are active again
    ``period`` buckets later → ``(cohort, period, n_keys)`` with
    ``period = 0`` the cohort size itself. The classic churn/retention
    triangle; over a crawl corpus the same shape answers "of the domains
    first seen in week W, how many still contribute in week W+k".

    All-integer (bucket = epoch_us // bucket_us, periods are bucket
    differences, outputs are counts) → hash-exact against SQL.

    Scale shapes: the event stream collapses per batch to distinct
    (key, bucket) pairs (combiner), then ONE pair-sized groupby(key)
    cogroup assigns each key's cohort = min(bucket) — the group holds
    one key's DISTINCT buckets only (bounded by the calendar, never by
    that key's event count — a hot key with 10⁹ events still yields ≤
    #buckets rows), and a final (cohort, period) Sum folds kilobyte
    partials. Events never shuffle; only distinct pairs do."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def pairs(batch: pa.Table) -> pa.Table:
        epoch = batch[ts].cast(pa.int64())
        b = pc.divide(epoch, bucket_us).cast(pa.int64())  # ts ≥ 0
        t = pa.table({key: batch[key], "__b": b})
        return t.group_by([key, "__b"]).aggregate([])  # distinct pairs

    def assign(group: pa.Table) -> pa.Table:
        b = group["__b"].to_numpy(zero_copy_only=False)
        period = b - b.min()
        return pa.table(
            {
                "cohort": pa.array(np.full(len(b), b.min(), np.int64)),
                "period": pa.array(period.astype(np.int64)),
                "n": pa.array(np.ones(len(b), np.int64)),
            }
        )

    return (
        ds.select_columns([key, ts])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby([key, "__b"])
        .aggregate(Count(alias_name="__c"))  # global distinct (key, bucket)
        .groupby(key)
        .map_groups(assign, batch_format="pyarrow")
        .groupby(["cohort", "period"])
        .aggregate(Sum("n", alias_name="n_keys"))
    )


def transition_counts(
    ds: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    order_id: str = "event_id",
    label: str = "event_type",
    bucket_us: int = 86_400_000_000,
) -> rd.Dataset:
    """Corpus-wide Markov transition matrix over per-key event sequences:
    for every pair of CONSECUTIVE events of the same key (ordered by
    ``ts``, ties by ``order_id``), count (label → next label) →
    ``(prev_type, next_type, n)``. The sequence-mining primitive behind
    behavioral models, anomaly detection and curriculum statistics; over
    a crawl it is "which document kind follows which within a domain".

    All counts → hash-exact vs the SQL ``lead()`` window. Hot-key-proof
    two-phase like :func:`lag_deltas` (a transition couples consecutive
    events only): groups hold one key's events inside ONE time bucket;
    interior transitions collapse to per-group pair-count PARTIALS
    (label²-bounded, not row-bounded) plus one summary row carrying the
    bucket's first/last label; a per-key pass over summary rows (one per
    non-empty bucket, calendar-bounded) resolves cross-bucket
    transitions; a final (prev, next) Sum folds kilobyte partials."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def bucketize(batch: pa.Table) -> pa.Table:
        epoch = batch[ts].cast(pa.int64())
        return pa.table(
            {
                key: batch[key],
                "__b": pc.divide(epoch, bucket_us).cast(pa.int64()),
                "__ts": epoch,
                "__id": batch[order_id].cast(pa.int64()),
                "__lab": batch[label],
            }
        )

    def local(g: pd.DataFrame) -> pd.DataFrame:
        t = g["__ts"].to_numpy().astype(np.int64)
        i = g["__id"].to_numpy().astype(np.int64)
        o = np.lexsort((i, t))
        lab = g["__lab"].to_numpy()[o]
        if len(lab) > 1:
            pairs = pd.DataFrame({"prev_type": lab[:-1], "next_type": lab[1:]})
            part = pairs.groupby(["prev_type", "next_type"], sort=False).size().reset_index(name="n")
            part["n"] = part["n"].astype(np.int64)
        else:
            part = pd.DataFrame(
                {
                    "prev_type": pd.Series([], dtype=object),
                    "next_type": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        part["__summary"] = False
        part["__b"] = np.int64(0)
        part[key] = g[key].iloc[0]
        summary = pd.DataFrame(
            {
                "prev_type": [lab[0]],   # bucket's FIRST label
                "next_type": [lab[-1]],  # bucket's LAST label
                "n": [np.int64(0)],
                "__summary": [True],
                "__b": [np.int64(g["__b"].iloc[0])],
                key: [g[key].iloc[0]],
            }
        )
        return pd.concat((part, summary), ignore_index=True)

    phase1 = (
        ds.select_columns([key, ts, order_id, label])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby([key, "__b"])
        .map_groups(local, batch_format="pandas")
        .materialize()
    )

    interior = phase1.map_batches(
        lambda b: b.filter(pc.invert(b["__summary"])).select(
            ["prev_type", "next_type", "n"]
        ),
        batch_format="pyarrow",
    )

    def cross(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__b")
        first = g["prev_type"].to_numpy()  # first label per bucket
        last = g["next_type"].to_numpy()   # last label per bucket
        if len(g) < 2:
            return pd.DataFrame(
                {
                    "prev_type": pd.Series([], dtype=object),
                    "next_type": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "prev_type": last[:-1],
                "next_type": first[1:],
                "n": np.ones(len(g) - 1, np.int64),
            }
        )

    boundary = (
        phase1.map_batches(
            lambda b: b.filter(b["__summary"]).select(
                [key, "__b", "prev_type", "next_type"]
            ),
            batch_format="pyarrow",
        )
        .groupby(key)
        .map_groups(cross, batch_format="pandas")
        # normalize to Arrow blocks: the union feeds an Aggregate whose
        # boundary sampler requires ONE block type across both branches
        .map_batches(
            lambda t: t.select(["prev_type", "next_type", "n"]),
            batch_format="pyarrow",
        )
    )

    return (
        interior.union(boundary)
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def state_durations(
    ds: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    order_id: str = "event_id",
    label: str = "event_type",
    bucket_us: int = 86_400_000_000,
) -> rd.Dataset:
    """Dwell time per state: each event "holds" its label until the same
    key's NEXT event (the ``lead(ts)`` window); total held time and
    interval count per label → ``(label, total_us, n_intervals)``. The
    time-in-state report behind engagement/dwell analytics; over a crawl
    it is "how long does a domain stay in each document kind".

    All integers → hash-exact vs the SQL ``lead()`` replica. Two-phase
    like :func:`transition_counts`, but with BOTH passes running over
    key-hash-bucketed cogroups (never one Python call per (key, bucket)
    — see :func:`conversion_latency`): intra-bucket intervals collapse
    to label-bounded partials inside (key-hash, time-bucket) cogroups;
    one summary row per (key, bucket) carries (first_ts, last_ts,
    last_label); the cross-bucket pass attributes each boundary interval
    to the earlier bucket's last label; a final label Sum folds
    kilobyte partials."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .dedup import _mix64

    num_key_buckets = 256

    def bucketize(batch: pa.Table) -> pa.Table:
        epoch = batch[ts].cast(pa.int64())
        u = (
            batch[key]
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        bk = (_mix64(u) % np.uint64(num_key_buckets)).astype(np.int64)
        return pa.table(
            {
                key: batch[key],
                "__bk": pa.array(bk, pa.int64()),
                "__b": pc.divide(epoch, bucket_us).cast(pa.int64()),
                "__ts": epoch,
                "__id": batch[order_id].cast(pa.int64()),
                "__lab": batch[label],
            }
        )

    events = ds.select_columns([key, ts, order_id, label]).map_batches(
        bucketize, batch_format="pyarrow"
    )

    def local(g: pd.DataFrame) -> pd.DataFrame:
        # one (key-hash, time-bucket) cogroup: segmented per-key interval
        # sums + one summary row per key, all C-level
        k = g[key].to_numpy()
        t = g["__ts"].to_numpy().astype(np.int64)
        i = g["__id"].to_numpy().astype(np.int64)
        lab = g["__lab"].to_numpy()
        o = np.lexsort((i, t, k))
        k, t, lab = k[o], t[o], lab[o]
        n = len(k)
        same_key_next = np.zeros(n, dtype=bool)
        same_key_next[:-1] = k[1:] == k[:-1]
        dur = np.zeros(n, np.int64)
        dur[:-1] = t[1:] - t[:-1]
        dur[~same_key_next] = 0
        part = (
            pd.DataFrame({"lab": lab, "dur": dur, "one": same_key_next.astype(np.int64)})
            .groupby("lab", sort=False)
            .sum()
            .reset_index()
        )
        part = part[(part["dur"] > 0) | (part["one"] > 0)]
        out_part = pd.DataFrame(
            {
                "__lab": part["lab"],
                "total_us": part["dur"].astype(np.int64),
                "n_intervals": part["one"].astype(np.int64),
                "__summary": False,
                key: np.zeros(len(part), dtype=k.dtype) if len(k) else [],
                "__bk": np.int64(0),
                "__b": np.int64(0),
                "__first": np.int64(0),
                "__last": np.int64(0),
            }
        )
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new_key)
        ends = np.concatenate((starts[1:], [n])) - 1
        summ = pd.DataFrame(
            {
                "__lab": lab[ends],  # bucket's LAST label per key
                "total_us": np.zeros(len(starts), np.int64),
                "n_intervals": np.zeros(len(starts), np.int64),
                "__summary": True,
                key: k[starts],
                "__bk": np.int64(g["__bk"].iloc[0]),
                "__b": np.int64(g["__b"].iloc[0]),
                "__first": t[starts],
                "__last": t[ends],
            }
        )
        return pd.concat((out_part, summ), ignore_index=True)

    phase1 = (
        events.groupby(["__bk", "__b"])
        .map_groups(local, batch_format="pandas")
        .materialize()
    )

    interior = phase1.map_batches(
        lambda b: b.filter(pc.invert(b["__summary"])).select(
            ["__lab", "total_us", "n_intervals"]
        ),
        batch_format="pyarrow",
    )

    def cross(g: pd.DataFrame) -> pd.DataFrame:
        # one key-hash bucket's (key, bucket) summaries: boundary interval
        # = next bucket's first_ts − this bucket's last_ts, same key
        k = g[key].to_numpy()
        b = g["__b"].to_numpy().astype(np.int64)
        o = np.lexsort((b, k))
        k, b = k[o], b[o]
        first = g["__first"].to_numpy().astype(np.int64)[o]
        last = g["__last"].to_numpy().astype(np.int64)[o]
        lab = g["__lab"].to_numpy()[o]
        n = len(k)
        same_key_next = np.zeros(n, dtype=bool)
        same_key_next[:-1] = k[1:] == k[:-1]
        dur = np.zeros(n, np.int64)
        dur[:-1] = first[1:] - last[:-1]
        dur[~same_key_next] = 0
        keep = same_key_next
        part = (
            pd.DataFrame(
                {
                    "lab": lab[keep],
                    "dur": dur[keep],
                    "one": np.ones(int(keep.sum()), np.int64),
                }
            )
            .groupby("lab", sort=False)
            .sum()
            .reset_index()
        )
        return pd.DataFrame(
            {
                "__lab": part["lab"],
                "total_us": part["dur"].astype(np.int64),
                "n_intervals": part["one"].astype(np.int64),
            }
        )

    boundary = (
        phase1.map_batches(
            lambda b: b.filter(b["__summary"]).select(
                [key, "__bk", "__b", "__lab", "__first", "__last"]
            ),
            batch_format="pyarrow",
        )
        .groupby("__bk")
        .map_groups(cross, batch_format="pandas")
        .map_batches(
            lambda t: t.select(["__lab", "total_us", "n_intervals"]),
            batch_format="pyarrow",
        )
    )

    return (
        interior.union(boundary)
        .groupby("__lab")
        .aggregate(
            Sum("total_us", alias_name="total_us"),
            Sum("n_intervals", alias_name="n_intervals"),
        )
        .map_batches(
            lambda t: t.rename_columns([label, "total_us", "n_intervals"]),
            batch_format="pyarrow",
        )
    )


def gap_quantiles(
    ds: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    order_id: str = "event_id",
    label: str = "event_type",
    bucket_us: int = 86_400_000_000,
    gap_unit_us: int = 1_000_000,
    quantiles: dict[str, float] | None = None,
) -> rd.Dataset:
    """Inter-arrival-gap distribution per label: for every pair of
    consecutive same-key events, the gap (floor-``gap_unit_us`` units)
    attributed to the EARLIER event's label, folded to exact discrete
    quantiles per label → ``(label, n_intervals, <quantile cols>)``.
    The burstiness/cadence diagnostic (median seconds between a user's
    events by activity kind; recrawl cadence per domain over a crawl).

    Same two-phase interval extraction as :func:`state_durations`
    (key-hash-bucketed cogroups, C-level segmented scans), but intervals
    collapse to (label, gap-unit) HISTOGRAM partials — bounded by labels
    × the time range in gap units — and the final per-label walk is the
    exact ``quantile_disc`` pick (1-based ceil(q·n)), matching SQL
    hash-exactly."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .dedup import _mix64

    if quantiles is None:
        quantiles = {"p50_gap": 0.5, "p90_gap": 0.9}
    num_key_buckets = 256

    def bucketize(batch: pa.Table) -> pa.Table:
        epoch = batch[ts].cast(pa.int64())
        u = (
            batch[key]
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        bk = (_mix64(u) % np.uint64(num_key_buckets)).astype(np.int64)
        return pa.table(
            {
                key: batch[key],
                "__bk": pa.array(bk, pa.int64()),
                "__b": pc.divide(epoch, bucket_us).cast(pa.int64()),
                "__ts": epoch,
                "__id": batch[order_id].cast(pa.int64()),
                "__lab": batch[label],
            }
        )

    events = ds.select_columns([key, ts, order_id, label]).map_batches(
        bucketize, batch_format="pyarrow"
    )

    def hist_frame(lab: np.ndarray, gap: np.ndarray) -> pd.DataFrame:
        return (
            pd.DataFrame({"__lab": lab, "gap": gap, "n": np.ones(len(lab), np.int64)})
            .groupby(["__lab", "gap"], sort=False)
            .sum()
            .reset_index()
        )

    def local(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].to_numpy()
        t = g["__ts"].to_numpy().astype(np.int64)
        i = g["__id"].to_numpy().astype(np.int64)
        lab = g["__lab"].to_numpy()
        o = np.lexsort((i, t, k))
        k, t, lab = k[o], t[o], lab[o]
        n = len(k)
        same = np.zeros(n, dtype=bool)
        same[:-1] = k[1:] == k[:-1]
        gap = np.zeros(n, np.int64)
        gap[:-1] = (t[1:] - t[:-1]) // gap_unit_us
        part = hist_frame(lab[same], gap[same])
        part["__summary"] = False
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new_key)
        ends = np.concatenate((starts[1:], [n])) - 1
        summ = pd.DataFrame(
            {
                "__lab": lab[ends],
                "gap": t[ends],  # carries last_ts; 'n' column carries first_ts
                "n": t[starts],
                "__summary": True,
            }
        )
        part2 = pd.concat((part, summ), ignore_index=True)
        part2[key] = np.concatenate(
            (np.zeros(len(part), dtype=k.dtype), k[starts])
        ) if n else np.array([], dtype=k.dtype)
        part2["__bk"] = np.int64(g["__bk"].iloc[0])
        part2["__b"] = np.int64(g["__b"].iloc[0])
        return part2

    phase1 = (
        events.groupby(["__bk", "__b"])
        .map_groups(local, batch_format="pandas")
        .materialize()
    )

    interior = phase1.map_batches(
        lambda b: b.filter(pc.invert(b["__summary"])).select(["__lab", "gap", "n"]),
        batch_format="pyarrow",
    )

    def cross(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].to_numpy()
        b = g["__b"].to_numpy().astype(np.int64)
        o = np.lexsort((b, k))
        k, b = k[o], b[o]
        last = g["gap"].to_numpy().astype(np.int64)[o]  # last_ts per (key,bucket)
        first = g["n"].to_numpy().astype(np.int64)[o]  # first_ts per (key,bucket)
        lab = g["__lab"].to_numpy()[o]
        n = len(k)
        same = np.zeros(n, dtype=bool)
        same[:-1] = k[1:] == k[:-1]
        gap = np.zeros(n, np.int64)
        gap[:-1] = (first[1:] - last[:-1]) // gap_unit_us
        return hist_frame(lab[same], gap[same])

    boundary = (
        phase1.map_batches(
            lambda b: b.filter(b["__summary"]).select([key, "__bk", "__b", "__lab", "gap", "n"]),
            batch_format="pyarrow",
        )
        .groupby("__bk")
        .map_groups(cross, batch_format="pandas")
        .map_batches(
            lambda t: t.select(["__lab", "gap", "n"]), batch_format="pyarrow"
        )
    )

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        v = g["gap"].to_numpy().astype(np.int64)
        c = g["n"].to_numpy().astype(np.int64)
        o = np.argsort(v)
        v, c = v[o], c[o]
        cum = np.cumsum(c)
        tot = int(cum[-1])
        row = {label: g["__lab"].iloc[0], "n_intervals": tot}
        for name, q in quantiles.items():
            target = max(1, int(np.ceil(q * tot)))
            row[name] = int(v[np.searchsorted(cum, target)])
        return pd.DataFrame([row])

    return (
        interior.union(boundary)
        .groupby(["__lab", "gap"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("__lab")
        .map_groups(walk, batch_format="pandas")
    )


def rate_change(
    ds: rd.Dataset,
    *,
    key: str = "event_type",
    ts: str = "ts",
    bucket_us: int = 86_400_000_000,
    scale: int = 1000,
) -> rd.Dataset:
    """Bucket-over-bucket volume change per key — the rate-spike /
    drop detector over an event log: per (key, time bucket) counts, each
    compared to the key's PREVIOUS non-empty bucket (SQL ``lag()``
    semantics) as an exact integer ratio →
    ``(key, bucket, n, prev_n, ratio_milli)`` with
    ``ratio_milli = (scale·n) // prev_n`` (big-int floor, no floats).
    First bucket per key is omitted (no predecessor), matching the SQL
    ``WHERE prev IS NOT NULL`` replica hash-exactly.

    Scale shape: the shuffle carries per-batch (key, bucket) count
    partials only; the per-key lag group is bounded by the CALENDAR
    (number of non-empty buckets), never the key's row count."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def bucketize(batch: pa.Table) -> pa.Table:
        epoch = batch[ts].cast(pa.int64())
        t = pa.table(
            {key: batch[key], "__b": pc.divide(epoch, bucket_us).cast(pa.int64())}
        )
        return t.group_by([key, "__b"]).aggregate([([], "count_all")])

    def lag_ratio(g: pd.DataFrame) -> pd.DataFrame:
        b = g["__b"].to_numpy().astype(np.int64)
        n = g["n"].to_numpy().astype(np.int64)
        o = np.argsort(b, kind="stable")
        b, n = b[o], n[o]
        if len(b) < 2:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype=g[key].dtype),
                    "bucket": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "prev_n": pd.Series([], dtype="int64"),
                    "ratio_milli": pd.Series([], dtype="int64"),
                }
            )
        ratio = np.array(
            [(scale * int(c)) // int(p) for c, p in zip(n[1:], n[:-1])], np.int64
        )
        return pd.DataFrame(
            {
                key: g[key].iloc[:1].repeat(len(b) - 1).to_numpy(),
                "bucket": b[1:],
                "n": n[1:],
                "prev_n": n[:-1],
                "ratio_milli": ratio,
            }
        )

    return (
        ds.select_columns([key, ts])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby([key, "__b"])
        .aggregate(Sum("count_all", alias_name="n"))
        .groupby(key)
        .map_groups(lag_ratio, batch_format="pandas")
    )


def longest_streak(
    ds: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    bucket_us: int = 86_400_000_000,
) -> rd.Dataset:
    """Longest run of CONSECUTIVE active buckets (days) per key → ``(key,
    n_active, longest_streak)`` — the gaps-and-islands engagement metric
    (SQL: distinct (key, day), the ``day − dense_rank()`` island trick,
    max island size).

    Scale shape: per-batch distinct (key, bucket) combiner → one
    pair-sized exchange deduplicating buckets → the per-key fold runs
    over HASH-BUCKETED cogroups (many keys per group — one Python call
    per bucket, not per key), each a single vectorized islands pass over
    rows bounded by keys × calendar, never event volume."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from .dedup import _mix64

    num_buckets = 256

    def bucketize(batch: pa.Table) -> pa.Table:
        epoch = batch[ts].cast(pa.int64())
        t = pa.table(
            {key: batch[key], "__b": pc.divide(epoch, bucket_us).cast(pa.int64())}
        )
        # per-batch dedup: one row per (key, bucket) per block
        return t.group_by([key, "__b"]).aggregate([])

    def add_bk(b: pa.Table) -> pa.Table:
        u = b[key].cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
        bk = (_mix64(u) % np.uint64(num_buckets)).astype(np.int64)
        return b.append_column("__bk", pa.array(bk, pa.int64()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # one key-hash bucket: sorted (key, day) rows, single islands pass
        k = g[key].to_numpy()
        b = g["__b"].to_numpy().astype(np.int64)
        o = np.lexsort((b, k))
        k, b = k[o], b[o]
        n = len(k)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        new_island = new_key.copy()
        new_island[1:] |= np.diff(b) != 1
        island_id = np.cumsum(new_island) - 1
        island_len = np.bincount(island_id)
        island_key = k[new_island]  # key of each island, in island order
        s = pd.Series(island_len).groupby(island_key, sort=False)
        out = pd.DataFrame(
            {
                key: pd.unique(island_key),
                "n_active": s.sum().to_numpy().astype(np.int64),
                "longest_streak": s.max().to_numpy().astype(np.int64),
            }
        )
        return out

    return (
        ds.select_columns([key, ts])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby([key, "__b"])
        .aggregate(Count(alias_name="__c"))  # dedup exchange; count unused
        .map_batches(add_bk, batch_format="pyarrow")
        .groupby("__bk")
        .map_groups(fold, batch_format="pandas")
    )


def conversion_latency(
    ds: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    order_id: str = "event_id",
    label: str = "event_type",
    from_label: str = "view",
    to_label: str = "purchase",
    bucket_us: int = 86_400_000_000,
    quantiles: dict[str, float] | None = None,
) -> rd.Dataset:
    """Time-to-conversion report: for every ``to_label`` event, the
    latency since the same key's most recent ``from_label`` event (in
    (ts, order_id) order — the ``max(CASE WHEN …) OVER (PARTITION BY key
    ORDER BY ts, id ROWS UNBOUNDED PRECEDING)`` window), summarized into
    ONE row: ``(n_to, n_converted, <quantile cols>)``, discrete
    quantiles over floor-seconds latency (exact integers end to end).

    Hot-key-proof two-phase like :func:`running_totals`, with every
    per-key pass running over HASH-BUCKETED cogroups (many keys per
    group, C-level segmented scans inside — never one Python call per
    (key, bucket), which a key-cardinality-sized corpus turns into the
    tiny-group trap): the carry-in (last ``from_label`` ts of all
    earlier buckets) is an exclusive prefix MAX over per-(key, bucket)
    summaries; one cogroup holds one key-hash bucket inside ONE time
    bucket, so a hot key still materializes at most its single-bucket
    volume; the final quantile walk runs over the (lat_s → count)
    histogram, bounded by the corpus TIME RANGE in seconds, never its
    row count."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    from .dedup import _mix64

    if quantiles is None:
        quantiles = {"p50_lat_s": 0.5, "p90_lat_s": 0.9}
    num_key_buckets = 256

    def bucketize(batch: pa.Table) -> pa.Table:
        lab = batch[label]
        keep = pc.or_(pc.equal(lab, from_label), pc.equal(lab, to_label))
        b = batch.filter(keep)
        epoch = b[ts].cast(pa.int64())
        is_from = pc.equal(b[label], from_label)
        u = b[key].cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
        bk = (_mix64(u) % np.uint64(num_key_buckets)).astype(np.int64)
        return pa.table(
            {
                key: b[key],
                "__bk": pa.array(bk, pa.int64()),
                "__b": pc.divide(epoch, bucket_us).cast(pa.int64()),
                "__ts": epoch,  # ≥ 0; -1 marks carry rows below
                "__id": b[order_id].cast(pa.int64()),
                # last-from tracker: the event's ts if it IS a from, else -1
                "__vt": pc.if_else(is_from, epoch, pa.scalar(-1, pa.int64())),
            }
        )

    events = (
        ds.select_columns([key, ts, order_id, label])
        .map_batches(bucketize, batch_format="pyarrow")
        # consumed twice (summaries pass + the carry union): materialize
        # the filtered 5-int-column stream once instead of re-reading and
        # re-bucketizing the corpus
        .materialize()
    )
    summaries = events.groupby([key, "__b"]).aggregate(
        Max("__vt", alias_name="__vmax")
    )

    def prefix(g: pa.Table) -> pa.Table:
        # one key-hash bucket's (key, time-bucket) summaries: segmented
        # EXCLUSIVE prefix max per key, one C-level pass for all keys
        s = g.sort_by([(key, "ascending"), ("__b", "ascending")])
        k = s[key].cast(pa.int64()).to_numpy(zero_copy_only=False)
        vm = s["__vmax"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(k)
        inc = (
            pd.Series(vm).groupby(k, sort=False).cummax().to_numpy().astype(np.int64)
        )
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        np.not_equal(k[1:], k[:-1], out=new_seg[1:])
        carry = np.concatenate(([-1], inc[:-1]))
        carry[new_seg] = -1  # first bucket of each key has no predecessor
        return pa.table(
            {
                key: s[key],
                "__bk": s["__bk"],
                "__b": s["__b"],
                "__ts": pa.array(np.full(n, -1, np.int64)),
                "__id": pa.array(np.zeros(n, np.int64)),
                "__vt": pa.array(carry),
            }
        )

    carries = (
        summaries.map_batches(
            lambda b: b.append_column(
                "__bk",
                pa.array(
                    (
                        _mix64(
                            b[key]
                            .cast(pa.int64())
                            .to_numpy(zero_copy_only=False)
                            .astype(np.uint64)
                        )
                        % np.uint64(num_key_buckets)
                    ).astype(np.int64),
                    pa.int64(),
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("__bk")
        .map_groups(prefix, batch_format="pyarrow")
    )

    def local(g: pd.DataFrame) -> pd.DataFrame:
        # one (key-hash bucket, time bucket) cogroup: carry rows sort
        # FIRST within each key (__ts=-1), then one C-level per-key
        # cummax resolves every event's last-from timestamp
        t = g["__ts"].to_numpy().astype(np.int64)
        i = g["__id"].to_numpy().astype(np.int64)
        k = g[key].to_numpy()
        vt = g["__vt"].to_numpy().astype(np.int64)
        o = np.lexsort((i, t, k))  # carries (__ts=-1) lead their key
        t, vt, k = t[o], vt[o], k[o]
        last_from = (
            pd.Series(vt).groupby(k, sort=False).cummax().to_numpy().astype(np.int64)
        )
        is_to = (vt < 0) & (t >= 0)  # real events that are not from_label
        lv = last_from[is_to]
        tt = t[is_to]
        lat_s = np.where(lv >= 0, (tt - lv) // 1_000_000, -1)
        return pd.DataFrame({"lat_s": lat_s.astype(np.int64)})

    lats = (
        events.union(carries)
        .groupby(["__bk", "__b"])
        .map_groups(local, batch_format="pandas")
    )

    def hist(batch: pa.Table) -> pa.Table:
        v = batch["lat_s"].combine_chunks()
        vc = v.value_counts()
        return pa.table(
            {
                "lat_s": vc.field("values"),
                "cnt": vc.field("counts").cast(pa.int64()),
                "__g": pa.array(np.zeros(len(vc), np.int64)),
            }
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        v = g["lat_s"].to_numpy().astype(np.int64)
        c = g["cnt"].to_numpy().astype(np.int64)
        o = np.argsort(v)
        v, c = v[o], c[o]
        conv = v >= 0
        n_to = int(c.sum())
        n_conv = int(c[conv].sum())
        row = {"n_to": n_to, "n_converted": n_conv}
        cum = np.cumsum(c[conv])
        for name, q in quantiles.items():
            if n_conv == 0:
                row[name] = None
            else:
                target = max(1, int(np.ceil(q * n_conv)))
                row[name] = int(v[conv][np.searchsorted(cum, target)])
        return pd.DataFrame([row])

    return (
        lats.map_batches(hist, batch_format="pyarrow")
        .groupby(["__g", "lat_s"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .groupby("__g")
        .map_groups(final, batch_format="pandas")
    )


def _earliest_per_key(
    batch: pa.Table, key: str, ts: str, order_id: str, n_steps: int
) -> pa.Table:
    """Keep the first ``n_steps`` rows of each key run, ordered by
    (ts, order_id) — vectorized sort + run-rank trick, no per-key loop."""
    if batch.num_rows == 0:
        return batch
    ordered = batch.sort_by(
        [(key, "ascending"), (ts, "ascending"), (order_id, "ascending")]
    )
    keys = ordered.column(key)
    keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    codes = keys.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    n = len(codes)
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    np.not_equal(codes[1:], codes[:-1], out=new_run[1:])
    run_start = np.maximum.accumulate(np.where(new_run, np.arange(n), 0))
    keep = (np.arange(n) - run_start) < n_steps
    return ordered.filter(pa.array(keep))


def path_topk(
    ds: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    order_id: str = "event_id",
    label: str = "event_type",
    n_steps: int = 5,
    k: int = 20,
    sep: str = ">",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Top-k most common "journeys": each key's EARLIEST ``n_steps``
    labels (ordered by ``ts``, ties by ``order_id``) joined into one path
    string, counted corpus-wide → ``(path, n_keys)``, the ``k`` most
    frequent (ties by path ascending). The sequence-mining report behind
    onboarding-funnel and user-journey analytics; over a crawl it is
    "which first-five page kinds do domains serve".

    Hash-exact vs the SQL ``row_number() ≤ n`` + ordered ``string_agg``
    replica. Scale shape: a per-batch combiner keeps ≤ ``n_steps`` rows
    per key per block BEFORE any exchange (the shuffle carries at most
    ``n_steps`` label rows per key per block, never a key's history);
    keys are then hash-bucketed into ``num_buckets`` cogroups — never
    one group per key — where the exact earliest-n and the path join
    both run vectorized (Arrow sort + run ranks + ``binary_join`` over a
    run-offset ListArray, no per-key Python); the final exchange is the
    path-sized count shuffle."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from .dedup import _mix64

    def earliest(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key: batch[key].cast(pa.int64()),
                "__ts": batch[ts].cast(pa.int64()),
                "__id": batch[order_id].cast(pa.int64()),
                "__lab": batch[label],
            }
        )
        return _earliest_per_key(t, key, "__ts", "__id", n_steps)

    def bucketize(batch: pa.Table) -> pa.Table:
        u = batch[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        bk = (_mix64(u) % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column("__bk", pa.array(bk, pa.int64()))

    def fold(g: pa.Table) -> pa.Table:
        g = _earliest_per_key(g, key, "__ts", "__id", n_steps)
        codes = g[key].combine_chunks().dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        )
        n = len(codes)
        starts = np.flatnonzero(
            np.concatenate(([True], codes[1:] != codes[:-1]))
        )
        offsets = np.concatenate((starts, [n])).astype(np.int32)
        labs = g["__lab"].combine_chunks()
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), labs)
        paths = pc.binary_join(lists, sep)
        return pa.table({"path": paths})

    return (
        ds.select_columns([key, ts, order_id, label])
        .map_batches(earliest, batch_format="pyarrow")
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("__bk")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("path")
        .aggregate(Count(alias_name="n_keys"))
        .sort(["n_keys", "path"], descending=[True, False])
        .limit(k)
    )


def lag1_autocorr(
    ds: rd.Dataset,
    *,
    key: str = "event_type",
    ts: str = "ts",
    size_us: int = 3_600_000_000,
) -> pa.Table:
    """Lag-1 autocorrelation of the per-``key`` bucketed event-count
    series — the burstiness/seasonality probe of a monitoring pipeline.
    Pairs are consecutive OBSERVED buckets in time order (calendar gaps
    collapse, the SQL ``LAG() OVER (ORDER BY bucket)`` convention).

    Two stages, both bounded: :func:`tumbling_counts` reduces the event
    stream to ``(key, bucket, n)`` rows (a count combiner — the wide
    shuffle moves 24-byte rows), then one ``map_groups`` per key whose
    group size is the number of observed buckets — bounded by the time
    span, never by corpus size, so a hot key at 100 TB still folds fine.

    All moments accumulate as exact Python big-ints; the only float op
    is the final ``float(num) / sqrt(float(a) * float(b))`` — one IEEE
    division of exact integers, bit-identical to the SQL oracle's
    ``CAST(... AS DOUBLE) / sqrt(...)``.

    → one row per key: ``(key, n_pairs:int64, autocorr:float64|null)``
    (null when either variance term is zero or there are <2 buckets).
    """
    import math

    import pyarrow.compute as pc

    counts = tumbling_counts(ds, key=key, ts=ts, size_us=size_us)

    def fold(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g["bucket"])
        n = g["n_events"].take(order).to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = n[:-1], n[1:]
        np_pairs = len(x)
        if np_pairs == 0:
            corr = None
        else:
            sx, sy = int(x.sum()), int(y.sum())
            sxy = int(np.dot(x, y))
            sx2, sy2 = int(np.dot(x, x)), int(np.dot(y, y))
            vx = np_pairs * sx2 - sx * sx
            vy = np_pairs * sy2 - sy * sy
            corr = (
                None
                if vx == 0 or vy == 0
                else float(np_pairs * sxy - sx * sy) / math.sqrt(float(vx) * float(vy))
            )
        return pa.table(
            {
                key: g[key].slice(0, 1),
                "n_pairs": pa.array([np_pairs], pa.int64()),
                "autocorr": pa.array([corr], pa.float64()),
            }
        )

    return counts.groupby(key).map_groups(fold, batch_format="pyarrow")


def dense_bucket_counts(
    ds: rd.Dataset, key: str, ts_col: str, *, bucket_us: int = 86_400_000_000
) -> rd.Dataset:
    """Gap-filled time-bucket counts per key: every (key, bucket) cell of
    the GLOBAL [min, max] bucket range gets a row, zero where the key was
    silent — the dense matrix a report or a changepoint detector consumes
    (SQL shape: generate_series cross join + left join; left joins would
    silently drop the zero rows a sparse count produces).

    One (key, bucket)-count combiner + pair Sum shuffle; one Ray task
    folds the kilobyte histogram into the dense grid (bounded by
    keys × buckets of the time range — the same calendar bound as the
    resample/lag operators; a 10-year daily grid is ~3.7k buckets).
    Output: ``(key, bucket_us, n)``.
    """
    import ray
    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        us = b[ts_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        bucket = (us // bucket_us) * bucket_us
        t = pa.table({key: b[key], "bucket_us": pa.array(bucket)})
        g = t.group_by([key, "bucket_us"]).aggregate([([], "count_all")])
        return g.rename_columns([key, "bucket_us", "__n"])

    hist = (
        ds.select_columns([key, ts_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby([key, "bucket_us"])
        .aggregate(Sum("__n", alias_name="__n"))
    )

    @ray.remote(num_cpus=1)
    def _dense(block_refs: list):
        tabs = [t for t in (ray.get(r) for r in block_refs) if t.num_rows]
        if not tabs:
            return pa.table(
                {
                    key: pa.array([], pa.string()),
                    "bucket_us": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        full = pa.concat_tables(tabs).combine_chunks()
        ks = np.asarray(full[key])
        bs = full["bucket_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = full["__n"].to_numpy(zero_copy_only=False).astype(np.int64)
        grid = np.arange(bs.min(), bs.max() + bucket_us, bucket_us, dtype=np.int64)
        uk = np.unique(ks)
        out = np.zeros((len(uk), len(grid)), np.int64)
        ki = np.searchsorted(uk, ks)
        bi = np.searchsorted(grid, bs)
        out[ki, bi] = ns
        return pa.table(
            {
                key: pa.array(np.repeat(uk, len(grid))),
                "bucket_us": pa.array(np.tile(grid, len(uk))),
                "n": pa.array(out.ravel()),
            }
        )

    import ray.data as _rd

    return _rd.from_arrow(ray.get(_dense.remote(list(hist.to_arrow_refs()))))
