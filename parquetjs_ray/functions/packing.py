"""Sequence packing: assign documents to fixed-capacity token windows.

Implements the standard pre-training "concat and chop" packing: within
each source, documents are laid end-to-end in ``id_col`` order and the
token stream is chopped into windows of ``capacity`` tokens; a document
belongs to the window where its first token lands.  Window id is thus
``exclusive_prefix_sum(len) // capacity`` over (source, id)-ordered
rows — a pure scan, which SQL expresses as a window-function sum, so
the whole operator is oracle-checkable.

Scale shape (the part Ray Data lacks natively — a distributed ordered
prefix sum) is a classic two-level scan:

1. bucket rows by ``id_col // bucket_width`` (order-preserving for
   non-negative ids) and compute per-(source, bucket) token sums with a
   per-batch combiner before the groupby — the aggregate is
   #buckets-sized, kilobytes per million docs;
2. the driver turns those sums into per-bucket exclusive offsets (one
   tiny ordered pass over bucket summaries, never over rows) and
   broadcasts them via ``ray.put``;
3. a ``groupby(source, bucket).map_groups`` stage sorts each bounded
   bucket by id, takes its local exclusive cumsum, adds the bucket
   offset, and emits the window id per row.

No stage ever materializes row-scale data on the driver; bucket groups
are bounded by ``bucket_width`` ids regardless of corpus size.  Not in
the reference (ironSource/parquetjs has no compute surface); part of
the training-data extension layer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["pack_sequences", "materialize_windows"]


def pack_sequences(
    ds,
    capacity: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    len_col: str = "n_tok",
    bucket_width: int = 65536,
    keep_cols: tuple[str, ...] = (),
):
    """→ Dataset of (id_col, source_col, len_col, *keep_cols, window_id).

    ``window_id`` is the 0-based fixed-capacity window (per source)
    where the document's first token lands when documents are
    concatenated in ``id_col`` order.  Deterministic, shuffle volume =
    one row-sized groupby; driver state = one offset per bucket.
    ``keep_cols`` pass through untouched (e.g. the token arrays a
    downstream :func:`materialize_windows` stitches together)."""
    import ray

    def with_bucket(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        b = pa.array(ids // bucket_width, pa.int64())
        cols = {
            id_col: batch[id_col],
            source_col: batch[source_col],
            len_col: batch[len_col].cast(pa.int64()),
        }
        for c in keep_cols:
            cols[c] = batch[c]
        cols["_bucket"] = b
        return pa.table(cols)

    def combine(batch: pa.Table) -> pa.Table:
        # per-batch partial sums -> the global groupby shuffles bucket
        # summaries, not rows
        return batch.select([source_col, "_bucket", len_col]).group_by(
            [source_col, "_bucket"]
        ).aggregate([(len_col, "sum")])

    keyed = ds.map_batches(with_bucket, batch_format="pyarrow")
    sums = (
        keyed.map_batches(combine, batch_format="pyarrow")
        .groupby([source_col, "_bucket"])
        .sum(f"{len_col}_sum")
        .take_all()
    )
    # driver pass over bucket summaries only: exclusive running offset
    # per (source, bucket) in bucket order
    sums.sort(key=lambda r: (r[source_col], r["_bucket"]))
    offsets: dict[tuple, int] = {}
    run_src, run = None, 0
    for r in sums:
        if r[source_col] != run_src:
            run_src, run = r[source_col], 0
        offsets[(r[source_col], r["_bucket"])] = run
        run += int(r[f"sum({len_col}_sum)"])
    off_ref = ray.put(offsets)

    def assign(group: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        ids = group[id_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        lens = group[len_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        prefix = np.zeros(len(ids), dtype=np.int64)
        if len(ids):
            src = group[source_col][0].as_py()
            base = offs.get((src, int(ids[order[0]]) // bucket_width), 0)
            csum = np.cumsum(lens[order])
            prefix[order] = base + csum - lens[order]
        win = pa.array(prefix // capacity, pa.int64())
        cols = {
            id_col: group[id_col],
            source_col: group[source_col],
            len_col: group[len_col],
        }
        for c in keep_cols:
            cols[c] = group[c]
        cols["window_id"] = win
        return pa.table(cols)

    return keyed.groupby([source_col, "_bucket"]).map_groups(assign, batch_format="pyarrow")


def materialize_windows(
    ds,
    capacity: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    len_col: str = "n_tok",
    tokens_col: str = "tokens",
    bucket_width: int = 65536,
    cache_input: bool = True,
):
    """Materialized concat-and-chop: one row PER WINDOW with the actual
    packed token array — the training-shard payload itself, not just the
    assignment (:func:`pack_sequences` computes where each doc lands;
    this stitches the streams).

    ``cache_input`` (default on) materializes ``ds`` once before the
    two passes (bucket sums, then the pack itself): the upstream here
    is typically a full tokenize — split + vocab lookup over every
    byte — which is far more expensive to recompute than the
    object-store residency costs (spill-backed; the shuffle stages the
    same bytes through the store regardless). Pass ``False`` when the
    input is already materialized or trivially cheap to recompute.

    → Dataset of ``(source_col, window_id, n_docs, n_tok, tokens_col)``
    where ``tokens_col`` is the member docs' arrays concatenated in
    ``id_col`` order.

    Shuffle discipline: the token payload moves through the
    (source, id-bucket) groupby ONCE; each bucket then finalizes every
    window that lies strictly inside its contiguous token span LOCALLY
    (buckets partition the per-source stream in id order, so an
    interior window's docs can live in no other bucket). Only each
    bucket's FIRST and LAST window — the ≤2 windows that may straddle a
    bucket boundary — re-enter a second, window-keyed groupby, whose
    volume is ~2 windows per bucket regardless of corpus size. Window
    groups are capacity-bounded, so per-group memory is O(capacity)."""
    import ray

    def with_bucket(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch[id_col],
                source_col: batch[source_col],
                len_col: batch[len_col].cast(pa.int64()),
                tokens_col: batch[tokens_col],
                "_bucket": pa.array(ids // bucket_width, pa.int64()),
            }
        )

    def combine(batch: pa.Table) -> pa.Table:
        return batch.select([source_col, "_bucket", len_col]).group_by(
            [source_col, "_bucket"]
        ).aggregate([(len_col, "sum")])

    if cache_input:
        ds = ds.materialize()
    keyed = ds.map_batches(with_bucket, batch_format="pyarrow")
    sums = (
        keyed.map_batches(combine, batch_format="pyarrow")
        .groupby([source_col, "_bucket"])
        .sum(f"{len_col}_sum")
        .take_all()
    )
    sums.sort(key=lambda r: (r[source_col], r["_bucket"]))
    offsets: dict[tuple, int] = {}
    run_src, run = None, 0
    for r in sums:
        if r[source_col] != run_src:
            run_src, run = r[source_col], 0
        offsets[(r[source_col], r["_bucket"])] = run
        run += int(r[f"sum({len_col}_sum)"])
    off_ref = ray.put(offsets)

    def fuse(group: pa.Table) -> pa.Table:
        # schema derived from the group itself: no eager ds.schema() call
        # (which would execute the upstream once just to infer types)
        tok_type = group.schema.field(tokens_col).type
        if not group.num_rows:
            return pa.table(
                {
                    source_col: pa.array([], pa.string()),
                    "window_id": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                    len_col: pa.array([], pa.int64()),
                    tokens_col: pa.array([], tok_type),
                    "__final": pa.array([], pa.bool_()),
                    "__ord": pa.array([], pa.int64()),
                }
            )
        offs = ray.get(off_ref)
        ids = group[id_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        lens = group[len_col].combine_chunks().to_numpy(zero_copy_only=False)[order]
        src = group[source_col][0].as_py()
        base = offs.get((src, int(ids[order[0]]) // bucket_width), 0)
        prefix = base + np.cumsum(lens) - lens
        win = prefix // capacity  # non-decreasing in id order
        toks = group[tokens_col].combine_chunks().take(pa.array(order))
        flat = toks.flatten()
        doc_tok_off = np.asarray(toks.offsets).astype(np.int64)
        starts = np.flatnonzero(np.concatenate(([True], win[1:] != win[:-1])))
        n_runs = len(starts)
        run_end = np.concatenate((starts[1:], [len(win)]))
        # int64 offsets end to end: a bucket over 2^31 token elements
        # must round-trip (large_list) or fail loudly in the final cast,
        # never silently truncate via an int32 astype
        run_tok_off = np.concatenate(
            (doc_tok_off[starts], [doc_tok_off[-1]])
        ).astype(np.int64)
        windows = pa.LargeListArray.from_arrays(pa.array(run_tok_off, pa.int64()), flat)
        # conservative boundary rule: a bucket's first and last window may
        # straddle into the neighbor buckets; everything between cannot
        final = np.ones(n_runs, dtype=bool)
        final[0] = False
        final[-1] = False
        return pa.table(
            {
                source_col: pa.array([src] * n_runs, pa.string()),
                "window_id": pa.array(win[starts]),
                "n_docs": pa.array((run_end - starts).astype(np.int64)),
                len_col: pa.array(
                    (run_tok_off[1:].astype(np.int64) - run_tok_off[:-1])
                ),
                tokens_col: windows.cast(tok_type),
                "__final": pa.array(final),
                "__ord": pa.array(ids[order][starts]),
            }
        )

    rows = keyed.groupby([source_col, "_bucket"]).map_groups(
        fuse, batch_format="pyarrow"
    ).materialize()

    def keep(flag: bool):
        def f(b: pa.Table) -> pa.Table:
            m = b["__final"].combine_chunks().to_numpy(zero_copy_only=False)
            return b.filter(pa.array(m if flag else ~m))

        return f

    finals = rows.map_batches(keep(True), batch_format="pyarrow").map_batches(
        lambda b: b.drop_columns(["__final", "__ord"]), batch_format="pyarrow"
    )

    def merge(group: pa.Table) -> pa.Table:
        o = np.argsort(group["__ord"].to_numpy(zero_copy_only=False), kind="stable")
        toks = group[tokens_col].combine_chunks().take(pa.array(o))
        flat = toks.flatten()
        one = pa.array(np.array([0, len(flat)], np.int32), pa.int32())
        return pa.table(
            {
                source_col: group[source_col].slice(0, 1),
                "window_id": group["window_id"].slice(0, 1),
                "n_docs": pa.array(
                    [int(group["n_docs"].combine_chunks().to_numpy(zero_copy_only=False).sum())]
                ),
                len_col: pa.array([len(flat)], pa.int64()),
                tokens_col: pa.ListArray.from_arrays(one, flat).cast(
                    group.schema.field(tokens_col).type
                ),
            }
        )

    boundary = (
        rows.map_batches(keep(False), batch_format="pyarrow")
        .groupby([source_col, "window_id"])
        .map_groups(merge, batch_format="pyarrow")
    )
    return finals.union(boundary)
