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
):
    """Materialized concat-and-chop: one row PER WINDOW with the actual
    packed token array — the training-shard payload itself, not just the
    assignment (:func:`pack_sequences` computes where each doc lands;
    this stitches the streams).

    → Dataset of ``(source_col, window_id, n_docs, n_tok, tokens_col)``
    where ``tokens_col`` is the member docs' arrays concatenated in
    ``id_col`` order.  Two shuffles: the pack assignment's row-sized
    groupby, then ONE movement of the token payload into its window
    group — the minimum possible, since packing by definition co-locates
    window members.  Window groups are capacity-bounded (a window holds
    ≤ capacity tokens plus one straddling doc), so per-group memory is
    O(capacity), independent of corpus size."""
    packed = pack_sequences(
        ds, capacity, id_col, source_col, len_col, bucket_width, keep_cols=(tokens_col,)
    )

    def build(group: pa.Table) -> pa.Table:
        ids = group[id_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        order = pa.array(np.argsort(ids, kind="stable"))
        toks = group[tokens_col].combine_chunks().take(order)
        flat = toks.flatten()
        one = pa.array(np.array([0, len(flat)], np.int32), pa.int32())
        return pa.table(
            {
                source_col: group[source_col].slice(0, 1),
                "window_id": group["window_id"].slice(0, 1),
                "n_docs": pa.array([group.num_rows], pa.int64()),
                len_col: pa.array([len(flat)], pa.int64()),
                tokens_col: pa.ListArray.from_arrays(one, flat),
            }
        )

    return packed.groupby([source_col, "window_id"]).map_groups(build, batch_format="pyarrow")
