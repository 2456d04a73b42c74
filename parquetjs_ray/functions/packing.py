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

__all__ = ["pack_sequences"]


def pack_sequences(
    ds,
    capacity: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    len_col: str = "n_tok",
    bucket_width: int = 65536,
):
    """→ Dataset of (id_col, source_col, len_col, window_id) rows.

    ``window_id`` is the 0-based fixed-capacity window (per source)
    where the document's first token lands when documents are
    concatenated in ``id_col`` order.  Deterministic, shuffle volume =
    one row-sized groupby; driver state = one offset per bucket.
    """
    import ray

    def with_bucket(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        b = pa.array(ids // bucket_width, pa.int64())
        return pa.table(
            {
                id_col: batch[id_col],
                source_col: batch[source_col],
                len_col: batch[len_col].cast(pa.int64()),
                "_bucket": b,
            }
        )

    def combine(batch: pa.Table) -> pa.Table:
        # per-batch partial sums -> the global groupby shuffles bucket
        # summaries, not rows
        return batch.group_by([source_col, "_bucket"]).aggregate([(len_col, "sum")])

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
        return pa.table(
            {
                id_col: group[id_col],
                source_col: group[source_col],
                len_col: group[len_col],
                "window_id": win,
            }
        )

    return keyed.groupby([source_col, "_bucket"]).map_groups(assign, batch_format="pyarrow")
