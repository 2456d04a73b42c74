"""Exact heavy hitters without a full group-by shuffle.

``top_words``-style frequency queries shuffle every distinct key through
a ``groupby`` — correct, but at 100 TB the tail (billions of near-unique
keys) dominates the exchange while contributing nothing to the answer.
This operator finds every key whose frequency is ``>= phi * N`` EXACTLY
in two narrow passes, never shuffling the tail:

1. **Sketch pass** — each batch computes exact local counts, then
   compresses them to a Misra-Gries summary of ``k = headroom/phi``
   counters (subtract the (k+1)-th largest count, drop non-positives).
   MG summaries are *mergeable* (Agarwal et al., "Mergeable Summaries",
   PODS 2012): summing any number of summaries keeps every true count
   within ``N/(k+1) < phi*N`` of its sketched value, so every true heavy
   hitter survives with a positive merged count — the merged key set is
   a guaranteed **superset** of the answer. Per-batch output is at most
   ``k`` rows; the merge is a groupby over ``O(batches * k)`` tiny rows.
2. **Recount pass** — the candidate keys (at most ``k`` after the final
   driver-side compression) are broadcast once via ``ray.put``; each
   batch emits exact counts for candidates only (``pc.is_in`` filter, no
   shuffle); partials sum on the driver. Keys with exact count
   ``>= ceil(phi*N)`` are returned.

``phi`` is taken as the rational ``phi_num/phi_den`` so the threshold
``count * phi_den >= N * phi_num`` is integer arithmetic — a DuckDB
``HAVING`` clause reproduces the result bit-for-bit.

The reference (a storage library) has no aggregation at all; this is one
of the north rule's new Ray-native operators (SURVEY §2.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

__all__ = ["heavy_hitters"]


def _mg_compress(keys: pa.Array, counts: np.ndarray, k: int) -> tuple[pa.Array, np.ndarray]:
    """Misra-Gries compression: keep at most ``k`` counters by
    subtracting the (k+1)-th largest count from all and dropping
    non-positive survivors."""
    if len(counts) <= k:
        return keys, counts
    order = np.argsort(counts, kind="stable")[::-1]
    offset = counts[order[k]]
    keep = order[:k]
    kept = counts[keep] - offset
    pos = kept > 0
    return pc.take(keys, pa.array(keep[pos])), kept[pos]


def heavy_hitters(
    ds: rd.Dataset,
    column: str,
    *,
    phi_num: int,
    phi_den: int,
    split_words: bool = False,
    headroom: int = 2,
) -> pa.Table:
    """All keys of ``column`` occurring at least ``phi_num/phi_den`` of
    the time, with EXACT counts → ``pa.Table (key, n)`` sorted by
    ``(n desc, key asc)``.

    ``split_words=True`` treats ``column`` as text and counts
    space-separated words (the ``top_words`` tokenization).  The result
    is small by construction (at most ``phi_den/phi_num`` keys can
    exceed a ``phi`` frequency), so returning a driver-side table is
    scale-safe.
    """
    if phi_num <= 0 or phi_den <= 0:
        raise ValueError("phi must be a positive rational")
    k = headroom * (-(-phi_den // phi_num))  # headroom * ceil(1/phi)

    def project(b: pa.Table) -> pa.Table:
        col = b[column]
        if split_words:
            col = pc.list_flatten(pc.split_pattern(col, " "))
        return pa.table({"key": col.combine_chunks()})

    def sketch(b: pa.Table) -> pa.Table:
        vc = b.group_by(["key"]).aggregate([([], "count_all")])
        counts = vc["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, kept = _mg_compress(vc["key"].combine_chunks(), counts, k)
        if b.num_rows:
            # the batch weight rides on a zero-count carrier row so N is
            # exact even when compression drops every counter (k+1 equal
            # singletons would otherwise lose this batch's total)
            keys = pa.concat_arrays([keys, vc["key"].combine_chunks()[:1]])
            kept = np.concatenate([kept, [0]])
        total = np.zeros(len(kept), np.int64)
        if len(total):
            total[-1] = b.num_rows
        return pa.table({"key": keys, "cnt": pa.array(kept), "bt": pa.array(total)})

    projected = ds.map_batches(project, batch_format="pyarrow")
    summaries = (
        projected.map_batches(sketch, batch_format="pyarrow")
        .groupby("key")
        .sum(["cnt", "bt"])
        .take_all()
    )
    if not summaries:
        return pa.table({"key": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    merged = pa.Table.from_pylist(summaries)
    n_total = int(pc.sum(merged["sum(bt)"]).as_py() or 0)
    cand_keys, _ = _mg_compress(
        merged["key"].combine_chunks(),
        merged["sum(cnt)"].to_numpy(zero_copy_only=False).astype(np.int64),
        k,
    )
    cand_ref = ray.put(cand_keys)

    def recount(b: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        mask = pc.is_in(b["key"], value_set=cands)
        hit = b.filter(mask)
        return hit.group_by(["key"]).aggregate([([], "count_all")])

    # groupby of <=k rows per batch: the exchange is candidate-sized, the
    # tail never moves
    exact_rows = (
        projected.map_batches(recount, batch_format="pyarrow")
        .groupby("key")
        .sum("count_all")
        .take_all()
    )
    key_type = cand_keys.type
    if not exact_rows:
        return pa.table({"key": pa.array([], key_type), "n": pa.array([], pa.int64())})
    exact = pa.Table.from_pylist(exact_rows)
    counts = exact["sum(count_all)"].cast(pa.int64())
    # integer threshold: n >= ceil(phi * N)  <=>  n * phi_den >= N * phi_num
    keep = pc.greater_equal(
        pc.multiply(counts, pa.scalar(phi_den, pa.int64())),
        pa.scalar(n_total * phi_num, pa.int64()),
    )
    out = pa.table({"key": exact["key"].cast(key_type), "n": counts}).filter(keep)
    return out.sort_by([("n", "descending"), ("key", "ascending")])
