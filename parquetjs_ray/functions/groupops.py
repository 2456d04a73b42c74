"""Per-group top-k with an in-batch combiner (no global sort).

``group_top_k`` keeps the k best rows per key. A naive implementation
sorts the whole corpus (an all-to-all shuffle of every byte); here each
input batch is first reduced to its own per-key top-k — vectorized, one
``sort_by`` + run-boundary arithmetic per batch — so the only data that
ever moves is ≤ k rows per (key, batch). The final exact reduction is a
``groupby(key).map_groups`` over that k-sized residue (kilobytes at any
corpus size). Deterministic: ties break on ``tiebreak_col`` ascending.

Nothing reference-derived: the reference (ironSource/parquetjs) has no
query surface (SURVEY.md §2 gap list); this is part of the training-data
extension layer, the combiner-before-shuffle shape the 100 TB notes
require for wide operations.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["group_top_k"]


def _topk_per_key(
    batch: pa.Table, key_col: str, val_col: str, tiebreak_col: str, k: int, descending: bool
) -> pa.Table:
    """Vectorized per-key top-k of ONE table: sort, then keep the first k
    positions of each key run (run starts found with one diff)."""
    if batch.num_rows == 0:
        return batch
    ordered = batch.sort_by(
        [
            (key_col, "ascending"),
            (val_col, "descending" if descending else "ascending"),
            (tiebreak_col, "ascending"),
        ]
    )
    keys = ordered.column(key_col)
    keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    codes = keys.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    n = len(codes)
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    np.not_equal(codes[1:], codes[:-1], out=new_run[1:])
    run_start = np.maximum.accumulate(np.where(new_run, np.arange(n), 0))
    keep = (np.arange(n) - run_start) < k
    return ordered.filter(pa.array(keep))


def group_top_k(
    ds,
    key_col: str,
    val_col: str,
    k: int,
    *,
    tiebreak_col: str,
    descending: bool = True,
):
    """Top-k rows per ``key_col`` by ``val_col`` over a Dataset.

    Combiner-before-shuffle: per-batch top-k first (bounds shuffled rows
    at k per key per batch), then an exact per-key reduction."""

    def combine(batch: pa.Table) -> pa.Table:
        return _topk_per_key(batch, key_col, val_col, tiebreak_col, k, descending)

    return (
        ds.map_batches(combine, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(combine, batch_format="pyarrow")
    )
