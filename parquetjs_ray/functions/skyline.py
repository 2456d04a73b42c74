"""Distributed 2-D skyline (Pareto frontier) over a Dataset.

The classic two-phase plan: a vectorized per-block Pareto filter runs
inside ``map_batches`` (any point dominated within its own block cannot
be in the global skyline, so the local pass is a sound superset
filter — on real data it discards almost everything), then the
surviving candidates — O(skyline x blocks), tiny by construction — are
resolved with the SAME vectorized kernel in one final single-partition
pass that runs in a worker task, never on the driver.

Dominance is the strict Pareto order with one minimized and one
maximized coordinate: ``q`` dominates ``p`` iff ``q.x <= p.x`` and
``q.y >= p.y`` with at least one strict. Duplicate ``(x, y)`` points do
NOT dominate each other — all copies of an undominated point survive,
matching the SQL ``NOT EXISTS`` formulation.

There is no counterpart in the reference (a storage library — no query
operators, SURVEY.md §2.4); this is one of the Ray-native additions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _pareto_keep(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the strict Pareto frontier (minimize ``x``,
    maximize ``y``) — fully vectorized, O(n log n).

    Sort by (x asc, y desc). Every earlier row then has x <= x_i, so row
    i is dominated iff the best y among STRICTLY cheaper rows reaches
    y_i, or some equal-x row strictly beats y_i:

        dominated_i = (max y over x < x_i)  >= y_i
                    | (max y over x == x_i) >  y_i
    """
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-y, x))  # x asc, then y desc
    xs, ys = x[order], y[order]
    run_start = np.concatenate(([True], xs[1:] != xs[:-1]))
    run_id = np.cumsum(run_start) - 1
    run_max = ys[run_start]  # y sorted desc within a run -> first is max
    cum = np.maximum.accumulate(run_max)
    prev_best = np.concatenate(([-np.inf], cum[:-1]))[run_id]
    dominated = (prev_best >= ys) | (run_max[run_id] > ys)
    keep = np.zeros(n, dtype=bool)
    keep[order[~dominated]] = True
    return keep


def skyline(
    ds: rd.Dataset,
    *,
    minimize: str,
    maximize: str,
    keep_cols: list[str] | None = None,
) -> rd.Dataset:
    """→ rows of ``ds`` on the strict Pareto frontier (``minimize`` low,
    ``maximize`` high). ``keep_cols`` defaults to all columns; the two
    criterion columns are always included."""
    cols = list(keep_cols or ds.schema().names)
    for c in (minimize, maximize):
        if c not in cols:
            cols.append(c)

    def local(batch: pa.Table) -> pa.Table:
        x = batch[minimize].combine_chunks().to_numpy(zero_copy_only=False)
        y = batch[maximize].combine_chunks().to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(_pareto_keep(np.asarray(x, np.float64), np.asarray(y, np.float64))))

    candidates = ds.select_columns(cols).map_batches(local, batch_format="pyarrow")
    # final resolve: candidates are skyline-of-block unions — tiny.
    # One partition so the kernel sees every survivor at once; still a
    # worker task (map_batches), not driver code.
    return candidates.repartition(1).map_batches(local, batch_format="pyarrow", batch_size=None)
