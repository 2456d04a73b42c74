"""Exact grouped quantiles over integer-valued columns, hot-key-proof.

A ``groupby(key).map_groups(sort)`` quantile materializes one key's FULL
value history per group — a hot key at 100 TB breaks the worker. For
integer measures (lengths, counts, sizes) the exact answer only needs
the per-key VALUE HISTOGRAM: a per-batch ``(key, value) → count``
combiner shrinks the shuffle to distinct pairs, and the final per-key
group is bounded by the value range (thousands of distinct lengths),
never by the key's row count.

``quantile_disc`` semantics (DuckDB): the element at 1-based position
``ceil(q × n)`` of the sorted multiset — reproduced from the histogram
by walking cumulative counts, so results hash-match a SQL oracle
exactly (no float interpolation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

__all__ = ["grouped_quantiles"]


def grouped_quantiles(
    ds: rd.Dataset,
    quantiles: dict[str, float],
    *,
    key: str = "source",
    value: str = "n_chars",
) -> rd.Dataset:
    """One row per key with a column per requested quantile.

    ``quantiles`` maps output column name → q in (0, 1], e.g.
    ``{"p50": 0.5, "p90": 0.9}``. Values must be integers (the histogram
    is exact); the output columns are int64.
    """
    from ray.data.aggregate import Sum

    qs = list(quantiles.items())

    def combine(batch: pa.Table) -> pa.Table:
        # per-batch (key, value) counts: kilobyte partials to the shuffle
        t = pa.table({key: batch[key], value: batch[value]})
        return t.group_by([key, value]).aggregate([([], "count_all")])

    def from_hist(g: pd.DataFrame) -> pd.DataFrame:
        v = g[value].to_numpy()
        c = g["count"].to_numpy()
        order = np.argsort(v)
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        n = int(cum[-1])
        row = {key: g[key].iloc[0]}
        for name, q in qs:
            target = max(1, int(np.ceil(q * n)))
            row[name] = int(v[np.searchsorted(cum, target)])
        return pd.DataFrame([row])

    return (
        ds.map_batches(combine, batch_format="pyarrow")
        .groupby([key, value])
        .aggregate(Sum("count_all", alias_name="count"))
        .groupby(key)
        .map_groups(from_hist, batch_format="pandas")
    )
