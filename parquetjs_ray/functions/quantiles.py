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
import pyarrow.compute as pc

import ray.data as rd

__all__ = ["grouped_quantiles", "ntile_per_group"]


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


def ntile_per_group(
    ds: rd.Dataset,
    n_tiles: int,
    *,
    key: str = "source",
    value: str = "n_chars",
    id_col: str = "doc_id",
    out_col: str = "tile",
) -> rd.Dataset:
    """Per-row ``NTILE(n_tiles) OVER (PARTITION BY key ORDER BY value,
    id_col)`` — the curriculum/difficulty-bucket assignment — without
    ever materializing one key's full history (the hot-key failure of a
    per-key ``map_groups`` sort).

    Two bounded exchanges:

    1. the :func:`grouped_quantiles` histogram shape — per-batch
       ``(key, value) → count`` combiner, global pair Sum — assembled
       (in a Ray task, off-driver) into per-(key, value) CUMULATIVE
       offsets + per-key totals, broadcast once via ``ray.put``;
    2. a ``groupby(key, value).map_groups`` over id TIE CLASSES only:
       each group is the rows of one (key, value) pair — bounded by the
       duplicate count of a single value, never by the key's row count —
       where ranks are ``cum_before + argsort(id)`` and the standard
       NTILE fill (first ``n %% k`` tiles take the extra row) is pure
       arithmetic.

    Output: ``(id_col, key, out_col)``, int64 tiles in 1..n_tiles,
    bit-identical to the SQL window function. ``value`` must be int64
    (lengths/counts), non-negative and < 2^31 (packed beside the key
    index into one composite int64 for the broadcast lookup).
    """
    import ray
    from ray.data.aggregate import Sum

    if n_tiles <= 0:
        raise ValueError("n_tiles must be positive")

    def combine(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch[key], value: batch[value]})
        return t.group_by([key, value]).aggregate([([], "count_all")])

    hist = (
        ds.map_batches(combine, batch_format="pyarrow")
        .groupby([key, value])
        .aggregate(Sum("count_all", alias_name="count"))
    )

    @ray.remote(num_cpus=1)
    def _assemble(block_refs: list):
        # Ray's aggregate can emit 0-row blocks with a bare schema;
        # drop them before concat (schemas would mismatch)
        tabs = [t for t in (ray.get(r) for r in block_refs) if t.num_rows]
        if not tabs:
            return np.array([], object), np.array([], np.int64), np.array([], np.int64), np.array([], np.int64)
        full = pa.concat_tables(tabs).combine_chunks()
        ks = np.asarray(full[key])
        vs = full[value].to_numpy(zero_copy_only=False).astype(np.int64)
        cs = full["count"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(vs) and (vs.min() < 0 or vs.max() >= 1 << 31):
            raise ValueError("ntile_per_group: value must be in [0, 2^31)")
        uk, kidx = np.unique(ks, return_inverse=True)
        comp = (kidx.astype(np.int64) << 32) | vs
        order = np.argsort(comp, kind="stable")
        comp, cs_o, kidx_o = comp[order], cs[order], kidx[order]
        # cumulative count BEFORE each (key, value), resetting per key
        cum = np.cumsum(cs_o) - cs_o
        key_first = np.concatenate(([True], kidx_o[1:] != kidx_o[:-1]))
        key_base = np.maximum.accumulate(np.where(key_first, cum, 0))
        cum_before = cum - key_base
        totals = np.bincount(kidx_o, weights=cs_o).astype(np.int64)
        return uk, comp, cum_before, totals

    bundle = _assemble.remote(list(hist.to_arrow_refs()))

    def tiles(g: pa.Table) -> pa.Table:
        uk, comp, cum_before, totals = ray.get(bundle)  # zero-copy plasma read
        k_val = g[key][0].as_py()
        v_val = int(g[value][0].as_py())
        kidx = int(np.searchsorted(uk, k_val))
        pos = int(np.searchsorted(comp, (kidx << 32) | v_val))
        base, n = int(cum_before[pos]), int(totals[kidx])
        ids = g[id_col].combine_chunks()
        order = pc.array_sort_indices(ids).to_numpy(zero_copy_only=False)
        rank0 = np.empty(len(ids), np.int64)
        rank0[order] = base + np.arange(len(ids))
        small, big = n // n_tiles, n % n_tiles
        cut = big * (small + 1)
        tile = np.where(
            rank0 < cut,
            rank0 // max(1, small + 1),
            big + (rank0 - cut) // max(1, small),
        ) + 1
        return pa.table(
            {
                id_col: g[id_col],
                key: g[key],
                out_col: pa.array(tile.astype(np.int64)),
            }
        )

    return (
        ds.select_columns([id_col, key, value])
        .groupby([key, value])
        .map_groups(tiles, batch_format="pyarrow")
    )
