"""One-pass column profiling (the DESCRIBE report): per column → row
count, null count, exact distinct count, min, max.

The profiling pass every ingestion pipeline runs before choosing codecs,
partition keys and dedup strategies — here as a first-class operator so
the report is itself oracle-checkable.

Scale shape: ONE scan; each batch emits per-column DISTINCT value
partials (an Arrow ``value_counts`` per column — one row per distinct
value per batch, never one per occurrence) plus a null-count partial;
the shuffle is bounded by Σ per-column cardinality. The per-column fold
is likewise cardinality-bounded. For columns whose cardinality is
row-sized this is the exact path by design (the report's
``n_distinct`` is exact); profile high-cardinality columns with
:func:`~parquetjs_ray.functions.groupops.group_approx_distinct` when an
estimate suffices.

min/max compare in the column's NATIVE type (numeric for ints, UTF-8
lexicographic for strings) and serialize to decimal strings at the end,
so the report hash-matches SQL ``CAST(min(col) AS VARCHAR)`` exactly.
Supported column types: integers and strings (floats' VARCHAR
formatting is engine-specific, so they are rejected loudly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

__all__ = ["profile_columns"]


def profile_columns(ds: rd.Dataset, columns: list[str]) -> rd.Dataset:
    """→ one row per profiled column: ``(col_name, n_rows, n_null,
    n_distinct, min_str, max_str)`` (min/max of the non-null values as
    decimal/verbatim strings; NULL when the column is all-null)."""
    schema = ds.schema()
    for c in columns:
        t = schema.types[schema.names.index(c)]
        if not (
            pa.types.is_integer(t) or pa.types.is_string(t) or pa.types.is_large_string(t)
        ):
            raise TypeError(
                f"profile_columns supports integer and string columns; {c!r} is {t}"
            )

    def partials(batch: pa.Table) -> pa.Table:
        cols, vals, nums, cnts, nulls = [], [], [], [], []
        for c in columns:
            col = batch[c]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            n_null = col.null_count
            nn = col.drop_null()
            vc = nn.value_counts()
            v = vc.field("values")
            cnt = vc.field("counts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            if pa.types.is_integer(v.type):
                num = v.cast(pa.int64()).to_numpy(zero_copy_only=False)
                sv = v.cast(pa.string())
            else:
                num = np.zeros(len(v), np.int64)
                sv = v.cast(pa.string())
            cols.append(np.repeat(np.array([c], object), len(v)))
            vals.append(sv)
            nums.append(num)
            cnts.append(cnt)
            nul = [np.zeros(len(v), np.int64)]
            if n_null:
                # null partial: is_null=1 sentinel row (never a null
                # group key — Ray's sort-based shuffle need not order them)
                cols.append(np.array([c], object))
                vals.append(pa.array([""], pa.string()))
                nums.append(np.zeros(1, np.int64))
                cnts.append(np.array([n_null], np.int64))
                nul.append(np.ones(1, np.int64))
            nulls.extend(nul)
        return pa.table(
            {
                "col_name": pa.array(np.concatenate(cols), pa.string()),
                "val": pa.concat_arrays(
                    [
                        v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
                        for v in vals
                    ]
                ),
                "is_null": pa.array(np.concatenate(nulls), pa.int64()),
                "num": pa.array(np.concatenate(nums), pa.int64()),
                "cnt": pa.array(np.concatenate(cnts), pa.int64()),
            }
        )

    from ray.data.aggregate import Max, Sum

    is_int = {
        c: pa.types.is_integer(schema.types[schema.names.index(c)]) for c in columns
    }

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g["col_name"].iloc[0]
        null_mask = g["is_null"].to_numpy() == 1
        n_null = int(g.loc[null_mask, "cnt"].sum())
        nn = g[~null_mask]
        n_rows = int(g["cnt"].sum())
        if len(nn) == 0:
            return pd.DataFrame(
                [
                    {
                        "col_name": c,
                        "n_rows": n_rows,
                        "n_null": n_null,
                        "n_distinct": 0,
                        "min_str": None,
                        "max_str": None,
                    }
                ]
            )
        if is_int[c]:
            num = nn["num"].to_numpy()
            lo, hi = str(int(num.min())), str(int(num.max()))
        else:
            sv = nn["val"].to_numpy()
            lo, hi = min(sv), max(sv)
        return pd.DataFrame(
            [
                {
                    "col_name": c,
                    "n_rows": n_rows,
                    "n_null": n_null,
                    "n_distinct": int(len(nn)),
                    "min_str": lo,
                    "max_str": hi,
                }
            ]
        )

    return (
        ds.select_columns(list(columns))
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["col_name", "val", "is_null"])
        .aggregate(Sum("cnt", alias_name="cnt"), Max("num", alias_name="num"))
        .groupby("col_name")
        .map_groups(fold, batch_format="pandas")
    )


def k_anonymity_audit(ds, quasi_cols: list[str], *, k: int = 5):
    """Privacy-governance gate before a corpus slice is released for
    training: every combination of quasi-identifier values shared by
    fewer than ``k`` rows is a re-identification risk. → one row per
    violating class: ``(*quasi_cols, n_rows)``, smallest classes first.

    One counting shuffle (the groupby moves quasi-identifier tuples +
    a count — never whole rows) and a vectorized filter; output is
    bounded by the number of rare classes, not table size.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    counts = ds.select_columns(list(quasi_cols)).groupby(list(quasi_cols)).aggregate(
        Count(alias_name="n_rows")
    )
    return counts.filter(
        expr=f"n_rows < {int(k)}"
    ).sort(["n_rows", *quasi_cols])


def ks_drift_per_group(ds: rd.Dataset, key: str, value: str) -> rd.Dataset:
    """EXACT Kolmogorov-Smirnov distance between each group's ``value``
    distribution and the GLOBAL distribution — the distribution-drift
    monitor with no approximation: ``KS = ks_num / ks_den`` where
    ``ks_num = max_v |cs(v)·N − cg(v)·ns|`` over the global breakpoints
    (cs/cg = group/global counts ≤ v) and ``ks_den = ns·N``, all
    integers, folded in Python big ints and emitted as decimal STRINGS
    so the statistic stays exact at any corpus size (the SQL oracle sums
    in HUGEINT and casts the same products).

    One (key, value)-count histogram shuffle — kilobyte partials, the
    corpus never moves; one Ray task assembles the global breakpoint
    grid and walks each group's cumulative counts against it
    (vectorized searchsorted; cost bounded by groups × distinct values,
    same contract as the grouped-quantile bundle). ``value`` must be
    integral. Output: ``(key, ks_num, ks_den)`` — one row per group.
    """
    import ray
    from ray.data.aggregate import Sum

    def combine(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch[key], value: batch[value]})
        return t.group_by([key, value]).aggregate([([], "count_all")])

    hist = (
        ds.select_columns([key, value])
        .map_batches(combine, batch_format="pyarrow")
        .groupby([key, value])
        .aggregate(Sum("count_all", alias_name="count"))
    )

    @ray.remote(num_cpus=1)
    def _fold(block_refs: list):
        tabs = [t for t in (ray.get(r) for r in block_refs) if t.num_rows]
        if not tabs:
            return pa.table(
                {
                    key: pa.array([], pa.string()),
                    "ks_num": pa.array([], pa.string()),
                    "ks_den": pa.array([], pa.string()),
                }
            )
        full = pa.concat_tables(tabs).combine_chunks()
        ks = np.asarray(full[key])
        vs = full[value].to_numpy(zero_copy_only=False).astype(np.int64)
        cs = full["count"].to_numpy(zero_copy_only=False).astype(np.int64)
        # global breakpoint grid with cumulative global counts
        grid = np.unique(vs)
        gcum = np.zeros(len(grid), np.int64)
        np.add.at(gcum, np.searchsorted(grid, vs), cs)
        gcum = np.cumsum(gcum)
        N = int(gcum[-1])
        uk = np.unique(ks)
        out_k, out_num, out_den = [], [], []
        for k_ in uk:
            sel = ks == k_
            v_k, c_k = vs[sel], cs[sel]
            order = np.argsort(v_k)
            v_k, c_k = v_k[order], c_k[order]
            ns = int(c_k.sum())
            # group cumulative count at each global breakpoint
            ccum = np.cumsum(c_k)
            at = np.searchsorted(v_k, grid, side="right") - 1
            cs_at = np.where(at >= 0, ccum[np.maximum(at, 0)], 0)
            # big-int max |cs·N − cg·ns| (object dtype: overflow-proof)
            diff = np.abs(
                cs_at.astype(object) * N - gcum.astype(object) * ns
            )
            out_k.append(k_)
            out_num.append(str(max(diff.tolist())))
            out_den.append(str(ns * N))
        return pa.table(
            {
                key: pa.array(out_k),
                "ks_num": pa.array(out_num, pa.string()),
                "ks_den": pa.array(out_den, pa.string()),
            }
        )

    import ray.data as _rd

    return _rd.from_arrow(ray.get(_fold.remote(list(hist.to_arrow_refs()))))
