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
import pyarrow.compute as pc

__all__ = [
    "group_top_k",
    "rollup_aggregate",
    "group_count_distinct",
    "pivot_counts",
    "cube_aggregate",
    "unpivot_counts",
    "group_share_report",
    "group_argextreme",
    "group_collect",
    "group_moments",
    "mode_per_group",
    "group_approx_distinct",
    "group_regression",
    "group_hhi",
    "group_chisq",
    "grouping_sets_aggregate",
    "group_corr",
]


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


def group_count_distinct(ds, key: str, value: str):
    """Exact ``COUNT(DISTINCT value) GROUP BY key``.

    Per-batch pair dedup first (``group_by([key, value])`` inside the
    batch — the combiner), so the shuffle carries distinct (key, value)
    pairs per batch, never raw rows; the global pair dedup is one
    groupby, and the final per-key count reduces the pair-sized residue
    with another in-batch combiner. Output: ``(key, n_distinct)``."""
    from ray.data.aggregate import Count, Sum

    def pairs(b: pa.Table) -> pa.Table:
        t = pa.table({key: b[key], value: b[value]})
        return t.group_by([key, value]).aggregate([])

    def per_key(b: pa.Table) -> pa.Table:
        t = b.group_by([key]).aggregate([([], "count_all")])
        return t.select([key, "count_all"])

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby([key, value])
        .aggregate(Count(alias_name="__c"))  # one row per distinct pair
        .map_batches(per_key, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("count_all", alias_name="n_distinct"))
    )


_ROLLUP_SENTINEL = "\x00ALL"  # never a real key value (NUL byte)


def rollup_aggregate(ds, keys: list[str], *, value: str):
    """Multi-level ``GROUP BY ROLLUP(keys...)`` — COUNT and SUM(value)
    at every rollup level — in ONE pass over the data.

    Running N+1 separate groupbys scans the corpus N+1 times; here each
    batch emits in-batch partials for EVERY level (full detail, then
    each trailing-key rollup, then the grand total), so the data is read
    once and the single shuffle carries only ``levels x distinct
    combos`` partial rows. Rolled-up key slots carry a NUL-byte sentinel
    through the (sentinel-free) shuffle and come back as real NULLs, and
    ``lvl`` reproduces the SQL ``GROUPING()`` bitmask — so a DuckDB
    ``GROUP BY ROLLUP`` reproduces the output bit-for-bit.

    ``keys`` must be string columns (dimension columns); ``value`` must
    be an integer column (exact 64-bit sums). Output: ``keys... , lvl,
    n, sum_v``."""
    from ray.data.aggregate import Sum

    nk = len(keys)

    def partials(b: pa.Table) -> pa.Table:
        outs = []
        for lvl in range(nk + 1):  # lvl trailing keys rolled up
            cols = {}
            for i, k in enumerate(keys):
                if i < nk - lvl:
                    cols[k] = b[k]
                else:
                    cols[k] = pa.array(
                        np.full(b.num_rows, _ROLLUP_SENTINEL, object), pa.string()
                    )
            t = pa.table({**cols, "__v": b[value].cast(pa.int64())})
            g = t.group_by(keys).aggregate([("__v", "sum"), ([], "count_all")])
            g = g.append_column(
                "__lvl", pa.array(np.full(g.num_rows, (1 << lvl) - 1, np.int64))
            )
            outs.append(g.select(keys + ["__lvl", "__v_sum", "count_all"]))
        return pa.concat_tables(outs)

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(keys + ["__lvl"])
        .aggregate(Sum("count_all", alias_name="n"), Sum("__v_sum", alias_name="sum_v"))
    )

    def unsentinel(b: pa.Table) -> pa.Table:
        for k in keys:
            col = pc.if_else(
                pc.equal(b[k], _ROLLUP_SENTINEL), pa.scalar(None, pa.string()), b[k]
            )
            b = b.set_column(b.schema.get_field_index(k), k, col)
        return b.select(keys + ["__lvl", "n", "sum_v"]).rename_columns(
            keys + ["lvl", "n", "sum_v"]
        )

    return agg.map_batches(unsentinel, batch_format="pyarrow")


def cube_aggregate(ds, keys: list[str], *, value: str):
    """``GROUP BY CUBE(keys...)`` — COUNT and SUM(value) at every one of
    the 2^len(keys) grouping subsets — in ONE pass over the data.

    Same single-scan shape as :func:`rollup_aggregate` (which emits only
    the len(keys)+1 trailing-prefix levels): each batch emits in-batch
    partials for EVERY subset mask, so the corpus is read once and the
    one shuffle carries ``2^k × distinct combos`` partial rows — fine
    for the dimension-column cardinalities a cube is for. Rolled-up key
    slots ride the shuffle as a NUL-byte sentinel and come back as real
    NULLs; ``lvl`` reproduces the SQL ``GROUPING(keys...)`` bitmask
    (last key = least-significant bit), so a DuckDB ``GROUP BY CUBE``
    reproduces the output bit-for-bit.

    ``keys`` must be string columns; ``value`` an integer column.
    Output: ``keys..., lvl, n, sum_v``."""
    from ray.data.aggregate import Sum

    nk = len(keys)

    def partials(b: pa.Table) -> pa.Table:
        outs = []
        for mask in range(1 << nk):  # bit (nk-1-i) set → keys[i] rolled up
            cols = {}
            for i, k in enumerate(keys):
                if mask & (1 << (nk - 1 - i)):
                    cols[k] = pa.array(
                        np.full(b.num_rows, _ROLLUP_SENTINEL, object), pa.string()
                    )
                else:
                    cols[k] = b[k]
            t = pa.table({**cols, "__v": b[value].cast(pa.int64())})
            g = t.group_by(keys).aggregate([("__v", "sum"), ([], "count_all")])
            g = g.append_column(
                "__lvl", pa.array(np.full(g.num_rows, mask, np.int64))
            )
            outs.append(g.select(keys + ["__lvl", "__v_sum", "count_all"]))
        return pa.concat_tables(outs)

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(keys + ["__lvl"])
        .aggregate(Sum("count_all", alias_name="n"), Sum("__v_sum", alias_name="sum_v"))
    )

    def unsentinel(b: pa.Table) -> pa.Table:
        for k in keys:
            col = pc.if_else(
                pc.equal(b[k], _ROLLUP_SENTINEL), pa.scalar(None, pa.string()), b[k]
            )
            b = b.set_column(b.schema.get_field_index(k), k, col)
        return b.select(keys + ["__lvl", "n", "sum_v"]).rename_columns(
            keys + ["lvl", "n", "sum_v"]
        )

    return agg.map_batches(unsentinel, batch_format="pyarrow")


def unpivot_counts(
    ds,
    key: str,
    value_cols: list[str],
    *,
    var_name: str = "variable",
    val_name: str = "value",
    drop_zero: bool = True,
):
    """UNPIVOT / melt: turn a wide table (one column per measure) back
    into long ``(key, variable, value)`` rows — the inverse of
    :func:`pivot_counts`.

    Stateless and shuffle-free: each batch of W wide rows becomes
    ``W × len(value_cols)`` long rows locally (column names are repeated
    as a dictionary-encoded constant per slice, never per-row Python).
    ``drop_zero`` omits zero-valued cells, matching the sparse long form
    a pivot was built from."""

    vlist = list(value_cols)

    def melt(b: pa.Table) -> pa.Table:
        outs = []
        for c in vlist:
            t = pa.table(
                {
                    key: b[key],
                    var_name: pa.array(
                        np.full(b.num_rows, c, object), pa.string()
                    ),
                    val_name: b[c].cast(pa.int64()),
                }
            )
            if drop_zero:
                t = t.filter(pc.not_equal(t[val_name], 0))
            outs.append(t)
        return pa.concat_tables(outs)

    return ds.map_batches(melt, batch_format="pyarrow")


def group_share_report(ds, key: str):
    """Per-key skew report: row count, share of the corpus, and the
    cumulative share in descending-count order — the first diagnostic
    run on a crawl to find hot sources/domains before picking a
    partitioning key.

    One count-combiner shuffle (per-batch ``(key) → count`` partials,
    per-key Sum); the report itself is one row per key — kilobytes at
    any corpus size — finalized in a single task. Both share columns
    are ONE exact-integer count divided by the exact-integer total (the
    cumulative sum runs over int64 counts, not floats), so there is no
    float-accumulation-order ambiguity and the output hash-matches the
    SQL oracle bit-for-bit.

    Output: ``(key, n, rank, share, cum_share)`` ordered by (n desc,
    key)."""
    from ray.data.aggregate import Sum

    def combine(b: pa.Table) -> pa.Table:
        return pa.table({key: b[key]}).group_by([key]).aggregate([([], "count_all")])

    counts = (
        ds.map_batches(combine, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("count_all", alias_name="n"))
    )

    def finalize(b: pa.Table) -> pa.Table:
        t = b.sort_by([("n", "descending"), (key, "ascending")])
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(n.sum())
        share = n / np.float64(total)
        cum = np.cumsum(n) / np.float64(total)
        return pa.table(
            {
                key: t[key],
                "n": pa.array(n),
                "rank": pa.array(np.arange(1, len(n) + 1, dtype=np.int64)),
                "share": pa.array(share),
                "cum_share": pa.array(cum),
            }
        )

    # one row per key: safe to finalize as a single block
    return counts.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


def pivot_counts(ds, key: str, pivot_col: str, values: list[str]):
    """Wide pivot aggregate: one row per ``key``, one ``n_<value>``
    count column per entry of ``values`` (plus ``n_other`` for pivot
    values outside the list) — ``SELECT key, count(*) FILTER (WHERE
    pivot = v) AS n_v, ... GROUP BY key`` in one pass.

    Combiner-before-shuffle: each batch reduces to its own (key, pivot)
    counts with one in-batch ``group_by``, scattered into wide partial
    rows — so the single shuffle carries ≤ one (len(values)+2)-column
    row per (key, batch), never raw events; the final reduction is a
    plain per-key Sum of each wide column. Unlisted pivot values fold
    into ``n_other`` at the combiner, so an open-ended pivot domain
    (the 100 TB failure mode of naive dynamic pivots: one output column
    per distinct value) cannot widen the schema."""
    from ray.data.aggregate import Sum

    vlist = list(values)
    out_cols = [f"n_{v}" for v in vlist] + ["n_other"]
    lookup = {v: i for i, v in enumerate(vlist)}

    def partials(b: pa.Table) -> pa.Table:
        t = pa.table({key: b[key], pivot_col: b[pivot_col]})
        g = t.group_by([key, pivot_col]).aggregate([([], "count_all")])
        piv = g[pivot_col].combine_chunks().to_numpy(zero_copy_only=False)
        cnt = g["count_all"].combine_chunks().to_numpy(zero_copy_only=False)
        col_idx = np.array([lookup.get(v, len(vlist)) for v in piv], np.int64)
        # scatter (key-row, pivot-col) counts into the wide partial block
        kcol = g[key].combine_chunks()
        codes = kcol.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        n_keys = int(codes.max()) + 1 if len(codes) else 0
        wide = np.zeros((n_keys, len(vlist) + 1), np.int64)
        np.add.at(wide, (codes, col_idx), cnt)
        first_pos = np.zeros(n_keys, np.int64)
        first_pos[codes[::-1]] = np.arange(len(codes) - 1, -1, -1)
        cols = {key: kcol.take(pa.array(first_pos))}
        for j, name in enumerate(out_cols):
            cols[name] = pa.array(wide[:, j])
        return pa.table(cols)

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(key)
        .aggregate(*[Sum(c, alias_name=c) for c in out_cols])
        .select_columns([key] + out_cols)
    )


def group_argextreme(
    ds,
    key_col: str,
    val_col: str,
    id_col: str,
    *,
    extra_cols: list[str] | None = None,
):
    """ARG_MIN / ARG_MAX per group in one pass: for every key, the row
    holding the smallest and the largest ``val_col`` (ties broken by the
    smallest ``id_col`` — deterministic, SQL-window-reproducible).

    Combiner-before-shuffle via :func:`group_top_k` twice fused into one
    scan: each batch keeps its own per-key argmin row AND argmax row
    (≤ 2 rows per (key, batch) move), and the final per-key reduction
    works on that residue. Output: one row per key —
    ``(key, min_val, min_id, max_val, max_id)`` (+ ``min_<c>``/``max_<c>``
    for each of ``extra_cols``)."""
    extra = list(extra_cols or [])

    def local(batch: pa.Table) -> pa.Table:
        lo = _topk_per_key(batch, key_col, val_col, id_col, 1, False)
        hi = _topk_per_key(batch, key_col, val_col, id_col, 1, True)
        return pa.concat_tables([lo, hi])

    def reduce_key(g: pa.Table) -> pa.Table:
        s = g.sort_by([(val_col, "ascending"), (id_col, "ascending")])
        row = {key_col: s[key_col].slice(0, 1)}
        row["min_" + val_col] = s[val_col].slice(0, 1)
        row["min_" + id_col] = s[id_col].slice(0, 1)
        # max side: largest value, smallest id among its ties
        sv = s[val_col].combine_chunks().to_numpy(zero_copy_only=False)
        first_of_max = int(np.searchsorted(sv, sv[-1], side="left"))
        row["max_" + val_col] = s[val_col].slice(first_of_max, 1)
        row["max_" + id_col] = s[id_col].slice(first_of_max, 1)
        for c in extra:
            row["min_" + c] = s[c].slice(0, 1)
            row["max_" + c] = s[c].slice(first_of_max, 1)
        return pa.table(row)

    cols = [key_col, val_col, id_col] + extra
    return (
        ds.select_columns(cols)
        .map_batches(local, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(reduce_key, batch_format="pyarrow")
    )


def group_collect(
    ds,
    key_cols: str | list[str],
    val_col: str,
    *,
    order_col: str,
    sep: str = ",",
    as_string: bool = True,
):
    """Ordered grouped collection: SQL ``string_agg(val, sep ORDER BY
    order_col)`` (``as_string=True``) or ``array_agg(val ORDER BY
    order_col)`` (``as_string=False``, a list column) — one row per key.

    ``order_col`` must order rows deterministically within every group
    (ties fall back to ``val_col`` ascending so the result is still a
    pure function of the data, matching ``ORDER BY order_col, val``).

    Plan: project to (keys, val, order), ONE groupby(key) shuffle, each
    group sorted and folded vectorized (Arrow take + a single C-level
    join / ListArray wrap — no per-row Python). SCALE NOTE: the output
    row is proportional to its group's size by definition, so a hot key
    produces a hot string — that is inherent to the SQL semantics, not
    the plan; cap group sizes upstream (``cap_per_group``) when
    collecting from skewed corpora."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def fold(g: pa.Table) -> pa.Table:
        s = g.sort_by([(order_col, "ascending"), (val_col, "ascending")])
        vals = s[val_col].combine_chunks()
        row = {k: s[k].slice(0, 1) for k in keys}
        if as_string:
            sv = vals if pa.types.is_string(vals.type) else vals.cast(pa.string())
            row[val_col + "_agg"] = pa.array([sep.join(sv.to_pylist())], pa.string())
        else:
            n = len(vals)
            row[val_col + "_agg"] = pa.ListArray.from_arrays(
                pa.array([0, n], pa.int32()), vals
            )
        return pa.table(row)

    return (
        ds.select_columns(list(dict.fromkeys(keys + [val_col, order_col])))
        .groupby(keys[0] if len(keys) == 1 else keys)
        .map_groups(fold, batch_format="pyarrow")
    )


def group_moments(
    ds,
    key_col: str,
    x_col: str,
    y_col: str,
    *,
    x_scale: int = 0,
    y_scale: int = 0,
):
    """EXACT second moments per group with NO overflow at any corpus
    size: ``(key, n, sum_x, sum_y, sum_xy, sum_x2, sum_y2)`` — the
    sufficient statistics for covariance / correlation / regression.

    ``x_scale``/``y_scale`` lift decimal doubles to integers
    (``round(v·10^s)``, verified EXACT per value — a non-decimal input
    raises loudly, it is never silently rounded). Inputs must fit 31
    bits scaled; cross/square terms then fit int64 per value, and each
    per-(key, batch) partial splits them into 31-bit hi/lo halves whose
    batch sums stay far from int64 range. The final per-key fold adds
    the halves in PYTHON INTS (arbitrary precision — the engine-side
    equivalent of SQL's 128-bit HUGEINT sums), so ``sum_xy``/``sum_x2``/
    ``sum_y2`` (and ``sum_x``/``sum_y``, which outgrow int64 at 10^12
    rows) are emitted as decimal STRINGS. Shuffle volume: 9 int64 per
    (key, batch), never rows. Derive cov/corr from the exact sums:
    ``cov_pop = (n·Σxy − Σx·Σy) / n²``.
    """

    def _to_int(col: pa.ChunkedArray, scale: int, name: str) -> np.ndarray:
        v = col.combine_chunks().to_numpy(zero_copy_only=False)
        if v.dtype.kind in "iu":
            out = v.astype(np.int64)
        else:
            f = 10.0**scale
            out = np.round(v.astype(np.float64) * f).astype(np.int64)
            if not np.array_equal(out / f, v.astype(np.float64)):
                raise ValueError(f"{name} is not exact at scale {scale}")
        if np.any(np.abs(out) >= 2**31):
            raise ValueError(f"{name} exceeds 31 bits at scale {scale}")
        return out

    def _split(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        hi = v >> 31  # arithmetic shift: exact floor for negatives
        return hi, v - (hi << 31)

    def partials(b: pa.Table) -> pa.Table:
        x = _to_int(b[x_col], x_scale, x_col)
        y = _to_int(b[y_col], y_scale, y_col)
        cols = {"__n": np.ones(len(x), np.int64), "__sx": x, "__sy": y}
        for nm, prod in (("xy", x * y), ("x2", x * x), ("y2", y * y)):
            hi, lo = _split(prod)
            cols[f"__{nm}_hi"], cols[f"__{nm}_lo"] = hi, lo
        t = pa.table({key_col: b[key_col], **{k: pa.array(v) for k, v in cols.items()}})
        return t.group_by([key_col]).aggregate([(c, "sum") for c in cols])

    def fold(g: pa.Table) -> pa.Table:
        def tot(c: str) -> int:
            return int(sum(int(v) for v in g[c].to_pylist()))

        row = {key_col: g[key_col].slice(0, 1)}
        row["n"] = pa.array([tot("__n_sum")], pa.int64())
        for out_name, src in (("sum_x", "__sx_sum"), ("sum_y", "__sy_sum")):
            row[out_name] = pa.array([str(tot(src))], pa.string())
        for nm in ("xy", "x2", "y2"):
            exact = (tot(f"__{nm}_hi_sum") << 31) + tot(f"__{nm}_lo_sum")
            row[f"sum_{nm}"] = pa.array([str(exact)], pa.string())
        return pa.table(row)

    return (
        ds.select_columns([key_col, x_col, y_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(fold, batch_format="pyarrow")
    )


def zscore_outliers_per_group(
    ds,
    key_col: str,
    value_col: str,
    id_col: str,
    *,
    scale: int = 0,
    c_num: int = 3,
    c_den: int = 1,
):
    """Rows deviating more than ``(c_num/c_den)·σ`` from their group
    mean, decided EXACTLY in integers: with x lifted by ``10^scale``
    (per-value exactness enforced, like :func:`group_moments`) and
    per-key exact ``(n, S=Σx, Q=Σx²)`` folded in Python big ints, row x
    is an outlier iff

        ``(c_den·|n·x − S|)² > c_num²·(n·Q − S²)``

    — the ``|x−μ| > c·σ_pop`` inequality cross-multiplied by ``n²``, so
    the flag hash-matches a SQL HUGEINT oracle bit for bit (no float σ
    anywhere). The fold stores ``t = isqrt(c_num²(nQ−S²))`` per key; the
    per-row test ``a > t`` is equivalent (nonneg ints: ``a² > T ⇔ a >
    ⌊√T⌋``) and stays in int64, guarded by ``max(c_num,c_den)·n < 2^30``
    per key (≈3.6·10^8 rows/key at c=3; past that the fold raises
    loudly instead of overflowing).

    Two passes; the corpus itself never shuffles: 4-int64
    per-(key,batch) partials → per-key big-int fold (kilobyte rows) →
    broadcast dict (bounded by #keys, same contract as
    ``mad_outliers_per_group``) → one stateless flag-and-filter map.
    Output: the outlier rows ``(id_col, key_col, value_col)``.
    """
    import math

    import ray

    def _to_int(col: pa.ChunkedArray, name: str) -> np.ndarray:
        v = col.combine_chunks().to_numpy(zero_copy_only=False)
        if v.dtype.kind in "iu":
            out = v.astype(np.int64)
        else:
            f = 10.0**scale
            out = np.round(v.astype(np.float64) * f).astype(np.int64)
            if not np.array_equal(out / f, v.astype(np.float64)):
                raise ValueError(f"{name} is not exact at scale {scale}")
        if np.any(np.abs(out) >= 2**31):
            raise ValueError(f"{name} exceeds 31 bits at scale {scale}")
        return out

    agg_cols = ("__n", "__sx", "__q_hi", "__q_lo")

    def partials(b: pa.Table) -> pa.Table:
        x = _to_int(b[value_col], value_col)
        x2 = x * x
        hi = x2 >> 31
        t = pa.table(
            {
                key_col: b[key_col],
                "__n": pa.array(np.ones(len(x), np.int64)),
                "__sx": pa.array(x),
                "__q_hi": pa.array(hi),
                "__q_lo": pa.array(x2 - (hi << 31)),
            }
        )
        return t.group_by([key_col]).aggregate([(c, "sum") for c in agg_cols])

    def fold(g: pa.Table) -> pa.Table:
        def tot(c: str) -> int:
            return int(sum(int(v) for v in g[c].to_pylist()))

        n, s = tot("__n_sum"), tot("__sx_sum")
        q = (tot("__q_hi_sum") << 31) + tot("__q_lo_sum")
        if max(c_num, c_den) * n >= 1 << 30:
            raise ValueError(
                f"group of {n} rows exceeds the int64-safe per-key bound "
                f"for c={c_num}/{c_den}"
            )
        t = math.isqrt(c_num * c_num * (n * q - s * s))
        return pa.table(
            {
                key_col: g[key_col].slice(0, 1),
                "__n": pa.array([n], pa.int64()),
                "__s": pa.array([s], pa.int64()),
                "__t": pa.array([t], pa.int64()),
            }
        )

    stats = (
        ds.select_columns([key_col, value_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(fold, batch_format="pyarrow")
    )

    @ray.remote(num_cpus=1)
    def _collect(block_refs: list):
        tabs = [t for t in (ray.get(r) for r in block_refs) if t.num_rows]
        if not tabs:
            return {}
        full = pa.concat_tables(tabs)
        ks = np.asarray(full[key_col])
        return {
            k: (int(n), int(s), int(t))
            for k, n, s, t in zip(
                ks,
                full["__n"].to_pylist(),
                full["__s"].to_pylist(),
                full["__t"].to_pylist(),
            )
        }

    ref = _collect.remote(list(stats.to_arrow_refs()))

    def flag(b: pa.Table) -> pa.Table:
        x = _to_int(b[value_col], value_col)
        ks = np.asarray(b[key_col].combine_chunks())
        table = ray.get(ref)
        uk, inv = np.unique(ks, return_inverse=True)
        trip = np.array([table[k] for k in uk], np.int64).reshape(len(uk), 3)
        n, s, t = trip[inv, 0], trip[inv, 1], trip[inv, 2]
        a = c_den * np.abs(n * x - s)
        return b.select([id_col, key_col, value_col]).filter(pa.array(a > t))

    return ds.select_columns([id_col, key_col, value_col]).map_batches(
        flag, batch_format="pyarrow"
    )


def group_topk_with_other(ds, key_col: str, val_col: str, *, k: int = 3):
    """Per-key top-k values by count with the remainder rolled into one
    ``OTHER`` row — the reporting shape dashboards actually render
    (``row_number() ≤ k`` + a re-aggregated residual): one
    (key, value)-count combiner + pair Sum shuffle, then a per-key fold
    bounded by the key's distinct values, deterministic (count desc,
    value asc). Output: ``(key_col, val_col, n)``; the residual row
    carries the literal value ``'OTHER'`` (string values assumed).
    """
    from ray.data.aggregate import Sum

    def pair_counts(b: pa.Table) -> pa.Table:
        t = pa.table({key_col: b[key_col], val_col: b[val_col]})
        g = t.group_by([key_col, val_col]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, val_col, "__c"])

    counts = (
        ds.select_columns([key_col, val_col])
        .map_batches(pair_counts, batch_format="pyarrow")
        .groupby([key_col, val_col])
        .aggregate(Sum("__c", alias_name="__n"))
    )

    def fold(g: pa.Table) -> pa.Table:
        n = g["__n"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = np.asarray(g[val_col])
        order = np.lexsort((vals, -n))
        top = order[:k]
        out_v = [str(v) for v in vals[top]]
        out_n = [int(x) for x in n[top]]
        rest = int(n[order[k:]].sum()) if len(order) > k else 0
        if rest:
            out_v.append("OTHER")
            out_n.append(rest)
        return pa.table(
            {
                key_col: pa.array([g[key_col][0].as_py()] * len(out_v)),
                val_col: pa.array(out_v, pa.string()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    return counts.groupby(key_col).map_groups(fold, batch_format="pyarrow")


def loo_mean_encode(
    ds,
    key_col: str,
    value_col: str,
    carry_cols: list[str],
    *,
    scale: int = 0,
):
    """Leave-one-out target encoding, EXACT: for each row, the mean of
    ``value_col`` over the OTHER rows of its ``key_col`` group, emitted
    as the rational pair ``loo_num = S_k − x`` / ``loo_den = n_k − 1``
    (integers after the usual decimal lift; both NULL for singleton
    groups, matching SQL NULLIF) — the ML categorical-feature encoder
    without the target-leakage of the plain group mean, and without any
    float division to hash-mismatch on.

    Per-key ``(n, S)`` partials (2 int64 per (key, batch)) → broadcast
    dict → one stateless per-row map; the corpus never shuffles.
    Output: ``carry_cols..., key_col, loo_num, loo_den``.
    """
    import ray

    def _to_int(col: pa.ChunkedArray, name: str) -> np.ndarray:
        v = col.combine_chunks().to_numpy(zero_copy_only=False)
        if v.dtype.kind in "iu":
            out = v.astype(np.int64)
        else:
            f = 10.0**scale
            out = np.round(v.astype(np.float64) * f).astype(np.int64)
            if not np.array_equal(out / f, v.astype(np.float64)):
                raise ValueError(f"{name} is not exact at scale {scale}")
        if np.any(np.abs(out) >= 2**31):
            raise ValueError(f"{name} exceeds 31 bits at scale {scale}")
        return out

    def partials(b: pa.Table) -> pa.Table:
        x = _to_int(b[value_col], value_col)
        t = pa.table(
            {
                key_col: b[key_col],
                "__n": pa.array(np.ones(len(x), np.int64)),
                "__s": pa.array(x),
            }
        )
        return t.group_by([key_col]).aggregate([("__n", "sum"), ("__s", "sum")])

    from ray.data.aggregate import Sum

    stats = (
        ds.select_columns([key_col, value_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("__n_sum", alias_name="__n"), Sum("__s_sum", alias_name="__s"))
    )

    @ray.remote(num_cpus=1)
    def _collect(block_refs: list):
        tabs = [t for t in (ray.get(r) for r in block_refs) if t.num_rows]
        if not tabs:
            return {}
        full = pa.concat_tables(tabs)
        ks = np.asarray(full[key_col])
        return {
            k: (int(n), int(s))
            for k, n, s in zip(ks, full["__n"].to_pylist(), full["__s"].to_pylist())
        }

    ref = _collect.remote(list(stats.to_arrow_refs()))

    def encode(b: pa.Table) -> pa.Table:
        x = _to_int(b[value_col], value_col)
        ks = np.asarray(b[key_col].combine_chunks())
        table = ray.get(ref)
        uk, inv = np.unique(ks, return_inverse=True)
        pair = np.array([table[k] for k in uk], np.int64).reshape(len(uk), 2)
        n, s = pair[inv, 0], pair[inv, 1]
        num = pa.array(s - x)
        den = pa.array(n - 1)
        single = pa.array(n == 1)
        cols = {c: b[c] for c in carry_cols}
        cols[key_col] = b[key_col]
        cols["loo_num"] = pc.if_else(single, pa.scalar(None, pa.int64()), num)
        cols["loo_den"] = pc.if_else(single, pa.scalar(None, pa.int64()), den)
        return pa.table(cols)

    return ds.select_columns(carry_cols + [key_col, value_col]).map_batches(
        encode, batch_format="pyarrow"
    )


def mode_per_group(ds, key_col: str, val_col: str):
    """Most frequent value per key (SQL ``mode()``), deterministic: ties
    break on the SMALLEST value → ``(key, mode_val, mode_n)``.

    Two combiner stages, rows never shuffle: per-batch (key, value)
    counts → one pair-keyed Sum shuffle (volume = distinct pairs per
    batch) → per-batch per-key best (count desc, value asc; ≤ 1 row per
    (key, batch)) → final per-key pick over that residue."""
    from ray.data.aggregate import Sum

    def pair_counts(b: pa.Table) -> pa.Table:
        t = pa.table({key_col: b[key_col], val_col: b[val_col]})
        return t.group_by([key_col, val_col]).aggregate([([], "count_all")])

    def local_best(b: pa.Table) -> pa.Table:
        s = b.sort_by([(key_col, "ascending"), ("mode_n", "descending"), (val_col, "ascending")])
        k = s[key_col].combine_chunks()
        keep = np.zeros(len(s), dtype=bool)
        # first row of every key run is that key's local best
        if len(s):
            eq = pc.equal(k.slice(1), k.slice(0, len(s) - 1)).to_numpy(zero_copy_only=False)
            keep[0] = True
            keep[1:] = ~eq
        return s.filter(pa.array(keep))

    def final_pick(g: pa.Table) -> pa.Table:
        s = g.sort_by([("mode_n", "descending"), (val_col, "ascending")])
        return pa.table(
            {
                key_col: s[key_col].slice(0, 1),
                "mode_val": s[val_col].slice(0, 1),
                "mode_n": s["mode_n"].slice(0, 1),
            }
        )

    return (
        ds.select_columns([key_col, val_col])
        .map_batches(pair_counts, batch_format="pyarrow")
        .groupby([key_col, val_col])
        .aggregate(Sum("count_all", alias_name="mode_n"))
        .map_batches(local_best, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(final_pick, batch_format="pyarrow")
    )


def group_approx_distinct(ds, key_col: str, val_col: str, *, p: int = 12):
    """APPROXIMATE ``COUNT(DISTINCT val) GROUP BY key`` via per-key HLL
    sketches — the scale path when :func:`group_count_distinct`'s exact
    distinct-pair shuffle is itself too wide (e.g. distinct tokens per
    source at 10^12 rows, where pairs ≈ rows).

    Shuffle volume is ONE 2^p-byte register array per (key, batch) —
    independent of cardinality — and the per-key merge is an
    elementwise max. Standard error ≈ 1.04/√2^p (~1.6 % at the default
    p=12). Output: ``(key, n_distinct_approx: int64)``; estimates are a
    deterministic function of the data (hash-based, no RNG)."""
    import base64

    from ..functions.sketch import HllSketch
    from .text import fingerprint64

    def _hashes(col: pa.Array) -> np.ndarray:
        t = col.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return fingerprint64(col)
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False).view(np.uint64)

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key_col].combine_chunks()
        karr = np.asarray(keys)
        h = _hashes(b[val_col].combine_chunks())
        order = np.argsort(karr, kind="stable")
        kk, hh = karr[order], h[order]
        starts = np.flatnonzero(np.concatenate(([True], kk[1:] != kk[:-1])))
        ends = np.concatenate((starts[1:], [len(kk)]))
        out_k, out_s = [], []
        for s0, e0 in zip(starts, ends):
            sk = HllSketch(p).add_hashes(hh[s0:e0])
            out_k.append(kk[s0])
            out_s.append(base64.b64encode(sk.serialize()).decode())
        return pa.table({key_col: pa.array(out_k, keys.type), "__sk": pa.array(out_s)})

    def fold(g: pa.Table) -> pa.Table:
        import base64 as b64

        acc = None
        for blob in g["__sk"].to_pylist():
            sk = HllSketch.deserialize(b64.b64decode(blob))
            acc = sk if acc is None else acc.merge(sk)
        return pa.table(
            {
                key_col: g[key_col].slice(0, 1),
                "n_distinct_approx": pa.array([int(round(acc.estimate()))], pa.int64()),
            }
        )

    return (
        ds.select_columns([key_col, val_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(fold, batch_format="pyarrow")
    )


def group_regression(
    ds,
    key_col: str,
    x_col: str,
    y_col: str,
    *,
    x_scale: int = 0,
    y_scale: int = 0,
):
    """Per-group simple linear regression (least squares), SQL-exact:
    ``(key, n, slope, intercept)`` with slope/intercept in the SCALED
    integer units (undo with 10^(y_scale − x_scale) / 10^y_scale).

    Derived from :func:`group_moments`' exact big-int sums with exactly
    one float expression each — ``slope = double(nΣxy − ΣxΣy) /
    double(nΣx² − (Σx)²)`` and ``intercept = (double(Σy) − slope ·
    double(Σx)) / n`` — int→double conversions are correctly rounded on
    both sides (verified against DuckDB's HUGEINT cast), so the doubles
    hash-match the same SQL expression bit-for-bit. ``slope`` is NULL
    for degenerate groups (zero x-variance)."""

    def derive(t: pa.Table) -> pa.Table:
        ns = t["n"].to_pylist()
        sx = [int(s) for s in t["sum_x"].to_pylist()]
        sy = [int(s) for s in t["sum_y"].to_pylist()]
        sxy = [int(s) for s in t["sum_xy"].to_pylist()]
        sx2 = [int(s) for s in t["sum_x2"].to_pylist()]
        slopes, intercepts = [], []
        for n, a, b, ab, a2 in zip(ns, sx, sy, sxy, sx2):
            den = n * a2 - a * a
            if den == 0:
                slopes.append(None)
                intercepts.append(None)
                continue
            slope = float(n * ab - a * b) / float(den)
            slopes.append(slope)
            intercepts.append((float(b) - slope * float(a)) / n)
        return pa.table(
            {
                key_col: t[key_col],
                "n": t["n"],
                "slope": pa.array(slopes, pa.float64()),
                "intercept": pa.array(intercepts, pa.float64()),
            }
        )

    return group_moments(
        ds, key_col, x_col, y_col, x_scale=x_scale, y_scale=y_scale
    ).map_batches(derive, batch_format="pyarrow")


def group_hhi(ds, key_col: str, val_col: str):
    """Herfindahl–Hirschman concentration of the ``val_col`` distribution
    per key → ``(key, n, n_distinct, hhi)`` — the label-imbalance /
    duplication-concentration diagnostic (hhi = Σ(cᵢ/n)² ∈ (0, 1];
    1 = all rows share one value, 1/n_distinct = perfectly uniform).

    Shape — rows never shuffle and NO per-key ``map_groups``: per-batch
    (key, value) count combiner → one pair-keyed Sum shuffle (volume =
    distinct pairs per batch) → a per-batch per-key partial over the
    pair residue — each exact c² (Python ints; c² outgrows int64 past
    ~3·10⁹ rows per value) split into three ≤31-bit limbs — → one
    key-keyed Sum shuffle of the 5-int partials → a stateless finalize
    reassembling Σc² in Python ints. Limb sums stay inside int64 up to
    ~4·10⁹ blocks (≈10¹⁴ rows at 32k-row blocks). ``hhi`` is exactly ONE
    float division of two exact integers — both sides correctly rounded
    — so the double hash-matches SQL
    ``CAST(sum(c*c) AS DOUBLE)/CAST(sum(c)*sum(c) AS DOUBLE)``
    bit-for-bit."""
    from ray.data.aggregate import Sum

    def pair_counts(b: pa.Table) -> pa.Table:
        t = pa.table({key_col: b[key_col], val_col: b[val_col]})
        return t.group_by([key_col, val_col]).aggregate([([], "count_all")])

    def partials(b: pa.Table) -> pa.Table:
        c = b["c"].combine_chunks().to_numpy(zero_copy_only=False).astype(object)
        sq = c * c  # exact PyInts
        a = sq >> 124  # always 0 below 2^62 rows/value; loud guard otherwise
        if a.any():
            raise ValueError("per-value count exceeds 2^62 rows")
        hi2 = sq >> 62
        rem = sq - (hi2 << 62)
        hi1 = rem >> 31
        lo = rem - (hi1 << 31)
        t = pa.table(
            {
                key_col: b[key_col],
                "__n": b["c"],
                "__nd": pa.array(np.ones(len(c), np.int64)),
                "__sq2": pa.array(hi2.astype(np.int64)),
                "__sq1": pa.array(hi1.astype(np.int64)),
                "__sq0": pa.array(lo.astype(np.int64)),
            }
        )
        return t.group_by([key_col]).aggregate(
            [(c_, "sum") for c_ in ("__n", "__nd", "__sq2", "__sq1", "__sq0")]
        )

    def finalize(b: pa.Table) -> pa.Table:
        n = b["__n_sum"].to_pylist()
        s2 = b["__sq2_sum"].to_pylist()
        s1 = b["__sq1_sum"].to_pylist()
        s0 = b["__sq0_sum"].to_pylist()
        hhi = [
            float((int(a2) << 62) + (int(a1) << 31) + int(a0)) / float(int(m) * int(m))
            for m, a2, a1, a0 in zip(n, s2, s1, s0)
        ]
        return pa.table(
            {
                key_col: b[key_col],
                "n": b["__n_sum"],
                "n_distinct": b["__nd_sum"],
                "hhi": pa.array(hhi, pa.float64()),
            }
        )

    return (
        ds.select_columns([key_col, val_col])
        .map_batches(pair_counts, batch_format="pyarrow")
        .groupby([key_col, val_col])
        .aggregate(Sum("count_all", alias_name="c"))
        .map_batches(partials, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(
            Sum("__n_sum", alias_name="__n_sum"),
            Sum("__nd_sum", alias_name="__nd_sum"),
            Sum("__sq2_sum", alias_name="__sq2_sum"),
            Sum("__sq1_sum", alias_name="__sq1_sum"),
            Sum("__sq0_sum", alias_name="__sq0_sum"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


def group_chisq(ds, key_col: str, val_col: str):
    """χ² divergence of each key's ``val_col`` distribution from the
    CORPUS distribution → ``(key, n, chisq)`` — the distribution-drift /
    anomalous-source diagnostic (0 = the key's mix matches the corpus).

    Exact-integer formulation: with per-key observed counts o_t, key
    total n, global counts c_t and corpus total N, each term
    ``(o_t − n·c_t/N)²/(n·c_t/N)`` is rewritten as
    ``(o_t·N − n·c_t)² / (n·c_t·N)`` — numerator and denominator are
    EXACT Python ints (outgrow int64/HUGEINT at corpus scale; the SQL
    oracle form holds to ~10^9 rows, the engine to any size), each term
    is ONE float division, and terms fold in ASCENDING value order —
    so the double hash-matches the explicit SQL expression bit-for-bit.

    Shape: one domain-sized global aggregate (tiny, driver-held, shipped
    in the task closure), then the :func:`group_hhi` pair-combiner plan —
    per-batch (key, value) counts, one pair Sum shuffle, per-key fold
    bounded by the value DOMAIN. Values absent for a key still
    contribute their expected-count term, as χ² requires."""
    from ray.data.aggregate import Sum

    def pair_counts(b: pa.Table) -> pa.Table:
        t = pa.table({key_col: b[key_col], val_col: b[val_col]})
        return t.group_by([key_col, val_col]).aggregate([([], "count_all")])

    pairs = (
        ds.select_columns([key_col, val_col])
        .map_batches(pair_counts, batch_format="pyarrow")
        .groupby([key_col, val_col])
        .aggregate(Sum("count_all", alias_name="c"))
        .materialize()  # reused by the global fold and the per-key fold
    )

    gl = (
        pairs.groupby(val_col).aggregate(Sum("c", alias_name="n")).take_all()
    )  # domain-sized: one row per distinct value in the corpus
    global_counts = {r[val_col]: int(r["n"]) for r in gl}
    domain = sorted(global_counts)  # deterministic term order
    big_n = sum(global_counts.values())

    def fold(g: pa.Table) -> pa.Table:
        obs = dict(zip(g[val_col].to_pylist(), (int(c) for c in g["c"].to_pylist())))
        n = sum(obs.values())
        chisq = 0.0
        for v in domain:  # ascending-value order on BOTH sides
            ct = global_counts[v]
            d = obs.get(v, 0) * big_n - n * ct
            chisq += float(d * d) / float(n * ct * big_n)
        return pa.table(
            {
                key_col: g[key_col].slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "chisq": pa.array([chisq], pa.float64()),
            }
        )

    return pairs.groupby(key_col).map_groups(fold, batch_format="pyarrow")


def grouping_sets_aggregate(ds, keys: list[str], sets: list[tuple[str, ...]], *, value: str):
    """Arbitrary ``GROUP BY GROUPING SETS(...)`` — COUNT and SUM(value)
    at exactly the requested grouping sets (each a subset of ``keys``) —
    in ONE pass over the data; the general form of
    :func:`rollup_aggregate` (trailing prefixes) and
    :func:`cube_aggregate` (all 2^k subsets).

    Each batch emits in-batch partials for every requested set, so the
    corpus is read once and the single shuffle carries ``len(sets) ×
    distinct combos`` partial rows. Rolled-up key slots ride the shuffle
    as a NUL-byte sentinel and come back as real NULLs; ``lvl``
    reproduces the SQL ``GROUPING(keys...)`` bitmask (last key =
    least-significant bit), so a DuckDB ``GROUP BY GROUPING SETS``
    reproduces the output bit-for-bit. Duplicate sets are rejected
    (SQL would emit duplicate rows; this engine keys the shuffle on
    ``lvl`` so they would silently merge instead — loud beats wrong).

    ``keys`` must be string columns; ``value`` an integer column.
    Output: ``keys..., lvl, n, sum_v``."""
    from ray.data.aggregate import Sum

    nk = len(keys)
    masks = []
    for s in sets:
        unknown = set(s) - set(keys)
        if unknown:
            raise ValueError(f"grouping set {s} references unknown keys {unknown}")
        masks.append(sum(1 << (nk - 1 - i) for i, k in enumerate(keys) if k not in s))
    if len(set(masks)) != len(masks):
        raise ValueError("duplicate grouping sets")

    def partials(b: pa.Table) -> pa.Table:
        outs = []
        for mask in masks:
            cols = {}
            for i, k in enumerate(keys):
                if mask & (1 << (nk - 1 - i)):
                    cols[k] = pa.array(
                        np.full(b.num_rows, _ROLLUP_SENTINEL, object), pa.string()
                    )
                else:
                    cols[k] = b[k]
            t = pa.table({**cols, "__v": b[value].cast(pa.int64())})
            g = t.group_by(keys).aggregate([("__v", "sum"), ([], "count_all")])
            g = g.append_column("__lvl", pa.array(np.full(g.num_rows, mask, np.int64)))
            outs.append(g.select(keys + ["__lvl", "__v_sum", "count_all"]))
        return pa.concat_tables(outs)

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(keys + ["__lvl"])
        .aggregate(Sum("count_all", alias_name="n"), Sum("__v_sum", alias_name="sum_v"))
    )

    def unsentinel(b: pa.Table) -> pa.Table:
        for k in keys:
            col = pc.if_else(
                pc.equal(b[k], _ROLLUP_SENTINEL), pa.scalar(None, pa.string()), b[k]
            )
            b = b.set_column(b.schema.get_field_index(k), k, col)
        return b.select(keys + ["__lvl", "n", "sum_v"]).rename_columns(
            keys + ["lvl", "n", "sum_v"]
        )

    return agg.map_batches(unsentinel, batch_format="pyarrow")


def group_corr(
    ds,
    key_col: str,
    x_col: str,
    y_col: str,
    *,
    x_scale: int = 0,
    y_scale: int = 0,
):
    """Per-group population covariance and Pearson correlation, SQL-exact:
    ``(key, n, cov_pop, corr)`` with cov in SCALED integer units (undo
    with 10^(x_scale+y_scale); corr is scale-invariant).

    Derived from :func:`group_moments`' exact big-int sums.
    ``cov_pop = double(nΣxy − ΣxΣy)/double(n²)`` is one float division
    of exact ints; ``corr`` additionally multiplies the two exact
    variance terms as doubles and takes ONE square root — every step
    (int→double conversion, ×, sqrt, ÷) is a single correctly-rounded
    IEEE-754 operation on both sides (sqrt IS exactly rounded, unlike
    log/pow), so the doubles hash-match the same SQL expression
    bit-for-bit. ``corr`` is NULL when either variance is zero."""
    import math

    def derive(t: pa.Table) -> pa.Table:
        ns = t["n"].to_pylist()
        sx = [int(s) for s in t["sum_x"].to_pylist()]
        sy = [int(s) for s in t["sum_y"].to_pylist()]
        sxy = [int(s) for s in t["sum_xy"].to_pylist()]
        sx2 = [int(s) for s in t["sum_x2"].to_pylist()]
        sy2 = [int(s) for s in t["sum_y2"].to_pylist()]
        covs, corrs = [], []
        for n, a, b, ab, a2, b2 in zip(ns, sx, sy, sxy, sx2, sy2):
            num = n * ab - a * b
            covs.append(float(num) / float(n * n))
            vx, vy = n * a2 - a * a, n * b2 - b * b
            if vx == 0 or vy == 0:
                corrs.append(None)
            else:
                corrs.append(float(num) / math.sqrt(float(vx) * float(vy)))
        return pa.table(
            {
                key_col: t[key_col],
                "n": t["n"],
                "cov_pop": pa.array(covs, pa.float64()),
                "corr": pa.array(corrs, pa.float64()),
            }
        )

    return group_moments(
        ds, key_col, x_col, y_col, x_scale=x_scale, y_scale=y_scale
    ).map_batches(derive, batch_format="pyarrow")


def cooccur_pair_counts(
    ds,
    *,
    group_col: str,
    item_col: str,
    num_buckets: int = 64,
    max_basket: int = 1024,
):
    """Full co-occurrence pair-count table ``(item_a, item_b,
    n_groups)``: how many groups contain BOTH items, for every unordered
    item pair — the shared first phase of :func:`cooccur_pairs_topk`
    (which keeps top-k) and graph construction
    (``functions/graph.py:triangle_count`` thresholds ``n_groups`` to
    build a strong-tie edge list). See :func:`cooccur_pairs_topk` for
    the plan; the output here is the step-4 count table itself.
    """
    import ray.data as rd  # noqa: F401  (signature parity with siblings)
    from ray.data.aggregate import Count

    def local_distinct(batch: pa.Table) -> pa.Table:
        t = pa.table({group_col: batch[group_col], item_col: batch[item_col]})
        t = t.group_by([group_col, item_col]).aggregate([])
        g = t[group_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = (g * np.int64(-7046029254386353131)) % np.int64(num_buckets)
        return t.append_column("__b", pa.array(np.abs(bucket)))

    def gen_pairs(g: pa.Table) -> pa.Table:
        grp = g[group_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        itm = g[item_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        # global distinct within the bucket (batches may repeat pairs):
        # lexsort + run mask — same result as np.unique(axis=0) without
        # its void-view row sort (measured ~3x on 10^6 pairs)
        order = np.lexsort((itm, grp))
        grp, itm = grp[order], itm[order]
        keep = np.concatenate(
            ([True], (grp[1:] != grp[:-1]) | (itm[1:] != itm[:-1]))
        ) if len(grp) else np.zeros(0, dtype=bool)
        grp, itm = grp[keep], itm[keep]  # sorted by (group, item)
        starts = np.flatnonzero(np.concatenate(([True], grp[1:] != grp[:-1])))
        lens = np.diff(np.concatenate((starts, [len(grp)])))
        if len(lens) and lens.max() > max_basket:
            raise ValueError(
                f"basket of {lens.max()} items exceeds max_basket={max_basket}"
            )
        out_a, out_b = [], []
        for ln in np.unique(lens):
            if ln < 2:
                continue
            ti, tj = np.triu_indices(int(ln), 1)
            s = starts[lens == ln]
            out_a.append(itm[(s[:, None] + ti[None, :]).ravel()])
            out_b.append(itm[(s[:, None] + tj[None, :]).ravel()])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        return pa.table({"item_a": pa.array(a), "item_b": pa.array(b)})

    pairs = (
        ds.select_columns([group_col, item_col])
        .map_batches(local_distinct, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(gen_pairs, batch_format="pyarrow")
    )
    return pairs.groupby(["item_a", "item_b"]).aggregate(Count(alias_name="n_groups"))


def cooccur_pairs_topk(
    ds,
    *,
    group_col: str,
    item_col: str,
    k: int = 20,
    num_buckets: int = 64,
    max_basket: int = 1024,
) -> "pa.Table":
    """Top-k co-occurring item pairs across groups (market-basket
    mining): how many groups contain BOTH items, for every unordered
    item pair, keeping the ``k`` most frequent. The SQL shape is the
    quadratic distinct self-join ``d a JOIN d b ON same group AND
    a.item < b.item``; the distributed plan never runs it:

    1. per-batch LOCAL distinct ``(group, item)`` (C-level group_by
       combiner — repeat purchases collapse before any exchange);
    2. groups cogroup by ``hash(group) % num_buckets`` — each bucket
       holds whole groups, so pair generation is bucket-local;
    3. inside a bucket: global distinct, segment by group, and emit
       pairs VECTORIZED PER BASKET SIZE — one ``np.triu_indices``
       template per distinct basket length (baskets are small: the
       template loop runs ~max-basket-size times, never per row);
    4. one ``groupby(item_a, item_b).count`` over pair rows (16 bytes
       each) + a k-row sort-limit.

    Baskets longer than ``max_basket`` raise: a single hot basket of B
    items emits B^2/2 pairs — at that point you want co-occurrence
    sampling, not the exact count (the cap makes the quadratic cost an
    explicit, loud decision rather than a silent OOM).
    """
    counts = cooccur_pair_counts(
        ds, group_col=group_col, item_col=item_col,
        num_buckets=num_buckets, max_basket=max_basket,
    )

    # top-k without a global sort: per-block k-row combiner, then one
    # final k-row resolve — the exchange carries k rows per block, not
    # the pair-count table
    def local_topk(b: pa.Table) -> pa.Table:
        n = b["n_groups"].combine_chunks().to_numpy(zero_copy_only=False)
        a = b["item_a"].combine_chunks().to_numpy(zero_copy_only=False)
        bb = b["item_b"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((bb, a, -n))[:k]
        return b.take(pa.array(order))

    return (
        counts.map_batches(local_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local_topk, batch_format="pyarrow", batch_size=None)
    )


def group_welch_t(
    ds,
    key_col: str,
    arm_col: str,
    x_col: str,
    *,
    x_scale: int = 0,
):
    """Welch's t-statistic per group between two arms (A/B experiment
    readout): ``(key, n_a, n_b, mean_a, mean_b, welch_t)`` with
    ``arm_col`` ∈ {0, 1}.

    Same exactness contract as :func:`group_moments`: per-(key, arm,
    batch) partials carry n/Σx/Σx² with the x² sum split into 31-bit
    halves, the per-key fold adds them in Python big-ints, and the ONLY
    float arithmetic is the final Welch expression — written as the
    same left-associative chain of casts/divisions on both the engine
    and SQL sides, so even the doubles hash-match:

        mean  = float(Σx) / float(n)
        v/n   = float(n·Σx² − Σx·Σx) / float(n) / float(n) / float(n−1)
        t     = (mean_a − mean_b) / sqrt(v_a/n_a + v_b/n_b)

    ``welch_t`` is NULL when either arm has <2 observations or both
    variances are zero. Shuffle volume: 6 int64 per (key, arm, batch).
    """
    import math

    def _to_int(col: pa.ChunkedArray, scale: int, name: str) -> np.ndarray:
        v = col.combine_chunks().to_numpy(zero_copy_only=False)
        if v.dtype.kind in "iu":
            out = v.astype(np.int64)
        else:
            f = 10.0**scale
            out = np.round(v.astype(np.float64) * f).astype(np.int64)
            if not np.array_equal(out / f, v.astype(np.float64)):
                raise ValueError(f"{name} is not exact at scale {scale}")
        if np.any(np.abs(out) >= 2**31):
            raise ValueError(f"{name} exceeds 31 bits at scale {scale}")
        return out

    def partials(b: pa.Table) -> pa.Table:
        x = _to_int(b[x_col], x_scale, x_col)
        x2 = x * x
        hi, lo = x2 >> 31, x2 - ((x2 >> 31) << 31)
        t = pa.table(
            {
                key_col: b[key_col],
                "__arm": b[arm_col].cast(pa.int64()),
                "__n": pa.array(np.ones(len(x), np.int64)),
                "__s": pa.array(x),
                "__hi": pa.array(hi),
                "__lo": pa.array(lo),
            }
        )
        g = t.group_by([key_col, "__arm"]).aggregate(
            [("__n", "sum"), ("__s", "sum"), ("__hi", "sum"), ("__lo", "sum")]
        )
        return g.rename_columns([key_col, "__arm", "__n", "__s", "__hi", "__lo"])

    def fold(g: pa.Table) -> pa.Table:
        arm = g["__arm"].combine_chunks().to_numpy(zero_copy_only=False)
        stats = {}
        for a in (0, 1):
            m = arm == a
            n = int(g["__n"].combine_chunks().to_numpy(zero_copy_only=False)[m].sum())
            s = int(g["__s"].combine_chunks().to_numpy(zero_copy_only=False)[m].sum())
            s2 = sum(
                (int(h) << 31) + int(l)
                for h, l in zip(
                    g["__hi"].combine_chunks().to_numpy(zero_copy_only=False)[m],
                    g["__lo"].combine_chunks().to_numpy(zero_copy_only=False)[m],
                )
            )
            stats[a] = (n, s, s2)
        (na, sa, s2a), (nb, sb, s2b) = stats[0], stats[1]
        f = 10.0**x_scale
        mean_a = float(sa) / float(na) / f if na else None
        mean_b = float(sb) / float(nb) / f if nb else None
        t_val = None
        if na >= 2 and nb >= 2:
            von_a = float(na * s2a - sa * sa) / float(na) / float(na) / float(na - 1)
            von_b = float(nb * s2b - sb * sb) / float(nb) / float(nb) / float(nb - 1)
            if von_a + von_b > 0:
                t_val = (float(sa) / float(na) - float(sb) / float(nb)) / math.sqrt(
                    von_a + von_b
                )
        return pa.table(
            {
                key_col: g[key_col].slice(0, 1),
                "n_a": pa.array([na], pa.int64()),
                "n_b": pa.array([nb], pa.int64()),
                "mean_a": pa.array([mean_a], pa.float64()),
                "mean_b": pa.array([mean_b], pa.float64()),
                "welch_t": pa.array([t_val], pa.float64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(fold, batch_format="pyarrow")
    )
