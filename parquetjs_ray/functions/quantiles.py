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

__all__ = [
    "grouped_quantiles",
    "weighted_median_per_group",
    "weighted_quantiles_per_group",
    "ntile_per_group",
    "rank_per_group",
    "winsorize_per_group",
    "mad_outliers_per_group",
]


def grouped_quantiles(
    ds: rd.Dataset,
    quantiles: dict[str, float],
    *,
    key: str = "source",
    value: str = "n_chars",
    interpolated: bool = False,
) -> rd.Dataset:
    """One row per key with a column per requested quantile.

    ``quantiles`` maps output column name → q in (0, 1], e.g.
    ``{"p50": 0.5, "p90": 0.9}``. Values must be integers (the histogram
    is exact). Default: DISCRETE quantiles (SQL ``quantile_disc``,
    element at 1-based position ceil(q·n); int64 columns).
    ``interpolated=True``: SQL ``quantile_cont`` / PERCENTILE_CONT —
    linear interpolation at zero-based rank q·(n−1), replicating the
    standard ``(crn−rn)·v[frn] + (rn−frn)·v[crn]`` float expression
    term-for-term so the doubles hash-match the SQL bit-for-bit."""
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

        def elem(i: int) -> int:  # zero-based element of the sorted multiset
            return int(v[np.searchsorted(cum, i + 1)])

        for name, q in qs:
            if interpolated:
                rn = q * (n - 1)
                frn, crn = int(np.floor(rn)), int(np.ceil(rn))
                if frn == crn:
                    row[name] = float(elem(frn))
                else:
                    row[name] = (crn - rn) * elem(frn) + (rn - frn) * elem(crn)
            else:
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


def trimmed_mean_per_group(
    ds: rd.Dataset,
    *,
    key: str,
    value: str,
    p_num: int = 1,
    p_den: int = 10,
) -> rd.Dataset:
    """EXACT trimmed mean sufficient stats per key: drop the lowest and
    highest ``floor(n·p_num/p_den)`` rows by rank and emit the surviving
    count and sum — the robust location estimate between mean (p=0) and
    median (p→0.5).

    Integer-only (`value` must be integral, like
    :func:`grouped_quantiles`); ``trim_sum`` is folded in Python big
    ints and emitted as a decimal STRING so it stays exact at any corpus
    size (the SQL side casts its HUGEINT sum to VARCHAR). One
    (key, value)-histogram shuffle — kilobyte partials, the corpus never
    moves; the per-key fold walks the sorted histogram and takes each
    distinct value's rank-interval overlap with ``(drop, n−drop]``, so
    cost is bounded by distinct values per key, not rows.

    Output: ``(key, trim_n, trim_sum)``.
    """
    from ray.data.aggregate import Sum

    if not (0 <= 2 * p_num < p_den):
        raise ValueError("trim fraction must satisfy 0 <= 2*p_num/p_den < 1")

    def combine(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch[key], value: batch[value]})
        return t.group_by([key, value]).aggregate([([], "count_all")])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        v = g[value].to_numpy().astype(np.int64)
        c = g["count"].to_numpy().astype(np.int64)
        order = np.argsort(v)
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        n = int(cum[-1])
        drop = n * p_num // p_den
        lo, hi = drop, n - drop
        cumb = cum - c
        take = np.clip(np.minimum(cum, hi) - np.maximum(cumb, lo), 0, None)
        s = int(sum(int(a) * int(b) for a, b in zip(v[take > 0], take[take > 0])))
        return pd.DataFrame(
            [{key: g[key].iloc[0], "trim_n": int(hi - lo), "trim_sum": str(s)}]
        )

    return (
        ds.map_batches(combine, batch_format="pyarrow")
        .groupby([key, value])
        .aggregate(Sum("count_all", alias_name="count"))
        .groupby(key)
        .map_groups(fold, batch_format="pandas")
    )


def weighted_median_per_group(
    ds: rd.Dataset,
    *,
    key: str,
    value: str,
    weight: str,
    scale: int = 100,
) -> rd.Dataset:
    """Exact LOWER weighted median per key → ``(key, wmedian_scaled,
    total_weight)``: the smallest scaled value ``v`` whose cumulative
    weight reaches half the group's total (``2·cum(v) ≥ total`` — pure
    integer comparison, no float halves).

    ``value`` is a decimal-valued float column made exact by
    ``round(value·scale)`` (half-away-from-zero, matching SQL
    ``round()``); ``weight`` must be integral-valued (the cast is safe —
    a fractional weight fails loudly). Hot-key-proof via the module's
    histogram shape: the shuffle carries per-batch ``(key, scaled value)
    → Σweight`` partials, and the per-key group is bounded by the
    DISTINCT VALUE RANGE of the measure (price points), never the key's
    row count."""
    from ray.data.aggregate import Sum

    def combine(batch: pa.Table) -> pa.Table:
        v = pc.round(
            pc.multiply(batch[value], pa.scalar(float(scale))),
            ndigits=0,
            round_mode="half_towards_infinity",
        ).cast(pa.int64())
        w = batch[weight].cast(pa.int64())  # safe cast: fractional -> error
        t = pa.table({key: batch[key], "__v": v, "__w": w})
        return t.group_by([key, "__v"]).aggregate([("__w", "sum")])

    def from_hist(g: pd.DataFrame) -> pd.DataFrame:
        v = g["__v"].to_numpy()
        w = g["__w"].to_numpy()
        order = np.argsort(v)
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        tot = int(cum[-1])
        pick = int(v[np.searchsorted(2 * cum, tot)])
        return pd.DataFrame(
            [{key: g[key].iloc[0], "wmedian_scaled": pick, "total_weight": tot}]
        )

    return (
        ds.select_columns([key, value, weight])
        .map_batches(combine, batch_format="pyarrow")
        .groupby([key, "__v"])
        .aggregate(Sum("__w_sum", alias_name="__w"))
        .groupby(key)
        .map_groups(from_hist, batch_format="pandas")
    )


def weighted_quantiles_per_group(
    ds: rd.Dataset,
    quantiles: dict[str, tuple[int, int]],
    *,
    key: str,
    value: str,
    weight: str,
    scale: int = 100,
) -> rd.Dataset:
    """Exact lower weighted quantiles per key, the general form of
    :func:`weighted_median_per_group`: ``quantiles`` maps output column
    → a RATIONAL q as ``(num, den)`` (e.g. ``{"p25": (1, 4)}``), and
    each pick is the smallest scaled value whose cumulative weight
    satisfies ``den·cum ≥ num·total`` — pure integer comparisons, no
    float q anywhere, so the SQL window replica matches hash-exactly.
    Same histogram scale shape: per-batch (key, scaled value) → Σweight
    partials; per-key groups bounded by the measure's distinct-value
    range."""
    from ray.data.aggregate import Sum

    qs = list(quantiles.items())

    def combine(batch: pa.Table) -> pa.Table:
        v = pc.round(
            pc.multiply(batch[value], pa.scalar(float(scale))),
            ndigits=0,
            round_mode="half_towards_infinity",
        ).cast(pa.int64())
        w = batch[weight].cast(pa.int64())  # safe cast: fractional -> error
        t = pa.table({key: batch[key], "__v": v, "__w": w})
        return t.group_by([key, "__v"]).aggregate([("__w", "sum")])

    def from_hist(g: pd.DataFrame) -> pd.DataFrame:
        v = g["__v"].to_numpy()
        w = g["__w"].to_numpy()
        order = np.argsort(v)
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        tot = int(cum[-1])
        row = {key: g[key].iloc[0], "total_weight": tot}
        for name, (num, den) in qs:
            row[name] = int(v[np.searchsorted(den * cum, num * tot)])
        return pd.DataFrame([row])

    return (
        ds.select_columns([key, value, weight])
        .map_batches(combine, batch_format="pyarrow")
        .groupby([key, "__v"])
        .aggregate(Sum("__w_sum", alias_name="__w"))
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

    if n_tiles <= 0:
        raise ValueError("n_tiles must be positive")

    bundle = _value_hist_bundle(ds, key, value)

    def tiles(g: pa.Table) -> pa.Table:
        uk, comp, cum_before, totals, _, _ = ray.get(bundle)  # zero-copy plasma read
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


def _value_hist_bundle(ds: rd.Dataset, key: str, value: str):
    """Shared first phase of the grouped-window operators: the per-batch
    ``(key, value) → count`` combiner + global pair Sum, assembled in a
    Ray task (off-driver) into sorted composite keys with per-pair
    cumulative offsets, per-key totals and per-key run starts, published
    once to the object store. Returns the ObjectRef of the bundle
    ``(uk, comp, cum_before, totals, key_start, pair_counts)`` where
    ``comp`` packs ``key_index << 32 | value`` (hence ``value`` must be
    in [0, 2^31)) and ``pair_counts[i]`` is the row count of pair
    ``comp[i]`` (lets callers branch on tie-class size without a
    cogroup).
    """
    import ray
    from ray.data.aggregate import Sum

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
            empty = np.array([], np.int64)
            return np.array([], object), empty, empty, empty, empty, empty
        full = pa.concat_tables(tabs).combine_chunks()
        ks = np.asarray(full[key])
        vs = full[value].to_numpy(zero_copy_only=False).astype(np.int64)
        cs = full["count"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(vs) and (vs.min() < 0 or vs.max() >= 1 << 31):
            raise ValueError("grouped window value must be in [0, 2^31)")
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
        key_start = np.searchsorted(kidx_o, np.arange(len(uk)))
        return uk, comp, cum_before, totals, key_start, cs_o

    return _assemble.remote(list(hist.to_arrow_refs()))


def rank_per_group(
    ds: rd.Dataset,
    *,
    key: str = "source",
    value: str = "n_chars",
    id_col: str = "doc_id",
    include_row_number: bool = True,
) -> rd.Dataset:
    """Per-row ``ROW_NUMBER() / RANK() / DENSE_RANK() OVER (PARTITION BY
    key ORDER BY value, id_col)`` — the general grouped-window rank
    family — with the same hot-key-proof two-phase shape as
    :func:`ntile_per_group`: a (key, value) histogram broadcast supplies
    every cross-value offset, and per-row work happens inside TIE
    CLASSES (one ``(key, value)`` pair per group), so no key's full
    history ever materializes in one worker.

    Per tie class with histogram offset ``base`` (rows of this key with
    a smaller value) and in-class id order ``i``:

    - ``row_number`` = base + i + 1  (ties broken by ``id_col``, so it
      is deterministic and reproduces the SQL window exactly);
    - ``rank``       = base + 1      (shared by the whole tie class);
    - ``dense_rank`` = ordinal of this value among the key's distinct
      values — read straight off the class's position in the broadcast
      histogram run;
    - ``percent_rank`` = (rank-1)/(n-1)  and  ``cume_dist`` =
      (base + tie_class_size)/n — each ONE double division of exact
      int64 counts, so even the float columns hash-match the SQL
      windows bit-for-bit.

    Output: ``(id_col, key, value, row_number, rank, dense_rank,
    percent_rank, cume_dist)`` — int64 ranks, float64 fractions,
    bit-identical to the SQL windows. ``value`` must be int64 in
    [0, 2^31) (packed beside the key index for the broadcast lookup).

    Every output EXCEPT ``row_number`` is constant across a tie class —
    a pure broadcast lookup. ``include_row_number=False`` therefore
    skips the tie-class cogroup entirely and resolves all columns in
    ONE stateless vectorized pass (no shuffle beyond the histogram) —
    the right call when per-row tiebreaking isn't needed (percentile
    features, dense ranking), and markedly faster when the (key, value)
    class count is large.
    """
    import ray

    bundle = _value_hist_bundle(ds, key, value)

    if not include_row_number:

        def ranks_stateless(batch: pa.Table) -> pa.Table:
            uk, comp, cum_before, totals, key_start, cs = ray.get(bundle)
            kidx = (
                pc.index_in(batch[key].combine_chunks(), value_set=pa.array(uk))
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )  # uk is np.unique-sorted → index_in position == bundle key index
            v = batch[value].combine_chunks().to_numpy(zero_copy_only=False)
            pos = np.searchsorted(comp, (kidx << 32) | v)
            base = cum_before[pos]
            total = totals[kidx]
            dense = pos - key_start[kidx] + 1
            pr = np.where(total > 1, base / np.maximum(total - 1, 1), 0.0)
            cd = (base + cs[pos]) / total
            return pa.table(
                {
                    id_col: batch[id_col],
                    key: batch[key],
                    value: batch[value],
                    "rank": pa.array(base + 1),
                    "dense_rank": pa.array(dense),
                    "percent_rank": pa.array(pr.astype(np.float64)),
                    "cume_dist": pa.array(cd.astype(np.float64)),
                }
            )

        return ds.select_columns([id_col, key, value]).map_batches(
            ranks_stateless, batch_format="pyarrow"
        )

    def ranks(g: pa.Table) -> pa.Table:
        uk, comp, cum_before, totals, key_start, _ = ray.get(bundle)
        k_val = g[key][0].as_py()
        v_val = int(g[value][0].as_py())
        kidx = int(np.searchsorted(uk, k_val))
        pos = int(np.searchsorted(comp, (kidx << 32) | v_val))
        base = int(cum_before[pos])
        dense = pos - int(key_start[kidx]) + 1
        ids = g[id_col].combine_chunks()
        order = pc.array_sort_indices(ids).to_numpy(zero_copy_only=False)
        rn = np.empty(len(ids), np.int64)
        rn[order] = base + np.arange(1, len(ids) + 1)
        n = len(ids)
        total = int(totals[kidx])
        pr = float(base) / (total - 1) if total > 1 else 0.0
        cd = float(base + n) / total
        return pa.table(
            {
                id_col: g[id_col],
                key: g[key],
                value: g[value],
                "row_number": pa.array(rn),
                "rank": pa.array(np.full(n, base + 1, np.int64)),
                "dense_rank": pa.array(np.full(n, dense, np.int64)),
                "percent_rank": pa.array(np.full(n, pr, np.float64)),
                "cume_dist": pa.array(np.full(n, cd, np.float64)),
            }
        )

    return (
        ds.select_columns([id_col, key, value])
        .groupby([key, value])
        .map_groups(ranks, batch_format="pyarrow")
    )


def winsorize_per_group(
    ds: rd.Dataset,
    *,
    key: str = "source",
    value: str = "n_chars",
    id_col: str = "doc_id",
    q_lo: float = 0.05,
    q_hi: float = 0.95,
    out_col: str = "clipped",
) -> rd.Dataset:
    """Per-group winsorization: clip ``value`` to the group's exact
    [q_lo, q_hi] discrete quantiles (``quantile_disc`` semantics, the
    element at 1-based position ``ceil(q*n)`` of the sorted multiset).

    Two bounded exchanges: the :func:`grouped_quantiles` histogram
    shuffle (distinct (key, value) pairs only) reduced to ONE (lo, hi)
    row per key, broadcast via ``ray.put``; then a stateless
    ``map_batches`` clip over the corpus — the data itself never
    shuffles. Integer in, integer out: results hash-match a SQL oracle
    with no float interpolation.

    Output: ``(id_col, key, value, out_col)``.
    """
    import ray

    bounds_ds = grouped_quantiles(
        ds, {"__lo": q_lo, "__hi": q_hi}, key=key, value=value
    )

    @ray.remote(num_cpus=1)
    def _collect(block_refs: list):
        tabs = [t for t in (ray.get(r) for r in block_refs) if t.num_rows]
        if not tabs:
            return {}
        full = pa.concat_tables(tabs)
        return {
            k: (lo, hi)
            for k, lo, hi in zip(
                np.asarray(full[key]),
                full["__lo"].to_numpy(zero_copy_only=False),
                full["__hi"].to_numpy(zero_copy_only=False),
            )
        }

    bounds_ref = _collect.remote(list(bounds_ds.to_arrow_refs()))

    def clip(batch: pa.Table) -> pa.Table:
        bounds = ray.get(bounds_ref)
        ks = np.asarray(batch[key].combine_chunks())
        v = batch[value].combine_chunks().to_numpy(zero_copy_only=False)
        uk, kidx = np.unique(ks, return_inverse=True)
        lo = np.array([bounds[k][0] for k in uk], np.int64)[kidx]
        hi = np.array([bounds[k][1] for k in uk], np.int64)[kidx]
        out = np.clip(v, lo, hi)
        return pa.table(
            {
                id_col: batch[id_col],
                key: batch[key],
                value: batch[value],
                out_col: pa.array(out.astype(np.int64)),
            }
        )

    return ds.select_columns([id_col, key, value]).map_batches(
        clip, batch_format="pyarrow"
    )


def mad_outliers_per_group(
    ds: rd.Dataset,
    *,
    key: str = "source",
    value: str = "n_chars",
    id_col: str = "doc_id",
    c_num: int = 3,
    c_den: int = 1,
) -> rd.Dataset:
    """Robust per-group outlier flags via the Median Absolute Deviation:
    a row is an outlier when ``|value − median_k| > (c_num/c_den) ·
    MAD_k`` (MAD = median of the group's absolute deviations) — the
    data-quality filter that, unlike mean/stddev z-scores, a few extreme
    rows cannot drag.

    ALL-INTEGER arithmetic (medians are ``quantile_disc`` elements of
    the sorted multiset; the threshold compares ``c_den·dev`` against
    ``c_num·MAD``), so flags hash-match a SQL oracle exactly. Three
    bounded exchanges, the corpus itself never shuffles: the
    :func:`grouped_quantiles` histogram → per-key median broadcast
    (``ray.put``-style tiny dict) → a second histogram over deviations →
    per-key MAD broadcast → one stateless flag pass.

    Output: ``(id_col, key, value, dev, mad, is_outlier)``.
    """
    import ray

    med_ds = grouped_quantiles(ds, {"__med": 0.5}, key=key, value=value)

    @ray.remote(num_cpus=1)
    def _collect(block_refs: list, col: str):
        tabs = [t for t in (ray.get(r) for r in block_refs) if t.num_rows]
        if not tabs:
            return {}
        full = pa.concat_tables(tabs)
        return dict(
            zip(np.asarray(full[key]), full[col].to_numpy(zero_copy_only=False))
        )

    med_ref = _collect.remote(list(med_ds.to_arrow_refs()), "__med")

    def _lookup(ref, ks: np.ndarray) -> np.ndarray:
        table = ray.get(ref)
        uk, kidx = np.unique(ks, return_inverse=True)
        return np.array([table[k] for k in uk], np.int64)[kidx]

    def devs(batch: pa.Table) -> pa.Table:
        ks = np.asarray(batch[key].combine_chunks())
        v = batch[value].combine_chunks().to_numpy(zero_copy_only=False)
        d = np.abs(v - _lookup(med_ref, ks))
        return pa.table({key: batch[key], "__dev": pa.array(d.astype(np.int64))})

    mad_ds = grouped_quantiles(
        ds.select_columns([key, value]).map_batches(devs, batch_format="pyarrow"),
        {"__mad": 0.5},
        key=key,
        value="__dev",
    )
    mad_ref = _collect.remote(list(mad_ds.to_arrow_refs()), "__mad")

    def flag(batch: pa.Table) -> pa.Table:
        ks = np.asarray(batch[key].combine_chunks())
        v = batch[value].combine_chunks().to_numpy(zero_copy_only=False)
        dev = np.abs(v - _lookup(med_ref, ks))
        mad = _lookup(mad_ref, ks)
        return pa.table(
            {
                id_col: batch[id_col],
                key: batch[key],
                value: batch[value],
                "dev": pa.array(dev.astype(np.int64)),
                "mad": pa.array(mad),
                "is_outlier": pa.array(c_den * dev > c_num * mad),
            }
        )

    return ds.select_columns([id_col, key, value]).map_batches(flag, batch_format="pyarrow")


def group_gini(
    ds: rd.Dataset,
    *,
    key: str,
    value: str,
    value_scale: int = 0,
) -> rd.Dataset:
    """Exact Gini coefficient per group (inequality of a non-negative
    measure — revenue concentration, token-count imbalance), as
    ``gini_milli = (1000·Δ) // (2·n·Σx)`` with
    ``Δ = Σᵢⱼ |xᵢ − xⱼ|`` — pure integer arithmetic end to end, so the
    result hash-matches the HUGEINT SQL window formulation bit-for-bit.

    The module's histogram shape: per-batch ``(key, scaled value)``
    count partials (the combiner — rows never shuffle), one Sum
    exchange bounded by distinct values per key, then a per-key fold
    over the value-sorted histogram where Δ folds in one vectorized
    pass via the sorted-pairs identity

        Δ = Σ_v 2·c_v·(v·cum_n_before(v) − cum_sum_before(v))

    accumulated in Python big-ints (no overflow at any corpus size).
    Group size is bounded by the measure's distinct-value range, never
    by row count. Negative values raise (Gini is undefined there).

    → ``(key, n, gini_milli)``; ``gini_milli`` NULL when the group sum
    is zero.
    """
    from ray.data.aggregate import Sum

    f = 10.0**value_scale

    def partials(b: pa.Table) -> pa.Table:
        v = b[value].combine_chunks().to_numpy(zero_copy_only=False)
        if v.dtype.kind in "iu":
            x = v.astype(np.int64)
        else:
            x = np.round(v.astype(np.float64) * f).astype(np.int64)
            if not np.array_equal(x / f, v.astype(np.float64)):
                raise ValueError(f"{value} is not exact at scale {value_scale}")
        if np.any(x < 0):
            raise ValueError("group_gini requires a non-negative measure")
        t = pa.table({key: b[key], "__v": pa.array(x)})
        g = t.group_by([key, "__v"]).aggregate([([], "count_all")])
        return g.rename_columns([key, "__v", "__c"])

    hist = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby([key, "__v"])
        .aggregate(Sum("__c", alias_name="__c"))
    )

    def fold(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g["__v"])
        v = g["__v"].take(order).to_numpy(zero_copy_only=False)
        c = g["__c"].take(order).to_numpy(zero_copy_only=False)
        n = s = delta = cumn = cums = 0
        for vi, ci in zip(v.tolist(), c.tolist()):  # ≤ distinct values
            delta += 2 * ci * (vi * cumn - cums)
            cumn += ci
            cums += ci * vi
        n, s = cumn, cums
        gini = (1000 * delta) // (2 * n * s) if n and s else None
        return pa.table(
            {
                key: g[key].slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "gini_milli": pa.array([gini], pa.int64()),
            }
        )

    return hist.groupby(key).map_groups(fold, batch_format="pyarrow")
