"""Global ordering without a global sort.

``ROW_NUMBER() OVER (ORDER BY value, id)`` across the WHOLE dataset is
the primitive behind sorted-shard layouts, curriculum ordering and
"take the global top p%" cuts — but the naive route (``ds.sort`` then a
driver-side running offset, or one giant group) either materializes the
dataset in order or funnels every row through one worker. Reference
scope: parquetjs sorts nothing (`lib/writer.js` appends in arrival
order); this is a scale-path operator the reference never needed.

The shape here is the same two-phase histogram trick as
:func:`~parquetjs_ray.functions.quantiles.rank_per_group`, with ONE
global key instead of a partition key:

* phase 1: a per-batch ``value → count`` combiner rides a distinct-value
  shuffle (kilobytes — bounded by the value column's cardinality, never
  the row count) into a broadcast cumulative histogram;
* phase 2: a row whose value is UNIQUE resolves its global row number
  statelessly (``rows-before + 1`` read off the broadcast — no shuffle
  at all); only rows in TIED value classes take a cogroup, each group
  bounded by its tie-class size, to order ties by ``id_col``.

So the expensive path is proportional to how tied the order column is,
not to the dataset: shuffle volume is (distinct values) + (rows in tied
classes), and no worker ever holds more than one tie class.

``NTILE(B)`` (equal-count sorted shards — the layout a range-partitioned
writer wants) is pure arithmetic on the row number and the broadcast
total, so it costs nothing extra.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

__all__ = ["global_order"]

_MAXV = (1 << 31) - 1


def _ntile(rn: np.ndarray, n: int, b: int) -> np.ndarray:
    """SQL NTILE(b) from 1-based global row numbers: the first n%b tiles
    get ceil(n/b) rows, the rest floor(n/b)."""
    q, r = divmod(n, b)
    i = rn - 1
    big = r * (q + 1)  # rows covered by the (q+1)-sized tiles
    small = np.maximum(i - big, 0)
    return np.where(i < big, i // max(q + 1, 1), r + small // max(q, 1)) + 1


def global_order(
    ds: rd.Dataset,
    *,
    value: str = "n_chars",
    id_col: str = "doc_id",
    descending: bool = False,
    num_shards: int | None = None,
) -> rd.Dataset:
    """→ ``(id_col, value, row_number[, shard])`` — exact global
    ``ROW_NUMBER() OVER (ORDER BY value [DESC], id_col)`` (ties broken
    ascending by ``id_col``, reproducing the SQL window exactly) and,
    when ``num_shards`` is given, ``shard`` = ``NTILE(num_shards)`` over
    the same order — the equal-count sorted-shard assignment a
    range-partitioned layout writes to.

    ``value`` must be integer in [0, 2^31) (it is packed into the
    histogram composite). ``descending`` flips the order by reflecting
    the value inside the histogram — output still carries the original.
    """
    import ray

    from .quantiles import _value_hist_bundle

    def keyed(batch: pa.Table) -> pa.Table:
        v = batch[value].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        if len(v) and (v.min() < 0 or v.max() > _MAXV):
            raise ValueError(f"{value} must be in [0, 2^31) for global_order")
        return pa.table(
            {
                id_col: batch[id_col],
                value: batch[value],
                "__g": pa.array(np.zeros(len(batch), np.int8)),
                "__v": pa.array((_MAXV - v) if descending else v),
            }
        )

    src = ds.map_batches(keyed, batch_format="pyarrow")
    bundle = _value_hist_bundle(src, "__g", "__v")

    def _lookup(batch: pa.Table):
        _, comp, cum_before, totals, _, cs = ray.get(bundle)
        v = batch["__v"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.searchsorted(comp, v)  # single key → composite == value
        return cum_before[pos], int(totals[0]) if len(totals) else 0, cs[pos]

    def finish(t: pa.Table, rn: np.ndarray, n: int) -> pa.Table:
        cols = {
            id_col: t[id_col],
            value: t[value],
            "row_number": pa.array(rn.astype(np.int64)),
        }
        if num_shards is not None:
            cols["shard"] = pa.array(_ntile(rn, n, num_shards).astype(np.int64))
        return pa.table(cols)

    def solo(batch: pa.Table) -> pa.Table:
        base, n, cnt = _lookup(batch)
        keep = cnt == 1
        return finish(batch, base + 1, n).filter(pa.array(keep))

    def colliding(batch: pa.Table) -> pa.Table:
        _, _, cnt = _lookup(batch)
        return batch.filter(pa.array(cnt > 1))

    def tie_class(g: pa.Table) -> pa.Table:
        base_a, n, _ = _lookup(g.slice(0, 1))
        ids = g[id_col].combine_chunks()
        order = pc.array_sort_indices(ids).to_numpy(zero_copy_only=False)
        rn = np.empty(len(ids), np.int64)
        rn[order] = int(base_a[0]) + np.arange(1, len(ids) + 1)
        return finish(g, rn, n)

    fast = src.map_batches(solo, batch_format="pyarrow")
    ties = (
        src.map_batches(colliding, batch_format="pyarrow")
        .groupby("__v")
        .map_groups(tie_class, batch_format="pyarrow")
    )
    return fast.union(ties)
