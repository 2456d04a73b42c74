"""Change data feed between artifact snapshots (the Delta/Iceberg CDF
idea): what rows did version ``v_from`` → ``v_to`` insert and delete?

Fragments are immutable by construction — every mutation (append,
delete_rows, upsert_rows, resume) REPLACES fragments and cuts a
snapshot — so the fragment-set diff between two snapshots is exact and
costs one metadata read. Only the rows of CHANGED fragments are
decoded; a delete that rewrote a fragment re-emits its surviving rows
on both sides, so a multiset row-hash cancellation (hash-bucketed,
vectorized — no per-row groups) reduces the feed to the true inserts
and deletes. At corpus scale the feed costs O(changed fragments), not
O(table).

Works as long as the chunks both snapshots reference still exist —
i.e. until :func:`parquetjs_ray.pipelines.encode.vacuum` prunes the
older snapshot (same lifetime as time travel).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..stages.writer import list_snapshots, read_global_manifest, read_snapshot

__all__ = ["table_changes"]

_N_BUCKETS = 64


def table_changes(out_dir: str, v_from: int, v_to: int | None = None) -> rd.Dataset:
    """Row-level change feed ``v_from`` → ``v_to`` (default: newest).

    Returns a Dataset of the artifact's schema plus ``_change_type``
    ("insert" | "delete"). Multiset semantics: if k identical copies of
    a row were added net, the feed carries k "insert" rows. A fragment
    rewrite's surviving rows cancel exactly (they appear on both sides
    with equal row hashes); cancellation is 64-bit-hash-based, the same
    fidelity as the engine's round-trip fingerprints."""
    from .encode import _decode_units

    versions = list_snapshots(out_dir)
    if v_to is None:
        if not versions:
            raise FileNotFoundError(f"no snapshots in {out_dir}")
        v_to = versions[-1]
    frags_a = {p["partition"]: p["fragments"] for p in read_snapshot(out_dir, v_from)["partitions"]}
    frags_b = {p["partition"]: p["fragments"] for p in read_snapshot(out_dir, v_to)["partitions"]}
    if any(f is None for f in list(frags_a.values()) + list(frags_b.values())):
        raise NotImplementedError(
            "table_changes supports files-mode fragment partitions only (consolidated "
            "grouped/sharded/compacted partitions do not snapshot per-fragment)"
        )
    units = []
    for pid in sorted(set(frags_a) | set(frags_b)):
        a, b = set(frags_a.get(pid) or ()), set(frags_b.get(pid) or ())
        units += [{"partition": pid, "fragment": f, "__sgn": -1} for f in sorted(a - b)]
        units += [{"partition": pid, "fragment": f, "__sgn": 1} for f in sorted(b - a)]
    if not units:
        return rd.from_items([])
    schema_b64 = read_global_manifest(out_dir).get("schema_b64")

    def dec(batch: pa.Table) -> pa.Table:
        out = []
        for sgn in (-1, 1):
            sub = batch.filter(pc.equal(batch["__sgn"], sgn))
            if not sub.num_rows:
                continue
            t = _decode_units(
                sub.select(["partition", "fragment"]), out_dir, schema_b64=schema_b64
            )
            out.append(t.append_column("__sgn", pa.array([sgn] * t.num_rows, pa.int8())))
        return pa.concat_tables(out)  # every unit batch is non-empty

    def stamp(batch: pa.Table) -> pa.Table:
        from .verify import row_hashes

        sgn = batch["__sgn"]
        body = batch.drop_columns(["__sgn"])
        h = row_hashes(body)
        return (
            body.append_column("__sgn", sgn)
            .append_column("__h", pa.array(h.view(np.int64)))
            .append_column("__b", pa.array((h % np.uint64(_N_BUCKETS)).astype(np.int64)))
        )

    def cancel(group: pa.Table) -> pa.Table:
        h = group.column("__h").to_numpy(zero_copy_only=False)
        sgn = group.column("__sgn").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((sgn, h))  # within a hash run: deletes first, inserts last
        hs = h[order]
        starts = np.flatnonzero(np.concatenate(([True], hs[1:] != hs[:-1])))
        ends = np.concatenate((starts[1:], [len(hs)]))
        net = np.add.reduceat(sgn[order], starts)
        # net>0 → take the last `net` rows of the run (inserts); net<0 →
        # the first |net| (deletes); net==0 → fully cancelled
        take_n = np.abs(net)
        run_from = np.where(net >= 0, ends - take_n, starts)
        total = int(take_n.sum())
        if total == 0:
            out = group.slice(0, 0)
        else:
            within = np.arange(total, dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(take_n)[:-1])), take_n
            )
            idx = order[np.repeat(run_from, take_n) + within]
            out = group.take(pa.array(idx))
        kind = pc.if_else(
            pc.greater(out["__sgn"], 0), pa.scalar("insert"), pa.scalar("delete")
        )
        return out.drop_columns(["__sgn", "__h", "__b"]).append_column("_change_type", kind)

    union = (
        rd.from_items(units, override_num_blocks=max(1, len(units)))
        .map_batches(dec, batch_format="pyarrow", batch_size=4)
        .map_batches(stamp, batch_format="pyarrow")
    )
    return union.groupby("__b").map_groups(cancel, batch_format="pyarrow")
