"""The flagship pipeline: read_parquet → stats → salted repartition →
actor-pool encode → partition writer → global manifest.

Ray-Data-first lifecycle (SURVEY.md §3.4). Two execution modes:

* ``grouped`` (default, the north rule's shape): a vectorized
  ``map_batches`` stamps every row with a salted partition key
  ``<source>-<hash(doc_id) % k_source>`` where ``k_source`` is sized from
  the sampled source histogram so one hot source (Zipf skew) spreads
  over many partitions; ``groupby(key).map_groups`` then encodes each
  partition. Partition identity == group key → deterministic resume.
* ``sharded`` (no shuffle): encode each incoming batch as its own
  partition, id = content hash of the ``doc_id`` column. Fastest path
  when source-homogeneous chunks aren't required; resume converges only
  if Ray produces the same batching (documented caveat).

Nothing in this module calls ``ray.init`` — the caller owns the session.
"""

from __future__ import annotations

import hashlib
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..arrow_util import string_buffers
from ..stages import stats as stats_mod
from ..stages.decoder import decode_chunk
from ..stages.encoder import EncoderState, encode_table
from ..stages.writer import (
    partition_done,
    read_global_manifest,
    write_global_manifest,
    write_partition,
)
from ..state.artifacts import EncodePlan, load_plan, save_plan

__all__ = ["encode_dataset", "decode_dataset", "salted_keys"]

_U = np.uint64
_STATE_CACHE: dict[bytes, EncoderState] = {}


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> _U(30))) * _U(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U(27))) * _U(0x94D049BB133111EB)
    return x ^ (x >> _U(31))


def hash_strings(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit hash per string: first/last 8 bytes + length, mixed."""
    n = len(offsets) - 1
    lens = np.diff(offsets)
    padded = np.zeros(len(data) + 8, dtype=np.uint8)
    padded[: len(data)] = data
    first = np.zeros(n, dtype=np.uint64)
    last = np.zeros(n, dtype=np.uint64)
    starts = offsets[:-1]
    ends = np.maximum(offsets[1:] - 8, starts)
    for i in range(8):
        b = padded[starts + i].astype(np.uint64)
        first |= np.where(i < lens, b, 0).astype(np.uint64) << _U(8 * i)
        b2 = padded[ends + i].astype(np.uint64)
        last |= np.where(i < (offsets[1:] - ends), b2, 0).astype(np.uint64) << _U(8 * i)
    return _mix64(first * _U(0x9E3779B97F4A7C15) ^ _mix64(last) ^ lens.astype(np.uint64))


def salted_keys(batch: pa.Table, salt_per_source: dict[str, int]) -> pa.Table:
    """Stamp the salted partition key (vectorized; no Python per row)."""
    data, offsets = string_buffers(batch.column("doc_id"))
    h = hash_strings(data, offsets)
    src = batch.column("source").combine_chunks() if isinstance(batch.column("source"), pa.ChunkedArray) else batch.column("source")
    src_d = src.dictionary_encode()
    dict_vals = src_d.dictionary.to_pylist()
    k_arr = np.array([max(1, salt_per_source.get(s, 1)) for s in dict_vals], dtype=np.uint64)
    idx = src_d.indices.to_numpy(zero_copy_only=False)
    salts = (h % k_arr[idx]).astype(np.int64)
    # key = "<source>-<salt:05d>"
    keys = pa.compute.binary_join_element_wise(
        src.cast(pa.string()),
        pa.array(np.char.zfill(salts.astype("U5"), 5).tolist(), type=pa.string()),
        "-",
    )
    return batch.append_column("__part", keys)


def _get_state(plan_ref) -> EncoderState:
    key = plan_ref.binary() if hasattr(plan_ref, "binary") else bytes(str(id(plan_ref)), "ascii")
    st = _STATE_CACHE.get(key)
    if st is None:
        st = EncoderState(ray.get(plan_ref))
        _STATE_CACHE[key] = st
    return st


def _content_part_id(batch: pa.Table) -> str:
    ids = batch.column("doc_id")
    h = hashlib.sha1()
    h.update(str(batch.num_rows).encode())
    h.update(str(ids[0].as_py()).encode())
    h.update(str(ids[-1].as_py()).encode())
    return h.hexdigest()[:16]


def _encode_and_write(batch: pa.Table, part_id: str, state: EncoderState, out_dir: str) -> dict:
    if partition_done(out_dir, part_id):  # resume: skip finished partitions
        import json

        with open(os.path.join(out_dir, f"part-{part_id}", "manifest.json")) as f:
            m = json.load(f)
        return {
            "partition": part_id,
            "rows": m["rows"],
            "raw_bytes": m["raw_bytes"],
            "enc_bytes": m["enc_bytes"],
            "skipped": True,
        }
    chunk, manifest = encode_table(batch, state)
    return write_partition(out_dir, part_id, chunk, manifest)


class EncoderActor:
    """Actor-pool stage for sharded mode: plan fetched once per actor."""

    def __init__(self, plan_ref, out_dir: str):
        self.state = EncoderState(ray.get(plan_ref))
        self.out_dir = out_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        row = _encode_and_write(batch, _content_part_id(batch), self.state, self.out_dir)
        return pa.Table.from_pylist([row])


def _input_row_count(paths: list[str]) -> int:
    return sum(pq.ParquetFile(p).metadata.num_rows for p in paths)


def _resolve_paths(paths: str | list[str]) -> list[str]:
    if isinstance(paths, str):
        if os.path.isdir(paths):
            return sorted(
                os.path.join(paths, f) for f in os.listdir(paths) if f.endswith(".parquet")
            )
        return [paths]
    return list(paths)


def encode_dataset(
    input_paths: str | list[str],
    out_dir: str,
    *,
    mode: str = "grouped",
    target_rows_per_partition: int = 65_536,
    sample_rows: int = 100_000,
    plan: EncodePlan | None = None,
    concurrency: int | tuple[int, int] | None = None,
) -> dict:
    """Run the full encode pipeline; returns the report (totals + ratios)."""
    paths = _resolve_paths(input_paths)
    os.makedirs(out_dir, exist_ok=True)

    # ── sampling pass → plan (reuse a persisted plan when resuming) ──
    if plan is None:
        plan_path = os.path.join(out_dir, "_artifacts", "plan.json")
        if os.path.exists(plan_path):
            plan = load_plan(out_dir)
        else:
            plan = stats_mod.build_plan(paths, sample_rows=sample_rows)
            save_plan(plan, out_dir)
    plan_ref = ray.put(plan)

    ds = rd.read_parquet(paths)

    if mode == "grouped":
        # size salts from the sampled source histogram + exact total row count
        # (parquet metadata only — no data read). A hot Zipf source gets a
        # proportionally larger salt space so no partition exceeds the target.
        total_rows = _input_row_count(paths)
        hist = plan.source_hist or {s: 1 for s in plan.source_dict} or {"": 1}
        tot = sum(hist.values())
        salt_per_source = {
            s: max(1, math.ceil((c / tot) * total_rows / target_rows_per_partition))
            for s, c in hist.items()
        }
        out_dir_local = out_dir

        def stamp(batch: pa.Table) -> pa.Table:
            return salted_keys(batch, salt_per_source)

        def encode_group(group: pa.Table) -> pa.Table:
            part_id = group.column("__part")[0].as_py()
            state = _get_state(plan_ref)
            row = _encode_and_write(group.drop_columns(["__part"]), part_id, state, out_dir_local)
            return pa.Table.from_pylist([row])

        manifest_ds = (
            ds.map_batches(stamp, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(encode_group, batch_format="pyarrow")
        )
    elif mode == "sharded":
        manifest_ds = ds.map_batches(
            EncoderActor,
            batch_format="pyarrow",
            batch_size=target_rows_per_partition,
            zero_copy_batch=True,
            concurrency=concurrency or (2, 8),
            fn_constructor_kwargs={"plan_ref": plan_ref, "out_dir": out_dir},
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")

    partitions = manifest_ds.take_all()  # small: one row per partition
    path = write_global_manifest(out_dir, partitions, extra={"mode": mode})
    totals = read_global_manifest(out_dir)["totals"]
    totals["n_partitions"] = len(partitions)
    totals["resumed_partitions"] = sum(1 for p in partitions if p.get("skipped"))
    totals["ratio"] = totals["enc_bytes"] / max(1, totals["raw_bytes"])
    totals["manifest"] = path
    return totals


class DecoderActor:
    """Decode stage: loads the persisted plan once per actor."""

    def __init__(self, out_dir: str):
        self.state = EncoderState(load_plan(out_dir))
        self.out_dir = out_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        tables = []
        for part_id in batch.column("partition").to_pylist():
            pdir = os.path.join(self.out_dir, f"part-{part_id}")
            with open(os.path.join(pdir, "manifest.json")) as f:
                manifest = json.load(f)
            with open(os.path.join(pdir, "chunk.bin"), "rb") as f:
                chunk = f.read()
            tables.append(decode_chunk(chunk, manifest, self.state))
        return pa.concat_tables(tables)


def decode_dataset(out_dir: str, *, concurrency: int | tuple[int, int] = (2, 8)) -> rd.Dataset:
    """Stream the encoded artifact back as a Dataset of the original schema."""
    manifest = read_global_manifest(out_dir)
    parts = [{"partition": p["partition"]} for p in manifest["partitions"]]
    return rd.from_items(parts).map_batches(
        DecoderActor,
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency,
        fn_constructor_kwargs={"out_dir": out_dir},
    )
