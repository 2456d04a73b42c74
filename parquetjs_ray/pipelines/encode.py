"""The flagship pipeline: read_parquet → stats → salted repartition →
actor-pool encode → partition writer → global manifest.

Ray-Data-first lifecycle (SURVEY.md §3.4). Execution modes:

* ``files`` (default — the 100 TB shape): one task per input file, NO
  data shuffle; each task splits its rows by the salted partition key
  and writes key-homogeneous fragments named by (file index, row-group
  range) — fully deterministic resume, only kilobyte metadata rows flow
  to the driver. Encoding is per-row-group work, so moving every token
  byte through a groupby buys nothing at scale.
* ``grouped`` (opt-in, the north rule's explicit-shuffle shape): a
  vectorized ``map_batches`` stamps every row with a salted partition
  key ``<source>-<hash(doc_id) % k_source>`` where ``k_source`` is sized
  from the sampled source histogram so one hot source (Zipf skew)
  spreads over many partitions; ``groupby(key).map_groups`` then encodes
  each partition into ONE consolidated chunk. Partition identity ==
  group key → deterministic resume. Use when consumers need each
  partition in a single chunk (or run files mode + compact_dataset).
* ``sharded`` (no shuffle): encode each incoming batch as its own
  partition, id = content hash of the ``doc_id`` column. Fastest path
  when source-homogeneous chunks aren't required; resume converges only
  if Ray produces the same batching (documented caveat).

Nothing in this module calls ``ray.init`` — the caller owns the session.
"""

from __future__ import annotations

import hashlib
import json
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from .. import storage as st
from ..arrow_util import string_buffers
from ..stages import stats as stats_mod
from ..stages.decoder import decode_chunk
from ..stages.encoder import EncoderState, encode_table
from ..stages.writer import (
    decompress_chunk,
    fragment_done,
    load_fragment_summaries,
    partition_done,
    read_global_manifest,
    write_fragment,
    write_global_manifest,
    write_partition,
    write_partition_manifests,
)
from ..state.artifacts import EncodePlan, load_plan, save_plan

__all__ = ["encode_dataset", "encode_stream", "decode_dataset", "compact_dataset", "dataset_info", "salted_keys"]

_U = np.uint64
_STATE_CACHE: dict[bytes, EncoderState] = {}


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> _U(30))) * _U(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U(27))) * _U(0x94D049BB133111EB)
    return x ^ (x >> _U(31))


def _id_hashes(ids: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized 64-bit hash of an id column of ANY hashable type:
    string/binary via the utf8 buffers, fixed-width (int/uint/float/
    temporal) via a mix of the raw values — salting must not assume
    string ids (e.g. ``vec_id`` int64 tables)."""
    ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    t = ids.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        data, offsets = string_buffers(ids)
        return hash_strings(data, offsets)
    vals = ids.fill_null(0) if ids.null_count else ids
    raw = np.ascontiguousarray(vals.to_numpy(zero_copy_only=False))
    if raw.dtype.itemsize == 8:
        w = raw.view(np.uint64)
    else:
        w = raw.astype(np.int64, copy=False).view(np.uint64)
    # pure function of the VALUE (no batch-dependent terms): resume must
    # re-derive identical salts however the rows are re-batched
    return _mix64(w * _U(0x9E3779B97F4A7C15))


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


def salted_keys(
    batch: pa.Table,
    salt_per_source: dict[str, int],
    *,
    id_col: str = "doc_id",
    source_col: str | None = "source",
) -> pa.Table:
    """Stamp the salted partition key (vectorized; no Python per row).

    With ``source_col=None`` (tables without a grouping column) the key
    is a pure hash bucket ``all-<salt>``."""
    h = _id_hashes(batch.column(id_col))
    if source_col is None:
        k = max(1, salt_per_source.get("", 1))
        salts = (h % np.uint64(k)).astype(np.int64)
        keys = pa.compute.binary_join_element_wise(
            pa.array(["all"] * batch.num_rows, pa.string()),
            pa.array(np.char.zfill(salts.astype("U20"), 5).tolist(), type=pa.string()),
            "-",
        )
        return batch.append_column("__part", keys)
    src = batch.column(source_col).combine_chunks() if isinstance(batch.column(source_col), pa.ChunkedArray) else batch.column(source_col)
    src_d = src.dictionary_encode()
    dict_vals = src_d.dictionary.to_pylist()
    k_arr = np.array([max(1, salt_per_source.get(s, 1)) for s in dict_vals], dtype=np.uint64)
    idx = src_d.indices.to_numpy(zero_copy_only=False)
    salts = (h % k_arr[idx]).astype(np.int64)
    # key = "<source>-<salt:05d>"
    keys = pa.compute.binary_join_element_wise(
        src.cast(pa.string()),
        pa.array(np.char.zfill(salts.astype("U20"), 5).tolist(), type=pa.string()),
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


def _open_parquet(path: str) -> pq.ParquetFile:
    """ParquetFile over any storage backend (local path or URI)."""
    f, p = st.get_fs(path)
    return pq.ParquetFile(f.open_input_file(p))


def _content_part_id(batch: pa.Table, id_col: str = "doc_id") -> str:
    """Content hash over the FULL id column (not just endpoints): two
    distinct batches must never silently alias to one resume part-id.

    Handles string/binary ids via the raw utf8 buffers and any
    fixed-width id column (int*, uint*, float*, temporal) via its value
    buffer — sharded mode and ``encode_stream`` accept e.g. ``vec_id``
    int64 ids, not only string ``doc_id``s."""
    ids = batch.column(id_col)
    ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    h = hashlib.sha1()
    h.update(str(batch.num_rows).encode())
    h.update(str(ids.type).encode())
    if pa.types.is_string(ids.type) or pa.types.is_large_string(ids.type) or pa.types.is_binary(
        ids.type
    ) or pa.types.is_large_binary(ids.type):
        data, offsets = string_buffers(ids)
        h.update(offsets.tobytes())
        h.update(data.tobytes())
    else:
        # fixed-width: hash the values (nulls become a fixed sentinel) +
        # the validity mask so null placement is part of the identity
        vals = ids.fill_null(0) if ids.null_count else ids
        h.update(np.ascontiguousarray(vals.to_numpy(zero_copy_only=False)).tobytes())
        if ids.null_count:
            h.update(np.asarray(pa.compute.is_null(ids)).tobytes())
    return h.hexdigest()[:16]


def _fingerprint_into(manifest: dict, batch: pa.Table) -> None:
    """Record the batch's multiset row fingerprint in the manifest —
    decode-time verification then needs NO re-scan of the original
    corpus (the parquet column-statistics idea applied to row content)."""
    from .verify import row_hashes

    h = row_hashes(batch)
    manifest["fp_rows"] = int(len(h))
    manifest["fp_hash_sum"] = int(h.sum(dtype="uint64"))


def _encode_and_write(
    batch: pa.Table, part_id: str, state: EncoderState, out_dir: str,
    compression: str | None = None, row_fingerprint: bool = False,
) -> dict:
    if partition_done(out_dir, part_id):  # resume: skip finished partitions
        m = st.read_json(st.join(out_dir, f"part-{part_id}", "manifest.json"))
        return {
            "partition": part_id,
            "rows": m["rows"],
            "n_tokens": m.get("columns", {}).get("tokens", {}).get("n_values", 0),
            "raw_bytes": m["raw_bytes"],
            "enc_bytes": m["enc_bytes"],
            "skipped": True,
        }
    chunk, manifest = encode_table(batch, state)
    if row_fingerprint:
        _fingerprint_into(manifest, batch)
    return write_partition(out_dir, part_id, chunk, manifest, compression=compression)


class EncoderActor:
    """Actor-pool stage for streamed encodes: plan fetched once per actor.

    ``layout="sharded"`` (default) writes one consolidated ``chunk.bin``
    per content-hashed partition; ``layout="files"`` writes the same
    batch as a files-mode FRAGMENT (``part-u<hash>/frag-000000``), which
    makes the streamed artifact a first-class mutable table — delete /
    upsert / snapshots-with-fragments / CDC / restore all operate on
    fragment partitions."""

    def __init__(self, plan_ref, out_dir: str, id_col: str = "doc_id", compression: str | None = None,
                 row_fingerprint: bool = False, layout: str = "sharded"):
        self.state = EncoderState(ray.get(plan_ref))
        self.out_dir = out_dir
        self.id_col = id_col
        self.compression = compression
        self.row_fingerprint = row_fingerprint
        self.layout = layout

    def __call__(self, batch: pa.Table) -> pa.Table:
        part_id = _content_part_id(batch, self.id_col)
        if self.layout == "files":
            import pyarrow.compute as pc

            from ..stages.writer import write_fragment

            stored = batch.combine_chunks()
            chunk, manifest = encode_table(stored, self.state)
            if self.row_fingerprint:
                _fingerprint_into(manifest, stored)
            ids = stored.column(self.id_col)
            manifest["id_min"] = pc.min(ids).as_py()
            manifest["id_max"] = pc.max(ids).as_py()
            row = write_fragment(
                self.out_dir, "u" + part_id, "000000", chunk, manifest,
                compression=self.compression,
            )
        else:
            row = _encode_and_write(
                batch, part_id, self.state, self.out_dir,
                compression=self.compression, row_fingerprint=self.row_fingerprint,
            )
        return pa.Table.from_pylist([row])


def split_by_key(stamped: pa.Table, key_col: str = "__part") -> list[tuple[str, pa.Table]]:
    """Split a batch into key-homogeneous sub-tables (one stable-sort take).

    Vectorized: dictionary-encode the key column, stable-argsort the
    codes, one ``take``, then zero-copy slices at the code boundaries."""
    keys = stamped.column(key_col)
    keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    denc = keys.dictionary_encode()
    idx = denc.indices.to_numpy(zero_copy_only=False)
    kvals = denc.dictionary.to_pylist()
    if len(kvals) <= 1:
        return [(kvals[0], stamped)] if kvals else []
    order = np.argsort(idx, kind="stable")
    sorted_tbl = stamped.take(pa.array(order))
    bounds = np.searchsorted(idx[order], np.arange(len(kvals) + 1))
    return [
        (kvals[k], sorted_tbl.slice(int(bounds[k]), int(bounds[k + 1] - bounds[k])))
        for k in range(len(kvals))
        if bounds[k + 1] > bounds[k]
    ]


_MAX_ROWGROUPS_PER_UNIT = 8  # bound per-task memory: never read a whole big file


def _encode_one_file(
    path: str, file_idx: int, plan_ref, salt_per_source: dict[str, int], out_dir: str,
    id_col: str = "doc_id", source_col: str | None = "source",
    compression: str | None = None, row_fingerprint: bool = False,
    unit_rows: int | None = None,
) -> list[dict]:
    """files-mode task body: stream one input file ROW-GROUP-wise, split
    each unit by salted key, write fragments ``(key, file_idx, rg_range)``.

    Per-unit memory is bounded by ``_MAX_ROWGROUPS_PER_UNIT`` row groups —
    a multi-GB input file never has to fit in a worker's heap. Fragment
    ids stay deterministic (file index + row-group range), preserving
    exact-recompute resume.

    ``unit_rows`` additionally slices any unit bigger than that many rows
    into contiguous row ranges BEFORE the key split, so the upstream
    writer's row-group layout never dictates fragment granularity: a file
    with one giant row group still yields bounded fragments whose zone
    maps stay narrow on ingest-ordered columns (time-series pruning).
    Slice ids are deterministic (``s{j}`` suffix) — resume contract holds
    for reruns with the same ``unit_rows``."""
    state = _get_state(plan_ref)
    pf = _open_parquet(path)
    n_rg = pf.metadata.num_row_groups
    rows = []
    for rg0 in range(0, n_rg, _MAX_ROWGROUPS_PER_UNIT):
        rgs = list(range(rg0, min(rg0 + _MAX_ROWGROUPS_PER_UNIT, n_rg)))
        base_frag = f"{file_idx:06d}" if n_rg <= _MAX_ROWGROUPS_PER_UNIT else f"{file_idx:06d}r{rg0:04d}"
        tbl = pf.read_row_groups(rgs)
        if unit_rows and tbl.num_rows > unit_rows:
            units = [
                (f"{base_frag}s{j:04d}", tbl.slice(j * unit_rows, unit_rows))
                for j in range(math.ceil(tbl.num_rows / unit_rows))
            ]
        else:
            units = [(base_frag, tbl)]
        for frag_id, utbl in units:
            stamped = salted_keys(utbl, salt_per_source, id_col=id_col, source_col=source_col)
            for key, sub in split_by_key(stamped):
                if fragment_done(out_dir, key, frag_id):
                    continue  # summary recovered from disk by the resume sweep
                stored = sub.drop_columns(["__part"]).combine_chunks()
                chunk, manifest = encode_table(stored, state)
                if row_fingerprint:
                    _fingerprint_into(manifest, stored)
                ids = sub.column(id_col)
                # per-fragment id min/max: the parquet row-group-stats analogue,
                # drives fragment pruning in decode_dataset(id_range=...)
                manifest["id_min"] = pa.compute.min(ids).as_py()
                manifest["id_max"] = pa.compute.max(ids).as_py()
                rows.append(write_fragment(out_dir, key, frag_id, chunk, manifest, compression=compression))
    return rows


_SUMMARY_SCHEMA = pa.schema(
    [
        ("partition", pa.string()),
        ("fragment", pa.string()),
        ("rows", pa.int64()),
        ("n_tokens", pa.int64()),
        ("raw_bytes", pa.int64()),
        ("enc_bytes", pa.int64()),
        ("skipped", pa.bool_()),
    ]
)


def _run_files_mode(
    paths: list[str], out_dir: str, plan_ref, salt_per_source: dict[str, int],
    *, id_col: str = "doc_id", source_col: str | None = "source",
    compression: str | None = None, user_metadata: dict | None = None,
    row_fingerprint: bool = False, unit_rows: int | None = None,
) -> dict:
    """files mode: one task per input file, NO data shuffle.

    Each task splits its file by the salted key and writes
    key-homogeneous fragments named by the file index — fully
    deterministic, so resume recomputes exactly the missing fragments.
    Only kilobyte fragment-metadata rows flow back to the driver. This
    is the default at scale: encoding is per-row-group work, so moving
    every token byte through a groupby (an all-to-all exchange of the
    whole corpus) buys nothing; the salted ``grouped`` mode remains for
    pipelines that need each partition consolidated into one chunk."""
    items = [{"path": p, "file_idx": i} for i, p in enumerate(paths)]

    def encode_files(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for path, fidx in zip(batch.column("path").to_pylist(), batch.column("file_idx").to_pylist()):
            rows.extend(
                _encode_one_file(
                    path, int(fidx), plan_ref, salt_per_source, out_dir,
                    id_col=id_col, source_col=source_col, compression=compression,
                    row_fingerprint=row_fingerprint, unit_rows=unit_rows,
                )
            )
        return pa.Table.from_pylist(rows, schema=_SUMMARY_SCHEMA)

    fresh = (
        rd.from_items(items)
        .map_batches(encode_files, batch_size=1, batch_format="pyarrow")
        .take_all()
    )
    # authoritative sweep of committed fragments (covers resumed ones too);
    # compacted partitions (single consolidated chunk) pass through untouched
    fragments: list[dict] = []
    compacted_rows: list[dict] = []
    for name in st.list_names(out_dir):
        if not name.startswith("part-"):
            continue
        pid = name[len("part-") :]
        pdir = st.join(out_dir, name)
        mpath = st.join(pdir, "manifest.json")
        if st.exists(mpath):
            pm = st.read_json(mpath)
            if "source_fragments" in pm:
                compacted_rows.append(
                    {
                        "partition": pid,
                        "rows": pm["rows"],
                        "n_tokens": pm.get("n_tokens", 0),
                        "raw_bytes": pm["raw_bytes"],
                        "enc_bytes": pm["enc_bytes"],
                    }
                )
                continue
        fragments.extend(load_fragment_summaries(out_dir, pid))
    extra = {"mode": "files", "schema_b64": _schema_blob(paths)}
    if user_metadata:
        extra["user_metadata"] = user_metadata
    path = write_partition_manifests(out_dir, fragments, extra=extra, extra_partitions=compacted_rows)
    totals = dict(read_global_manifest(out_dir)["totals"])
    totals["n_partitions"] = len({f["partition"] for f in fragments}) + len(compacted_rows)
    totals["n_fragments"] = len(fragments)
    totals["resumed_fragments"] = len(fragments) - sum(1 for r in fresh if not r["skipped"])
    totals["resumed_partitions"] = 0
    totals["ratio"] = totals["enc_bytes"] / max(1, totals["raw_bytes"])
    totals["manifest"] = path
    return totals


def _schema_blob(paths: list[str]) -> str:
    """Serialized UNION schema over all input files (footer metadata only).

    Appends may evolve the schema by adding or dropping columns between
    files; the manifest records the name-based union so decode can align
    every fragment to one target (missing columns decode as nulls).
    Conflicting types for the same name raise — type evolution is not
    silently coerced."""
    import base64

    schemas = [_open_parquet(p).schema_arrow for p in paths]
    uni = pa.unify_schemas(schemas) if len(schemas) > 1 else schemas[0]
    return base64.b64encode(uni.serialize().to_pybytes()).decode()


def dataset_info(out_dir: str) -> dict:
    """Metadata accessors over an encoded artifact — the reference's
    getRowCount/getSchema/getMetadata (`/root/reference/lib/reader.js:150-171`),
    answered from the global manifest without touching chunk data."""
    import base64

    gm = read_global_manifest(out_dir)
    schema = None
    if gm.get("schema_b64"):
        schema = pa.ipc.read_schema(pa.BufferReader(base64.b64decode(gm["schema_b64"])))
    return {
        "row_count": gm["totals"]["rows"],
        "n_tokens": gm["totals"].get("n_tokens", 0),
        "schema": schema,
        "user_metadata": gm.get("user_metadata", {}),
        "mode": gm.get("mode"),
        "n_partitions": len(gm["partitions"]),
        "raw_bytes": gm["totals"]["raw_bytes"],
        "enc_bytes": gm["totals"]["enc_bytes"],
    }


def _input_row_count(paths: list[str]) -> int:
    return sum(_open_parquet(p).metadata.num_rows for p in paths)


def _resolve_paths(paths: str | list[str]) -> list[str]:
    if isinstance(paths, str):
        if "://" in paths:
            names = [n for n in st.list_names(paths) if n.endswith(".parquet")]
            return [st.join(paths, n) for n in names] if names else [paths]
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
    mode: str = "files",
    target_rows_per_partition: int = 16_384,
    sample_rows: int = 100_000,
    plan: EncodePlan | None = None,
    concurrency: int | tuple[int, int] | None = None,
    id_col: str = "doc_id",
    source_col: str | None = "source",
    compression: str | None = None,
    user_metadata: dict | None = None,
    row_fingerprint: bool = False,
    unit_rows: int | None = None,
    bloom_columns: list[str] | None = None,
    profile: str | None = None,
) -> dict:
    """Run the full encode pipeline; returns the report (totals + ratios).

    ``profile`` picks the codec speed/size tradeoff: ``"fast"`` never
    selects the multi-pass vpack codec (maximum encode/decode
    throughput), ``"balanced"`` (default) requires a ≥10% size win,
    ``"small"`` takes any win. Persisted in the plan artifact so resume
    keeps the original choice; decode reads per-chunk manifests, so
    artifacts with mixed profiles still decode exactly.

    ``bloom_columns`` opts columns into per-chunk Bloom filters (stored
    in the fragment manifests, ~1–16 KiB each) so
    ``decode_dataset(where=[(col, "==", v)])`` can skip fragments that
    provably don't contain ``v`` — the point-lookup complement to zone
    maps for high-cardinality unordered columns.  The choice persists in
    the plan artifact; a resumed run keeps the original artifact's list.

    ``unit_rows`` (files mode) caps rows per encode unit: units bigger
    than this are sliced into contiguous row ranges before the key
    split, bounding fragment size independently of the upstream
    row-group layout and keeping zone maps narrow on ingest-ordered
    columns (see :func:`_encode_one_file`).

    ``row_fingerprint=True`` additionally records each unit's multiset
    row fingerprint (count + 64-bit hash sum) in its manifest, enabling
    :func:`parquetjs_ray.pipelines.verify.verify_artifact` to check a
    decode against the artifact itself — no re-scan of the original
    corpus at verification time.

    ``compression`` applies a general-purpose codec (zstd/gzip/snappy/
    lz4/brotli) over each chunk AFTER the lightweight codecs — the
    reference's GZIP/SNAPPY/BROTLI option; default UNCOMPRESSED keeps the
    reference size comparison honest. ``user_metadata`` lands in the
    global manifest (the reference's setMetadata footer KV)."""
    paths = _resolve_paths(input_paths)
    st.makedirs(out_dir)

    # ── sampling pass → plan (reuse a persisted plan when resuming) ──
    if plan is None:
        plan_path = st.join(out_dir, "_artifacts", "plan.json")
        if st.exists(plan_path):
            plan = load_plan(out_dir)
        else:
            plan = stats_mod.build_plan(
                paths,
                sample_rows=sample_rows,
                fsst_columns=(id_col,),
                dict_columns=(source_col,) if source_col else (),
            )
            if bloom_columns:
                plan.bloom_columns = list(bloom_columns)
            if profile:
                plan.profile = profile
            save_plan(plan, out_dir)
    elif not st.exists(st.join(out_dir, "_artifacts", "plan.json")):
        if bloom_columns and not plan.bloom_columns:
            plan.bloom_columns = list(bloom_columns)
        if profile:
            plan.profile = profile
        save_plan(plan, out_dir)  # caller-supplied plan: persist for decode/resume
    plan_ref = ray.put(plan)

    # size salts from the sampled source histogram + exact total row count
    # (parquet metadata only — no data read). A hot Zipf source gets a
    # proportionally larger salt space so no partition exceeds the target.
    # The salt map is PERSISTED with the artifact: partition keys derive
    # from it, so a resumed run must reuse the original map even if the
    # sample (or the caller's target) changed in between.
    salts_path = st.join(out_dir, "_artifacts", "salts.json")
    if st.exists(salts_path):
        salt_per_source = {k: int(v) for k, v in st.read_json(salts_path).items()}
    else:
        total_rows = _input_row_count(paths)
        hist = (plan.source_hist or {s: 1 for s in plan.source_dict} or {"": 1}) if source_col else {"": 1}
        tot = sum(hist.values())
        salt_per_source = {
            s: max(1, math.ceil((c / tot) * total_rows / target_rows_per_partition))
            for s, c in hist.items()
        }
        st.makedirs(st.join(out_dir, "_artifacts"))
        st.write_json_atomic(salts_path, salt_per_source)

    if mode == "files":
        return _run_files_mode(
            paths, out_dir, plan_ref, salt_per_source, id_col=id_col, source_col=source_col,
            compression=compression, user_metadata=user_metadata, row_fingerprint=row_fingerprint,
            unit_rows=unit_rows,
        )

    ds = rd.read_parquet(paths)

    if mode == "grouped":
        out_dir_local = out_dir

        def stamp(batch: pa.Table) -> pa.Table:
            return salted_keys(batch, salt_per_source, id_col=id_col, source_col=source_col)

        def encode_group(group: pa.Table) -> pa.Table:
            part_id = group.column("__part")[0].as_py()
            state = _get_state(plan_ref)
            row = _encode_and_write(
                group.drop_columns(["__part"]), part_id, state, out_dir_local,
                compression=compression, row_fingerprint=row_fingerprint,
            )
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
            fn_constructor_kwargs={
                "plan_ref": plan_ref, "out_dir": out_dir, "id_col": id_col,
                "compression": compression, "row_fingerprint": row_fingerprint,
            },
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")

    partitions = manifest_ds.take_all()  # small: one row per partition
    extra = {"mode": mode, "schema_b64": _schema_blob(paths)}
    if user_metadata:
        extra["user_metadata"] = user_metadata
    path = write_global_manifest(out_dir, partitions, extra=extra)
    totals = read_global_manifest(out_dir)["totals"]
    totals["n_partitions"] = len(partitions)
    totals["resumed_partitions"] = sum(1 for p in partitions if p.get("skipped"))
    totals["ratio"] = totals["enc_bytes"] / max(1, totals["raw_bytes"])
    totals["manifest"] = path
    return totals


def encode_stream(
    ds: rd.Dataset,
    out_dir: str,
    *,
    plan: EncodePlan,
    target_rows_per_partition: int = 16_384,
    id_col: str = "doc_id",
    compression: str | None = None,
    row_fingerprint: bool = False,
    concurrency: int | tuple[int, int] | None = None,
    user_metadata: dict | None = None,
    layout: str = "sharded",
) -> dict:
    """Encode an arbitrary ``ray.data.Dataset`` — the transform-then-
    encode path (the reference's ParquetTransformer shape,
    `/root/reference/lib/writer.js:256-289`): upstream ``map_batches`` /
    ``filter`` stages stream straight into the encoder actor pool with
    no intermediate parquet. The caller supplies the plan (built once
    per corpus via ``stats.build_plan`` or loaded from a previous
    artifact).

    ``layout="sharded"`` (default) consolidates each content-hashed
    partition into one chunk; ``layout="files"`` writes fragment
    partitions instead, making the streamed artifact a first-class
    MUTABLE table (delete/upsert/CDC/restore/time-travel all work).
    Streamed artifacts carry no input-file union schema either way; the
    stream's own schema is the contract."""
    if layout not in ("sharded", "files"):
        raise ValueError(f"layout must be 'sharded' or 'files': {layout!r}")
    schema_blob = None
    if layout == "files":
        # record the stream's schema in the manifest (the files-mode
        # union-schema contract): schema-evolving upserts/appends on the
        # streamed artifact then align exactly like path-based encodes.
        # May execute one upstream block to infer a transformed schema.
        import base64

        sch = ds.schema(fetch_if_missing=True).base_schema
        schema_blob = base64.b64encode(sch.serialize().to_pybytes()).decode()
    st.makedirs(out_dir)
    if not st.exists(st.join(out_dir, "_artifacts", "plan.json")):
        save_plan(plan, out_dir)
    plan_ref = ray.put(plan)
    manifest_ds = ds.map_batches(
        EncoderActor,
        batch_format="pyarrow",
        batch_size=target_rows_per_partition,
        zero_copy_batch=True,
        concurrency=concurrency or (2, 8),
        fn_constructor_kwargs={
            "plan_ref": plan_ref, "out_dir": out_dir, "id_col": id_col,
            "compression": compression, "row_fingerprint": row_fingerprint,
            "layout": layout,
        },
    )
    rows = manifest_ds.take_all()  # small: one row per partition/fragment
    extra: dict = {"mode": layout}
    if user_metadata:
        extra["user_metadata"] = user_metadata
    if layout == "files":
        from ..stages.writer import write_partition_manifests

        extra["schema_b64"] = schema_blob
        path = write_partition_manifests(out_dir, rows, extra=extra)
    else:
        path = write_global_manifest(out_dir, rows, extra=extra)
    totals = dict(read_global_manifest(out_dir)["totals"])
    totals["n_partitions"] = len({r.get("partition") for r in rows})
    totals["resumed_partitions"] = sum(1 for p in rows if p.get("skipped"))
    totals["ratio"] = totals["enc_bytes"] / max(1, totals["raw_bytes"])
    totals["manifest"] = path
    return totals


_DECODE_STATE_CACHE: dict[str, EncoderState] = {}


def _decode_state(out_dir: str) -> EncoderState:
    """Per-worker-process decode state (plan loaded + deserialized once).

    A process-global cache on task-pool workers gives actor-pool
    amortization semantics while reusing the session's existing (already
    page-fault-warmed) worker processes — on this sandbox a fresh actor
    pool costs ~30 s of first-touch faults per actor."""
    st = _DECODE_STATE_CACHE.get(out_dir)
    if st is None:
        st = EncoderState(load_plan(out_dir))  # EncoderState warms the worker
        _DECODE_STATE_CACHE[out_dir] = st
    return st


def _schema_from_blob(blob: str | None, columns: list[str] | None = None) -> pa.Schema | None:
    """The artifact's union schema (manifest ``schema_b64``), restricted
    to the projection — every decoded fragment aligns to it so appends /
    upserts that added or dropped columns still concat into one block
    schema. ``None`` for pre-schema artifacts (alignment skipped).

    The blob is resolved ON THE DRIVER per decode call and shipped to the
    tasks: a worker-process cache keyed by ``out_dir`` would go stale the
    moment a schema-evolving append or upsert lands in the same session."""
    import base64

    if not blob:
        return None
    full = pa.ipc.read_schema(pa.BufferReader(base64.b64decode(blob))).remove_metadata()
    if columns is None:
        return full
    return pa.schema([f for f in full if f.name in columns])


def _align_to_schema(t: pa.Table, target: pa.Schema) -> pa.Table:
    """Project ``t`` onto ``target`` (order + presence): columns missing
    from this fragment become null arrays of the target type."""
    if t.schema.names == target.names and t.schema.types == target.types:
        return t
    cols = {}
    for f in target:
        if f.name in t.column_names:
            c = t.column(f.name)
            cols[f.name] = c.cast(f.type) if c.type != f.type else c
        else:
            cols[f.name] = pa.nulls(t.num_rows, f.type)
    return pa.table(cols)


def _decode_units(
    batch: pa.Table,
    out_dir: str,
    columns: list[str] | None = None,
    where: list[tuple] | None = None,
    keep_columns: list[str] | None = None,
    schema_b64: str | None = None,
) -> pa.Table:
    from ..stages.decoder import SparseChunk, collect_segment_ranges

    state = _decode_state(out_dir)
    tables = []
    for part_id, frag_id in zip(
        batch.column("partition").to_pylist(), batch.column("fragment").to_pylist()
    ):
        pdir = st.join(out_dir, f"part-{part_id}")
        if frag_id:  # files mode: one chunk per fragment
            fm = st.read_json(st.join(pdir, f"frag-{frag_id}.json"))
            if fm.get("tombstone"):  # snapshot read of a since-deleted fragment
                fm = fm["prior"]
            bin_path = st.join(pdir, f"frag-{frag_id}.bin")
        else:  # grouped/sharded: single chunk per partition
            fm = st.read_json(st.join(pdir, "manifest.json"))
            bin_path = st.join(pdir, "chunk.bin")
        if columns:  # projection pushdown: decode only requested columns
            fm = dict(fm)
            fm["columns"] = {k: v for k, v in fm["columns"].items() if k in columns}
            if not fm["columns"]:
                # fragment predates EVERY projected column (schema
                # evolution): its rows still exist — emit typed nulls
                # instead of silently dropping them
                target = _schema_from_blob(schema_b64, columns)
                if target is not None and len(target):
                    tables.append(
                        pa.table({f.name: pa.nulls(int(fm["rows"]), f.type) for f in target})
                    )
                continue
        if columns and not fm.get("compression"):
            # push the projection into STORAGE: read only the projected
            # columns' segment byte ranges (ranged GETs on object stores).
            # The whole-chunk crc32 can't be checked on a partial read;
            # per-stream structure still validates on decode.
            ranges = []
            for meta in fm["columns"].values():
                ranges.extend(collect_segment_ranges(meta))
            chunk = SparseChunk(ranges, st.read_ranges(bin_path, ranges))
        else:
            raw = st.read_bytes(bin_path)
            import zlib

            if fm.get("checksum_crc32") is not None and zlib.crc32(raw) != fm["checksum_crc32"]:
                raise IOError(
                    f"checksum mismatch in part-{part_id} frag-{frag_id or '<chunk>'}: corrupt artifact"
                )
            chunk = decompress_chunk(raw, fm)
        tables.append(decode_chunk(chunk, fm, state))
    target = _schema_from_blob(schema_b64, columns)
    if target is not None:
        tables = [_align_to_schema(t, target) for t in tables]
    out = pa.concat_tables(tables)
    if where:
        out = _apply_where(out, where)
    if keep_columns is not None:
        out = out.select(keep_columns)
    return out


_WHERE_OPS = ("<", "<=", ">", ">=", "==", "=", "in", "contains")


def _normalize_where_operand(value, tag: str):
    """Bring a predicate operand into the zone map's raw numeric domain.

    Zone maps store temporal min/max as epoch integers in the column's
    own unit (see ``stages.encoder._column_zones``); the operand must be
    normalized through the same Arrow cast so prune-side and exact-side
    comparisons agree."""
    if tag.startswith("timestamp["):
        unit = tag[len("timestamp[") : -1]
        return pa.scalar(value, pa.timestamp(unit)).cast(pa.int64()).as_py()
    if tag == "date32":
        return pa.scalar(value, pa.date32()).cast(pa.int32()).as_py()
    if tag == "date64":
        return pa.scalar(value, pa.date64()).cast(pa.int64()).as_py()
    return value


def _zones_admit(zones: dict | None, where: list[tuple]) -> bool:
    """Can a unit with these min/max zones contain ANY row satisfying the
    conjunction ``where``? Missing zones (string columns, all-null
    chunks, pre-zones artifacts) admit — pruning is best-effort, the
    residual filter is exact."""
    if not zones:
        return True
    for col, op, val in where:
        z = zones.get(col)
        if z is None:
            continue
        lo, hi = z["min"], z["max"]
        if op == "contains":  # list<int> columns zone over their FLAT values
            try:
                v = _normalize_where_operand(val, z["t"])
            except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError, ValueError):
                continue
            if not lo <= v <= hi:
                return False
            continue
        if op == "in":
            try:
                vs = [_normalize_where_operand(v, z["t"]) for v in val]
            except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError, ValueError):
                continue
            if not any(lo <= v <= hi for v in vs):
                return False
            continue
        try:
            v = _normalize_where_operand(val, z["t"])
        except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError, ValueError):
            continue  # incomparable operand: leave it to the exact filter
        if (
            (op == "<" and not lo < v)
            or (op == "<=" and not lo <= v)
            or (op == ">" and not hi > v)
            or (op == ">=" and not hi >= v)
            or (op in ("==", "=") and not lo <= v <= hi)
        ):
            return False
    return True


def _blooms_admit(blooms: dict | None, where: list[tuple]) -> bool:
    """Bloom-filter companion to :func:`_zones_admit` for ``==`` clauses
    on high-cardinality unordered columns (artifacts encoded with
    ``bloom_columns=[...]``).  Missing filters admit; a definite bloom
    miss proves the operand is absent from the chunk."""
    if not blooms:
        return True
    from ..stages.bloom import bloom_admits

    for col, op, val in where:
        if op not in ("==", "=", "in", "contains"):
            continue
        b = blooms.get(col)
        if b is None:
            continue
        if op == "in":
            if not any(bloom_admits(b, v) for v in val):
                return False
        elif not bloom_admits(b, val):  # "contains" blooms hold the flat values
            return False
    return True


def _apply_where(table: pa.Table, where: list[tuple]) -> pa.Table:
    """Exact residual filter (zone pruning only skips whole units)."""
    return table.filter(_where_mask(table, where))


def _where_mask(table: pa.Table, where: list[tuple]):
    """Boolean mask of rows satisfying the conjunction (nulls = False)."""
    import pyarrow.compute as pc

    kernels = {
        "<": pc.less,
        "<=": pc.less_equal,
        ">": pc.greater,
        ">=": pc.greater_equal,
        "==": pc.equal,
        "=": pc.equal,
    }
    mask = None
    for col, op, val in where:
        c = table.column(col)
        if op == "contains":
            # list<int> membership per row, vectorized: one equality pass
            # over the flat values + a prefix-sum segment count
            arr = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            flat = arr.values
            hit = pc.fill_null(
                pc.equal(flat, pa.scalar(val, type=arr.type.value_type)), False
            ).to_numpy(zero_copy_only=False)
            cum = np.concatenate(([0], np.cumsum(hit, dtype=np.int64)))
            off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            m = pa.array(cum[off[1:]] - cum[off[:-1]] > 0)
        elif op == "in":
            m = pc.is_in(c, value_set=pa.array(list(val), type=c.type))
        else:
            s = val if isinstance(val, pa.Scalar) else pa.scalar(val, type=c.type)
            m = kernels[op](c, s)
        mask = m if mask is None else pc.and_kleene(mask, m)
    return pc.fill_null(mask, False) if mask is not None else pa.array([True] * table.num_rows)


def _check_where(where: list[tuple] | None) -> list[tuple] | None:
    if where:
        for clause in where:
            if len(clause) != 3 or clause[1] not in _WHERE_OPS:
                raise ValueError(f"where clause must be (column, op, value) with op in {_WHERE_OPS}: {clause!r}")
            if clause[1] == "in" and not isinstance(clause[2], (list, tuple, set, frozenset)):
                raise ValueError(f"'in' operand must be a list/tuple/set of values: {clause!r}")
    return where


def list_decode_units(
    out_dir: str,
    id_range: tuple | None = None,
    sources: list[str] | None = None,
    where: list[tuple] | None = None,
    version: int | None = None,
) -> list[dict]:
    """Distributed decode-unit discovery → list of
    ``{"partition": …, "fragment": …}`` rows (kilobytes of metadata).

    Only the partition list comes from the global manifest on the
    driver; per-partition manifests (and per-fragment pruning stats) are
    read inside parallel tasks — the driver never performs
    O(#partitions) serial storage reads.

    ``version`` pins the listing to an archived snapshot's fragment
    lists (time travel): fragments later tombstoned by ``delete_rows``
    still resolve through their preserved ``prior`` manifests until
    :func:`vacuum` prunes the snapshot."""
    from ..stages.writer import read_snapshot

    snap_lists: dict[str, list[str] | None] | None = None
    if version is not None:
        snap = read_snapshot(out_dir, version)
        snap_lists = {p["partition"]: p["fragments"] for p in snap["partitions"]}
        part_names = list(snap_lists)
    else:
        manifest = read_global_manifest(out_dir)
        part_names = [p["partition"] for p in manifest["partitions"]]
    parts = [
        pid for pid in part_names if sources is None or pid.rsplit("-", 1)[0] in sources
    ]

    def list_units(batch: pa.Table) -> pa.Table:
        rows = []
        for pid in batch.column("p").to_pylist():
            pdir = st.join(out_dir, f"part-{pid}")
            if snap_lists is not None:
                frag_list = snap_lists[pid]
                pm = {"fragments": frag_list} if frag_list is not None else st.read_json(
                    st.join(pdir, "manifest.json")
                )
            else:
                pm = st.read_json(st.join(pdir, "manifest.json"))
            if "fragments" in pm:
                for fr in pm["fragments"]:
                    if id_range is not None or where:
                        fm = st.read_json(st.join(pdir, f"frag-{fr}.json"))
                        if fm.get("tombstone"):
                            fm = fm["prior"]
                        if id_range is not None:
                            lo, hi = id_range
                            if fm.get("id_max") is not None and (
                                fm["id_max"] < lo or fm["id_min"] > hi
                            ):
                                continue
                        if where and not (
                            _zones_admit(fm.get("zones"), where)
                            and _blooms_admit(fm.get("blooms"), where)
                        ):
                            continue
                    rows.append({"partition": pid, "fragment": fr})
            else:
                if where and not (
                    _zones_admit(pm.get("zones"), where)
                    and _blooms_admit(pm.get("blooms"), where)
                ):
                    continue
                rows.append({"partition": pid, "fragment": ""})
        return pa.Table.from_pylist(
            rows, schema=pa.schema([("partition", pa.string()), ("fragment", pa.string())])
        )

    # run the listing as parallel tasks and collect the (kilobyte) unit
    # rows — chaining directly into the decode stage would fuse
    # listing+decode into #partition-blocks tasks and collapse decode
    # parallelism
    return (
        rd.from_items([{"p": p} for p in parts])
        .map_batches(list_units, batch_format="pyarrow", batch_size=16)
        .take_all()
    )


def decode_dataset(
    out_dir: str,
    columns: list[str] | None = None,
    id_range: tuple | None = None,
    sources: list[str] | None = None,
    where: list[tuple] | None = None,
    version: int | None = None,
) -> rd.Dataset:
    """Stream the encoded artifact back as a Dataset of the original schema.

    ``columns`` pushes projection into the decoder (only the requested
    column segments are decoded — the reference's getCursor(columnList),
    `/root/reference/lib/reader.js:132-144,227-229`). ``id_range=(lo, hi)``
    prunes fragments whose manifest id min/max stats cannot intersect
    (parquet row-group-stats analogue); ``sources`` prunes partitions by
    their source prefix — both prune BEFORE any chunk byte is read.

    ``where=[(col, op, value), ...]`` is a conjunction of range
    predicates (op in ``<, <=, >, >=, ==``) evaluated in two phases:
    fragments whose per-column min/max zone maps cannot intersect are
    skipped without reading a chunk byte (the parquet row-group
    Statistics analogue — parquet.thrift Statistics min/max, which the
    reference never emits), then an exact vectorized filter runs on the
    decoded batches. Predicate columns are decoded as needed and dropped
    again if not in ``columns``.

    Work units are individual fragments (files mode) or whole partitions
    (grouped/sharded), so decode parallelism matches the write layout and
    no task is stuck with a whole hot-source partition.

    ``version`` reads an archived snapshot (time travel): the artifact
    as it stood before later appends/deletes, as long as :func:`vacuum`
    hasn't pruned that snapshot and the chunks only it references.

    Unit discovery is distributed (see :func:`list_decode_units`)."""
    where = _check_where(where)
    unit_rows = list_decode_units(
        out_dir, id_range=id_range, sources=sources, where=where, version=version
    )
    keep_columns = None
    decode_columns = columns
    if where and columns:
        extra = [c for c, _, _ in where if c not in columns]
        if extra:
            keep_columns = list(columns)
            decode_columns = list(columns) + sorted(set(extra))
    # Block count scales with the cluster (2 tasks per CPU keeps every
    # core busy without per-task scheduling dominating — measured 2.1×
    # faster than per-fragment blocks at sf0.1); batch_size bounds the
    # decoded bytes held per batch regardless of units-per-block, so
    # memory stays flat as the unit count grows with the corpus.
    n_cpus = int(ray.cluster_resources().get("CPU", 32)) if ray.is_initialized() else 32
    n_blocks = max(1, min(len(unit_rows), 2 * n_cpus))
    return rd.from_items(unit_rows, override_num_blocks=n_blocks).map_batches(
        _decode_units,
        batch_format="pyarrow",
        batch_size=8,
        fn_kwargs={
            "out_dir": out_dir,
            "columns": decode_columns,
            "where": where,
            "keep_columns": keep_columns,
            # resolved at call time, never from a worker cache: schema-
            # evolving appends/upserts in the same session must be seen
            "schema_b64": read_global_manifest(out_dir).get("schema_b64"),
        },
    )


def delete_rows(out_dir: str, where: list[tuple]) -> dict:
    """Targeted delete: remove every row satisfying the conjunction
    ``where`` from a files-mode artifact, rewriting ONLY the fragments
    whose zones/Bloom filters admit the predicate (the retention /
    right-to-erasure operation — at corpus scale a delete that touches a
    handful of fragments must not rewrite the artifact).

    Protocol (crash-safe, idempotent):

    1. affected units come from the same pruning as a predicated read;
    2. each admitted fragment decodes, drops matching rows, and — when
       anything matched — re-encodes the survivors as a NEW fragment
       whose id derives from (old id, predicate); a retry or a rerun
       after a crash recomputes the same id and skips existing files;
    3. the old fragment's commit marker is atomically replaced by a
       TOMBSTONE (``{"tombstone": true, "replaced_by": ..., "prior":
       <original manifest>}``) — the encode resume path sees the marker
       and never resurrects the deleted rows, manifest rebuilds skip it,
       and snapshots taken before the delete keep decoding the retained
       old chunk (``decode_dataset(version=...)``) until :func:`vacuum`
       prunes them;
    4. partition + global manifests are rebuilt last: a crash before
       this step leaves the artifact readable (old manifests reference
       only fragments whose files still exist) and the rerun converges.

    Zone maps and Bloom filters are recomputed from the surviving rows;
    the fragment's id_min/id_max bounds keep their (still valid,
    superset) values. Returns a report. Grouped/sharded/compacted
    partitions hold one consolidated chunk — rewrite semantics differ —
    and raise for now."""
    where = _check_where(where)
    if not where:
        raise ValueError("delete_rows requires a non-empty predicate")
    results = _rewrite_fragments(out_dir, where)
    _rebuild_manifests(out_dir)
    deleted = sum(r["deleted"] for r in results)
    return {
        "units_scanned": len(results),
        "rows_deleted": int(deleted),
        "fragments_rewritten": sum(1 for r in results if r["deleted"] and r["replaced_by"]),
        "fragments_dropped": sum(1 for r in results if r["deleted"] and not r["replaced_by"]),
    }


def _rewrite_fragments(
    out_dir: str, where: list[tuple], skip_partitions: frozenset | set = frozenset()
) -> list[dict]:
    """Copy-on-write rewrite of every fragment admitting ``where``: drop
    matching rows, write survivors as a new deterministic fragment,
    tombstone the old marker. DATA FILES ONLY — the caller commits by
    rebuilding manifests (:func:`_rebuild_manifests`); until then readers
    resolve the old manifests, whose chunks are untouched."""
    units = [u for u in list_decode_units(out_dir, where=where) if u["partition"] not in skip_partitions]
    if any(not u["fragment"] for u in units):
        raise NotImplementedError(
            "targeted rewrites currently support files-mode fragment partitions only"
        )

    where_tag = hashlib.sha1(repr(list(where)).encode()).hexdigest()[:8]

    def rewrite(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..stages.encoder import encode_table
        from ..stages.writer import write_fragment

        state = _decode_state(out_dir)
        rows = []
        for part_id, frag_id in zip(
            batch.column("partition").to_pylist(), batch.column("fragment").to_pylist()
        ):
            pdir = st.join(out_dir, f"part-{part_id}")
            fm = st.read_json(st.join(pdir, f"frag-{frag_id}.json"))
            if fm.get("tombstone"):  # rerun after a partial earlier pass
                continue
            raw = st.read_bytes(st.join(pdir, f"frag-{frag_id}.bin"))
            tbl = decode_chunk(decompress_chunk(raw, fm), fm, state)
            mask = _where_mask(tbl, where)
            n_hit = int(pc.sum(mask).as_py() or 0)
            if n_hit == 0:  # zone/bloom false positive: fragment untouched
                rows.append({"partition": part_id, "fragment": frag_id, "deleted": 0, "replaced_by": frag_id})
                continue
            kept = tbl.filter(pc.invert(mask))
            new_id = None
            if kept.num_rows:
                new_id = hashlib.sha1(f"{frag_id}:{where_tag}".encode()).hexdigest()[:16]
                chunk, manifest = encode_table(kept, state)
                for k in ("id_min", "id_max"):  # still-valid superset bounds
                    if k in fm:
                        manifest[k] = fm[k]
                write_fragment(out_dir, part_id, new_id, chunk, manifest, compression=fm.get("compression"))
            tomb = {
                "partition": part_id,
                "fragment": frag_id,
                "tombstone": True,
                "replaced_by": new_id,
                "rows": 0,
                "raw_bytes": 0,
                "enc_bytes": 0,
                # full prior manifest: snapshots taken before this delete
                # keep decoding the old fragment (time travel) until
                # vacuum prunes them along with the chunk
                "prior": fm,
            }
            st.write_json_atomic(st.join(pdir, f"frag-{frag_id}.json"), tomb)
            rows.append({"partition": part_id, "fragment": frag_id, "deleted": n_hit, "replaced_by": new_id or ""})
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("partition", pa.string()),
                    ("fragment", pa.string()),
                    ("deleted", pa.int64()),
                    ("replaced_by", pa.string()),
                ]
            ),
        )

    return (
        rd.from_items(units, override_num_blocks=max(1, len(units)))
        .map_batches(rewrite, batch_format="pyarrow", batch_size=4)
        .take_all()
        if units
        else []
    )


def _rebuild_manifests(
    out_dir: str,
    extra_fragments: list[dict] | None = None,
    override_meta: dict | None = None,
) -> None:
    """Recompute partition + global manifests from the committed fragment
    markers — the atomic COMMIT POINT for delete/upsert rewrites (metadata
    only; a crash before this leaves the old manifests, which reference
    only still-existing chunks, so readers never see a partial state).

    ``extra_fragments`` are summaries for partitions not yet in the
    global manifest (fresh upsert partitions); summaries whose partition
    the manifest already knows are dropped — the directory sweep below
    picks those up, so a rerun never double-counts."""
    gm = read_global_manifest(out_dir)
    extra = {k: gm[k] for k in ("mode", "schema_b64", "user_metadata") if k in gm}
    if override_meta:
        extra.update(override_meta)
    from ..stages.writer import load_fragment_summaries, write_partition_manifests

    known = {p["partition"] for p in gm["partitions"]}
    fragments: list[dict] = [f for f in (extra_fragments or []) if f["partition"] not in known]
    passthrough: list[dict] = []  # consolidated (chunk.bin) partitions
    for p in gm["partitions"]:
        pid = p["partition"]
        pm = st.read_json(st.join(out_dir, f"part-{pid}", "manifest.json"))
        if "fragments" not in pm:
            passthrough.append(p)
            continue
        frs = load_fragment_summaries(out_dir, pid)
        if frs:
            fragments.extend(frs)
        else:  # every fragment deleted: neutralize the stale manifest
            st.write_json_atomic(
                st.join(out_dir, f"part-{pid}", "manifest.json"),
                {"partition": pid, "fragments": [], "rows": 0, "n_tokens": 0,
                 "raw_bytes": 0, "enc_bytes": 0},
            )
    write_partition_manifests(out_dir, fragments, extra=extra, extra_partitions=passthrough)


def upsert_rows(out_dir: str, data, key: str = "doc_id", compression: str | None = None) -> dict:
    """Keyed merge (the MERGE/upsert of Delta/Iceberg, copy-on-write):
    rows of ``data`` REPLACE existing rows with the same ``key`` value;
    keys the artifact has never seen are inserts. ``data`` is a
    ``pyarrow.Table`` or a ``ray.data.Dataset``.

    Protocol (crash-safe, idempotent — same contract as
    :func:`delete_rows`):

    1. new fragments for ``data`` are written first, into partitions
       named by content hash (``u<hash>``) — a retry or rerun recomputes
       the same ids and skips committed files. They are INVISIBLE until
       step 3: no manifest references them yet.
    2. every existing fragment whose zones/Bloom filters admit
       ``key IN <new keys>`` is rewritten without the matched rows
       (tombstone protocol of :func:`delete_rows`); the fresh upsert
       partitions are excluded, which also makes reruns converge.
    3. one manifest rebuild commits both sides atomically; the manifest
       ``schema_b64`` becomes the union of the artifact schema and
       ``data``'s (upserts may evolve the schema like appends do), and a
       new snapshot version is cut — ``decode_dataset(version=)`` still
       reads the pre-merge state until :func:`vacuum` prunes it.

    The key list ships to the rewrite tasks (it is the predicate), so a
    single upsert batch should stay driver-sized (≲ millions of keys);
    bulk loads belong to ``encode_dataset`` appends. Requires unique keys
    in ``data`` — "which version wins" would otherwise be layout-defined.
    """
    import base64

    gm = read_global_manifest(out_dir)
    if gm.get("mode") != "files":
        raise NotImplementedError("upsert_rows supports files-mode artifacts only")
    if isinstance(data, pa.Table):
        new_ds = rd.from_arrow(data)
        data_schema = data.schema
    else:
        new_ds = data
        data_schema = new_ds.schema().base_schema
    keys = [
        r[key] for r in new_ds.select_columns([key]).take_all()
    ]  # driver-sized by contract (the predicate must ship anyway)
    if len(set(keys)) != len(keys):
        raise ValueError(f"upsert data contains duplicate {key!r} values")
    target = _schema_from_blob(gm.get("schema_b64"))
    uni = pa.unify_schemas([target, data_schema.remove_metadata()]) if target is not None else data_schema
    schema_b64 = base64.b64encode(uni.serialize().to_pybytes()).decode()

    def write_new(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..stages.writer import write_fragment
        from .verify import row_hashes

        state = _decode_state(out_dir)
        aligned = _align_to_schema(batch, uni).combine_chunks()
        # the partition id must cover FULL row content, not just the key
        # column: upserting the same key set with new values is the
        # canonical MERGE use, and a key-only hash would alias the new
        # batch to the old partition (whose commit marker then skips the
        # write). Retry-stable: same data -> same id, so reruns converge.
        content = hashlib.sha1(row_hashes(aligned).tobytes()).hexdigest()[:16]
        part_id = "u" + hashlib.sha1(
            (_content_part_id(aligned, key) + content).encode()
        ).hexdigest()[:16]
        chunk, manifest = encode_table(aligned, state)
        ids = aligned.column(key)
        manifest["id_min"] = pc.min(ids).as_py()
        manifest["id_max"] = pc.max(ids).as_py()
        # resurrect_tombstone: re-upserting data whose identical earlier
        # fragment was since tombstoned must land, not skip
        row = write_fragment(
            out_dir, part_id, "000000", chunk, manifest,
            compression=compression, resurrect_tombstone=True,
        )
        return pa.Table.from_pylist([row], schema=_SUMMARY_SCHEMA)

    new_frags = new_ds.map_batches(write_new, batch_format="pyarrow", batch_size=None).take_all()
    new_parts = {f["partition"] for f in new_frags}
    results = _rewrite_fragments(out_dir, [(key, "in", keys)], skip_partitions=new_parts)
    _rebuild_manifests(out_dir, extra_fragments=new_frags, override_meta={"schema_b64": schema_b64})
    updated = sum(r["deleted"] for r in results)
    return {
        "rows_upserted": int(sum(f["rows"] for f in new_frags)),
        "rows_updated": int(updated),
        "rows_inserted": int(sum(f["rows"] for f in new_frags) - updated),
        "fragments_rewritten": sum(1 for r in results if r["deleted"]),
        "new_partitions": sorted(new_parts),
    }


def vacuum(out_dir: str, *, keep_snapshots: int = 1) -> dict:
    """Remove crash/retry remnants and expired-snapshot chunks from a
    files-mode artifact: stray ``.tmp-*`` spills, chunks whose commit
    marker is missing, committed fragments nothing references (a crash
    orphaned them before a manifest rebuild, or only since-pruned
    snapshots pointed at them — reruns regenerate the former
    deterministically), whole partitions no manifest knows (an upsert
    that crashed before its commit), and snapshot files beyond the newest
    ``keep_snapshots`` (the Delta-style retention knob: time travel to a
    pruned version stops working, by design).  Tombstone markers are
    kept — they are what stops an encode resume from resurrecting
    deleted rows.  Offline maintenance: do not run concurrently with a
    writer (like any GC of an in-progress commit).  Consolidated
    (compacted/grouped) partitions are left untouched.  Distributed:
    one task batch per group of partitions."""
    from ..stages.writer import list_snapshots, read_snapshot

    # prune expired snapshots first; the survivors define what's reachable
    versions = list_snapshots(out_dir)
    kept, pruned_snaps = versions[-max(0, keep_snapshots) :], versions[: -max(0, keep_snapshots) or None]
    if keep_snapshots <= 0:
        kept, pruned_snaps = [], versions
    for v in pruned_snaps:
        st.remove_quiet(st.join(out_dir, "_snapshots", f"snap-{v:06d}.json"))
    snap_refs: dict[str, set[str]] = {}
    for v in kept:
        for p in read_snapshot(out_dir, v)["partitions"]:
            if p["fragments"]:
                snap_refs.setdefault(p["partition"], set()).update(p["fragments"])
    refs_ref = ray.put(snap_refs)

    gm = read_global_manifest(out_dir)
    # sweep the union of manifest-known, on-disk, and snapshot-referenced
    # partitions: a crash before an upsert's commit leaves part dirs no
    # manifest knows (sweep them fully), and a partition whose last row
    # was deleted drops out of the global manifest while kept snapshots
    # may still reference its chunks (sweep it, protecting those)
    disk = {n[len("part-") :] for n in st.list_names(out_dir) if n.startswith("part-")}
    parts = sorted({p["partition"] for p in gm["partitions"]} | disk | set(snap_refs))

    def sweep(batch: pa.Table) -> pa.Table:
        all_snap_refs = ray.get(refs_ref)
        rows = []
        for pid in batch.column("p").to_pylist():
            pdir = st.join(out_dir, f"part-{pid}")
            mpath = st.join(pdir, "manifest.json")
            if not st.exists(pdir):
                continue
            # no manifest = an uncommitted (crashed) partition: nothing
            # references it beyond snapshots, same contract as orphans
            pm = st.read_json(mpath) if st.exists(mpath) else {"fragments": []}
            # consolidated (compacted/grouped/sharded) partitions hold
            # their live rows in chunk.bin; any frag-* files left behind
            # by compaction survive only while a kept snapshot still
            # references them (time travel), then get reclaimed here
            consolidated = "fragments" not in pm
            referenced = (
                set() if consolidated else set(pm["fragments"])
            ) | all_snap_refs.get(pid, set())
            names = st.list_names(pdir)
            jsons = {n[len("frag-") : -len(".json")] for n in names if n.startswith("frag-") and n.endswith(".json")}
            tombs = {
                f for f in jsons if st.read_json(st.join(pdir, f"frag-{f}.json")).get("tombstone")
            }
            removed = reclaimed = 0
            for n in names:
                path = st.join(pdir, n)
                drop = False
                if n.startswith(".tmp-"):
                    drop = True
                elif n.startswith("frag-") and n.endswith(".bin"):
                    fid = n[len("frag-") : -len(".bin")]
                    drop = fid not in jsons or fid not in referenced
                elif n.startswith("frag-") and n.endswith(".json"):
                    fid = n[len("frag-") : -len(".json")]
                    drop = fid not in referenced and fid not in tombs  # orphaned commit
                if drop:
                    try:
                        reclaimed += len(st.read_bytes(path))
                    except OSError:
                        pass
                    st.remove_quiet(path)
                    removed += 1
            rows.append({"p": pid, "removed": removed, "reclaimed": reclaimed})
        return pa.Table.from_pylist(
            rows, schema=pa.schema([("p", pa.string()), ("removed", pa.int64()), ("reclaimed", pa.int64())])
        )

    res = (
        rd.from_items([{"p": p} for p in parts])
        .map_batches(sweep, batch_format="pyarrow", batch_size=16)
        .take_all()
        if parts
        else []
    )
    return {
        "removed_files": int(sum(r["removed"] for r in res)),
        "reclaimed_bytes": int(sum(r["reclaimed"] for r in res)),
        "snapshots_pruned": len(pruned_snaps),
        "snapshots_kept": kept,
    }


def validate_artifact(out_dir: str, rules: dict[str, list[tuple]]) -> dict:
    """CHECK-constraint validation (the Delta constraints / expectations
    idea): every rule is a ``where``-style conjunction that EVERY row
    must satisfy; returns per-rule violation counts and a pass flag.

    One streaming decode pass evaluates all rules per batch (vectorized
    masks, kilobyte count partials to the driver — the corpus is never
    materialized). Rules over columns a chunk lacks count those rows as
    violations (nulls fail a CHECK, as in SQL)."""
    checked = {name: _check_where(list(cs)) for name, cs in rules.items()}
    if not checked:
        return {"rows": 0, "violations": {}, "ok": True}
    cols = sorted({c for cs in checked.values() for c, _, _ in cs})

    def count_violations(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        row = {"__rows": batch.num_rows}
        for name, cs in checked.items():
            ok = pc.fill_null(_where_mask(batch, cs), False)
            row[name] = batch.num_rows - int(pc.sum(ok).as_py() or 0)
        return pa.Table.from_pylist([row])

    parts = decode_dataset(out_dir, columns=cols).map_batches(
        count_violations, batch_format="pyarrow"
    ).take_all()
    violations = {name: int(sum(p[name] for p in parts)) for name in checked}
    return {
        "rows": int(sum(p["__rows"] for p in parts)),
        "violations": violations,
        "ok": all(v == 0 for v in violations.values()),
    }


def column_stats(out_dir: str) -> dict[str, dict]:
    """Per-column codec/size metrics aggregated from the fragment
    manifests (the north rule's "codec/size metrics" surface, queryable
    without touching chunk data): for every column, bytes raw/encoded,
    the overall ratio, and how many chunks each codec won — the
    auto-selector's decisions laid bare.

    Distributed: partition manifests are read in parallel tasks; only
    kilobyte aggregates reach the driver."""
    gm = read_global_manifest(out_dir)
    parts = [p["partition"] for p in gm["partitions"]]

    def collect(batch: pa.Table) -> pa.Table:
        rows = []
        for pid in batch.column("p").to_pylist():
            pdir = st.join(out_dir, f"part-{pid}")
            pm = st.read_json(st.join(pdir, "manifest.json"))
            frag_manifests = (
                [st.read_json(st.join(pdir, f"frag-{fr}.json")) for fr in pm["fragments"]]
                if "fragments" in pm
                else [pm]
            )
            for fm in frag_manifests:
                if fm.get("tombstone"):
                    continue
                for col, meta in fm.get("columns", {}).items():
                    codec = meta.get("codec", "?")
                    if codec == "list_int":  # name the values codec, the real decision
                        codec = f"list_int/{meta.get('values', {}).get('codec', '?')}"
                    rows.append(
                        {
                            "column": col,
                            "codec": codec,
                            "raw_bytes": int(meta.get("raw_bytes", 0)),
                            "enc_bytes": int(meta.get("enc_bytes", 0)),
                        }
                    )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("column", pa.string()), ("codec", pa.string()),
                 ("raw_bytes", pa.int64()), ("enc_bytes", pa.int64())]
            ),
        )

    if not parts:
        return {}
    from ray.data.aggregate import Count, Sum

    agg = (
        rd.from_items([{"p": p} for p in parts])
        .map_batches(collect, batch_format="pyarrow", batch_size=16)
        .groupby(["column", "codec"])
        .aggregate(
            Count(alias_name="n_chunks"),
            Sum("raw_bytes", alias_name="raw_bytes"),
            Sum("enc_bytes", alias_name="enc_bytes"),
        )
        .take_all()
    )
    out: dict[str, dict] = {}
    for r in agg:
        c = out.setdefault(
            r["column"], {"raw_bytes": 0, "enc_bytes": 0, "codecs": {}}
        )
        c["raw_bytes"] += r["raw_bytes"]
        c["enc_bytes"] += r["enc_bytes"]
        c["codecs"][r["codec"]] = int(r["n_chunks"])
    for c in out.values():
        c["ratio"] = round(c["enc_bytes"] / max(1, c["raw_bytes"]), 4)
    return out


def table_aggregates(out_dir: str, columns: list[str] | None = None) -> dict[str, dict]:
    """MANIFEST-ONLY aggregate pushdown: per-column ``n`` / ``nulls`` /
    ``min`` / ``max`` / exact integer ``sum`` for the whole artifact,
    computed purely from the fragment manifests' zones + aggs — not one
    chunk byte is read.  The parquet-statistics aggregate-pushdown
    analogue (``SELECT count(*), min(x), max(x), sum(x)`` without a
    scan); at 100 TB this answers in manifest time regardless of data
    size.

    ``min``/``max`` come from the zone maps in each zone's recorded raw
    domain (temporal columns: their epoch integer, tagged ``t``).  A
    column's ``sum`` is present only if EVERY fragment recorded one
    (each is exact by construction — see ``stages.encoder._column_aggs``);
    list<int> columns expose ``flat_n``/``flat_sum`` over the flattened
    values.  Raises if the artifact predates aggregate recording."""
    gm = read_global_manifest(out_dir)
    parts = [p["partition"] for p in gm["partitions"]]

    def collect(batch: pa.Table) -> pa.Table:
        rows = []
        for pid in batch.column("p").to_pylist():
            pdir = st.join(out_dir, f"part-{pid}")
            pm = st.read_json(st.join(pdir, "manifest.json"))
            frag_manifests = (
                [st.read_json(st.join(pdir, f"frag-{fr}.json")) for fr in pm["fragments"]]
                if "fragments" in pm
                else [pm]
            )
            for fm in frag_manifests:
                if fm.get("tombstone"):
                    continue
                if "aggs" not in fm:
                    raise ValueError(
                        "artifact fragments predate aggregate recording; "
                        "re-encode (or use decode_dataset) for aggregates"
                    )
                zones = fm.get("zones", {})
                for col, a in fm["aggs"].items():
                    if columns and col not in columns:
                        continue
                    z = zones.get(col, {})
                    rows.append(
                        {
                            "column": col,
                            "payload": json.dumps(
                                {
                                    "n": a["n"],
                                    "nulls": a["nulls"],
                                    "sum": a.get("sum"),
                                    "has_sum": "sum" in a,
                                    "flat_n": a.get("flat_n"),
                                    "flat_sum": a.get("flat_sum"),
                                    "has_flat_sum": "flat_sum" in a,
                                    "min": z.get("min"),
                                    "max": z.get("max"),
                                    "t": z.get("t"),
                                }
                            ),
                        }
                    )
        return pa.Table.from_pylist(
            rows, schema=pa.schema([("column", pa.string()), ("payload", pa.string())])
        )

    if not parts:
        return {}
    rows = (
        rd.from_items([{"p": p} for p in parts])
        .map_batches(collect, batch_format="pyarrow", batch_size=16)
        .take_all()
    )
    out: dict[str, dict] = {}
    for r in rows:
        a = json.loads(r["payload"])
        col = r["column"]
        c = out.setdefault(
            col,
            {"n": 0, "nulls": 0, "sum": 0, "_sum_ok": True, "min": None, "max": None,
             "t": a["t"], "flat_n": 0, "flat_sum": 0, "_fsum_ok": True, "_has_flat": False},
        )
        c["n"] += a["n"]
        c["nulls"] += a["nulls"]
        if a["has_sum"] and c["_sum_ok"]:
            c["sum"] += a["sum"]
        else:
            c["_sum_ok"] = False
        if a["flat_n"] is not None:
            c["_has_flat"] = True
            c["flat_n"] += a["flat_n"]
            if a["has_flat_sum"] and c["_fsum_ok"]:
                c["flat_sum"] += a["flat_sum"]
            else:
                c["_fsum_ok"] = False
        if a["min"] is not None and (c["min"] is None or a["min"] < c["min"]):
            c["min"] = a["min"]
        if a["max"] is not None and (c["max"] is None or a["max"] > c["max"]):
            c["max"] = a["max"]
    for c in out.values():
        if not c.pop("_sum_ok"):
            c["sum"] = None
        if not c.pop("_has_flat"):
            c.pop("flat_n"), c.pop("flat_sum"), c.pop("_fsum_ok")
        elif not c.pop("_fsum_ok"):
            c["flat_sum"] = None
    return out


def table_history(out_dir: str) -> list[dict]:
    """The artifact's version log (Delta DESCRIBE HISTORY analogue):
    one row per retained snapshot, newest last, with the totals recorded
    at cut time. Metadata-only — never touches chunk data. Versions
    pruned by :func:`vacuum` drop out; snapshots from before totals were
    recorded report ``None``."""
    from ..stages.writer import list_snapshots, read_snapshot

    out = []
    for v in list_snapshots(out_dir):
        snap = read_snapshot(out_dir, v)
        t = snap.get("totals") or {}
        out.append(
            {
                "version": v,
                "rows": t.get("rows"),
                "enc_bytes": t.get("enc_bytes"),
                "n_partitions": t.get("n_partitions"),
                "n_fragments": t.get("n_fragments"),
            }
        )
    return out


def restore_version(out_dir: str, version: int) -> dict:
    """Delta-style RESTORE: make snapshot ``version`` the artifact's
    current state again (the undo for a bad delete/upsert/append).

    Metadata-only and crash-safe: every fragment the snapshot names
    still exists on disk (that is exactly the invariant :func:`vacuum`'s
    retention protects), so restoring = un-tombstoning those markers
    (the tombstone embeds the prior manifest) and rebuilding the
    partition + global manifests from the snapshot's fragment lists.
    Fragments added after ``version`` stay on disk unreferenced until
    :func:`vacuum` reclaims them. The rebuild cuts a NEW snapshot whose
    state equals the old one — history is append-only, the restore
    itself is auditable and time-travel across it keeps working."""
    from ..stages.writer import read_snapshot

    snap = read_snapshot(out_dir, version)
    if any(p["fragments"] is None for p in snap["partitions"]):
        raise NotImplementedError("restore supports files-mode fragment partitions only")
    gm = read_global_manifest(out_dir)
    extra = {k: gm[k] for k in ("mode", "schema_b64", "user_metadata") if k in gm}
    fragments: list[dict] = []
    untombstoned = tombstoned = 0
    for p in snap["partitions"]:
        pid = p["partition"]
        pdir = st.join(out_dir, f"part-{pid}")
        keep = set(p["fragments"])
        for fr in p["fragments"]:
            jpath = st.join(pdir, f"frag-{fr}.json")
            fm = st.read_json(jpath)
            if fm.get("tombstone"):  # resurrect: the prior manifest is embedded
                fm = fm["prior"]
                st.write_json_atomic(jpath, fm)
                untombstoned += 1
            fragments.append(
                {
                    "partition": pid,
                    "fragment": fr,
                    "rows": fm["rows"],
                    "n_tokens": fm.get("columns", {}).get("tokens", {}).get("n_values", 0),
                    "raw_bytes": fm["raw_bytes"],
                    "enc_bytes": fm["enc_bytes"],
                }
            )
        # post-version fragments in a restored partition (delete/upsert
        # rewrites) must become tombstones: a later manifest rebuild
        # sweeps partition dirs, and a live marker would resurrect the
        # rewrite alongside the restored original (duplicate rows).
        # Tombstoning keeps later snapshots readable via the embedded
        # prior manifest, exactly like a delete.
        for name in st.list_names(pdir):
            if not (name.startswith("frag-") and name.endswith(".json")):
                continue
            fid = name[len("frag-") : -len(".json")]
            if fid in keep:
                continue
            fm = st.read_json(st.join(pdir, name))
            if fm.get("tombstone"):
                continue
            st.write_json_atomic(
                st.join(pdir, name),
                {"partition": pid, "fragment": fid, "tombstone": True,
                 "replaced_by": None, "rows": 0, "raw_bytes": 0, "enc_bytes": 0,
                 "prior": fm},
            )
            tombstoned += 1
    # partitions that exist now but aren't in the snapshot (post-version
    # upsert partitions) must drop out: rebuild strictly from the
    # snapshot's lists, then neutralize stale partition manifests
    restored_pids = {p["partition"] for p in snap["partitions"]}
    for p in gm["partitions"]:
        if p["partition"] in restored_pids:
            continue
        st.write_json_atomic(
            st.join(out_dir, f"part-{p['partition']}", "manifest.json"),
            {"partition": p["partition"], "fragments": [], "rows": 0, "n_tokens": 0,
             "raw_bytes": 0, "enc_bytes": 0},
        )
    write_partition_manifests(out_dir, fragments, extra=extra)
    return {
        "restored_version": version,
        "fragments": len(fragments),
        "untombstoned": untombstoned,
        "tombstoned": tombstoned,
        "rows": sum(f["rows"] for f in fragments),
    }


def recluster_dataset(
    out_dir: str,
    dest_dir: str,
    by: str,
    *,
    id_col: str = "doc_id",
    target_rows_per_partition: int = 16_384,
    compression: str | None = None,
    layout: str = "files",
) -> dict:
    """OPTIMIZE-style layout rewrite: decode → distributed range sort by
    ``by`` → re-encode into a NEW artifact whose chunks cover narrow,
    non-overlapping ``by`` ranges, so zone-map pruning on that column
    approaches the ideal (a range scan reads ~the fragments holding the
    range, nothing else). The cure for an artifact ingested in an order
    uncorrelated with its dominant query predicate.

    One all-to-all exchange (Ray's sort) — the cost every clustering
    rewrite pays; the encode plan is reused from the source artifact, so
    there is no second sampling pass. The source stays untouched (reads
    can continue against it; switch readers to ``dest_dir`` when the
    rewrite commits its manifest). Default ``layout="files"`` keeps the
    reclustered artifact fully mutable (delete/upsert/CDC/restore);
    ``"sharded"`` consolidates each partition into one chunk."""
    plan = load_plan(out_dir)
    ds = decode_dataset(out_dir).sort(by)
    return encode_stream(
        ds, dest_dir, plan=plan, id_col=id_col, layout=layout,
        target_rows_per_partition=target_rows_per_partition, compression=compression,
    )


def zorder_dataset(
    out_dir: str,
    dest_dir: str,
    by: list[str],
    *,
    id_col: str = "doc_id",
    target_rows_per_partition: int = 16_384,
    compression: str | None = None,
    sample_rows: int = 65_536,
    bits: int = 16,
) -> dict:
    """Z-ORDER clustering rewrite: sort by the interleaved bits of the
    ``by`` columns' quantile ranks, so chunks cover small hyper-
    rectangles of the multi-column space and zone pruning works on
    EVERY listed column at once (single-column reclustering makes the
    others' zones useless). The Delta OPTIMIZE ZORDER idea, built on
    Ray primitives: one sampled quantile pass per column (driver-merged,
    like the encode plan), a stateless vectorized z-key stage, one
    range-sort shuffle, re-encode with the source plan.

    Quantile-rank normalization (not min/max scaling) keeps the curve
    balanced under skew: each column contributes ``bits`` equal-mass
    levels. Works for int/float/temporal columns."""
    if not (1 <= len(by) <= 4):
        raise ValueError("zorder_dataset takes 1-4 columns")

    def _as_f64(arr: pa.Array) -> np.ndarray:
        # temporal/int → epoch int → float64 (float64 rank precision is
        # plenty for quantile levels); float stays float
        if not pa.types.is_floating(arr.type):
            arr = arr.cast(pa.int64())
        return arr.cast(pa.float64()).to_numpy(zero_copy_only=False)

    # sampled per-column quantile cut points (equal-mass bit levels)
    n_levels = 1 << bits
    sample_tbl = pa.Table.from_pylist(
        decode_dataset(out_dir, columns=list(by)).limit(sample_rows).take_all()
    )
    cuts = {}
    for c in by:
        vals = np.sort(_as_f64(sample_tbl[c].combine_chunks()))
        qs = np.quantile(vals, np.linspace(0, 1, n_levels + 1)[1:-1]) if len(vals) else np.zeros(0)
        cuts[c] = qs.astype(np.float64)
    cuts_ref = ray.put(cuts)

    def zkey(batch: pa.Table) -> pa.Table:
        cut = ray.get(cuts_ref)
        ranks = []
        for c in by:
            v = _as_f64(batch[c].combine_chunks())
            ranks.append(np.searchsorted(cut[c], v, side="right").astype(np.uint64))
        # bit interleave: column j contributes bit k at position k*len(by)+j
        z = np.zeros(batch.num_rows, dtype=np.uint64)
        for k in range(bits):
            for j, r in enumerate(ranks):
                z |= ((r >> np.uint64(k)) & np.uint64(1)) << np.uint64(k * len(by) + j)
        return batch.append_column("__z", pa.array(z))

    plan = load_plan(out_dir)
    ds = (
        decode_dataset(out_dir)
        .map_batches(zkey, batch_format="pyarrow")
        .sort("__z")
        .map_batches(lambda b: b.drop_columns(["__z"]), batch_format="pyarrow")
    )
    return encode_stream(
        ds, dest_dir, plan=plan, id_col=id_col, layout="files",
        target_rows_per_partition=target_rows_per_partition, compression=compression,
    )


def compact_dataset(out_dir: str, *, max_fragments: int = 1) -> dict:
    """Merge each partition's fragments into one consolidated chunk.

    files mode trades chunk size for shuffle-freedom: a partition may end
    up with many small fragments (one per input file). Compaction fixes
    that WITHOUT a global shuffle — each partition is local work (decode
    its fragments → one encode) fanned out with ``map_batches`` over the
    partition list. After compaction the partition looks like a grouped-
    mode partition (single ``chunk.bin``); its manifest keeps the absorbed
    fragment ids so a later encode resume still sees them as done.
    """
    from ..stages.writer import list_snapshots, read_snapshot

    gm = read_global_manifest(out_dir)
    parts = [{"partition": p["partition"], "fragment": ""} for p in gm["partitions"]]
    # fragments still referenced by ANY snapshot must survive compaction:
    # time travel / CDC / restore decode them until vacuum's retention
    # prunes the snapshots (and only then the files). Deleting them here
    # would break every prior version the instant the table compacts.
    snap_refs: dict[str, set[str]] = {}
    for v in list_snapshots(out_dir):
        for p in read_snapshot(out_dir, v)["partitions"]:
            if p["fragments"]:
                snap_refs.setdefault(p["partition"], set()).update(p["fragments"])
    refs_ref = ray.put(snap_refs)

    def compact_parts(batch: pa.Table) -> pa.Table:
        all_snap_refs = ray.get(refs_ref)
        state = _decode_state(out_dir)
        rows = []
        for pid in batch.column("partition").to_pylist():
            pdir = st.join(out_dir, f"part-{pid}")
            pm = st.read_json(st.join(pdir, "manifest.json"))
            frags = pm.get("fragments", [])
            if len(frags) <= max_fragments:
                rows.append({"partition": pid, "compacted": False, "n_fragments": len(frags)})
                continue
            tables = []
            id_mins, id_maxs = [], []
            for fr in frags:
                fm = st.read_json(st.join(pdir, f"frag-{fr}.json"))
                chunk = decompress_chunk(st.read_bytes(st.join(pdir, f"frag-{fr}.bin")), fm)
                tables.append(decode_chunk(chunk, fm, state))
                if fm.get("id_min") is not None:
                    id_mins.append(fm["id_min"])
                    id_maxs.append(fm["id_max"])
            tbl = pa.concat_tables(tables).combine_chunks()
            chunk, manifest = encode_table(tbl, state)
            manifest["partition"] = pid
            manifest["source_fragments"] = frags
            manifest["n_tokens"] = manifest.get("columns", {}).get("tokens", {}).get("n_values", 0)
            if id_mins:
                manifest["id_min"], manifest["id_max"] = min(id_mins), max(id_maxs)
            import zlib as zlibmod

            manifest["checksum_crc32"] = zlibmod.crc32(chunk)
            st.write_bytes_atomic(st.join(pdir, "chunk.bin"), chunk)
            st.write_json_atomic(st.join(pdir, "manifest.json"), manifest)  # commit point
            referenced = all_snap_refs.get(pid, set())
            for fr in frags:  # cleanup (safe: manifest now points at chunk.bin)
                if fr in referenced:  # a kept snapshot still decodes it
                    continue
                for ext in (".bin", ".json"):
                    st.remove_quiet(st.join(pdir, f"frag-{fr}{ext}"))
            rows.append({"partition": pid, "compacted": True, "n_fragments": len(frags)})
        return pa.Table.from_pylist(rows)

    results = (
        # one BLOCK per partition, not just batch_size=1: from_items packs
        # all items into a handful of blocks and map_batches schedules one
        # task per block, which would compact partitions serially
        rd.from_items(
            [{"partition": p["partition"]} for p in gm["partitions"]],
            override_num_blocks=max(1, len(gm["partitions"])),
        )
        .map_batches(compact_parts, batch_format="pyarrow", batch_size=1)
        .take_all()
    )
    # refresh the global manifest (sizes changed; rows unchanged)
    part_rows = []
    for p in gm["partitions"]:
        pdir = st.join(out_dir, f"part-{p['partition']}")
        pm = st.read_json(st.join(pdir, "manifest.json"))
        part_rows.append(
            {
                "partition": p["partition"],
                "rows": pm["rows"],
                "n_tokens": pm.get("n_tokens", p.get("n_tokens", 0)),
                "raw_bytes": pm["raw_bytes"],
                "enc_bytes": pm["enc_bytes"],
            }
        )
    extra = {k: gm[k] for k in gm if k not in ("partitions", "totals")}
    extra["compacted"] = True
    write_global_manifest(out_dir, part_rows, extra=extra)
    return {
        "n_partitions": len(results),
        "n_compacted": sum(1 for r in results if r["compacted"]),
    }


def iter_token_batches(out_dir: str, *, batch_size_rows: int = 4096, columns=("doc_id", "tokens")):
    """Consumer API: stream decoded token batches to a training loop.

    Yields ``(doc_ids: list[str], tokens: list[np.ndarray])`` per batch via
    ``Dataset.iter_batches`` — the engine-to-trainer handoff, streaming with
    backpressure, never materializing the corpus."""
    import numpy as np

    ds = decode_dataset(out_dir, columns=list(columns))
    for batch in ds.iter_batches(batch_size=batch_size_rows, batch_format="pyarrow"):
        tok = batch.column("tokens")
        tok = tok.combine_chunks() if isinstance(tok, pa.ChunkedArray) else tok
        offsets = tok.offsets.to_numpy(zero_copy_only=False)
        flat = tok.values.to_numpy(zero_copy_only=False)
        arrays = [flat[offsets[i] : offsets[i + 1]] for i in range(len(tok))]
        yield batch.column("doc_id").to_pylist(), arrays
