"""Resumable partition writer: atomic chunk + manifest commit.

Replaces the reference's append-ordered envelope writer
(`/root/reference/lib/writer.js:177-254`) with an idempotent,
retry-safe layout designed for Ray task retries and checkpoint-resume:

* each partition is a directory ``part-<id>/`` holding chunk data and
  ``manifest.json`` (the per-partition lineage record);
* data is written FIRST, the ``.json`` manifest LAST — the manifest is
  the commit marker, so a reader never sees a committed marker without
  its data. All bytes go through :mod:`parquetjs_ray.storage`
  (``pyarrow.fs``), so artifacts work on local disks and shared object
  stores alike (atomicity per backend documented there);
* a rerun consults manifest existence and skips finished units — that is
  the resume contract. Chunk bytes are DETERMINISTIC functions of the
  data, so a racing retry overwrites with identical content;
* the driver writes the global ``_MANIFEST.json`` (the footer analogue,
  cf. `lib/writer.js:520-569`) only after all partitions commit.

Partition ids must be derived from the DATA (group key or content
hash), never from task/batch ids, so retries and reruns converge.
"""

from __future__ import annotations

import zlib

from .. import storage as st

__all__ = [
    "partition_done",
    "write_partition",
    "write_global_manifest",
    "read_global_manifest",
    "compress_chunk",
    "decompress_chunk",
]

# general-purpose compression AFTER the lightweight codecs — the analogue of
# the reference's GZIP/SNAPPY/LZO/BROTLI page compression (`lib/compression.js`).
# UNCOMPRESSED default keeps the size comparison vs the reference honest.
# "lzo" is the pure-Python LZO1X bitstream codec (codecs/lzo.py) — a
# compatibility path for the reference's legacy LZO option; the others go
# through pyarrow's native codecs.
SUPPORTED_COMPRESSION = ("zstd", "gzip", "snappy", "lz4", "brotli", "lzo")


def compress_chunk(chunk: bytes, compression: str | None) -> tuple[bytes, dict]:
    if not compression or compression == "uncompressed":
        return chunk, {}
    if compression not in SUPPORTED_COMPRESSION:
        raise ValueError(f"unsupported compression {compression!r}")
    if compression == "lzo":
        from ..codecs import lzo

        out = lzo.compress(chunk)
    else:
        import pyarrow as pa

        out = pa.Codec(compression).compress(chunk, asbytes=True)
    return out, {"compression": compression, "uncompressed_size": len(chunk)}


def decompress_chunk(chunk: bytes, manifest: dict) -> bytes:
    comp = manifest.get("compression")
    if not comp:
        return chunk
    if comp == "lzo":
        from ..codecs import lzo

        return lzo.decompress(chunk, manifest["uncompressed_size"])
    import pyarrow as pa

    return pa.Codec(comp).decompress(chunk, manifest["uncompressed_size"], asbytes=True)


def _part_dir(out_dir: str, part_id: str) -> str:
    return st.join(out_dir, f"part-{part_id}")


def partition_done(out_dir: str, part_id: str) -> bool:
    return st.exists(st.join(_part_dir(out_dir, part_id), "manifest.json"))


def write_partition(
    out_dir: str, part_id: str, chunk: bytes, manifest: dict, compression: str | None = None
) -> dict:
    """Write one partition: chunk first, manifest (commit marker) last.

    Idempotent under retries; returns a flat summary row."""
    pdir = _part_dir(out_dir, part_id)
    manifest = dict(manifest)
    chunk, comp_meta = compress_chunk(chunk, compression)
    if comp_meta:
        # report the bytes actually stored; keep the codec-only size
        manifest["enc_bytes_lightweight"] = manifest["enc_bytes"]
        manifest["enc_bytes"] = len(chunk)
    manifest.update(comp_meta)
    summary = {
        "partition": part_id,
        "rows": manifest["rows"],
        "n_tokens": manifest.get("columns", {}).get("tokens", {}).get("n_values", 0),
        "raw_bytes": manifest["raw_bytes"],
        "enc_bytes": manifest["enc_bytes"],
        "skipped": False,
    }
    if partition_done(out_dir, part_id):
        summary["skipped"] = True
        return summary
    manifest["partition"] = part_id
    manifest["checksum_crc32"] = zlib.crc32(chunk)
    st.makedirs(pdir)
    st.write_bytes_atomic(st.join(pdir, "chunk.bin"), chunk)
    st.write_json_atomic(st.join(pdir, "manifest.json"), manifest)
    return summary


def write_global_manifest(
    out_dir: str,
    partitions: list[dict],
    extra: dict | None = None,
    fragment_lists: dict[str, list[str]] | None = None,
) -> str:
    doc = {
        "partitions": sorted(partitions, key=lambda p: p["partition"]),
        "totals": {
            "rows": sum(p["rows"] for p in partitions),
            "n_tokens": sum(p.get("n_tokens", 0) for p in partitions),
            "raw_bytes": sum(p["raw_bytes"] for p in partitions),
            "enc_bytes": sum(p["enc_bytes"] for p in partitions),
        },
    }
    if extra:
        doc.update(extra)
    path = st.join(out_dir, "_MANIFEST.json")
    snap = _maybe_snapshot(out_dir, doc["partitions"], fragment_lists or {})
    if snap is not None:
        doc["snapshot"] = snap
    st.write_json_atomic(path, doc)
    return path


def _maybe_snapshot(out_dir: str, partitions: list[dict], fragment_lists: dict) -> int | None:
    """Archive this manifest state as ``_snapshots/snap-<n>.json`` — the
    Iceberg/Delta-style snapshot log behind ``decode_dataset(version=)``.
    A snapshot records each partition's fragment list (``null`` for
    consolidated chunk partitions). Identical consecutive states (e.g. a
    no-op resume rerun) do not create a new version. Old versions stay
    readable until :func:`parquetjs_ray.pipelines.encode.vacuum` prunes
    their snapshots and the chunks only they reference."""
    parts = [
        {"partition": p["partition"], "fragments": fragment_lists.get(p["partition"])}
        for p in sorted(partitions, key=lambda p: p["partition"])
    ]
    versions = list_snapshots(out_dir)
    if versions:
        latest = read_snapshot(out_dir, versions[-1])
        if latest["partitions"] == parts:
            return versions[-1]
    version = (versions[-1] + 1) if versions else 1
    sdir = st.join(out_dir, "_snapshots")
    st.makedirs(sdir)
    st.write_json_atomic(
        st.join(sdir, f"snap-{version:06d}.json"),
        {
            "version": version,
            "partitions": parts,
            # totals at cut time (DESCRIBE HISTORY without re-reading
            # fragment manifests; absent in pre-v4-session snapshots)
            "totals": {
                "rows": sum(p.get("rows", 0) for p in partitions),
                "enc_bytes": sum(p.get("enc_bytes", 0) for p in partitions),
                "n_partitions": len(partitions),
                "n_fragments": sum(len(f or ()) for f in fragment_lists.values()),
            },
        },
    )
    return version


def list_snapshots(out_dir: str) -> list[int]:
    """Available snapshot versions, ascending (empty for pre-snapshot
    artifacts)."""
    sdir = st.join(out_dir, "_snapshots")
    if not st.exists(sdir):
        return []
    return sorted(
        int(n[len("snap-") : -len(".json")])
        for n in st.list_names(sdir)
        if n.startswith("snap-") and n.endswith(".json")
    )


def read_snapshot(out_dir: str, version: int) -> dict:
    path = st.join(out_dir, "_snapshots", f"snap-{version:06d}.json")
    if not st.exists(path):
        raise FileNotFoundError(
            f"snapshot {version} not found in {out_dir} (never created, or vacuumed away; "
            f"available: {list_snapshots(out_dir)})"
        )
    return st.read_json(path)


def read_global_manifest(out_dir: str) -> dict:
    return st.read_json(st.join(out_dir, "_MANIFEST.json"))


# ── fragment layout (files mode) ─────────────────────────────────────
#
# part-<key>/frag-<id>.bin + frag-<id>.json, one pair per (partition,
# input file): fragment ids derive from the input file index, so a rerun
# recomputes exactly the missing fragments regardless of Ray's batching.
# The per-partition manifest.json (fragment list + totals) and the
# global manifest are written at the end from fragment metadata only.


def fragment_done(out_dir: str, part_id: str, frag_id: str) -> bool:
    pdir = _part_dir(out_dir, part_id)
    if st.exists(st.join(pdir, f"frag-{frag_id}.json")):
        return True
    # compaction replaces fragments with one consolidated chunk; the
    # compacted manifest remembers which fragment ids it absorbed
    mpath = st.join(pdir, "manifest.json")
    if st.exists(mpath):
        return frag_id in st.read_json(mpath).get("source_fragments", ())
    return False


def write_fragment(
    out_dir: str, part_id: str, frag_id: str, chunk: bytes, manifest: dict,
    compression: str | None = None, resurrect_tombstone: bool = False,
) -> dict:
    """Write one fragment: data first, ``.json`` commit marker last.

    ``resurrect_tombstone=True`` lets an EXPLICIT re-insert (upsert of
    data whose earlier fragment was tombstoned by ``delete_rows``)
    overwrite the tombstone marker instead of being skipped as "already
    committed". Encode/resume paths must keep the default ``False`` —
    for them the tombstone is exactly what stops a rerun from
    resurrecting deleted rows."""
    pdir = _part_dir(out_dir, part_id)
    st.makedirs(pdir)
    jpath = st.join(pdir, f"frag-{frag_id}.json")
    manifest = dict(manifest)
    chunk, comp_meta = compress_chunk(chunk, compression)
    if comp_meta:
        # report the bytes actually stored; keep the codec-only size
        manifest["enc_bytes_lightweight"] = manifest["enc_bytes"]
        manifest["enc_bytes"] = len(chunk)
    manifest.update(comp_meta)
    summary = {
        "partition": part_id,
        "fragment": frag_id,
        "rows": manifest["rows"],
        "n_tokens": manifest.get("columns", {}).get("tokens", {}).get("n_values", 0),
        "raw_bytes": manifest["raw_bytes"],
        "enc_bytes": manifest["enc_bytes"],
        "skipped": False,
    }
    if st.exists(jpath):
        if not (resurrect_tombstone and st.read_json(jpath).get("tombstone")):
            summary["skipped"] = True
            return summary
    manifest["partition"] = part_id
    manifest["fragment"] = frag_id
    manifest["checksum_crc32"] = zlib.crc32(chunk)
    st.write_bytes_atomic(st.join(pdir, f"frag-{frag_id}.bin"), chunk)
    st.write_json_atomic(jpath, manifest)  # commit marker, written last
    return summary


def load_fragment_summaries(out_dir: str, part_id: str) -> list[dict]:
    """Summaries of already-committed fragments (resume path)."""
    pdir = _part_dir(out_dir, part_id)
    out = []
    for fn in st.list_names(pdir):
        if fn.startswith("frag-") and fn.endswith(".json"):
            m = st.read_json(st.join(pdir, fn))
            if m.get("tombstone"):  # delete_rows replaced this fragment
                continue
            out.append(
                {
                    "partition": part_id,
                    "fragment": m["fragment"],
                    "rows": m["rows"],
                    "n_tokens": m.get("columns", {}).get("tokens", {}).get("n_values", 0),
                    "raw_bytes": m["raw_bytes"],
                    "enc_bytes": m["enc_bytes"],
                    "skipped": True,
                }
            )
    return out


def write_partition_manifests(
    out_dir: str,
    fragments: list[dict],
    extra: dict | None = None,
    extra_partitions: list[dict] | None = None,
) -> str:
    """Roll fragment summaries up into per-partition manifests + the
    global manifest (the footer analogue). Driver-side; metadata only.
    ``extra_partitions`` are pre-consolidated (compacted) partitions whose
    manifests must not be rewritten."""
    parts: dict[str, list[dict]] = {}
    for fr in fragments:
        parts.setdefault(fr["partition"], []).append(fr)
    part_rows = list(extra_partitions or [])
    for part_id, frs in parts.items():
        frs = sorted(frs, key=lambda f: f["fragment"])
        doc = {
            "partition": part_id,
            "fragments": [f["fragment"] for f in frs],
            "rows": sum(f["rows"] for f in frs),
            "n_tokens": sum(f["n_tokens"] for f in frs),
            "raw_bytes": sum(f["raw_bytes"] for f in frs),
            "enc_bytes": sum(f["enc_bytes"] for f in frs),
        }
        st.write_json_atomic(st.join(_part_dir(out_dir, part_id), "manifest.json"), doc)
        part_rows.append({k: doc[k] for k in ("partition", "rows", "n_tokens", "raw_bytes", "enc_bytes")})
    fragment_lists = {pid: sorted(f["fragment"] for f in frs) for pid, frs in parts.items()}
    return write_global_manifest(out_dir, part_rows, extra=extra, fragment_lists=fragment_lists)
