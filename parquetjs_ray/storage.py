"""Pluggable storage behind ``pyarrow.fs`` — local paths and URIs.

The reference abstracts its sink behind pluggable stream functions
(`/root/reference/lib/util.js:58-144`, `lib/writer.js:54-65`); this is
the Ray-native analogue: every chunk/manifest byte goes through this
module, so an artifact can live on a local disk (plain paths), an
explicit ``file://`` URI, or a shared object store (``s3://...``) that a
multi-node cluster can actually reach.

Atomic-commit semantics per backend:

* **Local filesystems**: writes land in a temp name then an atomic
  ``move`` (POSIX rename) — a concurrent retry loses the race cleanly.
* **Object stores** (no rename): writes stream directly to the final
  key; a single PUT is atomic per object, and the engine's commit
  protocol orders data first, marker (`*.json`) last, with DETERMINISTIC
  content — so a racing retry performs a last-writer-wins overwrite with
  identical bytes, which is still a correct commit.
"""

from __future__ import annotations

import json
import uuid

__all__ = [
    "get_fs",
    "exists",
    "makedirs",
    "read_bytes",
    "read_json",
    "write_bytes_atomic",
    "write_json_atomic",
    "list_names",
    "remove_quiet",
    "join",
    "is_remote",
]

_FS_CACHE: dict[str, tuple] = {}


def get_fs(path: str):
    """(filesystem, fs-internal path) for a plain path or URI."""
    from pyarrow import fs as pafs

    if "://" in path:
        scheme = path.split("://", 1)[0]
        # resolve per-call (the internal path differs per URI) but cache
        # nothing heavier than the constructor — from_uri is cheap for
        # local/file and memoizing full URIs would grow unboundedly
        fs_, p = pafs.FileSystem.from_uri(path)
        return fs_, p
    local = _FS_CACHE.get("local")
    if local is None:
        local = pafs.LocalFileSystem()
        _FS_CACHE["local"] = local
    return local, path


def is_remote(path: str) -> bool:
    return "://" in path and not path.startswith("file://")


def join(base: str, *parts: str) -> str:
    out = base.rstrip("/")
    for p in parts:
        out += "/" + p.strip("/")
    return out


def exists(path: str) -> bool:
    from pyarrow import fs as pafs

    f, p = get_fs(path)
    return f.get_file_info(p).type != pafs.FileType.NotFound


def makedirs(path: str) -> None:
    f, p = get_fs(path)
    f.create_dir(p, recursive=True)


def read_bytes(path: str) -> bytes:
    f, p = get_fs(path)
    with f.open_input_stream(p) as s:
        return s.read()


def read_json(path: str) -> dict:
    return json.loads(read_bytes(path).decode())


def _write_stream(f, p: str, data: bytes) -> None:
    with f.open_output_stream(p) as s:
        s.write(data)


def write_bytes_atomic(path: str, data: bytes) -> bool:
    """Write bytes; atomic on local FS (tmp + rename), direct PUT on
    object stores. Returns False if a concurrent writer won an atomic
    race (the existing object is treated as the committed one)."""
    f, p = get_fs(path)
    if is_remote(path):
        _write_stream(f, p, data)
        return True
    tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
    _write_stream(f, tmp, data)
    try:
        f.move(tmp, p)
        return True
    except OSError:
        try:
            f.delete_file(tmp)
        except OSError:
            pass
        return False


def write_json_atomic(path: str, obj: dict) -> bool:
    return write_bytes_atomic(path, json.dumps(obj).encode())


def list_names(path: str) -> list[str]:
    """Base names of entries directly under ``path`` ([] if absent)."""
    from pyarrow import fs as pafs

    f, p = get_fs(path)
    try:
        infos = f.get_file_info(pafs.FileSelector(p, recursive=False))
    except (OSError, FileNotFoundError):
        return []
    return sorted(i.base_name for i in infos)


def read_ranges(path: str, ranges: list[tuple[int, int]]) -> list[bytes]:
    """Read byte ranges ``(offset, length)`` from one file with a single
    open + seeks — the column-chunk byte-range read (only requested
    segments leave storage; on object stores these become ranged GETs)."""
    f, p = get_fs(path)
    out = []
    with f.open_input_file(p) as fh:
        for off, ln in ranges:
            fh.seek(off)
            out.append(fh.read(ln))
    return out


def remove_quiet(path: str) -> None:
    f, p = get_fs(path)
    try:
        f.delete_file(p)
    except (OSError, FileNotFoundError):
        pass
