"""parquetjs_ray — a Ray-Data-native per-column lightweight-compression engine.

Capabilities modeled on ironSource/parquetjs (reference at
/root/reference, see SURVEY.md), re-designed Ray-Data-first: streaming
Dataset pipelines, zero-copy Arrow batches, actor pools holding
broadcast dictionary/FSST artifacts, salted repartition for skew,
per-partition lineage manifests with checkpoint-resume.
"""

from __future__ import annotations


def _tune_malloc() -> None:
    """Pin glibc's mmap/trim thresholds high.

    This sandbox makes first-touch page faults on freshly mmap'd
    private-anonymous memory extremely expensive (~0.5 ms/page). With
    glibc defaults every large numpy temporary is mmap'd on malloc and
    munmap'd on free, so the fault cost recurs per operation (~1000×
    slowdown on >1 MB arrays). Raising M_MMAP_THRESHOLD / M_TRIM_THRESHOLD
    keeps big allocations on the brk heap and keeps freed pages mapped,
    so the fault cost is paid once per worker process. Applied at import
    time, which covers every Ray worker that deserializes our stages.
    """
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass  # non-glibc platform: harmless no-op


def _tune_arrow() -> None:
    """Stop pyarrow's jemalloc from purging dirty pages back to the OS —
    same sandbox fault-cost rationale as :func:`_tune_malloc`."""
    try:
        import pyarrow as pa

        pa.jemalloc_set_decay_ms(-1)
    except Exception:
        pass


_tune_malloc()
_tune_arrow()

_WARMED = False


def warm_worker(nbytes: int = 1 << 28) -> None:
    """One-time per-process heap warmup (numpy/glibc + pyarrow/jemalloc).

    NOTE: with the malloc thresholds pinned (see :func:`_tune_malloc`)
    organic heap growth pays the same one-time fault cost as an eager
    warmup, so the engine does NOT call this in its stages anymore —
    keeping per-operation temporaries small (see codecs) is the real
    lever. Retained for experiments/benchmarks.
    """
    global _WARMED
    if _WARMED:
        return
    _WARMED = True
    try:
        import numpy as np

        x = np.empty(nbytes, dtype=np.uint8)
        x[::512] = 1
        del x
    except Exception:
        pass
    try:
        import pyarrow as pa

        buf = pa.allocate_buffer(nbytes)
        mv = memoryview(buf)
        step = 512
        mv[::step] = b"\x01" * len(mv[::step])
        del mv, buf
    except Exception:
        pass


MALLOC_ENV = {
    # same tuning for child processes that must be fast from birth
    "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
    "MALLOC_TRIM_THRESHOLD_": str(1 << 30),
}
