"""Benchmark decontamination: flag/drop corpus documents whose character
n-grams overlap a (small) benchmark/eval set.

The standard training-data hygiene pass (n-gram overlap decontamination
as published for GPT-2/GPT-3 and The Pile): any document sharing at
least ``min_overlap`` distinct ``k``-grams with any benchmark document
is considered contaminated and excluded from training data.

Scale shape (100 TB-ready, zero shuffle):
- the benchmark shingle set is built ONCE (benchmark suites are tiny —
  thousands of documents) as a sorted unique uint64 array and broadcast
  with ``ray.put``;
- the corpus streams through one ``map_batches`` stage that computes
  every document's shingle hashes vectorized (the same rolling-window
  kernel as MinHash, ``dedup._shingle_hashes``) and counts distinct
  benchmark hits per row via ``searchsorted`` — no per-row Python, no
  all-to-all exchange, corpus text never leaves its block.

Exactness: with ``k <= 8`` the rolling key packs the k raw bytes into
one uint64 (injective) and ``_mix64`` is a bijection, so hash equality
is string equality — counts are EXACT, not approximate, and the
operator is SQL-oracle-checkable (``oracle_sql()['decontaminate_docs']``).
Documents shorter than ``k`` have no k-gram and count as clean.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .dedup import _shingle_hashes, string_buffers

__all__ = ["benchmark_shingle_set", "decontaminate"]


def benchmark_shingle_set(texts: list[str], k: int = 8) -> np.ndarray:
    """Sorted unique uint64 shingle hashes of the benchmark texts
    (documents shorter than ``k`` contribute nothing)."""
    if k > 8:
        raise ValueError("k must be <= 8 for exact (collision-free) hashing")
    kept = [t for t in texts if t is not None and len(t.encode()) >= k]
    if not kept:
        return np.zeros(0, dtype=np.uint64)
    hashes, _ = _shingle_hashes(pa.array(kept, pa.string()), k)
    return np.unique(hashes)


def _shingle_stats(col: pa.Array, bench: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (count of distinct k-gram hashes, count of those present
    in ``bench``) — one lexsort over the batch, no per-row Python."""
    n = len(col)
    hashes, sh_off = _shingle_hashes(col, k)
    n_distinct = np.zeros(n, dtype=np.int64)
    n_overlap = np.zeros(n, dtype=np.int64)
    if len(hashes) == 0:
        return n_distinct, n_overlap
    row_ids = np.repeat(np.arange(n, dtype=np.int64), np.diff(sh_off))
    # drop the padded pseudo-shingle of rows shorter than k bytes
    _, offsets = string_buffers(col)
    valid = (np.diff(offsets) >= k)[row_ids]
    rid, h = row_ids[valid], hashes[valid]
    if len(rid) == 0:
        return n_distinct, n_overlap
    order = np.lexsort((h, rid))
    rid, h = rid[order], h[order]
    first = np.ones(len(rid), dtype=bool)
    first[1:] = (rid[1:] != rid[:-1]) | (h[1:] != h[:-1])
    rid, h = rid[first], h[first]  # distinct (row, shingle) pairs
    np.add.at(n_distinct, rid, 1)
    if len(bench):
        pos = np.searchsorted(bench, h)
        hit = (pos < len(bench)) & (bench[np.minimum(pos, len(bench) - 1)] == h)
        np.add.at(n_overlap, rid[hit], 1)
    return n_distinct, n_overlap


def decontaminate(
    ds: rd.Dataset,
    benchmark_texts: list[str],
    *,
    k: int = 8,
    min_overlap: int = 10,
    min_frac_x1000: int = 800,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "filter",
) -> rd.Dataset:
    """Drop (``mode='filter'``) or annotate (``mode='annotate'``)
    documents overlapping the benchmark set.

    A document is contaminated when at least ``min_overlap`` of its
    distinct k-grams hit the benchmark AND the hitting share is at
    least ``min_frac_x1000``/1000 (integer arithmetic — The Pile's
    fraction criterion; the share, not the absolute count, is what
    separates a copied eval document from background vocabulary
    overlap). ``mode='annotate'`` keeps every row and appends
    ``n_distinct``/``n_overlap``/``contaminated``; ``mode='filter'``
    returns the clean rows with original columns — the form a training
    pipeline composes in front of the encoder."""
    if mode not in ("filter", "annotate"):
        raise ValueError(f"unknown mode {mode!r}")
    bench_ref = ray.put(benchmark_shingle_set(benchmark_texts, k))

    def stage(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        n_distinct, n_overlap = _shingle_stats(
            batch[text_col].combine_chunks(), bench, k
        )
        bad = (n_overlap >= min_overlap) & (
            1000 * n_overlap // np.maximum(n_distinct, 1) >= min_frac_x1000
        )
        if mode == "filter":
            return batch.filter(pa.array(~bad))
        return (
            batch.append_column("n_distinct", pa.array(n_distinct, pa.int64()))
            .append_column("n_overlap", pa.array(n_overlap, pa.int64()))
            .append_column("contaminated", pa.array(bad))
        )

    return ds.map_batches(stage, batch_format="pyarrow")
