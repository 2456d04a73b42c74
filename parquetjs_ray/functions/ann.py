"""Approximate-nearest-neighbor search over an embedding column.

* brute-force cosine top-k: the baseline — query matrix broadcast via
  ``ray.put`` once, per-batch numpy matmul + partial top-k, driver merge
  of the per-batch candidates (k × batches rows, tiny).
* IVF top-k: the scale path — a kmeans-lite codebook trained on a
  sample (driver-side numpy), every batch assigns its vectors to the
  nearest centroid; queries probe only ``nprobe`` closest lists. Same
  merge; recall measured against brute force in tests.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

__all__ = ["topk_bruteforce", "kmeans_lite", "topk_ivf"]


def _matrix(batch: pa.Table, vec_col: str, dim: int) -> np.ndarray:
    arr = batch[vec_col].combine_chunks() if isinstance(batch[vec_col], pa.ChunkedArray) else batch[vec_col]
    return np.asarray(arr.values.to_numpy(zero_copy_only=False), dtype=np.float32).reshape(-1, dim)


def _merge_topk(parts: list[dict], k: int) -> pa.Table:
    """Driver-side merge of per-batch candidates → exact global top-k."""
    per_query: dict[int, list] = {}
    for row in parts:
        per_query.setdefault(row["query_id"], []).append((row["score"], row["vec_id"]))
    out = []
    for q, cands in sorted(per_query.items()):
        best = heapq.nlargest(k, cands)
        out += [
            {"query_id": q, "rank": r + 1, "vec_id": vid, "score": float(s)}
            for r, (s, vid) in enumerate(best)
        ]
    return pa.Table.from_pylist(out)


def topk_bruteforce(
    ds: rd.Dataset,
    queries: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    dim: int = 64,
) -> pa.Table:
    """Exact cosine top-k; (query_id, rank, vec_id, score)."""
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    q_ref = ray.put(qn.astype(np.float32))

    def per_batch(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _matrix(batch, vec_col, dim)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ q.T  # (n, nq)
        ids = np.asarray(batch[id_col].to_pylist())
        kk = min(k, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # per-query candidates
        rows = []
        for qi in range(q.shape[0]):
            for r in top[:, qi]:
                rows.append({"query_id": qi, "vec_id": int(ids[r]), "score": float(sims[r, qi])})
        return pa.Table.from_pylist(rows)

    parts = ds.map_batches(per_batch, batch_format="pyarrow").take_all()
    return _merge_topk(parts, k)


def kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 8, seed: int = 3) -> np.ndarray:
    """Tiny numpy k-means (driver-side, runs on a sample)."""
    rng = np.random.default_rng(seed)
    centers = sample[rng.choice(len(sample), n_clusters, replace=False)].astype(np.float64)
    for _ in range(iters):
        d = ((sample[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_clusters):
            pts = sample[assign == c]
            if len(pts):
                centers[c] = pts.mean(axis=0)
    return centers.astype(np.float32)


def topk_ivf(
    ds: rd.Dataset,
    queries: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    dim: int = 64,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_rows: int = 2048,
    seed: int = 3,
) -> pa.Table:
    """IVF-flat: probe only the ``nprobe`` nearest centroid lists.

    Per-batch the non-probed vectors are masked out before the matmul —
    at scale the assignment would also drive partition pruning (store
    one partition per list, skip unprobed partitions at the read)."""
    sample = np.stack(
        [np.asarray(r[vec_col], dtype=np.float32) for r in ds.take(sample_rows)]
    )
    centers = kmeans_lite(sample, n_clusters, seed=seed)
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    qd = ((qn[:, None, :] - centers[None, :, :] / np.maximum(np.linalg.norm(centers, axis=1), 1e-12)[None, :, None]) ** 2).sum(axis=2)
    probed = np.argsort(qd, axis=1)[:, :nprobe]  # (nq, nprobe)
    bundle_ref = ray.put((qn.astype(np.float32), centers, probed))

    def per_batch(batch: pa.Table) -> pa.Table:
        q, cent, probes = ray.get(bundle_ref)
        m = _matrix(batch, vec_col, dim)
        ids = np.asarray(batch[id_col].to_pylist())
        d = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = mn @ q.T
        rows = []
        for qi in range(q.shape[0]):
            mask = np.isin(assign, probes[qi])
            if not mask.any():
                continue
            cand = np.flatnonzero(mask)
            kk = min(k, len(cand))
            top = cand[np.argpartition(-sims[cand, qi], kk - 1)[:kk]]
            rows += [
                {"query_id": qi, "vec_id": int(ids[r]), "score": float(sims[r, qi])} for r in top
            ]
        return pa.Table.from_pylist(rows) if rows else pa.table(
            {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
        )

    parts = ds.map_batches(per_batch, batch_format="pyarrow").take_all()
    return _merge_topk(parts, k)
