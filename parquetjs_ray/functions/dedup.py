"""Deduplication operators for training-data pipelines.

Ray-Data-first shapes (see /opt/skills/guides/ray_guide.md "Aggregation
at scale"):

* **exact**: content hash inside ``map_batches`` → ``groupby(hash)`` →
  representative per group. Only the 8-byte hash + id shuffle, never the
  text.
* **MinHash+LSH near-dup**: per-batch vectorized shingle→minhash
  signatures → explode to (band_id, band_hash, doc_id) rows →
  ``groupby(band)`` → candidate pairs → exact-Jaccard verify →
  connected components on the (small) candidate edge set.
* **SimHash**: 64-bit signature per doc; Hamming-band buckets give
  candidates the same way.
* **embedding cosine near-dup**: sign-LSH buckets over random
  hyperplanes → in-bucket cosine verify.

All signatures are computed with numpy over Arrow buffers — no per-row
Python over characters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..arrow_util import string_buffers
from .text import fingerprint64

__all__ = [
    "exact_dedup",
    "ngram_jaccard",
    "minhash_signatures",
    "minhash_dedup",
    "simhash_signatures",
    "embedding_near_dup",
]

_U = np.uint64
_P1 = _U(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> _U(30))) * _U(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U(27))) * _U(0x94D049BB133111EB)
    return x ^ (x >> _U(31))


# ───────────────────────── exact ─────────────────────────


def exact_dedup(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Representative (min id) + copy count per distinct content.

    Shuffles only (hash, id) pairs — at 10^12 rows the text never moves."""
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        fp = fingerprint64(batch[text_col])
        return pa.table({id_col: batch[id_col], "__fp": pa.array(fp.view(np.int64))})

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("__fp")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_copies"))
        .select_columns([id_col, "n_copies"])
    )


def ngram_jaccard(
    ds: rd.Dataset,
    pairs: list[tuple[int, int]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
) -> pa.Table:
    """Exact character n-gram Jaccard for given candidate id pairs.

    The verify stage of any near-dup pipeline (LSH proposes, Jaccard
    disposes): texts for the (small) candidate id set are fetched with a
    broadcast filter, similarity ×1000 is returned as an integer."""
    ids = sorted({i for p in pairs for i in p})
    texts = _collect_texts(ds, ids, id_col, text_col)
    sh = {
        i: {texts[i][j : j + shingle_k] for j in range(max(1, len(texts[i]) - shingle_k + 1))}
        for i in ids
        if i in texts
    }
    rows = []
    for a, b in sorted(set(pairs)):
        sa, sb = sh.get(a), sh.get(b)
        jac = len(sa & sb) * 1000 // max(1, len(sa | sb)) if sa and sb else 0
        rows.append({"a": a, "b": b, "jaccard_x1000": jac})
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()), "jaccard_x1000": pa.array([], pa.int64())}
    )


# ───────────────────── MinHash + LSH ─────────────────────


def _shingle_hashes(batch_col, k: int) -> tuple[np.ndarray, np.ndarray]:
    """All k-byte shingle hashes for every string (vectorized rolling
    window over the concatenated utf8 buffer) → (hashes, row offsets)."""
    data, offsets = string_buffers(batch_col)
    n = len(offsets) - 1
    lens = np.diff(offsets)
    nsh = np.maximum(lens - k + 1, 1)  # short docs: one (padded) shingle
    padded = np.zeros(len(data) + k, dtype=np.uint8)
    padded[: len(data)] = data
    # rolling k-byte keys at every byte position
    w = np.zeros(len(data), dtype=np.uint64)
    for i in range(k):
        w |= padded[i : i + len(data)].astype(np.uint64) << _U(8 * (i % 8))
    w = _mix64(w)
    # positions of each row's shingles: starts[r] .. starts[r]+nsh[r]
    sh_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nsh, out=sh_off[1:])
    idx = np.repeat(offsets[:-1], nsh) + (np.arange(int(sh_off[-1])) - np.repeat(sh_off[:-1], nsh))
    return w[np.minimum(idx, len(w) - 1)] if len(w) else np.zeros(int(sh_off[-1]), dtype=np.uint64), sh_off


def minhash_signatures(
    batch: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_k: int = 5,
    seed: int = 7,
) -> tuple[np.ndarray, pa.Array]:
    """(n, num_perm) uint64 MinHash signature matrix for one batch."""
    hashes, sh_off = _shingle_hashes(batch[text_col], shingle_k)
    n = batch.num_rows
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 62, num_perm, dtype=np.uint64) | _U(1)
    b = rng.integers(0, 1 << 62, num_perm, dtype=np.uint64)
    sigs = np.empty((n, num_perm), dtype=np.uint64)
    starts = sh_off[:-1]
    for p in range(num_perm):  # vectorized over all shingles per permutation
        hp = hashes * a[p] + b[p]
        sigs[:, p] = np.minimum.reduceat(hp, starts) if len(hp) else _U(0)
    return sigs, batch[id_col]


def _band_rows(sigs: np.ndarray, ids: pa.Array, bands: int) -> pa.Table:
    n, num_perm = sigs.shape
    r = num_perm // bands
    band_hash = _mix64(
        sigs.reshape(n, bands, r).astype(np.uint64).sum(axis=2, dtype=np.uint64)
        ^ _mix64(sigs.reshape(n, bands, r)[:, :, 0])
    )
    band_id = np.broadcast_to(np.arange(bands, dtype=np.int32), (n, bands))
    ids_rep = pa.concat_arrays([ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids] * 1)
    return pa.table(
        {
            "doc_id": pa.compute.take(ids_rep, pa.array(np.repeat(np.arange(n), bands))),
            "band_id": pa.array(band_id.reshape(-1)),
            "band_hash": pa.array(band_hash.reshape(-1).view(np.int64)),
        }
    )


def minhash_dedup(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    seed: int = 7,
) -> pa.Table:
    """Near-duplicate clusters → table (doc_id, cluster_id).

    cluster_id = min doc_id of the verified near-dup cluster; singleton
    docs are omitted. Candidate pairs come from LSH band collisions;
    pairs are verified with exact shingle Jaccard before clustering
    (union-find on the small verified edge set, driver-side)."""

    def to_bands(batch: pa.Table) -> pa.Table:
        sigs, ids = minhash_signatures(
            batch, text_col=text_col, id_col=id_col, num_perm=num_perm, shingle_k=shingle_k, seed=seed
        )
        return _band_rows(sigs, ids, bands)

    def collisions(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ids = sorted(group["doc_id"].to_pylist())
        rep = ids[0]
        return pa.table(
            {"a": pa.array([rep] * (len(ids) - 1), pa.int64()), "b": pa.array(ids[1:], pa.int64())}
        )

    edges = (
        ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(collisions, batch_format="pyarrow")
        .take_all()
    )
    if not edges:
        return pa.table({"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})

    # verify candidate pairs with exact Jaccard over shingle sets
    cand_ids = sorted({e["a"] for e in edges} | {e["b"] for e in edges})
    texts = _collect_texts(ds, cand_ids, id_col, text_col)
    shingles = {
        i: {texts[i][j : j + shingle_k] for j in range(max(1, len(texts[i]) - shingle_k + 1))}
        for i in cand_ids
        if i in texts
    }
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for e in edges:
        a, b = int(e["a"]), int(e["b"])
        sa, sb = shingles.get(a), shingles.get(b)
        if not sa or not sb:
            continue
        jac = len(sa & sb) / max(1, len(sa | sb))
        if jac >= jaccard_threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    clusters: dict[int, list[int]] = {}
    for x in list(parent):
        clusters.setdefault(find(x), []).append(x)
    rows = [
        {"doc_id": m, "cluster_id": root}
        for root, members in clusters.items()
        if len(members) > 1
        for m in sorted(members)
    ]
    if not rows:
        return pa.table({"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})
    return pa.Table.from_pylist(sorted(rows, key=lambda r: (r["cluster_id"], r["doc_id"])))


def _collect_texts(ds: rd.Dataset, ids: list[int], id_col: str, text_col: str) -> dict[int, str]:
    """Fetch the texts of candidate ids (small set) via a broadcast filter."""
    idset = set(ids)

    def pick(batch: pa.Table) -> pa.Table:
        mask = pa.array([i in idset for i in batch[id_col].to_pylist()])
        return batch.filter(mask).select([id_col, text_col])

    rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    return {r[id_col]: r[text_col] for r in rows}


# ───────────────────────── SimHash ─────────────────────────


def simhash_signatures(batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """64-bit SimHash per doc from 4-byte shingle hashes (vectorized:
    per-bit counts via reduceat over the shingle hash stream)."""
    hashes, sh_off = _shingle_hashes(batch[text_col], 4)
    n = batch.num_rows
    starts = sh_off[:-1]
    nsh = np.diff(sh_off)
    sig = np.zeros(n, dtype=np.uint64)
    for bit in range(64):
        bits = ((hashes >> _U(bit)) & _U(1)).astype(np.int64)
        ones = np.add.reduceat(bits, starts) if len(bits) else np.zeros(n, dtype=np.int64)
        sig |= ((ones * 2 > nsh).astype(np.uint64)) << _U(bit)
    return pa.table({id_col: batch[id_col], "simhash": pa.array(sig.view(np.int64))})


# ─────────────── embedding cosine near-dup ───────────────


def embedding_near_dup(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    planes: int = 12,
    cosine_threshold: float = 0.95,
    seed: int = 11,
) -> pa.Table:
    """Sign-LSH buckets over random hyperplanes → in-bucket cosine verify
    → (id, dup_of) pairs. The hyperplane matrix is broadcast once."""
    rng = np.random.default_rng(seed)
    planes_m = rng.standard_normal((dim, planes)).astype(np.float32)

    def bucket(batch: pa.Table) -> pa.Table:
        arr = batch[vec_col].combine_chunks() if isinstance(batch[vec_col], pa.ChunkedArray) else batch[vec_col]
        m = np.asarray(arr.values.to_numpy(zero_copy_only=False)).reshape(-1, dim)
        signs = (m @ planes_m) > 0
        code = (signs * (1 << np.arange(planes))).sum(axis=1).astype(np.int64)
        norm = np.linalg.norm(m, axis=1).astype(np.float64)
        return pa.table({id_col: batch[id_col], "bucket": pa.array(code), "vec": batch[vec_col], "norm": pa.array(norm)})

    def verify(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ids = np.array(group[id_col].to_pylist())
        vecs = np.asarray(group["vec"].combine_chunks().values.to_numpy(zero_copy_only=False)).reshape(len(ids), dim)
        norms = np.array(group["norm"].to_pylist())
        sims = (vecs @ vecs.T) / np.maximum(np.outer(norms, norms), 1e-12)
        ii, jj = np.where(np.triu(sims >= cosine_threshold, k=1))
        a = np.minimum(ids[ii], ids[jj])
        b = np.maximum(ids[ii], ids[jj])
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    pairs = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pyarrow")
        .take_all()
    )
    rows = sorted({(int(p["a"]), int(p["b"])) for p in pairs})
    if not rows:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    return pa.table({"a": pa.array([r[0] for r in rows]), "b": pa.array([r[1] for r in rows])})
