"""Nearest-neighbor search over an embedding column.

* brute-force cosine top-k: the exact baseline — query matrix broadcast
  via ``ray.put`` once, per-batch numpy matmul (float64 for rank
  stability vs a SQL oracle) + partial top-k, driver merge of the
  per-batch candidates (k × batches rows, tiny).
* IVF top-k: the scale path — a kmeans-lite codebook trained on a
  sample; :func:`build_ivf_index` writes ONE PARTITION PER INVERTED
  LIST (the engine's partition layout applied to ANN), and
  :func:`topk_ivf` reads ONLY the ``nprobe`` probed lists — unprobed
  partitions are pruned before any byte is read, so the query reads
  strictly fewer rows than brute force. Recall is measured against
  brute force in tests.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

__all__ = [
    "topk_bruteforce",
    "kmeans_lite",
    "kmeans_distributed",
    "assign_clusters",
    "build_ivf_index",
    "topk_ivf",
    "pca_fit",
    "pca_transform",
    "pq_train",
    "pq_encode",
    "pq_topk",
]


def _matrix(batch: pa.Table, vec_col: str, dim: int) -> np.ndarray:
    arr = batch[vec_col].combine_chunks() if isinstance(batch[vec_col], pa.ChunkedArray) else batch[vec_col]
    return np.asarray(arr.values.to_numpy(zero_copy_only=False), dtype=np.float64).reshape(-1, dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _batch_topk(sims: np.ndarray, ids: np.ndarray, k: int) -> pa.Table:
    """Vectorized per-batch candidate extraction: (n, nq) sims → one
    table (query_id, vec_id, score) with ≤ k rows per query."""
    n, nq = sims.shape
    kk = min(k, n)
    top = np.argpartition(-sims, kk - 1, axis=0)[:kk] if kk < n else np.broadcast_to(
        np.arange(n)[:, None], (n, nq)
    )
    scores = np.take_along_axis(sims, top, axis=0)  # (kk, nq)
    return pa.table(
        {
            "query_id": pa.array(np.repeat(np.arange(nq, dtype=np.int64), kk)),
            "vec_id": pa.array(ids[top.T.reshape(-1)].astype(np.int64)),
            "score": pa.array(scores.T.reshape(-1)),
        }
    )


def _merge_topk(parts: list[dict], k: int) -> pa.Table:
    """Driver-side merge of per-batch candidates → exact global top-k.

    Tie-break on equal scores is ascending vec_id (the SQL
    ``ORDER BY score DESC, vec_id`` convention); scores for identical
    vectors are bit-identical across batches (same row-local float64
    computation), so ranking is deterministic."""
    per_query: dict[int, list] = {}
    for row in parts:
        per_query.setdefault(row["query_id"], []).append((row["score"], row["vec_id"]))
    out = []
    for q, cands in sorted(per_query.items()):
        best = sorted(cands, key=lambda t: (-t[0], t[1]))[:k]
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
    q_ref = ray.put(_normalize(np.asarray(queries, dtype=np.float64)))

    def per_batch(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)  # zero-copy numpy view from the object store
        mn = _normalize(_matrix(batch, vec_col, dim))
        sims = mn @ q.T  # (n, nq) float64
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return _batch_topk(sims, ids, k)

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
    return centers


def _kmeanspp(sample: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """k-means++ seeding on the driver sample: each next seed is drawn
    ∝ distance² to the nearest chosen seed — avoids the stranded-center
    pathology of uniform seeding (Arthur & Vassilvitskii, SODA 2007)."""
    x = sample.astype(np.float64)
    centers = np.empty((k, x.shape[1]), dtype=np.float64)
    centers[0] = x[rng.integers(len(x))]
    d2 = ((x - centers[0]) ** 2).sum(axis=1)
    for i in range(1, k):
        p = d2 / max(d2.sum(), 1e-300)
        centers[i] = x[rng.choice(len(x), p=p)]
        d2 = np.minimum(d2, ((x - centers[i]) ** 2).sum(axis=1))
    return centers


def kmeans_distributed(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    dim: int = 64,
    n_clusters: int = 16,
    iters: int = 8,
    seed: int = 3,
    init: np.ndarray | None = None,
    sample_rows: int = 2048,
) -> tuple[np.ndarray, list[float]]:
    """Distributed Lloyd's k-means over a Dataset column — the iterative-
    algorithm shape on Ray Data: each iteration is ONE streaming
    ``map_batches`` pass; a batch reduces itself to (k × dim sums,
    k counts, Σ min-dist²) partials, so only kilobytes reach the driver
    per task and the corpus is never shuffled or materialized. Centers
    broadcast per iteration via ``ray.put``.

    Returns ``(centers, inertia_history)``; inertia is the true global
    Σ‖x − c(x)‖² of the assignment each iteration started from, so the
    history is monotone non-increasing (Lloyd's invariant — pinned in
    tests). Empty clusters keep their previous center."""
    if init is not None:
        centers = np.asarray(init, dtype=np.float64)
    else:
        sample = np.stack(
            [np.asarray(r[vec_col], dtype=np.float64) for r in ds.take(sample_rows)]
        )
        centers = _kmeanspp(sample, n_clusters, np.random.default_rng(seed))

    inertia: list[float] = []
    for _ in range(iters):
        c_ref = ray.put(centers)

        def partial(batch: pa.Table) -> pa.Table:
            cent = ray.get(c_ref)  # zero-copy from plasma, per task
            m = _matrix(batch, vec_col, dim)
            # argmin ‖x−c‖² via the dot-product identity (k×dim matmul,
            # no (n,k,dim) broadcast temp)
            d2 = (cent * cent).sum(axis=1)[None, :] - 2.0 * (m @ cent.T)
            assign = d2.argmin(axis=1)
            sq = float((m * m).sum() + d2[np.arange(len(m)), assign].sum())
            counts = np.bincount(assign, minlength=len(cent)).astype(np.int64)
            # counting-sort gather + reduceat: one pass, no per-cluster loop
            order = np.argsort(assign, kind="stable")
            sums = np.zeros((len(cent), m.shape[1]), dtype=np.float64)
            nz = np.flatnonzero(counts)
            if len(nz):
                offs = np.concatenate(([0], np.cumsum(counts[nz])))[:-1]
                sums[nz] = np.add.reduceat(m[order], offs, axis=0)
            return pa.table(
                {
                    "sums": pa.array([sums.tobytes()], pa.binary()),
                    "counts": pa.array([counts.tobytes()], pa.binary()),
                    "sq": pa.array([sq], pa.float64()),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros((n_clusters, centers.shape[1]), dtype=np.float64)
        counts = np.zeros(n_clusters, dtype=np.int64)
        total_sq = 0.0
        for r in parts:
            sums += np.frombuffer(r["sums"], dtype=np.float64).reshape(sums.shape)
            counts += np.frombuffer(r["counts"], dtype=np.int64)
            total_sq += r["sq"]
        inertia.append(total_sq)
        nz = counts > 0
        centers = centers.copy()
        centers[nz] = sums[nz] / counts[nz, None]
    return centers, inertia


def assign_clusters(
    ds: rd.Dataset,
    centers: np.ndarray,
    *,
    vec_col: str = "embedding",
    dim: int = 64,
    out_col: str = "cluster_id",
) -> rd.Dataset:
    """Append each row's nearest-center index — the assignment kernel
    shared by Lloyd's k-means and the IVF partitioner, exposed as a
    standalone streaming operator (cluster-tag a corpus once against a
    fixed codebook). One ``ray.put`` broadcast of the codebook; each
    batch is a float64 ``k×dim`` matmul via the dot-product identity
    (no ``(n,k,dim)`` broadcast temp); ties break to the lowest center
    index (argmin order, matching the SQL replica's tie-break)."""
    c_ref = ray.put(np.asarray(centers, dtype=np.float64))

    def tag(batch: pa.Table) -> pa.Table:
        cent = ray.get(c_ref)  # zero-copy from plasma, per task
        m = _matrix(batch, vec_col, dim)
        d2 = (cent * cent).sum(axis=1)[None, :] - 2.0 * (m @ cent.T)
        return batch.append_column(out_col, pa.array(d2.argmin(axis=1).astype(np.int64)))

    return ds.map_batches(tag, batch_format="pyarrow")


def build_ivf_index(
    ds: rd.Dataset,
    index_dir: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_clusters: int = 16,
    sample_rows: int = 2048,
    seed: int = 3,
) -> dict:
    """Partition the corpus into one directory per inverted list.

    Layout: ``index_dir/list-<i>/part-*.parquet`` + ``centers.npy`` +
    ``meta.json``. Assignment is a vectorized per-batch argmin against
    the broadcast codebook; each task writes its rows grouped by list —
    no shuffle (the same shuffle-free fragment shape as the encoder's
    files mode).

    Retry/crash safety (same contract as ``stages/writer.py``):
    fragment names are DETERMINISTIC content hashes of (list_id, id
    column bytes), so a Ray task retry rewrites the same file instead of
    leaving a duplicate; the whole index is built in a ``.tmp`` sibling
    and atomically published only after ``meta.json`` lands — a crash
    mid-build leaves no half-index at ``index_dir`` for a later run's
    meta.json-existence cache to pick up."""
    import hashlib
    import shutil

    build_dir = os.path.normpath(index_dir) + ".tmp"
    shutil.rmtree(build_dir, ignore_errors=True)

    sample = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in ds.take(sample_rows)])
    centers = kmeans_lite(sample, n_clusters, seed=seed)
    os.makedirs(build_dir, exist_ok=True)
    np.save(os.path.join(build_dir, "centers.npy"), centers)
    c_ref = ray.put(centers)

    def write_lists(batch: pa.Table) -> pa.Table:
        cent = ray.get(c_ref)
        m = _matrix(batch, vec_col, dim)
        d = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        ids_all = batch[id_col].to_numpy(zero_copy_only=False)
        rows = []
        for li in np.unique(assign):
            sub = batch.take(pa.array(np.flatnonzero(assign == li)))
            sub = sub.append_column("list_id", pa.array(np.full(sub.num_rows, int(li), dtype=np.int64)))
            ldir = os.path.join(build_dir, f"list-{int(li)}")
            os.makedirs(ldir, exist_ok=True)
            frag = hashlib.sha1(
                f"{int(li)}:".encode() + np.ascontiguousarray(ids_all[assign == li]).tobytes()
            ).hexdigest()[:16]
            final = os.path.join(ldir, f"part-{frag}.parquet")
            if not os.path.exists(final):  # idempotent on task retry
                tmp = os.path.join(ldir, f".tmp-{frag}")
                pq.write_table(sub, tmp)
                os.replace(tmp, final)
            rows.append({"list_id": int(li), "rows": sub.num_rows, "frag": frag})
        return pa.Table.from_pylist(rows)

    stats = ds.map_batches(write_lists, batch_format="pyarrow").take_all()
    list_rows: dict[int, int] = {}
    seen: set[tuple[int, str]] = set()
    for r in stats:
        if (r["list_id"], r["frag"]) in seen:  # retried task double-reported
            continue
        seen.add((r["list_id"], r["frag"]))
        list_rows[r["list_id"]] = list_rows.get(r["list_id"], 0) + r["rows"]
    meta = {
        "n_clusters": n_clusters,
        "dim": dim,
        "vec_col": vec_col,
        "id_col": id_col,
        "list_rows": {str(k): v for k, v in sorted(list_rows.items())},
        "total_rows": int(sum(list_rows.values())),
    }
    with open(os.path.join(build_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    # atomic publish: meta.json is already inside, so a reader either
    # sees the complete index or none at all
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(build_dir, index_dir)
    return meta


def topk_ivf(
    index_dir: str,
    queries: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
) -> tuple[pa.Table, dict]:
    """IVF-flat query over a :func:`build_ivf_index` layout.

    Only the ``nprobe`` lists nearest each query are READ — pruning
    happens at the parquet-path level before any vector byte moves.
    Returns (topk table, stats): ``rows_read_union`` = rows in the union
    of probed lists (bytes actually read), ``rows_scanned`` = Σ per-query
    probed-list rows (distance computations actually done; brute force
    would do ``n_queries × rows_total``), ``rows_total``."""
    centers = np.load(os.path.join(index_dir, "centers.npy"))
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    cn = _normalize(centers)
    qd = ((qn[:, None, :] - cn[None, :, :]) ** 2).sum(axis=2)
    probed = np.argsort(qd, axis=1)[:, :nprobe]  # (nq, nprobe)
    import glob as globmod

    lists_needed = sorted({int(li) for li in probed.reshape(-1) if str(int(li)) in meta["list_rows"]})
    paths = [
        p
        for li in lists_needed
        for p in sorted(globmod.glob(os.path.join(index_dir, f"list-{li}", "part-*.parquet")))
    ]
    rows_read = sum(meta["list_rows"][str(li)] for li in lists_needed)
    rows_scanned = int(
        sum(
            meta["list_rows"].get(str(int(li)), 0)
            for qi in range(len(qn))
            for li in probed[qi]
        )
    )

    # per-list query mask: which queries probe which list
    probe_sets = {li: np.array([qi for qi in range(len(qn)) if li in probed[qi]]) for li in lists_needed}
    bundle_ref = ray.put((qn, probe_sets))
    vec_col, id_col, dim = meta["vec_col"], meta["id_col"], meta["dim"]
    empty = pa.table(
        {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
    )

    def per_batch(batch: pa.Table) -> pa.Table:
        q, psets = ray.get(bundle_ref)
        lids = batch["list_id"].to_numpy(zero_copy_only=False)
        mn = _normalize(_matrix(batch, vec_col, dim))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        tables = []
        for li in np.unique(lids):  # a Ray batch may coalesce several lists
            qs = psets.get(int(li))
            if qs is None or not len(qs):
                continue
            rowsel = np.flatnonzero(lids == li)
            sims = mn[rowsel] @ q[qs].T  # only the queries probing this list
            out = _batch_topk(sims, ids[rowsel], k)
            # map local query indices back to global query ids
            tables.append(
                out.set_column(0, "query_id", pa.array(qs[out["query_id"].to_numpy()], type=pa.int64()))
            )
        return pa.concat_tables(tables) if tables else empty

    parts = (
        rd.read_parquet(paths).map_batches(per_batch, batch_format="pyarrow").take_all()
        if paths
        else []
    )
    return _merge_topk(parts, k), {
        "rows_read_union": rows_read,
        "rows_scanned": rows_scanned,
        "rows_total": meta["total_rows"],
        "n_queries": len(qn),
    }


def pca_fit(ds: rd.Dataset, *, col: str = "embedding", k: int = 16):
    """Distributed PCA: top-``k`` principal components of an embedding
    column — the dimensionality-reduction front end for ANN / near-dup
    at scale (64→16 dims is a 4× matmul and index shrink).

    One streaming pass accumulates per-block (n, Σx, XᵀX) partials
    (d + d² floats per block — kilobytes, never rows), combined through
    a FIXED-SHAPE tree reduce (fan-in 64, blocks in index order inside
    each node): float addition order is a pure function of the block
    count, so the result is deterministic, and the driver only ever
    holds ceil(blocks/64) partials instead of all of them. The tiny
    d×d covariance eigendecomposition runs locally. Sign convention:
    each component's largest-|entry| coordinate is made positive, so
    the basis is a deterministic function of the data. Returns
    ``(mean: (d,), components: (k, d) float64)``.
    """
    import ray

    @ray.remote(num_cpus=1)
    def _moments(block: pa.Table):
        arr = block[col].combine_chunks() if isinstance(block[col], pa.ChunkedArray) else block[col]
        d = len(arr[0]) if len(arr) else 0
        m = _matrix(block, col, d) if d else np.zeros((0, 0))
        return len(m), m.sum(axis=0), m.T @ m

    @ray.remote(num_cpus=1)
    def _combine(*parts):
        parts = [p for p in parts if p[0] > 0]
        if not parts:
            return 0, np.zeros(0), np.zeros((0, 0))
        return (
            sum(p[0] for p in parts),
            np.sum([p[1] for p in parts], axis=0),
            np.sum([p[2] for p in parts], axis=0),
        )

    refs = [
        _moments.remote(ref)
        for ref in ds.select_columns([col]).to_arrow_refs()
    ]
    fan = 64
    while len(refs) > fan:
        refs = [_combine.remote(*refs[i : i + fan]) for i in range(0, len(refs), fan)]
    got = [g for g in ray.get(refs) if g[0] > 0]
    n = sum(g[0] for g in got)
    if n == 0:
        raise ValueError("pca_fit on an empty dataset")
    s1 = np.sum([g[1] for g in got], axis=0)
    s2 = np.sum([g[2] for g in got], axis=0)
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    comp = v[:, ::-1][:, :k].T  # (k, d), descending variance
    # deterministic sign: largest-|entry| coordinate positive
    flip = comp[np.arange(k), np.abs(comp).argmax(axis=1)] < 0
    comp[flip] *= -1.0
    return mean, comp


def pca_transform(
    ds: rd.Dataset, mean: np.ndarray, components: np.ndarray, *,
    col: str = "embedding", id_col: str = "vec_id",
) -> rd.Dataset:
    """Project every embedding onto the fitted basis →
    ``(id_col, embedding: list<float>)`` in k dims. The (mean, basis)
    pair travels once via ``ray.put`` inside the Dataset plan; each
    batch is one centered matmul."""
    import ray

    blob = ray.put((np.asarray(mean, np.float64), np.asarray(components, np.float64)))

    def fn(t: pa.Table) -> pa.Table:
        mu, comp = ray.get(blob)
        m = _matrix(t, col, len(mu))
        proj = (m - mu) @ comp.T
        k = proj.shape[1]
        flat = pa.array(proj.astype(np.float32).ravel(), pa.float32())
        offs = pa.array(np.arange(0, (len(m) + 1) * k, k, dtype=np.int32), pa.int32())
        return pa.table(
            {id_col: t[id_col], "embedding": pa.ListArray.from_arrays(offs, flat)}
        )

    return ds.select_columns([id_col, col]).map_batches(fn, batch_format="pyarrow")


# ─────────────────── product quantization (PQ / ADC) ───────────────────


def pq_train(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    n_centroids: int = 256,
    sample_rows: int = 4096,
    iters: int = 10,
    seed: int = 11,
) -> np.ndarray:
    """Train product-quantization codebooks: the vector space is split
    into ``m`` orthogonal subspaces of ``dim/m`` coordinates and each
    gets its own ``n_centroids``-entry k-means codebook (Jégou et al.,
    TPAMI 2011 — public method). Training runs on a driver-side sample
    (codebooks are the SMALL model; the corpus itself is only ever
    streamed through :func:`pq_encode`). Vectors are L2-normalized first
    so squared-distance ranking equals cosine ranking and recall is
    directly comparable to :func:`topk_bruteforce`.

    Returns ``(m, n_centroids, dim//m)`` float64 codebooks."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    sample = _normalize(
        np.stack([np.asarray(r[vec_col], np.float64) for r in ds.take(sample_rows)])
    )
    if len(sample) < n_centroids:
        raise ValueError(
            f"sample ({len(sample)}) smaller than n_centroids ({n_centroids})"
        )
    books = np.empty((m, n_centroids, dsub), np.float64)
    for j in range(m):
        books[j] = kmeans_lite(
            sample[:, j * dsub : (j + 1) * dsub], n_centroids, iters, seed + j
        )
    return books


def _pq_assign(sub: np.ndarray, book: np.ndarray) -> np.ndarray:
    """argmin ‖x−c‖² per row via the dot-product identity (no (n,k,d)
    temp); ties break to the lowest code (argmin order)."""
    d2 = (book * book).sum(axis=1)[None, :] - 2.0 * (sub @ book.T)
    return d2.argmin(axis=1)


def pq_encode(
    ds: rd.Dataset,
    codebooks: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Quantize every vector to ``m`` uint8 codes — a 4·dim-byte float32
    embedding becomes ``m`` bytes (32× at dim=64, m=8), which is what
    makes 10^12-vector search memory-feasible: the code table for the
    whole corpus fits a fraction of the raw embedding footprint and the
    original vectors never need to be resident at query time. Codebooks
    travel once via ``ray.put``; each batch is ``m`` small matmuls.
    Output: ``(id_col, pq_code: fixed_size_binary(m))``."""
    m, _, dsub = codebooks.shape
    dim = m * dsub
    book_ref = ray.put(np.asarray(codebooks, np.float64))

    def enc(t: pa.Table) -> pa.Table:
        books = ray.get(book_ref)
        x = _normalize(_matrix(t, vec_col, dim))
        codes = np.empty((len(x), m), np.uint8)
        for j in range(m):
            codes[:, j] = _pq_assign(x[:, j * dsub : (j + 1) * dsub], books[j])
        arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(m), len(x), [None, pa.py_buffer(codes.tobytes())]
        )
        return pa.table({id_col: t[id_col], "pq_code": arr})

    return ds.select_columns([id_col, vec_col]).map_batches(enc, batch_format="pyarrow")


def pq_topk(
    codes: rd.Dataset,
    codebooks: np.ndarray,
    queries: np.ndarray,
    *,
    id_col: str = "vec_id",
    k: int = 10,
) -> pa.Table:
    """Asymmetric-distance (ADC) top-k over PQ codes: each query
    precomputes an ``(m, n_centroids)`` distance lookup table ONCE on
    the driver (kilobytes), broadcast via ``ray.put``; a batch of codes
    is scored with ``m`` fancy-indexed gathers + an accumulate — no
    float vectors are read at query time. Per-batch partial top-k then
    a driver merge, exactly like :func:`topk_bruteforce` (score =
    −approx‖q−x‖², so larger is better and the merge is shared).

    Recall < 1 by construction (quantization error); measured against
    brute force in tests. Raise ``m``/``n_centroids`` for recall,
    shrink for memory — the scale knob is explicit."""
    mq, nc, dsub = codebooks.shape
    q = _normalize(np.asarray(queries, np.float64))
    nq = len(q)
    # lut[i, j, c] = ‖q_i[sub j] − codebook[j][c]‖²
    lut = np.empty((nq, mq, nc), np.float64)
    for j in range(mq):
        qs = q[:, j * dsub : (j + 1) * dsub]  # (nq, dsub)
        b = codebooks[j]  # (nc, dsub)
        lut[:, j, :] = (
            (qs * qs).sum(axis=1)[:, None]
            + (b * b).sum(axis=1)[None, :]
            - 2.0 * (qs @ b.T)
        )
    lut_ref = ray.put(lut)

    def per_batch(t: pa.Table) -> pa.Table:
        lt = ray.get(lut_ref)  # (nq, m, nc), zero-copy from plasma
        col = t["pq_code"].combine_chunks()
        cd = np.frombuffer(col.buffers()[1], np.uint8)[
            col.offset * mq : (col.offset + len(col)) * mq
        ].reshape(-1, mq)
        n = len(cd)
        d2 = np.zeros((n, lt.shape[0]), np.float64)
        for j in range(mq):
            d2 += lt[:, j, :][:, cd[:, j]].T  # (n, nq) gather per subspace
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return _batch_topk(-d2, ids, k)

    parts = codes.map_batches(per_batch, batch_format="pyarrow").take_all()
    return _merge_topk(parts, k)
