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
    "simhash_dedup",
    "label_propagate_clusters",
    "embedding_near_dup",
    "embedding_near_dup_exact",
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


_EMPTY_PAIRS = {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
_EMPTY_CLUSTERS = {"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}


def _all_bucket_pairs(group: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """All in-bucket candidate pairs (a < b), vectorized via triu indices.

    All pairs — not a star around the min id — so downstream pairwise
    verification matches connected-components-over-all-true-pairs
    exactly (a star edge can fail verification while a non-star edge
    inside the same bucket passes)."""
    n = group.num_rows
    if n < 2:
        return pa.table(_EMPTY_PAIRS)
    ids = np.sort(group[id_col].to_numpy(zero_copy_only=False))
    ii, jj = np.triu_indices(n, 1)
    return pa.table({"a": pa.array(ids[ii], pa.int64()), "b": pa.array(ids[jj], pa.int64())})


def _dedupe_pairs(pairs: rd.Dataset) -> rd.Dataset:
    from ray.data.aggregate import Count

    return pairs.groupby(["a", "b"]).aggregate(Count(alias_name="__n")).select_columns(["a", "b"])


def _candidate_texts(
    ds: rd.Dataset, pairs: rd.Dataset, id_col: str, text_col: str
) -> rd.Dataset:
    """(id, text) for every id appearing in ``pairs`` — a broadcast-filter
    semi-join: only the (small) candidate ID ARRAY reaches the driver and
    workers; texts stay distributed and are filtered with ``pc.is_in``
    (vectorized, no per-row Python)."""
    import pyarrow.compute as pc

    both = pairs.map_batches(
        lambda b: pa.table({"i": pa.concat_arrays([b["a"].combine_chunks(), b["b"].combine_chunks()])}),
        batch_format="pyarrow",
    )
    cand = both.unique("i")
    cand_arr = pa.array(sorted(cand), pa.int64())

    def pick(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[id_col], value_set=cand_arr)
        return batch.filter(mask).select([id_col, text_col])

    return ds.map_batches(pick, batch_format="pyarrow")


def _verify_pairs(
    pairs: rd.Dataset,
    attrs: rd.Dataset,
    id_col: str,
    val_col: str,
    val_type: pa.DataType,
    check,
) -> rd.Dataset:
    """(a,b) pairs + (id, value) attrs → verified (a,b) where
    ``check(value_a, value_b)`` holds.

    Distribution-by-key via ``union + groupby`` (a repartition-join: the
    same all-to-all a hash join does, expressed with the stable groupby
    operator): first co-locate each pair with its two attribute values
    keyed by doc id, then co-locate the two sides of each pair keyed by
    (a,b) and apply ``check``. All shuffled data is candidate-sized,
    never the corpus."""

    def pair_side_rows(b: pa.Table) -> pa.Table:
        a = b["a"].combine_chunks()
        bb = b["b"].combine_chunks()
        n = len(a)
        return pa.table(
            {
                "key": pa.concat_arrays([a, bb]),
                "a": pa.concat_arrays([a, a]),
                "b": pa.concat_arrays([bb, bb]),
                "val": pa.nulls(2 * n, val_type),
            }
        )

    def attr_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "key": b[id_col],
                "a": pa.nulls(n, pa.int64()),
                "b": pa.nulls(n, pa.int64()),
                "val": b[val_col].cast(val_type),
            }
        )

    empty_sides = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "key": pa.array([], pa.int64()),
            "val": pa.array([], val_type),
        }
    )

    def spread(group: pa.Table) -> pa.Table:
        # group = one doc id: its attr row + every pair row referencing it
        vmask = pa.compute.is_valid(group["val"])
        vrows = group.filter(vmask)
        prows = group.filter(pa.compute.invert(vmask))
        if vrows.num_rows == 0 or prows.num_rows == 0:
            return empty_sides
        # replicate the attr value via take (vectorized for nested types)
        val_col = vrows["val"].combine_chunks().take(
            pa.array(np.zeros(prows.num_rows, dtype=np.int64))
        )
        return pa.table(
            {
                "a": prows["a"],
                "b": prows["b"],
                "key": prows["key"],
                "val": val_col,
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        # group = one (a,b) pair; duplicate pair rows (same pair proposed
        # by several LSH bands) are tolerated: one row per side suffices
        a = group["a"][0].as_py()
        b = group["b"][0].as_py()
        keys = group["key"].to_numpy(zero_copy_only=False)
        ia = int(np.argmax(keys == a))
        ib = int(np.argmax(keys == b))
        if keys[ia] != a or keys[ib] != b:
            return pa.table(_EMPTY_PAIRS)  # one side's attr missing
        va = group["val"][ia].as_py()
        vb = group["val"][ib].as_py()
        if check(va, vb):
            return pa.table({"a": pa.array([a], pa.int64()), "b": pa.array([b], pa.int64())})
        return pa.table(_EMPTY_PAIRS)

    unioned = pairs.map_batches(pair_side_rows, batch_format="pyarrow").union(
        attrs.map_batches(attr_rows, batch_format="pyarrow")
    )
    sides = unioned.groupby("key").map_groups(spread, batch_format="pyarrow")
    return sides.groupby(["a", "b"]).map_groups(verify, batch_format="pyarrow")


def _verify_pairs_jaccard(
    pairs: rd.Dataset, texts: rd.Dataset, id_col: str, text_col: str,
    shingle_k: int, thr_milli: int,
) -> rd.Dataset:
    """Exact char-shingle Jaccard ≥ thr_milli/1000 over candidate pairs
    (integer compare — no float-boundary drift vs a SQL oracle).

    The attribute co-located with each pair is the raw TEXT, not a
    precomputed shingle set: k-shingle sets are ~k× larger than the text
    itself, so shipping texts minimizes the cogroup shuffle and the sets
    are rebuilt per pair (bounded by pair count × doc length)."""

    def check(ta: str, tb: str) -> bool:
        sa = _char_shingles(ta, shingle_k)
        sb = _char_shingles(tb, shingle_k)
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        return 1000 * inter >= thr_milli * max(1, union)

    return _verify_pairs(pairs, texts, id_col, text_col, pa.string(), check)


def _char_shingles(text: str, k: int) -> set:
    return {text[j : j + k] for j in range(max(1, len(text) - k + 1))}


_SMALL_GRAPH_EDGES = 200_000  # below this, driver union-find beats iterated Ray jobs


def label_propagate_clusters(edges: rd.Dataset, *, max_iters: int = 64) -> pa.Table:
    """Connected components over an (a, b) edge dataset.

    Scale path: distributed min-label propagation — iterate a
    union+groupby repartition-join until the label sum reaches a
    fixpoint; the driver sees one scalar per iteration and per-iteration
    shuffle volume is edge-sized, never the corpus.

    Fast path: the input here is the VERIFIED edge set (result-sized by
    definition — these edges ARE the answer being returned). When it is
    small (≤ ``_SMALL_GRAPH_EDGES``) the iterated Ray jobs cost far more
    than the graph itself, so a driver-side union-find over those same
    result-sized pairs finishes in milliseconds. This is not the
    banned shape (materializing raw candidates or texts): nothing larger
    than the returned result ever reaches the driver either way.

    Returns (doc_id, cluster_id) sorted, cluster_id = component min.
    Every node in an edge belongs to a ≥2 cluster by construction.
    """
    from ray.data.aggregate import Min, Sum

    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return pa.table(_EMPTY_CLUSTERS)
    if n_edges <= _SMALL_GRAPH_EDGES:
        tbl = edges.to_pandas()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(tbl["a"].to_numpy(), tbl["b"].to_numpy()):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        rows = sorted((find(x), x) for x in parent)
        return pa.table(
            {
                "doc_id": pa.array([x for _, x in rows], pa.int64()),
                "cluster_id": pa.array([c for c, _ in rows], pa.int64()),
            }
        )

    def symmetrize(b: pa.Table) -> pa.Table:
        a = b["a"].combine_chunks()
        bb = b["b"].combine_chunks()
        # both directions + self loops (so a node's own label propagates)
        return pa.table(
            {
                "u": pa.concat_arrays([a, bb, a, bb]),
                "v": pa.concat_arrays([bb, a, a, bb]),
            }
        )

    sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()
    if sym.count() == 0:
        return pa.table(_EMPTY_CLUSTERS)
    labels = sym.groupby("u").aggregate(Min("v", alias_name="label")).materialize()

    def edge_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {"key": b["v"], "u": b["u"], "label": pa.nulls(b.num_rows, pa.int64())}
        )

    def label_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {"key": b["u"], "u": pa.nulls(b.num_rows, pa.int64()), "label": b["label"]}
        )

    def send(group: pa.Table) -> pa.Table:
        # group = one node v: its label row + edges u→v; send L(v) to each u
        lmask = pa.compute.is_valid(group["label"])
        lrows = group.filter(lmask)
        erows = group.filter(pa.compute.invert(lmask))
        if lrows.num_rows == 0 or erows.num_rows == 0:
            return pa.table({"u": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})
        lab = lrows["label"][0]
        return pa.table(
            {
                "u": erows["u"],
                "label": pa.compute.fill_null(pa.nulls(erows.num_rows, pa.int64()), lab),
            }
        )

    prev_sum = None
    for _ in range(max_iters):
        unioned = sym.map_batches(edge_rows, batch_format="pyarrow").union(
            labels.map_batches(label_rows, batch_format="pyarrow")
        )
        labels = (
            unioned.groupby("key")
            .map_groups(send, batch_format="pyarrow")
            .groupby("u")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        s = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if s == prev_sum:
            break
        prev_sum = s
    out = labels.to_pandas().rename(columns={"u": "doc_id", "label": "cluster_id"})
    out = out.sort_values(["cluster_id", "doc_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


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

    Scale-safe end to end: LSH bands propose in-bucket candidate pairs;
    texts semi-join back to pairs via union+groupby repartition-joins
    (candidate-sized, no driver text dict); exact char-shingle Jaccard
    verifies each pair with INTEGER threshold arithmetic
    (1000*|∩| ≥ thr_milli*|∪| — no float-boundary drift vs a SQL
    oracle); clusters come from distributed min-label propagation
    (edge-sized shuffles only). The driver materializes nothing larger
    than the result itself (plus the candidate ID array).

    cluster_id = min doc_id of the cluster; singletons are omitted."""
    thr_milli = round(jaccard_threshold * 1000)

    def to_bands(batch: pa.Table) -> pa.Table:
        sigs, ids = minhash_signatures(
            batch, text_col=text_col, id_col=id_col, num_perm=num_perm, shingle_k=shingle_k, seed=seed
        )
        return _band_rows(sigs, ids, bands)

    # near-identical docs collide in EVERY band, so raw pair rows carry
    # up to bands× duplicates — deduping them first keeps the verify
    # cogroup at one row per (pair, side)
    pairs = _dedupe_pairs(
        ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(_all_bucket_pairs, batch_format="pyarrow")
    ).materialize()
    if pairs.count() == 0:
        return pa.table(_EMPTY_CLUSTERS)

    texts = _candidate_texts(ds, pairs, id_col, text_col).materialize()
    verified = _verify_pairs_jaccard(pairs, texts, id_col, text_col, shingle_k, thr_milli)
    return label_propagate_clusters(verified)


def _collect_texts(ds: rd.Dataset, ids: list[int], id_col: str, text_col: str) -> dict[int, str]:
    """Fetch the texts of candidate ids (small set) via a broadcast filter
    (vectorized ``pc.is_in`` — no per-row Python over the corpus)."""
    import pyarrow.compute as pc

    id_arr = pa.array(sorted(set(ids)), pa.int64())

    def pick(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[id_col], value_set=id_arr)
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


def simhash_dedup(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> pa.Table:
    """Near-duplicate clusters by SimHash → table (doc_id, cluster_id).

    Hamming-band LSH with GUARANTEED recall: the 64-bit signature is cut
    into ``max_hamming + 1`` bands, so any pair within ``max_hamming``
    bits must agree on at least one whole band (pigeonhole) and collides
    in that band's bucket. Candidates are verified with exact Hamming
    distance (popcount of xor), then clustered by distributed min-label
    propagation — the same scale shape as :func:`minhash_dedup`; the
    corpus text never shuffles, only (band, signature, id) rows do."""
    bands = max_hamming + 1
    width = 64 // bands
    widths = [width + (1 if i < 64 % bands else 0) for i in range(bands)]
    shifts = np.cumsum([0] + widths[:-1])

    def to_bands(batch: pa.Table) -> pa.Table:
        st = simhash_signatures(batch, text_col=text_col, id_col=id_col)
        sig = st["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(sig)
        parts = []
        for i in range(bands):
            mask = _U((1 << widths[i]) - 1) if widths[i] < 64 else _U(0xFFFFFFFFFFFFFFFF)
            band_val = ((sig >> _U(int(shifts[i]))) & mask).view(np.int64)
            parts.append(
                pa.table(
                    {
                        "doc_id": st[id_col],
                        "band_id": pa.array(np.full(n, i, dtype=np.int32)),
                        "band_hash": pa.array(band_val),
                    }
                )
            )
        return pa.concat_tables(parts)

    pairs = _dedupe_pairs(
        ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(_all_bucket_pairs, batch_format="pyarrow")
    ).materialize()
    if pairs.count() == 0:
        return pa.table(_EMPTY_CLUSTERS)

    # attribute dataset: (id, simhash) for candidate ids only
    import pyarrow.compute as pc

    both = pairs.map_batches(
        lambda b: pa.table({"i": pa.concat_arrays([b["a"].combine_chunks(), b["b"].combine_chunks()])}),
        batch_format="pyarrow",
    )
    cand_arr = pa.array(sorted(both.unique("i")), pa.int64())

    def sig_rows(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.is_in(batch[id_col], value_set=cand_arr))
        return simhash_signatures(keep, text_col=text_col, id_col=id_col)

    sigs = ds.map_batches(sig_rows, batch_format="pyarrow").materialize()

    def check(sa: int, sb: int) -> bool:
        return bin((sa ^ sb) & 0xFFFFFFFFFFFFFFFF).count("1") <= max_hamming

    verified = _verify_pairs(pairs, sigs, id_col, "simhash", pa.int64(), check)
    return label_propagate_clusters(verified)


# ─────────────── embedding cosine near-dup ───────────────


def embedding_near_dup_exact(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    cosine_threshold: float = 0.95,
) -> pa.Table:
    """EXACT all-pairs cosine near-dup → sorted (a, b) id pairs.

    Distributed block-row computation: the normalized corpus matrix is
    broadcast ONCE (``ray.put``); each batch computes its (rows × all)
    float64 similarity block and emits pairs ``id_row < id_col`` above
    the threshold — O(n²/P) compute with zero shuffle, exact by
    construction (SQL-oracle-checkable). Applicable while n·d floats fit
    the object store (~10^8 vectors at d=64); beyond that use the LSH
    variant :func:`embedding_near_dup` (candidate recall < 1 in the
    random-similarity regime, documented)."""
    import ray as _ray

    refs = ds.select_columns([id_col, vec_col]).to_arrow_refs()
    full = pa.concat_tables([_ray.get(r) for r in refs]).combine_chunks()
    ids_np = full[id_col].to_numpy(zero_copy_only=False)
    m = np.asarray(full[vec_col].combine_chunks().values.to_numpy(zero_copy_only=False), dtype=np.float64).reshape(len(full), dim)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    bundle = _ray.put((ids_np, mn))

    def block(batch: pa.Table) -> pa.Table:
        all_ids, all_mn = _ray.get(bundle)  # zero-copy numpy from plasma
        bm = np.asarray(
            batch[vec_col].combine_chunks().values.to_numpy(zero_copy_only=False), dtype=np.float64
        ).reshape(batch.num_rows, dim)
        bn = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        sims = bn @ all_mn.T  # (rows, n)
        bids = batch[id_col].to_numpy(zero_copy_only=False)
        ii, jj = np.nonzero(sims >= cosine_threshold)
        keep = bids[ii] < all_ids[jj]  # a < b, once per unordered pair
        return pa.table(
            {
                "a": pa.array(bids[ii][keep], pa.int64()),
                "b": pa.array(all_ids[jj][keep], pa.int64()),
            }
        )

    out = ds.map_batches(block, batch_format="pyarrow").take_all()
    rows = sorted({(int(r["a"]), int(r["b"])) for r in out})
    if not rows:
        return pa.table(_EMPTY_PAIRS)
    return pa.table(
        {"a": pa.array([r[0] for r in rows], pa.int64()), "b": pa.array([r[1] for r in rows], pa.int64())}
    )


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
