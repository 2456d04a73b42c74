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
    "dedup_against_corpus",
    "content_overlap_matrix",
    "ngram_jaccard",
    "minhash_signatures",
    "minhash_dedup",
    "simhash_signatures",
    "simhash_dedup",
    "label_propagate_clusters",
    "embedding_near_dup",
    "embedding_near_dup_exact",
    "fuzzy_dup_pairs",
    "dedup_keep_best",
    "prefix_filter_dup_pairs",
]

_U = np.uint64
_P1 = _U(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> _U(30))) * _U(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U(27))) * _U(0x94D049BB133111EB)
    return x ^ (x >> _U(31))


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR; numpy<2 has no bitwise_count)."""
    x = x - ((x >> _U(1)) & _U(0x5555555555555555))
    x = (x & _U(0x3333333333333333)) + ((x >> _U(2)) & _U(0x3333333333333333))
    x = (x + (x >> _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    return ((x * _U(0x0101010101010101)) >> _U(56)).astype(np.int64)


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


def dedup_against_corpus(
    new: rd.Dataset,
    history: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_limit: int = 64 << 20,
    num_buckets: int | None = None,
    dedup_new: bool = False,
) -> rd.Dataset:
    """Incremental-ingestion dedup: keep the rows of ``new`` whose
    content does NOT already exist in ``history`` (the already-curated
    corpus). The continuous-crawl shape: every ingestion batch is
    checked against the historical fingerprint set, so re-crawled /
    mirrored pages never re-enter the training corpus.

    NOTE on intra-batch mirrors: the anti-join alone keeps EVERY copy
    of content that is novel vs history — duplicates *within* ``new``
    (e.g. a crawl that hit the same page through two mirrors) all
    survive and would all enter the corpus. Pass ``dedup_new=True`` to
    additionally keep only the min-``id_col`` representative per
    distinct surviving content (an extra (fingerprint, id)-pair shuffle
    plus an id semi-join — the text still never moves), or chain
    :func:`exact_dedup` yourself when you need copy counts too.

    Ray-Data-first composition, no new shuffle machinery:

    * both sides reduce to 64-bit content fingerprints inside
      ``map_batches`` (the text itself never enters any exchange);
    * the history side additionally pre-dedups fingerprints per batch
      (a combiner — history dup clusters collapse before the join);
    * membership is :func:`~parquetjs_ray.functions.joins.semi_join`
      with ``anti=True``: history fingerprint sets that fit
      ``broadcast_limit`` are broadcast once (``ray.put``) and ``new``
      filters per batch with ZERO shuffle; above the limit both sides
      hash-bucket, with a Bloom prefilter so definitively-novel rows
      (the common case in a healthy crawl) skip the exchange entirely.

    Fingerprint collisions (~n²/2⁶⁵) would drop a novel doc; at corpus
    scales where that matters, raise to a 128-bit pair the same way the
    MinHash verify stage does. Rows of ``new`` keep ALL their columns.
    """
    from .joins import semi_join

    def add_fp(batch: pa.Table) -> pa.Table:
        fp = fingerprint64(batch[text_col])
        return batch.append_column("__fp", pa.array(fp.view(np.int64)))

    def hist_fps(batch: pa.Table) -> pa.Table:
        fp = np.unique(fingerprint64(batch[text_col]))
        return pa.table({"__fp": pa.array(fp.view(np.int64))})

    survivors = semi_join(
        new.map_batches(add_fp, batch_format="pyarrow"),
        history.map_batches(hist_fps, batch_format="pyarrow"),
        left_on="__fp",
        right_on="__fp",
        anti=True,
        broadcast_limit=broadcast_limit,
        num_buckets=num_buckets,
    )
    if dedup_new:
        # min-id representative per distinct surviving content: shuffle
        # only (fp, id) pairs, then an id semi-join back to full rows
        from ray.data.aggregate import Min

        winners = (
            survivors.map_batches(
                lambda b: pa.table({"__fp": b["__fp"], id_col: b[id_col]}),
                batch_format="pyarrow",
            )
            .groupby("__fp")
            .aggregate(Min(id_col, alias_name=id_col))
            .select_columns([id_col])
        )
        survivors = semi_join(
            survivors,
            winners,
            left_on=id_col,
            right_on=id_col,
            broadcast_limit=broadcast_limit,
            num_buckets=num_buckets,
        )
    return survivors.drop_columns(["__fp"])


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


def content_overlap_matrix(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    group_col: str = "source",
    bitmask_domain_cap: int = 64,
) -> rd.Dataset:
    """Cross-group duplicate-content matrix: for every unordered pair of
    groups (sources/crawls/snapshots), how many DISTINCT contents appear
    in both — the "which crawls mirror each other" diagnostic that
    decides where dedup effort goes.

    Texts reduce to 64-bit fingerprints in ``map_batches`` and are
    deduped per (fp, group) in-batch (combiner); the global distinct is
    one Count groupby over pairs, MATERIALIZED once (fingerprint-sized,
    never the corpus) so neither downstream plan recomputes the scan.
    Then two plans:

    * **bitmask (≤ ``bitmask_domain_cap`` groups, the common case)** —
      each distinct (fp, group) row becomes ``(fp, 1 << group_index)``;
      because rows are globally DISTINCT per pair, a plain vectorized
      ``Sum`` groupby IS the bitwise OR, yielding one exact group-mask
      per fp. Per-mask batches then produce ALL pairwise co-occurrence
      counts with one ``bits.T @ bits`` matmul (G×G per batch), and a
      tiny pair-keyed Sum finishes — no join, no per-row Python.
    * **join (> cap groups)** — the distinct table self-joins on fp via
      :func:`~parquetjs_ray.functions.joins.equi_join`; each fp's bucket
      holds ≤ one row per group, so the quadratic term is bounded by
      the group count, never the corpus.

    Same collision caveat as :func:`exact_dedup` (~n²/2⁶⁵).

    ``text_col`` may also be an integer column (an entity id rather than
    content): it is then used as the key directly, collision-free —
    e.g. "distinct users shared between each pair of event types".

    Output: ``(src_a, src_b, n_shared)`` with ``src_a < src_b``.
    """
    from ray.data.aggregate import Count, Sum

    def fp_pairs(batch: pa.Table) -> pa.Table:
        ctype = batch.schema.field(text_col).type
        if pa.types.is_string(ctype) or pa.types.is_large_string(ctype):
            key = pa.array(fingerprint64(batch[text_col]).view(np.int64))
        else:
            key = batch[text_col].cast(pa.int64())
        t = pa.table({"__fp": key, group_col: batch[group_col]})
        return t.group_by(["__fp", group_col]).aggregate([])

    distinct = (
        ds.map_batches(fp_pairs, batch_format="pyarrow")
        .groupby(["__fp", group_col])
        .aggregate(Count(alias_name="__c"))
        .select_columns(["__fp", group_col])
        .materialize()  # pair-sized; both plans read it, the scan runs once
    )
    groups = sorted(
        r[group_col] for r in distinct.groupby(group_col).count().take_all()
    )
    if len(groups) <= bitmask_domain_cap:
        return _overlap_bitmask(distinct, group_col, groups)
    return _overlap_join(distinct, group_col)


def _overlap_bitmask(distinct: rd.Dataset, group_col: str, groups: list) -> rd.Dataset:
    """Small-group-domain overlap plan: Sum-as-OR masks + per-batch
    co-occurrence matmul. ``distinct`` must hold globally-distinct
    (fp, group) rows."""
    from ray.data.aggregate import Sum

    gidx = {g: i for i, g in enumerate(groups)}
    ng = len(groups)
    names = np.array(groups, dtype=object)

    def to_bits(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pos = pc.index_in(
            b[group_col].combine_chunks(), value_set=pa.array(list(gidx))
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"__fp": b["__fp"], "__bit": pa.array(np.int64(1) << pos)})

    masks = (
        distinct.map_batches(to_bits, batch_format="pyarrow")
        .groupby("__fp")
        .aggregate(Sum("__bit", alias_name="__mask"))  # distinct rows → Sum == OR
    )

    def co_counts(b: pa.Table) -> pa.Table:
        m = b["__mask"].combine_chunks().to_numpy(zero_copy_only=False)
        bits = ((m[:, None] >> np.arange(ng)) & 1).astype(np.float64)
        c = (bits.T @ bits).astype(np.int64)  # G×G pairwise co-occurrence
        ii, jj = np.triu_indices(ng, k=1)
        return pa.table(
            {
                "__i": pa.array(ii.astype(np.int64)),
                "__j": pa.array(jj.astype(np.int64)),
                "__n": pa.array(c[ii, jj]),
            }
        )

    agg = (
        masks.map_batches(co_counts, batch_format="pyarrow")
        .groupby(["__i", "__j"])
        .aggregate(Sum("__n", alias_name="n_shared"))
    )

    def label(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = b["__i"].to_numpy(zero_copy_only=False)
        j = b["__j"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "src_a": pa.array(names[i].tolist()),
                "src_b": pa.array(names[j].tolist()),
                "n_shared": b["n_shared"],
            }
        )
        return t.filter(pc.greater(t["n_shared"], 0))

    return agg.map_batches(label, batch_format="pyarrow")


def _overlap_join(distinct: rd.Dataset, group_col: str) -> rd.Dataset:
    """Large-group-domain overlap plan: fp self-join (bucket quadratic
    term bounded by the group count)."""
    from ray.data.aggregate import Sum

    from .joins import equi_join

    # distinct output-column names per side (a self-join would collide)
    left = distinct.map_batches(
        lambda b: pa.table({"__fp": b["__fp"], "src_a": b[group_col]}),
        batch_format="pyarrow",
    )
    right = distinct.map_batches(
        lambda b: pa.table({"__fp": b["__fp"], "src_b": b[group_col]}),
        batch_format="pyarrow",
    )
    joined = equi_join(
        left,
        right,
        left_on="__fp",
        right_on="__fp",
        left_cols=["src_a"],
        right_cols=["src_b"],
    )

    def ordered(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pa.table({"src_a": b["src_a"], "src_b": b["src_b"]}).filter(
            pc.less(b["src_a"], b["src_b"])
        )
        return t.group_by(["src_a", "src_b"]).aggregate([([], "count_all")])

    return (
        joined.map_batches(ordered, batch_format="pyarrow")
        .groupby(["src_a", "src_b"])
        .aggregate(Sum("count_all", alias_name="n_shared"))
        .select_columns(["src_a", "src_b", "n_shared"])
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


def _band_rows(sigs: np.ndarray, ids: pa.Array, bands: int, fp: np.ndarray) -> pa.Table:
    n, num_perm = sigs.shape
    r = num_perm // bands
    band_hash = _mix64(
        sigs.reshape(n, bands, r).astype(np.uint64).sum(axis=2, dtype=np.uint64)
        ^ _mix64(sigs.reshape(n, bands, r)[:, :, 0])
    )
    band_id = np.broadcast_to(np.arange(bands, dtype=np.int32), (n, bands))
    ids_rep = pa.concat_arrays([ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids] * 1)
    rep_idx = pa.array(np.repeat(np.arange(n), bands))
    return pa.table(
        {
            "doc_id": pa.compute.take(ids_rep, rep_idx),
            "band_id": pa.array(band_id.reshape(-1)),
            "band_hash": pa.array(band_hash.reshape(-1).view(np.int64)),
            "__fp": pa.array(np.repeat(fp.view(np.int64), bands)),
        }
    )


_EMPTY_PAIRS = {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
_EMPTY_CLUSTERS = {"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}


_BUCKET_CAP = 4096  # max DISTINCT contents per LSH bucket before capping


def _all_bucket_pairs(group: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """In-bucket candidate pairs (a < b), vectorized, EXACT-DUPLICATE
    FOLDED and size-capped.

    Correctness shape: all-pairs among distinct contents — not a star
    around the min id — so downstream pairwise verification matches
    connected-components-over-all-true-pairs exactly (a star edge can
    fail verification while a non-star edge inside the same bucket
    passes). Exact duplicates (equal ``__fp`` content fingerprint) ARE
    folded to a star around their min id: identical texts verify at
    Jaccard/Hamming 0 by definition, and every true pair through a
    member is mirrored through its representative, so components are
    unchanged while a bucket of n identical docs emits O(n) edges
    instead of O(n²) — the 100 TB boilerplate-bucket guard.

    Buckets with more than ``_BUCKET_CAP`` DISTINCT contents are capped
    (pairs emitted for the first cap reps by id; overflow logged): a
    degenerate band hash at that cardinality is adversarial input, and
    unbounded n² pair generation is worse than bounded recall loss."""
    n = group.num_rows
    if n < 2:
        return pa.table(_EMPTY_PAIRS)
    ids = group[id_col].to_numpy(zero_copy_only=False)
    fp = group["__fp"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, fp))
    fps, idss = fp[order], ids[order]
    first = np.ones(n, bool)
    first[1:] = fps[1:] != fps[:-1]
    reps = idss[first]  # min id per distinct content (ids sorted within fp)
    rep_for_row = reps[np.cumsum(first) - 1]
    star_a = rep_for_row[~first]  # rep < member by construction
    star_b = idss[~first]
    u = len(reps)
    reps_sorted = np.sort(reps)
    if u > _BUCKET_CAP:
        import logging

        logging.getLogger(__name__).warning(
            "LSH bucket overflow: %d distinct contents > cap %d; "
            "pair generation capped (recall may drop for this bucket)",
            u, _BUCKET_CAP,
        )
        reps_sorted = reps_sorted[:_BUCKET_CAP]
        u = _BUCKET_CAP
    if u >= 2:
        ii, jj = np.triu_indices(u, 1)
        a = np.concatenate([reps_sorted[ii], star_a])
        b = np.concatenate([reps_sorted[jj], star_b])
    else:
        a, b = star_a, star_b
    return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})


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
    # broadcast via ray.put ONCE — captured by ObjectRef, not re-shipped
    # in every serialized task closure
    import ray as _ray

    cand_ref = _ray.put(pa.array(sorted(cand), pa.int64()))

    def pick(batch: pa.Table) -> pa.Table:
        cand_arr = _ray.get(cand_ref)  # zero-copy from plasma per call
        mask = pc.is_in(batch[id_col], value_set=cand_arr)
        return batch.filter(mask).select([id_col, text_col])

    return ds.map_batches(pick, batch_format="pyarrow")


_VERIFY_PARTS = 16  # hash partitions for the vectorized pair-verify cogroup
# (each candidate's attr is shipped to ≤_VERIFY_PARTS judge partitions;
# more partitions = more parallelism but more attr duplication — raise
# together with cluster size when the candidate set outgrows 16 workers)


def _hash_part(x: np.ndarray) -> np.ndarray:
    return (_mix64(x.astype(np.uint64) * _P1) % _U(_VERIFY_PARTS)).astype(np.int64)


def _pair_part(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    h = _mix64(a.astype(np.uint64) * _P1 ^ _mix64(b.astype(np.uint64)))
    return (h % _U(_VERIFY_PARTS)).astype(np.int64)


_BROADCAST_ATTR_BYTES = 64 << 20  # broadcast-vs-shuffle switch for the verify join


def _verify_pairs_broadcast(
    pairs: rd.Dataset, attrs: rd.Dataset, id_col: str, val_col: str, batch_check
) -> rd.Dataset:
    """Broadcast fast path of :func:`_verify_pairs`: when the candidate
    attribute table is small (≤ ``_BROADCAST_ATTR_BYTES``), skip BOTH
    cogroup shuffles — assemble the (id, value) table in a Ray task
    (never on the driver), ``ray.put`` it once, and verify each pair
    batch against the broadcast table with two ``searchsorted`` lookups.
    The shuffle path remains for candidate sets beyond object-store
    comfort — the standard broadcast-vs-shuffle join selection."""
    import ray as _ray

    refs = attrs.to_arrow_refs()

    @_ray.remote(num_cpus=1)
    def _assemble(block_refs: list) -> tuple:
        full = pa.concat_tables([_ray.get(r) for r in block_refs]).combine_chunks()
        ids = np.asarray(full[id_col])
        order = np.argsort(ids, kind="stable")
        vals = full[val_col].combine_chunks().take(pa.array(order, pa.int64()))
        return ids[order], vals

    bundle = _assemble.remote(list(refs))

    def verify(t: pa.Table) -> pa.Table:
        ids_sorted, vals = _ray.get(bundle)  # zero-copy from plasma
        a = np.asarray(t["a"].combine_chunks())
        b = np.asarray(t["b"].combine_chunks())
        # batch-local pair dedupe (duplicates across batches are rare —
        # bands' copies of a pair usually share the bucket output block —
        # and harmless downstream: label propagation is idempotent)
        o3 = np.lexsort((b, a))
        firstp = np.ones(len(o3), bool)
        firstp[1:] = (a[o3[1:]] != a[o3[:-1]]) | (b[o3[1:]] != b[o3[:-1]])
        keep0 = o3[firstp]
        a, b = a[keep0], b[keep0]
        if not len(a):
            return pa.table(_EMPTY_PAIRS)
        ia = np.minimum(np.searchsorted(ids_sorted, a), len(ids_sorted) - 1)
        ib = np.minimum(np.searchsorted(ids_sorted, b), len(ids_sorted) - 1)
        ok = (ids_sorted[ia] == a) & (ids_sorted[ib] == b)
        sel = np.flatnonzero(ok)
        if not len(sel):
            return pa.table(_EMPTY_PAIRS)
        mask = np.asarray(batch_check(vals, ia[sel], ib[sel]), dtype=bool)
        keep = sel[mask]
        return pa.table({"a": pa.array(a[keep], pa.int64()), "b": pa.array(b[keep], pa.int64())})

    return pairs.map_batches(verify, batch_format="pyarrow")


def _verify_pairs(
    pairs: rd.Dataset,
    attrs: rd.Dataset,
    id_col: str,
    val_col: str,
    val_type: pa.DataType,
    batch_check,
) -> rd.Dataset:
    """(a,b) pairs + (id, value) attrs → verified (a,b) where
    ``batch_check`` holds, with DOC-DEDUPED shipping and compute.

    When the candidate attribute table fits comfortably in the object
    store the broadcast fast path (:func:`_verify_pairs_broadcast`)
    replaces both cogroup shuffles with one broadcast + lookup.

    Two union+groupby repartition-joins (the same all-to-all a hash
    join does, over the stable groupby operator), grouped by HASH
    PARTITION (``_VERIFY_PARTS`` buckets), not by individual key — so
    Python group invocations are O(partitions), not O(pairs).

    Shape that makes it scale: a candidate doc's attribute (its text /
    signature) is shipped to each judge partition AT MOST ONCE, not
    once per pair — at LSH-clique densities (50+ pairs per doc) that is
    the difference between shuffling the candidate set and shuffling
    50× the candidate set, and it lets the judge compute each doc's
    derived form (shingle set) once per partition instead of once per
    pair. ``batch_check(unique_vals, ia, ib)`` receives the partition's
    unique attr values plus aligned index arrays into them (one entry
    per pair) and returns a boolean mask."""
    try:
        attr_bytes = attrs.size_bytes()
    except Exception:
        attr_bytes = None
    if attr_bytes is not None and attr_bytes <= _BROADCAST_ATTR_BYTES:
        return _verify_pairs_broadcast(pairs, attrs, id_col, val_col, batch_check)

    def pair_side_rows(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks()
        bb = t["b"].combine_chunks()
        n = len(a)
        key = pa.concat_arrays([a, bb])
        return pa.table(
            {
                "part": pa.array(_hash_part(np.asarray(key))),
                "key": key,
                "a": pa.concat_arrays([a, a]),
                "b": pa.concat_arrays([bb, bb]),
                "side": pa.array(np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])),
                "val": pa.nulls(2 * n, val_type),
            }
        )

    def attr_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        key = t[id_col].combine_chunks()
        return pa.table(
            {
                "part": pa.array(_hash_part(np.asarray(key))),
                "key": key,
                "a": pa.nulls(n, pa.int64()),
                "b": pa.nulls(n, pa.int64()),
                "side": pa.array(np.full(n, -1, np.int8)),
                "val": t[val_col].cast(val_type),
            }
        )

    empty_mid = pa.table(
        {
            "part2": pa.array([], pa.int64()),
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "doc": pa.array([], pa.int64()),
            "val": pa.array([], val_type),
        }
    )

    def attach(group: pa.Table) -> pa.Table:
        # group = one hash partition of doc ids: attr rows (side == -1)
        # + pair-side rows keyed here. Emits (1) each pair ONCE (from
        # its side-0 row) routed to its judge partition, and (2) each
        # (doc, judge-partition) attr value ONCE, deduped via lexsort.
        side = group["side"].to_numpy(zero_copy_only=False)
        amask = side < 0
        if amask.all() or not amask.any():
            return empty_mid
        keys = group["key"].to_numpy(zero_copy_only=False)
        akeys = keys[amask]
        aidx = np.flatnonzero(amask)
        order = np.argsort(akeys, kind="stable")
        akeys_sorted = akeys[order]
        pmask = ~amask
        prow_all = np.flatnonzero(pmask)
        pkeys = keys[pmask]
        pos = np.minimum(np.searchsorted(akeys_sorted, pkeys), len(akeys_sorted) - 1)
        ok = akeys_sorted[pos] == pkeys  # pair rows whose key has a local attr
        attr_row = aidx[order[pos]]  # valid where ok
        # take through Arrow: the a/b columns hold nulls on attr rows, so a
        # whole-column to_numpy would degrade to float64 (lossy past 2^53)
        pa_all = pa.array(prow_all, pa.int64())
        a_np = np.asarray(group["a"].combine_chunks().take(pa_all))
        b_np = np.asarray(group["b"].combine_chunks().take(pa_all))
        part2 = _pair_part(a_np, b_np)
        side_p = side[prow_all]
        # (1) pair rows, once each, only when this (=a's) attr exists.
        # All copies of a pair's side-0 row hash to THIS partition
        # (key = a), so deduping here is a GLOBAL pair dedupe for free —
        # no separate groupby(["a","b"]) pass over the pair stream
        psel = np.flatnonzero(ok & (side_p == 0))
        if len(psel) > 1:
            o3 = np.lexsort((b_np[psel], a_np[psel]))
            ps = psel[o3]
            firstp = np.ones(len(ps), bool)
            firstp[1:] = (a_np[ps[1:]] != a_np[ps[:-1]]) | (b_np[ps[1:]] != b_np[ps[:-1]])
            psel = ps[firstp]
        # (2) (doc, part2) fanout rows with the attr value, deduped
        cand = np.flatnonzero(ok)
        o2 = np.lexsort((part2[cand], pkeys[cand]))
        cc = cand[o2]
        first = np.ones(len(cc), bool)
        first[1:] = (pkeys[cc[1:]] != pkeys[cc[:-1]]) | (part2[cc[1:]] != part2[cc[:-1]])
        drows = cc[first]
        vals_col = group["val"].combine_chunks()
        n_p, n_d = len(psel), len(drows)
        return pa.table(
            {
                "part2": pa.array(np.concatenate([part2[psel], part2[drows]])),
                "a": pa.concat_arrays(
                    [pa.array(a_np[psel], pa.int64()), pa.nulls(n_d, pa.int64())]
                ),
                "b": pa.concat_arrays(
                    [pa.array(b_np[psel], pa.int64()), pa.nulls(n_d, pa.int64())]
                ),
                "doc": pa.concat_arrays(
                    [pa.nulls(n_p, pa.int64()), pa.array(pkeys[drows], pa.int64())]
                ),
                "val": pa.concat_arrays(
                    [pa.nulls(n_p, val_type), vals_col.take(pa.array(attr_row[drows], pa.int64()))]
                ),
            }
        )

    def judge(group: pa.Table) -> pa.Table:
        # group = one judge partition: its pairs + each referenced doc's
        # attr value exactly once; resolve pair endpoints against the
        # sorted local doc index and evaluate the whole batch at once
        dmask = np.asarray(pa.compute.is_valid(group["doc"]))
        didx = pa.array(np.flatnonzero(dmask), pa.int64())
        pidx = pa.array(np.flatnonzero(~dmask), pa.int64())
        if len(didx) == 0 or len(pidx) == 0:
            return pa.table(_EMPTY_PAIRS)
        docs = np.asarray(group["doc"].combine_chunks().take(didx))
        vals = group["val"].combine_chunks().take(didx)
        order = np.argsort(docs, kind="stable")
        docs_sorted = docs[order]
        vals_sorted = vals.take(pa.array(order, pa.int64()))
        a_np = np.asarray(group["a"].combine_chunks().take(pidx))
        b_np = np.asarray(group["b"].combine_chunks().take(pidx))
        ia = np.minimum(np.searchsorted(docs_sorted, a_np), len(docs_sorted) - 1)
        ib = np.minimum(np.searchsorted(docs_sorted, b_np), len(docs_sorted) - 1)
        ok = (docs_sorted[ia] == a_np) & (docs_sorted[ib] == b_np)  # both attrs present
        sel = np.flatnonzero(ok)
        if not len(sel):
            return pa.table(_EMPTY_PAIRS)
        mask = np.asarray(batch_check(vals_sorted, ia[sel], ib[sel]), dtype=bool)
        keep = sel[mask]
        return pa.table(
            {"a": pa.array(a_np[keep], pa.int64()), "b": pa.array(b_np[keep], pa.int64())}
        )

    unioned = pairs.map_batches(pair_side_rows, batch_format="pyarrow").union(
        attrs.map_batches(attr_rows, batch_format="pyarrow")
    )
    attached = unioned.groupby("part").map_groups(attach, batch_format="pyarrow")
    return attached.groupby("part2").map_groups(judge, batch_format="pyarrow")


def _char_shingle_hashes(texts: list[str], k: int) -> tuple[np.ndarray, np.ndarray]:
    """64-bit hashes of every char k-shingle of every text (CHARACTER
    semantics, matching SQL ``substr`` — not utf8 bytes), plus row
    offsets into the hash stream. Texts shorter than ``k`` contribute
    their single truncated shingle, disambiguated by length so it can
    only equal another whole short text. One vectorized pass over the
    codepoint stream; the only Python-level work is the list join."""
    n = len(texts)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    nsh = np.maximum(lens - k + 1, 1)
    sh_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nsh, out=sh_off[1:])
    total = int(sh_off[-1])
    cp = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    starts = np.repeat(off[:-1], nsh) + (np.arange(total) - np.repeat(sh_off[:-1], nsh))
    row_end = np.repeat(off[1:], nsh)
    wlen = np.minimum(k, row_end - starts)  # < k only for short/empty rows
    cp_pad = np.concatenate([cp, np.zeros(k, np.uint64)])
    h = np.full(total, _U(0xCBF29CE484222325))
    for i in range(k):  # FNV-style rolling over ≤k codepoints, masked past row end
        c = np.where(i < wlen, cp_pad[np.minimum(starts + i, len(cp_pad) - 1)], _U(0))
        h = (h ^ c) * _U(0x100000001B3)
    return _mix64(h ^ wlen.astype(np.uint64)), sh_off


def _segment_unique(h: np.ndarray, off: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deduplicate hashes within each segment → (segment ids, hashes) of
    the unique (segment, hash) pairs, vectorized via one lexsort."""
    n = len(off) - 1
    seg = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
    order = np.lexsort((h, seg))
    hs, ss = h[order], seg[order]
    first = np.ones(len(h), bool)
    first[1:] = (hs[1:] != hs[:-1]) | (ss[1:] != ss[:-1])
    return ss[first], hs[first]


def _shingle_attrs(texts: rd.Dataset, id_col: str, text_col: str, shingle_k: int) -> rd.Dataset:
    """(id, text) → (id, shingles=list<int64> of SORTED UNIQUE char-
    shingle hashes). Each candidate is shingled exactly ONCE here, in
    parallel over corpus-order blocks — the verify cogroup then ships
    and uses the precomputed arrays instead of re-deriving them per
    judge partition (re-shingling per partition is ~fanout× the work,
    and large numpy temporaries are extra-expensive in this sandbox).
    Hashes are kept/sorted in the int64 domain so the per-pair
    ``searchsorted`` merges compare consistently."""

    def build(batch: pa.Table) -> pa.Table:
        texts_py = batch[text_col].to_pylist()
        h, off = _char_shingle_hashes(texts_py, shingle_k)
        segs, hu = _segment_unique(h.view(np.int64), off)
        counts = np.bincount(segs, minlength=len(texts_py)).astype(np.int64)
        l_off = np.zeros(len(texts_py) + 1, dtype=np.int64)
        np.cumsum(counts, out=l_off[1:])
        shingles = pa.LargeListArray.from_arrays(pa.array(l_off), pa.array(hu))
        return pa.table({id_col: batch[id_col], "shingles": shingles})

    return texts.map_batches(build, batch_format="pyarrow")


def _verify_pairs_jaccard(
    pairs: rd.Dataset, texts: rd.Dataset, id_col: str, text_col: str,
    shingle_k: int, thr_milli: int,
) -> rd.Dataset:
    """Exact char-shingle Jaccard ≥ thr_milli/1000 over candidate pairs
    (integer compare — no float-boundary drift vs a SQL oracle).

    The attribute co-located with each pair is the doc's precomputed
    sorted-unique shingle-hash array (:func:`_shingle_attrs`), shipped
    once per judge partition; each pair is then an O(|A|+|B|) sorted
    merge (`searchsorted` + equality count) — no text ever re-shingled
    downstream."""
    attrs = _shingle_attrs(texts, id_col, text_col, shingle_k)
    val_type = pa.large_list(pa.int64())

    def batch_check(vals: pa.Array, ia: np.ndarray, ib: np.ndarray) -> np.ndarray:
        la = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
        l_off = np.asarray(la.offsets, dtype=np.int64)  # slice-adjusted by pyarrow
        flat = np.asarray(la.values)
        out = np.empty(len(ia), dtype=bool)
        for t in range(len(ia)):  # per-pair merge of two ~doc-sized sorted arrays
            A = flat[l_off[ia[t]] : l_off[ia[t] + 1]]
            B = flat[l_off[ib[t]] : l_off[ib[t] + 1]]
            if len(A) > len(B):
                A, B = B, A
            if not len(A):
                out[t] = False
                continue
            pos = np.minimum(np.searchsorted(B, A), len(B) - 1)
            inter = int(np.count_nonzero(B[pos] == A))
            union = len(A) + len(B) - inter
            out[t] = 1000 * inter >= thr_milli * max(union, 1)
        return out

    return _verify_pairs(pairs, attrs, id_col, "shingles", val_type, batch_check)


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
    converged = False
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
            converged = True
            break
        prev_sum = s
    if not converged:
        # one-hop propagation advances one graph-diameter step per iter;
        # stopping silently would return WRONG (split) components
        raise RuntimeError(
            f"label propagation did not reach a fixpoint in {max_iters} iterations "
            f"(component diameter > {max_iters}); rerun with a larger max_iters"
        )
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
        return _band_rows(sigs, ids, bands, fingerprint64(batch[text_col]))

    # near-identical docs collide in EVERY band, so raw pair rows carry
    # up to bands× duplicates; the verify cogroup's attach stage dedupes
    # them globally for free (all copies of a pair hash to one attach
    # partition), so no separate groupby(["a","b"]) pass is needed
    pairs = (
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

    # ONE signature pass over the corpus: the (id, simhash, __fp) table
    # is 24 bytes/row and feeds BOTH the banding stage and the verify
    # attributes — no second text scan
    def sigs_fp(batch: pa.Table) -> pa.Table:
        st = simhash_signatures(batch, text_col=text_col, id_col=id_col)
        return st.append_column("__fp", pa.array(fingerprint64(batch[text_col]).view(np.int64)))

    sig_ds = ds.map_batches(sigs_fp, batch_format="pyarrow").materialize()

    def to_bands(batch: pa.Table) -> pa.Table:
        sig = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(sig)
        parts = []
        for i in range(bands):
            mask = _U((1 << widths[i]) - 1) if widths[i] < 64 else _U(0xFFFFFFFFFFFFFFFF)
            band_val = ((sig >> _U(int(shifts[i]))) & mask).view(np.int64)
            parts.append(
                pa.table(
                    {
                        "doc_id": batch[id_col],
                        "band_id": pa.array(np.full(n, i, dtype=np.int32)),
                        "band_hash": pa.array(band_val),
                        "__fp": batch["__fp"],
                    }
                )
            )
        return pa.concat_tables(parts)

    pairs = (
        sig_ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(_all_bucket_pairs, batch_format="pyarrow")
    ).materialize()
    if pairs.count() == 0:
        return pa.table(_EMPTY_CLUSTERS)

    # attribute dataset: (id, simhash) for candidate ids only, reusing
    # the already-computed signatures (broadcast the candidate set once)
    import pyarrow.compute as pc
    import ray as _ray

    both = pairs.map_batches(
        lambda b: pa.table({"i": pa.concat_arrays([b["a"].combine_chunks(), b["b"].combine_chunks()])}),
        batch_format="pyarrow",
    )
    cand_ref = _ray.put(pa.array(sorted(both.unique("i")), pa.int64()))

    def sig_rows(batch: pa.Table) -> pa.Table:
        cand_arr = _ray.get(cand_ref)
        return batch.filter(pc.is_in(batch[id_col], value_set=cand_arr)).select([id_col, "simhash"])

    sigs = sig_ds.map_batches(sig_rows, batch_format="pyarrow").materialize()

    def batch_check(vals: pa.Array, ia: np.ndarray, ib: np.ndarray) -> np.ndarray:
        sig = np.asarray(vals).astype(np.uint64)
        return _popcount64(sig[ia] ^ sig[ib]) <= max_hamming

    verified = _verify_pairs(pairs, sigs, id_col, "simhash", pa.int64(), batch_check)
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

    # assemble the broadcast matrix IN A TASK, never on the driver: the
    # block refs stay in plasma, the concat+normalize happens worker-side,
    # and the result ref is what gets broadcast — driver RSS stays flat
    # regardless of corpus size (only the tiny ref list moves through it)
    @_ray.remote(num_cpus=1)
    def _assemble(block_refs: list) -> tuple:
        tables = [_ray.get(r) for r in block_refs]  # nested refs resolve here
        full = pa.concat_tables(tables).combine_chunks()
        ids_np = np.asarray(full[id_col])
        m = np.asarray(
            full[vec_col].combine_chunks().values.to_numpy(zero_copy_only=False), dtype=np.float64
        ).reshape(len(full), dim)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return ids_np, mn

    bundle = _assemble.remote(list(refs))

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


def _lev_banded(a: np.ndarray, b: np.ndarray, k: int) -> int:
    """Levenshtein distance between byte arrays ``a``/``b`` if ≤ k,
    else any value > k. Row DP with the prefix-min trick: the sequential
    insertion dependency cur[j] = min_{l≤j}(nolins[l] + (j-l)) collapses
    to ``accumulate(nolins - j) + j`` — every row is pure numpy, no inner
    Python loop. Rows clamp at k+1 (clamped entries can only ever yield
    ≥ k+1 downstream, so the ≤ k verdict is exact), and the scan aborts
    as soon as a full row exceeds k."""
    n, m = len(a), len(b)
    if abs(n - m) > k:
        return k + 1
    inf = k + 1
    j = np.arange(m + 1, dtype=np.int64)
    prev = np.minimum(j, inf)
    for i in range(1, n + 1):
        nolins = np.concatenate(
            (
                [min(i, inf)],
                np.minimum(prev[1:] + 1, prev[:-1] + (b != a[i - 1])),
            )
        )
        prev = np.minimum(np.minimum.accumulate(nolins - j) + j, inf)
        if prev.min() > k:
            return k + 1
    return int(prev[m])


def fuzzy_dup_pairs(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    bucket_width: int | None = None,
) -> rd.Dataset:
    """ALL document pairs within edit distance ≤ ``k`` (typo-level /
    template-drift mirrors exact-hash dedup misses), each with its exact
    distance: ``(id_a, id_b, dist)``, ``id_a < id_b``. EXACT — no
    LSH-style recall loss — via a provably lossless blocking key:
    ``|len(a) - len(b)| ≤ edit_distance``, so with length buckets of
    width ``W ≥ k`` every qualifying pair lands in the same or adjacent
    buckets. Each doc ships to its own bucket plus the PREVIOUS one
    (the own+carry shape of ``rolling_window_agg``, mirrored), and a
    pair is resolved exactly where its SHORTER doc is native: anchors
    are native docs, scanning longer docs only — natives of the same
    bucket or carries from the next — so every qualifying pair is
    counted exactly once with no post-hoc dedup shuffle.

    In-bucket work: docs sort by length and only (i, j) with
    ``len_j - len_i ≤ k`` reach the verifier (two-pointer window), each
    verified with a clamped row-DP Levenshtein (:func:`_lev_banded`,
    numpy rows, early abort past k). Distances are counted in UTF-8
    BYTES (uint8 view), matching DuckDB ``levenshtein``, which is
    byte-based — on ASCII text bytes == codepoints, and off-ASCII the
    byte distance upper-bounds the codepoint distance.

    SCALE NOTE: blocking by length alone is quadratic within a length
    band — exactness has no cheaper lossless key. At corpus scale run
    this as the VERIFY stage behind a candidate generator (MinHash/
    SimHash buckets), exactly like ``minhash_dedup``'s verify pass; the
    exact all-pairs form here is the oracle-checkable ground truth."""
    if k < 0:
        raise ValueError("k must be >= 0")
    W = bucket_width or max(k, 1)
    if W < max(k, 1):
        raise ValueError("bucket_width must be >= k")

    def expand(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ln = pc.binary_length(batch[text_col]).cast(pa.int64())
        b = pc.divide(ln, W).cast(pa.int64())
        cols = {
            id_col: batch[id_col],
            text_col: batch[text_col],
            "__len": ln,
        }
        own = pa.table({**cols, "__b": b})
        # carry to the PREVIOUS bucket: the pair is anchored at the
        # shorter doc's native bucket, which must see its longer
        # neighbors from one bucket up
        carry = pa.table({**cols, "__b": pc.subtract(b, 1)}).filter(
            pc.greater_equal(b, 1)
        )
        return pa.concat_tables([own, carry])

    def pairs(g: pa.Table) -> pa.Table:
        gid = int(g["__b"][0].as_py())
        ln = g["__len"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = g[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # native docs (this bucket is their own): len // W == gid
        order = np.argsort(ln, kind="stable")
        ln, ids = ln[order], ids[order]
        texts = g[text_col].take(pa.array(order)).to_pylist()
        cp = [np.frombuffer(t.encode("utf-8"), np.uint8) for t in texts]
        # byte-histogram lower bound: one edit changes the histogram by
        # L1 ≤ 2, so edit_distance ≥ L1/2 — a vectorized block kill of
        # the length window before any DP runs
        hist = np.zeros((len(cp), 256), dtype=np.int32)
        for i, arr in enumerate(cp):
            if len(arr):
                hist[i] = np.bincount(arr, minlength=256)
        native = (ln // W) == gid
        out_a, out_b, out_d = [], [], []
        hi = 0
        for i in range(len(ln)):
            if not native[i]:
                continue
            hi = max(hi, i + 1)
            while hi < len(ln) and ln[hi] - ln[i] <= k:
                hi += 1
            if hi <= i + 1:
                continue
            l1 = np.abs(hist[i + 1 : hi] - hist[i]).sum(axis=1)
            for j in (np.flatnonzero(l1 <= 2 * k) + i + 1):
                # exactly-once: the anchor i is native and ln[i] ≤ ln[j]
                # (sort order). Carries here come from the NEXT bucket,
                # so they are strictly longer than every native — a pair
                # of two natives resolves at its first-sorted member,
                # a native+carry pair only in this bucket (the native's
                # own carry went one bucket DOWN, where only carries
                # live and nothing anchors)
                a, b = cp[i], cp[j]
                # strip the common prefix/suffix (edit-distance
                # invariant): near-identical docs collapse to tiny DPs
                p = int(np.argmin(a[: len(b)] == b[: len(a)])) if min(len(a), len(b)) else 0
                if min(len(a), len(b)) and bool((a[: len(b)] == b[: len(a)]).all()):
                    p = min(len(a), len(b))
                a2, b2 = a[p:], b[p:]
                s = 0
                m = min(len(a2), len(b2))
                if m:
                    tail_eq = a2[len(a2) - m :] == b2[len(b2) - m :]
                    rev = tail_eq[::-1]
                    s = int(np.argmin(rev)) if not rev.all() else m
                d = _lev_banded(a2[: len(a2) - s], b2[: len(b2) - s], k)
                if d <= k and ids[i] != ids[j]:
                    out_a.append(min(ids[i], ids[j]))
                    out_b.append(max(ids[i], ids[j]))
                    out_d.append(d)
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "dist": pa.array(out_d, pa.int64()),
            }
        )

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(pairs, batch_format="pyarrow")
    )


def dedup_keep_best(
    docs: rd.Dataset,
    clusters: rd.Dataset,
    *,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    quality_col: str = "n_chars",
) -> rd.Dataset:
    """The dedup ACTION a curation pipeline takes over near-dup clusters
    (from :func:`minhash_dedup` / :func:`simhash_dedup` /
    :func:`fuzzy_dup_pairs`+components): per cluster keep the single row
    with the HIGHEST ``quality_col`` (ties → smallest ``id_col``); rows
    in no cluster survive untouched. → ``(id_col, quality_col)``.

    Scale shapes, never a broadcast of the cluster table (duplicates can
    be a large fraction of a crawl): the assignment joins to the corpus
    through the hash-bucketed :func:`~parquetjs_ray.functions.joins.equi_join`;
    winners reduce via the :func:`~parquetjs_ray.functions.groupops.group_argextreme`
    combiner (≤ 1 candidate row per (cluster, batch) moves); unclustered
    survivors anti-join through the Bloom-prefiltered
    :func:`~parquetjs_ray.functions.joins.semi_join`."""
    from .groupops import group_argextreme
    from .joins import equi_join, semi_join

    if isinstance(clusters, pa.Table):  # e.g. minhash_dedup's result table
        clusters = rd.from_arrow(clusters.select([id_col, cluster_col]))
    proj = docs.select_columns([id_col, quality_col])
    clustered = equi_join(
        proj,
        clusters,
        left_on=id_col,
        right_on=id_col,
        left_cols=[id_col, quality_col],
        right_cols=[cluster_col],
    )
    winners = group_argextreme(clustered, cluster_col, quality_col, id_col).map_batches(
        lambda b: pa.table(
            {id_col: b["max_" + id_col], quality_col: b["max_" + quality_col]}
        ),
        batch_format="pyarrow",
    )
    survivors = semi_join(
        proj, clusters, left_on=id_col, right_on=id_col, anti=True
    )
    return survivors.union(winners)


# ──────────────── prefix-filter exact similarity join ────────────────


def prefix_filter_dup_pairs(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    df_broadcast_limit: int = 64 << 20,
) -> rd.Dataset:
    """ALL pairs with char-shingle Jaccard ≥ threshold, with EXACT
    recall — the deterministic counterpart of :func:`minhash_dedup`'s
    LSH candidates (recall < 1 by construction there; = 1 here).

    Prefix filtering (Chaudhuri/Ganti/Kaushik ICDE 2006; Xiao et al.
    PPJoin, WWW 2008 — public methods): under ANY fixed global order of
    shingles, two sets with J(A,B) ≥ t must share at least one element
    inside each other's first ``|x| − ⌈t·|x|⌉ + 1`` elements, so
    emitting ONLY those prefix shingles as candidate keys loses no true
    pair. Ordering by ascending global document frequency (rarest
    first) makes prefix buckets small — the df pass is a (hash, count)
    combiner + groupby, and the df ranks ship back via one broadcast of
    the sorted (hash, df) arrays when they fit ``df_broadcast_limit``;
    beyond it the order falls back to plain hash order (still EXACT,
    just more candidates — the tradeoff is logged, never silent).

    Verification is the shared exact-Jaccard cogroup
    (:func:`_verify_pairs_jaccard`): integer threshold arithmetic, each
    candidate's sorted shingle array shipped to a judge partition at
    most once. Exact-duplicate cliques fold to stars in the bucket
    stage (``_all_bucket_pairs``), so boilerplate-heavy corpora do not
    go quadratic. Returns the verified (a, b) pair dataset, a < b."""
    from ray.data.aggregate import Sum

    thr_milli = round(jaccard_threshold * 1000)

    def attrs_fp(batch: pa.Table) -> pa.Table:
        texts_py = batch[text_col].to_pylist()
        h, off = _char_shingle_hashes(texts_py, shingle_k)
        segs, hu = _segment_unique(h.view(np.int64), off)
        counts = np.bincount(segs, minlength=len(texts_py)).astype(np.int64)
        l_off = np.zeros(len(texts_py) + 1, dtype=np.int64)
        np.cumsum(counts, out=l_off[1:])
        return pa.table(
            {
                id_col: batch[id_col],
                "shingles": pa.LargeListArray.from_arrays(pa.array(l_off), pa.array(hu)),
                "__fp": pa.array(fingerprint64(batch[text_col]).view(np.int64)),
            }
        )

    attrs = ds.map_batches(attrs_fp, batch_format="pyarrow").materialize()

    # global df per shingle hash: per-batch combiner → one small groupby
    def df_partial(b: pa.Table) -> pa.Table:
        la = b["shingles"].combine_chunks()
        flat = np.asarray(la.values)
        hu, cnt = np.unique(flat, return_counts=True)
        return pa.table({"h": pa.array(hu), "c": pa.array(cnt.astype(np.int64))})

    df_tbl = (
        attrs.select_columns(["shingles"])
        .map_batches(df_partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("c", alias_name="df"))
        .materialize()
    )
    import ray

    n_distinct = df_tbl.count()
    df_ref = None
    if n_distinct * 16 <= df_broadcast_limit:
        refs = df_tbl.to_arrow_refs()

        @ray.remote(num_cpus=1)
        def _assemble(block_refs: list):
            full = pa.concat_tables([ray.get(r) for r in block_refs])
            h = np.asarray(full["h"])
            d = np.asarray(full["df"])
            order = np.argsort(h, kind="stable")
            return h[order], d[order]

        df_ref = _assemble.remote(list(refs))
    else:  # pragma: no cover - corpus-scale branch
        import logging

        logging.getLogger(__name__).warning(
            "prefix filter: df table (%d shingles) exceeds broadcast limit; "
            "falling back to hash-order prefixes (exact, more candidates)",
            n_distinct,
        )

    def prefix_rows(b: pa.Table) -> pa.Table:
        la = b["shingles"].combine_chunks()
        off = np.asarray(la.offsets, dtype=np.int64)
        flat = np.asarray(la.values)
        lens = np.diff(off)
        n = len(lens)
        if not len(flat):
            return pa.table(
                {"h": pa.array([], pa.int64()),
                 id_col: pa.array([], pa.int64()),
                 "__fp": pa.array([], pa.int64())}
            )
        seg = np.repeat(np.arange(n, dtype=np.int64), lens)
        if df_ref is not None:
            h_sorted, d_sorted = ray.get(df_ref)
            d = d_sorted[np.searchsorted(h_sorted, flat)]  # every hash present
            order = np.lexsort((flat, d, seg))
        else:
            order = np.lexsort((flat, seg))  # hash order fallback
        # prefix length p = L − ⌈t·L⌉ + 1 (≥1 for every nonempty set)
        p = lens - (thr_milli * lens + 999) // 1000 + 1
        rank = np.arange(len(flat)) - np.repeat(off[:-1], lens)
        keep = order[rank < np.repeat(p, lens)]
        ids = b[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        fps = b["__fp"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "h": pa.array(flat[keep]),
                id_col: pa.array(ids[seg[keep]]),
                "__fp": pa.array(fps[seg[keep]]),
            }
        )

    pairs = (
        attrs.map_batches(prefix_rows, batch_format="pyarrow")
        .groupby("h")
        .map_groups(lambda g: _all_bucket_pairs(g, id_col=id_col), batch_format="pyarrow")
    ).materialize()
    if pairs.count() == 0:
        return pairs
    texts = _candidate_texts(ds, pairs, id_col, text_col).materialize()
    verified = _verify_pairs_jaccard(pairs, texts, id_col, text_col, shingle_k, thr_milli)
    # a pair sharing several prefix shingles is proposed once per shared
    # bucket, and the broadcast verify leg dedupes per batch only — this
    # operator RETURNS pairs (not clusters), so dedupe the result-sized
    # verified set explicitly
    from ray.data.aggregate import Count

    return (
        verified.groupby(["a", "b"])
        .aggregate(Count(alias_name="__n"))
        .select_columns(["a", "b"])
    )
