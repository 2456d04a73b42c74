"""Deterministic hash sampling and source mixing for training corpora.

Both operators are pure ``map_batches`` filters driven by a splitmix64
hash of the row key — no shuffle, no RNG state, byte-for-byte
reproducible across runs / resumes / cluster sizes, and exactly
replicable in SQL (the oracle reproduces the same mod-2^64 arithmetic
in HUGEINT). Rates are integers (parts-per-``den``), so there is no
float boundary drift anywhere.

``mix_sources`` is the two-pass data-mixing op a pre-training pipeline
runs before tokenization: a tiny ``groupby(source).count()`` (combiner
shuffle over per-source partial counts — kilobytes at any corpus size)
computes per-source keep rates against the target weights; the second
pass is the stateless hash filter. Nothing reference-derived: the
reference (ironSource/parquetjs) has no sampling surface; this is part
of the training-data extension layer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "hash_keep_mask",
    "stratified_sample",
    "mix_sources",
    "temperature_mix",
    "epoch_shuffle",
    "assign_splits",
    "reservoir_per_group",
    "budget_sample",
    "cap_per_group",
    "stratified_split_exact",
    "weighted_sample_k",
]

_U = np.uint64
_GOLDEN = 0x9E3779B97F4A7C15


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> _U(30))) * _U(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U(27))) * _U(0x94D049BB133111EB)
    return x ^ (x >> _U(31))


def hash_keep_mask(
    ids: np.ndarray, num: np.ndarray | int, den: int = 1_000_000, seed: int = 0
) -> np.ndarray:
    """keep[i] = mix64(ids[i] + seed*GOLDEN) % den < num (all integer)."""
    h = _mix64(ids.astype(np.uint64) + _U((seed * _GOLDEN) & 0xFFFFFFFFFFFFFFFF))
    return (h % _U(den)) < np.asarray(num, dtype=np.uint64)


def stratified_sample(
    ds,
    rates_ppm: dict[str, int] | int,
    key_col: str = "doc_id",
    strata_col: str = "source",
    den: int = 1_000_000,
    seed: int = 0,
):
    """Deterministic hash sample: keep a row iff
    ``mix64(key) % den < rate[stratum]``.

    ``rates_ppm`` is either one integer rate (uniform sample) or a
    per-stratum dict; strata absent from the dict are dropped (rate 0).
    The dict is closure-captured — it is one small int per stratum, not
    a data-sized broadcast. Embarrassingly parallel: one vectorized
    filter pass, no shuffle, stable under any batch/block composition.
    """
    uniform = isinstance(rates_ppm, int)
    if not uniform:
        strata = pa.array(list(rates_ppm.keys()))
        nums = np.fromiter(rates_ppm.values(), dtype=np.int64, count=len(rates_ppm))

    def f(batch: pa.Table) -> pa.Table:
        ids = batch[key_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        if uniform:
            num = rates_ppm
        else:
            idx = pc.index_in(batch[strata_col].combine_chunks(), value_set=strata)
            pos = idx.to_numpy(zero_copy_only=False)
            miss = np.isnan(pos) if pos.dtype.kind == "f" else (pos < 0)
            pos = np.where(miss, 0, pos).astype(np.int64)
            num = np.where(miss, 0, nums[pos])
        return batch.filter(pa.array(hash_keep_mask(ids, num, den, seed)))

    return ds.map_batches(f, batch_format="pyarrow")


def mix_sources(
    ds,
    weights: dict[str, int] | None = None,
    key_col: str = "doc_id",
    source_col: str = "source",
    den: int = 1_000_000,
    seed: int = 0,
    counts: dict[str, int] | None = None,
):
    """Downsample sources to match target mixture ``weights`` (integers;
    ``None`` = equal weights over observed sources).

    Pass 1 counts rows per source (tiny combiner shuffle; skipped when
    the caller already holds ``counts``). The largest feasible output
    size ``N`` satisfies ``N*w_s/W <= count_s`` for all weighted
    sources; per-source keep rates are then
    ``((N*w_s//W) * den) // count_s`` — all integer, so the SQL oracle
    reproduces them exactly. Pass 2 is :func:`stratified_sample`.
    """
    if counts is None:
        counts = {
            r[source_col]: r["count()"] for r in ds.groupby(source_col).count().take_all()
        }
    if weights is None:
        weights = {s: 1 for s in counts}
    W = sum(weights.values())
    feas = [counts[s] * W // w for s, w in weights.items() if w > 0 and s in counts]
    N = min(feas) if feas else 0
    rates = {}
    for s, w in weights.items():
        if w <= 0 or s not in counts:
            continue
        target = N * w // W
        rates[s] = min(den, target * den // counts[s])
    return stratified_sample(ds, rates, key_col, source_col, den, seed)


def temperature_mix(
    ds,
    key_col: str = "doc_id",
    source_col: str = "source",
    den: int = 1_000_000,
    seed: int = 0,
):
    """α=½ temperature-weighted source mixture: ``w_s = isqrt(count_s)``
    — the standard flattening a multi-source pre-training mix applies so
    head sources stop dominating without dropping tail sources to the
    equal-weight floor (temperature sampling à la multilingual LM data
    balancing; α=½ keeps every weight an EXACT integer via ``isqrt``, so
    the SQL oracle reproduces the rates bit-for-bit — fractional α would
    put a libm ``pow`` in the contract).

    One count pass feeds both the weights and :func:`mix_sources`'
    feasibility arithmetic (``counts=`` reuse, no second shuffle)."""
    import math

    counts = {
        r[source_col]: r["count()"] for r in ds.groupby(source_col).count().take_all()
    }
    weights = {s: max(1, math.isqrt(int(c))) for s, c in counts.items()}
    return mix_sources(ds, weights, key_col, source_col, den, seed, counts=counts)


def assign_splits(
    ds,
    splits: dict[str, int],
    key_col: str = "doc_id",
    den: int = 1_000_000,
    seed: int = 0,
):
    """Deterministic named split assignment (train/val/test): a row
    lands in split i iff ``mix64(key + seed·GOLDEN) % den`` falls in
    split i's cumulative-weight band (integer cuts ``den·cumw_i // W``).

    TOTAL and DISJOINT by construction — every row gets exactly one
    split, so splits can never overlap or leak rows across re-runs,
    resumes, appends, or cluster sizes (the property a per-split
    ``stratified_sample`` chain can't guarantee). One stateless
    vectorized pass, no shuffle; SQL-replicable (same CASE over the
    HUGEINT hash replica). Appends a ``split`` string column."""
    names = list(splits)
    w = np.fromiter(splits.values(), dtype=np.int64, count=len(splits))
    if len(names) < 2 or (w <= 0).any():
        raise ValueError("splits needs >=2 names with positive integer weights")
    cuts = (np.cumsum(w) * den // int(w.sum())).astype(np.uint64)
    lookup = np.array(names, dtype=object)

    def f(batch: pa.Table) -> pa.Table:
        ids = batch[key_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        x = _mix64(ids.astype(np.uint64) + _U((seed * _GOLDEN) & 0xFFFFFFFFFFFFFFFF))
        idx = np.searchsorted(cuts, x % _U(den), side="right")
        return batch.append_column("split", pa.array(lookup[idx].tolist(), type=pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def epoch_shuffle(ds, *, key_col: str = "doc_id", seed: int = 0, key_out: str = "epoch_key"):
    """Deterministic global shuffle for one training epoch: order the
    corpus by ``mix64(key + seed·GOLDEN)`` with Ray's range-partitioned
    distributed sort.

    Every epoch passes a different ``seed`` for an independent
    permutation; the same seed reproduces the SAME order across runs,
    resumes and cluster sizes — the property ``random_shuffle()`` can't
    give — so a preempted training job re-reads its epoch stream
    byte-identically. The sort key is kept as a uint64 column (SQL's
    HUGEINT replica orders identically); drop ``key_out`` downstream if
    unwanted. Keys must be unique for a total order (mix64 is bijective,
    so unique keys stay unique)."""

    def keyed(b: pa.Table) -> pa.Table:
        ids = b[key_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        v = ids.to_numpy(zero_copy_only=False)
        u = v.astype(np.uint64) if v.dtype.kind == "u" else v.astype(np.int64).view(np.uint64)
        h = _mix64(u + _U((seed * _GOLDEN) & 0xFFFFFFFFFFFFFFFF))
        return b.append_column(key_out, pa.array(h))

    return ds.map_batches(keyed, batch_format="pyarrow").sort(key_out)


def reservoir_per_group(
    ds,
    k: int,
    *,
    key_col: str = "doc_id",
    group_col: str = "source",
    seed: int = 0,
):
    """EXACT-size deterministic sample: the ``k`` rows with the smallest
    ``mix64(key + seed·GOLDEN)`` per group — the distributed equivalent
    of per-stratum reservoir sampling, but reproducible (same seed →
    byte-identical sample across runs, resumes and cluster sizes,
    unlike a stateful reservoir). Rate-based :func:`stratified_sample`
    only hits its target IN EXPECTATION; this hits it exactly — the
    shape needed for "exactly 10k eval docs per language" carve-outs.

    Two-phase, bounded shuffle:

    1. per-batch combiner: hash-rank rows within each group present in
       the batch and keep that batch's local top-``k`` (vectorized
       lexsort + run-rank, no Python per group) — at most ``k`` rows
       per (group × batch) survive;
    2. ``groupby(group).map_groups`` merges local winners: each final
       group holds ≤ k × n_batches_with_that_group rows (kilobytes for
       any realistic ``k``), so the shuffle moves candidate winners
       only, never the corpus.

    Keys must be unique across the dataset (mix64 is bijective, so
    ranks never tie and the sample is a deterministic function of the
    key set alone — independent of block layout)."""
    if k <= 0:
        raise ValueError("k must be positive")
    salt = _U((seed * _GOLDEN) & 0xFFFFFFFFFFFFFFFF)

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch[key_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        h = _mix64(ids.astype(np.uint64) + salt)
        g = pc.dictionary_encode(batch[group_col].combine_chunks()).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        order = np.lexsort((h, g))
        gs = g[order]
        run_start = np.flatnonzero(np.concatenate(([True], gs[1:] != gs[:-1])))
        run_len = np.diff(np.concatenate((run_start, [len(gs)])))
        rank = np.arange(len(gs)) - np.repeat(run_start, run_len)
        keep = np.zeros(len(gs), dtype=bool)
        keep[order[rank < k]] = True
        return batch.append_column("__h", pa.array(h)).filter(pa.array(keep))

    def merge_topk(group: pa.Table) -> pa.Table:
        h = group["__h"].to_numpy(zero_copy_only=False)
        idx = np.argsort(h, kind="stable")[:k]
        return group.take(pa.array(np.sort(idx))).drop_columns(["__h"])

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(merge_topk, batch_format="pyarrow")
    )


def budget_sample(
    ds,
    budget: int,
    *,
    id_col: str = "doc_id",
    group_col: str = "source",
    len_col: str = "n_tok",
    seed: int = 0,
    bucket_bits: int = 10,
):
    """Token-budget carve-out: per group, keep documents in mix64-hash
    order until their cumulative ``len_col`` reaches ``budget`` — "give
    me exactly ~B training tokens per source", the budgeted analogue of
    :func:`reservoir_per_group` (which counts docs, not tokens).
    Deterministic: same seed → byte-identical selection across runs,
    resumes and cluster sizes.

    The cumulative sum needs an ORDERED prefix scan, which Ray Data has
    no primitive for — same two-level scan as
    :func:`~parquetjs_ray.functions.packing.pack_sequences`, keyed by
    hash instead of id:

    1. bucket rows by the TOP ``bucket_bits`` bits of ``mix64(id)``
       (order-preserving in hash space, uniformly sized by mix64's
       avalanche); per-(group, bucket) partial sums shuffle as a
       #buckets-sized aggregate, kilobytes at any corpus size;
    2. one driver pass over bucket summaries computes each bucket's
       exclusive starting offset — buckets that BEGIN past the budget
       are dropped wholesale before any row work;
    3. ``groupby(group, bucket).map_groups`` sorts each bounded bucket
       by hash, adds its offset to the local inclusive cumsum, and
       keeps rows with ``cum <= budget``.

    A doc straddling the boundary is dropped (conservative: the output
    never exceeds ``budget``). Keys must be unique."""
    import ray

    salt = _U((seed * _GOLDEN) & 0xFFFFFFFFFFFFFFFF)
    shift = _U(64 - bucket_bits)

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        h = _mix64(ids.astype(np.uint64) + salt)
        return batch.append_column("__h", pa.array(h)).append_column(
            "__bk", pa.array((h >> shift).astype(np.int64))
        )

    def combine(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                group_col: batch[group_col],
                "__bk": batch["__bk"],
                "__len": batch[len_col].cast(pa.int64()),
            }
        )
        return t.group_by([group_col, "__bk"]).aggregate([("__len", "sum")])

    # NOT materialized: the keyed pass is one hash per row, so recomputing
    # it for the final pass is far cheaper at corpus scale than pinning
    # the whole keyed corpus in the object store (same policy as
    # pack_sequences)
    src = ds.map_batches(keyed, batch_format="pyarrow")
    sums = (
        src.map_batches(combine, batch_format="pyarrow")
        .groupby([group_col, "__bk"])
        .sum("__len_sum")
        .take_all()
    )
    sums.sort(key=lambda r: (r[group_col], r["__bk"]))
    offsets: dict[tuple, int] = {}
    run_grp, run = None, 0
    for r in sums:
        if r[group_col] != run_grp:
            run_grp, run = r[group_col], 0
        if run <= budget:  # buckets starting past the budget never ship
            offsets[(r[group_col], r["__bk"])] = run
        run += int(r["sum(__len_sum)"])
    off_ref = ray.put(offsets)

    def take_within(group: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        if not group.num_rows:
            return group.drop_columns(["__h", "__bk"])
        key = (group[group_col][0].as_py(), group["__bk"][0].as_py())
        base = offs.get(key)
        if base is None:
            return group.slice(0, 0).drop_columns(["__h", "__bk"])
        h = group["__h"].to_numpy(zero_copy_only=False)
        lens = group[len_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        cum = base + np.cumsum(lens[order])
        keep_sorted = order[cum <= budget]
        return group.take(pa.array(np.sort(keep_sorted))).drop_columns(["__h", "__bk"])

    return src.groupby([group_col, "__bk"]).map_groups(take_within, batch_format="pyarrow")


def cap_per_group(
    ds,
    k: int,
    *,
    key_col: str = "doc_id",
    group_col: str = "source",
    seed: int = 0,
):
    """Per-group cap: keep at most ``k`` rows per ``group_col``, chosen
    deterministically by splitmix64 hash order of ``key_col`` — the
    standard per-domain cap a crawl pipeline applies so one hot mirror
    cannot dominate the corpus.

    Built on :func:`~parquetjs_ray.functions.groupops.group_top_k`, so
    it inherits the combiner-before-shuffle shape: every batch first
    reduces to its own k best rows per group, and only that residue
    (≤ k rows per (group, batch)) ever shuffles — the corpus itself
    never moves. The ordering hash is kept as 63 bits (``mix64 >> 1``,
    non-negative int64) so a SQL HUGEINT replica orders identically;
    ties (rare 63-bit collisions) break on ``key_col`` in both.
    """
    from .groupops import group_top_k

    salt = _U((seed * _GOLDEN) & 0xFFFFFFFFFFFFFFFF)

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch[key_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        h = _mix64(ids.astype(np.uint64) + salt) >> _U(1)
        return batch.append_column("__h63", pa.array(h.astype(np.int64)))

    capped = group_top_k(
        ds.map_batches(keyed, batch_format="pyarrow"),
        group_col,
        "__h63",
        k,
        tiebreak_col=key_col,
        descending=False,
    )
    return capped.drop_columns(["__h63"])


def stratified_split_exact(
    ds,
    splits: dict[str, int],
    *,
    key_col: str = "doc_id",
    group_col: str = "source",
    seed: int = 0,
):
    """EXACT-count stratified split: within every group, split ``i``
    receives exactly ``floor(n·cumw_i/W) - floor(n·cumw_{i-1}/W)`` rows
    (n = the group's row count) — the per-stratum guarantee
    :func:`assign_splits`'s global hash bands only hit in expectation.
    Rows are ranked inside each group by splitmix64 hash of ``key_col``
    (ties → ``key_col``), so membership is deterministic across runs,
    resumes and cluster sizes.

    Hot-key-proof AND tiny-group-proof: the 31-bit hash histogram rides
    a distinct-pair combiner shuffle and is broadcast once with per-pair
    counts. Because the hash is near-unique, almost every row is alone
    in its (group, hash) class — those rows resolve their rank with a
    STATELESS vectorized broadcast lookup (no groupby at all; a naive
    per-class ``map_groups`` spawns one group per row, the per-group
    overhead that killed the first version of this operator at 2M rows).
    Only rows in COLLIDING classes (expected ~n²/2³² per group — dozens
    at any realistic scale) take a cogroup to order ties by ``key_col``;
    the two branches union. Output: ``(key_col, group_col, split)``.
    """
    import ray

    from .quantiles import _value_hist_bundle

    names = list(splits)
    w = np.fromiter(splits.values(), dtype=np.int64, count=len(splits))
    if len(names) < 2 or (w <= 0).any():
        raise ValueError("splits needs >=2 names with positive integer weights")
    cumw = np.cumsum(w)
    W = int(w.sum())
    lookup = np.array(names, dtype=object)
    salt = _U((seed * _GOLDEN) & 0xFFFFFFFFFFFFFFFF)

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch[key_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        h = _mix64(ids.astype(np.uint64) + salt) >> _U(33)
        return pa.table(
            {
                key_col: batch[key_col],
                group_col: batch[group_col],
                "__h31": pa.array(h.astype(np.int64)),
            }
        )

    # one hash per row: recomputing the keyed pass for the two branches
    # is far cheaper at corpus scale than pinning it in the object store
    # (same policy as budget_sample)
    src = ds.map_batches(keyed, batch_format="pyarrow")
    bundle = _value_hist_bundle(src, group_col, "__h31")

    def _lookup(batch: pa.Table):
        """Vectorized bundle lookup → (pos, base, n_key, class_count)."""
        uk, comp, cum_before, totals, _, cs = ray.get(bundle)
        kidx = (
            pc.index_in(batch[group_col].combine_chunks(), value_set=pa.array(uk))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )  # uk is np.unique-sorted, so index_in position == bundle key index
        h = batch["__h31"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.searchsorted(comp, (kidx << 32) | h)
        return cum_before[pos], totals[kidx], cs[pos]

    def label_of(rank0: np.ndarray, n_key: np.ndarray) -> pa.Array:
        # split i owns rank0 in [n·cumw_{i-1}//W, n·cumw_i//W)
        idx = np.zeros(len(rank0), np.int64)
        for c in cumw[:-1]:
            idx += rank0 >= (n_key * int(c)) // W
        return pa.array(lookup[idx].tolist(), type=pa.string())

    def solo(batch: pa.Table) -> pa.Table:
        base, n_key, cnt = _lookup(batch)
        keep = cnt == 1  # alone in the tie class → rank is the offset itself
        t = pa.table(
            {
                key_col: batch[key_col],
                group_col: batch[group_col],
                "split": label_of(base, n_key),
            }
        )
        return t.filter(pa.array(keep))

    def colliding(batch: pa.Table) -> pa.Table:
        _, _, cnt = _lookup(batch)
        return batch.filter(pa.array(cnt > 1))

    def assign_class(g: pa.Table) -> pa.Table:
        base_a, n_a, _ = _lookup(g.slice(0, 1))
        base, n = int(base_a[0]), int(n_a[0])
        ids = g[key_col].combine_chunks()
        order = pc.array_sort_indices(ids).to_numpy(zero_copy_only=False)
        rank0 = np.empty(len(ids), np.int64)
        rank0[order] = base + np.arange(len(ids))
        return pa.table(
            {
                key_col: g[key_col],
                group_col: g[group_col],
                "split": label_of(rank0, np.full(len(ids), n, np.int64)),
            }
        )

    fast = src.map_batches(solo, batch_format="pyarrow")
    ties = (
        src.map_batches(colliding, batch_format="pyarrow")
        .groupby([group_col, "__h31"])
        .map_groups(assign_class, batch_format="pyarrow")
    )
    return fast.union(ties)


def weighted_sample_k(
    ds,
    k: int,
    *,
    weight_col: str = "n_chars",
    key_col: str = "doc_id",
    seed: int = 0,
):
    """Weighted sampling WITHOUT replacement: the standard distributed
    A-ES / exponential-keys scheme (Efraimidis & Spirakis 2006) — row i
    gets key ``u_i^(1/w_i)`` with ``u_i`` a deterministic hash-uniform
    in (0,1), and the k largest keys are the sample. Inclusion odds are
    proportional to weight; heavy documents (or quality scores) are
    favored without ever being guaranteed, and the whole draw is a pure
    function of (key set, weights, seed): byte-identical across runs,
    resumes, block layouts and cluster sizes.

    Keys are compared as ``log(u)/w`` (monotone in ``u^(1/w)``, avoids
    underflow at large weights). Two-phase, bounded shuffle like
    :func:`reservoir_per_group`: per-batch vectorized top-``k`` first —
    at most ``k`` rows per batch ever move — then one merge group of
    ≤ k × n_batches candidate rows. Ties are impossible up to hash
    collisions (mix64 is bijective on the unique keys; a collision
    would need equal weights AND equal hashes). Weights must be > 0;
    rows with weight ≤ 0 or null are excluded (never sampled).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    salt = _U((seed * _GOLDEN) & 0xFFFFFFFFFFFFFFFF)

    def akey(batch: pa.Table) -> np.ndarray:
        ids = batch[key_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        w = batch[weight_col].cast(pa.float64()).combine_chunks().to_numpy(zero_copy_only=False)
        h = _mix64(ids.astype(np.uint64) + salt)
        # u in (0,1): (h + 0.5) / 2^64 — never exactly 0 or 1
        u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0
        with np.errstate(divide="ignore", invalid="ignore"):
            key = np.log(u) / w  # max == max of u^(1/w); in (-inf, 0)
        key[~(w > 0)] = -np.inf  # non-positive/NaN weight: never sampled
        return key

    def local_topk(batch: pa.Table) -> pa.Table:
        key = akey(batch)
        if len(key) > k:
            kth = np.partition(key, len(key) - k)[len(key) - k]
            keep = key >= kth
        else:
            keep = np.ones(len(key), dtype=bool)
        keep &= np.isfinite(key)
        return batch.append_column("__akey", pa.array(key)).filter(pa.array(keep))

    def merge_topk(group: pa.Table) -> pa.Table:
        a = group["__akey"].to_numpy(zero_copy_only=False)
        idx = np.argsort(a, kind="stable")[::-1][:k]
        return group.take(pa.array(np.sort(idx))).drop_columns(["__akey", "__one"])

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__one", pa.array(np.zeros(batch.num_rows, np.int64))
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__one")
        .map_groups(merge_topk, batch_format="pyarrow")
    )
