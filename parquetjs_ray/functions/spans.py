"""Cross-document duplicated n-gram span detection.

Training-data curation flags documents that share long verbatim word
spans with OTHER documents (boilerplate, mirrored pages, licence
blocks) — the span-level statistic behind substring-dedup decisions
(cf. "Deduplicating Training Data Makes Language Models Better", Lee et
al. 2022, which dedups repeated 50-token substrings corpus-wide).

:func:`shared_ngram_stats` computes, per document, the number of
distinct word ``n``-grams it contains and how many of those also occur
in at least one other document:

1. one ``map_batches`` pass turns each doc into its DISTINCT n-gram
   hashes (space-split words → per-word content fingerprint → one
   vectorized rolling combine per window; dedupe inside the batch) —
   the only pass that touches text;
2. ``groupby(gram).aggregate(Count)`` over the 16-byte (gram, doc)
   pairs finds grams whose doc-count exceeds 1 — Ray's sort-based
   shuffle, no per-gram Python groups;
3. the shared-gram set joins back to the pairs: broadcast as ONE sorted
   int64 array (``ray.put`` once, ``searchsorted`` per batch) while it
   fits the object-store comfort bound, else the hash-bucketed
   ``equi_join`` shuffle path — the same broadcast-vs-shuffle selection
   the dedup verify stage uses;
4. per-doc partial counts merge with ``groupby(doc).sum`` — no join.

Gram identity is a 64-bit hash (collision odds ~n_grams²/2⁶⁵ — nil at
any corpus the counts are read at); documents shorter than ``n`` words
produce no grams and no output row, matching the SQL oracle's shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..arrow_util import string_buffers

__all__ = ["shared_ngram_stats", "remove_shared_spans"]

_U = np.uint64
_GOLDEN = _U(0x9E3779B97F4A7C15)
_BROADCAST_SHARED_BYTES = 64 << 20


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> _U(30))) * _U(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U(27))) * _U(0x94D049BB133111EB)
    return x ^ (x >> _U(31))


def _window_hashes(texts: pa.ChunkedArray | pa.Array, n: int):
    """Vectorized word n-gram hashes for EVERY window position.

    → (flat word values, per-doc word offsets, window gram hashes,
    window doc index, window start in FLAT word index space). Windows
    never cross a document (starts derive from each doc's own offsets)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.split_pattern(texts, " ")
    woff = np.asarray(words.offsets)
    flat = words.values
    # per-word content fingerprint (same hash family as the engine's
    # text fingerprints), then a positional rolling combine per window
    from .text import fingerprint64

    wh = fingerprint64(flat) if len(flat) else np.empty(0, np.uint64)
    lens = np.diff(woff)
    wins = np.maximum(lens - (n - 1), 0).astype(np.int64)
    total = int(wins.sum())
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), wins)
    if total:
        win0 = np.cumsum(np.concatenate(([0], wins[:-1])))
        starts = np.repeat(woff[:-1].astype(np.int64), wins) + (
            np.arange(total, dtype=np.int64) - np.repeat(win0, wins)
        )
        acc = np.zeros(total, dtype=np.uint64)
        for k in range(n):
            salt = _U((0x9E3779B97F4A7C15 * (k + 1)) & 0xFFFFFFFFFFFFFFFF)
            acc += _mix64(wh[starts + k] ^ salt)
        gh = _mix64(acc)
    else:
        starts = np.empty(0, np.int64)
        gh = np.empty(0, np.uint64)
    return flat, woff, gh, doc_idx, starts


def _gram_doc_pairs(batch: pa.Table, text_col: str, id_col: str, n: int) -> pa.Table:
    """(gram hash, doc id) pairs, distinct per doc — fully vectorized."""
    _, _, gh, doc_idx, _ = _window_hashes(batch[text_col], n)
    total = len(gh)
    # distinct within doc: one lexsort over (doc, gram)
    order = np.lexsort((gh, doc_idx))
    gh, doc_idx = gh[order], doc_idx[order]
    keep = np.ones(total, dtype=bool)
    if total > 1:
        keep[1:] = (gh[1:] != gh[:-1]) | (doc_idx[1:] != doc_idx[:-1])
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table(
        {
            "gram": pa.array(gh[keep].view(np.int64)),
            "doc": ids.take(pa.array(doc_idx[keep], pa.int64())),
        }
    )


def shared_ngram_stats(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> rd.Dataset:
    """Per-doc distinct n-gram counts → (doc_id, n_grams, n_shared)."""
    pairs = ds.map_batches(
        lambda b: _gram_doc_pairs(b, text_col, id_col, n), batch_format="pyarrow"
    ).materialize()  # reused twice: gram counts, then the per-doc fold

    shared = (
        pairs.groupby("gram")
        .aggregate(Count(alias_name="nd"))
        .map_batches(
            lambda t: t.filter(pc.greater(t["nd"], 1)).select(["gram"]),
            batch_format="pyarrow",
        )
        .materialize()
    )

    n_shared_grams = shared.count()
    if n_shared_grams * 8 <= _BROADCAST_SHARED_BYTES:
        refs = shared.to_arrow_refs()

        @ray.remote(num_cpus=1)
        def _assemble(block_refs: list) -> np.ndarray:
            full = pa.concat_tables([ray.get(r) for r in block_refs])
            return np.sort(np.asarray(full["gram"]))

        bundle = _assemble.remote(list(refs))

        def fold(t: pa.Table) -> pa.Table:
            sorted_shared = ray.get(bundle)  # zero-copy from plasma
            g = np.asarray(t["gram"].combine_chunks() if isinstance(t["gram"], pa.ChunkedArray) else t["gram"])
            pos = np.searchsorted(sorted_shared, g)
            hit = (pos < len(sorted_shared)) & (sorted_shared[np.minimum(pos, len(sorted_shared) - 1)] == g) if len(sorted_shared) else np.zeros(len(g), bool)
            doc = t["doc"]
            out = pa.table({"doc_id": doc, "one": pa.array(np.ones(len(g), np.int64)), "hit": pa.array(hit.astype(np.int64))})
            return out

        partials = pairs.map_batches(fold, batch_format="pyarrow")
    else:
        # shared set beyond broadcast comfort: bucketed shuffle semi-join
        from .joins import equi_join

        # explicit bucket count: both inputs are lazily transformed, so the
        # auto-sizer's count() would re-execute the pair extraction
        matched = equi_join(
            pairs, shared, left_on="gram", right_on="gram", left_cols=["doc"],
            right_cols=[], num_buckets=64,
        )

        def mark(t: pa.Table, hit: bool) -> pa.Table:
            m = t.num_rows
            col = t["l_doc"] if "l_doc" in t.column_names else t["doc"]
            return pa.table(
                {
                    "doc_id": col,
                    "one": pa.array(np.full(m, 0 if hit else 1, np.int64)),
                    "hit": pa.array(np.full(m, 1 if hit else 0, np.int64)),
                }
            )

        partials = pairs.map_batches(lambda t: mark(t, False), batch_format="pyarrow").union(
            matched.map_batches(lambda t: mark(t, True), batch_format="pyarrow")
        )

    return (
        partials.groupby("doc_id")
        .aggregate(Sum("one", alias_name="n_grams"), Sum("hit", alias_name="n_shared"))
        .select_columns(["doc_id", "n_grams", "n_shared"])
    )


def _sorted_membership(gh: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    """Boolean mask: which of ``gh`` appear in ``sorted_set`` (int64-viewed
    uint64 hashes on both sides, one searchsorted pass)."""
    if not len(sorted_set) or not len(gh):
        return np.zeros(len(gh), bool)
    pos = np.searchsorted(sorted_set, gh)
    return (pos < len(sorted_set)) & (sorted_set[np.minimum(pos, len(sorted_set) - 1)] == gh)


def _clean_batch(
    batch: pa.Table, text_col: str, id_col: str, n: int, shared_sorted: np.ndarray
) -> pa.Table:
    """Drop every word position covered by a shared n-gram window —
    one pass, no per-row Python: hit windows mark a flat-word-index
    difference array, coverage is its running sum, and the surviving
    words re-join per doc via ``pc.binary_join``."""
    flat, woff, gh, _, flat_starts = _window_hashes(batch[text_col], n)
    # the shared set is stored (and sorted) as int64 — match its view so
    # searchsorted never upcasts to float64 and loses 64-bit exactness
    hit = _sorted_membership(gh.view(np.int64), shared_sorted)
    tw = len(flat)
    if hit.any():
        hs = flat_starts[hit]
        diff = np.bincount(hs, minlength=tw + n).astype(np.int64)
        diff -= np.bincount(hs + n, minlength=tw + n).astype(np.int64)
        covered = np.cumsum(diff)[:tw] > 0
    else:
        covered = np.zeros(tw, bool)
    keep = ~covered
    # per-doc surviving word counts → new list offsets (reduceat needs a
    # guard for zero-word layouts, which split_pattern never produces for
    # non-null input, but empty batches do)
    if len(woff) > 1 and tw:
        kept_per_doc = np.add.reduceat(keep.astype(np.int64), woff[:-1])
        # reduceat repeats the value when consecutive offsets are equal
        kept_per_doc[np.diff(woff) == 0] = 0
    else:
        kept_per_doc = np.zeros(max(len(woff) - 1, 0), np.int64)
    new_off = np.concatenate(([0], np.cumsum(kept_per_doc)))
    kept_words = flat.filter(pa.array(keep)) if tw else flat
    clean = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(new_off, pa.int32()), kept_words),
        pa.scalar(" "),
    )
    return pa.table(
        {
            id_col: batch[id_col],
            "clean_text": clean.cast(pa.string()),
            "n_removed": pa.array(
                (np.diff(woff) - kept_per_doc).astype(np.int64)
                if len(woff) > 1
                else np.zeros(0, np.int64)
            ),
        }
    )


def remove_shared_spans(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> rd.Dataset:
    """Cut cross-document boilerplate OUT of the corpus — the action
    counterpart of :func:`shared_ngram_stats` (Lee et al. 2022 remove
    duplicated substrings rather than whole near-dup docs).

    A word position is covered when any word ``n``-gram window over it
    occurs in ≥ ``min_docs`` DISTINCT documents; covered positions are
    dropped and the survivors re-join with single spaces →
    ``(id_col, clean_text, n_removed)`` for every input doc.

    Scale shape: the shared-gram set is found exactly like
    :func:`shared_ngram_stats` (distinct (gram, doc) pairs → Count per
    gram over the sort shuffle); the clean pass then needs gram
    membership per window. The shared set broadcasts as ONE sorted
    int64 array while it fits the object-store comfort bound
    (``ray.put`` once, ``searchsorted`` per batch, text never
    shuffles). Beyond that bound this operator raises rather than
    silently building a corpus-sized broadcast: a corpus whose
    boilerplate-gram set alone exceeds 64 MB (≈8M distinct shared
    grams) should dedup documents first (``minhash_dedup``) — removing
    spans is only meaningful once the gram set is boilerplate-sized.
    """
    pairs = ds.map_batches(
        lambda b: _gram_doc_pairs(b, text_col, id_col, n), batch_format="pyarrow"
    )
    shared = (
        pairs.groupby("gram")
        .aggregate(Count(alias_name="nd"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["nd"], min_docs)).select(["gram"]),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_shared = shared.count()
    if n_shared * 8 > _BROADCAST_SHARED_BYTES:
        raise ValueError(
            f"shared-gram set ({n_shared} grams) exceeds the broadcast bound "
            f"({_BROADCAST_SHARED_BYTES >> 20} MB); near-dup the corpus before span removal"
        )
    refs = shared.to_arrow_refs()

    @ray.remote(num_cpus=1)
    def _assemble(block_refs: list) -> np.ndarray:
        full = pa.concat_tables([ray.get(r) for r in block_refs])
        return np.sort(np.asarray(full["gram"]))

    bundle = _assemble.remote(list(refs))

    def clean(batch: pa.Table) -> pa.Table:
        return _clean_batch(batch, text_col, id_col, n, ray.get(bundle))

    return ds.map_batches(clean, batch_format="pyarrow")
