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

__all__ = ["shared_ngram_stats"]

_U = np.uint64
_GOLDEN = _U(0x9E3779B97F4A7C15)
_BROADCAST_SHARED_BYTES = 64 << 20


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> _U(30))) * _U(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U(27))) * _U(0x94D049BB133111EB)
    return x ^ (x >> _U(31))


def _gram_doc_pairs(batch: pa.Table, text_col: str, id_col: str, n: int) -> pa.Table:
    """(gram hash, doc id) pairs, distinct per doc — fully vectorized."""
    texts = batch[text_col]
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
        gh = np.empty(0, np.uint64)
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
