"""Count-based n-gram language-model scoring for corpus quality filtering.

The CCNet / KenLM idea — score each document by how "expected" its word
sequences are under a model trained on the corpus itself — restated in
exact integer arithmetic so the result is oracle-checkable: a document's
score is the sum, over its word-bigram OCCURRENCES, of that bigram's
corpus-wide occurrence count. High scores = documents made of common
constructions; near-minimum scores (every bigram unique) flag gibberish,
mangled encodings and word-salad spam, which is what the perplexity
filter is for. (A float log-prob variant is a per-batch `np.log` away;
the integer form is the contract because it is reproducible bit-for-bit
in SQL.)

Ray-Data-first, two shuffles, both pair-sized (the text never moves):

1. one ``map_batches`` pass turns each doc into (bigram-hash, doc,
   count) triples — vectorized windowed hashing shared with
   :mod:`.spans` (n=2), then a lexsort collapse to per-doc counts, so a
   doc repeating "very very very" ships one triple, not one per token;
2. ``groupby(gram).sum(count)`` builds the corpus bigram table —
   vocabulary-sized, the same combiner-before-shuffle shape as
   :func:`~parquetjs_ray.functions.df.df_score`;
3. totals fold back into the triples: broadcast as two sorted arrays
   (``ray.put`` once, ``searchsorted`` per batch) while the table fits
   the object-store comfort bound, else the hash-bucketed
   :func:`~parquetjs_ray.functions.joins.equi_join` — the standard
   broadcast-vs-shuffle selection;
4. ``groupby(doc).sum`` folds triples to one row per scored doc.

Gram identity is a 64-bit hash (collision odds ~n_grams²/2⁶⁵). Documents
with fewer than two words have no bigrams and produce NO output row —
matching the SQL oracle's join shape.

Nothing reference-derived: the reference (ironSource/parquetjs) has no
text-analysis surface; this is part of the training-data extension layer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from .spans import _window_hashes

__all__ = ["bigram_lm_score"]

_BROADCAST_TOTALS_BYTES = 64 << 20


def _bigram_doc_counts(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """(gram hash, doc id, occurrence count) triples — fully vectorized."""
    _, _, gh, doc_idx, _ = _window_hashes(batch[text_col], 2)
    total = len(gh)
    order = np.lexsort((gh, doc_idx))
    gh, doc_idx = gh[order], doc_idx[order]
    new = np.ones(total, dtype=bool)
    if total > 1:
        new[1:] = (gh[1:] != gh[:-1]) | (doc_idx[1:] != doc_idx[:-1])
    starts = np.flatnonzero(new)
    cnt = np.diff(np.concatenate((starts, [total])))
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table(
        {
            "gram": pa.array(gh[starts].view(np.int64)),
            "doc": ids.take(pa.array(doc_idx[starts], pa.int64())),
            "cnt": pa.array(cnt.astype(np.int64)),
        }
    )


def bigram_lm_score(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """→ (``id_col``, n_bigrams, lm_score) per doc with ≥1 word bigram
    — the id column is echoed under the caller-supplied name.

    ``n_bigrams`` counts occurrences (``n_words - 1`` for space-split
    text); ``lm_score`` = Σ over occurrences of the bigram's corpus
    count. See module docstring for the distributed shape."""
    pairs = ds.map_batches(
        lambda b: _bigram_doc_counts(b, text_col, id_col), batch_format="pyarrow"
    ).materialize()  # reused twice: gram totals, then the per-doc fold

    totals = pairs.groupby("gram").aggregate(Sum("cnt", alias_name="total")).materialize()

    if totals.count() * 16 <= _BROADCAST_TOTALS_BYTES:
        refs = totals.to_arrow_refs()

        @ray.remote(num_cpus=1)
        def _assemble(block_refs: list):
            full = pa.concat_tables([ray.get(r) for r in block_refs])
            g = np.asarray(full["gram"])
            t = np.asarray(full["total"])
            order = np.argsort(g, kind="stable")
            return g[order], t[order]

        bundle = _assemble.remote(list(refs))

        def fold(t: pa.Table) -> pa.Table:
            g_sorted, tot = ray.get(bundle)  # zero-copy from plasma
            g = np.asarray(t["gram"].combine_chunks() if isinstance(t["gram"], pa.ChunkedArray) else t["gram"])
            cnt = np.asarray(t["cnt"].combine_chunks() if isinstance(t["cnt"], pa.ChunkedArray) else t["cnt"])
            pos = np.searchsorted(g_sorted, g)  # every gram is in the table
            return pa.table(
                {
                    id_col: t["doc"],
                    "n_bigrams": pa.array(cnt),
                    "lm_score": pa.array(cnt * tot[pos]),
                }
            )

        partials = pairs.map_batches(fold, batch_format="pyarrow")
    else:
        # bigram table beyond broadcast comfort: bucketed shuffle join.
        # explicit bucket count — both inputs are materialized, but the
        # auto-sizer's byte estimate is what we want to avoid re-deriving
        from .joins import equi_join

        joined = equi_join(
            pairs, totals, left_on="gram", right_on="gram",
            left_cols=["doc", "cnt"], right_cols=["total"], num_buckets=64,
        )

        def score(t: pa.Table) -> pa.Table:
            cnt = np.asarray(t["cnt"].combine_chunks() if isinstance(t["cnt"], pa.ChunkedArray) else t["cnt"])
            tot = np.asarray(t["total"].combine_chunks() if isinstance(t["total"], pa.ChunkedArray) else t["total"])
            return pa.table(
                {
                    id_col: t["doc"],
                    "n_bigrams": pa.array(cnt),
                    "lm_score": pa.array(cnt * tot),
                }
            )

        partials = joined.map_batches(score, batch_format="pyarrow")

    return (
        partials.groupby(id_col)
        .aggregate(Sum("n_bigrams", alias_name="n_bigrams"), Sum("lm_score", alias_name="lm_score"))
        .select_columns([id_col, "n_bigrams", "lm_score"])
    )
