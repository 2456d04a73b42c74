"""Document-frequency scoring (the tf-idf family, integer-exact form).

Two passes, both the shapes the 100 TB notes prescribe:

1. **df pass** — each batch emits its docs' DISTINCT words (vectorized:
   one split, one per-doc sort, one boundary diff), pre-reduced to
   per-batch (word, partial_df) counts BEFORE the shuffle, so the
   ``groupby(word)`` moves one row per distinct word per batch, never
   one per occurrence.
2. **score pass** — the df table (vocabulary-sized, small) broadcasts
   once via ``ray.put``; each batch scores its docs with one
   ``pc.index_in`` lookup + one ``reduceat``.

The score is ``df_sum = Σ df(word)`` over a doc's distinct words plus
``n_distinct_words`` — all integers, so the DuckDB oracle matches
hash-exactly (a float idf would drift; rank order is the same).

Not in the reference (no query surface); part of the training-data
extension layer (quality/rarity scoring for corpus curation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

__all__ = ["doc_distinct_words", "df_score"]


def doc_distinct_words(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text"):
    """→ (doc row index ranges, flat distinct-word array) for one batch —
    vectorized per-doc dedup: split, sort within each doc, drop adjacent
    equals."""
    text = batch[text_col]
    text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    toks = pc.split_pattern(text, " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
    doc_of = np.repeat(np.arange(len(lens)), lens)
    words = toks.values
    # sort by (doc, word) then drop adjacent duplicates within each doc
    order = pc.sort_indices(
        pa.table({"d": pa.array(doc_of), "w": words}),
        sort_keys=[("d", "ascending"), ("w", "ascending")],
    ).to_numpy(zero_copy_only=False)
    w_sorted = words.take(pa.array(order))
    d_sorted = doc_of[order]
    n = len(w_sorted)
    keep = np.ones(n, dtype=bool)
    if n > 1:
        same_word = pc.equal(w_sorted.slice(1), w_sorted.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        keep[1:] = ~(same_word & (d_sorted[1:] == d_sorted[:-1]))
    return d_sorted[keep], w_sorted.filter(pa.array(keep))


def df_score(
    ds: rd.Dataset, *, id_col: str = "doc_id", text_col: str = "text"
) -> rd.Dataset:
    """→ (id_col, n_distinct_words, df_sum) per doc; see module docstring."""

    def partial_df(batch: pa.Table) -> pa.Table:
        _, words = doc_distinct_words(batch, id_col=id_col, text_col=text_col)
        # combiner: per-batch counts, one row per distinct word per batch
        vc = words.value_counts()
        return pa.table(
            {"word": vc.field("values"), "partial": vc.field("counts").cast(pa.int64())}
        )

    from ray.data.aggregate import Sum

    df_rows = (
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("partial", alias_name="df"))
        .take_all()
    )  # vocabulary-sized: small by construction
    vocab = pa.array([r["word"] for r in df_rows], pa.string())
    dfs = np.array([r["df"] for r in df_rows], dtype=np.int64)
    bundle_ref = ray.put((vocab, dfs))

    def score(batch: pa.Table) -> pa.Table:
        voc, d = ray.get(bundle_ref)  # zero-copy from plasma per task
        doc_idx, words = doc_distinct_words(batch, id_col=id_col, text_col=text_col)
        w_df = d[pc.index_in(words, voc).to_numpy(zero_copy_only=False)]
        n_docs = batch.num_rows
        counts = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
        sums = np.zeros(n_docs, dtype=np.int64)
        nz = np.flatnonzero(counts)
        if len(nz):
            offs = np.concatenate(([0], np.cumsum(counts[nz])))[:-1]
            sums[nz] = np.add.reduceat(w_df, offs)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_distinct_words": pa.array(counts),
                "df_sum": pa.array(sums),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
