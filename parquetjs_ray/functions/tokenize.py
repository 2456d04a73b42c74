"""Corpus tokenization: vocabulary build + vectorized text → token ids.

The bridge between a raw-text corpus and the north-rule pre-tokenized
table ``(doc_id, tokens: list<int32>, n_tok, source)``: build a rank
vocabulary from corpus statistics (one combiner-shuffled word count —
kilobyte-per-word metadata, the text itself never moves), broadcast it
once with ``ray.put``, then map every document through one vectorized
``pc.index_in`` pass. Output feeds ``pipelines.encode.encode_stream``
directly, giving a complete text → encoded-artifact pipeline.

Determinism: ranks order by (count desc, word asc) — a total order, so
the vocabulary (and therefore every token id) is byte-stable across
runs, block layouts, and cluster sizes, and exactly replicable in SQL
(``row_number() OVER (ORDER BY c DESC, w ASC)``). Out-of-vocabulary
words map to the reserved id 0; in-vocabulary ids are 1..top_k.

Nothing reference-derived: the reference (ironSource/parquetjs) has no
tokenization surface; this is part of the training-data extension layer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

__all__ = ["build_vocab", "tokenize", "UNK_ID"]

UNK_ID = 0


def build_vocab(ds, column: str = "text", top_k: int = 65_536) -> pa.Array:
    """Rank vocabulary: the ``top_k`` most frequent whitespace tokens,
    rank-ordered by (count desc, word asc). Returns a string array whose
    position i holds the word with token id i+1.

    Two shuffle-light passes: a per-batch ``value_counts`` combiner
    (emits (word, partial count) pairs — vocabulary-sized, not
    corpus-sized), a ``groupby(word)`` sum, then a sort+limit over
    vocabulary-sized data. The corpus text never moves."""
    from ray.data.aggregate import Sum

    def counts(batch: pa.Table) -> pa.Table:
        arr = batch[column]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        toks = pc.split_pattern(arr, " ")
        vc = toks.values.value_counts()
        return pa.table({"word": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())})

    agg = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "word"], descending=[True, False])
        .limit(top_k)
    )
    words = [r["word"] for r in agg.take_all()]
    return pa.array(words, type=pa.string())


def tokenize(
    ds,
    vocab: pa.Array | None = None,
    column: str = "text",
    id_col: str = "doc_id",
    top_k: int = 65_536,
    keep_columns: tuple[str, ...] = ("source",),
):
    """Tokenize a text Dataset into the north-rule shape
    ``(id_col, tokens: list<int32>, n_tok: int32, *keep_columns)``.

    ``vocab`` defaults to :func:`build_vocab` over ``ds`` itself (the
    classic two-pass shape: stats pass → broadcast → stateless encode
    pass, same as the encode pipeline's dict/FSST plan). The vocabulary
    ships once via ``ray.put``; each task runs one ``split_pattern`` and
    one ``index_in`` — no per-row Python, no shuffle."""
    if vocab is None:
        vocab = build_vocab(ds, column=column, top_k=top_k)
    vocab_ref = ray.put(vocab)

    def encode(batch: pa.Table) -> pa.Table:
        words = ray.get(vocab_ref)  # plasma-local after the first task per node
        arr = batch[column]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        toks = pc.split_pattern(arr, " ")
        idx = pc.index_in(toks.values, value_set=words)
        ids = pc.add(pc.fill_null(idx, -1), 1).cast(pa.int32())  # OOV → UNK_ID
        tokens = pa.ListArray.from_arrays(toks.offsets, ids)
        out = {id_col: batch[id_col], "tokens": tokens,
               "n_tok": pc.list_value_length(tokens).cast(pa.int32())}
        for c in keep_columns:
            if c in batch.column_names:
                out[c] = batch[c]
        return pa.table(out)

    return ds.map_batches(encode, batch_format="pyarrow")
