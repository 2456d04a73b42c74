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

__all__ = ["build_vocab", "tokenize", "UNK_ID", "bpe_train", "bpe_encode"]

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


def _apply_merges_flat(t: np.ndarray, doc: np.ndarray, merges) -> tuple[np.ndarray, np.ndarray]:
    """Apply BPE merges in order over a flat token stream ``t`` with a
    parallel ``doc`` id array (merges never cross document boundaries).
    Greedy leftmost non-overlapping per merge — the standard BPE
    application order — fully vectorized: overlap conflicts only exist
    for a == b runs (an (a,b) match at i and i+1 needs t[i+1] to be both
    b and a), resolved by keeping alternate matches within each run."""
    for a, b, c in merges:
        if len(t) < 2:
            break
        m = (t[:-1] == a) & (t[1:] == b) & (doc[:-1] == doc[1:])
        idx = np.flatnonzero(m)
        if not len(idx):
            continue
        if a == b:
            new_run = np.concatenate(([True], np.diff(idx) != 1))
            run_head = np.maximum.accumulate(np.where(new_run, np.arange(len(idx)), 0))
            idx = idx[(np.arange(len(idx)) - run_head) % 2 == 0]
        t = t.copy()
        t[idx] = c
        keep = np.ones(len(t), dtype=bool)
        keep[idx + 1] = False
        t, doc = t[keep], doc[keep]
    return t, doc


def _flat_bytes(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """UTF-8 byte tokens of a string column as one flat int32 stream +
    a per-token doc index (zero-copy off the Arrow buffers)."""
    from ..arrow_util import string_buffers

    data, offsets = string_buffers(col)
    lens = np.diff(offsets)
    doc = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return data.astype(np.int32), doc


def bpe_train(ds, *, column: str = "text", n_merges: int = 32) -> list[tuple[int, int, int]]:
    """Train a byte-level BPE merge table over the corpus — the
    tokenizer-training job itself as a distributed pipeline.

    Each merge step is ONE map_batches pass: every batch applies the
    merges chosen so far to its own documents (vectorized,
    :func:`_apply_merges_flat`) and emits packed (pair, count) partials
    (vocabulary²-bounded, never corpus-sized); a pair-keyed Sum and a
    tiny sort pick the globally most frequent pair, ties to the
    smallest (a, b) — a total order, so the merge table is byte-stable
    across runs, block layouts and cluster sizes. New ids are
    ``256 + step``. Returns ``[(a, b, new_id), ...]``.

    SCALE NOTE: exact BPE needs one corpus pass per merge (the counts
    change after every merge) — at 10^12 scale train on a uniform
    sample (``ds.random_sample`` upstream) exactly like every
    production tokenizer; the pipeline shape is identical.
    """
    from ray.data.aggregate import Sum

    merges: list[tuple[int, int, int]] = []
    for step in range(n_merges):
        frozen = list(merges)

        def pair_counts(batch: pa.Table, _m=frozen) -> pa.Table:
            t, doc = _flat_bytes(
                batch[column].combine_chunks()
                if isinstance(batch[column], pa.ChunkedArray)
                else batch[column]
            )
            t, doc = _apply_merges_flat(t, doc, _m)
            if len(t) < 2:
                return pa.table({"pair": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})
            same = doc[:-1] == doc[1:]
            packed = (t[:-1].astype(np.int64) << 32) | t[1:].astype(np.int64)
            u, c = np.unique(packed[same], return_counts=True)
            return pa.table({"pair": pa.array(u), "cnt": pa.array(c.astype(np.int64))})

        top = (
            ds.map_batches(pair_counts, batch_format="pyarrow")
            .groupby("pair")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .sort(["cnt", "pair"], descending=[True, False])
            .limit(1)
            .take_all()
        )
        if not top or top[0]["cnt"] < 2:
            break
        pair = int(top[0]["pair"])
        merges.append((pair >> 32, pair & 0xFFFFFFFF, 256 + step))
    return merges


def bpe_encode(ds, merges, *, column: str = "text", id_col: str = "doc_id"):
    """Apply a trained BPE merge table to a text corpus →
    ``(id_col, tokens: list<int32>, n_tok)`` — the north-rule
    pre-tokenized shape, ready for ``pipelines.encode.encode_stream``.
    One stateless vectorized pass; the merge table travels in the task
    closure (kilobytes)."""
    frozen = list(merges)

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[column]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        t, doc = _flat_bytes(col)
        t, doc = _apply_merges_flat(t, doc, frozen)
        n = len(col)
        lens = np.bincount(doc, minlength=n) if len(doc) else np.zeros(n, np.int64)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(lens, out=offsets[1:])
        tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(t, pa.int32()))
        return pa.table(
            {
                id_col: batch[id_col],
                "tokens": tokens,
                "n_tok": pa.array(lens.astype(np.int64)),
            }
        )

    return ds.select_columns([id_col, column]).map_batches(fn, batch_format="pyarrow")


def vocab_overlap(
    ds,
    *,
    text_col: str = "text",
    key_col: str = "source",
) -> pa.Table:
    """Pairwise vocabulary overlap between corpus slices → one row per
    unordered ``key`` pair: ``(source_a, source_b, n_shared, n_union)``
    (pairs sharing no words are omitted, matching the SQL inner join).

    The scale plan never shuffles text and never builds per-pair word
    sets:

    1. per-batch LOCAL distinct ``(key, word)`` pairs (a C-level
       ``pa.Table.group_by`` — the combiner; mirror pages collapse
       before any exchange);
    2. one ``groupby(key, word)`` for GLOBAL distinct pairs;
    3. each distinct pair maps to ``(word, 1 << key_bit)`` — because the
       pairs are now globally unique, a plain vectorized ``Sum`` per
       word IS the bitwise OR of its key set;
    4. ``groupby(mask).count`` collapses the vocabulary to at most
       ``2^n_keys`` (in practice a handful of) mask rows — kilobytes;
    5. the driver finishes with one tiny ``(masks x keys)`` matmul:
       ``inter = (B * c).T @ B`` where ``B[m, k]`` is bit ``k`` of mask
       ``m`` — no word ever reaches the driver.

    The word-keyed shuffles in 2-3 move (word, small-int) pairs only;
    vocabulary >> memory is fine because masks fold per word.
    """
    from ray.data.aggregate import Count, Sum

    keys = sorted(
        r[key_col] for r in ds.groupby(key_col).count().select_columns([key_col]).take_all()
    )
    if len(keys) > 62:
        raise ValueError("vocab_overlap supports at most 62 distinct keys per call")
    keys_ref = ray.put(pa.array(keys, pa.string()))

    def local_pairs(batch: pa.Table) -> pa.Table:
        arr = batch[text_col].combine_chunks()
        toks = pc.split_pattern(arr, " ")
        lens = np.diff(np.asarray(toks.offsets).astype(np.int64))
        doc_idx = np.repeat(np.arange(len(arr), dtype=np.int64), lens)
        t = pa.table(
            {
                key_col: batch[key_col].combine_chunks().take(pa.array(doc_idx)),
                "word": toks.flatten(),
            }
        )
        return t.group_by([key_col, "word"]).aggregate([])  # local distinct

    distinct = (
        ds.select_columns([key_col, text_col])
        .map_batches(local_pairs, batch_format="pyarrow")
        .groupby([key_col, "word"])
        .aggregate(Count(alias_name="__c"))
    )

    def to_mask(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)  # sorted key list, position == bit
        kidx = (
            pc.index_in(batch[key_col].combine_chunks(), value_set=ks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table({"word": batch["word"], "mask": pa.array(np.int64(1) << kidx)})

    mask_counts = (
        distinct.map_batches(to_mask, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("mask", alias_name="mask"))  # globally-unique bits -> Sum == OR
        .groupby("mask")
        .count()
        .take_all()
    )  # <= 2^n_keys rows

    masks = np.array([r["mask"] for r in mask_counts], dtype=np.int64)
    cnts = np.array([r["count()"] for r in mask_counts], dtype=np.int64)
    n = len(keys)
    B = ((masks[:, None] >> np.arange(n)[None, :]) & 1).astype(np.int64)  # (masks, keys)
    inter = (B * cnts[:, None]).T @ B  # inter[i, j] = shared words of keys i, j
    vocab = np.diag(inter)
    rows = []
    for i in range(n):
        for j in range(i + 1, n):
            if inter[i, j] > 0:
                rows.append(
                    (keys[i], keys[j], int(inter[i, j]), int(vocab[i] + vocab[j] - inter[i, j]))
                )
    a, b_, sh, un = zip(*rows) if rows else ((), (), (), ())
    return pa.table(
        {
            "source_a": pa.array(list(a), pa.string()),
            "source_b": pa.array(list(b_), pa.string()),
            "n_shared": pa.array(list(sh), pa.int64()),
            "n_union": pa.array(list(un), pa.int64()),
        }
    )
