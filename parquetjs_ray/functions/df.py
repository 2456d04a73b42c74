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

__all__ = [
    "doc_distinct_words",
    "df_score",
    "bm25_topk",
    "vocab_coverage",
    "tfidf_top_terms",
]


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


def bm25_topk(
    ds: rd.Dataset,
    query_terms: list[str],
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 retrieval over the corpus: the top-``k`` documents for a
    bag-of-terms query (Robertson–Sparck Jones / Lucene idf form with
    the +1 guard) — the retrieval scorer a curation pipeline uses to
    pull topic-relevant training documents.

    Two zero-shuffle scans plus a candidate-sized merge:

    1. **stats pass** — each batch emits ONE kilobyte partial row
       (per-term document frequencies, Σ doc length, doc count,
       vectorized via one split + ``index_in`` + ``bincount``); the
       driver folds the partials into (df, N, avgdl) — closure-tiny.
    2. **score pass** — per-batch tf per (doc, term) with the same
       kernels, BM25 accumulated term-by-term in fixed query order
       (byte-reproducible), local top-``k`` per batch, global merge of
       ≤ k×batches candidates (the :func:`~parquetjs_ray.functions.
       sampling.weighted_sample_k` merge shape).

    Output: ``(id_col, score)``, score float64, descending, ties broken
    by ascending id. Scores are a pure deterministic function of the
    corpus + query (same floats on every run/layout).
    """
    if k <= 0 or not query_terms:
        raise ValueError("k and query_terms must be non-empty/positive")
    terms = pa.array(list(dict.fromkeys(query_terms)))  # dedup, keep order
    m = len(terms)

    def term_tf(batch: pa.Table):
        """(tf matrix n_docs×m, doc lengths) for one batch — vectorized."""
        text = batch[text_col]
        text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
        toks = pc.split_pattern(text, " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offs = np.asarray(toks.offsets).astype(np.int64)
        lens = np.diff(offs)
        n_docs = len(lens)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        tidx = pc.index_in(toks.values, value_set=terms).to_numpy(zero_copy_only=False)
        hit = ~np.isnan(tidx) if tidx.dtype.kind == "f" else (tidx >= 0)
        flat = doc_of[hit] * m + tidx[hit].astype(np.int64)
        tf = np.bincount(flat, minlength=n_docs * m).reshape(n_docs, m)
        return tf, lens

    def stats_partial(batch: pa.Table) -> pa.Table:
        tf, lens = term_tf(batch)
        df = (tf > 0).sum(axis=0).astype(np.int64)
        return pa.table(
            {
                "df": pa.array([df.tolist()], pa.list_(pa.int64())),
                "sum_dl": pa.array([int(lens.sum())], pa.int64()),
                "n_docs": pa.array([len(lens)], pa.int64()),
            }
        )

    parts = ds.map_batches(stats_partial, batch_format="pyarrow").take_all()
    df = np.zeros(m, np.int64)
    sum_dl = n = 0
    for r in parts:
        df += np.asarray(r["df"], np.int64)
        sum_dl += r["sum_dl"]
        n += r["n_docs"]
    if n == 0:
        raise ValueError("empty corpus")
    avgdl = sum_dl / n
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)  # ≥ 0 always

    def score_batch(batch: pa.Table) -> pa.Table:
        tf, lens = term_tf(batch)
        norm = k1 * (1.0 - b + b * (lens / avgdl))  # per-doc length norm
        score = np.zeros(len(lens), np.float64)
        for t in range(m):  # fixed query order → byte-reproducible sums
            tft = tf[:, t]
            score += idf[t] * (tft * (k1 + 1.0)) / (tft + norm)
        out = pa.table({id_col: batch[id_col], "score": pa.array(score)})
        if len(score) > k:
            kth = np.partition(score, len(score) - k)[len(score) - k]
            out = out.filter(pa.array(score >= kth))
        return out.append_column(
            "__one", pa.array(np.zeros(out.num_rows, np.int64))
        )

    def merge(group: pa.Table) -> pa.Table:
        s = group.sort_by([("score", "descending"), (id_col, "ascending")])
        return s.slice(0, k).drop_columns(["__one"])

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(score_batch, batch_format="pyarrow")
        .groupby("__one")
        .map_groups(merge, batch_format="pyarrow")
    )


def vocab_coverage(
    ds: rd.Dataset,
    coverage_num: int,
    coverage_den: int,
    *,
    text_col: str = "text",
) -> rd.Dataset:
    """The smallest vocabulary covering ≥ ``coverage_num/coverage_den``
    of the corpus' token mass → ``(word, cnt)`` — tokenizer-vocab
    truncation / OOV-budget planning. Exact SQL semantics: keep words in
    ``(cnt DESC, word ASC)`` order while the EXCLUSIVE running mass is
    still below ``floor(total·num/den)`` (all integer arithmetic, so the
    result hash-matches the SQL window form bit-for-bit).

    No global sort, no corpus-sized driver state — the two-phase
    histogram trick of :func:`~parquetjs_ray.functions.order.global_order`
    with the twist that ordering BY the count itself makes every tie
    class a cnt class:

    1. word counts ride the standard per-batch combiner → one
       ``groupby(word)`` Sum shuffle (vocabulary-sized);
    2. a per-cnt histogram (cnt → n_words, tiny: distinct count VALUES,
       ~√corpus under Zipf) folds on the driver in cnt-descending order
       to locate the single BOUNDARY class c* and how many of its words
       ``k`` fit (every word of a class with cum_before < threshold and
       class end ≤ threshold keeps statelessly);
    3. classes above c* filter statelessly; the boundary class takes its
       first ``k`` words in word order via the
       :func:`~parquetjs_ray.functions.groupops.group_top_k` combiner
       (≤ k words per batch ever shuffle).
    """
    from ray.data.aggregate import Sum

    from .groupops import group_top_k

    if not (0 < coverage_num <= coverage_den):
        raise ValueError("coverage must be in (0, 1]")

    def word_counts(batch: pa.Table) -> pa.Table:
        text = batch[text_col].combine_chunks()
        flat = pc.list_flatten(pc.split_pattern(text, " "))
        t = pa.table({"word": flat})
        return t.group_by(["word"]).aggregate([([], "count_all")])

    vocab = (
        ds.map_batches(word_counts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("count_all", alias_name="cnt"))
        .materialize()  # reused by the histogram and both keep paths
    )

    def cnt_hist(b: pa.Table) -> pa.Table:
        return pa.table({"cnt": b["cnt"]}).group_by(["cnt"]).aggregate(
            [([], "count_all")]
        )

    hist = (
        vocab.map_batches(cnt_hist, batch_format="pyarrow")
        .groupby("cnt")
        .aggregate(Sum("count_all", alias_name="n_words"))
        .take_all()
    )  # distinct count values — kilobytes under any realistic Zipf corpus
    hist.sort(key=lambda r: -int(r["cnt"]))
    total = sum(int(r["cnt"]) * int(r["n_words"]) for r in hist)
    threshold = (total * coverage_num) // coverage_den

    cum = 0
    c_star, k_star = None, 0
    for r in hist:
        c, nw = int(r["cnt"]), int(r["n_words"])
        if cum + c * nw >= threshold:  # boundary class: take ceil((threshold-cum)/c) words
            need = threshold - cum
            c_star = c
            k_star = -(-need // c) if need > 0 else 0
            break
        cum += c * nw
    if c_star is None:  # coverage == 1 with exact-total threshold: keep all
        return vocab

    whole = vocab.filter(expr=f"cnt > {c_star}")
    if k_star == 0:
        return whole
    boundary = vocab.filter(expr=f"cnt == {c_star}").map_batches(
        lambda b: b.append_column("__one", pa.array(np.ones(b.num_rows, np.int64))),
        batch_format="pyarrow",
    )
    head = group_top_k(
        boundary, "__one", "word", k_star, tiebreak_col="word", descending=False
    ).map_batches(lambda b: b.drop_columns(["__one"]), batch_format="pyarrow")
    return whole.union(head)


def _doc_term_counts(batch: pa.Table, *, text_col: str):
    """→ (doc row index per distinct (doc, word) pair, distinct words,
    per-doc term frequencies) for one batch — the tf companion of
    :func:`doc_distinct_words`: one split, one (doc, word) sort, run
    lengths instead of run dedup."""
    text = batch[text_col]
    text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    toks = pc.split_pattern(text, " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
    doc_of = np.repeat(np.arange(len(lens)), lens)
    words = toks.values
    order = pc.sort_indices(
        pa.table({"d": pa.array(doc_of), "w": words}),
        sort_keys=[("d", "ascending"), ("w", "ascending")],
    ).to_numpy(zero_copy_only=False)
    w_sorted = words.take(pa.array(order))
    d_sorted = doc_of[order]
    n = len(w_sorted)
    new_run = np.ones(n, dtype=bool)
    if n > 1:
        same_word = pc.equal(w_sorted.slice(1), w_sorted.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        new_run[1:] = ~(same_word & (d_sorted[1:] == d_sorted[:-1]))
    starts = np.flatnonzero(new_run)
    tf = np.diff(np.concatenate((starts, [n]))).astype(np.int64)
    return d_sorted[starts], w_sorted.take(pa.array(starts)), tf


def tfidf_top_terms(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    scale: int = 1000,
) -> rd.Dataset:
    """Keyword extraction: the ``k`` strongest tf-idf terms per document
    → ``(id_col, word, tf, score_milli)``. Integer-exact scoring so the
    SQL replica matches hash-exactly (no float log anywhere):
    ``idf_milli = (scale·N) // df`` and ``score_milli = tf · idf_milli``
    — both big-int floor arithmetic, rank ties broken by word ascending.
    Valid while ``scale·N·tf_max < 2^63`` (at 10^12 docs and scale=1000
    that allows tf up to ~9000, and the same bound applies to the SQL
    side's BIGINT).

    Scale shape: pass 1 is the df pass (per-batch distinct-word
    combiner → one vocabulary-sized ``groupby(word)``); the vocabulary
    broadcasts ONCE via ``ray.put`` (lex-sorted, with a precomputed
    idf_milli array); pass 2 is shuffle-free — each batch computes its
    docs' tf runs, scores with one ``index_in`` lookup, and keeps the
    top-k per doc with the run-rank trick (order by score desc, word's
    lexicographic ordinal asc). Documents never leave their block."""
    from ray.data.aggregate import Sum

    def partial_df(batch: pa.Table) -> pa.Table:
        _, words = doc_distinct_words(batch, id_col=id_col, text_col=text_col)
        vc = words.value_counts()
        return pa.table(
            {"word": vc.field("values"), "partial": vc.field("counts").cast(pa.int64())}
        )

    n_docs = ds.count()
    df_rows = (
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("partial", alias_name="df"))
        .take_all()
    )  # vocabulary-sized: small by construction
    df_rows.sort(key=lambda r: r["word"])  # lexicographic ordinal = tie-break order
    vocab = pa.array([r["word"] for r in df_rows], pa.string())
    idf_milli = np.array(
        [(scale * n_docs) // r["df"] for r in df_rows], dtype=np.int64
    )
    bundle_ref = ray.put((vocab, idf_milli))

    def topk(batch: pa.Table) -> pa.Table:
        voc, idf = ray.get(bundle_ref)  # zero-copy from plasma per task
        doc_idx, words, tf = _doc_term_counts(batch, text_col=text_col)
        ordinal = pc.index_in(words, voc).to_numpy(zero_copy_only=False)
        score = tf * idf[ordinal]
        order = np.lexsort((ordinal, -score, doc_idx))
        d_sorted = doc_idx[order]
        n = len(order)
        new_run = np.ones(n, dtype=bool)
        if n > 1:
            new_run[1:] = d_sorted[1:] != d_sorted[:-1]
        run_start = np.maximum.accumulate(np.where(new_run, np.arange(n), 0))
        keep = order[(np.arange(n) - run_start) < k]
        ids = batch[id_col]
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        return pa.table(
            {
                id_col: ids.take(pa.array(doc_idx[keep])),
                "word": words.take(pa.array(keep)),
                "tf": pa.array(tf[keep]),
                "score_milli": pa.array(score[keep]),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        topk, batch_format="pyarrow"
    )
