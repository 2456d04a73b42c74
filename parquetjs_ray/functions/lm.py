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

__all__ = ["bigram_lm_score", "collocations_topk"]

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


def collocations_topk(
    docs: rd.Dataset,
    *,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
) -> rd.Dataset:
    """Top-k PMI-ranked word collocations over the corpus — the
    phrase-mining primitive (multi-word-expression discovery for
    tokenizer vocabularies, boilerplate detection, collocation
    dictionaries) → ``(w1, w2, cnt, pmi_milli)``, the k strongest
    adjacent pairs by pointwise mutual information.

    EXACT integer arithmetic end to end, so the result is
    oracle-checkable: PMI rank order equals the rational
    ``c_xy·N / (c_x·c_y)`` order, and the emitted score is
    ``pmi_milli = (1000·c_xy·N) // (c_x·c_y)`` — Python big-int floor
    division here, HUGEINT ``//`` in SQL, bit-identical (all operands
    positive; magnitude ≤ 1000·N since c_xy ≤ min(c_x, c_y), int64-safe
    to 10^15 corpus tokens). No float log anywhere (libm ``log`` is not
    correctly-rounded, unlike sqrt — same reasoning as
    :func:`~parquetjs_ray.functions.groupops.group_corr`).

    Scale shapes: two combiner-before-shuffle scans of the projected
    text column (per-batch Arrow ``group_by`` partials keyed on the
    real word strings — count aggregation is exact, collision-free —
    then vocabulary-/pair-sized Sum shuffles); the unigram table is
    materialized ONCE (vocabulary-sized, reused by both attach joins
    and the total); unigram counts attach to the ``min_count``-filtered
    pair table via the hash-bucketed integer-keyed
    :func:`~parquetjs_ray.functions.joins.equi_join` on the words'
    64-bit content fingerprints (never broadcast — the pair/vocab
    tables grow with corpus diversity; fingerprint identity is the
    module's standard stance, collision odds ~vocab²/2⁶⁵ — see the
    gram-identity note in the module docstring); the final
    ``pmi_milli`` fold runs over the AGGREGATED pair table only (its
    Python-int loop touches vocabulary²-bounded rows, never the
    corpus), with a per-block top-k combiner ahead of the global
    k-row sort. Word split = single-space, matching DuckDB
    ``string_split``: consecutive spaces yield empty-string words on
    both sides.
    """
    import pyarrow.compute as pc

    from .joins import equi_join
    from .text import fingerprint64

    proj = docs.select_columns([text_col])

    def bigram_partials(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch[text_col].combine_chunks(), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        keep = np.ones(len(flat), dtype=bool)
        keep[np.cumsum(lens) - 1] = False  # a row's last word starts no pair
        idx = pa.array(np.flatnonzero(keep), pa.int64())
        t = pa.table(
            {
                "w1": flat.take(idx),
                "w2": flat.take(pc.add(idx, 1)),
            }
        )
        return t.group_by(["w1", "w2"]).aggregate([([], "count_all")])

    def unigram_partials(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(batch[text_col].combine_chunks(), " "))
        return pa.table({"word": flat}).group_by(["word"]).aggregate([([], "count_all")])

    def key_uni(t: pa.Table) -> pa.Table:
        return pa.table(
            {"h": pa.array(fingerprint64(t["word"]).view(np.int64)), "c": t["c"]}
        )

    uni = (
        proj.map_batches(unigram_partials, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("count_all", alias_name="c"))
        .materialize()  # vocabulary-sized; reused by both joins + the total
    )
    n_total = int(uni.sum("c"))
    uni_keyed = uni.map_batches(key_uni, batch_format="pyarrow")

    def key_pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["cnt"], min_count))
        return pa.table(
            {
                "w1": t["w1"],
                "w2": t["w2"],
                "cnt": t["cnt"],
                "h1": pa.array(fingerprint64(t["w1"]).view(np.int64)),
                "h2": pa.array(fingerprint64(t["w2"]).view(np.int64)),
            }
        )

    pairs = (
        proj.map_batches(bigram_partials, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("count_all", alias_name="cnt"))
        .map_batches(key_pairs, batch_format="pyarrow")
    )
    j1 = equi_join(
        pairs, uni_keyed, left_on="h1", right_on="h",
        left_cols=["w1", "w2", "cnt", "h2"], right_cols=["c"],
    ).map_batches(
        lambda t: t.rename_columns(
            ["c1" if n == "c" else n for n in t.column_names]
        ),
        batch_format="pyarrow",
    )
    j2 = equi_join(
        j1, uni_keyed, left_on="h2", right_on="h",
        left_cols=["w1", "w2", "cnt", "c1"], right_cols=["c"],
    ).map_batches(
        lambda t: t.rename_columns(
            ["c2" if n == "c" else n for n in t.column_names]
        ),
        batch_format="pyarrow",
    )

    def pmi_topk(batch: pa.Table) -> pa.Table:
        # aggregated pair rows only — never corpus rows
        cnt = batch["cnt"].to_pylist()
        c1 = batch["c1"].to_pylist()
        c2 = batch["c2"].to_pylist()
        pm = [(1000 * c * n_total) // (a * b) for c, a, b in zip(cnt, c1, c2)]
        t = pa.table(
            {
                "w1": batch["w1"],
                "w2": batch["w2"],
                "cnt": batch["cnt"],
                "pmi_milli": pa.array(pm, pa.int64()),
            }
        )
        s = t.sort_by(
            [("pmi_milli", "descending"), ("w1", "ascending"), ("w2", "ascending")]
        )
        return s.slice(0, k)  # per-block combiner: ≤ k rows reach the sort

    return (
        j2.map_batches(pmi_topk, batch_format="pyarrow")
        .sort(["pmi_milli", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )
