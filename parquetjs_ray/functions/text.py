"""Text-analysis operators for training-data pipelines (vectorized).

All operators are ``map_batches``-shaped: ``pa.Table`` in → ``pa.Table``
out, no per-row Python in hot paths. Deterministic by construction so
their outputs can be oracle-checked (integer counts / fixed hashes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrow_util import string_buffers

__all__ = [
    "token_count",
    "regex_token_count",
    "BPE_TOKEN_PATTERN",
    "fingerprint64",
    "fingerprint_batch",
    "quality_batch",
    "langid_batch",
    "collapse_repeats_batch",
    "chunk_windows_batch",
    "normalize_batch",
    "repetition_signals_batch",
    "extract_json_int",
    "ttr_batch",
]

_U = np.uint64


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> _U(30))) * _U(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U(27))) * _U(0x94D049BB133111EB)
    return x ^ (x >> _U(31))


def token_count(batch: pa.Table, column: str = "text") -> pa.Table:
    """Whitespace token count (space-split, matches the SQL definition
    ``length(text) - length(replace(text,' ','')) + 1``)."""
    spaces = pc.count_substring(batch[column], " ")
    return batch.append_column("n_ws_tokens", pc.add(spaces, 1).cast(pa.int64()))


# BPE-ish pre-tokenizer classes: letter runs, digit runs, single
# punctuation marks — the GPT-2-family split shape without lookarounds,
# so the SAME RE2 pattern runs in Arrow and in DuckDB's regexp functions
# (both are RE2) and the counts are oracle-exact.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def regex_token_count(batch: pa.Table, column: str = "text", pattern: str = BPE_TOKEN_PATTERN) -> pa.Table:
    """Regex token count (compiled once inside Arrow's RE2 kernel,
    vectorized over the whole column)."""
    n = pc.count_substring_regex(batch[column], pattern)
    return batch.append_column("n_bpe_tokens", n.cast(pa.int64()))


def fingerprint64(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Order-sensitive 64-bit content fingerprint per string (vectorized
    polynomial-style hash: every byte weighted by its position)."""
    data, offsets = string_buffers(arr)
    lens = np.diff(offsets)
    n = len(lens)
    out = np.zeros(n, dtype=np.uint64)
    if len(data):
        inrow = np.arange(len(data), dtype=np.int64) - np.repeat(offsets[:-1], lens)
        mixed = _mix64(data.astype(np.uint64) + _U(0x9E3779B97F4A7C15) * (inrow.astype(np.uint64) + _U(1)))
        nonempty = lens > 0
        if nonempty.any():
            out[nonempty] = np.add.reduceat(mixed, offsets[:-1][nonempty])
    return _mix64(out ^ lens.astype(np.uint64))


def fingerprint_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    fp = fingerprint64(batch[column])
    # int64 view: Ray groupby/unique handle int64; bit pattern is what matters
    return batch.append_column("fingerprint", pa.array(fp.view(np.int64)))


def quality_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Heuristic quality signals: char counts, word stats, ratios ×1000
    (integers, so outputs are exactly reproducible)."""
    text = batch[column]
    n_chars = pc.utf8_length(text).cast(pa.int64())
    spaces = pc.count_substring(text, " ").cast(pa.int64())
    n_words = pc.add(spaces, 1)
    # mean word length ×1000 (integer arithmetic)
    non_space = pc.subtract(n_chars, spaces)
    mean_word_len_x1000 = pc.divide(pc.multiply(non_space, 1000), pc.max_element_wise(n_words, 1))
    digits = pc.count_substring_regex(text, r"[0-9]").cast(pa.int64())
    digit_ratio_x1000 = pc.divide(pc.multiply(digits, 1000), pc.max_element_wise(n_chars, 1))
    out = batch.append_column("n_words", n_words)
    out = out.append_column("mean_word_len_x1000", mean_word_len_x1000)
    out = out.append_column("digit_ratio_x1000", digit_ratio_x1000)
    return out


def collapse_repeats_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Repetition removal: collapse runs of consecutive identical
    whitespace tokens to one occurrence (the classic LLM-corpus
    degeneration cleanup — "a a a the" → "a the").

    Vectorized end to end: one ``split_pattern``, one shifted string
    equality over the flat token array, one ``reduceat`` to rebuild list
    lengths, one ``binary_join``. Appends ``text_norepeat`` and
    ``n_removed`` (exact integer, SQL-replicable)."""
    arr = batch[column]
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    toks = pc.split_pattern(arr, " ")
    vals = toks.values
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    nflat = len(vals)
    keep = np.ones(nflat, dtype=bool)
    if nflat > 1:
        dup = pc.equal(vals.slice(1), vals.slice(0, nflat - 1)).to_numpy(zero_copy_only=False)
        keep[1:] = ~dup
        keep[off[:-1]] = True  # a row's first token is never a repeat of the previous row's last
    new_vals = vals.filter(pa.array(keep))
    # every row has >=1 token (split of "" yields [""]), so offsets strictly
    # increase and reduceat segments are well-formed
    kept_per_row = np.add.reduceat(keep.astype(np.int64), off[:-1]) if nflat else np.zeros(0, np.int64)
    new_off = np.concatenate([[0], np.cumsum(kept_per_row)]).astype(np.int32)
    new_list = pa.ListArray.from_arrays(pa.array(new_off, pa.int32()), new_vals)
    joined = pc.binary_join(new_list, pa.scalar(" "))
    removed = pa.array((np.diff(off) - kept_per_row).astype(np.int64))
    return batch.append_column("text_norepeat", joined).append_column("n_removed", removed)


def chunk_windows_batch(
    batch: pa.Table,
    column: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
) -> pa.Table:
    """Context-window chunking: split each document's whitespace-token
    stream into overlapping windows of ``size`` tokens starting every
    ``stride`` tokens — the standard LLM pre-training "context chunks
    with overlap" step. One output row per chunk: ``(id, chunk_idx,
    chunk_len, first_tok, last_tok)``; first/last token content pins the
    chunk boundaries, not just the arithmetic.

    A doc with n ≤ size tokens yields one chunk; otherwise
    ``1 + ceil((n - size) / stride)`` chunks, the last possibly short.
    Fully vectorized (one split, offsets math, two flat takes); embar-
    rassingly parallel per batch — no shuffle at any corpus size."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    arr = batch[column]
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    toks = pc.split_pattern(arr, " ")
    vals = toks.values
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n = np.diff(off)  # ≥1: split of "" is [""]
    n_chunks = np.where(n <= size, 1, 1 + (n - size + stride - 1) // stride)
    row_starts = np.concatenate([[0], np.cumsum(n_chunks)])
    total = int(row_starts[-1])
    row_of_chunk = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
    chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(row_starts[:-1], n_chunks)
    start = chunk_idx * stride
    clen = np.minimum(size, n[row_of_chunk] - start)
    first_flat = off[:-1][row_of_chunk] + start
    last_flat = first_flat + clen - 1
    ids = batch[id_col]
    ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    return pa.table(
        {
            id_col: ids.take(pa.array(row_of_chunk)),
            "chunk_idx": pa.array(chunk_idx),
            "chunk_len": pa.array(clen.astype(np.int64)),
            "first_tok": vals.take(pa.array(first_flat)),
            "last_tok": vals.take(pa.array(last_flat)),
        }
    )


_STOPWORDS = {
    "en": ("the", "and", "of", "a", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "dans", "que"),
    "es": ("el", "la", "de", "que", "los", "una", "es", "por", "con", "para"),
    "it": ("il", "la", "di", "che", "per", "una", "con", "del", "non", "sono"),
}


def langid_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """n-gram/stopword language-ID heuristic (vectorized per language:
    one count_substring pass per stopword, ~50 kernels per batch).

    Ties break alphabetically; unknown when no stopword hits."""
    text = batch[column]
    n = batch.num_rows
    scores = np.zeros((len(_STOPWORDS), n), dtype=np.int64)
    langs = sorted(_STOPWORDS)
    padded = pc.binary_join_element_wise(pa.scalar(" "), text, pa.scalar(" "), "")
    for li, lang in enumerate(langs):
        for w in _STOPWORDS[lang]:
            scores[li] += pc.count_substring(padded, f" {w} ").cast(pa.int64()).to_numpy(zero_copy_only=False)
    best = np.argmax(scores, axis=0)  # first (alphabetical) wins ties
    hit = scores.max(axis=0) > 0
    pred = np.where(hit, np.array(langs, dtype=object)[best], "und")
    return batch.append_column("lang_pred", pa.array(pred.tolist(), type=pa.string()))


def normalize_batch(
    batch: pa.Table, column: str = "text", out_col: str = "norm_text",
    unicode_form: str | None = None,
) -> pa.Table:
    """Canonical text-cleanup pass (the pre-dedup normalization step of
    a web-corpus pipeline): whitespace runs collapsed to single spaces
    → edge-space trim → case fold. Three Arrow kernels over the
    column's utf8 buffers, zero Python per row; every step has an exact
    DuckDB replica (regexp_replace — both engines run RE2 — / trim /
    lower), so the op is oracle-checkable byte-for-byte. Appends
    ``out_col`` and its codepoint length ``n_chars_norm``.

    ``unicode_form`` optionally prepends ``pc.utf8_normalize``; NOT in
    the default pipeline (and excluded from the SQL contract) because
    pyarrow 16's kernel only DECOMPOSES — every form, including "NFC",
    returns NFD-shaped output (utf8proc's compose pass isn't wired up),
    so it cannot match DuckDB's composing nfc_normalize."""
    s = batch[column]
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    if unicode_form is not None:
        s = pc.utf8_normalize(s, form=unicode_form)
    s = pc.replace_substring_regex(s, r"\s+", " ")
    s = pc.utf8_trim(s, " ")
    s = pc.utf8_lower(s)
    return batch.append_column(out_col, s).append_column(
        "n_chars_norm", pc.utf8_length(s).cast(pa.int64())
    )


def repetition_signals_batch(batch: pa.Table, column: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1:
    "fraction of characters in the most common n-gram" family), the
    filters that catch template spam and degenerate generations:

    * ``top_word_frac_x1000``   — most frequent word's share of all words;
    * ``dup_word_frac_x1000``   — share of word occurrences that repeat an
      earlier word (1 − distinct/total);
    * ``top_bigram_frac_x1000`` — most frequent word bigram's share of all
      bigram occurrences (0 for docs with <2 words).

    All ×1000 floor-divided integers → bit-reproducible and SQL-exact.
    Fully vectorized: one split, one lexsort per gram order, run-length
    folds with ``np.maximum.at``/``bincount`` — no Python per row. Word
    identity is the engine's 64-bit content fingerprint (collision odds
    ~n²/2⁶⁵, same contract as the dedup/spans family)."""
    text = batch[column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offs = np.asarray(toks.offsets).astype(np.int64)
    lens = np.diff(offs)
    n_docs = len(lens)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    wh = fingerprint64(toks.values) if len(toks.values) else np.empty(0, np.uint64)

    def _top_and_runs(d: np.ndarray, g: np.ndarray):
        """(max run length per doc, run count per doc) over (doc, gram)."""
        top = np.zeros(n_docs, np.int64)
        nruns = np.zeros(n_docs, np.int64)
        if not len(d):
            return top, nruns
        order = np.lexsort((g, d))
        ds_, gs_ = d[order], g[order]
        new = np.ones(len(ds_), bool)
        new[1:] = (ds_[1:] != ds_[:-1]) | (gs_[1:] != gs_[:-1])
        starts = np.flatnonzero(new)
        runlen = np.diff(np.concatenate((starts, [len(ds_)])))
        rdoc = ds_[starts]
        np.maximum.at(top, rdoc, runlen)
        nruns += np.bincount(rdoc, minlength=n_docs)
        return top, nruns

    topw, n_distinct = _top_and_runs(doc_of, wh)
    n_words = np.maximum(lens, 1)

    same_doc = doc_of[:-1] == doc_of[1:] if len(doc_of) > 1 else np.empty(0, bool)
    bh = _mix64((wh[:-1] * _U(0x9E3779B97F4A7C15)) ^ wh[1:]) if len(wh) > 1 else np.empty(0, np.uint64)
    bdoc = doc_of[:-1][same_doc]
    topb, _ = _top_and_runs(bdoc, bh[same_doc])
    n_bigrams = np.maximum(lens - 1, 1)

    out = batch.select([id_col])
    out = out.append_column("n_words", pa.array(lens.astype(np.int64)))
    out = out.append_column("top_word_frac_x1000", pa.array(topw * 1000 // n_words))
    out = out.append_column(
        "dup_word_frac_x1000", pa.array((lens - n_distinct) * 1000 // n_words)
    )
    out = out.append_column("top_bigram_frac_x1000", pa.array(topb * 1000 // n_bigrams))
    return out


def extract_json_int(
    ds,
    *,
    col: str = "props",
    field: str = "k",
    id_col: str = "event_id",
    out_col: str | None = None,
):
    """Vectorized extraction of a flat integer JSON field from a string
    column → ``(id_col, out_col)`` with NULL where the field is absent.

    The hot path is one RE2 kernel per batch (``pc.extract_regex`` with
    a named group — no Python per row, no JSON parse): exactly the
    narrow shape of event-props columns (``{"k": 69}``). Nested or
    quoted-string payloads need a real parser and are out of scope —
    the pattern anchors on ``"field": <digits>`` only, matching SQL
    ``regexp_extract`` semantics so the oracle reproduces it verbatim.
    """
    import re as _re

    import pyarrow.compute as _pc

    out = out_col or field
    pat = rf'"{_re.escape(field)}"\s*:\s*(?P<v>-?\d+)'

    def fn(batch: pa.Table) -> pa.Table:
        hit = _pc.extract_regex(batch[col], pattern=pat)
        vals = _pc.struct_field(hit, "v").cast(pa.int64())
        return pa.table({id_col: batch[id_col], out: vals})

    return ds.select_columns([id_col, col]).map_batches(fn, batch_format="pyarrow")


def ttr_batch(batch: pa.Table, column: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Type-token ratio per document — the classic lexical-diversity
    quality signal (distinct space-delimited words / total words) →
    ``(id_col, n_words, n_distinct_words, ttr)``.

    Zero shuffle (pure per-batch map) and EXACT: words are
    ``pc.dictionary_encode``d to integer ids (real string equality, not
    hashes — collision-free), per-row distincts counted by one lexsort +
    run-boundary diff over (row, word_id) pairs. Both counts are exact
    int64 ≤ 2^53, so ``ttr`` is ONE float division of two exactly-
    representable integers and hash-matches SQL
    ``CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) /
    CAST(len(string_split(text,' ')) AS DOUBLE)`` bit-for-bit
    (split semantics match DuckDB ``string_split``: an empty text is one
    empty word, never zero)."""
    toks = pc.split_pattern(batch[column].combine_chunks(), " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    row_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    order = np.lexsort((codes, row_idx))
    r, c = row_idx[order], codes[order]
    new = np.ones(len(r), dtype=bool)
    if len(r):
        new[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
    distinct = np.bincount(r[new], minlength=len(lens)).astype(np.int64)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_words": pa.array(lens),
            "n_distinct_words": pa.array(distinct),
            "ttr": pa.array(distinct.astype(np.float64) / lens.astype(np.float64)),
        }
    )
