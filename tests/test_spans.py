"""Cross-document duplicated n-gram span detection (functions/spans.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from parquetjs_ray.functions import spans
from parquetjs_ray.functions.spans import shared_ngram_stats


def _result_map(ds):
    return {r["doc_id"]: (r["n_grams"], r["n_shared"]) for r in ds.take_all()}


def test_shared_ngram_stats_planted(ray_session):
    """Planted spans: A and B share one 8-word span; C is unique; D is
    too short for any gram; E duplicates A exactly."""
    span = "the quick brown fox jumps over the lazy"  # 8 words
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    f"alpha beta {span} gamma delta",  # 12 words -> 5 grams
                    f"one two three {span} four",  # 12 words -> 5 grams
                    "w1 w2 w3 w4 w5 w6 w7 w8 w9",  # 9 words -> 2 grams, unique
                    "too short for grams",  # 4 words -> none
                    f"alpha beta {span} gamma delta",  # exact dup of doc 1
                ]
            ),
        }
    )
    got = _result_map(shared_ngram_stats(rd.from_arrow(docs), n=8))
    # docs 1 and 5 are identical: every gram shared; doc 2 shares exactly
    # the one complete span-gram with 1/5; doc 3 unique; doc 4 absent
    assert got == {1: (5, 5), 2: (5, 1), 3: (2, 0), 5: (5, 5)}, got


def test_shared_ngram_stats_matches_sql(ray_session):
    """Hash-based distinct/shared counts equal DuckDB's string-gram
    replica on the real sf0.001 documents table — both paths."""
    import duckdb

    sf = "/root/testdata/sf0.001/documents.parquet"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}')")
    want = {
        int(r[0]): (int(r[1]), int(r[2]))
        for r in con.execute(
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
            "p AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w)-7, 0))) AS i FROM w), "
            "dg AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS g FROM p), "
            "gc AS (SELECT g, count(*) AS nd FROM dg GROUP BY g) "
            "SELECT dg.doc_id, count(*), sum(CASE WHEN gc.nd > 1 THEN 1 ELSE 0 END)::BIGINT "
            "FROM dg JOIN gc USING (g) GROUP BY dg.doc_id"
        ).fetchall()
    }
    ds = rd.read_parquet(sf)
    assert _result_map(shared_ngram_stats(ds, n=8)) == want

    # force the bucketed equi_join fallback (shared set "too big" to
    # broadcast) — identical output
    old = spans._BROADCAST_SHARED_BYTES
    spans._BROADCAST_SHARED_BYTES = 0
    try:
        assert _result_map(shared_ngram_stats(rd.read_parquet(sf), n=8)) == want
    finally:
        spans._BROADCAST_SHARED_BYTES = old


def test_remove_shared_spans_planted(ray_session):
    """Planted boilerplate: the shared 4-gram footer disappears from both
    carriers, unique text survives, short docs pass through untouched."""
    from parquetjs_ray.functions.spans import remove_shared_spans

    footer = "subscribe to our newsletter"  # 4 words
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    f"alpha beta gamma {footer}",
                    f"one two {footer} three four",
                    "w1 w2 w3 w4 w5",  # unique, no removal
                    "tiny doc",  # shorter than n, no grams
                    f"{footer}",  # the footer IS the whole doc
                ]
            ),
        }
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_shared_spans(rd.from_arrow(docs), n=4, min_docs=2).take_all()
    }
    assert got == {
        1: ("alpha beta gamma", 4),
        2: ("one two three four", 4),
        3: ("w1 w2 w3 w4 w5", 0),
        4: ("tiny doc", 0),
        5: ("", 4),
    }, got


def test_remove_shared_spans_overlapping_windows(ray_session):
    """Two docs share a 6-word run with n=4: the three overlapping shared
    windows cover the whole run once (no double-removal, union coverage)."""
    from parquetjs_ray.functions.spans import remove_shared_spans

    run = "a b c d e f"  # 6 words -> 4-grams at offsets 0,1,2
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([f"x {run} y", f"p q {run}"]),
        }
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_shared_spans(rd.from_arrow(docs), n=4, min_docs=2).take_all()
    }
    assert got == {1: ("x y", 6), 2: ("p q", 6)}, got


def test_remove_shared_spans_matches_sql(ray_session):
    """Cleaned text equals DuckDB's string-gram replica on the real
    sf0.001 documents table (the driver-oracle shape, n=6)."""
    import duckdb

    from parquetjs_ray.functions.spans import remove_shared_spans

    sf = "/root/testdata/sf0.001/documents.parquet"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}')")
    want = {
        r[0]: (r[1], int(r[2]))
        for r in con.execute(
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
            "p AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w)-5, 0))) AS i FROM w), "
            "gg AS (SELECT doc_id, i, array_to_string(w[i:i+5], ' ') AS g FROM p), "
            "gc AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd FROM gg GROUP BY g) WHERE nd >= 2), "
            "hits AS (SELECT gg.doc_id, gg.i FROM gg JOIN gc USING (g)), "
            "cov AS (SELECT DISTINCT doc_id, i + t.d AS pos FROM hits, range(6) t(d)), "
            "words AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS pos FROM w), "
            "kept AS (SELECT words.doc_id, words.pos, words.w[words.pos] AS word FROM words "
            "         LEFT JOIN cov ON cov.doc_id = words.doc_id AND cov.pos = words.pos "
            "         WHERE cov.pos IS NULL), "
            "agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS clean_text, "
            "        count(*) AS n_kept FROM kept GROUP BY doc_id), "
            "tot AS (SELECT doc_id, len(w) AS nw FROM w) "
            "SELECT tot.doc_id, coalesce(agg.clean_text, '') , "
            "(tot.nw - coalesce(agg.n_kept, 0))::BIGINT "
            "FROM tot LEFT JOIN agg USING (doc_id)"
        ).fetchall()
    }
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_shared_spans(rd.read_parquet(sf), n=6, min_docs=2).take_all()
    }
    assert got == want
    assert sum(v[1] for v in got.values()) > 0  # spans actually removed


def _ref_clean(texts: list[str], n: int, min_docs: int) -> list[tuple[str, int]]:
    """Pure-Python span-removal reference (per-doc loops, gram tuples)."""
    docs_words = [t.split(" ") for t in texts]
    grams: dict[tuple, set] = {}
    for d, ws in enumerate(docs_words):
        for i in range(len(ws) - n + 1):
            grams.setdefault(tuple(ws[i : i + n]), set()).add(d)
    out = []
    for d, ws in enumerate(docs_words):
        covered = [False] * len(ws)
        for i in range(len(ws) - n + 1):
            if len(grams[tuple(ws[i : i + n])]) >= min_docs:
                for j in range(i, i + n):
                    covered[j] = True
        out.append((" ".join(w for w, c in zip(ws, covered) if not c), sum(covered)))
    return out


def test_remove_shared_spans_property():
    """The vectorized batch kernel equals the per-doc-loop reference on
    randomized tiny-vocab corpora (incl. empty words from double spaces,
    self-repeats inside one doc, and full-coverage docs). No Ray needed —
    this pins the difference-array coverage + ListArray rebuild math."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    vocab = ["a", "b", "c", "ab", ""]

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.lists(st.sampled_from(vocab), min_size=1, max_size=12), min_size=1, max_size=8),
        st.integers(min_value=2, max_value=4),
        st.integers(min_value=2, max_value=3),
    )
    def check(word_lists, n, min_docs):
        texts = [" ".join(ws) for ws in word_lists]
        batch = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
        )
        pairs = spans._gram_doc_pairs(batch, "text", "doc_id", n)
        import collections

        cnt = collections.Counter(pairs["gram"].to_pylist())
        shared_sorted = np.sort(
            np.array([g for g, c in cnt.items() if c >= min_docs], np.int64)
        )
        got = spans._clean_batch(batch, "text", "doc_id", n, shared_sorted)
        want = _ref_clean(texts, n, min_docs)
        assert list(
            zip(got["clean_text"].to_pylist(), got["n_removed"].to_pylist())
        ) == want

    check()


def test_remove_shared_spans_broadcast_bound(ray_session):
    """A shared set beyond the broadcast bound raises (documented scale
    guard) instead of building a corpus-sized broadcast."""
    from parquetjs_ray.functions.spans import remove_shared_spans

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b c d e f", "a b c d e f"]),
        }
    )
    old = spans._BROADCAST_SHARED_BYTES
    spans._BROADCAST_SHARED_BYTES = 0
    try:
        with pytest.raises(ValueError, match="broadcast bound"):
            remove_shared_spans(rd.from_arrow(docs), n=4, min_docs=2).take_all()
    finally:
        spans._BROADCAST_SHARED_BYTES = old
