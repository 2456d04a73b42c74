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
