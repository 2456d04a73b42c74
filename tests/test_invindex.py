"""Inverted n-gram index build + exact phrase lookup (functions/invindex.py)."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from parquetjs_ray.functions.invindex import build_ngram_index, phrase_lookup

SF = "/root/testdata/sf0.001/documents.parquet"


def _phrase_from_doc(doc_id: int, lo: int, hi: int) -> str:
    t = pq.read_table(SF, filters=[("doc_id", "=", doc_id)])["text"][0].as_py()
    return " ".join(t.split(" ")[lo:hi])


def test_build_and_phrase_lookup_matches_sql(ray_session, tmp_path):
    idx = str(tmp_path / "ngram_idx")
    meta = build_ngram_index(rd.read_parquet(SF), idx, n=8, num_buckets=64)
    assert meta["total_pairs"] > 0 and os.path.exists(os.path.join(idx, "meta.json"))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}')")

    for doc_id in (5, 17, 123, 321):
        phrase = _phrase_from_doc(doc_id, 2, 12)  # 10 words ≥ n=8
        got, stats = phrase_lookup(idx, phrase, SF, columns=["doc_id"])
        want = [
            r[0]
            for r in con.execute(
                "SELECT doc_id FROM documents "
                "WHERE contains(' ' || text || ' ', ' ' || ? || ' ') ORDER BY doc_id",
                [phrase],
            ).fetchall()
        ]
        assert sorted(got["doc_id"].to_pylist()) == want, (doc_id, stats)
        assert doc_id in want  # the source doc always matches
        # pruning is real: only the grams' buckets are probed and only a
        # sliver of the postings is read
        assert stats["buckets_probed"] <= stats["phrase_grams"] < stats["buckets_total"]
        assert stats["postings_rows_read"] < stats["postings_total"] // 10, stats

    # absent phrase: no candidates, nothing verified
    got, stats = phrase_lookup(idx, "zz yy xx ww vv uu tt ss rr qq", SF)
    assert got.num_rows == 0 and stats["candidates"] == 0


def test_index_build_is_idempotent_and_atomic(ray_session, tmp_path):
    idx = str(tmp_path / "idx2")
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(20, dtype=np.int64)),
            "text": pa.array([f"w{i} " + "a b c d e f g h i j" for i in range(20)]),
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    m1 = build_ngram_index(rd.from_arrow(tbl), idx, n=8, num_buckets=16)
    files1 = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(idx) for f in fs if f.endswith(".parquet")
    )
    # rebuild over the same data: same deterministic fragment set
    m2 = build_ngram_index(rd.from_arrow(tbl), idx, n=8, num_buckets=16)
    files2 = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(idx) for f in fs if f.endswith(".parquet")
    )
    assert m1 == m2 and [os.path.basename(f) for f in files1] == [os.path.basename(f) for f in files2]
    assert not os.path.exists(idx + ".tmp")
    # every doc shares the common 10-word tail: the shared span is found
    got, stats = phrase_lookup(idx, "a b c d e f g h i j", src, columns=["doc_id"])
    assert sorted(got["doc_id"].to_pylist()) == list(range(20))
