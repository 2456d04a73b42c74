"""Inverted word-n-gram index over a document corpus + phrase lookup.

The text-side analogue of the IVF vector index (``functions/ann.py``):
a one-pass ``map_batches`` build partitions (gram-hash, doc-id) postings
into ``num_buckets`` hash buckets — one parquet directory per bucket, no
shuffle — and a phrase query reads ONLY the buckets its grams hash to,
so "find every document containing this sentence" costs a handful of
posting reads plus point-verifies instead of a corpus scan.

Exactness: a candidate must hold ALL of the phrase's word n-grams
(necessary for containing the phrase as a whole-word sequence), then a
point read of the candidate texts verifies whole-word containment — the
result equals SQL ``contains(' '||text||' ', ' '||phrase||' ')``
exactly; the index only decides how little gets read.

Retry/crash safety follows the writer contract (``stages/writer.py``,
``ann.build_ivf_index``): deterministic content-hash fragment names so
a task retry rewrites the same file, build in a ``.tmp`` sibling,
atomic publish with ``meta.json`` already inside.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from .spans import _gram_doc_pairs

__all__ = ["build_ngram_index", "phrase_lookup"]


def build_ngram_index(
    ds: rd.Dataset,
    index_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    num_buckets: int = 64,
) -> dict:
    """Build ``index_dir/bucket-<b>/part-*.parquet`` postings + meta.json."""
    assert num_buckets & (num_buckets - 1) == 0, "num_buckets must be a power of two"
    build_dir = os.path.normpath(index_dir) + ".tmp"
    shutil.rmtree(build_dir, ignore_errors=True)
    os.makedirs(build_dir, exist_ok=True)
    mask = np.uint64(num_buckets - 1)

    def write_buckets(batch: pa.Table) -> pa.Table:
        pairs = _gram_doc_pairs(batch, text_col, id_col, n)
        g = np.asarray(pairs["gram"]).view(np.uint64)
        b = (g & mask).astype(np.int64)
        rows = []
        for bi in np.unique(b):
            sel = np.flatnonzero(b == bi)
            sub = pairs.take(pa.array(sel, pa.int64()))
            bdir = os.path.join(build_dir, f"bucket-{int(bi)}")
            os.makedirs(bdir, exist_ok=True)
            frag = hashlib.sha1(
                f"{int(bi)}:".encode() + np.ascontiguousarray(g[sel]).tobytes()
            ).hexdigest()[:16]
            final = os.path.join(bdir, f"part-{frag}.parquet")
            if not os.path.exists(final):  # idempotent on task retry
                tmp = os.path.join(bdir, f".tmp-{frag}")
                pq.write_table(sub.sort_by("gram"), tmp)
                os.replace(tmp, final)
            rows.append({"bucket": int(bi), "rows": sub.num_rows, "frag": frag})
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("bucket", pa.int64()), ("rows", pa.int64()), ("frag", pa.string())]
            ),
        )

    stats = ds.map_batches(write_buckets, batch_format="pyarrow").take_all()
    bucket_rows: dict[int, int] = {}
    seen: set[tuple[int, str]] = set()
    for r in stats:
        if (r["bucket"], r["frag"]) in seen:  # retried task double-reported
            continue
        seen.add((r["bucket"], r["frag"]))
        bucket_rows[r["bucket"]] = bucket_rows.get(r["bucket"], 0) + r["rows"]
    meta = {
        "n": n,
        "num_buckets": num_buckets,
        "text_col": text_col,
        "id_col": id_col,
        "bucket_rows": {str(k): v for k, v in sorted(bucket_rows.items())},
        "total_pairs": int(sum(bucket_rows.values())),
    }
    with open(os.path.join(build_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(build_dir, index_dir)
    return meta


def _phrase_gram_hashes(phrase: str, n: int) -> np.ndarray:
    one = pa.table({"text": pa.array([phrase]), "id": pa.array([0], pa.int64())})
    pairs = _gram_doc_pairs(one, "text", "id", n)
    return np.unique(np.asarray(pairs["gram"]))


def phrase_lookup(
    index_dir: str,
    phrase: str,
    doc_paths: str | list[str],
    *,
    columns: list[str] | None = None,
) -> tuple[pa.Table, dict]:
    """Exact whole-word phrase search via the index → (matches, stats).

    Reads only the probed buckets' postings (parquet ``gram IN``
    row-group pushdown) and the candidate rows of the corpus (id-filtered
    point read) — ``stats`` reports both so callers can assert pruning.
    """
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    n, id_col, text_col = meta["n"], meta["id_col"], meta["text_col"]
    grams = _phrase_gram_hashes(phrase, n)
    if not len(grams):
        raise ValueError(f"phrase must have at least n={n} words")
    mask = np.uint64(meta["num_buckets"] - 1)
    buckets = np.unique(grams.view(np.uint64) & mask).astype(np.int64)

    @ray.remote(num_cpus=1)
    def read_bucket(bi: int, want: list[int]) -> pa.Table:
        bdir = os.path.join(index_dir, f"bucket-{bi}")
        if not os.path.isdir(bdir):
            return pa.table({"gram": pa.array([], pa.int64()), "doc": pa.array([], pa.int64())})
        return pq.read_table(bdir, filters=[("gram", "in", want)])

    per_bucket = {int(b): [int(x) for x in grams[(grams.view(np.uint64) & mask) == np.uint64(b)]] for b in buckets}
    posting_tables = ray.get([read_bucket.remote(b, w) for b, w in per_bucket.items()])
    postings = pa.concat_tables(posting_tables)
    rows_read = postings.num_rows

    # candidate = doc holding ALL phrase grams: intersect per-gram doc sets
    cands: np.ndarray | None = None
    pg = np.asarray(postings["gram"])
    pd_ = np.asarray(postings["doc"])
    for gh in grams:
        docs = np.unique(pd_[pg == gh])
        cands = docs if cands is None else np.intersect1d(cands, docs, assume_unique=True)
        if not len(cands):
            break
    cands = cands if cands is not None else np.empty(0, np.int64)

    out_cols = columns or [id_col]
    needle = f" {phrase} "

    @ray.remote(num_cpus=1)
    def verify(cand_ids: np.ndarray) -> pa.Table:
        import pyarrow.compute as pc

        t = pq.read_table(
            doc_paths,
            columns=sorted(set(out_cols) | {id_col, text_col}),
            filters=[(id_col, "in", cand_ids.tolist())],
        )
        padded = pc.binary_join_element_wise(" ", t[text_col], " ", "")
        hit = pc.match_substring(padded, needle)
        return t.filter(hit).select(out_cols)

    matches = (
        ray.get(verify.remote(cands))
        if len(cands)
        else pa.table({c: pa.array([], pa.int64() if c == id_col else pa.string()) for c in out_cols})
    )
    stats = {
        "phrase_grams": int(len(grams)),
        "buckets_probed": int(len(buckets)),
        "buckets_total": meta["num_buckets"],
        "postings_rows_read": int(rows_read),
        "postings_total": meta["total_pairs"],
        "candidates": int(len(cands)),
        "matches": matches.num_rows,
    }
    return matches, stats
