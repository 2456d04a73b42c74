"""Manifest-only aggregate pushdown (table_aggregates) vs direct compute."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from parquetjs_ray.pipelines.encode import (
    delete_rows,
    encode_dataset,
    table_aggregates,
)
from parquetjs_ray.sources.synth import write_synth


def _expected(tbl: pa.Table, col: str) -> dict:
    arr = tbl[col]
    return {
        "n": len(arr),
        "nulls": arr.null_count,
        "sum": int(pc.sum(arr).as_py() or 0),
        "min": pc.min(arr).as_py(),
        "max": pc.max(arr).as_py(),
    }


def test_table_aggregates_matches_direct_compute(ray_session, tmp_path):
    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 3_000, n_shards=3)
    encode_dataset(
        paths, outdir, mode="files", target_rows_per_partition=500,
        sample_rows=3_000, unit_rows=250,
    )
    tbl = pa.concat_tables([pq.read_table(p) for p in paths])
    aggs = table_aggregates(outdir)

    e = _expected(tbl, "n_tok")
    got = aggs["n_tok"]
    assert (got["n"], got["nulls"], got["sum"], got["min"], got["max"]) == (
        e["n"], e["nulls"], e["sum"], e["min"], e["max"]
    )

    # list<int32> tokens: flattened count + exact sum (total corpus tokens)
    flat = pc.list_flatten(tbl["tokens"])
    assert aggs["tokens"]["flat_n"] == len(flat)
    assert aggs["tokens"]["flat_sum"] == int(pc.sum(flat).as_py())
    # zones over flat token values feed min/max
    assert aggs["tokens"]["min"] == pc.min(flat).as_py()
    assert aggs["tokens"]["max"] == pc.max(flat).as_py()

    # string column: count/null bookkeeping only, no sum
    assert aggs["source"]["n"] == len(tbl)
    assert aggs["source"]["sum"] is None
    assert aggs["source"]["min"] is None

    # the point of pushdown: no chunk data was opened (manifests only) —
    # sanity-proxied by the call working after chunk files are renamed away
    for f in glob.glob(os.path.join(outdir, "part-*", "frag-*.bin")):
        os.rename(f, f + ".hidden")
    try:
        again = table_aggregates(outdir, columns=["n_tok"])
        assert again["n_tok"]["sum"] == e["sum"]
        assert "tokens" not in again  # columns= filter applied
    finally:
        for f in glob.glob(os.path.join(outdir, "part-*", "frag-*.bin.hidden")):
            os.rename(f, f[: -len(".hidden")])


def test_table_aggregates_reflects_deletes(ray_session, tmp_path):
    from tests.test_e2e_pipeline import _events_fixture

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = _events_fixture(indir, rows=2_000, n_shards=2)
    encode_dataset(
        paths, outdir, mode="files", target_rows_per_partition=500,
        sample_rows=2_000, id_col="event_id", source_col=None, unit_rows=200,
    )
    delete_rows(outdir, [("event_id", ">=", 500), ("event_id", "<", 800)])
    tbl = pa.concat_tables([pq.read_table(p) for p in paths])
    keep = tbl.filter(
        pc.invert(pc.and_(pc.greater_equal(tbl["event_id"], 500), pc.less(tbl["event_id"], 800)))
    )
    aggs = table_aggregates(outdir)
    assert aggs["event_id"]["n"] == keep.num_rows == 1_700
    assert aggs["event_id"]["sum"] == int(pc.sum(keep["event_id"]).as_py())
    # min/max zones are fragment-level: still exact bounds after a
    # fragment-aligned check via recompute
    assert aggs["event_id"]["min"] == pc.min(keep["event_id"]).as_py()
    assert aggs["event_id"]["max"] == pc.max(keep["event_id"]).as_py()


def test_int_sum_skipped_when_overflow_possible(ray_session, tmp_path):
    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(indir)
    big = pa.table(
        {
            "doc_id": pa.array(np.arange(100, dtype=np.int64)),
            "huge": pa.array(np.full(100, (1 << 62) + 7, np.uint64), pa.uint64()),
        }
    )
    p = os.path.join(indir, "big.parquet")
    pq.write_table(big, p)
    encode_dataset([p], outdir, mode="files", target_rows_per_partition=100,
                   sample_rows=100, id_col="doc_id", source_col=None)
    aggs = table_aggregates(outdir)
    assert aggs["huge"]["sum"] is None  # bound check refused, not wrong
    assert aggs["huge"]["n"] == 100
    assert aggs["doc_id"]["sum"] == sum(range(100))
