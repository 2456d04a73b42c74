"""End-to-end pipeline tests (Ray session shared via conftest fixture).

Mirrors the reference's write-then-read integration strategy
(`/root/reference/test/integration.js:99-231`): encode the fixture,
decode it back, assert exact per-row equality joined on doc_id, plus
resume and skew behavior."""

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from parquetjs_ray.sources.synth import write_synth


@pytest.fixture(scope="module")
def encoded(ray_session, tmp_path_factory):
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import encode_dataset

    base = tmp_path_factory.mktemp("e2e")
    indir, outdir = str(base / "in"), str(base / "out")
    paths = write_synth(indir, 5_000, n_shards=3)
    report = encode_dataset(
        paths, outdir, mode="grouped", target_rows_per_partition=1_000, sample_rows=5_000
    )
    return paths, outdir, report


def test_report_totals(encoded):
    paths, outdir, report = encoded
    assert report["rows"] == 5_000
    assert 0 < report["ratio"] < 1.0  # beats raw (== beats parquetjs PLAIN)
    assert report["n_partitions"] > 1


def test_exact_roundtrip_joined_on_doc_id(encoded):
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset

    paths, outdir, _ = encoded
    orig = rd.read_parquet(paths).take_all()
    back = decode_dataset(outdir).take_all()
    by_id = {r["doc_id"]: r for r in back}
    assert len(by_id) == len(orig)
    for r in orig:
        d = by_id[r["doc_id"]]
        assert d["tokens"] == r["tokens"]  # bit-identical token arrays
        assert d["n_tok"] == r["n_tok"]
        assert d["source"] == r["source"]


def test_fingerprint_verify(encoded):
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset
    from parquetjs_ray.pipelines.verify import verify_roundtrip

    paths, outdir, _ = encoded
    v = verify_roundtrip(rd.read_parquet(paths), decode_dataset(outdir))
    assert v["equal"]


def test_resume_skips_done_partitions(encoded):
    from parquetjs_ray.pipelines.encode import encode_dataset

    paths, outdir, report = encoded
    report2 = encode_dataset(
        paths, outdir, mode="grouped", target_rows_per_partition=1_000, sample_rows=5_000
    )
    assert report2["resumed_partitions"] == report2["n_partitions"] == report["n_partitions"]


def test_resume_completes_partial_run(encoded, tmp_path):
    """Delete some partitions → rerun → identical partition set & totals."""
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquetjs_ray.pipelines.verify import verify_roundtrip
    from parquetjs_ray.stages.writer import read_global_manifest

    paths, outdir, report = encoded
    outdir2 = str(tmp_path / "partial")
    shutil.copytree(outdir, outdir2)
    parts = sorted(glob.glob(os.path.join(outdir2, "part-*")))
    for p in parts[::2]:
        shutil.rmtree(p)
    report2 = encode_dataset(
        paths, outdir2, mode="grouped", target_rows_per_partition=1_000, sample_rows=5_000
    )
    assert report2["n_partitions"] == report["n_partitions"]
    assert report2["resumed_partitions"] == len(parts) - len(parts[::2])
    m1 = read_global_manifest(outdir)
    m2 = read_global_manifest(outdir2)
    assert [p["partition"] for p in m1["partitions"]] == [p["partition"] for p in m2["partitions"]]
    assert m1["totals"] == m2["totals"]
    v = verify_roundtrip(rd.read_parquet(paths), decode_dataset(outdir2))
    assert v["equal"]


def test_skew_bounded_partitions(ray_session, tmp_path):
    """Zipf s=2.0 (one source ≈ 70% of rows): salting must bound partitions."""
    from parquetjs_ray.pipelines.encode import encode_dataset
    from parquetjs_ray.stages.writer import read_global_manifest

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 8_000, n_shards=2, zipf_s=2.0)
    encode_dataset(paths, outdir, mode="grouped", target_rows_per_partition=1_000, sample_rows=8_000)
    parts = read_global_manifest(outdir)["partitions"]
    sizes = [p["rows"] for p in parts]
    # the hot source is split: no partition grossly exceeds the target
    assert max(sizes) < 3_000, sizes


def test_sharded_mode_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquetjs_ray.pipelines.verify import verify_roundtrip

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 3_000, n_shards=2)
    report = encode_dataset(
        paths, outdir, mode="sharded", target_rows_per_partition=1_000, sample_rows=3_000,
        concurrency=2,
    )
    assert report["rows"] == 3_000
    v = verify_roundtrip(rd.read_parquet(paths), decode_dataset(outdir))
    assert v["equal"]


def test_files_mode_roundtrip_and_fragment_resume(ray_session, tmp_path):
    import glob as globmod

    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquetjs_ray.pipelines.verify import verify_roundtrip

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 4_000, n_shards=4)
    rep = encode_dataset(paths, outdir, mode="files", target_rows_per_partition=1_000, sample_rows=4_000)
    assert rep["rows"] == 4_000 and rep["n_fragments"] > rep["n_partitions"]
    v = verify_roundtrip(rd.read_parquet(paths), decode_dataset(outdir))
    assert v["equal"]
    # fragment-level resume: drop a third of the fragments, rerun
    frags = sorted(globmod.glob(outdir + "/part-*/frag-*.json"))
    for f in frags[::3]:
        os.remove(f)
    rep2 = encode_dataset(paths, outdir, mode="files", target_rows_per_partition=1_000, sample_rows=4_000)
    assert rep2["n_fragments"] == rep["n_fragments"]
    assert rep2["resumed_fragments"] == rep["n_fragments"] - len(frags[::3])
    v2 = verify_roundtrip(rd.read_parquet(paths), decode_dataset(outdir))
    assert v2["equal"]


def test_fruits_nested_pipeline_roundtrip(ray_session, tmp_path):
    """Full nested/nullable schema (reference integration fixture F3)
    through the Ray pipeline: encode → decode → exact equality."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquetjs_ray.sources.synth import fruits_table

    tbl = fruits_table(repeats=100)  # 400 rows, nested structs/lists/nulls
    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(indir)
    paths = [os.path.join(indir, f"f{i}.parquet") for i in range(2)]
    pq.write_table(tbl.slice(0, 200), paths[0])
    pq.write_table(tbl.slice(200), paths[1])
    rep = encode_dataset(
        paths, outdir, mode="files", target_rows_per_partition=100, sample_rows=400,
        id_col="name", source_col=None,
    )
    assert rep["rows"] == 400
    back = pa.Table.from_pylist(decode_dataset(outdir).take_all())
    orig_by_name = {r["name"]: r for r in tbl.to_pylist()}
    got_by_name = {r["name"]: r for r in back.to_pylist()}
    assert got_by_name == orig_by_name


def test_size_beats_reference_plain_baseline(ray_session, tmp_path):
    """North-rule criterion: our encoded bytes ≤ the reference's analytic
    output size (PLAIN/UNCOMPRESSED defaults, BASELINE.md)."""
    import pyarrow.parquet as pq

    from parquetjs_ray.oracle.size_model import reference_table_size
    from parquetjs_ray.pipelines.encode import encode_dataset
    from parquetjs_ray.sources.synth import generate_shard
    from parquetjs_ray.stages.writer import read_global_manifest

    tbl = generate_shard(0, 6_000)
    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(indir)
    path = os.path.join(indir, "t.parquet")
    pq.write_table(tbl, path)
    encode_dataset([path], outdir, mode="files", target_rows_per_partition=2_000, sample_rows=6_000)
    ours = read_global_manifest(outdir)["totals"]["enc_bytes"]
    # add our manifest overhead for an honest comparison
    import glob as globmod

    manifest_bytes = sum(
        os.path.getsize(p)
        for p in globmod.glob(os.path.join(outdir, "**", "*.json"), recursive=True)
    )
    reference = reference_table_size(tbl)["total"]
    assert ours + manifest_bytes < reference, (ours, manifest_bytes, reference)
    # we should beat PLAIN by a wide margin on this fixture
    assert ours < 0.55 * reference


def test_compression_metadata_projection(ray_session, tmp_path):
    """zstd chunk compression + user metadata + decode column projection."""
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquetjs_ray.pipelines.verify import verify_roundtrip
    from parquetjs_ray.stages.writer import read_global_manifest

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 2_000, n_shards=2)
    encode_dataset(
        paths, outdir, mode="files", target_rows_per_partition=500, sample_rows=2_000,
        compression="zstd", user_metadata={"corpus": "fixture-v1", "owner": "tests"},
    )
    gm = read_global_manifest(outdir)
    assert gm["user_metadata"]["corpus"] == "fixture-v1"
    # totals report bytes actually STORED (post-zstd), strictly below the
    # lightweight-codec-only size of an uncompressed encode
    plain_dir = str(tmp_path / "plain")
    encode_dataset(paths, plain_dir, mode="files", target_rows_per_partition=500, sample_rows=2_000)
    gm_plain = read_global_manifest(plain_dir)
    assert gm["totals"]["enc_bytes"] < gm_plain["totals"]["enc_bytes"]
    v = verify_roundtrip(rd.read_parquet(paths), decode_dataset(outdir))
    assert v["equal"]
    # projection pushdown: only two columns decoded
    proj = decode_dataset(outdir, columns=["doc_id", "n_tok"]).take(5)
    assert sorted(proj[0].keys()) == ["doc_id", "n_tok"]


def test_pruned_decode_and_compaction(ray_session, tmp_path):
    """id-range fragment pruning + compaction (fragments → single chunk)."""
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import compact_dataset, decode_dataset, encode_dataset
    from parquetjs_ray.pipelines.verify import verify_roundtrip
    from parquetjs_ray.stages.writer import read_global_manifest

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 4_000, n_shards=4)
    encode_dataset(paths, outdir, mode="files", target_rows_per_partition=1_000, sample_rows=4_000)

    # pruning: ids are "srcXX/doc...", restrict to a prefix range
    pruned = decode_dataset(outdir, id_range=("src00", "src05~")).take_all()
    full = decode_dataset(outdir).take_all()
    want = [r for r in full if "src00" <= r["doc_id"] <= "src05~"]
    assert {r["doc_id"] for r in pruned} >= {r["doc_id"] for r in want}
    assert len(pruned) < len(full)  # actually pruned something

    # sources pruning
    only_cc = decode_dataset(outdir, sources=["cc"]).take_all()
    assert only_cc and all(r["source"] == "cc" for r in only_cc)

    # compaction: all multi-fragment partitions collapse to one chunk
    gm_before = read_global_manifest(outdir)
    rep = compact_dataset(outdir)
    assert rep["n_compacted"] > 0
    gm_after = read_global_manifest(outdir)
    assert gm_after["totals"]["rows"] == gm_before["totals"]["rows"]
    v = verify_roundtrip(rd.read_parquet(paths), decode_dataset(outdir))
    assert v["equal"]

    # a rerun of encode sees absorbed fragments as done (no duplicates)
    rep2 = encode_dataset(paths, outdir, mode="files", target_rows_per_partition=1_000, sample_rows=4_000)
    v2 = verify_roundtrip(rd.read_parquet(paths), decode_dataset(outdir))
    assert v2["equal"]


def test_iter_token_batches_and_checksum(ray_session, tmp_path):
    import numpy as np

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset, iter_token_batches

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 1_000, n_shards=2)
    encode_dataset(paths, outdir, mode="files", target_rows_per_partition=500, sample_rows=1_000)
    total = 0
    for doc_ids, arrays in iter_token_batches(outdir, batch_size_rows=256):
        assert len(doc_ids) == len(arrays)
        assert all(isinstance(a, np.ndarray) for a in arrays)
        total += len(doc_ids)
    assert total == 1_000

    # checksum: corrupt one fragment byte → decode raises
    import glob as globmod

    frag = sorted(globmod.glob(outdir + "/part-*/frag-*.bin"))[0]
    data = bytearray(open(frag, "rb").read())
    data[len(data) // 2] ^= 0xFF
    open(frag, "wb").write(bytes(data))
    import pytest as _pytest

    with _pytest.raises(Exception):
        decode_dataset(outdir).take_all()


def test_resume_reuses_salt_map_despite_changed_target(ray_session, tmp_path):
    """A resumed run with a different target must keep the original
    partition keys (persisted salt map), not fork a second key space."""
    import glob as globmod

    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquetjs_ray.pipelines.verify import verify_roundtrip

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 3_000, n_shards=2)
    rep = encode_dataset(paths, outdir, mode="files", target_rows_per_partition=500, sample_rows=3_000)
    frags = sorted(globmod.glob(outdir + "/part-*/frag-*.json"))
    for f in frags[::2]:
        os.remove(f)
    # resumed run asks for a very different target — must not matter
    rep2 = encode_dataset(paths, outdir, mode="files", target_rows_per_partition=50_000, sample_rows=3_000)
    assert rep2["n_fragments"] == rep["n_fragments"]
    v = verify_roundtrip(rd.read_parquet(paths), decode_dataset(outdir))
    assert v["equal"]


def test_row_hashes_batch_composition_independent():
    """A row's hash must not depend on whether its batch-mates have nulls
    (regression: nested columns switched hashing strategy per batch)."""
    import numpy as np
    import pyarrow as pa

    from parquetjs_ray.pipelines.verify import row_hashes

    tbl = pa.table(
        {
            "l": pa.array([[1, 2], None, [3], [4, 5], [6], None], pa.list_(pa.int64())),
            "s": pa.array(["a", "b", None, "d", "e", "f"]),
            "x": pa.array([1.5, 2.5, 3.5, None, 5.5, 6.5], pa.float64()),
        }
    )

    def multiset(splits):
        h = np.zeros(1, dtype=np.uint64)
        for lo, n in splits:
            h += row_hashes(tbl.slice(lo, n)).sum(dtype=np.uint64)
        return int(h[0])

    whole = multiset([(0, 6)])
    # split so some batches are null-free and others aren't
    assert multiset([(0, 1), (1, 2), (3, 3)]) == whole
    assert multiset([(0, 3), (3, 1), (4, 2)]) == whole
    # per-row hashes themselves must be stable across slicing
    a = row_hashes(tbl)
    b = np.concatenate([row_hashes(tbl.slice(i, 1)) for i in range(6)])
    assert a.tolist() == b.tolist()


def test_encode_decode_through_fs_uri(ray_session, tmp_path):
    """The storage seam: whole pipeline through pyarrow.fs URIs (file://
    here; same code path an object store would take — no bare open() on
    chunk paths)."""
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquetjs_ray.pipelines.verify import verify_roundtrip
    from parquetjs_ray.sources.synth import write_synth

    indir = str(tmp_path / "in")
    paths = write_synth(indir, 2_000, n_shards=2)
    out_uri = "file://" + str(tmp_path / "out")
    rep = encode_dataset(paths, out_uri, mode="files", target_rows_per_partition=500, sample_rows=2_000)
    assert rep["rows"] == 2_000
    v = verify_roundtrip(rd.read_parquet(paths), decode_dataset(out_uri))
    assert v["equal"], v
    # resume through the URI too: rerun skips all fragments
    rep2 = encode_dataset(paths, out_uri, mode="files", target_rows_per_partition=500, sample_rows=2_000)
    assert rep2["resumed_fragments"] == rep2["n_fragments"]


def test_verify_artifact_from_stored_fingerprints(ray_session, tmp_path):
    """encode(row_fingerprint=True) -> verify_artifact checks the decode
    against manifest-stored fingerprints with NO original re-scan."""
    from parquetjs_ray.pipelines.encode import encode_dataset
    from parquetjs_ray.pipelines.verify import verify_artifact
    from parquetjs_ray.sources.synth import write_synth

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 2_000, n_shards=2)
    encode_dataset(
        paths, outdir, mode="files", target_rows_per_partition=500, sample_rows=2_000,
        row_fingerprint=True,
    )
    v = verify_artifact(outdir)
    assert v["equal"], v
    assert v["rows_expected"] == 2_000
    # corrupt one fragment -> checksum mismatch surfaces on decode
    import glob

    frag = sorted(glob.glob(str(tmp_path / "out" / "part-*" / "frag-*.bin")))[0]
    raw = bytearray(open(frag, "rb").read())
    raw[len(raw) // 2] ^= 0xFF
    open(frag, "wb").write(bytes(raw))
    import pytest as _pytest

    with _pytest.raises(Exception):
        verify_artifact(outdir)


def test_projection_reads_only_selected_column_bytes(ray_session, tmp_path):
    """Projection pushes into storage: decoding only n_tok must read a
    tiny fraction of the chunk bytes (token segments never leave disk)."""
    from parquetjs_ray import storage as st
    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquetjs_ray.sources.synth import write_synth

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 3_000, n_shards=2)
    encode_dataset(paths, outdir, mode="files", target_rows_per_partition=1_000, sample_rows=3_000)

    # drive the unit decoder directly (driver-side) so the storage spy
    # observes the actual byte ranges requested
    import pyarrow as pa

    from parquetjs_ray.pipelines.encode import _decode_units
    from parquetjs_ray.stages.writer import read_global_manifest

    gm = read_global_manifest(outdir)
    units = []
    for prt in gm["partitions"]:
        pm = st.read_json(st.join(outdir, f"part-{prt['partition']}", "manifest.json"))
        for fr in pm.get("fragments", [""]):
            units.append({"partition": prt["partition"], "fragment": fr})
    ubatch = pa.Table.from_pylist(units)

    read_bytes = {"n": 0}
    orig = st.read_ranges

    def spy(path, ranges):
        read_bytes["n"] += sum(ln for _, ln in ranges)
        return orig(path, ranges)

    st.read_ranges = spy
    try:
        out = _decode_units(ubatch, outdir, columns=["n_tok"]).to_pandas()
    finally:
        st.read_ranges = orig
    assert len(out) == 3_000 and list(out.columns) == ["n_tok"]
    # the Dataset-level path returns identical data
    ds_out = decode_dataset(outdir, columns=["n_tok"]).to_pandas()
    assert sorted(ds_out["n_tok"].tolist()) == sorted(out["n_tok"].tolist())
    total_enc = sum(
        p["enc_bytes"]
        for p in __import__("parquetjs_ray.stages.writer", fromlist=["read_global_manifest"]).read_global_manifest(outdir)["partitions"]
    )
    # n_tok is a tiny FOR-coded stream; selective read must be <5% of chunk bytes
    assert 0 < read_bytes["n"] < 0.05 * total_enc, (read_bytes["n"], total_enc)
    # values correct vs the raw input
    import pyarrow.parquet as pq

    want = sorted(pq.read_table(paths[0], columns=["n_tok"])["n_tok"].to_pylist()
                  + pq.read_table(paths[1], columns=["n_tok"])["n_tok"].to_pylist())
    assert sorted(out["n_tok"].tolist()) == want


def test_uncommitted_fragment_data_is_recomputed(ray_session, tmp_path):
    """Marker-last commit: a .bin without its .json (crash between data
    and marker) is NOT treated as done — the rerun recomputes and
    overwrites it, and the artifact verifies."""
    import glob
    import os

    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquetjs_ray.pipelines.verify import verify_roundtrip
    from parquetjs_ray.sources.synth import write_synth

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 2_000, n_shards=2)
    encode_dataset(paths, outdir, mode="files", target_rows_per_partition=500, sample_rows=2_000)
    # simulate the crash: drop one commit marker, corrupt its data file
    frag_json = sorted(glob.glob(os.path.join(outdir, "part-*", "frag-*.json")))[0]
    frag_bin = frag_json[: -len(".json")] + ".bin"
    os.remove(frag_json)
    with open(frag_bin, "wb") as f:
        f.write(b"torn write")
    rep = encode_dataset(paths, outdir, mode="files", target_rows_per_partition=500, sample_rows=2_000)
    assert rep["resumed_fragments"] == rep["n_fragments"] - 1  # exactly the torn one redone
    v = verify_roundtrip(rd.read_parquet(paths), decode_dataset(outdir))
    assert v["equal"], v


def test_verify_artifact_grouped_mode(ray_session, tmp_path):
    from parquetjs_ray.pipelines.encode import encode_dataset
    from parquetjs_ray.pipelines.verify import verify_artifact
    from parquetjs_ray.sources.synth import write_synth

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 2_000, n_shards=2)
    encode_dataset(
        paths, outdir, mode="grouped", target_rows_per_partition=500, sample_rows=2_000,
        row_fingerprint=True,
    )
    v = verify_artifact(outdir)
    assert v["equal"] and v["rows_expected"] == 2_000, v


def test_encode_stream_transform_pipeline(ray_session, tmp_path):
    """ParquetTransformer shape: filter + transform stages stream straight
    into the encoder actor pool (no intermediate parquet), then decode
    back exactly."""
    import pyarrow.compute as pc
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_stream
    from parquetjs_ray.pipelines.verify import verify_roundtrip
    from parquetjs_ray.sources.synth import write_synth
    from parquetjs_ray.stages import stats as stats_mod

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 3_000, n_shards=2)
    plan = stats_mod.build_plan(paths, sample_rows=3_000, fsst_columns=("doc_id",), dict_columns=("source",))

    def drop_short(batch):
        return batch.filter(pc.greater(batch["n_tok"], 100))

    transformed = rd.read_parquet(paths).map_batches(drop_short, batch_format="pyarrow")
    rep = encode_stream(transformed, outdir, plan=plan, target_rows_per_partition=800, row_fingerprint=True)
    assert 0 < rep["rows"] < 3_000
    # round-trip equals the transformed stream, and stored fingerprints agree
    v = verify_roundtrip(
        rd.read_parquet(paths).map_batches(drop_short, batch_format="pyarrow"),
        decode_dataset(outdir),
    )
    assert v["equal"], v
    from parquetjs_ray.pipelines.verify import verify_artifact

    assert verify_artifact(outdir)["equal"]


def test_pipeline_soak_randomized_schema(ray_session, tmp_path):
    """Full pipeline over a randomized messy schema: NaN floats, nullable
    structs/lists, timestamps, bools, mixed compression — round-trip and
    stored-fingerprint verification both hold."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquetjs_ray.pipelines.verify import verify_artifact, verify_roundtrip

    rng = np.random.default_rng(777)
    n = 1500
    tbl = pa.table(
        {
            "doc_id": pa.array([f"id{i:06d}" for i in range(n)]),
            "source": pa.array([f"s{int(x)}" for x in rng.integers(0, 5, n)]),
            "tokens": pa.array(
                [rng.integers(0, 50000, int(l)).tolist() if rng.random() > 0.05 else None
                 for l in rng.integers(0, 50, n)],
                pa.list_(pa.int32()),
            ),
            "score": pa.array(np.where(rng.random(n) < 0.1, np.nan, rng.standard_normal(n))),
            "meta": pa.array(
                [{"k": int(rng.integers(0, 9)), "tags": ["a", "b"][: int(rng.integers(0, 3))]}
                 if rng.random() > 0.1 else None for _ in range(n)],
                pa.struct([("k", pa.int64()), ("tags", pa.list_(pa.string()))]),
            ),
            "flags": pa.array(rng.random(n) < 0.5),
            "ts": pa.array(rng.integers(0, 2**40, n), pa.timestamp("us")),
        }
    )
    indir = tmp_path / "in"
    indir.mkdir()
    paths = [str(indir / "a.parquet"), str(indir / "b.parquet")]
    pq.write_table(tbl.slice(0, 800), paths[0])
    pq.write_table(tbl.slice(800), paths[1])
    outdir = str(tmp_path / "out")
    encode_dataset(
        paths, outdir, mode="files", target_rows_per_partition=400, sample_rows=n,
        row_fingerprint=True, compression="zstd",
    )
    assert verify_roundtrip(rd.read_parquet(paths), decode_dataset(outdir))["equal"]
    assert verify_artifact(outdir)["equal"]


def test_encode_stream_integer_id_column(ray_session, tmp_path):
    """Resume part-ids must accept fixed-width id columns (e.g. vec_id
    int64), not only string ids — regression for _content_part_id
    indexing string buffers on an integer array."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_stream
    from parquetjs_ray.pipelines.verify import verify_roundtrip
    from parquetjs_ray.stages import stats as stats_mod

    rng = np.random.default_rng(5)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(2_000, dtype=np.int64)),
            "tokens": pa.array([rng.integers(0, 1000, 20).tolist() for _ in range(2_000)],
                               pa.list_(pa.int32())),
            "source": pa.array(["s" + str(i % 3) for i in range(2_000)]),
        }
    )
    path = str(tmp_path / "vecs.parquet")
    pq.write_table(tbl, path)
    outdir = str(tmp_path / "out")
    plan = stats_mod.build_plan([path], sample_rows=2_000, fsst_columns=(), dict_columns=("source",))
    rep = encode_stream(
        rd.read_parquet(path), outdir, plan=plan, target_rows_per_partition=500,
        id_col="vec_id", row_fingerprint=True,
    )
    assert rep["rows"] == 2_000
    v = verify_roundtrip(rd.read_parquet(path), decode_dataset(outdir))
    assert v["equal"], v


def test_asof_join_date32_right_side(ray_session):
    """A date32 right_on must be normalized to epoch-us before the
    comparison — not compared as raw day counts against microseconds."""
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from parquetjs_ray.functions.joins import asof_join

    left = pa.table(
        {
            "k": pa.array([1, 1, 1], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, d, 12, 0) for d in (1, 5, 9)], pa.timestamp("us")
            ),
            "ev": pa.array([10, 11, 12], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, 1], pa.int64()),
            "d": pa.array([datetime.date(2024, 1, 3), datetime.date(2024, 1, 8)], pa.date32()),
            "okey": pa.array([100, 200], pa.int64()),
        }
    )
    out = asof_join(
        rd.from_arrow(left), rd.from_arrow(right),
        by="k", left_on="ts", right_on="d",
        left_cols=["ev"], right_cols=["okey"], tiebreak="okey",
    ).to_pandas().sort_values("ev")
    # day 1 noon: no order yet; day 5 noon: last is Jan 3; day 9 noon: Jan 8
    assert out["okey"].isna().tolist() == [True, False, False]
    assert out["okey"].dropna().astype(int).tolist() == [100, 200]


def test_token_rank_dict_selected_on_scrambled_vocab(ray_session, tmp_path):
    """dict-of-top-ids: when token VALUES are uncorrelated with frequency
    (scrambled vocab), the plan builds a global rank dict and chunks
    select the dict_ranks branch (rank codes pack far tighter than raw
    values); round-trip stays exact, including out-of-dict exceptions."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquetjs_ray.pipelines.verify import verify_roundtrip
    from parquetjs_ray.stages.writer import read_global_manifest
    from parquetjs_ray import storage as st

    rng = np.random.default_rng(11)
    vocab = 50_000
    # frequency rank r maps to a SCRAMBLED value in [0, 2^21)
    perm = rng.choice(1 << 21, vocab, replace=False).astype(np.int64)
    pmf = np.arange(1, vocab + 1, dtype=np.float64) ** (-1.3)
    cdf = np.cumsum(pmf / pmf.sum())
    rows, per = 3_000, 120
    ranks = np.searchsorted(cdf, rng.random(rows * per))
    flat = perm[ranks].astype(np.int32)
    offsets = np.arange(0, (rows + 1) * per, per, dtype=np.int32)
    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{i:08d}" for i in range(rows)]),
            "tokens": pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat)),
            "n_tok": pa.array(np.full(rows, per, dtype=np.int32)),
            "source": pa.array(["s0"] * rows),
        }
    )
    path = str(tmp_path / "scrambled.parquet")
    pq.write_table(tbl, path)
    outdir = str(tmp_path / "out")
    rep = encode_dataset([path], outdir, mode="files", target_rows_per_partition=1_000, sample_rows=3_000)
    # the dict branch must actually have been chosen for at least one chunk
    manifest = read_global_manifest(outdir)
    chose_dict = False
    for part in manifest["partitions"]:
        pdir = st.join(outdir, f"part-{part['partition']}")
        for frag in st.list_names(pdir):
            if not frag.endswith(".json"):
                continue
            m = st.read_json(st.join(pdir, frag))
            vm = m.get("columns", {}).get("tokens", {}).get("values", {})
            if vm.get("codec") == "dict_ranks":
                chose_dict = True
                assert vm["estimates"]["dict_ranks"] < vm["estimates"]["raw"]
    assert chose_dict, "dict_ranks was never selected on scrambled-vocab tokens"
    v = verify_roundtrip(rd.read_parquet(path), decode_dataset(outdir))
    assert v["equal"], v


def test_interval_column_full_pipeline(ray_session, tmp_path):
    """A month_day_nano_interval column (the reference's INTERVAL logical
    type, lossless nano variant) through encode → decode → fingerprint
    verification."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquetjs_ray.pipelines.verify import verify_roundtrip

    MDN = pa.MonthDayNano
    rng = np.random.default_rng(3)
    n = 1_000
    vals = [
        None if i % 17 == 0 else MDN([int(rng.integers(-100, 100)), int(rng.integers(-30, 30)), int(rng.integers(0, 10**9))])
        for i in range(n)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{i:06d}" for i in range(n)]),
            "span": pa.array(vals, pa.month_day_nano_interval()),
            "source": pa.array(["s" + str(i % 2) for i in range(n)]),
        }
    )
    # parquet itself cannot store month_day_nano_interval, so the input
    # arrives as an in-memory Arrow stream (the ParquetTransformer shape)
    from parquetjs_ray.pipelines.encode import encode_stream
    from parquetjs_ray.state.artifacts import EncodePlan

    outdir = str(tmp_path / "out")
    encode_stream(
        rd.from_arrow(tbl), outdir, plan=EncodePlan(), target_rows_per_partition=300,
        row_fingerprint=True,
    )
    v = verify_roundtrip(rd.from_arrow(tbl), decode_dataset(outdir))
    assert v["equal"], v
    back = decode_dataset(outdir).take_all()
    got = {r["doc_id"]: r["span"] for r in back}
    want = {f"d{i:06d}": vals[i] for i in range(n)}
    assert got == want


def test_dict_ranks_projection_decode(ray_session, tmp_path):
    """Byte-range projection must collect the dict_ranks INNER segments
    too (exception streams + nested code stream) — regression guard for
    the segment-range walker."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset

    rng = np.random.default_rng(7)
    vocab = 20_000
    perm = rng.choice(1 << 20, vocab, replace=False).astype(np.int64)
    pmf = np.arange(1, vocab + 1, dtype=np.float64) ** (-1.3)
    cdf = np.cumsum(pmf / pmf.sum())
    rows, per = 1_500, 80
    flat = perm[np.searchsorted(cdf, rng.random(rows * per))].astype(np.int32)
    offsets = np.arange(0, (rows + 1) * per, per, dtype=np.int32)
    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{i:06d}" for i in range(rows)]),
            "tokens": pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat)),
            "n_tok": pa.array(np.full(rows, per, dtype=np.int32)),
            "source": pa.array(["s0"] * rows),
        }
    )
    path = str(tmp_path / "t.parquet")
    pq.write_table(tbl, path)
    outdir = str(tmp_path / "out")
    encode_dataset([path], outdir, mode="files", target_rows_per_partition=500, sample_rows=1_500)
    got = decode_dataset(outdir, columns=["doc_id", "tokens"]).take_all()
    by_id = {r["doc_id"]: r["tokens"] for r in got}
    toks = tbl["tokens"].to_pylist()
    assert len(by_id) == rows
    for i in (0, 700, 1_499):
        assert by_id[f"d{i:06d}"] == toks[i]


def test_row_hashes_uint64_extremes_and_batch_independence(ray_session):
    """uint64 ≥ 2^63 (and uint32 ≥ 2^31) must hash without a lossy signed
    cast, and hashes must not depend on batch composition; values below
    2^63 keep the historical hash (stored-fingerprint compatibility)."""
    import numpy as np
    import pyarrow as pa

    from parquetjs_ray.pipelines.verify import row_hashes

    u64 = np.array([0, 1, 2**63 - 1, 2**63, 2**64 - 1, 12345], dtype=np.uint64)
    u32 = np.array([0, 2**31 - 1, 2**31, 2**32 - 1, 7, 8], dtype=np.uint32)
    t = pa.table({"a": pa.array(u64, pa.uint64()), "b": pa.array(u32, pa.uint32())})
    h = row_hashes(t)
    h2 = np.concatenate([row_hashes(t.slice(0, 3)), row_hashes(t.slice(3, 3))])
    assert np.array_equal(h, h2)
    # compatibility: small unsigned values hash identically to the signed path
    small = pa.table({"a": pa.array([5, 6], pa.uint64()), "b": pa.array([1, 2], pa.uint32())})
    small_signed = pa.table({"a": pa.array([5, 6], pa.int64()), "b": pa.array([1, 2], pa.int32())})
    assert np.array_equal(row_hashes(small), row_hashes(small_signed))


def _events_fixture(indir: str, rows: int = 4_000, n_shards: int = 4) -> list[str]:
    """Time-ordered events-shaped table (ts increases with row index), so
    files-mode fragments carry narrow ts zones — the classic time-range
    pruning layout."""
    import pyarrow.parquet as pq

    os.makedirs(indir, exist_ok=True)
    per = rows // n_shards
    paths = []
    for s in range(n_shards):
        rng = np.random.default_rng(1000 + s)
        idx = np.arange(per, dtype=np.int64) + s * per
        tbl = pa.table(
            {
                "event_id": pa.array(idx, pa.int64()),
                "ts": pa.array(
                    (1_700_000_000_000_000 + idx * 60_000_000),  # 1/min, strictly increasing
                    pa.timestamp("us"),
                ),
                "value": pa.array(rng.normal(0, 1, per), pa.float64()),
                "kind": pa.array(rng.choice(["click", "view", "buy"], per)),
            }
        )
        p = os.path.join(indir, f"events-{s}.parquet")
        pq.write_table(tbl, p)
        paths.append(p)
    return paths


def test_zone_map_predicate_pruning(ray_session, tmp_path):
    """decode_dataset(where=...) prunes fragments by per-column min/max
    zones (no chunk bytes read) and applies an exact residual filter."""
    import datetime as dt

    import pyarrow.parquet as pq

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset, list_decode_units

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = _events_fixture(indir)
    encode_dataset(
        paths, outdir, mode="files", target_rows_per_partition=500, sample_rows=4_000,
        id_col="event_id", source_col=None,
    )

    lo = dt.datetime(2023, 11, 14, 22, 13, 20) + dt.timedelta(minutes=1_000)
    hi = lo + dt.timedelta(minutes=500)
    where = [("ts", ">=", lo), ("ts", "<", hi)]

    all_units = list_decode_units(outdir)
    kept_units = list_decode_units(outdir, where=where)
    assert 0 < len(kept_units) < len(all_units), (len(kept_units), len(all_units))

    got = decode_dataset(outdir, where=where).take_all()
    orig = pa.concat_tables([pq.read_table(p) for p in paths])
    import pyarrow.compute as pc

    lo_s = pa.scalar(lo, pa.timestamp("us"))
    hi_s = pa.scalar(hi, pa.timestamp("us"))
    want = orig.filter(pc.and_(pc.greater_equal(orig["ts"], lo_s), pc.less(orig["ts"], hi_s)))
    assert sorted(r["event_id"] for r in got) == sorted(want["event_id"].to_pylist())
    # exact boundaries (residual filter, not just zone-level granularity)
    assert len(got) == 500

    # predicate on an integer column + projection: predicate column decoded
    # for filtering but dropped from the output
    got2 = decode_dataset(outdir, columns=["value"], where=[("event_id", "<", 100)]).take_all()
    assert len(got2) == 100 and sorted(got2[0].keys()) == ["value"]

    # float predicate admits everything at zone level but filters exactly
    got3 = decode_dataset(outdir, where=[("value", ">", 1.5)]).take_all()
    want3 = orig.filter(pc.greater(orig["value"], pa.scalar(1.5, pa.float64())))
    assert sorted(r["event_id"] for r in got3) == sorted(want3["event_id"].to_pylist())

    # string-column predicate: no zones -> no pruning, still exact
    got4 = decode_dataset(outdir, where=[("kind", "==", "buy")]).take_all()
    assert sorted(r["event_id"] for r in got4) == sorted(
        orig.filter(pc.equal(orig["kind"], "buy"))["event_id"].to_pylist()
    )

    # every fragment pruned: empty result, no crash
    assert decode_dataset(outdir, where=[("event_id", "<", -1)]).count() == 0


def test_zone_maps_survive_compaction_and_grouped_mode(ray_session, tmp_path):
    """Compacted partitions re-emit zones for the merged chunk; grouped
    mode prunes at partition granularity."""
    from parquetjs_ray import storage as pst
    from parquetjs_ray.pipelines.encode import compact_dataset, decode_dataset, encode_dataset
    from parquetjs_ray.stages.writer import read_global_manifest

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = _events_fixture(indir, rows=2_000, n_shards=2)
    encode_dataset(
        paths, outdir, mode="files", target_rows_per_partition=250, sample_rows=2_000,
        id_col="event_id", source_col=None,
    )
    compact_dataset(outdir)
    gm = read_global_manifest(outdir)
    pm = pst.read_json(pst.join(outdir, f"part-{gm['partitions'][0]['partition']}", "manifest.json"))
    assert "zones" in pm and "event_id" in pm["zones"]
    got = decode_dataset(outdir, where=[("event_id", ">=", 1_500)]).take_all()
    assert sorted(r["event_id"] for r in got) == list(range(1_500, 2_000))


def test_incremental_append_of_new_files(ray_session, tmp_path):
    """Appending files to an existing artifact: re-running encode with an
    EXTENDED path list recomputes nothing for the old files (their
    fragment ids are deterministic) and encodes only the new one; decode
    sees the union."""
    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 3_000, n_shards=3)
    r1 = encode_dataset(paths[:2], outdir, mode="files", target_rows_per_partition=500, sample_rows=2_000)
    assert r1["rows"] == 2_000
    r2 = encode_dataset(paths, outdir, mode="files", target_rows_per_partition=500, sample_rows=2_000)
    assert r2["rows"] == 3_000
    # everything from the first run was reused, not recomputed
    assert r2["resumed_fragments"] == r1["n_fragments"]
    got = decode_dataset(outdir).take_all()
    assert len(got) == 3_000
    assert len({r["doc_id"] for r in got}) == 3_000  # no duplicated rows


def test_encode_stream_from_csv_source(ray_session, tmp_path):
    """Any Ray-readable source can feed the engine: CSV → plan sampled
    from the stream itself (build_plan_from_dataset) → encode_stream →
    exact decode round-trip. No parquet anywhere on the input side."""
    import csv

    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_stream
    from parquetjs_ray.pipelines.verify import verify_roundtrip
    from parquetjs_ray.stages.stats import build_plan_from_dataset

    csv_path = str(tmp_path / "rows.csv")
    rng = np.random.default_rng(11)
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["doc_id", "source", "score"])
        for i in range(1_500):
            w.writerow([f"doc{i:05d}", f"s{i % 4}", int(rng.integers(0, 1000))])

    src = rd.read_csv(csv_path)
    plan = build_plan_from_dataset(src, sample_rows=1_500, fsst_columns=("doc_id",), dict_columns=("source",))
    outdir = str(tmp_path / "out")
    rep = encode_stream(src, outdir, plan=plan, target_rows_per_partition=400, row_fingerprint=True)
    assert rep["rows"] == 1_500 and rep["ratio"] < 1.0
    v = verify_roundtrip(rd.read_csv(csv_path), decode_dataset(outdir))
    assert v["equal"], v


def test_encode_stream_from_jsonl_source(ray_session, tmp_path):
    """Newline-delimited JSON — the LLM-corpus interchange format — with
    the north-rule nested tokens column feeds encode_stream directly:
    read_json → sampled plan → encode → exact decode round-trip, no
    parquet anywhere on the input side and a list<int> column surviving
    the non-parquet ingest."""
    import json as _json

    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_stream
    from parquetjs_ray.pipelines.verify import verify_roundtrip
    from parquetjs_ray.stages.stats import build_plan_from_dataset

    jsonl_path = str(tmp_path / "rows.jsonl")
    rng = np.random.default_rng(13)
    with open(jsonl_path, "w") as f:
        for i in range(1_200):
            toks = rng.zipf(1.4, int(rng.integers(3, 40))).astype(int) % 50_000
            f.write(
                _json.dumps(
                    {
                        "doc_id": f"doc{i:05d}",
                        "tokens": toks.tolist(),
                        "n_tok": len(toks),
                        "source": f"s{i % 3}",
                    }
                )
                + "\n"
            )

    src = rd.read_json(jsonl_path)
    plan = build_plan_from_dataset(
        src, sample_rows=1_200, fsst_columns=("doc_id",), dict_columns=("source",)
    )
    outdir = str(tmp_path / "out_jsonl")
    rep = encode_stream(src, outdir, plan=plan, target_rows_per_partition=400, row_fingerprint=True)
    assert rep["rows"] == 1_200 and rep["ratio"] < 1.0
    v = verify_roundtrip(rd.read_json(jsonl_path), decode_dataset(outdir))
    assert v["equal"], v


def test_where_predicate_randomized_soak(ray_session, tmp_path):
    """Randomized conjunctive predicates over the events fixture must
    always equal the pyarrow filter of the raw input — zone AND bloom
    pruning can never drop a qualifying row (kind/event_id carry chunk
    Bloom filters here, so == clauses exercise both prune layers)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = _events_fixture(indir, rows=3_000, n_shards=3)
    encode_dataset(
        paths, outdir, mode="files", target_rows_per_partition=300, sample_rows=3_000,
        id_col="event_id", source_col=None, unit_rows=250,
        bloom_columns=["kind", "event_id"],
    )
    orig = pa.concat_tables([pq.read_table(p) for p in paths])
    kernels = {"<": pc.less, "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal, "==": pc.equal}
    rng = np.random.default_rng(5)
    ops = list(kernels)
    for trial in range(12):
        n_clauses = int(rng.integers(1, 4))
        where, mask = [], None
        for _ in range(n_clauses):
            col = rng.choice(["event_id", "value", "kind"])
            op = ops[int(rng.integers(0, len(ops)))]
            if col == "event_id":
                val = int(rng.integers(-100, 3_200))
            elif col == "value":
                val = float(rng.normal(0, 1.5))
            else:
                op, val = "==", str(rng.choice(["click", "view", "buy", "nope"]))
            where.append((col, op, val))
            m = kernels[op](orig[col], pa.scalar(val, orig[col].type))
            mask = m if mask is None else pc.and_(mask, m)
        got = sorted(r["event_id"] for r in decode_dataset(outdir, where=where).take_all())
        want = sorted(orig.filter(mask)["event_id"].to_pylist())
        assert got == want, (trial, where, len(got), len(want))


def test_bloom_filter_unit_roundtrip():
    """Bloom build/probe: every inserted value admits; absent values are
    rejected at ~the designed false-positive rate; both hash domains
    (string fingerprint, int mix) agree between array and scalar sides."""
    from parquetjs_ray.stages.bloom import bloom_admits, build_bloom, column_hash

    rng = np.random.default_rng(11)
    keys = pa.array([f"k-{v:016x}" for v in rng.integers(0, 2**63, 5_000)])
    h, tag = column_hash(keys)
    bloom = build_bloom(h, tag)
    for k in keys.to_pylist()[::250]:
        assert bloom_admits(bloom, k)
    misses = sum(bloom_admits(bloom, f"absent-{i}") for i in range(2_000))
    assert misses < 2_000 * 0.05, misses  # design point ≈1.2% at 10 bits/key

    ints = pa.array(rng.integers(-(2**62), 2**62, 3_000), pa.int64())
    hi, ti = column_hash(ints)
    bi = build_bloom(hi, ti)
    assert all(bloom_admits(bi, v) for v in ints.to_pylist()[::111])
    miss_i = sum(bloom_admits(bi, int(v)) for v in rng.integers(2**62, 2**63, 2_000))
    assert miss_i < 2_000 * 0.05, miss_i
    # unsigned column values probe identically through the Python-int operand
    u = pa.array([2**63 + 7, 5], pa.uint64())
    hu, tu = column_hash(u)
    bu = build_bloom(hu, tu)
    assert bloom_admits(bu, 2**63 + 7) and bloom_admits(bu, 5)
    # nulls are excluded, not hashed as a value
    hn, _ = column_hash(pa.array(["a", None, "b"]))
    assert len(hn) == 2


def test_bloom_filter_point_lookup_pruning(ray_session, tmp_path):
    """An artifact encoded with bloom_columns prunes == lookups on an
    unordered high-cardinality string column to ~1 fragment, while the
    residual filter keeps results exact; absent keys scan ~nothing."""
    import pyarrow.parquet as pq

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset, list_decode_units
    from parquetjs_ray.state.artifacts import load_plan

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(indir)
    rng = np.random.default_rng(7)
    n = 4_000
    # content-hash-keyed rows: key order is uncorrelated with row order,
    # so zones are useless and only the bloom can prune
    keys = [f"sha-{v:016x}" for v in rng.permutation(n).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "key": pa.array(keys),
            "payload": pa.array(rng.integers(0, 1_000, n), pa.int64()),
        }
    )
    paths = []
    for s in range(4):
        p = os.path.join(indir, f"d-{s}.parquet")
        pq.write_table(tbl.slice(s * (n // 4), n // 4), p)
        paths.append(p)

    encode_dataset(
        paths, outdir, mode="files", target_rows_per_partition=250, sample_rows=n,
        id_col="doc_id", source_col=None, bloom_columns=["key", "payload"],
    )
    assert load_plan(outdir).bloom_columns == ["key", "payload"]

    all_units = list_decode_units(outdir)
    assert len(all_units) >= 8
    hits = scanned = 0
    for probe in (3, 777, 2_222, 3_999):
        where = [("key", "==", keys[probe])]
        units = list_decode_units(outdir, where=where)
        scanned += len(units)
        rows = decode_dataset(outdir, where=where).take_all()
        assert [r["doc_id"] for r in rows] == [probe]
        hits += 1
    # each key lives in exactly one fragment; false positives land near
    # the ≈1.2% design rate (4 probes × 64 fragments ⇒ expect ~3 extras)
    assert scanned <= hits + int(0.05 * hits * len(all_units)), (scanned, hits, len(all_units))

    # absent key: zero rows, ~zero fragments read
    units = list_decode_units(outdir, where=[("key", "==", "sha-nope")])
    assert len(units) <= 3, len(units)
    assert decode_dataset(outdir, where=[("key", "==", "sha-nope")]).count() == 0

    # int bloom column: == on a value outside any chunk still prunes even
    # though every chunk's [min,max] zone admits it
    import pyarrow.compute as pc

    assert decode_dataset(outdir, where=[("payload", "==", 500)]).count() == tbl.filter(
        pc.equal(tbl["payload"], 500)
    ).num_rows
    absent_units = list_decode_units(outdir, where=[("payload", "==", 4_001)])
    assert len(absent_units) <= 2, len(absent_units)

    # range ops ignore blooms (zones still apply); conjunction stays exact
    got = decode_dataset(outdir, where=[("key", "==", keys[50]), ("payload", ">", -1)]).take_all()
    assert [r["doc_id"] for r in got] == [50]


def test_schema_evolution_on_append(ray_session, tmp_path):
    """Appending files that ADD or DROP columns re-encodes incrementally
    and decodes against the union schema: fragments written before a
    column existed (or after it was dropped) yield nulls, projections
    and predicates on evolved columns work, values stay exact."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(indir)
    t1 = pa.table(
        {
            "doc_id": pa.array(np.arange(100, dtype=np.int64)),
            "source": pa.array(["a"] * 100),
            "n": pa.array(np.arange(100, dtype=np.int32)),
        }
    )
    t2 = pa.table(  # adds "score", drops "n"
        {
            "doc_id": pa.array(np.arange(100, 200, dtype=np.int64)),
            "source": pa.array(["b"] * 100),
            "score": pa.array(np.linspace(0, 1, 100)),
        }
    )
    pq.write_table(t1, os.path.join(indir, "f1.parquet"))
    pq.write_table(t2, os.path.join(indir, "f2.parquet"))

    kw = dict(mode="files", target_rows_per_partition=50, sample_rows=1_000)
    r1 = encode_dataset([os.path.join(indir, "f1.parquet")], outdir, **kw)
    r2 = encode_dataset(
        [os.path.join(indir, "f1.parquet"), os.path.join(indir, "f2.parquet")], outdir, **kw
    )
    assert r2["resumed_fragments"] >= r1["n_fragments"]  # f1's work reused

    import ray

    full = pa.concat_tables(ray.get(decode_dataset(outdir).to_arrow_refs())).sort_by("doc_id")
    assert full.column_names == ["doc_id", "source", "n", "score"]
    assert full.num_rows == 200
    assert full["n"].null_count == 100 and full["score"].null_count == 100
    assert full["n"].slice(0, 100).to_pylist() == list(range(100))
    got_scores = full["score"].slice(100).to_pylist()
    assert got_scores == pytest.approx(np.linspace(0, 1, 100).tolist())

    # projection of a column absent from half the fragments
    proj = decode_dataset(outdir, columns=["doc_id", "score"]).take_all()
    assert len(proj) == 200 and {len(r) for r in map(dict, proj)} == {2}

    # predicate on the evolved column: nulls (pre-append rows) never match
    hits = decode_dataset(outdir, where=[("score", ">", 0.5)]).take_all()
    assert sorted(r["doc_id"] for r in hits) == list(range(150, 200))
    # predicate on the dropped column only matches pre-append rows
    hits_n = decode_dataset(outdir, where=[("n", "<", 10)]).take_all()
    assert sorted(r["doc_id"] for r in hits_n) == list(range(10))


def test_codec_profile_fast_and_small(ray_session, tmp_path):
    """profile="fast" never selects the multi-pass vpack codec and still
    round-trips exactly; "small" compresses at least as well as the
    default; all three persist their choice in the plan artifact."""
    import json as _json

    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquetjs_ray.pipelines.verify import verify_roundtrip
    from parquetjs_ray.state.artifacts import load_plan

    indir = str(tmp_path / "in")
    paths = write_synth(indir, 4_000, n_shards=2)
    ratios = {}
    for prof in ("fast", "balanced", "small"):
        out = str(tmp_path / prof)
        rep = encode_dataset(
            paths, out, mode="files", target_rows_per_partition=1_000,
            sample_rows=4_000, profile=prof,
        )
        ratios[prof] = rep["ratio"]
        assert load_plan(out).profile == prof
        assert verify_roundtrip(rd.read_parquet(paths), decode_dataset(out))["equal"]
        codecs_used = " ".join(
            _json.dumps(_json.load(open(f)))
            for f in glob.glob(os.path.join(out, "part-*", "frag-*.json"))
        )
        if prof == "fast":
            assert '"vpack"' not in codecs_used
        else:  # zipf token ids: vpack wins under both other profiles
            assert '"vpack"' in codecs_used
    assert ratios["small"] <= ratios["balanced"] < ratios["fast"] < 1.0, ratios


def test_delete_rows_targeted_rewrite(ray_session, tmp_path):
    """Targeted delete rewrites only predicate-admitted fragments, leaves
    every other fragment byte-identical, survives reruns and encode
    resume, and never resurrects deleted rows."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquetjs_ray.pipelines.encode import decode_dataset, delete_rows, encode_dataset

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = _events_fixture(indir, rows=4_000, n_shards=4)
    kw = dict(mode="files", target_rows_per_partition=500, sample_rows=4_000,
              id_col="event_id", source_col=None, unit_rows=400,
              bloom_columns=["kind"])
    encode_dataset(paths, outdir, **kw)
    orig = pa.concat_tables([pq.read_table(p) for p in paths])

    before = {
        f: open(f, "rb").read()
        for f in glob.glob(os.path.join(outdir, "part-*", "frag-*.bin"))
    }

    # range delete: a one-slice window of event ids (zones prune the rest)
    rep = delete_rows(outdir, [("event_id", ">=", 1_000), ("event_id", "<", 1_500)])
    assert rep["rows_deleted"] == 500, rep
    assert 0 < rep["units_scanned"] < len(before), rep

    got = sorted(r["event_id"] for r in decode_dataset(outdir).take_all())
    want = sorted(
        orig.filter(
            pc.invert(pc.and_(pc.greater_equal(orig["event_id"], 1_000), pc.less(orig["event_id"], 1_500)))
        )["event_id"].to_pylist()
    )
    assert got == want

    # untouched fragments are byte-identical
    changed = untouched = 0
    for f, data in before.items():
        if os.path.exists(f):
            if open(f, "rb").read() == data:
                untouched += 1
            else:
                changed += 1
    assert changed == 0 and untouched >= len(before) - rep["units_scanned"]

    # rerun of the same delete: converges with nothing left to remove
    rep2 = delete_rows(outdir, [("event_id", ">=", 1_000), ("event_id", "<", 1_500)])
    assert rep2["rows_deleted"] == 0, rep2

    # equality (bloom-pruned) delete on a string column
    n_buy = int(pc.sum(pc.equal(orig["kind"], "buy")).as_py())
    rep3 = delete_rows(outdir, [("kind", "==", "buy")])
    assert 0 < rep3["rows_deleted"] <= n_buy  # some buys were in the id window
    assert decode_dataset(outdir, where=[("kind", "==", "buy")]).count() == 0

    # encode resume does NOT resurrect deleted rows (tombstones are markers)
    encode_dataset(paths, outdir, **kw)
    assert decode_dataset(outdir, where=[("kind", "==", "buy")]).count() == 0
    got2 = sorted(r["event_id"] for r in decode_dataset(outdir).take_all())
    assert got2 == sorted(
        orig.filter(
            pc.and_(
                pc.invert(pc.and_(pc.greater_equal(orig["event_id"], 1_000), pc.less(orig["event_id"], 1_500))),
                pc.invert(pc.equal(orig["kind"], "buy")),
            )
        )["event_id"].to_pylist()
    )


def test_upsert_rows_keyed_merge(ray_session, tmp_path):
    """upsert_rows: matched keys replaced, unseen keys inserted, untouched
    fragments byte-identical, reruns converge, a later upsert of the same
    key keeps exactly the newest version, a schema-evolving upsert adds a
    column that decodes as null elsewhere, and the pre-merge snapshot
    still time-travels."""
    import ray

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset, upsert_rows

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 2_000, n_shards=2)
    encode_dataset(paths, outdir, mode="files", target_rows_per_partition=250, sample_rows=2_000)
    orig = pa.concat_tables([pq.read_table(p) for p in paths])
    all_ids = sorted(set(orig["doc_id"].to_pylist()))
    upd_ids, new_ids = all_ids[:5], ["zz-up-0", "zz-up-1", "zz-up-2"]

    def patch(ids: list[str], marker: int, extra_col: bool = False) -> pa.Table:
        cols = {
            "doc_id": pa.array(ids, pa.string()),
            "tokens": pa.array([[7, 7, marker]] * len(ids), pa.list_(pa.int32())),
            "n_tok": pa.array([3] * len(ids), pa.int32()),
            "source": pa.array(["patched"] * len(ids), pa.string()),
        }
        if extra_col:
            cols["rev"] = pa.array([marker] * len(ids), pa.int64())
        return pa.table(cols)

    before = {
        f: open(f, "rb").read()
        for f in glob.glob(os.path.join(outdir, "part-*", "frag-*.bin"))
    }
    rep = upsert_rows(outdir, patch(upd_ids + new_ids, 1), key="doc_id")
    assert rep["rows_updated"] == 5 and rep["rows_inserted"] == 3, rep

    got = pa.concat_tables(ray.get(decode_dataset(outdir).to_arrow_refs()))
    assert got.num_rows == 2_003
    assert len(set(got["doc_id"].to_pylist())) == 2_003  # one version per key
    patched = got.filter(pc.equal(got["source"], "patched"))
    assert sorted(patched["doc_id"].to_pylist()) == sorted(upd_ids + new_ids)

    # fragments the merge didn't touch are byte-identical
    changed = sum(
        1 for f, data in before.items()
        if os.path.exists(f) and open(f, "rb").read() != data
    )
    assert changed == 0

    # rerun of the identical upsert converges (deterministic ids skip)
    rep2 = upsert_rows(outdir, patch(upd_ids + new_ids, 1), key="doc_id")
    assert rep2["rows_updated"] == 0, rep2
    assert decode_dataset(outdir).count() == 2_003

    # a later upsert of 2 of the same keys (new content + a new column)
    # replaces the previous upsert's rows, not just the original ones
    rep3 = upsert_rows(outdir, patch(upd_ids[:2], 2, extra_col=True), key="doc_id")
    assert rep3["rows_updated"] == 2, rep3
    got3 = pa.concat_tables(ray.get(decode_dataset(outdir).to_arrow_refs()))
    assert got3.num_rows == 2_003
    assert len(set(got3["doc_id"].to_pylist())) == 2_003
    assert got3["rev"].null_count == 2_001  # only the v2 rows carry it
    v2 = got3.filter(pc.equal(pc.fill_null(got3["rev"], -1), 2))
    assert sorted(v2["doc_id"].to_pylist()) == sorted(upd_ids[:2])
    assert v2["tokens"].to_pylist() == [[7, 7, 2]] * 2

    # duplicate keys in one upsert batch are rejected (undefined winner)
    with pytest.raises(ValueError, match="duplicate"):
        upsert_rows(outdir, patch(["a", "a"], 9), key="doc_id")

    # time travel: the pre-merge snapshot still reads the original corpus
    from parquetjs_ray.stages.writer import list_snapshots

    v0 = list_snapshots(outdir)[0]
    old = pa.concat_tables(ray.get(decode_dataset(outdir, version=v0).to_arrow_refs()))
    assert old.num_rows == 2_000
    assert sorted(set(old["doc_id"].to_pylist())) == all_ids


def test_contains_predicate_token_pruning(ray_session, tmp_path):
    """`contains` on a list<int32> column: flat-value zones + Bloom
    filters prune fragments before any byte is read (rare-token search
    over the token corpus), and the residual is exact."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset, list_decode_units

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 3_000, n_shards=2)
    encode_dataset(
        paths, outdir, mode="files", target_rows_per_partition=300, sample_rows=3_000,
        bloom_columns=["tokens"],
    )
    orig = pa.concat_tables([pq.read_table(p) for p in paths])
    flat = pc.list_flatten(orig["tokens"])
    vc = pc.value_counts(flat)
    counts = vc.field("counts").to_numpy(zero_copy_only=False)
    rare = int(vc.field("values")[int(np.argmin(counts))].as_py())  # appears once

    total = len(list_decode_units(outdir))
    admitted = list_decode_units(outdir, where=[("tokens", "contains", rare)])
    assert total > 10
    assert len(admitted) <= max(2, 0.2 * total), (len(admitted), total)

    got = decode_dataset(outdir, where=[("tokens", "contains", rare)]).take_all()
    want_ids = [
        d for d, row in zip(orig["doc_id"].to_pylist(), orig["tokens"].to_pylist())
        if rare in row
    ]
    assert sorted(r["doc_id"] for r in got) == sorted(want_ids)
    assert all(rare in r["tokens"] for r in got)

    # an id outside the corpus value range: zones prune EVERYTHING
    assert list_decode_units(outdir, where=[("tokens", "contains", -7)]) == []
    assert decode_dataset(outdir, where=[("tokens", "contains", -7)]).count() == 0


def test_streamed_files_layout_is_mutable(ray_session, tmp_path):
    """encode_stream(layout='files'): the streamed artifact records its
    schema and supports keyed upsert — including one that OMITS a column
    (aligned to the recorded union schema, decoding as null)."""
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_stream, upsert_rows
    from parquetjs_ray.stages.stats import build_plan_from_dataset

    src = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([f"d{i:03d}" for i in range(300)], pa.string()),
                "tokens": pa.array([[i, i + 1] for i in range(300)], pa.list_(pa.int32())),
                "n_tok": pa.array([2] * 300, pa.int32()),
            }
        )
    )
    plan = build_plan_from_dataset(src, sample_rows=300, fsst_columns=("doc_id",))
    outdir = str(tmp_path / "art")
    rep = encode_stream(src, outdir, plan=plan, target_rows_per_partition=100, layout="files")
    assert rep["rows"] == 300 and rep["n_partitions"] == 3

    # upsert WITHOUT the tokens column: aligns to the recorded schema
    up = pa.table(
        {
            "doc_id": pa.array(["d000", "zz-new"], pa.string()),
            "n_tok": pa.array([9, 9], pa.int32()),
        }
    )
    r = upsert_rows(outdir, up, key="doc_id")
    assert r["rows_updated"] == 1 and r["rows_inserted"] == 1
    got = {r["doc_id"]: r for r in decode_dataset(outdir).take_all()}
    assert len(got) == 301
    assert got["d000"]["n_tok"] == 9 and got["d000"]["tokens"] is None
    assert got["zz-new"]["tokens"] is None
    assert got["d001"]["tokens"] == [1, 2]


def test_table_mutation_soak(ray_session, tmp_path):
    """Randomized delete/upsert/vacuum sequence against a driver-side
    model: after every mutation the decoded table equals the model, and
    the first→last CDC feed equals the model diff. Catches interactions
    (upsert over rewritten fragments, vacuum mid-history, repeated keys)
    no directed test enumerates."""
    import pyarrow.parquet as pq

    from parquetjs_ray.pipelines.changes import table_changes
    from parquetjs_ray.pipelines.encode import (
        decode_dataset,
        delete_rows,
        encode_dataset,
        upsert_rows,
        vacuum,
    )
    from parquetjs_ray.stages.writer import list_snapshots

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 800, n_shards=2)
    encode_dataset(paths, outdir, mode="files", target_rows_per_partition=200, sample_rows=800)
    orig = pa.concat_tables([pq.read_table(p) for p in paths])
    model = {
        d: (int(n), s)
        for d, n, s in zip(
            orig["doc_id"].to_pylist(), orig["n_tok"].to_pylist(), orig["source"].to_pylist()
        )
    }
    model_v1 = dict(model)
    v1 = list_snapshots(outdir)[-1]

    def check():
        got = {
            r["doc_id"]: (r["n_tok"], r["source"])
            for r in decode_dataset(outdir, columns=["doc_id", "n_tok", "source"]).take_all()
        }
        assert got == model

    rng = np.random.default_rng(17)
    new_i = 0
    for step in range(8):
        op = rng.choice(["delete", "upsert", "upsert"])  # upserts twice as likely
        if op == "delete":
            lo = int(rng.integers(100, 900))
            hi = lo + int(rng.integers(20, 120))
            rep = delete_rows(outdir, [("n_tok", ">=", lo), ("n_tok", "<", hi)])
            expect = [d for d, (n, _) in model.items() if lo <= n < hi]
            assert rep["rows_deleted"] == len(expect), (step, lo, hi)
            for d in expect:
                del model[d]
        else:
            pool = sorted(model)
            k_old = min(len(pool), int(rng.integers(1, 4)))
            keys = list(rng.choice(pool, size=k_old, replace=False))
            if rng.random() < 0.7:
                keys.append(f"zz-soak-{new_i}")
                new_i += 1
            m = int(rng.integers(100, 900))
            up = pa.table(
                {
                    "doc_id": pa.array(keys, pa.string()),
                    "tokens": pa.array([[7] * m] * len(keys), pa.list_(pa.int32())),
                    "n_tok": pa.array([m] * len(keys), pa.int32()),
                    "source": pa.array([f"patch{step}"] * len(keys), pa.string()),
                }
            )
            rep = upsert_rows(outdir, up, key="doc_id")
            assert rep["rows_upserted"] == len(keys)
            for d in keys:
                model[d] = (m, f"patch{step}")
        if step == 4:
            vacuum(outdir, keep_snapshots=100)  # GC remnants, keep history
        check()

    # CDC v1 → latest equals the model diff (changed keys appear as a
    # delete of the old version + an insert of the new one)
    feed = table_changes(outdir, v1).take_all()
    ins = {(r["doc_id"], r["n_tok"], r["source"]) for r in feed if r["_change_type"] == "insert"}
    dels = {(r["doc_id"], r["n_tok"], r["source"]) for r in feed if r["_change_type"] == "delete"}
    want_ins = {(d, n, s) for d, (n, s) in model.items() if model_v1.get(d) != (n, s)}
    want_del = {(d, n, s) for d, (n, s) in model_v1.items() if model.get(d) != (n, s)}
    assert ins == want_ins
    assert dels == want_del

    # version log: ascending versions, cut-time totals track the model
    from parquetjs_ray.pipelines.encode import table_history

    hist = table_history(outdir)
    versions = [h["version"] for h in hist]
    assert versions == sorted(versions) and versions[0] == v1
    assert hist[0]["rows"] == len(model_v1)
    assert hist[-1]["rows"] == len(model)

    # RESTORE to v1 undoes the whole history...
    from parquetjs_ray.pipelines.encode import restore_version

    rep = restore_version(outdir, v1)
    assert rep["rows"] == len(model_v1), rep
    model = dict(model_v1)
    check()
    # ...and the artifact stays mutable afterwards: a rebuild-driven op
    # must NOT resurrect pre-restore rewrite fragments (duplicate rows)
    rep = delete_rows(outdir, [("n_tok", ">=", 100), ("n_tok", "<", 200)])
    model = {d: v for d, v in model.items() if not (100 <= v[0] < 200)}
    check()


def test_recluster_tightens_zone_pruning(ray_session, tmp_path):
    """recluster_dataset: an artifact ingested in an order uncorrelated
    with the query predicate admits ~every unit on a range scan; the
    sorted rewrite prunes to a handful, with identical query results."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquetjs_ray.pipelines.encode import (
        decode_dataset,
        encode_dataset,
        list_decode_units,
        recluster_dataset,
    )

    indir = str(tmp_path / "in")
    paths = _events_fixture(indir, rows=4_000, n_shards=2)
    # destroy the natural ts order: shuffle rows deterministically
    shuffled = pa.concat_tables([pq.read_table(p) for p in paths])
    perm = np.random.default_rng(3).permutation(shuffled.num_rows)
    bad = os.path.join(indir, "shuffled.parquet")
    pq.write_table(shuffled.take(pa.array(perm)), bad)

    src = str(tmp_path / "src")
    encode_dataset(
        [bad], src, mode="files", target_rows_per_partition=250, sample_rows=4_000,
        id_col="event_id", source_col=None, unit_rows=250,
    )
    t0 = pa.scalar(1_700_000_000_000_000 + 1_000 * 60_000_000, pa.timestamp("us"))
    t1 = pa.scalar(1_700_000_000_000_000 + 1_200 * 60_000_000, pa.timestamp("us"))
    where = [("ts", ">=", t0), ("ts", "<", t1)]
    units_src = list_decode_units(src, where=where)
    total_src = list_decode_units(src)
    assert len(units_src) > 0.8 * len(total_src)  # shuffled layout: no pruning

    dst = str(tmp_path / "dst")
    rep = recluster_dataset(src, dst, by="ts", id_col="event_id", target_rows_per_partition=250)
    assert rep["rows"] == 4_000
    units_dst = list_decode_units(dst, where=where)
    total_dst = list_decode_units(dst)
    # 200 of 4000 rows = 5% of the range → a clustered layout reads ~5%
    assert len(units_dst) <= max(3, 0.15 * len(total_dst)), (len(units_dst), len(total_dst))

    got = sorted(r["event_id"] for r in decode_dataset(dst, where=where).take_all())
    want = sorted(r["event_id"] for r in decode_dataset(src, where=where).take_all())
    assert got == want == list(range(1_000, 1_200))

    # default layout="files" keeps the reclustered artifact fully
    # MUTABLE: a targeted delete works on it directly
    from parquetjs_ray.pipelines.encode import delete_rows

    rep2 = delete_rows(dst, [("event_id", ">=", 1_000), ("event_id", "<", 1_200)])
    assert rep2["rows_deleted"] == 200, rep2
    assert decode_dataset(dst, where=where).count() == 0
    assert decode_dataset(dst).count() == 3_800


def test_validate_artifact_check_constraints(ray_session, tmp_path):
    """CHECK-constraint validation: satisfied rules report zero
    violations, violated ones exact counts, and a rule over a column
    with nulls counts the nulls as failures (SQL CHECK semantics)."""
    from parquetjs_ray.pipelines.encode import encode_dataset, upsert_rows, validate_artifact

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = _events_fixture(indir, rows=2_000, n_shards=2)
    encode_dataset(paths, outdir, mode="files", target_rows_per_partition=500,
                   sample_rows=2_000, id_col="event_id", source_col=None)
    rep = validate_artifact(
        outdir,
        {
            "id_nonneg": [("event_id", ">=", 0)],
            "id_small": [("event_id", "<", 1_500)],
            "kind_known": [("kind", "in", ["click", "view", "buy"])],
        },
    )
    assert rep["rows"] == 2_000
    assert rep["violations"] == {"id_nonneg": 0, "id_small": 500, "kind_known": 0}
    assert rep["ok"] is False

    # schema-evolving upsert: rows predating the new column fail its CHECK
    up = pa.table(
        {
            "event_id": pa.array([10_001], pa.int64()),
            "ts": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
            "value": pa.array([0.0], pa.float64()),
            "kind": pa.array(["click"], pa.string()),
            "rev": pa.array([1], pa.int64()),
        }
    )
    upsert_rows(outdir, up, key="event_id")
    rep2 = validate_artifact(outdir, {"rev_set": [("rev", ">=", 0)]})
    assert rep2["rows"] == 2_001 and rep2["violations"]["rev_set"] == 2_000


def test_zorder_prunes_on_both_columns(ray_session, tmp_path):
    """Z-ORDER rewrite: after clustering by the interleaved quantile
    ranks of (event_id, value), range predicates on EITHER column prune
    substantially — which no single-column sort can give — and results
    stay exact."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquetjs_ray.pipelines.encode import (
        decode_dataset,
        encode_dataset,
        list_decode_units,
        zorder_dataset,
    )

    indir = str(tmp_path / "in")
    paths = _events_fixture(indir, rows=8_000, n_shards=2)
    shuffled = pa.concat_tables([pq.read_table(p) for p in paths])
    perm = np.random.default_rng(5).permutation(shuffled.num_rows)
    bad = os.path.join(indir, "shuffled.parquet")
    pq.write_table(shuffled.take(pa.array(perm)), bad)

    src = str(tmp_path / "src")
    encode_dataset(
        [bad], src, mode="files", target_rows_per_partition=500, sample_rows=8_000,
        id_col="event_id", source_col=None, unit_rows=500,
    )
    dst = str(tmp_path / "dst")
    rep = zorder_dataset(
        src, dst, by=["event_id", "value"], id_col="event_id",
        target_rows_per_partition=250, bits=8,
    )
    assert rep["rows"] == 8_000

    total = len(list_decode_units(dst))
    w_id = [("event_id", ">=", 2_000), ("event_id", "<", 2_400)]  # 5% band
    w_val = [("value", ">=", 1.6)]  # ~5.5% upper tail
    for where in (w_id, w_val):
        src_kept = len(list_decode_units(src, where=where))
        src_total = len(list_decode_units(src))
        assert src_kept > 0.7 * src_total  # shuffled layout: no pruning
        kept = len(list_decode_units(dst, where=where))
        assert kept < 0.6 * total, (where, kept, total)
        got = decode_dataset(dst, where=where).take_all()
        from parquetjs_ray.pipelines.encode import _where_mask

        want = shuffled.filter(_where_mask(shuffled, where))
        assert sorted(r["event_id"] for r in got) == sorted(want["event_id"].to_pylist())


def test_table_changes_cdc_feed(ray_session, tmp_path):
    """table_changes between snapshots: pure deletes show only the
    deleted rows (a rewrite's survivors cancel), an upsert shows old
    versions as deletes and new versions as inserts, and spans compose
    across multiple versions."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquetjs_ray.pipelines.changes import table_changes
    from parquetjs_ray.pipelines.encode import delete_rows, encode_dataset, upsert_rows
    from parquetjs_ray.stages.writer import list_snapshots

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 1_000, n_shards=2)
    encode_dataset(paths, outdir, mode="files", target_rows_per_partition=200, sample_rows=1_000)
    orig = pa.concat_tables([pq.read_table(p) for p in paths])
    v1 = list_snapshots(outdir)[-1]

    # v2: delete a band of rows (rewrites fragments; survivors must cancel)
    lo, hi = 400, 500  # n_tok is lognormal around 512: decent mass here
    rep = delete_rows(outdir, [("n_tok", ">=", lo), ("n_tok", "<", hi)])
    assert rep["rows_deleted"] > 0
    v2 = list_snapshots(outdir)[-1]
    feed = pa.concat_tables(
        [pa.Table.from_pylist(table_changes(outdir, v1, v2).take_all())]
    )
    assert set(feed["_change_type"].to_pylist()) == {"delete"}
    assert feed.num_rows == rep["rows_deleted"]
    want_deleted = orig.filter(
        pc.and_(pc.greater_equal(orig["n_tok"], lo), pc.less(orig["n_tok"], hi))
    )
    assert sorted(feed["doc_id"].to_pylist()) == sorted(want_deleted["doc_id"].to_pylist())

    # v3: upsert 3 existing keys → 3 deletes (old versions) + 3 inserts
    keys = sorted(set(orig["doc_id"].to_pylist()) - set(want_deleted["doc_id"].to_pylist()))[:3]
    up = pa.table(
        {
            "doc_id": pa.array(keys, pa.string()),
            "tokens": pa.array([[1, 2]] * 3, pa.list_(pa.int32())),
            "n_tok": pa.array([2] * 3, pa.int32()),
            "source": pa.array(["cdc"] * 3, pa.string()),
        }
    )
    upsert_rows(outdir, up, key="doc_id")
    v3 = list_snapshots(outdir)[-1]
    feed2 = pa.Table.from_pylist(table_changes(outdir, v2, v3).take_all())
    ins = feed2.filter(pc.equal(feed2["_change_type"], "insert"))
    dels = feed2.filter(pc.equal(feed2["_change_type"], "delete"))
    assert sorted(ins["doc_id"].to_pylist()) == keys
    assert sorted(dels["doc_id"].to_pylist()) == keys
    assert set(ins["source"].to_pylist()) == {"cdc"}
    assert "cdc" not in set(dels["source"].to_pylist())

    # composed span v1 → v3: band deletes + upsert old-versions as
    # deletes, upsert new-versions as inserts
    feed3 = pa.Table.from_pylist(table_changes(outdir, v1, v3).take_all())
    dels3 = feed3.filter(pc.equal(feed3["_change_type"], "delete"))
    ins3 = feed3.filter(pc.equal(feed3["_change_type"], "insert"))
    assert sorted(ins3["doc_id"].to_pylist()) == keys
    assert sorted(dels3["doc_id"].to_pylist()) == sorted(
        want_deleted["doc_id"].to_pylist() + keys
    )

    # identical versions → empty feed
    assert table_changes(outdir, v3, v3).count() == 0


def test_in_predicate_pruning_and_exactness(ray_session, tmp_path):
    """(col, 'in', values): zones admit when ANY value intersects, blooms
    admit when ANY value hits, the residual is pc.is_in — exact against
    the raw table; scattered int probes prune to ~per-value fragments."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset, list_decode_units

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = _events_fixture(indir, rows=3_000, n_shards=3)
    encode_dataset(
        paths, outdir, mode="files", target_rows_per_partition=300, sample_rows=3_000,
        id_col="event_id", source_col=None, unit_rows=250, bloom_columns=["kind"],
    )
    orig = pa.concat_tables([pq.read_table(p) for p in paths])
    total = len(list_decode_units(outdir))

    # int IN over zone-mapped ids: widely scattered probes, narrow zones
    ids = [5, 1_499, 2_777]
    got = sorted(r["event_id"] for r in decode_dataset(outdir, where=[("event_id", "in", ids)]).take_all())
    assert got == ids
    kept = len(list_decode_units(outdir, where=[("event_id", "in", ids)]))
    assert 0 < kept <= max(len(ids), total // 3), (kept, total)

    # string IN over a bloom column (+ a conjunction with a range clause)
    where = [("kind", "in", ["buy", "nope"]), ("event_id", "<", 500)]
    got2 = sorted(r["event_id"] for r in decode_dataset(outdir, where=where).take_all())
    want2 = sorted(
        orig.filter(pc.and_(pc.is_in(orig["kind"], value_set=pa.array(["buy", "nope"])),
                            pc.less(orig["event_id"], 500)))["event_id"].to_pylist()
    )
    assert got2 == want2 and len(got2) > 0

    # all-absent IN: nothing decoded, ~nothing scanned
    assert decode_dataset(outdir, where=[("kind", "in", ["zz", "yy"])]).count() == 0
    assert len(list_decode_units(outdir, where=[("kind", "in", ["zz", "yy"])])) <= 2

    # malformed operand raises
    with pytest.raises(ValueError):
        decode_dataset(outdir, where=[("kind", "in", "buy")])


def test_vacuum_removes_only_orphans(ray_session, tmp_path):
    """vacuum drops crash remnants (.tmp spills, markerless chunks,
    unreferenced commits) and nothing else; the artifact still verifies
    and a second pass is a no-op."""
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset, vacuum
    from parquetjs_ray.pipelines.verify import verify_roundtrip

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = _events_fixture(indir, rows=2_000, n_shards=2)
    encode_dataset(
        paths, outdir, mode="files", target_rows_per_partition=400, sample_rows=2_000,
        id_col="event_id", source_col=None,
    )
    pdir = sorted(glob.glob(os.path.join(outdir, "part-*")))[0]
    legit = {f for f in os.listdir(pdir)}
    # plant crash remnants: a temp spill, a markerless chunk, and a
    # committed-but-unreferenced fragment pair
    open(os.path.join(pdir, ".tmp-deadbeef"), "wb").write(b"x" * 100)
    open(os.path.join(pdir, "frag-deadbeef00000001.bin"), "wb").write(b"y" * 100)
    open(os.path.join(pdir, "frag-deadbeef00000002.bin"), "wb").write(b"z" * 100)
    import json as _json

    with open(os.path.join(pdir, "frag-deadbeef00000002.json"), "w") as f:
        _json.dump({"fragment": "deadbeef00000002", "rows": 1, "raw_bytes": 1, "enc_bytes": 1, "columns": {}}, f)

    rep = vacuum(outdir)
    assert rep["removed_files"] == 4 and rep["reclaimed_bytes"] >= 300, rep
    assert set(os.listdir(pdir)) == legit
    v = verify_roundtrip(rd.read_parquet(paths), decode_dataset(outdir))
    assert v["equal"]
    rep2 = vacuum(outdir)
    assert rep2["removed_files"] == 0 and rep2["reclaimed_bytes"] == 0

    # a whole partition no manifest knows (an upsert that crashed before
    # its commit) is swept too — snapshots can't reference it either
    orphan = os.path.join(outdir, "part-udeadbeefdeadbeef")
    os.makedirs(orphan)
    open(os.path.join(orphan, "frag-000000.bin"), "wb").write(b"o" * 50)
    with open(os.path.join(orphan, "frag-000000.json"), "w") as f:
        _json.dump({"fragment": "000000", "rows": 1, "raw_bytes": 1, "enc_bytes": 1, "columns": {}}, f)
    rep3 = vacuum(outdir)
    assert rep3["removed_files"] == 2, rep3
    assert os.listdir(orphan) == []  # only the (harmless) empty dir remains
    assert verify_roundtrip(rd.read_parquet(paths), decode_dataset(outdir))["equal"]


def test_snapshot_time_travel(ray_session, tmp_path):
    """Every manifest rebuild archives a snapshot; decode_dataset(
    version=) reads the artifact as of that version — across appends AND
    deletes (tombstones keep the prior chunk + manifest) — until vacuum
    prunes old snapshots and the chunks only they referenced."""
    import pyarrow.parquet as pq

    from parquetjs_ray.pipelines.encode import decode_dataset, delete_rows, encode_dataset, vacuum
    from parquetjs_ray.stages.writer import list_snapshots

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = _events_fixture(indir, rows=2_000, n_shards=2)
    kw = dict(mode="files", target_rows_per_partition=400, sample_rows=2_000,
              id_col="event_id", source_col=None)

    encode_dataset([paths[0]], outdir, **kw)
    assert list_snapshots(outdir) == [1]
    encode_dataset(paths, outdir, **kw)  # append shard 2
    assert list_snapshots(outdir) == [1, 2]
    # a no-op resume rerun does NOT mint a new version
    encode_dataset(paths, outdir, **kw)
    assert list_snapshots(outdir) == [1, 2]

    delete_rows(outdir, [("event_id", "<", 100)])
    assert list_snapshots(outdir) == [1, 2, 3]

    n_shard1 = pq.read_metadata(paths[0]).num_rows
    assert decode_dataset(outdir, version=1).count() == n_shard1
    assert decode_dataset(outdir, version=2).count() == 2_000
    assert decode_dataset(outdir, version=3).count() == 1_900
    assert decode_dataset(outdir).count() == 1_900
    # v2 still contains the rows v3 deleted (prior manifests + chunks)
    got_v2 = sorted(r["event_id"] for r in
                    decode_dataset(outdir, version=2, where=[("event_id", "<", 100)]).take_all())
    assert got_v2 == list(range(100))

    # retention: keep only the latest snapshot → old chunks reclaimed,
    # old versions refuse cleanly, current reads unaffected
    rep = vacuum(outdir, keep_snapshots=1)
    assert rep["snapshots_pruned"] == 2 and rep["snapshots_kept"] == [3]
    assert rep["removed_files"] > 0
    assert decode_dataset(outdir).count() == 1_900
    with pytest.raises(FileNotFoundError, match="snapshot 2"):
        decode_dataset(outdir, version=2).count()


def test_upsert_same_keys_twice_takes_newest_values(ray_session, tmp_path):
    """MERGE regression (round-3 advice, high): upserting the SAME key set
    twice with different values must keep the second values — the upsert
    partition id covers full row content, so the v2 batch can't alias the
    v1 partition and silently skip. Then re-upserting the ORIGINAL v1
    values (whose identical earlier fragment was tombstoned by the v2
    merge) must land too, not be skipped by the tombstone marker."""
    import ray

    import pyarrow.compute as pc

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset, upsert_rows

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 500, n_shards=1)
    encode_dataset(paths, outdir, mode="files", target_rows_per_partition=250, sample_rows=500)
    base = decode_dataset(outdir).take_all()
    keys = sorted({r["doc_id"] for r in base})[:3]

    def patch(marker: int) -> pa.Table:
        return pa.table({
            "doc_id": pa.array(keys, pa.string()),
            "tokens": pa.array([[marker, marker]] * len(keys), pa.list_(pa.int32())),
            "n_tok": pa.array([2] * len(keys), pa.int32()),
            "source": pa.array([f"v{marker}"] * len(keys), pa.string()),
        })

    rep1 = upsert_rows(outdir, patch(1), key="doc_id")
    assert rep1["rows_updated"] == 3 and rep1["rows_inserted"] == 0, rep1

    # same keys, NEW values: must replace v1, not no-op
    rep2 = upsert_rows(outdir, patch(2), key="doc_id")
    assert rep2["rows_updated"] == 3 and rep2["rows_inserted"] == 0, rep2
    got = pa.concat_tables(ray.get(decode_dataset(outdir).to_arrow_refs()))
    assert got.num_rows == 500
    hit = got.filter(pc.is_in(got["doc_id"], pa.array(keys)))
    assert sorted(hit["source"].to_pylist()) == ["v2"] * 3
    assert hit["tokens"].to_pylist() == [[2, 2]] * 3

    # back to the v1 values: identical content to the (now tombstoned)
    # first merge — the tombstone must be resurrected, not treated as
    # "already committed"
    rep3 = upsert_rows(outdir, patch(1), key="doc_id")
    assert rep3["rows_updated"] == 3, rep3
    got3 = pa.concat_tables(ray.get(decode_dataset(outdir).to_arrow_refs()))
    assert got3.num_rows == 500
    assert len(set(got3["doc_id"].to_pylist())) == 500  # one version per key
    hit3 = got3.filter(pc.is_in(got3["doc_id"], pa.array(keys)))
    assert sorted(hit3["source"].to_pylist()) == ["v1"] * 3
    assert hit3["tokens"].to_pylist() == [[1, 1]] * 3


def test_compaction_preserves_snapshot_reads(ray_session, tmp_path):
    """Compaction must not break time travel (round-3 advice, medium):
    fragments a kept snapshot still references survive compaction and
    old versions keep decoding; vacuum's retention later reclaims them
    once their snapshots are pruned."""
    import pyarrow.parquet as pq

    from parquetjs_ray.pipelines.encode import (
        compact_dataset, decode_dataset, delete_rows, encode_dataset, vacuum,
    )
    from parquetjs_ray.stages.writer import list_snapshots

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 1_000, n_shards=2)
    encode_dataset([paths[0]], outdir, mode="files", target_rows_per_partition=200, sample_rows=500)
    encode_dataset(paths, outdir, mode="files", target_rows_per_partition=200, sample_rows=500)
    n_shard1 = pq.read_metadata(paths[0]).num_rows
    assert list_snapshots(outdir) == [1, 2]

    rep = compact_dataset(outdir)
    assert rep["n_compacted"] > 0
    # both pre-compaction versions still decode from the retained frags
    assert decode_dataset(outdir, version=1).count() == n_shard1
    assert decode_dataset(outdir, version=2).count() == 1_000
    assert decode_dataset(outdir).count() == 1_000
    frag_bins = glob.glob(os.path.join(outdir, "part-*", "frag-*.bin"))
    assert frag_bins  # snapshot-referenced fragments kept on disk

    # retention: prune all but the newest snapshot → the leftover frag
    # files inside consolidated partitions get reclaimed
    vrep = vacuum(outdir, keep_snapshots=1)
    assert vrep["removed_files"] > 0
    assert decode_dataset(outdir).count() == 1_000
    assert glob.glob(os.path.join(outdir, "part-*", "frag-*.bin")) == []
    with pytest.raises(FileNotFoundError, match="snapshot 1"):
        decode_dataset(outdir, version=1).count()


def test_bloom_on_non_utf8_binary_column():
    """Bloom filters over binary columns hash the raw bytes (round-3
    advice: a cast to string UTF-8-validates and raised ArrowInvalid on
    arbitrary payloads). bytes operands probe the same domain, and a
    bytes operand equal to a string's UTF-8 encoding matches it."""
    from parquetjs_ray.stages.bloom import bloom_admits, build_bloom, column_hash

    payloads = [bytes([i, 0xFF, 0xFE, i ^ 0x80]) for i in range(200)]  # non-UTF8
    arr = pa.array(payloads, pa.binary())
    h, tag = column_hash(arr)  # must not raise
    bloom = build_bloom(h, tag)
    assert all(bloom_admits(bloom, p) for p in payloads)
    absent = sum(bloom_admits(bloom, bytes([7, i % 251, 0xFD, 99])) for i in range(1_000))
    assert absent < 100  # real pruning, not admit-everything

    # large_binary goes through the same path
    h2, tag2 = column_hash(pa.array(payloads, pa.large_binary()))
    assert (h2 == h).all() and tag2 == tag

    # cross-domain: bytes operand vs string column (and vice versa) hash
    # by content, so b"alpha" finds "alpha"
    hs, ts = column_hash(pa.array(["alpha", "beta"], pa.string()))
    bs = build_bloom(hs, ts)
    assert bloom_admits(bs, b"alpha") and bloom_admits(bs, "alpha")


def test_row_hashes_nested_vectorized_no_python_fallback():
    """Nested production types (list<string>, struct, struct-in-list,
    map, fixed_size_list) hash through the vectorized recursive kernel —
    the per-row repr fallback is never reached — and the hashes stay
    batch-composition-independent and null-sensitive at every level."""
    from parquetjs_ray.pipelines import verify as V

    tbl = pa.table(
        {
            "tags": pa.array([["a", "bb"], [], None, ["ccc", None, "d"], ["a"], ["zz"]],
                             pa.list_(pa.string())),
            "meta": pa.array(
                [{"x": 1, "s": "u"}, {"x": None, "s": "v"}, None,
                 {"x": 4, "s": None}, {"x": 5, "s": "y"}, {"x": 6, "s": "z"}],
                pa.struct([("x", pa.int64()), ("s", pa.string())]),
            ),
            "pairs": pa.array(
                [[{"name": "a", "price": 1.5}], [], [{"name": None, "price": None}],
                 [{"name": "b", "price": 2.0}, {"name": "c", "price": 3.0}], None, []],
                pa.list_(pa.struct([("name", pa.string()), ("price", pa.float64())])),
            ),
            "fsl": pa.array([[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12]],
                            pa.list_(pa.int32(), 2)),
        }
    )
    before = V._REPR_FALLBACK_CALLS
    a = V.row_hashes(tbl)
    b = np.concatenate([V.row_hashes(tbl.slice(i, 1)) for i in range(6)])
    c = np.concatenate([V.row_hashes(tbl.slice(0, 2)), V.row_hashes(tbl.slice(2, 4))])
    assert np.array_equal(a, b) and np.array_equal(a, c)
    assert len(set(a.tolist())) == 6  # distinct rows -> distinct hashes
    assert V._REPR_FALLBACK_CALLS == before  # no per-row Python anywhere

    # null sensitivity inside composites: null item != empty != value
    t1 = pa.table({"tags": pa.array([["a", None]], pa.list_(pa.string()))})
    t2 = pa.table({"tags": pa.array([["a", ""]], pa.list_(pa.string()))})
    t3 = pa.table({"tags": pa.array([["a"]], pa.list_(pa.string()))})
    hs = {int(V.row_hashes(t)[0]) for t in (t1, t2, t3)}
    assert len(hs) == 3

    # struct field null vs zero
    s1 = pa.table({"m": pa.array([{"x": 0}], pa.struct([("x", pa.int64())]))})
    s2 = pa.table({"m": pa.array([{"x": None}], pa.struct([("x", pa.int64())]))})
    assert int(V.row_hashes(s1)[0]) != int(V.row_hashes(s2)[0])

    # the fruits fixture (the reference's nested integration shape) also
    # avoids the fallback entirely
    from parquetjs_ray.sources.synth import fruits_table

    fr = fruits_table(repeats=10)
    before = V._REPR_FALLBACK_CALLS
    fa = V.row_hashes(fr)
    fb = np.concatenate([V.row_hashes(fr.slice(i, 5)) for i in range(0, fr.num_rows, 5)])
    assert np.array_equal(fa, fb)
    assert V._REPR_FALLBACK_CALLS == before


def test_encode_roundtrip_float_list_bitexact(ray_session, tmp_path):
    """list<float32> payload (the embeddings shape) survives encode →
    decode BIT-exact — the lossless float-path guarantee the
    encode_roundtrip_embeddings driver query relies on."""
    import pyarrow.parquet as pq

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset

    rng = np.random.default_rng(3)
    n, dim = 800, 24
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    # adversarial float payloads: denormals, signed zeros, inf, NaN
    vecs[0, :4] = [np.float32(1e-42), np.float32(-0.0), np.inf, -np.inf]
    vecs[1, 0] = np.nan
    lens = rng.integers(1, dim + 1, size=n)
    lens[2] = 0  # an empty list row
    flat = np.concatenate([vecs[i, : lens[i]] for i in range(n)])
    offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.ListArray.from_arrays(pa.array(offs), pa.array(flat)),
            "label": pa.array(rng.integers(0, 9, size=n).astype(np.int32)),
        }
    )
    src = str(tmp_path / "emb.parquet")
    pq.write_table(tbl, src)
    outdir = str(tmp_path / "art")
    encode_dataset(
        [src], outdir, mode="files", target_rows_per_partition=200,
        sample_rows=2_000, id_col="vec_id", source_col=None,
    )
    import ray

    back = pa.concat_tables(
        [ray.get(r) for r in decode_dataset(outdir).to_arrow_refs()]
    ).select(tbl.column_names).sort_by("vec_id").combine_chunks()
    assert back.num_rows == n
    o, b = tbl["embedding"].combine_chunks(), back["embedding"].combine_chunks()
    assert np.array_equal(np.asarray(o.offsets), np.asarray(b.offsets))
    assert np.array_equal(
        np.asarray(o.values).view(np.uint32), np.asarray(b.values).view(np.uint32)
    )  # bitwise: NaN payloads, signed zeros, denormals all preserved
    assert np.array_equal(np.asarray(tbl["label"]), np.asarray(back["label"]))
