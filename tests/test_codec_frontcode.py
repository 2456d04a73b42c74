"""Front-coding codec (sorted-dictionary prefix compression): golden
layout vector, round-trip properties, dictionary-page integration, and
the e2e pipeline selection on a repeated-value string column."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from parquetjs_ray.codecs import dictionary, frontcode


def _pack(strings):
    data = b"".join(strings)
    offs = np.cumsum([0] + [len(s) for s in strings]).astype(np.int64)
    return np.frombuffer(data, np.uint8), offs


def _unpack(data, offs):
    b = data.tobytes()
    return [b[offs[i] : offs[i + 1]] for i in range(len(offs) - 1)]


def test_frontcode_golden_layout():
    data, offs = _pack([b"app", b"apple", b"apply", b"banana"])
    buf = frontcode.encode(data, offs)
    want = (
        struct.pack("<II", 4, 12)
        + np.array([0, 3, 4, 0], "<u2").tobytes()
        + np.array([3, 2, 1, 6], "<u2").tobytes()
        + b"appleybanana"
    )
    assert buf == want
    back, boffs = frontcode.decode(buf)
    assert _unpack(back, boffs) == [b"app", b"apple", b"apply", b"banana"]


def test_frontcode_roundtrip_properties():
    rng = np.random.default_rng(29)
    # sorted id-like strings with heavy shared prefixes + empties + dupe-free
    pools = [
        sorted({f"user_{i:06d}".encode() for i in rng.integers(0, 5000, 300)}),
        [b""],
        [b"", b"a", b"aa", b"aaa"],
        [],
        [b"x" * 200, b"x" * 200 + b"y"],
        sorted({bytes(rng.integers(0, 256, rng.integers(0, 30)).astype(np.uint8)) for _ in range(100)}),
    ]
    for strings in pools:
        data, offs = _pack(strings)
        buf = frontcode.encode(data, offs)
        back, boffs = frontcode.decode(buf)
        assert _unpack(back, boffs) == strings
    # unsorted input still round-trips (sortedness is a size contract)
    unsorted = [b"zebra", b"apple", b"zeal", b"apricot"]
    data, offs = _pack(unsorted)
    back, boffs = frontcode.decode(frontcode.encode(data, offs))
    assert _unpack(back, boffs) == unsorted


def test_frontcode_beats_plain_on_prefix_heavy_dict():
    strings = sorted(f"src_shard_{i:05d}".encode() for i in range(2000))
    data, offs = _pack(strings)
    buf = frontcode.encode(data, offs)
    plain_size = len(data) + 4 * len(strings)
    assert len(buf) < 0.6 * plain_size


def test_frontcode_rejects_oversize_string():
    data, offs = _pack([b"a" * 70000])
    with pytest.raises(ValueError):
        frontcode.encode(data, offs)


def test_encode_local_selects_front_and_roundtrips():
    rng = np.random.default_rng(31)
    vals = [f"user_{i:05d}" for i in range(400)]
    arr = pa.array([vals[i] for i in rng.integers(0, 400, 20_000)])
    idx_buf, dict_buf, params = dictionary.encode_local(arr)
    assert params["dict_fmt"] == "front"
    got = dictionary.decode_local(idx_buf, dict_buf, params)
    assert got.to_pylist() == arr.to_pylist()
    # plain page must stay available and larger
    idx_p, dict_p, params_p = dictionary.encode_local(arr, try_front=False)
    assert params_p["dict_fmt"] == "plain"
    assert len(dict_buf) < len(dict_p)
    assert dictionary.decode_local(idx_p, dict_p, params_p).to_pylist() == arr.to_pylist()


def test_decode_local_backcompat_params_without_fmt():
    """Artifacts written before the front-page format carry no dict_fmt
    key — they must keep decoding as PLAIN pages."""
    arr = pa.array(["b", "a", "b", "c"] * 50)
    idx_buf, dict_buf, params = dictionary.encode_local(arr, try_front=False)
    legacy = {k: v for k, v in params.items() if k != "dict_fmt"}
    assert dictionary.decode_local(idx_buf, dict_buf, legacy).to_pylist() == arr.to_pylist()


def test_e2e_dict_local_selected_and_roundtrips(ray_session, tmp_path):
    """A low-cardinality prefix-heavy string column (the lang/domain
    shape) must select the local front-coded dictionary in the real
    pipeline and round-trip bit-exact."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from parquetjs_ray import storage as st
    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquetjs_ray.pipelines.verify import verify_roundtrip
    from parquetjs_ray.stages.writer import read_global_manifest

    rng = np.random.default_rng(37)
    n = 6000
    langs = [f"lang_variant_{i:03d}" for i in range(40)]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype="int64")),
            # source rides the global dictionary; lang exercises the
            # per-chunk local front-coded page
            "source": pa.array([f"s{i % 3}" for i in range(n)]),
            "lang": pa.array([langs[i] for i in rng.integers(0, 40, n)]),
        }
    )
    path = str(tmp_path / "langs.parquet")
    pq.write_table(tbl, path)
    outdir = str(tmp_path / "out")
    encode_dataset([path], outdir, mode="files", target_rows_per_partition=2_000, sample_rows=6_000)
    manifest = read_global_manifest(outdir)
    chose = False
    for part in manifest["partitions"]:
        pdir = st.join(outdir, f"part-{part['partition']}")
        for frag in st.list_names(pdir):
            if not frag.endswith(".json"):
                continue
            m = st.read_json(st.join(pdir, frag))
            cm = m.get("columns", {}).get("lang", {})
            if cm.get("codec") == "dict_local":
                chose = True
                assert cm["params"]["dict_fmt"] == "front"
    assert chose, "dict_local was never selected for the lang column"
    v = verify_roundtrip(rd.read_parquet(path), decode_dataset(outdir))
    assert v["equal"], v
