"""Round-trip tests for the new lightweight codecs (dict+RLE, FOR+bitpack, FSST)."""

import numpy as np
import pyarrow as pa
import pytest

from parquetjs_ray.codecs import dictionary, fornum, fsst


def test_for_roundtrip_basic():
    vals = np.array([1000, 1001, 1007, 1000, 1000, 1000, 1000, 1000, 1000, 1000, 1003], dtype=np.int64)
    buf, params = fornum.encode(vals)
    assert params["ref"] == 1000 and params["width"] == 3
    got = fornum.decode(buf, params)
    assert got.tolist() == vals.tolist()


@pytest.mark.parametrize("seed", range(4))
def test_for_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    lo = int(rng.integers(-(10**9), 10**9))
    span = int(rng.integers(1, 1 << 20))
    vals = rng.integers(lo, lo + span, 5000).astype(np.int64)
    buf, params = fornum.encode(vals)
    assert fornum.decode(buf, params).tolist() == vals.tolist()


def test_for_negative_and_empty():
    vals = np.array([-5, -3, -5, -5, -5, -5, -5, -5, -5, -4], dtype=np.int32)
    buf, params = fornum.encode(vals)
    assert fornum.decode(buf, params, dtype=np.int32).tolist() == vals.tolist()
    buf, params = fornum.encode(np.array([], dtype=np.int64))
    assert fornum.decode(buf, params).tolist() == []


def test_dict_local_roundtrip():
    arr = pa.array(["wiki", "cc", "cc", "code", "wiki", "cc"] * 50)
    idx_buf, dict_buf, params = dictionary.encode_local(arr)
    assert params["card"] == 3
    got = dictionary.decode_local(idx_buf, dict_buf, params)
    assert got.to_pylist() == arr.to_pylist()


def test_dict_global_roundtrip():
    dict_vals = pa.array(["cc", "wiki", "code", "books"])
    arr = pa.array(["books", "cc", "cc", "wiki"] * 100)
    idx_buf, params = dictionary.encode_global(arr, dict_vals)
    got = dictionary.decode_global(idx_buf, dict_vals, params)
    assert got.to_pylist() == arr.to_pylist()


def test_dict_global_unseen_raises():
    with pytest.raises(ValueError):
        dictionary.encode_global(pa.array(["nope"]), pa.array(["cc"]))


def _str_arrays(strings):
    data = b"".join(strings)
    lens = [len(s) for s in strings]
    offsets = np.zeros(len(strings) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    return np.frombuffer(data, dtype=np.uint8), offsets


def test_fsst_roundtrip_templated():
    strings = [f"src{i % 20:02d}/doc{i:012d}".encode() for i in range(500)]
    table = fsst.train(strings[:100])
    data, offsets = _str_arrays(strings)
    codes, code_offs = fsst.encode(table, data, offsets)
    out_data, out_offs = fsst.decode(table, codes, code_offs)
    assert out_data == data.tobytes()
    assert out_offs.tolist() == offsets.tolist()
    # templated ids must actually compress
    assert len(codes) < 0.6 * len(data)


def test_fsst_empty_table_and_escapes():
    table = fsst.FsstTable([])
    strings = [b"abc", b"", bytes([0xFF, 0xFF, 0x00]), b"x"]
    data, offsets = _str_arrays(strings)
    codes, code_offs = fsst.encode(table, data, offsets)
    out_data, out_offs = fsst.decode(table, codes, code_offs)
    assert out_data == data.tobytes()
    assert out_offs.tolist() == offsets.tolist()


def test_fsst_escape_byte_in_data_with_table():
    strings = [b"hello\xffworld", b"\xff\xff\xff", b"hello hello"]
    table = fsst.train([b"hello world hello"] * 10)
    data, offsets = _str_arrays(strings)
    codes, code_offs = fsst.encode(table, data, offsets)
    out_data, out_offs = fsst.decode(table, codes, code_offs)
    assert out_data == data.tobytes()
    assert out_offs.tolist() == offsets.tolist()


def test_fsst_serialize_roundtrip():
    table = fsst.train([b"abcabcabc", b"abcdefabcdef"] * 20)
    blob = table.serialize()
    table2 = fsst.FsstTable.deserialize(blob)
    assert table2.symbols == table.symbols


@pytest.mark.parametrize("seed", range(3))
def test_fsst_random_binary(seed):
    rng = np.random.default_rng(seed)
    strings = [bytes(rng.integers(0, 256, int(rng.integers(0, 40))).astype(np.uint8)) for _ in range(200)]
    table = fsst.train(strings[:50])
    data, offsets = _str_arrays(strings)
    codes, code_offs = fsst.encode(table, data, offsets)
    out_data, out_offs = fsst.decode(table, codes, code_offs)
    assert out_data == data.tobytes()
    assert out_offs.tolist() == offsets.tolist()


# ───────────────────────── vpack ─────────────────────────


def _vpack_roundtrip(vals, dtype=np.int64):
    from parquetjs_ray.codecs import vpack

    bufs, params = vpack.encode(np.asarray(vals, dtype=dtype))
    got = vpack.decode(bufs, params, dtype=dtype)
    assert got.dtype == np.dtype(dtype)
    assert got.tolist() == np.asarray(vals, dtype=dtype).tolist()
    return bufs, params


def test_vpack_roundtrip_zipf_beats_pfor():
    from parquetjs_ray.codecs import pfor, vpack

    rng = np.random.default_rng(3)
    pmf = np.arange(1, 50258, dtype=np.float64) ** (-1.3)
    cdf = np.cumsum(pmf / pmf.sum())
    vals = (np.searchsorted(cdf, rng.random(100_000)) + 1).astype(np.int32)
    bufs, params = _vpack_roundtrip(vals, np.int32)
    vp_bytes = sum(len(b) for b in bufs.values())
    pf_bufs, _ = pfor.encode(vals)
    pf_bytes = sum(len(b) for b in pf_bufs.values())
    assert vp_bytes < 0.75 * pf_bytes, (vp_bytes, pf_bytes)
    assert sorted(params["widths"]) == params["widths"] and len(params["widths"]) == 4


@pytest.mark.parametrize(
    "vals,dtype",
    [
        ([], np.int64),
        ([7], np.int32),
        ([5, 5, 5, 5], np.int64),
        ([-1000, -999, 3, 1 << 40], np.int64),
        (list(range(300)) + [1 << 20] * 3, np.int32),
        ([0, 1, 2**63 - 1, 2**64 - 1], np.uint64),  # ref + residual at full width
    ],
)
def test_vpack_roundtrip_edges(vals, dtype):
    _vpack_roundtrip(vals, dtype)


@pytest.mark.parametrize("seed", range(3))
def test_vpack_roundtrip_random_mixed(seed):
    rng = np.random.default_rng(seed)
    vals = np.concatenate(
        [
            rng.integers(0, 50, 5_000),
            rng.integers(0, 1 << 16, 1_000),
            rng.integers(0, 1 << 30, 50),
            np.repeat(rng.integers(0, 100, 10), 100),
        ]
    ).astype(np.int64)
    rng.shuffle(vals)
    _vpack_roundtrip(vals, np.int64)


def test_vpack_golden_bytes():
    """Pin the stream layout: 2-bit LSB-first selector + per-class
    LSB-first packed residuals (same bit order as the reference's RLE
    bit-packing, test/codec_rle.js style golden)."""
    from parquetjs_ray.codecs import vpack

    vals = np.array([10, 11, 10, 12, 18, 74, 10, 11], dtype=np.int64)
    bufs, params = vpack.encode(vals)
    assert params["ref"] == 10 and params["count"] == 8
    # residuals 0,1,0,2,8,64,0,1 → bitlens 0,1,0,2,4,7,0,1; classes for
    # widths [1,2,4,7] → sel 0,0,0,1,2,3,0,0
    assert params["widths"] == [1, 2, 4, 7]
    assert params["class_counts"] == [5, 1, 1, 1]
    assert params["layouts"] == ["bits", "bits", "bits", "words"]
    assert bufs["sel"].hex() == "400e"  # 2-bit LSB-first: 0,0,0,1 | 2,3,0,0
    assert bufs["c0"].hex() == "12"  # 1-bit LSB-first: 0,1,0,0,1 → 0b10010
    assert bufs["c1"].hex() == "02"  # 2-bit: 2
    assert bufs["c2"].hex() == "08"  # 4-bit: 8
    assert bufs["c3"].hex() == "4000000000000000"  # 7-bit word layout: 64 in word 0
    got = vpack.decode(bufs, params)
    assert got.tolist() == vals.tolist()


def test_int_stream_selector_picks_vpack_on_zipf():
    from parquetjs_ray.stages.encoder import _ChunkBuilder, encode_int_stream

    rng = np.random.default_rng(9)
    pmf = np.arange(1, 50258, dtype=np.float64) ** (-1.3)
    cdf = np.cumsum(pmf / pmf.sum())
    vals = (np.searchsorted(cdf, rng.random(50_000)) + 1).astype(np.int32)
    cb = _ChunkBuilder()
    codec, segs, params = encode_int_stream(vals, cb)
    assert codec == "vpack"
    assert set(params["estimates"]) == {"for_upper", "pfor", "vpack"}
    # run-heavy data still routes to the RLE hybrid
    runs = np.repeat(rng.integers(0, 1000, 100), 200).astype(np.int32)
    cb2 = _ChunkBuilder()
    codec2, _, _ = encode_int_stream(runs, cb2)
    assert codec2 == "for_rle"


def test_delta_codec_selected_on_monotone_streams():
    """Monotone int streams (timestamps, auto-increment ids) must select
    the delta tier and round-trip exactly — including 64-bit wrap cases."""
    import numpy as np
    import pyarrow as pa

    from parquetjs_ray.stages.decoder import _decode_int_stream
    from parquetjs_ray.stages.encoder import EncoderState, _ChunkBuilder, encode_int_stream
    from parquetjs_ray.state.artifacts import EncodePlan

    state = EncoderState(EncodePlan())
    rng = np.random.default_rng(4)

    # ~1-minute event timestamps in µs: delta must engage and win big
    ts = np.cumsum(rng.integers(1, 120_000_000, 20_000)) + 1_700_000_000_000_000
    for dtype in (np.int64, np.uint64, np.int32):
        if dtype == np.int32:
            vals = np.cumsum(rng.integers(1, 1_000, 20_000)).astype(np.int32)
        else:
            vals = np.sort(ts.astype(dtype))
        cb = _ChunkBuilder()
        codec, segs, params = encode_int_stream(vals, cb)
        assert codec == "delta", (dtype, codec)
        chunk = memoryview(cb.chunk())
        out = _decode_int_stream(chunk, {"codec": codec, "segments": segs, "params": params}, dtype, state)
        assert out.dtype == np.dtype(dtype) and np.array_equal(out, vals)
        enc = sum(s[1] for s in segs.values())
        assert enc < 0.55 * vals.nbytes, (dtype, enc, vals.nbytes)  # actually compresses

    # uint64 values above 2^63 (wrap-exact arithmetic)
    big = np.sort(rng.integers(2**63, 2**64 - 2**40, 5_000, dtype=np.uint64))
    cb = _ChunkBuilder()
    codec, segs, params = encode_int_stream(big, cb)
    out = _decode_int_stream(memoryview(cb.chunk()), {"codec": codec, "segments": segs, "params": params}, np.uint64, state)
    assert np.array_equal(out, big)

    # NON-monotone data must NOT pick delta (Zipf ids)
    zipf = rng.integers(0, 50_000, 20_000).astype(np.int32)
    cb = _ChunkBuilder()
    codec, _, _ = encode_int_stream(zipf, cb)
    assert codec != "delta", codec
