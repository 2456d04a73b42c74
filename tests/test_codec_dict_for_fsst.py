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
