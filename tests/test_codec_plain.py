"""PLAIN codec golden vectors, ported from /root/reference/test/codec_plain.js."""

import struct

import numpy as np
import pytest

from parquetjs_ray.codecs import plain


def test_boolean_golden():
    vals = [True, False, True, True, False, True, False, False]
    buf = plain.encode_boolean(np.array(vals))
    assert buf == bytes([0x2D])  # test/codec_plain.js:9-26, LSB-first
    assert plain.decode_boolean(buf, 8).tolist() == vals


@pytest.mark.parametrize(
    "type_name,fmt,vals",
    [
        ("INT32", "<8i", [42, 17, 23, -1, -2, -3, 9000, 420]),
        ("INT64", "<8q", [42, 17, 23, -1, -2, -3, 9000, 420]),
        ("FLOAT", "<5f", [42.0, 23.5, 17.0, 4.2, 9000.0]),
        ("DOUBLE", "<5d", [42.0, 23.5, 17.0, 4.2, 9000.0]),
    ],
)
def test_numeric_golden(type_name, fmt, vals):
    buf = plain.encode_numeric(np.array(vals), type_name)
    assert buf == struct.pack(fmt, *vals)  # test/codec_plain.js:28-199 (LE arrays)
    got = plain.decode_numeric(buf, type_name)
    np.testing.assert_allclose(got, vals, atol=0.01)  # ε per test/util/assert_util.js:5-16


def test_byte_array_golden():
    values = [b"one", bytes([0xDE, 0xAD, 0xBE, 0xEF]), b"three"]
    data = b"".join(values)
    offsets = np.array([0, 3, 7, 12], dtype=np.int64)
    buf = plain.encode_byte_array(np.frombuffer(data, dtype=np.uint8), offsets)
    expected = b"".join(struct.pack("<I", len(v)) + v for v in values)
    assert buf == expected  # test/codec_plain.js:201-236
    out_data, out_offsets = plain.decode_byte_array(buf, 3)
    assert out_data == data
    assert out_offsets.tolist() == offsets.tolist()


def test_fixed_golden():
    values = [b"oneoo", bytes([0xDE, 0xAD, 0xBE, 0xEF, 0x42]), b"three"]
    buf = plain.encode_fixed(b"".join(values), 5, 3)
    assert buf == b"".join(values)  # test/codec_plain.js:238-272
    assert plain.decode_fixed(buf, 5, 3) == b"".join(values)


def test_byte_array_nonzero_base_offset():
    # Arrow-sliced arrays start at offsets[0] != 0
    data = b"XXone-two"
    offsets = np.array([2, 5, 9], dtype=np.int64)
    buf = plain.encode_byte_array(np.frombuffer(data, dtype=np.uint8), offsets)
    out_data, out_offsets = plain.decode_byte_array(buf, 2)
    assert out_data == b"one-two"
    assert out_offsets.tolist() == [0, 3, 7]


def test_byte_array_empty_values():
    values = [b"", b"a", b"", b"bc", b""]
    data = b"".join(values)
    offsets = np.array([0, 0, 1, 1, 3, 3], dtype=np.int64)
    buf = plain.encode_byte_array(np.frombuffer(data, dtype=np.uint8), offsets)
    out_data, out_offsets = plain.decode_byte_array(buf, 5)
    assert out_data == data
    assert np.diff(out_offsets).tolist() == [0, 1, 0, 2, 0]
