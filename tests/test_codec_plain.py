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


def test_int96_golden_reference_vectors():
    """Byte-identical to the reference's PLAIN INT96 goldens
    (test/codec_plain.js:102-137); exact (not 53-bit-truncated) on our side."""
    import numpy as np

    from parquetjs_ray.codecs.plain import decode_int96, encode_int96

    vals = np.array([42, 17, 23, -1, -2, -3, 9000, 420], dtype=np.int64)
    golden = bytes.fromhex(
        "2a0000000000000000000000"
        "110000000000000000000000"
        "170000000000000000000000"
        "ffffffffffffffffffffffff"
        "feffffffffffffffffffffff"
        "fdffffffffffffffffffffff"
        "282300000000000000000000"
        "a40100000000000000000000"
    )
    buf = encode_int96(vals)
    assert buf == golden
    assert decode_int96(buf, 8).tolist() == vals.tolist()
    # beyond-53-bit exactness (the documented divergence from JS INT53)
    big = np.array([(1 << 62) + 12345, -(1 << 62) - 99], dtype=np.int64)
    assert decode_int96(encode_int96(big), 2).tolist() == big.tolist()


def test_interval_bytes_golden():
    """12-byte (months, days, millis) uint32-LE serialization matching the
    reference's toPrimitive_INTERVAL (lib/types.js:382-401)."""
    import numpy as np

    from parquetjs_ray.codecs.plain import interval_from_bytes, interval_to_bytes

    buf = interval_to_bytes(
        np.array([1, 13]), np.array([2, 28]), np.array([3, 86400000])
    )
    assert buf.hex() == "010000000200000003000000" + "0d0000001c000000005c2605"
    m, d, ms = interval_from_bytes(buf, 2)
    assert m.tolist() == [1, 13] and d.tolist() == [2, 28] and ms.tolist() == [3, 86400000]
