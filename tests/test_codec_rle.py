"""RLE/bit-pack hybrid golden vectors, ported from
/root/reference/test/codec_rle.js (see FIXTURES.md F2)."""

import numpy as np
import pytest

from parquetjs_ray.codecs import rle


GOLDENS = [
    # (values, bit_width, expected bytes)  — reference test/codec_rle.js:8-122
    ([0, 1, 2, 3, 4, 5, 6, 7], 3, bytes([0x03, 0x88, 0xC6, 0xFA])),
    ([0, 1, 2, 3, 4, 5, 6, 7, 6, 5], 3, bytes([0x05, 0x88, 0xC6, 0xFA, 0x2E, 0x00, 0x00])),
    ([42] * 8, 6, bytes([0x10, 0x2A])),
    (
        [0, 1, 2, 3, 4, 5, 6, 7, 4, 4, 4, 4, 4, 4, 4, 4, 0, 1, 2, 3, 4, 5, 6, 7],
        3,
        bytes([0x03, 0x88, 0xC6, 0xFA, 0x10, 0x04, 0x03, 0x88, 0xC6, 0xFA]),
    ),
]


@pytest.mark.parametrize("values,width,expected", GOLDENS)
def test_encode_golden(values, width, expected):
    assert rle.encode(np.array(values), width, disable_envelope=True) == expected


@pytest.mark.parametrize("values,width,expected", GOLDENS)
def test_decode_golden(values, width, expected):
    got = rle.decode(expected, len(values), width, disable_envelope=True)
    assert got.tolist() == values


def test_decode_repeated_with_mismatched_width():
    # reference test decodes the width-6 repeated run with bitWidth 3 (1 value byte)
    got = rle.decode(bytes([0x10, 0x2A]), 8, 3, disable_envelope=True)
    assert got.tolist() == [42] * 8


def test_envelope_roundtrip():
    vals = np.array([7, 7, 7, 7, 1, 2, 3, 4, 5, 6], dtype=np.uint64)
    buf = rle.encode(vals, 3)
    assert int.from_bytes(buf[:4], "little") == len(buf) - 4
    assert rle.decode(buf, len(vals), 3).tolist() == vals.tolist()


def test_multibyte_repeated_value():
    # documented divergence: reference corrupts width>8 repeated values; we don't
    vals = np.full(64, 70_000, dtype=np.uint64)
    buf = rle.encode(vals, 17, disable_envelope=True)
    assert rle.decode(buf, 64, 17, disable_envelope=True).tolist() == vals.tolist()


@pytest.mark.parametrize("seed", range(5))
def test_random_roundtrip(seed):
    rng = np.random.default_rng(seed)
    for width in (1, 2, 3, 7, 8, 13, 20, 32):
        n = int(rng.integers(0, 2000))
        style = seed % 3
        if style == 0:
            vals = rng.integers(0, 1 << width, n, dtype=np.uint64)
        elif style == 1:  # run-heavy
            base = rng.integers(0, 1 << width, max(1, n // 17 + 1), dtype=np.uint64)
            vals = np.repeat(base, 17)[:n]
        else:  # constant
            vals = np.full(n, (1 << width) - 1, dtype=np.uint64)
        buf = rle.encode(vals, width, disable_envelope=True)
        got = rle.decode(buf, n, width, disable_envelope=True)
        assert got.tolist() == vals.tolist(), (width, style)


def test_zero_width():
    vals = np.zeros(100, dtype=np.uint64)
    buf = rle.encode(vals, 0, disable_envelope=True)
    assert rle.decode(buf, 100, 0, disable_envelope=True).tolist() == [0] * 100
