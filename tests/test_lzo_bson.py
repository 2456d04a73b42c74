"""LZO1X bitstream codec + BSON logical type — the last two reference
compatibility gaps (`lib/compression.js:20-23` LZO, `lib/types.js:288-296`
BSON).

The LZO golden streams below are hand-assembled from the public format
description (Linux ``Documentation/lzo.txt``) so the decoder is pinned to
the *spec*, not merely to our own encoder."""

import datetime as dt
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquetjs_ray.codecs import bson, lzo

SF_DIR = "/root/testdata/sf0.01"


# ── LZO: spec-pinned golden streams ──────────────────────────────────────


def test_lzo_golden_literal_only():
    # first-byte 17+5=22 → copy 5 literals, then EOS (17, 0, 0)
    assert lzo.decompress(bytes([22]) + b"hello" + b"\x11\x00\x00") == b"hello"


def test_lzo_golden_short_first_run():
    # first byte 18..20: copy 1..3 literals, state = n < 4
    assert lzo.decompress(bytes([17 + 2]) + b"ab" + b"\x11\x00\x00") == b"ab"


def test_lzo_golden_m2_match():
    # literals "abcd" (first-byte 21), then M2 0 1 L D D D S S with
    # L=1 (len 4), distance 4 (d-1=3 → D=3, H=0), S=0 → "abcdabcd"
    stream = bytes([21]) + b"abcd" + bytes([0x40 | (1 << 5) | (3 << 2) | 0, 0]) + b"\x11\x00\x00"
    assert lzo.decompress(stream) == b"abcdabcd"


def test_lzo_golden_m4_long_match_overlap():
    # "ab" repeated: literals "abab", then M4 (0 0 1 L L L L L) length
    # 2+L=12, LE16 = ((dist-1)<<2)|S with dist=2 → overlapping copy
    stream = bytes([21]) + b"abab" + bytes([0x20 | 10, (1 << 2) | 0, 0]) + b"\x11\x00\x00"
    assert lzo.decompress(stream) == b"abab" + b"ab" * 6


def test_lzo_golden_state_dependent_opcodes():
    # After a long literal run (state=4), opcode 0..15 is a 3-byte match
    # at 2..3kB — exercised with 2100 literals then 0 0 0 0 D D S S.
    lits = bytes(range(256)) * 9  # 2304 literals
    run = lits[:2100]
    # literal run of 2100: code 0, ext: 2100-18 = 2082 = 255*8 + 42
    head = bytes([0x00] + [0] * 8 + [42]) + run
    # state==4 opcode: distance = (H << 2) + D + 2049; pick dist 2060:
    # 2060-2049 = 11 → H=2, D=3; S=0 → copies run[40:43]
    stream = head + bytes([(3 << 2) | 0, 2]) + b"\x11\x00\x00"
    assert lzo.decompress(stream) == run + run[2100 - 2060 : 2100 - 2060 + 3]


def test_lzo_golden_two_byte_match_state_1_3():
    # first byte 19 → copy 2 literals, state=2; opcode 0..15 is then a
    # 2-byte match ≤1kB: distance = (H << 2) + D + 1 = 2 (H=0, D=1)
    stream = bytes([19]) + b"xy" + bytes([(1 << 2) | 0, 0]) + b"\x11\x00\x00"
    assert lzo.decompress(stream) == b"xyxy"


def test_lzo_roundtrip_real_text():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    blob = "\n".join(t["text"].to_pylist()[:400]).encode()[:200_000]
    c = lzo.compress(blob)
    assert lzo.decompress(c, len(blob)) == blob
    assert len(c) < 0.6 * len(blob)  # compression actually happens


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        b"ab",
        b"abc",
        b"abcd",
        b"abcdefg",
        b"x" * 100_000,
        b"ab" * 40_000,
        b"abc" + b"abc" * 1000,
        random.Random(7).randbytes(50_000),  # incompressible
        bytes(range(256)) * 300,
    ],
)
def test_lzo_roundtrip_edges(data):
    assert lzo.decompress(lzo.compress(data), len(data)) == data


def test_lzo_truncated_stream_raises():
    c = lzo.compress(b"hello world, hello world, hello world")
    with pytest.raises(lzo.LzoError):
        lzo.decompress(c[:-3])  # EOS marker stripped
    with pytest.raises(lzo.LzoError):
        lzo.decompress(c, out_len=999)


def test_lzo_chunk_compression_end_to_end(ray_session, tmp_path):
    """encode_dataset(compression='lzo') round-trips and shrinks chunks."""
    import os

    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_dataset
    from parquetjs_ray.pipelines.verify import verify_roundtrip
    from parquetjs_ray.stages.writer import read_global_manifest

    from parquetjs_ray.sources.synth import write_synth

    indir, outdir = str(tmp_path / "in"), str(tmp_path / "out")
    paths = write_synth(indir, 1_000, n_shards=1)
    encode_dataset(
        paths, outdir, mode="files", target_rows_per_partition=500,
        sample_rows=1_000, compression="lzo",
    )
    gm = read_global_manifest(outdir)
    assert gm["partitions"][0]["enc_bytes"] > 0
    v = verify_roundtrip(rd.read_parquet(paths), decode_dataset(outdir))
    assert v["equal"]


# ── BSON ─────────────────────────────────────────────────────────────────


def test_bson_spec_golden_vectors():
    # both worked examples from bsonspec.org/faq.html
    g1 = b"\x16\x00\x00\x00\x02hello\x00\x06\x00\x00\x00world\x00\x00"
    assert bson.encode({"hello": "world"}) == g1
    assert bson.decode(g1) == {"hello": "world"}
    g2 = (
        b"1\x00\x00\x00\x04BSON\x00&\x00\x00\x00\x020\x00\x08\x00\x00\x00"
        b"awesome\x00\x011\x00333333\x14@\x102\x00\xc2\x07\x00\x00\x00\x00"
    )
    assert bson.encode({"BSON": ["awesome", 5.05, 1986]}) == g2
    assert bson.decode(g2) == {"BSON": ["awesome", 5.05, 1986]}


def test_bson_roundtrip_all_types():
    doc = {
        "f": 3.25,
        "s": "héllo",
        "sub": {"a": 1, "b": [True, None, "x"]},
        "arr": [1, 2.5, {"k": "v"}],
        "bin": b"\x00\xff\x7f",
        "flag": False,
        "ts": dt.datetime(2021, 6, 1, 12, 30, 45, tzinfo=dt.timezone.utc),
        "nil": None,
        "i32": -(2**31),
        "i64": 2**40,
    }
    assert bson.decode(bson.encode(doc)) == doc


def test_bson_int_width_selection():
    enc = bson.encode({"a": 1, "b": 2**31})
    assert enc[4:5] == b"\x10" and b"\x12" in enc  # int32 then int64
    with pytest.raises(bson.BsonError):
        bson.encode({"a": 2**70})


def test_bson_rejects_malformed():
    with pytest.raises(bson.BsonError):
        bson.decode(b"\x05\x00\x00\x00\x00" + b"junk")  # trailing bytes
    with pytest.raises(bson.BsonError):
        bson.decode(b"\xff\x00\x00\x00\x00")  # bad size
    with pytest.raises(bson.BsonError):
        bson.encode({"a\x00b": 1})  # NUL in element name


def test_bson_column_through_encode_pipeline(ray_session, tmp_path):
    """A BSON-bytes column flows through shred/encode/decode like any
    binary column and deserializes back to the original dicts — the
    logical-type storage contract (`lib/types.js:288-296`)."""
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_stream
    from parquetjs_ray.state.artifacts import EncodePlan

    docs = [
        {"id": i, "meta": {"tags": [f"t{i % 3}", None], "score": i / 7}}
        for i in range(50
        )
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(50), pa.int64()),
            "payload": bson.encode_column(docs),
        }
    )
    outdir = str(tmp_path / "out")
    encode_stream(rd.from_arrow(tbl), outdir, plan=EncodePlan())
    back = pa.Table.from_pylist(
        sorted(decode_dataset(outdir).take_all(), key=lambda r: r["doc_id"])
    )
    assert bson.decode_column(back["payload"].combine_chunks()) == docs


def test_lzo_corrupt_operands_raise_lzo_error_not_indexerror():
    """Every multi-byte operand read is bounds-checked: truncating a
    stream at ANY byte yields LzoError (the codec's error contract),
    never a raw IndexError (round-3 advice)."""
    samples = [
        lzo.compress(b"hello world, hello world, hello world"),
        lzo.compress(bytes(range(256)) * 8),
        lzo.compress(b"ababababab" * 50),
        b"\x13abc",  # first-byte literal run cut short
    ]
    for c in samples:
        for cut in range(len(c)):
            try:
                lzo.decompress(c[:cut])
            except lzo.LzoError:
                pass  # the only acceptable failure mode


def test_bson_corrupt_lengths_raise_bson_error_not_indexerror():
    """Corrupt inner lengths (string/binary sizes pointing past the
    buffer, truncated element operands) must raise BsonError."""
    good = bson.encode({"s": "hello", "i": 7, "b": b"\x01\x02\x03", "d": {"x": 1.5}})
    for cut in range(len(good)):
        try:
            bson.decode(good[:cut])
        except bson.BsonError:
            pass
    # string length larger than the document
    doc = bytearray(bson.encode({"s": "hi"}))
    doc[9:13] = (10_000).to_bytes(4, "little")  # s's length field
    with pytest.raises(bson.BsonError):
        bson.decode(bytes(doc))
