"""Shredding-path unit tests (Ray-free): nulls, nesting, full type surface.

Mirrors the reference's shred.js case matrix (`/root/reference/test/shred.js`):
flat/optional/repeated/nested-optional/nested-repeated — expressed as Arrow
round-trips through encode_table/decode_chunk."""

import numpy as np
import pyarrow as pa
import pytest

from parquetjs_ray.sources.synth import fruits_table
from parquetjs_ray.stages.decoder import decode_chunk
from parquetjs_ray.stages.encoder import EncoderState, encode_table
from parquetjs_ray.state.artifacts import EncodePlan


def _roundtrip(tbl: pa.Table) -> pa.Table:
    state = EncoderState(EncodePlan())
    chunk, man = encode_table(tbl, state)
    return decode_chunk(chunk, man, state).select(tbl.column_names)


def _assert_rt(tbl: pa.Table):
    back = _roundtrip(tbl)
    assert back.equals(tbl), f"\ngot:  {back.to_pylist()[:4]}\nwant: {tbl.to_pylist()[:4]}"


def test_optional_scalar_nulls():
    # dlevels [1,0,1] semantics (test/shred.js:74-110): nulls round-trip
    _assert_rt(pa.table({"q": pa.array([10, None, 30, None, None, 60], pa.int64())}))


def test_all_null_column():
    _assert_rt(pa.table({"q": pa.array([None] * 5, pa.int64())}))


def test_repeated_scalar():
    # rlevels [0,1,0,0] semantics (test/shred.js:112-151): lists incl. empty
    _assert_rt(pa.table({"c": pa.array([["a", "b"], [], ["c"], []], pa.list_(pa.string()))}))


def test_nested_optional_in_struct():
    _assert_rt(
        pa.table(
            {
                "s": pa.array(
                    [{"x": 1, "y": "a"}, {"x": None, "y": "b"}, None, {"x": 4, "y": None}],
                    pa.struct([("x", pa.int64()), ("y", pa.string())]),
                )
            }
        )
    )


def test_nested_repeated_struct_with_inner_list():
    t = pa.list_(pa.struct([("quantity", pa.list_(pa.int64())), ("warehouse", pa.string())]))
    _assert_rt(
        pa.table(
            {
                "stock": pa.array(
                    [
                        [{"quantity": [10], "warehouse": "A"}],
                        [],
                        [{"quantity": None, "warehouse": "X"}, {"quantity": [5, 6], "warehouse": "B"}],
                    ],
                    t,
                )
            }
        )
    )


@pytest.mark.parametrize(
    "arr",
    [
        pa.array([True, False, None, True], pa.bool_()),
        pa.array([1.5, -2.25, None, 3.75], pa.float64()),
        pa.array([1.5, -2.25, 3.75], pa.float32()),
        pa.array([18262, 18263, None], pa.date32()),
        pa.array([1_600_000_000_000_000, None, 2], pa.timestamp("us")),
        pa.array([b"AAAAA", b"BBBBB", b"CCCCC"], pa.binary(5)),
        pa.array([b"x", b"longer-binary", None], pa.binary()),
        pa.array([1, None, 3], pa.int32()),
        pa.array([None, "text", None, "more"], pa.string()),
    ],
)
def test_type_surface(arr):
    _assert_rt(pa.table({"c": arr}))


def test_fruits_full_fixture():
    # the reference integration schema, Arrow-expressible subset (F3)
    _assert_rt(fruits_table(repeats=25))


def test_nulls_inside_list_values():
    _assert_rt(pa.table({"l": pa.array([[1, None, 3], None, [], [None]], pa.list_(pa.int64()))}))


def test_compression_still_applies_on_shredded_ints():
    # date32 column with narrow range must come out much smaller than raw
    tbl = pa.table({"d": pa.array(([18262, 18263, 18264] * 1000), pa.date32())})
    state = EncoderState(EncodePlan())
    chunk, man = encode_table(tbl, state)
    assert man["enc_bytes"] < 0.2 * man["raw_bytes"]


_ALL_INT_TYPES = [
    pa.int8(), pa.int16(), pa.int32(), pa.int64(),
    pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64(),
]


@pytest.mark.parametrize("t", _ALL_INT_TYPES, ids=str)
def test_every_integer_dtype_roundtrips(t):
    # the encoder fast path accepts ANY null-free integer column; the
    # decoder must read every one of them back (reference supports
    # INT_8..UINT_64, lib/types.js) — regression for a uint32 KeyError
    info = np.iinfo(t.to_pandas_dtype())
    vals = [info.min, info.min + 1, 0 if info.min < 0 else info.min, info.max - 1, info.max] * 20
    _assert_rt(pa.table({"c": pa.array(vals, t)}))
    # and as list<t> via the list_int fast path
    lists = [vals[i : i + 3] for i in range(0, 60, 3)]
    _assert_rt(pa.table({"l": pa.array(lists, pa.list_(t))}))


@pytest.mark.parametrize("t", _ALL_INT_TYPES, ids=str)
def test_integer_dtype_roundtrip_random(t):
    rng = np.random.default_rng(7)
    info = np.iinfo(t.to_pandas_dtype())
    v = rng.integers(info.min, info.max, size=3000, dtype=t.to_pandas_dtype(), endpoint=True)
    # inject runs so both for_rle and pfor branches get exercised
    v[100:400] = v[100]
    _assert_rt(pa.table({"c": pa.array(v, t)}))


def test_sliced_list_array_encodes_correctly():
    # ListArray.offsets is already slice-adjusted; regression for a
    # double-applied offset that silently dropped rows on sliced inputs
    full = pa.array([[1, 2], [3], [4, 5, 6], [7], [8, 9]], pa.list_(pa.int32()))
    sliced = full.slice(1, 3)
    from parquetjs_ray.arrow_util import list_buffers

    flat, lens = list_buffers(sliced)
    assert lens.tolist() == [1, 3, 1]
    assert flat.tolist() == [3, 4, 5, 6, 7]
    _assert_rt(pa.table({"l": sliced}))
    # sliced nullable list through the shred path too
    fulln = pa.array([[1], None, [2, 3], [4], None, [5]], pa.list_(pa.int64()))
    _assert_rt(pa.table({"l": fulln.slice(1, 4)}))


def test_binary_payload_column_compresses():
    # media-like compressible payloads: stored as zstd'd binary segment
    payloads = [bytes([i % 7]) * 4096 for i in range(64)]
    tbl = pa.table({"payload": pa.array(payloads, pa.binary())})
    state = EncoderState(EncodePlan())
    chunk, man = encode_table(tbl, state)
    meta = man["columns"]["payload"]
    assert meta["codec"] == "plain_binary_zstd", meta["codec"]
    assert man["enc_bytes"] < 0.2 * man["raw_bytes"]
    back = decode_chunk(chunk, man, state)
    assert back["payload"].to_pylist() == payloads
    # incompressible payloads stay raw (no size regression)
    rng = np.random.default_rng(0)
    rnd = [rng.bytes(2048) for _ in range(32)]
    chunk2, man2 = encode_table(pa.table({"payload": pa.array(rnd, pa.binary())}), state)
    assert man2["columns"]["payload"]["codec"] == "plain_binary"
    assert decode_chunk(chunk2, man2, state)["payload"].to_pylist() == rnd


def test_fsst_policy_blocks_long_strings():
    # a long-text column must never select FSST (encode cost policy);
    # the skipped estimate is still logged for audit
    from parquetjs_ray.state.artifacts import ColumnStats, EncodePlan as EP

    plan = EP(fsst_symbols=[b"ab", b"cd"], stats={"text": ColumnStats(avg_len=900.0, fsst_ratio=0.4)})
    state = EncoderState(plan)
    texts = ["x" * 900 for _ in range(50)]
    chunk, man = encode_table(pa.table({"text": pa.array(texts)}), state)
    meta = man["columns"]["text"]
    assert meta["codec"] != "fsst"
    assert "fsst_blocked_by_len_policy" in meta["estimates"]


def test_byte_stream_split_floats():
    # low-precision floats (quantized metrics, only 1000 distinct):
    # zstd's entropy coding beats ALP's 17-bit packing estimate here, so
    # byte-stream-split + zstd must still win and round-trip bit-exactly
    rng = np.random.default_rng(0)
    vals = (rng.integers(0, 1000, 20000) / 8.0).astype(np.float32)
    tbl = pa.table({"f": pa.array(vals, pa.float32())})
    state = EncoderState(EncodePlan())
    chunk, man = encode_table(tbl, state)
    meta = man["columns"]["f"]
    assert meta["codec"] in ("bss_zstd", "num_zstd"), meta["codec"]
    assert man["enc_bytes"] < 0.6 * man["raw_bytes"]
    back = decode_chunk(chunk, man, state)
    assert back["f"].to_pylist() == tbl["f"].to_pylist()
    # repeated irrational values: ALP rejects (no decimal exponent),
    # zstd on the raw/split streams wins on the repeats
    v2 = np.tile(rng.random(50) * 1e3, 400)
    t3 = pa.table({"g": pa.array(v2, pa.float64())})
    c3, m3 = encode_table(t3, state)
    assert m3["columns"]["g"]["codec"] in ("bss_zstd", "num_zstd"), m3["columns"]["g"]["codec"]
    assert decode_chunk(c3, m3, state)["g"].to_pylist() == t3["g"].to_pylist()
    # doubles too, and special values survive bit-exactly
    special = [0.0, -0.0, float("inf"), float("-inf"), 1e-300, -1e300] * 100
    t2 = pa.table({"d": pa.array(special, pa.float64())})
    c2, m2 = encode_table(t2, state)
    b2 = decode_chunk(c2, m2, state)
    import math
    for got, want in zip(b2["d"].to_pylist(), special):
        assert got == want or (math.isnan(want) and math.isnan(got))


def test_json_logical_type_as_string_column():
    # the reference's JSON logical type maps JSON.stringify -> BYTE_ARRAY
    # (lib/types.js:280-287); Arrow-side that is exactly a string column,
    # claimed explicitly here: JSON payloads round-trip byte-exact
    import json as _json

    docs = [_json.dumps({"k": i, "tags": ["a", "b"], "nested": {"x": i / 2}}) for i in range(200)]
    _assert_rt(pa.table({"meta_json": pa.array(docs, pa.string())}))


def test_nullable_uint64_full_range():
    # regression: the nullable path cast to int64 and rejected >= 2^63
    v = [17513526460540557097, None, 5, 2**64 - 1, 0]
    _assert_rt(pa.table({"c": pa.array(v, pa.uint64())}))
    _assert_rt(pa.table({"l": pa.array([[2**64 - 1, 1], None, []], pa.list_(pa.uint64()))}))


def test_interval_month_day_nano_roundtrip():
    """Arrow month_day_nano_interval columns shred to three int streams and
    round-trip losslessly (incl. nulls and nanosecond precision the
    reference's millisecond INTERVAL would truncate)."""
    import pyarrow as pa

    from parquetjs_ray.stages.encoder import EncoderState, _ChunkBuilder
    from parquetjs_ray.stages.shred import decode_any, encode_any
    from parquetjs_ray.state.artifacts import EncodePlan

    MDN = pa.MonthDayNano
    vals = [
        MDN([1, 2, 3_000_000]),
        None,
        MDN([0, 0, 0]),
        MDN([-5, 28, 123_456_789]),
        MDN([1200, -3, -1]),
    ]
    arr = pa.array(vals, type=pa.month_day_nano_interval())
    state = EncoderState(EncodePlan())
    cb = _ChunkBuilder()
    meta = encode_any(arr, state, cb)
    assert meta["codec"] in ("interval_mdn",) or meta.get("validity")
    back = decode_any(memoryview(cb.chunk()), meta, state)
    assert back.to_pylist() == arr.to_pylist()


# ————— ALP decimal-float codec —————


def _enc_one(col: pa.Array, name="v"):
    state = EncoderState(EncodePlan())
    tbl = pa.table({name: col})
    chunk, man = encode_table(tbl, state)
    back = decode_chunk(chunk, man, state)
    return man["columns"][name], back[name].combine_chunks(), man


def test_alp_two_decimal_doubles_bit_exact():
    rng = np.random.default_rng(1)
    vals = np.round(rng.random(50_000) * 600.0, 2)
    col = pa.array(vals, pa.float64())
    meta, back, man = _enc_one(col)
    assert meta["codec"] == "alp" and meta["exp"] == 2 and meta["n_exceptions"] == 0
    # bit-exact, not just ==: catches any -0.0 / rounding drift
    assert np.array_equal(back.to_numpy().view(np.int64), vals.view(np.int64))
    # and it genuinely compresses: 2-decimal data under 600 spans ~16
    # bits scaled, so ≤ ~2.2 bytes/value incl. headers vs 8 raw
    assert man["enc_bytes"] < 0.3 * man["raw_bytes"]


def test_alp_exceptions_scatter_back():
    rng = np.random.default_rng(2)
    vals = np.round(rng.random(5_000) * 100.0, 2)
    # plant non-decimal exceptions: NaN, ±inf, -0.0, high-precision reals
    vals[7] = np.nan
    vals[100] = np.inf
    vals[101] = -np.inf
    vals[102] = -0.0
    vals[200:210] = rng.random(10) * np.pi
    vals[4999] = 1e300
    col = pa.array(vals, pa.float64())
    meta, back, _ = _enc_one(col)
    assert meta["codec"] == "alp" and meta["n_exceptions"] >= 14
    got = back.to_numpy(zero_copy_only=False)
    assert np.array_equal(got.view(np.int64), vals.view(np.int64))  # NaN/-0.0 bit-exact


def test_alp_float32_and_rejection():
    rng = np.random.default_rng(3)
    # float32 cents
    v32 = (np.round(rng.random(10_000) * 90.0, 2)).astype(np.float32)
    meta, back, _ = _enc_one(pa.array(v32, pa.float32()))
    assert meta["codec"] == "alp"
    assert np.array_equal(back.to_numpy().view(np.int32), v32.view(np.int32))
    # full-entropy doubles: no decimal exponent fits — ALP must NOT be
    # chosen, and the column still round-trips through the zstd/plain path
    vr = rng.random(10_000)
    meta2, back2, _ = _enc_one(pa.array(vr, pa.float64()))
    assert meta2["codec"] != "alp"
    assert np.array_equal(back2.to_numpy().view(np.int64), vr.view(np.int64))


def test_alp_nullable_float_column():
    rng = np.random.default_rng(4)
    vals = np.round(rng.random(3_000) * 50.0, 2)
    mask = rng.random(3_000) < 0.1
    col = pa.array([None if m else float(x) for m, x in zip(mask, vals)], pa.float64())
    meta, back, _ = _enc_one(col)
    assert meta["codec"] == "alp"
    assert back.null_count == int(mask.sum())
    assert back.to_pylist() == col.to_pylist()


def test_alp_probe_sample_cannot_lie_into_loss():
    # skewed tail: first 95% are 2-decimal, last 5% are full-entropy —
    # whatever the probe picks, decode must be bit-exact (exceptions
    # absorb the tail)
    rng = np.random.default_rng(5)
    vals = np.concatenate([np.round(rng.random(19_000) * 10.0, 2), rng.random(1_000)])
    meta, back, _ = _enc_one(pa.array(vals, pa.float64()))
    got = back.to_numpy()
    assert np.array_equal(got.view(np.int64), vals.view(np.int64))
    if meta["codec"] == "alp":
        assert meta["n_exceptions"] >= 900


def test_alp_survives_encode_optimize_decode_e2e(ray_session):
    """Full-pipeline: encode a float-bearing table (ALP on the value
    column), recluster with zorder_dataset (which re-encodes every
    chunk), decode — doubles bit-exact end to end."""
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import (
        decode_dataset,
        encode_dataset,
        zorder_dataset,
    )

    rng = np.random.default_rng(9)
    n = 20_000
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype="int64")),
            "ts": pa.array(rng.integers(0, 10**9, n).astype("int64")),
            "value": pa.array(np.round(rng.random(n) * 500.0, 2)),
        }
    )
    import tempfile

    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as tmp:
        inp = f"{tmp}/in.parquet"
        src = f"{tmp}/src"
        dst = f"{tmp}/zordered"
        pq.write_table(tbl, inp)
        encode_dataset(inp, src, id_col="event_id", source_col=None)
        import json
        import os

        # the float column must actually ride the ALP codec somewhere
        import glob

        codecs = set()
        for fp in glob.glob(os.path.join(src, "part-*", "frag-*.json")):
            fm = json.load(open(fp))
            meta = fm.get("columns", {}).get("value")
            if meta:
                codecs.add(meta.get("codec"))
        assert "alp" in codecs, codecs
        zorder_dataset(src, dst, by=["ts"], id_col="event_id")
        back = (
            decode_dataset(dst)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        want = tbl.to_pandas()
        assert np.array_equal(
            back["value"].to_numpy().view(np.int64), want["value"].to_numpy().view(np.int64)
        )
        assert back["ts"].tolist() == want["ts"].tolist()
