"""Property-based round-trip tests (hypothesis) for every codec."""

import numpy as np
from hypothesis import given, settings, strategies as st

from parquetjs_ray.codecs import fornum, fsst, pfor, plain, rle


ints = st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=300)
small_ints = st.lists(st.integers(min_value=0, max_value=255), max_size=300)


@settings(max_examples=40, deadline=None)
@given(small_ints, st.integers(min_value=8, max_value=20))
def test_rle_roundtrip(values, width):
    v = np.array(values, dtype=np.uint64)
    buf = rle.encode(v, width, disable_envelope=True)
    assert rle.decode(buf, len(v), width, disable_envelope=True).tolist() == values


@settings(max_examples=40, deadline=None)
@given(ints)
def test_fornum_roundtrip(values):
    v = np.array(values, dtype=np.int64)
    buf, params = fornum.encode(v)
    assert fornum.decode(buf, params).tolist() == values


@settings(max_examples=40, deadline=None)
@given(ints)
def test_pfor_roundtrip(values):
    v = np.array(values, dtype=np.int64)
    bufs, params = pfor.encode(v)
    assert pfor.decode(bufs, params).tolist() == values


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(max_size=40), max_size=60))
def test_fsst_roundtrip(strings):
    table = fsst.train([s for s in strings if s][:20] or [b"seed"])
    data = np.frombuffer(b"".join(strings), dtype=np.uint8)
    offsets = np.zeros(len(strings) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strings], out=offsets[1:])
    codes, coffs = fsst.encode(table, data, offsets)
    out, ooffs = fsst.decode(table, codes, coffs)
    assert out == data.tobytes()
    assert ooffs.tolist() == offsets.tolist()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(max_size=30), max_size=50))
def test_plain_byte_array_roundtrip(values):
    data = b"".join(values)
    offsets = np.zeros(len(values) + 1, dtype=np.int64)
    np.cumsum([len(v) for v in values], out=offsets[1:])
    buf = plain.encode_byte_array(np.frombuffer(data, dtype=np.uint8), offsets)
    out_data, out_offsets = plain.decode_byte_array(buf, len(values))
    assert out_data == data
    assert out_offsets.tolist() == offsets.tolist()


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.floats(allow_nan=False, width=32)), max_size=80
    )
)
def test_float_chunk_roundtrip_any_codec(values):
    # exercises plain_num / num_zstd / bss_zstd selection under nulls
    import pyarrow as pa

    from parquetjs_ray.stages.decoder import decode_chunk
    from parquetjs_ray.stages.encoder import EncoderState, encode_table
    from parquetjs_ray.state.artifacts import EncodePlan

    tbl = pa.table({"f": pa.array(values, pa.float32())})
    state = EncoderState(EncodePlan())
    chunk, man = encode_table(tbl, state)
    back = decode_chunk(chunk, man, state)
    assert back["f"].to_pylist() == tbl["f"].to_pylist()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=120)), max_size=60))
def test_binary_chunk_roundtrip_any_codec(values):
    # exercises plain_binary / plain_binary_zstd under nulls
    import pyarrow as pa

    from parquetjs_ray.stages.decoder import decode_chunk
    from parquetjs_ray.stages.encoder import EncoderState, encode_table
    from parquetjs_ray.state.artifacts import EncodePlan

    tbl = pa.table({"b": pa.array(values, pa.binary())})
    state = EncoderState(EncodePlan())
    chunk, man = encode_table(tbl, state)
    back = decode_chunk(chunk, man, state)
    assert back["b"].to_pylist() == tbl["b"].to_pylist()


@settings(max_examples=25, deadline=None)
@given(
    st.sampled_from(["int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64"]),
    st.data(),
)
def test_integer_dtype_property_roundtrip(dtype_name, data):
    import pyarrow as pa

    from parquetjs_ray.stages.decoder import decode_chunk
    from parquetjs_ray.stages.encoder import EncoderState, encode_table
    from parquetjs_ray.state.artifacts import EncodePlan

    info = np.iinfo(np.dtype(dtype_name))
    values = data.draw(
        st.lists(st.integers(int(info.min), int(info.max)), min_size=1, max_size=200)
    )
    tbl = pa.table({"c": pa.array(values, getattr(pa, dtype_name)())})
    state = EncoderState(EncodePlan())
    chunk, man = encode_table(tbl, state)
    back = decode_chunk(chunk, man, state)
    assert back["c"].to_pylist() == values


@settings(max_examples=40, deadline=None)
@given(ints)
def test_vpack_roundtrip_property(values):
    from parquetjs_ray.codecs import vpack

    v = np.array(values, dtype=np.int64)
    bufs, params = vpack.encode(v)
    assert vpack.decode(bufs, params).tolist() == values


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200),
    st.sampled_from(["int32", "int64", "uint32", "uint64"]),
)
def test_vpack_dtype_property(values, dtype_name):
    from parquetjs_ray.codecs import vpack

    dt = np.dtype(dtype_name)
    info = np.iinfo(dt)
    v = (np.array(values, dtype=np.uint64) % (np.uint64(info.max) if info.max > 0 else 1)).astype(dt)
    bufs, params = vpack.encode(v)
    got = vpack.decode(bufs, params, dtype=dt)
    assert got.dtype == dt and got.tolist() == v.tolist()


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**20), min_size=70, max_size=400))
def test_int_stream_selector_roundtrip_property(values):
    """Whatever the selector picks (for_rle / pfor / vpack), the stream
    round-trips exactly — the decision must never affect correctness."""
    from parquetjs_ray.stages.decoder import _decode_int_stream
    from parquetjs_ray.stages.encoder import _ChunkBuilder, encode_int_stream

    v = np.array(values, dtype=np.int32)
    cb = _ChunkBuilder()
    codec, segs, params = encode_int_stream(v, cb)
    out = _decode_int_stream(memoryview(cb.chunk()), {"codec": codec, "segments": segs, "params": params}, np.int32)
    assert out.tolist() == values


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(
            # decimal-shaped values (ALP's home turf) ...
            st.integers(-10**6, 10**6).map(lambda c: c / 100.0),
            # ... mixed with arbitrary doubles incl. nan/inf (exceptions)
            st.floats(width=64, allow_nan=True, allow_infinity=True),
        ),
        min_size=64,  # below 64 the ALP probe is skipped by design
        max_size=400,
    )
)
def test_alp_chunk_roundtrip_bit_exact(values):
    # whatever the selector picks (alp / bss_zstd / num_zstd / plain),
    # doubles must round-trip BIT-exactly — including NaN payload bits,
    # -0.0 and infinities routed through the ALP exception list
    import pyarrow as pa

    from parquetjs_ray.stages.decoder import decode_chunk
    from parquetjs_ray.stages.encoder import EncoderState, encode_table
    from parquetjs_ray.state.artifacts import EncodePlan

    tbl = pa.table({"d": pa.array(values, pa.float64())})
    state = EncoderState(EncodePlan())
    chunk, man = encode_table(tbl, state)
    back = decode_chunk(chunk, man, state)
    got = back["d"].combine_chunks().to_numpy(zero_copy_only=False)
    want = np.asarray(values, dtype=np.float64)
    assert np.array_equal(got.view(np.int64), want.view(np.int64))


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="abcx", max_size=24),
    st.text(alphabet="abcx", max_size=24),
    st.integers(0, 12),
)
def test_lev_banded_property(a, b, k):
    from parquetjs_ray.functions.dedup import _lev_banded

    prev = list(range(len(b.encode()) + 1))
    for i, ca in enumerate(a.encode(), 1):
        cur = [i]
        for j, cb in enumerate(b.encode(), 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    true = prev[-1]
    got = _lev_banded(
        np.frombuffer(a.encode(), np.uint8), np.frombuffer(b.encode(), np.uint8), k
    )
    assert got == true if true <= k else got > k
