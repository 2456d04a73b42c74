"""Per-chunk column encoding with codec auto-selection (pure, Ray-free).

This is the engine's equivalent of the reference's
``encodeRowGroup``/``encodeColumnChunk`` (`/root/reference/lib/writer.js:424-515`),
redesigned columnar-first: the input is an Arrow batch (≈ one row group),
the output is one binary chunk (concatenated per-column segments) plus a
JSON-able manifest fragment — no thrift, no pages; segment offsets play
the role of page/chunk offsets.

Codec selection per column chunk (the north rule's auto-selector):

* strings → global dict+RLE when every value is in the broadcast
  dictionary and cardinality is low; else FSST when the sampled ratio
  says it pays; else local dict; else PLAIN;
* int32/int64 → frame-of-reference + RLE/bit-pack (never worse than
  PLAIN by more than run headers; falls back to PLAIN if wider);
* list<int32> → lengths via FOR+RLE, flattened values via FOR+RLE.

Decisions are recorded per chunk in the manifest with the estimates
that drove them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrow_util import list_buffers, string_buffers
from ..codecs import dictionary, fornum, fsst as fsst_mod, plain
from ..codecs.bitpack import bit_width
from ..state.artifacts import EncodePlan

__all__ = ["EncoderState", "encode_table"]

DICT_MAX_CARD = 1 << 16
FSST_MAX_RATIO = 0.9  # use FSST only if sampled ratio beats plain by ≥10%
# FSST's greedy encode loop runs ~5 MB/s of string payload (Python jump
# loop) — worth it for short key-like columns (doc_id/source) where the
# symbol table wins big, but on long text columns the encode cost dwarfs
# the byte savings at measured throughput. Policy: never select FSST
# when the column's sampled mean length exceeds this bound; the skipped
# estimate still lands in the manifest for audit.
FSST_MAX_AVG_LEN = 64.0


# codec speed/size profiles: the vpack margin is the fraction of the
# best FOR/PFOR estimate that vpack must beat to be selected. vpack is
# the densest int codec on smooth heavy tails but costs the most encode/
# decode passes (selector scatter) — "fast" trades ~1.7× ratio on Zipf
# tokens for ~1.7× throughput (measured in BASELINE.md), "small" takes
# any size win.
_VPACK_MARGIN = {"fast": -1.0, "balanced": 0.9, "small": 1.0}


class EncoderState:
    """Per-actor prepared state: broadcast artifacts deserialized once."""

    def __init__(self, plan: EncodePlan):
        self.plan = plan
        self.vpack_margin = _VPACK_MARGIN.get(getattr(plan, "profile", None) or "balanced", 0.9)
        self.source_dict = plan.source_dict_array() if plan.source_dict else None
        self.fsst_table = plan.fsst_table()
        self.stats = plan.stats
        # token rank dict: rank → value array + dense value → rank LUT,
        # built once per actor from the broadcast plan (never per batch)
        self.token_dict_column = getattr(plan, "token_dict_column", None)
        self.bloom_columns = list(getattr(plan, "bloom_columns", None) or [])
        self.rank2val: np.ndarray | None = None
        self.token_lut: np.ndarray | None = None
        if self.token_dict_column and plan.token_dict_vals:
            self.rank2val = np.asarray(plan.token_dict_vals, dtype=np.int64)
            lut = np.full(int(self.rank2val.max()) + 1, len(self.rank2val), dtype=np.int32)
            lut[self.rank2val] = np.arange(len(self.rank2val), dtype=np.int32)
            self.token_lut = lut


class _ChunkBuilder:
    def __init__(self) -> None:
        self.parts: list[bytes] = []
        self.pos = 0
        self.columns: dict[str, dict] = {}

    def add_segment(self, buf: bytes) -> list[int]:
        seg = [self.pos, len(buf)]
        self.parts.append(buf)
        self.pos += len(buf)
        return seg

    def chunk(self) -> bytes:
        return b"".join(self.parts)


def encode_int_stream(
    values: np.ndarray, cb: _ChunkBuilder, _allow_delta: bool = True,
    vpack_margin: float = 0.9,
) -> tuple[str, dict, dict]:
    """Integer stream: choose delta vs FOR+RLE vs PFOR vs vpack per chunk.

    FOR+RLE wins on run-heavy data (repeated values collapse to runs);
    PFOR wins on heavy-tailed distributions where a few outliers would
    force the full tail width on every value; vpack (4 width classes +
    2-bit selector) wins on SMOOTH heavy tails (Zipf token ids) where
    even PFOR's single base width overpays for the huge low-rank head;
    delta (first value + consecutive differences fed back through this
    selector — the DELTA_BINARY_PACKED idea, parquet.thrift:314-319,
    which the reference never implements) wins on monotone streams
    (timestamps, auto-increment ids) where the diff range is orders of
    magnitude narrower than the value range. The decision uses the
    chunk's own bit-length histogram + transition count — the per-chunk
    auto-selection the north rule asks for."""
    from ..codecs import pfor as pfor_mod, vpack as vpack_mod
    from ..codecs.bitpack import _unsigned_view

    v = np.ascontiguousarray(values)
    n = len(v)
    if n >= 64:
        lo = int(v.min())
        hi = int(v.max())
        full_width = bit_width(hi - lo)
        if v.dtype.itemsize <= 4:
            residuals = np.subtract(v, v.dtype.type(lo)).view(f"u{v.dtype.itemsize}")
        else:
            residuals = _unsigned_view(np.subtract(v, lo))
        # run detection on a CONTIGUOUS window (strided sampling would
        # destroy run structure; a window preserves it and skips a full
        # n-sized diff pass — memory traffic is the 8-worker bottleneck)
        if n > 4 * _SELECTOR_SAMPLE:
            w0 = (n - _SELECTOR_SAMPLE) // 2
            win = v[w0 : w0 + _SELECTOR_SAMPLE]
        else:
            win = v
        d_win = np.diff(win.astype(np.int64) if v.dtype.itemsize < 8 else win)
        transitions = int(round((int((d_win != 0).sum()) + 1) * n / len(win)))
        est_for_upper = n * full_width / 8
        if _allow_delta and n >= 128 and len(d_win) and float((d_win >= 0).mean()) >= 0.99:
            est_delta = _estimate_delta(d_win, n)
            if est_delta < 0.75 * est_for_upper:
                # cheap monotone probe says diffs pack far tighter than
                # values; confirm against the other candidates below only
                # via the FOR upper bound — their histogram estimates are
                # bounded below by the same full_width term delta beats
                first = int(v[0])
                diffs = np.diff(v) if v.dtype.itemsize == 8 else np.diff(v.astype(np.int64))
                icodec, isegs, iparams = encode_int_stream(
                    diffs, cb, _allow_delta=False, vpack_margin=vpack_margin
                )
                return "delta", isegs, {
                    "delta": {"first": first, "inner_codec": icodec, "inner_params": iparams},
                    "estimates": {"for_upper": est_for_upper, "delta": round(est_delta, 1)},
                }
        # histogram-driven estimates from a strided SAMPLE: the decisions
        # and class-width splits tolerate sampling error, and full-chunk
        # bit-length passes were the selector's dominant cost
        sample = _residual_sample(residuals)
        scale = n / max(1, len(sample))
        _, est_pfor_s = pfor_mod.choose_width(sample, full_width)
        est_pfor = est_pfor_s * scale
        counts_hist = np.bincount(vpack_mod._bitlens(sample), minlength=65)
        vp_widths, est_vpack_s = vpack_mod.choose_classes(counts_hist, full_width, len(sample))
        est_vpack = est_vpack_s * scale
        run_heavy = transitions < 0.6 * n  # runs → RLE hybrid pays
        if not run_heavy:
            if vp_widths is not None and est_vpack < vpack_margin * min(est_for_upper, est_pfor):
                # top class must cover the TRUE range, not the sample's
                vp_widths = [min(w, full_width) for w in vp_widths[:3]] + [full_width]
                bufs, params = vpack_mod.encode(v, _pre=(lo, residuals, vp_widths))
                segments = {k: cb.add_segment(b) for k, b in bufs.items()}
                return "vpack", segments, {
                    "vpack": params,
                    "estimates": {"for_upper": est_for_upper, "pfor": round(est_pfor, 1), "vpack": round(est_vpack, 1)},
                }
            if est_pfor < 0.9 * est_for_upper:
                bufs, params = pfor_mod.encode(v)
                segments = {k: cb.add_segment(b) for k, b in bufs.items()}
                return "pfor", segments, {"pfor": params}
    buf, params = fornum.encode(v)
    return "for_rle", {"data": cb.add_segment(buf)}, {"for": params}


_SELECTOR_SAMPLE = 32_768


def _estimate_delta(d_win: np.ndarray, n: int) -> float:
    """Size estimate for delta coding from the window's diffs: the best
    lightweight-codec cost of the diff stream, scaled to the chunk."""
    from ..codecs import pfor as pfor_mod, vpack as vpack_mod
    from ..codecs.bitpack import _unsigned_view

    lo = int(d_win.min())
    fw = max(bit_width(int(d_win.max()) - lo), 1)
    res = _unsigned_view(np.subtract(d_win.astype(np.int64), lo))
    _, est_pfor = pfor_mod.choose_width(res, fw)
    counts = np.bincount(vpack_mod._bitlens(res), minlength=65)
    _, est_vpack = vpack_mod.choose_classes(counts, fw, len(res))
    scale = n / max(1, len(d_win))
    return min(len(d_win) * fw / 8, est_pfor, est_vpack) * scale + 16


def _residual_sample(residuals: np.ndarray) -> np.ndarray:
    if len(residuals) <= _SELECTOR_SAMPLE:
        return residuals
    step = len(residuals) // _SELECTOR_SAMPLE
    return np.ascontiguousarray(residuals[:: step][:_SELECTOR_SAMPLE])


def _encode_string(
    name: str, arr: pa.Array, state: EncoderState, cb: _ChunkBuilder
) -> dict:
    data, offsets = string_buffers(arr)
    n = len(arr)
    raw_bytes = len(data) + 4 * (n + 1)
    est: dict[str, float] = {"plain": len(data) + 4 * n}

    # global dictionary candidate
    idx = None
    if state.source_dict is not None and len(state.source_dict) <= DICT_MAX_CARD:
        cand = pc.index_in(arr, value_set=state.source_dict)
        if cand.null_count == 0:
            idx = cand
            est["dict_global"] = n * bit_width(len(state.source_dict) - 1) / 8 + 8
    # local sorted-dict + front-coded page candidate: only when the
    # sampled cardinality says values actually repeat (the dictionary
    # pays for itself) and no global dictionary covers the column
    st = state.stats.get(name)
    local_dict = None
    if (
        idx is None
        and st is not None
        and st.distinct_est is not None
        and 0 < st.distinct_est <= min(DICT_MAX_CARD, max(1, n // 4))
    ):
        local_dict = dictionary.encode_local(arr)
        est["dict_local"] = float(len(local_dict[0]) + len(local_dict[1]))
    # FSST candidate (sampled ratio), gated by the encode-cost policy
    fsst_blocked = None
    if state.fsst_table is not None and st is not None and st.fsst_ratio is not None:
        fsst_est = st.fsst_ratio * len(data) + n * bit_width(64) / 8 * 0.2 + 16
        if st.avg_len <= FSST_MAX_AVG_LEN:
            est["fsst"] = fsst_est
        else:  # too long: encode cost beats savings; log the skipped estimate
            fsst_blocked = fsst_est

    codec = min(est, key=lambda k: est[k])
    if codec == "fsst" and est["fsst"] > FSST_MAX_RATIO * est["plain"]:
        codec = "plain"

    meta: dict = {"codec": codec, "raw_bytes": raw_bytes, "estimates": est, "count": n}
    if fsst_blocked is not None:
        meta["estimates"] = dict(est, fsst_blocked_by_len_policy=fsst_blocked)
    if codec == "dict_global":
        indices = idx.to_numpy(zero_copy_only=False)
        from ..codecs import rle

        width = bit_width(len(state.source_dict) - 1)
        buf = rle.encode(indices, width, disable_envelope=True)
        meta["segments"] = {"idx": cb.add_segment(buf)}
        meta["params"] = {"card": len(state.source_dict), "width": width}
    elif codec == "dict_local":
        idx_buf, dict_buf, dparams = local_dict
        meta["segments"] = {
            "idx": cb.add_segment(idx_buf),
            "dict": cb.add_segment(dict_buf),
        }
        meta["params"] = dparams
    elif codec == "fsst":
        codes, code_offs = fsst_mod.encode(state.fsst_table, data, offsets)
        len_buf, len_params = fornum.encode(np.diff(code_offs))
        meta["segments"] = {"codes": cb.add_segment(codes), "lens": cb.add_segment(len_buf)}
        meta["params"] = {"lens_for": len_params}
    else:
        buf = plain.encode_byte_array(data, offsets)
        meta["segments"] = {"data": cb.add_segment(buf)}
        meta["params"] = {}
    meta["enc_bytes"] = sum(seg[1] for seg in meta["segments"].values())
    return meta


def _seg_bytes(segments: dict) -> int:
    return sum(seg[1] for seg in segments.values())


def _encode_int(name: str, arr: pa.Array, cb: _ChunkBuilder, vpack_margin: float = 0.9) -> dict:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    values = arr.to_numpy(zero_copy_only=False)
    width_bytes = arr.type.bit_width // 8
    codec, segments, params = encode_int_stream(values, cb, vpack_margin=vpack_margin)
    meta = {
        "codec": codec,
        "segments": segments,
        "params": params,
        "raw_bytes": width_bytes * len(values),
        "count": len(values),
        "dtype": str(arr.type),
    }
    meta["enc_bytes"] = _seg_bytes(segments)
    return meta


def estimate_int_stream(values: np.ndarray) -> float:
    """Best lightweight-codec size estimate for an int stream (no encode):
    min of FOR-upper-bound, PFOR and vpack histogram costs."""
    from ..codecs import pfor as pfor_mod, vpack as vpack_mod
    from ..codecs.bitpack import _unsigned_view

    v = np.ascontiguousarray(values)
    n = len(v)
    if n == 0:
        return 0.0
    lo = int(v.min())
    full_width = max(bit_width(int(v.max()) - lo), 1)
    if v.dtype.itemsize <= 4:
        residuals = np.subtract(v, v.dtype.type(lo)).view(f"u{v.dtype.itemsize}")
    else:
        residuals = _unsigned_view(np.subtract(v, lo))
    _, est_pfor = pfor_mod.choose_width(residuals, full_width)
    counts = np.bincount(vpack_mod._bitlens(residuals), minlength=65)
    _, est_vpack = vpack_mod.choose_classes(counts, full_width, n)
    return min(n * full_width / 8, est_pfor, est_vpack)


def _encode_token_values(flat: np.ndarray, state: EncoderState, cb: _ChunkBuilder) -> dict | None:
    """dict-of-top-ids branch for a token value stream: remap values to
    global frequency ranks (dense-LUT gather), keep out-of-dict values
    as (position, value) exception side streams, and encode the rank
    codes with the normal int-stream selector. Chosen per chunk only
    when the mapped histogram estimate beats the raw one — both
    estimates are logged either way."""
    lut = state.token_lut
    if lut is None or flat.dtype.kind not in "iu":
        return None
    card = len(state.rank2val)

    def map_codes(vv: np.ndarray) -> np.ndarray:
        v64 = vv.astype(np.int64, copy=False)
        oob = (v64 < 0) | (v64 >= len(lut))
        return np.where(
            oob, np.int64(card), lut[np.minimum(np.maximum(v64, 0), len(lut) - 1)].astype(np.int64)
        )

    # decide from a strided sample first — the full-chunk LUT gather and
    # histogram passes only run when the remap actually wins
    sample = _residual_sample(flat)
    scale = len(flat) / max(1, len(sample))
    codes_s = map_codes(sample)
    est_raw = estimate_int_stream(sample) * scale
    est_map = (estimate_int_stream(codes_s) + int((codes_s == card).sum()) * 6.0) * scale
    if est_map >= 0.95 * est_raw:
        return {"skipped": {"dict_ranks": round(est_map, 1), "raw": round(est_raw, 1)}}
    codes = map_codes(flat)
    v = flat.astype(np.int64, copy=False)
    n_exc = int((codes == card).sum())
    exc_pos = np.flatnonzero(codes == card)
    from ..codecs import fornum as fornum_mod

    pos_buf, pos_params = fornum_mod.encode(exc_pos)
    val_buf, val_params = fornum_mod.encode(v[exc_pos])
    inner_codec, inner_segs, inner_params = encode_int_stream(
        codes, cb, vpack_margin=state.vpack_margin
    )
    return {
        "codec": "dict_ranks",
        "inner": {"codec": inner_codec, "segments": inner_segs, "params": inner_params},
        "segments": {"exc_pos": cb.add_segment(pos_buf), "exc_val": cb.add_segment(val_buf)},
        "params": {
            "card": card,
            "n_exc": n_exc,
            "exc_pos_for": pos_params,
            "exc_val_for": val_params,
        },
        "estimates": {"dict_ranks": round(est_map, 1), "raw": round(est_raw, 1)},
    }


def _encode_list_int(name: str, arr: pa.Array, cb: _ChunkBuilder, state: EncoderState | None = None) -> dict:
    flat, lengths = list_buffers(arr)
    margin = state.vpack_margin if state is not None else 0.9
    raw_bytes = flat.dtype.itemsize * len(flat) + 4 * (len(lengths) + 1)
    len_codec, len_segs, len_params = encode_int_stream(lengths, cb, vpack_margin=margin)
    values_meta = None
    if state is not None and state.token_dict_column == name:
        values_meta = _encode_token_values(flat, state, cb)
    skipped = None
    if values_meta is not None and "skipped" in values_meta:
        skipped, values_meta = values_meta["skipped"], None
    if values_meta is None:
        val_codec, val_segs, val_params = encode_int_stream(flat, cb, vpack_margin=margin)
        values_meta = {"codec": val_codec, "segments": val_segs, "params": val_params}
        if skipped:
            values_meta["estimates"] = skipped
    meta = {
        "codec": "list_int",
        "lens": {"codec": len_codec, "segments": len_segs, "params": len_params},
        "values": values_meta,
        "segments": {},  # sub-streams carry their own segment refs
        "raw_bytes": raw_bytes,
        "count": len(arr),
        "n_values": len(flat),
        "dtype": str(arr.type.value_type),
    }
    meta["enc_bytes"] = _seg_bytes(len_segs) + _enc_bytes_of(values_meta)
    return meta


def _enc_bytes_of(values_meta: dict) -> int:
    total = _seg_bytes(values_meta.get("segments", {}))
    if "inner" in values_meta:
        total += _seg_bytes(values_meta["inner"].get("segments", {}))
    return total


def encode_table(table: pa.Table, state: EncoderState) -> tuple[bytes, dict]:
    """Encode one Arrow batch → (chunk bytes, manifest dict).

    The manifest records per-column codec decisions, segment offsets into
    the chunk, raw/encoded sizes and codec params — the per-partition
    lineage record the north rule requires.
    """
    cb = _ChunkBuilder()
    columns: dict[str, dict] = {}
    for name in table.column_names:
        col = table.column(name)
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        t = arr.type
        no_nulls = arr.null_count == 0
        if no_nulls and (pa.types.is_string(t) or pa.types.is_large_string(t)):
            columns[name] = _encode_string(name, arr, state, cb)
        elif no_nulls and pa.types.is_integer(t):
            columns[name] = _encode_int(name, arr, cb, state.vpack_margin)
        elif (
            no_nulls
            and pa.types.is_list(t)
            and pa.types.is_integer(t.value_type)
            and arr.values.null_count == 0
        ):
            columns[name] = _encode_list_int(name, arr, cb, state)
        else:
            # general path: recursive Arrow shredding (nulls, nesting,
            # bool/float/temporal/fixed types — the reference's full surface)
            from .shred import encode_any

            pos0 = cb.pos
            meta = encode_any(arr, state, cb)
            meta["raw_bytes"] = arr.nbytes
            meta["enc_bytes"] = cb.pos - pos0
            columns[name] = meta
    manifest = {
        "rows": table.num_rows,
        "columns": columns,
        "raw_bytes": sum(c["raw_bytes"] for c in columns.values()),
        "enc_bytes": cb.pos,
    }
    zones = _column_zones(table)
    if zones:
        manifest["zones"] = zones
    aggs = _column_aggs(table)
    if aggs:
        manifest["aggs"] = aggs
    blooms = _column_blooms(table, state)
    if blooms:
        manifest["blooms"] = blooms
    return cb.chunk(), manifest


def _column_aggs(table: pa.Table) -> dict[str, dict]:
    """Per-chunk column aggregates (count / null count / exact integer
    sums) stored next to the zones — together they make COUNT/SUM/MIN/
    MAX/AVG over the artifact a MANIFEST-ONLY query (no chunk byte is
    read; see ``pipelines.encode.table_aggregates``).  The parquet
    analogue is row-group Statistics feeding aggregate pushdown.

    Integer sums are recorded only when the zone-bounded worst case
    ``max(|min|,|max|) * n`` provably fits int64, so a recorded sum is
    always exact; float sums are NOT recorded (their value would depend
    on chunk boundaries / addition order, breaking run-to-run
    determinism). List<int> columns record the flattened value count and
    sum (total tokens, for the north-rule table)."""
    aggs: dict[str, dict] = {}
    i64_cap = (1 << 62)  # headroom under int64 for the cross-chunk merge
    for name in table.column_names:
        arr = table.column(name)
        t = arr.type
        ent: dict = {"n": len(arr), "nulls": arr.null_count}
        def int_sum(a) -> int | None:
            if a.null_count == len(a):
                return 0
            mm = pc.min_max(a)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            bound = max(abs(lo), abs(hi)) * (len(a) - a.null_count)
            if bound >= i64_cap:
                return None
            return int(pc.sum(a.cast(pa.int64())).as_py() or 0)
        if pa.types.is_boolean(t):
            ent["sum"] = int(pc.sum(arr.cast(pa.int64())).as_py() or 0)
        elif pa.types.is_integer(t):
            s = int_sum(arr)
            if s is not None:
                ent["sum"] = s
        elif pa.types.is_list(t) and pa.types.is_integer(t.value_type):
            flat = pc.list_flatten(arr)
            ent["flat_n"] = len(flat)
            s = int_sum(flat)
            if s is not None:
                ent["flat_sum"] = s
        aggs[name] = ent
    return aggs


def _column_blooms(table: pa.Table, state: EncoderState) -> dict[str, dict]:
    """Per-chunk Bloom filters for the plan's opted-in columns — the
    parquet BloomFilterHeader analogue (see :mod:`.bloom`).  Zones prune
    range predicates on ordered columns; blooms prune ``==`` predicates
    on high-cardinality unordered ones (content strings, hash keys)."""
    cols = getattr(state, "bloom_columns", None)
    if not cols:
        return {}
    from .bloom import build_bloom, column_hash

    out: dict[str, dict] = {}
    for name in cols:
        if name not in table.column_names:
            continue
        hashed = column_hash(table.column(name))
        if hashed is not None:
            out[name] = build_bloom(*hashed)
    return out


def _column_zones(table: pa.Table) -> dict[str, dict]:
    """Per-chunk min/max zone maps for orderable top-level columns — the
    parquet row-group column-statistics analogue (parquet.thrift
    Statistics min/max; the reference never emits them). Drives
    fragment pruning in ``decode_dataset(where=...)``.

    Values are stored JSON-safe in each type's raw numeric domain
    (temporal types as their epoch integer, recorded with a type tag so
    the predicate side normalizes operands identically)."""
    zones: dict[str, dict] = {}
    for name in table.column_names:
        arr = table.column(name)
        t = arr.type
        tag: str | None = None
        if pa.types.is_integer(t):
            tag = "int"
        elif pa.types.is_floating(t):
            tag = "float"
        elif pa.types.is_timestamp(t) and t.tz is None:
            tag = f"timestamp[{t.unit}]"
        elif pa.types.is_date32(t):
            tag = "date32"
        elif pa.types.is_date64(t):
            tag = "date64"
        elif pa.types.is_list(t) and pa.types.is_integer(t.value_type):
            # token-list columns: zone over the FLAT values — prunes the
            # `contains` predicate by value range before blooms probe
            flat = pc.list_flatten(arr)
            if len(flat) and flat.null_count < len(flat):
                arr, tag = flat, "int"
        if tag is None or arr.null_count == len(arr):
            continue
        mm = pc.min_max(arr)
        lo, hi = mm["min"], mm["max"]
        if tag == "float":
            lo, hi = lo.as_py(), hi.as_py()
            if not (np.isfinite(lo) and np.isfinite(hi)):
                continue
        elif tag == "int":
            lo, hi = lo.as_py(), hi.as_py()
        else:  # temporal → raw epoch integer in the type's own unit
            storage = pa.int32() if tag == "date32" else pa.int64()
            lo = lo.cast(storage).as_py()
            hi = hi.cast(storage).as_py()
        zones[name] = {"min": lo, "max": hi, "t": tag}
    return zones
