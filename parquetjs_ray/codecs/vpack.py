"""vpack — variable-width class packing for heavy-tailed integer streams.

Frame-of-reference residuals are split into FOUR width classes chosen
cost-optimally from the chunk's bit-length histogram; each value stores
a 2-bit class selector plus its residual packed at its class width.
On Zipf-distributed token ids this approaches the distribution's
entropy far closer than single-width FOR or PFOR-with-exceptions: the
head (rank ≤ 2^w1) pays w1+2 bits instead of the full tail width, while
the tail pays its own width instead of forcing exceptions.

Public-technique lineage: width-class selector packing in the
Simple-8b / varint-G8IU family (Anh & Moffat, "Index compression using
64-bit words", 2010) and the multi-width PFOR variants of Zukowski et
al. (ICDE 2006); this is a columnar 4-class variant with the class
stream stored separately so both streams stay fully vectorizable.

Not in the reference (its only codecs are PLAIN/RLE — `/root/reference/
lib/codec/`); selected per column chunk by the auto-selector when its
histogram-estimated size beats FOR+RLE and PFOR.
"""

from __future__ import annotations

import itertools

import numpy as np

from .bitpack import (
    _unsigned_view,
    bit_width,
    pack_bits,
    pack_words,
    unpack_bits,
    unpack_words,
)

__all__ = ["choose_classes", "estimate", "encode", "decode"]

_N_CLASSES = 4
_HEADER_COST = 48.0  # params + 4 segment refs, amortized estimate
_BYTE_WIDTHS = (8, 16, 32, 64)


def _layout_of(width: int) -> str:
    """Per-class stream layout: straight byte cast where possible, per-bit
    packing for tiny widths (few passes), k-per-word packing otherwise
    (strided passes beat per-bit loops 3-5× at widths 5..32)."""
    if width in _BYTE_WIDTHS:
        return "bytes"
    if width <= 4:
        return "bits"
    return "words"


def _eff_bits(width: int) -> float:
    """Stored bits per value under :func:`_layout_of` (words layout wastes
    64 mod width bits per word) — what the cost model must charge."""
    if _layout_of(width) == "words":
        return 64.0 / (64 // width)
    return float(width)


def _bitlens(residuals: np.ndarray) -> np.ndarray:
    """Per-value bit length (0..64), vectorized."""
    powers = np.left_shift(np.uint64(1), np.arange(1, 64, dtype=np.uint64))
    bl = np.searchsorted(powers, residuals, side="right") + 1
    bl[residuals == 0] = 0
    return bl


def choose_classes(counts: np.ndarray, full_width: int, n: int) -> tuple[list[int], float]:
    """Cost-optimal ascending class widths (last = full) → (widths, bytes).

    Exhaustive search over widths that actually occur in the histogram
    (a handful for real data), so the search is tiny; cost = 2-bit
    selector per value + per-class packed widths + header."""
    if full_width < 2:
        return [max(full_width, 1)] * _N_CLASSES, float("inf")
    cum = np.cumsum(counts[: full_width + 1])  # cum[w] = #values with bitlen ≤ w
    present = [w for w in range(1, full_width) if counts[w] > 0 or w == 1]
    if len(present) > 16:  # bound the C(n,3) search on wide-spread data
        present = sorted(sorted(present, key=lambda w: -counts[w])[:16])
    best_ws, best_cost = None, float("inf")
    for combo in itertools.combinations(present, min(3, len(present))):
        ws = sorted(set(list(combo) + [full_width]))
        while len(ws) < _N_CLASSES:
            ws.append(full_width)
        cost = 2 * n / 8.0 + _HEADER_COST
        prev = 0
        seen = set()
        for w in ws:
            if w in seen:
                continue
            seen.add(w)
            cost += (int(cum[w]) - prev) * _eff_bits(w) / 8.0
            prev = int(cum[w])
        if cost < best_cost:
            best_ws, best_cost = ws[:_N_CLASSES], cost
    return best_ws, best_cost


def estimate(residuals: np.ndarray, full_width: int) -> float:
    """Histogram-driven size estimate (selector use)."""
    counts = np.bincount(_bitlens(residuals), minlength=65)
    _, cost = choose_classes(counts, full_width, len(residuals))
    return cost


def _classes_of(residuals: np.ndarray, widths: list[int]) -> np.ndarray:
    """Class index per value via three threshold compares (uint8) — no
    bit-length pass, no searchsorted; ~3 cheap C passes total."""
    cls = np.zeros(len(residuals), dtype=np.uint8)
    for w in widths[:-1]:
        if w >= 64:
            continue
        cls += residuals > residuals.dtype.type((1 << w) - 1)
    return cls


def encode(values: np.ndarray, _pre: tuple | None = None) -> tuple[dict[str, bytes], dict]:
    """→ ({"sel":…, "c0":…,"c1":…,"c2":…,"c3":…}, params).

    ``_pre`` = (lo, residuals, widths) lets the selector hand over its
    already-computed frame + sampled width choice instead of re-deriving
    them. Widths may come from a SAMPLE (slightly suboptimal splits are
    fine); correctness only needs the top class to cover the true full
    width, which the caller guarantees via the actual min/max."""
    v = np.ascontiguousarray(values)
    n = len(v)
    empty = {"sel": b"", "c0": b"", "c1": b"", "c2": b"", "c3": b""}
    if n == 0:
        return empty, {"ref": 0, "widths": [1, 1, 1, 1], "count": 0, "class_counts": [0, 0, 0, 0]}
    if _pre is not None:
        lo, residuals, widths = _pre
    else:
        lo = int(v.min())
        hi = int(v.max())
        full_width = max(bit_width(hi - lo), 1)
        if v.dtype.itemsize <= 4:
            residuals = np.subtract(v, v.dtype.type(lo)).view(f"u{v.dtype.itemsize}")
        else:
            residuals = _unsigned_view(np.subtract(v, lo))
        counts = np.bincount(_bitlens(residuals), minlength=65)
        widths, _ = choose_classes(counts, full_width, n)
        if widths is None:
            widths = [full_width] * _N_CLASSES
    widths = sorted(int(w) for w in widths)
    while len(widths) < _N_CLASSES:
        widths.append(widths[-1])
    cls = _classes_of(residuals, widths)
    bufs = {"sel": pack_bits(cls, 2)}
    # single stable counting-sort gather (radix argsort on uint8) replaces
    # four masked extracts — one gather pass instead of 4 compare+gathers
    counts4 = np.bincount(cls, minlength=_N_CLASSES)
    if int(np.count_nonzero(counts4)) <= 1:
        sorted_res = residuals  # all values share one class: already "sorted"
    else:
        sorted_res = residuals[np.argsort(cls, kind="stable")]
    offs = np.concatenate(([0], np.cumsum(counts4)))
    class_counts = []
    layouts = []
    for c in range(_N_CLASSES):
        w = int(widths[c])
        sel = sorted_res[offs[c] : offs[c + 1]]
        class_counts.append(int(len(sel)))
        layouts.append(_layout_of(w))
        if not len(sel):
            bufs[f"c{c}"] = b""
        elif layouts[c] == "words":
            bufs[f"c{c}"] = pack_words(sel, w)
        else:  # bits layout; byte widths take pack_bits' memcpy fast path
            bufs[f"c{c}"] = pack_bits(sel, w)
    params = {
        "ref": lo,
        "widths": [int(w) for w in widths],
        "count": n,
        "class_counts": class_counts,
        "layouts": layouts,
    }
    return bufs, params


def decode(bufs: dict, params: dict, dtype=np.int64) -> np.ndarray:
    n = int(params["count"])
    dtype = np.dtype(dtype)
    if n == 0:
        return np.zeros(0, dtype=dtype)
    widths = params["widths"]
    class_counts = params["class_counts"]
    # artifacts written before the layouts field used pack_bits throughout
    layouts = params.get("layouts") or ["bits"] * _N_CLASSES
    # narrow accumulation: for ≤4-byte targets whose residuals all fit 32
    # bits, do the scatter + reference add in uint32 (wrap-around-exact mod
    # 2^32 since the true value fits the target) — halves memory traffic
    # and drops the int64 conversion pass entirely
    narrow = dtype.itemsize <= 4 and max(int(w) for w in widths) <= 32
    acc_dt = np.uint32 if narrow else np.uint64
    parts = []
    for c in range(_N_CLASSES):
        cnt = int(class_counts[c])
        if not cnt:
            continue
        if layouts[c] == "words":
            vals = unpack_words(bufs[f"c{c}"], cnt, int(widths[c]))
        else:
            vals = unpack_bits(bufs[f"c{c}"], cnt, int(widths[c]))
        parts.append(vals.astype(acc_dt, copy=False))
    if len(parts) == 1:
        out = np.array(parts[0], dtype=acc_dt, copy=True)
    else:
        # one stable counting-sort scatter instead of 4 masked assigns
        cls = unpack_bits(bufs["sel"], n, 2)
        out = np.empty(n, dtype=acc_dt)
        out[np.argsort(cls, kind="stable")] = np.concatenate(parts)
    ref = int(params["ref"])
    if narrow:
        out += acc_dt(ref & 0xFFFFFFFF)
        if dtype.itemsize == 4:
            return out.view(dtype)
        return out.view(np.int32).astype(dtype, copy=False)
    if dtype.kind == "u" and dtype.itemsize == 8:
        # uint64: ref may exceed int64 range; stay unsigned (wrap-around exact)
        out += np.uint64(ref & 0xFFFFFFFFFFFFFFFF)
        return out
    out64 = out.view(np.int64)
    out64 += ref
    return out64.astype(dtype, copy=False)
