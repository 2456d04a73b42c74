"""Mergeable sketches for streaming statistics (HyperLogLog).

The stats pass caps exact distinct tracking at a few thousand values; at
10^12 rows a high-cardinality column (doc_id) needs a sketch. This HLL
(Flajolet et al. 2007, standard bias correction) is numpy-vectorized,
mergeable (elementwise max of registers) — the per-batch partial shape
the repo's aggregation guidance prescribes.
"""

from __future__ import annotations

import numpy as np

__all__ = ["HllSketch", "hll_add_hashes", "LogQuantileSketch"]

_U = np.uint64


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> _U(30))) * _U(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U(27))) * _U(0x94D049BB133111EB)
    return x ^ (x >> _U(31))


class HllSketch:
    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = registers if registers is not None else np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> "HllSketch":
        hll_add_hashes(self.registers, self.p, hashes)
        return self

    def merge(self, other: "HllSketch") -> "HllSketch":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:  # small-range correction
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "HllSketch":
        p = blob[0]
        return cls(p, np.frombuffer(blob[1:], dtype=np.uint8).copy())


def hll_add_hashes(registers: np.ndarray, p: int, hashes: np.ndarray) -> None:
    """Vectorized register update from 64-bit hashes."""
    h = _mix64(np.ascontiguousarray(hashes, dtype=np.uint64))
    idx = (h >> _U(64 - p)).astype(np.int64)
    rest = (h << _U(p)) | (_U(1) << _U(p - 1))  # sentinel bit bounds rho
    # leading zeros via exact float64 log2 of each 32-bit half
    hi = (rest >> _U(32)).astype(np.float64)
    lo = (rest & _U(0xFFFFFFFF)).astype(np.float64)
    lz = np.where(
        hi > 0,
        31 - np.floor(np.log2(np.maximum(hi, 1.0))),
        63 - np.floor(np.log2(np.maximum(lo, 1.0))),
    ).astype(np.int64)
    rho = (lz + 1).astype(np.uint8)
    np.maximum.at(registers, idx, rho)


class LogQuantileSketch:
    """Mergeable relative-error quantile sketch for float columns — the
    scale path where the exact integer-histogram quantiles
    (``functions/quantiles.py``) don't apply because the value domain is
    continuous (latencies, scores, prices).

    Log-bucketed (Morris/Karnin-lineage "DDSketch idea": bucket i holds
    values in ``[(1+eps)^i, (1+eps)^(i+1))``), so any returned quantile
    is within relative error ~eps of a true rank-``ceil(q*n)`` element —
    a GUARANTEE, not an expectation, and merge is exact (bucket-count
    addition), so per-batch partials compose associatively regardless of
    Ray's block composition. Zeros and negatives get an exact zero
    bucket and mirrored negative buckets. Numpy-vectorized adds; the
    serialized form is kilobytes (sparse index+count pairs).
    """

    def __init__(self, eps: float = 0.01):
        if not 0 < eps < 1:
            raise ValueError("eps must be in (0, 1)")
        self.eps = eps
        self._g = np.log1p(eps)  # bucket width in log space
        self.pos: dict[int, int] = {}
        self.neg: dict[int, int] = {}
        self.n_zero = 0

    def _bucketize(self, mag: np.ndarray, store: dict) -> None:
        idx = np.floor(np.log(mag) / self._g).astype(np.int64)
        u, c = np.unique(idx, return_counts=True)
        for i, k in zip(u.tolist(), c.tolist()):
            store[i] = store.get(i, 0) + k

    def add(self, values: np.ndarray) -> "LogQuantileSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        self.n_zero += int((v == 0).sum())
        p = v[v > 0]
        if len(p):
            self._bucketize(p, self.pos)
        m = v[v < 0]
        if len(m):
            self._bucketize(-m, self.neg)
        return self

    def merge(self, other: "LogQuantileSketch") -> "LogQuantileSketch":
        if other.eps != self.eps:
            raise ValueError("cannot merge sketches with different eps")
        for src, dst in ((other.pos, self.pos), (other.neg, self.neg)):
            for i, k in src.items():
                dst[i] = dst.get(i, 0) + k
        self.n_zero += other.n_zero
        return self

    @property
    def count(self) -> int:
        return self.n_zero + sum(self.pos.values()) + sum(self.neg.values())

    def _bucket_mid(self, i: int, sign: int) -> float:
        # geometric midpoint of [(1+eps)^i, (1+eps)^(i+1))
        return sign * float(np.exp((i + 0.5) * self._g))

    def quantile(self, q: float) -> float:
        """Value within ~eps relative error of the rank-``ceil(q*n)``
        element of the sorted multiset (ties to the containing bucket's
        geometric midpoint; exact 0.0 for the zero bucket)."""
        n = self.count
        if n == 0:
            raise ValueError("empty sketch")
        target = max(1, int(np.ceil(q * n)))
        # negatives ascend from most-negative (largest magnitude bucket)
        run = 0
        for i in sorted(self.neg, reverse=True):
            run += self.neg[i]
            if run >= target:
                return self._bucket_mid(i, -1)
        run += self.n_zero
        if run >= target and self.n_zero:
            return 0.0
        for i in sorted(self.pos):
            run += self.pos[i]
            if run >= target:
                return self._bucket_mid(i, +1)
        raise AssertionError("unreachable: cumulative count exhausted")

    def serialize(self) -> bytes:
        import struct

        def pack(d: dict) -> bytes:
            idx = np.fromiter(d.keys(), np.int64, len(d))
            cnt = np.fromiter(d.values(), np.int64, len(d))
            return struct.pack("<I", len(d)) + idx.tobytes() + cnt.tobytes()

        return struct.pack("<dq", self.eps, self.n_zero) + pack(self.pos) + pack(self.neg)

    @classmethod
    def deserialize(cls, blob: bytes) -> "LogQuantileSketch":
        import struct

        eps, n_zero = struct.unpack_from("<dq", blob, 0)
        off = 16
        out = cls(eps=eps)
        out.n_zero = n_zero
        for store_name in ("pos", "neg"):
            (m,) = struct.unpack_from("<I", blob, off)
            off += 4
            idx = np.frombuffer(blob, np.int64, m, off)
            off += 8 * m
            cnt = np.frombuffer(blob, np.int64, m, off)
            off += 8 * m
            setattr(out, store_name, dict(zip(idx.tolist(), cnt.tolist())))
        return out
