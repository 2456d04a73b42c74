"""Mergeable sketches for streaming statistics (HyperLogLog).

The stats pass caps exact distinct tracking at a few thousand values; at
10^12 rows a high-cardinality column (doc_id) needs a sketch. This HLL
(Flajolet et al. 2007, standard bias correction) is numpy-vectorized,
mergeable (elementwise max of registers) — the per-batch partial shape
the repo's aggregation guidance prescribes.
"""

from __future__ import annotations

import numpy as np

__all__ = ["HllSketch", "hll_add_hashes"]

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
