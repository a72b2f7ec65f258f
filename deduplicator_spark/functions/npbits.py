"""Shared numpy bit-twiddling used by both the streaming hot path and the
single-process oracle fixture builder — one implementation so the popcount
the state operators match with is BY CONSTRUCTION the popcount the
cross-engine fixtures were derived with."""

from __future__ import annotations

import numpy as np

U64 = np.uint64
MASK64 = (1 << 64) - 1

_M1 = U64(0x5555555555555555)
_M2 = U64(0x3333333333333333)
_M4 = U64(0x0F0F0F0F0F0F0F0F)
_H01 = U64(0x0101010101010101)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR) — numpy<2 has no bitwise_count."""
    x = x - ((x >> U64(1)) & _M1)
    x = (x & _M2) + ((x >> U64(2)) & _M2)
    x = (x + (x >> U64(4))) & _M4
    return (x * _H01) >> U64(56)


def to_signed64(values) -> list:
    """uint64 values -> Spark signed-long two's-complement wrap,
    vectorized (an int64 view, no per-element Python)."""
    return np.asarray(values, dtype=U64).view(np.int64).tolist()


def to_unsigned64(values) -> np.ndarray:
    """Spark signed-long values -> uint64 array (the inverse
    two's-complement reinterpretation, also vectorized)."""
    return np.asarray(values, dtype=np.int64).view(U64)
