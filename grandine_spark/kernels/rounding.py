"""Coordinate rounding — the engine-wide precision knob.

Reference: lib/spatial/point.go:63-70,129-139 — 8 decimals,
half-AWAY-FROM-ZERO (Go semantics), NOT numpy's default half-to-even.
"""

from __future__ import annotations

import math

import numpy as np

POINT_PRECISION = 8
_SCALE = 10.0**POINT_PRECISION


def round_half_away(v: float, decimals: int = POINT_PRECISION) -> float:
    """Scalar half-away-from-zero rounding (lib/spatial/point.go:129-139)."""
    s = 10.0**decimals
    x = v * s
    if x < 0:
        return math.ceil(x - 0.5) / s
    return math.floor(x + 0.5) / s


def round8(v: float) -> float:
    # inlined round_half_away(v, 8) with the scale precomputed — this is
    # the hottest scalar in the clip kernels (tens of millions of calls
    # per encode stage), where the 10.0**decimals pow was ~40% of the cost
    x = v * _SCALE
    if x < 0:
        return math.ceil(x - 0.5) / _SCALE
    return math.floor(x + 0.5) / _SCALE


def round8_np(a: np.ndarray) -> np.ndarray:
    """Vectorized half-away-from-zero rounding at 8 decimals."""
    x = np.asarray(a, dtype=np.float64) * _SCALE
    return np.where(x < 0, np.ceil(x - 0.5), np.floor(x + 0.5)) / _SCALE
