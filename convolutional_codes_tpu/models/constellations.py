"""Gray-coded unit-power QAM constellations.

Point tables are numerically identical to the reference
(``common/constellations.c:8-32``): index 1 → 2-point diagonal BPSK, 2 → QPSK,
3 → 8-point cross "8-QAM".  Points are [2^m, 2] float32 (I, Q) with unit
average power.  ``min_sq_distance`` reproduces the reference demapper's
normalization constant ``ndist`` — the squared distance between points 0 and
1 (``demapper.c:42-45``), *by that definition*, not the true minimum.
"""

from __future__ import annotations

import functools

import numpy as np

_S2 = 0.707107          # 1/sqrt(2) as stored in constellations.c
_A = 0.408248           # 1/sqrt(6)
_B = 1.224745           # 3/sqrt(6)

_TABLES = {
    1: np.array([[_S2, _S2],
                 [-_S2, -_S2]], dtype=np.float32),
    2: np.array([[_S2, _S2],
                 [_S2, -_S2],
                 [-_S2, _S2],
                 [-_S2, -_S2]], dtype=np.float32),
    3: np.array([[_A, _A], [_A, _B],
                 [-_A, _A], [-_B, _A],
                 [_A, -_A], [_B, -_A],
                 [-_A, -_A], [-_A, -_B]], dtype=np.float32),
}


@functools.lru_cache(maxsize=None)
def get_constellation(num_bits: int) -> np.ndarray:
    """Points [2^num_bits, 2] float32 (reference get_constellation)."""
    if num_bits not in _TABLES:
        raise ValueError(f"no constellation for {num_bits} bits/symbol (have 1-3)")
    return _TABLES[num_bits]


def min_sq_distance(num_bits: int) -> float:
    """Demapper normalization ``ndist``: squared distance of points 0 and 1."""
    c = get_constellation(num_bits)
    d = c[0] - c[1]
    return float(np.float32(d[0] * d[0]) + np.float32(d[1] * d[1]))
