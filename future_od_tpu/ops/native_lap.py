"""Native (C++) linear-sum-assignment solver with a scipy fallback.

The reference leans on scipy's C++ Jonker–Volgenant solver
(`ConditionalDETR.models.matcher`, `paper.py:549`). We bundle our own C++
implementation (`native/lap.cpp`, built into `_lap.so` by `native/build.sh` or
`pip install -e .`) and load it through ctypes; if the shared library is not
built we fall back to scipy, which implements the same algorithm.
"""
from __future__ import annotations

import ctypes
import os
from typing import Tuple

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.path.join(here, "native", "_lap.so"),
        os.path.join(os.path.dirname(__file__), "_lap.so"),
    ]
    for path in candidates:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.lap_solve.argtypes = [
                    ctypes.c_int,
                    ctypes.c_int,
                    np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                ]
                lib.lap_solve.restype = ctypes.c_int
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def linear_sum_assignment(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Solve min-cost assignment on an (M, N) matrix.

    Returns (row_ind, col_ind) of the min(M, N) optimal pairs, sorted by
    row_ind — the scipy contract.
    """
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    lib = _find_lib()
    if lib is None:
        import scipy.optimize

        return scipy.optimize.linear_sum_assignment(cost)

    M, N = cost.shape
    transposed = False
    if M > N:  # solver expects rows <= cols
        cost = np.ascontiguousarray(cost.T)
        M, N = N, M
        transposed = True
    col_of_row = np.full((M,), -1, dtype=np.int32)
    ret = lib.lap_solve(M, N, cost, col_of_row)
    if ret != 0:  # solver reported failure; fall back
        import scipy.optimize

        rows, cols = scipy.optimize.linear_sum_assignment(cost)
    else:
        rows = np.arange(M, dtype=np.int64)
        cols = col_of_row.astype(np.int64)
    if transposed:
        rows, cols = cols, rows
        order = np.argsort(rows)
        rows, cols = rows[order], cols[order]
    return rows, cols
