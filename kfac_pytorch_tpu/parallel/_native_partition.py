"""ctypes binding for the native block-partition scheduler.

Loads native/libkfac_partition.so (built by `make -C native`; the C++
counterpart of the reference's tcmm native extension role — see
/root/reference/packages/tcmm/). Falls back gracefully: callers check
``available()`` and use the pure-Python implementation otherwise.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    path = os.path.join(root, "native", "libkfac_partition.so")
    lib = ctypes.CDLL(path)
    lib.kfac_block_partition.restype = ctypes.c_double
    lib.kfac_block_partition.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def block_partition(weights: np.ndarray, p: int) -> np.ndarray:
    lib = _load()
    w = np.ascontiguousarray(weights, dtype=np.float64)
    placement = np.zeros(len(w), dtype=np.int64)
    lib.kfac_block_partition(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(len(w)),
        ctypes.c_int64(p),
        placement.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return placement
