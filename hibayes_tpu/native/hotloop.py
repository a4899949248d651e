"""ctypes binding for the compiled reference-hot-loop baseline (bench.py).

Builds native/src/ref_hotloop.c once per environment with gcc -O3
-march=native; callers fall back to a Python emulation when no toolchain is
available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "ref_hotloop.c")
_LIB = os.path.join(_HERE, "libref_hotloop.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            try:
                subprocess.run(
                    ["gcc", "-O3", "-march=native", "-shared", "-fPIC",
                     _SRC, "-o", _LIB + ".tmp", "-lm"],
                    check=True, capture_output=True, timeout=60,
                )
                os.replace(_LIB + ".tmp", _LIB)
            except Exception:
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None
        lib.ref_hotloop.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def run(X_colmajor: np.ndarray, yadj: np.ndarray, g: np.ndarray,
        xpx: np.ndarray, z: np.ndarray, iters: int) -> None:
    """One call = `iters` full sequential sweeps (reference Bayes.cpp:586-605).
    X_colmajor: (n, m) float64 in FORTRAN (column-major) order."""
    lib = _load()
    n, m = X_colmajor.shape
    assert X_colmajor.flags.f_contiguous and X_colmajor.dtype == np.float64
    lib.ref_hotloop(
        X_colmajor.ctypes.data, n, m, yadj.ctypes.data, g.ctypes.data,
        xpx.ctypes.data, z.ctypes.data, iters,
    )
