"""ctypes bindings for the native bed codec, with lazy on-demand build.

The shared library is compiled once per environment from
native/src/bed_codec.cpp with g++ -O3 -fopenmp; when no toolchain is
available the callers (data/plink.py) silently fall back to the vectorised
NumPy implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "bed_codec.cpp")
_LIB = os.path.join(_HERE, "libbed_codec.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
             _SRC, "-o", _LIB + ".tmp"],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except Exception:
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.bed_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.bed_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int,
        ]
        lib.impute_major.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        lib.col_stats.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode(payload: np.ndarray, n: int, m: int, mode: str = "A",
           threads: int = 0) -> np.ndarray:
    lib = _load()
    payload = np.ascontiguousarray(payload, dtype=np.uint8)
    out = np.empty((n, m), dtype=np.int8)
    lib.bed_decode(
        payload.ctypes.data, n, m, out.ctypes.data,
        1 if mode == "D" else 0, threads,
    )
    return out


def encode(geno: np.ndarray, threads: int = 0) -> np.ndarray:
    lib = _load()
    geno = np.ascontiguousarray(geno, dtype=np.int8)
    n, m = geno.shape
    bpsnp = (n + 3) // 4
    out = np.empty(m * bpsnp, dtype=np.uint8)
    lib.bed_encode(geno.ctypes.data, n, m, out.ctypes.data, threads)
    return out


def impute_major_inplace(geno: np.ndarray, threads: int = 0) -> np.ndarray:
    lib = _load()
    assert geno.dtype == np.int8 and geno.flags.c_contiguous
    n, m = geno.shape
    lib.impute_major(geno.ctypes.data, n, m, threads)
    return geno


def col_stats(geno: np.ndarray, threads: int = 0):
    lib = _load()
    geno = np.ascontiguousarray(geno, dtype=np.int8)
    n, m = geno.shape
    mean = np.empty(m)
    s = np.empty(m)
    sqrt_ssd = np.empty(m)
    lib.col_stats(
        geno.ctypes.data, n, m, mean.ctypes.data, s.ctypes.data,
        sqrt_ssd.ctypes.data, threads,
    )
    return {"mean": mean, "sum": s, "sqrt_ssd": sqrt_ssd}
