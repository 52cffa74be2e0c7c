"""ctypes bindings for the native (C++) runtime components.

The compute path of this framework is JAX/XLA; the native library provides
host-side runtime pieces in C++ mirroring where the reference uses native
code for its runtime: an independent dense LCP solver (Lemke + principal
pivoting) used as a cross-validation oracle and a low-latency host fallback,
and trajectory-comparison primitives.

Build with `make -C native` (produces libmoby_native.so next to this file).
All entry points degrade gracefully when the library is absent.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LOADED = False


def _load():
    global _LIB, _LOADED
    if _LOADED:
        return _LIB
    _LOADED = True
    path = os.path.join(os.path.dirname(__file__), "libmoby_native.so")
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        dptr = ctypes.POINTER(ctypes.c_double)
        lib.moby_lcp_solve.restype = ctypes.c_int
        lib.moby_lcp_solve.argtypes = [dptr, dptr, ctypes.c_int, dptr]
        lib.moby_lcp_lemke.restype = ctypes.c_int
        lib.moby_lcp_lemke.argtypes = [
            dptr, dptr, ctypes.c_int, dptr, ctypes.c_double, ctypes.c_double
        ]
        lib.moby_lcp_ppm.restype = ctypes.c_int
        lib.moby_lcp_ppm.argtypes = [
            dptr, dptr, ctypes.c_int, dptr, ctypes.c_double
        ]
        lib.moby_traj_linf.restype = ctypes.c_double
        lib.moby_traj_linf.argtypes = [dptr, dptr, ctypes.c_int, ctypes.c_int]
        _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _as_ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def lcp_solve(M, q):
    """Solve an LCP with the native cascade. Returns (z, ok)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    M = np.ascontiguousarray(M, dtype=np.float64)
    q = np.ascontiguousarray(q, dtype=np.float64)
    n = len(q)
    z = np.zeros(n)
    ok = lib.moby_lcp_solve(_as_ptr(M), _as_ptr(q), n, _as_ptr(z))
    return z, bool(ok)


def lcp_lemke(M, q, piv_tol=-1.0, zero_tol=-1.0):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    M = np.ascontiguousarray(M, dtype=np.float64)
    q = np.ascontiguousarray(q, dtype=np.float64)
    n = len(q)
    z = np.zeros(n)
    ok = lib.moby_lcp_lemke(_as_ptr(M), _as_ptr(q), n, _as_ptr(z), piv_tol, zero_tol)
    return z, bool(ok)


def traj_linf(a, b) -> float:
    lib = _load()
    a = np.ascontiguousarray(a, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    assert a.shape == b.shape and a.ndim == 2
    if lib is None:
        return float(np.max(np.abs(a - b)))
    return float(lib.moby_traj_linf(_as_ptr(a), _as_ptr(b), a.shape[0], a.shape[1]))
