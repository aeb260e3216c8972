"""ctypes loader for the native host kernels (builds on first use).

Falls back cleanly: callers check ``available()`` and use SciPy paths when the
toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libhostkernels.so")
_lib = None


def _build():
    # build to a process-unique temp path and move into place atomically so
    # concurrent builders (e.g. parallel pytest workers) never load a
    # half-written .so
    src = os.path.join(_HERE, "host_kernels.cpp")
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp, src]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, _SO)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (
            os.path.getmtime(_SO)
            < os.path.getmtime(os.path.join(_HERE, "host_kernels.cpp"))):
        _build()
    lib = ctypes.CDLL(_SO)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_dp = ctypes.POINTER(ctypes.c_double)
    lib.radius_neighbor_counts.restype = ctypes.c_int
    lib.radius_neighbor_counts.argtypes = [c_dp, ctypes.c_int, ctypes.c_int,
                                           ctypes.c_double, c_i32p]
    lib.radius_neighbors_ell.restype = None
    lib.radius_neighbors_ell.argtypes = [c_dp, ctypes.c_int, ctypes.c_int,
                                         ctypes.c_double, ctypes.c_int,
                                         c_i32p, c_dp]
    lib.weld_nodes.restype = ctypes.c_int
    lib.weld_nodes.argtypes = [c_dp, ctypes.c_int, ctypes.c_int,
                               ctypes.c_double, c_i32p]
    lib.rcm_ordering.restype = None
    lib.rcm_ordering.argtypes = [ctypes.c_int, c_i32p, c_i32p, c_i32p]
    _lib = lib
    return lib


def available():
    try:
        _load()
        return True
    except Exception:
        return False


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def radius_neighbors_ell(X, r0):
    """ELL neighbor lists + reference-filter weights for the spatial density
    filter. Returns (idx (n, kmax) int32, wts (n, kmax) float64)."""
    lib = _load()
    X = np.ascontiguousarray(np.asarray(X, dtype=np.float64))
    n, dim = X.shape
    counts = np.zeros(n, dtype=np.int32)
    kmax = lib.radius_neighbor_counts(_dp(X), n, dim, float(r0), _ip(counts))
    idx = np.zeros((n, kmax), dtype=np.int32)
    wts = np.zeros((n, kmax), dtype=np.float64)
    lib.radius_neighbors_ell(_dp(X), n, dim, float(r0), kmax, _ip(idx),
                             _dp(wts))
    return idx, wts


def weld_nodes(X, tol=1e-9):
    """Coordinate deduplication: returns (labels (n,), nunique)."""
    lib = _load()
    X = np.ascontiguousarray(np.asarray(X, dtype=np.float64))
    n, dim = X.shape
    labels = np.zeros(n, dtype=np.int32)
    nunique = lib.weld_nodes(_dp(X), n, dim, float(tol), _ip(labels))
    return labels, nunique


def rcm_ordering(rowptr, colidx):
    """Reverse Cuthill-McKee permutation of a CSR adjacency graph."""
    lib = _load()
    rowptr = np.ascontiguousarray(np.asarray(rowptr, dtype=np.int32))
    colidx = np.ascontiguousarray(np.asarray(colidx, dtype=np.int32))
    n = rowptr.shape[0] - 1
    perm = np.zeros(n, dtype=np.int32)
    lib.rcm_ordering(n, _ip(rowptr), _ip(colidx), _ip(perm))
    return perm
