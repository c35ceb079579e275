"""ctypes loader for the native C++ runtime helpers (csrc/edyn_native.cpp).

The reference's entire runtime is C++; here the TPU compute path is XLA and
the native library accelerates the HOST-side runtime: trimesh preprocessing
(edge adjacency), static-grid baking, OBJ parsing and convex hulls. Python
fallbacks exist for every entry point, so the library is an accelerator, not
a dependency. Build with `make -C csrc` (or scripts/build_native.sh).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_lib = None
_tried = False


def lib():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    here = os.path.dirname(os.path.abspath(__file__))
    for cand in (os.path.join(here, "libedyn_native.so"),
                 os.path.join(here, "..", "..", "csrc", "libedyn_native.so")):
        if os.path.exists(cand):
            try:
                _lib = ctypes.CDLL(cand)
                _configure(_lib)
                break
            except OSError:
                _lib = None
    return _lib


def _configure(L):
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    L.edyn_adjacent_normals.argtypes = [
        i64p, ctypes.c_long, f64p, f64p]
    L.edyn_adjacent_normals.restype = None


def adjacent_normals(indices: np.ndarray, normals: np.ndarray) -> np.ndarray:
    """Edge-adjacent normals per triangle edge via the native hash map."""
    L = lib()
    T = len(indices)
    out = np.repeat(np.ascontiguousarray(normals, np.float64)[:, None, :], 3, 1)
    out = np.ascontiguousarray(out)
    L.edyn_adjacent_normals(
        np.ascontiguousarray(indices, np.int64), T,
        np.ascontiguousarray(normals, np.float64), out.reshape(-1))
    return out
