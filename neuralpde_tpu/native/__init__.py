"""Native host-runtime components (C++ via ctypes; no pybind11).

Currently: a high-dimensional Sobol engine (`sobol.cpp`) used by
`ops.sampling` when the requested dimension exceeds the embedded Joe-Kuo
table.  Compiled on demand with g++ and cached next to the source; all
callers fall back to pure Python gracefully when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "sobol.cpp")
_LIB_PATHS = [os.path.join(_HERE, "libsobol.so"),
              os.path.join("/tmp", "neuralpde_tpu_libsobol.so")]

_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        for path in _LIB_PATHS:
            if os.path.exists(path) and os.path.getmtime(path) >= os.path.getmtime(_SRC):
                try:
                    _lib = _bind(ctypes.CDLL(path))
                    return _lib
                except OSError:
                    pass
        for path in _LIB_PATHS:
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", path, _SRC],
                    check=True, capture_output=True, timeout=120)
                _lib = _bind(ctypes.CDLL(path))
                return _lib
            except (OSError, subprocess.SubprocessError):
                continue
        return None


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.sobol_points.argtypes = [ctypes.c_uint32, ctypes.c_uint32,
                                 ctypes.c_uint32,
                                 np.ctypeslib.ndpointer(np.uint32)]
    lib.sobol_points.restype = ctypes.c_int
    lib.sobol_max_dim.restype = ctypes.c_int
    return lib


def available() -> bool:
    return _load() is not None


def sobol_bits_native(points: int, dim: int, skip: int = 0) -> np.ndarray:
    """Sobol bit patterns from the native engine, shape (dim, points)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native sobol engine unavailable (no g++?)")
    out = np.empty((dim, points), dtype=np.uint32)
    rc = lib.sobol_points(points, dim, skip, out)
    if rc != 0:
        raise RuntimeError(f"sobol_points failed with code {rc}")
    return out
