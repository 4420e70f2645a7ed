"""ctypes bindings for the native step sampler.

The library is built on demand (`make` in this directory, or
`build_native()`); all callers fall back to the numpy implementation in
sources/ppc.py when the shared object is unavailable, so the framework works
without a toolchain."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libstepsampler.so")
_lib: Optional[ctypes.CDLL] = None


def build_native(quiet: bool = True) -> bool:
    """Compile the shared library in place; returns success."""
    try:
        subprocess.run(["make", "-C", os.path.dirname(__file__)],
                       check=True,
                       capture_output=quiet)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not build_native():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.ppc_cascade_steps.argtypes = [
        ctypes.c_uint64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    lib.ppc_cascade_steps.restype = None
    lib.ppc_sample_count.argtypes = [ctypes.c_uint64, ctypes.c_double]
    lib.ppc_sample_count.restype = ctypes.c_int64
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def cascade_step_arrays(seed: int, n: int, pos, t0, direction,
                        gamma_a: float, gamma_b: float,
                        uniform_length: float = 0.0
                        ) -> Tuple[np.ndarray, ...]:
    """Sample n cascade-like step records natively; returns
    (x, y, z, t, dx, dy, dz) float32 arrays."""
    lib = load()
    if lib is None:
        raise RuntimeError("native step sampler unavailable")
    outs = [np.empty(n, np.float32) for _ in range(7)]
    lib.ppc_cascade_steps(
        ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF), n,
        float(pos[0]), float(pos[1]), float(pos[2]), float(t0),
        float(direction[0]), float(direction[1]), float(direction[2]),
        float(gamma_a), float(gamma_b), float(uniform_length), *outs)
    return tuple(outs)
