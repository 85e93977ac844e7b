"""ctypes binding + on-demand build of the native OpenSimplex kernel (csrc/).

The reference's compiled component is numba-JIT'd CPU kernels
(reference src/utils/simplex_noise.py:580-1293). Here the native path is a real
C++/OpenMP shared library, compiled once with g++ and loaded via ctypes (no
pybind11 in this image). Missing compiler -> `available()` is False and callers
fall back to the JAX device path (noise/simplex.py).
"""

from __future__ import annotations

import ctypes
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "csrc" / "opensimplex.cpp"
_LIB_PATH = Path(__file__).resolve().parent / "_libopensimplex.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    from ..utils.native_build import build_and_load

    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        lib = build_and_load(_SRC, _LIB_PATH)
        if lib is None:
            _build_failed = True
            return None
        i64, f64 = ctypes.c_int64, ctypes.c_double
        dptr = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        sptr = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
        iptr = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.opensimplex3_fixed_t_grid.argtypes = [i64, f64, i64, i64, i64, f64, f64, dptr]
        lib.opensimplex3_fixed_t_grid_batch.argtypes = [
            iptr, dptr, i64, i64, i64, i64, f64, f64, dptr,
        ]
        lib.opensimplex3_grid.argtypes = [i64, i64, i64, i64, i64, f64, f64, dptr]
        lib.opensimplex2_grid.argtypes = [i64, i64, i64, i64, f64, f64, dptr]
        lib.opensimplex_perm.argtypes = [i64, sptr, sptr]
        for f in (lib.opensimplex3_fixed_t_grid, lib.opensimplex3_fixed_t_grid_batch,
                  lib.opensimplex3_grid, lib.opensimplex2_grid, lib.opensimplex_perm):
            f.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def noise3_fixed_t_grid(seed: int, t: float, shape: tuple[int, int],
                        octaves: int, persistence: float, frequency: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native OpenSimplex kernel unavailable (g++ missing?) — install a "
            "C++ toolchain for the bit-exact kernel, or use "
            "--simplex_noise_mode=device (reconstruct/serve) for the "
            "on-device statistical noise"
        )
    out = np.empty(shape, dtype=np.float64)
    lib.opensimplex3_fixed_t_grid(
        int(seed), float(t), shape[0], shape[1], int(octaves),
        float(persistence), float(frequency), out,
    )
    return out


def noise3_fixed_t_grid_batch(
    seeds: np.ndarray, ts: np.ndarray, shape: tuple[int, int],
    octaves: int, persistence: float, frequency: float,
) -> np.ndarray:
    """n fixed-T planes in one OpenMP-parallel call; bit-identical to n
    sequential noise3_fixed_t_grid calls with the same (seed, T) pairs."""
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native OpenSimplex kernel unavailable (g++ missing?) — install a "
            "C++ toolchain for the bit-exact kernel, or use "
            "--simplex_noise_mode=device (reconstruct/serve) for the "
            "on-device statistical noise"
        )
    seeds = np.ascontiguousarray(np.asarray(seeds, dtype=np.int64))
    ts = np.ascontiguousarray(np.asarray(ts, dtype=np.float64))
    n = seeds.shape[0]
    assert ts.shape[0] == n
    out = np.empty((n, shape[0], shape[1]), dtype=np.float64)
    lib.opensimplex3_fixed_t_grid_batch(
        seeds, ts, n, shape[0], shape[1], int(octaves),
        float(persistence), float(frequency), out,
    )
    return out


def noise3_grid(seed: int, shape: tuple[int, int, int], octaves: int,
                persistence: float, frequency: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native OpenSimplex kernel unavailable (g++ missing?) — install a "
            "C++ toolchain for the bit-exact kernel, or use "
            "--simplex_noise_mode=device (reconstruct/serve) for the "
            "on-device statistical noise"
        )
    out = np.empty(shape, dtype=np.float64)
    lib.opensimplex3_grid(int(seed), shape[0], shape[1], shape[2], int(octaves),
                          float(persistence), float(frequency), out)
    return out


def noise2_grid(seed: int, shape: tuple[int, int], octaves: int,
                persistence: float, frequency: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native OpenSimplex kernel unavailable (g++ missing?) — install a "
            "C++ toolchain for the bit-exact kernel, or use "
            "--simplex_noise_mode=device (reconstruct/serve) for the "
            "on-device statistical noise"
        )
    out = np.empty(shape, dtype=np.float64)
    lib.opensimplex2_grid(int(seed), shape[0], shape[1], int(octaves),
                          float(persistence), float(frequency), out)
    return out


def perm_tables(seed: int) -> tuple[np.ndarray, np.ndarray]:
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native OpenSimplex kernel unavailable (g++ missing?) — install a "
            "C++ toolchain for the bit-exact kernel, or use "
            "--simplex_noise_mode=device (reconstruct/serve) for the "
            "on-device statistical noise"
        )
    perm = np.empty(256, dtype=np.int16)
    grad3 = np.empty(256, dtype=np.int16)
    lib.opensimplex_perm(int(seed), perm, grad3)
    return perm.astype(np.int64), grad3.astype(np.int64)
