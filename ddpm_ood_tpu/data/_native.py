"""ctypes binding + on-demand build of the native data-loading core (csrc/dataload.cpp).

The reference's data pipeline leans on native code inside its dependencies
(MONAI CacheDataset/ThreadDataLoader over nibabel/PIL — reference
src/data/get_train_and_val_dataloader.py:67-138). Here the per-item decode +
transform chain is first-party C++ (npy/NIfTI parse, crop, linear resize,
intensity scale, flips), and a whole cache fill is ONE OpenMP-parallel call —
no GIL ping-pong per item. Missing compiler (or `DDPM_OOD_TPU_NATIVE_LOADER=0`)
-> `available()` is False and callers use the pure-Python TransformChain path,
which this module matches numerically (bit-exact when no resize is involved;
see tests/test_native_loader.py).
"""

from __future__ import annotations

import ctypes
import os
import threading
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "csrc" / "dataload.cpp"
_LIB_PATH = Path(__file__).resolve().parent / "_libdataload.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

#: suffixes the native decoder handles; anything else stays on the Python path
NATIVE_SUFFIXES = (".npy", ".nii", ".nii.gz")

_ERRORS = {
    -1: "unreadable or truncated file",
    -2: "unsupported or malformed file content",
    -3: "rank incompatible with spatial_dimension",
    -5: "item shape differs from the batch shape",
    -6: "bad arguments",
}


class NativeLoaderError(RuntimeError):
    def __init__(self, code: int, path: str):
        super().__init__(f"native loader: {_ERRORS.get(code, f'error {code}')}: {path}")
        self.code = code


def _load() -> Optional[ctypes.CDLL]:
    from ..utils.native_build import build_and_load

    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if os.environ.get("DDPM_OOD_TPU_NATIVE_LOADER", "1") == "0":
            return None
        lib = build_and_load(_SRC, _LIB_PATH, link_flags=("-lz",))
        if lib is None:
            _build_failed = True
            return None
        i64 = ctypes.c_int64
        fptr = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        iptr = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.dl_item.argtypes = [
            ctypes.c_char_p, i64, i64, iptr, i64, i64, i64, i64, fptr, i64, iptr,
        ]
        lib.dl_item.restype = i64
        lib.dl_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), i64, i64, i64, iptr, i64, i64, i64,
            i64, fptr, i64, iptr, iptr, i64,
        ]
        lib.dl_batch.restype = i64
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def supports(path: str) -> bool:
    return str(path).endswith(NATIVE_SUFFIXES)


def _chain_params(chain) -> Tuple[int, int, np.ndarray, int, int, int, int]:
    """Extract the native call parameters from a TransformChain."""
    # None entries mean "leave this dim uncropped" (MONAI semantics) -> -1
    roi_list = [(-1 if r is None else int(r)) for r in (chain.image_roi or [])]
    if roi_list:
        roi = np.asarray(roi_list, dtype=np.int64)
        roi_n = len(roi_list)
    else:
        roi = np.zeros(1, dtype=np.int64)  # non-empty for ndpointer; roi_n=0
        roi_n = 0
    return (
        int(chain.spatial_dimension),
        int(bool(chain.is_grayscale)),
        roi,
        roi_n,
        int(chain.image_size or 0),
        int(bool(chain.add_vflip)),
        int(bool(chain.add_hflip)),
    )


def transform_item(path: str, chain) -> np.ndarray:
    """Native equivalent of `TransformChain(path)`. Raises NativeLoaderError."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    sdim, gray, roi, roi_n, size, vf, hf = _chain_params(chain)
    shape = np.zeros(4, dtype=np.int64)
    # first call with a guess capacity sized for the common case; retry exact
    cap = int(size) ** sdim * 4 if size else 1 << 22
    out = np.empty(cap, dtype=np.float32)
    rc = lib.dl_item(str(path).encode(), sdim, gray, roi, roi_n, size, vf, hf,
                     out, cap, shape)
    if rc > 0:  # buffer too small: exact retry
        cap = int(rc)
        out = np.empty(cap, dtype=np.float32)
        rc = lib.dl_item(str(path).encode(), sdim, gray, roi, roi_n, size, vf, hf,
                         out, cap, shape)
    if rc != 0:
        raise NativeLoaderError(int(rc), str(path))
    logical = tuple(int(s) for s in shape[: sdim + 1])
    n = int(np.prod(logical))
    return np.ascontiguousarray(out[:n].reshape(logical))


def transform_batch(
    paths: Sequence[str], chain, num_threads: int = 8
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode + transform `paths` in one OpenMP-parallel native call.

    Returns (batch (N, C, *spatial) float32, errs (N,) int64). Items with
    errs != 0 hold garbage in their batch row — the caller re-does those on
    the Python path. The batch shape is taken from the first decodable item.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    sdim, gray, roi, roi_n, size, vf, hf = _chain_params(chain)

    # establish the batch item shape from the first item that decodes; its
    # result is reused as that row (DL_SKIP below), not decoded twice
    first_shape: Optional[Tuple[int, ...]] = None
    probe_idx = -1
    item0: Optional[np.ndarray] = None
    for i, p in enumerate(paths):
        try:
            item0 = transform_item(p, chain)
        except NativeLoaderError:
            continue
        first_shape = item0.shape
        probe_idx = i
        break
    if first_shape is None or item0 is None:  # nothing decodable natively
        return (
            np.empty((len(paths), 0), dtype=np.float32),
            np.full(len(paths), -2, dtype=np.int64),
        )

    n = len(paths)
    item_floats = int(np.prod(first_shape))
    expect = np.ones(4, dtype=np.int64)
    expect[: len(first_shape)] = first_shape
    out = np.empty((n, item_floats), dtype=np.float32)
    errs = np.zeros(n, dtype=np.int64)
    out[probe_idx] = item0.reshape(-1)
    errs[probe_idx] = -100  # DL_SKIP: row pre-filled by the probe
    threads = min(int(max(1, num_threads)), os.cpu_count() or 1)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.dl_batch(c_paths, n, sdim, gray, roi, roi_n, size, vf, hf,
                 out.reshape(-1), item_floats, expect, errs, threads)
    return out.reshape((n,) + tuple(first_shape)), errs
