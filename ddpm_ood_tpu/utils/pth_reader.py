"""Torch-free reader for PyTorch `.pth` checkpoints.

Deploy hosts for this framework do not need torch installed; this module reads
the two on-disk formats `torch.save` produces — the zipfile container
(torch >= 1.6) and the legacy concatenated-pickle stream — with a RESTRICTED
unpickler (only tensor-rebuild globals and containers are allowed, so a hostile
checkpoint cannot execute code) and returns plain numpy arrays.

Covers the framework's two migration inputs:
  - reference checkpoints (torch `.pth` dicts, reference src/trainers/base.py:166-187)
    via scripts/convert_reference_checkpoint.py, and
  - the licensed lpips 0.1.4 calibration weights (reference
    src/losses/perceptual_loss.py:100-102) via scripts/fetch_lpips_weights.py.

Byte-parity with `torch.load` is asserted in tests/test_pth_reader.py on
crafted checkpoints in both formats.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, Dict

import numpy as np

# torch storage class name -> numpy dtype
_STORAGE_DTYPES = {
    "DoubleStorage": np.dtype("<f8"),
    "FloatStorage": np.dtype("<f4"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("bool"),
}


def _bfloat16_dtype():
    import ml_dtypes  # ships with jax

    return np.dtype(ml_dtypes.bfloat16)


class _StorageRef:
    """A (dtype, key) reference to a storage blob; bytes attach later."""

    def __init__(self, dtype: np.dtype, key: str, numel: int):
        self.dtype, self.key, self.numel = dtype, key, numel
        self.data: np.ndarray | None = None  # 1-D array once materialized


class _LazyTensor:
    """Un-materialized tensor: storage ref + view geometry (elements)."""

    def __init__(self, storage: _StorageRef, offset: int, size, stride):
        self.storage, self.offset = storage, offset
        self.size, self.stride = tuple(size), tuple(stride)

    def materialize(self) -> np.ndarray:
        flat = self.storage.data
        if flat is None:
            raise ValueError(f"storage {self.storage.key} never loaded")
        # Geometry is pickle-controlled: validate it BEFORE as_strided, which
        # would otherwise happily read out of bounds (memory disclosure).
        if len(self.size) != len(self.stride):
            raise ValueError(
                f"corrupt tensor geometry: size {self.size} vs stride "
                f"{self.stride} rank mismatch"
            )
        if (
            self.offset < 0
            or any(int(n) < 0 for n in self.size)
            or any(int(s) < 0 for s in self.stride)
        ):
            raise ValueError(
                f"corrupt tensor geometry: negative offset/size/stride "
                f"(offset={self.offset}, size={self.size}, "
                f"stride={self.stride})"
            )
        numel = 1
        for n in self.size:
            numel *= int(n)
        if numel > 0:
            last = self.offset + sum(
                (int(n) - 1) * int(s) for n, s in zip(self.size, self.stride)
            )
            if last >= flat.size:
                raise ValueError(
                    f"tensor view out of bounds: max element index {last} "
                    f">= storage length {flat.size} "
                    f"(storage {self.storage.key})"
                )
        itemsize = flat.dtype.itemsize
        arr = np.lib.stride_tricks.as_strided(
            flat[self.offset:],
            shape=self.size,
            strides=tuple(s * itemsize for s in self.stride),
        )
        return np.ascontiguousarray(arr)


class _StorageTag:
    def __init__(self, dtype: np.dtype):
        self.dtype = dtype


def _rebuild_tensor_v2(storage, offset, size, stride, *unused):
    return _LazyTensor(storage, offset, size, stride)


def _rebuild_parameter(tensor, *unused):
    return tensor


class _RestrictedUnpickler(pickle.Unpickler):
    """Allows only the globals a torch tensor state_dict pickle needs."""

    _SAFE = {
        ("collections", "OrderedDict"): dict,
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
        ("torch._utils", "_rebuild_tensor"): (
            lambda storage, offset, size, stride: _rebuild_tensor_v2(
                storage, offset, size, stride
            )
        ),
        ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    }

    def find_class(self, module: str, name: str):
        if (module, name) in self._SAFE:
            return self._SAFE[(module, name)]
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageTag(_STORAGE_DTYPES[name])
        if module == "torch" and name == "BFloat16Storage":
            return _StorageTag(_bfloat16_dtype())
        raise pickle.UnpicklingError(
            f"blocked global {module}.{name} — not a tensor state_dict "
            "(this reader only loads plain torch tensor checkpoints)"
        )


class _HeaderUnpickler(pickle.Unpickler):
    """For the legacy-format framing pickles (magic number, protocol version,
    sys_info dict, storage-key list): primitives only. Every global lookup
    and every persistent id is blocked, so a hostile header cannot execute
    code before the restricted payload unpickler takes over."""

    def find_class(self, module: str, name: str):
        raise pickle.UnpicklingError(
            f"blocked global {module}.{name} in checkpoint framing header "
            "(headers contain only primitives)"
        )

    def persistent_load(self, pid):
        raise pickle.UnpicklingError(
            "blocked persistent id in checkpoint framing header"
        )


def _read_header(f) -> Any:
    return _HeaderUnpickler(f).load()


def _map_tree(obj: Any) -> Any:
    """Materialize every _LazyTensor in a (dict/list/tuple) tree."""
    if isinstance(obj, _LazyTensor):
        return obj.materialize()
    if isinstance(obj, dict):
        return {k: _map_tree(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_map_tree(v) for v in obj)
    return obj


def _load_zip(path: str) -> Any:
    with zipfile.ZipFile(path) as zf:
        pkl_name = next(
            n for n in zf.namelist() if n.endswith("/data.pkl") or n == "data.pkl"
        )
        prefix = pkl_name[: -len("data.pkl")]
        storages: Dict[str, _StorageRef] = {}

        def persistent_load(pid):
            kind, tag, key, _location, numel = pid[0], pid[1], pid[2], pid[3], pid[4]
            if kind != "storage" or not isinstance(tag, _StorageTag):
                raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
            if key not in storages:
                ref = _StorageRef(tag.dtype, key, numel)
                raw = zf.read(f"{prefix}data/{key}")
                if len(raw) != int(numel) * tag.dtype.itemsize:
                    raise ValueError(
                        f"corrupt storage {key}: blob is {len(raw)} bytes, "
                        f"declared numel {numel} needs "
                        f"{int(numel) * tag.dtype.itemsize}"
                    )
                ref.data = np.frombuffer(raw, dtype=tag.dtype)
                storages[key] = ref
            return storages[key]

        up = _RestrictedUnpickler(io.BytesIO(zf.read(pkl_name)))
        up.persistent_load = persistent_load
        return _map_tree(up.load())


def _load_legacy(f: io.BufferedReader) -> Any:
    """The pre-1.6 stream: magic, protocol, sys_info, payload pickle, then the
    storage key list and each storage as <int64 numel><raw bytes>."""
    magic = _read_header(f)
    if magic != 0x1950A86A20F9469CFC6C:
        raise ValueError("not a legacy torch checkpoint (bad magic)")
    _read_header(f)  # protocol_version
    _read_header(f)  # sys_info
    storages: Dict[str, _StorageRef] = {}

    def persistent_load(pid):
        kind, tag, key, _location, numel = pid[0], pid[1], pid[2], pid[3], pid[4]
        view_metadata = pid[5] if len(pid) > 5 else None
        if kind != "storage" or not isinstance(tag, _StorageTag):
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        if view_metadata is not None:
            raise pickle.UnpicklingError("storage views are not supported")
        if key not in storages:
            storages[key] = _StorageRef(tag.dtype, key, numel)
        return storages[key]

    up = _RestrictedUnpickler(f)
    up.persistent_load = persistent_load
    result = up.load()

    keys = _read_header(f)
    if not isinstance(keys, (list, tuple)) or not all(
        isinstance(k, str) for k in keys
    ):
        raise ValueError("corrupt legacy checkpoint: storage key list")
    for key in keys:
        ref = storages[key]
        (numel,) = struct.unpack("<q", f.read(8))
        if numel < 0 or (ref.numel is not None and numel != ref.numel):
            raise ValueError(
                f"corrupt storage {key}: stream numel {numel} != "
                f"declared numel {ref.numel}"
            )
        raw = f.read(numel * ref.dtype.itemsize)
        if len(raw) != numel * ref.dtype.itemsize:
            raise ValueError(f"truncated storage {key}")
        ref.data = np.frombuffer(raw, dtype=ref.dtype)
    return _map_tree(result)


def load_pth(path: str) -> Any:
    """`torch.load(path, map_location='cpu')` without torch: returns the
    checkpoint tree with every tensor as a contiguous numpy array."""
    if zipfile.is_zipfile(path):
        return _load_zip(path)
    with open(path, "rb") as f:
        return _load_legacy(f)
