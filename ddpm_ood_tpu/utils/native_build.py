"""Shared build-and-load for the first-party C++ kernels (csrc/).

Used by noise/_native.py (OpenSimplex) and data/_native.py (data loader):
compile with g++ if the .so is missing or older than its source, atomically
(per-process temp + rename — concurrent multi-host processes may race the
build, and a half-written .so must never be dlopen'd), retrying without
OpenMP on toolchains that lack it. Returns None when no compiler is
available; callers latch that and fall back (or raise a pointed error).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence


def build_and_load(
    src: Path, lib_path: Path, link_flags: Sequence[str] = ()
) -> Optional[ctypes.CDLL]:
    if not lib_path.exists() or (
        src.exists() and src.stat().st_mtime > lib_path.stat().st_mtime
    ):
        tmp = lib_path.with_suffix(f".tmp{os.getpid()}.so")
        cmd = [
            "g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-std=c++17",
            str(src), *link_flags, "-o", str(tmp),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            try:  # retry without OpenMP (still correct, single-threaded)
                cmd.remove("-fopenmp")
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            except Exception:
                tmp.unlink(missing_ok=True)
                return None
        os.replace(tmp, lib_path)
    try:
        return ctypes.CDLL(str(lib_path))
    except OSError:
        return None
