"""Persistent XLA compilation cache (framework-wide).

TPU compiles through a tunneled single chip run minutes per program; every CLI
entry point enables a repo-local disk cache so repeated invocations (training
restarts, reconstruct over many datasets, benchmarks) skip recompilation.
Override the location with DDPM_OOD_COMPILE_CACHE; set it empty to disable.
"""

from __future__ import annotations

import os
from pathlib import Path

_enabled = False


def enable_compilation_cache() -> None:
    global _enabled
    if _enabled:
        return
    import jax

    env = os.environ.get("DDPM_OOD_COMPILE_CACHE")
    if env == "":
        return
    cache_dir = Path(env) if env else Path(__file__).resolve().parents[2] / ".jax_cache"
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:
        pass  # cache is an optimization, never a failure
