"""Test harness: force an 8-virtual-device CPU backend BEFORE jax initializes.

This is the TPU-world "fake backend" (SURVEY.md §4): multi-chip sharding tests run
on CPU with XLA's forced host device count, so no cluster is needed.

NOTE: under the axon TPU tunnel the `JAX_PLATFORMS` env var is overridden by the
plugin, so the platform must be forced via `jax.config` (verified: env-var-only
forcing still selects the tpu backend).
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
if len(jax.devices()) < 8:  # respect an externally-set device count; the
    # multichip tests skip themselves below 8
    import warnings

    warnings.warn(f"running with {len(jax.devices())} virtual devices")
