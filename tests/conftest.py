"""Test harness: force an 8-virtual-device CPU backend BEFORE jax initializes.

This is the TPU-world "fake backend" (SURVEY.md §4): multi-chip sharding tests run on
CPU with XLA's forced host device count, so no cluster is needed.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
