"""FSDP-style parameter/optimizer sharding over the `data` mesh axis.

The reference's only strategy is DDP with fully replicated parameters
(SURVEY.md §2.3). For the "big" 3D UNet (hundreds of MB of params + Adam
moments) per-chip HBM can be reclaimed by sharding each large parameter along
the data axis — GSPMD then inserts the all-gathers before use and
reduce-scatters after the backward, exactly the ZeRO-3/FSDP communication
pattern, with no change to the train-step code (the same jitted program runs
replicated or sharded depending only on the input shardings).

Usage:
    shardings = fsdp_shardings(mesh, state.params)
    state = state.replace(params=jax.device_put(state.params, shardings), ...)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

# leaves smaller than this stay replicated (sharding tiny arrays costs more in
# collective latency than it saves in HBM)
DEFAULT_MIN_SIZE = 2**16


def _leaf_sharding(mesh: Mesh, x, min_size: int) -> NamedSharding:
    shape = np.shape(x)
    size = int(np.prod(shape)) if shape else 0
    data = mesh.shape[DATA_AXIS]
    if size >= min_size:
        # shard the largest axis divisible by the data-axis extent
        for ax in sorted(range(len(shape)), key=lambda a: -shape[a]):
            if shape[ax] % data == 0:
                spec = [None] * len(shape)
                spec[ax] = DATA_AXIS
                return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def fsdp_shardings(mesh: Mesh, tree, min_size: int = DEFAULT_MIN_SIZE):
    """A pytree of NamedShardings matching `tree` (params or optimizer state)."""
    return jax.tree_util.tree_map(
        lambda x: _leaf_sharding(mesh, x, min_size), tree
    )


def apply_fsdp(mesh: Mesh, state, min_size: int = DEFAULT_MIN_SIZE):
    """Shard a TrainState's params + opt_state (+ the weight-EMA slot when the
    state carries one); step code is unchanged — GSPMD re-specializes the same
    jitted program to the new input shardings."""
    params = jax.device_put(state.params, fsdp_shardings(mesh, state.params, min_size))
    opt_state = jax.device_put(
        state.opt_state, fsdp_shardings(mesh, state.opt_state, min_size)
    )
    state = state.replace(params=params, opt_state=opt_state)
    ema = getattr(state, "ema_params", None)
    if ema is not None:
        state = state.replace(
            ema_params=jax.device_put(ema, fsdp_shardings(mesh, ema, min_size))
        )
    return state


def sharded_bytes_per_device(tree) -> int:
    """Static HBM the tree occupies on ONE device given its current shardings
    (for the --fsdp reduction measurement in scripts/bench_fsdp_hbm.py)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if not hasattr(leaf, "sharding"):
            continue
        shard_shape = leaf.sharding.shard_shape(leaf.shape)
        total += int(np.prod(shard_shape)) * leaf.dtype.itemsize
    return total
