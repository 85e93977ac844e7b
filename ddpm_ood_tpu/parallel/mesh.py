"""Device mesh + sharding helpers: the TPU-native replacement for torch DDP/NCCL.

The reference's distributed runtime is DistributedDataParallel over NCCL with
env-var rendezvous (base.py:21-37,160-164; vqvae_trainer.py:28-44,128-141). Here the
equivalent is GSPMD: a `jax.sharding.Mesh` with a `data` axis (and a spare `model`
axis for future tensor/spatial sharding), batches sharded along `data`, params/opt
state replicated (or FSDP-sharded along `data` — see train/ddpm.py), and gradient
all-reduce compiled into the jitted step by XLA as ICI collectives. No explicit
NCCL-style calls anywhere.

Multi-host: `initialize_multihost` wraps `jax.distributed.initialize` (over DCN);
per-host input sharding is handled by the data loader (data/loader.py), and batches
become global arrays via `make_array_from_process_local_data`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: all devices
    model: int = 1


def make_mesh(config: Optional[MeshConfig] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    config = config or MeshConfig()
    n = len(devices)
    model = max(1, config.model)
    data = config.data if config.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over `data`, everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: np.ndarray) -> jax.Array:
    """Device-put a host batch as a global array sharded along `data`.

    A ragged batch (size not divisible by the data-axis extent) is wrap-padded by
    repeating leading samples — the GSPMD analogue of MONAI partition_dataset's
    `even_divisible=True` (reference get_train_and_val_dataloader.py:21-31); the
    OOD scorer's (filename, t) dedup keeps results exact, and for training the
    duplicated samples are statistically harmless, exactly as in the reference.

    Single-host: a straight device_put with the sharding. Multi-host: each process
    contributes its local shard (the loader already partitioned the dataset).
    """
    data_size = mesh.shape[DATA_AXIS]
    procs = jax.process_count()
    # each process holds data_size/procs of the data-axis devices; its local
    # batch must tile them evenly (the loader partitions evenly already, this
    # wrap-pad covers ragged last batches)
    local_multiple = max(1, data_size // procs)
    batch = np.asarray(batch)
    if batch.shape[0] % local_multiple != 0:
        target = (
            (batch.shape[0] + local_multiple - 1) // local_multiple
        ) * local_multiple
        idx = np.arange(target) % batch.shape[0]  # wrap
        batch = batch[idx]
    sharding = batch_sharding(mesh)
    if procs == 1:
        return jax.device_put(batch, sharding)
    # explicit global shape: every process contributes an equal local shard
    # (inference of the global shape from local data is ambiguous and wrong here)
    global_shape = (batch.shape[0] * procs,) + batch.shape[1:]
    return jax.make_array_from_process_local_data(sharding, batch, global_shape)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize for multi-host slices. No-op when single-process
    and no coordinator is configured (mirrors the reference's torchrun-optional DDP)."""
    import os

    if coordinator_address is None and "COORDINATOR_ADDRESS" not in os.environ:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def coordination_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Rendezvous all processes via the coordination service — NOT a device
    collective, so no Gloo/ICI communicator is touched.

    Why it exists: the CPU cross-process collective backend (Gloo) has a hard
    ~30 s key-exchange timeout when a communicator context is first
    initialized. If one process dispatches a collective program while a peer
    is still COMPILING its copy (compile skew easily exceeds 30 s for the big
    sweep programs under host load), the fast process's Gloo init times out
    and the whole job is torn down. Compiling first and meeting at this
    barrier before the first dispatch closes that window. No-op
    single-process."""
    if jax.process_count() <= 1:
        return
    from jax._src.distributed import global_state

    if global_state.client is None:  # not under jax.distributed
        return
    global_state.client.wait_at_barrier(name, timeout_ms)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def pad_batch_to(batch: np.ndarray, multiple: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad the leading dim up to a multiple (for even sharding of ragged last
    batches); returns (padded, valid_mask)."""
    n = batch.shape[0]
    rem = (-n) % multiple
    mask = np.ones((n + rem,), dtype=bool)
    if rem:
        pad_width = [(0, rem)] + [(0, 0)] * (batch.ndim - 1)
        batch = np.pad(batch, pad_width)
        mask[n:] = False
    return batch, mask
