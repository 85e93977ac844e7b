"""Orbax checkpointing with the reference's logical schema and file layout.

Reference (base.py:133-158, 166-187): a run dir holds a rolling best-on-train-loss
`checkpoint.pth` plus periodic `checkpoint_{N}.pth`, each a dict {epoch (+1),
global_step, model_state_dict (DDP-unwrapped), optimizer_state_dict, best_loss};
resume auto-detects the newest, or a specific epoch via --ddpm_checkpoint_epoch.
The VQ-VAE run also persists `vqvae_config.json` for LDM stage-2 reload
(vqvae_trainer.py:121-123 -> base.py:44-61).

Here: each checkpoint is an Orbax directory `checkpoint` / `checkpoint_{N}` with the
same logical keys; scalars ride the tree. Orbax gives atomic writes, async-friendly
multi-host saving, and zero-copy restore to sharded arrays — the TPU-native
equivalent of torch.save/load.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"^checkpoint_(\d+)$")

# Numerics epoch of the compute graph. History:
#   1: rounds <= 1 — UNet Downsample used XLA "SAME" padding (pads (0, 1) at
#      stride 2).
#   2: round 2+ — torch-window-exact explicit (1, 1) Downsample padding
#      (models/unet.py Downsample). Same param tree, DIFFERENT conv windows:
#      a v1 checkpoint loads without error under v2 but produces shifted
#      reconstructions, silently invalidating results_val.csv statistics.
# save_checkpoint stamps the run dir; resume raises on a mismatched stamp
# (set DDPM_OOD_TPU_ALLOW_NUMERICS_MISMATCH=1 to override) and warns loudly
# when no stamp exists (a run from before stamping was introduced).
NUMERICS_VERSION = 2
_NUMERICS_FILE = "numerics_version.json"


def write_numerics_version(run_dir: str | Path) -> None:
    save_config_json(run_dir, _NUMERICS_FILE, {"numerics_version": NUMERICS_VERSION})


def check_numerics_version(run_dir: str | Path) -> None:
    """Guard a resume/eval against checkpoints trained under different conv
    windows (see NUMERICS_VERSION). Mismatched stamp -> error; missing stamp ->
    loud warning (age unknown)."""
    import os
    import warnings

    stamp = Path(run_dir) / _NUMERICS_FILE
    if not stamp.exists():
        warnings.warn(
            f"{run_dir} has no {_NUMERICS_FILE}: this run predates numerics "
            f"stamping. If it was trained before the torch-window-exact "
            f"Downsample padding change (numerics v2), its checkpoints will "
            f"produce DIFFERENT reconstructions under the current code — "
            f"re-run the validation reconstruction pass (results_val.csv) "
            f"before trusting Z-scores.",
            stacklevel=2,
        )
        return
    found = int(load_config_json(stamp).get("numerics_version", 1))
    if found != NUMERICS_VERSION and not os.environ.get(
        "DDPM_OOD_TPU_ALLOW_NUMERICS_MISMATCH"
    ):
        raise RuntimeError(
            f"checkpoint run {run_dir} was written at numerics_version={found} "
            f"but this build is numerics_version={NUMERICS_VERSION}; its "
            f"weights would load silently yet reconstruct differently. Retrain "
            f"or re-validate, or set DDPM_OOD_TPU_ALLOW_NUMERICS_MISMATCH=1 "
            f"to proceed anyway."
        )

_async_ckptr: Optional[ocp.AsyncCheckpointer] = None


def _checkpointer() -> ocp.Checkpointer:
    return ocp.StandardCheckpointer()


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_ckptr


def save_checkpoint(run_dir: str | Path, name: str, payload: Dict[str, Any]) -> Path:
    """Save a payload tree as `<run_dir>/<name>` — ASYNC: the device->host copy
    happens now, serialization overlaps subsequent training (the rolling
    best-on-train-loss checkpoint can fire every epoch, reference
    ddpm_trainer.py:43-50, so synchronous writes would serialize the loop).
    Waits for the previous in-flight save first; `wait_for_checkpoints()` flushes
    at shutdown. Orbax handles multi-host coordination and atomic overwrite."""
    path = (Path(run_dir) / name).absolute()
    if jax.process_index() == 0:
        write_numerics_version(run_dir)
    ckptr = _async_checkpointer()
    ckptr.wait_until_finished()
    ckptr.save(path, args=ocp.args.StandardSave(payload), force=True)
    return path


def wait_for_checkpoints() -> None:
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def restore_checkpoint(
    path: str | Path, target: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """Restore a payload; `target` (a matching abstract/concrete tree) restores
    arrays with the right shardings/dtypes."""
    ckptr = _checkpointer()
    path = Path(path).absolute()
    if target is not None:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


def checkpoint_keys(path: str | Path) -> list:
    """Top-level keys of a saved checkpoint WITHOUT restoring its arrays.

    Used to detect schema extensions (e.g. the optional ema_model_state_dict
    written by --ema_decay runs) so restore templates can match the saved tree
    structure exactly."""
    path = Path(path).absolute()
    try:
        meta = _checkpointer().metadata(path)
        tree = getattr(meta, "item_metadata", None)
        if tree is None:
            tree = meta
        return list(tree.keys())
    except Exception:
        # metadata API unavailable / older layout: fall back to a full restore
        return list(_checkpointer().restore(path).keys())


def find_checkpoint(
    run_dir: str | Path, epoch: Optional[int] = None
) -> Optional[Path]:
    """Mirror the reference's discovery order (base.py:133-158): an explicit
    `checkpoint_{epoch}`, else the rolling `checkpoint`, else the newest periodic."""
    run_dir = Path(run_dir)
    if epoch is not None:
        p = run_dir / f"checkpoint_{int(epoch)}"
        return p if p.exists() else None
    rolling = run_dir / "checkpoint"
    if rolling.exists():
        return rolling
    periodic = []
    if run_dir.exists():
        for child in run_dir.iterdir():
            m = _CKPT_RE.match(child.name)
            if m:
                periodic.append((int(m.group(1)), child))
    if periodic:
        return max(periodic)[1]
    return None


def to_host(tree):
    """Device arrays -> numpy for serialization-stable payloads."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def replicated_restore_template(mesh, tree):
    """Restore template that works on ANY topology: array leaves become
    abstract jax.ShapeDtypeStruct with a fully-replicated NamedSharding over
    the CURRENT `mesh`.

    Orbax requires concrete shardings to deserialize arrays whenever the
    restoring process set differs from the saving one — multi-process runs,
    but ALSO single-process restores on a different device count (train on an
    8-device pod slice, reconstruct/serve on 1 chip): a plain numpy template
    reads shardings from the checkpoint's sharding file and fails with
    "sharding ... Got None" when those saved devices don't exist. Python
    scalars pass through untouched so the reference's {epoch, global_step,
    best_loss} schema keys restore as saved."""
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec())

    def leaf(x):
        if isinstance(x, (np.ndarray, jax.Array)):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        return x

    return jax.tree_util.tree_map(leaf, tree)


def restore_checkpoint_replicated(path: str | Path, mesh) -> Dict[str, Any]:
    """Topology-agnostic TEMPLATE-LESS restore (the frozen-VQVAE reload path).

    A checkpoint saved on N devices records per-array shardings; a plain
    `restore_checkpoint(path)` replays those and fails on any other topology
    ("Sharding ... Got None"). Here the abstract template is built from the
    checkpoint's OWN metadata (shapes/dtypes — no caller-side tree needed),
    with every array leaf fully replicated over the CURRENT `mesh`, so a
    checkpoint trained on an 8-device pod slice restores on 1 serving chip
    and vice versa. Non-array leaves (the reference's epoch/global_step/
    best_loss scalars) pass their metadata through untouched, which Orbax
    restores as saved. Falls back to the plain restore if the metadata API
    is unavailable (older layouts restore fine without shardings anyway)."""
    from jax.sharding import NamedSharding, PartitionSpec

    path = Path(path).absolute()
    ckptr = _checkpointer()
    try:
        meta = ckptr.metadata(path)
        tree = getattr(meta, "item_metadata", None)
        if tree is None:
            tree = meta
        if hasattr(tree, "keys"):
            tree = dict(tree)
        sharding = NamedSharding(mesh, PartitionSpec())

        def leaf(m):
            shape = getattr(m, "shape", None)
            dtype = getattr(m, "dtype", None)
            if shape is not None and dtype is not None:
                return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)
            return m

        abstract = jax.tree_util.tree_map(leaf, tree)
        return ckptr.restore(path, abstract)
    except Exception:
        return ckptr.restore(path)


def save_config_json(run_dir: str | Path, name: str, config: Dict[str, Any]) -> Path:
    """Persist a JSON config next to the checkpoints (vqvae_config.json parity)."""
    path = Path(run_dir) / name
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(config, f, indent=2, default=str)
    return path


def load_config_json(path: str | Path) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)
