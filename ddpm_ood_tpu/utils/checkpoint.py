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
