"""torch.nn.functional.pad-style latent padding on channel-last arrays.

The reference's `--latent_pad` flag takes a torch `pad` tuple — pairs of
(before, after) starting from the LAST dim of a channel-first tensor, i.e. the last
spatial dim first (train_ddpm.py:26-31, applied at ddpm_trainer.py:80-82, inverted at
src/trainers/reconstruct.py:159-165). We accept the same tuple against our
channel-last layout: the pairs still apply to the spatial dims from last to first.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def _pairs(pad: Sequence[int], spatial: int):
    pairs = [(int(pad[2 * i]), int(pad[2 * i + 1])) for i in range(len(pad) // 2)]
    if len(pairs) > spatial:
        raise ValueError(f"pad tuple {pad} longer than spatial rank {spatial}")
    # torch order: last spatial dim first -> reverse into natural axis order
    pairs = pairs[::-1]
    return [(0, 0)] * (spatial - len(pairs)) + pairs


def pad_torch_style(x: jnp.ndarray, pad: Sequence[int]) -> jnp.ndarray:
    """x: (B, *spatial, C); pad: torch-style flat tuple over spatial dims."""
    spatial = x.ndim - 2
    cfg = [(0, 0)] + _pairs(pad, spatial) + [(0, 0)]
    return jnp.pad(x, cfg)


def unpad_torch_style(x: jnp.ndarray, pad: Sequence[int]) -> jnp.ndarray:
    """Inverse of pad_torch_style (the reference negates the tuple instead)."""
    spatial = x.ndim - 2
    pairs = _pairs(pad, spatial)
    slices = [slice(None)]
    for lo, hi in pairs:
        slices.append(slice(lo, x.shape[len(slices)] - hi if hi else None))
    slices.append(slice(None))
    return x[tuple(slices)]
