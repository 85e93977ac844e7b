"""Jukebox spectral loss: MSE between FFT magnitudes over the spatial dims.

Parity with monai-generative's JukeboxLoss(spatial_dims, fft_norm="ortho",
reduction="mean") as used by the reference VQ-VAE trainer (vqvae_trainer.py:91-92,
applied at :246-249).

TPU note: the FFT HLO is not implemented on all TPU runtimes (the experimental
single-chip axon tunnel used here hangs/errors on it — and a runtime probe can
HANG at compile, so detection must be static). On the `tpu` backend the
amplitude is therefore computed via an explicit separable DFT as REAL cos/sin
matmuls (no complex dtype, rides the MXU; exact same magnitudes, O(N) extra
factor per axis — negligible at VQ-VAE training resolutions). CPU/GPU use
jnp.fft. Set DDPM_OOD_USE_XLA_FFT=1 to force jnp.fft on TPU runtimes that do
implement it.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def _use_native_fft() -> bool:
    if os.environ.get("DDPM_OOD_USE_XLA_FFT"):
        return True
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=32)
def _dft_mats(n: int, norm: str):
    # cache NUMPY constants: caching jnp arrays would capture tracers when the
    # first call happens under jit and leak them into later traces
    k = np.arange(n)
    ang = -2.0 * np.pi * np.outer(k, k) / n
    scale = 1.0 / np.sqrt(n) if norm == "ortho" else 1.0
    return (
        (np.cos(ang) * scale).astype(np.float32),
        (np.sin(ang) * scale).astype(np.float32),
    )


def _apply_axis(re: jnp.ndarray, im: jnp.ndarray, ax: int, norm: str):
    """One separable DFT stage along `ax` using real arithmetic:
    (re + i im) @ (C + i S) = (re@C - im@S) + i(re@S + im@C)."""
    c_np, s_np = _dft_mats(re.shape[ax], norm)
    c, s = jnp.asarray(c_np), jnp.asarray(s_np)

    def mm(x, m):
        return jnp.moveaxis(
            jnp.tensordot(jnp.moveaxis(x, ax, -1), m, axes=([-1], [0])), -1, ax
        )

    new_re = mm(re, c) - mm(im, s)
    new_im = mm(re, s) + mm(im, c)
    return new_re, new_im


def fft_amplitude(x: jnp.ndarray, spatial_dims: int, norm: str = "ortho") -> jnp.ndarray:
    """|FFT(x)| over the spatial axes of a channel-last (B, *spatial, C) array."""
    axes = tuple(range(1, 1 + spatial_dims))
    xf = x.astype(jnp.float32)
    if _use_native_fft():
        f = jnp.fft.fftn(xf, axes=axes, norm=norm)
        return jnp.sqrt(jnp.square(f.real) + jnp.square(f.imag))
    re, im = xf, jnp.zeros_like(xf)
    for ax in axes:
        re, im = _apply_axis(re, im, ax, norm)
    return jnp.sqrt(jnp.square(re) + jnp.square(im))


def jukebox_loss(
    recon: jnp.ndarray,
    target: jnp.ndarray,
    spatial_dims: int,
    norm: str = "ortho",
) -> jnp.ndarray:
    a = fft_amplitude(recon, spatial_dims, norm)
    b = fft_amplitude(target, spatial_dims, norm)
    return jnp.mean(jnp.square(a - b))
