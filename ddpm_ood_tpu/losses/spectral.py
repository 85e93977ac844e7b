"""Jukebox spectral loss: MSE between FFT magnitudes over the spatial dims.

Parity with monai-generative's JukeboxLoss(spatial_dims, fft_norm="ortho",
reduction="mean") as used by the reference VQ-VAE trainer (vqvae_trainer.py:91-92,
applied at :246-249).

TPU note: jnp.fft lowers to XLA's FFT; for the model sizes here (<=160^3 latents)
this is bandwidth-bound and fuses with the surrounding elementwise math.
"""

from __future__ import annotations

import jax.numpy as jnp


def fft_amplitude(x: jnp.ndarray, spatial_dims: int, norm: str = "ortho") -> jnp.ndarray:
    """|FFT(x)| over the spatial axes of a channel-last (B, *spatial, C) array."""
    axes = tuple(range(1, 1 + spatial_dims))
    f = jnp.fft.fftn(x.astype(jnp.float32), axes=axes, norm=norm)
    return jnp.sqrt(jnp.square(f.real) + jnp.square(f.imag))


def jukebox_loss(
    recon: jnp.ndarray,
    target: jnp.ndarray,
    spatial_dims: int,
    norm: str = "ortho",
) -> jnp.ndarray:
    a = fft_amplitude(recon, spatial_dims, norm)
    b = fft_amplitude(target, spatial_dims, norm)
    return jnp.mean(jnp.square(a - b))
