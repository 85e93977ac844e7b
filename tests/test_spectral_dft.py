"""DFT-matmul fallback must match jnp.fft exactly (CPU check of the TPU path)."""

import jax.numpy as jnp
import numpy as np

from ddpm_ood_tpu.losses.spectral import _apply_axis, fft_amplitude


def _dft_amp(x, spatial_dims, norm="ortho"):
    axes = tuple(range(1, 1 + spatial_dims))
    re, im = x.astype(jnp.float32), jnp.zeros_like(x, dtype=jnp.float32)
    for ax in axes:
        re, im = _apply_axis(re, im, ax, norm)
    return jnp.sqrt(re**2 + im**2)


def test_real_dft_matches_fft_2d():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 12, 10, 3)).astype(np.float32))
    ref = fft_amplitude(x, 2)  # cpu -> jnp.fft path
    out = _dft_amp(x, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_real_dft_matches_fft_3d():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 6, 5, 4, 1)).astype(np.float32))
    ref = fft_amplitude(x, 3)
    out = _dft_amp(x, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_non_ortho_norm():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 8, 8, 1)).astype(np.float32))
    ref = jnp.abs(jnp.fft.fftn(x, axes=(1, 2)))
    out = _dft_amp(x, 2, norm="backward")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)
