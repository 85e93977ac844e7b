"""Structural similarity (SSIM) on device — the third reconstruction-
similarity family for OOD scoring (framework extension; the reference scores
MSE + LPIPS only, src/trainers/reconstruct.py:159-191).

Wang et al. 2004 SSIM with Gaussian-weighted local statistics, channel-last,
2D (B, H, W, C) or 3D (B, D, H, W, C), data range [0, 1]. The Gaussian blur
is separable: one depthwise 1-D convolution per spatial axis (O(n·ws) taps
instead of O(n·ws^d)), each mapping to the TPU conv engine. 'VALID' windows
only — no padding bias at the borders, matching the canonical definition.

Constants: window 11, sigma 1.5, k1 0.01, k2 0.03 (the standard instance;
window is clamped to the smallest spatial dim, kept odd, for tiny inputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=None)
def _gaussian_1d(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur(a: jnp.ndarray, kern: np.ndarray) -> jnp.ndarray:
    """Separable depthwise Gaussian over all spatial axes of (B, *spatial, C)."""
    nd = a.ndim - 2
    c = a.shape[-1]
    spatial_chars = "DHW"[-nd:]
    dn = lax.conv_dimension_numbers(
        a.shape,
        (1,) * nd + (1, 1),
        ("N" + spatial_chars + "C", spatial_chars + "IO", "N" + spatial_chars + "C"),
    )
    k = jnp.asarray(kern, dtype=a.dtype)
    for ax in range(nd):
        shape = [1] * nd + [1, c]
        shape[ax] = len(kern)
        kernel = jnp.broadcast_to(k.reshape([len(kern) if i == ax else 1
                                             for i in range(nd)] + [1, 1]), shape)
        a = lax.conv_general_dilated(
            a, kernel, window_strides=(1,) * nd, padding="VALID",
            dimension_numbers=dn, feature_group_count=c,
        )
    return a


def ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    data_range: float = 1.0,
) -> jnp.ndarray:
    """Per-image mean SSIM between x and y, both (B, *spatial, C). Returns (B,).

    Statistics are computed in f32 regardless of input dtype (bf16 local
    variances lose all precision at SSIM's scales)."""
    if x.shape != y.shape:
        raise ValueError(f"shape mismatch {x.shape} vs {y.shape}")
    if x.ndim not in (4, 5):
        raise ValueError(f"expected (B, *spatial, C) with 2 or 3 spatial dims, got {x.shape}")
    ws = min(window_size, min(x.shape[1:-1]))
    ws -= (ws + 1) % 2  # keep odd
    kern = _gaussian_1d(ws, sigma)

    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mu_x = _blur(x, kern)
    mu_y = _blur(y, kern)
    # E[a^2] - E[a]^2 form; the blur is a weighted mean so this is the
    # Gaussian-weighted (biased) local variance, as in the original paper
    var_x = _blur(x * x, kern) - mu_x * mu_x
    var_y = _blur(y * y, kern) - mu_y * mu_y
    cov = _blur(x * y, kern) - mu_x * mu_y

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    ssim_map = ((2.0 * mu_x * mu_y + c1) * (2.0 * cov + c2)) / (
        (mu_x * mu_x + mu_y * mu_y + c1) * (var_x + var_y + c2)
    )
    return jnp.mean(ssim_map, axis=tuple(range(1, ssim_map.ndim)))


def ssim_distance(x: jnp.ndarray, y: jnp.ndarray, **kw) -> jnp.ndarray:
    """1 - SSIM per image: higher = more dissimilar, the same 'higher = more
    OOD' direction as the mse and perceptual_difference columns."""
    return 1.0 - ssim(x, y, **kw)
