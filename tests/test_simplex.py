"""Simplex noise: native kernel parity + device path properties."""

import ctypes

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_ood_tpu.noise import _native
from ddpm_ood_tpu.noise.simplex import Simplex, generate_simplex_noise, simplex_noise_device


def _reference_perm_init(seed: int):
    """Independent reimplementation of the published LCG permutation init
    (the contract at reference simplex_noise.py:559-577)."""

    def ovf(x):
        return ctypes.c_int64(x).value

    perm = np.zeros(256, dtype=np.int64)
    pg3 = np.zeros(256, dtype=np.int64)
    source = np.arange(256)
    for _ in range(3):
        seed = ovf(seed * 6364136223846793005 + 1442695040888963407)
    for i in range(255, -1, -1):
        seed = ovf(seed * 6364136223846793005 + 1442695040888963407)
        r = int((seed + 31) % (i + 1))
        if r < 0:
            r += i + 1
        perm[i] = source[r]
        pg3[i] = int((perm[i] % 24) * 3)
        source[r] = source[i]
    return perm, pg3


needs_native = pytest.mark.skipif(
    not _native.available(), reason="native opensimplex unavailable"
)


@needs_native
@pytest.mark.parametrize("seed", [0, 1, 12345, -987654321, 2**40])
def test_native_perm_matches_lcg_spec(seed):
    perm, grad3 = _native.perm_tables(seed)
    p2, g2 = _reference_perm_init(seed)
    np.testing.assert_array_equal(perm, p2)
    np.testing.assert_array_equal(grad3, g2)


@needs_native
def test_native_noise_deterministic_and_bounded():
    a = _native.noise3_fixed_t_grid(42, 500.0, (32, 32), 6, 0.8, 64)
    b = _native.noise3_fixed_t_grid(42, 500.0, (32, 32), 6, 0.8, 64)
    np.testing.assert_array_equal(a, b)
    # fractal sum bound: sum_o 0.8^o < 5; single octave is in [-1, 1]
    assert np.abs(a).max() < 5.0
    assert a.std() > 0.01  # not degenerate


@needs_native
def test_native_t_plane_variation():
    a = _native.noise3_fixed_t_grid(42, 100.0, (16, 16), 2, 0.8, 16)
    b = _native.noise3_fixed_t_grid(42, 900.0, (16, 16), 2, 0.8, 16)
    assert not np.allclose(a, b)


@needs_native
def test_generate_simplex_noise_shape_and_decorrelation():
    np.random.seed(0)
    simplex = Simplex()
    noise = generate_simplex_noise(simplex, (2, 16, 16, 3), np.array([10, 500]))
    assert noise.shape == (2, 16, 16, 3)
    assert noise.dtype == np.float32
    # channels come from fresh seeds -> decorrelated
    assert not np.allclose(noise[0, ..., 0], noise[0, ..., 1])


@needs_native
def test_batched_planes_bitexact_vs_sequential():
    # the batch entry point must agree with n sequential per-plane calls
    seeds = np.array([7, -3, 123456789, 42], dtype=np.int64)
    ts = np.array([1.0, 400.0, 999.0, 400.0])
    batch = _native.noise3_fixed_t_grid_batch(seeds, ts, (16, 16), 6, 0.8, 64)
    for k in range(4):
        one = _native.noise3_fixed_t_grid(int(seeds[k]), float(ts[k]), (16, 16), 6, 0.8, 64)
        np.testing.assert_array_equal(batch[k], one)


@needs_native
def test_generate_simplex_noise_fast_path_matches_serial():
    # same global-RNG stream -> identical seeds -> identical noise, whether
    # rendered by the batched fast path or the per-plane loop
    np.random.seed(7)
    fast = generate_simplex_noise(Simplex(), (4, 16, 16, 2), np.array([5, 50, 500, 900]))
    np.random.seed(7)
    import ddpm_ood_tpu.noise.simplex as sx_mod

    orig = sx_mod._native.available
    sx_mod._native.available = lambda: False  # force the sequential branch
    try:
        slow = generate_simplex_noise(Simplex(), (4, 16, 16, 2), np.array([5, 50, 500, 900]))
    finally:
        sx_mod._native.available = orig
    np.testing.assert_array_equal(fast, slow)


def test_device_noise_properties():
    rng = jax.random.PRNGKey(0)
    t = jnp.array([100, 500], dtype=jnp.int32)
    noise = simplex_noise_device(rng, (2, 16, 16, 1), t, octaves=3)
    assert noise.shape == (2, 16, 16, 1)
    n = np.asarray(noise)
    assert np.isfinite(n).all()
    # normalised to ~unit variance per sample
    np.testing.assert_allclose(n.reshape(2, -1).std(axis=1), 1.0, atol=0.05)
    # smoothness: neighbour correlation should be high vs white noise
    flat = n[0, :, :, 0]
    corr = np.corrcoef(flat[:-1].ravel(), flat[1:].ravel())[0, 1]
    assert corr > 0.5


def test_device_noise_jit_and_vmap_safe():
    f = jax.jit(
        lambda key, t: simplex_noise_device(key, (2, 8, 8, 1), t, octaves=2)
    )
    out = f(jax.random.PRNGKey(1), jnp.array([5, 7], dtype=jnp.int32))
    assert out.shape == (2, 8, 8, 1)
