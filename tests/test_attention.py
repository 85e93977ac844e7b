"""Pallas flash attention vs XLA einsum reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_ood_tpu.ops.attention import attention, einsum_attention, flash_attention


@pytest.mark.parametrize("n,d,bq,bk", [(256, 128, 128, 128), (512, 128, 256, 128)])
def test_flash_matches_einsum(n, d, bq, bk):
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    shape = (1, 2, n, d)
    q = jax.random.normal(kq, shape, dtype=jnp.float32)
    k = jax.random.normal(kk, shape, dtype=jnp.float32)
    v = jax.random.normal(kv, shape, dtype=jnp.float32)
    scale = 1.0 / np.sqrt(d)
    ref = einsum_attention(q, k, v, scale)
    out = flash_attention(q, k, v, scale, bq, bk, True)  # interpret on CPU
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_gradients_match():
    rng = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(rng, 3)
    shape = (1, 1, 256, 128)
    q = jax.random.normal(kq, shape)
    k = jax.random.normal(kk, shape)
    v = jax.random.normal(kv, shape)
    scale = 1.0 / np.sqrt(128)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale, 128, 128, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(einsum_attention(q, k, v, scale) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_dispatcher_small_seq_uses_einsum_path():
    # on CPU the dispatcher must never pick the kernel; just check correctness
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 16, 32))
    out = attention(q, q, q, 0.25)
    ref = einsum_attention(q, q, q, 0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
