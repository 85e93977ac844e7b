"""Fused GroupNorm(+SiLU) kernel (ops/groupnorm.py) vs flax GroupNorm numerics.

The Pallas path runs in interpret mode on the CPU test backend, so the kernel
body itself (one-hot-matmul statistics, broadcast, activation) is exercised,
not just the XLA fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ddpm_ood_tpu.ops.groupnorm import groupnorm_act


def _flax_gn(x, scale, bias, groups, act):
    y = nn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=jnp.float32).apply(
        {"params": {"scale": scale, "bias": bias}}, x
    )
    return nn.silu(y) if act == "silu" else y


def _rand(shape, seed=0, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, dtype=dtype)


def test_kernel_matches_flax_2d():
    x = _rand((3, 8, 8, 128), 0)
    scale = _rand((128,), 1) * 0.5 + 1.0
    bias = _rand((128,), 2) * 0.1
    for act in ("none", "silu"):
        got = groupnorm_act(x, scale, bias, 32, act=act, force=True)
        want = _flax_gn(x, scale, bias, 32, act)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_kernel_matches_flax_3d():
    x = _rand((2, 4, 4, 8, 128), 3)
    scale = jnp.ones((128,))
    bias = jnp.zeros((128,))
    got = groupnorm_act(x, scale, bias, 32, act="silu", force=True)
    want = _flax_gn(x, scale, bias, 32, "silu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_kernel_bf16_io():
    x = _rand((2, 8, 8, 256), 4).astype(jnp.bfloat16)
    scale = jnp.ones((256,))
    bias = jnp.zeros((256,))
    got = groupnorm_act(x, scale, bias, 32, act="silu", force=True)
    assert got.dtype == jnp.bfloat16
    want = _flax_gn(x.astype(jnp.float32), scale, bias, 32, "silu")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=2e-2
    )


def test_gradients_match_flax():
    x = _rand((2, 8, 8, 128), 5)
    scale = _rand((128,), 6) * 0.3 + 1.0
    bias = _rand((128,), 7) * 0.1
    cot = _rand((2, 8, 8, 128), 8)

    def loss_fused(x, s, b):
        return jnp.sum(groupnorm_act(x, s, b, 32, act="silu", force=True) * cot)

    def loss_ref(x, s, b):
        return jnp.sum(_flax_gn(x, s, b, 32, "silu") * cot)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_fallback_for_unaligned_channels():
    # C=32 is not lane-aligned: dispatch must fall back and stay correct
    x = _rand((2, 8, 8, 32), 9)
    scale = jnp.ones((32,))
    bias = jnp.zeros((32,))
    got = groupnorm_act(x, scale, bias, 8, act="silu")
    want = _flax_gn(x, scale, bias, 8, "silu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_unet_output_unchanged_by_fusion():
    """The UNet's FusedGroupNormAct modules must reproduce the previous
    GroupNorm+silu composition bit-for-bit in fp32 (same param tree, same
    math) — guarding checkpoint compatibility across the change."""
    from ddpm_ood_tpu.models.unet import make_unet

    unet = make_unet("tiny", 2, 1, 1)
    x = _rand((2, 16, 16, 1), 10)
    t = jnp.array([3, 500], jnp.int32)
    params = unet.init(jax.random.PRNGKey(0), x, t)["params"]
    y = unet.apply({"params": params}, x, t)
    assert y.shape == x.shape
    # param tree still has GroupNorm-style {scale, bias} leaves under norm names
    assert set(params["down_0_res_0"]["norm1"].keys()) == {"scale", "bias"}
    assert set(params["norm_out"].keys()) == {"scale", "bias"}
