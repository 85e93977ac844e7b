"""Losses: LSGAN, Jukebox spectral, LPIPS structure, fake-3D wrapper."""

import jax
import jax.numpy as jnp
import numpy as np

from ddpm_ood_tpu.losses import (
    discriminator_loss,
    generator_adversarial_loss,
    jukebox_loss,
    pad_28_to_32,
)
from ddpm_ood_tpu.losses.lpips import LPIPS, PerceptualLoss, init_lpips_params


def test_lsgan_generator_hand_computed():
    logits = jnp.array([0.5, 1.5])
    # MSE against target 1: ((0.5)^2 + (0.5)^2)/2 = 0.25
    assert np.isclose(float(generator_adversarial_loss(logits)), 0.25)


def test_lsgan_discriminator_hand_computed():
    fake = jnp.array([0.0, 1.0])  # vs 0 -> 0.5
    real = jnp.array([1.0, 0.0])  # vs 1 -> 0.5
    assert np.isclose(float(discriminator_loss(fake, real)), 0.5 * (0.5 + 0.5))


def test_jukebox_zero_on_identical_and_positive_otherwise():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 1)).astype(np.float32))
    assert float(jukebox_loss(x, x, 2)) == 0.0
    y = x + 1.0
    assert float(jukebox_loss(x, y, 2)) > 0.0


def test_jukebox_parseval_scale():
    # with ortho norm, a pure DC offset of c changes only the zero bin by c*sqrt(N)
    h = w = 8
    x = jnp.zeros((1, h, w, 1))
    y = x + 2.0
    # amplitude diff: one bin of magnitude 2*sqrt(h*w); mse = (2*8)^2 / (h*w) = 4
    assert np.isclose(float(jukebox_loss(x, y, 2)), 4.0, rtol=1e-5)


def test_pad_28_to_32():
    x = jnp.zeros((3, 28, 28, 1))
    assert pad_28_to_32(x).shape == (3, 32, 32, 1)


def test_lpips_zero_for_identical_positive_for_different():
    params = init_lpips_params(jax.random.PRNGKey(0), image_hw=32)
    model = LPIPS()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    d_same = model.apply(params, x, x)
    d_diff = model.apply(params, x, y)
    assert d_same.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    assert (np.asarray(d_diff) > 0).all()


def test_lpips_grayscale_tiling():
    params = init_lpips_params(jax.random.PRNGKey(0), image_hw=32)
    model = LPIPS()
    x = jnp.asarray(np.random.default_rng(1).uniform(size=(1, 32, 32, 1)).astype(np.float32))
    d = model.apply(params, x, x * 0.5)
    assert d.shape == (1,) and float(d[0]) > 0


def test_perceptual_fake3d_last_view_quirk_and_fix():
    # volumes must be >=32 per axis: AlexNet's conv/pool chain collapses below
    # that (the reason the reference pads 28->32, reconstruct.py:170-178)
    params = init_lpips_params(jax.random.PRNGKey(0), image_hw=32)
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.uniform(size=(1, 32, 32, 32, 1)).astype(np.float32))
    p = jnp.asarray(rng.uniform(size=(1, 32, 32, 32, 1)).astype(np.float32))
    quirk = PerceptualLoss(dimensions=3, params=params)(y, p)
    fixed = PerceptualLoss(dimensions=3, params=params, average_views=True)(y, p)
    assert quirk.shape == (1,) and float(quirk[0]) > 0
    assert fixed.shape == (1,) and float(fixed[0]) > 0


def test_perceptual_fake3d_per_image_matches_item_loop():
    """3D scores are PER IMAGE: a batch of two different volumes must produce two
    different values, each equal to scoring that volume alone — the reference's
    per-item loop semantics at reconstruction time (reconstruct.py:181-187)."""
    params = init_lpips_params(jax.random.PRNGKey(0), image_hw=32)
    loss = PerceptualLoss(dimensions=3, params=params)
    rng = np.random.default_rng(5)
    y = jnp.asarray(rng.uniform(size=(2, 32, 32, 32, 1)).astype(np.float32))
    p0 = y.at[0].add(0.3 * jnp.asarray(
        rng.uniform(size=(32, 32, 32, 1)).astype(np.float32)))
    p = p0.at[1].add(0.05)  # mild perturbation on item 1, strong on item 0
    batched = np.asarray(loss(y, p))
    assert batched.shape == (2,)
    assert batched[0] != batched[1]
    per_item = np.asarray(
        [float(loss(y[i : i + 1], p[i : i + 1])[0]) for i in range(2)]
    )
    np.testing.assert_allclose(batched, per_item, rtol=1e-5)
    # and drop_ratio subsampling keeps the per-item grouping intact
    loss_drop = PerceptualLoss(dimensions=3, params=params, drop_ratio=0.5)
    dropped = np.asarray(loss_drop(y, p))
    per_item_drop = np.asarray(
        [float(loss_drop(y[i : i + 1], p[i : i + 1])[0]) for i in range(2)]
    )
    np.testing.assert_allclose(dropped, per_item_drop, rtol=1e-5)
