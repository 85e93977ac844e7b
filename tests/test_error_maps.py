"""Anomaly-localization error maps (--save_error_maps / score_error_maps).

The map is the per-pixel squared reconstruction error, mean over every start
point — emitted by the sweep program's metrics tail (recon/sweep.py) and
persisted per image by Reconstruct._save_error_maps. The reference reduces to
per-image scalars only (reconstruct.py:188-191)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.recon.sweep import ReconProgram


@pytest.fixture(scope="module")
def sched():
    return make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)


def _linear_model():
    def apply(w, x, t):
        return w * x

    return jax.tree_util.Partial(apply, jnp.float32(0.1))


def _host_noise(shape, t_starts):
    return np.random.default_rng(11).standard_normal(shape).astype(np.float32)


def _prog(sched, num_groups, **kw):
    return ReconProgram(
        sched=sched, model_fn=_linear_model(), num_inference_steps=10,
        inference_skip_factor=3, num_groups=num_groups,
        score_error_maps=True, host_noise_fn=_host_noise,
        latent_sample_shape=(8, 8, 1), **kw,
    )


def test_error_map_shape_and_value(sched):
    """The map must equal the mean over lanes of the squared residual the
    scalar mse already reduces — verified against a from-scratch recompute."""
    prog = _prog(sched, num_groups=1)
    images = jnp.asarray(
        np.random.default_rng(0).uniform(size=(3, 8, 8, 1)).astype(np.float32)
    )
    t_starts, mse, _ = prog(images, jax.random.PRNGKey(0))
    maps = prog.last_error_maps
    assert maps.shape == (3, 8, 8, 1)
    assert np.isfinite(maps).all() and (maps >= 0).all()
    # spatial mean of the map == mean over lanes of the per-image scalar mse
    np.testing.assert_allclose(
        maps.mean(axis=(1, 2, 3)),
        np.asarray(mse).mean(axis=0),
        rtol=1e-5,
    )


def test_error_map_group_invariance(sched):
    """Lane grouping is an execution detail: with identical (host) noise the
    combined map must not depend on num_groups."""
    images = jnp.asarray(
        np.random.default_rng(1).uniform(size=(2, 8, 8, 1)).astype(np.float32)
    )
    one = _prog(sched, num_groups=1)
    one(images, jax.random.PRNGKey(0))
    split = _prog(sched, num_groups=3)
    split(images, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        one.last_error_maps, split.last_error_maps, rtol=2e-4, atol=1e-7
    )


def test_error_map_localizes_corruption(sched):
    """A model that reconstructs toward a known clean image must light up
    exactly the corrupted region: feed clean + patch-corrupted copies and
    compare the map inside vs outside the patch."""
    xbar = jnp.asarray(
        np.random.default_rng(2).uniform(0.3, 0.7, size=(8, 8, 1)).astype(np.float32)
    )
    acp = sched.alphas_cumprod

    def apply(target, x, t):
        # exact epsilon if the clean image were `target`:
        # eps = (x_t - sqrt(acp_t) target) / sqrt(1 - acp_t)
        a = acp[jnp.clip(t, 0, 999)].reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - jnp.sqrt(a) * target[None]) / jnp.sqrt(1.0 - a)

    prog = ReconProgram(
        sched=sched, model_fn=jax.tree_util.Partial(apply, xbar),
        num_inference_steps=10, inference_skip_factor=3, num_groups=2,
        score_error_maps=True, host_noise_fn=_host_noise,
        latent_sample_shape=(8, 8, 1),
    )
    clean = np.asarray(xbar)
    corrupted = clean.copy()
    corrupted[:4, :4] = 1.0 - corrupted[:4, :4]  # flip one quadrant
    images = jnp.asarray(np.stack([clean, corrupted]))
    prog(images, jax.random.PRNGKey(0))
    maps = prog.last_error_maps  # (2, 8, 8, 1)
    inside = maps[1, :4, :4].mean()
    outside = (maps[1].sum() - maps[1, :4, :4].sum()) / (64 - 16)
    # the 10-step reconstruction leaves a noise floor everywhere; the
    # corrupted quadrant must still stand well clear of it...
    assert inside > 5 * outside
    # ...and clear of the SAME region in the clean copy
    assert inside > 5 * maps[0, :4, :4].mean()


def test_error_map_with_elbo_and_ssim(sched):
    """Flag-order stability: elbo and ssim outputs keep their positions with
    the map appended last."""
    prog = ReconProgram(
        sched=sched, model_fn=_linear_model(), num_inference_steps=10,
        inference_skip_factor=5, num_groups=1, score_elbo=True,
        score_ssim=True, score_error_maps=True,
        host_noise_fn=_host_noise, latent_sample_shape=(8, 8, 1),
    )
    images = jnp.asarray(
        np.random.default_rng(3).uniform(size=(2, 8, 8, 1)).astype(np.float32)
    )
    t_starts, mse, perc, elbo, ssim = prog(images, jax.random.PRNGKey(0))
    k = len(t_starts)
    assert elbo.shape == (k, 2) and ssim.shape == (k, 2)
    assert prog.last_error_maps.shape == (2, 8, 8, 1)
    assert np.isfinite(prog.last_error_maps).all()


def test_error_map_rejected_for_plms_ref(sched):
    with pytest.raises(ValueError, match="score_error_maps"):
        ReconProgram(
            sched=sched, model_fn=_linear_model(), num_inference_steps=10,
            sampler="plms_ref", score_error_maps=True,
        )


def test_save_error_maps_writes_files(tmp_path, sched):
    """Reconstruct._save_error_maps file contract (npy + png per image)."""
    from ddpm_ood_tpu.trainers.reconstruct import Reconstruct

    class Stub:
        out_dir = tmp_path

    maps = np.random.default_rng(4).uniform(size=(2, 8, 8, 1)).astype(np.float32)
    Reconstruct._save_error_maps(
        Stub(), maps, ["a.npy", "b.nii.gz"], "mnist_vflip"
    )
    d = tmp_path / "error_maps" / "mnist_vflip"
    for stem in ("a", "b"):
        assert (d / f"{stem}.png").exists()
        loaded = np.load(d / f"{stem}.npy")
        assert loaded.shape == (8, 8, 1)
    np.testing.assert_array_equal(np.load(d / "a.npy"), maps[0])


def test_save_error_maps_3d_render(tmp_path):
    """3D maps render the middle slice without error."""
    from ddpm_ood_tpu.trainers.reconstruct import Reconstruct

    class Stub:
        out_dir = tmp_path

    maps = np.random.default_rng(5).uniform(size=(1, 6, 8, 8, 1)).astype(np.float32)
    Reconstruct._save_error_maps(Stub(), maps, ["vol.nii.gz"], "in")
    d = tmp_path / "error_maps" / "in"
    assert (d / "vol.npy").exists() and (d / "vol.png").exists()
    assert np.load(d / "vol.npy").shape == (6, 8, 8, 1)
