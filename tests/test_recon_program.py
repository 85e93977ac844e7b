"""ReconProgram unit coverage: grouping, samplers, noise paths, previews."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.recon.sweep import ReconProgram


def _model_partial():
    # cheap linear "UNet": eps_hat = w * x, with w a traced Partial-bound arg
    def apply(w, x, t):
        return w * x

    return jax.tree_util.Partial(apply, jnp.float32(0.1))


@pytest.fixture(scope="module")
def sched():
    return make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)


def test_program_shapes_and_grouping(sched):
    prog = ReconProgram(
        sched=sched, model_fn=_model_partial(), num_inference_steps=10,
        inference_skip_factor=3, num_groups=2,
    )
    assert len(prog.t_starts) == 4  # ceil(10/3) of the 11-entry PLMS grid tail
    images = jnp.asarray(
        np.random.default_rng(0).uniform(size=(3, 8, 8, 1)).astype(np.float32)
    )
    t_starts, mse, perc = prog(images, jax.random.PRNGKey(0))
    assert mse.shape == (4, 3) and perc.shape == (4, 3)
    assert np.isfinite(np.asarray(mse)).all()
    np.testing.assert_array_equal(np.sort(t_starts), np.asarray(prog.t_starts))
    assert prog.last_preview.shape == (3, 8, 8, 1)  # min(8, batch) previews
    assert np.asarray(perc).max() == 0.0  # no perceptual_fn -> zeros


def test_program_ddim_sampler(sched):
    prog = ReconProgram(
        sched=sched, model_fn=_model_partial(), num_inference_steps=10,
        inference_skip_factor=5, num_groups=1, sampler="ddim",
    )
    images = jnp.zeros((2, 8, 8, 1))
    t_starts, mse, _ = prog(images, jax.random.PRNGKey(1))
    assert mse.shape == (len(t_starts), 2)
    assert np.isfinite(np.asarray(mse)).all()


def test_program_plms_ref_sampler(sched):
    """Program-level plms_ref: shapes/finiteness through the shared metrics
    tail, plus the sharp cross-sampler invariant — the FIRST trajectory
    (lowest t_start) carries no inherited PNDM history (reference
    reconstruct.py:128-157 loops t_starts ascending), so with identical noise
    its reconstruction metrics must equal the fresh-history production
    sweep's lane at the same t_start."""

    def host_noise(shape, t_starts):
        # deterministic noise, identical for both programs
        return np.random.default_rng(7).standard_normal(shape).astype(np.float32)

    common = dict(
        sched=sched, model_fn=_model_partial(), num_inference_steps=10,
        inference_skip_factor=3,
    )
    ref = ReconProgram(
        sampler="plms_ref", host_noise_fn=host_noise, **common
    )
    fresh = ReconProgram(
        sampler="plms", num_groups=2, host_noise_fn=host_noise,
        latent_sample_shape=(8, 8, 1), **common
    )
    images = jnp.asarray(
        np.random.default_rng(3).uniform(size=(2, 8, 8, 1)).astype(np.float32)
    )
    ts_ref, mse_ref, perc_ref = ref(images, jax.random.PRNGKey(0))
    ts_fresh, mse_fresh, _ = fresh(images, jax.random.PRNGKey(0))
    assert mse_ref.shape == (len(ts_ref), 2)
    assert np.isfinite(np.asarray(mse_ref)).all()
    assert ref.last_preview.shape == (2, 8, 8, 1)

    t_first = int(min(ts_ref))
    i_ref = list(np.asarray(ts_ref)).index(t_first)
    i_fresh = list(np.asarray(ts_fresh)).index(t_first)
    np.testing.assert_allclose(
        np.asarray(mse_ref)[i_ref], np.asarray(mse_fresh)[i_fresh],
        rtol=1e-5, atol=1e-7,
    )
    # later lanes DIVERGE (carried history is real, not a no-op)
    t_last = int(max(ts_ref))
    j_ref = list(np.asarray(ts_ref)).index(t_last)
    j_fresh = list(np.asarray(ts_fresh)).index(t_last)
    assert not np.allclose(
        np.asarray(mse_ref)[j_ref], np.asarray(mse_fresh)[j_fresh],
        rtol=1e-5, atol=1e-7,
    )


def test_program_latent_pipeline(sched):
    """encode/decode Partials + latent pad round-trip inside the program."""
    def enc(scale, x):
        return (x * scale)[:, ::2, ::2, :]  # fake 2x encoder

    def dec(scale, z):
        return jnp.repeat(jnp.repeat(z / scale, 2, axis=1), 2, axis=2)

    prog = ReconProgram(
        sched=sched, model_fn=_model_partial(), num_inference_steps=10,
        inference_skip_factor=5, num_groups=1,
        encode_fn=jax.tree_util.Partial(enc, jnp.float32(2.0)),
        decode_fn=jax.tree_util.Partial(dec, jnp.float32(2.0)),
        latent_pad=(1, 1, 1, 1),
    )
    images = jnp.asarray(
        np.random.default_rng(1).uniform(size=(2, 8, 8, 1)).astype(np.float32)
    )
    _, mse, _ = prog(images, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(mse)).all()


def test_program_3d_per_image_perceptual(sched):
    """Two different volumes in one batch must get DIFFERENT perceptual scores
    (the reference scores LPIPS per item in 3D, reconstruct.py:181-187; a
    batch-averaged scalar broadcast over the batch destroys the OOD signal)."""
    from ddpm_ood_tpu.losses.lpips import PerceptualLoss, init_lpips_params

    perceptual = PerceptualLoss(
        dimensions=3,
        params=init_lpips_params(jax.random.PRNGKey(0), image_hw=32),
    )
    prog = ReconProgram(
        sched=sched, model_fn=_model_partial(), num_inference_steps=10,
        inference_skip_factor=5, num_groups=1, perceptual_fn=perceptual,
    )
    rng = np.random.default_rng(7)
    smooth = np.full((8, 8, 8, 1), 0.5, dtype=np.float32)
    noisy = rng.uniform(size=(8, 8, 8, 1)).astype(np.float32)
    images = jnp.asarray(np.stack([smooth, noisy]))
    _, mse, perc = prog(images, jax.random.PRNGKey(4))
    perc = np.asarray(perc)
    assert perc.shape == mse.shape and np.isfinite(perc).all()
    assert (perc[:, 0] != perc[:, 1]).all()


def test_program_rejects_scalar_perceptual(sched):
    """A perceptual_fn that collapses the batch must be rejected, not broadcast."""
    prog = ReconProgram(
        sched=sched, model_fn=_model_partial(), num_inference_steps=10,
        inference_skip_factor=5, num_groups=1,
        perceptual_fn=lambda y, yp: jnp.mean(jnp.square(y - yp)),
    )
    with pytest.raises(ValueError, match="per-image"):
        prog(jnp.zeros((2, 8, 8, 1)), jax.random.PRNGKey(0))


def test_program_simplex_noise_path(sched):
    from ddpm_ood_tpu.noise.simplex import simplex_noise_device

    def sweep_simplex(rng, shape, t_starts):
        K = shape[0]
        keys = jax.random.split(rng, K)
        return jax.vmap(
            lambda k, t: simplex_noise_device(
                k, shape[1:], jnp.full((shape[1],), t, dtype=jnp.int32), octaves=2
            )
        )(keys, t_starts)

    prog = ReconProgram(
        sched=sched, model_fn=_model_partial(), num_inference_steps=10,
        inference_skip_factor=5, num_groups=1, simplex_noise_fn=sweep_simplex,
    )
    images = jnp.zeros((2, 8, 8, 1))
    _, mse, _ = prog(images, jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(mse)).all()


def test_warmup_precompiles_and_matches_lazy(sched):
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.uniform(size=(3, 8, 8, 1)).astype(np.float32))

    warm = ReconProgram(
        sched=sched, model_fn=_model_partial(), num_inference_steps=10,
        inference_skip_factor=3, num_groups=2,
    )
    secs = warm.warmup(jnp.zeros_like(images))
    assert secs > 0 and len(warm._compiled) == len(warm._groups)
    keys_after_warmup = set(warm._compiled)
    _, mse_w, perc_w = warm(images, jax.random.PRNGKey(1))
    # __call__ found every group already compiled — no new cache keys
    assert set(warm._compiled) == keys_after_warmup

    lazy = ReconProgram(
        sched=sched, model_fn=_model_partial(), num_inference_steps=10,
        inference_skip_factor=3, num_groups=2,
    )
    _, mse_l, perc_l = lazy(images, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(mse_w), np.asarray(mse_l))
    np.testing.assert_array_equal(np.asarray(perc_w), np.asarray(perc_l))


def test_warmup_host_noise_path(sched):
    rng = np.random.default_rng(6)
    images = jnp.asarray(rng.uniform(size=(2, 8, 8, 1)).astype(np.float32))

    def host_noise(shape, t_starts):
        return np.ones(shape, np.float32)

    prog = ReconProgram(
        sched=sched, model_fn=_model_partial(), num_inference_steps=10,
        inference_skip_factor=3, num_groups=2,
        host_noise_fn=host_noise, latent_sample_shape=(8, 8, 1),
    )
    prog.warmup(jnp.zeros_like(images))
    keys = set(prog._compiled)
    prog(images, jax.random.PRNGKey(0))
    assert set(prog._compiled) == keys  # host-noise arg shape matched too


def test_warmup_plms_ref_noop(sched):
    prog = ReconProgram(
        sched=sched, model_fn=_model_partial(), num_inference_steps=10,
        inference_skip_factor=3, sampler="plms_ref",
    )
    assert prog.warmup(jnp.zeros((2, 8, 8, 1))) == 0.0


def test_resolve_recon_groups_auto_and_int():
    """--recon_groups=auto picks the v5e-autotuned optimum per dimensionality
    (16 for 2D, 3 for 3D — DESIGN.md grids); integers pass through."""
    from ddpm_ood_tpu.config import parse_args_reconstruct
    from ddpm_ood_tpu.serve import resolve_recon_groups

    assert resolve_recon_groups("auto", 2) == 16
    assert resolve_recon_groups("auto", 3) == 3
    assert resolve_recon_groups(None, 3) == 3
    assert resolve_recon_groups("5", 2) == 5
    assert resolve_recon_groups(7, 3) == 7

    args = parse_args_reconstruct(["--output_dir=/tmp/x", "--model_name=m"])
    assert args.recon_groups == "auto"
    args = parse_args_reconstruct(
        ["--output_dir=/tmp/x", "--model_name=m", "--recon_groups=4"]
    )
    assert resolve_recon_groups(args.recon_groups, 2) == 4
