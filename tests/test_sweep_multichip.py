"""The batched reconstruction sweep under a data-sharded mesh.

The OOD serving path at scale: images sharded over the `data` axis, lanes
replicated; the sweep program must compile under GSPMD and match single-device
numerics exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_ood_tpu.diffusion.plms import pndm_start_points, pndm_timesteps
from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.parallel.mesh import make_mesh, shard_batch
from ddpm_ood_tpu.recon.sweep import plms_sweep

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def fake_model(x, t):
    return 0.1 * x + 0.01 * (t.astype(jnp.float32) / 1000.0).reshape(
        (-1,) + (1,) * (x.ndim - 1)
    )


def test_sharded_sweep_matches_single_device():
    mesh = make_mesh()
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    ts = jnp.asarray(pndm_timesteps(1000, 10))
    t_starts = jnp.asarray(pndm_start_points(pndm_timesteps(1000, 10), 4))
    x0 = np.random.default_rng(0).normal(size=(16, 8, 8, 1)).astype(np.float32)
    noise = np.random.default_rng(1).normal(
        size=(len(t_starts),) + x0.shape
    ).astype(np.float32)

    sweep = jax.jit(
        lambda x, n: plms_sweep(sched, fake_model, x, n, ts, t_starts, 10)
    )
    ref = sweep(jnp.asarray(x0), jnp.asarray(noise))

    with mesh:
        out = sweep(shard_batch(mesh, x0), jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sharded_recon_program_with_elbo_matches_single_device():
    """The full ReconProgram (grouped lanes + metrics tail + the score_elbo
    likelihood column) under a data-sharded batch must reproduce single-device
    numerics — the elbo output has its own replication constraint path
    (recon/sweep.py out_mesh handling)."""
    from ddpm_ood_tpu.recon.sweep import ReconProgram
    from ddpm_ood_tpu.diffusion.schedules import make_schedule as _ms

    sched = _ms("scaled_linear_beta", 1000, 0.0015, 0.0195)
    mesh = make_mesh()
    x0 = np.random.default_rng(2).uniform(size=(16, 8, 8, 1)).astype(np.float32)
    K = len(pndm_start_points(pndm_timesteps(1000, 10), 4))
    host_noise = np.random.default_rng(3).normal(
        size=(K, 16, 8, 8, 1)
    ).astype(np.float32)

    # deterministic: hand both programs the SAME host noise planes (__call__
    # hands host_noise_fn the FULL (K, B, ...) shape and slices per group)
    def noise_fn(shape, t_starts):
        assert shape == host_noise.shape
        return host_noise

    def build(out_mesh):
        return ReconProgram(
            sched=sched, model_fn=jax.tree_util.Partial(fake_model),
            num_inference_steps=10, inference_skip_factor=4, num_groups=2,
            score_elbo=True, out_mesh=out_mesh,
            host_noise_fn=noise_fn, latent_sample_shape=(8, 8, 1),
        )

    ref_prog = build(None)
    t_starts, mse_ref, perc_ref, elbo_ref = ref_prog(
        jnp.asarray(x0), jax.random.PRNGKey(0)
    )

    shard_prog = build(mesh)
    with mesh:
        _, mse, perc, elbo = shard_prog(
            shard_batch(mesh, x0), jax.random.PRNGKey(0)
        )
    np.testing.assert_allclose(np.asarray(mse), np.asarray(mse_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(elbo), np.asarray(elbo_ref), atol=1e-5)
    assert (np.asarray(elbo) > 0).all()


def test_sharded_quantized_sweep_matches_single_device():
    """--quantize=int8 under GSPMD: the dynamic activation absmax is a global
    reduce over the sharded mega-batch — GSPMD must insert the collective and
    reproduce single-device quantization decisions exactly."""
    from ddpm_ood_tpu.models.unet import make_unet
    from ddpm_ood_tpu.recon.sweep import ReconProgram

    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    mesh = make_mesh()
    unet = make_unet("tiny", 2, 1, 1, quant="int8")
    x0 = np.random.default_rng(4).uniform(size=(16, 16, 16, 1)).astype(np.float32)
    params = unet.init(
        jax.random.PRNGKey(0), jnp.asarray(x0[:1]), jnp.zeros((1,), jnp.int32)
    )["params"]
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [0.05 * jax.random.normal(k, l.shape) for k, l in zip(keys, leaves)],
    )
    model_fn = jax.tree_util.Partial(
        lambda p, x, t: unet.apply({"params": p}, x, t), params
    )

    def build(out_mesh):
        return ReconProgram(
            sched=sched, model_fn=model_fn, num_inference_steps=10,
            inference_skip_factor=4, num_groups=2, out_mesh=out_mesh,
        )

    _, mse_ref, _ = build(None)(jnp.asarray(x0), jax.random.PRNGKey(0))
    with mesh:
        _, mse, _ = build(mesh)(shard_batch(mesh, x0), jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(mse)).all()
    np.testing.assert_allclose(np.asarray(mse), np.asarray(mse_ref), atol=1e-5)
