"""DDIM sampler: inversion-consistency and sweep equivalence tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ddpm_ood_tpu.diffusion.ddim import ddim_denoise, ddim_step, ddim_timesteps
from ddpm_ood_tpu.diffusion.schedules import add_noise, make_schedule
from ddpm_ood_tpu.recon.sweep import ddim_sweep


def test_ddim_timesteps_grid():
    ts = ddim_timesteps(1000, 10)
    assert list(ts) == [900, 800, 700, 600, 500, 400, 300, 200, 100, 0]


def test_ddim_step_perfect_model_recovers_x0():
    """With the true epsilon as model output, eta=0 DDIM maps x_t exactly to
    sqrt(acp_prev) x0 + sqrt(1-acp_prev) eps — i.e. re-noised x0 at t_prev."""
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 8, 8, 1))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t, t_prev = jnp.asarray(500), jnp.asarray(400)
    x_t = add_noise(sched, x0, eps, t)
    x_prev = ddim_step(sched, eps, t, t_prev, x_t)
    expected = add_noise(sched, x0, eps, t_prev)
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(expected),
                               atol=1e-5, rtol=1e-5)


def test_ddim_final_step_returns_x0_pred():
    sched = make_schedule("linear_beta", 1000)
    x0 = jnp.ones((1, 4, 4, 1)) * 0.3
    eps = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    t = jnp.asarray(100)
    x_t = add_noise(sched, x0, eps, t)
    out = ddim_step(sched, eps, t, jnp.asarray(-1), x_t)  # t_prev<0 -> x0
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-5)


def fake_model(x, t):
    return 0.05 * x + 0.02 * (t.astype(jnp.float32) / 1000.0).reshape(
        (-1,) + (1,) * (x.ndim - 1)
    )


def test_ddim_sweep_matches_sequential():
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    ts = jnp.asarray(ddim_timesteps(1000, 10))
    t_starts = np.asarray([100, 400, 800], dtype=np.int32)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 1))
    noise = jax.random.normal(jax.random.PRNGKey(1), (3,) + x0.shape)
    swept = ddim_sweep(
        sched, fake_model, x0, noise, ts, jnp.asarray(t_starts), 10
    )
    for k, t_start in enumerate(t_starts):
        x_start = add_noise(sched, x0, noise[k], jnp.asarray(int(t_start)))
        ref = ddim_denoise(
            sched, fake_model, x_start, ts, jnp.asarray(int(t_start)), 10
        )
        np.testing.assert_allclose(np.asarray(swept[k]), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)
