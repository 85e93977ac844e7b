"""DPM-Solver++(2M) sampler: golden math, masking contract, sweep integration.

The reference reconstructs with PLMS only (src/trainers/reconstruct.py:98-157);
`--sampler=dpm` is the framework's second-order extension
(ddpm_ood_tpu/diffusion/dpm_solver.py). Tests: the masked-scan implementation
against an independent sequential NumPy transcription of the data-prediction
2M update; exact-x0 recovery when the model output is the true epsilon; the
lane-activation contract; and the end-to-end ReconProgram path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_ood_tpu.diffusion.dpm_solver import dpm_denoise, dpm_timesteps
from ddpm_ood_tpu.diffusion.schedules import add_noise, make_schedule
from ddpm_ood_tpu.recon.sweep import ReconProgram, dpm_sweep

SCHED = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)


def _toy_model_fn(x, t):
    """Deterministic nonlinear stand-in for the UNet (epsilon prediction)."""
    tt = (t.astype(jnp.float32) / 1000.0).reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.sin(3.0 * x) * (0.5 + tt) + 0.1 * x


def _numpy_dpm_2m(x, timesteps, num_inference_steps):
    """Independent sequential transcription of multistep DPM-Solver++(2M),
    data-prediction form, lower-order final step."""
    acp = np.asarray(SCHED.alphas_cumprod, dtype=np.float64)
    step_ratio = SCHED.num_train_timesteps // num_inference_steps
    x = np.asarray(x, dtype=np.float64)

    def a_s(t):
        if t < 0:
            return 1.0, 0.0
        return float(np.sqrt(acp[t])), float(np.sqrt(1.0 - acp[t]))

    def lam(t):
        a, s = a_s(t)
        return np.log(a) - np.log(max(s, 1e-20))

    prev_x0 = None
    prev_t = None
    for t in [int(v) for v in timesteps]:
        a_t, s_t = a_s(t)
        eps = np.asarray(
            _toy_model_fn(jnp.asarray(x, jnp.float32),
                          jnp.full((x.shape[0],), t, jnp.int32)),
            dtype=np.float64,
        )
        x0 = (x - s_t * eps) / a_t
        u = t - step_ratio
        a_u, s_u = a_s(u)
        exp_neg_h = (a_t * s_u) / (s_t * a_u)
        if prev_x0 is None or u < 0:
            d = x0
        else:
            h = lam(u) - lam(t)
            h_prev = lam(t) - lam(prev_t)
            r = h_prev / h
            d = (1.0 + 1.0 / (2 * r)) * x0 - (1.0 / (2 * r)) * prev_x0
        x = (s_u / s_t) * x - a_u * (exp_neg_h - 1.0) * d
        prev_x0, prev_t = x0, t
    return x


@pytest.mark.parametrize("steps", [10, 25])
def test_dpm_matches_numpy_reference(steps):
    ts = dpm_timesteps(1000, steps)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    t_start = int(ts[0])  # full trajectory: every grid step active

    got = np.asarray(
        dpm_denoise(SCHED, _toy_model_fn, jnp.asarray(x), jnp.asarray(ts),
                    jnp.asarray(t_start), steps)
    )
    want = _numpy_dpm_2m(x, ts, steps)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_dpm_exact_epsilon_recovers_x0():
    """With the TRUE epsilon for a fixed x0 as model output, the x0 prediction
    is exact at every step, so the solver must land on x0 exactly."""
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.uniform(size=(3, 8, 8, 1)).astype(np.float32))
    steps = 10
    ts = dpm_timesteps(1000, steps)
    t_start = jnp.asarray(int(ts[0]))
    noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    x_t = add_noise(SCHED, x0, noise, jnp.full((x0.shape[0],), int(ts[0])))

    def exact_eps_model(x, t):
        acp = SCHED.alphas_cumprod[t].reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - jnp.sqrt(acp) * x0) / jnp.sqrt(1.0 - acp)

    out = dpm_denoise(SCHED, exact_eps_model, x_t, jnp.asarray(ts), t_start, steps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-4,
                               atol=1e-4)


def test_dpm_sweep_lane_masking_matches_single_lane():
    """Each sweep lane must equal a fresh single-lane denoise from its own
    t_start (inactive grid prefix leaves the lane untouched)."""
    steps = 10
    ts = jnp.asarray(dpm_timesteps(1000, steps))
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.uniform(size=(2, 8, 8, 1)).astype(np.float32))
    t_starts = jnp.asarray([100, 500, 900], dtype=jnp.int32)
    noise = jax.random.normal(jax.random.PRNGKey(3), (3,) + x0.shape)

    swept = dpm_sweep(SCHED, _toy_model_fn, x0, noise, ts, t_starts, steps)
    for k, t_start in enumerate(np.asarray(t_starts)):
        x_t = add_noise(
            SCHED, x0, noise[k], jnp.full((x0.shape[0],), int(t_start))
        )
        single = dpm_denoise(SCHED, _toy_model_fn, x_t, ts,
                             jnp.asarray(int(t_start)), steps)
        np.testing.assert_allclose(
            np.asarray(swept[k]), np.asarray(single), rtol=2e-5, atol=2e-6
        )


def test_recon_program_dpm_end_to_end():
    prog = ReconProgram(
        sched=SCHED,
        model_fn=jax.tree_util.Partial(_toy_model_fn),
        num_inference_steps=10,
        inference_skip_factor=3,
        sampler="dpm",
        num_groups=2,
    )
    images = jnp.asarray(
        np.random.default_rng(4).uniform(size=(2, 8, 8, 1)).astype(np.float32)
    )
    t_starts, mse, perc = prog(images, jax.random.PRNGKey(0))
    assert mse.shape == (len(t_starts), 2)
    assert np.isfinite(np.asarray(mse)).all()
    assert (np.asarray(mse) > 0).all()


def test_dpm_exact_epsilon_recovers_x0_3d():
    """The 3D-latent twin of the exact-epsilon recovery: the solver math is
    rank-agnostic, but the 3D LDM sweep ships with --sampler=dpm (measured
    on chip, BASELINE.md), so the 3D shape path gets its own gate."""
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(rng.uniform(size=(2, 6, 6, 4, 3)).astype(np.float32))
    steps = 10
    ts = dpm_timesteps(1000, steps)
    noise = jax.random.normal(jax.random.PRNGKey(6), x0.shape)
    x_t = add_noise(SCHED, x0, noise, jnp.full((x0.shape[0],), int(ts[0])))

    def exact_eps_model(x, t):
        acp = SCHED.alphas_cumprod[t].reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - jnp.sqrt(acp) * x0) / jnp.sqrt(1.0 - acp)

    out = dpm_denoise(
        SCHED, exact_eps_model, x_t, jnp.asarray(ts),
        jnp.asarray(int(ts[0])), steps,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-4,
                               atol=1e-4)


def test_recon_program_dpm_3d_separates_structural_ood():
    """3D dpm sweep end-to-end: a toy epsilon model trained on nothing cannot
    gate quality, but the program must run the 3D latent shape and produce
    per-(lane, volume) finite metrics with volume-distinct values."""
    prog = ReconProgram(
        sched=SCHED,
        model_fn=jax.tree_util.Partial(_toy_model_fn),
        num_inference_steps=10,
        inference_skip_factor=3,
        sampler="dpm",
        num_groups=2,
    )
    vols = jnp.asarray(
        np.random.default_rng(7).uniform(size=(2, 6, 6, 4, 3)).astype(np.float32)
    )
    t_starts, mse, perc = prog(vols, jax.random.PRNGKey(1))
    mse = np.asarray(mse)
    assert mse.shape == (len(t_starts), 2)
    assert np.isfinite(mse).all() and (mse > 0).all()
    # two different volumes in one batch must not share scores
    assert not np.allclose(mse[:, 0], mse[:, 1])
