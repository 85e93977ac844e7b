"""PLMS sampler tests, golden-checked against a straightforward stateful NumPy
re-implementation of the PNDM (skip_prk_steps=True) algorithm as published
(Liu et al., ICLR 2022 eq. 11 + Adams-Bashforth warm-up, the contract of
monai-generative's PNDMScheduler used at reference src/trainers/reconstruct.py:98-157).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ddpm_ood_tpu.diffusion import (
    add_noise,
    make_schedule,
    plms_denoise,
    plms_init_state,
    plms_step,
    pndm_start_points,
    pndm_timesteps,
)


def test_pndm_timestep_grid():
    ts = pndm_timesteps(1000, 100)
    assert len(ts) == 101
    assert ts[0] == 990
    assert ts[1] == 980 and ts[2] == 980  # duplicated second-largest entry
    assert ts[-1] == 0
    assert ts[3] == 970
    # ascending start points with skip factors (reference README.md:114-120 table)
    for skip, n in [(1, 100), (2, 50), (3, 34), (4, 25), (5, 20), (8, 13), (16, 7), (32, 4), (64, 2)]:
        assert len(pndm_start_points(ts, skip)) == n, skip


class NumpyPLMS:
    """Literal stateful PLMS (skip_prk_steps=True), epsilon prediction."""

    def __init__(self, betas, num_train_timesteps=1000, num_inference_steps=100):
        self.alphas_cumprod = np.cumprod(1.0 - np.asarray(betas, np.float64))
        self.final_alpha_cumprod = self.alphas_cumprod[0]
        self.ratio = num_train_timesteps // num_inference_steps
        self.ets = []
        self.counter = 0
        self.cur_sample = None

    def step(self, model_output, timestep, sample):
        model_output = np.asarray(model_output, np.float64)
        sample = np.asarray(sample, np.float64)
        if self.counter != 1:
            self.ets = self.ets[-3:]
            self.ets.append(model_output)
            prev_timestep = timestep - self.ratio
        else:
            prev_timestep = timestep
            timestep = timestep + self.ratio

        if len(self.ets) == 1 and self.counter == 0:
            out = model_output
            self.cur_sample = sample
        elif len(self.ets) == 1 and self.counter == 1:
            out = (model_output + self.ets[-1]) / 2
            sample = self.cur_sample
            self.cur_sample = None
        elif len(self.ets) == 2:
            out = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            out = (23 * self.ets[-1] - 16 * self.ets[-2] + 5 * self.ets[-3]) / 12
        else:
            out = (
                55 * self.ets[-1] - 59 * self.ets[-2] + 37 * self.ets[-3] - 9 * self.ets[-4]
            ) / 24

        acp_t = self.alphas_cumprod[timestep]
        acp_prev = (
            self.alphas_cumprod[prev_timestep] if prev_timestep >= 0 else self.final_alpha_cumprod
        )
        bp_t = 1 - acp_t
        bp_prev = 1 - acp_prev
        coeff = (acp_prev / acp_t) ** 0.5
        denom = acp_t * bp_prev**0.5 + (acp_t * bp_t * acp_prev) ** 0.5
        prev_sample = coeff * sample - (acp_prev - acp_t) * out / denom
        self.counter += 1
        return prev_sample


def _fake_model(x, t_batch):
    """Deterministic nonlinear pseudo-model: depends on x and t."""
    tt = t_batch.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.tanh(x * 0.9 + 0.001 * tt) * 0.8 + 0.05


def test_plms_matches_numpy_reference():
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    timesteps = pndm_timesteps(1000, 100)
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 6, 6, 1)).astype(np.float32)

    # numpy golden run over the full grid (t_start = 990 -> all 101 steps)
    npx = x.astype(np.float64)
    golden = NumpyPLMS(np.asarray(sched.betas))
    for t in timesteps:
        e = np.asarray(_fake_model(jnp.asarray(npx, jnp.float32), jnp.asarray([t, t])))
        npx = golden.step(e, int(t), npx)

    out = plms_denoise(
        sched,
        _fake_model,
        jnp.asarray(x),
        jnp.asarray(timesteps),
        t_start=jnp.asarray(990),
        num_inference_steps=100,
    )
    np.testing.assert_allclose(np.asarray(out), npx, rtol=2e-4, atol=2e-5)


def test_plms_partial_trajectory_matches_suffix():
    """Masked full scan from t_start == plain run over only the active suffix."""
    sched = make_schedule("linear_beta", 1000, 1e-4, 2e-2)
    timesteps = pndm_timesteps(1000, 100)
    t_start = 510
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 4, 4, 1)).astype(np.float32)

    masked = plms_denoise(
        sched, _fake_model, jnp.asarray(x), jnp.asarray(timesteps),
        t_start=jnp.asarray(t_start), num_inference_steps=100,
    )

    # unmasked run over just the suffix
    suffix = timesteps[timesteps <= t_start]
    state = plms_init_state(jnp.asarray(x))
    for t in suffix:
        e = _fake_model(state.x, jnp.asarray([t]))
        state = plms_step(sched, state, e, jnp.asarray(int(t)), 10, active=True)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(state.x), rtol=1e-5, atol=1e-6)


def test_plms_duplicate_980_start_point():
    """t_start=980 runs BOTH duplicated 980 entries (reference loop semantics)."""
    sched = make_schedule("linear_beta", 1000, 1e-4, 2e-2)
    timesteps = pndm_timesteps(1000, 100)
    suffix = timesteps[timesteps <= 980]
    assert (suffix == 980).sum() == 2
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 4, 4, 1)).astype(np.float32)

    golden = NumpyPLMS(np.asarray(sched.betas))
    npx = x.astype(np.float64)
    for t in suffix:
        e = np.asarray(_fake_model(jnp.asarray(npx, jnp.float32), jnp.asarray([t])))
        npx = golden.step(e, int(t), npx)

    out = plms_denoise(
        sched, _fake_model, jnp.asarray(x), jnp.asarray(timesteps),
        t_start=jnp.asarray(980), num_inference_steps=100,
    )
    np.testing.assert_allclose(np.asarray(out), npx, rtol=2e-4, atol=2e-5)


def test_reference_exact_sweep_matches_persistent_numpy_golden():
    """plms_ref carries ets/counter across t_starts exactly like ONE stateful
    scheduler driven over the reference's loops (reconstruct.py:98,128-157)."""
    from ddpm_ood_tpu.diffusion.plms import plms_reference_exact_sweep

    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    timesteps = pndm_timesteps(1000, 10)
    t_starts = pndm_start_points(timesteps, 2)
    assert len(t_starts) >= 3  # several chained trajectories
    rng = np.random.default_rng(9)
    x0 = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)
    noise = rng.normal(size=(len(t_starts),) + x0.shape).astype(np.float32)

    acp = np.asarray(sched.alphas_cumprod, np.float64)
    golden = NumpyPLMS(np.asarray(sched.betas), 1000, 10)
    expected = []
    for k, t_start in enumerate(t_starts):
        npx = acp[t_start] ** 0.5 * x0 + (1 - acp[t_start]) ** 0.5 * noise[k]
        for t in timesteps[timesteps <= t_start]:
            e = np.asarray(
                _fake_model(jnp.asarray(npx, jnp.float32), jnp.asarray([t, t]))
            )
            npx = golden.step(e, int(t), npx)
        expected.append(npx)

    out = plms_reference_exact_sweep(
        sched, _fake_model, jnp.asarray(x0), jnp.asarray(noise),
        timesteps, t_starts, num_inference_steps=10,
    )
    np.testing.assert_allclose(np.asarray(out), np.stack(expected), rtol=2e-4, atol=2e-5)


def test_reference_exact_first_lane_matches_fresh_history_sweep():
    """The first trajectory has no inherited history, so plms_ref and the
    batched fresh-history sweep agree there; later lanes diverge (that IS the
    carried-history deviation being quantified)."""
    from ddpm_ood_tpu.recon.sweep import plms_sweep
    from ddpm_ood_tpu.diffusion.plms import plms_reference_exact_sweep

    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    timesteps = pndm_timesteps(1000, 10)
    t_starts = pndm_start_points(timesteps, 2)
    rng = np.random.default_rng(10)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 1)).astype(np.float32))
    noise = jnp.asarray(
        rng.normal(size=(len(t_starts),) + x0.shape).astype(np.float32)
    )

    ref = plms_reference_exact_sweep(
        sched, _fake_model, x0, noise, timesteps, t_starts, 10
    )
    fresh = plms_sweep(
        sched, _fake_model, x0, noise, jnp.asarray(timesteps),
        jnp.asarray(t_starts), 10,
    )
    np.testing.assert_allclose(
        np.asarray(ref[0]), np.asarray(fresh[0]), rtol=1e-5, atol=1e-6
    )
    later = np.abs(np.asarray(ref[2:]) - np.asarray(fresh[2:]))
    assert later.max() > 1e-6  # histories genuinely differ downstream


def test_plms_denoises_toward_x0():
    """With a perfect-epsilon oracle the sampler recovers x0 from moderate noise."""
    sched = make_schedule("linear_beta", 1000, 1e-4, 2e-2)
    timesteps = pndm_timesteps(1000, 100)
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((1, 4, 4, 1)) * 0.5
    noise = jax.random.normal(key, x0.shape)
    t_start = 300
    x_t = add_noise(sched, x0, noise, jnp.asarray(t_start))

    acp = sched.alphas_cumprod

    def oracle(x, t_batch):
        a = acp[t_batch[0]]
        return (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)

    out = plms_denoise(
        sched, oracle, x_t, jnp.asarray(timesteps),
        t_start=jnp.asarray(t_start), num_inference_steps=100,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=5e-2)


def test_reference_exact_scan_matches_eager():
    """The single-scan plms_ref program must be bit-equivalent (to f32 scan
    tolerance) to the eager Python transcription it replaced, including
    b_scale and cross-lane history leakage."""
    from ddpm_ood_tpu.diffusion.plms import (
        plms_reference_exact_sweep,
        plms_reference_exact_sweep_eager,
    )

    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    timesteps = pndm_timesteps(1000, 10)
    t_starts = pndm_start_points(timesteps, 2)
    rng = np.random.default_rng(11)
    x0 = jnp.asarray(rng.normal(size=(2, 4, 4, 1)).astype(np.float32))
    noise = jnp.asarray(
        rng.normal(size=(len(t_starts),) + x0.shape).astype(np.float32)
    )
    scan_out = plms_reference_exact_sweep(
        sched, _fake_model, x0, noise, timesteps, t_starts, 10, b_scale=1.5
    )
    eager_out = plms_reference_exact_sweep_eager(
        sched, _fake_model, x0, noise, timesteps, t_starts, 10, b_scale=1.5
    )
    np.testing.assert_allclose(
        np.asarray(scan_out), np.asarray(eager_out), rtol=1e-5, atol=1e-6
    )
