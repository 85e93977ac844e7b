"""The batched multi-t_start sweep must agree with per-t_start sequential PLMS."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_ood_tpu.diffusion.plms import plms_denoise, pndm_start_points, pndm_timesteps
from ddpm_ood_tpu.diffusion.schedules import add_noise, make_schedule
from ddpm_ood_tpu.recon.sweep import group_t_starts, plms_sweep


def fake_model(x, t):
    # cheap stand-in epsilon model: smooth function of x and t
    return 0.1 * x + 0.01 * (t.astype(jnp.float32) / 1000.0).reshape(
        (-1,) + (1,) * (x.ndim - 1)
    )


@pytest.fixture(scope="module")
def setup():
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    ts = pndm_timesteps(1000, 10)  # 11 entries incl duplicate
    t_starts = pndm_start_points(ts, 2)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 8, 8, 1))
    noise = jax.random.normal(jax.random.PRNGKey(1), (len(t_starts),) + x0.shape)
    return sched, ts, t_starts, x0, noise


def test_sweep_matches_sequential(setup):
    sched, ts, t_starts, x0, noise = setup
    swept = plms_sweep(
        sched, fake_model, x0, noise, jnp.asarray(ts), jnp.asarray(t_starts), 10
    )
    for k, t_start in enumerate(t_starts):
        x_start = add_noise(sched, x0, noise[k], jnp.asarray(int(t_start)))
        ref = plms_denoise(
            sched, fake_model, x_start, jnp.asarray(ts), jnp.asarray(int(t_start)), 10
        )
        np.testing.assert_allclose(swept[k], ref, rtol=2e-4, atol=2e-5)


def test_sweep_with_b_scale(setup):
    sched, ts, t_starts, x0, noise = setup
    swept = plms_sweep(
        sched, fake_model, x0, noise, jnp.asarray(ts), jnp.asarray(t_starts), 10,
        b_scale=2.0,
    )
    k = len(t_starts) - 1
    x_start = add_noise(sched, x0 * 2.0, noise[k], jnp.asarray(int(t_starts[k])))
    ref = plms_denoise(
        sched, fake_model, x_start, jnp.asarray(ts), jnp.asarray(int(t_starts[k])), 10
    )
    np.testing.assert_allclose(swept[k], ref, rtol=2e-4, atol=2e-5)


def test_group_t_starts_cover_all():
    ts = pndm_timesteps(1000, 100)
    t_starts = pndm_start_points(ts, 4)
    groups = group_t_starts(ts, t_starts, 4)
    regrouped = np.concatenate([g[1] for g in groups])
    np.testing.assert_array_equal(regrouped, t_starts)
    for suffix, chunk in groups:
        assert suffix.max() >= chunk.max()
        assert (suffix <= chunk.max()).all()
        # every chunk timestep grid is a strict suffix of the full descending grid
        np.testing.assert_array_equal(suffix, ts[ts <= chunk.max()])


def test_group_t_starts_high_group_counts():
    """The autotuned defaults use many groups (bench: 16; per-lane = K); the
    partition must stay exact under clamping (num_groups > K) and per-lane
    grouping, and total masked evals must shrink monotonically with G."""
    ts = pndm_timesteps(1000, 100)
    t_starts = pndm_start_points(ts, 4)
    k = len(t_starts)
    costs = []
    for g in (1, 3, 8, 16, k, k + 50):
        groups = group_t_starts(ts, t_starts, g)
        regrouped = np.concatenate([c for _, c in groups])
        np.testing.assert_array_equal(regrouped, t_starts)
        assert len(groups) == min(g, k)
        costs.append(sum(len(s) * len(c) for s, c in groups))
    assert costs == sorted(costs, reverse=True)  # more groups, fewer evals
    ideal = sum(int((ts <= s).sum()) for s in t_starts)
    assert costs[-1] == ideal  # per-lane grouping is exactly the ideal count


def test_start_point_counts_match_reference_table():
    """README.md:114-120 — skip factor -> reconstructions per image."""
    ts = pndm_timesteps(1000, 100)
    expected = {1: 100, 2: 50, 3: 34, 4: 25, 5: 20, 8: 13, 16: 7, 32: 4, 64: 2}
    for skip, count in expected.items():
        assert len(pndm_start_points(ts, skip)) == count
