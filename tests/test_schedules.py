import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_ood_tpu.diffusion import (
    add_noise,
    apply_snr_shift,
    epsilon_from_model_output,
    make_beta_schedule,
    make_schedule,
    pred_x0_from_model_output,
)
from ddpm_ood_tpu.diffusion.schedules import training_target


def test_linear_beta_table():
    betas = make_beta_schedule("linear_beta", 1000, 1e-4, 2e-2)
    expected = np.linspace(1e-4, 2e-2, 1000)
    np.testing.assert_allclose(betas, expected, rtol=1e-6)


def test_scaled_linear_beta_table():
    betas = make_beta_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    expected = np.linspace(0.0015**0.5, 0.0195**0.5, 1000) ** 2
    np.testing.assert_allclose(betas, expected, rtol=1e-6)
    # aliases used by the reference CLIs ("linear" default at reconstruct.py:56)
    np.testing.assert_allclose(
        make_beta_schedule("scaled_linear", 1000, 0.0015, 0.0195), betas
    )


def test_unknown_schedule_raises():
    with pytest.raises(ValueError):
        make_beta_schedule("sigmoid", 1000, 1e-4, 2e-2)


def test_alphas_cumprod_consistent():
    s = make_schedule("linear_beta", 100, 1e-4, 2e-2)
    np.testing.assert_allclose(s.alphas, 1.0 - s.betas, rtol=1e-6)
    np.testing.assert_allclose(
        s.alphas_cumprod, np.cumprod(np.asarray(s.alphas, np.float64)), rtol=1e-5
    )


def test_snr_shift_matches_reference_loop():
    """Vectorized SNR shift == the reference's sequential rewrite (base.py:104-116)."""
    s = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    factor = 0.25
    shifted = apply_snr_shift(s, factor)

    acp = np.asarray(s.alphas_cumprod, dtype=np.float64)
    snr = acp / (1 - acp)
    target_snr = snr * factor
    new_acp = 1 / (1 / target_snr + 1)
    new_alphas = np.zeros_like(new_acp)
    new_alphas[0] = new_acp[0]
    for i in range(1, len(new_alphas)):
        new_alphas[i] = new_acp[i] / new_acp[i - 1]
    new_betas = 1 - new_alphas

    np.testing.assert_allclose(shifted.alphas_cumprod, new_acp, rtol=1e-5)
    np.testing.assert_allclose(shifted.alphas, new_alphas, rtol=1e-5)
    np.testing.assert_allclose(shifted.betas, new_betas, rtol=1e-4, atol=1e-7)


def test_add_noise_formula():
    s = make_schedule("linear_beta", 1000, 1e-4, 2e-2)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(4, 8, 8, 1)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(4, 8, 8, 1)).astype(np.float32))
    t = jnp.asarray([0, 10, 500, 999])
    xt = add_noise(s, x0, noise, t)
    acp = np.asarray(s.alphas_cumprod)[np.asarray(t)][:, None, None, None]
    expected = np.sqrt(acp) * np.asarray(x0) + np.sqrt(1 - acp) * np.asarray(noise)
    np.testing.assert_allclose(xt, expected, rtol=1e-5, atol=1e-6)


def test_prediction_type_roundtrip():
    """x0/eps recovered from each prediction-type output agree with the originals."""
    s = make_schedule("linear_beta", 1000, 1e-4, 2e-2)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(2, 4, 4, 1)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(2, 4, 4, 1)).astype(np.float32))
    t = jnp.asarray([100, 700])
    xt = add_noise(s, x0, eps, t)

    for ptype in ["epsilon", "sample", "v_prediction"]:
        sp = make_schedule("linear_beta", 1000, 1e-4, 2e-2, prediction_type=ptype)
        out = training_target(sp, x0, eps, t)
        np.testing.assert_allclose(
            pred_x0_from_model_output(sp, out, xt, t), x0, rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            epsilon_from_model_output(sp, out, xt, t), eps, rtol=1e-3, atol=1e-4
        )


def test_cosine_beta_table():
    """cosine_beta (framework extension) matches the Improved-DDPM formula
    (arXiv:2102.09672 S3.2): acp_t = f(t)/f(0), f(t) = cos^2((t/T+s)/(1+s) pi/2),
    betas = 1 - acp_t/acp_{t-1} clipped at 0.999."""
    T = 1000
    betas = make_beta_schedule("cosine_beta", T)
    assert betas.shape == (T,)
    assert (betas > 0).all() and (betas <= 0.999).all()
    # acp derived from the betas must match the closed-form target
    acp = np.cumprod(1.0 - np.asarray(betas, np.float64))
    s = 0.008
    t = np.arange(1, T + 1, dtype=np.float64)
    f = np.cos((t / T + s) / (1.0 + s) * np.pi / 2.0) ** 2
    f0 = np.cos((s / (1.0 + s)) * np.pi / 2.0) ** 2
    target = f / f0
    # exact where un-clipped (clipping only bites at the tail where acp ~ 0)
    mask = target > 1e-5
    np.testing.assert_allclose(acp[mask], target[mask], rtol=1e-3)
    # "cosine" alias resolves; schedule is usable end-to-end
    sched = make_schedule("cosine", T)
    assert np.isfinite(np.asarray(sched.alphas_cumprod)).all()
    assert np.asarray(sched.alphas_cumprod)[-1] < 1e-3  # fully noised at t=T
    # noising/denoising math stays consistent on it
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 4, 4, 1)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(2, 4, 4, 1)).astype(np.float32))
    tt = jnp.asarray([100, 900])
    xt = add_noise(sched, x0, eps, tt)
    np.testing.assert_allclose(
        pred_x0_from_model_output(sched, eps, xt, tt), x0, rtol=2e-2, atol=2e-2
    )
