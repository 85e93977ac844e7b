"""SSIM op: golden vs an independent NumPy sliding-window implementation."""

import numpy as np
import pytest

from ddpm_ood_tpu.ops.ssim import ssim, ssim_distance


def _np_gaussian(size, sigma):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _np_ssim(x, y, window_size=11, sigma=1.5, k1=0.01, k2=0.03, data_range=1.0):
    """Independent reference: full (non-separable) Gaussian window built as an
    outer product, applied with sliding_window_view — no shared code with the
    JAX implementation."""
    from numpy.lib.stride_tricks import sliding_window_view

    nd = x.ndim - 2
    ws = min(window_size, min(x.shape[1:-1]))
    ws -= (ws + 1) % 2
    g1 = _np_gaussian(ws, sigma)
    w = g1
    for _ in range(nd - 1):
        w = np.multiply.outer(w, g1)
    w = w / w.sum()

    def local_mean(a):
        # windows over the spatial axes only: result (B, *valid_spatial, C, *ws)
        win = sliding_window_view(a, (ws,) * nd, axis=tuple(range(1, 1 + nd)))
        return np.tensordot(win, w, axes=(tuple(range(-nd, 0)), tuple(range(nd))))

    x = x.astype(np.float64)
    y = y.astype(np.float64)
    mu_x, mu_y = local_mean(x), local_mean(y)
    var_x = local_mean(x * x) - mu_x**2
    var_y = local_mean(y * y) - mu_y**2
    cov = local_mean(x * y) - mu_x * mu_y
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    m = ((2 * mu_x * mu_y + c1) * (2 * cov + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (var_x + var_y + c2)
    )
    return m.mean(axis=tuple(range(1, m.ndim)))


@pytest.mark.parametrize("shape", [(3, 20, 20, 1), (2, 16, 20, 3), (2, 12, 12, 12, 1)])
def test_ssim_matches_independent_numpy(shape):
    rng = np.random.default_rng(0)
    x = rng.uniform(size=shape).astype(np.float32)
    y = np.clip(x + rng.normal(scale=0.1, size=shape), 0, 1).astype(np.float32)
    got = np.asarray(ssim(x, y))
    want = _np_ssim(x, y)
    np.testing.assert_allclose(got, want, atol=2e-5)
    assert got.shape == (shape[0],)


def test_ssim_identity_and_monotonicity():
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(2, 24, 24, 1)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(ssim(x, x)), 1.0, atol=1e-6)
    # more noise -> lower SSIM -> higher distance
    y1 = np.clip(x + rng.normal(scale=0.05, size=x.shape), 0, 1).astype(np.float32)
    y2 = np.clip(x + rng.normal(scale=0.3, size=x.shape), 0, 1).astype(np.float32)
    d1 = np.asarray(ssim_distance(x, y1))
    d2 = np.asarray(ssim_distance(x, y2))
    assert (d1 > 0).all() and (d2 > d1).all()
    # symmetric
    np.testing.assert_allclose(
        np.asarray(ssim(x, y1)), np.asarray(ssim(y1, x)), atol=1e-6
    )


def test_ssim_small_input_clamps_window():
    """Inputs smaller than the 11-tap window fall back to the largest odd
    window that fits (the 16x16 smoke geometry must work)."""
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(2, 8, 8, 1)).astype(np.float32)
    y = rng.uniform(size=(2, 8, 8, 1)).astype(np.float32)
    got = np.asarray(ssim(x, y))
    want = _np_ssim(x, y)  # same clamping rule
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_ssim_bf16_inputs_compute_in_f32():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    x = rng.uniform(size=(2, 20, 20, 1)).astype(np.float32)
    y = np.clip(x + rng.normal(scale=0.1, size=x.shape), 0, 1).astype(np.float32)
    f32 = np.asarray(ssim(x, y))
    b16 = np.asarray(ssim(jnp.asarray(x, jnp.bfloat16), jnp.asarray(y, jnp.bfloat16)))
    # bf16 rounding on the INPUT costs ~1e-2; the statistics themselves are f32
    np.testing.assert_allclose(b16, f32, atol=2e-2)
    assert b16.dtype == np.float32


# ---- sweep + scorer integration --------------------------------------------

def _toy_model_fn(x, t):
    import jax.numpy as jnp

    tt = (t.astype(jnp.float32) / 1000.0).reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.sin(3.0 * x) * (0.5 + tt) + 0.1 * x


def test_recon_program_emits_ssim_distance():
    """score_ssim=True appends a (K, B) array in [0, 2]; mse/perc stay
    bit-identical (same noise draw, metrics-tail-only change). With
    score_elbo also on, the order is (t, mse, perc, elbo, ssim)."""
    import jax
    import jax.numpy as jnp

    from ddpm_ood_tpu.diffusion.schedules import make_schedule
    from ddpm_ood_tpu.recon.sweep import ReconProgram

    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    kw = dict(
        sched=sched, model_fn=jax.tree_util.Partial(_toy_model_fn),
        num_inference_steps=10, inference_skip_factor=3, num_groups=2,
    )
    images = jnp.asarray(
        np.random.default_rng(4).uniform(size=(2, 8, 8, 1)).astype(np.float32)
    )
    base = ReconProgram(**kw)(images, jax.random.PRNGKey(7))
    t_starts, mse, perc, ssim_d = ReconProgram(score_ssim=True, **kw)(
        images, jax.random.PRNGKey(7)
    )
    ssim_d = np.asarray(ssim_d)
    assert ssim_d.shape == (len(t_starts), 2)
    assert np.isfinite(ssim_d).all() and (ssim_d >= 0).all() and (ssim_d <= 2).all()
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(mse))
    np.testing.assert_array_equal(np.asarray(base[2]), np.asarray(perc))

    both = ReconProgram(score_ssim=True, score_elbo=True, **kw)(
        images, jax.random.PRNGKey(7)
    )
    assert len(both) == 5
    assert (np.asarray(both[3]) > 0).all()  # elbo bits/dim
    np.testing.assert_array_equal(np.asarray(both[4]), ssim_d)

    with pytest.raises(ValueError, match="plms_ref"):
        ReconProgram(score_ssim=True, sampler="plms_ref", **kw)


def test_ood_scoring_with_ssim_target():
    import pandas as pd

    from ddpm_ood_tpu.ood.score import compute_ood_scores

    def df(names, typ, ssim_vals, mse_vals):
        return pd.DataFrame({
            "filename": names, "type": [typ] * len(names),
            "t": [100] * len(names), "mse": mse_vals,
            "perceptual_difference": [0.1 * i for i in range(len(names))],
            "ssim_distance": ssim_vals,
        })

    # mse is ANTI-informative (out below in) while ssim separates perfectly —
    # proves the auroc really follows the chosen target
    val = df(["v1", "v2", "v3"], "val", [0.10, 0.12, 0.14], [0.4, 0.5, 0.6])
    in_df = df(["i1", "i2"], "in", [0.11, 0.13], [0.5, 0.55])
    out_df = df(["o1", "o2"], "out", [0.8, 0.9], [0.41, 0.42])
    scored = compute_ood_scores(val, in_df, out_df, plot_target="ssim_distance")
    assert scored["auroc"] == 1.0
    combo = compute_ood_scores(val, in_df, out_df, plot_target="mse+ssim")
    assert "z_score_mse+ssim" in combo["rows"].columns

    # missing column fails loudly
    with pytest.raises(ValueError, match="ssim_distance"):
        compute_ood_scores(
            val.drop(columns="ssim_distance"),
            in_df.drop(columns="ssim_distance"),
            out_df.drop(columns="ssim_distance"),
            plot_target="ssim_distance",
        )
