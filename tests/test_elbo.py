"""Likelihood (ELBO) OOD scoring extension: weight math, exact-model zero,
sweep plumbing, scorer integration.

The reference scores OOD by reconstruction error only
(src/trainers/reconstruct.py:159-204); `--score_elbo=1` adds the per-(image, t)
variational-bound KL term (ddpm_ood_tpu/diffusion/elbo.py) as an `elbo` CSV
column that the scorer z-scores like mse/perceptual_difference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from ddpm_ood_tpu.diffusion.elbo import elbo_kl_weights, elbo_terms_from_model
from ddpm_ood_tpu.diffusion.schedules import add_noise, make_schedule
from ddpm_ood_tpu.ood.score import compute_ood_scores
from ddpm_ood_tpu.recon.sweep import ReconProgram

SCHED = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)


def test_elbo_weights_match_numpy_formula():
    """w_t = beta^2 / (2 sigma^2 alpha (1-acp)) with the fixed_small posterior
    variance, computed independently in float64."""
    betas = np.asarray(SCHED.betas, dtype=np.float64)
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    sigma_sq = betas * (1.0 - acp_prev) / (1.0 - acp)
    want = betas**2 / (2.0 * np.maximum(sigma_sq, 1e-20) * alphas * (1.0 - acp))
    got = np.asarray(elbo_kl_weights(SCHED))
    # t=0: sigma^2 -> 0 is clamped; only compare the meaningful range
    np.testing.assert_allclose(got[1:], want[1:], rtol=1e-4)
    assert np.isfinite(got).all()


def test_exact_epsilon_model_scores_zero():
    """A model that outputs the TRUE epsilon has zero KL at every t."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(size=(3, 8, 8, 1)).astype(np.float32))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    for t in (50, 500, 950):
        x_t = add_noise(SCHED, x0, noise, jnp.full((3,), t))
        terms = elbo_terms_from_model(SCHED, noise, x_t, noise, jnp.full((3,), t))
        np.testing.assert_allclose(np.asarray(terms), 0.0, atol=1e-10)


def test_worse_epsilon_scores_higher():
    """KL grows monotonically with epsilon error magnitude (per image)."""
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.uniform(size=(2, 8, 8, 1)).astype(np.float32))
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    t = jnp.full((2,), 300)
    x_t = add_noise(SCHED, x0, noise, t)
    err = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
    small = elbo_terms_from_model(SCHED, noise + 0.1 * err, x_t, noise, t)
    large = elbo_terms_from_model(SCHED, noise + 0.5 * err, x_t, noise, t)
    assert (np.asarray(large) > np.asarray(small)).all()
    assert (np.asarray(small) > 0).all()


def _toy_model_fn(x, t):
    tt = (t.astype(jnp.float32) / 1000.0).reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.sin(3.0 * x) * (0.5 + tt) + 0.1 * x


def test_recon_program_emits_elbo():
    """score_elbo=True returns a 4th (K, B) finite positive array; the first
    three outputs are bit-identical to the score_elbo=False program (same
    noise draw, untouched sweep)."""
    kw = dict(
        sched=SCHED,
        model_fn=jax.tree_util.Partial(_toy_model_fn),
        num_inference_steps=10,
        inference_skip_factor=3,
        num_groups=2,
    )
    images = jnp.asarray(
        np.random.default_rng(4).uniform(size=(2, 8, 8, 1)).astype(np.float32)
    )
    base = ReconProgram(**kw)(images, jax.random.PRNGKey(7))
    prog = ReconProgram(score_elbo=True, **kw)
    t_starts, mse, perc, elbo = prog(images, jax.random.PRNGKey(7))
    assert elbo.shape == mse.shape == (len(t_starts), 2)
    assert np.isfinite(np.asarray(elbo)).all()
    assert (np.asarray(elbo) > 0).all()
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(mse))
    np.testing.assert_array_equal(np.asarray(base[2]), np.asarray(perc))


def test_elbo_in_latent_space_with_pad():
    """LDM shape: elbo terms are computed on the ENCODED (and latent-padded)
    tensor the UNet consumes — the latent-diffusion likelihood — and the
    reconstruction metrics stay bit-identical to the elbo-off program."""
    enc = jax.tree_util.Partial(lambda x: x[:, ::2, ::2, :])     # 8x8 -> 4x4
    dec = jax.tree_util.Partial(
        lambda z: jnp.repeat(jnp.repeat(z, 2, axis=1), 2, axis=2)
    )
    kw = dict(
        sched=SCHED, model_fn=jax.tree_util.Partial(_toy_model_fn),
        num_inference_steps=10, inference_skip_factor=3, num_groups=2,
        encode_fn=enc, decode_fn=dec, latent_pad=(1, 1, 1, 1),  # 4x4 -> 6x6
        b_scale=1.5,
    )
    images = jnp.asarray(
        np.random.default_rng(7).uniform(size=(2, 8, 8, 1)).astype(np.float32)
    )
    base = ReconProgram(**kw)(images, jax.random.PRNGKey(3))
    t_starts, mse, perc, elbo = ReconProgram(score_elbo=True, **kw)(
        images, jax.random.PRNGKey(3)
    )
    assert elbo.shape == (len(t_starts), 2)
    assert np.isfinite(np.asarray(elbo)).all() and (np.asarray(elbo) > 0).all()
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(mse))
    np.testing.assert_array_equal(np.asarray(base[2]), np.asarray(perc))


def test_plms_ref_rejects_score_elbo():
    with pytest.raises(ValueError, match="plms_ref"):
        ReconProgram(
            sched=SCHED,
            model_fn=jax.tree_util.Partial(_toy_model_fn),
            num_inference_steps=10,
            inference_skip_factor=3,
            sampler="plms_ref",
            score_elbo=True,
        )


def test_get_scores_emits_elbo_rows():
    """The pipeline path: a score_elbo program makes get_scores write an
    'elbo' key on every row (incl. the wrap-padded ragged tail)."""
    from ddpm_ood_tpu.trainers.reconstruct import Reconstruct

    prog = ReconProgram(
        sched=SCHED, model_fn=jax.tree_util.Partial(_toy_model_fn),
        num_inference_steps=10, inference_skip_factor=3, num_groups=2,
        score_elbo=True,
    )

    class FakeRecon:
        _program = lambda self, skip: prog  # noqa: E731
        shard = staticmethod(jnp.asarray)
        _save_preview = lambda self, *a, **k: None  # noqa: E731

    def batch(n, tag):
        return {
            "image": np.random.default_rng(n).uniform(
                size=(n, 1, 8, 8)
            ).astype(np.float32),
            "filename": [f"{tag}_{i}.npy" for i in range(n)],
        }

    results = Reconstruct.get_scores(
        FakeRecon(), [batch(4, "full"), batch(2, "ragged")], "val", 3
    )
    assert all("elbo" in r and np.isfinite(r["elbo"]) and r["elbo"] > 0
               for r in results)
    K = len(prog.t_starts)
    assert len(results) == K * 6


def _rows(name, n_img, t_values, scale, rng):
    rows = []
    for i in range(n_img):
        for t in t_values:
            rows.append({
                "filename": f"{name}_{i}", "type": name if name != "val" else "val",
                "t": t,
                "mse": rng.normal(1.0, 0.05),
                "perceptual_difference": rng.normal(1.0, 0.05),
                "elbo": rng.normal(scale, 0.05),
            })
    return pd.DataFrame(rows)


def test_scorer_elbo_target_separates():
    """With mse/perceptual uninformative and elbo shifted for OOD, the elbo
    z-score target must reach AUROC 1.0 (and plain mse must not)."""
    rng = np.random.default_rng(5)
    ts = [100, 300, 500]
    val = _rows("val", 8, ts, 1.0, rng)
    in_df = _rows("in", 6, ts, 1.0, rng)
    out_df = _rows("out", 6, ts, 3.0, rng)
    scored = compute_ood_scores(val, in_df, out_df, plot_target="elbo")
    assert scored["auroc"] == 1.0
    scored_mse = compute_ood_scores(val, in_df, out_df, plot_target="mse")
    assert scored_mse["auroc"] < 0.9
    combo = compute_ood_scores(val, in_df, out_df, plot_target="mse+elbo")
    assert combo["auroc"] > 0.9


def test_scorer_elbo_target_without_column_raises():
    rng = np.random.default_rng(6)
    ts = [100]
    val = _rows("val", 4, ts, 1.0, rng).drop(columns=["elbo"])
    in_df = _rows("in", 3, ts, 1.0, rng).drop(columns=["elbo"])
    out_df = _rows("out", 3, ts, 2.0, rng).drop(columns=["elbo"])
    with pytest.raises(ValueError, match="score_elbo"):
        compute_ood_scores(val, in_df, out_df, plot_target="elbo")
