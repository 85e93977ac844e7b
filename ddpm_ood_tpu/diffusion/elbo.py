"""Per-timestep variational-bound (ELBO) terms for likelihood-based OOD.

Framework extension — the reference scores OOD purely by reconstruction error
(src/trainers/reconstruct.py:159-204). Likelihood-based scoring is the other
standard diffusion OOD family: the DDPM training objective is a variational
bound on -log p(x), and its per-timestep KL terms

    L_{t-1} = KL( q(x_{t-1} | x_t, x0)  ||  p_theta(x_{t-1} | x_t) )
            = w_t * ||eps - eps_theta(x_t, t)||^2            (fixed_small)
    w_t     = beta_t^2 / (2 sigma_t^2 alpha_t (1 - acp_t))
    sigma_t^2 = beta_t (1 - acp_{t-1}) / (1 - acp_t)

measure how well the model denoises THIS image at noise level t — exactly the
per-(image, t) row structure the reconstruction pipeline already Z-scores
against validation statistics. `--score_elbo=1` therefore adds an `elbo`
column (bits/dim) beside `mse`/`perceptual_difference`, reusing the same
noise draw and start points as the sweep at the cost of ONE extra mega-batched
UNet evaluation per lane group (~2% of the sweep; the trajectory itself is
free because the lanes already start from x_t = add_noise(x0, noise, t)).

All prediction types are supported by converting the model output to its
implied epsilon (`epsilon_from_model_output`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .schedules import NoiseSchedule, epsilon_from_model_output

_LN2 = float(np.log(2.0))


def elbo_kl_weights(sched: NoiseSchedule) -> jnp.ndarray:
    """(T,) table of w_t = beta_t^2 / (2 sigma_t^2 alpha_t (1-acp_t)).

    t is clamped to >= 1 for the acp_{t-1} lookup: at t=0 the true-posterior
    variance degenerates to 0 and the KL term is replaced by the discretized
    decoder term in the exact bound; start-point grids never include t=0
    (pndm_start_points begins at the first skip stride), so the clamp only
    guards malformed inputs.
    """
    acp = sched.alphas_cumprod
    acp_prev = jnp.concatenate([jnp.ones((1,), acp.dtype), acp[:-1]])
    sigma_sq = sched.betas * (1.0 - acp_prev) / (1.0 - acp)
    sigma_sq = jnp.maximum(sigma_sq, 1e-20)
    return jnp.square(sched.betas) / (
        2.0 * sigma_sq * sched.alphas * (1.0 - acp)
    )


def elbo_terms_from_model(
    sched: NoiseSchedule,
    model_output: jnp.ndarray,
    x_t: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """KL terms (bits/dim) from a raw model output of any prediction type.

    model_output/x_t/noise: (B, *spatial, C); t: scalar or (B,). Returns (B,).
    """
    eps_pred = epsilon_from_model_output(sched, model_output, x_t, t)
    w = elbo_kl_weights(sched)[t]
    per_img = jnp.mean(jnp.square(noise - eps_pred),
                       axis=tuple(range(1, noise.ndim)))
    return w * per_img / _LN2
