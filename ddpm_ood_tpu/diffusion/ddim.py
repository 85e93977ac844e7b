"""DDIM sampler (arXiv:2010.02502) as a stateless update + scan driver.

The reference reconstructs with PLMS only (src/trainers/reconstruct.py:98-157);
DDIM is the framework's additional sampler option (BASELINE.json names the
"100-step DDIM" workload): deterministic at eta=0, no warm-up state machine, one
UNet call per step — cheaper than PLMS in both memory (no epsilon history) and
control flow, at slightly lower ODE-integration order.

    x_{t_prev} = sqrt(acp_prev) * x0_pred
               + sqrt(1 - acp_prev - sigma^2) * eps_pred
               + sigma * noise
    sigma = eta * sqrt((1-acp_prev)/(1-acp_t)) * sqrt(1 - acp_t/acp_prev)
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .schedules import (
    NoiseSchedule,
    epsilon_from_model_output,
    pred_x0_from_model_output,
)


def ddim_step(
    sched: NoiseSchedule,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    t_prev: jnp.ndarray,
    x_t: jnp.ndarray,
    eta: float = 0.0,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One DDIM update x_t -> x_{t_prev}; t_prev < 0 means 'to x_0'."""
    acp = sched.alphas_cumprod
    acp_t = acp[jnp.clip(t, 0, sched.num_train_timesteps - 1)]
    acp_prev = jnp.where(
        t_prev >= 0,
        acp[jnp.clip(t_prev, 0, sched.num_train_timesteps - 1)],
        jnp.ones(()),
    )
    x0 = pred_x0_from_model_output(sched, model_output, x_t, t)
    eps = epsilon_from_model_output(sched, model_output, x_t, t)
    if eta > 0.0:
        sigma = (
            eta
            * jnp.sqrt((1.0 - acp_prev) / (1.0 - acp_t))
            * jnp.sqrt(1.0 - acp_t / acp_prev)
        )
    else:
        sigma = jnp.zeros(())
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - acp_prev - sigma**2, 0.0)) * eps
    out = jnp.sqrt(acp_prev) * x0 + dir_xt
    if eta > 0.0:
        assert noise is not None, "eta > 0 requires noise"
        out = out + sigma * noise
    return out


def ddim_timesteps(num_train_timesteps: int = 1000, num_inference_steps: int = 100):
    """Descending evenly-spaced grid (no PLMS duplicate entry)."""
    import numpy as np

    step_ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step_ratio).round().astype(np.int32)
    return ts[::-1].copy()


def ddim_denoise(
    sched: NoiseSchedule,
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_start: jnp.ndarray,
    timesteps_desc: jnp.ndarray,
    t_start: jnp.ndarray,
    num_inference_steps: int,
    eta: float = 0.0,
) -> jnp.ndarray:
    """Denoise from t_start over {timesteps <= t_start} in one masked scan
    (same variable-length-suffix contract as plms_denoise)."""
    step_ratio = sched.num_train_timesteps // num_inference_steps
    batch = x_start.shape[0]

    def body(x, t):
        active = t <= t_start
        t_batch = jnp.full((batch,), t, dtype=jnp.int32)
        out = model_fn(x, t_batch)
        new_x = ddim_step(sched, out, t, t - step_ratio, x, eta=eta)
        return jnp.where(active, new_x, x), None

    x, _ = jax.lax.scan(body, x_start, timesteps_desc)
    return x
