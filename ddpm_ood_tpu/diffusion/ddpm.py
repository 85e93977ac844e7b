"""DDPM ancestral sampler as a single `lax.scan` device program.

Parity: monai-generative DDPMScheduler.step (variance_type="fixed_small",
clip_sample=True) driven by DiffusionInferer.sample — the full-T ancestral loop used
for validation sample grids in the reference (ddpm_trainer.py:189-195, base.py:121).

TPU-first: the whole T-step loop is one scan under jit (compiled once, static trip
count); per-step math is elementwise and fuses around the UNet call.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .schedules import NoiseSchedule, pred_x0_from_model_output


def ddpm_step(
    sched: NoiseSchedule,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    x_t: jnp.ndarray,
    noise: jnp.ndarray,
    clip_sample: bool = True,
) -> jnp.ndarray:
    """One ancestral posterior sample x_{t-1} ~ q(x_{t-1} | x_t, pred_x0).

    `t` is a scalar (same timestep across the batch, as in the reference's sampling
    loop); `noise` must be a fresh standard normal of x_t's shape.
    """
    acp_t = sched.alphas_cumprod[t]
    acp_prev = jnp.where(t > 0, sched.alphas_cumprod[jnp.maximum(t - 1, 0)], 1.0)
    beta_t = sched.betas[t]
    alpha_t = sched.alphas[t]

    x0 = pred_x0_from_model_output(sched, model_output, x_t, t)
    if clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)

    coef_x0 = jnp.sqrt(acp_prev) * beta_t / (1.0 - acp_t)
    coef_xt = jnp.sqrt(alpha_t) * (1.0 - acp_prev) / (1.0 - acp_t)
    mean = coef_x0 * x0 + coef_xt * x_t

    variance = jnp.clip((1.0 - acp_prev) / (1.0 - acp_t) * beta_t, min=1e-20)
    sigma = jnp.where(t > 0, jnp.sqrt(variance), 0.0)
    return mean + sigma * noise


def ddpm_sample(
    sched: NoiseSchedule,
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    input_noise: jnp.ndarray,
    rng: jax.Array,
    clip_sample: bool = True,
) -> jnp.ndarray:
    """Full ancestral sampling loop: x_T=input_noise -> x_0, T steps in one scan.

    `model_fn(x, t_batch)` maps (B, ...) samples + (B,) int timesteps to the model
    output (the jitted UNet apply).
    """
    num_t = sched.num_train_timesteps
    batch = input_noise.shape[0]

    def body(carry, t):
        x, key = carry
        key, nkey = jax.random.split(key)
        t_batch = jnp.full((batch,), t, dtype=jnp.int32)
        model_output = model_fn(x, t_batch)
        noise = jax.random.normal(nkey, x.shape, dtype=x.dtype)
        x = ddpm_step(sched, model_output, t, x, noise, clip_sample=clip_sample)
        return (x, key), None

    ts = jnp.arange(num_t - 1, -1, -1, dtype=jnp.int32)
    (x, _), _ = jax.lax.scan(body, (input_noise, rng), ts)
    return x
