"""Noise schedules and forward-process math as pure functions on device-resident tables.

Capability parity with the schedule setup of the reference (marksgraham/ddpm-ood):
  - beta schedules `linear_beta` / `scaled_linear_beta` as configured at
    reference base.py:97-103 (monai-generative DDPMScheduler contract),
  - the SNR-shift rewrite of betas/alphas/alphas_cumprod (reference base.py:104-116),
    implemented vectorized instead of the reference's Python loop,
  - `add_noise` (x_t = sqrt(acp_t) x0 + sqrt(1-acp_t) eps), used for training noising
    (reference ddpm_trainer.py:100-102) and reconstruction start points
    (reference src/trainers/reconstruct.py:143-147).

TPU-first design: the schedule is a frozen pytree of f32 `jnp` tables computed once
host-side; all per-step math is elementwise gathers/FMAs that XLA fuses into the
surrounding sampler scan. No Python control flow depends on traced values.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PredictionType = str  # "epsilon" | "sample" | "v_prediction"

_SCHEDULE_ALIASES = {
    "linear": "linear_beta",
    "scaled_linear": "scaled_linear_beta",
    "cosine": "cosine_beta",
}


def make_beta_schedule(
    schedule: str,
    num_train_timesteps: int = 1000,
    beta_start: float = 1e-4,
    beta_end: float = 2e-2,
) -> np.ndarray:
    """Beta table for the named schedule (host-side, float64 for accuracy then f32).

    `linear_beta` / `scaled_linear_beta` match the reference's choices
    (base.py:97-103). `cosine_beta` is a framework extension: the
    Improved-DDPM schedule (arXiv:2102.09672 §3.2, s=0.008, betas clipped at
    0.999) — it spreads noise more evenly over t, which matters for OOD
    scoring because the per-t z-scores sample the whole t range;
    beta_start/beta_end are ignored for it.
    """
    schedule = _SCHEDULE_ALIASES.get(schedule, schedule)
    if schedule == "linear_beta":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    elif schedule == "scaled_linear_beta":
        betas = (
            np.linspace(
                beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64
            )
            ** 2
        )
    elif schedule == "cosine_beta":
        s = 0.008
        t = np.arange(num_train_timesteps + 1, dtype=np.float64)
        f = np.cos((t / num_train_timesteps + s) / (1.0 + s) * np.pi / 2.0) ** 2
        acp = f / f[0]
        betas = np.clip(1.0 - acp[1:] / acp[:-1], 0.0, 0.999)
    else:
        raise ValueError(f"Unknown beta schedule: {schedule!r}")
    return betas.astype(np.float32)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Immutable device-resident schedule tables + prediction-type tag.

    Mirrors the mutable state of monai-generative's DDPMScheduler/PNDMScheduler that the
    reference rewrites in-place for SNR shift (base.py:104-116); here a shifted schedule
    is just a new value.
    """

    betas: jnp.ndarray  # (T,) f32
    alphas: jnp.ndarray  # (T,) f32
    alphas_cumprod: jnp.ndarray  # (T,) f32
    num_train_timesteps: int
    prediction_type: PredictionType = "epsilon"

    def tree_flatten(self):
        children = (self.betas, self.alphas, self.alphas_cumprod)
        aux = (self.num_train_timesteps, self.prediction_type)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        betas, alphas, alphas_cumprod = children
        return cls(betas, alphas, alphas_cumprod, aux[0], aux[1])


def make_schedule(
    schedule: str = "linear_beta",
    num_train_timesteps: int = 1000,
    beta_start: float = 1e-4,
    beta_end: float = 2e-2,
    prediction_type: PredictionType = "epsilon",
    snr_shift: float = 1.0,
) -> NoiseSchedule:
    betas = make_beta_schedule(schedule, num_train_timesteps, beta_start, beta_end)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, dtype=np.float64).astype(np.float32)
    sched = NoiseSchedule(
        betas=jnp.asarray(betas),
        alphas=jnp.asarray(alphas),
        alphas_cumprod=jnp.asarray(alphas_cumprod),
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
    )
    if snr_shift != 1.0:
        sched = apply_snr_shift(sched, snr_shift)
    return sched


def apply_snr_shift(sched: NoiseSchedule, factor: float) -> NoiseSchedule:
    """SNR-shifted schedule (reference base.py:104-116), vectorized.

    snr = acp/(1-acp); target = factor*snr; acp' = target/(1+target)
        = factor*acp / (1 - acp + factor*acp).
    alphas' recovered as the ratio of consecutive cumprods (the reference's loop),
    betas' = 1 - alphas'.
    """
    acp = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    new_acp = factor * acp / (1.0 - acp + factor * acp)
    new_alphas = np.empty_like(new_acp)
    new_alphas[0] = new_acp[0]
    new_alphas[1:] = new_acp[1:] / new_acp[:-1]
    new_betas = 1.0 - new_alphas
    return NoiseSchedule(
        betas=jnp.asarray(new_betas.astype(np.float32)),
        alphas=jnp.asarray(new_alphas.astype(np.float32)),
        alphas_cumprod=jnp.asarray(new_acp.astype(np.float32)),
        num_train_timesteps=sched.num_train_timesteps,
        prediction_type=sched.prediction_type,
    )


def _gather(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """table[t] broadcast against a sample of rank `ndim` with leading batch dim(s)."""
    vals = table[t]
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


def add_noise(
    sched: NoiseSchedule, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Forward process x_t = sqrt(acp_t) x0 + sqrt(1-acp_t) eps.

    `t` is a scalar or per-sample int array broadcast over the non-batch dims
    (reference ddpm_trainer.py:100-102 / monai-generative DDPMScheduler.add_noise).
    """
    acp = _gather(sched.alphas_cumprod, t, x0.ndim)
    return jnp.sqrt(acp) * x0 + jnp.sqrt(1.0 - acp) * noise


def velocity_from_x0_eps(
    sched: NoiseSchedule, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """v-prediction target: v = sqrt(acp) eps - sqrt(1-acp) x0."""
    acp = _gather(sched.alphas_cumprod, t, x0.ndim)
    return jnp.sqrt(acp) * noise - jnp.sqrt(1.0 - acp) * x0


def pred_x0_from_model_output(
    sched: NoiseSchedule,
    model_output: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    prediction_type: PredictionType | None = None,
) -> jnp.ndarray:
    """Predicted x0 given the model output under the configured prediction type."""
    ptype = prediction_type or sched.prediction_type
    acp = _gather(sched.alphas_cumprod, t, x_t.ndim)
    if ptype == "epsilon":
        return (x_t - jnp.sqrt(1.0 - acp) * model_output) / jnp.sqrt(acp)
    if ptype == "sample":
        return model_output
    if ptype == "v_prediction":
        return jnp.sqrt(acp) * x_t - jnp.sqrt(1.0 - acp) * model_output
    raise ValueError(f"Unknown prediction type: {ptype!r}")


def epsilon_from_model_output(
    sched: NoiseSchedule,
    model_output: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    prediction_type: PredictionType | None = None,
) -> jnp.ndarray:
    """Convert any model output to its implied epsilon (used by the PLMS sampler)."""
    ptype = prediction_type or sched.prediction_type
    acp = _gather(sched.alphas_cumprod, t, x_t.ndim)
    if ptype == "epsilon":
        return model_output
    if ptype == "sample":
        return (x_t - jnp.sqrt(acp) * model_output) / jnp.sqrt(1.0 - acp)
    if ptype == "v_prediction":
        return jnp.sqrt(acp) * model_output + jnp.sqrt(1.0 - acp) * x_t
    raise ValueError(f"Unknown prediction type: {ptype!r}")


def training_target(
    sched: NoiseSchedule, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """The regression target for the configured prediction type."""
    if sched.prediction_type == "epsilon":
        return noise
    if sched.prediction_type == "sample":
        return x0
    if sched.prediction_type == "v_prediction":
        return velocity_from_x0_eps(sched, x0, noise, t)
    raise ValueError(f"Unknown prediction type: {sched.prediction_type!r}")


def snr(sched: NoiseSchedule) -> jnp.ndarray:
    return sched.alphas_cumprod / (1.0 - sched.alphas_cumprod)


Tables = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
