"""Jitted DDPM/LDM training step: the reference hot loop as one device program.

Parity with the reference per-step pipeline (ddpm_trainer.py:66-124): frozen-VQVAE
encode (LDM), latent pad, t ~ U[0, T), Gaussian (or externally supplied simplex)
noise, add_noise(x * b_scale), UNet prediction, MSE to the prediction-type target,
Adam(lr=2.5e-5, reference base.py:156) update.

TPU-first:
  - one `jit`: noising, forward, backward, and optimizer update fuse into a single
    XLA program; under a data-sharded mesh the gradient all-reduce is compiled in as
    ICI collectives (replacing torch DDP, reference base.py:160-164);
  - bf16 compute / f32 params & optimizer — no GradScaler (reference base.py:122's
    AMP loss-scaling is unnecessary: bf16 keeps fp32 exponent range);
  - loss is computed in f32; global_step counts IMAGES like the reference
    (ddpm_trainer.py:110).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ..diffusion.schedules import NoiseSchedule, add_noise, training_target
from ..utils.padding import pad_torch_style


class TrainState(train_state.TrainState):
    # Exponential moving average of params (framework extension; the reference
    # trains without weight EMA). None when disabled so the checkpoint payload
    # and restore templates keep the reference schema exactly in that case.
    ema_params: Optional[dict] = None


def make_ddpm_state(
    unet,
    rng: jax.Array,
    sample_shape: Tuple[int, ...],
    learning_rate: float = 2.5e-5,
    with_ema: bool = False,
    lr_warmup_steps: int = 0,
) -> TrainState:
    """Init params on a (1, *spatial, C) dummy and build the Adam state.

    lr_warmup_steps > 0 (framework extension; the reference trains at a fixed
    Adam 2.5e-5, base.py:156) linearly ramps the lr from 0 over that many
    optimizer steps, then holds it constant. Off by default — the optimizer
    state tree then matches the reference-era checkpoints exactly (a schedule
    adds a step-count leaf)."""
    dummy_x = jnp.zeros((1,) + tuple(sample_shape), dtype=jnp.float32)
    dummy_t = jnp.zeros((1,), dtype=jnp.int32)
    params = unet.init(rng, dummy_x, dummy_t)["params"]
    if lr_warmup_steps > 0:
        lr = optax.linear_schedule(
            init_value=0.0, end_value=learning_rate,
            transition_steps=lr_warmup_steps,
        )
    else:
        lr = learning_rate
    tx = optax.adam(lr)
    ema = jax.tree_util.tree_map(jnp.array, params) if with_ema else None
    return TrainState.create(
        apply_fn=unet.apply, params=params, tx=tx, ema_params=ema
    )


def _effective_accum(k: int, batch: int) -> int:
    """Largest divisor of `batch` that is <= k (static, trace-time).

    Nominal batches split into exactly k microbatches; a ragged loader tail
    (batch % k != 0) splits into the most microbatches it evenly can, keeping
    its microbatch size <= the nominal one (a plain fallback to k=1 would run
    the tail at FULL batch activations — the very thing accumulation is
    avoiding in the memory-bound regimes)."""
    if k <= 1 or batch <= 1:
        return 1
    return max(d for d in range(1, min(k, batch) + 1) if batch % d == 0)


@dataclasses.dataclass
class DDPMTrainStep:
    """Builds the jitted train/eval steps for a (possibly latent) DDPM.

    For the LDM path, pass `encode_fn` as a `jax.tree_util.Partial` binding the
    frozen VQ-VAE variables — it is threaded through jit as a TRACED argument
    (a closure would bake the VQ-VAE weights into the HLO as constants, which
    bloats compiles and can exceed remote-compile request limits).
    """

    sched: NoiseSchedule
    b_scale: float = 1.0
    has_encoder: bool = False  # LDM path: steps take a trailing encode_fn arg
    latent_pad: Optional[Tuple[int, ...]] = None
    external_noise: bool = False  # True: caller supplies noise (simplex path)
    ema_decay: float = 0.0  # > 0: update state.ema_params each step (extension)
    # > 1: accumulate gradients over grad_accum equal microbatches via lax.scan
    # inside the SAME jitted step (framework extension; the reference has no
    # accumulation). One UNet fwd/bwd's activations are live at a time, cutting
    # activation memory ~grad_accum-fold while the Adam update and loss remain
    # bit-comparable to the full batch (mean of equal-microbatch means). Batch
    # shapes not divisible by grad_accum (ragged loader tails) fall back to the
    # unaccumulated path at trace time.
    grad_accum: int = 1

    def _prepare(self, images: jnp.ndarray, encode_fn) -> jnp.ndarray:
        x = images
        if encode_fn is not None:
            x = encode_fn(x)
        if self.latent_pad:
            x = pad_torch_style(x, self.latent_pad)
        return x

    def _loss(self, state: TrainState, params, x0, noise, t):
        x_scaled = x0 * self.b_scale
        x_t = add_noise(self.sched, x_scaled, noise, t)
        target = training_target(self.sched, x_scaled, noise, t)
        pred = state.apply_fn({"params": params}, x_t, t)
        return jnp.mean(jnp.square(pred.astype(jnp.float32) - target))

    def _grads(self, state, x0, noise, t):
        k = _effective_accum(self.grad_accum, x0.shape[0])
        if k <= 1:
            return jax.value_and_grad(
                lambda p: self._loss(state, p, x0, noise, t)
            )(state.params)

        m = x0.shape[0] // k
        split = lambda a: a.reshape((k, m) + a.shape[1:])

        def micro(carry, xs):
            g_sum, l_sum = carry
            x0_i, noise_i, t_i = xs
            loss_i, g_i = jax.value_and_grad(
                lambda p: self._loss(state, p, x0_i, noise_i, t_i)
            )(state.params)
            return (
                jax.tree_util.tree_map(jnp.add, g_sum, g_i),
                l_sum + loss_i,
            ), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (g_sum, l_sum), _ = jax.lax.scan(
            micro,
            (zeros, jnp.zeros((), jnp.float32)),
            (split(x0), split(noise), split(t)),
        )
        return l_sum / k, jax.tree_util.tree_map(lambda g: g / k, g_sum)

    def _update(self, state, x0, noise, t):
        loss, grads = self._grads(state, x0, noise, t)
        new_state = state.apply_gradients(grads=grads)
        if self.ema_decay > 0.0:
            d = self.ema_decay
            new_state = new_state.replace(
                ema_params=jax.tree_util.tree_map(
                    lambda e, p: d * e + (1.0 - d) * p,
                    state.ema_params,
                    new_state.params,
                )
            )
        return new_state, loss

    def _draw(self, rng, x0):
        t_key, n_key = jax.random.split(rng)
        t = jax.random.randint(
            t_key, (x0.shape[0],), 0, self.sched.num_train_timesteps,
            dtype=jnp.int32,
        )
        noise = jax.random.normal(n_key, x0.shape, dtype=x0.dtype)
        return t, noise

    def make_train_step(self):
        """internal-noise: step(state, images, rng[, encode_fn]); external
        (simplex path, the reference generates noise host-side too,
        ddpm_trainer.py:93-98): step(state, images, t, noise[, encode_fn])."""
        if self.external_noise:
            if self.has_encoder:
                def step(state, images, t, noise, encode_fn):
                    x0 = self._prepare(images, encode_fn)
                    return self._update(state, x0, noise, t)
            else:
                def step(state, images, t, noise):
                    x0 = self._prepare(images, None)
                    return self._update(state, x0, noise, t)
            return jax.jit(step, donate_argnums=(0,))

        if self.has_encoder:
            def step(state, images, rng, encode_fn):
                x0 = self._prepare(images, encode_fn)
                t, noise = self._draw(rng, x0)
                return self._update(state, x0, noise, t)
        else:
            def step(state, images, rng):
                x0 = self._prepare(images, None)
                t, noise = self._draw(rng, x0)
                return self._update(state, x0, noise, t)
        return jax.jit(step, donate_argnums=(0,))

    def make_eval_step(self):
        if self.external_noise:
            if self.has_encoder:
                def step(state, images, t, noise, encode_fn):
                    x0 = self._prepare(images, encode_fn)
                    return self._loss(state, state.params, x0, noise, t)
            else:
                def step(state, images, t, noise):
                    x0 = self._prepare(images, None)
                    return self._loss(state, state.params, x0, noise, t)
            return jax.jit(step)

        if self.has_encoder:
            def step(state, images, rng, encode_fn):
                x0 = self._prepare(images, encode_fn)
                t, noise = self._draw(rng, x0)
                return self._loss(state, state.params, x0, noise, t)
        else:
            def step(state, images, rng):
                x0 = self._prepare(images, None)
                t, noise = self._draw(rng, x0)
                return self._loss(state, state.params, x0, noise, t)
        return jax.jit(step)
