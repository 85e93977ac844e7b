"""Jitted VQ-VAE + PatchGAN training steps (generator and discriminator).

Parity with the reference per-step pipeline (vqvae_trainer.py:211-310):
  G: (recon, q_loss) = VQVAE(images); logits_fake = D(recon)[-1];
     total = L1 + q_loss + perceptual_weight * LPIPS + jukebox + adv_weight * LSGAN,
     with the adversarial weight linearly warmed over the first 50 epochs
     (vqvae_trainer.py:239-242); Adam(vqvae_lr) for G, Adam(5e-4) for D
     (vqvae_trainer.py:93-96).
  D: LSGAN on detached recon vs real, halved sum, scaled by adv_weight
     (vqvae_trainer.py:254-266).

TPU-first: G and D updates are two jitted programs (the reference's two
backward/step calls); EMA codebook updates ride the G step as mutable Flax "ema"
state computed from the GLOBAL batch — XLA inserts the cross-chip reduction,
replacing monai's ddp_sync all-reduce (reference train_vqvae.py:50). BatchNorm
stats thread through "batch_stats".
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ..losses.gan import discriminator_loss, generator_adversarial_loss
from ..losses.spectral import jukebox_loss
from .ddpm import _effective_accum


class VQVAEState(train_state.TrainState):
    ema: dict = None  # EMA codebook stats (non-gradient state)


class DiscState(train_state.TrainState):
    batch_stats: dict = None


def make_vqvae_states(
    vqvae,
    discriminator,
    rng: jax.Array,
    sample_shape: Tuple[int, ...],
    vqvae_lr: float = 3e-4,
    disc_lr: float = 5e-4,
) -> Tuple[VQVAEState, DiscState]:
    g_rng, d_rng = jax.random.split(rng)
    dummy = jnp.zeros((1,) + tuple(sample_shape), dtype=jnp.float32)
    g_vars = vqvae.init({"params": g_rng}, dummy, False)
    d_vars = discriminator.init({"params": d_rng}, dummy, False)
    g_state = VQVAEState.create(
        apply_fn=vqvae.apply,
        params=g_vars["params"],
        tx=optax.adam(vqvae_lr),
        ema=g_vars.get("ema", {}),
    )
    d_state = DiscState.create(
        apply_fn=discriminator.apply,
        params=d_vars["params"],
        tx=optax.adam(disc_lr),
        batch_stats=d_vars.get("batch_stats", {}),
    )
    return g_state, d_state


@dataclasses.dataclass
class VQVAETrainSteps:
    spatial_dims: int = 2
    perceptual_weight: float = 0.001
    perceptual_fn: Optional[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]] = None
    # > 1: accumulate generator gradients over grad_accum equal microbatches
    # via lax.scan inside the jitted G step (framework extension): one
    # microbatch's VQVAE fwd/bwd activations are live at a time. Gradients,
    # scalar metrics AND the EMA codebook update are exact vs the full batch —
    # the quantizer's per-batch (counts, sums) are additive over microbatches,
    # so the decay blend + Laplace smoothing (models/vqvae.py:218-232) is
    # re-applied once on the combined stats (quant_decay/quant_epsilon must
    # match the quantizer's). The D step is untouched: it is activation-light
    # (no generator tape) and its BatchNorm sees the full batch.
    grad_accum: int = 1
    quant_decay: float = 0.99
    quant_epsilon: float = 1e-5

    def _g_loss_fn(self, g_state, d_state, images, adv_weight):
        def loss_fn(params, images_i):
            (recon, q_loss), new_vars = g_state.apply_fn(
                {"params": params, "ema": g_state.ema},
                images_i,
                True,
                mutable=["ema"],
            )
            recon_f = recon.astype(jnp.float32)
            logits_fake = d_state.apply_fn(
                {"params": d_state.params, "batch_stats": d_state.batch_stats},
                recon_f,
                False,
            )[-1]
            l1 = jnp.mean(jnp.abs(recon_f - images_i))
            if self.perceptual_fn is not None:
                p_loss = jnp.mean(self.perceptual_fn(images_i, recon_f))
            else:
                p_loss = jnp.zeros(())
            jb = jukebox_loss(recon_f, images_i, self.spatial_dims)
            adv = generator_adversarial_loss(logits_fake)
            total = (
                l1 + q_loss + self.perceptual_weight * p_loss + jb
                + adv_weight * adv
            )
            metrics = {
                "l1_loss": l1,
                "quantization_loss": q_loss,
                "perceptual_loss": p_loss,
                "jukebox_loss": jb,
                "adversarial_loss": adv,
                "generator_loss": total,
                "recon": recon_f,
            }
            return total, (new_vars["ema"], metrics)

        return loss_fn

    def _combine_ema(self, orig, summed, k):
        """Exact global-batch EMA from k per-microbatch EMA results.

        Each microbatch i was applied against the SAME original stats, so its
        returned cluster_size/embed_avg are affine in that microbatch's counts
        and sums: new_i = decay * orig + (1-decay) * stat_i. Summing over i and
        subtracting (k-1) * decay * orig leaves decay * orig + (1-decay) *
        sum_i(stat_i) — exactly the single full-batch update. The embedding is
        a nonlinear normalization of those stats and is recomputed once
        (mirror of models/vqvae.py:224-232)."""
        if hasattr(orig, "keys") and {"cluster_size", "embed_avg", "embedding"} <= set(orig.keys()):
            d = self.quant_decay
            cs = summed["cluster_size"] - (k - 1) * d * orig["cluster_size"]
            ea = summed["embed_avg"] - (k - 1) * d * orig["embed_avg"]
            total = jnp.sum(cs)
            n_emb = cs.shape[0]
            smoothed = (
                (cs + self.quant_epsilon)
                / (total + n_emb * self.quant_epsilon)
                * total
            )
            return {
                "cluster_size": cs,
                "embed_avg": ea,
                "embedding": ea / smoothed[:, None],
            }
        if hasattr(orig, "keys"):
            return {key: self._combine_ema(orig[key], summed[key], k) for key in orig}
        raise ValueError("unrecognized EMA collection layout")

    def make_generator_step(self):
        scalar_tags = (
            "l1_loss", "quantization_loss", "perceptual_loss", "jukebox_loss",
            "adversarial_loss", "generator_loss",
        )

        def step(g_state: VQVAEState, d_state: DiscState, images: jnp.ndarray,
                 adv_weight: jnp.ndarray):
            loss_fn = self._g_loss_fn(g_state, d_state, images, adv_weight)
            # ragged tails split into the most microbatches that divide them
            # evenly (train/ddpm.py:_effective_accum)
            k = _effective_accum(self.grad_accum, images.shape[0])
            if k <= 1:
                (_, (new_ema, metrics)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(g_state.params, images)
            else:
                m = images.shape[0] // k

                def micro(carry, images_i):
                    g_sum, ema_sum, s_sum = carry
                    (_, (ema_i, metrics_i)), g_i = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(g_state.params, images_i)
                    carry = (
                        jax.tree_util.tree_map(jnp.add, g_sum, g_i),
                        jax.tree_util.tree_map(jnp.add, ema_sum, ema_i),
                        {t: s_sum[t] + metrics_i[t] for t in scalar_tags},
                    )
                    return carry, metrics_i["recon"]

                zeros_g = jax.tree_util.tree_map(jnp.zeros_like, g_state.params)
                zeros_e = jax.tree_util.tree_map(
                    lambda a: jnp.zeros_like(jnp.asarray(a)), g_state.ema
                )
                zeros_s = {t: jnp.zeros((), jnp.float32) for t in scalar_tags}
                (g_sum, ema_sum, s_sum), recons = jax.lax.scan(
                    micro,
                    (zeros_g, zeros_e, zeros_s),
                    images.reshape((k, m) + images.shape[1:]),
                )
                grads = jax.tree_util.tree_map(lambda g: g / k, g_sum)
                new_ema = self._combine_ema(g_state.ema, ema_sum, k)
                metrics = {t: s_sum[t] / k for t in scalar_tags}
                metrics["recon"] = recons.reshape((-1,) + recons.shape[2:])
            g_state = g_state.apply_gradients(grads=grads)
            g_state = g_state.replace(ema=new_ema)
            return g_state, metrics

        return jax.jit(step, donate_argnums=(0,))

    def make_discriminator_step(self):
        def step(d_state: DiscState, recon: jnp.ndarray, images: jnp.ndarray,
                 adv_weight: jnp.ndarray):
            recon = jax.lax.stop_gradient(recon)

            def loss_fn(params):
                logits_fake, new_vars = d_state.apply_fn(
                    {"params": params, "batch_stats": d_state.batch_stats},
                    recon,
                    True,
                    mutable=["batch_stats"],
                )
                logits_real, new_vars = d_state.apply_fn(
                    {"params": params, "batch_stats": new_vars["batch_stats"]},
                    images,
                    True,
                    mutable=["batch_stats"],
                )
                d_loss = discriminator_loss(logits_fake[-1], logits_real[-1])
                return adv_weight * d_loss, (new_vars["batch_stats"], d_loss)

            (_, (new_bs, d_loss)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(d_state.params)
            d_state = d_state.apply_gradients(grads=grads)
            d_state = d_state.replace(batch_stats=new_bs)
            return d_state, d_loss

        return jax.jit(step, donate_argnums=(0,))

    def make_eval_step(self):
        def step(g_state: VQVAEState, d_state: DiscState, images: jnp.ndarray):
            (recon, q_loss) = g_state.apply_fn(
                {"params": g_state.params, "ema": g_state.ema}, images, False
            )
            recon_f = recon.astype(jnp.float32)
            logits_fake = d_state.apply_fn(
                {"params": d_state.params, "batch_stats": d_state.batch_stats},
                recon_f,
                False,
            )[-1]
            l1 = jnp.mean(jnp.abs(recon_f - images))
            if self.perceptual_fn is not None:
                p_loss = jnp.mean(self.perceptual_fn(images, recon_f))
            else:
                p_loss = jnp.zeros(())
            jb = jukebox_loss(recon_f, images, self.spatial_dims)
            adv = generator_adversarial_loss(logits_fake)
            total = l1 + q_loss + self.perceptual_weight * p_loss + jb
            return {
                "l1_loss": l1,
                "quantization_loss": q_loss,
                "perceptual_loss": p_loss,
                "jukebox_loss": jb,
                "adversarial_loss": adv,
                "generator_loss": total,
                "recon": recon_f,
            }

        return jax.jit(step)


def adversarial_weight(
    adv_weight: float, epoch: int, warmup: bool
) -> float:
    """Linear 50-epoch warm-up of the adversarial weight (vqvae_trainer.py:239-242)."""
    if warmup:
        return adv_weight * min(epoch, 50) / 50
    return adv_weight
