"""DDPM/LDM trainer: epoch loop, checkpointing policy, TensorBoard metrics.

Capability parity with the reference DDPMTrainer (src/trainers/ddpm_trainer.py):
  - epoch loop with best-on-TRAIN-loss rolling `checkpoint` (reference :43-50,
    a documented reference behavior), periodic `checkpoint_{N}` every
    checkpoint_every (:52-57), validation every eval_freq (:59-61);
  - per-step: uniform t, gaussian-or-simplex noise, add_noise(x * b_scale), MSE on
    the prediction-type target (:85-108) — all fused into ONE jitted device step
    (train/ddpm.py) instead of separate kernel launches + DDP all-reduce;
  - TensorBoard per-step train loss and per-epoch val loss (:118-120, 165-167);
    `global_step` counts images (:110);
  - val-time DDPM ancestral sample grid written as a figure (:179-216), via the
    `lax.scan` sampler (diffusion/ddpm.py);
  - `--quick_test` runs one train + one val batch (:20-22, 121-122).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import get_training_data_loader
from ..diffusion.ddpm import ddpm_sample
from ..noise.simplex import Simplex, generate_simplex_noise
from ..train.ddpm import DDPMTrainStep
from ..utils.logging import Logger, info
from .base import BaseTrainer, channels_last


class DDPMTrainer(BaseTrainer):
    def __init__(self, args):
        super().__init__(args)
        self.logger_train = Logger(self.run_dir / "train")
        self.logger_val = Logger(self.run_dir / "val")

        self.train_loader, self.val_loader = get_training_data_loader(
            batch_size=args.batch_size,
            training_ids=args.training_ids,
            validation_ids=args.validation_ids,
            augmentation=bool(args.augmentation),
            num_workers=args.num_workers,
            cache_data=bool(args.cache_data),
            is_grayscale=bool(args.is_grayscale),
            image_size=self.image_size,
            image_roi=self.image_roi,
            spatial_dimension=self.spatial_dimension,
            num_processes=jax.process_count(),
            process_index=jax.process_index(),
        )

        self._has_encoder = self.vqvae_vars is not None
        grad_accum = int(getattr(args, "grad_accum_steps", 1) or 1)
        if grad_accum > 1 and args.batch_size % grad_accum != 0:
            raise ValueError(
                f"--batch_size {args.batch_size} is not divisible by "
                f"--grad_accum_steps {grad_accum}"
            )
        step_builder = DDPMTrainStep(
            sched=self.sched,
            b_scale=self.b_scale,
            has_encoder=self._has_encoder,
            latent_pad=self.latent_pad,
            external_noise=self.simplex_noise,
            ema_decay=self.ema_decay,
            grad_accum=grad_accum,
        )
        self._train_step = step_builder.make_train_step()
        self._eval_step = step_builder.make_eval_step()
        if self.simplex_noise:
            self.simplex = Simplex()
        self.rng = jax.random.PRNGKey(1234 + jax.process_index())
        self.profile_dir = getattr(args, "profile_dir", None)
        # validation sampler jitted ONCE: sched/model_fn ride through as traced
        # pytree args, so every val_epoch reuses the same compiled program (a
        # fresh lambda per call would re-trace the 1000-step sampler each eval)
        self._sample_jit = jax.jit(ddpm_sample)

    # ------------------------------------------------------------------ train --
    def train(self, args):
        from ..utils.preemption import PreemptionGuard, checkpoint_if_preempted

        guard = PreemptionGuard().install()
        try:
            for epoch in range(self.start_epoch, args.n_epochs):
                epoch_loss = self.train_epoch(epoch)
                if epoch_loss < self.best_loss:
                    self.best_loss = epoch_loss
                    self.save_checkpoint(
                        "checkpoint", epoch,
                        f"Saving checkpoint for model with best loss {epoch_loss}",
                    )
                if (epoch + 1) % args.checkpoint_every == 0:
                    self.save_checkpoint(
                        f"checkpoint_{epoch + 1}", epoch,
                        f"Saving checkpoint at epoch {epoch + 1}",
                    )
                if checkpoint_if_preempted(guard, self, epoch, args):
                    break
                if (epoch + 1) % args.eval_freq == 0:
                    self.val_epoch(epoch)
        finally:
            guard.uninstall()
        from ..utils.checkpoint import wait_for_checkpoints

        wait_for_checkpoints()
        info("Training completed.")

    def _simplex_batch(self, images_cl: np.ndarray):
        """Host-side t + simplex noise (the reference also generates simplex on
        CPU, ddpm_trainer.py:93-98)."""
        b = images_cl.shape[0]
        t = np.random.randint(0, self.sched.num_train_timesteps, size=(b,))
        # noise shaped like the UNet input (latent shape for LDM)
        sample_shape = (b,) + tuple(self._latent_sample_shape())
        noise = generate_simplex_noise(self.simplex, sample_shape, t)
        return t.astype(np.int32), noise.astype(np.float32)

    def train_epoch(self, epoch: int) -> float:
        epoch_loss = 0.0
        epoch_images = 0
        t0 = time.time()
        # keep losses on device and flush in chunks: reading `float(loss)` every
        # step would force a host sync per step and serialize dispatch (the
        # reference's .item() per step does exactly that, ddpm_trainer.py:110)
        pending = []

        def flush():
            nonlocal epoch_loss
            for gstep, bsz, dev_loss in pending:
                val = float(dev_loss)
                epoch_loss += val * bsz
                self.logger_train.add_scalar("loss", val, gstep)
            pending.clear()

        profiling = False
        for step, batch in enumerate(self.train_loader):
            # device trace of warm steps 2-4 of the first epoch (SURVEY.md §5:
            # the reference has no tracing; this is the rebuild's profiler hook)
            if self.profile_dir and epoch == self.start_epoch and step == 2:
                jax.profiler.start_trace(self.profile_dir)
                profiling = True
            images = channels_last(batch["image"])
            bsz = images.shape[0]
            device_batch = self.shard(images)
            extra = (self.encode_fn,) if self._has_encoder else ()
            if self.simplex_noise:
                t, noise = self._simplex_batch(images)
                self.state, loss = self._train_step(
                    self.state, device_batch, self.shard(t), self.shard(noise),
                    *extra,
                )
            else:
                self.rng, key = jax.random.split(self.rng)
                self.state, loss = self._train_step(
                    self.state, device_batch, key, *extra
                )
            self.global_step += bsz
            epoch_images += bsz
            pending.append((self.global_step, bsz, loss))
            if profiling and step >= 4:
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
                profiling = False
                info(f"Wrote device trace to {self.profile_dir}")
            if len(pending) >= 32:
                flush()
            if self.quick_test:
                break
        if profiling:
            jax.profiler.stop_trace()
        flush()
        dt = time.time() - t0
        info(
            f"Epoch {epoch}: train loss {epoch_loss / max(epoch_images, 1):.6f} "
            f"({epoch_images} images in {dt:.1f}s, "
            f"{epoch_images / max(dt, 1e-9):.1f} img/s)"
        )
        return epoch_loss / max(epoch_images, 1)

    # -------------------------------------------------------------------- val --
    def val_epoch(self, epoch: int) -> None:
        total, count = 0.0, 0
        last_batch = None
        for step, batch in enumerate(self.val_loader):
            images = channels_last(batch["image"])
            device_batch = self.shard(images)
            extra = (self.encode_fn,) if self._has_encoder else ()
            if self.simplex_noise:
                t, noise = self._simplex_batch(images)
                loss = self._eval_step(
                    self.state, device_batch, self.shard(t), self.shard(noise),
                    *extra,
                )
            else:
                self.rng, key = jax.random.split(self.rng)
                loss = self._eval_step(self.state, device_batch, key, *extra)
            total += float(loss) * images.shape[0]
            count += images.shape[0]
            last_batch = images
            if self.quick_test:
                break
        info(f"Epoch {epoch}: val loss {total / max(count, 1):.6f}")
        self.logger_val.add_scalar("loss", total / max(count, 1), self.global_step)
        if last_batch is not None and jax.process_index() == 0:
            self._sample_figure(last_batch)

    def _sample_figure(self, images: np.ndarray) -> None:
        """Ancestral sample grid (reference ddpm_trainer.py:179-216)."""
        num = 2 if self.spatial_dimension == 3 else min(8, images.shape[0])
        sample_shape = (num,) + tuple(self._latent_sample_shape())
        self.rng, key, nkey = jax.random.split(self.rng, 3)
        noise = jax.random.normal(nkey, sample_shape, dtype=jnp.float32)
        # model_fn is a Partial: params ride through jit as traced args
        latents = self._sample_jit(self.sched, self.model_fn, noise, key)
        if self.do_latent_pad:
            from ..utils.padding import unpad_torch_style

            latents = unpad_torch_style(latents, self.latent_pad)
        decode = self.decode_fn
        samples = np.asarray(
            (decode(latents) if decode is not None else latents) / self.b_scale
        )

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, num, figsize=(2 * num, 2))
        axes = np.atleast_1d(axes)
        for i in range(num):
            img = samples[i]
            if self.spatial_dimension == 3:
                img = img[img.shape[0] // 2]  # middle slice
            img = np.clip(img, 0, 1)
            axes[i].imshow(img.squeeze(-1) if img.shape[-1] == 1 else img,
                           cmap="gray" if img.shape[-1] == 1 else None)
            axes[i].axis("off")
        self.logger_val.add_figure("samples", fig, self.global_step)
        plt.close(fig)
