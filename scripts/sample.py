#!/usr/bin/env python
"""Standalone unconditional sample generation from a trained checkpoint.

Framework extension: the reference only renders sample grids as TensorBoard
figures during training (src/trainers/ddpm_trainer.py:179-216); there is no
way to generate from a finished run. This CLI loads a checkpoint (pixel-space
DDPM or latent LDM — the VQ-VAE decode / latent_pad / b_scale handling matches
the trainer's own sampling path) and writes N samples as .npy plus a PNG grid.

Samplers: 'ddpm' (full-T ancestral, the trainer's figure path), or the grid
samplers 'plms' / 'ddim' / 'dpm' at --num_inference_steps (DPM-Solver++(2M)
holds quality at ~4x fewer steps, docs/DESIGN.md).

Usage:
  python scripts/sample.py --output_dir=... --model_name=... --model_type=small
    [--n_samples 16] [--sampler dpm --num_inference_steps 25] [--seed 0]
    [the usual model/schedule flags: --beta_schedule, --image_size, ...]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_name", required=True)
    p.add_argument("--model_type", default="small")
    p.add_argument("--spatial_dimension", type=int, default=2)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--image_roi", default=None)
    p.add_argument("--is_grayscale", type=int, default=0)
    p.add_argument("--prediction_type", default="epsilon")
    p.add_argument("--beta_schedule", default="linear_beta")
    p.add_argument("--beta_start", type=float, default=1e-4)
    p.add_argument("--beta_end", type=float, default=2e-2)
    p.add_argument("--b_scale", type=float, default=1.0)
    p.add_argument("--snr_shift", type=float, default=1)
    p.add_argument("--vqvae_checkpoint", default=None)
    p.add_argument("--latent_pad", default=None)
    p.add_argument("--eval_checkpoint", default=None)
    p.add_argument("--ddpm_checkpoint_epoch", default=None)
    p.add_argument("--use_ema", type=int, default=0)
    p.add_argument("--sampler", default="ddpm",
                   choices=("ddpm", "plms", "ddim", "dpm"))
    p.add_argument("--num_inference_steps", type=int, default=100)
    p.add_argument("--n_samples", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None,
                   help="output directory (default <run_dir>/samples)")
    args = p.parse_args(argv)
    if args.eval_checkpoint and not args.ddpm_checkpoint_epoch:
        args.ddpm_checkpoint_epoch = args.eval_checkpoint
    return args


def main(argv=None) -> None:
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddpm_ood_tpu.trainers.base import BaseTrainer

    trainer = BaseTrainer(args)
    if not trainer.found_checkpoint:
        raise FileNotFoundError(
            f"No checkpoint under {pathlib.Path(args.output_dir) / args.model_name}"
        )

    sched = trainer.sched
    model_fn = trainer.model_fn
    n = int(args.n_samples)
    shape = (n,) + tuple(trainer._latent_sample_shape())
    rng = jax.random.PRNGKey(args.seed)
    rng, nkey, skey = jax.random.split(rng, 3)
    noise = jax.random.normal(nkey, shape, dtype=jnp.float32)

    if args.sampler == "ddpm":
        from ddpm_ood_tpu.diffusion.ddpm import ddpm_sample

        latents = jax.jit(ddpm_sample)(sched, model_fn, noise, skey)
    else:
        from ddpm_ood_tpu.diffusion.ddim import ddim_denoise, ddim_timesteps
        from ddpm_ood_tpu.diffusion.dpm_solver import dpm_denoise, dpm_timesteps
        from ddpm_ood_tpu.diffusion.plms import plms_denoise, pndm_timesteps

        steps = int(args.num_inference_steps)
        make_ts = {"plms": pndm_timesteps, "ddim": ddim_timesteps,
                   "dpm": dpm_timesteps}[args.sampler]
        denoise = {"plms": plms_denoise, "ddim": ddim_denoise,
                   "dpm": dpm_denoise}[args.sampler]
        ts = jnp.asarray(make_ts(sched.num_train_timesteps, steps))
        t_start = jnp.asarray(int(ts[0]))
        latents = jax.jit(denoise, static_argnums=(5,))(
            sched, model_fn, noise, ts, t_start, steps
        )

    if trainer.do_latent_pad:
        from ddpm_ood_tpu.utils.padding import unpad_torch_style

        latents = unpad_torch_style(latents, trainer.latent_pad)
    decode = trainer.decode_fn
    samples = np.asarray(
        (decode(latents) if decode is not None else latents) / trainer.b_scale
    )
    samples = np.clip(samples, 0.0, 1.0)

    out_dir = pathlib.Path(args.out) if args.out else (
        trainer.run_dir / "samples"
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    tag = f"{args.sampler}_{args.num_inference_steps}_seed{args.seed}"
    np.save(out_dir / f"samples_{tag}.npy", samples)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cols = min(8, n)
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(2 * cols, 2 * rows),
                             squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i >= n:
            continue
        img = samples[i]
        if args.spatial_dimension == 3:
            img = img[img.shape[0] // 2]  # middle slice
        ax.imshow(img.squeeze(-1) if img.shape[-1] == 1 else img,
                  cmap="gray" if img.shape[-1] == 1 else None)
    fig.savefig(out_dir / f"samples_{tag}.png", dpi=100, bbox_inches="tight")
    plt.close(fig)
    print(f"Wrote {n} samples to {out_dir}/samples_{tag}.npy (+ .png grid)")


if __name__ == "__main__":
    main()
