#!/usr/bin/env python
"""Production-scale 3D benchmark: the heaviest memory workloads in the system.

Drives, on the real chip, the two train steps of the reference's 3D medical
pipeline (reference README.md:141-190 — the Decathlon BrainTumour recipe):

  1. VQVAE stage (PIXEL SPACE): 3D VQ-VAE + PatchGAN at the reference's exact
     config — num_channels [256,256,256,256], 3 res layers, embedding 128/2048,
     volumes 128^3 (image_roi [160,160,128] resized to image_size 128), batch 8
     — the full generator step (L1 + quantization + fake-3d LPIPS + jukebox +
     LSGAN) and discriminator step, with/without --remat.
  2. LDM stage (LATENT): small 3D UNet train step on the 16x-downsampled
     (8,8,8,128) latents, batch 6.

Reports per step: img/s (dispatched), step ms, HBM peak/in-use from
device.memory_stats(), and MFU from the TPU executable's own cost analysis.

Usage: python scripts/bench_3d_pixel.py [--batch 8] [--size 128] [--remat {0,1,both}] [--quick]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from ddpm_ood_tpu.losses.lpips import PerceptualLoss
from ddpm_ood_tpu.models.discriminator import PatchDiscriminator
from ddpm_ood_tpu.models.vqvae import VQVAE
from ddpm_ood_tpu.train.vqvae import VQVAETrainSteps, make_vqvae_states

V5E_PEAK = 197e12


def _mem(device) -> dict:
    try:
        stats = device.memory_stats()
        return {
            "hbm_in_use_gib": round(stats.get("bytes_in_use", 0) / 2**30, 2),
            "hbm_peak_gib": round(stats.get("peak_bytes_in_use", 0) / 2**30, 2),
            "hbm_limit_gib": round(stats.get("bytes_limit", 0) / 2**30, 2),
        }
    except Exception:
        return {}


def _static_mem(compiled) -> dict:
    """XLA's static buffer assignment for the compiled program — the reliable
    HBM accounting here (the tunnel's device.memory_stats() returns None and
    device_memory_profile() crashes the plugin): arguments (params/optimizer/
    batch) + outputs + temp (activation/workspace high-water mark)."""
    try:
        ma = compiled.memory_analysis()
        total = (
            ma.argument_size_in_bytes
            + ma.output_size_in_bytes
            + ma.temp_size_in_bytes
            + ma.generated_code_size_in_bytes
            - ma.alias_size_in_bytes
        )
        return {
            "hbm_args_gib": round(ma.argument_size_in_bytes / 2**30, 2),
            "hbm_temp_gib": round(ma.temp_size_in_bytes / 2**30, 2),
            "hbm_total_static_gib": round(total / 2**30, 2),
        }
    except Exception:
        return {}


def _flops(compiled, fallback=None):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return fallback


def bench_vqvae(args, remat: bool) -> dict:
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    size = 16 if args.quick else args.size
    batch = 2 if args.quick else args.batch
    chans = (32,) * 2 if args.quick else (256, 256, 256, 256)
    n_levels = len(chans)
    vq = VQVAE(
        spatial_dims=3,
        in_channels=1,
        out_channels=1,
        num_res_layers=3,
        downsample_parameters=((2, 4, 1, 1),) * n_levels,
        upsample_parameters=((2, 4, 1, 1, 0),) * n_levels,
        num_channels=chans,
        num_res_channels=chans,
        num_embeddings=2048,
        embedding_dim=128,
        decay=0.9,
        dtype=dtype,
        remat=remat,
    )
    disc = PatchDiscriminator(
        spatial_dims=3, num_layers_d=3, num_channels=64, in_channels=1,
        out_channels=1, dtype=dtype,
    )
    sample = (size, size, size, 1)
    g_state, d_state = make_vqvae_states(
        vq, disc, jax.random.PRNGKey(0), sample, vqvae_lr=3e-5
    )
    perceptual = PerceptualLoss(dimensions=3, is_fake_3d=True, lpips_normalize=True)
    steps = VQVAETrainSteps(
        spatial_dims=3, perceptual_weight=0.001, perceptual_fn=perceptual,
        grad_accum=args.grad_accum, quant_decay=0.9,
    )
    # the EXACT jitted programs the trainer drives (train/vqvae.py — already
    # jitted with state donation): G(g_state, d_state, images, adv_w) and
    # D(d_state, recon, images, adv_w)
    g_step = steps.make_generator_step()
    d_step = steps.make_discriminator_step()

    images = jax.random.uniform(
        jax.random.PRNGKey(1), (batch,) + sample, dtype=jnp.float32
    )
    adv_w = jnp.float32(0.01)

    g_compiled = g_step.lower(g_state, d_state, images, adv_w).compile()
    g_flops = _flops(g_compiled)
    g_mem = _static_mem(g_compiled)
    g_state, metrics = g_step(g_state, d_state, images, adv_w)
    jax.block_until_ready(metrics["generator_loss"])
    n = 2 if args.quick else 6
    t0 = time.perf_counter()
    for _ in range(n):
        g_state, metrics = g_step(g_state, d_state, images, adv_w)
    jax.block_until_ready(metrics["generator_loss"])
    g_dt = (time.perf_counter() - t0) / n
    mem_g = _mem(jax.local_devices()[0])

    recon = metrics["recon"]
    d_flops = _flops(d_step.lower(d_state, recon, images, adv_w).compile())
    d_state, d_loss = d_step(d_state, recon, images, adv_w)
    jax.block_until_ready(d_loss)
    t0 = time.perf_counter()
    for _ in range(n):
        d_state, d_loss = d_step(d_state, recon, images, adv_w)
    jax.block_until_ready(d_loss)
    d_dt = (time.perf_counter() - t0) / n

    out = {
        "bench": "vqvae_3d_pixel",
        "volume": size,
        "batch": batch,
        "remat": remat,
        "grad_accum": args.grad_accum,
        "backend": jax.default_backend(),
        "g_step_ms": round(g_dt * 1e3, 1),
        "d_step_ms": round(d_dt * 1e3, 1),
        "img_per_s_g_plus_d": round(batch / (g_dt + d_dt), 2),
        **mem_g,
        **{f"g_{k}": v for k, v in g_mem.items()},
    }
    if g_flops and jax.default_backend() == "tpu":
        out["g_mfu"] = round(g_flops / g_dt / V5E_PEAK, 4)
        out["g_tflop_per_step"] = round(g_flops / 1e12, 2)
    if d_flops and jax.default_backend() == "tpu":
        out["d_mfu"] = round(d_flops / d_dt / V5E_PEAK, 4)
    return out


def bench_ldm_latent(args) -> dict:
    from ddpm_ood_tpu.diffusion.schedules import make_schedule
    from ddpm_ood_tpu.models.unet import make_unet
    from ddpm_ood_tpu.train.ddpm import DDPMTrainStep, make_ddpm_state

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    latent = (4, 4, 4, 8) if args.quick else (8, 8, 8, 128)
    batch = 2 if args.quick else 6
    model = "tiny" if args.quick else "small"
    unet = make_unet(model, 3, latent[-1], latent[-1], dtype=dtype)
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    state = make_ddpm_state(unet, jax.random.PRNGKey(0), latent)
    step = DDPMTrainStep(sched=sched).make_train_step()
    images = jax.random.uniform(jax.random.PRNGKey(1), (batch,) + latent)
    rng = jax.random.PRNGKey(2)
    mem = _static_mem(step.lower(state, images, rng).compile())
    state, loss = step(state, images, rng)
    jax.block_until_ready(loss)
    n = 4 if args.quick else 16
    t0 = time.perf_counter()
    for i in range(n):
        state, loss = step(state, images, jax.random.fold_in(rng, i))
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / n
    return {
        "bench": "ldm_3d_latent_train",
        "latent": list(latent),
        "batch": batch,
        "backend": jax.default_backend(),
        "step_ms": round(dt * 1e3, 1),
        "img_per_s": round(batch / dt, 1),
        **_mem(jax.local_devices()[0]),
        **mem,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--remat", default="both", choices=("0", "1", "both"))
    p.add_argument(
        "--grad_accum", type=int, default=1,
        help="Accumulate G grads over this many microbatches (exact; "
        "train/vqvae.py) — e.g. --batch 8 --grad_accum 4 runs the reference's "
        "global batch 8 on ONE chip at microbatch-2 activation footprint.",
    )
    p.add_argument("--quick", action="store_true")
    p.add_argument("--skip_ldm", action="store_true")
    args = p.parse_args()

    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    remats = {"0": [False], "1": [True], "both": [True, False]}[args.remat]
    for remat in remats:
        try:
            print(json.dumps(bench_vqvae(args, remat)), flush=True)
        except Exception as e:
            print(json.dumps({
                "bench": "vqvae_3d_pixel", "remat": remat,
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }), flush=True)
    if not args.skip_ldm:
        print(json.dumps(bench_ldm_latent(args)), flush=True)


if __name__ == "__main__":
    main()
