#!/usr/bin/env python
"""Autotune the grouped reconstruction sweep on the attached chip.

Sweeps (num_groups, batch) for a reconstruction workload — default the headline
config (small UNet, 32x32x1, 100-step PLMS, skip 4); `--model big --shape 32 32 3
--skip 8` and `--model small --shape 20 20 16 128 --skip 16` cover the big-model
and 3D-LDM-latent measured baselines — and reports recons/s plus sweep-level MFU
for each config. Rationale: lane grouping trims each group's scan to the timestep
suffix its lanes need; the masked-eval overhead falls from 1.96x (one group)
to 1.09x (8 groups) of the ideal eval count (see docs/DESIGN.md), but smaller
groups shrink the per-step megabatch (K_g * B), so the best point is a
hardware question, not an algebra question — hence this script.

Usage:  python scripts/autotune_sweep.py [--quick]
Emits one JSON line per config and a final "best" line.
"""

from __future__ import annotations

import argparse
import functools
import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from ddpm_ood_tpu.diffusion.plms import pndm_start_points, pndm_timesteps
from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.models.unet import make_unet
from ddpm_ood_tpu.recon.sweep import group_t_starts, plms_sweep

# v5e (TPU v5 lite) peak: 197 TFLOP/s bf16 per chip
PEAK_FLOPS = {"tpu": 197e12}


def flops_per_forward(unet, x, t) -> float:
    """Exact per-call forward FLOPs from XLA's CPU cost model.

    The TPU (axon) executable's cost_analysis is unreliable through the tunnel
    (observed: identical 'flops' across programs with 1.2x different eval
    counts), so lower the same forward on the in-process CPU backend — the HLO
    flop count is backend-independent for this conv/matmul-dominated graph.
    """
    params = unet.init(jax.random.PRNGKey(0), x, t)["params"]
    fn = jax.jit(lambda p, xx, tt: unet.apply({"params": p}, xx, tt), backend="cpu")
    ca = fn.lower(params, jax.device_get(x), jax.device_get(t)).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"]) / x.shape[0]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="tiny CPU smoke mode")
    p.add_argument("--groups", type=int, nargs="*", default=None)
    p.add_argument("--batches", type=int, nargs="*", default=None)
    p.add_argument("--skip", type=int, default=4)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--model", default=None, help="tiny/small/big (default small)")
    p.add_argument(
        "--shape", type=int, nargs="+", default=None,
        help="sample shape *spatial C, e.g. '32 32 3' (2D rgb) or "
        "'20 20 16 128' (3D LDM latent); default 32 32 1",
    )
    p.add_argument("--no-mfu", action="store_true",
                   help="skip the CPU FLOP lowering (slow for big/3D models)")
    args = p.parse_args()

    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    steps = 10 if args.quick else 100
    model = args.model or ("tiny" if args.quick else "small")
    group_list = args.groups or ([2, 3] if args.quick else [3, 4, 6, 8])
    batch_list = args.batches or ([4] if args.quick else [32, 64])
    shape = tuple(args.shape or (32, 32, 1))  # (*spatial, C)
    spatial_dims, channels = len(shape) - 1, shape[-1]

    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    unet = make_unet(model, spatial_dims, channels, channels, dtype=dtype)
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    ts = pndm_timesteps(1000, steps)
    t_starts = pndm_start_points(ts, args.skip)
    K = len(t_starts)

    # per-eval FLOPs measured once at batch 1 (batch-linear for this graph)
    f_per_eval = None
    if not args.no_mfu:
        try:
            f_per_eval = flops_per_forward(
                unet, jnp.zeros((1,) + shape, jnp.float32), jnp.zeros((1,), jnp.int32)
            )
        except Exception:
            pass

    results = []
    for batch in batch_list:
        x = jnp.zeros((batch,) + shape, jnp.float32)
        params = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((batch,), jnp.int32))[
            "params"
        ]
        model_fn = jax.tree_util.Partial(
            lambda p, xx, tt: unet.apply({"params": p}, xx, tt), params
        )
        x0 = jax.random.uniform(jax.random.PRNGKey(1), (batch,) + shape)
        noise = jax.random.normal(jax.random.PRNGKey(2), (K,) + x0.shape)

        for g in group_list:
            t0 = time.perf_counter()
            groups = group_t_starts(ts, t_starts, g)

            def _group(g_ts, g_starts, mf, x0, nz):
                return plms_sweep(sched, mf, x0, nz, g_ts, g_starts, steps)

            compiled, offset, evals = [], 0, 0
            for g_ts, g_starts in groups:
                k = len(g_starts)
                fn = jax.jit(
                    functools.partial(_group, jnp.asarray(g_ts), jnp.asarray(g_starts))
                )
                compiled.append((fn, k, offset))
                evals += len(g_ts) * k * batch  # UNet image-evals this group runs
                offset += k

            def run():
                return [
                    fn(model_fn, x0, noise[off : off + k]) for fn, k, off in compiled
                ]

            jax.block_until_ready(run())  # compile + warm
            compile_s = time.perf_counter() - t0
            flops = (f_per_eval or 0.0) * evals
            t0 = time.perf_counter()
            for _ in range(args.reps):
                jax.block_until_ready(run())
            dt = (time.perf_counter() - t0) / args.reps
            rps = K * batch / dt
            mfu = flops / dt / PEAK_FLOPS.get(backend, float("inf"))
            row = {
                "groups": g,
                "batch": batch,
                "recons_per_sec": round(rps, 2),
                "time_s": round(dt, 4),
                "unet_image_evals": evals,
                "sweep_tflops": round(flops / 1e12, 3),
                "mfu": round(mfu, 4) if (on_tpu and f_per_eval) else None,
                "compile_s": round(compile_s, 1),
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    best = max(results, key=lambda r: r["recons_per_sec"])
    print(
        json.dumps(
            {
                "best": best,
                "backend": backend,
                "skip": args.skip,
                "model": model,
                "shape": list(shape),
            }
        )
    )


if __name__ == "__main__":
    main()
