#!/usr/bin/env python
"""Sampler-extension sweep benchmark (diffusion/{ddim,dpm_solver}.py).

Same headline geometry as bench.py (small UNet, 32x32 grayscale, batch 32) with
a selectable sampler and grid, through the production ReconProgram (grouped
lanes + metrics tail). DDIM does one UNet eval per step with no history;
DPM-Solver++(2M) is second order, so `--sampler dpm --steps 25 --skip 1` holds
the 25-start-point sweep shape while cutting UNet evals ~4x.

Usage: python scripts/bench_ddim.py [--sampler ddim|dpm|plms] [--steps N]
       [--skip N] [--batch 32] [--quick]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--groups", type=int, default=16)
    p.add_argument("--sampler", default="ddim", choices=("plms", "ddim", "dpm"))
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--skip", type=int, default=4)
    p.add_argument("--shape", type=int, nargs="+", default=None,
                   help="sample shape *spatial C (default 32 32 1; e.g. "
                   "'20 20 16 128' for the 3D LDM latent)")
    p.add_argument("--model", default=None, help="tiny/small/big")
    p.add_argument("--elbo", action="store_true",
                   help="score_elbo=True: measures the likelihood-term overhead")
    p.add_argument("--quantize", default="none", choices=("none", "int8", "w8", "mixed"),
                   help="int8 PTQ of the UNet block convs (ops/quant.py): "
                   "2x MXU peak on v5e for the conv-bound sweep")
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ddpm_ood_tpu.diffusion.schedules import make_schedule
    from ddpm_ood_tpu.models.unet import make_unet
    from ddpm_ood_tpu.recon.sweep import ReconProgram

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    batch = 4 if args.quick else args.batch
    steps = 10 if args.quick else args.steps
    skip = 3 if args.quick else args.skip
    model = args.model or ("tiny" if args.quick else "small")
    shape = tuple(args.shape or (32, 32, 1))  # (*spatial, C)
    spatial_dims, channels = len(shape) - 1, shape[-1]

    unet = make_unet(
        model, spatial_dims, channels, channels, dtype=dtype,
        quant=None if args.quantize == "none" else args.quantize,
    )
    params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + shape),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    model_fn = jax.tree_util.Partial(
        lambda p_, x, t: unet.apply({"params": p_}, x, t), params
    )
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    prog = ReconProgram(
        sched=sched, model_fn=model_fn, num_inference_steps=steps,
        inference_skip_factor=skip, sampler=args.sampler,
        num_groups=2 if args.quick else args.groups,
        score_elbo=bool(args.elbo),
    )
    K = len(prog.t_starts)
    images = jnp.asarray(
        np.random.default_rng(1).uniform(size=(batch,) + shape)
        .astype(np.float32)
    )

    # ReconProgram's metrics come back as (K, B) scalars — fetching them to
    # host forces real completion (DESIGN.md "Measurement gotcha")
    def run(key):
        out = prog(images, key)
        return float(np.asarray(out[1]).sum()) + (
            float(np.asarray(out[3]).sum()) if args.elbo else 0.0
        )

    run(jax.random.PRNGKey(0))  # compile + warm
    n = 1 if args.quick else 3
    t0 = time.perf_counter()
    for i in range(n):
        run(jax.random.PRNGKey(i))
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "bench": f"{args.sampler}_sweep"
        + ("+elbo" if args.elbo else "")
        + (f"+{args.quantize}" if args.quantize != "none" else ""),
        "steps": steps,
        "skip": skip,
        "backend": jax.default_backend(),
        "batch": batch,
        "shape": list(shape),
        "lanes": K,
        "groups": args.groups,
        "recons_per_s": round(K * batch / dt, 1),
        "sweep_s": round(dt, 3),
    }))


if __name__ == "__main__":
    main()
