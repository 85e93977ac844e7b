#!/usr/bin/env python
"""Benchmark the reference-exact PLMS parity path (`--sampler=plms_ref`).

The carried-history sweep (diffusion/plms.py:plms_reference_exact_sweep —
reference src/trainers/reconstruct.py:98,128-157 semantics: one PNDMScheduler
per batch, ets/counter leaking across t_starts) is one `lax.scan` over a
host-precomputed step table. This measures it at the headline config (small
UNet, 32x32 grayscale, 100-step PLMS, skip 4 = 25 start points, batch 32) so
BASELINE.md can state how close the parity path runs to the fresh-history
production sweep (round-2 VERDICT asked for within ~2x).

Usage: python scripts/bench_plms_ref.py [--batch 32] [--quick]
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

from ddpm_ood_tpu.diffusion.plms import (
    plms_reference_exact_sweep,
    pndm_start_points,
    pndm_timesteps,
)
from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.models.unet import make_unet


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    batch = 4 if args.quick else args.batch
    steps = 10 if args.quick else 100
    skip = 3 if args.quick else 4
    model = "tiny" if args.quick else "small"

    unet = make_unet(model, 2, 1, 1, dtype=dtype)
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), jnp.zeros((1,), jnp.int32)
    )["params"]
    model_fn = jax.tree_util.Partial(
        lambda p_, x, t: unet.apply({"params": p_}, x, t), params
    )

    ts = pndm_timesteps(1000, steps)
    t_starts = pndm_start_points(ts, skip)
    K = len(t_starts)
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (batch, 32, 32, 1))
    noise = jax.random.normal(jax.random.PRNGKey(2), (K,) + x0.shape)

    # sync on a device-side scalar fetched to host: block_until_ready on a
    # LARGE single-program output can return early through the axon tunnel
    # (DESIGN.md "Measurement gotcha")
    reduce = jax.jit(lambda r: jnp.sum(r.astype(jnp.float32)))

    recons = plms_reference_exact_sweep(sched, model_fn, x0, noise, ts, t_starts, steps)
    float(reduce(recons))
    n = 1 if args.quick else 3
    t0 = time.perf_counter()
    for _ in range(n):
        recons = plms_reference_exact_sweep(
            sched, model_fn, x0, noise, ts, t_starts, steps
        )
        float(reduce(recons))
    dt = (time.perf_counter() - t0) / n
    print(
        json.dumps(
            {
                "bench": "plms_ref_sweep",
                "backend": jax.default_backend(),
                "batch": batch,
                "lanes": K,
                "recons_per_s": round(K * batch / dt, 1),
                "sweep_s": round(dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
