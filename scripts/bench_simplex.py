#!/usr/bin/env python
"""Simplex-noise scoring throughput (VERDICT r4 #4): gaussian vs
--simplex_noise=1 at the headline sweep config.

The reference supports simplex noise at reconstruction time
(src/trainers/reconstruct.py:133-147) generated on the host (numba CPU
kernels); here the exact path is the C++/OpenMP OpenSimplex kernel
(csrc/opensimplex.cpp) whose (K, B, *latent) planes must cross H2D once per
batch. This bench isolates that cost: same ReconProgram geometry, one run with
device-side gaussian noise (PRNG inside the compiled program) and one with the
host noise path, plus the raw host-generation time — so the H2D/overlap share
is attributable.

Usage: python scripts/bench_simplex.py [--batch 32] [--steps 100] [--skip 4]
       [--groups 16] [--quick]
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
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--skip", type=int, default=4)
    p.add_argument("--model", default=None)
    p.add_argument("--no_overlap", action="store_true",
                   help="disable the host-noise double-buffering (measures "
                   "the synchronous baseline)")
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ddpm_ood_tpu.diffusion.schedules import make_schedule
    from ddpm_ood_tpu.models.unet import make_unet
    from ddpm_ood_tpu.noise.simplex import Simplex, generate_simplex_noise
    from ddpm_ood_tpu.recon.sweep import ReconProgram

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    batch = 4 if args.quick else args.batch
    steps = 10 if args.quick else args.steps
    skip = 3 if args.quick else args.skip
    model = args.model or ("tiny" if args.quick else "small")
    shape = (32, 32, 1)

    unet = make_unet(model, 2, 1, 1, dtype=dtype)
    params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + shape), jnp.zeros((1,), jnp.int32)
    )["params"]
    model_fn = jax.tree_util.Partial(
        lambda p_, x, t: unet.apply({"params": p_}, x, t), params
    )
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    images = jnp.asarray(
        np.random.default_rng(1).uniform(size=(batch,) + shape).astype(np.float32)
    )
    groups = 2 if args.quick else args.groups

    simplex = Simplex()

    def host_noise(noise_shape, t_starts):
        K, B = int(noise_shape[0]), int(noise_shape[1])
        out = np.empty(noise_shape, dtype=np.float32)
        for k, t in enumerate(np.asarray(t_starts)):
            out[k] = generate_simplex_noise(
                simplex, noise_shape[1:], np.full((B,), int(t), dtype=np.int64)
            )
        return out

    def bench(tag, **prog_kw):
        prog = ReconProgram(
            sched=sched, model_fn=model_fn, num_inference_steps=steps,
            inference_skip_factor=skip, sampler="plms", num_groups=groups,
            **prog_kw,
        )
        K = len(prog.t_starts)

        def run(key):
            out = prog(images, key)
            return float(np.asarray(out[1]).sum())

        prog.warmup(images)  # concurrent group compiles (tunnel round trips)
        run(jax.random.PRNGKey(0))  # warm dispatch
        n = 1 if args.quick else 5
        t0 = time.perf_counter()
        for i in range(n):
            run(jax.random.PRNGKey(i))
        dt = (time.perf_counter() - t0) / n
        return {"recons_per_s": round(K * batch / dt, 1),
                "batch_s": round(dt, 3), "lanes": K}

    gauss = bench("gaussian")
    simplex_res = bench(
        "simplex", host_noise_fn=host_noise, latent_sample_shape=shape,
        overlap_host_noise=not args.no_overlap,
    )

    # raw host generation cost for one batch's (K, B, 32, 32, 1) planes
    K = simplex_res["lanes"]
    from ddpm_ood_tpu.diffusion.plms import pndm_start_points, pndm_timesteps

    t_starts = pndm_start_points(pndm_timesteps(1000, steps), skip)
    t0 = time.perf_counter()
    host_noise((K, batch) + shape, t_starts)
    gen_s = time.perf_counter() - t0

    print(json.dumps({
        "bench": "simplex_scoring",
        "backend": jax.default_backend(),
        "batch": batch, "steps": steps, "skip": skip, "groups": groups,
        "overlap": not args.no_overlap,
        "gaussian": gauss,
        "simplex": simplex_res,
        "host_noise_gen_s_per_batch": round(gen_s, 3),
        "simplex_cost_pct": round(
            100 * (1 - simplex_res["recons_per_s"] / gauss["recons_per_s"]), 1
        ),
    }))


if __name__ == "__main__":
    main()
