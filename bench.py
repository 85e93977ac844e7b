#!/usr/bin/env python
"""Headline benchmark: OOD reconstruction throughput (reconstructions/sec/chip).

Workload: the BASELINE.json north-star — FashionMNIST-geometry (32x32 grayscale
after the 28->32 LPIPS pad the pipeline applies; we bench on 32x32 directly),
"small" reference UNet, 100-step PLMS grid, inference_skip_factor 4 (25 start
points per image, reference README.md:114-120).

`vs_baseline` is the measured speedup of the TPU-native batched sweep (one
`lax.scan` carrying all t_start lanes, recon/sweep.py) over the reference's
ALGORITHM on the SAME chip: a faithful sequential per-t_start loop (one PLMS
denoise per start point, reference src/trainers/reconstruct.py:128-157). The
reference repo publishes no GPU throughput numbers (BASELINE.md), so same-chip
algorithmic speedup is the honest denominator; the >10x-vs-GPU target is tracked
separately once a GPU reference number exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
import time


def _probe_backend_or_fall_back_to_cpu(timeout_s: int = 180) -> None:
    """Guard against a wedged TPU tunnel: device init through the axon relay
    can hang indefinitely (observed: jax.devices() blocked >25 min on an
    established-but-silent relay connection). A hang here would leave the
    round without a bench line at all, so probe the backend in a SUBPROCESS
    (a hung C-level init can't be interrupted in-process) and force the CPU
    platform if it doesn't come up in time."""
    if os.environ.get("BENCH_SKIP_PROBE"):
        return
    try:
        rc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        ).returncode
    except subprocess.TimeoutExpired:
        rc = -1
    if rc != 0:
        print(
            f"bench.py: backend probe failed (rc={rc}); falling back to CPU",
            file=sys.stderr,
        )
        import jax

        jax.config.update("jax_platforms", "cpu")


_probe_backend_or_fall_back_to_cpu()

import jax
import jax.numpy as jnp
import numpy as np

from ddpm_ood_tpu.diffusion.plms import plms_denoise, pndm_start_points, pndm_timesteps
from ddpm_ood_tpu.diffusion.schedules import add_noise, make_schedule
from ddpm_ood_tpu.models.unet import make_unet
from ddpm_ood_tpu.recon.sweep import group_t_starts, plms_sweep

import os

QUICK = bool(int(os.environ.get("BENCH_QUICK", "0")))  # CPU smoke mode
# measured on chip: the sweep is compute-bound inside the scan (254 recons/s at
# batch 32 vs 241 at 128 — per-call RPC overhead only affects un-scanned code),
# so a moderate batch suffices
BATCH = 4 if QUICK else int(os.environ.get("BENCH_BATCH", "32"))
IMAGE = 32
STEPS = 10 if QUICK else 100
SKIP = 4
MODEL = "tiny" if QUICK else "small"
SEQ_SUBSET = 2 if QUICK else 4  # sequential baseline timed on a lane subset


def _group_sweep(sched, g_ts, g_starts, steps, model_fn, x0, noise):
    # model_fn arrives as a jax.tree_util.Partial: weights are traced args, not
    # HLO constants (remote compile services cap request size)
    return plms_sweep(sched, model_fn, x0, noise, g_ts, g_starts, steps)


def main() -> None:
    # persistent compile cache: tunnel compiles run minutes; repeat bench runs
    # (and the driver's round-end run after this one) hit the disk cache instead
    import pathlib

    cache_dir = pathlib.Path(__file__).parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    unet = make_unet(MODEL, 2, 1, 1, dtype=dtype)
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((BATCH, IMAGE, IMAGE, 1), dtype=jnp.float32)
    params = unet.init(rng, x, jnp.zeros((BATCH,), jnp.int32))["params"]

    def _apply(p, xx, tt):
        return unet.apply({"params": p}, xx, tt)

    model_fn = jax.tree_util.Partial(_apply, params)

    ts = pndm_timesteps(1000, STEPS)
    t_starts = pndm_start_points(ts, SKIP)
    K = len(t_starts)
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, IMAGE, IMAGE, 1))
    noise = jax.random.normal(jax.random.PRNGKey(2), (K,) + x0.shape)

    # ---- batched sweep (this framework; grouped like the production path) --------
    # 16 lane groups: autotuned on chip (scripts/autotune_sweep.py) — masked-eval
    # overhead falls from 1.29x (3 groups) to 1.05x of ideal; measured on v5e:
    # G=3 256, G=8 351, G=12 371, G=16 375, G=25 377 recons/s (DESIGN.md)
    groups = group_t_starts(ts, t_starts, int(os.environ.get("BENCH_GROUPS", "16")))
    compiled = []
    offset = 0
    for g_ts, g_starts in groups:
        fn = jax.jit(
            functools.partial(
                _group_sweep, sched,
                jnp.asarray(g_ts), jnp.asarray(g_starts), STEPS,
            )
        )
        compiled.append((fn, len(g_starts), offset))
        offset += len(g_starts)

    def batched(x0, noise):
        outs = []
        for fn, k, off in compiled:
            outs.append(fn(model_fn, x0, noise[off:off + k]))
        return outs

    # sync on a device-side scalar fetched to host: block_until_ready alone can
    # return early for idle-queue single programs through the axon tunnel
    # (DESIGN.md "Measurement gotcha"); cross-checked on chip — 373.5 (block)
    # vs 374.0 (scalar-fetch) recons/s, so this is belt-and-braces here
    _reduce = jax.jit(
        lambda outs: sum(
            jnp.sum(leaf.astype(jnp.float32))
            for o in outs
            for leaf in jax.tree_util.tree_leaves(o)
        )
    )

    float(_reduce(batched(x0, noise)))  # compile
    t0 = time.perf_counter()
    reps = 3 if on_tpu else 1
    for _ in range(reps):
        float(_reduce(batched(x0, noise)))
    batched_time = (time.perf_counter() - t0) / reps
    recons_per_sec = K * BATCH / batched_time

    # ---- sequential per-t_start loop (reference algorithm, same chip) ------------
    @jax.jit
    def one_lane(mf, x_start, t_start):
        return plms_denoise(
            sched, mf, x_start, jnp.asarray(ts), t_start, STEPS
        )

    _reduce1 = jax.jit(lambda r: jnp.sum(r.astype(jnp.float32)))
    subset = t_starts[:: max(1, K // SEQ_SUBSET)][:SEQ_SUBSET]
    # compile once on the first lane (scalar-fetch sync, as above)
    xs = add_noise(sched, x0, noise[0], jnp.asarray(int(subset[0])))
    float(_reduce1(one_lane(model_fn, xs, jnp.asarray(int(subset[0])))))
    t0 = time.perf_counter()
    for i, t_start in enumerate(subset):
        xs = add_noise(sched, x0, noise[i], jnp.asarray(int(t_start)))
        float(_reduce1(one_lane(model_fn, xs, jnp.asarray(int(t_start)))))
    seq_time_subset = time.perf_counter() - t0
    seq_time_full = seq_time_subset * (K / len(subset))
    seq_recons_per_sec = K * BATCH / seq_time_full

    # ---- product fast path: dpm@25/1 + int8 (BASELINE.md fastest config) --------
    # regression-tracked alongside the reference-parity headline (VERDICT r4
    # #8): the recommended serving configuration is DPM-Solver++(2M) at 25
    # steps / skip 1 with int8 PTQ convs — ~3.9x the PLMS headline on chip.
    from ddpm_ood_tpu.recon.sweep import ReconProgram

    fp_steps = 10 if QUICK else 25
    unet_q = make_unet(MODEL, 2, 1, 1, dtype=dtype, quant="int8")
    # the quantized UNet shares the f32 param pytree (ops/quant.py)
    model_fn_q = jax.tree_util.Partial(
        lambda p, xx, tt: unet_q.apply({"params": p}, xx, tt), params
    )
    prog = ReconProgram(
        sched=sched, model_fn=model_fn_q, num_inference_steps=fp_steps,
        inference_skip_factor=1, sampler="dpm",
        num_groups=2 if QUICK else int(os.environ.get("BENCH_GROUPS", "16")),
    )
    k_fp = len(prog.t_starts)

    def run_fp(key):
        out = prog(x0, key)
        return float(np.asarray(out[1]).sum())  # host fetch forces completion

    run_fp(jax.random.PRNGKey(0))  # compile + warm
    t0 = time.perf_counter()
    for i in range(reps):
        run_fp(jax.random.PRNGKey(i))
    fast_recons_per_sec = k_fp * BATCH / ((time.perf_counter() - t0) / reps)

    print(
        json.dumps(
            {
                "metric": "fast_path_reconstructions_per_sec_per_chip",
                "value": round(fast_recons_per_sec, 2),
                "unit": f"recons/s (batch {BATCH}, dpm@{fp_steps}/1 + int8, "
                f"{jax.default_backend()})",
                "vs_baseline": round(fast_recons_per_sec / seq_recons_per_sec, 3),
            }
        )
    )
    # headline LAST: the driver parses the final JSON line; the fast-path
    # number also rides along as fields here so one parsed object carries both
    print(
        json.dumps(
            {
                "metric": "reconstructions_per_sec_per_chip",
                "value": round(recons_per_sec, 2),
                "unit": f"recons/s (batch {BATCH}, {STEPS}-step PLMS, skip {SKIP}, "
                f"{jax.default_backend()})",
                "vs_baseline": round(recons_per_sec / seq_recons_per_sec, 3),
                "fast_path": f"dpm@{fp_steps}/1+int8",
                "fast_path_value": round(fast_recons_per_sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
