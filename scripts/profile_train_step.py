#!/usr/bin/env python
"""Attribute the training-step MFU gap (VERDICT r2 weak #6).

Decomposes the batch-512 reference train step (small 2D UNet, 32x32 — the
config scripts/train_bench.py reports headline numbers for) into separately
timed device programs, each iterated by lax.scan so dispatch overhead is out
of the picture:

    fwd        loss only (noising + UNet forward + MSE)
    fwd+bwd    value_and_grad of the same
    update     the full step (fwd+bwd + Adam apply)

Each phase gets FLOPs from its own compiled executable's cost analysis, so the
MFU per phase is exact for that program. The gap between phases separates
"backward-pass efficiency" from "optimizer/elementwise tail", the two usual
suspects. --trace_dir additionally captures a jax.profiler trace of the full
update for op-level attribution in TensorBoard/XProf.

Usage: python scripts/profile_train_step.py [--batch 512] [--steps 16] [--trace_dir DIR]
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

from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.models.unet import make_unet
from ddpm_ood_tpu.train.ddpm import DDPMTrainStep, make_ddpm_state

V5E_PEAK = 197e12


def _flops(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def _time_scanned(fn, carry, steps: int, n_reps: int = 2) -> float:
    """fn: (carry, i) -> carry; scanned `steps` times on device."""

    def scan_fn(carry):
        def body(c, i):
            return fn(c, i), None

        carry, _ = jax.lax.scan(body, carry, jnp.arange(steps))
        return carry

    jitted = jax.jit(scan_fn)

    def sync(c):
        # Through the axon tunnel, block_until_ready on large outputs can
        # return before remote execution completes; fetching a device-side
        # scalar forces real completion (see DESIGN.md "Measurement gotcha").
        leaf = jax.tree_util.tree_leaves(c)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    carry = jitted(carry)
    sync(carry)  # compile + warm
    best = float("inf")
    for _ in range(n_reps):
        t0 = time.perf_counter()
        carry = jitted(carry)
        sync(carry)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--trace_dir", default=None)
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = "tiny" if args.quick else "small"
    batch = 8 if args.quick else args.batch

    unet = make_unet(model, 2, 1, 1, dtype=dtype)
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    state = make_ddpm_state(unet, jax.random.PRNGKey(0), (32, 32, 1))
    builder = DDPMTrainStep(sched=sched)
    images = jax.random.uniform(jax.random.PRNGKey(1), (batch, 32, 32, 1))
    rng = jax.random.PRNGKey(2)

    def draw(r):
        return builder._draw(r, images)

    def loss_of(params, t, noise):
        # mirror the update's loss: noise, forward, MSE on the epsilon target
        return builder._loss(state, params, images, noise, t)

    # ---- phase: forward only ---------------------------------------------------
    def fwd_phase(carry, i):
        params, r = carry
        r, sub = jax.random.split(r)
        t, noise = draw(sub)
        loss = loss_of(params, t, noise)
        # keep params data-dependent on loss so XLA cannot dead-code the body
        leaf = jax.tree_util.tree_leaves(params)[0]
        return (jax.tree_util.tree_map(lambda p: p + 0.0 * loss, params), r)

    # ---- phase: forward + backward --------------------------------------------
    def bwd_phase(carry, i):
        params, r = carry
        r, sub = jax.random.split(r)
        t, noise = draw(sub)
        _, grads = jax.value_and_grad(loss_of)(params, t, noise)
        return (jax.tree_util.tree_map(lambda p, g: p - 1e-9 * g, params, grads), r)

    # ---- phase: the full production update ------------------------------------
    def update_phase(carry, i):
        st, r = carry
        r, sub = jax.random.split(r)
        t, noise = draw(sub)
        st, _ = builder._update(st, images, noise, t)
        return (st, r)

    results = {}
    fwd_dt = _time_scanned(fwd_phase, (state.params, rng), args.steps)
    bwd_dt = _time_scanned(bwd_phase, (state.params, rng), args.steps)
    upd_dt = _time_scanned(update_phase, (state, rng), args.steps)

    def phase_flops(fn, carry):
        try:
            def one(c):
                return fn(c, 0)

            return _flops(jax.jit(one).lower(carry).compile())
        except Exception:
            return None

    f_fwd = phase_flops(fwd_phase, (state.params, rng))
    f_bwd = phase_flops(bwd_phase, (state.params, rng))
    f_upd = phase_flops(update_phase, (state, rng))

    for name, dt, fl in (
        ("fwd", fwd_dt, f_fwd), ("fwd_bwd", bwd_dt, f_bwd),
        ("update", upd_dt, f_upd),
    ):
        row = {
            "step_ms": round(dt * 1e3, 3),
            "img_per_s": round(batch / dt, 1),
        }
        if fl:
            row["tflops"] = round(fl / 1e12, 3)
            if on_tpu:
                row["mfu"] = round(fl / dt / V5E_PEAK, 4)
        results[name] = row

    results["derived"] = {
        "bwd_minus_fwd_ms": round((bwd_dt - fwd_dt) * 1e3, 3),
        "update_minus_bwd_ms": round((upd_dt - bwd_dt) * 1e3, 3),
        "backend": jax.default_backend(),
        "batch": batch,
        "model": model,
    }
    print(json.dumps(results, indent=1))

    if args.trace_dir:
        scan_update = jax.jit(
            lambda st, r: jax.lax.scan(
                lambda c, i: (update_phase(c, i), None), (st, r),
                jnp.arange(args.steps),
            )[0]
        )
        carry = scan_update(state, rng)
        jax.block_until_ready(carry)
        jax.profiler.start_trace(args.trace_dir)
        carry = scan_update(*carry)
        jax.block_until_ready(carry)
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
