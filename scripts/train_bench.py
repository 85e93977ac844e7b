#!/usr/bin/env python
"""Training-step throughput for the production DDPM train step.

Times `DDPMTrainStep.make_train_step()` (the exact jitted program the trainer
drives: noising + UNet fwd/bwd + Adam update in one XLA program) at the
reference's 2D config — small UNet, 32x32 grayscale, batch 512
(reference train_ddpm.py:84-85). Reports two numbers:

  - dispatched: one host->device call per step, as the real input pipeline
    drives it. Through the axon tunnel each call carries ~28 ms RPC overhead
    that a directly-attached TPU would not pay.
  - scanned: the same step body iterated by lax.scan on device (noise drawn
    per-iteration from a split rng, fixed data). No dispatch in the loop —
    the compute-bound ceiling, and the honest MFU denominator.

MFU uses fwd+bwd+update FLOPs from the XLA CPU cost model of the actual
update program (not the 3x-forward rule of thumb).

Usage: python scripts/train_bench.py [--batch 512] [--steps 16] [--quick]
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


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="measure the train step with the weight-EMA update on")
    args = p.parse_args()

    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    model = "tiny" if args.quick else "small"
    batch = 8 if args.quick else args.batch
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    unet = make_unet(model, 2, 1, 1, dtype=dtype)
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    state = make_ddpm_state(
        unet, jax.random.PRNGKey(0), (32, 32, 1), with_ema=args.ema_decay > 0
    )
    builder = DDPMTrainStep(sched=sched, ema_decay=args.ema_decay)
    train_step = builder.make_train_step()

    images = jax.random.uniform(jax.random.PRNGKey(1), (batch, 32, 32, 1))
    rng = jax.random.PRNGKey(2)

    # FLOPs of the full update program from the CPU cost model (donation off
    # for lowering-only; flop count is backend-independent)
    flops_per_step = None
    try:
        def _one_step(s, im, r):
            t, noise = builder._draw(r, im)
            return builder._update(s, im, noise, t)

        cpu_step = jax.jit(_one_step, backend="cpu")
        small = 2  # flops scale linearly in batch for this graph
        im2 = jax.device_get(images[:small])
        ca = cpu_step.lower(jax.device_get(state), im2, rng).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_step = float(ca["flops"]) / small * batch
    except Exception:
        pass

    # --- dispatched path (one call per step, like the real input loop) -------
    state1, loss = train_step(state, images, rng)
    jax.block_until_ready(loss)  # compile + warm
    t0 = time.perf_counter()
    s = state1
    for i in range(args.steps):
        s, loss = train_step(s, images, jax.random.fold_in(rng, i))
    jax.block_until_ready(loss)
    dispatched_dt = (time.perf_counter() - t0) / args.steps

    # --- scanned path (device-side loop; compute ceiling) ---------------------
    def scan_steps(state, images, rng):
        def body(carry, i):
            st, rk = carry
            rk, sub = jax.random.split(rk)
            t, noise = builder._draw(sub, images)
            st, loss = builder._update(st, images, noise, t)
            return (st, rk), loss

        (state, _), losses = jax.lax.scan(
            body, (state, rng), jnp.arange(args.steps)
        )
        return state, losses

    # NB: train_step donates its state arg, so only the freshest returned
    # state (s) is alive here — state/state1 were consumed by earlier calls
    scan_fn = jax.jit(scan_steps, donate_argnums=(0,))
    s2, losses = scan_fn(s, images, rng)
    jax.block_until_ready(losses)  # compile + warm
    s2, losses = scan_fn(s2, images, jax.random.PRNGKey(3))
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    s2, losses = scan_fn(s2, images, jax.random.PRNGKey(4))
    jax.block_until_ready(losses)
    scanned_dt = (time.perf_counter() - t0) / args.steps

    out = {
        "model": model,
        "batch": batch,
        "backend": backend,
        "dispatched_img_per_s": round(batch / dispatched_dt, 1),
        "scanned_img_per_s": round(batch / scanned_dt, 1),
        "step_ms_dispatched": round(dispatched_dt * 1e3, 2),
        "step_ms_scanned": round(scanned_dt * 1e3, 2),
    }
    if flops_per_step:
        out["train_gflop_per_img"] = round(flops_per_step / batch / 1e9, 2)
        if on_tpu:
            out["mfu_scanned"] = round(flops_per_step / scanned_dt / V5E_PEAK, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
