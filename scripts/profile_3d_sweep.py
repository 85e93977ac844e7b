#!/usr/bin/env python
"""Attribute the 3D LDM sweep's MFU gap (VERDICT r3 item 4).

The 3D latent reconstruction sweep (small 3D UNet on (20,20,16,128) BraTS-ROI/8
latents, 100-step PLMS skip 16, batch 8, G=3) measures 64% MFU vs the 2D
sweep's 73% (BASELINE.md). Same method as the train-step attribution
(scripts/profile_train_step.py, DESIGN.md): decompose into separately timed
scanned device programs, each with FLOPs from its own compiled executable, so
per-phase MFU is exact for that program:

    fwd          bare 3D UNet forward at the sweep's mega-batch
    fwd_noattn   the same with attention_levels all-False (attention share)
    fwd_2d       the 2D small UNet at ITS sweep mega-batch (the 73% anchor)
    plms_tail    one PLMS x-update with a free model (sweep scaffolding share)

Usage: python scripts/profile_3d_sweep.py [--steps 8] [--trace_dir DIR]
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

from ddpm_ood_tpu.models.unet import DiffusionModelUNet  # noqa: E402

V5E_PEAK = 197e12


def _flops(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def _time_scanned(fn, carry, steps: int, n_reps: int = 2):
    """Returns (seconds_per_step, flops_per_step_or_None)."""

    def scan_fn(carry):
        def body(c, i):
            return fn(c, i), None

        carry, _ = jax.lax.scan(body, carry, jnp.arange(steps))
        return carry

    jitted = jax.jit(scan_fn)
    lowered = jitted.lower(carry).compile()
    total_flops = _flops(lowered)

    def sync(c):
        leaf = jax.tree_util.tree_leaves(c)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    carry = jitted(carry)
    sync(carry)  # warm
    best = float("inf")
    for _ in range(n_reps):
        t0 = time.perf_counter()
        carry = jitted(carry)
        sync(carry)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best, (total_flops / steps if total_flops else None)


def _unet_phase(shape, mega_batch, attention, steps, dtype, spatial_dims):
    unet = DiffusionModelUNet(
        spatial_dims=spatial_dims, in_channels=shape[-1], out_channels=shape[-1],
        num_channels=(128, 256, 256), attention_levels=attention,
        num_res_blocks=1, num_head_channels=256, dtype=dtype,
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(mega_batch,) + shape)
        .astype(np.float32)
    ).astype(dtype)
    params = unet.init(
        jax.random.PRNGKey(0), x[:1], jnp.zeros((1,), jnp.int32)
    )["params"]
    t = jnp.full((mega_batch,), 500, jnp.int32)

    def fn(c, i):
        return unet.apply({"params": params}, c, t).astype(c.dtype)

    return _time_scanned(fn, x, steps)


def main() -> None:
    p = argparse.ArgumentParser()
    # 32+ scan steps so the ~28 ms tunnel dispatch amortizes below 1 ms/step
    # (DESIGN.md "Per-call dispatch overhead")
    p.add_argument("--steps", type=int, default=48)
    p.add_argument("--mega3d", type=int, default=24,
                   help="3D mega-batch (production: G=3 over K=7 x batch 8 -> 24)")
    p.add_argument("--mega2d", type=int, default=64,
                   help="2D mega-batch (headline: G=16 over K=25 x batch 32 -> 64)")
    p.add_argument("--quick", action="store_true",
                   help="tiny shapes/batches — smoke only, numbers meaningless")
    p.add_argument("--dtype", default=None, choices=(None, "bfloat16", "float32"),
                   help="override the compute dtype (default: bf16 on TPU, f32 "
                   "elsewhere) — lets CPU smoke tests cover the bf16 carry "
                   "paths the TPU run exercises")
    p.add_argument("--trace_dir", default=None,
                   help="also capture a jax.profiler device trace of the 3D fwd")
    args = p.parse_args()

    cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))

    on_tpu = jax.default_backend() == "tpu"
    dtype = (
        jnp.dtype(args.dtype) if args.dtype
        else (jnp.bfloat16 if on_tpu else jnp.float32)
    )
    # 3D sweep mega-batch: G=3 over K=7 lanes x batch 8 -> largest program 24
    shape3d = (20, 20, 16, 128)
    mb3d = args.mega3d
    # 2D headline sweep: G=16 over K=25 lanes x batch 32 -> 2 lanes/group = 64
    shape2d = (32, 32, 1)
    mb2d = args.mega2d
    if args.quick:
        shape3d, mb3d = (8, 8, 8, 16), 2
        shape2d, mb2d = (16, 16, 1), 2

    # NOTE on FLOPs: the TPU executable's cost_analysis through the tunnel is
    # unreliable (BASELINE.md); the "tflop" fields are advisory. The load-
    # bearing outputs are the per-image-eval milliseconds — compared against
    # the REAL sweep's per-eval time (sweep_s x groups / image-evals from
    # bench_ddim), which shares their units by construction.
    results = {}
    t3, f3 = _unet_phase(shape3d, mb3d, (False, False, True), args.steps, dtype, 3)
    results["fwd_3d"] = {"ms": t3 * 1e3, "per_eval_ms": t3 * 1e3 / mb3d,
                         "tflop": f3 / 1e12 if f3 else None}
    tn, fn_ = _unet_phase(shape3d, mb3d, (False, False, False), args.steps, dtype, 3)
    results["fwd_3d_noattn"] = {"ms": tn * 1e3, "per_eval_ms": tn * 1e3 / mb3d,
                                "tflop": fn_ / 1e12 if fn_ else None}
    t2, f2 = _unet_phase(shape2d, mb2d, (False, False, True), args.steps, dtype, 2)
    results["fwd_2d"] = {"ms": t2 * 1e3, "per_eval_ms": t2 * 1e3 / mb2d,
                         "tflop": f2 / 1e12 if f2 else None}

    # PLMS scaffolding: the x-update + AB coefficients with a free model,
    # at the 3D sweep's mega-batch geometry
    from ddpm_ood_tpu.diffusion.plms import PLMSState, plms_step
    from ddpm_ood_tpu.diffusion.schedules import make_schedule

    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    x0 = jnp.zeros((mb3d,) + shape3d, dtype)
    state0 = PLMSState(
        x=x0,
        ets=jnp.zeros((4,) + x0.shape, dtype),
        counter=jnp.zeros((), jnp.int32),
        cur_sample=x0,
    )

    def tail(state, i):
        eps = 0.1 * state.x  # free "model"
        t = jnp.maximum(990 - i * 10, 10).astype(jnp.int32)
        s2 = plms_step(sched, state, eps, t, 10)
        # plms_step computes in f32; cast back so the scan carry type is stable
        return PLMSState(
            x=s2.x.astype(dtype), ets=s2.ets.astype(dtype),
            counter=s2.counter, cur_sample=s2.cur_sample.astype(dtype),
        )

    tt, _ = _time_scanned(tail, state0, args.steps)
    results["plms_tail_3d"] = {"ms": tt * 1e3}

    if args.trace_dir:
        unet_time = results["fwd_3d"]["ms"]
        jax.profiler.start_trace(args.trace_dir)
        _unet_phase(shape3d, mb3d, (False, False, True), 2, dtype, 3)
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace_dir} (fwd_3d ~{unet_time:.1f} ms)")

    attn_ms = results["fwd_3d"]["ms"] - results["fwd_3d_noattn"]["ms"]
    print(json.dumps({
        "bench": "profile_3d_sweep",
        "backend": jax.default_backend(),
        "phases": {k: {kk: (round(vv, 4) if vv is not None else None)
                       for kk, vv in v.items()}
                   for k, v in results.items()},
        "attention_share_ms": round(attn_ms, 3),
        "plms_tail_share_ms": round(results["plms_tail_3d"]["ms"], 3),
    }, indent=2))


if __name__ == "__main__":
    main()
