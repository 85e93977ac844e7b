#!/usr/bin/env python
"""Serving restart latency: AOT sweep artifact vs compile paths (recon/aot.py).

Three phases, each in its own fresh process (fresh jax, controlled XLA
persistent-cache state), at the headline serving geometry (small UNet,
32x32x1, 100-step PLMS, skip 4, batch 32, G=16 — the config whose cold start
measured 206 s serial / 130 s concurrent in scripts/bench_coldstart.py):

  cold_save   fresh compile cache: trace + XLA-compile every lane group, then
              serialize the artifact (the once-per-deployment cost)
  warm_cache  warm persistent compile cache: every group still RE-TRACES and
              hits the cache (today's restart path)
  aot_load    deserialize the artifact: zero tracing, zero compiles

Each phase reports seconds from process start (post-import) to the first
scored batch fetched to host. Prints one JSON line with all three.

Usage: python scripts/bench_aot.py [--quick] [--sampler plms] [--steps 100]
       [--skip 4]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent

CHILD = r"""
import json, pathlib, sys, time
sys.path.insert(0, %(repo)r)
t_proc = time.perf_counter()

import jax, jax.numpy as jnp, numpy as np
if %(backend)r:
    # the axon plugin overrides the JAX_PLATFORMS env var; config wins
    jax.config.update("jax_platforms", %(backend)r)
jax.config.update("jax_compilation_cache_dir", %(cache)r)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.models.unet import make_unet
from ddpm_ood_tpu.recon.sweep import ReconProgram

phase = %(phase)r
on_tpu = jax.default_backend() == "tpu"
dtype = jnp.bfloat16 if on_tpu else jnp.float32
model, size, batch = %(model)r, 32, %(batch)d
steps, skip, groups = %(steps)d, %(skip)d, %(groups)d

unet = make_unet(model, 2, 1, 1, dtype=dtype)
# init params on the host CPU backend: a serving restart reads them from a
# checkpoint, so an on-TPU init compile (minutes through the tunnel) would
# pollute every phase's setup time with a cost real restarts don't pay
try:
    _init_dev = jax.local_devices(backend="cpu")[0]
except RuntimeError:
    _init_dev = jax.devices()[0]
with jax.default_device(_init_dev):
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 1)),
                       jnp.zeros((1,), jnp.int32))["params"]
model_fn = jax.tree_util.Partial(
    lambda p_, x, t: unet.apply({"params": p_}, x, t), params)
prog = ReconProgram(
    sched=make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195),
    model_fn=model_fn, num_inference_steps=steps,
    inference_skip_factor=skip, sampler=%(sampler)r, num_groups=groups)
images = jnp.asarray(np.random.default_rng(1).uniform(
    size=(batch, size, size, 1)).astype(np.float32))

t_ready = time.perf_counter()
stage_s = None
if phase == "cold_save":
    from ddpm_ood_tpu.recon.aot import save_compiled
    t0 = time.perf_counter()
    save_compiled(prog, %(artifact)r, images)
    stage_s = time.perf_counter() - t0
elif phase == "aot_load":
    from ddpm_ood_tpu.recon.aot import load_compiled
    t0 = time.perf_counter()
    load_compiled(prog, %(artifact)r, images)
    stage_s = time.perf_counter() - t0
    prog._build = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("compile after AOT load"))
# warm_cache: nothing — __call__ traces each group and hits the XLA cache

t0 = time.perf_counter()
out = prog(images, jax.random.PRNGKey(0))
float(jnp.sum(out[1]))  # fetch: first scores on host
first_score_s = time.perf_counter() - t0
print("CHILD_RESULT " + json.dumps({
    "phase": phase,
    "setup_s": round(t_ready - t_proc, 2),
    "stage_s": None if stage_s is None else round(stage_s, 2),
    "first_score_s": round(first_score_s, 2),
    "total_s": round(time.perf_counter() - t_proc, 2),
}))
"""


def run_phase(phase, cache, artifact, cfg, backend=None, timeout=3600):
    code = CHILD % {
        "repo": str(REPO), "phase": phase, "cache": cache,
        "artifact": artifact, "backend": backend, **cfg,
    }
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(
        f"phase {phase} produced no result:\n{proc.stdout}\n{proc.stderr}"
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--backend", default=None, choices=(None, "cpu", "tpu"),
                   help="force the child processes' jax platform (hermetic "
                   "runs: --backend cpu)")
    p.add_argument("--sampler", default="plms")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--skip", type=int, default=4)
    p.add_argument("--groups", type=int, default=16)
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()

    cfg = {
        "model": "tiny" if args.quick else "small",
        "batch": 4 if args.quick else args.batch,
        "steps": 10 if args.quick else args.steps,
        "skip": 3 if args.quick else args.skip,
        "groups": 2 if args.quick else args.groups,
        "sampler": args.sampler,
    }
    with tempfile.TemporaryDirectory() as td:
        fresh_cache = os.path.join(td, "xla_cache_fresh")
        artifact = os.path.join(td, "sweep.aot")
        t0 = time.perf_counter()
        cold = run_phase("cold_save", fresh_cache, artifact, cfg, args.backend)
        # warm_cache reuses the cache the cold phase just filled (exactly the
        # restart-after-deploy scenario); aot_load gets yet another EMPTY
        # cache to prove it needs neither cache nor compiles
        warm = run_phase("warm_cache", fresh_cache, artifact, cfg, args.backend)
        aot = run_phase("aot_load", os.path.join(td, "xla_cache_unused"),
                        artifact, cfg, args.backend)
        size_mb = round(os.path.getsize(artifact) / 1e6, 1)
        wall = round(time.perf_counter() - t0, 1)
    print(json.dumps({
        "bench": "aot_restart",
        "mode": "quick" if args.quick else "full",
        "backend": args.backend or "default",
        "config": cfg,
        "artifact_mb": size_mb,
        "cold_compile_save": cold,
        "warm_persistent_cache_restart": warm,
        "aot_artifact_restart": aot,
        "restart_speedup_vs_warm_cache": round(
            warm["total_s"] / aot["total_s"], 2),
        "orchestration_wall_s": wall,
    }))


if __name__ == "__main__":
    main()
