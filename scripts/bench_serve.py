#!/usr/bin/env python
"""Online OOD scoring service benchmark (serve.py) at the headline config.

Builds the production ReconProgram (small UNet, 32x32 grayscale, 100-step
PLMS, skip 4, batch 32), wraps it in ScoringService + the HTTP front end, and
measures end-to-end request latency (client -> HTTP -> sweep -> z-scores ->
JSON) for full and single-image batches. This is the serving SLA a deployment
sees, on one chip — the offline sweep throughput is bench.py's number.

Usage: python scripts/bench_serve.py [--batch 32] [--quick]
"""

from __future__ import annotations

import argparse
import io
import json
import pathlib
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import pandas as pd


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--sampler", default="plms", choices=("plms", "ddim", "dpm"),
                   help="sweep sampler behind the service (dpm with "
                   "--steps 25 --skip 1 is the fastest measured grid)")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--skip", type=int, default=4)
    p.add_argument("--quantize", default="none",
                   choices=("none", "int8", "w8", "mixed"),
                   help="int8 PTQ of the scoring UNet (reconstruct.py "
                   "--quantize; ops/quant.py)")
    p.add_argument("--batch_window_ms", type=float, default=0.0,
                   help="also measure dynamic batching: N concurrent\n"
                   "single-image clients against a\n"
                   "BatchingScoringService with this window")
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ddpm_ood_tpu.diffusion.schedules import make_schedule
    from ddpm_ood_tpu.models.unet import make_unet
    from ddpm_ood_tpu.recon.sweep import ReconProgram
    from ddpm_ood_tpu.serve import (
        BatchingScoringService,
        ScoringService,
        make_server,
    )

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    batch = 4 if args.quick else args.batch
    steps = 10 if args.quick else args.steps
    skip = 3 if args.quick else args.skip
    model = "tiny" if args.quick else "small"
    size = 32

    unet = make_unet(
        model, 2, 1, 1, dtype=dtype,
        quant=None if args.quantize == "none" else args.quantize,
    )
    params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 1)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    model_fn = jax.tree_util.Partial(
        lambda p_, x, t: unet.apply({"params": p_}, x, t), params
    )
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    prog = ReconProgram(
        sched=sched, model_fn=model_fn, num_inference_steps=steps,
        inference_skip_factor=skip, sampler=args.sampler,
        num_groups=2 if args.quick else 16,
    )
    rows = []
    for t in (int(t) for t in prog.t_starts):
        for i in range(4):
            rows.append({
                "filename": f"v{i}", "type": "val", "t": t,
                "mse": 0.1 + 0.01 * i, "perceptual_difference": 0.02 + 0.01 * i,
            })
    service = ScoringService(
        prog, pd.DataFrame(rows), batch_size=batch, model_name="bench"
    )
    if args.batch_window_ms > 0:
        service = BatchingScoringService(service, args.batch_window_ms)

    server = make_server(service, "127.0.0.1", 0)
    port = server.server_port
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(n_imgs: int) -> float:
        buf = io.BytesIO()
        np.save(buf, np.random.default_rng(n_imgs).uniform(
            size=(n_imgs, size, size, 1)).astype("float32"))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score", data=buf.getvalue()
        )
        t0 = time.perf_counter()
        with urllib.request.urlopen(req) as r:
            payload = json.loads(r.read())
        dt = time.perf_counter() - t0
        assert len(payload["scores"]) == n_imgs
        assert all(np.isfinite(s["z_score_mse"]) for s in payload["scores"])
        return dt

    post(batch)  # compile + warm through the full HTTP path
    full = min(post(batch) for _ in range(3))
    single = min(post(1) for _ in range(3))  # wrap-padded to the compiled batch
    out = {
        "bench": "serve_http",
        "backend": jax.default_backend(),
        "model": model,
        "sampler": args.sampler,
        "steps": steps,
        "skip": skip,
        "quantize": args.quantize,
        "batch": batch,
        "batch_window_ms": args.batch_window_ms,
        "full_batch_latency_s": round(full, 3),
        "single_image_latency_s": round(single, 3),
        "sustained_imgs_per_s": round(batch / full, 2),
    }
    if args.batch_window_ms > 0:
        # the dynamic-batching story: `batch` concurrent single-image clients,
        # each POSTing independently — coalesced into (ideally) one sweep
        def flood() -> float:
            lat = [None] * batch
            def one(i):
                lat[i] = post(1)
            threads = [threading.Thread(target=one, args=(i,))
                       for i in range(batch)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            # a dropped/reset request would make the wall dishonestly fast —
            # every client must have completed (server backlog is burst-safe,
            # serve.py _OODHTTPServer)
            failed = sum(1 for v in lat if v is None)
            if failed:
                raise RuntimeError(f"flood: {failed}/{batch} requests failed")
            return wall
        flood()  # warm the batched path
        wall = min(flood() for _ in range(3))
        out["concurrent_single_image_clients"] = batch
        out["flood_wall_s"] = round(wall, 3)
        out["flood_reqs_per_s"] = round(batch / wall, 2)
    print(json.dumps(out))
    server.shutdown()


if __name__ == "__main__":
    main()
