#!/usr/bin/env python
"""Cold-start compile-time benchmark for the reconstruction sweep.

Measures the wall time of `ReconProgram.warmup` (recon/sweep.py) at the
headline config (small UNet, 32x32 grayscale, batch 32, PLMS 100/4, 16 lane
groups) with the persistent compile cache pointed at a FRESH temp dir, i.e. a
true cold start. One process measures one mode — run twice to compare:

    python scripts/bench_coldstart.py --parallel 0
    DDPM_OOD_TPU_PARALLEL_COMPILE=1 python scripts/bench_coldstart.py --parallel 1

(--parallel is what's actually honored; the env var is shown because it is the
production switch, ddpm_ood_tpu/trainers/reconstruct.py:_maybe_parallel_warmup.)
Through the axon remote-compile tunnel each of the 16 group programs costs a
full round trip, and they are independent — threads overlap the trips.

Prints ONE JSON line: {"parallel", "groups", "compile_s", "backend"}.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--parallel", type=int, default=1, choices=(0, 1))
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--groups", type=int, default=16)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--skip", type=int, default=4)
    p.add_argument("--model", default="small")
    p.add_argument("--warm_cache", action="store_true",
                   help="reuse the repo .jax_cache instead of a fresh temp dir "
                   "(measures dispatch+deserialize, not compilation)")
    args = p.parse_args()

    import jax

    if args.warm_cache:
        cache_dir = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
        cache_dir.mkdir(exist_ok=True)
    else:
        cache_dir = pathlib.Path(tempfile.mkdtemp(prefix="coldstart_cache_"))
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from ddpm_ood_tpu.diffusion.schedules import make_schedule
    from ddpm_ood_tpu.models.unet import make_unet
    from ddpm_ood_tpu.recon.sweep import ReconProgram

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    unet = make_unet(args.model, 2, 1, 1, dtype=dtype)
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    x = jnp.zeros((args.batch, 32, 32, 1), jnp.float32)
    params = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((args.batch,), jnp.int32))[
        "params"
    ]

    def _apply(p_, xx, tt):
        return unet.apply({"params": p_}, xx, tt)

    program = ReconProgram(
        sched=sched,
        model_fn=jax.tree_util.Partial(_apply, params),
        num_inference_steps=args.steps,
        inference_skip_factor=args.skip,
        num_groups=args.groups,
    )
    compile_s = program.warmup(x, parallel=bool(args.parallel))
    print(
        json.dumps(
            {
                "parallel": bool(args.parallel),
                "groups": len(program._groups),
                "compile_s": round(compile_s, 2),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
