#!/usr/bin/env python
"""Serve OOD scores for a trained run over HTTP.

Loads the model exactly as reconstruct.py does (same flags for geometry /
schedule / VQ-VAE), keeps the compiled sweep resident, and scores POSTed
images against the run's validation statistics (`<run>/ood/results_val.csv`
from a prior `reconstruct.py --run_val=1` with the SAME num_inference_steps
and inference_skip_factor).

  python scripts/serve.py --output_dir=... --model_name=fashionmnist \
      --model_type=small --is_grayscale=1 --beta_schedule=scaled_linear_beta \
      --beta_start=0.0015 --beta_end=0.0195 --image_size=28 \
      --num_inference_steps=100 --inference_skip_factor=4 --batch_size=32 \
      --port=8700

  curl localhost:8700/healthz
  python - <<'PY'
  import io, urllib.request, numpy as np
  buf = io.BytesIO(); np.save(buf, np.random.rand(2, 28, 28, 1).astype("float32"))
  req = urllib.request.Request("http://localhost:8700/score", data=buf.getvalue())
  print(urllib.request.urlopen(req).read().decode())
  PY
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_name", required=True)
    p.add_argument("--model_type", default="small")
    p.add_argument("--spatial_dimension", type=int, default=2)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--image_roi", default=None)
    p.add_argument("--is_grayscale", type=int, default=0)
    p.add_argument("--prediction_type", default="epsilon")
    p.add_argument("--beta_schedule", default="linear_beta")
    p.add_argument("--beta_start", type=float, default=1e-4)
    p.add_argument("--beta_end", type=float, default=2e-2)
    p.add_argument("--b_scale", type=float, default=1.0)
    p.add_argument("--snr_shift", type=float, default=1)
    p.add_argument("--vqvae_checkpoint", default=None)
    p.add_argument("--latent_pad", default=None)
    p.add_argument("--eval_checkpoint", default=None)
    p.add_argument("--ddpm_checkpoint_epoch", default=None)
    p.add_argument("--num_inference_steps", type=int, default=100)
    p.add_argument("--inference_skip_factor", type=int, default=1)
    p.add_argument("--sampler", default="plms")
    p.add_argument("--use_ema", type=int, default=0,
                   help="serve with the checkpoint's EMA weights "
                   "(ema_model_state_dict)")
    p.add_argument("--score_elbo", type=int, default=0,
                   help="also return z_score_elbo per image (needs a "
                   "results_val.csv produced with reconstruct.py "
                   "--score_elbo=1)")
    p.add_argument("--score_ssim", type=int, default=0,
                   help="also return z_score_ssim per image (needs a "
                   "results_val.csv produced with reconstruct.py "
                   "--score_ssim=1)")
    p.add_argument("--quantize", default="none", choices=("none", "int8", "w8", "mixed"),
                   help="int8 PTQ of the scoring UNet's block convs "
                   "(reconstruct.py --quantize; ops/quant.py)")
    p.add_argument("--recon_groups", default="auto",
                   help="lane groups in the compiled sweep; 'auto' = the "
                   "v5e-autotuned optimum (16 for 2D, 3 for 3D) or an integer")
    p.add_argument("--batch_size", type=int, default=8,
                   help="compiled request batch; requests up to this size share "
                   "one compile")
    p.add_argument("--batch_window_ms", type=float, default=0.0,
                   help="dynamic request batching: coalesce concurrent "
                   "requests arriving within this window into ONE sweep "
                   "(up to batch_size images) — up to batch_size x serving "
                   "throughput under small-request load. 0 disables")
    p.add_argument("--results_val", default=None,
                   help="validation stats CSV (default <run>/ood/results_val.csv)")
    p.add_argument("--flag_fpr", type=float, default=0.0,
                   help="serve is_ood / ood_flags decisions thresholded at "
                   "the (1 - flag_fpr) quantile of the validation images' "
                   "per-image mean-z distribution (e.g. 0.05 targets 5%% "
                   "false-positive rate on in-distribution traffic). "
                   "0 disables (z-scores only)")
    p.add_argument("--drift_window", type=int, default=256,
                   help="the /statz mean_served_z_mse drift indicator is a "
                   "windowed mean over the last N served images (a lifetime "
                   "mean is also reported but goes inert at high volume)")
    p.add_argument("--auth_token", default=os.environ.get(
                   "DDPM_OOD_TPU_AUTH_TOKEN") or None,
                   help="require 'Authorization: Bearer <token>' on every "
                   "endpoint except GET /healthz (default from "
                   "$DDPM_OOD_TPU_AUTH_TOKEN). The service binds 0.0.0.0 — "
                   "set this anywhere the network is not already trusted")
    p.add_argument("--aot_cache", default=None,
                   help="path to an AOT sweep artifact (recon/aot.py): if it "
                   "exists, the compiled lane-group executables are LOADED "
                   "(zero tracing, zero XLA compiles — restart at warm "
                   "latency); otherwise this process compiles once and "
                   "saves it. Pinned to this jax version + backend + sweep "
                   "geometry; weights stay call-time inputs, so POST /reload "
                   "keeps working")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8700)
    p.add_argument("--seed", type=int, default=None)
    args = p.parse_args(argv)
    if args.eval_checkpoint and not args.ddpm_checkpoint_epoch:
        args.ddpm_checkpoint_epoch = args.eval_checkpoint
    return args


def main(argv=None) -> None:
    args = parse_args(argv)

    from ddpm_ood_tpu.losses.lpips import PerceptualLoss
    from ddpm_ood_tpu.serve import ScoringService, build_recon_program, serve_forever
    from ddpm_ood_tpu.trainers.base import BaseTrainer

    trainer = BaseTrainer(args)
    if not trainer.found_checkpoint:
        raise FileNotFoundError(
            f"No checkpoint under {pathlib.Path(args.output_dir) / args.model_name}"
        )
    perceptual = PerceptualLoss(
        dimensions=args.spatial_dimension,
        is_fake_3d=args.spatial_dimension == 3,
        lpips_normalize=True,
    )
    program = build_recon_program(trainer, args, perceptual_fn=perceptual)
    val_csv = args.results_val or (
        pathlib.Path(args.output_dir) / args.model_name / "ood" / "results_val.csv"
    )

    def reload_fn():
        # re-read the run's newest/best checkpoint and swap the bound weights;
        # compiled sweeps are reused (weights are traced args, docs/DESIGN.md)
        path = trainer.reload_params(
            int(args.ddpm_checkpoint_epoch) if args.ddpm_checkpoint_epoch else None
        )
        program.model_fn = trainer.model_fn
        return str(path)

    import pandas as pd

    from ddpm_ood_tpu.ood.score import dedup

    # on a multi-chip host, score data-parallel over the trainer's mesh:
    # the request batch is GSPMD-sharded along `data` and the same compiled
    # sweep uses every local device (single chip: plain host array, as before)
    import jax

    shard_fn = trainer.shard if jax.device_count() > 1 else None
    if shard_fn is not None and args.batch_size % jax.device_count() != 0:
        print(
            f"serve: batch_size {args.batch_size} not divisible by "
            f"{jax.device_count()} devices — batches wrap-pad up to the next "
            "multiple (one-time; scores are unaffected)"
        )
    service = ScoringService(
        program, dedup(pd.read_csv(val_csv)), args.batch_size,
        model_name=args.model_name, reload_fn=reload_fn, shard_fn=shard_fn,
        flag_fpr=args.flag_fpr, drift_window=args.drift_window,
    )
    if service.z_thresholds:
        print(f"decision thresholds (flag_fpr={args.flag_fpr}): "
              f"{service.z_thresholds}")
    # compile every sweep group BEFORE accepting requests so the first
    # request runs at warm latency (concurrent compiles opt-in — see helper)
    from ddpm_ood_tpu.serve import serving_example, warmup_program

    aot_done = False
    if args.aot_cache and jax.process_count() > 1:
        # the multi-process path owns its compile-then-barrier choreography
        # (recon/sweep.py __call__); uncoordinated per-process save/load here
        # would skew Gloo init past its ~30 s window
        print("aot_cache: multi-process run — ignored (the compile-then-"
              "barrier path in the sweep owns multi-process compiles)")
    elif args.aot_cache:
        example = serving_example(args, args.batch_size, shard_fn)
        if example is None:
            print("aot_cache: serving geometry underivable from args "
                  "(no image_size/image_roi) — falling back to plain warmup")
        else:
            import time as _time

            from ddpm_ood_tpu.recon.aot import load_or_save

            t0 = _time.perf_counter()
            meta = load_or_save(
                program, args.aot_cache, example,
                # baked into the UNet's traced code but invisible to the
                # program object — must be pinned or an artifact saved
                # without --quantize would silently serve f32 numerics
                extra_fingerprint={"quantize": args.quantize},
            )
            print(
                f"aot: {meta['action']} — {len(program._compiled)} compiled "
                f"sweep groups in {_time.perf_counter() - t0:.1f}s "
                f"({args.aot_cache})"
            )
            aot_done = True
    if not aot_done:
        secs = warmup_program(program, args, args.batch_size, shard_fn=shard_fn)
        if secs >= 0:
            print(f"warm: compiled {len(program._compiled)} sweep groups in {secs:.1f}s")
    if args.batch_window_ms > 0:
        from ddpm_ood_tpu.serve import BatchingScoringService

        service = BatchingScoringService(service, args.batch_window_ms)
    if args.auth_token:
        print("bearer-token auth enabled (all endpoints except GET /healthz)")
    serve_forever(service, args.host, args.port, auth_token=args.auth_token)


if __name__ == "__main__":
    main()
