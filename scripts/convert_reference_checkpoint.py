#!/usr/bin/env python
"""Convert a reference (marksgraham/ddpm-ood) torch UNet checkpoint to Orbax.

Reads the reference's `checkpoint[_N].pth` schema ({epoch, global_step,
model_state_dict, optimizer_state_dict, best_loss} — reference
src/trainers/base.py:166-187), remaps the monai-generative DiffusionModelUNet
state_dict onto this framework's Flax parameter tree
(ddpm_ood_tpu/utils/convert_torch.py), and writes an Orbax checkpoint this
framework's trainers resume from directly — so `reconstruct.py` /
`ood_detection.py` run on reference-trained models without retraining.

The optimizer state is re-initialized (fresh Adam moments): torch Adam state is
keyed by parameter *index*, an ordering this framework has no reason to
replicate; for the OOD inference workload it is never read, and for continued
training Adam re-warms within a few hundred steps.

Usage:
  python scripts/convert_reference_checkpoint.py \
      --torch_checkpoint /path/to/checkpoint_300.pth \
      --output_dir ./output --model_name fashionmnist_converted \
      --model_type small --spatial_dimension 2 [--as_epoch 300]

Verify with --dry_run first: it prints the match report (matched leaf count,
missing flax paths, unconsumed torch keys) without writing anything.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--torch_checkpoint", required=True,
                   help="the .pth to read (import) or write (--export)")
    p.add_argument("--output_dir", default=None, help="import: destination root")
    p.add_argument("--model_name", default=None, help="import: destination run name")
    p.add_argument(
        "--component", default="unet", choices=["unet", "vqvae"],
        help="unet: a DDPM/LDM checkpoint; vqvae: a stage-1 VQVAE checkpoint "
        "(converted for use as --vqvae_checkpoint; the reference saves no "
        "discriminator/optimizer_g state, so GAN-training resume is out of scope)",
    )
    p.add_argument("--model_type", default="small", help="small | big (reference base.py:65-88)")
    p.add_argument("--spatial_dimension", type=int, default=2)
    p.add_argument(
        "--vqvae_config", default=None,
        help="path to the reference run's vqvae_config.json (required for "
        "--component vqvae; same schema both sides, copied into the output run dir)",
    )
    p.add_argument(
        "--as_epoch", type=int, default=None,
        help="write checkpoint_{N} instead of the rolling `checkpoint`",
    )
    p.add_argument("--dry_run", action="store_true", help="print the match report only")
    p.add_argument(
        "--export", default=None, metavar="ORBAX_CKPT",
        help="REVERSE direction: read this framework's Orbax checkpoint "
        "(a `checkpoint[_N]` directory) and write --torch_checkpoint as a "
        "reference-schema .pth loadable by marksgraham/ddpm-ood. "
        "--component selects unet|vqvae as usual.",
    )
    args = p.parse_args()

    if args.export:
        _export(args)
        return
    if not args.output_dir or not args.model_name:
        p.error("--output_dir and --model_name are required when importing")

    # torch-free import: the restricted .pth reader (utils/pth_reader.py)
    # handles both the zip and legacy torch formats and yields numpy directly,
    # so reference-checkpoint migration runs on hosts without torch
    from ddpm_ood_tpu.utils.pth_reader import load_pth

    raw = load_pth(args.torch_checkpoint)
    if "model_state_dict" in raw:
        sd = raw["model_state_dict"]
        epoch = int(raw.get("epoch", 0))
        global_step = int(raw.get("global_step", 0))
        best_loss = float(raw.get("best_loss", 1000.0))
    else:  # bare state_dict
        sd, epoch, global_step, best_loss = raw, 0, 0, 1000.0
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}

    if args.component == "vqvae":
        _convert_vqvae(args, sd, epoch, global_step, best_loss)
        return

    # channel counts come from the weights themselves
    conv_in_key = next(k for k in sd if k.startswith("conv_in") and k.endswith("weight"))
    in_channels = sd[conv_in_key].shape[1]
    out_key = next(k for k in sd if k.startswith("out.") and k.endswith("conv.weight"))
    out_channels = sd[out_key].shape[0]

    import jax

    jax.config.update("jax_platforms", "cpu")  # conversion is host work
    import jax.numpy as jnp

    from ddpm_ood_tpu.models.unet import make_unet, param_count
    from ddpm_ood_tpu.train.ddpm import make_ddpm_state
    from ddpm_ood_tpu.utils import checkpoint as ckpt
    from ddpm_ood_tpu.utils.convert_torch import torch_to_flax_unet

    unet = make_unet(args.model_type, args.spatial_dimension, in_channels, out_channels)
    sample_shape = (32,) * args.spatial_dimension + (in_channels,)
    state = make_ddpm_state(unet, jax.random.PRNGKey(0), sample_shape)
    template = jax.tree_util.tree_map(np.asarray, state.params)

    params, report = torch_to_flax_unet(sd, template)
    print(json.dumps({
        "matched": report["matched"],
        "missing": report["missing"],
        "unused": report["unused"],
        "in_channels": int(in_channels),
        "out_channels": int(out_channels),
        "params": param_count(params),
    }, indent=2))
    if report["missing"]:
        print("ERROR: flax parameters above had no torch source — wrong "
              "--model_type / --spatial_dimension, or an unknown "
              "monai-generative naming variant (extend the candidate lists in "
              "ddpm_ood_tpu/utils/convert_torch.py).", file=sys.stderr)
        sys.exit(1)
    if args.dry_run:
        return

    run_dir = pathlib.Path(args.output_dir) / args.model_name
    run_dir.mkdir(parents=True, exist_ok=True)
    payload = {
        "epoch": epoch,
        "global_step": global_step,
        "best_loss": best_loss,
        "model_state_dict": params,
        # fresh Adam state matching the resume template (see module docstring)
        "optimizer_state_dict": ckpt.to_host(state.opt_state),
    }
    name = f"checkpoint_{args.as_epoch}" if args.as_epoch is not None else "checkpoint"
    path = ckpt.save_checkpoint(run_dir, name, payload)
    ckpt.wait_for_checkpoints()
    print(f"Wrote {path}")


def _export(args) -> None:
    """Orbax checkpoint -> reference-schema .pth (the reverse migration)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    from ddpm_ood_tpu.utils import checkpoint as ckpt
    from ddpm_ood_tpu.utils.convert_torch import (
        flax_to_torch_unet,
        flax_to_torch_vqvae,
    )

    payload = ckpt.restore_checkpoint(args.export)
    msd = payload["model_state_dict"]
    if args.component == "vqvae":
        sd = flax_to_torch_vqvae(msd["params"], msd["ema"])
    else:
        sd = flax_to_torch_unet(msd)
    out = {
        "epoch": int(payload.get("epoch", 0)),
        "global_step": int(payload.get("global_step", 0)),
        "model_state_dict": {k: torch.tensor(np.asarray(v)) for k, v in sd.items()},
        # reference schema slot; optimizer state is framework-specific
        "optimizer_state_dict": {},
        "best_loss": float(payload.get("best_loss", 1000.0)),
    }
    torch.save(out, args.torch_checkpoint)
    print(json.dumps({
        "component": args.component,
        "exported_keys": len(sd),
        "wrote": args.torch_checkpoint,
    }, indent=2))


def _convert_vqvae(args, sd, epoch, global_step, best_loss) -> None:
    if not args.vqvae_config:
        print("--component vqvae requires --vqvae_config (the reference run's "
              "vqvae_config.json)", file=sys.stderr)
        sys.exit(2)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ddpm_ood_tpu.models.vqvae import VQVAE
    from ddpm_ood_tpu.utils import checkpoint as ckpt
    from ddpm_ood_tpu.utils.convert_torch import torch_to_flax_vqvae

    cfg = json.loads(pathlib.Path(args.vqvae_config).read_text())
    build = dict(cfg)
    for key in ("downsample_parameters", "upsample_parameters",
                "num_channels", "num_res_channels"):
        if key in build and isinstance(build[key], list):
            build[key] = tuple(
                tuple(v) if isinstance(v, list) else v for v in build[key]
            )
    model = VQVAE(**build)
    spatial = int(build.get("spatial_dims", args.spatial_dimension))
    dummy = jnp.zeros((1,) + (32,) * spatial + (int(build["in_channels"]),))
    variables = model.init(jax.random.PRNGKey(0), dummy)
    t_params = jax.tree_util.tree_map(np.asarray, variables["params"])
    t_ema = jax.tree_util.tree_map(np.asarray, variables["ema"])

    params, ema, report = torch_to_flax_vqvae(sd, t_params, t_ema)
    print(json.dumps({
        "component": "vqvae",
        "matched": report["matched"],
        "missing": report["missing"],
        "unused": report["unused"],
    }, indent=2))
    if report["missing"]:
        print("ERROR: flax parameters above had no torch source — wrong "
              "vqvae_config, or an unknown monai-generative naming variant "
              "(extend ddpm_ood_tpu/utils/convert_torch.py).", file=sys.stderr)
        sys.exit(1)
    if args.dry_run:
        return

    run_dir = pathlib.Path(args.output_dir) / args.model_name
    run_dir.mkdir(parents=True, exist_ok=True)
    payload = {
        "epoch": epoch,
        "global_step": global_step,
        "best_loss": best_loss,
        "model_state_dict": {"params": params, "ema": ema},
    }
    name = f"checkpoint_{args.as_epoch}" if args.as_epoch is not None else "checkpoint"
    path = ckpt.save_checkpoint(run_dir, name, payload)
    ckpt.wait_for_checkpoints()
    ckpt.save_config_json(run_dir, "vqvae_config.json", cfg)
    print(f"Wrote {path} (+ vqvae_config.json) — pass "
          f"--vqvae_checkpoint={path} to train_ddpm.py / reconstruct.py")


if __name__ == "__main__":
    main()
