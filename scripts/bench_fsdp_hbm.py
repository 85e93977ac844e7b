#!/usr/bin/env python
"""--fsdp static-HBM accounting at the production configs (VERDICT r4 #5).

Params + optimizer state (+ weight EMA where tracked) are STATIC residents:
their per-device bytes are exact arithmetic over the pytree and its shardings
(`parallel/fsdp.py:sharded_bytes_per_device`), independent of the backend — so
this runs on the 8-virtual-device CPU mesh and reports exactly what an
8-chip v5e pod-slice would hold. Activations are workload-dependent and are
measured separately (scripts/bench_3d_pixel.py's remat envelope).

Configs: the big 2D/3D UNet (reference base.py:77-88 'big') and the
production 3D pixel-space VQVAE (reference README.md:165-190), whose no-remat
G step peaks at 15.4 GiB on one chip (BASELINE.md) — the motivating case.

Usage: python scripts/bench_fsdp_hbm.py [--devices 8]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    args = p.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        )
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from jax.sharding import Mesh

    from ddpm_ood_tpu.models.discriminator import PatchDiscriminator
    from ddpm_ood_tpu.models.unet import make_unet
    from ddpm_ood_tpu.models.vqvae import VQVAE
    from ddpm_ood_tpu.parallel.fsdp import apply_fsdp, sharded_bytes_per_device
    from ddpm_ood_tpu.train.ddpm import make_ddpm_state
    from ddpm_ood_tpu.train.vqvae import make_vqvae_states

    devices = jax.devices()[: args.devices]
    mesh = Mesh(np.asarray(devices).reshape(len(devices), 1), ("data", "model"))

    def account(name, state, extra_trees=()):
        trees = {"params": state.params, "opt_state": state.opt_state}
        ema = getattr(state, "ema_params", None)
        if ema is not None:
            trees["ema_params"] = ema
        for label, t in extra_trees:
            trees[label] = t
        replicated = sum(
            leaf.size * leaf.dtype.itemsize
            for t in trees.values()
            for leaf in jax.tree_util.tree_leaves(t)
            if hasattr(leaf, "dtype")
        )
        sharded_state = apply_fsdp(mesh, state)
        sharded = sharded_bytes_per_device(
            {"params": sharded_state.params,
             "opt_state": sharded_state.opt_state,
             **({"ema_params": sharded_state.ema_params}
                if getattr(sharded_state, "ema_params", None) is not None
                else {})}
        )
        return {
            "config": name,
            "replicated_MiB_per_device": round(replicated / 2**20, 1),
            "fsdp_MiB_per_device": round(sharded / 2**20, 1),
            "reduction": round(replicated / max(sharded, 1), 2),
            "devices": len(devices),
        }

    rows = []

    # big UNet (reference base.py:77-88), 2D rgb + weight EMA (worst case:
    # params + 2 Adam moments + EMA = 4 copies replicated)
    unet = make_unet("big", 2, 3, 3)
    state = make_ddpm_state(
        unet, jax.random.PRNGKey(0), (32, 32, 3), with_ema=True
    )
    rows.append(account("big 2D UNet (+Adam, +EMA)", state))

    # production 3D pixel-space VQVAE G (reference README.md:165-190 flags)
    vq = VQVAE(
        spatial_dims=3, in_channels=1, out_channels=1, num_res_layers=3,
        downsample_parameters=((2, 4, 1, 1),) * 4,
        upsample_parameters=((2, 4, 1, 1, 0),) * 4,
        num_channels=(128, 128, 128, 256),
        num_res_channels=(128, 128, 128, 256),
        num_embeddings=256, embedding_dim=256,
    )
    disc = PatchDiscriminator(
        spatial_dims=3, num_layers_d=3, num_channels=64, in_channels=1
    )
    g_state, d_state = make_vqvae_states(
        vq, disc, jax.random.PRNGKey(0), (16, 16, 16, 1)
    )
    rows.append(account("3D VQVAE G (+Adam)", g_state))
    rows.append(account("3D PatchDiscriminator D (+Adam)", d_state))

    print(json.dumps({"bench": "fsdp_static_hbm", "rows": rows}))


if __name__ == "__main__":
    main()
