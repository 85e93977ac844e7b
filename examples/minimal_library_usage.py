#!/usr/bin/env python
"""Using ddpm-ood-tpu as a library (no CLIs): train a DDPM, score OOD inputs.

The CLIs (train_ddpm.py / reconstruct.py / ood_detection.py) wrap exactly
these pieces; this example is the minimal programmatic path — useful when
embedding the scorer in a larger system or experimenting in a notebook.

Runs in ~a minute on CPU with the tiny preset:
    python examples/minimal_library_usage.py
"""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.models.unet import make_unet
from ddpm_ood_tpu.ood.score import auroc
from ddpm_ood_tpu.recon.sweep import ReconProgram
from ddpm_ood_tpu.train.ddpm import DDPMTrainStep, make_ddpm_state


def main() -> None:
    size, channels = 16, 1
    rng = np.random.default_rng(0)

    def sines(n, freq):
        yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
        out = []
        for _ in range(n):
            f = rng.uniform(0.8, 1.2) * freq
            ph = rng.uniform(0, 2 * np.pi)
            out.append(0.5 + 0.5 * np.sin(f * xx + ph) * np.cos(f * yy))
        return np.stack(out)[..., None].astype(np.float32)  # (n, H, W, 1)

    def checkers(n):
        yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
        return np.stack(
            [((xx // 2 + yy // 2 + i) % 2).astype(np.float32) for i in range(n)]
        )[..., None]

    train, val = sines(64, 0.5), sines(16, 0.5)
    in_dist, out_dist = sines(16, 0.5), checkers(16)  # OOD = wrong structure

    # -- model + schedule (reference defaults: scaled_linear 0.0015..0.0195) ----
    unet = make_unet("tiny", 2, channels, channels)
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)
    state = make_ddpm_state(unet, jax.random.PRNGKey(0), (size, size, channels))

    # -- one jitted train step: noising + fwd/bwd + Adam ------------------------
    step = DDPMTrainStep(sched=sched).make_train_step()
    key = jax.random.PRNGKey(1)
    for epoch in range(60):
        key, sub = jax.random.split(key)
        perm = jax.random.permutation(sub, train.shape[0])
        for i in range(0, train.shape[0], 16):
            batch = jnp.asarray(train[np.asarray(perm[i:i + 16])])
            key, sub = jax.random.split(key)
            state, loss = step(state, batch, sub)
        if epoch % 20 == 0:
            print(f"epoch {epoch}: loss {float(loss):.4f}")

    # -- the batched multi-t_start reconstruction sweep -------------------------
    params = state.params
    model_fn = jax.tree_util.Partial(
        lambda p, x, t: unet.apply({"params": p}, x, t), params
    )
    program = ReconProgram(
        sched=sched, model_fn=model_fn,
        num_inference_steps=20, inference_skip_factor=2, num_groups=4,
    )

    def scores(images):
        t_starts, mse, _ = program(jnp.asarray(images), jax.random.PRNGKey(7))
        return np.asarray(mse)  # (K, B) per-(t_start, image) errors

    # -- per-t Z-score against the validation set, mean over t ------------------
    val_mse = scores(val)
    mu, sd = val_mse.mean(axis=1, keepdims=True), val_mse.std(axis=1, keepdims=True) + 1e-8
    z = lambda m: ((m - mu) / sd).mean(axis=0)  # noqa: E731 — (B,) per-image score
    z_in, z_out = z(scores(in_dist)), z(scores(out_dist))

    labels = np.concatenate([np.zeros_like(z_in), np.ones_like(z_out)])
    print(f"mean Z in-dist {z_in.mean():.2f}  out-dist {z_out.mean():.2f}")
    print(f"AUROC: {auroc(labels, np.concatenate([z_in, z_out])):.3f}")


if __name__ == "__main__":
    main()
