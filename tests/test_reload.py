"""Checkpoint hot-reload (serving extension): swap weights, keep compiles.

Weights are traced program ARGUMENTS (docs/DESIGN.md "Weights are program
ARGUMENTS"), so rebinding program.model_fn reuses every compiled sweep —
the reload path must add ZERO compile cache entries.
"""

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from ddpm_ood_tpu.data.csv_splits import write_split_csv
from ddpm_ood_tpu.diffusion.schedules import make_schedule
from ddpm_ood_tpu.models.unet import make_unet
from ddpm_ood_tpu.recon.sweep import ReconProgram
from ddpm_ood_tpu.serve import ScoringService

SIZE = 16


def _dataset(root: Path, name: str, n: int):
    d = root / name
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(5)
    paths = []
    for i in range(n):
        p = d / f"{name}_{i}.npy"
        np.save(p, rng.uniform(size=(1, SIZE, SIZE)).astype(np.float32))
        paths.append(str(p))
    csv = root / f"{name}.csv"
    write_split_csv(paths, str(csv))
    return str(csv)


def _args(root, train_csv, val_csv, **over):
    ns = argparse.Namespace(
        seed=2, output_dir=str(root / "output"), model_name="reload_run",
        training_ids=train_csv, validation_ids=val_csv, spatial_dimension=2,
        image_size=SIZE, image_roi=None, latent_pad=None, vqvae_checkpoint=None,
        prediction_type="epsilon", model_type="tiny",
        beta_schedule="scaled_linear_beta", beta_start=0.0015, beta_end=0.0195,
        b_scale=1.0, snr_shift=1, simplex_noise=0, batch_size=4, n_epochs=1,
        eval_freq=10, augmentation=0, num_workers=2, cache_data=1,
        checkpoint_every=10, ddpm_checkpoint_epoch=None, is_grayscale=1,
        quick_test=0,
    )
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def test_reload_params_picks_up_new_checkpoint(tmp_path):
    """A long-lived BaseTrainer (the serving process) re-reads the run's
    rolling checkpoint after more training happened in 'another' process."""
    from ddpm_ood_tpu.trainers import DDPMTrainer
    from ddpm_ood_tpu.trainers.base import BaseTrainer

    train_csv = _dataset(tmp_path, "train", 8)
    val_csv = _dataset(tmp_path, "val", 4)
    args = _args(tmp_path, train_csv, val_csv)
    DDPMTrainer(args).train(args)

    server = BaseTrainer(args)  # the 'serving' view of the run
    assert server.found_checkpoint
    before = jax.tree_util.tree_map(np.asarray, server.state.params)

    # training continues elsewhere: resume and run one more epoch
    args2 = _args(tmp_path, train_csv, val_csv, n_epochs=2)
    DDPMTrainer(args2).train(args2)

    path = server.reload_params()
    assert Path(path).name.startswith("checkpoint")
    after = jax.tree_util.tree_map(np.asarray, server.state.params)
    changed = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(after))
    )
    assert changed
    # the reloaded weights equal what a fresh restore sees
    fresh = BaseTrainer(args)
    for a, b in zip(jax.tree_util.tree_leaves(after),
                    jax.tree_util.tree_leaves(fresh.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # explicit-epoch misses fail loudly
    with pytest.raises(FileNotFoundError):
        server.reload_params(epoch=999)


def _program_and_params():
    unet = make_unet("tiny", 2, 1, 1)
    x = jnp.zeros((1, SIZE, SIZE, 1))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))["params"]
    sched = make_schedule("scaled_linear_beta", 1000, 0.0015, 0.0195)

    def bind(p):
        return jax.tree_util.Partial(
            lambda pp, xx, tt: unet.apply({"params": pp}, xx, tt), p
        )

    prog = ReconProgram(
        sched=sched, model_fn=bind(params),
        num_inference_steps=10, inference_skip_factor=3, num_groups=2,
    )
    return prog, params, bind


def _stats(prog):
    rows = []
    for t in (int(t) for t in prog.t_starts):
        for i in range(4):
            rows.append({
                "filename": f"v{i}", "type": "val", "t": t,
                "mse": 0.1 + 0.01 * i, "perceptual_difference": 0.0,
            })
    return pd.DataFrame(rows)


def test_service_reload_swaps_weights_without_recompile():
    prog, params, bind = _program_and_params()

    def reload_fn():
        new = jax.tree_util.tree_map(lambda a: a + 0.05, params)
        prog.model_fn = bind(new)
        return "stub-checkpoint"

    svc = ScoringService(prog, _stats(prog), batch_size=4, model_name="t",
                         reload_fn=reload_fn)
    imgs = np.random.default_rng(0).uniform(size=(2, SIZE, SIZE, 1)).astype(
        "float32"
    )
    before = svc.score(imgs)
    n_compiled = len(prog._compiled)
    assert svc.reload() == "stub-checkpoint"
    after = svc.score(imgs)
    # same compiled programs, different weights -> different scores
    assert len(prog._compiled) == n_compiled
    assert any(
        b["z_score_mse"] != a["z_score_mse"] for b, a in zip(before, after)
    )
    assert svc.stats["reloads"] == 1

    # no hook -> loud error (HTTP layer maps this to 409)
    svc2 = ScoringService(prog, _stats(prog), batch_size=4, model_name="t")
    with pytest.raises(RuntimeError, match="reload hook"):
        svc2.reload()
