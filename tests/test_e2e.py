"""End-to-end slice on synthetic data: train -> reconstruct -> OOD AUROC.

The `--quick_test`-equivalent of the reference (SURVEY.md §4) but fully automated:
a tiny 2D DDPM is trained a few steps on synthetic 'in' textures, the
reconstruction sweep writes results_{val,in,out}.csv through the real Reconstruct
pipeline, and the scorer computes an AUROC. Exercises all four pipeline stages'
Python APIs on CPU.
"""

import argparse
from pathlib import Path

import numpy as np
import pytest

from ddpm_ood_tpu.data.csv_splits import write_split_csv


def _make_dataset(root: Path, name: str, n: int, rng, out_of_dist: bool = False):
    """in-dist: smooth low-frequency fields; OOD: high-frequency checkerboards.
    (The transform chain min-max scales each image, so the OOD signal must be
    structural, not an intensity offset.)"""
    paths = []
    d = root / name
    d.mkdir(parents=True, exist_ok=True)
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    for i in range(n):
        if out_of_dist:
            img = ((xx + yy + i) % 2).astype(np.float32)[None]
        else:
            phase = rng.uniform(0, 2 * np.pi)
            img = (0.5 + 0.5 * np.sin(2 * np.pi * (xx + yy) / 16 + phase)).astype(
                np.float32
            )[None]
        p = d / f"{name}_{i}.npy"
        np.save(p, img)
        paths.append(str(p))
    csv = root / f"{name}.csv"
    write_split_csv(paths, str(csv))
    return str(csv)


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    train_csv = _make_dataset(root, "train", 8, rng)
    val_csv = _make_dataset(root, "val", 4, rng)
    in_csv = _make_dataset(root, "inset", 4, rng)
    out_csv = _make_dataset(root, "outset", 4, rng, out_of_dist=True)
    return root, train_csv, val_csv, in_csv, out_csv


def _train_args(root, train_csv, val_csv):
    return argparse.Namespace(
        seed=2, output_dir=str(root / "output"), model_name="e2e_fashionmnist",
        training_ids=train_csv, validation_ids=val_csv, spatial_dimension=2,
        image_size=16, image_roi=None, latent_pad=None, vqvae_checkpoint=None,
        prediction_type="epsilon", model_type="tiny",
        beta_schedule="scaled_linear_beta", beta_start=0.0015, beta_end=0.0195,
        b_scale=1.0, snr_shift=1, simplex_noise=0, batch_size=4, n_epochs=2,
        eval_freq=2, augmentation=0, num_workers=2, cache_data=1,
        checkpoint_every=2, ddpm_checkpoint_epoch=None, is_grayscale=1,
        quick_test=0,
    )


def test_end_to_end(pipeline_dirs):
    root, train_csv, val_csv, in_csv, out_csv = pipeline_dirs
    from ddpm_ood_tpu.ood import compute_ood_scores
    from ddpm_ood_tpu.trainers import DDPMTrainer, Reconstruct

    # ---- train ----
    args = _train_args(root, train_csv, val_csv)
    trainer = DDPMTrainer(args)
    trainer.train(args)
    run_dir = Path(args.output_dir) / args.model_name
    assert (run_dir / "checkpoint").exists()

    # ---- resume finds the checkpoint ----
    t2 = DDPMTrainer(args)
    assert t2.found_checkpoint and t2.start_epoch >= 1

    # ---- reconstruct ----
    rargs = _train_args(root, train_csv, val_csv)
    rargs.validation_ids = val_csv
    rargs.in_ids = in_csv
    rargs.out_ids = out_csv
    rargs.first_n = None
    rargs.first_n_val = None
    rargs.run_val, rargs.run_in, rargs.run_out = 1, 1, 1
    rargs.num_inference_steps = 10
    rargs.inference_skip_factor = 3
    rargs.drop_last = False
    rargs.eval_checkpoint = None
    recon = Reconstruct(rargs)
    recon.reconstruct(rargs)

    import pandas as pd

    out_dir = run_dir / "ood"
    val_df = pd.read_csv(out_dir / "results_val.csv")
    in_df = pd.read_csv(out_dir / "results_in.csv")
    out_df = pd.read_csv(out_dir / "results_outset.csv")
    # 4 images x ceil(10/3)=4 start points (t_starts of 10-step grid skip 3)
    assert {"filename", "type", "t", "perceptual_difference", "mse"} <= set(val_df.columns)
    assert val_df["filename"].nunique() == 4
    assert in_df["t"].nunique() == out_df["t"].nunique() == val_df["t"].nunique()

    # ---- score ----
    scored = compute_ood_scores(val_df, in_df, out_df)
    # a 2-epoch CPU model can't guarantee separation quality; the contract here is
    # that the full pipeline runs and produces a valid score (quality is bench'd
    # on real hardware with real datasets)
    assert 0.0 <= scored["auroc"] <= 1.0
    assert np.isfinite(scored["per_image"]["z_score_mse"]).all()


def test_validation_sampler_compiled_once(pipeline_dirs):
    """The 1000-step ancestral sampler must not re-trace per val_epoch: the
    trainer jits ddpm_sample ONCE (sched/model_fn as traced pytree args), so a
    second _sample_figure call adds no cache entries (VERDICT r2 weak #3)."""
    from ddpm_ood_tpu.trainers import DDPMTrainer

    root, train_csv, val_csv, _, _ = pipeline_dirs
    args = _train_args(root, train_csv, val_csv)
    args.model_name = "e2e_sampler_cache"
    args.n_epochs = 0  # no training needed; we only drive the sampler
    trainer = DDPMTrainer(args)

    images = np.zeros((2, 1, 16, 16), np.float32)
    from ddpm_ood_tpu.trainers.base import channels_last

    # NOTE: the pjit cache is shared across jax.jit wrappers of the same
    # underlying function, so other tests' ddpm_sample entries are visible
    # here — assert on GROWTH, not absolute size.
    before = trainer._sample_jit._cache_size()
    trainer._sample_figure(channels_last(images))
    n_compiles = trainer._sample_jit._cache_size()
    assert n_compiles - before <= 1  # at most one new trace for this shape
    trainer._sample_figure(channels_last(images))
    assert trainer._sample_jit._cache_size() == n_compiles  # no retrace
