"""End-to-end coverage for --prediction_type=sample / v_prediction.

The reference exposes three prediction parameterizations
(train_ddpm.py:38-42); the schedule math round-trip is unit-tested in
test_schedules.py, but the full train -> reconstruct -> score path previously
ran only under epsilon. Each type changes BOTH the training target
(train/ddpm.py via schedules.target_from) and the sampler's model-output
interpretation (plms.epsilon_from_model_output), so the pipeline gets a
per-type gate.
"""

import argparse
from pathlib import Path

import numpy as np
import pytest

from ddpm_ood_tpu.data.csv_splits import write_split_csv


def _make_dataset(root: Path, name: str, n: int, rng):
    d = root / name
    d.mkdir(parents=True, exist_ok=True)
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    paths = []
    for i in range(n):
        phase = rng.uniform(0, 2 * np.pi)
        img = (0.5 + 0.5 * np.sin(2 * np.pi * (xx + yy) / 16 + phase)).astype(
            np.float32
        )[None]
        np.save(d / f"{name}_{i}.npy", img)
        paths.append(str(d / f"{name}_{i}.npy"))
    csv = root / f"{name}.csv"
    write_split_csv(paths, str(csv))
    return str(csv)


@pytest.mark.parametrize("ptype", ["sample", "v_prediction"])
def test_pipeline_with_prediction_type(tmp_path, ptype):
    from ddpm_ood_tpu.ood import compute_ood_scores
    from ddpm_ood_tpu.trainers import DDPMTrainer, Reconstruct

    rng = np.random.default_rng(0)
    train_csv = _make_dataset(tmp_path, "train", 8, rng)
    val_csv = _make_dataset(tmp_path, "val", 4, rng)

    args = argparse.Namespace(
        seed=2, output_dir=str(tmp_path / "output"),
        model_name=f"ptype_{ptype}_fashionmnist",
        training_ids=train_csv, validation_ids=val_csv, spatial_dimension=2,
        image_size=16, image_roi=None, latent_pad=None, vqvae_checkpoint=None,
        prediction_type=ptype, model_type="tiny",
        beta_schedule="scaled_linear_beta", beta_start=0.0015, beta_end=0.0195,
        b_scale=1.0, snr_shift=1, simplex_noise=0, batch_size=4, n_epochs=2,
        eval_freq=10, augmentation=0, num_workers=2, cache_data=1,
        checkpoint_every=2, ddpm_checkpoint_epoch=None, is_grayscale=1,
        quick_test=0,
    )
    trainer = DDPMTrainer(args)
    losses = [trainer.train_epoch(0), trainer.train_epoch(1)]
    assert all(np.isfinite(v) for v in losses), (ptype, losses)
    trainer.save_checkpoint("checkpoint", 1)
    from ddpm_ood_tpu.utils.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()

    rargs = argparse.Namespace(**vars(args))
    rargs.in_ids = val_csv
    rargs.out_ids = ""
    rargs.first_n = rargs.first_n_val = None
    rargs.run_val, rargs.run_in, rargs.run_out = 1, 1, 0
    rargs.num_inference_steps = 10
    rargs.inference_skip_factor = 3
    rargs.drop_last = False
    rargs.eval_checkpoint = None
    recon = Reconstruct(rargs)
    # the reconstruct trainer must carry the prediction type into the sched
    assert recon.sched.prediction_type == ptype
    recon.reconstruct(rargs)

    import pandas as pd

    ood_dir = tmp_path / "output" / args.model_name / "ood"
    val_df = pd.read_csv(ood_dir / "results_val.csv")
    in_df = pd.read_csv(ood_dir / "results_in.csv")
    assert np.isfinite(val_df["mse"]).all(), ptype
    scored = compute_ood_scores(val_df, in_df, in_df)
    assert np.isfinite(scored["per_image"]["z_score_mse"]).all(), ptype
