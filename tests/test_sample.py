"""Standalone sample-generation CLI (scripts/sample.py).

Framework extension: the reference only renders training-time TensorBoard
sample figures (src/trainers/ddpm_trainer.py:179-216); sample.py generates
from a finished checkpoint with any sampler and writes .npy + a PNG grid.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

from test_e2e import _make_dataset, _train_args

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("sample_cli")
    rng = np.random.default_rng(0)
    train_csv = _make_dataset(root, "train", 8, rng)
    val_csv = _make_dataset(root, "val", 4, rng)
    args = _train_args(root, train_csv, val_csv)
    from ddpm_ood_tpu.trainers import DDPMTrainer

    DDPMTrainer(args).train(args)
    return root, args


@pytest.mark.parametrize("sampler,steps", [("plms", 10), ("dpm", 10)])
def test_sample_cli_writes_outputs(trained_run, sampler, steps):
    root, args = trained_run
    import sample as sample_cli

    out = root / f"gen_{sampler}"
    sample_cli.main([
        "--output_dir", args.output_dir, "--model_name", args.model_name,
        "--model_type", "tiny", "--image_size", "16", "--is_grayscale", "1",
        "--beta_schedule", "scaled_linear_beta", "--beta_start", "0.0015",
        "--beta_end", "0.0195", "--n_samples", "3", "--sampler", sampler,
        "--num_inference_steps", str(steps), "--out", str(out),
    ])
    tag = f"{sampler}_{steps}_seed0"
    arr = np.load(out / f"samples_{tag}.npy")
    assert arr.shape == (3, 16, 16, 1)
    assert np.isfinite(arr).all()
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    assert (out / f"samples_{tag}.png").exists()


def test_sample_cli_requires_checkpoint(tmp_path):
    import sample as sample_cli

    with pytest.raises(FileNotFoundError):
        sample_cli.main([
            "--output_dir", str(tmp_path), "--model_name", "nope",
            "--model_type", "tiny", "--image_size", "16", "--is_grayscale", "1",
        ])
