#!/usr/bin/env python
"""Self-contained quality harness: train -> reconstruct -> OOD AUROC on
synthetic data, printed as one JSON line.

Real-dataset AUROC parity (FashionMNIST vs MNIST/SVHN/CIFAR10, BASELINE.md)
needs the datasets, which require network egress to download; this harness is
the hermetic stand-in: in-distribution smooth sinusoid textures vs OOD
checkerboards, scored through the full four-stage pipeline (the same code path
real datasets take). A healthy build separates them with AUROC ~1.0 after a
couple hundred steps.

Usage: python scripts/quality_check.py [--epochs 40] [--size 16] [--workdir DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_dataset(root: Path, name: str, n: int, size: int, rng, ood: bool = False):
    from ddpm_ood_tpu.data.csv_splits import write_split_csv

    d = root / name
    d.mkdir(parents=True, exist_ok=True)
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    paths = []
    for i in range(n):
        if ood:
            img = ((xx + yy + i) % 2).astype(np.float32)[None]
        else:
            phase = rng.uniform(0, 2 * np.pi)
            freq = rng.choice([1.0, 2.0])
            img = (0.5 + 0.5 * np.sin(2 * np.pi * freq * (xx + yy) / size + phase)
                   ).astype(np.float32)[None]
        p = d / f"{name}_{i}.npy"
        np.save(p, img)
        paths.append(str(p))
    csv = root / f"{name}.csv"
    write_split_csv(paths, str(csv))
    return str(csv)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--size", type=int, default=16)
    parser.add_argument("--n_train", type=int, default=32)
    parser.add_argument("--steps", type=int, default=10,
                        help="num_inference_steps (headline config: 100)")
    parser.add_argument("--skip", type=int, default=2,
                        help="inference_skip_factor (headline config: 4)")
    parser.add_argument("--workdir", default=None)
    args = parser.parse_args()

    from ddpm_ood_tpu.ood import compute_ood_scores
    from ddpm_ood_tpu.trainers import DDPMTrainer, Reconstruct

    root = Path(args.workdir) if args.workdir else Path(tempfile.mkdtemp())
    rng = np.random.default_rng(0)
    train_csv = make_dataset(root, "train", args.n_train, args.size, rng)
    val_csv = make_dataset(root, "val", 8, args.size, rng)
    in_csv = make_dataset(root, "inset", 8, args.size, rng)
    out_csv = make_dataset(root, "outset", 8, args.size, rng, ood=True)

    ns = argparse.Namespace(
        seed=2, output_dir=str(root / "output"), model_name="quality_fashionmnist",
        training_ids=train_csv, validation_ids=val_csv, spatial_dimension=2,
        image_size=args.size, image_roi=None, latent_pad=None, vqvae_checkpoint=None,
        prediction_type="epsilon", model_type="tiny",
        beta_schedule="scaled_linear_beta", beta_start=0.0015, beta_end=0.0195,
        b_scale=1.0, snr_shift=1, simplex_noise=0, batch_size=8,
        n_epochs=args.epochs, eval_freq=10**9, augmentation=0, num_workers=2,
        cache_data=1, checkpoint_every=10**9, ddpm_checkpoint_epoch=None,
        is_grayscale=1, quick_test=0, profile_dir=None,
    )
    trainer = DDPMTrainer(ns)
    trainer.train(ns)

    rargs = argparse.Namespace(**vars(ns))
    rargs.in_ids = in_csv
    rargs.out_ids = out_csv
    rargs.first_n = None
    rargs.first_n_val = None
    rargs.run_val, rargs.run_in, rargs.run_out = 1, 1, 1
    rargs.num_inference_steps = args.steps
    rargs.inference_skip_factor = args.skip
    rargs.drop_last = False
    rargs.eval_checkpoint = None
    rargs.sampler = "plms"
    recon = Reconstruct(rargs)
    recon.reconstruct(rargs)

    import pandas as pd

    out_dir = Path(ns.output_dir) / ns.model_name / "ood"
    scored = compute_ood_scores(
        pd.read_csv(out_dir / "results_val.csv"),
        pd.read_csv(out_dir / "results_in.csv"),
        pd.read_csv(out_dir / "results_outset.csv"),
    )
    print(json.dumps({
        "metric": "synthetic_ood_auroc",
        "value": round(scored["auroc"], 4),
        "unit": "AUROC (sinusoids vs checkerboards, tiny 2D DDPM)",
        "vs_baseline": round(scored["auroc"] / 1.0, 4),
    }))


if __name__ == "__main__":
    main()
