#!/usr/bin/env python
"""Five-minute end-to-end demo on synthetic data — no downloads, any backend.

Generates a tiny in-distribution set (sine textures) and an OOD set
(checkerboards), then drives the four CLIs exactly as a real run would:

    train_ddpm.py  ->  reconstruct.py  ->  ood_detection.py

and prints the resulting AUCs (checkerboard-OOD should be ~100 even after two
epochs; flip-OOD needs real training). Use --backend=cpu (default: whatever
jax picks) to force CPU, e.g. on a machine whose TPU runtime is busy.

    python scripts/demo.py --workdir /tmp/ddpm_ood_demo [--backend cpu]
"""

from __future__ import annotations

import argparse
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SIZE = 16


def make_dataset(ws: pathlib.Path):
    import numpy as np

    from ddpm_ood_tpu.data.csv_splits import write_split_csv

    rng = np.random.default_rng(0)

    def sine(i):
        x = np.linspace(0, 2 * np.pi, SIZE)
        f = 1 + (i % 4)
        img = 0.5 + 0.45 * np.sin(f * x[None, :] + i) * np.cos(f * x[:, None])
        return (img + rng.normal(0, 0.02, (SIZE, SIZE))).astype(np.float32)[None]

    def checker(i):
        t = 2 + (i % 3)
        img = np.indices((SIZE, SIZE)).sum(0) // t % 2
        return (
            img.astype(np.float32)
            + rng.normal(0, 0.02, (SIZE, SIZE)).astype(np.float32)
        )[None]

    sets = [
        ("train", sine, 32),
        ("val", sine, 8),
        ("FashionMNIST_test", sine, 8),   # "in" set (registry-named)
        ("MNIST_test", checker, 8),       # structural OOD
    ]
    for name, gen, n in sets:
        d = ws / name
        d.mkdir(parents=True, exist_ok=True)
        paths = []
        for i in range(n):
            p = d / f"{name}_{i}.npy"
            np.save(p, gen(i + (100 if "test" in name else 0)))
            paths.append(str(p))
        write_split_csv(paths, str(ws / f"{name}.csv"))


def run(script: str, backend: str | None, *flags: str) -> None:
    """Run a CLI in a fresh interpreter (optionally pinned to a backend)."""
    pre = (
        f"import jax; jax.config.update('jax_platforms', {backend!r})\n"
        if backend
        else ""
    )
    code = (
        f"import sys; sys.path.insert(0, {str(REPO)!r})\n{pre}"
        "import runpy\n"
        f"sys.argv = [{script!r}] + {list(flags)!r}\n"
        f"runpy.run_path({str(REPO / script)!r}, run_name='__main__')\n"
    )
    print(f"== {script} {' '.join(flags[:4])} ...")
    subprocess.run([sys.executable, "-c", code], check=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ddpm_ood_demo")
    ap.add_argument("--backend", default=None, choices=(None, "cpu", "tpu"),
                    help="pin the jax platform (default: auto)")
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    ws = pathlib.Path(args.workdir)
    ws.mkdir(parents=True, exist_ok=True)
    make_dataset(ws)
    common = [
        f"--output_dir={ws}/output", "--model_name=demo_fashionmnist",
        f"--validation_ids={ws}/val.csv", f"--image_size={SIZE}",
        "--model_type=tiny", "--beta_schedule=scaled_linear_beta",
        "--beta_start=0.0015", "--beta_end=0.0195", "--batch_size=4",
        "--is_grayscale=1",
    ]
    run(
        "train_ddpm.py", args.backend, *common,
        f"--training_ids={ws}/train.csv", f"--n_epochs={args.epochs}",
        "--eval_freq=2", "--checkpoint_every=2",
    )
    run(
        "reconstruct.py", args.backend, *common,
        f"--in_ids={ws}/FashionMNIST_test.csv",
        f"--out_ids={ws}/MNIST_test.csv,"
        f"{ws}/FashionMNIST_test.csv_vflip,{ws}/FashionMNIST_test.csv_hflip",
        "--num_inference_steps=10", "--inference_skip_factor=3",
    )
    run(
        "ood_detection.py", args.backend,
        f"--output_dir={ws}/output", "--model_name=demo_fashionmnist",
    )
    print(f"\ndemo artifacts under {ws}/output/demo_fashionmnist/")


if __name__ == "__main__":
    main()
