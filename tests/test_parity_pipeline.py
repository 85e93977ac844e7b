"""Turnkey raw-archive -> AUROC integration test.

Crafted raw archives (FashionMNIST/MNIST IDX gz, CIFAR-10 python tarball) are
pushed through the REAL dataset-prep CLI (`get_computer_vision_datasets.main`,
with downloads stubbed out to prove the offline path), and the resulting split
CSVs through the real train -> reconstruct -> ood_detection CLI surfaces, down
to the persisted `ood/ood_scores_mse.csv` AUROC table.

This covers the full span of scripts/parity_run.sh except the download itself
(reference recipe README.md:61-120): the moment egress exists, real-dataset
parity is one command. In-distribution data is smooth sine textures and the
crafted "MNIST" archive holds coarse checkerboards, so even the 3-epoch tiny
model must separate them structurally (the demo.py task, as raw archives).
"""

from __future__ import annotations

import gzip
import io
import pickle
import struct
import tarfile
from pathlib import Path

import numpy as np
import pandas as pd
import pytest


def _idx_gz(path: Path, images: np.ndarray) -> None:
    n, rows, cols = images.shape
    payload = struct.pack(">IIII", 2051, n, rows, cols) + images.tobytes()
    path.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(path, "wb") as f:
        f.write(payload)


def _sine(i: int, size: int = 28) -> np.ndarray:
    x = np.linspace(0, 2 * np.pi, size)
    f = 1 + (i % 4)
    img = 0.5 + 0.45 * np.sin(f * x[None, :] + i) * np.cos(f * x[:, None])
    return np.clip(img * 255, 0, 255).astype(np.uint8)


def _checker(i: int, size: int = 28) -> np.ndarray:
    # block size 4: survives the 28->16 bilinear resize in the transform chain
    img = (np.indices((size, size)).sum(0) // 4 + i) % 2
    return (img * 255).astype(np.uint8)


def _cifar_tarball(path: Path, rng: np.random.Generator) -> None:
    """cifar-10-python.tar.gz with the exact member layout prep_cifar10 expects."""
    path.parent.mkdir(parents=True, exist_ok=True)
    with tarfile.open(path, "w:gz") as tf:
        for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
            batch = {
                b"data": rng.integers(0, 256, size=(2, 3072), dtype=np.uint8),
                b"labels": [0, 1],
            }
            blob = pickle.dumps(batch)
            info = tarfile.TarInfo(f"cifar-10-batches-py/{name}")
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))


def _color_checker(i: int, size: int = 32, block: int = 8) -> np.ndarray:
    """(size, size, 3) uint8 checkerboard; block size survives the 32->16
    bilinear resize in the scoring transform chain."""
    plane = ((np.indices((size, size)).sum(0) // block + i) % 2) * 255
    return np.stack([plane] * 3, axis=-1).astype(np.uint8)


def _svhn_mat(path: Path, images_hw3n: np.ndarray) -> None:
    """The cropped-digits .mat layout prep_svhn reads: X (32,32,3,N) uint8."""
    from scipy.io import savemat

    path.parent.mkdir(parents=True, exist_ok=True)
    n = images_hw3n.shape[-1]
    savemat(str(path), {
        "X": images_hw3n,
        "y": np.ones((n, 1), dtype=np.uint8),
    })


def _celeba_raw(raw: Path, n_train: int, n_valid: int, n_test: int) -> None:
    """img_align_celeba JPEG folder + list_eval_partition.txt, the exact
    layout prep_celeba reads (reference get_computer_vision_datasets.py:84)."""
    from PIL import Image

    img_dir = raw / "img_align_celeba"
    img_dir.mkdir(parents=True, exist_ok=True)
    lines = []
    idx = 0
    for part, count in ((0, n_train), (1, n_valid), (2, n_test)):
        for _ in range(count):
            fname = f"{idx + 1:06d}.jpg"
            # 64px block-16 checkerboard -> block 8 after CelebA's 32x32
            # resize -> block 4 after the scoring chain's 16x16 resize
            Image.fromarray(_color_checker(idx, size=64, block=16)).save(
                img_dir / fname, quality=95
            )
            lines.append(f"{fname} {part}")
            idx += 1
    (raw / "list_eval_partition.txt").write_text("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def prepped_data_root(tmp_path_factory):
    """Craft raw archives and run the real prep CLI offline."""
    import urllib.request

    from ddpm_ood_tpu.data import get_computer_vision_datasets as prep

    root = tmp_path_factory.mktemp("raw_archives")
    rng = np.random.default_rng(0)

    # FashionMNIST = in-distribution sines; MNIST = checkerboard OOD
    _idx_gz(root / "FashionMNIST" / "raw" / "train-images-idx3-ubyte.gz",
            np.stack([_sine(i) for i in range(48)]))
    _idx_gz(root / "FashionMNIST" / "raw" / "t10k-images-idx3-ubyte.gz",
            np.stack([_sine(100 + i) for i in range(8)]))
    _idx_gz(root / "MNIST" / "raw" / "train-images-idx3-ubyte.gz",
            np.stack([_checker(i) for i in range(4)]))
    _idx_gz(root / "MNIST" / "raw" / "t10k-images-idx3-ubyte.gz",
            np.stack([_checker(100 + i) for i in range(8)]))
    _cifar_tarball(root / "CIFAR10" / "raw" / "cifar-10-python.tar.gz", rng)
    # SVHN (.mat) and CelebA (jpeg folder + partition) also hold checkerboard
    # OOD content so the single integration test covers all five parsers
    _svhn_mat(
        root / "SVHN" / "raw" / "train_32x32.mat",
        np.stack([_color_checker(i) for i in range(4)], axis=-1),  # (32,32,3,N)
    )
    _svhn_mat(
        root / "SVHN" / "raw" / "test_32x32.mat",
        np.stack([_color_checker(100 + i) for i in range(8)], axis=-1),
    )
    _celeba_raw(root / "CelebA" / "raw", n_train=4, n_valid=2, n_test=8)

    # prove the prep CLI never needs egress when archives are pre-placed:
    # any attempted download is a hard failure for the present archives
    real_retrieve = urllib.request.urlretrieve

    def _no_egress(url, dest):
        raise OSError(f"egress disabled in test (tried {url})")

    urllib.request.urlretrieve = _no_egress
    try:
        prep.main(["--data_root", str(root)])
    finally:
        urllib.request.urlretrieve = real_retrieve
    return root


def test_prep_output_contract(prepped_data_root):
    root = prepped_data_root
    splits = root / "data_splits"
    for name in ("FashionMNIST_train", "FashionMNIST_val", "FashionMNIST_test",
                 "MNIST_test", "CIFAR10_train", "CIFAR10_test",
                 "SVHN_train", "SVHN_test", "CelebA_train", "CelebA_test"):
        csv = splits / f"{name}.csv"
        assert csv.exists(), csv
        text = csv.read_text().strip()
        assert "\n" not in text, "split CSVs are a single comma-separated row"
        paths = [p for p in text.split(",") if p]
        assert paths and all(Path(p).exists() for p in paths)
    # 95/5 split of the 48 crafted training images (seed 42)
    n_train = len((splits / "FashionMNIST_train.csv").read_text().split(","))
    n_val = len((splits / "FashionMNIST_val.csv").read_text().split(","))
    assert n_train + n_val == 48 and n_val == 3
    # per-image channel-first npy, pixel-exact round trip
    arr = np.load(root / "FashionMNIST" / "numpy" / "train" / "FashionMNIST_5.npy")
    np.testing.assert_array_equal(arr, _sine(5))
    cif = np.load(root / "CIFAR10" / "numpy" / "test" / "CIFAR10_0.npy")
    assert cif.shape == (3, 32, 32) and cif.dtype == np.uint8
    # SVHN: (32,32,3,N) .mat -> channel-first, pixel-exact
    svhn = np.load(root / "SVHN" / "numpy" / "test" / "SVHN_0.npy")
    assert svhn.shape == (3, 32, 32) and svhn.dtype == np.uint8
    np.testing.assert_array_equal(
        svhn, _color_checker(100).transpose(2, 0, 1)
    )
    # CelebA: jpeg -> 32x32 channel-first (lossy codec: structural check only)
    cel = np.load(root / "CelebA" / "numpy" / "test" / "CelebA_0.npy")
    assert cel.shape == (3, 32, 32) and cel.dtype == np.uint8
    assert cel.std() > 40, "checkerboard structure lost in CelebA prep"


def test_archives_to_auroc(prepped_data_root, tmp_path_factory):
    """Prep output -> train_ddpm -> reconstruct -> ood_detection, via the real
    CLI argv surfaces, ending at the persisted AUROC table."""
    from ddpm_ood_tpu.config import (
        parse_args_ood_detection,
        parse_args_reconstruct,
        parse_args_train_ddpm,
    )
    from ddpm_ood_tpu.ood import run_ood_detection
    from ddpm_ood_tpu.trainers import DDPMTrainer, Reconstruct

    root = prepped_data_root
    splits = root / "data_splits"
    out_root = tmp_path_factory.mktemp("parity_run")

    common = [
        f"--output_dir={out_root}", "--model_name=parity_fashionmnist",
        f"--validation_ids={splits}/FashionMNIST_val.csv", "--image_size=16",
        "--model_type=tiny", "--beta_schedule=scaled_linear_beta",
        "--beta_start=0.0015", "--beta_end=0.0195", "--batch_size=4",
        "--is_grayscale=1",
    ]
    targs = parse_args_train_ddpm(common + [
        f"--training_ids={splits}/FashionMNIST_train.csv",
        "--n_epochs=3", "--eval_freq=3", "--checkpoint_every=3",
    ])
    DDPMTrainer(targs).train(targs)
    run_dir = out_root / "parity_fashionmnist"
    assert (run_dir / "checkpoint").exists()

    rargs = parse_args_reconstruct(common + [
        f"--in_ids={splits}/FashionMNIST_test.csv",
        f"--out_ids={splits}/MNIST_test.csv,{splits}/SVHN_test.csv,"
        f"{splits}/CelebA_test.csv,"
        f"{splits}/FashionMNIST_test.csv_vflip,{splits}/FashionMNIST_test.csv_hflip",
        "--num_inference_steps=10", "--inference_skip_factor=3",
    ])
    Reconstruct(rargs).reconstruct(rargs)
    ood_dir = run_dir / "ood"
    for name in ("val", "in", "MNIST", "SVHN", "CelebA",
                 "FashionMNIST_vflip", "FashionMNIST_hflip"):
        assert (ood_dir / f"results_{name}.csv").exists()

    oargs = parse_args_ood_detection([
        f"--output_dir={out_root}", "--model_name=parity_fashionmnist",
    ])
    results = run_ood_detection(
        output_dir=oargs.output_dir, model_name=oargs.model_name,
        max_t=oargs.max_t, min_t=oargs.min_t, plot_target=oargs.plot_target,
        report=oargs.report,
    )

    # the persisted score table is the parity artifact parity_run.sh reads
    table = pd.read_csv(ood_dir / "ood_scores_mse.csv")
    assert set(table["ood_data"]) == {
        "MNIST", "FashionMNIST_vflip", "FashionMNIST_hflip"
    }
    aucs = dict(zip(results["ood_data"], results["Zscore_mse"]))
    assert set(aucs) == {"MNIST", "FashionMNIST_vflip", "FashionMNIST_hflip"}
    assert all(0.0 <= v <= 1.0 for v in aucs.values())
    # structural OOD (checkerboards) must separate even on the 3-epoch model
    assert aucs["MNIST"] >= 0.9, aucs
