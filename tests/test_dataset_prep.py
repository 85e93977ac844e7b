"""Fixture tests for the dataset-prep parsers: tiny synthetic raw archives
(IDX gz, CIFAR pickle batches, SVHN .mat, CelebA jpeg folder, MedNIST tar.gz,
Decathlon NIfTI tree, MedMNIST-3D npz) are crafted in-test and pushed through
the real prep code, asserting the reference's output contract — per-image
channel-first `.npy` files plus single-row comma-separated split CSVs
(reference src/data/get_computer_vision_datasets.py:84-117). No egress needed:
the prep scripts find the pre-placed raw files and skip downloading.
"""

import gzip
import pickle
import struct
import tarfile
from pathlib import Path

import numpy as np
import pytest

from ddpm_ood_tpu.data.csv_splits import get_data_dicts


def _idx_bytes(images: np.ndarray) -> bytes:
    n, rows, cols = images.shape
    return struct.pack(">IIII", 2051, n, rows, cols) + images.tobytes()


def _read_csv_paths(csv_path: Path):
    assert csv_path.exists(), csv_path
    text = csv_path.read_text()
    assert "\n" not in text.strip(), "split CSVs are a single row"
    return [p for p in text.strip().split(",") if p]


def test_mnist_idx_prep(tmp_path):
    from ddpm_ood_tpu.data.get_computer_vision_datasets import (
        create_train_test_splits,
        prep_mnist_like,
    )

    rng = np.random.default_rng(0)
    train = rng.integers(0, 256, size=(40, 28, 28), dtype=np.uint8)
    test = rng.integers(0, 256, size=(10, 28, 28), dtype=np.uint8)
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    with gzip.open(raw / "train-images-idx3-ubyte.gz", "wb") as f:
        f.write(_idx_bytes(train))
    with gzip.open(raw / "t10k-images-idx3-ubyte.gz", "wb") as f:
        f.write(_idx_bytes(test))

    prep_mnist_like(tmp_path, "MNIST")
    out = tmp_path / "MNIST" / "numpy"
    assert len(list((out / "train").glob("*.npy"))) == 40
    assert len(list((out / "test").glob("*.npy"))) == 10
    # pixel-exact round trip of a known image
    arr = np.load(out / "train" / "MNIST_7.npy")
    np.testing.assert_array_equal(arr, train[7])
    assert arr.dtype == np.uint8 and arr.shape == (28, 28)

    create_train_test_splits(tmp_path)
    splits = tmp_path / "data_splits"
    train_paths = _read_csv_paths(splits / "MNIST_train.csv")
    val_paths = _read_csv_paths(splits / "MNIST_val.csv")
    test_paths = _read_csv_paths(splits / "MNIST_test.csv")
    assert len(train_paths) == 38 and len(val_paths) == 2  # 95/5 of 40
    assert len(test_paths) == 10
    assert not set(train_paths) & set(val_paths)
    # the loader-facing contract: get_data_dicts reads the single-row format
    assert len(get_data_dicts(str(splits / "MNIST_train.csv"))) == 38
    # 95/5 split is seeded (seed 42): re-running must reproduce it exactly
    create_train_test_splits(tmp_path)
    assert _read_csv_paths(splits / "MNIST_val.csv") == val_paths


def test_cifar10_pickle_prep(tmp_path):
    from ddpm_ood_tpu.data.get_computer_vision_datasets import prep_cifar10

    rng = np.random.default_rng(1)
    extracted = tmp_path / "CIFAR10" / "raw" / "cifar-10-batches-py"
    extracted.mkdir(parents=True)
    batches = {}
    for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        data = rng.integers(0, 256, size=(4, 3072), dtype=np.uint8)
        batches[name] = data
        with open(extracted / name, "wb") as f:
            pickle.dump({b"data": data, b"labels": [0] * 4}, f)

    prep_cifar10(tmp_path)
    out = tmp_path / "CIFAR10" / "numpy"
    assert len(list((out / "train").glob("*.npy"))) == 20  # 5 batches x 4
    assert len(list((out / "test").glob("*.npy"))) == 4
    # CIFAR pickles are already CHW-flattened; image 5 = batch_2 image 1
    arr = np.load(out / "train" / "CIFAR10_5.npy")
    np.testing.assert_array_equal(arr, batches["data_batch_2"][1].reshape(3, 32, 32))


def test_svhn_mat_prep(tmp_path):
    from scipy.io import savemat

    from ddpm_ood_tpu.data.get_computer_vision_datasets import prep_svhn

    rng = np.random.default_rng(2)
    raw = tmp_path / "SVHN" / "raw"
    raw.mkdir(parents=True)
    X_train = rng.integers(0, 256, size=(32, 32, 3, 5), dtype=np.uint8)
    X_test = rng.integers(0, 256, size=(32, 32, 3, 2), dtype=np.uint8)
    savemat(raw / "train_32x32.mat", {"X": X_train, "y": np.ones((5, 1))})
    savemat(raw / "test_32x32.mat", {"X": X_test, "y": np.ones((2, 1))})

    prep_svhn(tmp_path)
    out = tmp_path / "SVHN" / "numpy"
    assert len(list((out / "train").glob("*.npy"))) == 5
    arr = np.load(out / "train" / "SVHN_3.npy")
    assert arr.shape == (3, 32, 32)
    # HWCN -> NCHW transpose must be exact: arr[c, h, w] == X[h, w, c, n]
    np.testing.assert_array_equal(arr, np.transpose(X_train[..., 3], (2, 0, 1)))


def test_celeba_prep(tmp_path):
    Image = pytest.importorskip("PIL.Image")

    from ddpm_ood_tpu.data.get_computer_vision_datasets import (
        create_train_test_splits,
        prep_celeba,
    )

    raw = tmp_path / "CelebA" / "raw"
    img_dir = raw / "img_align_celeba"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(3)
    names, parts = [], []
    for i, part in enumerate([0, 0, 1, 2]):  # 2 train, 1 valid, 1 test
        name = f"{i:06d}.jpg"
        Image.fromarray(
            rng.integers(0, 256, size=(218, 178, 3), dtype=np.uint8)
        ).save(img_dir / name)
        names.append(name)
        parts.append(part)
    with open(raw / "list_eval_partition.txt", "w") as f:
        f.writelines(f"{n} {p}\n" for n, p in zip(names, parts))

    prep_celeba(tmp_path)
    out = tmp_path / "CelebA" / "numpy"
    assert len(list((out / "train").glob("*.npy"))) == 2
    assert len(list((out / "valid").glob("*.npy"))) == 1
    assert len(list((out / "test").glob("*.npy"))) == 1
    arr = np.load(out / "train" / "CelebA_0.npy")
    assert arr.shape == (3, 32, 32) and arr.dtype == np.uint8  # resized, CHW

    create_train_test_splits(tmp_path)
    splits = tmp_path / "data_splits"
    assert len(_read_csv_paths(splits / "CelebA_train.csv")) == 2
    assert len(_read_csv_paths(splits / "CelebA_val.csv")) == 1
    assert len(_read_csv_paths(splits / "CelebA_test.csv")) == 1


def test_mednist_targz_prep(tmp_path):
    from ddpm_ood_tpu.data.get_mednist_datasets import CLASSES, download_data

    # build a MedNIST.tar.gz with the six class folders (extraction path)
    src = tmp_path / "stage" / "MedNIST"
    for cls in CLASSES:
        d = src / cls
        d.mkdir(parents=True)
        for i in range(30):
            (d / f"{i:06d}.jpeg").write_bytes(b"\xff\xd8fake")
    with tarfile.open(tmp_path / "MedNIST.tar.gz", "w:gz") as tf:
        tf.add(src, arcname="MedNIST")

    download_data(str(tmp_path))
    splits = tmp_path / "data_splits"
    for cls in CLASSES:
        train = _read_csv_paths(splits / f"{cls}_train.csv")
        val = _read_csv_paths(splits / f"{cls}_val.csv")
        test = _read_csv_paths(splits / f"{cls}_test.csv")
        assert len(train) + len(val) + len(test) == 30
        assert len(train) > len(val) and len(train) > len(test)  # ~80/10/10
        assert not set(train) & set(val) and not set(train) & set(test)

    # the split is seeded -> identical on re-run (resume safety)
    before = _read_csv_paths(splits / "HeadCT_val.csv")
    download_data(str(tmp_path))
    assert _read_csv_paths(splits / "HeadCT_val.csv") == before


def test_decathlon_prep(tmp_path):
    from ddpm_ood_tpu.data.get_decathlon_datasets import download_data
    from ddpm_ood_tpu.data.nifti import save_nifti

    images = tmp_path / "Task09_Spleen" / "imagesTr"
    images.mkdir(parents=True)
    rng = np.random.default_rng(4)
    for i in range(25):
        save_nifti(
            str(images / f"spleen_{i}.nii.gz"),
            rng.uniform(size=(4, 4, 4)).astype(np.float32),
        )
    # macOS resource-fork junk must be filtered (real MSD tars contain these)
    (images / "._spleen_0.nii.gz").write_bytes(b"junk")

    download_data(str(tmp_path), tasks=["Task09"])
    splits = tmp_path / "data_splits"
    train = _read_csv_paths(splits / "Decathlon_Task09_train.csv")
    val = _read_csv_paths(splits / "Decathlon_Task09_val.csv")
    test = _read_csv_paths(splits / "Decathlon_Task09_test.csv")
    assert len(train) + len(val) + len(test) == 25
    assert all("._" not in Path(p).name for p in train + val + test)
    # paths must be loadable by the pipeline's own NIfTI reader
    from ddpm_ood_tpu.data.nifti import load_nifti

    vol = load_nifti(train[0])
    assert vol.shape == (4, 4, 4)


def test_3dmedmnist_prep(tmp_path):
    from ddpm_ood_tpu.data.get_3dmedmnist import download_data

    rng = np.random.default_rng(5)
    arrays = {
        f"{split}_images": rng.integers(
            0, 256, size=(n, 28, 28, 28), dtype=np.uint8
        )
        for split, n in (("train", 6), ("val", 2), ("test", 2))
    }
    arrays.update(
        {f"{s}_labels": np.zeros((n, 1)) for s, n in
         (("train", 6), ("val", 2), ("test", 2))}
    )
    np.savez(tmp_path / "organmnist3d.npz", **arrays)

    download_data(str(tmp_path), tasks=["organmnist3d"])
    out = tmp_path / "organmnist3d" / "numpy"
    assert len(list((out / "train").glob("*.npy"))) == 6
    arr = np.load(out / "train" / "organmnist3d_4.npy")
    np.testing.assert_array_equal(arr, arrays["train_images"][4])
    splits = tmp_path / "data_splits"
    for split, n in (("train", 6), ("val", 2), ("test", 2)):
        assert len(_read_csv_paths(splits / f"organmnist3d_{split}.csv")) == n


# ---- negative / edge-case coverage (archive corruption, raw-vs-gz, partition) --


def test_idx_truncated_payload_raises(tmp_path):
    """A truncated download must fail with a NAMED error, not silently parse
    fewer/garbled images (the classic interrupted-fetch failure)."""
    from ddpm_ood_tpu.data.get_computer_vision_datasets import _read_idx_images

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, size=(10, 28, 28), dtype=np.uint8)
    p = tmp_path / "train-images-idx3-ubyte"
    p.write_bytes(_idx_bytes(imgs)[: 16 + 5 * 28 * 28 + 100])  # half the data
    with pytest.raises(ValueError, match="truncated IDX file"):
        _read_idx_images(p)
    # truncated even before the header completes
    p.write_bytes(b"\x00\x00\x08")
    with pytest.raises(ValueError, match="truncated IDX header"):
        _read_idx_images(p)


def test_idx_bad_magic_raises(tmp_path):
    from ddpm_ood_tpu.data.get_computer_vision_datasets import _read_idx_images

    p = tmp_path / "t10k-images-idx3-ubyte"
    p.write_bytes(struct.pack(">IIII", 2049, 1, 28, 28) + b"\x00" * 784)
    with pytest.raises(ValueError, match="bad IDX magic 2049"):
        _read_idx_images(p)


def test_idx_raw_equals_gzipped(tmp_path):
    """The parser accepts both the .gz archive and a pre-decompressed raw file
    (mirrors torchvision's behavior users expect when hand-placing files) and
    yields identical pixels; a raw file misnamed .gz fails as gzip, loudly."""
    from ddpm_ood_tpu.data.get_computer_vision_datasets import _read_idx_images

    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, size=(4, 28, 28), dtype=np.uint8)
    raw_p = tmp_path / "train-images-idx3-ubyte"
    gz_p = tmp_path / "imgs.gz"
    raw_p.write_bytes(_idx_bytes(imgs))
    with gzip.open(gz_p, "wb") as f:
        f.write(_idx_bytes(imgs))
    np.testing.assert_array_equal(_read_idx_images(raw_p), _read_idx_images(gz_p))

    fake_gz = tmp_path / "not-actually.gz"
    fake_gz.write_bytes(_idx_bytes(imgs))  # raw bytes under a .gz name
    with pytest.raises(gzip.BadGzipFile):
        _read_idx_images(fake_gz)


def test_cifar_truncated_pickle_raises(tmp_path):
    import pickle

    from ddpm_ood_tpu.data.get_computer_vision_datasets import prep_cifar10

    extracted = tmp_path / "CIFAR10" / "raw" / "cifar-10-batches-py"
    extracted.mkdir(parents=True)
    payload = pickle.dumps(
        {b"data": np.zeros((2, 3072), np.uint8)}, protocol=2
    )
    for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        (extracted / name).write_bytes(payload[: len(payload) // 2])
    with pytest.raises(Exception) as exc_info:
        prep_cifar10(tmp_path)
    assert isinstance(
        exc_info.value, (pickle.UnpicklingError, EOFError)
    ), exc_info.value


def test_partition_edge_cases():
    """even_divisible wrap semantics at the edges the loaders actually hit:
    fewer items than processes, exact division, and determinism."""
    from ddpm_ood_tpu.data.csv_splits import partition_for_process

    data = [{"image": f"i{i}"} for i in range(3)]
    # 3 items over 4 processes: every process still gets >= 1 item (wrapped)
    parts = [partition_for_process(data, 4, p) for p in range(4)]
    assert all(len(x) == 1 for x in parts)
    covered = {d["image"] for part in parts for d in part}
    assert covered == {"i0", "i1", "i2"}  # wrap duplicates, never drops

    # exact division: a clean partition of everything, no duplicates
    data8 = [{"image": f"i{i}"} for i in range(8)]
    parts = [partition_for_process(data8, 4, p) for p in range(4)]
    assert [len(x) for x in parts] == [2, 2, 2, 2]
    flat = [d["image"] for part in parts for d in part]
    assert sorted(flat) == sorted(x["image"] for x in data8)

    # deterministic across calls (same seed -> same shards on every process)
    again = [partition_for_process(data8, 4, p) for p in range(4)]
    assert parts == again

    # single process: identity, order untouched
    assert partition_for_process(data8, 1, 0) == data8
