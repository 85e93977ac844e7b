"""Data pipeline: CSV split format, transform chain, loader, partitioning."""

import numpy as np

from ddpm_ood_tpu.data.csv_splits import (
    get_data_dicts,
    partition_for_process,
    write_split_csv,
)
from ddpm_ood_tpu.data.loader import CachedDataset, DataLoader, get_training_data_loader
from ddpm_ood_tpu.data.nifti import load_nifti, save_nifti
from ddpm_ood_tpu.data.transforms import (
    TransformChain,
    center_spatial_crop,
    flip,
    resize,
    scale_intensity,
)


def _write_npys(tmp_path, n=6, shape=(1, 8, 8)):
    paths = []
    rng = np.random.default_rng(0)
    for i in range(n):
        p = tmp_path / f"img_{i}.npy"
        np.save(p, rng.uniform(size=shape).astype(np.float32))
        paths.append(str(p))
    return paths


def test_csv_single_row_roundtrip(tmp_path):
    paths = _write_npys(tmp_path)
    csv = tmp_path / "split.csv"
    write_split_csv(paths, str(csv))
    # single-row comma-separated (the reference's pandas-header quirk format)
    assert len(csv.read_text().strip().splitlines()) == 1
    dicts = get_data_dicts(str(csv))
    assert [d["image"] for d in dicts] == paths
    assert get_data_dicts(str(csv), first_n=3) == dicts[:3]


def test_partition_even_divisible_duplicates():
    data = [{"image": str(i)} for i in range(10)]
    parts = [partition_for_process(data, 4, i) for i in range(4)]
    # even_divisible pads by wrapping -> every rank has ceil(10/4)=3 items
    assert all(len(p) == 3 for p in parts)
    total = [d["image"] for p in parts for d in p]
    assert len(total) == 12 and len(set(total)) == 10  # 2 duplicates


def test_transform_chain_deterministic_and_scaled(tmp_path):
    paths = _write_npys(tmp_path, n=1, shape=(1, 12, 10))
    chain = TransformChain(spatial_dimension=2, image_size=8)
    a = chain(paths[0])
    b = chain(paths[0])
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 8, 8)
    assert a.min() == 0.0 and a.max() == 1.0  # min-max scaled


def test_center_crop_and_flip_semantics():
    x = np.arange(16, dtype=np.float32).reshape(1, 4, 4)
    c = center_spatial_crop(x, (2, 2))
    np.testing.assert_array_equal(c[0], [[5, 6], [9, 10]])
    c2 = center_spatial_crop(x, (-1, 2))  # -1 leaves the dim uncropped
    assert c2.shape == (1, 4, 2)
    v = flip(x, 0)  # vflip = spatial axis 0
    np.testing.assert_array_equal(v[0][0], x[0][-1])
    h = flip(x, 1)
    np.testing.assert_array_equal(h[0][:, 0], x[0][:, -1])


def test_resize_identity_and_interp():
    x = np.random.default_rng(0).uniform(size=(1, 8, 8)).astype(np.float32)
    assert resize(x, (8, 8)) is x
    y = resize(x, (4, 4))
    assert y.shape == (1, 4, 4)


def test_scale_intensity_constant_image():
    x = np.full((1, 4, 4), 7.0, dtype=np.float32)
    y = scale_intensity(x)
    assert y.min() == y.max() == 0.0


def test_loader_shuffle_and_last_batch(tmp_path):
    paths = _write_npys(tmp_path, n=5)
    chain = TransformChain(spatial_dimension=2)
    ds = CachedDataset([{"image": p} for p in paths], chain, cache=True, num_workers=2)
    dl = DataLoader(ds, batch_size=2, shuffle=True, seed=0)
    batches = list(dl)
    assert [b["image"].shape[0] for b in batches] == [2, 2, 1]
    # epoch advances the shuffle
    order1 = [f for b in batches for f in b["filename"]]
    order2 = [f for b in dl for f in b["filename"]]
    assert sorted(order1) == sorted(order2)
    assert order1 != order2  # different epoch seed (overwhelmingly likely)


def test_get_training_data_loader_only_val(tmp_path):
    paths = _write_npys(tmp_path, n=4)
    csv = tmp_path / "val.csv"
    write_split_csv(paths, str(csv))
    val = get_training_data_loader(
        batch_size=2, training_ids=str(csv), validation_ids=str(csv),
        only_val=True, num_workers=1, spatial_dimension=2,
    )
    batch = next(iter(val))
    assert batch["image"].shape == (2, 1, 8, 8)  # channel-first host layout


def test_nifti_roundtrip(tmp_path):
    vol = np.random.default_rng(0).uniform(size=(5, 6, 7)).astype(np.float32)
    p = tmp_path / "vol.nii.gz"
    save_nifti(str(p), vol)
    out = load_nifti(str(p))
    np.testing.assert_allclose(out, vol, rtol=1e-6)
    chain = TransformChain(spatial_dimension=3)
    img = chain(str(p))
    assert img.shape == (1, 5, 6, 7)
