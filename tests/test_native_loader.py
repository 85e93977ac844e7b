"""Native C++ data-loading core (csrc/dataload.cpp) vs the Python TransformChain.

The native path must be numerically interchangeable with the pure-Python
pipeline (itself the parity port of the reference MONAI chain,
reference src/data/get_train_and_val_dataloader.py:67-85): bit-exact when no
resize is involved, and within float tolerance through the linear resize
(double-accumulate in both implementations, but summation order may differ).
"""

import gzip
import struct

import numpy as np
import pytest

from ddpm_ood_tpu.data import _native
from ddpm_ood_tpu.data.loader import CachedDataset
from ddpm_ood_tpu.data.nifti import save_nifti
from ddpm_ood_tpu.data.transforms import TransformChain

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native loader unavailable (no g++?)"
)


def _check(path, chain, exact=False):
    ref = chain(str(path))
    got = _native.transform_item(str(path), chain)
    assert got.shape == ref.shape
    assert got.dtype == np.float32
    if exact:
        np.testing.assert_array_equal(got, ref)
    else:
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    return got


class TestItemParity:
    def test_npy_f32_chw_no_resize_bitexact(self, tmp_path):
        rng = np.random.default_rng(0)
        p = tmp_path / "a.npy"
        np.save(p, rng.random((1, 28, 28), dtype=np.float32))
        _check(p, TransformChain(spatial_dimension=2), exact=True)

    def test_npy_uint8_hw(self, tmp_path):
        rng = np.random.default_rng(1)
        p = tmp_path / "b.npy"
        np.save(p, rng.integers(0, 256, (28, 28), dtype=np.uint8))
        _check(p, TransformChain(spatial_dimension=2), exact=True)

    def test_npy_resize(self, tmp_path):
        rng = np.random.default_rng(2)
        p = tmp_path / "c.npy"
        np.save(p, rng.random((1, 28, 28), dtype=np.float32))
        got = _check(p, TransformChain(spatial_dimension=2, image_size=32))
        assert got.shape == (1, 32, 32)

    def test_npy_channel_last_rgb(self, tmp_path):
        rng = np.random.default_rng(3)
        p = tmp_path / "d.npy"
        # HWC rgb raster: shape[-1]=3 channel-like, shape[0]=28 not
        np.save(p, rng.random((28, 28, 3)).astype(np.float32))
        got = _check(p, TransformChain(spatial_dimension=2), exact=True)
        assert got.shape == (3, 28, 28)

    def test_npy_grayscale_selects_channel0(self, tmp_path):
        rng = np.random.default_rng(4)
        p = tmp_path / "e.npy"
        np.save(p, rng.random((3, 16, 16)).astype(np.float32))
        got = _check(p, TransformChain(spatial_dimension=2, is_grayscale=True), exact=True)
        assert got.shape == (1, 16, 16)

    @pytest.mark.parametrize("dtype", [np.float64, np.int16, np.uint16, np.int32, np.int64])
    def test_npy_dtypes(self, tmp_path, dtype):
        rng = np.random.default_rng(5)
        p = tmp_path / "f.npy"
        np.save(p, (rng.random((1, 12, 12)) * 100).astype(dtype))
        _check(p, TransformChain(spatial_dimension=2), exact=True)

    def test_npy_fortran_order(self, tmp_path):
        rng = np.random.default_rng(6)
        p = tmp_path / "g.npy"
        np.save(p, np.asfortranarray(rng.random((2, 9, 11)).astype(np.float32)))
        _check(p, TransformChain(spatial_dimension=2), exact=True)

    def test_npy_big_endian(self, tmp_path):
        rng = np.random.default_rng(7)
        p = tmp_path / "h.npy"
        np.save(p, rng.random((1, 8, 8)).astype(">f4"))
        _check(p, TransformChain(spatial_dimension=2), exact=True)

    def test_flips(self, tmp_path):
        rng = np.random.default_rng(8)
        p = tmp_path / "i.npy"
        np.save(p, rng.random((1, 10, 12)).astype(np.float32))
        _check(p, TransformChain(spatial_dimension=2, add_vflip=True), exact=True)
        _check(p, TransformChain(spatial_dimension=2, add_hflip=True), exact=True)
        _check(
            p, TransformChain(spatial_dimension=2, add_vflip=True, add_hflip=True),
            exact=True,
        )

    def test_constant_image_scales_to_zero(self, tmp_path):
        p = tmp_path / "j.npy"
        np.save(p, np.full((1, 6, 6), 3.5, dtype=np.float32))
        got = _check(p, TransformChain(spatial_dimension=2), exact=True)
        assert np.all(got == 0.0)

    def test_nan_voxels_poison_like_numpy(self, tmp_path):
        # NumPy min/max propagate NaN, so one NaN voxel makes the whole scaled
        # image NaN — the native path must match, not silently skip NaNs
        arr = np.random.default_rng(50).random((1, 6, 6)).astype(np.float32)
        arr[0, 2, 3] = np.nan
        p = tmp_path / "nan.npy"
        np.save(p, arr)
        chain = TransformChain(spatial_dimension=2)
        ref = chain(str(p))
        got = _native.transform_item(str(p), chain)
        assert np.isnan(ref).all() and np.isnan(got).all()

    def test_nifti_3d_roundtrip(self, tmp_path):
        rng = np.random.default_rng(9)
        p = tmp_path / "v.nii.gz"
        save_nifti(p, rng.random((14, 12, 10)).astype(np.float32))
        _check(p, TransformChain(spatial_dimension=3), exact=True)

    def test_nifti_multimodal_grayscale_roi_resize(self, tmp_path):
        rng = np.random.default_rng(10)
        p = tmp_path / "w.nii.gz"
        # (X, Y, Z, T): 4-modality BraTS-style volume
        save_nifti(p, rng.random((18, 16, 14, 4)).astype(np.float32))
        chain = TransformChain(
            spatial_dimension=3, is_grayscale=True, image_roi=[12, 12, 10], image_size=8
        )
        got = _check(p, chain)
        assert got.shape == (1, 8, 8, 8)

    def test_nifti_scl_slope_inter(self, tmp_path):
        rng = np.random.default_rng(11)
        arr = (rng.random((6, 5, 4)) * 50).astype(np.float32)
        p = tmp_path / "s.nii"
        save_nifti(p, arr)
        # rewrite scl_slope/inter in the header (offsets 112/116)
        raw = bytearray(p.read_bytes())
        struct.pack_into("<f", raw, 112, 2.0)
        struct.pack_into("<f", raw, 116, -1.0)
        p.write_bytes(bytes(raw))
        _check(p, TransformChain(spatial_dimension=3), exact=True)

    def test_nifti_uncompressed(self, tmp_path):
        rng = np.random.default_rng(12)
        p = tmp_path / "u.nii"
        save_nifti(p, rng.random((7, 6, 5)).astype(np.float32))
        _check(p, TransformChain(spatial_dimension=3), exact=True)

    def test_nifti_multimember_gzip(self, tmp_path):
        # bgzip-style concatenated gzip members: Python's gzip reads them
        # transparently; the native inflate must too (inflateReset per member)
        rng = np.random.default_rng(15)
        plain = tmp_path / "m.nii"
        save_nifti(plain, rng.random((10, 9, 8)).astype(np.float32))
        raw = plain.read_bytes()
        third = len(raw) // 3
        p = tmp_path / "m.nii.gz"
        p.write_bytes(
            gzip.compress(raw[:third])
            + gzip.compress(raw[third : 2 * third])
            + gzip.compress(raw[2 * third :])
        )
        _check(p, TransformChain(spatial_dimension=3), exact=True)

    def test_roi_none_and_oversize_entries(self, tmp_path):
        rng = np.random.default_rng(13)
        p = tmp_path / "r.npy"
        np.save(p, rng.random((1, 20, 24)).astype(np.float32))
        chain = TransformChain(spatial_dimension=2, image_roi=[16, 999])
        got = _check(p, chain, exact=True)
        assert got.shape == (1, 16, 24)
        chain2 = TransformChain(spatial_dimension=2, image_roi=[None, 10])
        got2 = _check(p, chain2, exact=True)
        assert got2.shape == (1, 20, 10)

    def test_resize_parity_3d(self, tmp_path):
        rng = np.random.default_rng(14)
        p = tmp_path / "z.npy"
        np.save(p, rng.random((1, 9, 11, 13)).astype(np.float32))
        got = _check(p, TransformChain(spatial_dimension=3, image_size=16))
        assert got.shape == (1, 16, 16, 16)


class TestNpyFuzz:
    """Property test: the C++ npy decoder agrees with np.load across random
    dtype/shape/order/endianness combinations (seeded, deterministic)."""

    def test_random_npy_roundtrips(self, tmp_path):
        rng = np.random.default_rng(1234)
        dtypes = ["<f4", "<f8", "|u1", "|i1", "<i2", "<u2", "<i4", "<u4",
                  "<i8", ">f4", ">i2", ">u2", ">f8", ">i4"]
        for case in range(60):
            sdim = int(rng.integers(2, 4))
            # rank S (spatial only) or S+1 (with channel axis)
            if rng.random() < 0.5:
                shape = tuple(int(s) for s in rng.integers(1, 9, sdim))
            else:
                c = int(rng.choice([1, 3, 4]))
                shape = (c,) + tuple(int(s) for s in rng.integers(5, 9, sdim))
            dt = np.dtype(str(rng.choice(dtypes)))
            if dt.kind == "f":
                arr = (rng.random(shape) * 100 - 50).astype(dt)
            else:
                info = np.iinfo(dt)
                lo, hi = max(info.min, -1000), min(info.max, 1000)
                arr = rng.integers(lo, hi + 1, shape).astype(dt)
            if rng.random() < 0.3:
                arr = np.asfortranarray(arr)
            p = tmp_path / f"fuzz_{case}.npy"
            np.save(p, arr)
            chain = TransformChain(spatial_dimension=sdim)
            ref = chain(str(p))
            got = _native.transform_item(str(p), chain)
            assert got.shape == ref.shape, (case, shape, dt)
            np.testing.assert_array_equal(got, ref, err_msg=f"case {case} {shape} {dt}")


class TestErrors:
    def test_missing_file(self):
        with pytest.raises(_native.NativeLoaderError):
            _native.transform_item("/nonexistent/x.npy", TransformChain(spatial_dimension=2))

    def test_garbage_npy(self, tmp_path):
        p = tmp_path / "bad.npy"
        p.write_bytes(b"not an npy file at all")
        with pytest.raises(_native.NativeLoaderError):
            _native.transform_item(str(p), TransformChain(spatial_dimension=2))

    def test_truncated_nifti(self, tmp_path):
        p = tmp_path / "bad.nii.gz"
        with gzip.open(p, "wb") as f:
            f.write(b"\x00" * 100)
        with pytest.raises(_native.NativeLoaderError):
            _native.transform_item(str(p), TransformChain(spatial_dimension=3))

    def test_rank_mismatch(self, tmp_path):
        p = tmp_path / "r4.npy"
        np.save(p, np.zeros((2, 3, 4, 5), dtype=np.float32))
        with pytest.raises(_native.NativeLoaderError):
            # rank 4 against spatial_dimension=2 is neither S nor S+1
            _native.transform_item(str(p), TransformChain(spatial_dimension=2))

    def test_hostile_shape_header_errors_not_aborts(self, tmp_path):
        # a header claiming (2e9, 2e9) must return an error code, not wrap
        # int64 past the size check and std::terminate on vector::resize
        p = tmp_path / "huge.npy"
        np.save(p, np.zeros((2, 2), dtype=np.float32))
        raw = bytearray(p.read_bytes())
        hdr = raw[10 : 10 + (raw[8] | (raw[9] << 8))].decode()
        hdr2 = hdr.replace("(2, 2)", "(2000000000, 2000000000)")
        raw[10 : 10 + len(hdr)] = hdr2.encode()
        p.write_bytes(bytes(raw))
        with pytest.raises(_native.NativeLoaderError):
            _native.transform_item(str(p), TransformChain(spatial_dimension=2))

    def test_truncated_plain_nifti_errors(self, tmp_path):
        p = tmp_path / "short.nii"
        p.write_bytes(b"\x00" * 100)  # shorter than the 348-byte header
        with pytest.raises(_native.NativeLoaderError):
            _native.transform_item(str(p), TransformChain(spatial_dimension=3))

    def test_unsupported_suffix_rejected(self, tmp_path):
        p = tmp_path / "x.png"
        p.write_bytes(b"\x89PNG")
        assert not _native.supports(str(p))
        with pytest.raises(_native.NativeLoaderError):
            _native.transform_item(str(p), TransformChain(spatial_dimension=2))


class TestBatch:
    def test_batch_matches_items(self, tmp_path):
        rng = np.random.default_rng(20)
        paths = []
        for i in range(7):
            p = tmp_path / f"{i}.npy"
            np.save(p, rng.random((1, 14, 14), dtype=np.float32))
            paths.append(str(p))
        chain = TransformChain(spatial_dimension=2, image_size=16)
        batch, errs = _native.transform_batch(paths, chain, num_threads=4)
        assert np.all(errs == 0)
        for i, p in enumerate(paths):
            np.testing.assert_array_equal(batch[i], _native.transform_item(p, chain))

    def test_batch_flags_bad_item(self, tmp_path):
        rng = np.random.default_rng(21)
        good = tmp_path / "good.npy"
        np.save(good, rng.random((1, 10, 10), dtype=np.float32))
        bad = tmp_path / "bad.npy"
        bad.write_bytes(b"nope")
        odd = tmp_path / "odd.npy"  # decodes, but a different shape
        np.save(odd, rng.random((1, 9, 9), dtype=np.float32))
        chain = TransformChain(spatial_dimension=2)
        batch, errs = _native.transform_batch(
            [str(good), str(bad), str(odd)], chain, num_threads=2
        )
        assert errs[0] == 0 and errs[1] != 0 and errs[2] != 0
        np.testing.assert_array_equal(batch[0], _native.transform_item(str(good), chain))


class TestLoaderIntegration:
    def _make_dataset(self, tmp_path, n=5):
        rng = np.random.default_rng(30)
        dicts = []
        for i in range(n):
            p = tmp_path / f"{i}.npy"
            np.save(p, rng.random((1, 12, 12), dtype=np.float32))
            dicts.append({"image": str(p)})
        return dicts

    def test_cached_dataset_native_equals_python(self, tmp_path, monkeypatch):
        dicts = self._make_dataset(tmp_path)
        chain = TransformChain(spatial_dimension=2, image_size=16)
        ds_native = CachedDataset(dicts, chain, cache=True, num_workers=2)
        monkeypatch.setenv("DDPM_OOD_TPU_NATIVE_LOADER", "0")
        monkeypatch.setattr(_native, "_lib", None)
        monkeypatch.setattr(_native, "_build_failed", False)
        ds_python = CachedDataset(dicts, chain, cache=True, num_workers=2)
        for i in range(len(dicts)):
            np.testing.assert_allclose(
                ds_native[i]["image"], ds_python[i]["image"], rtol=1e-5, atol=1e-6
            )
        monkeypatch.undo()
        monkeypatch.setattr(_native, "_lib", None)

    def test_cached_dataset_mixed_fallback(self, tmp_path):
        # one bad file in the batch: native flags it, Python path raises on it
        dicts = self._make_dataset(tmp_path, n=3)
        odd = tmp_path / "odd.npy"  # different shape -> per-item fallback
        np.save(odd, np.random.default_rng(31).random((1, 8, 8), dtype=np.float32))
        dicts.append({"image": str(odd)})
        chain = TransformChain(spatial_dimension=2)  # no resize: shapes differ
        ds = CachedDataset(dicts, chain, cache=True, num_workers=2)
        assert ds[0]["image"].shape == (1, 12, 12)
        assert ds[3]["image"].shape == (1, 8, 8)

    def test_lazy_getitem_uses_native(self, tmp_path):
        dicts = self._make_dataset(tmp_path, n=2)
        chain = TransformChain(spatial_dimension=2)
        ds = CachedDataset(dicts, chain, cache=False)
        np.testing.assert_array_equal(ds[0]["image"], chain(dicts[0]["image"]))

    def test_uncached_loader_batches_match_cached(self, tmp_path):
        from ddpm_ood_tpu.data.loader import DataLoader

        dicts = self._make_dataset(tmp_path, n=6)
        chain = TransformChain(spatial_dimension=2, image_size=16)
        uncached = DataLoader(
            CachedDataset(dicts, chain, cache=False), batch_size=4, shuffle=False
        )
        cached = DataLoader(
            CachedDataset(dicts, chain, cache=True), batch_size=4, shuffle=False
        )
        for bu, bc in zip(uncached, cached):
            np.testing.assert_array_equal(bu["image"], bc["image"])
            assert bu["filename"] == bc["filename"]

    def test_uncached_loader_mixed_shapes_falls_back(self, tmp_path):
        from ddpm_ood_tpu.data.loader import DataLoader

        dicts = self._make_dataset(tmp_path, n=2)
        odd = tmp_path / "odd9.npy"
        np.save(odd, np.random.default_rng(40).random((1, 12, 12), dtype=np.float32))
        # corrupt one file so the native batch flags it and Python must serve it
        bad = tmp_path / "bad9.npy"
        np.save(bad, np.random.default_rng(41).random((1, 12, 12), dtype=np.float32))
        raw = bytearray(bad.read_bytes())
        raw[:6] = b"broken"
        bad.write_bytes(bytes(raw))
        dicts.append({"image": str(odd)})
        chain = TransformChain(spatial_dimension=2)
        loader = DataLoader(CachedDataset(dicts, chain, cache=False), batch_size=3)
        (batch,) = list(loader)
        assert batch["image"].shape == (3, 1, 12, 12)
        # a batch containing the corrupt file raises from the Python fallback
        loader_bad = DataLoader(
            CachedDataset(dicts[:2] + [{"image": str(bad)}], chain, cache=False),
            batch_size=3,
            prefetch=False,
        )
        with pytest.raises(ValueError):
            list(loader_bad)
