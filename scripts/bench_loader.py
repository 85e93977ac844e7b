#!/usr/bin/env python
"""Benchmark the native C++ data-loading core vs the Python TransformChain pool.

Measures the cache-fill path (the startup cost of every training/scoring run,
MONAI CacheDataset's role in the reference) on two synthetic corpora:
  - 2D: FashionMNIST-geometry npy images with the 28->32 resize
  - 3D: gzipped NIfTI volumes with modality select + ROI crop + resize
       (the Decathlon/BraTS shape of work)

Usage: python scripts/bench_loader.py [--n2d 2048] [--n3d 64] [--workers 8]
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ddpm_ood_tpu.data import _native
from ddpm_ood_tpu.data.loader import CachedDataset
from ddpm_ood_tpu.data.nifti import save_nifti
from ddpm_ood_tpu.data.transforms import TransformChain


def _python_fill(dicts, chain, workers):
    import concurrent.futures as cf

    with cf.ThreadPoolExecutor(workers) as pool:
        return list(pool.map(lambda d: chain(d["image"]), dicts))


def bench(name, dicts, chain, workers, reps=3):
    # native
    t_native = []
    for _ in range(reps):
        t0 = time.perf_counter()
        batch, errs = _native.transform_batch(
            [d["image"] for d in dicts], chain, num_threads=workers
        )
        t_native.append(time.perf_counter() - t0)
        assert int(np.sum(errs != 0)) == 0
    # python pool
    t_py = []
    for _ in range(reps):
        t0 = time.perf_counter()
        items = _python_fill(dicts, chain, workers)
        t_py.append(time.perf_counter() - t0)
    n = len(dicts)
    tn, tp = min(t_native), min(t_py)
    np.testing.assert_allclose(batch[0], items[0], rtol=1e-5, atol=1e-6)
    print(
        f"{name}: n={n} workers={workers}  "
        f"native {tn:.3f}s ({n / tn:.0f} items/s)  "
        f"python {tp:.3f}s ({n / tp:.0f} items/s)  "
        f"speedup {tp / tn:.2f}x"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n2d", type=int, default=2048)
    ap.add_argument("--n3d", type=int, default=64)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    assert _native.available(), "native loader did not build"
    tmp = Path(tempfile.mkdtemp(prefix="bench_loader_"))
    try:
        rng = np.random.default_rng(0)

        d2 = []
        for i in range(args.n2d):
            p = tmp / f"i{i}.npy"
            np.save(p, (rng.random((1, 28, 28)) * 255).astype(np.uint8))
            d2.append({"image": str(p)})
        bench(
            "2D npy 28->32",
            d2,
            TransformChain(spatial_dimension=2, image_size=32),
            args.workers,
        )

        d3 = []
        for i in range(args.n3d):
            p = tmp / f"v{i}.nii.gz"
            save_nifti(p, rng.random((96, 96, 64, 4)).astype(np.float32))
            d3.append({"image": str(p)})
        bench(
            "3D nii.gz 4-modal 96x96x64 -> roi 64^3 -> 32^3",
            d3,
            TransformChain(
                spatial_dimension=3,
                is_grayscale=True,
                image_roi=[64, 64, 64],
                image_size=32,
            ),
            args.workers,
        )

        # end-to-end CachedDataset construction (native picked automatically)
        t0 = time.perf_counter()
        CachedDataset(d2, TransformChain(spatial_dimension=2, image_size=32),
                      cache=True, num_workers=args.workers)
        print(f"CachedDataset(2D, native auto): {time.perf_counter() - t0:.3f}s")

        # uncached per-epoch batch decode (--cache_data=0 mode): native batch
        # call vs the per-item Python loop
        import os

        from ddpm_ood_tpu.data.loader import DataLoader

        chain3 = TransformChain(
            spatial_dimension=3, is_grayscale=True, image_roi=[64, 64, 64],
            image_size=32,
        )
        loader = DataLoader(
            CachedDataset(d3, chain3, cache=False), batch_size=8,
            shuffle=False, prefetch=False,
        )
        t0 = time.perf_counter()
        for b in loader:
            pass
        tn = time.perf_counter() - t0
        os.environ["DDPM_OOD_TPU_NATIVE_LOADER"] = "0"
        _native._lib = None
        try:
            t0 = time.perf_counter()
            for b in loader:
                pass
            tp = time.perf_counter() - t0
        finally:
            del os.environ["DDPM_OOD_TPU_NATIVE_LOADER"]
            _native._lib = None
        n3 = len(d3)
        print(
            f"uncached 3D epoch (cache_data=0): native {tn:.3f}s ({n3 / tn:.1f} it/s)  "
            f"python {tp:.3f}s ({n3 / tp:.1f} it/s)  speedup {tp / tn:.2f}x"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
