"""Cached dataset + threaded prefetching batch loader (host-side).

Replaces the reference's MONAI CacheDataset/ThreadDataLoader stack
(src/data/get_train_and_val_dataloader.py:97-138) with a dependency-free design:
  - `CachedDataset`: applies the deterministic transform chain once per item with a
    thread pool and keeps results in RAM (CacheDataset parity); `cache_data=False`
    transforms lazily per epoch (Dataset parity).
  - `DataLoader`: yields {"image": (B, C, *spatial) f32, "filename": [str]} batches,
    with epoch shuffling for training and a one-batch prefetch thread so host
    assembly overlaps device compute.
  - multi-host: `get_training_data_loader` shards the item list per JAX process
    (replacing MONAI partition_dataset at ibid:21-31), wrap-padding to an even split
    exactly like `even_divisible=True` (the scorer's dedup handles the duplicates).
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from . import _native
from .csv_splits import get_data_dicts, partition_for_process
from .transforms import TransformChain


class CachedDataset:
    """RAM-cached (or lazy) transformed dataset.

    The cache fill prefers the native C++ core (csrc/dataload.cpp): one
    OpenMP-parallel call decodes + transforms every .npy/.nii[.gz] item —
    the counterpart of MONAI CacheDataset's worker pool, without per-item
    Python dispatch. Items the native core can't handle (png via PIL,
    exotic dtypes, decode errors) fall back to the Python TransformChain
    one-by-one, so behavior is format-for-format identical.
    """

    def __init__(self, data_dicts: List[Dict[str, str]], transform: TransformChain, cache: bool = True, num_workers: int = 8):
        self.data_dicts = data_dicts
        self.transform = transform
        self.cache = cache
        self._items: Optional[List[np.ndarray]] = None
        if cache and data_dicts:
            workers = max(1, min(num_workers, len(data_dicts)))
            self._items = self._native_fill(workers)
            if self._items is None:
                with cf.ThreadPoolExecutor(workers) as pool:
                    self._items = list(pool.map(lambda d: transform(d["image"]), data_dicts))

    def _native_fill(self, workers: int) -> Optional[List[np.ndarray]]:
        paths = [d["image"] for d in self.data_dicts]
        if not _native.available() or not all(_native.supports(p) for p in paths):
            return None
        batch, errs = _native.transform_batch(paths, self.transform, num_threads=workers)
        if batch.size == 0 and np.any(errs != 0):
            return None  # nothing decoded natively; use the Python pool
        items: List[np.ndarray] = []
        for i, p in enumerate(paths):
            if errs[i] == 0:
                items.append(batch[i])
            else:  # per-item Python fallback (e.g. a heterogeneous-shape item)
                items.append(self.transform(p))
        return items

    def __len__(self) -> int:
        return len(self.data_dicts)

    def _transform_one(self, path: str) -> np.ndarray:
        if _native.available() and _native.supports(path):
            try:
                return _native.transform_item(path, self.transform)
            except (RuntimeError, _native.NativeLoaderError):
                pass
        return self.transform(path)

    def __getitem__(self, i: int):
        img = self._items[i] if self._items is not None else self._transform_one(self.data_dicts[i]["image"])
        return {"image": img, "filename": self.data_dicts[i]["image"]}


class DataLoader:
    """Iterates batches with optional shuffling and one-batch-ahead prefetch."""

    def __init__(
        self,
        dataset: CachedDataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> List[np.ndarray]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        nb = len(self)
        return [idx[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]

    def _assemble(self, indices: np.ndarray) -> Dict:
        ds = self.dataset
        filenames = [ds.data_dicts[int(i)]["image"] for i in indices]
        # Uncached datasets re-decode every epoch (the reference's
        # `cache_data=0` / MONAI Dataset mode — the RUNBOOK 3D recipes): decode
        # the whole batch in ONE native OpenMP call instead of per-item Python.
        if (
            getattr(ds, "_items", None) is None
            and _native.available()
            and all(_native.supports(p) for p in filenames)
        ):
            batch, errs = _native.transform_batch(
                filenames, ds.transform, num_threads=len(filenames)
            )
            if not np.any(errs != 0):
                return {
                    "image": batch.astype(np.float32, copy=False),
                    "filename": filenames,
                }
        items = [ds[int(i)] for i in indices]
        images = np.stack([it["image"] for it in items]).astype(np.float32)
        return {"image": images, "filename": [it["filename"] for it in items]}

    def __iter__(self) -> Iterator[Dict]:
        batches = self._batch_indices()
        self._epoch += 1
        if not self.prefetch:
            for b in batches:
                yield self._assemble(b)
            return

        pool = cf.ThreadPoolExecutor(1, thread_name_prefix="loader-prefetch")
        try:
            future = None
            for i, b in enumerate(batches):
                if future is None:
                    future = pool.submit(self._assemble, b)
                current = future.result()
                future = (
                    pool.submit(self._assemble, batches[i + 1]) if i + 1 < len(batches) else None
                )
                yield current
        finally:
            pool.shutdown(wait=False)


def get_training_data_loader(
    batch_size: int,
    training_ids: str,
    validation_ids: str,
    only_val: bool = False,
    augmentation: bool = True,  # kept for CLI parity; a no-op exactly like the reference
    drop_last: bool = False,
    num_workers: int = 8,
    num_val_workers: int = 3,
    cache_data: bool = True,
    first_n: Optional[int] = None,
    is_grayscale: bool = False,
    add_vflip: bool = False,
    add_hflip: bool = False,
    image_size: Optional[int] = None,
    image_roi: Optional[Sequence[int]] = None,
    spatial_dimension: int = 2,
    num_processes: int = 1,
    process_index: int = 0,
    seed: int = 0,
):
    """Mirror of the reference factory (src/data/get_train_and_val_dataloader.py:36-140).

    Returns (train_loader, val_loader), or just val_loader when only_val=True.
    """
    del augmentation  # documented no-op in the reference (ibid:87-91)
    transform = TransformChain(
        spatial_dimension=spatial_dimension,
        is_grayscale=is_grayscale,
        image_size=image_size,
        image_roi=image_roi,
        add_vflip=add_vflip,
        add_hflip=add_hflip,
    )

    def build(ids_path: str, shuffle: bool, workers: int) -> DataLoader:
        dicts = get_data_dicts(ids_path, shuffle=False, first_n=first_n)
        if num_processes > 1:
            dicts = partition_for_process(dicts, num_processes, process_index)
        ds = CachedDataset(dicts, transform, cache=bool(cache_data), num_workers=workers)
        if len(ds):
            print(ds[0]["image"].shape)
        return DataLoader(
            ds, batch_size, shuffle=shuffle, drop_last=drop_last, seed=seed
        )

    val_loader = build(validation_ids, shuffle=False, workers=num_val_workers)
    if only_val:
        return val_loader
    train_loader = build(training_ids, shuffle=True, workers=num_workers)
    return train_loader, val_loader
