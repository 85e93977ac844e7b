"""CSV split-file reading + per-process dataset partitioning.

Format parity with the reference (src/data/get_train_and_val_dataloader.py:7-33):
splits are a SINGLE comma-separated row; the reference reads it with pandas so the
paths become the column header and `list(df)` yields them. We reproduce the same
effective behavior (first line = the path list) without requiring pandas quirks.

`partition_for_process` replaces MONAI's `partition_dataset` call (ibid:21-31):
shuffle with seed 0, pad to an even multiple of the process count by wrapping
(`even_divisible=True` — this is what creates the duplicate result rows the OOD
scorer dedups at reference ood_detection.py:53-54), then contiguous per-rank chunks.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def get_data_dicts(
    ids_path: str,
    shuffle: bool = False,
    first_n: Optional[int] = None,
) -> List[Dict[str, str]]:
    with open(ids_path) as f:
        first_line = f.readline().strip()
    paths = [p.strip() for p in first_line.split(",") if p.strip()]
    if shuffle:
        # reference shuffles via pandas sample(random_state=1); deterministic here too
        rng = np.random.default_rng(1)
        paths = [paths[i] for i in rng.permutation(len(paths))]
    data_dicts = [{"image": p} for p in paths]
    if first_n:
        data_dicts = data_dicts[: int(first_n)]
    print(f"Found {len(data_dicts)} subjects.")
    return data_dicts


def write_split_csv(paths: List[str], out_path: str) -> None:
    """Write the single-row comma-separated split format the reference uses
    (src/data/get_computer_vision_datasets.py:89-92)."""
    with open(out_path, "w") as f:
        f.write(",".join(str(p) for p in paths))


def partition_for_process(
    data: List[Dict[str, str]],
    num_partitions: int,
    index: int,
    shuffle: bool = True,
    seed: int = 0,
    even_divisible: bool = True,
) -> List[Dict[str, str]]:
    if num_partitions <= 1:
        return data
    indices = np.arange(len(data))
    if shuffle:
        np.random.RandomState(seed).shuffle(indices)
    if even_divisible and len(indices) % num_partitions != 0:
        pad = num_partitions - (len(indices) % num_partitions)
        indices = np.concatenate([indices, indices[:pad]])
    chunks = np.array_split(indices, num_partitions)
    return [data[i] for i in chunks[index]]
