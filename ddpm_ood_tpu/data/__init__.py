from .csv_splits import get_data_dicts, partition_for_process, write_split_csv
from .loader import CachedDataset, DataLoader, get_training_data_loader
from .transforms import TransformChain

__all__ = [
    "CachedDataset",
    "DataLoader",
    "TransformChain",
    "get_data_dicts",
    "get_training_data_loader",
    "partition_for_process",
    "write_split_csv",
]
