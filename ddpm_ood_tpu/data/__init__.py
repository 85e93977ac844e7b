from .csv_splits import get_data_dicts, partition_for_process  # noqa: F401
from .loader import DataLoader, get_training_data_loader  # noqa: F401
