from .checkpoint import (  # noqa: F401
    find_checkpoint,
    load_config_json,
    restore_checkpoint,
    save_checkpoint,
    save_config_json,
)
from .logging import Logger, rank_zero_only  # noqa: F401
from .padding import pad_torch_style, unpad_torch_style  # noqa: F401
from .profiling import Timer, trace  # noqa: F401
