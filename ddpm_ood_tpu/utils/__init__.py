from .padding import pad_torch_style, unpad_torch_style  # noqa: F401
from .logging import Logger, rank_zero_only  # noqa: F401
