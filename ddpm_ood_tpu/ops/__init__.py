from .attention import attention, flash_attention
from .groupnorm import groupnorm_act

__all__ = ["attention", "flash_attention", "groupnorm_act"]
