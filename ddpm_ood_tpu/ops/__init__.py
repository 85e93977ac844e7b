from .attention import attention, flash_attention

__all__ = ["attention", "flash_attention"]
