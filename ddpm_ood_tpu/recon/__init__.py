from .aot import load_compiled, load_or_save, save_compiled
from .sweep import ReconProgram, plms_sweep

__all__ = [
    "ReconProgram",
    "plms_sweep",
    "save_compiled",
    "load_compiled",
    "load_or_save",
]
