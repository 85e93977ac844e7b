from .sweep import ReconProgram, plms_sweep

__all__ = ["ReconProgram", "plms_sweep"]
