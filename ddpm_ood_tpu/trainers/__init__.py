"""Public trainer API (parity with reference src/trainers/__init__.py:1-3)."""

from .ddpm_trainer import DDPMTrainer
from .reconstruct import Reconstruct
from .vqvae_trainer import VQVAETrainer

__all__ = ["DDPMTrainer", "Reconstruct", "VQVAETrainer"]
