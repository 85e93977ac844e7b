from .ddpm import DDPMTrainStep, make_ddpm_state
from .vqvae import VQVAETrainSteps, make_vqvae_states

__all__ = ["DDPMTrainStep", "make_ddpm_state", "VQVAETrainSteps", "make_vqvae_states"]
