from .gan import adversarial_loss, discriminator_loss, generator_adversarial_loss
from .lpips import LPIPS, PerceptualLoss, load_lpips_params, pad_28_to_32
from .spectral import jukebox_loss

__all__ = [
    "LPIPS",
    "PerceptualLoss",
    "adversarial_loss",
    "discriminator_loss",
    "generator_adversarial_loss",
    "jukebox_loss",
    "load_lpips_params",
    "pad_28_to_32",
]
