from .discriminator import PatchDiscriminator  # noqa: F401
from .unet import DiffusionModelUNet, make_unet, param_count  # noqa: F401
from .vqvae import VQVAE, PassthroughVQVAE, EMAQuantizer  # noqa: F401
