"""Pix2Pix-style PatchGAN discriminator (2D/3D) in Flax, channel-last.

Parity with monai-generative's PatchDiscriminator as configured by the reference
VQ-VAE trainer (vqvae_trainer.py:73-85): num_layers_d=3, base 64 channels (doubling
per layer), kernel 4, LeakyReLU(0.2), BatchNorm, no bias, padding 1; the call
returns the list of intermediate feature maps with the 1-channel logits map last
(the trainer consumes `disc(x)[-1]`, reference vqvae_trainer.py:231).

BatchNorm statistics live in the standard Flax "batch_stats" collection; training
steps thread them as mutable state. Under a data-sharded mesh the batch statistics
are computed over the GLOBAL batch by XLA (replacing torch SyncBN-less DDP behavior
with something strictly better-behaved).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


class PatchDiscriminator(nn.Module):
    spatial_dims: int = 2
    num_layers_d: int = 3
    num_channels: int = 64
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 4
    negative_slope: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        k = (self.kernel_size,) * self.spatial_dims
        pad = [(1, 1)] * self.spatial_dims
        feats: List[jnp.ndarray] = []
        h = x.astype(self.dtype)

        ch = self.num_channels
        # first layer: stride 2, no norm
        h = nn.Conv(ch, k, strides=(2,) * self.spatial_dims, padding=pad,
                    use_bias=True, dtype=self.dtype, name="layer_0")(h)
        h = nn.leaky_relu(h, self.negative_slope)
        feats.append(h)

        for i in range(1, self.num_layers_d):
            ch = min(ch * 2, 512)
            stride = 2 if i < self.num_layers_d - 1 else 1
            h = nn.Conv(ch, k, strides=(stride,) * self.spatial_dims, padding=pad,
                        use_bias=False, dtype=self.dtype, name=f"layer_{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32, name=f"norm_{i}")(h)
            h = nn.leaky_relu(h, self.negative_slope)
            feats.append(h)

        logits = nn.Conv(self.out_channels, k, strides=(1,) * self.spatial_dims,
                         padding=pad, use_bias=True, dtype=self.dtype,
                         name="final_conv")(h)
        feats.append(logits.astype(jnp.float32))
        return feats
