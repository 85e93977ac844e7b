"""VQ-VAE with EMA codebook (2D/3D) in Flax, channel-last, plus the passthrough
stand-in that makes pixel-space and latent-space DDPM paths uniform.

Capability parity with monai-generative's VQVAE as configured by the reference
(vqvae_trainer.py:50-70; stage-2 API used at ddpm_trainer.py:79,200 and
src/trainers/reconstruct.py:124,166), and with the reference's PassthroughVQVAE
(src/networks/passthrough_vqvae.py).

Per-level encoder params are (stride, kernel, dilation, padding) and decoder params
(stride, kernel, dilation, padding, output_padding) with torch ConvTranspose output
semantics — implemented as a fractionally-strided `lax.conv_general_dilated` so XLA
lowers it onto the MXU directly.

EMA quantizer: cluster counts / embedding sums are EMA-updated from the GLOBAL batch;
under a data-sharded mesh XLA inserts the cross-chip reduction automatically, which
replaces the reference's `ddp_sync` all-reduce (train_vqvae.py:50). State lives in a
mutable "ema" variable collection. Straight-through estimator for gradients.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


class ConvTransposeTorchLike(nn.Module):
    """Transposed conv with torch ConvTranspose{2,3}d size semantics:
    out = (in-1)*stride - 2*padding + dilation*(kernel-1) + output_padding + 1."""

    out_channels: int
    kernel_size: int
    stride: int
    dilation: int = 1
    padding: int = 0
    output_padding: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        spatial = x.ndim - 2
        in_ch = x.shape[-1]
        k_eff = self.dilation * (self.kernel_size - 1) + 1
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size,) * spatial + (in_ch, self.out_channels),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
        lo = k_eff - 1 - self.padding
        hi = k_eff - 1 - self.padding + self.output_padding
        dn = jax.lax.conv_dimension_numbers(
            x.shape,
            kernel.shape,
            ("NHWC", "HWIO", "NHWC") if spatial == 2 else ("NDHWC", "DHWIO", "NDHWC"),
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1,) * spatial,
            padding=[(lo, hi)] * spatial,
            lhs_dilation=(self.stride,) * spatial,
            rhs_dilation=(self.dilation,) * spatial,
            dimension_numbers=dn,
        )
        return y + bias.astype(self.dtype)


class VQVAEResidualUnit(nn.Module):
    channels: int
    res_channels: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        spatial = x.ndim - 2
        h = nn.Conv(self.res_channels, (3,) * spatial, padding="SAME", dtype=self.dtype)(x)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3,) * spatial, padding="SAME", dtype=self.dtype)(h)
        return nn.relu(x + h)


class Encoder(nn.Module):
    out_channels: int  # embedding_dim
    num_channels: Sequence[int]
    num_res_channels: Sequence[int]
    num_res_layers: int
    downsample_parameters: Sequence[Tuple[int, int, int, int]]
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        spatial = x.ndim - 2
        Res = (
            nn.remat(VQVAEResidualUnit, static_argnums=(2,))
            if self.remat
            else VQVAEResidualUnit
        )
        for i, ch in enumerate(self.num_channels):
            stride, kernel, dilation, pad = self.downsample_parameters[i]
            # honor the config's explicit torch-style padding (reference
            # train_vqvae.py:30-39 tuples) — for the default (2,4,1,1) XLA's
            # SAME coincides with it, but not for general user configs
            x = nn.Conv(
                ch,
                (kernel,) * spatial,
                strides=(stride,) * spatial,
                kernel_dilation=(dilation,) * spatial,
                padding=[(int(pad), int(pad))] * spatial,
                dtype=self.dtype,
            )(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = nn.relu(x)
            for _ in range(self.num_res_layers):
                x = Res(
                    ch, self.num_res_channels[i], self.dropout, self.dtype
                )(x, train)
        return nn.Conv(self.out_channels, (3,) * spatial, padding="SAME", dtype=self.dtype)(x)


class Decoder(nn.Module):
    out_channels: int
    num_channels: Sequence[int]  # in encoder order; reversed internally
    num_res_channels: Sequence[int]
    num_res_layers: int
    upsample_parameters: Sequence[Tuple[int, int, int, int, int]]
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        spatial = z.ndim - 2
        Res = (
            nn.remat(VQVAEResidualUnit, static_argnums=(2,))
            if self.remat
            else VQVAEResidualUnit
        )
        rev_ch = list(reversed(self.num_channels))
        rev_res_ch = list(reversed(self.num_res_channels))
        rev_up = list(reversed(self.upsample_parameters))
        x = nn.Conv(rev_ch[0], (3,) * spatial, padding="SAME", dtype=self.dtype)(z)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(x)
        n = len(rev_ch)
        for i in range(n):
            for _ in range(self.num_res_layers):
                x = Res(rev_ch[i], rev_res_ch[i], self.dropout, self.dtype)(x, train)
            stride, kernel, dilation, pad, out_pad = rev_up[i]
            is_last = i == n - 1
            x = ConvTransposeTorchLike(
                self.out_channels if is_last else rev_ch[i + 1],
                kernel_size=kernel,
                stride=stride,
                dilation=dilation,
                padding=pad,
                output_padding=out_pad,
                dtype=self.dtype,
            )(x)
            if not is_last:
                x = nn.relu(x)
        return x


class EMAQuantizer(nn.Module):
    """EMA vector quantizer. Returns (quantized_st, loss, indices).

    EMA stats updated in the mutable "ema" collection when train=True; computed from
    the global (mesh-wide) batch, so the cross-device sync is compiled in (the
    reference relies on monai's ddp_sync all-reduce instead)."""

    num_embeddings: int
    embedding_dim: int
    commitment_cost: float = 0.25
    decay: float = 0.99
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = False):
        emb = self.variable(
            "ema",
            "embedding",
            lambda: jax.random.normal(
                self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0),
                (self.num_embeddings, self.embedding_dim),
            ),
        )
        cluster_size = self.variable(
            "ema", "cluster_size", lambda: jnp.zeros((self.num_embeddings,))
        )
        embed_avg = self.variable("ema", "embed_avg", lambda: jnp.array(emb.value))

        flat = z.reshape(-1, self.embedding_dim).astype(jnp.float32)
        # jnp-ify: restored checkpoints hold numpy arrays, and numpy fancy-
        # indexing with a traced idx raises TracerArrayConversionError
        e = jnp.asarray(emb.value)
        # squared L2 distances via the MXU: |x|^2 - 2 x.e + |e|^2
        dist = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2.0 * jnp.dot(flat, e.T, preferred_element_type=jnp.float32)
            + jnp.sum(e**2, axis=1)[None, :]
        )
        idx = jnp.argmin(dist, axis=1)
        quantized = e[idx].reshape(z.shape)

        if train:
            onehot = jax.nn.one_hot(idx, self.num_embeddings, dtype=jnp.float32)
            counts = jnp.sum(onehot, axis=0)
            sums = jnp.dot(onehot.T, flat, preferred_element_type=jnp.float32)
            new_cs = self.decay * cluster_size.value + (1.0 - self.decay) * counts
            new_ea = self.decay * embed_avg.value + (1.0 - self.decay) * sums
            total = jnp.sum(new_cs)
            smoothed = (
                (new_cs + self.epsilon)
                / (total + self.num_embeddings * self.epsilon)
                * total
            )
            cluster_size.value = new_cs
            embed_avg.value = new_ea
            emb.value = new_ea / smoothed[:, None]

        loss = self.commitment_cost * jnp.mean(
            (jax.lax.stop_gradient(quantized) - z.astype(jnp.float32)) ** 2
        )
        quantized_st = z + jax.lax.stop_gradient(quantized.astype(z.dtype) - z)
        return quantized_st, loss, idx.reshape(z.shape[:-1])


class VQVAE(nn.Module):
    """Channel-last VQ-VAE. config keys mirror the reference's vqvae_config.json
    (vqvae_trainer.py:52-68) so LDM stage-2 reload round-trips."""

    spatial_dims: int = 2
    in_channels: int = 1
    out_channels: int = 1
    num_res_layers: int = 3
    downsample_parameters: Sequence[Tuple[int, int, int, int]] = (
        (2, 4, 1, 1),
        (2, 4, 1, 1),
        (2, 4, 1, 1),
        (2, 4, 1, 1),
    )
    upsample_parameters: Sequence[Tuple[int, int, int, int, int]] = (
        (2, 4, 1, 1, 0),
        (2, 4, 1, 1, 0),
        (2, 4, 1, 1, 0),
        (2, 4, 1, 1, 0),
    )
    num_channels: Sequence[int] = (128, 128, 128, 256)
    num_res_channels: Sequence[int] = (128, 128, 128, 256)
    num_embeddings: int = 256
    embedding_dim: int = 256
    decay: float = 0.99
    commitment_cost: float = 0.25
    epsilon: float = 1e-5
    dropout: float = 0.0
    ddp_sync: bool = True  # accepted for config parity; sync is inherent under GSPMD
    dtype: Dtype = jnp.float32
    # rematerialize residual units in the backward pass (CLI --remat); NOT part
    # of vqvae_config.json — it changes memory/compute, never numerics or params
    remat: bool = False

    def setup(self):
        self.encoder = Encoder(
            self.embedding_dim,
            self.num_channels,
            self.num_res_channels,
            self.num_res_layers,
            self.downsample_parameters,
            self.dropout,
            self.dtype,
            self.remat,
        )
        self.decoder = Decoder(
            self.out_channels,
            self.num_channels,
            self.num_res_channels,
            self.num_res_layers,
            self.upsample_parameters,
            self.dropout,
            self.dtype,
            self.remat,
        )
        self.quantizer = EMAQuantizer(
            self.num_embeddings,
            self.embedding_dim,
            self.commitment_cost,
            self.decay,
            self.epsilon,
        )

    def __call__(self, images: jnp.ndarray, train: bool = False):
        z = self.encoder(images, train)
        quantized, qloss, _ = self.quantizer(z, train)
        recon = self.decoder(quantized, train)
        return recon, qloss

    def encode(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(images, False)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(z, False)

    def encode_stage_2_inputs(self, images: jnp.ndarray) -> jnp.ndarray:
        z = self.encoder(images, False)
        quantized, _, _ = self.quantizer(z, False)
        return quantized

    def decode_stage_2_outputs(self, z: jnp.ndarray) -> jnp.ndarray:
        quantized, _, _ = self.quantizer(z, False)
        return self.decoder(quantized, False)

    def reconstruct(self, images: jnp.ndarray) -> jnp.ndarray:
        recon, _ = self(images, False)
        return recon


class PassthroughVQVAE:
    """Identity stage-2 interface for pixel-space DDPMs (reference
    src/networks/passthrough_vqvae.py). Not a Flax module — no params."""

    def encode_stage_2_inputs(self, images):
        return images

    def decode_stage_2_outputs(self, z):
        return z

    def encode(self, images):
        return images

    def decode(self, z):
        return z

    def reconstruct(self, images):
        return images
