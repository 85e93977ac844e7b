"""Time-conditioned diffusion UNet (2D/3D) in Flax, channel-last, bf16-ready.

Capability parity with monai-generative's DiffusionModelUNet as configured by the
reference (base.py:65-88): "small" = channels (128,256,256), attention only at the
deepest level, 1 res-block/level, num_head_channels 256; "big" = (256,512,768),
attention everywhere, 2 res-blocks. Sinusoidal timestep embedding (dim=ch[0]) -> 2-layer
SiLU MLP (4*ch[0]); ResNet blocks = GroupNorm(32)+SiLU+Conv3 with additive time-emb;
spatial self-attention; strided-conv downsample; nearest-upsample+conv; zero-init
output conv.

TPU-first choices (not a torch translation):
  - channel-LAST layout (NHWC / NDHWC) so convs map directly onto the MXU without
    transposes; callers using reference-style channel-first data transpose at the edge.
  - `dtype` controls compute precision (bf16 on TPU); params and GroupNorm statistics
    stay f32. No GradScaler needed (reference base.py:122) — bf16 has fp32 range.
  - attention is plain XLA einsum attention: sequence lengths here are tiny (the
    reference only attends at the most-downsampled level), so a flash kernel would
    lose to XLA fusion; 3D latents use the same flattened-spatial path.
  - everything is shape-static and jit/scan/vmap-safe (used inside the sampler scans).
"""

from __future__ import annotations

import math
import os
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


class FusedGroupNormAct(nn.Module):
    """GroupNorm (+optional SiLU) with fp32 statistics and a single-HBM-pass
    Pallas kernel on TPU (ops/groupnorm.py); identical math via XLA elsewhere.
    Param tree ({scale, bias}) matches flax nn.GroupNorm, so checkpoints are
    interchangeable with the previous GroupNorm+silu composition."""

    num_groups: int
    epsilon: float = 1e-6
    act: str = "none"  # "none" | "silu"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.groupnorm import groupnorm_act

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return groupnorm_act(x, scale, bias, self.num_groups, self.epsilon, self.act)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding, sin-then-cos, matching monai-generative's convention."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class QuantConv(nn.Module):
    """Drop-in int8 replacement for the nn.Conv call sites in this file.

    The param tree ({kernel, bias}, same shapes/layout/init as nn.Conv) is
    bit-identical to nn.Conv's, so ANY checkpoint trained with the standard
    model loads into the quantized one unchanged — post-training quantization
    with zero calibration (ops/quant.py). Weights are re-quantized per call
    from the traced f32 params (O(params) work, negligible next to the conv)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    padding: str | Sequence[tuple] = "SAME"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.quant import qconv

        kshape = tuple(self.kernel_size) + (x.shape[-1], self.features)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), kshape, jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return qconv(x, kernel, bias, self.strides, self.padding).astype(self.dtype)


class WeightOnlyQuantConv(nn.Module):
    """`--quantize=w8`: per-output-channel int8 weights, bf16 activations,
    conv in the compute dtype (ops/quant.py:wconv — see its honest-TPU note:
    XLA hoists the dequant out of the sampler scan, so this measures the
    'weight-only int8' claim rather than assuming it). Param tree identical
    to nn.Conv — any checkpoint loads unchanged."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    padding: str | Sequence[tuple] = "SAME"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.quant import wconv

        kshape = tuple(self.kernel_size) + (x.shape[-1], self.features)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), kshape, jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return wconv(
            x, kernel, bias, self.strides, self.padding, dtype=self.dtype
        ).astype(self.dtype)


# The s8 x s8 conv lowering's win over bf16 grows with channel width
# (measured on chip, scripts/bench_quant_micro.py: 1.5-1.6x at 512-768, only
# ~1.25x at 256, a net loss at the small UNet's 128-wide level — DESIGN.md
# "int8 scoring"); `--quantize=mixed` quantizes exactly the convs at/above
# this width and leaves the rest on the bf16 path. Overridable for width
# sweeps: DDPM_OOD_TPU_MIXED_MIN_CH.
MIXED_QUANT_MIN_CH = int(os.environ.get("DDPM_OOD_TPU_MIXED_MIN_CH", "512"))


def _pick_conv(quant: str | None, cin: int, cout: int):
    if quant == "int8":
        return QuantConv
    if quant == "w8":
        return WeightOnlyQuantConv
    if quant == "mixed":
        return QuantConv if min(cin, cout) >= MIXED_QUANT_MIN_CH else nn.Conv
    return nn.Conv


def _pick_dense(quant: str | None, ch: int):
    if quant == "int8":
        return QuantDense
    if quant == "mixed" and ch >= MIXED_QUANT_MIN_CH:
        return QuantDense
    return nn.Dense  # w8: attention dense stays bf16 (negligible FLOP share)


class QuantDense(nn.Module):
    """int8 counterpart of nn.Dense (same {kernel, bias} param tree); used for
    the attention projections when quant="int8" — the einsum attention itself
    stays in `dtype` (tiny sequence lengths, negligible FLOP share)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.quant import qdot

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return qdot(x, kernel, bias).astype(self.dtype)


class ResnetBlock(nn.Module):
    out_channels: int
    norm_num_groups: int = 32
    dtype: Dtype = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        spatial = x.ndim - 2
        in_ch = x.shape[-1]
        Conv = _pick_conv(self.quant, in_ch, self.out_channels)
        h = FusedGroupNormAct(
            self.norm_num_groups, act="silu", name="norm1"
        )(x).astype(self.dtype)
        h = Conv(
            self.out_channels, (3,) * spatial, padding="SAME", dtype=self.dtype, name="conv1"
        )(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
            nn.silu(temb.astype(jnp.float32)).astype(self.dtype)
        )
        h = h + t.reshape(t.shape[:1] + (1,) * spatial + t.shape[1:])
        h = FusedGroupNormAct(
            self.norm_num_groups, act="silu", name="norm2"
        )(h).astype(self.dtype)
        # conv2 is out->out; under "mixed" it can be quantizable when the
        # in->out conv1/skip are not (per-conv shape decides, not the block)
        Conv2 = _pick_conv(self.quant, self.out_channels, self.out_channels)
        h = Conv2(
            self.out_channels, (3,) * spatial, padding="SAME", dtype=self.dtype, name="conv2"
        )(h)
        if in_ch != self.out_channels:
            x = Conv(
                self.out_channels, (1,) * spatial, dtype=self.dtype, name="skip_connection"
            )(x)
        return (x + h).astype(self.dtype)


class AttentionBlock(nn.Module):
    num_head_channels: int = 256
    norm_num_groups: int = 32
    dtype: Dtype = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        batch = x.shape[0]
        spatial_shape = x.shape[1:-1]
        ch = x.shape[-1]
        num_heads = max(ch // self.num_head_channels, 1)
        head_dim = ch // num_heads
        Dense = _pick_dense(self.quant, ch)

        h = FusedGroupNormAct(self.norm_num_groups, name="norm")(x).astype(self.dtype)
        h = h.reshape(batch, -1, ch)  # (B, N, C)
        q = Dense(ch, dtype=self.dtype, name="to_q")(h)
        k = Dense(ch, dtype=self.dtype, name="to_k")(h)
        v = Dense(ch, dtype=self.dtype, name="to_v")(h)

        def split(a):
            return a.reshape(batch, -1, num_heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        scale = 1.0 / math.sqrt(head_dim)
        # (B, N, H, D) -> (B, H, N, D); ops.attention picks the Pallas flash
        # kernel for long 3D sequences, fused XLA einsum otherwise
        from ..ops.attention import attention

        out = attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            scale,
        ).transpose(0, 2, 1, 3)
        out = out.astype(self.dtype).reshape(batch, -1, ch)
        out = Dense(ch, dtype=self.dtype, name="proj_attn")(out)
        return x + out.reshape((batch,) + spatial_shape + (ch,))


class Downsample(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        spatial = x.ndim - 2
        # explicit (1, 1) padding, NOT "SAME": for stride 2 XLA's SAME pads
        # (0, 1), which shifts the conv windows one pixel off the reference's
        # torch Conv(k=3, s=2, padding=1) — verified numerically; matching it
        # makes converted reference checkpoints (scripts/
        # convert_reference_checkpoint.py) bit-compatible
        Conv = _pick_conv(self.quant, x.shape[-1], self.out_channels)
        return Conv(
            self.out_channels,
            (3,) * spatial,
            strides=(2,) * spatial,
            padding=[(1, 1)] * spatial,
            dtype=self.dtype,
            name="conv",
        )(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        spatial = x.ndim - 2
        # exact 2x nearest upsample as reshape+broadcast (no gather: identical
        # values to jax.image.resize(method="nearest") at integer scale, but
        # lowers to pure data movement that TPU compilers handle trivially)
        shape = x.shape
        expanded = x.reshape(
            (shape[0],)
            + tuple(d for s in shape[1:-1] for d in (s, 1))
            + (shape[-1],)
        )
        tiled = jnp.broadcast_to(
            expanded,
            (shape[0],)
            + tuple(d for s in shape[1:-1] for d in (s, 2))
            + (shape[-1],),
        )
        x = tiled.reshape(
            (shape[0],) + tuple(2 * s for s in shape[1:-1]) + (shape[-1],)
        )
        Conv = _pick_conv(self.quant, x.shape[-1], self.out_channels)
        return Conv(
            self.out_channels, (3,) * spatial, padding="SAME", dtype=self.dtype, name="conv"
        )(x)


class DiffusionModelUNet(nn.Module):
    """2D/3D epsilon-network. Input x: (B, *spatial, C) channel-last; t: (B,) int."""

    spatial_dims: int = 2
    in_channels: int = 1
    out_channels: int = 1
    num_channels: Sequence[int] = (128, 256, 256)
    attention_levels: Sequence[bool] = (False, False, True)
    num_res_blocks: int = 1
    num_head_channels: int = 256
    norm_num_groups: int = 32
    dtype: Dtype = jnp.float32
    # rematerialize res/attention blocks in the backward pass — trades FLOPs for
    # HBM, the standard TPU recipe for the "big" 3D configs whose activations
    # would not otherwise fit (SURVEY.md §7 hard parts: 3D at [160,160,128])
    remat: bool = False
    # "int8": run the res/up/down-block convolutions s8 x s8 -> s32 on the MXU
    # (2x bf16 peak on v5e) with dynamic activation scales — post-training
    # quantization over the SAME param tree (QuantConv/ops/quant.py), intended
    # for the scoring sweep (reconstruct/serve --quantize=int8). conv_in,
    # conv_out, the time MLP and the attention projections stay bf16: they are
    # a tiny FLOP share and anchor the residual stream's precision.
    # "w8": weight-only int8 (WeightOnlyQuantConv — measured definition, see
    # ops/quant.py:wconv). "mixed": per-conv-shape selection — s8 x s8 only at
    # >= MIXED_QUANT_MIN_CH-wide convs where the lowering wins, bf16 elsewhere.
    quant: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        assert x.ndim == self.spatial_dims + 2, (
            f"expected (B, *spatial x{self.spatial_dims}, C), got {x.shape}"
        )
        Res, Attn = ResnetBlock, AttentionBlock
        if self.remat:
            Res = nn.remat(ResnetBlock)
            Attn = nn.remat(AttentionBlock)
        chs = tuple(self.num_channels)
        n_levels = len(chs)
        temb = timestep_embedding(t, chs[0])
        time_embed_dim = chs[0] * 4
        temb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_0")(temb.astype(self.dtype))
        temb = nn.silu(temb)
        temb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_2")(temb)

        x = x.astype(self.dtype)
        h = nn.Conv(
            chs[0], (3,) * self.spatial_dims, padding="SAME", dtype=self.dtype, name="conv_in"
        )(x)

        skips = [h]
        for level in range(n_levels):
            for block in range(self.num_res_blocks):
                h = Res(
                    chs[level],
                    self.norm_num_groups,
                    self.dtype,
                    quant=self.quant,
                    name=f"down_{level}_res_{block}",
                )(h, temb)
                if self.attention_levels[level]:
                    h = Attn(
                        self.num_head_channels,
                        self.norm_num_groups,
                        self.dtype,
                        quant=self.quant,
                        name=f"down_{level}_attn_{block}",
                    )(h)
                skips.append(h)
            if level != n_levels - 1:
                h = Downsample(chs[level], self.dtype, quant=self.quant,
                               name=f"down_{level}_downsample")(h)
                skips.append(h)

        h = Res(chs[-1], self.norm_num_groups, self.dtype, quant=self.quant,
                name="mid_res_0")(h, temb)
        h = Attn(
            self.num_head_channels, self.norm_num_groups, self.dtype,
            quant=self.quant, name="mid_attn"
        )(h)
        h = Res(chs[-1], self.norm_num_groups, self.dtype, quant=self.quant,
                name="mid_res_1")(h, temb)

        for i, level in enumerate(reversed(range(n_levels))):
            for block in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = Res(
                    chs[level],
                    self.norm_num_groups,
                    self.dtype,
                    quant=self.quant,
                    name=f"up_{i}_res_{block}",
                )(h, temb)
                if self.attention_levels[level]:
                    h = Attn(
                        self.num_head_channels,
                        self.norm_num_groups,
                        self.dtype,
                        quant=self.quant,
                        name=f"up_{i}_attn_{block}",
                    )(h)
            if level != 0:
                h = Upsample(chs[level], self.dtype, quant=self.quant,
                             name=f"up_{i}_upsample")(h)

        h = FusedGroupNormAct(
            self.norm_num_groups, act="silu", name="norm_out"
        )(h).astype(self.dtype)
        h = nn.Conv(
            self.out_channels,
            (3,) * self.spatial_dims,
            padding="SAME",
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv_out",
        )(h)
        return h.astype(jnp.float32)


def make_unet(
    model_type: str,
    spatial_dims: int,
    in_channels: int,
    out_channels: int,
    dtype: Dtype = jnp.float32,
    remat: bool = False,
    quant: str | None = None,
) -> DiffusionModelUNet:
    """"small"/"big" presets matching the reference (base.py:65-88).

    `remat=True` rematerializes res/attention blocks in the backward pass —
    reachable from the CLIs via `--remat` (the knob for the big-3D activation
    regime, e.g. pixel-space [160,160,128] volumes). `quant="int8"` runs the
    block convolutions int8-on-MXU over the same param tree — reachable from
    reconstruct/serve via `--quantize=int8` (scoring-time PTQ; ops/quant.py)."""
    if model_type == "small":
        return DiffusionModelUNet(
            spatial_dims=spatial_dims,
            in_channels=in_channels,
            out_channels=out_channels,
            num_channels=(128, 256, 256),
            attention_levels=(False, False, True),
            num_res_blocks=1,
            num_head_channels=256,
            dtype=dtype,
            remat=remat,
            quant=quant,
        )
    if model_type == "tiny":
        # framework extension (not in the reference): a small-geometry preset for
        # CPU tests / smoke runs; same topology as "small".
        return DiffusionModelUNet(
            spatial_dims=spatial_dims,
            in_channels=in_channels,
            out_channels=out_channels,
            num_channels=(32, 64, 64),
            attention_levels=(False, False, True),
            num_res_blocks=1,
            num_head_channels=64,
            norm_num_groups=8,
            dtype=dtype,
            remat=remat,
            quant=quant,
        )
    if model_type == "big":
        return DiffusionModelUNet(
            spatial_dims=spatial_dims,
            in_channels=in_channels,
            out_channels=out_channels,
            num_channels=(256, 512, 768),
            attention_levels=(True, True, True),
            num_res_blocks=2,
            num_head_channels=256,
            dtype=dtype,
            remat=remat,
            quant=quant,
        )
    raise ValueError(f"Do not recognise model type {model_type}")


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
