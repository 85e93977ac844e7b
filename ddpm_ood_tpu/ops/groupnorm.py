"""Fused GroupNorm(+SiLU) Pallas kernel: bf16 in/out, fp32 statistics, one HBM pass.

STATUS — measured, OFF by default. Hypothesis: GroupNorm's fp32 statistics
cost HBM cast traffic (forcing GN compute to bf16 measured +8% end-to-end on
the 100-step scanned small-UNet forward, batch 288, v5e), so a kernel keeping
fp32 stats in VMEM with single bf16 read/write should capture that without the
precision loss. Measured result: the kernel is ~2.1x SLOWER end-to-end (8.9k
vs 18.7k img-evals/s) — XLA was already fusing the GN/SiLU/cast chain into the
surrounding conv fusions, and an opaque custom call forces materialization
boundaries on both sides, costing far more than the casts saved. The bf16-GN
+8% comes from narrower vector ops inside those fusions, not from a separable
bandwidth pass. Kept (tested, interpret-mode in CI) as an opt-in
(`DDPM_OOD_FUSED_GN=1`) for future shapes where XLA fails to fuse; the default
path is the identical-math XLA composition. Full numbers in docs/DESIGN.md.

Kernel design (pallas guide): grid over batch; each program handles the full
(N, C) sample so the group reduction never crosses programs; the (C, G)
one-hot matrix turns the awkward within-lane group reduction (C/G can be 4-24
lanes) into an MXU matmul with HIGHEST precision (exact fp32 sums), and
mean/rstd broadcast back to channels the same way ((1, G) @ (G, C)).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
VMEM_BUDGET_BYTES = 12 * 1024 * 1024  # stay under ~16 MB/core with headroom


def _xla_reference(x, gamma, beta, num_groups: int, eps: float, act: str):
    """The exact math the kernel implements, in plain XLA (fp32 stats).
    Used as the fallback path and as the custom-VJP backward function."""
    orig_dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape[0], -1, c) * gamma.astype(jnp.float32) + beta.astype(
        jnp.float32
    )
    y = y.reshape(x.shape)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(orig_dtype)


def _gn_kernel(x_ref, gamma_ref, beta_ref, m_ref, o_ref, *, eps: float,
               inv_count: float, act: str):
    x = x_ref[0].astype(jnp.float32)  # (N, C)
    m = m_ref[:]  # (C, G) one-hot, fp32

    # exact fp32 group sums on the MXU (one-hot matmul = plain additions)
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    s1 = jnp.sum(dot(x, m), axis=0, keepdims=True)            # (1, G)
    s2 = jnp.sum(dot(x * x, m), axis=0, keepdims=True)        # (1, G)
    mean_g = s1 * inv_count
    var_g = s2 * inv_count - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)

    # broadcast group stats back to channels: (1, G) @ (G, C)
    dot_t = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    mean_c = dot_t(mean_g, m)   # (1, C)
    rstd_c = dot_t(rstd_g, m)   # (1, C)

    gamma = gamma_ref[:].astype(jnp.float32)  # (1, C)
    beta = beta_ref[:].astype(jnp.float32)
    y = (x - mean_c) * rstd_c * gamma + beta
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _pallas_fwd(x, gamma, beta, num_groups: int, eps: float, act: str):
    shape = x.shape
    b, c = shape[0], shape[-1]
    n = int(np.prod(shape[1:-1]))
    xf = x.reshape(b, n, c)
    onehot = np.zeros((c, num_groups), np.float32)
    group = c // num_groups
    for g in range(num_groups):
        onehot[g * group:(g + 1) * group, g] = 1.0

    out = pl.pallas_call(
        functools.partial(
            _gn_kernel, eps=eps, inv_count=1.0 / float(n * group), act=act
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        interpret=jax.default_backend() != "tpu",  # CPU tests drive the kernel
    )(xf, gamma.reshape(1, c), beta.reshape(1, c), jnp.asarray(onehot))
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(x, gamma, beta, num_groups: int, eps: float, act: str):
    return _pallas_fwd(x, gamma, beta, num_groups, eps, act)


def _fused_fwd(x, gamma, beta, num_groups, eps, act):
    return _pallas_fwd(x, gamma, beta, num_groups, eps, act), (x, gamma, beta)


def _fused_bwd(num_groups, eps, act, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda xx, gg, bb: _xla_reference(xx, gg, bb, num_groups, eps, act),
        x, gamma, beta,
    )
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def groupnorm_act(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-6,
    act: str = "none",
    force: Optional[bool] = None,
) -> jnp.ndarray:
    """GroupNorm (+optional SiLU) over channel-last x (B, *spatial, C).

    Default: the XLA composition (measured faster — see module docstring).
    The Pallas kernel is opt-in via DDPM_OOD_FUSED_GN=1 (and still requires
    aligned shapes); `force=True/False` overrides (used by tests)."""
    c = x.shape[-1]
    n = int(np.prod(x.shape[1:-1]))
    sample_bytes = n * c * (4 + x.dtype.itemsize)  # fp32 intermediate + IO
    ok = (
        c % LANES == 0
        and c % num_groups == 0
        and n % 8 == 0
        and sample_bytes <= VMEM_BUDGET_BYTES
        and x.ndim >= 3
    )
    if force is None:
        use = ok and os.environ.get("DDPM_OOD_FUSED_GN", "0") == "1"
    else:
        use = force and ok
    if use:
        return _fused(x, gamma, beta, num_groups, eps, act)
    return _xla_reference(x, gamma, beta, num_groups, eps, act)
