"""Attention ops: XLA einsum path + a Pallas TPU flash-attention kernel.

Why both (SURVEY.md §2.2 "DiffusionModelUNet"): in the reference's 2D configs,
self-attention runs only at the most-downsampled level (sequence length 16-64
tokens, reference base.py:70-71) — there XLA's fused einsum+softmax is already
optimal and a hand-written kernel would lose. But the 3D LDM path ("big" UNet on
[160,160,128] ROIs, reference README.md:162) reaches thousands of tokens at the
deepest level, where materializing the (N, N) logits in HBM becomes the
bottleneck. `flash_attention` is an online-softmax Pallas kernel (never
materializes logits; VMEM-resident row statistics) for exactly that regime.

Dispatch: `attention(q, k, v)` picks the kernel when it pays off
(TPU backend, long sequence, lane-aligned head_dim) and einsum otherwise.
Gradients: custom VJP — flash forward, einsum-recompute backward (the backward
materializes one (N, N) block-row at a time via XLA; acceptable because training
at flash sequence lengths is dominated by the conv stack, and inference — the
OOD sweep — is forward-only).

Kernel design per the Pallas TPU guide: grid = (batch*heads, q_blocks, k_blocks)
with the k axis iterated sequentially (TPU grid order), m/l/acc accumulated in
VMEM scratch, (BQ, 128)-shaped row statistics (min f32 tile), MXU matmuls with
preferred_element_type=f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
FLASH_MIN_SEQ = 1024  # below this, XLA einsum wins


def einsum_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     sm_scale: float) -> jnp.ndarray:
    """Reference path: (B, H, N, D) batched attention, f32 softmax."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * sm_scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, sm_scale: float, nk: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0].astype(jnp.float32)  # (BK, D)
    v = v_ref[0].astype(jnp.float32)  # (BK, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale  # (BQ, BK)

    m_prev = m_scr[:]  # (BQ, LANES) row-replicated
    l_prev = l_scr[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)  # (BQ, 1)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    alpha = jnp.exp(m_prev - m_new)  # (BQ, LANES)
    p = jnp.exp(s - m_new[:, :1])  # (BQ, BK)
    l_new = alpha * l_prev + jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), l_prev.shape
    )
    m_scr[:] = m_new
    l_scr[:] = l_new
    pv = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, D)
    acc_scr[:] = acc_scr[:] * alpha[:, :1] + pv

    @pl.when(ki == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


def _flash_fwd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, sm_scale: float,
               block_q: int, block_k: int, interpret: bool) -> jnp.ndarray:
    b, h, n, d = q.shape
    nk_len = k.shape[2]
    bq = min(block_q, n)
    bk = min(block_k, nk_len)
    assert n % bq == 0 and nk_len % bk == 0, (
        f"seq lengths ({n}, {nk_len}) must divide blocks ({bq}, {bk})"
    )
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, nk_len, d)
    vf = v.reshape(b * h, nk_len, d)
    nq, nkb = n // bq, nk_len // bk

    out = pl.pallas_call(
        functools.partial(_flash_kernel, sm_scale=sm_scale, nk=nkb),
        grid=(b * h, nq, nkb),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bh, qi, ki: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q, k, v, sm_scale: float = 1.0,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool = False):
    """(B, H, N, D) attention; online softmax, logits never hit HBM."""
    return _flash_fwd(q, k, v, sm_scale, block_q, block_k, interpret)


def _fwd(q, k, v, sm_scale, block_q, block_k, interpret):
    return _flash_fwd(q, k, v, sm_scale, block_q, block_k, interpret), (q, k, v)


def _bwd(sm_scale, block_q, block_k, interpret, res, g):
    q, k, v = res

    def ref(q, k, v):
        return einsum_attention(q, k, v, sm_scale)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              sm_scale: float) -> jnp.ndarray:
    """Dispatcher: Pallas flash kernel when it pays off, XLA einsum otherwise."""
    n, d = q.shape[-2], q.shape[-1]
    use_flash = (
        jax.default_backend() == "tpu"
        and n >= FLASH_MIN_SEQ
        and d % LANES == 0
        and n % DEFAULT_BLOCK_Q == 0
    )
    if use_flash:
        return flash_attention(q, k, v, sm_scale)
    return einsum_attention(q, k, v, sm_scale)
