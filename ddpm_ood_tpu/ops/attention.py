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
Gradients: custom VJP with a full flash BACKWARD — two Pallas kernels (dK/dV
with the q-axis iterated sequentially; dQ with the k-axis sequential) using the
forward's saved per-row logsumexp (lane-replicated (N, 128) layout — Mosaic
blocks need (8, 128)-aligned tails) and delta = rowsum(dO * O) precomputed in
XLA. The (N, N) probability matrix never reaches HBM in either direction.

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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
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
        # per-row logsumexp, saved for the backward pass; lane-replicated
        # (BQ, LANES) layout because Mosaic blocks need (8, 128)-aligned tails
        lse_ref[0] = m_scr[:] + jnp.log(l_scr[:])


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

    out, lse = pl.pallas_call(
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
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, LANES), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, n, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d), lse  # lse: (BH, N, LANES) lane-replicated


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, dk_scr, dv_scr,
                          *, sm_scale: float, nq: int):
    """dK/dV for one k-block: grid (bh, ki, qi), qi iterated sequentially.

    p = exp(q k^T * scale - lse);  dv += p^T do;
    ds = p * (do v^T - delta) * scale;  dk += ds^T q.
    """
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0].astype(jnp.float32)      # (BQ, D)
    k = k_ref[0].astype(jnp.float32)      # (BK, D)
    v = v_ref[0].astype(jnp.float32)      # (BK, D)
    do = do_ref[0].astype(jnp.float32)    # (BQ, D)
    lse = lse_ref[0][:, :1]               # (BQ, 1) lane-replicated
    delta = delta_ref[0][:, :1]           # (BQ, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale                          # (BQ, BK)
    p = jnp.exp(s - lse)         # normalized probabilities
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                     # p^T @ do -> (BK, D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                     # (BQ, BK)
    ds = p * (dp - delta) * sm_scale
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                     # ds^T @ q -> (BK, D)

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, dq_scr, *, sm_scale: float, nk: int):
    """dQ for one q-block: grid (bh, qi, ki), ki iterated sequentially.
    dq += ds @ k with ds as above."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * sm_scale
    dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_impl(q, k, v, o, lse, do, sm_scale, block_q, block_k, interpret):
    b, h, n, d = q.shape
    nk_len = k.shape[2]
    bq = min(block_q, n)
    bk = min(block_k, nk_len)
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, nk_len, d)
    vf = v.reshape(b * h, nk_len, d)
    dof = do.reshape(b * h, n, d)
    lsef = lse  # (BH, N, LANES) lane-replicated, straight from the fwd kernel
    delta = jnp.broadcast_to(
        jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
                ).reshape(b * h, n)[:, :, None],
        (b * h, n, LANES),
    )
    nq, nkb = n // bq, nk_len // bk

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, sm_scale=sm_scale, nq=nq),
        grid=(b * h, nkb, nq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, ki, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),   # q
            pl.BlockSpec((1, bk, d), lambda bh, ki, qi: (bh, ki, 0),
                         memory_space=pltpu.VMEM),   # k
            pl.BlockSpec((1, bk, d), lambda bh, ki, qi: (bh, ki, 0),
                         memory_space=pltpu.VMEM),   # v
            pl.BlockSpec((1, bq, d), lambda bh, ki, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),   # do
            pl.BlockSpec((1, bq, LANES), lambda bh, ki, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),   # lse
            pl.BlockSpec((1, bq, LANES), lambda bh, ki, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),   # delta
        ],
        out_specs=(
            pl.BlockSpec((1, bk, d), lambda bh, ki, qi: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bh, ki, qi: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, nk_len, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, nk_len, d), q.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, dof, lsef, delta)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, sm_scale=sm_scale, nk=nkb),
        grid=(b * h, nq, nkb),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, LANES), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, LANES), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bh, qi, ki: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        interpret=interpret,
    )(qf, kf, vf, dof, lsef, delta)

    return (
        dq.reshape(b, h, n, d),
        dk.reshape(b, h, nk_len, d),
        dv.reshape(b, h, nk_len, d),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q, k, v, sm_scale: float = 1.0,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool = False):
    """(B, H, N, D) attention; online softmax, logits never hit HBM — in either
    direction: the backward is the standard flash bwd (two Pallas kernels over
    (N/bq, N/bk) tiles with the saved per-row logsumexp; the (N, N) probability
    matrix is never materialized in HBM)."""
    out, _ = _flash_fwd(q, k, v, sm_scale, block_q, block_k, interpret)
    return out


def _fwd(q, k, v, sm_scale, block_q, block_k, interpret):
    out, lse = _flash_fwd(q, k, v, sm_scale, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _bwd(sm_scale, block_q, block_k, interpret, res, g):
    q, k, v, o, lse = res
    return _flash_bwd_impl(q, k, v, o, lse, g, sm_scale, block_q, block_k,
                           interpret)


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
