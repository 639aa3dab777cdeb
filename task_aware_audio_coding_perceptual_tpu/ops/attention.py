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


def attention_ref(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Reference O(n^2) attention: (B, N, D) -> (B, N, D); scaling D^-0.5
    like the reference (``layerspp.py:82``), f32 softmax."""
    d = q.shape[-1]
    w = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    w = w * (int(d) ** (-0.5))
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1)
    return jnp.einsum("bqk,bkc->bqc", w, v.astype(jnp.float32)).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, block_k: int, scale: float):
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

    Differentiable: the forward runs the Pallas online-softmax kernel; the
    backward recomputes attention through :func:`attention_ref` (a custom
    VJP) — exact gradients at O(n^2) backward memory, which is fine at
    NCSN++'s 16xT attention sizes. A fused flash backward is future work.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash(q, k, v, block_q, block_k, bool(interpret))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, block_q, block_k, interpret):
    return _flash_impl(q, k, v, block_q, block_k, interpret)


def _flash_vjp_fwd(q, k, v, block_q, block_k, interpret):
    return _flash_impl(q, k, v, block_q, block_k, interpret), (q, k, v)


def _flash_vjp_bwd(block_q, block_k, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(attention_ref, q, k, v)
    return vjp(g)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def _flash_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    b, n, d = q.shape
    scale = float(d) ** -0.5
    block_q = min(block_q, max(8, 1 << (n - 1).bit_length()))
    block_k = min(block_k, max(8, 1 << (n - 1).bit_length()))

    n_pad = -n % max(block_q, block_k)
    if n_pad:
        pad = lambda x: jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
        # padded K rows would win the softmax unless masked: give them a
        # strongly negative score by zeroing K and masking via an additive
        # trick — simplest correct approach: pad K with zeros and pad Q
        # normally, then mask by appending a -inf bias through value zeros.
        q_p, k_p, v_p = pad(q), pad(k), pad(v)
    else:
        q_p, k_p, v_p = q, k, v
    n_tot = n + n_pad

    # mask padded keys: shift their scores to -inf by concatenating a large
    # negative value into K's inner product is not possible bias-free, so we
    # instead exploit that padded V rows are zero AND renormalize: run the
    # kernel over an explicit bias column encoded by extending D with an
    # indicator dimension.
    if n_pad:
        ind_q = jnp.zeros((b, n_tot, 1), q.dtype)
        ind_k = jnp.concatenate(
            [jnp.zeros((b, n, 1), q.dtype), jnp.ones((b, n_pad, 1), q.dtype)], axis=1
        )
        # q·k gets + (-LARGE) for padded keys via indicator product
        big = jnp.asarray(np.sqrt(1e30), q.dtype)
        q_p = jnp.concatenate([q_p, -big * jnp.ones((b, n_tot, 1), q.dtype) / jnp.asarray(scale, q.dtype)], axis=-1)
        k_p = jnp.concatenate([k_p, big * ind_k], axis=-1)
        v_p = jnp.concatenate([v_p, ind_q], axis=-1)  # keep D consistent
        d_eff = d + 1
    else:
        d_eff = d

    grid = (b, n_tot // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, kv_len=n_tot, block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_eff), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tot, d_eff), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tot, d_eff), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d_eff), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_tot, d_eff), q.dtype),
        interpret=interpret,
    )(q_p, k_p, v_p)
    return out[:, :n, :d]
