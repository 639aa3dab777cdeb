"""Residual vector quantization with EMA codebooks and straight-through grads.

North-star bottleneck for the codec (BASELINE.json): the reference's
compression stage is a continuous-latent bottleneck
(``pkl_file_models.py:334-354``); the codec re-expresses it as an
``n_quantizers``-level residual VQ whose code indices are deterministic and
bit-identical across backends (see ``ops/rvq_kernels.py`` for the pinned
tie-breaking / precision rules).

Functional design: quantization is a pure function over an explicit
:class:`RvqState` pytree; EMA codebook updates return a new state rather
than mutating, so the whole thing jits/shards/scans cleanly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu.ops.rvq_kernels import (
    nearest_codebook_pallas,
    nearest_codebook_ref,
)


@flax.struct.dataclass
class RvqState:
    """EMA-tracked codebooks: (L, K, D) plus per-code EMA statistics."""

    codebooks: jax.Array  # (L, K, D)
    ema_count: jax.Array  # (L, K)
    ema_sum: jax.Array  # (L, K, D)


@flax.struct.dataclass
class RvqOutput:
    quantized: jax.Array  # (..., D) straight-through quantized latents
    codes: jax.Array  # (L, ...) int32 code indices per level
    commitment_loss: jax.Array  # scalar
    codebook_loss: jax.Array  # scalar


def init_rvq(
    key: jax.Array,
    num_quantizers: int,
    codebook_size: int,
    dim: int,
    dtype=jnp.float32,
) -> RvqState:
    cb = jax.random.normal(key, (num_quantizers, codebook_size, dim), dtype) * 0.01
    return RvqState(
        codebooks=cb,
        ema_count=jnp.ones((num_quantizers, codebook_size), jnp.float32),
        ema_sum=cb.astype(jnp.float32),
    )


def init_rvq_from_latents(
    key: jax.Array,
    latents: jax.Array,
    num_quantizers: int,
    codebook_size: int,
    noise_scale: float = 1e-3,
) -> RvqState:
    """Data-driven codebook init: sample codewords from real encoder latents
    (k-means++-lite). Mis-scaled random codebooks make the commitment loss
    collapse the latent space early in training; seeding each level from the
    residual distribution it will quantize avoids that.
    """
    d = latents.shape[-1]
    x = jax.lax.stop_gradient(latents.reshape(-1, d).astype(jnp.float32))
    cbs = []
    residual = x
    for level in range(num_quantizers):
        key, k1, k2 = jax.random.split(key, 3)
        idx = jax.random.randint(k1, (codebook_size,), 0, x.shape[0])
        cb = residual[idx] + noise_scale * jax.random.normal(k2, (codebook_size, d))
        cbs.append(cb)
        _, q, _ = nearest_codebook_ref(residual, cb)
        residual = residual - q
    codebooks = jnp.stack(cbs)
    return RvqState(
        codebooks=codebooks,
        ema_count=jnp.ones((num_quantizers, codebook_size), jnp.float32),
        ema_sum=codebooks.astype(jnp.float32),
    )


def _lookup(x_flat, codebook, use_pallas: bool, snap: bool = False):
    # The lookup is piecewise-constant in x and the codebooks learn via EMA
    # (not gradients), so the boundary is non-differentiable by design;
    # stop_gradient keeps the Pallas kernel out of reverse-mode autodiff.
    x_flat = jax.lax.stop_gradient(x_flat)
    codebook = jax.lax.stop_gradient(codebook)
    if use_pallas:
        idx, quant = nearest_codebook_pallas(x_flat, codebook)
    else:
        idx, quant, _ = nearest_codebook_ref(x_flat, codebook, snap=snap)
    return jax.lax.stop_gradient(idx), jax.lax.stop_gradient(quant)


def quantize(
    state: RvqState,
    x: jax.Array,
    num_active: Optional[int] = None,
    use_pallas: bool = True,
    deterministic_ties: bool = False,
) -> RvqOutput:
    """Quantize latents ``x`` of shape (..., D).

    Args:
        num_active: use only the first ``num_active`` quantizer levels
            (bitrate scalability, EnCodec-style). Static int.
        deterministic_ties: pick the lowest codeword index within
            ``1e-5 x row-scale`` of the minimum distance (reference path
            only), so near-tie code choices resolve identically across
            backends despite ~1e-7 cross-backend distance perturbations;
            used by :class:`~..models.deterministic.DeterministicCodec`.
    """
    L = state.codebooks.shape[0]
    num_active = L if num_active is None else num_active
    lead = x.shape[:-1]
    d = x.shape[-1]
    x_flat = x.reshape(-1, d)

    residual = x_flat
    quant_sum = jnp.zeros_like(x_flat)
    codes = []
    for level in range(num_active):  # static unroll; L is small (<=32)
        idx, q = _lookup(residual, state.codebooks[level], use_pallas,
                         snap=deterministic_ties)
        codes.append(idx.reshape(lead))
        quant_sum = quant_sum + q
        residual = residual - q

    quant_sum = quant_sum.reshape(*lead, d)
    commitment = jnp.mean((x - jax.lax.stop_gradient(quant_sum)) ** 2)
    codebook_loss = jnp.mean((jax.lax.stop_gradient(x) - quant_sum) ** 2)
    # straight-through estimator
    quant_st = x + jax.lax.stop_gradient(quant_sum - x)
    return RvqOutput(
        quantized=quant_st,
        codes=jnp.stack(codes, axis=0).astype(jnp.int32),
        commitment_loss=commitment,
        codebook_loss=codebook_loss,
    )


def dequantize(state: RvqState, codes: jax.Array) -> jax.Array:
    """codes (L, ...) -> latents (..., D) by summing codewords per level."""
    L = codes.shape[0]
    lead = codes.shape[1:]
    out = jnp.zeros((*lead, state.codebooks.shape[-1]), state.codebooks.dtype)
    for level in range(L):
        out = out + jnp.take(state.codebooks[level], codes[level], axis=0)
    return out


def ema_update(
    state: RvqState,
    x: jax.Array,
    codes: jax.Array,
    decay: float = 0.99,
    eps: float = 1e-5,
) -> RvqState:
    """EMA codebook update from a batch (VQ-VAE-2 style).

    Re-walks the residual ladder with the *given* codes so statistics match
    exactly what was selected in the forward pass. Deterministic order:
    level 0..L-1, f32 accumulations.
    """
    L, K, D = state.codebooks.shape
    x_flat = x.reshape(-1, D).astype(jnp.float32)
    codes_flat = codes.reshape(L, -1)

    new_cb, new_count, new_sum = [], [], []
    residual = x_flat
    for level in range(L):
        onehot = jax.nn.one_hot(codes_flat[level], K, dtype=jnp.float32)  # (N, K)
        count = jnp.sum(onehot, axis=0)  # (K,)
        total = onehot.T @ residual  # (K, D)
        c = decay * state.ema_count[level] + (1 - decay) * count
        s = decay * state.ema_sum[level] + (1 - decay) * total
        n = jnp.sum(c)
        c_smoothed = (c + eps) / (n + K * eps) * n  # Laplace smoothing
        cb = (s / c_smoothed[:, None]).astype(state.codebooks.dtype)
        new_cb.append(cb)
        new_count.append(c)
        new_sum.append(s)
        quant = jnp.take(state.codebooks[level], codes_flat[level], axis=0).astype(jnp.float32)
        residual = residual - quant

    return RvqState(
        codebooks=jnp.stack(new_cb),
        ema_count=jnp.stack(new_count),
        ema_sum=jnp.stack(new_sum),
    )


def reseed_dead_codes(
    state: RvqState,
    key: jax.Array,
    latents: jax.Array,
    threshold: float = 0.03,
) -> tuple[RvqState, jax.Array]:
    """Replace codewords whose EMA usage fell below ``threshold`` with random
    residual vectors from the current batch (SoundStream §3.2-style expiry).

    Without this, mis-initialized or early-collapsed codewords never recover
    — the EMA pulls them nowhere because nothing selects them. Jit-safe
    (fixed shapes; a boolean mask selects which rows are swapped).

    Returns (new_state, dead_count_per_level).
    """
    L, K, D = state.codebooks.shape
    x = jax.lax.stop_gradient(latents.reshape(-1, D).astype(jnp.float32))

    new_cb, new_count, new_sum, dead_counts = [], [], [], []
    residual = x
    for level in range(L):
        key, kidx = jax.random.split(key)
        dead = state.ema_count[level] < threshold  # (K,)
        idx = jax.random.randint(kidx, (K,), 0, x.shape[0])
        candidates = residual[idx]  # (K, D)
        cb = jnp.where(dead[:, None], candidates.astype(state.codebooks.dtype),
                       state.codebooks[level])
        # reset EMA stats for reseeded rows so they adapt quickly
        count = jnp.where(dead, jnp.ones_like(state.ema_count[level]),
                          state.ema_count[level])
        ssum = jnp.where(dead[:, None], candidates, state.ema_sum[level])
        new_cb.append(cb)
        new_count.append(count)
        new_sum.append(ssum)
        dead_counts.append(jnp.sum(dead))
        _, q, _ = nearest_codebook_ref(residual, state.codebooks[level])
        residual = residual - q

    return (
        RvqState(
            codebooks=jnp.stack(new_cb),
            ema_count=jnp.stack(new_count),
            ema_sum=jnp.stack(new_sum),
        ),
        jnp.stack(dead_counts),
    )
