"""Pallas nearest-codebook kernel for residual vector quantization.

The north-star expression of the reference's bottleneck stage (BASELINE.json):
codes must be deterministic and bit-identical across backends, so

- distances are computed in f32 with ``precision=HIGHEST`` (no bf16 matmul
  passes) in both the Pallas kernel and the pure-JAX reference path,
- ties break to the lowest codebook index (first-occurrence argmin), pinned
  explicitly via a cumulative-mask one-hot rather than backend argmin.

The kernel fuses distance computation (an MXU matmul), argmin, and the
codeword gather (expressed as a one-hot matmul — TPU has no fast gather,
but one-hot @ codebook is MXU work) into a single VMEM-resident pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _first_min_onehot(
    dist: jax.Array, eps_rel: float = 0.0
) -> tuple[jax.Array, jax.Array]:
    """(one-hot, index) of the first (lowest-index) minimum along the last
    axis. Formulated as min-over-masked-indices (no cumsum — Pallas TPU has
    no cumsum lowering), so ties deterministically break to the lowest index.

    ``eps_rel > 0`` widens "tie" to within ``eps_rel × max|dist|`` of the
    minimum (cross-backend deterministic tie-breaking; see
    :func:`nearest_codebook_ref`).
    """
    k = dist.shape[-1]
    m = jnp.min(dist, axis=-1, keepdims=True)
    if eps_rel:
        m = m + eps_rel * jnp.max(jnp.abs(dist), axis=-1, keepdims=True)
    kidx = jax.lax.broadcasted_iota(jnp.int32, dist.shape, dimension=dist.ndim - 1)
    masked = jnp.where(dist <= m, kidx, k)
    idx = jnp.min(masked, axis=-1, keepdims=True)
    onehot = (kidx == idx).astype(jnp.float32)
    return onehot, idx[..., 0]


def nearest_codebook_ref(x: jax.Array, codebook: jax.Array, snap: bool = False):
    """Pure-JAX reference: returns (indices (N,), quantized (N, D), onehot).

    ``x``: (N, D) residuals; ``codebook``: (K, D).

    ``snap=True`` breaks the argmin with an epsilon tolerance: the winner is
    the *lowest index* whose distance is within ``1e-5 × row-scale`` of the
    row minimum. Cross-backend transcendental rounding perturbs distances by
    only ~1e-7 relative, so two codewords that are near-equidistant (observed
    tie gaps ~4e-9 relative) fall inside the tolerance band on every backend
    and resolve to the same index — this is what makes
    ``DeterministicCodec.encode`` codes bit-identical CPU↔TPU. (A coarse
    value-snapping grid would instead create large tie sets whose winner a
    single boundary-straddling entry can reshuffle — measured far worse.)
    """
    x32 = x.astype(jnp.float32)
    cb32 = codebook.astype(jnp.float32)
    dots = lax.dot_general(
        x32,
        cb32,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (N, K)
    c_sq = jnp.sum(cb32 * cb32, axis=-1)  # (K,)
    # |x|^2 is constant per row; omit it (argmin unaffected)
    dist = c_sq[None, :] - 2.0 * dots
    if snap:
        onehot, idx = _first_min_onehot(dist, eps_rel=1e-5)
    else:
        onehot, idx = _first_min_onehot(dist)
    idx = idx.astype(jnp.int32)
    quant = lax.dot_general(
        onehot,
        cb32,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return idx, quant, onehot


def _rvq_kernel(x_ref, cb_ref, csq_ref, idx_ref, q_ref):
    x = x_ref[:].astype(jnp.float32)
    cb = cb_ref[:].astype(jnp.float32)
    dots = jax.lax.dot_general(
        x,
        cb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    dist = csq_ref[:] - 2.0 * dots  # (bn, K); csq broadcast over rows
    first, idx = _first_min_onehot(dist)
    idx_ref[:, 0] = idx.astype(jnp.int32)
    q_ref[:] = jax.lax.dot_general(
        first,
        cb,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).astype(q_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def nearest_codebook_pallas(
    x: jax.Array,
    codebook: jax.Array,
    block_n: int = 512,
    interpret: bool | None = None,
):
    """Fused Pallas nearest-codebook lookup: (indices (N,), quantized (N,D))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, d = x.shape
    k = codebook.shape[0]
    block_n = min(block_n, n)
    # pad N to a multiple of block_n
    n_pad = -n % block_n
    xp = jnp.pad(x, ((0, n_pad), (0, 0)))
    csq = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1).reshape(1, k)

    grid = ((n + n_pad) // block_n,)
    idx, quant = pl.pallas_call(
        _rvq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n + n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n + n_pad, d), x.dtype),
        ),
        interpret=interpret,
    )(xp, codebook, csq)
    return idx[:n, 0], quant[:n]
