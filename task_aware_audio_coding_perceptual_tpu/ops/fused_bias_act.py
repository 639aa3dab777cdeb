"""Fused bias-add + (leaky)ReLU x scale, with the StyleGAN2 grad-mode table.

TPU-native replacement for the reference CUDA kernel
(``sgmse/sgmse/backbones/ncsnpp_utils/op/fused_bias_act_kernel.cu:36-45``):

    mode = act*10 + grad
      10: y = x          (linear fwd)     11: y = x      (linear grad)
      30: y = lrelu(x)   (lrelu fwd)      31: y = x if ref>0 else x*alpha
      12/32: y = 0       (second-order-bias terms)
    out = y * scale

The hot path (``FusedLeakyReLU``) is exposed as :func:`fused_leaky_relu`
with a custom VJP mirroring ``op/fused_act.py:20-49`` — the backward is
itself expressed through :func:`fused_bias_act`, so double-backward works
like the CUDA version. A Pallas elementwise kernel implements the fused op
on TPU (XLA would also fuse these, but the kernel keeps the op a single
VMEM-resident pass and is the hook for later fusion into neighboring
convolutions); a pure-jnp fallback runs everywhere else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bias_shape(ndim: int, axis: int):
    shape = [1] * ndim
    shape[axis] = -1
    return shape


def fused_bias_act(
    x: jax.Array,
    bias: jax.Array | None = None,
    refer: jax.Array | None = None,
    act: int = 3,
    grad: int = 0,
    alpha: float = 0.2,
    scale: float = 2**0.5,
    axis: int = 1,
) -> jax.Array:
    """Direct functional equivalent of the CUDA ``fused_bias_act`` op."""
    if bias is not None and bias.size > 0:
        x = x + bias.reshape(_bias_shape(x.ndim, axis))
    mode = act * 10 + grad
    if mode in (10, 11):
        y = x
    elif mode in (12, 32):
        y = jnp.zeros_like(x)
    elif mode == 30:
        y = jnp.where(x > 0, x, x * alpha)
    elif mode == 31:
        assert refer is not None
        y = jnp.where(refer > 0, x, x * alpha)
    else:
        raise ValueError(f"Unsupported act/grad mode {mode}")
    return y * scale


def _flr_pallas(x2d: jax.Array, bias: jax.Array, alpha: float, scale: float, interpret: bool):
    """Pallas kernel for the (rows, channels) layout: y = scale*lrelu(x+b)."""

    def kernel(x_ref, b_ref, o_ref):
        v = x_ref[:] + b_ref[:]
        o_ref[:] = jnp.where(v > 0, v, v * alpha) * scale

    rows, ch = x2d.shape
    block_rows = min(rows, 1024)
    grid = (pl.cdiv(rows, block_rows),)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, ch), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, ch), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, ch), x2d.dtype),
        interpret=interpret,
    )(x2d, bias.reshape(1, ch))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_leaky_relu(x, bias, negative_slope: float = 0.2, scale: float = 2**0.5, axis: int = 1):
    """y = scale * leaky_relu(x + bias) (reference ``op/fused_act.py:86-97``).

    ``bias`` broadcasts over ``axis`` (channel dim; 1 for NCHW, -1 for NHWC).
    """
    return fused_bias_act(x, bias, None, act=3, grad=0, alpha=negative_slope, scale=scale, axis=axis)


def _flr_fwd(x, bias, negative_slope, scale, axis):
    out = fused_bias_act(x, bias, None, 3, 0, negative_slope, scale, axis)
    return out, out


def _flr_bwd(negative_slope, scale, axis, out, g):
    # mode 31: pass-through grad masked by sign of the saved forward output
    grad_input = fused_bias_act(g, None, out, 3, 1, negative_slope, scale, axis)
    reduce_dims = tuple(i for i in range(grad_input.ndim) if i != (axis % grad_input.ndim))
    grad_bias = jnp.sum(grad_input, axis=reduce_dims)
    return grad_input, grad_bias


fused_leaky_relu.defvjp(_flr_fwd, _flr_bwd)


def fused_leaky_relu_pallas(
    x: jax.Array,
    bias: jax.Array,
    negative_slope: float = 0.2,
    scale: float = 2**0.5,
    axis: int = -1,
    interpret: bool | None = None,
) -> jax.Array:
    """Pallas-kernel forward (inference fast path; channels-last layout is
    reshaped to (rows, channels) so the channel dim sits on TPU lanes)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    axis = axis % x.ndim
    perm = [i for i in range(x.ndim) if i != axis] + [axis]
    xt = jnp.transpose(x, perm)
    lead = xt.shape[:-1]
    out = _flr_pallas(xt.reshape(-1, xt.shape[-1]), bias, negative_slope, scale, interpret)
    out = out.reshape(*lead, -1)
    inv = np.argsort(perm)
    return jnp.transpose(out, inv)
