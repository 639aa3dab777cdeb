"""NCSN++ layer primitives (reference ``ncsnpp_utils/layers.py``).

Activations, variance-scaling initializers, NIN (1x1 network-in-network),
and 3x3/1x1 conv constructors with init_scale support. NHWC layout.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def get_act(name: str):
    """Reference ``layers.py:29-43``."""
    if name == "elu":
        return nn.elu
    elif name == "relu":
        return nn.relu
    elif name == "lrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    elif name == "swish":
        return nn.swish
    raise NotImplementedError("activation function does not exist!")


def variance_scaling(scale, mode, distribution, in_axis=-2, out_axis=-1, dtype=jnp.float32):
    """Ported semantics of the reference's JAX-derived initializer
    (``layers.py:54-83``): uniform/normal scaled by fan."""
    if scale == 0:
        scale = 1e-10
    return nn.initializers.variance_scaling(
        scale, mode, "normal" if distribution == "normal" else "uniform",
        in_axis=in_axis, out_axis=out_axis, dtype=dtype,
    )


def default_init(scale: float = 1.0):
    """Reference ``layers.py:86-91``: variance_scaling(scale, fan_avg, uniform)."""
    return variance_scaling(scale, "fan_avg", "uniform")


class NIN(nn.Module):
    """1x1 'network in network' via einsum (reference ``layers.py:546-556``).
    Operates on NHWC: y = x @ W + b over the channel axis."""

    num_units: int
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        W = self.param("W", default_init(self.init_scale), (in_dim, self.num_units))
        b = self.param("b", nn.initializers.zeros, (self.num_units,))
        return jnp.einsum("...c,cd->...d", x, W) + b


def ddpm_conv1x1(features: int, init_scale: float = 1.0, bias: bool = True):
    """Reference ``layers.py:108-115``. NHWC conv factory."""
    return nn.Conv(
        features, (1, 1), use_bias=bias, kernel_init=default_init(init_scale),
        bias_init=nn.initializers.zeros,
    )


def ddpm_conv3x3(
    features: int, stride: int = 1, init_scale: float = 1.0, bias: bool = True,
    dilation: int = 1, padding=((1, 1), (1, 1)),
):
    """Reference ``layers.py:118-125``."""
    if dilation > 1:
        padding = ((dilation, dilation), (dilation, dilation))
    return nn.Conv(
        features, (3, 3), strides=(stride, stride), padding=padding,
        kernel_dilation=(dilation, dilation), use_bias=bias,
        kernel_init=default_init(init_scale), bias_init=nn.initializers.zeros,
    )


def group_norm(channels: int, eps: float = 1e-6):
    """GroupNorm(min(C//4, 32)) as used throughout NCSN++
    (e.g. reference ``layerspp.py:67-68``)."""
    return nn.GroupNorm(num_groups=max(min(channels // 4, 32), 1), epsilon=eps)
