"""FIR up/down-sampling layers (reference ``ncsnpp_utils/up_or_down_sampling.py``).

All functions operate on NHWC and route through the fused TPU upfirdn2d op
(``ops/upfirdn2d.py``); the fused conv variants perform the transposed /
strided convolution with XLA convs and a single FIR pass, mirroring
``upsample_conv_2d`` (reference ``:72-141``) / ``conv_downsample_2d``
(``:144-178``).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from task_aware_audio_coding_perceptual_tpu.models.sgmse.layers import default_init
from task_aware_audio_coding_perceptual_tpu.ops.upfirdn2d import setup_kernel, upfirdn2d


def _nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


def _nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def naive_upsample_2d(x, factor: int = 2):
    """Nearest-neighbor upsample (reference ``:59-63``). NHWC."""
    B, H, W, C = x.shape
    x = x.reshape(B, H, 1, W, 1, C)
    x = jnp.tile(x, (1, 1, factor, 1, factor, 1))
    return x.reshape(B, H * factor, W * factor, C)


def naive_downsample_2d(x, factor: int = 2):
    """Mean-pool downsample (reference ``:66-69``). NHWC."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // factor, factor, W // factor, factor, C)
    return jnp.mean(x, axis=(2, 4))


def upsample_2d(x, k: Sequence[float] = None, factor: int = 2, gain: float = 1.0):
    """FIR upsample (reference ``:195-224``). NHWC."""
    if k is None:
        k = [1] * factor
    k2 = setup_kernel(k) * (gain * (factor**2))
    p = k2.shape[0] - factor
    out = upfirdn2d(
        _nchw(x), jnp.asarray(k2), up=factor, pad=((p + 1) // 2 + factor - 1, p // 2)
    )
    return _nhwc(out)


def downsample_2d(x, k: Sequence[float] = None, factor: int = 2, gain: float = 1.0):
    """FIR downsample (reference ``:227-257``). NHWC."""
    if k is None:
        k = [1] * factor
    k2 = setup_kernel(k) * gain
    p = k2.shape[0] - factor
    out = upfirdn2d(_nchw(x), jnp.asarray(k2), down=factor, pad=((p + 1) // 2, p // 2))
    return _nhwc(out)


def upsample_conv_2d(x, w, k=None, factor: int = 2, gain: float = 1.0):
    """Fused transposed-conv + FIR (reference ``:72-141``).

    x: NHWC; w: (kh, kw, in_ch, out_ch) HWIO.
    """
    assert isinstance(factor, int) and factor >= 1
    convH, convW, inC, outC = w.shape[0], w.shape[1], w.shape[2], w.shape[3]
    assert convW == convH
    if k is None:
        k = [1] * factor
    k2 = setup_kernel(k) * (gain * (factor**2))
    p = (k2.shape[0] - factor) - (convW - 1)

    # grouped conv_transpose matching torch's F.conv_transpose2d semantics
    out = lax.conv_transpose(
        x,
        w,
        strides=(factor, factor),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )
    out = upfirdn2d(
        _nchw(out), jnp.asarray(k2), pad=((p + 1) // 2 + factor - 1, p // 2 + 1)
    )
    return _nhwc(out)


def conv_downsample_2d(x, w, k=None, factor: int = 2, gain: float = 1.0):
    """Fused FIR + strided conv (reference ``:144-178``). x NHWC, w HWIO."""
    convH, convW = w.shape[0], w.shape[1]
    assert convW == convH
    if k is None:
        k = [1] * factor
    k2 = setup_kernel(k) * gain
    p = (k2.shape[0] - factor) + (convW - 1)
    x = _nhwc(upfirdn2d(_nchw(x), jnp.asarray(k2), pad=((p + 1) // 2, p // 2)))
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(factor, factor),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class Conv2d(nn.Module):
    """Conv2d with optional fused up/downsampling (reference ``:23-56``)."""

    in_ch: int
    out_ch: int
    kernel: int
    up: bool = False
    down: bool = False
    resample_kernel: Sequence[float] = (1, 3, 3, 1)
    use_bias: bool = True
    kernel_init: object = None

    @nn.compact
    def __call__(self, x):
        assert not (self.up and self.down)
        assert self.kernel >= 1 and self.kernel % 2 == 1
        init = self.kernel_init or nn.initializers.zeros
        w = self.param(
            "weight", init, (self.kernel, self.kernel, self.in_ch, self.out_ch)
        )
        if self.up:
            x = upsample_conv_2d(x, w, k=self.resample_kernel)
        elif self.down:
            x = conv_downsample_2d(x, w, k=self.resample_kernel)
        else:
            x = lax.conv_general_dilated(
                x, w, window_strides=(1, 1),
                padding=((self.kernel // 2,) * 2, (self.kernel // 2,) * 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
            x = x + b
        return x
