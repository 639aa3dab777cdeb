"""Residual conv encoder/decoder with per-stage LayerNorm.

TPU-native equivalent of the reference's ``corrected_model/``
(``encoder.py:10-78``, ``decoder.py:10-87``, ``resnet.py:4-27``): strided
conv x4 downsampling with LayerNorm over all non-batch dims + LNBlock
residual stacks + a 2-hidden-layer MLP head; the decoder mirrors with
nearest x2 upsampling. Shapes are computed statically (the reference probes
them with a dummy forward, ``encoder.py:57-63``). Layout NHWC internally;
public API takes/returns NCHW like the reference.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ENC_FILTERS = (16, 32, 64, 128)  # reference encoder.py:22
DEC_FILTERS = (8, 16, 32, 64)  # reference decoder.py:24


def _full_layernorm(x):
    """LayerNorm over all non-batch axes with elementwise affine, matching
    torch nn.LayerNorm(feature_shape) (reference ``resnet.py:11-14``)."""
    axes = tuple(range(1, x.ndim))
    return nn.LayerNorm(reduction_axes=axes, feature_axes=axes)(x)


class LNBlock(nn.Module):
    """conv-LN-relu-conv, +identity, LN, relu (reference ``resnet.py:4-27``).
    Operates on NHWC."""

    channels: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.channels, (3, 3), padding="SAME")(x)
        y = _full_layernorm(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME")(y)
        y = y + x
        y = _full_layernorm(y)
        return nn.relu(y)


def _down_shape(h: int) -> int:
    # conv k3 s2 p1: ceil(h/2)
    return (h + 1) // 2


class ResEncoder(nn.Module):
    """(B, C, H, W) -> (B, feature_dim) (reference ``encoder.py:10-78``)."""

    input_shape: Tuple[int, int, int]  # (C, H, W)
    feature_dim: int
    n_downsamples: int = 4
    n_res_blocks: int = 3
    n_hidden_layers: int = 2
    hidden_size: int = 256

    @nn.compact
    def __call__(self, obs):
        x = jnp.transpose(obs, (0, 2, 3, 1))  # NHWC
        for i in range(self.n_downsamples):
            x = nn.Conv(ENC_FILTERS[i], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))(x)
            x = _full_layernorm(x)
            x = nn.relu(x)
            for _ in range(self.n_res_blocks):
                x = LNBlock(ENC_FILTERS[i])(x)
        h = x.reshape(x.shape[0], -1)
        for _ in range(self.n_hidden_layers):
            h = nn.relu(nn.Dense(self.hidden_size)(h))
        out = nn.Dense(self.feature_dim)(h)
        return out, None


class ResDecoder(nn.Module):
    """(B, feature_dim) -> (B, C, H, W) (reference ``decoder.py:10-87``)."""

    output_shape: Tuple[int, int, int]  # (C, H, W)
    feature_dim: int
    n_upsamples: int = 4
    n_res_blocks: int = 1
    final_upsample_filters: int = 16
    n_hidden_layers: int = 2
    hidden_size: int = 256

    @nn.compact
    def __call__(self, feature):
        C, H, W = self.output_shape
        sh, sw = H // 2**self.n_upsamples, W // 2**self.n_upsamples
        smallest = (DEC_FILTERS[self.n_upsamples - 1], sh, sw)

        h = feature
        for _ in range(self.n_hidden_layers):
            h = nn.relu(nn.Dense(self.hidden_size)(h))
        h = nn.Dense(int(np.prod(smallest)))(h)
        x = h.reshape(-1, *smallest)  # NCHW like torch view
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC

        # mirror reference decoder.forward_conv: i from n_upsamples-1 down to 0
        for i in range(self.n_upsamples - 1, -1, -1):
            for _ in range(self.n_res_blocks):
                x = LNBlock(x.shape[-1])(x)
            # nearest x2 upsample (F.interpolate default)
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            out_ch = self.final_upsample_filters if i == 0 else DEC_FILTERS[i - 1]
            x = nn.Conv(out_ch, (3, 3), padding="SAME")(x)
            x = _full_layernorm(x)
            x = nn.relu(x)
        x = nn.Conv(C, (3, 3), padding="SAME")(x)
        return jnp.transpose(x, (0, 3, 1, 2))  # NCHW
