"""ResNet-18 style image encoder (reference ``pkl_file_models.py:16-31``).

The reference wraps torchvision's *pretrained* resnet18 with a replaced
stem conv (for 2-channel spectrogram input) and a new FC head. Pretrained
ImageNet weights are not available offline, so this is the same
architecture with fresh initialization; load weights via the checkpoint
utilities if a converted set is provided.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False)(x)
            residual = nn.BatchNorm(use_running_average=not train)(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """(B, C, H, W) -> (z (B, output_size), None)."""

    input_channels: int = 2
    output_size: int = 128
    stage_sizes: Tuple[int, ...] = (2, 2, 2, 2)  # resnet18
    widths: Tuple[int, ...] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (n, w) in enumerate(zip(self.stage_sizes, self.widths)):
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                h = BasicBlock(w, stride)(h, train)
        h = jnp.mean(h, axis=(1, 2))  # global average pool
        return nn.Dense(self.output_size)(h), None
