"""NCSN++ building blocks (reference ``ncsnpp_utils/layerspp.py``). NHWC.

ResnetBlockBigGANpp / ResnetBlockDDPMpp, full-H×W self-attention
(AttnBlockpp), FIR Upsample/Downsample and the Combine skip-combiner.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from task_aware_audio_coding_perceptual_tpu.models.sgmse import up_or_down_sampling
from task_aware_audio_coding_perceptual_tpu.models.sgmse.layers import (
    NIN,
    ddpm_conv1x1,
    ddpm_conv3x3,
    default_init,
    group_norm,
)


class Combine(nn.Module):
    """conv1x1 then cat/sum with skip (reference ``layerspp.py:44-59``)."""

    dim2: int
    method: str = "cat"

    @nn.compact
    def __call__(self, x, y):
        h = ddpm_conv1x1(self.dim2)(x)
        if self.method == "cat":
            return jnp.concatenate([h, y], axis=-1)
        elif self.method == "sum":
            return h + y
        raise ValueError(f"Method {self.method} not recognized.")


class AttnBlockpp(nn.Module):
    """Full H*W self-attention block (reference ``layerspp.py:62-91``).

    ``use_flash=True`` routes through the Pallas online-softmax kernel
    (``ops/attention.py``) — O(HW·C) memory instead of O((HW)^2), for
    fullband/48 kHz frame counts. Default path: MXU einsum + f32 softmax.

    ``use_flash=None`` (auto) picks per-shape: flash on TPU when the
    sequence is long enough to win (H*W >= 1024); the einsum path
    otherwise. Measured at the reference training size (16x16 attention,
    256 tokens, nf=128): einsum is faster to compile (94 s vs 159 s grad)
    AND to execute (0.054 vs 0.062 s/step) — the flash kernel only pays
    off once the O((HW)^2) score matrix stops fitting cache-friendly MXU
    tiles (fullband 48 kHz frames, ~4k+ tokens).
    """

    channels: int
    skip_rescale: bool = False
    init_scale: float = 0.0
    use_flash: "bool | None" = None

    FLASH_MIN_SEQ = 1024

    @nn.compact
    def __call__(self, x):
        from task_aware_audio_coding_perceptual_tpu.ops.attention import (
            attention_ref,
            flash_attention,
        )

        B, H, W, C = x.shape
        h = group_norm(C)(x)
        q = NIN(C)(h)
        k = NIN(C)(h)
        v = NIN(C)(h)

        q = q.reshape(B, H * W, C)
        k = k.reshape(B, H * W, C)
        v = v.reshape(B, H * W, C)
        use_flash = self.use_flash
        if use_flash is None:
            import jax

            use_flash = (
                jax.default_backend() == "tpu" and H * W >= self.FLASH_MIN_SEQ
            )
        if use_flash:
            h = flash_attention(q, k, v)
        else:
            h = attention_ref(q, k, v)
        h = h.reshape(B, H, W, C)
        h = NIN(C, init_scale=self.init_scale)(h)
        if not self.skip_rescale:
            return x + h
        return (x + h) / np.sqrt(2.0)


class Upsample(nn.Module):
    """(reference ``layerspp.py:94-126``)."""

    in_ch: Optional[int] = None
    out_ch: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Sequence[float] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_ch or self.in_ch or x.shape[-1]
        B, H, W, C = x.shape
        if not self.fir:
            h = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
            if self.with_conv:
                h = ddpm_conv3x3(out_ch)(h)
        else:
            if not self.with_conv:
                h = up_or_down_sampling.upsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = up_or_down_sampling.Conv2d(
                    C, out_ch, kernel=3, up=True,
                    resample_kernel=self.fir_kernel,
                    use_bias=True, kernel_init=default_init(),
                )(x)
        return h


class Downsample(nn.Module):
    """(reference ``layerspp.py:129-163``)."""

    in_ch: Optional[int] = None
    out_ch: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Sequence[float] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_ch or self.in_ch or x.shape[-1]
        B, H, W, C = x.shape
        if not self.fir:
            if self.with_conv:
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding="VALID")(x)
            else:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        else:
            if not self.with_conv:
                x = up_or_down_sampling.downsample_2d(x, self.fir_kernel, factor=2)
            else:
                x = up_or_down_sampling.Conv2d(
                    C, out_ch, kernel=3, down=True,
                    resample_kernel=self.fir_kernel,
                    use_bias=True, kernel_init=default_init(),
                )(x)
        return x


class ResnetBlockDDPMpp(nn.Module):
    """DDPM residual block (reference ``layerspp.py:166-209``)."""

    act: callable
    in_ch: int
    out_ch: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0
    temb_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False):
        out_ch = self.out_ch or self.in_ch
        h = self.act(group_norm(self.in_ch)(x))
        h = ddpm_conv3x3(out_ch)(h)
        if temb is not None:
            h = h + nn.Dense(out_ch, kernel_init=default_init())(self.act(temb))[:, None, None, :]
        h = self.act(group_norm(out_ch)(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = ddpm_conv3x3(out_ch, init_scale=self.init_scale)(h)
        if x.shape[-1] != out_ch:
            if self.conv_shortcut:
                x = ddpm_conv3x3(out_ch)(x)
            else:
                x = NIN(out_ch)(x)
        if not self.skip_rescale:
            return x + h
        return (x + h) / np.sqrt(2.0)


class ResnetBlockBigGANpp(nn.Module):
    """BigGAN residual block with optional FIR up/down
    (reference ``layerspp.py:212-274``)."""

    act: callable
    in_ch: int
    out_ch: Optional[int] = None
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    fir: bool = False
    fir_kernel: Sequence[float] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0
    temb_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False):
        out_ch = self.out_ch or self.in_ch
        h = self.act(group_norm(self.in_ch)(x))

        if self.up:
            if self.fir:
                h = up_or_down_sampling.upsample_2d(h, self.fir_kernel, factor=2)
                x = up_or_down_sampling.upsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = up_or_down_sampling.naive_upsample_2d(h, factor=2)
                x = up_or_down_sampling.naive_upsample_2d(x, factor=2)
        elif self.down:
            if self.fir:
                h = up_or_down_sampling.downsample_2d(h, self.fir_kernel, factor=2)
                x = up_or_down_sampling.downsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = up_or_down_sampling.naive_downsample_2d(h, factor=2)
                x = up_or_down_sampling.naive_downsample_2d(x, factor=2)

        h = ddpm_conv3x3(out_ch)(h)
        if temb is not None:
            h = h + nn.Dense(out_ch, kernel_init=default_init())(self.act(temb))[:, None, None, :]
        h = self.act(group_norm(out_ch)(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = ddpm_conv3x3(out_ch, init_scale=self.init_scale)(h)

        if self.in_ch != out_ch or self.up or self.down:
            x = ddpm_conv1x1(out_ch)(x)

        if not self.skip_rescale:
            return x + h
        return (x + h) / np.sqrt(2.0)
