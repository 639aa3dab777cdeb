"""Multi-Scale STFT (MS-STFT) discriminator.

TPU-native re-design of the reference's EnCodec-style discriminator
(``msstftd.py:91-192``): three STFT sub-discriminators at scales
n_fft {1024, 2048, 512} / hop {256, 512, 128}; each computes a complex
spectrogram (center=False, magnitude-normalized like torchaudio's
``normalized=True``), concatenates real/imag as channels, and runs a stack
of 2-D convs with time-dilations (1, 2, 4) under weight norm and LeakyReLU,
returning per-scale logits and per-layer feature maps.

Layout is NHWC ((B, time, freq, C)); the reference rearranges to
``b c t w`` so its conv H axis is time and W is frequency — dilation and
stride axes here match that orientation.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu import dsp

FeatureMaps = List[jax.Array]
DiscriminatorOutput = Tuple[List[jax.Array], List[FeatureMaps]]


def get_2d_padding(kernel_size, dilation=(1, 1)):
    """Reference ``msstftd.py:87-88``."""
    return (
        ((kernel_size[0] - 1) * dilation[0]) // 2,
        ((kernel_size[1] - 1) * dilation[1]) // 2,
    )


def _spectrogram(x: jax.Array, n_fft: int, hop: int, win_length: int) -> jax.Array:
    """Complex STFT, center=False, torchaudio ``normalized=True``
    (divide by sqrt(sum(window^2))); x: (B, C, T) -> (B, C, F, frames)."""
    win = dsp.hann_window(win_length)
    spec = dsp.stft(x, n_fft, hop, window=win, win_length=win_length, center=False)
    return spec / jnp.sqrt(jnp.sum(win**2))


class NormConv2d(nn.Module):
    """Conv2d + weight norm (reference ``msstftd.py:64-78``). NHWC."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        conv = nn.WeightNorm(
            nn.Conv(
                self.features,
                self.kernel_size,
                strides=self.strides,
                kernel_dilation=self.dilation,
                padding=(
                    (self.padding[0], self.padding[0]),
                    (self.padding[1], self.padding[1]),
                ),
            )
        )
        return conv(x)


class DiscriminatorSTFT(nn.Module):
    """One STFT sub-discriminator (reference ``msstftd.py:91-159``)."""

    filters: int
    in_channels: int = 1
    out_channels: int = 1
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    max_filters: int = 1024
    filters_scale: int = 1
    kernel_size: Tuple[int, int] = (3, 9)
    dilations: Sequence[int] = (1, 2, 4)
    stride: Tuple[int, int] = (1, 2)
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array):
        """x: (B, C, T) waveform -> (logits (B, 1, t', w'), fmap list)."""
        z = _spectrogram(x, self.n_fft, self.hop_length, self.win_length)
        # (B, C, F, frames) -> real/imag channels -> NHWC as (B, t, w=F, C)
        z = jnp.concatenate([z.real, z.imag], axis=1)
        z = jnp.transpose(z, (0, 3, 2, 1))  # (B, frames, F, 2C)

        fmap = []
        act = lambda v: nn.leaky_relu(v, self.negative_slope)

        z = NormConv2d(
            self.filters, self.kernel_size, padding=get_2d_padding(self.kernel_size)
        )(z)
        z = act(z)
        fmap.append(z)
        in_chs = min(self.filters_scale * self.filters, self.max_filters)
        for i, dilation in enumerate(self.dilations):
            out_chs = min((self.filters_scale ** (i + 1)) * self.filters, self.max_filters)
            z = NormConv2d(
                out_chs,
                self.kernel_size,
                strides=self.stride,
                dilation=(dilation, 1),
                padding=get_2d_padding(self.kernel_size, (dilation, 1)),
            )(z)
            z = act(z)
            fmap.append(z)
            in_chs = out_chs
        out_chs = min(
            (self.filters_scale ** (len(self.dilations) + 1)) * self.filters,
            self.max_filters,
        )
        z = NormConv2d(
            out_chs,
            (self.kernel_size[0], self.kernel_size[0]),
            padding=get_2d_padding((self.kernel_size[0], self.kernel_size[0])),
        )(z)
        z = act(z)
        fmap.append(z)
        z = NormConv2d(
            self.out_channels,
            (self.kernel_size[0], self.kernel_size[0]),
            padding=get_2d_padding((self.kernel_size[0], self.kernel_size[0])),
        )(z)
        return z, fmap


class MultiScaleSTFTDiscriminator(nn.Module):
    """Reference ``msstftd.py:162-192``."""

    filters: int
    in_channels: int = 1
    out_channels: int = 1
    n_ffts: Sequence[int] = (1024, 2048, 512)
    hop_lengths: Sequence[int] = (256, 512, 128)
    win_lengths: Sequence[int] = (1024, 2048, 512)

    @property
    def num_discriminators(self) -> int:
        return len(self.n_ffts)

    def setup(self):
        assert len(self.n_ffts) == len(self.hop_lengths) == len(self.win_lengths)
        self.discriminators = [
            DiscriminatorSTFT(
                self.filters,
                in_channels=self.in_channels,
                out_channels=self.out_channels,
                n_fft=self.n_ffts[i],
                win_length=self.win_lengths[i],
                hop_length=self.hop_lengths[i],
            )
            for i in range(len(self.n_ffts))
        ]

    def __call__(self, x: jax.Array) -> DiscriminatorOutput:
        """x: (B, C, T) waveform."""
        logits, fmaps = [], []
        for disc in self.discriminators:
            logit, fmap = disc(x)
            logits.append(logit)
            fmaps.append(fmap)
        return logits, fmaps
