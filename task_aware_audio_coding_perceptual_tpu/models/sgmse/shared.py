"""Shared backbone utilities (reference ``sgmse/sgmse/backbones/shared.py``).

BackboneRegistry, Gaussian Fourier time embeddings (real and complex),
diffusion-step embeddings, and complex-valued layer wrappers built from
pairs of real layers: M(x) = (Re M)(Re x) - (Im M)(Im x)
                          + i[(Re M)(Im x) + (Im M)(Re x)].
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from task_aware_audio_coding_perceptual_tpu.registry import Registry

BackboneRegistry = Registry("Backbone")


class GaussianFourierProjection(nn.Module):
    """Gaussian random features for noise levels
    (reference ``shared.py:13-34``; ``layerspp.py:32-41``). The projection
    matrix is a frozen random parameter."""

    embedding_size: int = 256
    scale: float = 1.0
    complex_valued: bool = False

    @nn.compact
    def __call__(self, t):
        if not self.complex_valued:
            # For real-valued output, sample (0, 2pi) uniformly via both sin
            # and cos features (matches the reference's real branch).
            t = t * 2 * np.pi
        W = self.param(
            "W",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.embedding_size,),
        )
        W = jax.lax.stop_gradient(W)  # requires_grad=False in the reference
        t_proj = t[:, None] * W[None, :]
        if self.complex_valued:
            return jnp.exp(1j * 2 * np.pi * t_proj)
        return jnp.concatenate([jnp.sin(t_proj), jnp.cos(t_proj)], axis=-1)


class DiffusionStepEmbedding(nn.Module):
    """DiffWave-style fixed log-spaced embedding (reference ``shared.py:37-57``)."""

    embed_dim_scale: int = 128
    complex_valued: bool = False

    @nn.compact
    def __call__(self, diffusion_step):
        scale = self.embed_dim_scale if self.complex_valued else self.embed_dim_scale // 2
        fac = 10 ** (4 * jnp.arange(scale) / (scale - 1))
        inner = diffusion_step[:, None] * fac[None, :]
        if self.complex_valued:
            return jnp.exp(1j * inner)
        return jnp.concatenate([jnp.sin(inner), jnp.cos(inner)], axis=-1)


class ComplexDense(nn.Module):
    """Complex-valued Dense from two real Denses (reference ``shared.py:60-75``)."""

    features: int

    @nn.compact
    def __call__(self, x):
        re = nn.Dense(self.features, name="re")
        im = nn.Dense(self.features, name="im")
        return (re(x.real) - im(x.imag)) + 1j * (re(x.imag) + im(x.real))


class ComplexConv2d(nn.Module):
    """Complex conv via real/imag pair (reference ``shared.py:94-123``). NHWC."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: str | tuple = "SAME"
    kernel_dilation: tuple = (1, 1)

    @nn.compact
    def __call__(self, x):
        conv = lambda name: nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            kernel_dilation=self.kernel_dilation,
            name=name,
        )
        re, im = conv("re"), conv("im")
        return (re(x.real) - im(x.imag)) + 1j * (re(x.imag) + im(x.real))


class ComplexConvTranspose2d(nn.Module):
    """Complex transposed conv (reference ``shared.py:116-123``). NHWC."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: str | tuple = "SAME"

    @nn.compact
    def __call__(self, x):
        conv = lambda name: nn.ConvTranspose(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            name=name,
        )
        re, im = conv("re"), conv("im")
        return (re(x.real) - im(x.imag)) + 1j * (re(x.imag) + im(x.real))
