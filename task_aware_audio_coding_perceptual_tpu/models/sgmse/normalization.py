"""Normalization layers (reference ``ncsnpp_utils/normalization.py``).

Conditional instance/batch/variance norms from the NCSNv1/v2 lineage —
mostly legacy in the reference too (the live NCSN++ path uses GroupNorm),
provided for backbone-zoo completeness. NHWC layout; class conditioning via
embedding-indexed scale/shift like the reference's ``ConditionalNorm2d``
family.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def get_normalization(norm: str, conditional: bool = False):
    """Factory (reference ``normalization.py:get_normalization``)."""
    table = {
        ("InstanceNorm", False): InstanceNorm2d,
        ("InstanceNorm", True): ConditionalInstanceNorm2d,
        ("InstanceNorm++", False): InstanceNorm2dPlus,
        ("InstanceNorm++", True): ConditionalInstanceNorm2dPlus,
        ("VarianceNorm", False): VarianceNorm2d,
        ("VarianceNorm", True): ConditionalVarianceNorm2d,
        ("GroupNorm", False): lambda features: nn.GroupNorm(
            num_groups=max(min(features // 4, 32), 1)
        ),
    }
    key = (norm, conditional)
    if key not in table:
        raise NotImplementedError(f"{norm} (conditional={conditional}) not implemented")
    return table[key]


class InstanceNorm2d(nn.Module):
    features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + 1e-5)
        gamma = self.param("gamma", nn.initializers.ones, (self.features,))
        h = h * gamma
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (self.features,))
            h = h + beta
        return h


class VarianceNorm2d(nn.Module):
    """Scale by 1/std only, no centering (NCSNv1 trick)."""

    features: int
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = x / jnp.sqrt(var + 1e-5)
        alpha = self.param(
            "alpha", lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s), (self.features,)
        )
        out = h * alpha
        if self.bias:
            out = out + self.param("beta", nn.initializers.zeros, (self.features,))
        return out


class InstanceNorm2dPlus(nn.Module):
    """InstanceNorm++: re-injects the per-channel mean statistics so color
    shift information survives normalization (NCSNv2)."""

    features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        means = jnp.mean(x, axis=(1, 2))  # (B, C)
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.std(means, axis=-1, keepdims=True)
        means_norm = (means - m) / (v + 1e-5)

        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + 1e-5)

        gamma = self.param("gamma", nn.initializers.ones, (self.features,))
        alpha = self.param(
            "alpha", lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s), (self.features,)
        )
        h = h + means_norm[:, None, None, :] * alpha
        out = h * gamma
        if self.bias:
            out = out + self.param("beta", nn.initializers.zeros, (self.features,))
        return out


class _CondScaleShift(nn.Module):
    num_classes: int
    features: int
    n_out: int  # 2 (gamma/alpha style) or 3 (gamma, alpha, beta)

    @nn.compact
    def __call__(self, y):
        emb = nn.Embed(
            self.num_classes,
            self.features * self.n_out,
            embedding_init=nn.initializers.normal(0.02),
        )(y)
        return jnp.split(emb, self.n_out, axis=-1)


class ConditionalInstanceNorm2d(nn.Module):
    features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + 1e-5)
        if self.bias:
            gamma, beta = _CondScaleShift(self.num_classes, self.features, 2)(y)
            return h * gamma[:, None, None, :] + beta[:, None, None, :]
        (gamma,) = _CondScaleShift(self.num_classes, self.features, 1)(y)
        return h * gamma[:, None, None, :]


class ConditionalVarianceNorm2d(nn.Module):
    features: int
    num_classes: int

    @nn.compact
    def __call__(self, x, y):
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = x / jnp.sqrt(var + 1e-5)
        (alpha,) = _CondScaleShift(self.num_classes, self.features, 1)(y)
        return h * alpha[:, None, None, :]


class ConditionalInstanceNorm2dPlus(nn.Module):
    features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        means = jnp.mean(x, axis=(1, 2))
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.std(means, axis=-1, keepdims=True)
        means_norm = (means - m) / (v + 1e-5)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + 1e-5)
        if self.bias:
            gamma, alpha, beta = _CondScaleShift(self.num_classes, self.features, 3)(y)
            h = h + means_norm[:, None, None, :] * alpha[:, None, None, :]
            return h * gamma[:, None, None, :] + beta[:, None, None, :]
        gamma, alpha = _CondScaleShift(self.num_classes, self.features, 2)(y)
        h = h + means_norm[:, None, None, :] * alpha[:, None, None, :]
        return h * gamma[:, None, None, :]
