"""Legacy score-SDE helpers + NCSNv1 refinement blocks.

Completeness equivalents of the reference's vestigial modules
(``ncsnpp_utils/utils.py`` — get_sigmas / score-fn builders from
yang-song/score_sde — and the CRP/RCU/MSF/RefineBlock family in
``ncsnpp_utils/layers.py:133-349``). Not used by the live NCSN++ path, kept
for backbone-zoo parity. NHWC.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def get_sigmas(sigma_min: float, sigma_max: float, num_scales: int) -> np.ndarray:
    """Geometric noise ladder sigma_max -> sigma_min (reference
    ``ncsnpp_utils/utils.py``)."""
    return np.exp(np.linspace(np.log(sigma_max), np.log(sigma_min), num_scales)).astype(
        np.float32
    )


def get_ddpm_params(beta_min: float = 0.1, beta_max: float = 20.0, num_steps: int = 1000):
    """DDPM discrete schedule quantities."""
    betas = np.linspace(beta_min / num_steps, beta_max / num_steps, num_steps, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    return {
        "betas": betas.astype(np.float32),
        "alphas": alphas.astype(np.float32),
        "alphas_cumprod": alphas_cumprod.astype(np.float32),
        "sqrt_alphas_cumprod": np.sqrt(alphas_cumprod).astype(np.float32),
        "sqrt_1m_alphas_cumprod": np.sqrt(1.0 - alphas_cumprod).astype(np.float32),
        "beta_min": beta_min,
        "beta_max": beta_max,
        "num_diffusion_timesteps": num_steps,
    }


def get_score_fn(model_apply, params, sde, continuous: bool = True):
    """Wrap a backbone apply into a score function (reference utils.py)."""

    def score_fn(x, y, t):
        return model_apply(params, x, y, t)

    return score_fn


class CRPBlock(nn.Module):
    """Chained residual pooling (reference ``layers.py:133-...``)."""

    features: int
    n_stages: int = 2
    act: callable = nn.relu

    @nn.compact
    def __call__(self, x):
        x = self.act(x)
        path = x
        for _ in range(self.n_stages):
            path = nn.max_pool(path, (5, 5), strides=(1, 1), padding="SAME")
            path = nn.Conv(self.features, (3, 3), use_bias=False, padding="SAME")(path)
            x = x + path
        return x


class RCUBlock(nn.Module):
    """Residual conv unit."""

    features: int
    n_blocks: int = 2
    n_stages: int = 2
    act: callable = nn.relu

    @nn.compact
    def __call__(self, x):
        for _ in range(self.n_blocks):
            residual = x
            for _ in range(self.n_stages):
                x = self.act(x)
                x = nn.Conv(self.features, (3, 3), use_bias=False, padding="SAME")(x)
            x = x + residual
        return x


class MSFBlock(nn.Module):
    """Multi-scale fusion: project each input and sum at a target shape."""

    features: int

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], shape):
        total = jnp.zeros((xs[0].shape[0], shape[0], shape[1], self.features), xs[0].dtype)
        for x in xs:
            h = nn.Conv(self.features, (3, 3), use_bias=True, padding="SAME")(x)
            h = jax.image.resize(
                h, (h.shape[0], shape[0], shape[1], h.shape[-1]), method="bilinear"
            )
            total = total + h
        return total


class RefineBlock(nn.Module):
    """RefineNet block: RCU per path -> MSF -> CRP -> output RCU."""

    features: int
    act: callable = nn.relu
    start: bool = False
    end: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], output_shape):
        hs = [RCUBlock(x.shape[-1], act=self.act)(x) for x in xs]
        if len(hs) > 1:
            h = MSFBlock(self.features)(hs, output_shape)
        else:
            h = jax.image.resize(
                nn.Conv(self.features, (3, 3), padding="SAME")(hs[0]),
                (hs[0].shape[0], output_shape[0], output_shape[1], self.features),
                method="bilinear",
            )
        h = CRPBlock(self.features, act=self.act)(h)
        return RCUBlock(self.features, n_blocks=3 if self.end else 1, act=self.act)(h)
