"""SDE library: OU Variance-Exploding and Schrödinger-Bridge VE SDEs.

Functional JAX re-design of the reference's SDE classes
(``sgmse/sgmse/sdes.py``): SDEs are frozen dataclasses with pure methods
(trace/jit/scan-friendly); the reverse SDE is a small value object built
from a score function, mirroring ``SDE.reverse`` (``sdes.py:91-137``).

All tensors broadcast over a trailing (B, C, F, T)-style layout: scalar
per-batch quantities are reshaped with ``_bcast``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from task_aware_audio_coding_perceptual_tpu.registry import Registry

SDERegistry = Registry("SDE")


def _bcast(a: jax.Array, x: jax.Array) -> jax.Array:
    """Broadcast per-batch scalars over x's trailing dims
    (reference ``util/tensors.py:1-16``)."""
    return a.reshape(a.shape[0], *([1] * (x.ndim - 1)))


@dataclasses.dataclass(frozen=True)
class ReverseSDE:
    """Reverse-time SDE/ODE built from a forward SDE + score function
    (reference ``sdes.py:91-137``)."""

    fwd: "SDE"
    score_fn: Callable
    probability_flow: bool = False

    @property
    def N(self):
        return self.fwd.N

    @property
    def T(self):
        return self.fwd.T

    def sde(self, x, y, t):
        drift, diffusion = self.fwd.sde(x, y, t)
        score = self.score_fn(x, y, t)
        score_drift = (
            -_bcast(diffusion, x) ** 2 * score * (0.5 if self.probability_flow else 1.0)
        )
        total_drift = drift + score_drift
        out_diffusion = jnp.zeros_like(diffusion) if self.probability_flow else diffusion
        return total_drift, out_diffusion

    def discretize(self, x, y, t, stepsize):
        f, G = self.fwd.discretize(x, y, t, stepsize)
        rev_f = f - _bcast(G, x) ** 2 * self.score_fn(x, y, t) * (
            0.5 if self.probability_flow else 1.0
        )
        rev_G = jnp.zeros_like(G) if self.probability_flow else G
        return rev_f, rev_G


@dataclasses.dataclass(frozen=True)
class SDE:
    """Abstract SDE over mini-batches (reference ``sdes.py:19-141``)."""

    N: int = 30

    @property
    def T(self):
        return 1.0

    def sde(self, x, y, t) -> Tuple[jax.Array, jax.Array]:
        raise NotImplementedError

    def marginal_prob(self, x0, y, t) -> Tuple[jax.Array, jax.Array]:
        raise NotImplementedError

    def prior_sampling(self, key, shape, y) -> jax.Array:
        raise NotImplementedError

    def discretize(self, x, y, t, stepsize):
        """Euler-Maruyama discretization (reference ``sdes.py:72-89``)."""
        dt = stepsize
        drift, diffusion = self.sde(x, y, t)
        f = drift * dt
        G = diffusion * jnp.sqrt(dt)
        return f, G

    def reverse(self, score_fn, probability_flow: bool = False) -> ReverseSDE:
        return ReverseSDE(self, score_fn, probability_flow)


@SDERegistry.register("ouve")
@dataclasses.dataclass(frozen=True)
class OUVESDE(SDE):
    """Ornstein-Uhlenbeck Variance Exploding SDE (reference ``sdes.py:144-232``):

        dx = theta (y - x) dt + sigma(t) dw,
        sigma(t) = sigma_min (sigma_max/sigma_min)^t sqrt(2 log(sigma_max/sigma_min))
    """

    theta: float = 1.5
    sigma_min: float = 0.05
    sigma_max: float = 0.5
    N: int = 30
    sampler_type: str = "pc"

    @property
    def logsig(self):
        return np.log(self.sigma_max / self.sigma_min)

    def copy(self, **updates) -> "OUVESDE":
        return dataclasses.replace(self, **updates)

    def sde(self, x, y, t):
        drift = self.theta * (y - x)
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        diffusion = sigma * np.sqrt(2 * self.logsig)
        return drift, diffusion

    def _mean(self, x0, y, t):
        exp_interp = _bcast(jnp.exp(-self.theta * t), x0)
        return exp_interp * x0 + (1 - exp_interp) * y

    def alpha(self, t):
        return jnp.exp(-self.theta * t)

    def _std(self, t):
        sigma_min, theta, logsig = self.sigma_min, self.theta, self.logsig
        return jnp.sqrt(
            (
                sigma_min**2
                * jnp.exp(-2 * theta * t)
                * (jnp.exp(2 * (theta + logsig) * t) - 1)
                * logsig
            )
            / (theta + logsig)
        )

    def marginal_prob(self, x0, y, t):
        return self._mean(x0, y, t), self._std(t)

    def prior_sampling(self, key, shape, y):
        std = self._std(jnp.ones((y.shape[0],)))
        if jnp.iscomplexobj(y):
            kr, ki = jax.random.split(key)
            noise = (
                jax.random.normal(kr, y.shape) + 1j * jax.random.normal(ki, y.shape)
            ) / np.sqrt(2.0)
        else:
            noise = jax.random.normal(key, y.shape, dtype=jnp.float32)
        return y + noise * _bcast(std, y)


@SDERegistry.register("sbve")
@dataclasses.dataclass(frozen=True)
class SBVESDE(SDE):
    """Schrödinger-bridge VE SDE (reference ``sdes.py:235-313``;
    Jukić et al. 2024, Table 1 / Eq. (9)-(11))."""

    k: float = 2.6
    c: float = 0.4
    N: int = 50
    eps: float = 1e-8
    sampler_type: str = "ode"

    def copy(self, **updates) -> "SBVESDE":
        return dataclasses.replace(self, **updates)

    def sde(self, x, y, t):
        f = jnp.zeros_like(t)
        g = jnp.sqrt(jnp.asarray(self.c)) * self.k**t
        return f, g

    def _sigmas_alphas(self, t):
        alpha_t = jnp.ones_like(t)
        alpha_T = jnp.ones_like(t)
        # variances computed directly so sigma_bart^2 = var_T - var_t is the
        # *algebraic* difference c(k^{2T} - k^{2t})/(2 ln k): subtracting two
        # near-equal squares at t ~ T is catastrophic in f32 once XLA
        # reassociates it (samplers diverge), this form is exact at t = T.
        two_logk = 2 * np.log(self.k)
        var_t = self.c * (self.k ** (2 * t) - 1.0) / two_logk
        var_T = self.c * (self.k ** (2 * self.T) - 1.0) / two_logk * jnp.ones_like(t)
        var_bar = self.c * (self.k ** (2 * self.T) - self.k ** (2 * t)) / two_logk
        sigma_t = jnp.sqrt(var_t)
        sigma_T = jnp.sqrt(var_T)
        alpha_bart = alpha_t / (alpha_T + self.eps)
        sigma_bart = jnp.sqrt(var_bar + self.eps)
        return sigma_t, sigma_T, sigma_bart, alpha_t, alpha_T, alpha_bart

    def _mean(self, x0, y, t):
        sigma_t, sigma_T, sigma_bart, alpha_t, alpha_T, alpha_bart = self._sigmas_alphas(t)
        w_xt = alpha_t * sigma_bart**2 / (sigma_T**2 + self.eps)
        w_yt = alpha_bart * sigma_t**2 / (sigma_T**2 + self.eps)
        return _bcast(w_xt, x0) * x0 + _bcast(w_yt, y) * y

    def _std(self, t):
        sigma_t, sigma_T, sigma_bart, alpha_t, _, _ = self._sigmas_alphas(t)
        return (alpha_t * sigma_bart * sigma_t) / (sigma_T + self.eps)

    def marginal_prob(self, x0, y, t):
        return self._mean(x0, y, t), self._std(t)

    def prior_sampling(self, key, shape, y):
        return y
