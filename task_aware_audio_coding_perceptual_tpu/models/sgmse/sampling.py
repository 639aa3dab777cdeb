"""Sampling: predictors, correctors, PC / ODE / SB samplers.

Functional re-design of the reference's ``sgmse/sgmse/sampling/``:

- predictors (``predictors.py``): reverse_diffusion, euler_maruyama, none;
- correctors (``correctors.py``): ald (annealed Langevin), langevin, none;
- ``get_pc_sampler`` (``sampling/__init__.py:26-70``): the N-step loop is a
  single ``lax.scan`` — predictor+corrector per step, no host syncs, N
  static so the whole sampler compiles once;
- ``get_ode_sampler`` (``:73-143``): probability-flow ODE. The reference
  uses scipy RK45 on the host; here a jitted fixed-grid RK4 over the same
  (T -> eps) interval (a host/scipy path is available via
  ``ode_sampler_scipy`` for parity experiments);
- ``get_sb_sampler`` (``:145-249``): first-order Schrödinger-bridge
  discretizations, 'ode' and 'sde' variants, as scans.

Each sampler takes an explicit PRNG key and returns (sample, nfe).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from task_aware_audio_coding_perceptual_tpu.models.sgmse.sdes import SDE, _bcast
from task_aware_audio_coding_perceptual_tpu.registry import Registry

PredictorRegistry = Registry("Predictor")
CorrectorRegistry = Registry("Corrector")


def _randn_like(key, x):
    if jnp.iscomplexobj(x):
        k1, k2 = jax.random.split(key)
        return (
            jax.random.normal(k1, x.shape) + 1j * jax.random.normal(k2, x.shape)
        ) / np.sqrt(2.0)
    return jax.random.normal(key, x.shape, x.dtype)


# ---------------------------------------------------------------------------
# Predictors
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Predictor:
    sde: SDE
    score_fn: Callable
    probability_flow: bool = False

    def __post_init__(self):
        object.__setattr__(self, "rsde", self.sde.reverse(self.score_fn, self.probability_flow))

    def update_fn(self, key, x, y, t, stepsize):
        raise NotImplementedError


@PredictorRegistry.register("euler_maruyama")
@dataclasses.dataclass(frozen=True)
class EulerMaruyamaPredictor(Predictor):
    def update_fn(self, key, x, y, t, stepsize=None):
        dt = -1.0 / self.rsde.N
        z = _randn_like(key, x)
        f, g = self.rsde.sde(x, y, t)
        x_mean = x + f * dt
        x = x_mean + _bcast(g, x) * np.sqrt(-dt) * z
        return x, x_mean


@PredictorRegistry.register("reverse_diffusion")
@dataclasses.dataclass(frozen=True)
class ReverseDiffusionPredictor(Predictor):
    def update_fn(self, key, x, y, t, stepsize):
        f, g = self.rsde.discretize(x, y, t, stepsize)
        z = _randn_like(key, x)
        x_mean = x - f
        x = x_mean + _bcast(g, x) * z
        return x, x_mean


@PredictorRegistry.register("none")
@dataclasses.dataclass(frozen=True)
class NonePredictor(Predictor):
    def update_fn(self, key, x, y, t, stepsize=None):
        return x, x


# ---------------------------------------------------------------------------
# Correctors
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Corrector:
    sde: SDE
    score_fn: Callable
    snr: float
    n_steps: int

    def update_fn(self, key, x, y, t):
        raise NotImplementedError


@CorrectorRegistry.register("langevin")
@dataclasses.dataclass(frozen=True)
class LangevinCorrector(Corrector):
    def update_fn(self, key, x, y, t):
        target_snr = self.snr
        x_mean = x
        for i in range(self.n_steps):
            key, sub = jax.random.split(key)
            grad = self.score_fn(x, y, t)
            noise = _randn_like(sub, x)
            grad_norm = jnp.mean(
                jnp.linalg.norm(grad.reshape(grad.shape[0], -1), axis=-1)
            )
            noise_norm = jnp.mean(
                jnp.linalg.norm(noise.reshape(noise.shape[0], -1), axis=-1)
            )
            step_size = ((target_snr * noise_norm / grad_norm) ** 2 * 2)[None]
            x_mean = x + _bcast(step_size, x) * grad
            x = x_mean + noise * _bcast(jnp.sqrt(step_size * 2), x)
        return x, x_mean


@CorrectorRegistry.register("ald")
@dataclasses.dataclass(frozen=True)
class AnnealedLangevinDynamics(Corrector):
    """NCSN-style annealed Langevin: step ~ (snr * sigma(t))^2
    (reference ``correctors.py:59-81``)."""

    def update_fn(self, key, x, y, t):
        x_mean = x
        std = self.sde.marginal_prob(x, y, t)[1]
        for i in range(self.n_steps):
            key, sub = jax.random.split(key)
            grad = self.score_fn(x, y, t)
            noise = _randn_like(sub, x)
            step_size = (self.snr * std) ** 2 * 2
            x_mean = x + _bcast(step_size, x) * grad
            x = x_mean + noise * _bcast(jnp.sqrt(step_size * 2), x)
        return x, x_mean


@CorrectorRegistry.register("none")
@dataclasses.dataclass(frozen=True)
class NoneCorrector(Corrector):
    def update_fn(self, key, x, y, t):
        return x, x


# ---------------------------------------------------------------------------
# Samplers
# ---------------------------------------------------------------------------


def get_pc_sampler(
    predictor_name: str,
    corrector_name: str,
    sde: SDE,
    score_fn: Callable,
    y: jax.Array,
    denoise: bool = True,
    eps: float = 3e-2,
    snr: float = 0.1,
    corrector_steps: int = 1,
    probability_flow: bool = False,
    **ignored,
):
    """Predictor-Corrector sampler as one scan
    (reference ``sampling/__init__.py:26-70``)."""
    predictor = PredictorRegistry.get_by_name(predictor_name)(
        sde, score_fn, probability_flow
    )
    corrector = CorrectorRegistry.get_by_name(corrector_name)(
        sde, score_fn, snr=snr, n_steps=corrector_steps
    )

    timesteps = jnp.linspace(sde.T, eps, sde.N)
    # stepsize_i = t_i - t_{i+1}; last step integrates eps -> 0
    stepsizes = jnp.concatenate(
        [timesteps[:-1] - timesteps[1:], jnp.asarray([timesteps[-1]])]
    )

    def pc_sampler(key, y=y):
        # y may be passed at call time: jitting the sampler with the
        # conditioner as an *argument* avoids embedding a complex constant
        # (the axon TPU relay cannot transfer complex arrays host<->device).
        key, kp = jax.random.split(key)
        xt = sde.prior_sampling(kp, y.shape, y)

        def body(carry, inp):
            xt, key = carry
            t, stepsize = inp
            key, kc, kpred = jax.random.split(key, 3)
            vec_t = jnp.ones((xt.shape[0],)) * t
            xt, xt_mean = corrector.update_fn(kc, xt, y, vec_t)
            xt, xt_mean = predictor.update_fn(kpred, xt, y, vec_t, stepsize)
            return (xt, key), xt_mean

        (xt, _), means = jax.lax.scan(body, (xt, key), (timesteps, stepsizes))
        x_result = means[-1] if denoise else xt
        ns = sde.N * (corrector.n_steps + 1)
        return x_result, ns

    return pc_sampler


def get_ode_sampler(
    sde: SDE,
    score_fn: Callable,
    y: jax.Array,
    inverse_scaler=None,
    denoise: bool = True,
    eps: float = 3e-2,
    N: int | None = None,
    **ignored,
):
    """Probability-flow ODE sampler, jitted fixed-grid RK4
    (reference ``sampling/__init__.py:73-143`` uses scipy RK45; grid size
    defaults to the SDE's N)."""
    rsde = sde.reverse(score_fn, probability_flow=True)
    predictor = ReverseDiffusionPredictor(sde, score_fn, probability_flow=False)
    n_steps = N or sde.N

    def drift_fn(x, y, t):
        vec_t = jnp.ones((x.shape[0],)) * t
        return rsde.sde(x, y, vec_t)[0]

    ts = jnp.linspace(sde.T, eps, n_steps + 1)

    def ode_sampler(key, y=y):
        key, kp = jax.random.split(key)
        x = sde.prior_sampling(kp, y.shape, y)

        def body(x, i):
            t0, t1 = ts[i], ts[i + 1]
            h = t1 - t0
            k1 = drift_fn(x, y, t0)
            k2 = drift_fn(x + 0.5 * h * k1, y, t0 + 0.5 * h)
            k3 = drift_fn(x + 0.5 * h * k2, y, t0 + 0.5 * h)
            k4 = drift_fn(x + h * k3, y, t1)
            return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

        x, _ = jax.lax.scan(body, x, jnp.arange(n_steps))
        nfe = 4 * n_steps
        if denoise:
            vec_eps = jnp.ones((x.shape[0],)) * eps
            key, kd = jax.random.split(key)
            _, x = predictor.update_fn(kd, x, y, vec_eps, jnp.asarray(eps))
            nfe += 1
        if inverse_scaler is not None:
            x = inverse_scaler(x)
        return x, nfe

    return ode_sampler


def ode_sampler_scipy(sde, score_fn, y, key, rtol=1e-5, atol=1e-5, method="RK45", eps=3e-2, denoise=True):
    """Host black-box solver path for parity with the reference's scipy RK45
    (not jittable; eval/debug only)."""
    from scipy import integrate
    import numpy as onp

    rsde = sde.reverse(score_fn, probability_flow=True)
    x0 = sde.prior_sampling(key, y.shape, y)
    shape, dtype = y.shape, onp.complex64

    def ode_func(t, x_flat):
        x = jnp.asarray(x_flat.reshape(shape).astype(dtype))
        vec_t = jnp.ones((shape[0],)) * t
        drift = rsde.sde(x, y, vec_t)[0]
        return onp.asarray(drift).reshape(-1)

    sol = integrate.solve_ivp(
        ode_func, (sde.T, eps), onp.asarray(x0).reshape(-1), rtol=rtol, atol=atol, method=method
    )
    x = jnp.asarray(sol.y[:, -1].reshape(shape).astype(dtype))
    if denoise:
        predictor = ReverseDiffusionPredictor(sde, score_fn)
        vec_eps = jnp.ones((shape[0],)) * eps
        _, x = predictor.update_fn(jax.random.split(key)[0], x, y, vec_eps, jnp.asarray(eps))
    return x, sol.nfev


def get_sb_sampler(sde, model_fn: Callable, y: jax.Array, eps: float = 1e-4, sampler_type: str = "ode", **ignored):
    """First-order Schrödinger-bridge samplers
    (reference ``sampling/__init__.py:145-249``). ``model_fn(x, y, t)`` is
    the data-prediction network."""
    time_steps = jnp.linspace(sde.T, eps, sde.N + 1)

    def _scan(step_fn, x0, key):
        t_prev0 = time_steps[0] * jnp.ones((x0.shape[0],))
        sig_prev0 = sde._sigmas_alphas(t_prev0)

        def body(carry, inp):
            xt, key, prev = carry
            t, is_last = inp
            key, sub = jax.random.split(key)
            new_xt, new_prev = step_fn(xt, t, prev, sub, is_last)
            return (new_xt, key, new_prev), None

        is_last = jnp.arange(sde.N) == sde.N - 1
        (xt, _, _), _ = jax.lax.scan(
            body, (x0, key, sig_prev0), (time_steps[1:], is_last)
        )
        return xt

    def sde_sampler(key, y=y):
        xt = y[:, [0], :, :] if y.ndim == 4 and y.shape[1] > 1 else y

        def step(xt, t, prev, key, is_last):
            sigma_prev, _, sigma_bar_prev, alpha_prev, _, _ = prev
            time = t * jnp.ones((xt.shape[0],))
            cur = sde._sigmas_alphas(time)
            sigma_t, sigma_T, sigma_bart, alpha_t, alpha_T, alpha_bart = cur
            est = model_fn(xt, y, time)
            weight_prev = alpha_t * sigma_t**2 / (alpha_prev * sigma_prev**2 + sde.eps)
            tmp = 1 - sigma_t**2 / (sigma_prev**2 + sde.eps)
            weight_estimate = alpha_t * tmp
            weight_z = alpha_t * sigma_t * jnp.sqrt(jnp.maximum(tmp, 0.0))
            weight_z = jnp.where(is_last, 0.0, weight_z)
            z = _randn_like(key, xt)
            new_xt = (
                _bcast(weight_prev, xt) * xt
                + _bcast(weight_estimate, xt) * est
                + _bcast(weight_z, xt) * z
            )
            return new_xt, cur

        return _scan(step, xt, key), sde.N

    def ode_sampler(key, y=y):
        xt = y

        def step(xt, t, prev, key, is_last):
            sigma_prev, _, sigma_bar_prev, alpha_prev, _, _ = prev
            time = t * jnp.ones((xt.shape[0],))
            cur = sde._sigmas_alphas(time)
            sigma_t, sigma_T, sigma_bart, alpha_t, alpha_T, alpha_bart = cur
            est = model_fn(xt, y, time)
            weight_prev = (
                alpha_t * sigma_t * sigma_bart
                / (alpha_prev * sigma_prev * sigma_bar_prev + sde.eps)
            )
            weight_estimate = (
                alpha_t / (sigma_T**2 + sde.eps)
                * (sigma_bart**2 - sigma_bar_prev * sigma_t * sigma_bart / (sigma_prev + sde.eps))
            )
            weight_prior_mean = (
                alpha_t / (alpha_T * sigma_T**2 + sde.eps)
                * (sigma_t**2 - sigma_prev * sigma_t * sigma_bart / (sigma_bar_prev + sde.eps))
            )
            new_xt = (
                _bcast(weight_prev, xt) * xt
                + _bcast(weight_estimate, xt) * est
                + _bcast(weight_prior_mean, xt) * y
            )
            return new_xt, cur

        return _scan(step, xt, key), sde.N

    if sampler_type == "sde":
        return sde_sampler
    elif sampler_type == "ode":
        return ode_sampler
    raise ValueError("Invalid type. Choose 'ode' or 'sde'.")
