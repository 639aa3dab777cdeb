"""Scale-invariant SDR family + PSNR/spectral-SNR + summary statistics.

Formula parity with reference ``sgmse/sgmse/util/other.py`` and
``pkl_file_models.py``.
"""

from __future__ import annotations

import numpy as np
import scipy.stats

import jax
import jax.numpy as jnp


def si_sdr(s: np.ndarray, s_hat: np.ndarray) -> float:
    """SI-SDR in dB (reference ``util/other.py:64-68``).

    Note the reference's argument order: ``si_sdr(clean, estimate)``.
    """
    s = np.asarray(s, dtype=np.float64).reshape(-1)
    s_hat = np.asarray(s_hat, dtype=np.float64).reshape(-1)
    alpha = np.dot(s_hat, s) / (np.linalg.norm(s) ** 2)
    return float(
        10 * np.log10(np.linalg.norm(alpha * s) ** 2 / np.linalg.norm(alpha * s - s_hat) ** 2)
    )


@jax.jit
def si_sdr_jax(s: jax.Array, s_hat: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Batched, jit-compatible SI-SDR over the last axis (dB)."""
    s = s.astype(jnp.float32)
    s_hat = s_hat.astype(jnp.float32)
    alpha = jnp.sum(s_hat * s, axis=-1, keepdims=True) / (
        jnp.sum(s * s, axis=-1, keepdims=True) + eps
    )
    target = alpha * s
    num = jnp.sum(target**2, axis=-1)
    den = jnp.sum((target - s_hat) ** 2, axis=-1)
    return 10.0 * jnp.log10((num + eps) / (den + eps))


def si_sdr_components(s_hat: np.ndarray, s: np.ndarray, n: np.ndarray):
    """Decompose s_hat into target/noise/artifact (reference ``util/other.py:11-22``)."""
    s_hat = np.asarray(s_hat, dtype=np.float64).reshape(-1)
    s = np.asarray(s, dtype=np.float64).reshape(-1)
    n = np.asarray(n, dtype=np.float64).reshape(-1)
    alpha_s = np.dot(s_hat, s) / np.linalg.norm(s) ** 2
    s_target = alpha_s * s
    alpha_n = np.dot(s_hat, n) / np.linalg.norm(n) ** 2
    e_noise = alpha_n * n
    e_art = s_hat - s_target - e_noise
    return s_target, e_noise, e_art


def energy_ratios(s_hat: np.ndarray, s: np.ndarray, n: np.ndarray):
    """(SI-SDR, SI-SIR, SI-SAR) in dB (reference ``util/other.py:25-32``)."""
    s_target, e_noise, e_art = si_sdr_components(s_hat, s, n)
    si_sdr_v = 10 * np.log10(np.linalg.norm(s_target) ** 2 / np.linalg.norm(e_noise + e_art) ** 2)
    si_sir = 10 * np.log10(np.linalg.norm(s_target) ** 2 / np.linalg.norm(e_noise) ** 2)
    si_sar = 10 * np.log10(np.linalg.norm(s_target) ** 2 / np.linalg.norm(e_art) ** 2)
    return float(si_sdr_v), float(si_sir), float(si_sar)


def snr_db(s: np.ndarray, n: np.ndarray) -> float:
    """SNR of signal vs noise (reference ``util/other.py:70-74``)."""
    s = np.asarray(s, dtype=np.float64)
    n = np.asarray(n, dtype=np.float64)
    return float(10 * np.log10((np.mean(s**2)) / (np.mean(n**2))))


def psnr(img1: jax.Array, img2: jax.Array, pixel_max: float = 255.0) -> jax.Array:
    """PSNR in dB (reference ``pkl_file_models.py:36-42``)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return jnp.where(
        mse == 0, jnp.asarray(100.0, dtype=jnp.float32), 20 * jnp.log10(pixel_max / jnp.sqrt(mse))
    )


def spectral_snr(obs: jax.Array, obs_dec: jax.Array) -> jax.Array:
    """Spectral SNR in dB (reference ``pkl_file_models.py:406``)."""
    return -10 * jnp.log10(jnp.mean((obs - obs_dec) ** 2) / jnp.mean(obs**2))


def mean_conf_int(data, confidence: float = 0.95):
    """Mean and t-based confidence interval (reference ``util/other.py:35-40``)."""
    a = 1.0 * np.array(data)
    n = len(a)
    m, se = np.mean(a), scipy.stats.sem(a)
    h = se * scipy.stats.t.ppf((1 + confidence) / 2.0, n - 1)
    return m, h


def mean_std(data):
    data = np.array(data)
    data = data[~np.isnan(data)]
    return np.mean(data), np.std(data)


def print_mean_std(data, decimal: int = 2) -> str:
    """Format 'mean ± std' (reference ``util/other.py:117-126``)."""
    mean, std = mean_std(data)
    if decimal == 2:
        return f"{mean:.2f} ± {std:.2f}"
    elif decimal == 1:
        return f"{mean:.1f} ± {std:.1f}"
    return f"{mean} ± {std}"
