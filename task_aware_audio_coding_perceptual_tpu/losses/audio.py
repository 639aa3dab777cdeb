"""Audio/spectral losses.

Covers the reference's loss surface (SURVEY.md §2):

- nuclear-norm latent regularizer (``pkl_file_models.py:398-403``),
- cross-encoder cosine similarity (``pkl_file_models.py:390-391``),
- spectral MSE dict: magnitude/phase/total (``pkl_file_models.py:409-414``),
- plus the north-star codec losses: multi-resolution STFT and
  multi-resolution log-mel (batched FFT + matmul, MXU-friendly).

All losses are pure jit-compatible functions.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu import dsp


def nuclear_norm_loss(z: jax.Array) -> jax.Array:
    """Nuclear norm of the batch-centered, globally L2-normalized latent
    matrix, divided by batch size (reference ``pkl_file_models.py:398-403``).

    Computed as ``sum(sqrt(eig(G)))`` of the small-side Gram matrix
    ``G = z z^T`` (or ``z^T z``) instead of ``jnp.linalg.svd``: identical
    singular values, but the TPU SVD lowering (and its VJP) is a
    pathological remote-compile (>60 min wedging the whole relay at
    (4, 1024)), while ``eigvalsh`` of a (batch, batch) Gram compiles
    instantly. The ``+1e-12`` inside the sqrt keeps the gradient finite at
    rank deficiency; it perturbs the loss by < 1e-5.
    """
    batch = z.shape[0]
    z = z - jnp.mean(z, axis=0)
    z = z / (jnp.linalg.norm(z) + 1e-12)
    z = z.astype(jnp.float32)
    g = z @ z.T if z.shape[0] <= z.shape[1] else z.T @ z
    w = jnp.linalg.eigvalsh(g)
    s = jnp.sqrt(jnp.clip(w, 0.0) + 1e-12)
    return jnp.sum(s) / batch


def cosine_similarity_loss(z1: jax.Array, z2: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Mean cosine similarity across the batch (reference
    ``pkl_file_models.py:390-391``; torch.nn.CosineSimilarity default dim=1).
    """
    num = jnp.sum(z1 * z2, axis=1)
    den = jnp.linalg.norm(z1, axis=1) * jnp.linalg.norm(z2, axis=1)
    return jnp.mean(num / jnp.maximum(den, eps))


def spectral_mse_dict(obs: jax.Array, obs_dec: jax.Array) -> dict:
    """{'magnitude_loss','phase_loss','total_loss'} on stacked (B,2,F,T)
    mag/phase tensors (reference ``pkl_file_models.py:409-414``)."""
    return {
        "magnitude_loss": jnp.mean((obs[:, 0] - obs_dec[:, 0]) ** 2),
        "phase_loss": jnp.mean((obs[:, 1] - obs_dec[:, 1]) ** 2),
        "total_loss": jnp.mean((obs - obs_dec) ** 2),
    }


@functools.partial(jax.jit, static_argnames=("n_ffts", "hops"))
def multi_resolution_stft_loss(
    y: jax.Array,
    y_hat: jax.Array,
    n_ffts: Sequence[int] = (2048, 1024, 512),
    hops: Sequence[int] = (512, 256, 128),
    eps: float = 1e-5,
) -> jax.Array:
    """Sum over scales of (L1 log-magnitude + spectral convergence).

    y, y_hat: (..., T) waveforms.
    """
    total = 0.0
    for n_fft, hop in zip(n_ffts, hops):
        win = dsp.hann_window(n_fft)
        S = jnp.abs(dsp.stft(y, n_fft, hop, window=win))
        S_hat = jnp.abs(dsp.stft(y_hat, n_fft, hop, window=win))
        sc = jnp.linalg.norm(S - S_hat) / (jnp.linalg.norm(S) + eps)
        log_l1 = jnp.mean(jnp.abs(jnp.log(S + eps) - jnp.log(S_hat + eps)))
        total = total + sc + log_l1
    return total / len(n_ffts)


@functools.partial(jax.jit, static_argnames=("sample_rate", "n_ffts", "hops", "n_mels"))
def multi_resolution_mel_loss(
    y: jax.Array,
    y_hat: jax.Array,
    sample_rate: int = 16000,
    n_ffts: Sequence[int] = (2048, 1024, 512, 256),
    hops: Sequence[int] = (512, 256, 128, 64),
    n_mels: int = 80,
    eps: float = 1e-5,
) -> jax.Array:
    """L1 + L2 distance between multi-scale log-mel spectrograms."""
    total = 0.0
    for n_fft, hop in zip(n_ffts, hops):
        mels = min(n_mels, n_fft // 4)
        win = dsp.hann_window(n_fft)
        fb = dsp.mel_filterbank(sample_rate, n_fft, mels)
        M = dsp.mel_spectrogram(jnp.abs(dsp.stft(y, n_fft, hop, window=win)), fb, eps=eps)
        M_hat = dsp.mel_spectrogram(
            jnp.abs(dsp.stft(y_hat, n_fft, hop, window=win)), fb, eps=eps
        )
        total = total + jnp.mean(jnp.abs(M - M_hat)) + jnp.sqrt(jnp.mean((M - M_hat) ** 2))
    return total / len(n_ffts)


def l1_time_loss(y: jax.Array, y_hat: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(y - y_hat))


def l2_time_loss(y: jax.Array, y_hat: jax.Array) -> jax.Array:
    return jnp.mean((y - y_hat) ** 2)
