"""Differentiable PESQ-style perceptual loss.

Role of ``torch_pesq.PesqLoss`` in the reference
(``sgmse/sgmse/model.py:83-86,177-181``: the ``data_prediction`` objective
adds ``pesq_weight * PesqLoss(...)``). That package isn't available here, so
this is a from-scratch differentiable loss following the P.862 structure:

1. level alignment to a common active-speech power,
2. power spectra (512-point STFT, 50% overlap, 16 kHz),
3. Bark-scale filterbank (triangular approximation of the 49-band P.862
   spacing),
4. Zwicker-law loudness transform,
5. symmetric + asymmetric disturbance (degraded-vs-reference, with the
   asymmetry emphasis on additive distortions),
6. MOS mapping ``4.5 - 0.1 d_sym - 0.0309 d_asym`` and
   ``loss = 4.5 - mos`` (lower is better, 0 for identical signals).

It is a *training loss* correlated with PESQ, not ITU-compliant scoring —
use ``metrics.pesq``/``pesq_proxy`` for evaluation numbers. Everything is
jit/grad-compatible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from task_aware_audio_coding_perceptual_tpu import dsp


def _hz_to_bark(f: np.ndarray) -> np.ndarray:
    return 6.0 * np.arcsinh(np.asarray(f, np.float64) / 600.0)


def bark_filterbank(sr: int = 16000, n_fft: int = 512, n_bands: int = 49) -> jax.Array:
    """Triangular filters evenly spaced on the bark scale, (bands, bins)."""
    bins = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, bins)
    bark = _hz_to_bark(freqs)
    edges = np.linspace(bark[1], bark[-1], n_bands + 2)
    fb = np.zeros((n_bands, bins))
    for b in range(n_bands):
        lo, mid, hi = edges[b], edges[b + 1], edges[b + 2]
        up = (bark - lo) / max(mid - lo, 1e-9)
        down = (hi - bark) / max(hi - mid, 1e-9)
        fb[b] = np.clip(np.minimum(up, down), 0.0, 1.0)
    fb /= fb.sum(axis=1, keepdims=True) + 1e-9
    return jnp.asarray(fb, jnp.float32)


@functools.partial(jax.jit, static_argnames=("sr", "n_fft", "hop", "n_bands"))
def pesq_style_loss(
    ref: jax.Array,
    deg: jax.Array,
    sr: int = 16000,
    n_fft: int = 512,
    hop: int = 256,
    n_bands: int = 49,
    eps: float = 1e-8,
) -> jax.Array:
    """Per-example loss in [0, ~3.5]; 0 when deg == ref. Shapes (..., T)."""
    # 1. level alignment
    def _norm(x):
        power = jnp.mean(x**2, axis=-1, keepdims=True)
        return x * jnp.sqrt(1.0 / (power + eps))

    ref = _norm(ref)
    deg = _norm(deg)

    # 2. power spectra
    win = dsp.hann_window(n_fft)
    R = jnp.abs(dsp.stft(ref, n_fft, hop, window=win)) ** 2  # (..., F, T')
    D = jnp.abs(dsp.stft(deg, n_fft, hop, window=win)) ** 2

    # 3. bark bands
    fb = bark_filterbank(sr, n_fft, n_bands)
    Rb = jnp.einsum("bf,...ft->...bt", fb, R)
    Db = jnp.einsum("bf,...ft->...bt", fb, D)

    # 4. Zwicker loudness: L = (B/B0)^0.23-style compressive law
    def loud(B):
        return (B + eps) ** 0.23

    Lr = loud(Rb)
    Ld = loud(Db)

    # 5. disturbances. Symmetric: |Ld - Lr| with a masking dead-zone of 25%
    # of the smaller loudness (P.862's center clipping).
    m = 0.25 * jnp.minimum(Lr, Ld)
    d = jnp.abs(Ld - Lr)
    d_sym = jnp.maximum(d - m, 0.0)

    # asymmetric emphasis: additive components (Db > Rb) weighted by the
    # band ratio^1.2, capped at 12 (P.862 asymmetry factor)
    ratio = ((Db + 50.0) / (Rb + 50.0)) ** 1.2
    asym = jnp.clip(ratio, 0.0, 12.0) * (ratio >= 1.0)
    d_asym = d_sym * asym

    # 6. aggregate: L2 over bands, L1 over frames (Lp-mixing like P.862)
    frame_sym = jnp.sqrt(jnp.mean(d_sym**2, axis=-2) + eps)  # (..., T')
    frame_asym = jnp.mean(d_asym, axis=-2)
    d_sym_total = jnp.mean(frame_sym, axis=-1)
    d_asym_total = jnp.mean(frame_asym, axis=-1)

    # coefficients calibrated so additive white noise at sigma 0.01/0.1/0.5
    # (on unit-power speech) maps to MOS ~4.0/2.8/1.0
    mos = 4.5 - 1.0 * d_sym_total - 0.4 * d_asym_total
    mos = jnp.clip(mos, 1.0, 4.5)
    return 4.5 - mos


def pesq_style_mos(ref: jax.Array, deg: jax.Array, **kwargs) -> jax.Array:
    """MOS-style score in [1, 4.5] (higher is better)."""
    return 4.5 - pesq_style_loss(ref, deg, **kwargs)
