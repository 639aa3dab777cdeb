"""Spectrogram transforms: magnitude compression, padding, mel filterbank.

Parity targets in the reference:

- ``spec_fwd``/``spec_back`` magnitude compression
  ``|z|^e * exp(i*angle(z)) * factor`` and its inverse
  (``sgmse/sgmse/data_module.py:162-188``).
- ``pad_spec`` padding the frame axis to a multiple of 64 with
  zero/reflection/replication modes (``sgmse/sgmse/util/other.py:76-90``).
- magnitude/phase split used by the outer project's pkl pipeline
  (``spectrogram.ipynb`` cell 10: ``{'magnitude','phase','params'}``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# NOTE: public entry points are jitted. Beyond being the idiomatic TPU path,
# the axon TPU backend only reliably executes compiled programs — eager
# dispatch of complex-valued ops can raise UNIMPLEMENTED.


@jax.jit
def magnitude_phase(spec: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Split a complex spectrogram into (magnitude, phase)."""
    return jnp.abs(spec), jnp.angle(spec)


@jax.jit
def polar_to_complex(magnitude: jax.Array, phase: jax.Array) -> jax.Array:
    """Rebuild ``mag * exp(i*phase)`` (reference ``train_pkl_file_task_aware.py:193``)."""
    return (magnitude * jnp.exp(1j * phase)).astype(jnp.complex64)


@functools.partial(
    jax.jit, static_argnames=("spec_abs_exponent", "spec_factor", "transform_type")
)
def spec_fwd(
    spec: jax.Array,
    spec_abs_exponent: float = 0.5,
    spec_factor: float = 0.15,
    transform_type: str = "exponent",
) -> jax.Array:
    """Forward magnitude compression (reference ``data_module.py:162-175``)."""
    if transform_type == "exponent":
        if spec_abs_exponent != 1:
            e = spec_abs_exponent
            mag = jnp.abs(spec)
            # |z|^e * exp(i angle(z)); guard angle(0)=0 so 0 maps to 0
            spec = jnp.where(mag > 0, mag**e * jnp.exp(1j * jnp.angle(spec)), 0.0 + 0.0j)
        spec = spec * spec_factor
    elif transform_type == "log":
        spec = jnp.log1p(jnp.abs(spec)) * jnp.exp(1j * jnp.angle(spec))
        spec = spec * spec_factor
    elif transform_type == "none":
        pass
    else:
        raise ValueError(f"Unknown transform_type {transform_type}")
    return spec.astype(jnp.complex64)


@functools.partial(
    jax.jit, static_argnames=("spec_abs_exponent", "spec_factor", "transform_type")
)
def spec_back(
    spec: jax.Array,
    spec_abs_exponent: float = 0.5,
    spec_factor: float = 0.15,
    transform_type: str = "exponent",
) -> jax.Array:
    """Inverse of :func:`spec_fwd` (reference ``data_module.py:177-188``)."""
    if transform_type == "exponent":
        spec = spec / spec_factor
        if spec_abs_exponent != 1:
            e = spec_abs_exponent
            mag = jnp.abs(spec)
            spec = jnp.where(mag > 0, mag ** (1 / e) * jnp.exp(1j * jnp.angle(spec)), 0.0 + 0.0j)
    elif transform_type == "log":
        spec = spec / spec_factor
        spec = (jnp.exp(jnp.abs(spec)) - 1) * jnp.exp(1j * jnp.angle(spec))
    elif transform_type == "none":
        pass
    else:
        raise ValueError(f"Unknown transform_type {transform_type}")
    return spec.astype(jnp.complex64)


@functools.partial(jax.jit, static_argnames=("mode", "multiple"))
def pad_spec(Y: jax.Array, mode: str = "zero_pad", multiple: int = 64) -> jax.Array:
    """Pad the last (frame) axis of (..., F, T) to a multiple of ``multiple``.

    Reference ``sgmse/sgmse/util/other.py:76-90`` (the U-Net requires T%64==0).
    """
    T = Y.shape[-1]
    num_pad = (multiple - T % multiple) % multiple
    if num_pad == 0:
        return Y
    pad_width = [(0, 0)] * (Y.ndim - 1) + [(0, num_pad)]
    if mode == "zero_pad":
        return jnp.pad(Y, pad_width, mode="constant")
    elif mode == "reflection":
        return jnp.pad(Y, pad_width, mode="reflect")
    elif mode == "replication":
        return jnp.pad(Y, pad_width, mode="edge")
    raise NotImplementedError(f"pad mode {mode} not implemented")


def _hz_to_mel(f: np.ndarray, htk: bool = False) -> np.ndarray:
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = f >= min_log_hz
    mels = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz(m: np.ndarray, htk: bool = False) -> np.ndarray:
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = m >= min_log_mel
    freqs = np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm: Optional[str] = "slaney",
    dtype=jnp.float32,
) -> jax.Array:
    """librosa-compatible triangular mel filterbank of shape (n_mels, n_fft//2+1)."""
    fmax = fmax or sr / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(np.array(fmin), htk), _hz_to_mel(np.array(fmax), htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    return jnp.asarray(weights, dtype=dtype)


@functools.partial(jax.jit, static_argnames=("log", "eps"))
def mel_spectrogram(
    mag: jax.Array,
    mel_fb: jax.Array,
    log: bool = True,
    eps: float = 1e-5,
) -> jax.Array:
    """Project a magnitude spectrogram (..., F, T) through a mel filterbank.

    The matmul form keeps this on the MXU; used by the multi-resolution
    mel loss of the codec training stack.
    """
    mel = jnp.einsum("mf,...ft->...mt", mel_fb, mag)
    if log:
        mel = jnp.log(jnp.maximum(mel, eps))
    return mel
