"""STFT / ISTFT with ``torch.stft``/``torch.istft``-compatible semantics.

Design notes (TPU-first):

- Framing is expressed as a gather with a static index matrix; XLA lowers this
  to an efficient dynamic-slice loop and fuses the window multiply into the
  rFFT's prologue. All shapes are static.
- Overlap-add in :func:`istft` is a scatter-add with a static index map, which
  XLA turns into a vectorized segment-sum.
- Everything is jit-compatible and batched over arbitrary leading dims.

Parity targets:

- ``stft`` matches ``torch.stft(x, n_fft, hop, window=..., center=True,
  pad_mode='reflect', onesided=True, return_complex=True)`` — used by the
  reference at ``sgmse/sgmse/data_module.py:89-93,212-218``.
- ``istft`` matches ``torch.istft`` incl. window-envelope normalization and
  the ``length`` argument — used by the reference at
  ``train_pkl_file_task_aware.py:174-208`` (n_fft 2048, hop 512).
- librosa-style zero padding is available with ``pad_mode='constant'``
  (data-prep notebook ``spectrogram.ipynb`` cell 10 uses librosa defaults).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(window_length: int, periodic: bool = True, dtype=jnp.float32) -> jax.Array:
    """Hann window; ``periodic=True`` matches ``torch.hann_window``."""
    if window_length == 1:
        return jnp.ones((1,), dtype=dtype)
    n = np.arange(window_length, dtype=np.float64)
    denom = window_length if periodic else window_length - 1
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / denom)
    return jnp.asarray(w, dtype=dtype)


def sqrt_hann_window(window_length: int, periodic: bool = True, dtype=jnp.float32) -> jax.Array:
    """Square-root Hann window (reference ``data_module.py:13-16``)."""
    n = np.arange(window_length, dtype=np.float64)
    denom = window_length if periodic else window_length - 1
    w = np.sqrt(0.5 - 0.5 * np.cos(2.0 * np.pi * n / denom))
    return jnp.asarray(w, dtype=dtype)


def get_window(window_type: str, window_length: int, dtype=jnp.float32) -> jax.Array:
    """Window factory matching reference ``data_module.get_window``."""
    if window_type == "sqrthann":
        return sqrt_hann_window(window_length, dtype=dtype)
    elif window_type == "hann":
        return hann_window(window_length, dtype=dtype)
    raise NotImplementedError(f"Window type {window_type} not implemented!")


def _num_frames(length: int, n_fft: int, hop_length: int, center: bool) -> int:
    if center:
        return 1 + length // hop_length
    return 1 + (length - n_fft) // hop_length


def frame_signal(x: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """Slice ``x`` (..., T) into overlapping frames (..., n_frames, frame_length).

    Static-shape gather; the index matrix is a compile-time constant.
    """
    length = x.shape[-1]
    n_frames = 1 + (length - frame_length) // hop_length
    if n_frames < 1:
        raise ValueError(
            f"Signal of length {length} too short for frame_length={frame_length} "
            "(with center=False at least one full frame is required)"
        )
    idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    )
    return x[..., idx]


def _pad_center(x: jax.Array, n_fft: int, pad_mode: str) -> jax.Array:
    pad = n_fft // 2
    pad_width = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    if pad_mode == "reflect":
        return jnp.pad(x, pad_width, mode="reflect")
    elif pad_mode == "constant":
        return jnp.pad(x, pad_width, mode="constant")
    elif pad_mode == "replicate":
        return jnp.pad(x, pad_width, mode="edge")
    raise ValueError(f"Unknown pad_mode {pad_mode}")


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "center", "pad_mode", "onesided"),
)
def stft(
    x: jax.Array,
    n_fft: int,
    hop_length: Optional[int] = None,
    window: Optional[jax.Array] = None,
    win_length: Optional[int] = None,
    center: bool = True,
    pad_mode: str = "reflect",
    onesided: bool = True,
) -> jax.Array:
    """Short-time Fourier transform, ``torch.stft``-compatible.

    Args:
        x: real signal of shape (..., T).
        window: window of length ``win_length`` (defaults to ``n_fft``); a
            shorter window is zero-padded symmetrically like torch does.

    Returns:
        complex64 array of shape (..., n_fft//2+1, n_frames) if onesided.
    """
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    if window is None:
        window = jnp.ones((win_length,), dtype=x.dtype)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        window = jnp.pad(window, (left, n_fft - win_length - left))

    if center:
        x = _pad_center(x, n_fft, pad_mode)

    frames = frame_signal(x, n_fft, hop_length)  # (..., n_frames, n_fft)
    frames = frames * window
    if onesided:
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    else:
        spec = jnp.fft.fft(frames, n=n_fft, axis=-1)
    # torch layout: (..., freq, frames)
    return jnp.swapaxes(spec, -1, -2).astype(jnp.complex64)


def overlap_add(frames: jax.Array, hop_length: int, output_length: int) -> jax.Array:
    """Overlap-add frames (..., n_frames, frame_length) into (..., output_length)."""
    n_frames, frame_length = frames.shape[-2], frames.shape[-1]
    idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    ).reshape(-1)
    flat = frames.reshape(frames.shape[:-2] + (n_frames * frame_length,))
    out = jnp.zeros(frames.shape[:-2] + (output_length,), dtype=frames.dtype)
    return out.at[..., idx].add(flat)


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "center", "length", "onesided"),
)
def istft(
    spec: jax.Array,
    n_fft: int,
    hop_length: Optional[int] = None,
    window: Optional[jax.Array] = None,
    win_length: Optional[int] = None,
    center: bool = True,
    length: Optional[int] = None,
    onesided: bool = True,
) -> jax.Array:
    """Inverse STFT, ``torch.istft``-compatible (overlap-add + window-square
    envelope normalization; reference usage ``train_pkl_file_task_aware.py:195-204``).

    Args:
        spec: complex spectrogram (..., freq, n_frames).

    Returns:
        real signal (..., T).
    """
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    if window is None:
        window = jnp.ones((win_length,), dtype=jnp.float32)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        window = jnp.pad(window, (left, n_fft - win_length - left))

    frames_spec = jnp.swapaxes(spec, -1, -2)  # (..., n_frames, freq)
    if onesided:
        frames = jnp.fft.irfft(frames_spec, n=n_fft, axis=-1)
    else:
        frames = jnp.fft.ifft(frames_spec, n=n_fft, axis=-1).real
    frames = frames * window

    n_frames = frames.shape[-2]
    expected_len = n_fft + hop_length * (n_frames - 1)
    y = overlap_add(frames, hop_length, expected_len)

    # window envelope for normalization
    wsq = jnp.broadcast_to(window * window, (n_frames, n_fft))
    env = overlap_add(wsq, hop_length, expected_len)
    eps = jnp.asarray(1e-11, dtype=env.dtype)
    y = y / jnp.where(env > eps, env, 1.0)

    if center:
        start = n_fft // 2
        y = y[..., start:]
        if length is None:
            y = y[..., : expected_len - n_fft]
    if length is not None:
        if y.shape[-1] >= length:
            y = y[..., :length]
        else:
            pad_width = [(0, 0)] * (y.ndim - 1) + [(0, length - y.shape[-1])]
            y = jnp.pad(y, pad_width)
    return y


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "n_iter", "length", "momentum"),
)
def griffin_lim(
    magnitude: jax.Array,
    n_fft: int,
    hop_length: Optional[int] = None,
    n_iter: int = 32,
    length: Optional[int] = None,
    momentum: float = 0.99,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Griffin-Lim phase reconstruction from a magnitude spectrogram.

    Role of the reference's image->audio path (``spectrogram.ipynb`` cell 5:
    spectrogram PNG -> magnitude -> ``librosa.griffinlim`` -> wav). Runs the
    fast Griffin-Lim iteration (momentum-accelerated, Perraudin et al. 2013)
    as a ``lax.fori_loop`` of STFT/ISTFT pairs, so the whole reconstruction
    is one compiled TPU program.

    Args:
        magnitude: (..., freq, n_frames) non-negative magnitudes
            (freq = n_fft//2 + 1).
        key: PRNG key for the random phase init (zero phase if None).

    Returns:
        real signal (..., T).
    """
    hop_length = hop_length or n_fft // 4
    window = hann_window(n_fft)

    if key is not None:
        phase = jax.random.uniform(
            key, magnitude.shape, minval=-jnp.pi, maxval=jnp.pi
        )
        angles = jnp.exp(1j * phase).astype(jnp.complex64)
    else:
        angles = jnp.ones(magnitude.shape, jnp.complex64)

    mag = magnitude.astype(jnp.float32)

    def project(ang):
        """mag * ang -> time -> STFT (the two Griffin-Lim projections)."""
        y = istft(mag * ang, n_fft, hop_length, window=window, length=length)
        s = stft(y, n_fft, hop_length, window=window)
        # stft of a len-`length` signal can produce fewer frames than mag has;
        # keep static shapes by padding frames back out with zeros
        pad = mag.shape[-1] - s.shape[-1]
        if pad > 0:
            widths = [(0, 0)] * (s.ndim - 1) + [(0, pad)]
            s = jnp.pad(s, widths)
        return s[..., : mag.shape[-1]]

    beta = momentum / (1.0 + momentum)

    def body(_, carry):
        angles, prev = carry
        rebuilt = project(angles)
        update = rebuilt - beta * prev
        angles = update / (jnp.abs(update) + 1e-16)
        return angles, rebuilt

    angles, _ = jax.lax.fori_loop(
        0, n_iter, body, (angles, jnp.zeros_like(angles))
    )
    return istft(mag * angles, n_fft, hop_length, window=window, length=length)
