"""WAV read/write and resampling without librosa/soundfile.

The reference loads audio through ``torchaudio.load`` (``data_module.py:58``)
and resamples with ``librosa.resample`` (``model.py:236``). Neither package is
available here, so IO is built on scipy:

- :func:`load` returns ``(waveform[channels, T] float32 in [-1, 1], sr)``,
  matching ``torchaudio.load`` conventions.
- :func:`save` writes PCM16 (default) or float32 WAV.
- :func:`resample` is a polyphase resampler
  (``scipy.signal.resample_poly``), signature-compatible with
  ``librosa.resample(y, orig_sr=..., target_sr=...)``.
"""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def load(path: str) -> tuple[np.ndarray, int]:
    """Load a WAV file -> (float32 array of shape (channels, T), sample_rate)."""
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        x = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        x = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        x = (data.astype(np.float32) - 128.0) / 128.0
    else:  # float32/float64
        x = data.astype(np.float32)
    if x.ndim == 1:
        x = x[None, :]
    else:
        x = x.T  # scipy returns (T, channels)
    return x, int(sr)


def save(path: str, wav: np.ndarray, sr: int, dtype: str = "int16") -> None:
    """Save (channels, T) or (T,) float audio to WAV."""
    wav = np.asarray(wav)
    if wav.ndim == 2:
        wav = wav.T  # scipy wants (T, channels)
    if dtype == "int16":
        wav = np.clip(wav, -1.0, 1.0)
        wavfile.write(path, sr, (wav * 32767.0).astype(np.int16))
    elif dtype == "float32":
        wavfile.write(path, sr, wav.astype(np.float32))
    else:
        raise ValueError(f"Unsupported dtype {dtype}")


def resample(y: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling along the last axis (librosa.resample equivalent)."""
    if orig_sr == target_sr:
        return np.asarray(y)
    g = np.gcd(int(orig_sr), int(target_sr))
    return resample_poly(np.asarray(y), target_sr // g, orig_sr // g, axis=-1)
