"""STOI / ESTOI — pure numpy/scipy implementation.

The reference evaluates intelligibility via the ``pystoi`` package
(``sgmse/sgmse/model.py:249``, ``calc_metrics.py``). That package is not
available in this environment, so this module implements the algorithms from
the papers directly:

- C. Taal et al., "An Algorithm for Intelligibility Prediction of
  Time-Frequency Weighted Noisy Speech", IEEE TASLP 2011 (STOI).
- J. Jensen, C. Taal, "An Algorithm for Predicting the Intelligibility of
  Speech Masked by Modulated Noise Maskers", IEEE TASLP 2016 (ESTOI).

Constants follow the canonical implementation (fs=10kHz, 256-sample frames
with 50% overlap zero-padded to a 512-point FFT, 15 one-third octave bands
from 150 Hz, 384 ms analysis segments (N=30 frames), 40 dB silent-frame
dynamic range, beta=-15 dB clipping for plain STOI).

Numerical conventions deliberately match the canonical ``pystoi`` package
(which the reference imports) so scores are comparable: exclusive-stop
framing (a tail frame starting exactly at ``len(x)-framelen`` is dropped),
and Octave/MATLAB-style polyphase resampling with a Kaiser-windowed sinc
anti-aliasing filter (60 dB rejection) rather than scipy's default window.
Validated by frozen golden regression values and metric property tests in
``tests/test_metrics.py`` (monotonicity in SNR, scale invariance,
identity == 1); exact pystoi cross-check is impossible offline (package
absent), which is recorded there too.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import resample_poly

FS = 10000
N_FRAME = 256
NFFT = 512
NUMBAND = 15
MINFREQ = 150
N_SEG = 30  # number of frames per analysis segment (384 ms)
BETA = -15.0  # lower SDR bound for STOI clipping
DYN_RANGE = 40.0  # speech dynamic range for silent-frame removal


def _thirdoct(fs: int, nfft: int, num_bands: int, min_freq: float):
    """One-third octave band matrix (num_bands, nfft//2+1)."""
    f = np.linspace(0, fs, nfft + 1)[: nfft // 2 + 1]
    k = np.arange(num_bands, dtype=np.float64)
    cf = 2.0 ** (k / 3.0) * min_freq
    freq_low = min_freq * 2.0 ** ((2 * k - 1) / 6.0)
    freq_high = min_freq * 2.0 ** ((2 * k + 1) / 6.0)
    obm = np.zeros((num_bands, len(f)))
    for i in range(num_bands):
        f_bin_low = np.argmin(np.square(f - freq_low[i]))
        f_bin_high = np.argmin(np.square(f - freq_high[i]))
        obm[i, f_bin_low:f_bin_high] = 1
    return obm, cf


def _n_frames(sig_len: int, framelen: int, hop: int) -> int:
    """Frame count under pystoi's exclusive-stop convention
    (``range(0, len(x) - framelen, hop)``)."""
    m = sig_len - framelen
    return max(0, -(-m // hop)) if m > 0 else 0


def _remove_silent_frames(x: np.ndarray, y: np.ndarray, dyn_range: float, framelen: int, hop: int):
    """Drop frames of x whose energy is more than dyn_range below the max."""
    w = np.hanning(framelen + 2)[1:-1]
    n_frames = _n_frames(len(x), framelen, hop)
    if n_frames < 1:
        return x, y
    idx = np.arange(n_frames)[:, None] * hop + np.arange(framelen)[None, :]
    x_frames = x[idx] * w
    y_frames = y[idx] * w
    energies = 20 * np.log10(np.linalg.norm(x_frames, axis=1) + 1e-12)
    mask = energies > (np.max(energies) - dyn_range)
    x_frames, y_frames = x_frames[mask], y_frames[mask]
    # overlap-add back
    n_kept = x_frames.shape[0]
    out_len = (n_kept - 1) * hop + framelen if n_kept else 0
    x_out = np.zeros(out_len)
    y_out = np.zeros(out_len)
    for i in range(n_kept):
        x_out[i * hop : i * hop + framelen] += x_frames[i]
        y_out[i * hop : i * hop + framelen] += y_frames[i]
    return x_out, y_out


def _stft_mag(x: np.ndarray, framelen: int, hop: int, nfft: int) -> np.ndarray:
    w = np.hanning(framelen + 2)[1:-1]
    n_frames = _n_frames(len(x), framelen, hop)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(framelen)[None, :]
    frames = x[idx] * w
    return np.fft.rfft(frames, n=nfft, axis=-1)  # (n_frames, nfft//2+1)


def _resample_window(p: int, q: int) -> np.ndarray:
    """Kaiser-windowed sinc anti-aliasing filter (Octave/MATLAB resample
    design, 60 dB stopband rejection) — the filter pystoi uses, so that
    band energies after 10 kHz resampling agree numerically."""
    rejection_db = 60.0
    cutoff = 1.0 / (2 * max(p, q))
    roll_off_width = cutoff / 10.0
    half_len = int(np.ceil(rejection_db / (22.9 * roll_off_width)))
    t = np.arange(-half_len, half_len + 1)
    ideal = 2 * p * cutoff * np.sinc(2 * cutoff * t)
    # Kaiser beta for >50 dB rejection (standard Kaiser design formula)
    beta = 0.1102 * (rejection_db - 8.71)
    return np.kaiser(2 * half_len + 1, beta) * ideal


def _resample_to_10k(x: np.ndarray, fs: int) -> np.ndarray:
    if fs == FS:
        return x
    g = np.gcd(int(fs), FS)
    p, q = FS // g, int(fs) // g
    h = _resample_window(p, q)
    return resample_poly(x, p, q, window=h / np.sum(h))


def _band_envelopes(x: np.ndarray, obm: np.ndarray) -> np.ndarray:
    """(n_frames, bands) one-third-octave band magnitudes."""
    spec = _stft_mag(x, N_FRAME, N_FRAME // 2, NFFT)
    power = np.abs(spec) ** 2  # (frames, bins)
    return np.sqrt(power @ obm.T)  # (frames, bands)


def stoi(x: np.ndarray, y: np.ndarray, fs_sig: int, extended: bool = False) -> float:
    """STOI / ESTOI of degraded ``y`` w.r.t. clean ``x``.

    Signature-compatible with ``pystoi.stoi`` as used by the reference
    (``model.py:249``: ``stoi(x, x_hat, sr, extended=True)``).
    """
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    y = np.asarray(y, dtype=np.float64).reshape(-1)
    if x.shape != y.shape:
        raise ValueError("x and y must have the same length")

    x = _resample_to_10k(x, fs_sig)
    y = _resample_to_10k(y, fs_sig)
    x, y = _remove_silent_frames(x, y, DYN_RANGE, N_FRAME, N_FRAME // 2)
    if len(x) < N_FRAME * 2:
        return float("nan")

    obm, _ = _thirdoct(FS, NFFT, NUMBAND, MINFREQ)
    X = _band_envelopes(x, obm)  # (frames, bands)
    Y = _band_envelopes(y, obm)
    n_frames = X.shape[0]
    if n_frames < N_SEG:
        return float("nan")

    if not extended:
        # classic STOI: per (band, segment) correlation of clipped envelopes
        d_sum, count = 0.0, 0
        for m in range(N_SEG, n_frames + 1):
            X_seg = X[m - N_SEG : m].T  # (bands, N)
            Y_seg = Y[m - N_SEG : m].T
            alpha = np.sqrt(
                np.sum(X_seg**2, axis=1, keepdims=True)
                / (np.sum(Y_seg**2, axis=1, keepdims=True) + 1e-12)
            )
            Y_prime = np.minimum(alpha * Y_seg, X_seg * (1 + 10 ** (-BETA / 20)))
            xn = X_seg - X_seg.mean(axis=1, keepdims=True)
            yn = Y_prime - Y_prime.mean(axis=1, keepdims=True)
            corr = np.sum(xn * yn, axis=1) / (
                np.linalg.norm(xn, axis=1) * np.linalg.norm(yn, axis=1) + 1e-12
            )
            d_sum += np.sum(corr)
            count += corr.size
        return float(d_sum / count)

    # ESTOI: row- then column-normalize each (bands x N) segment, average
    # column correlations over segments.
    d_sum, count = 0.0, 0
    for m in range(N_SEG, n_frames + 1):
        X_seg = X[m - N_SEG : m].T  # (bands, N)
        Y_seg = Y[m - N_SEG : m].T

        def _rownorm(A):
            A = A - A.mean(axis=1, keepdims=True)
            return A / (np.linalg.norm(A, axis=1, keepdims=True) + 1e-12)

        def _colnorm(A):
            A = A - A.mean(axis=0, keepdims=True)
            return A / (np.linalg.norm(A, axis=0, keepdims=True) + 1e-12)

        Xn = _colnorm(_rownorm(X_seg))
        Yn = _colnorm(_rownorm(Y_seg))
        d_sum += float(np.sum(Xn * Yn)) / N_SEG
        count += 1
    return float(d_sum / count)


def estoi(x: np.ndarray, y: np.ndarray, fs_sig: int) -> float:
    """Extended STOI (reference calls ``stoi(..., extended=True)``)."""
    return stoi(x, y, fs_sig, extended=True)
