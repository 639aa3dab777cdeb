"""Synthetic noisy-speech dataset creation (WSJ0-mixing style).

Equivalents of the reference's preprocessing scripts
(``sgmse/preprocessing/create_wsj0_chime3.py`` etc.):

- :func:`mix_at_snr`: clean + noise mixed at a target SNR (uniform in
  [0, 20] dB in the reference, ``create_wsj0_chime3.py:18-20``).
- :func:`create_mixture_dataset`: walks clean/noise wav pools and writes the
  ``{split}/{clean,noisy}`` tree the ``Specs`` dataset expects.
- :func:`synthesize_rir` + :func:`create_reverb_dataset`: reverberant
  variant of ``create_wsj0_reverb.py:95-118`` — pyroomacoustics is not
  available in this environment, so the RIRs come from an own shoebox
  image-source-method simulator with T60-calibrated wall absorption
  (measured T60 within ~10% of the request); dataset layout and T60/DRR
  logging match the reference.
"""

from __future__ import annotations

import csv
import glob
import os
from typing import Optional, Sequence

import numpy as np
from scipy.signal import fftconvolve

from task_aware_audio_coding_perceptual_tpu.data import wav_io


def mix_at_snr(clean: np.ndarray, noise: np.ndarray, snr_db: float, eps: float = 1e-12):
    """Scale noise so that 10log10(P_clean/P_noise) == snr_db; returns
    (noisy, scaled_noise)."""
    clean = np.asarray(clean, np.float64)
    noise = np.asarray(noise, np.float64)
    if len(noise) < len(clean):
        reps = int(np.ceil(len(clean) / len(noise)))
        noise = np.tile(noise, reps)
    start = 0
    noise = noise[start : start + len(clean)]
    p_c = np.mean(clean**2) + eps
    p_n = np.mean(noise**2) + eps
    scale = np.sqrt(p_c / (p_n * 10 ** (snr_db / 10)))
    noisy = clean + scale * noise
    return noisy.astype(np.float32), (scale * noise).astype(np.float32)


_SOUND_SPEED = 343.0  # m/s


def _sabine_absorption(room_dim, t60: float) -> float:
    """Invert Sabine's formula: absorption coefficient for a target T60."""
    Lx, Ly, Lz = room_dim
    V = Lx * Ly * Lz
    S = 2 * (Lx * Ly + Lx * Lz + Ly * Lz)
    # T60 = 0.161 V / (alpha S)
    return float(np.clip(0.161 * V / (S * max(t60, 1e-3)), 1e-4, 0.9999))


def synthesize_rir(
    sr: int,
    t60: float,
    rng: np.random.Generator,
    room_dim=None,
    source=None,
    mic=None,
    max_order: int = 40,
    calibrate: int = 2,
) -> np.ndarray:
    """Shoebox image-source-method RIR (role of pyroomacoustics in the
    reference, ``create_wsj0_reverb.py:95-118``).

    Image sources up to ``max_order`` reflections per axis are accumulated
    with fractional-delay (linear-interp) taps and 1/r attenuation. Wall
    absorption starts from Sabine's formula and is then *calibrated*: the
    shoebox ISM's late decay is slower than Sabine predicts (least-damped
    axial paths dominate), so up to ``calibrate`` refinement passes measure
    the Schroeder T60 and rescale ``-ln(1-alpha)`` by measured/target. Room
    geometry and source/mic positions are sampled if not given.
    """
    if room_dim is None:
        room_dim = rng.uniform((4.0, 3.0, 2.5), (9.0, 7.0, 3.5))
    room_dim = np.asarray(room_dim, np.float64)
    if source is None:
        source = rng.uniform(0.5, room_dim - 0.5)
    if mic is None:
        mic = rng.uniform(0.5, room_dim - 0.5)
    source = np.asarray(source, np.float64)
    mic = np.asarray(mic, np.float64)

    g = -np.log(1.0 - _sabine_absorption(room_dim, t60))
    rir = _ism_rir(sr, t60, room_dim, source, mic, max_order, g)
    for _ in range(calibrate):
        measured = measure_t60(rir, sr)
        if not np.isfinite(measured) or abs(measured - t60) / t60 < 0.1:
            break
        g = g * measured / t60
        rir = _ism_rir(sr, t60, room_dim, source, mic, max_order, g)
    return rir


def _ism_rir(sr, t60, room_dim, source, mic, max_order, g) -> np.ndarray:
    refl = np.sqrt(np.exp(-g))  # amplitude reflection coefficient

    length = int(sr * max(t60 * 1.2, 0.15)) + 64
    rir = np.zeros(length + 1, np.float64)

    # image source positions per axis: x_img = ±source_x + 2 n L
    orders = np.arange(-max_order, max_order + 1)
    axes = []
    for ax in range(3):
        L, s, m = room_dim[ax], source[ax], mic[ax]
        pos_even = 2 * orders * L + s  # even # of reflections in this axis
        pos_odd = 2 * orders * L - s  # odd
        d_even = pos_even - m
        d_odd = pos_odd - m
        n_refl_even = 2 * np.abs(orders)
        n_refl_odd = np.abs(2 * orders - 1)
        axes.append(
            (
                np.concatenate([d_even, d_odd]),
                np.concatenate([n_refl_even, n_refl_odd]),
            )
        )

    dx, nx = axes[0]
    dy, ny = axes[1]
    dz, nz = axes[2]
    # accumulate over the 3-D image lattice; vectorize the two inner axes
    dyz2 = dy[:, None] ** 2 + dz[None, :] ** 2
    nyz = ny[:, None] + nz[None, :]
    max_dist = (length / sr) * _SOUND_SPEED
    for i in range(len(dx)):
        dist = np.sqrt(dx[i] ** 2 + dyz2)
        keep = dist < max_dist
        if not np.any(keep):
            continue
        dist = dist[keep]
        n_refl = nx[i] + nyz[keep]
        amp = refl**n_refl / np.maximum(dist, 0.1)
        tau = dist / _SOUND_SPEED * sr
        i0 = tau.astype(np.int64)
        frac = tau - i0
        np.add.at(rir, i0, amp * (1 - frac))
        np.add.at(rir, i0 + 1, amp * frac)

    rir = rir[:length]
    return (rir / (np.abs(rir).max() + 1e-9)).astype(np.float32)


def measure_t60(rir: np.ndarray, sr: int) -> float:
    """T60 from the Schroeder backward-integrated energy decay curve,
    extrapolated from the -5..-25 dB slope (T20 method)."""
    e = rir.astype(np.float64) ** 2
    edc = np.cumsum(e[::-1])[::-1]
    edc_db = 10 * np.log10(edc / (edc[0] + 1e-300) + 1e-300)
    t = np.arange(len(rir)) / sr
    i5 = int(np.argmax(edc_db <= -5.0))
    i25 = int(np.argmax(edc_db <= -25.0))
    if i25 <= i5:
        return float("nan")
    slope = (edc_db[i25] - edc_db[i5]) / (t[i25] - t[i5])  # dB/s
    return float(-60.0 / slope)


def direct_to_reverberant_ratio(rir: np.ndarray, sr: int, direct_ms: float = 8.0) -> float:
    """DRR in dB; the direct window starts at the first arrival (the direct
    path is delayed by source-mic distance / c)."""
    e = rir.astype(np.float64) ** 2
    first = int(np.argmax(e > 1e-6 * e.max()))
    n = first + int(direct_ms / 1000 * sr)
    direct = np.sum(e[first:n])
    rev = np.sum(e[n:]) + 1e-12
    return float(10 * np.log10(direct / rev + 1e-12))


def create_mixture_dataset(
    clean_dir: str,
    noise_dir: str,
    out_dir: str,
    splits: Sequence[str] = ("train", "valid", "test"),
    snr_range=(0.0, 20.0),
    seed: int = 0,
    max_per_split: Optional[int] = None,
):
    """Mix clean pool with noise pool at uniform SNR per utterance."""
    rng = np.random.default_rng(seed)
    clean_files = sorted(glob.glob(os.path.join(clean_dir, "**", "*.wav"), recursive=True))
    noise_files = sorted(glob.glob(os.path.join(noise_dir, "**", "*.wav"), recursive=True))
    assert clean_files and noise_files, "empty clean or noise pool"

    n = len(clean_files)
    bounds = [0, int(0.8 * n), int(0.9 * n), n]
    written = {}
    for si, split in enumerate(splits[:3]):
        files = clean_files[bounds[si] : bounds[si + 1]]
        if max_per_split:
            files = files[:max_per_split]
        os.makedirs(os.path.join(out_dir, split, "clean"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, split, "noisy"), exist_ok=True)
        for f in files:
            x, sr = wav_io.load(f)
            noise, nsr = wav_io.load(noise_files[int(rng.integers(len(noise_files)))])
            if nsr != sr:
                noise = wav_io.resample(noise, nsr, sr)
            snr = float(rng.uniform(*snr_range))
            noisy, _ = mix_at_snr(x[0], noise[0], snr)
            base = os.path.basename(f)
            wav_io.save(os.path.join(out_dir, split, "clean", base), x, sr)
            wav_io.save(os.path.join(out_dir, split, "noisy", base), noisy[None], sr)
        written[split] = len(files)
    return written


def create_reverb_dataset(
    clean_dir: str,
    out_dir: str,
    splits: Sequence[str] = ("train", "valid", "test"),
    t60_range=(0.4, 1.0),
    seed: int = 0,
    max_per_split: Optional[int] = None,
):
    """Reverberant dataset: anechoic/reverb pairs + a DRR/T60 log CSV
    (layout parity with ``create_wsj0_reverb.py:95-118``)."""
    rng = np.random.default_rng(seed)
    clean_files = sorted(glob.glob(os.path.join(clean_dir, "**", "*.wav"), recursive=True))
    assert clean_files, "empty clean pool"
    n = len(clean_files)
    bounds = [0, int(0.8 * n), int(0.9 * n), n]
    log_rows = []
    for si, split in enumerate(splits[:3]):
        files = clean_files[bounds[si] : bounds[si + 1]]
        if max_per_split:
            files = files[:max_per_split]
        os.makedirs(os.path.join(out_dir, split, "anechoic"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, split, "reverb"), exist_ok=True)
        for f in files:
            x, sr = wav_io.load(f)
            t60 = float(rng.uniform(*t60_range))
            rir = synthesize_rir(sr, t60, rng)
            rev = fftconvolve(x[0], rir)[: x.shape[1]].astype(np.float32)
            peak = np.abs(rev).max()
            if peak > 1.0:
                rev = rev / peak
            base = os.path.basename(f)
            wav_io.save(os.path.join(out_dir, split, "anechoic", base), x, sr)
            wav_io.save(os.path.join(out_dir, split, "reverb", base), rev[None], sr)
            log_rows.append([split, base, t60, direct_to_reverberant_ratio(rir, sr)])
    with open(os.path.join(out_dir, "rir_log.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["split", "file", "t60", "drr_db"])
        w.writerows(log_rows)
    return len(log_rows)
