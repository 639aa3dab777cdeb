"""Synthetic noisy-speech dataset creation (WSJ0-mixing style).

Equivalents of the reference's preprocessing scripts
(``sgmse/preprocessing/create_wsj0_chime3.py`` etc.):

- :func:`mix_at_snr`: clean + noise mixed at a target SNR (uniform in
  [0, 20] dB in the reference, ``create_wsj0_chime3.py:18-20``).
- :func:`create_mixture_dataset`: walks clean/noise wav pools and writes the
  ``{split}/{clean,noisy}`` tree the ``Specs`` dataset expects.
- :func:`synthesize_rir` + :func:`create_reverb_dataset`: a reverberant
  variant in the spirit of ``create_wsj0_reverb.py`` — pyroomacoustics is
  not available in this environment, so RIRs come from a seeded
  exponential-decay noise model parameterized by T60 (documented deviation;
  the dataset layout and DRR logging match).
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


def synthesize_rir(
    sr: int, t60: float, rng: np.random.Generator, direct_delay_s: float = 0.005
) -> np.ndarray:
    """Exponential-decay noise RIR with a direct-path impulse."""
    length = int(sr * max(t60 * 1.5, 0.1))
    t = np.arange(length) / sr
    decay = np.exp(-6.908 * t / max(t60, 1e-3))  # -60 dB at t60
    tail = rng.standard_normal(length) * decay
    rir = np.zeros(length)
    d = int(direct_delay_s * sr)
    rir[d] = 1.0
    rir[d + 1 :] += 0.3 * tail[: length - d - 1]
    return (rir / (np.abs(rir).max() + 1e-9)).astype(np.float32)


def direct_to_reverberant_ratio(rir: np.ndarray, sr: int, direct_ms: float = 8.0) -> float:
    n = int(direct_ms / 1000 * sr)
    direct = np.sum(rir[:n] ** 2)
    rev = np.sum(rir[n:] ** 2) + 1e-12
    return float(10 * np.log10(direct / rev))


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
