"""Synthetic speech generator (source-filter model) for offline training.

The environment has no speech corpus and no network egress, so codec/AE
training quality is demonstrated on synthetic speech with realistic
structure: a glottal source (band-limited sawtooth with drifting F0 and
jitter), a cascade of time-varying formant resonators sampled from vowel
targets, unvoiced fricative segments (filtered noise), coarticulation
(formant interpolation across segment boundaries), pauses, and a slow
amplitude envelope.

This plays the corpus role WSJ0/CHiME audio plays for the reference
(``sgmse/preprocessing/create_wsj0_chime3.py``); the generator is seeded and
deterministic so datasets are reproducible.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from scipy.signal import lfilter

from task_aware_audio_coding_perceptual_tpu.data import wav_io

# (F1, F2, F3) targets in Hz for a vowel inventory (typical adult values).
_VOWELS = np.array(
    [
        (730, 1090, 2440),  # /a/
        (270, 2290, 3010),  # /i/
        (300, 870, 2240),  # /u/
        (530, 1840, 2480),  # /e/
        (570, 840, 2410),  # /o/
        (660, 1720, 2410),  # /ae/
        (490, 1350, 1690),  # /er/
        (440, 1020, 2240),  # /ʊ/
    ],
    dtype=np.float64,
)

_FRIC_BANDS = [(2500.0, 6000.0), (1500.0, 4500.0), (4000.0, 7500.0)]


def _resonator_coeffs(freq: float, bw: float, sr: int):
    """Second-order all-pole resonator (Klatt-style formant filter)."""
    r = np.exp(-np.pi * bw / sr)
    theta = 2 * np.pi * freq / sr
    a1 = -2 * r * np.cos(theta)
    a2 = r * r
    b0 = 1 - 2 * r * np.cos(theta) + r * r  # unity gain at resonance-ish
    return [b0], [1.0, a1, a2]


def _bandlimited_sawtooth(phase: np.ndarray, n_harm: int = 24) -> np.ndarray:
    """Additive sawtooth: sum sin(2πk·phase)/k, band-limited by n_harm."""
    out = np.zeros_like(phase)
    for k in range(1, n_harm + 1):
        out += np.sin(2 * np.pi * k * phase) / k
    return out * (2 / np.pi)


# CTC label inventory: 0 is reserved for the CTC blank; vowels map to
# 1..len(_VOWELS), fricatives to len(_VOWELS)+1..len(_VOWELS)+len(_FRIC_BANDS).
VOCAB_SIZE = 1 + len(_VOWELS) + len(_FRIC_BANDS)


def synthesize_utterance(
    rng: np.random.Generator,
    duration: float = 2.0,
    sr: int = 16000,
    f0_range=(85.0, 255.0),
    peak: float = 0.7,
    return_labels: bool = False,
):
    """One synthetic utterance: sequence of voiced/unvoiced/silent segments.

    With ``return_labels=True`` also returns the phone-label sequence
    ``[(symbol_id, start_sample, end_sample), ...]`` derived from the SAME
    random draws (the RNG consumption is unchanged, so seeded corpora are
    byte-identical with or without labels). This makes the corpus *labeled
    speech* — the offline stand-in for the reference's pretrained
    Wav2Vec2ForCTC task head (``train_pkl_file_task_aware.py:252-259``): a
    CTC ASR trained on these labels becomes a real frozen task head.
    """
    n = int(duration * sr)
    out = np.zeros(n, np.float64)
    labels: list = []
    t = 0
    prev_formants = _VOWELS[rng.integers(len(_VOWELS))]
    log_f0 = np.log(rng.uniform(*f0_range))

    while t < n:
        seg_len = int(rng.uniform(0.06, 0.30) * sr)
        seg_len = min(seg_len, n - t)
        kind = rng.choice(["voiced", "unvoiced", "silence"], p=[0.62, 0.23, 0.15])

        if kind == "silence":
            t += seg_len
            continue

        if kind == "voiced":
            # F0 contour: random-walk in log domain with declination
            steps = rng.standard_normal(seg_len) * 0.0015 - 0.15 / sr
            f0 = np.exp(log_f0 + np.cumsum(steps))
            f0 = np.clip(f0, f0_range[0] * 0.7, f0_range[1] * 1.4)
            log_f0 = np.log(f0[-1])
            jitter = 1.0 + 0.01 * rng.standard_normal(seg_len)
            phase = np.cumsum(f0 * jitter / sr)
            src = _bandlimited_sawtooth(phase, n_harm=int(min(24, sr / 2 / f0.max())))
            # glottal spectral tilt: leaky integrator -> ~-12 dB/oct source
            src = lfilter([1.0], [1.0, -0.9], src)
            # aspiration noise mixed into the source
            src += 0.03 * rng.standard_normal(seg_len)

            vowel_idx = int(rng.integers(len(_VOWELS)))
            target = _VOWELS[vowel_idx]
            labels.append((1 + vowel_idx, t, t + seg_len))
            # coarticulation: linear glide from previous formants
            y = src
            seg = np.zeros(seg_len)
            # piecewise filtering in 2 halves to approximate the glide
            halves = np.array_split(np.arange(seg_len), 2)
            for hi, idx in enumerate(halves):
                mix = (hi + 1) / (len(halves) + 0.0)
                formants = prev_formants * (1 - mix) + target * mix
                h = y[idx]
                for fi, f in enumerate(formants):
                    b, a = _resonator_coeffs(f, 60.0 + 40.0 * fi, sr)
                    h = lfilter(b, a, h)
                seg[idx] = h
            prev_formants = target
        else:  # unvoiced fricative
            fric_idx = int(rng.integers(len(_FRIC_BANDS)))
            band = _FRIC_BANDS[fric_idx]
            labels.append((1 + len(_VOWELS) + fric_idx, t, t + seg_len))
            noise = rng.standard_normal(seg_len)
            center = float(rng.uniform(*band))
            b, a = _resonator_coeffs(center, 900.0, sr)
            seg = lfilter(b, a, noise) * 0.5

        # attack/decay ramps to avoid clicks
        ramp = min(int(0.01 * sr), seg_len // 2)
        env = np.ones(seg_len)
        if ramp > 0:
            env[:ramp] = np.linspace(0, 1, ramp)
            env[-ramp:] = np.linspace(1, 0, ramp)
        # slow amplitude modulation (syllabic stress)
        lfo = 1.0 + 0.25 * np.sin(
            2 * np.pi * rng.uniform(2.0, 5.0) * np.arange(seg_len) / sr
            + rng.uniform(0, 2 * np.pi)
        )
        out[t : t + seg_len] += seg * env * lfo * rng.uniform(0.5, 1.0)
        t += seg_len

    m = np.abs(out).max()
    if m > 0:
        out = out / m * peak * rng.uniform(0.5, 1.0)
    if return_labels:
        return out.astype(np.float32), labels
    return out.astype(np.float32)


def generate_corpus(
    out_dir: str,
    n_utterances: int = 2000,
    duration: float = 2.0,
    sr: int = 16000,
    seed: int = 0,
    prefix: str = "synth",
) -> list[str]:
    """Write a seeded corpus of wavs; returns the file list."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(n_utterances):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        wav = synthesize_utterance(rng, duration=duration, sr=sr)
        p = os.path.join(out_dir, f"{prefix}_{i:05d}.wav")
        wav_io.save(p, wav[None], sr)
        paths.append(p)
    return paths


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--duration", type=float, default=2.0)
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    files = generate_corpus(args.out_dir, args.n, args.duration, args.sr, args.seed)
    print(f"wrote {len(files)} utterances to {args.out_dir}")
