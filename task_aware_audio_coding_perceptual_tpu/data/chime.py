"""CHiME data preparation: transcription-driven chunking -> complex-spectrogram pkl.

TPU-native re-implementation of the reference's data-prep notebook
(``spectrogram.ipynb`` cells 1, 8, 10): parse CHiME-5/6 transcription JSONs
(lists of ``{start_time, end_time, words, speaker, session_id, ...}``), cut
per-utterance (or fixed-length) chunks out of session WAVs, STFT them
(n_fft 2048, hop 512, hann) and write ``{'magnitude','phase','params'}``
pickles into ``complex_specs_<session>_<speaker>[_<device>]/`` directories.
"""

from __future__ import annotations

import json
import os
import pickle
import re
from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu import dsp
from task_aware_audio_coding_perceptual_tpu.data import wav_io


def parse_timestamp(ts) -> float:
    """Parse CHiME timestamps: float seconds or 'H:MM:SS.ff'."""
    if isinstance(ts, (int, float)):
        return float(ts)
    parts = str(ts).split(":")
    parts = [float(p) for p in parts]
    secs = 0.0
    for p in parts:
        secs = secs * 60 + p
    return secs


def load_transcription(json_path: str, speaker: Optional[str] = None) -> List[dict]:
    """Load segments, optionally filtered to one speaker."""
    with open(json_path) as f:
        segments = json.load(f)
    out = []
    for seg in segments:
        if speaker is not None and seg.get("speaker") != speaker:
            continue
        start = seg.get("start_time")
        end = seg.get("end_time")
        # CHiME-5 nests per-device times: {"start_time": {"original": ...}}
        if isinstance(start, dict):
            start = start.get("original", list(start.values())[0])
        if isinstance(end, dict):
            end = end.get("original", list(end.values())[0])
        out.append(
            {
                "start": parse_timestamp(start),
                "end": parse_timestamp(end),
                "words": seg.get("words", ""),
                "speaker": seg.get("speaker"),
                "session_id": seg.get("session_id"),
            }
        )
    return out


def create_complex_spectrogram(
    y: np.ndarray, sr: int, n_fft: int = 2048, hop_length: int = 512
) -> dict:
    """Waveform chunk -> {'magnitude','phase','params'} (notebook cell 10)."""
    win = dsp.hann_window(n_fft)
    spec = dsp.stft(jnp.asarray(y.astype(np.float32)), n_fft, hop_length, window=win)
    return {
        "magnitude": np.asarray(jnp.abs(spec)),
        "phase": np.asarray(jnp.angle(spec)),
        "params": {"sr": sr, "n_fft": n_fft, "hop_length": hop_length},
    }


def reconstruct_from_spectrogram(item: dict, length: Optional[int] = None) -> np.ndarray:
    """Inverse of :func:`create_complex_spectrogram` via ISTFT."""
    p = item["params"]
    spec = jnp.asarray(item["magnitude"]) * jnp.exp(1j * jnp.asarray(item["phase"]))
    win = dsp.hann_window(p["n_fft"])
    return np.asarray(
        dsp.istft(spec, p["n_fft"], p["hop_length"], window=win, length=length)
    )


def process_audio_file(
    wav_path: str,
    out_dir: str,
    transcription_json: Optional[str] = None,
    speaker: Optional[str] = None,
    chunk_seconds: float = 3.0,
    max_chunks: Optional[int] = None,
    n_fft: int = 2048,
    hop_length: int = 512,
    split: str = "Train",
) -> int:
    """Chunk a session WAV and write spectrogram pickles.

    With a transcription, one chunk per utterance segment; otherwise fixed
    ``chunk_seconds`` chunks (notebook cell 1). Returns #chunks written.
    Per-chunk failures are skipped (the notebook's try/except-continue).
    """
    audio, sr = wav_io.load(wav_path)
    audio = audio[0]
    os.makedirs(os.path.join(out_dir, split), exist_ok=True)

    if transcription_json is not None:
        segments = load_transcription(transcription_json, speaker)
        ranges = [
            (int(seg["start"] * sr), int(seg["end"] * sr)) for seg in segments
        ]
    else:
        step = int(chunk_seconds * sr)
        ranges = [(s, s + step) for s in range(0, len(audio) - step + 1, step)]

    written = 0
    for i, (s, e) in enumerate(ranges):
        if max_chunks is not None and written >= max_chunks:
            break
        try:
            chunk = audio[s:e]
            if len(chunk) < hop_length * 2:
                continue
            item = create_complex_spectrogram(chunk, sr, n_fft, hop_length)
            name = f"chunk_{i:05d}.pkl"
            with open(os.path.join(out_dir, split, name), "wb") as f:
                pickle.dump(item, f)
            written += 1
        except Exception:
            continue
    return written


def write_speechlike_spectral_corpus(
    root: str,
    n_train: int = 48,
    n_test: int = 8,
    n_mics: int = 4,
    duration: float = 18.0,
    sr: int = 16000,
    snr_db=(5.0, 20.0),
    n_fft: int = 2048,
    hop_length: int = 512,
    seed: int = 0,
) -> tuple:
    """Synthesize a correlated multi-microphone spectral-pkl corpus.

    Stands in for real CHiME sessions when the corpus is unavailable: each
    item is a speech-like synthetic utterance (``speech_synth``); every
    "microphone" observes the same utterance with a per-mic gain, a small
    integer sample delay, and independent noise at a random SNR — the same
    correlated-observation structure the reference's U02–U05/CH3 arrays give
    (``spectrogram.ipynb`` data-prep; ``SpectralDataset`` layout,
    ``train_pkl_file_task_aware.py:31-149``).

    Returns (clean_dir, noisy_dirs) matching :class:`SpectralDataset`.
    """
    from task_aware_audio_coding_perceptual_tpu.data import speech_synth, synth

    rng = np.random.default_rng(seed)
    clean_dir = os.path.join(root, "complex_specs_S02_P08")
    noisy_dirs = [
        os.path.join(root, f"complex_specs_S02_P08_U0{m+2}.CH3")
        for m in range(n_mics)
    ]
    for split, n_items in (("Train", n_train), ("Test", n_test)):
        os.makedirs(os.path.join(clean_dir, split), exist_ok=True)
        for d in noisy_dirs:
            os.makedirs(os.path.join(d, split), exist_ok=True)
        for i in range(n_items):
            # longer utterances built from 2-3 s pieces so the (F, 600)
            # padded frame is mostly real structure, not zeros
            pieces = []
            labels = []  # phone labels carried in the clean pkl ("labels")
            total = 0
            while total < int(duration * sr):
                u, labs = speech_synth.synthesize_utterance(
                    rng, duration=float(rng.uniform(2.0, 3.0)), sr=sr,
                    return_labels=True,
                )
                labels.extend(
                    (sym, s0 + total, s1 + total) for sym, s0, s1 in labs
                )
                pieces.append(u)
                total += len(u)
            clean = np.concatenate(pieces)[: int(duration * sr)]
            labels = [
                (sym, s0, min(s1, len(clean)))
                for sym, s0, s1 in labels
                if s0 < len(clean)
            ]

            item = create_complex_spectrogram(clean, sr, n_fft, hop_length)
            item["labels"] = labels
            with open(
                os.path.join(clean_dir, split, f"chunk_{i:05d}.pkl"), "wb"
            ) as f:
                pickle.dump(item, f)

            for d in noisy_dirs:
                delay = int(rng.integers(0, 9))
                gain = float(rng.uniform(0.6, 1.0))
                obs = np.roll(clean, delay) * gain
                # pink-ish noise: cumulative-filtered white noise
                w = rng.standard_normal(len(obs)).astype(np.float32)
                pink = np.convolve(w, np.ones(8) / 8.0, mode="same")
                mixed, _ = synth.mix_at_snr(
                    obs, pink, float(rng.uniform(*snr_db))
                )
                noisy = create_complex_spectrogram(
                    mixed.astype(np.float32), sr, n_fft, hop_length
                )
                with open(os.path.join(d, split, f"chunk_{i:05d}.pkl"), "wb") as f:
                    pickle.dump(noisy, f)
    return clean_dir, noisy_dirs


def render_spectrogram_png(
    magnitude: np.ndarray,
    out_path: str,
    top_db: float = 80.0,
) -> np.ndarray:
    """Render a magnitude spectrogram to a grayscale PNG (dB scale).

    Role of the reference's spectrogram-image rendering
    (``spectrogram.ipynb`` cell 5: magnitude -> dB image -> PNG). The
    mapping is invertible by :func:`audio_from_spectrogram_image` up to the
    ``top_db`` floor: pixel 255 = max magnitude, pixel 0 = ``-top_db`` dB.

    Returns the uint8 image that was written (freq flipped so low
    frequencies are at the bottom, image convention).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.image as mpimg

    mag = np.asarray(magnitude, np.float64)
    ref = max(mag.max(), 1e-12)
    db = 20.0 * np.log10(np.maximum(mag, 1e-12) / ref)
    db = np.clip(db, -top_db, 0.0)
    img = np.round((db + top_db) / top_db * 255.0).astype(np.uint8)
    img = img[::-1]  # low freqs at the bottom
    mpimg.imsave(out_path, img, cmap="gray", vmin=0, vmax=255)
    return img


def audio_from_spectrogram_image(
    img: np.ndarray,
    sr: int = 16000,
    n_fft: int = 2048,
    hop_length: int = 512,
    top_db: float = 80.0,
    ref_magnitude: float = 1.0,
    n_iter: int = 48,
) -> np.ndarray:
    """Reconstruct audio from a rendered spectrogram image via Griffin-Lim.

    Inverse of :func:`render_spectrogram_png` (reference image->audio path,
    ``spectrogram.ipynb`` cell 5: PNG -> magnitude -> ``librosa.griffinlim``).
    ``img`` may be uint8 grayscale (H, W) or an RGB(A) float/uint8 image read
    back with ``matplotlib.image.imread`` (first channel used).
    """
    a = np.asarray(img)
    if a.ndim == 3:
        a = a[..., 0]
    a = a.astype(np.float64)
    if a.max() > 1.0 + 1e-6:  # uint8 range
        a = a / 255.0
    db = a * top_db - top_db
    mag = ref_magnitude * 10.0 ** (db / 20.0)
    mag = mag[::-1].copy()  # undo the bottom-up flip
    wav = dsp.griffin_lim(
        jnp.asarray(mag, jnp.float32), n_fft, hop_length, n_iter=n_iter
    )
    return np.asarray(wav, np.float32)
