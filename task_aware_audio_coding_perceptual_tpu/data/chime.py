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
