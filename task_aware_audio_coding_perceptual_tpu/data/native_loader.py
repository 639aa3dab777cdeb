"""ctypes bindings for the native C++ audio loader (``native/audioio.cpp``).

Builds the shared library on first use (g++, no external deps) into
``native/build/``; every entry point has a pure-Python fallback so the
framework works without a toolchain. The batch loader decodes WAVs with a
thread pool into one contiguous float32 buffer — one host-to-device
transfer per batch.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "native", "audioio.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libaudioio.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", _SRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception:
        return None


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _LIB_PATH if os.path.exists(_LIB_PATH) else _build()
        if path is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _build_failed = True
            return None
        lib.audioio_wav_info.restype = ctypes.c_int64
        lib.audioio_wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
        lib.audioio_wav_read.restype = ctypes.c_int64
        lib.audioio_wav_read.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.audioio_load_batch.restype = ctypes.c_int
        lib.audioio_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def wav_info(path: str) -> tuple[int, int]:
    """(num_mono_frames, sample_rate)."""
    lib = get_lib()
    if lib is None:
        from task_aware_audio_coding_perceptual_tpu.data import wav_io

        x, sr = wav_io.load(path)
        return x.shape[-1], sr
    sr = ctypes.c_int(0)
    n = lib.audioio_wav_info(path.encode(), ctypes.byref(sr))
    if n < 0:
        raise IOError(f"failed to parse {path} (code {n})")
    return int(n), int(sr.value)


def load_wav(path: str) -> tuple[np.ndarray, int]:
    """Mono float32 waveform + sample rate via the native decoder."""
    lib = get_lib()
    if lib is None:
        from task_aware_audio_coding_perceptual_tpu.data import wav_io

        x, sr = wav_io.load(path)
        return x[0], sr
    n, _ = wav_info(path)
    out = np.empty(n, np.float32)
    sr = ctypes.c_int(0)
    got = lib.audioio_wav_read(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, ctypes.byref(sr), 1,
    )
    if got < 0:
        raise IOError(f"failed to read {path} (code {got})")
    return out[:got], int(sr.value)


def load_batch(
    paths: Sequence[str],
    target_len: int,
    starts: Optional[Sequence[int]] = None,
    normalize: bool = False,
    num_threads: int = 0,
) -> np.ndarray:
    """Decode + crop/pad a batch of WAVs into one (B, target_len) buffer."""
    lib = get_lib()
    if lib is None:  # pure-Python fallback
        from task_aware_audio_coding_perceptual_tpu.data import wav_io

        out = np.zeros((len(paths), target_len), np.float32)
        for i, p in enumerate(paths):
            x, _ = wav_io.load(p)
            x = x.mean(0) if x.shape[0] > 1 else x[0]
            s = 0 if starts is None else int(starts[i])
            s = max(0, min(s, max(len(x) - target_len, 0)))
            seg = x[s : s + target_len]
            out[i, : len(seg)] = seg
            if normalize:
                out[i] /= max(np.abs(out[i]).max(), 1e-9)
        return out

    n = len(paths)
    out = np.empty((n, target_len), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_starts = None
    if starts is not None:
        arr = np.asarray(starts, np.int64)
        c_starts = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    failures = lib.audioio_load_batch(
        c_paths, n, target_len, c_starts,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(normalize), num_threads,
    )
    if failures:
        raise IOError(f"{failures}/{n} files failed to decode")
    return out
