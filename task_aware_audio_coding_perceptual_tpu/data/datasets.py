"""Datasets: pkl complex-spectrogram pairs and paired clean/noisy wavs.

- :class:`SpectralDataset`: the outer project's dataset (reference
  ``train_pkl_file_task_aware.py:31-149`` and its 3 near-identical copies):
  per index, loads 1 clean + 4 noisy pickle dicts
  ``{'magnitude','phase','params'}`` from
  ``complex_specs_<session>_<speaker>[_U0x.CHn]/{Train,Test}`` directories,
  zero-pads (F, T) to a fixed target (1025, 600 for the task-aware scripts;
  1024, 592 for ``train_pkl_file.py:30``), optional min-max normalization
  (the ``test_pkl_file_2.py:97-110`` copy).
- :class:`Specs`: the SGMSE dataset (reference ``data_module.py:22-100``):
  sorted glob pairing, random/center crop to ``(num_frames-1)*hop`` samples,
  pad-if-short, normalization by noisy/clean max, STFT + spec transform.

Both are plain numpy loaders (host-side); batches are stacked numpy arrays
the training loops move to device in one transfer.
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Optional, Sequence, Tuple

import numpy as np

from task_aware_audio_coding_perceptual_tpu import dsp
from task_aware_audio_coding_perceptual_tpu.data import wav_io


def pad_or_crop_2d(a: np.ndarray, target: Tuple[int, int]) -> np.ndarray:
    """Zero-pad (and crop if larger) a (F, T) array to ``target``."""
    f, t = a.shape
    tf, tt = target
    a = a[: min(f, tf), : min(t, tt)]
    out = np.zeros(target, dtype=a.dtype)
    out[: a.shape[0], : a.shape[1]] = a
    return out


class SpectralDataset:
    """Correlated multi-microphone complex-spectrogram dataset.

    Args:
        clean_dir: directory of clean pkl chunks (``complex_specs_S02_P08``).
        noisy_dirs: list of per-microphone directories
            (``complex_specs_S02_P08_U0x.CH3``).
        file_type: 'Train' or 'Test' subdirectory.
        target_shape: (F, T) zero-pad target.
        normalize: min-max normalize magnitudes/phases per item
            (``test_pkl_file_2.py:97-110`` behavior).
    """

    def __init__(
        self,
        clean_dir: str,
        noisy_dirs: Sequence[str],
        file_type: str = "Train",
        target_shape: Tuple[int, int] = (1025, 600),
        normalize: bool = False,
    ):
        self.clean_files = sorted(
            glob.glob(os.path.join(clean_dir, file_type, "*.pkl"))
        )
        self.noisy_files = [
            sorted(glob.glob(os.path.join(d, file_type, "*.pkl"))) for d in noisy_dirs
        ]
        n = min([len(self.clean_files)] + [len(f) for f in self.noisy_files])
        self.clean_files = self.clean_files[:n]
        self.noisy_files = [f[:n] for f in self.noisy_files]
        self.target_shape = target_shape
        self.normalize = normalize

    def __len__(self):
        return len(self.clean_files)

    def _load(self, path: str) -> dict:
        with open(path, "rb") as f:
            d = pickle.load(f)
        mag = pad_or_crop_2d(np.asarray(d["magnitude"], np.float32), self.target_shape)
        phase = pad_or_crop_2d(np.asarray(d["phase"], np.float32), self.target_shape)
        if self.normalize:
            mag = (mag - mag.min()) / (mag.max() - mag.min() + 1e-8)
            phase = (phase - phase.min()) / (phase.max() - phase.min() + 1e-8)
        return {"magnitude": mag, "phase": phase, "params": d.get("params", {})}

    def __getitem__(self, i: int) -> dict:
        item = {"clean_audio": self._load(self.clean_files[i])}
        for k, files in enumerate(self.noisy_files):
            item[f"noisy_audio_{k+1}"] = self._load(files[i])
        return item


class Specs:
    """Paired clean/noisy wav dataset with STFT transform
    (reference ``data_module.py:22-100``)."""

    def __init__(
        self,
        data_dir: str,
        subset: str,
        dummy: bool = False,
        shuffle_spec: bool = False,
        num_frames: int = 256,
        format: str = "default",
        normalize: str = "noisy",
        n_fft: int = 510,
        hop_length: int = 128,
        window: str = "hann",
        spec_factor: float = 0.15,
        spec_abs_exponent: float = 0.5,
        transform_type: str = "exponent",
        seed: int = 0,
    ):
        join = os.path.join
        if format == "default":
            sub = ("clean", "noisy")
        elif format == "reverb":
            sub = ("anechoic", "reverb")
        else:
            raise NotImplementedError(f"Directory format {format} unknown!")
        self.clean_files = sorted(glob.glob(join(data_dir, subset, sub[0], "*.wav"))) + sorted(
            glob.glob(join(data_dir, subset, sub[0], "**", "*.wav"))
        )
        self.noisy_files = sorted(glob.glob(join(data_dir, subset, sub[1], "*.wav"))) + sorted(
            glob.glob(join(data_dir, subset, sub[1], "**", "*.wav"))
        )
        self.dummy = dummy
        self.num_frames = num_frames
        self.shuffle_spec = shuffle_spec
        self.normalize = normalize
        self.hop_length = hop_length
        self.n_fft = n_fft
        self.window = window
        self.spec_factor = spec_factor
        self.spec_abs_exponent = spec_abs_exponent
        self.transform_type = transform_type
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        if self.dummy:
            return int(len(self.clean_files) / 200)
        return len(self.clean_files)

    def _crop_pad(self, x: np.ndarray, y: np.ndarray):
        target_len = (self.num_frames - 1) * self.hop_length
        current_len = x.shape[-1]
        pad = max(target_len - current_len, 0)
        if pad == 0:
            if self.shuffle_spec:
                start = int(self._rng.uniform(0, current_len - target_len))
            else:
                start = int((current_len - target_len) / 2)
            x = x[..., start : start + target_len]
            y = y[..., start : start + target_len]
        else:
            x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad // 2, pad // 2 + pad % 2)])
            y = np.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad // 2, pad // 2 + pad % 2)])
        return x, y

    def get_waveforms(self, i: int):
        x, _ = wav_io.load(self.clean_files[i])
        y, _ = wav_io.load(self.noisy_files[i])
        x, y = self._crop_pad(x, y)
        if self.normalize == "noisy":
            normfac = np.abs(y).max()
        elif self.normalize == "clean":
            normfac = np.abs(x).max()
        else:
            normfac = 1.0
        return x / normfac, y / normfac

    def __getitem__(self, i: int):
        import jax.numpy as jnp

        x, y = self.get_waveforms(i)
        win = dsp.get_window(self.window, self.n_fft)
        X = dsp.stft(jnp.asarray(x), self.n_fft, self.hop_length, window=win)
        Y = dsp.stft(jnp.asarray(y), self.n_fft, self.hop_length, window=win)
        tf = lambda s: dsp.spec_fwd(
            s, self.spec_abs_exponent, self.spec_factor, self.transform_type
        )

        def to_np(s):
            # complex64 cannot cross device->host on the axon TPU relay;
            # transfer real/imag planes separately and recombine on host
            return np.asarray(s.real) + 1j * np.asarray(s.imag)

        return to_np(tf(X)), to_np(tf(Y))


def write_synthetic_spectral_dataset(
    root: str,
    n_items: int = 4,
    n_mics: int = 4,
    shape: Tuple[int, int] = (1025, 600),
    seed: int = 0,
):
    """Create a tiny synthetic pkl dataset with the reference layout (for
    tests and smoke training runs)."""
    rng = np.random.default_rng(seed)
    clean_dir = os.path.join(root, "complex_specs_S02_P08")
    noisy_dirs = [
        os.path.join(root, f"complex_specs_S02_P08_U0{i+2}.CH3") for i in range(n_mics)
    ]
    for split in ("Train", "Test"):
        os.makedirs(os.path.join(clean_dir, split), exist_ok=True)
        for d in noisy_dirs:
            os.makedirs(os.path.join(d, split), exist_ok=True)
        for i in range(n_items):
            base = rng.standard_normal(shape).astype(np.float32)
            item = {
                "magnitude": np.abs(base),
                "phase": rng.uniform(-np.pi, np.pi, shape).astype(np.float32),
                "params": {"sr": 16000, "n_fft": 2048, "hop_length": 512},
            }
            with open(os.path.join(clean_dir, split, f"chunk_{i}.pkl"), "wb") as f:
                pickle.dump(item, f)
            for d in noisy_dirs:
                noisy = dict(item)
                noisy["magnitude"] = item["magnitude"] + 0.1 * np.abs(
                    rng.standard_normal(shape).astype(np.float32)
                )
                with open(os.path.join(d, split, f"chunk_{i}.pkl"), "wb") as f:
                    pickle.dump(noisy, f)
    return clean_dir, noisy_dirs


def write_synthetic_specs_dataset(
    root: str, n_items: int = 4, sr: int = 16000, seconds: float = 2.2, seed: int = 0
):
    """Create a tiny clean/noisy wav tree in the SGMSE 'default' layout."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    for split in ("train", "valid", "test"):
        for sub in ("clean", "noisy"):
            os.makedirs(os.path.join(root, split, sub), exist_ok=True)
        for i in range(n_items):
            f0 = rng.uniform(100, 400)
            x = (0.5 * np.sin(2 * np.pi * f0 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(
                np.float32
            )
            y = x + 0.1 * rng.standard_normal(len(t)).astype(np.float32)
            wav_io.save(os.path.join(root, split, "clean", f"utt_{i}.wav"), x[None], sr)
            wav_io.save(os.path.join(root, split, "noisy", f"utt_{i}.wav"), y[None], sr)
    return root
