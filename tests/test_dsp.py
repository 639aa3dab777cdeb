"""Golden parity tests for the DSP core against torch.stft/torch.istft.

The reference mixes librosa (data prep) and torch (training) STFTs; torch CPU
is available in this environment and serves as the golden reference for both
configurations: outer (2048/512 hann) and sgmse (510/128 hann).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu import dsp


CONFIGS = [
    dict(n_fft=2048, hop=512),  # outer project (train_pkl_file_task_aware.py:174-208)
    dict(n_fft=510, hop=128),  # sgmse (data_module.py:109-112)
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=["outer2048", "sgmse510"])
def test_stft_matches_torch(cfg, rng):
    n_fft, hop = cfg["n_fft"], cfg["hop"]
    x = rng.standard_normal(n_fft * 6 + 123).astype(np.float32)

    win_t = torch.hann_window(n_fft, periodic=True)
    ref = torch.stft(
        torch.from_numpy(x), n_fft, hop, window=win_t, center=True,
        pad_mode="reflect", return_complex=True,
    ).numpy()

    win_j = dsp.hann_window(n_fft)
    got = np.asarray(dsp.stft(jnp.asarray(x), n_fft, hop, window=win_j))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cfg", CONFIGS, ids=["outer2048", "sgmse510"])
def test_istft_matches_torch(cfg, rng):
    n_fft, hop = cfg["n_fft"], cfg["hop"]
    x = rng.standard_normal(n_fft * 5).astype(np.float32)
    win_t = torch.hann_window(n_fft, periodic=True)
    spec_t = torch.stft(
        torch.from_numpy(x), n_fft, hop, window=win_t, center=True,
        pad_mode="reflect", return_complex=True,
    )
    ref = torch.istft(spec_t, n_fft, hop, window=win_t, center=True, length=len(x)).numpy()

    win_j = dsp.hann_window(n_fft)
    got = np.asarray(
        dsp.istft(jnp.asarray(spec_t.numpy()), n_fft, hop, window=win_j, length=len(x))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_stft_istft_roundtrip_batched(rng):
    x = rng.standard_normal((3, 4096)).astype(np.float32)
    win = dsp.hann_window(512)
    spec = dsp.stft(jnp.asarray(x), 512, 128, window=win)
    y = dsp.istft(spec, 512, 128, window=win, length=4096)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


def test_sqrthann_roundtrip(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    win = dsp.get_window("sqrthann", 510)
    spec = dsp.stft(jnp.asarray(x), 510, 128, window=win)
    y = dsp.istft(spec, 510, 128, window=win, length=4000)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


def test_spec_fwd_back_inverse(rng):
    z = (rng.standard_normal((5, 64, 32)) + 1j * rng.standard_normal((5, 64, 32))).astype(
        np.complex64
    )
    for tt in ["exponent", "log", "none"]:
        f = dsp.spec_fwd(jnp.asarray(z), transform_type=tt)
        b = dsp.spec_back(f, transform_type=tt)
        np.testing.assert_allclose(np.asarray(b), z, rtol=1e-3, atol=1e-4)


def test_spec_fwd_matches_torch_formula(rng):
    z = (rng.standard_normal((64, 32)) + 1j * rng.standard_normal((64, 32))).astype(np.complex64)
    zt = torch.from_numpy(z)
    ref = (zt.abs() ** 0.5 * torch.exp(1j * zt.angle()) * 0.15).numpy()
    got = np.asarray(dsp.spec_fwd(jnp.asarray(z)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_pad_spec_to_64():
    Y = jnp.ones((1, 1, 256, 100))
    out = dsp.pad_spec(Y)
    assert out.shape[-1] == 128
    assert np.asarray(out[..., 100:]).sum() == 0
    out_r = dsp.pad_spec(Y, mode="reflection")
    assert out_r.shape[-1] == 128
    same = dsp.pad_spec(jnp.ones((1, 1, 256, 128)))
    assert same.shape[-1] == 128


def test_mel_filterbank_shape_and_coverage():
    fb = np.asarray(dsp.mel_filterbank(16000, 1024, n_mels=80))
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every mel filter has support
    assert (fb.sum(axis=1) > 0).all()


def test_mel_spectrogram_runs(rng):
    mag = jnp.asarray(np.abs(rng.standard_normal((2, 513, 50))).astype(np.float32))
    fb = dsp.mel_filterbank(16000, 1024, n_mels=80)
    mel = dsp.mel_spectrogram(mag, fb)
    assert mel.shape == (2, 80, 50)
    assert np.isfinite(np.asarray(mel)).all()


def test_griffin_lim_reconstructs_sinusoid_spectrum():
    """Griffin-Lim recovers a phase whose STFT magnitude converges to the
    target (reference image->audio path, spectrogram.ipynb cell 5)."""
    import importlib

    S = importlib.import_module("task_aware_audio_coding_perceptual_tpu.dsp.stft")
    sr = 4000
    t = np.arange(sr) / sr
    x = (0.6 * np.sin(2 * np.pi * 220 * t) + 0.3 * np.sin(2 * np.pi * 555 * t)).astype(
        np.float32
    )
    win = S.hann_window(256)
    mag = jnp.abs(S.stft(jnp.asarray(x), 256, 64, window=win))
    y = S.griffin_lim(mag, 256, 64, n_iter=48, length=sr)
    assert y.shape == (sr,)
    mag_y = np.abs(np.asarray(S.stft(y, 256, 64, window=win)))
    sc = np.linalg.norm(mag_y - np.asarray(mag)) / np.linalg.norm(np.asarray(mag))
    assert sc < 0.25, f"spectral convergence {sc}"
    # sanity: zero iterations is measurably worse than 32
    y0 = S.griffin_lim(mag, 256, 64, n_iter=0, length=sr)
    mag_y0 = np.abs(np.asarray(S.stft(y0, 256, 64, window=win)))
    sc0 = np.linalg.norm(mag_y0 - np.asarray(mag)) / np.linalg.norm(np.asarray(mag))
    assert sc < sc0
