"""Native C++ audio loader tests: parity with scipy IO, batch semantics."""

import numpy as np
import pytest

from task_aware_audio_coding_perceptual_tpu.data import native_loader, wav_io


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    root = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    paths, signals = [], []
    for i, sr in enumerate((16000, 8000, 16000)):
        x = (0.5 * rng.standard_normal(sr // 2 + i * 100)).astype(np.float32)
        p = str(root / f"w{i}.wav")
        wav_io.save(p, x[None], sr)
        paths.append(p)
        signals.append(np.clip(x, -1, 1))
    # float32-encoded wav too
    xf = (0.25 * rng.standard_normal(4000)).astype(np.float32)
    pf = str(root / "f32.wav")
    wav_io.save(pf, xf[None], 16000, dtype="float32")
    paths.append(pf)
    signals.append(xf)
    return paths, signals


def test_native_available():
    assert native_loader.available(), "native library failed to build"


def test_wav_info_and_read_parity(wavs):
    paths, signals = wavs
    for p, x in zip(paths, signals):
        n, sr = native_loader.wav_info(p)
        assert n == len(x)
        y, sr2 = native_loader.load_wav(p)
        assert sr2 == sr
        np.testing.assert_allclose(y, x, atol=1e-4)


def test_load_batch_crop_pad_normalize(wavs):
    paths, signals = wavs
    T = 6000
    out = native_loader.load_batch(paths, T, starts=[100, 0, 0, 0])
    assert out.shape == (len(paths), T)
    # item 0 (8000 frames): crop [100, 6100)
    np.testing.assert_allclose(out[0], signals[0][100 : 100 + T], atol=1e-4)
    # item 1 (4100 frames): shorter than T -> zero-padded tail
    n1 = len(signals[1])
    np.testing.assert_allclose(out[1, :n1], signals[1], atol=1e-4)
    assert np.all(out[1, n1:] == 0)
    # normalization peaks at 1
    outn = native_loader.load_batch(paths, T, normalize=True)
    peaks = np.abs(outn).max(axis=1)
    np.testing.assert_allclose(peaks, 1.0, atol=1e-3)


def test_load_batch_matches_python_fallback(wavs):
    paths, _ = wavs
    T = 3000
    native = native_loader.load_batch(paths, T, starts=[10, 20, 30, 0])
    # force fallback path
    lib = native_loader._lib
    try:
        native_loader._lib = None
        native_loader._build_failed = True
        py = native_loader.load_batch(paths, T, starts=[10, 20, 30, 0])
    finally:
        native_loader._lib = lib
        native_loader._build_failed = False
    np.testing.assert_allclose(native, py, atol=1e-4)


def test_bad_file_reports(tmp_path):
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav at all")
    if not native_loader.available():
        pytest.skip("native lib unavailable")
    with pytest.raises(IOError):
        native_loader.load_batch([str(bad)], 100)
