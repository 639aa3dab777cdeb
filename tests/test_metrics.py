"""Tests for the metrics suite (SI-SDR parity with the reference formula,
ESTOI sanity, PESQ proxy monotonicity, wav IO round-trip)."""

import os
import numpy as np
import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu import metrics
from task_aware_audio_coding_perceptual_tpu.data import wav_io


def _ref_si_sdr(s, s_hat):
    # verbatim formula from reference sgmse/sgmse/util/other.py:64-68
    alpha = np.dot(s_hat, s) / np.linalg.norm(s) ** 2
    return 10 * np.log10(
        np.linalg.norm(alpha * s) ** 2 / np.linalg.norm(alpha * s - s_hat) ** 2
    )


def test_si_sdr_matches_reference_formula(rng):
    s = rng.standard_normal(8000)
    s_hat = s + 0.1 * rng.standard_normal(8000)
    assert abs(metrics.si_sdr(s, s_hat) - _ref_si_sdr(s, s_hat)) < 1e-9


def test_si_sdr_jax_matches_numpy(rng):
    s = rng.standard_normal((3, 4000)).astype(np.float32)
    n = 0.05 * rng.standard_normal((3, 4000)).astype(np.float32)
    got = np.asarray(metrics.si_sdr_jax(jnp.asarray(s), jnp.asarray(s + n)))
    want = np.array([metrics.si_sdr(s[i], (s + n)[i]) for i in range(3)])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_energy_ratios(rng):
    s = rng.standard_normal(4000)
    n = rng.standard_normal(4000)
    s_hat = s + 0.3 * n
    si_sdr_v, si_sir, si_sar = metrics.energy_ratios(s_hat, s, n)
    assert si_sir <= si_sar + 60  # noise dominates artifacts here
    assert np.isfinite([si_sdr_v, si_sir, si_sar]).all()
    # sdr is dominated by the weaker of sir/sar
    assert si_sdr_v <= max(si_sir, si_sar) + 1e-6


def test_estoi_perfect_and_noisy(rng):
    t = np.arange(32000) / 16000.0
    # speech-like: sum of AM-modulated tones
    x = np.sin(2 * np.pi * 220 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * t))
    x += 0.5 * np.sin(2 * np.pi * 800 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
    clean_score = metrics.estoi(x, x, 16000)
    noisy_score = metrics.estoi(x, x + 1.0 * rng.standard_normal(len(x)), 16000)
    assert clean_score > 0.99
    assert noisy_score < clean_score


def test_pesq_proxy_monotone(rng):
    t = np.arange(32000) / 16000.0
    x = np.sin(2 * np.pi * 300 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 5 * t))
    clean = metrics.pesq_proxy(16000, x, x)
    light = metrics.pesq_proxy(16000, x, x + 0.01 * rng.standard_normal(len(x)))
    heavy = metrics.pesq_proxy(16000, x, x + 0.5 * rng.standard_normal(len(x)))
    assert 1.0 <= heavy <= light <= clean <= 4.65


def test_psnr_and_spectral_snr():
    a = jnp.ones((2, 4, 4))
    b = a * 0.9
    assert float(metrics.psnr(a, a, 1.0)) == 100.0
    snr = float(metrics.spectral_snr(a, b))
    assert abs(snr - 20.0) < 0.1  # -10log10(0.01/1)


def test_wav_io_roundtrip(tmp_path, rng):
    x = (0.5 * rng.standard_normal((1, 16000))).astype(np.float32)
    p = str(tmp_path / "t.wav")
    wav_io.save(p, x, 16000)
    y, sr = wav_io.load(p)
    assert sr == 16000 and y.shape == x.shape
    np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=2e-4)


def test_resample_length():
    x = np.zeros(16000)
    y = wav_io.resample(x, 16000, 8000)
    assert len(y) == 8000


def test_measure_rtf():
    import jax

    f = jax.jit(lambda: jnp.sum(jnp.ones((64, 64))))
    res = metrics.measure_rtf(lambda: f(), audio_seconds_per_call=1.0, warmup=1, iters=3)
    assert res.rtf > 0 and res.streams_per_chip == 1.0 / res.rtf


def test_stoi_estoi_golden_regression():
    """REGRESSION-ONLY goldens: frozen self-snapshots of this implementation
    on deterministic speech+noise pairs. They catch numeric drift, not
    wrongness (pystoi absent offline). Absolute calibration lives in
    ``test_metric_anchors.py``: the paper's one-third-octave filterbank
    constants, resampler-vs-scipy cross-checks, and analytic tone anchors.
    The property block below checks the metric axioms (identity=1, scale
    invariance, SNR monotonicity)."""
    import importlib

    S = importlib.import_module("task_aware_audio_coding_perceptual_tpu.metrics.stoi")
    from task_aware_audio_coding_perceptual_tpu.data import speech_synth

    x = speech_synth.synthesize_utterance(np.random.default_rng(42), duration=3.0, sr=16000)
    x = x / np.max(np.abs(x))
    noise = np.random.default_rng(7).standard_normal(len(x)).astype(np.float32)
    noise /= np.linalg.norm(noise) / np.linalg.norm(x)

    golden = np.load(os.path.join(os.path.dirname(__file__), "golden", "stoi_golden.npz"))
    prev_s, prev_e = -1.0, -1.0
    for snr in [-5, 0, 5, 10, 20]:
        y = x + noise * 10 ** (-snr / 20)
        s = S.stoi(x, y, 16000)
        e = S.estoi(x, y, 16000)
        np.testing.assert_allclose(s, golden[f"stoi_snr{snr}"], atol=1e-10)
        np.testing.assert_allclose(e, golden[f"estoi_snr{snr}"], atol=1e-10)
        assert s > prev_s and e > prev_e  # monotone in SNR
        assert e < s  # ESTOI is the stricter metric on additive noise
        prev_s, prev_e = s, e
    assert abs(S.stoi(x, x, 16000) - 1.0) < 1e-9
    assert abs(S.estoi(x, x, 16000) - 1.0) < 1e-9
    assert abs(S.estoi(x, 0.25 * x, 16000) - 1.0) < 1e-9  # scale invariant


def test_pesq_p862_properties_and_golden():
    """P.862 port: identity hits the known MOS-LQO ceilings (4.64 wb /
    4.55 nb), strict SNR monotonicity, constant-delay robustness, scale
    invariance. The goldens are REGRESSION-ONLY self-snapshots (ITU package
    absent offline — fidelity scoping in pesq_p862.py docstring); absolute
    anchors (published mapping ceilings, level-alignment worked values,
    lag-recovery) live in ``test_metric_anchors.py``."""
    from task_aware_audio_coding_perceptual_tpu.data import speech_synth
    from task_aware_audio_coding_perceptual_tpu.metrics.pesq_p862 import pesq_p862

    x = speech_synth.synthesize_utterance(np.random.default_rng(42), duration=3.0, sr=16000)
    x = x / np.max(np.abs(x))
    noise = np.random.default_rng(7).standard_normal(len(x))
    noise /= np.linalg.norm(noise) / np.linalg.norm(x)

    golden = np.load(os.path.join(os.path.dirname(__file__), "golden", "pesq_golden.npz"))
    assert abs(pesq_p862(16000, x, x, "wb") - 4.6439) < 2e-3
    assert abs(pesq_p862(8000, x[::2], x[::2], "nb") - 4.5486) < 2e-3
    prev = -1.0
    for snr in [0, 10, 20]:
        v = pesq_p862(16000, x, x + noise * 10 ** (-snr / 20), "wb")
        np.testing.assert_allclose(v, golden[f"pesq_wb_snr{snr}"], atol=1e-8)
        assert v > prev
        prev = v
    # robust to a constant 10 ms offset (envelope alignment): scores like
    # the undelayed SNR-20 condition (~2.9 after the r4 disturbance
    # calibration), not like a catastrophic misalignment (<1.5)
    delayed = np.roll(x + noise * 0.1, 160)
    assert pesq_p862(16000, x, delayed, "wb") > 2.5
    # level alignment makes the score gain-invariant
    assert abs(pesq_p862(16000, x, 0.1 * x, "wb") - pesq_p862(16000, x, x, "wb")) < 1e-9
