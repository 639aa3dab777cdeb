"""SGMSE enhancement quality regression: the committed trained score-model
artifact must beat the noisy input on held-out synthetic mixtures.

This is the floor test for the reference's core deliverable — a diffusion
enhancer whose ``enhance()`` output wins against the noisy baseline on
SI-SDR/ESTOI (the reference validates exactly this every epoch and selects
checkpoints on it, ``sgmse/sgmse/model.py:205-262``, ``train.py:88-97``).
The artifact is exported by ``scripts/train_sgmse_real.py``; the full
held-out report lives in ``results/sgmse_enhancement_report.json``.

A regression anywhere in the enhance chain (spec transforms, pad, PC
sampler, SDE coefficients, NCSN++ forward, flash attention, EMA handling)
breaks this test even though it loads no trainer code.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ARTIFACT = os.path.join(
    os.path.dirname(__file__), "golden", "sgmse_ema_params.npz"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(ARTIFACT), reason="trained sgmse artifact not committed"
)

# must match scripts/train_sgmse_real.py's backbone flags
BACKBONE_KWARGS = (
    ("nf", 64), ("ch_mult", (1, 1, 2)), ("num_res_blocks", 2),
    ("attn_resolutions", (16,)),
)


def _load_model():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from export_codec_ckpt import unflatten

    from task_aware_audio_coding_perceptual_tpu.models.sgmse.score_model import (
        ScoreModel,
        ScoreModelConfig,
    )

    z = np.load(ARTIFACT)
    ema_params = jax.tree.map(jnp.asarray, unflatten({k: z[k] for k in z.files}))
    model = ScoreModel(ScoreModelConfig(backbone="ncsnpp",
                                        backbone_kwargs=BACKBONE_KWARGS))
    return model, ema_params


def _held_out_pair(seed: int):
    """Clean/noisy mixture from the training distribution family with an
    unseen RNG stream (training corpus used seeds 123/7; speech pool is the
    seeded synthetic-speech generator)."""
    from task_aware_audio_coding_perceptual_tpu.data import speech_synth

    rng = np.random.default_rng(10_000 + seed)
    x = speech_synth.synthesize_utterance(rng, duration=2.0, sr=16000)
    x = (x / np.max(np.abs(x)) * 0.5).astype(np.float32)
    w = rng.standard_normal(x.shape[0]).astype(np.float32)
    pink = np.convolve(w, np.ones(8) / 8.0, mode="same")
    am = 0.5 + 0.5 * np.sin(2 * np.pi * 1.7 * np.arange(len(x)) / 16000)
    n = (pink * am).astype(np.float32)
    snr_db = 5.0
    n *= np.linalg.norm(x) / (np.linalg.norm(n) + 1e-9) * 10 ** (-snr_db / 20)
    return x, x + n


@pytest.mark.slow
def test_trained_sgmse_enhances_heldout():
    """enhance() must improve SI-SDR over the noisy input on unseen
    mixtures, by a committed margin (floor set from the trained run's
    held-out report minus safety slack).

    Slow-marked: ~20 score-net evals on the suite's 1-core CPU backend.
    N=10 (vs the report's 30) keeps the wall time bounded; the trained
    model's gain at N=10 still clears the floor with a wide margin (the
    full-N evidence lives in results/sgmse_enhancement_report.json).
    """
    from task_aware_audio_coding_perceptual_tpu.metrics import si_sdr

    model, ema_params = _load_model()
    x, y = _held_out_pair(0)
    x_hat = np.asarray(model.enhance(
        ema_params, jnp.asarray(y), key=jax.random.key(0), N=10))
    L = min(len(x), len(x_hat))
    gain = float(si_sdr(x[:L], x_hat[:L]) - si_sdr(x[:L], y[:L]))
    assert gain > 1.0, (
        f"enhancement no longer beats the noisy baseline: SI-SDR gain "
        f"{gain:.2f} dB on a held-out mixture (floor +1.0 dB)"
    )
