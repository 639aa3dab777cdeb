"""Differentiable PESQ-style loss tests: identity, monotonicity, gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu.losses import pesq_style_loss, pesq_style_mos


def _speech_like(rng, n=16000):
    t = np.arange(n) / 16000.0
    x = np.sin(2 * np.pi * 220 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * t))
    x += 0.4 * np.sin(2 * np.pi * 800 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
    return x.astype(np.float32)


def test_identity_is_zero(rng):
    x = jnp.asarray(_speech_like(rng))
    loss = float(pesq_style_loss(x, x))
    assert loss < 1e-3
    assert abs(float(pesq_style_mos(x, x)) - 4.5) < 1e-3


def test_monotone_in_noise(rng):
    x = _speech_like(rng)
    losses = []
    for s in (0.01, 0.1, 0.5):
        d = x + s * rng.standard_normal(len(x)).astype(np.float32)
        losses.append(float(pesq_style_loss(jnp.asarray(x), jnp.asarray(d))))
    assert losses[0] < losses[1] < losses[2]
    assert losses[0] > 0


def test_batched_and_differentiable(rng):
    x = jnp.asarray(np.stack([_speech_like(rng), _speech_like(rng)]))
    d = x + 0.1 * jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    loss = pesq_style_loss(x, d)
    assert loss.shape == (2,)

    g = jax.grad(lambda d: jnp.mean(pesq_style_loss(x, d)))(d)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_level_invariance(rng):
    """Level alignment: scaling the degraded signal shouldn't change much."""
    x = jnp.asarray(_speech_like(rng))
    d = x + 0.1 * jnp.asarray(rng.standard_normal(16000).astype(np.float32))
    l1 = float(pesq_style_loss(x, d))
    l2 = float(pesq_style_loss(x, 3.0 * d))
    assert abs(l1 - l2) < 0.05


@pytest.mark.slow  # ScoreModel+PESQ-loss composition compile; the PESQ
# loss math itself is covered fast above
def test_score_model_pesq_weight_path(rng):
    from task_aware_audio_coding_perceptual_tpu.models.sgmse.score_model import (
        ScoreModel,
        ScoreModelConfig,
        SpecTransforms,
    )

    cfg = ScoreModelConfig(
        backbone="ncsnpp_v2", sde="ouve",
        loss_type="data_prediction", loss_weighting="1",
        c_in="edm", c_out="edm", c_skip="edm",
        pesq_weight=0.5,
        backbone_kwargs=(("nf", 8), ("ch_mult", (1, 2)), ("num_res_blocks", 1), ("attn_resolutions", ())),
        sde_kwargs=(("N", 2),),
    )
    model = ScoreModel(cfg, SpecTransforms(n_fft=62, hop_length=16, num_frames=32))
    state = model.init(jax.random.key(0), spec_shape=(1, 1, 32, 32))
    x = jnp.asarray(
        (rng.standard_normal((2, 1, 32, 32)) + 1j * rng.standard_normal((2, 1, 32, 32))).astype(np.complex64)
    )
    loss = model.step_loss(state.params, jax.random.key(1), x, x + 0.1, train=False)
    assert np.isfinite(float(loss))
