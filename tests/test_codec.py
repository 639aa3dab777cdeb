"""Codec tests: shapes, RVQ determinism/parity, streaming==full equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu.models import rvq as rvq_lib
from task_aware_audio_coding_perceptual_tpu.models import streaming
from task_aware_audio_coding_perceptual_tpu.models.codec import (
    CodecConfig,
    NeuralAudioCodec,
)
from task_aware_audio_coding_perceptual_tpu.ops import rvq_kernels


SMALL = CodecConfig(
    channels=8, latent_dim=16, strides=(2, 4), num_quantizers=4, codebook_size=64
)


@pytest.fixture(scope="module")
def codec_and_params():
    model = NeuralAudioCodec(SMALL)
    x = jnp.zeros((1, SMALL.hop * 4, 1))
    params = model.init(jax.random.key(0), x)
    return model, params


def test_shapes(codec_and_params):
    model, params = codec_and_params
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, SMALL.hop * 10, 1)), jnp.float32)
    z = model.apply(params, x, method=NeuralAudioCodec.encode)
    assert z.shape == (2, 10, SMALL.latent_dim)
    y = model.apply(params, z, method=NeuralAudioCodec.decode)
    assert y.shape == x.shape


def test_rvq_pallas_matches_ref(rng):
    x = jnp.asarray(rng.standard_normal((100, 16)).astype(np.float32))
    cb = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    i1, q1, _ = rvq_kernels.nearest_codebook_ref(x, cb)
    i2, q2 = rvq_kernels.nearest_codebook_pallas(x, cb)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), rtol=1e-6)


def test_rvq_tie_breaking():
    # two identical codewords: must pick the lower index
    cb = jnp.asarray(np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]], np.float32))
    x = jnp.asarray(np.array([[1.0, 0.0]], np.float32))
    i_ref, _, _ = rvq_kernels.nearest_codebook_ref(x, cb)
    i_pal, _ = rvq_kernels.nearest_codebook_pallas(x, cb)
    assert int(i_ref[0]) == 0 and int(i_pal[0]) == 0


def test_rvq_quantize_roundtrip(rng):
    state = rvq_lib.init_rvq(jax.random.key(1), 4, 64, 16)
    x = jnp.asarray(rng.standard_normal((3, 7, 16)).astype(np.float32))
    out = rvq_lib.quantize(state, x, use_pallas=False)
    assert out.codes.shape == (4, 3, 7)
    assert out.quantized.shape == x.shape
    # dequantize(codes) must equal the quantized values (minus straight-through x)
    deq = rvq_lib.dequantize(state, out.codes)
    resid_q = np.asarray(out.quantized - x + jax.lax.stop_gradient(x))  # = sg(q)
    np.testing.assert_allclose(np.asarray(deq), resid_q, rtol=1e-4, atol=1e-5)
    # fewer active levels -> codes prefix identical
    out2 = rvq_lib.quantize(state, x, num_active=2, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(out2.codes), np.asarray(out.codes[:2]))


def test_rvq_straight_through_grads(rng):
    state = rvq_lib.init_rvq(jax.random.key(1), 2, 32, 8)
    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))

    def loss(x):
        out = rvq_lib.quantize(state, x, use_pallas=False)
        return jnp.sum(out.quantized**2)

    g = jax.grad(loss)(x)
    # straight-through: dL/dx = 2*quantized (as if identity)
    q = rvq_lib.quantize(state, x, use_pallas=False).quantized
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(q), rtol=1e-5)


def test_rvq_ema_update_moves_codebook(rng):
    state = rvq_lib.init_rvq(jax.random.key(1), 2, 16, 8)
    x = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))
    out = rvq_lib.quantize(state, x, use_pallas=False)
    new_state = rvq_lib.ema_update(state, x, out.codes, decay=0.5)
    assert not np.allclose(np.asarray(new_state.codebooks), np.asarray(state.codebooks))
    # EMA counts grew toward usage
    assert float(jnp.sum(new_state.ema_count)) > 0


def test_streaming_encoder_matches_full(codec_and_params):
    model, params = codec_and_params
    rng = np.random.default_rng(3)
    T = SMALL.hop * 8
    x = jnp.asarray(rng.standard_normal((2, T, 1)).astype(np.float32))
    full = model.apply(params, x, method=NeuralAudioCodec.encode)
    chunked = streaming.streaming_encode(model, params, x, chunk=SMALL.hop * 2)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), rtol=1e-4, atol=1e-5)


def test_streaming_decoder_matches_full(codec_and_params):
    model, params = codec_and_params
    rng = np.random.default_rng(4)
    z = jnp.asarray(rng.standard_normal((1, 8, SMALL.latent_dim)).astype(np.float32))
    full = model.apply(params, z, method=NeuralAudioCodec.decode)
    chunked = streaming.streaming_decode(model, params, z, frames_per_chunk=2)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), rtol=1e-4, atol=1e-5)


def test_streaming_roundtrip_matches_offline(codec_and_params):
    model, params = codec_and_params
    rng = np.random.default_rng(5)
    T = SMALL.hop * 8
    x = jnp.asarray(rng.standard_normal((1, T, 1)).astype(np.float32))
    state = rvq_lib.init_rvq(jax.random.key(2), SMALL.num_quantizers, SMALL.codebook_size, SMALL.latent_dim)

    # offline: full encode -> quantize -> full decode
    z = model.apply(params, x, method=NeuralAudioCodec.encode)
    q = rvq_lib.quantize(state, z, use_pallas=False)
    y_off = model.apply(params, q.quantized, method=NeuralAudioCodec.decode)

    y_str, codes = streaming.streaming_roundtrip(
        model, params, state, x, chunk=SMALL.hop * 2, use_pallas=False
    )
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(q.codes))
    np.testing.assert_allclose(np.asarray(y_str), np.asarray(y_off), rtol=1e-4, atol=1e-5)


def test_causality(codec_and_params):
    """Changing future samples must not change past encoder output."""
    model, params = codec_and_params
    rng = np.random.default_rng(6)
    T = SMALL.hop * 8
    x1 = rng.standard_normal((1, T, 1)).astype(np.float32)
    x2 = x1.copy()
    x2[:, T // 2 :, :] += 10.0  # perturb the future
    z1 = np.asarray(model.apply(params, jnp.asarray(x1), method=NeuralAudioCodec.encode))
    z2 = np.asarray(model.apply(params, jnp.asarray(x2), method=NeuralAudioCodec.encode))
    f_half = (T // 2) // SMALL.hop
    np.testing.assert_allclose(z1[:, :f_half], z2[:, :f_half], atol=1e-6)
    assert np.abs(z1[:, f_half:] - z2[:, f_half:]).max() > 1e-3


def test_fold_weight_norm_matches(rng):
    import dataclasses

    from task_aware_audio_coding_perceptual_tpu.models.fold import fold_weight_norm

    cfg = SMALL  # weight_norm=True by default
    m_wn = NeuralAudioCodec(cfg)
    m_plain = NeuralAudioCodec(dataclasses.replace(cfg, weight_norm=False))
    wav = jnp.asarray(rng.standard_normal((2, cfg.hop * 8, 1)).astype(np.float32))
    p = m_wn.init(jax.random.key(3), wav)
    pf = fold_weight_norm(p)
    z1 = m_wn.apply(p, wav, method=NeuralAudioCodec.encode)
    z2 = m_plain.apply(pf, wav, method=NeuralAudioCodec.encode)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)


def test_rvq_reseed_dead_codes(rng):
    """Codewords with EMA count below threshold are replaced by batch
    residuals and their EMA stats reset; live codewords are untouched."""
    from task_aware_audio_coding_perceptual_tpu.models import rvq as rvq_lib

    state = rvq_lib.init_rvq(jax.random.key(0), 2, 16, 4)
    # mark half of level-0 codes dead
    counts = state.ema_count.at[0, :8].set(0.001)
    state = state.replace(ema_count=counts)
    latents = jnp.asarray(rng.standard_normal((64, 4)).astype(np.float32))

    new_state, dead = rvq_lib.reseed_dead_codes(state, jax.random.key(1), latents)
    assert int(dead[0]) == 8 and int(dead[1]) == 0
    # dead rows changed, live rows identical
    assert not np.allclose(np.asarray(new_state.codebooks[0, :8]),
                           np.asarray(state.codebooks[0, :8]))
    np.testing.assert_array_equal(np.asarray(new_state.codebooks[0, 8:]),
                                  np.asarray(state.codebooks[0, 8:]))
    np.testing.assert_array_equal(np.asarray(new_state.codebooks[1]),
                                  np.asarray(state.codebooks[1]))
    # reseeded EMA count reset to 1
    assert np.all(np.asarray(new_state.ema_count[0, :8]) == 1.0)


@pytest.mark.slow  # fast-lane budget (VERDICT r3 item 8): compile-heavy;
# sibling fast tests keep this component covered in the fast lane
def test_gan_multistep_matches_sequential(rng):
    """K scanned GAN steps == K sequential calls of the per-step fn."""
    from task_aware_audio_coding_perceptual_tpu.models.codec import CodecConfig
    from task_aware_audio_coding_perceptual_tpu.train import gan_train

    from task_aware_audio_coding_perceptual_tpu.train.codec_train import CodecLossWeights

    config = CodecConfig(channels=4, latent_dim=8, strides=(2, 4),
                         num_quantizers=2, codebook_size=32)
    small = dict(n_ffts=(64,), hop_lengths=(16,), win_lengths=(64,))
    # single tiny FFT stack: the equivalence claim is about the step/scan
    # structure, not the loss stack, and the small graph compiles ~3x faster
    tiny_w = CodecLossWeights(mrstft_ffts=(64,), mrstft_hops=(16,),
                              mel_ffts=(64,), mel_hops=(16,))
    model, disc, state, gtx, dtx = gan_train.create_gan_state(
        config, jax.random.key(0), disc_filters=4, disc_kwargs=small)
    wavs = jnp.asarray(rng.standard_normal((2, 2, config.hop * 16, 1)).astype(np.float32))

    step = jax.jit(gan_train.make_gan_train_step(model, disc, gtx, dtx,
                                                 weights=tiny_w, use_pallas=False))
    s_seq = state
    for k in range(2):
        s_seq, _ = step(s_seq, wavs[k], 1.0)

    multi = jax.jit(gan_train.make_gan_train_multistep(model, disc, gtx, dtx,
                                                       weights=tiny_w,
                                                       use_pallas=False))
    s_multi, m = multi(state, wavs, 1.0)
    assert int(s_multi.step) == int(s_seq.step) == 2
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s_multi.gen_params)[0]),
        np.asarray(jax.tree.leaves(s_seq.gen_params)[0]), rtol=2e-5, atol=2e-6)


@pytest.mark.slow  # fast-lane budget (VERDICT r3 item 8): compile-heavy;
# sibling fast tests keep this component covered in the fast lane
def test_codec_multistep_matches_sequential(rng):
    """K scanned non-adversarial steps == K sequential per-step calls
    (the relay-amortizing fast path train_codec uses for polish runs)."""
    from task_aware_audio_coding_perceptual_tpu.models.codec import CodecConfig
    from task_aware_audio_coding_perceptual_tpu.train import codec_train
    from task_aware_audio_coding_perceptual_tpu.train.codec_train import CodecLossWeights

    config = CodecConfig(channels=4, latent_dim=8, strides=(2, 4),
                         num_quantizers=2, codebook_size=32)
    tiny_w = CodecLossWeights(mrstft_ffts=(64,), mrstft_hops=(16,),
                              mel_ffts=(64,), mel_hops=(16,), si_sdr=0.5)
    model, state, tx = codec_train.create_train_state(config, jax.random.key(0))
    wavs = jnp.asarray(rng.standard_normal((2, 2, config.hop * 16, 1)).astype(np.float32))

    step = jax.jit(codec_train.make_train_step(model, tx, weights=tiny_w,
                                               use_pallas=False))
    s_seq = state
    for k in range(2):
        s_seq, _ = step(s_seq, wavs[k])

    multi = jax.jit(codec_train.make_train_multistep(model, tx, weights=tiny_w,
                                                     use_pallas=False))
    s_multi, m = multi(state, wavs)
    assert int(s_multi.step) == int(s_seq.step) == 2
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s_multi.params)[0]),
        np.asarray(jax.tree.leaves(s_seq.params)[0]), rtol=2e-5, atol=2e-6)
    assert np.isfinite(float(m["loss"]))


def test_adv_scale_zero_freezes_disc(rng):
    """adv_scale=0 (warmup): disc params don't move, gen still trains."""
    from task_aware_audio_coding_perceptual_tpu.models.codec import CodecConfig
    from task_aware_audio_coding_perceptual_tpu.train import gan_train

    from task_aware_audio_coding_perceptual_tpu.train.codec_train import CodecLossWeights

    config = CodecConfig(channels=4, latent_dim=8, strides=(2, 4),
                         num_quantizers=2, codebook_size=32)
    small = dict(n_ffts=(64,), hop_lengths=(16,), win_lengths=(64,))
    tiny_w = CodecLossWeights(mrstft_ffts=(64,), mrstft_hops=(16,),
                              mel_ffts=(64,), mel_hops=(16,))
    model, disc, state, gtx, dtx = gan_train.create_gan_state(
        config, jax.random.key(0), disc_filters=4, disc_kwargs=small)
    wav = jnp.asarray(rng.standard_normal((2, config.hop * 16, 1)).astype(np.float32))
    step = jax.jit(gan_train.make_gan_train_step(model, disc, gtx, dtx,
                                                 weights=tiny_w, use_pallas=False))
    new_state, _ = step(state, wav, 0.0)
    for a, b in zip(jax.tree.leaves(state.disc_params),
                    jax.tree.leaves(new_state.disc_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree.leaves(state.gen_params),
                             jax.tree.leaves(new_state.gen_params))]
    assert any(moved)


# ---- EnCodec-style LSTM bottleneck (CodecConfig.lstm_layers) --------------

LSTM_CFG = CodecConfig(
    channels=8, latent_dim=16, strides=(2, 4), num_quantizers=4,
    codebook_size=64, lstm_layers=2,
)


@pytest.fixture(scope="module")
def lstm_codec_and_params():
    model = NeuralAudioCodec(LSTM_CFG)
    x = jnp.zeros((1, LSTM_CFG.hop * 4, 1))
    params = model.init(jax.random.key(0), x)
    return model, params


def test_lstm_codec_shapes_and_grads(lstm_codec_and_params):
    model, params = lstm_codec_and_params
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, LSTM_CFG.hop * 4, 1)),
        jnp.float32,
    )
    y = model.apply(params, x)
    assert y.shape == x.shape
    # gradients reach both LSTM stacks (recurrent kernels included)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    lstm_grads = [
        jnp.abs(v).sum() for k, v in flat if "lstm" in jax.tree_util.keystr(k)
    ]
    assert lstm_grads and all(float(v) > 0 for v in lstm_grads)


def test_lstm_streaming_roundtrip_matches_offline(lstm_codec_and_params):
    model, params = lstm_codec_and_params
    rng = np.random.default_rng(5)
    T = LSTM_CFG.hop * 8
    x = jnp.asarray(rng.standard_normal((1, T, 1)).astype(np.float32))
    state = rvq_lib.init_rvq(
        jax.random.key(2), LSTM_CFG.num_quantizers, LSTM_CFG.codebook_size,
        LSTM_CFG.latent_dim,
    )
    z = model.apply(params, x, method=NeuralAudioCodec.encode)
    q = rvq_lib.quantize(state, z, use_pallas=False)
    y_off = model.apply(params, q.quantized, method=NeuralAudioCodec.decode)
    y_str, codes = streaming.streaming_roundtrip(
        model, params, state, x, chunk=LSTM_CFG.hop * 2, use_pallas=False
    )
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(q.codes))
    np.testing.assert_allclose(
        np.asarray(y_str), np.asarray(y_off), rtol=1e-4, atol=1e-5
    )


def test_lstm_codec_causality(lstm_codec_and_params):
    model, params = lstm_codec_and_params
    rng = np.random.default_rng(6)
    T = LSTM_CFG.hop * 8
    x1 = rng.standard_normal((1, T, 1)).astype(np.float32)
    x2 = x1.copy()
    x2[:, T // 2 :] += 1.0
    z1 = model.apply(params, jnp.asarray(x1), method=NeuralAudioCodec.encode)
    z2 = model.apply(params, jnp.asarray(x2), method=NeuralAudioCodec.encode)
    n_safe = (T // 2) // LSTM_CFG.hop - 1  # frames fully before the change
    np.testing.assert_allclose(
        np.asarray(z1[:, :n_safe]), np.asarray(z2[:, :n_safe]), atol=1e-5
    )


# ---- scan-free temporal module (CodecConfig.bottleneck_blocks) ------------

BNECK_CFG = CodecConfig(
    channels=8, latent_dim=16, strides=(2, 4), num_quantizers=4,
    codebook_size=64, bottleneck_blocks=1,
)


def test_bottleneck_blocks_streaming_matches_offline():
    model = NeuralAudioCodec(BNECK_CFG)
    x0 = jnp.zeros((1, BNECK_CFG.hop * 4, 1))
    params = model.init(jax.random.key(0), x0)
    rng = np.random.default_rng(5)
    T = BNECK_CFG.hop * 8
    x = jnp.asarray(rng.standard_normal((1, T, 1)).astype(np.float32))
    state = rvq_lib.init_rvq(
        jax.random.key(2), BNECK_CFG.num_quantizers, BNECK_CFG.codebook_size,
        BNECK_CFG.latent_dim,
    )
    z = model.apply(params, x, method=NeuralAudioCodec.encode)
    q = rvq_lib.quantize(state, z, use_pallas=False)
    y_off = model.apply(params, q.quantized, method=NeuralAudioCodec.decode)
    y_str, codes = streaming.streaming_roundtrip(
        model, params, state, x, chunk=BNECK_CFG.hop * 2, use_pallas=False
    )
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(q.codes))
    np.testing.assert_allclose(
        np.asarray(y_str), np.asarray(y_off), rtol=1e-4, atol=1e-5
    )
    # gradients reach the bottleneck stacks
    g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    bn = [jnp.abs(v).sum() for k, v in flat
          if "bneck" in jax.tree_util.keystr(k)]
    assert bn and all(float(v) > 0 for v in bn)
