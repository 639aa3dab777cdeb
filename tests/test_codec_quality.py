"""Codec quality regression: the committed trained artifact must hit a
held-out SI-SDR floor.

The reference ships trained-model result CSVs as its quality record
(BASELINE.md); this is the equivalent for the TPU codec: a GAN-trained
checkpoint (``scripts/export_codec_ckpt.py`` from ``cli/train_codec.py``
training on the seeded synthetic speech corpus) evaluated on utterances the
training run never saw. A regression in the codec forward path, RVQ lookup,
or weight handling breaks this test even though it loads no trainer code.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ARTIFACT = os.path.join(
    os.path.dirname(__file__), "golden", "codec_8q_params.npz"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(ARTIFACT), reason="trained codec artifact not committed"
)


def _load():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from export_codec_ckpt import load_artifact

    from task_aware_audio_coding_perceptual_tpu.models import rvq as rvq_lib
    from task_aware_audio_coding_perceptual_tpu.models.codec import (
        CodecConfig,
        NeuralAudioCodec,
    )

    params_tree, codebooks = load_artifact(ARTIFACT)
    z = np.load(ARTIFACT)
    channels = (
        int(z["config_channels"]) if "config_channels" in z.files
        else CodecConfig().channels
    )
    cfg = CodecConfig(channels=channels)
    model = NeuralAudioCodec(cfg)
    params = jax.tree.map(jnp.asarray, {"params": params_tree["params"]})
    cb = jnp.asarray(codebooks)
    rvq_state = rvq_lib.RvqState(
        codebooks=cb,
        ema_count=jnp.ones(cb.shape[:2]),
        ema_sum=cb * 1.0,
    )
    return cfg, model, params, rvq_state


def test_trained_codec_heldout_si_sdr():
    """Full encode -> 8-quantizer RVQ -> decode on unseen utterances stays
    above the committed quality floor."""
    from task_aware_audio_coding_perceptual_tpu.data import speech_synth
    from task_aware_audio_coding_perceptual_tpu.metrics.sdr import si_sdr_jax
    from task_aware_audio_coding_perceptual_tpu.models import rvq as rvq_lib
    from task_aware_audio_coding_perceptual_tpu.models.codec import NeuralAudioCodec

    cfg, model, params, rvq_state = _load()
    T = 16000 - (16000 % cfg.hop)
    # seeds far outside the training corpus (generate_corpus uses
    # seed*1_000_003 + i with seed=0, i<2000)
    wav = np.stack(
        [
            speech_synth.synthesize_utterance(
                np.random.default_rng(10_000_019 + i), duration=1.0
            )[:T]
            for i in range(4)
        ]
    )[..., None].astype(np.float32)

    # params/rvq_state must be jit ARGUMENTS: closure-captured they become
    # 84 MB of XLA constants and constant-folding dominates compile (~58 s
    # on the 1-core test box; ~5 s as arguments, identical scores)
    @jax.jit
    def roundtrip(params, rvq_state, w):
        z = model.apply(params, w, method=NeuralAudioCodec.encode)
        q = rvq_lib.quantize(rvq_state, z, use_pallas=False)
        y = model.apply(params, q.quantized, method=NeuralAudioCodec.decode)
        return si_sdr_jax(w[..., 0], y[..., 0])

    scores = np.asarray(roundtrip(params, rvq_state, jnp.asarray(wav)))
    assert np.isfinite(scores).all()
    # the committed ch48 artifact (r4: 30k base + low-lr polish + two
    # w_si_sdr=3.0 continuation phases to 72k steps on the 6000-utterance
    # corpus, results/warmstart/codec_ch48_p4_72k.npz) measured
    # [6.77, 4.75, 7.42, 8.62] dB (mean +6.89) on these exact seeds; the
    # floor leaves margin for cross-backend numeric drift, not quality drift
    assert scores.mean() > 5.5, scores
    assert scores.min() > 3.8, scores
