"""Tests for compat/legacy modules: normalization zoo, legacy score-SDE
utils, ResNet18 encoder, enhance_audio API."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu.models.resnet18_encoder import ResNetEncoder
from task_aware_audio_coding_perceptual_tpu.models.sgmse import legacy, normalization


def test_get_sigmas():
    s = legacy.get_sigmas(0.01, 50.0, 10)
    assert s[0] == pytest.approx(50.0) and s[-1] == pytest.approx(0.01)
    assert np.all(np.diff(s) < 0)


def test_ddpm_params():
    p = legacy.get_ddpm_params(num_steps=100)
    assert p["alphas_cumprod"].shape == (100,)
    assert np.all(np.diff(p["alphas_cumprod"]) < 0)
    np.testing.assert_allclose(
        p["sqrt_alphas_cumprod"] ** 2 + p["sqrt_1m_alphas_cumprod"] ** 2, 1.0, atol=1e-5
    )


@pytest.mark.parametrize(
    "name,conditional",
    [("InstanceNorm", False), ("InstanceNorm++", False), ("VarianceNorm", False),
     ("GroupNorm", False), ("InstanceNorm", True), ("InstanceNorm++", True),
     ("VarianceNorm", True)],
)
def test_normalization_zoo(name, conditional, rng):
    cls = normalization.get_normalization(name, conditional)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    if conditional:
        mod = cls(16, num_classes=4)
        y = jnp.asarray([0, 2])
        v = mod.init(jax.random.key(0), x, y)
        out = mod.apply(v, x, y)
    else:
        mod = cls(16) if name != "GroupNorm" else cls(16)
        v = mod.init(jax.random.key(0), x)
        out = mod.apply(v, x)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_refine_blocks(rng):
    x1 = jnp.asarray(rng.standard_normal((1, 16, 16, 8)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
    block = legacy.RefineBlock(features=8)
    v = block.init(jax.random.key(0), [x1, x2], (16, 16))
    out = block.apply(v, [x1, x2], (16, 16))
    assert out.shape == (1, 16, 16, 8)


def test_resnet18_encoder(rng):
    enc = ResNetEncoder(input_channels=2, output_size=32)
    x = jnp.asarray(rng.standard_normal((2, 2, 64, 64)).astype(np.float32))
    v = enc.init(jax.random.key(0), x)
    z, aux = enc.apply(v, x)
    assert z.shape == (2, 32) and aux is None


@pytest.mark.slow  # fast-lane budget (VERDICT r3 item 8): compile-heavy;
# sibling fast tests keep this component covered in the fast lane
def test_enhance_audio_api(rng):
    from task_aware_audio_coding_perceptual_tpu.models.sgmse.enhance_api import (
        enhance_audio,
        enhance_audio_batch,
    )
    from task_aware_audio_coding_perceptual_tpu.models.sgmse.score_model import (
        ScoreModel,
        ScoreModelConfig,
        SpecTransforms,
    )

    cfg = ScoreModelConfig(
        backbone="ncsnpp", sde="ouve",
        backbone_kwargs=(("nf", 8), ("ch_mult", (1, 2)), ("num_res_blocks", 1), ("attn_resolutions", ())),
        sde_kwargs=(("N", 2),),
    )
    model = ScoreModel(cfg, SpecTransforms(n_fft=62, hop_length=16, num_frames=32))
    state = model.init(jax.random.key(0), spec_shape=(1, 1, 32, 32))
    y = rng.standard_normal(3000).astype(np.float32)
    out = enhance_audio(model, state.ema_params, y, sr=8000, N=2)
    assert out.shape == (3000,) and np.isfinite(out).all()
    outs = enhance_audio_batch(model, state.ema_params, np.stack([y, y]), sr=8000, N=2)
    assert outs.shape == (2, 3000)


def test_tacp_alias():
    import tacp

    assert hasattr(tacp, "Registry")
    from tacp import dsp  # submodule access through the alias

    assert hasattr(dsp, "stft")
