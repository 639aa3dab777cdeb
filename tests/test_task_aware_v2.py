"""Gradient reach for the v2 (enhancement-head) task-aware composition.

The reference's flagship trainer adds an enhancement-head task term to the
objective but detaches it (``train_pkl_file_task_aware_update.py:284,312``);
our composition must instead let gradients flow from the task loss through
the frozen diffusion sampler and the ISTFT back into the autoencoder side
(VERDICT r3 item 2 done-criterion: "a grad-reach test through the enhancer").
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu.models import task_aware
from task_aware_audio_coding_perceptual_tpu.models.msstftd import (
    MultiScaleSTFTDiscriminator,
)
from task_aware_audio_coding_perceptual_tpu.models.sgmse.score_model import (
    ScoreModel,
    ScoreModelConfig,
    SpecTransforms,
)
from task_aware_audio_coding_perceptual_tpu.train.sgmse_train import make_enhance_fn

TINY = dict(nf=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,))


@pytest.fixture(scope="module")
def tiny_enhancer():
    config = ScoreModelConfig(
        backbone="ncsnpp",
        sde="ouve",
        backbone_kwargs=tuple(TINY.items()),
        sde_kwargs=(("N", 2),),
    )
    model = ScoreModel(config, SpecTransforms(n_fft=62, hop_length=16, num_frames=32))
    state = model.init(jax.random.key(0), spec_shape=(1, 1, 32, 32))
    return model, state


@pytest.mark.slow
def test_task_gradient_reaches_through_enhancer(tiny_enhancer):
    """Slow-marked: differentiates through a 2-step sampler (~85 s CPU)."""
    model, state = tiny_enhancer
    enhance_fn = make_enhance_fn(model, state.ema_params, N=2, corrector="none")

    disc = MultiScaleSTFTDiscriminator(filters=4)
    disc_params = disc.init(jax.random.key(1), jnp.zeros((1, 1, 4096), jnp.float32))
    tl = task_aware.TaskAwareEnhancementLoss(
        enhance_fn, disc, jax.lax.stop_gradient(disc_params), detached=False)

    rng = np.random.default_rng(0)
    base = jnp.asarray(np.abs(rng.standard_normal((1, 2, 1025, 8))), jnp.float32)
    clean = {
        "magnitude": jnp.asarray(np.abs(rng.standard_normal((1, 1025, 8))), jnp.float32),
        "phase": jnp.asarray(rng.standard_normal((1, 1025, 8)), jnp.float32),
    }

    @jax.jit
    def loss_of_scale(w):
        mse, disc_loss = tl(base * w, clean)
        return mse + disc_loss

    g = jax.grad(loss_of_scale)(jnp.asarray(1.0))
    assert np.isfinite(float(g))
    assert abs(float(g)) > 0.0, "no gradient flows through the enhancement head"

    # detached mode really detaches (reference-parity behavior)
    tl_det = task_aware.TaskAwareEnhancementLoss(
        enhance_fn, disc, jax.lax.stop_gradient(disc_params), detached=True)

    @jax.jit
    def loss_det(w):
        mse, disc_loss = tl_det(base * w, clean)
        return mse + disc_loss

    g0 = jax.grad(loss_det)(jnp.asarray(1.0))
    assert float(g0) == 0.0
