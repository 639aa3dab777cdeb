"""Multi-device convergence soak (VERDICT r3 item 10): beyond the 1-step
DP-equivalence tests, train for tens of steps on the virtual 8-device CPU
mesh and check the loss curve tracks the single-device curve.

Bitwise equality cannot hold over many steps (sharded reductions reorder
float sums), so the criteria are trend-level: every loss finite, the final
sharded loss within a tolerance band of the single-device final loss, and
both curves decreasing from their start.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from task_aware_audio_coding_perceptual_tpu.models.codec import CodecConfig
from task_aware_audio_coding_perceptual_tpu.parallel import make_mesh
from task_aware_audio_coding_perceptual_tpu.train import codec_train

TINY = CodecConfig(channels=4, latent_dim=8, strides=(2, 2), num_quantizers=2,
                   codebook_size=16)
TINY_W = codec_train.CodecLossWeights(mrstft_ffts=(64,), mrstft_hops=(16,),
                                      mel_ffts=(64,), mel_hops=(16,))


def _run_codec(sharded, n_steps=60):
    rng = np.random.default_rng(0)
    model, state, tx = codec_train.create_train_state(TINY, jax.random.key(0))
    step = jax.jit(codec_train.make_train_step(model, tx, weights=TINY_W,
                                               use_pallas=False))
    mesh = make_mesh(8, tp=1) if sharded else None
    if mesh is not None:
        state = jax.device_put(state, NamedSharding(mesh, P()))
    losses = []
    for i in range(n_steps):
        wav = jnp.asarray(
            rng.standard_normal((8, TINY.hop * 16, 1)).astype(np.float32))
        if mesh is not None:
            with jax.set_mesh(mesh):
                wav = jax.device_put(wav, NamedSharding(mesh, P("dp")))
                state, m = step(state, wav)
        else:
            state, m = step(state, wav)
        losses.append(float(m["loss"]))
    return np.asarray(losses)


@pytest.mark.slow
def test_codec_dp_soak_tracks_single_device():
    single = _run_codec(sharded=False)
    sharded = _run_codec(sharded=True)
    assert np.isfinite(single).all() and np.isfinite(sharded).all()
    # both decreased materially from the first step
    assert single[-5:].mean() < single[0] * 0.9
    assert sharded[-5:].mean() < sharded[0] * 0.9
    # curves track: same data order, same init -> small relative drift
    rel = abs(sharded[-5:].mean() - single[-5:].mean()) / abs(single[-5:].mean())
    assert rel < 0.05, f"dp curve diverged from single-device: {rel:.3f}"


@pytest.mark.slow
def test_sgmse_dp_soak_tracks_single_device():
    from task_aware_audio_coding_perceptual_tpu.models.sgmse.score_model import (
        ScoreModel,
        ScoreModelConfig,
    )

    cfg = ScoreModelConfig(
        backbone="ncsnpp",
        backbone_kwargs=(("nf", 8), ("ch_mult", (1, 2)), ("num_res_blocks", 1),
                         ("attn_resolutions", ())),
    )
    model = ScoreModel(cfg)
    step = jax.jit(model.make_train_step())

    def run(sharded, n_steps=50):
        rng = np.random.default_rng(0)
        state = model.init(jax.random.key(0), spec_shape=(1, 1, 16, 16))
        mesh = make_mesh(8, tp=1) if sharded else None
        if mesh is not None:
            state = jax.device_put(state, NamedSharding(mesh, P()))
        key = jax.random.key(7)
        losses = []
        for i in range(n_steps):
            x = jnp.asarray(
                rng.standard_normal((8, 1, 16, 16, 2)).astype(np.float32) * 0.1)
            y = x + 0.03 * jnp.asarray(
                rng.standard_normal((8, 1, 16, 16, 2)).astype(np.float32))
            key, sub = jax.random.split(key)
            if mesh is not None:
                with jax.set_mesh(mesh):
                    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
                    ys = jax.device_put(y, NamedSharding(mesh, P("dp")))
                    state, m = step(state, sub, xs, ys)
            else:
                state, m = step(state, sub, x, y)
            losses.append(float(m["train_loss"]))
        return np.asarray(losses)

    single = run(False)
    sharded = run(True)
    assert np.isfinite(single).all() and np.isfinite(sharded).all()
    # same PRNG stream + same data -> curves must stay close throughout
    np.testing.assert_allclose(sharded[-10:], single[-10:], rtol=0.05, atol=0.02)


@pytest.mark.slow
def test_task_aware_step_runs_dp_sharded():
    """The task-gradient spectral step executes dp-sharded (VERDICT r3
    item 10: 'the task-aware step runs dp-sharded too')."""
    import optax

    from task_aware_audio_coding_perceptual_tpu.models import task_aware
    from task_aware_audio_coding_perceptual_tpu.train import spectral_train

    cfg = spectral_train.SpectralTrainConfig(
        model="SpectralResE2D1", batch_size=8, z_dim=16,
        total_features_after=8, freq_dim=1025, time_dim=8, n_res_blocks=1,
    )
    model = spectral_train.build_model(cfg)
    asr_apply, _ = task_aware.make_asr_head(seed=1, example_len=2048)
    tl = task_aware.TaskAwareFeatureLoss(asr_apply, detached=False)

    tx = optax.adam(1e-4)
    step = jax.jit(spectral_train.make_spectral_train_step(
        model, cfg, tx, task_loss_fn=tl, task_weight=1.0))

    rng = np.random.default_rng(0)

    def obs():
        return {
            "magnitude": jnp.asarray(
                np.abs(rng.standard_normal((8, 1025, 8))).astype(np.float32)),
            "phase": jnp.asarray(
                rng.standard_normal((8, 1025, 8)).astype(np.float32)),
        }

    o1, o2, clean = obs(), obs(), obs()
    variables = model.init(
        {"params": jax.random.key(0), "bottleneck": jax.random.key(1)},
        o1, o2,
    )
    state = spectral_train.SpectralTrainState(
        variables=variables, opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    mesh = make_mesh(8, tp=1)
    with jax.set_mesh(mesh):
        state = jax.device_put(state, NamedSharding(mesh, P()))
        shard = lambda t: jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P("dp"))), t)
        o1s, o2s, cleans = shard(o1), shard(o2), shard(clean)
        for i in range(3):
            state, metrics, _ = step(state, (o1s, o2s, cleans),
                                     jax.random.key(2 + i), cleans)
    assert np.isfinite(float(metrics["loss"]))
    assert "task_mse" in metrics
