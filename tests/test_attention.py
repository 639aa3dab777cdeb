"""Pallas flash-attention parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu.ops.attention import (
    attention_ref,
    flash_attention,
)


@pytest.mark.parametrize("n,d", [(64, 32), (256, 64), (100, 16), (33, 8)])
def test_flash_matches_ref(n, d, rng):
    q = jnp.asarray(rng.standard_normal((2, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, n, d)).astype(np.float32))
    ref = attention_ref(q, k, v)
    got = flash_attention(q, k, v, block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_flash_in_attn_block(rng):
    from task_aware_audio_coding_perceptual_tpu.models.sgmse.layerspp import AttnBlockpp

    x = jnp.asarray(rng.standard_normal((1, 16, 20, 32)).astype(np.float32))
    blk_ref = AttnBlockpp(channels=32, skip_rescale=True, use_flash=False)
    blk_fla = AttnBlockpp(channels=32, skip_rescale=True, use_flash=True)
    v1 = blk_ref.init(jax.random.key(0), x)
    out_ref = blk_ref.apply(v1, x)
    out_fla = blk_fla.apply(v1, x)  # same params
    np.testing.assert_allclose(np.asarray(out_fla), np.asarray(out_ref), rtol=2e-4, atol=2e-5)


def test_flash_softmax_extremes(rng):
    # large score magnitudes: online softmax must stay stable
    q = 30.0 * jnp.asarray(rng.standard_normal((1, 64, 16)).astype(np.float32))
    k = 30.0 * jnp.asarray(rng.standard_normal((1, 64, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 64, 16)).astype(np.float32))
    ref = attention_ref(q, k, v)
    got = flash_attention(q, k, v, block_q=16, block_k=16)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-4)
