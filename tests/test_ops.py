"""Parity + gradient tests for the Pallas/XLA op layer.

``upfirdn2d_ref`` is the algorithmic spec (same role as the reference's CPU
fallback ``op/upfirdn2d.py:162-203``); the fused XLA path and the Pallas
kernel must match it bit-for-bit-ish, and the custom VJP must match plain
autodiff of the reference implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu.ops import upfirdn2d as ufd
from task_aware_audio_coding_perceptual_tpu.ops import fused_bias_act as fba


CASES = [
    # (up, down, pad) as used by NCSN++ FIR resampling with k=[1,3,3,1]
    dict(up=2, down=1, pad=(2, 1)),  # upsample_2d: p=k-2 -> ((p+1)//2+1, p//2)
    dict(up=1, down=2, pad=(1, 1)),  # downsample_2d
    dict(up=1, down=1, pad=(2, 1)),  # plain FIR
    dict(up=2, down=1, pad=(1, 1)),
]
K1D = [1.0, 3.0, 3.0, 1.0]


def _mk_kernel():
    return jnp.asarray(ufd.setup_kernel(K1D))


@pytest.mark.parametrize("case", CASES)
def test_xla_matches_ref(case, rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 12, 10)).astype(np.float32))
    k = _mk_kernel()
    up, down, pad = case["up"], case["down"], case["pad"]
    ref = ufd.upfirdn2d_ref(x, k, (up, up), (down, down), (pad[0], pad[1], pad[0], pad[1]))
    got = ufd.upfirdn2d(x, k, up=up, down=down, pad=pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("case", CASES)
def test_pallas_matches_ref(case, rng):
    x = jnp.asarray(rng.standard_normal((1, 2, 12, 10)).astype(np.float32))
    k = _mk_kernel()
    up, down, pad = case["up"], case["down"], case["pad"]
    ref = ufd.upfirdn2d_ref(x, k, (up, up), (down, down), (pad[0], pad[1], pad[0], pad[1]))
    got = ufd.upfirdn2d_pallas(x, K1D, up=up, down=down, pad=pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_identity_kernel(rng):
    x = jnp.asarray(rng.standard_normal((1, 1, 6, 6)).astype(np.float32))
    k = jnp.ones((1, 1), dtype=jnp.float32)
    out = ufd.upfirdn2d(x, k, up=1, down=1, pad=(0, 0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_upsample_shape(rng):
    # upsample_2d semantics: factor-2 output (reference up_or_down_sampling.py:195-224)
    x = jnp.asarray(rng.standard_normal((2, 4, 16, 16)).astype(np.float32))
    k = ufd.setup_kernel(K1D) * 4  # gain * factor**2
    p = k.shape[0] - 2
    out = ufd.upfirdn2d(x, jnp.asarray(k), up=2, pad=((p + 1) // 2 + 1, p // 2))
    assert out.shape == (2, 4, 32, 32)
    xd = ufd.upfirdn2d(out, jnp.asarray(ufd.setup_kernel(K1D)), down=2, pad=((p + 1) // 2, p // 2))
    assert xd.shape == (2, 4, 16, 16)


@pytest.mark.parametrize("case", CASES[:2])
def test_custom_vjp_matches_autodiff_of_ref(case, rng):
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 8)).astype(np.float32))
    k = _mk_kernel()
    up, down, pad = case["up"], case["down"], case["pad"]

    def f_custom(x):
        return jnp.sum(jnp.sin(ufd.upfirdn2d(x, k, up=up, down=down, pad=pad)))

    def f_ref(x):
        return jnp.sum(
            jnp.sin(
                ufd.upfirdn2d_ref(x, k, (up, up), (down, down), (pad[0], pad[1], pad[0], pad[1]))
            )
        )

    g_custom = jax.grad(f_custom)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_double_backward(rng):
    x = jnp.asarray(rng.standard_normal((1, 1, 8, 8)).astype(np.float32))
    k = _mk_kernel()

    def f(x):
        return jnp.sum(ufd.upfirdn2d(x, k, up=2, down=1, pad=(2, 1)) ** 3)

    def f_ref(x):
        return jnp.sum(ufd.upfirdn2d_ref(x, k, (2, 2), (1, 1), (2, 1, 2, 1)) ** 3)

    h = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
    h_ref = jax.grad(lambda x: jnp.sum(jax.grad(f_ref)(x) ** 2))(x)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# fused_bias_act
# ---------------------------------------------------------------------------


def test_fused_leaky_relu_forward(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 4, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(5).astype(np.float32))
    got = fba.fused_leaky_relu(x, b)
    v = np.asarray(x) + np.asarray(b).reshape(1, 5, 1, 1)
    want = np.where(v > 0, v, v * 0.2) * np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_fused_leaky_relu_grads_match_autodiff(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(3).astype(np.float32))

    def plain(x, b):
        v = x + b.reshape(1, 3, 1, 1)
        return jnp.sum(jnp.tanh(jnp.where(v > 0, v, 0.2 * v) * np.sqrt(2.0)))

    def fused(x, b):
        return jnp.sum(jnp.tanh(fba.fused_leaky_relu(x, b)))

    gx1, gb1 = jax.grad(plain, argnums=(0, 1))(x, b)
    gx2, gb2 = jax.grad(fused, argnums=(0, 1))(x, b)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb2), np.asarray(gb1), rtol=1e-5, atol=1e-6)


def test_fused_leaky_relu_double_backward(rng):
    x = jnp.asarray(rng.standard_normal((1, 3, 4, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(3).astype(np.float32))

    def plain(x):
        v = x + b.reshape(1, 3, 1, 1)
        return jnp.sum(jnp.where(v > 0, v, 0.2 * v) ** 2)

    def fused(x):
        return jnp.sum(fba.fused_leaky_relu(x, b, scale=1.0) ** 2)

    h1 = jax.grad(lambda x: jnp.sum(jax.grad(plain)(x) ** 2))(x)
    h2 = jax.grad(lambda x: jnp.sum(jax.grad(fused)(x) ** 2))(x)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), rtol=1e-5, atol=1e-5)


def test_fused_leaky_relu_pallas_matches(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(4).astype(np.float32))
    ref = fba.fused_leaky_relu(x, b)
    got = fba.fused_leaky_relu_pallas(x, b, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_grad_mode_table():
    x = jnp.asarray(np.array([[-1.0, 2.0]], dtype=np.float32))
    ref = jnp.asarray(np.array([[1.0, -3.0]], dtype=np.float32))
    # mode 30: lrelu fwd
    np.testing.assert_allclose(
        np.asarray(fba.fused_bias_act(x, act=3, grad=0, scale=1.0)), [[-0.2, 2.0]]
    )
    # mode 31: grad masked by refer sign
    np.testing.assert_allclose(
        np.asarray(fba.fused_bias_act(x, refer=ref, act=3, grad=1, scale=1.0)),
        [[-1.0, 0.4]],
    )
    # mode 32: zero
    np.testing.assert_allclose(
        np.asarray(fba.fused_bias_act(x, refer=ref, act=3, grad=2, scale=1.0)), [[0.0, 0.0]]
    )
    # act=1 linear passthrough
    np.testing.assert_allclose(
        np.asarray(fba.fused_bias_act(x, act=1, grad=0, scale=2.0)), [[-2.0, 4.0]]
    )
