"""Tests for the spectral/image model zoos and bottlenecks (SURVEY §2.1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu.models import bottlenecks
from task_aware_audio_coding_perceptual_tpu.models import image_ae
from task_aware_audio_coding_perceptual_tpu.models import spectral
from task_aware_audio_coding_perceptual_tpu.models.resnet_ae import ResDecoder, ResEncoder

F_DIM, T_DIM = 65, 40  # scaled-down (1025, 600)


def _obs(rng, batch=2):
    return {
        "magnitude": jnp.asarray(np.abs(rng.standard_normal((batch, F_DIM, T_DIM))), jnp.float32),
        "phase": jnp.asarray(rng.standard_normal((batch, F_DIM, T_DIM)), jnp.float32),
    }


def _init_and_run(model, *args, **kwargs):
    rngs = {"params": jax.random.key(0), "bottleneck": jax.random.key(1)}
    variables = model.init(rngs, *args, **kwargs)
    out = model.apply(
        variables, *args, rngs={"bottleneck": jax.random.key(2)}, **kwargs
    )
    return variables, out


def test_spectral_e2d1(rng):
    model = spectral.SpectralResE2D1(
        z_dim1=32, z_dim2=32, total_features_after=32, freq_dim=F_DIM, time_dim=T_DIM
    )
    o1, o2 = _obs(rng), _obs(rng)
    _, out = _init_and_run(model, o1, o2)
    assert out.obs_dec.shape == (2, 2, F_DIM, T_DIM)
    assert out.dimension_info["after_z1"] == 16  # 2 * total/4
    for v in (out.total_mse, out.nuc_loss, out.cos_loss, out.total_spec_snr):
        assert np.isfinite(float(v))
    assert model.get_model_name() == "SpectralResE2D1_32"


def test_spectral_e1d1_top_variance(rng):
    model = spectral.SpectralResE1D1(
        z_dim=64, total_features_after=16, freq_dim=F_DIM, time_dim=T_DIM
    )
    o = _obs(rng, batch=3)
    _, out = _init_and_run(model, o)
    assert out.obs_dec.shape == (3, 2, F_DIM, T_DIM)
    assert out.dimension_info["after_z2"] == 16


def test_spectral_e2d2(rng):
    model = spectral.SpectralResE2D2(
        z_dim1=32, z_dim2=32, total_features_after=32, freq_dim=F_DIM, time_dim=T_DIM
    )
    _, out = _init_and_run(model, _obs(rng), _obs(rng))
    assert out.obs_dec.shape == (2, 2, F_DIM, T_DIM)
    assert np.isfinite(float(out.cross_recon_loss))


def test_spectral_e4d1_mosaic(rng):
    model = spectral.SpectralResE4D1(
        z_dim1=16, z_dim2=16, z_dim3=16, z_dim4=16,
        total_features_after=32, freq_dim=F_DIM, time_dim=T_DIM,
    )
    obs = [_obs(rng) for _ in range(4)]
    _, out = _init_and_run(model, *obs)
    # 2x2 mosaic target: doubled freq and time
    assert out.obs_dec.shape == (2, 2, 2 * F_DIM, 2 * T_DIM)


def test_batchnorm_train_mode_updates_stats(rng):
    model = spectral.SpectralResE1D1(
        z_dim=32, total_features_after=16, freq_dim=F_DIM, time_dim=T_DIM
    )
    o = _obs(rng)
    rngs = {"params": jax.random.key(0), "bottleneck": jax.random.key(1)}
    variables = model.init(rngs, o, train=True)
    out, mutated = model.apply(
        variables, o, train=True,
        rngs={"bottleneck": jax.random.key(2)}, mutable=["batch_stats"],
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


# ---------------------------------------------------------------------------
# bottlenecks
# ---------------------------------------------------------------------------


def test_private_shared_mix_two(rng):
    z1 = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    z2 = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    samples, info = bottlenecks.private_shared_mix([z1, z2], jax.random.key(0), 32, True)
    assert samples[0].shape == (4, 16)
    # shared part equal across encoders after mixing
    np.testing.assert_allclose(
        np.asarray(samples[0][:, 8:]), np.asarray(samples[1][:, 8:]), rtol=1e-6
    )
    # private parts untouched
    np.testing.assert_allclose(np.asarray(samples[0][:, :8]), np.asarray(z1[:, :8]))
    # non-random: shares stay distinct
    s2, _ = bottlenecks.private_shared_mix([z1, z2], None, 32, False)
    assert not np.allclose(np.asarray(s2[0][:, 8:]), np.asarray(s2[1][:, 8:]))


def test_top_variance_select(rng):
    z = np.asarray(rng.standard_normal((16, 10)), np.float32)
    z[:, 3] *= 10.0
    z[:, 7] *= 5.0
    sel, idx = bottlenecks.top_variance_select(jnp.asarray(z), 2)
    assert set(np.asarray(idx).tolist()) == {3, 7}
    assert sel.shape == (16, 2)


def test_apply_pca_full_rank_is_identity(rng):
    z = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    recon = bottlenecks.apply_pca(z, 8)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(z), atol=1e-4)


def test_dpca_bottleneck_matches_gather_reference(rng):
    """Masked-projection DPCA == the reference's dynamic index-gather DPCA."""
    z1 = np.asarray(rng.standard_normal((32, 12)), np.float32)
    z2 = np.asarray(rng.standard_normal((32, 12)), np.float32)
    dim_p = 10

    # numpy mirror of pkl_file_model_updated.py:486-511
    def np_pca(z):
        mu = z.mean(0)
        u, s, vt = np.linalg.svd(z - mu, full_matrices=False)
        return s, vt.T, mu

    s1, v1, mu1 = np_pca(z1)
    s2, v2, mu2 = np_pca(z2)
    all_s = np.concatenate([s1, s2])
    ind = np.argsort(-all_s, kind="stable")[:dim_p]
    ind1 = ind[ind < len(s1)]
    ind2 = ind[ind >= len(s1)] - len(s1)
    z1_ref = (z1 - mu1) @ v1[:, ind1] @ v1[:, ind1].T + mu1
    z2_ref = (z2 - mu2) @ v2[:, ind2] @ v2[:, ind2].T + mu2

    outs, info = bottlenecks.dpca_bottleneck([jnp.asarray(z1), jnp.asarray(z2)], dim_p)
    np.testing.assert_allclose(np.asarray(outs[0]), z1_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(outs[1]), z2_ref, atol=2e-3)
    assert int(info["after_z1"]) == len(ind1)
    assert int(info["after_z2"]) == len(ind2)


def test_dpca_traced_dim_p(rng):
    z1 = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    z2 = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))

    @jax.jit
    def f(key):
        dim_p = bottlenecks.random_dim_p(key, 16)
        outs, _ = bottlenecks.dpca_bottleneck([z1, z2], dim_p)
        return outs[0]

    out = f(jax.random.key(0))
    assert out.shape == (16, 8) and np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# resnet_ae / image_ae
# ---------------------------------------------------------------------------


def test_res_encoder_decoder_shapes(rng):
    enc = ResEncoder((3, 64, 64), 32)
    dec = ResDecoder((3, 64, 64), 32)
    x = jnp.asarray(rng.standard_normal((2, 3, 64, 64)).astype(np.float32))
    ep = enc.init(jax.random.key(0), x)
    z, _ = enc.apply(ep, x)
    assert z.shape == (2, 32)
    dp = dec.init(jax.random.key(1), z)
    y = dec.apply(dp, z)
    assert y.shape == (2, 3, 64, 64)


def test_image_e2d1(rng):
    model = image_ae.E2D1((3, 64, 64), (3, 64, 64), 16, 16)
    o1 = jnp.asarray(rng.standard_normal((2, 3, 64, 64)).astype(np.float32))
    o2 = jnp.asarray(rng.standard_normal((2, 3, 64, 64)).astype(np.float32))
    rngs = {"params": jax.random.key(0), "bottleneck": jax.random.key(1)}
    variables = model.init(rngs, o1, o2)
    out = model.apply(variables, o1, o2, True, rngs={"bottleneck": jax.random.key(2)})
    assert out.obs_dec.shape == (2, 6, 64, 64)
    assert np.isfinite(float(out.mse))


def test_image_rese4d1_mosaic(rng):
    shape = (3, 32, 32)
    model = image_ae.ResE4D1(shape, shape, shape, shape, 8, 8, 8, 8)
    obs = [jnp.asarray(rng.standard_normal((2, 3, 32, 32)).astype(np.float32)) for _ in range(4)]
    rngs = {"params": jax.random.key(0), "bottleneck": jax.random.key(1)}
    variables = model.init(rngs, *obs)
    out = model.apply(variables, *obs, True, rngs={"bottleneck": jax.random.key(2)})
    assert out.obs_dec.shape == (2, 3, 64, 64)
    assert model.get_model_name() == "SpectralResE4D1_32"


def test_image_rese2d2(rng):
    model = image_ae.ResE2D2((3, 32, 32), (3, 32, 32), 8, 8)
    o1 = jnp.asarray(rng.standard_normal((2, 3, 32, 32)).astype(np.float32))
    o2 = jnp.asarray(rng.standard_normal((2, 3, 32, 32)).astype(np.float32))
    variables = model.init(jax.random.key(0), o1, o2)
    out = model.apply(variables, o1, o2)
    assert out.obs_dec.shape == (2, 6, 32, 32)


def test_concatenate_jae_freezes_base(rng):
    base = image_ae.E1D1((3, 32, 32), 16)
    o = jnp.asarray(rng.standard_normal((2, 3, 32, 32)).astype(np.float32))
    base_vars = base.init(jax.random.key(0), o)

    def base_enc(obs):
        return base.apply(base_vars, obs, method=lambda m, o: m.enc(o))

    def base_dec(z):
        return base.apply(base_vars, z, method=lambda m, z: m.dec(z))

    wrapper = image_ae.ConcatenateJAE(base_enc, base_dec, z_dim=8, orig_dim=16)
    wv = wrapper.init(jax.random.key(1), o)
    out = wrapper.apply(wv, o)
    assert out.obs_dec.shape == (2, 3, 32, 32)

    # gradients flow only into adapter params
    def loss(wv):
        return wrapper.apply(wv, o).mse

    g = jax.grad(loss)(wv)
    gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert gnorm > 0


def test_concatenate_dae_and_sepae(rng):
    base = image_ae.ResE2D2((3, 32, 32), (3, 32, 32), 16, 16)
    o1 = jnp.asarray(rng.standard_normal((2, 3, 32, 32)).astype(np.float32))
    o2 = jnp.asarray(rng.standard_normal((2, 3, 32, 32)).astype(np.float32))
    bv = base.init(jax.random.key(0), o1, o2)

    enc1 = lambda o: base.apply(bv, o, method=lambda m, o: m.enc1(o))
    dec1 = lambda z: base.apply(bv, z, method=lambda m, z: m.dec1(z))
    dec2 = lambda z: base.apply(bv, z, method=lambda m, z: m.dec2(z))

    sep = image_ae.ConcatenateSepAE(enc1, dec1, dec2, z_dim=8, orig_dim=16)
    sv = sep.init(jax.random.key(1), o1, o2)
    out = sep.apply(sv, o1, o2)
    assert out.obs_dec.shape == (2, 6, 32, 32)
    assert np.isfinite(float(out.mse))

    # DAE wrapper over a joint-decoder base
    base2 = image_ae.ResE2D1((3, 32, 32), (3, 32, 32), 8, 8)
    bv2 = base2.init(
        {"params": jax.random.key(0), "bottleneck": jax.random.key(1)}, o1, o2
    )
    enc1b = lambda o: base2.apply(bv2, o, method=lambda m, o: m.enc1(o))
    decb = lambda z: base2.apply(bv2, z, method=lambda m, z: m.dec(z))
    dae = image_ae.ConcatenateDAE(enc1b, decb, z_dim=8, orig_dim=8)
    dv = dae.init(jax.random.key(2), o1, o2)
    out2 = dae.apply(dv, o1, o2)
    assert out2.obs_dec.shape == (2, 6, 32, 32)
