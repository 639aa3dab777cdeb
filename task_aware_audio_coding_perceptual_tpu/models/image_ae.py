"""CNN / residual image-style autoencoder zoo ("updated" models).

TPU-native re-design of the reference's ``pkl_file_model_updated.py``:
generic (C, H, W) autoencoders with the **DPCA random bottleneck active**
(``:166-191,394-427,486-511``), plus frozen-base fine-tuning wrappers
(``ConcatenateDAE``/``JAE``/``SepAE``, ``:574-838``).

Models: E1D1/E2D1/E2D1NonSym (CNN enc/dec, ``:45-298``), ResE1D1/ResE2D1/
ResE2D1NonSym/ResE2D2/ResE4D1 (ResEncoder/ResDecoder backbones,
``:301-690``). Public API keeps NCHW tensors like the reference.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from task_aware_audio_coding_perceptual_tpu.losses import (
    cosine_similarity_loss,
    nuclear_norm_loss,
    spectral_mse_dict,
)
from task_aware_audio_coding_perceptual_tpu.metrics import psnr as psnr_fn
from task_aware_audio_coding_perceptual_tpu.models import bottlenecks
from task_aware_audio_coding_perceptual_tpu.models.resnet_ae import ResDecoder, ResEncoder


@flax.struct.dataclass
class ImageAEOutputs:
    obs_dec: jax.Array
    mse: jax.Array
    nuc_loss: jax.Array
    kl1: jax.Array
    cos_loss: jax.Array
    psnr: jax.Array
    spec_loss: Optional[dict] = None
    spec_snr: Optional[jax.Array] = None


def _nuc(z_sample):
    return nuclear_norm_loss(z_sample)


class CNNEncoder(nn.Module):
    """Strided-conv encoder emitting (mean, log_std)
    (reference ``pkl_file_model_updated.py:45-94``)."""

    obs_shape: Tuple[int, int, int]
    feature_dim: int
    num_layers: int = 3
    num_filters: int = 64
    n_hidden_layers: int = 2
    hidden_size: int = 128
    min_log_std: float = -10.0
    max_log_std: float = 2.0

    @nn.compact
    def __call__(self, obs):
        x = jnp.transpose(obs, (0, 2, 3, 1))  # NHWC
        for _ in range(self.num_layers):
            # torch Conv2d k3 s2 pad 0 == VALID
            x = nn.relu(nn.Conv(self.num_filters, (3, 3), strides=(2, 2), padding="VALID")(x))
        h = x.reshape(x.shape[0], -1)
        for _ in range(self.n_hidden_layers):
            h = nn.relu(nn.Dense(self.hidden_size)(h))
        out = nn.Dense(2 * self.feature_dim)(h)
        mean, log_std = jnp.split(out, 2, axis=1)
        return mean, jnp.clip(log_std, self.min_log_std, self.max_log_std)


class CNNDecoder(nn.Module):
    """Interpolate x2 + conv decoder (reference ``:97-143``), incl. the
    100/84-pixel padding special cases."""

    input_dim: int
    out_shape: Tuple[int, int, int]
    num_layers: int = 3
    num_filters: int = 64
    n_hidden_layers: int = 2
    hidden_size: int = 128

    @nn.compact
    def __call__(self, z):
        C, H, W = self.out_shape
        side = H // (2**self.num_layers)
        smallest = (self.num_filters, side, side)

        h = z
        for _ in range(self.n_hidden_layers):
            h = nn.relu(nn.Dense(self.hidden_size)(h))
        h = nn.relu(nn.Dense(int(np.prod(smallest)))(h))
        x = h.reshape(-1, *smallest)
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC

        for i in range(self.num_layers - 1):
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            if i == self.num_layers - 2 and self.out_shape[-1] in (100, 84):
                pad = ((2, 2), (2, 2))
            else:
                pad = ((1, 1), (1, 1))
            x = nn.relu(nn.Conv(self.num_filters, (3, 3), padding=pad)(x))
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = nn.Conv(C, (3, 3), padding=((1, 1), (1, 1)))(x)
        return jnp.transpose(x, (0, 3, 1, 2))


def _dpca_pair(z1, z2, key):
    num_features = z1.shape[1] + z2.shape[1]
    dim_p = bottlenecks.random_dim_p(key, num_features)
    outs, _ = bottlenecks.dpca_bottleneck([z1, z2], dim_p)
    return outs


class E1D1(nn.Module):
    """(reference ``:268-298``) private/shared concat is a no-op split."""

    obs_shape: Tuple[int, int, int]
    z_dim: int
    num_layers: int = 3
    num_filters: int = 64
    n_hidden_layers: int = 2
    hidden_size: int = 128

    def setup(self):
        self.enc = CNNEncoder(
            self.obs_shape, self.z_dim, self.num_layers, self.num_filters,
            self.n_hidden_layers, self.hidden_size,
        )
        self.dec = CNNDecoder(
            self.z_dim, self.obs_shape, self.num_layers, self.num_filters,
            self.n_hidden_layers, self.hidden_size,
        )

    def __call__(self, obs):
        z1, _ = self.enc(obs)
        z_sample = z1
        obs_dec = self.dec(z_sample)
        mse = 0.5 * jnp.mean((obs - obs_dec) ** 2, axis=(1, 2, 3))
        return ImageAEOutputs(
            obs_dec=obs_dec,
            mse=jnp.mean(mse),
            nuc_loss=_nuc(z_sample),
            kl1=jnp.zeros(()),
            cos_loss=jnp.zeros(()),
            psnr=psnr_fn(obs_dec, obs),
        )


class E2D1(nn.Module):
    """(reference ``:146-205``) two CNN encoders + joint decoder, DPCA."""

    obs_shape1: Tuple[int, int, int]
    obs_shape2: Tuple[int, int, int]
    z_dim1: int
    z_dim2: int
    num_layers: int = 3
    num_filters: int = 64
    n_hidden_layers: int = 2
    hidden_size: int = 128

    def setup(self):
        self.enc1 = CNNEncoder(
            self.obs_shape1, self.z_dim1, self.num_layers, self.num_filters,
            self.n_hidden_layers, self.hidden_size,
        )
        self.enc2 = CNNEncoder(
            self.obs_shape2, self.z_dim2, self.num_layers, self.num_filters,
            self.n_hidden_layers, self.hidden_size,
        )
        self.dec = CNNDecoder(
            self.z_dim1 + self.z_dim2,
            (self.obs_shape1[0] + self.obs_shape2[0], self.obs_shape1[1], self.obs_shape1[2]),
        )

    def __call__(self, obs1, obs2, random_bottle_neck=False):
        z1, _ = self.enc1(obs1)
        z2, _ = self.enc2(obs2)
        obs = jnp.concatenate([obs1, obs2], axis=1)
        if random_bottle_neck:
            z1, z2 = _dpca_pair(z1, z2, self.make_rng("bottleneck"))
        z_sample = jnp.concatenate([z1, z2], axis=1)
        obs_dec = self.dec(z_sample)
        mse = 0.5 * jnp.mean((obs - obs_dec) ** 2, axis=(1, 2, 3))
        return ImageAEOutputs(
            obs_dec=obs_dec,
            mse=jnp.mean(mse),
            nuc_loss=_nuc(z_sample),
            kl1=jnp.zeros(()),
            cos_loss=jnp.zeros(()),
            psnr=psnr_fn(obs_dec, obs),
        )


class E2D1NonSym(nn.Module):
    """(reference ``:208-265``) non-symmetric: separate target obs."""

    obs_shape1: Tuple[int, int, int]
    obs_shape2: Tuple[int, int, int]
    z_dim1: int
    z_dim2: int

    def setup(self):
        self.enc1 = CNNEncoder(self.obs_shape1, self.z_dim1)
        self.enc2 = CNNEncoder(self.obs_shape2, self.z_dim2)
        self.dec = CNNDecoder(
            self.z_dim1 + self.z_dim2,
            (self.obs_shape1[0], self.obs_shape1[2], self.obs_shape1[2]),
        )

    def __call__(self, obs1, obs2, obs, random_bottle_neck=False):
        z1, _ = self.enc1(obs1)
        z2, _ = self.enc2(obs2)
        if random_bottle_neck:
            z1, z2 = _dpca_pair(z1, z2, self.make_rng("bottleneck"))
        z_sample = jnp.concatenate([z1, z2], axis=1)
        obs_dec = self.dec(z_sample)
        mse = 0.5 * jnp.mean((obs - obs_dec) ** 2, axis=(1, 2, 3))
        return ImageAEOutputs(
            obs_dec=obs_dec,
            mse=jnp.mean(mse),
            nuc_loss=_nuc(z_sample),
            kl1=jnp.zeros(()),
            cos_loss=jnp.zeros(()),
            psnr=psnr_fn(obs_dec, obs),
        )


class ResE1D1(nn.Module):
    """(reference ``:647-690``)."""

    obs_shape: Tuple[int, int, int]
    z_dim: int
    n_samples: int = 4
    n_res_blocks: int = 3

    def get_model_name(self):
        return f"SpectralResE1D1_{int(self.z_dim)}"

    def setup(self):
        self.enc = ResEncoder(self.obs_shape, self.z_dim, self.n_samples, self.n_res_blocks)
        self.dec = ResDecoder(self.obs_shape, self.z_dim, self.n_samples, self.n_res_blocks)

    def __call__(self, obs):
        z1, _ = self.enc(obs)
        z_sample = z1
        obs_dec = self.dec(z_sample)
        mse = 0.5 * jnp.mean((obs - obs_dec) ** 2, axis=(1, 2, 3))
        spec_loss = spectral_mse_dict(obs, obs_dec)
        spec_snr = -10 * jnp.log10(jnp.mean((obs - obs_dec) ** 2) / jnp.mean(obs**2))
        return ImageAEOutputs(
            obs_dec=obs_dec,
            mse=jnp.mean(mse),
            nuc_loss=_nuc(z_sample),
            kl1=jnp.zeros(()),
            cos_loss=jnp.zeros(()),
            psnr=psnr_fn(obs_dec, obs),
            spec_loss=spec_loss,
            spec_snr=spec_snr,
        )


class ResE2D1(nn.Module):
    """(reference ``:458-543``)."""

    obs_shape1: Tuple[int, int, int]
    obs_shape2: Tuple[int, int, int]
    z_dim1: int
    z_dim2: int
    n_samples: int = 4
    n_res_blocks: int = 3

    def get_model_name(self):
        return f"SpectralResE2D1_{int(self.z_dim1 + self.z_dim2)}"

    def setup(self):
        self.enc1 = ResEncoder(self.obs_shape1, self.z_dim1, self.n_samples, self.n_res_blocks)
        self.enc2 = ResEncoder(self.obs_shape2, self.z_dim2, self.n_samples, self.n_res_blocks)
        self.dec = ResDecoder(
            (self.obs_shape1[0] + self.obs_shape2[0], self.obs_shape1[1], self.obs_shape1[2]),
            self.z_dim1 + self.z_dim2,
            self.n_samples,
            self.n_res_blocks,
        )

    def __call__(self, obs1, obs2, random_bottle_neck=False):
        z1, _ = self.enc1(obs1)
        z2, _ = self.enc2(obs2)
        obs = jnp.concatenate([obs1, obs2], axis=1)
        if random_bottle_neck:
            z1, z2 = _dpca_pair(z1, z2, self.make_rng("bottleneck"))
        cos_loss = cosine_similarity_loss(z1, z2)
        z_sample = jnp.concatenate([z1, z2], axis=1)
        obs_dec = self.dec(z_sample)
        mse = 0.5 * jnp.mean((obs - obs_dec) ** 2, axis=(1, 2, 3))
        spec_loss = spectral_mse_dict(obs, obs_dec)
        spec_snr = -10 * jnp.log10(jnp.mean((obs - obs_dec) ** 2) / jnp.mean(obs**2))
        return ImageAEOutputs(
            obs_dec=obs_dec,
            mse=jnp.mean(mse),
            nuc_loss=_nuc(z_sample),
            kl1=jnp.zeros(()),
            cos_loss=cos_loss,
            psnr=psnr_fn(obs_dec, obs),
            spec_loss=spec_loss,
            spec_snr=spec_snr,
        )


class ResE2D1NonSym(nn.Module):
    """(reference ``:301-359``)."""

    size1: Tuple[int, int, int]
    size2: Tuple[int, int, int]
    z_dim1: int
    z_dim2: int
    n_samples: int = 4
    n_res_blocks: int = 3

    def setup(self):
        self.enc1 = ResEncoder(self.size1, self.z_dim1, self.n_samples, self.n_res_blocks)
        self.enc2 = ResEncoder(self.size2, self.z_dim2, self.n_samples, self.n_res_blocks)
        self.dec = ResDecoder(
            (self.size2[0], self.size2[-1], self.size2[-1]),
            self.z_dim1 + self.z_dim2,
            self.n_samples,
            self.n_res_blocks,
        )

    def __call__(self, obs1, obs2, obs, random_bottle_neck=False):
        z1, _ = self.enc1(obs1)
        z2, _ = self.enc2(obs2)
        if random_bottle_neck:
            z1, z2 = _dpca_pair(z1, z2, self.make_rng("bottleneck"))
        z_sample = jnp.concatenate([z1, z2], axis=1)
        obs_dec = self.dec(z_sample)
        mse = 0.5 * jnp.mean((obs - obs_dec) ** 2, axis=(1, 2, 3))
        return ImageAEOutputs(
            obs_dec=obs_dec,
            mse=jnp.mean(mse),
            nuc_loss=_nuc(z_sample),
            kl1=jnp.zeros(()),
            cos_loss=jnp.zeros(()),
            psnr=psnr_fn(obs_dec, obs),
        )


class ResE2D2(nn.Module):
    """(reference ``:546-571``): separate decoders, no bottleneck."""

    obs_shape1: Tuple[int, int, int]
    obs_shape2: Tuple[int, int, int]
    z_dim1: int
    z_dim2: int
    n_samples: int = 4
    n_res_blocks: int = 3

    def setup(self):
        self.enc1 = ResEncoder(self.obs_shape1, self.z_dim1, self.n_samples, self.n_res_blocks)
        self.enc2 = ResEncoder(self.obs_shape2, self.z_dim2, self.n_samples, self.n_res_blocks)
        self.dec1 = ResDecoder(self.obs_shape1, self.z_dim1, self.n_samples, self.n_res_blocks)
        self.dec2 = ResDecoder(self.obs_shape2, self.z_dim2, self.n_samples, self.n_res_blocks)

    def __call__(self, obs1, obs2):
        z1, _ = self.enc1(obs1)
        z2, _ = self.enc2(obs2)
        obs = jnp.concatenate([obs1, obs2], axis=1)
        obs_dec = jnp.concatenate([self.dec1(z1), self.dec2(z2)], axis=1)
        mse = 0.5 * jnp.mean((obs - obs_dec) ** 2, axis=(1, 2, 3))
        return ImageAEOutputs(
            obs_dec=obs_dec,
            mse=jnp.mean(mse),
            nuc_loss=jnp.zeros(()),
            kl1=jnp.zeros(()),
            cos_loss=jnp.zeros(()),
            psnr=psnr_fn(obs_dec, obs),
        )


class ResE4D1(nn.Module):
    """(reference ``:362-454``): 4 encoders, 2x2 mosaic target, DPCA."""

    obs_shape1: Tuple[int, int, int]
    obs_shape2: Tuple[int, int, int]
    obs_shape3: Tuple[int, int, int]
    obs_shape4: Tuple[int, int, int]
    z_dim1: int
    z_dim2: int
    z_dim3: int
    z_dim4: int
    n_samples: int = 4
    n_res_blocks: int = 3

    def get_model_name(self):
        return f"SpectralResE4D1_{int(self.z_dim1 + self.z_dim2 + self.z_dim3 + self.z_dim4)}"

    def setup(self):
        shapes = [self.obs_shape1, self.obs_shape2, self.obs_shape3, self.obs_shape4]
        dims = [self.z_dim1, self.z_dim2, self.z_dim3, self.z_dim4]
        self.encs = [
            ResEncoder(s, d, self.n_samples, self.n_res_blocks) for s, d in zip(shapes, dims)
        ]
        self.dec = ResDecoder(
            (
                self.obs_shape1[0],
                self.obs_shape1[1] + self.obs_shape3[1],
                self.obs_shape1[2] + self.obs_shape3[2],
            ),
            sum(dims),
            self.n_samples,
            self.n_res_blocks,
        )

    def __call__(self, obs1, obs2, obs3, obs4, random_bottle_neck=False):
        obs_list = [obs1, obs2, obs3, obs4]
        zs = [enc(o)[0] for enc, o in zip(self.encs, obs_list)]
        obs12 = jnp.concatenate([obs1, obs2], axis=3)
        obs34 = jnp.concatenate([obs3, obs4], axis=3)
        obs = jnp.concatenate([obs12, obs34], axis=2)
        if random_bottle_neck:
            key = self.make_rng("bottleneck")
            num_features = sum(z.shape[1] for z in zs)
            dim_p = bottlenecks.random_dim_p(key, num_features)
            zs, _ = bottlenecks.dpca_bottleneck(zs, dim_p)
        cos_loss = jnp.mean(
            cosine_similarity_loss(zs[0], zs[1])
            + cosine_similarity_loss(zs[0], zs[2])
            + cosine_similarity_loss(zs[0], zs[3])
            + cosine_similarity_loss(zs[1], zs[2])
            + cosine_similarity_loss(zs[1], zs[3])
            + cosine_similarity_loss(zs[2], zs[3])
        )
        z_sample = jnp.concatenate(zs, axis=1)
        obs_dec = self.dec(z_sample)
        mse = 0.5 * jnp.mean((obs - obs_dec) ** 2, axis=(1, 2, 3))
        spec_loss = spectral_mse_dict(obs, obs_dec)
        spec_snr = -10 * jnp.log10(jnp.mean((obs - obs_dec) ** 2) / jnp.mean(obs**2))
        return ImageAEOutputs(
            obs_dec=obs_dec,
            mse=jnp.mean(mse),
            nuc_loss=_nuc(z_sample),
            kl1=jnp.zeros(()),
            cos_loss=cos_loss,
            psnr=psnr_fn(obs_dec, obs),
            spec_loss=spec_loss,
            spec_snr=spec_snr,
        )


class _FFStack(nn.Module):
    dims: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d)(x)
            if i < len(self.dims) - 1:
                x = nn.relu(x)
        return x


class ConcatenateDAE(nn.Module):
    """Frozen distributed AE + trainable FF adapters
    (reference ``:574-644``). ``base_enc1``/``base_dec`` are apply closures
    over frozen params; gradients are stopped at the boundary."""

    base_enc1: Callable  # obs -> (z, aux)
    base_dec: Callable  # z -> obs_dec
    z_dim: int
    orig_dim: int

    def setup(self):
        zd, od = self.z_dim, self.orig_dim
        mid2, mid1 = int((od + zd) * 2 / 3), int((od + zd) * 1 / 3)
        self.ffenc1 = _FFStack((mid2, mid1, zd))
        self.ffenc2 = _FFStack((mid2, mid1, zd))
        self.ffdec = _FFStack((mid1 * 2, mid2 * 2, od * 2))

    def enc(self, obs1, obs2):
        z1, _ = self.base_enc1(obs1)
        z2, _ = self.base_enc1(obs2)
        z1 = self.ffenc1(jax.lax.stop_gradient(z1))
        z2 = self.ffenc2(jax.lax.stop_gradient(z2))
        return jnp.concatenate([z1, z2], axis=1), None

    def dec(self, z):
        return self.base_dec(self.ffdec(z))

    def __call__(self, obs1, obs2):
        z_sample, _ = self.enc(obs1, obs2)
        obs = jnp.concatenate([obs1, obs2], axis=1)
        obs_dec = self.dec(z_sample)
        mse = 0.5 * jnp.mean((obs - obs_dec) ** 2, axis=(1, 2, 3))
        return ImageAEOutputs(
            obs_dec=obs_dec,
            mse=jnp.mean(mse),
            nuc_loss=_nuc(z_sample),
            kl1=jnp.zeros(()),
            cos_loss=jnp.zeros(()),
            psnr=psnr_fn(obs_dec, obs),
        )


class ConcatenateJAE(nn.Module):
    """Frozen joint AE + FF adapters (reference ``:694-757``)."""

    base_enc: Callable
    base_dec: Callable
    z_dim: int
    orig_dim: int

    def setup(self):
        zd, od = self.z_dim, self.orig_dim
        mid2, mid1 = int((od + zd) * 2 / 3), int((od + zd) * 1 / 3)
        self.ffenc = _FFStack((mid2, mid1, zd))
        self.ffdec = _FFStack((mid1, mid2, od))

    def __call__(self, obs):
        z, _ = self.base_enc(obs)
        z = self.ffenc(jax.lax.stop_gradient(z))
        obs_dec = self.base_dec(self.ffdec(z))
        mse = 0.5 * jnp.mean((obs - obs_dec) ** 2, axis=(1, 2, 3))
        return ImageAEOutputs(
            obs_dec=obs_dec,
            mse=jnp.mean(mse),
            nuc_loss=_nuc(z),
            kl1=jnp.zeros(()),
            cos_loss=jnp.zeros(()),
            psnr=psnr_fn(obs_dec, obs),
        )


class ConcatenateSepAE(nn.Module):
    """Frozen separate-AE pair + FF adapters (reference ``:760-838``)."""

    base_enc1: Callable
    base_dec1: Callable
    base_dec2: Callable
    z_dim: int
    orig_dim: int

    def setup(self):
        zd, od = self.z_dim, self.orig_dim
        mid2, mid1 = int((od + zd) * 2 / 3), int((od + zd) * 1 / 3)
        self.ffenc1 = _FFStack((mid2, mid1, zd))
        self.ffenc2 = _FFStack((mid2, mid1, zd))
        self.ffdec1 = _FFStack((mid1, mid2, od))
        self.ffdec2 = _FFStack((mid1, mid2, od))

    def __call__(self, obs1, obs2):
        z1, _ = self.base_enc1(obs1)
        z2, _ = self.base_enc1(obs2)
        z1 = self.ffenc1(jax.lax.stop_gradient(z1))
        z2 = self.ffenc2(jax.lax.stop_gradient(z2))
        z_sample = jnp.concatenate([z1, z2], axis=1)
        obs = jnp.concatenate([obs1, obs2], axis=1)
        obs_dec = jnp.concatenate(
            [self.base_dec1(self.ffdec1(z1)), self.base_dec2(self.ffdec2(z2))], axis=1
        )
        mse = 0.5 * jnp.mean((obs - obs_dec) ** 2, axis=(1, 2, 3))
        return ImageAEOutputs(
            obs_dec=obs_dec,
            mse=jnp.mean(mse),
            nuc_loss=_nuc(z_sample),
            kl1=jnp.zeros(()),
            cos_loss=jnp.zeros(()),
            psnr=psnr_fn(obs_dec, obs),
        )
