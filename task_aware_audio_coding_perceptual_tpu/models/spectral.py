"""Spectral multi-encoder autoencoder zoo (distributed source coding).

TPU-native re-design of the reference's flagship models
(``pkl_file_models.py``): N microphones observe the same speaker; each
(magnitude, phase) spectrogram is encoded by its own encoder, latents pass a
rate-limiting bottleneck, and decoders reconstruct.

Architecture parity (``pkl_file_models.py:118-221``): per-frame frequency
MLP 1025->256->128, 1-D temporal conv stack with BatchNorm, 3 residual conv
blocks, global average pool, linear head; the decoder mirrors it. Layout is
TPU-first: (B, T, C) channels-last internally so convs hit the MXU; the
public API keeps the reference's (B, 2, F, T) stacked mag/phase tensors.

Models: SpectralResE1D1 (top-variance bottleneck,
``pkl_file_models.py:867-957``), SpectralResE2D1 (private/shared + random
alpha mixing, ``:253-427``), SpectralResE2D2 (two decoders, ``:1070-1187``),
SpectralResE4D1 (2x2 mosaic target, ``:569-798``).

Loss outputs mirror the reference's forward-returned tuple, as a named
struct (MSE with the 0.5 factor, nuclear norm, cosine, spectral loss dict,
spectral SNR, PSNRs, dimension_info).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu.losses import (
    cosine_similarity_loss,
    nuclear_norm_loss,
    spectral_mse_dict,
)
from task_aware_audio_coding_perceptual_tpu.models import bottlenecks


@flax.struct.dataclass
class SpectralOutputs:
    """Field-for-field the reference forward return tuple
    (``pkl_file_models.py:427``)."""

    obs_dec: jax.Array
    total_mse: jax.Array
    nuc_loss: jax.Array
    cross_recon_loss: jax.Array
    cos_loss: jax.Array
    total_spec_loss: jax.Array
    spec_loss: dict
    total_spec_snr: jax.Array
    psnr_obs: jax.Array
    psnr_clean: jax.Array
    dimension_info: dict


def stack_mag_phase(obs: dict) -> jax.Array:
    """{'magnitude','phase'} (B,F,T) -> (B, 2, F, T) float32
    (reference ``pkl_file_models.py:279-289``)."""
    return jnp.stack([obs["magnitude"], obs["phase"]], axis=1).astype(jnp.float32)


class SpectralResBlock(nn.Module):
    """Conv1d(3)+BN -> relu -> Conv1d(3)+BN, +residual, relu
    (``pkl_file_models.py:101-116``). Layout (B, T, C)."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.channels, (3,), padding="SAME")(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3,), padding="SAME")(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        return nn.relu(h + x)


class SpectralEncoder(nn.Module):
    """(B, C, F, T) -> (B, z_dim) (``pkl_file_models.py:118-166``)."""

    in_channels: int
    freq_dim: int
    time_dim: int
    z_dim: int
    n_res_blocks: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, C, F, T = x.shape
        # frequency MLP applied per (channel, frame)
        h = jnp.transpose(x, (0, 1, 3, 2))  # (B, C, T, F)
        h = nn.relu(nn.Dense(256)(h))
        h = nn.Dense(128)(h)  # (B, C, T, 128)
        # merge channel features -> (B, T, C*128) channels-last for convs
        h = jnp.transpose(h, (0, 2, 1, 3)).reshape(B, T, C * 128)

        h = nn.Conv(256, (3,), padding="SAME")(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(128, (3,), padding="SAME")(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)

        for _ in range(self.n_res_blocks):
            h = SpectralResBlock(128)(h, train)

        h = jnp.mean(h, axis=1)  # AdaptiveAvgPool1d(1)
        return nn.Dense(self.z_dim)(h), None


class SpectralDecoder(nn.Module):
    """(B, z_dim) -> (B, C, F, T) (``pkl_file_models.py:168-221``)."""

    out_channels: int
    freq_dim: int
    time_dim: int
    z_dim: int
    n_res_blocks: int = 3

    @nn.compact
    def __call__(self, z, train: bool = False):
        B = z.shape[0]
        h = nn.relu(nn.Dense(128 * self.time_dim)(z))
        h = h.reshape(B, self.time_dim, 128)  # (B, T, 128) channels-last

        for _ in range(self.n_res_blocks):
            h = SpectralResBlock(128)(h, train)

        h = nn.Conv(256, (3,), padding="SAME")(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(128 * self.out_channels, (3,), padding="SAME")(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)  # (B, T, 128*C)

        h = h.reshape(B, self.time_dim, self.out_channels, 128)
        h = nn.relu(nn.Dense(256)(h))
        h = nn.Dense(self.freq_dim)(h)  # (B, T, C, F)
        return jnp.transpose(h, (0, 2, 3, 1))  # (B, C, F, T)


def _common_losses(obs, obs_dec, z_sample, batch_size):
    mse = 0.5 * jnp.mean((obs - obs_dec) ** 2, axis=(1, 2, 3))
    total_mse = jnp.mean(mse)
    nuc = nuclear_norm_loss(z_sample)
    spec_loss = spectral_mse_dict(obs, obs_dec)
    spec_snr = -10 * jnp.log10(jnp.mean((obs - obs_dec) ** 2) / jnp.mean(obs**2))
    return total_mse, nuc, spec_loss, spec_snr


class SpectralResE2D1(nn.Module):
    """Two encoders, private/shared random bottleneck, one joint decoder
    (``pkl_file_models.py:253-427``)."""

    z_dim1: int
    z_dim2: int
    n_res_blocks: int = 3
    total_features_after: int = 128
    freq_dim: int = 1025
    time_dim: int = 600
    in_channels: int = 2

    def get_model_name(self):
        return f"SpectralResE2D1_{int(self.total_features_after)}"

    def get_dim_info(self):
        return ["before_z1", "before_z2", "after_z1", "after_z2"]

    def setup(self):
        self.enc1 = SpectralEncoder(
            self.in_channels, self.freq_dim, self.time_dim, self.z_dim1, self.n_res_blocks
        )
        self.enc2 = SpectralEncoder(
            self.in_channels, self.freq_dim, self.time_dim, self.z_dim2, self.n_res_blocks
        )
        self.dec = SpectralDecoder(
            self.in_channels,
            self.freq_dim,
            self.time_dim,
            int(self.total_features_after * 2),
            self.n_res_blocks,
        )

    def __call__(self, obs1, obs2, clean_data=None, random_bottle_neck=True, train: bool = False):
        obs1_stacked = stack_mag_phase(obs1)
        obs2_stacked = stack_mag_phase(obs2)
        z1, _ = self.enc1(obs1_stacked, train)
        z2, _ = self.enc2(obs2_stacked, train)
        obs = obs1_stacked
        batch_size = z1.shape[0]

        key = self.make_rng("bottleneck") if random_bottle_neck else None
        samples, dim_info = bottlenecks.private_shared_mix(
            [z1, z2], key, self.total_features_after, random_bottle_neck
        )

        cos_loss = cosine_similarity_loss(z1, z2)
        # the reference decodes the *untruncated* concat (pkl_file_models.py:392-394)
        z_sample = jnp.concatenate([z1, z2], axis=1)
        obs_dec = self.dec(z_sample, train)

        total_mse, nuc, spec_loss, spec_snr = _common_losses(obs, obs_dec, z_sample, batch_size)
        psnr_obs = 10 * jnp.log10(jnp.max(obs1["magnitude"]) / total_mse)
        psnr_clean = 10 * jnp.log10(jnp.max(obs2["magnitude"]) / total_mse)
        return SpectralOutputs(
            obs_dec=obs_dec,
            total_mse=total_mse,
            nuc_loss=nuc,
            cross_recon_loss=jnp.zeros(()),
            cos_loss=cos_loss,
            total_spec_loss=spec_loss["total_loss"],
            spec_loss=spec_loss,
            total_spec_snr=spec_snr,
            psnr_obs=psnr_obs,
            psnr_clean=psnr_clean,
            dimension_info=dim_info,
        )


class SpectralResE1D1(nn.Module):
    """One encoder with top-variance feature selection
    (``pkl_file_models.py:867-957``)."""

    z_dim: int
    n_res_blocks: int = 3
    total_features_after: int = 128
    freq_dim: int = 1025
    time_dim: int = 600
    in_channels: int = 2

    def get_model_name(self):
        return f"SpectralResE1D1_{int(self.total_features_after)}"

    def get_dim_info(self):
        return ["before_z1", "after_z1"]

    def setup(self):
        self.enc = SpectralEncoder(
            self.in_channels, self.freq_dim, self.time_dim, self.z_dim, self.n_res_blocks
        )
        self.dec = SpectralDecoder(
            self.in_channels,
            self.freq_dim,
            self.time_dim,
            self.total_features_after,
            self.n_res_blocks,
        )

    def __call__(self, obs, clean=None, random_bottle_neck=True, train: bool = False):
        obs_stacked = stack_mag_phase(obs)
        z1, _ = self.enc(obs_stacked, train)
        batch_size = z1.shape[0]

        z_sample, _ = bottlenecks.top_variance_select(z1, int(self.total_features_after))
        obs_dec = self.dec(z_sample, train)

        total_mse, nuc, spec_loss, spec_snr = _common_losses(
            obs_stacked, obs_dec, z_sample, batch_size
        )
        psnr = 10 * jnp.log10(jnp.max(obs["magnitude"]) / total_mse)
        return SpectralOutputs(
            obs_dec=obs_dec,
            total_mse=total_mse,
            nuc_loss=nuc,
            cross_recon_loss=jnp.zeros(()),
            cos_loss=jnp.zeros(()),
            total_spec_loss=spec_loss["total_loss"],
            spec_loss=spec_loss,
            total_spec_snr=spec_snr,
            psnr_obs=psnr,
            psnr_clean=psnr,
            dimension_info={"before_z1": z1.shape[1], "after_z2": z_sample.shape[1]},
        )


class SpectralResE2D2(nn.Module):
    """Two encoders, two decoders, cross-reconstruction loss
    (``pkl_file_models.py:1070-1187``)."""

    z_dim1: int
    z_dim2: int
    n_res_blocks: int = 3
    total_features_after: int = 256
    freq_dim: int = 1025
    time_dim: int = 600
    in_channels: int = 2

    def get_model_name(self):
        return f"SpectralResE2D2_{int(self.total_features_after)}"

    def get_dim_info(self):
        return ["before_z1", "before_z2", "after_z1", "after_z2"]

    def setup(self):
        self.enc1 = SpectralEncoder(
            self.in_channels, self.freq_dim, self.time_dim, self.z_dim1, self.n_res_blocks
        )
        self.enc2 = SpectralEncoder(
            self.in_channels, self.freq_dim, self.time_dim, self.z_dim2, self.n_res_blocks
        )
        self.dec1 = SpectralDecoder(
            self.in_channels,
            self.freq_dim,
            self.time_dim,
            int(self.total_features_after / 2),
            self.n_res_blocks,
        )
        self.dec2 = SpectralDecoder(
            self.in_channels,
            self.freq_dim,
            self.time_dim,
            int(self.total_features_after / 2),
            self.n_res_blocks,
        )

    def __call__(self, obs1, obs2, clean=None, random_bottle_neck=True, train: bool = False):
        obs_stacked = stack_mag_phase(obs1)
        clean_stacked = stack_mag_phase(obs2)
        z1, _ = self.enc1(obs_stacked, train)
        z2, _ = self.enc2(clean_stacked, train)
        batch_size = z1.shape[0]

        key = self.make_rng("bottleneck") if random_bottle_neck else None
        samples, dim_info = bottlenecks.private_shared_mix(
            [z1, z2], key, self.total_features_after, random_bottle_neck
        )
        z1_sample, z2_sample = samples

        obs_dec = self.dec1(z1_sample, train)
        clean_dec = self.dec2(z2_sample, train)

        mse1 = 0.5 * jnp.mean((obs_stacked - obs_dec) ** 2, axis=(1, 2, 3))
        mse2 = 0.5 * jnp.mean((clean_stacked - clean_dec) ** 2, axis=(1, 2, 3))
        psnr_obs = 10 * jnp.log10(1.0 / jnp.mean(mse1))
        psnr_clean = 10 * jnp.log10(1.0 / jnp.mean(mse2))

        spec_loss1 = spectral_mse_dict(obs_stacked, obs_dec)
        spec_loss2 = spectral_mse_dict(clean_stacked, clean_dec)
        snr1 = -10 * jnp.log10(
            jnp.mean((obs_stacked - obs_dec) ** 2) / jnp.mean(obs_stacked**2)
        )
        snr2 = -10 * jnp.log10(
            jnp.mean((clean_stacked - clean_dec) ** 2) / jnp.mean(clean_stacked**2)
        )
        nuc1 = nuclear_norm_loss(z1_sample)
        nuc2 = nuclear_norm_loss(z2_sample)
        cross = jnp.mean((obs_dec - clean_dec) ** 2)

        return SpectralOutputs(
            obs_dec=obs_dec,
            total_mse=jnp.mean(mse1 + mse2),
            nuc_loss=(nuc1 + nuc2) / 2,
            cross_recon_loss=cross,
            cos_loss=jnp.zeros(()),
            total_spec_loss=(spec_loss1["total_loss"] + spec_loss2["total_loss"]) / 2,
            spec_loss=spec_loss1,
            total_spec_snr=(snr1 + snr2) / 2,
            psnr_obs=psnr_obs,
            psnr_clean=psnr_clean,
            dimension_info=dim_info,
        )


class SpectralResE4D1(nn.Module):
    """Four encoders; targets are tiled into a 2x2 (freq x time) mosaic;
    private/shared pairs mixing (``pkl_file_models.py:569-798``)."""

    z_dim1: int
    z_dim2: int
    z_dim3: int
    z_dim4: int
    n_res_blocks: int = 3
    total_features_after: int = 128
    freq_dim: int = 1025
    time_dim: int = 600
    in_channels: int = 2

    def get_model_name(self):
        return f"SpectralResE4D1_{int(self.total_features_after)}"

    def get_dim_info(self):
        return [
            "before_z1", "before_z2", "before_z3", "before_z4",
            "after_z1", "after_z2", "after_z3", "after_z4",
        ]

    def setup(self):
        dims = [self.z_dim1, self.z_dim2, self.z_dim3, self.z_dim4]
        self.encs = [
            SpectralEncoder(
                self.in_channels, self.freq_dim, self.time_dim, d, self.n_res_blocks
            )
            for d in dims
        ]
        self.dec = SpectralDecoder(
            self.in_channels,
            self.freq_dim * 2,
            self.time_dim * 2,
            self.total_features_after,
            self.n_res_blocks,
        )

    def __call__(self, obs1, obs2, obs3, obs4, clean_data=None, random_bottle_neck=True, train: bool = False):
        stacked = [stack_mag_phase(o) for o in (obs1, obs2, obs3, obs4)]
        zs = [enc(s, train)[0] for enc, s in zip(self.encs, stacked)]
        batch_size = zs[0].shape[0]

        obs12 = jnp.concatenate([stacked[0], stacked[1]], axis=3)
        obs34 = jnp.concatenate([stacked[2], stacked[3]], axis=3)
        obs = jnp.concatenate([obs12, obs34], axis=2)

        key = self.make_rng("bottleneck") if random_bottle_neck else None
        samples, dim_info = bottlenecks.private_shared_mix(
            zs, key, self.total_features_after, random_bottle_neck
        )
        z_sample = jnp.concatenate(samples, axis=1)

        cos_loss = jnp.mean(
            cosine_similarity_loss(zs[0], zs[1])
            + cosine_similarity_loss(zs[0], zs[2])
            + cosine_similarity_loss(zs[0], zs[3])
            + cosine_similarity_loss(zs[1], zs[2])
            + cosine_similarity_loss(zs[1], zs[3])
            + cosine_similarity_loss(zs[2], zs[3])
        )
        obs_dec = self.dec(z_sample, train)

        total_mse, nuc, spec_loss, spec_snr = _common_losses(obs, obs_dec, z_sample, batch_size)
        psnr_obs = 10 * jnp.log10(jnp.max(obs1["magnitude"]) / total_mse)
        psnr_clean = 10 * jnp.log10(jnp.max(obs2["magnitude"]) / total_mse)
        return SpectralOutputs(
            obs_dec=obs_dec,
            total_mse=total_mse,
            nuc_loss=nuc,
            cross_recon_loss=jnp.zeros(()),
            cos_loss=cos_loss,
            total_spec_loss=spec_loss["total_loss"],
            spec_loss=spec_loss,
            total_spec_snr=spec_snr,
            psnr_obs=psnr_obs,
            psnr_clean=psnr_clean,
            dimension_info=dim_info,
        )
