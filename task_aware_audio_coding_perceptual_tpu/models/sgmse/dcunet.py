"""DCUNet: complex-valued U-Net score backbone (reference ``backbones/dcunet.py``).

Complex conv encoder/decoder stacks with auto-mirrored decoder arguments,
four architectures incl. ``DilDCUNet-v2`` (the SGMSE Interspeech'22 model),
complex GFP/DS time embeddings, OnReIm batch norm, and pad/trim length
fixing. Complex arithmetic is pairs of real ops (see ``shared.py``), NHWC
layout internally; the public API is ``(spec (B, 2, F, T) complex, t)`` ->
``(B, 1, F, T)`` complex like the reference (its ``dcunet.py:261-290``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from task_aware_audio_coding_perceptual_tpu.models.sgmse.shared import (
    BackboneRegistry,
    ComplexDense,
    DiffusionStepEmbedding,
    GaussianFourierProjection,
)


def _get_activation(name: str):
    if name == "silu":
        return jax.nn.silu
    elif name == "relu":
        return jax.nn.relu
    elif name == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, 0.01)
    raise NotImplementedError(f"Unknown activation: {name}")


def _on_reim(fn, x):
    return fn(x.real) + 1j * fn(x.imag)


def unet_decoder_args(encoders, *, skip_connections: bool):
    """Mirror encoder args into decoder args (reference ``dcunet.py:41-62``)."""
    decoder_args = []
    for enc_in, enc_out, k, s, p, d in reversed(encoders):
        skip_in = enc_out if (skip_connections and decoder_args) else 0
        decoder_args.append((enc_out + skip_in, enc_in, k, s, p, d))
    return tuple(decoder_args)


def make_unet_encoder_decoder_args(encoder_args, decoder_args):
    encoder_args = tuple(
        (
            ic, oc, tuple(k), tuple(s),
            tuple(n // 2 for n in k) if p == "auto" else tuple(p), tuple(d),
        )
        for ic, oc, k, s, p, d in encoder_args
    )
    if decoder_args == "auto":
        decoder_args = unet_decoder_args(encoder_args, skip_connections=True)
    return encoder_args, decoder_args


DCUNET_ARCHITECTURES = {
    "DCUNet-10": make_unet_encoder_decoder_args(
        (
            (1, 32, (7, 5), (2, 2), "auto", (1, 1)),
            (32, 64, (7, 5), (2, 2), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 1), "auto", (1, 1)),
        ),
        "auto",
    ),
    "DCUNet-16": make_unet_encoder_decoder_args(
        (
            (1, 32, (7, 5), (2, 2), "auto", (1, 1)),
            (32, 32, (7, 5), (2, 1), "auto", (1, 1)),
            (32, 64, (7, 5), (2, 2), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 1), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 1), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 1), "auto", (1, 1)),
        ),
        "auto",
    ),
    "DCUNet-20": make_unet_encoder_decoder_args(
        (
            (1, 32, (7, 1), (1, 1), "auto", (1, 1)),
            (32, 32, (1, 7), (1, 1), "auto", (1, 1)),
            (32, 64, (7, 5), (2, 2), "auto", (1, 1)),
            (64, 64, (7, 5), (2, 1), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 1), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 1), "auto", (1, 1)),
            (64, 64, (5, 3), (2, 2), "auto", (1, 1)),
            (64, 90, (5, 3), (2, 1), "auto", (1, 1)),
        ),
        "auto",
    ),
    "DilDCUNet-v2": make_unet_encoder_decoder_args(
        (
            (1, 32, (4, 4), (1, 1), "auto", (1, 1)),
            (32, 32, (4, 4), (1, 1), "auto", (1, 1)),
            (32, 32, (4, 4), (1, 1), "auto", (1, 1)),
            (32, 64, (4, 4), (2, 1), "auto", (2, 1)),
            (64, 128, (4, 4), (2, 2), "auto", (4, 1)),
            (128, 256, (4, 4), (2, 2), "auto", (8, 1)),
        ),
        "auto",
    ),
}


class _ComplexConv(nn.Module):
    """Torch-padding complex conv (NHWC complex in/out)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[int, int]
    dilation: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        pad = ((self.padding[0], self.padding[0]), (self.padding[1], self.padding[1]))
        conv = lambda name: nn.Conv(
            self.features, self.kernel_size, strides=self.strides, padding=pad,
            kernel_dilation=self.dilation, name=name,
        )
        re, im = conv("re"), conv("im")
        return (re(x.real) - im(x.imag)) + 1j * (re(x.imag) + im(x.real))


class _ComplexConvTranspose(nn.Module):
    """Torch-semantics complex transposed conv: VALID then crop ``padding``
    from each side; final size fixed to ``output_size`` when given."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[int, int]
    dilation: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, output_size: Optional[Tuple[int, int]] = None):
        conv = lambda name: nn.ConvTranspose(
            self.features, self.kernel_size, strides=self.strides, padding="VALID",
            kernel_dilation=self.dilation, name=name,
        )
        re, im = conv("re"), conv("im")
        y = (re(x.real) - im(x.imag)) + 1j * (re(x.imag) + im(x.real))
        ph, pw = self.padding
        y = y[:, ph : y.shape[1] - ph if ph else y.shape[1],
              pw : y.shape[2] - pw if pw else y.shape[2], :]
        if output_size is not None:
            th, tw = output_size
            y = y[:, : min(y.shape[1], th), : min(y.shape[2], tw), :]
            pad_h, pad_w = th - y.shape[1], tw - y.shape[2]
            if pad_h or pad_w:
                y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        return y


class _OnReImBatchNorm(nn.Module):
    """Separate real/imag normalization (reference 'bN', ``dcunet.py:29-37,336-342``).

    Stateless batch statistics: normalize over (batch, H, W) with learned
    scale/bias, no running averages. ``flax.linen.BatchNorm`` with
    ``use_running_average=False`` writes a mutable ``batch_stats``
    collection, which the functional ScoreModel train step (pure params in,
    params out) does not thread; always-batch-stats is the standard speech
    simplification and keeps DCUNet a drop-in backbone for the same trainer
    as NCSN++.

    ADVICE r4 asked for per-sample (H, W) statistics so eval output would be
    independent of eval batch composition; that variant was TRIED in round 5
    and retrained — training plateaued at −16 dB valid SI-SDR where the
    batch-stats version climbs past +3 dB by 3 k steps (runs/sgmse_dcunet_r5
    vs runs/sgmse_dcunet2), so batch statistics are kept deliberately.
    Consequence (documented caveat): eval metrics depend on the eval batch;
    evaluation therefore uses a fixed batch composition (the trainer
    enhances per-file, batch 1, consistently)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(h, name):
            c = h.shape[-1]
            scale = self.param(f"{name}_scale", nn.initializers.ones, (c,))
            bias = self.param(f"{name}_bias", nn.initializers.zeros, (c,))
            axes = tuple(range(h.ndim - 1))
            mean = jnp.mean(h, axis=axes, keepdims=True)
            var = jnp.var(h, axis=axes, keepdims=True)
            return (h - mean) / jnp.sqrt(var + self.eps) * scale + bias

        return bn(x.real, "re") + 1j * bn(x.imag, "im")


class _TembProject(nn.Module):
    """Per-block time-embedding projection (FeatureMapDense equivalent)."""

    out_chan: int
    temb_activation: str = "silu"
    layers: int = 1
    embed_dim: int = 128

    @nn.compact
    def __call__(self, t_embed):
        act = _get_activation(self.temb_activation)
        h = t_embed
        for _ in range(max(0, self.layers - 1)):
            h = _on_reim(act, ComplexDense(self.embed_dim)(h))
        h = ComplexDense(self.out_chan)(h)
        h = _on_reim(act, h)
        return h[:, None, None, :]  # broadcast over (H, W)


class DCUNetEncoderBlock(nn.Module):
    args: tuple  # (in, out, k, s, p, d)
    norm_type: str = "bN"
    activation: str = "leaky_relu"
    embed_dim: Optional[int] = None
    temb_layers: int = 1
    temb_activation: str = "silu"

    @nn.compact
    def __call__(self, x, t_embed, train: bool = False):
        _, out_chan, k, s, p, d = self.args
        y = _ComplexConv(out_chan, k, s, p, d)(x)
        if self.embed_dim is not None and t_embed is not None:
            y = y + _TembProject(out_chan, self.temb_activation, self.temb_layers, self.embed_dim)(t_embed)
        y = _OnReImBatchNorm()(y, train)
        return _on_reim(_get_activation(self.activation), y)


class DCUNetDecoderBlock(nn.Module):
    args: tuple
    norm_type: str = "bN"
    activation: str = "leaky_relu"
    embed_dim: Optional[int] = None
    temb_layers: int = 1
    temb_activation: str = "silu"

    @nn.compact
    def __call__(self, x, t_embed, output_size=None, train: bool = False):
        _, out_chan, k, s, p, d = self.args
        y = _ComplexConvTranspose(out_chan, k, s, p, d)(x, output_size)
        if self.embed_dim is not None and t_embed is not None:
            y = y + _TembProject(out_chan, self.temb_activation, self.temb_layers, self.embed_dim)(t_embed)
        y = _OnReImBatchNorm()(y, train)
        return _on_reim(_get_activation(self.activation), y)


@BackboneRegistry.register("dcunet")
class DCUNet(nn.Module):
    """Complex U-Net (reference ``dcunet.py:165-298``). forward(spec, t):
    spec complex (B, 2, F, T) with (F-1) divisible by the freq stride
    product; time axis padded/trimmed per ``dcunet_fix_length``."""

    dcunet_architecture: str = "DilDCUNet-v2"
    dcunet_time_embedding: str = "gfp"  # gfp | ds | none
    dcunet_temb_layers_global: int = 2
    dcunet_temb_layers_local: int = 1
    dcunet_temb_activation: str = "silu"
    dcunet_time_embedding_complex: bool = False
    dcunet_fix_length: str = "pad"  # pad | trim | none
    dcunet_mask_bound: str = "none"
    dcunet_norm_type: str = "bN"
    dcunet_activation: str = "relu"
    embed_dim: int = 128

    @nn.compact
    def __call__(self, spec: jax.Array, t: jax.Array, train: bool = False):
        input_channels = 2  # complex channels: x_t and y
        conf_encoders, conf_decoders = DCUNET_ARCHITECTURES[self.dcunet_architecture]
        _, *rest = conf_encoders[0]
        encoders_args = ((input_channels, *rest), *conf_encoders[1:])
        decoders_args = conf_decoders
        stride_prod = np.prod([s for _, _, _, s, _, _ in encoders_args], axis=0)

        # --- fix input dims (reference dcunet.py:301-326) ---
        B, C, F, T = spec.shape
        freq_prod, time_prod = int(stride_prod[0]), int(stride_prod[1])
        if (F - 1) % freq_prod:
            raise TypeError(
                f"Input freq {F} must be 1 + multiple of {freq_prod}"
            )
        t_rem = (T - 1) % time_prod
        orig_T = T
        if t_rem:
            if self.dcunet_fix_length == "pad":
                spec = jnp.pad(spec, ((0, 0), (0, 0), (0, 0), (0, time_prod - t_rem)))
            elif self.dcunet_fix_length == "trim":
                spec = spec[..., :T - t_rem]
            else:
                raise TypeError(f"time axis {T} incompatible; set fix_length")

        x = jnp.transpose(spec, (0, 2, 3, 1))  # complex NHWC

        # --- global time embedding ---
        t_embed = None
        if self.dcunet_time_embedding != "none":
            cval = self.dcunet_time_embedding_complex
            if self.dcunet_time_embedding == "gfp":
                t_embed = GaussianFourierProjection(
                    embedding_size=self.embed_dim if cval else self.embed_dim // 2,
                    complex_valued=cval,
                )(t)
            elif self.dcunet_time_embedding == "ds":
                t_embed = DiffusionStepEmbedding(
                    embed_dim_scale=self.embed_dim, complex_valued=cval
                )(t)
            t_embed = t_embed.astype(jnp.complex64)
            act = _get_activation(self.dcunet_temb_activation)
            for _ in range(self.dcunet_temb_layers_global):
                t_embed = _on_reim(act, ComplexDense(self.embed_dim)(t_embed))

        kw = dict(
            norm_type=self.dcunet_norm_type,
            activation=self.dcunet_activation,
            temb_layers=self.dcunet_temb_layers_local,
            temb_activation=self.dcunet_temb_activation,
            embed_dim=self.embed_dim if self.dcunet_time_embedding != "none" else None,
        )

        enc_outs = []
        h = x
        for args in encoders_args:
            h = DCUNetEncoderBlock(args, **kw)(h, t_embed, train)
            enc_outs.append(h)
        for enc_out, args in zip(reversed(enc_outs[:-1]), decoders_args[:-1]):
            h = DCUNetDecoderBlock(args, **kw)(
                h, t_embed, output_size=(enc_out.shape[1], enc_out.shape[2]), train=train
            )
            h = jnp.concatenate([h, enc_out], axis=-1)

        # output layer: plain complex transposed conv, no norm/act
        oc_args = decoders_args[-1]
        out = _ComplexConvTranspose(oc_args[1], oc_args[2], oc_args[3], oc_args[4])(
            h, output_size=(x.shape[1], x.shape[2])
        )
        out = jnp.transpose(out, (0, 3, 1, 2))  # (B, 1, F, T')
        # fix output dims back to the input time length
        if out.shape[-1] < orig_T:
            out = jnp.pad(out, ((0, 0), (0, 0), (0, 0), (0, orig_T - out.shape[-1])))
        return out[..., :orig_T]
