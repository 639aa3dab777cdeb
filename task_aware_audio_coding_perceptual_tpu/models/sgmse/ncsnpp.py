"""NCSN++ score-network backbones (reference ``backbones/ncsnpp.py``,
``ncsnpp_v2.py``, ``ncsnpp_48k.py``).

One parameterized U-Net covers all three registered variants:

- ``ncsnpp``   (``ncsnpp.py:36-419``): forward(x_complex(B,2,F,T), t);
  fir FIR resampling, BigGAN blocks, progressive input_skip/output_skip
  pyramids, attention at freq-resolution 16, output scaled by 1/sigma
  *before* the final 1x1 conv.
- ``ncsnpp_v2`` (``ncsnpp_v2.py:241-247``): forward(x, y, t) with x, y
  complex (B,1,F,T); no sigma scaling (handled by ScoreModel c_* scalings).
- ``ncsnpp_48k`` (``ncsnpp_48k.py``): no attention, no progressive
  pyramids, exposed nf; output conv *before* sigma scaling.

Layout: NHWC internally ((B, F, T, C)); complex tensors at the API like the
reference. Attention triggers when the frequency axis hits
``attn_resolutions`` (reference checks ``h.shape[-2]``, its H==freq).
"""

from __future__ import annotations

import functools
import itertools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from task_aware_audio_coding_perceptual_tpu.models.sgmse import layerspp
from task_aware_audio_coding_perceptual_tpu.models.sgmse.layers import (
    ddpm_conv3x3,
    default_init,
    get_act,
    group_norm,
)
from task_aware_audio_coding_perceptual_tpu.models.sgmse.shared import (
    BackboneRegistry,
    GaussianFourierProjection,
)


class NCSNppBase(nn.Module):
    scale_by_sigma: bool = True
    sigma_scale_before_output: bool = True  # ncsnpp: scale then 1x1 conv
    nonlinearity: str = "swish"
    nf: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    resamp_with_conv: bool = True
    conditional: bool = True
    fir: bool = True
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    skip_rescale: bool = True
    resblock_type: str = "biggan"
    progressive: str = "output_skip"
    progressive_input: str = "input_skip"
    progressive_combine: str = "sum"
    init_scale: float = 0.0
    fourier_scale: float = 16.0
    image_size: int = 256
    dropout: float = 0.0
    centered: bool = True
    num_channels: int = 4  # x.real, x.imag, y.real, y.imag
    out_channels: int = 2
    # None = auto: Pallas flash attention on TPU when the attention
    # sequence is long (H*W >= AttnBlockpp.FLASH_MIN_SEQ); einsum otherwise
    use_flash: "bool | None" = None
    # Rematerialize resblocks: recompute activations in the backward pass
    # instead of storing them. Shrinks both the autodiff HLO (faster remote
    # compile at reference size) and training-time activation memory, for
    # ~1 extra forward of FLOPs per block.
    remat: bool = False

    @nn.compact
    def __call__(self, x4: jax.Array, time_cond: jax.Array, train: bool = False):
        """x4: real NHWC (B, F, T, 4); time_cond: sigma values (B,)."""
        act = get_act(self.nonlinearity)
        nf = self.nf
        num_resolutions = len(self.ch_mult)
        all_resolutions = [self.image_size // (2**i) for i in range(num_resolutions)]
        combine_method = self.progressive_combine.lower()

        block_cls = (
            layerspp.ResnetBlockBigGANpp if self.resblock_type == "biggan"
            else layerspp.ResnetBlockDDPMpp
        )
        block_kw = dict(
            act=act,
            dropout=self.dropout,
            init_scale=self.init_scale,
            skip_rescale=self.skip_rescale,
            temb_dim=nf * 4 if self.conditional else None,
        )
        if self.resblock_type == "biggan":
            block_kw.update(fir=self.fir, fir_kernel=self.fir_kernel)
        if self.remat:
            # static_argnums: `train` (arg 3 of __call__, counting self) is a
            # python bool. Explicit names replicate flax's auto-numbering of
            # the unwrapped class so params stay interchangeable with
            # remat=False (nn.remat would otherwise name scopes
            # "Checkpoint<cls>_N").
            ckpt_cls = nn.remat(block_cls, static_argnums=(3,))
            counter = itertools.count()

            def ResBlock(**kw):
                name = f"{block_cls.__name__}_{next(counter)}"
                return ckpt_cls(name=name, **block_kw, **kw)

        else:
            ResBlock = functools.partial(block_cls, **block_kw)
        # use_flash=None passes through: AttnBlockpp decides per-shape
        # (flash on TPU only when H*W >= FLASH_MIN_SEQ; einsum is faster to
        # compile AND run at the reference 16x16 attention size).
        Attn = functools.partial(
            layerspp.AttnBlockpp, init_scale=self.init_scale,
            skip_rescale=self.skip_rescale, use_flash=self.use_flash,
        )

        # --- time embedding ---
        used_sigmas = time_cond
        temb = GaussianFourierProjection(embedding_size=nf, scale=self.fourier_scale)(
            jnp.log(used_sigmas)
        )
        if self.conditional:
            temb = nn.Dense(nf * 4, kernel_init=default_init())(temb)
            temb = nn.Dense(nf * 4, kernel_init=default_init())(act(temb))
        else:
            temb = None

        x = x4
        if not self.centered:
            x = 2 * x - 1.0

        # --- down path ---
        input_pyramid = x if self.progressive_input != "none" else None
        hs = [ddpm_conv3x3(nf)(x)]
        in_ch = nf
        for i_level in range(num_resolutions):
            for i_block in range(self.num_res_blocks):
                out_ch = nf * self.ch_mult[i_level]
                h = ResBlock(in_ch=in_ch, out_ch=out_ch)(hs[-1], temb, train)
                in_ch = out_ch
                if h.shape[1] in self.attn_resolutions:
                    h = Attn(channels=in_ch)(h)
                hs.append(h)
            if i_level != num_resolutions - 1:
                if self.resblock_type == "ddpm":
                    h = layerspp.Downsample(
                        in_ch=in_ch, with_conv=self.resamp_with_conv,
                        fir=self.fir, fir_kernel=self.fir_kernel,
                    )(hs[-1])
                else:
                    h = ResBlock(in_ch=in_ch, down=True)(hs[-1], temb, train)
                if self.progressive_input == "input_skip":
                    input_pyramid = layerspp.Downsample(
                        fir=self.fir, fir_kernel=self.fir_kernel, with_conv=False
                    )(input_pyramid)
                    h = layerspp.Combine(dim2=in_ch, method=combine_method)(
                        input_pyramid, h
                    )
                    if combine_method == "cat":
                        in_ch *= 2
                elif self.progressive_input == "residual":
                    input_pyramid = layerspp.Downsample(
                        in_ch=input_pyramid.shape[-1], out_ch=in_ch,
                        fir=self.fir, fir_kernel=self.fir_kernel, with_conv=True,
                    )(input_pyramid)
                    if self.skip_rescale:
                        input_pyramid = (input_pyramid + h) / np.sqrt(2.0)
                    else:
                        input_pyramid = input_pyramid + h
                    h = input_pyramid
                hs.append(h)

        h = hs[-1]
        h = ResBlock(in_ch=in_ch)(h, temb, train)
        h = Attn(channels=in_ch)(h)
        h = ResBlock(in_ch=in_ch)(h, temb, train)

        # --- up path ---
        pyramid = None
        for i_level in reversed(range(num_resolutions)):
            for i_block in range(self.num_res_blocks + 1):
                out_ch = nf * self.ch_mult[i_level]
                skip = hs.pop()
                h = ResBlock(in_ch=h.shape[-1] + skip.shape[-1], out_ch=out_ch)(
                    jnp.concatenate([h, skip], axis=-1), temb, train
                )
            if h.shape[1] in self.attn_resolutions:
                h = Attn(channels=h.shape[-1])(h)
            if self.progressive != "none":
                if i_level == num_resolutions - 1:
                    if self.progressive == "output_skip":
                        pyramid = act(group_norm(h.shape[-1])(h))
                        pyramid = ddpm_conv3x3(
                            self.num_channels, init_scale=self.init_scale
                        )(pyramid)
                    elif self.progressive == "residual":
                        pyramid = act(group_norm(h.shape[-1])(h))
                        pyramid = ddpm_conv3x3(h.shape[-1])(pyramid)
                else:
                    if self.progressive == "output_skip":
                        pyramid = layerspp.Upsample(
                            fir=self.fir, fir_kernel=self.fir_kernel, with_conv=False
                        )(pyramid)
                        pyramid_h = act(group_norm(h.shape[-1])(h))
                        pyramid_h = ddpm_conv3x3(
                            self.num_channels, init_scale=self.init_scale
                        )(pyramid_h)
                        pyramid = pyramid + pyramid_h
                    elif self.progressive == "residual":
                        pyramid = layerspp.Upsample(
                            in_ch=pyramid.shape[-1], out_ch=h.shape[-1],
                            fir=self.fir, fir_kernel=self.fir_kernel, with_conv=True,
                        )(pyramid)
                        if self.skip_rescale:
                            pyramid = (pyramid + h) / np.sqrt(2.0)
                        else:
                            pyramid = pyramid + h
                        h = pyramid
            if i_level != 0:
                if self.resblock_type == "ddpm":
                    h = layerspp.Upsample(
                        in_ch=h.shape[-1], with_conv=self.resamp_with_conv,
                        fir=self.fir, fir_kernel=self.fir_kernel,
                    )(h)
                else:
                    h = ResBlock(in_ch=h.shape[-1], up=True)(h, temb, train)

        assert not hs

        if self.progressive == "output_skip":
            h = pyramid
        else:
            h = act(group_norm(h.shape[-1])(h))
            h = ddpm_conv3x3(self.num_channels, init_scale=self.init_scale)(h)

        sig = used_sigmas.reshape(-1, 1, 1, 1)
        if self.scale_by_sigma and self.sigma_scale_before_output:
            h = h / sig
            h = nn.Conv(self.out_channels, (1, 1))(h)
        elif self.scale_by_sigma:
            h = nn.Conv(self.out_channels, (1, 1))(h)
            h = h / sig
        else:
            h = nn.Conv(self.out_channels, (1, 1))(h)
        return h


def _complex_to_channels(xs) -> jax.Array:
    """Complex (B, C, F, T) list -> real NHWC (B, F, T, 2*sum(C))."""
    chans = []
    for x in xs:
        chans.extend([x.real, x.imag])
    stacked = jnp.concatenate(chans, axis=1)  # (B, 2C, F, T)
    return jnp.transpose(stacked, (0, 2, 3, 1))


def _channels_to_complex(h: jax.Array) -> jax.Array:
    """Real NHWC (B, F, T, 2) -> complex (B, 1, F, T)."""
    return (h[..., 0] + 1j * h[..., 1])[:, None, :, :]


@BackboneRegistry.register("ncsnpp")
class NCSNpp(nn.Module):
    """Reference ``ncsnpp.py``: dnn(x_t||y complex (B,2,F,T), t) -> score."""

    nf: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    centered: bool = True
    scale_by_sigma: bool = True
    dropout: float = 0.0
    use_flash: "bool | None" = None
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, time_cond: jax.Array, train: bool = False):
        x4 = _complex_to_channels([x[:, [0]], x[:, [1]]])
        h = NCSNppBase(
            nf=self.nf,
            ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions,
            centered=self.centered,
            scale_by_sigma=self.scale_by_sigma,
            sigma_scale_before_output=True,
            dropout=self.dropout,
            use_flash=self.use_flash,
            remat=self.remat,
        )(x4, time_cond, train)
        return _channels_to_complex(h)


@BackboneRegistry.register("ncsnpp_v2")
class NCSNpp_v2(nn.Module):
    """Reference ``ncsnpp_v2.py``: dnn(x, y, t) with separate complex args;
    no sigma scaling (ScoreModel's c_in/c_out/c_skip handle it)."""

    nf: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.0
    use_flash: "bool | None" = None
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array, t: jax.Array, train: bool = False):
        x4 = _complex_to_channels([x, y])
        h = NCSNppBase(
            nf=self.nf,
            ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions,
            scale_by_sigma=False,
            dropout=self.dropout,
            use_flash=self.use_flash,
            remat=self.remat,
        )(x4, t, train)
        return _channels_to_complex(h)


@BackboneRegistry.register("ncsnpp_48k")
class NCSNpp_48k(nn.Module):
    """Reference ``ncsnpp_48k.py``: no attention, no progressive pyramids,
    output conv before sigma scaling (48 kHz fullband variant)."""

    nf: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 2, 2, 2)
    num_res_blocks: int = 2
    centered: bool = True
    scale_by_sigma: bool = True
    dropout: float = 0.0
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, time_cond: jax.Array, train: bool = False):
        x4 = _complex_to_channels([x[:, [0]], x[:, [1]]])
        h = NCSNppBase(
            nf=self.nf,
            ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=(),
            progressive="none",
            progressive_input="none",
            centered=self.centered,
            scale_by_sigma=self.scale_by_sigma,
            sigma_scale_before_output=False,
            dropout=self.dropout,
            remat=self.remat,
        )(x4, time_cond, train)
        return _channels_to_complex(h)
