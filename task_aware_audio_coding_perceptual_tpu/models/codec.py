"""Neural audio codec: strided causal Conv1d encoder -> RVQ -> decoder.

The north-star codec expression (BASELINE.json) of the reference's
capabilities: the reference compresses spectrograms with an autoencoder +
continuous bottleneck (``pkl_file_models.py``); this model compresses
waveforms with a SoundStream/EnCodec-family architecture re-designed for
TPU:

- layout is (B, T, C) so channels sit on TPU lanes and convs lower to MXU
  matmuls,
- every conv is causal-capable; each module has a ``step`` method carrying
  explicit left-context state, so streaming inference is a ``lax.scan`` over
  chunks with *no host round-trips* (north-star config 3),
- activations: Snake (periodic, per-channel learnable alpha) or ELU.

``encode``/``decode``/``__call__`` mirror the codec API users expect;
quantization is the functional RVQ in ``models/rvq.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    sample_rate: int = 16000
    channels: int = 32  # base channel count
    latent_dim: int = 128
    strides: Tuple[int, ...] = (2, 4, 5, 8)  # total 320x -> 50 Hz at 16 kHz
    dilations: Tuple[int, ...] = (1, 3, 9)
    num_quantizers: int = 8
    codebook_size: int = 1024
    # default elu: snake accumulates a DC offset through depth and blows up
    # activations at init (z std ~40 vs ~1) without its own stabilizers
    activation: str = "elu"  # "snake" | "elu"
    causal: bool = True
    dtype: str = "float32"
    upsample_mode: str = "transpose"  # "transpose" | "subpixel"
    weight_norm: bool = True  # weight-normalized convs (EnCodec/BigVGAN style)
    # EnCodec-style causal LSTM at the bottleneck (0 = off). Applied with a
    # residual skip at latent rate (50 Hz) on both the encoder output and the
    # decoder input; gives the codec temporal context beyond the conv
    # receptive field while staying streaming-causal (VERDICT r4 item 2's
    # "temporal module" capacity lever).
    # CAVEAT (measured on the axon remote compiler): the LSTM's time-scan
    # nested inside a K-step training scan (make_train_multistep) compiles
    # pathologically slowly; train LSTM configs with steps_per_call=1, or
    # prefer ``bottleneck_blocks`` below, which provides the same
    # temporal-context capacity scan-free.
    lstm_layers: int = 0
    # Scan-free temporal module: N dilated-conv residual stacks at the
    # latent rate (dilations ``dilations`` per stack, kernel 7). With the
    # default (1, 3, 9) each stack adds 78 latent frames (~1.6 s at 50 Hz)
    # of causal receptive field — the temporal-context role of EnCodec's
    # LSTM expressed as MXU-friendly convs that nest safely under the
    # multistep training scan.
    bottleneck_blocks: int = 0

    @property
    def hop(self) -> int:
        return int(np.prod(self.strides))

    @property
    def frame_rate(self) -> float:
        return self.sample_rate / self.hop

    @property
    def bits_per_frame(self) -> int:
        return self.num_quantizers * int(np.log2(self.codebook_size))

    @property
    def bitrate(self) -> float:
        return self.frame_rate * self.bits_per_frame


class Snake(nn.Module):
    """Snake activation x + sin^2(a*x)/a with per-channel learnable alpha."""

    features: int

    @nn.compact
    def __call__(self, x):
        log_alpha = self.param("log_alpha", nn.initializers.zeros, (self.features,))
        alpha = jnp.exp(log_alpha)
        return x + jnp.sin(alpha * x) ** 2 / (alpha + 1e-9)


def _act(name: str, features: int):
    if name == "snake":
        return Snake(features)
    elif name == "elu":
        return nn.elu
    raise ValueError(f"Unknown activation {name}")


class CausalConv(nn.Module):
    """1-D conv over (B, T, C); causal left padding; streaming ``step``."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    dtype: object = jnp.float32
    weight_norm: bool = False

    @property
    def context(self) -> int:
        return (self.kernel_size - 1) * self.dilation

    def setup(self):
        conv = nn.Conv(
            self.features,
            (self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
            dtype=self.dtype,
        )
        self.conv = nn.WeightNorm(conv) if self.weight_norm else conv

    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (self.context, 0), (0, 0)))
        return self.conv(x)

    def init_state(self, batch: int, in_features: int, dtype=jnp.float32):
        return jnp.zeros((batch, self.context, in_features), dtype)

    def step(self, x, state):
        z = jnp.concatenate([state, x], axis=1)
        y = self.conv(z)
        new_state = z[:, z.shape[1] - self.context :, :] if self.context else state
        return y, new_state


class CausalConvTranspose(nn.Module):
    """Causal transposed conv: output trimmed to T*stride; streaming carries
    the (kernel - stride)-sample overlap-add tail."""

    features: int
    stride: int
    dtype: object = jnp.float32
    weight_norm: bool = False

    @property
    def kernel_size(self) -> int:
        return 2 * self.stride

    @property
    def tail(self) -> int:
        return self.kernel_size - self.stride

    def setup(self):
        conv = nn.ConvTranspose(
            self.features,
            (self.kernel_size,),
            strides=(self.stride,),
            padding="VALID",
            dtype=self.dtype,
        )
        self.conv = nn.WeightNorm(conv) if self.weight_norm else conv

    def __call__(self, x):
        y = self.conv(x)  # (B, T*s + tail, C)
        return y[:, : x.shape[1] * self.stride, :]

    def init_state(self, batch: int, dtype=jnp.float32):
        return jnp.zeros((batch, self.tail, self.features), dtype)

    def step(self, x, state):
        y = self.conv(x)  # (B, Tc*s + tail, C)
        emit = x.shape[1] * self.stride
        y = y.at[:, : self.tail, :].add(state)
        return y[:, :emit, :], y[:, emit:, :]


class CausalSubpixelUpsample(nn.Module):
    """Causal conv to stride*features channels + depth-to-space reshape.

    Same (B, T, C) -> (B, T*stride, features) contract as
    :class:`CausalConvTranspose`, but lowered as a *regular* conv — a far
    better MXU mapping than XLA's lhs-dilated transposed conv (measured
    ~35% faster decoder on v5e). Streaming state is just the conv's
    left context.
    """

    features: int
    stride: int
    kernel_size: int = 3
    dtype: object = jnp.float32
    weight_norm: bool = False

    def setup(self):
        self.conv = CausalConv(
            self.features * self.stride, self.kernel_size, dtype=self.dtype,
            weight_norm=self.weight_norm,
        )

    def __call__(self, x):
        y = self.conv(x)  # (B, T, s*F)
        B, T, _ = y.shape
        return y.reshape(B, T * self.stride, self.features)

    def init_state(self, batch: int, in_features: int, dtype=jnp.float32):
        return self.conv.init_state(batch, in_features, dtype)

    def step(self, x, state):
        y, ns = self.conv.step(x, state)
        B, T, _ = y.shape
        return y.reshape(B, T * self.stride, self.features), ns


class LSTMLayer(nn.Module):
    """One causal LSTM layer over (B, T, D) with a residual skip.

    TPU-shaped: the input projection for ALL four gates over ALL time steps
    is one big (B*T, D) x (D, 4D) matmul outside the recurrence (MXU), so the
    ``lax.scan`` body carries only the tiny h @ W_hh matmul. The recurrent
    kernel is captured as a plain array in the scan closure — no module calls
    inside the scan body. Forget-gate bias starts at +1 (standard LSTM init).
    """

    dim: int
    dtype: object = jnp.float32

    def setup(self):
        self.wx = nn.Dense(4 * self.dim, dtype=self.dtype)
        self.wh = self.param(
            "wh", nn.initializers.orthogonal(), (self.dim, 4 * self.dim)
        )

    def _scan(self, gx, h0, c0):
        wh = self.wh.astype(gx.dtype)

        def body(carry, g_t):
            h, c = carry
            gates = g_t + h @ wh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c2 = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
            return (h2, c2), h2

        (h, c), ys = jax.lax.scan(body, (h0, c0), jnp.swapaxes(gx, 0, 1))
        return jnp.swapaxes(ys, 0, 1), (h, c)

    def __call__(self, x):
        gx = self.wx(x)
        zeros = jnp.zeros((x.shape[0], self.dim), gx.dtype)
        ys, _ = self._scan(gx, zeros, zeros)
        return x + ys

    def init_state(self, batch: int, dtype=jnp.float32):
        return (jnp.zeros((batch, self.dim), dtype),
                jnp.zeros((batch, self.dim), dtype))

    def step(self, x, state):
        gx = self.wx(x)
        h0, c0 = (s.astype(gx.dtype) for s in state)
        ys, new_state = self._scan(gx, h0, c0)
        return x + ys, new_state


class CausalLSTM(nn.Module):
    """Stack of residual causal LSTM layers (EnCodec bottleneck module)."""

    dim: int
    layers: int
    dtype: object = jnp.float32

    def setup(self):
        self.cells = [LSTMLayer(self.dim, dtype=self.dtype)
                      for _ in range(self.layers)]

    def __call__(self, x):
        for cell in self.cells:
            x = cell(x)
        return x

    def init_state(self, batch: int, dtype=jnp.float32):
        return tuple(c.init_state(batch, dtype) for c in self.cells)

    def step(self, x, state):
        new = []
        for cell, s in zip(self.cells, state):
            x, ns = cell.step(x, s)
            new.append(ns)
        return x, tuple(new)


class ResidualUnit(nn.Module):
    """dilated conv k=7 -> act -> conv k=1, residual add (SoundStream-style)."""

    dim: int
    dilation: int
    activation: str = "snake"
    dtype: object = jnp.float32
    weight_norm: bool = False

    def setup(self):
        self.act1 = _act(self.activation, self.dim)
        self.conv1 = CausalConv(self.dim, 7, dilation=self.dilation, dtype=self.dtype,
                                weight_norm=self.weight_norm)
        self.act2 = _act(self.activation, self.dim)
        self.conv2 = CausalConv(self.dim, 1, dtype=self.dtype, weight_norm=self.weight_norm)

    def __call__(self, x):
        h = self.conv1(self.act1(x))
        h = self.conv2(self.act2(h))
        return x + h

    def init_state(self, batch: int):
        # unit inputs are activations in the compute dtype
        return (self.conv1.init_state(batch, self.dim, dtype=self.dtype),)

    def step(self, x, state):
        h, s1 = self.conv1.step(self.act1(x), state[0])
        h = self.conv2(self.act2(h))  # k=1: stateless
        return x + h, (s1,)


class EncoderBlock(nn.Module):
    out_dim: int
    stride: int
    dilations: Sequence[int]
    activation: str = "snake"
    dtype: object = jnp.float32
    weight_norm: bool = False

    def setup(self):
        in_dim = self.out_dim // 2
        self.units = [
            ResidualUnit(in_dim, d, self.activation, dtype=self.dtype,
                         weight_norm=self.weight_norm)
            for d in self.dilations
        ]
        self.act = _act(self.activation, in_dim)
        self.down = CausalConv(
            self.out_dim, 2 * self.stride, stride=self.stride, dtype=self.dtype,
            weight_norm=self.weight_norm,
        )

    def __call__(self, x):
        for u in self.units:
            x = u(x)
        return self.down(self.act(x))

    def init_state(self, batch: int):
        in_dim = self.out_dim // 2
        return (
            tuple(u.init_state(batch) for u in self.units),
            self.down.init_state(batch, in_dim, dtype=self.dtype),
        )

    def step(self, x, state):
        ustates, dstate = state
        new_ustates = []
        for u, s in zip(self.units, ustates):
            x, ns = u.step(x, s)
            new_ustates.append(ns)
        y, nd = self.down.step(self.act(x), dstate)
        return y, (tuple(new_ustates), nd)


class DecoderBlock(nn.Module):
    out_dim: int
    stride: int
    dilations: Sequence[int]
    activation: str = "snake"
    dtype: object = jnp.float32
    upsample_mode: str = "transpose"
    weight_norm: bool = False

    def setup(self):
        self.act = _act(self.activation, self.out_dim * 2)
        if self.upsample_mode == "subpixel":
            self.up = CausalSubpixelUpsample(self.out_dim, self.stride, dtype=self.dtype,
                                             weight_norm=self.weight_norm)
        else:
            self.up = CausalConvTranspose(self.out_dim, self.stride, dtype=self.dtype,
                                          weight_norm=self.weight_norm)
        self.units = [
            ResidualUnit(self.out_dim, d, self.activation, dtype=self.dtype,
                         weight_norm=self.weight_norm)
            for d in self.dilations
        ]

    def __call__(self, x):
        x = self.up(self.act(x))
        for u in self.units:
            x = u(x)
        return x

    def init_state(self, batch: int):
        if self.upsample_mode == "subpixel":
            up_state = self.up.init_state(batch, self.out_dim * 2, dtype=self.dtype)
        else:
            up_state = self.up.init_state(batch, dtype=self.dtype)
        return (
            up_state,
            tuple(u.init_state(batch) for u in self.units),
        )

    def step(self, x, state):
        ustate, rstates = state
        x, nu = self.up.step(self.act(x), ustate)
        new_r = []
        for u, s in zip(self.units, rstates):
            x, ns = u.step(x, s)
            new_r.append(ns)
        return x, (nu, tuple(new_r))


class CodecEncoder(nn.Module):
    config: CodecConfig

    def setup(self):
        cfg = self.config
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        wn = cfg.weight_norm
        self.stem = CausalConv(cfg.channels, 7, dtype=dt, weight_norm=wn)
        dims = [cfg.channels * 2 ** (i + 1) for i in range(len(cfg.strides))]
        self.blocks = [
            EncoderBlock(dims[i], cfg.strides[i], cfg.dilations, cfg.activation, dtype=dt,
                         weight_norm=wn)
            for i in range(len(cfg.strides))
        ]
        self.final_act = _act(cfg.activation, dims[-1])
        self.head = CausalConv(cfg.latent_dim, 3, dtype=dt, weight_norm=wn)
        if cfg.bottleneck_blocks:
            self.bneck = [
                ResidualUnit(cfg.latent_dim, d, cfg.activation, dtype=dt,
                             weight_norm=wn)
                for _ in range(cfg.bottleneck_blocks)
                for d in cfg.dilations
            ]
        if cfg.lstm_layers:
            self.lstm = CausalLSTM(cfg.latent_dim, cfg.lstm_layers, dtype=dt)

    def __call__(self, x):
        """x: (B, T, 1) waveform -> (B, T/hop, latent_dim)."""
        h = self.stem(x)
        for b in self.blocks:
            h = b(h)
        z = self.head(self.final_act(h))
        if self.config.bottleneck_blocks:
            for u in self.bneck:
                z = u(z)
        if self.config.lstm_layers:
            z = self.lstm(z)
        return z

    def init_state(self, batch: int):
        cfg = self.config
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        dims = [cfg.channels * 2 ** (i + 1) for i in range(len(cfg.strides))]
        state = (
            self.stem.init_state(batch, 1),  # waveform input stays f32
            tuple(b.init_state(batch) for b in self.blocks),
            self.head.init_state(batch, dims[-1], dtype=dt),
        )
        if cfg.bottleneck_blocks:
            state = state + (tuple(u.init_state(batch) for u in self.bneck),)
        if cfg.lstm_layers:
            state = state + (self.lstm.init_state(batch, dtype=dt),)
        return state

    def step(self, x, state):
        stem_s, block_s, head_s = state[0], state[1], state[2]
        h, ns = self.stem.step(x, stem_s)
        new_b = []
        for b, s in zip(self.blocks, block_s):
            h, nb = b.step(h, s)
            new_b.append(nb)
        y, nh = self.head.step(self.final_act(h), head_s)
        out = (ns, tuple(new_b), nh)
        i = 3
        if self.config.bottleneck_blocks:
            new_u = []
            for u, s in zip(self.bneck, state[i]):
                y, nu = u.step(y, s)
                new_u.append(nu)
            out = out + (tuple(new_u),)
            i += 1
        if self.config.lstm_layers:
            y, nl = self.lstm.step(y, state[i])
            out = out + (nl,)
        return y, out


class CodecDecoder(nn.Module):
    config: CodecConfig

    def setup(self):
        cfg = self.config
        rs = list(reversed(cfg.strides))
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        wn = cfg.weight_norm
        dims = [cfg.channels * 2 ** (len(cfg.strides) - i - 1) for i in range(len(rs))]
        if cfg.lstm_layers:
            self.lstm = CausalLSTM(cfg.latent_dim, cfg.lstm_layers, dtype=dt)
        if cfg.bottleneck_blocks:
            self.bneck = [
                ResidualUnit(cfg.latent_dim, d, cfg.activation, dtype=dt,
                             weight_norm=wn)
                for _ in range(cfg.bottleneck_blocks)
                for d in cfg.dilations
            ]
        self.stem = CausalConv(dims[0] * 2, 7, dtype=dt, weight_norm=wn)
        self.blocks = [
            DecoderBlock(dims[i], rs[i], cfg.dilations, cfg.activation, dtype=dt,
                         upsample_mode=cfg.upsample_mode, weight_norm=wn)
            for i in range(len(rs))
        ]
        self.final_act = _act(cfg.activation, dims[-1])
        self.head = CausalConv(1, 7, dtype=dt, weight_norm=wn)

    def __call__(self, z):
        """z: (B, F, latent_dim) -> (B, F*hop, 1)."""
        if self.config.lstm_layers:
            z = self.lstm(z)
        if self.config.bottleneck_blocks:
            for u in self.bneck:
                z = u(z)
        h = self.stem(z)
        for b in self.blocks:
            h = b(h)
        return self.head(self.final_act(h)).astype(jnp.float32)

    def init_state(self, batch: int):
        cfg = self.config
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        dims = [cfg.channels * 2 ** (len(cfg.strides) - i - 1) for i in range(len(cfg.strides))]
        state = (
            self.stem.init_state(batch, cfg.latent_dim),  # latents arrive f32
            tuple(b.init_state(batch) for b in self.blocks),
            self.head.init_state(batch, dims[-1], dtype=dt),
        )
        if cfg.bottleneck_blocks:
            state = state + (tuple(u.init_state(batch) for u in self.bneck),)
        if cfg.lstm_layers:
            state = state + (self.lstm.init_state(batch, dtype=dt),)
        return state

    def step(self, z, state):
        stem_s, block_s, head_s = state[0], state[1], state[2]
        i = 3
        new_u = new_l = None
        if self.config.lstm_layers:
            # lstm state sits last in the tuple regardless of bneck presence
            z, new_l = self.lstm.step(z, state[-1])
        if self.config.bottleneck_blocks:
            us = []
            for u, s in zip(self.bneck, state[i]):
                z, nu = u.step(z, s)
                us.append(nu)
            new_u = tuple(us)
            i += 1
        h, ns = self.stem.step(z, stem_s)
        new_b = []
        for b, s in zip(self.blocks, block_s):
            h, nb = b.step(h, s)
            new_b.append(nb)
        y, nh = self.head.step(self.final_act(h), head_s)
        out = (ns, tuple(new_b), nh)
        if new_u is not None:
            out = out + (new_u,)
        if new_l is not None:
            out = out + (new_l,)
        return y.astype(jnp.float32), out


class NeuralAudioCodec(nn.Module):
    """Encoder+decoder pair; quantization is applied functionally outside
    (see ``models/rvq.py``) so codes stay an explicit, serializable artifact."""

    config: CodecConfig

    def setup(self):
        self.encoder = CodecEncoder(self.config)
        self.decoder = CodecDecoder(self.config)

    def __call__(self, x):
        z = self.encoder(x)
        return self.decoder(z)

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)

    def encoder_state(self, batch: int):
        return self.encoder.init_state(batch)

    def decoder_state(self, batch: int):
        return self.decoder.init_state(batch)

    def encode_step(self, x, state):
        return self.encoder.step(x, state)

    def decode_step(self, z, state):
        return self.decoder.step(z, state)
