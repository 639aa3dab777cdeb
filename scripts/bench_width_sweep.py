"""Idle-chip codec throughput sweep over channel widths + analytic MFU.

VERDICT r4 weak #2 / item 3: the official throughput record moved with the
flagship artifact's width (ch32 -> ch48) and nobody could say whether the
measured streams/chip is 10% or 60% of the chip. This script measures the
differential round-trip throughput (same protocol as bench.py) at several
widths on an idle chip and divides by an analytic FLOP count of the
encode+decode graph to report MFU.

Run solo (no concurrent TPU/CPU jobs):
    python scripts/bench_width_sweep.py --channels 32 48 64
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# v5e peak: 394 TFLOP/s bf16, 197 TFLOP/s fp32 (public TPU v5e spec).
PEAK_FLOPS = {"bfloat16": 394e12, "float32": 197e12}


def codec_flops_per_sample(config) -> float:
    """Analytic MAC*2 count of encode+decode for ONE audio sample (16 kHz).

    Counts the conv stacks (the FLOP carriers); elementwise/act/norm ops are
    ignored (<1% of MACs). Derived from models/codec.py structure:
    encoder = stem conv(1->C,k7) + per-stride block [3 residual units
    (2 convs each, k7 dil + k1) + downsample conv (C->2C, k=2*stride)] +
    final conv(C_top->latent,k3); decoder mirrors with transposed convs.
    """
    C = config.channels
    L = config.latent_dim
    n_units = len(config.dilations)
    total = 0.0  # MACs per input sample

    def conv_macs(cin, cout, k, rate_frac):
        # one output point costs cin*k MACs per output channel;
        # rate_frac = output points per input sample
        return cin * cout * k * rate_frac

    # ---- encoder ----
    rate = 1.0  # feature points per input sample at the current stage
    c = C
    total += conv_macs(1, C, 7, 1.0)  # stem
    for s in config.strides:
        # residual units run at in_dim = c (k7 dilated + k1)
        total += n_units * (conv_macs(c, c, 7, rate) + conv_macs(c, c, 1, rate))
        rate /= s
        total += conv_macs(c, 2 * c, 2 * s, rate)  # strided downsample
        c *= 2
    total += conv_macs(c, L, 3, rate)  # latent head (16C -> latent)
    if getattr(config, "lstm_layers", 0):
        # one LSTM step: 4 gates x (x-matmul + h-matmul), both dim L
        total += 2 * config.lstm_layers * (4 * (L * L + L * L)) * rate
    if getattr(config, "bottleneck_blocks", 0):
        # residual units at latent rate, enc + dec sides
        total += 2 * config.bottleneck_blocks * n_units * (
            conv_macs(L, L, 7, rate) + conv_macs(L, L, 1, rate))
    # ---- decoder ----
    total += conv_macs(L, c, 7, rate)  # decoder stem (latent -> 16C)
    for s in reversed(config.strides):
        out = c // 2
        # transposed conv in=c -> out=c//2, k=2s, output at rate*s
        total += conv_macs(c, out, 2 * s, rate * s)
        rate *= s
        c = out
        total += n_units * (conv_macs(c, c, 7, rate) + conv_macs(c, c, 1, rate))
    total += conv_macs(C, 1, 7, 1.0)  # waveform head
    return 2.0 * total  # MACs -> FLOPs


def measure(channels: int, dtype: str, batch: int = 256, lstm_layers: int = 0):
    from task_aware_audio_coding_perceptual_tpu.models import rvq as rvq_lib
    from task_aware_audio_coding_perceptual_tpu.models.codec import (
        CodecConfig,
        NeuralAudioCodec,
    )

    kw = {"dtype": dtype, "channels": channels}
    if lstm_layers:
        kw["lstm_layers"] = lstm_layers
    config = CodecConfig(**kw)
    model = NeuralAudioCodec(config)
    params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, config.hop * 2, 1)))
    rvq_state = rvq_lib.init_rvq(
        jax.random.key(1), config.num_quantizers, config.codebook_size,
        config.latent_dim,
    )

    @jax.jit
    def roundtrip(params, rvq_state, wav):
        z = model.apply(params, wav, method=NeuralAudioCodec.encode)
        q = rvq_lib.quantize(rvq_state, z)
        return model.apply(params, q.quantized, method=NeuralAudioCodec.decode)

    def sync(y):
        np.asarray(y[0, 0, 0])

    rng = np.random.default_rng(0)
    walls = {}
    for name, s in {"short": 1.0, "long": 10.0}.items():
        T = int(config.sample_rate * s)
        T -= T % config.hop
        wav = jnp.asarray(rng.standard_normal((batch, T, 1)).astype(np.float32))
        sync(roundtrip(params, rvq_state, wav))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(roundtrip(params, rvq_state, wav))
            best = min(best, time.perf_counter() - t0)
        walls[name] = best

    extra_audio = batch * 9.0
    per_audio_second = (walls["long"] - walls["short"]) / extra_audio
    streams = 1.0 / per_audio_second
    flops_per_audio_s = codec_flops_per_sample(config) * config.sample_rate
    achieved = flops_per_audio_s * streams
    mfu = achieved / PEAK_FLOPS[dtype]
    return {
        "channels": channels,
        "lstm_layers": lstm_layers,
        "dtype": dtype,
        "streams_x_rt": round(streams, 1),
        "gflops_per_audio_s": round(flops_per_audio_s / 1e9, 2),
        "achieved_tflops": round(achieved / 1e12, 2),
        "mfu": round(mfu, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, nargs="+", default=[32, 48])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--lstm", type=int, default=0)
    ap.add_argument("--out", default="results/codec_width_sweep.json")
    args = ap.parse_args()
    rows = []
    for c in args.channels:
        r = measure(c, args.dtype, lstm_layers=args.lstm)
        print(json.dumps(r), flush=True)
        rows.append(r)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    existing = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    keyf = lambda r: (r["channels"], r["lstm_layers"], r["dtype"])
    merged = {keyf(r): r for r in existing}
    merged.update({keyf(r): r for r in rows})
    with open(args.out, "w") as f:
        json.dump(sorted(merged.values(), key=keyf), f, indent=2)


if __name__ == "__main__":
    main()
