"""Headline benchmark: real-time encode+decode streams per TPU chip at 16 kHz.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

North star (BASELINE.json): >=1000x real-time encode+decode per v5e chip at
16 kHz, so vs_baseline = streams / 1000.

Measurement notes: this environment reaches the TPU through a relay whose
per-call latency (~35-50 ms, including device->host transfer) would swamp a
naive timing loop, and block_until_ready does not reliably fence prior
dispatches. Throughput is therefore measured *differentially*: time calls at
two audio lengths (1 s and 10 s per stream) with a forced output transfer,
and divide the extra wall time by the extra audio — fixed relay overhead
cancels, leaving pure device throughput.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, sync, iters=3):
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from task_aware_audio_coding_perceptual_tpu.models import rvq as rvq_lib
    from task_aware_audio_coding_perceptual_tpu.models.codec import (
        CodecConfig,
        NeuralAudioCodec,
    )

    # bench the shipped artifact's config: the quality floor test pins its
    # channel width (and bottleneck LSTM depth), so the throughput claim must
    # hold at the same capacity
    channels = CodecConfig().channels
    lstm_layers = bneck = 0
    try:
        z = np.load("tests/golden/codec_8q_params.npz")
        if "config_channels" in z.files:
            channels = int(z["config_channels"])
        if "config_lstm_layers" in z.files:
            lstm_layers = int(z["config_lstm_layers"])
        if "config_bottleneck_blocks" in z.files:
            bneck = int(z["config_bottleneck_blocks"])
    except Exception:
        pass
    config = CodecConfig(dtype="bfloat16", channels=channels,
                         lstm_layers=lstm_layers,
                         bottleneck_blocks=bneck)  # MXU-friendly
    model = NeuralAudioCodec(config)

    batch = 256  # concurrent streams per call (batch is the utilization lever on v5e)
    # jitted init: eager init dispatches per-op through the relay (minutes)
    params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, config.hop * 2, 1)))
    rvq_state = rvq_lib.init_rvq(
        jax.random.key(1), config.num_quantizers, config.codebook_size, config.latent_dim
    )

    @jax.jit
    def roundtrip(params, rvq_state, wav):
        z = model.apply(params, wav, method=NeuralAudioCodec.encode)
        q = rvq_lib.quantize(rvq_state, z)
        return model.apply(params, q.quantized, method=NeuralAudioCodec.decode)

    def sync(y):
        np.asarray(y[0, 0, 0])  # transfer forces completion

    rng = np.random.default_rng(0)
    walls = {}
    secs = {"short": 1.0, "long": 10.0}
    for name, s in secs.items():
        T = int(config.sample_rate * s)
        T -= T % config.hop
        wav = jnp.asarray(rng.standard_normal((batch, T, 1)).astype(np.float32))
        sync(roundtrip(params, rvq_state, wav))  # compile + warm
        walls[name] = _timed(lambda: roundtrip(params, rvq_state, wav), sync)

    extra_audio = batch * (secs["long"] - secs["short"])
    per_audio_second = (walls["long"] - walls["short"]) / extra_audio
    streams = 1.0 / per_audio_second

    print(
        json.dumps(
            {
                "metric": "rt_encode_decode_streams_per_chip_16khz",
                "value": round(streams, 1),
                "unit": "streams (x real-time)",
                "vs_baseline": round(streams / 1000.0, 3),
            }
        ),
        flush=True,
    )

    # MFU denominator for the headline (VERDICT r4 weak #2): analytic conv
    # FLOPs of the roundtrip / measured device time / chip peak. The width
    # sweep in results/codec_width_sweep.json carries the full idle-chip
    # story (ch32 7609x @ 30% MFU, ch48 4133x @ 37%, ch64 2793x @ 44%:
    # throughput tracks FLOPs, utilization rises with width).
    try:
        from scripts.bench_width_sweep import PEAK_FLOPS, codec_flops_per_sample

        flops_per_audio_s = codec_flops_per_sample(config) * config.sample_rate
        mfu = flops_per_audio_s * streams / PEAK_FLOPS[config.dtype]
        print(
            json.dumps(
                {
                    "metric": "codec_roundtrip_mfu",
                    "value": round(mfu, 4),
                    "unit": "fraction_of_peak_bf16",
                    "channels": config.channels,
                    "lstm_layers": config.lstm_layers,
                    "gflops_per_audio_s": round(flops_per_audio_s / 1e9, 2),
                }
            ),
            flush=True,
        )
    except Exception as e:
        print(json.dumps({"metric": "codec_roundtrip_mfu", "error": repr(e)}))

    try:
        enhance_rtf()
    except Exception as e:  # enhance RTF is a secondary metric; never let it
        print(json.dumps({"metric": "enhance_rtf", "error": repr(e)}))  # kill the headline


def enhance_rtf(n_steps: int = 30, seconds: float = 2.0):
    """Enhancement real-time factor (wall s / audio s), reference hook
    ``sgmse/sgmse/model.py:461-463``. Two lines: the small backbone the r3
    driver captured, then the REFERENCE-size backbone (nf=128, ch_mult
    (1,1,2,2,2,2,2), ``sgmse/sgmse/backbones/ncsnpp.py:50-72``) LAST so the
    driver's parsed headline is the honest reference-size number
    (VERDICT r3 weak #5)."""
    from task_aware_audio_coding_perceptual_tpu.models.sgmse.score_model import (
        ScoreModel,
        ScoreModelConfig,
    )

    sizes = (
        ("small", 32, (1, 1, 2), 1),
        ("reference", 128, (1, 1, 2, 2, 2, 2, 2), 2),
    )
    for label, nf, ch_mult, nrb in sizes:
        cfg = ScoreModelConfig(
            backbone="ncsnpp",
            backbone_kwargs=(("nf", nf), ("ch_mult", ch_mult),
                             ("num_res_blocks", nrb),
                             ("attn_resolutions", (16,))),
        )
        model = ScoreModel(cfg)
        state = model.init(jax.random.key(0), spec_shape=(1, 1, 256, 64))
        rng = np.random.default_rng(0)
        noisy = rng.standard_normal(int(16000 * seconds)).astype(np.float32) * 0.1
        _ = model.enhance(state.ema_params, jnp.asarray(noisy),
                          key=jax.random.key(1), N=n_steps)
        walls = []
        for r in range(3):
            t0 = time.perf_counter()
            x_hat = model.enhance(
                state.ema_params, jnp.asarray(noisy), key=jax.random.key(2 + r),
                N=n_steps,
            )
            walls.append(time.perf_counter() - t0)
        rtf = min(walls) / (len(noisy) / 16000.0)
        assert np.isfinite(x_hat).all()
        print(
            json.dumps(
                {
                    "metric": "enhance_rtf",
                    "value": round(rtf, 4),
                    "unit": "wall_s_per_audio_s",
                    "n_steps": n_steps,
                    "backbone": label,
                    "backbone_nf": nf,
                    "vs_baseline": round(1.0 / rtf, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
