"""Streaming-latency benchmark (BASELINE config 3): causal encode -> RVQ ->
decode of 20 ms chunks as one compiled scan, reporting per-chunk device time
(must be << 20 ms for real-time) and the streaming RTF.

Measured differentially (two stream lengths) to cancel relay overhead, like
``bench.py``.

    python scripts/bench_streaming.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from task_aware_audio_coding_perceptual_tpu.models import rvq as rvq_lib
    from task_aware_audio_coding_perceptual_tpu.models import streaming
    from task_aware_audio_coding_perceptual_tpu.models.codec import (
        CodecConfig,
        NeuralAudioCodec,
    )

    config = CodecConfig(dtype="bfloat16")
    model = NeuralAudioCodec(config)
    chunk = config.hop  # 320 samples = 20 ms at 16 kHz = 1 latent frame
    batch = 1  # single-stream latency

    params = model.init(jax.random.key(0), jnp.zeros((1, config.hop * 2, 1)))
    rvq_state = rvq_lib.init_rvq(
        jax.random.key(1), config.num_quantizers, config.codebook_size, config.latent_dim
    )

    def run(wav):
        y, codes = streaming.streaming_roundtrip(model, params, rvq_state, wav, chunk=chunk)
        return jnp.sum(y)

    run_j = jax.jit(run)

    def timed(T, iters=3):
        wav = jnp.asarray(
            np.random.default_rng(0).standard_normal((batch, T, 1)).astype(np.float32)
        )
        float(run_j(wav))  # compile+warm
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            float(run_j(wav))
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = timed(config.hop * 50)  # 1 s
    t_long = timed(config.hop * 250)  # 5 s
    n_extra_chunks = 200
    per_chunk = (t_long - t_short) / n_extra_chunks
    chunk_ms = chunk / config.sample_rate * 1e3
    print(
        f"streaming per-chunk device time: {per_chunk*1e3:.3f} ms "
        f"for {chunk_ms:.0f} ms chunks -> streaming RTF {per_chunk/(chunk/config.sample_rate):.4f} "
        f"({(chunk/config.sample_rate)/per_chunk:,.1f}x real-time single stream)"
    )


if __name__ == "__main__":
    main()
