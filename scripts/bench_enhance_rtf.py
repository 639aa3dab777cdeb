"""SGMSE enhancement real-time-factor benchmark on the real TPU chip.

The reference's RTF hook times ``ScoreModel.enhance`` end-to-end
(``sgmse/sgmse/model.py:461-463``: wall seconds / audio seconds). This
script reproduces that measurement for the TPU build: N=30
predictor-corrector reverse-diffusion steps on a fixed 2-s utterance,
first call = compile (reported separately), subsequent calls hit the
jitted-sampler cache (``score_model.py`` ``_sampler_cache``).

Usage:
    python scripts/bench_enhance_rtf.py [--nf 32] [--n 30] [--reps 3] \
        [--seconds 2.0] [--full]   # --full uses the reference-size backbone

Prints one JSON line: {"metric": "enhance_rtf", ...} — RTF < 1 is faster
than real time.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nf", type=int, default=32, help="backbone base width")
    p.add_argument("--n", type=int, default=30, help="reverse-diffusion steps")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--full", action="store_true",
                   help="reference-size NCSN++ (nf=128, ch_mult 1,1,2,2,2,2,2)")
    args = p.parse_args()

    import jax
    from task_aware_audio_coding_perceptual_tpu.data import speech_synth
    from task_aware_audio_coding_perceptual_tpu.models.sgmse.score_model import (
        ScoreModel,
        ScoreModelConfig,
    )

    if args.full:
        bk = (("nf", 128), ("ch_mult", (1, 1, 2, 2, 2, 2, 2)),
              ("num_res_blocks", 2), ("attn_resolutions", (16,)))
    else:
        bk = (("nf", args.nf), ("ch_mult", (1, 1, 2)), ("num_res_blocks", 1),
              ("attn_resolutions", (16,)))
    cfg = ScoreModelConfig(backbone="ncsnpp", backbone_kwargs=bk)
    model = ScoreModel(cfg)

    noisy = speech_synth.synthesize_utterance(
        np.random.default_rng(0), duration=args.seconds, sr=16000
    )
    noisy = noisy + 0.05 * np.random.default_rng(1).standard_normal(len(noisy)).astype(
        np.float32
    )

    t0 = time.time()
    state = model.init(jax.random.key(0), spec_shape=(1, 1, 256, 64))
    jax.block_until_ready(state.params)
    init_s = time.time() - t0
    print(f"# init {init_s:.1f}s (backbone {'full' if args.full else args.nf})",
          file=sys.stderr)

    # first call compiles the sampler
    t0 = time.time()
    _ = model.enhance(state.ema_params, noisy, key=jax.random.key(1), N=args.n)
    compile_s = time.time() - t0
    print(f"# first enhance (compile) {compile_s:.1f}s", file=sys.stderr)

    # steady-state: cached jitted sampler
    times = []
    for r in range(args.reps):
        t0 = time.time()
        x_hat = model.enhance(state.ema_params, noisy, key=jax.random.key(2 + r), N=args.n)
        times.append(time.time() - t0)
    audio_s = len(noisy) / 16000.0
    rtf = min(times) / audio_s
    assert np.isfinite(x_hat).all()

    print(json.dumps({
        "metric": "enhance_rtf",
        "value": round(rtf, 4),
        "unit": "wall_s_per_audio_s",
        "n_steps": args.n,
        "backbone_nf": 128 if args.full else args.nf,
        "audio_seconds": audio_s,
        "first_call_compile_s": round(compile_s, 1),
        "steady_calls_s": [round(t, 3) for t in times],
    }))


if __name__ == "__main__":
    main()
