"""Batch speech-enhancement CLI (reference ``sgmse/enhancement.py``).

Enhances every wav in --test_dir/noisy with a trained ScoreModel checkpoint
and writes the results to --enhanced_dir. Sampler selection follows the
SDE class like the reference (``enhancement.py:79-91``).
"""

from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from task_aware_audio_coding_perceptual_tpu.data import wav_io
from task_aware_audio_coding_perceptual_tpu.models.sgmse.score_model import (
    ScoreModel,
    ScoreModelConfig,
    SpecTransforms,
)
from task_aware_audio_coding_perceptual_tpu.train.checkpoints import CheckpointManager


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--test_dir", type=str, required=True)
    p.add_argument("--enhanced_dir", type=str, required=True)
    p.add_argument("--ckpt_dir", type=str, required=True)
    p.add_argument("--backbone", type=str, default="ncsnpp")
    p.add_argument("--sde", type=str, default="ouve")
    p.add_argument("--N", type=int, default=30)
    p.add_argument("--corrector_steps", type=int, default=1)
    p.add_argument("--snr", type=float, default=0.5)
    p.add_argument("--nf", type=int, default=128)
    args = p.parse_args(argv)

    # 48 kHz fullband variant uses its own target_sr (reference :45-54)
    target_sr = 48000 if args.backbone == "ncsnpp_48k" else 16000

    config = ScoreModelConfig(
        backbone=args.backbone, sde=args.sde, sr=target_sr,
        backbone_kwargs=(("nf", args.nf),),
    )
    model = ScoreModel(config, SpecTransforms())
    noisy_files = sorted(glob.glob(os.path.join(args.test_dir, "noisy", "*.wav")))
    assert noisy_files, f"no wavs under {args.test_dir}/noisy"

    x0, sr = wav_io.load(noisy_files[0])
    state = model.init(jax.random.key(0))
    mgr = CheckpointManager(args.ckpt_dir)
    state = mgr.restore(state)

    os.makedirs(args.enhanced_dir, exist_ok=True)
    key = jax.random.key(0)
    for f in noisy_files:
        y, sr = wav_io.load(f)
        key, sub = jax.random.split(key)
        x_hat = model.enhance(
            state.ema_params, jnp.asarray(y[0]), key=sub,
            N=args.N, corrector_steps=args.corrector_steps, snr=args.snr,
        )
        wav_io.save(os.path.join(args.enhanced_dir, os.path.basename(f)), x_hat[None], sr)
    print(f"enhanced {len(noisy_files)} files -> {args.enhanced_dir}")


if __name__ == "__main__":
    main()
