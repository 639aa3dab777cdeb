"""Neural-codec training CLI (north-star configs 2/5).

Trains the codec on a directory of wavs (or the clean side of a
``Specs``-layout tree), with optional MS-STFT adversarial training, data-
parallel over all available devices.
"""

from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from task_aware_audio_coding_perceptual_tpu.data import wav_io
from task_aware_audio_coding_perceptual_tpu.models.codec import CodecConfig
from task_aware_audio_coding_perceptual_tpu.train import codec_train, gan_train
from task_aware_audio_coding_perceptual_tpu.train.checkpoints import CheckpointManager
from task_aware_audio_coding_perceptual_tpu.train.logging_utils import CSVLogger


def _wav_batches(files, batch_size, seconds, sr, hop, seed=0):
    from task_aware_audio_coding_perceptual_tpu.data import native_loader

    rng = np.random.default_rng(seed)
    T = int(seconds * sr)
    T -= T % hop
    order = rng.permutation(files)

    if native_loader.available():
        # native threaded decode straight into one (B, T) buffer
        for s in range(0, len(order) - batch_size + 1, batch_size):
            paths = [str(f) for f in order[s : s + batch_size]]
            starts = [int(rng.integers(0, 1 << 30)) for _ in paths]  # clamped natively
            yield native_loader.load_batch(paths, T, starts=starts)[..., None]
        return

    batch = []
    for f in order:
        x, fsr = wav_io.load(str(f))
        x = x[0]
        if fsr != sr:
            x = wav_io.resample(x, fsr, sr)
        if len(x) < T:
            x = np.pad(x, (0, T - len(x)))
        start = rng.integers(0, max(len(x) - T, 1))
        batch.append(x[start : start + T])
        if len(batch) == batch_size:
            yield np.stack(batch)[..., None].astype(np.float32)
            batch = []


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, default="./logs_codec")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--seconds", type=float, default=1.0)
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--num_quantizers", type=int, default=8)
    p.add_argument("--codebook_size", type=int, default=1024)
    p.add_argument("--channels", type=int, default=32)
    p.add_argument("--adversarial", action="store_true", help="enable MS-STFT GAN")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--save_every", type=int, default=200)
    args = p.parse_args(argv)

    files = sorted(glob.glob(os.path.join(args.wav_dir, "**", "*.wav"), recursive=True))
    assert files, f"no wavs under {args.wav_dir}"

    config = CodecConfig(
        sample_rate=args.sample_rate, channels=args.channels,
        num_quantizers=args.num_quantizers, codebook_size=args.codebook_size,
    )
    mgr = CheckpointManager(os.path.join(args.out_dir, "checkpoints"))
    logger = CSVLogger(
        os.path.join(args.out_dir, "metrics.csv"),
        ["step", "loss", "l1", "mrstft", "mel", "commitment", "disc_loss"],
    )

    if args.adversarial:
        model, disc, state, gen_tx, disc_tx = gan_train.create_gan_state(
            config, jax.random.key(0), gen_lr=args.lr, disc_lr=args.lr
        )
        step_fn = jax.jit(gan_train.make_gan_train_step(model, disc, gen_tx, disc_tx))
    else:
        model, state, tx = codec_train.create_train_state(config, jax.random.key(0), args.lr)
        step_fn = jax.jit(codec_train.make_train_step(model, tx))

    steps = 0
    while steps < args.steps:
        for wav in _wav_batches(
            files, args.batch_size, args.seconds, args.sample_rate, config.hop, seed=steps
        ):
            state, m = step_fn(state, jnp.asarray(wav))
            steps += 1
            if steps % 50 == 0:
                loss_key = "gen_loss" if args.adversarial else "loss"
                logger.log(
                    step=steps,
                    loss=float(m[loss_key]),
                    l1=float(m["l1"]),
                    mrstft=float(m["mrstft"]),
                    mel=float(m["mel"]),
                    commitment=float(m.get("commitment", 0.0)),
                    disc_loss=float(m.get("disc_loss", 0.0)),
                )
            if steps % args.save_every == 0:
                mgr.save(steps, state)
            if steps >= args.steps:
                break
    mgr.save(steps, state)
    logger.close()
    mgr.close()
    print(f"trained {steps} steps -> {args.out_dir}")


if __name__ == "__main__":
    main()
