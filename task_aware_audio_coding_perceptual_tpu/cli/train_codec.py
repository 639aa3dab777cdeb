"""Neural-codec training CLI (north-star configs 2/5).

Trains the codec on a directory of wavs (or the clean side of a
``Specs``-layout tree), with optional MS-STFT adversarial training, data-
parallel over all available devices.

Training recipe (SoundStream/EnCodec-style, re-expressed for TPU):
- data-driven RVQ codebook init from real encoder latents,
- reconstruction-only warmup before the adversarial terms switch on
  (``--warmup_steps``; gated inside one compiled graph via ``adv_scale``),
- periodic dead-codeword reseeding from batch residuals,
- held-out SI-SDR eval during training; best checkpoint tracked on it.
"""

from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from task_aware_audio_coding_perceptual_tpu.data import wav_io
from task_aware_audio_coding_perceptual_tpu.metrics.sdr import si_sdr_jax
from task_aware_audio_coding_perceptual_tpu.models import rvq as rvq_lib
from task_aware_audio_coding_perceptual_tpu.models.codec import (
    CodecConfig,
    NeuralAudioCodec,
)
from task_aware_audio_coding_perceptual_tpu.train import codec_train, gan_train
from task_aware_audio_coding_perceptual_tpu.train.checkpoints import (
    CheckpointManager,
    save_single,
)
from task_aware_audio_coding_perceptual_tpu.train.logging_utils import CSVLogger


def _load_clip(path, T, sr, rng):
    x, fsr = wav_io.load(str(path))
    x = x[0]
    if fsr != sr:
        x = wav_io.resample(x, fsr, sr)
    if len(x) < T:
        x = np.pad(x, (0, T - len(x)))
    start = int(rng.integers(0, max(len(x) - T, 1)))
    return x[start : start + T]


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
        batch.append(_load_clip(f, T, sr, rng))
        if len(batch) == batch_size:
            yield np.stack(batch)[..., None].astype(np.float32)
            batch = []


def preload_corpus(files, sr):
    """Load every wav into one float32 RAM array list (single-core box:
    per-step file IO would starve the TPU)."""
    out = []
    for f in files:
        x, fsr = wav_io.load(str(f))
        x = x[0]
        if fsr != sr:
            x = wav_io.resample(x, fsr, sr)
        out.append(x.astype(np.float32))
    return out


def ram_batches(clips, k, batch_size, T, rng):
    """Sample a (K, B, T, 1) super-batch of random crops from RAM."""
    kb = k * batch_size
    idx = rng.integers(0, len(clips), kb)
    out = np.empty((kb, T, 1), np.float32)
    for j, i in enumerate(idx):
        x = clips[i]
        if len(x) < T:
            x = np.pad(x, (0, T - len(x)))
        start = int(rng.integers(0, max(len(x) - T, 1)))
        out[j, :, 0] = x[start : start + T]
    return out.reshape(k, batch_size, T, 1)


def make_eval_fn(model: NeuralAudioCodec):
    """Jitted full codec roundtrip -> per-item SI-SDR (dB)."""

    @jax.jit
    def eval_fn(params, rvq_state, wav):
        z = model.apply(params, wav, method=NeuralAudioCodec.encode)
        q = rvq_lib.quantize(rvq_state, z, use_pallas=False)
        y = model.apply(params, q.quantized, method=NeuralAudioCodec.decode)
        return si_sdr_jax(wav[..., 0], y[..., 0])

    return eval_fn


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
    p.add_argument("--lstm_layers", type=int, default=0,
                   help="EnCodec-style causal LSTM layers at the bottleneck "
                        "(encoder output + decoder input; 0 = off). NOTE: "
                        "nests a time-scan under the K-step training scan — "
                        "use --steps_per_call 1 (see CodecConfig docstring)")
    p.add_argument("--bottleneck_blocks", type=int, default=0,
                   help="dilated-conv residual stacks at the latent rate "
                        "(scan-free temporal module; 0 = off)")
    p.add_argument("--adversarial", action="store_true", help="enable MS-STFT GAN")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--save_every", type=int, default=200)
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="reconstruction-only steps before adversarial terms")
    p.add_argument("--reseed_every", type=int, default=250,
                   help="dead-codeword reseed interval (0 = off)")
    p.add_argument("--eval_every", type=int, default=250)
    p.add_argument("--eval_files", type=int, default=32,
                   help="held-out files for SI-SDR eval")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint dir to resume from")
    p.add_argument("--warm_start_npz", type=str, default=None,
                   help="compact npz artifact (scripts/export_codec_ckpt.py) "
                        "seeding generator params + RVQ codebooks; optimizer "
                        "and discriminator start fresh")
    p.add_argument("--warm_start_partial", action="store_true",
                   help="allow the artifact to cover only a subset of the "
                        "model's params (capacity growth: new residual "
                        "modules start at init)")
    p.add_argument("--start_step", type=int, default=0,
                   help="global step counter to start at (with --warm_start_npz)")
    p.add_argument("--steps_per_call", type=int, default=8,
                   help="inner lax.scan steps per device call (adversarial path)")
    p.add_argument("--w_si_sdr", type=float, default=0.1,
                   help="weight of the clipped negative-SI-SDR loss term "
                        "(0 disables; spectral-only losses stall SI-SDR near 0 dB)")
    p.add_argument("--lr_decay_steps", type=int, default=0,
                   help="cosine-decay the lr to lr/30 over this many steps "
                        "(0 = constant lr)")
    args = p.parse_args(argv)

    files = sorted(glob.glob(os.path.join(args.wav_dir, "**", "*.wav"), recursive=True))
    assert files, f"no wavs under {args.wav_dir}"
    # hold out the tail of the (sorted) pool for eval
    n_eval = min(args.eval_files, max(1, len(files) // 10))
    eval_pool, files = files[-n_eval:], files[:-n_eval]

    config = CodecConfig(
        sample_rate=args.sample_rate, channels=args.channels,
        num_quantizers=args.num_quantizers, codebook_size=args.codebook_size,
        lstm_layers=args.lstm_layers,
        bottleneck_blocks=args.bottleneck_blocks,
    )
    T_eval = int(args.seconds * args.sample_rate)
    T_eval -= T_eval % config.hop
    erng = np.random.default_rng(1234)
    eval_wav = jnp.asarray(
        np.stack([_load_clip(f, T_eval, args.sample_rate, erng) for f in eval_pool])[
            ..., None
        ],
        jnp.float32,
    )

    mgr = CheckpointManager(os.path.join(args.out_dir, "checkpoints"))
    logger = CSVLogger(
        os.path.join(args.out_dir, "metrics.csv"),
        ["step", "loss", "l1", "mrstft", "mel", "commitment", "disc_loss",
         "eval_si_sdr", "dead_codes"],
    )

    loss_weights = codec_train.CodecLossWeights(si_sdr=args.w_si_sdr)
    # optax.adam accepts a schedule wherever it accepts a float lr
    lr = (
        optax.cosine_decay_schedule(args.lr, args.lr_decay_steps, alpha=1 / 30)
        if args.lr_decay_steps
        else args.lr
    )
    if args.adversarial:
        model, disc, state, gen_tx, disc_tx = gan_train.create_gan_state(
            config, jax.random.key(0), gen_lr=lr, disc_lr=lr
        )
        # NOTE: no donate_argnums — buffer donation raises InvalidArgument
        # through the axon TPU relay
        step_fn = jax.jit(gan_train.make_gan_train_multistep(
            model, disc, gen_tx, disc_tx, weights=loss_weights))
        get_params = lambda s: s.gen_params
    else:
        model, state, tx = codec_train.create_train_state(config, jax.random.key(0), lr)
        base_step = jax.jit(codec_train.make_train_step(model, tx, weights=loss_weights))
        multi_step = jax.jit(codec_train.make_train_multistep(model, tx, weights=loss_weights))
        step_fn = lambda s, w, adv_scale: (
            base_step(s, w) if w.ndim == 3 else multi_step(s, w)
        )
        get_params = lambda s: s.params

    start_step = 0
    if args.resume:
        rmgr = CheckpointManager(args.resume)
        latest = rmgr.latest_step()
        if latest is not None:
            state = rmgr.restore(state, step=latest)
            start_step = int(latest)
            print(f"resumed from {args.resume} at step {start_step}")
        rmgr.close()

    warm_started = False
    if args.warm_start_npz and start_step == 0:
        from task_aware_audio_coding_perceptual_tpu.train.checkpoints import (
            load_codec_artifact,
        )

        params_tree, codebooks = load_codec_artifact(
            args.warm_start_npz, expect_channels=args.channels,
            expect_lstm_layers=None if args.warm_start_partial else args.lstm_layers,
            expect_bottleneck_blocks=(
                None if args.warm_start_partial else args.bottleneck_blocks),
        )
        if args.warm_start_partial:
            # capacity-growth warm start: overlay the artifact's params onto
            # the freshly-initialized tree, keeping newly-added modules
            # (e.g. bottleneck_blocks stacks) at their init. New modules are
            # residual, so the warm-started function starts near the
            # artifact's and training grows into the extra capacity.
            def overlay(init_tree, art_tree, path=""):
                out = {}
                for k, v in init_tree.items():
                    if k in art_tree and isinstance(v, dict):
                        out[k] = overlay(v, art_tree[k], f"{path}/{k}")
                    elif k in art_tree:
                        assert art_tree[k].shape == v.shape, (
                            f"shape mismatch at {path}/{k}: "
                            f"{art_tree[k].shape} vs {v.shape}")
                        out[k] = art_tree[k]
                    else:
                        out[k] = v
                return out

            init_tree = get_params(state)
            n_new = (len(jax.tree.leaves(init_tree))
                     - len(jax.tree.leaves(params_tree)))
            params_tree = overlay(init_tree, params_tree)
            print(f"partial warm start: {n_new} new param tensors kept at init")
        params_tree = jax.tree.map(jnp.asarray, params_tree)
        cb = jnp.asarray(codebooks)
        rvq0 = state.rvq.replace(
            codebooks=cb,
            ema_count=jnp.ones_like(state.rvq.ema_count),
            ema_sum=cb.astype(jnp.float32),
        )
        if args.adversarial:
            state = state.replace(gen_params=params_tree, rvq=rvq0)
        else:
            state = state.replace(params=params_tree, rvq=rvq0)
        start_step = args.start_step
        warm_started = True
        print(f"warm-started from {args.warm_start_npz} at step {start_step}")

    # data-driven RVQ init: sample a real batch, seed codebooks from latents.
    # Gated on NOT having warm-started: the artifact already carries trained
    # codebooks, and re-seeding would silently discard them (ADVICE r3).
    if start_step == 0 and not warm_started:
        seed_bs = max(1, min(args.batch_size, 16, len(files)))
        seed_wav = next(_wav_batches(files, seed_bs, args.seconds,
                                     args.sample_rate, config.hop, seed=9))
        z0 = jax.jit(
            lambda p, w: model.apply(p, w, method=NeuralAudioCodec.encode)
        )(get_params(state), jnp.asarray(seed_wav))
        rvq0 = rvq_lib.init_rvq_from_latents(
            jax.random.key(7), z0, config.num_quantizers, config.codebook_size
        )
        state = state.replace(rvq=rvq0)

    eval_fn = make_eval_fn(model)
    reseed_fn = jax.jit(rvq_lib.reseed_dead_codes)
    encode_fn = jax.jit(lambda p, w: model.apply(p, w, method=NeuralAudioCodec.encode))

    K = max(1, args.steps_per_call)
    clips = preload_corpus(files, args.sample_rate)
    T = int(args.seconds * args.sample_rate)
    T -= T % config.hop
    brng = np.random.default_rng(start_step + 17)

    best_si_sdr = -np.inf
    dead_last = 0
    steps = start_step
    # round logging/eval intervals to the super-batch granularity
    while steps < args.steps:
        wavs = jnp.asarray(ram_batches(clips, K, args.batch_size, T, brng))
        adv_scale = 1.0 if steps >= args.warmup_steps else 0.0
        if K == 1:
            state, m = step_fn(state, wavs[0], adv_scale)
        else:
            state, m = step_fn(state, wavs, adv_scale)
        steps += K

        if args.reseed_every and steps % args.reseed_every < K:
            z = encode_fn(get_params(state), wavs[-1])
            new_rvq, dead = reseed_fn(state.rvq, jax.random.key(steps), z)
            state = state.replace(rvq=new_rvq)
            dead_last = int(jnp.sum(dead))

        if steps % 50 < K or steps % args.eval_every < K:
            ev = np.nan
            if steps % args.eval_every < K:
                ev = float(jnp.mean(eval_fn(get_params(state), state.rvq, eval_wav)))
                if ev > best_si_sdr:
                    best_si_sdr = ev
                    save_single(os.path.join(args.out_dir, "best"), state)
            loss_key = "gen_loss" if args.adversarial else "loss"
            logger.log(
                step=steps,
                loss=float(m[loss_key]),
                l1=float(m["l1"]),
                mrstft=float(m["mrstft"]),
                mel=float(m["mel"]),
                commitment=float(m.get("commitment", 0.0)),
                disc_loss=float(m.get("disc_loss", 0.0)),
                eval_si_sdr=ev,
                dead_codes=dead_last,
            )
        if steps % args.save_every < K:
            mgr.save(steps, state)
    mgr.save(steps, state)
    logger.close()
    mgr.close()
    print(f"trained {steps} steps -> {args.out_dir}; best eval SI-SDR {best_si_sdr:.2f} dB")


if __name__ == "__main__":
    main()
