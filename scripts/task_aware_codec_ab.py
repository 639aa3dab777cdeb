"""Task-aware v2 A/B on the codec: fine-tune the neural codec with the
*trained* frozen diffusion enhancer in the objective (north-star config 4 +
the reference's flagship composition, ``train_pkl_file_task_aware_update.py:
242-253,413-418`` — with the gradient actually flowing).

Why the codec and not the spectral AE: the spectral zoo decodes raw phase,
and its ISTFT output is waveform-incoherent (~-47 dB SI-SDR) at any feasible
training budget — `results/task_aware_v2_ab.json` documents that the
enhancement-side metric is degenerate there. The codec's decoded audio is
waveform-coherent (+4.8 dB), so "does task-aware training make decoded audio
*more enhanceable*" is actually measurable.

Arms (identical seeds/data/steps, run fresh in one session):
  A) recon-only fine-tune of the trained codec artifact
  B) + w * L2(enhance_N3(decoded), clean) through the frozen sampler
     (gradients reach the decoder AND encoder through the enhancer)

Eval on the held-out tail: SI-SDR/ESTOI of decoded and of enhance_N10+ald
(decoded) — the eval sampler is deliberately different from the training
head, and the eval metric (SI-SDR) is not the training objective (L2).

Usage:
    python scripts/task_aware_codec_ab.py --steps 1500 --task-weight 0.5
"""
import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ENH_ARTIFACT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                            "sgmse_ema_params.npz")
ENH_BACKBONE_KWARGS = (
    ("nf", 64), ("ch_mult", (1, 1, 2)), ("num_res_blocks", 2),
    ("attn_resolutions", (16,)), ("remat", True),
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav_dir", default="/tmp/speech_corpus")
    p.add_argument("--codec_npz", default="results/warmstart/codec_ch48_p4_72k.npz")
    p.add_argument("--channels", type=int, default=48)
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--seconds", type=float, default=1.0)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--task-weight", type=float, default=0.5)
    p.add_argument("--train-N", type=int, default=3)
    p.add_argument("--eval-N", type=int, default=10)
    p.add_argument("--eval-files", type=int, default=24)
    p.add_argument("--report", default="results/task_aware_codec_ab.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from export_codec_ckpt import unflatten
    from task_aware_audio_coding_perceptual_tpu import metrics as M
    from task_aware_audio_coding_perceptual_tpu.data import wav_io
    from task_aware_audio_coding_perceptual_tpu.metrics.sdr import si_sdr_jax
    from task_aware_audio_coding_perceptual_tpu.models import rvq as rvq_lib
    from task_aware_audio_coding_perceptual_tpu.models.codec import (
        CodecConfig,
        NeuralAudioCodec,
    )
    from task_aware_audio_coding_perceptual_tpu.models.sgmse.score_model import (
        ScoreModel,
        ScoreModelConfig,
    )
    from task_aware_audio_coding_perceptual_tpu.train import codec_train
    from task_aware_audio_coding_perceptual_tpu.train.checkpoints import (
        load_codec_artifact,
    )

    # ---- frozen enhancer ---------------------------------------------------
    z = np.load(os.path.abspath(ENH_ARTIFACT))
    enh_params = jax.tree.map(jnp.asarray, unflatten({k: z[k] for k in z.files}))
    enh_model = ScoreModel(ScoreModelConfig(backbone="ncsnpp",
                                            backbone_kwargs=ENH_BACKBONE_KWARGS))
    frozen = jax.lax.stop_gradient(enh_params)

    # ---- codec + data ------------------------------------------------------
    config = CodecConfig(channels=args.channels)
    model = NeuralAudioCodec(config)
    files = sorted(glob.glob(os.path.join(args.wav_dir, "**", "*.wav"),
                             recursive=True))
    # ADVICE r4: with a tiny corpus len(files)//10 is 0, making files[-0:]
    # the WHOLE pool and train_files empty — clamp and assert instead
    n_eval = max(1, min(args.eval_files, len(files) // 10))
    eval_pool, train_files = files[-n_eval:], files[:-n_eval]
    assert train_files, (
        f"corpus under {args.wav_dir} too small to split ({len(files)} files)")
    T = int(args.seconds * 16000)
    T -= T % config.hop

    def load_clips(paths, rng):
        out = []
        for f in paths:
            x, _ = wav_io.load(f)
            x = x[0]
            if len(x) < T:
                x = np.pad(x, (0, T - len(x)))
            s = int(rng.integers(0, max(len(x) - T, 1)))
            out.append(x[s : s + T])
        return np.stack(out)[..., None].astype(np.float32)

    erng = np.random.default_rng(1234)
    eval_wav = jnp.asarray(load_clips(eval_pool, erng))

    params0, cb = load_codec_artifact(args.codec_npz,
                                      expect_channels=args.channels)
    params0 = jax.tree.map(jnp.asarray, params0)
    cb = jnp.asarray(cb)
    rvq0 = rvq_lib.RvqState(codebooks=cb, ema_count=jnp.ones(cb.shape[:2]),
                            ema_sum=cb.astype(jnp.float32))
    # match the p3/p4 recipe the artifact was trained with, so the
    # recon-only arm holds quality instead of drifting
    weights = codec_train.CodecLossWeights(si_sdr=3.0)
    # zero_nans: a single spiked batch through the 2N-deep sampler VJP must
    # skip that update, not poison the run (observed once at step ~600)
    tx = optax.chain(optax.zero_nans(), optax.clip_by_global_norm(1.0),
                     optax.adam(args.lr))

    def make_step(task_weight):
        def step(state, wav, key):
            def loss_fn(params):
                base, aux = codec_train.codec_loss(
                    model, params, state.rvq, wav, weights)
                task = jnp.zeros(())
                if task_weight:
                    dec = aux["recon"][..., 0]  # (B, T)
                    # FIXED key: a fresh key per step makes the few-step
                    # sampler a different stochastic function each update and
                    # its gradient w.r.t. dec mostly noise (null A/B at
                    # w=0.3); a deterministic head gives a consistent
                    # optimization target
                    enhanced = enh_model.enhance_batched(
                        frozen, dec, key=jax.random.key(0), N=args.train_N,
                        corrector="none")
                    task = jnp.mean((enhanced - wav[..., 0]) ** 2)
                return base + task_weight * task, (aux, task)

            (loss, (aux, task)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            # sanitize: an inf grad survives zero_nans and turns into NaN
            # inside clip_by_global_norm (grad * 1/inf); zero non-finite
            # leaves instead so one spiked batch skips, not poisons
            grads = jax.tree.map(
                lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_rvq = rvq_lib.ema_update(state.rvq, aux["latents"], aux["codes"])
            return (
                codec_train.CodecTrainState(
                    params=new_params, opt_state=new_opt, rvq=new_rvq,
                    step=state.step + 1),
                {"loss": loss, "task": task},
            )

        return jax.jit(step)

    @jax.jit
    def decode_eval(params, rvq, wav):
        zl = model.apply(params, wav, method=NeuralAudioCodec.encode)
        q = rvq_lib.quantize(rvq, zl, use_pallas=False)
        y = model.apply(params, q.quantized, method=NeuralAudioCodec.decode)
        return y[..., 0]

    @jax.jit
    def enhance_eval(wav):
        return enh_model.enhance_batched(
            frozen, wav, key=jax.random.key(0), N=args.eval_N, corrector="ald")

    def eval_arm(state):
        dec = decode_eval(state.params, state.rvq, eval_wav)
        enh = enhance_eval(dec)
        ref = np.asarray(eval_wav[..., 0])
        dec, enh = np.asarray(dec), np.asarray(enh)
        out = {
            "decoded_si_sdr": float(np.mean([M.si_sdr(ref[i], dec[i])
                                             for i in range(len(ref))])),
            "enhanced_si_sdr": float(np.mean([M.si_sdr(ref[i], enh[i])
                                              for i in range(len(ref))])),
            "decoded_estoi": float(np.mean(
                [M.stoi(ref[i], dec[i], 16000, extended=True)
                 for i in range(len(ref))])),
            "enhanced_estoi": float(np.mean(
                [M.stoi(ref[i], enh[i], 16000, extended=True)
                 for i in range(len(ref))])),
        }
        return out

    report = {"config": {k: getattr(args, k) for k in vars(args)},
              "baseline": None}
    state0 = codec_train.CodecTrainState(
        params=params0, opt_state=tx.init(params0), rvq=rvq0,
        step=jnp.zeros((), jnp.int32))
    report["baseline"] = eval_arm(state0)
    print("[baseline]", json.dumps(report["baseline"]), flush=True)

    for arm, w in (("task_off", 0.0), ("task_on", args.task_weight)):
        step = make_step(w)
        state = state0
        rng = np.random.default_rng(17)
        key = jax.random.key(3)
        t0 = time.time()
        for s in range(args.steps):
            idx = rng.integers(0, len(train_files), args.batch_size)
            wav = jnp.asarray(load_clips([train_files[i] for i in idx], rng))
            key, sub = jax.random.split(key)
            state, m = step(state, wav, sub)
            if s % 200 == 0:
                print(f"[{arm}] step {s} loss {float(m['loss']):.3f} "
                      f"task {float(m['task']):.4f}", flush=True)
        report[arm] = eval_arm(state)
        report[arm]["train_seconds"] = round(time.time() - t0, 1)
        print(f"[{arm}] {json.dumps(report[arm])}", flush=True)
        os.makedirs(os.path.dirname(args.report), exist_ok=True)
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2)

    off, on = report["task_off"], report["task_on"]
    report["delta"] = {
        "enhanced_si_sdr_db": on["enhanced_si_sdr"] - off["enhanced_si_sdr"],
        "enhanced_estoi": on["enhanced_estoi"] - off["enhanced_estoi"],
        "decoded_si_sdr_db": on["decoded_si_sdr"] - off["decoded_si_sdr"],
        "decoded_estoi": on["decoded_estoi"] - off["decoded_estoi"],
    }
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    d = report["delta"]
    print(f"\nenhancement-side: SI-SDR {d['enhanced_si_sdr_db']:+.2f} dB, "
          f"ESTOI {d['enhanced_estoi']:+.4f}; decoded: "
          f"SI-SDR {d['decoded_si_sdr_db']:+.2f} dB, "
          f"ESTOI {d['decoded_estoi']:+.4f}")


if __name__ == "__main__":
    main()
