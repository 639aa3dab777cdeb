"""Task-aware v2 A/B, noisy-coding configuration — the reference's flagship
scenario done right.

In the reference, the AE codes NOISY microphone audio and the frozen
diffusion enhancer then denoises the decoded output
(``train_pkl_file_task_aware_update.py:242-253``): "task-aware" means
*code the noisy audio such that the enhancer downstream can still denoise
it*. The clean-speech codec A/B (`task_aware_codec_ab.py`) is null by
construction — on clean input the enhancer only has +0.4 dB of headroom.
Here the codec compresses noisy mixtures (enhancer headroom ~+8 dB):

  A) recon-only: codec fine-tuned to reconstruct the NOISY input
  B) + w * L2(enhance_N3(decoded), CLEAN) through the frozen sampler

Eval on held-out mixtures: SI-SDR of enhance_N10+ald(decoded) against the
CLEAN reference (the downstream consumer's metric), plus decoded-vs-noisy
SI-SDR (coding fidelity) and the noisy/enhance(noisy) anchors.

Usage:
    python scripts/task_aware_codec_noisy_ab.py --steps 1500 --task-weight 1.0
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
    p.add_argument("--mixture_root", default="/tmp/sgmse_data_r3",
                   help="create_mixture_dataset layout: {split}/{clean,noisy}")
    p.add_argument("--codec_npz", default="results/warmstart/codec_ch48_p4_72k.npz")
    p.add_argument("--channels", type=int, default=48)
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--seconds", type=float, default=1.0)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--task-weight", type=float, default=1.0)
    p.add_argument("--train-N", type=int, default=3)
    p.add_argument("--train-corrector", default="none",
                   help="corrector inside the training-loss sampler; 'ald' "
                        "aligns the train-time head with the eval head "
                        "(r5: the N=3/none head optimized its own metric "
                        "without transferring to the N=10/ald eval)")
    p.add_argument("--eval-N", type=int, default=10)
    p.add_argument("--eval-files", type=int, default=16)
    p.add_argument("--report", default="results/task_aware_codec_noisy_ab.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from export_codec_ckpt import unflatten
    from task_aware_audio_coding_perceptual_tpu import metrics as M
    from task_aware_audio_coding_perceptual_tpu.data import wav_io
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

    z = np.load(os.path.abspath(ENH_ARTIFACT))
    enh_params = jax.tree.map(jnp.asarray, unflatten({k: z[k] for k in z.files}))
    enh_model = ScoreModel(ScoreModelConfig(backbone="ncsnpp",
                                            backbone_kwargs=ENH_BACKBONE_KWARGS))
    frozen = jax.lax.stop_gradient(enh_params)

    config = CodecConfig(channels=args.channels)
    model = NeuralAudioCodec(config)

    def pair_list(split):
        cl = sorted(glob.glob(os.path.join(args.mixture_root, split, "clean", "*.wav")))
        no = sorted(glob.glob(os.path.join(args.mixture_root, split, "noisy", "*.wav")))
        assert len(cl) == len(no) and cl, f"bad mixture layout under {split}"
        return list(zip(cl, no))

    train_pairs = pair_list("train")
    eval_pairs = pair_list("valid")[: args.eval_files]
    T = int(args.seconds * 16000)
    T -= T % config.hop

    def load_pair_clips(pairs, rng):
        cs, ns = [], []
        for cf, nf in pairs:
            c, _ = wav_io.load(cf)
            n, _ = wav_io.load(nf)
            c, n = c[0], n[0]
            L = min(len(c), len(n))
            if L < T:
                c = np.pad(c[:L], (0, T - L))
                n = np.pad(n[:L], (0, T - L))
                s = 0
            else:
                s = int(rng.integers(0, max(L - T, 1)))
            cs.append(c[s : s + T])
            ns.append(n[s : s + T])
        return (np.stack(cs).astype(np.float32),
                np.stack(ns)[..., None].astype(np.float32))

    erng = np.random.default_rng(1234)
    eval_clean, eval_noisy = load_pair_clips(eval_pairs, erng)
    eval_clean_j = jnp.asarray(eval_clean)
    eval_noisy_j = jnp.asarray(eval_noisy)

    params0, cb = load_codec_artifact(args.codec_npz,
                                      expect_channels=args.channels)
    params0 = jax.tree.map(jnp.asarray, params0)
    cb = jnp.asarray(cb)
    rvq0 = rvq_lib.RvqState(codebooks=cb, ema_count=jnp.ones(cb.shape[:2]),
                            ema_sum=cb.astype(jnp.float32))
    weights = codec_train.CodecLossWeights(si_sdr=3.0)
    tx = optax.chain(optax.zero_nans(), optax.clip_by_global_norm(1.0),
                     optax.adam(args.lr))

    def make_step(task_weight):
        def step(state, noisy, clean, key):
            def loss_fn(params):
                base, aux = codec_train.codec_loss(
                    model, params, state.rvq, noisy, weights)
                task = jnp.zeros(())
                if task_weight:
                    dec = aux["recon"][..., 0]
                    enhanced = enh_model.enhance_batched(
                        frozen, dec, key=jax.random.key(0), N=args.train_N,
                        corrector=args.train_corrector)
                    task = jnp.mean((enhanced - clean) ** 2)
                return base + task_weight * task, (aux, task)

            (loss, (aux, task)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
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

    def metrics_of(dec, enh):
        dec, enh = np.asarray(dec), np.asarray(enh)
        n = len(eval_clean)
        return {
            "decoded_vs_noisy_si_sdr": float(np.mean(
                [M.si_sdr(eval_noisy[i, :, 0], dec[i]) for i in range(n)])),
            "decoded_vs_clean_si_sdr": float(np.mean(
                [M.si_sdr(eval_clean[i], dec[i]) for i in range(n)])),
            "enhanced_vs_clean_si_sdr": float(np.mean(
                [M.si_sdr(eval_clean[i], enh[i]) for i in range(n)])),
            "enhanced_estoi": float(np.mean(
                [M.stoi(eval_clean[i], enh[i], 16000, extended=True)
                 for i in range(n)])),
        }

    def eval_arm(state):
        dec = decode_eval(state.params, state.rvq, eval_noisy_j)
        return metrics_of(dec, enhance_eval(dec))

    n = len(eval_clean)
    report = {"config": {k: getattr(args, k) for k in vars(args)}}
    report["anchors"] = {
        "noisy_vs_clean_si_sdr": float(np.mean(
            [M.si_sdr(eval_clean[i], eval_noisy[i, :, 0]) for i in range(n)])),
        "enhance_noisy_vs_clean_si_sdr": float(np.mean(
            [M.si_sdr(eval_clean[i], np.asarray(enhance_eval(
                eval_noisy_j[..., 0]))[i]) for i in range(n)])),
    }
    print("[anchors]", json.dumps(report["anchors"]), flush=True)

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
            idx = rng.integers(0, len(train_pairs), args.batch_size)
            clean, noisy = load_pair_clips([train_pairs[i] for i in idx], rng)
            key, sub = jax.random.split(key)
            state, m = step(state, jnp.asarray(noisy), jnp.asarray(clean), sub)
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
        "enhanced_vs_clean_si_sdr_db":
            on["enhanced_vs_clean_si_sdr"] - off["enhanced_vs_clean_si_sdr"],
        "enhanced_estoi": on["enhanced_estoi"] - off["enhanced_estoi"],
        "decoded_vs_noisy_si_sdr_db":
            on["decoded_vs_noisy_si_sdr"] - off["decoded_vs_noisy_si_sdr"],
    }
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    d = report["delta"]
    print(f"\ntask-aware effect on downstream enhancement: "
          f"{d['enhanced_vs_clean_si_sdr_db']:+.2f} dB SI-SDR, "
          f"{d['enhanced_estoi']:+.4f} ESTOI "
          f"(coding fidelity change {d['decoded_vs_noisy_si_sdr_db']:+.2f} dB)")


if __name__ == "__main__":
    main()
