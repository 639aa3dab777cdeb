"""Task-aware codec A/B with a TRAINED frozen ASR head (reference v1
semantics, ``train_pkl_file_task_aware.py:252-259``, with the ``.item()``
detachment fixed and a real trained head instead of unavailable HF weights).

The codec compresses NOISY mixtures; the task head is the conv CTC trained
on the labeled synthetic corpus (scripts/train_ctc_asr.py). Arms:

  A) recon-only fine-tune of the noisy codec
  B) + w * MSE(ctc_logits(decoded), ctc_logits(clean))  — gradients flow

Readout on held-out mixtures (the downstream ASR consumer's metrics):
  - TRUE-label token accuracy of greedy CTC decode on the decoded audio
    (labels regenerated from the corpus seeds — the synthetic corpus knows
    its own transcripts)
  - frozen-head logit MSE (the training objective, for continuity)
  - decoded SI-SDR (coding fidelity)
Toplines: token accuracy on clean and on noisy (uncoded) audio.

Usage:
    python scripts/task_aware_codec_asr_ab.py --steps 6000 --task-weight 2.0
"""
import argparse
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def labels_for_clean_file(path: str):
    """Regenerate the phone labels for a /tmp/speech_corpus-derived wav by
    its seeded filename (synth_i -> rng(i); aug_i -> rng(1_000_003 + i);
    ``speech_synth.generate_corpus`` seeding)."""
    from task_aware_audio_coding_perceptual_tpu.data.speech_synth import (
        synthesize_utterance,
    )

    m = re.match(r"(synth|aug)_(\d+)\.wav$", os.path.basename(path))
    assert m, f"not a seeded corpus file: {path}"
    seed = int(m.group(2)) + (1_000_003 if m.group(1) == "aug" else 0)
    _, labs = synthesize_utterance(np.random.default_rng(seed), duration=2.0,
                                   return_labels=True)
    return [sym for sym, _, _ in labs]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mixture_root", default="/tmp/sgmse_data_r5")
    p.add_argument("--codec_npz", default="results/warmstart/codec_noisy_ch48_8k.npz")
    p.add_argument("--asr_npz", default="tests/golden/ctc_asr_params.npz")
    p.add_argument("--channels", type=int, default=48)
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--task-weight", type=float, default=2.0)
    p.add_argument("--eval-files", type=int, default=32)
    p.add_argument("--report", default="results/task_aware_codec_asr_ab.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from task_aware_audio_coding_perceptual_tpu import metrics as M
    from task_aware_audio_coding_perceptual_tpu.data import wav_io
    from task_aware_audio_coding_perceptual_tpu.models import ctc_asr
    from task_aware_audio_coding_perceptual_tpu.models import rvq as rvq_lib
    from task_aware_audio_coding_perceptual_tpu.models.codec import (
        CodecConfig,
        NeuralAudioCodec,
    )
    from task_aware_audio_coding_perceptual_tpu.train import codec_train
    from task_aware_audio_coding_perceptual_tpu.train.checkpoints import (
        load_codec_artifact,
    )

    ctc_params = ctc_asr.load_ctc_artifact(args.asr_npz)
    ctc_model = ctc_asr.ConvCTCEncoder()
    frozen_ctc = jax.lax.stop_gradient(ctc_params)

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

    def load_pair_clips(pairs, rng, start_zero=False):
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
                s = 0 if start_zero else int(rng.integers(0, max(L - T, 1)))
            cs.append(c[s : s + T])
            ns.append(n[s : s + T])
        return (np.stack(cs).astype(np.float32),
                np.stack(ns)[..., None].astype(np.float32))

    erng = np.random.default_rng(1234)
    # start_zero: labels correspond to the whole utterance; 2 s covers it
    eval_clean, eval_noisy = load_pair_clips(eval_pairs, erng, start_zero=True)
    eval_labels = [labels_for_clean_file(cf) for cf, _ in eval_pairs]
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
        def step(state, noisy, clean):
            def loss_fn(params):
                base, aux = codec_train.codec_loss(
                    model, params, state.rvq, noisy, weights)
                task = jnp.zeros(())
                if task_weight:
                    dec = aux["recon"][..., 0]
                    lg_dec = ctc_model.apply(frozen_ctc, dec)
                    lg_cln = jax.lax.stop_gradient(
                        ctc_model.apply(frozen_ctc, clean))
                    task = jnp.mean((lg_dec - lg_cln) ** 2)
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
    def ctc_logits(wav):
        return ctc_model.apply(frozen_ctc, wav)

    def token_acc(logits):
        logits = np.asarray(logits)
        return float(np.mean([
            1.0 - ctc_asr.token_error_rate(
                eval_labels[i], ctc_asr.greedy_decode(logits[i:i+1])[0])
            for i in range(len(eval_labels))
        ]))

    def metrics_of(dec):
        dec = np.asarray(dec)
        n = len(eval_clean)
        lg = ctc_logits(jnp.asarray(dec))
        lg_c = ctc_logits(eval_clean_j)
        return {
            "decoded_vs_noisy_si_sdr": float(np.mean(
                [M.si_sdr(eval_noisy[i, :, 0], dec[i]) for i in range(n)])),
            "decoded_vs_clean_si_sdr": float(np.mean(
                [M.si_sdr(eval_clean[i], dec[i]) for i in range(n)])),
            "ctc_logit_mse_vs_clean": float(jnp.mean((lg - lg_c) ** 2)),
            "true_label_token_acc_decoded": token_acc(lg),
        }

    report = {"config": {k: getattr(args, k) for k in vars(args)}}
    report["anchors"] = {
        "token_acc_clean": token_acc(ctc_logits(eval_clean_j)),
        "token_acc_noisy": token_acc(ctc_logits(eval_noisy_j[..., 0])),
        "noisy_vs_clean_si_sdr": float(np.mean(
            [M.si_sdr(eval_clean[i], eval_noisy[i, :, 0])
             for i in range(len(eval_clean))])),
    }
    print("[anchors]", json.dumps(report["anchors"]), flush=True)

    state0 = codec_train.CodecTrainState(
        params=params0, opt_state=tx.init(params0), rvq=rvq0,
        step=jnp.zeros((), jnp.int32))
    report["baseline"] = metrics_of(decode_eval(state0.params, state0.rvq,
                                                eval_noisy_j))
    print("[baseline]", json.dumps(report["baseline"]), flush=True)

    for arm, w in (("task_off", 0.0), ("task_on", args.task_weight)):
        step = make_step(w)
        state = state0
        rng = np.random.default_rng(17)
        t0 = time.time()
        for s in range(args.steps):
            idx = rng.integers(0, len(train_pairs), args.batch_size)
            clean, noisy = load_pair_clips([train_pairs[i] for i in idx], rng)
            state, m = step(state, jnp.asarray(noisy), jnp.asarray(clean))
            if s % 500 == 0:
                print(f"[{arm}] step {s} loss {float(m['loss']):.3f} "
                      f"task {float(m['task']):.4f}", flush=True)
        report[arm] = metrics_of(decode_eval(state.params, state.rvq,
                                             eval_noisy_j))
        report[arm]["train_seconds"] = round(time.time() - t0, 1)
        print(f"[{arm}] {json.dumps(report[arm])}", flush=True)
        os.makedirs(os.path.dirname(args.report), exist_ok=True)
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2)

    off, on = report["task_off"], report["task_on"]
    report["delta"] = {
        "true_label_token_acc": on["true_label_token_acc_decoded"]
        - off["true_label_token_acc_decoded"],
        "ctc_logit_mse_rel": (on["ctc_logit_mse_vs_clean"]
                              - off["ctc_logit_mse_vs_clean"])
        / max(off["ctc_logit_mse_vs_clean"], 1e-12),
        "decoded_vs_noisy_si_sdr_db": on["decoded_vs_noisy_si_sdr"]
        - off["decoded_vs_noisy_si_sdr"],
    }
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    d = report["delta"]
    print(f"\ntask-aware ASR effect: token accuracy {d['true_label_token_acc']:+.4f}, "
          f"head logit MSE {100*d['ctc_logit_mse_rel']:+.1f}% "
          f"(coding fidelity change {d['decoded_vs_noisy_si_sdr_db']:+.2f} dB)")


if __name__ == "__main__":
    main()
