"""Task-aware A/B: prove the gradient-flowing task loss moves a task metric.

The repo's namesake capability (VERDICT r3 item 2; BASELINE.json config 4).
The reference *intends* task-aware training — its v1/v2 trainers compute a
frozen-head task loss on the decoded audio and add it to the objective
(``train_pkl_file_task_aware_update.py:413-418``) — but its ``.item()``
detachment makes the term a constant. This script runs the fixed-intent
experiment twice with identical seeds/data/config:

  A) task loss OFF (pure reconstruction objective)
  B) task loss ON via ``task_gradient=True`` + :class:`TaskAwareFeatureLoss`
     (frozen CTC head; gradients flow through ISTFT + head into the encoder)

and reports, on the held-out Test split:

  - the task metric: frozen-head logit MSE between decoded and clean audio
    (exactly what a downstream ASR consumer of the codec sees)
  - reconstruction metrics (avg MSE, spectral SNR) to show recon stays
    within tolerance

Done-criterion table -> results/task_aware_ab.json (+ stdout markdown).

Usage:
    python scripts/task_aware_ab.py --epochs 30 --task-weight 2.0
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="SpectralResE2D1",
                   help="reference task-aware default, _update.py:355")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--z-dim", type=int, default=256)
    p.add_argument("--total-features-after", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--task-weight", type=float, default=2.0)
    p.add_argument("--data-root", default="/tmp/spectral_corpus")
    p.add_argument("--n-train", type=int, default=32)
    p.add_argument("--n-test", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--report", default="results/task_aware_ab.json")
    p.add_argument("--force", action="store_true",
                   help="retrain arms even if present in --report")
    p.add_argument("--asr-npz", default=None,
                   help="trained conv-CTC head artifact "
                        "(scripts/train_ctc_asr.py). When given, the task "
                        "head is the TRAINED frozen ASR (VERDICT r4 item 6), "
                        "the waveform chain switches to raw/observed-phase "
                        "so the head sees physically-scaled audio, and the "
                        "readout adds greedy-decode token accuracy against "
                        "the corpus's TRUE phone labels")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from task_aware_audio_coding_perceptual_tpu.data import chime
    from task_aware_audio_coding_perceptual_tpu.models import ctc_asr
    from task_aware_audio_coding_perceptual_tpu.data.datamodule import batch_iterator
    from task_aware_audio_coding_perceptual_tpu.data.datasets import SpectralDataset
    from task_aware_audio_coding_perceptual_tpu.models import task_aware
    from task_aware_audio_coding_perceptual_tpu.train import spectral_train

    clean_dir = os.path.join(args.data_root, "complex_specs_S02_P08")
    if not os.path.isdir(os.path.join(clean_dir, "Train")):
        print("generating speech-like correlated corpus ...", flush=True)
        chime.write_speechlike_spectral_corpus(
            args.data_root, n_train=args.n_train, n_test=args.n_test,
            n_mics=4, seed=args.seed,
        )
    noisy_dirs = [
        os.path.join(args.data_root, f"complex_specs_S02_P08_U0{m+2}.CH3")
        for m in range(4)
    ]

    cfg = spectral_train.SpectralTrainConfig(
        model=args.model,
        batch_size=args.batch_size,
        num_epochs=args.epochs,
        lr=args.lr,
        seed=args.seed,
        z_dim=args.z_dim,
        total_features_after=args.total_features_after,
        out_dir="runs/task_ab_off",
        normalize=not args.asr_npz,
        save_every=10**9,
        weight_cross_penalty=0.01,
        beta_kl=0.1,
    )

    # frozen CTC head used for arm B's TRAINING objective: the TRAINED conv
    # CTC when --asr-npz is given (reference analogue: pretrained frozen
    # Wav2Vec2ForCTC, train_pkl_file_task_aware.py:252-259), else the seeded
    # random proxy head
    if args.asr_npz:
        ctc_params = ctc_asr.load_ctc_artifact(args.asr_npz)
        ctc_model = ctc_asr.ConvCTCEncoder()
        frozen_ctc = jax.lax.stop_gradient(ctc_params)
        asr_apply = lambda wav: ctc_model.apply(frozen_ctc, wav)
        tl = task_aware.TaskAwareFeatureLoss(asr_apply, detached=False,
                                             phase_mode="observed")
    else:
        asr_apply, _ = task_aware.make_asr_head(seed=123, example_len=4000)
        tl = task_aware.TaskAwareFeatureLoss(asr_apply, detached=False)

    # independent readout heads (VERDICT r3 item 3: the eval metric must not
    # be the training loss): a from-config Flax Wav2Vec2-CTC — a *different
    # architecture* (transformer) with different frozen weights — scores both
    # arms, and a greedy-CTC token-agreement rate gives a discrete metric.
    w2v2_apply, _ = task_aware.make_asr_head(hf_config={}, seed=999)

    def _ctc_collapse(ids, blank=0):
        out = []
        prev = None
        for i in ids:
            if i != prev and i != blank:
                out.append(int(i))
            prev = i
        return out

    def _agreement(a, b):
        """1 - normalized Levenshtein distance between token sequences."""
        if not a and not b:
            return 1.0
        la, lb = len(a), len(b)
        d = np.arange(lb + 1, dtype=np.int32)
        for i in range(1, la + 1):
            prev_diag, d[0] = d[0], i
            for j in range(1, lb + 1):
                cost = 0 if a[i - 1] == b[j - 1] else 1
                prev_diag, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                            prev_diag + cost)
        return 1.0 - d[lb] / max(la, lb, 1)

    def eval_arm(state):
        """Held-out recon metrics + proxy-head task logit-MSE (the training
        objective, kept for continuity) + independent-head readouts."""
        rec = spectral_train.evaluate_spectral_ae(
            cfg, clean_dir, noisy_dirs, state, out_csv=None,
            normalize=cfg.normalize)
        model = spectral_train.build_model(cfg)
        ds = SpectralDataset(clean_dir, noisy_dirs, "Test",
                             target_shape=(cfg.freq_dim, cfg.time_dim),
                             normalize=cfg.normalize)

        @jax.jit
        def task_metric(variables, inputs, clean):
            out = model.apply(variables, *inputs, random_bottle_neck=True,
                              rngs={"bottleneck": jax.random.key(0)})
            t_mse, _ = tl(out.obs_dec, clean, observed=inputs[0])
            if args.asr_npz:
                dec_wav = task_aware.batch_reconstruct_waveform(
                    out.obs_dec[:, 0], inputs[0]["phase"])
            else:
                dec_wav = task_aware.batch_reconstruct_waveform(
                    out.obs_dec[:, 0], out.obs_dec[:, 1])
            clean_wav = task_aware.batch_reconstruct_waveform(
                clean["magnitude"], clean["phase"])
            ind_dec = w2v2_apply(dec_wav)
            ind_cln = w2v2_apply(clean_wav)
            ind_mse = jnp.mean((ind_dec - ind_cln) ** 2)
            extra = ()
            if args.asr_npz:
                extra = (asr_apply(dec_wav), asr_apply(clean_wav))
            return (t_mse, ind_mse, jnp.argmax(ind_dec, -1),
                    jnp.argmax(ind_cln, -1)) + extra

        vals, ind_vals, agree = [], [], []
        acc_dec, acc_cln = [], []
        item_idx = 0
        for batch in batch_iterator(ds, cfg.batch_size, shuffle=False):
            if batch["clean_audio"]["magnitude"].shape[0] != cfg.batch_size:
                continue
            inputs = spectral_train._model_inputs(cfg, batch)
            clean = {k: batch["clean_audio"][k] for k in ("magnitude", "phase")}
            res = task_metric(state.variables, inputs, clean)
            t, ind, ids_d, ids_c = res[:4]
            vals.append(float(t))
            ind_vals.append(float(ind))
            ids_d, ids_c = np.asarray(ids_d), np.asarray(ids_c)
            for b in range(ids_d.shape[0]):
                agree.append(_agreement(_ctc_collapse(ids_d[b]),
                                        _ctc_collapse(ids_c[b])))
            if args.asr_npz:
                # TRUE-label token accuracy of the trained head (greedy CTC)
                log_d, log_c = map(np.asarray, res[4:6])
                for b in range(log_d.shape[0]):
                    refs = test_labels[item_idx + b]
                    acc_dec.append(1.0 - ctc_asr.token_error_rate(
                        refs, ctc_asr.greedy_decode(log_d[b:b+1])[0]))
                    acc_cln.append(1.0 - ctc_asr.token_error_rate(
                        refs, ctc_asr.greedy_decode(log_c[b:b+1])[0]))
            item_idx += ids_d.shape[0]
        rec["task_logit_mse"] = float(np.mean(vals))
        rec["w2v2_logit_mse"] = float(np.mean(ind_vals))
        rec["ctc_token_agreement"] = float(np.mean(agree))
        if args.asr_npz:
            rec["true_label_token_acc_decoded"] = float(np.mean(acc_dec))
            rec["true_label_token_acc_clean"] = float(np.mean(acc_cln))
        return rec

    test_labels = []
    if args.asr_npz:
        import glob as _glob
        import pickle as _pickle
        for f in sorted(_glob.glob(os.path.join(clean_dir, "Test", "*.pkl"))):
            with open(f, "rb") as fh:
                item = _pickle.load(fh)
            labs = item.get("labels")
            assert labs, (
                f"{f} has no phone labels; regenerate the corpus with a "
                "fresh --data-root (label-carrying corpora are written by "
                "chime.write_speechlike_spectral_corpus since r5)")
            test_labels.append([sym for sym, _, _ in labs])

    # Resume semantics: arms already present in an existing report file are
    # reused (a TPU wedge must not discard a finished multi-hour arm).
    report = {"config": {k: getattr(args, k) for k in vars(args)}}
    if os.path.exists(args.report) and not args.force:
        with open(args.report) as f:
            prior = json.load(f)
        for arm in ("task_off", "task_on"):
            if arm in prior:
                report[arm] = prior[arm]
                print(f"[{arm}] reusing prior result from {args.report}", flush=True)

    os.makedirs(os.path.dirname(args.report), exist_ok=True)
    for arm, kwargs in (
        ("task_off", {}),
        ("task_on", dict(task_loss_fn=tl, task_gradient=True,
                         task_weight=args.task_weight)),
    ):
        if arm in report:
            continue
        cfg = dataclasses.replace(cfg, out_dir=f"runs/task_ab_{arm}")
        t0 = time.time()
        _, state = spectral_train.train_spectral_ae(
            cfg, clean_dir, noisy_dirs, **kwargs)
        report[arm] = eval_arm(state)
        report[arm]["train_seconds"] = round(time.time() - t0, 1)
        print(f"[{arm}] {json.dumps(report[arm])}", flush=True)
        with open(args.report, "w") as f:  # flush per arm: wedge-resilient
            json.dump(report, f, indent=2)

    off, on = report["task_off"], report["task_on"]
    report["delta"] = {
        "task_logit_mse_rel": (on["task_logit_mse"] - off["task_logit_mse"])
        / max(off["task_logit_mse"], 1e-12),
        "avg_mse_rel": (on["avg_mse"] - off["avg_mse"]) / max(off["avg_mse"], 1e-12),
        "spec_snr_db": on["avg_spec_snr"] - off["avg_spec_snr"],
    }
    # ADVICE r4: an arm resumed from a pre-w2v2/ctc report lacks these keys;
    # NaN would serialize as a bare (non-strict-JSON) literal — write null
    # by omission-aware guards instead
    if "w2v2_logit_mse" in on and "w2v2_logit_mse" in off:
        report["delta"]["w2v2_logit_mse_rel"] = (
            on["w2v2_logit_mse"] - off["w2v2_logit_mse"]
        ) / max(off["w2v2_logit_mse"], 1e-12)
    else:
        report["delta"]["w2v2_logit_mse_rel"] = None
    if "ctc_token_agreement" in on and "ctc_token_agreement" in off:
        report["delta"]["ctc_token_agreement"] = (
            on["ctc_token_agreement"] - off["ctc_token_agreement"]
        )
    else:
        report["delta"]["ctc_token_agreement"] = None
    os.makedirs(os.path.dirname(args.report), exist_ok=True)
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)

    print("\n| arm | task logit MSE | w2v2 logit MSE | tok agree | avg MSE | spec SNR (dB) |")
    print("|---|---|---|---|---|---|")
    for arm in ("task_off", "task_on"):
        r = report[arm]
        print(f"| {arm} | {r['task_logit_mse']:.6f} "
              f"| {r.get('w2v2_logit_mse', float('nan')):.6f} "
              f"| {r.get('ctc_token_agreement', float('nan')):.4f} "
              f"| {r['avg_mse']:.5f} | {r['avg_spec_snr']:.2f} |")
    d = report["delta"]
    print(f"\ntask metric change: {100*d['task_logit_mse_rel']:+.1f}% "
          f"(negative = task-aware training helps the downstream head)")
    if d["w2v2_logit_mse_rel"] is not None and d["ctc_token_agreement"] is not None:
        print(f"independent-head: w2v2 logit MSE {100*d['w2v2_logit_mse_rel']:+.1f}%, "
              f"CTC token agreement {d['ctc_token_agreement']:+.4f}")
    print(f"recon cost: avg MSE {100*d['avg_mse_rel']:+.1f}%, "
          f"spec SNR {d['spec_snr_db']:+.2f} dB")


if __name__ == "__main__":
    main()
