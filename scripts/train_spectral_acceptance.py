"""Train a spectral-zoo model until the reference's own acceptance test passes.

The reference encodes quality thresholds in ``test_pkl_file.py:99-102``
(avg MSE < 0.1, nuclear < 0.5, |cos| < 0.2, spectral SNR > 10 dB) and ships
trained-model CSVs (BASELINE.md, e.g. SpectralResE4D1_8: MSE 0.00406, spec
SNR 12.47 dB). This script reproduces that evidence chain on the TPU build:

    synth correlated corpus -> train -> evaluate_spectral_ae CSV
    -> acceptance_check -> checkpoint

Usage:
    python scripts/train_spectral_acceptance.py --model SpectralResE4D1 \
        --epochs 40 --out runs/spectral_acceptance
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
    p.add_argument("--model", default="SpectralResE4D1")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--z-dim", type=int, default=256)
    p.add_argument("--total-features-after", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--data-root", default="/tmp/spectral_corpus")
    p.add_argument("--n-train", type=int, default=32)
    p.add_argument("--n-test", type=int, default=8)
    p.add_argument("--out", default="runs/spectral_acceptance")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--normalize", action="store_true",
                   help="min-max normalize items (test_pkl_file_2.py eval regime); default off = the acceptance test's raw regime (train_pkl_file.py dataset pads only)")
    p.add_argument("--weight-cross-penalty", type=float, default=0.01,
                   help="cosine-decorrelation weight; the reference's 0.1 "
                        "overshoots |cos|<0.2 into anticorrelation on the "
                        "highly-correlated synthetic corpus")
    p.add_argument("--beta-kl", type=float, default=0.1,
                   help="nuclear-norm weight (reference CLI default 0.1, "
                        "train_pkl_file.py:351; 1.0 drives the latents "
                        "rank-1 and saturates |cos| at its max)")
    args = p.parse_args()

    from task_aware_audio_coding_perceptual_tpu.data import chime
    from task_aware_audio_coding_perceptual_tpu.train import spectral_train

    clean_dir = os.path.join(args.data_root, "complex_specs_S02_P08")
    if not os.path.isdir(os.path.join(clean_dir, "Train")):
        print("generating speech-like correlated corpus ...", flush=True)
        t0 = time.time()
        chime.write_speechlike_spectral_corpus(
            args.data_root, n_train=args.n_train, n_test=args.n_test,
            n_mics=4, seed=args.seed,
        )
        print(f"corpus written in {time.time()-t0:.0f}s", flush=True)
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
        out_dir=args.out,
        normalize=args.normalize,
        save_every=10,
        weight_cross_penalty=args.weight_cross_penalty,
        beta_kl=args.beta_kl,
    )
    t0 = time.time()
    model, state = spectral_train.train_spectral_ae(cfg, clean_dir, noisy_dirs)
    print(f"trained {args.epochs} epochs in {time.time()-t0:.0f}s", flush=True)

    name = model.get_model_name()
    csv_path = os.path.join(args.out, f"{name}_test_results.csv")
    results = spectral_train.evaluate_spectral_ae(
        cfg, clean_dir, noisy_dirs, state, out_csv=csv_path,
        normalize=args.normalize,
    )
    checks = spectral_train.acceptance_check(results)
    print(json.dumps({"results": results, "acceptance": checks}, indent=2))

    from task_aware_audio_coding_perceptual_tpu.train import checkpoints
    ckpt_dir = os.path.abspath(os.path.join(args.out, name, "final"))
    checkpoints.save_single(ckpt_dir, state)
    print(f"checkpoint -> {ckpt_dir}")
    ok = all(checks.values())
    print("ACCEPTANCE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
