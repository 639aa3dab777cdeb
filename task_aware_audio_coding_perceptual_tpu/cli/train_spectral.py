"""Spectral-family training CLI (reference ``train_pkl_file_task_aware.py``
argparse surface ``:704-733``: -n -z -l -bs -r -k -w -s -d -p -tf)."""

from __future__ import annotations

import argparse

from task_aware_audio_coding_perceptual_tpu.train.spectral_train import (
    SpectralTrainConfig,
    evaluate_spectral_ae,
    train_spectral_ae,
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-n", "--num_epochs", type=int, default=100)
    p.add_argument("-z", "--z_dim", type=int, default=256)
    p.add_argument("-l", "--lr", type=float, default=2e-4)
    p.add_argument("-bs", "--batch_size", type=int, default=12)
    p.add_argument("-r", "--beta_rec", type=float, default=1.0)
    p.add_argument("-k", "--beta_kl", type=float, default=1.0)
    p.add_argument("-w", "--weight_cross_penalty", type=float, default=0.1)
    p.add_argument("-s", "--seed", type=int, default=0)
    p.add_argument("-tf", "--total_features_after", type=int, default=128)
    p.add_argument("--model", type=str, default="SpectralResE2D1",
                   choices=("SpectralResE1D1", "SpectralResE2D1", "SpectralResE2D2", "SpectralResE4D1"))
    p.add_argument("--clean_dir", type=str, required=True)
    p.add_argument("--noisy_dirs", type=str, nargs="+", required=True)
    p.add_argument("--out_dir", type=str, default="./models")
    p.add_argument("--task_aware", action="store_true",
                   help="add the spectral loss term (task-aware trainer parity)")
    p.add_argument("--evaluate", action="store_true", help="run the Test split after training")
    args = p.parse_args(argv)

    cfg = SpectralTrainConfig(
        model=args.model, batch_size=args.batch_size, num_epochs=args.num_epochs,
        beta_rec=args.beta_rec, beta_kl=args.beta_kl,
        weight_cross_penalty=args.weight_cross_penalty, lr=args.lr, seed=args.seed,
        z_dim=args.z_dim, total_features_after=args.total_features_after,
        include_spec_loss=args.task_aware, out_dir=args.out_dir,
    )
    model, state = train_spectral_ae(cfg, args.clean_dir, args.noisy_dirs)
    if args.evaluate:
        results = evaluate_spectral_ae(
            cfg, args.clean_dir, args.noisy_dirs, state,
            out_csv=f"{model.get_model_name()}_test_results.csv",
        )
        print(results)


if __name__ == "__main__":
    main()
