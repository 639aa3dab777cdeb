"""Train SGMSE on a synthetic noisy-speech corpus and show enhancement wins.

Produces the trained-enhancement evidence the reference records via its
validation PESQ/SI-SDR/ESTOI hooks (``sgmse/sgmse/model.py:205-262``): a
short score-model training run, then before/after metrics on held-out
noisy files (noisy-input baseline vs enhanced output).

Usage:
    python scripts/train_sgmse_demo.py --steps 2000 --out runs/sgmse_demo
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ensure_dataset(root: str, clean_pool: str, n_noise: int = 40) -> str:
    """clean pool + synthetic noise pool -> Specs train/valid/test layout."""
    from task_aware_audio_coding_perceptual_tpu.data import synth, wav_io

    if os.path.isdir(os.path.join(root, "train", "clean")):
        return root
    noise_dir = os.path.join(root, "_noise")
    os.makedirs(noise_dir, exist_ok=True)
    rng = np.random.default_rng(123)
    for i in range(n_noise):
        # pink-ish + amplitude-modulated babble-band noise, 4 s
        w = rng.standard_normal(64000).astype(np.float32)
        pink = np.convolve(w, np.ones(8) / 8.0, mode="same")
        am = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(0.3, 3.0) * np.arange(64000) / 16000)
        wav_io.save(os.path.join(noise_dir, f"n{i:03d}.wav"), (pink * am)[None] * 0.1, 16000)
    written = synth.create_mixture_dataset(
        clean_pool, noise_dir, root, snr_range=(0.0, 15.0), seed=7,
        max_per_split=240,
    )
    print("mixture dataset:", written, flush=True)
    return root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--data", default="/tmp/sgmse_data")
    p.add_argument("--clean-pool", default="/tmp/speech_corpus")
    p.add_argument("--out", default="runs/sgmse_demo")
    p.add_argument("--eval-files", type=int, default=8)
    p.add_argument("--eval-N", type=int, default=30)
    args = p.parse_args()

    import jax
    from task_aware_audio_coding_perceptual_tpu import metrics as M
    from task_aware_audio_coding_perceptual_tpu.data import wav_io
    from task_aware_audio_coding_perceptual_tpu.data.datamodule import SpecsDataModule
    from task_aware_audio_coding_perceptual_tpu.models.sgmse.score_model import (
        ScoreModel,
        ScoreModelConfig,
    )
    from task_aware_audio_coding_perceptual_tpu.train import sgmse_train

    ensure_dataset(args.data, args.clean_pool)

    cfg = ScoreModelConfig(
        backbone="ncsnpp",
        backbone_kwargs=(("nf", 32), ("ch_mult", (1, 1, 2)),
                         ("num_res_blocks", 1), ("attn_resolutions", (16,))),
    )
    model = ScoreModel(cfg)
    data = SpecsDataModule(base_dir=args.data, batch_size=args.batch_size)
    tcfg = sgmse_train.SgmseTrainerConfig(
        max_epochs=1000,  # bounded by max_steps
        max_steps=args.steps,
        num_eval_files=0,  # eval once at the end, below
        log_dir=args.out,
    )
    t0 = time.time()
    state = sgmse_train.train_sgmse(model, data, tcfg)
    print(f"trained {args.steps} steps in {time.time()-t0:.0f}s", flush=True)

    # --- before/after on held-out files
    data.setup()
    clean_files = data.valid_set.clean_files[: args.eval_files]
    noisy_files = data.valid_set.noisy_files[: args.eval_files]
    base = {"pesq_proxy": 0.0, "si_sdr": 0.0, "estoi": 0.0}
    for cf, nf in zip(clean_files, noisy_files):
        x, sr = wav_io.load(cf)
        y, _ = wav_io.load(nf)
        L = min(x.shape[-1], y.shape[-1])
        x, y = x[0][:L], y[0][:L]
        base["pesq_proxy"] += M.pesq_p862(16000, x, y, "wb") / len(clean_files)
        base["si_sdr"] += M.si_sdr(x, y) / len(clean_files)
        base["estoi"] += M.stoi(x, y, sr, extended=True) / len(clean_files)

    enh = sgmse_train.evaluate_enhancement(
        model, state.ema_params, clean_files, noisy_files,
        num_eval_files=args.eval_files, N=args.eval_N,
    )
    report = {"noisy_baseline": {k: round(v, 3) for k, v in base.items()},
              "enhanced": {k: round(v, 3) for k, v in enh.items()}}
    print(json.dumps(report, indent=2), flush=True)
    with open(os.path.join(args.out, "enhancement_report.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
