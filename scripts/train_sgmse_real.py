"""Train SGMSE to a real enhancement win and export the evidence chain.

The reference's core deliverable is a score model whose ``enhance()`` output
beats the noisy input on PESQ/SI-SDR/ESTOI — it validates exactly this every
epoch and selects checkpoints on it (``sgmse/sgmse/model.py:205-262``,
``sgmse/train.py:88-97``). This script produces that evidence for the TPU
build (VERDICT r3 item 1):

  mixture corpus -> train_sgmse (staged-on-device fast path, in-training
  PESQ/SI-SDR/ESTOI eval, top-pesq checkpointing) -> held-out test report
  (enhanced vs noisy baseline, >= 20 files) -> compact ema-params npz for the
  floor regression test (tests/test_sgmse_quality.py).

Trainability was established by scripts/diag_sgmse2.py: a single-pair
overfit reaches +19.6 dB enhanced SI-SDR vs +5.0 noisy through this exact
chain (the round-2 -30 dB report was an undertrained model, not a chain
bug — the analytic-score bound through the full chain scores 53 dB).

Usage:
    python scripts/train_sgmse_real.py --steps 30000 --out runs/sgmse_real
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from export_codec_ckpt import flatten  # npz path convention (SEP="::")


def ensure_dataset(root: str, clean_pool: str, max_per_split: int, n_noise: int = 60):
    from task_aware_audio_coding_perceptual_tpu.data import synth, wav_io

    if os.path.isdir(os.path.join(root, "train", "clean")):
        return root
    noise_dir = os.path.join(root, "_noise")
    os.makedirs(noise_dir, exist_ok=True)
    rng = np.random.default_rng(123)
    for i in range(n_noise):
        # pink-ish + amplitude-modulated noise, 4 s @16k
        w = rng.standard_normal(64000).astype(np.float32)
        pink = np.convolve(w, np.ones(8) / 8.0, mode="same")
        am = 0.5 + 0.5 * np.sin(
            2 * np.pi * rng.uniform(0.3, 3.0) * np.arange(64000) / 16000
        )
        wav_io.save(os.path.join(noise_dir, f"n{i:03d}.wav"), (pink * am)[None] * 0.1, 16000)
    written = synth.create_mixture_dataset(
        clean_pool, noise_dir, root, snr_range=(0.0, 15.0), seed=7,
        max_per_split=max_per_split,
    )
    print("mixture dataset:", written, flush=True)
    return root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30000)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=2.5e-4)
    p.add_argument("--nf", type=int, default=64)
    p.add_argument("--num-res-blocks", type=int, default=2)
    # variant axes (VERDICT r3 items 4+5): reference-size NCSN++, DCUNet
    # backbone, and the SB-SDE/data-prediction path are live reference
    # configs (sgmse/backbones/ncsnpp.py:50-72, dcunet.py:100-162,
    # sdes.py:235-313) and need trained evidence, not just shape tests.
    p.add_argument("--backbone", default="ncsnpp",
                   choices=["ncsnpp", "ncsnpp_v2", "dcunet"])
    p.add_argument("--pesq-weight", type=float, default=0.0,
                   help="differentiable PESQ-style loss weight; the "
                        "reference's SB recipe is 5e-4 (sgmse/README.md:76)")
    p.add_argument("--sde", default="ouve", choices=["ouve", "sbve"])
    p.add_argument("--loss-type", default=None,
                   help="score_matching (ouve default) | data_prediction (sbve default)")
    p.add_argument("--ch-mult", default="1,1,2",
                   help="ncsnpp channel multipliers; reference size is 1,1,2,2,2,2,2")
    p.add_argument("--n-fft", type=int, default=None,
                   help="STFT size (default 510; dcunet needs 512 -> F=257)")
    p.add_argument("--report-key", default="flagship",
                   help="'flagship' = legacy top-level report row; anything "
                        "else appends under report['runs'][key]")
    p.add_argument("--no-export", action="store_true",
                   help="skip overwriting the golden ema artifact")
    p.add_argument("--steps-per-call", type=int, default=8,
                   help="K scanned steps per device call on the staged path")
    p.add_argument("--data", default="/tmp/sgmse_data_r3")
    p.add_argument("--clean-pool", default="/tmp/speech_corpus")
    p.add_argument("--max-per-split", type=int, default=480)
    p.add_argument("--out", default="runs/sgmse_real")
    p.add_argument("--eval-files", type=int, default=8)
    p.add_argument("--eval-every-epochs", type=int, default=50)
    p.add_argument("--eval-N", type=int, default=30)
    p.add_argument("--test-files", type=int, default=20)
    p.add_argument("--export", default="tests/golden/sgmse_ema_params.npz")
    p.add_argument("--report", default="results/sgmse_enhancement_report.json")
    p.add_argument("--select-metric", default="si_sdr",
                   choices=["si_sdr", "pesq_proxy", "estoi"],
                   help="in-training best-checkpoint selection metric "
                        "(si_sdr default: proxy-pesq selection shipped a bad "
                        "DCUNet checkpoint in round 4)")
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
    from task_aware_audio_coding_perceptual_tpu.train.checkpoints import (
        CheckpointManager,
    )

    ensure_dataset(args.data, args.clean_pool, args.max_per_split)

    ch_mult = tuple(int(c) for c in args.ch_mult.split(","))
    loss_type = args.loss_type or (
        "data_prediction" if args.sde == "sbve" else "score_matching"
    )
    n_fft = args.n_fft or (512 if args.backbone == "dcunet" else 510)
    backbone_kwargs = ()
    if args.backbone in ("ncsnpp", "ncsnpp_v2"):
        backbone_kwargs = (("nf", args.nf), ("ch_mult", ch_mult),
                           ("num_res_blocks", args.num_res_blocks),
                           ("attn_resolutions", (16,)))
    cfg = ScoreModelConfig(
        backbone=args.backbone,
        sde=args.sde,
        loss_type=loss_type,
        lr=args.lr,
        pesq_weight=args.pesq_weight,
        backbone_kwargs=backbone_kwargs,
    )
    from task_aware_audio_coding_perceptual_tpu.models.sgmse.score_model import (
        SpecTransforms,
    )
    model = ScoreModel(cfg, transforms=SpecTransforms(n_fft=n_fft))
    data = SpecsDataModule(base_dir=args.data, batch_size=args.batch_size,
                           n_fft=n_fft)
    tcfg = sgmse_train.SgmseTrainerConfig(
        max_epochs=10**9,  # bounded by max_steps
        max_steps=args.steps,
        num_eval_files=args.eval_files,
        eval_N=args.eval_N,
        eval_every_epochs=args.eval_every_epochs,
        log_dir=args.out,
        stage_on_device=True,
        steps_per_call=args.steps_per_call,
        select_metric=args.select_metric,
    )
    t0 = time.time()
    state = sgmse_train.train_sgmse(model, data, tcfg)
    print(f"trained {args.steps} steps in {time.time()-t0:.0f}s", flush=True)

    # ---- held-out test report: best checkpoint (select-metric), >= 20 files
    mgr = CheckpointManager(os.path.join(args.out, "checkpoints"),
                            max_to_keep=3, best_metric=args.select_metric,
                            best_mode="max")
    best = mgr.best_step()
    if best is not None:
        print(f"restoring best-{args.select_metric} checkpoint @ step {best}",
              flush=True)
        state = mgr.restore(state, step=best)
    mgr.close()

    data.setup()
    clean_files = data.test_set.clean_files[: args.test_files]
    noisy_files = data.test_set.noisy_files[: args.test_files]
    base = {"pesq_proxy": 0.0, "si_sdr": 0.0, "estoi": 0.0}
    for cf, nf_ in zip(clean_files, noisy_files):
        x, sr = wav_io.load(cf)
        y, _ = wav_io.load(nf_)
        L = min(x.shape[-1], y.shape[-1])
        x, y = x[0][:L], y[0][:L]
        base["pesq_proxy"] += M.pesq_p862(16000, x, y, "wb") / len(clean_files)
        base["si_sdr"] += M.si_sdr(x, y) / len(clean_files)
        base["estoi"] += M.stoi(x, y, sr, extended=True) / len(clean_files)

    import jax.numpy as jnp  # noqa: F401
    enh = sgmse_train.evaluate_enhancement(
        model, state.ema_params, clean_files, noisy_files,
        num_eval_files=len(clean_files), N=args.eval_N,
    )
    row = {
        "trained_steps": args.steps,
        "best_ckpt_step": best,
        "select_metric": args.select_metric,
        "backbone": {"name": args.backbone, "nf": args.nf,
                     "ch_mult": list(ch_mult),
                     "num_res_blocks": args.num_res_blocks},
        "sde": args.sde,
        "loss_type": loss_type,
        "test_files": len(clean_files),
        "noisy_baseline": {k: round(float(v), 3) for k, v in base.items()},
        "enhanced": {k: round(float(v), 3) for k, v in enh.items()},
    }
    report = {}
    if os.path.exists(args.report):
        with open(args.report) as f:
            report = json.load(f)
    if args.report_key == "flagship":
        report.update(row)
    else:
        report.setdefault("runs", {})[args.report_key] = row
    print(json.dumps(row, indent=2), flush=True)
    os.makedirs(os.path.dirname(args.report), exist_ok=True)
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    if args.no_export:
        return

    # ---- compact artifact for the floor regression test -------------------
    flat = flatten(jax.tree.map(np.asarray, state.ema_params))
    os.makedirs(os.path.dirname(args.export), exist_ok=True)
    np.savez_compressed(args.export, **flat)
    sz = os.path.getsize(args.export) / 1e6
    print(f"exported ema params -> {args.export} ({sz:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
