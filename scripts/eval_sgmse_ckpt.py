"""Standalone held-out evaluation of a trained SGMSE checkpoint.

Decouples the held-out test report from ``train_sgmse_real.py``'s in-process
flow so a long training run can be stopped at any point and its *best*
checkpoint (selected on in-training valid si_sdr, the r4 selection-bug fix)
still produces the full evidence row. Adds the reference's test-time knob
sweep: ``model.enhance`` exposes (N, corrector_steps, snr) exactly like
``sgmse/enhancement.py:40-56`` does (--N/--corrector-steps/--snr CLI), so a
small valid-set grid picks the inference config before the one held-out run.

Usage:
    python scripts/eval_sgmse_ckpt.py --ckpt-dir /tmp/runs/x/checkpoints \
        --backbone dcunet --report-key dcunet
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _avg_metrics(model, params, clean_files, noisy_files, *, N, snr,
                 corrector_steps, key):
    import jax
    import jax.numpy as jnp
    from task_aware_audio_coding_perceptual_tpu import metrics as M
    from task_aware_audio_coding_perceptual_tpu.data import wav_io

    sums = {"pesq_proxy": 0.0, "si_sdr": 0.0, "estoi": 0.0}
    n = len(clean_files)
    for cf, nf in zip(clean_files, noisy_files):
        x, sr = wav_io.load(cf)
        y, _ = wav_io.load(nf)
        key, sub = jax.random.split(key)
        x_hat = model.enhance(params, jnp.asarray(y[0]), key=sub, N=N,
                              snr=snr, corrector_steps=corrector_steps)
        x0 = x[0][: len(x_hat)]
        x_hat = np.asarray(x_hat)[: len(x0)]
        sums["pesq_proxy"] += M.pesq_p862(16000, x0, x_hat, "wb") / n
        sums["si_sdr"] += M.si_sdr(x0, x_hat) / n
        sums["estoi"] += M.stoi(x0, x_hat, sr, extended=True) / n
    return sums


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--step", type=int, default=None,
                   help="explicit checkpoint step (default: best si_sdr)")
    p.add_argument("--backbone", default="dcunet")
    p.add_argument("--sde", default="ouve")
    p.add_argument("--loss-type", default=None)
    p.add_argument("--nf", type=int, default=64)
    p.add_argument("--ch-mult", default="1,1,2")
    p.add_argument("--num-res-blocks", type=int, default=2)
    p.add_argument("--n-fft", type=int, default=None)
    p.add_argument("--data", default="/tmp/sgmse_data_r3")
    p.add_argument("--report", default="results/sgmse_enhancement_report.json")
    p.add_argument("--report-key", default="dcunet")
    p.add_argument("--test-files", type=int, default=20)
    p.add_argument("--valid-files", type=int, default=6,
                   help="files for the inference-config grid")
    p.add_argument("--grid", default="30,1,0.5;50,1,0.5;30,2,0.5;50,1,0.33",
                   help="semicolon list of N,corrector_steps,snr to try on "
                        "valid; best si_sdr config runs the held-out test")
    p.add_argument("--trained-steps", type=int, default=None,
                   help="recorded in the report row (display only)")
    p.add_argument("--export", default=None,
                   help="optional npz export path for the ema params")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp  # noqa: F401
    from task_aware_audio_coding_perceptual_tpu import metrics as M
    from task_aware_audio_coding_perceptual_tpu.data import wav_io
    from task_aware_audio_coding_perceptual_tpu.data.datamodule import SpecsDataModule
    from task_aware_audio_coding_perceptual_tpu.models.sgmse.score_model import (
        ScoreModel,
        ScoreModelConfig,
        SpecTransforms,
    )
    from task_aware_audio_coding_perceptual_tpu.train.checkpoints import (
        CheckpointManager,
    )

    n_fft = args.n_fft or (512 if args.backbone == "dcunet" else 510)
    ch_mult = tuple(int(c) for c in args.ch_mult.split(","))
    loss_type = args.loss_type or (
        "data_prediction" if args.sde == "sbve" else "score_matching"
    )
    backbone_kwargs = ()
    if args.backbone == "ncsnpp":
        backbone_kwargs = (("nf", args.nf), ("ch_mult", ch_mult),
                           ("num_res_blocks", args.num_res_blocks),
                           ("attn_resolutions", (16,)))
    cfg = ScoreModelConfig(backbone=args.backbone, sde=args.sde,
                           loss_type=loss_type, backbone_kwargs=backbone_kwargs)
    model = ScoreModel(cfg, transforms=SpecTransforms(n_fft=n_fft))

    data = SpecsDataModule(base_dir=args.data, batch_size=1, n_fft=n_fft)
    data.setup()
    X0, _ = data.train_set[0]
    state = model.init(jax.random.key(0),
                       spec_shape=(1, 1, X0.shape[-2], X0.shape[-1]))

    mgr = CheckpointManager(args.ckpt_dir, max_to_keep=3,
                            best_metric="si_sdr", best_mode="max")
    step = args.step if args.step is not None else mgr.best_step()
    if step is None:
        step = mgr.latest_step()
    print(f"restoring checkpoint step={step}", flush=True)
    state = mgr.restore(state, step=step)
    mgr.close()

    # ---- inference-config grid on valid files ---------------------------
    vc = data.valid_set.clean_files[: args.valid_files]
    vn = data.valid_set.noisy_files[: args.valid_files]
    best_cfg, best_sdr, grid_rows = None, -1e9, []
    for spec in args.grid.split(";"):
        N, cs, snr = spec.split(",")
        N, cs, snr = int(N), int(cs), float(snr)
        m = _avg_metrics(model, state.ema_params, vc, vn, N=N, snr=snr,
                         corrector_steps=cs, key=jax.random.key(7))
        row = {"N": N, "corrector_steps": cs, "snr": snr,
               **{k: round(v, 3) for k, v in m.items()}}
        grid_rows.append(row)
        print("grid:", row, flush=True)
        if m["si_sdr"] > best_sdr:
            best_sdr, best_cfg = m["si_sdr"], (N, cs, snr)
    N, cs, snr = best_cfg
    print(f"selected inference config: N={N} corrector_steps={cs} snr={snr}",
          flush=True)

    # ---- held-out test --------------------------------------------------
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
    enh = _avg_metrics(model, state.ema_params, clean_files, noisy_files,
                       N=N, snr=snr, corrector_steps=cs, key=jax.random.key(0))

    row = {
        "trained_steps": args.trained_steps or step,
        "best_ckpt_step": step,
        "select_metric": "si_sdr",
        "backbone": {"name": args.backbone, "nf": args.nf,
                     "ch_mult": list(ch_mult),
                     "num_res_blocks": args.num_res_blocks},
        "sde": args.sde,
        "loss_type": loss_type,
        "test_files": len(clean_files),
        "inference": {"N": N, "corrector_steps": cs, "snr": snr,
                      "valid_grid": grid_rows},
        "noisy_baseline": {k: round(float(v), 3) for k, v in base.items()},
        "enhanced": {k: round(float(v), 3) for k, v in enh.items()},
    }
    report = {}
    if os.path.exists(args.report):
        with open(args.report) as f:
            report = json.load(f)
    report.setdefault("runs", {})[args.report_key] = row
    print(json.dumps(row, indent=2), flush=True)
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)

    if args.export:
        from export_codec_ckpt import flatten

        flat = flatten(jax.tree.map(np.asarray, state.ema_params))
        os.makedirs(os.path.dirname(args.export), exist_ok=True)
        np.savez_compressed(args.export, **flat)
        print(f"exported ema params -> {args.export}", flush=True)


if __name__ == "__main__":
    main()
