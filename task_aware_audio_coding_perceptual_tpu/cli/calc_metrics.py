"""Metrics CLI (reference ``sgmse/calc_metrics.py``).

PESQ(-proxy)/ESTOI/SI-SDR/SI-SIR/SI-SAR over a directory triple
(clean, noisy, enhanced) -> ``_results.csv`` + ``_avg_results.txt``.
"""

from __future__ import annotations

import argparse
import csv
import glob
import os

import numpy as np

from task_aware_audio_coding_perceptual_tpu import metrics as M
from task_aware_audio_coding_perceptual_tpu.data import wav_io


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--test_dir", type=str, required=True,
                   help="dir with clean/ and noisy/ subdirs")
    p.add_argument("--enhanced_dir", type=str, required=True)
    args = p.parse_args(argv)

    clean_files = sorted(glob.glob(os.path.join(args.test_dir, "clean", "*.wav")))
    rows = []
    for cf in clean_files:
        base = os.path.basename(cf)
        nf = os.path.join(args.test_dir, "noisy", base)
        ef = os.path.join(args.enhanced_dir, base)
        if not (os.path.exists(nf) and os.path.exists(ef)):
            continue
        x, sr = wav_io.load(cf)
        y, _ = wav_io.load(nf)
        x_hat, _ = wav_io.load(ef)
        L = min(x.shape[-1], y.shape[-1], x_hat.shape[-1])
        x, y, x_hat = x[0][:L], y[0][:L], x_hat[0][:L]
        n = y - x
        si_sdr_v, si_sir, si_sar = M.energy_ratios(x_hat, x, n)
        rows.append(
            {
                "filename": base,
                "pesq": M.pesq_p862(16000, x, x_hat, "wb"),
                "estoi": M.stoi(x, x_hat, sr, extended=True),
                "si_sdr": si_sdr_v,
                "si_sir": si_sir,
                "si_sar": si_sar,
            }
        )

    out_csv = os.path.join(args.enhanced_dir, "_results.csv")
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)

    with open(os.path.join(args.enhanced_dir, "_avg_results.txt"), "w") as f:
        for k in ("pesq", "estoi", "si_sdr", "si_sir", "si_sar"):
            vals = [r[k] for r in rows]
            line = f"{k}: {M.print_mean_std(vals)}"
            print(line)
            f.write(line + "\n")


if __name__ == "__main__":
    main()
