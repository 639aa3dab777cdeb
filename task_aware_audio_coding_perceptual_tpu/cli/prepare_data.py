"""Data preparation CLI.

Subcommands covering the reference's data tooling:

- ``chime``: transcription-driven chunking of session WAVs into complex-
  spectrogram pickles (``spectrogram.ipynb`` cells 1/8/10).
- ``mix``: WSJ0-style clean+noise mixing at uniform SNR
  (``sgmse/preprocessing/create_wsj0_chime3.py``).
- ``reverb``: reverberant pairs with T60/DRR logging
  (``create_wsj0_reverb.py``).
"""

from __future__ import annotations

import argparse

from task_aware_audio_coding_perceptual_tpu.data import chime, synth


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pc = sub.add_parser("chime", help="chunk a session wav into spectrogram pkls")
    pc.add_argument("--wav", required=True)
    pc.add_argument("--out_dir", required=True)
    pc.add_argument("--transcription", default=None)
    pc.add_argument("--speaker", default=None)
    pc.add_argument("--chunk_seconds", type=float, default=3.0)
    pc.add_argument("--split", default="Train")
    pc.add_argument("--n_fft", type=int, default=2048)
    pc.add_argument("--hop_length", type=int, default=512)

    pm = sub.add_parser("mix", help="mix clean + noise pools at uniform SNR")
    pm.add_argument("--clean_dir", required=True)
    pm.add_argument("--noise_dir", required=True)
    pm.add_argument("--out_dir", required=True)
    pm.add_argument("--snr_min", type=float, default=0.0)
    pm.add_argument("--snr_max", type=float, default=20.0)
    pm.add_argument("--max_per_split", type=int, default=None)

    pr = sub.add_parser("reverb", help="create anechoic/reverb pairs")
    pr.add_argument("--clean_dir", required=True)
    pr.add_argument("--out_dir", required=True)
    pr.add_argument("--t60_min", type=float, default=0.4)
    pr.add_argument("--t60_max", type=float, default=1.0)
    pr.add_argument("--max_per_split", type=int, default=None)

    args = p.parse_args(argv)
    if args.cmd == "chime":
        n = chime.process_audio_file(
            args.wav, args.out_dir, transcription_json=args.transcription,
            speaker=args.speaker, chunk_seconds=args.chunk_seconds,
            n_fft=args.n_fft, hop_length=args.hop_length, split=args.split,
        )
        print(f"wrote {n} chunks")
    elif args.cmd == "mix":
        written = synth.create_mixture_dataset(
            args.clean_dir, args.noise_dir, args.out_dir,
            snr_range=(args.snr_min, args.snr_max), max_per_split=args.max_per_split,
        )
        print(f"wrote {written}")
    elif args.cmd == "reverb":
        n = synth.create_reverb_dataset(
            args.clean_dir, args.out_dir,
            t60_range=(args.t60_min, args.t60_max), max_per_split=args.max_per_split,
        )
        print(f"wrote {n} pairs")


if __name__ == "__main__":
    main()
