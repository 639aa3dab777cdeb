"""SGMSE training CLI (reference ``sgmse/train.py``).

Dynamic composition like the reference (``train.py:30-66``): a throwaway
parser reads --backbone/--sde, then the chosen components' arguments are
exposed; grouped values route to the right constructors.

Example:
    python -m task_aware_audio_coding_perceptual_tpu.cli.train_sgmse \
        --base_dir ./data --backbone ncsnpp --sde ouve --batch_size 8
"""

from __future__ import annotations

import argparse

from task_aware_audio_coding_perceptual_tpu.data.datamodule import SpecsDataModule
from task_aware_audio_coding_perceptual_tpu.models import sgmse  # registries
from task_aware_audio_coding_perceptual_tpu.models.sgmse.score_model import (
    ScoreModel,
    ScoreModelConfig,
    SpecTransforms,
)
from task_aware_audio_coding_perceptual_tpu.train.sgmse_train import (
    SgmseTrainerConfig,
    train_sgmse,
)


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base_dir", type=str, required=True)
    p.add_argument("--format", type=str, choices=("default", "reverb"), default="default")
    p.add_argument("--backbone", type=str, default="ncsnpp",
                   choices=sgmse.BackboneRegistry.get_all_names())
    p.add_argument("--sde", type=str, default="ouve",
                   choices=sgmse.SDERegistry.get_all_names())
    # ScoreModel args (reference model.py:24-39)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--t_eps", type=float, default=0.03)
    p.add_argument("--num_eval_files", type=int, default=20)
    p.add_argument("--loss_type", type=str, default="score_matching")
    p.add_argument("--loss_weighting", type=str, default="sigma^2")
    p.add_argument("--sr", type=int, default=16000)
    # OUVE args (reference sdes.py:146-153)
    p.add_argument("--theta", type=float, default=1.5)
    p.add_argument("--sigma-min", type=float, default=0.05)
    p.add_argument("--sigma-max", type=float, default=0.5)
    p.add_argument("--N", type=int, default=30)
    p.add_argument("--sampler_type", type=str, default="pc")
    # data args (reference data_module.py:104-119)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--n_fft", type=int, default=510)
    p.add_argument("--hop_length", type=int, default=128)
    p.add_argument("--num_frames", type=int, default=256)
    p.add_argument("--window", type=str, choices=("sqrthann", "hann"), default="hann")
    p.add_argument("--dummy", action="store_true")
    p.add_argument("--spec_factor", type=float, default=0.15)
    p.add_argument("--spec_abs_exponent", type=float, default=0.5)
    p.add_argument("--normalize", type=str, choices=("clean", "noisy", "not"), default="noisy")
    p.add_argument("--transform_type", type=str, default="exponent")
    # backbone args
    p.add_argument("--nf", type=int, default=128)
    # trainer
    p.add_argument("--max_epochs", type=int, default=100)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--log_dir", type=str, default="./logs_sgmse")
    p.add_argument("--ckpt", type=str, default=None, help="resume checkpoint dir")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel degree over the device mesh "
                        "(reference: Lightning DDP); -1 = all devices")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.sde == "ouve":
        sde_kwargs = (
            ("theta", args.theta), ("sigma_min", args.sigma_min),
            ("sigma_max", args.sigma_max), ("N", args.N),
            ("sampler_type", args.sampler_type),
        )
    else:
        sde_kwargs = (("N", args.N), ("sampler_type", args.sampler_type))
    backbone_kwargs = (("nf", args.nf),) if args.backbone.startswith("ncsnpp") else ()

    config = ScoreModelConfig(
        backbone=args.backbone, sde=args.sde, lr=args.lr,
        ema_decay=args.ema_decay, t_eps=args.t_eps,
        loss_type=args.loss_type, loss_weighting=args.loss_weighting,
        num_eval_files=args.num_eval_files, sr=args.sr,
        backbone_kwargs=backbone_kwargs, sde_kwargs=sde_kwargs,
    )
    transforms = SpecTransforms(
        n_fft=args.n_fft, hop_length=args.hop_length, window=args.window,
        spec_factor=args.spec_factor, spec_abs_exponent=args.spec_abs_exponent,
        transform_type=args.transform_type, num_frames=args.num_frames,
    )
    model = ScoreModel(config, transforms)
    data = SpecsDataModule(
        base_dir=args.base_dir, format=args.format, batch_size=args.batch_size,
        n_fft=args.n_fft, hop_length=args.hop_length, num_frames=args.num_frames,
        window=args.window, dummy=args.dummy, spec_factor=args.spec_factor,
        spec_abs_exponent=args.spec_abs_exponent, normalize=args.normalize,
        transform_type=args.transform_type,
    )
    tcfg = SgmseTrainerConfig(
        max_epochs=args.max_epochs,
        num_eval_files=args.num_eval_files,
        log_dir=args.log_dir,
        max_steps=args.max_steps,
        dp=args.dp,
    )
    train_sgmse(model, data, tcfg, resume_from=args.ckpt)


if __name__ == "__main__":
    main()
