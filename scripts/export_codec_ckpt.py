"""Export a trained codec checkpoint to a compact npz inference artifact.

The quality-regression test (``tests/test_codec_quality.py``) loads this
artifact — generator params + RVQ codebooks only, no optimizer/disc state —
and asserts held-out SI-SDR above a floor, converting "training ran" into a
committed, re-checkable quality claim (the reference's analogue is its
committed result CSVs, BASELINE.md).

Usage:
    python scripts/export_codec_ckpt.py --ckpt runs/codec_gan_r2/best \
        --out tests/golden/codec_8q_params.npz [--gan]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# canonical artifact flatten/unflatten live in train/checkpoints.py (ADVICE r3:
# keep one implementation so the artifact format cannot drift between the
# exporter and the loader)
from task_aware_audio_coding_perceptual_tpu.train.checkpoints import (  # noqa: E402
    _ARTIFACT_SEP as SEP,
    flatten_artifact as flatten,
    unflatten_artifact as unflatten,
    load_codec_artifact,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="orbax save_single dir")
    p.add_argument("--out", required=True)
    p.add_argument("--gan", action="store_true", help="GAN train state layout")
    p.add_argument("--channels", type=int, default=None,
                   help="CodecConfig.channels of the trained model; stored "
                        "in the artifact so loaders rebuild the right config")
    p.add_argument("--lstm_layers", type=int, default=None,
                   help="CodecConfig.lstm_layers of the trained model; stored "
                        "as config_lstm_layers when given")
    p.add_argument("--bottleneck_blocks", type=int, default=None,
                   help="CodecConfig.bottleneck_blocks; stored as "
                        "config_bottleneck_blocks when given")
    args = p.parse_args()

    import jax

    # force CPU: sitecustomize pre-imports jax, so the JAX_PLATFORMS env var
    # is too late; restoring 100+ MB through the TPU relay hangs
    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp

    # template-free raw restore as plain numpy: immune to optimizer/schedule
    # pytree differences AND to the saved TPU device placement
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(os.path.abspath(args.ckpt)).item_metadata
    tree = meta.tree if hasattr(meta, "tree") else meta
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
    )
    raw = ckptr.restore(os.path.abspath(args.ckpt), restore_args=restore_args)
    params = raw["gen_params" if args.gan else "params"]
    rvq_codebooks = raw["rvq"]["codebooks"]

    flat = {f"params{SEP}{k}": v for k, v in flatten(params).items()}
    flat["rvq_codebooks"] = np.asarray(rvq_codebooks)
    if args.channels is not None:
        flat["config_channels"] = np.asarray(args.channels)
    if args.lstm_layers is not None:
        flat["config_lstm_layers"] = np.asarray(args.lstm_layers)
    if args.bottleneck_blocks is not None:
        flat["config_bottleneck_blocks"] = np.asarray(args.bottleneck_blocks)
    np.savez_compressed(args.out, **flat)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({size_mb:.1f} MB, {len(flat)} arrays)")


def load_artifact(path):
    """Load the npz back into (params_tree, codebooks)."""
    return load_codec_artifact(path)


if __name__ == "__main__":
    main()
