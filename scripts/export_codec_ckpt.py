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


def flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten(flat):
    tree = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="orbax save_single dir")
    p.add_argument("--out", required=True)
    p.add_argument("--gan", action="store_true", help="GAN train state layout")
    args = p.parse_args()

    import jax
    from task_aware_audio_coding_perceptual_tpu.models.codec import CodecConfig
    from task_aware_audio_coding_perceptual_tpu.train import checkpoints, codec_train, gan_train

    cfg = CodecConfig()
    if args.gan:
        model, disc, state, *_ = gan_train.create_gan_state(cfg, jax.random.key(0))
        state = checkpoints.restore_single(args.ckpt, state)
        params, rvq = state.gen_params, state.rvq
    else:
        model, state, _ = codec_train.create_train_state(cfg, jax.random.key(0))
        state = checkpoints.restore_single(args.ckpt, state)
        params, rvq = state.params, state.rvq

    flat = {f"params/{k}": v for k, v in flatten(params).items()}
    flat["rvq/codebooks"] = np.asarray(rvq.codebooks)
    np.savez_compressed(args.out, **flat)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({size_mb:.1f} MB, {len(flat)} arrays)")


def load_artifact(path):
    """Load the npz back into (params_tree, codebooks)."""
    z = np.load(path)
    flat_params = {k[len("params/"):]: z[k] for k in z.files if k.startswith("params/")}
    return unflatten(flat_params), z["rvq/codebooks"]


if __name__ == "__main__":
    main()
