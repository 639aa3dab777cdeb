"""Evaluate a committed codec artifact on held-out utterances with the
full perceptual metric set (VERDICT r3 item 5: report STOI/ESTOI and the
PESQ proxy alongside SI-SDR in the artifact table).

Round-trips N unseen synthetic-speech utterances (seeds disjoint from the
training corpus, same convention as tests/test_codec_quality.py) through
encode -> RVQ -> decode and reports per-file + mean SI-SDR, STOI, ESTOI,
and PESQ-proxy (metrics.pesq_p862 — P.862-style, not ITU-bit-exact).

Usage:
    python scripts/eval_codec_artifact.py \
        --artifact tests/golden/codec_8q_params.npz --channels 32 \
        --out results/codec_artifact_metrics.json
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from export_codec_ckpt import load_artifact


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", default="tests/golden/codec_8q_params.npz")
    p.add_argument("--channels", type=int, default=None,
                   help="override CodecConfig.channels (default: value "
                        "stored in the artifact, else config default)")
    p.add_argument("--n-files", type=int, default=16)
    p.add_argument("--seed-base", type=int, default=10_000_019,
                   help="held-out seed range (training corpus used "
                        "seed*1_000_003 + i, seed=0, i<2000)")
    p.add_argument("--out", default="results/codec_artifact_metrics.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from task_aware_audio_coding_perceptual_tpu import metrics as M
    from task_aware_audio_coding_perceptual_tpu.data import speech_synth
    from task_aware_audio_coding_perceptual_tpu.metrics.sdr import si_sdr_jax
    from task_aware_audio_coding_perceptual_tpu.models import rvq as rvq_lib
    from task_aware_audio_coding_perceptual_tpu.models.codec import (
        CodecConfig,
        NeuralAudioCodec,
    )

    params_tree, codebooks = load_artifact(args.artifact)
    z = np.load(args.artifact)
    channels = args.channels
    if channels is None:
        channels = int(z["config_channels"]) if "config_channels" in z.files \
            else CodecConfig().channels
    cfg = CodecConfig(channels=channels)
    model = NeuralAudioCodec(cfg)
    params = jax.tree.map(jnp.asarray, {"params": params_tree["params"]})
    cb = jnp.asarray(codebooks)
    rvq_state = rvq_lib.RvqState(
        codebooks=cb, ema_count=jnp.ones(cb.shape[:2]), ema_sum=cb * 1.0
    )

    sr = cfg.sample_rate
    T = sr - (sr % cfg.hop)
    wav = np.stack([
        speech_synth.synthesize_utterance(
            np.random.default_rng(args.seed_base + i), duration=1.0)[:T]
        for i in range(args.n_files)
    ])[..., None].astype(np.float32)

    @jax.jit
    def roundtrip(w):
        zz = model.apply(params, w, method=NeuralAudioCodec.encode)
        q = rvq_lib.quantize(rvq_state, zz, use_pallas=False)
        y = model.apply(params, q.quantized, method=NeuralAudioCodec.decode)
        return y, si_sdr_jax(w[..., 0], y[..., 0])

    dec, sisdr = roundtrip(jnp.asarray(wav))
    dec = np.asarray(dec)[..., 0]
    ref = wav[..., 0]
    per = []
    for i in range(args.n_files):
        per.append({
            "si_sdr": float(np.asarray(sisdr)[i]),
            "stoi": float(M.stoi(ref[i], dec[i], sr)),
            "estoi": float(M.stoi(ref[i], dec[i], sr, extended=True)),
            "pesq_proxy": float(M.pesq_p862(sr, ref[i], dec[i], "wb")),
        })
    mean = {k: round(float(np.mean([r[k] for r in per])), 4) for k in per[0]}
    report = {
        "artifact": args.artifact,
        "channels": channels,
        "num_quantizers": cfg.num_quantizers,
        "n_files": args.n_files,
        "mean": mean,
        "per_file": [{k: round(v, 4) for k, v in r.items()} for r in per],
    }
    print(json.dumps({"mean": mean, "channels": channels}, indent=2))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
