"""Diagnose the round-2 SGMSE enhancement catastrophe (VERDICT weak #1).

Cheap sanity bounds on the enhancement *inference chain* (reference chain:
``sgmse/sgmse/model.py:426-465`` normalize->stft->spec_fwd->pad->PC
sampler->istft->renorm), isolating "chain bug" from "undertrained model":

A. analytic-score enhance: run the real spec_fwd/pad/sampler/istft chain
   with the *analytic* OUVE score around the known clean spec. Must come
   out near-perfect; a failure here = inference-chain bug.
B. untrained-model enhance: random-init score net. Expected garbage, but
   bounds what "no training at all" looks like.
C. EMA-vs-live params on the committed 240-step demo checkpoint: with
   ema_decay=0.999, 240 steps leaves ema ~79% random-init - the round-2
   report evaluated exactly those weights.
D. single-pair overfit: train a tiny backbone on ONE (x, y) pair and
   enhance that same y. If the chain is sound this must show a large win.

Usage: python scripts/diag_sgmse.py [--steps 1500] [--skip-overfit]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_pair(seconds=2.04, sr=16000, seed=0, snr_db=5.0):
    """Speech-like clean signal + pink-ish noise mixture."""
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    # harmonic stack with pitch modulation + formant-ish AM, amplitude bursts
    f0 = 120 + 30 * np.sin(2 * np.pi * 2.1 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    x = sum(
        (0.6 / k) * np.sin(k * phase + rng.uniform(0, 2 * np.pi))
        for k in range(1, 9)
    )
    bursts = (0.5 + 0.5 * np.sign(np.sin(2 * np.pi * 1.3 * t + 0.7))) * (
        0.4 + 0.6 * (0.5 + 0.5 * np.sin(2 * np.pi * 0.5 * t))
    )
    x = (x * bursts).astype(np.float32)
    x /= np.abs(x).max()
    w = rng.standard_normal(n).astype(np.float32)
    pink = np.convolve(w, np.ones(8) / 8.0, mode="same")
    pink /= np.sqrt((pink**2).mean())
    sig_rms = np.sqrt((x**2).mean())
    noise = pink * sig_rms * 10 ** (-snr_db / 20)
    y = (x + noise).astype(np.float32)
    return x, y


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--N", type=int, default=30)
    p.add_argument("--skip-overfit", action="store_true")
    p.add_argument("--skip-ckpt", action="store_true")
    p.add_argument("--out", default="/tmp/diag_sgmse.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from task_aware_audio_coding_perceptual_tpu import dsp, metrics as M
    from task_aware_audio_coding_perceptual_tpu.models.sgmse import sampling
    from task_aware_audio_coding_perceptual_tpu.models.sgmse.score_model import (
        ScoreModel,
        ScoreModelConfig,
        SpecTransforms,
    )

    report = {}
    x, y = make_pair()
    tr = SpecTransforms()
    report["noisy_si_sdr"] = float(M.si_sdr(x, y))
    print(f"noisy baseline SI-SDR: {report['noisy_si_sdr']:.2f} dB", flush=True)

    cfg = ScoreModelConfig(
        backbone="ncsnpp",
        backbone_kwargs=(("nf", 32), ("ch_mult", (1, 1, 2)),
                         ("num_res_blocks", 1), ("attn_resolutions", (16,))),
    )
    model = ScoreModel(cfg)

    # ---- A. analytic-score through the full enhance chain ----------------
    @jax.jit
    def full_chain_analytic(xr, yr, key):
        xw = xr[None]
        yw = yr[None]
        norm = jnp.max(jnp.abs(yw))
        X0 = dsp.pad_spec(tr.spec_fwd(tr.stft(xw / norm))[None])
        Y = dsp.pad_spec(tr.spec_fwd(tr.stft(yw / norm))[None])
        sde = model.sde.copy(N=args.N)

        def score(xs, ys, t):
            mean, std = sde.marginal_prob(X0, ys, t)
            return -(xs - mean) / (std.reshape(-1, 1, 1, 1) ** 2)

        sampler = sampling.get_pc_sampler(
            "reverse_diffusion", "ald", sde, score, Y, snr=0.5, eps=cfg.t_eps)
        sample, _ = sampler(key)
        xh = tr.istft(tr.spec_back(sample[:, 0]), length=xr.shape[-1])
        return (xh * norm)[0]

    # spec-domain magnitude scale, for the record
    @jax.jit
    def spec_scale(yr):
        Y = tr.spec_fwd(tr.stft(yr[None] / jnp.max(jnp.abs(yr))))
        a = jnp.abs(Y)
        return jnp.mean(a), jnp.percentile(a, 90), jnp.max(a)

    mean_a, p90_a, max_a = [float(v) for v in spec_scale(jnp.asarray(y))]
    report["spec_mag"] = {"mean": mean_a, "p90": p90_a, "max": max_a}
    print(f"compressed-spec |Y|: mean {mean_a:.4f} p90 {p90_a:.4f} max {max_a:.4f} "
          f"(vs sigma_min 0.05 / sigma_max 0.5)", flush=True)

    xh = np.asarray(full_chain_analytic(jnp.asarray(x), jnp.asarray(y), jax.random.key(1)))
    report["analytic_chain_si_sdr"] = float(M.si_sdr(x, xh))
    print(f"A. analytic-score full chain SI-SDR: {report['analytic_chain_si_sdr']:.2f} dB",
          flush=True)

    # ---- B. untrained model ----------------------------------------------
    Fq = tr.n_fft // 2 + 1
    state = model.init(jax.random.key(0), spec_shape=(1, 1, Fq, 256))
    xh_u = model.enhance(state.params, jnp.asarray(y), key=jax.random.key(2), N=args.N)
    report["untrained_si_sdr"] = float(M.si_sdr(x, xh_u[: len(x)]))
    print(f"B. untrained-model enhance SI-SDR: {report['untrained_si_sdr']:.2f} dB", flush=True)

    # ---- C. committed demo checkpoint: params vs ema_params ---------------
    ckdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "runs", "sgmse_demo", "checkpoints")
    if not args.skip_ckpt and os.path.isdir(ckdir):
        try:
            from task_aware_audio_coding_perceptual_tpu.train.checkpoints import (
                CheckpointManager,
            )
            mgr = CheckpointManager(ckdir, max_to_keep=3)
            st = mgr.restore(state)
            mgr.close()
            for name, pp in (("params", st.params), ("ema_params", st.ema_params)):
                xh_c = model.enhance(pp, jnp.asarray(y), key=jax.random.key(3), N=args.N)
                v = float(M.si_sdr(x, xh_c[: len(x)]))
                report[f"demo240_{name}_si_sdr"] = v
                print(f"C. demo 240-step ckpt [{name}] SI-SDR: {v:.2f} dB", flush=True)
        except Exception as e:  # pragma: no cover
            print("C. checkpoint eval failed:", repr(e), flush=True)
            report["demo240_error"] = repr(e)

    # ---- D. single-pair overfit -------------------------------------------
    if not args.skip_overfit:
        train_step = jax.jit(model.make_train_step())
        norm = np.abs(y).max()

        @jax.jit
        def make_batch(xr, yr):
            X = tr.spec_fwd(tr.stft(xr[None] / norm))[None]
            Y = tr.spec_fwd(tr.stft(yr[None] / norm))[None]
            # crop to num_frames like training
            return X[..., :256], Y[..., :256]

        X, Y = make_batch(jnp.asarray(x), jnp.asarray(y))
        Xr = jnp.stack([X.real, X.imag], -1)
        Yr = jnp.stack([Y.real, Y.imag], -1)
        key = jax.random.key(7)
        t0 = time.time()
        losses = []
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            state, m = train_step(state, sub, Xr, Yr)
            if i % 100 == 0 or i == args.steps - 1:
                losses.append(float(m["train_loss"]))
                print(f"  step {i}: loss {losses[-1]:.1f}  ({time.time()-t0:.0f}s)",
                      flush=True)
        report["overfit_losses"] = losses
        for name, pp in (("params", state.params), ("ema_params", state.ema_params)):
            xh_t = model.enhance(pp, jnp.asarray(y), key=jax.random.key(4), N=args.N)
            v = float(M.si_sdr(x, xh_t[: len(x)]))
            report[f"overfit_{name}_si_sdr"] = v
            print(f"D. overfit({args.steps}) [{name}] enhance SI-SDR: {v:.2f} dB "
                  f"(noisy {report['noisy_si_sdr']:.2f})", flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
