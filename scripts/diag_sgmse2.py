"""Decisive SGMSE trainability probe (follow-up to diag_sgmse.py).

diag_sgmse.py established: inference chain correct (analytic score -> 53 dB
through the full enhance pipeline), but a 1500-step single-pair overfit
plateaus near half the init loss and enhances at -30 dB. This probe answers
"is the model trainable at all" with a longer, hotter overfit run:

- lr 3e-4, thousands of steps, single (x, y) pair;
- tracks the score-matching residual split into real/imag parts and by
  t-bucket (low/mid/high) to localize what is(n't) being learned;
- enhances periodically with live params, N=30.

Usage: python scripts/diag_sgmse2.py --steps 8000
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from diag_sgmse import make_pair  # reuse the synthetic pair


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=8000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--nf", type=int, default=48)
    p.add_argument("--N", type=int, default=30)
    p.add_argument("--eval-every", type=int, default=2000)
    p.add_argument("--out", default="/tmp/diag_sgmse2.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from task_aware_audio_coding_perceptual_tpu import metrics as M
    from task_aware_audio_coding_perceptual_tpu.models.sgmse import sampling
    from task_aware_audio_coding_perceptual_tpu.models.sgmse.score_model import (
        ScoreModel,
        ScoreModelConfig,
        SpecTransforms,
    )
    from task_aware_audio_coding_perceptual_tpu.models.sgmse.sdes import _bcast

    report = {"steps": args.steps, "lr": args.lr, "nf": args.nf}
    x, y = make_pair()
    tr = SpecTransforms()
    report["noisy_si_sdr"] = float(M.si_sdr(x, y))

    cfg = ScoreModelConfig(
        backbone="ncsnpp",
        lr=args.lr,
        backbone_kwargs=(("nf", args.nf), ("ch_mult", (1, 1, 2)),
                         ("num_res_blocks", 1), ("attn_resolutions", (16,))),
    )
    model = ScoreModel(cfg)
    Fq = tr.n_fft // 2 + 1
    state = model.init(jax.random.key(0), spec_shape=(1, 1, Fq, 256))
    train_step = jax.jit(model.make_train_step())

    norm = np.abs(y).max()

    @jax.jit
    def make_batch(xr, yr):
        X = tr.spec_fwd(tr.stft(xr[None] / norm))[None]
        Y = tr.spec_fwd(tr.stft(yr[None] / norm))[None]
        return X[..., :256], Y[..., :256]

    X, Y = make_batch(jnp.asarray(x), jnp.asarray(y))
    Xr = jnp.stack([X.real, X.imag], -1)
    Yr = jnp.stack([Y.real, Y.imag], -1)

    @jax.jit
    def residual_probe(params, key, t_val):
        """score-matching residual (sigma*s + z) energy split re/im at t."""
        Xc = (Xr[..., 0] + 1j * Xr[..., 1]).astype(jnp.complex64)
        Yc = (Yr[..., 0] + 1j * Yr[..., 1]).astype(jnp.complex64)
        t = jnp.full((1,), t_val)
        mean, std = model.sde.marginal_prob(Xc, Yc, t)
        z = sampling._randn_like(key, Xc)
        x_t = mean + _bcast(std, Xc) * z
        s = model.forward(params, x_t, Yc, t)
        r = s * _bcast(std, Xc) + z
        return jnp.sum(jnp.square(r.real)), jnp.sum(jnp.square(r.imag))

    key = jax.random.key(7)
    t0 = time.time()
    curve = []
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        state, m = train_step(state, sub, Xr, Yr)
        if i % 500 == 0 or i == args.steps - 1:
            loss = float(m["train_loss"])
            probes = {}
            for tv in (0.1, 0.5, 0.9):
                rr, ri = residual_probe(state.params, jax.random.key(99), tv)
                probes[f"t{tv}"] = [round(float(rr), 1), round(float(ri), 1)]
            curve.append({"step": i, "loss": round(loss, 1), **probes})
            print(f"step {i}: loss {loss:.1f} residuals(re,im) {probes} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if (i + 1) % args.eval_every == 0 or i == args.steps - 1:
            xh = model.enhance(state.params, jnp.asarray(y),
                               key=jax.random.key(5), N=args.N)
            v = float(M.si_sdr(x, xh[: len(x)]))
            curve.append({"step": i, "enhance_si_sdr": round(v, 2)})
            print(f"  >> step {i}: enhance SI-SDR {v:.2f} dB "
                  f"(noisy {report['noisy_si_sdr']:.2f})", flush=True)

    report["curve"] = curve
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["curve"][-4:], indent=2), flush=True)


if __name__ == "__main__":
    main()
