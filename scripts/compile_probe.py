"""Probe which part of a model's graph blows up remote-compile time.

The axon remote compiler has shown pathological first-compile times
(NCSN++ tiny ~17 min, PARITY.md; SpectralResE4D1 full-size >60 min and
wedging the relay). This script times, separately:

  1. jitted init
  2. jitted forward
  3. jitted forward+backward (value_and_grad)
  4. jitted full train step (grad + adam update)

for a chosen model/shape, so the explosion can be localized (tracing vs
XLA passes vs the optimizer fusion) and fixes (remat boundaries, smaller
batch, optimizer sharding) evaluated. Results append to
``/tmp/compile_probe.jsonl``.

Usage:
    python scripts/compile_probe.py --model SpectralResE4D1 --freq 1025 \
        --time 600 --batch 4
    python scripts/compile_probe.py --model ncsnpp --nf 32
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def probe_spectral(args):
    import jax
    import jax.numpy as jnp
    import optax
    from task_aware_audio_coding_perceptual_tpu.models import spectral

    F, T, B = args.freq, args.time, args.batch
    kw = dict(total_features_after=64, freq_dim=F, time_dim=T)
    if args.model == "SpectralResE4D1":
        model = spectral.SpectralResE4D1(z_dim1=64, z_dim2=64, z_dim3=64, z_dim4=64, **kw)
        n_obs = 4
    elif args.model == "SpectralResE2D1":
        model = spectral.SpectralResE2D1(z_dim1=128, z_dim2=128, **kw)
        n_obs = 2
    else:
        model = spectral.SpectralResE1D1(z_dim=256, **kw)
        n_obs = 1

    rng = np.random.default_rng(0)
    obs = [
        {
            "magnitude": jnp.asarray(np.abs(rng.standard_normal((B, F, T))), jnp.float32),
            "phase": jnp.asarray(rng.standard_normal((B, F, T)), jnp.float32),
        }
        for _ in range(n_obs)
    ]
    rngs = {"params": jax.random.key(0), "bottleneck": jax.random.key(1)}

    stages = {}
    t0 = time.time()
    variables = jax.jit(model.init)(rngs, *obs)
    jax.block_until_ready(variables)
    stages["init"] = round(time.time() - t0, 1)
    print("init", stages["init"], flush=True)

    def fwd(v, *o):
        return model.apply(v, *o, rngs={"bottleneck": jax.random.key(2)}).total_mse

    t0 = time.time()
    out = jax.jit(fwd)(variables, *obs)
    jax.block_until_ready(out)
    stages["forward"] = round(time.time() - t0, 1)
    print("forward", stages["forward"], flush=True)

    t0 = time.time()
    g = jax.jit(jax.grad(fwd))(variables, *obs)
    jax.block_until_ready(g)
    stages["grad"] = round(time.time() - t0, 1)
    print("grad", stages["grad"], flush=True)

    tx = optax.adam(1e-4)
    opt_state = tx.init(variables)

    def train_step(v, os_, *o):
        grads = jax.grad(fwd)(v, *o)
        upd, os2 = tx.update(grads, os_, v)
        return optax.apply_updates(v, upd), os2

    t0 = time.time()
    v2, os2 = jax.jit(train_step)(variables, opt_state, *obs)
    jax.block_until_ready(v2)
    stages["train_step"] = round(time.time() - t0, 1)
    print("train_step", stages["train_step"], flush=True)
    return stages


def probe_ncsnpp(args):
    """Ablation probe for the NCSN++ reference-size compile blow-up
    (VERDICT r3 item 9: 403 s first compile at nf=128, 7 levels).

    Components that can be switched off to localize the cost:
      --no-flash        einsum attention instead of the Pallas kernel
      --no-fir          naive 2x resampling instead of upfirdn2d FIR
      --no-progressive  disable input_skip/output_skip pyramids
      --no-attn         drop the attention blocks entirely
      --levels N        truncate ch_mult to its first N entries
      --effort E        XLA exec_time_optimization_effort in [-1, 1]
                        (lower = faster compile, less optimized code)
      --remat           nn.remat the resblocks (recompute-in-backward);
                        shrinks the autodiff HLO the grad stage compiles
    """
    import jax
    import jax.numpy as jnp
    from task_aware_audio_coding_perceptual_tpu.models.sgmse.ncsnpp import NCSNppBase

    ch_mult = (1, 1, 2, 2, 2, 2, 2)[: args.levels]
    model = NCSNppBase(
        nf=args.nf,
        ch_mult=ch_mult,
        num_res_blocks=2,
        attn_resolutions=() if args.no_attn else (16,),
        fir=not args.no_fir,
        progressive="none" if args.no_progressive else "output_skip",
        progressive_input="none" if args.no_progressive else "input_skip",
        use_flash=False if args.no_flash else None,
        remat=args.remat,
    )
    # reference training shape: n_fft 510 -> 256 freq bins, 256 frames
    x4 = jnp.zeros((args.batch, 256, args.time, 4))
    t = jnp.full((args.batch,), 0.5)
    opts = (
        {"exec_time_optimization_effort": args.effort}
        if args.effort is not None
        else None
    )

    def timed(name, fn, *a):
        t0 = time.time()
        lowered = jax.jit(fn).lower(*a)
        traced = round(time.time() - t0, 1)
        out = lowered.compile(compiler_options=opts)
        dt = round(time.time() - t0, 1)
        print(f"{name}: {dt}s (trace {traced}s)", flush=True)
        return out, dt

    compiled_init, t_init = timed("init", model.init, jax.random.key(0), x4, t)
    params = compiled_init(jax.random.key(0), x4, t)
    jax.block_until_ready(params)

    _, t_fwd = timed("forward", model.apply, params, x4, t)

    def loss(p):
        return jnp.mean(model.apply(p, x4, t) ** 2)

    compiled_grad, t_grad = timed("grad", jax.grad(loss), params)
    out = {"init": t_init, "forward": t_fwd, "grad": t_grad,
           "config": {"nf": args.nf, "levels": len(ch_mult),
                      "flash": not args.no_flash, "fir": not args.no_fir,
                      "progressive": not args.no_progressive,
                      "attn": not args.no_attn, "effort": args.effort,
                      "remat": args.remat}}
    if args.exec_iters:
        jax.block_until_ready(compiled_grad(params))  # warm
        t0 = time.time()
        for _ in range(args.exec_iters):
            g = compiled_grad(params)
        jax.block_until_ready(g)
        out["grad_exec_s"] = round((time.time() - t0) / args.exec_iters, 3)
        print(f"grad exec: {out['grad_exec_s']}s/step", flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="SpectralResE4D1")
    p.add_argument("--freq", type=int, default=1025)
    p.add_argument("--time", type=int, default=600)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--nf", type=int, default=32)
    p.add_argument("--levels", type=int, default=7)
    p.add_argument("--no-flash", action="store_true")
    p.add_argument("--no-fir", action="store_true")
    p.add_argument("--no-progressive", action="store_true")
    p.add_argument("--no-attn", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--exec-iters", type=int, default=0,
                   help="also time N steady-state executions of the "
                        "compiled grad (flash vs einsum step-time A/B)")
    p.add_argument("--effort", type=float, default=None,
                   help="XLA exec_time_optimization_effort in [-1, 1]")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (JAX_PLATFORMS is too late "
                        "on this box: sitecustomize pre-imports jax)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    stages = probe_ncsnpp(args) if args.model == "ncsnpp" else probe_spectral(args)
    rec = {"model": args.model, "backend": jax.default_backend(),
           "shape": [args.batch, args.freq, args.time], **stages}
    with open("/tmp/compile_probe.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
