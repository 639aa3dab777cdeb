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
    import jax
    import jax.numpy as jnp
    from task_aware_audio_coding_perceptual_tpu.models.sgmse.ncsnpp import NCSNpp

    model = NCSNpp(nf=args.nf, ch_mult=(1, 1, 2, 2), num_res_blocks=2,
                   attn_resolutions=(16,), image_size=256)
    x = jnp.zeros((1, 256, 64, 4))
    t = jnp.ones((1,)) * 0.5
    stages = {}
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.key(0), x, t)
    jax.block_until_ready(params)
    stages["init"] = round(time.time() - t0, 1)
    print("init", stages["init"], flush=True)

    t0 = time.time()
    y = jax.jit(model.apply)(params, x, t)
    jax.block_until_ready(y)
    stages["forward"] = round(time.time() - t0, 1)
    print("forward", stages["forward"], flush=True)

    def loss(p):
        return jnp.mean(model.apply(p, x, t) ** 2)

    t0 = time.time()
    g = jax.jit(jax.grad(loss))(params)
    jax.block_until_ready(g)
    stages["grad"] = round(time.time() - t0, 1)
    print("grad", stages["grad"], flush=True)
    return stages


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="SpectralResE4D1")
    p.add_argument("--freq", type=int, default=1025)
    p.add_argument("--time", type=int, default=600)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--nf", type=int, default=32)
    args = p.parse_args()

    import jax

    stages = probe_ncsnpp(args) if args.model == "ncsnpp" else probe_spectral(args)
    rec = {"model": args.model, "backend": jax.default_backend(),
           "shape": [args.batch, args.freq, args.time], **stages}
    with open("/tmp/compile_probe.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
