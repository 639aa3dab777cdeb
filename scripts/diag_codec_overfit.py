"""Codec overfit diagnostic protocol: is RVQ or the AE the binding constraint?

Variants:
A) bypass RVQ (decoder sees unquantized z)  -> isolates AE capacity
B) quantized + direct SI-SDR loss (w=0.1)   -> does time-domain pressure fix it
C) bypass + SI-SDR loss                     -> AE ceiling with time-domain loss

All stages jitted; training runs as lax.scan blocks of 100 steps per device
call (single relay round-trip per block).
"""
import time
import jax, jax.numpy as jnp, numpy as np
import optax

from task_aware_audio_coding_perceptual_tpu.data import speech_synth
from task_aware_audio_coding_perceptual_tpu.metrics.sdr import si_sdr_jax
from task_aware_audio_coding_perceptual_tpu.models import rvq as rvq_lib
from task_aware_audio_coding_perceptual_tpu.models.codec import CodecConfig, NeuralAudioCodec
from task_aware_audio_coding_perceptual_tpu.train import codec_train

print("devices:", jax.devices(), flush=True)
cfg = CodecConfig()
T = 16000 - (16000 % cfg.hop)
wav = np.stack([speech_synth.synthesize_utterance(np.random.default_rng(i), duration=1.0)[:T]
                for i in range(4)])[..., None].astype(np.float32)
wav = jnp.asarray(wav)
BLOCK = 100


def run(tag, steps, bypass, w_si):
    t0 = time.time()
    model, state, tx = codec_train.create_train_state(cfg, jax.random.key(0), 3e-4)
    jax.block_until_ready(state.params)
    print(f"[{tag}] init done ({time.time()-t0:.0f}s)", flush=True)

    @jax.jit
    def _enc(params, w):
        return model.apply(params, w, method=NeuralAudioCodec.encode)

    @jax.jit
    def _cb_init(key, z):
        return rvq_lib.init_rvq_from_latents(key, z, cfg.num_quantizers, cfg.codebook_size)

    z0 = _enc(state.params, wav)
    state = state.replace(rvq=_cb_init(jax.random.key(7), z0))
    jax.block_until_ready(state.rvq)
    print(f"[{tag}] codebooks seeded ({time.time()-t0:.0f}s)", flush=True)

    if bypass:
        def one_step(state, w):
            def loss_fn(params):
                z = model.apply(params, w, method=NeuralAudioCodec.encode)
                y = model.apply(params, z, method=NeuralAudioCodec.decode)
                a, b = w[..., 0], y[..., 0]
                from task_aware_audio_coding_perceptual_tpu import losses
                loss = (0.1 * losses.l1_time_loss(a, b) + losses.l2_time_loss(a, b)
                        + losses.multi_resolution_stft_loss(a, b)
                        + losses.multi_resolution_mel_loss(a, b, sample_rate=16000))
                if w_si:
                    loss = loss - w_si * jnp.mean(jnp.clip(si_sdr_jax(a, b), -30., 30.))
                return loss, {}
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            return state.replace(params=optax.apply_updates(state.params, updates),
                                 opt_state=new_opt, step=state.step + 1), {"loss": loss}

        @jax.jit
        def eval_fn(params, rvq_state, w):
            z = model.apply(params, w, method=NeuralAudioCodec.encode)
            y = model.apply(params, z, method=NeuralAudioCodec.decode)
            return jnp.mean(si_sdr_jax(w[..., 0], y[..., 0]))
    else:
        weights = codec_train.CodecLossWeights(si_sdr=w_si)
        one_step = codec_train.make_train_step(model, tx, weights=weights)

        @jax.jit
        def eval_fn(params, rvq_state, w):
            z = model.apply(params, w, method=NeuralAudioCodec.encode)
            q = rvq_lib.quantize(rvq_state, z, use_pallas=False)
            y = model.apply(params, q.quantized, method=NeuralAudioCodec.decode)
            return jnp.mean(si_sdr_jax(w[..., 0], y[..., 0]))

    @jax.jit
    def block_fn(state, w):
        def body(s, _):
            s, m = one_step(s, w)
            return s, m["loss"]
        s, ls = jax.lax.scan(body, state, None, length=BLOCK)
        return s, ls[-1]

    for b in range(steps // BLOCK):
        state, last_loss = block_fn(state, wav)
        if b % 5 == 0 or b == steps // BLOCK - 1:
            ev = float(eval_fn(state.params, state.rvq, wav))
            print(f"[{tag}] step {(b+1)*BLOCK:5d} loss {float(last_loss):+8.4f} "
                  f"si_sdr {ev:+7.2f} dB ({time.time()-t0:.0f}s)", flush=True)


run("A:bypass", 2000, bypass=True, w_si=0.0)
run("B:quant+sisdr0.1", 2000, bypass=False, w_si=0.1)
run("C:bypass+sisdr0.1", 2000, bypass=True, w_si=0.1)
