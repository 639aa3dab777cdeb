"""Streaming causal inference: chunked ``lax.scan`` with carried conv state.

North-star config 3 (BASELINE.json): latency-constrained encode->decode with
a 20 ms hop runs as a single compiled scan — conv left-contexts and the
transposed-conv overlap-add tails are carried through the scan, so there are
no host round-trips between chunks. This is an *addition* beyond the
reference (SURVEY.md §5 long-context: the reference only chunks offline).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu.models import rvq as rvq_lib
from task_aware_audio_coding_perceptual_tpu.models.codec import NeuralAudioCodec


def streaming_encode(model: NeuralAudioCodec, params, wav: jax.Array, chunk: int):
    """Encode (B, T, 1) in chunks of ``chunk`` samples via lax.scan.

    Returns latents (B, T/hop, D), identical to the full (non-streaming)
    causal encoder output.
    """
    B, T, _ = wav.shape
    assert T % chunk == 0 and chunk % model.config.hop == 0
    n_chunks = T // chunk
    chunks = wav.reshape(B, n_chunks, chunk, 1).transpose(1, 0, 2, 3)

    state0 = model.apply(params, B, method=NeuralAudioCodec.encoder_state)

    def body(state, xc):
        y, new_state = model.apply(params, xc, state, method=NeuralAudioCodec.encode_step)
        return new_state, y

    _, ys = jax.lax.scan(body, state0, chunks)
    # (n_chunks, B, chunk/hop, D) -> (B, T/hop, D)
    return ys.transpose(1, 0, 2, 3).reshape(B, T // model.config.hop, -1)


def streaming_decode(model: NeuralAudioCodec, params, z: jax.Array, frames_per_chunk: int):
    """Decode latents (B, F, D) in chunks of ``frames_per_chunk`` frames."""
    B, F, D = z.shape
    assert F % frames_per_chunk == 0
    n_chunks = F // frames_per_chunk
    chunks = z.reshape(B, n_chunks, frames_per_chunk, D).transpose(1, 0, 2, 3)

    state0 = model.apply(params, B, method=NeuralAudioCodec.decoder_state)

    def body(state, zc):
        y, new_state = model.apply(params, zc, state, method=NeuralAudioCodec.decode_step)
        return new_state, y

    _, ys = jax.lax.scan(body, state0, chunks)
    return ys.transpose(1, 0, 2, 3).reshape(B, F * model.config.hop, 1)


def streaming_roundtrip(
    model: NeuralAudioCodec,
    params,
    rvq_state: rvq_lib.RvqState,
    wav: jax.Array,
    chunk: int,
    num_active: Optional[int] = None,
    use_pallas: bool = True,
):
    """Full streaming encode -> RVQ -> decode, one scan, no host syncs.

    ``chunk`` in samples (e.g. 320 = 20 ms at 16 kHz = 1 latent frame).
    Returns (reconstructed (B, T, 1), codes (L, B, T/hop)).
    """
    B, T, _ = wav.shape
    hop = model.config.hop
    assert T % chunk == 0 and chunk % hop == 0
    n_chunks = T // chunk
    chunks = wav.reshape(B, n_chunks, chunk, 1).transpose(1, 0, 2, 3)

    enc0 = model.apply(params, B, method=NeuralAudioCodec.encoder_state)
    dec0 = model.apply(params, B, method=NeuralAudioCodec.decoder_state)

    def body(carry, xc):
        enc_s, dec_s = carry
        z, enc_s = model.apply(params, xc, enc_s, method=NeuralAudioCodec.encode_step)
        q = rvq_lib.quantize(rvq_state, z, num_active=num_active, use_pallas=use_pallas)
        y, dec_s = model.apply(params, q.quantized, dec_s, method=NeuralAudioCodec.decode_step)
        return (enc_s, dec_s), (y, q.codes)

    (_, _), (ys, codes) = jax.lax.scan(body, (enc0, dec0), chunks)
    wav_out = ys.transpose(1, 0, 2, 3).reshape(B, T, 1)
    # codes: (n_chunks, L, B, chunk/hop) -> (L, B, T/hop)
    codes = codes.transpose(1, 2, 0, 3).reshape(
        codes.shape[1], B, n_chunks * (chunk // hop)
    )
    return wav_out, codes
