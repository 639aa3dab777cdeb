"""Deterministic codec inference: bit-identical RVQ codes at shipped defaults.

The north star requires codes produced on TPU to match the CPU reference
path bit-for-bit. Three things make default-mode inference drift across
backends, and this module pins all of them *inside* the public API (round-1
this lived as config flips in ``scripts/check_code_parity.py``):

1. **Matmul/conv precision** — TPU f32 convs default to bf16 passes
   (~1e-2 latent error, ~11% code flips). Every op here is traced under
   ``jax.default_matmul_precision('highest')``.
2. **Weight-norm arithmetic** — the rsqrt/divide reparameterization is
   folded into plain kernels on the host (numpy, platform-independent) via
   :func:`~..models.fold.fold_weight_norm`.
3. **RVQ tie-breaking** — the nearest-codebook reference path
   (``deterministic_ties=True``) picks the lowest index within
   ``1e-5 × row-scale`` of the minimum distance. Cross-backend
   transcendentals (ELU's ``exp``) are not IEEE-pinned, so latents differ by
   ~1e-6 and two near-equidistant codewords (observed gap ~4e-9 relative)
   can argmin differently in raw f32; the tolerance band absorbs that
   perturbation so both backends resolve to the same index.
   ``scripts/check_code_parity.py`` verifies strict match on TPU under this
   API with no caller-side configuration (see PARITY.md). Residual risk:
   the tolerance band shifts, not removes, the decision boundary — a
   distance landing within the cross-backend perturbation (~1e-7) of the
   1e-5 boundary itself can still flip in/out of the tie set, so identity
   is *empirically verified* on the supported backends (CPU/TPU), not
   guaranteed unconditionally.

Usage::

    det = DeterministicCodec(config, train_params, rvq_state)
    codes = det.encode(wav)       # (L, B, frames) int32
    wav_hat = det.decode(codes)   # (B, T, 1)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu.models import rvq as rvq_lib
from task_aware_audio_coding_perceptual_tpu.models.codec import (
    CodecConfig,
    NeuralAudioCodec,
)
from task_aware_audio_coding_perceptual_tpu.models.fold import fold_weight_norm


class DeterministicCodec:
    """Frozen codec wrapper whose ``encode`` is cross-backend bit-stable."""

    def __init__(self, config: CodecConfig, params, rvq_state: rvq_lib.RvqState):
        if config.weight_norm:
            params = fold_weight_norm(jax.device_get(params))
            config = dataclasses.replace(config, weight_norm=False)
        self.config = config
        self.params = params
        self.rvq = rvq_state
        self._model = NeuralAudioCodec(config)

        model = self._model

        @jax.jit
        def _encode(params, rvq_state, wav):
            with jax.default_matmul_precision("highest"):
                z = model.apply(params, wav, method=NeuralAudioCodec.encode)
                q = rvq_lib.quantize(rvq_state, z, use_pallas=False,
                                     deterministic_ties=True)
            return q.codes

        @jax.jit
        def _encode_latents(params, wav):
            with jax.default_matmul_precision("highest"):
                return model.apply(params, wav, method=NeuralAudioCodec.encode)

        @jax.jit
        def _decode(params, rvq_state, codes):
            with jax.default_matmul_precision("highest"):
                z = rvq_lib.dequantize(rvq_state, codes)
                return model.apply(params, z, method=NeuralAudioCodec.decode)

        self._encode = _encode
        self._encode_latents = _encode_latents
        self._decode = _decode

    def encode(self, wav: jax.Array) -> jax.Array:
        """(B, T, 1) waveform -> (L, B, frames) int32 codes."""
        return self._encode(self.params, self.rvq, wav)

    def encode_latents(self, wav: jax.Array) -> jax.Array:
        """(B, T, 1) waveform -> pre-quantization latents (for diagnostics)."""
        return self._encode_latents(self.params, wav)

    def decode(self, codes: jax.Array) -> jax.Array:
        """(L, B, frames) codes -> (B, T, 1) waveform."""
        return self._decode(self.params, self.rvq, codes)

    def roundtrip(self, wav: jax.Array) -> jax.Array:
        return self.decode(self.encode(wav))
