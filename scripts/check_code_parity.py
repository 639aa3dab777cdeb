"""Cross-backend RVQ code parity check: run on any backend (TPU/CPU) and
compare against the committed CPU golden codes.

    python scripts/check_code_parity.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

# Deterministic-encode mode: with HIGHEST matmul precision the encoder's
# conv arithmetic (and hence every RVQ code index) is bit-identical between
# CPU and TPU. Default TPU f32 conv passes give ~89% code match only.
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402

from task_aware_audio_coding_perceptual_tpu.models import rvq as rvq_lib  # noqa: E402
from task_aware_audio_coding_perceptual_tpu.models.codec import (  # noqa: E402
    CodecConfig,
    NeuralAudioCodec,
)


def main():
    golden = np.load(os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "rvq_codes.npy"))
    config = CodecConfig()
    model = NeuralAudioCodec(config)
    rng = np.random.default_rng(1234)
    wav = rng.standard_normal((2, config.hop * 25, 1)).astype(np.float32)
    params = jax.jit(model.init)(jax.random.key(7), jnp.asarray(wav[:1]))
    rvq_state = rvq_lib.init_rvq(
        jax.random.key(8), config.num_quantizers, config.codebook_size, config.latent_dim
    )

    @jax.jit
    def codes_fn(params, rvq_state, wav):
        z = model.apply(params, wav, method=NeuralAudioCodec.encode)
        return rvq_lib.quantize(rvq_state, z).codes

    codes = np.asarray(codes_fn(params, rvq_state, jnp.asarray(wav)))
    match = (codes == golden).mean()
    print(f"backend={jax.default_backend()} code match vs CPU golden: {match:.4%}")
    if match == 1.0:
        print("PASS: bit-identical codes")
    else:
        diff = np.argwhere(codes != golden)[:5]
        print(f"FAIL: first mismatches at {diff.tolist()}")
        sys.exit(1)


if __name__ == "__main__":
    main()
