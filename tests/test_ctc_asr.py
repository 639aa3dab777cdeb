"""CTC ASR head: labels, model, loss, decode metrics (VERDICT r4 item 6)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from task_aware_audio_coding_perceptual_tpu.data.speech_synth import (
    VOCAB_SIZE,
    synthesize_utterance,
)
from task_aware_audio_coding_perceptual_tpu.models import ctc_asr


def test_labels_do_not_change_waveform():
    w1 = synthesize_utterance(np.random.default_rng(3), duration=1.0)
    w2, labs = synthesize_utterance(
        np.random.default_rng(3), duration=1.0, return_labels=True
    )
    np.testing.assert_array_equal(w1, w2)
    assert labs and all(1 <= sym < VOCAB_SIZE for sym, _, _ in labs)
    assert all(s0 < s1 for _, s0, s1 in labs)


@pytest.mark.slow  # fast-lane budget (VERDICT r4 item 7): grad-through-CTC
# stays fast-covered by test_train_loops.py::test_task_aware_asr_loss
def test_ctc_encoder_shapes_and_loss_grad():
    m = ctc_asr.ConvCTCEncoder(hidden=8, context_blocks=1)
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 3200)).astype(np.float32)
    )
    p = m.init(jax.random.key(0), wav)
    logits = m.apply(p, wav)
    assert logits.shape == (2, 3200 // 320, VOCAB_SIZE)

    labels, pads = ctc_asr.pad_labels([[1, 2], [3]], 4)

    def loss(p):
        return ctc_asr.ctc_loss_fn(
            m.apply(p, wav), jnp.asarray(labels), jnp.asarray(pads)
        )

    g = jax.grad(loss)(p)
    assert float(jnp.abs(jax.tree.leaves(g)[0]).sum()) > 0


def test_greedy_decode_and_ter():
    # logits peaked on [blank, 1, 1, blank, 2] -> decode [1, 2]
    seq = [0, 1, 1, 0, 2]
    logits = np.full((1, len(seq), 4), -5.0, np.float32)
    for t, s in enumerate(seq):
        logits[0, t, s] = 5.0
    assert ctc_asr.greedy_decode(logits) == [[1, 2]]
    assert ctc_asr.token_error_rate([1, 2], [1, 2]) == 0.0
    assert ctc_asr.token_error_rate([1, 2, 3], [1, 3]) == pytest.approx(1 / 3)
    assert ctc_asr.batch_token_accuracy([[1, 2]], logits) == 1.0
