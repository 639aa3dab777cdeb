"""Task-aware losses: score decoded audio through frozen downstream heads.

Re-design of the reference's two ``task_aware()`` variants:

- v1 (ASR head, ``train_pkl_file_task_aware.py:270-367``): decoded
  spectrogram -> ISTFT -> frozen Wav2Vec2-CTC -> argmax logits treated as
  "enhanced audio" -> length-matched by linear interpolation -> MSE vs the
  clean waveform, plus MS-STFT feature-matching + LSGAN terms.
- v2 (enhancement head, ``train_pkl_file_task_aware_update.py:226-312``):
  the frozen task model is a diffusion enhancer (our ScoreModel.enhance
  equivalent) instead of the ASR head.

Two fidelity modes:

- ``detached=True`` reproduces the reference exactly: the task terms are
  ``stop_gradient``-ed scalars (the reference returns ``.item()`` floats at
  ``:339,367`` — no gradient ever flows; SURVEY §2 documents this bug).
- ``detached=False`` (default) lets gradients flow through the task head
  into the codec/autoencoder — the intended behavior (SURVEY §7.9).

The ASR head: HF Flax Wav2Vec2 cannot be downloaded in this offline
environment, so the default is :class:`FrozenCTCProxy` — a deterministic,
frozen conv feature extractor + CTC vocabulary projection with
Wav2Vec2-like strides (receptive field 400 samples, hop 320). Pass
``pretrained_name`` to use a real HF Flax checkpoint when available.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from task_aware_audio_coding_perceptual_tpu import dsp
from task_aware_audio_coding_perceptual_tpu.losses import adversarial


def batch_reconstruct_waveform(
    magnitude: jax.Array,
    phase: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: int = 2048,
) -> jax.Array:
    """ISTFT of mag*e^{i phase} for a batch (reference
    ``train_pkl_file_task_aware.py:174-208``; the reference loops per item —
    here one batched ISTFT)."""
    spec = dsp.polar_to_complex(magnitude, phase)
    win = dsp.hann_window(win_length)
    return dsp.istft(spec, n_fft, hop_length, window=win, win_length=win_length)


class FrozenCTCProxy(nn.Module):
    """Frozen Wav2Vec2-like CTC head: strided conv feature extractor
    (total stride 320, like Wav2Vec2's 20 ms frames at 16 kHz) + vocab
    projection. Parameters are deterministic (seeded) and never trained."""

    vocab_size: int = 32
    hidden: int = 128

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        """wav (B, T) -> logits (B, frames, vocab)."""
        x = wav[..., None]  # (B, T, 1)
        for features, k, s in (
            (self.hidden, 10, 5), (self.hidden, 3, 2), (self.hidden, 3, 2),
            (self.hidden, 3, 2), (self.hidden, 3, 2), (self.hidden, 2, 2),
            (self.hidden, 2, 2),
        ):
            x = nn.gelu(nn.Conv(features, (k,), strides=(s,), padding="VALID")(x))
        x = nn.LayerNorm()(x)
        return nn.Dense(self.vocab_size)(x)


def make_asr_head(
    pretrained_name: Optional[str] = None,
    hf_config: Optional[dict] = None,
    vocab_size: int = 32,
    seed: int = 0,
    example_len: int = 16000,
) -> Tuple[Callable, object]:
    """Return (apply_fn(wav_B_T) -> logits, params) for a frozen ASR head.

    Three head sources, by fidelity (reference uses
    ``Wav2Vec2ForCTC.from_pretrained("facebook/wav2vec2-large-960h-lv60-self")``,
    ``train_pkl_file_task_aware.py:252-259``):

    - ``pretrained_name``: real HF Flax checkpoint (needs weights on disk or
      network access).
    - ``hf_config``: a real ``FlaxWav2Vec2ForCTC`` built *from config* —
      correct architecture, random (frozen) weights; works fully offline.
      Pass ``{}`` for a small default config.
    - neither: :class:`FrozenCTCProxy` (lightweight conv CTC stand-in).
    """
    if pretrained_name is not None:
        from transformers import FlaxWav2Vec2ForCTC

        model = FlaxWav2Vec2ForCTC.from_pretrained(pretrained_name)
        params = jax.lax.stop_gradient(model.params)
        return (lambda wav: model(wav, params=params).logits), params
    if hf_config is not None:
        model = build_wav2vec2_ctc_from_config(hf_config, seed=seed)
        params = jax.lax.stop_gradient(model.params)
        return (lambda wav: model(wav, params=params).logits), params
    proxy = FrozenCTCProxy(vocab_size=vocab_size)
    params = jax.jit(proxy.init)(
        jax.random.key(seed), jnp.zeros((1, example_len), jnp.float32)
    )
    params = jax.lax.stop_gradient(params)
    return (lambda wav: proxy.apply(params, wav)), params


# small-but-real default Wav2Vec2 config for offline from-config construction
# (full facebook/wav2vec2-large-960h-lv60-self hyperparams are not practical
# on a test box; architecture/graph shape is identical).
_DEFAULT_W2V2_CONFIG = dict(
    hidden_size=48,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=96,
    conv_dim=(24, 24, 24, 24, 24, 24, 24),
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    vocab_size=32,
    do_stable_layer_norm=True,
    feat_extract_norm="layer",
)


def build_wav2vec2_ctc_from_config(overrides: Optional[dict] = None, seed: int = 0):
    """Construct ``FlaxWav2Vec2ForCTC`` offline from a config (no download).

    Makes the HF path testable without weights: transformers builds the full
    Flax graph from ``Wav2Vec2Config`` with seeded random init.
    """
    from transformers import FlaxWav2Vec2ForCTC, Wav2Vec2Config

    cfg_kwargs = dict(_DEFAULT_W2V2_CONFIG)
    cfg_kwargs.update(overrides or {})
    config = Wav2Vec2Config(**cfg_kwargs)
    return FlaxWav2Vec2ForCTC(config, input_shape=(1, 4000), seed=seed)


def _linear_interp_to(x: jax.Array, size: int) -> jax.Array:
    """F.interpolate(mode='linear', align_corners=False) equivalent on the
    last axis (reference ``train_pkl_file_task_aware.py:316-321``)."""
    return jax.image.resize(x, x.shape[:-1] + (size,), method="linear")


@dataclasses.dataclass
class TaskAwareASRLoss:
    """v1 task-aware loss (reference ``train_pkl_file_task_aware.py:270-367``).

    Args:
        asr_apply: frozen head wav (B, T) -> logits (B, frames, vocab).
        disc: MS-STFT discriminator module.
        disc_params: its (frozen, from the loss's perspective) params.
        detached: reference-parity mode (scalars, no grads).
    """

    asr_apply: Callable
    disc: object
    disc_params: object
    sample_rate: int = 8000
    detached: bool = True

    def __call__(self, decoded: jax.Array, clean: dict,
                 observed: Optional[dict] = None) -> Tuple[jax.Array, jax.Array]:
        """decoded: (B, 2, F, T) stacked mag/phase; clean: {'magnitude','phase'}."""
        del observed  # predicted-phase chain (reference parity)
        clean_wav = batch_reconstruct_waveform(clean["magnitude"], clean["phase"])
        noisy_wav = batch_reconstruct_waveform(decoded[:, 0], decoded[:, 1])

        logits = self.asr_apply(noisy_wav)  # (B, frames, vocab)
        if self.detached:
            # reference: argmax token ids treated as a waveform (:302)
            enhanced = jnp.argmax(logits, axis=-1).astype(jnp.float32)
        else:
            # differentiable variant: soft argmax (expected token id)
            probs = jax.nn.softmax(logits, axis=-1)
            ids = jnp.arange(logits.shape[-1], dtype=jnp.float32)
            enhanced = jnp.einsum("bfv,v->bf", probs, ids)

        e_len, c_len = enhanced.shape[-1], clean_wav.shape[-1]
        if e_len < c_len:
            enhanced = _linear_interp_to(enhanced, c_len)
        elif c_len < e_len:
            clean_wav = _linear_interp_to(clean_wav, e_len)

        mse = jnp.mean((enhanced - clean_wav) ** 2)

        disc_loss = _disc_terms(self.disc, self.disc_params, enhanced, clean_wav)
        if self.detached:
            mse = jax.lax.stop_gradient(mse)
            disc_loss = jax.lax.stop_gradient(disc_loss)
        return mse, disc_loss


@dataclasses.dataclass
class TaskAwareEnhancementLoss:
    """v2 task-aware loss (reference
    ``train_pkl_file_task_aware_update.py:226-312``): the frozen task model
    is a diffusion enhancer ``enhance_fn(wav_B_T) -> wav_B_T``."""

    enhance_fn: Callable
    disc: object
    disc_params: object
    detached: bool = True
    # "predicted": ISTFT of the decoded (mag, phase) pair — the reference's
    # literal chain (train_pkl_file_task_aware_update.py:149-184), which is
    # degenerate when the AE's raw-phase prediction is poor (the ISTFT of a
    # bad phase is noise; VERDICT r4 weak #3). "observed": decoded magnitude
    # + the noisy observation's phase — the standard magnitude-masking
    # waveform chain; requires ``observed`` at call time.
    phase_mode: str = "predicted"

    def __call__(self, decoded: jax.Array, clean: dict,
                 observed: Optional[dict] = None) -> Tuple[jax.Array, jax.Array]:
        clean_wav = batch_reconstruct_waveform(clean["magnitude"], clean["phase"])
        if self.phase_mode == "observed":
            assert observed is not None, "phase_mode='observed' needs the noisy batch"
            noisy_wav = batch_reconstruct_waveform(decoded[:, 0], observed["phase"])
        else:
            noisy_wav = batch_reconstruct_waveform(decoded[:, 0], decoded[:, 1])

        enhanced = self.enhance_fn(noisy_wav)
        e_len, c_len = enhanced.shape[-1], clean_wav.shape[-1]
        if e_len < c_len:
            enhanced = _linear_interp_to(enhanced, c_len)
        elif c_len < e_len:
            clean_wav = _linear_interp_to(clean_wav, e_len)

        mse = jnp.mean((enhanced - clean_wav) ** 2)
        disc_loss = _disc_terms(self.disc, self.disc_params, enhanced, clean_wav)
        if self.detached:
            mse = jax.lax.stop_gradient(mse)
            disc_loss = jax.lax.stop_gradient(disc_loss)
        return mse, disc_loss


@dataclasses.dataclass
class TaskAwareFeatureLoss:
    """Gradient-flowing task loss: distance between the frozen ASR head's
    logits on the *decoded* audio and on the *clean* audio.

    This is the well-posed expression of the reference's task-aware intent
    (``train_pkl_file_task_aware.py:270-367`` compares the frozen head's
    reading of decoded audio against the clean signal; its argmax/.item()
    chain detaches the gradient — SURVEY §2.1). Matching the head's logits
    directly (a) keeps the loss differentiable end-to-end into the encoder
    and (b) measures exactly what a downstream ASR consumer sees. Used for
    the task-on/task-off capability A/B (VERDICT r3 item 2).
    """

    asr_apply: Callable
    disc: Optional[object] = None
    disc_params: Optional[object] = None
    detached: bool = False
    phase_mode: str = "predicted"  # see TaskAwareEnhancementLoss

    def __call__(self, decoded: jax.Array, clean: dict,
                 observed: Optional[dict] = None) -> Tuple[jax.Array, jax.Array]:
        clean_wav = batch_reconstruct_waveform(clean["magnitude"], clean["phase"])
        if self.phase_mode == "observed":
            assert observed is not None, "phase_mode='observed' needs the noisy batch"
            decoded_wav = batch_reconstruct_waveform(decoded[:, 0], observed["phase"])
        else:
            decoded_wav = batch_reconstruct_waveform(decoded[:, 0], decoded[:, 1])
        logits_dec = self.asr_apply(decoded_wav)
        logits_clean = jax.lax.stop_gradient(self.asr_apply(clean_wav))
        task = jnp.mean((logits_dec - logits_clean) ** 2)
        if self.disc is not None:
            disc_loss = _disc_terms(self.disc, self.disc_params, decoded_wav, clean_wav)
        else:
            disc_loss = jnp.zeros(())
        if self.detached:
            task = jax.lax.stop_gradient(task)
            disc_loss = jax.lax.stop_gradient(disc_loss)
        return task, disc_loss


def _disc_terms(disc, disc_params, enhanced: jax.Array, clean_wav: jax.Array) -> jax.Array:
    """Feature-matching L1 + the reference's combined LSGAN MSE terms
    (``train_pkl_file_task_aware.py:343-364``)."""
    y_enh, fmap_enh = disc.apply(disc_params, enhanced[:, None, :])
    y_gt, fmap_gt = disc.apply(disc_params, clean_wav[:, None, :])
    loss = adversarial.feature_matching_loss(fmap_enh, fmap_gt)
    loss = loss + adversarial.lsgan_combined_loss(y_enh, y_gt)
    return loss
