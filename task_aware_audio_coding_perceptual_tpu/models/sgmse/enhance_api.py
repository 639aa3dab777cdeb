"""Single-call / batched enhancement API (reference ``sgmse/test_single.py``).

``enhance_audio`` is the function the outer task-aware trainer imports
(``train_pkl_file_task_aware_update.py:34,242-253``): resample -> normalize
-> STFT -> spec_fwd -> pad -> sample -> ISTFT -> renormalize for one
waveform; ``enhance_audio_batch`` maps it over a batch.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from task_aware_audio_coding_perceptual_tpu.data import wav_io
from task_aware_audio_coding_perceptual_tpu.models.sgmse.score_model import ScoreModel


def enhance_audio(
    model: ScoreModel,
    params,
    y: np.ndarray,
    sr: int = 16000,
    sampler_type: str = "pc",
    predictor: str = "reverse_diffusion",
    corrector: str = "ald",
    N: int = 30,
    corrector_steps: int = 1,
    snr: float = 0.5,
    t_eps: float = 0.03,
    key: Optional[jax.Array] = None,
) -> np.ndarray:
    """Enhance one waveform (T,) at sample rate ``sr``; resamples to the
    model's rate and back like the reference (``test_single.py:101-186``)."""
    y = np.asarray(y, np.float32).reshape(-1)
    model_sr = model.config.sr
    orig_len = len(y)
    if sr != model_sr:
        y = wav_io.resample(y, sr, model_sr)
    x_hat = model.enhance(
        params,
        jnp.asarray(y),
        key=key,
        sampler_type=sampler_type,
        predictor=predictor,
        corrector=corrector,
        N=N,
        corrector_steps=corrector_steps,
        snr=snr,
    )
    if sr != model_sr:
        x_hat = wav_io.resample(x_hat, model_sr, sr)
    return np.asarray(x_hat)[:orig_len]


def enhance_audio_batch(
    model: ScoreModel,
    params,
    y_batch: np.ndarray,
    sr: int = 16000,
    key: Optional[jax.Array] = None,
    **kwargs,
) -> np.ndarray:
    """Batched variant (reference ``test_single.py:23-98``)."""
    key = key if key is not None else jax.random.key(0)
    outs = []
    for i in range(y_batch.shape[0]):
        key, sub = jax.random.split(key)
        outs.append(enhance_audio(model, params, y_batch[i], sr=sr, key=sub, **kwargs))
    return np.stack(outs)
