"""Adversarial + feature-matching losses for the MS-STFT discriminator.

Formula parity with the reference's task-aware trainer
(``train_pkl_file_task_aware.py:356-364``): per-layer L1 feature matching
plus LSGAN-style MSE adversarial terms. EnCodec-style hinge losses are also
provided for the codec GAN training stack (BASELINE config 5).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


def feature_matching_loss(fmaps_gen: List, fmaps_real: List) -> jax.Array:
    """Sum of per-layer L1 distances across scales
    (reference ``train_pkl_file_task_aware.py:356-359``)."""
    total = 0.0
    for fm_g, fm_r in zip(fmaps_gen, fmaps_real):
        for f_g, f_r in zip(fm_g, fm_r):
            total = total + jnp.mean(jnp.abs(f_g - f_r))
    return total


def lsgan_combined_loss(logits_gen: List, logits_real: List) -> jax.Array:
    """MSE(logits_gen, 1) + MSE(logits_real, 0) summed over scales —
    the reference's (idiosyncratic) combined term
    (``train_pkl_file_task_aware.py:361-364``)."""
    total = 0.0
    for y_g, y_r in zip(logits_gen, logits_real):
        total = total + jnp.mean((y_g - 1.0) ** 2)
        total = total + jnp.mean(y_r**2)
    return total


def discriminator_hinge_loss(logits_real: List, logits_fake: List) -> jax.Array:
    """EnCodec-style: mean over scales of relu(1-real) + relu(1+fake)."""
    total = 0.0
    for y_r, y_f in zip(logits_real, logits_fake):
        total = total + jnp.mean(jax.nn.relu(1.0 - y_r)) + jnp.mean(jax.nn.relu(1.0 + y_f))
    return total / len(logits_real)


def generator_hinge_loss(logits_fake: List) -> jax.Array:
    """Mean over scales of -fake logits (hinge generator objective)."""
    total = 0.0
    for y_f in logits_fake:
        total = total - jnp.mean(y_f)
    return total / len(logits_fake)


def discriminator_lsgan_loss(logits_real: List, logits_fake: List) -> jax.Array:
    total = 0.0
    for y_r, y_f in zip(logits_real, logits_fake):
        total = total + jnp.mean((y_r - 1.0) ** 2) + jnp.mean(y_f**2)
    return total / len(logits_real)


def generator_lsgan_loss(logits_fake: List) -> jax.Array:
    total = 0.0
    for y_f in logits_fake:
        total = total + jnp.mean((y_f - 1.0) ** 2)
    return total / len(logits_fake)
