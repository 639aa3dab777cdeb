"""Gradient accumulation (reference exposes it as a Lightning trainer flag,
``sgmse/train.py:51``; here a scan over microbatches inside one jitted step,
so the accumulated step costs one collective like a plain step)."""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def accumulate_gradients(
    loss_fn: Callable,
    params,
    batch,
    num_microbatches: int,
    has_aux: bool = False,
):
    """Compute grads averaged over ``num_microbatches`` splits of ``batch``.

    ``loss_fn(params, microbatch) -> loss`` (or ``(loss, aux)``). The batch's
    leading axis must be divisible by ``num_microbatches``.
    """
    def split(x):
        b = x.shape[0]
        assert b % num_microbatches == 0, (b, num_microbatches)
        return x.reshape(num_microbatches, b // num_microbatches, *x.shape[1:])

    micro = jax.tree.map(split, batch)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=has_aux)

    def body(carry, mb):
        loss_sum, grad_sum = carry
        if has_aux:
            (loss, aux), grads = grad_fn(params, mb)
        else:
            loss, grads = grad_fn(params, mb)
            aux = None
        new = (
            loss_sum + loss,
            jax.tree.map(jnp.add, grad_sum, grads),
        )
        return new, aux

    zero_grads = jax.tree.map(jnp.zeros_like, params)
    (loss_sum, grad_sum), auxes = jax.lax.scan(body, (0.0, zero_grads), micro)
    n = float(num_microbatches)
    grads = jax.tree.map(lambda g: g / n, grad_sum)
    if has_aux:
        return loss_sum / n, grads, auxes
    return loss_sum / n, grads
