"""Fused pad -> zero-stuff-upsample -> FIR -> downsample (upfirdn2d).

TPU-native replacement for the reference's StyleGAN2 CUDA kernel
(``sgmse/sgmse/backbones/ncsnpp_utils/op/upfirdn2d_kernel.cu``; the
algorithmic spec is the CPU fallback ``op/upfirdn2d.py:162-203``).

Three implementations, all numerically identical:

- :func:`upfirdn2d_ref` — pure-JAX reference (pad/reshape/correlate), the
  role ``upfirdn2d_native`` plays in the reference. Used in parity tests.
- the default XLA path inside :func:`upfirdn2d` — a single
  ``lax.conv_general_dilated`` depthwise convolution with ``lhs_dilation``
  (XLA's native expression of the fused op; maps straight onto the TPU
  convolution hardware).
- :func:`upfirdn2d_pallas` — a hand-written Pallas TPU kernel for the
  separable factor-{1,2} cases used by NCSN++ (FIR kernel [1,3,3,1]); the
  whole pipeline runs in VMEM with no HBM round-trips between stages.

Gradients are provided by a custom VJP mirroring the reference's
``UpFirDn2dBackward`` (``op/upfirdn2d.py:22-88,114-119``): the backward pass
is itself an upfirdn2d with the flipped kernel, swapped up/down factors and
the ``g_pad`` padding — so arbitrary-order differentiation works, exactly
like the CUDA double-backward.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def setup_kernel(k: Sequence[float]) -> np.ndarray:
    """Normalize a FIR kernel; outer-product if 1-D (reference
    ``up_or_down_sampling.py:181-188``)."""
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k /= np.sum(k)
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return k


def _as4(v) -> Tuple[int, int, int, int]:
    return tuple(int(x) for x in v)


def upfirdn2d_ref(
    x: jax.Array,
    kernel: jax.Array,
    up: Tuple[int, int] = (1, 1),
    down: Tuple[int, int] = (1, 1),
    pad: Tuple[int, int, int, int] = (0, 0, 0, 0),
) -> jax.Array:
    """Pure-JAX reference implementation.

    Args:
        x: (N, C, H, W).
        kernel: 2-D FIR kernel (kh, kw).
        up/down: (up_x, up_y) / (down_x, down_y) — x is the W axis, y the H
            axis, matching the reference's argument conventions.
        pad: (pad_x0, pad_x1, pad_y0, pad_y1); may be negative (crop).
    """
    up_x, up_y = up
    down_x, down_y = down
    pad_x0, pad_x1, pad_y0, pad_y1 = _as4(pad)
    n, c, in_h, in_w = x.shape
    kh, kw = kernel.shape

    out = x.reshape(n, c, in_h, 1, in_w, 1)
    out = jnp.pad(out, [(0, 0), (0, 0), (0, 0), (0, up_y - 1), (0, 0), (0, up_x - 1)])
    out = out.reshape(n, c, in_h * up_y, in_w * up_x)

    out = jnp.pad(
        out,
        [
            (0, 0),
            (0, 0),
            (max(pad_y0, 0), max(pad_y1, 0)),
            (max(pad_x0, 0), max(pad_x1, 0)),
        ],
    )
    out = out[
        :,
        :,
        max(-pad_y0, 0) : out.shape[2] - max(-pad_y1, 0),
        max(-pad_x0, 0) : out.shape[3] - max(-pad_x1, 0),
    ]

    # true convolution with `kernel` == cross-correlation with flipped kernel
    w = jnp.flip(kernel, (0, 1)).reshape(1, 1, kh, kw).astype(x.dtype)
    out = lax.conv_general_dilated(
        out.reshape(n * c, 1, out.shape[2], out.shape[3]),
        w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = out[:, :, ::down_y, ::down_x]
    out_h = (in_h * up_y + pad_y0 + pad_y1 - kh) // down_y + 1
    out_w = (in_w * up_x + pad_x0 + pad_x1 - kw) // down_x + 1
    return out.reshape(n, c, out_h, out_w)


def _upfirdn2d_xla(
    x: jax.Array,
    kernel: jax.Array,
    up: Tuple[int, int],
    down: Tuple[int, int],
    pad: Tuple[int, int, int, int],
) -> jax.Array:
    """Single fused XLA depthwise dilated conv.

    ``lhs_dilation`` inserts up-1 zeros *between* samples; the reference's
    zero-stuffing also appends up-1 trailing zeros, so the high padding is
    increased by up-1 to compensate (the appended zeros contribute nothing).
    """
    up_x, up_y = up
    down_x, down_y = down
    pad_x0, pad_x1, pad_y0, pad_y1 = _as4(pad)
    n, c, in_h, in_w = x.shape
    kh, kw = kernel.shape

    w = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    w = jnp.broadcast_to(w.reshape(1, 1, kh, kw), (c, 1, kh, kw))
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(down_y, down_x),
        padding=((pad_y0, pad_y1 + up_y - 1), (pad_x0, pad_x1 + up_x - 1)),
        lhs_dilation=(up_y, up_x),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )
    out_h = (in_h * up_y + pad_y0 + pad_y1 - kh) // down_y + 1
    out_w = (in_w * up_x + pad_x0 + pad_x1 - kw) // down_x + 1
    assert out.shape == (n, c, out_h, out_w), (out.shape, (n, c, out_h, out_w))
    return out


# ---------------------------------------------------------------------------
# Pallas TPU kernel: fused separable polyphase upfirdn for the NCSN++ path.
#
# Mosaic cannot interleave/deinterleave along the lane axis inside a kernel
# (no scatter, no (R, L, 2)->(R, 2L) shape casts), so the kernel is written
# in polyphase form: the phase split (down=2) / merge (up=2) are O(1) layout
# reshuffles done by XLA outside the kernel, while all arithmetic — the FIR
# taps as stride-1 shifted multiply-adds over VMEM-resident blocks — runs
# fused inside the kernel, one pass per axis, no HBM round-trips in between.
# ---------------------------------------------------------------------------


def _axis_plan(up: int, down: int, pad0: int, taps: np.ndarray):
    """Polyphase plan for one axis.

    Returns a list over output phases; each phase is a list of
    (in_component, shift, tap) triples meaning
    ``out_p[m] += tap * x_c[m + shift]`` where for down=2 the input
    components are x[c::2] and for up=2 the output phases interleave as
    out[up*m + p]. kf = flipped taps (true convolution).
    """
    K = len(taps)
    kf = taps[::-1]
    assert (up, down) in ((1, 1), (2, 1), (1, 2)), "polyphase plan supports factor-2"
    phases = []
    if down == 1:
        for p in range(up):
            entries = []
            for j in range(K):
                t = p + j - pad0
                if t % up == 0:
                    entries.append((0, t // up, float(kf[j])))
            phases.append(entries)
    else:  # up == 1, down == 2
        entries = []
        for j in range(K):
            t = j - pad0
            c = t % down
            entries.append((c, (t - c) // down, float(kf[j])))
        phases.append(entries)
    return phases


def _apply_phase_fir(components, entries, M: int, axis: int):
    """out[m] = sum tap * comp[c][m + shift] along `axis` (stride-1 only)."""
    outs = None
    for c, shift, tap in entries:
        z = components[c]
        L = z.shape[axis]
        padl = max(0, -min(shift, 0))
        padr = max(0, (M - 1) + shift - (L - 1))
        if padl or padr:
            pw = [(0, 0)] * z.ndim
            pw[axis] = (padl, padr)
            z = jnp.pad(z, pw)
        start = shift + padl
        sl = [slice(None)] * z.ndim
        sl[axis] = slice(start, start + M)
        term = tap * z[tuple(sl)].astype(jnp.float32)
        outs = term if outs is None else outs + term
    return outs


def upfirdn2d_pallas(
    x: jax.Array,
    kernel_1d: Sequence[float],
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
    interpret: bool | None = None,
) -> jax.Array:
    """Hand-written Pallas kernel: separable fused polyphase upfirdn2d.

    Handles the NCSN++ cases: separable FIR (e.g. [1,3,3,1]), same
    up/down/pad on both axes, factors in {1,2}. Gradients flow through the
    public :func:`upfirdn2d`; this is the inference/benchmark fast path.
    """
    taps = np.asarray(kernel_1d, dtype=np.float64)
    assert taps.ndim == 1
    norm = taps / taps.sum()
    n, c, in_h, in_w = x.shape
    pad0, pad1 = int(pad[0]), int(pad[1])
    K = len(taps)
    out_h = (in_h * up + pad0 + pad1 - K) // down + 1
    out_w = (in_w * up + pad0 + pad1 - K) // down + 1

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    plan = _axis_plan(up, down, pad0, norm)
    n_in_comp = down * down  # input components per axis pair
    n_out_ph = up * up

    # --- outside-kernel phase split (cheap XLA layout ops) ---
    bc = n * c
    xf = x.reshape(bc, in_h, in_w)
    if down == 2:
        assert in_h % 2 == 0 and in_w % 2 == 0
        comps = [xf[:, a::2, b::2] for a in range(2) for b in range(2)]
        xin = jnp.stack(comps, axis=1)  # (bc, 4, H/2, W/2)
        ch, cw = in_h // 2, in_w // 2
    else:
        xin = xf[:, None]  # (bc, 1, H, W)
        ch, cw = in_h, in_w

    # per-phase lengths rounded up; extra elements are sliced off after merge
    ph_h = -(-out_h // up)
    ph_w = -(-out_w // up)

    def kernel_fn(x_ref, o_ref):
        blocks = [x_ref[0, i] for i in range(n_in_comp)]
        out_idx = 0
        for ph in range(len(plan)):
            # H pass for output phase ph
            h_entries = plan[ph]
            # group input components by their H-component index
            h_in = _apply_phase_fir(
                {cc: blocks[cc * down + 0] if down == 2 else blocks[0] for cc in range(down)}
                if down == 2
                else {0: blocks[0]},
                h_entries,
                ph_h,
                axis=0,
            )
            if down == 2:
                h_in2 = _apply_phase_fir(
                    {cc: blocks[cc * down + 1] for cc in range(down)}, h_entries, ph_h, axis=0
                )
            for pw_i in range(len(plan)):
                w_entries = plan[pw_i]
                if down == 2:
                    res = _apply_phase_fir({0: h_in, 1: h_in2}, w_entries, ph_w, axis=1)
                else:
                    res = _apply_phase_fir({0: h_in}, w_entries, ph_w, axis=1)
                o_ref[0, out_idx] = res.astype(o_ref.dtype)
                out_idx += 1

    out = pl.pallas_call(
        kernel_fn,
        grid=(bc,),
        in_specs=[
            pl.BlockSpec(
                (1, n_in_comp, ch, cw), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, n_out_ph, ph_h, ph_w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bc, n_out_ph, ph_h, ph_w), x.dtype),
        interpret=interpret,
    )(xin)

    # --- outside-kernel phase merge ---
    if up == 2:
        out = out.reshape(bc, 2, 2, ph_h, ph_w)
        out = jnp.transpose(out, (0, 3, 1, 4, 2))  # (bc, ph_h, 2, ph_w, 2)
        out = out.reshape(bc, 2 * ph_h, 2 * ph_w)[:, :out_h, :out_w]
    else:
        out = out[:, 0]
    return out.reshape(n, c, out_h, out_w)


# ---------------------------------------------------------------------------
# Public differentiable API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _upfirdn2d_core(x, kernel, up, down, pad):
    return _upfirdn2d_xla(x, kernel, up, down, pad)


def _upfirdn2d_fwd(x, kernel, up, down, pad):
    out = _upfirdn2d_xla(x, kernel, up, down, pad)
    return out, (x.shape, kernel)


def _upfirdn2d_bwd(up, down, pad, res, g):
    """Gradient is upfirdn2d with flipped kernel, swapped up/down and g_pad
    (reference ``op/upfirdn2d.py:114-119``)."""
    in_shape, kernel = res
    up_x, up_y = up
    down_x, down_y = down
    pad_x0, pad_x1, pad_y0, pad_y1 = _as4(pad)
    kh, kw = kernel.shape
    _, _, in_h, in_w = in_shape
    out_h = (in_h * up_y + pad_y0 + pad_y1 - kh) // down_y + 1
    out_w = (in_w * up_x + pad_x0 + pad_x1 - kw) // down_x + 1

    g_pad_x0 = kw - pad_x0 - 1
    g_pad_y0 = kh - pad_y0 - 1
    g_pad_x1 = in_w * up_x - out_w * down_x + pad_x0 - up_x + 1
    g_pad_y1 = in_h * up_y - out_h * down_y + pad_y0 - up_y + 1

    grad_kernel = jnp.flip(kernel, (0, 1))
    grad_input = _upfirdn2d_core(
        g,
        grad_kernel,
        (down_x, down_y),
        (up_x, up_y),
        (g_pad_x0, g_pad_x1, g_pad_y0, g_pad_y1),
    )
    return grad_input, None


_upfirdn2d_core.defvjp(_upfirdn2d_fwd, _upfirdn2d_bwd)


def upfirdn2d(x, kernel, up: int = 1, down: int = 1, pad: Tuple[int, int] = (0, 0)):
    """Public API matching the reference wrapper (``op/upfirdn2d.py:148-159``):
    same up/down factor on both axes, (pad0, pad1) applied to both axes."""
    kernel = jnp.asarray(kernel, dtype=x.dtype)
    return _upfirdn2d_core(
        x, kernel, (up, up), (down, down), (pad[0], pad[1], pad[0], pad[1])
    )
