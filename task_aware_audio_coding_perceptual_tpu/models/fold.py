"""Host-side weight-norm folding for deterministic cross-backend inference.

Weight norm (g * v / ||v||) is a training-time reparameterization; at
inference the normalized kernels can be *folded* into plain conv kernels.
Folding on the host (numpy, bit-identical on every platform) removes the
rsqrt/divide from the device graph, so encoder arithmetic — and hence RVQ
code indices — stay bit-identical across CPU and TPU (see
``scripts/check_code_parity.py``). It also removes the per-call
normalization compute.

Usage:
    infer_params = fold_weight_norm(train_params)
    infer_model = NeuralAudioCodec(dataclasses.replace(cfg, weight_norm=False))
    infer_model.apply(infer_params, ...)
"""

from __future__ import annotations

import numpy as np

import jax


def fold_weight_norm(variables: dict) -> dict:
    """Fold flax ``nn.WeightNorm`` params into plain-layer params.

    The wrapped layer's params live under ``<mod>['conv']['layer_instance']``
    with sibling ``'layer_instance/kernel/scale'`` entries; the returned tree
    has plain ``<mod>['conv'] = {kernel, bias}``, matching the same model
    built with ``weight_norm=False``.
    """

    def fold(node):
        if not isinstance(node, dict):
            return node
        if "layer_instance" in node:  # a WeightNorm wrapper scope
            inner = dict(node["layer_instance"])
            scale_key = "layer_instance/kernel/scale"
            if scale_key in node:
                v = np.asarray(inner["kernel"], np.float32)
                g = np.asarray(node[scale_key], np.float32)
                # flax WeightNorm(feature_axes=-1): norm over all other axes
                axes = tuple(range(v.ndim - 1))
                norm = np.sqrt(np.sum(v**2, axis=axes, keepdims=True))
                inner["kernel"] = jax.numpy.asarray(g * v / norm)
            return {k: fold(val) for k, val in inner.items()}
        return {k: fold(v) for k, v in node.items()}

    return fold(variables)
