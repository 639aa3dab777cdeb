"""Torch -> JAX parameter conversion for reference ScoreModel checkpoints.

The reference's frozen enhancement task head is a PyTorch-Lightning
checkpoint (``train_pkl_file_task_aware_update.py:223`` loads
``train_wsj0_2cta4cov_epoch=159.ckpt``). To use such checkpoints as frozen
task heads here, this module converts the torch ``state_dict`` layout of the
reference NCSN++ backbones (``sgmse/backbones/ncsnpp.py``) into the flax
params tree of :class:`...sgmse.ncsnpp.NCSNpp`.

Mapping rationale: the reference torch port of score_sde keeps flax-style
inner attribute names (``GroupNorm_0``, ``Conv_0``, ``NIN_0`` …) and its
``forward`` consumes ``all_modules`` strictly in construction order — which
is exactly the creation (insertion) order of our flax module's children. So
the conversion is: zip ordered torch module groups with ordered flax
children, then convert leaves by type:

- Linear  ``weight (O,I)``      -> ``kernel (I,O)``  (transpose)
- Conv2d  ``weight (O,I,kh,kw)``-> ``kernel (kh,kw,I,O)``
- GroupNorm ``weight``          -> ``scale``
- NIN ``W (I,O)`` / ``b``       -> identical
- GaussianFourierProjection ``W`` -> identical

EMA weights: Lightning checkpoints store ``checkpoint['ema']['shadow_params']``
as a list in ``model.parameters()`` order == ``state_dict`` key order, so the
shadow list is re-keyed by zipping with the state-dict keys before conversion.
"""

from __future__ import annotations

from typing import Mapping, Optional

import jax
import numpy as np


def _group_torch_keys(sd: Mapping[str, np.ndarray], prefix: str = ""):
    """Order torch keys into module groups.

    Returns an ordered list of (group_name, {inner_key: array}) where groups
    are ``all_modules.N`` in ascending N, followed by any non-``all_modules``
    module groups (e.g. ``output_layer``) in state-dict order.
    """
    groups: dict[str, dict[str, np.ndarray]] = {}
    order: list[str] = []
    tail_order: list[str] = []
    for k, v in sd.items():
        if prefix:
            if not k.startswith(prefix):
                continue
            k = k[len(prefix):]
        parts = k.split(".")
        if parts[0] == "all_modules":
            g = f"all_modules.{int(parts[1]):06d}"
            inner = ".".join(parts[2:])
            if g not in groups:
                groups[g] = {}
                order.append(g)
            groups[g][inner] = np.asarray(v)
        else:
            g = parts[0]
            inner = ".".join(parts[1:])
            if g not in groups:
                groups[g] = {}
                tail_order.append(g)
            groups[g][inner] = np.asarray(v)
    order = sorted(order) + tail_order
    return [(g, groups[g]) for g in order]


def _convert_leaf(flax_path: tuple, flax_leaf, group: Mapping[str, np.ndarray]):
    """Convert one flax leaf from its torch counterpart in ``group``."""
    names = [str(getattr(p, "key", p)) for p in flax_path]
    leaf_name = names[-1]
    inner_prefix = ".".join(names[:-1])

    def g(key):
        full = f"{inner_prefix}.{key}" if inner_prefix else key
        if full not in group:
            raise KeyError(
                f"torch key {full!r} missing; have {sorted(group)[:8]}"
            )
        return group[full]

    if leaf_name == "kernel":
        w = g("weight")
        if w.ndim == 2:  # Linear (O, I) -> (I, O)
            out = w.T
        elif w.ndim == 4:  # Conv2d (O, I, kh, kw) -> (kh, kw, I, O)
            out = np.transpose(w, (2, 3, 1, 0))
        else:
            raise ValueError(f"unexpected weight ndim {w.ndim} at {names}")
    elif leaf_name == "scale":  # GroupNorm
        out = g("weight")
    elif leaf_name in ("bias", "W", "b"):
        out = g(leaf_name)
    else:
        raise ValueError(f"unhandled flax leaf {leaf_name!r} at {names}")
    if out.shape != flax_leaf.shape:
        raise ValueError(
            f"shape mismatch at {'.'.join(names)}: torch {out.shape} vs "
            f"flax {flax_leaf.shape}"
        )
    return out.astype(np.asarray(flax_leaf).dtype)


def convert_ncsnpp_state_dict(
    torch_sd: Mapping[str, np.ndarray],
    flax_params,
    prefix: str = "",
):
    """Convert a reference-NCSN++ torch state dict into our flax params.

    Args:
        torch_sd: {key: np.ndarray} torch state dict (tensors already numpy).
        flax_params: params pytree from ``NCSNpp(...).init(...)`` (the
            ``{'params': {'NCSNppBase_0': {...}}}`` layout), used as the
            structural template (and for dtypes).
        prefix: optional torch key prefix to strip (e.g. ``"dnn."`` for
            Lightning ScoreModel checkpoints).
    """
    base = flax_params["params"]["NCSNppBase_0"]
    torch_groups = _group_torch_keys(torch_sd, prefix=prefix)
    flax_children = list(base.items())  # insertion order == creation order
    if len(torch_groups) != len(flax_children):
        raise ValueError(
            f"module-count mismatch: torch {len(torch_groups)} vs flax "
            f"{len(flax_children)}"
        )

    new_base = {}
    for (gname, group), (cname, subtree) in zip(torch_groups, flax_children):
        flat = jax.tree_util.tree_flatten_with_path(subtree)
        converted = [
            _convert_leaf(path, leaf, group) for path, leaf in flat[0]
        ]
        new_base[cname] = jax.tree_util.tree_unflatten(flat[1], converted)

    out = dict(flax_params)
    out["params"] = dict(flax_params["params"])
    out["params"]["NCSNppBase_0"] = new_base
    return out


def load_lightning_score_checkpoint(
    path: str,
    flax_params,
    use_ema: bool = True,
    dnn_prefix: str = "dnn.",
):
    """Load a reference ScoreModel ``.ckpt`` and convert its backbone params.

    Reference layout (``sgmse/sgmse/model.py:100-109``): the Lightning
    checkpoint dict carries ``state_dict`` (keys ``dnn.all_modules...``) and
    ``ema`` ({'shadow_params': [...]} in parameters() order). With
    ``use_ema=True`` the EMA shadow weights replace the live ones — matching
    the reference's eval-time EMA swap (``model.py:111-125``).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    sd = {k: v for k, v in sd.items() if k.startswith(dnn_prefix)}

    if use_ema and isinstance(ckpt, dict) and ckpt.get("ema"):
        shadow = ckpt["ema"]["shadow_params"]
        keys = list(sd.keys())
        if len(shadow) == len(keys):
            sd = dict(zip(keys, shadow))

    sd_np = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return convert_ncsnpp_state_dict(sd_np, flax_params, prefix=dnn_prefix)
