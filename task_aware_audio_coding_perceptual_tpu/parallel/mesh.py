"""Device mesh + sharding utilities.

TPU-native replacement for the reference's Lightning DDP/NCCL scale-out
(``sgmse/train.py:102-107``; SURVEY.md §2.4): a single jitted program over a
``jax.sharding.Mesh`` with NamedShardings — XLA inserts the collectives,
which ride ICI inside a slice.

Axes:
- ``dp``: data parallel (batch dim). The reference's only parallelism.
- ``tp``: tensor parallel (conv output channels / hidden dims), an addition
  for large-model scale-out.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    """Create a (dp, tp) mesh over the first ``n_devices`` devices.

    Degrades gracefully: if fewer than ``n_devices`` devices are visible, uses
    what exists; if the device count is not divisible by ``tp``, falls back to
    the largest divisor of the count that is <= tp (ultimately tp=1), rather
    than asserting. This keeps the driver's single-chip environment and the
    virtual 8-CPU test mesh on the same code path.
    """
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[: min(n_devices, len(devices))]
    n = len(devices)
    while tp > 1 and n % tp != 0:
        tp -= 1
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a batch pytree with the leading axis sharded over dp."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def _param_spec(path_str: str, x: jax.Array, tp_min_size: int) -> P:
    """Tensor-parallel spec: shard conv/dense output channels (last dim)
    over tp when large enough and divisible; replicate otherwise."""
    if x.ndim >= 2 and x.shape[-1] >= tp_min_size:
        return P(*([None] * (x.ndim - 1)), "tp")
    return P()


def shard_params(mesh: Mesh, params, tp_min_size: int = 128):
    """Apply tp sharding to a params pytree (output-channel dim)."""
    tp = mesh.shape["tp"]

    def place(path, x):
        path_str = "/".join(str(p) for p in path)
        spec = _param_spec(path_str, x, tp_min_size)
        if spec != P() and x.shape[-1] % tp != 0:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
