"""Checkpoint / resume via Orbax.

Covers the reference's two checkpointing styles (SURVEY §5):

- outer project: periodic 'every N epochs' saves of
  {step, params, optimizer state, loss} (``train_pkl_file_task_aware.py:693-702``),
- SGMSE/Lightning: keep-last + periodic + top-k on a validation metric
  (``sgmse/train.py:88-97``), with **EMA weights inside the checkpoint**
  (``model.py:100-109``). Here EMA params are an explicit field of the train
  state, so the eval-time swap is just reading ``state.ema_params``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


@dataclasses.dataclass
class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager.

    Args:
        directory: checkpoint root.
        max_to_keep: how many non-best checkpoints to retain.
        best_metric: if set, keep the top-k checkpoints by this metric key
            (mode 'max' for pesq/si_sdr-style metrics, 'min' for losses).
    """

    directory: str
    max_to_keep: int = 3
    best_metric: Optional[str] = None
    best_mode: str = "max"

    def __post_init__(self):
        self.directory = os.path.abspath(self.directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=self.max_to_keep,
            best_fn=(lambda m: m[self.best_metric]) if self.best_metric else None,
            best_mode=self.best_mode,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, metrics: Optional[dict] = None) -> bool:
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics or None
        )
        self._mgr.wait_until_finished()
        return saved

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def close(self):
        self._mgr.close()


def save_single(path: str, state: Any) -> None:
    """One-shot save (outer-project style 'model_epoch_N' checkpoint)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def restore_single(path: str, state_template: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), state_template)


# ---------------------------------------------------------------------------
# Compact npz inference artifacts (generator params + RVQ codebooks only).
# Written by scripts/export_codec_ckpt.py; loaded here so CLIs and tests can
# warm-start training runs from a committed artifact without orbax state.
# The reference's analogue is its committed .pth checkpoints
# (train_pkl_file_task_aware.py:693-702) reloaded by test_pkl_file_2.py:192.

_ARTIFACT_SEP = "::"  # flax WeightNorm param names contain "/" themselves


def flatten_artifact(tree, prefix=""):
    """Flatten a nested params dict into {'a::b::c': ndarray} (canonical
    artifact layout; scripts/export_codec_ckpt.py imports this)."""
    import numpy as np

    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_artifact(v, f"{prefix}{k}{_ARTIFACT_SEP}"))
    else:
        out[prefix[: -len(_ARTIFACT_SEP)]] = np.asarray(tree)
    return out


def unflatten_artifact(flat):
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split(_ARTIFACT_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


_unflatten_artifact = unflatten_artifact  # back-compat alias


def load_codec_artifact(path, expect_channels=None, expect_lstm_layers=None,
                        expect_bottleneck_blocks=None):
    """Load an exported codec artifact back into (params_tree, codebooks).

    If the exporter stored ``config_channels`` / ``config_lstm_layers`` (see
    scripts/export_codec_ckpt.py), validate them against the expected model
    config so a mismatched warm start fails with a clear message instead of
    an opaque jit shape error later.
    """
    import numpy as np

    z = np.load(path)
    if expect_channels is not None and "config_channels" in z.files:
        stored = int(z["config_channels"])
        if stored != int(expect_channels):
            raise ValueError(
                f"codec artifact {path} was exported with channels={stored} "
                f"but the model is built with channels={expect_channels}; "
                "pass the matching --channels"
            )
    for field, expect in (("lstm_layers", expect_lstm_layers),
                          ("bottleneck_blocks", expect_bottleneck_blocks)):
        if expect is None:
            continue
        stored = int(z[f"config_{field}"]) if f"config_{field}" in z.files else 0
        if stored != int(expect):
            raise ValueError(
                f"codec artifact {path} was exported with {field}={stored} "
                f"but the model is built with {field}={expect}; "
                f"pass the matching --{field}"
            )
    pre = "params" + _ARTIFACT_SEP
    flat = {k[len(pre):]: z[k] for k in z.files if k.startswith(pre)}
    return unflatten_artifact(flat), z["rvq_codebooks"]
