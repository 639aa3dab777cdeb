"""CSV metrics logging and the experiment-tracker interface.

Reference surfaces covered:

- per-epoch CSV rows with a header (``train_pkl_file_task_aware.py:577-586``)
  and ``{model}_test_results.csv`` (``test_pkl_file_2.py:266-292``) ->
  :class:`CSVLogger`;
- W&B experiment tracking (``sgmse/train.py:83-84``: WandbLogger with
  ``--nolog`` falling back to CSV) -> :class:`Tracker` protocol with
  :class:`JsonlTracker` (offline run dirs: config + step-stamped metric
  events) and :class:`WandbTracker` (delegates to ``wandb`` when that
  package exists; this offline environment doesn't ship it, so it raises
  with a pointer to JsonlTracker — same role as the reference's
  ``--nolog``).
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Iterable, Optional


class CSVLogger:
    def __init__(self, path: str, fieldnames: Iterable[str]):
        self.path = path
        self.fieldnames = list(fieldnames)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        new = not os.path.exists(path)
        self._f = open(path, "a", newline="")
        self._w = csv.DictWriter(self._f, fieldnames=self.fieldnames)
        if new:
            self._w.writeheader()
            self._f.flush()

    def log(self, **row):
        self._w.writerow({k: row.get(k, "") for k in self.fieldnames})
        self._f.flush()

    def close(self):
        self._f.close()


class Tracker:
    """Experiment-tracker interface (role of the reference's WandbLogger,
    ``sgmse/train.py:83-84``): ``log_config`` once, ``log`` per step,
    ``finish`` at the end. Implementations must be safe to call from a
    training loop (no blocking network I/O on the step path)."""

    def log_config(self, config: dict):  # pragma: no cover - interface
        raise NotImplementedError

    def log(self, metrics: dict, step: Optional[int] = None):  # pragma: no cover
        raise NotImplementedError

    def finish(self):  # pragma: no cover - interface
        raise NotImplementedError


class NullTracker(Tracker):
    """No-op tracker (reference ``--nolog``)."""

    def log_config(self, config: dict):
        pass

    def log(self, metrics: dict, step: Optional[int] = None):
        pass

    def finish(self):
        pass


class JsonlTracker(Tracker):
    """Offline run tracking: ``<dir>/<run_name>/{config.json,events.jsonl}``.

    Each ``log`` appends one JSON line ``{"step": n, "time": t, **metrics}``;
    runs are resumable (append mode) and greppable without any service.
    """

    def __init__(self, root: str, run_name: Optional[str] = None):
        run_name = run_name or time.strftime("run_%Y%m%d_%H%M%S")
        self.dir = os.path.join(root, run_name)
        os.makedirs(self.dir, exist_ok=True)
        self._f = open(os.path.join(self.dir, "events.jsonl"), "a")
        self._step = 0

    def log_config(self, config: dict):
        with open(os.path.join(self.dir, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)

    def log(self, metrics: dict, step: Optional[int] = None):
        if step is None:
            step = self._step
        self._step = step + 1
        row = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = str(v)
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()

    def finish(self):
        self._f.close()


class WandbTracker(Tracker):
    """Delegates to the ``wandb`` package when installed (the reference's
    default logger). Offline images don't ship it — use JsonlTracker."""

    def __init__(self, project: str, run_name: Optional[str] = None, **kwargs):
        try:
            import wandb  # noqa: F401
        except ImportError as e:  # pragma: no cover - wandb absent offline
            raise ImportError(
                "wandb is not installed; use JsonlTracker for offline runs"
            ) from e
        self._wandb = wandb
        self._run = wandb.init(project=project, name=run_name, **kwargs)

    def log_config(self, config: dict):  # pragma: no cover - wandb absent
        self._run.config.update(config)

    def log(self, metrics: dict, step: Optional[int] = None):  # pragma: no cover
        self._wandb.log(metrics, step=step)

    def finish(self):  # pragma: no cover - wandb absent
        self._run.finish()


def make_tracker(kind: str, root_or_project: str, run_name: Optional[str] = None) -> Tracker:
    """Factory: ``none`` | ``jsonl`` | ``wandb`` (reference ``--nolog`` maps
    to ``none``/``jsonl``)."""
    if kind == "none":
        return NullTracker()
    if kind == "jsonl":
        return JsonlTracker(root_or_project, run_name)
    if kind == "wandb":
        return WandbTracker(root_or_project, run_name)
    raise ValueError(f"unknown tracker kind: {kind}")
